package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** Live execution of the JDBC ingest boundary (reference: Dao.java:40-114)
  * against an in-JVM embedded Derby database — Derby ships in Spark's own
  * jar directory, so this is a zero-dependency end-to-end test of S1
  * (query pushdown), S2 (the keyed-detail query as one scan) and S3
  * (datasource-managed connection lifecycle: no handle ever touches our
  * code).
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  /** One-time schema+data seed (lazy: first test referencing it wins). */
  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE candidates (id INT NOT NULL, name VARCHAR(40), segment VARCHAR(10))")
      val ins = conn.prepareStatement("INSERT INTO candidates VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i)
        ins.setString(2, s"cand$i")
        ins.setString(3, if (i % 3 == 0) "BUILDING" else "OTHER")
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("query: SQL text evaluated by the RDBMS, types survive") {
    seeded
    val df = JdbcSource.query(spark, url,
      "SELECT id, name FROM candidates WHERE segment = 'BUILDING'", props)
    val rows = df.collect()
    assert(rows.length === 33)
    // Derby reports SQL-uppercase identifiers — part of the contract
    assert(df.schema("ID").dataType === org.apache.spark.sql.types.IntegerType)
    assert(rows.map(_.getInt(0)).forall(_ % 3 == 0))
  }

  test("partitionedTable: range-partitioned read covers every row exactly once") {
    seeded
    val df = JdbcSource.partitionedTable(spark, url, "candidates",
      partitionColumn = "id", lowerBound = 1L, upperBound = 101L,
      numPartitions = 4, props = props)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    assert(df.select("id").collect().map(_.getInt(0)).sorted.toSeq === (1 to 100))
  }

  test("predicate pushdown reaches the JDBC scan") {
    seeded
    val df = JdbcSource.partitionedTable(spark, url, "candidates",
      "id", 1L, 101L, 2, props).filter("segment = 'BUILDING'")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("EqualTo(SEGMENT,BUILDING)"),
      s"filter should reach the JDBC source:\n$physical")
    assert(df.count() === 33)
  }
}
