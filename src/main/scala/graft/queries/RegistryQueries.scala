package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.core.QueryRegistry

/** The config-compiler contract end to end: a runtime directory of
  * user-authored `.sql` + `.map` files (the reference's `input/sql` and
  * `input/columnmap`, SisConnectorService.java:710-733) compiled into a
  * native Catalyst plan over registered views — multi-line SQL joined with
  * spaces, case-insensitive physical resolution, unmapped field → NULL.
  */
object RegistryQueries extends QueryGroup {

  /** One shared config dir per JVM (queries may run repeatedly). */
  private lazy val cfgDir: java.nio.file.Path = {
    val d = Files.createTempDirectory("graft_cfg")
    Files.writeString(d.resolve("candidateIds.sql"),
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |ORDER BY c_custkey""".stripMargin)
    Files.writeString(d.resolve("candidateIds.map"),
      """# logical=PHYSICAL, case-insensitive; unmatched yields NULL
        |studentUniqueId=C_CUSTKEY
        |fullName=c_NAME
        |segment=c_mktsegment
        |unmappedField=NO_SUCH_COLUMN
        |""".stripMargin)
    d
  }

  private val qR1 = Q(
    "q_r1_config_compiled",
    """SELECT c_custkey AS studentUniqueId, c_name AS fullName,
      |       c_mktsegment AS segment, CAST(NULL AS VARCHAR) AS unmappedField
      |FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |ORDER BY studentUniqueId""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    QueryRegistry.load(cfgDir, cfgDir).compile(s, "candidateIds")
  }

  override val all: Seq[Q] = Seq(qR1)
}
