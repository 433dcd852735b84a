package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (4L, 5L), (5L, 6L),
    (6L, 7L), (7L, 5L), (2L, 7L)).toDF("a", "b")

  test("every consecutive step follows a real edge; shape is |V|*gamma walks of t+1 rows") {
    val walks = RandomWalks.deepWalk(edges, "a", "b",
      walksPerNode = 3, walkLength = 5, seed = 7L).cache()
    val nV = 7
    assert(walks.select("walk_id").distinct().count() === nV * 3L)
    assert(walks.count() === nV * 3L * 6L)
    // per-walk: steps are exactly 0..5, start column matches step 0
    val byWalk = walks.groupBy("walk_id")
      .agg(sort_array(collect_list(col("step"))).as("steps"),
        min(when(col("step") === 0, col("node"))).as("s0"),
        min("start").as("st"), max("start").as("st2"))
    assert(byWalk.filter(col("steps") =!= array((0 to 5).map(lit): _*)).count() === 0)
    assert(byWalk.filter(col("s0") =!= col("st") || col("st") =!= col("st2")).count() === 0)
    // every transition (step k node -> step k+1 node) is an edge
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    val trans = walks.as("x").join(walks.as("y"),
      col("x.walk_id") === col("y.walk_id") &&
        col("y.step") === col("x.step") + 1)
      .select(col("x.node").as("u"), col("y.node").as("v"))
    assert(trans.join(und, Seq("u", "v"), "left_anti").count() === 0,
      "no transition may leave the edge set")
    walks.unpersist()
  }

  test("deterministic for a seed; a different seed changes the corpus") {
    def run(seed: Long) = RandomWalks.deepWalk(
      edges, "a", "b", walksPerNode = 2, walkLength = 4, seed = seed)
    assert(run(42L).except(run(42L)).isEmpty, "same seed == same corpus")
    assert(run(42L).except(run(43L)).count() > 0, "seed moves the picks")
  }

  test("walks from a leaf immediately return through its only edge") {
    val chain = Seq((10L, 11L)).toDF("a", "b") // two leaves, degree 1
    val w = RandomWalks.deepWalk(chain, "a", "b",
      walksPerNode = 1, walkLength = 3, seed = 0L)
      .orderBy("walk_id", "step").collect()
    // degree-1 nodes must alternate 10,11,10,11 / 11,10,11,10
    val byWalk = w.groupBy(_.getAs[Long]("walk_id")).values.map(
      _.sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("node")).toSeq)
    assert(byWalk.toSet === Set(
      Seq(10L, 11L, 10L, 11L), Seq(11L, 10L, 11L, 10L)))
  }
}
