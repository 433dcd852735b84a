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

  test("node2vec: full output equals a local hand-replay of the pick rule") {
    val P = 1000000007L
    val (wr, wn, wf) = (4L, 2L, 1L)
    val seed = 9L
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (2L, 7L))
    // local reference: sorted adjacency + the exact modular pick
    val adjM = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).distinct.sorted }
    def hash(w: Long, k: Int): Long = ((w % P) * 2654435761L + k * 40503L + seed) % P
    def replay(start: Long, len: Int): Seq[Long] = {
      var prev = -1L; var cur = start
      var path = Seq(cur)
      for (k <- 1 to len) {
        val nbrs = adjM(cur)
        val next = if (k == 1) nbrs((hash(start, k) % nbrs.length).toInt)
        else {
          val wts = nbrs.map { x =>
            if (x == prev) wr
            else if (adjM(prev).contains(x)) wn else wf
          }
          val r = hash(start, k) % wts.sum
          val cums = wts.scanLeft(0L)(_ + _).tail
          nbrs(cums.indexWhere(_ > r))
        }
        prev = cur; cur = next; path :+= cur
      }
      path
    }
    val got = RandomWalks.node2vec(edges, "a", "b",
      walksPerNode = 1, walkLength = 4, seed = seed,
      wReturn = wr, wNear = wn, wFar = wf)
      .orderBy("walk_id", "step").collect()
      .groupBy(_.getAs[Long]("walk_id"))
      .map { case (w, rs) =>
        w -> rs.sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("node")).toSeq }
    (1L to 7L).foreach { n =>
      assert(got(n) === replay(n, 4), s"walk from $n")
    }
  }

  test("node2vec step 1 equals deepWalk's uniform pick (shared-prefix contract)") {
    val dw = RandomWalks.deepWalk(edges, "a", "b", 2, 1, seed = 5L)
      .filter(col("step") === 1).select("walk_id", "node")
    val n2 = RandomWalks.node2vec(edges, "a", "b", 2, 1, seed = 5L,
      wReturn = 9L, wNear = 9L, wFar = 1L)
      .filter(col("step") === 1).select("walk_id", "node")
    assert(dw.except(n2).isEmpty && n2.except(dw).isEmpty)
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
