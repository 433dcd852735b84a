package graft.operators

import graft.SparkSpec

class KTrussSpec extends SparkSpec {

  private def truss(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 20) = {
    val s = spark
    import s.implicits._
    KTruss.trussEdges(edges.toDF("x", "y"), "x", "y", k, maxRounds = maxRounds)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Long]("support"))
      .toMap
  }

  private val clique4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))

  test("4-clique is its own 4-truss: every edge support 2") {
    val out = truss(clique4, 4)
    assert(out.size == 6 && out.values.forall(_ == 2L))
  }

  test("two triangles sharing an edge: 3-truss keeps all, 4-truss collapses to empty") {
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val t3 = truss(bowtie, 3)
    assert(t3.size == 5)
    assert(t3((2L, 3L)) == 2L && t3((1L, 2L)) == 1L)
    // k=4: only {2,3} has support 2; peeling the rest kills its triangles too
    assert(truss(bowtie, 4).isEmpty)
  }

  test("star has cores but no truss (the truss-vs-core contrast)") {
    val star = (2L to 8L).map(i => (1L, i))
    assert(truss(star, 3).isEmpty)
  }

  test("cascading peel: pendant triangle on a 4-clique stripped, clique survives") {
    val withPendant = clique4 ++ Seq((1L, 9L), (2L, 9L))
    val out = truss(withPendant, 4)
    assert(out.size == 6 && !out.keySet.exists(e => e._1 == 9L || e._2 == 9L))
    // edge {1,2} initially had support 3 (via 3, 4, 9); after the peel, 2
    assert(out((1L, 2L)) == 2L)
  }

  test("direction/order of input rows is irrelevant (canonicalization)") {
    val scrambled = Seq((2L, 1L), (3L, 1L), (4L, 1L), (3L, 2L), (4L, 2L), (4L, 3L))
    assert(truss(scrambled, 4) == truss(clique4, 4))
  }

  test("non-convergence within maxRounds throws with requireConvergence") {
    // pendant peel needs round 1 (drop pendants) + round 2 (confirm):
    // maxRounds = 1 ends mid-cascade and must fail loudly
    intercept[IllegalStateException] {
      truss(clique4 ++ Seq((1L, 9L), (2L, 9L)), 4, maxRounds = 1)
    }
  }
}
