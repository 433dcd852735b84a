package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftBinsSpec extends SparkSpec {
  import spark.implicits._

  test("equi-depth bins: known quartiles, ties to lower bin, null-safe") {
    // values 1..8 → quartile boundaries 2.75, 4.5, 6.25
    val df = ((1 to 8).map(v => Some(v.toDouble)) :+ None).toDF("v")
    val got = DataProfile.equiDepthBins(df, "v", nBins = 4)
      .collect().map(r => (Option(r.get(0)).map(_.toString.toDouble), if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got(Some(1.0)) === 1 && got(Some(2.0)) === 1)
    assert(got(Some(3.0)) === 2 && got(Some(4.0)) === 2)
    assert(got(Some(5.0)) === 3 && got(Some(6.0)) === 3)
    assert(got(Some(7.0)) === 4 && got(Some(8.0)) === 4)
    assert(got(None) === -1, "null value gets null bin")
  }

  test("equi-depth bins are balanced on a continuous column") {
    val li = graft.Tables.load(spark, sf(), "lineitem")
    val counts = DataProfile.equiDepthBins(li, "l_extendedprice", nBins = 10)
      .groupBy("bin").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (1 to 10).toSet)
    val n = counts.values.sum.toDouble
    assert(counts.values.forall(c => math.abs(c - n / 10) < n * 0.02),
      s"each decile within 2% of n/10: $counts")
  }

  test("grouped equi-depth bins: each group normalized against itself") {
    // group g1 values 1..8, group g2 values 101..108: the same RELATIVE
    // position must land in the same bin despite disjoint ranges
    val df = ((1 to 8).map(v => ("g1", v.toDouble)) ++
      (101 to 108).map(v => ("g2", v.toDouble))).toDF("g", "v")
    val got = DataProfile.groupedEquiDepthBins(df, "g", "v", nBins = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getInt(2)).toMap
    (1 to 8).foreach { i =>
      assert(got(("g1", i.toDouble)) === got(("g2", (100 + i).toDouble)),
        s"relative position $i must bin identically in both groups")
    }
    assert(got(("g1", 1.0)) === 1 && got(("g1", 8.0)) === 4)
  }

  test("PSI: identical slices score ~0, shifted slice scores large") {
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    val same = DataProfile.populationStabilityIndex(base, base, "v", nBins = 10)
      .collect().head
    assert(math.abs(same.getDouble(same.fieldIndex("psi"))) < 1e-12)
    assert(same.getInt(same.fieldIndex("n_bins")) === 10)
    val shifted = (701 to 1700).map(_.toDouble).toDF("v")
    val drift = DataProfile.populationStabilityIndex(base, shifted, "v", nBins = 10)
      .collect().head.getDouble(0)
    assert(drift > 0.25, s"PSI $drift should exceed the conventional 0.25 alarm")
  }

  test("PSI: empty actual bins hit the clamp, stay finite") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val narrow = Seq.fill(100)(50.0).toDF("v") // all mass in one bin
    val r = DataProfile.populationStabilityIndex(base, narrow, "v", nBins = 10)
      .collect().head
    val psi = r.getDouble(r.fieldIndex("psi"))
    assert(!psi.isNaN && !psi.isInfinite && psi > 1.0)
  }
}
