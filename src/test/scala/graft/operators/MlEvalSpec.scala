package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class MlEvalSpec extends SparkSpec {
  import spark.implicits._

  test("binaryMetrics: hand-computed AUC with ties, threshold counts, Brier") {
    // P = {0.9, 0.7, 0.3}, N = {0.8, 0.7, 0.1, 0.1}
    // U = 4 (0.9) + 2.5 (0.7: beats both 0.1s, half for the tie) + 2 (0.3)
    //   = 8.5 → AUC = 8.5/12
    val rows = Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.7, 0.0),
      (0.3, 1.0), (0.1, 0.0), (0.1, 0.0)).toDF("score", "y")
    val r = MlEval.binaryMetrics(rows, "y", "score").head()
    assert(r.getLong(0) === 7L && r.getLong(1) === 3L && r.getLong(2) === 4L)
    assert(math.abs(r.getDouble(3) - 8.5 / 12.0) < 1e-15)
    // threshold 0.5: tp=2 (0.9, 0.7), fp=2 (0.8, 0.7), fn=1 (0.3), tn=2
    assert(r.getLong(4) === 2L && r.getLong(5) === 2L)
    assert(r.getLong(6) === 1L && r.getLong(7) === 2L)
    assert(r.getDouble(8) === 4.0 / 7.0)   // accuracy
    assert(r.getDouble(9) === 0.5)         // precision
    assert(math.abs(r.getDouble(10) - 2.0 / 3.0) < 1e-15) // recall
    assert(r.getDouble(11) === 4.0 / 7.0)  // f1 = 2·2/(4+2+1)
    val brier = (math.pow(0.1, 2) + math.pow(0.8, 2) + math.pow(0.3, 2) +
      math.pow(0.7, 2) + math.pow(0.7, 2) + 2 * math.pow(0.1, 2)) / 7.0
    assert(math.abs(r.getDouble(12) - brier) < 1e-12)
  }

  test("binaryMetricsBy: slices isolated; grouped ≡ global per slice") {
    val rows = Seq(
      ("a", 0.9, 1.0), ("a", 0.8, 0.0), ("a", 0.7, 1.0), ("a", 0.7, 0.0),
      ("a", 0.3, 1.0), ("a", 0.1, 0.0), ("a", 0.1, 0.0),
      ("b", 0.9, 1.0), ("b", 0.1, 0.0), // perfect slice
      ("c", 0.6, 1.0), ("c", 0.7, 1.0)) // one-class slice
      .toDF("src", "score", "y")
    val got = MlEval.binaryMetricsBy(rows, "src", "y", "score")
      .orderBy("slice").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    // slice a is the binaryMetrics hand case: AUC 8.5/12
    assert(math.abs(got(0).getDouble(4) - 8.5 / 12.0) < 1e-15)
    assert(got(1).getDouble(4) === 1.0 && got(1).getDouble(5) === 1.0)
    assert(got(2).isNullAt(4)) // no negatives in slice c
    // grouped result equals the global metrics run on each slice alone
    val solo = MlEval.binaryMetrics(rows.filter(col("src") === "a"), "y", "score")
      .head()
    assert(got(0).getLong(1) === solo.getLong(0) &&
      got(0).getDouble(4) === solo.getDouble(3) &&
      got(0).getDouble(5) === solo.getDouble(8))
  }

  test("temperatureScale: overconfident scores fit T > 1 and improve NLL") {
    // scores say 90/10 but the truth is 70/30 → softening (T > 1) helps
    val rows = (Seq.fill(70)((0.9, 1.0)) ++ Seq.fill(30)((0.9, 0.0)) ++
      Seq.fill(70)((0.1, 0.0)) ++ Seq.fill(30)((0.1, 1.0))).toDF("score", "y")
    val r = MlEval.temperatureScale(rows, "y", "score").head()
    assert(r.getLong(1) === 200L)
    assert(r.getDouble(0) > 1.0, s"expected softening, got T=${r.getDouble(0)}")
    assert(r.getDouble(3) < r.getDouble(2), "NLL must drop on this corpus")
    assert(r.getBoolean(4))
    // perfectly calibrated scores: gradient ~0, T stays ~1
    val calib = (Seq.fill(9)((0.9, 1.0)) ++ Seq.fill(1)((0.9, 0.0)) ++
      Seq.fill(9)((0.1, 0.0)) ++ Seq.fill(1)((0.1, 1.0))).toDF("score", "y")
    val rc = MlEval.temperatureScale(calib, "y", "score").head()
    assert(math.abs(rc.getDouble(0) - 1.0) < 0.05)
  }

  test("calibration: hand-computed bins, clamp at 1.0, ECE") {
    // bin 1 (0.1–0.2): scores 0.10, 0.15, labels 0,1 → conf 0.125, rate 0.5
    // bin 9: scores 0.95, 1.0 (clamped into 9), labels 1,1 → conf 0.975, rate 1
    val rows = Seq((0.10, 0.0), (0.15, 1.0), (0.95, 1.0), (1.0, 1.0))
      .toDF("score", "y")
    val got = MlEval.calibration(rows, "y", "score", nBins = 10)
      .orderBy("bin").collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 9))
    val b1 = got(0); val b9 = got(1)
    assert(b1.getLong(1) === 2L && b1.getDouble(2) === 0.125 &&
      b1.getDouble(3) === 0.5)
    assert(math.abs(b1.getDouble(4) - 0.375) < 1e-12)
    assert(b9.getLong(1) === 2L && b9.getDouble(2) === 0.975 &&
      b9.getDouble(3) === 1.0)
    assert(math.abs(b9.getDouble(4) - 0.025) < 1e-12)
    val ece = (0.375 * 2 + 0.025 * 2) / 4
    got.foreach(r => assert(math.abs(r.getDouble(5) - ece) < 1e-12))
  }

  test("binaryMetrics: perfect separation → AUC 1, one-class input → AUC NULL") {
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
      .toDF("score", "y")
    val rp = MlEval.binaryMetrics(perfect, "y", "score").head()
    assert(rp.getDouble(3) === 1.0 && rp.getDouble(8) === 1.0 &&
      rp.getDouble(11) === 1.0)
    val onlyPos = Seq((0.9, 1.0), (0.1, 1.0)).toDF("score", "y")
    val ro = MlEval.binaryMetrics(onlyPos, "y", "score").head()
    assert(ro.isNullAt(3)) // no negatives → AUC undefined
    assert(ro.getDouble(10) === 0.5) // recall = 1/2: the 0.1 positive missed
    // reversed scorer → AUC 0
    val reversed = Seq((0.1, 1.0), (0.9, 0.0)).toDF("score", "y")
    assert(MlEval.binaryMetrics(reversed, "y", "score").head().getDouble(3) === 0.0)
  }

  test("rocPoints: hand-computed sweep; trapezoid AUC equals Mann–Whitney exactly") {
    // P = {0.9, 0.7, 0.3}, N = {0.8, 0.7, 0.1, 0.1} (the binaryMetrics corpus)
    val rows = Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.7, 0.0),
      (0.3, 1.0), (0.1, 0.0), (0.1, 0.0)).toDF("score", "y")
    val pts = MlEval.rocPoints(rows, "y", "score").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(pts.map(_._1).toSeq === Seq(0.9, 0.8, 0.7, 0.3, 0.1), "s descending")
    assert(pts.map(p => (p._2, p._3)).toSeq ===
      Seq((1L, 0L), (1L, 1L), (2L, 2L), (3L, 2L), (3L, 4L)))
    assert(pts.head._6 === 1.0 && pts.head._4 === 1.0 / 3)   // precision, tpr at top
    assert(pts.last._4 === 1.0 && pts.last._5 === 1.0)       // curve ends at (1,1)
    // trapezoid over the (fpr, tpr) points incl. the implicit (0,0) start
    val curve = ((0.0, 0.0) +: pts.map(p => (p._5, p._4)).toSeq).toList
    val trap = curve.zip(curve.tail).map {
      case ((x0, y0), (x1, y1)) => (x1 - x0) * (y0 + y1) / 2
    }.sum
    val auc = MlEval.binaryMetrics(rows, "y", "score").head().getDouble(3)
    assert(math.abs(trap - auc) < 1e-15, s"trapezoid $trap vs Mann–Whitney $auc")
    // one-class input: the guarded rate is NULL, rows still emitted
    val onlyPos = Seq((0.9, 1.0), (0.1, 1.0)).toDF("score", "y")
    val op = MlEval.rocPoints(onlyPos, "y", "score").collect()
    assert(op.length === 2 && op.forall(_.isNullAt(4)) && op.forall(!_.isNullAt(3)))
  }

  test("averagePrecision: hand-computed step-wise AP; one-class NULL") {
    // P = {0.9, 0.7, 0.3}, N = {0.8, 0.7, 0.1, 0.1} — the rocPoints corpus.
    // Distinct scores desc: 0.9 (tp=1,fp=0), 0.8 (1,1), 0.7 (2,2),
    // 0.3 (3,2), 0.1 (3,4). AP = (1·1/1 + 1·2/4 + 1·3/5) / 3 = 0.7
    val rows = Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.7, 0.0),
      (0.3, 1.0), (0.1, 0.0), (0.1, 0.0)).toDF("score", "y")
    val r = MlEval.averagePrecision(rows, "y", "score").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 0.7) < 1e-15)
    // perfect separation → AP = 1
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0)).toDF("score", "y")
    assert(MlEval.averagePrecision(perfect, "y", "score").head().getDouble(2) === 1.0)
    // no positives → NULL
    val neg = Seq((0.9, 0.0), (0.1, 0.0)).toDF("score", "y")
    assert(MlEval.averagePrecision(neg, "y", "score").head().isNullAt(2))
  }

  test("splitConformal: hand-computed threshold, coverage, vacuous small-n case") {
    import org.apache.spark.sql.functions.col
    // calibration (flag=1): r = 1−s for y=1 else s →
    //   (0.9,1)→0.1  (0.8,0)→0.8  (0.6,1)→0.4  (0.3,0)→0.3  (0.2,1)→0.8
    // sorted r: 0.1, 0.3, 0.4, 0.8, 0.8 ; n=5, α=0.2 → k=⌈6·0.8⌉=5 → q̂=0.8
    val rows = Seq(
      (0.9, 1.0, 1), (0.8, 0.0, 1), (0.6, 1.0, 1), (0.3, 0.0, 1), (0.2, 1.0, 1),
      // eval (flag=0): true-class r:  (0.7,1)→0.3 ≤ q̂ ✓  (0.95,0)→0.95 ✗
      //   (0.1,0)→0.1 ✓ ; sets: 0.7→{1 (0.3≤.8), 0 (0.7≤.8)}=2,
      //   0.95→{1 (0.05≤.8)}=1, 0.1→{1? 0.9>0.8 no; 0: 0.1≤0.8 yes}=1
      (0.7, 1.0, 0), (0.95, 0.0, 0), (0.1, 0.0, 0)
    ).toDF("score", "y", "cal")
    val r = MlEval.splitConformal(rows, "y", "score", col("cal") === 1, alpha = 0.2)
      .head()
    assert(r.getAs[Long]("n_cal") === 5L && r.getAs[Long]("k") === 5L)
    assert(math.abs(r.getAs[Double]("qhat") - 0.8) < 1e-12)
    assert(r.getAs[Long]("n_eval") === 3L && r.getAs[Long]("n_covered") === 2L)
    assert(math.abs(r.getAs[Double]("coverage") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("avg_set_size") - 4.0 / 3) < 1e-12)
    // vacuous: n_cal=2, α=0.1 → k=⌈3·0.9⌉=3 > 2 → NULL q̂, full sets
    val tiny = Seq((0.9, 1.0, 1), (0.2, 0.0, 1), (0.5, 1.0, 0), (0.5, 0.0, 0))
      .toDF("score", "y", "cal")
    val v = MlEval.splitConformal(tiny, "y", "score", col("cal") === 1, alpha = 0.1)
      .head()
    assert(v.getAs[Long]("k") === 3L && v.isNullAt(2))
    assert(v.getAs[Double]("coverage") === 1.0 && v.getAs[Double]("avg_set_size") === 2.0)
  }

  test("isotonicCalibration: minimax equals PAV — hand pool, full reversal, reference") {
    import org.apache.spark.sql.functions.col
    def mk(rows: Seq[(Double, Int, Int)]): org.apache.spark.sql.DataFrame =
      // (bin-center score, positives, negatives) → per-row frame
      rows.flatMap { case (s, p, n) =>
        Seq.fill(p)((s, 1.0)) ++ Seq.fill(n)((s, 0.0))
      }.toDF("score", "y")
    // pos rates [0.2, 0.5, 0.4, 0.8] over equal bins → PAV pools bins
    // 2 and 3 → [0.2, 0.45, 0.45, 0.8]
    val pooled = MlEval.isotonicCalibration(
      mk(Seq((0.05, 2, 8), (0.15, 5, 5), (0.25, 4, 6), (0.35, 8, 2))),
      "y", "score").orderBy("bin").collect()
    assert(pooled.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    assert(pooled.map(_.getAs[Double]("iso_fitted")).toSeq ===
      Seq(0.2, 0.45, 0.45, 0.8))
    assert(pooled.map(_.getAs[Double]("pos_rate")).toSeq === Seq(0.2, 0.5, 0.4, 0.8))
    // fully reversed rates pool into one block: the global mean
    val flat = MlEval.isotonicCalibration(
      mk(Seq((0.05, 9, 1), (0.15, 1, 9))), "y", "score")
      .orderBy("bin").collect().map(_.getAs[Double]("iso_fitted"))
    assert(flat.toSeq === Seq(0.5, 0.5))
    // property vs an independent driver-side PAV on random bin profiles
    val rnd = new scala.util.Random(11L)
    (1 to 3).foreach { _ =>
      val profile = (0 until 6).map(b =>
        ((b + 0.5) / 10.0, rnd.nextInt(8) + 1, rnd.nextInt(8) + 1))
      def pav(ws: Seq[(Long, Long)]): Seq[Double] = {
        // blocks of (n, pos); merge while a block's mean < its left's
        val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        ws.foreach { case (n, p) =>
          blocks += ((n, p, 1))
          while (blocks.length >= 2 &&
            blocks(blocks.length - 1)._2 * blocks(blocks.length - 2)._1 <=
              blocks(blocks.length - 2)._2 * blocks(blocks.length - 1)._1) {
            val a = blocks.remove(blocks.length - 1)
            val b = blocks.remove(blocks.length - 1)
            blocks += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
          }
        }
        blocks.toSeq.flatMap { case (n, p, c) =>
          Seq.fill(c)(p.toDouble / n)
        }
      }
      val expected = pav(profile.map { case (_, p, n) => ((p + n).toLong, p.toLong) })
      val got = MlEval.isotonicCalibration(mk(profile), "y", "score")
        .orderBy("bin").collect().map(_.getAs[Double]("iso_fitted"))
      got.zip(expected).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-12, s"profile $profile: got ${got.toSeq} want $expected")
      }
      assert(got.toSeq === got.sorted.toSeq, "monotone nondecreasing")
    }
  }

  test("raw unrounded sigmoids: quantized inside, bounded distinct-score frame") {
    // feed raw (unrounded) sigmoids whose 6-decimal quantizations COLLIDE:
    // the operator must quantize internally, so the distinct-score frame
    // is 2 rows (not 4) and the metrics equal the pre-rounded run exactly
    val raw = Seq(
      (0.90000012345, 1.0), (0.90000023456, 1.0),
      (0.10000034567, 0.0), (0.10000045678, 0.0)).toDF("score", "y")
    val pre = raw.select(
      org.apache.spark.sql.functions.round(col("score"), 6).as("score"), col("y"))
    val rRaw = MlEval.binaryMetrics(raw, "y", "score").head()
    val rPre = MlEval.binaryMetrics(pre, "y", "score").head()
    assert(rRaw === rPre)
    assert(rRaw.getDouble(3) === 1.0)
    val calRaw = MlEval.calibration(raw, "y", "score", nBins = 10).collect()
    val calPre = MlEval.calibration(pre, "y", "score", nBins = 10).collect()
    assert(calRaw.toSeq === calPre.toSeq)
  }

  test("malformed rows: NaN scores and non-{0,1} labels are excluded everywhere") {
    val clean = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
    val dirty = clean ++ Seq(
      (Double.NaN, 1.0),  // NaN score — would clamp to ~1 in temperatureScale
      (0.7, 2.0),         // multiclass label — would count as negative
      (0.6, Double.NaN))  // NaN label — would count as negative
    val cleanDf = clean.toDF("score", "y")
    val dirtyDf = dirty.toDF("score", "y")
    val rc = MlEval.binaryMetrics(cleanDf, "y", "score").head()
    val rd = MlEval.binaryMetrics(dirtyDf, "y", "score").head()
    assert(rd === rc, "malformed rows must not shift any metric")
    assert(rd.getLong(0) === 4L)
    val tc = MlEval.temperatureScale(cleanDf, "y", "score").head()
    val td = MlEval.temperatureScale(dirtyDf, "y", "score").head()
    assert(td.getDouble(0) === tc.getDouble(0) && td.getLong(1) === 4L)
    assert(MlEval.calibration(dirtyDf, "y", "score").collect().toSeq ===
      MlEval.calibration(cleanDf, "y", "score").collect().toSeq)
    assert(MlEval.binaryMetricsBy(
        dirtyDf.withColumn("src", org.apache.spark.sql.functions.lit("a")),
        "src", "y", "score").head().getLong(1) === 4L)
  }

  test("rankingMetrics: hand-computed MRR/DCG/nDCG/P@k on one query") {
    // ranked by score desc: d1(rel 0), d2(rel 3), d3(rel 1), d4(rel 0)
    val runs = Seq(
      (0L, 1L, 9.0, 0), (0L, 2L, 8.0, 3), (0L, 3L, 7.0, 1), (0L, 4L, 6.0, 0))
      .toDF("q", "d", "score", "rel")
    val r = MlEval.rankingMetrics(runs, "q", "d", "score", "rel", k = 3).head()
    // mrr: first relevant at rank 2
    assert(r.getAs[Double]("mrr") === 0.5)
    // dcg@3 = 7/log2(3) + 1/log2(4) = 4.916508 + 0.5
    val dcg = BigDecimal(7.0 / (math.log(3) / math.log(2)) + 0.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("dcg_3") === dcg)
    // ideal order: rel 3,1,0 at ranks 1,2,3 → idcg = 7 + 1/log2(3)
    val idcg = BigDecimal(7.0 + 1.0 / (math.log(3) / math.log(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("idcg_3") === idcg)
    assert(r.getAs[Double]("ndcg_3") ===
      BigDecimal(dcg / idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("p_3") === 2.0 / 3)
    assert(r.getAs[Long]("n_docs") === 4L)
  }

  test("rankingMetrics: no relevant docs -> mrr 0, ndcg 0; ties by doc id") {
    val none = Seq((0L, 1L, 1.0, 0), (0L, 2L, 2.0, 0)).toDF("q", "d", "score", "rel")
    val r0 = MlEval.rankingMetrics(none, "q", "d", "score", "rel", k = 2).head()
    assert(r0.getAs[Double]("mrr") === 0.0)
    assert(r0.getAs[Double]("ndcg_2") === 0.0)
    // equal scores: doc 1 outranks doc 2, so the relevant doc 2 is rank 2
    val tied = Seq((0L, 1L, 5.0, 0), (0L, 2L, 5.0, 2)).toDF("q", "d", "score", "rel")
    val rt = MlEval.rankingMetrics(tied, "q", "d", "score", "rel", k = 2).head()
    assert(rt.getAs[Double]("mrr") === 0.5)
  }
}
