package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end entity resolution: fuzzy-blocked candidate pairs →
  * Fellegi–Sunter-style additive log-odds scoring → threshold →
  * transitive closure into entity ids. This is the reference's actual
  * identity problem (student/staff records from a SIS matched across
  * extracts, `SisConnectorService.java:142-160` keyed syncs) composed
  * from the engine's own parts: [[FuzzyJoin]] (provably complete q-gram
  * blocking), literal agreement weights, and [[ConnectedComponents]]
  * (alternating-star closure).
  *
  * Scoring is the FIXED-weights Fellegi–Sunter form: each field
  * contributes a literal agree/disagree log-odds (the EM-fitted
  * variant estimates these from data; fixed weights keep the operator
  * deterministic and cross-engine exact — every score is a sum of plan
  * literals in a fixed order, so the threshold cannot flip between
  * engines). The name field's weight steps down with edit distance.
  *
  * Scale shape: candidates come from the gram-blocked fuzzy join (never
  * O(n²)); scoring is scan-side arithmetic on the pair frame; the
  * closure is the polylog-round alternating-star. PRECONDITION: the
  * compared fields are non-null (SQL `=` null semantics would silently
  * drop a pair's score; coalesce upstream if needed).
  */
object EntityResolution {

  /** Per-record entity assignment over `records`. `nameCol` is compared
    * fuzzily (edit distance ≤ `maxNameDist`, weight =
    * `nameWeights(dist)`); each `(col, agree, disagree)` in
    * `fieldWeights` adds its literal log-odds on exact (in)equality.
    * Pairs scoring ≥ `minScore` are linked; output is `records` plus
    * `entity_id` (the component's minimum record id — unmatched records
    * are their own entity).
    */
  def resolve(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      nameWeights: Seq[Double],
      fieldWeights: Seq[(String, Double, Double)],
      maxNameDist: Int,
      minScore: Double,
      blockCol: Option[String] = None,
      segmentBlocking: Boolean = true): DataFrame = {
    val pairs = matchedPairs(
      records, idCol, nameCol, nameWeights, fieldWeights, maxNameDist, minScore, blockCol,
      segmentBlocking)
      .select(col("id_a"), col("id_b"))
    ConnectedComponents.assignClusters(records, idCol, pairs)
      .withColumnRenamed("cluster_id", "entity_id")
  }

  /** The scored pair frame (id_a < id_b, score) at or above `minScore` —
    * exposed separately so callers can audit the match evidence.
    */
  /** @param segmentBlocking candidate generation via the PassJoin
    *   segment scheme ([[FuzzyJoin.segmentSelfPairsBlocked]], the
    *   default) instead of the q-gram count filter — identical output
    *   by construction (both are complete blockings over the same
    *   verify), but segment keys stay selective on low-entropy name
    *   alphabets (hex ids, digit runs) where the gram equi-join
    *   degenerates toward a within-block cross join (q_f7's 37x
    *   blowup at 10x scale).
    */
  def matchedPairs(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      nameWeights: Seq[Double],
      fieldWeights: Seq[(String, Double, Double)],
      maxNameDist: Int,
      minScore: Double,
      blockCol: Option[String] = None,
      segmentBlocking: Boolean = true): DataFrame = {
    require(nameWeights.length == maxNameDist + 1,
      s"need one name weight per distance 0..$maxNameDist")
    // Blocking is only legal when NO cross-block pair can reach
    // minScore: the best any such pair can do is the max name weight,
    // the block field's DISAGREE weight, and every other field's best
    // case. Asserted, not assumed — a lossy block would silently drop
    // true matches.
    blockCol.foreach { bf =>
      val bw = fieldWeights.find(_._1 == bf).getOrElse(
        throw new IllegalArgumentException(
          s"blockCol $bf must be one of the scored fields"))
      val bestCross = nameWeights.max + bw._3 +
        fieldWeights.filterNot(_._1 == bf).map(f => math.max(f._2, f._3)).sum
      require(bestCross < minScore,
        f"blocking on $bf is LOSSY: a cross-block pair could score $bestCross%.2f >= $minScore%.2f")
    }
    val sideCols = (idCol +: nameCol +: fieldWeights.map(_._1)).distinct
    def side(tag: String): DataFrame =
      records.select(sideCols.map(c => col(c).as(s"${c}_$tag")): _*)

    // candidates: fuzzy pairs over DISTINCT (block,) names (complete
    // blocking) + identical-name record pairs the name-level join
    // cannot emit
    val namePairs = blockCol match {
      case Some(bf) =>
        val p =
          if (segmentBlocking)
            FuzzyJoin.segmentSelfPairsBlocked(
              records.select(col(nameCol), col(bf)), nameCol, bf, maxNameDist)
          else
            FuzzyJoin.fuzzySelfPairsBlocked(
              records.select(col(nameCol), col(bf)), nameCol, bf, maxNameDist)
        p.select(col(bf).as("__fblk"),
          col("name_a").as("__fn_a"), col("name_b").as("__fn_b"), col("dist"))
      case None =>
        val p =
          if (segmentBlocking)
            FuzzyJoin.segmentSelfPairs(records.select(col(nameCol)), nameCol, maxNameDist)
          else
            FuzzyJoin.fuzzySelfPairs(records.select(col(nameCol)), nameCol, maxNameDist)
        p.select(col("name_a").as("__fn_a"), col("name_b").as("__fn_b"), col("dist"))
    }
    val crossName = blockCol match {
      case Some(bf) =>
        side("a")
          .join(namePairs,
            col(s"${nameCol}_a") === col("__fn_a") && col(s"${bf}_a") === col("__fblk"))
          .join(side("b"),
            col(s"${nameCol}_b") === col("__fn_b") && col(s"${bf}_b") === col("__fblk"))
      case None =>
        side("a")
          .join(namePairs, col(s"${nameCol}_a") === col("__fn_a"))
          .join(side("b"), col(s"${nameCol}_b") === col("__fn_b"))
    }
    val sameNameCond =
      col(s"${nameCol}_a") === col(s"${nameCol}_b") &&
        col(s"${idCol}_a") < col(s"${idCol}_b") &&
        blockCol.map(bf => col(s"${bf}_a") === col(s"${bf}_b")).getOrElse(lit(true))
    val sameName = side("a")
      .join(side("b"), sameNameCond)
      .withColumn("dist", lit(0))
    // id_a < id_b canonicalization for the cross-name pairs (name order
    // and id order can disagree)
    val crossCols: Seq[Column] =
      Seq(
        least(col(s"${idCol}_a"), col(s"${idCol}_b")).as("id_a"),
        greatest(col(s"${idCol}_a"), col(s"${idCol}_b")).as("id_b"),
        col("dist")) ++
        fieldWeights.map { case (f, _, _) =>
          when(col(s"${idCol}_a") < col(s"${idCol}_b"), col(s"${f}_a"))
            .otherwise(col(s"${f}_b")).as(s"${f}_a2")
        } ++ fieldWeights.map { case (f, _, _) =>
          when(col(s"${idCol}_a") < col(s"${idCol}_b"), col(s"${f}_b"))
            .otherwise(col(s"${f}_a")).as(s"${f}_b2")
        }
    val sameCols: Seq[Column] =
      Seq(
        col(s"${idCol}_a").as("id_a"),
        col(s"${idCol}_b").as("id_b"),
        col("dist")) ++
        fieldWeights.map { case (f, _, _) => col(s"${f}_a").as(s"${f}_a2") } ++
        fieldWeights.map { case (f, _, _) => col(s"${f}_b").as(s"${f}_b2") }
    val candidates = crossName.select(crossCols: _*)
      .unionByName(sameName.select(sameCols: _*))

    val nameScore = nameWeights.zipWithIndex.tail.foldLeft(
      when(col("dist") === 0, nameWeights.head)) { case (acc, (w, d)) =>
      acc.when(col("dist") === d, w)
    }
    val score = fieldWeights.foldLeft(nameScore.otherwise(nameWeights.last)) {
      case (acc, (f, agree, disagree)) =>
        acc + when(col(s"${f}_a2") === col(s"${f}_b2"), agree).otherwise(disagree)
    }
    candidates
      .withColumn("score", score)
      .where(col("score") >= minScore)
      .select("id_a", "id_b", "dist", "score")
  }
}
