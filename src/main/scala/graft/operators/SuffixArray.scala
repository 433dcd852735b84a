package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed generalized suffix array over a document corpus — the
  * machinery behind EXACT-SUBSTRING training-data deduplication (Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models Better":
  * remove every verbatim span that recurs in the corpus, the strongest
  * form of dedup an LLM pipeline runs after doc-level near-dup).
  *
  * Construction is prefix doubling (Manber–Myers 1990) re-expressed as
  * relational rounds: `tables(k)` assigns every corpus position an
  * ORDER-PRESERVING rank whose equality is exactly "the 2^k-char windows
  * starting here are identical", and round k+1 re-ranks the pair
  * (rank_k(p), rank_k(p + 2^k)) — one join + one sort + one min-over-group
  * per round, all hash/range-partition parallel, nothing driver-side.
  *
  * Scale shape (the reason this is the 100 TB algorithm): every round is
  * a constant number of shuffles over exactly one row per corpus
  * CHARACTER, and — because each document ends in a per-document sentinel
  * that sorts below every real character — every suffix is fully ranked
  * once the window covers the LONGEST DOCUMENT, so the round count is
  * ceil(log2(maxDocLen+1)): bounded by document length, NOT corpus size.
  * A 100 TB corpus of ≤1 MB documents needs ≤20 rounds regardless of how
  * many documents there are. Duplicate detection for a fixed span length
  * L needs only the first floor(log2 L)+1 tables (the overlapping-window
  * lemma below), i.e. stops far earlier.
  *
  * Global rank assignment inside a round is sort → `RDD.zipWithIndex`
  * (distributed: one count job then per-partition offsets; never a
  * single-reducer window) → min(idx) per key group. min-of-index over an
  * equal-key group equals the count of strictly smaller keys, so ranks
  * are DETERMINISTIC even though equal-key placement across partitions is
  * not.
  *
  * Sentinel order: doc d's sentinel sorts below all real characters and
  * ascends with d, which makes engine suffix order identical to ordering
  * the plain suffix STRINGS with ties broken by doc id — exactly what a
  * SQL oracle can replay with `ORDER BY substr(txt, off), doc_id`.
  */
object SuffixArray {

  /** Doubling state: `chars` holds one row per real corpus position
    * (doc, off 1-based, len = its document's length); `tables(k)` maps
    * (doc, off) → rank of the 2^k-char sentinel-padded window at that
    * position (sentinel positions included so windows can rank past a
    * document's end). Each table is localCheckpointed — lineage is cut
    * per round, the [[ConnectedComponents]] discipline.
    */
  final case class SuffixContext(
      chars: DataFrame,
      tables: Vector[DataFrame],
      coversCorpus: Boolean) {
    /** Largest k with 2^k ≤ window `w`; requires tables built that far. */
    def tableFor(w: Int): (Int, DataFrame) = {
      require(w >= 1, s"window must be >= 1, got $w")
      val k = 31 - java.lang.Integer.numberOfLeadingZeros(w)
      require(k < tables.length,
        s"window $w needs doubling table $k but only ${tables.length} were built " +
          "(raise maxWindow in build)")
      (1 << k, tables(k))
    }
  }

  /** Build doubling tables until the window either covers the longest
    * document (+1 for its sentinel — full suffix distinction) or is the
    * largest power of two ≤ `maxWindow` (all a fixed-L dedup needs).
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxWindow: Int = Int.MaxValue): SuffixContext = {
    require(maxWindow >= 1, "maxWindow must be positive")
    val base = docs.select(
      col(idCol).cast("long").as("doc"),
      coalesce(col(textCol).cast("string"), lit("")).as("txt"))
    // one row per position, 1..len real chars plus the sentinel at len+1
    val positions = base
      .select(col("doc"), col("txt"), length(col("txt")).cast("long").as("len"))
      .select(col("doc"), col("len"), col("txt"),
        explode(sequence(lit(1L), col("len") + lit(1L))).as("off"))
    val chars = positions
      .filter(col("off") <= col("len"))
      .select(col("doc"), col("off"), col("len"))
      .localCheckpoint()

    // rank of the 1-char window: real chars by byte order (above all
    // sentinels), sentinels by doc order. The composite key IS that order.
    val keyed0 = positions.select(
      col("doc"), col("off"),
      when(col("off") <= col("len"), lit(1)).otherwise(lit(0)).as("k_real"),
      when(col("off") <= col("len"),
        expr("substr(txt, CAST(off AS INT), 1)")).as("k_ch"),
      when(col("off") <= col("len"), lit(-1L)).otherwise(col("doc")).as("k_sent"))
    val t0 = rankByKey(keyed0, Seq("k_real", "k_ch", "k_sent")).localCheckpoint()

    val maxLen = base.agg(max(length(col("txt")))).head().get(0) match {
      case null => 0L
      case n: Int => n.toLong
      case n: Long => n
    }
    val needed = math.min(maxWindow.toLong, maxLen + 1L)

    var tables = Vector(t0)
    var window = 1L
    while (window < needed && window * 2 <= maxWindow.toLong) {
      val prev = tables.last
      val shifted = prev.select(
        col("doc"), (col("off") - lit(window)).as("off"), col("rank").as("k2"))
      val joined = prev.join(shifted, Seq("doc", "off"), "left")
        .select(col("doc"), col("off"), col("rank").as("k1"),
          coalesce(col("k2"), lit(-1L)).as("k2"))
      tables = tables :+ rankByKey(joined, Seq("k1", "k2")).localCheckpoint()
      window *= 2
    }
    SuffixContext(chars, tables, coversCorpus = window >= maxLen + 1L)
  }

  /** The generalized suffix array: one row per real suffix, `rk` its
    * 0-based position in the global order (suffix string ascending, ties
    * — identical suffixes of different documents — by doc ascending).
    * Columns: (rk, doc, off).
    */
  def suffixArray(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ctx = build(docs, idCol, textCol)
    val fin = ctx.tables.last
    val real = fin.join(ctx.chars.select("doc", "off"), Seq("doc", "off"))
    // final ranks are distinct over all positions; restricting to real
    // suffixes keeps their relative order — re-densify distributed
    zipIndexSorted(real.select(col("doc"), col("off"), col("rank")), Seq("rank"))
      .select(col("__idx").as("rk"), col("doc"), col("off"))
  }

  /** Positions whose L-char window recurs (count ≥ 2; across ≥ 2 distinct
    * documents when `crossDocOnly`). Output: (doc, off).
    *
    * Overlapping-window lemma (the sparse-table equality trick): with
    * h = 2^floor(log2 L), two L-windows are equal iff their leading
    * h-windows AND their trailing h-windows (starting at off + L − h) are
    * equal — the overlap is harmless for EQUALITY testing. So one
    * doubling table answers any L, and candidate grouping shuffles one
    * 2-long key per position instead of L characters: at 100 TB the
    * shuffle is ~16 bytes per corpus char, independent of L.
    */
  def duplicateWindows(
      ctx: SuffixContext,
      L: Int,
      crossDocOnly: Boolean = true): DataFrame = {
    require(L >= 1, "window length must be positive")
    // build already distinguished every suffix and the corpus holds no
    // document of length >= L: no candidate positions exist at all
    if (ctx.coversCorpus &&
        (31 - java.lang.Integer.numberOfLeadingZeros(L)) >= ctx.tables.length) {
      return ctx.chars.filter(lit(false)).select("doc", "off")
    }
    val (h, t) = ctx.tableFor(L)
    val pos = ctx.chars
      .filter(col("off") + lit(L.toLong - 1) <= col("len"))
      .select(col("doc"), col("off"))
    val lead = t.select(col("doc"), col("off"), col("rank").as("r1"))
    val trail = t.select(
      col("doc"), (col("off") - lit(L.toLong - h)).as("off"), col("rank").as("r2"))
    // keyed feeds BOTH the dup-key aggregate and the position join-back —
    // checkpoint so the three-way join runs once, not twice
    val keyed = pos.join(lead, Seq("doc", "off")).join(trail, Seq("doc", "off"))
      .localCheckpoint()
    val dupKeys = keyed.groupBy("r1", "r2")
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc")).as("n_docs"))
      .filter(col("n_occ") >= 2 &&
        (if (crossDocOnly) col("n_docs") >= 2 else lit(true)))
      .select("r1", "r2")
    keyed.join(dupKeys, Seq("r1", "r2")).select("doc", "off")
  }

  /** Maximal duplicated spans: merge overlapping-or-adjacent duplicate
    * L-windows per document into islands (gap ≤ L chars between window
    * starts keeps one island — coverage overlaps or touches). Output:
    * (doc, span_start, span_len, n_windows). Per-document window
    * functions only: partition width is bounded by document length.
    */
  def duplicatedSpans(
      ctx: SuffixContext,
      L: Int,
      crossDocOnly: Boolean = true): DataFrame = {
    val w = Window.partitionBy("doc").orderBy("off")
    duplicateWindows(ctx, L, crossDocOnly)
      .withColumn("brk",
        when(col("off") - lag(col("off"), 1).over(w) <= L, lit(0L)).otherwise(lit(1L)))
      .withColumn("isl", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc"), col("isl"))
      .agg(
        min(col("off")).as("span_start"),
        (max(col("off")) - min(col("off")) + lit(L.toLong)).as("span_len"),
        count(lit(1)).as("n_windows"))
      .drop("isl")
  }

  /** Corpus repetition profile: for each window length, how many
    * positions sit inside a recurring window and how many documents are
    * touched. One doubling build serves every length (build to
    * max(lengths)). Output: (win_len, n_dup_windows, n_docs).
    */
  def repetitionProfile(
      ctx: SuffixContext,
      lengths: Seq[Int],
      crossDocOnly: Boolean = true): DataFrame = {
    require(lengths.nonEmpty, "need at least one window length")
    lengths.map { l =>
      duplicateWindows(ctx, l, crossDocOnly)
        .agg(count(lit(1)).as("n_dup_windows"),
          countDistinct(col("doc")).as("n_docs"))
        .select(lit(l.toLong).as("win_len"), col("n_dup_windows"), col("n_docs"))
    }.reduce(_.union(_))
  }

  /** Order-preserving, equality-preserving rank over `keys`: sort,
    * distributed zipWithIndex, min index per key group (= count of
    * strictly smaller keys — deterministic under any equal-key
    * placement). Dense exactly when keys are distinct, which is all the
    * doubling recurrence needs.
    */
  private def rankByKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val idx = zipIndexSorted(df, keys)
    idx.withColumn("rank",
        min(col("__idx")).over(Window.partitionBy(keys.map(col): _*)))
      .select("doc", "off", "rank")
  }

  /** Sort by `keys` (asc, nulls first) and append the global 0-based row
    * index as `__idx` via RDD.zipWithIndex — one extra count job, no
    * single-reducer stage.
    */
  private def zipIndexSorted(df: DataFrame, keys: Seq[String]): DataFrame = {
    val spark: SparkSession = df.sparkSession
    val sorted = df.sort(keys.map(col): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField("__idx", LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }
}
