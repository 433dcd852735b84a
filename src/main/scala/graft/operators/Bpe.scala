package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.functions.TextAnalysis

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) made
  * deterministic and oracle-replayable — the vocabulary-learning step a
  * corpus pipeline runs before token-budget accounting, here at the
  * word/character level of [[TextAnalysis.tokens]].
  *
  * Each round: count adjacent symbol pairs across the corpus (weighted by
  * word frequency), adopt the most frequent pair as a merge under the
  * TOTAL order (count DESC, left ASC, right ASC), and apply it
  * LEFTMOST-GREEDY to every word — within a run of overlapping matches
  * (`aaaa` under `(a,a)`), positions at even offset in the run merge,
  * exactly the sequential greedy result. The learned merge table is the
  * output; rounds 2+ count pairs over ALREADY-MERGED symbols, so the gate
  * verifies the application logic, not just the counting.
  *
  * Shape at scale: the working frame is the DISTINCT-WORD vocabulary with
  * counts — bounded by Heaps' law, not corpus size — so after the one
  * corpus-wide word count every round touches only vocabulary rows: one
  * lead() window per word, one hash aggregate for pair counts, a 1-row
  * TakeOrderedAndProject for the argmax (the bounded driver-artifact
  * discipline — the merge ships back as plan LITERALS, never a join), and
  * two (word, pos) equi-joins to apply it. The symbol frame is
  * localCheckpoint'ed (and freed) each round — the PageRank/CC iterative
  * discipline — so lineage stays flat across rounds.
  */
object Bpe {

  /** Learn `rounds` merges over the corpus's whitespace words.
    *
    * @return (round, left, right, pair_count), round 1-based; fewer rows
    *         than `rounds` only when the corpus runs out of pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, syms) = train(docs, textCol, rounds)
    bridge.freeLocalCheckpoint(syms)
    merges.toDF("round", "merge_left", "merge_right", "pair_count")
  }

  /** Corpus tokenization summary AFTER the learned merges — the
    * "how well does this tokenizer compress" number a vocabulary sweep
    * reads: one row (n_merges, total_words, total_chars, total_tokens,
    * vocab_symbols, chars_per_token, tokens_per_word). Everything is
    * exact integer sums over the vocabulary frame until the two final
    * divisions.
    */
  def compressionStats(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, syms) = train(docs, textCol, rounds)
    val perWord = syms.groupBy("w")
      .agg(max("wc").as("wc"), count(lit(1)).as("n_syms"))
    val row = perWord
      .agg(
        sum(col("wc")).cast("long").as("total_words"),
        sum(col("wc") * length(col("w"))).cast("long").as("total_chars"),
        sum(col("wc") * col("n_syms")).cast("long").as("total_tokens"))
      .crossJoin(broadcast(
        syms.agg(count_distinct(col("sym")).cast("long").as("vocab_symbols"))))
      .head() // bounded: the one-row summary — frees the checkpoint below
    bridge.freeLocalCheckpoint(syms)
    Seq((merges.size, row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
      .toDF("n_merges", "total_words", "total_chars", "total_tokens", "vocab_symbols")
      .select(col("*"),
        (col("total_chars").cast("double") / col("total_tokens")).as("chars_per_token"),
        (col("total_tokens").cast("double") / col("total_words")).as("tokens_per_word"))
  }

  private def train(
      docs: DataFrame,
      textCol: String,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1, "learn at least one merge")

    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    // char-level symbols, densely positioned 1..len(w)
    var syms = words
      .select(col("w"), col("wc"),
        posexplode(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as(Seq("__p", "sym")))
      .select(col("w"), col("wc"), (col("__p") + 1).as("pos"), col("sym"))
      .localCheckpoint(true)

    val byPos = Window.partitionBy("w").orderBy("pos")
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(byPos))
      val top = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("wc")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect() // bounded: exactly one row — the merge becomes literals
      if (top.isEmpty) { exhausted = true }
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, c))
        // leftmost-greedy application: among match positions, islands of
        // consecutive positions keep every second match (even in-run offset)
        val sel = withNext
          .filter(col("sym") === lit(a) && col("nxt") === lit(b))
          .select(col("w").as("mw"), col("pos").as("mp"))
          .withColumn("__rn",
            row_number().over(Window.partitionBy("mw").orderBy("mp")))
          .withColumn("__island", col("mp") - col("__rn"))
          .withColumn("__idx",
            row_number().over(Window.partitionBy("mw", "__island").orderBy("mp")) - 1)
          .filter(col("__idx") % 2 === 0)
          .select(col("mw"), col("mp"))
        val applied = syms
          .join(sel.select(col("mw").as("w"), col("mp").as("pos"),
            lit(true).as("__st")), Seq("w", "pos"), "left")
          .join(sel.select(col("mw").as("w"), (col("mp") + 1).as("pos"),
            lit(true).as("__dr")), Seq("w", "pos"), "left")
          .filter(col("__dr").isNull)
          .select(col("w"), col("wc"), col("pos"),
            when(col("__st"), lit(a + b)).otherwise(col("sym")).as("sym"))
          .withColumn("__np", row_number().over(byPos))
          .select(col("w"), col("wc"), col("__np").as("pos"), col("sym"))
        val next = applied.localCheckpoint(true)
        bridge.freeLocalCheckpoint(syms)
        syms = next
      }
      r += 1
    }
    (merges.result(), syms)
  }
}
