package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis._

/** Text-analysis operators over the documents table. */
object TextQueries extends QueryGroup {

  // Token counting + shape stats. Oracle mirrors the exact tokenization
  // (split lower(trim(text)) on \s+) so int/int division matches bit-exact.
  private val qT1 = Q(
    "q_t1_token_stats",
    """SELECT doc_id,
      |       CAST(n_chars AS INT) AS n_chars,
      |       CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS token_count,
      |       CAST(list_sum(list_transform(string_split_regex(lower(trim(text)), '\s+'),
      |                                    t -> length(t))) AS DOUBLE)
      |         / len(string_split_regex(lower(trim(text)), '\s+')) AS mean_token_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        col("n_chars").cast("int").as("n_chars"),
        tokenCount(col("text")).as("token_count"),
        meanTokenLen(col("text")).as("mean_token_len"))
      .orderBy("doc_id")
  }

  // Quality-signal ratios: punctuation + English-stopword evidence.
  private val qT2 = Q(
    "q_t2_quality_ratios",
    """SELECT doc_id,
      |       CASE WHEN length(text) = 0 THEN 0.0
      |            ELSE CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE)
      |                 / length(text) END AS punct_ratio,
      |       CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |              t -> list_contains(['the','of','and','to','in','is','you','that','it','was',
      |                                  'for','on','are','as','with','they','at','this','have'], t))) AS DOUBLE)
      |         / len(string_split_regex(lower(trim(text)), '\s+')) AS stopword_ratio
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        punctRatio(col("text")).as("punct_ratio"),
        stopwordRatio(col("text")).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  // Language ID (heuristic — not SQL-expressible; spec-verified on crafted
  // multilingual samples, rows-only here).
  private val qT3 = Q.rowsOnly("q_t3_lang_id") { (s, dir) =>
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(
        col("doc_id"),
        col("lang").as("lang_declared"),
        langId(col("text")).as("lang_predicted"))
      .orderBy("doc_id")
  }

  // Composite quality score + BPE-ish token budget (rows-only; the
  // components are oracle-checked in q_t1/q_t2).
  private val qT4 = Q.rowsOnly("q_t4_quality_score") { (s, dir) =>
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(
        col("doc_id"),
        qualityScore(col("text")).as("quality_score"),
        bpeIshTokenCount(col("text")).as("bpe_ish_tokens"))
      .orderBy("doc_id")
  }

  // Winnowing fingerprint (rolling-hash document sketch; spec-verified for
  // edit-robustness, rows-only here).
  private val qT5 = Q.rowsOnly("q_t5_fingerprint") { (s, dir) =>
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(
        col("doc_id"),
        // fingerprint bound once; a second bare reference would re-run the
        // whole winnowing pass for the size column (no CSE in HOF exprs)
        graft.functions.hof.bind(winnowingFingerprint(col("text"))) { fp =>
          struct(fp.as("fingerprint"), size(fp).as("fp_size"))
        }.as("__fp"))
      .select(col("doc_id"), col("__fp.fingerprint"), col("__fp.fp_size"))
      .orderBy("doc_id")
  }

  override val all: Seq[Q] = Seq(qT1, qT2, qT3, qT4, qT5)
}
