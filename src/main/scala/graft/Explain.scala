package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan for selected
  * queries so scan pushdown (`PushedFilters`/`ReadSchema`), join
  * strategies (broadcast vs shuffle), and codegen coverage
  * (`WholeStageCodegen` spans) can be reviewed. Usage:
  * `runMain graft.Explain [sfDir] [queryName ...]` — no args = audit set.
  */
object Explain {

  val auditSet: Seq[String] = Seq(
    "q_s1_scan_project",      // pushdown + pruning must reach the scan
    "q1_agg",                 // partial aggregation map-side
    "q_j1_inner_join",        // join strategy at scale
    "q_j3_descriptor_lookup", // must be a broadcast hash join
    "q_j4_anti_diff",         // anti-join strategy
    "q_f2_entity_flat",       // the flagship pipeline's full plan
    "q_d3_minhash_lsh_pairs", // signature pass + band-bucket join
    "q_v2_ann_bruteforce_topk", // broadcast NL join + two-phase top-k
    "q_v4_embed_dedup",       // blocked pair join — NO BroadcastNestedLoop
    "q_v6_srp_pairs",         // banded SRP mining + verify join
    "q_e3_asof_attribution",  // union+window as-of — no join operator
    "q_d8_decontaminate",     // probe shingles broadcast; corpus unshuffled
    "q_l2_zorder_pruning",    // Morton IN-list must be a PartitionFilter
    "q_d12_jaccard_prefix",   // prefix posting join — no cartesian
    "q_j12_six_way_join",     // deep star join — dims all broadcast
    "q_g1_pagerank_trade",    // per-iteration join+agg, checkpointed edges
    "q_v12_semantic_dedup",   // cell-blocked pair join + exact verify
    "q_d13_segment_dedup",    // digest-only dedup shuffle; text moves once
    "q_g2_cooccurrence",      // basket-key self-join, k-cut before lift joins
    "q_e10_rolling_anomaly",  // per-key windows only — no global sort except output
    "q_v16_hard_triplets",    // block-pair shuffle + one two-heap hash agg
    "q_q15_mutual_information", // one contingency aggregate; windows on cells only
    "q_c14_classifier_eval",  // distinct-score reduction before any window
    "q_q20_bottomk_quantiles", // partial_bottom_k_sample BEFORE the Exchange —
                               // only ≤k-entry sketch buffers shuffle
    "q_m16_png_pixel_stats",  // one kernel call per row; stats fold scan-side
    "q_g24_deepwalk",         // per-step (node,rank) hash joins, no expansion
    "q_v10_ann_ivf_persisted", // probe scans nprobe/numCentroids of the index:
                               // dynamic partition pruning on cell — the
                               // 100 TB centerpiece claim, plan-pinned
    "q_d23_exact_substring_corpus", // 3 ranking rounds only (baseWindow 8);
                               // lead/min windows, no joins, no zip jobs
    "q_d20_suffix_array",      // ordered ranks: sort + zipWithIndex + min-rank
                               // chain — the one suffix-array plan that PAYS
                               // for order; job-count evidence in PERF.md
    "q_d24_substring_index_probe", // postings scan carries a PartitionFilters
                               // dynamicpruning(kp IN batch-prefixes) — the
                               // probe ∝ batch claim, plan-pinned
    "q_t34_html_extract",      // the whole textify regex chain + block
                               // classification runs scan-side: Scan →
                               // Project → Generate → Filter → Projects,
                               // then ONE per-doc window Exchange; the only
                               // other Exchange is the output ORDER BY
    "q_t32_blocklist_annotate", // multi_match inside WholeStageCodegen;
                               // single text scan, zero shuffle pre-sort
    "q_m29_warc_gz_records",   // gzip_members kernel + per-member parse +
                               // forall validity ALL scan-side: the only
                               // Exchange is the output ORDER BY
    "q_f16_shard_export",      // two-level prefix sum: in-bucket window +
                               // broadcast bucket offsets — NO corpus-sized
                               // single-partition window anywhere
    "q_m31_http_envelope",     // status/header/chunk/decode chain ALL
                               // scan-side (bounded folds + codegen
                               // inflate kernels): the only Exchange is
                               // the output ORDER BY
    "q_t44_trained_langid",    // model grid + priors BROADCAST; per-doc
                               // histogram partial-aggregates map-side;
                               // argmax window partitions per doc —
                               // nothing corpus-wide in one partition
    "q_f20_frontier_pipeline", // outlinks scan-side; robots decision on
                               // DISTINCT (host, path) then join back;
                               // schedule window partitions per host —
                               // never corpus-wide
    "q_c36_redirect_chains")   // maxHops+1 hash joins against ONE
                               // materialized lookup; live set shrinks
                               // monotonically; no corpus-wide window

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else auditSet
    val spark: SparkSession = GraftSession.local("graft-explain")
    names.foreach { n =>
      println(s"\n${"=" * 78}\n== $n\n${"=" * 78}")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
