package graft.queries

import graft.streaming.EventStreams

/** Structured Streaming operators, each run to completion with
  * Trigger.AvailableNow so the driver's batch DuckDB oracle verifies the
  * streaming implementation end to end (same SQL as the batch twins
  * q_e1/q_e2 in [[RelationalQueries]]).
  */
object StreamingQueries extends QueryGroup {

  private val qSt1 = Q(
    "q_st1_stream_window_agg",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
      |       event_type,
      |       CAST(count(*) AS INT) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    EventStreams.windowedAggAvailableNow(s, dir)
  }

  private val qSt2 = Q(
    "q_st2_stream_sessionize",
    """SELECT user_id,
      |       CAST(count(*) AS INT) AS n_events,
      |       CAST(sum(CASE WHEN prev_ts IS NULL
      |                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END) AS INT) AS n_sessions
      |FROM (SELECT user_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |      FROM events) t
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    EventStreams.sessionCountsAvailableNow(s, dir)
  }

  private val qSt3 = Q(
    "q_st3_stream_dedup",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    EventStreams.dedupKeysAvailableNow(s, dir)
  }

  // Stream-stream interval join (purchase ← clicks by the same user in
  // the prior hour): watermarks on both sides + the time-bounded join
  // condition keep the state store to one horizon per side. The oracle is
  // the equivalent batch interval join.
  private val qSt4 = Q(
    "q_st4_stream_stream_join",
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts
      |  FROM events),
      |p AS (SELECT event_id AS purchase_id, user_id, ts FROM ev
      |      WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS click_id, user_id, ts FROM ev
      |      WHERE event_type = 'click')
      |SELECT p.purchase_id, p.user_id, c.click_id,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM p JOIN c ON p.user_id = c.user_id
      |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
    EventStreams.clickAttributionAvailableNow(s, dir)
  }

  // Stream-static enrichment join (events stream × customer dimension)
  // with a running per-segment aggregate — the reference-data-enrichment
  // shape; the static side is broadcast-sized, the stream never shuffles
  // for the join. Oracle = the batch equivalent.
  private val qSt5 = Q(
    "q_st5_stream_static_join",
    """SELECT c_mktsegment, CAST(count(*) AS INT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    EventStreams.segmentTotalsAvailableNow(s, dir)
  }

  // Streaming corpus-ingest filter: quality/repetition rules scan-side
  // per micro-batch + cross-batch exact content dedup (no-op on this
  // corpus — q_d1 proves zero exact dups — so the oracle is the pure
  // filter; the state machinery still runs). Oracle replays the token
  // arithmetic verbatim.
  private val qSt6 = Q(
    "q_st6_stream_corpus_filter",
    """WITH t AS (
      |  SELECT doc_id, lang, n_chars,
      |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |              ELSE string_split_regex(lower(trim(text)), '\s+') END AS tk
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, lang, n_chars,
      |         CASE WHEN len(tk) = 0 THEN CAST(0.0 AS DOUBLE)
      |              ELSE CAST(list_max(list_transform(list_distinct(tk),
      |                     t -> len(list_filter(tk, x -> x = t)))) AS DOUBLE) / len(tk) END AS tts,
      |         CASE WHEN len(tk) < 2 THEN CAST(0.0 AS DOUBLE)
      |              ELSE 1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk)),
      |                     i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE)
      |                   / (len(tk) - 1) END AS dbf
      |  FROM t)
      |SELECT doc_id, lang, n_chars FROM m
      |WHERE n_chars >= 50 AND tts < 0.3 AND dbf < 0.2
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.streaming.CorpusStream.filteredAvailableNow(s, dir)
  }

  // Validated STREAMING ingest: the q_q1 contract rules (scan-side, zero
  // state) applied per micro-batch to the orders file stream — the
  // reference's whole domain is ingestion, and at scale the landing zone
  // arrives incrementally; validation must ride the stream, not wait for
  // a batch re-scan. Oracle = q_q1's SQL verbatim (same rows, streaming
  // execution).
  private val qSt8 = Q(
    "q_st8_stream_validated_ingest",
    QualityQueries.qQ1.oracle.get) { (s, dir) =>
    import org.apache.spark.sql.functions._
    import graft.operators.SchemaValidation
    import graft.operators.SchemaValidation.FieldRule
    val st = EventStreams.streamSession(s, EventStreams.defaultStatePartitions)
    EventStreams.runToTable(
      st,
      SchemaValidation.validate(
        graft.Tables.readStream(st, dir, "orders"),
        Seq(
          FieldRule("o_custkey", required = true),
          FieldRule("o_orderstatus", allowed = Some(Seq("O", "F"))),
          FieldRule("o_totalprice", min = Some(0.0), max = Some(450000.0))))
        .select(
          col("o_orderkey"),
          col("is_valid"),
          size(col("errors")).as("n_errors"),
          concat_ws(",", col("errors")).as("errors_str")),
      s"stream_validated_ingest_${System.nanoTime()}",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("o_orderkey")
  }

  // q_st6's WATERMARK-BOUNDED-state twin (dropDuplicatesWithinWatermark):
  // state holds only content hashes younger than the watermark — the
  // variant an infinite landing zone must run. A deterministic synthetic
  // ingest timestamp spreads docs over one hour inside a two-hour
  // horizon, so the output — and therefore the oracle — is exactly
  // q_st6's; what changes is the state contract the plan runs under.
  private val qSt7 = Q(
    "q_st7_stream_bounded_dedup",
    qSt6.oracle.get) { (s, dir) =>
    import org.apache.spark.sql.functions._
    graft.streaming.CorpusStream.filteredBoundedStateAvailableNow(
      s, dir,
      ingestTs = timestamp_micros(
        lit(1700000000000000L) + col("doc_id") % 3600 * 1000000L),
      horizon = "2 hours")
  }

  // Left-outer stream-stream interval join: the inner matches of q_st4
  // PLUS a null-extended row per purchase the watermark PROVED unmatched
  // — i.e. purchases older than the final global watermark
  // (min of both sides' max ts − the 2 h delay). Purchases inside that
  // horizon never null-emit (a late click could still arrive); the
  // oracle replays the exact horizon rule, so the streaming outer-join
  // eviction semantics are value-pinned against batch SQL.
  private val qSt9 = Q(
    "q_st9_stream_outer_join",
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts
      |  FROM events),
      |p AS (SELECT event_id AS purchase_id, user_id, ts FROM ev
      |      WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS click_id, user_id, ts FROM ev
      |      WHERE event_type = 'click'),
      |w AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
      |             - INTERVAL 2 HOUR AS wm)
      |SELECT * FROM (
      |  SELECT p.purchase_id, p.user_id, c.click_id,
      |         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |  UNION ALL
      |  SELECT p.purchase_id, p.user_id,
      |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      |  FROM p CROSS JOIN w
      |  WHERE p.ts < w.wm AND NOT EXISTS (
      |    SELECT 1 FROM c WHERE c.user_id = p.user_id
      |      AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR))
      |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin) { (s, dir) =>
    EventStreams.clickAttributionLeftOuterAvailableNow(s, dir)
  }

  // q_e9's streaming twin: per-user successor pairing via
  // flatMapGroupsWithState (state = ONE cursor struct per user — |users|
  // rows of state regardless of stream length), folded to the same
  // (cur, next, n, p) matrix. Oracle = the batch lead-window SQL.
  private val qSt10 = Q(
    "q_st10_stream_transitions",
    """WITH seq AS (
      |  SELECT event_type AS cur,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next
      |  FROM events),
      |trans AS (SELECT cur, next, count(*) AS n FROM seq
      |          WHERE next IS NOT NULL GROUP BY 1, 2),
      |ctx AS (SELECT cur, sum(n) AS c FROM trans GROUP BY 1)
      |SELECT cur, next, n, CAST(n AS DOUBLE) / c AS p
      |FROM trans JOIN ctx USING (cur)
      |ORDER BY cur, next""".stripMargin) { (s, dir) =>
    EventStreams.markovTransitionsAvailableNow(s, dir)
  }

  // q_a12's streaming twin: the MV starts from the base build and the
  // signed change stream folds in per micro-batch via the SAME batch
  // fold operator — the oracle recomputes the final state directly, so
  // any cross-batch drift breaks the hash.
  private val qSt11 = Q(
    "q_st11_stream_mv",
    """SELECT o_custkey,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM orders
      |WHERE o_orderkey % 5 = 0 OR o_orderkey % 11 <> 0
      |GROUP BY 1 ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    EventStreams.mvMaintainAvailableNow(s, dir)
  }

  // q_f6's streaming twin: the CDC change batch arrives as a stream and
  // folds into the on-disk snapshot per micro-batch through the SAME
  // batch MERGE operator (SyncDiff.applyCdc); the oracle recomputes the
  // converged snapshot directly (q_f6's SQL verbatim), so any cross-batch
  // drift breaks the hash.
  private val qSt12 = Q(
    "q_st12_stream_cdc_merge",
    """WITH changes AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 7 = 3 THEN c_name ELSE c_name || ' (updated)' END AS c_name,
      |         c_nationkey,
      |         CASE WHEN c_custkey % 7 = 3 THEN c_acctbal ELSE c_acctbal + 100 END AS c_acctbal,
      |         c_mktsegment,
      |         CASE WHEN c_custkey % 7 = 3 THEN 'D' ELSE 'U' END AS op
      |  FROM customer WHERE c_custkey % 7 = 3 OR c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'New Customer ' || CAST(c_custkey AS VARCHAR),
      |         c_nationkey, 0.0, 'BUILDING', 'U'
      |  FROM customer WHERE c_custkey % 97 = 0)
      |SELECT * FROM (
      |  SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
      |  FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = c.c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM changes WHERE op <> 'D')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    EventStreams.cdcMergeAvailableNow(s, dir)
  }

  // NATIVE streaming session windows: the built-in session_window
  // aggregation (state-store window merging) vs q_st2's hand-rolled
  // mapGroupsWithState sessionizer. Session identity is the BATCH
  // session_window contract (merge while gap < 30 min), so the oracle is
  // q_e2b's lag SQL — note `>=` where q_st2's custom gap rule is `>`:
  // the two sessionizers legitimately differ on exactly-30-min gaps and
  // each is pinned to its own oracle.
  private val qSt13 = Q(
    "q_st13_stream_session_window",
    """SELECT user_id,
      |       CAST(count(*) AS INT) AS n_events,
      |       CAST(sum(CASE WHEN prev_ts IS NULL
      |                       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END) AS INT) AS n_sessions
      |FROM (SELECT user_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |      FROM events) t
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    EventStreams.sessionWindowAvailableNow(s, dir)
  }

  // STREAMING DSIR scoring: the q_c10 model (B-row bucket log-ratio
  // table, target = src1) fitted batch-side, collected to a plan
  // literal, and applied STATELESSLY to every streamed document — a
  // scan-side token fold, no state store, Append mode: the landing-zone
  // quality-gate shape. The oracle replays the per-doc fold (per-token
  // lookups summed per doc; grouping-order noise is inside the harness's
  // 6-decimal tolerance, see Dsir.scoreWithRatios scaladoc).
  private val qSt14 = Q(
    "q_st14_stream_dsir_score",
    """WITH tok AS (
      |  SELECT doc_id, source, unnest(
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(lower(trim(text)), '\s+') END) AS tok
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, source,
      |         ('0x' || substring(md5(tok), 1, 15))::BIGINT % 256 AS bucket
      |  FROM tok),
      |th AS (SELECT bucket, count(*) AS ct FROM b WHERE source = 'src1' GROUP BY 1),
      |rh AS (SELECT bucket, count(*) AS cr FROM b WHERE source <> 'src1' GROUP BY 1),
      |nt AS (SELECT coalesce(sum(ct), 0) AS nt FROM th),
      |nr AS (SELECT coalesce(sum(cr), 0) AS nr FROM rh),
      |rat AS (
      |  SELECT coalesce(rh.bucket, th.bucket) AS bucket,
      |         ln((CAST(coalesce(th.ct, 0) + 1 AS DOUBLE) * (nr.nr + 256)) /
      |            (CAST(coalesce(rh.cr, 0) + 1 AS DOUBLE) * (nt.nt + 256))) AS log_ratio
      |  FROM rh FULL OUTER JOIN th ON rh.bucket = th.bucket, nt, nr)
      |SELECT b.doc_id, CAST(count(*) AS INT) AS n_tokens,
      |       sum(rat.log_ratio) AS log_w
      |FROM b JOIN rat USING (bucket)
      |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
    graft.streaming.CorpusStream.dsirScoredAvailableNow(s, dir)
  }

  // Streaming k-means scoring (VectorStream.kmeansScoredAvailableNow):
  // q_v14's online twin — the deterministic batch-fitted centroids ship
  // into the stream as k×dim plan literals (the DSIR bounded-model
  // discipline) and every arriving embedding is assigned scan-side:
  // stateless, no state store, no watermark. The fold keeps the
  // incumbent unless a STRICTLY smaller round(d, 6) appears, matching
  // KMeans.assign's tie-break, so the oracle is the SAME two-round
  // Lloyd unroll as q_v14 at the per-vector grain: online and batch
  // assignments must agree on every vector.
  private val qSt15 = Q(
    "q_st15_stream_kmeans_score",
    """WITH v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
      |seeds AS (SELECT row_number() OVER (ORDER BY id) - 1 AS c, emb
      |          FROM (SELECT id, emb FROM v ORDER BY id LIMIT 8)),
      |c0 AS (SELECT c, i AS p, CAST(emb[i] AS DOUBLE) AS m
      |       FROM seeds, range(1, 65) t(i)),
      |vd AS (SELECT id, i AS p, CAST(emb[i] AS DOUBLE) AS x
      |       FROM v, range(1, 65) t(i)),
      |d1 AS (SELECT vd.id, c0.c, sum((vd.x - c0.m) * (vd.x - c0.m)) AS d
      |       FROM vd JOIN c0 ON vd.p = c0.p GROUP BY 1, 2),
      |a1 AS (SELECT id, c FROM (
      |         SELECT id, c, row_number() OVER (
      |           PARTITION BY id ORDER BY round(d, 6), c) AS rn
      |         FROM d1) WHERE rn = 1),
      |c1 AS (SELECT a1.c, vd.p,
      |              CAST(sum(CAST(vd.x AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS m
      |       FROM a1 JOIN vd ON a1.id = vd.id GROUP BY 1, 2),
      |d2 AS (SELECT vd.id, c1.c, sum((vd.x - c1.m) * (vd.x - c1.m)) AS d
      |       FROM vd JOIN c1 ON vd.p = c1.p GROUP BY 1, 2),
      |a2 AS (SELECT id, c, d FROM (
      |         SELECT id, c, d, row_number() OVER (
      |           PARTITION BY id ORDER BY round(d, 6), c) AS rn
      |         FROM d2) WHERE rn = 1)
      |SELECT id AS vec_id, CAST(c AS INT) AS cluster, d AS dist2
      |FROM a2 ORDER BY vec_id""".stripMargin) { (s, dir) =>
    graft.streaming.VectorStream.kmeansScoredAvailableNow(s, dir)
  }

  // Streaming trained-classifier scoring
  // (CorpusStream.qualityScoredAvailableNow): q_c13's online twin — the
  // batch-fitted logistic weights ship into the stream as plan literals
  // and every arriving document is scored statelessly, features folded
  // over the row's own token array (integer counts exactly equal to the
  // batch explode+groupBy form). Oracle = q_c13's full train-and-score
  // SQL verbatim: online scores must equal the batch pass on every doc.
  private val qSt16 = Q(
    "q_st16_stream_quality_score",
    CurationQueries.qC13.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.qualityScoredAvailableNow(s, dir)
  }

  // The full incremental dedup pipeline ON THE STREAM
  // (CorpusStream.componentsAvailableNow): crawl drops arrive as
  // micro-batches, each probes the persisted MinHash index for its pairs
  // (work ∝ batch), folds them into the running component labeling via
  // ConnectedComponents.appendEdges (closure over the contracted batch
  // graph only), and appends itself to the index. The oracle is the
  // from-scratch full-corpus closure — streamed-incremental ≡ batch
  // rebuild on every document, and min-id labels make the result
  // independent of landing-zone file order.
  private val qSt17 = Q(
    "q_st17_stream_components",
    s"""WITH RECURSIVE pairs AS (${DedupQueries.pairsOracle}),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(u, lbl) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u),
       |comp AS (SELECT u, min(lbl) AS cluster_id FROM reach GROUP BY u)
       |SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
       |FROM documents d LEFT JOIN comp c ON c.u = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    // shards = 2: per-micro-batch FIXED overhead dominates this gate
    // (PERF.md: 1.7× at 10× data), so two drops — one seeding the index,
    // one exercising the fused probe+append+fold path — buy the same
    // coverage as three at ~2/3 the cost
    graft.streaming.CorpusStream.componentsAvailableNow(s, dir, shards = 2)
  }

  // Streaming cardinality (EventStreams.hllDistinctUsersAvailableNow):
  // per-hour distinct users via the DataSketches HLL aggregate — exact
  // count_distinct is unsupported on streams (unbounded per-group value
  // state); the sketch is the production answer with fixed register
  // state and merge-associative micro-batch folds. Sketches are
  // deterministic on the value SET, so the in-plan gate asserts
  // streamed estimate ≡ batch estimate EXACTLY, plus the q_a11 ±5%
  // bound against the exact count the oracle pins.
  private val qSt18 = Q(
    "q_st18_stream_hll_distinct",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_n,
      |       true AS est_eq, true AS est_ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    EventStreams.hllDistinctUsersAvailableNow(s, dir)
  }

  // Streaming RUN REPORT (CorpusStream.ingestWithReportAvailableNow):
  // S11's report brought to the landing zone — per-micro-batch counter
  // folds (rows in / kept / quarantined) accumulated into one report
  // frame and rendered as the same FileSinks.RunReport the batch
  // pipeline writes. Batch rows are keyed by the deterministic shard id
  // (doc_id % shards, constant within a one-file micro-batch), so the
  // oracle replays the counts with a plain GROUP BY regardless of the
  // landing zone's file listing order; the rendered report file's
  // totals-match is spec-gated.
  private val qSt19 = Q(
    "q_st19_stream_run_report",
    """SELECT CAST(doc_id % 2 AS INT) AS batch_shard,
      |       CAST(count(*) AS BIGINT) AS n_in,
      |       CAST(sum(CASE WHEN n_chars >= 50 AND trim(text) <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN n_chars >= 50 AND trim(text) <> '' THEN 0 ELSE 1 END) AS BIGINT) AS n_quarantined
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.streaming.CorpusStream.ingestWithReportAvailableNow(
      s, dir,
      java.nio.file.Files.createTempDirectory("graft_report_out").toString,
      shards = 2)
      .orderBy("batch_shard")
  }

  // Streaming BPE tokenization (CorpusStream.bpeTokenizedAvailableNow):
  // merges learned in batch ship as plan literals, every arriving doc
  // tokenizes statelessly scan-side (Bpe.applyMerges) — the q_st16
  // classifier posture for the tokenizer. The oracle replays the full
  // batch tokenization (the q_t22 bpeRound unroll) and aggregates the
  // per-document (n_words, n_tokens, order-sensitive digest): streamed
  // tokenization must equal the batch vocabulary pass on every doc.
  private val qSt20 = Q(
    "q_st20_stream_bpe_tokens",
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |  FROM documents WHERE trim(text) <> ''),
       |words AS (SELECT w, count(*) AS wc FROM toks GROUP BY w),
       |s0 AS (
       |  SELECT w, wc, CAST(ps.pos AS INT) AS pos, ps.sym AS sym
       |  FROM (SELECT w, wc, unnest(list_transform(range(len(w)),
       |               i -> {'pos': i + 1, 'sym': w[i+1:i+1]})) AS ps
       |        FROM words)),
       |${TextQueries.bpeRound(1)},
       |${TextQueries.bpeRound(2)},
       |${TextQueries.bpeRound(3)},
       |ws AS (SELECT w, count(*) AS n_syms,
       |              sum(len(sym)) AS s0len, sum(len(sym) * pos) AS s1len
       |       FROM s3 GROUP BY w),
       |docw AS (
       |  SELECT doc_id, dw.wi, dw.w
       |  FROM (SELECT doc_id, unnest(list_transform(
       |          range(len(string_split_regex(lower(trim(text)), '\\s+'))),
       |          i -> {'wi': i + 1,
       |                'w': string_split_regex(lower(trim(text)), '\\s+')[i+1]})) AS dw
       |        FROM documents WHERE trim(text) <> '')),
       |agg AS (
       |  SELECT d.doc_id,
       |         CAST(count(*) AS INT) AS n_words,
       |         CAST(sum(ws.n_syms) AS BIGINT) AS n_tokens,
       |         CAST(sum(d.wi * 31 * ws.s0len + ws.s1len) AS BIGINT) AS tok_digest
       |  FROM docw d JOIN ws ON ws.w = d.w GROUP BY 1)
       |SELECT doc.doc_id,
       |       coalesce(agg.n_words, 0) AS n_words,
       |       coalesce(agg.n_tokens, 0) AS n_tokens,
       |       coalesce(agg.tok_digest, 0) AS tok_digest
       |FROM documents doc LEFT JOIN agg ON agg.doc_id = doc.doc_id
       |ORDER BY doc.doc_id""".stripMargin) { (s, dir) =>
    graft.streaming.CorpusStream.bpeTokenizedAvailableNow(s, dir)
  }

  // Streaming conformal scoring (CorpusStream.conformalScoredAvailableNow):
  // classifier weights AND the split-conformal threshold fitted in
  // batch (q_c20's machinery) ship as plan literals; every streamed doc
  // gets score + prediction-set membership statelessly. The oracle
  // replays the training unroll, the threshold rank, and every per-doc
  // set decision — streamed uncertainty ≡ the batch conformal layer.
  private val qSt21 = Q(
    "q_st21_stream_conformal",
    s"""WITH ${CurationQueries.qcTrainCtes},
       |sc AS (SELECT f.doc_id, f.y,
       |              round(1.0 / (1.0 + exp(-(${CurationQueries.qcZ("wt3")}))), 6) AS score
       |       FROM f CROSS JOIN wt3),
       |cal AS (SELECT CASE WHEN y = 1.0 THEN 1.0 - score ELSE score END AS r,
       |               score AS s, y
       |        FROM sc WHERE doc_id % 5 = 0),
       |nk AS (SELECT CAST(count(*) AS BIGINT) AS n_cal,
       |              CAST(ceil((count(*) + 1) * 0.9) AS BIGINT) AS k FROM cal),
       |cum AS (SELECT r, sum(c) OVER (ORDER BY r, s, y
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
       |        FROM (SELECT r, s, y, count(*) AS c FROM cal GROUP BY 1, 2, 3)),
       |q AS (SELECT min(r) AS qhat FROM cum CROSS JOIN nk WHERE cm >= nk.k)
       |SELECT sc.doc_id, sc.score,
       |       (q.qhat IS NULL OR 1.0 - sc.score <= q.qhat) AS in_set_1,
       |       (q.qhat IS NULL OR sc.score <= q.qhat) AS in_set_0,
       |       CAST((CASE WHEN q.qhat IS NULL OR 1.0 - sc.score <= q.qhat
       |              THEN 1 ELSE 0 END)
       |          + (CASE WHEN q.qhat IS NULL OR sc.score <= q.qhat
       |              THEN 1 ELSE 0 END) AS INT) AS set_size
       |FROM sc CROSS JOIN q
       |ORDER BY sc.doc_id""".stripMargin) { (s, dir) =>
    graft.streaming.CorpusStream.conformalScoredAvailableNow(s, dir)
  }

  // Streaming MULTIMODAL decode (CorpusStream.transformAvailableNow +
  // the q_m11 aHash frame): media drops land as micro-batches and each
  // batch's perceptual hashes compute inside a full batch plan — the
  // generic foreachBatch transform harness carrying the multimodal
  // family onto the landing zone. Per-document output is identical to
  // the batch pass regardless of sharding, so the oracle is q_m11's
  // verbatim.
  private val qSt22 = Q(
    "q_st22_stream_image_ahash",
    MultimodalQueries.qM11.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2)(
      MultimodalQueries.bmpAHashFrame)
      .orderBy("doc_id")
  }

  // Streaming DECONTAMINATION at the landing zone
  // (CorpusStream.transformAvailableNow + Decontamination
  // .overlapFraction): eval-set leakage checked per micro-batch at
  // INGEST — the place a production pipeline actually wants it, before
  // contaminated pages reach the corpus. The probe (eval) corpus is a
  // static frame joined per batch; every document's graded fraction is
  // row-local given the probe set, so streamed ≡ batch and the oracle
  // is q_d17's verbatim.
  private val qSt23 = Q(
    "q_st23_stream_decontamination",
    DedupQueries.qD17.oracle.get) { (s, dir) =>
    // probe corpus re-read per batch straight from parquet — a 5-row
    // frame; a localCheckpoint here outlives its blocks once the stream's
    // micro-batch executions interleave with the driver plan (observed
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), and the scan is cheaper than
    // the residency anyway
    val probes = graft.Tables.load(s, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 5)
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch =>
        graft.operators.Decontamination
          .overlapFraction(
            batch.filter(org.apache.spark.sql.functions.col("doc_id") >= 5),
            probes, "doc_id", "text", k = 5)
          .select("doc_id", "n_shingles", "n_hits", "overlap_fraction")
    }.orderBy("doc_id")
  }

  // Streaming Naive Bayes scoring (CorpusStream.nbScoredAvailableNow):
  // the q_c22 count-based classifier trained in batch, served per
  // micro-batch by joining the vocabulary-bounded model frame (shipped
  // via a temp-parquet round trip — DECIMAL log-likelihoods round-trip
  // exactly, and checkpoints don't survive interleaved micro-batch
  // executions). Scoring is per-doc given the model, so streamed ≡
  // batch on every document and the oracle is q_c22's verbatim.
  private val qSt24 = Q(
    "q_st24_stream_naive_bayes",
    CurationQueries.qC22.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.nbScoredAvailableNow(s, dir, shards = 2)
  }

  // Streaming PII scrubbing AT THE LANDING ZONE
  // (CorpusStream.transformAvailableNow + PiiRedaction.redact): the
  // production posture — text is scrubbed per micro-batch BEFORE it
  // lands in the corpus, so raw PII never persists downstream.
  // Redaction is row-local, so streamed ≡ batch exactly; the oracle is
  // q_t29's generated rewrite chain minus the planted probes (the
  // landing zone streams the corpus as-is).
  private val qSt25 = Q(
    "q_st25_stream_pii_scrub", {
      val steps = graft.operators.PiiRedaction.patterns.zipWithIndex.map {
        case ((name, pat, repl), i) =>
          val carry = graft.operators.PiiRedaction.patterns.take(i)
            .map(p => s"${p._1}, ").mkString
          s"""sr${i + 1} AS (
             |  SELECT doc_id, $carry
             |         CAST(len(regexp_extract_all(cur, '$pat')) AS INT) AS $name,
             |         regexp_replace(cur, '$pat', '$repl', 'g') AS cur
             |  FROM sr$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH sr0 AS (SELECT doc_id, coalesce(text, '') AS cur FROM documents),
         |$steps
         |SELECT doc_id, n_emails, n_ssns, n_phones, n_ips,
         |       md5(cur) AS redacted_md5
         |FROM sr4 ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.functions.{col, md5}
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch =>
        graft.operators.PiiRedaction.redact(batch, "doc_id", "text")
          .select(col("doc_id"), col("n_emails"), col("n_ssns"),
            col("n_phones"), col("n_ips"), md5(col("redacted")).as("redacted_md5"))
    }.orderBy("doc_id")
  }

  // Streaming MEDIA METADATA at the landing zone: the q_m14 MP4
  // box-walk decode applied PER MICRO-BATCH as clips arrive — where a
  // video corpus actually wants its duration/brand cuts, before anything
  // persists downstream. Decode is row-local (two bounded folds per
  // payload, zero state), so streamed ≡ batch on every document; the
  // oracle is q_m14's verbatim.
  private val qSt26 = Q(
    "q_st26_stream_media_meta",
    MultimodalQueries.mp4OracleSql) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch => MultimodalQueries.mp4Decoded(batch)
    }.orderBy("doc_id")
  }

  // Streaming COMPRESSED-PIXEL decode at the landing zone
  // (CorpusStream.transformAvailableNow + the q_m17 dual-representation
  // PNG frame): each micro-batch runs the REAL zlib inflate + five-filter
  // reconstruction + perceptual hash as images arrive — where an image
  // corpus wants its near-dup signatures, before anything persists.
  // Decode is row-local (one kernel call per payload, zero state), so
  // streamed ≡ batch on every document; the oracle is q_m17's verbatim.
  private val qSt27 = Q(
    "q_st27_stream_png_ahash",
    MultimodalQueries.qM17.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2)(
      MultimodalQueries.pngAHashFrame)
      .orderBy("doc_id")
  }

  // Streaming CONTENT-DEFINED CHUNKING at the landing zone
  // (CorpusStream.transformAvailableNow + Chunking.cdcChunks): chunk
  // inventories computed per micro-batch as documents arrive — the
  // storage-dedup posture, where shifted re-uploads dedup against chunks
  // already landed. Chunking is row-local (boundaries depend only on a
  // 16-char window), so the union of per-batch chunk frames equals the
  // batch pass exactly, and the cross-doc duplicated-chunk aggregate on
  // top is the same one shuffle; the oracle is q_d19's verbatim.
  private val qSt28 = Q(
    "q_st28_stream_cdc_chunks",
    DedupQueries.qD19.oracle.get) { (s, dir) =>
    import org.apache.spark.sql.functions.{col, concat, count, countDistinct, lit}
    val chunked = graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch =>
        val txt = concat(
          col("text").substr(lit(1), (col("doc_id") % 37 + 10).cast("int")),
          lit(DedupQueries.sharedPara * 8),
          col("text").substr(lit(50), lit(150)))
        graft.operators.Chunking.cdcChunks(
          batch.filter(col("doc_id") < 1000)
            .select(col("doc_id"), txt.as("txt")),
          "doc_id", "txt", window = 16, modulus = 32)
    }
    chunked
      .groupBy("chunk_hash", "len")
      .agg(
        countDistinct("doc_id").cast("bigint").as("n_docs"),
        count(lit(1)).cast("bigint").as("n_occ"))
      .filter(col("n_docs") >= 2)
      .select(col("chunk_hash"), col("len").cast("bigint").as("len"),
        col("n_docs"), col("n_occ"))
      .orderBy("chunk_hash")
  }

  // Streaming MERGEABLE quantile sketch: each micro-batch reduces to its
  // own bottom-k-by-hash sample (the landing zone ships ≤ k rows per
  // group per batch, NOT the batch), and the final pass re-sketches the
  // union — bottom-k(∪ batch bottom-ks) = bottom-k(all) is the KMV merge
  // law, operationalized: the streamed estimate must equal the batch
  // sketch EXACTLY, and the oracle ranks the whole corpus by the same
  // portable hash. This is what "mergeable" buys at 100 TB: per-executor
  // partial sketches, k-row shuffles, one tiny final merge.
  private val qSt29 = Q(
    "q_st29_stream_quantile_sketch",
    """WITH h AS (
      |  SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v,
      |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
      |  FROM documents),
      |r AS (
      |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY hk, v) AS rn
      |  FROM h)
      |SELECT g AS lang, CAST(count(*) AS BIGINT) AS sample_size,
      |       quantile_cont(v, 0.5) AS q_50,
      |       quantile_cont(v, 0.9) AS q_90
      |FROM r WHERE rn <= 64
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions.{col, explode}
    val perBatchSamples = graft.streaming.CorpusStream
      .transformAvailableNow(s, dir, shards = 3) { batch =>
        batch.groupBy("lang")
          .agg(org.apache.spark.sql.graft.bridge.column(
            graft.expressions.BottomKSample(
              org.apache.spark.sql.graft.bridge.expression(
                graft.functions.Hashing.md5Hash60(col("doc_id").cast("string"))),
              org.apache.spark.sql.graft.bridge.expression(
                col("n_chars").cast("double")),
              64).toAggregateExpression()).as("s"))
          .select(col("lang"), explode(col("s")).as("e"))
          .select(col("lang"), col("e.hk").as("hk"), col("e.value").as("v"))
      }
    graft.operators.QuantileSketch.bottomKQuantiles(
      perBatchSamples, Seq("lang"), col("hk"), col("v"),
      k = 64, quantiles = Seq(0.5, 0.9))
      .select("lang", "sample_size", "q_50", "q_90")
      .orderBy("lang")
  }

  // Streaming MERGEABLE HyperLogLog: each micro-batch reduces to its own
  // ≤ 2^p-row register frame (the landing zone ships registers, not
  // rows), and the final pass max-merges — registers(∪ batches) =
  // bucket-max(per-batch registers) is the HLL merge law, so the
  // streamed estimate equals the batch sketch EXACTLY and the oracle
  // (the q_q22 replay over documents) verifies it bit-for-bit. The
  // 100 TB posture: per-executor partial registers, 2^p-row shuffles,
  // one tiny final merge — cardinality tracking that never re-reads
  // the corpus.
  private val qSt30 = Q(
    "q_st30_stream_hll_distinct",
    """WITH h AS (
      |  SELECT lang AS g,
      |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
      |  FROM documents),
      |reg AS (
      |  SELECT g, hk & 511 AS bucket,
      |         max(51 - length(ltrim(bin(hk >> 9), '0')) + 1) AS r
      |  FROM h GROUP BY 1, 2),
      |ag AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS nb,
      |         CAST(sum(1::BIGINT << CAST(52 - r AS INTEGER)) AS BIGINT) AS sp
      |  FROM reg GROUP BY 1),
      |est AS (
      |  SELECT g, CAST(512 - nb AS BIGINT) AS n_zero,
      |         CAST(sp + (512 - nb) * (1::BIGINT << 52) AS BIGINT) AS s_scaled
      |  FROM ag),
      |fin AS (
      |  SELECT g, n_zero, s_scaled,
      |         (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512 AS DOUBLE)))
      |           * CAST(512 AS DOUBLE) * CAST(512 AS DOUBLE)
      |           * CAST(1::BIGINT << 52 AS DOUBLE) / CAST(s_scaled AS DOUBLE) AS e_raw
      |  FROM est)
      |SELECT g AS lang, CAST(512 AS INTEGER) AS m, n_zero, s_scaled,
      |       round(CASE WHEN e_raw <= CAST(2.5 AS DOUBLE) * CAST(512 AS DOUBLE) AND n_zero > 0
      |                  THEN CAST(512 AS DOUBLE) * ln(CAST(512 AS DOUBLE) / CAST(n_zero AS DOUBLE))
      |                  ELSE e_raw END, 6) AS nd_estimate
      |FROM fin ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions.col
    val perBatchRegs = graft.streaming.CorpusStream
      .transformAvailableNow(s, dir, shards = 3) { batch =>
        graft.operators.HyperLogLog.registers(
          batch.select(col("lang"), col("doc_id")),
          Seq("lang"),
          graft.functions.Hashing.md5Hash60(col("doc_id").cast("string")),
          p = 9)
      }
    val merged = graft.operators.HyperLogLog.mergeRegisters(Seq("lang"), perBatchRegs)
    graft.operators.HyperLogLog.estimateFromRegisters(merged, Seq("lang"), p = 9)
      .orderBy("lang")
  }

  // Streaming ARCHIVE TRIAGE at the landing zone: q_m24's ZIP central-
  // directory decode per micro-batch — file counts, methods, and
  // uncompressed totals established as archives arrive, BEFORE anything
  // inflates (the decompression-bomb posture, streamed). Construction
  // and decode are row-local, so streamed ≡ batch on every document and
  // the oracle is q_m24's verbatim.
  private val qSt31 = Q(
    "q_st31_stream_zip_triage",
    MultimodalQueries.zipOracleSql) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch => MultimodalQueries.zipDecodedFrame(batch)
    }.orderBy("doc_id")
  }

  // Streaming FIVE-FORMAT hash parity at the landing zone: the q_m27
  // frame (gray/RGB PNG inflate+unfilter, BMP, PPM, baseline-JPEG
  // huffman+IDCT — every real decoder in the engine) per micro-batch as
  // images arrive, where an image corpus wants its near-dup signatures
  // AND its format-consistency check. Decode is row-local (five kernel
  // calls per payload, zero state), so streamed ≡ batch on every
  // document; the oracle is q_m27's verbatim.
  private val qSt32 = Q(
    "q_st32_stream_ahash_parity",
    MultimodalQueries.qM27.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2)(
      MultimodalQueries.ahashParity5Frame)
      .orderBy("doc_id")
  }

  // Streaming BLOCKLIST SCREENING at the landing zone: the q_t32
  // Aho-Corasick dictionary pass per micro-batch — where a compliance
  // filter actually runs, before anything persists downstream. Matching
  // is row-local (one automaton walk per document, zero state), so
  // streamed ≡ batch on every document; the oracle is q_t32's verbatim.
  private val qSt33 = Q(
    "q_st33_stream_blocklist",
    TextQueries.qT32.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch =>
        graft.operators.Blocklist
          .annotate(batch, "doc_id", "text", TextQueries.blockPats)
    }.orderBy("doc_id", "pid")
  }

  // Streaming exact-substring screening at the landing zone
  // (CorpusStream.substringScreenAvailableNow — the q_st28 CDC posture
  // for the q_d24 index): drop 1 seeds the SubstringIndex and reports
  // in-batch duplicate windows, drop 2 probes (partition-pruned, work ∝
  // batch) then appends; the cumulative distinct output must equal the
  // batch full-rebuild duplicate-window set — the SAME oracle as q_d24,
  // streamed ≡ batch.
  private val qSt34 = Q(
    "q_st34_stream_substring_screen",
    DedupQueries.qD24.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream
      .substringScreenAvailableNow(s, dir, shards = 2, L = 40)
      .orderBy("doc", "off")
  }

  // Streaming HTML boilerplate extraction (q_t34's landing-zone twin):
  // the jusText block classification is pure scan-side column algebra,
  // so the per-micro-batch run over the sharded corpus must equal the
  // batch run row for row — same oracle, streamed ≡ batch.
  private val qSt35 = Q(
    "q_st35_stream_html_extract",
    TextQueries.qT34.oracle.get) { (s, dir) =>
    import org.apache.spark.sql.functions.{col, md5}
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch =>
        graft.operators.HtmlExtract
          .blocks(TextQueries.htmlCorpusOf(batch), "doc_id", "html")
          .select(
            col("doc_id"),
            col("block_idx").cast("int").as("block_idx"),
            md5(col("block_text").cast("binary")).as("block_md5"),
            col("n_chars"), col("n_words"), col("n_link_chars"),
            col("link_density"),
            col("is_content").cast("int").as("is_content"))
    }.orderBy("doc_id", "block_idx")
  }

  // Streaming Unicode/encoding hygiene (q_t35's landing-zone twin):
  // the 4-stage pass is scan-side column algebra, so the micro-batched
  // run must equal the batch run row for row — same oracle.
  private val qSt36 = Q(
    "q_st36_stream_text_hygiene",
    TextQueries.qT35.oracle.get) { (s, dir) =>
    import org.apache.spark.sql.functions.{md5 => fmd5}
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch =>
        graft.operators.TextHygiene
          .clean(TextQueries.plantedHygieneCorpus(batch), "doc_id", "text")
          .select(
            org.apache.spark.sql.functions.col("doc_id"),
            fmd5(org.apache.spark.sql.functions.col("text_clean")
              .cast("binary")).as("clean_md5"),
            org.apache.spark.sql.functions.col("n_chars_raw"),
            org.apache.spark.sql.functions.col("n_chars_clean"),
            org.apache.spark.sql.functions.col("had_control").cast("int")
              .as("had_control"),
            org.apache.spark.sql.functions.col("had_mojibake").cast("int")
              .as("had_mojibake"),
            org.apache.spark.sql.functions.col("had_invisible").cast("int")
              .as("had_invisible"),
            org.apache.spark.sql.functions.col("had_nfc").cast("int")
              .as("had_nfc"),
            org.apache.spark.sql.functions.col("changed").cast("int")
              .as("changed"))
    }.orderBy("doc_id")
  }

  // Streaming `.warc.gz` record walk (q_m29's landing-zone twin — the
  // shape a Common Crawl drop actually arrives in): per micro-batch the
  // batch's docs construct their member chains and WarcGz inflates +
  // parses them; the walk is stateless scan-side column algebra over
  // the native GzipMembers kernel, so the micro-batched run must equal
  // the batch run row for row — same oracle, streamed ≡ batch.
  private val qSt37 = Q(
    "q_st37_stream_warc_gz",
    MultimodalQueries.qM29.oracle.get) { (s, dir) =>
    import org.apache.spark.sql.functions.col
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch =>
        graft.operators.WarcGz.records(
          MultimodalQueries.warcGzCorpusOf(batch.filter(col("doc_id") < 500)),
          "doc_id", "gz", maxMembers = 4)
          .select(
            col("file_id").as("doc_id"),
            col("rec_idx"), col("warc_type"), col("record_id"),
            col("target_uri"), col("warc_date"), col("content_length"),
            col("payload_md5"))
    }.orderBy("doc_id", "rec_idx")
  }

  // Streaming robots GOVERNANCE (q_c31's frontier twin): URL batches
  // arrive and each decides against the hosts' FIXED rule bodies —
  // wildcard compilation, longest-match precedence and the
  // join-back-to-frontier multiplicity contract all run per
  // micro-batch; a decision depends only on its own (host, path) and
  // that host's body, so streamed ≡ batch under q_c31's oracle.
  private val qSt38 = Q(
    "q_st38_stream_robots_wildcards",
    CurationQueries.qC31.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch => CurationQueries.robotsWildDecisionsOf(batch)
    }.orderBy("doc_id")
  }

  // Streaming corpus-GLOBAL line dedup (q_t42's landing-zone twin with
  // the persisted seen-line store): each drop dedups internally, drops
  // lines earlier drops already kept, appends its survivors. First
  // occurrence is decided by ARRIVAL order — batch index (doc_id % 2
  // under the 2-shard landing split) before (doc_id, idx) — which the
  // oracle replays verbatim: a landing zone cannot keep a line that
  // has not arrived yet, so its keep set legitimately differs from the
  // batch gate's (doc_id, idx) order on cross-shard repeats.
  private val qSt39 = Q(
    "q_st39_stream_global_line_dedup",
    TextQueries.globalDedupOracle("(doc_id % 2), doc_id, idx")) { (s, dir) =>
    import org.apache.spark.sql.functions.{col, md5}
    graft.streaming.CorpusStream
      .globalLineDedupAvailableNow(s, dir,
        b => TextQueries.globalDedupCorpusOf(b), shards = 2)
      .select(
        col("doc_id"),
        md5(col("text_clean").cast("binary")).as("clean_md5"),
        col("n_chars_clean"),
        col("n_lines"), col("n_lines_kept"),
        col("dup_line_fraction"))
      .orderBy("doc_id")
  }

  // Streaming HTTP envelope crack (q_m31's landing-zone twin): each
  // micro-batch constructs and parses its own slice of the six message
  // classes through the same HttpMessage.responses plan; every
  // envelope decision is per-row, so streamed ≡ batch under q_m31's
  // oracle verbatim.
  private val qSt40 = Q(
    "q_st40_stream_http_envelope",
    MultimodalQueries.qM31.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch => MultimodalQueries.httpEnvelopeOf(batch)
    }.orderBy("doc_id")
  }

  // Streaming outlink extraction (q_c34's landing-zone twin): each
  // micro-batch extracts, resolves and dedups its own pages' links —
  // dedup is per (doc, url) WITHIN one document, so streamed ≡ batch
  // under q_c34's oracle verbatim.
  private val qSt41 = Q(
    "q_st41_stream_outlinks",
    CurationQueries.qC34.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch => CurationQueries.outlinkResolveOf(batch)
    }.orderBy("doc_id", "url")
  }

  // Streaming HTML metadata (q_t45's landing-zone twin): six page
  // classes extracted per micro-batch; every field decision is
  // per-row, so streamed ≡ batch under q_t45's oracle verbatim.
  private val qSt42 = Q(
    "q_st42_stream_html_meta",
    TextQueries.qT45.oracle.get) { (s, dir) =>
    graft.streaming.CorpusStream.transformAvailableNow(s, dir, shards = 2) {
      batch => TextQueries.htmlMetaOf(batch)
    }.orderBy("doc_id")
  }

  override val all: Seq[Q] =
    Seq(qSt1, qSt2, qSt3, qSt4, qSt5, qSt6, qSt7, qSt8, qSt9, qSt10, qSt11, qSt12,
      qSt13, qSt14, qSt15, qSt16, qSt17, qSt18, qSt19, qSt20, qSt21, qSt22, qSt23,
      qSt24, qSt25, qSt26, qSt27, qSt28, qSt29, qSt30, qSt31, qSt32, qSt33, qSt34,
      qSt35, qSt36, qSt37, qSt38, qSt39, qSt40, qSt41, qSt42)
}
