package graft.queries

import org.apache.spark.sql.functions._

import graft.plans.EntityAssembly

/** Flagship pipeline queries: the full SURVEY.md §3.2 entity assembly
  * (projection → descriptor resolution → dedup-merge → nesting → sync
  * diff) verified end to end. The nested form is rows-only (parquet has no
  * nested-type oracle); the flattened form hash-verifies the ENTIRE nested
  * structure through a canonical md5 fingerprint both engines compute.
  */
object PipelineQueries extends QueryGroup {

  // Flagship nested entity assembly, emitted as oracle-comparable scalars:
  // every scalar field verbatim + ref struct flattened + one md5 over the
  // canonical rendering of the complete entity (the nested `assemble` form
  // stays the library surface; raw array columns would break the harness's
  // sorted-frame compare).
  private val qF1 = Q(
    "q_f1_entity_nested",
    """WITH resolved AS (
      |  SELECT c_custkey AS studentUniqueId, c_name AS fullName, c_mktsegment AS segment,
      |         coalesce('uri://graft/nation#' || n_name, CAST(c_nationkey AS VARCHAR)) AS nationDescriptor,
      |         c_acctbal AS accountBalance
      |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      |  WHERE c_mktsegment = 'BUILDING'),
      |periods AS (
      |  SELECT l_orderkey AS ok,
      |         string_agg(DISTINCT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') || ',' || l_returnflag, '|'
      |                    ORDER BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') || ',' || l_returnflag) AS pstr
      |  FROM lineitem GROUP BY 1),
      |addrs AS (
      |  SELECT o_custkey,
      |         CAST(count(*) AS INT) AS n_addresses,
      |         string_agg(CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus || ':' || o_orderpriority || ':' || pstr, ';'
      |                    ORDER BY o_orderkey) AS astr
      |  FROM orders JOIN periods ON o_orderkey = ok GROUP BY 1)
      |SELECT studentUniqueId, fullName, segment, nationDescriptor, accountBalance,
      |       CAST(NULL AS VARCHAR) AS unmappedField,
      |       studentUniqueId AS ref_id, fullName AS ref_name,
      |       coalesce(n_addresses, 0) AS n_addresses,
      |       md5(CAST(studentUniqueId AS VARCHAR) || '~' || fullName || '~' || segment || '~' ||
      |           nationDescriptor || '~' || coalesce(astr, '')) AS entity_md5
      |FROM resolved LEFT JOIN addrs ON studentUniqueId = o_custkey
      |ORDER BY studentUniqueId""".stripMargin) { (s, dir) =>
    EntityAssembly.fingerprinted(s, dir).orderBy("studentUniqueId")
  }

  // Hash-verified flattening of the nested assembly.
  private val qF2 = Q(
    "q_f2_entity_flat",
    """WITH resolved AS (
      |  SELECT c_custkey AS studentUniqueId, c_name AS fullName,
      |         coalesce('uri://graft/nation#' || n_name, CAST(c_nationkey AS VARCHAR)) AS nationDescriptor
      |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      |  WHERE c_mktsegment = 'BUILDING'),
      |periods AS (
      |  SELECT l_orderkey AS ok,
      |         CAST(count(DISTINCT (strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d'), l_returnflag)) AS INT) AS np,
      |         string_agg(DISTINCT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') || ',' || l_returnflag, '|'
      |                    ORDER BY strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') || ',' || l_returnflag) AS pstr
      |  FROM lineitem GROUP BY 1),
      |addrs AS (
      |  SELECT o_custkey,
      |         CAST(count(*) AS INT) AS n_addresses,
      |         CAST(sum(np) AS INT) AS n_periods,
      |         string_agg(CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus || ':' || o_orderpriority || ':' || pstr, ';'
      |                    ORDER BY o_orderkey) AS astr
      |  FROM orders JOIN periods ON o_orderkey = ok GROUP BY 1)
      |SELECT studentUniqueId, fullName, nationDescriptor,
      |       coalesce(n_addresses, 0) AS n_addresses,
      |       coalesce(n_periods, 0) AS n_periods,
      |       md5(coalesce(astr, '')) AS addresses_md5
      |FROM resolved LEFT JOIN addrs ON studentUniqueId = o_custkey
      |ORDER BY studentUniqueId""".stripMargin) { (s, dir) =>
    EntityAssembly.flattened(s, dir).orderBy("studentUniqueId")
  }

  // JSON sink payload (reference: Gson serialization before POST), verified
  // by md5 + length of the exact serialized bytes: the oracle rebuilds the
  // byte-identical JSON text (Spark to_json field order = struct order, no
  // whitespace, dates as yyyy-MM-dd, no nullable fields present) by string
  // concatenation in DuckDB.
  private val qF3 = Q(
    "q_f3_entity_json",
    """WITH resolved AS (
      |  SELECT c_custkey AS studentUniqueId, c_name AS fullName, c_mktsegment AS segment,
      |         coalesce('uri://graft/nation#' || n_name, CAST(c_nationkey AS VARCHAR)) AS nationDescriptor
      |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      |  WHERE c_mktsegment = 'BUILDING'),
      |periods AS (
      |  SELECT l_orderkey AS ok,
      |         string_agg(DISTINCT '{"beginDate":"' || strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') ||
      |                             '","flag":"' || l_returnflag || '"}', ','
      |                    ORDER BY '{"beginDate":"' || strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') ||
      |                             '","flag":"' || l_returnflag || '"}') AS pstr
      |  FROM lineitem GROUP BY 1),
      |addrs AS (
      |  SELECT o_custkey,
      |         string_agg('{"addressId":' || CAST(o_orderkey AS VARCHAR) ||
      |                    ',"statusCode":"' || o_orderstatus ||
      |                    '","priority":"' || o_orderpriority ||
      |                    '","periods":[' || pstr || ']}', ',' ORDER BY o_orderkey) AS astr
      |  FROM orders JOIN periods ON o_orderkey = ok GROUP BY 1),
      |payloads AS (
      |  SELECT studentUniqueId,
      |         '{"studentUniqueId":' || CAST(studentUniqueId AS VARCHAR) ||
      |         ',"fullName":"' || fullName ||
      |         '","segment":"' || segment ||
      |         '","nationDescriptor":"' || nationDescriptor ||
      |         '","studentReference":{"studentUniqueId":' || CAST(studentUniqueId AS VARCHAR) ||
      |         ',"fullName":"' || fullName ||
      |         '"},"addresses":[' || coalesce(astr, '') || ']}' AS payload
      |  FROM resolved LEFT JOIN addrs ON studentUniqueId = o_custkey)
      |SELECT studentUniqueId, md5(payload) AS payload_md5,
      |       CAST(length(payload) AS INT) AS payload_len
      |FROM payloads ORDER BY studentUniqueId""".stripMargin) { (s, dir) =>
    EntityAssembly.assembleJson(s, dir)
      .select(
        col("studentUniqueId"),
        md5(col("payload")).as("payload_md5"),
        length(col("payload")).as("payload_len"))
      .orderBy("studentUniqueId")
  }

  // Sync-diff delete set of the flagship pipeline.
  private val qF4 = Q(
    "q_f4_sync_deletes",
    """SELECT c_custkey AS studentUniqueId FROM customer
      |WHERE c_mktsegment <> 'BUILDING' ORDER BY studentUniqueId""".stripMargin) { (s, dir) =>
    EntityAssembly.syncPlan(s, dir).deletes
      .select("studentUniqueId")
      .orderBy("studentUniqueId")
  }

  override val all: Seq[Q] = Seq(qF1, qF2, qF3, qF4)
}
