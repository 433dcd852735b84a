package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{DataProfile, SchemaValidation}
import graft.operators.SchemaValidation.FieldRule

/** Data-quality operators: contract validation with quarantine reasons
  * and one-pass column profiling — the schema-enforcement surface of the
  * ingestion pipeline, oracle-verified row by row.
  */
object QualityQueries extends QueryGroup {

  // Row-level contract validation over orders: status must be a known
  // open/finished code ('P' rows quarantine), totals must sit in
  // [0, 450k] (a few exceed), custkey is required (none missing — the
  // passing check is part of the contract too). Error tags and their
  // order are replayed verbatim in the oracle.
  private[queries] val qQ1 = Q(
    "q_q1_validate_orders",
    """WITH v AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_custkey IS NULL THEN 'o_custkey:required_null' END AS e1,
      |    CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
      |         THEN 'o_orderstatus:not_allowed' END AS e2,
      |    CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0
      |         THEN 'o_totalprice:below_min' END AS e3,
      |    CASE WHEN o_totalprice IS NOT NULL AND o_totalprice > 450000
      |         THEN 'o_totalprice:above_max' END AS e4
      |  FROM orders)
      |SELECT o_orderkey,
      |       (e1 IS NULL AND e2 IS NULL AND e3 IS NULL AND e4 IS NULL) AS is_valid,
      |       CAST(len(list_filter([e1, e2, e3, e4], x -> x IS NOT NULL)) AS INT) AS n_errors,
      |       concat_ws(',', e1, e2, e3, e4) AS errors_str
      |FROM v ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    SchemaValidation.validate(
      Tables.load(s, dir, "orders"),
      Seq(
        FieldRule("o_custkey", required = true),
        FieldRule("o_orderstatus", allowed = Some(Seq("O", "F"))),
        FieldRule("o_totalprice", min = Some(0.0), max = Some(450000.0))))
      .select(
        col("o_orderkey"),
        col("is_valid"),
        size(col("errors")).as("n_errors"),
        concat_ws(",", col("errors")).as("errors_str"))
      .orderBy("o_orderkey")
  }

  // One-pass completeness profile of the customer table.
  private val qQ2 = Q(
    "q_q2_profile_customer",
    """SELECT col_name, n_rows, n_null, n_distinct,
      |       CAST(n_null AS DOUBLE) / n_rows AS null_rate
      |FROM (
      |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
      |         CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct FROM customer
      |  UNION ALL
      |  SELECT 'c_name', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         CAST(count(DISTINCT c_name) AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT 'c_nationkey', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         CAST(count(DISTINCT c_nationkey) AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         CAST(count(DISTINCT c_acctbal) AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         CAST(count(DISTINCT c_mktsegment) AS BIGINT) FROM customer)
      |ORDER BY col_name""".stripMargin) { (s, dir) =>
    DataProfile.profile(
      Tables.load(s, dir, "customer"),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .orderBy("col_name")
  }

  override val all: Seq[Q] = Seq(qQ1, qQ2)
}
