package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.ColumnMap
import graft.operators.{Descriptors, SyncDiff}

/** The flagship end-to-end pipeline: SURVEY.md §3.2's entity-assembly
  * dataflow (reference: SisConnectorService.java:142-160 and the
  * per-entity helpers at :201-461), re-expressed as ONE declarative Spark
  * plan over the harness star schema.
  *
  * Shape mapping (Banner → testdata):
  *   - candidate ids      = customers in a market segment
  *     (teacherCandidateIds.sql: join + filter + order)
  *   - candidate scalars  = customer row via ColumnMap projection (P1)
  *     with last-row-wins semantics made explicit (A3)
  *   - descriptor lookup  = nationkey → nation-name URI, broadcast left
  *     join + passthrough fallback (J3)
  *   - addresses          = the customer's orders (detail query per key in
  *     the reference — its N+1 loop J2 becomes one scan + hash join)
  *   - address periods    = each order's distinct (shipdate, returnflag)
  *     lineitem pairs, dedup-merged exactly like addTeacherAddress's
  *     period-set union (A1)
  *   - nesting            = collect_list(struct(...)) per parent (A2/J5)
  *   - sync diff          = assembled keys vs the full customer snapshot
  *     → delete set (J4)
  *
  * Scale notes: the two collect_list aggregations shuffle on
  * (o_orderkey) then (custkey) — both high-cardinality, AQE-splittable;
  * the nation dimension is broadcast; everything else is scan-side.
  * Arrays are sorted so results are deterministic under any partitioning.
  */
object EntityAssembly {

  /** Candidate-id slice: the configurable filter the reference keeps in
    * teacherCandidateIds.sql (P2 equality on a segment code).
    */
  val segment = "BUILDING"

  /** ColumnMap for the candidate projection — exercised exactly as the
    * reference's .map files: case-insensitive physicals, unmapped → null.
    */
  val candidateMap: ColumnMap = ColumnMap(Seq(
    "studentUniqueId" -> "C_CUSTKEY",
    "fullName"        -> "c_name",
    "segment"         -> "c_mktsegment",
    "nationCode"      -> "c_nationkey",
    "accountBalance"  -> "c_acctbal",
    "unmappedField"   -> "NO_SUCH_COLUMN"))

  /** Nested periods per order: A1's dedup-merge (collect_set of the period
    * struct), sorted for determinism.
    */
  private def orderPeriods(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(struct(
        col("l_shipdate").cast("date").as("beginDate"),
        col("l_returnflag").as("flag")))).as("periods"))

  /** Addresses (orders) with their period arrays nested, then rolled up to
    * one address array per customer: A2 + J5.
    */
  private def customerAddresses(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(orderPeriods(lineitem), col("o_orderkey") === col("l_orderkey"))
      .drop("l_orderkey")
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(
        col("o_orderkey").as("addressId"),
        col("o_orderstatus").as("statusCode"),
        col("o_orderpriority").as("priority"),
        col("periods")))).as("addresses"))

  /** The assembled nested entity frame:
    * (studentUniqueId, fullName, segment, nationDescriptor, accountBalance,
    *  unmappedField, studentReference struct, addresses array).
    */
  def assemble(spark: SparkSession, sfDir: String): DataFrame =
    assembleFrom(
      Tables.load(spark, sfDir, "customer"),
      Tables.load(spark, sfDir, "nation"),
      Tables.load(spark, sfDir, "orders"),
      Tables.load(spark, sfDir, "lineitem"))

  /** Frame-parameterized core of [[assemble]] — the same plan over ANY
    * customer/dimension/detail frames (the incremental-sync driver feeds a
    * change-batch as `customer`; the batch form feeds warehouse scans).
    */
  def assembleFrom(
      customer: DataFrame,
      nation: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val ids = customer.filter(col("c_mktsegment") === segment)

    val cand = candidateMap.project(ids)

    val resolved = Descriptors.resolve(
      cand, nation,
      codeCol = "nationCode", dimCode = "n_nationkey", dimValue = "n_name",
      outCol = "nationDescriptor", namespacePrefix = "uri://graft/nation#")

    // Semi-join-prune the detail side to the candidate slice BEFORE the
    // collect aggregations: only ~1/5 of customers are in the segment, and
    // Catalyst cannot push the final join below the two groupBys on its
    // own. Without this the period/address rollups aggregate the ENTIRE
    // fact table and the join then discards 80% of that work — the exact
    // shape that stops scaling at 100 TB. AQE turns both semi joins into
    // broadcasts when the slices are small; the groupBys reuse the join
    // keys' hash partitioning, so no extra exchange appears.
    val ordersSlice = orders.join(
      ids.select(col("c_custkey")), orders("o_custkey") === col("c_custkey"),
      "left_semi")
    val lineitemSlice = lineitem.join(
      ordersSlice.select(col("o_orderkey")),
      lineitem("l_orderkey") === ordersSlice("o_orderkey"), "left_semi")

    val addrs = customerAddresses(ordersSlice, lineitemSlice)

    resolved
      .join(addrs, resolved("studentUniqueId") === addrs("o_custkey"), "left")
      .drop("o_custkey")
      .withColumn("addresses", coalesce(col("addresses"), array()))
      .withColumn("studentReference",
        struct(col("studentUniqueId"), col("fullName")))
      .select(
        col("studentUniqueId"), col("fullName"), col("segment"),
        col("nationDescriptor"), col("accountBalance"), col("unmappedField"),
        col("studentReference"), col("addresses"))
  }

  /** Entities rendered as the sink payload (reference: Gson POJO → JSON,
    * JSON.java:94-96): one JSON document per entity.
    */
  def assembleJson(spark: SparkSession, sfDir: String): DataFrame =
    toJsonPayload(assemble(spark, sfDir))

  /** Sink-payload projection of an assembled frame. */
  def toJsonPayload(assembled: DataFrame): DataFrame =
    assembled.select(
      col("studentUniqueId"),
      to_json(struct(col("studentUniqueId"), col("fullName"), col("segment"),
        col("nationDescriptor"), col("studentReference"), col("addresses")))
        .as("payload"))

  /** Canonical string rendering of an `addresses` array — the shared spine
    * of every fingerprinted projection: per address
    * `addressId:statusCode:priority:p1|p2|…` with periods `beginDate,flag`
    * sorted; addresses joined with `;`. DuckDB reproduces the identical
    * string with sorted string_agg, so md5 of it hash-verifies the whole
    * nested assembly without nested-type comparison.
    */
  private def addressesCanonical(addresses: Column): Column =
    concat_ws(";",
      transform(addresses, a =>
        concat_ws(":",
          a.getField("addressId"),
          a.getField("statusCode"),
          a.getField("priority"),
          concat_ws("|", transform(a.getField("periods"), p =>
            concat_ws(",",
              date_format(p.getField("beginDate"), "yyyy-MM-dd"),
              p.getField("flag")))))))

  /** Oracle-expressible flattening: per entity, the address/period counts
    * plus an md5 fingerprint of the canonical address rendering.
    */
  def flattened(spark: SparkSession, sfDir: String): DataFrame =
    assemble(spark, sfDir).select(
      col("studentUniqueId"),
      col("fullName"),
      col("nationDescriptor"),
      size(col("addresses")).as("n_addresses"),
      coalesce(
        aggregate(col("addresses"), lit(0), (acc, a) => acc + size(a.getField("periods"))),
        lit(0)).as("n_periods"),
      md5(addressesCanonical(col("addresses"))).as("addresses_md5"))

  /** The FULL assembled entity as oracle-comparable scalars: every scalar
    * field verbatim, the reference struct flattened, and one md5 over the
    * canonical rendering of the complete entity (scalars + nested
    * addresses) — a value-level proof of the whole nested assembly that
    * survives harness frameworks which cannot sort/hash array columns.
    */
  def fingerprinted(spark: SparkSession, sfDir: String): DataFrame =
    assemble(spark, sfDir).select(
      col("studentUniqueId"),
      col("fullName"),
      col("segment"),
      col("nationDescriptor"),
      col("accountBalance"),
      col("unmappedField"),
      col("studentReference").getField("studentUniqueId").as("ref_id"),
      col("studentReference").getField("fullName").as("ref_name"),
      size(col("addresses")).as("n_addresses"),
      md5(concat_ws("~",
        col("studentUniqueId"),
        col("fullName"),
        col("segment"),
        col("nationDescriptor"),
        addressesCanonical(col("addresses")))).as("entity_md5"))

  /** The sync plan for the assembled entities against the full customer
    * snapshot (J4): customers outside the segment are the delete set.
    */
  def syncPlan(spark: SparkSession, sfDir: String): SyncDiff.SyncPlan = {
    val target = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("studentUniqueId"))
    SyncDiff.plan(
      source = assemble(spark, sfDir).select("studentUniqueId"),
      target = target,
      keyCols = Seq("studentUniqueId"))
  }
}
