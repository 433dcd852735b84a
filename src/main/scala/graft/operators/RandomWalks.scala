package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.bridge

/** DeepWalk walk-corpus generation (Perozzi–Al-Rfou–Skiena, KDD 2014
  * §4.1): `walksPerNode` fixed-length uniform random walks started from
  * every node of an undirected graph, emitted as one row per visited
  * position — the corpus a skip-gram embedding trains on, and the graph
  * analog of the text-side token pipeline (node2vec's p=q=1 case).
  *
  * Beyond-reference surface: the reference syncs rows and never walks a
  * graph; this feeds graph-structure signal into the same embedding
  * machinery the ANN/near-dup operators consume.
  *
  * Determinism contract: the "random" neighbor choice at step k of walk
  * w is `((w mod P)·2654435761 + k·40503 + seed) mod P mod deg(cur)`
  * with P = 1e9+7 — a portable arithmetic hash, overflow-proof for any
  * id range ((P−1)·2654435761 < 2^63), shuffle-order-independent, and
  * replayable by any engine with 64-bit integers (the q_g24 oracle
  * replays it verbatim). Neighbor ranks are `row_number() − 1` over
  * (node, ORDER BY nbr) — a total deterministic order.
  *
  * Shape at scale: the ranked adjacency and the degree frame are built
  * ONCE (one window family over the symmetrized edge list) and
  * checkpointed; each of the `walkLength` steps is two node-keyed hash
  * joins — state⋈degree (compute the pick) then state⋈adjacency on
  * (node, rank) (an O(1) lookup per walk, NOT a degree-sized probe —
  * power-law hubs cost the same as leaves). Walk state is |V|·γ rows,
  * superseded checkpoints freed per step (the PageRank discipline); at
  * cluster scale, bucketing the adjacency by node makes every step's
  * join co-located.
  */
object RandomWalks {

  private val P = 1000000007L

  /** One row per visited position: `(walk_id, start, step, node)` with
    * step 0 = the start node itself, `walk_id = start·walksPerNode + g`.
    * Isolated nodes cannot occur (nodes derive from the edge list);
    * every walk therefore always has a neighbor to move to.
    */
  def deepWalk(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      walksPerNode: Int,
      walkLength: Int,
      seed: Long): DataFrame = {
    require(walksPerNode >= 1, "need at least one walk per node")
    require(walkLength >= 1, "need at least one step")
    val und = edges
      .filter(col(aCol) =!= col(bCol))
      .select(col(aCol).cast("bigint").as("node"), col(bCol).cast("bigint").as("nbr"))
      .unionByName(edges
        .filter(col(aCol) =!= col(bCol))
        .select(col(bCol).cast("bigint").as("node"), col(aCol).cast("bigint").as("nbr")))
      .distinct()
    val adj = und
      .select(col("node"), col("nbr"),
        (row_number().over(Window.partitionBy("node").orderBy("nbr")) - 1)
          .cast("bigint").as("r"))
      .localCheckpoint(true) // probed every step; built once
    val deg = adj.groupBy("node").agg(count(lit(1)).cast("bigint").as("deg"))
      .localCheckpoint(true)

    var st = deg
      .select(col("node").as("start"),
        explode(sequence(lit(0L), lit(walksPerNode - 1L))).as("g"))
      .select(
        (col("start") * walksPerNode + col("g")).as("walk_id"),
        col("start"), col("start").as("cur"))
      .localCheckpoint(true)
    val parts = Seq.newBuilder[DataFrame]
    parts += st.select(
      col("walk_id"), col("start"), lit(0).as("step"), col("cur").as("node"))
    // uniquely-named join sides: every step re-joins the same two build
    // frames, and df("col") disambiguation trips Spark's self-join check
    val degR = deg.select(col("node").as("__dn"), col("deg").as("__deg"))
    val adjR = adj.select(
      col("node").as("__an"), col("nbr").as("__anbr"), col("r").as("__ar"))
    var k = 1
    while (k <= walkLength) {
      val idx = pmod(
        pmod(pmod(col("walk_id"), lit(P)) * lit(2654435761L) +
          lit(k.toLong * 40503L + seed), lit(P)),
        col("__deg"))
      val picked = st.join(degR, col("cur") === col("__dn"))
        .select(col("walk_id"), col("start"), col("cur"), idx.as("idx"))
      val next = picked
        .join(adjR, col("cur") === col("__an") && col("idx") === col("__ar"))
        .select(col("walk_id"), col("start"), col("__anbr").as("cur"))
        .localCheckpoint(true)
      // NOT freed: every step's state frame IS an output slice (parts
      // references it); total pinned residency is the walk corpus itself,
      // (walkLength+1)·|V|·γ rows — the caller frees after consuming
      st = next
      parts += st.select(
        col("walk_id"), col("start"), lit(k).as("step"), col("cur").as("node"))
      k += 1
    }
    // every step state is materialized, so the build-side frames can go
    bridge.freeLocalCheckpoint(adj)
    bridge.freeLocalCheckpoint(deg)
    // the per-step frames are checkpointed slices of walk state — the
    // union is a metadata concat, no recompute
    parts.result().reduce(_ unionByName _)
  }
}
