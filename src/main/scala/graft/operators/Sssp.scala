package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.bridge

/** Single-source shortest paths (Bellman-Ford relaxation) over a
  * weighted undirected edge list — the weighted companion to
  * [[Bfs.hops]]: BFS answers "how many links away", this answers "how
  * far along the cheapest route" (supply-chain cost radius, weighted
  * influence distance through a co-occurrence graph, cheapest-path
  * blast radius where edge weights price the hop). Completes the graph
  * family's distance axis next to PageRank (influence), triangles
  * (density), k-core (kernel), LPA/CC (partition), and BFS (hops).
  *
  * Beyond-reference surface: the reference syncs rows and never walks a
  * graph.
  *
  * Algorithm: frontier-delta Bellman-Ford. Classic per-round
  * Bellman-Ford relaxes EVERY edge each round; here only edges leaving
  * nodes whose distance improved last round are relaxed (the delta —
  * identical fixpoint, since a relaxation can only produce a new best
  * distance through a node whose own distance just changed). Relaxation
  * is monotone (distances only shrink, the reached set only grows) and
  * idempotent at the fixpoint, so a fixed-depth SQL unroll of the
  * NON-delta form is a sound oracle for the run-to-fixpoint engine —
  * the [[KCore]] contract: the gate passes `maxRounds` >= the oracle's
  * unroll depth with `requireConvergence = true`, and a graph needing
  * more rounds fails loudly instead of silently hash-mismatching.
  *
  * Shape at scale: per round ONE join of the (symmetrized,
  * localCheckpoint'd once) edge frame against the improved-node
  * frontier — broadcast by default, the [[Bfs]] discipline, so the edge
  * frame never re-shuffles after its one-time materialization — then a
  * node-keyed min-aggregate to fold candidates into the distance frame.
  * Rounds = length (in hops) of the longest shortest weighted path,
  * which exceeds the BFS diameter when many cheap hops beat one
  * expensive one; small-world graphs still finish in tens of rounds.
  * Every round `localCheckpoint`s the new distance frame and frees the
  * superseded one: flat lineage, superseded executor blocks released
  * eagerly, and the improved-count that drives termination reads the
  * just-checkpointed frontier — no extra job.
  *
  * Memory contract: each round broadcasts the improved-node frontier
  * (and nothing else), bounded by the widest relaxation wave. For
  * adversarial graphs whose waves rival the node count, set
  * `broadcastFrontier = false` to fall back to a shuffled join.
  * Duplicate edge rows are tolerated (the min-fold absorbs them), so no
  * dedup pass is spent on the edge list.
  *
  * Determinism: distances are exact integer sums folded by `min` — no
  * floats, no visit order, no tie-breaks (two equal-cost routes yield
  * the same min). The shortest-distance map is unique, so engine and
  * oracle cannot legitimately disagree.
  */
object Sssp {

  /** `(node, dist)` for every node reachable from `source`, the source
    * itself at distance 0. Unreachable nodes are ABSENT — the
    * disconnected-component probe is the row count itself. Edges are
    * treated as undirected; weights must be non-negative integers
    * (LongType after cast) — Bellman-Ford tolerates zero weights, and
    * integer sums keep the result bit-exact across engines. `source`
    * need not appear in the edge list (it then maps to itself alone).
    *
    * @param maxRounds relaxation-round cap; with `requireConvergence`
    *   this is the contract that a fixed-depth oracle unroll replays
    *   the same fixpoint — the run throws instead of returning
    *   under-relaxed distances.
    */
  def distances(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      weightCol: String,
      source: Long,
      maxRounds: Int = 30,
      requireConvergence: Boolean = true,
      broadcastFrontier: Boolean = true): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(aCol).as("s"), col(bCol).as("d"), col(weightCol).cast("long").as("w"))
      .unionByName(
        edges.select(col(bCol).as("s"), col(aCol).as("d"), col(weightCol).cast("long").as("w")))
      .localCheckpoint(true) // probed every round; don't re-derive
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint(true)
    var frontier = dist
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      val f = if (broadcastFrontier) broadcast(frontier) else frontier
      // best candidate distance per node reachable from the frontier ...
      val cand = e.join(f, f("node") === e("s"))
        .select(col("d").as("node"), (col("dist") + col("w")).as("__cd"))
        .groupBy("node").agg(min("__cd").as("__cd"))
      // ... improved = candidates that beat (or first reach) the known map
      val improved = cand.join(dist, Seq("node"), "left_outer")
        .where(col("dist").isNull || col("__cd") < col("dist"))
        .select(col("node"), col("__cd").as("dist"))
        .localCheckpoint(true)
      converged = improved.isEmpty
      if (converged) {
        bridge.freeLocalCheckpoint(improved)
      } else {
        val grown = dist.join(improved.select(col("node")), Seq("node"), "left_anti")
          .unionByName(improved)
          .localCheckpoint(true)
        bridge.freeLocalCheckpoint(dist)
        if (frontier ne dist) bridge.freeLocalCheckpoint(frontier)
        dist = grown
        frontier = improved
      }
    }
    bridge.freeLocalCheckpoint(e)
    if (!converged && requireConvergence) {
      if (frontier ne dist) bridge.freeLocalCheckpoint(frontier)
      bridge.freeLocalCheckpoint(dist)
      throw new IllegalStateException(
        s"Bellman-Ford did not converge within $maxRounds rounds — " +
          "raise maxRounds (and the oracle's unroll depth with it)")
    }
    if (frontier ne dist) bridge.freeLocalCheckpoint(frontier)
    dist
  }
}
