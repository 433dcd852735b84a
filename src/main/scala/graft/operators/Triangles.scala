package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting (the node-iterator++ / forward
  * algorithm): orient every undirected edge from its (degree, id)-smaller
  * endpoint to the larger, so each triangle {x,y,z} is found EXACTLY once
  * — as the wedge (x→y, x→z) closed by y→z, with x the rank-lowest
  * corner. Orientation is the scale trick: out-degrees are bounded by
  * O(√E), so the wedge join is O(E^{3/2}) worst-case instead of the
  * Σd² hub blowup a naive common-neighbor join pays on power-law graphs
  * (one celebrity node would otherwise generate quadratic wedges).
  *
  * Everything is equi-joins and hash aggregates on the node keys: degree
  * count, two edge joins, one count — no driver state, no iteration.
  * Also reports wedges (Σ C(d,2)) and the global clustering coefficient
  * 3·triangles / wedges, both exact integer math until the final ratio.
  */
object Triangles {

  /** One row: (n_nodes, n_edges, n_wedges, n_triangles, clustering).
    * `edges` is any (src, dst) frame; self-loops dropped, direction and
    * duplicates canonicalized away.
    */
  def globalStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("n")).unionAll(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // rank = (degree, id); orient edges rank-ascending
    val withRanks = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val oriented = withRanks.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
        .otherwise(col("a")).as("dst"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db"))
        .otherwise(col("da")).as("dstd"))
    // wedges from the rank-lowest corner; enforce rank(y) < rank(z) so the
    // closing edge is exactly y→z
    val e1 = oriented.select(col("src").as("x"), col("dst").as("y"), col("dstd").as("dy"))
    val e2 = oriented.select(col("src").as("x"), col("dst").as("z"), col("dstd").as("dz"))
    val wedges = e1.join(e2, Seq("x"))
      .filter(struct(col("dy"), col("y")) < struct(col("dz"), col("z")))
    val closing = oriented.select(col("src").as("y"), col("dst").as("z"))
    val triangles = wedges.join(closing, Seq("y", "z"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val base = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("d")) / 2).cast("bigint").as("n_edges"),
      sum(col("d") * (col("d") - 1) / 2).cast("bigint").as("n_wedges"))
    base.crossJoin(broadcast(triangles))
      .select(
        col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        (lit(3.0) * col("n_triangles") / col("n_wedges")).as("clustering"))
  }
}
