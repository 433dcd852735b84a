package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass structural graph statistics that need no iteration — the
  * cheap companions to [[Triangles]]/[[PageRank]]: is the graph
  * hub-attached or hub-avoiding (degree assortativity, Newman 2002),
  * and how skewed is its degree distribution. Used to pick the right
  * downstream algorithm variant (a disassortative hub graph is what
  * makes naive wedge counting blow up).
  */
object GraphStats {

  /** Degree assortativity: Pearson correlation of endpoint degrees over
    * all edges (each undirected edge contributes BOTH orientations, the
    * standard symmetrization). Output one row:
    * `(n_nodes, n_edges, assortativity)`; the coefficient is NULL when a
    * side has zero degree variance (regular graphs — every star is the
    * degenerate case that breaks naive `corr` under ANSI).
    *
    * Shape: canonicalize + distinct (one shuffle), degree count (one
    * hash agg), two equi-joins keyed on the endpoint to decorate each
    * edge with its endpoint degrees, then ONE global aggregate of the
    * moments; Pearson r forms in the projection under a variance guard —
    * the [[TimeSeries.autocorrelation]] discipline, never `corr` inside
    * the aggregate.
    */
  def degreeAssortativity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("n")).unionAll(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val decorated = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    // both orientations: (da, db) and (db, da)
    val pairs = decorated.select(col("da").cast("double").as("x"), col("db").cast("double").as("y"))
      .unionAll(decorated.select(col("db").cast("double").as("x"), col("da").cast("double").as("y")))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    pairs
      .agg(
        (count(lit(1)) / 2).cast("bigint").as("n_edges"),
        covar_samp(col("x"), col("y")).as("__cov"),
        var_samp(col("x")).as("__vx"),
        var_samp(col("y")).as("__vy"))
      .crossJoin(broadcast(nNodes))
      .select(
        col("n_nodes"),
        col("n_edges"),
        when(col("__vx") > 0 && col("__vy") > 0,
          col("__cov") / sqrt(col("__vx") * col("__vy"))).as("assortativity"))
  }
}
