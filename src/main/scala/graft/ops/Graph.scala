package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames. Companion to the
  * iterative ops that live inline in the registry (x101's PageRank): these
  * are the single-pass/degree-bounded kernels.
  */
object Graph {

  /** Per-vertex triangle counts + local clustering coefficient by
    * degree-ordered wedge enumeration — the Suri & Vassilvitskii (WWW'11)
    * "curse of the last reducer" fix, and the standard third join of
    * distributed triangle counting.
    *
    * Input: undirected edges as (a, b) with a < b, no duplicates. Every
    * edge is oriented from its lower-(degree, id) endpoint to the higher;
    * wedges are then enumerated only at their minimum-rank vertex, so a
    * degree-d hub generates O(d²) wedge candidates ONLY if it is the
    * low-rank end — the per-reducer work is bounded by the arboricity-
    * style orientation, not by the raw degree of the hottest vertex.
    * Closing the wedge is one equi-join back on the oriented edge set.
    *
    * Output: (v, degree, n_tri, clustering) for every vertex, clustering
    * = 2·T / (deg·(deg−1)) rounded to 6 (0 when deg < 2), all other
    * columns integers — hash-stable by construction.
    *
    * Scale shape: two shuffles on vertex keys (degree count, wedge
    * grouping) + one edge-keyed equi-join; no join ever pairs a vertex's
    * full neighborhood with itself un-oriented. */
  def triangleStats(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient: src = endpoint with the smaller (deg, id), carrying both ranks
    val ranked = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val e = ranked.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
    // wedges at the minimum-rank vertex, each unordered wedge exactly once
    val wedgeOrder = col("e1.ddeg") < col("e2.ddeg") ||
      (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.src") === col("e2.src") && wedgeOrder)
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))
    // close: (v, w) is rank-ordered, so a closing edge is stored exactly
    // as src = v, dst = w
    val tris = wedges.join(
      e.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val perVertex = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(perVertex, Seq("v"), "left_outer")
      .select(col("v"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6)).as("clustering"))
  }

  /** Label-propagation community detection (Raghavan et al. 2007),
    * synchronous variant with a deterministic tie-break: each round every
    * vertex adopts the label carrying the largest incident edge weight,
    * smallest label on ties. Labels start as vertex ids.
    *
    * Input: directed edge list (src, dst, w) — pass each undirected edge
    * both ways. Integer weights keep every round exactly associative (no
    * float ever enters), so partition order cannot flip a label.
    *
    * Output: (v, lab) for every vertex with at least one in-edge.
    *
    * Scale shape: each round is one src-keyed equi-join of the slim edge
    * list against the (v, lab) table plus one (dst, lab) SUM and one
    * per-vertex max(struct) — map-side partial aggregation, |nodes|
    * groups, no window, cost O(|edges|) per round. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    var lab = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lab"))
    for (_ <- 1 to rounds) {
      lab = edges.join(lab.select(col("v").as("src"), col("lab")), "src")
        .groupBy(col("dst"), col("lab"))
        .agg(sum(col("w")).as("ws"))
        .groupBy(col("dst"))
        .agg(max(struct(col("ws"), (-col("lab")).as("nl"))).as("m"))
        .select(col("dst").as("v"), (-col("m.nl")).as("lab"))
    }
    lab
  }
}
