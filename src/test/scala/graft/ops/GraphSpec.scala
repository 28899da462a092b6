package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleStats: counts match brute-force closed-wedge enumeration") {
    // K4 on {1,2,3,4} (4 triangles, clustering 1 everywhere) + a pendant
    // vertex 5 and a hub 6 closing one extra triangle with 1-2
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (1L, 6L), (2L, 6L))
    val out = Graph.triangleStats(edges.toDF("a", "b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vs = adj.keySet
    val expectedTri = vs.map { v =>
      val n = adj(v).toSeq
      v -> n.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }
    }.toMap
    vs.foreach { v =>
      val (deg, tri, coeff) = out(v)
      assert(deg === adj(v).size.toLong, s"deg($v)")
      assert(tri === expectedTri(v).toLong, s"tri($v)")
      val exp = if (deg < 2) 0.0
        else BigDecimal(2.0 * expectedTri(v) / (deg * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(coeff === exp, s"clustering($v)")
    }
    assert(out.keySet === vs)
  }

  test("triangleStats: total triangle mass is 3x the triangle count") {
    // every triangle contributes once to each of its three vertices
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L))
    val total = Graph.triangleStats(edges.toDF("a", "b"))
      .agg(sum("n_tri")).head.getLong(0)
    assert(total === 6L) // triangles {1,2,3} and {1,3,4}
  }

  private def undirected(es: Seq[(Long, Long, Long)]) =
    (es ++ es.map { case (a, b, w) => (b, a, w) }).toDF("src", "dst", "w")

  test("labelPropagation: two cliques with a weak bridge resolve to two communities") {
    // cliques {1,2,3} and {10,11,12}, intra weight 5, bridge 3-10 weight 1
    val es = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (10L, 11L, 5L), (10L, 12L, 5L), (11L, 12L, 5L), (3L, 10L, 1L))
    val out = Graph.labelPropagation(undirected(es), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within each clique every member agrees; the two cliques disagree
    assert(Set(1L, 2L, 3L).map(out) .size === 1, "left clique converged")
    assert(Set(10L, 11L, 12L).map(out).size === 1, "right clique converged")
    assert(out(1L) !== out(11L), "bridge did not merge the cliques")
  }

  test("labelPropagation: tie-break picks the smallest label deterministically") {
    // vertex 5 sees labels 1 and 9 with equal weight after round 1:
    // star 5-{1,9}, equal weights, no other edges
    val es = Seq((5L, 1L, 2L), (5L, 9L, 2L))
    val r1 = Graph.labelPropagation(undirected(es), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(5L) === 1L) // min label wins the tie
    // leaves adopt the hub's initial label
    assert(r1(1L) === 5L && r1(9L) === 5L)
  }

  test("labelPropagation: weight majority beats label minority") {
    // vertex 7: edge to 1 (w=1) vs edge to 9 (w=10) — heavier label wins
    // even though 1 < 9
    val es = Seq((7L, 1L, 1L), (7L, 9L, 10L))
    val r1 = Graph.labelPropagation(undirected(es), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(7L) === 9L)
  }
}
