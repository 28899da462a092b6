package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SeqMineSpec extends SparkSpec {
  import spark.implicits._

  // 4 sequences over alphabet {a, b, c}:
  //   s1: a b c     s2: a b     s3: b a     s4: c
  private def seqs = Seq(
    (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
    (2L, 1L, "a"), (2L, 2L, "b"),
    (3L, 1L, "b"), (3L, 2L, "a"),
    (4L, 1L, "c")
  ).toDF("sid", "pos", "et")

  private def mine(minSup: Double, maxLen: Int) =
    SeqMine.prefixSpan(seqs, "sid", "et", Seq(col("pos")), minSup, maxLen)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("prefixSpan counts subsequence support with greedy earliest match") {
    val out = mine(0.5, 2) // minsup = ceil(0.5 * 4) = 2 sequences
    val byPat = out.map(t => t._1 -> t._3).toMap
    // level 1: a in s1,s2,s3 (3); b in s1,s2,s3 (3); c in s1,s4 (2)
    assert(byPat("a") === 3L)
    assert(byPat("b") === 3L)
    assert(byPat("c") === 2L)
    // level 2: a>b in s1,s2 (2); others below threshold
    assert(byPat("a>b") === 2L)
    assert(!byPat.contains("b>a")) // only s3 — support 1 < 2
    assert(!byPat.contains("a>c")) // only s1
    assert(out.filter(_._2 == 2L).map(_._1) === Seq("a>b"))
    // support_frac = support / 4, rounded
    assert(out.find(_._1 == "a").get._4 === 0.75)
    assert(out.find(_._1 == "a>b").get._4 === 0.5)
  }

  test("prefixSpan prunes extensions of infrequent prefixes") {
    // minsup = ceil(0.75 * 4) = 3: c (support 2) is infrequent, so even
    // though c itself occurs, NO pattern starting at c may appear, and
    // a>b (support 2 < 3) dies at level 2 leaving level 2 empty
    val out = mine(0.75, 3)
    assert(out.map(_._1).sorted === Seq("a", "b"))
    assert(out.forall(_._2 == 1L))
  }

  test("prefixSpan respects Apriori anti-monotonicity on real data") {
    // support(P') <= support(prefix(P')) for every emitted pattern — the
    // invariant the pruning relies on; checked over the harness events
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val first8 = graft.Tables.events(spark, sfDir)
      .withColumn("rn0", row_number().over(W))
      .filter(col("rn0") <= 8)
    val out = SeqMine.prefixSpan(first8, "user_id", "event_type",
        Seq(col("ts"), col("event_id")), minSupFrac = 0.25, maxLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    out.foreach { case (pat, sup) =>
      val parts = pat.split(">")
      if (parts.length > 1) {
        val prefix = parts.init.mkString(">")
        assert(out.contains(prefix),
          s"pattern $pat emitted but its prefix $prefix was pruned")
        assert(out(prefix) >= sup,
          s"anti-monotonicity violated: sup($prefix)=${out(prefix)} < sup($pat)=$sup")
      }
    }
  }

  test("prefixSpan rejects items that would corrupt the pattern encoding") {
    val badSep = Seq((1L, 1L, "a>b"), (1L, 2L, "c")).toDF("sid", "pos", "et")
    intercept[IllegalArgumentException] {
      SeqMine.prefixSpan(badSep, "sid", "et", Seq(col("pos")), 0.5, 2)
    }
    val badEmpty = Seq((1L, 1L, ""), (1L, 2L, "c")).toDF("sid", "pos", "et")
    intercept[IllegalArgumentException] {
      SeqMine.prefixSpan(badEmpty, "sid", "et", Seq(col("pos")), 0.5, 2)
    }
  }

  test("prefixSpan level-3 growth only from surviving level-2 prefixes") {
    val out = mine(0.25, 3) // minsup = 1: everything frequent
    val byPat = out.map(t => t._1 -> t._3).toMap
    // a>b>c only in s1
    assert(byPat("a>b>c") === 1L)
    // greedy earliest match: b>a exists only in s3 (s1's b is after its a)
    assert(byPat("b>a") === 1L)
    // no pattern may repeat a position: single-element sequences grow nothing
    assert(!byPat.contains("c>c"))
  }
}
