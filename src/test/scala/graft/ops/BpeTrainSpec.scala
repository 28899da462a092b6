package graft.ops

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is greedy left-to-right, non-overlapping") {
    assert(BpeTrain.applyMerge(Vector("a", "a", "a"), "a", "a")
      === Vector("aa", "a"))
    assert(BpeTrain.applyMerge(Vector("a", "a", "a", "a"), "a", "a")
      === Vector("aa", "aa"))
    assert(BpeTrain.applyMerge(Vector("a", "b", "a", "b"), "a", "b")
      === Vector("ab", "ab"))
    assert(BpeTrain.applyMerge(Vector("x", "a", "b", "y"), "a", "b")
      === Vector("x", "ab", "y"))
    assert(BpeTrain.applyMerge(Vector("a"), "a", "a") === Vector("a"))
  }

  test("trainMerges reproduces the hand-computed merge sequence") {
    // corpus: "low" x3, "lower" x2, "newest" x1.
    // Round 1: (l,o)=5 ties (o,w)=5, pair-asc break → (l,o).
    // Round 2: (lo,w)=5.
    // Round 3: (low,e)=2 ties (e,r)=2, "e" < "low" → (e,r).
    val docs = Seq(
      "low low low lower lower newest").toDF("text")
    val merges = BpeTrain.trainMerges(docs, "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().toList
    assert(merges === List(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "e", "r", 2L)))
  }

  test("bpeTokenCountUdf segments with the trained merges") {
    // merges (l,o), (lo,w): "low" → [low] (1), "lower" → [low,e,r] (3),
    // "slow" → [s,lo,w] → [s,low]? no — (l,o) gives [s,lo,w], (lo,w) gives
    // [s,low] (2); "x" → [x] (1)
    val merges = Seq(("l", "o"), ("lo", "w"))
    val out = Seq(("low lower slow x")).toDF("text")
      .select(BpeTrain.bpeTokenCountUdf(merges)(
        graft.functions.TextFunctions.tokens(org.apache.spark.sql.functions.col("text")))
        .as("n"))
      .as[Long].head()
    assert(out === 1L + 3L + 2L + 1L)
  }

  test("trainMerges stops when every word is a single symbol") {
    val docs = Seq("ab ab cd").toDF("text")
    // only 2 possible merges exist: (a,b) then (c,d)
    val merges = BpeTrain.trainMerges(docs, "text", nMerges = 10)
      .as[(Int, String, String, Long)].collect().toList
    assert(merges === List((1, "a", "b", 2L), (2, "c", "d", 1L)))
  }
}
