package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Iterative BPE merge training (Sennrich et al. 2015, public): the full
  * count → pick-best-pair → re-segment loop, not just one iteration's pair
  * counts (which is [[graft.ops.ExtensionQueries]] x28).
  *
  * 100 TB shape — the classic trick is that training never touches the
  * corpus after the first pass: one shuffle builds the distinct-word
  * frequency table, and every merge iteration runs over that VOCAB-sized
  * table (segmentation is word-local, the pair count reduces into a
  * ≤|symbols|²-cardinality key space). Driver state is the merge list —
  * tiny by construction. Like [[Dedup.dupClusters]], each iteration is
  * driver-coordinated with `localCheckpoint` truncating lineage so plan
  * size stays constant across rounds.
  *
  * Determinism: best pair = max count, ties broken by (left, right)
  * ascending — the same total order an external oracle can replay.
  */
object BpeTrain {

  /** Greedy left-to-right application of ONE merge to a symbol sequence:
    * scan; when (syms(i), syms(i+1)) == (a, b), emit a+b and skip both.
    * Matches the textbook BPE apply (and the oracle's non-overlapping
    * string replace on a delimited representation). */
  def applyMerge(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Train `nMerges` BPE merges over the whitespace tokens of `textCol`.
    * Returns the merge sequence as a (tiny, driver-built) DataFrame:
    * (step, merge_left, merge_right, pair_cnt). */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // fan an under-split scan before the tokenize+explode (guide §2.5;
    // no-op on a well-split table); keyed by the text itself since the
    // trainer takes any frame shape
    val wc = graft.Tables.fanOut(docs.select(col(textCol)), col(textCol))
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
    // initial segmentation: one symbol per character
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet
    var segs: Dataset[(IndexedSeq[String], Long)] = wc
      .map { case (w, c) => (w.map(_.toString).toIndexedSeq, c) }
      .localCheckpoint()
    var segIds = spark.sparkContext.getPersistentRDDs.keySet -- protectedIds
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 0
    var exhausted = false
    // Checkpoint cadence: re-segmentation after a merge stays a LAZY narrow
    // map whose lineage rides into the next round's pair-count job, so most
    // rounds cost ONE Spark action (the take) instead of two. Every
    // CkptEvery rounds the pending maps are folded into a fresh checkpoint,
    // keeping plan size bounded — the one-action-per-round device of
    // dupClusters, applied to the other driver-coordinated loop (cuts
    // actions from 2/round to ~1.2/round; bench_history tracks the wall
    // effect at sf0.1).
    val CkptEvery = 5
    var sinceCkpt = 0
    while (step < nMerges && !exhausted) {
      val top = segs
        .flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
        }
        .toDF("pa", "pb", "c")
        .groupBy("pa", "pb").agg(sum("c").as("cnt"))
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .as[(String, String, Long)]
        .take(1)
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val (a, b, cnt) = top.head
        step += 1
        merges += ((step, a, b, cnt))
        segs = segs.map { case (syms, c) => (applyMerge(syms, a, b), c) }
        sinceCkpt += 1
        if (sinceCkpt == CkptEvery && step < nMerges) {
          sinceCkpt = 0
          val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
          segs = segs.localCheckpoint()
          // drop the superseded segmentation's checkpoint blocks: without
          // this, executors pin copies of the vocab table until the
          // session dies (catalog.clearCache does not reach them)
          val persisted = spark.sparkContext.getPersistentRDDs
          segIds.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = false)))
          segIds = spark.sparkContext.getPersistentRDDs.keySet -- beforeIds
        }
      }
    }
    // free the final checkpoint too — callers only need the merge list
    val persisted = spark.sparkContext.getPersistentRDDs
    segIds.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = false)))
    merges.toSeq.toDF("step", "merge_left", "merge_right", "pair_cnt")
  }

  /** Per-executor-JVM memo of word → BPE token count, keyed by the merge
    * list's hash so different trained models never cross-hit. Corpus word
    * frequency follows Zipf, so the distinct-word working set is tiny
    * relative to occurrences — each executor segments a word once and
    * serves every later occurrence from the map (the standard production
    * tokenizer cache). Bounded: wiped when it exceeds ~1M entries (a
    * pathological id-like corpus), which only costs recomputation. */
  @transient private lazy val segCountCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), java.lang.Long]()

  /** Row-local application of a TRAINED merge list: each word of the token
    * array is split to chars and the merges replayed in order; returns the
    * total BPE token count. The merge list rides the UDF closure — tiny by
    * construction (nMerges entries), so this is a plain broadcast-sized
    * lookup applied in-task, no shuffle, memoized per executor JVM. */
  def bpeTokenCountUdf(merges: Seq[(String, String)]) = {
    val mergesKey = merges.hashCode
    org.apache.spark.sql.functions.udf { toks: Seq[String] =>
      var n = 0L
      toks.foreach { w =>
        val key = (mergesKey, w)
        var cnt = segCountCache.get(key)
        if (cnt == null) {
          var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
          merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
          cnt = java.lang.Long.valueOf(syms.length.toLong)
          if (segCountCache.size > 1000000) segCountCache.clear()
          segCountCache.put(key, cnt)
        }
        n += cnt.longValue()
      }
      n
    }
  }
}
