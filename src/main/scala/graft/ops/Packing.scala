package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

// public top-level: Janino-generated encoder code instantiates these
// reflectively (private nested case classes fail codegen — see SessionState)
final case class DocLen(lang: String, salt: Long, doc_id: Long, n_tokens: Long)
final case class PackedDoc(lang: String, salt: Long, doc_id: Long,
    n_tokens: Long, bin_id: Long)

/** Sequence packing for LLM pretraining batches: assign documents to
  * fixed-token-budget bins with first-fit-decreasing (FFD) — the classic
  * bin-packing heuristic (≤ 11/9·OPT + 1, Johnson 1973, public) and the
  * production packing shape (longest docs placed first; short docs fill the
  * gaps; no document is split across bins).
  *
  * 100 TB shape: FFD is sequential, so it runs inside bounded SALTED BINS —
  * the group key is (lang, doc_id % nSalts), one shuffle, and each group
  * packs locally in its task. nSalts scales with the corpus so a group
  * stays ~thousands of docs regardless of total size; packing quality is
  * unaffected because bins never need to span salt cells (budget ≪ cell
  * total). Deterministic: docs sort by (n_tokens desc, doc_id) in-group.
  *
  * Oversized docs (n_tokens > budget) get a bin of their own — first-fit
  * finds no space, opening a fresh bin; downstream truncation policy is the
  * caller's concern.
  */
object Packing {

  def packFFD(docs: DataFrame, textCol: String = "text", budget: Long = 256L,
      nSalts: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("lang"), (col("doc_id") % nSalts).as("salt"), col("doc_id"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .as[DocLen]
      .groupByKey(d => (d.lang, d.salt))
      .flatMapGroups { (_: (String, Long), it: Iterator[DocLen]) =>
        val ds = it.toArray.sortBy(d => (-d.n_tokens, d.doc_id))
        val bins = scala.collection.mutable.ArrayBuffer[Long]()
        ds.iterator.map { d =>
          val j = bins.indexWhere(_ + d.n_tokens <= budget)
          val bin =
            if (j >= 0) { bins(j) += d.n_tokens; j.toLong }
            else { bins += d.n_tokens; (bins.length - 1).toLong }
          PackedDoc(d.lang, d.salt, d.doc_id, d.n_tokens, bin)
        }
      }
      .toDF()
  }
}
