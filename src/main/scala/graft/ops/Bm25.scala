package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 (Robertson et al., TREC-3 1994, public) factored so the
  * batch registry query (x106) and the streaming index-maintenance path
  * ([[graft.streaming.PostingsStream]]) score through the SAME expressions
  * — the stream report inherits the oracle-checked semantics by
  * construction, not by parallel re-implementation.
  *
  * Plan shape (the 100 TB argument, same as x106's header comment): the
  * postings table (doc, term, tf) shuffles once on term; the query side
  * (terms of the query docs + their idf) is a few hundred rows and
  * broadcasts; candidates are only docs sharing a query term; the top-k
  * cut is a qid-partitioned rank with WindowGroupLimit pushdown. Every fp
  * constant and operation is written in one place and one order, so any
  * two callers agree bit-for-bit; per-term contributions round to 6 and
  * sum as DECIMAL(18,6) internally (add-order-proof), emitted DOUBLE.
  */
object Bm25 {

  /** (doc_id, term, tf) postings of a (doc_id, text) frame — x106's
    * tokenizer: split on single spaces, empties dropped. Row-local
    * (explode + one groupBy on (doc, term)); at scale this is the map
    * side of the single postings shuffle. */
  def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(filter(split(col("text"), " "), x => x =!= "")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** BM25 top-`k` retrieval: query docs are `doc_id < 3`, candidates the
    * rest of the corpus via the inverted-index join. `tf` is a
    * [[termFreqs]]-shaped postings frame; `nDocs` a 1-row frame with a
    * `n_docs` LONG (corpus size INCLUDING token-less docs — the caller
    * knows the corpus, the postings don't). k1=1.2, b=0.75 inlined as the
    * same decimal literals the x106 oracle SQL uses. */
  def topK(tf: DataFrame, nDocs: DataFrame, k: Int = 10): DataFrame = {
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val st = nDocs
      .crossJoin(tf.agg(sum("tf").as("ntok"))) // both one row
      .select(col("n_docs"),
        (col("ntok").cast("double") / col("n_docs")).as("avgdl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qdf = tf.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("term"))
      .join(df, "term")
      .crossJoin(broadcast(st))
      .select(col("qid"), col("term"),
        log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"),
        col("avgdl"))
    val cand = tf.join(broadcast(qdf), Seq("term"))
      .filter(col("doc_id") =!= col("qid"))
      .join(dl, "doc_id")
      .select(col("qid"), col("doc_id").as("cid"),
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 6)
          .as("contrib"))
    val sc = cand.groupBy("qid", "cid")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("contrib").cast("decimal(18,6)")).cast("double")
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("cid"))
    sc.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }
}
