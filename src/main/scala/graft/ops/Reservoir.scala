package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-stratum weighted reservoir sampling — the Efraimidis-Spirakis
  * (IPL 97, 2006) A-ES core shared by the registry query x221 and the
  * streaming twin [[graft.streaming.ReservoirStream]], so the stream
  * inherits the oracle-checked semantics (the Decay/x175 discipline).
  *
  * A-ES keys each row with u^(1/w) (equivalently ln(u)/w — same order)
  * for u uniform in (0,1] derived from a per-row 48-bit md5 lane, and
  * keeps the k largest keys per stratum. Because the key depends only on
  * (doc_id, n_chars), it is deterministic and replayable: top-k is a
  * monoid homomorphism (top-k of a union = top-k of the per-part top-ks),
  * which is exactly what lets the streaming twin keep only k rows per
  * stratum per micro-batch and still equal the one-shot batch draw.
  */
object Reservoir {

  /** (doc_id, source, n_chars, key) — the deterministic A-ES key frame.
    * Rows with non-positive weight carry no draw and are dropped. */
  def aesKeyed(docs: DataFrame): DataFrame = docs
    .filter(col("n_chars") > 0)
    .select(col("doc_id"), col("source"),
      col("n_chars").cast("bigint").as("n_chars"))
    .withColumn("u",
      (conv(substring(md5(concat_ws(":", lit("wrs"), col("doc_id"))),
        1, 12), 16, 10).cast("double") + 1.0) / 281474976710657.0)
    .withColumn("key", log(col("u")) / col("n_chars"))

  /** k largest keys per stratum; rank <= k plans a WindowGroupLimit
    * (Partial mode cuts to <= k rows per map partition BEFORE the
    * stratum shuffle — PlansSpec-asserted on x221). */
  def topKPerStratum(keyed: DataFrame, k: Int): DataFrame =
    keyed.withColumn("rank",
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("key").desc, col("doc_id"))).cast("bigint"))
      .filter(col("rank") <= k)

  /** The x221 output contract: the fixed-size per-stratum draw. */
  def sample(docs: DataFrame, k: Int): DataFrame =
    topKPerStratum(aesKeyed(docs), k)
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"),
        round(col("key") * 1e6, 6).as("key_ppm"))
      .orderBy(col("source"), col("rank"))
}
