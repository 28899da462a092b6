package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / serve-many IVF-PQ index — the production shape of the ANN
  * path: a pipeline builds the index in one job, persists it, and every
  * later query batch loads and searches WITHOUT re-encoding the corpus
  * (FAISS's `write_index`/`read_index` lifecycle; Jégou et al. 2011's
  * structures are exactly what gets persisted; reference has no index
  * persistence — extension op).
  *
  * On-disk layout under one directory, all parquet:
  *   codes/     (cid, cell, codes) — one slim row per corpus vector; the
  *              only table that scales with the corpus (~m bytes payload),
  *              and the only one a search scans
  *   centroids/ (cell, vec)        — coarse quantizer, |cells| rows
  *   codebook/  (c, vec)           — PQ codebook, |centroids| rows
  *   meta/      (m)                — subspace count
  *
  * At 100 TB: `codes` is written partitioned by the same parquet layout as
  * any fact table (rebuild is the one full-corpus job); centroids/codebook/
  * meta are driver-sized and load with a tiny collect. A search touches
  * only probed-cell code rows + the two small tables — the full embedding
  * column never rides through a serve-side plan. */
final case class IvfPqIndex(
    codes: DataFrame,
    centroids: Array[Array[Double]],
    codebook: Array[Array[Double]],
    m: Int) {

  /** Persist all four tables under `dir` (overwrite). Returns this. */
  def save(dir: String): IvfPqIndex = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    centroids.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("cell", "vec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    codebook.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("c", "vec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebook")
    Seq(m).toDF("m").coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    this
  }

  /** ADC top-k straight off the (possibly loaded) code table — same output
    * contract as [[Similarity.ivfPqTopK]], no corpus re-encoding. */
  def topK(queries: DataFrame, idCol: String, embCol: String, k: Int,
      nProbe: Int): DataFrame =
    Similarity.ivfPqSearchCoded(queries, idCol, embCol, codes, centroids,
      m, codebook, k, nProbe)

  /** Index shortlist + exact cosine re-rank against the corpus's full
    * vectors — same output contract as [[Similarity.ivfPqRefineTopK]].
    * The corpus table is needed only here (the refine tail reads `refine`
    * full vectors per query); plain [[topK]] never touches it. */
  def refineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int, nProbe: Int, refine: Int): DataFrame = {
    val shortlist = topK(queries, idCol, embCol, k = refine, nProbe)
      .select(col("qid"), col("cid"))
    Similarity.cosineRerank(shortlist, queries, corpus, idCol, embCol, k)
  }
}

object IvfPqIndex {

  /** Encode the corpus into an in-memory index handle (the one
    * full-corpus job): coarse cells from seed-vector centroids, PQ codes
    * from the given codebook. Call [[IvfPqIndex.save]] to persist. */
  def build(corpus: DataFrame, idCol: String, embCol: String,
      seedIds: Seq[Long], m: Int, codebook: Array[Array[Double]]): IvfPqIndex = {
    val cents = Similarity.seedVectors(corpus, idCol, embCol, seedIds)
      .map(_.map(_.toDouble).toArray).toArray
    IvfPqIndex(
      Similarity.ivfPqEncodeCells(corpus, idCol, embCol, cents, m, codebook),
      cents, codebook, m)
  }

  /** Reload a persisted index: codes stay a lazy DataFrame over the
    * parquet; centroids/codebook/meta are k-sized driver collects. */
  def load(spark: SparkSession, dir: String): IvfPqIndex = {
    def vecs(path: String, ord: String): Array[Array[Double]] =
      spark.read.parquet(path).select(col(ord), col("vec")).orderBy(ord)
        .collect().map(_.getSeq[Double](1).toArray)
    IvfPqIndex(
      spark.read.parquet(s"$dir/codes"),
      vecs(s"$dir/centroids", "cell"),
      vecs(s"$dir/codebook", "c"),
      spark.read.parquet(s"$dir/meta").head.getInt(0))
  }
}
