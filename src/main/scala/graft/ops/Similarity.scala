package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths, per the 100 TB design point:
  *  - [[cosineTopK]]: brute force — every (query, corpus) pair. Correct
  *    baseline; cost O(|Q|·|C|·d). Fine when |Q| is small or as the
  *    within-bucket scorer.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus is bucketed by sign
  *    pattern, queries probe only their own bucket. The shuffle is on the
  *    bucket key; each bucket's pair count is |bucket|·|queries in bucket|,
  *    so at scale cost follows data density instead of |C|.
  *
  * All dot products run in double precision via codegen'd higher-order
  * functions (zip_with + aggregate) — no UDFs.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a float-array column, in double precision. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity, rounded to 4 decimals for cross-engine determinism. */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (l2norm(a) * l2norm(b)), 4)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself), ranked by rounded cosine desc then id. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("cid"), col(embCol).as("c_emb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    q.crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Deterministic random hyperplanes: nBits × dim doubles in [-1, 1],
    * generated from a fixed seed and inlined as literal arrays. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Sign-pattern bucket id (0 .. 2^nBits-1) of an embedding under the
    * deterministic hyperplane family. Row-local, codegen'd. */
  def lshBucket(emb: Column, nBits: Int, dim: Int): Column =
    hyperplanes(nBits, dim).zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(emb, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: queries only score vectors in their own
    * sign bucket. Recall < 1 by construction; nBits trades bucket size
    * against recall (multi-probe = re-run with neighboring buckets). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int, nBits: Int, dim: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("q_emb"),
      lshBucket(col(embCol), nBits, dim).as("bucket"))
    val c = corpus.select(col(idCol).as("cid"), col(embCol).as("c_emb"),
      lshBucket(col(embCol), nBits, dim).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    q.join(c, "bucket")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (sim >= threshold), LSH-bucketed
    * so only same-bucket pairs are scored. */
  def cosineNearDups(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, nBits: Int, dim: Int): DataFrame = {
    val e = df.select(col(idCol), col(embCol),
      lshBucket(col(embCol), nBits, dim).as("bucket"))
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosine(col(s"a.$embCol"), col(s"b.$embCol")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
