package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for the LLM-data-pipeline surface.
  *
  * Design point is 100 TB of documents:
  *  - exact dedup is a hash-groupBy — one shuffle on the digest, map-side
  *    partial aggregation, no driver state;
  *  - near-dup is MinHash + LSH banding — signatures are computed row-local
  *    with codegen'd higher-order functions (no UDF, no shuffle), then the
  *    only shuffle is the band-bucket self-join, which touches candidate
  *    pairs (≈ linear for realistic dup rates) instead of O(n²);
  *  - SimHash gives a 64-bit fingerprint whose banded chunks find
  *    small-hamming-distance pairs by pigeonhole, again join-on-bucket.
  *
  * All hash families are deterministic (fixed seed) so reruns, tests and
  * the driver's hash compare are stable.
  */
object Dedup {

  /** Mersenne prime 2^61-1: modulus of the universal hash family. */
  private val P = 2305843009213693951L

  /** Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod P.
    * a is odd and < 2^29 so a*x stays below 2^62 for 32-bit x (no ANSI
    * overflow); seed fixed for reproducibility. */
  private def hashFamily(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(k)((rng.nextInt(1 << 28).toLong * 2 + 1, math.abs(rng.nextLong()) % P))
  }

  /** Base 32-bit shingle hash (xxhash64 masked) — codegen'd, deterministic. */
  private def baseHash(shingle: Column): Column =
    xxhash64(shingle).bitwiseAND(lit(0xFFFFFFFFL))

  // ------------------------------------------------------------------ exact

  /** Exact dedup by content digest: one row per distinct payload, keeping the
    * smallest id, plus the duplicate count. Single shuffle on the digest. */
  def exact(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.groupBy(sha2(col(payloadCol).cast("binary"), 256).as("digest"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  // --------------------------------------------------------------- minhash

  /** Adds `shingles` (distinct char 3-grams) and `sig` (minhash signature,
    * array of k longs). Row-local: stays inside whole-stage codegen. */
  def withMinhash(df: DataFrame, textCol: String, k: Int = 64): DataFrame = {
    val sh = TextFunctions.shingles3(col(textCol))
    val hashed = transform(sh, baseHash(_))
    // Empty shingle set (text shorter than a shingle) ⇒ sentinel P per slot,
    // so the signature is total; such docs are excluded from near-dup search.
    val sig = array(hashFamily(k).map { case (a, b) =>
      coalesce(array_min(transform(hashed, x => pmod(x * a + b, lit(P)))), lit(P))
    }: _*)
    df.withColumn("shingles", sh).withColumn("sig", sig)
  }

  /** LSH banding: one row per (doc, band) with the band's bucket key.
    * bands*rowsPerBand must equal the signature length. */
  def lshBands(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    sigs
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .select(
        col(idCol), col("band"),
        array_join(
          transform(
            slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")),
          "_").as("bucket"))

  /** MinHash+LSH near-duplicate pairs, verified with exact Jaccard on the
    * shingle sets. Returns (doc_a, doc_b, jaccard) for jaccard >= threshold.
    *
    * Shuffles: the band self-join (on (band, bucket)) and the two signature
    * joins to re-attach shingles — all key-partitioned, no O(n²) stage.
    * With k=64, bands=16: P(catch | j=0.8) ≈ 0.9998.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = k / bands
    val sigs = withMinhash(df, textCol, k)
      .filter(size(col("shingles")) > 0) // jaccard undefined on empty sets
      .select(col(idCol), col("shingles"), col("sig"))
    val bandsDf = lshBands(sigs, idCol, bands, rowsPerBand)

    val cand = bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()

    val shA = sigs.select(col(idCol).as("doc_a"), col("shingles").as("sh_a"))
    val shB = sigs.select(col(idCol).as("doc_b"), col("shingles").as("sh_b"))
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jaccard",
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash of the shingle set, without UDFs: for each bit position,
    * sign of sum over shingles of ±1 (from that shingle's hash bit). */
  def simhash64(textCol: Column): Column = {
    val hashed = transform(TextFunctions.shingles3(textCol), s => xxhash64(s))
    val bits = (0 until 64).map { i =>
      // +1 when bit i set else -1, summed; bit set in result when sum > 0
      val votes = aggregate(hashed, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1)
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup candidates: pairs whose 64-bit fingerprints agree on at
    * least one of 4 16-bit chunks (pigeonhole ⇒ catches hamming distance ≤ 3),
    * verified by exact hamming distance <= maxHamming. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol), simhash64(col(textCol)).as("simhash"))
    val chunked = withSim
      .withColumn("chunk", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk_key",
        expr("shiftright(simhash, CAST(chunk * 16 AS INT))").bitwiseAND(lit(0xFFFFL)))
    val cand = chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_key") === col("b.chunk_key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // ------------------------------------------------------- exact n-gram jaccard

  /** Blocked exact n-gram Jaccard: all pairs within (lang, source) blocks with
    * a ±20% length prefilter, keeping pairs with jaccard >= threshold.
    * The blocking keys bound the pair count; at 100 TB you'd LSH first
    * ([[minhashNearDups]]) — this is the exact, oracle-checkable variant. */
  def ngramJaccardPairs(df: DataFrame, threshold: Double): DataFrame = {
    val sh = df.select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      TextFunctions.shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0) // jaccard undefined on empty sets
    sh.as("a")
      .join(sh.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.n_chars") - col("b.n_chars")) <=
            greatest(col("a.n_chars"), col("b.n_chars")) * 0.2)
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(
          size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
            size(array_union(col("a.sh"), col("b.sh"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
