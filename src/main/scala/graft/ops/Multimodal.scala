package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride along as opaque `BINARY` columns
  * with typed metadata, and per-row decode / feature-extract kernels run
  * inside `mapPartitions` (the JVM twin of `mapInPandas` batch UDFs): the
  * expensive decode is partition-local, nothing shuffles pixel data, and the
  * 100 TB path is "binary column in parquet → partition-parallel kernel →
  * small feature columns out".
  *
  * The actual image/audio codecs are NOT in this container, so [[decodeStub]]
  * is a clearly-marked deterministic fake; the Spark-side plumbing — schema,
  * encoders, batch shape, partitioning — is real and tested.
  */
object Multimodal {

  /** One media row: payload + metadata. Mirrors the reference's image rows
    * (generate_images_from_dicom.py:48-51 — fixed-size pixel array + id). */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int)

  /** Extracted features: what a decode+featurize kernel emits per media row. */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      sha256: String,
      width: Int,
      height: Int,
      mean_byte: Double,
      histogram: Array[Long])

  /** STUB decoder — stands in for a real codec (pydicom/PIL/ffmpeg are not
    * installed here). Deterministic: "decodes" a payload to its byte stats.
    * Swap the body for a real decode when codecs are available; the
    * surrounding plumbing does not change. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    MediaFeatures(
      r.media_id, bytes.length.toLong, sha, r.width, r.height,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, hist)
  }

  /** Build a media table from the documents table: utf-8 payload bytes as a
    * stand-in for encoded media, with deterministic fake dimensions. Proves
    * the binary-column schema path end-to-end on harness data. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Partition-parallel decode + featurize: the mapInPandas-shaped stage.
    * One task per input partition; no shuffle; output is small feature rows
    * so downstream aggregation never moves payload bytes. */
  def featurize(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** STUB resize: real impl would decode → scale → re-encode. The stub keeps
    * the byte-level contract (output length scales with the area ratio) so
    * downstream schema/partitioning logic is exercised for real. */
  def resizeStub(r: MediaRow, newW: Int, newH: Int): MediaRow = {
    val ratio = (newW.toLong * newH).toDouble / (r.width.toLong * r.height)
    val n = math.max(1, math.ceil(r.payload.length * ratio).toInt)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = r.payload(i % r.payload.length); i += 1 }
    r.copy(payload = out, width = newW, height = newH)
  }

  /** STUB frame sampling for video-shaped media: returns every k-th chunk of
    * the payload as its own "frame" row — the fan-out shape (one row → n
    * frame rows, flatMap, no shuffle) is the real contract. */
  def sampleFramesStub(spark: SparkSession, media: Dataset[MediaRow],
      frameBytes: Int, everyK: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (chunk, idx) =>
          r.copy(media_id = r.media_id * 10000 + idx, payload = chunk)
        }
    }
  }
}
