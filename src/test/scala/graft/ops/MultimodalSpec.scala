package graft.ops

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media schema carries binary payload + typed metadata end-to-end") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
    val firstId = media.head().media_id
    val row = media.filter(_.media_id == firstId).head()
    assert(row.payload.nonEmpty)
    assert(row.width >= 1 && row.height >= 1)
  }

  test("resize stub scales payload with area; frame sampling fans out") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
    val row = media.head()
    val resized = Multimodal.resizeStub(row, row.width * 2, row.height * 2)
    assert(resized.payload.length === row.payload.length * 4)
    assert(resized.width === row.width * 2)

    val frames = Multimodal.sampleFramesStub(spark, media, frameBytes = 16, everyK = 2)
      .collect()
    assert(frames.length > media.count()) // fan-out happened
    assert(frames.forall(_.payload.length <= 16))
  }

  test("featurize runs partition-parallel and matches a local decode") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
      .repartition(3) // prove multi-partition batch shape
    val feats = Multimodal.featurize(spark, media).collect()
    assert(feats.length === media.count())
    val local = media.collect().map(Multimodal.decodeStub).map(f => f.media_id -> f).toMap
    feats.foreach { f =>
      val l = local(f.media_id)
      assert(f.sha256 === l.sha256)
      assert(f.n_bytes === l.n_bytes)
      assert(math.abs(f.mean_byte - l.mean_byte) < 1e-12)
      assert(f.histogram.toSeq === l.histogram.toSeq)
      assert(f.histogram.sum === f.n_bytes) // histogram partitions the bytes
    }
  }
}
