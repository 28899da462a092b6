package graft

import org.apache.spark.sql.functions._
import graft.sources.{TFRecordIO, TFRecordSink}

/** End-to-end stage-1 + stage-2 test (SURVEY §5.4): synthetic DICOM-like
  * fixtures → maps → split → 7 passes → annotation JSON → TFRecord shards,
  * asserting the multiplier table, schema shape and normalized boxes. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val size = 32

  private def fixtureImages = {
    val rows = (1 to 10).map { i =>
      val px = Array.tabulate(size * size)(j => ((i * 13 + j) % 251).toShort)
      (f"p$i%03d", px, size, size)
    }
    spark.createDataset(rows)
  }

  // FIXTURES §1.1 rows: multi-box patient, negative patient, float coords
  private def fixtureLabels = Seq(
    ("p001", Some(2.0), Some(3.0), Some(8.0), Some(9.0), 1),
    ("p001", Some(12.0), Some(3.0), Some(6.0), Some(5.0), 1),
    ("p002", None, None, None, None, 0),
    ("p003", Some(4.5), Some(6.5), Some(5.0), Some(6.0), 1))
    .toDF("patientId", "x", "y", "width", "height", "Target")

  test("createMaps: P1 filter, P2 coercion, A1 collect, A2 last") {
    val maps = Pipeline.createMaps(fixtureLabels).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(maps("p001").getSeq[Any](1).length === 2)
    assert(maps("p002").getSeq[Any](1).isEmpty) // Target=0 ⇒ no boxes
    assert(maps("p002").getString(2) === "0")
    // int(float("4.5")) == 4
    val p3box = maps("p003").getSeq[org.apache.spark.sql.Row](1).head
    assert(p3box.getInt(0) === 4 && p3box.getInt(1) === 6)
  }

  test("default split plan is window-free; split8020 keeps exact counts") {
    val annotated = Pipeline.annotate(
      spark, fixtureImages, Pipeline.createMaps(fixtureLabels))
    val (tr, va) = Pipeline.hashSplit8020(annotated)
    // the scale path must not funnel rows through a partition-less window
    assert(!tr.queryExecution.executedPlan.toString.contains("Window"))
    assert(!va.queryExecution.executedPlan.toString.contains("Window"))
    assert(tr.count() + va.count() === 10)
    // the reference-faithful variant still splits exactly ceil(0.8n) / rest
    val (t2, v2) = Pipeline.split8020(annotated)
    assert(t2.count() === 8 && v2.count() === 2)
  }

  test("K6 debug viz: box borders burned in, interior and background intact") {
    import graft.ops.Augment.ImageEx
    import graft.ops.Kernels.Box
    val px = Array.fill[Short](100)(7) // 10x10 constant image
    val ex = ImageEx("v1", px, 10, 10, Seq(Box(2, 3, 4, 5)), "1")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Pipeline.pngWithBoxes(ex)))
    def s(x: Int, y: Int) = img.getRaster.getSample(x, y, 0)
    assert(s(2, 3) === 255 && s(6, 3) === 255) // top corners
    assert(s(2, 8) === 255 && s(6, 8) === 255) // bottom corners
    assert(s(4, 3) === 255 && s(2, 5) === 255) // edges
    assert(s(4, 5) === 7)                      // interior untouched
    assert(s(0, 0) === 7)                      // background untouched
    assert(ex.pixels(3 * 10 + 2) === 7)        // input row not mutated
  }

  test("end-to-end: counts, annotations, shards, example schema") {
    val out = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val (nTrainAug, nVal, skipped) = Pipeline.runEndToEnd(
      spark, fixtureImages, fixtureLabels, out, trainShards = 4, valShards = 2)

    // membership of the default id-hash split is deterministic per id
    val ids = (1 to 10).map(i => f"p$i%03d")
    val buckets = ids.toDF("id")
      .select(col("id"), pmod(xxhash64(col("id")), lit(100)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trainIds = ids.filter(buckets(_) < 80).toSet
    val valIds = ids.toSet -- trainIds
    assert(nVal === valIds.size)
    // positives (p001, p003) fan out 190 each, negatives 20 each — the J1
    // left-join default makes unlabeled ids negative
    val positives = Set("p001", "p003")
    val expTrain = trainIds.count(positives) * 190 +
      trainIds.count(!positives.contains(_)) * 20
    assert(nTrainAug === expTrain)
    assert(skipped >= 0)

    // validation annotation sinks round-trip (S5→S6, reference :92-99)
    val valObjs = spark.read.json(s"$out/validation_object_annotation")
    assert(valObjs.count() === nVal)
    val valCaps = spark.read.json(s"$out/validation_caption_annotation")
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("caption")).toMap
    assert(valCaps.keySet === valIds)
    valIds.foreach { id =>
      assert(valCaps(id) === (if (positives(id)) "1" else "0"))
    }

    // val TFRecords are built FROM the annotation files and carry captions
    val valRecords = TFRecordSink.readAll(s"$out/tfrecords", "val").toSeq
    assert(valRecords.length === nVal)
    valRecords.foreach { r =>
      val ex = TFRecordIO.decodeExample(r)
      val TFRecordIO.BytesFeature(srcId) = ex("image/source_id"): @unchecked
      val TFRecordIO.BytesFeature(cap) = ex("image/caption"): @unchecked
      val id = new String(srcId.head, "UTF-8")
      assert(valIds.contains(id))
      assert(new String(cap.head, "UTF-8") === valCaps(id))
    }

    // annotation JSONs round-trip (S5→S6)
    val objs = spark.read.json(s"$out/object_annotation")
    assert(objs.count() === nTrainAug)
    assert(objs.columns.toSet === Set("id", "boxes"))
    val caps = spark.read.json(s"$out/caption_annotation")
    assert(caps.filter(col("caption") === "1").count() > 0)

    // shard files exist with reference naming
    val shardDir = new java.io.File(s"$out/tfrecords")
    val names = shardDir.listFiles().map(_.getName).sorted
    assert(names.count(_.startsWith("train-")) === 4)
    assert(names.count(_.startsWith("val-")) === 2)
    assert(names.contains("train-00000-of-00004.tfrecord"))

    // every record decodes to the 16-feature schema with normalized boxes
    val records = TFRecordSink.readAll(s"$out/tfrecords", "train").toSeq
    assert(records.length === nTrainAug)
    val expectedKeys = Set(
      "image/height", "image/width", "image/filename", "image/source_id",
      "image/key/sha256", "image/encoded", "image/format", "image/caption",
      "image/object/bbox/xmin", "image/object/bbox/xmax",
      "image/object/bbox/ymin", "image/object/bbox/ymax",
      "image/object/class/text", "image/object/class/label",
      "image/object/is_crowd", "image/object/area")
    val sample = TFRecordIO.decodeExample(records.head)
    assert(sample.keySet === expectedKeys)
    records.take(50).foreach { r =>
      val ex = TFRecordIO.decodeExample(r)
      val TFRecordIO.FloatFeature(xmins) = ex("image/object/bbox/xmin"): @unchecked
      val TFRecordIO.FloatFeature(xmaxs) = ex("image/object/bbox/xmax"): @unchecked
      xmins.foreach(v => assert(v >= 0f && v <= 1f))
      xmaxs.foreach(v => assert(v >= 0f && v <= 1f))
      // format is the TRUE format (png), not the reference's 'jpeg' bug
      val TFRecordIO.BytesFeature(fmt) = ex("image/format"): @unchecked
      assert(new String(fmt.head, "UTF-8") === "png")
      val TFRecordIO.BytesFeature(enc) = ex("image/encoded"): @unchecked
      // PNG magic
      assert((enc.head(0) & 0xFF) === 0x89 && enc.head(1) === 'P'.toByte)
    }

    // the encoded PNG decodes back to real pixel data (S4 is a true sink)
    val first = TFRecordIO.decodeExample(records.head)
    val TFRecordIO.BytesFeature(png) = first("image/encoded"): @unchecked
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png.head))
    assert(img.getWidth === size && img.getHeight === size)
  }
}
