package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class VolumeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tsRows(): Seq[Timestamp] =
    graft.Tables.events(spark, sfDir).select($"ts")
      .as[Timestamp].collect().toSeq

  test("streamed volume state == one-shot accumulate == registry x95") {
    val rows = tsRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("vol_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Timestamp]
    val q = VolumeStream.volumeOnIngest(mem.toDF().toDF("ts"), state,
      java.nio.file.Files.createTempDirectory("vol_ckpt").toString)
    // uneven batches split MID-DAY, so per-day counts must merge partials
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = VolumeStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("vol_once").toString
    VolumeStream.accumulateBatch(graft.Tables.events(spark, sfDir), stateOnce, 0L)
    val fromOnce = VolumeStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x95_volume_anomaly")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("re-delivered micro-batch does not double-count volume") {
    val rows = tsRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("vol_redeliver").toString
    VolumeStream.accumulateBatch(b1.toDF("ts"), state, batchId = 0L)
    VolumeStream.accumulateBatch(b2.toDF("ts"), state, batchId = 1L)
    val once = VolumeStream.report(spark, state).collect().toSeq
    VolumeStream.accumulateBatch(b2.toDF("ts"), state, batchId = 1L)
    val twice = VolumeStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }
}
