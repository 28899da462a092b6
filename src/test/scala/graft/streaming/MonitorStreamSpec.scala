package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class MonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tsRows(): Seq[Timestamp] =
    graft.Tables.events(spark, sfDir).select($"ts")
      .as[Timestamp].collect().toSeq

  test("changepoint + MASE reports off the streamed day-count state == registry x143/x146") {
    val rows = tsRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("mon_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Timestamp]
    // reuse VolumeStream's ingest: ONE state feed, three monitors
    val q = VolumeStream.volumeOnIngest(mem.toDF().toDF("ts"), state,
      java.nio.file.Files.createTempDirectory("mon_ckpt").toString)
    // uneven batches split MID-DAY so daily partials must merge
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()

    val cpStream = MonitorStream.reportChangepoint(spark, state)
      .collect().toSeq
    val cpRegistry = graft.SparkEntry
      .queries("x143_changepoint")(spark, sfDir).collect().toSeq
    assert(cpStream === cpRegistry)

    val maseStream = MonitorStream.reportMase(spark, state).collect().toSeq
    val maseRegistry = graft.SparkEntry
      .queries("x146_mase_forecast")(spark, sfDir).collect().toSeq
    assert(maseStream === maseRegistry)
  }

  test("re-delivered micro-batch does not move the change point") {
    val rows = tsRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("mon_redeliver").toString
    VolumeStream.accumulateBatch(b1.toDF("ts"), state, batchId = 0L)
    VolumeStream.accumulateBatch(b2.toDF("ts"), state, batchId = 1L)
    val once = MonitorStream.reportChangepoint(spark, state).collect().toSeq
    VolumeStream.accumulateBatch(b2.toDF("ts"), state, batchId = 1L)
    val twice = MonitorStream.reportChangepoint(spark, state).collect().toSeq
    assert(once === twice)
  }
}
