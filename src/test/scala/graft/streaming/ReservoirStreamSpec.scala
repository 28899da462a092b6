package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class ReservoirStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docRows(): Seq[(Long, String, Long)] =
    graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source", "CAST(n_chars AS BIGINT)")
      .as[(Long, String, Long)].collect().toSeq

  test("streamed reservoir == one-shot accumulate == registry x221") {
    val rows = docRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("rsv_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val q = ReservoirStream.reservoirOnIngest(
      mem.toDF().toDF("doc_id", "source", "n_chars"), state,
      java.nio.file.Files.createTempDirectory("rsv_ckpt").toString)
    // uneven batches so strata straddle micro-batches: the per-batch
    // top-k survivors must COMPOSE (top-k is a monoid homomorphism)
    val (b1, tail) = rows.splitAt(rows.size / 4)
    val (b2, b3) = tail.splitAt(tail.size / 3)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = ReservoirStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("rsv_once").toString
    ReservoirStream.accumulateBatch(
      graft.Tables.documents(spark, sfDir), stateOnce, 0L)
    val fromOnce = ReservoirStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x221_weighted_reservoir")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("same-batch-id re-delivery replaces, never duplicates a survivor") {
    val rows = docRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("rsv_redeliver").toString
    def acc(b: Seq[(Long, String, Long)], id: Long): Unit =
      ReservoirStream.accumulateBatch(
        b.toDF("doc_id", "source", "n_chars"), state, id)
    acc(b1, 0L); acc(b2, 1L)
    val once = ReservoirStream.report(spark, state).collect().toSeq
    acc(b2, 1L) // at-least-once replay of the same micro-batch
    val twice = ReservoirStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }

  test("per-batch state is bounded at k rows per stratum, not batch size") {
    val rows = docRows()
    val state = java.nio.file.Files.createTempDirectory("rsv_bound").toString
    ReservoirStream.accumulateBatch(
      rows.toDF("doc_id", "source", "n_chars"), state, 0L)
    val perStratum = spark.read.parquet(state)
      .groupBy("source").count().collect()
    assert(perStratum.nonEmpty)
    assert(perStratum.forall(_.getLong(1) <= ReservoirStream.K),
      s"a stratum kept more than k=${ReservoirStream.K} rows: " +
        perStratum.mkString(", "))
  }
}
