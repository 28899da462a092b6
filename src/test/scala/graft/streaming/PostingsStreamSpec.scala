package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class PostingsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docRows(): Seq[(Long, String)] =
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq

  test("incremental postings ingest serves the registry x106 ranking") {
    val rows = docRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("postings_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = PostingsStream.indexOnIngest(
      mem.toDF().toDF("doc_id", "text"), state,
      java.nio.file.Files.createTempDirectory("postings_ckpt").toString)
    // three uneven batches: corpus stats (df, avgdl, N) accumulate across
    // batch boundaries while each doc's postings stay within one batch
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val incremental = PostingsStream.report(spark, state).collect().toSeq
    val registry = graft.SparkEntry.queries("x106_bm25_topk")(spark, sfDir)
      .collect().toSeq
    assert(incremental === registry)
  }

  test("re-delivered micro-batch leaves the index state unchanged") {
    val rows = docRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("postings_redeliver").toString
    PostingsStream.ingestBatch(b1.toDF("doc_id", "text"), state, batchId = 0L)
    PostingsStream.ingestBatch(b2.toDF("doc_id", "text"), state, batchId = 1L)
    val once = PostingsStream.report(spark, state).collect().toSeq
    // at-least-once delivery replays batch 1: its partitions must be
    // REPLACED with identical content, not appended to
    PostingsStream.ingestBatch(b2.toDF("doc_id", "text"), state, batchId = 1L)
    val twice = PostingsStream.report(spark, state).collect().toSeq
    assert(once === twice)
    assert(once.nonEmpty)
  }
}
