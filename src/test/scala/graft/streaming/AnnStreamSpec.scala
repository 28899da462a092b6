package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.ops.{IvfPqIndex, Similarity}

class AnnStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed index ingest == index built on the full corpus in one shot") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val codebook = Similarity.seedVectors(e, "vec_id", "embedding", (0L to 15L))
      .map(_.map(_.toDouble).toArray).toArray
    val base = e.filter($"vec_id" < 300)
    val rest = e.filter($"vec_id" >= 300)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq
    assert(rest.nonEmpty)
    val (rest1, rest2) = rest.splitAt(rest.length / 2)

    // build on the base slice only, persist
    val dir = java.nio.file.Files.createTempDirectory("ann_ingest").toString + "/idx"
    IvfPqIndex.build(base, "vec_id", "embedding",
      seedIds = (0L to 7L), m = 8, codebook).save(dir)

    // stream the remaining rows in as two micro-batches
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = AnnStream.indexIngest(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", dir,
      java.nio.file.Files.createTempDirectory("ann_ckpt").toString)
    mem.addData(rest1: _*)
    q.processAllAvailable()
    mem.addData(rest2: _*)
    q.processAllAvailable()
    q.stop()

    val ingested = IvfPqIndex.load(spark, dir)
    // the one-shot index over the SAME total corpus (same frozen quantizers)
    val oneShot = IvfPqIndex.build(e, "vec_id", "embedding",
      seedIds = (0L to 7L), m = 8, codebook)
    assert(ingested.codes.orderBy("cid").collect().toSeq
      === oneShot.codes.orderBy("cid").collect().toSeq)
    // and the search surface agrees end-to-end
    val queries = e.filter($"vec_id" < 5)
    assert(ingested.topK(queries, "vec_id", "embedding", k = 10, nProbe = 3)
        .orderBy("qid", "rn").collect().toSeq
      === oneShot.topK(queries, "vec_id", "embedding", k = 10, nProbe = 3)
        .orderBy("qid", "rn").collect().toSeq)
  }
}
