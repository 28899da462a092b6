package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("dedupe-on-ingest: two-batch stream equals the sequential batch fold") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = docs.splitAt(docs.length / 2)

    // streaming run: two micro-batches through the foreachBatch sink
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val (sIdx, sPairs) = (tmp("dedup_s_idx"), tmp("dedup_s_pairs"))
    // createTempDirectory pre-creates the dirs; ingestBatch must see "no
    // index yet", so hand the stream paths that don't exist
    val q = DedupStream.dedupeOnIngest(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$sIdx/t", s"$sPairs/t", tmp("dedup_ckpt"))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    // batch twin: the same fold called directly, no streaming machinery
    val (bIdx, bPairs) = (tmp("dedup_b_idx"), tmp("dedup_b_pairs"))
    DedupStream.ingestBatch(b1.toDF("doc_id", "text"), "doc_id", "text",
      s"$bIdx/t", s"$bPairs/t", batchId = 0L)
    DedupStream.ingestBatch(b2.toDF("doc_id", "text"), "doc_id", "text",
      s"$bIdx/t", s"$bPairs/t", batchId = 1L)

    def pairsOf(dir: String) = spark.read.parquet(dir)
      .select("doc_a", "doc_b", "jaccard", "kind", "batch_id")
      .as[(Long, Long, Double, String, Long)].collect().toSet
    def indexOf(dir: String) = spark.read.parquet(dir)
      .select("doc_id", "batch_id").as[(Long, Long)].collect().toSet

    val (sp, bp) = (pairsOf(s"$sPairs/t"), pairsOf(s"$bPairs/t"))
    val (si, bi) = (indexOf(s"$sIdx/t"), indexOf(s"$bIdx/t"))
    assert(sp === bp)
    assert(si === bi)

    // the scenario is non-vacuous: the harness corpus has near-dups that
    // SPAN the batch split, so both evidence kinds appear
    assert(sp.exists(_._4 == "batch"), "expected within-batch dup pairs")
    assert(sp.exists(_._4 == "index"), "expected stream-vs-index dup pairs")
    // second-batch docs that hit the index were logged and NOT admitted
    val indexHits = sp.collect { case (a, _, _, "index", _) => a }
    assert(indexHits.nonEmpty)
    indexHits.foreach(d => assert(!si.exists(_._1 == d),
      s"doc $d matched the index but was still admitted"))
    // every admitted doc is novel: no admitted pair (a, b) both in index
    sp.foreach { case (a, b, _, _, _) =>
      assert(!(si.exists(_._1 == a) && si.exists(_._1 == b)),
        s"near-dup pair ($a, $b) both admitted to the index") }
  }
}
