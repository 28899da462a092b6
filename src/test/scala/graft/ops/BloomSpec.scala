package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom membership: inserted keys always hit, positions stay in range") {
    val m = 1 << 12; val k = 3
    val agg = new Bloom.BloomAggregator(m, k)
    val keys = (0L until 500L).map(i => i * 2654435761L % 2147483647L)
    val bits = keys.foldLeft(agg.zero)(agg.reduce)
    // no false negatives, ever — the property contamination removal needs
    assert(keys.forall(Bloom.mightContain(bits, _, m, k)))
    keys.foreach { h =>
      Bloom.positions(h, m, k).foreach(p => assert(p >= 0 && p < m))
    }
  }

  test("merge of partial filters equals the single-pass build") {
    val m = 1 << 12; val k = 3
    val agg = new Bloom.BloomAggregator(m, k)
    val keys = (0L until 400L).map(i => (i * 48271L + 11L) % 2147483647L)
    val single = keys.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = keys.splitAt(137)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq === single.toSeq)
  }

  test("bloom contamination flags a superset of exact contamination") {
    // tiny filter (2^10 bits) on the harness corpus forces false positives;
    // the invariant is direction: bloom never MISSES an exact shared gram
    val docs = graft.Tables.documents(spark, sfDir)
    val bench = docs.filter($"doc_id" % 97 === 0)
    val exact = Dedup.contamination(docs, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    val bloom = Bloom.contaminationByBloom(docs, bench, "doc_id", "text",
        n = 3, m = 1 << 10, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty)
    exact.foreach { case (id, nExact) =>
      assert(bloom.contains(id) && bloom(id) >= nExact,
        s"doc $id: bloom under-flagged (${bloom.get(id)} < $nExact)")
    }
    // and at the default 2^20 bits the FP load on this corpus is zero:
    // bloom == exact, the x45 oracle's premise
    val big = Bloom.contaminationByBloom(docs, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(big === exact)
  }

  test("n=8 production grams: a planted benchmark copy is flagged") {
    val bench = Seq((900L, "alpha bravo charlie delta echo foxtrot golf hotel india"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha bravo charlie delta echo foxtrot golf hotel india and more"),
      (2L, "nothing shared with the benchmark document at all in this row of filler text"),
      (900L, "alpha bravo charlie delta echo foxtrot golf hotel india") // bench member: excluded
    ).toDF("doc_id", "text")
    val out = Bloom.contaminationByBloom(corpus, bench, "doc_id", "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L)) // two 8-gram windows of the 9-token copy
  }

  test("bloomPrunedJoin returns exactly the plain join, and actually prunes") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_partkey".as("p_partkey"), $"l_orderkey", $"l_linenumber")
    val dim = graft.Tables.part(spark, sfDir)
      .filter($"p_partkey" % 10 === 0).select($"p_partkey", $"p_name")
    val pruned = Bloom.bloomPrunedJoin(li, dim, "p_partkey")
      .select($"p_partkey", $"l_orderkey", $"l_linenumber", $"p_name")
      .as[(Long, Long, Int, String)].collect().sorted.toSeq
    val plain = li.join(dim, "p_partkey")
      .select($"p_partkey", $"l_orderkey", $"l_linenumber", $"p_name")
      .as[(Long, Long, Int, String)].collect().sorted.toSeq
    assert(pruned === plain)
    assert(plain.nonEmpty)
    // the filter side must actually cut the big side before the join:
    // with a 1% FP rate and a 1-in-10 dim, the survivor count sits near
    // the true match count, far below the full fact table
    val bits = Bloom.build(dim.select(
      pmod(xxhash64($"p_partkey"), lit(2147483647L)).as("h")))
    val bc = spark.sparkContext.broadcast(bits)
    val probe = udf { h: Long => Bloom.mightContain(bc.value, h, Bloom.DefaultBits, Bloom.DefaultHashes) }
    val survivors = li.filter(probe(pmod(xxhash64($"p_partkey"), lit(2147483647L)))).count()
    val total = li.count()
    assert(survivors < total / 2, s"$survivors of $total survived the filter")
  }
}
