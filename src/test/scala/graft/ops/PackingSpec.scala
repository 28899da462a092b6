package graft.ops

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 10L

  test("packFFD: no bin over budget; oversize docs get their own bin") {
    val docs = Seq(
      (0L, "en", "a b c d e f g h"),        // 8 tokens
      (1L, "en", "a b c d e f g"),          // 7
      (2L, "en", "a b c"),                  // 3
      (3L, "en", "a b"),                    // 2
      (4L, "en", (1 to 15).map(_ => "w").mkString(" ")) // 15 — oversize
    ).toDF("doc_id", "lang", "text")
    val out = Packing.packFFD(docs, budget = budget, nSalts = 1)
      .as[PackedDoc].collect().sortBy(_.doc_id)
    // FFD order by length desc: 15 → bin 0 (own, over budget); 8 → bin 1;
    // 7 → bin 2; 3 → fits none of (15, 8) wait bin1 8+3>10? no, 8+3=11>10,
    // bin2 7+3=10 → bin 2; 2 → bin 1 (8+2=10).
    assert(out.map(_.bin_id).toSeq === Seq(1L, 2L, 2L, 1L, 0L))
    val loads = out.groupBy(_.bin_id).view.mapValues(_.map(_.n_tokens).sum)
    assert(loads(1L) === 10L && loads(2L) === 10L && loads(0L) === 15L)
    // only the oversize doc's bin exceeds budget
    assert(loads.filter(_._2 > budget).keySet === Set(0L))
  }

  test("packFFD salting: groups pack independently and deterministically") {
    val docs = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", ("t " * (1 + (i % 7)).toInt).trim))
      .toDF("doc_id", "lang", "text")
    val a = Packing.packFFD(docs, budget = budget, nSalts = 4)
      .as[PackedDoc].collect().sortBy(d => (d.lang, d.salt, d.doc_id)).toSeq
    val b = Packing.packFFD(docs, budget = budget, nSalts = 4)
      .as[PackedDoc].collect().sortBy(d => (d.lang, d.salt, d.doc_id)).toSeq
    assert(a === b)
    // within every (lang, salt) cell no non-oversize bin exceeds the budget
    a.groupBy(d => (d.lang, d.salt, d.bin_id)).foreach { case (k, ds) =>
      assert(ds.map(_.n_tokens).sum <= budget || ds.length == 1,
        s"cell $k over budget: $ds")
    }
  }
}
