package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
    (2L, "the quick brown fox jumps over the lazy dogs", "en", "s0", 44L), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog", "en", "s1", 43L), // exact dup of 1
    (4L, "completely different text with no overlap at all here", "en", "s0", 54L),
    (5L, "zz", "en", "s0", 2L) // shorter than a shingle
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical payloads and keeps the min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length === 4) // 1&3 collapse
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 64, bands = 16, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // jaccard 1.0 — must be caught
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L))) // near-dups
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("bucket cap drops a boilerplate family's pairs, keeps genuine near-dups") {
    // 30-doc boilerplate family (one shared blurb + a unique tail each):
    // every member lands in the same band buckets, so the family's pair
    // mass is quadratic — the hot-key shape the cap bounds. Docs 1001/1002
    // are an ordinary near-dup pair that must survive the cap.
    val blurb = "this software is provided as is without any express or " +
      "implied warranties of merchantability or fitness for a purpose"
    val family = (1L to 30L).map(i =>
      (i, s"$blurb unique tail token$i", "en", "s0", 120L))
    val corpus = (family ++ Seq(
      // the suite fixture's proven near-dup pair (string jaccard 0.75)
      (1001L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
      (1002L, "the quick brown fox jumps over the lazy dogs", "en", "s0", 44L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val capped = Dedup.minhashNearDups(corpus, "doc_id", "text",
        threshold = 0.7, maxBucket = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((1001L, 1002L)),
      "capped run must keep the genuine pair and emit no boilerplate pairs")
    // uncapped (default 4096 never fires here): the family pairs exist —
    // proving the cap, not banding recall, removed them above
    val uncapped = Dedup.minhashNearDups(corpus, "doc_id", "text",
        threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1001L, 1002L)))
    assert(uncapped.count(p => p._1 <= 30L && p._2 <= 30L) > 100,
      "the uncapped family must be pair-quadratic (the shape being capped)")
    // diagnostic twin names what was capped
    val over = Dedup.oversizedBuckets(
      Dedup.lshBands(
        Dedup.withMinhash(corpus, "text", 64)
          .filter(size(col("shingle_hashes")) > 0)
          .select(col("doc_id"), col("sig")),
        "doc_id", bands = 16, rowsPerBand = 4), maxBucket = 10)
    assert(over.count() > 0)
    assert(over.agg(max(col("occupancy"))).head.getLong(0) >= 20L)
  }

  test("containment catches a short doc quoted inside a longer one") {
    val quoted = Seq(
      (1L, "alpha beta gamma delta", "en", "s0", 22L), // fully inside doc 2
      (2L, "prefix words alpha beta gamma delta and a much longer tail here", "en", "s0", 63L),
      (3L, "completely unrelated text body with other words", "en", "s0", 47L),
      (4L, "alpha beta gamma delta", "en", "s1", 22L) // other block: never paired
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.containmentPairs(quoted, threshold = 0.9)
      .select("doc_a", "doc_b", "contained", "containment")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1L, 1.0)))
    // jaccard at the same threshold misses it: the length gap kills j
    val j = Dedup.ngramJaccardPairs(quoted, threshold = 0.5).count()
    assert(j === 0L)
  }

  test("CDC chunks survive a prefix insertion; fixed-width segments do not") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val shifted = "inserted prefix " + base // every token position moves by 2
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        explode(Dedup.cdcChunksUdf(4L)(
          graft.functions.TextFunctions.tokens(col("text")))).as("c"))
      .as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    // all of base's chunks except (at most) its first reappear verbatim
    val shared = a.intersect(b)
    assert(shared.size >= a.size - 1,
      s"CDC lost chunks under shift: ${a.size} -> ${shared.size}")
    // fixed-width segmenting at the same granularity shares nothing
    val fixedA = base.split(" ").grouped(4).map(_.mkString(" ")).toSet
    val fixedB = shifted.split(" ").grouped(4).map(_.mkString(" ")).toSet
    assert(fixedA.intersect(fixedB).isEmpty)
  }

  test("minhash signature is deterministic across runs") {
    val sig1 = Dedup.withMinhash(docs, "text", 16).select("sig").as[Seq[Long]].collect()
    val sig2 = Dedup.withMinhash(docs, "text", 16).select("sig").as[Seq[Long]].collect()
    assert(sig1.toSeq === sig2.toSeq)
  }

  test("simhash: identical docs collide, near-dups are close, others far") {
    val sims = docs.select($"doc_id",
        Dedup.simhashUdf(Dedup.wordShingleStrings($"text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) === sims(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // tiny fixture shingle sets make absolute distances noisy; the invariant
    // is the ordering: near-dup strictly closer than an unrelated doc
    assert(hamming(sims(1L), sims(2L)) < hamming(sims(1L), sims(4L)))
  }

  test("ngram jaccard pairs: same-block near-dups above threshold only") {
    val pairs = Dedup.ngramJaccardPairs(docs, 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // 1&3 are different sources; 4 dissimilar
  }

  test("duplicatedSpans: cross-doc and within-doc repeats merge into maximal spans") {
    val d = Seq(
      (10L, "a b c d e f g h"),   // shares "a b c d e" with doc 11
      (11L, "a b c d e x y z"),
      (12L, "p q r s p q r s"),   // within-doc repeat: spans [1,4] and [5,8]
      (13L, "unique words only nothing here repeats ever")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(d, "doc_id", "text", k = 3)
      .select("doc_id", "n_spans", "dup_tokens", "max_span")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    // docs 10/11: marked positions 1,2,3 merge to one span of 5 tokens;
    // doc 12: adjacent-but-disjoint spans stay separate; doc 13 absent
    assert(out === Array((10L, 1L, 5L, 5L), (11L, 1L, 5L, 5L),
      (12L, 2L, 8L, 4L)))
  }

  test("suffixDupSpans: measured LCP spans, cross- and within-doc, no false hits") {
    val shared = "0123456789abcdefghij" // 20 chars, >= minLen=16
    val d = Seq(
      (10L, s"AA${shared}BB"),          // shares 20 chars with doc 11
      (11L, s"XYZ${shared}QRS"),
      (12L, s"${shared}--${shared}"),   // within-doc repeat, disjoint spans
      (13L, "no repeats live here at all, every char run is fresh!")
    ).toDF("doc_id", "text")
    val out = Dedup.suffixDupSpans(d, "doc_id", "text",
        depth = 32, minLen = 16, bucketLen = 8)
      .select("doc_id", "n_spans", "dup_chars", "max_span")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    // Docs 10/11: exactly the 20 shared chars (positions 3..22 / 4..23) —
    // marked suffixes [start, start+lcp) telescope into one maximal span
    // of MEASURED length 20, not a fixed k. Doc 12: both copies found as
    // separate spans (disjoint, so they stay apart); the second copy's
    // span is also 20 long. Doc 13: absent (no >= 16-char repeat).
    assert(out === Array((10L, 1L, 20L, 20L), (11L, 1L, 20L, 20L),
      (12L, 2L, 40L, 20L)))
  }

  test("suffixDupSpans: bucket boundary cannot hide a qualifying pair") {
    // Two docs sharing exactly minLen chars whose first bucketLen chars
    // are identical by construction (the bucketing soundness argument:
    // LCP >= minLen implies same first-bucketLen bucket).
    val d = Seq(
      (1L, "prefix__SHAREDRUN1234567890suffixA"),
      (2L, "other___SHAREDRUN1234567890tailBBB")
    ).toDF("doc_id", "text")
    val out = Dedup.suffixDupSpans(d, "doc_id", "text",
        depth = 32, minLen = 16, bucketLen = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L))
  }

  test("minhashNearDupsAgainst: batch-vs-index pairs only, doc_a is batch-side") {
    // index = the standing corpus; batch = tonight's ingest. Ids disjoint
    // (the documented precondition). batch doc 101 near-dups index doc 1;
    // batch docs 102 and 103 near-dup EACH OTHER but nothing in the index —
    // batch-internal pairs are out of scope and must not appear.
    val index = docs.filter($"doc_id" <= 4L)
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog today"),
      (102L, "an entirely separate sentence about glaciers and moraines"),
      (103L, "an entirely separate sentence about glaciers and moraine")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupsAgainst(batch, index, "doc_id", "text",
        k = 64, bands = 16, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every pair is (batch id, index id) — the doc_a contract
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a >= 101L && b <= 4L })
    assert(pairs.contains((101L, 1L)) && pairs.contains((101L, 3L)))
    // batch-internal near-dup (102,103) and index-internal (1,3) excluded
    assert(!pairs.exists(p => p._1 == 102L || p._1 == 103L))
  }

  test("dedupCorpus removes exact and near dups, keeps min ids") {
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    // 3 is an exact dup of 1 (dropped); 2 is a near-dup of 1 (dropped);
    // 1, 4 survive; 5 (unshingleable) survives untouched
    assert(kept === Set(1L, 4L, 5L))
  }

  test("suffix dispatch routes augmented ids, plain ids to root") {
    assert(graft.Pipeline.subdirFor("p001-shift-0-1") === "shift_image")
    // pass 5 and pass 7 directory names per generate_images_from_dicom.py's
    // writers and images_to_tfrecord.py:195-200's dispatch
    assert(graft.Pipeline.subdirFor("p001-scale-shift-bbox-2-5")
      === "scale_shift_bbox")
    assert(graft.Pipeline.subdirFor("p001-scale-scale-shift-bbox-4-7")
      === "scale_image_scale_shift_bbox")
    assert(graft.Pipeline.subdirFor("p007") === ".") // reference bug fixed
  }

  test("simhash pairs carry exact jaccard and sit inside the minhash dup set") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sim = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 6)
      .collect()
    val brute = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty)
    sim.foreach { r =>
      // the verification column: word-shingle jaccard, dup-level similarity
      assert(r.getAs[Double]("jaccard") >= 0.8)
      assert(brute.contains((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
    }
  }

  test("contamination: copies of benchmark text flagged, originals excluded") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),       // benchmark member
      (2L, "a b c d e f g h i j k"),     // contaminated: contains bench 8-grams
      (3L, "z y x w v u t s r q"),       // clean
      (4L, "one two three")              // too short for any 8-gram
    ).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 1L)
    val hits = Dedup.contamination(corpus, bench, "doc_id", "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet === Set(2L)) // bench member itself excluded, clean docs absent
    // doc 2 shares all 3 of doc 1's 8-grams (positions 0,1,2 of an 11-token doc
    // overlap the 10-token benchmark doc's grams at positions 0,1,2)
    assert(hits(2L) === 3L)
  }

  test("minhash estimate tracks exact jaccard on harness near-dups") {
    val real = graft.Tables.documents(spark, sfDir)
    val found = Dedup.minhashNearDups(real, "doc_id", "text",
        k = 64, bands = 16, threshold = 0.8)
      .select("jaccard").as[Double].collect()
    assert(found.forall(_ >= 0.8))
  }

  test("dupClusters: transitive chains collapse to one component") {
    // edges 1-2, 2-3 (chain) and 7-8 (island): components {1,2,3} and {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  test("dupClustersStar (large-star/small-star) agrees with min-label propagation") {
    val chains = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    assert(Dedup.dupClustersStar(chains).as[(Long, Long, Long)].collect().toSet
      === Dedup.dupClusters(chains).as[(Long, Long, Long)].collect().toSet)
    // seeded random graphs: same components, whatever the topology
    val rng = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      val pairs = Seq.fill(40)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
        .filter(p => p._1 != p._2)
      val df = pairs.toDF("doc_a", "doc_b")
      assert(Dedup.dupClustersStar(df).as[(Long, Long, Long)].collect().toSet
        === Dedup.dupClusters(df).as[(Long, Long, Long)].collect().toSet)
    }
  }

  test("dupClusters runs exactly one Spark action per propagation round") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val actions = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = actions.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = actions.add(funcName)
    }
    spark.listenerManager.register(listener)
    try {
      // chain 1-2-3-4-5: min label walks one hop per round → 4 changing
      // rounds + 1 confirming round = 5 propagation actions
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
        .toDF("doc_a", "doc_b")
      Dedup.dupClusters(pairs) // loop runs inside; result plan stays lazy
      // listener events dispatch async (the bus is private[spark]) — poll
      // until the stream goes quiet
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (actions.size() != last && System.nanoTime() < deadline) {
        last = actions.size()
        Thread.sleep(500)
      }
      val during = actions.toArray(Array.empty[String]).toSeq
      // no join-and-count convergence job: the only actions are the two
      // setup localCheckpoints + one localCheckpoint per round
      assert(!during.contains("count"),
        s"convergence must not run a second count action per round: $during")
      assert(during.count(_ == "localCheckpoint") === 2 + 5,
        s"expected 2 setup + 5 round checkpoints, got: $during")
    } finally spark.listenerManager.unregister(listener)
  }

  test("softDedupWeights: 1/cluster_size inside clusters, 1.0 outside, " +
      "every doc present") {
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val w = Dedup.softDedupWeights(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(w.length === n) // every corpus doc weighted
    val clusters = Dedup.dupClusters(
        Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(clusters.nonEmpty) // scenario non-vacuous on the harness corpus
    w.foreach { case (id, size, weight) =>
      val expectedSize = clusters.getOrElse(id, 1L)
      assert(size === expectedSize)
      assert(weight === BigDecimal(1.0 / expectedSize)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("dupClustersStar needs O(log) rounds on a chain where min-label " +
      "needs O(n) — the algorithmic reason the variant exists") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    def checkpointActions(body: => Unit): Int = {
      val actions = new java.util.concurrent.atomic.AtomicInteger
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          if (funcName == "localCheckpoint") actions.incrementAndGet()
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        body
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var last = -1
        while (actions.get() != last && System.nanoTime() < deadline) {
          last = actions.get()
          Thread.sleep(500)
        }
        actions.get()
      } finally spark.listenerManager.unregister(listener)
    }
    // path graph 0-1-2-...-40: component minimum is 40 hops from the far end
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val starActions = checkpointActions {
      assert(Dedup.dupClustersStar(chain).as[(Long, Long, Long)]
        .collect().toSet === (0L to 40L).map(i => (i, 0L, 41L)).toSet)
    }
    val labelActions = checkpointActions {
      assert(Dedup.dupClusters(chain).as[(Long, Long, Long)]
        .collect().toSet === (0L to 40L).map(i => (i, 0L, 41L)).toSet)
    }
    // min-label walks one hop per round (~40 rounds = ~40+ checkpoints);
    // star contracts the chain in O(log^2 n) (observed ~6). Assert the
    // asymmetry with slack, not exact counts.
    assert(starActions <= 15,
      s"star should contract a 41-node chain in few rounds, took $starActions checkpoints")
    assert(labelActions >= 2 * starActions,
      s"expected min-label ($labelActions) >> star ($starActions) on a deep chain")
  }

  test("dupClustersStar runs exactly one Spark action per star round") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val actions = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = actions.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = actions.add(funcName)
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
        .toDF("doc_a", "doc_b")
      Dedup.dupClustersStar(pairs) // loop runs inside; result plan stays lazy
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (actions.size() != last && System.nanoTime() < deadline) {
        last = actions.size()
        Thread.sleep(500)
      }
      val during = actions.toArray(Array.empty[String]).toSeq
      // convergence rides the checkpoint job's accumulators: the fixpoint
      // probes (left_anti + limit(1).count() per direction per round) are
      // gone — EVERY action in the loop is a round's localCheckpoint
      assert(!during.contains("count"),
        s"star convergence must not run probe count actions: $during")
      assert(during.nonEmpty && during.forall(_ == "localCheckpoint"),
        s"expected only localCheckpoint actions (1 setup + 1 per round), got: $during")
    } finally spark.listenerManager.unregister(listener)
  }

  test("min-wise independence: appended-token twins always surface " +
      "(the affine-family order-correlation regression)") {
    import spark.implicits._
    // The pre-fix affine (a·x+b) mod P family was near-monotone in x
    // (a < 2^29, x 32-bit ⇒ at most one wrap), so every slot shared the
    // same element order and ONE small-hash twin-only shingle could
    // hijack the argmin of all 64 slots: planted pairs at j ≈ 0.90 had
    // 0/16 band collisions. Post-fix (mix64 slot hash) each slot's
    // agreement is ~Bernoulli(j), so ALL appended-token twins at
    // j ≥ 0.85 must be found — across 40 docs this covers a spread of
    // boundary-shingle hash values including the hijacking class.
    val base = (0 until 40).map { i =>
      val toks = (0 until 40).map(t => s"w${(i * 7 + t * 3) % 97}x$t")
      (i.toLong, toks.mkString(" "))
    }
    val twins = base.map { case (id, text) =>
      (id + 1000L, text + " zz9 zz8 zz7")
    }
    val corpus = (base ++ twins).toDF("doc_id", "text")
    val found = Dedup.minhashNearDups(corpus, "doc_id", "text",
        k = 64, bands = 16, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val missing = base.map(_._1).filterNot(id => found.contains((id, id + 1000L)))
    assert(missing.isEmpty,
      s"planted twins missed by banding (min-wise independence broken): $missing")
  }

  // ---- round-13 shared-stage decomposition (SharedStages / judge ask #3):
  // the memoized candidate stage must be EXACTLY equivalent to the direct
  // operators it replaces inside x22/x167/x270 ----

  test("minhashNearDupsWithBase == minhashNearDups over the union") {
    val base = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val off = base.agg(max($"doc_id")).as[Long].head() + 1L
    val extra = base.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + off).as("doc_id"),
        concat($"text", lit(" zz9 zz8 zz7")).as("text"))
    val union = base.unionByName(extra)
    val direct = Dedup.minhashNearDups(union, "doc_id", "text",
        k = 64, bands = 16, threshold = 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val viaBase = Dedup.minhashNearDupsWithBase(extra, base,
        SharedStages.docBands(spark, sfDir),
        SharedStages.docNearDupPairs(spark, sfDir),
        "doc_id", "text", k = 64, bands = 16, threshold = 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(direct.nonEmpty, "fixture produced no pairs — vacuous")
    assert(viaBase === direct)
  }

  test("SharedStages: memo builds once, reset forces a rebuild, content stable") {
    import org.apache.spark.sql.functions.lit
    var builds = 0
    val key = s"resetSpec|${System.nanoTime()}"
    def build = { builds += 1; spark.range(5).withColumn("tag", lit("v")) }
    val first = SharedStages.materialized(spark, key)(build).collect().toSet
    SharedStages.materialized(spark, key)(build)
    assert(builds === 1, "second consumer must hit the memo, not rebuild")
    SharedStages.reset()
    val rebuilt = SharedStages.materialized(spark, key)(build).collect().toSet
    assert(builds === 2,
      "reset must force the next consumer to rebuild (the bench's " +
        "x0_shared_stage_build contract)")
    assert(rebuilt === first)
  }

  test("SharedStages: dependent memo builds do not deadlock or crash (nested keys)") {
    // regression for the round-13 ADVICE recursive-update crash: a build
    // that itself calls materialized() on ANOTHER key must complete even
    // when both keys land in the same hash bin — exercised here by many
    // nested registrations (old computeIfAbsent crashed 1-in-16 per pair)
    import org.apache.spark.sql.functions.lit
    (0 until 24).foreach { i =>
      val inner = s"nestSpec|inner$i|${System.nanoTime()}"
      val outer = s"nestSpec|outer$i|${System.nanoTime()}"
      val out = SharedStages.materialized(spark, outer) {
        SharedStages.materialized(spark, inner)(
          spark.range(3).withColumn("tag", lit(i)))
      }
      assert(out.count() === 3L)
    }
  }

  test("SharedStages.cleanDeduped == dedupCorpus over the quality-filtered corpus") {
    val clean = graft.Tables.documents(spark, sfDir)
      .filter(graft.functions.TextFunctions.qualityScore($"text",
        Seq("a", "the")) >= 0.9999)
    val direct = Dedup.dedupCorpus(clean, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    val shared = SharedStages.cleanDeduped(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(direct.nonEmpty, "fixture kept no docs — vacuous")
    assert(shared === direct)
  }
}
