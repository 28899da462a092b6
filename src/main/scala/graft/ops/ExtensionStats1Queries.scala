package graft.ops

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions
import graft.ops.ExtensionQueries._

/** Statistics/experimentation/data-management family: hypothesis tests,
  * survival/forecast/attribution, quality-of-data audits, and sinks.
  *
  * Split out of ExtensionQueries (round 14: the single file had grown to
  * 21k lines); the shared helpers (context/pair builders, oracle CTEs,
  * sink-cleanup hooks) stay in [[ExtensionQueries]] and are imported
  * wholesale. Registered via ExtensionQueries.all — same names, same
  * specs, zero behavior change.
  */
object ExtensionStats1Queries {

  def all: Seq[QuerySpec] = Seq(
  // ------------------------------------------ training-data pipeline ops
    // Sequence packing with first-fit-decreasing inside salted (lang, salt)
    // cells — the production non-splitting packing shape (round 2 shipped
    // greedy concat-and-chunk; FFD packs ≥ first-fit: 119 vs 120 bins on
    // this corpus). See [[Packing.packFFD]] for the 100 TB salting argument.
    QuerySpec(
      "x19_sequence_packing",
      (s, dir) => Packing.packFFD(Tables.documents(s, dir),
          budget = 256L, nSalts = 4)
        .orderBy("lang", "salt", "doc_id"),
      // The oracle replays FFD per (lang, salt) group with a recursive CTE:
      // one state row per group carrying (bin loads, assignments); each
      // iteration places the next doc of the (n desc, doc_id) order into
      // the first bin with room ([j ... if bins[j]+n <= 256][1]).
      Some("""WITH RECURSIVE
             |t AS (SELECT lang, doc_id % 4 AS salt, doc_id,
             |        CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                             x -> x <> '')) AS BIGINT) AS n
             |      FROM documents),
             |g AS (SELECT lang, salt,
             |        list(struct_pack(doc_id := doc_id, n := n)
             |             ORDER BY n DESC, doc_id) AS docs
             |      FROM t GROUP BY 1, 2),
             |ffd AS (
             |  SELECT lang, salt, docs, 0 AS i,
             |         CAST([] AS BIGINT[]) AS bins,
             |         CAST([] AS STRUCT(doc_id BIGINT, n BIGINT, bin_id BIGINT)[]) AS asg
             |  FROM g
             |  UNION ALL
             |  SELECT lang, salt, docs, i + 1,
             |    CASE WHEN fit IS NULL THEN list_append(bins, d.n)
             |         ELSE bins[1:fit-1] || [bins[fit] + d.n] || bins[fit+1:] END,
             |    list_append(asg, struct_pack(doc_id := d.doc_id, n := d.n,
             |      bin_id := CAST(COALESCE(fit, len(bins)+1) - 1 AS BIGINT)))
             |  FROM (
             |    SELECT *, docs[i+1] AS d,
             |      [j for j in range(1, len(bins)+1) if bins[j] + docs[i+1].n <= 256][1] AS fit
             |    FROM ffd WHERE i < len(docs)
             |  )
             |)
             |SELECT lang, salt, u.a.doc_id AS doc_id, u.a.n AS n_tokens, u.a.bin_id AS bin_id
             |FROM (SELECT lang, salt, asg FROM ffd WHERE i = len(docs)) f,
             |     unnest(f.asg) AS u(a)
             |ORDER BY lang, salt, doc_id""".stripMargin)),
    // Deterministic content-hash sampling (data mixing): keep ~30% of each
    // stratum by the polynomial text fingerprint mod 10 — id-independent,
    // reproducible, and replayable by the oracle (same fingerprint as x10).
    QuerySpec(
      "x24_stratified_sample",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            TextFunctions.fingerprint(col("text")).as("fp"))
          .filter(pmod(col("fp"), lit(10)) < 3)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (
             |  SELECT doc_id, lang,
             |    list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |                   [CAST(ord(c) AS BIGINT) for c in string_split(text, '')]),
             |      (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
             |  FROM documents)
             |SELECT doc_id, lang FROM fp WHERE fp % 10 < 3
             |ORDER BY doc_id""".stripMargin)),
    // ---------------------------------------------------------- multimodal
    // REAL image decode end-to-end: deterministic grayscale gradients are
    // PNG-encoded by the stage-1 encoder, decoded back by the ImageIO
    // kernel, and the decoded statistics must equal the closed-form pixel
    // math the oracle computes — a true encode→compress→decode round trip.
    QuerySpec(
      "x18_png_decode",
      (s, dir) => {
        val ids = Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        val media = Multimodal.pngMediaFromIds(s, ids)
        Multimodal.featurize(s, media).toDF()
          .select(col("media_id"), col("width"), col("height"),
            round(col("mean_byte"), 4).as("mean_px"),
            element_at(col("histogram"), 1).as("hist_lo"),
            element_at(col("histogram"), 16).as("hist_hi"))
          .orderBy("media_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id, doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h
             |  FROM documents),
             |px AS (
             |  SELECT media_id, w, h, [(media_id + i) % 256 for i in range(0, w*h)] AS ps
             |  FROM m)
             |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |  round(CAST(list_sum(ps) AS DOUBLE) / (w*h), 4) AS mean_px,
             |  CAST(len(list_filter(ps, p -> p < 16)) AS BIGINT) AS hist_lo,
             |  CAST(len(list_filter(ps, p -> p >= 240)) AS BIGINT) AS hist_hi
             |FROM px ORDER BY media_id""".stripMargin)),
    QuerySpec(
      "x11_multimodal_meta",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
        Multimodal.featurize(s, media).toDF()
          .select(col("media_id"), col("n_bytes"), col("sha256"),
            col("width").cast("int").as("width"), col("height").cast("int").as("height"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  sha256(text) AS sha256,
             |  CAST(doc_id % 64 + 1 AS INTEGER) AS width,
             |  CAST(doc_id % 48 + 1 AS INTEGER) AS height
             |FROM documents ORDER BY media_id""".stripMargin)),
    // Source-mixture sampling: rebalance the corpus toward target per-source
    // weights (here derived from the source id: w = N%5+1) with DETERMINISTIC
    // content-hash acceptance — rerunnable, join-free reproducibility, the
    // standard way a 100 TB pipeline hits a data mixture without a shuffle:
    // per-source thresholds are a tiny broadcast dim, acceptance is row-local
    // integer math on the rolling-hash fingerprint.
    QuerySpec(
      "x36_mixture_sample",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        val docs = Tables.documents(s, dir)
        val ratios = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
          .withColumn("w",
            (expr("CAST(substring(source, 4) AS INT) % 5") + 1).cast("long"))
          .withColumn("ratio", expr("w * 1000000 div cnt"))
        val maxr = ratios.agg(max(col("ratio")).as("maxr"))
        val rates = ratios.crossJoin(broadcast(maxr))
          .select(col("source"), expr("ratio * 10000 div maxr").as("thr"))
        docs.select(col("doc_id"), col("source"),
            TextFunctions.fingerprint(col("text")).as("fp"))
          .join(broadcast(rates), "source") // #sources rows — genuinely tiny
          .where(pmod(col("fp"), lit(10000)) < col("thr"))
          .select(col("doc_id"), col("source"), col("thr"))
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (
             |  SELECT doc_id, source,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |                [CAST(ord(c) AS BIGINT) for c in string_split(text, '')]),
             |      (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
             |  FROM documents),
             |c AS (SELECT source, COUNT(*) AS cnt,
             |        CAST(CAST(substr(source, 4) AS INT) % 5 + 1 AS BIGINT) AS w
             |      FROM documents GROUP BY 1),
             |r0 AS (SELECT source, w * 1000000 // cnt AS ratio FROM c),
             |m AS (SELECT MAX(ratio) AS maxr FROM r0),
             |r AS (SELECT source, CAST(ratio * 10000 // maxr AS BIGINT) AS thr FROM r0, m)
             |SELECT f.doc_id, f.source, r.thr
             |FROM fp f JOIN r USING (source)
             |WHERE f.fp % 10000 < r.thr
             |ORDER BY f.doc_id""".stripMargin)),
    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling", public): hashed n-gram
    // features (unigrams + bigrams, poly31 % 64 buckets), per-bucket
    // add-one log-ratio of target (source='src0') vs raw distributions,
    // per-doc log importance weight = sum of its feature counts times the
    // bucket log-ratios. The bucket table is m=64 rows BY CONSTRUCTION —
    // a constant, not data-sized — so joining it broadcast-style is safe
    // at any corpus size (AQE does it from stats; no hint needed). The
    // log-ratio terms are rounded to 6 decimals and summed as
    // DECIMAL(18,6) for an order-independent, hash-stable per-doc sum.
    QuerySpec(
      "x41_dsir_weights",
      (s, dir) => dsirDocWeights(s, dir)
        .select(col("doc_id"), col("n_grams"), col("logw"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, source,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |g AS (SELECT doc_id, source,
             |  toks || [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS grams FROM t),
             |f0 AS (SELECT doc_id, source, unnest(grams) AS gram FROM g),
             |f AS (SELECT doc_id, source,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      [CAST(ord(c) AS BIGINT) for c in string_split(gram, '')]),
             |    (acc, x) -> (acc*31 + x) % 2147483647) % 64 AS bucket
             |  FROM f0),
             |df AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM f GROUP BY 1, 2),
             |side AS (SELECT bucket,
             |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
             |    SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cr
             |  FROM f GROUP BY 1),
             |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr FROM side),
             |lam AS (SELECT bucket,
             |    CAST(round(ln((ct + 1.0)/(nt + 64)) - ln((cr + 1.0)/(nr + 64)), 6) AS DECIMAL(18,6)) AS lr
             |  FROM side CROSS JOIN tot)
             |SELECT df.doc_id, CAST(SUM(df.cnt) AS BIGINT) AS n_grams,
             |  round(CAST(SUM(df.cnt * lam.lr) AS DOUBLE), 4) AS logw
             |FROM df JOIN lam USING (bucket)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // Canonical-representative selection per duplicate cluster: the
    // production dedup stage keeps the BEST document of each near-dup
    // cluster (highest quality score, id tiebreak), not an arbitrary one.
    // Composes x31's clusters with x7's quality signal; the keep flag is a
    // rank-1 test inside a cluster-keyed window (Partial+Final
    // WindowGroupLimit-adjacent shape — the window shuffle is on
    // cluster_id, and only clustered docs enter it, never the corpus).
    QuerySpec(
      "x43_cluster_canonical",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // pair stage from the SharedStages memo (round-13)
        val pairs = SharedStages.docNearDupPairs(s, dir)
        val clusters = Dedup.dupClusters(pairs)
        val quality = docs.select(col("doc_id"),
          TextFunctions.qualityScore(col("text"), STOPWORDS).as("quality"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))
          .orderBy(col("quality").desc, col("doc_id"))
        clusters.join(quality, "doc_id")
          .withColumn("keep",
            when(row_number().over(w) === 1, 1L).otherwise(0L))
          .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
            col("quality"), col("keep"))
          .orderBy("doc_id")
      },
      Some(dupGraphCtes + ",\n" +
        """m AS (SELECT t.doc_id,
          |    CAST(len(toks) AS BIGINT) AS n_tokens,
          |    round(CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks), 4) AS avg_token_len,
          |    round(CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio
          |  FROM t),
          |q AS (SELECT doc_id,
          |  round(((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
          |       + (CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
          |       + (CASE WHEN stopword_ratio > 0.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
          |  FROM m)
          |SELECT lab.doc_id, lab.cluster_id, siz.cluster_size, q.quality,
          |  CAST(CASE WHEN row_number() OVER (PARTITION BY lab.cluster_id
          |       ORDER BY q.quality DESC, lab.doc_id) = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
          |FROM lab JOIN siz USING (cluster_id) JOIN q USING (doc_id)
          |ORDER BY doc_id""".stripMargin)),
    // Hand-built HyperLogLog (m=64 registers) over word trigrams, per
    // language — the mergeable-sketch shape that makes distinct-counting
    // at 100 TB a map-side byte-array fold instead of a distinct shuffle
    // (q45 exercises the built-in HLL++; this one exposes the registers).
    // The estimate leaves the aggregate as two INTEGER summaries (sum of
    // 2^(26-reg), zero-register count) so both engines perform one
    // identical double division; exact_distinct rides along as ground
    // truth (est within ~13% RSE at m=64 — -6.7%..+8.3% on this corpus).
    QuerySpec(
      "x46_hll_distinct",
      (s, dir) => {
        import graft.functions.{HllAggregator, HllSketch}
        val agg = new HllAggregator(64)
        val hllUdaf = udaf(agg)
        val poly31Udf = udf { w: String => Dedup.poly31(w) }
        val statsUdf = udf { regs: Array[Byte] =>
          HllSketch.summarize(regs, agg.maxRank)
        }
        val grams = Tables.documents(s, dir)
          .select(col("lang"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("lang"), explode(expr(
            "transform(sequence(1, greatest(size(toks) - 2, 0))," +
              " i -> concat_ws(' ', slice(toks, i, 3)))")).as("w"))
        val sketch = grams
          .select(col("lang"), poly31Udf(col("w")).as("h"))
          .groupBy("lang").agg(hllUdaf(col("h")).as("regs"))
          .select(col("lang"), statsUdf(col("regs")).as("st"))
          .select(col("lang"), col("st._1").as("sum_pow"),
            col("st._2").as("n_zero_regs"))
        val exact = grams.groupBy("lang")
          .agg(count(lit(1)).as("n_grams"),
            countDistinct(col("w")).as("exact_distinct"))
        val raw = lit(HllSketch.Alpha64) * 64 * 64 * 67108864.0 / col("sum_pow")
        sketch.join(exact, "lang")
          .select(col("lang"), col("n_grams"), col("exact_distinct"),
            col("sum_pow"), col("n_zero_regs"),
            round(when(raw <= 2.5 * 64 && col("n_zero_regs") > 0,
                lit(64.0) * log(lit(64.0) / col("n_zero_regs")))
              .otherwise(raw), 4).as("est_distinct"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
             |  SELECT lang, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT lang, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                       for i in range(1, len(toks) - 1)]) AS w
             |  FROM t),
             |h AS (
             |  SELECT lang, w, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      [CAST(ord(c) AS BIGINT) for c in string_split(w, '')]),
             |    (acc, x) -> (acc*31 + x) % 2147483647) AS h
             |  FROM g),
             |r AS (SELECT lang, h % 64 AS j,
             |        CASE WHEN h // 64 = 0 THEN 26
             |             ELSE 26 - length(printf('%b', h // 64)) END AS rnk
             |      FROM h),
             |reg AS (SELECT lang, j, MAX(rnk) AS reg FROM r GROUP BY 1, 2),
             |s AS (SELECT lang,
             |        CAST(SUM(CAST(1 AS BIGINT) << (26 - reg))
             |             + (64 - COUNT(*)) * 67108864 AS BIGINT) AS sum_pow,
             |        CAST(64 - COUNT(*) AS BIGINT) AS n_zero_regs
             |      FROM reg GROUP BY 1),
             |e AS (SELECT lang, sum_pow, n_zero_regs,
             |        CAST(0.709 AS DOUBLE) * 64 * 64 * 67108864 / sum_pow AS raw
             |      FROM s),
             |ex AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_grams,
             |         CAST(COUNT(DISTINCT w) AS BIGINT) AS exact_distinct
             |       FROM g GROUP BY 1)
             |SELECT lang, n_grams, exact_distinct, sum_pow, n_zero_regs,
             |  round(CASE WHEN raw <= 2.5 * 64 AND n_zero_regs > 0
             |             THEN 64 * ln(64.0 / n_zero_regs) ELSE raw END, 4) AS est_distinct
             |FROM e JOIN ex USING (lang) ORDER BY lang""".stripMargin)),
    // Deterministic stratified sample: EXACTLY n docs per language, chosen
    // by content-hash order (md5, doc_id tiebreak) — reproducible across
    // runs/engines with no RNG state, unlike sampleBy's Bernoulli draw
    // which only hits n in expectation (x24 is the threshold variant; this
    // is the exact-quota one). Plans as Partial+Final WindowGroupLimit: a
    // bounded k-heap per stratum BEFORE the shuffle, so the full corpus
    // never sorts — the per-stratum quota shape for building eval sets
    // from a 100 TB corpus.
    QuerySpec(
      "x49_stratified_sample",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(md5(col("text")), col("doc_id"))
        Tables.documents(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 20)
          .select(col("doc_id"), col("lang"), col("rn"))
          .orderBy("lang", "rn")
      },
      Some("""SELECT doc_id, lang,
             |  CAST(row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS BIGINT) AS rn
             |FROM documents QUALIFY rn <= 20 ORDER BY lang, rn""".stripMargin)),
    // Count-Min heavy hitters: the mergeable frequency sketch
    // (functions.CmsAggregator — depth 3 × width 64, deliberately narrow so
    // the collision/over-estimate path is exercised on this corpus;
    // production widths are 2^16+) built map-side in ONE pass over raw
    // token occurrences, vs the exact top-20 as ground truth. est >= cnt
    // always; both sides replay the identical integer cell arithmetic.
    QuerySpec(
      "x53_cms_heavy_hitters",
      (s, dir) => {
        import graft.functions.{CmsAggregator, CmsSketch}
        val agg = new CmsAggregator(3, 64)
        val cms = udaf(agg)
        val poly31Udf = udf { w: String => Dedup.poly31(w) }
        val hashed = Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
          .select(col("tok"), poly31Udf(col("tok")).as("h"))
        val sketch = hashed.agg(cms(col("h")).as("cells"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))
        val top = hashed.groupBy("tok", "h").agg(count(lit(1)).as("cnt"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 20)
        val estUdf = udf { (cells: Seq[Long], h: Long) =>
          CmsSketch.estimate(cells.toArray, h, 3, 64)
        }
        top.crossJoin(broadcast(sketch))
          .select(col("rank"), col("tok"), col("cnt"),
            estUdf(col("cells"), col("h")).as("est"))
          .orderBy("rank")
      },
      Some("""WITH t AS (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS tok FROM documents),
             |h AS (SELECT tok, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        [CAST(ord(c) AS BIGINT) for c in string_split(tok, '')]),
             |        (acc, x) -> (acc*31 + x) % 2147483647) AS h FROM t),
             |cnts AS (SELECT tok, any_value(h) AS h, CAST(COUNT(*) AS BIGINT) AS cnt FROM h GROUP BY tok),
             |rr AS (SELECT unnest([0, 1, 2]) AS r),
             |cells AS (
             |  SELECT rr.r, ((cnts.h * [31,37,41][rr.r+1] + [7,11,13][rr.r+1]) % 2147483647) % 64 AS pos,
             |         SUM(cnts.cnt) AS cell
             |  FROM cnts CROSS JOIN rr GROUP BY 1, 2),
             |top AS (SELECT tok, h, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank
             |        FROM cnts QUALIFY rank <= 20)
             |SELECT top.rank, top.tok, top.cnt, CAST(MIN(cells.cell) AS BIGINT) AS est
             |FROM top CROSS JOIN rr
             |JOIN cells ON cells.r = rr.r
             |  AND cells.pos = ((top.h * [31,37,41][rr.r+1] + [7,11,13][rr.r+1]) % 2147483647) % 64
             |GROUP BY 1, 2, 3 ORDER BY rank""".stripMargin)),
    // Curriculum ordering: 5 difficulty buckets round-robin interleaved by
    // in-bucket content-hash rank — every training window sees the full
    // difficulty mix, deterministically. NO corpus-wide window anywhere
    // (the round-6 version's global ntile + global row_number funneled the
    // whole corpus through one WindowExec task):
    //   bucket   — discrete quintile thresholds off the n_chars HISTOGRAM
    //              (x73's device): the only window runs over |distinct
    //              lengths| rows, docs get buckets via a broadcast join;
    //              value ties snap to one bucket, so sizes are ~n/5, not
    //              exactly n/5 — the honest price of a shuffle-free bucket.
    //   rn       — two-phase distributed rank: rank within (bucket, salt)
    //              where salt = md5 prefix (order-compatible with the full
    //              md5 sort key), then add per-salt-group offsets from a
    //              ≤5×256-row count table. Each WindowExec partition holds
    //              ~corpus/1280 rows at any scale.
    //   position — computed ANALYTICALLY from (rn, bucket) + the 5-row
    //              bucket-count table via broadcast HOFs: rank of (rn, b)
    //              under (rn, bucket) order = Σ_b' min(rn−1, n_b') +
    //              #{b' < b : n_b' ≥ rn} + 1. No final window at all; the
    //              trailing orderBy is a range-partitioned SORT (safe).
    QuerySpec(
      "x55_curriculum_order",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val wAll = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        // Every un-cached reuse of a subtree re-reads the corpus, so the
        // DAG is shaped to touch `docs` exactly twice (window branch +
        // count branch), each pulling ONE broadcast built from one tiny
        // histogram: bucket thresholds fold into the n_chars→bucket map,
        // and the rank offsets and bucket-count array ride ONE (bucket,
        // salt)-keyed broadcast (a naive composition of the same algebra
        // measured 3x slower from repeated scans).
        val bucketOf = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c"))
            .over(Window.orderBy("n_chars")
              .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
          .withColumn("n", sum(col("c")).over(wAll).cast("long"))
          .select(col("n_chars"), expr("1L + ((cum - 1L) * 5L) div n").as("bucket"))
        val bucketed = docs
          .join(broadcast(bucketOf), Seq("n_chars"))
          .withColumn("h", md5(col("text")))
          .withColumn("salt", substring(col("h"), 1, 2))
        val wLocal = Window.partitionBy("bucket", "salt")
          .orderBy(col("h"), col("doc_id"))
        val local = bucketed.withColumn("rl", row_number().over(wLocal).cast("long"))
        val offs = bucketed.groupBy("bucket", "salt").agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt"))
            .over(Window.partitionBy("bucket").orderBy("salt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("bn", sum(col("cnt"))
            .over(Window.partitionBy("bucket")
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("bcs", collect_set(struct(col("bucket"), col("bn"))).over(wAll))
          .select(col("bucket"), col("salt"), col("off"), col("bcs"))
        local
          .join(broadcast(offs), Seq("bucket", "salt"))
          .withColumn("rn", col("off") + col("rl"))
          .withColumn("position",
            lit(1L) + expr("aggregate(bcs, 0L, (acc, x) -> acc + least(rn - 1L, x.bn))") +
              expr("size(filter(bcs, x -> x.bucket < bucket AND x.bn >= rn))").cast("long"))
          .select(col("position"), col("doc_id"), col("bucket"), col("rn"))
          .orderBy("position")
      },
      Some("""WITH hist AS (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1),
             |cum AS (SELECT n_chars, CAST(SUM(c) OVER (ORDER BY n_chars) AS BIGINT) AS cum FROM hist),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
             |b AS (SELECT d.doc_id, d.text,
             |        CAST(1 + ((cum.cum - 1) * 5) // tot.n AS BIGINT) AS bucket
             |      FROM documents d JOIN cum ON d.n_chars = cum.n_chars CROSS JOIN tot),
             |r AS (SELECT doc_id, bucket,
             |  CAST(row_number() OVER (PARTITION BY bucket ORDER BY md5(text), doc_id) AS BIGINT) AS rn FROM b)
             |SELECT CAST(row_number() OVER (ORDER BY rn, bucket) AS BIGINT) AS position,
             |  doc_id, bucket, rn
             |FROM r ORDER BY position""".stripMargin)),
    // ORC round-trip (SURVEY §2.1 source/sink family): documents written
    // columnar-ORC and read back through Spark's native vectorized ORC
    // reader, then aggregated — the second big-data columnar format beside
    // parquet. The oracle states the same aggregate over the parquet
    // originals, so the round-trip must preserve every value and type.
    QuerySpec(
      "x56_orc_roundtrip",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_orc_docs").toString
        deleteOnExit(tmp)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),
    // Per-source KL divergence of the token distribution vs the corpus —
    // the mixture-monitoring diagnostic (which sources are distributional
    // outliers before weighting them). Two token shuffles (corpus counts,
    // per-source counts); per-term log-ratios go through the x40
    // DECIMAL(18,6) device so the weighted sum is partition-order-proof;
    // the corpus-total is a 1-row broadcast.
    QuerySpec(
      "x59_source_kl",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("w"))
        val cw = tok.groupBy("w").agg(count(lit(1)).as("cw"))
        val nn = tok.agg(count(lit(1)).as("n"))
        val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("csw"))
        val ns = sw.groupBy("source").agg(sum("csw").as("ns"))
        sw.join(cw, "w").join(ns, "source").crossJoin(broadcast(nn))
          .withColumn("lr",
            round(log(col("csw").cast("double") * col("n") / (col("ns") * col("cw"))), 6)
              .cast("decimal(18,6)"))
          .groupBy("source")
          .agg(first(col("ns")).as("n_tokens"),
            round(sum(col("csw") * col("lr")).cast("double") / first(col("ns")), 4)
              .as("kl"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source,
             |  unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS w FROM documents),
             |cw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM t GROUP BY 1),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
             |sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS csw FROM t GROUP BY 1, 2),
             |ns AS (SELECT source, CAST(SUM(csw) AS BIGINT) AS ns FROM sw GROUP BY 1),
             |terms AS (
             |  SELECT sw.source, sw.csw,
             |    CAST(round(ln(CAST(sw.csw AS DOUBLE) * nn.n / (ns.ns * cw.cw)), 6) AS DECIMAL(18,6)) AS lr
             |  FROM sw JOIN cw USING (w) JOIN ns USING (source) CROSS JOIN nn)
             |SELECT source, any_value(ns.ns) AS n_tokens,
             |  round(CAST(SUM(csw * lr) AS DOUBLE) / any_value(ns.ns), 4) AS kl
             |FROM terms JOIN ns USING (source)
             |GROUP BY source ORDER BY source""".stripMargin)),
    // Spark 4 VariantType ingestion: semi-structured props parsed ONCE into
    // the binary variant encoding, then field access via typed variant_get
    // — the shredded-JSON path that replaces per-access string re-parsing
    // (q17's get_json_object re-tokenizes the string per call; variant
    // parses per ROW and reads fields at binary offsets — the difference
    // that matters when a 100 TB log table carries a wide JSON column).
    QuerySpec(
      "x64_variant_json",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS INT) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    // Weighted sampling without replacement (Efraimidis–Spirakis 2006,
    // public): key = ln(u)/w with u a content-hash-derived uniform — one
    // pass, no RNG state, fully distributed (the exponential-key trick is
    // THE way to draw a quality- or length-weighted sample from a corpus
    // too big to sort by coin flips). Top-100 by key is a bounded top-k
    // (Partial+Final WindowGroupLimit), never a full sort; u is replayable
    // (md5 prefix), the key rounded to 8 decimals with id tiebreak so both
    // engines rank identically.
    QuerySpec(
      "x65_weighted_sample",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("es_key").desc, col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"),
            ((conv(substring(md5(col("text")), 1, 6), 16, 10).cast("long") + 1L) /
              16777217.0).as("u"))
          .select(col("doc_id"), col("n_chars"),
            round(log(col("u")) / col("n_chars"), 8).as("es_key"))
          // rank filtered UNCAST: a Cast around the window expression
          // defeats InferWindowGroupLimit's rank pattern and the top-k
          // degrades to a true global window (PlansSpec caught it);
          // filtering the raw row_number keeps the Partial+Final
          // WindowGroupLimit pushdown, cast happens post-filter.
          .withColumn("rank0", row_number().over(w))
          .filter(col("rank0") <= 100)
          .select(col("doc_id"), col("n_chars"), col("rank0").cast("long").as("rank"))
          .orderBy("rank")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars,
             |    (CAST(('0x' || substr(md5(text), 1, 6)) AS BIGINT) + 1) / 16777217.0 AS u
             |  FROM documents),
             |k AS (SELECT doc_id, n_chars, round(ln(u) / n_chars, 8) AS es_key FROM d)
             |SELECT doc_id, n_chars, CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS rank
             |FROM k QUALIFY rank <= 100 ORDER BY rank""".stripMargin)),
    // Retention cohort matrix over the events table (the standard product
    // analytics view; here it also smoke-tests week truncation + date
    // arithmetic agreement cross-engine): users grouped by first-active
    // ISO week, distinct active users per (cohort, week offset). Two
    // user-keyed aggregates and one equi-join — no window over the event
    // stream.
    QuerySpec(
      "x78_retention_cohorts",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
        val cohorts = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
        e.join(cohorts, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
              .as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH e AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
             |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY 1)
             |SELECT c.cohort_week, CAST(date_diff('day', c.cohort_week, e.wk) / 7 AS INT) AS week_offset,
             |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
             |FROM e JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    // First-order event-transition matrix (Markov view of user journeys):
    // per user the event stream ordered by (ts, event_id), each adjacent
    // pair counted, transition probability normalized over the FROM type.
    // One lead() window partitioned by user — state per partition is one
    // row — then a 25-row aggregate; the funnel/journey primitive.
    QuerySpec(
      "x79_event_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wt = Window.partitionBy("event_type")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy("event_type", "next_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n").cast("double") / sum(col("n")).over(wt), 4))
          .orderBy("event_type", "next_type")
      },
      Some("""WITH s AS (SELECT user_id, event_type,
             |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events)
             |SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n,
             |  round(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY event_type), 4) AS p
             |FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    // Strict ordered funnel with per-step conversion windows: first view →
    // first click within 12h of it → first purchase within 12h of that
    // (150 → 37 → 7 users on this corpus). The sequential-constraint
    // shape window functions can't express alone: each stage is a
    // user-keyed min over events AFTER the previous stage's anchor, i.e.
    // one equi-join + groupBy per step, all on the user key — a funnel of
    // depth d costs d user-keyed shuffles, never a per-event window.
    QuerySpec(
      "x80_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val c = e.join(v, "user_id")
          .filter(col("event_type") === "click" && col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 12 HOURS"))
          .groupBy("user_id").agg(min(col("ts")).as("t2"))
        val p = e.join(c, "user_id")
          .filter(col("event_type") === "purchase" && col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 12 HOURS"))
          .groupBy("user_id").agg(min(col("ts")).as("t3"))
        val tot = e.agg(countDistinct(col("user_id")).as("n"))
        v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(1))
          .unionByName(c.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(2)))
          .unionByName(p.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(3)))
          .crossJoin(broadcast(tot))
          .select(col("stage"), col("n_users").cast("long").as("n_users"),
            round(col("n_users").cast("double") / col("n"), 4).as("rate"))
          .orderBy("stage")
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 12 HOURS GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 12 HOURS GROUP BY 1),
             |tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events)
             |SELECT stage, n_users, round(CAST(n_users AS DOUBLE) / tot.n, 4) AS rate FROM (
             |  SELECT 1 AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
             |  UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT) FROM c
             |  UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT) FROM p) s
             |CROSS JOIN tot ORDER BY stage""".stripMargin)),
    // Join-key skew audit: the diagnostic that DECIDES salting (q46 is the
    // remedy; this is the detector a pipeline runs first). Per-key counts
    // of orders.o_custkey → key-count histogram stats + the top-5 heavy
    // keys with their skew factor vs the mean. One groupBy on the key +
    // one bounded top-k (Partial+Final WindowGroupLimit) + a broadcast of
    // the 1-row stats — nothing scales with anything but the key count.
    QuerySpec(
      "x81_skew_audit",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val k = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("cnt"))
        val st = k.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          round(sum(col("cnt")).cast("double") / count(lit(1)), 4).as("mean_cnt"),
          max(col("cnt")).as("max_cnt"))
        val w = Window.orderBy(col("cnt").desc, col("key"))
        k.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .crossJoin(broadcast(st))
          .select(col("rnk"), col("key"), col("cnt"),
            col("n_keys"), col("n_rows"), col("mean_cnt"),
            round(col("cnt").cast("double") / col("mean_cnt"), 4).as("skew_vs_mean"),
            round(col("max_cnt").cast("double") / col("mean_cnt"), 4).as("max_skew"))
          .orderBy("rnk")
      },
      Some("""WITH k AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY 1),
             |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             |         round(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 4) AS mean_cnt,
             |         CAST(MAX(cnt) AS BIGINT) AS max_cnt FROM k),
             |top AS (SELECT key, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rnk
             |        FROM k QUALIFY rnk <= 5)
             |SELECT top.rnk, top.key, top.cnt, st.n_keys, st.n_rows, st.mean_cnt,
             |  round(CAST(top.cnt AS DOUBLE) / st.mean_cnt, 4) AS skew_vs_mean,
             |  round(CAST(st.max_cnt AS DOUBLE) / st.mean_cnt, 4) AS max_skew
             |FROM top CROSS JOIN st ORDER BY rnk""".stripMargin)),
    // Referential-integrity audit: the data-quality gate a pipeline runs
    // before trusting a snapshot (orphan children, childless parents,
    // broken dims, duplicate keys, domain violations). Each check is an
    // anti-join or keyed aggregate producing ONE count — integer-exact,
    // engine-independent; at 100 TB each check is a slim-key shuffle and
    // the report stays |checks| rows. childless_orders = 257 on this
    // corpus (consistent with q13's except), all other checks clean.
    QuerySpec(
      "x82_integrity_audit",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val lineitem = Tables.lineitem(s, dir)
        val customer = Tables.customer(s, dir)
        def one(id: Int, name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_bad"))
            .select(lit(id).as("check_id"), lit(name).as("check_name"),
              col("n_bad").cast("long").as("n_bad"))
        val dupKeys = orders.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
          .where(col("n") > 1)
          .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_bad"))
          .select(lit(4).as("check_id"), lit("duplicate_orderkeys").as("check_name"),
            col("n_bad").cast("long").as("n_bad"))
        one(1, "orphan_lineitems",
            lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
              "left_anti"))
          .unionByName(one(2, "childless_orders",
            orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"),
              "left_anti")))
          .unionByName(one(3, "orders_without_customer",
            orders.join(customer, orders("o_custkey") === customer("c_custkey"),
              "left_anti")))
          .unionByName(dupKeys)
          .unionByName(one(5, "negative_quantities",
            lineitem.where(col("l_quantity") <= 0)))
          .orderBy("check_id")
      },
      Some("""SELECT * FROM (
             |SELECT 1 AS check_id, 'orphan_lineitems' AS check_name,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l WHERE NOT EXISTS
             |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_bad
             |UNION ALL SELECT 2, 'childless_orders',
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o WHERE NOT EXISTS
             |     (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
             |UNION ALL SELECT 3, 'orders_without_customer',
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o WHERE NOT EXISTS
             |     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             |UNION ALL SELECT 4, 'duplicate_orderkeys',
             |  (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM
             |     (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1 HAVING COUNT(*) > 1) d)
             |UNION ALL SELECT 5, 'negative_quantities',
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_quantity <= 0)
             |) ORDER BY check_id""".stripMargin)),
    // Reproducible shuffle+shard manifest: the deterministic global
    // shuffle every training run needs (same corpus + same seed => the
    // same example order, byte for byte, on any cluster size). Shuffle key
    // = md5 of a seeded doc id — shard membership and within-shard order
    // both derive from it, so there is NO global row_number: shard =
    // key % n is a pure projection (the scale-correct deal; a global rank
    // would single-thread the corpus through one window) and the manifest
    // is one |shards|-row groupBy. key_fingerprint (sum of 48-bit key
    // prefixes) lets two runs assert content equality per shard without
    // comparing rows.
    QuerySpec(
      "x86_shuffle_shard",
      (s, dir) => {
        val keyed = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"),
            conv(substring(md5(concat(lit("graft-shuffle-42:"),
              col("doc_id").cast("string"))), 1, 12), 16, 10)
              .cast("long").as("skey"))
        keyed.groupBy((col("skey") % 8).as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars_total"),
            sum(col("skey")).as("key_fingerprint"),
            min(col("skey")).as("min_key"), max(col("skey")).as("max_key"))
          .orderBy("shard")
      },
      Some("""WITH keyed AS (SELECT doc_id, n_chars,
             |    CAST(('0x' || substr(md5('graft-shuffle-42:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS skey
             |  FROM documents)
             |SELECT skey % 8 AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
             |  CAST(SUM(skey) AS BIGINT) AS key_fingerprint,
             |  CAST(MIN(skey) AS BIGINT) AS min_key, CAST(MAX(skey) AS BIGINT) AS max_key
             |FROM keyed GROUP BY 1 ORDER BY shard""".stripMargin)),
    // Deterministic per-source cap (domain capping: no single feed may
    // contribute more than `cap` docs — the CC-pipeline defense against a
    // heavy domain drowning the mixture). Selection inside each source is
    // by seeded content-free hash, so the kept subset is a uniform,
    // run-reproducible sample, not head-of-file bias. The rank window is
    // PARTITIONED by source (never global), and the report is a
    // |sources|-row groupBy.
    QuerySpec(
      "x89_source_cap",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(md5(concat(lit("cap:"), col("doc_id").cast("string"))),
            col("doc_id"))
        Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rk", row_number().over(w))
          .groupBy("source")
          .agg(count(lit(1)).as("n_before"),
            sum((col("rk") <= 15).cast("long")).as("n_kept"),
            sum(when(col("rk") <= 15, col("n_chars")).otherwise(lit(0L)))
              .as("kept_chars"))
          .orderBy("source")
      },
      Some("""WITH ranked AS (SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before,
             |  CAST(SUM(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(SUM(CASE WHEN rk <= 15 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
             |FROM ranked GROUP BY 1 ORDER BY source""".stripMargin)),
    // Right-to-erasure sweep (the GDPR/CCPA delete every production data
    // platform must run): a tombstone list of users — here derived by
    // seeded hash so the oracle can re-derive it — is purged from the
    // events table by anti-join, with a per-event-type purge/keep report
    // AND a residuals counter that re-joins the kept rows against the
    // tombstones to prove the purge left nothing behind (0 by
    // construction, verified from data). Scale shape: the tombstone list
    // broadcasts; purge and residual checks are each one equi/anti join;
    // the report is |event types| rows.
    QuerySpec(
      "x91_deletion_sweep",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val tomb = ev.select(col("user_id")).distinct()
          .filter(conv(substring(md5(concat(lit("forget:"),
            col("user_id").cast("string"))), 1, 6), 16, 10)
            .cast("long") % 20 === 0)
        val purged = ev.join(broadcast(tomb), Seq("user_id"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_purged"),
            countDistinct(col("user_id")).as("n_users_purged"))
        val keptEv = ev.join(broadcast(tomb), Seq("user_id"), "left_anti")
        val kept = keptEv.groupBy("event_type").agg(count(lit(1)).as("n_kept"))
        val resid = keptEv.select("user_id")
          .join(broadcast(tomb), Seq("user_id"))
          .agg(count(lit(1)).as("residuals"))
        kept.join(purged, Seq("event_type"), "left")
          .crossJoin(broadcast(resid))
          .select(col("event_type"),
            coalesce(col("n_purged"), lit(0L)).as("n_purged"),
            coalesce(col("n_users_purged"), lit(0L)).as("n_users_purged"),
            col("n_kept"), col("residuals"))
          .orderBy("event_type")
      },
      Some("""WITH tomb AS (SELECT DISTINCT user_id FROM events
             |              WHERE CAST(('0x' || substr(md5('forget:' || CAST(user_id AS VARCHAR)), 1, 6)) AS BIGINT) % 20 = 0),
             |purged AS (SELECT e.event_type, COUNT(*) AS n_purged, COUNT(DISTINCT e.user_id) AS n_users
             |           FROM events e JOIN tomb USING (user_id) GROUP BY 1),
             |kept AS (SELECT e.event_type, COUNT(*) AS n_kept
             |         FROM events e ANTI JOIN tomb USING (user_id) GROUP BY 1),
             |resid AS (SELECT CAST(COUNT(*) AS BIGINT) AS residuals FROM (
             |            SELECT user_id FROM events ANTI JOIN tomb USING (user_id)) r JOIN tomb USING (user_id))
             |SELECT k.event_type, CAST(COALESCE(p.n_purged, 0) AS BIGINT) AS n_purged,
             |  CAST(COALESCE(p.n_users, 0) AS BIGINT) AS n_users_purged,
             |  CAST(k.n_kept AS BIGINT) AS n_kept, resid.residuals
             |FROM kept k LEFT JOIN purged p USING (event_type) CROSS JOIN resid
             |ORDER BY event_type""".stripMargin)),
    // Token-budget source selection: rank sources by quality and admit
    // them greedily until the token budget is spent — the mixture-design
    // step that turns "we can afford B tokens" into a concrete source
    // list. Per-source stats are one distributed groupBy (token counts
    // via codegen HOFs, no UDF); the ranking window runs over the
    // |sources|-row AGGREGATE (Rule-1-safe), and selection is a pure
    // cumulative-sum threshold, reproducible run to run.
    QuerySpec(
      "x93_budget_selection",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("quality").desc, col("source"))
        val cum = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
        Tables.documents(s, dir)
          .groupBy("source")
          .agg(sum(size(filter(split(col("text"), " "), x => x =!= "")))
              .as("n_tokens"),
            round(avg(col("n_chars")), 6).as("quality"))
          .select(col("source"),
            row_number().over(w).cast("long").as("rank"),
            col("quality"),
            col("n_tokens"),
            sum(col("n_tokens")).over(cum).as("cum_tokens"))
          .withColumn("selected", (col("cum_tokens") <= 15000).cast("long"))
          .orderBy("rank")
      },
      Some("""WITH ds AS (SELECT source,
             |       CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens,
             |       round(AVG(n_chars), 6) AS quality
             |     FROM documents GROUP BY 1),
             |r AS (SELECT source, n_tokens, quality,
             |        row_number() OVER (ORDER BY quality DESC, source) AS rank,
             |        SUM(n_tokens) OVER (ORDER BY quality DESC, source ROWS UNBOUNDED PRECEDING) AS cum_tokens
             |      FROM ds)
             |SELECT source, CAST(rank AS BIGINT) AS rank, quality,
             |  n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
             |  CAST(CASE WHEN cum_tokens <= 15000 THEN 1 ELSE 0 END AS BIGINT) AS selected
             |FROM r ORDER BY rank""".stripMargin)),
    // Hybrid retrieval with reciprocal-rank fusion (Cormack, Clarke &
    // Buettcher, SIGIR 2009, public — the fusion rule RAG stacks use to
    // blend lexical and vector retrieval without score calibration):
    // rank candidates independently by token overlap and by cosine, then
    // fuse with 1/(60+rank) + 1/(60+rank). Rank positions, not raw
    // scores, so the two modalities need no common scale. Here both
    // rankings are computed in full for oracle parity; at 100 TB each
    // side is its own index's top-k (inverted index / x68's IVF-PQ) and
    // the fusion join runs over the k-bounded union — the join is on
    // (qid, cid) either way. Final top-10 filters the RAW row_number so
    // the fused cut stays a bounded WindowGroupLimit.
    QuerySpec(
      "x94_hybrid_rrf",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            array_distinct(filter(split(col("text"), " "), x => x =!= ""))
              .as("toks"))
        val q = toks.filter(col("doc_id") < 3)
          .select(col("doc_id").as("qid"), col("toks").as("qtoks"))
        val lex = toks.join(broadcast(q), col("doc_id") =!= col("qid"))
          .select(col("qid"), col("doc_id").as("cid"),
            size(array_intersect(col("qtoks"), col("toks"))).as("overlap"))
        val wl = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("overlap").desc, col("cid"))
        val lrank = lex.withColumn("rl", row_number().over(wl).cast("long"))
          .select("qid", "cid", "rl")
        val e = Tables.embeddings(s, dir)
        val vrank = Similarity.cosineTopK(e.filter(col("vec_id") < 3), e,
            "vec_id", "embedding", k = Int.MaxValue)
          .select(col("qid"), col("cid"), col("rn").as("rv"))
        val wf = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("rrf").desc, col("cid"))
        lrank.join(vrank, Seq("qid", "cid"))
          .withColumn("rrf",
            round(lit(1.0) / (lit(60) + col("rl")) +
              lit(1.0) / (lit(60) + col("rv")), 6))
          .withColumn("rank0", row_number().over(wf))
          .filter(col("rank0") <= 10)
          .select(col("qid"), col("cid"), col("rl").as("lex_rank"),
            col("rv").as("vec_rank"), col("rrf"),
            col("rank0").cast("long").as("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH d AS (SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks FROM documents),
             |e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x*x for x in emb])) AS nrm FROM e),
             |q AS (SELECT doc_id AS qid, toks AS qtoks FROM d WHERE doc_id < 3),
             |lex AS (SELECT q.qid, d2.doc_id AS cid, len(list_intersect(q.qtoks, d2.toks)) AS overlap
             |        FROM q CROSS JOIN d d2 WHERE d2.doc_id <> q.qid),
             |lrank AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY overlap DESC, cid) AS rl FROM lex),
             |vec AS (SELECT nq.vec_id AS qid, nc.vec_id AS cid,
             |          round(list_sum([nq.emb[i]*nc.emb[i] for i in range(1,65)])/(nq.nrm*nc.nrm), 4) AS sim
             |        FROM n nq CROSS JOIN n nc WHERE nq.vec_id < 3 AND nq.vec_id <> nc.vec_id),
             |vrank AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rv FROM vec),
             |fused AS (SELECT l.qid, l.cid, l.rl, v.rv,
             |            round(CAST(1.0 AS DOUBLE)/(60 + l.rl) + CAST(1.0 AS DOUBLE)/(60 + v.rv), 6) AS rrf
             |          FROM lrank l JOIN vrank v ON l.qid = v.qid AND l.cid = v.cid)
             |SELECT qid, cid, CAST(rl AS BIGINT) AS lex_rank, CAST(rv AS BIGINT) AS vec_rank, rrf,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid) AS BIGINT) AS rn
             |FROM fused QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),
    // Event-volume changepoint watch (one-sided CUSUM, Page 1954, public):
    // the pipeline-monitoring alarm that catches a feed going quiet or a
    // bot flood, upstream of any per-record check. The CUSUM recurrence
    // s_t = max(0, s_{t-1} + z_t - k) is rewritten with the running-min
    // identity s_t = cum_t - min(0, min_{j<=t} cum_j) so it becomes two
    // cumulative windows over the |days|-row DAILY AGGREGATE (Rule-1-safe
    // — the corpus never enters a window), replayable in any SQL engine
    // without recursion. Zero flags on this corpus is the healthy-data
    // answer (x82-residuals flavor); z and cusum columns prove the
    // statistic is live.
    QuerySpec(
      "x95_volume_anomaly",
      (s, dir) => {
        val wd = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val stats = daily.agg(round(avg(col("n")), 6).as("mu"),
          round(stddev_pop(col("n")), 6).as("sigma"))
        daily.crossJoin(broadcast(stats))
          .select(col("day"), col("n"),
            round((col("n") - col("mu")) / col("sigma"), 6).as("z"))
          .withColumn("cum", sum(col("z") - lit(0.5)).over(wd))
          .withColumn("cusum",
            round(col("cum") - least(lit(0.0), min(col("cum")).over(wd)), 6))
          .select(col("day"), col("n"), col("z"), col("cusum"),
            (col("cusum") > 4).cast("long").as("flag"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
             |stats AS (SELECT round(AVG(n), 6) AS mu, round(stddev_pop(n), 6) AS sigma FROM daily),
             |z AS (SELECT day, n, round((n - stats.mu) / stats.sigma, 6) AS z FROM daily CROSS JOIN stats),
             |c AS (SELECT day, n, z,
             |        SUM(z - 0.5) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
             |      FROM z),
             |s AS (SELECT day, n, z, cum,
             |        round(cum - LEAST(0, MIN(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)), 6) AS cusum
             |      FROM c)
             |SELECT day, n, z, cusum,
             |  CAST(CASE WHEN cusum > 4 THEN 1 ELSE 0 END AS BIGINT) AS flag
             |FROM s ORDER BY day""".stripMargin)),
    // Temperature-scaled mixture weights (the multilingual/multi-source
    // sampling rule of mT5/UniMax lineage, public: p_s ~ n_s^alpha) over
    // TOKEN mass per source, at three temperatures — the planning table
    // that says how much to up/down-sample each source before x36
    // executes a mixture. alpha=1 is proportional (boost 1 everywhere,
    // the built-in sanity row); alpha<1 lifts the tail (smallest source
    // here gets 1.15x at alpha=0.2). One groupBy + a 3-row broadcast
    // cross; everything downstream is |sources|x|alphas| rows.
    QuerySpec(
      "x96_temperature_mix",
      (s, dir) => {
        import s.implicits._
        val alphas = Seq(0.2, 0.5, 1.0).toDF("alpha")
        val c = Tables.documents(s, dir)
          .groupBy("source")
          .agg(sum(size(filter(split(col("text"), " "), x => x =!= "")))
            .as("n"))
        val p = c.crossJoin(broadcast(alphas))
          .select(col("alpha"), col("source"), col("n"),
            round(pow(col("n"), col("alpha")), 6).as("na"))
        val t = p.groupBy("alpha")
          .agg(sum(col("na")).as("tot"), sum(col("n")).as("ntot"))
        p.join(broadcast(t), "alpha")
          .select(col("alpha"),
            col("source"), col("n"),
            round(col("n").cast("double") / col("ntot"), 6).as("orig_share"),
            round(col("na") / col("tot"), 6).as("temp_share"),
            round((col("na") / col("tot")) /
              (col("n").cast("double") / col("ntot")), 6).as("boost"))
          .orderBy("alpha", "source")
      },
      Some("""WITH c AS (SELECT source,
             |       CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n
             |     FROM documents GROUP BY 1),
             |a AS (SELECT unnest([0.2, 0.5, 1.0]) AS alpha),
             |p AS (SELECT a.alpha, c.source, c.n, round(pow(c.n, a.alpha), 6) AS na FROM c CROSS JOIN a),
             |t AS (SELECT alpha, SUM(na) AS tot, SUM(n) AS ntot FROM p GROUP BY 1)
             |SELECT CAST(p.alpha AS DOUBLE) AS alpha, p.source, p.n,
             |  round(CAST(p.n AS DOUBLE) / t.ntot, 6) AS orig_share,
             |  round(p.na / t.tot, 6) AS temp_share,
             |  round((p.na / t.tot) / (CAST(p.n AS DOUBLE) / t.ntot), 6) AS boost
             |FROM p JOIN t USING (alpha) ORDER BY alpha, source""".stripMargin)),
    // Next-event prediction eval — model evaluation INSIDE the engine:
    // fit the x79 first-order transition model on the first 23 days,
    // predict argmax(to|from), score hit@1 on the held-out last week.
    // Train/test split is by TIME (the only split that does not leak
    // future behavior into the model). Measured answer on this corpus:
    // hit@1 ~= 0.20 across all five from-types — the synthetic journeys
    // are near-memoryless, and the eval PROVES that instead of assuming
    // it. Two windowed passes + a 5-row broadcast of the fitted model.
    QuerySpec(
      "x98_next_event_eval",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        def trans(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
        val cut = lit("2024-01-24 00:00:00").cast("timestamp")
        val cnt = trans(ev.where(col("ts") < cut))
          .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
        val wr = Window.partitionBy("event_type")
          .orderBy(col("n").desc, col("next_type"))
        val pred = cnt.withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("next_type").as("predicted"))
        trans(ev.where(col("ts") >= cut))
          .join(broadcast(pred), "event_type")
          .groupBy("event_type", "predicted")
          .agg(count(lit(1)).as("n_test"),
            sum((col("next_type") === col("predicted")).cast("long"))
              .as("n_hit"))
          .select(col("event_type"), col("predicted"), col("n_test"),
            col("n_hit"),
            round(col("n_hit").cast("double") / col("n_test"), 4)
              .as("hit_rate"))
          .orderBy("event_type")
      },
      Some("""WITH tr AS (SELECT user_id, event_type,
             |       lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |     FROM events WHERE ts < TIMESTAMP '2024-01-24 00:00:00'),
             |cnt AS (SELECT event_type, next_type, COUNT(*) AS n FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |pred AS (SELECT event_type, next_type AS predicted FROM (
             |    SELECT event_type, next_type, row_number() OVER (PARTITION BY event_type ORDER BY n DESC, next_type) AS rk FROM cnt)
             |  WHERE rk = 1),
             |te AS (SELECT user_id, event_type,
             |       lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |     FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'),
             |evalrows AS (SELECT t.event_type, t.next_type, p.predicted
             |             FROM te t JOIN pred p USING (event_type) WHERE t.next_type IS NOT NULL)
             |SELECT event_type, predicted, CAST(COUNT(*) AS BIGINT) AS n_test,
             |  CAST(SUM(CASE WHEN next_type = predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             |  round(CAST(SUM(CASE WHEN next_type = predicted THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS hit_rate
             |FROM evalrows GROUP BY 1, 2 ORDER BY 1""".stripMargin)),
    // Deequ/TFDV-style column profile — the data-validation gate a
    // pipeline runs before training on a new snapshot: per column,
    // non-null count, exact distinct count, completeness. ONE aggregate
    // over one scan (multi-distinct plans as Expand — grouped row
    // replication, no per-column rescan), then the 1-row result unpivots
    // via stack into the per-column report; at 100 TB the only thing that
    // moves is the Expand shuffle of slim (col-tag, value) pairs.
    QuerySpec(
      "x102_column_profile",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val a = e.agg(count(lit(1)).as("n"),
          count(col("event_id")).as("c1"), countDistinct(col("event_id")).as("d1"),
          count(col("ts")).as("c2"), countDistinct(col("ts")).as("d2"),
          count(col("user_id")).as("c3"), countDistinct(col("user_id")).as("d3"),
          count(col("event_type")).as("c4"), countDistinct(col("event_type")).as("d4"),
          count(col("value")).as("c5"), countDistinct(col("value")).as("d5"),
          count(col("props")).as("c6"), countDistinct(col("props")).as("d6"))
        a.select(col("n"), expr(
            """stack(6,
              |  'event_id',   c1, d1,
              |  'ts',         c2, d2,
              |  'user_id',    c3, d3,
              |  'event_type', c4, d4,
              |  'value',      c5, d5,
              |  'props',      c6, d6) AS (col_name, n_nonnull, n_distinct)
              |""".stripMargin))
          .select(col("col_name"), col("n").as("n_rows"),
            col("n_nonnull"), col("n_distinct"),
            round(col("n_nonnull").cast("double") / col("n"), 4)
              .as("completeness"))
          .orderBy("col_name")
      },
      Some("""WITH a AS (SELECT COUNT(*) AS n,
             |  COUNT(event_id) AS c1, COUNT(DISTINCT event_id) AS d1,
             |  COUNT(ts) AS c2, COUNT(DISTINCT ts) AS d2,
             |  COUNT(user_id) AS c3, COUNT(DISTINCT user_id) AS d3,
             |  COUNT(event_type) AS c4, COUNT(DISTINCT event_type) AS d4,
             |  COUNT(value) AS c5, COUNT(DISTINCT value) AS d5,
             |  COUNT(props) AS c6, COUNT(DISTINCT props) AS d6
             |  FROM events),
             |u AS (
             |  SELECT 'event_id' AS col_name, n, c1 AS n_nonnull, d1 AS n_distinct FROM a
             |  UNION ALL SELECT 'ts', n, c2, d2 FROM a
             |  UNION ALL SELECT 'user_id', n, c3, d3 FROM a
             |  UNION ALL SELECT 'event_type', n, c4, d4 FROM a
             |  UNION ALL SELECT 'value', n, c5, d5 FROM a
             |  UNION ALL SELECT 'props', n, c6, d6 FROM a)
             |SELECT col_name, CAST(n AS BIGINT) AS n_rows,
             |  CAST(n_nonnull AS BIGINT) AS n_nonnull,
             |  CAST(n_distinct AS BIGINT) AS n_distinct,
             |  round(CAST(n_nonnull AS DOUBLE) / n, 4) AS completeness
             |FROM u ORDER BY col_name""".stripMargin)),
    // k-anonymity audit (Sweeney 2002) — the re-identification risk gate
    // before a corpus release: bucket documents by quasi-identifier
    // (lang, source, n_chars/100), then for each policy k report how many
    // QI groups and documents sit in groups smaller than k. Scale shape:
    // one QI-keyed groupBy; the |QI-groups| table is bounded by the QI
    // domain (|langs|·|sources|·|buckets|), so the k sweep is a broadcast
    // cross of a 4-row dim against a small aggregate — the corpus is
    // touched once.
    QuerySpec(
      "x103_k_anonymity",
      (s, dir) => {
        import s.implicits._
        val d = Tables.documents(s, dir)
        val g = d.groupBy(col("lang"), col("source"),
            floor(col("n_chars") / 100).cast("int").as("szb"))
          .agg(count(lit(1)).as("gsz"))
        val tot = d.agg(count(lit(1)).as("n_docs"))
        val ks = Seq(2, 5, 10, 20).toDF("k")
        val below = g.crossJoin(broadcast(ks))
          .filter(col("gsz") < col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_groups_below"),
            sum(col("gsz")).as("n_docs_below"))
        ks.join(below, Seq("k"), "left_outer")
          .crossJoin(broadcast(tot))
          .select(col("k").cast("long").as("k"),
            coalesce(col("n_groups_below"), lit(0L)).as("n_groups_below"),
            coalesce(col("n_docs_below"), lit(0L)).as("n_docs_below"),
            round(coalesce(col("n_docs_below"), lit(0L)).cast("double") /
              col("n_docs"), 4).as("doc_share"))
          .orderBy("k")
      },
      Some("""WITH g AS (SELECT lang, source, CAST(FLOOR(n_chars / 100) AS INT) AS szb,
             |             COUNT(*) AS gsz
             |           FROM documents GROUP BY 1, 2, 3),
             |t AS (SELECT COUNT(*) AS n_docs FROM documents),
             |ks(k) AS (VALUES (2), (5), (10), (20)),
             |b AS (SELECT ks.k, COUNT(*) AS n_groups_below, SUM(gsz) AS n_docs_below
             |      FROM g JOIN ks ON g.gsz < ks.k GROUP BY 1)
             |SELECT CAST(ks.k AS BIGINT) AS k,
             |  CAST(COALESCE(b.n_groups_below, 0) AS BIGINT) AS n_groups_below,
             |  CAST(COALESCE(b.n_docs_below, 0) AS BIGINT) AS n_docs_below,
             |  round(CAST(COALESCE(b.n_docs_below, 0) AS DOUBLE) / t.n_docs, 4) AS doc_share
             |FROM ks LEFT JOIN b ON b.k = ks.k CROSS JOIN t ORDER BY k""".stripMargin)),
    // Equi-width histogram — the distribution profile behind outlier
    // gates and binned drift monitors: 20 buckets over the observed
    // [min, max] of events.value, count + share per bucket, bucket =
    // least(floor((v-lo)/(hi-lo)*20)+1, 20) (the width_bucket formula,
    // spelled out because DuckDB lacks the function; v == max folds into
    // the top bucket). The (min, max, n) bounds are one broadcast row;
    // bucketing is a row-local projection and the only shuffle is the
    // 20-key aggregate.
    QuerySpec(
      "x104_value_histogram",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val st = e.agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
          count(lit(1)).as("n"))
        e.crossJoin(broadcast(st))
          .select(
            // hi == lo (degenerate snapshot) => everything in bucket 1 on
            // BOTH sides; unguarded, Spark floor-casts the NaN to 0 while
            // DuckDB raises on the cast
            when(col("hi") === col("lo"), lit(1L))
              .otherwise(least(floor((col("value") - col("lo")) /
                (col("hi") - col("lo")) * 20).cast("long") + 1, lit(20L)))
              .as("bucket"), col("lo"), col("hi"), col("n"))
          .groupBy("bucket")
          .agg(round(min(col("lo")) +
              (col("bucket") - 1) * (min(col("hi")) - min(col("lo"))) / 20, 6)
              .as("bin_lo"),
            round(min(col("lo")) +
              col("bucket") * (min(col("hi")) - min(col("lo"))) / 20, 6)
              .as("bin_hi"),
            count(lit(1)).as("cnt"),
            round(count(lit(1)).cast("double") / min(col("n")), 4).as("share"))
          .orderBy("bucket")
      },
      Some("""WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n FROM events),
             |b AS (SELECT CASE WHEN st.hi = st.lo THEN 1
             |             ELSE LEAST(CAST(FLOOR((e.value - st.lo) / (st.hi - st.lo) * 20) AS BIGINT) + 1, 20) END AS bucket,
             |             st.lo, st.hi, st.n
             |      FROM events e CROSS JOIN st)
             |SELECT CAST(bucket AS BIGINT) AS bucket,
             |  round(MIN(lo) + (bucket - 1) * (MIN(hi) - MIN(lo)) / 20, 6) AS bin_lo,
             |  round(MIN(lo) + bucket * (MIN(hi) - MIN(lo)) / 20, 6) AS bin_hi,
             |  CAST(COUNT(*) AS BIGINT) AS cnt,
             |  round(CAST(COUNT(*) AS DOUBLE) / MIN(n), 4) AS share
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),
    // Population Stability Index (the credit-scoring / model-monitoring
    // standard; Siddiqi 2006) over events.value: x104's 20-bucket device
    // applied to the FIRST vs SECOND half of the stream's time range
    // (split at the midpoint epoch — integer-microsecond math, exact in
    // both engines), PSI = Σ (p_i − q_i)·ln(p_i/q_i) with shares floored
    // at 1e-6 so empty bins stay finite. Per-bucket contributions are
    // rounded then summed as DECIMAL(18,6) internally (the x101
    // discipline — add order can't flip the hash), emitted as DOUBLE:
    // per-bin rows plus a bucket=-1 total row. Scale shape: the bounds
    // row broadcasts, bucketing is row-local, and everything downstream
    // of the one 20×2-key aggregate is constant-sized.
    QuerySpec(
      "x105_psi",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("value"), unix_micros(col("ts")).as("us"))
        val st = e.agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
          min(col("us")).as("t0"), max(col("us")).as("t1"))
        val binned = e.crossJoin(broadcast(st))
          .select(when(col("hi") === col("lo"), lit(1L))
            .otherwise(least(floor((col("value") - col("lo")) /
              (col("hi") - col("lo")) * 20).cast("long") + 1, lit(20L)))
            .as("bucket"),
            // first half: us < midpoint (sum exact under 2^53, both
            // engines divide as double). when/otherwise (not a bare
            // cast) so a null ts lands in the ELSE branch exactly like
            // the oracle's CASE WHEN.
            when(col("us") < (col("t0") + col("t1")) / 2, 1)
              .otherwise(0).as("is_a"))
        val g = binned.groupBy("bucket")
          .agg(sum(col("is_a")).as("n_a"),
            sum(lit(1) - col("is_a")).as("n_b"))
        val tot = g.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
        val per = g.crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_a"), col("n_b"),
            greatest(col("n_a").cast("double") / col("ta"), lit(1e-6))
              .as("p"),
            greatest(col("n_b").cast("double") / col("tb"), lit(1e-6))
              .as("q"))
          .select(col("bucket"), col("n_a"), col("n_b"),
            round(col("p"), 6).as("p_a"), round(col("q"), 6).as("p_b"),
            round((col("p") - col("q")) * log(col("p") / col("q")), 6)
              .as("contrib"))
        val total = per.agg(
            sum(col("contrib").cast("decimal(18,6)")).as("psi"))
          .select(lit(-1L).as("bucket"), lit(null).cast("long").as("n_a"),
            lit(null).cast("long").as("n_b"),
            lit(null).cast("double").as("p_a"),
            lit(null).cast("double").as("p_b"),
            col("psi").cast("double").as("contrib"))
        per.unionByName(total).orderBy("bucket")
      },
      Some("""WITH e AS (SELECT value, epoch_us(ts) AS us FROM events),
             |st AS (SELECT MIN(value) AS lo, MAX(value) AS hi,
             |         MIN(us) AS t0, MAX(us) AS t1 FROM e),
             |b AS (SELECT CASE WHEN st.hi = st.lo THEN 1
             |               ELSE LEAST(CAST(FLOOR((e.value - st.lo) / (st.hi - st.lo) * 20) AS BIGINT) + 1, 20) END AS bucket,
             |        CASE WHEN e.us < (st.t0 + st.t1) / 2 THEN 1 ELSE 0 END AS is_a
             |      FROM e CROSS JOIN st),
             |g AS (SELECT bucket, SUM(is_a) AS n_a, SUM(1 - is_a) AS n_b FROM b GROUP BY 1),
             |t AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM g),
             |per AS (SELECT g.bucket, g.n_a, g.n_b,
             |          GREATEST(CAST(g.n_a AS DOUBLE) / t.ta, 1e-6) AS p,
             |          GREATEST(CAST(g.n_b AS DOUBLE) / t.tb, 1e-6) AS q
             |        FROM g CROSS JOIN t),
             |rows_ AS (SELECT bucket, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |            round(p, 6) AS p_a, round(q, 6) AS p_b,
             |            round((p - q) * ln(p / q), 6) AS contrib
             |          FROM per),
             |tt AS (SELECT CAST(-1 AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS n_a,
             |         CAST(NULL AS BIGINT) AS n_b, CAST(NULL AS DOUBLE) AS p_a,
             |         CAST(NULL AS DOUBLE) AS p_b,
             |         CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS contrib
             |       FROM rows_)
             |SELECT * FROM (SELECT * FROM rows_ UNION ALL SELECT * FROM tt) ORDER BY bucket""".stripMargin)),
    // SCD-2 history (Kimball type-2 slowly changing dimension) built from
    // the events change feed: per user, consecutive repeats of event_type
    // collapse and each surviving change opens a version row
    // [valid_from, valid_to) — the metadata-versioning op a warehouse
    // MERGE pipeline runs on every dimension load. Both windows partition
    // on user_id (per-key history, never corpus-global); event_id breaks
    // same-timestamp ties so re-delivery reproduces byte-identical
    // history. user_id < 10 bounds the demo output; the op itself is
    // one shuffle on the key at any corpus size.
    QuerySpec(
      "x108_scd2_history",
      (s, dir) =>
        Relational.scd2History(
            Tables.events(s, dir).filter(col("user_id") < 10),
            "user_id", "ts", "event_id", "event_type")
          .orderBy("user_id", "version"),
      Some("""WITH f AS (SELECT user_id, ts, event_id, event_type FROM events WHERE user_id < 10),
             |c AS (SELECT user_id, ts, event_id, event_type,
             |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |      FROM f),
             |ch AS (SELECT user_id, ts, event_id, event_type FROM c
             |       WHERE prev IS NULL OR prev <> event_type),
             |v AS (SELECT user_id,
             |        CAST(row_number() OVER w AS BIGINT) AS version,
             |        event_type AS state, ts AS valid_from,
             |        lead(ts) OVER w AS valid_to
             |      FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT user_id, version, state, valid_from, valid_to,
             |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
             |FROM v ORDER BY user_id, version""".stripMargin)),
    // Inter-annotator agreement (Cohen 1960 kappa) between two heuristic
    // quality labelers — the label-QA gate a labeled-data pipeline runs
    // before trusting its labels. Labeler A: n_chars >= 300; labeler B:
    // token count >= 50 (the house tokenizer). Per-lang rows plus the
    // '_all' rollup via a 2-way explode; one map-side-combined groupBy of
    // |langs|+1 rows, all kappa arithmetic row-local on the aggregate in
    // one fixed fp order (pe = 1 degenerate groups report kappa 0).
    QuerySpec(
      "x111_labeler_agreement",
      (s, dir) => {
        val labeled = Tables.documents(s, dir)
          .select(
            explode(array(col("lang"), lit("_all"))).as("grp"),
            (col("n_chars") >= 300).cast("long").as("la"),
            (size(TextFunctions.tokens(col("text"))) >= 50)
              .cast("long").as("lb"))
        QualityModel.cohenKappa(labeled, "grp", "la", "lb").orderBy("grp")
      },
      Some("""WITH l AS (SELECT lang,
             |  CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS la,
             |  CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) >= 50
             |       THEN 1 ELSE 0 END AS lb
             |  FROM documents),
             |x AS (SELECT unnest([lang, '_all']) AS grp, la, lb FROM l),
             |g AS (SELECT grp, COUNT(*) AS n, SUM(la) AS na, SUM(lb) AS nb,
             |        SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree
             |      FROM x GROUP BY 1),
             |k AS (SELECT grp, n, CAST(agree AS DOUBLE) / n AS po,
             |        (CAST(na AS DOUBLE) / n) * (CAST(nb AS DOUBLE) / n) +
             |        (1.0 - CAST(na AS DOUBLE) / n) * (1.0 - CAST(nb AS DOUBLE) / n) AS pe
             |      FROM g)
             |SELECT grp, CAST(n AS BIGINT) AS n, round(po, 6) AS po, round(pe, 6) AS pe,
             |  round(CASE WHEN pe = 1.0 THEN 0.0 ELSE (po - pe) / (1.0 - pe) END, 6) AS kappa
             |FROM k ORDER BY grp""".stripMargin)),
    // Fact-to-SCD2 temporal lookup — the point-in-time dimension join
    // every star-schema fact load runs. The dimension is x108's history
    // built from the even-event feed; facts are the odd events; each fact
    // resolves the version whose [valid_from, valid_to) contains its ts.
    // Implementation is Relational.asofJoin (union + one per-key window),
    // NOT an inequality range join — the latter explodes to |facts|·|vers|
    // candidate pairs per key at 100 TB, the as-of trick stays one shuffle.
    // Empty [t, t) versions (two same-timestamp changes) are dropped
    // first, which makes (key, valid_from) unique and the as-of pick
    // exactly the interval-containment match. Facts before any version
    // report state 'none', version 0.
    QuerySpec(
      "x112_dim_lookup_asof",
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("user_id") < 10)
        val dim = Relational.scd2History(
            ev.filter(col("event_id") % 2 === 0),
            "user_id", "ts", "event_id", "event_type")
          .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
          .select(col("user_id"), col("valid_from"),
            struct(col("version"), col("state")).as("ver"))
        val facts = ev.filter(col("event_id") % 2 === 1)
          .select("event_id", "user_id", "ts")
        Relational.asofJoin(facts, dim, "user_id", "ts", "valid_from",
            "ver", "asof")
          .select(col("event_id"), col("user_id"),
            coalesce(col("asof.state"), lit("none")).as("state"),
            coalesce(col("asof.version"), lit(0L)).as("version"))
          .orderBy("event_id")
      },
      Some("""WITH feed AS (SELECT user_id, ts, event_id, event_type FROM events
             |              WHERE event_id % 2 = 0 AND user_id < 10),
             |c AS (SELECT user_id, ts, event_id, event_type,
             |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |      FROM feed),
             |ch AS (SELECT user_id, ts, event_id, event_type FROM c
             |       WHERE prev IS NULL OR prev <> event_type),
             |v AS (SELECT user_id,
             |        CAST(row_number() OVER w AS BIGINT) AS version,
             |        event_type AS state, ts AS valid_from,
             |        lead(ts) OVER w AS valid_to
             |      FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |nz AS (SELECT * FROM v WHERE valid_to IS NULL OR valid_to > valid_from),
             |f AS (SELECT event_id, user_id, ts FROM events
             |      WHERE event_id % 2 = 1 AND user_id < 10)
             |SELECT f.event_id, f.user_id,
             |  coalesce(nz.state, 'none') AS state,
             |  coalesce(nz.version, 0) AS version
             |FROM f LEFT JOIN nz ON nz.user_id = f.user_id
             |  AND nz.valid_from <= f.ts
             |  AND (f.ts < nz.valid_to OR nz.valid_to IS NULL)
             |ORDER BY event_id""".stripMargin)),
    // Bloom-pruned fact join (semi-join reduction): lineitem rows that
    // cannot match the selective part subset are dropped by a broadcast
    // 128 KiB filter BEFORE the join's shuffle — at 100 TB the shuffled
    // volume falls from the whole fact table to ~the matching fraction,
    // while the result is provably identical to the plain join (no false
    // negatives; false positives die in the real join). The oracle is
    // that plain join — the filter must be invisible in the output.
    QuerySpec(
      "x115_bloom_pruned_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
        val red = Tables.part(s, dir)
          .filter(col("p_name").startsWith("red "))
          .select("p_partkey", "p_name")
        Bloom.bloomPrunedJoin(li, red, "p_partkey")
          .groupBy("p_partkey", "p_name")
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
              .as("sum_qty"))
          .orderBy("p_partkey")
      },
      Some("""SELECT l.l_partkey AS p_partkey, p.p_name,
             |  CAST(COUNT(*) AS BIGINT) AS n_lines,
             |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE p.p_name LIKE 'red %'
             |GROUP BY 1, 2 ORDER BY p_partkey""".stripMargin)),
    // Record linkage by blocking + edit distance — the entity-resolution
    // primitive: exact-collapse names first (the x107 group discipline:
    // 2000 parts -> 64 distinct names), block on the first token so only
    // same-block names pair, confirm with levenshtein <= 3; n_pairs
    // reconstructs record-level pair counts from group sizes. All-integer
    // output. At 100 TB the block key swaps for multi-pass sorted
    // neighborhood; the pair stage stays per-block-bounded.
    QuerySpec(
      "x116_record_linkage",
      (s, dir) => {
        val names = Tables.part(s, dir)
          .groupBy(col("p_name")).agg(count(lit(1)).as("cnt"))
          .withColumn("blk", split(col("p_name"), " ").getItem(0))
        names.as("a").join(names.as("b"),
            col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
          .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
            levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"),
            (col("a.cnt") * col("b.cnt")).as("n_pairs"))
          .filter(col("dist") <= 3)
          .orderBy("name_a", "name_b")
      },
      Some("""WITH n AS (SELECT p_name, COUNT(*) AS cnt,
             |             split_part(p_name, ' ', 1) AS blk
             |           FROM part GROUP BY 1)
             |SELECT a.p_name AS name_a, b.p_name AS name_b,
             |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
             |  CAST(a.cnt * b.cnt AS BIGINT) AS n_pairs
             |FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
             |WHERE levenshtein(a.p_name, b.p_name) <= 3
             |ORDER BY name_a, name_b""".stripMargin)),
    // Snapshot diff / CDC between two table versions — the
    // change-detection op an incremental pipeline runs before reprocessing
    // only what moved. v2 derives deterministically from v1 (drop id%23,
    // revise text of id%17, clone id%20 under offset ids), and the diff is
    // ONE full-outer join on the key emitting only added/deleted/changed
    // rows — |output| is the change rate, not the table. The full-outer
    // mode is the point: left/semi/anti each miss one of the three change
    // classes. At 100 TB both sides shuffle once on the key; comparing a
    // precomputed row hash instead of raw text is the same plan one
    // column narrower.
    QuerySpec(
      "x117_snapshot_diff",
      (s, dir) => {
        val v1 = Tables.documents(s, dir)
        val v2 = v1.filter(col("doc_id") % 23 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 17 === 0, concat(col("text"), lit(" rev2")))
              .otherwise(col("text")).as("text"))
          .unionByName(v1.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        v1.select(col("doc_id"), col("text").as("t1"))
          .join(v2.select(col("doc_id"), col("text").as("t2")),
            Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("t1").isNull, "added")
              .when(col("t2").isNull, "deleted")
              .when(col("t1") =!= col("t2"), "changed").as("status"),
            length(col("t1")).cast("long").as("len_v1"),
            length(col("t2")).cast("long").as("len_v2"))
          .filter(col("status").isNotNull)
          .orderBy("doc_id")
      },
      Some("""WITH v2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 17 = 0 THEN text || ' rev2' ELSE text END AS text
             |  FROM documents WHERE doc_id % 23 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id, text
             |  FROM documents WHERE doc_id % 20 = 0),
             |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             |        a.text AS t1, b.text AS t2
             |      FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
             |SELECT doc_id,
             |  CASE WHEN t1 IS NULL THEN 'added'
             |       WHEN t2 IS NULL THEN 'deleted'
             |       WHEN t1 <> t2 THEN 'changed' END AS status,
             |  CAST(length(t1) AS BIGINT) AS len_v1,
             |  CAST(length(t2) AS BIGINT) AS len_v2
             |FROM j
             |WHERE (CASE WHEN t1 IS NULL THEN 'added'
             |            WHEN t2 IS NULL THEN 'deleted'
             |            WHEN t1 <> t2 THEN 'changed' END) IS NOT NULL
             |ORDER BY doc_id""".stripMargin)),
    // Peak session concurrency per day — the interval-sweep occupancy op
    // (max concurrent sessions = capacity planning's load curve): q38's
    // sessions clip to calendar-day segments (explode over the touched
    // days, so a midnight-crosser counts in both days), each segment
    // contributes +1 at its start and −1 at its (exclusive) end, and the
    // day's peak is the max of the ordered running sum. The sweep window
    // partitions by DAY — bounded by that day's sessions, never
    // corpus-global — which is exactly how the classic algorithm
    // distributes: day-partition the deltas, sweep within.
    QuerySpec(
      "x118_peak_concurrency",
      (s, dir) => {
        val Window = org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_idx", sum(col("new_session")).over(run))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(min(col("ts")).as("a"), max(col("ts")).as("b"))
        val seg = sess
          .select(col("user_id"), col("a"), col("b"),
            explode(sequence(to_date(col("a")), to_date(col("b")))).as("day"))
          .select(col("user_id"), col("day"),
            greatest(col("a"), col("day").cast("timestamp")).as("seg_start"),
            least(col("b"), date_add(col("day"), 1).cast("timestamp")).as("seg_end"))
        val deltas = seg
          .select(col("day"), col("seg_start").as("t"), lit(1L).as("delta"),
            col("user_id"))
          .unionByName(seg.select(col("day"), col("seg_end").as("t"),
            lit(-1L).as("delta"), col("user_id")))
        val sweep = Window.partitionBy(col("day"))
          .orderBy(col("t"), col("delta"), col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas.withColumn("c", sum(col("delta")).over(sweep))
          .groupBy("day")
          .agg((count(lit(1)) / lit(2)).cast("long").as("n_sessions"),
            max(col("c")).as("peak"))
          .orderBy("day")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |si AS (
             |  SELECT user_id, ts,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
             |  FROM marked),
             |sess AS (SELECT user_id, session_idx, MIN(ts) AS a, MAX(ts) AS b
             |         FROM si GROUP BY 1, 2),
             |seg0 AS (SELECT user_id, a, b,
             |           CAST(unnest(generate_series(CAST(a AS DATE), CAST(b AS DATE),
             |             INTERVAL 1 DAY)) AS DATE) AS day
             |         FROM sess),
             |seg AS (SELECT user_id, day,
             |          greatest(a, CAST(day AS TIMESTAMP)) AS t_start,
             |          least(b, CAST(day + 1 AS TIMESTAMP)) AS t_end
             |        FROM seg0),
             |d AS (SELECT day, t_start AS t, 1 AS delta, user_id FROM seg
             |      UNION ALL
             |      SELECT day, t_end, -1, user_id FROM seg),
             |c AS (SELECT day,
             |        SUM(delta) OVER (PARTITION BY day ORDER BY t, delta, user_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
             |      FROM d)
             |SELECT day, CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions,
             |  CAST(MAX(c) AS BIGINT) AS peak
             |FROM c GROUP BY 1 ORDER BY day""".stripMargin)),
    // Quantile normalization across sources (the batch-effect correction
    // standard, Bolstad et al. 2003, nearest-rank form): each doc's
    // within-source percentile maps onto the GLOBAL value distribution,
    // so per-source scale drift cancels before cross-source comparison.
    // All integer arithmetic: within-source rank r over a source-bounded
    // window, target global rank k = ceil(r·N/n) as (r·N + n − 1) div n,
    // and g(k) looked up in the global cumulative histogram — which is
    // aggregate-bounded (|distinct values| rows), rides ONE broadcast as
    // a sorted struct array, and resolves per row with a filter HOF.
    // No corpus-global window anywhere: the only global window runs over
    // the histogram (x55's Rule-1-safe shape).
    QuerySpec(
      "x119_quantile_normalize",
      (s, dir) => {
        val Window = org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c"))
            .over(Window.orderBy("n_chars")
              .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        val packed = hist.agg(
          sort_array(collect_list(struct(col("n_chars"), col("cum"))))
            .as("h"),
          max(col("cum")).as("ntot"))
        val bySrc = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        val ranked = docs
          .withColumn("r", row_number().over(bySrc).cast("long"))
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("source"))).cast("long"))
        ranked.crossJoin(broadcast(packed)) // one histogram row
          .withColumn("k", (col("r") * col("ntot") + col("n") - 1L) / col("n"))
          .withColumn("k", col("k").cast("long"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            expr("filter(h, x -> x.cum >= k)[0].n_chars").as("mapped"))
          .orderBy("doc_id")
      },
      Some("""WITH hist AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1),
             |cum AS (SELECT n_chars, CAST(SUM(c) OVER (ORDER BY n_chars) AS BIGINT) AS cum
             |        FROM hist),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM documents),
             |r AS (SELECT doc_id, source, n_chars,
             |        CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS r,
             |        CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
             |      FROM documents)
             |SELECT r.doc_id, r.source, r.n_chars,
             |  (SELECT MIN(n_chars) FROM cum
             |   WHERE cum.cum >= (r.r * tot.N + r.n - 1) // r.n) AS mapped
             |FROM r CROSS JOIN tot
             |ORDER BY doc_id""".stripMargin)),
    // In-engine logistic-regression training (batch gradient descent,
    // the fastText/quality-classifier training loop that x50 only
    // SERVES): 3 full-batch GD steps on a binary target (label < 5) over
    // the 64-dim embeddings, bias included as dim 0, lr = 1. The 100 TB
    // shape of distributed GD: weights are a 65-double array that rides
    // into every executor as a plan LITERAL (no join to score rows), the
    // margin is one zip_with/aggregate fold per row in a single scan,
    // and the gradient is a posexplode to slim (dim, contrib) pairs into
    // a 65-group aggregate — map-side partial, so each step moves
    // 65 rows per task regardless of corpus size. Steps 1–2 collect 65
    // weights to the driver (k-sized by construction); the returned plan
    // is step 3, fully lazy. Determinism: per-row contributions are
    // rounded to 6 dp and summed as DECIMAL(18,6) — exact, associative,
    // partition-order-proof — and EVERY rounding (margin, sigmoid,
    // gradient, weight update) happens in Spark's own round so the
    // oracle replays the identical value sequence; nothing decimal is
    // emitted.
    QuerySpec(
      "x121_logreg_train",
      (s, dir) => {
        val ex = Tables.embeddings(s, dir)
          .select(
            when(col("label") < 5, lit(1.0)).otherwise(lit(0.0)).as("y"),
            col("embedding").as("emb"))
        QualityModel.trainLogReg(ex, nDims = 64, steps = 3).orderBy("dim")
      },
      Some("""WITH emb AS (SELECT CASE WHEN label < 5 THEN CAST(1.0 AS DOUBLE)
             |         ELSE CAST(0.0 AS DOUBLE) END AS y, embedding AS e FROM embeddings),
             |d AS (SELECT CAST(range AS BIGINT) AS dim FROM range(0, 65)),
             |w0 AS (SELECT dim, CAST(0.0 AS DOUBLE) AS w FROM d),
             |wl1 AS (SELECT list(w ORDER BY dim) AS wl FROM w0 WHERE dim >= 1),
             |wb1 AS (SELECT w AS b FROM w0 WHERE dim = 0),
             |p1 AS (SELECT y, e,
             |        round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
             |          round(wb.b + list_sum([e[k] * wl.wl[k] for k in range(1, 65)]), 6)))), 6) - y AS err
             |       FROM emb CROSS JOIN wl1 wl CROSS JOIN wb1 wb),
             |g1 AS (SELECT d.dim,
             |        round(CAST(SUM(CAST(round(err * (CASE WHEN d.dim = 0 THEN CAST(1.0 AS DOUBLE)
             |            ELSE e[CAST(d.dim AS INT)] END), 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS g
             |       FROM p1 CROSS JOIN d GROUP BY d.dim),
             |w1 AS (SELECT g.dim, round(p.w - g.g, 6) AS w FROM g1 g JOIN w0 p USING (dim)),
             |wl2 AS (SELECT list(w ORDER BY dim) AS wl FROM w1 WHERE dim >= 1),
             |wb2 AS (SELECT w AS b FROM w1 WHERE dim = 0),
             |p2 AS (SELECT y, e,
             |        round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
             |          round(wb.b + list_sum([e[k] * wl.wl[k] for k in range(1, 65)]), 6)))), 6) - y AS err
             |       FROM emb CROSS JOIN wl2 wl CROSS JOIN wb2 wb),
             |g2 AS (SELECT d.dim,
             |        round(CAST(SUM(CAST(round(err * (CASE WHEN d.dim = 0 THEN CAST(1.0 AS DOUBLE)
             |            ELSE e[CAST(d.dim AS INT)] END), 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS g
             |       FROM p2 CROSS JOIN d GROUP BY d.dim),
             |w2 AS (SELECT g.dim, round(p.w - g.g, 6) AS w FROM g2 g JOIN w1 p USING (dim)),
             |wl3 AS (SELECT list(w ORDER BY dim) AS wl FROM w2 WHERE dim >= 1),
             |wb3 AS (SELECT w AS b FROM w2 WHERE dim = 0),
             |p3 AS (SELECT y, e,
             |        round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
             |          round(wb.b + list_sum([e[k] * wl.wl[k] for k in range(1, 65)]), 6)))), 6) - y AS err
             |       FROM emb CROSS JOIN wl3 wl CROSS JOIN wb3 wb),
             |g3 AS (SELECT d.dim,
             |        round(CAST(SUM(CAST(round(err * (CASE WHEN d.dim = 0 THEN CAST(1.0 AS DOUBLE)
             |            ELSE e[CAST(d.dim AS INT)] END), 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS g
             |       FROM p3 CROSS JOIN d GROUP BY d.dim),
             |w3 AS (SELECT g.dim, round(p.w - g.g, 6) AS w FROM g3 g JOIN w2 p USING (dim))
             |SELECT dim, w FROM w3 ORDER BY dim""".stripMargin)),
    // Holt linear-trend exponential smoothing (Holt 1957) over per-type
    // daily event volumes — the forecasting twin of x95's CUSUM detector
    // (CUSUM flags level SHIFTS after the fact; Holt carries a live
    // level+trend state and prices each day against its one-step-ahead
    // forecast). α = 0.5, β = 0.3, l₁ = y₁, b₁ = 0; SSE accumulates the
    // squared one-step-ahead residuals. Scale shape: the heavy input
    // reduces FIRST to a (type, day) count table — map-side-combined,
    // |types|·|days| rows — and the sequential recurrence then folds a
    // bounded per-type day array inside one aggregate HOF (x97's
    // discipline: the inherently serial part touches only the
    // aggregate-bounded series, never the raw corpus). Pure +/× IEEE
    // arithmetic inside the fold — bit-identical on any engine — with
    // rounding only at emission.
    QuerySpec(
      "x122_holt_trend",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
        Forecast.holt(daily, "event_type").orderBy("event_type")
      },
      Some("""WITH RECURSIVE
             |daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
             |          FROM events GROUP BY 1, 2),
             |r AS (SELECT event_type, CAST(y AS DOUBLE) AS y,
             |        row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
             |      FROM daily),
             |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM r GROUP BY 1),
             |st AS (
             |  SELECT event_type, 1 AS t, y AS l, CAST(0.0 AS DOUBLE) AS b,
             |         CAST(0.0 AS DOUBLE) AS sse
             |  FROM r WHERE t = 1
             |  UNION ALL
             |  SELECT r.event_type, r.t,
             |    CAST(0.5 AS DOUBLE) * r.y + CAST(0.5 AS DOUBLE) * (st.l + st.b),
             |    CAST(0.3 AS DOUBLE) * (CAST(0.5 AS DOUBLE) * r.y
             |        + CAST(0.5 AS DOUBLE) * (st.l + st.b) - st.l)
             |      + CAST(0.7 AS DOUBLE) * st.b,
             |    st.sse + (r.y - (st.l + st.b)) * (r.y - (st.l + st.b))
             |  FROM st JOIN r ON r.event_type = st.event_type AND r.t = st.t + 1),
             |last AS (SELECT event_type, MAX(t) AS t FROM st GROUP BY 1)
             |SELECT st.event_type, nd.n_days, round(st.l, 6) AS level,
             |  round(st.b, 6) AS trend, round(st.l + st.b, 6) AS forecast,
             |  round(st.sse, 6) AS sse
             |FROM st JOIN last USING (event_type, t) JOIN nd USING (event_type)
             |ORDER BY event_type""".stripMargin)),
    // Audio features through the REAL WAV codec (Multimodal.encodeWavPcm16
    // / decodeWav — dependency-free RIFF writer + chunk-walking parser,
    // the audio sibling of the DICOM and PNG codecs): 8 deterministic
    // integer sawtooth waveforms synthesize from event-table wave ids,
    // encode to genuine RIFF/WAVE PCM16 bytes, decode back through the
    // chunk walker, and featurize (peak, RMS, sign-change zero
    // crossings). The waveform is ALL-INTEGER (sample = ((i mod p) −
    // p/2)·step) so the oracle replays every sample in SQL and checks
    // the full encode→decode→featurize path — including the 44-byte
    // header framing (n_bytes = 44 + 2n). Scale shape: synth + codec +
    // features are row-local in one mapPartitions (no pixel/sample bytes
    // ever shuffle — the [[Multimodal]] contract); output is 8 slim rows.
    QuerySpec(
      "x123_audio_features",
      (s, dir) => {
        import s.implicits._
        val wids = Tables.events(s, dir)
          .select((col("user_id") % 8).cast("long").as("wid"))
          .distinct().as[Long]
        wids.map { wid =>
          val n = (4000 + 250 * wid).toInt
          val p = (20 + 4 * wid).toInt
          val step = (40 + 10 * wid).toInt
          val samples = Array.tabulate(n)(i => (((i % p) - p / 2) * step).toShort)
          Multimodal.decodeWav(wid,
            Multimodal.encodeWavPcm16(samples, 8000)).get
        }.toDF()
          .select(col("media_id").as("wid"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("n_samples"), col("n_bytes"), col("peak"),
            round(sqrt(col("mean_square")), 6).as("rms"),
            col("n_zero_cross"))
          .orderBy("wid")
      },
      Some("""WITH w AS (SELECT DISTINCT CAST(user_id % 8 AS BIGINT) AS wid FROM events),
             |par AS (SELECT wid, 4000 + 250 * wid AS n, 20 + 4 * wid AS p,
             |               40 + 10 * wid AS step FROM w),
             |s AS (SELECT par.wid, t.i,
             |        ((t.i % par.p) - par.p // 2) * par.step AS s, par.n
             |      FROM par CROSS JOIN range(0, 5750) t(i)
             |      WHERE t.i < par.n),
             |z AS (SELECT wid, i, s, n,
             |        CASE WHEN i > 0 AND
             |             ((lag(s) OVER (PARTITION BY wid ORDER BY i) < 0) <> (s < 0))
             |             THEN 1 ELSE 0 END AS zc
             |      FROM s),
             |agg AS (SELECT wid, COUNT(*) AS n, MAX(abs(s)) AS peak,
             |          SUM(s * s) AS ss, SUM(zc) AS nzc
             |        FROM z GROUP BY 1)
             |SELECT wid, CAST(8000 AS BIGINT) AS sample_rate,
             |  CAST(n AS BIGINT) AS n_samples, CAST(44 + 2 * n AS BIGINT) AS n_bytes,
             |  CAST(peak AS BIGINT) AS peak,
             |  round(sqrt(CAST(ss AS DOUBLE) / n), 6) AS rms,
             |  CAST(nzc AS BIGINT) AS n_zero_cross
             |FROM agg ORDER BY wid""".stripMargin)),
    // Kaplan-Meier time-to-first-failure curve (Kaplan & Meier 1958):
    // per user, duration = days from first event to first 'error' event;
    // users who never error are RIGHT-CENSORED at the end of the
    // observation window — the estimator the naive "avg days to error"
    // metric gets wrong (it silently drops or mis-prices the censored
    // mass). Scale shape (ops/Survival.kaplanMeier): subjects reduce
    // first to the |distinct t| table; the at-risk running sum is an
    // integer window over that aggregate (Rule-1-safe) and the survival
    // product folds the packed array per row (x122's device). The factor
    // chain is pure IEEE divide/multiply on integer-valued doubles — no
    // transcendentals — so the recursive-CTE oracle replays it exactly.
    QuerySpec(
      "x124_kaplan_meier",
      (s, dir) => {
        val span = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("f"),
            min(when(col("event_type") === "error", to_date(col("ts"))))
              .as("e"))
        val gmax = span.agg(max(greatest(col("f"), col("e"))).as("gmax"))
        val durations = span.crossJoin(broadcast(gmax))
          .select(
            when(col("e").isNotNull, datediff(col("e"), col("f")))
              .otherwise(datediff(col("gmax"), col("f")))
              .cast("long").as("t"),
            col("e").isNotNull.cast("long").as("obs"))
        Survival.kaplanMeier(durations).orderBy("t")
      },
      Some("""WITH RECURSIVE
             |span AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             |                MIN(CASE WHEN event_type = 'error'
             |                         THEN CAST(ts AS DATE) END) AS e
             |         FROM events GROUP BY 1),
             |g AS (SELECT MAX(greatest(f, e)) AS gmax FROM span),
             |u AS (SELECT CAST(CASE WHEN e IS NOT NULL THEN datediff('day', f, e)
             |                       ELSE datediff('day', f, g.gmax) END AS BIGINT) AS t,
             |        CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS obs
             |      FROM span CROSS JOIN g),
             |agg AS (SELECT t, SUM(obs) AS d, SUM(1 - obs) AS c FROM u GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n FROM u),
             |r AS (SELECT t, d, c, row_number() OVER (ORDER BY t) AS i,
             |        tot.n - COALESCE(SUM(d + c) OVER (ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
             |      FROM agg CROSS JOIN tot),
             |km AS (
             |  SELECT i, t, d, c, n_risk,
             |    (CAST(n_risk AS DOUBLE) - d) / n_risk AS s
             |  FROM r WHERE i = 1
             |  UNION ALL
             |  SELECT r.i, r.t, r.d, r.c, r.n_risk,
             |    km.s * ((CAST(r.n_risk AS DOUBLE) - r.d) / r.n_risk)
             |  FROM km JOIN r ON r.i = km.i + 1)
             |SELECT t, CAST(n_risk AS BIGINT) AS n_at_risk,
             |  CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
             |  round(s, 6) AS survival
             |FROM km ORDER BY t""".stripMargin)),
    // CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013 —
    // the industry-standard A/B-test sharpener): adjust each user's
    // experiment-period purchase count y by their PRE-period count x,
    // y' = y − θ(x − x̄) with θ = cov(x,y)/var(x), which strips the
    // between-user variance the randomization already balanced. Variant
    // = user_id parity; pre-period = first 15 days. Determinism: x, y
    // are integer counts so every global moment (Σx, Σy, Σx², Σxy) is
    // BIGINT-exact and θ/x̄ are single fixed-order double expressions;
    // per-user y' rounds to 6 dp and per-variant means/variances sum as
    // DECIMAL(18,6). Scale shape: one user-keyed count aggregate, one
    // 1-row global-moment broadcast, one row-local adjustment, one
    // 2-group variant aggregate — no window, no join wider than the
    // broadcast.
    QuerySpec(
      "x125_cuped",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val d0 = ev.agg(min(to_date(col("ts"))).as("d0"))
        val u = ev.crossJoin(broadcast(d0))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "purchase" &&
              datediff(to_date(col("ts")), col("d0")) < 15, 1L)
              .otherwise(0L)).as("x"),
            sum(when(col("event_type") === "purchase" &&
              datediff(to_date(col("ts")), col("d0")) >= 15, 1L)
              .otherwise(0L)).as("y"))
        val gs = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        val th = gs.select(
          (col("sx").cast("double") / col("n")).as("xbar"),
          ((col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
            (col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx"))).as("theta"))
        val adj = u.crossJoin(broadcast(th))
          .select((col("user_id") % 2).as("variant"), col("y"),
            round(col("y") - col("theta") * (col("x") - col("xbar")), 6)
              .as("yadj"),
            col("theta"))
        adj.groupBy("variant")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("yadj").cast("decimal(18,6)")).as("sa"),
            sum(round(col("yadj") * col("yadj"), 6).cast("decimal(18,6)"))
              .as("saa"),
            max(col("theta")).as("theta"))
          .select(col("variant"), col("n"),
            round(col("sy").cast("double") / col("n"), 6).as("mean_y"),
            round(col("sa").cast("double") / col("n"), 6).as("mean_y_adj"),
            round(col("syy").cast("double") / col("n") -
              (col("sy").cast("double") / col("n")) *
                (col("sy").cast("double") / col("n")), 6).as("var_y"),
            round(col("saa").cast("double") / col("n") -
              (col("sa").cast("double") / col("n")) *
                (col("sa").cast("double") / col("n")), 6).as("var_y_adj"),
            round(col("theta"), 6).as("theta"))
          .orderBy("variant")
      },
      Some("""WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
             |u AS (SELECT user_id,
             |        SUM(CASE WHEN event_type = 'purchase'
             |             AND datediff('day', b.d0, CAST(ts AS DATE)) < 15
             |             THEN 1 ELSE 0 END) AS x,
             |        SUM(CASE WHEN event_type = 'purchase'
             |             AND datediff('day', b.d0, CAST(ts AS DATE)) >= 15
             |             THEN 1 ELSE 0 END) AS y
             |      FROM events CROSS JOIN b GROUP BY 1),
             |gs AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             |         SUM(x * x) AS sxx, SUM(x * y) AS sxy FROM u),
             |th AS (SELECT CAST(sx AS DOUBLE) / n AS xbar,
             |         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |         (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS theta
             |       FROM gs),
             |adj AS (SELECT user_id % 2 AS variant, y,
             |          round(y - th.theta * (x - th.xbar), 6) AS yadj, th.theta
             |        FROM u CROSS JOIN th),
             |v AS (SELECT variant, COUNT(*) AS n, SUM(y) AS sy,
             |        SUM(y * y) AS syy,
             |        SUM(CAST(yadj AS DECIMAL(18,6))) AS sa,
             |        SUM(CAST(round(yadj * yadj, 6) AS DECIMAL(18,6))) AS saa,
             |        MAX(theta) AS theta
             |      FROM adj GROUP BY 1)
             |SELECT variant, CAST(n AS BIGINT) AS n,
             |  round(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
             |  round(CAST(sa AS DOUBLE) / n, 6) AS mean_y_adj,
             |  round(CAST(syy AS DOUBLE) / n -
             |    (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 6) AS var_y,
             |  round(CAST(saa AS DOUBLE) / n -
             |    (CAST(sa AS DOUBLE) / n) * (CAST(sa AS DOUBLE) / n), 6) AS var_y_adj,
             |  round(theta, 6) AS theta
             |FROM v ORDER BY variant""".stripMargin)),
    // Differentially-private count release (Dwork et al. 2006) with
    // SEEDED Laplace noise — the x103 k-anonymity gate's quantitative
    // sibling: per-(type, day) event counts plus Laplace(1/ε) noise at
    // ε = 1, sensitivity 1. The noise is inverse-CDF sampled from a
    // deterministic uniform built the x86 way (48-bit md5 prefix of the
    // seeded group key), so the whole mechanism — seed, uniform,
    // inverse CDF — replays in SQL: u = (k + 0.5)/2⁴⁸ − 0.5 ∈ (−½, ½)
    // and never exactly 0, noise = −sign(u)·ln(1 − 2|u|). (A production
    // release would keep a private seed and drop n_true; the mechanism
    // and its plan shape are what ship.) Scale: one map-side-combined
    // count aggregate; noise is row-local arithmetic on the |groups|
    // rows.
    QuerySpec(
      "x126_dp_counts",
      (s, dir) => {
        val two48 = lit(281474976710656.0) // 2^48
        val k = conv(substring(md5(concat(lit("graft-dp-42:"),
          col("event_type"), lit("|"), col("day").cast("string"))), 1, 12),
          16, 10).cast("long")
        val u = (k.cast("double") + lit(0.5)) / two48 - lit(0.5)
        Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_true"))
          .withColumn("u", u)
          .select(col("event_type"), col("day"), col("n_true"),
            round(col("n_true") +
              -when(col("u") < 0, lit(-1.0)).otherwise(lit(1.0)) *
                log(lit(1.0) - lit(2.0) * abs(col("u"))), 6)
              .as("n_noisy"))
          .orderBy("event_type", "day")
      },
      Some("""WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |         COUNT(*) AS n_true
             |       FROM events GROUP BY 1, 2),
             |k AS (SELECT event_type, day, n_true,
             |        CAST(('0x' || substr(md5('graft-dp-42:' || event_type || '|' ||
             |          CAST(day AS VARCHAR)), 1, 12)) AS BIGINT) AS kk
             |      FROM c),
             |uu AS (SELECT event_type, day, n_true,
             |         (CAST(kk AS DOUBLE) + 0.5) / 281474976710656.0 - 0.5 AS u
             |       FROM k)
             |SELECT event_type, day, CAST(n_true AS BIGINT) AS n_true,
             |  round(n_true + -(CASE WHEN u < 0 THEN CAST(-1.0 AS DOUBLE)
             |                        ELSE CAST(1.0 AS DOUBLE) END) *
             |    ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs(u)), 6) AS n_noisy
             |FROM uu ORDER BY event_type, day""".stripMargin)),
    // Unigram^0.75 negative sampling (Mikolov et al. 2013 — the SGNS /
    // contrastive-training sampler): each purchase event draws 4
    // negatives from the item distribution raised to the 3/4 power,
    // inverse-CDF sampled with the x86 seeded-uniform device so every
    // draw replays in SQL. The cumulative table is integer-micros
    // (exact cumsum over the |items|-bounded aggregate, Rule-1-safe
    // window); the lookup is the x155 INTERVAL-CONTAINMENT device made
    // an EQUI-join — each item's (cum−w, cum] interval explodes to the
    // fixed-width buckets it overlaps (≈B+|items| slim rows, B=1024)
    // and a draw probes only its own bucket's candidates, so per-draw
    // cost is |items|/B + 1, not O(|items|) — containment-bounded for
    // large item vocabularies (all bucket arithmetic is integer DIV:
    // no overflow at any W). The draw is target = md5₄₈(event, r)
    // mod W. Output aggregates the 4·|ctx| draws per item and prices
    // them against the theoretical w/W share — the sampler's
    // distribution check. Scale: one item-count aggregate, one
    // broadcast bucket table, one equi-join, one |items| aggregate;
    // nothing corpus-quadratic, no corpus-global window.
    QuerySpec(
      "x128_negative_samples",
      (s, dir) => {
        val items = Tables.events(s, dir)
          .select(expr("variant_get(parse_json(props), '$.k', 'int')")
            .as("item"))
          .groupBy("item").agg(count(lit(1)).as("n_i"))
          .select(col("item"), col("n_i"),
            round(pow(col("n_i").cast("double"), lit(0.75)) * lit(1000000.0),
              0).cast("long").as("w"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy("item")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        // window rides INSIDE the checkpoint (aggregate-bounded input);
        // the |items|-row result is shared by the bucket table and the
        // final join — one corpus scan total
        val cum = items.withColumn("cum", sum(col("w")).over(wCum))
          .localCheckpoint()
        val bigw = cum.agg(max(col("cum")).as("bigw"))
        // every target in [0, W) lands in exactly one (cum−w, cum]
        // interval (w >= 1), so the equi-join below picks exactly one
        // item per draw — identical semantics to first-cum-above-target
        val buckets = cum.crossJoin(broadcast(bigw))
          .withColumn("width", expr("(bigw + 1023) div 1024"))
          .select(col("item"), col("w"), col("cum"),
            explode(sequence(expr("(cum - w) div width"),
              expr("(cum - 1) div width"))).as("bkt"))
        val draws = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), explode(sequence(lit(0), lit(3))).as("r"))
          .crossJoin(broadcast(bigw))
          .withColumn("width", expr("(bigw + 1023) div 1024"))
          .select(pmod(conv(substring(md5(concat(lit("graft-neg-42:"),
              col("event_id").cast("string"), lit(":"),
              col("r").cast("string"))), 1, 12), 16, 10).cast("long"),
            col("bigw")).as("target"), col("width"))
          .withColumn("bkt", expr("target div width"))
          .join(broadcast(buckets), Seq("bkt"))
          .filter(col("target") >= col("cum") - col("w") &&
            col("target") < col("cum"))
          .select(col("item"))
        val nDraws = draws.groupBy("item").agg(count(lit(1)).as("n_drawn"))
        // every draw picks exactly one item, so n_tot = 4·|purchases| —
        // a slim pushdown-friendly count, not a second pass over draws
        val tot = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .agg((count(lit(1)) * 4).as("n_tot"))
        nDraws.join(cum, "item")
          .crossJoin(broadcast(bigw))
          .crossJoin(broadcast(tot))
          .select(col("item"), col("n_i"), col("n_drawn"),
            round(col("w").cast("double") / col("bigw"), 6).as("w_share"),
            round(col("n_drawn").cast("double") / col("n_tot"), 6)
              .as("draw_share"))
          .orderBy("item")
      },
      Some("""WITH it AS (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS item,
             |        COUNT(*) AS n_i
             |      FROM events GROUP BY 1),
             |wt AS (SELECT item, n_i,
             |         CAST(round(pow(CAST(n_i AS DOUBLE), 0.75) * 1000000.0, 0)
             |           AS BIGINT) AS w
             |       FROM it),
             |cum AS (SELECT item, n_i, w,
             |          SUM(w) OVER (ORDER BY item
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |        FROM wt),
             |bw AS (SELECT MAX(cum) AS bigw FROM cum),
             |dr AS (SELECT e.event_id, t.r,
             |         CAST(('0x' || substr(md5('graft-neg-42:' ||
             |           CAST(e.event_id AS VARCHAR) || ':' || CAST(t.r AS VARCHAR)),
             |           1, 12)) AS BIGINT) % bw.bigw AS target
             |       FROM events e CROSS JOIN range(0, 4) t(r) CROSS JOIN bw
             |       WHERE e.event_type = 'purchase'),
             |pick AS (SELECT (SELECT MIN(c.item) FROM cum c WHERE c.cum > dr.target)
             |           AS item
             |         FROM dr),
             |nd AS (SELECT item, COUNT(*) AS n_drawn FROM pick GROUP BY 1),
             |tt AS (SELECT SUM(n_drawn) AS n_tot FROM nd)
             |SELECT nd.item, CAST(cum.n_i AS BIGINT) AS n_i,
             |  CAST(nd.n_drawn AS BIGINT) AS n_drawn,
             |  round(CAST(cum.w AS DOUBLE) / bw.bigw, 6) AS w_share,
             |  round(CAST(nd.n_drawn AS DOUBLE) / tt.n_tot, 6) AS draw_share
             |FROM nd JOIN cum ON cum.item = nd.item
             |  CROSS JOIN bw CROSS JOIN tt
             |ORDER BY nd.item""".stripMargin)),
    // Two-sample Kolmogorov-Smirnov test (Smirnov 1939) between the A/B
    // variants' per-user purchase counts — the distribution-level
    // companion to x125's mean-level CUPED read: D = max |F_A − F_B|
    // over the pooled value grid, with the 5%-level critical value
    // c(α)·√((n_A+n_B)/(n_A·n_B)). ECDFs are exact integer ratios
    // (cumulative counts over the |distinct y| aggregate — Rule-1-safe
    // windows); the argmax resolves deterministically by (D, −v)
    // max(struct). Scale: one user-keyed count aggregate, one
    // |distinct y| aggregate + bounded windows, one 1-row reduce.
    QuerySpec(
      "x129_ks_test",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        val u = ev.groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
          .select((col("user_id") % 2).as("variant"), col("y"))
        val grid = u.groupBy(col("y"))
          .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("cb"))
        val wc = W.orderBy("y").rowsBetween(W.unboundedPreceding, 0)
        val steps = grid
          .withColumn("cuma", sum(col("ca")).over(wc))
          .withColumn("cumb", sum(col("cb")).over(wc))
        val tots = u.agg(
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"))
        steps.crossJoin(broadcast(tots))
          .select(col("y"), col("na"), col("nb"),
            abs(col("cuma").cast("double") / col("na") -
              col("cumb").cast("double") / col("nb")).as("d"))
          .agg(max(struct(col("d"), (-col("y")).as("ny"), col("na"),
            col("nb"))).as("m"))
          .select(round(col("m.d"), 6).as("d_stat"),
            (-col("m.ny")).as("at_value"),
            col("m.na").as("n_a"), col("m.nb").as("n_b"),
            round(lit(1.358) * sqrt((col("m.na") + col("m.nb"))
              .cast("double") / (col("m.na") * col("m.nb"))), 6)
              .as("d_crit_05"),
            (col("m.d") > lit(1.358) * sqrt((col("m.na") + col("m.nb"))
              .cast("double") / (col("m.na") * col("m.nb"))))
              .cast("long").as("reject_05"))
      },
      Some("""WITH u AS (SELECT user_id % 2 AS variant,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |      FROM events GROUP BY user_id),
             |grid AS (SELECT y,
             |           SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS ca,
             |           SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS cb
             |         FROM u GROUP BY 1),
             |steps AS (SELECT y,
             |            SUM(ca) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
             |              AND CURRENT ROW) AS cuma,
             |            SUM(cb) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
             |              AND CURRENT ROW) AS cumb
             |          FROM grid),
             |tots AS (SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
             |           SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb
             |         FROM u),
             |dd AS (SELECT y, na, nb,
             |         abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb) AS d
             |       FROM steps CROSS JOIN tots),
             |best AS (SELECT d, y, na, nb FROM (
             |    SELECT d, y, na, nb,
             |      row_number() OVER (ORDER BY d DESC, y) AS rn FROM dd)
             |  WHERE rn = 1)
             |SELECT round(d, 6) AS d_stat, CAST(y AS BIGINT) AS at_value,
             |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  round(1.358 * sqrt(CAST(na + nb AS DOUBLE) / (na * nb)), 6)
             |    AS d_crit_05,
             |  CAST(CASE WHEN d > 1.358 * sqrt(CAST(na + nb AS DOUBLE) / (na * nb))
             |       THEN 1 ELSE 0 END AS BIGINT) AS reject_05
             |FROM best""".stripMargin)),
    // Zone-map (min/max statistics) pruning audit — the device behind
    // Parquet row-group skipping, Snowflake micro-partition pruning, and
    // Databricks data skipping: per-shard min/max of the predicate
    // column decide whether a monthly ship-date window can skip the
    // shard without reading it. Two physical layouts are audited side by
    // side — shards keyed by l_orderkey range (insert order: shipdates
    // scatter, zone maps span everything, ~zero pruning) vs shards keyed
    // by ship-month (clustered: maps are tight, non-matching shards all
    // prune) — quantifying WHY clustering/Z-order choice, not the stats
    // machinery, determines scan cost at 100 TB. Scale shape: zone maps
    // are one bounded aggregate per layout (≤64 + |months| rows), the
    // audit cross-joins them against 12 predicate rows, and the
    // row-level match counts are one month-grouped aggregate.
    QuerySpec(
      "x131_zonemap_prune",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("d"))
        val w = li.agg((floor(max(col("l_orderkey")) / lit(64.0))
          .cast("long") + 1L).as("w"))
        val byKey = li.crossJoin(broadcast(w))
          .groupBy(expr("l_orderkey div w").as("shard"))
          .agg(min("d").as("min_d"), max("d").as("max_d"),
            count(lit(1)).as("n_rows"))
          .withColumn("layout", lit("by_orderkey"))
        val byMonth = li
          .groupBy((year(col("d")) * 12 + month(col("d"))).cast("long")
            .as("shard"))
          .agg(min("d").as("min_d"), max("d").as("max_d"),
            count(lit(1)).as("n_rows"))
          .withColumn("layout", lit("by_shipmonth"))
        val zm = byKey.unionByName(byMonth)
        val months = s.range(0, 12)
          .select(expr("add_months(DATE '1995-01-01', CAST(id AS INT))")
            .as("lo"))
          .select(col("lo"), expr("add_months(lo, 1)").as("hi"))
        val tot = li.agg(count(lit(1)).as("total_rows"))
        val fl = zm.crossJoin(broadcast(months))
          .withColumn("pruned",
            col("max_d") < col("lo") || col("min_d") >= col("hi"))
        val ag = fl.groupBy("layout", "lo")
          .agg(count(lit(1)).as("n_shards"),
            sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
            sum(when(col("pruned"), 0L).otherwise(col("n_rows")))
              .as("rows_scanned"))
        val mt = li
          .filter(col("d") >= lit("1995-01-01") && col("d") < lit("1996-01-01"))
          .groupBy(trunc(col("d"), "month").as("lo"))
          .agg(count(lit(1)).as("rows_matching"))
        ag.join(mt, Seq("lo"), "left")
          .na.fill(0L, Seq("rows_matching"))
          .crossJoin(broadcast(tot))
          .select(col("layout"), col("lo").as("month"), col("n_shards"),
            col("n_pruned"), col("rows_scanned"), col("rows_matching"),
            round(col("rows_scanned").cast("double") / col("total_rows"), 6)
              .as("scan_fraction"),
            round((col("rows_scanned") - col("rows_matching"))
              .cast("double") / col("rows_scanned"), 6).as("waste_fraction"))
          .orderBy("layout", "month")
      },
      Some("""WITH li AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS d
             |      FROM lineitem),
             |w AS (SELECT CAST(floor(max(l_orderkey) / 64.0) AS BIGINT) + 1 AS w
             |      FROM li),
             |zm AS (
             |  SELECT 'by_orderkey' AS layout, l_orderkey // w.w AS shard,
             |    min(d) AS min_d, max(d) AS max_d, count(*) AS n_rows
             |  FROM li CROSS JOIN w GROUP BY 1, 2
             |  UNION ALL
             |  SELECT 'by_shipmonth', CAST(year(d) * 12 + month(d) AS BIGINT),
             |    min(d), max(d), count(*)
             |  FROM li GROUP BY 1, 2),
             |mo AS (SELECT CAST(DATE '1995-01-01' + (m * INTERVAL 1 MONTH)
             |          AS DATE) AS lo,
             |        CAST(DATE '1995-01-01' + ((m + 1) * INTERVAL 1 MONTH)
             |          AS DATE) AS hi
             |       FROM range(0, 12) t(m)),
             |tot AS (SELECT count(*) AS total_rows FROM li),
             |fl AS (SELECT zm.layout, mo.lo, zm.n_rows,
             |         (zm.max_d < mo.lo OR zm.min_d >= mo.hi) AS pruned
             |       FROM zm CROSS JOIN mo),
             |ag AS (SELECT layout, lo, count(*) AS n_shards,
             |         sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS n_pruned,
             |         sum(CASE WHEN pruned THEN 0 ELSE n_rows END)
             |           AS rows_scanned
             |       FROM fl GROUP BY 1, 2),
             |mt AS (SELECT date_trunc('month', d)::DATE AS lo,
             |         count(*) AS rows_matching
             |       FROM li
             |       WHERE d >= DATE '1995-01-01' AND d < DATE '1996-01-01'
             |       GROUP BY 1)
             |SELECT ag.layout, ag.lo AS month,
             |  CAST(ag.n_shards AS BIGINT) AS n_shards,
             |  CAST(ag.n_pruned AS BIGINT) AS n_pruned,
             |  CAST(ag.rows_scanned AS BIGINT) AS rows_scanned,
             |  CAST(COALESCE(mt.rows_matching, 0) AS BIGINT) AS rows_matching,
             |  round(CAST(ag.rows_scanned AS DOUBLE) / tot.total_rows, 6)
             |    AS scan_fraction,
             |  round(CAST(ag.rows_scanned - COALESCE(mt.rows_matching, 0)
             |    AS DOUBLE) / ag.rows_scanned, 6) AS waste_fraction
             |FROM ag LEFT JOIN mt ON mt.lo = ag.lo CROSS JOIN tot
             |ORDER BY layout, month""".stripMargin)),
    // Incremental materialized-view maintenance (delta-merge IVM — the
    // Materialize/Snowflake-MV device, here the groupBy-agg special
    // case): the per-user snapshot over the BASE window (days < cutoff)
    // merges with a partial aggregate over only the DELTA tail (last 7
    // days) via full-outer coalesce-add — counts add, decimal revenue
    // sums add exactly — instead of recomputing the view over the whole
    // corpus. The oracle recomputes the SAME view from scratch over all
    // events, so a hash match PROVES merge == full recompute. Scale
    // shape: at 100 TB the base snapshot is a stored table; each
    // maintenance tick shuffles only the delta partition's users plus a
    // user-keyed merge join; nothing rescans history. Revenue goes
    // through the round-6/DECIMAL(18,6) bridge so both paths and the
    // oracle sum exactly in any add order.
    QuerySpec(
      "x132_mv_incremental",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("event_type"),
            round(col("value"), 6).cast("decimal(18,6)").as("v"))
        val cut = ev.agg(date_sub(max(col("day")), 7).as("cut"))
        val tagged = ev.crossJoin(broadcast(cut))
        def snap(df: org.apache.spark.sql.DataFrame) = df
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            sum(col("v")).as("rev"))
        val base = snap(tagged.filter(col("day") < col("cut")))
        val delta = snap(tagged.filter(col("day") >= col("cut")))
        val merged = base.as("b").join(delta.as("d"), Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("b.n_events"), lit(0L)) +
              coalesce(col("d.n_events"), lit(0L))).as("n_events"),
            (coalesce(col("b.n_purchases"), lit(0L)) +
              coalesce(col("d.n_purchases"), lit(0L))).as("n_purchases"),
            (coalesce(col("b.rev"), lit(java.math.BigDecimal.ZERO)
              .cast("decimal(18,6)")) +
              coalesce(col("d.rev"), lit(java.math.BigDecimal.ZERO)
                .cast("decimal(18,6)"))).cast("double").as("revd"))
        merged
          .select(col("user_id"), col("n_events"), col("n_purchases"),
            round(col("revd"), 6).as("revenue"))
          .orderBy(col("n_events").desc, col("user_id")).limit(20)
      },
      Some("""WITH v AS (SELECT user_id,
             |        count(*) AS n_events,
             |        sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |          AS n_purchases,
             |        CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS revd
             |      FROM events GROUP BY user_id)
             |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
             |  CAST(n_purchases AS BIGINT) AS n_purchases,
             |  round(revd, 6) AS revenue
             |FROM v ORDER BY n_events DESC, user_id LIMIT 20""".stripMargin)),
    // Welch's unequal-variance t-test (Welch 1947) + sample-ratio-
    // mismatch guardrail (Fabijan et al. 2019) over the A/B variants'
    // per-user purchase counts — the mean-level significance read that
    // completes the x125 (CUPED) / x129 (KS) experiment-analysis suite,
    // plus the chi-square check that the 50/50 assignment actually
    // delivered 50/50 (an SRM invalidates any downstream stat). All
    // moments (n, Σy, Σy²) are INTEGER aggregates — exact in any add
    // order, no decimal bridge needed — and the t/df/chi² arithmetic is
    // a deterministic single-row expression over those integers. Scale
    // shape: one user-keyed count aggregate, one 1-row reduce.
    QuerySpec(
      "x133_ab_welch_srm",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
          .select((col("user_id") % 2).as("variant"), col("y"))
        u.agg(
            sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"),
            sum(when(col("variant") === 0, col("y")).otherwise(0L)).as("sa"),
            sum(when(col("variant") === 1, col("y")).otherwise(0L)).as("sb"),
            sum(when(col("variant") === 0, col("y") * col("y")).otherwise(0L))
              .as("ssa"),
            sum(when(col("variant") === 1, col("y") * col("y")).otherwise(0L))
              .as("ssb"))
          .select(col("na"), col("nb"),
            round(col("sa").cast("double") / col("na"), 6).as("mean_a"),
            round(col("sb").cast("double") / col("nb"), 6).as("mean_b"),
            expr("CAST(ssa * na - sa * sa AS DOUBLE) / (CAST(na AS DOUBLE) * (na - 1))").as("va"),
            expr("CAST(ssb * nb - sb * sb AS DOUBLE) / (CAST(nb AS DOUBLE) * (nb - 1))").as("vb"))
          .select(col("na"), col("nb"), col("mean_a"), col("mean_b"),
            round(col("va"), 6).as("var_a"), round(col("vb"), 6).as("var_b"),
            round((col("mean_a") - col("mean_b")) /
              sqrt(col("va") / col("na") + col("vb") / col("nb")), 6)
              .as("t_welch"),
            round(pow(col("va") / col("na") + col("vb") / col("nb"), 2) /
              (pow(col("va") / col("na"), 2) / (col("na") - 1) +
               pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 6)
              .as("df_welch"),
            round(pow(col("na") - (col("na") + col("nb")) / lit(2.0), 2) /
              ((col("na") + col("nb")) / lit(2.0)) +
              pow(col("nb") - (col("na") + col("nb")) / lit(2.0), 2) /
              ((col("na") + col("nb")) / lit(2.0)), 6).as("srm_chi2"))
          .withColumn("srm_reject_05",
            (col("srm_chi2") > 3.841).cast("long"))
          .orderBy("na")
      },
      Some("""WITH u AS (SELECT user_id % 2 AS variant,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |          AS y
             |      FROM events GROUP BY user_id),
             |m AS (SELECT
             |        SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
             |        SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
             |        SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS sa,
             |        SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS sb,
             |        SUM(CASE WHEN variant = 0 THEN y * y ELSE 0 END) AS ssa,
             |        SUM(CASE WHEN variant = 1 THEN y * y ELSE 0 END) AS ssb
             |      FROM u),
             |vv AS (SELECT na, nb,
             |        round(CAST(sa AS DOUBLE) / na, 6) AS mean_a,
             |        round(CAST(sb AS DOUBLE) / nb, 6) AS mean_b,
             |        CAST(ssa * na - sa * sa AS DOUBLE)
             |          / (CAST(na AS DOUBLE) * (na - 1)) AS va,
             |        CAST(ssb * nb - sb * sb AS DOUBLE)
             |          / (CAST(nb AS DOUBLE) * (nb - 1)) AS vb
             |      FROM m)
             |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             |  mean_a, mean_b,
             |  round(va, 6) AS var_a, round(vb, 6) AS var_b,
             |  round((mean_a - mean_b) / sqrt(va / na + vb / nb), 6)
             |    AS t_welch,
             |  round(pow(va / na + vb / nb, 2) /
             |    (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 6)
             |    AS df_welch,
             |  round(pow(na - (na + nb) / 2.0, 2) / ((na + nb) / 2.0) +
             |        pow(nb - (na + nb) / 2.0, 2) / ((na + nb) / 2.0), 6)
             |    AS srm_chi2,
             |  CAST(CASE WHEN pow(na - (na + nb) / 2.0, 2) / ((na + nb) / 2.0) +
             |        pow(nb - (na + nb) / 2.0, 2) / ((na + nb) / 2.0) > 3.841
             |       THEN 1 ELSE 0 END AS BIGINT) AS srm_reject_05
             |FROM vv ORDER BY na""".stripMargin)),
    // Autocorrelation function (Box & Jenkins 1970) of the daily event-
    // count series at lags 1–7 — the model-identification read that
    // precedes any ARIMA/seasonal fit, and the companion diagnostic to
    // x122's Holt trend: a spike at lag 7 says "weekly seasonality",
    // geometric decay says "trend". Lagged pairs come from an EQUI-join
    // of the |days|-row aggregate against itself on day+lag (never a
    // theta/cross join); centered products round to 6 dp and sum as
    // DECIMAL(18,6) so partition order can't move the hash. Scale
    // shape: one corpus day-count aggregate, then bounded |days|·7 work.
    QuerySpec(
      "x134_acf_daily",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val mu = d.agg((sum(col("n")).cast("double") / count(lit(1)))
          .as("mu"))
        val c = d.crossJoin(broadcast(mu))
          .select(col("day"), (col("n") - col("mu")).as("xc"))
          .localCheckpoint()
        val denom = c.agg(sum(round(col("xc") * col("xc"), 6)
          .cast("decimal(18,6)")).cast("double").as("denom"))
        val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
        val pairs = c.as("a")
          .crossJoin(broadcast(lags))
          .select(col("lag"), expr("date_add(day, lag)").as("lday"),
            col("xc").as("xa"))
          .join(c.as("b").select(col("day").as("lday"), col("xc").as("xb")),
            "lday")
        pairs.groupBy("lag")
          .agg(count(lit(1)).as("n_pairs"),
            sum(round(col("xa") * col("xb"), 6).cast("decimal(18,6)"))
              .cast("double").as("num"))
          .crossJoin(broadcast(denom))
          .select(col("lag").cast("long").as("lag"), col("n_pairs"),
            round(col("num") / col("denom"), 6).as("acf"))
          .orderBy("lag")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |      FROM events GROUP BY 1),
             |mu AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mu FROM d),
             |c AS (SELECT day, n - mu.mu AS xc FROM d CROSS JOIN mu),
             |dn AS (SELECT CAST(sum(CAST(round(xc * xc, 6) AS DECIMAL(18,6)))
             |         AS DOUBLE) AS denom FROM c),
             |l AS (SELECT CAST(lag AS INT) AS lag FROM range(1, 8) t(lag)),
             |pr AS (SELECT l.lag, a.xc AS xa, b.xc AS xb
             |       FROM c a CROSS JOIN l
             |         JOIN c b ON b.day = a.day + l.lag * INTERVAL 1 DAY)
             |SELECT CAST(lag AS BIGINT) AS lag, count(*) AS n_pairs,
             |  round(CAST(sum(CAST(round(xa * xb, 6) AS DECIMAL(18,6)))
             |    AS DOUBLE) / any_value(dn.denom), 6) AS acf
             |FROM pr CROSS JOIN dn GROUP BY lag ORDER BY lag""".stripMargin)),
    // Day-of-week seasonal profile + MAD-robust anomaly count (the
    // classical-decomposition seasonal index, Cleveland's STL at its
    // cheapest; MAD×1.4826 as the robust sigma per Hampel 1974) over the
    // daily event-count series — the "is Tuesday always like this, and
    // which days broke pattern" read that precedes x95's CUSUM alarm.
    // Day-of-week comes from epoch-day mod 7 (engine-portable, no
    // locale); residuals are vs the dow mean; the MAD is an exact median
    // over the |days|-row aggregate. Scale shape: one corpus day-count
    // aggregate, then ≤7-row and 1-row reduces — every window/median
    // input is aggregate-bounded.
    QuerySpec(
      "x136_dow_seasonality",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("dow",
            expr("datediff(day, DATE '1970-01-01') % 7").cast("long"))
          .localCheckpoint()
        val mu = d.agg((sum(col("n")).cast("double") / count(lit(1)))
          .as("mu"))
        val dm = d.groupBy("dow")
          .agg(count(lit(1)).as("n_days"), sum(col("n")).as("tot"),
            (sum(col("n")).cast("double") / count(lit(1))).as("dmean"))
        val resid = d.join(dm.select(col("dow"), col("dmean")), "dow")
          .select(col("dow"), col("day"),
            abs(col("n") - col("dmean")).as("ar"))
        val mad = resid.agg(expr("percentile(ar, 0.5)").as("mad"))
        val an = resid.crossJoin(broadcast(mad))
          .filter(col("ar") > lit(3.0) * lit(1.4826) * col("mad"))
          .groupBy("dow").agg(count(lit(1)).as("n_anom"))
        dm.join(an, Seq("dow"), "left").na.fill(0L, Seq("n_anom"))
          .crossJoin(broadcast(mu))
          .select(col("dow"), col("n_days"), col("tot").as("total_events"),
            round(col("dmean"), 6).as("dow_mean"),
            round(col("dmean") / col("mu"), 6).as("seasonal_index"),
            col("n_anom"))
          .orderBy("dow")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |      FROM events GROUP BY 1),
             |dd AS (SELECT day, n,
             |         CAST(date_diff('day', DATE '1970-01-01', day) % 7
             |           AS BIGINT) AS dow
             |       FROM d),
             |mu AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mu FROM dd),
             |dm AS (SELECT dow, count(*) AS n_days, sum(n) AS tot,
             |         CAST(sum(n) AS DOUBLE) / count(*) AS dmean
             |       FROM dd GROUP BY 1),
             |r AS (SELECT dd.dow, dd.day, abs(dd.n - dm.dmean) AS ar
             |      FROM dd JOIN dm ON dm.dow = dd.dow),
             |md AS (SELECT quantile_cont(ar, 0.5) AS mad FROM r),
             |an AS (SELECT dow, count(*) AS n_anom
             |       FROM r CROSS JOIN md
             |       WHERE ar > 3.0 * 1.4826 * md.mad GROUP BY 1)
             |SELECT dm.dow, CAST(dm.n_days AS BIGINT) AS n_days,
             |  CAST(dm.tot AS BIGINT) AS total_events,
             |  round(dm.dmean, 6) AS dow_mean,
             |  round(dm.dmean / mu.mu, 6) AS seasonal_index,
             |  CAST(COALESCE(an.n_anom, 0) AS BIGINT) AS n_anom
             |FROM dm LEFT JOIN an ON an.dow = dm.dow CROSS JOIN mu
             |ORDER BY dm.dow""".stripMargin)),
    // Poisson bootstrap CI (Chamandy, Muralidharan, Najmi & Naidu 2012,
    // "Estimating uncertainty for massive data streams" — Google's
    // at-scale bootstrap) for the mean per-user purchase count: classical
    // resampling needs n draws per replicate from one machine; the
    // Poisson trick gives each (user, replicate) an independent
    // Poisson(1) weight so ALL 201 replicates ride one map-side fan-out
    // of the slim (user, y) aggregate — no resampling shuffle, no
    // driver-side loop. Weights are deterministic: the x86/x128 seeded
    // md5₄₈ uniform inverse-CDF'd through Poisson(1) thresholds
    // (literals identical in both engines). Replicate sums are INTEGER
    // (w·y with integer w, y) so partition/add order can't move them;
    // 201 replicates put the 2.5%/97.5% quantile positions at exact
    // order statistics (0.025·200 = 5), so percentile interpolates
    // nothing and both engines pick the same element. Scale shape: one
    // user-keyed aggregate, a 201× broadcast fan-out with map-side
    // partial aggregation into 201 cells, one 201-row quantile.
    QuerySpec(
      "x137_bootstrap_ci",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
          .localCheckpoint() // one corpus scan feeds both the fan-out and pt
        val reps = s.range(0, 201).select(col("id").as("r"))
        val w = u.crossJoin(broadcast(reps))
          .select(col("y"), col("r"),
            (conv(substring(md5(concat(lit("graft-boot-42:"),
              col("user_id").cast("string"), lit(":"),
              col("r").cast("string"))), 1, 12), 16, 10)
              .cast("long").cast("double") / lit(281474976710656.0)).as("uu"))
          .select(col("r"), col("y"),
            when(col("uu") <= 0.36787944117144233, 0L)
              .when(col("uu") <= 0.7357588823428847, 1L)
              .when(col("uu") <= 0.9196986029286058, 2L)
              .when(col("uu") <= 0.9810118431238462, 3L)
              .when(col("uu") <= 0.9963401531726563, 4L)
              .when(col("uu") <= 0.9994058151824183, 5L)
              .when(col("uu") <= 0.999916758850712, 6L)
              .otherwise(7L).as("w"))
        val m = w.groupBy("r")
          .agg(sum(col("w") * col("y")).as("sa"), sum(col("w")).as("na"))
        val q = m.select((col("sa").cast("double") / col("na")).as("mr"))
          .agg(expr("percentile(mr, 0.025)").as("lo"),
            expr("percentile(mr, 0.975)").as("hi"))
        val pt = u.agg(count(lit(1)).as("n_users"),
          (sum(col("y")).cast("double") / count(lit(1))).as("mean_hat"))
        pt.crossJoin(broadcast(q))
          .select(col("n_users"), lit(201L).as("n_reps"),
            round(col("mean_hat"), 6).as("mean_hat"),
            round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |      FROM events GROUP BY user_id),
             |d AS (SELECT u.y, t.r,
             |        CAST(('0x' || substr(md5('graft-boot-42:' ||
             |          CAST(u.user_id AS VARCHAR) || ':' || CAST(t.r AS VARCHAR)),
             |          1, 12)) AS BIGINT) / 281474976710656.0 AS uu
             |      FROM u CROSS JOIN range(0, 201) t(r)),
             |w AS (SELECT r, y,
             |        CASE WHEN uu <= 0.36787944117144233 THEN 0
             |             WHEN uu <= 0.7357588823428847 THEN 1
             |             WHEN uu <= 0.9196986029286058 THEN 2
             |             WHEN uu <= 0.9810118431238462 THEN 3
             |             WHEN uu <= 0.9963401531726563 THEN 4
             |             WHEN uu <= 0.9994058151824183 THEN 5
             |             WHEN uu <= 0.999916758850712 THEN 6
             |             ELSE 7 END AS w
             |      FROM d),
             |m AS (SELECT r, SUM(w * y) AS sa, SUM(w) AS na FROM w GROUP BY r),
             |q AS (SELECT quantile_cont(CAST(sa AS DOUBLE) / na, 0.025) AS lo,
             |        quantile_cont(CAST(sa AS DOUBLE) / na, 0.975) AS hi
             |      FROM m),
             |pt AS (SELECT COUNT(*) AS n_users,
             |         CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mean_hat FROM u)
             |SELECT CAST(pt.n_users AS BIGINT) AS n_users,
             |  CAST(201 AS BIGINT) AS n_reps,
             |  round(pt.mean_hat, 6) AS mean_hat,
             |  round(q.lo, 6) AS ci_lo, round(q.hi, 6) AS ci_hi
             |FROM pt CROSS JOIN q ORDER BY n_users""".stripMargin)),
    // Pareto frontier (skyline operator — Börzsönyi, Kossmann &
    // Stocker, ICDE 2001) of documents on (shorter, lexically richer):
    // a doc survives iff nothing else has ≤ its token count AND ≥ its
    // distinct-token count with one strict — the curation read for
    // "densest short documents" before budgeted selection (x93). The
    // naive skyline is all-pairs; for a 2-D skyline the exact
    // aggregate-bounded plan is: per-x max(y) over the |distinct
    // n_tokens| GROUP BY, a prefix-max window over that aggregate
    // (bounded input, Rule-1-safe), then one equi-join back to attach
    // doc ids only to surviving (x, maxy) cells. Everything is integer,
    // so cross-engine equality is exact. Scale: one corpus tokenize +
    // groupBy; the window input is the ≤|distinct lengths| aggregate,
    // never the corpus.
    QuerySpec(
      "x138_pareto_frontier",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).as("n_tokens"),
            size(array_distinct(col("toks"))).as("n_distinct"))
          .localCheckpoint() // one tokenize pass feeds both g and the join
        val g = d.groupBy("n_tokens")
          .agg(max(col("n_distinct")).as("maxy"))
        val wv = W.orderBy("n_tokens")
          .rowsBetween(W.unboundedPreceding, -1)
        val fx = g
          .withColumn("prevmax", coalesce(max(col("maxy")).over(wv), lit(-1)))
          .filter(col("maxy") > col("prevmax"))
        d.join(fx, Seq("n_tokens"))
          .filter(col("n_distinct") === col("maxy"))
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            col("n_distinct").cast("long").as("n_distinct"))
          .orderBy("n_tokens", "doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |        list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                    x -> x <> '') AS toks
             |      FROM documents),
             |d AS (SELECT doc_id, len(toks) AS n_tokens,
             |        len(list_distinct(toks)) AS n_distinct FROM t),
             |g AS (SELECT n_tokens, MAX(n_distinct) AS maxy FROM d GROUP BY 1),
             |f AS (SELECT n_tokens, maxy,
             |        COALESCE(MAX(maxy) OVER (ORDER BY n_tokens
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             |          AS prevmax
             |      FROM g)
             |SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
             |  CAST(d.n_distinct AS BIGINT) AS n_distinct
             |FROM d JOIN f ON f.n_tokens = d.n_tokens AND d.n_distinct = f.maxy
             |WHERE f.maxy > f.prevmax
             |ORDER BY n_tokens, doc_id""".stripMargin)),
    // NDCG@10 (Järvelin & Kekäläinen 2002) of the binary-Hamming ANN
    // shortlist against the exact-cosine ranking — the rank-aware
    // retrieval eval that recall@k (x63/x69/x92) can't give: graded
    // relevance 10..1 from the exact top-10, discounted by 1/log2(1+p)
    // at the approximate rank p. The exact side attaches full vectors
    // only to the 5-query × corpus candidate pairs (query side
    // broadcasts); both rankings are WindowGroupLimit-bounded; each
    // per-query DCG sums ≤10 rounded terms through the DECIMAL bridge
    // so add order can't move the hash; IDCG replays from a 10-row
    // range in both engines. Sim rounds to 4 dp before ranking (the
    // x130 discipline) so cross-engine float addition order in the dot
    // product can't flip a rank.
    QuerySpec(
      "x141_ndcg_eval",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, dir)
        val codes = e.select(col("vec_id"), expr(PackLoExpr).as("lo"),
          expr(PackHiExpr).as("hi"))
        val q = codes.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("lo").as("qlo"),
            col("hi").as("qhi"))
        val wq = W.partitionBy("qid").orderBy(col("ham"), col("cid"))
        val approx = codes.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("cid"),
            expr("bit_count(qlo ^ lo) + bit_count(qhi ^ hi)")
              .cast("long").as("ham"))
          .withColumn("p", row_number().over(wq).cast("long"))
          .filter(col("p") <= 10)
        val qe = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val wr = W.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
        val rel = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
          .crossJoin(broadcast(qe)).filter(col("cid") =!= col("qid"))
          .select(col("qid"), col("cid"), expr(CosineSim4Expr).as("sim"))
          .withColumn("xr", row_number().over(wr).cast("long"))
          .filter(col("xr") <= 10)
          .select(col("qid"), col("cid"), (lit(11L) - col("xr")).as("rel"))
        val dcg = approx.join(rel, Seq("qid", "cid"), "left")
          .na.fill(0L, Seq("rel"))
          .groupBy("qid")
          .agg(sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_hits"),
            sum(round(col("rel").cast("double") /
                (log(col("p") + 1.0) / log(lit(2.0))), 6)
              .cast("decimal(18,6)")).cast("double").as("dcg"))
        val idcg = s.range(1, 11)
          .select(round((lit(11.0) - col("id")) /
              (log(col("id") + 1.0) / log(lit(2.0))), 6)
            .cast("decimal(18,6)").as("c"))
          .agg(sum(col("c")).cast("double").as("idcg"))
        dcg.crossJoin(broadcast(idcg))
          .select(col("qid"), col("n_hits"), round(col("dcg"), 6).as("dcg"),
            round(col("dcg") / col("idcg"), 6).as("ndcg"))
          .orderBy("qid")
      },
      Some(s"""WITH $BinPackOracleCte,
             |ap AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |        CAST(bit_count(xor(q.lo, c.lo))
             |           + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS ham
             |      FROM p q JOIN p c ON c.vec_id <> q.vec_id
             |      WHERE q.vec_id < 5),
             |sh AS (SELECT qid, cid,
             |        CAST(row_number() OVER (PARTITION BY qid
             |          ORDER BY ham, cid) AS BIGINT) AS pp
             |      FROM ap QUALIFY pp <= 10),
             |$EmbNormOracleCte,
             |f AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |        q.nrm AS qn, c.nrm AS cn,
             |        unnest(q.emb) AS qv, unnest(c.emb) AS cv
             |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
             |      WHERE q.vec_id < 5),
             |d AS (SELECT qid, cid,
             |        round(sum(qv * cv) / (any_value(qn) * any_value(cn)), 4)
             |          AS sim
             |      FROM f GROUP BY qid, cid),
             |xr AS (SELECT qid, cid, 11 - CAST(row_number() OVER (
             |          PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT)
             |          AS rel
             |       FROM d QUALIFY rel >= 1),
             |dc AS (SELECT sh.qid,
             |        SUM(CASE WHEN COALESCE(xr.rel, 0) > 0 THEN 1 ELSE 0 END)
             |          AS n_hits,
             |        CAST(SUM(CAST(round(CAST(COALESCE(xr.rel, 0) AS DOUBLE)
             |            / (ln(sh.pp + 1.0) / ln(2.0)), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS dcg
             |      FROM sh LEFT JOIN xr ON xr.qid = sh.qid AND xr.cid = sh.cid
             |      GROUP BY sh.qid),
             |ic AS (SELECT CAST(SUM(CAST(round((11.0 - j)
             |          / (ln(j + 1.0) / ln(2.0)), 6) AS DECIMAL(18,6)))
             |        AS DOUBLE) AS idcg
             |      FROM range(1, 11) t(j))
             |SELECT dc.qid, CAST(dc.n_hits AS BIGINT) AS n_hits,
             |  round(dc.dcg, 6) AS dcg, round(dc.dcg / ic.idcg, 6) AS ndcg
             |FROM dc CROSS JOIN ic ORDER BY qid""".stripMargin)),
    // Bucketed co-located join (Hive bucketing as Spark data-source
    // tables): both fact tables are written bucketed+sorted on the join
    // key into the session catalog, so the subsequent sort-merge join
    // consumes the tables' HashPartitioning directly — ZERO Exchange on
    // either join side (PlansSpec asserts it). This is THE 100 TB device
    // for a join that recurs on the same key: pay the partitioning once
    // at write time, never again at read time — at 1000 executors the
    // difference is a full 100 TB shuffle per query vs none. The write
    // happens at construction into a per-invocation temp path (the x83
    // scratch discipline); the aggregate after the join is the usual
    // one-exchange group-by with the DECIMAL sum bridge.
    QuerySpec(
      "x142_bucketed_join",
      (s, dir) => {
        val tmpPath = java.nio.file.Files.createTempDirectory("graft_bucketed")
        val tmp = tmpPath.toString
        deleteOnExit(tmp)
        // catalog names carry the per-invocation temp-dir suffix so
        // concurrent/interleaved invocations on one session can't race on
        // a shared table name (the lazily-resolved s.table below would
        // otherwise observe another invocation's overwrite)
        val uid = tmpPath.getFileName.toString
          .replaceAll("[^A-Za-z0-9]", "_").toLowerCase
        val ordersTbl = s"graft_x142_orders_b_$uid"
        val lineitemTbl = s"graft_x142_lineitem_b_$uid"
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$tmp/orders_b").mode("overwrite")
          .saveAsTable(ordersTbl)
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$tmp/lineitem_b").mode("overwrite")
          .saveAsTable(lineitemTbl)
        dropTableOnExit(s, ordersTbl)
        dropTableOnExit(s, lineitemTbl)
        val li = s.table(lineitemTbl).hint("merge")
        val o = s.table(ordersTbl)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(round(col("l_quantity"), 6).cast("decimal(18,6)"))
              .cast("double").as("q"))
          .select(col("o_orderpriority"), col("n_items"),
            round(col("q"), 6).as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o.o_orderpriority, COUNT(*) AS n_items,
             |  round(CAST(SUM(CAST(round(l.l_quantity, 6) AS DECIMAL(18,6)))
             |    AS DOUBLE), 6) AS sum_qty
             |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // Offline change-point detection — binary segmentation's first split
    // (Scott & Knott 1974; the AMOC case of ruptures-style segmentation)
    // over the daily event-count series: the day boundary that maximizes
    // the between-segment sum of squares, i.e. the single best "the
    // level changed HERE" explanation. Complements x95's online CUSUM
    // (which flags drift as it happens) with the retrospective "when did
    // it shift" read. Every candidate split is scored from integer
    // prefix sums (one bounded window over the |days|-row aggregate), so
    // both engines derive identical doubles and the argmax — resolved by
    // max(struct) with a (bss, earliest-day) tie-break — cannot diverge.
    // Scale: one corpus day-count aggregate, then |days|-bounded work.
    QuerySpec(
      "x143_changepoint",
      (s, dir) => DailySeries.changepoint(
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))),
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |p AS (SELECT day, n,
             |        SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) AS cums,
             |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k
             |      FROM d),
             |t AS (SELECT SUM(n) AS ts_, COUNT(*) AS nd FROM d),
             |c AS (SELECT day, k AS nl, t.nd - k AS nr, cums AS sl,
             |        t.ts_ - cums AS sr, CAST(t.ts_ AS DOUBLE) / t.nd AS mu
             |      FROM p CROSS JOIN t WHERE k < t.nd),
             |b AS (SELECT day, nl, nr,
             |        CAST(sl AS DOUBLE) / nl AS ml,
             |        CAST(sr AS DOUBLE) / nr AS mr, mu
             |      FROM c),
             |sc AS (SELECT day, nl, nr, ml, mr,
             |         nl * (ml - mu) * (ml - mu) + nr * (mr - mu) * (mr - mu)
             |           AS bss
             |       FROM b)
             |SELECT day AS split_day, CAST(nl AS BIGINT) AS n_days_left,
             |  CAST(nr AS BIGINT) AS n_days_right,
             |  round(ml, 6) AS mean_left, round(mr, 6) AS mean_right,
             |  round(bss, 6) AS bss
             |FROM sc ORDER BY bss DESC, day LIMIT 1""".stripMargin)),
    // Benford first-significant-digit audit (Benford 1938; Nigrini's
    // fraud-detection staple) over order totals — the data-forensics
    // gate that flags fabricated or truncated numeric columns before
    // they poison downstream stats. The digit comes from the INTEGER
    // cents string (round(price·100) stringified), never floor(log10(x))
    // — which can misbin exact powers of ten by one ulp of libm skew.
    // Expected shares are ln(1+1/d)/ln(10); the chi² contribution per
    // digit goes through round-6 + the DECIMAL bridge. Scale: one scan,
    // one 9-cell aggregate — the whole audit is a map + tiny reduce.
    QuerySpec(
      "x144_benford",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(substring(round(col("o_totalprice") * 100, 0)
            .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
        val n = o.groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = n.agg(sum(col("n_obs")).as("n_tot"))
        n.crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"),
            (col("n_obs").cast("double") / col("n_tot")).as("obs"),
            (log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
              .as("exp_"), col("n_tot"))
          .select(col("digit"), col("n_obs"),
            round(col("obs"), 6).as("obs_share"),
            round(col("exp_"), 6).as("benford_share"),
            round(
              (col("obs") - col("exp_")) * (col("obs") - col("exp_")) *
                col("n_tot") / col("exp_"), 6).as("chi2_term"))
          .orderBy("digit")
      },
      Some("""WITH o AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
             |        AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |      FROM orders),
             |n AS (SELECT digit, COUNT(*) AS n_obs FROM o GROUP BY 1),
             |t AS (SELECT SUM(n_obs) AS n_tot FROM n),
             |s AS (SELECT digit, n_obs,
             |        CAST(n_obs AS DOUBLE) / t.n_tot AS obs,
             |        ln(1.0 + 1.0 / digit) / ln(10.0) AS exp_, t.n_tot
             |      FROM n CROSS JOIN t)
             |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
             |  round(obs, 6) AS obs_share,
             |  round(exp_, 6) AS benford_share,
             |  round((obs - exp_) * (obs - exp_) * n_tot / exp_, 6)
             |    AS chi2_term
             |FROM s ORDER BY digit""".stripMargin)),
    // U-shaped (position-based) multi-touch attribution — the 40/20/40
    // industry-standard credit split (first and last touch 0.4 each,
    // middles share 0.2): each purchase's preceding 7 days of
    // clicks/views by the same user form its path, and the purchase's
    // credit is split across the path's items. Complements x80's funnel
    // (did the path convert) with WHO gets the conversion. Shape: a
    // user-keyed equi-join with a time-range predicate (the q37 range-
    // join discipline — never a cross join), per-purchase position rank
    // in a pid-partitioned window (bounded by path length), credits as
    // exact rationals rounded to 6 dp and DECIMAL-summed so partition
    // order can't move the hash; top-20 is a TakeOrdered, not a global
    // sort.
    QuerySpec(
      "x145_attribution",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        val touches = ev
          .filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("ts").as("tts"),
            col("event_id").as("tid"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("item"))
          // item-less touches (props without '$.k') carry no attributable
          // entity AND would form a NULL credit group whose tie-break
          // position differs per engine (Spark sorts NULLs first on ASC,
          // DuckDB last) — exclude them from the path outright
          .filter(col("item").isNotNull)
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"),
            col("event_id").as("pid"))
        val pairs = purch.join(touches, Seq("user_id"))
          .filter(col("tts") < col("pts") &&
            col("tts") >= col("pts") - expr("INTERVAL 7 DAYS"))
        val wp = W.partitionBy("pid")
        val ranked = pairs
          .withColumn("k", row_number().over(wp.orderBy(col("tts"), col("tid")))
            .cast("long"))
          .withColumn("n", count(lit(1)).over(wp))
        val credited = ranked.withColumn("credit",
          when(col("n") === 1, 1.0)
            .when(col("n") === 2, 0.5)
            .when(col("k") === 1 || col("k") === col("n"), 0.4)
            .otherwise(lit(0.2) / (col("n") - 2)))
        credited.groupBy("item")
          .agg(count(lit(1)).as("n_touches"),
            countDistinct(col("pid")).as("n_purchases"),
            sum(round(col("credit"), 6).cast("decimal(18,6)"))
              .cast("double").as("c"))
          .select(col("item"), col("n_touches"), col("n_purchases"),
            round(col("c"), 6).as("credit"))
          .orderBy(col("credit").desc, col("item")).limit(20)
      },
      Some("""WITH t AS (SELECT user_id, ts AS tts, event_id AS tid,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS item
             |      FROM events WHERE event_type IN ('click', 'view')
             |        AND json_extract_string(props, '$.k') IS NOT NULL),
             |p AS (SELECT user_id, ts AS pts, event_id AS pid
             |      FROM events WHERE event_type = 'purchase'),
             |pr AS (SELECT p.pid, t.tts, t.tid, t.item
             |       FROM p JOIN t ON t.user_id = p.user_id
             |         AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY),
             |r AS (SELECT pid, item,
             |        CAST(row_number() OVER (PARTITION BY pid
             |          ORDER BY tts, tid) AS BIGINT) AS k,
             |        COUNT(*) OVER (PARTITION BY pid) AS n
             |      FROM pr),
             |c AS (SELECT pid, item,
             |        CASE WHEN n = 1 THEN 1.0
             |             WHEN n = 2 THEN 0.5
             |             WHEN k = 1 OR k = n THEN 0.4
             |             ELSE 0.2 / (n - 2) END AS credit
             |      FROM r)
             |SELECT item, COUNT(*) AS n_touches,
             |  COUNT(DISTINCT pid) AS n_purchases,
             |  round(CAST(SUM(CAST(round(credit, 6) AS DECIMAL(18,6)))
             |    AS DOUBLE), 6) AS credit
             |FROM c GROUP BY item
             |ORDER BY credit DESC, item LIMIT 20""".stripMargin)),
    // Seasonal-naive forecast eval with MASE (Hyndman & Koehler 2006 —
    // the scale-free forecast-accuracy standard): hold out the last 14
    // days, forecast each as "same weekday last week", and price the
    // holdout MAE against the TRAINING seasonal-naive MAE (the MASE
    // denominator). MASE < 1 ⇒ beating the naive baseline — the
    // go/no-go gate for promoting any fancier model (x122's Holt).
    // Everything derives from the |days|-row count aggregate: the lag
    // is a self equi-join on day = day−7 (never a window over the
    // corpus), errors are integer |diffs|, means are exact-integer
    // sums ÷ counts. Scale: one corpus aggregate, then |days| work.
    QuerySpec(
      "x146_mase_forecast",
      (s, dir) => DailySeries.maseForecast(
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()),
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |cut AS (SELECT max(day) - 14 AS cut FROM d),
             |lag AS (SELECT a.day, abs(a.n - b.n) AS ae,
             |          a.day > cut.cut AS is_test
             |        FROM d a JOIN d b ON a.day = b.day + 7 CROSS JOIN cut),
             |m AS (SELECT
             |        SUM(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS n_train,
             |        SUM(CASE WHEN is_test THEN 1 ELSE 0 END) AS n_test,
             |        SUM(CASE WHEN NOT is_test THEN ae ELSE 0 END) AS sa_train,
             |        SUM(CASE WHEN is_test THEN ae ELSE 0 END) AS sa_test
             |      FROM lag)
             |SELECT CAST(n_train AS BIGINT) AS n_train,
             |  CAST(n_test AS BIGINT) AS n_test,
             |  CASE WHEN n_train = 0 THEN NULL
             |       ELSE round(CAST(sa_train AS DOUBLE) / n_train, 6)
             |  END AS naive_mae_train,
             |  CASE WHEN n_test = 0 THEN NULL
             |       ELSE round(CAST(sa_test AS DOUBLE) / n_test, 6)
             |  END AS mae_test,
             |  CASE WHEN n_train = 0 OR n_test = 0 OR sa_train = 0 THEN NULL
             |       ELSE round((CAST(sa_test AS DOUBLE) / n_test) /
             |            (CAST(sa_train AS DOUBLE) / n_train), 6)
             |  END AS mase
             |FROM m ORDER BY n_train""".stripMargin)),
    // Histogram-approximated Gini coefficient (Lorenz 1905 / Gini 1912,
    // grouped-data trapezoid form) of per-user purchase revenue — the
    // concentration audit behind "does 1% of users carry the corpus",
    // the revenue twin of x81's key-skew read. The EXACT Gini needs a
    // global sort of all users (a corpus-scale window — Rule 1's
    // scale-killer); the at-scale estimator bins users into 100
    // revenue-range buckets and integrates the Lorenz curve over the
    // bucket aggregate — the standard grouped-data approximation, error
    // O(1/B). Per-user revenue and per-bucket mass go through the
    // DECIMAL bridge so every downstream double derives from exact
    // sums; the trapezoid sum itself is 100 rounded terms DECIMAL-
    // summed. Scale: one user-keyed aggregate, one 100-row reduce.
    QuerySpec(
      "x147_gini_revenue",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(round(col("value"), 6).cast("decimal(18,6)"))
            .cast("double").as("rev"))
          .localCheckpoint() // one corpus scan feeds both ext and the binning
        val ext = u.agg(min(col("rev")).as("rmin"), max(col("rev")).as("rmax"))
        val b = u.crossJoin(broadcast(ext))
          .select(when(col("rmax") === col("rmin"), 0L)
            .otherwise(least(floor((col("rev") - col("rmin")) /
                (col("rmax") - col("rmin")) * 100).cast("long"), lit(99L)))
            .as("bucket"), col("rev"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("rev"), 6).cast("decimal(18,6)"))
              .cast("double").as("brev"))
        val wc = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
        val p = b.withColumn("cumrev", sum(col("brev")).over(wc))
        val tot = b.agg(sum(col("cnt")).as("nu"),
          sum(round(col("brev"), 6).cast("decimal(18,6)"))
            .cast("double").as("tr"))
        val terms = p.crossJoin(broadcast(tot))
          .select(col("nu"), col("tr"),
            round(col("cnt") * (lit(2.0) * col("cumrev") - col("brev")), 6)
              .cast("decimal(18,6)").as("term"))
        terms.groupBy("nu", "tr")
          .agg(sum(col("term")).cast("double").as("s"))
          .select(col("nu").as("n_users"), round(col("tr"), 6).as("total_rev"),
            round(lit(1.0) - col("s") / (col("nu") * col("tr")), 6)
              .as("gini"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS rev
             |      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
             |ext AS (SELECT MIN(rev) AS rmin, MAX(rev) AS rmax FROM u),
             |b AS (SELECT CASE WHEN ext.rmax = ext.rmin THEN 0
             |        ELSE LEAST(CAST(FLOOR((rev - ext.rmin) /
             |          (ext.rmax - ext.rmin) * 100) AS BIGINT), 99) END
             |        AS bucket, rev
             |      FROM u CROSS JOIN ext),
             |h AS (SELECT bucket, COUNT(*) AS cnt,
             |        CAST(SUM(CAST(round(rev, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS brev
             |      FROM b GROUP BY 1),
             |p AS (SELECT bucket, cnt, brev,
             |        SUM(brev) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) AS cumrev
             |      FROM h),
             |t AS (SELECT SUM(cnt) AS nu,
             |        CAST(SUM(CAST(round(brev, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS tr FROM h),
             |s AS (SELECT t.nu, t.tr,
             |        CAST(SUM(CAST(round(cnt * (2.0 * cumrev - brev), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS s
             |      FROM p CROSS JOIN t GROUP BY t.nu, t.tr)
             |SELECT CAST(nu AS BIGINT) AS n_users, round(tr, 6) AS total_rev,
             |  round(1.0 - s / (nu * tr), 6) AS gini
             |FROM s ORDER BY n_users""".stripMargin)),
    // A/B power analysis (Cohen 1988 closed forms): the PLANNING read
    // completing the x133 (Welch+SRM) / x125 (CUPED) / x129 (KS) /
    // x135 (Mann-Whitney) suite — given the observed variance, the
    // minimum detectable effect at α=0.05 / 80% power
    // ((z_{α/2}+z_β)·√(v_a/n_a + v_b/n_b), z = 1.96 + 0.8416), and the
    // per-arm n required to detect a 1% relative lift. Pure closed-form
    // arithmetic on the same exact integer moments as x133 — one
    // user-keyed aggregate and a 1-row reduce; every double derives
    // from integer sums so cross-engine equality is exact.
    QuerySpec(
      "x148_ab_power",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
          .select((col("user_id") % 2).as("variant"), col("y"))
        u.agg(
            sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"),
            sum(when(col("variant") === 0, col("y")).otherwise(0L)).as("sa"),
            sum(when(col("variant") === 0, col("y") * col("y")).otherwise(0L))
              .as("ssa"),
            sum(when(col("variant") === 1, col("y")).otherwise(0L)).as("sb"),
            sum(when(col("variant") === 1, col("y") * col("y")).otherwise(0L))
              .as("ssb"))
          .select(col("na"), col("nb"),
            (col("sa").cast("double") / col("na")).as("ma"),
            expr("CAST(ssa * na - sa * sa AS DOUBLE) / (CAST(na AS DOUBLE) * (na - 1))").as("va"),
            expr("CAST(ssb * nb - sb * sb AS DOUBLE) / (CAST(nb AS DOUBLE) * (nb - 1))").as("vb"))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            round(col("ma"), 6).as("mean_a"),
            round(lit(2.8016) * sqrt(col("va") / col("na") +
              col("vb") / col("nb")), 6).as("mde_abs"),
            round(lit(2.8016) * sqrt(col("va") / col("na") +
              col("vb") / col("nb")) / col("ma"), 6).as("mde_rel"),
            round(lit(2.8016) * lit(2.8016) * (col("va") + col("vb")) /
              (lit(0.01) * col("ma") * lit(0.01) * col("ma")), 6)
              .as("n_per_arm_1pct"))
          .orderBy("n_a")
      },
      Some("""WITH u AS (SELECT user_id % 2 AS variant,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |      FROM events GROUP BY user_id),
             |m AS (SELECT
             |        SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
             |        SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
             |        SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS sa,
             |        SUM(CASE WHEN variant = 0 THEN y * y ELSE 0 END) AS ssa,
             |        SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS sb,
             |        SUM(CASE WHEN variant = 1 THEN y * y ELSE 0 END) AS ssb
             |      FROM u),
             |v AS (SELECT na, nb, CAST(sa AS DOUBLE) / na AS ma,
             |        CAST(ssa * na - sa * sa AS DOUBLE)
             |          / (CAST(na AS DOUBLE) * (na - 1)) AS va,
             |        CAST(ssb * nb - sb * sb AS DOUBLE)
             |          / (CAST(nb AS DOUBLE) * (nb - 1)) AS vb
             |      FROM m)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  round(ma, 6) AS mean_a,
             |  round(2.8016 * sqrt(va / na + vb / nb), 6) AS mde_abs,
             |  round(2.8016 * sqrt(va / na + vb / nb) / ma, 6) AS mde_rel,
             |  round(2.8016 * 2.8016 * (va + vb) /
             |    (0.01 * ma * 0.01 * ma), 6) AS n_per_arm_1pct
             |FROM v ORDER BY n_a""".stripMargin)),
    // Out-of-fold target encoding (the CatBoost/Kaggle mean-encoding
    // discipline, Micci-Barreca 2001 smoothing): encode the categorical
    // `item` by its purchase rate computed with the example's OWN fold
    // HELD OUT — enc(item, fold) = (Σ_item − Σ_fold + α·prior) /
    // (n_item − n_fold + α) — the leakage-safe form (naive target
    // encoding leaks the label through its own row; the x88 discipline
    // applied to features). Everything reduces to integer (item) and
    // (item, fold) count/sum aggregates joined on slim keys; the global
    // prior broadcasts as one row. Scale: two aggregates over one scan,
    // |items|·5 output cells, no windows, no corpus-size joins.
    QuerySpec(
      "x149_target_encoding",
      (s, dir) => {
        val alpha = 10.0
        val ev = Tables.events(s, dir)
          .select(expr("variant_get(parse_json(props), '$.k', 'int')")
            .as("item"), (col("user_id") % 5).as("fold"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        // ONE corpus scan + JSON parse: byItem and prior are exact
        // rollups of the checkpointed |items|·5-row fold aggregate
        val byFold = ev.groupBy("item", "fold")
          .agg(count(lit(1)).as("nf"), sum(col("y")).as("sf"))
          .localCheckpoint()
        val byItem = byFold.groupBy("item")
          .agg(sum(col("nf")).as("ni"), sum(col("sf")).as("si"))
        val prior = byFold.agg((sum(col("sf")).cast("double") /
          sum(col("nf"))).as("prior"))
        byFold.join(byItem, "item").crossJoin(broadcast(prior))
          .select(col("item"), col("fold"), col("nf").as("n_rows"),
            round(((col("si") - col("sf")).cast("double") +
                lit(alpha) * col("prior")) /
              ((col("ni") - col("nf")).cast("double") + lit(alpha)), 6)
              .as("enc"))
          .orderBy("item", "fold")
      },
      Some("""WITH ev AS (SELECT
             |        CAST(json_extract_string(props, '$.k') AS INT) AS item,
             |        user_id % 5 AS fold,
             |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             |      FROM events),
             |bi AS (SELECT item, COUNT(*) AS ni, SUM(y) AS si
             |       FROM ev GROUP BY 1),
             |bf AS (SELECT item, fold, COUNT(*) AS nf, SUM(y) AS sf
             |       FROM ev GROUP BY 1, 2),
             |pr AS (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS prior FROM ev)
             |SELECT bf.item AS item, CAST(bf.fold AS BIGINT) AS fold,
             |  CAST(bf.nf AS BIGINT) AS n_rows,
             |  round((CAST(bi.si - bf.sf AS DOUBLE) + 10.0 * pr.prior) /
             |        (CAST(bi.ni - bf.nf AS DOUBLE) + 10.0), 6) AS enc
             |FROM bf JOIN bi ON bi.item = bf.item CROSS JOIN pr
             |ORDER BY item, fold""".stripMargin)),
    // Decision-stump training (CART's single split, Breiman et al. 1984;
    // the weak learner under every boosted tree): the click-count
    // threshold that best separates purchasers by Gini impurity
    // reduction. Candidate thresholds are the |distinct click-count|
    // grid (bounded by the max per-user count, not the corpus);
    // left/right class counts come from integer prefix sums over that
    // aggregate (Rule-1-safe window), so the impurity gain is a
    // deterministic double from exact integers and the argmax —
    // max(struct) with a smallest-threshold tie-break — cannot diverge
    // cross-engine. Complements x121 (logreg = linear) with the tree
    // side of the classical pair. Scale: one user-keyed aggregate, then
    // |distinct x| work.
    QuerySpec(
      "x150_stump_train",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        val g = u.groupBy("x")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
        val wc = W.orderBy("x").rowsBetween(W.unboundedPreceding, 0)
        // window rides INSIDE the checkpoint (x128 discipline) so the one
        // corpus scan feeds both the prefix sums and the totals
        val pre = g.withColumn("cn", sum(col("n")).over(wc))
          .withColumn("cp", sum(col("p")).over(wc))
          .localCheckpoint()
        val tot = pre.agg(sum(col("n")).as("tn"), sum(col("p")).as("tp"))
        val scored = pre.crossJoin(broadcast(tot))
          .filter(col("cn") < col("tn"))
          .select(col("x"), col("cn"), col("cp"), col("tn"), col("tp"),
            (col("tn") - col("cn")).as("rn"), (col("tp") - col("cp")).as("rp"))
          .select(col("x"), col("cn"), col("rn"),
            (col("cp").cast("double") / col("cn")).as("rl"),
            (col("rp").cast("double") / col("rn")).as("rr"),
            col("tn"), col("tp"))
          .select(col("x"), col("cn"), col("rn"), col("rl"), col("rr"),
            ((lit(1.0) - (col("tp").cast("double") / col("tn")) *
                (col("tp").cast("double") / col("tn")) -
              (lit(1.0) - col("tp").cast("double") / col("tn")) *
                (lit(1.0) - col("tp").cast("double") / col("tn"))) -
              (col("cn").cast("double") / col("tn")) *
                (lit(1.0) - col("rl") * col("rl") -
                  (lit(1.0) - col("rl")) * (lit(1.0) - col("rl"))) -
              (col("rn").cast("double") / col("tn")) *
                (lit(1.0) - col("rr") * col("rr") -
                  (lit(1.0) - col("rr")) * (lit(1.0) - col("rr"))))
              .as("gain"))
        scored.agg(max(struct(col("gain"), (-col("x")).as("nx"), col("cn"),
            col("rn"), col("rl"), col("rr"))).as("m"))
          // agg-on-empty parity with the oracle's LIMIT 1 (all users at
          // one distinct click-count leaves no candidate split)
          .filter(col("m.nx").isNotNull)
          .select((-col("m.nx")).as("split_le"),
            col("m.cn").as("n_left"), col("m.rn").as("n_right"),
            round(col("m.rl"), 6).as("rate_left"),
            round(col("m.rr"), 6).as("rate_right"),
            round(col("m.gain"), 6).as("gini_gain"))
          .orderBy("split_le")
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             |        MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |      FROM events GROUP BY user_id),
             |g AS (SELECT x, COUNT(*) AS n, SUM(y) AS p FROM u GROUP BY 1),
             |pre AS (SELECT x, n, p,
             |          SUM(n) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
             |            PRECEDING AND CURRENT ROW) AS cn,
             |          SUM(p) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
             |            PRECEDING AND CURRENT ROW) AS cp
             |        FROM g),
             |t AS (SELECT SUM(n) AS tn, SUM(p) AS tp FROM g),
             |sc AS (SELECT x, cn, cp, t.tn, t.tp, t.tn - cn AS rn,
             |         t.tp - cp AS rp
             |       FROM pre CROSS JOIN t WHERE cn < t.tn),
             |r AS (SELECT x, cn, rn,
             |        CAST(cp AS DOUBLE) / cn AS rl,
             |        CAST(rp AS DOUBLE) / rn AS rr, tn, tp
             |      FROM sc),
             |sd AS (SELECT x, cn, rn, rl, rr,
             |         (1.0 - (CAST(tp AS DOUBLE) / tn) * (CAST(tp AS DOUBLE) / tn)
             |            - (1.0 - CAST(tp AS DOUBLE) / tn) * (1.0 - CAST(tp AS DOUBLE) / tn))
             |         - (CAST(cn AS DOUBLE) / tn) *
             |             (1.0 - rl * rl - (1.0 - rl) * (1.0 - rl))
             |         - (CAST(rn AS DOUBLE) / tn) *
             |             (1.0 - rr * rr - (1.0 - rr) * (1.0 - rr)) AS gain
             |       FROM r)
             |SELECT CAST(x AS BIGINT) AS split_le, CAST(cn AS BIGINT) AS n_left,
             |  CAST(rn AS BIGINT) AS n_right,
             |  round(rl, 6) AS rate_left, round(rr, 6) AS rate_right,
             |  round(gain, 6) AS gini_gain
             |FROM sd ORDER BY gain DESC, x LIMIT 1""".stripMargin)),
    // Mutual-information feature ranking (Cover & Thomas; the filter-
    // method feature selector): MI between each bucketed behavioral
    // feature (clicks, views, errors per user, binned 0/1/2/3+) and the
    // purchased label, from exact integer contingency counts — the
    // feature-selection read before training x121's logreg or x150's
    // stump. Each feature's MI sums ≤8 cell terms (p·ln(p/(px·py)))
    // rounded to 6 dp through the DECIMAL bridge; contingency tables are
    // map-side-combined aggregates over one scan (stack unpivots the
    // per-user row into (feature, bin) pairs row-locally). Scale: one
    // user-keyed aggregate, 3·4·2 bounded cells.
    QuerySpec(
      "x151_feature_mi",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("views"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("errors"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        val binned = u.select(col("y"), expr(
          """stack(3,
            |  'clicks', least(clicks, 3L),
            |  'views',  least(views, 3L),
            |  'errors', least(errors, 3L)) AS (feature, bin)
            |""".stripMargin))
        val cells = binned.groupBy("feature", "bin", "y")
          .agg(count(lit(1)).as("nxy"))
        val nx = cells.groupBy("feature", "bin").agg(sum("nxy").as("nx"))
        val ny = cells.groupBy("feature", "y").agg(sum("nxy").as("ny"))
        val nn = cells.groupBy("feature").agg(sum("nxy").as("nn"))
        cells.join(nx, Seq("feature", "bin")).join(ny, Seq("feature", "y"))
          .join(nn, "feature")
          .select(col("feature"),
            round((col("nxy").cast("double") / col("nn")) *
              log((col("nxy").cast("double") * col("nn")) /
                (col("nx").cast("double") * col("ny"))), 6)
              .cast("decimal(18,6)").as("term"))
          .groupBy("feature")
          .agg(count(lit(1)).as("n_cells"),
            sum(col("term")).cast("double").as("mi"))
          .select(col("feature"), col("n_cells"), round(col("mi"), 6).as("mi"))
          .orderBy(col("mi").desc, col("feature"))
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
             |        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
             |        SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors,
             |        MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |      FROM events GROUP BY user_id),
             |b AS (SELECT y, 'clicks' AS feature, LEAST(clicks, 3) AS bin FROM u
             |      UNION ALL
             |      SELECT y, 'views', LEAST(views, 3) FROM u
             |      UNION ALL
             |      SELECT y, 'errors', LEAST(errors, 3) FROM u),
             |c AS (SELECT feature, bin, y, COUNT(*) AS nxy
             |      FROM b GROUP BY 1, 2, 3),
             |nx AS (SELECT feature, bin, SUM(nxy) AS nx FROM c GROUP BY 1, 2),
             |ny AS (SELECT feature, y, SUM(nxy) AS ny FROM c GROUP BY 1, 2),
             |nn AS (SELECT feature, SUM(nxy) AS nn FROM c GROUP BY 1),
             |t AS (SELECT c.feature,
             |        CAST(round((CAST(c.nxy AS DOUBLE) / nn.nn) *
             |          ln((CAST(c.nxy AS DOUBLE) * nn.nn) /
             |             (CAST(nx.nx AS DOUBLE) * ny.ny)), 6)
             |          AS DECIMAL(18,6)) AS term
             |      FROM c JOIN nx ON nx.feature = c.feature AND nx.bin = c.bin
             |        JOIN ny ON ny.feature = c.feature AND ny.y = c.y
             |        JOIN nn ON nn.feature = c.feature)
             |SELECT feature, COUNT(*) AS n_cells,
             |  round(CAST(SUM(term) AS DOUBLE), 6) AS mi
             |FROM t GROUP BY feature
             |ORDER BY mi DESC, feature""".stripMargin)),
    // Join-cardinality estimation audit (Selinger et al. 1979 — the
    // System R containment assumption every cost-based optimizer still
    // ships): |R ⋈ S| ≈ |R|·|S| / max(ndv_R, ndv_S) vs the exact
    // Σ_k n_R(k)·n_S(k) truth, on orders ⋈ customer. Quantifies WHY the
    // estimator misses under skew — the diagnosis behind x81's skew
    // audit and the AQE skew-join fallback: at 100 TB a 10× cardinality
    // miss is the difference between a broadcast plan and an OOM. All
    // counts/NDVs are exact integer aggregates on slim key columns; the
    // exact truth is a key-grouped count join, never a materialized
    // row-level join. One row out.
    QuerySpec(
      "x152_join_cardinality",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_custkey").as("k"))
        val c = Tables.customer(s, dir).select(col("c_custkey").as("k"))
        val om = o.agg(count(lit(1)).as("n_o"),
          countDistinct(col("k")).as("ndv_o"))
        val cm = c.agg(count(lit(1)).as("n_c"),
          countDistinct(col("k")).as("ndv_c"))
        val actual = o.groupBy("k").agg(count(lit(1)).as("no"))
          .join(c.groupBy("k").agg(count(lit(1)).as("nc")), "k")
          .agg(sum(col("no") * col("nc")).as("actual"))
        om.crossJoin(broadcast(cm)).crossJoin(broadcast(actual))
          .select(col("n_o"), col("n_c"), col("ndv_o"), col("ndv_c"),
            // n_o·n_c in DOUBLE: at the fact cardinalities this estimator
            // exists for, a long-by-long multiply wraps past 2^63 (DuckDB
            // would promote to HUGEINT and diverge) — System-R estimates
            // are floating-point quantities anyway
            (col("n_o").cast("double") * col("n_c") /
              greatest(col("ndv_o"), col("ndv_c"))).as("est"),
            col("actual"))
          .select(col("n_o"), col("n_c"), col("ndv_o"), col("ndv_c"),
            round(col("est"), 6).as("est_systemr"), col("actual"),
            round(col("est") / col("actual"), 6).as("est_over_actual"))
          .orderBy("n_o")
      },
      Some("""WITH om AS (SELECT COUNT(*) AS n_o,
             |        COUNT(DISTINCT o_custkey) AS ndv_o FROM orders),
             |cm AS (SELECT COUNT(*) AS n_c,
             |        COUNT(DISTINCT c_custkey) AS ndv_c FROM customer),
             |a AS (SELECT SUM(og.no * cg.nc) AS actual FROM
             |        (SELECT o_custkey AS k, COUNT(*) AS no
             |         FROM orders GROUP BY 1) og
             |      JOIN (SELECT c_custkey AS k, COUNT(*) AS nc
             |            FROM customer GROUP BY 1) cg ON cg.k = og.k)
             |SELECT CAST(om.n_o AS BIGINT) AS n_o, CAST(cm.n_c AS BIGINT) AS n_c,
             |  CAST(om.ndv_o AS BIGINT) AS ndv_o,
             |  CAST(cm.ndv_c AS BIGINT) AS ndv_c,
             |  round(CAST(om.n_o AS DOUBLE) * cm.n_c
             |    / GREATEST(om.ndv_o, cm.ndv_c), 6) AS est_systemr,
             |  CAST(a.actual AS BIGINT) AS actual,
             |  round((CAST(om.n_o AS DOUBLE) * cm.n_c
             |    / GREATEST(om.ndv_o, cm.ndv_c)) / a.actual, 6)
             |    AS est_over_actual
             |FROM om CROSS JOIN cm CROSS JOIN a ORDER BY n_o""".stripMargin)),
    // Parquet schema evolution via mergeSchema — the lake-mechanics
    // reality every long-lived 100 TB table hits: an old snapshot
    // written WITHOUT a column and a new snapshot WITH it must read back
    // as one table (old rows null-filled), and downstream aggregates
    // must stay null-correct. The op writes both snapshot vintages to a
    // per-invocation scratch root (x83 discipline), reads them unioned
    // with `mergeSchema=true`, and reports per-type completeness of the
    // late-added column + its null-skipping sum — the audit that catches
    // "the new column silently reads as all-null". The oracle replays
    // the vintage split from the source table (value visible iff the row
    // is in the post-cut vintage), so a hash match proves the merged
    // read equals the logical union. The 1-row cut collect is k-sized
    // by construction; snapshots partition on the date predicate only.
    QuerySpec(
      "x153_schema_evolution",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_schema_evo").toString
        deleteOnExit(tmp)
        val ev = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("event_type"), col("value"))
        val cut = ev.agg(date_sub(max(col("day")), 30)).head.getDate(0)
        ev.filter(col("day") < lit(cut))
          .select(col("user_id"), col("day"), col("event_type"))
          .write.mode("overwrite").parquet(s"$tmp/snap_v1")
        ev.filter(col("day") >= lit(cut))
          .write.mode("overwrite").parquet(s"$tmp/snap_v2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$tmp/snap_v1", s"$tmp/snap_v2")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            count(col("value")).as("n_with_value"),
            sum(round(col("value"), 6).cast("decimal(18,6)"))
              .cast("double").as("v"))
          .select(col("event_type"), col("n_rows"), col("n_with_value"),
            round(col("n_with_value").cast("double") / col("n_rows"), 6)
              .as("completeness"),
            round(col("v"), 6).as("value_sum"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
             |        event_type, value FROM events),
             |cut AS (SELECT MAX(day) - 30 AS cut FROM ev),
             |m AS (SELECT event_type,
             |        CASE WHEN day >= cut.cut THEN value ELSE NULL END AS value
             |      FROM ev CROSS JOIN cut)
             |SELECT event_type, COUNT(*) AS n_rows,
             |  COUNT(value) AS n_with_value,
             |  round(CAST(COUNT(value) AS DOUBLE) / COUNT(*), 6)
             |    AS completeness,
             |  round(CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6)))
             |    AS DOUBLE), 6) AS value_sum
             |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin)),
    // Partitioned write + static partition pruning — the other half of
    // the x142 pay-at-write-time story and the single biggest scan
    // saver on a date-partitioned 100 TB lake: events land partitioned
    // by month (dynamic partition overwrite is the idempotent-ingest
    // mode the streams already use), and a month-filtered read must
    // prune to ONE directory — PartitionFilters, not row filters
    // (PlansSpec asserts the scan's partitionFilters are non-empty and
    // pushdown happens at the DIRECTORY level). The filter month is
    // collected from the source (k-sized) and planted as a literal so
    // pruning is static, no DPP needed. Oracle replays the same month
    // predicate over the source table.
    QuerySpec(
      "x154_partition_pruning",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_part_prune").toString
        deleteOnExit(tmp)
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"), col("value"),
            (year(to_date(col("ts"))) * 100 + month(to_date(col("ts"))))
              .cast("long").as("mth"))
        ev.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("mth").parquet(tmp)
        val mSel = ev.agg(max(col("mth"))).head.getLong(0)
        s.read.parquet(tmp)
          .filter(col("mth") === mSel)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sum(round(col("value"), 6).cast("decimal(18,6)"))
              .cast("double").as("v"))
          .select(col("event_type"), col("n_events"), col("n_users"),
            round(col("v"), 6).as("value_sum"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, value,
             |        CAST(year(CAST(ts AS DATE)) * 100 +
             |             month(CAST(ts AS DATE)) AS BIGINT) AS mth
             |      FROM events),
             |sel AS (SELECT MAX(mth) AS m FROM ev)
             |SELECT event_type, COUNT(*) AS n_events,
             |  COUNT(DISTINCT user_id) AS n_users,
             |  round(CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6)))
             |    AS DOUBLE), 6) AS value_sum
             |FROM ev CROSS JOIN sel WHERE ev.mth = sel.m
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),
    // Quantile fitting by pinball-loss grid argmin (Koenker & Bassett
    // 1978's check loss; the objective every quantile-regression and
    // GBM-quantile fit minimizes): q10/q50/q90 of per-user purchase
    // revenue fit by scoring a bounded 100-point candidate grid — the
    // OPTIMIZATION view of quantiles, vs q36/x137's order-statistic
    // view, and the device that generalizes to conditional quantiles
    // where sorting can't. Shape is the x137 map-side fan-out: |users|
    // slim rows × (100 candidates · 3 τ) broadcast, partial-aggregated
    // into 300 cells; loss terms round-6 + DECIMAL bridge so add order
    // can't move the argmin; ties resolve to the smallest candidate via
    // min(struct). The exact percentile rides along for the fit-error
    // read. Scale: one user-keyed aggregate, one 300-cell reduce.
    QuerySpec(
      "x156_pinball_quantiles",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(round(col("value"), 6).cast("decimal(18,6)"))
            .cast("double").as("rev"))
          .localCheckpoint()
        val ext = u.agg(min(col("rev")).as("rmin"), max(col("rev")).as("rmax"))
        val grid = s.range(0, 100).select(col("id").as("i"))
          .crossJoin(broadcast(ext))
          .select((col("rmin") + (col("i") + 0.5) *
            (col("rmax") - col("rmin")) / 100.0).as("c"))
        val taus = s.range(0, 3)
          .select((element_at(array(lit(0.1), lit(0.5), lit(0.9)),
            col("id").cast("int") + 1)).as("tau"))
        val loss = u.crossJoin(broadcast(grid.crossJoin(taus)))
          .select(col("tau"), col("c"),
            round(greatest(col("tau") * (col("rev") - col("c")),
              (col("tau") - 1.0) * (col("rev") - col("c"))), 6)
              .cast("decimal(18,6)").as("term"))
          .groupBy("tau", "c")
          .agg(sum(col("term")).cast("double").as("loss"))
        val best = loss.groupBy("tau")
          .agg(min(struct(col("loss"), col("c"))).as("m"))
        val exact = u.agg(
          expr("percentile(rev, 0.1)").as("p10"),
          expr("percentile(rev, 0.5)").as("p50"),
          expr("percentile(rev, 0.9)").as("p90"))
        best.crossJoin(broadcast(exact))
          .select(col("tau"), round(col("m.c"), 6).as("q_fit"),
            round(col("m.loss"), 6).as("pinball_loss"),
            round(when(col("tau") === 0.1, col("p10"))
              .when(col("tau") === 0.5, col("p50"))
              .otherwise(col("p90")), 6).as("q_exact"))
          .orderBy("tau")
      },
      Some("""WITH u AS (SELECT user_id,
             |        CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS rev
             |      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
             |ext AS (SELECT MIN(rev) AS rmin, MAX(rev) AS rmax FROM u),
             |grid AS (SELECT ext.rmin + (t.i + 0.5) * (ext.rmax - ext.rmin)
             |           / 100.0 AS c
             |         FROM range(0, 100) t(i) CROSS JOIN ext),
             |taus AS (SELECT unnest([0.1, 0.5, 0.9]) AS tau),
             |l AS (SELECT taus.tau, grid.c,
             |        CAST(SUM(CAST(round(GREATEST(
             |            taus.tau * (u.rev - grid.c),
             |            (taus.tau - 1.0) * (u.rev - grid.c)), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS loss
             |      FROM u CROSS JOIN grid CROSS JOIN taus
             |      GROUP BY 1, 2),
             |b AS (SELECT tau, c, loss,
             |        row_number() OVER (PARTITION BY tau ORDER BY loss, c)
             |          AS rn
             |      FROM l),
             |ex AS (SELECT quantile_cont(rev, 0.1) AS p10,
             |         quantile_cont(rev, 0.5) AS p50,
             |         quantile_cont(rev, 0.9) AS p90 FROM u)
             |SELECT tau, round(c, 6) AS q_fit, round(loss, 6) AS pinball_loss,
             |  round(CASE WHEN tau = 0.1 THEN ex.p10
             |        WHEN tau = 0.5 THEN ex.p50 ELSE ex.p90 END, 6) AS q_exact
             |FROM b CROSS JOIN ex WHERE rn = 1 ORDER BY tau""".stripMargin)),
    // One-way ANOVA (Fisher 1925) across a 3-arm split of per-user
    // purchase counts — the >2-group generalization the pairwise suite
    // (x133 Welch, x129 KS, x135 Mann-Whitney) can't cover: SSB/SSW
    // from exact integer group moments (n, Σy, Σy² — the x133
    // discipline, variance via n·Σy²−(Σy)² so add order can't move
    // anything), F = (SSB/df_b)/(SSW/df_w). One user-keyed aggregate,
    // one 3-cell reduce, one 1-row expression — nothing corpus-wide
    // past the first groupBy.
    QuerySpec(
      "x157_anova",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
          .select((col("user_id") % 3).as("arm"), col("y"))
        val g = u.groupBy("arm")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("ssy"))
        g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
            sum(col("sy")).as("ts"),
            // SSB = Σ s_g²/n_g − (Σs)²/N ; SSW = Σ ssy − Σ s_g²/n_g.
            // Per-arm sy²/n terms go through the round-6 DECIMAL bridge
            // (as x151/x158) so the 3-row sum is add-order-free — raw
            // double addition could differ by an ulp across partitions
            // and flip the 6-dp rounding boundary of ssb/ssw/f_stat.
            sum(round(col("sy").cast("double") * col("sy") / col("n"), 6)
              .cast("decimal(18,6)")).cast("double").as("sb2"),
            sum(col("ssy")).as("tss"))
          .select(col("k"), col("nn").as("n_users"),
            (col("sb2") - col("ts").cast("double") * col("ts") / col("nn"))
              .as("ssb"),
            (col("tss").cast("double") - col("sb2")).as("ssw"),
            (col("k") - 1).as("df_b"), (col("nn") - col("k")).as("df_w"))
          .select(col("k"), col("n_users"), round(col("ssb"), 6).as("ssb"),
            round(col("ssw"), 6).as("ssw"), col("df_b"), col("df_w"),
            round((col("ssb") / col("df_b")) / (col("ssw") / col("df_w")), 6)
              .as("f_stat"))
          .orderBy("k")
      },
      Some("""WITH u AS (SELECT user_id % 3 AS arm,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
             |      FROM events GROUP BY user_id),
             |g AS (SELECT arm, COUNT(*) AS n, SUM(y) AS sy,
             |        SUM(y * y) AS ssy
             |      FROM u GROUP BY 1),
             |m AS (SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(sy) AS ts,
             |        CAST(SUM(CAST(round(CAST(sy AS DOUBLE) * sy / n, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS sb2,
             |        SUM(ssy) AS tss
             |      FROM g),
             |v AS (SELECT k, nn,
             |        sb2 - CAST(ts AS DOUBLE) * ts / nn AS ssb,
             |        CAST(tss AS DOUBLE) - sb2 AS ssw,
             |        k - 1 AS df_b, nn - k AS df_w
             |      FROM m)
             |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n_users,
             |  round(ssb, 6) AS ssb, round(ssw, 6) AS ssw,
             |  CAST(df_b AS BIGINT) AS df_b, CAST(df_w AS BIGINT) AS df_w,
             |  round((ssb / df_b) / (ssw / df_w), 6) AS f_stat
             |FROM v ORDER BY k""".stripMargin)),
    // Chi-square independence test + Cramér's V (Pearson 1900 /
    // Cramér 1946) of event_type × day-of-week — the categorical-
    // association audit ("is traffic mix stable across the week")
    // complementing x136's per-dow level read and x105's PSI drift:
    // expected cells from integer margins, 35 bounded (o−e)²/e terms
    // through the round-6 DECIMAL bridge, effect size V =
    // √(χ²/(N·min(r−1, c−1))) so the answer is comparable across table
    // sizes. One scan into a ≤35-cell aggregate; margins join on slim
    // keys; dow = epoch-day mod 7 (engine-portable, the x136 device).
    QuerySpec(
      "x158_cramers_v",
      (s, dir) => {
        val c = Tables.events(s, dir)
          .select(col("event_type"),
            expr("datediff(to_date(ts), DATE '1970-01-01') % 7")
              .cast("long").as("dow"))
          .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
          .localCheckpoint() // one corpus scan feeds margins and cells
        val rm = c.groupBy("event_type").agg(sum(col("o")).as("rt"))
        val cm = c.groupBy("dow").agg(sum(col("o")).as("ct"))
        val nn = c.agg(sum(col("o")).as("nn"),
          countDistinct(col("event_type")).as("r"),
          countDistinct(col("dow")).as("cc"))
        c.join(rm, "event_type").join(cm, "dow").crossJoin(broadcast(nn))
          .select(col("nn"), col("r"), col("cc"),
            round(
              (col("o") - col("rt").cast("double") * col("ct") / col("nn")) *
              (col("o") - col("rt").cast("double") * col("ct") / col("nn")) /
              (col("rt").cast("double") * col("ct") / col("nn")), 6)
              .cast("decimal(18,6)").as("term"))
          .groupBy("nn", "r", "cc")
          .agg(sum(col("term")).cast("double").as("chi2"))
          .select(col("nn").as("n_events"), col("r").as("n_types"),
            col("cc").as("n_dows"), round(col("chi2"), 6).as("chi2"),
            round(sqrt(col("chi2") /
              (col("nn") * least(col("r") - 1, col("cc") - 1))), 6)
              .as("cramers_v"))
          .orderBy("n_events")
      },
      Some("""WITH c AS (SELECT event_type,
             |        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
             |          AS BIGINT) AS dow,
             |        COUNT(*) AS o
             |      FROM events GROUP BY 1, 2),
             |rm AS (SELECT event_type, SUM(o) AS rt FROM c GROUP BY 1),
             |cm AS (SELECT dow, SUM(o) AS ct FROM c GROUP BY 1),
             |nn AS (SELECT SUM(o) AS nn, COUNT(DISTINCT event_type) AS r,
             |         COUNT(DISTINCT dow) AS cc FROM c),
             |t AS (SELECT nn.nn, nn.r, nn.cc,
             |        CAST(round(
             |          (c.o - CAST(rm.rt AS DOUBLE) * cm.ct / nn.nn) *
             |          (c.o - CAST(rm.rt AS DOUBLE) * cm.ct / nn.nn) /
             |          (CAST(rm.rt AS DOUBLE) * cm.ct / nn.nn), 6)
             |          AS DECIMAL(18,6)) AS term
             |      FROM c JOIN rm USING (event_type) JOIN cm USING (dow)
             |        CROSS JOIN nn),
             |x AS (SELECT nn, r, cc, CAST(SUM(term) AS DOUBLE) AS chi2
             |      FROM t GROUP BY 1, 2, 3)
             |SELECT CAST(nn AS BIGINT) AS n_events, CAST(r AS BIGINT) AS n_types,
             |  CAST(cc AS BIGINT) AS n_dows, round(chi2, 6) AS chi2,
             |  round(sqrt(chi2 / (nn * LEAST(r - 1, cc - 1))), 6) AS cramers_v
             |FROM x ORDER BY n_events""".stripMargin)),
    // Sequential-pattern mining (PrefixSpan, Pei et al. ICDE 2001) over
    // each user's first 8 events — the early-journey patterns ("what do
    // users DO in order") that x79/x80/x98's fixed-order transitions and
    // funnels can't discover, because here the frequent ORDERINGS emerge
    // from the data. Greedy earliest-match projection makes the
    // projected database one slim (user, prefix, pos) row per frequent
    // prefix (SeqMine scaladoc has the argument); support pruning at
    // minsup = 50% of users bounds candidate growth level by level (at
    // this corpus: 25 → 14 frequent 2-seqs → 70, not 125, 3-candidates).
    // Per-user windows only, equi-joins only, relative threshold so the
    // query is meaningful at any corpus size.
    QuerySpec(
      "x159_prefixspan",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val first8 = Tables.events(s, dir)
          .withColumn("rn0", row_number().over(w))
          .filter(col("rn0") <= 8)
        SeqMine.prefixSpan(first8, "user_id", "event_type",
          Seq(col("ts"), col("event_id")), minSupFrac = 0.5, maxLen = 3)
      },
      Some("""WITH ev0 AS (SELECT user_id AS sid, event_type AS et, ts, event_id,
             |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn0
             |      FROM events),
             |ev AS (SELECT sid, et,
             |        CAST(row_number() OVER (PARTITION BY sid ORDER BY ts, event_id) AS BIGINT) AS rn
             |      FROM ev0 WHERE rn0 <= 8),
             |tu AS (SELECT COUNT(DISTINCT sid) AS nu FROM ev),
             |g1 AS (SELECT sid, et AS pat, MIN(rn) AS pos FROM ev GROUP BY 1, 2),
             |s1 AS (SELECT pat, COUNT(*) AS support FROM g1 GROUP BY 1),
             |f1 AS (SELECT pat, support FROM s1 CROSS JOIN tu WHERE support >= ceil(0.5 * nu)),
             |p1 AS (SELECT g1.sid, g1.pat, g1.pos FROM g1 JOIN f1 USING (pat)),
             |g2 AS (SELECT p1.sid, p1.pat || '>' || ev.et AS pat, MIN(ev.rn) AS pos
             |       FROM p1 JOIN ev ON ev.sid = p1.sid AND ev.rn > p1.pos GROUP BY 1, 2),
             |s2 AS (SELECT pat, COUNT(*) AS support FROM g2 GROUP BY 1),
             |f2 AS (SELECT pat, support FROM s2 CROSS JOIN tu WHERE support >= ceil(0.5 * nu)),
             |p2 AS (SELECT g2.sid, g2.pat, g2.pos FROM g2 JOIN f2 USING (pat)),
             |g3 AS (SELECT p2.sid, p2.pat || '>' || ev.et AS pat, MIN(ev.rn) AS pos
             |       FROM p2 JOIN ev ON ev.sid = p2.sid AND ev.rn > p2.pos GROUP BY 1, 2),
             |s3 AS (SELECT pat, COUNT(*) AS support FROM g3 GROUP BY 1),
             |f3 AS (SELECT pat, support FROM s3 CROSS JOIN tu WHERE support >= ceil(0.5 * nu)),
             |u AS (SELECT pat, 1 AS level, support FROM f1
             |      UNION ALL SELECT pat, 2, support FROM f2
             |      UNION ALL SELECT pat, 3, support FROM f3)
             |SELECT pat AS pattern, CAST(level AS BIGINT) AS level,
             |  CAST(support AS BIGINT) AS support,
             |  round(CAST(support AS DOUBLE) / nu, 6) AS support_frac
             |FROM u CROSS JOIN tu ORDER BY level, pattern""".stripMargin)),
    // Functional-dependency discovery (the TANE family's level-1 check,
    // Huhtala et al. 1999 — the schema-profiling gate that finds "A
    // determines B" before a pipeline trusts a denormalization or picks
    // a partition key): over 5 orders columns, FD A→B holds iff
    // ndv(A) = ndv(A,B). ALL 25 distinct counts (5 singles + 20 pairs)
    // ride ONE aggregate over ONE scan (multi-distinct plans as Expand —
    // the x102 device: grouped row replication of slim pairs, no
    // per-pair rescan), then the 1-row result unpivots via stack into
    // the 20-row report with the violation magnitude (extra equivalence
    // classes) per non-FD. Columns here are non-null so Spark's
    // COUNT(DISTINCT a, b) and DuckDB's COUNT(DISTINCT (a, b)) agree.
    QuerySpec(
      "x161_fd_discovery",
      (s, dir) => {
        val cs = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderdate", "o_orderpriority")
        // fan the under-split scan before the 25-way distinct Expand
        // (x102 device: ×25 row replication above the first exchange —
        // guide §2.5; no-op on a well-split table)
        val o = Tables.fanOut(Tables.orders(s, dir)
          .select(cs.map(col): _*), col("o_orderkey"))
        val aggs = cs.map(c => countDistinct(col(c)).as(s"d_$c")) ++
          (for { a <- cs; b <- cs if a != b }
            yield countDistinct(col(a), col(b)).as(s"d_${a}__$b"))
        val m = o.agg(aggs.head, aggs.tail: _*)
        val stackArgs = (for { a <- cs; b <- cs if a != b }
          yield s"'$a', '$b', d_$a, d_${a}__$b").mkString(", ")
        val nPairs = cs.size * (cs.size - 1)
        m.select(expr(
            s"stack($nPairs, $stackArgs) AS (lhs, rhs, ndv_lhs, ndv_pair)"))
          .select(col("lhs"), col("rhs"), col("ndv_lhs"), col("ndv_pair"),
            (col("ndv_pair") === col("ndv_lhs")).cast("long").as("holds"),
            (col("ndv_pair") - col("ndv_lhs")).as("extra_classes"))
          .orderBy("lhs", "rhs")
      },
      Some(fdDiscoveryOracle)),
    // Association rules (Agrawal & Srikant, VLDB 1994 — Apriori's rule
    // stage): baskets = per-(user, day) distinct item sets; frequent
    // pairs (support >= 3 baskets) expand to both rule directions scored
    // by confidence = sup(A∪B)/sup(A) and lift =
    // sup(A∪B)·N/(sup(A)·sup(B)) — the co-purchase signal x85's PMI
    // reads log-scaled, here in the units merchandising actually uses.
    // The numerator products run in DOUBLE (the x152 lesson: sup·sup
    // overflows int64 at real basket cardinalities). Shape: one basket
    // self-join bounded per (user, day), two slim item-keyed joins, a
    // 1-row basket-count broadcast, TakeOrdered top-20 — nothing
    // corpus-quadratic.
    QuerySpec(
      "x162_assoc_rules",
      (s, dir) => {
        // the shared context grain (itemContexts), checkpointed once for
        // its four consumers (n_baskets, per-item support, both sides of
        // the pair self-join); NULL items (props without '$.k') carry no
        // basket membership and are excluded up front (x145 discipline —
        // a NULL can never satisfy a.item < b.item anyway, so the pair
        // table is identical to itemPairs')
        AssocRules.rules(
          itemContexts(s, dir).filter(col("item").isNotNull)
            .localCheckpoint(),
          minSup = 3)
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS item
             |      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |nb AS (SELECT COUNT(*) AS n_baskets FROM
             |        (SELECT DISTINCT user_id, day FROM ctx)),
             |si AS (SELECT item, COUNT(*) AS sup FROM ctx GROUP BY 1),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS sup_ab
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |         AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |r AS (SELECT ia AS ante, ib AS cons, sup_ab FROM pc
             |      UNION ALL SELECT ib, ia, sup_ab FROM pc)
             |SELECT r.ante, r.cons, CAST(r.sup_ab AS BIGINT) AS sup_ab,
             |  round(CAST(r.sup_ab AS DOUBLE) / sa.sup, 6) AS confidence,
             |  round(CAST(r.sup_ab AS DOUBLE) * nb.n_baskets /
             |    (CAST(sa.sup AS DOUBLE) * sc.sup), 6) AS lift
             |FROM r JOIN si sa ON sa.item = r.ante
             |  JOIN si sc ON sc.item = r.cons CROSS JOIN nb
             |ORDER BY lift DESC, ante, cons LIMIT 20""".stripMargin)),
    // Rolling 7-day active users + DAU/WAU stickiness — the standard
    // growth-accounting read. The naive form is a per-day COUNT(DISTINCT
    // user) over a sliding range — a corpus-rescan per day; the
    // at-scale form inverts it: each (user, active-day) row contributes
    // to the ≤7 trailing windows that contain it (a slim ×7 fan-out),
    // one (user, window-day) dedup, one count per window-day — two
    // shuffles of slim pairs total, no window function, no per-day
    // rescans. Emitted only for days that exist in the data; stickiness
    // = DAU/WAU rounded 6 (integer inputs ⇒ cross-engine exact).
    QuerySpec(
      "x163_rolling_wau",
      (s, dir) => Wau.rollingReport(
        Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .localCheckpoint() /* consumed three times (contrib, days, dau) */),
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |      FROM events),
             |days AS (SELECT DISTINCT day FROM ud),
             |c AS (SELECT DISTINCT user_id,
             |        day + CAST(off AS INTEGER) AS wday
             |      FROM ud CROSS JOIN range(0, 7) t(off)),
             |w AS (SELECT c.wday, COUNT(*) AS wau FROM c
             |      JOIN days d ON d.day = c.wday GROUP BY 1),
             |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1)
             |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
             |  CAST(w.wau AS BIGINT) AS wau,
             |  round(CAST(dau.dau AS DOUBLE) / w.wau, 6) AS stickiness
             |FROM dau JOIN w ON w.wday = dau.day ORDER BY dau.day""".stripMargin)),
    // CDC MERGE apply (the upsert half of the lake-mechanics suite:
    // x117 DETECTS a delta, x132 maintains a VIEW through one — this
    // applies a full insert/update/delete delta to a base snapshot, the
    // Iceberg/Delta `MERGE INTO` semantics). Base = orders with
    // orderkey % 10 ∉ {0}; delta: I = the held-out %10=0 rows,
    // U = %10=5 rows repriced to 'MERGED-URGENT', D = %10=7 keys. Apply
    // is ONE full-outer join on the key (left/semi/anti each miss an
    // action class — the x117 argument) + row-local CASE resolution; at
    // 100 TB the join rides the snapshot's bucketing (x142) so merge
    // cost is the delta shuffle, and output proves the result
    // set-algebraically: per-priority row counts + orderkey checksums.
    QuerySpec(
      "x164_merge_upsert",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val base = o.filter(col("o_orderkey") % 10 =!= 0)
          .select(col("o_orderkey"), col("o_orderpriority"))
        val delta = o.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"), lit("I").as("op"))
          .union(o.filter(col("o_orderkey") % 10 === 5)
            .select(col("o_orderkey"), lit("MERGED-URGENT").as("o_orderpriority"),
              lit("U").as("op")))
          .union(o.filter(col("o_orderkey") % 10 === 7)
            .select(col("o_orderkey"), lit(null).cast("string").as("o_orderpriority"),
              lit("D").as("op")))
        val merged = base.as("b").join(delta.as("d"),
            col("b.o_orderkey") === col("d.o_orderkey"), "full_outer")
          // D drops the row; U rewrites it; I lands where base had none;
          // base rows without a delta pass through
          .filter(coalesce(col("d.op"), lit("-")) =!= "D")
          .select(
            coalesce(col("b.o_orderkey"), col("d.o_orderkey")).as("o_orderkey"),
            when(coalesce(col("d.op"), lit("-")) === "U",
                col("d.o_orderpriority"))
              .otherwise(coalesce(col("b.o_orderpriority"),
                col("d.o_orderpriority"))).as("o_orderpriority"))
        merged.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_checksum"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_orderpriority FROM orders
             |      WHERE o_orderkey % 10 <> 0),
             |delta AS (SELECT o_orderkey, o_orderpriority, 'I' AS op
             |          FROM orders WHERE o_orderkey % 10 = 0
             |      UNION ALL SELECT o_orderkey, 'MERGED-URGENT', 'U'
             |          FROM orders WHERE o_orderkey % 10 = 5
             |      UNION ALL SELECT o_orderkey, NULL, 'D'
             |          FROM orders WHERE o_orderkey % 10 = 7),
             |m AS (SELECT COALESCE(b.o_orderkey, d.o_orderkey) AS k,
             |        CASE WHEN COALESCE(d.op, '-') = 'U' THEN d.o_orderpriority
             |             ELSE COALESCE(b.o_orderpriority, d.o_orderpriority)
             |        END AS pri
             |      FROM base b FULL OUTER JOIN delta d
             |        ON d.o_orderkey = b.o_orderkey
             |      WHERE COALESCE(d.op, '-') <> 'D')
             |SELECT pri AS o_orderpriority, COUNT(*) AS n_rows,
             |  CAST(SUM(k) AS BIGINT) AS key_checksum
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),
    // Calibration audit with ECE (Guo et al., ICML 2017 — the "is the
    // score a probability" gate before thresholding any quality model):
    // x50's hashed-linear margin turns into an exact-rational pseudo-
    // probability via percent_rank with a total (margin, doc_id)
    // tie-break — no transcendental sigmoid for engines to diverge on —
    // decile-binned; per bin the observed label rate (n_chars >= 300)
    // vs mean score, and ECE = Σ (n_b/N)·|acc_b − conf_b| with every
    // mean DECIMAL-bridged. The GLOBAL rank never rides a corpus-wide
    // window (Rule 1): rank = cum-count of smaller margins (a window
    // over the |distinct margins| AGGREGATE) + row_number within the
    // doc's own margin group (bounded per group) — exactly the global
    // (margin, doc_id) row_number, assembled from Rule-1-safe parts.
    QuerySpec(
      "x165_calibration_ece",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"), (col("n_chars") >= 300).cast("long").as("y"),
            QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text")))
              .getField("margin").as("margin"))
          .localCheckpoint() // consumed by the grid, the rank, and nn
        val nn = scored.agg(count(lit(1)).as("n"))
        val grid = scored.groupBy("margin").agg(count(lit(1)).as("c"))
        val cum = countBelow(grid, "margin")
        val wm = W.partitionBy("margin").orderBy("doc_id")
        val p = scored
          .withColumn("rm", row_number().over(wm).cast("long"))
          .join(cum.select(col("margin"), col("below")), "margin")
          .crossJoin(broadcast(nn))
          .select(col("doc_id"), col("y"),
            ((col("below") + col("rm") - 1).cast("double") /
              (col("n") - 1)).as("p"))
          .withColumn("bin", least(floor(col("p") * 10), lit(9L)))
        val bins = p.groupBy("bin")
          .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"),
            sum(round(col("p"), 6).cast("decimal(18,6)")).cast("double")
              .as("sp"))
          .select(col("bin"), col("n_docs"),
            round(col("n_pos").cast("double") / col("n_docs"), 6).as("acc"),
            round(col("sp") / col("n_docs"), 6).as("conf"))
        val ece = bins
          .agg(sum(col("n_docs")).as("nn"),
            sum(round(abs(col("acc") - col("conf")) * col("n_docs"), 6)
              .cast("decimal(18,6)")).cast("double").as("wgap"))
          .select(lit(-1L).as("bin"), col("nn").as("n_docs"),
            lit(null).cast("double").as("acc"),
            round(col("wgap") / col("nn"), 6).as("conf"))
        bins.select(col("bin"), col("n_docs"), col("acc"), col("conf"))
          .union(ece).orderBy("bin")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |f AS (SELECT doc_id,
             |  unnest(list_concat(toks, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS feat FROM t),
             |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |       [CAST(ord(c) AS BIGINT) for c in string_split(feat, '')]),
             |       (acc, x) -> (acc*31 + x) % 2147483647) % 4096 AS b FROM f),
             |mg AS (SELECT doc_id,
             |        CAST(SUM((b * 2654435761) % 1048576 - 524288) AS BIGINT) AS margin
             |      FROM h GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |        CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS y,
             |        COALESCE(mg.margin, 0) AS margin
             |      FROM documents d LEFT JOIN mg ON mg.doc_id = d.doc_id),
             |nn AS (SELECT COUNT(*) AS n FROM sc),
             |p AS (SELECT doc_id, y,
             |        CAST(row_number() OVER (ORDER BY margin, doc_id) - 1
             |          AS DOUBLE) / (nn.n - 1) AS p
             |      FROM sc CROSS JOIN nn),
             |b AS (SELECT LEAST(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
             |        y, p FROM p),
             |bins AS (SELECT bin, COUNT(*) AS n_docs,
             |        round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS acc,
             |        round(CAST(SUM(CAST(round(p, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) / COUNT(*), 6) AS conf
             |      FROM b GROUP BY 1),
             |ece AS (SELECT CAST(-1 AS BIGINT) AS bin,
             |        CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             |        NULL AS acc,
             |        round(CAST(SUM(CAST(round(abs(acc - conf) * n_docs, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) / SUM(n_docs), 6) AS conf
             |      FROM bins)
             |SELECT bin, CAST(n_docs AS BIGINT) AS n_docs, acc, conf FROM bins
             |UNION ALL SELECT bin, n_docs, acc, conf FROM ece
             |ORDER BY bin""".stripMargin)),
    // Spearman rank correlation (Spearman 1904) between document length
    // (n_chars) and whitespace token count — the monotone-association
    // read that x151's MI bins coarsen away and Pearson distorts under
    // heavy tails. Tied values take MIDRANKS (the tie-corrected form):
    // midrank(v) = cum-count-below(v) + (count(v)+1)/2, computed per
    // VARIABLE from its |distinct values| aggregate (Rule-1-safe window
    // over the grid, never the corpus) and joined back — the x165 rank
    // device. ρ = Pearson over the midranks: integer moments (2·rank
    // carried as an integer so tie-halves stay exact), one fixed-order
    // 1-row expression at the end. One scan, two slim grid joins.
    // Magnitude budget: Σ(2r)² ≤ 4n³ stays under 2^63 for n ≲ 1.3M
    // rows — beyond that the moment sums switch to DECIMAL(38) (DuckDB
    // already promotes to HUGEINT); exact at every harness SF.
    QuerySpec(
      "x166_spearman_rank",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars").cast("long").as("a"),
            size(TextFunctions.tokens(col("text"))).cast("long").as("b"))
          .localCheckpoint() // consumed by both grids and the join-back
        def midranks(v: String) =
          // midrank = below + (c+1)/2 — exact halves, so carry 2·rank
          // as an integer to keep every downstream moment rational;
          // `below` via the bucketed countBelow device (no grid-scale
          // single-partition window)
          countBelow(d.groupBy(v).agg(count(lit(1)).as("c")), v)
            .select(col(v), (lit(2) * col("below") + col("c") + 1)
              .as(s"r2_$v"))
        val ranked = d.join(midranks("a"), "a").join(midranks("b"), "b")
        val m = ranked.agg(count(lit(1)).as("n"),
            sum(col("r2_a")).as("sa"), sum(col("r2_b")).as("sb"),
            sum(col("r2_a") * col("r2_a")).as("saa"),
            sum(col("r2_b") * col("r2_b")).as("sbb"),
            sum(col("r2_a") * col("r2_b")).as("sab"))
        // Pearson over 2·ranks (scale cancels): ρ = (n·Σxy − ΣxΣy) /
        // √(n·Σx²−(Σx)²) / √(n·Σy²−(Σy)²) — integer moments, one
        // fixed-order double expression
        m.select(col("n"),
            round((col("n").cast("double") * col("sab") -
                col("sa").cast("double") * col("sb")) /
              (sqrt(col("n").cast("double") * col("saa") -
                  col("sa").cast("double") * col("sa")) *
                sqrt(col("n").cast("double") * col("sbb") -
                  col("sb").cast("double") * col("sb"))), 6).as("spearman"))
          .orderBy("n")
      },
      Some("""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
             |        CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |          x -> x <> '')) AS BIGINT) AS b
             |      FROM documents),
             |ga AS (SELECT a, COUNT(*) AS c FROM d GROUP BY 1),
             |ra AS (SELECT a, 2 * COALESCE(SUM(c) OVER (ORDER BY a
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          + c + 1 AS r2_a
             |       FROM ga),
             |gb AS (SELECT b, COUNT(*) AS c FROM d GROUP BY 1),
             |rb AS (SELECT b, 2 * COALESCE(SUM(c) OVER (ORDER BY b
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          + c + 1 AS r2_b
             |       FROM gb),
             |r AS (SELECT d.doc_id, ra.r2_a, rb.r2_b
             |      FROM d JOIN ra ON ra.a = d.a JOIN rb ON rb.b = d.b),
             |m AS (SELECT COUNT(*) AS n, SUM(r2_a) AS sa, SUM(r2_b) AS sb,
             |        SUM(r2_a * r2_a) AS saa, SUM(r2_b * r2_b) AS sbb,
             |        SUM(r2_a * r2_b) AS sab
             |      FROM r)
             |SELECT CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb) /
             |    (sqrt(CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa) *
             |     sqrt(CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)), 6)
             |    AS spearman
             |FROM m ORDER BY n""".stripMargin)),
    // The WHOLE LLM pre-training curation pipeline composed end-to-end —
    // what a user of this library actually runs before a training job:
    // quality gate (x7's score) → exact dedup → MinHash near-dup drop
    // (x22's core) → benchmark-contamination filter (x21's 8-gram
    // equi-join device, bench = the doc_id % 97 slice of the RAW corpus)
    // → reproducible shard manifest (x86's seeded-md5 keying). Each
    // stage is independently oracle-green; THIS query proves the
    // COMPOSITION — stage interfaces, filter interplay, survivor
    // accounting — via the manifest's per-shard counts, token totals,
    // and key fingerprints (hash-strong: any doc wrongly kept or
    // dropped moves a fingerprint). Scale shape inherits each stage's:
    // digest groupBy, banded candidates, one gram equi-join, pure
    // projection sharding — no stage adds a corpus-global window or
    // pairwise scan.
    QuerySpec(
      "x167_curation_pipeline",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // quality gate + exact dedup + near-dup drop — the SharedStages
        // memo (one candidate pass per corpus, shared with x22/x270)
        val deduped = SharedStages.cleanDeduped(s, dir)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        val contaminated = Dedup.contamination(deduped, bench,
            "doc_id", "text", n = 8)
          .select(col("doc_id"))
        val kept = deduped.join(contaminated, Seq("doc_id"), "left_anti")
        val keyed = kept.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          conv(substring(md5(concat(lit("graft-shuffle-42:"),
            col("doc_id").cast("string"))), 1, 12), 16, 10)
            .cast("long").as("skey"))
        keyed.groupBy((col("skey") % 8).as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens_total"),
            sum(col("skey")).as("key_fingerprint"))
          .orderBy("shard")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, text, toks FROM t
             |  WHERE len(toks) BETWEEN 5 AND 100000
             |    AND round(CAST(list_sum([length(x) for x in toks]) AS DOUBLE)/len(toks), 4)
             |        BETWEEN 2.0 AND 12.0
             |    AND len(list_filter(toks, x -> x IN ('a', 'the'))) > 0),
             |ex AS (SELECT MIN(doc_id) AS keep_id FROM q GROUP BY sha256(text)),
             |ae AS (SELECT q.* FROM q JOIN ex ON q.doc_id = ex.keep_id),
             |sh AS (
             |  SELECT doc_id,
             |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                   for i in range(1, len(toks)-1)]) AS shs
             |  FROM ae),
             |pairs AS (
             |  SELECT b.doc_id AS doc_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(a.shs) > 0 AND len(b.shs) > 0
             |    AND round(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) /
             |        (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))), 4) >= 0.8),
             |dd AS (SELECT ae.* FROM ae
             |       LEFT JOIN (SELECT DISTINCT doc_b FROM pairs) p
             |         ON p.doc_b = ae.doc_id
             |       WHERE p.doc_b IS NULL),
             |gset AS (
             |  SELECT doc_id,
             |    list_distinct([list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |        [CAST(ord(c) AS BIGINT)
             |         for c in string_split(array_to_string(toks[i:i+7], ' '), '')]),
             |      (acc, x) -> (acc*31 + x) % 2147483647)
             |      for i in range(1, len(toks) - 6)]) AS grams
             |  FROM t WHERE len(toks) >= 8),
             |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM gset WHERE doc_id % 97 = 0),
             |cg AS (SELECT g.doc_id, unnest(g.grams) AS gram
             |       FROM gset g JOIN dd ON dd.doc_id = g.doc_id
             |       WHERE g.doc_id % 97 <> 0),
             |cont AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)),
             |kept AS (SELECT dd.doc_id, dd.toks FROM dd
             |         LEFT JOIN cont ON cont.doc_id = dd.doc_id
             |         WHERE cont.doc_id IS NULL),
             |keyed AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             |    CAST(('0x' || substr(md5('graft-shuffle-42:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS skey
             |  FROM kept)
             |SELECT skey % 8 AS shard, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
             |  CAST(SUM(skey) AS BIGINT) AS key_fingerprint
             |FROM keyed GROUP BY 1 ORDER BY shard""".stripMargin)),
    // ROC-AUC by the rank-sum identity (AUC = U/(n⁺·n⁻), Mann-Whitney's
    // equivalence — Hanley & McNeil 1982): the threshold-free ranking
    // quality of x50's margin against the n_chars >= 300 label,
    // completing the classifier-eval trio (x73 calibrates thresholds,
    // x165 calibrates probabilities, this scores the RANKING). Midranks
    // handle ties exactly (2·rank carried as integers — the x166
    // device, grid-window Rule-1-safe), so AUC = (Σ2r⁺ − n⁺(n⁺+1)) /
    // (2·n⁺·n⁻) is a ratio of exact integers: one division, round 6,
    // bit-identical on any engine. Denominator in DOUBLE (x152 lesson);
    // Σ2r ≤ 2n² stays under 2^63 for n < 2.1e9 rows, exact at every
    // harness SF. One scan, one |distinct margins| grid, one 1-row out.
    QuerySpec(
      "x168_roc_auc",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), (col("n_chars") >= 300).cast("long").as("y"),
            QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text")))
              .getField("margin").as("margin"))
          .localCheckpoint() // consumed by the grid and the join-back
        val cum = countBelow(
            d.groupBy("margin").agg(count(lit(1)).as("c")), "margin")
          .select(col("margin"),
            (lit(2) * col("below") + col("c") + 1).as("r2"))
        d.join(cum, "margin")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("np"),
            sum(when(col("y") === 1, col("r2")).otherwise(0L)).as("s2p"))
          .select(col("n"), col("np").as("n_pos"),
            (col("n") - col("np")).as("n_neg"),
            round((col("s2p").cast("double") -
                col("np").cast("double") * (col("np") + 1)) /
              (lit(2.0) * col("np").cast("double") * (col("n") - col("np"))),
              6).as("auc"))
          .orderBy("n")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |f AS (SELECT doc_id,
             |  unnest(list_concat(toks, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS feat FROM t),
             |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |       [CAST(ord(c) AS BIGINT) for c in string_split(feat, '')]),
             |       (acc, x) -> (acc*31 + x) % 2147483647) % 4096 AS b FROM f),
             |mg AS (SELECT doc_id,
             |        CAST(SUM((b * 2654435761) % 1048576 - 524288) AS BIGINT) AS margin
             |      FROM h GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |        CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS y,
             |        COALESCE(mg.margin, 0) AS margin
             |      FROM documents d LEFT JOIN mg ON mg.doc_id = d.doc_id),
             |g AS (SELECT margin, COUNT(*) AS c FROM sc GROUP BY 1),
             |r AS (SELECT margin, 2 * COALESCE(SUM(c) OVER (ORDER BY margin
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          + c + 1 AS r2
             |      FROM g),
             |m AS (SELECT COUNT(*) AS n, SUM(sc.y) AS np,
             |        SUM(CASE WHEN sc.y = 1 THEN r.r2 ELSE 0 END) AS s2p
             |      FROM sc JOIN r ON r.margin = sc.margin)
             |SELECT CAST(n AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos,
             |  CAST(n - np AS BIGINT) AS n_neg,
             |  round((CAST(s2p AS DOUBLE) - CAST(np AS DOUBLE) * (np + 1)) /
             |    (2.0 * CAST(np AS DOUBLE) * (n - np)), 6) AS auc
             |FROM m ORDER BY n""".stripMargin)),
    // HLL-merged rolling WAU — the SKETCH form of x163 for the corpus
    // size where even slim (user, window-day) pairs hurt: per-day m=64
    // HLL registers (the x46 device — j/rank from integer ops both
    // engines replay bit-for-bit, `bin()`/printf('%b') for the exact
    // leading-bit position) roll up by ELEMENTWISE MAX over the 7-day
    // window via the x163 contribution fan-out — so weekly state is
    // |days|·64 register rows, independent of user count; a year of
    // rolling windows over 1e10 users merges 365·64 bytes-ish of state
    // instead of re-deduping users per window. Exact WAU rides along as
    // ground truth (est within HLL's ~13% RSE at m=64) — the column
    // you'd drop at 100 TB.
    QuerySpec(
      "x169_hll_rolling_wau",
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(to_date(col("ts")).as("day"),
            pmod(col("user_id"), lit(2147483647L)).as("h"))
          .select(col("day"), (col("h") % 64).as("j"),
            expr("h div 64").as("hd"))
          .select(col("day"), col("j"),
            when(col("hd") === 0, lit(26L))
              .otherwise(lit(26L) - length(bin(col("hd")))).as("rnk"))
        val dreg = ud.groupBy("day", "j").agg(max(col("rnk")).as("reg"))
          .localCheckpoint() // |days|·64 rows; consumed by fan-out + days
        val days = dreg.select(col("day").as("wday")).distinct()
        val wreg = dreg
          .select(col("day"), col("j"), col("reg"),
            explode(sequence(lit(0), lit(6))).as("off"))
          .select(expr("date_add(day, off)").as("wday"), col("j"), col("reg"))
          .groupBy("wday", "j").agg(max(col("reg")).as("reg"))
          .join(days, "wday")
        val stats = wreg.groupBy("wday")
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - reg AS INT))"))
              .as("sp"),
            count(lit(1)).as("nr"))
          .select(col("wday"),
            (col("sp") + (lit(64L) - col("nr")) * 67108864L).as("sum_pow"),
            (lit(64L) - col("nr")).as("n_zero_regs"))
        val raw = lit(0.709) * 64 * 64 * 67108864.0 / col("sum_pow")
        val est = stats.select(col("wday"), col("sum_pow"), col("n_zero_regs"),
          round(when(raw <= 2.5 * 64 && col("n_zero_regs") > 0,
              lit(64.0) * log(lit(64.0) / col("n_zero_regs")))
            .otherwise(raw), 4).as("wau_est"))
        // exact ground truth — the shared x163 fan-out (ops/Wau); its
        // emitted-day set equals `days` (both derive from event days)
        val exact = Wau.windowActive(
            Tables.events(s, dir)
              .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
          .withColumnRenamed("wau", "wau_exact")
        est.join(exact, "wday")
          .select(col("wday").as("day"), col("wau_exact"), col("sum_pow"),
            col("n_zero_regs"), col("wau_est"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT CAST(ts AS DATE) AS day,
             |        user_id % 2147483647 AS h FROM events),
             |r AS (SELECT day, h % 64 AS j,
             |        CASE WHEN h // 64 = 0 THEN 26
             |             ELSE 26 - length(printf('%b', h // 64)) END AS rnk
             |      FROM ev),
             |dreg AS (SELECT day, j, MAX(rnk) AS reg FROM r GROUP BY 1, 2),
             |days AS (SELECT DISTINCT day AS wday FROM dreg),
             |wreg AS (SELECT dreg.day + CAST(off AS INTEGER) AS wday, j,
             |           MAX(reg) AS reg
             |         FROM dreg CROSS JOIN range(0, 7) t(off)
             |         GROUP BY 1, 2),
             |wrk AS (SELECT wreg.* FROM wreg JOIN days USING (wday)),
             |st AS (SELECT wday,
             |        CAST(SUM(CAST(1 AS BIGINT) << (26 - reg))
             |             + (64 - COUNT(*)) * 67108864 AS BIGINT) AS sum_pow,
             |        CAST(64 - COUNT(*) AS BIGINT) AS n_zero_regs
             |      FROM wrk GROUP BY 1),
             |e AS (SELECT wday, sum_pow, n_zero_regs,
             |        CAST(0.709 AS DOUBLE) * 64 * 64 * 67108864 / sum_pow AS raw
             |      FROM st),
             |ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |c AS (SELECT DISTINCT user_id, day + CAST(off AS INTEGER) AS wday
             |      FROM ud CROSS JOIN range(0, 7) t(off)),
             |w AS (SELECT c.wday, COUNT(*) AS wau_exact FROM c
             |      JOIN days d ON d.wday = c.wday GROUP BY 1)
             |SELECT e.wday AS day, CAST(w.wau_exact AS BIGINT) AS wau_exact,
             |  e.sum_pow, e.n_zero_regs,
             |  round(CASE WHEN e.raw <= 2.5 * 64 AND e.n_zero_regs > 0
             |             THEN 64 * ln(64.0 / e.n_zero_regs) ELSE e.raw END, 4)
             |    AS wau_est
             |FROM e JOIN w ON w.wday = e.wday ORDER BY day""".stripMargin)),
    // Empirical-Bayes rate shrinkage (beta-binomial, method-of-moments —
    // Robbins 1956 / the Efron-Morris device): per-item purchase rates
    // k/n are noisy exactly where n is small, and ranking on the raw
    // rate promotes flukes; shrinking toward the corpus prior
    // Beta(α, β) — α+β = m(1−m)/v − 1 from the moments of the observed
    // rate distribution — is the standard fix before any rate-ranked
    // decision (which items to boost, which sources to trust). All
    // moments ride the DECIMAL bridge over 6-dp rates, α/β/shrunk are
    // fixed-order double expressions; degenerate priors (v = 0 or a
    // non-positive α+β) fall back to the raw rate with a flag rather
    // than NaN. One item aggregate, one 1-row moment broadcast,
    // row-local shrinkage over |items| rows.
    QuerySpec(
      "x172_eb_shrinkage",
      (s, dir) => {
        val it = Tables.events(s, dir)
          .select(expr("variant_get(parse_json(props), '$.k', 'int')")
            .as("item"),
            (col("event_type") === "purchase").cast("long").as("y"))
          .filter(col("item").isNotNull)
          .groupBy("item")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
          .withColumn("rate",
            round(col("k").cast("double") / col("n"), 6))
          .localCheckpoint() // consumed by the moment row + the shrinkage
        val mom = it.agg(count(lit(1)).as("ni"),
            sum(col("rate").cast("decimal(18,6)")).cast("double").as("sr"),
            sum(round(col("rate") * col("rate"), 6).cast("decimal(18,6)"))
              .cast("double").as("srr"))
          .select(
            (col("sr") / col("ni")).as("m"),
            (col("srr") / col("ni") -
              (col("sr") / col("ni")) * (col("sr") / col("ni"))).as("v"))
          .select(col("m"), col("v"),
            when(col("v") > 0,
              col("m") * (lit(1.0) - col("m")) / col("v") - 1.0)
              .otherwise(lit(null).cast("double")).as("ab"))
        it.crossJoin(broadcast(mom))
          .select(col("item"), col("n"), col("k"), col("rate"),
            round(col("m"), 6).as("prior_mean"),
            when(col("ab").isNotNull && col("ab") > 0,
                round((col("k") + col("m") * col("ab")) /
                  (col("n") + col("ab")), 6))
              .otherwise(col("rate")).as("shrunk_rate"),
            (col("ab").isNotNull && col("ab") > 0).cast("long")
              .as("prior_ok"))
          .orderBy("item")
      },
      Some("""WITH it AS (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS item,
             |        COUNT(*) AS n,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
             |      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
             |      GROUP BY 1),
             |r AS (SELECT item, n, k,
             |        round(CAST(k AS DOUBLE) / n, 6) AS rate FROM it),
             |mo AS (SELECT COUNT(*) AS ni,
             |        CAST(SUM(CAST(rate AS DECIMAL(18,6))) AS DOUBLE) AS sr,
             |        CAST(SUM(CAST(round(rate * rate, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS srr
             |      FROM r),
             |p AS (SELECT sr / ni AS m,
             |        srr / ni - (sr / ni) * (sr / ni) AS v
             |      FROM mo),
             |q AS (SELECT m, v,
             |        CASE WHEN v > 0 THEN m * (1.0 - m) / v - 1.0
             |             ELSE NULL END AS ab
             |      FROM p)
             |SELECT r.item, CAST(r.n AS BIGINT) AS n, CAST(r.k AS BIGINT) AS k,
             |  r.rate, round(q.m, 6) AS prior_mean,
             |  CASE WHEN q.ab IS NOT NULL AND q.ab > 0
             |       THEN round((r.k + q.m * q.ab) / (r.n + q.ab), 6)
             |       ELSE r.rate END AS shrunk_rate,
             |  CAST(CASE WHEN q.ab IS NOT NULL AND q.ab > 0 THEN 1 ELSE 0 END
             |    AS BIGINT) AS prior_ok
             |FROM r CROSS JOIN q ORDER BY r.item""".stripMargin)),
    // Exponential-decay popularity (half-life scoring — the trending /
    // feed-ranking primitive; e.g. Reddit/HN-style hotness is this
    // device): per item, Σ 2^(−age/7d) over its interaction events —
    // yesterday's click outranks last month's hundred. The at-scale
    // trick: group to (item, age_days) COUNTS first (bounded
    // |items|·|days| cells), then ONE decay term per cell —
    // cnt·pow(0.5, age/7) rounded 6 and DECIMAL-summed (the x128 pow
    // precedent), never a per-event transcendental. Output contrasts
    // the decayed rank with the raw-count rank (rank shifts are the
    // point of the metric); top-10 by score, TakeOrdered.
    QuerySpec(
      "x175_decayed_popularity",
      (s, dir) => {
        val cells = Tables.events(s, dir)
          .select(expr("variant_get(parse_json(props), '$.k', 'int')")
            .as("item"), to_date(col("ts")).as("day"))
          .filter(col("item").isNotNull)
          .groupBy("item", "day").agg(count(lit(1)).as("cnt"))
        Decay.decayedPopularity(cells, halfLifeDays = 7.0, topK = 10)
      },
      Some("""WITH ev AS (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS item,
             |        CAST(ts AS DATE) AS day
             |      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |mx AS (SELECT MAX(day) AS mxd FROM ev),
             |cells AS (SELECT item, COUNT(*) AS cnt,
             |        date_diff('day', day, mx.mxd) AS age
             |      FROM ev CROSS JOIN mx GROUP BY item, day, mx.mxd),
             |sc AS (SELECT item, SUM(cnt) AS n_events,
             |        CAST(SUM(CAST(round(cnt * pow(0.5, CAST(age AS DOUBLE) / 7.0), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS sc
             |      FROM cells GROUP BY 1),
             |r AS (SELECT item, n_events, sc,
             |        CAST(row_number() OVER (ORDER BY n_events DESC, item)
             |          AS BIGINT) AS raw_rank,
             |        CAST(row_number() OVER (ORDER BY sc DESC, item)
             |          AS BIGINT) AS hot_rank
             |      FROM sc)
             |SELECT hot_rank, item, CAST(n_events AS BIGINT) AS n_events,
             |  round(sc, 6) AS decayed_score, raw_rank
             |FROM r WHERE hot_rank <= 10 ORDER BY hot_rank""".stripMargin)),
    // Robust outlier audit via the modified z-score (Iglewicz & Hoaglin,
    // "How to Detect and Handle Outliers", ASQC 1993): per group,
    // Mz = 0.6745·(x − median)/MAD with the |Mz| > 3.5 flag — the robust
    // counterpart to x81's mean/stddev skew audit (median/MAD have a 50%
    // breakdown point, so the outliers themselves can't mask the
    // detector, the failure mode of sigma-based rules). Two grouped
    // EXACT medians (value, then |value − med|); Spark's exact
    // `percentile` and DuckDB's `quantile_cont` share the sorted-linear-
    // interpolation definition, and every derived double follows the
    // identical op sequence per engine, so counts and extremes need no
    // tolerance. MAD = 0 groups yield NULL Mz (no flags, max_mz NULL) —
    // guarded, never NaN. At 100 TB the exact per-group median is the
    // honest cost (grouped sort); the documented swap is
    // approx_percentile/t-digest at a stated error budget — the flag
    // threshold is 3.5σ-equivalent, far coarser than sketch error.
    QuerySpec(
      "x179_mad_outliers",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        val st = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"), count(lit(1)).as("n"))
        val dev = ev.join(broadcast(st), "event_type")
          .withColumn("ad", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(ad, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .withColumn("mz",
            when(col("mad") > 0,
              (col("value") - col("med")) * 0.6745 / col("mad")))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"), max(col("med")).as("medv"),
            max(col("mad")).as("madv"),
            sum(when(abs(col("mz")) > 3.5, 1L).otherwise(0L)).as("n_out"),
            max(abs(col("mz"))).as("mx"))
          .select(col("event_type"), col("n"),
            round(col("medv"), 6).as("med"), round(col("madv"), 6).as("mad"),
            col("n_out"),
            round(col("n_out").cast("double") / col("n").cast("double"), 6)
              .as("out_frac"),
            round(col("mx"), 6).as("max_mz"))
          .orderBy("event_type")
      },
      Some("""WITH st AS (SELECT event_type, quantile_cont(value, 0.5) AS med,
             |        COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |dev AS (SELECT e.event_type, e.value, st.med, st.n,
             |        abs(e.value - st.med) AS ad
             |      FROM events e JOIN st USING (event_type)),
             |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
             |      FROM dev GROUP BY 1),
             |mz AS (SELECT dev.event_type, dev.n, dev.med, md.mad,
             |        CASE WHEN md.mad > 0
             |          THEN (dev.value - dev.med) * 0.6745 / md.mad END AS mz
             |      FROM dev JOIN md USING (event_type))
             |SELECT event_type, MAX(n) AS n, round(MAX(med), 6) AS med,
             |  round(MAX(mad), 6) AS mad,
             |  CAST(SUM(CASE WHEN abs(mz) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
             |  round(CAST(SUM(CASE WHEN abs(mz) > 3.5 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(MAX(n) AS DOUBLE), 6) AS out_frac,
             |  round(MAX(abs(mz)), 6) AS max_mz
             |FROM mz GROUP BY event_type ORDER BY event_type""".stripMargin)),
    // Consistent-hashing rebalance audit (Karger et al., STOC 1997): what
    // fraction of keys MOVES when the shard count scales 8 → 9, under
    // mod-N hashing vs a 64-vnode hash ring — the shard-mechanics
    // decision behind every resize of a partitioned store (mod moves
    // ≈ 1 − 1/9 ≈ 89% of keys; the ring moves ≈ 1/9 ≈ 11%, exactly the
    // keys the new shard's vnodes capture). Both schemes are pure
    // md5-derived functions (the x86 48-bit key device), so the whole
    // audit replays in SQL. Shapes: the ring is materialized as SORTED
    // INTERVALS — (lag(pt), pt] per vnode + the wrap interval — built
    // from a 576-row generated frame routed through a bounded groupBy
    // (PlansSpec rule-1: aggregate below the global lag window), then
    // ownership is the x155 interval-containment join of keys against
    // the BROADCAST interval table: one map-side pass over the keys,
    // nothing data-sized shuffles, works unchanged at 10^11 keys.
    QuerySpec(
      "x181_consistent_hashing",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val M = 281474976710656L // 2^48, the x86 12-hex-digit key space
        val vn = s.range(0, 576).toDF("vid")
          .select(expr("vid div 64").as("shard"), (col("vid") % 64).as("v"))
          .withColumn("pt",
            conv(substring(md5(concat(lit("vnode:"), col("shard").cast("string"),
              lit(":"), col("v").cast("string"))), 1, 12), 16, 10)
              .cast("long").as("pt"))
        def intervals(ring: org.apache.spark.sql.DataFrame) = {
          // groupBy is semantically the identity on (shard, v) — it exists
          // so the global lag window below sits over an aggregate of
          // BOUNDED cardinality (576 vnodes), never corpus-sized.
          val base = ring.groupBy("shard", "v").agg(max(col("pt")).as("pt"))
          val iv = base
            .withColumn("lo", lag(col("pt"), 1, -1L).over(W.orderBy("pt")))
            .select(col("lo"), col("pt").as("hi"), col("shard"))
          val wrap = base.agg(max(col("pt")).as("lo"))
            .crossJoin(base.orderBy(col("pt")).limit(1).select(col("shard")))
            .select(col("lo"), lit(M).as("hi"), col("shard"))
          iv.unionByName(wrap)
        }
        val ivA = intervals(vn.filter(col("shard") < 8))
        val ivB = intervals(vn)
        val keys = Tables.customer(s, dir)
          .select(col("c_custkey").as("key"),
            conv(substring(md5(concat(lit("ring:"),
              col("c_custkey").cast("string"))), 1, 12), 16, 10)
              .cast("long").as("kpos"))
        val ringAsg = keys
          .join(broadcast(ivA), col("kpos") > col("lo") && col("kpos") <= col("hi"))
          .select(col("key"), col("kpos"), col("shard").as("sa"))
          .join(broadcast(ivB).withColumnRenamed("shard", "sb"),
            col("kpos") > col("lo") && col("kpos") <= col("hi"))
          .select(lit("ring").as("strategy"), col("key"), col("sa"), col("sb"))
        val modAsg = keys.select(lit("mod").as("strategy"), col("key"),
          (col("kpos") % 8).as("sa"), (col("kpos") % 9).as("sb"))
        ringAsg.unionByName(modAsg)
          .groupBy("strategy")
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_moved"))
          .join(ringAsg.unionByName(modAsg)
            .groupBy("strategy", "sb").agg(count(lit(1)).as("c"))
            .groupBy("strategy").agg(max(col("c")).as("max_shard")), "strategy")
          .select(col("strategy"), col("n_keys"), col("n_moved"),
            round(col("n_moved").cast("double") / col("n_keys").cast("double"), 6)
              .as("moved_frac"),
            round(col("max_shard").cast("double") * 9.0 /
              col("n_keys").cast("double"), 6).as("max_shard_load"))
          .orderBy("strategy")
      },
      Some("""WITH vn AS (SELECT i // 64 AS shard, i % 64 AS v,
             |        CAST(('0x' || substr(md5('vnode:' || CAST(i // 64 AS VARCHAR)
             |          || ':' || CAST(i % 64 AS VARCHAR)), 1, 12)) AS BIGINT) AS pt
             |      FROM generate_series(0, 575) t(i)),
             |vnA AS (SELECT * FROM vn WHERE shard < 8),
             |iA AS (SELECT lag(pt, 1, -1) OVER (ORDER BY pt) AS lo, pt AS hi, shard FROM vnA
             |       UNION ALL
             |       SELECT (SELECT MAX(pt) FROM vnA), CAST(281474976710656 AS BIGINT),
             |         (SELECT shard FROM vnA ORDER BY pt LIMIT 1)),
             |iB AS (SELECT lag(pt, 1, -1) OVER (ORDER BY pt) AS lo, pt AS hi, shard FROM vn
             |       UNION ALL
             |       SELECT (SELECT MAX(pt) FROM vn), CAST(281474976710656 AS BIGINT),
             |         (SELECT shard FROM vn ORDER BY pt LIMIT 1)),
             |k AS (SELECT c_custkey AS key,
             |        CAST(('0x' || substr(md5('ring:' || CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT) AS kpos
             |      FROM customer),
             |ring AS (SELECT 'ring' AS strategy, k.key, a.shard AS sa, b.shard AS sb
             |      FROM k
             |      JOIN iA a ON k.kpos > a.lo AND k.kpos <= a.hi
             |      JOIN iB b ON k.kpos > b.lo AND k.kpos <= b.hi),
             |md AS (SELECT 'mod' AS strategy, key, kpos % 8 AS sa, kpos % 9 AS sb FROM k),
             |u AS (SELECT * FROM ring UNION ALL SELECT * FROM md),
             |agg AS (SELECT strategy, COUNT(*) AS n_keys,
             |        CAST(SUM(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
             |      FROM u GROUP BY 1),
             |bal AS (SELECT strategy, MAX(c) AS max_shard FROM (
             |        SELECT strategy, sb, COUNT(*) AS c FROM u GROUP BY 1, 2)
             |      GROUP BY 1)
             |SELECT agg.strategy, agg.n_keys, agg.n_moved,
             |  round(CAST(agg.n_moved AS DOUBLE) / CAST(agg.n_keys AS DOUBLE), 6) AS moved_frac,
             |  round(CAST(bal.max_shard AS DOUBLE) * 9.0
             |    / CAST(agg.n_keys AS DOUBLE), 6) AS max_shard_load
             |FROM agg JOIN bal USING (strategy) ORDER BY strategy""".stripMargin)),
    // Inverse-propensity-weighted treatment effect (Horvitz & Thompson,
    // JASA 1952; Rosenbaum & Rubin, Biometrika 1983) with STRATIFIED
    // propensity — the observational-causal counterpart to the
    // randomized-experiment suite (x125 CUPED / x133 Welch / x148
    // power): here "treatment" (user logs >= 2 high-value purchases)
    // is NOT randomized — more-active users are mechanically more
    // likely to be treated AND to click more, so the naive treated-vs-
    // control click gap is confounded by activity. Propensity e(s) is
    // estimated within activity-quintile strata (quintile cuts from one
    // bounded exact-percentile aggregate, bucketing row-local — no
    // corpus-wide window), and the Hajek-stabilized IPW estimate
    // Σ(Ty/e)/Σ(T/e) − Σ((1−T)y/(1−e))/Σ((1−T)/(1−e)) reweights each
    // stratum to the full population. Positivity violations (strata
    // with e ∈ {0,1}) are EXCLUDED and counted, never divided by.
    // All weighted sums ride the round-6 DECIMAL bridge; e(s) is an
    // exact integer ratio, so weights are bit-identical per engine.
    QuerySpec(
      "x182_ipw_ate",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("t"))
          .localCheckpoint() // one scan feeds quantiles, naive, and IPW
        val qs = u.agg(expr("percentile(act, array(0.2, 0.4, 0.6, 0.8))").as("q"))
        val ub = u.crossJoin(broadcast(qs))
          .select(col("user_id"), col("y"), col("t"),
            ((col("act") > element_at(col("q"), 1)).cast("int") +
             (col("act") > element_at(col("q"), 2)).cast("int") +
             (col("act") > element_at(col("q"), 3)).cast("int") +
             (col("act") > element_at(col("q"), 4)).cast("int")).as("stratum"))
        val es = ub.groupBy("stratum")
          .agg(sum(col("t")).as("nt"), count(lit(1)).as("ns"))
          .select(col("stratum"),
            (col("nt").cast("double") / col("ns").cast("double")).as("e"))
        val w = ub.join(broadcast(es), "stratum")
        val naive = ub.agg(
          count(lit(1)).as("n_users"), sum(col("t")).as("n_treated"),
          (sum(col("t") * col("y")).cast("double") /
            sum(col("t")).cast("double") -
           sum((lit(1L) - col("t")) * col("y")).cast("double") /
            sum(lit(1L) - col("t")).cast("double")).as("naive_diff"))
        val ipw = w.filter(col("e") > 0 && col("e") < 1)
          .agg(count(lit(1)).as("n_used"),
            sum(round(col("t").cast("double") * col("y") / col("e"), 6)
              .cast("decimal(18,6)")).cast("double").as("wy1"),
            sum(round(col("t").cast("double") / col("e"), 6)
              .cast("decimal(18,6)")).cast("double").as("w1"),
            sum(round((lit(1.0) - col("t")) * col("y") / (lit(1.0) - col("e")), 6)
              .cast("decimal(18,6)")).cast("double").as("wy0"),
            sum(round((lit(1.0) - col("t")) / (lit(1.0) - col("e")), 6)
              .cast("decimal(18,6)")).cast("double").as("w0"))
        naive.crossJoin(broadcast(ipw))
          .select(col("n_users"), (col("n_users") - col("n_used")).as("n_excluded"),
            col("n_treated"), round(col("naive_diff"), 6).as("naive_diff"),
            round(col("wy1") / col("w1") - col("wy0") / col("w0"), 6)
              .as("ipw_ate"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS y,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS t
             |      FROM events GROUP BY 1),
             |qs AS (SELECT quantile_cont(act, [0.2, 0.4, 0.6, 0.8]) AS q FROM u),
             |ub AS (SELECT user_id, y, t,
             |        (CASE WHEN act > q[1] THEN 1 ELSE 0 END +
             |         CASE WHEN act > q[2] THEN 1 ELSE 0 END +
             |         CASE WHEN act > q[3] THEN 1 ELSE 0 END +
             |         CASE WHEN act > q[4] THEN 1 ELSE 0 END) AS stratum
             |      FROM u CROSS JOIN qs),
             |es AS (SELECT stratum,
             |        CAST(SUM(t) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS e
             |      FROM ub GROUP BY 1),
             |naive AS (SELECT COUNT(*) AS n_users,
             |        CAST(SUM(t) AS BIGINT) AS n_treated,
             |        CAST(SUM(t * y) AS DOUBLE) / CAST(SUM(t) AS DOUBLE) -
             |        CAST(SUM((1 - t) * y) AS DOUBLE) / CAST(SUM(1 - t) AS DOUBLE)
             |          AS naive_diff
             |      FROM ub),
             |ipw AS (SELECT COUNT(*) AS n_used,
             |        CAST(SUM(CAST(round(CAST(t AS DOUBLE) * y / e, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS wy1,
             |        CAST(SUM(CAST(round(CAST(t AS DOUBLE) / e, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS w1,
             |        CAST(SUM(CAST(round((1.0 - t) * y / (1.0 - e), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS wy0,
             |        CAST(SUM(CAST(round((1.0 - t) / (1.0 - e), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS w0
             |      FROM ub JOIN es USING (stratum) WHERE e > 0 AND e < 1)
             |SELECT naive.n_users, naive.n_users - ipw.n_used AS n_excluded,
             |  naive.n_treated, round(naive.naive_diff, 6) AS naive_diff,
             |  round(ipw.wy1 / ipw.w1 - ipw.wy0 / ipw.w0, 6) AS ipw_ate
             |FROM naive CROSS JOIN ipw ORDER BY n_users""".stripMargin)),
    // McNemar's test (Psychometrika 12, 1947) with continuity correction,
    // on two deterministic quality gates applied to the SAME documents —
    // the PAIRED comparison x133/x158 can't do: when both gates see
    // identical items, only the DISCORDANT cells carry information
    // (χ² = (|b−c|−1)²/(b+c)), so "does switching gate A for gate B
    // change the acceptance rate" is answered without the between-sample
    // variance a two-proportion test would wrongly add. Gates: A =
    // char-length ≥ 300, B = token-count ≥ 56 (the corpus medians) —
    // correlated rules whose marginal rates the test compares; Cohen's
    // kappa rides along as the agreement companion (the x111 device on
    // a rule pair). One corpus scan → four exact integer cells → one
    // row-local double expression per engine; nothing else moves.
    QuerySpec(
      "x185_mcnemar",
      (s, dir) => {
        val g = Tables.documents(s, dir)
          .select(
            when(col("n_chars") >= 300, 1L).otherwise(0L).as("a"),
            when(size(TextFunctions.tokens(col("text"))) >= 56, 1L)
              .otherwise(0L).as("b"))
        val cells = g.agg(count(lit(1)).as("n"),
          sum(col("a") * col("b")).as("n11"),
          sum(col("a") * (lit(1L) - col("b"))).as("n10"),
          sum((lit(1L) - col("a")) * col("b")).as("n01"),
          sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
        cells.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
            when(col("n10") + col("n01") > 0,
              round((abs(col("n10") - col("n01")).cast("double") - 1.0) *
                (abs(col("n10") - col("n01")).cast("double") - 1.0) /
                (col("n10") + col("n01")).cast("double"), 6)).as("chi2"),
            round(((col("n11") + col("n00")).cast("double") / col("n") -
              (((col("n11") + col("n10")).cast("double") / col("n")) *
                ((col("n11") + col("n01")).cast("double") / col("n")) +
               ((col("n01") + col("n00")).cast("double") / col("n")) *
                ((col("n10") + col("n00")).cast("double") / col("n")))) /
              (lit(1.0) - (((col("n11") + col("n10")).cast("double") / col("n")) *
                ((col("n11") + col("n01")).cast("double") / col("n")) +
               ((col("n01") + col("n00")).cast("double") / col("n")) *
                ((col("n10") + col("n00")).cast("double") / col("n")))), 6)
              .as("kappa"))
          .withColumn("verdict",
            when(col("chi2").isNull, "undefined")
              .when(col("chi2") > 3.841459, "marginals differ")
              .otherwise("no evidence"))
          .orderBy("n")
      },
      Some("""WITH g AS (SELECT
             |        CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
             |        CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |            x -> x <> '')) >= 56 THEN 1 ELSE 0 END AS b
             |      FROM documents),
             |c AS (SELECT COUNT(*) AS n,
             |        CAST(SUM(a * b) AS BIGINT) AS n11,
             |        CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
             |        CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
             |        CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
             |      FROM g),
             |r AS (SELECT n, n11, n10, n01, n00,
             |        CASE WHEN n10 + n01 > 0 THEN
             |          round((CAST(abs(n10 - n01) AS DOUBLE) - 1.0) *
             |            (CAST(abs(n10 - n01) AS DOUBLE) - 1.0) /
             |            CAST(n10 + n01 AS DOUBLE), 6) END AS chi2,
             |        round((CAST(n11 + n00 AS DOUBLE) / n -
             |          ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n) +
             |           (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n))) /
             |          (1.0 - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n) +
             |           (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n))), 6)
             |          AS kappa
             |      FROM c)
             |SELECT n, n11, n10, n01, n00, chi2, kappa,
             |  CASE WHEN chi2 IS NULL THEN 'undefined'
             |       WHEN chi2 > 3.841459 THEN 'marginals differ'
             |       ELSE 'no evidence' END AS verdict
             |FROM r ORDER BY n""".stripMargin)),
    // Hill tail-index estimator (Hill, Annals of Statistics 3, 1975):
    // α̂ = 1/H with H = (1/k)·Σ_{i≤k} [ln x_(i) − ln x_(k+1)] over the
    // top-k order statistics of per-user revenue — the standard
    // heavy-tail exponent read. x147's Gini says HOW concentrated
    // revenue is; the Hill α says WHAT LAW the tail follows (α ≤ 2 ⇒
    // infinite variance: sample means are unstable and mean-based
    // anomaly rules are invalid — the check before trusting any
    // per-mean metric on spend data). Only the top k+1 = 65 rows ever
    // leave the aggregate (TakeOrdered; the rank window sits over a
    // LIMIT, PlansSpec rule-1's bounded escape); revenue rides the
    // DECIMAL bridge and the ln terms ride the x85 round-6 ln
    // discipline, so H replays bit-identically.
    QuerySpec(
      "x186_hill_tail",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(round(col("value"), 6).cast("decimal(18,6)"))
            .cast("double").as("rev"))
          .filter(col("rev") > 0)
        val top = u.orderBy(col("rev").desc, col("user_id")).limit(65)
          .withColumn("rn",
            row_number().over(W.orderBy(col("rev").desc, col("user_id"))))
        val thr = top.filter(col("rn") === 65)
          .select(col("rev").as("x_k1"))
        top.filter(col("rn") <= 64).crossJoin(broadcast(thr))
          .agg(count(lit(1)).as("k"),
            max(col("x_k1")).as("x_k1"),
            (sum(round(log(col("rev")) - log(col("x_k1")), 6)
              .cast("decimal(18,6)")).cast("double") /
              count(lit(1)).cast("double")).as("h"))
          .select(col("k"), round(col("x_k1"), 6).as("x_k1"),
            round(col("h"), 6).as("hill_h"),
            round(lit(1.0) / col("h"), 6).as("alpha"),
            round(col("h") / sqrt(col("k").cast("double")), 6).as("se_h"))
          .orderBy("k")
      },
      Some("""WITH u AS (SELECT user_id,
             |        CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS rev
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY 1 HAVING CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) > 0),
             |top AS (SELECT rev, user_id,
             |        row_number() OVER (ORDER BY rev DESC, user_id) AS rn
             |      FROM (SELECT * FROM u ORDER BY rev DESC, user_id LIMIT 65)),
             |thr AS (SELECT rev AS x_k1 FROM top WHERE rn = 65)
             |SELECT COUNT(*) AS k, round(MAX(thr.x_k1), 6) AS x_k1,
             |  round(CAST(SUM(CAST(round(ln(rev) - ln(thr.x_k1), 6)
             |      AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             |    AS hill_h,
             |  round(1.0 / (CAST(SUM(CAST(round(ln(rev) - ln(thr.x_k1), 6)
             |      AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6)
             |    AS alpha,
             |  round((CAST(SUM(CAST(round(ln(rev) - ln(thr.x_k1), 6)
             |      AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             |    / sqrt(CAST(COUNT(*) AS DOUBLE)), 6) AS se_h
             |FROM top CROSS JOIN thr WHERE rn <= 64 ORDER BY k""".stripMargin)),
    // Average precision + best-F1 operating point for a retrieval
    // scorer (the step-integrated AP = Σ ΔRecall·Precision over score
    // thresholds — the threshold formulation sklearn's
    // average_precision_score computes; Manning/Raghavan/Schütze, IR
    // §8.4): scores are cosine-to-the-label-0-centroid (the x12/x184
    // centroid device), positives are label 0 — the "did my embedding
    // scorer put the right class on top" eval complementing x168's
    // ROC-AUC (AP weights the TOP of the ranking, which is what
    // retrieval cares about; AUC weights all pairs equally). Scale
    // discipline: NO corpus-sized ranking window anywhere — scores are
    // rounded-4, so the cumulative thresholds live on the bounded
    // distinct-score grid (≤ 20k rows by construction, an aggregate
    // below the window = PlansSpec rule-1 escape); the per-vector score
    // is one broadcast join + group sum (the x184 pattern). The best-F1
    // sweep rides the same grid: every threshold's F1 from the same
    // cumulative table, argmax tie-broken by higher threshold.
    QuerySpec(
      "x188_average_precision",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("label"), col("dim"),
            col("v").cast("double").as("v"))
          .localCheckpoint() // one explode feeds centroid and scores
        val cen = ex.filter(col("label") === 0).groupBy("dim")
          .agg(sum(round(col("v"), 6).cast("decimal(18,6)")).cast("double")
            .as("sv"), count(lit(1)).as("nc"))
          .select(col("dim"), round(col("sv") / col("nc"), 6).as("c"))
        val cnorm = cen.agg(round(sqrt(sum(col("c") * col("c"))), 4).as("cn"))
        val sc = ex.join(broadcast(cen), "dim")
          .groupBy("vec_id")
          .agg(round(sum(col("v") * col("c")), 4).as("dot"),
            round(sqrt(sum(col("v") * col("v"))), 4).as("nv"),
            max(col("label")).as("label"))
        val scored = sc.crossJoin(broadcast(cnorm))
          .select(col("vec_id"),
            when(col("label") === 0, 1L).otherwise(0L).as("pos"),
            round(col("dot") / (col("nv") * col("cn")), 4).as("s"))
        val g = scored.groupBy("s")
          .agg(count(lit(1)).as("n_g"), sum(col("pos")).as("pos_g"))
        val tot = g.agg(sum(col("n_g")).as("n"), sum(col("pos_g")).as("n_pos"))
        val wcum = W.orderBy(col("s").desc)
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        val cum = g
          .withColumn("tp", sum(col("pos_g")).over(wcum))
          .withColumn("cnt", sum(col("n_g")).over(wcum))
          .crossJoin(broadcast(tot))
          .withColumn("f1",
            round(lit(2.0) * col("tp") / (col("cnt") + col("n_pos")), 6))
          .localCheckpoint() // grid reused for AP, best-F1, and argmax
        val ap = cum.agg(
          sum(round(col("pos_g").cast("double") / col("n_pos") *
            col("tp").cast("double") / col("cnt"), 6).cast("decimal(18,6)"))
            .cast("double").as("ap"),
          max(col("f1")).as("best_f1"),
          max(col("n")).as("n"), max(col("n_pos")).as("n_pos"))
        val thr = cum.join(broadcast(ap.select(col("best_f1"))),
            col("f1") === col("best_f1"))
          .agg(max(col("s")).as("best_thr"))
        ap.crossJoin(broadcast(thr))
          .select(col("n"), col("n_pos"), round(col("ap"), 6).as("ap"),
            col("best_f1"), col("best_thr"))
          .orderBy("n")
      },
      Some("""WITH ex AS (SELECT vec_id, label,
             |        generate_subscripts(embedding, 1) - 1 AS dim,
             |        CAST(unnest(embedding) AS DOUBLE) AS v
             |      FROM embeddings),
             |cen AS (SELECT dim,
             |        round(CAST(SUM(CAST(round(v, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |          / COUNT(*), 6) AS c
             |      FROM ex WHERE label = 0 GROUP BY 1),
             |cnorm AS (SELECT round(sqrt(SUM(c * c)), 4) AS cn FROM cen),
             |sc AS (SELECT vec_id, round(SUM(v * c), 4) AS dot,
             |        round(sqrt(SUM(v * v)), 4) AS nv, MAX(label) AS label
             |      FROM ex JOIN cen USING (dim) GROUP BY 1),
             |scored AS (SELECT vec_id,
             |        CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos,
             |        round(dot / (nv * cn), 4) AS s
             |      FROM sc CROSS JOIN cnorm),
             |g AS (SELECT s, COUNT(*) AS n_g, CAST(SUM(pos) AS BIGINT) AS pos_g
             |      FROM scored GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             |        CAST(SUM(pos_g) AS BIGINT) AS n_pos FROM g),
             |cum AS (SELECT s, n_g, pos_g, tot.n, tot.n_pos,
             |        SUM(pos_g) OVER (ORDER BY s DESC
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             |        SUM(n_g) OVER (ORDER BY s DESC
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
             |      FROM g CROSS JOIN tot),
             |cf AS (SELECT *, round(2.0 * tp / (cnt + n_pos), 6) AS f1 FROM cum),
             |ap AS (SELECT MAX(n) AS n, MAX(n_pos) AS n_pos,
             |        CAST(SUM(CAST(round(CAST(pos_g AS DOUBLE) / n_pos *
             |          CAST(tp AS DOUBLE) / cnt, 6) AS DECIMAL(18,6))) AS DOUBLE) AS ap,
             |        MAX(f1) AS best_f1
             |      FROM cf),
             |thr AS (SELECT MAX(cf.s) AS best_thr FROM cf JOIN ap ON cf.f1 = ap.best_f1)
             |SELECT ap.n, ap.n_pos, round(ap.ap, 6) AS ap, ap.best_f1, thr.best_thr
             |FROM ap CROSS JOIN thr ORDER BY n""".stripMargin)),
    // Hurst exponent via rescaled-range analysis (Hurst, Trans. ASCE
    // 116, 1951; Mandelbrot & Wallis, Water Resources Research 5, 1969):
    // for block sizes m ∈ {8,16,32} over the daily event-count series,
    // R/S per block (range of DECIMAL-bridged cumulative deviations ÷
    // population std from the x171 integer-moment identity), averaged
    // per m, then H = slope of ln(R/S) on ln(m) (the 3-point OLS — the
    // x174 log-log device). H ≈ 0.5 = memoryless traffic; H → 1 =
    // long-range dependence (load bursts cluster across WEEKS — buffer
    // sizing and anomaly baselines must widen); H < 0.5 =
    // anti-persistent. Complements x134's short-lag ACF and x171's
    // within-user burstiness with the LONG-MEMORY read. Shapes: the
    // corpus collapses to calendar-bounded day cells first; day index =
    // row_number over that aggregate (rule-1 escape); within-block
    // windows partition by (m, block) — ≤ 32 rows each; everything
    // downstream is bounded-grid arithmetic.
    QuerySpec(
      "x189_hurst",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("t", row_number().over(W.orderBy("day")))
          .localCheckpoint() // one day table feeds all three block sizes
        val ms = s.range(0, 3).toDF("gi")
          .select(element_at(array(lit(8), lit(16), lit(32)),
            col("gi").cast("int") + 1).as("m"))
        val blk = daily.crossJoin(broadcast(ms))
          .select(col("m"), expr("(t - 1) div m").as("b"),
            expr("(t - 1) % m").as("i"), col("n"))
        val full = blk.groupBy("m", "b")
          .agg(count(lit(1)).as("cnt"), sum(col("n")).as("sn"),
            sum(col("n") * col("n")).as("snn"))
          .filter(col("cnt") === col("m"))
          .select(col("m"), col("b"),
            (col("sn").cast("double") / col("m").cast("double")).as("mu"),
            sqrt(col("snn").cast("double") / col("m").cast("double") -
              (col("sn").cast("double") / col("m").cast("double")) *
                (col("sn").cast("double") / col("m").cast("double")))
              .as("sd"))
        val wz = W.partitionBy("m", "b").orderBy("i")
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        val rs = blk.join(full, Seq("m", "b"))
          .withColumn("z",
            sum(round(col("n").cast("double") - col("mu"), 6)
              .cast("decimal(18,6)")).over(wz).cast("double"))
          .groupBy("m", "b")
          .agg(((max(col("z")) - min(col("z"))) / max(col("sd"))).as("rs_b"),
            max(col("sd")).as("sd"))
          .filter(col("sd") > 0)
        val avg = rs.groupBy("m")
          .agg(count(lit(1)).as("n_blocks"),
            round(sum(round(col("rs_b"), 6).cast("decimal(18,6)"))
              .cast("double") / count(lit(1)).cast("double"), 6).as("avg_rs"))
          .select(col("m"), col("n_blocks"), col("avg_rs"),
            round(log(col("m").cast("double")), 6).as("lx"),
            round(log(col("avg_rs")), 6).as("ly"))
        val fit = avg.agg(count(lit(1)).as("k"),
          sum(col("lx").cast("decimal(18,6)")).cast("double").as("sx"),
          sum(col("ly").cast("decimal(18,6)")).cast("double").as("sy"),
          sum(round(col("lx") * col("lx"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxx"),
          sum(round(col("lx") * col("ly"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxy"))
          .select(round((col("k") * col("sxy") - col("sx") * col("sy")) /
            (col("k") * col("sxx") - col("sx") * col("sx")), 6).as("hurst"))
        avg.crossJoin(broadcast(fit))
          .select(col("m").cast("long").as("m"), col("n_blocks"),
            col("avg_rs"), col("hurst"))
          .orderBy("m")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |dt AS (SELECT day, n, row_number() OVER (ORDER BY day) AS t FROM daily),
             |ms AS (SELECT unnest([8, 16, 32]) AS m),
             |blk AS (SELECT m, (t - 1) // m AS b, (t - 1) % m AS i, n
             |      FROM dt CROSS JOIN ms),
             |fb AS (SELECT m, b,
             |        CAST(SUM(n) AS DOUBLE) / CAST(m AS DOUBLE) AS mu,
             |        sqrt(CAST(SUM(n * n) AS DOUBLE) / CAST(m AS DOUBLE) -
             |          (CAST(SUM(n) AS DOUBLE) / CAST(m AS DOUBLE)) *
             |            (CAST(SUM(n) AS DOUBLE) / CAST(m AS DOUBLE))) AS sd
             |      FROM blk GROUP BY 1, 2 HAVING COUNT(*) = MAX(m)),
             |z AS (SELECT blk.m, blk.b, fb.sd,
             |        CAST(SUM(CAST(round(CAST(blk.n AS DOUBLE) - fb.mu, 6)
             |          AS DECIMAL(18,6))) OVER (PARTITION BY blk.m, blk.b ORDER BY blk.i
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS z
             |      FROM blk JOIN fb USING (m, b)),
             |rs AS (SELECT m, b, (MAX(z) - MIN(z)) / MAX(sd) AS rs_b
             |      FROM z GROUP BY 1, 2 HAVING MAX(sd) > 0),
             |av AS (SELECT m, COUNT(*) AS n_blocks,
             |        round(CAST(SUM(CAST(round(rs_b, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |          / CAST(COUNT(*) AS DOUBLE), 6) AS avg_rs
             |      FROM rs GROUP BY 1),
             |lg AS (SELECT m, n_blocks, avg_rs,
             |        round(ln(CAST(m AS DOUBLE)), 6) AS lx,
             |        round(ln(avg_rs), 6) AS ly FROM av),
             |fit AS (SELECT round((COUNT(*) * CAST(SUM(CAST(round(lx * ly, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) -
             |        CAST(SUM(CAST(lx AS DECIMAL(18,6))) AS DOUBLE) *
             |          CAST(SUM(CAST(ly AS DECIMAL(18,6))) AS DOUBLE)) /
             |        (COUNT(*) * CAST(SUM(CAST(round(lx * lx, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) -
             |        CAST(SUM(CAST(lx AS DECIMAL(18,6))) AS DOUBLE) *
             |          CAST(SUM(CAST(lx AS DECIMAL(18,6))) AS DOUBLE)), 6) AS hurst
             |      FROM lg)
             |SELECT CAST(lg.m AS BIGINT) AS m, lg.n_blocks, lg.avg_rs, fit.hurst
             |FROM lg CROSS JOIN fit ORDER BY m""".stripMargin)))
}
