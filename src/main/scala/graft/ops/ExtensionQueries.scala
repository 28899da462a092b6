package graft.ops

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions

/** LLM-data-pipeline extension queries (BASELINE.md north star): dedup,
  * similarity search, text analysis, multimodal plumbing — each a
  * `queries()` entry with oracle SQL wherever DuckDB can express the same
  * computation. Approximate indexes are made oracle-checkable by
  * construction: LSH/IVF bucket on SEED VECTORS (corpus rows, recomputable
  * in SQL), near-dup search verifies with exact jaccard over raw shingle
  * strings, and the simhash fingerprint itself is built from SQL-replayable
  * arithmetic — so even candidate generation replays in the oracle and
  * every extension query is hash-checked end-to-end.
  */
object ExtensionQueries {

  private val STOPWORDS = Seq("a", "the")

  /** Single source for the x33/x35 merge budget: the Spark trainMerges
    * call, the oracle CTE's recursion bound, and the x35 final-state
    * selector all derive from this one value. */
  private val BpeNumMerges = 20

  /** Shared item co-occurrence graph builders (x85 / x101 / x114 / x120 /
    * x139 / x140): the distinct (user, day, item) context grain, the
    * same-context pair counts with a min-support filter, and the
    * symmetric (src, dst, w) edge list. ONE definition so the context
    * grain and the props→item extraction can't drift between the graph
    * ops (they were six inline copies before round 8's review). */
  private def itemContexts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("item"))
      .distinct()

  /** Same-context item pairs (ia < ib) with co-occurrence count `w`,
    * kept when w >= minW. */
  private def itemPairs(s: org.apache.spark.sql.SparkSession, dir: String,
      minW: Int): org.apache.spark.sql.DataFrame =
    itemPairsFrom(itemContexts(s, dir), minW)

  /** [[itemPairs]] over a caller-supplied (possibly checkpointed) context
    * frame — delegates to [[AssocRules.basketPairs]], the ONE pair
    * builder, so same-basket semantics cannot fork between the graph
    * ops and the rule miner. */
  private def itemPairsFrom(ctx: org.apache.spark.sql.DataFrame,
      minW: Int): org.apache.spark.sql.DataFrame =
    AssocRules.basketPairs(ctx, minW)

  /** Symmetric weighted edge list (both directions of every pair). */
  private def itemEdges(s: org.apache.spark.sql.SparkSession, dir: String,
      minW: Int): org.apache.spark.sql.DataFrame = {
    val pairs = itemPairs(s, dir, minW)
    pairs.select(col("ia").as("src"), col("ib").as("dst"), col("w"))
      .unionByName(pairs.select(col("ib").as("src"), col("ia").as("dst"),
        col("w")))
  }

  /** x130/x141 shared sign-bit packing: 64-dim float embedding → two
    * 32-bit sign words in BIGINTs (lo = dims 0–31, hi = 32–63). */
  private val PackLoExpr: String =
    """aggregate(sequence(0, 31), 0L, (acc, j) ->
      |  acc + IF(CAST(element_at(embedding, j + 1) AS DOUBLE) > 0.0D,
      |           shiftleft(1L, j), 0L))""".stripMargin
  private val PackHiExpr: String =
    """aggregate(sequence(32, 63), 0L, (acc, j) ->
      |  acc + IF(CAST(element_at(embedding, j + 1) AS DOUBLE) > 0.0D,
      |           shiftleft(1L, j - 32), 0L))""".stripMargin

  /** x130/x141 shared exact cosine over (qe, ce) float arrays, rounded
    * to 4 dp BEFORE ranking (cross-engine float-order discipline). */
  private val CosineSim4Expr: String =
    """round(
      |  aggregate(zip_with(qe, ce,
      |      (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
      |    0.0D, (acc, x) -> acc + x)
      |  / (sqrt(aggregate(qe, 0.0D,
      |       (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |   * sqrt(aggregate(ce, 0.0D,
      |       (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |  4)""".stripMargin

  /** x130/x141 shared oracle CTE: the same sign-bit packing in DuckDB. */
  private val BinPackOracleCte: String =
    """p AS (
             |  SELECT vec_id,
             |    CAST(list_sum([CASE WHEN embedding[j + 1] > 0
             |         THEN (1::BIGINT << j) ELSE 0::BIGINT END
             |         for j in range(0, 32)]) AS BIGINT) AS lo,
             |    CAST(list_sum([CASE WHEN embedding[j + 1] > 0
             |         THEN (1::BIGINT << (j - 32)) ELSE 0::BIGINT END
             |         for j in range(32, 64)]) AS BIGINT) AS hi
             |  FROM embeddings)"""

  /** x130/x141 shared oracle CTEs: double-cast embeddings + L2 norms. */
  private val EmbNormOracleCte: String =
    """e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb
             |      FROM embeddings),
             |n AS (SELECT vec_id, emb,
             |        sqrt(list_sum([x * x for x in emb])) AS nrm FROM e)"""

  /** Recursively delete `dir` at JVM exit — for per-invocation scratch
    * roots (x83) whose contents must outlive the query body (the returned
    * DataFrame lazily re-reads them) but not the process. One hook for
    * all registrations. */
  private val exitDirs = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  private lazy val exitHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.forEach { d =>
        val p = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(p)) {
          val it = java.nio.file.Files.walk(p)
          try it.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => try java.nio.file.Files.delete(q)
              catch { case _: java.io.IOException => () })
          finally it.close()
        }
      }))
  private def deleteOnExit(dir: String): Unit = {
    exitHookInstalled
    exitDirs.add(dir)
  }

  /** Drop a per-invocation catalog table at JVM exit so the entry doesn't
    * outlive its deleteOnExit'd data path. Best-effort: the session may
    * already be stopped at hook time, in which case the in-memory catalog
    * died with it anyway. */
  private val exitTables = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), java.lang.Boolean]())
  private lazy val tableHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitTables.forEach { case (sess, name) =>
        try sess.sql(s"DROP TABLE IF EXISTS $name")
        catch { case _: Throwable => () }
      }))
  private def dropTableOnExit(s: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    tableHookInstalled
    exitTables.add((s, name))
  }

  /** Exact count-below over a (value, count) grid WITHOUT any
    * corpus-scale single-partition window — the at-scale global-rank
    * device shared by x165/x166/x168: the naive `cum over the grid`
    * is Rule-1-exempt (aggregate input) but the margin grid's
    * cardinality FOLLOWS the corpus, so that window is still a
    * single-task sort at 100 TB. Two levels fix it exactly: fixed
    * B=1024 coarse buckets from a 1-row min/max broadcast (integer-DIV
    * width, no overflow), cum over the ≤B+1-row bucket aggregate (a
    * genuinely bounded partition-less window), and a within-bucket cum
    * (per-bucket partitions — ordinary distributed windows). Returns
    * (value, c, below) with below = #rows whose value is strictly
    * smaller — identical to the one-window form, so oracles stay on
    * the simple global formulation. */
  private def countBelow(grid: org.apache.spark.sql.DataFrame,
      v: String): org.apache.spark.sql.DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val mm = grid.agg(min(col(v)).as("mn"), max(col(v)).as("mx"))
    val g2 = grid.crossJoin(broadcast(mm))
      .withColumn("bkt", expr(s"($v - mn) div (((mx - mn) div 1024) + 1)"))
    val wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    val bAgg = g2.groupBy("bkt").agg(sum(col("c")).as("bc"))
      .withColumn("bbelow", coalesce(sum(col("bc")).over(wb), lit(0L)))
      .select(col("bkt"), col("bbelow"))
    val wi = W.partitionBy("bkt").orderBy(v)
      .rowsBetween(W.unboundedPreceding, -1)
    g2.withColumn("ibelow", coalesce(sum(col("c")).over(wi), lit(0L)))
      .join(bAgg, "bkt")
      .select(col(v), col("c"), (col("bbelow") + col("ibelow")).as("below"))
  }

  /** Per-GROUP variant of [[countBelow]] (x214): for a (g, v, c) grid of
    * per-group distinct values with multiplicities, returns
    * (g, v, c, below) where below = Σ c over rows of the same group with
    * smaller v — the exact rank machinery for per-group order statistics
    * with NO per-group full sort: values bucket into ≤1024 per-group
    * ranges (the two-level x165/x166/x168 device), the cross-bucket
    * cumulative runs on the group×1024 aggregate frame, and the
    * within-bucket window partitions on (g, bkt) — fine-grained, so a hot
    * group never pins one task. */
  private def countBelowBy(grid: org.apache.spark.sql.DataFrame,
      g: String, v: String): org.apache.spark.sql.DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val mm = grid.groupBy(g).agg(min(col(v)).as("mn"), max(col(v)).as("mx"))
    val g2 = grid.join(broadcast(mm), g)
      .withColumn("bkt", expr(s"($v - mn) div (((mx - mn) div 1024) + 1)"))
    val wb = W.partitionBy(g).orderBy("bkt")
      .rowsBetween(W.unboundedPreceding, -1)
    val bAgg = g2.groupBy(g, "bkt").agg(sum(col("c")).as("bc"))
      .withColumn("bbelow", coalesce(sum(col("bc")).over(wb), lit(0L)))
      .select(col(g), col("bkt"), col("bbelow"))
    val wi = W.partitionBy(g, "bkt").orderBy(v)
      .rowsBetween(W.unboundedPreceding, -1)
    g2.withColumn("ibelow", coalesce(sum(col("c")).over(wi), lit(0L)))
      .join(bAgg, Seq(g, "bkt"))
      .select(col(g), col(v), col("c"),
        (col("bbelow") + col("ibelow")).as("below"))
  }

  /** Shared x202/x211 survival machinery: the per-distinct-time risk grid
    * over the two user-parity arms. Returns (byTime, arms): byTime has one
    * row per informative event time t (dt > 0, nt > 1) with d1 = arm-B
    * deaths, dt = total deaths, n1 = arm-B at-risk, nt = total at-risk;
    * arms is the single row (n_a, n_b). Time-to-event = days from a user's
    * first event to the first 'error' (observed) or to the global max date
    * (censored). At-risk counts come from a reverse-cumulative window over
    * the |distinct t| x 2 grid — aggregate-bounded, never a per-subject
    * rescan — so everything past the two data-scan shuffles (user span,
    * (t, arm) cells) is calendar-sized. ONE definition so the log-rank
    * test and the Cox fit can't drift on the risk-set convention. */
  /** x41/x225 shared DSIR per-doc log importance weights (Xie et al.
    * 2023): hashed unigram+bigram features (poly31 % 64 buckets),
    * per-bucket add-one log-ratio of target (source='src0') vs raw,
    * per-doc logw = Σ cnt·lr over rounded-6 DECIMAL terms, rounded 4.
    * Returns (doc_id, source, n_grams, logw) — x41 projects the
    * doc-grain view, x225 aggregates ESS per source. */
  private def dsirDocWeights(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val m = 64
    val gramBuckets = udf { toks: Seq[String] =>
      val out = new Array[Long](math.max(0, 2 * toks.length - 1))
      var i = 0
      while (i < toks.length) {
        out(i) = Dedup.poly31(toks(i)) % m
        if (i + 1 < toks.length)
          out(toks.length + i) = Dedup.poly31(toks(i) + " " + toks(i + 1)) % m
        i += 1
      }
      out
    }
    val f = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(gramBuckets(TextFunctions.tokens(col("text")))).as("bucket"))
    val df = f.groupBy("doc_id", "source", "bucket")
      .agg(count(lit(1)).as("cnt"))
    val side = f.groupBy("bucket").agg(
      sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"),
      sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("cr"))
    val tot = side.agg(sum("ct").cast("long").as("nt"),
      sum("cr").cast("long").as("nr"))
    val lam = side.crossJoin(broadcast(tot)) // tot is one row
      .select(col("bucket"),
        round(log((col("ct") + 1.0) / (col("nt") + m)) -
          log((col("cr") + 1.0) / (col("nr") + m)), 6)
          .cast("decimal(18,6)").as("lr"))
    df.join(lam, "bucket")
      .groupBy("doc_id", "source")
      .agg(sum("cnt").cast("long").as("n_grams"),
        round(sum(col("cnt") * col("lr")).cast("double"), 4).as("logw"))
  }

  private def armRiskGrid(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val W = org.apache.spark.sql.expressions.Window
    val span = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("f"),
        min(when(col("event_type") === "error", to_date(col("ts"))))
          .as("e"))
    val gmax = span.agg(max(greatest(col("f"), col("e"))).as("gmax"))
    val subj = span.crossJoin(broadcast(gmax))
      .select((col("user_id") % 2).cast("long").as("g"),
        when(col("e").isNotNull, datediff(col("e"), col("f")))
          .otherwise(datediff(col("gmax"), col("f")))
          .cast("long").as("t"),
        col("e").isNotNull.cast("long").as("obs"))
    val perTG = subj.groupBy("t", "g")
      .agg(sum(col("obs")).as("d"), sum(lit(1L) - col("obs")).as("c"))
    val totals = subj.groupBy("g").agg(count(lit(1)).as("ng"))
    val grid = perTG.select("t").distinct()
      .crossJoin(broadcast(subj.select("g").distinct()))
      .join(perTG, Seq("t", "g"), "left")
      .na.fill(0L, Seq("d", "c"))
    val wcum = W.partitionBy("g").orderBy("t")
      .rowsBetween(W.unboundedPreceding, -1)
    val ar = grid.join(broadcast(totals), "g")
      .withColumn("nr", col("ng") -
        coalesce(sum(col("d") + col("c")).over(wcum), lit(0L)))
    val byTime = ar.groupBy("t")
      .agg(sum(when(col("g") === 1, col("d")).otherwise(0L)).as("d1"),
        sum(col("d")).as("dt"),
        sum(when(col("g") === 1, col("nr")).otherwise(0L)).as("n1"),
        sum(col("nr")).as("nt"))
      .filter(col("dt") > 0 && col("nt") > 1)
    val arms = totals.groupBy()
      .agg(sum(when(col("g") === 0, col("ng")).otherwise(0L)).as("n_a"),
        sum(when(col("g") === 1, col("ng")).otherwise(0L)).as("n_b"))
    (byTime, arms)
  }

  /** x161's oracle, generated from the same column list as the query so
    * the 20 pair rows can't drift from the Spark side. */
  private val fdDiscoveryOracle: String = {
    val cs = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderdate", "o_orderpriority")
    val singles = cs.map(c => s"COUNT(DISTINCT $c) AS d_$c")
    val pairs = for { a <- cs; b <- cs if a != b }
      yield s"COUNT(DISTINCT ($a, $b)) AS d_${a}__$b"
    val rows = for { a <- cs; b <- cs if a != b } yield
      s"""SELECT '$a' AS lhs, '$b' AS rhs,
         |  CAST(d_$a AS BIGINT) AS ndv_lhs,
         |  CAST(d_${a}__$b AS BIGINT) AS ndv_pair,
         |  CAST(CASE WHEN d_${a}__$b = d_$a THEN 1 ELSE 0 END AS BIGINT) AS holds,
         |  CAST(d_${a}__$b - d_$a AS BIGINT) AS extra_classes FROM m""".stripMargin
    s"""WITH m AS (SELECT ${(singles ++ pairs).mkString(",\n  ")} FROM orders)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY lhs, rhs""".stripMargin
  }

  /** x33/x35 shared oracle prefix: word counts -> recursive-CTE BPE
    * training state (the whole segmented vocab in one row per step). */
  private val bpeTrainCte: String =
    """WITH RECURSIVE
             |tok AS (
             |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                x -> x <> '')) AS word
             |  FROM documents),
             |wc AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
             |seg0 AS (
             |  SELECT list(struct_pack(
             |      s := list_aggregate(list_transform(regexp_split_to_array(word, ''),
             |                                         c -> chr(1) || c || chr(1)),
             |                          'string_agg', ''),
             |      cnt := cnt)) AS vocab
             |  FROM wc),
             |bpe AS (
             |  SELECT 0 AS step, (SELECT vocab FROM seg0) AS vocab,
             |         CAST(NULL AS VARCHAR) AS m_left, CAST(NULL AS VARCHAR) AS m_right,
             |         CAST(NULL AS BIGINT) AS m_cnt
             |  UNION ALL
             |  SELECT step + 1,
             |         list_transform(vocab, w -> struct_pack(
             |           s := replace(w.s, chr(1)||best.pa||chr(1)||chr(1)||best.pb||chr(1),
             |                        chr(1)||best.pa||best.pb||chr(1)),
             |           cnt := w.cnt)),
             |         best.pa, best.pb, best.c
             |  FROM bpe, LATERAL (
             |    SELECT pa, pb, CAST(SUM(cnt) AS BIGINT) AS c
             |    FROM (
             |      SELECT unnest([struct_pack(pa := syms[i], pb := syms[i+1], cnt := cnt)
             |                     for i in range(1, len(syms))]) AS pr
             |      FROM (SELECT list_filter(string_split(u.w.s, chr(1)), x -> x <> '') AS syms,
             |                   u.w.cnt AS cnt
             |            FROM unnest(vocab) AS u(w))
             |    ) q(pr), LATERAL (SELECT pr.pa AS pa, pr.pb AS pb, pr.cnt AS cnt) e
             |    GROUP BY 1, 2
             |    ORDER BY c DESC, pa, pb
             |    LIMIT 1
             |  ) best
             |  WHERE step < NMERGES
             |)""".stripMargin.replace("NMERGES", BpeNumMerges.toString)

  /** x31/x34 shared oracle: exact near-dup pairs -> transitive closure
    * (recursive CTE) -> min-label components + sizes. */
  /** Shared CTE chain of the x31/x34/x43 oracles: exact 3-gram-jaccard
    * near-dup pairs -> recursive closure -> (doc_id, cluster_id,
    * cluster_size). One source so the pair threshold and closure can never
    * diverge between the cluster oracles. */
  private val dupGraphCtes: String =
    """WITH RECURSIVE t AS (
               |  SELECT doc_id,
               |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
               |  FROM documents),
               |sh AS (
               |  SELECT doc_id,
               |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               |                   for i in range(1, len(toks)-1)]) AS sh
               |  FROM t),
               |p AS (
               |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
               |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
               |    AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) >= 0.8),
               |e AS (SELECT doc_a AS a, doc_b AS b FROM p
               |      UNION ALL SELECT doc_b, doc_a FROM p),
               |reach(a, b) AS (
               |  SELECT DISTINCT a, a AS b FROM e
               |  UNION
               |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
               |lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY 1),
               |siz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)""".stripMargin

  private val dupClustersOracle: String =
    dupGraphCtes + "\n" +
      """SELECT lab.doc_id, lab.cluster_id, siz.cluster_size
        |FROM lab JOIN siz USING (cluster_id) ORDER BY doc_id""".stripMargin

  def all: Seq[QuerySpec] = Seq(

    // -------------------------------------------------------------- dedup
    QuerySpec(
      "x1_dedup_exact",
      (s, dir) =>
        Dedup.exact(Tables.documents(s, dir), "doc_id", "text").orderBy("digest"),
      Some("""SELECT sha256(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin)),

    // MinHash+LSH near-dups. Oracle-checked: candidates come from banding
    // (engine-specific hashes), but the VERIFY stage recomputes exact
    // jaccard over raw word-shingle string sets and thresholds on that, so
    // the emitted rows equal DuckDB's brute-force sweep — banding recall at
    // this corpus's dup similarity (j >= 0.9, next pair 0.0667, measured)
    // is 1 - 4e-8.
    QuerySpec(
      "x2_dedup_minhash",
      (s, dir) =>
        Dedup.minhashNearDups(Tables.documents(s, dir), "doc_id", "text",
            k = 64, bands = 16, threshold = 0.8)
          .orderBy("doc_a", "doc_b"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                   for i in range(1, len(toks)-1)]) AS sh
             |  FROM t),
             |p AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na, len(b.sh) AS nb
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
             |SELECT doc_a, doc_b, round(CAST(i AS DOUBLE)/(na+nb-i), 4) AS jaccard
             |FROM p WHERE round(CAST(i AS DOUBLE)/(na+nb-i), 4) >= 0.8
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // SimHash near-dups, FULLY oracle-checked: the fingerprint is built from
    // SQL-replayable pieces (polynomial shingle hash, parity-of-universal-
    // hash bit lanes — Dedup.simhashUdf), the 8x8-bit chunk candidates are
    // pigeonhole-complete for hamming <= 7, so the emitted pair set equals
    // the brute-force hamming sweep the oracle runs. The 64 per-bit SQL
    // terms are generated from the SAME constants as the kernel.
    QuerySpec(
      "x3_dedup_simhash",
      (s, dir) =>
        Dedup.simhashNearDups(Tables.documents(s, dir), "doc_id", "text",
            maxHamming = 6)
          .orderBy("doc_a", "doc_b"),
      Some(s"""WITH t AS (
              |  SELECT doc_id,
              |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
              |  FROM documents),
              |sh AS (
              |  SELECT doc_id,
              |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
              |                   for i in range(1, len(toks)-1)]) AS shs
              |  FROM t),
              |hs AS (
              |  SELECT doc_id, shs,
              |    [list_reduce(list_prepend(CAST(0 AS BIGINT),
              |                              [CAST(ord(c) AS BIGINT) for c in string_split(s, '')]),
              |                 (acc, x) -> (acc*31 + x) % 2147483647) for s in shs] AS hs
              |  FROM sh WHERE len(shs) > 0),
              |sim AS (
              |  SELECT doc_id, shs,
              |    CAST(${Dedup.simhashOracleTerms("hs")} AS BIGINT) AS simhash
              |  FROM hs),
              |p AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming,
              |    len(list_intersect(a.shs, b.shs)) AS i,
              |    len(a.shs) AS na, len(b.shs) AS nb
              |  FROM sim a JOIN sim b ON a.doc_id < b.doc_id)
              |SELECT doc_a, doc_b, hamming,
              |  round(CAST(i AS DOUBLE)/(na+nb-i), 4) AS jaccard
              |FROM p WHERE hamming <= 6
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // Exact blocked n-gram Jaccard — oracle-checkable dedup ground truth.
    QuerySpec(
      "x4_ngram_jaccard",
      (s, dir) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), threshold = 0.65)
          .orderBy("doc_a", "doc_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id, lang, source, n_chars,
             |    list_distinct([text[i:i+2] for i in range(1, length(text)-1)]) AS sh
             |  FROM documents),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.sh, b.sh)) AS i,
             |    len(a.sh) AS na, len(b.sh) AS nb
             |  FROM sh a JOIN sh b
             |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |    AND abs(a.n_chars - b.n_chars) <= greatest(a.n_chars, b.n_chars) * 0.2)
             |SELECT doc_a, doc_b,
             |  round(CAST(i AS DOUBLE) / (na + nb - i), 4) AS jaccard
             |FROM pairs
             |WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 4) >= 0.65
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // --------------------------------------------------------- similarity
    // Brute-force cosine top-5 for query vectors (vec_id < 20) — the exact
    // baseline an ANN variant is judged against.
    QuerySpec(
      "x5_cosine_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.cosineTopK(
            e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb
             |  FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |f AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.nrm AS qn, c.nrm AS cn,
             |    unnest(q.emb) AS qv, unnest(c.emb) AS cv
             |  FROM n q CROSS JOIN n c
             |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
             |d AS (
             |  SELECT qid, cid,
             |    round(sum(qv * cv) / (any_value(qn) * any_value(cn)), 4) AS sim
             |  FROM f GROUP BY qid, cid)
             |SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM d QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // LSH-bucketed ANN with SEED-VECTOR planes: bucket bit i is the sign of
    // the dot product against corpus row i — a pure function of the data —
    // so the oracle recomputes the buckets, the candidate set, and the
    // ranking. Fully hash-checked despite being an approximate index.
    // (The seeded-PRNG plane variant, lshTopK, stays in the library with
    // recall asserted in SimilaritySpec.)
    QuerySpec(
      "x6_ann_lsh",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopKSeeded(
            e.filter(col("vec_id") < 20), e, "vec_id", "embedding",
            k = 5, seedIds = Seq(0L, 1L, 2L, 3L))
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |s AS (SELECT vec_id AS sid, emb AS semb FROM e WHERE vec_id IN (0,1,2,3)),
             |b AS (
             |  SELECT e.vec_id, e.emb, sqrt(list_sum([x*x for x in e.emb])) AS nrm,
             |    CAST(sum(CASE WHEN list_sum([e.emb[i]*s.semb[i] for i in range(1,65)]) >= 0
             |             THEN power(2, s.sid) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM e CROSS JOIN s GROUP BY e.vec_id, e.emb),
             |f AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
             |  WHERE q.vec_id < 20)
             |SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM f QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // IVF ANN with SEED-VECTOR centroids (Voronoi cells of corpus rows 0..7,
    // multi-probe 3): the quantizer is argmin L2 to named data rows, so the
    // oracle replays cell assignment, probing, and ranking exactly. The
    // Lloyd-k-means variant (ivfTopK) stays in the library with recall
    // asserted in SimilaritySpec.
    QuerySpec(
      "x13_ann_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfTopKSeeded(
            e.filter(col("vec_id") < 20), e, "vec_id", "embedding",
            k = 5, nProbe = 3, seedIds = (0L to 7L))
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |s AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |      FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |d AS (
             |  SELECT e.vec_id, s.cell,
             |    list_sum([(e.emb[i]-s.cemb[i])*(e.emb[i]-s.cemb[i]) for i in range(1,65)]) AS d2
             |  FROM e CROSS JOIN s),
             |ranked AS (
             |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
             |  FROM d),
             |assign AS (SELECT vec_id, cell FROM ranked WHERE rnk = 1),
             |probe AS (SELECT vec_id, cell FROM ranked WHERE rnk <= 3 AND vec_id < 20),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x*x for x in emb])) AS nrm FROM e),
             |f AS (
             |  SELECT p.vec_id AS qid, a.vec_id AS cid,
             |    round(list_sum([qn.emb[i]*cn.emb[i] for i in range(1,65)]) / (qn.nrm*cn.nrm), 4) AS sim
             |  FROM probe p JOIN assign a ON p.cell = a.cell AND p.vec_id <> a.vec_id
             |  JOIN n qn ON qn.vec_id = p.vec_id JOIN n cn ON cn.vec_id = a.vec_id)
             |SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM f QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // ------------------------------------------------------ text analysis
    QuerySpec(
      "x7_text_quality",
      (s, dir) => {
        val t = TextFunctions.tokens(col("text"))
        Tables.documents(s, dir).select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_distinct"),
          TextFunctions.avgTokenLen(col("text")).as("avg_token_len"),
          TextFunctions.stopwordRatio(col("text"), STOPWORDS).as("stopword_ratio"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"),
          TextFunctions.qualityScore(col("text"), STOPWORDS).as("quality"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text AS txt,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS BIGINT) AS n_tokens,
             |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             |    round(CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks), 4) AS avg_token_len,
             |    round(CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
             |    round(CAST(len(regexp_extract_all(txt, '[.,;:!?]')) AS DOUBLE)
             |          / greatest(length(txt), 1), 4) AS punct_ratio
             |  FROM t)
             |SELECT doc_id, n_tokens, n_distinct, avg_token_len, stopword_ratio, punct_ratio,
             |  round(((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
             |       + (CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
             |       + (CASE WHEN stopword_ratio > 0.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
             |FROM m ORDER BY doc_id""".stripMargin)),

    QuerySpec(
      "x8_langid",
      (s, dir) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          TextFunctions.langId(col("text")).as("predicted"),
          TextFunctions.markerVotes(col("text"), TextFunctions.langMarkers.head._2)
            .as("en_votes"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |v AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(toks, x -> x IN ('the','a','and','of','to','is'))) AS BIGINT) AS v_en,
             |    CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS BIGINT) AS v_de,
             |    CAST(len(list_filter(toks, x -> x IN ('el','la','los','las','es','una'))) AS BIGINT) AS v_es,
             |    CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','une'))) AS BIGINT) AS v_fr
             |  FROM t)
             |SELECT doc_id,
             |  CASE WHEN v_en > 0 AND v_en >= greatest(v_en, v_de, v_es, v_fr) THEN 'en'
             |       WHEN v_de > 0 AND v_de >= greatest(v_en, v_de, v_es, v_fr) THEN 'de'
             |       WHEN v_es > 0 AND v_es >= greatest(v_en, v_de, v_es, v_fr) THEN 'es'
             |       WHEN v_fr > 0 AND v_fr >= greatest(v_en, v_de, v_es, v_fr) THEN 'fr'
             |       ELSE 'und' END AS predicted,
             |  v_en AS en_votes
             |FROM v ORDER BY doc_id""".stripMargin)),

    QuerySpec(
      "x9_token_freq",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy("token"),
      Some("""SELECT token, COUNT(*) AS n FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                            x -> x <> '')) AS token
             |  FROM documents)
             |GROUP BY token ORDER BY token""".stripMargin)),

    QuerySpec(
      "x10_fingerprint",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |                 [CAST(ord(c) AS BIGINT) for c in string_split(text, '')]),
             |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Normalized-text exact dedup: formatting variants collapse to one
    // canonical form before hashing (standard dedup preprocessing).
    QuerySpec(
      "x16_normalized_dedup",
      // r3: NFC normalization now leads the pipeline (unicode canonical
      // form BEFORE case/whitespace folding — see x32), so byte-different
      // but render-identical docs hash together.
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.documents(s, dir)
          .select(TextFunctions.normalized(expr("nfc_normalize(text)")).as("norm"),
            col("doc_id"))
          .groupBy(sha2(col("norm").cast("binary"), 256).as("digest"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_variants"))
          .orderBy("digest")
      },
      Some("""SELECT sha256(lower(trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g')))) AS digest,
             |  MIN(doc_id) AS keep_id, COUNT(*) AS n_variants
             |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin)),

    // Winnowing fingerprints (MOSS positional semantics): the fused kernel
    // slides windows over the ORDERED char-trigram hash sequence; the
    // trigram hash is a plain polynomial over code units so the oracle
    // recomputes every fingerprint from the text. Emits distinct-count +
    // min/max/sum — a full digest of the fingerprint set.
    QuerySpec(
      "x17_winnow_fingerprints",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            TextFunctions.winnowStatsUdf(col("text"), lit(8)).as("st"))
          .select(col("doc_id"), col("st.n_fingerprints").as("n_fingerprints"),
            col("st.fp_min").as("fp_min"), col("st.fp_max").as("fp_max"),
            col("st.fp_sum").as("fp_sum"))
          .orderBy("doc_id"),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    [ord(text[i:i]) * 961 + ord(text[i+1:i+1]) * 31 + ord(text[i+2:i+2])
             |     for i in range(1, length(text)-1)] AS hs
             |  FROM documents),
             |w AS (
             |  SELECT doc_id, CASE WHEN len(hs) < 8 THEN list_distinct(hs)
             |    ELSE list_distinct([list_min(hs[i:i+7]) for i in range(1, len(hs)-6)]) END AS fp
             |  FROM h)
             |SELECT doc_id,
             |  CAST(len(fp) AS BIGINT) AS n_fingerprints,
             |  CAST(list_min(fp) AS BIGINT) AS fp_min,
             |  CAST(list_max(fp) AS BIGINT) AS fp_max,
             |  CAST(list_sum(fp) AS BIGINT) AS fp_sum
             |FROM w ORDER BY doc_id""".stripMargin)),

    // Embedding-cosine near-dup pairs bucketed by SEED-VECTOR planes
    // (corpus rows 0,1): buckets, candidate pairs, and sims are all
    // recomputable from the table, so the approximate index is still
    // hash-checked end-to-end. Threshold 0.4 matches this corpus's tail.
    QuerySpec(
      "x15_cosine_neardup",
      (s, dir) =>
        Similarity.cosineNearDupsSeeded(Tables.embeddings(s, dir), "vec_id",
            "embedding", threshold = 0.4, seedIds = Seq(0L, 1L))
          .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |s AS (SELECT vec_id AS sid, emb AS semb FROM e WHERE vec_id IN (0,1)),
             |b AS (
             |  SELECT e.vec_id, e.emb, sqrt(list_sum([x*x for x in e.emb])) AS nrm,
             |    CAST(sum(CASE WHEN list_sum([e.emb[i]*s.semb[i] for i in range(1,65)]) >= 0
             |             THEN power(2, s.sid) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM e CROSS JOIN s GROUP BY e.vec_id, e.emb),
             |p AS (
             |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             |    round(list_sum([a.emb[i]*b2.emb[i] for i in range(1,65)]) / (a.nrm*b2.nrm), 4) AS sim
             |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
             |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.4
             |ORDER BY id_a, id_b""".stripMargin)),

    // BPE-ish pre-token counting (letter/digit/punct runs).
    QuerySpec(
      "x14_bpe_tokens",
      (s, dir) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe"),
          TextFunctions.approxLlmTokens(col("text")).as("n_llm_est"),
          TextFunctions.tokenCount(col("text")).as("n_ws"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${TextFunctions.bpePattern}')) AS BIGINT) AS n_bpe,
              |  CAST(greatest(
              |    len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')),
              |    CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS n_llm_est,
              |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_ws
              |FROM documents ORDER BY doc_id""".stripMargin)),

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

    // PII scrubbing: pattern counts + the digest of the redacted text, so
    // the oracle verifies the REDACTION itself, not just the counts.
    // Patterns are RE2-safe so the same regex runs in any engine.
    QuerySpec(
      "x20_pii_redact",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val digits = "[0-9]{4,}"
        Tables.documents(s, dir).select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(digits), lit(0)))
            .cast("long").as("n_digit_runs"),
          sha2(regexp_replace(
            regexp_replace(col("text"), email, "<EMAIL>"),
            digits, "<NUM>").cast("binary"), 256).as("redacted_digest"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS BIGINT) AS n_digit_runs,
             |  sha256(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '[0-9]{4,}', '<NUM>', 'g')) AS redacted_digest
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Benchmark contamination: corpus docs sharing >= 1 word-8-gram with the
    // "benchmark" slice (doc_id % 97 == 0). One equi-join on SQL-replayable
    // gram hashes — no pairwise comparison (Dedup.contamination).
    QuerySpec(
      "x21_contamination",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.contamination(docs, docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", n = 8)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    list_distinct([list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |        [CAST(ord(c) AS BIGINT)
             |         for c in string_split(array_to_string(toks[i:i+7], ' '), '')]),
             |      (acc, x) -> (acc*31 + x) % 2147483647)
             |      for i in range(1, len(toks) - 6)]) AS grams
             |  FROM t WHERE len(toks) >= 8),
             |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
             |cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0)
             |SELECT doc_id, CAST(COUNT(DISTINCT cg.gram) AS BIGINT) AS n_shared_grams
             |FROM cg JOIN bg USING (gram)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Character-entropy quality filter (the classic cheap perplexity proxy:
    // C4/RefinedWeb-style pipelines band-filter on it). Kernel UDF; the
    // oracle recomputes H from a char-frequency group-by, and the 4-decimal
    // round absorbs summation-order ULPs.
    QuerySpec(
      "x23_char_entropy",
      (s, dir) =>
        Tables.documents(s, dir)
          // bind the kernel once; band-check the ROUNDED value so both
          // engines compare the identical 4-decimal number at the boundary
          .select(col("doc_id"),
            round(TextFunctions.charEntropyUdf(col("text")), 4).as("entropy_bits"))
          .select(col("doc_id"), col("entropy_bits"),
            col("entropy_bits").between(2.5, 5.5).cast("long").as("passes_band"))
          .orderBy("doc_id"),
      Some("""WITH c AS (
             |  SELECT doc_id, length(text) AS n, unnest(string_split(text, '')) AS ch
             |  FROM documents),
             |f AS (SELECT doc_id, n, COUNT(*) AS cnt FROM c GROUP BY doc_id, n, ch),
             |h AS (
             |  SELECT doc_id,
             |    round(-SUM((CAST(cnt AS DOUBLE)/n) * log2(CAST(cnt AS DOUBLE)/n)), 4)
             |      AS entropy_bits
             |  FROM f GROUP BY doc_id)
             |SELECT doc_id, entropy_bits,
             |  CAST(CASE WHEN entropy_bits BETWEEN 2.5 AND 5.5 THEN 1 ELSE 0 END AS BIGINT)
             |    AS passes_band
             |FROM h ORDER BY doc_id""".stripMargin)),

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

    // Int8 embedding quantization (4x ANN index compression): per-vector
    // scale, quantized range, and dequantization MSE — every column
    // recomputable from the raw floats.
    QuerySpec(
      "x25_int8_quantize",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("vec_id"),
            Similarity.int8QuantUdf(col("embedding")).as("qs"))
          .select(col("vec_id"),
            col("qs.q_min").cast("long").as("q_min"),
            col("qs.q_max").cast("long").as("q_max"),
            round(col("qs.mse_e6"), 4).as("mse_e6"))
          .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |s AS (SELECT vec_id, emb, list_max([abs(x) for x in emb]) / 127 AS scale FROM e
             |      WHERE list_max([abs(x) for x in emb]) > 0),
             |q AS (SELECT vec_id, scale, emb,
             |        [greatest(-127, least(127, round(x / scale))) for x in emb] AS qs
             |      FROM s)
             |SELECT vec_id,
             |  CAST(list_min(qs) AS BIGINT) AS q_min,
             |  CAST(list_max(qs) AS BIGINT) AS q_max,
             |  round(list_sum([(qs[i]*scale - emb[i]) * (qs[i]*scale - emb[i])
             |                  for i in range(1, len(emb)+1)]) / len(emb) * 1000000, 4)
             |    AS mse_e6
             |FROM q ORDER BY vec_id""".stripMargin)),

    // The WHOLE cleaning pipeline composed, oracle-checked end-to-end:
    // quality gate -> exact dedup (keep min id per digest) -> near-dup
    // removal (drop the larger id of every j>=0.8 pair) -> surviving docs.
    // This is Dedup.dedupCorpus — the operator a user actually runs — and
    // the oracle replays every stage from raw text.
    QuerySpec(
      "x22_clean_corpus",
      (s, dir) => {
        val clean = Tables.documents(s, dir)
          .filter(TextFunctions.qualityScore(col("text"), STOPWORDS) >= 0.9999)
        Dedup.dedupCorpus(clean, "doc_id", "text", threshold = 0.8)
          .select(col("doc_id"), col("lang"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, text,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, lang, text, toks, CAST(len(toks) AS BIGINT) AS n_tokens
             |  FROM t
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
             |        (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))), 4) >= 0.8)
             |SELECT doc_id, lang, n_tokens FROM ae
             |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
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

    // Per-label embedding centroid, element-wise (the relational twin of
    // functions.VectorAggregates.CentroidAggregator — equality of the two
    // is asserted in VectorAggregatesSpec; this flat shape is what the
    // oracle can express).
    QuerySpec(
      "x12_centroid",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("label"), (col("pos") + 1).cast("long").as("pos"))
          // + 0.0 folds IEEE -0.0 to +0.0 (engines differ; hash compare cares)
          .agg((round(avg(col("v").cast("double")), 3) + 0.0).as("mean_v"),
            count(lit(1)).as("n"))
          .orderBy("label", "pos"),
      Some("""SELECT label, CAST(pos AS BIGINT) AS pos,
             |  round(avg(CAST(v AS DOUBLE)), 3) + 0.0 AS mean_v, COUNT(*) AS n
             |FROM (SELECT label, unnest(embedding) AS v,
             |        generate_subscripts(embedding, 1) AS pos
             |      FROM embeddings)
             |GROUP BY label, pos ORDER BY label, pos""".stripMargin)),

    // ------------------------------------------------- quality (Gopher-style)
    // Repetition/quality signals from the Gopher corpus filters (public
    // paper, Rae et al. 2021 §A1.1) + a keep gate over the ROUNDED values
    // (both engines gate on the identical 4-decimal number, so boundary
    // rows can't flip). Row-local compiled kernel — no shuffle at any scale.
    QuerySpec(
      "x26_gopher_quality",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            TextFunctions.gopherStatsUdf(col("text")).as("g"))
          .select(col("doc_id"), col("g.n_words").as("n_words"),
            round(col("g.distinct_frac"), 4).as("distinct_frac"),
            round(col("g.stopword_frac"), 4).as("stopword_frac"),
            round(col("g.mean_word_len"), 4).as("mean_word_len"),
            round(col("g.top_bigram_frac"), 4).as("top_bigram_frac"),
            round(col("g.dup_trigram_frac"), 4).as("dup_trigram_frac"))
          .withColumn("keep",
            (col("n_words") >= 30 && col("mean_word_len").between(3.0, 10.0) &&
              col("stopword_frac") >= 0.01 && col("distinct_frac") >= 0.3 &&
              col("top_bigram_frac") <= 0.1 && col("dup_trigram_frac") <= 0.02)
              .cast("long"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, toks, len(toks) AS n_words,
             |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bigrams,
             |    [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)] AS trigrams
             |  FROM t),
             |m AS (
             |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             |    round(CAST(len(list_distinct(toks)) AS DOUBLE)/n_words, 4) AS distinct_frac,
             |    round(CAST(len(list_filter(toks, w -> w = 'a' OR w = 'the')) AS DOUBLE)/n_words, 4) AS stopword_frac,
             |    round(CAST(list_sum([length(w) for w in toks]) AS DOUBLE)/n_words, 4) AS mean_word_len,
             |    round(CAST(list_max([len(list_filter(bigrams, x -> x = b)) for b in bigrams]) AS DOUBLE)/len(bigrams), 4) AS top_bigram_frac,
             |    round(CAST(len(trigrams) - len(list_distinct(trigrams)) AS DOUBLE)/len(trigrams), 4) AS dup_trigram_frac
             |  FROM g)
             |SELECT *,
             |  CAST(CASE WHEN n_words >= 30 AND mean_word_len BETWEEN 3.0 AND 10.0
             |    AND stopword_frac >= 0.01 AND distinct_frac >= 0.3
             |    AND top_bigram_frac <= 0.1 AND dup_trigram_frac <= 0.02
             |    THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),

    // --------------------------------------------- segment-level dedup (CCNet)
    // CCNet-style duplicated-segment removal (Wenzek et al. 2019, public):
    // docs split into consecutive 10-word segments, every segment occurring
    // more than once in the corpus is dropped (all copies), survivors are
    // reassembled in position order. Two key-distributed shuffles (segment
    // count, doc regroup) — the linear-scale shape of paragraph dedup at
    // 100 TB; the segment payload never rides through a wide join.
    QuerySpec(
      "x27_segment_dedup",
      (s, dir) => {
        val withSegs = Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            transform(
              sequence(lit(0), ceil(size(col("toks")) / 10.0).cast("int") - 1),
              i => array_join(slice(col("toks"), i * 10 + 1, lit(10)), " ")).as("segs"))
        val seg = withSegs.select(col("doc_id"),
          posexplode(col("segs")).as(Seq("pos", "seg")))
        val uniqueSegs = seg.groupBy("seg").agg(count(lit(1)).as("c"))
          .where(col("c") === 1).select("seg")
        val agg = seg.join(uniqueSegs, "seg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            array_join(
              transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
                x => x("seg")), " ").as("kept_text"))
        withSegs.select(col("doc_id"), size(col("segs")).cast("long").as("n_segments"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_segments"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            sha2(coalesce(col("kept_text"), lit("")), 256).as("kept_digest"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |seg AS (
             |  SELECT doc_id, i AS pos, array_to_string(toks[10*i+1:10*i+10], ' ') AS seg
             |  FROM (SELECT doc_id, toks,
             |          unnest(range(0, CAST(ceil(len(toks)/10.0) AS INT))) AS i
             |        FROM t)),
             |cnt AS (SELECT seg, COUNT(*) AS c FROM seg GROUP BY 1),
             |kept AS (SELECT s.doc_id, s.pos, s.seg
             |         FROM seg s JOIN cnt ON s.seg = cnt.seg WHERE cnt.c = 1),
             |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
             |          string_agg(seg, ' ' ORDER BY pos) AS kept_text
             |        FROM kept GROUP BY 1)
             |SELECT t.doc_id, CAST(ceil(len(t.toks)/10.0) AS BIGINT) AS n_segments,
             |  COALESCE(a.n_kept, 0) AS n_kept,
             |  sha256(COALESCE(a.kept_text, '')) AS kept_digest
             |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // ------------------------------------------------ BPE merge-pair counts
    // The counting step of one BPE merge iteration (Sennrich et al. 2015,
    // public): adjacent character-pair frequencies across the corpus, top 20
    // (count desc, pair asc — deterministic). explode + groupBy: one
    // key-distributed shuffle over a ≤(alphabet²)-cardinality key space, so
    // the reduce side is tiny no matter the corpus size.
    QuerySpec(
      "x28_bpe_merge_pairs",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("word"))
          .where(length(col("word")) >= 2)
          .select(explode(
            transform(sequence(lit(1), length(col("word")) - 1),
              i => col("word").substr(i, lit(2)))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(20),
      Some("""WITH w AS (
             |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                x -> x <> '')) AS word
             |  FROM documents),
             |p AS (
             |  SELECT unnest([substr(word, i, 2) for i in range(1, len(word))]) AS pair
             |  FROM w WHERE len(word) >= 2)
             |SELECT pair, COUNT(*) AS cnt FROM p
             |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin)),

    // ---------------------------------------------------------- TF-IDF
    // Corpus IDF + per-doc top tf-idf term (rank by the ROUNDED score, then
    // term — both engines rank the identical number, so ulp differences in
    // ln() can't flip the winner). The df side is NOT broadcast: at the
    // 100 TB design point the distinct-term table (typos, numbers, code
    // tokens) is 10⁸–10⁹ rows, far past executor memory. Both sides are
    // already hash-clustered by `term` from their own groupBys, so the
    // shuffle join co-partitions cheaply — and AQE still converts to a
    // broadcast at runtime when the vocabulary is genuinely small.
    QuerySpec(
      "x29_tfidf_topterm",
      (s, dir) => {
        val terms = Tables.documents(s, dir)
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = terms.groupBy("term").agg(countDistinct("doc_id").as("df"))
        val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
        val scored = tf.join(df, "term").crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"),
            round(col("tf") * log(col("n").cast("double") / col("df")), 4).as("tfidf"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
        scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("doc_id"), col("term").as("top_term"), col("tf"), col("tfidf"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |           x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n FROM documents),
             |s AS (SELECT tf.doc_id, tf.term, tf.tf,
             |        round(tf.tf * ln(CAST(n.n AS DOUBLE)/df.df), 4) AS tfidf
             |      FROM tf JOIN df USING(term) CROSS JOIN n),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY tfidf DESC, term) AS rn FROM s)
             |SELECT doc_id, term AS top_term, tf, tfidf FROM r WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ product quantization
    // PQ codes + reconstruction distortion over the embedding table, with a
    // seed-vector codebook (16 centroids × 8 subspaces of 8 dims) the
    // oracle rebuilds from the table itself. Row-local kernel; no shuffle.
    QuerySpec(
      "x30_pq_codes",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val codebook = Similarity
          .seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        Similarity.pqEncode(e, "vec_id", "embedding", m = 8, codebook)
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb
             |           FROM embeddings),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (
             |  SELECT e.vec_id, sub.s, cb.c,
             |    list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |              *(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |              for i in range(1, 9)]) AS d2
             |  FROM e CROSS JOIN sub CROSS JOIN cb),
             |best AS (SELECT vec_id, s, c, d2,
             |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk
             |         FROM d),
             |agg AS (SELECT vec_id, string_agg(c, '-' ORDER BY s) AS codes, SUM(d2) AS sse
             |        FROM best WHERE rnk = 1 GROUP BY 1)
             |SELECT vec_id, codes, round(sse/64*1000000, 4) AS mse_e6
             |FROM agg ORDER BY vec_id""".stripMargin)),

    // --------------------------------------------- duplicate clusters (CC)
    // Connected components over the near-dup pair graph: pairs come from
    // MinHash banding + exact-jaccard verify (same emitted set as the
    // oracle's brute-force sweep — see x2), components from min-label
    // propagation. The oracle replays the closure with a recursive CTE.
    QuerySpec(
      "x31_dup_clusters",
      (s, dir) => {
        val pairs = Dedup.minhashNearDups(Tables.documents(s, dir),
          "doc_id", "text", k = 64, bands = 16, threshold = 0.8)
        Dedup.dupClusters(pairs).orderBy("doc_id")
      },
      Some(dupClustersOracle)),

    // Same components via the large-star/small-star algorithm (O(log² n)
    // rounds — the variant for adversarially deep dup graphs); identical
    // output contract, so the oracle is x31's recursive-CTE closure.
    QuerySpec(
      "x34_dup_clusters_star",
      (s, dir) => {
        val pairs = Dedup.minhashNearDups(Tables.documents(s, dir),
          "doc_id", "text", k = 64, bands = 16, threshold = 0.8)
        Dedup.dupClustersStar(pairs).orderBy("doc_id")
      },
      Some(dupClustersOracle)),


    // ------------------------------------------- unicode canonicalization
    // NFC normalization + mojibake repair (the cleaning every production
    // corpus pipeline runs BEFORE dedup). The corpus is ASCII, so each doc
    // is suffixed in-plan with a decomposed sequence (e + U+0301, A +
    // U+030A) and a windows-1252 double-decode ("cafÃ©â€™s") — both sides
    // build the identical damaged string from the data, normalize/repair
    // with their own engine (Spark: codegen'd UnicodeNormalize /
    // RepairMojibake expressions; DuckDB: nfc_normalize + the targeted
    // byte-sequence replaces the general repair provably reduces to here).
    QuerySpec(
      "x32_unicode_normalize",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 40),
              lit(" Cafe\u0301 A\u030A")).as("raw"), // decomposed e+acute, A+ring
            concat(substring(col("text"), 1, 40),
              lit(" caf\u00C3\u00A9\u00E2\u20AC\u2122s")).as("moji")) // "café’s" cp1252-damaged
          .select(col("doc_id"),
            expr("nfc_normalize(raw)").as("nfc_text"),
            (col("raw") =!= expr("nfc_normalize(raw)")).cast("long").as("nfc_changed"),
            (length(col("raw")) - length(expr("nfc_normalize(raw)"))).as("nfc_len_delta"),
            expr("repair_mojibake(moji)").as("fixed_text"),
            (col("moji") =!= expr("repair_mojibake(moji)")).cast("long").as("fixed_changed"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (
             |  SELECT doc_id,
             |         substr(text, 1, 40) || ' Cafe' || chr(769) || ' A' || chr(778) AS raw,
             |         substr(text, 1, 40) || ' caf' || chr(195) || chr(169)
             |           || chr(226) || chr(8364) || chr(8482) || 's' AS moji
             |  FROM documents)
             |SELECT doc_id,
             |       nfc_normalize(raw) AS nfc_text,
             |       CAST(raw <> nfc_normalize(raw) AS BIGINT) AS nfc_changed,
             |       length(raw) - length(nfc_normalize(raw)) AS nfc_len_delta,
             |       replace(replace(moji, chr(195)||chr(169), chr(233)),
             |               chr(226)||chr(8364)||chr(8482), chr(8217)) AS fixed_text,
             |       CAST(moji <> replace(replace(moji, chr(195)||chr(169), chr(233)),
             |               chr(226)||chr(8364)||chr(8482), chr(8217)) AS BIGINT) AS fixed_changed
             |FROM r ORDER BY doc_id""".stripMargin)),

    // --------------------------------------------------- BPE merge training
    // The full iterative loop (x28 is one iteration's counts). The oracle
    // replays every iteration with a recursive CTE: the whole segmented
    // vocabulary rides in ONE row as LIST<STRUCT(s, cnt)>, each word's
    // segmentation a chr(1)-delimited string ("\x01l\x01\x01o\x01\x01w\x01")
    // so applying a merge is a non-overlapping string replace with exactly
    // the greedy left-to-right BPE semantics of [[BpeTrain.applyMerge]].
    QuerySpec(
      "x33_bpe_train",
      (s, dir) => BpeTrain.trainMerges(Tables.documents(s, dir), "text", BpeNumMerges)
        .orderBy("step"),
      Some(bpeTrainCte + """
             |SELECT step, m_left AS merge_left, m_right AS merge_right, m_cnt AS pair_cnt
             |FROM bpe WHERE step >= 1 ORDER BY step""".stripMargin)),

    // Tokenizer APPLICATION: segment every document with the 20 merges x33
    // trains (train → apply, the full tokenizer lifecycle). The merge list
    // is driver state by construction (vocab-sized → 20 rows), shipped in
    // the UDF closure; segmentation is row-local. The oracle replays
    // training to the same step-20 vocabulary state, whose per-word
    // segmentation IS the application result — one equi-join on `word`.
    QuerySpec(
      "x35_bpe_apply",
      (s, dir) => {
        val merges = BpeTrain.trainMerges(Tables.documents(s, dir), "text", BpeNumMerges)
          .orderBy("step").select("merge_left", "merge_right")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .where(size(col("toks")) > 0)
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            BpeTrain.bpeTokenCountUdf(merges)(col("toks")).as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(bpeTrainCte + """,
             |final AS (SELECT vocab FROM bpe
             |          WHERE step = (SELECT MAX(step) FROM bpe)),
             |wmap AS (SELECT replace(u.w.s, chr(1), '') AS word,
             |                CAST(len(list_filter(string_split(u.w.s, chr(1)),
             |                         x -> x <> '')) AS BIGINT) AS nseg
             |         FROM final f, unnest(f.vocab) AS u(w)),
             |dt AS (SELECT doc_id, unnest(list_filter(
             |         regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS word
             |       FROM documents)
             |SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             |       CAST(SUM(wmap.nseg) AS BIGINT) AS n_bpe_tokens
             |FROM dt JOIN wmap USING (word)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

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

    // Matryoshka truncation evaluation: retrieval quality of 16-dim
    // prefixes vs full 64-dim embeddings (the MRL deployment question —
    // Kusupati et al. 2022, public: can the index store a prefix?).
    // Truncation is a row-local slice (cosine self-normalizes, so no
    // explicit renormalize); both top-5 sweeps reuse the exact cosineTopK
    // operator and the overlap flag is a (qid, cid) equi-join. Exact
    // brute-force on both sides keeps the oracle replayable; the ANN paths
    // (x6/x13) are the production index.
    QuerySpec(
      "x37_matryoshka_eval",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val full = Similarity
          .cosineTopK(e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
          .select(col("qid"), col("cid"), lit(1L).as("hit"))
        val trunc = e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("emb16"))
        Similarity
          .cosineTopK(trunc.filter(col("vec_id") < 20), trunc, "vec_id", "emb16", k = 5)
          .join(full, Seq("qid", "cid"), "left")
          .select(col("qid"), col("rn"), col("cid"), col("sim").as("sim_trunc"),
            coalesce(col("hit"), lit(0L)).as("in_full_top5"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb
             |  FROM embeddings),
             |f AS (SELECT vec_id, emb, sqrt(list_sum([x*x for x in emb])) AS nrm FROM e),
             |t AS (SELECT vec_id, emb[1:16] AS temb,
             |             sqrt(list_sum([x*x for x in emb[1:16]])) AS tnrm FROM e),
             |pairs AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)])/(q.nrm*c.nrm), 4) AS sim_full
             |  FROM f q CROSS JOIN f c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
             |tpairs AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    round(list_sum([q.temb[i]*c.temb[i] for i in range(1,17)])/(q.tnrm*c.tnrm), 4) AS sim_trunc
             |  FROM t q CROSS JOIN t c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
             |topf AS (SELECT qid, cid,
             |           row_number() OVER (PARTITION BY qid ORDER BY sim_full DESC, cid) AS rn
             |         FROM pairs QUALIFY rn <= 5),
             |topt AS (SELECT qid, cid, sim_trunc,
             |           row_number() OVER (PARTITION BY qid ORDER BY sim_trunc DESC, cid) AS rn
             |         FROM tpairs QUALIFY rn <= 5)
             |SELECT t.qid, CAST(t.rn AS BIGINT) AS rn, t.cid, t.sim_trunc,
             |  CAST(EXISTS(SELECT 1 FROM topf f2
             |              WHERE f2.qid = t.qid AND f2.cid = t.cid) AS BIGINT) AS in_full_top5
             |FROM topt t ORDER BY qid, rn""".stripMargin)),

    // Exact duplicated-substring spans (ExactSubstr dedup, Lee et al.
    // 2022): word 8-grams recurring anywhere in the corpus mark their
    // positions; overlapping marks merge into maximal spans per doc.
    // Fully integer output -> hash-stable oracle.
    QuerySpec(
      "x38_dup_spans",
      (s, dir) =>
        Dedup.duplicatedSpans(Tables.documents(s, dir), "doc_id", "text", k = 8)
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |g0 AS (SELECT doc_id,
             |  unnest([struct_pack(pos := i, gram := array_to_string(toks[i:i+8-1], ' '))
             |          for i in range(1, len(toks)-8+2)]) AS g FROM t),
             |g AS (SELECT doc_id, g.pos AS pos, g.gram AS gram FROM g0),
             |dup AS (SELECT gram FROM g GROUP BY 1 HAVING COUNT(*) > 1),
             |h AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
             |m AS (SELECT doc_id, pos,
             |        MAX(pos + 8 - 1) OVER (PARTITION BY doc_id ORDER BY pos
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |      FROM h),
             |s AS (SELECT doc_id, pos,
             |        CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0 END AS st FROM m),
             |sp AS (SELECT doc_id, pos,
             |         SUM(st) OVER (PARTITION BY doc_id ORDER BY pos) AS sid FROM s),
             |spans AS (SELECT doc_id, sid, MIN(pos) AS a, MAX(pos) + 8 - 1 AS b
             |          FROM sp GROUP BY 1, 2)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             |       CAST(SUM(b - a + 1) AS BIGINT) AS dup_tokens,
             |       CAST(MAX(b - a + 1) AS BIGINT) AS max_span
             |FROM spans GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): semantic dedup in embedding space —
    // Voronoi cells of seed rows 0-7, within-cell cosine >= 0.4 drops the
    // higher id. Every output column is an integer -> hash-stable oracle.
    QuerySpec(
      "x39_semdedup",
      (s, dir) =>
        Similarity.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
            tau = 0.4, seedIds = (0L to 7L))
          .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |s AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |      FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |d AS (SELECT e.vec_id, s.cell,
             |  list_sum([(e.emb[i]-s.cemb[i])*(e.emb[i]-s.cemb[i]) for i in range(1,65)]) AS d2
             |  FROM e CROSS JOIN s),
             |ranked AS (SELECT vec_id, cell,
             |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM d),
             |assign AS (SELECT vec_id, cell FROM ranked WHERE rnk = 1),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x*x for x in emb])) AS nrm FROM e),
             |dup AS (SELECT a.vec_id AS hi, MIN(b.vec_id) AS lo
             |  FROM assign a JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
             |  JOIN n na ON na.vec_id = a.vec_id JOIN n nb ON nb.vec_id = b.vec_id
             |  WHERE round(list_sum([na.emb[i]*nb.emb[i] for i in range(1,65)])/(na.nrm*nb.nrm),4) >= 0.4
             |  GROUP BY 1)
             |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, d.lo AS dup_of,
             |  CAST(CASE WHEN d.lo IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM assign a LEFT JOIN dup d ON d.hi = a.vec_id
             |ORDER BY a.vec_id""".stripMargin)),

    // Corpus-level unigram LM cross-entropy per doc (the CCNet/KenLM-style
    // quality signal, here with the LM trained on the corpus itself):
    // add-one-smoothed p(term) from global counts, xent = -mean log p.
    // Per-term log-probs are rounded to 6 decimals and summed as
    // DECIMAL(18,6) so the per-doc sum is exact and order-independent —
    // double accumulation order across partitions can never flip the hash.
    // Scale shape: one (doc,term) shuffle, one term shuffle for the vocab,
    // one term-keyed join back (no broadcast hint: the distinct-term table
    // is corpus-sized at 100 TB; AQE broadcasts it when it is small).
    QuerySpec(
      "x40_unigram_lm",
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
        val vocab = tf.groupBy("term").agg(sum("cnt").as("c"))
        val tot = vocab.agg(sum("c").cast("long").as("n"),
          count(lit(1)).as("v"))
        val lp = vocab.crossJoin(broadcast(tot)) // tot is one row
          .select(col("term"),
            round(log((col("c") + 1.0) / (col("n") + col("v"))), 6)
              .cast("decimal(18,6)").as("logp"))
        tf.join(lp, "term")
          .groupBy("doc_id")
          .agg(sum("cnt").cast("long").as("n_tokens"),
            round((-sum(col("cnt") * col("logp"))).cast("double") /
              sum("cnt"), 4).as("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
             |tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
             |vocab AS (SELECT term, CAST(SUM(cnt) AS BIGINT) AS c FROM tf GROUP BY 1),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM vocab),
             |lp AS (SELECT term, CAST(round(ln((c + 1.0) / (n + v)), 6) AS DECIMAL(18,6)) AS logp
             |       FROM vocab CROSS JOIN tot)
             |SELECT tf.doc_id, CAST(SUM(tf.cnt) AS BIGINT) AS n_tokens,
             |  round(-CAST(SUM(tf.cnt * lp.logp) AS DOUBLE) / SUM(tf.cnt), 4) AS xent
             |FROM tf JOIN lp USING (term)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

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

    // PQ ADC top-k search — the query half of x30's product quantization:
    // per-query LUT of (subspace, centroid) squared distances, approximate
    // distance to a coded vector = m lookups. Corpus rides through the
    // join as (id, m-byte code) only; the nearest-first ranking replays in
    // SQL because codebook and codes are seed-vector-recomputable (x30)
    // and the LUT rows are exactly the d2 table the code assignment uses.
    QuerySpec(
      "x42_pq_adc_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val codebook = Similarity
          .seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        Similarity.pqAdcTopK(e.filter(col("vec_id") < 5), e,
            "vec_id", "embedding", m = 8, k = 10, codebook)
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (
             |  SELECT e.vec_id, sub.s, cb.c,
             |    list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |              *(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |              for i in range(1, 9)]) AS d2
             |  FROM e CROSS JOIN sub CROSS JOIN cb),
             |code AS (SELECT vec_id, s, c,
             |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk
             |         FROM d),
             |cc AS (SELECT vec_id AS cid, s, c FROM code WHERE rnk = 1),
             |lut AS (SELECT vec_id AS qid, s, c,
             |          CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2
             |        FROM d WHERE vec_id < 5),
             |f AS (SELECT l.qid, cc.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |      FROM cc JOIN lut l USING (s, c) WHERE cc.cid <> l.qid
             |      GROUP BY 1, 2)
             |SELECT qid, cid, adc,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS BIGINT) AS rn
             |FROM f QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),

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
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 16, threshold = 0.8)
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

    // Bigram LM cross-entropy per doc — x40's unigram signal upgraded to
    // the conditional p(w2|w1) with add-one smoothing over the corpus
    // vocabulary. Bigrams come from a codegen'd zip_with over the token
    // array (no UDF); the per-doc sum uses the same rounded-DECIMAL(18,6)
    // device as x40 so partition order can never flip the hash. Scale
    // shape: shuffles keyed on (doc,bigram), bigram, and first-word — all
    // corpus-sized tables joined WITHOUT broadcast hints (AQE decides).
    QuerySpec(
      "x44_bigram_lm",
      (s, dir) => {
        val toks = TextFunctions.tokens(col("text"))
        val bigrams = when(size(col("toks")) < 2, array())
          .otherwise(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b)))
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), toks.as("toks"))
        val tf = base
          .select(col("doc_id"), explode(bigrams).as("big"))
          .groupBy("doc_id", "big").agg(count(lit(1)).as("cnt"))
        val bcnt = tf.groupBy("big").agg(sum("cnt").cast("long").as("cb"))
        val ctx = tf
          .select(substring_index(col("big"), " ", 1).as("w1"), col("cnt"))
          .groupBy("w1").agg(sum("cnt").cast("long").as("cw"))
        val vocab = base.select(explode(col("toks")).as("w"))
          .agg(count_distinct(col("w")).as("v"))
        val lp = bcnt
          .join(ctx, substring_index(bcnt("big"), " ", 1) === ctx("w1"))
          .crossJoin(broadcast(vocab)) // vocab is one row
          .select(col("big"),
            round(log((col("cb") + 1.0) / (col("cw") + col("v"))), 6)
              .cast("decimal(18,6)").as("logp"))
        tf.join(lp, "big")
          .groupBy("doc_id")
          .agg(sum("cnt").cast("long").as("n_bigrams"),
            round((-sum(col("cnt") * col("logp"))).cast("double") /
              sum("cnt"), 4).as("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |bg AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS big FROM t),
             |bgf AS (SELECT doc_id, big, split_part(big, ' ', 1) AS w1 FROM bg),
             |uni AS (SELECT DISTINCT unnest(toks) AS w FROM t),
             |v AS (SELECT COUNT(*) AS v FROM uni),
             |tf AS (SELECT doc_id, big, COUNT(*) AS cnt FROM bgf GROUP BY 1, 2),
             |bc AS (SELECT big, CAST(SUM(cnt) AS BIGINT) AS cb FROM tf GROUP BY 1),
             |ctx AS (SELECT w1, COUNT(*) AS cw FROM bgf GROUP BY 1),
             |lp AS (SELECT bc.big,
             |         CAST(round(ln((bc.cb + 1.0) / (ctx.cw + v.v)), 6) AS DECIMAL(18,6)) AS logp
             |       FROM bc JOIN ctx ON split_part(bc.big, ' ', 1) = ctx.w1 CROSS JOIN v)
             |SELECT tf.doc_id, CAST(SUM(tf.cnt) AS BIGINT) AS n_bigrams,
             |  round(-CAST(SUM(tf.cnt * lp.logp) AS DOUBLE) / SUM(tf.cnt), 4) AS xent
             |FROM tf JOIN lp USING (big)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bloom-filter contamination — x21's semantics on the zero-shuffle
    // plan: the benchmark side folds into one broadcast bitset (mergeable
    // byte-array aggregate), the corpus side probes row-locally and never
    // shuffles. n=3 so the shared-gram path is exercised on this corpus
    // (8-grams never cross the %97 split — x21 returns 0 rows there; the
    // n=8 production default's non-empty path is proven in BloomSpec).
    // Oracle rebuilds the identical bitset: poly31 grams, double-hashed
    // positions (h1 + i*h2 mod 2^20), membership = all 3 bits set.
    QuerySpec(
      "x45_bloom_contamination",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Bloom.contaminationByBloom(docs, docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", n = 3)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    list_distinct([list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |        [CAST(ord(c) AS BIGINT)
             |         for c in string_split(array_to_string(toks[i:i+2], ' '), '')]),
             |      (acc, x) -> (acc*31 + x) % 2147483647)
             |      for i in range(1, len(toks) - 1)]) AS grams
             |  FROM t WHERE len(toks) >= 3),
             |bp AS (
             |  SELECT DISTINCT pos FROM (
             |    SELECT unnest([((gram % 1048576) + i * (1 + ((gram // 1048576) % 1048575))) % 1048576
             |                   for i in range(0, 3)]) AS pos
             |    FROM (SELECT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0))),
             |cgp AS (
             |  SELECT doc_id, gram,
             |    unnest([((gram % 1048576) + i * (1 + ((gram // 1048576) % 1048575))) % 1048576
             |            for i in range(0, 3)]) AS pos
             |  FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0)),
             |hit AS (
             |  SELECT doc_id, gram FROM cgp LEFT JOIN bp ON cgp.pos = bp.pos
             |  GROUP BY 1, 2 HAVING COUNT(*) FILTER (WHERE bp.pos IS NULL) = 0)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged
             |FROM hit GROUP BY 1 ORDER BY 1""".stripMargin)),

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

    // Incremental near-dup: tonight's batch (doc_id%5=0) against the
    // standing index — the nightly-ingest shape where only cross-side
    // pairs matter and band/bucket join cost follows BATCH occupancy, not
    // index size. Same oracle device as x2: LSH recall at these thresholds
    // is complete on this corpus, so the emitted pairs equal the exact
    // cross-split jaccard sweep (verify step recomputes exact jaccard).
    QuerySpec(
      "x47_minhash_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.minhashNearDupsAgainst(
            docs.filter(col("doc_id") % 5 === 0),
            docs.filter(col("doc_id") % 5 =!= 0),
            "doc_id", "text", k = 64, bands = 16, threshold = 0.8)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                   for i in range(1, len(toks)-1)]) AS sh
             |  FROM t),
             |p AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na, len(b.sh) AS nb
             |  FROM sh a JOIN sh b ON a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
             |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
             |SELECT doc_a, doc_b, round(CAST(i AS DOUBLE)/(na+nb-i), 4) AS jaccard
             |FROM p WHERE round(CAST(i AS DOUBLE)/(na+nb-i), 4) >= 0.8
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Z-order (Morton) clustering key over (customer, order-day) — the
    // write-side layout primitive behind two-dimensional file pruning
    // (Layout.zOrdered range-partitions + sorts on it; ZOrderSpec shows
    // both dimensions narrow per partition at once). Codegen'd native
    // expression, integer-only math, key replayed bit-for-bit in SQL.
    QuerySpec(
      "x48_zorder_key",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            col("o_custkey").cast("long").as("a"),
            datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
              .cast("long").as("b"))
          .select(col("o_orderkey"), col("a"), col("b"),
            expr("zorder_key(a, b)").as("zkey"))
          .orderBy("o_orderkey")
      },
      Some("""WITH d AS (
             |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS a,
             |    CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS b
             |  FROM orders)
             |SELECT o_orderkey, a, b,
             |  CAST(list_sum([ ((a // (CAST(1 AS BIGINT) << i)) % 2) * (CAST(1 AS BIGINT) << (2*i))
             |                + ((b // (CAST(1 AS BIGINT) << i)) % 2) * (CAST(1 AS BIGINT) << (2*i+1))
             |                for i in range(0, 21)]) AS BIGINT) AS zkey
             |FROM d ORDER BY o_orderkey""".stripMargin)),

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

    // Hashed linear quality scorer (fastText shape, Joulin et al. 2016):
    // unigram+bigram bag hashed to 4096 buckets, margin = Σ bucket weights
    // — all-integer accumulation, one double division at the end. Row-local
    // compiled kernel, zero shuffle at any corpus size; the weights are a
    // deterministic function of the bucket id so hashing AND model replay
    // in the oracle (a trained model would broadcast the same array).
    QuerySpec(
      "x50_quality_classifier",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text")))
              .as("sc"))
          .select(col("doc_id"), col("sc.n_feats").as("n_feats"),
            col("sc.margin").as("margin"))
          .withColumn("score",
            when(col("n_feats") > 0,
              round(col("margin").cast("double") / (col("n_feats") * 1048576L), 6))
              .otherwise(lit(0.0)))
          .withColumn("keep", (col("margin") > 0).cast("long"))
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |f AS (SELECT doc_id,
             |  unnest(list_concat(toks, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS feat FROM t),
             |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |       [CAST(ord(c) AS BIGINT) for c in string_split(feat, '')]),
             |       (acc, x) -> (acc*31 + x) % 2147483647) % 4096 AS b FROM f),
             |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
             |        CAST(SUM((b * 2654435761) % 1048576 - 524288) AS BIGINT) AS margin
             |      FROM h GROUP BY 1)
             |SELECT t.doc_id, COALESCE(m.n_feats, 0) AS n_feats, COALESCE(m.margin, 0) AS margin,
             |  CASE WHEN COALESCE(m.n_feats, 0) > 0
             |       THEN round(CAST(m.margin AS DOUBLE) / (m.n_feats * 1048576), 6) ELSE 0.0 END AS score,
             |  CAST(CASE WHEN COALESCE(m.margin, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM t LEFT JOIN m USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Johnson–Lindenstrauss ±1 projection 64 → 16 dims over the quantized
    // embedding (Quantized.projectUdf): the 4× dimension cut used as an ANN
    // pre-filter. Exact integer sums — hash-stable under any partitioning —
    // with the per-row norm-ratio distortion check as the only (single-
    // division) floating-point step.
    QuerySpec(
      "x51_random_projection",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("vec_id"),
            Quantized.quantizeUdf(1e6)(col("embedding")).as("q"))
          .select(col("vec_id"), col("q"),
            Quantized.projectUdf(16)(col("q")).as("proj"))
          .withColumn("sum_p2",
            expr("aggregate(proj, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
          .withColumn("sum_q2",
            expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
          .select(col("vec_id"),
            array_join(transform(col("proj"), _.cast("string")), ",").as("proj"),
            when(col("sum_q2") > 0,
              round(col("sum_p2").cast("double") / 16 / col("sum_q2"), 4))
              .otherwise(lit(null).cast("double")).as("norm_ratio"))
          .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id,
             |  [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) for x in embedding] AS q FROM embeddings),
             |p AS (SELECT vec_id, q,
             |  [CAST(list_sum([q[i+1] * (1 - 2*(((((i*16+j)*1103515245 + 12345) % 2147483648) // 65536) % 2))
             |                  for i in range(0, len(q))]) AS BIGINT) for j in range(0, 16)] AS proj
             |  FROM e)
             |SELECT vec_id, array_to_string(proj, ',') AS proj,
             |  CASE WHEN list_sum([x*x for x in q]) > 0 THEN
             |    round(CAST(list_sum([x*x for x in proj]) AS DOUBLE) / 16 / list_sum([x*x for x in q]), 4)
             |  ELSE NULL END AS norm_ratio
             |FROM p ORDER BY vec_id""".stripMargin)),

    // Two Lloyd rounds of k-means over quantized embeddings (the curation
    // clustering primitive behind SemDeDup/cluster-balanced sampling).
    // Seeds = the k=16 rows with the smallest salted md5(vec_id) — k is
    // CORPUS-INDEPENDENT (the x49/x86 seeded-hash device), so driver state
    // is k·dim Longs at any corpus size, the seed pick is a bounded global
    // top-k (TakeOrderedAndProject), and assignment is O(n·k) with constant
    // k. Per round the centroids broadcast into a compiled argmin kernel
    // and the update is one map-side-combined array aggregation — no
    // explode, no corpus-proportional driver collect. All-integer distances
    // (scale 1e4) make even the ASSIGNMENTS replay exactly in the oracle;
    // output is the final (cluster, pos, sum_q, n).
    QuerySpec(
      "x52_kmeans_lloyd",
      (s, dir) =>
        Quantized.lloydKmeansFixedK(Tables.embeddings(s, dir), "vec_id",
            "embedding", k = 16, salt = "graft-kmeans-42:", scale = 1e4,
            iters = 2)
          .select(col("cluster").cast("long").as("cluster"), col("pos"),
            col("sum_q"), col("n"))
          .orderBy("cluster", "pos"),
      Some("""WITH e AS (SELECT vec_id,
             |  [CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT) for x in embedding] AS q FROM embeddings),
             |s AS (SELECT (row_number() OVER (ORDER BY md5('graft-kmeans-42:' || CAST(vec_id AS VARCHAR)), vec_id) - 1) AS c, q
             |      FROM e QUALIFY c <= 15),
             |a1 AS (
             |  SELECT e.vec_id, s.c,
             |    list_sum([(e.q[i+1] - s.q[i+1])*(e.q[i+1] - s.q[i+1]) for i in range(0, len(e.q))]) AS d2
             |  FROM e CROSS JOIN s
             |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY d2, s.c) = 1),
             |m1 AS (SELECT a1.c, generate_subscripts(e.q, 1) AS pos, unnest(e.q) AS qv
             |       FROM a1 JOIN e USING (vec_id)),
             |c1 AS (SELECT c, pos, CAST(SUM(qv) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM m1 GROUP BY 1, 2),
             |c1arr AS (
             |  SELECT s.c,
             |    CASE WHEN COUNT(c1.sv) = 0 THEN s.q ELSE list(c1.sv ORDER BY c1.pos) END AS sums,
             |    CASE WHEN COUNT(c1.sv) = 0 THEN 1 ELSE any_value(c1.n) END AS n
             |  FROM s LEFT JOIN c1 USING (c) GROUP BY s.c, s.q),
             |a2 AS (
             |  SELECT e.vec_id, c1arr.c,
             |    CAST(list_sum([(e.q[i+1]*c1arr.n - c1arr.sums[i+1])*(e.q[i+1]*c1arr.n - c1arr.sums[i+1])
             |                   for i in range(0, len(e.q))]) AS DOUBLE)
             |      / (CAST(c1arr.n AS DOUBLE) * c1arr.n) AS dist
             |  FROM e CROSS JOIN c1arr
             |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dist, c1arr.c) = 1),
             |f AS (SELECT a2.c AS cluster, generate_subscripts(e.q, 1) AS pos, unnest(e.q) AS qv
             |      FROM a2 JOIN e USING (vec_id))
             |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(pos AS BIGINT) AS pos,
             |  CAST(SUM(qv) AS BIGINT) AS sum_q, CAST(COUNT(*) AS BIGINT) AS n
             |FROM f GROUP BY 1, 2 ORDER BY cluster, pos""".stripMargin)),

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

    // Embedding outliers: top-25 farthest from the corpus centroid under
    // the exact scaled distance Σ(q_i·n − s_i)² — the "drop the weird
    // tail" curation gate. Centroid = one map-side-combined Long-array
    // aggregate crossed back as a broadcast row (no driver collect); the
    // ranking is a bounded top-k, not a full corpus sort.
    QuerySpec(
      "x54_centroid_outliers",
      (s, dir) =>
        Quantized.centroidOutliers(Tables.embeddings(s, dir), "vec_id",
            "embedding", topN = 25, scale = 1e4)
          .select(col("id").as("vec_id"), col("d2n"), col("rank"))
          .orderBy("rank"),
      Some("""WITH e AS (SELECT vec_id,
             |  [CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT) for x in embedding] AS q FROM embeddings),
             |u AS (SELECT vec_id, generate_subscripts(q, 1) AS pos, unnest(q) AS qv FROM e),
             |cent AS (SELECT pos, CAST(SUM(qv) AS BIGINT) AS sv FROM u GROUP BY 1),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
             |d AS (SELECT u.vec_id, CAST(SUM((u.qv*nn.n - cent.sv)*(u.qv*nn.n - cent.sv)) AS BIGINT) AS d2n
             |      FROM u JOIN cent USING (pos) CROSS JOIN nn GROUP BY 1)
             |SELECT vec_id, d2n, CAST(row_number() OVER (ORDER BY d2n DESC, vec_id) AS BIGINT) AS rank
             |FROM d QUALIFY rank <= 25 ORDER BY rank""".stripMargin)),

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

    // IVF-PQ: the two ANN halves composed the way FAISS ships them — the
    // seeded coarse quantizer bounds WHICH rows are scored (x13's probe
    // join, equi on the cell key), PQ-ADC bounds the COST PER ROW (x42's m
    // LUT lookups over the m-byte code). Candidates follow probed-cell
    // occupancy and full vectors are never reread after encoding: the
    // index for when both corpus size and dimensionality hurt. Oracle
    // replays BOTH stages (seed cells + codes + LUT are all corpus-row
    // arithmetic).
    QuerySpec(
      "x57_ivfpq_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val codebook = Similarity
          .seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        Similarity.ivfPqTopK(e.filter(col("vec_id") < 5), e,
            "vec_id", "embedding", k = 10, nProbe = 3,
            seedIds = (0L to 7L), m = 8, codebook)
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |ivf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |        FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |dv AS (SELECT e.vec_id, ivf.cell,
             |         list_sum([(e.emb[i]-ivf.cemb[i])*(e.emb[i]-ivf.cemb[i]) for i in range(1,65)]) AS d2
             |       FROM e CROSS JOIN ivf),
             |rankedv AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM dv),
             |assign AS (SELECT vec_id, cell FROM rankedv WHERE rnk = 1),
             |probe AS (SELECT vec_id, cell FROM rankedv WHERE rnk <= 3 AND vec_id < 5),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (SELECT e.vec_id, sub.s, cb.c,
             |        list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM e CROSS JOIN sub CROSS JOIN cb),
             |code AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM d),
             |cc AS (SELECT vec_id AS cid, s, c FROM code WHERE rnk = 1),
             |lut AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM d WHERE vec_id < 5),
             |cand AS (SELECT p.vec_id AS qid, a.vec_id AS cid
             |         FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.vec_id),
             |f AS (SELECT cand.qid, cand.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |      FROM cand JOIN cc ON cc.cid = cand.cid
             |      JOIN lut l ON l.qid = cand.qid AND l.s = cc.s AND l.c = cc.c
             |      GROUP BY 1, 2)
             |SELECT qid, cid, adc, CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS BIGINT) AS rn
             |FROM f QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // Asymmetric shingle containment (quotes / boilerplate / subset docs):
    // c = |A∩B| / min(|A|,|B|) over word 3-gram sets, blocked on
    // (lang, source) WITHOUT the x4 length band — containment pairs have
    // very different lengths by nature, so the band filter would discard
    // exactly the hits. Exact, merge-intersection kernel on sorted hashes;
    // oracle intersects the raw gram strings.
    QuerySpec(
      "x58_containment",
      (s, dir) =>
        Dedup.containmentPairs(Tables.documents(s, dir), threshold = 0.8)
          .orderBy("doc_a", "doc_b"),
      Some("""WITH t AS (SELECT doc_id, lang, source,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |sh AS (SELECT doc_id, lang, source,
             |  list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]) AS sh
             |  FROM t WHERE len(toks) >= 3),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |        len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na, len(b.sh) AS nb
             |      FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |      WHERE len(a.sh) > 0 AND len(b.sh) > 0)
             |SELECT doc_a, doc_b,
             |  CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS contained,
             |  round(CAST(i AS DOUBLE) / least(na, nb), 4) AS containment
             |FROM p WHERE round(CAST(i AS DOUBLE) / least(na, nb), 4) >= 0.8
             |ORDER BY doc_a, doc_b""".stripMargin)),

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

    // Bag-of-words dedup: key = sha256 of the SORTED token multiset, so
    // word-order shuffles (scraper artifacts, list reorderings) collapse
    // to one key where x1's raw digest and x16's normalized digest both
    // miss them. Row-local key + one digest groupBy — the x1 plan shape.
    QuerySpec(
      "x60_bow_dedup",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            sha2(concat_ws(" ", array_sort(col("toks"))), 256).as("bow_key"))
          .groupBy("bow_key")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
          .orderBy("bow_key"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents)
             |SELECT sha256(list_aggregate(list_sort(toks), 'string_agg', ' ')) AS bow_key,
             |  MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_docs
             |FROM t GROUP BY 1 ORDER BY bow_key""".stripMargin)),

    // Content-defined chunking dedup (the rsync/storage-dedup boundary
    // trick applied to corpus text): a token whose poly31 hash ≡ 0 mod 8
    // STARTS a new chunk, so chunk boundaries survive insertions/deletions
    // elsewhere in the doc — shifted copies still produce identical chunks,
    // which fixed-width segmenting (x27) cannot. Chunking is a row-local
    // compiled kernel; the only shuffle is the chunk-digest groupBy.
    QuerySpec(
      "x61_cdc_chunks",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(Dedup.cdcChunksUdf(8L)(TextFunctions.tokens(col("text"))))
              .as("chunk_text"))
          .groupBy(sha2(col("chunk_text"), 256).as("chunk_key"))
          .agg(count(lit(1)).as("n_occurrences"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("first_doc"))
          .orderBy("chunk_key"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |u AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w FROM t),
             |h AS (SELECT doc_id, i, w,
             |        list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ord(c) AS BIGINT) for c in string_split(w, '')]),
             |          (acc, x) -> (acc*31 + x) % 2147483647) % 8 = 0 AS is_b FROM u),
             |c AS (SELECT doc_id, i, w,
             |        SUM(CASE WHEN is_b THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY i) AS chunk FROM h),
             |ch AS (SELECT doc_id, chunk, string_agg(w, ' ' ORDER BY i) AS chunk_text FROM c GROUP BY 1, 2)
             |SELECT sha256(chunk_text) AS chunk_key, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, MIN(doc_id) AS first_doc
             |FROM ch GROUP BY 1 ORDER BY chunk_key""".stripMargin)),

    // Merkle-style range checksums: one digest per doc_id range bucket,
    // computed over the id-ORDERED per-doc digests — two corpus replicas
    // (or two pipeline versions) compare 10 range keys instead of N rows,
    // and a mismatched bucket pins the diff to a 50-doc range. Ordered
    // aggregation made deterministic by sorting the collected (id, digest)
    // structs — no partition-order dependence; shuffle is on the bucket key.
    QuerySpec(
      "x62_merkle_ranges",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(expr("doc_id div 50").as("bucket"), col("doc_id"),
            sha2(col("text"), 256).as("digest"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sha2(array_join(
              transform(array_sort(collect_list(struct(col("doc_id"), col("digest")))),
                x => x.getField("digest")), ""), 256).as("range_key"))
          .orderBy("bucket"),
      Some("""WITH d AS (SELECT doc_id, doc_id // 50 AS bucket, sha256(text) AS digest FROM documents)
             |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  sha256(string_agg(digest, '' ORDER BY doc_id)) AS range_key
             |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ANN index-quality eval: recall@10 of the IVF-PQ index (x57's exact
    // configuration) against the exact cosine top-10 — the measurement
    // that decides nProbe/m/codebook before an index ships. Composes the
    // two verified operators; one left join on (qid, cid). The honest
    // numbers here (recall ~0.2-0.5) are WHY the eval op exists: m=8 seed
    // codebooks at nProbe=3 are coarse, and this query is the dial.
    QuerySpec(
      "x63_ann_recall",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 5)
        val exact = Similarity.cosineTopK(q, e, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("cid"))
        val codebook = Similarity
          .seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        val approx = Similarity.ivfPqTopK(q, e, "vec_id", "embedding",
            k = 10, nProbe = 3, seedIds = (0L to 7L), m = 8, codebook)
          .select(col("qid"), col("cid")).withColumn("hit", lit(1L))
        exact.join(approx, Seq("qid", "cid"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("k"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("qid"), col("k"), col("n_hit"),
            round(col("n_hit").cast("double") / col("k"), 4).as("recall"))
          .orderBy("qid")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |ex AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |  FROM n q CROSS JOIN n c WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
             |exact10 AS (
             |  SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM ex)
             |  WHERE rn <= 10),
             |ivf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |        FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |dv AS (SELECT e.vec_id, ivf.cell,
             |         list_sum([(e.emb[i]-ivf.cemb[i])*(e.emb[i]-ivf.cemb[i]) for i in range(1,65)]) AS d2
             |       FROM e CROSS JOIN ivf),
             |rankedv AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM dv),
             |assign AS (SELECT vec_id, cell FROM rankedv WHERE rnk = 1),
             |probe AS (SELECT vec_id, cell FROM rankedv WHERE rnk <= 3 AND vec_id < 5),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (SELECT e.vec_id, sub.s, cb.c,
             |        list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM e CROSS JOIN sub CROSS JOIN cb),
             |code AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM d),
             |cc AS (SELECT vec_id AS cid, s, c FROM code WHERE rnk = 1),
             |lut AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM d WHERE vec_id < 5),
             |cand AS (SELECT p.vec_id AS qid, a.vec_id AS cid
             |         FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.vec_id),
             |f AS (SELECT cand.qid, cand.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |      FROM cand JOIN cc ON cc.cid = cand.cid
             |      JOIN lut l ON l.qid = cand.qid AND l.s = cc.s AND l.c = cc.c
             |      GROUP BY 1, 2),
             |approx10 AS (
             |  SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM f)
             |  WHERE rn <= 10)
             |SELECT e10.qid, CAST(COUNT(*) AS BIGINT) AS k,
             |  CAST(COUNT(a10.cid) AS BIGINT) AS n_hit,
             |  round(CAST(COUNT(a10.cid) AS DOUBLE) / COUNT(*), 4) AS recall
             |FROM exact10 e10 LEFT JOIN approx10 a10 USING (qid, cid)
             |GROUP BY 1 ORDER BY qid""".stripMargin)),

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

    // Cross-source duplication matrix: near-dup PAIR counts per unordered
    // source pair — the provenance view that decides which feeds to
    // deprioritize or dedup against each other (a diagonal entry means a
    // source duplicates itself). Composes x2's LSH pairs (recall complete
    // at this threshold on this corpus, so the oracle is the exact sweep)
    // with two slim id→source joins; the matrix is |sources|²-bounded.
    QuerySpec(
      "x66_source_overlap",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 16, threshold = 0.8)
        val src = docs.select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("source_a")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("source_b")), "doc_b")
          .select(least(col("source_a"), col("source_b")).as("src_lo"),
            greatest(col("source_a"), col("source_b")).as("src_hi"))
          .groupBy("src_lo", "src_hi").agg(count(lit(1)).as("n_pairs"))
          .orderBy("src_lo", "src_hi")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |sh AS (SELECT doc_id,
             |  list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]) AS sh
             |  FROM t),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |        len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na, len(b.sh) AS nb
             |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |      WHERE len(a.sh) > 0 AND len(b.sh) > 0),
             |q AS (SELECT doc_a, doc_b FROM p WHERE round(CAST(i AS DOUBLE)/(na+nb-i), 4) >= 0.8),
             |m AS (SELECT least(da.source, db.source) AS src_lo, greatest(da.source, db.source) AS src_hi
             |      FROM q JOIN documents da ON q.doc_a = da.doc_id
             |             JOIN documents db ON q.doc_b = db.doc_id)
             |SELECT src_lo, src_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs
             |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Per-doc novelty vs a reference corpus (x21's contamination device
    // inverted into a SCORE): novelty = fraction of a doc's distinct word
    // 3-grams NOT present in the reference split — the memorization /
    // freshness metric that gates eval-adjacent or stale content by
    // degree instead of x21's binary leak flag. Same scale shape: gram
    // hashes equi-join against the (small, broadcastable) reference gram
    // set; cost follows total gram count.
    QuerySpec(
      "x67_novelty_score",
      (s, dir) => {
        val g = Tables.documents(s, dir)
          .select(col("doc_id"),
            Dedup.wordGramHashUdf(3)(TextFunctions.tokens(col("text"))).as("grams"))
          .filter(size(col("grams")) > 0)
        val ref = g.filter(col("doc_id") % 97 === 0)
          .select(explode(col("grams")).as("gram")).distinct()
        g.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), explode(col("grams")).as("gram"))
          .join(broadcast(ref.withColumn("known", lit(1L))), Seq("gram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("known"), lit(0L))).as("n_known"))
          .select(col("doc_id"), col("n_grams"), col("n_known"),
            round(lit(1.0) - col("n_known").cast("double") / col("n_grams"), 4)
              .as("novelty"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |g AS (SELECT doc_id,
             |  list_distinct([list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      [CAST(ord(c) AS BIGINT) for c in string_split(array_to_string(toks[i:i+2], ' '), '')]),
             |    (acc, x) -> (acc*31 + x) % 2147483647)
             |    for i in range(1, len(toks) - 1)]) AS grams
             |  FROM t WHERE len(toks) >= 3),
             |ref AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
             |d AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0),
             |hit AS (SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             |          CAST(COUNT(ref.gram) AS BIGINT) AS n_known
             |        FROM d LEFT JOIN ref USING (gram) GROUP BY 1)
             |SELECT doc_id, n_grams, n_known,
             |  round(1.0 - CAST(n_known AS DOUBLE) / n_grams, 4) AS novelty
             |FROM hit ORDER BY doc_id""".stripMargin)),

    // IVF-PQ with an exact re-rank tail (FAISS's IndexRefineFlat device):
    // the tuned answer to x63's honest recall numbers — the ADC shortlist
    // (nProbe=4, refine=100) only has to RETAIN the true neighbors, and
    // the final order is true cosine over shortlist members' full vectors.
    // Measured recall@10 vs x5's exact baseline: 0.94 mean (x69 is the
    // oracle-checked eval). Oracle replays all three stages: seeded cells,
    // PQ codes + LUT shortlist, cosine re-rank.
    QuerySpec(
      "x68_ivfpq_refined",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val codebook = Similarity
          .seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        Similarity.ivfPqRefineTopK(e.filter(col("vec_id") < 5), e,
            "vec_id", "embedding", k = 10, nProbe = 4,
            seedIds = (0L to 7L), m = 8, codebook, refine = 100)
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |ivf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |        FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |dv AS (SELECT e.vec_id, ivf.cell,
             |         list_sum([(e.emb[i]-ivf.cemb[i])*(e.emb[i]-ivf.cemb[i]) for i in range(1,65)]) AS d2
             |       FROM e CROSS JOIN ivf),
             |rankedv AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM dv),
             |assign AS (SELECT vec_id, cell FROM rankedv WHERE rnk = 1),
             |probe AS (SELECT vec_id, cell FROM rankedv WHERE rnk <= 4 AND vec_id < 5),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (SELECT e.vec_id, sub.s, cb.c,
             |        list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM e CROSS JOIN sub CROSS JOIN cb),
             |code AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM d),
             |cc AS (SELECT vec_id AS cid, s, c FROM code WHERE rnk = 1),
             |lut AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM d WHERE vec_id < 5),
             |cand AS (SELECT p.vec_id AS qid, a.vec_id AS cid
             |         FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.vec_id),
             |f AS (SELECT cand.qid, cand.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |      FROM cand JOIN cc ON cc.cid = cand.cid
             |      JOIN lut l ON l.qid = cand.qid AND l.s = cc.s AND l.c = cc.c
             |      GROUP BY 1, 2),
             |short AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM f)
             |  WHERE rn <= 100),
             |r AS (SELECT s.qid, s.cid,
             |        round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |      FROM short s JOIN n q ON q.vec_id = s.qid JOIN n c ON c.vec_id = s.cid)
             |SELECT qid, cid, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM r QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // Recall@10 of the REFINED index (x68's exact configuration) against
    // the exact cosine top-10 — x63's eval re-run at the tuned operating
    // point. x63 measures the ADC-only ranking at 0.2–0.5 and stays as the
    // "before" record; this query is the "after": every qid at or above
    // 0.9, mean 0.94 — the dial landed where an index would actually ship.
    QuerySpec(
      "x69_ann_recall_tuned",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 5)
        val exact = Similarity.cosineTopK(q, e, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("cid"))
        val codebook = Similarity
          .seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        val approx = Similarity.ivfPqRefineTopK(q, e, "vec_id", "embedding",
            k = 10, nProbe = 4, seedIds = (0L to 7L), m = 8, codebook,
            refine = 100)
          .select(col("qid"), col("cid")).withColumn("hit", lit(1L))
        exact.join(approx, Seq("qid", "cid"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("k"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("qid"), col("k"), col("n_hit"),
            round(col("n_hit").cast("double") / col("k"), 4).as("recall"))
          .orderBy("qid")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |ex AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |  FROM n q CROSS JOIN n c WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
             |exact10 AS (
             |  SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM ex)
             |  WHERE rn <= 10),
             |ivf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |        FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |dv AS (SELECT e.vec_id, ivf.cell,
             |         list_sum([(e.emb[i]-ivf.cemb[i])*(e.emb[i]-ivf.cemb[i]) for i in range(1,65)]) AS d2
             |       FROM e CROSS JOIN ivf),
             |rankedv AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM dv),
             |assign AS (SELECT vec_id, cell FROM rankedv WHERE rnk = 1),
             |probe AS (SELECT vec_id, cell FROM rankedv WHERE rnk <= 4 AND vec_id < 5),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (SELECT e.vec_id, sub.s, cb.c,
             |        list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM e CROSS JOIN sub CROSS JOIN cb),
             |code AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM d),
             |cc AS (SELECT vec_id AS cid, s, c FROM code WHERE rnk = 1),
             |lut AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM d WHERE vec_id < 5),
             |cand AS (SELECT p.vec_id AS qid, a.vec_id AS cid
             |         FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.vec_id),
             |f AS (SELECT cand.qid, cand.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |      FROM cand JOIN cc ON cc.cid = cand.cid
             |      JOIN lut l ON l.qid = cand.qid AND l.s = cc.s AND l.c = cc.c
             |      GROUP BY 1, 2),
             |short AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM f)
             |  WHERE rn <= 100),
             |r AS (SELECT s.qid, s.cid,
             |        round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |      FROM short s JOIN n q ON q.vec_id = s.qid JOIN n c ON c.vec_id = s.cid),
             |approx10 AS (
             |  SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM r)
             |  WHERE rn <= 10)
             |SELECT e10.qid, CAST(COUNT(*) AS BIGINT) AS k,
             |  CAST(COUNT(a10.cid) AS BIGINT) AS n_hit,
             |  round(CAST(COUNT(a10.cid) AS DOUBLE) / COUNT(*), 4) AS recall
             |FROM exact10 e10 LEFT JOIN approx10 a10 USING (qid, cid)
             |GROUP BY 1 ORDER BY qid""".stripMargin)),

    // Index build/serve split: the IVF-PQ index is built ONCE, persisted
    // to parquet (codes + centroids + codebook + meta), reloaded, and the
    // query runs off the LOADED index — the production lifecycle (FAISS
    // write_index/read_index) where a 100 TB corpus is encoded in one job
    // and every later batch searches slim code rows without re-encoding.
    // Oracle = x68's SQL verbatim: the round-trip must reproduce the
    // rebuild-every-time result bit-for-bit or persistence lost something.
    QuerySpec(
      "x70_ivfpq_index_roundtrip",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val codebook = Similarity
          .seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_index").toString
        deleteOnExit(idxDir)
        IvfPqIndex.build(e, "vec_id", "embedding",
            seedIds = (0L to 7L), m = 8, codebook)
          .save(idxDir)
        IvfPqIndex.load(s, idxDir)
          .refineTopK(e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
            k = 10, nProbe = 4, refine = 100)
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |ivf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |        FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |dv AS (SELECT e.vec_id, ivf.cell,
             |         list_sum([(e.emb[i]-ivf.cemb[i])*(e.emb[i]-ivf.cemb[i]) for i in range(1,65)]) AS d2
             |       FROM e CROSS JOIN ivf),
             |rankedv AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM dv),
             |assign AS (SELECT vec_id, cell FROM rankedv WHERE rnk = 1),
             |probe AS (SELECT vec_id, cell FROM rankedv WHERE rnk <= 4 AND vec_id < 5),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (SELECT e.vec_id, sub.s, cb.c,
             |        list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM e CROSS JOIN sub CROSS JOIN cb),
             |code AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM d),
             |cc AS (SELECT vec_id AS cid, s, c FROM code WHERE rnk = 1),
             |lut AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM d WHERE vec_id < 5),
             |cand AS (SELECT p.vec_id AS qid, a.vec_id AS cid
             |         FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.vec_id),
             |f AS (SELECT cand.qid, cand.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |      FROM cand JOIN cc ON cc.cid = cand.cid
             |      JOIN lut l ON l.qid = cand.qid AND l.s = cc.s AND l.c = cc.c
             |      GROUP BY 1, 2),
             |short AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM f)
             |  WHERE rn <= 100),
             |r AS (SELECT s.qid, s.cid,
             |        round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |      FROM short s JOIN n q ON q.vec_id = s.qid JOIN n c ON c.vec_id = s.cid)
             |SELECT qid, cid, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM r QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // Soft dedup: inverse-multiplicity training weights (1/cluster_size)
    // instead of hard removal — the data-constrained regime's version of
    // dedup, where dropping duplicates would cost total tokens but equal
    // weighting over-trains on repeated content. Composes x2's pairs and
    // x31's clusters; docs outside every cluster weigh 1.0. Oracle reuses
    // the x31 recursive-closure CTEs.
    QuerySpec(
      "x71_soft_dedup_weights",
      (s, dir) =>
        Dedup.softDedupWeights(Tables.documents(s, dir), "doc_id", "text",
            k = 64, bands = 16, threshold = 0.8)
          .orderBy("doc_id"),
      Some(dupGraphCtes +
        """
          |SELECT d.doc_id,
          |  CAST(COALESCE(siz.cluster_size, 1) AS BIGINT) AS cluster_size,
          |  round(1.0 / COALESCE(siz.cluster_size, 1), 4) AS weight
          |FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id
          |LEFT JOIN siz ON lab.cluster_id = siz.cluster_id
          |ORDER BY d.doc_id""".stripMargin)),

    // Within-doc n-gram repetition metrics (Gopher §A1.1 repetition
    // filters): templated/spam docs repeat internal n-grams long before
    // they duplicate across docs, so these row-local fractions gate what
    // document-level dedup cannot see — the quality-filter complement of
    // x26's length/stopword gates. One hash-map pass per row; no shuffle.
    QuerySpec(
      "x72_repetition_metrics",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), TextFunctions.repetitionUdf(col("toks")).as("r"))
          .select(col("doc_id"),
            round(col("r._1"), 4).as("dup_bigram_frac"),
            round(col("r._2"), 4).as("top_bigram_frac"),
            round(col("r._3"), 4).as("dup_trigram_frac"))
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |g2 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS g
             |       FROM t WHERE len(toks) >= 3),
             |g3 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]) AS g
             |       FROM t WHERE len(toks) >= 3),
             |c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
             |c3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2),
             |m2 AS (SELECT doc_id, SUM(cnt) AS n2,
             |         COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS dup2, MAX(cnt) AS top2
             |       FROM c2 GROUP BY 1),
             |m3 AS (SELECT doc_id, SUM(cnt) AS n3,
             |         COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS dup3
             |       FROM c3 GROUP BY 1)
             |SELECT m2.doc_id,
             |  round(CAST(dup2 AS DOUBLE) / n2, 4) AS dup_bigram_frac,
             |  round(CAST(top2 AS DOUBLE) / n2, 4) AS top_bigram_frac,
             |  round(CAST(dup3 AS DOUBLE) / n3, 4) AS dup_trigram_frac
             |FROM m2 JOIN m3 USING (doc_id) ORDER BY m2.doc_id""".stripMargin)),

    // Quality-gate calibration: per-source DISCRETE percentiles of x50's
    // continuous classifier score plus the threshold that keeps the top
    // 70% — the table a gating policy reads before anyone picks a cutoff
    // (a global threshold keeps 72% of one source and 44% of another;
    // per-source calibration is how mixing stays controlled). Discrete
    // (index-picked) percentiles, not interpolated: interpolation
    // midpoints land on round-half boundaries where engines disagree,
    // index picks are exact in both. One window per source — at 100 TB
    // this runs per-source-sampled; the exact contract here is what the
    // sample estimates.
    QuerySpec(
      "x73_quality_gate_calibration",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text"))).as("sc"))
          .select(col("doc_id"), col("source"),
            when(col("sc.n_feats") > 0,
              round(col("sc.margin").cast("double") / (col("sc.n_feats") * 1048576L), 6))
              .otherwise(lit(0.0)).as("score"))
        val w = Window.partitionBy("source").orderBy(col("score"), col("doc_id"))
        val wn = Window.partitionBy("source")
        def pick(q: Double) =
          max(when(col("rn") === ceil(lit(q) * col("n")).cast("long"), col("score")))
        scored
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("source")
          .agg(max(col("n")).as("n_docs"),
            pick(0.25).as("p25"), pick(0.50).as("p50"), pick(0.75).as("p75"),
            pick(0.30).as("keep70_threshold"),
            round(avg(when(col("score") > 0, 1.0).otherwise(0.0)), 4).as("pos_rate"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |f AS (SELECT doc_id,
             |  unnest(list_concat(toks, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS feat FROM t),
             |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |       [CAST(ord(c) AS BIGINT) for c in string_split(feat, '')]),
             |       (acc, x) -> (acc*31 + x) % 2147483647) % 4096 AS b FROM f),
             |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
             |        CAST(SUM((b * 2654435761) % 1048576 - 524288) AS BIGINT) AS margin
             |      FROM h GROUP BY 1),
             |s AS (SELECT t.doc_id, t.source,
             |        CASE WHEN COALESCE(m.n_feats, 0) > 0
             |             THEN round(CAST(m.margin AS DOUBLE) / (m.n_feats * 1048576), 6) ELSE 0.0 END AS score
             |      FROM t LEFT JOIN m USING (doc_id)),
             |r AS (SELECT source, score,
             |        row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
             |        COUNT(*) OVER (PARTITION BY source) AS n
             |      FROM s)
             |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
             |  MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN score END) AS p25,
             |  MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN score END) AS p50,
             |  MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN score END) AS p75,
             |  MAX(CASE WHEN rn = CAST(ceil(0.30 * n) AS BIGINT) THEN score END) AS keep70_threshold,
             |  round(AVG(CASE WHEN score > 0 THEN 1.0 ELSE 0.0 END), 4) AS pos_rate
             |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // Tokenizer fertility per (lang, source): BPE tokens per word and raw
    // chars per BPE token — the table that prices every mixing decision
    // in TOKENS instead of documents (a source whose fertility is 1.4x
    // costs 1.4x the training budget per word; token-budget mixing reads
    // this, not row counts). Composes x33's trained merges + x35's
    // row-local segmentation; one groupBy on the (lang, source) key.
    // chars_per_token is over raw document chars (n_chars) — the
    // bytes-on-disk per token lens, deliberately including whitespace.
    QuerySpec(
      "x74_tokenizer_fertility",
      (s, dir) => {
        val merges = BpeTrain.trainMerges(Tables.documents(s, dir), "text", BpeNumMerges)
          .orderBy("step").select("merge_left", "merge_right")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            TextFunctions.tokens(col("text")).as("toks"))
          .where(size(col("toks")) > 0)
          .select(col("lang"), col("source"), col("n_chars"),
            size(col("toks")).cast("long").as("n_words"),
            BpeTrain.bpeTokenCountUdf(merges)(col("toks")).as("n_bpe"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("n_words"),
            sum(col("n_bpe")).as("n_bpe_tokens"),
            sum(col("n_chars")).as("n_chars"),
            round(sum(col("n_bpe")).cast("double") / sum(col("n_words")), 4)
              .as("fertility"),
            round(sum(col("n_chars")).cast("double") / sum(col("n_bpe")), 4)
              .as("chars_per_token"))
          .orderBy("lang", "source")
      },
      Some(bpeTrainCte + """,
             |final AS (SELECT vocab FROM bpe
             |          WHERE step = (SELECT MAX(step) FROM bpe)),
             |wmap AS (SELECT replace(u.w.s, chr(1), '') AS word,
             |                CAST(len(list_filter(string_split(u.w.s, chr(1)),
             |                         x -> x <> '')) AS BIGINT) AS nseg
             |         FROM final f, unnest(f.vocab) AS u(w)),
             |dt AS (SELECT doc_id, lang, source, n_chars, unnest(list_filter(
             |         regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS word
             |       FROM documents),
             |per AS (SELECT doc_id, lang, source, MAX(n_chars) AS nc,
             |          CAST(COUNT(*) AS BIGINT) AS nw, CAST(SUM(wmap.nseg) AS BIGINT) AS nb
             |        FROM dt JOIN wmap USING (word) GROUP BY 1, 2, 3)
             |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(nw) AS BIGINT) AS n_words,
             |  CAST(SUM(nb) AS BIGINT) AS n_bpe_tokens,
             |  CAST(SUM(nc) AS BIGINT) AS n_chars,
             |  round(CAST(SUM(nb) AS DOUBLE) / SUM(nw), 4) AS fertility,
             |  round(CAST(SUM(nc) AS DOUBLE) / SUM(nb), 4) AS chars_per_token
             |FROM per GROUP BY 1, 2 ORDER BY lang, source""".stripMargin)),

    // Passage chunking for embed-and-index (the retrieval/RAG prep stage):
    // overlapping 32-token windows at stride 24, so no 8-token span ever
    // straddles a boundary unseen by both neighbors. Fully declarative
    // (sequence → transform → slice HOFs, codegen'd, zero UDF); the
    // explode is row-local fan-out — no shuffle until a consumer
    // aggregates. Emits slim (doc, idx, n_tokens, sha) rows: the chunk
    // digest is what a downstream embedding cache keys on.
    QuerySpec(
      "x75_passage_chunks",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .where(size(col("toks")) > 0)
          .select(col("doc_id"),
            explode(TextFunctions.slidingChunks(col("toks"), 32, 24)).as("ch"))
          .select(col("doc_id"), col("ch.idx").as("chunk_idx"),
            size(TextFunctions.tokens(col("ch.chunk"))).cast("long").as("n_tokens"),
            sha2(col("ch.chunk").cast("binary"), 256).as("chunk_sha"))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |c AS (SELECT doc_id,
             |  unnest([{'idx': k, 'chunk': array_to_string(toks[k*24+1 : k*24+32], ' ')}
             |          for k in range(0, CASE WHEN len(toks) <= 32 THEN 1
             |            ELSE CAST(ceil(CAST(len(toks) - 32 AS DOUBLE) / 24) AS BIGINT) + 1 END)]) AS ch
             |  FROM t WHERE len(toks) > 0)
             |SELECT doc_id, CAST(ch.idx AS INT) AS chunk_idx,
             |  CAST(len(list_filter(regexp_split_to_array(ch.chunk, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             |  sha256(ch.chunk) AS chunk_sha
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // IVF index health: per-cell occupancy share and distortion (avg/max
    // squared distance to the assigned centroid) — the re-train signals
    // for a frozen coarse quantizer (AnnStream's ingest note: appended
    // data that drifts piles into few cells; this table is where it
    // shows). Distances ride as integer micros so the per-cell fold is
    // order-independent on both engines. One row-local kernel + one
    // groupBy on the k-sized cell key.
    QuerySpec(
      "x76_ivf_cell_health",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cents = Similarity.seedVectors(e, "vec_id", "embedding", (0L to 7L))
          .map(_.map(_.toDouble).toArray).toArray
        val assigned = e
          .select(Similarity.cellAssignUdf(cents)(col("embedding")).as("ca"))
          .select(col("ca.cell").as("cell"), col("ca.micros").as("micros"))
        val tot = assigned.agg(count(lit(1)).as("n_total"))
        assigned.groupBy("cell")
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("micros")).as("sum_micros"),
            max(col("micros")).as("max_micros"))
          .crossJoin(broadcast(tot))
          .select(col("cell"), col("n_vecs"),
            round(col("n_vecs").cast("double") / col("n_total"), 4).as("share"),
            round(col("sum_micros").cast("double") / col("n_vecs") / 1e6, 6)
              .as("avg_d2"),
            round(col("max_micros").cast("double") / 1e6, 6).as("max_d2"))
          .orderBy("cell")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |ivf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |        FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |dv AS (SELECT e.vec_id, ivf.cell,
             |         list_sum([(e.emb[i]-ivf.cemb[i])*(e.emb[i]-ivf.cemb[i]) for i in range(1,65)]) AS d2
             |       FROM e CROSS JOIN ivf),
             |assign AS (SELECT vec_id, cell, CAST(round(d2 * 1000000, 0) AS BIGINT) AS micros
             |           FROM (SELECT vec_id, cell, d2,
             |                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM dv)
             |           WHERE rnk = 1),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM assign)
             |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             |  round(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n), 4) AS share,
             |  round(CAST(SUM(micros) AS DOUBLE) / COUNT(*) / 1000000, 6) AS avg_d2,
             |  round(CAST(MAX(micros) AS DOUBLE) / 1000000, 6) AS max_d2
             |FROM assign CROSS JOIN tot GROUP BY cell ORDER BY cell""".stripMargin)),

    // Marginal-novelty curve by source: for a fixed acquisition order,
    // how many distinct word 3-grams each successive source adds that no
    // earlier source had — the diminishing-returns table that prices the
    // NEXT source (on this corpus new_frac decays 1.0 → ~0.41 down the
    // order). Shuffles only slim gram hashes: distinct (source, gram),
    // then first-source per gram, then |sources|-sized aggregates; the
    // cumulative window runs over 20 rows, not the corpus.
    QuerySpec(
      "x77_source_novelty_curve",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.documents(s, dir)
          .select(col("source"),
            expr("CAST(substring(source, 4) AS INT)").as("src_ord"),
            explode(Dedup.wordGramHashUdf(3)(TextFunctions.tokens(col("text"))))
              .as("gram"))
          .distinct()
        val per = g.groupBy("src_ord", "source").agg(count(lit(1)).as("n_grams"))
        val nw = g.groupBy("gram").agg(min(col("src_ord")).as("src_ord"))
          .groupBy("src_ord").agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy("src_ord").rowsBetween(Window.unboundedPreceding, 0)
        per.join(nw, Seq("src_ord"), "left")
          .select(col("src_ord"), col("source"), col("n_grams"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
          .withColumn("new_frac",
            round(col("n_new").cast("double") / col("n_grams"), 4))
          .withColumn("cum_new", sum(col("n_new")).over(w).cast("long"))
          .orderBy("src_ord")
      },
      Some("""WITH t AS (SELECT doc_id, source, CAST(substring(source, 4) AS INT) AS src_ord,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |g AS (SELECT DISTINCT src_ord, source, unnest([list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      [CAST(ord(c) AS BIGINT) for c in string_split(array_to_string(toks[i:i+2], ' '), '')]),
             |    (acc, x) -> (acc*31 + x) % 2147483647)
             |    for i in range(1, len(toks) - 1)]) AS gram
             |  FROM t WHERE len(toks) >= 3),
             |per AS (SELECT src_ord, source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY 1, 2),
             |fst AS (SELECT gram, MIN(src_ord) AS first_src FROM g GROUP BY 1),
             |nw AS (SELECT first_src AS src_ord, CAST(COUNT(*) AS BIGINT) AS n_new FROM fst GROUP BY 1)
             |SELECT per.src_ord, per.source, per.n_grams, COALESCE(nw.n_new, 0) AS n_new,
             |  round(CAST(COALESCE(nw.n_new, 0) AS DOUBLE) / per.n_grams, 4) AS new_frac,
             |  CAST(SUM(COALESCE(nw.n_new, 0)) OVER (ORDER BY per.src_ord) AS BIGINT) AS cum_new
             |FROM per LEFT JOIN nw USING (src_ord) ORDER BY per.src_ord""".stripMargin)),

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

    // Full index lifecycle with a health-triggered RETRAIN (closes the
    // x76 loop): v1 is built on half the corpus with a deliberately
    // under-trained coarse quantizer (2 cells — the drifted-distribution
    // stand-in), the other half append-ingests through the frozen
    // quantizers (AnnStream's batch twin), the occupancy health signal
    // fires (2 cells ⇒ max share ≥ 0.5 > 0.25), and retrainIfUnhealthy
    // re-trains both quantizers on the full corpus, re-encodes, and
    // atomically swaps the CURRENT pointer to v2. Serving off the swapped
    // pointer must equal a fresh full-corpus build bit-for-bit — the
    // oracle is x70's SQL verbatim (same final quantizer spec), so a
    // retrain that loses or double-encodes anything hash-fails.
    QuerySpec(
      "x83_ivfpq_retrain_swap",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        // Fresh root per invocation (AnnStreamSpec's discipline): a fixed
        // shared tmp root would let two concurrent sessions (bench +
        // verify) race on each other's recursive delete. The root can't
        // be deleted inside this body — the returned DataFrame lazily
        // re-reads the published index — so an exit hook reaps it (each
        // bench/verify invocation would otherwise leak two full index
        // copies per run).
        val root = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_versioned").toString
        deleteOnExit(root)
        val mid = e.agg(max(col("vec_id"))).head.getLong(0) / 2
        val first = e.filter(col("vec_id") <= mid)
        val cbA = Similarity.seedVectors(first, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        IvfPqIndex.publish(
          IvfPqIndex.build(first, "vec_id", "embedding",
            seedIds = (0L to 1L), m = 8, cbA), root, v = 1)
        graft.streaming.AnnStream.ingestBatch(e.filter(col("vec_id") > mid),
          "vec_id", "embedding", IvfPqIndex.currentDir(root))
        val v = IvfPqIndex.retrainIfUnhealthy(s, root, e, "vec_id", "embedding",
          seedIds = (0L to 7L), m = 8, codebookSeedIds = (0L to 15L),
          maxShare = 0.25)
        require(v.contains(2), s"health trigger must fire on a 2-cell index, got $v")
        IvfPqIndex.loadCurrent(s, root)
          .refineTopK(e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
            k = 10, nProbe = 4, refine = 100)
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |ivf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
             |        FROM e WHERE vec_id IN (0,1,2,3,4,5,6,7)),
             |dv AS (SELECT e.vec_id, ivf.cell,
             |         list_sum([(e.emb[i]-ivf.cemb[i])*(e.emb[i]-ivf.cemb[i]) for i in range(1,65)]) AS d2
             |       FROM e CROSS JOIN ivf),
             |rankedv AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk FROM dv),
             |assign AS (SELECT vec_id, cell FROM rankedv WHERE rnk = 1),
             |probe AS (SELECT vec_id, cell FROM rankedv WHERE rnk <= 4 AND vec_id < 5),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |d AS (SELECT e.vec_id, sub.s, cb.c,
             |        list_sum([(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(e.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM e CROSS JOIN sub CROSS JOIN cb),
             |code AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM d),
             |cc AS (SELECT vec_id AS cid, s, c FROM code WHERE rnk = 1),
             |lut AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM d WHERE vec_id < 5),
             |cand AS (SELECT p.vec_id AS qid, a.vec_id AS cid
             |         FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.vec_id),
             |f AS (SELECT cand.qid, cand.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |      FROM cand JOIN cc ON cc.cid = cand.cid
             |      JOIN lut l ON l.qid = cand.qid AND l.s = cc.s AND l.c = cc.c
             |      GROUP BY 1, 2),
             |short AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM f)
             |  WHERE rn <= 100),
             |r AS (SELECT s.qid, s.cid,
             |        round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |      FROM short s JOIN n q ON q.vec_id = s.qid JOIN n c ON c.vec_id = s.cid)
             |SELECT qid, cid, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM r QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // OPQ-style rotation eval (closes VERDICT r6 item 7, Ge et al. CVPR
    // 2013's eigenvalue-allocation flavor, public): does a
    // variance-balanced dimension permutation (varianceSnakePerm) lift PQ
    // recall at a FIXED refine depth? Both variants run the identical
    // PQ-ADC shortlist (m=8, seed codebook 0-15, refine=30) + exact
    // re-rank; truth is the exact cosine top-10, which one permutation-
    // invariant computation serves for both. MEASURED ANSWER on this
    // corpus: no lift (mean recall@10 0.52 plain vs 0.46 rotated) — the
    // embeddings are near-isotropic (per-dim variance spread 1.31x,
    // natural subspace sums within 7%), so the seed codebook, not the
    // dimension allocation, binds recall. That is WHY the rotation is not
    // wired into the serving path (x68/x70); it earns its keep on real
    // embedding models whose leading dims concentrate variance. The
    // oracle re-derives the permutation from per-dim variance in SQL, so
    // the snake allocation itself is hash-checked, not inlined. The FULL
    // learned-rotation OPQ (dense orthogonal R via alternating Procrustes)
    // lives in [[Opq]] — its SVD is not SQL-expressible, so it is
    // test-gated (OpqSpec) rather than oracle-checked.
    QuerySpec(
      "x84_opq_rotation_eval",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 5)
        val exact = Similarity.cosineTopK(q, e, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("cid"))
        val cb = Similarity.seedVectors(e, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        val perm = Similarity.varianceSnakePerm(e, "embedding", dim = 64, m = 8)
        val cbRot = cb.map(cent => Array.tabulate(64)(j => cent(perm(j))))
        val plainShort = Similarity.pqAdcTopK(q, e, "vec_id", "embedding",
            m = 8, k = 30, codebook = cb).select(col("qid"), col("cid"))
        val plain = Similarity.cosineRerank(plainShort, q, e, "vec_id",
            "embedding", k = 10)
          .select(col("qid"), col("cid")).withColumn("hit_p", lit(1L))
        val eRot = e.withColumn("rot",
          Similarity.permuteDims(col("embedding"), perm))
        val qRot = q.withColumn("rot",
          Similarity.permuteDims(col("embedding"), perm))
        val rotShort = Similarity.pqAdcTopK(qRot, eRot, "vec_id", "rot",
            m = 8, k = 30, codebook = cbRot).select(col("qid"), col("cid"))
        val rot = Similarity.cosineRerank(rotShort, q, e, "vec_id",
            "embedding", k = 10)
          .select(col("qid"), col("cid")).withColumn("hit_r", lit(1L))
        exact.join(plain, Seq("qid", "cid"), "left")
          .join(rot, Seq("qid", "cid"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("k"),
            sum(coalesce(col("hit_p"), lit(0L))).as("n_hit_plain"),
            sum(coalesce(col("hit_r"), lit(0L))).as("n_hit_rot"))
          .select(col("qid"), col("k"), col("n_hit_plain"), col("n_hit_rot"),
            round(col("n_hit_plain").cast("double") / col("k"), 4)
              .as("recall_plain"),
            round(col("n_hit_rot").cast("double") / col("k"), 4)
              .as("recall_rot"))
          .orderBy("qid")
      },
      Some("""WITH e0 AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e0),
             |ex AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |  FROM n q CROSS JOIN n c WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
             |exact10 AS (
             |  SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM ex)
             |  WHERE rn <= 10),
             |vstats AS (SELECT i, round(var_pop(emb[i]), 6) AS v
             |           FROM e0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t GROUP BY 1),
             |ranked AS (SELECT i, row_number() OVER (ORDER BY v DESC, i) - 1 AS r FROM vstats),
             |pmap AS (SELECT i AS dim,
             |           (CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END) * 8 + (r // 8) + 1 AS j
             |         FROM ranked),
             |rote AS (SELECT e0.vec_id, list(e0.emb[p.dim] ORDER BY p.j) AS emb
             |         FROM e0 CROSS JOIN pmap p GROUP BY e0.vec_id),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |cbp AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |        FROM e0 WHERE vec_id BETWEEN 0 AND 15),
             |dp AS (SELECT e0.vec_id, sub.s, cbp.c,
             |         list_sum([(e0.emb[8*sub.s+i]-cbp.cemb[8*sub.s+i])*(e0.emb[8*sub.s+i]-cbp.cemb[8*sub.s+i])
             |                   for i in range(1, 9)]) AS d2
             |       FROM e0 CROSS JOIN sub CROSS JOIN cbp),
             |codep AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM dp),
             |ccp AS (SELECT vec_id AS cid, s, c FROM codep WHERE rnk = 1),
             |lutp AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM dp WHERE vec_id < 5),
             |fp AS (SELECT l.qid, ccp.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |       FROM ccp JOIN lutp l ON l.s = ccp.s AND l.c = ccp.c
             |       WHERE l.qid <> ccp.cid GROUP BY 1, 2),
             |shortp AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM fp)
             |  WHERE rn <= 30),
             |rp AS (SELECT s.qid, s.cid,
             |         round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |       FROM shortp s JOIN n q ON q.vec_id = s.qid JOIN n c ON c.vec_id = s.cid),
             |ap AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM rp)
             |  WHERE rn <= 10),
             |cbr AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |        FROM rote WHERE vec_id BETWEEN 0 AND 15),
             |dr AS (SELECT rote.vec_id, sub.s, cbr.c,
             |         list_sum([(rote.emb[8*sub.s+i]-cbr.cemb[8*sub.s+i])*(rote.emb[8*sub.s+i]-cbr.cemb[8*sub.s+i])
             |                   for i in range(1, 9)]) AS d2
             |       FROM rote CROSS JOIN sub CROSS JOIN cbr),
             |coder AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rnk FROM dr),
             |ccr AS (SELECT vec_id AS cid, s, c FROM coder WHERE rnk = 1),
             |lutr AS (SELECT vec_id AS qid, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM dr WHERE vec_id < 5),
             |fr AS (SELECT l.qid, ccr.cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |       FROM ccr JOIN lutr l ON l.s = ccr.s AND l.c = ccr.c
             |       WHERE l.qid <> ccr.cid GROUP BY 1, 2),
             |shortr AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM fr)
             |  WHERE rn <= 30),
             |rr AS (SELECT s.qid, s.cid,
             |         round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)]) / (q.nrm*c.nrm), 4) AS sim
             |       FROM shortr s JOIN n q ON q.vec_id = s.qid JOIN n c ON c.vec_id = s.cid),
             |ar AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM rr)
             |  WHERE rn <= 10)
             |SELECT e10.qid, CAST(COUNT(*) AS BIGINT) AS k,
             |  CAST(COUNT(p.cid) AS BIGINT) AS n_hit_plain,
             |  CAST(COUNT(r2.cid) AS BIGINT) AS n_hit_rot,
             |  round(CAST(COUNT(p.cid) AS DOUBLE) / COUNT(*), 4) AS recall_plain,
             |  round(CAST(COUNT(r2.cid) AS DOUBLE) / COUNT(*), 4) AS recall_rot
             |FROM exact10 e10 LEFT JOIN ap p USING (qid, cid) LEFT JOIN ar r2 USING (qid, cid)
             |GROUP BY 1 ORDER BY qid""".stripMargin)),

    // Item-PMI co-occurrence (Church & Hanks 1990, the SGNS/word2vec
    // association statistic, public): pointwise mutual information between
    // items that co-occur inside a bounded context — here (user, day) over
    // the events stream, items from the props payload. THE primitive
    // behind co-occurrence embeddings, related-item recommendation, and
    // collocation mining. Scale shape: contexts are distinct-ed first,
    // pairs are generated by an equi-join on the (user, day) context key —
    // per-context fan-out is bounded by context size (max 10 items here,
    // <=45 pairs), never corpus-quadratic; the final stats join touches
    // |items| + |surviving pairs| slim rows and n_ctx broadcasts as one
    // row. Top-50 by PMI is a bounded sort-limit (TakeOrdered).
    QuerySpec(
      "x85_item_pmi",
      (s, dir) => {
        val ctx = itemContexts(s, dir)
        val nCtx = ctx.select(col("user_id"), col("day")).distinct()
          .agg(count(lit(1)).as("n_ctx"))
        val ic = ctx.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
        val pairs = itemPairs(s, dir, 3)
          .select(col("ia").as("item_a"), col("ib").as("item_b"),
            col("w").as("n_ab"))
        pairs
          .join(ic.select(col("item").as("item_a"), col("n_i").as("n_a")),
            "item_a")
          .join(ic.select(col("item").as("item_b"), col("n_i").as("n_b")),
            "item_b")
          .crossJoin(broadcast(nCtx))
          .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
            col("n_b"),
            round(log(col("n_ab").cast("double") * col("n_ctx") /
              (col("n_a") * col("n_b"))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("item_a"), col("item_b"))
          .limit(50)
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |n AS (SELECT COUNT(*) AS n_ctx FROM (SELECT DISTINCT user_id, day FROM ctx)),
             |ic AS (SELECT item, COUNT(*) AS n_i FROM ctx GROUP BY 1),
             |pc AS (SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_ab
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3)
             |SELECT item_a, item_b, CAST(n_ab AS BIGINT) AS n_ab,
             |  CAST(ia.n_i AS BIGINT) AS n_a, CAST(ib.n_i AS BIGINT) AS n_b,
             |  round(ln(CAST(n_ab AS DOUBLE) * n.n_ctx / (ia.n_i * ib.n_i)), 6) AS pmi
             |FROM pc JOIN ic ia ON ia.item = pc.item_a JOIN ic ib ON ib.item = pc.item_b CROSS JOIN n
             |ORDER BY pmi DESC, item_a, item_b LIMIT 50""".stripMargin)),

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

    // Embedding distribution drift: mean-vector comparison between the
    // standing corpus and the newest ingest (halves by vec_id as the
    // stand-in) — the INPUT-side drift detector that complements x76's
    // occupancy signal (which only fires AFTER assignments skew) and
    // feeds the same x83 retrain decision. Per-dim means come from one
    // distributed aggregate over exploded (dim, value) rows — 64 groups
    // regardless of corpus size; everything downstream (top-10 drifted
    // dims, mean-cosine, ||delta||) runs on the 64-row means table.
    QuerySpec(
      "x87_embedding_drift",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val mid = e.agg(max(col("vec_id"))).head.getLong(0) / 2
        val d = e.select(
            when(col("vec_id") <= mid, lit(0)).otherwise(lit(1)).as("half"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("half"), (col("pos") + 1).cast("long").as("dim"),
            col("x").cast("double").as("x"))
        val m = d.groupBy("dim").agg(
            round(avg(when(col("half") === 0, col("x"))), 6).as("m0"),
            round(avg(when(col("half") === 1, col("x"))), 6).as("m1"))
        val delta = m.select(col("dim"), col("m0"), col("m1"),
          round(abs(col("m1") - col("m0")), 6).as("ad"))
        val top10 = delta.orderBy(col("ad").desc, col("dim")).limit(10)
          .select(lit("abs_delta").as("metric"), col("dim"),
            col("ad").as("value"))
        val summary = delta.agg(
            round(sum(col("m0") * col("m1")) /
              (sqrt(sum(col("m0") * col("m0"))) *
                sqrt(sum(col("m1") * col("m1")))), 6).as("mean_cos"),
            round(sqrt(sum(pow(col("m1") - col("m0"), lit(2)))), 6)
              .as("delta_l2"))
        val cosRow = summary.select(lit("mean_cos").as("metric"),
          lit(-1L).as("dim"), col("mean_cos").as("value"))
        val l2Row = summary.select(lit("delta_l2").as("metric"),
          lit(-1L).as("dim"), col("delta_l2").as("value"))
        cosRow.union(l2Row).union(top10).orderBy("metric", "dim")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |mid AS (SELECT MAX(vec_id) // 2 AS mid FROM e),
             |d AS (SELECT i.i AS dim, e.emb[i.i] AS x,
             |        CASE WHEN e.vec_id <= mid.mid THEN 0 ELSE 1 END AS half
             |      FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i CROSS JOIN mid),
             |m AS (SELECT dim,
             |        round(avg(CASE WHEN half = 0 THEN x END), 6) AS m0,
             |        round(avg(CASE WHEN half = 1 THEN x END), 6) AS m1
             |      FROM d GROUP BY 1),
             |delta AS (SELECT dim, m0, m1, round(abs(m1 - m0), 6) AS ad FROM m),
             |top10 AS (SELECT 'abs_delta' AS metric, CAST(dim AS BIGINT) AS dim,
             |            CAST(ad AS DOUBLE) AS value
             |          FROM (SELECT dim, ad, row_number() OVER (ORDER BY ad DESC, dim) AS rn FROM delta)
             |          WHERE rn <= 10),
             |cosr AS (SELECT 'mean_cos' AS metric, CAST(-1 AS BIGINT) AS dim,
             |           round(SUM(m0*m1) / (sqrt(SUM(m0*m0)) * sqrt(SUM(m1*m1))), 6) AS value
             |         FROM m),
             |l2 AS (SELECT 'delta_l2' AS metric, CAST(-1 AS BIGINT) AS dim,
             |         round(sqrt(SUM((m1-m0)*(m1-m0))), 6) AS value
             |       FROM m)
             |SELECT * FROM (SELECT * FROM cosr UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM top10)
             |ORDER BY metric, dim""".stripMargin)),

    // Leakage-safe train/val split: split assignment happens at the
    // NEAR-DUP-GROUP level (x31's connected components; singletons are
    // their own group), so two near-copies can never straddle the
    // boundary and leak training text into eval — the contamination mode
    // a per-doc hash split (q22/O1) cannot prevent. The output carries
    // its own evidence: span_groups (groups split across both sides) is
    // structurally 0, while naive_leaked_pairs counts the near-dup pairs
    // a PER-DOC hash split of the same corpus WOULD have leaked (4 here —
    // the guard is load-bearing, not vacuous). Scale shape: rides x31's
    // bucketed candidate generation + O(diameter) label propagation; the
    // split itself is one hash projection on the group id, and the report
    // is a 2-row groupBy with two 1-row broadcast joins.
    QuerySpec(
      "x88_leakage_safe_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // the slim surviving-pair table feeds TWO consumers (cluster
        // formation and the naive-split counterfactual); checkpoint it so
        // the banding+verify pipeline runs once, not per consumer
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 16, threshold = 0.8).localCheckpoint()
        val clusters = Dedup.dupClusters(pairs)
          .select(col("doc_id"), col("cluster_id"))
        def splitOf(c: org.apache.spark.sql.Column) =
          when(conv(substring(md5(concat(lit("split:"), c.cast("string"))),
            1, 6), 16, 10).cast("long") % 10 < 8, "train").otherwise("val")
        val gs = docs.select(col("doc_id"))
          .join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("gid"),
            col("cluster_id").isNotNull.as("clustered"))
          .withColumn("split", splitOf(col("gid")))
        val span = gs.groupBy("gid")
          .agg(countDistinct(col("split")).as("ns"))
          .filter(col("ns") > 1)
          .agg(count(lit(1)).as("span_groups"))
        val naive = pairs
          .select((splitOf(col("doc_a")) =!= splitOf(col("doc_b")))
            .cast("long").as("leak"))
          .agg(coalesce(sum(col("leak")), lit(0L)).as("naive_leaked_pairs"))
        gs.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("gid")).as("n_groups"),
            sum(col("clustered").cast("long")).as("n_clustered_docs"))
          .crossJoin(broadcast(span)).crossJoin(broadcast(naive))
          .orderBy("split")
      },
      Some(dupGraphCtes + ",\n" +
        """alld AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS gid
          |         FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
          |gs AS (SELECT doc_id, gid,
          |         CASE WHEN CAST(('0x' || substr(md5('split:' || CAST(gid AS VARCHAR)), 1, 6)) AS BIGINT) % 10 < 8
          |              THEN 'train' ELSE 'val' END AS split
          |       FROM alld),
          |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS naive_leaked_pairs FROM p
          |       WHERE (CAST(('0x' || substr(md5('split:' || CAST(doc_a AS VARCHAR)), 1, 6)) AS BIGINT) % 10 < 8)
          |          <> (CAST(('0x' || substr(md5('split:' || CAST(doc_b AS VARCHAR)), 1, 6)) AS BIGINT) % 10 < 8)),
          |span AS (SELECT CAST(COUNT(*) AS BIGINT) AS span_groups FROM (
          |           SELECT gid FROM gs GROUP BY 1 HAVING COUNT(DISTINCT split) > 1)),
          |cl AS (SELECT doc_id FROM lab)
          |SELECT gs.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(COUNT(DISTINCT gs.gid) AS BIGINT) AS n_groups,
          |  CAST(SUM(CASE WHEN cl.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered_docs,
          |  span.span_groups, nv.naive_leaked_pairs
          |FROM gs LEFT JOIN cl ON cl.doc_id = gs.doc_id CROSS JOIN span CROSS JOIN nv
          |GROUP BY gs.split, span.span_groups, nv.naive_leaked_pairs ORDER BY gs.split""".stripMargin)),

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

    // Vocabulary coverage curve: what fraction of all token OCCURRENCES
    // does a top-V vocabulary cover, at doubling V — the curve that sizes
    // a tokenizer vocab (or quantifies OOV pressure) before training one.
    // The token count is one distributed groupBy; ranking is a bounded
    // top-32 (raw row_number filter => Partial+Final WindowGroupLimit,
    // never a global window over the full vocab), and the curve join runs
    // 6 sizes x 32 ranked rows.
    QuerySpec(
      "x90_vocab_coverage",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("t"))
          .filter(col("t") =!= "")
        val tc = tok.groupBy("t").agg(count(lit(1)).as("n"))
        val tot = tc.agg(sum(col("n")).as("total"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("t"))
        val top = tc.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 32)
        val sizes = s.range(0, 6)
          .select(pow(lit(2), col("id")).cast("long").as("vocab_size"))
        sizes.join(top, col("rk") <= col("vocab_size"))
          .crossJoin(broadcast(tot))
          .groupBy("vocab_size")
          .agg(sum(col("n")).as("cum_tokens"),
            round(sum(col("n")).cast("double") / max(col("total")), 6)
              .as("coverage"))
          .orderBy("vocab_size")
      },
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
             |tc AS (SELECT t, COUNT(*) AS n FROM tok WHERE t <> '' GROUP BY 1),
             |tot AS (SELECT SUM(n) AS total FROM tc),
             |r AS (SELECT t, n, row_number() OVER (ORDER BY n DESC, t) AS rk FROM tc QUALIFY rk <= 32),
             |v AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS v)
             |SELECT CAST(v.v AS BIGINT) AS vocab_size, CAST(SUM(r.n) AS BIGINT) AS cum_tokens,
             |  round(CAST(SUM(r.n) AS DOUBLE) / MAX(tot.total), 6) AS coverage
             |FROM v JOIN r ON r.rk <= v.v CROSS JOIN tot
             |GROUP BY v.v ORDER BY vocab_size""".stripMargin)),

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

    // Matryoshka truncation eval (Kusupati et al. 2022, "Matryoshka
    // Representation Learning", public): recall@10 of cosine search over
    // PREFIX-truncated embeddings (16/32/64 dims) against the full-dim
    // exact truth — the measurement that decides whether a cheaper
    // low-dim first-stage retrieval is safe for this embedding model.
    // MEASURED ANSWER here: these synthetic embeddings carry NO
    // matryoshka structure (recall 0.1-0.3 @16, 0.2-0.5 @32; 1.0 @64 is
    // the built-in sanity check) — information is spread uniformly across
    // dims, consistent with x84's isotropy finding. On an MRL-trained
    // model the same query grades the dim-budget trade directly.
    QuerySpec(
      "x92_matryoshka_recall",
      (s, dir) => {
        import s.implicits._
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 5)
        val exact = Similarity.cosineTopK(q, e, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("cid"))
        val t10 = Seq(16, 32, 64).map { d =>
          val te = e.select(col("vec_id"),
            slice(col("embedding"), 1, d).as("embedding"))
          val tq = q.select(col("vec_id"),
            slice(col("embedding"), 1, d).as("embedding"))
          Similarity.cosineTopK(tq, te, "vec_id", "embedding", k = 10)
            .select(lit(d.toLong).as("dims"), col("qid"), col("cid"),
              lit(1L).as("hit"))
        }.reduce(_ union _)
        val dimsDf = Seq(16L, 32L, 64L).toDF("dims")
        exact.crossJoin(broadcast(dimsDf))
          .join(t10, Seq("dims", "qid", "cid"), "left")
          .groupBy("dims", "qid")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("dims"), col("qid"), col("n_hit"),
            round(col("n_hit").cast("double") / 10, 4).as("recall"))
          .orderBy("dims", "qid")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |dims AS (SELECT unnest([16, 32, 64]) AS d),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x*x for x in emb])) AS nrm FROM e),
             |ex AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |         round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)])/(q.nrm*c.nrm),4) AS sim
             |       FROM n q CROSS JOIN n c WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
             |exact10 AS (SELECT qid, cid FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM ex) WHERE rn <= 10),
             |tr AS (SELECT d.d, e.vec_id, e.emb[1:d.d] AS temb,
             |         sqrt(list_sum([x*x for x in e.emb[1:d.d]])) AS tnrm
             |       FROM e CROSS JOIN dims d),
             |tx AS (SELECT q.d, q.vec_id AS qid, c.vec_id AS cid,
             |         round(list_sum([q.temb[i]*c.temb[i] for i in range(1, q.d+1)])/(q.tnrm*c.tnrm), 4) AS sim
             |       FROM tr q JOIN tr c ON q.d = c.d AND q.vec_id < 5 AND q.vec_id <> c.vec_id),
             |t10 AS (SELECT d, qid, cid FROM (
             |    SELECT d, qid, cid, row_number() OVER (PARTITION BY d, qid ORDER BY sim DESC, cid) AS rn FROM tx) WHERE rn <= 10)
             |SELECT dims.d AS dims, e10.qid AS qid, CAST(COUNT(t10.cid) AS BIGINT) AS n_hit,
             |  round(CAST(COUNT(t10.cid) AS DOUBLE) / 10, 4) AS recall
             |FROM dims CROSS JOIN exact10 e10
             |LEFT JOIN t10 ON t10.d = dims.d AND t10.qid = e10.qid AND t10.cid = e10.cid
             |GROUP BY 1, 2 ORDER BY dims, qid""".stripMargin)),

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

    // Boilerplate/tag stripping (the extraction stage between crawl and
    // every text op; jusText/trafilatura territory, here the regex-chain
    // core). The corpus is plain text, so the markup is built IN-PLAN
    // from the data (the x32 unicode-damage device): wrap each doc in
    // head/nav/footer chrome, then strip container blocks (non-greedy,
    // no backreferences — RE2-safe for the oracle) and remaining tags.
    // Both engines damage and clean with their own regex engines; the
    // hash compare proves the cleaned text and removed-char accounting
    // agree byte-for-byte. Row-local, codegen, no shuffle.
    QuerySpec(
      "x97_boilerplate_strip",
      (s, dir) => {
        val h = Tables.documents(s, dir)
          .select(col("doc_id"), concat(
            lit("<html><head><title>t</title></head><body><nav>menu home about</nav><p>"),
            substring(col("text"), 1, 60),
            lit("</p><footer>copyright 2024 corp</footer></body></html>"))
            .as("html"))
        val clean = regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(col("html"),
            "<head>.*?</head>", ""),
            "<nav>.*?</nav>", ""),
            "<footer>.*?</footer>", ""),
            "<[^>]*>", "")
        h.select(col("doc_id"), clean.as("clean"),
            (length(col("html")) - length(clean)).cast("long")
              .as("removed_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
             |  '<html><head><title>t</title></head><body><nav>menu home about</nav><p>' ||
             |  substr(text, 1, 60) || '</p><footer>copyright 2024 corp</footer></body></html>' AS html
             |  FROM documents),
             |c AS (SELECT doc_id, html,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
             |    '<head>.*?</head>', '', 'g'),
             |    '<nav>.*?</nav>', '', 'g'),
             |    '<footer>.*?</footer>', '', 'g'),
             |    '<[^>]*>', '', 'g') AS clean
             |  FROM h)
             |SELECT doc_id, clean, CAST(length(html) - length(clean) AS BIGINT) AS removed_chars
             |FROM c ORDER BY doc_id""".stripMargin)),

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

    // Exact substring dedup via SORTED-SUFFIX ranges (Lee et al. 2022
    // ExactSubstr, the suffix-array device proper — x38 is its fixed-k
    // gram approximation): truncated suffixes sort inside first-8-char
    // buckets, each takes its measured LCP against its lag/lead neighbor
    // (the suffix-array property: the nearest sorted neighbor realizes
    // the maximal match on its side), positions with LCP >= 16 chars
    // mark [pos, pos+lcp) and overlapping marks merge into maximal
    // per-doc spans. Both LCP windows are bucket-PARTITIONED and the
    // island windows are per-doc — the corpus never enters a global
    // window; all outputs integers. See Dedup.suffixDupSpans scaladoc
    // for the 100 TB plan-shape argument.
    QuerySpec(
      "x99_suffix_dedup",
      (s, dir) =>
        Dedup.suffixDupSpans(Tables.documents(s, dir), "doc_id", "text",
            depth = 32, minLen = 16, bucketLen = 8)
          .orderBy("doc_id"),
      Some("""WITH s0 AS (SELECT doc_id, unnest(range(1, len(text)+1)) AS pos, text FROM documents),
             |sfx AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, substr(text, CAST(pos AS INT), 32) AS sfx FROM s0),
             |nb AS (SELECT doc_id, pos, sfx,
             |         lag(sfx)  OVER (PARTITION BY substr(sfx, 1, 8) ORDER BY sfx, doc_id, pos) AS prv,
             |         lead(sfx) OVER (PARTITION BY substr(sfx, 1, 8) ORDER BY sfx, doc_id, pos) AS nxt
             |       FROM sfx),
             |lcp AS (SELECT doc_id, pos,
             |          least(len(sfx), greatest(
             |            CASE WHEN prv IS NULL THEN 0 ELSE len(list_filter(range(1, 33), k -> left(sfx, CAST(k AS INT)) = left(prv, CAST(k AS INT)))) END,
             |            CASE WHEN nxt IS NULL THEN 0 ELSE len(list_filter(range(1, 33), k -> left(sfx, CAST(k AS INT)) = left(nxt, CAST(k AS INT)))) END)) AS ml
             |        FROM nb),
             |h AS (SELECT doc_id, pos, pos + ml - 1 AS e FROM lcp WHERE ml >= 16),
             |m AS (SELECT doc_id, pos, e,
             |        MAX(e) OVER (PARTITION BY doc_id ORDER BY pos, e
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |      FROM h),
             |st AS (SELECT doc_id, pos, e,
             |         CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0 END AS st FROM m),
             |sp AS (SELECT doc_id, pos, e, SUM(st) OVER (PARTITION BY doc_id ORDER BY pos, e) AS sid FROM st),
             |spans AS (SELECT doc_id, sid, MIN(pos) AS a, MAX(e) AS b FROM sp GROUP BY 1, 2)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             |       CAST(SUM(b - a + 1) AS BIGINT) AS dup_chars,
             |       CAST(MAX(b - a + 1) AS BIGINT) AS max_span
             |FROM spans GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Dictionary / topic tagging — the C4-badwords-style wordlist stage
    // every corpus pipeline runs (flagging, topic routing, blocklist
    // filtering), here as per-(source, topic) coverage: documents hit,
    // total hits, share of the source's docs. The dictionary is a tiny
    // BROADCAST dim joined against row-local exploded tokens — at 100 TB
    // the corpus side never shuffles on content, only the (source, topic)
    // aggregate moves; a real deployment swaps the literal list for a
    // loaded wordlist, same plan.
    QuerySpec(
      "x100_dict_tag",
      (s, dir) => {
        import s.implicits._
        val dict = Seq(
          ("join", "relational"), ("filter", "relational"),
          ("sort", "relational"), ("agg", "relational"),
          ("stream", "streaming"), ("window", "streaming"),
          ("batch", "streaming"),
          ("vector", "vectorized"), ("column", "vectorized"),
          ("scan", "vectorized")).toDF("word", "topic")
        val d = Tables.documents(s, dir)
        val tok = d.select(col("doc_id"), col("source"),
          explode(split(lower(col("text")), " ")).as("w"))
        val hits = tok.join(broadcast(dict), tok("w") === dict("word"))
          .groupBy("source", "topic")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_hits"))
        val tot = d.groupBy("source").agg(count(lit(1)).as("n_tot"))
        hits.join(tot, "source")
          .select(col("source"), col("topic"), col("n_docs"), col("n_hits"),
            round(col("n_docs").cast("double") / col("n_tot"), 4)
              .as("doc_share"))
          .orderBy("source", "topic")
      },
      Some("""WITH dict(word, topic) AS (VALUES
             |  ('join','relational'), ('filter','relational'),
             |  ('sort','relational'), ('agg','relational'),
             |  ('stream','streaming'), ('window','streaming'),
             |  ('batch','streaming'),
             |  ('vector','vectorized'), ('column','vectorized'),
             |  ('scan','vectorized')),
             |tok AS (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
             |h AS (SELECT source, topic, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_hits
             |      FROM tok JOIN dict ON tok.w = dict.word GROUP BY 1, 2),
             |t AS (SELECT source, COUNT(*) AS n_tot FROM documents GROUP BY 1)
             |SELECT h.source, h.topic, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_hits AS BIGINT) AS n_hits,
             |  round(CAST(n_docs AS DOUBLE) / t.n_tot, 4) AS doc_share
             |FROM h JOIN t USING (source) ORDER BY 1, 2""".stripMargin)),

    // Weighted PageRank over the item co-occurrence graph (Page et al.
    // 1999; the centrality ranking behind related-item surfacing and
    // mixture curation) — x85's pair graph made undirected (each pair
    // emitted both ways), out-weight-normalized, damping 0.85, 3 power
    // iterations, top-20. Determinism device (the x40 discipline): each
    // iteration's per-edge contribution is rounded to 6 dp and summed as
    // DECIMAL(18,6) — exact and associative, so partition/add order can't
    // flip the hash — then cast back to DOUBLE for the damping step;
    // NOTHING decimal is emitted. Scale shape: every iteration is one
    // src-keyed equi-join + one dst-keyed aggregate on slim (item, item,
    // w) edges — cost is |edges| per iteration, never corpus-quadratic;
    // the node count broadcasts as one row; undirected edges mean no
    // dangling mass to redistribute.
    QuerySpec(
      "x101_item_pagerank",
      (s, dir) => {
        val edges = itemEdges(s, dir, 3)
        val wout = edges.groupBy("src").agg(sum(col("w")).as("wout"))
        val e2 = edges.join(wout, "src")
        val nodes = edges.select(col("src").as("v")).distinct()
        val nN = nodes.agg(count(lit(1)).as("n"))
        var pr = nodes.crossJoin(broadcast(nN))
          .select(col("v"), round(lit(1.0) / col("n"), 6).as("pr"))
        for (_ <- 1 to 3) {
          pr = e2.join(pr.select(col("v").as("src"), col("pr")), "src")
            .select(col("dst").as("v"),
              round(col("pr") * col("w") / col("wout"), 6)
                .cast("decimal(18,6)").as("c"))
            .groupBy("v")
            .agg(sum(col("c")).as("csum"))
            .crossJoin(broadcast(nN))
            .select(col("v"),
              round(lit(0.15) / col("n") +
                lit(0.85) * col("csum").cast("double"), 6).as("pr"))
        }
        pr.select(col("v").as("item"), col("pr"))
          .orderBy(col("pr").desc, col("item"))
          .limit(20)
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst, w FROM pc UNION ALL SELECT ib, ia, w FROM pc),
             |wo AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
             |e2 AS (SELECT e.src, e.dst, e.w, wo.wout FROM e JOIN wo USING (src)),
             |nodes AS (SELECT DISTINCT src AS v FROM e),
             |nn AS (SELECT COUNT(*) AS n FROM nodes),
             |pr0 AS (SELECT v, round(CAST(1.0 AS DOUBLE) / nn.n, 6) AS pr FROM nodes CROSS JOIN nn),
             |pr1 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr0 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n),
             |pr2 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr1 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n),
             |pr3 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr2 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n)
             |SELECT v AS item, pr FROM pr3 ORDER BY pr DESC, item LIMIT 20""".stripMargin)),

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

    // Okapi BM25 top-k retrieval (Robertson et al., TREC-3 1994, public) —
    // the lexical scorer every hybrid stack pairs with the vector arm:
    // x94 fuses rank lists; THIS is the ranker that produces the lexical
    // one (its overlap arm was a placeholder scorer). Plan shape is the
    // inverted-index join: postings (doc, term, tf) shuffle once on term,
    // the query side (terms of docs 0-2 + per-term idf) is a few hundred
    // rows and BROADCASTS — candidates are only docs sharing a query
    // term, never all pairs; per-candidate scoring is row-local; the
    // top-10 window is qid-partitioned and rank-pushed (WindowGroupLimit
    // keeps ≤10 rows/partition pre-shuffle). Constants k1=1.2, b=0.75
    // appear as the SAME decimal literals in both engines and every
    // fp op is written in the same order, so scores agree bit-for-bit;
    // per-term contributions round to 6 and sum as DECIMAL(18,6)
    // internally (the x101/x105 add-order discipline), emitted DOUBLE.
    QuerySpec(
      "x106_bm25_topk",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Bm25.topK(Bm25.termFreqs(docs),
          docs.agg(count(lit(1)).as("n_docs")))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
             |st AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             |         CAST((SELECT SUM(tf) FROM tf) AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS avgdl),
             |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |qdf AS (SELECT q.doc_id AS qid, q.term,
             |          ln(1 + (st.n_docs - df.df + 0.5e0) / (df.df + 0.5e0)) AS idf, st.avgdl
             |        FROM tf q JOIN df USING (term) CROSS JOIN st WHERE q.doc_id < 3),
             |cand AS (SELECT qdf.qid, tf.doc_id AS cid,
             |           round(qdf.idf * (tf.tf * 2.2e0) /
             |             (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / qdf.avgdl)), 6) AS contrib
             |         FROM tf JOIN qdf ON tf.term = qdf.term AND tf.doc_id <> qdf.qid
             |         JOIN dl ON dl.doc_id = tf.doc_id),
             |sc AS (SELECT qid, cid, CAST(COUNT(*) AS BIGINT) AS n_terms,
             |         CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS score
             |       FROM cand GROUP BY 1, 2)
             |SELECT qid, cid, n_terms, score,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS BIGINT) AS rn
             |FROM sc QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // Image near-duplicate detection via banded perceptual hash — the
    // multimodal twin of MinHash+LSH text dedup (x2) and the dedup
    // modality an image-bearing corpus needs (crops/re-encodes of one
    // image collapse to nearby aHashes). REAL path end to end: gradient
    // images PNG-encoded by the stage-1 encoder, ImageIO-decoded and
    // grid-sampled by the aHash kernel (Multimodal.aHash), 64 bits as
    // four 16-bit bands; candidates come from an equi-join on
    // (band, value) — the LSH device: only images agreeing EXACTLY on
    // ≥1 band pair up, never all pairs — then exact Hamming ≤ 6 confirms.
    // The oracle recomputes the hash from closed-form pixel math, so a
    // single wrong decoded pixel flips a band and reddens the row.
    // Output is the per-image summary (|images| rows, not |pairs|):
    // candidate count, confirmed near-dups, nearest-neighbor distance.
    QuerySpec(
      "x107_image_neardup",
      (s, dir) => {
        val ids = Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        // multiple plan branches reuse the hash table; localCheckpoint
        // materializes the decode+hash kernel ONCE — 5 longs per image,
        // vs re-decoding every PNG per branch
        val hashes = Multimodal
          .imageHashes(s, Multimodal.pngMediaFromIds(s, ids)).toDF()
          .localCheckpoint()
        // group-collapsed pairing (exact-dedup-first): the banded join
        // runs over DISTINCT hashes, per-image counts reconstruct from
        // group sizes — byte-identical to all-pairs enumeration
        // (MultimodalSpec), O(groups²) not O(pairs) on re-encode-heavy
        // corpora like this one (every 768th gradient image is an exact
        // pixel repeat, so hash groups are deep)
        Multimodal.nearDupSummary(hashes, maxHamming = 6)
          .orderBy("media_id")
      },
      Some("""WITH g AS (SELECT doc_id AS id, doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h FROM documents),
             |grid AS (SELECT gx.range AS gx, gy.range AS gy FROM range(8) gx CROSS JOIN range(8) gy),
             |cells AS (SELECT id, gy * 8 + gx AS bit,
             |            (id + ((gy * h) // 8) * w + ((gx * w) // 8)) % 256 AS v
             |          FROM g CROSS JOIN grid),
             |m AS (SELECT id, CAST(SUM(v) AS DOUBLE) / 64 AS mu FROM cells GROUP BY 1),
             |bits AS (SELECT c.id, c.bit, CASE WHEN c.v > m.mu THEN 1 ELSE 0 END AS b
             |         FROM cells c JOIN m USING (id)),
             |hx AS (SELECT id,
             |         CAST(SUM(CASE WHEN bit < 16 THEN b * (1 << (bit % 16)) ELSE 0 END) AS BIGINT) AS b0,
             |         CAST(SUM(CASE WHEN bit >= 16 AND bit < 32 THEN b * (1 << (bit % 16)) ELSE 0 END) AS BIGINT) AS b1,
             |         CAST(SUM(CASE WHEN bit >= 32 AND bit < 48 THEN b * (1 << (bit % 16)) ELSE 0 END) AS BIGINT) AS b2,
             |         CAST(SUM(CASE WHEN bit >= 48 THEN b * (1 << (bit % 16)) ELSE 0 END) AS BIGINT) AS b3
             |       FROM bits GROUP BY 1),
             |bands AS (SELECT id, 0 AS band, b0 AS v FROM hx UNION ALL
             |          SELECT id, 1, b1 FROM hx UNION ALL
             |          SELECT id, 2, b2 FROM hx UNION ALL
             |          SELECT id, 3, b3 FROM hx),
             |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             |         FROM bands a JOIN bands b
             |           ON a.band = b.band AND a.v = b.v AND a.id < b.id),
             |ham AS (SELECT c.id_a, c.id_b,
             |          bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
             |          bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS d
             |        FROM cand c JOIN hx a ON a.id = c.id_a JOIN hx b ON b.id = c.id_b),
             |u AS (SELECT id_a AS media_id, d FROM ham UNION ALL SELECT id_b, d FROM ham)
             |SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_cand,
             |  CAST(SUM(CASE WHEN d <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |  CAST(MIN(d) AS BIGINT) AS nn
             |FROM u GROUP BY 1 ORDER BY media_id""".stripMargin)),

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

    // Hard-negative mining for contrastive training (FaceNet, Schroff et
    // al. 2015): per anchor (vec_id < 20, a training batch), the 5 most
    // cosine-similar DIFFERENT-label rows, the best same-label similarity,
    // and the semi-hard flag (neg still inside the positive radius — the
    // triplet-loss training regime). Anchors broadcast; the corpus streams
    // through one pass feeding both the positive max and the negative
    // top-5; the anchor-keyed window is WindowGroupLimit-capped. At
    // 100 TB the scan swaps for ivfPqTopK candidates, same contract.
    QuerySpec(
      "x109_hard_negatives",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.hardNegatives(emb.filter(col("vec_id") < 20), emb,
            "vec_id", "embedding", "label", k = 5)
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, label, emb, sqrt(list_sum([x*x for x in emb])) AS nrm FROM e),
             |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid, q.label AS ql, c.label AS cl,
             |        round(list_sum([q.emb[i]*c.emb[i] for i in range(1,65)])/(q.nrm*c.nrm), 4) AS sim
             |      FROM n q CROSS JOIN n c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
             |pos AS (SELECT qid, MAX(sim) AS pos_sim FROM p WHERE ql = cl GROUP BY 1),
             |neg AS (SELECT qid, cid, sim,
             |          CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |        FROM p WHERE ql <> cl QUALIFY rn <= 5)
             |SELECT neg.qid, neg.rn, neg.cid, neg.sim AS neg_sim, pos.pos_sim,
             |  CAST(CASE WHEN neg.sim < pos.pos_sim THEN 1 ELSE 0 END AS BIGINT) AS semi_hard
             |FROM neg LEFT JOIN pos ON pos.qid = neg.qid
             |ORDER BY neg.qid, rn""".stripMargin)),

    // Margin-based bitext mining (Artetxe & Schwenk 2019 — the CCMatrix
    // device): en-side docs score against de-side docs by cosine divided
    // by the mean of each member's 4 nearest cross-side similarities;
    // the margin denominator cancels hubness, so a pair wins only by
    // being similar BEYOND its members' background similarity. Output:
    // each en doc's best de match with forward margin ("max" strategy).
    // THIS IS THE 100 TB PLAN: each side's k-NN list comes from the
    // IVF-PQ index (probed-cell candidates, ADC ranking — x57's exact
    // machinery, which the oracle replays below per direction), exact
    // cosines are computed only on the ≤(|X|+|Y|)·k union of the two
    // k-NN lists, and the margin algebra is unchanged from the paper —
    // nothing anywhere is |X|·|Y| (SimilaritySpec cross-checks this form
    // against the brute baseline under a covering probe). Per-side
    // coarse seeds = the 8 lowest doc_ids of the side (bounded
    // TakeOrdered; SQL-replayable); codebook = embeddings rows 0–15 (the
    // x57 device). k-NN sums accumulate round-4 sims as DECIMAL(18,6) —
    // exact, order-free — then one fixed-order division.
    QuerySpec(
      "x110_bitext_margin",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val embFull = Tables.embeddings(s, dir)
        val emb = embFull.withColumnRenamed("vec_id", "doc_id")
        def side(lang: String) =
          docs.filter(col("lang") === lang).select("doc_id").join(emb, "doc_id")
        def low8(d: org.apache.spark.sql.DataFrame): Seq[Long] =
          d.select(col("doc_id").cast("long")).orderBy("doc_id").limit(8)
            .as[Long].collect().toSeq
        val en = side("en")
        val de = side("de")
        val codebook = Similarity
          .seedVectors(embFull, "vec_id", "embedding", (0L to 15L))
          .map(_.map(_.toDouble).toArray).toArray
        Similarity.bitextMarginPairsAnn(en, de, "doc_id", "embedding",
            k = 4, nProbe = 3, srcSeeds = low8(en), tgtSeeds = low8(de),
            m = 8, codebook)
          .orderBy("src_id")
      },
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |xs AS (SELECT d.doc_id AS id, e.emb, sqrt(list_sum([v*v for v in e.emb])) AS nrm
             |      FROM documents d JOIN e ON e.vec_id = d.doc_id WHERE d.lang = 'en'),
             |ys AS (SELECT d.doc_id AS id, e.emb, sqrt(list_sum([v*v for v in e.emb])) AS nrm
             |      FROM documents d JOIN e ON e.vec_id = d.doc_id WHERE d.lang = 'de'),
             |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cemb
             |       FROM e WHERE vec_id BETWEEN 0 AND 15),
             |sub AS (SELECT unnest(range(0, 8)) AS s),
             |dx AS (SELECT x.id, sub.s, cb.c,
             |        list_sum([(x.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(x.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM xs x CROSS JOIN sub CROSS JOIN cb),
             |dy AS (SELECT y.id, sub.s, cb.c,
             |        list_sum([(y.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])*(y.emb[8*sub.s+i]-cb.cemb[8*sub.s+i])
             |                  for i in range(1, 9)]) AS d2
             |      FROM ys y CROSS JOIN sub CROSS JOIN cb),
             |codex AS (SELECT id, s, c FROM (SELECT id, s, c,
             |            row_number() OVER (PARTITION BY id, s ORDER BY d2, c) AS rnk FROM dx) WHERE rnk = 1),
             |codey AS (SELECT id, s, c FROM (SELECT id, s, c,
             |            row_number() OVER (PARTITION BY id, s ORDER BY d2, c) AS rnk FROM dy) WHERE rnk = 1),
             |lutx AS (SELECT id, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM dx),
             |luty AS (SELECT id, s, c, CAST(round(d2, 6) AS DECIMAL(18,6)) AS d2 FROM dy),
             |ivx AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, emb AS cemb
             |        FROM (SELECT id, emb FROM xs ORDER BY id LIMIT 8)),
             |ivy AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, emb AS cemb
             |        FROM (SELECT id, emb FROM ys ORDER BY id LIMIT 8)),
             |dvxx AS (SELECT x.id, ivx.cell,
             |         list_sum([(x.emb[i]-ivx.cemb[i])*(x.emb[i]-ivx.cemb[i]) for i in range(1,65)]) AS d2
             |        FROM xs x CROSS JOIN ivx),
             |dvyy AS (SELECT y.id, ivy.cell,
             |         list_sum([(y.emb[i]-ivy.cemb[i])*(y.emb[i]-ivy.cemb[i]) for i in range(1,65)]) AS d2
             |        FROM ys y CROSS JOIN ivy),
             |dvxy AS (SELECT x.id, ivy.cell,
             |         list_sum([(x.emb[i]-ivy.cemb[i])*(x.emb[i]-ivy.cemb[i]) for i in range(1,65)]) AS d2
             |        FROM xs x CROSS JOIN ivy),
             |dvyx AS (SELECT y.id, ivx.cell,
             |         list_sum([(y.emb[i]-ivx.cemb[i])*(y.emb[i]-ivx.cemb[i]) for i in range(1,65)]) AS d2
             |        FROM ys y CROSS JOIN ivx),
             |assignx AS (SELECT id, cell FROM (SELECT id, cell,
             |              row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rnk FROM dvxx) WHERE rnk = 1),
             |assigny AS (SELECT id, cell FROM (SELECT id, cell,
             |              row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rnk FROM dvyy) WHERE rnk = 1),
             |probexy AS (SELECT id, cell FROM (SELECT id, cell,
             |              row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rnk FROM dvxy) WHERE rnk <= 3),
             |probeyx AS (SELECT id, cell FROM (SELECT id, cell,
             |              row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rnk FROM dvyx) WHERE rnk <= 3),
             |adcf AS (SELECT p.id AS qid, a.id AS cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |         FROM probexy p JOIN assigny a ON p.cell = a.cell AND a.id <> p.id
             |         JOIN codey cc ON cc.id = a.id
             |         JOIN lutx l ON l.id = p.id AND l.s = cc.s AND l.c = cc.c
             |         GROUP BY 1, 2),
             |adcb AS (SELECT p.id AS qid, a.id AS cid, round(CAST(SUM(l.d2) AS DOUBLE), 4) AS adc
             |         FROM probeyx p JOIN assignx a ON p.cell = a.cell AND a.id <> p.id
             |         JOIN codex cc ON cc.id = a.id
             |         JOIN luty l ON l.id = p.id AND l.s = cc.s AND l.c = cc.c
             |         GROUP BY 1, 2),
             |fw AS (SELECT qid AS src_id, cid AS tgt_id FROM (SELECT qid, cid,
             |         row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM adcf) WHERE rn <= 4),
             |bw AS (SELECT cid AS src_id, qid AS tgt_id FROM (SELECT qid, cid,
             |         row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn FROM adcb) WHERE rn <= 4),
             |cand AS (SELECT DISTINCT src_id, tgt_id FROM
             |         (SELECT src_id, tgt_id FROM fw UNION ALL SELECT src_id, tgt_id FROM bw)),
             |sims AS (SELECT c.src_id, c.tgt_id,
             |          round(list_sum([x.emb[i]*y.emb[i] for i in range(1,65)])/(x.nrm*y.nrm), 4) AS sim
             |         FROM cand c JOIN xs x ON x.id = c.src_id JOIN ys y ON y.id = c.tgt_id),
             |kx AS (SELECT f.src_id, CAST(SUM(CAST(s.sim AS DECIMAL(18,6))) AS DOUBLE) AS sx
             |       FROM fw f JOIN sims s ON s.src_id = f.src_id AND s.tgt_id = f.tgt_id GROUP BY 1),
             |ky AS (SELECT b.tgt_id, CAST(SUM(CAST(s.sim AS DECIMAL(18,6))) AS DOUBLE) AS sy
             |       FROM bw b JOIN sims s ON s.src_id = b.src_id AND s.tgt_id = b.tgt_id GROUP BY 1),
             |m AS (SELECT s.src_id, s.tgt_id, s.sim,
             |        round(s.sim / ((kx.sx + ky.sy) / 8.0), 4) AS margin
             |      FROM sims s JOIN kx ON kx.src_id = s.src_id JOIN ky ON ky.tgt_id = s.tgt_id)
             |SELECT src_id, tgt_id, sim, margin
             |FROM (SELECT src_id, tgt_id, sim, margin,
             |        row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rn
             |      FROM m QUALIFY rn = 1)
             |ORDER BY src_id""".stripMargin)),

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

    // k-center coreset by farthest-first traversal (Gonzalez 1985): 6
    // centers over the embeddings, each pass one corpus scan against the
    // single newest center + a top-1 reduce (no pairwise table); the
    // radius sequence is the coverage curve coreset selection reads.
    // d² = na + nb − 2·a·b with ascending-index dots, rounded to 4 before
    // any comparison, ties to the lower id — the oracle replays the
    // traversal step by step in chained CTEs.
    QuerySpec(
      "x113_kcenter_coreset",
      (s, dir) =>
        Similarity.kcenterCoreset(Tables.embeddings(s, dir),
            "vec_id", "embedding", k = 6)
          .orderBy("rank"),
      Some("""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb FROM embeddings),
             |n AS (SELECT vec_id, emb, list_sum([x*x for x in emb]) AS na FROM e),
             |c1 AS (SELECT vec_id, emb, na FROM n ORDER BY vec_id LIMIT 1),
             |d1 AS (SELECT p.vec_id,
             |         round(p.na + c.na - 2*list_sum([p.emb[i]*c.emb[i] for i in range(1,65)]), 4) AS dmin
             |       FROM n p CROSS JOIN c1 c),
             |p2 AS (SELECT vec_id, dmin FROM d1 ORDER BY dmin DESC, vec_id LIMIT 1),
             |c2 AS (SELECT n.vec_id, n.emb, n.na FROM n JOIN p2 ON p2.vec_id = n.vec_id),
             |d2 AS (SELECT d1.vec_id,
             |         least(d1.dmin, round(p.na + c.na - 2*list_sum([p.emb[i]*c.emb[i] for i in range(1,65)]), 4)) AS dmin
             |       FROM d1 JOIN n p ON p.vec_id = d1.vec_id CROSS JOIN c2 c),
             |p3 AS (SELECT vec_id, dmin FROM d2 ORDER BY dmin DESC, vec_id LIMIT 1),
             |c3 AS (SELECT n.vec_id, n.emb, n.na FROM n JOIN p3 ON p3.vec_id = n.vec_id),
             |d3 AS (SELECT d2.vec_id,
             |         least(d2.dmin, round(p.na + c.na - 2*list_sum([p.emb[i]*c.emb[i] for i in range(1,65)]), 4)) AS dmin
             |       FROM d2 JOIN n p ON p.vec_id = d2.vec_id CROSS JOIN c3 c),
             |p4 AS (SELECT vec_id, dmin FROM d3 ORDER BY dmin DESC, vec_id LIMIT 1),
             |c4 AS (SELECT n.vec_id, n.emb, n.na FROM n JOIN p4 ON p4.vec_id = n.vec_id),
             |d4 AS (SELECT d3.vec_id,
             |         least(d3.dmin, round(p.na + c.na - 2*list_sum([p.emb[i]*c.emb[i] for i in range(1,65)]), 4)) AS dmin
             |       FROM d3 JOIN n p ON p.vec_id = d3.vec_id CROSS JOIN c4 c),
             |p5 AS (SELECT vec_id, dmin FROM d4 ORDER BY dmin DESC, vec_id LIMIT 1),
             |c5 AS (SELECT n.vec_id, n.emb, n.na FROM n JOIN p5 ON p5.vec_id = n.vec_id),
             |d5 AS (SELECT d4.vec_id,
             |         least(d4.dmin, round(p.na + c.na - 2*list_sum([p.emb[i]*c.emb[i] for i in range(1,65)]), 4)) AS dmin
             |       FROM d4 JOIN n p ON p.vec_id = d4.vec_id CROSS JOIN c5 c),
             |p6 AS (SELECT vec_id, dmin FROM d5 ORDER BY dmin DESC, vec_id LIMIT 1)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS rank, vec_id, 0.0 AS radius FROM c1
             |  UNION ALL SELECT 2, vec_id, dmin FROM p2
             |  UNION ALL SELECT 3, vec_id, dmin FROM p3
             |  UNION ALL SELECT 4, vec_id, dmin FROM p4
             |  UNION ALL SELECT 5, vec_id, dmin FROM p5
             |  UNION ALL SELECT 6, vec_id, dmin FROM p6
             |) ORDER BY rank""".stripMargin)),

    // Per-item triangle counts + local clustering coefficient over x101's
    // co-occurrence graph, by degree-ordered wedge enumeration (Suri &
    // Vassilvitskii WWW'11 — the "curse of the last reducer" fix): each
    // edge orients low→high (degree, id) rank, wedges enumerate only at
    // their minimum-rank vertex, and one edge-keyed equi-join closes them
    // — a hub's raw degree never becomes one reducer's pair count. The
    // clustering coefficient is the community-structure signal
    // recommendation curation reads off the item graph.
    QuerySpec(
      "x114_triangle_count",
      (s, dir) => {
        val und = itemPairs(s, dir, 3)
          .select(col("ia").as("a"), col("ib").as("b"))
        Graph.triangleStats(und).orderBy("v")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |und AS (SELECT a.item AS a, b.item AS b
             |        FROM ctx a JOIN ctx b ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
             |        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |deg AS (SELECT v, COUNT(*) AS deg
             |        FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
             |e AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b)
             |               THEN und.a ELSE und.b END AS src,
             |        CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b)
             |          THEN und.b ELSE und.a END AS dst,
             |        CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b)
             |          THEN db.deg ELSE da.deg END AS ddeg
             |      FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b),
             |wedge AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
             |          FROM e e1 JOIN e e2 ON e1.src = e2.src
             |            AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))),
             |tri AS (SELECT u, v, w FROM wedge JOIN (SELECT src AS v, dst AS w FROM e) c USING (v, w)),
             |pv AS (SELECT x AS v, COUNT(*) AS n_tri
             |       FROM (SELECT unnest([u, v, w]) AS x FROM tri) GROUP BY 1)
             |SELECT deg.v, CAST(deg.deg AS BIGINT) AS deg,
             |  CAST(coalesce(pv.n_tri, 0) AS BIGINT) AS n_tri,
             |  CASE WHEN deg.deg < 2 THEN 0.0
             |       ELSE round(2.0 * coalesce(pv.n_tri, 0) / (deg.deg * (deg.deg - 1)), 6) END AS clustering
             |FROM deg LEFT JOIN pv ON pv.v = deg.v ORDER BY deg.v""".stripMargin)),

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

    // Label-propagation community detection (Raghavan et al. 2007) over
    // the item co-occurrence graph — the linear-time community miner that
    // complements x101's centrality ranking and x34's connected
    // components (CC merges anything touching; LPA splits a connected
    // graph into cohesive neighborhoods). Synchronous updates, 3 rounds,
    // deterministic tie-break: a node adopts the label with the largest
    // incident edge weight, smallest label on ties. EVERYTHING is integer
    // arithmetic (labels are item ids, weights are co-occurrence counts)
    // so no float can flip the hash. Scale shape: each round is one
    // src-keyed equi-join of slim (src, dst, w) edges against the (v,
    // lab) table plus one (dst, lab) aggregate — cost |edges| per round,
    // never corpus-quadratic; the argmax-per-node is a max(struct) agg
    // (map-side partial, |nodes| groups), not a window.
    QuerySpec(
      "x120_label_propagation",
      (s, dir) => {
        val edges = itemEdges(s, dir, 3)
        Graph.labelPropagation(edges, rounds = 3)
          .select(col("v").as("item"), col("lab").as("community"))
          .orderBy("item")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst, w FROM pc UNION ALL SELECT ib, ia, w FROM pc),
             |lab0 AS (SELECT DISTINCT src AS v, src AS lab FROM e),
             |s1 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab0 l ON l.v = e.src GROUP BY 1, 2),
             |lab1 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s1)
             |  WHERE rn = 1),
             |s2 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab1 l ON l.v = e.src GROUP BY 1, 2),
             |lab2 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s2)
             |  WHERE rn = 1),
             |s3 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab2 l ON l.v = e.src GROUP BY 1, 2),
             |lab3 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s3)
             |  WHERE rn = 1)
             |SELECT v AS item, lab AS community FROM lab3 ORDER BY item""".stripMargin)),

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

    // Top principal component by distributed covariance + power iteration
    // (the PCA workhorse; von Mises & Pollaczek-Geiringer 1929) — the
    // spectral summary x87's per-dim drift means can't give: the
    // DIRECTION of maximum variance in the embedding cloud, plus its
    // eigenvalue. Two-phase, the only shape that survives 100 TB: (1)
    // the corpus reduces to 64² second moments in ONE scan — the outer
    // product expands row-LOCALLY (flatten/transform, no self-join, no
    // shuffle of vector pairs) into slim (i, j, p) rows that map-side-
    // combine into 4096 groups; localCheckpoint pins the tiny C so the
    // iterations never rescan the corpus. (2) Three power iterations run
    // entirely on the 4096-row C: each is a j-keyed equi-join against
    // the 64-row vector + a 64-group aggregate. Determinism: products
    // and squares round to 6 dp and sum as DECIMAL(18,6); the v₀ = e₁
    // start fixes the sign. The oracle replays both phases in SQL
    // (range² expansion + three chained mat-vec/normalize CTEs).
    QuerySpec(
      "x127_pca_power",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select(col("embedding").as("e"))
        val mu = e.select(posexplode(expr(
            """transform(e, (v, i) -> named_struct('i', i + 1,
              |  'v', CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6))))
              |""".stripMargin)))
          .select(col("col.i").as("i"), col("col.v").as("v"))
          .groupBy("i").agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
          .select(col("i"), (col("sv").cast("double") / col("n")).as("mu"))
        // upper triangle only (j >= i, via a per-position tail slice);
        // the mirror below restores full C — round(vi*vj*1e6) is exactly
        // commutative, so mirrored cells equal directly-computed ones
        // (which is also why the oracle can compute all 64² directly)
        val upper = e.select(col("e"), posexplode(col("e")))
          .select((col("pos") + 1).as("i"),
            col("col").cast("double").as("vi"),
            expr("slice(e, pos + 1, 65)").as("tail"))
          .select(col("i"), col("vi"), posexplode(col("tail")))
          .select(col("i"), (col("i") + col("pos")).as("j"),
            round(col("vi") * col("col") * lit(1000000.0), 0)
              .cast("long").as("p"))
          .groupBy("i", "j")
          .agg(sum(col("p")).as("sp"), count(lit(1)).as("n"))
        val sums = upper.unionByName(upper.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("sp"), col("n")))
        val cmat = sums
          .join(broadcast(mu.select(col("i"), col("mu").as("mi"))), "i")
          .join(broadcast(mu.select(col("i").as("j"), col("mu").as("mj"))), "j")
          .select(col("i"), col("j"),
            (col("sp").cast("double") / lit(1000000.0) / col("n") -
              col("mi") * col("mj")).as("c"))
          .localCheckpoint() // 4096 rows; iterations never rescan the corpus
        var v = cmat.select(col("i").as("j")).distinct()
          .select(col("j"),
            when(col("j") === 1, lit(1.0)).otherwise(lit(0.0)).as("vj"))
        var lam: org.apache.spark.sql.DataFrame = null
        for (_ <- 1 to 3) {
          val w = cmat.join(v, "j")
            .groupBy(col("i"))
            .agg(sum(round(col("c") * col("vj"), 6).cast("decimal(18,6)"))
              .as("wd"))
            .select(col("i"), col("wd").cast("double").as("w"))
          lam = w.agg(
            sqrt(sum(round(col("w") * col("w"), 6).cast("decimal(18,6)"))
              .cast("double")).as("nrm"))
          v = w.crossJoin(broadcast(lam))
            .select(col("i").as("j"),
              round(col("w") / col("nrm"), 6).as("vj"))
        }
        v.crossJoin(broadcast(lam))
          .select(col("j").cast("long").as("dim"), col("vj").as("loading"),
            round(col("nrm"), 6).as("eigenvalue"))
          .orderBy("dim")
      },
      Some("""WITH d AS (SELECT CAST(range AS INT) AS i FROM range(1, 65)),
             |mu AS (SELECT d.i,
             |         CAST(SUM(CAST(round(CAST(e.embedding[d.i] AS DOUBLE), 6)
             |           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu
             |       FROM embeddings e CROSS JOIN d GROUP BY d.i),
             |cm AS (SELECT di.i, dj.i AS j,
             |         CAST(SUM(CAST(round(CAST(e.embedding[di.i] AS DOUBLE)
             |             * e.embedding[dj.i] * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
             |           / 1000000.0 / COUNT(*)
             |           - mi.mu * mj.mu AS c
             |       FROM embeddings e CROSS JOIN d di CROSS JOIN d dj
             |         JOIN mu mi ON mi.i = di.i JOIN mu mj ON mj.i = dj.i
             |       GROUP BY di.i, dj.i, mi.mu, mj.mu),
             |v0 AS (SELECT i AS j, CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
             |                          ELSE CAST(0.0 AS DOUBLE) END AS vj FROM d),
             |w1 AS (SELECT cm.i, CAST(SUM(CAST(round(cm.c * v0.vj, 6)
             |         AS DECIMAL(18,6))) AS DOUBLE) AS w
             |       FROM cm JOIN v0 ON v0.j = cm.j GROUP BY cm.i),
             |n1 AS (SELECT sqrt(CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(18,6)))
             |         AS DOUBLE)) AS nrm FROM w1),
             |v1 AS (SELECT w1.i AS j, round(w1.w / n1.nrm, 6) AS vj
             |       FROM w1 CROSS JOIN n1),
             |w2 AS (SELECT cm.i, CAST(SUM(CAST(round(cm.c * v1.vj, 6)
             |         AS DECIMAL(18,6))) AS DOUBLE) AS w
             |       FROM cm JOIN v1 ON v1.j = cm.j GROUP BY cm.i),
             |n2 AS (SELECT sqrt(CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(18,6)))
             |         AS DOUBLE)) AS nrm FROM w2),
             |v2 AS (SELECT w2.i AS j, round(w2.w / n2.nrm, 6) AS vj
             |       FROM w2 CROSS JOIN n2),
             |w3 AS (SELECT cm.i, CAST(SUM(CAST(round(cm.c * v2.vj, 6)
             |         AS DECIMAL(18,6))) AS DOUBLE) AS w
             |       FROM cm JOIN v2 ON v2.j = cm.j GROUP BY cm.i),
             |n3 AS (SELECT sqrt(CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(18,6)))
             |         AS DOUBLE)) AS nrm FROM w3),
             |v3 AS (SELECT w3.i AS j, round(w3.w / n3.nrm, 6) AS vj
             |       FROM w3 CROSS JOIN n3)
             |SELECT CAST(v3.j AS BIGINT) AS dim, v3.vj AS loading,
             |  round(n3.nrm, 6) AS eigenvalue
             |FROM v3 CROSS JOIN n3 ORDER BY dim""".stripMargin)),

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

    // Binary (sign-bit) embedding quantization + Hamming-shortlist ANN
    // (Charikar 2002 hyperplane LSH at its degenerate axis-aligned limit;
    // the "binary quantization" serving trick in modern vector stores):
    // each 64-dim float vector (256 B) compresses to TWO 32-bit sign
    // words (16 B) stored as BIGINTs; candidate search is bit_count(XOR)
    // popcount over the packed codes — 16× less data moves than floats —
    // and only the top-20 Hamming shortlist is reranked with exact
    // cosine. Scale shape: the query side (5 rows) broadcasts, the
    // corpus side streams slim (id, lo, hi) codes, both rank stages are
    // WindowGroupLimit-bounded, and full embeddings attach ONLY to the
    // |queries|·20 shortlist rows.
    QuerySpec(
      "x130_binary_hamming_ann",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val codes = e.select(col("vec_id"), expr(PackLoExpr).as("lo"),
          expr(PackHiExpr).as("hi"))
        val q = codes.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("lo").as("qlo"),
            col("hi").as("qhi"))
        val ham = codes.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("cid"),
            (expr("bit_count(qlo ^ lo) + bit_count(qhi ^ hi)"))
              .cast("long").as("ham"))
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ham"), col("cid"))
        val short = ham.withColumn("hrn", row_number().over(wq))
          .filter(col("hrn") <= 20).drop("hrn")
        val qe = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val ce = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("sim").desc, col("cid"))
        short.join(broadcast(qe), "qid").join(ce, "cid")
          .select(col("qid"), col("cid"), col("ham"), expr(CosineSim4Expr).as("sim"))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .filter(col("rn") <= 5)
          .orderBy("qid", "rn")
      },
      Some(s"""WITH $BinPackOracleCte,
             |h AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |        CAST(bit_count(xor(q.lo, c.lo))
             |           + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS ham
             |      FROM p q JOIN p c ON c.vec_id <> q.vec_id
             |      WHERE q.vec_id < 5),
             |s AS (SELECT qid, cid, ham,
             |        row_number() OVER (PARTITION BY qid ORDER BY ham, cid) AS hrn
             |      FROM h QUALIFY hrn <= 20),
             |$EmbNormOracleCte,
             |f AS (SELECT s.qid, s.cid, s.ham, q.nrm AS qn, c.nrm AS cn,
             |        unnest(q.emb) AS qv, unnest(c.emb) AS cv
             |      FROM s JOIN n q ON q.vec_id = s.qid
             |        JOIN n c ON c.vec_id = s.cid),
             |d AS (SELECT qid, cid, any_value(ham) AS ham,
             |        round(sum(qv * cv) / (any_value(qn) * any_value(cn)), 4)
             |          AS sim
             |      FROM f GROUP BY qid, cid)
             |SELECT qid, cid, ham, sim,
             |  CAST(row_number() OVER (PARTITION BY qid
             |    ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM d QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin)),

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

    // Mann-Whitney U / Wilcoxon rank-sum test (Mann & Whitney 1947) with
    // tie correction between the A/B variants' per-user purchase counts —
    // the nonparametric companion to x133's Welch t (heavy-tailed user
    // metrics break the t-test's moment assumptions; ranks don't care).
    // The whole rank computation stays INTEGER-exact: average ranks ride
    // as 2·rank (ca·(2·cum_before + cnt + 1) — no .5 floats), so the
    // rank-sum, U, and the tie term Σ(t³−t) are BIGINTs in any add
    // order; only the final 1-row z arithmetic is floating. Windows run
    // over the |distinct y| aggregate — Rule-1-safe bounded input.
    QuerySpec(
      "x135_mann_whitney",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
          .select((col("user_id") % 2).as("variant"), col("y"))
        val grid = u.groupBy(col("y"))
          .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("cb"))
          .withColumn("cnt", col("ca") + col("cb"))
        val wc = W.orderBy("y").rowsBetween(W.unboundedPreceding, -1)
        val ranked = grid.withColumn("cumprev",
          coalesce(sum(col("cnt")).over(wc), lit(0L)))
        val m = ranked.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("ca") * (lit(2L) * col("cumprev") + col("cnt") + 1L))
            .as("r2a"),
          sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
        m.select(col("na"), col("nb"),
            ((col("r2a") - col("na") * (col("na") + 1L)).cast("double") / 2.0)
              .as("u_a"),
            (col("na") * col("nb") / lit(2.0)).as("mu_u"),
            (col("na").cast("double") * col("nb") / 12.0 *
              ((col("na") + col("nb") + 1L) -
                col("ties").cast("double") /
                  ((col("na") + col("nb")).cast("double") *
                    (col("na") + col("nb") - 1L)))).as("var_u"))
          .select(col("na"), col("nb"), round(col("u_a"), 6).as("u_a"),
            round((col("u_a") - col("mu_u")) / sqrt(col("var_u")), 6)
              .as("z"),
            (abs((col("u_a") - col("mu_u")) / sqrt(col("var_u"))) > 1.96)
              .cast("long").as("reject_05"))
          .orderBy("na")
      },
      Some("""WITH u AS (SELECT user_id % 2 AS variant,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |          AS y
             |      FROM events GROUP BY user_id),
             |grid AS (SELECT y,
             |           SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS ca,
             |           SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS cb,
             |           COUNT(*) AS cnt0
             |         FROM u GROUP BY 1),
             |g2 AS (SELECT y, ca, cb, ca + cb AS cnt,
             |         COALESCE(SUM(ca + cb) OVER (ORDER BY y
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |           AS cumprev
             |       FROM grid),
             |m AS (SELECT SUM(ca) AS na, SUM(cb) AS nb,
             |        SUM(ca * (2 * cumprev + cnt + 1)) AS r2a,
             |        SUM(cnt * cnt * cnt - cnt) AS ties
             |      FROM g2),
             |v AS (SELECT na, nb,
             |        CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 AS u_a,
             |        na * nb / 2.0 AS mu_u,
             |        CAST(na AS DOUBLE) * nb / 12.0 *
             |          ((na + nb + 1) - CAST(ties AS DOUBLE) /
             |            (CAST(na + nb AS DOUBLE) * (na + nb - 1))) AS var_u
             |      FROM m)
             |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             |  round(u_a, 6) AS u_a,
             |  round((u_a - mu_u) / sqrt(var_u), 6) AS z,
             |  CAST(CASE WHEN abs((u_a - mu_u) / sqrt(var_u)) > 1.96
             |       THEN 1 ELSE 0 END AS BIGINT) AS reject_05
             |FROM v ORDER BY na""".stripMargin)),

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

    // k-hop BFS reachability (the frontier-expansion primitive under
    // Pregel/GraphX and every distributed shortest-path) from the
    // highest-degree item over x101's co-occurrence graph: per hop,
    // frontier ⋈ edges on src (slim equi-join), dedup, anti-join the
    // visited set — the textbook BFS round, each hop one join + one
    // distinct, cost |frontier edges|, never corpus-quadratic. Three
    // bounded hops with localCheckpoint between rounds (the x34 star
    // discipline: cut lineage so hop h doesn't replay hops 1..h−1).
    // Output is the per-hop expansion profile (count + item-id checksum,
    // all integer-exact); the oracle unrolls the same three hops.
    QuerySpec(
      "x139_khop_reach",
      (s, dir) => {
        val edges = itemEdges(s, dir, 3).select("src", "dst")
          .localCheckpoint()
        // filter the phantom NULL row an agg-on-empty produces, so an
        // empty graph yields an EMPTY seed (matching the oracle's
        // LIMIT 1 over zero rows), and coalesce hop 0's sum like hops 1-3
        val seed = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          .agg(max(struct(col("deg"), (-col("src")).as("ns"))).as("m"))
          .filter(col("m.ns").isNotNull)
          .select((-col("m.ns")).as("v"))
          .localCheckpoint()
        var visited = seed
        var frontier = seed
        val rows = Seq.newBuilder[org.apache.spark.sql.DataFrame]
        rows += seed.agg(lit(0L).as("hop"), count(lit(1)).as("n_new"),
          coalesce(sum(col("v")), lit(0L)).cast("long").as("sum_items"))
        for (h <- 1 to 3) {
          frontier = edges.join(frontier.select(col("v").as("src")), "src")
            .select(col("dst").as("v")).distinct()
            .join(visited, Seq("v"), "left_anti")
            .localCheckpoint()
          visited = visited.unionByName(frontier).localCheckpoint()
          rows += frontier.agg(lit(h.toLong).as("hop"),
            count(lit(1)).as("n_new"),
            coalesce(sum(col("v")), lit(0L)).cast("long").as("sum_items"))
        }
        rows.result().reduce(_ unionByName _).orderBy("hop")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |         AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst FROM pc
             |      UNION ALL SELECT ib, ia FROM pc),
             |seed AS (SELECT src AS v FROM (
             |    SELECT src, COUNT(*) AS deg FROM e GROUP BY 1)
             |  ORDER BY deg DESC, src LIMIT 1),
             |h1 AS (SELECT DISTINCT e.dst AS v FROM e JOIN seed s ON e.src = s.v
             |       WHERE e.dst NOT IN (SELECT v FROM seed)),
             |h2 AS (SELECT DISTINCT e.dst AS v FROM e JOIN h1 ON e.src = h1.v
             |       WHERE e.dst NOT IN (SELECT v FROM seed
             |                           UNION ALL SELECT v FROM h1)),
             |h3 AS (SELECT DISTINCT e.dst AS v FROM e JOIN h2 ON e.src = h2.v
             |       WHERE e.dst NOT IN (SELECT v FROM seed
             |                           UNION ALL SELECT v FROM h1
             |                           UNION ALL SELECT v FROM h2))
             |SELECT * FROM (
             |  SELECT CAST(0 AS BIGINT) AS hop, CAST(COUNT(*) AS BIGINT) AS n_new,
             |    CAST(COALESCE(SUM(v), 0) AS BIGINT) AS sum_items FROM seed
             |  UNION ALL
             |  SELECT 1, COUNT(*), CAST(COALESCE(SUM(v), 0) AS BIGINT) FROM h1
             |  UNION ALL
             |  SELECT 2, COUNT(*), CAST(COALESCE(SUM(v), 0) AS BIGINT) FROM h2
             |  UNION ALL
             |  SELECT 3, COUNT(*), CAST(COALESCE(SUM(v), 0) AS BIGINT) FROM h3)
             |ORDER BY hop""".stripMargin)),

    // k-core peeling (Seidman 1983; the distributed peel is Montresor,
    // De Pellegrini & Miorandi 2013) toward the 3-core of the item
    // co-occurrence graph: each round drops every node of degree < 3 and
    // the edges touching it — the graph-cleaning step that strips
    // tendrils before community/centrality work (x101, x114, x120).
    // Four unrolled rounds emit the peel profile (nodes-with-an-edge,
    // undirected edge count per round) — all integer-exact. Each round
    // is one degree aggregate + two slim semi-joins, cost |edges|, with
    // localCheckpoint cutting lineage between rounds (the x34 star
    // discipline); nothing corpus-quadratic, no global windows.
    QuerySpec(
      "x140_kcore",
      (s, dir) => {
        var cur = itemEdges(s, dir, 2).select("src", "dst")
          .localCheckpoint()
        val prof = Seq.newBuilder[org.apache.spark.sql.DataFrame]
        prof += cur.agg(lit(0L).as("round"),
          countDistinct(col("src")).as("n_nodes"),
          (count(lit(1)) / 2).cast("long").as("n_edges"))
        for (r <- 1 to 4) {
          val keep = cur.groupBy("src").agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= 3).select(col("src").as("v"))
            .localCheckpoint()
          cur = cur
            .join(keep.select(col("v").as("src")), Seq("src"), "left_semi")
            .join(keep.select(col("v").as("dst")), Seq("dst"), "left_semi")
            .select("src", "dst").localCheckpoint()
          prof += cur.agg(lit(r.toLong).as("round"),
            countDistinct(col("src")).as("n_nodes"),
            (count(lit(1)) / 2).cast("long").as("n_edges"))
        }
        prof.result().reduce(_ unionByName _).orderBy("round")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |         AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |e0 AS (SELECT ia AS src, ib AS dst FROM pc
             |       UNION ALL SELECT ib, ia FROM pc),
             |k1 AS (SELECT src AS v FROM e0 GROUP BY 1 HAVING COUNT(*) >= 3),
             |e1 AS (SELECT e.src, e.dst FROM e0 e
             |       JOIN k1 a ON e.src = a.v JOIN k1 b ON e.dst = b.v),
             |k2 AS (SELECT src AS v FROM e1 GROUP BY 1 HAVING COUNT(*) >= 3),
             |e2 AS (SELECT e.src, e.dst FROM e1 e
             |       JOIN k2 a ON e.src = a.v JOIN k2 b ON e.dst = b.v),
             |k3 AS (SELECT src AS v FROM e2 GROUP BY 1 HAVING COUNT(*) >= 3),
             |e3 AS (SELECT e.src, e.dst FROM e2 e
             |       JOIN k3 a ON e.src = a.v JOIN k3 b ON e.dst = b.v),
             |k4 AS (SELECT src AS v FROM e3 GROUP BY 1 HAVING COUNT(*) >= 3),
             |e4 AS (SELECT e.src, e.dst FROM e3 e
             |       JOIN k4 a ON e.src = a.v JOIN k4 b ON e.dst = b.v)
             |SELECT * FROM (
             |  SELECT CAST(0 AS BIGINT) AS round,
             |    CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
             |    CAST(COUNT(*) / 2 AS BIGINT) AS n_edges FROM e0
             |  UNION ALL SELECT 1, COUNT(DISTINCT src),
             |    CAST(COUNT(*) / 2 AS BIGINT) FROM e1
             |  UNION ALL SELECT 2, COUNT(DISTINCT src),
             |    CAST(COUNT(*) / 2 AS BIGINT) FROM e2
             |  UNION ALL SELECT 3, COUNT(DISTINCT src),
             |    CAST(COUNT(*) / 2 AS BIGINT) FROM e3
             |  UNION ALL SELECT 4, COUNT(DISTINCT src),
             |    CAST(COUNT(*) / 2 AS BIGINT) FROM e4)
             |ORDER BY round""".stripMargin)),

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

    // Deterministic weighted random walks (DeepWalk, Perozzi et al.
    // 2014 / node2vec's data-generation stage): 2 walks of 3 steps from
    // every node of the item co-occurrence graph, next hop drawn ∝ edge
    // weight. The draw device makes this distributed AND replayable:
    // per-node neighbor lists carry cumulative weights (src-partitioned
    // window, bounded per node), and "sample ∝ w" becomes an INTERVAL-
    // CONTAINMENT equi-join — target = md5₄₈(v0, r, step) mod W(cur),
    // pick the one neighbor whose (cum−w, cum] interval contains it. No
    // per-row loops, no broadcast folds: each step is one slim equi-join
    // on the current frontier (|nodes|·R rows), exactly how a 100 TB
    // walk corpus is generated. The oracle replays every hop with the
    // same hash arithmetic.
    QuerySpec(
      "x155_random_walks",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val nbr = itemEdges(s, dir, 3)
          .withColumn("cum", sum(col("w")).over(
            W.partitionBy("src").orderBy("dst")
              .rowsBetween(W.unboundedPreceding, 0)))
          .localCheckpoint()
        val wt = nbr.groupBy("src").agg(max(col("cum")).as("wtot"))
        var cur = nbr.select(col("src").as("v0")).distinct()
          .crossJoin(broadcast(s.range(0, 2).select(col("id").as("r"))))
          .select(col("v0"), col("r"), col("v0").as("cur"),
            col("v0").cast("string").as("path"))
        for (t <- 1 to 3) {
          cur = cur
            .join(wt.select(col("src").as("cur"), col("wtot")), "cur")
            .withColumn("target", pmod(conv(substring(md5(concat(
                lit("graft-walk-42:"), col("v0").cast("string"), lit(":"),
                col("r").cast("string"), lit(":"), lit(t).cast("string"))),
              1, 12), 16, 10).cast("long"), col("wtot")))
            .join(nbr.select(col("src").as("cur"), col("dst"), col("w"),
              col("cum")), "cur")
            .filter(col("target") >= col("cum") - col("w") &&
              col("target") < col("cum"))
            .select(col("v0"), col("r"), col("dst").as("cur"),
              concat(col("path"), lit(">"), col("dst").cast("string"))
                .as("path"))
        }
        cur.select(col("v0"), col("r"), col("cur").as("v_end"), col("path"))
          .orderBy("v0", "r")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |         AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst, w FROM pc
             |      UNION ALL SELECT ib, ia, w FROM pc),
             |nbr AS (SELECT src, dst, w,
             |          SUM(w) OVER (PARTITION BY src ORDER BY dst
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |            AS cum
             |        FROM e),
             |wt AS (SELECT src, MAX(cum) AS wtot FROM nbr GROUP BY 1),
             |w0 AS (SELECT DISTINCT nbr.src AS v0, t.r
             |       FROM nbr CROSS JOIN range(0, 2) t(r)),
             |s1 AS (SELECT w0.v0, w0.r, nb.dst AS cur
             |       FROM w0 JOIN wt ON wt.src = w0.v0
             |       JOIN nbr nb ON nb.src = w0.v0
             |       WHERE CAST(('0x' || substr(md5('graft-walk-42:' ||
             |           CAST(w0.v0 AS VARCHAR) || ':' || CAST(w0.r AS VARCHAR)
             |           || ':1'), 1, 12)) AS BIGINT) % wt.wtot
             |         BETWEEN nb.cum - nb.w AND nb.cum - 1),
             |s2 AS (SELECT s1.v0, s1.r, s1.cur AS v1, nb.dst AS cur
             |       FROM s1 JOIN wt ON wt.src = s1.cur
             |       JOIN nbr nb ON nb.src = s1.cur
             |       WHERE CAST(('0x' || substr(md5('graft-walk-42:' ||
             |           CAST(s1.v0 AS VARCHAR) || ':' || CAST(s1.r AS VARCHAR)
             |           || ':2'), 1, 12)) AS BIGINT) % wt.wtot
             |         BETWEEN nb.cum - nb.w AND nb.cum - 1),
             |s3 AS (SELECT s2.v0, s2.r, s2.v1, s2.cur AS v2, nb.dst AS cur
             |       FROM s2 JOIN wt ON wt.src = s2.cur
             |       JOIN nbr nb ON nb.src = s2.cur
             |       WHERE CAST(('0x' || substr(md5('graft-walk-42:' ||
             |           CAST(s2.v0 AS VARCHAR) || ':' || CAST(s2.r AS VARCHAR)
             |           || ':3'), 1, 12)) AS BIGINT) % wt.wtot
             |         BETWEEN nb.cum - nb.w AND nb.cum - 1)
             |SELECT v0, CAST(r AS BIGINT) AS r, cur AS v_end,
             |  CAST(v0 AS VARCHAR) || '>' || CAST(v1 AS VARCHAR) || '>' ||
             |    CAST(v2 AS VARCHAR) || '>' || CAST(cur AS VARCHAR) AS path
             |FROM s3 ORDER BY v0, r""".stripMargin)),

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

    // TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) — the
    // unsupervised corpus-keyword read: words (length >= 4, the classic
    // content-word heuristic in lieu of POS tags) co-occurring within a
    // 2-token window form a weighted undirected graph; 3 damped PageRank
    // iterations (the x101 kernel, same DECIMAL-bridged contribution
    // sums) rank them; top-20 out. Scale shape: the window join is EQUI
    // on (doc, position+offset) — per-doc bounded, never cross-doc — the
    // graph collapses to |vocab pairs| counts before any iteration, and
    // each iteration is one edge equi-join + map-side-combined aggregate
    // over the |vocab| node set; top-20 is a TakeOrdered.
    QuerySpec(
      "x160_textrank_keywords",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("p", "wd")))
          .filter(length(col("wd")) >= 4)
        val offs = tok.select(col("doc_id"), col("p"), col("wd"),
          explode(array(lit(1), lit(2))).as("off"))
        val pairs = offs.alias("a").join(tok.alias("b"),
            col("a.doc_id") === col("b.doc_id") &&
            col("b.p") === col("a.p") + col("a.off") &&
            col("a.wd") =!= col("b.wd"))
          .select(least(col("a.wd"), col("b.wd")).as("wa"),
            greatest(col("a.wd"), col("b.wd")).as("wb"))
        val pc = pairs.groupBy("wa", "wb").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
        val edges = pc.select(col("wa").as("src"), col("wb").as("dst"), col("w"))
          .union(pc.select(col("wb").as("src"), col("wa").as("dst"), col("w")))
          .localCheckpoint() // consumed by wout, nodes, and 3 iterations
        val wout = edges.groupBy("src").agg(sum(col("w")).as("wout"))
        val e2 = edges.join(wout, "src")
        val nodes = edges.select(col("src").as("v")).distinct()
        val nN = nodes.agg(count(lit(1)).as("n"))
        var pr = nodes.crossJoin(broadcast(nN))
          .select(col("v"), round(lit(1.0) / col("n"), 6).as("pr"))
        for (_ <- 1 to 3) {
          pr = e2.join(pr.select(col("v").as("src"), col("pr")), "src")
            .select(col("dst").as("v"),
              round(col("pr") * col("w") / col("wout"), 6)
                .cast("decimal(18,6)").as("c"))
            .groupBy("v")
            .agg(sum(col("c")).as("csum"))
            .crossJoin(broadcast(nN))
            .select(col("v"),
              round(lit(0.15) / col("n") +
                lit(0.85) * col("csum").cast("double"), 6).as("pr"))
        }
        pr.select(col("v").as("word"), col("pr"))
          .orderBy(col("pr").desc, col("word"))
          .limit(20)
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS wd, generate_subscripts(toks, 1) AS p FROM t),
             |tk AS (SELECT doc_id, wd, p FROM tok WHERE length(wd) >= 4),
             |pp AS (SELECT least(a.wd, b.wd) AS wa, greatest(a.wd, b.wd) AS wb
             |       FROM tk a JOIN tk b ON a.doc_id = b.doc_id
             |         AND (b.p - a.p) IN (1, 2) AND a.wd <> b.wd),
             |pc AS (SELECT wa, wb, COUNT(*) AS w FROM pp GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |e AS (SELECT wa AS src, wb AS dst, w FROM pc UNION ALL SELECT wb, wa, w FROM pc),
             |wo AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
             |e2 AS (SELECT e.src, e.dst, e.w, wo.wout FROM e JOIN wo USING (src)),
             |nodes AS (SELECT DISTINCT src AS v FROM e),
             |nn AS (SELECT COUNT(*) AS n FROM nodes),
             |pr0 AS (SELECT v, round(CAST(1.0 AS DOUBLE) / nn.n, 6) AS pr FROM nodes CROSS JOIN nn),
             |pr1 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr0 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n),
             |pr2 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr1 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n),
             |pr3 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr2 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n)
             |SELECT v AS word, pr FROM pr3 ORDER BY pr DESC, word LIMIT 20""".stripMargin)),

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
        val o = Tables.orders(s, dir)
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
        val clean = docs.filter(
          TextFunctions.qualityScore(col("text"), STOPWORDS) >= 0.9999)
        val deduped = Dedup.dedupCorpus(clean, "doc_id", "text",
          threshold = 0.8)
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

    // Hash-min connected components (the canonical Pregel/BSP
    // label-propagation-to-fixpoint primitive — Kang et al.'s HCC in
    // PEGASUS, ICDM 2009): every node repeatedly adopts the MINIMUM id
    // in its closed neighborhood; 3 unrolled rounds over the item
    // co-occurrence graph plus a convergence probe (did round 3 change
    // anything). Distinct from x120 (LPA picks the most FREQUENT label
    // — community structure) and x31/x34 (star-contraction on dup
    // PAIRS): this is the generic reachability partition. Per round:
    // one |edges| equi-join + one min-aggregate, map-side combined,
    // lineage checkpointed — the x34/x139 iteration discipline. Output
    // = per-component size histogram + convergence flag, all integers.
    QuerySpec(
      "x170_hashmin_cc",
      (s, dir) => {
        val edges = itemEdges(s, dir, 3).localCheckpoint()
        val nodes = edges.select(col("src").as("v")).distinct()
        var lab = nodes.select(col("v"), col("v").as("lab"))
        var prev: org.apache.spark.sql.DataFrame = null
        (1 to 3).foreach { _ =>
          prev = lab
          lab = edges.join(lab.select(col("v").as("src"), col("lab")), "src")
            .select(col("dst").as("v"), col("lab"))
            .union(lab) // closed neighborhood: keep own label too
            .groupBy("v").agg(min(col("lab")).as("lab"))
            .localCheckpoint()
        }
        val changed = lab.as("a")
          .join(prev.as("b"), col("a.v") === col("b.v"))
          .filter(col("a.lab") =!= col("b.lab"))
          .agg(count(lit(1)).as("n_changed_round3"))
        lab.groupBy("lab").agg(count(lit(1)).as("size"))
          .groupBy("size").agg(count(lit(1)).as("n_components"),
            min(col("lab")).cast("long").as("min_root"))
          .crossJoin(broadcast(changed))
          .select(col("size"), col("n_components"), col("min_root"),
            col("n_changed_round3"))
          .orderBy("size")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |         AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst FROM pc
             |      UNION ALL SELECT ib, ia FROM pc),
             |n AS (SELECT DISTINCT src AS v FROM e),
             |l0 AS (SELECT v, v AS lab FROM n),
             |l1 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT e.dst AS v, l.lab FROM e JOIN l0 l ON l.v = e.src
             |        UNION ALL SELECT v, lab FROM l0) GROUP BY 1),
             |l2 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT e.dst AS v, l.lab FROM e JOIN l1 l ON l.v = e.src
             |        UNION ALL SELECT v, lab FROM l1) GROUP BY 1),
             |l3 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT e.dst AS v, l.lab FROM e JOIN l2 l ON l.v = e.src
             |        UNION ALL SELECT v, lab FROM l2) GROUP BY 1),
             |ch AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_changed_round3
             |       FROM l3 JOIN l2 ON l2.v = l3.v AND l2.lab <> l3.lab),
             |cs AS (SELECT lab, COUNT(*) AS size FROM l3 GROUP BY 1)
             |SELECT CAST(size AS BIGINT) AS size,
             |  CAST(COUNT(*) AS BIGINT) AS n_components,
             |  CAST(MIN(lab) AS BIGINT) AS min_root, ch.n_changed_round3
             |FROM cs CROSS JOIN ch GROUP BY size, ch.n_changed_round3
             |ORDER BY size""".stripMargin)),

    // Inter-arrival burstiness (Goh & Barabási, EPL 2008): per user, the
    // event-gap statistic B = (σ−μ)/(σ+μ) — −1 metronome-periodic (bot
    // cadence), 0 Poisson, →1 human-bursty — the behavioral-forensics
    // read that complements x82's integrity audit and x81's key skew
    // with WHO, not just how much. Gaps are exact integer SECONDS
    // (micros div 1e6 — squared micro-gaps would overflow int64 on
    // multi-day gaps) from a per-user lag window (bounded per user);
    // μ/σ from the
    // n·Σx²−(Σx)² integer-moment identity so B is one fixed-order
    // double expression, bit-identical per engine, and the 0.1-wide
    // histogram bins on that identical double (floor can't diverge).
    // Output is the bounded |bins| distribution + a NULL-bin row
    // counting EVERY user without a B (single-event users — who never
    // produce a lag row — and all-same-second users whose μ = σ = 0
    // would make B = 0/0) against the full event user set — nothing
    // per-user leaves the aggregate, nothing excluded silently.
    QuerySpec(
      "x171_burstiness",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("sec", expr("unix_micros(ts) div 1000000"))
          .withColumn("gap", col("sec") - lag(col("sec"), 1).over(W))
          .filter(col("gap").isNotNull)
        val mom = gaps.groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum(col("gap")).as("sg"),
            sum(col("gap") * col("gap")).as("sgg"))
        // B needs >= 2 gaps AND a nonzero gap sum (sg = 0 means every
        // event landed in one wall-clock second: μ = σ = 0 and B is
        // 0/0). Excluded users are counted against the FULL event user
        // set — incl. single-event users who never produce a lag row —
        // so the NULL-bin row truly is "everyone without a B".
        val b = mom.filter(col("n") >= 2 && col("sg") > 0)
          .select(col("user_id"),
            ((sqrt((col("n").cast("double") * col("sgg") -
                col("sg").cast("double") * col("sg")) /
                (col("n").cast("double") * col("n"))) -
              col("sg").cast("double") / col("n")) /
             (sqrt((col("n").cast("double") * col("sgg") -
                col("sg").cast("double") * col("sg")) /
                (col("n").cast("double") * col("n"))) +
              col("sg").cast("double") / col("n"))).as("bness"))
        val allUsers = Tables.events(s, dir).select("user_id").distinct()
          .agg(count(lit(1)).as("n_all"))
        val excluded = b.agg(count(lit(1)).as("n_b"))
          .crossJoin(broadcast(allUsers))
          .select(lit(null).cast("long").as("bin"),
            (col("n_all") - col("n_b")).as("n_users"),
            lit(null).cast("double").as("mean_b"))
        b.groupBy(floor(col("bness") * 10).as("bin"))
          .agg(count(lit(1)).as("n_users"),
            round(sum(round(col("bness"), 6).cast("decimal(18,6)"))
              .cast("double") / count(lit(1)), 6).as("mean_b"))
          .union(excluded)
          .orderBy(col("bin").asc_nulls_last)
      },
      Some("""WITH g AS (SELECT user_id,
             |        epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000) OVER
             |          (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |      FROM events),
             |m AS (SELECT user_id, COUNT(*) AS n, SUM(gap) AS sg,
             |        SUM(gap * gap) AS sgg
             |      FROM g WHERE gap IS NOT NULL GROUP BY 1),
             |b AS (SELECT user_id,
             |        (sqrt((CAST(n AS DOUBLE) * sgg - CAST(sg AS DOUBLE) * sg)
             |           / (CAST(n AS DOUBLE) * n)) - CAST(sg AS DOUBLE) / n) /
             |        (sqrt((CAST(n AS DOUBLE) * sgg - CAST(sg AS DOUBLE) * sg)
             |           / (CAST(n AS DOUBLE) * n)) + CAST(sg AS DOUBLE) / n)
             |          AS bness
             |      FROM m WHERE n >= 2 AND sg > 0),
             |h AS (SELECT CAST(floor(bness * 10) AS BIGINT) AS bin,
             |        COUNT(*) AS n_users,
             |        round(CAST(SUM(CAST(round(bness, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) / COUNT(*), 6) AS mean_b
             |      FROM b GROUP BY 1),
             |t AS (SELECT CAST(NULL AS BIGINT) AS bin,
             |        CAST((SELECT COUNT(DISTINCT user_id) FROM events)
             |          - (SELECT COUNT(*) FROM b) AS BIGINT) AS n_users,
             |        CAST(NULL AS DOUBLE) AS mean_b)
             |SELECT bin, CAST(n_users AS BIGINT) AS n_users, mean_b FROM h
             |UNION ALL SELECT bin, n_users, mean_b FROM t
             |ORDER BY bin NULLS LAST""".stripMargin)),

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

    // Good-Turing frequency-of-frequencies (Good 1953; Gale & Sampson's
    // simple GT): the vocabulary histogram "how many words occur r
    // times" plus the unseen-mass estimate P₀ = N₁/N — the quantity
    // behind smoothing decisions, OOV-rate forecasts, and "is the
    // corpus big enough" reads (complements x90's coverage curve and
    // x77's novelty curve with the CLASSIC estimator). Per r: n_types,
    // the adjusted Good-Turing count r* = (r+1)·N_{r+1}/N_r where the
    // next bucket exists (integer inputs, one division, round 6). Two
    // bounded aggregates — token counts then count-of-counts (the
    // freq-of-freq table is tiny: max r buckets) — and a 1-row total.
    QuerySpec(
      "x173_good_turing",
      (s, dir) => {
        val wc = Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("r"))
        val fof = wc.groupBy("r").agg(count(lit(1)).as("n_types"))
          .localCheckpoint() // consumed by the self-join and the total
        val tot = fof.agg(sum(col("r") * col("n_types")).as("nn"),
          sum(when(col("r") === 1, col("n_types")).otherwise(0L)).as("n1"))
        val nxt = fof.select((col("r") - 1).as("r"),
          col("n_types").as("n_types_next"))
        fof.join(nxt, Seq("r"), "left_outer")
          .crossJoin(broadcast(tot))
          .select(col("r"), col("n_types"),
            when(col("n_types_next").isNotNull,
              round((col("r") + 1).cast("double") * col("n_types_next") /
                col("n_types"), 6))
              .otherwise(lit(null).cast("double")).as("r_star"),
            round(col("n1").cast("double") / col("nn"), 6).as("p_unseen"))
          .orderBy("r")
      },
      Some("""WITH t AS (SELECT unnest(list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
             |        AS w
             |      FROM documents),
             |wc AS (SELECT w, COUNT(*) AS r FROM t GROUP BY 1),
             |fof AS (SELECT r, COUNT(*) AS n_types FROM wc GROUP BY 1),
             |tot AS (SELECT SUM(r * n_types) AS nn,
             |         SUM(CASE WHEN r = 1 THEN n_types ELSE 0 END) AS n1
             |       FROM fof)
             |SELECT CAST(f.r AS BIGINT) AS r,
             |  CAST(f.n_types AS BIGINT) AS n_types,
             |  CASE WHEN nx.n_types IS NOT NULL
             |       THEN round((f.r + 1) * CAST(nx.n_types AS DOUBLE) /
             |            f.n_types, 6)
             |       ELSE NULL END AS r_star,
             |  round(CAST(tot.n1 AS DOUBLE) / tot.nn, 6) AS p_unseen
             |FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1
             |CROSS JOIN tot ORDER BY r""".stripMargin)),

    // Zipf rank-frequency fit (Zipf 1949; the log-log least-squares
    // diagnostic): slope ≈ −1 is the natural-language signature — a
    // corpus whose token distribution fits much flatter (scraped
    // boilerplate) or steeper (template spam) fails the sanity gate
    // before training. Word ranks come from the `countBelow` bucket
    // device over NEGATED counts (descending rank without a vocab-scale
    // single-partition window) + a within-count-group window (bounded
    // per distinct count); the OLS slope/intercept over (ln rank,
    // ln freq) sums 6-dp-rounded terms through the DECIMAL bridge (the
    // x85 ln discipline), so both engines reduce identical decimals.
    // Scale: one token shuffle, one |vocab| rank join, one 1-row fit.
    QuerySpec(
      "x174_zipf_fit",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val wc = Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("r"))
          .withColumn("nr", -col("r"))
          .localCheckpoint() // consumed by the grid and the rank join
        val cb = countBelow(wc.groupBy("nr").agg(count(lit(1)).as("c")), "nr")
        val wi = W.partitionBy("nr").orderBy("w")
        val ranked = wc
          .withColumn("ri", row_number().over(wi).cast("long"))
          .join(cb.select(col("nr"), col("below")), "nr")
          .select(col("w"), col("r"), (col("below") + col("ri")).as("rank"))
        val terms = ranked.select(
          round(log(col("rank").cast("double")), 6).as("x"),
          round(log(col("r").cast("double")), 6).as("y"))
        val m = terms.agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
          sum(round(col("x") * col("y"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxy"),
          sum(round(col("x") * col("x"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxx"))
        m.select(col("n").as("n_types"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6)
              .as("zipf_slope"),
            round((col("sy") - ((col("n") * col("sxy") -
                col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
              col("n"), 6).as("intercept"))
          .orderBy("n_types")
      },
      Some("""WITH t AS (SELECT unnest(list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
             |        AS w
             |      FROM documents),
             |wc AS (SELECT w, COUNT(*) AS r FROM t GROUP BY 1),
             |rk AS (SELECT w, r,
             |        CAST(row_number() OVER (ORDER BY r DESC, w) AS BIGINT)
             |          AS rank
             |      FROM wc),
             |tm AS (SELECT round(ln(CAST(rank AS DOUBLE)), 6) AS x,
             |        round(ln(CAST(r AS DOUBLE)), 6) AS y
             |      FROM rk),
             |m AS (SELECT COUNT(*) AS n,
             |        CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxy,
             |        CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxx
             |      FROM tm)
             |SELECT CAST(n AS BIGINT) AS n_types,
             |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             |    AS zipf_slope,
             |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             |    / n, 6) AS intercept
             |FROM m ORDER BY n_types""".stripMargin)),

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

    // KNN-Shapley data valuation (Jia et al., PVLDB 12(11), 2019,
    // Theorem 1): the exact Shapley value of each training point for a
    // K-NN classifier, in closed form — sort train points by similarity
    // to a probe, then s(α_N) = 1[y_N=y]/N and
    // s(α_i) = s(α_{i+1}) + (1[y_i=y] − 1[y_{i+1}=y])/K · min(K,i)/i —
    // i.e. a SUFFIX SUM over the ranking of row-local terms, which is
    // exactly a window aggregate. This is the data-valuation primitive a
    // curation pipeline uses to price individual examples (which rows
    // help / hurt a probe set) without training anything. At 100 TB:
    // the probe set is BOUNDED (8 rows, seeded-hash pick — the x49/x52
    // device), so similarity is 8·n map-side dot products against a
    // broadcast probe frame (the corpus never shuffles for it); the only
    // shuffle is the per-probe ranking, a partition-by-qid sort whose
    // 100 TB form is the two-level bucketed global-rank device x165/x168
    // already use (bucket by sim band, countBelow per band, rank within).
    // Terms are rounded-6 and DECIMAL-summed in the window frame so the
    // suffix accumulation is exact and engine-order-proof (DuckDB's
    // segment-tree window sum vs Spark's running sum would otherwise
    // differ in float add order). Output: top-5 most valuable train
    // points per probe.
    QuerySpec(
      "x176_knn_shapley",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, dir)
        val probes = e
          .withColumn("h", md5(concat(lit("shap"), col("vec_id").cast("string"))))
          .orderBy("h", "vec_id").limit(8)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("label").as("qlab"))
        val train = e.join(
          broadcast(probes.select(col("qid").as("vec_id"))), Seq("vec_id"), "left_anti")
        val shap = Valuation.knnShapley(train, probes, "vec_id", "embedding",
          "label", k = 5)
        val wVal = Window.partitionBy("qid").orderBy(col("shap").desc, col("tid"))
        shap
          .withColumn("vrank", row_number().over(wVal).cast("long"))
          .filter(col("vrank") <= 5)
          .select(col("qid"), col("vrank"), col("tid"), col("tlab"),
            col("sim"), col("shap"))
          .orderBy("qid", "vrank")
      },
      Some("""WITH pr AS (SELECT vec_id,
             |        md5(concat('shap', CAST(vec_id AS VARCHAR))) AS h
             |      FROM embeddings),
             |t AS (SELECT vec_id FROM pr ORDER BY h, vec_id LIMIT 8),
             |e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb,
             |        label FROM embeddings),
             |n AS (SELECT vec_id, emb, label,
             |        sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |f AS (SELECT q.vec_id AS qid, q.label AS qlab, c.vec_id AS tid,
             |        c.label AS tlab, q.nrm AS qn, c.nrm AS cn,
             |        unnest(q.emb) AS qv, unnest(c.emb) AS cv
             |      FROM n q CROSS JOIN n c
             |      WHERE q.vec_id IN (SELECT vec_id FROM t)
             |        AND c.vec_id NOT IN (SELECT vec_id FROM t)),
             |d AS (SELECT qid, any_value(qlab) AS qlab, tid,
             |        any_value(tlab) AS tlab,
             |        round(sum(qv * cv) / (any_value(qn) * any_value(cn)), 4) AS sim
             |      FROM f GROUP BY qid, tid),
             |r AS (SELECT qid, qlab, tid, tlab, sim,
             |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, tid) AS rk,
             |        COUNT(*) OVER (PARTITION BY qid) AS nn,
             |        CASE WHEN tlab = qlab THEN 1.0 ELSE 0.0 END AS m
             |      FROM d),
             |g AS (SELECT *,
             |        CASE WHEN rk < nn THEN
             |          (m - lead(m) OVER (PARTITION BY qid ORDER BY rk)) / 5.0
             |            * least(5, rk) / rk
             |        ELSE 0.0 END AS term,
             |        MAX(CASE WHEN rk = nn THEN
             |          CASE WHEN nn > 5 THEN m / nn
             |               ELSE m * least(5, nn) / (5.0 * nn) END
             |        END) OVER (PARTITION BY qid) AS base
             |      FROM r),
             |sv AS (SELECT qid, tid, tlab, sim,
             |        round(base + CAST(sum(CAST(round(term, 6) AS DECIMAL(18,6)))
             |          OVER (PARTITION BY qid ORDER BY rk DESC
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS DOUBLE), 6) AS shap
             |      FROM g)
             |SELECT qid, CAST(row_number() OVER (PARTITION BY qid
             |    ORDER BY shap DESC, tid) AS BIGINT) AS vrank,
             |  tid, tlab, sim, shap
             |FROM sv QUALIFY vrank <= 5 ORDER BY qid, vrank""".stripMargin)),

    // Mann-Kendall trend test + Sen's slope (Mann 1945; Kendall 1975;
    // Sen, JASA 1968) over monthly revenue — the NONPARAMETRIC trend
    // read complementing the parametric suite (x122 Holt level/trend,
    // x143 changepoint, x146 MASE): S = Σ_{i<j} sign(x_j − x_i) with the
    // tie-corrected variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18,
    // the continuity-corrected z, and Sen's slope = median of pairwise
    // slopes — robust to outlier months and needing no distributional
    // assumption. At-scale shape: the corpus collapses to CALENDAR-BOUNDED
    // month cells first (80 here; any horizon is thousands at most), so the
    // pairwise stage is |months|² over a broadcast frame — never data-sized.
    // Month revenue goes through the round-6 DECIMAL bridge, so every
    // pairwise sign/slope is computed on bit-identical doubles per engine;
    // Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    // same sorted-linear-interpolation definition.
    QuerySpec(
      "x177_mann_kendall",
      (s, dir) => {
        val mo = Tables.orders(s, dir)
          .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("mi"))
          .agg(sum(round(col("o_totalprice"), 6).cast("decimal(18,6)"))
            .cast("double").as("rev"))
          .localCheckpoint() // one scan feeds pairs (both sides), ties, n
        val pairs = mo.as("a").join(mo.as("b"), col("a.mi") < col("b.mi"))
          .select(signum(col("b.rev") - col("a.rev")).cast("int").as("sg"),
            ((col("b.rev") - col("a.rev")) /
              (col("b.mi") - col("a.mi")).cast("double")).as("slope"))
        val sAgg = pairs.agg(sum(col("sg")).cast("long").as("s_stat"),
          expr("percentile(slope, 0.5)").as("sen"))
        val ties = mo.groupBy("rev").agg(count(lit(1)).as("t"))
          .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_term"),
            sum(col("t")).cast("long").as("n"))
        sAgg.crossJoin(broadcast(ties))
          .withColumn("var_s",
            (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_term"))
              .cast("double") / 18.0)
          .withColumn("zz",
            when(col("s_stat") > 0,
              (col("s_stat").cast("double") - 1.0) / sqrt(col("var_s")))
              .when(col("s_stat") < 0,
                (col("s_stat").cast("double") + 1.0) / sqrt(col("var_s")))
              .otherwise(lit(0.0)))
          .select(col("n").as("n_months"), col("s_stat"),
            round(col("var_s"), 6).as("var_s"), round(col("zz"), 6).as("z"),
            when(col("zz") > 1.959964, "increasing")
              .when(col("zz") < -1.959964, "decreasing")
              .otherwise("no trend").as("trend"),
            round(col("sen"), 6).as("sen_slope"))
          .orderBy("n_months")
      },
      Some("""WITH mo AS (SELECT CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT) AS mi,
             |        CAST(SUM(CAST(round(o_totalprice, 6) AS DECIMAL(18,6))) AS DOUBLE) AS rev
             |      FROM orders GROUP BY 1),
             |p AS (SELECT CAST(sign(b.rev - a.rev) AS INT) AS sg,
             |        (b.rev - a.rev) / CAST(b.mi - a.mi AS DOUBLE) AS slope
             |      FROM mo a JOIN mo b ON a.mi < b.mi),
             |sa AS (SELECT CAST(SUM(sg) AS BIGINT) AS s_stat,
             |        quantile_cont(slope, 0.5) AS sen FROM p),
             |ti AS (SELECT SUM(t*(t-1)*(t*2+5)) AS tie_term,
             |        CAST(SUM(t) AS BIGINT) AS n
             |      FROM (SELECT COUNT(*) AS t FROM mo GROUP BY rev)),
             |v AS (SELECT sa.s_stat, sa.sen, ti.tie_term, ti.n,
             |        CAST(n*(n-1)*(n*2+5) - tie_term AS DOUBLE)/18.0 AS var_s
             |      FROM sa CROSS JOIN ti),
             |z AS (SELECT *,
             |        CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE)-1.0)/sqrt(var_s)
             |             WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE)+1.0)/sqrt(var_s)
             |             ELSE 0.0 END AS zz FROM v)
             |SELECT n AS n_months, s_stat, round(var_s, 6) AS var_s,
             |  round(zz, 6) AS z,
             |  CASE WHEN zz > 1.959964 THEN 'increasing'
             |       WHEN zz < -1.959964 THEN 'decreasing'
             |       ELSE 'no trend' END AS trend,
             |  round(sen, 6) AS sen_slope
             |FROM z ORDER BY n_months""".stripMargin)),

    // RAKE keyword extraction (Rose, Engel, Cramer & Cowley, "Automatic
    // Keyword Extraction from Individual Documents", Text Mining 2010) —
    // the degree/frequency device, a DIFFERENT extraction principle from
    // x160's TextRank (co-occurrence random walk): candidate phrases are
    // maximal runs of content words between delimiter tokens, word score =
    // deg(w)/freq(w) where deg counts phrase-length mass per occurrence,
    // phrase score = Σ member word scores. Delimiters are short words
    // (length < 4, the x160 convention) PLUS the paper's own §1.2.2
    // refinement — a FREQUENCY-GENERATED stoplist (the top-10 corpus
    // words), computed from the data, not hand-curated; candidates are
    // capped at 4 words (the standard RAKE candidate-length cap), which
    // keeps phrase keys bounded at any corpus size. Shapes:
    // gaps-and-islands (p − row_number) per doc builds phrases with
    // PER-DOC windows only; the stoplist is a 10-row broadcast; word
    // stats are plain groupBys; nothing pairwise anywhere (vs TextRank's
    // window-pair edges). Word scores are exact-rational doubles
    // (int/int); per-phrase sums ride the round-6 DECIMAL bridge so
    // phrase scores are engine-identical.
    QuerySpec(
      "x178_rake_keywords",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("p", "wd")))
          .filter(length(col("wd")) >= 4)
          .localCheckpoint() // one tokenize feeds the stoplist and islands
        val stop = tok.groupBy("wd").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("wd")).limit(10)
          .select(col("wd"))
        val ph = tok
          .join(broadcast(stop), Seq("wd"), "left_anti")
          .withColumn("grp",
            col("p") - row_number().over(W.partitionBy("doc_id").orderBy("p")))
          .localCheckpoint() // feeds members, lengths, freq
        val phLen = ph.groupBy("doc_id", "grp")
          .agg(count(lit(1)).as("ph_len"),
            concat_ws(" ",
              transform(array_sort(collect_list(struct(col("p"), col("wd")))),
                x => x.getField("wd"))).as("phrase"))
          .filter(col("ph_len") <= 4)
        // Word stats over CANDIDATE members only (the paper scores words
        // within the candidate keyword set, not the whole corpus).
        val members = ph.join(phLen.select("doc_id", "grp", "ph_len"),
          Seq("doc_id", "grp"))
        val score = members.groupBy("wd")
          .agg(count(lit(1)).as("freq"), sum(col("ph_len")).as("deg"))
          .select(col("wd"),
            (col("deg").cast("double") / col("freq").cast("double")).as("ws"))
        val phScore = members.join(broadcast(score), "wd")
          .groupBy("doc_id", "grp")
          .agg(sum(round(col("ws"), 6).cast("decimal(18,6)"))
            .cast("double").as("psc"))
        phLen.join(phScore, Seq("doc_id", "grp"))
          .groupBy("phrase")
          .agg(count(lit(1)).as("n_occ"), max(col("psc")).as("sc"),
            max(col("ph_len")).as("n_words"))
          .select(col("phrase"), col("n_words"), col("n_occ"),
            round(col("sc"), 6).as("score"))
          .orderBy(col("score").desc, col("phrase")).limit(10)
      },
      Some("""WITH t AS (SELECT doc_id,
             |        list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |      FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS wd,
             |        generate_subscripts(toks, 1) AS p FROM t),
             |cw AS (SELECT doc_id, wd, p FROM tok WHERE length(wd) >= 4),
             |stop AS (SELECT wd FROM (
             |        SELECT wd, COUNT(*) AS cnt FROM cw GROUP BY 1)
             |      ORDER BY cnt DESC, wd LIMIT 10),
             |tk AS (SELECT doc_id, wd, p,
             |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
             |      FROM cw WHERE wd NOT IN (SELECT wd FROM stop)),
             |pl AS (SELECT doc_id, grp, COUNT(*) AS ph_len,
             |        string_agg(wd, ' ' ORDER BY p) AS phrase
             |      FROM tk GROUP BY 1, 2
             |      HAVING COUNT(*) <= 4),
             |mem AS (SELECT tk.doc_id, tk.grp, tk.wd, pl.ph_len
             |      FROM tk JOIN pl USING (doc_id, grp)),
             |sc AS (SELECT wd,
             |        CAST(SUM(ph_len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ws
             |      FROM mem GROUP BY 1),
             |ps AS (SELECT mem.doc_id, mem.grp,
             |        CAST(SUM(CAST(round(sc.ws, 6) AS DECIMAL(18,6))) AS DOUBLE) AS psc
             |      FROM mem JOIN sc USING (wd) GROUP BY 1, 2)
             |SELECT pl.phrase, MAX(pl.ph_len) AS n_words, COUNT(*) AS n_occ,
             |  round(MAX(ps.psc), 6) AS score
             |FROM pl JOIN ps USING (doc_id, grp)
             |GROUP BY pl.phrase
             |ORDER BY score DESC, phrase LIMIT 10""".stripMargin)),

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

    // HITS hubs & authorities (Kleinberg, JACM 46(5), 1999) on the
    // user→item BIPARTITE interaction graph — the mutual-reinforcement
    // read the item-projection ops can't give: x101's PageRank scores
    // items against items and never says anything about users, while
    // HITS scores both sides of the bipartite structure at once (a good
    // hub is a user who touches authoritative items; a good authority is
    // an item touched by good hubs). Three alternating power-iteration
    // rounds, L1-normalized per update (the paper's normalization up to
    // choice of norm); every product term rides the x101/x160 round-6 →
    // DECIMAL device and the normalizer is an exact decimal sum, so all
    // three rounds replay bit-identically in SQL. Scale shape: each
    // round is one |edges| equi-join + map-side-combined sum per side —
    // the x170 BSP discipline; the weight matrix is built once
    // (user,item,count — slim keys) and checkpointed.
    QuerySpec(
      "x180_hits",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ed = Tables.events(s, dir)
          .select(col("user_id"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("item"))
          .filter(col("item").isNotNull)
          .groupBy("user_id", "item").agg(count(lit(1)).as("w"))
          .localCheckpoint() // the weight matrix feeds all six half-rounds
        var hub = ed.select(col("user_id")).distinct()
          .withColumn("h", lit(1.0))
        var auth = ed.select(col("item")).distinct().withColumn("a", lit(0.0))
        for (_ <- 1 to 3) {
          val araw = ed.join(hub, "user_id")
            .select(col("item"),
              round(col("h") * col("w"), 6).cast("decimal(18,6)").as("c"))
            .groupBy("item").agg(sum(col("c")).cast("double").as("a"))
          val atot = araw
            .agg(sum(col("a").cast("decimal(18,6)")).cast("double").as("t"))
          auth = araw.crossJoin(broadcast(atot))
            .select(col("item"), round(col("a") / col("t"), 6).as("a"))
          val hraw = ed.join(auth, "item")
            .select(col("user_id"),
              round(col("a") * col("w"), 6).cast("decimal(18,6)").as("c"))
            .groupBy("user_id").agg(sum(col("c")).cast("double").as("h"))
          val htot = hraw
            .agg(sum(col("h").cast("decimal(18,6)")).cast("double").as("t"))
          hub = hraw.crossJoin(broadcast(htot))
            .select(col("user_id"), round(col("h") / col("t"), 6).as("h"))
        }
        auth.select(lit("authority").as("role"),
            col("item").cast("long").as("id"), col("a").as("score"))
          .unionByName(hub.select(lit("hub").as("role"),
            col("user_id").cast("long").as("id"), col("h").as("score")))
          .withColumn("rn", row_number()
            .over(W.partitionBy("role").orderBy(col("score").desc, col("id")))
            .cast("long"))
          .filter(col("rn") <= 10)
          .select(col("role"), col("rn"), col("id"), col("score"))
          .orderBy("role", "rn")
      },
      Some("""WITH ed AS (SELECT user_id,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS item,
             |        COUNT(*) AS w
             |      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
             |      GROUP BY 1, 2),
             |h0 AS (SELECT DISTINCT user_id, CAST(1.0 AS DOUBLE) AS h FROM ed),
             |a1r AS (SELECT ed.item,
             |        CAST(SUM(CAST(round(h0.h * ed.w, 6) AS DECIMAL(18,6))) AS DOUBLE) AS a
             |      FROM ed JOIN h0 USING (user_id) GROUP BY 1),
             |a1t AS (SELECT CAST(SUM(CAST(a AS DECIMAL(18,6))) AS DOUBLE) AS t FROM a1r),
             |a1 AS (SELECT item, round(a / a1t.t, 6) AS a FROM a1r CROSS JOIN a1t),
             |h1r AS (SELECT ed.user_id,
             |        CAST(SUM(CAST(round(a1.a * ed.w, 6) AS DECIMAL(18,6))) AS DOUBLE) AS h
             |      FROM ed JOIN a1 USING (item) GROUP BY 1),
             |h1t AS (SELECT CAST(SUM(CAST(h AS DECIMAL(18,6))) AS DOUBLE) AS t FROM h1r),
             |h1 AS (SELECT user_id, round(h / h1t.t, 6) AS h FROM h1r CROSS JOIN h1t),
             |a2r AS (SELECT ed.item,
             |        CAST(SUM(CAST(round(h1.h * ed.w, 6) AS DECIMAL(18,6))) AS DOUBLE) AS a
             |      FROM ed JOIN h1 USING (user_id) GROUP BY 1),
             |a2t AS (SELECT CAST(SUM(CAST(a AS DECIMAL(18,6))) AS DOUBLE) AS t FROM a2r),
             |a2 AS (SELECT item, round(a / a2t.t, 6) AS a FROM a2r CROSS JOIN a2t),
             |h2r AS (SELECT ed.user_id,
             |        CAST(SUM(CAST(round(a2.a * ed.w, 6) AS DECIMAL(18,6))) AS DOUBLE) AS h
             |      FROM ed JOIN a2 USING (item) GROUP BY 1),
             |h2t AS (SELECT CAST(SUM(CAST(h AS DECIMAL(18,6))) AS DOUBLE) AS t FROM h2r),
             |h2 AS (SELECT user_id, round(h / h2t.t, 6) AS h FROM h2r CROSS JOIN h2t),
             |a3r AS (SELECT ed.item,
             |        CAST(SUM(CAST(round(h2.h * ed.w, 6) AS DECIMAL(18,6))) AS DOUBLE) AS a
             |      FROM ed JOIN h2 USING (user_id) GROUP BY 1),
             |a3t AS (SELECT CAST(SUM(CAST(a AS DECIMAL(18,6))) AS DOUBLE) AS t FROM a3r),
             |a3 AS (SELECT item, round(a / a3t.t, 6) AS a FROM a3r CROSS JOIN a3t),
             |h3r AS (SELECT ed.user_id,
             |        CAST(SUM(CAST(round(a3.a * ed.w, 6) AS DECIMAL(18,6))) AS DOUBLE) AS h
             |      FROM ed JOIN a3 USING (item) GROUP BY 1),
             |h3t AS (SELECT CAST(SUM(CAST(h AS DECIMAL(18,6))) AS DOUBLE) AS t FROM h3r),
             |h3 AS (SELECT user_id, round(h / h3t.t, 6) AS h FROM h3r CROSS JOIN h3t),
             |u AS (SELECT 'authority' AS role, CAST(item AS BIGINT) AS id, a AS score FROM a3
             |      UNION ALL
             |      SELECT 'hub' AS role, CAST(user_id AS BIGINT) AS id, h AS score FROM h3)
             |SELECT role, CAST(row_number() OVER (PARTITION BY role
             |    ORDER BY score DESC, id) AS BIGINT) AS rn, id, score
             |FROM u QUALIFY rn <= 10 ORDER BY role, rn""".stripMargin)),

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

    // Degree-mixing audit: Newman's degree assortativity (PRL 89, 2002,
    // eq. 4 — Pearson correlation of end-degrees over the directed edge
    // list) + Feld's friendship paradox (AJS 96, 1991 — "your friends
    // have more friends than you": mean neighbor degree Σd²/Σd ≥ mean
    // degree, with the per-node paradox fraction). The graph-STRUCTURE
    // health read the traversal ops (x101/x114/x120/x139/x140/x170)
    // don't give: disassortative mixing + a high paradox ratio = hub-
    // dominated graph (sampling by edge ≠ sampling by node — the bias
    // that silently skews any neighbor-based sampler). All moments are
    // exact integer sums over the degree-joined edge list (two slim
    // equi-joins on the checkpointed x101 item graph); the final ratios
    // follow one shared double op sequence per engine — no tolerance.
    QuerySpec(
      "x183_degree_mixing",
      (s, dir) => {
        val e = itemEdges(s, dir, 3).select("src", "dst").localCheckpoint()
        val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
        val ed = e
          .join(deg.select(col("src"), col("d").as("dj")), "src")
          .join(deg.select(col("src").as("dst"), col("d").as("dk")), "dst")
        val mom = ed.agg(count(lit(1)).as("m"),
          sum(col("dj") * col("dk")).as("sjk"),
          sum(col("dj") + col("dk")).as("sj"),
          sum(col("dj") * col("dj") + col("dk") * col("dk")).as("sjj"),
          sum(col("dk")).as("sdk"))
        val nd = deg.agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
        val pf = ed.groupBy("src")
          .agg(max(col("dj")).as("d"),
            (sum(col("dk")).cast("double") / count(lit(1)).cast("double"))
              .as("nbr"))
          .agg(sum(when(col("d").cast("double") < col("nbr"), 1L)
            .otherwise(0L)).as("n_below"))
        mom.crossJoin(broadcast(nd)).crossJoin(broadcast(pf))
          .select(col("n").as("n_nodes"), expr("m div 2").as("n_edges"),
            round(col("sd").cast("double") / col("n").cast("double"), 6)
              .as("mean_deg"),
            round((col("sjk").cast("double") / col("m") -
              (col("sj").cast("double") / (col("m") * 2)) *
                (col("sj").cast("double") / (col("m") * 2))) /
              (col("sjj").cast("double") / (col("m") * 2) -
                (col("sj").cast("double") / (col("m") * 2)) *
                  (col("sj").cast("double") / (col("m") * 2))), 6)
              .as("assortativity"),
            round((col("sdk").cast("double") / col("m")) /
              (col("sd").cast("double") / col("n").cast("double")), 6)
              .as("paradox_ratio"),
            round(col("n_below").cast("double") / col("n").cast("double"), 6)
              .as("frac_paradox"))
          .orderBy("n_nodes")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst FROM pc UNION ALL SELECT ib, ia FROM pc),
             |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
             |ed AS (SELECT e.src, e.dst, j.d AS dj, k.d AS dk
             |      FROM e JOIN deg j ON j.src = e.src JOIN deg k ON k.src = e.dst),
             |mom AS (SELECT COUNT(*) AS m, SUM(dj * dk) AS sjk,
             |        SUM(dj + dk) AS sj, SUM(dj * dj + dk * dk) AS sjj,
             |        SUM(dk) AS sdk FROM ed),
             |nd AS (SELECT COUNT(*) AS n, SUM(d) AS sd FROM deg),
             |pf AS (SELECT CAST(SUM(CASE WHEN CAST(d AS DOUBLE) < nbr
             |          THEN 1 ELSE 0 END) AS BIGINT) AS n_below
             |      FROM (SELECT src, MAX(dj) AS d,
             |              CAST(SUM(dk) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS nbr
             |            FROM ed GROUP BY 1))
             |SELECT nd.n AS n_nodes, mom.m // 2 AS n_edges,
             |  round(CAST(nd.sd AS DOUBLE) / CAST(nd.n AS DOUBLE), 6) AS mean_deg,
             |  round((CAST(mom.sjk AS DOUBLE) / mom.m -
             |    (CAST(mom.sj AS DOUBLE) / (mom.m * 2)) *
             |      (CAST(mom.sj AS DOUBLE) / (mom.m * 2))) /
             |    (CAST(mom.sjj AS DOUBLE) / (mom.m * 2) -
             |      (CAST(mom.sj AS DOUBLE) / (mom.m * 2)) *
             |        (CAST(mom.sj AS DOUBLE) / (mom.m * 2))), 6) AS assortativity,
             |  round((CAST(mom.sdk AS DOUBLE) / mom.m) /
             |    (CAST(nd.sd AS DOUBLE) / CAST(nd.n AS DOUBLE)), 6) AS paradox_ratio,
             |  round(CAST(pf.n_below AS DOUBLE) / CAST(nd.n AS DOUBLE), 6) AS frac_paradox
             |FROM mom CROSS JOIN nd CROSS JOIN pf ORDER BY n_nodes""".stripMargin)),

    // Geometric median of the embedding corpus via Weiszfeld iterations
    // (Weiszfeld 1937; Beck & Sabach, "Weiszfeld's method: old and new
    // results", JOTA 2015) — the ROBUST centroid: the arithmetic mean
    // (x12) moves arbitrarily far under a single adversarial vector,
    // while the geometric median has a 50% breakdown point — the
    // aggregation a poisoning-resistant pipeline wants (robust federated
    // averaging is exactly this device). Three iterations of
    // c ← Σ wᵢvᵢ / Σ wᵢ with wᵢ = 1/max(‖vᵢ − c‖, ε), seeded at the
    // mean. Shapes: the centroid lives as a 64-row (dim, value) frame;
    // distances come from ONE broadcast-join + per-vector group sum
    // (rounded 4, the x5 group-sum stability precedent), weighted sums
    // ride the round-6 DECIMAL bridge per dim — every stage is a slim
    // equi-join or map-side-combined aggregate, linear in the corpus,
    // and replays verbatim in SQL. Output contrasts mean vs median per
    // dim (the shift IS the robustness signal).
    QuerySpec(
      "x184_geometric_median",
      (s, dir) => {
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("dim"), col("v").cast("double").as("v"))
          .localCheckpoint() // one explode feeds the seed and all rounds
        val n = ex.agg(countDistinct(col("vec_id")).as("n"))
        val mean = ex.groupBy("dim")
          .agg(sum(round(col("v"), 6).cast("decimal(18,6)")).cast("double")
            .as("sv"))
          .crossJoin(broadcast(n))
          .select(col("dim"), round(col("sv") / col("n"), 6).as("c"))
        var cen = mean
        for (_ <- 1 to 3) {
          val d = ex.join(broadcast(cen), "dim")
            .groupBy("vec_id")
            .agg(round(sqrt(sum((col("v") - col("c")) * (col("v") - col("c")))), 4)
              .as("dist"))
          val w = d.select(col("vec_id"),
            round(lit(1.0) / greatest(col("dist"), lit(1e-6)), 6).as("w"))
          val sw = w.agg(sum(col("w").cast("decimal(18,6)")).cast("double")
            .as("swv"))
          cen = ex.join(broadcast(w), "vec_id")
            .groupBy("dim")
            .agg(sum(round(col("w") * col("v"), 6).cast("decimal(18,6)"))
              .cast("double").as("num"))
            .crossJoin(broadcast(sw))
            .select(col("dim"), round(col("num") / col("swv"), 6).as("c"))
        }
        mean.select(col("dim"), col("c").as("mean_c"))
          .join(cen.select(col("dim"), col("c").as("geomed_c")), "dim")
          .select(col("dim").cast("long").as("dim"), col("mean_c"),
            col("geomed_c"),
            round(col("geomed_c") - col("mean_c"), 6).as("shift"))
          .orderBy("dim")
      },
      Some("""WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
             |        CAST(unnest(embedding) AS DOUBLE) AS v
             |      FROM embeddings),
             |n AS (SELECT COUNT(DISTINCT vec_id) AS n FROM ex),
             |mean AS (SELECT dim,
             |        round(CAST(SUM(CAST(round(v, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |          / n.n, 6) AS c
             |      FROM ex CROSS JOIN n GROUP BY dim, n.n),
             |d1 AS (SELECT vec_id, round(sqrt(SUM((v - c) * (v - c))), 4) AS dist
             |      FROM ex JOIN mean USING (dim) GROUP BY 1),
             |w1 AS (SELECT vec_id, round(1.0 / greatest(dist, 0.000001), 6) AS w FROM d1),
             |sw1 AS (SELECT CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS swv FROM w1),
             |c1 AS (SELECT dim,
             |        round(CAST(SUM(CAST(round(w * v, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |          / sw1.swv, 6) AS c
             |      FROM ex JOIN w1 USING (vec_id) CROSS JOIN sw1 GROUP BY dim, sw1.swv),
             |d2 AS (SELECT vec_id, round(sqrt(SUM((v - c) * (v - c))), 4) AS dist
             |      FROM ex JOIN c1 USING (dim) GROUP BY 1),
             |w2 AS (SELECT vec_id, round(1.0 / greatest(dist, 0.000001), 6) AS w FROM d2),
             |sw2 AS (SELECT CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS swv FROM w2),
             |c2 AS (SELECT dim,
             |        round(CAST(SUM(CAST(round(w * v, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |          / sw2.swv, 6) AS c
             |      FROM ex JOIN w2 USING (vec_id) CROSS JOIN sw2 GROUP BY dim, sw2.swv),
             |d3 AS (SELECT vec_id, round(sqrt(SUM((v - c) * (v - c))), 4) AS dist
             |      FROM ex JOIN c2 USING (dim) GROUP BY 1),
             |w3 AS (SELECT vec_id, round(1.0 / greatest(dist, 0.000001), 6) AS w FROM d3),
             |sw3 AS (SELECT CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS swv FROM w3),
             |c3 AS (SELECT dim,
             |        round(CAST(SUM(CAST(round(w * v, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |          / sw3.swv, 6) AS c
             |      FROM ex JOIN w3 USING (vec_id) CROSS JOIN sw3 GROUP BY dim, sw3.swv)
             |SELECT CAST(mean.dim AS BIGINT) AS dim, mean.c AS mean_c,
             |  c3.c AS geomed_c, round(c3.c - mean.c, 6) AS shift
             |FROM mean JOIN c3 USING (dim) ORDER BY dim""".stripMargin)),

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

    // MinHash-LSH parameter planner — the banding S-curve algebra
    // (Leskovec, Rajaraman & Ullman, "Mining of Massive Datasets" §3.4,
    // public; the same device x2's bands/rows choice hardcodes): for
    // each (bands b, rows r) split of 64 minhashes, a pair with Jaccard
    // s collides with probability 1 − (1 − s^r)^b. Rather than quote
    // the textbook curve abstractly, the planner prices each config
    // against THIS corpus: the exact pairwise-Jaccard histogram (0.05
    // bins, x4's shingle grain) weights the curve, yielding expected
    // true-candidate and false-candidate counts per config plus the
    // s50 threshold (1/b)^(1/r) — the table you read before picking
    // (b, r) for a dedup run. Scale shape: the similarity histogram is
    // the expensive input, so it is estimated from a BOUNDED 100-doc
    // seeded-hash sample (the x49 device — 4,950 pairs at ANY corpus
    // size; the planner needs the density shape, not every pair); the
    // planner itself is a histogram × 5-config grid — bounded
    // arithmetic on exact integer masses, engine-identical doubles.
    QuerySpec(
      "x187_lsh_planner",
      (s, dir) => {
        val sample = Tables.documents(s, dir)
          .withColumn("h",
            md5(concat(lit("lshplan:"), col("doc_id").cast("string"))))
          .orderBy("h", "doc_id").limit(100)
        val sh = sample
          .select(col("doc_id"), Dedup.wordShingleStrings(col("text")).as("sh"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint() // both join sides read one shingle pass
        val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select((size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
            (size(col("a.sh")) + size(col("b.sh")) -
              size(array_intersect(col("a.sh"), col("b.sh")))).cast("double"))
            .as("j"))
          .filter(col("j") > 0)
        val hist = pairs
          .groupBy(floor(col("j") / 0.05).cast("int").as("bin"))
          .agg(count(lit(1)).as("mass"))
          .select((col("bin").cast("double") * 0.05 + 0.025).as("s"),
            col("mass"))
        val grid = s.range(0, 5).toDF("gi")
          .select(element_at(array(lit(4), lit(8), lit(16), lit(32), lit(64)),
            col("gi").cast("int") + 1).as("bands"))
          .select(col("bands"), (lit(64) / col("bands")).cast("int").as("rows"))
        hist.crossJoin(broadcast(grid))
          .select(col("bands"), col("rows"), col("s"), col("mass"),
            (lit(1.0) - pow(lit(1.0) - pow(col("s"), col("rows").cast("double")),
              col("bands").cast("double"))).as("p"))
          .groupBy("bands", "rows")
          .agg(
            sum(when(col("s") >= 0.8,
              round(col("mass") * col("p"), 6).cast("decimal(18,6)")))
              .cast("double").as("e_true"),
            sum(when(col("s") < 0.8,
              round(col("mass") * col("p"), 6).cast("decimal(18,6)")))
              .cast("double").as("e_false"),
            sum(when(col("s") >= 0.8, col("mass"))).as("n_true_pairs"))
          .select(col("bands").cast("long").as("bands"),
            col("rows").cast("long").as("rows"),
            round(pow(lit(1.0) / col("bands").cast("double"),
              lit(1.0) / col("rows").cast("double")), 6).as("s50"),
            coalesce(col("n_true_pairs"), lit(0L)).as("n_true_pairs"),
            round(coalesce(col("e_true"), lit(0.0)), 6).as("e_true_cand"),
            round(coalesce(col("e_false"), lit(0.0)), 6).as("e_false_cand"))
          .orderBy("bands")
      },
      Some("""WITH smp AS (SELECT doc_id, text FROM (
             |    SELECT doc_id, text,
             |      md5(concat('lshplan:', CAST(doc_id AS VARCHAR))) AS h
             |    FROM documents) ORDER BY h, doc_id LIMIT 100),
             |t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM smp),
             |sh AS (SELECT doc_id,
             |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                   for i in range(1, len(toks)-1)]) AS sh
             |  FROM t),
             |p AS (SELECT
             |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS j
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(a.sh) > 0 AND len(b.sh) > 0),
             |hist AS (SELECT CAST(floor(j / 0.05) AS INT) AS bin, COUNT(*) AS mass
             |  FROM p WHERE j > 0 GROUP BY 1),
             |h2 AS (SELECT CAST(bin AS DOUBLE) * 0.05 + 0.025 AS s, mass FROM hist),
             |grid AS (SELECT bands, CAST(64 / bands AS INT) AS rows FROM
             |  (SELECT unnest([4, 8, 16, 32, 64]) AS bands)),
             |sc AS (SELECT bands, rows, s, mass,
             |    1.0 - pow(1.0 - pow(s, CAST(rows AS DOUBLE)), CAST(bands AS DOUBLE)) AS p
             |  FROM h2 CROSS JOIN grid)
             |SELECT CAST(bands AS BIGINT) AS bands, CAST(rows AS BIGINT) AS rows,
             |  round(pow(1.0 / CAST(bands AS DOUBLE), 1.0 / CAST(rows AS DOUBLE)), 6) AS s50,
             |  coalesce(CAST(SUM(CASE WHEN s >= 0.8 THEN mass END) AS BIGINT), 0) AS n_true_pairs,
             |  round(coalesce(CAST(SUM(CASE WHEN s >= 0.8
             |    THEN CAST(round(mass * p, 6) AS DECIMAL(18,6)) END) AS DOUBLE), 0.0), 6) AS e_true_cand,
             |  round(coalesce(CAST(SUM(CASE WHEN s < 0.8
             |    THEN CAST(round(mass * p, 6) AS DECIMAL(18,6)) END) AS DOUBLE), 0.0), 6) AS e_false_cand
             |FROM sc GROUP BY bands, rows ORDER BY bands""".stripMargin)),

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
             |FROM lg CROSS JOIN fit ORDER BY m""".stripMargin)),

    // Feature-hashing collision audit (Weinberger et al., "Feature
    // Hashing for Large Scale Multitask Learning", ICML 2009 — the
    // hashing trick x41's DSIR features already use at a fixed 64
    // buckets): for bucket widths 2^b, b ∈ {4,6,8}, how much of the
    // vocabulary — and how much of the token MASS — lands in buckets
    // shared with another word. The capacity-planning table you read
    // before fixing a hashed-feature width: unweighted collision rate
    // falls like the birthday bound, but the MASS-weighted rate is what
    // distorts a learner, and a Zipfian head keeps it high long after
    // the unweighted rate looks fine. Buckets are the x86 md5 device
    // (mod 2^b), so the whole audit replays in SQL; everything is exact
    // integer masses over a |vocab| × 3 grid — corpus-sized work is
    // ONE word-frequency aggregate.
    QuerySpec(
      "x190_feature_hashing",
      (s, dir) => {
        val wf = Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("wd"))
          .groupBy("wd").agg(count(lit(1)).as("freq"))
          .withColumn("hk",
            conv(substring(md5(concat(lit("fh:"), col("wd"))), 1, 12), 16, 10)
              .cast("long"))
          .localCheckpoint() // one token pass feeds all three widths
        val grid = s.range(0, 3).toDF("gi")
          .select(element_at(array(lit(4), lit(6), lit(8)),
            col("gi").cast("int") + 1).as("b"))
          .select(col("b"), pow(lit(2.0), col("b").cast("double"))
            .cast("long").as("nb"))
        val bk = wf.crossJoin(broadcast(grid))
          .select(col("b"), col("nb"), (col("hk") % col("nb")).as("bkt"),
            col("wd"), col("freq"))
        val loads = bk.groupBy("b", "nb", "bkt")
          .agg(count(lit(1)).as("nw"), sum(col("freq")).as("mass"))
        loads.groupBy("b", "nb")
          .agg(sum(col("nw")).as("n_words"),
            count(lit(1)).as("n_used"),
            sum(when(col("nw") >= 2, col("nw")).otherwise(0L))
              .as("n_colliding"),
            sum(col("mass")).as("total_mass"),
            sum(when(col("nw") >= 2, col("mass")).otherwise(0L))
              .as("colliding_mass"))
          .select(col("b").cast("long").as("b"), col("nb"), col("n_words"),
            col("n_used"), col("n_colliding"),
            round(col("n_colliding").cast("double") /
              col("n_words").cast("double"), 6).as("word_collision_rate"),
            round(col("colliding_mass").cast("double") /
              col("total_mass").cast("double"), 6).as("mass_collision_rate"))
          .orderBy("b")
      },
      Some("""WITH tok AS (SELECT unnest(list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS wd
             |      FROM documents),
             |wf AS (SELECT wd, COUNT(*) AS freq,
             |        CAST(('0x' || substr(md5('fh:' || wd), 1, 12)) AS BIGINT) AS hk
             |      FROM tok GROUP BY 1),
             |grid AS (SELECT b, CAST(pow(2.0, CAST(b AS DOUBLE)) AS BIGINT) AS nb
             |      FROM (SELECT unnest([4, 6, 8]) AS b)),
             |bk AS (SELECT b, nb, hk % nb AS bkt, wd, freq
             |      FROM wf CROSS JOIN grid),
             |loads AS (SELECT b, nb, bkt, COUNT(*) AS nw, SUM(freq) AS mass
             |      FROM bk GROUP BY 1, 2, 3)
             |SELECT CAST(b AS BIGINT) AS b, nb,
             |  CAST(SUM(nw) AS BIGINT) AS n_words,
             |  COUNT(*) AS n_used,
             |  CAST(SUM(CASE WHEN nw >= 2 THEN nw ELSE 0 END) AS BIGINT) AS n_colliding,
             |  round(CAST(SUM(CASE WHEN nw >= 2 THEN nw ELSE 0 END) AS DOUBLE) /
             |    CAST(SUM(nw) AS DOUBLE), 6) AS word_collision_rate,
             |  round(CAST(SUM(CASE WHEN nw >= 2 THEN mass ELSE 0 END) AS DOUBLE) /
             |    CAST(SUM(mass) AS DOUBLE), 6) AS mass_collision_rate
             |FROM loads GROUP BY b, nb ORDER BY b""".stripMargin)),

    // Two-sample energy distance between embedding distributions
    // (Székely & Rizzo, "Testing for equal distributions in high
    // dimension", InterStat 2004): E = 2·E‖X−Y‖ − E‖X−X′‖ − E‖Y−Y′‖,
    // ≥ 0 with equality iff the distributions match — the
    // WHOLE-DISTRIBUTION drift read x87's mean-shift drift can't give
    // (two clouds with equal means but different spreads/shapes have
    // E > 0 and mean-shift 0), and it works directly in 64-dim where
    // the 1-d KS test (x129) doesn't apply. U-statistic means over
    // i<j pairs. Scale shape: both groups are SEEDED-HASH SAMPLES of
    // ≤ 80 vectors (the x49/x187 device) — pair counts are bounded by
    // construction at any corpus size, the honest estimator shape for
    // a pairwise statistic (the x187 sampled-histogram argument).
    // Distances are rounded-4 (the x5 group-sum stability precedent);
    // the three means ride the DECIMAL bridge.
    QuerySpec(
      "x191_energy_distance",
      (s, dir) => {
        def samp(lbl: Int) = Tables.embeddings(s, dir)
          .filter(col("label") === lbl)
          .withColumn("h", md5(concat(lit("energy:"),
            col("vec_id").cast("string"))))
          .orderBy("h", "vec_id").limit(80)
          .select(col("vec_id").as("id"), col("embedding").as("emb"))
        val dcol = round(sqrt(aggregate(
          zip_with(col("a.emb"), col("b.emb"),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, t) => acc + t)), 4)
        def meanD(pairs: org.apache.spark.sql.DataFrame, name: String) =
          pairs.agg(count(lit(1)).as("n_" + name),
            (sum(dcol.cast("decimal(18,6)")).cast("double") /
              count(lit(1)).cast("double")).as("e_" + name))
        val xs = samp(0).localCheckpoint()
        val ys = samp(1).localCheckpoint()
        val exy = meanD(xs.as("a").crossJoin(broadcast(ys.as("b"))), "xy")
        val exx = meanD(xs.as("a").join(broadcast(xs.as("b")),
          col("a.id") < col("b.id")), "xx")
        val eyy = meanD(ys.as("a").join(broadcast(ys.as("b")),
          col("a.id") < col("b.id")), "yy")
        exy.crossJoin(broadcast(exx)).crossJoin(broadcast(eyy))
          .select(col("n_xy"), round(col("e_xy"), 6).as("e_xy"),
            round(col("e_xx"), 6).as("e_xx"),
            round(col("e_yy"), 6).as("e_yy"),
            round(lit(2.0) * col("e_xy") - col("e_xx") - col("e_yy"), 6)
              .as("energy_dist"))
          .orderBy("n_xy")
      },
      Some("""WITH sx AS (SELECT vec_id AS id, embedding AS emb FROM (
             |        SELECT vec_id, embedding,
             |          md5(concat('energy:', CAST(vec_id AS VARCHAR))) AS h
             |        FROM embeddings WHERE label = 0)
             |      ORDER BY h, id LIMIT 80),
             |sy AS (SELECT vec_id AS id, embedding AS emb FROM (
             |        SELECT vec_id, embedding,
             |          md5(concat('energy:', CAST(vec_id AS VARCHAR))) AS h
             |        FROM embeddings WHERE label = 1)
             |      ORDER BY h, id LIMIT 80),
             |fxy AS (SELECT a.id AS ia, b.id AS ib,
             |        CAST(unnest(a.emb) AS DOUBLE) AS av,
             |        CAST(unnest(b.emb) AS DOUBLE) AS bv
             |      FROM sx a CROSS JOIN sy b),
             |dxy AS (SELECT round(sqrt(SUM((av - bv) * (av - bv))), 4) AS d
             |      FROM fxy GROUP BY ia, ib),
             |fxx AS (SELECT a.id AS ia, b.id AS ib,
             |        CAST(unnest(a.emb) AS DOUBLE) AS av,
             |        CAST(unnest(b.emb) AS DOUBLE) AS bv
             |      FROM sx a JOIN sx b ON a.id < b.id),
             |dxx AS (SELECT round(sqrt(SUM((av - bv) * (av - bv))), 4) AS d
             |      FROM fxx GROUP BY ia, ib),
             |fyy AS (SELECT a.id AS ia, b.id AS ib,
             |        CAST(unnest(a.emb) AS DOUBLE) AS av,
             |        CAST(unnest(b.emb) AS DOUBLE) AS bv
             |      FROM sy a JOIN sy b ON a.id < b.id),
             |dyy AS (SELECT round(sqrt(SUM((av - bv) * (av - bv))), 4) AS d
             |      FROM fyy GROUP BY ia, ib),
             |mxy AS (SELECT COUNT(*) AS n_xy,
             |        CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE)
             |          / CAST(COUNT(*) AS DOUBLE) AS e_xy FROM dxy),
             |mxx AS (SELECT CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE)
             |          / CAST(COUNT(*) AS DOUBLE) AS e_xx FROM dxx),
             |myy AS (SELECT CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE)
             |          / CAST(COUNT(*) AS DOUBLE) AS e_yy FROM dyy)
             |SELECT n_xy, round(e_xy, 6) AS e_xy, round(e_xx, 6) AS e_xx,
             |  round(e_yy, 6) AS e_yy,
             |  round(2.0 * e_xy - e_xx - e_yy, 6) AS energy_dist
             |FROM mxy CROSS JOIN mxx CROSS JOIN myy ORDER BY n_xy""".stripMargin)),

    // Planted-duplicate recall eval of the MinHash-LSH dedup pipeline —
    // the END-TO-END harness that turns x2's device into a measured
    // guarantee: every 10th document gets a deterministically-derived
    // near-dup twin (three appended sentinel tokens ⇒ known Jaccard
    // n/(n+3) ≥ 0.9 at this corpus's lengths — the x117 derived-corpus
    // precedent), the REAL x2 pipeline (signatures → banding → exact-
    // jaccard verify) runs over base ∪ twins, and the output is recall
    // on the planted pairs plus the organic-pair count. Oracle
    // exactness rides x2's own argument: the verify stage thresholds
    // exact Jaccard, and banding recall at j ≥ 0.9 with (16 bands × 4
    // rows) is 1 − (1 − 0.9⁴)¹⁶ ≈ 1 − 4e-8, so the emitted pair set
    // equals DuckDB's brute-force sweep over the same derived corpus.
    // Eval cost = the pipeline's own cost (banded candidates, never
    // all-pairs); the brute sweep exists ONLY oracle-side.
    QuerySpec(
      "x192_dedup_recall_eval",
      (s, dir) => {
        val base = Tables.documents(s, dir).select("doc_id", "text")
        val off = base.agg(max(col("doc_id")).as("mx"))
        val twins = base.filter(col("doc_id") % 10 === 0)
          .crossJoin(broadcast(off))
          .select((col("doc_id") + col("mx") + 1).as("doc_id"),
            concat(col("text"), lit(" zz9 zz8 zz7")).as("text"))
        val corpus = base.unionByName(twins).localCheckpoint()
        val found = Dedup.minhashNearDups(corpus, "doc_id", "text",
          k = 64, bands = 16, threshold = 0.8)
        val planted = base.filter(col("doc_id") % 10 === 0)
          .crossJoin(broadcast(off))
          .select(col("doc_id").as("doc_a"),
            (col("doc_id") + col("mx") + 1).as("doc_b"))
        val hit = found.join(broadcast(planted.select(col("doc_a"),
          col("doc_b"), lit(1L).as("is_planted"))), Seq("doc_a", "doc_b"),
          "left")
        val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
        hit.agg(count(lit(1)).as("n_found_pairs"),
            sum(coalesce(col("is_planted"), lit(0L))).as("n_found_planted"))
          .crossJoin(broadcast(nPlanted))
          .crossJoin(broadcast(corpus.agg(count(lit(1)).as("n_docs"))))
          .select(col("n_docs"), col("n_planted"), col("n_found_planted"),
            round(col("n_found_planted").cast("double") /
              col("n_planted").cast("double"), 6).as("recall"),
            (col("n_found_pairs") - col("n_found_planted"))
              .as("n_organic_pairs"))
          .orderBy("n_docs")
      },
      Some("""WITH off AS (SELECT MAX(doc_id) AS mx FROM documents),
             |corpus AS (SELECT doc_id, text FROM documents
             |      UNION ALL
             |      SELECT d.doc_id + off.mx + 1, d.text || ' zz9 zz8 zz7'
             |      FROM documents d CROSS JOIN off WHERE d.doc_id % 10 = 0),
             |t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM corpus),
             |sh AS (SELECT doc_id,
             |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                   for i in range(1, len(toks)-1)]) AS sh
             |  FROM t),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na, len(b.sh) AS nb
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(a.sh) > 0 AND len(b.sh) > 0),
             |found AS (SELECT doc_a, doc_b FROM p
             |  WHERE round(CAST(i AS DOUBLE)/(na+nb-i), 4) >= 0.8),
             |planted AS (SELECT d.doc_id AS doc_a, d.doc_id + off.mx + 1 AS doc_b
             |      FROM documents d CROSS JOIN off WHERE d.doc_id % 10 = 0),
             |agg AS (SELECT
             |    (SELECT COUNT(*) FROM corpus) AS n_docs,
             |    (SELECT COUNT(*) FROM planted) AS n_planted,
             |    (SELECT COUNT(*) FROM found JOIN planted USING (doc_a, doc_b))
             |      AS n_found_planted,
             |    (SELECT COUNT(*) FROM found) AS n_found_pairs)
             |SELECT n_docs, n_planted, CAST(n_found_planted AS BIGINT) AS n_found_planted,
             |  round(CAST(n_found_planted AS DOUBLE) / CAST(n_planted AS DOUBLE), 6)
             |    AS recall,
             |  CAST(n_found_pairs - n_found_planted AS BIGINT) AS n_organic_pairs
             |FROM agg ORDER BY n_docs""".stripMargin)),

    // Shuffle-mixing audit — the runs-test read (Wald & Wolfowitz, AoMS
    // 11, 1940, generalized to k categories) applied to the x86 shard
    // order: a training shard whose SOURCE sequence has too few runs
    // feeds the learner long same-source stretches (the data-ordering
    // bug class behind loss spikes), too many runs means anti-
    // correlated interleaving. Per shard: observed category boundaries
    // in hash order vs the exact permutation expectation
    // E[boundaries] = (n−1)·(1 − Σ nᵢ(nᵢ−1)/(n(n−1))); the ratio ≈ 1
    // certifies the shuffle. Everything is exact integer counts (lag
    // windows PARTITIONED by shard — the distributed-window shape; the
    // source histogram is a per-shard aggregate); the only corpus-sized
    // work is the one hash-order sort the shuffle itself needs.
    QuerySpec(
      "x193_shuffle_mixing",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val keyed = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            conv(substring(md5(concat(lit("graft-shuffle-42:"),
              col("doc_id").cast("string"))), 1, 12), 16, 10)
              .cast("long").as("skey"))
          .withColumn("shard", col("skey") % 8)
        val wl = W.partitionBy("shard").orderBy("skey")
        val bounds = keyed
          .withColumn("prev", lag(col("source"), 1).over(wl))
          .groupBy("shard")
          .agg(count(lit(1)).as("n"),
            sum(when(col("prev").isNotNull && col("prev") =!= col("source"),
              1L).otherwise(0L)).as("obs_bounds"))
        val cats = keyed.groupBy("shard", "source")
          .agg(count(lit(1)).as("ni"))
          .groupBy("shard")
          .agg(sum(col("ni") * (col("ni") - 1)).as("same_pairs"))
        bounds.join(cats, "shard")
          .select(col("shard"), col("n"), col("obs_bounds"),
            round((col("n") - 1).cast("double") *
              (lit(1.0) - col("same_pairs").cast("double") /
                (col("n") * (col("n") - 1)).cast("double")), 6)
              .as("exp_bounds"))
          .withColumn("mix_ratio",
            round(col("obs_bounds").cast("double") / col("exp_bounds"), 6))
          .orderBy("shard")
      },
      Some("""WITH keyed AS (SELECT doc_id, source,
             |        CAST(('0x' || substr(md5('graft-shuffle-42:' ||
             |          CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS skey
             |      FROM documents),
             |sh AS (SELECT doc_id, source, skey, skey % 8 AS shard FROM keyed),
             |b AS (SELECT shard, COUNT(*) AS n,
             |        CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> source
             |            THEN 1 ELSE 0 END) AS BIGINT) AS obs_bounds
             |      FROM (SELECT shard, source,
             |              lag(source) OVER (PARTITION BY shard ORDER BY skey) AS prev
             |            FROM sh)
             |      GROUP BY 1),
             |c AS (SELECT shard, SUM(ni * (ni - 1)) AS same_pairs FROM (
             |        SELECT shard, source, COUNT(*) AS ni FROM sh GROUP BY 1, 2)
             |      GROUP BY 1),
             |r AS (SELECT b.shard, b.n, b.obs_bounds,
             |        round(CAST(b.n - 1 AS DOUBLE) *
             |          (1.0 - CAST(c.same_pairs AS DOUBLE) /
             |            CAST(b.n * (b.n - 1) AS DOUBLE)), 6) AS exp_bounds
             |      FROM b JOIN c USING (shard))
             |SELECT shard, n, obs_bounds, exp_bounds,
             |  round(CAST(obs_bounds AS DOUBLE) / exp_bounds, 6) AS mix_ratio
             |FROM r ORDER BY shard""".stripMargin)),

    // Cross-correlation function between two daily series (Box & Jenkins,
    // "Time Series Analysis", ch. 11 — the prewhitening-free sample CCF):
    // r_xy(ℓ) = Σ(x_t − x̄)(y_{t+ℓ} − ȳ) / (n·s_x·s_y) for lags −7..7,
    // here purchase volume vs click volume — the LEAD/LAG read x134's
    // single-series ACF can't give (a peak at ℓ > 0 means clicks lead
    // purchases by ℓ days: the conversion-latency signal; at ℓ < 0 the
    // causality arrow is suspect). Day cells are calendar-bounded, the
    // lag join is day-arithmetic against the same |days|-row table, and
    // means/stds come from the x171 integer-moment identity — every
    // r_xy is one shared double op sequence per engine. Denominator
    // uses the FULL-series moments at every lag (the Box-Jenkins
    // convention), so |r| is comparable across lags.
    QuerySpec(
      "x194_ccf",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y"))
          .localCheckpoint() // both join sides + moments read one table
        val mom = daily.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
          .select(col("n"),
            (col("sx").cast("double") / col("n")).as("mx"),
            sqrt(col("sxx").cast("double") / col("n") -
              (col("sx").cast("double") / col("n")) *
                (col("sx").cast("double") / col("n"))).as("sdx"),
            (col("sy").cast("double") / col("n")).as("my"),
            sqrt(col("syy").cast("double") / col("n") -
              (col("sy").cast("double") / col("n")) *
                (col("sy").cast("double") / col("n"))).as("sdy"))
        val lags = s.range(-7, 8).toDF("lag")
        val pairs = daily.select(col("day"), col("x"))
          .crossJoin(broadcast(lags))
          .join(daily.select(col("day").as("d2"), col("y")),
            expr("date_add(day, CAST(lag AS INT)) = d2"))
        pairs.crossJoin(broadcast(mom))
          .groupBy("lag")
          .agg(count(lit(1)).as("n_overlap"),
            (sum(round((col("x") - col("mx")) * (col("y") - col("my")), 6)
              .cast("decimal(18,6)")).cast("double") /
              (max(col("n")).cast("double") * max(col("sdx")) * max(col("sdy"))))
              .as("r"))
          .select(col("lag"), col("n_overlap"), round(col("r"), 6).as("r"))
          .orderBy("lag")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
             |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS y
             |      FROM events GROUP BY 1),
             |mom AS (SELECT COUNT(*) AS n,
             |        CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mx,
             |        sqrt(CAST(SUM(x * x) AS DOUBLE) / COUNT(*) -
             |          (CAST(SUM(x) AS DOUBLE) / COUNT(*)) *
             |            (CAST(SUM(x) AS DOUBLE) / COUNT(*))) AS sdx,
             |        CAST(SUM(y) AS DOUBLE) / COUNT(*) AS my,
             |        sqrt(CAST(SUM(y * y) AS DOUBLE) / COUNT(*) -
             |          (CAST(SUM(y) AS DOUBLE) / COUNT(*)) *
             |            (CAST(SUM(y) AS DOUBLE) / COUNT(*))) AS sdy
             |      FROM daily),
             |lags AS (SELECT unnest(range(-7, 8)) AS lag),
             |p AS (SELECT l.lag, a.x, b.y
             |      FROM daily a CROSS JOIN lags l
             |      JOIN daily b ON a.day + CAST(l.lag AS INT) = b.day)
             |SELECT lag, COUNT(*) AS n_overlap,
             |  round(CAST(SUM(CAST(round((x - mom.mx) * (y - mom.my), 6)
             |      AS DECIMAL(18,6))) AS DOUBLE) /
             |    (CAST(MAX(mom.n) AS DOUBLE) * MAX(mom.sdx) * MAX(mom.sdy)), 6) AS r
             |FROM p CROSS JOIN mom GROUP BY lag ORDER BY lag""".stripMargin)),

    // Benjamini-Hochberg FDR control (JRSS-B 57, 1995) over the metric
    // family "weekend vs weekday mean value, per event type" — the
    // multiple-comparisons discipline the single-test ops (x133 Welch,
    // x129 KS, x135 MW) leave to the reader: testing 5 metrics at
    // α = 0.05 each inflates the family false-positive rate to ~23%,
    // and BH is the standard step-up fix (reject all p ≤ the largest
    // p_(i) ≤ (i/m)·q). p-values come from Welch z via the
    // Abramowitz & Stegun 26.2.17 polynomial Φ approximation (|ε| <
    // 7.5e-8 — far below the 6-dp rounding) — a PUBLIC closed form
    // both engines evaluate with the identical op sequence, which is
    // what makes p-values oracle-checkable at all. Group moments ride
    // the DECIMAL bridge; the step-up scan is a window over the 5-row
    // p table.
    QuerySpec(
      "x195_bh_fdr",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val g = Tables.events(s, dir)
          .select(col("event_type"),
            (dayofweek(col("ts")).isin(1, 7)).cast("int").as("we"),
            col("value"))
          .groupBy("event_type", "we")
          .agg(count(lit(1)).as("n"),
            sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double")
              .as("sv"),
            sum(round(col("value") * col("value"), 6).cast("decimal(18,6)"))
              .cast("double").as("svv"))
          .select(col("event_type"), col("we"), col("n"),
            (col("sv") / col("n")).as("mu"),
            ((col("svv") / col("n") - (col("sv") / col("n")) *
              (col("sv") / col("n"))) / col("n")).as("vn"))
        val z = g.filter(col("we") === 1)
          .select(col("event_type"), col("n").as("n_we"),
            col("mu").as("mu_we"), col("vn").as("vn_we"))
          .join(g.filter(col("we") === 0)
            .select(col("event_type"), col("n").as("n_wd"),
              col("mu").as("mu_wd"), col("vn").as("vn_wd")), "event_type")
          .select(col("event_type"), col("n_we"), col("n_wd"),
            ((col("mu_we") - col("mu_wd")) /
              sqrt(col("vn_we") + col("vn_wd"))).as("zz"))
        // Φ(x) for x >= 0 via A&S 26.2.17; p = 2·(1 − Φ(|z|))
        val ax = abs(col("zz"))
        val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * ax)
        val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
          t * (lit(1.781477937) + t * (lit(-1.821255978) +
            t * lit(1.330274429)))))
        val phi = exp(ax * ax / lit(-2.0)) * lit(0.3989422804014327)
        val pv = z.withColumn("p", round(lit(2.0) * phi * poly, 6))
        val wRank = W.orderBy(col("p"), col("event_type"))
        val wMax = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        pv.withColumn("rk", row_number().over(wRank))
          .withColumn("m", count(lit(1)).over(wMax))
          .withColumn("bh_thresh",
            round(col("rk").cast("double") / col("m") * 0.1, 6))
          .withColumn("k_max",
            max(when(col("p") <= col("bh_thresh"), col("rk"))).over(wMax))
          .select(col("event_type"), col("n_we"), col("n_wd"),
            round(col("zz"), 6).as("z"), col("p"),
            col("rk").cast("long").as("bh_rank"), col("bh_thresh"),
            when(col("rk") <= coalesce(col("k_max"), lit(0)), "rejected")
              .otherwise("kept").as("h0"))
          .orderBy("bh_rank")
      },
      Some("""WITH g AS (SELECT event_type,
             |        CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
             |        COUNT(*) AS n,
             |        CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             |        CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS svv
             |      FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, we, n, sv / n AS mu,
             |        (svv / n - (sv / n) * (sv / n)) / n AS vn FROM g),
             |z AS (SELECT a.event_type, a.n AS n_we, b.n AS n_wd,
             |        (a.mu - b.mu) / sqrt(a.vn + b.vn) AS zz
             |      FROM m a JOIN m b ON a.event_type = b.event_type
             |        AND a.we = 1 AND b.we = 0),
             |pv AS (SELECT event_type, n_we, n_wd, zz,
             |        round(2.0 * (exp(abs(zz) * abs(zz) / -2.0) * 0.3989422804014327) *
             |          ((1.0 / (1.0 + 0.2316419 * abs(zz))) * (0.319381530 +
             |           (1.0 / (1.0 + 0.2316419 * abs(zz))) * (-0.356563782 +
             |           (1.0 / (1.0 + 0.2316419 * abs(zz))) * (1.781477937 +
             |           (1.0 / (1.0 + 0.2316419 * abs(zz))) * (-1.821255978 +
             |           (1.0 / (1.0 + 0.2316419 * abs(zz))) * 1.330274429))))), 6) AS p
             |      FROM z),
             |rk AS (SELECT *, row_number() OVER (ORDER BY p, event_type) AS rk,
             |        COUNT(*) OVER () AS m FROM pv),
             |bh AS (SELECT *, round(CAST(rk AS DOUBLE) / m * 0.1, 6) AS bh_thresh
             |      FROM rk),
             |km AS (SELECT *, MAX(CASE WHEN p <= bh_thresh THEN rk END)
             |        OVER () AS k_max FROM bh)
             |SELECT event_type, n_we, n_wd, round(zz, 6) AS z, p,
             |  CAST(rk AS BIGINT) AS bh_rank, bh_thresh,
             |  CASE WHEN rk <= coalesce(k_max, 0) THEN 'rejected'
             |       ELSE 'kept' END AS h0
             |FROM km ORDER BY bh_rank""".stripMargin)),

    // Cochran-Mantel-Haenszel stratified association (Mantel & Haenszel,
    // JNCI 22, 1959; Cochran, Biometrics 10, 1954): the 2×2-per-stratum
    // test + pooled odds ratio — the CLASSIC epidemiology counterpart
    // to x182's IPW (same confounder-stratification idea, but testing
    // ASSOCIATION with a continuity-corrected χ² and pooling effect
    // size as the MH odds ratio, which is valid even when per-stratum
    // cells are small — the reason MH survives where per-stratum χ²
    // breaks). Exposure = the x182 treatment (≥2 high-value
    // purchases), outcome = user ever logs a high-value (>150) error, strata =
    // activity quintiles. The crude OR rides along: crude ≠ MH is the
    // Simpson's-reversal signal. Every cell is an exact integer; the
    // χ² and ORs are rational sums over 5 strata (DECIMAL-bridged) —
    // engine-identical.
    QuerySpec(
      "x196_cmh",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("e"),
            max(when(col("event_type") === "error" && col("value") > 150.0,
              1L).otherwise(0L)).as("o"))
          .localCheckpoint()
        val qs = u.agg(expr("percentile(act, array(0.2, 0.4, 0.6, 0.8))").as("q"))
        val ub = u.crossJoin(broadcast(qs))
          .select(col("e"), col("o"),
            ((col("act") > element_at(col("q"), 1)).cast("int") +
             (col("act") > element_at(col("q"), 2)).cast("int") +
             (col("act") > element_at(col("q"), 3)).cast("int") +
             (col("act") > element_at(col("q"), 4)).cast("int")).as("st"))
        val cells = ub.groupBy("st")
          .agg(sum(col("e") * col("o")).as("a"),
            sum(col("e") * (lit(1L) - col("o"))).as("b"),
            sum((lit(1L) - col("e")) * col("o")).as("c"),
            sum((lit(1L) - col("e")) * (lit(1L) - col("o"))).as("d"))
          .select(col("st"), col("a"), col("b"), col("c"), col("d"),
            (col("a") + col("b") + col("c") + col("d")).as("nk"))
          .filter(col("nk") > 1)
        val agg = cells.agg(count(lit(1)).as("n_strata"),
          sum(col("a")).as("sa"),
          sum(round((col("a") + col("b")).cast("double") *
            (col("a") + col("c")).cast("double") / col("nk"), 6)
            .cast("decimal(18,6)")).cast("double").as("se"),
          sum(round((col("a") + col("b")).cast("double") *
            (col("c") + col("d")).cast("double") *
            (col("a") + col("c")).cast("double") *
            (col("b") + col("d")).cast("double") /
            (col("nk").cast("double") * col("nk").cast("double") *
              (col("nk") - 1).cast("double")), 6)
            .cast("decimal(18,6)")).cast("double").as("sv"),
          sum(round(col("a").cast("double") * col("d") / col("nk"), 6)
            .cast("decimal(18,6)")).cast("double").as("sad"),
          sum(round(col("b").cast("double") * col("c") / col("nk"), 6)
            .cast("decimal(18,6)")).cast("double").as("sbc"))
        val crude = ub.agg(
          (sum(col("e") * col("o")).cast("double") *
            sum((lit(1L) - col("e")) * (lit(1L) - col("o"))).cast("double") /
            (sum(col("e") * (lit(1L) - col("o"))).cast("double") *
              sum((lit(1L) - col("e")) * col("o")).cast("double")))
            .as("or_crude"))
        agg.crossJoin(broadcast(crude))
          .select(col("n_strata"),
            round((abs(col("sa").cast("double") - col("se")) - 0.5) *
              (abs(col("sa").cast("double") - col("se")) - 0.5) /
              col("sv"), 6).as("cmh_chi2"),
            round(col("sad") / col("sbc"), 6).as("or_mh"),
            round(col("or_crude"), 6).as("or_crude"),
            when((abs(col("sa").cast("double") - col("se")) - 0.5) *
              (abs(col("sa").cast("double") - col("se")) - 0.5) /
              col("sv") > 3.841459, "associated")
              .otherwise("no evidence").as("verdict"))
          .orderBy("n_strata")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS e,
             |        MAX(CASE WHEN event_type = 'error' AND value > 150.0
             |            THEN 1 ELSE 0 END) AS o
             |      FROM events GROUP BY 1),
             |qs AS (SELECT quantile_cont(act, [0.2, 0.4, 0.6, 0.8]) AS q FROM u),
             |ub AS (SELECT e, o,
             |        (CASE WHEN act > q[1] THEN 1 ELSE 0 END +
             |         CASE WHEN act > q[2] THEN 1 ELSE 0 END +
             |         CASE WHEN act > q[3] THEN 1 ELSE 0 END +
             |         CASE WHEN act > q[4] THEN 1 ELSE 0 END) AS st
             |      FROM u CROSS JOIN qs),
             |cells AS (SELECT st,
             |        CAST(SUM(e * o) AS BIGINT) AS a,
             |        CAST(SUM(e * (1 - o)) AS BIGINT) AS b,
             |        CAST(SUM((1 - e) * o) AS BIGINT) AS c,
             |        CAST(SUM((1 - e) * (1 - o)) AS BIGINT) AS d
             |      FROM ub GROUP BY 1),
             |ck AS (SELECT *, a + b + c + d AS nk FROM cells WHERE a + b + c + d > 1),
             |agg AS (SELECT COUNT(*) AS n_strata, CAST(SUM(a) AS BIGINT) AS sa,
             |        CAST(SUM(CAST(round(CAST(a + b AS DOUBLE) *
             |          CAST(a + c AS DOUBLE) / nk, 6) AS DECIMAL(18,6))) AS DOUBLE) AS se,
             |        CAST(SUM(CAST(round(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) *
             |          CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE) /
             |          (CAST(nk AS DOUBLE) * CAST(nk AS DOUBLE) *
             |            CAST(nk - 1 AS DOUBLE)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             |        CAST(SUM(CAST(round(CAST(a AS DOUBLE) * d / nk, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS sad,
             |        CAST(SUM(CAST(round(CAST(b AS DOUBLE) * c / nk, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS sbc
             |      FROM ck),
             |crude AS (SELECT CAST(SUM(e * o) AS DOUBLE) *
             |        CAST(SUM((1 - e) * (1 - o)) AS DOUBLE) /
             |        (CAST(SUM(e * (1 - o)) AS DOUBLE) *
             |          CAST(SUM((1 - e) * o) AS DOUBLE)) AS or_crude
             |      FROM ub)
             |SELECT n_strata,
             |  round((abs(CAST(sa AS DOUBLE) - se) - 0.5) *
             |    (abs(CAST(sa AS DOUBLE) - se) - 0.5) / sv, 6) AS cmh_chi2,
             |  round(sad / sbc, 6) AS or_mh,
             |  round(or_crude, 6) AS or_crude,
             |  CASE WHEN (abs(CAST(sa AS DOUBLE) - se) - 0.5) *
             |    (abs(CAST(sa AS DOUBLE) - se) - 0.5) / sv > 3.841459
             |    THEN 'associated' ELSE 'no evidence' END AS verdict
             |FROM agg CROSS JOIN crude ORDER BY n_strata""".stripMargin)),

    // Wald's sequential probability ratio test (Wald, AoMS 16, 1945) as
    // a daily A/B monitor — the SEQUENTIAL counterpart to the
    // fixed-horizon suite (x133/x148): each purchase is a Bernoulli
    // "came from arm B" trial (variant = user_id % 2, the x125
    // convention); H₀: θ = 0.5 vs H₁: θ = 0.6 (a 20% uplift), so the
    // cumulative log-likelihood ratio is a·ln(0.8) + b·ln(1.2),
    // monitored against Wald's boundaries ±ln((1−β)/α) at α = β = 0.05
    // — the test a dashboard evaluates EVERY day without the peeking
    // penalty fixed-horizon tests incur. Day cells are
    // calendar-bounded; the ln constants are rounded-6 and each day's
    // contribution is count·constant DECIMAL-summed in a cumulative
    // window over the day aggregate — the whole trajectory replays
    // bit-identically.
    QuerySpec(
      "x197_sprt",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val lnA = round(log(lit(0.8)), 6).cast("decimal(18,6)")
        val lnB = round(log(lit(1.2)), 6).cast("decimal(18,6)")
        val daily = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("a"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("b"))
        val wc = W.orderBy("day")
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        daily
          .withColumn("cum_a", sum(col("a")).over(wc))
          .withColumn("cum_b", sum(col("b")).over(wc))
          .withColumn("llr",
            (sum(col("a") * lnA + col("b") * lnB).over(wc))
              .cast("double"))
          .select(col("day"), col("cum_a"), col("cum_b"),
            round(col("llr"), 6).as("llr"),
            when(col("llr") >= 2.944439, "reject H0 (B wins)")
              .when(col("llr") <= -2.944439, "accept H0")
              .otherwise("continue").as("decision"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             |        SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
             |        SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS b
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |c AS (SELECT day,
             |        SUM(a) OVER w AS cum_a, SUM(b) OVER w AS cum_b,
             |        CAST(SUM(a * CAST(round(ln(0.8), 6) AS DECIMAL(18,6)) +
             |          b * CAST(round(ln(1.2), 6) AS DECIMAL(18,6))) OVER w
             |          AS DOUBLE) AS llr
             |      FROM daily
             |      WINDOW w AS (ORDER BY day
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT day, CAST(cum_a AS BIGINT) AS cum_a,
             |  CAST(cum_b AS BIGINT) AS cum_b, round(llr, 6) AS llr,
             |  CASE WHEN llr >= 2.944439 THEN 'reject H0 (B wins)'
             |       WHEN llr <= -2.944439 THEN 'accept H0'
             |       ELSE 'continue' END AS decision
             |FROM c ORDER BY day""".stripMargin)),

    // l-diversity + t-closeness audit (Machanavajjhala et al., TKDD 1,
    // 2007; Li, Li & Venkatasubramanian, ICDE 2007) — the two
    // sensitive-attribute reads x103's k-anonymity lacks: a class can
    // be k-anonymous yet reveal everyone's sensitive value if all k
    // rows share it (l = 1, the homogeneity attack), and diverse-but-
    // skewed classes still leak via distribution distance (t-closeness
    // = total-variation from the GLOBAL sensitive distribution; the
    // absent-item mass is 1 − the class's covered global mass, so no
    // class × full-vocab fan-out is needed). Quasi-identifiers =
    // (event_type, day-of-week, value decile); sensitive = the item.
    // Classes and items are both bounded vocabularies, so everything
    // past the one corpus aggregate is bounded-grid arithmetic;
    // per-class sums ride the DECIMAL bridge.
    QuerySpec(
      "x198_l_diversity",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"),
            dayofweek(col("ts")).as("dw"),
            least(floor(col("value") / 10.0).cast("int"), lit(9)).as("vb"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("item"))
          .filter(col("item").isNotNull)
          .localCheckpoint() // one scan feeds cells and the global dist
        val n = ev.agg(count(lit(1)).as("n"))
        val gi = ev.groupBy("item").agg(count(lit(1)).as("ci"))
          .crossJoin(broadcast(n))
          .select(col("item"),
            (col("ci").cast("double") / col("n").cast("double")).as("pi"))
        val cells = ev.groupBy("event_type", "dw", "vb", "item")
          .agg(count(lit(1)).as("cc"))
        val cls = cells.groupBy("event_type", "dw", "vb")
          .agg(sum(col("cc")).as("nc"), count(lit(1)).as("l"))
        val tvd = cells.join(cls, Seq("event_type", "dw", "vb"))
          .join(broadcast(gi), "item")
          .select(col("event_type"), col("dw"), col("vb"), col("nc"), col("l"),
            round(abs(col("cc").cast("double") / col("nc").cast("double") -
              col("pi")), 6).cast("decimal(18,6)").as("ad"),
            round(col("pi"), 6).cast("decimal(18,6)").as("cov"))
          .groupBy("event_type", "dw", "vb")
          .agg(max(col("nc")).as("nc"), max(col("l")).as("l"),
            round((sum(col("ad")).cast("double") +
              (lit(1.0) - sum(col("cov")).cast("double"))) / 2.0, 6)
              .as("tvd"))
        tvd.agg(count(lit(1)).as("n_classes"),
            sum(col("nc")).as("n_records"),
            min(col("l")).as("min_l"),
            sum(when(col("l") < 3, col("nc")).otherwise(0L))
              .as("rec_l_lt_3"),
            round(max(col("tvd")), 6).as("max_tvd"),
            sum(when(col("tvd") > 0.3, col("nc")).otherwise(0L))
              .as("rec_tvd_gt_03"))
          .select(col("n_classes"), col("n_records"), col("min_l"),
            round(col("rec_l_lt_3").cast("double") /
              col("n_records").cast("double"), 6).as("share_l_lt_3"),
            col("max_tvd"),
            round(col("rec_tvd_gt_03").cast("double") /
              col("n_records").cast("double"), 6).as("share_tvd_gt_03"))
          .orderBy("n_classes")
      },
      Some("""WITH ev AS (SELECT event_type, dayofweek(ts) AS dw,
             |        least(CAST(floor(value / 10.0) AS INT), 9) AS vb,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS item
             |      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |n AS (SELECT COUNT(*) AS n FROM ev),
             |gi AS (SELECT item, CAST(COUNT(*) AS DOUBLE) / CAST(n.n AS DOUBLE) AS pi
             |      FROM ev CROSS JOIN n GROUP BY item, n.n),
             |cells AS (SELECT event_type, dw, vb, item, COUNT(*) AS cc
             |      FROM ev GROUP BY 1, 2, 3, 4),
             |cls AS (SELECT event_type, dw, vb, SUM(cc) AS nc, COUNT(*) AS l
             |      FROM cells GROUP BY 1, 2, 3),
             |tv AS (SELECT c.event_type, c.dw, c.vb, MAX(cl.nc) AS nc,
             |        MAX(cl.l) AS l,
             |        round((CAST(SUM(CAST(round(abs(CAST(c.cc AS DOUBLE) /
             |            CAST(cl.nc AS DOUBLE) - gi.pi), 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) +
             |          (1.0 - CAST(SUM(CAST(round(gi.pi, 6) AS DECIMAL(18,6)))
             |            AS DOUBLE))) / 2.0, 6) AS tvd
             |      FROM cells c
             |      JOIN cls cl USING (event_type, dw, vb)
             |      JOIN gi USING (item)
             |      GROUP BY 1, 2, 3)
             |SELECT COUNT(*) AS n_classes, CAST(SUM(nc) AS BIGINT) AS n_records,
             |  CAST(MIN(l) AS BIGINT) AS min_l,
             |  round(CAST(SUM(CASE WHEN l < 3 THEN nc ELSE 0 END) AS DOUBLE) /
             |    CAST(SUM(nc) AS DOUBLE), 6) AS share_l_lt_3,
             |  round(MAX(tvd), 6) AS max_tvd,
             |  round(CAST(SUM(CASE WHEN tvd > 0.3 THEN nc ELSE 0 END) AS DOUBLE) /
             |    CAST(SUM(nc) AS DOUBLE), 6) AS share_tvd_gt_03
             |FROM tv ORDER BY n_classes""".stripMargin)),

    // Community conductance (Shi & Malik's normalized-cut objective,
    // PAMI 2000; the community-QUALITY read Leskovec et al.'s NCP plots
    // made standard): for each x120 LPA community S,
    // φ(S) = cut(S) / min(vol(S), vol(V∖S)) — LOW φ = a real community
    // (few escaping edges for its mass), φ → 1 = a label that doesn't
    // bound anything. This is the missing audit BEHIND the detection
    // ops: x120/x170 emit labels, nothing previously said whether the
    // labels mean anything. All weighted degrees/cuts are exact
    // integer sums over the directed edge list joined to the label
    // table twice (slim equi-joins, the x183 shape); conductance is
    // one rational division per community.
    QuerySpec(
      "x199_conductance",
      (s, dir) => {
        val edges = itemEdges(s, dir, 3).localCheckpoint()
        val lab = Graph.labelPropagation(edges, rounds = 3)
        val ed = edges
          .join(lab.select(col("v").as("src"), col("lab").as("ls")), "src")
          .join(lab.select(col("v").as("dst"), col("lab").as("ld")), "dst")
        val vol = ed.groupBy("ls").agg(sum(col("w")).as("vol"),
          sum(when(col("ls") =!= col("ld"), col("w")).otherwise(0L))
            .as("cut"))
        val tot = vol.agg(sum(col("vol")).as("volT"))
        val nn = lab.groupBy("lab").agg(count(lit(1)).as("n_nodes"))
        vol.join(nn, col("ls") === col("lab"))
          .crossJoin(broadcast(tot))
          .filter(col("n_nodes") >= 2)
          .select(col("ls").as("community"), col("n_nodes"), col("vol"),
            col("cut"),
            when(least(col("vol"), col("volT") - col("vol")) > 0,
              round(col("cut").cast("double") /
                least(col("vol"), col("volT") - col("vol")).cast("double"), 6))
              .as("conductance"))
          .orderBy("community")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst, w FROM pc UNION ALL SELECT ib, ia, w FROM pc),
             |lab0 AS (SELECT DISTINCT src AS v, src AS lab FROM e),
             |s1 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab0 l ON l.v = e.src GROUP BY 1, 2),
             |lab1 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s1)
             |  WHERE rn = 1),
             |s2 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab1 l ON l.v = e.src GROUP BY 1, 2),
             |lab2 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s2)
             |  WHERE rn = 1),
             |s3 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab2 l ON l.v = e.src GROUP BY 1, 2),
             |lab3 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s3)
             |  WHERE rn = 1),
             |ed AS (SELECT e.src, e.dst, e.w, a.lab AS ls, b.lab AS ld
             |      FROM e JOIN lab3 a ON a.v = e.src JOIN lab3 b ON b.v = e.dst),
             |vol AS (SELECT ls, SUM(w) AS vol,
             |        SUM(CASE WHEN ls <> ld THEN w ELSE 0 END) AS cut
             |      FROM ed GROUP BY 1),
             |tot AS (SELECT SUM(vol) AS volT FROM vol),
             |nn AS (SELECT lab, COUNT(*) AS n_nodes FROM lab3 GROUP BY 1)
             |SELECT vol.ls AS community, nn.n_nodes,
             |  CAST(vol.vol AS BIGINT) AS vol, CAST(vol.cut AS BIGINT) AS cut,
             |  CASE WHEN least(vol.vol, tot.volT - vol.vol) > 0 THEN
             |    round(CAST(vol.cut AS DOUBLE) /
             |      CAST(least(vol.vol, tot.volT - vol.vol) AS DOUBLE), 6) END AS conductance
             |FROM vol JOIN nn ON nn.lab = vol.ls CROSS JOIN tot
             |WHERE nn.n_nodes >= 2 ORDER BY community""".stripMargin)),

    // Greedy facility-location selection (Nemhauser, Wolsey & Fisher,
    // Math. Prog. 14, 1978: the greedy (1 − 1/e) guarantee for monotone
    // submodular maximization) — the data-SUBSET-selection primitive
    // complementing x113's k-center (max-min distance) with the
    // max-COVERAGE objective F(S) = Σ_probe max_{c∈S} sim(p, c): pick
    // k = 4 representatives whose combined similarity coverage of a
    // probe set is maximal, the device behind representative-subset /
    // coreset curation. Shapes: candidates (32) and probes (128) are
    // seeded-hash picks, so the sim matrix is a BOUNDED 4,096-pair
    // broadcast cross — at any corpus size; each greedy round is one
    // bounded groupBy + a 1-ROW collect (driver state = k ids, the
    // x52-fixed bounded-collect discipline). Sims rounded-4 (x5
    // precedent), marginal gains DECIMAL-summed; already-selected
    // candidates are excluded from later rounds on both engines.
    QuerySpec(
      "x200_facility_location",
      (s, dir) => {
        def pick(tag: String, nn: Int) = Tables.embeddings(s, dir)
          .withColumn("h", md5(concat(lit(tag), col("vec_id").cast("string"))))
          .orderBy("h", "vec_id").limit(nn)
        val cands = pick("fac:c:", 32)
          .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
        val probes = pick("fac:p:", 128)
          .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
        val sims = probes.crossJoin(broadcast(cands))
          .select(col("pid"), col("cid"),
            Similarity.cosine(col("pemb"), col("cemb")).as("sim"))
          .localCheckpoint() // the 4,096-pair matrix feeds all 4 rounds
        var best = sims.select(col("pid")).distinct()
          .withColumn("b", lit(0.0))
        var selected = List.empty[Long]
        val rows = (1 to 4).map { r =>
          val gains = sims
            .filter(!col("cid").isin(selected: _*))
            .join(best, "pid")
            .groupBy("cid")
            .agg(sum(round(greatest(col("sim") - col("b"), lit(0.0)), 6)
              .cast("decimal(18,6)")).cast("double").as("g"))
          // bounded driver state: ONE row per round (k = 4 total)
          val top = gains.orderBy(col("g").desc, col("cid")).limit(1)
            .collect()(0)
          val cid = top.getLong(0)
          selected = selected :+ cid
          best = best.join(
              sims.filter(col("cid") === cid).select(col("pid"), col("sim")),
              "pid")
            .select(col("pid"), greatest(col("b"), col("sim")).as("b"))
            .localCheckpoint()
          val obj = best
            .agg(sum(round(col("b"), 6).cast("decimal(18,6)")).cast("double"))
            .head().getDouble(0)
          (r.toLong, cid, top.getDouble(1), obj)
        }
        import s.implicits._
        rows.toDF("round", "cand_id", "gain", "objective")
          .select(col("round"), col("cand_id"),
            round(col("gain"), 6).as("gain"),
            round(col("objective"), 6).as("objective"))
          .orderBy("round")
      },
      Some("""WITH ec AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb
             |      FROM embeddings),
             |nc AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM ec),
             |cands AS (SELECT vec_id AS cid, emb, nrm FROM (
             |      SELECT vec_id, emb, nrm,
             |        md5(concat('fac:c:', CAST(vec_id AS VARCHAR))) AS h
             |      FROM nc) ORDER BY h, cid LIMIT 32),
             |probes AS (SELECT vec_id AS pid, emb, nrm FROM (
             |      SELECT vec_id, emb, nrm,
             |        md5(concat('fac:p:', CAST(vec_id AS VARCHAR))) AS h
             |      FROM nc) ORDER BY h, pid LIMIT 128),
             |f AS (SELECT p.pid, c.cid, p.nrm AS pn, c.nrm AS cn,
             |        unnest(p.emb) AS pv, unnest(c.emb) AS cv
             |      FROM probes p CROSS JOIN cands c),
             |sims AS (SELECT pid, cid,
             |        round(sum(pv * cv) / (any_value(pn) * any_value(cn)), 4) AS sim
             |      FROM f GROUP BY pid, cid),
             |g1 AS (SELECT cid, CAST(SUM(CAST(round(greatest(sim - 0.0, 0.0), 6)
             |        AS DECIMAL(18,6))) AS DOUBLE) AS g
             |      FROM sims GROUP BY 1),
             |c1 AS (SELECT cid, g FROM g1 ORDER BY g DESC, cid LIMIT 1),
             |b1 AS (SELECT s.pid, greatest(MAX(CASE WHEN s.cid = c1.cid
             |          THEN s.sim END), 0.0) AS b
             |      FROM sims s CROSS JOIN c1 GROUP BY 1),
             |o1 AS (SELECT CAST(SUM(CAST(round(b, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |        AS obj FROM b1),
             |g2 AS (SELECT s.cid, CAST(SUM(CAST(round(greatest(s.sim - b1.b, 0.0), 6)
             |        AS DECIMAL(18,6))) AS DOUBLE) AS g
             |      FROM sims s JOIN b1 USING (pid) CROSS JOIN c1
             |      WHERE s.cid <> c1.cid GROUP BY 1),
             |c2 AS (SELECT cid, g FROM g2 ORDER BY g DESC, cid LIMIT 1),
             |b2 AS (SELECT b1.pid, greatest(b1.b, coalesce(MAX(CASE WHEN s.cid = c2.cid
             |          THEN s.sim END), -1.0)) AS b
             |      FROM b1 JOIN sims s USING (pid) CROSS JOIN c2 GROUP BY b1.pid, b1.b),
             |o2 AS (SELECT CAST(SUM(CAST(round(b, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |        AS obj FROM b2),
             |g3 AS (SELECT s.cid, CAST(SUM(CAST(round(greatest(s.sim - b2.b, 0.0), 6)
             |        AS DECIMAL(18,6))) AS DOUBLE) AS g
             |      FROM sims s JOIN b2 USING (pid) CROSS JOIN c1 CROSS JOIN c2
             |      WHERE s.cid <> c1.cid AND s.cid <> c2.cid GROUP BY 1),
             |c3 AS (SELECT cid, g FROM g3 ORDER BY g DESC, cid LIMIT 1),
             |b3 AS (SELECT b2.pid, greatest(b2.b, coalesce(MAX(CASE WHEN s.cid = c3.cid
             |          THEN s.sim END), -1.0)) AS b
             |      FROM b2 JOIN sims s USING (pid) CROSS JOIN c3 GROUP BY b2.pid, b2.b),
             |o3 AS (SELECT CAST(SUM(CAST(round(b, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |        AS obj FROM b3),
             |g4 AS (SELECT s.cid, CAST(SUM(CAST(round(greatest(s.sim - b3.b, 0.0), 6)
             |        AS DECIMAL(18,6))) AS DOUBLE) AS g
             |      FROM sims s JOIN b3 USING (pid)
             |      CROSS JOIN c1 CROSS JOIN c2 CROSS JOIN c3
             |      WHERE s.cid <> c1.cid AND s.cid <> c2.cid AND s.cid <> c3.cid
             |      GROUP BY 1),
             |c4 AS (SELECT cid, g FROM g4 ORDER BY g DESC, cid LIMIT 1),
             |b4 AS (SELECT b3.pid, greatest(b3.b, coalesce(MAX(CASE WHEN s.cid = c4.cid
             |          THEN s.sim END), -1.0)) AS b
             |      FROM b3 JOIN sims s USING (pid) CROSS JOIN c4 GROUP BY b3.pid, b3.b),
             |o4 AS (SELECT CAST(SUM(CAST(round(b, 6) AS DECIMAL(18,6))) AS DOUBLE)
             |        AS obj FROM b4)
             |SELECT CAST(1 AS BIGINT) AS round, c1.cid AS cand_id,
             |  round(c1.g, 6) AS gain, round(o1.obj, 6) AS objective
             |FROM c1 CROSS JOIN o1
             |UNION ALL SELECT 2, c2.cid, round(c2.g, 6), round(o2.obj, 6)
             |FROM c2 CROSS JOIN o2
             |UNION ALL SELECT 3, c3.cid, round(c3.g, 6), round(o3.obj, 6)
             |FROM c3 CROSS JOIN o3
             |UNION ALL SELECT 4, c4.cid, round(c4.g, 6), round(o4.obj, 6)
             |FROM c4 CROSS JOIN o4
             |ORDER BY round""".stripMargin)),

    // All-pairs set-similarity self-join with PREFIX FILTERING
    // (Chaudhuri, Ganti & Kaushik, ICDE 2006 "A Primitive Operator for
    // Similarity Joins"; Bayardo, Ma & Srikant, WWW 2007; Xiao et al.,
    // WWW 2008 PPJoin) — the EXACT counterpart to the approximate LSH
    // dedup (x2): for Jaccard ≥ t over word-trigram shingle sets, any
    // qualifying pair must share a token in each side's (|d|−⌈t·|d|⌉+1)-
    // token prefix when tokens are ordered rarest-first, so candidate
    // generation is an equi-join on PREFIX tokens only — never all
    // pairs — and rare-first ordering makes prefix postings lists the
    // SHORTEST ones. The length filter t·max(|a|,|b|) ≤ min(|a|,|b|)
    // prunes further before verification. Rarity order is (df ASC,
    // token ASC) computed per-doc via a window — no global rank/sort
    // anywhere, so the plan is shuffle-bounded by the prefix-posting
    // join at any scale. Verification is exact: candidates re-join the
    // full shingle sets for the true intersection. Jaccard is a single
    // integer-ratio division rounded to 4 — engine-identical.
    QuerySpec(
      "x201_allpairs_prefix",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val t = 0.6
        val sh = Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(ws)-3), " +
              "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("t"))
          .distinct()
          .localCheckpoint() // feeds df, sizes, prefixes, and verification
        val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val df = sh.groupBy("t").agg(count(lit(1)).as("df"))
        val pref = sh.join(df, "t").join(sz, "doc_id")
          .select(col("doc_id"), col("t"), col("sz"),
            row_number().over(
              W.partitionBy("doc_id").orderBy("df", "t")).as("pos"))
          .filter(col("pos") <=
            col("sz") - ceil(col("sz") * t).cast("long") + 1)
        val cand = pref.as("a").join(pref.as("b"),
            col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id") &&
              least(col("a.sz"), col("b.sz")) >=
                greatest(col("a.sz"), col("b.sz")) * t)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sz").as("sa"), col("b.sz").as("sb"))
          .distinct()
        cand
          .join(sh.as("t1"), col("doc_a") === col("t1.doc_id"))
          .join(sh.as("t2"),
            col("doc_b") === col("t2.doc_id") && col("t1.t") === col("t2.t"))
          .groupBy("doc_a", "doc_b", "sa", "sb")
          .agg(count(lit(1)).as("ic"))
          .select(col("doc_a"), col("doc_b"),
            round(col("ic").cast("double") /
              (col("sa") + col("sb") - col("ic")), 4).as("jaccard"))
          .filter(col("jaccard") >= t)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS t
             |      FROM w, unnest(range(1, len(ws) - 1)) AS r(i)
             |      WHERE len(ws) >= 3),
             |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |dfq AS (SELECT t, COUNT(*) AS df FROM sh GROUP BY 1),
             |ord AS (SELECT s.doc_id, s.t, z.sz,
             |        row_number() OVER (PARTITION BY s.doc_id
             |          ORDER BY d.df, s.t) AS pos
             |      FROM sh s JOIN dfq d ON s.t = d.t
             |        JOIN sz z ON s.doc_id = z.doc_id),
             |pref AS (SELECT * FROM ord
             |      WHERE pos <= sz - CAST(ceil(sz * 0.6) AS BIGINT) + 1),
             |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |        a.sz AS sa, b.sz AS sb
             |      FROM pref a JOIN pref b
             |        ON a.t = b.t AND a.doc_id < b.doc_id
             |      WHERE least(a.sz, b.sz) >= greatest(a.sz, b.sz) * 0.6),
             |inter AS (SELECT c.doc_a, c.doc_b, c.sa, c.sb, COUNT(*) AS ic
             |      FROM cand c JOIN sh t1 ON t1.doc_id = c.doc_a
             |        JOIN sh t2 ON t2.doc_id = c.doc_b AND t2.t = t1.t
             |      GROUP BY 1, 2, 3, 4)
             |SELECT doc_a, doc_b,
             |  round(CAST(ic AS DOUBLE) / (sa + sb - ic), 4) AS jaccard
             |FROM inter
             |WHERE round(CAST(ic AS DOUBLE) / (sa + sb - ic), 4) >= 0.6
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Log-rank test (Mantel, Cancer Chemother Rep 50, 1966; Peto & Peto,
    // JRSS-A 135, 1972): does time-to-first-error differ between the two
    // experiment arms (user_id parity, the x125 convention)? The
    // censoring-correct counterpart to comparing the x124 Kaplan-Meier
    // curves by eye: at each distinct event time the observed arm-B
    // deaths are compared to the hypergeometric expectation d·n1/n given
    // the at-risk sets, and O−E sums to a 1-df χ². At-risk counts come
    // from a reverse-cumulative window over the |distinct t|×2 grid —
    // the x124 aggregate-bounded device, never a per-subject rescan —
    // and the E/V terms are rounded-6 DECIMAL-summed, so the statistic
    // replays bit-identically. One shuffle to the per-user span, one to
    // the (t, arm) grid; everything after is aggregate-sized.
    QuerySpec(
      "x202_logrank",
      (s, dir) => {
        val (byTime, arms) = armRiskGrid(s, dir)
        byTime.agg(
            sum(col("d1")).as("o1"),
            sum(round(col("dt").cast("double") * col("n1") / col("nt"), 6)
              .cast("decimal(18,6)")).cast("double").as("e1"),
            sum(round(col("dt").cast("double") *
              (col("n1").cast("double") / col("nt")) *
              (lit(1.0) - col("n1").cast("double") / col("nt")) *
              (col("nt") - col("dt")).cast("double") / (col("nt") - 1), 6)
              .cast("decimal(18,6)")).cast("double").as("v"))
          .crossJoin(broadcast(arms))
          .select(col("n_a"), col("n_b"), col("o1"),
            round(col("e1"), 6).as("e1"), round(col("v"), 6).as("v"),
            round((col("o1").cast("double") - col("e1")) *
              (col("o1").cast("double") - col("e1")) / col("v"), 6)
              .as("chi2"),
            when((col("o1").cast("double") - col("e1")) *
              (col("o1").cast("double") - col("e1")) / col("v") > 3.841459,
              "curves differ").otherwise("no evidence").as("verdict"))
      },
      Some("""WITH span AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             |        MIN(CASE WHEN event_type = 'error'
             |                 THEN CAST(ts AS DATE) END) AS e
             |      FROM events GROUP BY 1),
             |gm AS (SELECT MAX(greatest(f, e)) AS gmax FROM span),
             |subj AS (SELECT CAST(user_id % 2 AS BIGINT) AS g,
             |        CAST(CASE WHEN e IS NOT NULL THEN datediff('day', f, e)
             |             ELSE datediff('day', f, gm.gmax) END AS BIGINT) AS t,
             |        CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS obs
             |      FROM span CROSS JOIN gm),
             |ptg AS (SELECT t, g, SUM(obs) AS d, SUM(1 - obs) AS c
             |      FROM subj GROUP BY 1, 2),
             |tot AS (SELECT g, COUNT(*) AS ng FROM subj GROUP BY 1),
             |grid AS (SELECT ts.t, gs.g, COALESCE(p.d, 0) AS d,
             |        COALESCE(p.c, 0) AS c
             |      FROM (SELECT DISTINCT t FROM ptg) ts
             |      CROSS JOIN (SELECT DISTINCT g FROM subj) gs
             |      LEFT JOIN ptg p ON p.t = ts.t AND p.g = gs.g),
             |ar AS (SELECT grid.t, grid.g, grid.d,
             |        tot.ng - COALESCE(SUM(grid.d + grid.c)
             |          OVER (PARTITION BY grid.g ORDER BY grid.t
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) AS nr
             |      FROM grid JOIN tot ON tot.g = grid.g),
             |bt AS (SELECT t,
             |        SUM(CASE WHEN g = 1 THEN d ELSE 0 END) AS d1,
             |        SUM(d) AS dt,
             |        SUM(CASE WHEN g = 1 THEN nr ELSE 0 END) AS n1,
             |        SUM(nr) AS nt
             |      FROM ar GROUP BY 1),
             |ft AS (SELECT * FROM bt WHERE dt > 0 AND nt > 1),
             |agg AS (SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             |        CAST(SUM(CAST(round(CAST(dt AS DOUBLE) * n1 / nt, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS e1,
             |        CAST(SUM(CAST(round(CAST(dt AS DOUBLE) *
             |          (CAST(n1 AS DOUBLE) / nt) *
             |          (1.0 - CAST(n1 AS DOUBLE) / nt) *
             |          CAST(nt - dt AS DOUBLE) / (nt - 1), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS v
             |      FROM ft),
             |arms AS (SELECT
             |        CAST(SUM(CASE WHEN g = 0 THEN ng ELSE 0 END) AS BIGINT) AS n_a,
             |        CAST(SUM(CASE WHEN g = 1 THEN ng ELSE 0 END) AS BIGINT) AS n_b
             |      FROM tot)
             |SELECT n_a, n_b, o1, round(e1, 6) AS e1, round(v, 6) AS v,
             |  round((CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v,
             |    6) AS chi2,
             |  CASE WHEN (CAST(o1 AS DOUBLE) - e1) *
             |    (CAST(o1 AS DOUBLE) - e1) / v > 3.841459
             |    THEN 'curves differ' ELSE 'no evidence' END AS verdict
             |FROM agg CROSS JOIN arms""".stripMargin)),

    // Isotonic regression via the MAX-MIN saddle formula (Ayer et al.,
    // AoMS 26, 1955; Barlow & Brunk, JASA 67, 1972): the monotone
    // recalibration x165's ECE only DIAGNOSES. Predictor = event value
    // in 20 equal-width bins, outcome = is-purchase; the isotonic fit at
    // bin i is max_{j≤i} min_{k≥i} mean(y[j..k]) — identical to the PAVA
    // pool but expressible as pure joins over the CUMULATIVE bin
    // moments, no sequential pooling loop. Every block mean is a ratio
    // of BIGINT differences (purchases/events over a bin run), so each
    // candidate value is one IEEE divide and the min/max lattice is
    // engine-exact. Scale shape: one data-scan groupBy to 20 bin rows;
    // the j×k×i lattice (≤B³=8000 rows) lives entirely on
    // aggregate-bounded broadcast frames.
    QuerySpec(
      "x203_isotonic",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val mx = Tables.events(s, dir).agg(max(col("value")).as("mx"))
        val bins = Tables.events(s, dir).crossJoin(broadcast(mx))
          .select(least(floor(col("value") / col("mx") * 20), lit(19L))
            .as("bin"),
            (col("event_type") === "purchase").cast("long").as("y"))
          .groupBy("bin")
          .agg(count(lit(1)).as("w"), sum(col("y")).as("p"))
        val wc = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        val cum = bins
          .select(col("bin"), col("w"), col("p"),
            sum(col("w")).over(wc).as("cw"), sum(col("p")).over(wc).as("cp"))
          .localCheckpoint() // 20 rows feed the j/k/i lattice three ways
        val pairs = cum.as("j").crossJoin(broadcast(cum.as("k")))
          .filter(col("j.bin") <= col("k.bin"))
          .select(col("j.bin").as("jb"), col("k.bin").as("kb"),
            ((col("k.cp") - col("j.cp") + col("j.p")).cast("double") /
              (col("k.cw") - col("j.cw") + col("j.w"))).as("a"))
        cum.select(col("bin"), col("w"), col("p"))
          .crossJoin(broadcast(pairs))
          .filter(col("jb") <= col("bin") && col("kb") >= col("bin"))
          .groupBy("bin", "w", "p", "jb")
          .agg(min(col("a")).as("ma"))
          .groupBy("bin", "w", "p")
          .agg(max(col("ma")).as("fit"))
          .select(col("bin"), col("w").as("n_events"),
            round(col("p").cast("double") / col("w"), 6).as("raw_rate"),
            round(col("fit"), 6).as("iso_rate"))
          .orderBy("bin")
      },
      Some("""WITH mx AS (SELECT MAX(value) AS mx FROM events),
             |b AS (SELECT least(CAST(floor(value / mx.mx * 20) AS BIGINT),
             |          19) AS bin,
             |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             |      FROM events CROSS JOIN mx),
             |bins AS (SELECT bin, COUNT(*) AS w, SUM(y) AS p
             |      FROM b GROUP BY 1),
             |cum AS (SELECT bin, w, p,
             |        SUM(w) OVER (ORDER BY bin
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             |        SUM(p) OVER (ORDER BY bin
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
             |      FROM bins),
             |pairs AS (SELECT j.bin AS jb, k.bin AS kb,
             |        CAST(k.cp - j.cp + j.p AS DOUBLE) /
             |          (k.cw - j.cw + j.w) AS a
             |      FROM cum j JOIN cum k ON j.bin <= k.bin),
             |mm AS (SELECT c.bin, c.w, c.p, pr.jb, MIN(pr.a) AS ma
             |      FROM cum c JOIN pairs pr
             |        ON pr.jb <= c.bin AND pr.kb >= c.bin
             |      GROUP BY 1, 2, 3, 4),
             |fit AS (SELECT bin, w, p, MAX(ma) AS fit FROM mm
             |      GROUP BY 1, 2, 3)
             |SELECT bin, CAST(w AS BIGINT) AS n_events,
             |  round(CAST(p AS DOUBLE) / w, 6) AS raw_rate,
             |  round(fit, 6) AS iso_rate
             |FROM fit ORDER BY bin""".stripMargin)),

    // Kruskal-Wallis H (Kruskal & Wallis, JASA 47, 1952): the k-sample
    // rank ANOVA — x135's Mann-Whitney generalized past two groups and
    // x157's ANOVA freed of the normality assumption. Do the five event
    // types draw `value` from one distribution? Ranks are average-ranks
    // over value-cents (an exact monotone recode of the 2-dp values);
    // per-group rank sums use the two-level bucketed countBelow device
    // (x165/x166/x168) so no global sort exists at any scale. Every
    // per-row rank is an exact multiple of 0.5 far below 2^52, so the
    // rank-sum aggregation is EXACT in any order (no ulp, no bridge);
    // only the 5-row Σ R_g²/n_g reduction — magnitudes up to ~1e15 at
    // scale — rides a DECIMAL(38,6) bridge. Tie correction from the
    // Σ(t³−t) BIGINT moment.
    QuerySpec(
      "x204_kruskal_wallis",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("vk"))
        val grid = ev.groupBy("vk").agg(count(lit(1)).as("c"))
        val cb = countBelow(grid, "vk")
        val rg = ev.groupBy("event_type", "vk").agg(count(lit(1)).as("cg"))
          .join(cb, "vk")
          .groupBy("event_type")
          .agg(sum(col("cg")).as("ng"),
            sum(col("cg").cast("double") *
              (col("below") + (col("c") + lit(1L)) / lit(2.0))).as("rg"))
        val nn = ev.agg(count(lit(1)).as("n"))
        val ties = grid.agg(
          sum(col("c") * col("c") * col("c") - col("c")).as("tt"))
        rg.groupBy()
          .agg(count(lit(1)).as("n_groups"),
            sum(round(col("rg") * col("rg") / col("ng"), 6)
              .cast("decimal(38,6)")).cast("double").as("srr"))
          .crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
          .select(col("n"), col("n_groups"),
            round(lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
              col("srr") - lit(3.0) * (col("n") + 1), 6).as("h"),
            round((lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
              col("srr") - lit(3.0) * (col("n") + 1)) /
              (lit(1.0) - col("tt").cast("double") /
                (col("n").cast("double") * col("n") * col("n") - col("n"))),
              6).as("h_corrected"),
            when((lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
              col("srr") - lit(3.0) * (col("n") + 1)) /
              (lit(1.0) - col("tt").cast("double") /
                (col("n").cast("double") * col("n") * col("n") - col("n")))
              > 9.487729, "distributions differ")
              .otherwise("no evidence").as("verdict"))
      },
      Some("""WITH ev AS (SELECT event_type,
             |        CAST(round(value * 100) AS BIGINT) AS vk FROM events),
             |grid AS (SELECT vk, COUNT(*) AS c FROM ev GROUP BY 1),
             |cb AS (SELECT vk, c, COALESCE(SUM(c) OVER (ORDER BY vk
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |        AS below FROM grid),
             |gv AS (SELECT event_type, vk, COUNT(*) AS cg
             |      FROM ev GROUP BY 1, 2),
             |rg AS (SELECT event_type, SUM(cg) AS ng,
             |        SUM(CAST(cg AS DOUBLE) * (below + (c + 1) / 2.0)) AS rg
             |      FROM gv JOIN cb USING (vk) GROUP BY 1),
             |nn AS (SELECT COUNT(*) AS n FROM ev),
             |ties AS (SELECT SUM(c * c * c - c) AS tt FROM grid),
             |hh AS (SELECT COUNT(*) AS n_groups,
             |        CAST(SUM(CAST(round(rg * rg / ng, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS srr FROM rg)
             |SELECT n, n_groups,
             |  round(12.0 / (CAST(n AS DOUBLE) * (n + 1)) * srr
             |    - 3.0 * (n + 1), 6) AS h,
             |  round((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * srr
             |    - 3.0 * (n + 1)) /
             |    (1.0 - CAST(tt AS DOUBLE) /
             |      (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_corrected,
             |  CASE WHEN (12.0 / (CAST(n AS DOUBLE) * (n + 1)) * srr
             |    - 3.0 * (n + 1)) /
             |    (1.0 - CAST(tt AS DOUBLE) /
             |      (CAST(n AS DOUBLE) * n * n - n)) > 9.487729
             |    THEN 'distributions differ' ELSE 'no evidence' END AS verdict
             |FROM hh CROSS JOIN nn CROSS JOIN ties""".stripMargin)),

    // KMV / k-minimum-values distinct sketch (Bar-Yossef et al., RANDOM
    // 2002; Beyer et al., SIGMOD 2007): estimate distinct users per
    // event type from only the k=128 SMALLEST 48-bit key hashes —
    // D̂ = (k−1)/U_(k) with U_(k) the k-th order statistic of the
    // hash-uniformized keys. The order-statistics cousin of the HLL the
    // suite already has (x46/x169): unlike HLL its sketch is a plain
    // sorted id set, so it also answers set EXPRESSIONS (the Beyer
    // result) — and the k-th-smallest-per-group plan is a rank-window
    // Spark executes as WindowGroupLimit: per-partition top-k then a
    // k-row merge, never a per-group full sort. 48-bit prefixes divide
    // 2^48 exactly (both constants exact in double), one divide per
    // group — engine-identical. Exact distinct rides along; the
    // estimate falls back to exact when a group holds < k keys (the
    // sf0.001 warm path).
    QuerySpec(
      "x205_kmv_distinct",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val k = 128
        val h = Tables.events(s, dir)
          .select(col("event_type"),
            conv(substring(md5(concat(lit("kmv:"),
              col("user_id").cast("string"))), 1, 12), 16, 10)
              .cast("long").as("h"))
          .distinct()
        val kth = h
          .withColumn("rn",
            row_number().over(W.partitionBy("event_type").orderBy("h")))
          .filter(col("rn") <= k).filter(col("rn") === k)
          .select(col("event_type"), col("h").as("hk"))
        val ex = Tables.events(s, dir).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"))
        ex.join(kth, Seq("event_type"), "left")
          .select(col("event_type"), col("n_exact"),
            coalesce(col("hk"), lit(-1L)).as("kth_hash"),
            when(col("hk").isNotNull,
              round(lit(35747322042253312.0) / col("hk"), 2))
              .otherwise(col("n_exact").cast("double")).as("est"),
            round((when(col("hk").isNotNull,
              round(lit(35747322042253312.0) / col("hk"), 2))
              .otherwise(col("n_exact").cast("double")) -
              col("n_exact").cast("double")) / col("n_exact"), 6)
              .as("rel_err"))
          .orderBy("event_type")
      },
      Some("""WITH h AS (SELECT DISTINCT event_type,
             |        CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
             |          1, 12)) AS BIGINT) AS h
             |      FROM events),
             |rk AS (SELECT event_type, h,
             |        row_number() OVER (PARTITION BY event_type ORDER BY h)
             |          AS rn FROM h),
             |kth AS (SELECT event_type, h AS hk FROM rk WHERE rn = 128),
             |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
             |      FROM events GROUP BY 1),
             |j AS (SELECT ex.event_type, ex.n_exact, kth.hk
             |      FROM ex LEFT JOIN kth ON ex.event_type = kth.event_type),
             |e AS (SELECT event_type, n_exact,
             |        COALESCE(hk, -1) AS kth_hash,
             |        CASE WHEN hk IS NOT NULL
             |             THEN round(35747322042253312.0 / hk, 2)
             |             ELSE CAST(n_exact AS DOUBLE) END AS est
             |      FROM j)
             |SELECT event_type, n_exact, kth_hash, est,
             |  round((est - CAST(n_exact AS DOUBLE)) / n_exact, 6) AS rel_err
             |FROM e ORDER BY event_type""".stripMargin)),

    // Link prediction by local neighborhood scores (Liben-Nowell &
    // Kleinberg, CIKM 2003): for item pairs NOT yet co-occurring, rank
    // the missing edges by common-neighbor count, neighborhood Jaccard,
    // and Adamic-Adar Σ 1/ln(deg z) — AA's rare-neighbor weighting is
    // the classic refinement over raw CN. Same x114 co-occurrence graph
    // (same-basket pairs, weight ≥ 3). Scale shape: candidates come
    // only from WEDGES (adjacency self-join a–z–b) with the existing
    // edge anti-joined out — never from the item×item square; per-z AA
    // weights are rounded-6 DECIMALs keyed by the z-degree table, so
    // the per-pair sum is order-exact; top-20 is a global
    // TakeOrderedAndProject. Deterministic tie-break (aa, a, b).
    QuerySpec(
      "x206_link_prediction",
      (s, dir) => {
        val und = itemPairs(s, dir, 3)
          .select(col("ia").as("ea"), col("ib").as("eb"))
          .localCheckpoint() // feeds adjacency, anti-join, and degrees
        val adj = und.select(col("ea").as("u"), col("eb").as("v"))
          .unionByName(und.select(col("eb").as("u"), col("ea").as("v")))
        val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
        val wz = deg.select(col("u").as("z"),
          round(lit(1.0) / log(col("deg").cast("double")), 6)
            .cast("decimal(18,6)").as("wz"))
        val wedges = adj.as("e1").join(adj.as("e2"),
            col("e1.v") === col("e2.u") && col("e1.u") < col("e2.v"))
          .select(col("e1.u").as("a"), col("e2.v").as("b"),
            col("e1.v").as("z"))
        val open = wedges.join(und,
          col("a") === col("ea") && col("b") === col("eb"), "left_anti")
        open.join(wz, "z")
          .groupBy("a", "b")
          .agg(count(lit(1)).as("cn"),
            sum(col("wz")).cast("double").as("aa"))
          .join(deg.as("da"), col("a") === col("da.u"))
          .join(deg.as("db"), col("b") === col("db.u"))
          .select(col("a"), col("b"), col("cn"),
            round(col("cn").cast("double") /
              (col("da.deg") + col("db.deg") - col("cn")), 4).as("jaccard"),
            round(col("aa"), 6).as("aa"))
          .orderBy(col("aa").desc, col("a"), col("b"))
          .limit(20)
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |und AS (SELECT a.item AS ea, b.item AS eb
             |        FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |          AND a.day = b.day AND a.item < b.item
             |        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |adj AS (SELECT ea AS u, eb AS v FROM und
             |        UNION ALL SELECT eb, ea FROM und),
             |deg AS (SELECT u, COUNT(*) AS deg FROM adj GROUP BY 1),
             |wz AS (SELECT u AS z,
             |        CAST(round(1.0 / ln(deg), 6) AS DECIMAL(18,6)) AS wz
             |      FROM deg),
             |wed AS (SELECT e1.u AS a, e2.v AS b, e1.v AS z
             |      FROM adj e1 JOIN adj e2
             |        ON e1.v = e2.u AND e1.u < e2.v),
             |open AS (SELECT w.a, w.b, w.z FROM wed w
             |      LEFT JOIN und ON und.ea = w.a AND und.eb = w.b
             |      WHERE und.ea IS NULL),
             |sc AS (SELECT a, b, COUNT(*) AS cn, CAST(SUM(wz) AS DOUBLE) AS aa
             |      FROM open JOIN wz USING (z) GROUP BY 1, 2)
             |SELECT sc.a, sc.b, cn,
             |  round(CAST(cn AS DOUBLE) / (da.deg + db.deg - cn), 4) AS jaccard,
             |  round(aa, 6) AS aa
             |FROM sc JOIN deg da ON sc.a = da.u JOIN deg db ON sc.b = db.u
             |ORDER BY aa DESC, sc.a, sc.b LIMIT 20""".stripMargin)),

    // Brier score with the Murphy decomposition (Brier, Mon Wea Rev 78,
    // 1950; Murphy, J Appl Meteor 12, 1973): BS = REL − RES + UNC — the
    // score x165's ECE only gestures at, split into calibration error
    // (reliability), discrimination (resolution), and irreducible base-
    // rate variance. Honest eval protocol: forecasts are per-value-bin
    // purchase rates fit on the EVEN-user half, scored on the ODD-user
    // half (constant forecast per bin, which is exactly the regime where
    // Murphy's identity is exact). Bin forecasts round to 6 dp, every
    // per-bin term is rounded-6 DECIMAL-summed over the 20-bin frame,
    // and BS itself is computed from the closed form n₁(1−f)² + n₀f² —
    // integer-weighted rationals throughout, engine-identical. One
    // data-scan per half; everything downstream is 20 rows.
    QuerySpec(
      "x207_brier_decomposition",
      (s, dir) => {
        val mx = Tables.events(s, dir).agg(max(col("value")).as("mx"))
        val binned = Tables.events(s, dir).crossJoin(broadcast(mx))
          .select((col("user_id") % 2 === 0).as("is_train"),
            least(floor(col("value") / col("mx") * 20), lit(19L)).as("bin"),
            (col("event_type") === "purchase").cast("long").as("y"))
        val f = binned.filter(col("is_train"))
          .groupBy("bin")
          .agg(round(sum(col("y")).cast("double") / count(lit(1)), 6)
            .as("fk"))
        val t = binned.filter(!col("is_train"))
          .groupBy("bin")
          .agg(count(lit(1)).as("nk"), sum(col("y")).as("pk"))
        val base = binned.filter(!col("is_train"))
          .agg(count(lit(1)).as("n"),
            sum(col("y")).as("pos"))
        t.join(f, "bin")
          .crossJoin(broadcast(base))
          .groupBy("n", "pos")
          .agg(
            sum(round(col("pk").cast("double") * (lit(1.0) - col("fk")) *
              (lit(1.0) - col("fk")) +
              (col("nk") - col("pk")).cast("double") * col("fk") * col("fk"),
              6).cast("decimal(18,6)")).cast("double").as("sbs"),
            sum(round(col("nk").cast("double") *
              (col("fk") - col("pk").cast("double") / col("nk")) *
              (col("fk") - col("pk").cast("double") / col("nk")), 6)
              .cast("decimal(18,6)")).cast("double").as("srel"),
            sum(round(col("nk").cast("double") *
              (col("pk").cast("double") / col("nk") -
                col("pos").cast("double") / col("n")) *
              (col("pk").cast("double") / col("nk") -
                col("pos").cast("double") / col("n")), 6)
              .cast("decimal(18,6)")).cast("double").as("sres"))
          .select(col("n").as("n_test"),
            round(col("pos").cast("double") / col("n"), 6).as("base_rate"),
            round(col("sbs") / col("n"), 6).as("brier"),
            round(col("srel") / col("n"), 6).as("reliability"),
            round(col("sres") / col("n"), 6).as("resolution"),
            round(col("pos").cast("double") / col("n") *
              (lit(1.0) - col("pos").cast("double") / col("n")), 6)
              .as("uncertainty"))
      },
      Some("""WITH mx AS (SELECT MAX(value) AS mx FROM events),
             |b AS (SELECT user_id % 2 = 0 AS is_train,
             |        least(CAST(floor(value / mx.mx * 20) AS BIGINT), 19)
             |          AS bin,
             |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             |      FROM events CROSS JOIN mx),
             |f AS (SELECT bin,
             |        round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS fk
             |      FROM b WHERE is_train GROUP BY 1),
             |t AS (SELECT bin, COUNT(*) AS nk, SUM(y) AS pk
             |      FROM b WHERE NOT is_train GROUP BY 1),
             |base AS (SELECT COUNT(*) AS n, SUM(y) AS pos
             |      FROM b WHERE NOT is_train),
             |agg AS (SELECT n, pos,
             |        CAST(SUM(CAST(round(CAST(pk AS DOUBLE) * (1.0 - fk) *
             |          (1.0 - fk) + CAST(nk - pk AS DOUBLE) * fk * fk, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS sbs,
             |        CAST(SUM(CAST(round(CAST(nk AS DOUBLE) *
             |          (fk - CAST(pk AS DOUBLE) / nk) *
             |          (fk - CAST(pk AS DOUBLE) / nk), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS srel,
             |        CAST(SUM(CAST(round(CAST(nk AS DOUBLE) *
             |          (CAST(pk AS DOUBLE) / nk - CAST(pos AS DOUBLE) / n) *
             |          (CAST(pk AS DOUBLE) / nk - CAST(pos AS DOUBLE) / n), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS sres
             |      FROM t JOIN f USING (bin) CROSS JOIN base
             |      GROUP BY 1, 2)
             |SELECT CAST(n AS BIGINT) AS n_test,
             |  round(CAST(pos AS DOUBLE) / n, 6) AS base_rate,
             |  round(sbs / n, 6) AS brier,
             |  round(srel / n, 6) AS reliability,
             |  round(sres / n, 6) AS resolution,
             |  round(CAST(pos AS DOUBLE) / n *
             |    (1.0 - CAST(pos AS DOUBLE) / n), 6) AS uncertainty
             |FROM agg ORDER BY n_test""".stripMargin)),

    // RFM segmentation (Hughes, "Strategic Database Marketing" 1994;
    // Fader, Hardie & Lee, J Interactive Marketing 19, 2005): score
    // every purchasing user 1–5 on Recency / Frequency / Monetary by
    // quintile, then map score triples to the marketing segments a
    // curation pipeline samples by. Quintile boundaries come from ONE
    // broadcast percentile row over integer inputs (days, counts,
    // cents — the x196 device, so Spark `percentile` and DuckDB
    // `quantile_cont` interpolate identically); each user's scores are
    // then row-local threshold counts — no ntile, no global sort, two
    // shuffles total (user aggregate + segment aggregate) at any scale.
    // Recency scores INVERTED (recent = 5). Monetary sums exact cents.
    QuerySpec(
      "x208_rfm_segments",
      (s, dir) => {
        val gmx = Tables.events(s, dir)
          .agg(max(to_date(col("ts"))).as("gmax"))
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .crossJoin(broadcast(gmx))
          .groupBy("user_id")
          .agg(min(datediff(col("gmax"), to_date(col("ts"))))
            .cast("long").as("rec"),
            count(lit(1)).as("freq"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
          .localCheckpoint() // feeds the percentile row and the scoring
        val qs = u.agg(
          expr("percentile(rec, array(0.2, 0.4, 0.6, 0.8))").as("qr"),
          expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").as("qf"),
          expr("percentile(cents, array(0.2, 0.4, 0.6, 0.8))").as("qm"))
        def score(c: org.apache.spark.sql.Column,
            q: org.apache.spark.sql.Column) =
          lit(1L) + (c > element_at(q, 1)).cast("long") +
            (c > element_at(q, 2)).cast("long") +
            (c > element_at(q, 3)).cast("long") +
            (c > element_at(q, 4)).cast("long")
        val scored = u.crossJoin(broadcast(qs))
          .select(col("cents"),
            (lit(6L) - score(col("rec"), col("qr"))).as("r"),
            score(col("freq"), col("qf")).as("f"),
            score(col("cents"), col("qm")).as("m"))
          .withColumn("segment",
            when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4,
              "champion")
              .when(col("f") >= 4, "loyal")
              .when(col("m") >= 4, "big spender")
              .when(col("r") <= 2 && col("f") >= 3, "at risk")
              .when(col("r") <= 2, "hibernating")
              .otherwise("regular"))
        scored.groupBy("segment")
          .agg(count(lit(1)).as("n_users"),
            round(avg(col("r")), 6).as("avg_r"),
            round(avg(col("f")), 6).as("avg_f"),
            round(sum(col("cents")).cast("double") / count(lit(1)) / 100.0,
              2).as("avg_spend"))
          .orderBy("segment")
      },
      Some("""WITH gmx AS (SELECT MAX(CAST(ts AS DATE)) AS gmax FROM events),
             |u AS (SELECT user_id,
             |        CAST(MIN(datediff('day', CAST(ts AS DATE), gmx.gmax))
             |          AS BIGINT) AS rec,
             |        COUNT(*) AS freq,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS cents
             |      FROM events CROSS JOIN gmx
             |      WHERE event_type = 'purchase' GROUP BY 1, gmx.gmax),
             |qs AS (SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS qr,
             |        quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS qf,
             |        quantile_cont(cents, [0.2, 0.4, 0.6, 0.8]) AS qm
             |      FROM u),
             |sc AS (SELECT cents,
             |        6 - (1 + CASE WHEN rec > qr[1] THEN 1 ELSE 0 END
             |          + CASE WHEN rec > qr[2] THEN 1 ELSE 0 END
             |          + CASE WHEN rec > qr[3] THEN 1 ELSE 0 END
             |          + CASE WHEN rec > qr[4] THEN 1 ELSE 0 END) AS r,
             |        1 + CASE WHEN freq > qf[1] THEN 1 ELSE 0 END
             |          + CASE WHEN freq > qf[2] THEN 1 ELSE 0 END
             |          + CASE WHEN freq > qf[3] THEN 1 ELSE 0 END
             |          + CASE WHEN freq > qf[4] THEN 1 ELSE 0 END AS f,
             |        1 + CASE WHEN cents > qm[1] THEN 1 ELSE 0 END
             |          + CASE WHEN cents > qm[2] THEN 1 ELSE 0 END
             |          + CASE WHEN cents > qm[3] THEN 1 ELSE 0 END
             |          + CASE WHEN cents > qm[4] THEN 1 ELSE 0 END AS m
             |      FROM u CROSS JOIN qs),
             |seg AS (SELECT cents, r, f, m,
             |        CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
             |             WHEN f >= 4 THEN 'loyal'
             |             WHEN m >= 4 THEN 'big spender'
             |             WHEN r <= 2 AND f >= 3 THEN 'at risk'
             |             WHEN r <= 2 THEN 'hibernating'
             |             ELSE 'regular' END AS segment
             |      FROM sc)
             |SELECT segment, COUNT(*) AS n_users,
             |  round(avg(r), 6) AS avg_r, round(avg(f), 6) AS avg_f,
             |  round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 2)
             |    AS avg_spend
             |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Brown-Forsythe variance-homogeneity test (Brown & Forsythe, JASA
    // 69, 1974 — Levene's test on MEDIAN-centered deviations): do the
    // five event types have equal `value` SPREAD? The assumption
    // x157's ANOVA silently makes, tested robustly (median centering
    // keeps the test honest under the skewed distributions x179
    // documents). Per-group medians interpolate over integer cents (the
    // x196 percentile↔quantile_cont correspondence), deviations are
    // scored in dollars with per-row rounded-6 DECIMAL bridges on Σz
    // and Σz², and the 5-row between/within reduction bridges again —
    // the F statistic replays exactly. Scale shape: one percentile
    // aggregate, one broadcast join, one moment aggregate; no windows.
    QuerySpec(
      "x209_brown_forsythe",
      (s, dir) => {
        val med = Tables.events(s, dir)
          .groupBy("event_type")
          .agg((expr(
            "percentile(CAST(round(value * 100) AS BIGINT), 0.5)") /
            100.0).as("m"))
        val z = Tables.events(s, dir)
          .join(broadcast(med), "event_type")
          .select(col("event_type"), abs(col("value") - col("m")).as("z"))
        val g = z.groupBy("event_type")
          .agg(count(lit(1)).as("ng"),
            sum(round(col("z"), 6).cast("decimal(18,6)")).cast("double")
              .as("sz"),
            sum(round(col("z") * col("z"), 6).cast("decimal(18,6)"))
              .cast("double").as("szz"))
        val tot = g.agg(sum(col("ng")).as("n"),
          sum(round(col("sz"), 6).cast("decimal(18,6)")).cast("double")
            .as("szall"),
          count(lit(1)).as("k"))
        g.crossJoin(broadcast(tot))
          .groupBy("n", "k")
          .agg(
            sum(round(col("ng").cast("double") *
              (col("sz") / col("ng") - col("szall") / col("n")) *
              (col("sz") / col("ng") - col("szall") / col("n")), 6)
              .cast("decimal(18,6)")).cast("double").as("ssb"),
            sum(round(col("szz") -
              col("ng").cast("double") * (col("sz") / col("ng")) *
              (col("sz") / col("ng")), 6)
              .cast("decimal(18,6)")).cast("double").as("ssw"))
          .select(col("k"), col("n"),
            (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"),
            round((col("ssb") / (col("k") - 1)) /
              (col("ssw") / (col("n") - col("k"))), 6).as("f_stat"),
            when((col("ssb") / (col("k") - 1)) /
              (col("ssw") / (col("n") - col("k"))) > 2.371932,
              "spreads differ").otherwise("no evidence").as("verdict"))
      },
      Some("""WITH med AS (SELECT event_type,
             |        quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)
             |          / 100.0 AS m
             |      FROM events GROUP BY 1),
             |z AS (SELECT e.event_type, abs(e.value - med.m) AS z
             |      FROM events e JOIN med ON e.event_type = med.event_type),
             |g AS (SELECT event_type, COUNT(*) AS ng,
             |        CAST(SUM(CAST(round(z, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sz,
             |        CAST(SUM(CAST(round(z * z, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS szz
             |      FROM z GROUP BY 1),
             |tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
             |        CAST(SUM(CAST(round(sz, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS szall,
             |        COUNT(*) AS k FROM g),
             |agg AS (SELECT n, k,
             |        CAST(SUM(CAST(round(CAST(ng AS DOUBLE) *
             |          (sz / ng - szall / n) * (sz / ng - szall / n), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS ssb,
             |        CAST(SUM(CAST(round(szz - CAST(ng AS DOUBLE) *
             |          (sz / ng) * (sz / ng), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS ssw
             |      FROM g CROSS JOIN tot GROUP BY 1, 2)
             |SELECT k, n, k - 1 AS df1, n - k AS df2,
             |  round((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
             |  CASE WHEN (ssb / (k - 1)) / (ssw / (n - k)) > 2.371932
             |    THEN 'spreads differ' ELSE 'no evidence' END AS verdict
             |FROM agg ORDER BY k""".stripMargin)),

    // Query-likelihood retrieval with Dirichlet smoothing (Ponte &
    // Croft, SIGIR 1998; Zhai & Lafferty, SIGIR 2001, μ=300): the
    // language-model ranking alternative to x106's BM25 over the same
    // postings. log P(q|d) decomposes (the Zhai trick) into a SPARSE
    // matched-term part Σ qtf·ln(1 + c(w,d)/(μ·p(w|C))) served by the
    // inverted-index join, plus a per-candidate length part
    // |q|·ln(μ/(|d|+μ)) — so no dense query×corpus scan exists at any
    // scale; candidates are docs sharing a query term, exactly x106's
    // plan shape. p(w|C) is an exact BIGINT ratio; each ln term rounds
    // to 6 dp and DECIMAL-sums (add-order-proof); the final top-10 is
    // a qid-partitioned rank with WindowGroupLimit pushdown.
    QuerySpec(
      "x210_qlm_retrieval",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val tf = Bm25.termFreqs(Tables.documents(s, dir))
          .localCheckpoint() // postings feed cf, dl, queries, candidates
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val cstats = tf.agg(sum("tf").as("ctot"))
        val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
        val q = tf.filter(col("doc_id") < 3)
          .select(col("doc_id").as("qid"), col("term"),
            col("tf").as("qtf"))
        val qlen = q.groupBy("qid").agg(sum("qtf").as("qlen"))
        val matched = tf.join(broadcast(q.join(cf, "term")
            .crossJoin(cstats)
            .select(col("qid"), col("term"), col("qtf"),
              (col("cf").cast("double") / col("ctot")).as("pc"))), Seq("term"))
          .filter(col("doc_id") =!= col("qid"))
          .select(col("qid"), col("doc_id").as("cid"),
            round(col("qtf") * log(lit(1.0) +
              col("tf").cast("double") / (lit(300.0) * col("pc"))), 6)
              .as("contrib"))
          .groupBy("qid", "cid")
          .agg(count(lit(1)).as("n_terms"),
            sum(col("contrib").cast("decimal(18,6)")).cast("double")
              .as("match_part"))
        val sc = matched
          .join(dl.select(col("doc_id").as("cid"), col("dl")), "cid")
          .join(broadcast(qlen), "qid")
          .select(col("qid"), col("cid"), col("n_terms"),
            round(col("match_part") +
              round(col("qlen") * log(lit(300.0) /
                (col("dl") + lit(300.0))), 6), 6).as("score"))
        sc.withColumn("rn", row_number().over(
            W.partitionBy("qid").orderBy(col("score").desc, col("cid")))
            .cast("long"))
          .filter(col("rn") <= 10)
          .orderBy("qid", "rn")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
             |cs AS (SELECT SUM(tf) AS ctot FROM tf),
             |cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
             |q AS (SELECT tf.doc_id AS qid, tf.term, tf.tf AS qtf,
             |        CAST(cf.cf AS DOUBLE) / cs.ctot AS pc
             |      FROM tf JOIN cf USING (term) CROSS JOIN cs
             |      WHERE tf.doc_id < 3),
             |ql AS (SELECT qid, SUM(qtf) AS qlen FROM q GROUP BY 1),
             |m AS (SELECT q.qid, tf.doc_id AS cid,
             |        CAST(COUNT(*) AS BIGINT) AS n_terms,
             |        CAST(SUM(CAST(round(q.qtf * ln(1.0 +
             |          CAST(tf.tf AS DOUBLE) / (300.0 * q.pc)), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS match_part
             |      FROM tf JOIN q ON tf.term = q.term
             |        AND tf.doc_id <> q.qid
             |      GROUP BY 1, 2),
             |sc AS (SELECT m.qid, m.cid, m.n_terms,
             |        round(m.match_part + round(ql.qlen *
             |          ln(300.0 / (dl.dl + 300.0)), 6), 6) AS score
             |      FROM m JOIN dl ON dl.doc_id = m.cid
             |        JOIN ql ON ql.qid = m.qid)
             |SELECT qid, cid, n_terms, score,
             |  CAST(row_number() OVER (PARTITION BY qid
             |    ORDER BY score DESC, cid) AS BIGINT) AS rn
             |FROM sc QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // Cox proportional-hazards fit, single binary covariate (Cox, JRSS-B
    // 34, 1972; Breslow tie handling, Biometrics 30, 1974): the EFFECT
    // SIZE the x202 log-rank test only detects — by how much does arm B
    // multiply the instantaneous error hazard? Shares armRiskGrid with
    // x202 (same risk-set convention, provably: the score test at beta=0
    // computed here IS the log-rank numerator). The Newton solve runs in
    // HAZARD-RATIO space r = e^beta — the partial-likelihood score is
    // rational in r for a binary covariate, so NO transcendental appears
    // inside any aggregate (exp/ln differ by ulps across engines; ln
    // appears exactly once, on the final 6-dp-rounded scalar, the x206
    // precedent). Two Newton steps from r=1 with r rounded to 6 dp
    // between steps (each step's aggregate is DECIMAL-bridged per time
    // row), then the Fisher information at the final iterate prices
    // SE(beta). Scale shape: the grid is calendar-bounded and
    // localCheckpointed once; each Newton step is a broadcast of one
    // scalar row plus an aggregate over that bounded grid.
    QuerySpec(
      "x211_cox_ph",
      (s, dir) => {
        val (byTime0, arms) = armRiskGrid(s, dir)
        val byTime = byTime0.localCheckpoint() // calendar-bounded; feeds 3 Newton/info passes
        val n0c = (col("nt") - col("n1")).cast("double")
        val s0 = byTime.agg(
          sum(round(col("d1").cast("double") -
            col("dt").cast("double") * col("n1") / col("nt"), 6)
            .cast("decimal(18,6)")).cast("double").as("u0"),
          sum(round(col("dt").cast("double") * col("n1") * n0c /
            (col("nt").cast("double") * col("nt")), 6)
            .cast("decimal(18,6)")).cast("double").as("i0"),
          sum(col("dt")).as("d_total"))
        val r1 = s0.select(col("u0"), col("i0"), col("d_total"),
          round(lit(1.0) + col("u0") / col("i0"), 6).as("r1"))
        val den1 = col("n1") * col("r1") + (col("nt") - col("n1"))
        val s1 = byTime.crossJoin(broadcast(r1))
          .groupBy("u0", "i0", "d_total", "r1")
          .agg(
            sum(round(col("d1").cast("double") -
              col("dt").cast("double") * col("n1") * col("r1") / den1, 6)
              .cast("decimal(18,6)")).cast("double").as("u1"),
            sum(round(col("dt").cast("double") * col("n1") * n0c /
              (den1 * den1), 6)
              .cast("decimal(18,6)")).cast("double").as("up1"))
        val r2 = s1.select(col("u0"), col("i0"), col("d_total"),
          round(col("r1") + col("u1") / col("up1"), 6).as("hr"))
        val den2 = col("n1") * col("hr") + (col("nt") - col("n1"))
        byTime.crossJoin(broadcast(r2))
          .groupBy("u0", "i0", "d_total", "hr")
          .agg(
            sum(round(col("dt").cast("double") * col("n1") * col("hr") *
              n0c / (den2 * den2), 6)
              .cast("decimal(18,6)")).cast("double").as("ib"))
          .crossJoin(broadcast(arms))
          .select(col("n_a"), col("n_b"), col("d_total"), col("hr"),
            round(log(col("hr")), 6).as("beta"),
            round(lit(1.0) / sqrt(col("ib")), 6).as("se_beta"),
            round(col("u0") / sqrt(col("i0")), 6).as("score_z"),
            when(abs(col("u0") / sqrt(col("i0"))) > 1.959964,
              "arm affects hazard").otherwise("no evidence").as("verdict"))
      },
      Some("""WITH span AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             |        MIN(CASE WHEN event_type = 'error'
             |                 THEN CAST(ts AS DATE) END) AS e
             |      FROM events GROUP BY 1),
             |gm AS (SELECT MAX(greatest(f, e)) AS gmax FROM span),
             |subj AS (SELECT CAST(user_id % 2 AS BIGINT) AS g,
             |        CAST(CASE WHEN e IS NOT NULL THEN datediff('day', f, e)
             |             ELSE datediff('day', f, gm.gmax) END AS BIGINT) AS t,
             |        CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS obs
             |      FROM span CROSS JOIN gm),
             |ptg AS (SELECT t, g, SUM(obs) AS d, SUM(1 - obs) AS c
             |      FROM subj GROUP BY 1, 2),
             |tot AS (SELECT g, COUNT(*) AS ng FROM subj GROUP BY 1),
             |grid AS (SELECT ts.t, gs.g, COALESCE(p.d, 0) AS d,
             |        COALESCE(p.c, 0) AS c
             |      FROM (SELECT DISTINCT t FROM ptg) ts
             |      CROSS JOIN (SELECT DISTINCT g FROM subj) gs
             |      LEFT JOIN ptg p ON p.t = ts.t AND p.g = gs.g),
             |ar AS (SELECT grid.t, grid.g, grid.d,
             |        tot.ng - COALESCE(SUM(grid.d + grid.c)
             |          OVER (PARTITION BY grid.g ORDER BY grid.t
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) AS nr
             |      FROM grid JOIN tot ON tot.g = grid.g),
             |bt AS (SELECT t,
             |        SUM(CASE WHEN g = 1 THEN d ELSE 0 END) AS d1,
             |        SUM(d) AS dt,
             |        SUM(CASE WHEN g = 1 THEN nr ELSE 0 END) AS n1,
             |        SUM(nr) AS nt
             |      FROM ar GROUP BY 1),
             |ft AS (SELECT * FROM bt WHERE dt > 0 AND nt > 1),
             |s0 AS (SELECT
             |        CAST(SUM(CAST(round(CAST(d1 AS DOUBLE) -
             |          CAST(dt AS DOUBLE) * n1 / nt, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS u0,
             |        CAST(SUM(CAST(round(CAST(dt AS DOUBLE) * n1 *
             |          CAST(nt - n1 AS DOUBLE) /
             |          (CAST(nt AS DOUBLE) * nt), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS i0,
             |        CAST(SUM(dt) AS BIGINT) AS d_total FROM ft),
             |r1 AS (SELECT u0, i0, d_total,
             |        round(1.0 + u0 / i0, 6) AS r1 FROM s0),
             |s1 AS (SELECT u0, i0, d_total, r1,
             |        CAST(SUM(CAST(round(CAST(d1 AS DOUBLE) -
             |          CAST(dt AS DOUBLE) * n1 * r1 /
             |          (n1 * r1 + (nt - n1)), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS u1,
             |        CAST(SUM(CAST(round(CAST(dt AS DOUBLE) * n1 *
             |          CAST(nt - n1 AS DOUBLE) /
             |          ((n1 * r1 + (nt - n1)) * (n1 * r1 + (nt - n1))), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS up1
             |      FROM ft CROSS JOIN r1 GROUP BY 1, 2, 3, 4),
             |r2 AS (SELECT u0, i0, d_total,
             |        round(r1 + u1 / up1, 6) AS hr FROM s1),
             |s2 AS (SELECT u0, i0, d_total, hr,
             |        CAST(SUM(CAST(round(CAST(dt AS DOUBLE) * n1 * hr *
             |          CAST(nt - n1 AS DOUBLE) /
             |          ((n1 * hr + (nt - n1)) * (n1 * hr + (nt - n1))), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS ib
             |      FROM ft CROSS JOIN r2 GROUP BY 1, 2, 3, 4),
             |arms AS (SELECT
             |        CAST(SUM(CASE WHEN g = 0 THEN ng ELSE 0 END) AS BIGINT) AS n_a,
             |        CAST(SUM(CASE WHEN g = 1 THEN ng ELSE 0 END) AS BIGINT) AS n_b
             |      FROM tot)
             |SELECT n_a, n_b, d_total, hr, round(ln(hr), 6) AS beta,
             |  round(1.0 / sqrt(ib), 6) AS se_beta,
             |  round(u0 / sqrt(i0), 6) AS score_z,
             |  CASE WHEN abs(u0 / sqrt(i0)) > 1.959964
             |    THEN 'arm affects hazard' ELSE 'no evidence' END AS verdict
             |FROM s2 CROSS JOIN arms ORDER BY hr""".stripMargin)),

    // Bradley-Terry strengths via Hunter's MM algorithm (Bradley & Terry,
    // Biometrika 39, 1952; Hunter, AoS 32, 2004): the pairwise-preference
    // → latent-strength fit behind reward-model data curation and
    // match-rating systems. Comparisons come from the x114 basket grain:
    // within each (user, day), of two co-occurring items the one with the
    // larger summed spend "wins" (ties dropped). Three unrolled MM steps
    // p_i ← (W_i+1) / (Σ_j n_ij/(p_i+p_j) + 2/(p_i+1)) from uniform p=1 —
    // the +1-win/+1-loss ghost opponent at fixed strength 1 is the
    // standard prior (cf. Davidson 1970; Caron & Doucet 2012) keeping
    // every strength strictly positive, so no 0/0 appears for winless
    // items. Each denominator is a rounded-6 DECIMAL sum over the item's
    // edge list and each step sum-normalizes, so the trajectory replays
    // bit-identically. Scale shape: the decided-pair grid is item-vocab
    // bounded and localCheckpointed once; every MM step is two slim
    // equi-joins + one aggregate on it — corpus size enters only through
    // the one basket self-join that x114/x162 already price.
    QuerySpec(
      "x212_bradley_terry",
      (s, dir) => {
        val iv = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("item"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .filter(col("item").isNotNull)
          .groupBy("user_id", "day", "item")
          .agg(sum(col("cents")).as("cents"))
        val comp = iv.as("a").join(iv.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.day") === col("b.day") &&
              col("a.item") < col("b.item") &&
              col("a.cents") =!= col("b.cents"))
          .select(
            when(col("a.cents") > col("b.cents"), col("a.item"))
              .otherwise(col("b.item")).as("wi"),
            when(col("a.cents") > col("b.cents"), col("b.item"))
              .otherwise(col("a.item")).as("li"))
        val wdir = comp.groupBy("wi", "li").agg(count(lit(1)).as("nw"))
          .localCheckpoint() // item-vocab-bounded grid feeds edges, wins, and 3 MM steps
        val e = wdir.select(col("wi").as("i"), col("li").as("j"), col("nw"))
          .unionByName(wdir.select(col("li").as("i"), col("wi").as("j"),
            col("nw")))
          .groupBy("i", "j").agg(sum(col("nw")).as("n"))
          .localCheckpoint() // consumed twice per MM step (den + tot branch)
        val items = e.select("i").distinct()
        val wins = items
          .join(wdir.groupBy(col("wi").as("i")).agg(sum("nw").as("w")),
            Seq("i"), "left").na.fill(0L, Seq("w"))
        val loss = items
          .join(wdir.groupBy(col("li").as("i")).agg(sum("nw").as("l")),
            Seq("i"), "left").na.fill(0L, Seq("l"))
        def step(p: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val pj = p.select(col("i").as("j"), col("p").as("pj"))
          val den = e.join(p, "i").join(pj, "j")
            .groupBy("i")
            .agg(sum(round(col("n").cast("double") /
              (col("p") + col("pj")), 6)
              .cast("decimal(18,6)")).cast("double").as("den"))
          val raw = wins.join(den, "i").join(p, "i")
            .select(col("i"),
              round((col("w") + lit(1.0)) /
                (col("den") + round(lit(2.0) / (col("p") + lit(1.0)), 6)),
                6).as("raw"))
          // checkpoint the vocab-bounded strengths: without it each step's
          // tot-broadcast re-evaluates the PREVIOUS steps' whole subtree
          // (~2x plan duplication per step — measured 12.9 s of pure
          // constant factor at sf0.01, corpus-independent)
          val rawCk = raw.localCheckpoint()
          val tot = rawCk.agg(sum(col("raw").cast("decimal(18,6)"))
            .cast("double").as("sraw"))
          rawCk.crossJoin(broadcast(tot))
            .select(col("i"), round(col("raw") / col("sraw"), 6).as("p"))
        }
        val p3 = step(step(step(items.withColumn("p", lit(1.0)))))
        p3.join(wins, "i").join(loss, "i")
          .select(col("i").as("item"), col("w").as("wins"),
            col("l").as("losses"), col("p").as("strength"))
          .orderBy(col("strength").desc, col("item"))
          .limit(20)
      },
      Some("""WITH iv AS (SELECT user_id, CAST(ts AS DATE) AS day,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS item,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS cents
             |      FROM events
             |      WHERE json_extract_string(props, '$.k') IS NOT NULL
             |      GROUP BY 1, 2, 3),
             |comp AS (SELECT
             |        CASE WHEN a.cents > b.cents THEN a.item ELSE b.item END AS wi,
             |        CASE WHEN a.cents > b.cents THEN b.item ELSE a.item END AS li
             |      FROM iv a JOIN iv b ON a.user_id = b.user_id
             |        AND a.day = b.day AND a.item < b.item
             |        AND a.cents <> b.cents),
             |wd AS (SELECT wi, li, COUNT(*) AS nw FROM comp GROUP BY 1, 2),
             |e AS (SELECT i, j, SUM(nw) AS n FROM (
             |        SELECT wi AS i, li AS j, nw FROM wd
             |        UNION ALL SELECT li, wi, nw FROM wd) GROUP BY 1, 2),
             |items AS (SELECT DISTINCT i FROM e),
             |wins AS (SELECT items.i, COALESCE(SUM(wd.nw), 0) AS w
             |      FROM items LEFT JOIN wd ON wd.wi = items.i GROUP BY 1),
             |loss AS (SELECT items.i, COALESCE(SUM(wd.nw), 0) AS l
             |      FROM items LEFT JOIN wd ON wd.li = items.i GROUP BY 1),
             |p0 AS (SELECT i, 1.0 AS p FROM items),
             |d1 AS (SELECT e.i, CAST(SUM(CAST(round(CAST(e.n AS DOUBLE) /
             |          (pi.p + pj.p), 6) AS DECIMAL(18,6))) AS DOUBLE) AS den
             |      FROM e JOIN p0 pi ON pi.i = e.i
             |        JOIN p0 pj ON pj.i = e.j GROUP BY 1),
             |r1 AS (SELECT w.i, round((w.w + 1.0) /
             |          (d1.den + round(2.0 / (p.p + 1.0), 6)), 6) AS raw
             |      FROM wins w JOIN d1 ON d1.i = w.i JOIN p0 p ON p.i = w.i),
             |t1 AS (SELECT CAST(SUM(CAST(raw AS DECIMAL(18,6))) AS DOUBLE)
             |        AS s FROM r1),
             |p1 AS (SELECT i, round(raw / t1.s, 6) AS p
             |      FROM r1 CROSS JOIN t1),
             |d2 AS (SELECT e.i, CAST(SUM(CAST(round(CAST(e.n AS DOUBLE) /
             |          (pi.p + pj.p), 6) AS DECIMAL(18,6))) AS DOUBLE) AS den
             |      FROM e JOIN p1 pi ON pi.i = e.i
             |        JOIN p1 pj ON pj.i = e.j GROUP BY 1),
             |r2 AS (SELECT w.i, round((w.w + 1.0) /
             |          (d2.den + round(2.0 / (p.p + 1.0), 6)), 6) AS raw
             |      FROM wins w JOIN d2 ON d2.i = w.i JOIN p1 p ON p.i = w.i),
             |t2 AS (SELECT CAST(SUM(CAST(raw AS DECIMAL(18,6))) AS DOUBLE)
             |        AS s FROM r2),
             |p2 AS (SELECT i, round(raw / t2.s, 6) AS p
             |      FROM r2 CROSS JOIN t2),
             |d3 AS (SELECT e.i, CAST(SUM(CAST(round(CAST(e.n AS DOUBLE) /
             |          (pi.p + pj.p), 6) AS DECIMAL(18,6))) AS DOUBLE) AS den
             |      FROM e JOIN p2 pi ON pi.i = e.i
             |        JOIN p2 pj ON pj.i = e.j GROUP BY 1),
             |r3 AS (SELECT w.i, round((w.w + 1.0) /
             |          (d3.den + round(2.0 / (p.p + 1.0), 6)), 6) AS raw
             |      FROM wins w JOIN d3 ON d3.i = w.i JOIN p2 p ON p.i = w.i),
             |t3 AS (SELECT CAST(SUM(CAST(raw AS DECIMAL(18,6))) AS DOUBLE)
             |        AS s FROM r3),
             |p3 AS (SELECT i, round(raw / t3.s, 6) AS p
             |      FROM r3 CROSS JOIN t3)
             |SELECT p3.i AS item, CAST(w.w AS BIGINT) AS wins,
             |  CAST(loss.l AS BIGINT) AS losses, p3.p AS strength
             |FROM p3 JOIN wins w ON w.i = p3.i JOIN loss ON loss.i = p3.i
             |ORDER BY strength DESC, item LIMIT 20""".stripMargin)),

    // Difference-in-differences (Ashenfelter & Card, REStat 67, 1985;
    // Card & Krueger, AER 84, 1994): the panel causal estimator the
    // cross-sectional suite (x125 CUPED, x182 IPW) lacks — arm-B lift in
    // per-user purchase revenue net of the common time trend, assuming
    // parallel trends. Arms = user parity (the x125 convention); periods
    // split at the calendar midpoint; each user contributes a pre and a
    // post outcome with NO-PURCHASE periods zero-filled (dropping them
    // biases toward active users — the classic DiD mistake). The 2x2
    // cells carry exact integer moments (n, Σcents, Σcents² — the x133
    // discipline), so every mean/variance is an IEEE expression over
    // BIGINTs with no add-order dependence anywhere; the SE is the
    // four-cell pooled form √(Σ s²ᵢ/nᵢ). Scale shape: one scan to
    // user-period sums, a users × {pre,post} zero-fill join, a 4-row
    // cell aggregate — two shuffles at any corpus size.
    QuerySpec(
      "x213_diff_in_diff",
      (s, dir) => {
        val cal = Tables.events(s, dir)
          .agg(min(to_date(col("ts"))).as("gmin"),
            max(to_date(col("ts"))).as("gmax"))
          .select(expr("date_add(gmin, CAST(datediff(gmax, gmin) DIV 2 " +
            "AS INT))").as("mid"))
        val up = Tables.events(s, dir).crossJoin(broadcast(cal))
          .select(col("user_id"),
            (to_date(col("ts")) > col("mid")).as("is_post"),
            when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)
              .as("cents"))
          .groupBy("user_id", "is_post")
          .agg(sum(col("cents")).as("y"))
        val users = Tables.events(s, dir).select("user_id").distinct()
        val periods = broadcast(
          s.range(2).select((col("id") === 1).as("is_post")))
        val grid = users.crossJoin(periods)
          .join(up, Seq("user_id", "is_post"), "left")
          .na.fill(0L, Seq("y"))
        val cells = grid
          .groupBy((col("user_id") % 2 === 1).as("is_b"), col("is_post"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"))
        val m = col("sy").cast("double") / col("n") / 100.0
        val v = (col("syy").cast("double") -
          col("sy").cast("double") * col("sy") / col("n")) /
          (col("n") - 1) / 10000.0
        def cell(b: Boolean, p: Boolean, c: org.apache.spark.sql.Column) =
          sum(when(col("is_b") === b && col("is_post") === p, c))
        cells.agg(
            cell(false, false, col("n")).as("n_a_pre"),
            cell(true, false, col("n")).as("n_b_pre"),
            cell(false, false, m).as("ma0"), cell(false, true, m).as("ma1"),
            cell(true, false, m).as("mb0"), cell(true, true, m).as("mb1"),
            sum(when(col("n") > 1, v / col("n")).otherwise(0.0)).as("vse"))
          .select(col("n_a_pre"), col("n_b_pre"),
            round(col("ma0"), 6).as("mean_a_pre"),
            round(col("ma1"), 6).as("mean_a_post"),
            round(col("mb0"), 6).as("mean_b_pre"),
            round(col("mb1"), 6).as("mean_b_post"),
            round(col("mb1") - col("mb0") - (col("ma1") - col("ma0")), 6)
              .as("did"),
            round(sqrt(col("vse")), 6).as("se"),
            round((col("mb1") - col("mb0") - (col("ma1") - col("ma0"))) /
              sqrt(col("vse")), 6).as("t_stat"),
            when(abs((col("mb1") - col("mb0") -
              (col("ma1") - col("ma0"))) / sqrt(col("vse"))) > 1.959964,
              "arm lifts revenue").otherwise("no evidence").as("verdict"))
      },
      Some("""WITH cal AS (SELECT MIN(CAST(ts AS DATE)) AS gmin,
             |        MAX(CAST(ts AS DATE)) AS gmax FROM events),
             |mid AS (SELECT gmin + CAST(datediff('day', gmin, gmax) // 2
             |        AS INT) AS mid FROM cal),
             |up AS (SELECT user_id, CAST(ts AS DATE) > mid.mid AS is_post,
             |        SUM(CASE WHEN event_type = 'purchase'
             |            THEN CAST(round(value * 100) AS BIGINT)
             |            ELSE 0 END) AS y
             |      FROM events CROSS JOIN mid GROUP BY 1, 2),
             |users AS (SELECT DISTINCT user_id FROM events),
             |grid AS (SELECT u.user_id, p.is_post, COALESCE(up.y, 0) AS y
             |      FROM users u
             |      CROSS JOIN (VALUES (false), (true)) p(is_post)
             |      LEFT JOIN up ON up.user_id = u.user_id
             |        AND up.is_post = p.is_post),
             |cells AS (SELECT user_id % 2 = 1 AS is_b, is_post,
             |        COUNT(*) AS n, SUM(y) AS sy, SUM(y * y) AS syy
             |      FROM grid GROUP BY 1, 2),
             |pv AS (SELECT
             |        SUM(CASE WHEN NOT is_b AND NOT is_post THEN n END) AS n_a_pre,
             |        SUM(CASE WHEN is_b AND NOT is_post THEN n END) AS n_b_pre,
             |        SUM(CASE WHEN NOT is_b AND NOT is_post
             |            THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS ma0,
             |        SUM(CASE WHEN NOT is_b AND is_post
             |            THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS ma1,
             |        SUM(CASE WHEN is_b AND NOT is_post
             |            THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS mb0,
             |        SUM(CASE WHEN is_b AND is_post
             |            THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS mb1,
             |        SUM(CASE WHEN n > 1 THEN
             |            (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
             |            / (n - 1) / 10000.0 / n ELSE 0.0 END) AS vse
             |      FROM cells)
             |SELECT CAST(n_a_pre AS BIGINT) AS n_a_pre,
             |  CAST(n_b_pre AS BIGINT) AS n_b_pre,
             |  round(ma0, 6) AS mean_a_pre, round(ma1, 6) AS mean_a_post,
             |  round(mb0, 6) AS mean_b_pre, round(mb1, 6) AS mean_b_post,
             |  round(mb1 - mb0 - (ma1 - ma0), 6) AS did,
             |  round(sqrt(vse), 6) AS se,
             |  round((mb1 - mb0 - (ma1 - ma0)) / sqrt(vse), 6) AS t_stat,
             |  CASE WHEN abs((mb1 - mb0 - (ma1 - ma0)) / sqrt(vse))
             |    > 1.959964 THEN 'arm lifts revenue'
             |    ELSE 'no evidence' END AS verdict
             |FROM pv ORDER BY did""".stripMargin)),

    // Split-conformal prediction intervals, group-conditional (Vovk et
    // al. 2005 "Algorithmic Learning in a Random World"; Lei et al.,
    // JASA 113, 2018; Mondrian/group-conditional form): distribution-free
    // finite-sample-valid intervals for `value` from ANY point predictor —
    // here the per-event-type train-fold mean. Folds by user hash
    // (user%4: {0,1} train, 2 calibration, 3 test); the interval is
    // μ̂ ± q̂ with q̂ the ⌈(n_cal+1)(1−α)⌉-th smallest calibration
    // nonconformity |y−μ̂|, α=0.1 — the ORDER STATISTIC, not an
    // interpolated quantile (interpolation voids the coverage proof).
    // Nonconformities live in exact integer space: score = |y_cents·n_tr
    // − Σy_tr| (a constant positive multiple of |y−μ̂| within a type, so
    // order statistics and coverage comparisons are BIGINT-exact, no ulp
    // anywhere). The k-th smallest comes from the per-group bucketed
    // countBelow — no per-type full sort, no 5-partition skew window.
    // Test-fold coverage (expected ≥ 0.9) is an exact integer comparison
    // per row. Scale shape: three fold scans, group-bounded aggregates,
    // the two-level rank device; q̂ falls back to NULL (infinite
    // interval, coverage 1) when a type's calibration fold is < 9 rows —
    // the honest small-n conformal convention.
    QuerySpec(
      "x214_conformal",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          (col("user_id") % 4).as("fold"),
          expr("CAST(round(value * 100) AS BIGINT)").as("yc"))
        val tr = ev.filter(col("fold") <= 1).groupBy("event_type")
          .agg(count(lit(1)).as("n_train"), sum(col("yc")).as("sy"))
        val calsc = ev.filter(col("fold") === 2).join(tr, "event_type")
          .select(col("event_type"),
            abs(col("yc") * col("n_train") - col("sy")).as("sc"))
        val nc = calsc.groupBy("event_type").agg(count(lit(1)).as("n_cal"))
          .withColumn("k",
            expr("CAST(((n_cal + 1) * 9 + 9) DIV 10 AS BIGINT)"))
        val grid = calsc.groupBy("event_type", "sc")
          .agg(count(lit(1)).as("c"))
        val kth = countBelowBy(grid, "event_type", "sc")
          .join(nc, "event_type")
          .filter(col("below") < col("k") &&
            col("k") <= col("below") + col("c"))
          .select(col("event_type"), col("sc").as("kth"))
        val dims = nc.join(kth, Seq("event_type"), "left")
        val te = ev.filter(col("fold") === 3).join(tr, "event_type")
          .join(dims, "event_type")
          .groupBy("event_type", "n_train", "sy", "n_cal", "kth")
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("kth").isNull ||
              abs(col("yc") * col("n_train") - col("sy")) <= col("kth"),
              1L).otherwise(0L)).as("covered"))
        te.select(col("event_type"), col("n_train"), col("n_cal"),
            col("n_test"),
            round(col("sy").cast("double") / col("n_train") / 100.0, 6)
              .as("mu"),
            round(col("kth").cast("double") /
              (col("n_train").cast("double") * 100.0), 6).as("qhat"),
            round(col("kth").cast("double") * 2.0 /
              (col("n_train").cast("double") * 100.0), 6).as("width"),
            round(col("covered").cast("double") / col("n_test"), 6)
              .as("coverage"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, user_id % 4 AS fold,
             |        CAST(round(value * 100) AS BIGINT) AS yc FROM events),
             |tr AS (SELECT event_type, COUNT(*) AS n_train, SUM(yc) AS sy
             |      FROM ev WHERE fold <= 1 GROUP BY 1),
             |calsc AS (SELECT ev.event_type,
             |        abs(ev.yc * tr.n_train - tr.sy) AS sc
             |      FROM ev JOIN tr ON ev.event_type = tr.event_type
             |      WHERE ev.fold = 2),
             |nc AS (SELECT event_type, COUNT(*) AS n_cal,
             |        CAST(((COUNT(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k
             |      FROM calsc GROUP BY 1),
             |grid AS (SELECT event_type, sc, COUNT(*) AS c
             |      FROM calsc GROUP BY 1, 2),
             |cb AS (SELECT event_type, sc, c,
             |        COALESCE(SUM(c) OVER (PARTITION BY event_type
             |          ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING
             |          AND 1 PRECEDING), 0) AS below FROM grid),
             |kth AS (SELECT cb.event_type, cb.sc AS kth
             |      FROM cb JOIN nc ON nc.event_type = cb.event_type
             |      WHERE cb.below < nc.k AND nc.k <= cb.below + cb.c),
             |dims AS (SELECT nc.event_type, nc.n_cal, kth.kth
             |      FROM nc LEFT JOIN kth ON kth.event_type = nc.event_type),
             |te AS (SELECT ev.event_type, tr.n_train, tr.sy, d.n_cal,
             |        d.kth, COUNT(*) AS n_test,
             |        SUM(CASE WHEN d.kth IS NULL OR
             |            abs(ev.yc * tr.n_train - tr.sy) <= d.kth
             |            THEN 1 ELSE 0 END) AS covered
             |      FROM ev JOIN tr ON ev.event_type = tr.event_type
             |        JOIN dims d ON d.event_type = ev.event_type
             |      WHERE ev.fold = 3 GROUP BY 1, 2, 3, 4, 5)
             |SELECT event_type, n_train, n_cal, n_test,
             |  round(CAST(sy AS DOUBLE) / n_train / 100.0, 6) AS mu,
             |  round(CAST(kth AS DOUBLE) /
             |    (CAST(n_train AS DOUBLE) * 100.0), 6) AS qhat,
             |  round(CAST(kth AS DOUBLE) * 2.0 /
             |    (CAST(n_train AS DOUBLE) * 100.0), 6) AS width,
             |  round(CAST(covered AS DOUBLE) / n_test, 6) AS coverage
             |FROM te ORDER BY event_type""".stripMargin)),

    // Simplified silhouette (Kaufman & Rousseeuw 1990 §2.2; the
    // centroid-distance simplification of Hruschka et al. 2004, the form
    // every large-scale library ships because the full silhouette is
    // O(n²)): the internal-validity audit for the x52 k-means clustering
    // the suite curates by — s(i) = (b−a)/max(a,b) with a = distance to
    // the OWN final centroid, b = the nearest OTHER centroid. Replays
    // the x52 fit exactly (same seeds/scale/2 Lloyd rounds via the
    // shared Quantized.lloydKmeansFixedK), then one assignment-shaped
    // pass against the k final centroids: distances use the identical
    // integer Σ(q·n−s)²/n² arithmetic x52's oracle replays, so argmin
    // and runner-up are engine-exact; per-row silhouettes round to 6 dp
    // and DECIMAL-sum per cluster. Scale shape: k-bounded broadcast
    // fan-out (n·k rows), a 16-row-per-vector window for rank-1/rank-2,
    // cluster-count aggregates — the same O(n·k) as assignment itself.
    QuerySpec(
      "x215_silhouette",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, dir)
        val cents = Quantized.lloydKmeansFixedK(emb, "vec_id", "embedding",
            k = 16, salt = "graft-kmeans-42:", scale = 1e4, iters = 2)
          .groupBy(col("cluster").cast("long").as("c"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, " +
            "sum_q))), r -> r.sum_q)").as("sums"),
            max(col("n")).as("n"))
        val qv = emb.select(col("vec_id"),
          Quantized.quantizeUdf(1e4)(col("embedding")).as("q"))
        val d = qv.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("c"),
            (expr("CAST(aggregate(zip_with(q, sums, (x, sv) -> " +
              "(x*n - sv)*(x*n - sv)), CAST(0 AS BIGINT), " +
              "(acc, x) -> acc + x) AS DOUBLE)") /
              (col("n").cast("double") * col("n"))).as("dist"))
        val rk = d.withColumn("rn",
          row_number().over(W.partitionBy("vec_id")
            .orderBy(col("dist"), col("c"))))
        val ab = rk.filter(col("rn") === 1)
          .select(col("vec_id"), col("c").as("cluster"),
            col("dist").as("a"))
          .join(rk.filter(col("rn") === 2)
            .select(col("vec_id"), col("dist").as("b")), "vec_id")
        ab.select(col("cluster"), col("a"), col("b"),
            when(greatest(col("a"), col("b")) > 0,
              round((col("b") - col("a")) / greatest(col("a"), col("b")),
                6)).otherwise(0.0).as("sil"))
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_vecs"),
            round(sum(round(col("a"), 6).cast("decimal(38,6)"))
              .cast("double") / count(lit(1)), 6).as("cohesion"),
            round(sum(round(col("b"), 6).cast("decimal(38,6)"))
              .cast("double") / count(lit(1)), 6).as("separation"),
            round(sum(col("sil").cast("decimal(38,6)")).cast("double") /
              count(lit(1)), 6).as("silhouette"))
          .orderBy("cluster")
      },
      Some("""WITH e AS (SELECT vec_id,
             |  [CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT) for x in embedding] AS q FROM embeddings),
             |s AS (SELECT (row_number() OVER (ORDER BY md5('graft-kmeans-42:' || CAST(vec_id AS VARCHAR)), vec_id) - 1) AS c, q
             |      FROM e QUALIFY c <= 15),
             |a1 AS (
             |  SELECT e.vec_id, s.c,
             |    list_sum([(e.q[i+1] - s.q[i+1])*(e.q[i+1] - s.q[i+1]) for i in range(0, len(e.q))]) AS d2
             |  FROM e CROSS JOIN s
             |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY d2, s.c) = 1),
             |m1 AS (SELECT a1.c, generate_subscripts(e.q, 1) AS pos, unnest(e.q) AS qv
             |       FROM a1 JOIN e USING (vec_id)),
             |c1 AS (SELECT c, pos, CAST(SUM(qv) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM m1 GROUP BY 1, 2),
             |c1arr AS (
             |  SELECT s.c,
             |    CASE WHEN COUNT(c1.sv) = 0 THEN s.q ELSE list(c1.sv ORDER BY c1.pos) END AS sums,
             |    CASE WHEN COUNT(c1.sv) = 0 THEN 1 ELSE any_value(c1.n) END AS n
             |  FROM s LEFT JOIN c1 USING (c) GROUP BY s.c, s.q),
             |a2 AS (
             |  SELECT e.vec_id, c1arr.c,
             |    CAST(list_sum([(e.q[i+1]*c1arr.n - c1arr.sums[i+1])*(e.q[i+1]*c1arr.n - c1arr.sums[i+1])
             |                   for i in range(0, len(e.q))]) AS DOUBLE)
             |      / (CAST(c1arr.n AS DOUBLE) * c1arr.n) AS dist
             |  FROM e CROSS JOIN c1arr
             |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dist, c1arr.c) = 1),
             |f AS (SELECT a2.c AS cluster, e.vec_id, generate_subscripts(e.q, 1) AS pos, unnest(e.q) AS qv
             |      FROM a2 JOIN e USING (vec_id)),
             |c2 AS (SELECT cluster, pos, CAST(SUM(qv) AS BIGINT) AS sv,
             |        CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
             |      FROM f GROUP BY 1, 2),
             |c2arr AS (SELECT cluster AS c, list(sv ORDER BY pos) AS sums,
             |        any_value(n) AS n FROM c2 GROUP BY 1),
             |d AS (SELECT e.vec_id, c2arr.c,
             |    CAST(list_sum([(e.q[i+1]*c2arr.n - c2arr.sums[i+1])*(e.q[i+1]*c2arr.n - c2arr.sums[i+1])
             |                   for i in range(0, len(e.q))]) AS DOUBLE)
             |      / (CAST(c2arr.n AS DOUBLE) * c2arr.n) AS dist
             |  FROM e CROSS JOIN c2arr),
             |rk AS (SELECT vec_id, c, dist,
             |        row_number() OVER (PARTITION BY vec_id
             |          ORDER BY dist, c) AS rn FROM d),
             |ab AS (SELECT r1.vec_id, r1.c AS cluster, r1.dist AS a,
             |        r2.dist AS b
             |      FROM rk r1 JOIN rk r2 ON r1.vec_id = r2.vec_id
             |        AND r1.rn = 1 AND r2.rn = 2),
             |sil AS (SELECT cluster, a, b,
             |        CASE WHEN greatest(a, b) > 0
             |          THEN round((b - a) / greatest(a, b), 6)
             |          ELSE 0.0 END AS sil FROM ab)
             |SELECT cluster, COUNT(*) AS n_vecs,
             |  round(CAST(SUM(CAST(round(a, 6) AS DECIMAL(38,6))) AS DOUBLE)
             |    / COUNT(*), 6) AS cohesion,
             |  round(CAST(SUM(CAST(round(b, 6) AS DECIMAL(38,6))) AS DOUBLE)
             |    / COUNT(*), 6) AS separation,
             |  round(CAST(SUM(CAST(sil AS DECIMAL(38,6))) AS DOUBLE)
             |    / COUNT(*), 6) AS silhouette
             |FROM sil GROUP BY 1 ORDER BY cluster""".stripMargin)),

    // Poisson bootstrap CI for the mean purchase value (Efron, AoS 7,
    // 1979, via the poissonized resampling of Chamandy, Muralidharan,
    // Najmi & Naidu 2012, "Estimating Uncertainty for Massive Data
    // Streams" — THE bootstrap that works on sharded data: multinomial
    // resampling needs global coordination, but Binomial(n,1/n) →
    // Poisson(1) per row as n→∞, so every row draws its B replicate
    // weights independently from its own hash). B=64 replicates.
    //
    // Draw cost (round-10 rewrite of the registry's 28 s hog): ONE md5
    // per (row, lane-group) — 8 digests per row, not 64 — each 128-bit
    // digest split into 8 × 16-bit hex lanes, so lane (g, j) seeds
    // replicate b = 8g + j. The Poisson(1) inverse CDF is a chained
    // integer `when` over precomputed thresholds ceil(cdf_k · 2^16)
    // (codegen'd comparisons; the old 13-element array-filter lambda was
    // an interpreted HigherOrderFunction per draw). A 16-bit uniform
    // truncates the weight at 7 (P[W≥8] ≈ 1.0e-5 — immaterial to a
    // 64-replicate CI and identical on both engines, since the oracle
    // replays the same integer lanes and thresholds). Replicate sums
    // are INTEGER (w·cents ≤ 1.2e6 per row) — order-exact, no bridge
    // needed; the CI is the (⌈(B+1)α⌉, B+1−⌈(B+1)α⌉) = (2nd, 63rd)
    // order-statistic pair of the 64 replicate means and the bootstrap
    // SE comes from rounded-6 DECIMAL moments over the 64-row frame.
    // Scale shape: the 64× fan-out map-side-combines into 64 cells —
    // ONE 64·partitions-row shuffle no matter the corpus size.
    QuerySpec(
      "x216_poisson_bootstrap",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // ceil(cdf_k * 65536) for Poisson(1) cdf at k = 0..6; thresholds
        // for k >= 7 are 65536 and can never fire on a 16-bit lane.
        val wExpr = "CASE WHEN u >= 65531 THEN 7L WHEN u >= 65498 THEN 6L " +
          "WHEN u >= 65297 THEN 5L WHEN u >= 64292 THEN 4L " +
          "WHEN u >= 60274 THEN 3L WHEN u >= 48219 THEN 2L " +
          "WHEN u >= 24110 THEN 1L ELSE 0L END"
        val purch = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            unix_micros(col("ts")).as("ep"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val est = purch.agg(count(lit(1)).as("n_rows"),
          sum(col("cents")).as("sc"))
        val reps = purch
          .select(col("user_id"), col("ep"), col("cents"),
            explode(expr("sequence(0, 7)")).as("g"))
          .select(col("cents"), col("g"),
            md5(concat_ws(":", lit("pb"), col("user_id"), col("ep"),
              col("cents"), col("g"))).as("dg"))
          .select(col("cents"), col("g"), col("dg"),
            explode(expr("sequence(0, 7)")).as("j"))
          .select((col("g") * 8 + col("j")).as("b"), col("cents"),
            conv(expr("substring(dg, j * 4 + 1, 4)"), 16, 10)
              .cast("long").as("u"))
          .withColumn("w", expr(wExpr))
          .groupBy("b")
          .agg(sum(col("w") * col("cents")).as("swc"),
            sum(col("w")).as("sw"))
          .select(col("b"),
            (col("swc").cast("double") / col("sw") / 100.0).as("m"))
        val rk = reps.withColumn("rn",
          row_number().over(W.orderBy(col("m"), col("b"))))
        val mom = reps.agg(
          sum(round(col("m"), 6).cast("decimal(38,6)")).cast("double")
            .as("sm"),
          sum(round(col("m") * col("m"), 6).cast("decimal(38,6)"))
            .cast("double").as("smm"),
          count(lit(1)).as("nb"))
        rk.filter(col("rn") === 2).select(col("m").as("lo"))
          .crossJoin(broadcast(rk.filter(col("rn") === 63)
            .select(col("m").as("hi"))))
          .crossJoin(broadcast(mom))
          .crossJoin(broadcast(est))
          .select(col("n_rows"), col("nb").as("n_boot"),
            round(col("sc").cast("double") / col("n_rows") / 100.0, 6)
              .as("est_mean"),
            round(sqrt((col("smm") - col("sm") * col("sm") / col("nb")) /
              (col("nb") - 1)), 6).as("boot_se"),
            round(col("lo"), 6).as("ci_lo"),
            round(col("hi"), 6).as("ci_hi"))
      },
      Some("""WITH purch AS (SELECT user_id, epoch_us(ts) AS ep,
             |        CAST(round(value * 100) AS BIGINT) AS cents
             |      FROM events WHERE event_type = 'purchase'),
             |est AS (SELECT COUNT(*) AS n_rows, SUM(cents) AS sc FROM purch),
             |digs AS (SELECT p.cents, g.g,
             |        md5('pb:' || CAST(p.user_id AS VARCHAR)
             |          || ':' || CAST(p.ep AS VARCHAR) || ':'
             |          || CAST(p.cents AS VARCHAR) || ':'
             |          || CAST(g.g AS VARCHAR)) AS dg
             |      FROM purch p CROSS JOIN range(0, 8) g(g)),
             |reps AS (SELECT d.cents, d.g * 8 + j.j AS b,
             |        CAST(('0x' || substr(d.dg, CAST(j.j * 4 + 1 AS INT), 4))
             |          AS BIGINT) AS u
             |      FROM digs d CROSS JOIN range(0, 8) j(j)),
             |wt AS (SELECT b, cents,
             |        CASE WHEN u >= 65531 THEN 7 WHEN u >= 65498 THEN 6
             |          WHEN u >= 65297 THEN 5 WHEN u >= 64292 THEN 4
             |          WHEN u >= 60274 THEN 3 WHEN u >= 48219 THEN 2
             |          WHEN u >= 24110 THEN 1 ELSE 0 END AS w
             |      FROM reps),
             |cells AS (SELECT b, SUM(w * cents) AS swc, SUM(w) AS sw
             |      FROM wt GROUP BY 1),
             |means AS (SELECT b, CAST(swc AS DOUBLE) / sw / 100.0 AS m
             |      FROM cells),
             |rk AS (SELECT m, b, row_number() OVER (ORDER BY m, b) AS rn
             |      FROM means),
             |mom AS (SELECT
             |        CAST(SUM(CAST(round(m, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sm,
             |        CAST(SUM(CAST(round(m * m, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS smm,
             |        COUNT(*) AS nb FROM means)
             |SELECT est.n_rows, CAST(mom.nb AS BIGINT) AS n_boot,
             |  round(CAST(est.sc AS DOUBLE) / est.n_rows / 100.0, 6)
             |    AS est_mean,
             |  round(sqrt((mom.smm - mom.sm * mom.sm / mom.nb)
             |    / (mom.nb - 1)), 6) AS boot_se,
             |  round(lo.m, 6) AS ci_lo, round(hi.m, 6) AS ci_hi
             |FROM (SELECT m FROM rk WHERE rn = 2) lo
             |CROSS JOIN (SELECT m FROM rk WHERE rn = 63) hi
             |CROSS JOIN mom CROSS JOIN est
             |ORDER BY est_mean""".stripMargin)),

    // Grid-accelerated DBSCAN (Ester, Kriegel, Sander & Xu, KDD 1996;
    // the cell-based neighborhood join of Gunawan 2013 / He et al.
    // "MR-DBSCAN" 2011): density clustering with NOISE — the cluster
    // reader x52's k-means can't give (k-means force-assigns outliers;
    // DBSCAN names them). Points are the 2-d JL projection of the
    // quantized embeddings (integer coords, the x12 device); eps =
    // range/64 derived from the data, minPts = 4. Candidates come ONLY
    // from the 3×3 adjacent-cell equi-join (each pair matches exactly
    // one (dx,dy), so no dedup is needed); the exact integer d² ≤ eps²
    // test verifies. Core points (≥ minPts−1 neighbors) cluster via 3
    // unrolled hash-min rounds over core-core edges (the x170 HCC
    // device, with the same changed-in-round-3 honesty probe); border
    // points adopt the MIN neighboring core label; the rest is noise.
    // Five rounds (not x170's three): the eps-graph of a 2-d blob has
    // longer chains than the co-occurrence graph, and the probe showed
    // round 3 still moving one label here. Scale shape: everything is
    // equi-joins on cell keys and bounded aggregates — but eps is a
    // DENSITY parameter: the fixed 64-wide grid keeps per-cell occupancy
    // bounded only at fixed corpus density, so a 100 TB run re-derives
    // eps (finer grid) the same way this query derives it from min/max.
    QuerySpec(
      "x217_grid_dbscan",
      (s, dir) => {
        val p = Tables.embeddings(s, dir).select(col("vec_id"),
            Quantized.projectUdf(2)(
              Quantized.quantizeUdf(1e4)(col("embedding"))).as("pr"))
          .select(col("vec_id"), col("pr")(0).as("px"), col("pr")(1).as("py"))
        val mm = p.agg(min(col("px")).as("mnx"), max(col("px")).as("mxx"),
            min(col("py")).as("mny"), max(col("py")).as("mxy"))
          .select(col("mnx"), col("mny"),
            expr("greatest(mxx - mnx, mxy - mny) div 64 + 1").as("eps"))
        val pts = p.crossJoin(broadcast(mm))
          .select(col("vec_id"), (col("px") - col("mnx")).as("x"),
            (col("py") - col("mny")).as("y"), col("eps"))
          .withColumn("cx", expr("x div eps"))
          .withColumn("cy", expr("y div eps"))
          .localCheckpoint() // feeds probes, the cell join, degrees, totals
        val probes = pts
          .withColumn("dx", explode(expr("array(-1L, 0L, 1L)")))
          .withColumn("dy", explode(expr("array(-1L, 0L, 1L)")))
          .select(col("vec_id").as("va"), col("x").as("xa"),
            col("y").as("ya"), col("eps"),
            (col("cx") + col("dx")).as("qx"),
            (col("cy") + col("dy")).as("qy"))
        val nb = probes.join(
            pts.select(col("vec_id").as("vb"), col("x").as("xb"),
              col("y").as("yb"), col("cx").as("bx"), col("cy").as("by")),
            col("bx") === col("qx") && col("by") === col("qy") &&
              col("va") =!= col("vb"))
          .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
            (col("ya") - col("yb")) * (col("ya") - col("yb")) <=
            col("eps") * col("eps"))
          .select(col("va"), col("vb"))
          .localCheckpoint() // pair list feeds degree, edges, and borders
        val deg = nb.groupBy(col("va").as("vec_id"))
          .agg(count(lit(1)).as("n_nb"))
        val core = pts.join(deg, Seq("vec_id"), "left")
          .filter(coalesce(col("n_nb"), lit(0L)) + 1 >= 4)
          .select("vec_id")
        val ce = nb
          .join(core.select(col("vec_id").as("va")), "va")
          .join(core.select(col("vec_id").as("vb")), "vb")
          .select(col("va").as("src"), col("vb").as("dst"))
          .localCheckpoint()
        var lab = core.select(col("vec_id").as("v"),
          col("vec_id").as("lab"))
        var prev: org.apache.spark.sql.DataFrame = null
        (1 to 5).foreach { _ =>
          prev = lab
          lab = ce.join(lab.select(col("v").as("src"), col("lab")), "src")
            .select(col("dst").as("v"), col("lab"))
            .union(lab)
            .groupBy("v").agg(min(col("lab")).as("lab"))
            .localCheckpoint()
        }
        val changed = lab.as("a")
          .join(prev.as("b"), col("a.v") === col("b.v"))
          .filter(col("a.lab") =!= col("b.lab"))
          .agg(count(lit(1)).as("n_changed_last_round"))
        val border = nb
          .join(core.select(col("vec_id").as("va")), Seq("va"), "left_anti")
          .join(lab.select(col("v").as("vb"), col("lab")), "vb")
          .groupBy(col("va").as("v")).agg(min(col("lab")).as("lab"))
        val nCore = core.agg(count(lit(1)).as("n_core"))
        val nBorder = border.agg(count(lit(1)).as("n_border"))
        val nAll = pts.agg(count(lit(1)).as("n_pts"))
        val asg = lab.unionByName(border)
        asg.groupBy("lab").agg(count(lit(1)).as("size"))
          .groupBy("size").agg(count(lit(1)).as("n_clusters"),
            min(col("lab")).cast("long").as("min_root"))
          .crossJoin(broadcast(nCore)).crossJoin(broadcast(nBorder))
          .crossJoin(broadcast(nAll)).crossJoin(broadcast(changed))
          .select(col("size"), col("n_clusters"), col("min_root"),
            col("n_core"), col("n_border"),
            (col("n_pts") - col("n_core") - col("n_border")).as("n_noise"),
            col("n_changed_last_round"))
          .orderBy("size")
      },
      Some("""WITH e AS (SELECT vec_id,
             |  [CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT) for x in embedding] AS q FROM embeddings),
             |p AS (SELECT vec_id,
             |  CAST(list_sum([q[i+1] * (1 - 2*(((((i*2+0)*1103515245 + 12345) % 2147483648) // 65536) % 2))
             |                 for i in range(0, len(q))]) AS BIGINT) AS px,
             |  CAST(list_sum([q[i+1] * (1 - 2*(((((i*2+1)*1103515245 + 12345) % 2147483648) // 65536) % 2))
             |                 for i in range(0, len(q))]) AS BIGINT) AS py
             |  FROM e),
             |mm AS (SELECT MIN(px) AS mnx, MIN(py) AS mny,
             |        greatest(MAX(px) - MIN(px), MAX(py) - MIN(py)) // 64 + 1
             |          AS eps FROM p),
             |pts AS (SELECT vec_id, px - mnx AS x, py - mny AS y,
             |        (px - mnx) // eps AS cx, (py - mny) // eps AS cy, eps
             |      FROM p CROSS JOIN mm),
             |dd AS (SELECT a.dx, b.dy FROM (VALUES (-1), (0), (1)) a(dx)
             |      CROSS JOIN (VALUES (-1), (0), (1)) b(dy)),
             |nb AS (SELECT a.vec_id AS va, b.vec_id AS vb
             |      FROM pts a CROSS JOIN dd
             |      JOIN pts b ON b.cx = a.cx + dd.dx AND b.cy = a.cy + dd.dy
             |        AND b.vec_id <> a.vec_id
             |      WHERE (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y)
             |        <= a.eps * a.eps),
             |deg AS (SELECT va AS vec_id, COUNT(*) AS n_nb FROM nb GROUP BY 1),
             |core AS (SELECT p2.vec_id FROM pts p2
             |      LEFT JOIN deg ON deg.vec_id = p2.vec_id
             |      WHERE COALESCE(deg.n_nb, 0) + 1 >= 4),
             |ce AS (SELECT nb.va AS src, nb.vb AS dst FROM nb
             |      JOIN core c1 ON c1.vec_id = nb.va
             |      JOIN core c2 ON c2.vec_id = nb.vb),
             |l0 AS (SELECT vec_id AS v, vec_id AS lab FROM core),
             |l1 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT ce.dst AS v, l.lab FROM ce JOIN l0 l ON l.v = ce.src
             |        UNION ALL SELECT v, lab FROM l0) GROUP BY 1),
             |l2 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT ce.dst AS v, l.lab FROM ce JOIN l1 l ON l.v = ce.src
             |        UNION ALL SELECT v, lab FROM l1) GROUP BY 1),
             |l3 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT ce.dst AS v, l.lab FROM ce JOIN l2 l ON l.v = ce.src
             |        UNION ALL SELECT v, lab FROM l2) GROUP BY 1),
             |l4 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT ce.dst AS v, l.lab FROM ce JOIN l3 l ON l.v = ce.src
             |        UNION ALL SELECT v, lab FROM l3) GROUP BY 1),
             |l5 AS (SELECT v, MIN(lab) AS lab FROM (
             |        SELECT ce.dst AS v, l.lab FROM ce JOIN l4 l ON l.v = ce.src
             |        UNION ALL SELECT v, lab FROM l4) GROUP BY 1),
             |ch AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_changed_last_round
             |      FROM l5 JOIN l4 ON l4.v = l5.v AND l4.lab <> l5.lab),
             |border AS (SELECT nb.va AS v, MIN(l5.lab) AS lab
             |      FROM nb JOIN l5 ON l5.v = nb.vb
             |      LEFT JOIN core c1 ON c1.vec_id = nb.va
             |      WHERE c1.vec_id IS NULL GROUP BY 1),
             |tots AS (SELECT
             |        (SELECT COUNT(*) FROM core) AS n_core,
             |        (SELECT COUNT(*) FROM border) AS n_border,
             |        (SELECT COUNT(*) FROM pts) AS n_pts),
             |asg AS (SELECT v, lab FROM l5 UNION ALL
             |        SELECT v, lab FROM border),
             |cs AS (SELECT lab, COUNT(*) AS size FROM asg GROUP BY 1)
             |SELECT CAST(size AS BIGINT) AS size,
             |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
             |  CAST(MIN(lab) AS BIGINT) AS min_root,
             |  CAST(tots.n_core AS BIGINT) AS n_core,
             |  CAST(tots.n_border AS BIGINT) AS n_border,
             |  CAST(tots.n_pts - tots.n_core - tots.n_border AS BIGINT)
             |    AS n_noise,
             |  ch.n_changed_last_round
             |FROM cs CROSS JOIN tots CROSS JOIN ch
             |GROUP BY size, tots.n_core, tots.n_border, tots.n_pts,
             |  ch.n_changed_last_round
             |ORDER BY size""".stripMargin)),

    // Interpolated Kneser-Ney bigram LM (Kneser & Ney, ICASSP 1995;
    // Chen & Goodman, Harvard TR-10-98 — the smoothing inside KenLM,
    // i.e. the actual CCNet/quality-filter perplexity model, where
    // x44's add-one is the classroom baseline): train on even doc_ids,
    // score held-out odd docs per source. P(w2|w1) = max(c12−D,0)/c1 +
    // D·N1+(w1,·)/c1 · Pcont(w2), D = 0.75, with the CONTINUATION
    // probability Pcont(w2) = (N1+(·,w2)+1)/(T+V) — distinct-context
    // counts, not raw frequency (the Kneser insight: "Francisco" is
    // frequent but follows only "San"), +1/V-floored so unseen held-out
    // words score finitely instead of ln 0. Unseen w1 backs off to
    // Pcont alone. Per-bigram ln rounds to 6 dp into DECIMAL sums (the
    // x44 device). Scale shape: identical to x44 — shuffles keyed on
    // bigram, first-word, and second-word, all size-driven joins, one
    // bounded per-source reduce.
    QuerySpec(
      "x218_kneser_ney",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextFunctions.tokens(col("text")).as("ws"))
          .filter(size(col("ws")) >= 2)
        val big = toks.select(col("doc_id"), col("source"),
            explode(expr("transform(sequence(0, size(ws)-2), " +
              "i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
          .select(col("doc_id"), col("source"),
            col("b.w1").as("w1"), col("b.w2").as("w2"))
        val bg = big.filter(col("doc_id") % 2 === 0)
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          .localCheckpoint() // feeds c1, continuation counts, totals, scoring
        val c1 = bg.groupBy("w1")
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
        val cont = bg.groupBy("w2").agg(count(lit(1)).as("nc"))
        val tots = bg.agg(count(lit(1)).as("tbt"))
        val vc = cont.agg(count(lit(1)).as("vc"))
        val pcont = (coalesce(col("nc"), lit(0L)) + 1).cast("double") /
          (col("tbt") + col("vc"))
        val p = when(col("c1").isNull, pcont)
          .otherwise(
            greatest(coalesce(col("c12"), lit(0L)).cast("double") - 0.75,
              lit(0.0)) / col("c1") +
              lit(0.75) * col("n1p") / col("c1") * pcont)
        big.filter(col("doc_id") % 2 === 1)
          .join(bg, Seq("w1", "w2"), "left")
          .join(c1, Seq("w1"), "left")
          .join(cont, Seq("w2"), "left")
          .crossJoin(broadcast(tots)).crossJoin(broadcast(vc))
          .select(col("doc_id"), col("source"),
            round(log(p), 6).cast("decimal(18,6)").as("lp"))
          .groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_bigrams"),
            round(-sum(col("lp")).cast("double") / count(lit(1)), 6)
              .as("xent"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |        list_filter(regexp_split_to_array(trim(text), '\s+'),
             |          x -> x <> '') AS ws FROM documents),
             |big AS (SELECT doc_id, source, ws[i] AS w1, ws[i+1] AS w2
             |      FROM d, unnest(range(1, len(ws))) r(i)
             |      WHERE len(ws) >= 2),
             |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM big
             |      WHERE doc_id % 2 = 0 GROUP BY 1, 2),
             |c1 AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p
             |      FROM bg GROUP BY 1),
             |cont AS (SELECT w2, COUNT(*) AS nc FROM bg GROUP BY 1),
             |tots AS (SELECT COUNT(*) AS tbt FROM bg),
             |vcq AS (SELECT COUNT(*) AS vc FROM cont),
             |sc AS (SELECT te.doc_id, te.source,
             |        CAST(round(ln(CASE WHEN c1.c1 IS NULL
             |          THEN CAST(COALESCE(cont.nc, 0) + 1 AS DOUBLE)
             |            / (tots.tbt + vcq.vc)
             |          ELSE greatest(CAST(COALESCE(bg.c12, 0) AS DOUBLE)
             |              - 0.75, 0.0)
             |            / c1.c1 + 0.75 * c1.n1p / c1.c1 *
             |            (CAST(COALESCE(cont.nc, 0) + 1 AS DOUBLE)
             |              / (tots.tbt + vcq.vc))
             |          END), 6) AS DECIMAL(18,6)) AS lp
             |      FROM big te
             |      LEFT JOIN bg ON bg.w1 = te.w1 AND bg.w2 = te.w2
             |      LEFT JOIN c1 ON c1.w1 = te.w1
             |      LEFT JOIN cont ON cont.w2 = te.w2
             |      CROSS JOIN tots CROSS JOIN vcq
             |      WHERE te.doc_id % 2 = 1)
             |SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
             |  COUNT(*) AS n_bigrams,
             |  round(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS xent
             |FROM sc GROUP BY 1 ORDER BY source""".stripMargin)),

    // Pairwise Jensen-Shannon divergence between source unigram
    // distributions (Lin, IEEE-IT 37, 1991): the SYMMETRIC, bounded
    // [0, ln2] source-similarity matrix — where x105's PSI needs a
    // designated baseline and KL blows up on disjoint support, JSD is a
    // metric (its √ is — Endres & Schindelin 2003) over all 45 source
    // pairs at once. Key scale device: words on ONE side only
    // contribute exactly (ln2)/2 of their mass, so
    // JSD = ½Σ_common[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
    //     + (ln2)/2·[(1−P_common) + (1−Q_common)]
    // needs only the INNER self-join on word (per-word fan-out bounded
    // by #sources) plus per-pair common-mass sums — no outer join, no
    // per-pair vocabulary union materialization. ln terms round to 15 dp
    // (they can be ~1e-9 yet sum to O(1)) into DECIMAL(28,15) bridges;
    // ln2 is a literal, so no transcendental runs on engine-divergent
    // inputs. Scale shape: one token scan, a word-keyed self-join, a
    // 45-row reduce.
    QuerySpec(
      "x219_js_divergence",
      (s, dir) => {
        val ln2 = 0.6931471805599453
        val wc = Tables.documents(s, dir)
          .select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        val ns = wc.groupBy("source").agg(sum(col("c")).as("n"))
        val sw = wc.join(ns, "source")
        val j = sw.as("a").join(sw.as("b"),
            col("a.w") === col("b.w") && col("a.source") < col("b.source"))
          .select(col("a.source").as("s1"), col("b.source").as("s2"),
            (col("a.c").cast("double") / col("a.n")).as("p"),
            (col("b.c").cast("double") / col("b.n")).as("q"))
        j.groupBy("s1", "s2")
          .agg(count(lit(1)).as("n_common"),
            sum(round(col("p") * log(lit(2.0) * col("p") /
              (col("p") + col("q"))), 15).cast("decimal(28,15)"))
              .cast("double").as("t1"),
            sum(round(col("q") * log(lit(2.0) * col("q") /
              (col("p") + col("q"))), 15).cast("decimal(28,15)"))
              .cast("double").as("t2"),
            sum(round(col("p"), 15).cast("decimal(28,15)")).cast("double")
              .as("pc"),
            sum(round(col("q"), 15).cast("decimal(28,15)")).cast("double")
              .as("qc"))
          .select(col("s1"), col("s2"), col("n_common"),
            round(lit(0.5) * (col("t1") + col("t2")) +
              lit(0.5) * lit(ln2) *
              ((lit(1.0) - col("pc")) + (lit(1.0) - col("qc"))), 6)
              .as("jsd"),
            round(sqrt(lit(0.5) * (col("t1") + col("t2")) +
              lit(0.5) * lit(ln2) *
              ((lit(1.0) - col("pc")) + (lit(1.0) - col("qc")))), 6)
              .as("js_dist"))
          .orderBy("s1", "s2")
      },
      Some("""WITH t AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS w FROM documents),
             |wc AS (SELECT source, w, COUNT(*) AS c FROM t GROUP BY 1, 2),
             |ns AS (SELECT source, SUM(c) AS n FROM wc GROUP BY 1),
             |sw AS (SELECT wc.source, wc.w, wc.c, ns.n
             |      FROM wc JOIN ns ON ns.source = wc.source),
             |j AS (SELECT a.source AS s1, b.source AS s2,
             |        CAST(a.c AS DOUBLE) / a.n AS p,
             |        CAST(b.c AS DOUBLE) / b.n AS q
             |      FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source),
             |agg AS (SELECT s1, s2, COUNT(*) AS n_common,
             |        CAST(SUM(CAST(round(p * ln(2.0 * p / (p + q)), 15)
             |          AS DECIMAL(28,15))) AS DOUBLE) AS t1,
             |        CAST(SUM(CAST(round(q * ln(2.0 * q / (p + q)), 15)
             |          AS DECIMAL(28,15))) AS DOUBLE) AS t2,
             |        CAST(SUM(CAST(round(p, 15) AS DECIMAL(28,15)))
             |          AS DOUBLE) AS pc,
             |        CAST(SUM(CAST(round(q, 15) AS DECIMAL(28,15)))
             |          AS DOUBLE) AS qc
             |      FROM j GROUP BY 1, 2)
             |SELECT s1, s2, n_common,
             |  round(0.5 * (t1 + t2) + 0.5 * 0.6931471805599453 *
             |    ((1.0 - pc) + (1.0 - qc)), 6) AS jsd,
             |  round(sqrt(0.5 * (t1 + t2) + 0.5 * 0.6931471805599453 *
             |    ((1.0 - pc) + (1.0 - qc))), 6) AS js_dist
             |FROM agg ORDER BY s1, s2""".stripMargin)),

    // Tukey-Kramer HSD post-hoc (Tukey 1949 "Comparing Individual Means
    // in the Analysis of Variance", Biometrics 5; Kramer, Biometrics 12,
    // 1956 for unequal n): WHICH groups differ once an omnibus F (x157/
    // x209's family) fires — the all-pairs follow-up that controls the
    // familywise rate by the studentized-range law, where x195's BH
    // controls FDR over arbitrary families. All 10 event-type pairs:
    // q = |ȳᵢ−ȳⱼ| / √(MSW/2·(1/nᵢ+1/nⱼ)) against q₀.₀₅(5,∞) = 3.858
    // (Harter 1960 table, df→∞ since n ≫ 1000). Group means and the
    // pooled MSW come from exact integer cents moments (n, Σc, Σc² —
    // the x133 discipline), so every statistic is a fixed-order IEEE
    // expression; the 5-row within-group SS reduction is the only sum
    // and rides a DECIMAL(38,6) bridge. Scale shape: one scan to 5
    // moment rows, a 10-row self-join — nothing else.
    QuerySpec(
      "x220_tukey_hsd",
      (s, dir) => {
        val g = Tables.events(s, dir)
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            sum(col("c") * col("c")).as("scc"))
          .localCheckpoint() // 5 rows feed MSW and the pair grid
        val msw = g.agg(
            sum(round((col("scc").cast("double") -
              col("sc").cast("double") * col("sc") / col("n")) / 10000.0,
              6).cast("decimal(38,6)")).cast("double").as("ssw"),
            sum(col("n")).as("nn"), count(lit(1)).as("k"))
          .select((col("ssw") / (col("nn") - col("k"))).as("msw"))
        val m = col("sc").cast("double") / col("n") / 100.0
        val pairs = g.as("a").join(g.as("b"),
            col("a.event_type") < col("b.event_type"))
          .crossJoin(broadcast(msw))
          .select(col("a.event_type").as("g1"),
            col("b.event_type").as("g2"),
            col("a.n").as("n1"), col("b.n").as("n2"),
            (col("a.sc").cast("double") / col("a.n") / 100.0 -
              col("b.sc").cast("double") / col("b.n") / 100.0).as("diff"),
            sqrt(col("msw") / 2.0 *
              (lit(1.0) / col("a.n") + lit(1.0) / col("b.n"))).as("se"))
        pairs.select(col("g1"), col("g2"), col("n1"), col("n2"),
            round(col("diff"), 6).as("mean_diff"),
            round(abs(col("diff")) / col("se"), 6).as("q_stat"),
            when(abs(col("diff")) / col("se") > 3.858, "differs")
              .otherwise("no evidence").as("verdict"))
          .orderBy("g1", "g2")
      },
      Some("""WITH g AS (SELECT event_type, COUNT(*) AS n,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS sc,
             |        SUM(CAST(round(value * 100) AS BIGINT) *
             |            CAST(round(value * 100) AS BIGINT)) AS scc
             |      FROM events GROUP BY 1),
             |msw AS (SELECT CAST(SUM(CAST(round((CAST(scc AS DOUBLE) -
             |          CAST(sc AS DOUBLE) * sc / n) / 10000.0, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE)
             |          / (SUM(n) - COUNT(*)) AS msw FROM g),
             |pairs AS (SELECT a.event_type AS g1, b.event_type AS g2,
             |        a.n AS n1, b.n AS n2,
             |        CAST(a.sc AS DOUBLE) / a.n / 100.0 -
             |          CAST(b.sc AS DOUBLE) / b.n / 100.0 AS diff,
             |        sqrt(msw.msw / 2.0 * (1.0 / a.n + 1.0 / b.n)) AS se
             |      FROM g a JOIN g b ON a.event_type < b.event_type
             |      CROSS JOIN msw)
             |SELECT g1, g2, n1, n2, round(diff, 6) AS mean_diff,
             |  round(abs(diff) / se, 6) AS q_stat,
             |  CASE WHEN abs(diff) / se > 3.858 THEN 'differs'
             |    ELSE 'no evidence' END AS verdict
             |FROM pairs ORDER BY g1, g2""".stripMargin)),

    // Weighted reservoir sampling per stratum (Efraimidis & Spirakis, IPL
    // 97, 2006, algorithm A-ES): draw a FIXED-SIZE sample of k=10 docs per
    // source with inclusion probability proportional to weight — the
    // standard "pick a training subset by quality weight within each
    // domain" primitive (x65's bounded top-k is global top-by-weight;
    // x49's stratified sample is unweighted-rate; this is per-stratum
    // fixed-k weighted-without-replacement). A-ES keys each row with
    // u^(1/w) (equivalently ln(u)/w, same order) for u uniform in (0,1]
    // and keeps the k largest keys per stratum; the key is derived from a
    // per-row md5 (48-bit lane, +1 so u>0), so the draw replays exactly in
    // SQL. Weight = n_chars (longer docs proportionally likelier — swap in
    // any quality score). Scale shape: rank() <= k over
    // (stratum, key desc) plans a WindowGroupLimit — Partial+Final rank
    // pushdown keeps <= k rows per map partition BEFORE the stratum
    // shuffle, so the shuffle moves O(k · partitions · strata) rows, not
    // the corpus; key order is continuous (distinct 48-bit uniforms), so
    // cross-engine ULP flips need two keys within ~1e-16 of each other —
    // never at these densities.
    // (implementation lives in [[Reservoir]] — the shared core the
    // streaming twin [[graft.streaming.ReservoirStream]] re-ranks
    // through, so the stream inherits these oracle-checked semantics)
    QuerySpec(
      "x221_weighted_reservoir",
      (s, dir) => Reservoir.sample(Tables.documents(s, dir), 10),
      Some("""WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
             |      FROM documents WHERE n_chars > 0),
             |k AS (SELECT doc_id, source, n_chars,
             |        ln((CAST(('0x' || substr(md5('wrs:' ||
             |            CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1.0)
             |          / 281474976710657.0) / n_chars AS key
             |      FROM d),
             |r AS (SELECT source, doc_id, n_chars, key,
             |        row_number() OVER (PARTITION BY source
             |          ORDER BY key DESC, doc_id) AS rank FROM k)
             |SELECT source, rank, doc_id, n_chars,
             |  round(key * 1e6, 6) AS key_ppm
             |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin)),

    // Heaps'-law vocabulary-growth fit (Heaps 1978; Herdan 1960):
    // V(n) = K·n^β — how fast the type inventory grows as the corpus
    // does, THE capacity question behind tokenizer sizing and
    // dedup-payoff forecasts (β near 1 = unbounded novelty, e.g.
    // boilerplate IDs; lower β = saturating reuse). Types are WORD
    // TRIGRAM shingles (the x2/x4 dedup unit — and the harness corpus
    // has a 31-word closed unigram vocabulary, which saturates in the
    // first prefix; trigram contexts are what actually grow). The
    // at-scale trick: V(n) at a prefix is #{types whose FIRST occurrence
    // falls inside it} — one min(doc_id) aggregate per type, never a
    // distinct-count per prefix. 20 integer doc-id thresholds bucket
    // both docs and first occurrences; prefix counts are cumulative
    // sums over the 20-row grid (aggregate below window = Rule-1
    // escape); the fit is the x174 log-log OLS with rounded-6
    // DECIMAL-bridged terms. exp appears once, on the final rounded
    // intercept (the x206/x211 precedent).
    QuerySpec(
      "x222_heaps_law",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val bounds = docs.agg(min(col("doc_id")).as("lo"),
          (max(col("doc_id")) - min(col("doc_id")) + 1L).as("span"))
        val grid = s.range(20).toDF("b")
        val dbkt = docs.crossJoin(broadcast(bounds))
          .select(expr("(doc_id - lo) * 20 div span").as("b"))
          .groupBy("b").agg(count(lit(1)).as("nd"))
        val wbkt = docs
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(ws) - 3), " +
              "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))")).as("w"))
          .groupBy("w").agg(min(col("doc_id")).as("fd"))
          .crossJoin(broadcast(bounds))
          .select(expr("(fd - lo) * 20 div span").as("b"))
          .groupBy("b").agg(count(lit(1)).as("nv"))
        val wc = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
        val pref = grid
          .join(dbkt, Seq("b"), "left").na.fill(0L, Seq("nd"))
          .join(wbkt, Seq("b"), "left").na.fill(0L, Seq("nv"))
          .withColumn("n", sum(col("nd")).over(wc))
          .withColumn("v", sum(col("nv")).over(wc))
          .filter(col("n") > 0 && col("v") > 0)
        val terms = pref.select(
          round(log(col("n").cast("double")), 6).as("x"),
          round(log(col("v").cast("double")), 6).as("y"),
          col("n"), col("v"))
        val m = terms.agg(count(lit(1)).as("np"),
          max(col("n")).as("n_docs"), max(col("v")).as("n_types"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
          sum(round(col("x") * col("y"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxy"),
          sum(round(col("x") * col("x"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxx"))
        val slope = (col("np") * col("sxy") - col("sx") * col("sy")) /
          (col("np") * col("sxx") - col("sx") * col("sx"))
        m.select(col("np").as("n_points"), col("n_docs"), col("n_types"),
            (round(slope, 6) + lit(0.0)).as("heaps_beta"),
            round(exp(round((col("sy") - slope * col("sx")) / col("np"), 6)),
              6).as("heaps_k"))
          .orderBy("n_points")
      },
      Some("""WITH bounds AS (SELECT MIN(doc_id) AS lo,
             |        MAX(doc_id) - MIN(doc_id) + 1 AS span FROM documents),
             |dbkt AS (SELECT (d.doc_id - b.lo) * 20 // b.span
             |          AS b, COUNT(*) AS nd
             |      FROM documents d CROSS JOIN bounds b GROUP BY 1),
             |tk AS (SELECT doc_id, list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> '')
             |        AS toks
             |      FROM documents),
             |t AS (SELECT doc_id,
             |        unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                for i in range(1, len(toks) - 1)]) AS w
             |      FROM tk WHERE len(toks) >= 3),
             |fw AS (SELECT w, MIN(doc_id) AS fd FROM t GROUP BY 1),
             |wbkt AS (SELECT (f.fd - b.lo) * 20 // b.span
             |          AS b, COUNT(*) AS nv
             |      FROM fw f CROSS JOIN bounds b GROUP BY 1),
             |grid AS (SELECT g.g AS b FROM range(0, 20) g(g)),
             |pref AS (SELECT grid.b,
             |        SUM(COALESCE(dbkt.nd, 0)) OVER (ORDER BY grid.b
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS n,
             |        SUM(COALESCE(wbkt.nv, 0)) OVER (ORDER BY grid.b
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS v
             |      FROM grid LEFT JOIN dbkt ON dbkt.b = grid.b
             |      LEFT JOIN wbkt ON wbkt.b = grid.b),
             |terms AS (SELECT round(ln(CAST(n AS DOUBLE)), 6) AS x,
             |        round(ln(CAST(v AS DOUBLE)), 6) AS y, n, v
             |      FROM pref WHERE n > 0 AND v > 0),
             |m AS (SELECT COUNT(*) AS np, MAX(n) AS n_docs,
             |        MAX(v) AS n_types,
             |        CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxy,
             |        CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxx
             |      FROM terms)
             |SELECT CAST(np AS BIGINT) AS n_points,
             |  CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  round((np * sxy - sx * sy) / (np * sxx - sx * sx), 6) + 0.0
             |    AS heaps_beta,
             |  round(exp(round((sy - ((np * sxy - sx * sy) /
             |      (np * sxx - sx * sx)) * sx) / np, 6)), 6) AS heaps_k
             |FROM m ORDER BY n_points""".stripMargin)),


    // Newman-Girvan modularity (Newman & Girvan, PRE 69, 2004; Newman,
    // PNAS 103, 2006): Q = Σ_c [ w_in(c)/W − (vol(c)/W)² ] over the x120
    // LPA partition of the item co-occurrence graph — the OBJECTIVE-value
    // audit complementing x199's per-community conductance (conductance
    // reads each community's boundary; modularity scores the partition
    // against the degree-preserving null model, the quantity Louvain
    // maximizes). All masses are exact integer sums over the directed
    // edge list joined twice to the label table (the x183/x199 shape);
    // each community's contribution is one rational expression rounded
    // to 6 — Q is their DECIMAL-bridged sum, emitted alongside.
    QuerySpec(
      "x223_modularity",
      (s, dir) => {
        val edges = itemEdges(s, dir, 3).localCheckpoint()
        val lab = Graph.labelPropagation(edges, rounds = 3)
        val ed = edges
          .join(lab.select(col("v").as("src"), col("lab").as("ls")), "src")
          .join(lab.select(col("v").as("dst"), col("lab").as("ld")), "dst")
        val per = ed.groupBy("ls").agg(
          sum(when(col("ls") === col("ld"), col("w")).otherwise(0L))
            .as("w_in"),
          sum(col("w")).as("vol"))
        val tot = per.agg(sum(col("vol")).as("wt"))
        val nn = lab.groupBy("lab").agg(count(lit(1)).as("n_nodes"))
        val contrib = per.join(nn, col("ls") === col("lab"))
          .crossJoin(broadcast(tot))
          .select(col("ls").as("community"), col("n_nodes"),
            col("w_in"), col("vol"),
            round(col("w_in").cast("double") / col("wt") -
              (col("vol").cast("double") / col("wt")) *
              (col("vol").cast("double") / col("wt")), 6).as("q_contrib"))
          .localCheckpoint() // community-bounded; feeds rows + the Q total
        val q = contrib.agg(
          sum(col("q_contrib").cast("decimal(18,6)")).cast("double")
            .as("q_total"))
        contrib.crossJoin(broadcast(q))
          .select(col("community"), col("n_nodes"), col("w_in"), col("vol"),
            col("q_contrib"), round(col("q_total"), 6).as("modularity"))
          .orderBy("community")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS item FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |       FROM ctx a JOIN ctx b ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst, w FROM pc UNION ALL SELECT ib, ia, w FROM pc),
             |lab0 AS (SELECT DISTINCT src AS v, src AS lab FROM e),
             |s1 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab0 l ON l.v = e.src GROUP BY 1, 2),
             |lab1 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s1)
             |  WHERE rn = 1),
             |s2 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab1 l ON l.v = e.src GROUP BY 1, 2),
             |lab2 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s2)
             |  WHERE rn = 1),
             |s3 AS (SELECT e.dst, l.lab, SUM(e.w) AS ws FROM e JOIN lab2 l ON l.v = e.src GROUP BY 1, 2),
             |lab3 AS (SELECT dst AS v, lab FROM (
             |    SELECT dst, lab, row_number() OVER (PARTITION BY dst ORDER BY ws DESC, lab) AS rn FROM s3)
             |  WHERE rn = 1),
             |ed AS (SELECT e.src, e.dst, e.w, a.lab AS ls, b.lab AS ld
             |      FROM e JOIN lab3 a ON a.v = e.src JOIN lab3 b ON b.v = e.dst),
             |per AS (SELECT ls, SUM(CASE WHEN ls = ld THEN w ELSE 0 END) AS w_in,
             |        SUM(w) AS vol FROM ed GROUP BY 1),
             |tot AS (SELECT SUM(vol) AS wt FROM per),
             |nn AS (SELECT lab, COUNT(*) AS n_nodes FROM lab3 GROUP BY 1),
             |contrib AS (SELECT per.ls AS community, nn.n_nodes,
             |        CAST(per.w_in AS BIGINT) AS w_in,
             |        CAST(per.vol AS BIGINT) AS vol,
             |        round(CAST(per.w_in AS DOUBLE) / tot.wt -
             |          (CAST(per.vol AS DOUBLE) / tot.wt) *
             |          (CAST(per.vol AS DOUBLE) / tot.wt), 6) AS q_contrib
             |      FROM per JOIN nn ON nn.lab = per.ls CROSS JOIN tot),
             |q AS (SELECT CAST(SUM(CAST(q_contrib AS DECIMAL(18,6)))
             |        AS DOUBLE) AS q_total FROM contrib)
             |SELECT community, n_nodes, w_in, vol, q_contrib,
             |  round(q.q_total, 6) AS modularity
             |FROM contrib CROSS JOIN q ORDER BY community""".stripMargin)),


    // Classical additive seasonal decomposition + seasonal/trend STRENGTH
    // (Macaulay 1931 moving-average decomposition — the "Decomposition"
    // chapter of Hyndman-Athanasopoulos FPP, incl. its F_T/F_S strength
    // measures): daily event volume = trend (centered 7-day MA) +
    // day-of-week seasonal + remainder, then F = max(0, 1 −
    // Var(R)/Var(component + R)) says how much structure each component
    // actually explains — the one-number read x136's per-DOW indices
    // don't give. Day cells are calendar-bounded (zero-filled via
    // sequence over the min..max span); the MA window is 7 rows over the
    // aggregate-bounded day grid (Rule-1 escape); DOW = epoch-day % 7
    // (the x136 convention — immune to engine dayofweek disagreements);
    // detrended values round to 6 and every mean/variance rides the
    // DECIMAL bridge over the bounded grid.
    QuerySpec(
      "x224_seasonal_strength",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val counts = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val span = Tables.events(s, dir)
          .agg(min(to_date(col("ts"))).as("a"), max(to_date(col("ts"))).as("b"))
        val daily = span
          .select(explode(expr("sequence(a, b)")).as("day"))
          .join(counts, Seq("day"), "left").na.fill(0L, Seq("n"))
          .withColumn("dow",
            expr("datediff(day, DATE '1970-01-01') % 7").cast("long"))
        val ma = W.orderBy("day").rowsBetween(-3, 3)
        val detr = daily
          .withColumn("wn", count(lit(1)).over(ma))
          .withColumn("tr",
            sum(col("n")).over(ma).cast("double") / col("wn"))
          .filter(col("wn") === 7)
          .select(col("day"), col("dow"), col("n"),
            round(col("n") - col("tr"), 6).as("d"))
          .localCheckpoint() // calendar-bounded; feeds seasonal + strengths
        val sraw = detr.groupBy("dow").agg(count(lit(1)).as("n_days"),
          (sum(col("d").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("raw"))
        val sadj = sraw.agg(
          (sum(round(col("raw"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("adj"))
        val seas = sraw.crossJoin(broadcast(sadj))
          .select(col("dow"), col("n_days"),
            round(col("raw") - col("adj"), 6).as("seasonal"))
        val parts = detr.join(seas.select(col("dow"), col("seasonal")), "dow")
          .select(col("dow"),
            round(col("d") - col("seasonal"), 6).as("r"),
            col("d"))
        def varOf(c: org.apache.spark.sql.Column) = (
          sum(round(c * c, 6).cast("decimal(38,6)")).cast("double") -
            sum(round(c, 6).cast("decimal(38,6)")).cast("double") *
            sum(round(c, 6).cast("decimal(38,6)")).cast("double") /
            count(lit(1))) / count(lit(1))
        val fs = parts.agg(varOf(col("r")).as("vr"), varOf(col("d")).as("vd"))
          .select(
            round(greatest(lit(0.0), lit(1.0) - col("vr") / col("vd")), 6)
              .as("f_seasonal"),
            round(col("vr"), 6).as("resid_var"))
        seas.crossJoin(broadcast(fs))
          .select(col("dow"), col("n_days"), col("seasonal"),
            col("f_seasonal"), col("resid_var"))
          .orderBy("dow")
      },
      Some("""WITH counts AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |span AS (SELECT MIN(CAST(ts AS DATE)) AS a,
             |        MAX(CAST(ts AS DATE)) AS b FROM events),
             |cal AS (SELECT CAST(unnest(generate_series(span.a, span.b,
             |        INTERVAL 1 DAY)) AS DATE) AS day FROM span),
             |daily AS (SELECT cal.day, COALESCE(counts.n, 0) AS n,
             |        CAST(date_diff('day', DATE '1970-01-01', cal.day) % 7
             |          AS BIGINT) AS dow
             |      FROM cal LEFT JOIN counts ON counts.day = cal.day),
             |mad AS (SELECT day, dow, n,
             |        COUNT(*) OVER w AS wn,
             |        CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS tr
             |      FROM daily
             |      WINDOW w AS (ORDER BY day
             |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |detr AS (SELECT day, dow, n, round(n - tr, 6) AS d
             |      FROM mad WHERE wn = 7),
             |sraw AS (SELECT dow, COUNT(*) AS n_days,
             |        CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE)
             |          / COUNT(*) AS raw
             |      FROM detr GROUP BY 1),
             |sadj AS (SELECT CAST(SUM(CAST(round(raw, 6) AS DECIMAL(18,6)))
             |        AS DOUBLE) / COUNT(*) AS adj FROM sraw),
             |seas AS (SELECT dow, n_days, round(raw - sadj.adj, 6)
             |        AS seasonal FROM sraw CROSS JOIN sadj),
             |parts AS (SELECT detr.dow, round(detr.d - seas.seasonal, 6)
             |        AS r, detr.d
             |      FROM detr JOIN seas ON seas.dow = detr.dow),
             |fs AS (SELECT
             |        (CAST(SUM(CAST(round(r * r, 6) AS DECIMAL(38,6)))
             |            AS DOUBLE) -
             |          CAST(SUM(CAST(round(r, 6) AS DECIMAL(38,6)))
             |            AS DOUBLE) *
             |          CAST(SUM(CAST(round(r, 6) AS DECIMAL(38,6)))
             |            AS DOUBLE) / COUNT(*)) / COUNT(*) AS vr,
             |        (CAST(SUM(CAST(round(d * d, 6) AS DECIMAL(38,6)))
             |            AS DOUBLE) -
             |          CAST(SUM(CAST(round(d, 6) AS DECIMAL(38,6)))
             |            AS DOUBLE) *
             |          CAST(SUM(CAST(round(d, 6) AS DECIMAL(38,6)))
             |            AS DOUBLE) / COUNT(*)) / COUNT(*) AS vd
             |      FROM parts)
             |SELECT seas.dow, CAST(seas.n_days AS BIGINT) AS n_days,
             |  seas.seasonal,
             |  round(greatest(0.0, 1.0 - fs.vr / fs.vd), 6) AS f_seasonal,
             |  round(fs.vr, 6) AS resid_var
             |FROM seas CROSS JOIN fs ORDER BY dow""".stripMargin)),


    // Importance-weight diagnostics for the x41 DSIR weights (effective
    // sample size — Kong 1992 / Liu 1996, THE resampling health metric;
    // Owen, "Monte Carlo theory", ch. 9): ESS = (Σw)²/Σw² says how many
    // effective documents survive weighting BEFORE x36/x221 draw by
    // those weights — per-source, so a source whose weights collapse
    // onto a handful of docs (ESS ≪ n) is flagged before resampling
    // bakes the collapse in. Weights are self-normalized per source
    // (w = e^{logw − max logw} ∈ (0,1] — ESS is scale-invariant, so the
    // max-shift is exact, not an approximation), each exp lands on a
    // 6-dp rounding of a 4-dp input (corpus-grain transcendental, the
    // x175/x128 rounding class); sums ride DECIMAL(38,6). share_zero =
    // docs whose weight underflows the 6-dp grid — the "effectively
    // dropped" mass.
    QuerySpec(
      "x225_ess_weights",
      (s, dir) => {
        val wts = dsirDocWeights(s, dir)
        val mx = wts.groupBy("source").agg(max(col("logw")).as("mlw"))
        val w = wts.join(mx, "source")
          .select(col("source"),
            round(exp(col("logw") - col("mlw")), 6).as("w"))
        w.groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum(col("w").cast("decimal(38,6)")).cast("double").as("sw"),
            sum(round(col("w") * col("w"), 6).cast("decimal(38,6)"))
              .cast("double").as("sww"),
            sum(when(col("w") === 0.0, 1L).otherwise(0L)).as("n_zero"))
          .select(col("source"), col("n_docs"),
            round(col("sw") * col("sw") / col("sww"), 6).as("ess"),
            round(col("sw") * col("sw") / col("sww") / col("n_docs"), 6)
              .as("ess_ratio"),
            round(col("n_zero").cast("double") / col("n_docs"), 6)
              .as("share_zero"))
          .orderBy("source")
      },
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
             |  FROM side CROSS JOIN tot),
             |dw AS (SELECT df.doc_id, round(CAST(SUM(df.cnt * lam.lr) AS DOUBLE), 4) AS logw
             |  FROM df JOIN lam USING (bucket) GROUP BY 1),
             |ds AS (SELECT dw.doc_id, d.source, dw.logw
             |  FROM dw JOIN documents d ON d.doc_id = dw.doc_id),
             |mx AS (SELECT source, MAX(logw) AS mlw FROM ds GROUP BY 1),
             |w AS (SELECT ds.source, round(exp(ds.logw - mx.mlw), 6) AS w
             |  FROM ds JOIN mx ON mx.source = ds.source),
             |agg AS (SELECT source, COUNT(*) AS n_docs,
             |    CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS sw,
             |    CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sww,
             |    SUM(CASE WHEN w = 0.0 THEN 1 ELSE 0 END) AS n_zero
             |  FROM w GROUP BY 1)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |  round(sw * sw / sww, 6) AS ess,
             |  round(sw * sw / sww / n_docs, 6) AS ess_ratio,
             |  round(CAST(n_zero AS DOUBLE) / n_docs, 6) AS share_zero
             |FROM agg ORDER BY source""".stripMargin)),


    // Neyman optimal stratified allocation (Neyman, JRSS 97, 1934;
    // Cochran, "Sampling Techniques" ch. 5): given a fixed eval/labeling
    // budget of n = 1000 draws across document sources, the allocation
    // minimizing the stratified-mean variance is n_h ∝ N_h·S_h — budget
    // goes where strata are BIG and NOISY, not merely big. Emits the
    // Neyman and proportional allocations side by side plus the design
    // effect Var_ney/Var_prop = (ΣW_h·S_h)²/(ΣW_h·S_h²) ≤ 1 (equality
    // iff all strata share one σ — Cauchy-Schwarz), i.e. how much
    // variance the optimal split saves. Composes with x221 (which draws
    // the per-stratum samples this op sizes). One scan to integer
    // moments; everything downstream is 20-row algebra with rounded-6
    // DECIMAL bridges; sqrt on the bounded stratum grid only.
    QuerySpec(
      "x226_neyman_allocation",
      (s, dir) => {
        val st = Tables.documents(s, dir)
          .select(col("source"), col("n_chars").cast("long").as("y"))
          .groupBy("source").agg(count(lit(1)).as("nh"),
            sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
          .select(col("source"), col("nh"),
            when(col("nh") > 1,
              round(sqrt((col("syy").cast("double") -
                col("sy").cast("double") * col("sy") / col("nh")) /
                (col("nh") - 1)), 6)).otherwise(lit(0.0)).as("sh"))
          .localCheckpoint() // stratum-bounded; feeds totals + output rows
        val tot = st.agg(sum(col("nh")).as("n_total"),
          sum(round(col("nh") * col("sh"), 6).cast("decimal(38,6)"))
            .cast("double").as("sns"),
          sum(round(col("nh") * col("sh") * col("sh"), 6)
            .cast("decimal(38,6)")).cast("double").as("snss"))
        st.crossJoin(broadcast(tot))
          .select(col("source"), col("nh").as("n_docs"),
            col("sh").as("stddev_chars"),
            round(lit(1000.0) * col("nh") * col("sh") / col("sns"), 2)
              .as("alloc_neyman"),
            round(lit(1000.0) * col("nh") / col("n_total"), 2)
              .as("alloc_prop"),
            round(col("sns") * col("sns") / (col("n_total") * col("snss")),
              6).as("design_effect"))
          .orderBy("source")
      },
      Some("""WITH st AS (SELECT source, COUNT(*) AS nh,
             |        SUM(CAST(n_chars AS BIGINT)) AS sy,
             |        SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
             |          AS syy
             |      FROM documents GROUP BY 1),
             |sh AS (SELECT source, nh,
             |        CASE WHEN nh > 1 THEN
             |          round(sqrt((CAST(syy AS DOUBLE) -
             |            CAST(sy AS DOUBLE) * sy / nh) / (nh - 1)), 6)
             |          ELSE 0.0 END AS sh
             |      FROM st),
             |tot AS (SELECT SUM(nh) AS n_total,
             |        CAST(SUM(CAST(round(nh * sh, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sns,
             |        CAST(SUM(CAST(round(nh * sh * sh, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS snss
             |      FROM sh)
             |SELECT sh.source, CAST(sh.nh AS BIGINT) AS n_docs,
             |  sh.sh AS stddev_chars,
             |  round(1000.0 * sh.nh * sh.sh / tot.sns, 2) AS alloc_neyman,
             |  round(1000.0 * sh.nh / tot.n_total, 2) AS alloc_prop,
             |  round(tot.sns * tot.sns / (tot.n_total * tot.snss), 6)
             |    AS design_effect
             |FROM sh CROSS JOIN tot ORDER BY source""".stripMargin)),

    // CUSUM control chart (Page, Biometrika 41, 1954; the tabular two-
    // sided form of Montgomery's SPC ch. 9): sequential drift detection
    // over daily event volume — the monitoring read between x143's
    // retrospective single changepoint and x197's two-hypothesis SPRT.
    // The chart math lives in the SHARED [[CusumChart]] core (prefix-sum
    // + running-min, never a loop; rounded-6 DECIMAL trajectory so both
    // engines replay bit-identically — see the core's note), reused
    // verbatim by the [[graft.streaming.CusumStream]] ingest-time twin
    // the way x236/EwmaStream share [[EwmaChart]].
    QuerySpec(
      "x227_cusum",
      (s, dir) => CusumChart.fromCounts(
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))),
      Some("""WITH counts AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |span AS (SELECT MIN(CAST(ts AS DATE)) AS a,
             |        MAX(CAST(ts AS DATE)) AS b FROM events),
             |cal AS (SELECT CAST(unnest(generate_series(span.a, span.b,
             |        INTERVAL 1 DAY)) AS DATE) AS day FROM span),
             |daily AS (SELECT cal.day, COALESCE(counts.n, 0) AS n
             |      FROM cal LEFT JOIN counts ON counts.day = cal.day),
             |mom AS (SELECT round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)
             |          AS mu,
             |        round(sqrt((CAST(SUM(n * n) AS DOUBLE) -
             |          CAST(SUM(n) AS DOUBLE) * SUM(n) / COUNT(*)) /
             |          (COUNT(*) - 1)), 6) AS sigma
             |      FROM daily),
             |dev AS (SELECT d.day, d.n, m.mu, m.sigma,
             |        CAST(round(d.n - m.mu - m.sigma / 2, 6)
             |          AS DECIMAL(18,6)) AS dh,
             |        CAST(round(d.n - m.mu + m.sigma / 2, 6)
             |          AS DECIMAL(18,6)) AS dl
             |      FROM daily d CROSS JOIN mom m),
             |tr0 AS (SELECT day, n, sigma,
             |        SUM(dh) OVER w AS ch, SUM(dl) OVER w AS cl
             |      FROM dev
             |      WINDOW w AS (ORDER BY day
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |tr AS (SELECT day, n, sigma, ch, cl,
             |        MIN(ch) OVER w2 AS mh, MAX(cl) OVER w2 AS ml
             |      FROM tr0
             |      WINDOW w2 AS (ORDER BY day
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT day, CAST(n AS BIGINT) AS n,
             |  round(CAST(ch - least(mh, CAST(0 AS DECIMAL(18,6)))
             |    AS DOUBLE), 6) AS s_hi,
             |  round(CAST(greatest(ml, CAST(0 AS DECIMAL(18,6))) - cl
             |    AS DOUBLE), 6) AS s_lo,
             |  CAST(CAST(ch - least(mh, CAST(0 AS DECIMAL(18,6)))
             |      AS DOUBLE) > 4 * sigma OR
             |    CAST(greatest(ml, CAST(0 AS DECIMAL(18,6))) - cl
             |      AS DOUBLE) > 4 * sigma AS BIGINT) AS alarm
             |FROM tr ORDER BY day""".stripMargin)),

    // 1-d Wasserstein-1 distance (Monge 1781 / Kantorovich 1942; Ramdas,
    // García Trillos & Cuturi, Entropy 19, 2017 for the 1-d CDF identity
    // W₁ = ∫|F_A − F_B|): the earth-mover drift metric between the arm-A
    // and arm-B purchase-value distributions — unlike x129's KS sup it
    // weighs HOW FAR mass moved, not just the largest gap, and unlike
    // x105's PSI it needs no binning. On the distinct-cents grid every
    // term is EXACT INTEGER arithmetic: |cumA·n_B − cumB·n_A| · gap (all
    // ≤ 1e15 ≪ 2^63), summed as BIGINT, divided once at the end — no
    // float enters until the final division. Grid size is bounded by the
    // VALUE DOMAIN (distinct cents), not the corpus; cumulative windows
    // ride the aggregate-bounded grid (Rule-1 escape).
    QuerySpec(
      "x228_wasserstein",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val p = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).cast("long").as("arm"),
            expr("CAST(round(value * 100) AS BIGINT)").as("y"))
        val grid = p.groupBy("y")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
        val tots = p.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sa"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sb"))
        val wc = W.orderBy("y").rowsBetween(W.unboundedPreceding, 0)
        val steps = grid
          .withColumn("cuma", sum(col("ca")).over(wc))
          .withColumn("cumb", sum(col("cb")).over(wc))
          .withColumn("gap",
            coalesce(lead(col("y"), 1).over(W.orderBy("y")) - col("y"),
              lit(0L)))
        steps.crossJoin(broadcast(tots))
          .select(col("na"), col("nb"), col("sa"), col("sb"),
            (abs(col("cuma") * col("nb") - col("cumb") * col("na")) *
              col("gap")).as("t"))
          .groupBy("na", "nb", "sa", "sb")
          .agg(sum(col("t")).as("st"), count(lit(1)).as("n_support"))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            col("n_support"),
            round(col("st").cast("double") /
              (col("na") * col("nb")) / 100.0, 6).as("w1_dollars"),
            round(col("sa").cast("double") / col("na") / 100.0, 6)
              .as("mean_a"),
            round(col("sb").cast("double") / col("nb") / 100.0, 6)
              .as("mean_b"))
          .orderBy("n_a")
      },
      Some("""WITH p AS (SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             |        CAST(round(value * 100) AS BIGINT) AS y
             |      FROM events WHERE event_type = 'purchase'),
             |grid AS (SELECT y,
             |        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
             |        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
             |      FROM p GROUP BY 1),
             |tots AS (SELECT
             |        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
             |        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
             |        SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sa,
             |        SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS sb
             |      FROM p),
             |steps AS (SELECT y,
             |        SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb,
             |        COALESCE(lead(y, 1) OVER (ORDER BY y) - y, 0) AS gap
             |      FROM grid
             |      WINDOW w AS (ORDER BY y
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |agg AS (SELECT t.na, t.nb, t.sa, t.sb,
             |        SUM(abs(s.cuma * t.nb - s.cumb * t.na) * s.gap) AS st,
             |        COUNT(*) AS n_support
             |      FROM steps s CROSS JOIN tots t GROUP BY 1, 2, 3, 4)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CAST(n_support AS BIGINT) AS n_support,
             |  round(CAST(st AS DOUBLE) / (na * nb) / 100.0, 6)
             |    AS w1_dollars,
             |  round(CAST(sa AS DOUBLE) / na / 100.0, 6) AS mean_a,
             |  round(CAST(sb AS DOUBLE) / nb / 100.0, 6) AS mean_b
             |FROM agg ORDER BY n_a""".stripMargin)),

    // Closed-form multiple linear regression via normal equations
    // (Gauss 1809; the sufficient-statistics shape of distributed OLS —
    // e.g. Chu et al. NIPS 2006 "Map-Reduce for Machine Learning"):
    // user revenue ~ activity volume + active days, fit EXACTLY from one
    // pass of integer moments — the 3×3 system solves by Cramer's rule
    // in a fixed expression tree over BIGINT sums, so both engines
    // execute the identical IEEE sequence (no iteration, no learning
    // rate — cf. x121's logreg, x150's stump, x174's 1-d OLS). At any
    // corpus size the fit costs one map-side-combined aggregate to 10
    // numbers; R² falls out of the same moments.
    QuerySpec(
      "x229_ols_multi",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("y"),
            count(lit(1)).as("x1"),
            countDistinct(to_date(col("ts"))).as("x2"))
        val m = u.agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
          sum(col("y")).as("sy"),
          sum(col("x1") * col("x1")).as("s11"),
          sum(col("x1") * col("x2")).as("s12"),
          sum(col("x2") * col("x2")).as("s22"),
          sum(col("x1") * col("y")).as("s1y"),
          sum(col("x2") * col("y")).as("s2y"),
          sum(col("y") * col("y")).as("syy"))
        // Cramer's rule in DOUBLE throughout: BIGINT cofactor products
        // overflow 2^63 (n * s11 * s22 ~ 1e21 at sf0.1), and identical
        // double trees are engine-exact anyway
        def D(name: String) = col(name).cast("double")
        val det = D("n") * (D("s11") * D("s22") - D("s12") * D("s12")) -
          D("s1") * (D("s1") * D("s22") - D("s12") * D("s2")) +
          D("s2") * (D("s1") * D("s12") - D("s11") * D("s2"))
        val b0 = (D("sy") * (D("s11") * D("s22") - D("s12") * D("s12")) -
          D("s1") * (D("s1y") * D("s22") - D("s12") * D("s2y")) +
          D("s2") * (D("s1y") * D("s12") - D("s11") * D("s2y"))) / det
        val b1 = (D("n") * (D("s1y") * D("s22") - D("s12") * D("s2y")) -
          D("sy") * (D("s1") * D("s22") - D("s12") * D("s2")) +
          D("s2") * (D("s1") * D("s2y") - D("s1y") * D("s2"))) / det
        val b2 = (D("n") * (D("s11") * D("s2y") - D("s1y") * D("s12")) -
          D("s1") * (D("s1") * D("s2y") - D("s1y") * D("s2")) +
          D("sy") * (D("s1") * D("s12") - D("s11") * D("s2"))) / det
        val sse = D("syy") - (b0 * D("sy") + b1 * D("s1y") + b2 * D("s2y"))
        val sst = D("syy") - D("sy") * D("sy") / D("n")
        m.select(col("n").as("n_users"),
            round(b0, 6).as("b0_cents"),
            round(b1, 6).as("b1_per_event"),
            round(b2, 6).as("b2_per_active_day"),
            round(lit(1.0) - sse / sst, 6).as("r2"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS y,
             |        COUNT(*) AS x1,
             |        COUNT(DISTINCT CAST(ts AS DATE)) AS x2
             |      FROM events GROUP BY 1),
             |m0 AS (SELECT COUNT(*) AS ni, SUM(x1) AS s1, SUM(x2) AS s2,
             |        SUM(y) AS sy, SUM(x1 * x1) AS s11,
             |        SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
             |        SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y,
             |        SUM(y * y) AS syy
             |      FROM u),
             |m AS (SELECT ni, CAST(ni AS DOUBLE) AS n,
             |        CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
             |        CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
             |        CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
             |        CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
             |        CAST(syy AS DOUBLE) AS syy
             |      FROM m0),
             |fit AS (SELECT ni, n, sy, s1y, s2y, syy,
             |        n * (s11 * s22 - s12 * s12) -
             |          s1 * (s1 * s22 - s12 * s2) +
             |          s2 * (s1 * s12 - s11 * s2) AS det,
             |        sy * (s11 * s22 - s12 * s12) -
             |          s1 * (s1y * s22 - s12 * s2y) +
             |          s2 * (s1y * s12 - s11 * s2y) AS d0,
             |        n * (s1y * s22 - s12 * s2y) -
             |          sy * (s1 * s22 - s12 * s2) +
             |          s2 * (s1 * s2y - s1y * s2) AS d1,
             |        n * (s11 * s2y - s1y * s12) -
             |          s1 * (s1 * s2y - s1y * s2) +
             |          sy * (s1 * s12 - s11 * s2) AS d2
             |      FROM m)
             |SELECT CAST(ni AS BIGINT) AS n_users,
             |  round(d0 / det, 6) AS b0_cents,
             |  round(d1 / det, 6) AS b1_per_event,
             |  round(d2 / det, 6) AS b2_per_active_day,
             |  round(1.0 - (syy - ((d0 / det) * sy + (d1 / det) * s1y +
             |    (d2 / det) * s2y)) /
             |    (syy - sy * sy / n), 6) AS r2
             |FROM fit ORDER BY n_users""".stripMargin)),

    // Self-BLEU corpus diversity (Papineni et al., ACL 2002 BLEU; the
    // self-BLEU diversity read of Zhu et al., SIGIR 2018 "Texygen"): how
    // much each document's n-grams are already covered by OTHER docs —
    // HIGH self-BLEU = mode collapse, the synthetic-data failure x72's
    // within-doc repetition can't see (it reads one doc at a time).
    // Modified n-gram precision clips each doc-gram count against the
    // best count for that gram in any OTHER single doc: per gram the
    // top-2 (count, doc) pairs suffice (rank ≤ 2 per gram plans a
    // WindowGroupLimit — the x221 device), so the clip table is two
    // bounded columns per gram, never a doc × gram fan-out. p₁, p₂ are
    // exact integer ratios; √(p₁p₂) rounds to 6 per doc (bounded-risk
    // corpus-grain transcendental, the x225 class) and averages per
    // source through the DECIMAL bridge.
    QuerySpec(
      "x230_self_bleu",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextFunctions.tokens(col("text")).as("ws"))
          .filter(size(col("ws")) >= 2)
        def prec(gramExpr: String): org.apache.spark.sql.DataFrame = {
          val dg = toks
            .select(col("doc_id"), col("source"),
              explode(expr(gramExpr)).as("g"))
            .groupBy("doc_id", "source", "g")
            .agg(count(lit(1)).as("c"))
          val top2 = dg
            .withColumn("rn", row_number().over(
              W.partitionBy("g").orderBy(col("c").desc, col("doc_id"))))
            .filter(col("rn") <= 2)
            .groupBy("g")
            .agg(max(when(col("rn") === 1,
                struct(col("c").as("c"), col("doc_id").as("d")))).as("m1"),
              max(when(col("rn") === 2, col("c"))).as("m2"))
          dg.join(top2, "g")
            .select(col("doc_id"), col("source"), col("c"),
              when(col("doc_id") === col("m1.d"),
                coalesce(col("m2"), lit(0L)))
                .otherwise(col("m1.c")).as("clip"))
            .groupBy("doc_id", "source")
            .agg(sum(least(col("c"), col("clip"))).as("num"),
              sum(col("c")).as("den"))
        }
        val p1 = prec("ws")
          .select(col("doc_id"), col("source"),
            col("num").as("n1"), col("den").as("d1"))
        val p2 = prec("transform(sequence(0, size(ws) - 2), " +
            "i -> concat(ws[i], ' ', ws[i+1]))")
          .select(col("doc_id"), col("num").as("n2"), col("den").as("d2"))
        val perDoc = p1.join(p2, "doc_id")
          .select(col("source"),
            round(sqrt((col("n1").cast("double") / col("d1")) *
              (col("n2").cast("double") / col("d2"))), 6).as("bleu"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("bleu").cast("decimal(18,6)")).cast("double") /
              count(lit(1))).as("sb"))
          .select(col("source"), col("n_docs"),
            round(col("sb"), 6).as("self_bleu"),
            round(lit(1.0) - col("sb"), 6).as("diversity"))
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT doc_id, source, list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> '')
             |        AS ws
             |      FROM documents),
             |d AS (SELECT doc_id, source, ws FROM tk WHERE len(ws) >= 2),
             |g1 AS (SELECT doc_id, source, unnest(ws) AS g FROM d),
             |dg1 AS (SELECT doc_id, source, g, COUNT(*) AS c
             |      FROM g1 GROUP BY 1, 2, 3),
             |t1 AS (SELECT g, doc_id, c, row_number() OVER (PARTITION BY g
             |        ORDER BY c DESC, doc_id) AS rn FROM dg1),
             |m1 AS (SELECT g,
             |        MAX(CASE WHEN rn = 1 THEN c END) AS m1c,
             |        MAX(CASE WHEN rn = 1 THEN doc_id END) AS m1d,
             |        MAX(CASE WHEN rn = 2 THEN c END) AS m2c
             |      FROM t1 WHERE rn <= 2 GROUP BY 1),
             |pr1 AS (SELECT dg1.doc_id, dg1.source,
             |        SUM(least(dg1.c, CASE WHEN dg1.doc_id = m1.m1d
             |          THEN COALESCE(m1.m2c, 0) ELSE m1.m1c END)) AS n1,
             |        SUM(dg1.c) AS d1
             |      FROM dg1 JOIN m1 USING (g) GROUP BY 1, 2),
             |g2 AS (SELECT doc_id, source,
             |        unnest([ws[i] || ' ' || ws[i+1]
             |                for i in range(1, len(ws))]) AS g
             |      FROM d),
             |dg2 AS (SELECT doc_id, source, g, COUNT(*) AS c
             |      FROM g2 GROUP BY 1, 2, 3),
             |t2 AS (SELECT g, doc_id, c, row_number() OVER (PARTITION BY g
             |        ORDER BY c DESC, doc_id) AS rn FROM dg2),
             |m2 AS (SELECT g,
             |        MAX(CASE WHEN rn = 1 THEN c END) AS m1c,
             |        MAX(CASE WHEN rn = 1 THEN doc_id END) AS m1d,
             |        MAX(CASE WHEN rn = 2 THEN c END) AS m2c
             |      FROM t2 WHERE rn <= 2 GROUP BY 1),
             |pr2 AS (SELECT dg2.doc_id,
             |        SUM(least(dg2.c, CASE WHEN dg2.doc_id = m2.m1d
             |          THEN COALESCE(m2.m2c, 0) ELSE m2.m1c END)) AS n2,
             |        SUM(dg2.c) AS d2
             |      FROM dg2 JOIN m2 USING (g) GROUP BY 1),
             |pd AS (SELECT pr1.source,
             |        round(sqrt((CAST(pr1.n1 AS DOUBLE) / pr1.d1) *
             |          (CAST(pr2.n2 AS DOUBLE) / pr2.d2)), 6) AS bleu
             |      FROM pr1 JOIN pr2 ON pr2.doc_id = pr1.doc_id),
             |agg AS (SELECT source, COUNT(*) AS n_docs,
             |        CAST(SUM(CAST(bleu AS DECIMAL(18,6))) AS DOUBLE)
             |          / COUNT(*) AS sb
             |      FROM pd GROUP BY 1)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |  round(sb, 6) AS self_bleu,
             |  round(1.0 - sb, 6) AS diversity
             |FROM agg ORDER BY source""".stripMargin)),

    // Theil-Sen robust trend (Theil 1950; Sen, JASA 63, 1968): the median
    // of pairwise slopes over the daily-volume series — the MAGNITUDE
    // companion to x177's Mann-Kendall (which only signs the trend), with
    // 29% breakdown where x174-style OLS has none (one corrupted day can
    // move an OLS slope arbitrarily). The pair set is the day grid's own
    // square — calendar-bounded (≈ |days|²/2 pairs at ANY corpus size),
    // built by a self-join on the aggregate, never on events; slopes are
    // exact-integer ratios rounded to 6 so both engines take the median
    // (the x196 percentile/quantile_cont correspondence) of identical
    // value sets; Sen's intercept = median(y − slope·t) the same way.
    QuerySpec(
      "x231_theil_sen",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .select(expr("datediff(day, DATE '1970-01-01')").cast("long")
            .as("t"), col("n"))
          .localCheckpoint() // calendar-bounded; feeds pairs + intercepts
        val pairs = d.as("a").join(d.as("b"), col("a.t") < col("b.t"))
          .select(round((col("b.n") - col("a.n")).cast("double") /
            (col("b.t") - col("a.t")), 6).as("sl"))
        val slope = pairs.agg(count(lit(1)).as("n_pairs"),
          expr("percentile(sl, 0.5)").as("slope"))
        d.crossJoin(broadcast(slope))
          .select(col("n_pairs"), col("slope"),
            round(col("n") - col("slope") * col("t"), 6).as("ic"))
          .groupBy("n_pairs", "slope")
          .agg(count(lit(1)).as("n_days"),
            expr("percentile(ic, 0.5)").as("icm"))
          .select(col("n_days"), col("n_pairs"),
            round(col("slope"), 6).as("sen_slope"),
            round(col("icm"), 6).as("sen_intercept"))
          .orderBy("n_days")
      },
      Some("""WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) AS BIGINT) AS t, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |pairs AS (SELECT round(CAST(b.n - a.n AS DOUBLE) /
             |          (b.t - a.t), 6) AS sl
             |      FROM d a JOIN d b ON a.t < b.t),
             |sl AS (SELECT COUNT(*) AS n_pairs,
             |        quantile_cont(sl, 0.5) AS slope FROM pairs),
             |ic AS (SELECT sl.n_pairs, sl.slope,
             |        round(d.n - sl.slope * d.t, 6) AS ic
             |      FROM d CROSS JOIN sl),
             |f AS (SELECT n_pairs, slope, COUNT(*) AS n_days,
             |        quantile_cont(ic, 0.5) AS icm
             |      FROM ic GROUP BY 1, 2)
             |SELECT CAST(n_days AS BIGINT) AS n_days,
             |  CAST(n_pairs AS BIGINT) AS n_pairs,
             |  round(slope, 6) AS sen_slope,
             |  round(icm, 6) AS sen_intercept
             |FROM f ORDER BY n_days""".stripMargin)),

    // Matching ATT on the bounded covariate grid (Rubin, Biometrics 29,
    // 1973; Rosenbaum & Rubin 1983; Abadie & Imbens, ECTA 74, 2006 for
    // the with-replacement 1-NN estimator): the effect on the TREATED of
    // x182's treatment (≥2 high-value purchases) on click outcome,
    // matching each treated user to the nearest control by the activity
    // confounder — the design-based companion to x182's model-based IPW
    // (matching fails loudly where IPW silently extrapolates). The
    // at-scale device: matching happens on the DISTINCT-ACTIVITY grid
    // (bounded by the value domain, the x228 argument), not per user —
    // controls at the same activity are exchangeable, so 1-NN-with-
    // replacement averages them (exact-distance kernel matching);
    // nearest-below/above come from running last/first over the grid
    // (aggregate below = Rule-1 escape), ties break toward the lower
    // activity. Per-grid-row means are rationals rounded 6 into
    // DECIMAL sums; the naive difference rides along as the contrast.
    QuerySpec(
      "x232_matching_att",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("t"))
        val grid = u.groupBy("act").agg(
            sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
            sum(when(col("t") === 0, col("y")).otherwise(0L)).as("syc"),
            sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
            sum(when(col("t") === 1, col("y")).otherwise(0L)).as("syt"))
        // no checkpoint: the grid feeds a single window chain, and keeping
        // the Aggregate visible below the global windows is what proves
        // (to PlansSpec and to a reader) they run over value-domain-bounded
        // input, not the corpus
        val wPrev = W.orderBy("act").rowsBetween(W.unboundedPreceding, 0)
        val wNext = W.orderBy(col("act").desc)
          .rowsBetween(W.unboundedPreceding, 0)
        val ctrl = when(col("nc") > 0,
          struct(col("act").as("a"), col("syc").as("sy"), col("nc").as("n")))
        val g2 = grid
          .withColumn("pm", last(ctrl, ignoreNulls = true).over(wPrev))
          .withColumn("nm", last(ctrl, ignoreNulls = true).over(wNext))
        val pick = when(col("nm").isNull, col("pm"))
          .when(col("pm").isNull, col("nm"))
          .when(col("act") - col("pm.a") <= col("nm.a") - col("act"),
            col("pm"))
          .otherwise(col("nm"))
        val att = g2.filter(col("nt") > 0)
          .select(col("nt"), col("syt"),
            (col("act") === pick("a")).cast("long").as("exact"),
            round(col("syt") - col("nt") *
              (pick("sy").cast("double") / pick("n")), 6)
              .cast("decimal(18,6)").as("contrib"))
          .agg(sum(col("nt")).as("n_treated"),
            sum(col("nt") * col("exact")).as("n_exact"),
            sum(col("contrib")).cast("double").as("sc"))
        val naive = u.agg(
          sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_controls"),
          (sum(col("t") * col("y")).cast("double") /
            sum(col("t")).cast("double") -
            sum((lit(1L) - col("t")) * col("y")).cast("double") /
            sum(lit(1L) - col("t")).cast("double")).as("nd"))
        att.crossJoin(broadcast(naive))
          .select(col("n_treated"), col("n_controls"),
            round(col("n_exact").cast("double") / col("n_treated"), 6)
              .as("share_exact_match"),
            round(col("sc") / col("n_treated"), 6).as("att_clicks"),
            round(col("nd"), 6).as("naive_diff"))
          .orderBy("n_treated")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |          AS y,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS t
             |      FROM events GROUP BY 1),
             |grid AS (SELECT act,
             |        SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS nc,
             |        SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS syc,
             |        SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS nt,
             |        SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS syt
             |      FROM u GROUP BY 1),
             |g2 AS (SELECT act, nc, syc, nt, syt,
             |        last_value(CASE WHEN nc > 0 THEN act END IGNORE NULLS)
             |          OVER wp AS pa,
             |        last_value(CASE WHEN nc > 0 THEN syc END IGNORE NULLS)
             |          OVER wp AS psy,
             |        last_value(CASE WHEN nc > 0 THEN nc END IGNORE NULLS)
             |          OVER wp AS pn,
             |        last_value(CASE WHEN nc > 0 THEN act END IGNORE NULLS)
             |          OVER wn AS na,
             |        last_value(CASE WHEN nc > 0 THEN syc END IGNORE NULLS)
             |          OVER wn AS nsy,
             |        last_value(CASE WHEN nc > 0 THEN nc END IGNORE NULLS)
             |          OVER wn AS nn
             |      FROM grid
             |      WINDOW wp AS (ORDER BY act
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |      wn AS (ORDER BY act DESC
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |pick AS (SELECT nt, syt,
             |        CASE WHEN na IS NULL THEN pa
             |          WHEN pa IS NULL THEN na
             |          WHEN act - pa <= na - act THEN pa ELSE na END AS ma,
             |        CASE WHEN na IS NULL THEN psy
             |          WHEN pa IS NULL THEN nsy
             |          WHEN act - pa <= na - act THEN psy ELSE nsy END AS msy,
             |        CASE WHEN na IS NULL THEN pn
             |          WHEN pa IS NULL THEN nn
             |          WHEN act - pa <= na - act THEN pn ELSE nn END AS mn,
             |        act
             |      FROM g2 WHERE nt > 0),
             |att AS (SELECT SUM(nt) AS n_treated,
             |        SUM(nt * CASE WHEN act = ma THEN 1 ELSE 0 END)
             |          AS n_exact,
             |        CAST(SUM(CAST(round(syt - nt *
             |          (CAST(msy AS DOUBLE) / mn), 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sc
             |      FROM pick),
             |naive AS (SELECT
             |        SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n_controls,
             |        CAST(SUM(t * y) AS DOUBLE) / SUM(t) -
             |          CAST(SUM((1 - t) * y) AS DOUBLE) / SUM(1 - t) AS nd
             |      FROM u)
             |SELECT CAST(att.n_treated AS BIGINT) AS n_treated,
             |  CAST(naive.n_controls AS BIGINT) AS n_controls,
             |  round(CAST(att.n_exact AS DOUBLE) / att.n_treated, 6)
             |    AS share_exact_match,
             |  round(att.sc / att.n_treated, 6) AS att_clicks,
             |  round(naive.nd, 6) AS naive_diff
             |FROM att CROSS JOIN naive ORDER BY n_treated""".stripMargin)),

    // Restricted mean survival time (Irwin 1949; Royston & Parmar, BMC
    // Med Res Meth 13, 2013 — the effect size regulators now prefer over
    // hazard ratios when proportional hazards fails): per arm, the area
    // under the Kaplan-Meier curve up to τ = 30 days — "average
    // error-free days in the first month", the absolute companion to
    // x211's multiplicative hazard ratio on the SAME armRiskGrid risk
    // sets. The KM product is NOT a loop: S(t) = exp(Σ_{u≤t} ln(1−d/n))
    // with per-time ln rounded 6 into a DECIMAL prefix sum (calendar-
    // bounded grid, the x211/x218 ln discipline), and the RMST integral
    // is Σ S(tᵢ)·(min(tᵢ₊₁,τ) − tᵢ) over the same bounded grid.
    QuerySpec(
      "x233_rmst",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val tau = 30L
        val (byTime0, _) = armRiskGrid(s, dir)
        // byTime grid carries (t, d1, dt, n1, nt): arm-1 deaths/at-risk
        // and totals per time — split it back into the two arms
        val byTime = byTime0.localCheckpoint() // calendar-bounded
        val wc = W.partitionBy("g").orderBy("t")
          .rowsBetween(W.unboundedPreceding, 0)
        val perArm = byTime
          .select(lit(1L).as("g"), col("t"), col("d1"), col("n1"))
          .unionByName(byTime.select(lit(0L).as("g"), col("t"),
            (col("dt") - col("d1")).as("d1"),
            (col("nt") - col("n1")).as("n1")))
        val km = perArm
          .filter(col("n1") > 0)
          .withColumn("lnterm",
            when(col("d1") < col("n1"),
              round(log(lit(1.0) - col("d1").cast("double") / col("n1")), 6))
              .otherwise(lit(-20.0)) // d=n: S hits 0; exp(-20) rounds to 0
              .cast("decimal(18,6)"))
          .withColumn("lns", sum(col("lnterm")).over(wc))
          .withColumn("surv", round(exp(col("lns").cast("double")), 6))
          .withColumn("tnext",
            coalesce(lead(col("t"), 1).over(W.partitionBy("g")
              .orderBy("t")), lit(tau)))
        val seg = km.filter(col("t") < tau)
          .select(col("g"),
            (round(col("surv") * (least(col("tnext"), lit(tau)) - col("t")),
              6).cast("decimal(18,6)")).as("area"))
        val head = perArm.filter(col("n1") > 0)
          .groupBy("g").agg(min(col("t")).as("t0"))
          .select(col("g"),
            least(col("t0"), lit(tau)).cast("decimal(18,6)").as("area"))
        seg.unionByName(head)
          .groupBy("g")
          .agg(sum(col("area")).cast("double").as("rmst"))
          .select(col("g").as("arm"), round(col("rmst"), 6).as("rmst_days"))
          .orderBy("arm")
      },
      Some("""WITH span AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             |        MIN(CASE WHEN event_type = 'error'
             |          THEN CAST(ts AS DATE) END) AS e
             |      FROM events GROUP BY 1),
             |gm AS (SELECT MAX(greatest(f, e)) AS gmax FROM span),
             |subj AS (SELECT CAST(user_id % 2 AS BIGINT) AS g,
             |        CAST(CASE WHEN e IS NOT NULL THEN datediff('day', f, e)
             |             ELSE datediff('day', f, gm.gmax) END AS BIGINT) AS t,
             |        CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS obs
             |      FROM span CROSS JOIN gm),
             |ptg AS (SELECT t, g, SUM(obs) AS d, SUM(1 - obs) AS c
             |      FROM subj GROUP BY 1, 2),
             |tot AS (SELECT g, COUNT(*) AS ng FROM subj GROUP BY 1),
             |grid AS (SELECT ts.t, gs.g, COALESCE(p.d, 0) AS d,
             |        COALESCE(p.c, 0) AS c
             |      FROM (SELECT DISTINCT t FROM ptg) ts
             |      CROSS JOIN (SELECT DISTINCT g FROM subj) gs
             |      LEFT JOIN ptg p ON p.t = ts.t AND p.g = gs.g),
             |ar AS (SELECT grid.t, grid.g, grid.d,
             |        tot.ng - COALESCE(SUM(grid.d + grid.c)
             |          OVER (PARTITION BY grid.g ORDER BY grid.t
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) AS nr
             |      FROM grid JOIN tot ON tot.g = grid.g),
             |bt AS (SELECT t,
             |        SUM(CASE WHEN g = 1 THEN d ELSE 0 END) AS d1,
             |        SUM(d) AS dt,
             |        SUM(CASE WHEN g = 1 THEN nr ELSE 0 END) AS n1,
             |        SUM(nr) AS nt
             |      FROM ar GROUP BY 1
             |      HAVING SUM(d) > 0 AND SUM(nr) > 1),
             |pa AS (SELECT CAST(1 AS BIGINT) AS g, t, d1, n1 FROM bt
             |      UNION ALL
             |      SELECT CAST(0 AS BIGINT) AS g, t, dt - d1 AS d1,
             |        nt - n1 AS n1 FROM bt),
             |km0 AS (SELECT g, t, d1, n1 FROM pa WHERE n1 > 0),
             |km1 AS (SELECT g, t, CAST(CASE WHEN d1 < n1
             |          THEN round(ln(1.0 - CAST(d1 AS DOUBLE) / n1), 6)
             |          ELSE -20.0 END AS DECIMAL(18,6)) AS lnterm
             |      FROM km0),
             |km2 AS (SELECT g, t,
             |        SUM(lnterm) OVER (PARTITION BY g ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS lns
             |      FROM km1),
             |km3 AS (SELECT g, t, round(exp(CAST(lns AS DOUBLE)), 6)
             |          AS surv,
             |        COALESCE(lead(t, 1) OVER (PARTITION BY g ORDER BY t),
             |          30) AS tnext
             |      FROM km2),
             |seg AS (SELECT g, CAST(round(surv * (least(tnext, 30) - t), 6)
             |          AS DECIMAL(18,6)) AS area
             |      FROM km3 WHERE t < 30),
             |hd AS (SELECT g, CAST(least(MIN(t), 30) AS DECIMAL(18,6))
             |          AS area
             |      FROM km0 GROUP BY 1),
             |uni AS (SELECT g, area FROM seg
             |      UNION ALL SELECT g, area FROM hd)
             |SELECT g AS arm,
             |  round(CAST(SUM(area) AS DOUBLE), 6) AS rmst_days
             |FROM uni GROUP BY 1 ORDER BY arm""".stripMargin)),

    // Group-fairness audit (Feldman et al., KDD 2015 disparate impact;
    // Hardt, Price & Srebro, NeurIPS 2016 equalized odds): for a
    // deterministic high-activity targeting rule (decide d=1 when a
    // user's activity exceeds the global median) against x182's
    // high-value ground truth, per user-parity group: selection rate,
    // TPR, FPR, then the fairness reads — demographic-parity gap, the
    // 80%-rule disparate-impact ratio, and equalized-odds gaps. A model
    // eval suite that reports only accuracy (x121/x168) ships rules like
    // this blind; the audit is one exact-integer cell table (group ×
    // decision × label) from one scan plus a broadcast median, and every
    // rate is a rational rounded at the end — nothing here exceeds
    // 8-row algebra at any corpus size.
    QuerySpec(
      "x234_fairness_audit",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
          .select((col("user_id") % 2).cast("long").as("grp"),
            col("act"), col("y"))
          .localCheckpoint() // one scan feeds the median and the cells
        val med = u.agg(expr("percentile(act, 0.5)").as("m"))
        val cells = u.crossJoin(broadcast(med))
          .select(col("grp"), col("y"),
            (col("act") > col("m")).cast("long").as("d"))
          .groupBy("grp")
          .agg(count(lit(1)).as("n"),
            sum(col("d")).as("nd"),
            sum(col("y")).as("ny"),
            sum(col("d") * col("y")).as("ndy"),
            sum(col("d") * (lit(1L) - col("y"))).as("ndy0"))
          .select(col("grp"), col("n"),
            (col("nd").cast("double") / col("n")).as("sel"),
            (col("ndy").cast("double") / col("ny")).as("tpr"),
            (col("ndy0").cast("double") / (col("n") - col("ny")))
              .as("fpr"))
          .localCheckpoint() // 2 rows feed output + the gap row
        val a = cells.filter(col("grp") === 0)
          .select(col("n").as("n0"), col("sel").as("sel0"),
            col("tpr").as("tpr0"), col("fpr").as("fpr0"))
        val b = cells.filter(col("grp") === 1)
          .select(col("n").as("n1"), col("sel").as("sel1"),
            col("tpr").as("tpr1"), col("fpr").as("fpr1"))
        a.crossJoin(broadcast(b))
          .select(col("n0"), col("n1"),
            round(col("sel0"), 6).as("sel_rate_g0"),
            round(col("sel1"), 6).as("sel_rate_g1"),
            round(col("sel1") - col("sel0"), 6).as("dp_gap"),
            round(least(col("sel0"), col("sel1")) /
              greatest(col("sel0"), col("sel1")), 6).as("di_ratio"),
            round(col("tpr1") - col("tpr0"), 6).as("tpr_gap"),
            round(col("fpr1") - col("fpr0"), 6).as("fpr_gap"),
            (least(col("sel0"), col("sel1")) /
              greatest(col("sel0"), col("sel1")) >= 0.8).cast("long")
              .as("passes_80pct_rule"))
          .orderBy("n0")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |g AS (SELECT CAST(user_id % 2 AS BIGINT) AS grp, act, y
             |      FROM u),
             |med AS (SELECT quantile_cont(act, 0.5) AS m FROM g),
             |cells AS (SELECT grp, COUNT(*) AS n,
             |        SUM(CASE WHEN act > med.m THEN 1 ELSE 0 END) AS nd,
             |        SUM(y) AS ny,
             |        SUM(CASE WHEN act > med.m THEN y ELSE 0 END) AS ndy,
             |        SUM(CASE WHEN act > med.m THEN 1 - y ELSE 0 END)
             |          AS ndy0
             |      FROM g CROSS JOIN med GROUP BY 1),
             |r AS (SELECT grp, n,
             |        CAST(nd AS DOUBLE) / n AS sel,
             |        CAST(ndy AS DOUBLE) / ny AS tpr,
             |        CAST(ndy0 AS DOUBLE) / (n - ny) AS fpr
             |      FROM cells)
             |SELECT a.n AS n0, b.n AS n1,
             |  round(a.sel, 6) AS sel_rate_g0,
             |  round(b.sel, 6) AS sel_rate_g1,
             |  round(b.sel - a.sel, 6) AS dp_gap,
             |  round(least(a.sel, b.sel) / greatest(a.sel, b.sel), 6)
             |    AS di_ratio,
             |  round(b.tpr - a.tpr, 6) AS tpr_gap,
             |  round(b.fpr - a.fpr, 6) AS fpr_gap,
             |  CAST(least(a.sel, b.sel) / greatest(a.sel, b.sel) >= 0.8
             |    AS BIGINT) AS passes_80pct_rule
             |FROM (SELECT * FROM r WHERE grp = 0) a
             |CROSS JOIN (SELECT * FROM r WHERE grp = 1) b
             |ORDER BY n0""".stripMargin)),

    // Chao1 unseen-species richness (Chao, Scand. J. Stat. 1984; Chao
    // 1987 for the variance; the EstimateS/iNEXT standard): per source,
    // how many trigram TYPES the corpus has NOT yet shown — the
    // "how much novelty is left" companion to x222's Heaps growth CURVE
    // and x173's Good-Turing unseen MASS: Chao1 estimates the size of
    // the unseen inventory itself from the singleton/doubleton counts
    // (f1, f2) alone. chao1 = D + f1(f1-1)/(2(f2+1)) (bias-corrected
    // form, defined at f2=0), lognormal 95% CI via Chao 1987's variance.
    // One scan -> per-(source, type) counts -> a source-bounded
    // frequency-of-frequencies row; all algebra on the tiny grid, every
    // nonlinear step rounded before reuse (x206/x211 discipline), and
    // the f1^4-scale variance terms promoted to DOUBLE before any
    // product (the exact integers overflow BIGINT at ~1e5 singletons).
    QuerySpec(
      "x235_chao_richness",
      (s, dir) => {
        val sh = Tables.documents(s, dir)
          .select(col("source"),
            TextFunctions.tokens(col("text")).as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("source"), explode(expr(
            "transform(sequence(0, size(ws) - 3), " +
              "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))")).as("w"))
        val fof = sh.groupBy("source", "w").agg(count(lit(1)).as("c"))
          .groupBy("source").agg(
            count(lit(1)).as("d_types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
            sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        val f1d = col("f1").cast("double")
        val b = fof.select(col("source"), col("d_types"), col("f1"),
          col("f2"),
          round(f1d * (col("f1") - 1) / (lit(2.0) * (col("f2") + 1)), 6)
            .as("t0"),
          round(f1d * (col("f1") - 1) / (lit(2) * (col("f2") + 1)) +
            f1d * (lit(2) * col("f1") - 1) * (lit(2) * col("f1") - 1) /
              (lit(4.0) * (col("f2") + 1) * (col("f2") + 1)) +
            f1d * col("f1") * col("f2") * (col("f1") - 1) *
              (col("f1") - 1) /
              (lit(4.0) * (col("f2") + 1) * (col("f2") + 1) *
                (col("f2") + 1) * (col("f2") + 1)), 6).as("v0"))
        val k = round(exp(lit(1.96) * round(sqrt(round(log(lit(1.0) +
          round(col("v0") / (col("t0") * col("t0")), 6)), 6)), 6)), 6)
        b.select(col("source"), col("d_types"), col("f1"), col("f2"),
            round(col("d_types") + col("t0"), 4).as("chao1"),
            when(col("t0") > 0,
              round(col("d_types") + col("t0") / k, 4))
              .otherwise(col("d_types").cast("double")).as("ci_lower"),
            when(col("t0") > 0,
              round(col("d_types") + col("t0") * k, 4))
              .otherwise(col("d_types").cast("double")).as("ci_upper"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source,
             |        list_filter(regexp_split_to_array(trim(text), '\s+'),
             |          x -> x <> '') AS toks
             |      FROM documents),
             |g AS (SELECT source,
             |        unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                for i in range(1, len(toks) - 1)]) AS w
             |      FROM t WHERE len(toks) >= 3),
             |cnt AS (SELECT source, w, COUNT(*) AS c FROM g GROUP BY 1, 2),
             |fof AS (SELECT source, COUNT(*) AS d_types,
             |        SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             |        SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
             |      FROM cnt GROUP BY 1),
             |b AS (SELECT source, d_types, f1, f2,
             |        round(CAST(f1 AS DOUBLE) * (f1 - 1) /
             |          (2.0 * (f2 + 1)), 6) AS t0,
             |        round(CAST(f1 AS DOUBLE) * (f1 - 1) / (2 * (f2 + 1)) +
             |          CAST(f1 AS DOUBLE) * (2 * f1 - 1) * (2 * f1 - 1) /
             |            (4.0 * (f2 + 1) * (f2 + 1)) +
             |          CAST(f1 AS DOUBLE) * f1 * f2 * (f1 - 1) * (f1 - 1) /
             |            (4.0 * (f2 + 1) * (f2 + 1) * (f2 + 1) * (f2 + 1)),
             |          6) AS v0
             |      FROM fof),
             |k AS (SELECT b.*, round(exp(1.96 * round(sqrt(round(
             |        ln(1.0 + round(v0 / (t0 * t0), 6)), 6)), 6)), 6) AS kk
             |      FROM b)
             |SELECT source, CAST(d_types AS BIGINT) AS d_types,
             |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
             |  round(d_types + t0, 4) AS chao1,
             |  CASE WHEN t0 > 0 THEN round(d_types + t0 / kk, 4)
             |    ELSE CAST(d_types AS DOUBLE) END AS ci_lower,
             |  CASE WHEN t0 > 0 THEN round(d_types + t0 * kk, 4)
             |    ELSE CAST(d_types AS DOUBLE) END AS ci_upper
             |FROM k ORDER BY source""".stripMargin)),

    // EWMA control chart (Roberts, Technometrics 1959; Lucas & Saccucci
    // 1990 for the limits): exponentially weighted moving average of
    // daily-volume deviations with lambda = 0.2, L = 3 time-varying
    // limits — the small-shift monitor BETWEEN x227's CUSUM (fast for
    // sustained shifts) and a Shewhart rule (single spikes): EWMA is the
    // optimal chart for drifts of ~0.5-1 sigma. The geometric recursion
    // z_t = lambda*x_t + (1-lambda)*z_{t-1} is NOT a loop here — it is a
    // TWO-LEVEL RESCALED SCAN: within 16-day blocks z is a prefix sum of
    // terms pre-scaled by 1.25^j (exactly representable: 5^15 < 2^53)
    // and post-scaled by 0.8^j, so no overflow/underflow ever enters;
    // block carries decay as E_k * 0.8^{16(b-1-k)} over the
    // ~|days|/16-row block grid (a bounded broadcast theta-join). Every
    // power is round(power(.,.), 10) so a last-ulp libm difference
    // between engines cannot move a 6-dp value; per-step products are
    // rounded-6 into DECIMAL sums (the x227 trajectory discipline).
    QuerySpec(
      "x236_ewma_chart",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val counts = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val span = Tables.events(s, dir)
          .agg(min(to_date(col("ts"))).as("a"),
            max(to_date(col("ts"))).as("b"))
        val daily = span
          .select(col("a"), explode(expr("sequence(a, b)")).as("day"))
          .join(counts, Seq("day"), "left").na.fill(0L, Seq("n"))
          .select(col("day"), col("n"),
            datediff(col("day"), col("a")).cast("long").as("idx"))
        val mom = daily.agg(count(lit(1)).as("d"),
            sum(col("n")).as("sn"), sum(col("n") * col("n")).as("snn"))
          .select(
            round(col("sn").cast("double") / col("d"), 6).as("mu"),
            round(sqrt((col("snn").cast("double") -
              col("sn").cast("double") * col("sn") / col("d")) /
              (col("d") - 1)), 6).as("sigma"))
        val dev = daily.crossJoin(broadcast(mom))
          .withColumn("blk", expr("idx div 16"))
          .withColumn("j", col("idx") % 16)
          .withColumn("term", round(((col("n") - col("mu")) * lit(0.2)) *
            round(pow(lit(1.25), col("j")), 10), 6)
            .cast("decimal(18,6)"))
        val wb = W.partitionBy("blk").orderBy("idx")
          .rowsBetween(W.unboundedPreceding, 0)
        val inb = dev.withColumn("cum", sum(col("term")).over(wb))
          .withColumn("i_t", round(col("cum").cast("double") *
            round(pow(lit(0.8), col("j")), 10), 6))
        val ends = inb.filter(col("j") === 15)
          .select(col("blk").as("k"), col("i_t").as("e"))
        val p = dev.select("blk").distinct()
          .join(broadcast(ends), col("k") < col("blk"))
          .select(col("blk"), round(col("e") *
            round(pow(lit(0.8), (col("blk") - col("k") - 1) * 16), 10), 6)
            .cast("decimal(18,6)").as("pt"))
          .groupBy("blk").agg(sum(col("pt")).as("p"))
        inb.join(broadcast(p), Seq("blk"), "left")
          .withColumn("pv", coalesce(col("p").cast("double"), lit(0.0)))
          .withColumn("ewma", round(col("i_t") +
            round(round(pow(lit(0.8), col("j") + 1), 10) * col("pv"), 6),
            6))
          .withColumn("climit", round(lit(3) * col("sigma") *
            round(sqrt(round(lit(0.2) / lit(1.8) * (lit(1.0) -
              round(pow(lit(0.8), col("idx") * 2 + 2), 10)), 9)), 6), 6))
          .select(col("day"), col("n"), col("ewma"),
            col("climit").as("control_limit"),
            (abs(col("ewma")) > col("climit")).cast("long").as("alarm"))
          .orderBy("day")
      },
      Some("""WITH counts AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |span AS (SELECT MIN(CAST(ts AS DATE)) AS a,
             |        MAX(CAST(ts AS DATE)) AS b FROM events),
             |cal AS (SELECT span.a, CAST(unnest(generate_series(span.a,
             |        span.b, INTERVAL 1 DAY)) AS DATE) AS day FROM span),
             |daily AS (SELECT cal.day, COALESCE(counts.n, 0) AS n,
             |        CAST(datediff('day', cal.a, cal.day) AS BIGINT) AS idx
             |      FROM cal LEFT JOIN counts ON counts.day = cal.day),
             |mom AS (SELECT round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)
             |          AS mu,
             |        round(sqrt((CAST(SUM(n * n) AS DOUBLE) -
             |          CAST(SUM(n) AS DOUBLE) * SUM(n) / COUNT(*)) /
             |          (COUNT(*) - 1)), 6) AS sigma
             |      FROM daily),
             |dev AS (SELECT day, n, idx, idx // 16 AS blk, idx % 16 AS j,
             |        CAST(round(((n - mom.mu) * 0.2) *
             |          round(power(1.25, idx % 16), 10), 6)
             |          AS DECIMAL(18,6)) AS term
             |      FROM daily CROSS JOIN mom),
             |inb AS (SELECT day, n, idx, blk, j,
             |        round(CAST(SUM(term) OVER (PARTITION BY blk
             |          ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND
             |          CURRENT ROW) AS DOUBLE) * round(power(0.8, j), 10),
             |          6) AS i_t
             |      FROM dev),
             |ends AS (SELECT blk AS k, i_t AS e FROM inb WHERE j = 15),
             |p AS (SELECT b.blk,
             |        SUM(CAST(round(ends.e * round(power(0.8,
             |          (b.blk - ends.k - 1) * 16), 10), 6)
             |          AS DECIMAL(18,6))) AS p
             |      FROM (SELECT DISTINCT blk FROM dev) b
             |      JOIN ends ON ends.k < b.blk GROUP BY 1),
             |z AS (SELECT inb.day, inb.n, inb.idx, inb.j,
             |        round(inb.i_t + round(round(power(0.8, inb.j + 1), 10)
             |          * COALESCE(CAST(p.p AS DOUBLE), 0.0), 6), 6) AS ewma
             |      FROM inb LEFT JOIN p ON p.blk = inb.blk),
             |lim AS (SELECT z.*, round(3 * mom.sigma * round(sqrt(round(
             |        0.2 / 1.8 * (1.0 - round(power(0.8, 2 * z.idx + 2),
             |        10)), 9)), 6), 6) AS climit
             |      FROM z CROSS JOIN mom)
             |SELECT day, CAST(n AS BIGINT) AS n, ewma,
             |  climit AS control_limit,
             |  CAST(abs(ewma) > climit AS BIGINT) AS alarm
             |FROM lim ORDER BY day""".stripMargin)),

    // Delete-one-day (cluster) jackknife (Quenouille 1949; Tukey 1958;
    // Efron 1982 ch.2) for the ratio statistic theta = events per active
    // user — the EXACT, rng-free resampler complementing x137's
    // percentile bootstrap and x216's Poisson bootstrap: for a ratio of
    // sums the delete-one replicate is pure ALGEBRA on per-day margins
    // (theta_(d) = (E - e_d)/(U - s_d), where s_d counts users whose
    // entire history is day d), so the "resampling" costs one calendar-
    // bounded grid and two aggregates — no replicate fan-out at all.
    // Days are the deletion clusters (the honest unit under within-day
    // dependence); reports the bias estimate (D-1)(thbar - theta) and
    // SE = sqrt((D-1)/D * sum (theta_(d) - thbar)^2), rounded-6
    // DECIMAL-bridged like every trajectory sum.
    QuerySpec(
      "x237_jackknife",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val days = ev.groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("e"))
        val users = ev.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("fd"),
            max(to_date(col("ts"))).as("ld"))
        val solo = users.filter(col("fd") === col("ld"))
          .groupBy(col("fd").as("day")).agg(count(lit(1)).as("s"))
        val tot = ev.agg(count(lit(1)).as("te"),
          countDistinct(col("user_id")).as("tu"))
        val grid = days.join(solo, Seq("day"), "left")
          .na.fill(0L, Seq("s"))
          .crossJoin(broadcast(tot))
          .select(col("day"), col("te"), col("tu"),
            round((col("te") - col("e")).cast("double") /
              (col("tu") - col("s")), 6).as("th"))
        val jm = grid.agg(count(lit(1)).as("dd"),
            sum(col("th").cast("decimal(18,6)")).cast("double").as("sth"))
          .select(col("dd"), round(col("sth") / col("dd"), 6).as("thbar"))
        grid.crossJoin(broadcast(jm))
          .groupBy().agg(
            max(col("dd")).as("d_days"),
            max(col("te")).as("n_events"),
            max(col("tu")).as("n_users"),
            max(col("thbar")).as("thbar"),
            sum(round((col("th") - col("thbar")) *
              (col("th") - col("thbar")), 6).cast("decimal(18,6)"))
              .cast("double").as("ssd"))
          .select(col("d_days"), col("n_events"), col("n_users"),
            round(col("n_events").cast("double") / col("n_users"), 6)
              .as("theta"),
            round(col("thbar"), 6).as("theta_jack"),
            round((col("d_days") - 1) * (col("thbar") -
              col("n_events").cast("double") / col("n_users")), 6)
              .as("jack_bias"),
            round(sqrt((col("d_days") - 1).cast("double") / col("d_days")
              * col("ssd")), 6).as("jack_se"))
          .orderBy("d_days")
      },
      Some("""WITH days AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS e
             |      FROM events GROUP BY 1),
             |u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
             |        MAX(CAST(ts AS DATE)) AS ld
             |      FROM events GROUP BY 1),
             |solo AS (SELECT fd AS day, COUNT(*) AS s FROM u
             |      WHERE fd = ld GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS te, COUNT(DISTINCT user_id) AS tu
             |      FROM events),
             |grid AS (SELECT days.day, tot.te, tot.tu,
             |        round(CAST(tot.te - days.e AS DOUBLE) /
             |          (tot.tu - COALESCE(solo.s, 0)), 6) AS th
             |      FROM days LEFT JOIN solo ON solo.day = days.day
             |      CROSS JOIN tot),
             |jm AS (SELECT COUNT(*) AS dd,
             |        round(CAST(SUM(CAST(th AS DECIMAL(18,6))) AS DOUBLE)
             |          / COUNT(*), 6) AS thbar
             |      FROM grid),
             |ag AS (SELECT MAX(jm.dd) AS d_days, MAX(grid.te) AS n_events,
             |        MAX(grid.tu) AS n_users, MAX(jm.thbar) AS thbar,
             |        CAST(SUM(CAST(round((grid.th - jm.thbar) *
             |          (grid.th - jm.thbar), 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS ssd
             |      FROM grid CROSS JOIN jm)
             |SELECT CAST(d_days AS BIGINT) AS d_days,
             |  CAST(n_events AS BIGINT) AS n_events,
             |  CAST(n_users AS BIGINT) AS n_users,
             |  round(CAST(n_events AS DOUBLE) / n_users, 6) AS theta,
             |  round(thbar, 6) AS theta_jack,
             |  round((d_days - 1) * (thbar -
             |    CAST(n_events AS DOUBLE) / n_users), 6) AS jack_bias,
             |  round(sqrt(CAST(d_days - 1 AS DOUBLE) / d_days * ssd), 6)
             |    AS jack_se
             |FROM ag ORDER BY d_days""".stripMargin)),

    // ICWS weighted-MinHash near-dup join (Ioffe, ICDM 2010) — see
    // [[Dedup.icwsNearDups]] for the full design note: weighted-Jaccard
    // LSH whose candidate generation is SQL-replayable because the
    // Gamma(2,1)/Uniform draws are md5-derived on the vocab-bounded
    // (token, seed) grid and every nonlinear step is rounded before
    // reuse; both engines replay the argmin samples, the 2-row bands and
    // the bucket join bit-identically, then verify candidates with the
    // exact integer weighted Jaccard (tf min-sums). The weighted read
    // catches repeat-heavy near-copies that binary MinHash (x2) scores
    // as perfect duplicates of their unrepeated originals. Round-10:
    // the weighted set is the adjacent word-BIGRAM bag — the unigram
    // first cut was degenerate on this closed ~31-word vocabulary
    // (J_w >= 0.4 for ~22% of random pairs → the 2.8M-pair quadratic
    // cloud and the round's worst bench time; see the Dedup note).
    QuerySpec(
      "x238_icws_weighted_minhash",
      (s, dir) => Dedup.icwsNearDups(Tables.documents(s, dir),
          "doc_id", "text", seeds = 8, threshold = 0.4)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH tl AS (SELECT doc_id AS doc,
             |        list_filter(regexp_split_to_array(trim(text), '\s+'),
             |          x -> x <> '') AS toks
             |      FROM documents),
             |toks AS (SELECT doc,
             |        unnest(list_transform(range(1, len(toks)),
             |          i -> toks[i] || ' ' || toks[i + 1])) AS tok
             |      FROM tl WHERE len(toks) >= 2),
             |tf AS (SELECT doc, tok, COUNT(*) AS w FROM toks GROUP BY 1, 2),
             |seeds AS (SELECT unnest(range(8)) AS seed),
             |vocab AS (SELECT DISTINCT tok FROM tf),
             |rnd AS (SELECT tok, seed,
             |        greatest(round(
             |          -ln((CAST(('0x' || substr(md5('icws:r1:' || seed ||
             |            ':' || tok), 1, 12)) AS BIGINT) + 1.0) /
             |            281474976710656.0)
             |          - ln((CAST(('0x' || substr(md5('icws:r2:' || seed ||
             |            ':' || tok), 1, 12)) AS BIGINT) + 1.0) /
             |            281474976710656.0), 9), 1e-9) AS r,
             |        round(ln(greatest(round(
             |          -ln((CAST(('0x' || substr(md5('icws:c1:' || seed ||
             |            ':' || tok), 1, 12)) AS BIGINT) + 1.0) /
             |            281474976710656.0)
             |          - ln((CAST(('0x' || substr(md5('icws:c2:' || seed ||
             |            ':' || tok), 1, 12)) AS BIGINT) + 1.0) /
             |            281474976710656.0), 9), 1e-9)), 6) AS lnc,
             |        round((CAST(('0x' || substr(md5('icws:b:' || seed ||
             |          ':' || tok), 1, 12)) AS BIGINT) + 1.0) /
             |          281474976710656.0, 9) AS beta
             |      FROM vocab CROSS JOIN seeds),
             |smp AS (SELECT tf.doc, tf.tok, rnd.seed, rnd.r, rnd.beta,
             |        rnd.lnc,
             |        floor(round(ln(CAST(tf.w AS DOUBLE)) / rnd.r +
             |          rnd.beta, 9)) AS t
             |      FROM tf JOIN rnd USING (tok)),
             |sc AS (SELECT doc, seed, tok, t,
             |        round(lnc - round(r * (t - beta), 6) - r, 6) AS lna
             |      FROM smp),
             |sig AS (SELECT doc, seed, tok || ':' || CAST(t AS BIGINT)
             |          AS sig
             |      FROM (SELECT doc, seed, tok, t, row_number() OVER (
             |              PARTITION BY doc, seed ORDER BY lna, tok) AS rn
             |            FROM sc)
             |      WHERE rn = 1),
             |bk AS (SELECT doc, CAST(b AS BIGINT) || '|' || s0 || '|' || s1
             |          AS bkey
             |      FROM (SELECT doc, seed // 2 AS b,
             |              MAX(CASE WHEN seed % 2 = 0 THEN sig END) AS s0,
             |              MAX(CASE WHEN seed % 2 = 1 THEN sig END) AS s1
             |            FROM sig GROUP BY 1, 2)),
             |cand AS (SELECT DISTINCT a.doc AS da, b.doc AS db
             |      FROM bk a JOIN bk b ON b.bkey = a.bkey
             |        AND b.doc > a.doc),
             |tot AS (SELECT doc, SUM(w) AS tw FROM tf GROUP BY 1),
             |mm AS (SELECT c.da, c.db, SUM(least(ta.w, tb.w)) AS m
             |      FROM cand c JOIN tf ta ON ta.doc = c.da
             |      JOIN tf tb ON tb.doc = c.db AND tb.tok = ta.tok
             |      GROUP BY 1, 2)
             |SELECT mm.da AS doc_a, mm.db AS doc_b,
             |  round(CAST(mm.m AS DOUBLE) / (x.tw + y.tw - mm.m), 4)
             |    AS wjac
             |FROM mm JOIN tot x ON x.doc = mm.da
             |JOIN tot y ON y.doc = mm.db
             |WHERE round(CAST(mm.m AS DOUBLE) / (x.tw + y.tw - mm.m), 4)
             |  >= 0.4
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Markov-chain attribution with removal effects (Anderl, Becker,
    // von Wangenheim & Schumann, IJRM 2016 — the industry-standard
    // "Markov model" that replaced last-touch; Kemeny-Snell 1960 for the
    // absorbing-chain machinery): journeys are per-user event-type paths
    // truncated at the first purchase ('conv'; journeys without one end
    // in 'null'), a 7-state first-order chain estimated from transition
    // counts, and each channel's credit is its REMOVAL EFFECT — the drop
    // in start→conv absorption when transitions into that channel are
    // redirected to 'null' — normalized into attribution shares. The
    // complement to x145's rule-based positional credits: removal
    // effects price a channel by counterfactual, not by position.
    // At-scale shape: ONE corpus pass builds the ≤(6×7)-row transition
    // grid; absorption is M^1024 by TEN REPEATED SQUARINGS of the
    // ≤49-row matrix (bounded joins, DECIMAL-summed rounded-9 products
    // so both engines square bit-identically; localCheckpoint keeps the
    // 50-join lineage shallow) — never a per-user path simulation. The
    // output is the T=1024 truncated absorption, identical on both
    // engines by construction (residual transient mass ~1e-7 here).
    QuerySpec(
      "x239_markov_attribution",
      (s, dir) => {
        import s.implicits._
        val W = org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("ts"),
            when(col("event_type") === "purchase", lit("conv"))
              .otherwise(col("event_type")).as("st"))
        val fp = ev.filter(col("st") === "conv")
          .groupBy("user_id").agg(min(col("ts")).as("pts"))
        val pe = ev.join(fp, Seq("user_id"), "left")
          .filter(col("pts").isNull || col("ts") <= col("pts"))
        val wseq = W.partitionBy("user_id").orderBy("ts")
        val seq0 = pe
          .withColumn("nx", lead(col("st"), 1).over(wseq))
          .withColumn("rn", row_number().over(wseq))
        val tr = seq0.filter(col("rn") === 1)
            .select(lit("start").as("i"), col("st").as("j"))
          .unionByName(seq0.filter(col("st") =!= "conv")
            .select(col("st").as("i"),
              coalesce(col("nx"), lit("null")).as("j")))
        val cnt = tr.groupBy("i", "j").agg(count(lit(1)).as("c"))
        val rt = cnt.groupBy("i").agg(sum(col("c")).as("t"))
        val m0 = cnt.join(rt, Seq("i"))
          .select(col("i"), col("j"),
            round(col("c").cast("double") / col("t"), 9).as("p"))
          .unionByName(Seq(("conv", "conv", 1.0), ("null", "null", 1.0))
            .toDF("i", "j", "p"))
        def squared(m: org.apache.spark.sql.DataFrame) =
          m.as("a").join(m.as("b"), col("a.j") === col("b.i"))
            .groupBy(col("a.i").as("i"), col("b.j").as("j"))
            .agg(round(sum(round(col("a.p") * col("b.p"), 9)
              .cast("decimal(18,9)")).cast("double"), 9).as("p"))
        def absorb(m: org.apache.spark.sql.DataFrame) = {
          var cur = m.localCheckpoint() // <= 49 rows by construction
          // checkpoint every OTHER squaring: a depth-2 join tree over a
          // 49-row frame is free, and halving the checkpoint count takes
          // ~2 s off the 50-job chain (5 chains x 10 squarings)
          for (k <- 1 to 10) {
            cur = squared(cur)
            if (k % 2 == 0) cur = cur.localCheckpoint()
          }
          cur.filter(col("i") === "start" && col("j") === "conv")
            .agg(coalesce(sum(col("p")), lit(0.0)).as("p"))
        }
        val base = m0.localCheckpoint()
        val channels = Seq("click", "error", "signup", "view")
        def removed(c: String) = base.filter(col("i") =!= c)
          .select(col("i"),
            when(col("j") === c, lit("null")).otherwise(col("j")).as("j"),
            col("p"))
          .groupBy("i", "j").agg(sum(col("p")).as("p"))
        val pBase = absorb(base).select(col("p").as("p_base"))
        val rows = channels.map { c =>
          absorb(removed(c))
            .select(lit(c).as("channel"), col("p").as("pr"))
        }.reduce(_ unionByName _)
        val re = rows.crossJoin(broadcast(pBase))
          .select(col("channel"), col("p_base"), col("pr"),
            round((col("p_base") - col("pr")) / col("p_base"), 6)
              .as("removal_effect"))
        val tot2 = re.agg(sum(col("removal_effect")
          .cast("decimal(18,6)")).as("sre"))
        re.crossJoin(broadcast(tot2))
          .select(col("channel"),
            round(col("p_base"), 6).as("p_conv"),
            round(col("pr"), 6).as("p_removed"),
            col("removal_effect"),
            round(col("removal_effect") / col("sre").cast("double"), 6)
              .as("attribution"))
          .orderBy("channel")
      },
      Some {
        val channels = Seq("click", "error", "signup", "view")
        def chain(pre: String): String =
          (1 to 10).map { k =>
            s"""m${pre}_$k AS MATERIALIZED (SELECT a.i, b.j,
               |        round(CAST(SUM(CAST(round(a.p * b.p, 9)
               |          AS DECIMAL(18,9))) AS DOUBLE), 9) AS p
               |      FROM m${pre}_${k - 1} a JOIN m${pre}_${k - 1} b
               |        ON b.i = a.j GROUP BY 1, 2)""".stripMargin
          }.mkString(",\n")
        val variants = channels.map { c =>
          s"""m${c}_0 AS MATERIALIZED (SELECT i, j, SUM(p) AS p FROM (
             |        SELECT i, CASE WHEN j = '$c' THEN 'null' ELSE j END
             |          AS j, p
             |        FROM mbase_0 WHERE i <> '$c') GROUP BY 1, 2),
             |${chain(c)}""".stripMargin
        }.mkString(",\n")
        val resRows = channels.map { c =>
          s"""SELECT '$c' AS channel, (SELECT COALESCE(SUM(p), 0.0)
             |  FROM m${c}_10 WHERE i = 'start' AND j = 'conv') AS pr"""
            .stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH ev AS (SELECT user_id, ts,
           |        CASE WHEN event_type = 'purchase' THEN 'conv'
           |          ELSE event_type END AS st
           |      FROM events),
           |fp AS (SELECT user_id, MIN(ts) AS pts FROM ev
           |      WHERE st = 'conv' GROUP BY 1),
           |pe AS (SELECT ev.user_id, ev.ts, ev.st FROM ev
           |      LEFT JOIN fp ON fp.user_id = ev.user_id
           |      WHERE fp.pts IS NULL OR ev.ts <= fp.pts),
           |sq AS (SELECT user_id, st,
           |        lead(st) OVER (PARTITION BY user_id ORDER BY ts) AS nx,
           |        row_number() OVER (PARTITION BY user_id ORDER BY ts)
           |          AS rn
           |      FROM pe),
           |tr AS (SELECT 'start' AS i, st AS j FROM sq WHERE rn = 1
           |      UNION ALL
           |      SELECT st AS i, COALESCE(nx, 'null') AS j FROM sq
           |      WHERE st <> 'conv'),
           |cntm AS (SELECT i, j, COUNT(*) AS c FROM tr GROUP BY 1, 2),
           |rt AS (SELECT i, SUM(c) AS t FROM cntm GROUP BY 1),
           |mbase_0 AS MATERIALIZED (SELECT cntm.i, cntm.j,
           |        round(CAST(cntm.c AS DOUBLE) / rt.t, 9) AS p
           |      FROM cntm JOIN rt ON rt.i = cntm.i
           |      UNION ALL SELECT 'conv', 'conv', 1.0
           |      UNION ALL SELECT 'null', 'null', 1.0),
           |${chain("base")},
           |$variants,
           |pb AS (SELECT COALESCE(SUM(p), 0.0) AS p FROM mbase_10
           |      WHERE i = 'start' AND j = 'conv'),
           |res AS ($resRows),
           |re AS (SELECT res.channel, pb.p AS p_base, res.pr,
           |        round((pb.p - res.pr) / pb.p, 6) AS removal_effect
           |      FROM res CROSS JOIN pb),
           |t2 AS (SELECT SUM(CAST(removal_effect AS DECIMAL(18,6)))
           |          AS sre FROM re)
           |SELECT channel, round(p_base, 6) AS p_conv,
           |  round(pr, 6) AS p_removed, removal_effect,
           |  round(removal_effect / CAST(t2.sre AS DOUBLE), 6)
           |    AS attribution
           |FROM re CROSS JOIN t2 ORDER BY channel""".stripMargin
      }),

    // Kendall tau-b rank stability (Kendall, Biometrika 1938; the tau-b
    // tie correction from Kendall 1945) between item popularity in the
    // first vs second calendar half — the ORDINAL drift read next to
    // x166's Spearman (which needs ranks and a different tie treatment)
    // and x87's embedding drift: tau-b prices every item PAIR's order
    // agreement, so a single hot item swapping places moves it by
    // exactly its pair mass. Items are the bounded props→k domain;
    // concordant/discordant/tied counts come from the item-grid
    // self-join (domain², never events²; at an unbounded item vocab the
    // standard practice is a top-K cap by total count first — a
    // WindowGroupLimit, the x221 device), every count an exact integer,
    // one sqrt at the end.
    QuerySpec(
      "x240_kendall_tau",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("ts"),
            expr("variant_get(parse_json(props), '$.k', 'int')")
              .as("item"))
        val mid = ev.agg(min(to_date(col("ts"))).as("a"),
            max(to_date(col("ts"))).as("b"))
          .select(expr("date_add(a, CAST(datediff(b, a) div 2 AS INT))").as("mid"))
        val grid = ev.crossJoin(broadcast(mid))
          .select(col("item"),
            (to_date(col("ts")) <= col("mid")).as("h1"))
          .groupBy("item")
          .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("na"),
            sum(when(!col("h1"), 1L).otherwise(0L)).as("nb"))
        val pr = grid.as("x")
          .join(grid.as("y"), col("x.item") < col("y.item"))
          .select(
            (col("x.na") < col("y.na") && col("x.nb") < col("y.nb") ||
              col("x.na") > col("y.na") && col("x.nb") > col("y.nb"))
              .cast("long").as("cc"),
            (col("x.na") < col("y.na") && col("x.nb") > col("y.nb") ||
              col("x.na") > col("y.na") && col("x.nb") < col("y.nb"))
              .cast("long").as("dd"),
            (col("x.na") === col("y.na")).cast("long").as("ta"),
            (col("x.nb") === col("y.nb")).cast("long").as("tb"))
        val n = grid.agg(count(lit(1)).as("n_items"))
        pr.agg(count(lit(1)).as("n_pairs"),
            sum(col("cc")).as("concordant"),
            sum(col("dd")).as("discordant"),
            sum(col("ta")).as("ties_first"),
            sum(col("tb")).as("ties_second"))
          .crossJoin(broadcast(n))
          .select(col("n_items"), col("n_pairs"), col("concordant"),
            col("discordant"), col("ties_first"), col("ties_second"),
            round((col("concordant") - col("discordant")).cast("double") /
              sqrt((col("n_pairs") - col("ties_first")).cast("double") *
                (col("n_pairs") - col("ties_second"))), 6).as("tau_b"))
          .orderBy("n_items")
      },
      Some("""WITH ev AS (SELECT ts,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS item
             |      FROM events),
             |sp AS (SELECT MIN(CAST(ts AS DATE)) AS a,
             |        MAX(CAST(ts AS DATE)) AS b FROM ev),
             |md AS (SELECT a + CAST(datediff('day', a, b) // 2 AS INT)
             |          AS mid FROM sp),
             |g AS (SELECT item,
             |        SUM(CASE WHEN CAST(ts AS DATE) <= md.mid
             |          THEN 1 ELSE 0 END) AS na,
             |        SUM(CASE WHEN CAST(ts AS DATE) <= md.mid
             |          THEN 0 ELSE 1 END) AS nb
             |      FROM ev CROSS JOIN md GROUP BY 1),
             |pr AS (SELECT
             |        CASE WHEN (x.na < y.na AND x.nb < y.nb)
             |          OR (x.na > y.na AND x.nb > y.nb)
             |          THEN 1 ELSE 0 END AS cc,
             |        CASE WHEN (x.na < y.na AND x.nb > y.nb)
             |          OR (x.na > y.na AND x.nb < y.nb)
             |          THEN 1 ELSE 0 END AS dd,
             |        CASE WHEN x.na = y.na THEN 1 ELSE 0 END AS ta,
             |        CASE WHEN x.nb = y.nb THEN 1 ELSE 0 END AS tb
             |      FROM g x JOIN g y ON x.item < y.item),
             |n AS (SELECT COUNT(*) AS n_items FROM g)
             |SELECT CAST(n.n_items AS BIGINT) AS n_items,
             |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |  CAST(SUM(cc) AS BIGINT) AS concordant,
             |  CAST(SUM(dd) AS BIGINT) AS discordant,
             |  CAST(SUM(ta) AS BIGINT) AS ties_first,
             |  CAST(SUM(tb) AS BIGINT) AS ties_second,
             |  round(CAST(SUM(cc) - SUM(dd) AS DOUBLE) /
             |    sqrt(CAST(COUNT(*) - SUM(ta) AS DOUBLE) *
             |      (COUNT(*) - SUM(tb))), 6) AS tau_b
             |FROM pr CROSS JOIN n GROUP BY n.n_items
             |ORDER BY n_items""".stripMargin)),

    // Log-likelihood-ratio keyness (Dunning, Computational Linguistics
    // 1993 — the corpus-linguistics standard that replaced chi-square
    // for sparse counts): per source, the top-5 OVER-REPRESENTED tokens
    // by the G² statistic of the 2×2 (source vs rest) × (term vs other
    // terms) table — "what vocabulary makes this source itself", the
    // corpus-comparison read that x85's PMI (co-occurrence within
    // baskets) and x29's tf-idf (doc-level salience) don't give.
    // G² = 2·Σ k·ln(k/E) over the 4 cells with the 0·ln0 = 0 convention;
    // each cell ratio is k·N/(row·col) — exact integers pushed through
    // ONE double division — and the four rounded-6 contributions are
    // DECIMAL-summed (a plain double sum of rounded values drifts ~1e-10
    // and can straddle the 4-dp output round across ~60k terms). Per-
    // source top-5 is a rank-over-(llr, term) WindowGroupLimit on the
    // vocab-bounded scored grid.
    QuerySpec(
      "x241_llr_keyness",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, dir)
          .select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
        val st = tok.groupBy("source", "tok").agg(count(lit(1)).as("a"))
        val gt = st.groupBy("tok").agg(sum(col("a")).as("g"))
        val srcTot = st.groupBy("source").agg(sum(col("a")).as("rt"))
        val nTot = srcTot.agg(sum(col("rt")).as("nn"))
        val full = st.join(gt, Seq("tok")).join(broadcast(srcTot),
            Seq("source"))
          .crossJoin(broadcast(nTot))
          .select(col("source"), col("tok"), col("a"), col("g"),
            col("rt"), col("nn"),
            (col("g") - col("a")).as("b"),
            (col("rt") - col("a")).as("c"),
            (col("nn") - col("g") - col("rt") + col("a")).as("d"))
        def xl(k: org.apache.spark.sql.Column,
            row: org.apache.spark.sql.Column,
            ct: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          when(k > 0, round(k.cast("double") *
            log(k.cast("double") * col("nn") /
              (row.cast("double") * ct)), 6))
            .otherwise(lit(0.0)).cast("decimal(18,6)")
        val scored = full.select(col("source"), col("tok"), col("a"),
          round((xl(col("a"), col("rt"), col("g")) +
            xl(col("b"), col("nn") - col("rt"), col("g")) +
            xl(col("c"), col("rt"), col("nn") - col("g")) +
            xl(col("d"), col("nn") - col("rt"), col("nn") - col("g")))
            .cast("double") * 2, 4).as("llr"),
          (col("a").cast("double") * col("nn") >
            col("g").cast("double") * col("rt")).as("over"))
        val wr = W.partitionBy("source")
          .orderBy(col("llr").desc, col("tok"))
        scored.filter(col("over"))
          .withColumn("rank", row_number().over(wr))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank"), col("tok").as("term"),
            col("a").as("freq"), col("llr"))
          .orderBy("source", "rank")
      },
      Some("""WITH tk AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS tok
             |      FROM documents),
             |st AS (SELECT source, tok, COUNT(*) AS a FROM tk
             |      GROUP BY 1, 2),
             |gt AS (SELECT tok, SUM(a) AS g FROM st GROUP BY 1),
             |rt AS (SELECT source, SUM(a) AS rt FROM st GROUP BY 1),
             |nn AS (SELECT SUM(rt) AS nn FROM rt),
             |f AS (SELECT st.source, st.tok, st.a, gt.g, rt.rt, nn.nn,
             |        gt.g - st.a AS b, rt.rt - st.a AS c,
             |        nn.nn - gt.g - rt.rt + st.a AS d
             |      FROM st JOIN gt USING (tok) JOIN rt USING (source)
             |      CROSS JOIN nn),
             |sc AS (SELECT source, tok, a,
             |        round(CAST(
             |          CAST(CASE WHEN a > 0 THEN round(CAST(a AS DOUBLE) *
             |            ln(CAST(a AS DOUBLE) * nn / (CAST(rt AS DOUBLE)
             |            * g)), 6) ELSE 0.0 END AS DECIMAL(18,6)) +
             |          CAST(CASE WHEN b > 0 THEN round(CAST(b AS DOUBLE) *
             |            ln(CAST(b AS DOUBLE) * nn / (CAST(nn - rt
             |            AS DOUBLE) * g)), 6) ELSE 0.0 END
             |            AS DECIMAL(18,6)) +
             |          CAST(CASE WHEN c > 0 THEN round(CAST(c AS DOUBLE) *
             |            ln(CAST(c AS DOUBLE) * nn / (CAST(rt AS DOUBLE)
             |            * (nn - g))), 6) ELSE 0.0 END
             |            AS DECIMAL(18,6)) +
             |          CAST(CASE WHEN d > 0 THEN round(CAST(d AS DOUBLE) *
             |            ln(CAST(d AS DOUBLE) * nn / (CAST(nn - rt
             |            AS DOUBLE) * (nn - g))), 6) ELSE 0.0 END
             |            AS DECIMAL(18,6))
             |          AS DOUBLE) * 2, 4) AS llr
             |      FROM f
             |      WHERE CAST(a AS DOUBLE) * nn > CAST(g AS DOUBLE) * rt),
             |r AS (SELECT source, tok, a, llr, row_number() OVER (
             |        PARTITION BY source ORDER BY llr DESC, tok) AS rank
             |      FROM sc)
             |SELECT source, CAST(rank AS BIGINT) AS rank, tok AS term,
             |  CAST(a AS BIGINT) AS freq, llr
             |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin)),

    // Covariate-balance SMD audit (Rosenbaum & Rubin 1985's standardized
    // mean difference; Austin & Stuart, Stat Med 2015 for the IPW
    // diagnostic practice and the |SMD| <= 0.1 convention): the check
    // every IPW/matching analysis (x182/x232) must SHOW, not assume —
    // per covariate (activity, active days, spend cents), the SMD
    // between treated and control BEFORE weighting and AFTER inverse-
    // propensity weighting, with propensity estimated on the DISTINCT-
    // ACTIVITY grid (exact stratification — the x232 device — so the
    // activity SMD collapses toward 0 by construction and the others
    // show how much balance one confounder buys). Positivity violations
    // (activity levels with e ∈ {0,1}) are EXCLUDED and counted, never
    // divided by (the x182 discipline). One scan → user covariates →
    // value-domain grid → 6-cell weighted-moment table; weighted sums
    // ride the rounded-6 DECIMAL(38,6) bridge (w·cents² reaches 1e16).
    QuerySpec(
      "x242_smd_balance",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            countDistinct(to_date(col("ts"))).as("days"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("t"))
        val grid = u.groupBy("act")
          .agg(count(lit(1)).as("n"), sum(col("t")).as("nt"))
          .select(col("act"),
            (col("nt") > 0 && col("nt") < col("n")).as("ok"),
            round(col("nt").cast("double") / col("n"), 6).as("e"))
        val wu = u.join(grid, Seq("act"))
          .filter(col("ok"))
          .select(col("act"), col("days"), col("cents"), col("t"),
            round(when(col("t") === 1, lit(1.0) / col("e"))
              .otherwise(lit(1.0) / (lit(1.0) - col("e"))), 6).as("w"))
        val cov = wu.select(col("t"), col("w"), explode(array(
            struct(lit("activity").as("cv"),
              col("act").cast("double").as("x")),
            struct(lit("active_days").as("cv"),
              col("days").cast("double").as("x")),
            struct(lit("value_cents").as("cv"),
              col("cents").cast("double").as("x")))).as("s"))
          .select(col("t"), col("w"), col("s.cv").as("cv"),
            col("s.x").as("x"))
        val ag = cov.groupBy("cv", "t").agg(
          count(lit(1)).as("n"),
          sum(round(col("x"), 6).cast("decimal(38,6)"))
            .cast("double").as("sx"),
          sum(round(col("x") * col("x"), 6).cast("decimal(38,6)"))
            .cast("double").as("sxx"),
          sum(col("w").cast("decimal(38,6)")).cast("double").as("sw"),
          sum(round(col("w") * col("x"), 6).cast("decimal(38,6)"))
            .cast("double").as("swx"),
          sum(round(col("w") * col("x") * col("x"), 6)
            .cast("decimal(38,6)")).cast("double").as("swxx"))
        val a1 = ag.filter(col("t") === 1).select(col("cv"),
          col("n").as("n1"), col("sx").as("sx1"), col("sxx").as("sxx1"),
          col("sw").as("sw1"), col("swx").as("swx1"),
          col("swxx").as("swxx1"))
        val a0 = ag.filter(col("t") === 0).select(col("cv"),
          col("n").as("n0"), col("sx").as("sx0"), col("sxx").as("sxx0"),
          col("sw").as("sw0"), col("swx").as("swx0"),
          col("swxx").as("swxx0"))
        val ex = u.agg(count(lit(1)).as("tu"))
          .crossJoin(wu.agg(count(lit(1)).as("tw")))
          .select((col("tu") - col("tw")).as("n_excluded"))
        val m = a1.join(a0, Seq("cv"))
          .select(col("cv"), col("n1"), col("n0"),
            round(col("sx1") / col("n1"), 6).as("m1"),
            round(col("sx0") / col("n0"), 6).as("m0"),
            round(col("swx1") / col("sw1"), 6).as("mw1"),
            round(col("swx0") / col("sw0"), 6).as("mw0"),
            col("sxx1"), col("sxx0"), col("swxx1"), col("swxx0"),
            col("sw1"), col("sw0"))
        val v = m.select(col("cv"), col("n1"), col("n0"), col("m1"),
          col("m0"), col("mw1"), col("mw0"),
          round(greatest(col("sxx1") / col("n1") - col("m1") * col("m1"),
            lit(0.0)), 6).as("v1"),
          round(greatest(col("sxx0") / col("n0") - col("m0") * col("m0"),
            lit(0.0)), 6).as("v0"),
          round(greatest(col("swxx1") / col("sw1") -
            col("mw1") * col("mw1"), lit(0.0)), 6).as("vw1"),
          round(greatest(col("swxx0") / col("sw0") -
            col("mw0") * col("mw0"), lit(0.0)), 6).as("vw0"))
        val smdA = round(abs(col("mw1") - col("mw0")) /
          sqrt(round((col("vw1") + col("vw0")) / 2, 6)), 6)
        v.crossJoin(broadcast(ex))
          .select(col("cv").as("covariate"),
            col("n1").as("n_treated"), col("n0").as("n_control"),
            col("n_excluded"),
            round(abs(col("m1") - col("m0")) /
              sqrt(round((col("v1") + col("v0")) / 2, 6)), 6)
              .as("smd_before"),
            smdA.as("smd_after"),
            (smdA <= 0.1).cast("long").as("balanced"))
          .orderBy("covariate")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        COUNT(DISTINCT CAST(ts AS DATE)) AS days,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS cents,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS t
             |      FROM events GROUP BY 1),
             |grid AS (SELECT act, COUNT(*) AS n, SUM(t) AS nt FROM u
             |      GROUP BY 1),
             |g2 AS (SELECT act, nt > 0 AND nt < n AS ok,
             |        round(CAST(nt AS DOUBLE) / n, 6) AS e FROM grid),
             |wu AS (SELECT u.act, u.days, u.cents, u.t,
             |        round(CASE WHEN u.t = 1 THEN 1.0 / g2.e
             |          ELSE 1.0 / (1.0 - g2.e) END, 6) AS w
             |      FROM u JOIN g2 USING (act) WHERE g2.ok),
             |cov AS (SELECT t, w, 'activity' AS cv, CAST(act AS DOUBLE)
             |          AS x FROM wu
             |      UNION ALL SELECT t, w, 'active_days',
             |        CAST(days AS DOUBLE) FROM wu
             |      UNION ALL SELECT t, w, 'value_cents',
             |        CAST(cents AS DOUBLE) FROM wu),
             |ag AS (SELECT cv, t, COUNT(*) AS n,
             |        CAST(SUM(CAST(round(x, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sxx,
             |        CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS sw,
             |        CAST(SUM(CAST(round(w * x, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS swx,
             |        CAST(SUM(CAST(round(w * x * x, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS swxx
             |      FROM cov GROUP BY 1, 2),
             |ex AS (SELECT (SELECT COUNT(*) FROM u) -
             |        (SELECT COUNT(*) FROM wu) AS n_excluded),
             |j AS (SELECT a.cv, a.n AS n1, a.sx AS sx1, a.sxx AS sxx1,
             |        a.sw AS sw1, a.swx AS swx1, a.swxx AS swxx1,
             |        b.n AS n0, b.sx AS sx0, b.sxx AS sxx0, b.sw AS sw0,
             |        b.swx AS swx0, b.swxx AS swxx0
             |      FROM (SELECT * FROM ag WHERE t = 1) a
             |      JOIN (SELECT * FROM ag WHERE t = 0) b USING (cv)),
             |m AS (SELECT cv, n1, n0,
             |        round(sx1 / n1, 6) AS m1, round(sx0 / n0, 6) AS m0,
             |        round(swx1 / sw1, 6) AS mw1,
             |        round(swx0 / sw0, 6) AS mw0,
             |        sxx1, sxx0, swxx1, swxx0, sw1, sw0
             |      FROM j),
             |v AS (SELECT cv, n1, n0, m1, m0, mw1, mw0,
             |        round(greatest(sxx1 / n1 - m1 * m1, 0.0), 6) AS v1,
             |        round(greatest(sxx0 / n0 - m0 * m0, 0.0), 6) AS v0,
             |        round(greatest(swxx1 / sw1 - mw1 * mw1, 0.0), 6)
             |          AS vw1,
             |        round(greatest(swxx0 / sw0 - mw0 * mw0, 0.0), 6)
             |          AS vw0
             |      FROM m)
             |SELECT cv AS covariate, CAST(n1 AS BIGINT) AS n_treated,
             |  CAST(n0 AS BIGINT) AS n_control,
             |  CAST(ex.n_excluded AS BIGINT) AS n_excluded,
             |  round(abs(m1 - m0) / sqrt(round((v1 + v0) / 2, 6)), 6)
             |    AS smd_before,
             |  round(abs(mw1 - mw0) / sqrt(round((vw1 + vw0) / 2, 6)), 6)
             |    AS smd_after,
             |  CAST(round(abs(mw1 - mw0) / sqrt(round((vw1 + vw0) / 2,
             |    6)), 6) <= 0.1 AS BIGINT) AS balanced
             |FROM v CROSS JOIN ex ORDER BY covariate""".stripMargin)),

    // Burrows' Delta stylometric distance (Burrows, LLC 2002; Argamon
    // 2008 for the formal reading as Manhattan distance in z-space):
    // pairwise source distance over the z-scored relative frequencies of
    // the top-50 corpus-wide tokens — the STYLOMETRY read (who writes
    // like whom) next to x59's KL and x219's JS divergences (which
    // compare full distributions, not function-word style profiles).
    // Top-50 is a rank over the vocab-bounded global counts; the
    // source × top-word grid is zero-filled (a missing function word IS
    // stylometric signal); per-word mean/σ across the 20 sources from
    // exact DECIMAL moments of rounded-9 frequencies; σ=0 words
    // contribute z=0 on both engines. The pair set is the source grid's
    // own square — 190 pairs at any corpus size.
    QuerySpec(
      "x243_burrows_delta",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val st = Tables.documents(s, dir)
          .select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("a"))
        val top = st.groupBy("tok").agg(sum(col("a")).as("g"))
          .withColumn("rk", row_number().over(
            W.orderBy(col("g").desc, col("tok"))))
          .filter(col("rk") <= 50)
          .select("tok")
        val rt = st.groupBy("source").agg(sum(col("a")).as("rt"))
        val grid = rt.crossJoin(broadcast(top))
          .join(st, Seq("source", "tok"), "left")
          .na.fill(0L, Seq("a"))
          .select(col("source"), col("tok"),
            round(col("a").cast("double") / col("rt"), 9).as("f"))
        val ms = grid.groupBy("tok").agg(
            count(lit(1)).as("ns"),
            sum(col("f").cast("decimal(18,9)")).cast("double").as("sf"),
            sum(round(col("f") * col("f"), 9).cast("decimal(18,9)"))
              .cast("double").as("sff"))
          .select(col("tok"),
            round(col("sf") / col("ns"), 12).as("mu"),
            round(sqrt(greatest(col("sff") / col("ns") -
              round(col("sf") / col("ns"), 12) *
              round(col("sf") / col("ns"), 12), lit(0.0))), 9).as("sg"))
        val z = grid.join(broadcast(ms), Seq("tok"))
          .select(col("source"), col("tok"),
            when(col("sg") > 0,
              round((col("f") - col("mu")) / col("sg"), 6))
              .otherwise(lit(0.0)).as("z"))
        val pairs = z.as("x").join(z.as("y"),
            col("x.tok") === col("y.tok") &&
              col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("source_a"),
            col("y.source").as("source_b"))
          .agg(count(lit(1)).as("n_words"),
            sum(round(abs(col("x.z") - col("y.z")), 6)
              .cast("decimal(18,6)")).cast("double").as("sd"))
          .select(col("source_a"), col("source_b"),
            // round at 8, not 6: sd is an exact 6-dp DECIMAL and /50
            // widens it to exactly 8 decimal digits, so a 6-dp round can
            // land on a TRUE decimal tie (hit in verification: .xxxxxx50)
            // where Spark's shortest-repr HALF_UP and DuckDB's binary
            // round disagree; at 8 the quotient is exact — no tie class
            round(col("sd") / col("n_words"), 8).as("delta"))
        pairs.orderBy("source_a", "source_b")
      },
      Some("""WITH tk AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS tok
             |      FROM documents),
             |st AS (SELECT source, tok, COUNT(*) AS a FROM tk
             |      GROUP BY 1, 2),
             |top AS (SELECT tok FROM (SELECT tok, row_number() OVER (
             |        ORDER BY SUM(a) DESC, tok) AS rk FROM st GROUP BY tok)
             |      WHERE rk <= 50),
             |rt AS (SELECT source, SUM(a) AS rt FROM st GROUP BY 1),
             |grid AS (SELECT rt.source, top.tok,
             |        round(CAST(COALESCE(st.a, 0) AS DOUBLE) / rt.rt, 9)
             |          AS f
             |      FROM rt CROSS JOIN top
             |      LEFT JOIN st ON st.source = rt.source
             |        AND st.tok = top.tok),
             |ms AS (SELECT tok, COUNT(*) AS ns,
             |        CAST(SUM(CAST(f AS DECIMAL(18,9))) AS DOUBLE) AS sf,
             |        CAST(SUM(CAST(round(f * f, 9) AS DECIMAL(18,9)))
             |          AS DOUBLE) AS sff
             |      FROM grid GROUP BY 1),
             |m2 AS (SELECT tok, round(sf / ns, 12) AS mu,
             |        round(sqrt(greatest(sff / ns -
             |          round(sf / ns, 12) * round(sf / ns, 12), 0.0)), 9)
             |          AS sg
             |      FROM ms),
             |z AS (SELECT grid.source, grid.tok,
             |        CASE WHEN m2.sg > 0
             |          THEN round((grid.f - m2.mu) / m2.sg, 6)
             |          ELSE 0.0 END AS z
             |      FROM grid JOIN m2 USING (tok))
             |SELECT x.source AS source_a, y.source AS source_b,
             |  round(CAST(SUM(CAST(round(abs(x.z - y.z), 6)
             |    AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 8) AS delta
             |FROM z x JOIN z y ON y.tok = x.tok AND x.source < y.source
             |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin)),

    // Cochran-Armitage trend test (Cochran, Biometrics 1954; Armitage
    // 1955): is conversion MONOTONE in activity exposure? — the ordered-
    // categories test that x158's Cramér's V (nominal) and x196's CMH
    // (stratified 2×2) don't give: it spends its one degree of freedom
    // on the linear trend across activity terciles. Terciles from one
    // bounded exact-percentile aggregate (the x182 cut device, the x196
    // percentile correspondence); T = Σ sᵢ(rᵢN − nᵢR) and
    // Var T = R(N−R)/N · [N Σ sᵢ²nᵢ − (Σ sᵢnᵢ)²] are EXACT INTEGERS
    // promoted to DOUBLE only for the final ratio — no per-row math at
    // all after the 3-row cell table.
    QuerySpec(
      "x244_cochran_armitage",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
        val cuts = u.agg(
          round(expr("percentile(act, CAST(1 AS DOUBLE) / 3)"), 6)
            .as("t1"),
          round(expr("percentile(act, CAST(2 AS DOUBLE) / 3)"), 6)
            .as("t2"))
        val cells = u.crossJoin(broadcast(cuts))
          .select(when(col("act") <= col("t1"), 0L)
            .when(col("act") <= col("t2"), 1L).otherwise(2L).as("sc"),
            col("y"))
          .groupBy("sc")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("r"))
        val tot = cells.agg(sum(col("n")).as("nn"), sum(col("r")).as("rr"),
          sum(col("sc") * col("r")).as("sr"),
          sum(col("sc") * col("n")).as("sn"),
          sum(col("sc") * col("sc") * col("n")).as("ssn"))
        val t = (col("sr") * col("nn") - col("sn") * col("rr"))
          .cast("double")
        val varT = (col("rr") * (col("nn") - col("rr"))).cast("double") /
          col("nn") *
          (col("nn") * col("ssn") - col("sn") * col("sn")).cast("double")
        val zc = round(t / sqrt(varT), 6)
        cells.orderBy("sc")
          .select(col("sc").as("tercile"), col("n"), col("r")
            .as("converted"),
            round(col("r").cast("double") / col("n"), 6).as("rate"))
          .crossJoin(broadcast(tot.select(zc.as("z_trend"),
            round(zc * zc, 4).as("chi2_1df"))))
          .orderBy("tercile")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |cuts AS (SELECT
             |        round(quantile_cont(act, CAST(1 AS DOUBLE) / 3), 6)
             |          AS t1,
             |        round(quantile_cont(act, CAST(2 AS DOUBLE) / 3), 6)
             |          AS t2
             |      FROM u),
             |cells AS (SELECT CASE WHEN act <= cuts.t1 THEN 0
             |          WHEN act <= cuts.t2 THEN 1 ELSE 2 END AS sc,
             |        COUNT(*) AS n, SUM(y) AS r
             |      FROM u CROSS JOIN cuts GROUP BY 1),
             |tot AS (SELECT SUM(n) AS nn, SUM(r) AS rr,
             |        SUM(sc * r) AS sr, SUM(sc * n) AS sn,
             |        SUM(sc * sc * n) AS ssn
             |      FROM cells),
             |zt AS (SELECT
             |        round(CAST(sr * nn - sn * rr AS DOUBLE) /
             |          sqrt(CAST(rr * (nn - rr) AS DOUBLE) / nn *
             |            CAST(nn * ssn - sn * sn AS DOUBLE)), 6) AS z
             |      FROM tot)
             |SELECT CAST(cells.sc AS BIGINT) AS tercile,
             |  CAST(cells.n AS BIGINT) AS n,
             |  CAST(cells.r AS BIGINT) AS converted,
             |  round(CAST(cells.r AS DOUBLE) / cells.n, 6) AS rate,
             |  zt.z AS z_trend, round(zt.z * zt.z, 4) AS chi2_1df
             |FROM cells CROSS JOIN zt ORDER BY tercile""".stripMargin)),

    // Chapman capture-recapture audit (Lincoln 1930 / Petersen;
    // Chapman 1951's bias-corrected estimator; Seber 1970 variance):
    // estimate the TOTAL user population from two "capture lists" —
    // users ever seen viewing vs users ever seen clicking — and score
    // the estimate against the KNOWN total, the abundance-estimation
    // companion to x235's species richness (Chao1 asks how many types
    // are unseen; Chapman asks how many INDIVIDUALS two overlapping
    // samples imply). N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with Seber's variance
    // and a normal 95% CI; the independence assumption is exactly what
    // the audit tests (users who view are also more likely to click →
    // expect under-estimation). Three distinct-count aggregates and
    // 8-number algebra — one corpus pass, no joins on events.
    QuerySpec(
      "x245_chapman_capture",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val caps = ev.agg(
          countDistinct(when(col("event_type") === "view",
            col("user_id"))).as("n1"),
          countDistinct(when(col("event_type") === "click",
            col("user_id"))).as("n2"),
          countDistinct(col("user_id")).as("n_true"))
        val m = ev.filter(col("event_type").isin("view", "click"))
          .groupBy("user_id")
          .agg(countDistinct(col("event_type")).as("k"))
          .agg(sum(when(col("k") === 2, 1L).otherwise(0L)).as("m"))
        val est = round((col("n1") + 1).cast("double") *
          (col("n2") + 1) / (col("m") + 1) - 1, 4)
        val varC = (col("n1") + 1).cast("double") * (col("n2") + 1) *
          (col("n1") - col("m")) * (col("n2") - col("m")) /
          ((col("m") + 1).cast("double") * (col("m") + 1) *
            (col("m") + 2))
        caps.crossJoin(broadcast(m))
          .select(col("n1"), col("n2"), col("m"), col("n_true"),
            est.as("n_hat"),
            round(sqrt(varC), 4).as("se"),
            round(est - lit(1.96) * round(sqrt(varC), 4), 4)
              .as("ci_lower"),
            round(est + lit(1.96) * round(sqrt(varC), 4), 4)
              .as("ci_upper"),
            round(est / col("n_true"), 6).as("coverage_ratio"))
          .orderBy("n1")
      },
      Some("""WITH caps AS (SELECT
             |        COUNT(DISTINCT CASE WHEN event_type = 'view'
             |          THEN user_id END) AS n1,
             |        COUNT(DISTINCT CASE WHEN event_type = 'click'
             |          THEN user_id END) AS n2,
             |        COUNT(DISTINCT user_id) AS n_true
             |      FROM events),
             |mm AS (SELECT SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS m
             |      FROM (SELECT user_id, COUNT(DISTINCT event_type) AS k
             |            FROM events
             |            WHERE event_type IN ('view', 'click')
             |            GROUP BY 1)),
             |est AS (SELECT n1, n2, m, n_true,
             |        round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1)
             |          - 1, 4) AS n_hat,
             |        round(sqrt(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) *
             |          (n1 - m) * (n2 - m) /
             |          (CAST(m + 1 AS DOUBLE) * (m + 1) * (m + 2))), 4)
             |          AS se
             |      FROM caps CROSS JOIN mm)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  CAST(m AS BIGINT) AS m, CAST(n_true AS BIGINT) AS n_true,
             |  n_hat, se,
             |  round(n_hat - 1.96 * se, 4) AS ci_lower,
             |  round(n_hat + 1.96 * se, 4) AS ci_upper,
             |  round(n_hat / n_true, 6) AS coverage_ratio
             |FROM est ORDER BY n1""".stripMargin)),

    // Cumulative gains / lift table (the direct-marketing standard —
    // Berry & Linoff 1997; Provost & Fawcett 2013 ch.8 treat it as the
    // profit-curve primitive): decile-ranked users by activity score vs
    // the x182 high-value outcome — the "how deep do we mail" read that
    // completes the eval suite (x168 ROC ranks thresholds, x188 AP
    // ranks retrieval, x165 calibrates; gains PRICES a cutoff). Decile
    // cuts from ONE bounded exact-percentile aggregate (the x182
    // device); decile assignment is a 9-comparison sum against the
    // broadcast cut row (row-local, no corpus window); cumulative
    // capture/lift are windows over the 10-row decile aggregate.
    QuerySpec(
      "x246_gain_lift",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
        val cutCols = (1 to 9).map(i =>
          round(expr(s"percentile(act, CAST($i AS DOUBLE) / 10)"), 6)
            .as(s"c$i"))
        val cuts = u.agg(cutCols.head, cutCols.tail: _*)
        val dec = u.crossJoin(broadcast(cuts))
          .select(col("y"),
            (1 to 9).map(i => (col("act") > col(s"c$i")).cast("long"))
              .reduce(_ + _).as("d"))
          .groupBy("d").agg(count(lit(1)).as("n"), sum(col("y")).as("r"))
        val tot = dec.agg(sum(col("n")).as("tn"), sum(col("r")).as("tr"))
        val wc = W.orderBy(col("d").desc)
          .rowsBetween(W.unboundedPreceding, 0)
        dec.crossJoin(broadcast(tot))
          .withColumn("cn", sum(col("n")).over(wc))
          .withColumn("cr", sum(col("r")).over(wc))
          .select((lit(10) - col("d")).as("decile_rank"), col("n"),
            col("r").as("responders"),
            round(col("r").cast("double") / col("n"), 6).as("rate"),
            round(col("cr").cast("double") / col("tr"), 6)
              .as("cum_gain"),
            round(col("cr").cast("double") / col("cn") /
              (col("tr").cast("double") / col("tn")), 6).as("lift"))
          .orderBy("decile_rank")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |cuts AS (SELECT
             |        round(quantile_cont(act, CAST(1 AS DOUBLE) / 10), 6) AS c1,
             |        round(quantile_cont(act, CAST(2 AS DOUBLE) / 10), 6) AS c2,
             |        round(quantile_cont(act, CAST(3 AS DOUBLE) / 10), 6) AS c3,
             |        round(quantile_cont(act, CAST(4 AS DOUBLE) / 10), 6) AS c4,
             |        round(quantile_cont(act, CAST(5 AS DOUBLE) / 10), 6) AS c5,
             |        round(quantile_cont(act, CAST(6 AS DOUBLE) / 10), 6) AS c6,
             |        round(quantile_cont(act, CAST(7 AS DOUBLE) / 10), 6) AS c7,
             |        round(quantile_cont(act, CAST(8 AS DOUBLE) / 10), 6) AS c8,
             |        round(quantile_cont(act, CAST(9 AS DOUBLE) / 10), 6) AS c9
             |      FROM u),
             |dec AS (SELECT
             |        CAST(act > c1 AS BIGINT) + CAST(act > c2 AS BIGINT) +
             |        CAST(act > c3 AS BIGINT) + CAST(act > c4 AS BIGINT) +
             |        CAST(act > c5 AS BIGINT) + CAST(act > c6 AS BIGINT) +
             |        CAST(act > c7 AS BIGINT) + CAST(act > c8 AS BIGINT) +
             |        CAST(act > c9 AS BIGINT) AS d, COUNT(*) AS n,
             |        SUM(y) AS r
             |      FROM u CROSS JOIN cuts GROUP BY 1),
             |tot AS (SELECT SUM(n) AS tn, SUM(r) AS tr FROM dec),
             |cum AS (SELECT d, n, r,
             |        SUM(n) OVER (ORDER BY d DESC ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) AS cn,
             |        SUM(r) OVER (ORDER BY d DESC ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) AS cr
             |      FROM dec)
             |SELECT CAST(10 - d AS BIGINT) AS decile_rank,
             |  CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS responders,
             |  round(CAST(r AS DOUBLE) / n, 6) AS rate,
             |  round(CAST(cr AS DOUBLE) / tot.tr, 6) AS cum_gain,
             |  round(CAST(cr AS DOUBLE) / cn /
             |    (CAST(tot.tr AS DOUBLE) / tot.tn), 6) AS lift
             |FROM cum CROSS JOIN tot ORDER BY decile_rank""".stripMargin)),

    // Trimmed mean with the Tukey-McLaughlin SE (Tukey & McLaughlin,
    // Sankhya 1963; Wilcox 2012 ch.3 for the modern treatment): robust
    // location for purchase values — x179 flags outliers by MAD, this
    // ESTIMATES THROUGH them: 10%-threshold trim for the mean,
    // winsorized variance for the SE (the T-M insight: the trimmed
    // mean's sampling variance is the winsorized variance scaled by
    // (1−2α)⁻²). Thresholds are exact percentiles (the x196
    // correspondence) so trim/winsorize are row-local comparisons; all
    // moments ride rounded-6 DECIMAL sums; α is the ACHIEVED trim
    // fraction (ties at the cut stay in — documented threshold
    // convention, not the order-statistic count).
    QuerySpec(
      "x247_trimmed_mean",
      (s, dir) => {
        val v = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        val cuts = v.agg(
          round(expr("percentile(c, CAST(1 AS DOUBLE) / 10)"), 6)
            .as("q10"),
          round(expr("percentile(c, CAST(9 AS DOUBLE) / 10)"), 6)
            .as("q90"))
        val w = v.crossJoin(broadcast(cuts))
          .select(col("c"), col("q10"), col("q90"),
            (col("c") >= col("q10") && col("c") <= col("q90"))
              .cast("long").as("keep"),
            round(least(greatest(col("c").cast("double"), col("q10")),
              col("q90")), 6).as("wz"))
        val m = w.agg(count(lit(1)).as("n"), sum(col("keep")).as("nt"),
          sum(col("c")).as("sc"),
          sum(when(col("keep") === 1, col("c")).otherwise(0L)).as("st"),
          sum(col("wz").cast("decimal(38,6)")).cast("double").as("sw"),
          sum(round(col("wz") * col("wz"), 6).cast("decimal(38,6)"))
            .cast("double").as("sww"))
        val mw = round(col("sw") / col("n"), 6)
        val vw = round(greatest((col("sww") -
          col("n") * mw * mw) / (col("n") - 1), lit(0.0)), 6)
        val alpha = round((col("n") - col("nt")).cast("double") /
          (lit(2.0) * col("n")), 6)
        m.select(col("n"), col("nt").as("n_trimmed"),
            round(col("sc").cast("double") / col("n") / 100, 6)
              .as("mean_dollars"),
            round(col("st").cast("double") / col("nt") / 100, 6)
              .as("trimmed_mean_dollars"),
            round(sqrt(vw) / 100, 6).as("winsorized_sd_dollars"),
            round(sqrt(vw) / ((lit(1.0) - lit(2) * alpha) *
              sqrt(col("n").cast("double"))) / 100, 6)
              .as("se_trimmed_dollars"))
          .orderBy("n")
      },
      Some("""WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events WHERE event_type = 'purchase'),
             |cuts AS (SELECT
             |        round(quantile_cont(c, CAST(1 AS DOUBLE) / 10), 6)
             |          AS q10,
             |        round(quantile_cont(c, CAST(9 AS DOUBLE) / 10), 6)
             |          AS q90
             |      FROM v),
             |w AS (SELECT c,
             |        CASE WHEN c >= q10 AND c <= q90 THEN 1 ELSE 0 END
             |          AS keep,
             |        round(least(greatest(CAST(c AS DOUBLE), q10), q90),
             |          6) AS wz
             |      FROM v CROSS JOIN cuts),
             |m AS (SELECT COUNT(*) AS n, SUM(keep) AS nt, SUM(c) AS sc,
             |        SUM(CASE WHEN keep = 1 THEN c ELSE 0 END) AS st,
             |        CAST(SUM(CAST(wz AS DECIMAL(38,6))) AS DOUBLE) AS sw,
             |        CAST(SUM(CAST(round(wz * wz, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sww
             |      FROM w),
             |d AS (SELECT n, nt, sc, st,
             |        round(sw / n, 6) AS mw,
             |        round(greatest((sww - n * round(sw / n, 6) *
             |          round(sw / n, 6)) / (n - 1), 0.0), 6) AS vw,
             |        round(CAST(n - nt AS DOUBLE) / (2.0 * n), 6)
             |          AS alpha
             |      FROM m)
             |SELECT CAST(n AS BIGINT) AS n, CAST(nt AS BIGINT)
             |    AS n_trimmed,
             |  round(CAST(sc AS DOUBLE) / n / 100, 6) AS mean_dollars,
             |  round(CAST(st AS DOUBLE) / nt / 100, 6)
             |    AS trimmed_mean_dollars,
             |  round(sqrt(vw) / 100, 6) AS winsorized_sd_dollars,
             |  round(sqrt(vw) / ((1.0 - 2 * alpha) *
             |    sqrt(CAST(n AS DOUBLE))) / 100, 6)
             |    AS se_trimmed_dollars
             |FROM d ORDER BY n""".stripMargin)),

    // Friedman blocked rank test with tie correction (Friedman, JASA
    // 1937; Conover 1999 §5.8 for the tie-corrected form): do the five
    // event types keep the same POPULARITY ORDER day after day? —
    // the repeated-measures companion to x204's Kruskal-Wallis (which
    // pools all observations and so confounds day volume with type
    // preference; Friedman ranks WITHIN each day-block and asks if the
    // rank profile is stable). Blocks are the zero-filled day × type
    // grid (calendar-bounded); average ranks for ties come from
    // rank() + (tiecount−1)/2 — exact halves, so every moment (R_j, A)
    // is an exact rational and the only doubles are the final ratio;
    // Q_c = (k−1)·Σ(R_j − n(k+1)/2)²/(A − C), the Conover form that is
    // exact under ties.
    QuerySpec(
      "x248_friedman",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select(to_date(col("ts")).as("day"), col("event_type"))
        val grid = ev.select("day").distinct()
          .crossJoin(broadcast(ev.select("event_type").distinct()))
          .join(ev.groupBy("day", "event_type")
            .agg(count(lit(1)).as("cnt")), Seq("day", "event_type"),
            "left")
          .na.fill(0L, Seq("cnt"))
        val wr = W.partitionBy("day").orderBy("cnt")
        val wt = W.partitionBy("day", "cnt")
        val ranked = grid
          .withColumn("rk", rank().over(wr))
          .withColumn("tc", count(lit(1)).over(wt))
          .withColumn("r", col("rk") + (col("tc") - 1) / lit(2.0))
        val rj = ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("r").cast("decimal(18,6)")).cast("double").as("rsum"))
        val a = ranked.agg(
          sum(round(col("r") * col("r"), 6).cast("decimal(18,6)"))
            .cast("double").as("aa"), count(lit(1)).as("nk"))
        val k = lit(5.0)
        val stats = rj.crossJoin(broadcast(a))
          .select(col("event_type"), col("n"), col("rsum"),
            round((col("rsum") - col("n") * (k + 1) / 2) *
              (col("rsum") - col("n") * (k + 1) / 2), 6).as("dev2"),
            col("aa"))
        val q = stats.agg(max(col("n")).as("n_days"),
            sum(col("dev2").cast("decimal(18,6)")).cast("double")
              .as("sdev"), max(col("aa")).as("aa"))
          .select(col("n_days"),
            round((k - 1) * col("sdev") /
              (col("aa") - col("n_days") * k * (k + 1) * (k + 1) / 4),
              4).as("friedman_q"))
        stats.select(col("event_type"), col("n").as("n_days"),
            round(col("rsum") / col("n"), 6).as("mean_rank"))
          .crossJoin(broadcast(q.select(col("friedman_q"))))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type
             |      FROM events),
             |grid AS (SELECT d.day, t.event_type, COALESCE(c.cnt, 0)
             |          AS cnt
             |      FROM (SELECT DISTINCT day FROM ev) d
             |      CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
             |      LEFT JOIN (SELECT day, event_type, COUNT(*) AS cnt
             |                 FROM ev GROUP BY 1, 2) c
             |        ON c.day = d.day AND c.event_type = t.event_type),
             |rk AS (SELECT day, event_type, cnt,
             |        rank() OVER (PARTITION BY day ORDER BY cnt) AS rk,
             |        COUNT(*) OVER (PARTITION BY day, cnt) AS tc
             |      FROM grid),
             |r AS (SELECT day, event_type, rk + (tc - 1) / 2.0 AS r
             |      FROM rk),
             |rj AS (SELECT event_type, COUNT(*) AS n,
             |        CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE)
             |          AS rsum
             |      FROM r GROUP BY 1),
             |a AS (SELECT CAST(SUM(CAST(round(r * r, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS aa
             |      FROM r),
             |st AS (SELECT event_type, n, rsum,
             |        round((rsum - n * 6.0 / 2) * (rsum - n * 6.0 / 2),
             |          6) AS dev2, a.aa
             |      FROM rj CROSS JOIN a),
             |q AS (SELECT MAX(n) AS n_days,
             |        round(4.0 * CAST(SUM(CAST(dev2 AS DECIMAL(18,6)))
             |          AS DOUBLE) /
             |          (MAX(aa) - MAX(n) * 5.0 * 6 * 6 / 4), 4)
             |          AS friedman_q
             |      FROM st)
             |SELECT st.event_type, CAST(st.n AS BIGINT) AS n_days,
             |  round(st.rsum / st.n, 6) AS mean_rank, q.friedman_q
             |FROM st CROSS JOIN q ORDER BY event_type""".stripMargin)),

    // Flesch readability (Flesch, J.Appl.Psych 1948; Kincaid et al.
    // 1975 for the grade-level recast): per-source reading ease and
    // FK grade from words/sentences/syllables — the classic
    // curation-filter feature the x23/x72 quality reads don't include
    // (C4 and friends gate on sentence structure; readability is the
    // one-number summary reviewers expect). Syllables are the standard
    // dependency-free proxy — vowel-group runs, floor 1 per word —
    // and sentences are [.!?]+ runs, floor 1 per doc; both are one
    // regexp_count per doc (row-local, codegen'd), the per-doc scores
    // are exact rationals rounded 6, and source means ride the DECIMAL
    // bridge.
    QuerySpec(
      "x249_readability",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("source"),
            TextFunctions.tokens(col("text")).as("ws"), col("text"))
          .filter(size(col("ws")) > 0)
          .select(col("source"), size(col("ws")).cast("long").as("w"),
            greatest(expr("CAST(regexp_count(text, '[.!?]+') AS LONG)"),
              lit(1L)).as("sen"),
            expr("""aggregate(transform(ws, x ->
              greatest(CAST(regexp_count(x, '[aeiouy]+') AS LONG),
              CAST(1 AS LONG))), CAST(0 AS LONG), (a, b) -> a + b)""")
              .as("syl"))
        val scored = d.select(col("source"),
          round(lit(206.835) - lit(1.015) * col("w") / col("sen") -
            lit(84.6) * col("syl") / col("w"), 6).as("fre"),
          round(lit(0.39) * col("w") / col("sen") +
            lit(11.8) * col("syl") / col("w") - lit(15.59), 6).as("fk"))
        scored.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("fre").cast("decimal(18,6)")).cast("double") /
              count(lit(1)), 4).as("mean_reading_ease"),
            round(sum(col("fk").cast("decimal(18,6)")).cast("double") /
              count(lit(1)), 4).as("mean_fk_grade"),
            round(sum(when(col("fre") >= 60, 1L).otherwise(0L))
              .cast("double") / count(lit(1)), 6).as("share_easy"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, text,
             |        list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '') AS ws
             |      FROM documents),
             |d AS (SELECT source, CAST(len(ws) AS BIGINT) AS w,
             |        greatest(CAST(len(regexp_extract_all(text,
             |          '[.!?]+')) AS BIGINT), 1) AS sen,
             |        CAST(list_sum([greatest(len(regexp_extract_all(x,
             |          '[aeiouy]+')), 1) for x in ws]) AS BIGINT) AS syl
             |      FROM t WHERE len(ws) > 0),
             |sc AS (SELECT source,
             |        round(206.835 - 1.015 * w / sen - 84.6 * syl / w, 6)
             |          AS fre,
             |        round(0.39 * w / sen + 11.8 * syl / w - 15.59, 6)
             |          AS fk
             |      FROM d)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  round(CAST(SUM(CAST(fre AS DECIMAL(18,6))) AS DOUBLE)
             |    / COUNT(*), 4) AS mean_reading_ease,
             |  round(CAST(SUM(CAST(fk AS DECIMAL(18,6))) AS DOUBLE)
             |    / COUNT(*), 4) AS mean_fk_grade,
             |  round(CAST(SUM(CASE WHEN fre >= 60 THEN 1 ELSE 0 END)
             |    AS DOUBLE) / COUNT(*), 6) AS share_easy
             |FROM sc GROUP BY 1 ORDER BY source""".stripMargin)),

    // Shapley-value attribution (Shapley 1953; Dalessandro, Perlich,
    // Stitelman & Provost, ADKDD 2012 for the marketing-attribution
    // use): each channel's credit is its average marginal contribution
    // to the conversion rate across ALL coalitions of touched channels —
    // the axiomatic (efficiency/symmetry) companion to x239's Markov
    // removal effects: Markov prices a channel by path counterfactual,
    // Shapley by coalition-game fairness; production stacks report both.
    // The characteristic function v(S) = HIGH-VALUE conversion rate
    // (first purchase over $150 — every synthetic user purchases
    // *something*, so plain purchase would be the degenerate v≡1 game)
    // among users whose PRE-CONVERSION touched-channel set ⊆ S needs
    // only the 16-row mask histogram (one corpus pass → 4-bit mask), the
    // subset sums are a bitwise-AND join on the 16×16 grid, and the
    // Shapley sum is 4 channels × 8 coalitions of exact-rational v's —
    // bounded algebra start to finish; Σφ telescopes to v(full) − v(∅)
    // (efficiency), reported as a built-in audit column.
    QuerySpec(
      "x250_shapley_attribution",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value"))
        val hv = col("event_type") === "purchase" && col("value") > 150
        val fp = ev.filter(hv)
          .groupBy("user_id").agg(min(col("ts")).as("pts"))
        val pe = ev.join(fp, Seq("user_id"), "left")
          .filter(col("pts").isNull || col("ts") <= col("pts"))
        val um = pe.groupBy("user_id").agg(
          (max(when(col("event_type") === "click", 1L).otherwise(0L)) +
            max(when(col("event_type") === "error", 2L).otherwise(0L)) +
            max(when(col("event_type") === "signup", 4L).otherwise(0L)) +
            max(when(col("event_type") === "view", 8L).otherwise(0L)))
            .as("mask"),
          max(when(hv, 1L).otherwise(0L)).as("conv"))
        val g = um.groupBy("mask")
          .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
        val coal = s.range(16).toDF("cs")
        val vt = coal.join(broadcast(g),
            g("mask").bitwiseAND(coal("cs")) === g("mask"), "left")
          .groupBy("cs")
          .agg(coalesce(sum(col("n")), lit(0L)).as("ns"),
            coalesce(sum(col("k")), lit(0L)).as("ks"))
          .select(col("cs"),
            when(col("ns") > 0,
              round(col("ks").cast("double") / col("ns"), 9))
              .otherwise(lit(0.0)).as("v"))
          .localCheckpoint() // 16 rows by construction
        val bits = Seq(("click", 1L), ("error", 2L), ("signup", 4L),
          ("view", 8L)).toDF("channel", "bit")
        val wgt = when(expr("bit_count(cs)") === 0, lit(0.25))
          .when(expr("bit_count(cs)") === 1, lit(1.0) / lit(12.0))
          .when(expr("bit_count(cs)") === 2, lit(1.0) / lit(12.0))
          .otherwise(lit(0.25))
        val phi = broadcast(bits)
          .join(vt.select(col("cs"), col("v")),
            col("cs").bitwiseAND(col("bit")) === 0)
          .join(broadcast(vt.select(col("cs").as("cs2"),
            col("v").as("v2"))), col("cs2") === col("cs") + col("bit"))
          .select(col("channel"),
            round(wgt * (col("v2") - col("v")), 9)
              .cast("decimal(18,9)").as("term"))
          .groupBy("channel")
          .agg(sum(col("term")).cast("double").as("phi"))
        val tot = phi.agg(sum(col("phi").cast("decimal(18,9)"))
          .cast("double").as("sphi"))
        val vEnds = vt.agg(
          round(sum(when(col("cs") === 15, col("v")).otherwise(0.0)) -
            sum(when(col("cs") === 0, col("v")).otherwise(0.0)), 9)
            .as("v_span"))
        phi.crossJoin(broadcast(tot)).crossJoin(broadcast(vEnds))
          .select(col("channel"), round(col("phi"), 6).as("shapley"),
            when(col("sphi") =!= 0,
              round(col("phi") / col("sphi"), 6)).otherwise(lit(0.0))
              .as("share"),
            round(col("sphi") - col("v_span"), 6).as("efficiency_gap"))
          .orderBy("channel")
      },
      Some("""WITH ev AS (SELECT user_id, ts, event_type, value
             |      FROM events),
             |fp AS (SELECT user_id, MIN(ts) AS pts FROM ev
             |      WHERE event_type = 'purchase' AND value > 150
             |      GROUP BY 1),
             |pe AS (SELECT ev.user_id, ev.ts, ev.event_type, ev.value
             |      FROM ev
             |      LEFT JOIN fp ON fp.user_id = ev.user_id
             |      WHERE fp.pts IS NULL OR ev.ts <= fp.pts),
             |um AS (SELECT user_id,
             |        MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0
             |          END) +
             |        MAX(CASE WHEN event_type = 'error' THEN 2 ELSE 0
             |          END) +
             |        MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0
             |          END) +
             |        MAX(CASE WHEN event_type = 'view' THEN 8 ELSE 0
             |          END) AS mask,
             |        MAX(CASE WHEN event_type = 'purchase'
             |          AND value > 150 THEN 1 ELSE 0 END) AS conv
             |      FROM pe GROUP BY 1),
             |g AS (SELECT mask, COUNT(*) AS n, SUM(conv) AS k FROM um
             |      GROUP BY 1),
             |coal AS (SELECT unnest(range(16)) AS cs),
             |vt AS (SELECT coal.cs,
             |        CASE WHEN COALESCE(SUM(g.n), 0) > 0
             |          THEN round(CAST(COALESCE(SUM(g.k), 0) AS DOUBLE) /
             |            COALESCE(SUM(g.n), 0), 9)
             |          ELSE 0.0 END AS v
             |      FROM coal LEFT JOIN g ON (g.mask & coal.cs) = g.mask
             |      GROUP BY 1),
             |bits AS (SELECT 'click' AS channel, 1 AS bit
             |      UNION ALL SELECT 'error', 2
             |      UNION ALL SELECT 'signup', 4
             |      UNION ALL SELECT 'view', 8),
             |phi AS (SELECT bits.channel,
             |        CAST(SUM(CAST(round(
             |          (CASE WHEN bit_count(a.cs) = 0 THEN 0.25
             |            WHEN bit_count(a.cs) = 1 THEN 1.0 / 12.0
             |            WHEN bit_count(a.cs) = 2 THEN 1.0 / 12.0
             |            ELSE 0.25 END) * (b.v - a.v), 9)
             |          AS DECIMAL(18,9))) AS DOUBLE) AS phi
             |      FROM bits JOIN vt a ON (a.cs & bits.bit) = 0
             |      JOIN vt b ON b.cs = a.cs + bits.bit
             |      GROUP BY 1),
             |tot AS (SELECT CAST(SUM(CAST(phi AS DECIMAL(18,9)))
             |          AS DOUBLE) AS sphi FROM phi),
             |ve AS (SELECT round(
             |        SUM(CASE WHEN cs = 15 THEN v ELSE 0.0 END) -
             |        SUM(CASE WHEN cs = 0 THEN v ELSE 0.0 END), 9)
             |          AS v_span FROM vt)
             |SELECT channel, round(phi, 6) AS shapley,
             |  CASE WHEN tot.sphi <> 0 THEN round(phi / tot.sphi, 6)
             |    ELSE 0.0 END AS share,
             |  round(tot.sphi - ve.v_span, 6) AS efficiency_gap
             |FROM phi CROSS JOIN tot CROSS JOIN ve
             |ORDER BY channel""".stripMargin)),

    // Quantile treatment effects (Doksum, AoS 1974; Koenker & Bassett
    // 1978 frame them as quantile-regression coefficients): per decile,
    // the gap between arm purchase-value quantiles — WHERE in the
    // distribution the arms differ, which x228's single-number W₁
    // integrates away and a mean effect (x133/x213) can't see at all
    // (a treatment that fattens the right tail while thinning the left
    // has zero ATE and a sharply sloped QTE curve). Both arms' nine
    // quantiles come from ONE bounded percentile-array aggregate each
    // (the x196 quantile_cont correspondence, rounded 6 element-wise
    // before the diff); dollar outputs round at 8 — past the exact
    // width of the /100 recode — so the half-up-vs-binary tie class
    // x243 hit cannot occur.
    QuerySpec(
      "x251_qte",
      (s, dir) => {
        val p = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).cast("long").as("arm"),
            expr("CAST(round(value * 100) AS BIGINT)").as("y"))
        val fr = (1 to 9).map(i => s"CAST($i AS DOUBLE) / 10")
          .mkString(", ")
        val q = p.groupBy("arm")
          .agg(expr(s"percentile(y, array($fr))").as("qs"))
        val dec = q.select(col("arm"),
            posexplode(col("qs")).as(Seq("pos", "qv")))
          .select(col("arm"), (col("pos") + 1).cast("long").as("decile"),
            round(col("qv"), 6).as("qv"))
        val a = dec.filter(col("arm") === 0)
          .select(col("decile"), col("qv").as("qc"))
        val b = dec.filter(col("arm") === 1)
          .select(col("decile"), col("qv").as("qt"))
        a.join(b, Seq("decile"))
          .select(col("decile"),
            round(col("qc") / 100, 8).as("q_ctrl_dollars"),
            round(col("qt") / 100, 8).as("q_treat_dollars"),
            round((col("qt") - col("qc")) / 100, 8).as("qte_dollars"))
          .orderBy("decile")
      },
      Some("""WITH p AS (SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             |        CAST(round(value * 100) AS BIGINT) AS y
             |      FROM events WHERE event_type = 'purchase'),
             |q AS (SELECT arm, quantile_cont(y,
             |        [CAST(1 AS DOUBLE) / 10, CAST(2 AS DOUBLE) / 10,
             |         CAST(3 AS DOUBLE) / 10, CAST(4 AS DOUBLE) / 10,
             |         CAST(5 AS DOUBLE) / 10, CAST(6 AS DOUBLE) / 10,
             |         CAST(7 AS DOUBLE) / 10, CAST(8 AS DOUBLE) / 10,
             |         CAST(9 AS DOUBLE) / 10]) AS qs
             |      FROM p GROUP BY 1),
             |d AS (SELECT arm, g.i AS decile, round(qs[g.i], 6) AS qv
             |      FROM q CROSS JOIN (SELECT CAST(unnest(range(1, 10))
             |        AS INT) AS i) g)
             |SELECT CAST(a.decile AS BIGINT) AS decile,
             |  round(a.qv / 100, 8) AS q_ctrl_dollars,
             |  round(b.qv / 100, 8) AS q_treat_dollars,
             |  round((b.qv - a.qv) / 100, 8) AS qte_dollars
             |FROM (SELECT * FROM d WHERE arm = 0) a
             |JOIN (SELECT * FROM d WHERE arm = 1) b USING (decile)
             |ORDER BY decile""".stripMargin)),

    // Ljung-Box portmanteau test (Ljung & Box, Biometrika 1978) on the
    // daily event-count series — the TEST companion to x134's ACF read:
    // x134 reports the per-lag correlations, this prices them jointly
    // (Q_m = n(n+2)·Σ_{k≤m} ρ̂_k²/(n−k) ~ χ²_m under white noise), the
    // standard residual-whiteness gate after any x122/x146 forecast fit.
    // Same lagged-pair EQUI-join device as x134 (never a theta join);
    // ρ̂ rounds to 6 exactly as x134's hash-green acf does, each lag's
    // summand rounds to 9 before the 7-row cumulative window, and the
    // χ²_m 95% critical values are the published table as a CASE — so
    // reject flags need no CDF. Scale shape: one corpus day-count
    // aggregate, then bounded |days|·7 algebra.
    QuerySpec(
      "x252_ljung_box",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val mu = d.agg((sum(col("n")).cast("double") / count(lit(1)))
          .as("mu"), count(lit(1)).as("ndays"))
        val c = d.crossJoin(broadcast(mu))
          .select(col("day"), (col("n") - col("mu")).as("xc"),
            col("ndays"))
          .localCheckpoint()
        val denom = c.agg(sum(round(col("xc") * col("xc"), 6)
          .cast("decimal(18,6)")).cast("double").as("denom"),
          max(col("ndays")).as("ndays"))
        val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
        val pairs = c.as("a")
          .crossJoin(broadcast(lags))
          .select(col("lag"), expr("date_add(day, lag)").as("lday"),
            col("xc").as("xa"))
          .join(c.as("b").select(col("day").as("lday"), col("xc").as("xb")),
            "lday")
        val rho = pairs.groupBy("lag")
          .agg(sum(round(col("xa") * col("xb"), 6).cast("decimal(18,6)"))
            .cast("double").as("num"))
          .crossJoin(broadcast(denom))
          .select(col("lag"), col("ndays"),
            round(col("num") / col("denom"), 6).as("acf"))
        val wc = W.orderBy("lag").rowsBetween(W.unboundedPreceding, 0)
        rho
          .withColumn("term",
            round(col("acf") * col("acf") /
              (col("ndays") - col("lag")), 9))
          .withColumn("cum", sum(col("term")).over(wc))
          .select(col("lag").cast("long").as("lag"), col("acf"),
            round(col("ndays") * (col("ndays") + 2L) * col("cum"), 6)
              .as("q_lb"),
            (col("ndays") * (col("ndays") + 2L) * col("cum") >
              when(col("lag") === 1, 3.841)
                .when(col("lag") === 2, 5.991)
                .when(col("lag") === 3, 7.815)
                .when(col("lag") === 4, 9.488)
                .when(col("lag") === 5, 11.070)
                .when(col("lag") === 6, 12.592)
                .otherwise(14.067)).cast("long").as("reject_05"))
          .orderBy("lag")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |      FROM events GROUP BY 1),
             |mu AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mu,
             |        count(*) AS ndays FROM d),
             |c AS (SELECT day, n - mu.mu AS xc, mu.ndays
             |      FROM d CROSS JOIN mu),
             |dn AS (SELECT CAST(sum(CAST(round(xc * xc, 6) AS DECIMAL(18,6)))
             |         AS DOUBLE) AS denom, max(ndays) AS ndays FROM c),
             |l AS (SELECT CAST(lag AS INT) AS lag FROM range(1, 8) t(lag)),
             |rho AS (SELECT l.lag, dn.ndays,
             |        round(CAST(sum(CAST(round(a.xc * b.xc, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) / any_value(dn.denom), 6)
             |          AS acf
             |      FROM c a CROSS JOIN l
             |        JOIN c b ON b.day = a.day + l.lag * INTERVAL 1 DAY
             |        CROSS JOIN dn
             |      GROUP BY l.lag, dn.ndays),
             |t AS (SELECT lag, ndays, acf,
             |        round(acf * acf / (ndays - lag), 9) AS term
             |      FROM rho),
             |q AS (SELECT lag, ndays, acf,
             |        SUM(term) OVER (ORDER BY lag ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) AS cum
             |      FROM t)
             |SELECT CAST(lag AS BIGINT) AS lag, acf,
             |  round(ndays * (ndays + 2) * cum, 6) AS q_lb,
             |  CAST(CASE WHEN ndays * (ndays + 2) * cum >
             |    CASE lag WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
             |      WHEN 3 THEN 7.815 WHEN 4 THEN 9.488 WHEN 5 THEN 11.070
             |      WHEN 6 THEN 12.592 ELSE 14.067 END
             |    THEN 1 ELSE 0 END AS BIGINT) AS reject_05
             |FROM q ORDER BY lag""".stripMargin)),

    // Effect sizes for the A/B spend metric: Cliff's delta (Cliff,
    // Psych. Bulletin 1993) + Cohen's d with the Hedges (1981) small-
    // sample correction — the MAGNITUDE companions to x135's Mann-
    // Whitney decision and x133's Welch t: tests say "different",
    // effect sizes say "by how much", and reporting both is the
    // standards requirement (Romano et al. 2006 thresholds label δ).
    // δ comes EXACTLY from the x135 integer midrank grid (δ =
    // 2U/(n₁n₂) − 1 with half-tie credit, so P(X>Y)−P(X<Y) needs no
    // pair join at any scale); d's moments ride exact BIGINT sums of
    // the integer recode (squares as DECIMAL(38,0) — y² × corpus-scale
    // row counts clears BIGINT only until ~1e18, the documented reason
    // for the wider type). The metric is per-user spend in WHOLE
    // dollars, not cents: the rank grid is keyed on distinct y, and
    // dollars bound it by the spend RANGE (value-bounded like x135's
    // count grid) where cents would let it track user count.
    // Single-row output.
    QuerySpec(
      "x253_effect_sizes",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(expr("CAST(round(value) AS BIGINT)")).as("y"))
          .select((col("user_id") % 2).as("variant"), col("y"))
        val grid = u.groupBy(col("y"))
          .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("cb"))
          .withColumn("cnt", col("ca") + col("cb"))
        val W = org.apache.spark.sql.expressions.Window
        val wc = W.orderBy("y").rowsBetween(W.unboundedPreceding, -1)
        val ranked = grid.withColumn("cumprev",
          coalesce(sum(col("cnt")).over(wc), lit(0L)))
        val m = ranked.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("ca") * (lit(2L) * col("cumprev") + col("cnt") + 1L))
            .as("r2a"),
          sum(col("ca") * col("y")).as("sa"),
          sum(col("cb") * col("y")).as("sb"),
          sum((col("ca") * col("y") * col("y")).cast("decimal(38,0)"))
            .as("qa"),
          sum((col("cb") * col("y") * col("y")).cast("decimal(38,0)"))
            .as("qb"))
        val eff = m.select(col("na"), col("nb"),
            ((col("r2a") - col("na") * (col("na") + 1L)).cast("double") /
              2.0).as("u_a"),
            (col("sa").cast("double") / col("na")).as("ma"),
            (col("sb").cast("double") / col("nb")).as("mb"),
            ((col("qa").cast("double") -
              col("sa").cast("double") * col("sa") / col("na")) /
              (col("na") - 1L)).as("va"),
            ((col("qb").cast("double") -
              col("sb").cast("double") * col("sb") / col("nb")) /
              (col("nb") - 1L)).as("vb"))
          .select(col("na"), col("nb"),
            (lit(2.0) * col("u_a") /
              (col("na").cast("double") * col("nb")) - 1.0).as("delta"),
            ((col("ma") - col("mb")) / sqrt(
              ((col("na") - 1L) * col("va") + (col("nb") - 1L) * col("vb"))
                / (col("na") + col("nb") - 2L))).as("d0"))
        eff.select(col("na"), col("nb"),
            round(col("delta"), 6).as("cliffs_delta"),
            when(abs(col("delta")) < 0.147, "negligible")
              .when(abs(col("delta")) < 0.33, "small")
              .when(abs(col("delta")) < 0.474, "medium")
              .otherwise("large").as("magnitude"),
            round(col("d0"), 6).as("cohens_d"),
            round(col("d0") * (lit(1.0) - lit(3.0) /
              (lit(4.0) * (col("na") + col("nb")) - 9.0)), 6)
              .as("hedges_g"))
          .orderBy("na")
      },
      Some("""WITH u AS (SELECT user_id % 2 AS variant,
             |        SUM(CAST(round(value) AS BIGINT)) AS y
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY user_id),
             |grid AS (SELECT y,
             |          SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS ca,
             |          SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS cb
             |        FROM u GROUP BY 1),
             |g2 AS (SELECT y, ca, cb, ca + cb AS cnt,
             |        COALESCE(SUM(ca + cb) OVER (ORDER BY y
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          AS cumprev
             |      FROM grid),
             |m AS (SELECT SUM(ca) AS na, SUM(cb) AS nb,
             |        SUM(ca * (2 * cumprev + cnt + 1)) AS r2a,
             |        SUM(ca * y) AS sa, SUM(cb * y) AS sb,
             |        SUM(CAST(ca * y * y AS DECIMAL(38,0))) AS qa,
             |        SUM(CAST(cb * y * y AS DECIMAL(38,0))) AS qb
             |      FROM g2),
             |eff AS (SELECT na, nb,
             |        CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 AS u_a,
             |        CAST(sa AS DOUBLE) / na AS ma,
             |        CAST(sb AS DOUBLE) / nb AS mb,
             |        (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
             |          / (na - 1) AS va,
             |        (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb)
             |          / (nb - 1) AS vb
             |      FROM m),
             |e2 AS (SELECT na, nb,
             |        2.0 * u_a / (CAST(na AS DOUBLE) * nb) - 1.0 AS delta,
             |        (ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb)
             |          / (na + nb - 2)) AS d0
             |      FROM eff)
             |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             |  round(delta, 6) AS cliffs_delta,
             |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
             |    WHEN abs(delta) < 0.33 THEN 'small'
             |    WHEN abs(delta) < 0.474 THEN 'medium'
             |    ELSE 'large' END AS magnitude,
             |  round(d0, 6) AS cohens_d,
             |  round(d0 * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6)
             |    AS hedges_g
             |FROM e2 ORDER BY na""".stripMargin)),

    // Yule's characteristic K (Yule 1944, "The Statistical Study of
    // Literary Vocabulary") + Simpson's repeat-rate D per source —
    // length-invariant vocabulary-richness constants where x222's Heaps
    // fit prices vocabulary GROWTH: K = 10⁴·(Σm²V_m − N)/N² measures
    // repetitiveness of the frequency spectrum itself, the classic
    // authorship/MT-detection feature (template-generated and
    // model-generated text drives K up; Burrows x243 reads WHICH words,
    // K reads the shape). Everything to the final division is exact
    // BIGINT on the token-count spectrum (Σf and Σf² per source, no
    // doubles in any shuffle); the whitespace tokenization is x9's
    // convention so both engines split identically.
    QuerySpec(
      "x254_yule_k",
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("source"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("f"))
        tf.groupBy("source")
          .agg(sum(col("f")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            sum(col("f") * col("f")).as("f2"),
            sum(col("f") * (col("f") - 1L)).as("rep"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            round(lit(10000.0) *
              (col("f2") - col("n_tokens")).cast("double") /
              (col("n_tokens").cast("double") * col("n_tokens")), 6)
              .as("yule_k"),
            round(col("rep").cast("double") /
              (col("n_tokens").cast("double") * (col("n_tokens") - 1L)), 9)
              .as("simpson_d"))
          .orderBy("source")
      },
      Some("""WITH tok AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS token
             |      FROM documents),
             |tf AS (SELECT source, token, COUNT(*) AS f FROM tok
             |      GROUP BY 1, 2)
             |SELECT source, CAST(SUM(f) AS BIGINT) AS n_tokens,
             |  COUNT(*) AS vocab,
             |  round(10000.0 * CAST(SUM(f * f) - SUM(f) AS DOUBLE) /
             |    (CAST(SUM(f) AS DOUBLE) * SUM(f)), 6) AS yule_k,
             |  round(CAST(SUM(f * (f - 1)) AS DOUBLE) /
             |    (CAST(SUM(f) AS DOUBLE) * (SUM(f) - 1)), 9) AS simpson_d
             |FROM tf GROUP BY source ORDER BY source""".stripMargin)),

    // Qini curve / uplift-by-decile (Radcliffe, Direct Marketing
    // Analytics J. 2007 — the incremental-response standard): decile
    // users by the activity score and read, per depth, how many
    // conversions the TREATED arm gained over the control-implied
    // counterfactual (cum_rt − cum_rc·cum_nt/cum_nc) — the causal
    // companion to x246's gains table (gains prices a cutoff assuming
    // all response is caused; Qini subtracts what control would have
    // done anyway) and the decile-resolved view of x182's single-number
    // ATE. Same bounded devices as x246: ONE exact-percentile aggregate
    // for the cuts, row-local 9-comparison decile assignment,
    // cumulative windows over the 10-row decile grid; the random-
    // targeting diagonal rides along so the uplift-vs-random read needs
    // no second query. Zero-control deciles report 0 uplift (CASE'd
    // identically in both engines).
    QuerySpec(
      "x255_qini_uplift",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
          .select((col("user_id") % 2).as("t"), col("act"), col("y"))
        val cutCols = (1 to 9).map(i =>
          round(expr(s"percentile(act, CAST($i AS DOUBLE) / 10)"), 6)
            .as(s"c$i"))
        val cuts = u.agg(cutCols.head, cutCols.tail: _*)
        val dec = u.crossJoin(broadcast(cuts))
          .select(col("t"), col("y"),
            (1 to 9).map(i => (col("act") > col(s"c$i")).cast("long"))
              .reduce(_ + _).as("d"))
          .groupBy("d").agg(
            sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
            sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
            sum(when(col("t") === 1, col("y")).otherwise(0L)).as("rt"),
            sum(when(col("t") === 0, col("y")).otherwise(0L)).as("rc"))
        val wc = W.orderBy(col("d").desc)
          .rowsBetween(W.unboundedPreceding, 0)
        val cum = dec
          .withColumn("cnt", sum(col("nt")).over(wc))
          .withColumn("cnc", sum(col("nc")).over(wc))
          .withColumn("crt", sum(col("rt")).over(wc))
          .withColumn("crc", sum(col("rc")).over(wc))
          .withColumn("qini",
            when(col("cnc") > 0,
              round(col("crt").cast("double") -
                col("crc").cast("double") * col("cnt") / col("cnc"), 6))
              .otherwise(lit(0.0)))
          .localCheckpoint() // 10 rows by construction
        val fin = cum.agg(
          sum(when(col("d") === 0, col("qini")).otherwise(0.0))
            .as("q_end"),
          sum(col("nt") + col("nc")).as("tot"))
        cum.crossJoin(broadcast(fin))
          .select((lit(10) - col("d")).as("decile_rank"),
            col("nt"), col("nc"),
            when(col("nt") > 0 && col("nc") > 0,
              round(col("rt").cast("double") / col("nt") -
                col("rc").cast("double") / col("nc"), 6))
              .otherwise(lit(0.0)).as("uplift"),
            col("qini").as("cum_qini"),
            round(col("q_end") * (col("cnt") + col("cnc")).cast("double")
              / col("tot"), 6).as("random_qini"))
          .orderBy("decile_rank")
      },
      Some("""WITH u AS (SELECT user_id % 2 AS t, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY user_id),
             |cuts AS (SELECT
             |        round(quantile_cont(act, CAST(1 AS DOUBLE) / 10), 6) AS c1,
             |        round(quantile_cont(act, CAST(2 AS DOUBLE) / 10), 6) AS c2,
             |        round(quantile_cont(act, CAST(3 AS DOUBLE) / 10), 6) AS c3,
             |        round(quantile_cont(act, CAST(4 AS DOUBLE) / 10), 6) AS c4,
             |        round(quantile_cont(act, CAST(5 AS DOUBLE) / 10), 6) AS c5,
             |        round(quantile_cont(act, CAST(6 AS DOUBLE) / 10), 6) AS c6,
             |        round(quantile_cont(act, CAST(7 AS DOUBLE) / 10), 6) AS c7,
             |        round(quantile_cont(act, CAST(8 AS DOUBLE) / 10), 6) AS c8,
             |        round(quantile_cont(act, CAST(9 AS DOUBLE) / 10), 6) AS c9
             |      FROM u),
             |dec AS (SELECT
             |        CAST(act > c1 AS BIGINT) + CAST(act > c2 AS BIGINT) +
             |        CAST(act > c3 AS BIGINT) + CAST(act > c4 AS BIGINT) +
             |        CAST(act > c5 AS BIGINT) + CAST(act > c6 AS BIGINT) +
             |        CAST(act > c7 AS BIGINT) + CAST(act > c8 AS BIGINT) +
             |        CAST(act > c9 AS BIGINT) AS d,
             |        SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS nt,
             |        SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS nc,
             |        SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS rt,
             |        SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS rc
             |      FROM u CROSS JOIN cuts GROUP BY 1),
             |cum AS (SELECT d, nt, nc, rt, rc,
             |        SUM(nt) OVER w AS cnt, SUM(nc) OVER w AS cnc,
             |        SUM(rt) OVER w AS crt, SUM(rc) OVER w AS crc
             |      FROM dec WINDOW w AS (ORDER BY d DESC ROWS BETWEEN
             |        UNBOUNDED PRECEDING AND CURRENT ROW)),
             |cq AS (SELECT d, nt, nc, rt, rc, cnt, cnc,
             |        CASE WHEN cnc > 0 THEN round(CAST(crt AS DOUBLE) -
             |          CAST(crc AS DOUBLE) * cnt / cnc, 6)
             |          ELSE 0.0 END AS qini
             |      FROM cum),
             |fin AS (SELECT SUM(CASE WHEN d = 0 THEN qini ELSE 0.0 END)
             |          AS q_end,
             |        SUM(nt + nc) AS tot FROM cq)
             |SELECT CAST(10 - d AS BIGINT) AS decile_rank,
             |  CAST(nt AS BIGINT) AS nt, CAST(nc AS BIGINT) AS nc,
             |  CASE WHEN nt > 0 AND nc > 0 THEN
             |    round(CAST(rt AS DOUBLE) / nt - CAST(rc AS DOUBLE) / nc, 6)
             |    ELSE 0.0 END AS uplift,
             |  qini AS cum_qini,
             |  round(fin.q_end * CAST(cnt + cnc AS DOUBLE) / fin.tot, 6)
             |    AS random_qini
             |FROM cq CROSS JOIN fin ORDER BY decile_rank""".stripMargin)),

    // t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    // completes the privacy triptych: x103 counts QI-class sizes
    // (k-anonymity), x198 counts distinct sensitive values per class
    // (l-diversity), and this prices the DISTRIBUTION gap l-diversity
    // misses (a class can hold l distinct balances yet still skew
    // rich): per (nation, segment) class, the ordinal EMD between the
    // class's balance-quartile distribution and the global one,
    // D = Σᵢ|Σ_{j≤i}(q_j−p_j)|/(m−1) — the paper's equal-spacing
    // closed form. Quartile cuts are ONE bounded exact-percentile
    // aggregate; the class×bucket grid is zero-filled by construction
    // (classes × range(4) cross of two bounded frames); cum windows
    // run partitioned by class over 4-row partitions. p/q round to 9
    // before differencing so both engines difference identical values.
    QuerySpec(
      "x256_t_closeness",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val c = Tables.customer(s, dir)
          .select(col("c_nationkey").cast("long").as("nation"),
            col("c_mktsegment").as("segment"), col("c_acctbal"))
        val cuts = c.agg(
          round(expr("percentile(c_acctbal, 0.25)"), 6).as("c1"),
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("c2"),
          round(expr("percentile(c_acctbal, 0.75)"), 6).as("c3"))
        val b = c.crossJoin(broadcast(cuts))
          .select(col("nation"), col("segment"),
            ((col("c_acctbal") > col("c1")).cast("long") +
              (col("c_acctbal") > col("c2")).cast("long") +
              (col("c_acctbal") > col("c3")).cast("long")).as("bucket"))
          .localCheckpoint()
        val glob = b.groupBy("bucket").agg(count(lit(1)).as("gn"))
          .crossJoin(broadcast(b.agg(count(lit(1)).as("gt"))))
          .select(col("bucket"),
            round(col("gn").cast("double") / col("gt"), 9).as("p"))
        val cls = b.groupBy("nation", "segment")
          .agg(count(lit(1)).as("n"))
        val grid = cls.crossJoin(broadcast(s.range(4).toDF("bucket")))
        val q = b.groupBy("nation", "segment", "bucket")
          .agg(count(lit(1)).as("cn"))
        val cell = grid.join(q, Seq("nation", "segment", "bucket"), "left")
          .na.fill(0L, Seq("cn"))
          .select(col("nation"), col("segment"), col("bucket"), col("n"),
            round(col("cn").cast("double") / col("n"), 9).as("qp"))
          .join(broadcast(glob), "bucket")
        val wc = W.partitionBy("nation", "segment").orderBy("bucket")
          .rowsBetween(W.unboundedPreceding, 0)
        cell
          .withColumn("cum", sum(round(col("qp") - col("p"), 9)).over(wc))
          .filter(col("bucket") < 3)
          .groupBy("nation", "segment")
          .agg(max(col("n")).as("n"),
            round(sum(abs(round(col("cum"), 9)).cast("decimal(18,9)"))
              .cast("double") / 3.0, 6).as("emd"))
          .select(col("nation"), col("segment"), col("n"), col("emd"),
            (col("emd") > 0.15).cast("long").as("violates_t15"))
          .orderBy("nation", "segment")
      },
      Some("""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |        c_mktsegment AS segment, c_acctbal FROM customer),
             |cuts AS (SELECT
             |        round(quantile_cont(c_acctbal, 0.25), 6) AS c1,
             |        round(quantile_cont(c_acctbal, 0.5), 6) AS c2,
             |        round(quantile_cont(c_acctbal, 0.75), 6) AS c3
             |      FROM c),
             |b AS (SELECT nation, segment,
             |        CAST(c_acctbal > c1 AS BIGINT) +
             |        CAST(c_acctbal > c2 AS BIGINT) +
             |        CAST(c_acctbal > c3 AS BIGINT) AS bucket
             |      FROM c CROSS JOIN cuts),
             |gt AS (SELECT COUNT(*) AS gt FROM b),
             |gd AS (SELECT bucket,
             |        round(CAST(COUNT(*) AS DOUBLE) / gt.gt, 9) AS p
             |      FROM b CROSS JOIN gt GROUP BY bucket, gt.gt),
             |cls AS (SELECT nation, segment, COUNT(*) AS n FROM b
             |      GROUP BY 1, 2),
             |grid AS (SELECT nation, segment, n, g.bucket
             |      FROM cls CROSS JOIN (SELECT unnest(range(4)) AS bucket) g),
             |q AS (SELECT nation, segment, bucket, COUNT(*) AS cn FROM b
             |      GROUP BY 1, 2, 3),
             |cell AS (SELECT grid.nation, grid.segment, grid.bucket,
             |        grid.n,
             |        round(CAST(COALESCE(q.cn, 0) AS DOUBLE) / grid.n, 9)
             |          AS qp, gd.p
             |      FROM grid LEFT JOIN q ON q.nation = grid.nation
             |        AND q.segment = grid.segment
             |        AND q.bucket = grid.bucket
             |      JOIN gd ON gd.bucket = grid.bucket),
             |cum AS (SELECT nation, segment, bucket, n,
             |        SUM(round(qp - p, 9)) OVER (PARTITION BY nation,
             |          segment ORDER BY bucket ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) AS cum
             |      FROM cell)
             |SELECT nation, segment, MAX(n) AS n,
             |  round(CAST(SUM(CAST(abs(round(cum, 9)) AS DECIMAL(18,9)))
             |    AS DOUBLE) / 3.0, 6) AS emd,
             |  CAST(round(CAST(SUM(CAST(abs(round(cum, 9))
             |    AS DECIMAL(18,9))) AS DOUBLE) / 3.0, 6) > 0.15
             |    AS BIGINT) AS violates_t15
             |FROM cum WHERE bucket < 3
             |GROUP BY nation, segment
             |ORDER BY nation, segment""".stripMargin)),

    // KMV set-expression estimation (Beyer, Haas, Reinwald, Sismanis &
    // Gemulla, SIGMOD 2007 — "the" mergeable distinct sketch for set
    // algebra): union, intersection and Jaccard of the two source-
    // parity token vocabularies from only the k=256 smallest 48-bit
    // token hashes per side — the capability that separates KMV from
    // the suite's HLL (x46: union-only): the k smallest of A∪B are
    // each among the k smallest of their own side, so membership flags
    // on the MERGED sketch are exact and K∩/K gives Jaccard. Same md5
    // 48-bit device as x205 (hash-replayable in SQL); per-side k-min
    // via partitioned rank → WindowGroupLimit; the merge ranks a ≤2k
    // frame. Exact values ride along for the rel-error read.
    QuerySpec(
      "x257_kmv_set_ops",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val k = 256
        val toks = Tables.documents(s, dir)
          .select((substring(col("source"), 4, 8).cast("long") % 2)
            .as("grp"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("token"))
          .distinct()
        val h = toks.select(col("grp"),
            conv(substring(md5(concat(lit("kmvs:"), col("token"))), 1, 12),
              16, 10).cast("long").as("h"))
          .distinct()
          .localCheckpoint() // feeds both sketches and the exact counts
        val sk = h
          .withColumn("rn",
            row_number().over(W.partitionBy("grp").orderBy("h")))
          .filter(col("rn") <= k)
        val merged = sk.groupBy("h")
          .agg(max((col("grp") === 0).cast("long")).as("in0"),
            max((col("grp") === 1).cast("long")).as("in1"))
          .withColumn("rn", row_number().over(W.orderBy("h")))
          .filter(col("rn") <= k)
        val est = merged.agg(
          max(when(col("rn") === k, col("h"))).as("hk"),
          sum(((col("in0") === 1) && (col("in1") === 1)).cast("long"))
            .as("kboth"),
          count(lit(1)).as("ku"))
        val exact = h.groupBy("h")
          .agg(max((col("grp") === 0).cast("long")).as("in0"),
            max((col("grp") === 1).cast("long")).as("in1"))
          .agg(count(lit(1)).as("union_exact"),
            sum(((col("in0") === 1) && (col("in1") === 1)).cast("long"))
              .as("inter_exact"))
        est.crossJoin(broadcast(exact))
          .select(lit(k.toLong).as("k"), col("union_exact"),
            round(lit(71776119061217280.0) / col("hk"), 2)
              .as("union_est"),
            col("inter_exact"),
            round(col("kboth").cast("double") / col("ku"), 6)
              .as("jaccard_est"),
            round(col("inter_exact").cast("double") / col("union_exact"),
              6).as("jaccard_exact"),
            round(col("kboth").cast("double") / col("ku") *
              (lit(71776119061217280.0) / col("hk")), 2)
              .as("inter_est"))
          .select(col("k"), col("union_exact"), col("union_est"),
            round((col("union_est") - col("union_exact")) /
              col("union_exact"), 6).as("union_rel_err"),
            col("inter_exact"), col("inter_est"), col("jaccard_exact"),
            col("jaccard_est"))
          .orderBy("k")
      },
      Some("""WITH toks AS (SELECT DISTINCT
             |        CAST(substr(source, 4, 8) AS BIGINT) % 2 AS grp,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS token
             |      FROM documents),
             |h AS (SELECT DISTINCT grp,
             |        CAST(('0x' || substr(md5('kmvs:' || token), 1, 12))
             |          AS BIGINT) AS h
             |      FROM toks),
             |sk AS (SELECT grp, h FROM (SELECT grp, h,
             |          row_number() OVER (PARTITION BY grp ORDER BY h)
             |            AS rn FROM h) WHERE rn <= 256),
             |mg AS (SELECT h,
             |        MAX(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS in0,
             |        MAX(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS in1
             |      FROM sk GROUP BY h),
             |mk AS (SELECT h, in0, in1,
             |        row_number() OVER (ORDER BY h) AS rn FROM mg),
             |est AS (SELECT MAX(CASE WHEN rn = 256 THEN h END) AS hk,
             |        SUM(CASE WHEN in0 = 1 AND in1 = 1 THEN 1 ELSE 0 END)
             |          AS kboth,
             |        COUNT(*) AS ku
             |      FROM mk WHERE rn <= 256),
             |ex0 AS (SELECT h,
             |        MAX(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS in0,
             |        MAX(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS in1
             |      FROM h GROUP BY h),
             |ex AS (SELECT COUNT(*) AS union_exact,
             |        SUM(CASE WHEN in0 = 1 AND in1 = 1 THEN 1 ELSE 0 END)
             |          AS inter_exact
             |      FROM ex0),
             |r AS (SELECT CAST(256 AS BIGINT) AS k, ex.union_exact,
             |        round(71776119061217280.0 / est.hk, 2)
             |          AS union_est,
             |        ex.inter_exact,
             |        round(CAST(est.kboth AS DOUBLE) / est.ku, 6)
             |          AS jaccard_est,
             |        round(CAST(ex.inter_exact AS DOUBLE) / ex.union_exact,
             |          6) AS jaccard_exact,
             |        round(CAST(est.kboth AS DOUBLE) / est.ku *
             |          (71776119061217280.0 / est.hk), 2)
             |          AS inter_est
             |      FROM est CROSS JOIN ex)
             |SELECT k, union_exact, union_est,
             |  round((union_est - CAST(union_exact AS DOUBLE)) /
             |    union_exact, 6) AS union_rel_err,
             |  CAST(inter_exact AS BIGINT) AS inter_exact, inter_est,
             |  jaccard_exact, jaccard_est
             |FROM r ORDER BY k""".stripMargin)),

    // Edit-distance near-dup verification (Levenshtein 1966; prefix
    // blocking per Christen, "Data Matching" 2012 ch.4) — the
    // CHARACTER-level dedup read the suite's token-level families
    // (minhash x2, simhash x3, suffix x99) can't give: small in-word
    // typo edits barely move a shingle set but count exactly here.
    // Candidates come ONLY from 24-char-prefix blocks, and each member
    // verifies against its block's min-doc_id REPRESENTATIVE only (the
    // x34 dup-clusters-star discipline): the O(L²) levenshtein count is
    // LINEAR in block size where the naive within-block all-pairs is
    // quadratic — the first cut of this query probed 105x wall at 10x
    // on a dup-rich corpus for exactly that reason; the star form's
    // cost tracks true output (every replica IS a real near-dup of its
    // rep). A |len−len_rep| ≤ 20% prefilter rides in the join (a lower
    // bound on edit distance — lossless for the 0.2 threshold).
    // Documented recall trade: prefix blocking misses head-edited dups,
    // star edges certify rep↔member, not member↔member. Both engines
    // ship the same unit-cost levenshtein builtin.
    QuerySpec(
      "x258_edit_distance_dedup",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"),
            length(col("text")).as("len"),
            substring(col("text"), 1, 24).as("blk"))
          .localCheckpoint() // feeds both the rep table and the probe side
        val reps = d.groupBy("blk").agg(min(col("doc_id")).as("rid"))
          .join(d.select(col("doc_id").as("rid"),
            col("text").as("rtext"), col("len").as("rlen")), "rid")
        val pairs = d.join(reps, "blk")
          .filter(col("doc_id") > col("rid") &&
            abs(col("len") - col("rlen")) * 5 <=
              greatest(col("len"), col("rlen")))
          .select(col("rid").as("doc_id"), col("doc_id").as("doc_id2"),
            levenshtein(col("rtext"), col("text")).as("dist"),
            greatest(col("len"), col("rlen")).as("mx"))
        pairs.filter(col("dist") * 5 <= col("mx"))
          .select(col("doc_id"), col("doc_id2"), col("dist").cast("long")
            .as("dist"),
            round(lit(1.0) - col("dist").cast("double") / col("mx"), 6)
              .as("sim"))
          .orderBy("doc_id", "doc_id2")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len,
             |        substr(text, 1, 24) AS blk
             |      FROM documents),
             |r0 AS (SELECT blk, MIN(doc_id) AS rid FROM d GROUP BY 1),
             |reps AS (SELECT r0.blk, r0.rid, d.text AS rtext,
             |        d.len AS rlen
             |      FROM r0 JOIN d ON d.doc_id = r0.rid),
             |p AS (SELECT reps.rid AS doc_id, d.doc_id AS doc_id2,
             |        levenshtein(reps.rtext, d.text) AS dist,
             |        greatest(d.len, reps.rlen) AS mx
             |      FROM d JOIN reps ON d.blk = reps.blk
             |        AND d.doc_id > reps.rid
             |        AND abs(d.len - reps.rlen) * 5 <=
             |          greatest(d.len, reps.rlen))
             |SELECT doc_id, doc_id2, CAST(dist AS BIGINT) AS dist,
             |  round(1.0 - CAST(dist AS DOUBLE) / mx, 6) AS sim
             |FROM p WHERE dist * 5 <= mx
             |ORDER BY doc_id, doc_id2""".stripMargin)),

    // Cronbach's alpha (Cronbach, Psychometrika 1951) over the five
    // event-type counts as a 5-item "engagement scale" — the internal-
    // consistency read behind every composite score the suite already
    // ranks on (x246/x255 decile users by RAW activity; alpha says
    // whether summing the five type counts into one scale is even
    // coherent, the pre-step every survey/metric methodology requires).
    // α = k/(k−1)·(1 − Σⱼvarⱼ/var_total): one user-grid aggregate
    // (5 conditional counts per user), then ONE moment pass — all sums
    // exact BIGINT (squares stay far under 2⁶³ at any per-user count),
    // doubles only in the final 1-row algebra. The mean inter-item
    // covariance share rides along as the diagnostic column.
    QuerySpec(
      "x259_cronbach_alpha",
      (s, dir) => {
        val types = Seq("click", "view", "signup", "error", "purchase")
        val cnt = types.zipWithIndex.map { case (t, i) =>
          sum(when(col("event_type") === t, 1L).otherwise(0L))
            .as(s"c$i") }
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(cnt.head, cnt.tail: _*)
          .withColumn("tot",
            (0 until 5).map(i => col(s"c$i")).reduce(_ + _))
        val mAgg = (0 until 5).flatMap(i => Seq(
          sum(col(s"c$i")).as(s"s$i"),
          sum(col(s"c$i") * col(s"c$i")).as(s"q$i"))) ++ Seq(
          sum(col("tot")).as("st"),
          sum(col("tot") * col("tot")).as("qt"),
          count(lit(1)).as("n"))
        val m = u.agg(mAgg.head, mAgg.tail: _*)
        val varItem = (0 until 5).map(i =>
          (col(s"q$i").cast("double") -
            col(s"s$i").cast("double") * col(s"s$i") / col("n")) /
            (col("n") - 1L)).reduce(_ + _)
        val varTot = (col("qt").cast("double") -
          col("st").cast("double") * col("st") / col("n")) /
          (col("n") - 1L)
        m.select(col("n").as("n_users"), lit(5L).as("k_items"),
            round(varItem, 6).as("sum_item_var"),
            round(varTot, 6).as("total_var"),
            round(lit(1.25) * (lit(1.0) - varItem / varTot), 6)
              .as("alpha"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |          AS c0,
             |        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |          AS c1,
             |        SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             |          AS c2,
             |        SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |          AS c3,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             |          END) AS c4,
             |        COUNT(*) AS tot
             |      FROM events GROUP BY user_id),
             |m AS (SELECT COUNT(*) AS n,
             |        SUM(c0) AS s0, SUM(c0 * c0) AS q0,
             |        SUM(c1) AS s1, SUM(c1 * c1) AS q1,
             |        SUM(c2) AS s2, SUM(c2 * c2) AS q2,
             |        SUM(c3) AS s3, SUM(c3 * c3) AS q3,
             |        SUM(c4) AS s4, SUM(c4 * c4) AS q4,
             |        SUM(tot) AS st, SUM(tot * tot) AS qt
             |      FROM u),
             |v AS (SELECT n,
             |        (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n)
             |          / (n - 1) +
             |        (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
             |          / (n - 1) +
             |        (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n)
             |          / (n - 1) +
             |        (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n)
             |          / (n - 1) +
             |        (CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * s4 / n)
             |          / (n - 1) AS vi,
             |        (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
             |          / (n - 1) AS vt
             |      FROM m)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |  CAST(5 AS BIGINT) AS k_items,
             |  round(vi, 6) AS sum_item_var,
             |  round(vt, 6) AS total_var,
             |  round(1.25 * (1.0 - vi / vt), 6) AS alpha
             |FROM v ORDER BY n_users""".stripMargin)),

    // Subclassification ATE (Rosenbaum & Rubin, JASA 1984 — stratify on
    // the propensity proxy, difference within, pool): the stratified
    // companion to x182's IPW — same activity-quintile strata and the
    // same "high-value repeat buyer" treatment, but where IPW reweights
    // each arm this DIFFERENCES WITHIN each stratum and pools by
    // stratum weight, which (a) exposes effect HETEROGENEITY (the
    // per-stratum rows x182's single number hides) and (b) carries the
    // textbook pooled SE  Σw_g²(s²_{1g}/n_{1g}+s²_{0g}/n_{0g}) that IPW
    // lacks. One user-grid pass, ONE bounded percentile aggregate, all
    // moments exact BIGINT; degenerate strata (an arm empty) are
    // excluded from the pool and reported via the excluded flag.
    QuerySpec(
      "x260_strat_ate",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("t"))
        val qs = u.agg(
          expr("percentile(act, array(0.2, 0.4, 0.6, 0.8))").as("q"))
        val st = u.crossJoin(broadcast(qs))
          .select(col("y"), col("t"),
            ((col("act") > element_at(col("q"), 1)).cast("long") +
              (col("act") > element_at(col("q"), 2)).cast("long") +
              (col("act") > element_at(col("q"), 3)).cast("long") +
              (col("act") > element_at(col("q"), 4)).cast("long"))
              .as("stratum"))
          .groupBy("stratum")
          .agg(count(lit(1)).as("n"),
            sum(col("t")).as("n1"),
            sum(col("t") * col("y")).as("sy1"),
            sum(col("t") * col("y") * col("y")).as("qy1"),
            sum((lit(1L) - col("t")) * col("y")).as("sy0"),
            sum((lit(1L) - col("t")) * col("y") * col("y")).as("qy0"))
          .withColumn("n0", col("n") - col("n1"))
          .localCheckpoint() // 5 rows by construction
        val g = st.select(col("stratum"), col("n"), col("n1"), col("n0"),
          when(col("n1") > 0 && col("n0") > 0,
            round(col("sy1").cast("double") / col("n1") -
              col("sy0").cast("double") / col("n0"), 6))
            .as("diff"),
          when(col("n1") > 1 && col("n0") > 1,
            round((col("qy1").cast("double") -
              col("sy1").cast("double") * col("sy1") / col("n1")) /
              (col("n1") - 1L) / col("n1") +
              (col("qy0").cast("double") -
                col("sy0").cast("double") * col("sy0") / col("n0")) /
                (col("n0") - 1L) / col("n0"), 9)).as("vg"))
        val pool = g.filter(col("diff").isNotNull && col("vg").isNotNull)
          .crossJoin(broadcast(g.agg(sum(
            when(col("diff").isNotNull && col("vg").isNotNull, col("n"))
              .otherwise(0L)).as("nu"))))
          .agg(max(col("nu")).as("n_used"),
            sum(round(col("n").cast("double") * col("diff"), 6)
              .cast("decimal(38,6)")).cast("double").as("swd"),
            sum(round(col("n").cast("double") * col("n") * col("vg"), 6)
              .cast("decimal(38,6)")).cast("double").as("swv"))
        g.crossJoin(broadcast(pool))
          .select(col("stratum"), col("n"), col("n1"), col("n0"),
            coalesce(col("diff"), lit(0.0)).as("diff_g"),
            (col("diff").isNull || col("vg").isNull).cast("long")
              .as("excluded"),
            round(col("swd") / col("n_used"), 6).as("ate_strat"),
            round(sqrt(col("swv")) / col("n_used"), 6).as("se_strat"))
          .orderBy("stratum")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |          AS y,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS t
             |      FROM events GROUP BY 1),
             |qs AS (SELECT quantile_cont(act, [0.2, 0.4, 0.6, 0.8]) AS q
             |      FROM u),
             |st AS (SELECT
             |        CAST(act > q[1] AS BIGINT) +
             |        CAST(act > q[2] AS BIGINT) +
             |        CAST(act > q[3] AS BIGINT) +
             |        CAST(act > q[4] AS BIGINT) AS stratum,
             |        COUNT(*) AS n, SUM(t) AS n1,
             |        SUM(t * y) AS sy1, SUM(t * y * y) AS qy1,
             |        SUM((1 - t) * y) AS sy0,
             |        SUM((1 - t) * y * y) AS qy0
             |      FROM u CROSS JOIN qs GROUP BY 1),
             |g AS (SELECT stratum, n, n1, n - n1 AS n0,
             |        CASE WHEN n1 > 0 AND n - n1 > 0 THEN
             |          round(CAST(sy1 AS DOUBLE) / n1 -
             |            CAST(sy0 AS DOUBLE) / (n - n1), 6) END AS diff,
             |        CASE WHEN n1 > 1 AND n - n1 > 1 THEN
             |          round((CAST(qy1 AS DOUBLE) -
             |            CAST(sy1 AS DOUBLE) * sy1 / n1) / (n1 - 1) / n1 +
             |            (CAST(qy0 AS DOUBLE) -
             |            CAST(sy0 AS DOUBLE) * sy0 / (n - n1)) /
             |            (n - n1 - 1) / (n - n1), 9) END AS vg
             |      FROM st),
             |pool AS (SELECT
             |        SUM(CASE WHEN diff IS NOT NULL AND vg IS NOT NULL
             |          THEN n ELSE 0 END) AS n_used,
             |        CAST(SUM(CASE WHEN diff IS NOT NULL
             |            AND vg IS NOT NULL
             |          THEN CAST(round(CAST(n AS DOUBLE) * diff, 6)
             |            AS DECIMAL(38,6)) END) AS DOUBLE) AS swd,
             |        CAST(SUM(CASE WHEN diff IS NOT NULL
             |            AND vg IS NOT NULL
             |          THEN CAST(round(CAST(n AS DOUBLE) * n * vg, 6)
             |            AS DECIMAL(38,6)) END) AS DOUBLE) AS swv
             |      FROM g)
             |SELECT stratum, CAST(n AS BIGINT) AS n,
             |  CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
             |  COALESCE(diff, 0.0) AS diff_g,
             |  CAST(diff IS NULL OR vg IS NULL AS BIGINT) AS excluded,
             |  round(pool.swd / pool.n_used, 6) AS ate_strat,
             |  round(sqrt(pool.swv) / pool.n_used, 6) AS se_strat
             |FROM g CROSS JOIN pool ORDER BY stratum""".stripMargin)),

    // Overdispersion test (Cameron & Trivedi, J. Econometrics 1990; the
    // NB2 auxiliary regression, Cameron-Trivedi 2013 ch. 3): does the
    // per-user event-count variance exceed its Poisson mean — the
    // gatekeeper every count model needs BEFORE x121-style fits treat
    // counts as exponential-family, and the formal read behind x95's
    // anomaly z-scores (a Poisson band on overdispersed counts
    // over-alarms). With the NB2 regressor g(μ)=μ² and a common μ the
    // auxiliary OLS collapses to a one-sample t on w = ((y−μ)²−y)/μ:
    // α̂ = w̄/μ, z = √n·w̄/s_w. One user-grid pass then exact-BIGINT
    // moment sums; w rounds 6 into DECIMAL sums (μ is the only double).
    QuerySpec(
      "x261_overdispersion",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("y"))
        val mu = u.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n"), col("sy"), col("syy"),
            round(col("sy").cast("double") / col("n"), 6).as("mu"))
        val w = u.crossJoin(broadcast(mu))
          .select(col("n"), col("sy"), col("syy"), col("mu"),
            round(((col("y") - col("mu")) * (col("y") - col("mu")) -
              col("y")) / col("mu"), 6).as("w"))
          .groupBy("n", "sy", "syy", "mu")
          .agg(sum(col("w").cast("decimal(38,6)")).cast("double").as("sw"),
            sum(round(col("w") * col("w"), 6).cast("decimal(38,6)"))
              .cast("double").as("sww"))
        w.select(col("n").as("n_users"),
            col("mu").as("mean"),
            round((col("syy").cast("double") -
              col("sy").cast("double") * col("sy") / col("n")) /
              (col("n") - 1L), 6).as("variance"),
            round(((col("syy").cast("double") -
              col("sy").cast("double") * col("sy") / col("n")) /
              (col("n") - 1L)) / col("mu"), 6).as("dispersion_ratio"),
            round(col("sw") / col("n") / col("mu"), 6).as("alpha_hat"),
            round(sqrt(col("n").cast("double")) * (col("sw") / col("n")) /
              sqrt((col("sww") - col("sw") * col("sw") / col("n")) /
                (col("n") - 1L)), 6).as("z"),
            (sqrt(col("n").cast("double")) * (col("sw") / col("n")) /
              sqrt((col("sww") - col("sw") * col("sw") / col("n")) /
                (col("n") - 1L)) > 1.645).cast("long")
              .as("overdispersed_05"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS y FROM events
             |      GROUP BY 1),
             |mu AS (SELECT COUNT(*) AS n, SUM(y) AS sy,
             |        SUM(y * y) AS syy,
             |        round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS mu
             |      FROM u),
             |w AS (SELECT mu.n, mu.sy, mu.syy, mu.mu,
             |        CAST(SUM(CAST(round(((y - mu.mu) * (y - mu.mu) - y)
             |          / mu.mu, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sw,
             |        CAST(SUM(CAST(round(round(((y - mu.mu) *
             |          (y - mu.mu) - y) / mu.mu, 6) *
             |          round(((y - mu.mu) * (y - mu.mu) - y) / mu.mu, 6),
             |          6) AS DECIMAL(38,6))) AS DOUBLE) AS sww
             |      FROM u CROSS JOIN mu GROUP BY 1, 2, 3, 4)
             |SELECT CAST(n AS BIGINT) AS n_users, mu AS mean,
             |  round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
             |    / (n - 1), 6) AS variance,
             |  round(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
             |    / (n - 1)) / mu, 6) AS dispersion_ratio,
             |  round(sw / n / mu, 6) AS alpha_hat,
             |  round(sqrt(CAST(n AS DOUBLE)) * (sw / n) /
             |    sqrt((sww - sw * sw / n) / (n - 1)), 6) AS z,
             |  CAST(sqrt(CAST(n AS DOUBLE)) * (sw / n) /
             |    sqrt((sww - sw * sw / n) / (n - 1)) > 1.645 AS BIGINT)
             |    AS overdispersed_05
             |FROM w ORDER BY n_users""".stripMargin)),

    // Theil T inequality decomposition (Theil 1967; Shorrocks,
    // Econometrica 1980 for the additive-decomposability result —
    // Theil is the ONLY inequality index whose total splits exactly
    // into within + between): order-value concentration by
    // o_orderpriority — the decomposition read x147's Gini can't give
    // (Gini doesn't decompose; Theil says HOW MUCH inequality lives
    // inside priority classes vs between them). Every ratio x/μ is an
    // exact BIGINT-cents rational (x·n/Σx), so each ln lands on the
    // same argument in both engines (rounded 6, the corpus-grain
    // transcendental class) and rides DECIMAL sums; group moments are
    // a 5-row grid.
    QuerySpec(
      "x262_theil_decomposition",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("prio"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
          .localCheckpoint() // one scan feeds totals, groups, both passes
        val tot = o.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        val gm = o.groupBy("prio")
          .agg(count(lit(1)).as("ng"), sum(col("c")).as("scg"))
          .localCheckpoint() // 5 rows
        val tw = o.join(broadcast(gm), "prio").crossJoin(broadcast(tot))
          .select(col("prio"), col("ng"), col("scg"), col("n"), col("sc"),
            round((col("c").cast("double") * col("ng") / col("scg")) *
              log(col("c").cast("double") * col("ng") / col("scg")), 6)
              .cast("decimal(38,6)").as("tg"),
            round((col("c").cast("double") * col("n") / col("sc")) *
              log(col("c").cast("double") * col("n") / col("sc")), 6)
              .cast("decimal(38,6)").as("tt"))
          .groupBy("prio", "ng", "scg", "n", "sc")
          .agg((sum(col("tg")).cast("double") / col("ng")).as("t_within"),
            sum(col("tt")).cast("double").as("ttp"))
        val parts = tw.select(col("prio"), col("ng"), col("scg"), col("n"),
            col("sc"), col("t_within"), col("ttp"),
            (col("scg").cast("double") / col("sc")).as("share"),
            round((col("scg").cast("double") / col("sc")) *
              log((col("scg").cast("double") / col("ng")) /
                (col("sc").cast("double") / col("n"))), 9).as("btw"))
          .localCheckpoint() // 5 rows
        val agg = parts.agg(
          (sum(col("ttp").cast("decimal(38,6)")).cast("double") /
            max(col("n"))).as("theil_total"),
          sum(round(col("share") * col("t_within"), 9)
            .cast("decimal(38,9)")).cast("double").as("theil_within"),
          sum(col("btw").cast("decimal(38,9)")).cast("double")
            .as("theil_between"))
        parts.crossJoin(broadcast(agg))
          .select(col("prio"), col("ng").as("n_orders"),
            round(col("share"), 6).as("revenue_share"),
            round(col("t_within"), 6).as("theil_within_g"),
            round(col("btw"), 6).as("between_term"),
            round(col("theil_total"), 6).as("theil_total"),
            round(col("theil_within"), 6).as("theil_within"),
            round(col("theil_between"), 6).as("theil_between"))
          .orderBy("prio")
      },
      Some("""WITH o AS (SELECT o_orderpriority AS prio,
             |        CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |      FROM orders),
             |tot AS (SELECT COUNT(*) AS n, SUM(c) AS sc FROM o),
             |gm AS (SELECT prio, COUNT(*) AS ng, SUM(c) AS scg FROM o
             |      GROUP BY 1),
             |tw AS (SELECT o.prio, gm.ng, gm.scg, tot.n, tot.sc,
             |        CAST(SUM(CAST(round(
             |          (CAST(o.c AS DOUBLE) * gm.ng / gm.scg) *
             |          ln(CAST(o.c AS DOUBLE) * gm.ng / gm.scg), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) / gm.ng AS t_within,
             |        CAST(SUM(CAST(round(
             |          (CAST(o.c AS DOUBLE) * tot.n / tot.sc) *
             |          ln(CAST(o.c AS DOUBLE) * tot.n / tot.sc), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS ttp
             |      FROM o JOIN gm ON gm.prio = o.prio CROSS JOIN tot
             |      GROUP BY 1, 2, 3, 4, 5),
             |parts AS (SELECT prio, ng, scg, n, sc, t_within, ttp,
             |        CAST(scg AS DOUBLE) / sc AS share,
             |        round((CAST(scg AS DOUBLE) / sc) *
             |          ln((CAST(scg AS DOUBLE) / ng) /
             |            (CAST(sc AS DOUBLE) / n)), 9) AS btw
             |      FROM tw),
             |agg AS (SELECT
             |        CAST(SUM(CAST(ttp AS DECIMAL(38,6))) AS DOUBLE)
             |          / MAX(n) AS theil_total,
             |        CAST(SUM(CAST(round(share * t_within, 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS theil_within,
             |        CAST(SUM(CAST(btw AS DECIMAL(38,9))) AS DOUBLE)
             |          AS theil_between
             |      FROM parts)
             |SELECT prio, CAST(ng AS BIGINT) AS n_orders,
             |  round(share, 6) AS revenue_share,
             |  round(t_within, 6) AS theil_within_g,
             |  round(btw, 6) AS between_term,
             |  round(agg.theil_total, 6) AS theil_total,
             |  round(agg.theil_within, 6) AS theil_within,
             |  round(agg.theil_between, 6) AS theil_between
             |FROM parts CROSS JOIN agg ORDER BY prio""".stripMargin)),

    // Truncated harmonic centrality (Marchiori & Latora, Physica A
    // 2000; Boldi & Vigna, Internet Math 2014 argue it over closeness
    // for disconnected graphs): H(v) = Σ_u 1/d(v,u) over d ≤ 3 on the
    // x114/x139 item co-occurrence graph — the DISTANCE-family
    // centrality the suite lacks (PageRank x101 and HITS x180 price
    // link mass, k-core x140 prices embeddedness, x139 walks ONE
    // seed's reach; harmonic ranks EVERY node by how near everything
    // else is, the access/logistics read). All-pairs-within-3-hops on
    // the item-vocab-bounded graph: dist-2 = wedge join minus dist-1,
    // dist-3 = (dist-2 ∘ adjacency) minus closer — bounded item-key
    // equi-joins (the x206 wedge discipline), never a corpus shuffle;
    // H is an exact rational reported ×6 as BIGINT alongside the
    // rounded double. Top-20, deterministic (h, item) tie-break.
    QuerySpec(
      "x263_harmonic_centrality",
      (s, dir) => {
        val und = itemPairs(s, dir, 3)
          .select(col("ia").as("ea"), col("ib").as("eb"))
        val adj = und.select(col("ea").as("u"), col("eb").as("v"))
          .unionByName(und.select(col("eb").as("u"), col("ea").as("v")))
          .localCheckpoint() // feeds d2, d3 and all three counts
        val d2 = adj.as("e1").join(adj.as("e2"),
            col("e1.v") === col("e2.u") && col("e1.u") =!= col("e2.v"))
          .select(col("e1.u").as("u"), col("e2.v").as("v")).distinct()
          .join(adj, Seq("u", "v"), "left_anti")
          .localCheckpoint()
        val d3 = d2.as("p").join(adj.as("e"), col("p.v") === col("e.u")
            && col("p.u") =!= col("e.v"))
          .select(col("p.u").as("u"), col("e.v").as("v")).distinct()
          .join(adj, Seq("u", "v"), "left_anti")
          .join(d2, Seq("u", "v"), "left_anti")
        val n1 = adj.groupBy("u").agg(count(lit(1)).as("c1"))
        val n2 = d2.groupBy("u").agg(count(lit(1)).as("c2"))
        val n3 = d3.groupBy("u").agg(count(lit(1)).as("c3"))
        n1.join(n2, Seq("u"), "left").join(n3, Seq("u"), "left")
          .na.fill(0L, Seq("c2", "c3"))
          .select(col("u").as("item"), col("c1"), col("c2"), col("c3"),
            (col("c1") * 6 + col("c2") * 3 + col("c3") * 2).as("h6"),
            round(col("c1") + col("c2").cast("double") / 2 +
              col("c3").cast("double") / 3, 6).as("harmonic"))
          .orderBy(col("h6").desc, col("item")).limit(20)
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE)
             |          AS day,
             |        CAST(json_extract_string(props, '$.k') AS INT)
             |          AS item
             |      FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib
             |      FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |        AND a.day = b.day AND a.item < b.item
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |adj AS (SELECT ia AS u, ib AS v FROM pc
             |      UNION ALL SELECT ib, ia FROM pc),
             |d2 AS (SELECT DISTINCT e1.u, e2.v
             |      FROM adj e1 JOIN adj e2 ON e2.u = e1.v
             |        AND e1.u <> e2.v
             |      WHERE NOT EXISTS (SELECT 1 FROM adj
             |        WHERE adj.u = e1.u AND adj.v = e2.v)),
             |d3 AS (SELECT DISTINCT p.u, e.v
             |      FROM d2 p JOIN adj e ON e.u = p.v AND p.u <> e.v
             |      WHERE NOT EXISTS (SELECT 1 FROM adj
             |          WHERE adj.u = p.u AND adj.v = e.v)
             |        AND NOT EXISTS (SELECT 1 FROM d2
             |          WHERE d2.u = p.u AND d2.v = e.v)),
             |n1 AS (SELECT u, COUNT(*) AS c1 FROM adj GROUP BY 1),
             |n2 AS (SELECT u, COUNT(*) AS c2 FROM d2 GROUP BY 1),
             |n3 AS (SELECT u, COUNT(*) AS c3 FROM d3 GROUP BY 1)
             |SELECT CAST(n1.u AS INT) AS item,
             |  CAST(n1.c1 AS BIGINT) AS c1,
             |  CAST(COALESCE(n2.c2, 0) AS BIGINT) AS c2,
             |  CAST(COALESCE(n3.c3, 0) AS BIGINT) AS c3,
             |  CAST(n1.c1 * 6 + COALESCE(n2.c2, 0) * 3 +
             |    COALESCE(n3.c3, 0) * 2 AS BIGINT) AS h6,
             |  round(n1.c1 + CAST(COALESCE(n2.c2, 0) AS DOUBLE) / 2 +
             |    CAST(COALESCE(n3.c3, 0) AS DOUBLE) / 3, 6) AS harmonic
             |FROM n1 LEFT JOIN n2 ON n2.u = n1.u
             |LEFT JOIN n3 ON n3.u = n1.u
             |ORDER BY h6 DESC, item LIMIT 20""".stripMargin)),

    // Markov entropy rate (Shannon 1948 §7; Cover & Thomas ch. 4 for
    // H(X_{t+1}|X_t) as the first-order rate; Song, Qu, Blumm & Barabási,
    // Science 2010 use exactly this as behavioral "predictability"): the
    // plug-in conditional entropy of the next event type given the
    // current one, over the x79 per-user transition sequences — the
    // single-number read OF x79's matrix (x79 reports p_ij; this prices
    // how much those conditionals actually buy over the marginal:
    // predictability_gain = 1 − H_rate/H_marginal). π̂ is the empirical
    // source-state distribution (the MLE under stationarity — no power
    // iteration needed, unlike x239's absorbing-chain read). Per-state
    // rows carry π̂ and the row entropy; transition counts are exact
    // BIGINTs, each ln lands on an exact-rational argument rounded 6
    // into DECIMAL sums (the x262 discipline).
    QuerySpec(
      "x264_entropy_rate",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy("user_id").orderBy("ts", "event_id")
        val tr = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
          .localCheckpoint() // <=25 rows
        val rh = tr.withColumn("na",
            sum(col("n")).over(W.partitionBy("event_type")))
          .select(col("event_type"), col("na"),
            round((col("n").cast("double") / col("na")) *
              log(col("n").cast("double") / col("na")), 6)
              .cast("decimal(38,6)").as("t"))
          .groupBy("event_type", "na")
          .agg((-sum(col("t")).cast("double")).as("h_state"))
        val tot = rh.agg(sum(col("na")).as("nt"))
        val st = rh.crossJoin(broadcast(tot))
          .select(col("event_type"), col("na"), col("nt"),
            round(col("na").cast("double") / col("nt"), 9).as("pi"),
            round(col("h_state"), 6).as("h_state"))
          .localCheckpoint() // 5 rows
        val hr = st.agg(
          sum(round(col("pi") * col("h_state"), 9).cast("decimal(38,9)"))
            .cast("double").as("h_rate"),
          (-sum(round((col("na").cast("double") / col("nt")) *
            log(col("na").cast("double") / col("nt")), 9)
            .cast("decimal(38,9)")).cast("double")).as("h_marg"))
        st.crossJoin(broadcast(hr))
          .select(col("event_type"), col("na").as("n_from"),
            round(col("pi"), 6).as("pi"), col("h_state"),
            round(col("h_rate"), 6).as("h_rate_nats"),
            round(col("h_marg"), 6).as("h_marginal_nats"),
            round(lit(1.0) - col("h_rate") / col("h_marg"), 6)
              .as("predictability_gain"))
          .orderBy("event_type")
      },
      Some("""WITH sq AS (SELECT user_id, event_type,
             |        lead(event_type) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS next_type
             |      FROM events),
             |tr AS (SELECT event_type, next_type, COUNT(*) AS n FROM sq
             |      WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |na AS (SELECT event_type, SUM(n) AS na FROM tr GROUP BY 1),
             |rh AS (SELECT tr.event_type, na.na,
             |        -CAST(SUM(CAST(round(
             |          (CAST(tr.n AS DOUBLE) / na.na) *
             |          ln(CAST(tr.n AS DOUBLE) / na.na), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS h_state
             |      FROM tr JOIN na ON na.event_type = tr.event_type
             |      GROUP BY 1, 2),
             |tot AS (SELECT SUM(na) AS nt FROM rh),
             |st AS (SELECT event_type, na, tot.nt,
             |        round(CAST(na AS DOUBLE) / tot.nt, 9) AS pi,
             |        round(h_state, 6) AS h_state
             |      FROM rh CROSS JOIN tot),
             |hr AS (SELECT
             |        CAST(SUM(CAST(round(pi * h_state, 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS h_rate,
             |        -CAST(SUM(CAST(round(
             |          (CAST(na AS DOUBLE) / nt) *
             |          ln(CAST(na AS DOUBLE) / nt), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS h_marg
             |      FROM st)
             |SELECT event_type, CAST(na AS BIGINT) AS n_from,
             |  round(pi, 6) AS pi, h_state,
             |  round(hr.h_rate, 6) AS h_rate_nats,
             |  round(hr.h_marg, 6) AS h_marginal_nats,
             |  round(1.0 - hr.h_rate / hr.h_marg, 6)
             |    AS predictability_gain
             |FROM st CROSS JOIN hr ORDER BY event_type""".stripMargin)),

    // Group-sequential A/B monitoring (Pocock 1977 frames it; O'Brien &
    // Fleming, Biometrics 1979 for the conservative-early boundary; the
    // five-look two-sided 5% boundary constants 4.877/3.357/2.680/
    // 2.290/2.031 are the published Jennison & Turnbull table 2.3): the
    // INTERIM-analysis companion to x197's fully-sequential SPRT — five
    // equal-calendar looks at the arm difference in purchase value,
    // each looked at with its OBF critical value so the family-wise
    // error stays 5% despite five peeks (the naive 1.96-per-look peek
    // x133 would take inflates alpha to ~14%). Per-day per-arm moment
    // partials → look assignment from the span quintiles → cumulative
    // windows over the 5-row look grid; Welch z from exact cents sums.
    QuerySpec(
      "x265_group_sequential",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val p = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).as("arm"), to_date(col("ts"))
            .as("day"), expr("CAST(round(value * 100) AS BIGINT)")
            .as("c"))
        val span = p.agg(min(col("day")).as("a"), max(col("day")).as("b"))
        val looks = p.crossJoin(broadcast(span))
          .select(col("arm"), col("c"),
            least(lit(4L), floor(datediff(col("day"), col("a"))
              .cast("double") / (datediff(col("b"), col("a")) + 1) * 5))
              .as("look"))
          .groupBy("look", "arm")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            sum((col("c") * col("c")).cast("decimal(38,0)")).as("qc"))
        val wc = W.partitionBy("arm").orderBy("look")
          .rowsBetween(W.unboundedPreceding, 0)
        val cum = looks
          .withColumn("cn", sum(col("n")).over(wc))
          .withColumn("cs", sum(col("sc")).over(wc))
          .withColumn("cq", sum(col("qc")).over(wc))
          .select(col("look"), col("arm"), col("cn"), col("cs"),
            col("cq"))
        val a = cum.filter(col("arm") === 0)
          .select(col("look"), col("cn").as("n0"), col("cs").as("s0"),
            col("cq").as("q0"))
        val b = cum.filter(col("arm") === 1)
          .select(col("look"), col("cn").as("n1"), col("cs").as("s1"),
            col("cq").as("q1"))
        val z = a.join(b, "look")
          .select(col("look"), col("n0"), col("n1"),
            ((col("s1").cast("double") / col("n1") -
              col("s0").cast("double") / col("n0")) / sqrt(
              (col("q1").cast("double") -
                col("s1").cast("double") * col("s1") / col("n1")) /
                (col("n1") - 1L) / col("n1") +
              (col("q0").cast("double") -
                col("s0").cast("double") * col("s0") / col("n0")) /
                (col("n0") - 1L) / col("n0"))).as("z0"))
        val bound = when(col("look") === 0, 4.877)
          .when(col("look") === 1, 3.357)
          .when(col("look") === 2, 2.680)
          .when(col("look") === 3, 2.290).otherwise(2.031)
        z.select((col("look") + 1).as("look"), col("n0"), col("n1"),
            round(col("z0"), 6).as("z"), bound.as("obf_boundary"),
            (abs(col("z0")) > bound).cast("long").as("reject"))
          .orderBy("look")
      },
      Some("""WITH p AS (SELECT user_id % 2 AS arm, CAST(ts AS DATE)
             |          AS day,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events WHERE event_type = 'purchase'),
             |span AS (SELECT MIN(day) AS a, MAX(day) AS b FROM p),
             |lk AS (SELECT arm, c,
             |        least(4, CAST(floor(CAST(date_diff('day', span.a,
             |          day) AS DOUBLE) /
             |          (date_diff('day', span.a, span.b) + 1) * 5)
             |          AS BIGINT)) AS look
             |      FROM p CROSS JOIN span),
             |looks AS (SELECT look, arm, COUNT(*) AS n, SUM(c) AS sc,
             |        SUM(CAST(c * c AS DECIMAL(38,0))) AS qc
             |      FROM lk GROUP BY 1, 2),
             |cum AS (SELECT look, arm,
             |        SUM(n) OVER w AS cn, SUM(sc) OVER w AS cs,
             |        SUM(qc) OVER w AS cq
             |      FROM looks
             |      WINDOW w AS (PARTITION BY arm ORDER BY look
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |z AS (SELECT a.look, a.cn AS n0, b.cn AS n1,
             |        (CAST(b.cs AS DOUBLE) / b.cn -
             |          CAST(a.cs AS DOUBLE) / a.cn) / sqrt(
             |          (CAST(b.cq AS DOUBLE) -
             |            CAST(b.cs AS DOUBLE) * b.cs / b.cn) /
             |            (b.cn - 1) / b.cn +
             |          (CAST(a.cq AS DOUBLE) -
             |            CAST(a.cs AS DOUBLE) * a.cs / a.cn) /
             |            (a.cn - 1) / a.cn) AS z0
             |      FROM (SELECT * FROM cum WHERE arm = 0) a
             |      JOIN (SELECT * FROM cum WHERE arm = 1) b
             |        USING (look))
             |SELECT CAST(look + 1 AS BIGINT) AS look,
             |  CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             |  round(z0, 6) AS z,
             |  CASE look WHEN 0 THEN 4.877 WHEN 1 THEN 3.357
             |    WHEN 2 THEN 2.680 WHEN 3 THEN 2.290 ELSE 2.031 END
             |    AS obf_boundary,
             |  CAST(abs(z0) > CASE look WHEN 0 THEN 4.877
             |    WHEN 1 THEN 3.357 WHEN 2 THEN 2.680 WHEN 3 THEN 2.290
             |    ELSE 2.031 END AS BIGINT) AS reject
             |FROM z ORDER BY look""".stripMargin)),

    // Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010): top-
    // weighted agreement between the two natural item-popularity
    // rankings — by revenue vs by distinct-user reach — the
    // INDEFINITE-ranking comparison x240's Kendall τ can't give (τ
    // needs both rankings over the same complete set and weights every
    // position equally; RBO weights the head geometrically, tolerates
    // non-overlap, and is THE metric for comparing two top-k lists).
    // Both rankings come from one events pass; overlap@d for the
    // d-grid is a zero-filled histogram of max(rank_a, rank_b) over
    // the joined top-20s; p = 0.9 powers go through round(pow,10) (the
    // EwmaChart discipline) so both engines weight identically.
    // Reported per depth with the truncated-RBO partial sum and the
    // p^d residual (the RBO_min/RBO_max gap).
    QuerySpec(
      "x266_rbo",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val it = Tables.events(s, dir)
          .select(col("user_id"),
            expr("CAST(get_json_object(props, '$.k') AS INT)")
              .as("item"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .filter(col("item").isNotNull)
          .groupBy("item")
          .agg(sum(col("c")).as("rev"),
            countDistinct(col("user_id")).as("reach"))
          .localCheckpoint() // item-vocab-bounded; feeds both rankings
        val ra = it.select(col("item"), row_number()
          .over(W.orderBy(col("rev").desc, col("item"))).as("ra"))
          .filter(col("ra") <= 20)
        val rb = it.select(col("item"), row_number()
          .over(W.orderBy(col("reach").desc, col("item"))).as("rb"))
          .filter(col("rb") <= 20)
        val m = ra.join(rb, "item")
          .select(greatest(col("ra"), col("rb")).as("m"))
          .groupBy("m").agg(count(lit(1)).as("k"))
        val grid = broadcast(s.range(1, 21).toDF("d"))
          .join(m, col("m") <= col("d"), "left")
          .groupBy("d").agg(coalesce(sum(col("k")), lit(0L)).as("x"))
        val wc = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
        grid
          .withColumn("term",
            round(col("x").cast("double") / col("d") *
              round(pow(lit(0.9), col("d") - 1), 10) * 0.1, 9))
          .withColumn("rbo", sum(round(col("term"), 9)
            .cast("decimal(38,9)")).over(wc).cast("double"))
          .select(col("d"), col("x").as("overlap"),
            round(col("x").cast("double") / col("d"), 6)
              .as("agreement"),
            round(col("rbo"), 6).as("rbo_trunc"),
            round(round(pow(lit(0.9), col("d")), 10), 6)
              .as("residual_mass"))
          .orderBy("d")
      },
      Some("""WITH it AS (SELECT
             |        CAST(json_extract_string(props, '$.k') AS INT)
             |          AS item,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS rev,
             |        COUNT(DISTINCT user_id) AS reach
             |      FROM events
             |      WHERE json_extract_string(props, '$.k') IS NOT NULL
             |      GROUP BY 1),
             |ra AS (SELECT item, row_number() OVER (ORDER BY rev DESC,
             |        item) AS ra FROM it QUALIFY ra <= 20),
             |rb AS (SELECT item, row_number() OVER (ORDER BY reach DESC,
             |        item) AS rb FROM it QUALIFY rb <= 20),
             |m AS (SELECT greatest(ra.ra, rb.rb) AS m, COUNT(*) AS k
             |      FROM ra JOIN rb USING (item) GROUP BY 1),
             |grid AS (SELECT g.d,
             |        COALESCE(SUM(m.k), 0) AS x
             |      FROM (SELECT unnest(range(1, 21)) AS d) g
             |      LEFT JOIN m ON m.m <= g.d GROUP BY 1),
             |t AS (SELECT d, x,
             |        round(CAST(x AS DOUBLE) / d *
             |          round(power(0.9, d - 1), 10) * 0.1, 9) AS term
             |      FROM grid)
             |SELECT CAST(d AS BIGINT) AS d, CAST(x AS BIGINT) AS overlap,
             |  round(CAST(x AS DOUBLE) / d, 6) AS agreement,
             |  round(CAST(SUM(CAST(round(term, 9) AS DECIMAL(38,9)))
             |    OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND
             |      CURRENT ROW) AS DOUBLE), 6) AS rbo_trunc,
             |  round(round(power(0.9, d), 10), 6) AS residual_mass
             |FROM t ORDER BY d""".stripMargin)),

    // Confusion-matrix panel with Matthews correlation (Matthews 1975;
    // Chicco & Jurman, BMC Genomics 2020 argue MCC over F1/accuracy on
    // imbalance): the SINGLE-THRESHOLD operating point the suite's
    // threshold-free reads skip over (x168 ROC sweeps thresholds, x165
    // calibrates, x207 decomposes Brier) — predict the x182 high-value
    // treatment from above-median activity and report the full panel:
    // accuracy, precision, recall, F1, balanced accuracy, MCC. One
    // user-grid pass, ONE bounded percentile aggregate, the four cells
    // exact BIGINTs; MCC's four-factor denominator multiplies in
    // DOUBLE from exact longs (cells⁴ would clear 2⁶³ at corpus scale).
    QuerySpec(
      "x267_mcc_panel",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
        val md = u.agg(round(expr("percentile(act, 0.5)"), 6).as("m"))
        val cells = u.crossJoin(broadcast(md))
          .select(col("y"), (col("act") > col("m")).cast("long").as("p"))
          .agg(sum(col("p") * col("y")).as("tp"),
            sum(col("p") * (lit(1L) - col("y"))).as("fp"),
            sum((lit(1L) - col("p")) * col("y")).as("fn"),
            sum((lit(1L) - col("p")) * (lit(1L) - col("y"))).as("tn"))
        cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
            round((col("tp") + col("tn")).cast("double") /
              (col("tp") + col("fp") + col("fn") + col("tn")), 6)
              .as("accuracy"),
            round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
              .as("precision"),
            round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
              .as("recall"),
            round(lit(2.0) * col("tp") /
              (lit(2.0) * col("tp") + col("fp") + col("fn")), 6)
              .as("f1"),
            round((col("tp").cast("double") / (col("tp") + col("fn")) +
              col("tn").cast("double") / (col("tn") + col("fp"))) / 2, 6)
              .as("balanced_accuracy"),
            round((col("tp").cast("double") * col("tn") -
              col("fp").cast("double") * col("fn")) /
              sqrt((col("tp") + col("fp")).cast("double") *
                (col("tp") + col("fn")) * (col("tn") + col("fp")) *
                (col("tn") + col("fn"))), 6).as("mcc"))
          .orderBy("tp")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |md AS (SELECT round(quantile_cont(act, 0.5), 6) AS m FROM u),
             |cells AS (SELECT
             |        SUM(CASE WHEN act > m AND y = 1 THEN 1 ELSE 0 END)
             |          AS tp,
             |        SUM(CASE WHEN act > m AND y = 0 THEN 1 ELSE 0 END)
             |          AS fp,
             |        SUM(CASE WHEN act <= m AND y = 1 THEN 1 ELSE 0 END)
             |          AS fn,
             |        SUM(CASE WHEN act <= m AND y = 0 THEN 1 ELSE 0 END)
             |          AS tn
             |      FROM u CROSS JOIN md)
             |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
             |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)
             |    AS accuracy,
             |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
             |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
             |  round(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
             |  round((CAST(tp AS DOUBLE) / (tp + fn) +
             |    CAST(tn AS DOUBLE) / (tn + fp)) / 2, 6)
             |    AS balanced_accuracy,
             |  round((CAST(tp AS DOUBLE) * tn -
             |    CAST(fp AS DOUBLE) * fn) /
             |    sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) *
             |      (tn + fn)), 6) AS mcc
             |FROM cells ORDER BY tp""".stripMargin)),

    // Language-ID evaluation against the corpus's OWN lang labels —
    // the documents table carries ground truth, so the x8 marker-vote
    // classifier gets the full multi-class report card: per-class
    // precision/recall/F1 over the (true ∪ predicted) class set plus
    // overall accuracy and Cohen's κ (Cohen 1960 — the chance-corrected
    // read; x111's κ is BETWEEN LABELERS, this is classifier-vs-truth).
    // The structurally honest part: 'zh' exists in truth but not in the
    // marker model's vocabulary, so its recall is 0 by construction and
    // the 'und' row shows where that mass lands — exactly what a
    // curation pipeline needs to see before trusting x8's routing.
    // One corpus pass → ≤6×6 confusion grid; everything after is exact
    // integer algebra on that grid.
    QuerySpec(
      "x268_langid_eval",
      (s, dir) => {
        val cm = Tables.documents(s, dir)
          .select(col("lang").as("t"),
            graft.functions.TextFunctions.langId(col("text")).as("p"))
          .groupBy("t", "p").agg(count(lit(1)).as("n"))
          .localCheckpoint() // <=36 cells
        val classes = cm.select(col("t").as("cls"))
          .unionByName(cm.select(col("p").as("cls"))).distinct()
        val tN = cm.groupBy(col("t").as("cls"))
          .agg(sum(col("n")).as("n_true"))
        val pN = cm.groupBy(col("p").as("cls"))
          .agg(sum(col("n")).as("n_pred"))
        val tp = cm.filter(col("t") === col("p"))
          .select(col("t").as("cls"), col("n").as("tp"))
        val tot = cm.agg(sum(col("n")).as("nn"),
          sum(when(col("t") === col("p"), col("n")).otherwise(0L))
            .as("cor"))
        val pe = tN.join(pN, Seq("cls"), "full")
          .na.fill(0L, Seq("n_true", "n_pred"))
          .agg(sum(col("n_true") * col("n_pred")).as("sprod"))
        val per = classes
          .join(tN, Seq("cls"), "left").join(pN, Seq("cls"), "left")
          .join(tp, Seq("cls"), "left")
          .na.fill(0L, Seq("n_true", "n_pred", "tp"))
        per.crossJoin(broadcast(tot)).crossJoin(broadcast(pe))
          .select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
            when(col("n_pred") > 0,
              round(col("tp").cast("double") / col("n_pred"), 6))
              .otherwise(lit(0.0)).as("precision"),
            when(col("n_true") > 0,
              round(col("tp").cast("double") / col("n_true"), 6))
              .otherwise(lit(0.0)).as("recall"),
            when(col("n_pred") + col("n_true") > 0,
              round(lit(2.0) * col("tp") /
                (col("n_pred") + col("n_true")), 6))
              .otherwise(lit(0.0)).as("f1"),
            round(col("cor").cast("double") / col("nn"), 6)
              .as("accuracy"),
            round((col("cor").cast("double") / col("nn") -
              col("sprod").cast("double") / col("nn") / col("nn")) /
              (lit(1.0) - col("sprod").cast("double") / col("nn") /
                col("nn")), 6).as("kappa"))
          .orderBy("cls")
      },
      Some("""WITH t0 AS (SELECT lang AS t,
             |        list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '') AS toks
             |      FROM documents),
             |v AS (SELECT t,
             |        CAST(len(list_filter(toks, x -> x IN ('the','a',
             |          'and','of','to','is'))) AS BIGINT) AS v_en,
             |        CAST(len(list_filter(toks, x -> x IN ('der','die',
             |          'das','und','ist','ein'))) AS BIGINT) AS v_de,
             |        CAST(len(list_filter(toks, x -> x IN ('el','la',
             |          'los','las','es','una'))) AS BIGINT) AS v_es,
             |        CAST(len(list_filter(toks, x -> x IN ('le','la',
             |          'les','et','est','une'))) AS BIGINT) AS v_fr
             |      FROM t0),
             |pr AS (SELECT t,
             |        CASE WHEN v_en > 0 AND v_en >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'en'
             |          WHEN v_de > 0 AND v_de >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'de'
             |          WHEN v_es > 0 AND v_es >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'es'
             |          WHEN v_fr > 0 AND v_fr >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'fr'
             |          ELSE 'und' END AS p
             |      FROM v),
             |cm AS (SELECT t, p, COUNT(*) AS n FROM pr GROUP BY 1, 2),
             |classes AS (SELECT DISTINCT t AS cls FROM cm
             |      UNION SELECT DISTINCT p FROM cm),
             |tn AS (SELECT t AS cls, SUM(n) AS n_true FROM cm GROUP BY 1),
             |pn AS (SELECT p AS cls, SUM(n) AS n_pred FROM cm GROUP BY 1),
             |tpx AS (SELECT t AS cls, n AS tp FROM cm WHERE t = p),
             |tot AS (SELECT SUM(n) AS nn,
             |        SUM(CASE WHEN t = p THEN n ELSE 0 END) AS cor
             |      FROM cm),
             |pe AS (SELECT SUM(COALESCE(tn.n_true, 0) *
             |          COALESCE(pn.n_pred, 0)) AS sprod
             |      FROM tn FULL JOIN pn USING (cls)),
             |per AS (SELECT classes.cls,
             |        COALESCE(tn.n_true, 0) AS n_true,
             |        COALESCE(pn.n_pred, 0) AS n_pred,
             |        COALESCE(tpx.tp, 0) AS tp
             |      FROM classes LEFT JOIN tn USING (cls)
             |      LEFT JOIN pn USING (cls) LEFT JOIN tpx USING (cls))
             |SELECT cls, CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
             |  CASE WHEN n_pred > 0
             |    THEN round(CAST(tp AS DOUBLE) / n_pred, 6)
             |    ELSE 0.0 END AS precision,
             |  CASE WHEN n_true > 0
             |    THEN round(CAST(tp AS DOUBLE) / n_true, 6)
             |    ELSE 0.0 END AS recall,
             |  CASE WHEN n_pred + n_true > 0
             |    THEN round(2.0 * tp / (n_pred + n_true), 6)
             |    ELSE 0.0 END AS f1,
             |  round(CAST(tot.cor AS DOUBLE) / tot.nn, 6) AS accuracy,
             |  round((CAST(tot.cor AS DOUBLE) / tot.nn -
             |    CAST(pe.sprod AS DOUBLE) / tot.nn / tot.nn) /
             |    (1.0 - CAST(pe.sprod AS DOUBLE) / tot.nn / tot.nn), 6)
             |    AS kappa
             |FROM per CROSS JOIN tot CROSS JOIN pe
             |ORDER BY cls""".stripMargin)),

    // Permutation test on the arm spend difference (Fisher 1935
    // randomization inference; Ernst, Statistical Science 2004 for the
    // modern treatment): the EXACT-under-exchangeability companion to
    // x133's Welch t and x253's effect sizes — no normality, no
    // variance model, just the null's own reassignment distribution.
    // 64 deterministic permutations come from ONE md5 per user split
    // into 64 hash-lane BITS (hex-char arithmetic + shiftright — no
    // digest under the fan-out, the x216 lane discipline rule 4
    // enforces); per-permutation arm sums map-side-combine into a
    // 64-row grid, so the whole test is one corpus pass + bounded
    // algebra. p uses the add-one convention (Phipson & Smyth 2010):
    // p = (1 + #{|diff_b| ≥ |diff_obs|}) / (B + 1).
    QuerySpec(
      "x269_permutation_test",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("y"))
          .select(col("user_id"), col("y"),
            (col("user_id") % 2).as("t"),
            md5(concat(lit("perm:"), col("user_id").cast("string")))
              .as("dg"))
          .localCheckpoint() // one digest per user, reused by all lanes
        val obs = u.agg(count(lit(1)).as("n_users"),
          (sum(when(col("t") === 1, col("y")).otherwise(0L))
            .cast("double") /
            sum(when(col("t") === 1, 1L).otherwise(0L)) -
            sum(when(col("t") === 0, col("y")).otherwise(0L))
              .cast("double") /
              sum(when(col("t") === 0, 1L).otherwise(0L))).as("obs"))
        val perm = u
          .select(col("y"), col("dg"),
            explode(expr("sequence(0, 63)")).as("b"))
          .withColumn("hv", expr(
            "CASE WHEN ascii(substring(dg, CAST(b / 4 AS INT) + 1, 1))" +
              " < 58 THEN ascii(substring(dg, CAST(b / 4 AS INT) + 1," +
              " 1)) - 48 ELSE ascii(substring(dg, CAST(b / 4 AS INT)" +
              " + 1, 1)) - 87 END"))
          .withColumn("arm",
            expr("shiftright(hv, CAST(b % 4 AS INT)) & 1"))
          .groupBy("b").agg(
            sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("s1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("s0"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"))
          .filter(col("n1") > 0 && col("n0") > 0)
          .select((col("s1").cast("double") / col("n1") -
            col("s0").cast("double") / col("n0")).as("d"))
        val pd = perm.crossJoin(broadcast(obs))
          .agg(max(col("n_users")).as("n_users"),
            max(col("obs")).as("obs"),
            count(lit(1)).as("n_perms"),
            sum((abs(col("d")) >= abs(col("obs"))).cast("long"))
              .as("n_extreme"),
            sum(round(col("d") * col("d"), 6).cast("decimal(38,6)"))
              .cast("double").as("sdd"),
            sum(round(col("d"), 6).cast("decimal(38,6)")).cast("double")
              .as("sd1"))
        pd.select(col("n_users"),
            round(col("obs") / 100, 6).as("obs_diff_dollars"),
            col("n_perms"), col("n_extreme"),
            round((col("n_extreme") + 1).cast("double") /
              (col("n_perms") + 1), 6).as("p_value"),
            round(sqrt((col("sdd") - col("sd1") * col("sd1") /
              col("n_perms")) / (col("n_perms") - 1L)) / 100, 6)
              .as("perm_sd_dollars"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS y,
             |        user_id % 2 AS t,
             |        md5('perm:' || CAST(user_id AS VARCHAR)) AS dg
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY user_id),
             |obs AS (SELECT COUNT(*) AS n_users,
             |        CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END)
             |          AS DOUBLE) /
             |          SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) -
             |        CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END)
             |          AS DOUBLE) /
             |          SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS obs
             |      FROM u),
             |lane AS (SELECT y, dg, g.b,
             |        CASE WHEN ascii(substr(dg, CAST(g.b // 4 AS INT)
             |            + 1, 1)) < 58
             |          THEN ascii(substr(dg, CAST(g.b // 4 AS INT) + 1,
             |            1)) - 48
             |          ELSE ascii(substr(dg, CAST(g.b // 4 AS INT) + 1,
             |            1)) - 87 END AS hv
             |      FROM u CROSS JOIN (SELECT unnest(range(64)) AS b) g),
             |perm AS (SELECT
             |        CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0
             |          AS d
             |      FROM (SELECT b,
             |          SUM(CASE WHEN (hv >> CAST(b % 4 AS INT)) & 1 = 1
             |            THEN y ELSE 0 END) AS s1,
             |          SUM(CASE WHEN (hv >> CAST(b % 4 AS INT)) & 1 = 1
             |            THEN 1 ELSE 0 END) AS n1,
             |          SUM(CASE WHEN (hv >> CAST(b % 4 AS INT)) & 1 = 0
             |            THEN y ELSE 0 END) AS s0,
             |          SUM(CASE WHEN (hv >> CAST(b % 4 AS INT)) & 1 = 0
             |            THEN 1 ELSE 0 END) AS n0
             |        FROM lane GROUP BY 1)
             |      WHERE n1 > 0 AND n0 > 0),
             |pd AS (SELECT MAX(obs.n_users) AS n_users,
             |        MAX(obs.obs) AS obs, COUNT(*) AS n_perms,
             |        SUM(CASE WHEN abs(d) >= abs(obs.obs) THEN 1 ELSE 0
             |          END) AS n_extreme,
             |        CAST(SUM(CAST(round(d * d, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sdd,
             |        CAST(SUM(CAST(round(d, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sd1
             |      FROM perm CROSS JOIN obs)
             |SELECT CAST(n_users AS BIGINT) AS n_users,
             |  round(obs / 100, 6) AS obs_diff_dollars,
             |  CAST(n_perms AS BIGINT) AS n_perms,
             |  CAST(n_extreme AS BIGINT) AS n_extreme,
             |  round(CAST(n_extreme + 1 AS DOUBLE) / (n_perms + 1), 6)
             |    AS p_value,
             |  round(sqrt((sdd - sd1 * sd1 / n_perms) / (n_perms - 1))
             |    / 100, 6) AS perm_sd_dollars
             |FROM pd ORDER BY n_users""".stripMargin)),

    // B-cubed clustering evaluation (Bagga & Baldwin 1998; Amigó et
    // al., Inf. Retrieval 2009 show B³ is the only common family
    // passing all four clustering-eval constraints): score the ACTUAL
    // dedup clustering (minhash pairs → connected components, the
    // x2→x34 pipeline) against a planted truth — x192 measures planted
    // PAIR recall, this scores the CLUSTERS themselves, catching the
    // over-merge failure pair recall can't see (gluing two families
    // into one cluster keeps recall perfect and craters B³ precision).
    // Truth: each doc_id%10==0 doc gets TWO tail-perturbed twins
    // (ids +off, +2·off), so truth cluster = id mod off — exact by
    // construction. B³P = Σn²_{pc,tc}/|pc|/N, B³R = Σn²/|tc|/N on the
    // bounded (pred, true) contingency grid; the oracle replays the
    // components with a recursive min-label CTE (the x34 device).
    QuerySpec(
      "x270_bcubed_eval",
      (s, dir) => {
        val base = Tables.documents(s, dir).select("doc_id", "text")
        val off = base.agg((max(col("doc_id")) + 1L).as("off"))
        val twins = base.filter(col("doc_id") % 10 === 0)
          .crossJoin(broadcast(off))
          .select(explode(array(
            struct((col("doc_id") + col("off")).as("doc_id"),
              concat(col("text"), lit(" zz9 zz8 zz7")).as("text")),
            struct((col("doc_id") + col("off") * 2).as("doc_id"),
              concat(col("text"), lit(" qq9 qq8 qq7")).as("text"))))
            .as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
        val corpus = base.unionByName(twins).localCheckpoint()
        val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
          k = 64, bands = 16, threshold = 0.8)
        val cl = Dedup.dupClustersStar(pairs)
          .select(col("doc_id"), col("cluster_id"))
        val asg = corpus.join(broadcast(off))
          .join(cl, Seq("doc_id"), "left")
          .select(coalesce(col("cluster_id"), col("doc_id")).as("pc"),
            (col("doc_id") % col("off")).as("tc"))
          .localCheckpoint()
        val grid = asg.groupBy("pc", "tc").agg(count(lit(1)).as("n"))
        val pcs = asg.groupBy("pc").agg(count(lit(1)).as("np"))
        val tcs = asg.groupBy("tc").agg(count(lit(1)).as("nt"))
        val tot = asg.agg(count(lit(1)).as("nn"))
        val sums = grid.join(pcs, "pc").join(tcs, "tc")
          .agg(
            sum(round(col("n").cast("double") * col("n") / col("np"), 9)
              .cast("decimal(38,9)")).cast("double").as("sp"),
            sum(round(col("n").cast("double") * col("n") / col("nt"), 9)
              .cast("decimal(38,9)")).cast("double").as("sr"))
        sums.crossJoin(broadcast(tot))
          .crossJoin(broadcast(pcs.agg(count(lit(1)).as("n_pred"))))
          .crossJoin(broadcast(tcs.agg(count(lit(1)).as("n_true"))))
          .select(col("nn").as("n_docs"), col("n_pred"), col("n_true"),
            round(col("sp") / col("nn"), 6).as("bcubed_precision"),
            round(col("sr") / col("nn"), 6).as("bcubed_recall"),
            round(lit(2.0) * (col("sp") / col("nn")) *
              (col("sr") / col("nn")) /
              (col("sp") / col("nn") + col("sr") / col("nn")), 6)
              .as("bcubed_f1"))
          .orderBy("n_docs")
      },
      Some("""WITH RECURSIVE off AS (SELECT MAX(doc_id) + 1 AS off
             |      FROM documents),
             |corpus AS (SELECT doc_id, text FROM documents
             |      UNION ALL
             |      SELECT d.doc_id + off.off, d.text || ' zz9 zz8 zz7'
             |      FROM documents d CROSS JOIN off WHERE d.doc_id % 10 = 0
             |      UNION ALL
             |      SELECT d.doc_id + off.off * 2, d.text || ' qq9 qq8 qq7'
             |      FROM documents d CROSS JOIN off
             |      WHERE d.doc_id % 10 = 0),
             |t AS (SELECT doc_id,
             |        list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '') AS toks
             |      FROM corpus),
             |sh AS (SELECT doc_id,
             |        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' ||
             |          toks[i+2] for i in range(1, len(toks)-1)]) AS sh
             |      FROM t),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |      WHERE len(a.sh) > 0 AND len(b.sh) > 0
             |        AND round(CAST(len(list_intersect(a.sh, b.sh))
             |          AS DOUBLE) / (len(a.sh) + len(b.sh) -
             |          len(list_intersect(a.sh, b.sh))), 4) >= 0.8),
             |e AS (SELECT doc_a AS a, doc_b AS b FROM p
             |      UNION ALL SELECT doc_b, doc_a FROM p),
             |reach(a, b) AS (
             |      SELECT DISTINCT a, a AS b FROM e
             |      UNION
             |      SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
             |lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach
             |      GROUP BY 1),
             |asg AS (SELECT COALESCE(lab.cluster_id, corpus.doc_id)
             |          AS pc,
             |        corpus.doc_id % off.off AS tc
             |      FROM corpus CROSS JOIN off
             |      LEFT JOIN lab ON lab.doc_id = corpus.doc_id),
             |grid AS (SELECT pc, tc, COUNT(*) AS n FROM asg GROUP BY 1, 2),
             |pcs AS (SELECT pc, COUNT(*) AS np FROM asg GROUP BY 1),
             |tcs AS (SELECT tc, COUNT(*) AS nt FROM asg GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS nn FROM asg),
             |sums AS (SELECT
             |        CAST(SUM(CAST(round(CAST(grid.n AS DOUBLE) * grid.n
             |          / pcs.np, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sp,
             |        CAST(SUM(CAST(round(CAST(grid.n AS DOUBLE) * grid.n
             |          / tcs.nt, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sr
             |      FROM grid JOIN pcs USING (pc) JOIN tcs USING (tc))
             |SELECT CAST(tot.nn AS BIGINT) AS n_docs,
             |  (SELECT COUNT(*) FROM pcs) AS n_pred,
             |  (SELECT COUNT(*) FROM tcs) AS n_true,
             |  round(sums.sp / tot.nn, 6) AS bcubed_precision,
             |  round(sums.sr / tot.nn, 6) AS bcubed_recall,
             |  round(2.0 * (sums.sp / tot.nn) * (sums.sr / tot.nn) /
             |    (sums.sp / tot.nn + sums.sr / tot.nn), 6) AS bcubed_f1
             |FROM sums CROSS JOIN tot ORDER BY n_docs""".stripMargin)),
  )
}
