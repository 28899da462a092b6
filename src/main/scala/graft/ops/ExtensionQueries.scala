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

  private[ops] val STOPWORDS = Seq("a", "the")

  /** Partition-less unbounded window for GLOBAL normalizers over
    * k-/vocab-bounded aggregates (the r16 job-count lens): a scalar total
    * that derives from the frame it normalizes otherwise forces either a
    * localCheckpoint (an eager job per step) or a re-evaluation of the
    * whole upstream subtree for the broadcast branch. Riding the total on
    * an unbounded window keeps the step one lazy plan. ONLY legal over
    * aggregate-bounded inputs (PlansSpec rule 1 enforces this per build);
    * corpus-bounded normalizers must keep the checkpoint+broadcast form. */
  private[ops] val WgAll: org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window.partitionBy().rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)

  /** Single source for the x33/x35 merge budget: the Spark trainMerges
    * call, the oracle CTE's recursion bound, and the x35 final-state
    * selector all derive from this one value. */
  private[ops] val BpeNumMerges = 20

  /** Shared item co-occurrence graph builders (x85 / x101 / x114 / x120 /
    * x139 / x140): the distinct (user, day, item) context grain, the
    * same-context pair counts with a min-support filter, and the
    * symmetric (src, dst, w) edge list. ONE definition so the context
    * grain and the props→item extraction can't drift between the graph
    * ops (they were six inline copies before round 8's review). */
  private[ops] def itemContexts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // parse_json runs per event row above the first exchange; fan an
    // under-split events scan across the configured parallelism first so
    // the parse isn't serialized onto the scan's few file splits
    // (measured ~0.6 s single-task at sf0.1; no-op on a well-split
    // table — guide §2.5). Only (user_id, day, props) cross the fan-out
    // exchange — project before the exchange, guide §2.3 — and the
    // distinct's own hash exchange follows anyway, so this only
    // parallelizes the map side.
    Tables.fanOut(Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("props")),
        col("user_id"))
      .select(col("user_id"), col("day"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("item"))
      .distinct()

  /** Same-context item pairs (ia < ib) with co-occurrence count `w`,
    * kept when w >= minW. */
  private[ops] def itemPairs(s: org.apache.spark.sql.SparkSession, dir: String,
      minW: Int): org.apache.spark.sql.DataFrame =
    itemPairsFrom(itemContexts(s, dir), minW)

  /** [[itemPairs]] over a caller-supplied (possibly checkpointed) context
    * frame — delegates to [[AssocRules.basketPairs]], the ONE pair
    * builder, so same-basket semantics cannot fork between the graph
    * ops and the rule miner. */
  private[ops] def itemPairsFrom(ctx: org.apache.spark.sql.DataFrame,
      minW: Int): org.apache.spark.sql.DataFrame =
    AssocRules.basketPairs(ctx, minW)

  /** Symmetric weighted edge list (both directions of every pair). */
  private[ops] def itemEdges(s: org.apache.spark.sql.SparkSession, dir: String,
      minW: Int): org.apache.spark.sql.DataFrame = {
    val pairs = itemPairs(s, dir, minW)
    pairs.select(col("ia").as("src"), col("ib").as("dst"), col("w"))
      .unionByName(pairs.select(col("ib").as("src"), col("ia").as("dst"),
        col("w")))
  }

  /** x130/x141 shared sign-bit packing: 64-dim float embedding → two
    * 32-bit sign words in BIGINTs (lo = dims 0–31, hi = 32–63). */
  private[ops] val PackLoExpr: String =
    """aggregate(sequence(0, 31), 0L, (acc, j) ->
      |  acc + IF(CAST(element_at(embedding, j + 1) AS DOUBLE) > 0.0D,
      |           shiftleft(1L, j), 0L))""".stripMargin
  private[ops] val PackHiExpr: String =
    """aggregate(sequence(32, 63), 0L, (acc, j) ->
      |  acc + IF(CAST(element_at(embedding, j + 1) AS DOUBLE) > 0.0D,
      |           shiftleft(1L, j - 32), 0L))""".stripMargin

  /** x130/x141 shared exact cosine over (qe, ce) float arrays, rounded
    * to 4 dp BEFORE ranking (cross-engine float-order discipline). */
  private[ops] val CosineSim4Expr: String =
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
  private[ops] val BinPackOracleCte: String =
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
  private[ops] val EmbNormOracleCte: String =
    """e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb
             |      FROM embeddings),
             |n AS (SELECT vec_id, emb,
             |        sqrt(list_sum([x * x for x in emb])) AS nrm FROM e)"""

  /** Recursively delete `dir` at JVM exit — for per-invocation scratch
    * roots (x83) whose contents must outlive the query body (the returned
    * DataFrame lazily re-reads them) but not the process. One hook for
    * all registrations. */
  private[ops] val exitDirs = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  private[ops] lazy val exitHookInstalled: Unit =
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
  private[ops] def deleteOnExit(dir: String): Unit = {
    exitHookInstalled
    exitDirs.add(dir)
  }

  /** Drop a per-invocation catalog table at JVM exit so the entry doesn't
    * outlive its deleteOnExit'd data path. Best-effort: the session may
    * already be stopped at hook time, in which case the in-memory catalog
    * died with it anyway. */
  private[ops] val exitTables = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), java.lang.Boolean]())
  private[ops] lazy val tableHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitTables.forEach { case (sess, name) =>
        try sess.sql(s"DROP TABLE IF EXISTS $name")
        catch { case _: Throwable => () }
      }))
  private[ops] def dropTableOnExit(s: org.apache.spark.sql.SparkSession,
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
  private[ops] def countBelow(grid: org.apache.spark.sql.DataFrame,
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
  private[ops] def countBelowBy(grid: org.apache.spark.sql.DataFrame,
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
  private[ops] def dsirDocWeights(s: org.apache.spark.sql.SparkSession,
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

  private[ops] def armRiskGrid(s: org.apache.spark.sql.SparkSession, dir: String)
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
  private[ops] val fdDiscoveryOracle: String = {
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
  private[ops] val bpeTrainCte: String =
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
  private[ops] val dupGraphCtes: String =
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

  private[ops] val dupClustersOracle: String =
    dupGraphCtes + "\n" +
      """SELECT lab.doc_id, lab.cluster_id, siz.cluster_size
        |FROM lab JOIN siz USING (cluster_id) ORDER BY doc_id""".stripMargin

  def all: Seq[QuerySpec] =
    ExtensionDedupQueries.all ++
    ExtensionAnnQueries.all ++
    ExtensionTextQueries.all ++
    ExtensionGraphQueries.all ++
    ExtensionStats1Queries.all ++
    ExtensionStats2Queries.all ++
    ExtensionStats3Queries.all
}
