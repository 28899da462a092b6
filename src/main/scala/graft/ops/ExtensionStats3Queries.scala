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
object ExtensionStats3Queries {

  def all: Seq[QuerySpec] = Seq(
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
    // Partial autocorrelation function via Durbin-Levinson (Durbin
    // 1960; Box-Jenkins ch. 3 — THE model-identification companion to
    // x134's ACF: an AR(p) process shows PACF cutting off at p while
    // the ACF decays, so the ACF/PACF pair is read together and the
    // suite had only half). ρ̂ comes from the identical x134 lagged
    // equi-join device; the DL recursion φ_{k,j} = φ_{k−1,j} −
    // φ_{kk}·φ_{k−1,k−j} is UNROLLED to lag 5 as single-row algebra
    // (28 scalar expressions — bounded by construction, no loop, no
    // UDF), every level rounded 9 so both engines recurse on identical
    // values. |pacf| > 2/√n flags the classic AR-order cutoff read.
    QuerySpec(
      "x271_pacf",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val mu = d.agg((sum(col("n")).cast("double") / count(lit(1)))
          .as("mu"), count(lit(1)).as("nd"))
        val c = d.crossJoin(broadcast(mu))
          .select(col("day"), (col("n") - col("mu")).as("xc"), col("nd"))
          .localCheckpoint()
        val denom = c.agg(sum(round(col("xc") * col("xc"), 6)
          .cast("decimal(18,6)")).cast("double").as("den"),
          max(col("nd")).as("nd"))
        val lags = s.range(1, 6).select(col("id").cast("int").as("lag"))
        val rho = c.as("a").crossJoin(broadcast(lags))
          .select(col("lag"), expr("date_add(day, lag)").as("lday"),
            col("xc").as("xa"))
          .join(c.as("b").select(col("day").as("lday"),
            col("xc").as("xb")), "lday")
          .groupBy("lag")
          .agg(sum(round(col("xa") * col("xb"), 6).cast("decimal(18,6)"))
            .cast("double").as("num"))
          .crossJoin(broadcast(denom))
          .select(col("lag"), col("nd"),
            round(col("num") / col("den"), 6).as("r"))
        val w = rho.groupBy()
          .pivot("lag", Seq(1, 2, 3, 4, 5)).agg(first(col("r")))
          .select(col("1").as("r1"), col("2").as("r2"),
            col("3").as("r3"), col("4").as("r4"), col("5").as("r5"))
          .crossJoin(broadcast(denom.select(col("nd"))))
        val dl = w
          .withColumn("p11", round(col("r1"), 9))
          .withColumn("p22", round((col("r2") - col("p11") * col("r1")) /
            (lit(1.0) - col("p11") * col("r1")), 9))
          .withColumn("p21",
            round(col("p11") - col("p22") * col("p11"), 9))
          .withColumn("p33", round((col("r3") - col("p21") * col("r2") -
            col("p22") * col("r1")) /
            (lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2")),
            9))
          .withColumn("p31",
            round(col("p21") - col("p33") * col("p22"), 9))
          .withColumn("p32",
            round(col("p22") - col("p33") * col("p21"), 9))
          .withColumn("p44", round((col("r4") - col("p31") * col("r3") -
            col("p32") * col("r2") - col("p33") * col("r1")) /
            (lit(1.0) - col("p31") * col("r1") - col("p32") * col("r2") -
              col("p33") * col("r3")), 9))
          .withColumn("p41",
            round(col("p31") - col("p44") * col("p33"), 9))
          .withColumn("p42",
            round(col("p32") - col("p44") * col("p32"), 9))
          .withColumn("p43",
            round(col("p33") - col("p44") * col("p31"), 9))
          .withColumn("p55", round((col("r5") - col("p41") * col("r4") -
            col("p42") * col("r3") - col("p43") * col("r2") -
            col("p44") * col("r1")) /
            (lit(1.0) - col("p41") * col("r1") - col("p42") * col("r2") -
              col("p43") * col("r3") - col("p44") * col("r4")), 9))
        dl.select(col("nd"), col("r1"), col("r2"), col("r3"),
            col("r4"), col("r5"), col("p11"), col("p22"), col("p33"),
            col("p44"), col("p55"))
          .select(explode(array(
            struct(lit(1L).as("lag"), col("r1").as("acf"),
              col("p11").as("pacf")),
            struct(lit(2L).as("lag"), col("r2").as("acf"),
              col("p22").as("pacf")),
            struct(lit(3L).as("lag"), col("r3").as("acf"),
              col("p33").as("pacf")),
            struct(lit(4L).as("lag"), col("r4").as("acf"),
              col("p44").as("pacf")),
            struct(lit(5L).as("lag"), col("r5").as("acf"),
              col("p55").as("pacf")))).as("x"), col("nd"))
          .select(col("x.lag").as("lag"), round(col("x.acf"), 6)
            .as("acf"), round(col("x.pacf"), 6).as("pacf"),
            (abs(col("x.pacf")) >
              lit(2.0) / sqrt(col("nd").cast("double")))
              .cast("long").as("significant"))
          .orderBy("lag")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |      FROM events GROUP BY 1),
             |mu AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mu,
             |        count(*) AS nd FROM d),
             |c AS (SELECT day, n - mu.mu AS xc, mu.nd
             |      FROM d CROSS JOIN mu),
             |dn AS (SELECT CAST(sum(CAST(round(xc * xc, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS den,
             |        max(nd) AS nd FROM c),
             |l AS (SELECT CAST(lag AS INT) AS lag FROM range(1, 6)
             |      t(lag)),
             |rho AS (SELECT l.lag,
             |        round(CAST(sum(CAST(round(a.xc * b.xc, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) / any_value(dn.den),
             |          6) AS r
             |      FROM c a CROSS JOIN l
             |        JOIN c b ON b.day = a.day + l.lag * INTERVAL 1 DAY
             |        CROSS JOIN dn
             |      GROUP BY l.lag),
             |w AS (SELECT
             |        MAX(CASE WHEN lag = 1 THEN r END) AS r1,
             |        MAX(CASE WHEN lag = 2 THEN r END) AS r2,
             |        MAX(CASE WHEN lag = 3 THEN r END) AS r3,
             |        MAX(CASE WHEN lag = 4 THEN r END) AS r4,
             |        MAX(CASE WHEN lag = 5 THEN r END) AS r5,
             |        (SELECT nd FROM dn) AS nd
             |      FROM rho),
             |l1 AS (SELECT *, round(r1, 9) AS p11 FROM w),
             |l2 AS (SELECT *,
             |        round((r2 - p11 * r1) / (1.0 - p11 * r1), 9) AS p22
             |      FROM l1),
             |l2b AS (SELECT *, round(p11 - p22 * p11, 9) AS p21 FROM l2),
             |l3 AS (SELECT *,
             |        round((r3 - p21 * r2 - p22 * r1) /
             |          (1.0 - p21 * r1 - p22 * r2), 9) AS p33
             |      FROM l2b),
             |l3b AS (SELECT *, round(p21 - p33 * p22, 9) AS p31,
             |        round(p22 - p33 * p21, 9) AS p32 FROM l3),
             |l4 AS (SELECT *,
             |        round((r4 - p31 * r3 - p32 * r2 - p33 * r1) /
             |          (1.0 - p31 * r1 - p32 * r2 - p33 * r3), 9) AS p44
             |      FROM l3b),
             |l4b AS (SELECT *, round(p31 - p44 * p33, 9) AS p41,
             |        round(p32 - p44 * p32, 9) AS p42,
             |        round(p33 - p44 * p31, 9) AS p43 FROM l4),
             |l5 AS (SELECT *,
             |        round((r5 - p41 * r4 - p42 * r3 - p43 * r2 -
             |          p44 * r1) /
             |          (1.0 - p41 * r1 - p42 * r2 - p43 * r3 -
             |          p44 * r4), 9) AS p55
             |      FROM l4b),
             |out AS (SELECT 1 AS lag, r1 AS acf, p11 AS pacf, nd FROM l5
             |      UNION ALL SELECT 2, r2, p22, nd FROM l5
             |      UNION ALL SELECT 3, r3, p33, nd FROM l5
             |      UNION ALL SELECT 4, r4, p44, nd FROM l5
             |      UNION ALL SELECT 5, r5, p55, nd FROM l5)
             |SELECT CAST(lag AS BIGINT) AS lag, round(acf, 6) AS acf,
             |  round(pacf, 6) AS pacf,
             |  CAST(abs(pacf) > 2.0 / sqrt(CAST(nd AS DOUBLE))
             |    AS BIGINT) AS significant
             |FROM out ORDER BY lag""".stripMargin)),
    // Mean reciprocal rank + hit@k over ten label-queries (Voorhees,
    // TREC-8 1999 — the question-answering standard the eval suite's
    // x141 nDCG and x188 single-query AP don't give: MRR reads "how
    // deep is the FIRST relevant result", the metric for known-item /
    // QA retrieval). Each label is a query: centroid of its even-id
    // members retrieves among ALL odd-id vectors; the first-relevant
    // rank needs NO global sort — rank(r*) = 1 + #{candidates
    // strictly better than the best-scoring relevant} under the
    // deterministic (score desc, vec_id) order, a counting aggregate
    // (the x188 rounding discipline: dots 4, norms 4). hit@1/hit@5
    // and the global MRR ride along.
    QuerySpec(
      "x272_mrr",
      (s, dir) => {
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("label"), col("dim"),
            col("v").cast("double").as("v"))
          .localCheckpoint() // feeds centroids and candidate scores
        val cen = ex.filter(col("vec_id") % 2 === 0)
          .groupBy(col("label").as("q"), col("dim"))
          .agg(round(sum(round(col("v"), 6).cast("decimal(18,6)"))
            .cast("double") / count(lit(1)), 6).as("c"))
        val cn = cen.groupBy("q")
          .agg(round(sqrt(sum(col("c") * col("c"))), 4).as("cnorm"))
        val sc = ex.filter(col("vec_id") % 2 === 1)
          .join(broadcast(cen), "dim")
          .groupBy("q", "vec_id")
          .agg(round(sum(col("v") * col("c")), 4).as("dot"),
            round(sqrt(sum(col("v") * col("v"))), 4).as("nv"),
            max(col("label")).as("label"))
          .join(broadcast(cn), "q")
          .select(col("q"), col("vec_id"),
            (col("label") === col("q")).cast("long").as("rel"),
            round(col("dot") / (col("nv") * col("cnorm")), 4).as("s"))
          .localCheckpoint() // |labels| x |odd vectors|, label-bounded
        val best = sc.filter(col("rel") === 1)
          .groupBy("q")
          .agg(max(struct(col("s"), (-col("vec_id")).as("nid"))).as("b"))
          .select(col("q"), col("b.s").as("bs"), (-col("b.nid"))
            .as("bid"))
        val rk = sc.join(broadcast(best), "q")
          .groupBy("q")
          .agg((sum((col("s") > col("bs") ||
            (col("s") === col("bs") && col("vec_id") < col("bid")))
            .cast("long")) + 1L).as("first_rank"),
            count(lit(1)).as("n_cand"))
          .select(col("q"), col("n_cand"), col("first_rank"),
            round(lit(1.0) / col("first_rank"), 6).as("rr"))
          .localCheckpoint() // 10 rows
        val g = rk.agg(
          round(sum(col("rr").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("mrr"),
          round(sum((col("first_rank") === 1).cast("long"))
            .cast("double") / count(lit(1)), 6).as("hit1"),
          round(sum((col("first_rank") <= 5).cast("long"))
            .cast("double") / count(lit(1)), 6).as("hit5"))
        rk.crossJoin(broadcast(g))
          .select(col("q").as("query_label"), col("n_cand"),
            col("first_rank"), col("rr"), col("mrr"),
            col("hit1").as("hit_at_1"), col("hit5").as("hit_at_5"))
          .orderBy("query_label")
      },
      Some("""WITH ex AS (SELECT vec_id, label, g.i - 1 AS dim,
             |        CAST(embedding[g.i] AS DOUBLE) AS v
             |      FROM embeddings CROSS JOIN (SELECT unnest(
             |        range(1, 65)) AS i) g),
             |cen AS (SELECT label AS q, dim,
             |        round(CAST(SUM(CAST(round(v, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) / COUNT(*), 6) AS c
             |      FROM ex WHERE vec_id % 2 = 0 GROUP BY 1, 2),
             |cn AS (SELECT q, round(sqrt(SUM(c * c)), 4) AS cnorm
             |      FROM cen GROUP BY 1),
             |sc AS (SELECT s0.q, s0.vec_id,
             |        CAST(s0.label = s0.q AS BIGINT) AS rel,
             |        round(s0.dot / (s0.nv * cn.cnorm), 4) AS s
             |      FROM (SELECT cen.q, ex.vec_id,
             |          round(SUM(ex.v * cen.c), 4) AS dot,
             |          round(sqrt(SUM(ex.v * ex.v)), 4) AS nv,
             |          MAX(ex.label) AS label
             |        FROM ex JOIN cen ON cen.dim = ex.dim
             |        WHERE ex.vec_id % 2 = 1 GROUP BY 1, 2) s0
             |      JOIN cn ON cn.q = s0.q),
             |best AS (SELECT q, s AS bs, vec_id AS bid FROM (
             |        SELECT q, s, vec_id, row_number() OVER (
             |          PARTITION BY q ORDER BY s DESC, vec_id) AS rn
             |        FROM sc WHERE rel = 1) WHERE rn = 1),
             |rk AS (SELECT sc.q, COUNT(*) AS n_cand,
             |        SUM(CASE WHEN sc.s > best.bs OR (sc.s = best.bs
             |          AND sc.vec_id < best.bid) THEN 1 ELSE 0 END) + 1
             |          AS first_rank
             |      FROM sc JOIN best ON best.q = sc.q
             |      GROUP BY 1),
             |rr AS (SELECT q, n_cand, first_rank,
             |        round(1.0 / first_rank, 6) AS rr FROM rk),
             |g AS (SELECT
             |        round(CAST(SUM(CAST(rr AS DECIMAL(18,6)))
             |          AS DOUBLE) / COUNT(*), 6) AS mrr,
             |        round(CAST(SUM(CASE WHEN first_rank = 1 THEN 1
             |          ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS hit1,
             |        round(CAST(SUM(CASE WHEN first_rank <= 5 THEN 1
             |          ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS hit5
             |      FROM rr)
             |SELECT CAST(q AS BIGINT) AS query_label,
             |  CAST(n_cand AS BIGINT) AS n_cand,
             |  CAST(first_rank AS BIGINT) AS first_rank, rr,
             |  g.mrr, g.hit1 AS hit_at_1, g.hit5 AS hit_at_5
             |FROM rr CROSS JOIN g ORDER BY query_label""".stripMargin)),
    // Jarque-Bera normality test (Jarque & Bera, Econ. Letters 1980):
    // JB = n·(S²/6 + (K−3)²/24) ~ χ²₂ on the per-user activity counts —
    // the distributional GATEKEEPER the parametric reads assume away
    // (x133's t is robust to non-normality only at large n; x148's
    // power analysis and x265's boundaries are normal-theory numbers).
    // Skewness/kurtosis come from exact BIGINT power sums (counts are
    // small ints, Σy⁴ far under 2⁶³) expanded around the mean in the
    // final 1-row double algebra; χ²₂'s 5% critical value 5.991 is the
    // published constant, so no CDF is needed.
    QuerySpec(
      "x273_jarque_bera",
      (s, dir) => {
        val m = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("y"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("s1"),
            sum(col("y") * col("y")).as("s2"),
            sum(col("y") * col("y") * col("y")).as("s3"),
            sum(col("y") * col("y") * col("y") * col("y")).as("s4"))
        val mom = m.select(col("n"),
          (col("s1").cast("double") / col("n")).as("m1"),
          (col("s2").cast("double") / col("n")).as("r2"),
          (col("s3").cast("double") / col("n")).as("r3"),
          (col("s4").cast("double") / col("n")).as("r4"))
        val cen = mom.select(col("n"), col("m1"),
          (col("r2") - col("m1") * col("m1")).as("m2"),
          (col("r3") - lit(3.0) * col("m1") * col("r2") +
            lit(2.0) * col("m1") * col("m1") * col("m1")).as("m3"),
          (col("r4") - lit(4.0) * col("m1") * col("r3") +
            lit(6.0) * col("m1") * col("m1") * col("r2") -
            lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1"))
            .as("m4"))
        cen.select(col("n").as("n_users"),
            round(col("m1"), 6).as("mean"),
            round(col("m3") / pow(col("m2"), 1.5), 6).as("skewness"),
            round(col("m4") / (col("m2") * col("m2")), 6).as("kurtosis"),
            round(col("n") * (col("m3") / pow(col("m2"), 1.5) *
              (col("m3") / pow(col("m2"), 1.5)) / 6.0 +
              (col("m4") / (col("m2") * col("m2")) - 3.0) *
                (col("m4") / (col("m2") * col("m2")) - 3.0) / 24.0), 6)
              .as("jb"),
            (col("n") * (col("m3") / pow(col("m2"), 1.5) *
              (col("m3") / pow(col("m2"), 1.5)) / 6.0 +
              (col("m4") / (col("m2") * col("m2")) - 3.0) *
                (col("m4") / (col("m2") * col("m2")) - 3.0) / 24.0)
              > 5.991).cast("long").as("reject_normal_05"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS y FROM events
             |      GROUP BY 1),
             |m AS (SELECT COUNT(*) AS n, SUM(y) AS s1,
             |        SUM(y * y) AS s2, SUM(y * y * y) AS s3,
             |        SUM(y * y * y * y) AS s4 FROM u),
             |mom AS (SELECT n,
             |        CAST(s1 AS DOUBLE) / n AS m1,
             |        CAST(s2 AS DOUBLE) / n AS r2,
             |        CAST(s3 AS DOUBLE) / n AS r3,
             |        CAST(s4 AS DOUBLE) / n AS r4 FROM m),
             |cen AS (SELECT n, m1,
             |        r2 - m1 * m1 AS m2,
             |        r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
             |        r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 -
             |          3.0 * m1 * m1 * m1 * m1 AS m4 FROM mom)
             |SELECT CAST(n AS BIGINT) AS n_users, round(m1, 6) AS mean,
             |  round(m3 / power(m2, 1.5), 6) AS skewness,
             |  round(m4 / (m2 * m2), 6) AS kurtosis,
             |  round(n * ((m3 / power(m2, 1.5)) * (m3 / power(m2, 1.5))
             |    / 6.0 + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
             |    / 24.0), 6) AS jb,
             |  CAST(n * ((m3 / power(m2, 1.5)) * (m3 / power(m2, 1.5))
             |    / 6.0 + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
             |    / 24.0) > 5.991 AS BIGINT) AS reject_normal_05
             |FROM cen ORDER BY n_users""".stripMargin)),
    // Cochran's Q (Cochran, Biometrika 1950): do the five event types
    // differ in HEAVY-USE penetration (≥15 events of the type — plain
    // any-use incidence is all-ones on this corpus: every user touches
    // every type, ΣR²=k·N and Q's denominator is literally zero) — the
    // binary-incidence repeated-measures test completing the blocked-
    // design family (x248's Friedman ranks VALUES within blocks; Q is
    // its 0/1 specialization, McNemar x185 its k=2 case).
    // Q = (k−1)(kΣC_j² − N²)/(kN − ΣR_i²) ~ χ²_{k−1}: EVERYTHING is an
    // exact BIGINT; the published χ²₄ 5% critical value 9.488 makes the
    // decision CDF-free; a still-degenerate denominator reports q=0
    // (CASE'd identically in both engines).
    QuerySpec(
      "x275_cochran_q",
      (s, dir) => {
        val types = Seq("click", "view", "signup", "error", "purchase")
        val inc = types.zipWithIndex.map { case (t, i) =>
          (sum(when(col("event_type") === t, 1L).otherwise(0L)) >= 15L)
            .cast("long").as(s"x$i") }
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(inc.head, inc.tail: _*)
          .withColumn("r",
            (0 until 5).map(i => col(s"x$i")).reduce(_ + _))
        val mAggs = Seq(count(lit(1)).as("n"), sum(col("r")).as("nn"),
          sum(col("r") * col("r")).as("sr2")) ++
          (0 until 5).map(i => sum(col(s"x$i")).as(s"c$i"))
        val m = u.agg(mAggs.head, mAggs.tail: _*)
        val sc2 = (0 until 5).map(i => col(s"c$i") * col(s"c$i"))
          .reduce(_ + _)
        m.select(col("n").as("n_users"), lit(5L).as("k_types"),
            col("nn").as("n_incidences"),
            when(lit(5L) * col("nn") - col("sr2") === 0L, lit(0.0))
              .otherwise(round(lit(4.0) *
                (lit(5L) * sc2 - col("nn") * col("nn")).cast("double") /
                (lit(5L) * col("nn") - col("sr2")).cast("double"), 6))
              .as("q"),
            (lit(5L) * col("nn") - col("sr2") =!= 0L &&
              lit(4.0) * (lit(5L) * sc2 - col("nn") * col("nn"))
                .cast("double") /
                (lit(5L) * col("nn") - col("sr2")).cast("double")
                > 9.488).cast("long").as("reject_05"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        CAST(SUM(CASE WHEN event_type = 'click' THEN 1
             |          ELSE 0 END) >= 15 AS BIGINT) AS x0,
             |        CAST(SUM(CASE WHEN event_type = 'view' THEN 1
             |          ELSE 0 END) >= 15 AS BIGINT) AS x1,
             |        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1
             |          ELSE 0 END) >= 15 AS BIGINT) AS x2,
             |        CAST(SUM(CASE WHEN event_type = 'error' THEN 1
             |          ELSE 0 END) >= 15 AS BIGINT) AS x3,
             |        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
             |          ELSE 0 END) >= 15 AS BIGINT) AS x4
             |      FROM events GROUP BY 1),
             |m AS (SELECT COUNT(*) AS n,
             |        SUM(x0 + x1 + x2 + x3 + x4) AS nn,
             |        SUM((x0 + x1 + x2 + x3 + x4) *
             |            (x0 + x1 + x2 + x3 + x4)) AS sr2,
             |        SUM(x0) AS c0, SUM(x1) AS c1, SUM(x2) AS c2,
             |        SUM(x3) AS c3, SUM(x4) AS c4
             |      FROM u)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |  CAST(5 AS BIGINT) AS k_types,
             |  CAST(nn AS BIGINT) AS n_incidences,
             |  CASE WHEN 5 * nn - sr2 = 0 THEN 0.0
             |    ELSE round(4.0 * CAST(5 * (c0*c0 + c1*c1 + c2*c2 +
             |      c3*c3 + c4*c4) - nn * nn AS DOUBLE) /
             |      CAST(5 * nn - sr2 AS DOUBLE), 6) END AS q,
             |  CAST(5 * nn - sr2 <> 0 AND
             |    4.0 * CAST(5 * (c0*c0 + c1*c1 + c2*c2 + c3*c3 +
             |    c4*c4) - nn * nn AS DOUBLE) /
             |    CAST(5 * nn - sr2 AS DOUBLE) > 9.488 AS BIGINT)
             |    AS reject_05
             |FROM m ORDER BY n_users""".stripMargin)),
    // Youden's J optimal cutpoint (Youden, Cancer 1950; Perkins &
    // Schisterman 2006 for why J beats closest-to-(0,1)): the
    // THRESHOLD-SELECTION read completing the operating-point family —
    // x168 sweeps the ROC for its area, x267 evaluates ONE fixed
    // (median) cut, J = max(TPR − FPR) names the cut that balances
    // sensitivity and specificity. The sweep runs over the bounded
    // distinct-score grid (the x135/x168 device: cumulative windows
    // over an aggregate, never per-user); ties on J break to the
    // SMALLEST threshold (deterministic min struct).
    QuerySpec(
      "x280_youden_j",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
        val g = u.groupBy(col("act"))
          .agg(sum(col("y")).as("pos"),
            sum(lit(1L) - col("y")).as("neg"))
        val tot = g.agg(sum(col("pos")).as("np"), sum(col("neg"))
          .as("nn"))
        val wc = W.orderBy(col("act").desc)
          .rowsBetween(W.unboundedPreceding, 0)
        val roc = g
          .withColumn("ctp", sum(col("pos")).over(wc))
          .withColumn("cfp", sum(col("neg")).over(wc))
          .crossJoin(broadcast(tot))
          .select(col("act").as("threshold"),
            round(col("ctp").cast("double") / col("np"), 6).as("tpr"),
            round(col("cfp").cast("double") / col("nn"), 6).as("fpr"))
          .withColumn("j", round(col("tpr") - col("fpr"), 6))
          .localCheckpoint() // |distinct act| rows
        val best = roc.agg(max(struct(col("j"),
          (-col("threshold")).as("nt"))).as("b"))
          .select(col("b.j").as("bj"), (-col("b.nt")).as("bt"))
        roc.crossJoin(broadcast(best))
          .filter(col("j") === col("bj") && col("threshold") === col("bt"))
          .select(col("threshold").as("best_threshold"),
            col("tpr").as("sensitivity"),
            round(lit(1.0) - col("fpr"), 6).as("specificity"),
            col("j").as("youden_j"))
          .orderBy("best_threshold")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |g AS (SELECT act, SUM(y) AS pos, SUM(1 - y) AS neg FROM u
             |      GROUP BY 1),
             |tot AS (SELECT SUM(pos) AS np, SUM(neg) AS nn FROM g),
             |roc AS (SELECT act AS threshold,
             |        round(CAST(SUM(pos) OVER w AS DOUBLE) / tot.np, 6)
             |          AS tpr,
             |        round(CAST(SUM(neg) OVER w AS DOUBLE) / tot.nn, 6)
             |          AS fpr
             |      FROM g CROSS JOIN tot
             |      WINDOW w AS (ORDER BY act DESC ROWS BETWEEN UNBOUNDED
             |        PRECEDING AND CURRENT ROW)),
             |j AS (SELECT threshold, tpr, fpr,
             |        round(tpr - fpr, 6) AS j FROM roc),
             |best AS (SELECT j AS bj, threshold AS bt FROM j
             |      ORDER BY j DESC, threshold LIMIT 1)
             |SELECT CAST(j.threshold AS BIGINT) AS best_threshold,
             |  j.tpr AS sensitivity,
             |  round(1.0 - j.fpr, 6) AS specificity,
             |  j.j AS youden_j
             |FROM j JOIN best ON j.j = best.bj
             |  AND j.threshold = best.bt
             |ORDER BY best_threshold""".stripMargin)),
    // Lorenz curve (Lorenz, ASA 1905): the cumulative revenue-share
    // curve x147's Gini integrates to a single number — per decile of
    // users ORDERED BY SPEND, what share of revenue they hold (the
    // "bottom 50% hold 8%" read every concentration audit quotes).
    // Decile cuts from ONE bounded exact-percentile aggregate on the
    // integer-cents recode; within-decile revenue sums are exact
    // BIGINTs; cumulative shares are windows over the 10-row decile
    // grid; the trapezoid Gini rides along for the x147 cross-check
    // (approximate by construction — decile-grained, stated in name).
    QuerySpec(
      "x281_lorenz_curve",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
        val cutCols = (1 to 9).map(i =>
          round(expr(s"percentile(c, CAST($i AS DOUBLE) / 10)"), 6)
            .as(s"q$i"))
        val cuts = u.agg(cutCols.head, cutCols.tail: _*)
        val dec = u.crossJoin(broadcast(cuts))
          .select(col("c"),
            (1 to 9).map(i => (col("c") > col(s"q$i")).cast("long"))
              .reduce(_ + _).as("d"))
          .groupBy("d").agg(count(lit(1)).as("n"), sum(col("c")).as("r"))
        val tot = dec.agg(sum(col("n")).as("tn"), sum(col("r")).as("tr"))
        val wc = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
        val cum = dec.crossJoin(broadcast(tot))
          .withColumn("cn", sum(col("n")).over(wc))
          .withColumn("cr", sum(col("r")).over(wc))
          .select((col("d") + 1).as("decile"), col("n").as("n_users"),
            round(col("r").cast("double") / col("tr"), 6)
              .as("rev_share"),
            round(col("cn").cast("double") / col("tn"), 6)
              .as("cum_pop_share"),
            round(col("cr").cast("double") / col("tr"), 6)
              .as("cum_rev_share"))
        // NOT checkpointed: the gini lag window is partition-less and
        // Rule-1-legal only with the 10-row decile AGGREGATE visible
        // beneath it; recompute is a 10-row window re-run
        val gini = cum
          .withColumn("prevp", coalesce(lag(col("cum_pop_share"), 1)
            .over(W.orderBy("decile")), lit(0.0)))
          .withColumn("prevr", coalesce(lag(col("cum_rev_share"), 1)
            .over(W.orderBy("decile")), lit(0.0)))
          .agg(round(lit(1.0) - sum(round(
            (col("cum_pop_share") - col("prevp")) *
              (col("cum_rev_share") + col("prevr")), 9)
            .cast("decimal(38,9)")).cast("double"), 6).as("g"))
        cum.crossJoin(broadcast(gini))
          .select(col("decile"), col("n_users"), col("rev_share"),
            col("cum_pop_share"), col("cum_rev_share"),
            col("g").as("gini_trapezoid"))
          .orderBy("decile")
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS c
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY 1),
             |cuts AS (SELECT
             |        round(quantile_cont(c, CAST(1 AS DOUBLE) / 10), 6) AS q1,
             |        round(quantile_cont(c, CAST(2 AS DOUBLE) / 10), 6) AS q2,
             |        round(quantile_cont(c, CAST(3 AS DOUBLE) / 10), 6) AS q3,
             |        round(quantile_cont(c, CAST(4 AS DOUBLE) / 10), 6) AS q4,
             |        round(quantile_cont(c, CAST(5 AS DOUBLE) / 10), 6) AS q5,
             |        round(quantile_cont(c, CAST(6 AS DOUBLE) / 10), 6) AS q6,
             |        round(quantile_cont(c, CAST(7 AS DOUBLE) / 10), 6) AS q7,
             |        round(quantile_cont(c, CAST(8 AS DOUBLE) / 10), 6) AS q8,
             |        round(quantile_cont(c, CAST(9 AS DOUBLE) / 10), 6) AS q9
             |      FROM u),
             |dec AS (SELECT
             |        CAST(c > q1 AS BIGINT) + CAST(c > q2 AS BIGINT) +
             |        CAST(c > q3 AS BIGINT) + CAST(c > q4 AS BIGINT) +
             |        CAST(c > q5 AS BIGINT) + CAST(c > q6 AS BIGINT) +
             |        CAST(c > q7 AS BIGINT) + CAST(c > q8 AS BIGINT) +
             |        CAST(c > q9 AS BIGINT) AS d,
             |        COUNT(*) AS n, SUM(c) AS r
             |      FROM u CROSS JOIN cuts GROUP BY 1),
             |tot AS (SELECT SUM(n) AS tn, SUM(r) AS tr FROM dec),
             |cum AS (SELECT d + 1 AS decile, n AS n_users,
             |        round(CAST(r AS DOUBLE) / tot.tr, 6) AS rev_share,
             |        round(CAST(SUM(n) OVER w AS DOUBLE) / tot.tn, 6)
             |          AS cum_pop_share,
             |        round(CAST(SUM(r) OVER w AS DOUBLE) / tot.tr, 6)
             |          AS cum_rev_share
             |      FROM dec CROSS JOIN tot
             |      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED
             |        PRECEDING AND CURRENT ROW)),
             |lagd AS (SELECT decile, cum_pop_share, cum_rev_share,
             |        COALESCE(LAG(cum_pop_share) OVER (ORDER BY decile),
             |          0.0) AS prevp,
             |        COALESCE(LAG(cum_rev_share) OVER (ORDER BY decile),
             |          0.0) AS prevr
             |      FROM cum),
             |gini AS (SELECT round(1.0 - CAST(SUM(CAST(round(
             |        (cum_pop_share - prevp) * (cum_rev_share + prevr),
             |        9) AS DECIMAL(38,9))) AS DOUBLE), 6) AS g
             |      FROM lagd)
             |SELECT CAST(decile AS BIGINT) AS decile,
             |  CAST(n_users AS BIGINT) AS n_users, rev_share,
             |  cum_pop_share, cum_rev_share, gini.g AS gini_trapezoid
             |FROM cum CROSS JOIN gini ORDER BY decile""".stripMargin)),
    // Durbin-Watson statistic (Durbin & Watson, Biometrika 1950/51):
    // first-order residual autocorrelation of the daily-volume linear
    // trend — the regression-residual diagnostic completing the
    // x229/x231 fit family (a trend fit with autocorrelated residuals
    // under-states every SE those fits report; DW ≈ 2(1−ρ̂₁) is the
    // canonical gate). OLS slope/intercept from exact integer sums
    // over the day index; residuals and their lag-1 differences are
    // windows over the calendar-bounded day grid; the conventional
    // <1.5 / >2.5 bands give the verdict without the DW tables.
    QuerySpec(
      "x282_durbin_watson",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val span = d.agg(min(col("day")).as("a"))
        // NOT checkpointed: the lag window below is partition-less and
        // Rule-1-legal only because the day-count AGGREGATE stays
        // visible beneath it (a checkpoint would hide it behind a
        // LogicalRDD); the double-read (moments + residuals) re-runs
        // one cheap aggregate.
        val idx = d.crossJoin(broadcast(span))
          .select(datediff(col("day"), col("a")).cast("long").as("t"),
            col("n"))
        val m = idx.agg(count(lit(1)).as("k"), sum(col("t")).as("st"),
          sum(col("t") * col("t")).as("stt"), sum(col("n")).as("sn"),
          sum(col("t") * col("n")).as("stn"))
        val fit = m.select(col("k"),
          ((col("k") * col("stn") - col("st") * col("sn")).cast("double")
            / (col("k") * col("stt") - col("st") * col("st")))
            .as("slope"),
          ((col("sn").cast("double") * col("stt") -
            col("st").cast("double") * col("stn")) /
            (col("k") * col("stt") - col("st") * col("st")).cast("double"))
            .as("icept"))
        val e = idx.crossJoin(broadcast(fit))
          .select(col("t"), col("k"), col("slope"), col("icept"),
            round(col("n") - col("icept") - col("slope") * col("t"), 6)
              .as("e"))
        val wl = W.orderBy("t")
        val dw = e
          .withColumn("ep", lag(col("e"), 1).over(wl))
          .agg(max(col("k")).as("n_days"),
            round(max(col("slope")), 6).as("slope"),
            sum(round(col("e") * col("e"), 6).cast("decimal(38,6)"))
              .cast("double").as("see"),
            sum(when(col("ep").isNotNull,
              round((col("e") - col("ep")) * (col("e") - col("ep")), 6))
              .otherwise(0.0).cast("decimal(38,6)")).cast("double")
              .as("sdd"))
        dw.select(col("n_days"), col("slope"),
            round(col("sdd") / col("see"), 6).as("dw"),
            when(col("sdd") / col("see") < 1.5, "positive autocorr")
              .when(col("sdd") / col("see") > 2.5, "negative autocorr")
              .otherwise("no evidence").as("verdict"))
          .orderBy("n_days")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |span AS (SELECT MIN(day) AS a FROM d),
             |idx AS (SELECT CAST(date_diff('day', span.a, day)
             |          AS BIGINT) AS t, n
             |      FROM d CROSS JOIN span),
             |m AS (SELECT COUNT(*) AS k, SUM(t) AS st,
             |        SUM(t * t) AS stt, SUM(n) AS sn, SUM(t * n) AS stn
             |      FROM idx),
             |fit AS (SELECT k,
             |        CAST(k * stn - st * sn AS DOUBLE) /
             |          (k * stt - st * st) AS slope,
             |        (CAST(sn AS DOUBLE) * stt -
             |          CAST(st AS DOUBLE) * stn) /
             |          CAST(k * stt - st * st AS DOUBLE) AS icept
             |      FROM m),
             |e AS (SELECT idx.t, fit.k, fit.slope,
             |        round(idx.n - fit.icept - fit.slope * idx.t, 6)
             |          AS e
             |      FROM idx CROSS JOIN fit),
             |l AS (SELECT t, k, slope, e,
             |        LAG(e) OVER (ORDER BY t) AS ep FROM e),
             |dw AS (SELECT MAX(k) AS n_days,
             |        round(MAX(slope), 6) AS slope,
             |        CAST(SUM(CAST(round(e * e, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS see,
             |        CAST(SUM(CASE WHEN ep IS NOT NULL THEN
             |          CAST(round((e - ep) * (e - ep), 6)
             |          AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6))
             |          END) AS DOUBLE) AS sdd
             |      FROM l)
             |SELECT CAST(n_days AS BIGINT) AS n_days, slope,
             |  round(sdd / see, 6) AS dw,
             |  CASE WHEN sdd / see < 1.5 THEN 'positive autocorr'
             |    WHEN sdd / see > 2.5 THEN 'negative autocorr'
             |    ELSE 'no evidence' END AS verdict
             |FROM dw ORDER BY n_days""".stripMargin)),
    // Haar wavelet energy decomposition (Haar 1910; Mallat's
    // multiresolution frame, 1989) of the daily event-count series:
    // how much variation lives at the 2-day, 4-day and 8-day scales —
    // the MULTI-RESOLUTION read between x134's per-lag correlations
    // and x224's single seasonal split (a bursty series and a weekly-
    // seasonal series can share an ACF value yet put their energy at
    // different scales). Haar's rationals stay EXACT: the level-k
    // detail is a half-block-sum difference D_k (an integer), its
    // orthonormal energy ΣD_k²/2^k divides once at the end, and
    // Parseval (Σ energies = Σx² − P·x̄²... reported raw as Σx²
    // coverage) makes the audit self-checking. Day grid zero-padded
    // to a multiple of 8; three bounded cascade aggregates.
    QuerySpec(
      "x283_haar_energy",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val span = d.agg(min(col("day")).as("a"),
          (floor((datediff(max(col("day")), min(col("day"))) + 8) / 8)
            * 8).cast("long").as("p"))
        val grid = span
          .select(col("a"), explode(expr("sequence(0, p - 1)")).as("idx"))
          .select(expr("date_add(a, CAST(idx AS INT))").as("day"),
            col("idx"))
          .join(d, Seq("day"), "left").na.fill(0L, Seq("n"))
          .select(col("idx"), col("n"))
        val tote = grid.agg(sum(col("n") * col("n")).as("sxx"),
          count(lit(1)).as("p"))
        val l1 = grid.groupBy((col("idx") / 2).cast("long").as("b"))
          .agg(sum(col("n")).as("s"),
            sum(when(col("idx") % 2 === 0, col("n")).otherwise(-col("n")))
              .as("dd"))
          .localCheckpoint() // |days|/2 rows
        val l2 = l1.groupBy((col("b") / 2).cast("long").as("b2"))
          .agg(sum(col("s")).as("s"),
            sum(when(col("b") % 2 === 0, col("s")).otherwise(-col("s")))
              .as("dd"))
          .localCheckpoint()
        val l3 = l2.groupBy((col("b2") / 2).cast("long").as("b3"))
          .agg(sum(col("s")).as("s"),
            sum(when(col("b2") % 2 === 0, col("s")).otherwise(-col("s")))
              .as("dd"))
          .localCheckpoint()
        val e1 = l1.agg(count(lit(1)).as("k"),
          sum(col("dd") * col("dd")).as("e2"))
          .select(lit(1L).as("level"), col("k").as("n_coeffs"),
            (col("e2").cast("double") / 2).as("energy"))
        val e2 = l2.agg(count(lit(1)).as("k"),
          sum(col("dd") * col("dd")).as("e2"))
          .select(lit(2L).as("level"), col("k").as("n_coeffs"),
            (col("e2").cast("double") / 4).as("energy"))
        val e3 = l3.agg(count(lit(1)).as("k"),
          sum(col("dd") * col("dd")).as("e2"))
          .select(lit(3L).as("level"), col("k").as("n_coeffs"),
            (col("e2").cast("double") / 8).as("energy"))
        val e0 = l3.agg(count(lit(1)).as("k"),
          sum(col("s") * col("s")).as("e2"))
          .select(lit(0L).as("level"), col("k").as("n_coeffs"),
            (col("e2").cast("double") / 8).as("energy"))
        e0.unionByName(e1).unionByName(e2).unionByName(e3)
          .crossJoin(broadcast(tote))
          .select(col("level"), col("n_coeffs"),
            round(col("energy"), 6).as("energy"),
            round(col("energy") / col("sxx"), 6).as("energy_share"))
          .orderBy("level")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |span AS (SELECT MIN(day) AS a,
             |        CAST(floor((date_diff('day', MIN(day), MAX(day))
             |          + 8) / 8) * 8 AS BIGINT) AS p
             |      FROM d),
             |grid AS (SELECT g.idx, COALESCE(d.n, 0) AS n
             |      FROM (SELECT span.a, unnest(range(span.p)) AS idx
             |        FROM span) g
             |      LEFT JOIN d ON d.day = g.a +
             |        CAST(g.idx AS INT) * INTERVAL 1 DAY),
             |tote AS (SELECT SUM(n * n) AS sxx FROM grid),
             |l1 AS (SELECT idx // 2 AS b, SUM(n) AS s,
             |        SUM(CASE WHEN idx % 2 = 0 THEN n ELSE -n END) AS dd
             |      FROM grid GROUP BY 1),
             |l2 AS (SELECT b // 2 AS b2, SUM(s) AS s,
             |        SUM(CASE WHEN b % 2 = 0 THEN s ELSE -s END) AS dd
             |      FROM l1 GROUP BY 1),
             |l3 AS (SELECT b2 // 2 AS b3, SUM(s) AS s,
             |        SUM(CASE WHEN b2 % 2 = 0 THEN s ELSE -s END) AS dd
             |      FROM l2 GROUP BY 1),
             |e AS (SELECT 0 AS level, COUNT(*) AS n_coeffs,
             |        CAST(SUM(s * s) AS DOUBLE) / 8 AS energy FROM l3
             |      UNION ALL SELECT 1, COUNT(*),
             |        CAST(SUM(dd * dd) AS DOUBLE) / 2 FROM l1
             |      UNION ALL SELECT 2, COUNT(*),
             |        CAST(SUM(dd * dd) AS DOUBLE) / 4 FROM l2
             |      UNION ALL SELECT 3, COUNT(*),
             |        CAST(SUM(dd * dd) AS DOUBLE) / 8 FROM l3)
             |SELECT CAST(level AS BIGINT) AS level,
             |  CAST(n_coeffs AS BIGINT) AS n_coeffs,
             |  round(energy, 6) AS energy,
             |  round(energy / tote.sxx, 6) AS energy_share
             |FROM e CROSS JOIN tote ORDER BY level""".stripMargin)),
    // AUC with the Hanley-McNeil confidence interval (Hanley & McNeil,
    // Radiology 1982 — the standard nonparametric AUC SE): the
    // INFERENCE read x168's point AUC lacks, on the x280 operating
    // pair (activity score vs high-value conversion). AUC comes
    // EXACTLY from the x135 integer midrank grid (AUC = U/(n₁n₀) with
    // half-tie credit — the Mann-Whitney identity), then
    // SE² = [A(1−A)+(n₁−1)(Q₁−A²)+(n₀−1)(Q₂−A²)]/(n₁n₀) with
    // Q₁ = A/(2−A), Q₂ = 2A²/(1+A) — 1-row algebra. No pair join,
    // no bootstrap fan-out (x137 prices that path; this is the
    // closed form).
    QuerySpec(
      "x284_auc_ci",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
        val grid = u.groupBy(col("act"))
          .agg(sum(col("y")).as("cp"),
            sum(lit(1L) - col("y")).as("cn"))
          .withColumn("cnt", col("cp") + col("cn"))
        val wc = W.orderBy("act").rowsBetween(W.unboundedPreceding, -1)
        val m = grid.withColumn("cumprev",
            coalesce(sum(col("cnt")).over(wc), lit(0L)))
          .agg(sum(col("cp")).as("n1"), sum(col("cn")).as("n0"),
            sum(col("cp") * (lit(2L) * col("cumprev") + col("cnt") + 1L))
              .as("r2p"))
        val a = m.select(col("n1"), col("n0"),
          ((col("r2p") - col("n1") * (col("n1") + 1L)).cast("double") /
            (lit(2.0) * col("n1") * col("n0"))).as("auc"))
        a.select(col("n1").as("n_pos"), col("n0").as("n_neg"),
            round(col("auc"), 6).as("auc"),
            round(sqrt((col("auc") * (lit(1.0) - col("auc")) +
              (col("n1") - 1L) * (col("auc") / (lit(2.0) - col("auc")) -
                col("auc") * col("auc")) +
              (col("n0") - 1L) * (lit(2.0) * col("auc") * col("auc") /
                (lit(1.0) + col("auc")) - col("auc") * col("auc"))) /
              (col("n1").cast("double") * col("n0"))), 6).as("se"),
            round(col("auc") - lit(1.96) * sqrt((col("auc") *
              (lit(1.0) - col("auc")) +
              (col("n1") - 1L) * (col("auc") / (lit(2.0) - col("auc")) -
                col("auc") * col("auc")) +
              (col("n0") - 1L) * (lit(2.0) * col("auc") * col("auc") /
                (lit(1.0) + col("auc")) - col("auc") * col("auc"))) /
              (col("n1").cast("double") * col("n0"))), 6).as("ci_lower"),
            round(col("auc") + lit(1.96) * sqrt((col("auc") *
              (lit(1.0) - col("auc")) +
              (col("n1") - 1L) * (col("auc") / (lit(2.0) - col("auc")) -
                col("auc") * col("auc")) +
              (col("n0") - 1L) * (lit(2.0) * col("auc") * col("auc") /
                (lit(1.0) + col("auc")) - col("auc") * col("auc"))) /
              (col("n1").cast("double") * col("n0"))), 6).as("ci_upper"))
          .orderBy("n_pos")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |g AS (SELECT act, SUM(y) AS cp, SUM(1 - y) AS cn,
             |        COUNT(*) AS cnt FROM u GROUP BY 1),
             |g2 AS (SELECT act, cp, cn, cnt,
             |        COALESCE(SUM(cnt) OVER (ORDER BY act ROWS BETWEEN
             |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          AS cumprev
             |      FROM g),
             |m AS (SELECT SUM(cp) AS n1, SUM(cn) AS n0,
             |        SUM(cp * (2 * cumprev + cnt + 1)) AS r2p FROM g2),
             |a AS (SELECT n1, n0,
             |        CAST(r2p - n1 * (n1 + 1) AS DOUBLE) /
             |          (2.0 * n1 * n0) AS auc FROM m),
             |se AS (SELECT n1, n0, auc,
             |        sqrt((auc * (1.0 - auc) +
             |          (n1 - 1) * (auc / (2.0 - auc) - auc * auc) +
             |          (n0 - 1) * (2.0 * auc * auc / (1.0 + auc) -
             |            auc * auc)) / (CAST(n1 AS DOUBLE) * n0)) AS s
             |      FROM a)
             |SELECT CAST(n1 AS BIGINT) AS n_pos,
             |  CAST(n0 AS BIGINT) AS n_neg,
             |  round(auc, 6) AS auc, round(s, 6) AS se,
             |  round(auc - 1.96 * s, 6) AS ci_lower,
             |  round(auc + 1.96 * s, 6) AS ci_upper
             |FROM se ORDER BY n_pos""".stripMargin)),
    // Lognormal fit of inter-event gaps by ln-moments + decile
    // diagnostics (Aitchison & Brown 1957; heavy-tailed human
    // inter-event times per Barabási, Nature 2005 — the lognormal is
    // the null the burstiness debate tests against): μ̂, σ̂ from the
    // rounded-6 ln-gap DECIMAL sums, then each empirical gap decile
    // compared against the fitted exp(μ̂ + σ̂·z_q) with the nine
    // PUBLISHED standard-normal decile constants (no CDF inversion
    // needed). Gaps come from the x79 per-user lead window (user-
    // partitioned — the distributed-window shape); the decile grid is
    // ONE bounded percentile-array aggregate. log_ratio per decile is
    // the QQ-style read: flat ≈ lognormal holds, sloped = tail bends.
    QuerySpec(
      "x285_lognormal_gaps",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("nts", lead(col("ts"), 1).over(w))
          .where(col("nts").isNotNull)
          .select((unix_timestamp(col("nts")) -
            unix_timestamp(col("ts"))).as("g"))
          .filter(col("g") > 0)
          .select(col("g"), round(log(col("g").cast("double")), 6)
            .as("lg"))
          .localCheckpoint() // corpus-row-bounded gap table
        val mom = gap.agg(count(lit(1)).as("n"),
            sum(col("lg").cast("decimal(38,6)")).cast("double").as("s1"),
            sum(round(col("lg") * col("lg"), 6).cast("decimal(38,6)"))
              .cast("double").as("s2"))
          .select(col("n"),
            round(col("s1") / col("n"), 6).as("mu"),
            round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
              (col("n") - 1L)), 6).as("sigma"))
        val fr = (1 to 9).map(i => s"CAST($i AS DOUBLE) / 10")
          .mkString(", ")
        val q = gap.agg(expr(s"percentile(g, array($fr))").as("qs"))
        val zs = Seq(-1.2816, -0.8416, -0.5244, -0.2533, 0.0,
          0.2533, 0.5244, 0.8416, 1.2816)
        val zCol = (1 to 8).map(i =>
          when(col("decile") === i, lit(zs(i - 1))))
          .foldRight(lit(zs(8)): org.apache.spark.sql.Column)(
            (w, acc) => w.otherwise(acc))
        q.select(posexplode(col("qs")).as(Seq("pos", "qv")))
          .select((col("pos") + 1).cast("long").as("decile"),
            round(col("qv"), 6).as("empirical_s"))
          .crossJoin(broadcast(mom))
          .withColumn("z", zCol)
          .select(col("decile"), col("empirical_s"),
            round(exp(col("mu") + col("sigma") * col("z")), 6)
              .as("fitted_s"),
            round(log(round(col("empirical_s"), 6)) -
              (col("mu") + col("sigma") * col("z")), 6).as("log_ratio"),
            col("mu").as("mu_hat"), col("sigma").as("sigma_hat"))
          .orderBy("decile")
      },
      Some("""WITH sq AS (SELECT user_id, ts, event_id,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS nts
             |      FROM events),
             |gap AS (SELECT CAST(date_diff('second', ts, nts) AS BIGINT)
             |          AS g,
             |        round(ln(CAST(date_diff('second', ts, nts)
             |          AS DOUBLE)), 6) AS lg
             |      FROM sq WHERE nts IS NOT NULL
             |        AND date_diff('second', ts, nts) > 0),
             |mom AS (SELECT COUNT(*) AS n,
             |        round(CAST(SUM(CAST(lg AS DECIMAL(38,6)))
             |          AS DOUBLE) / COUNT(*), 6) AS mu,
             |        round(sqrt((CAST(SUM(CAST(round(lg * lg, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) -
             |          CAST(SUM(CAST(lg AS DECIMAL(38,6))) AS DOUBLE) *
             |          CAST(SUM(CAST(lg AS DECIMAL(38,6))) AS DOUBLE) /
             |          COUNT(*)) / (COUNT(*) - 1)), 6) AS sigma
             |      FROM gap),
             |q AS (SELECT quantile_cont(g,
             |        [CAST(1 AS DOUBLE) / 10, CAST(2 AS DOUBLE) / 10,
             |         CAST(3 AS DOUBLE) / 10, CAST(4 AS DOUBLE) / 10,
             |         CAST(5 AS DOUBLE) / 10, CAST(6 AS DOUBLE) / 10,
             |         CAST(7 AS DOUBLE) / 10, CAST(8 AS DOUBLE) / 10,
             |         CAST(9 AS DOUBLE) / 10]) AS qs FROM gap),
             |d AS (SELECT g.i AS decile, round(qs[g.i], 6)
             |          AS empirical_s
             |      FROM q CROSS JOIN (SELECT CAST(unnest(range(1, 10))
             |        AS INT) AS i) g),
             |z AS (SELECT decile, empirical_s,
             |        CASE decile WHEN 1 THEN -1.2816 WHEN 2 THEN -0.8416
             |          WHEN 3 THEN -0.5244 WHEN 4 THEN -0.2533
             |          WHEN 5 THEN 0.0 WHEN 6 THEN 0.2533
             |          WHEN 7 THEN 0.5244 WHEN 8 THEN 0.8416
             |          ELSE 1.2816 END AS z
             |      FROM d)
             |SELECT CAST(z.decile AS BIGINT) AS decile, z.empirical_s,
             |  round(exp(mom.mu + mom.sigma * z.z), 6) AS fitted_s,
             |  round(ln(round(z.empirical_s, 6)) -
             |    (mom.mu + mom.sigma * z.z), 6) AS log_ratio,
             |  mom.mu AS mu_hat, mom.sigma AS sigma_hat
             |FROM z CROSS JOIN mom ORDER BY decile""".stripMargin)),
    // 2×2 risk panel (Katz et al. 1978 for the ln-RR CI; Woolf 1955
    // for the ln-OR CI; Altman's BMJ statistics notes for NNT): the
    // epidemiology-standard effect battery on arm × high-value
    // conversion — risk ratio, odds ratio, absolute risk difference
    // and NNT, EACH with its 95% CI. x133 tests means, x253 sizes
    // them; for BINARY outcomes this panel is what a decision memo
    // quotes. Four exact-BIGINT cells from one user-grid pass; the
    // ln-scale CIs exponentiate at the end (ln of exact-rational
    // arguments rounded 6 — the x262 discipline).
    QuerySpec(
      "x286_risk_panel",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg((max(col("user_id")) % 2).as("t"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
        val c = u.agg(
          sum(col("t") * col("y")).as("a"),
          sum(col("t") * (lit(1L) - col("y"))).as("b"),
          sum((lit(1L) - col("t")) * col("y")).as("cc"),
          sum((lit(1L) - col("t")) * (lit(1L) - col("y"))).as("d"))
        val p = c.select(col("a"), col("b"), col("cc"), col("d"),
          (col("a") + col("b")).as("n1"), (col("cc") + col("d")).as("n0"))
        val e = p.select(col("a"), col("b"), col("cc"), col("d"),
          col("n1"), col("n0"),
          (col("a").cast("double") / col("n1")).as("p1"),
          (col("cc").cast("double") / col("n0")).as("p0"),
          round(log(round(col("a").cast("double") * col("n0") /
            (col("cc") * col("n1")), 6)), 6).as("lrr"),
          round(sqrt(lit(1.0) / col("a") - lit(1.0) / col("n1") +
            lit(1.0) / col("cc") - lit(1.0) / col("n0")), 6).as("serr"),
          round(log(round(col("a").cast("double") * col("d") /
            (col("b") * col("cc")), 6)), 6).as("lor"),
          round(sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
            lit(1.0) / col("cc") + lit(1.0) / col("d")), 6).as("seor"))
        e.select(col("a").as("conv_treat"), col("cc").as("conv_ctrl"),
            col("n1"), col("n0"),
            round(col("p1") - col("p0"), 6).as("risk_diff"),
            round(exp(col("lrr")), 6).as("risk_ratio"),
            round(exp(col("lrr") - lit(1.96) * col("serr")), 6)
              .as("rr_ci_lower"),
            round(exp(col("lrr") + lit(1.96) * col("serr")), 6)
              .as("rr_ci_upper"),
            round(exp(col("lor")), 6).as("odds_ratio"),
            round(exp(col("lor") - lit(1.96) * col("seor")), 6)
              .as("or_ci_lower"),
            round(exp(col("lor") + lit(1.96) * col("seor")), 6)
              .as("or_ci_upper"),
            when(abs(col("p1") - col("p0")) > 0,
              round(lit(1.0) / abs(col("p1") - col("p0")), 6))
              .otherwise(lit(0.0)).as("nnt"))
          .orderBy("n1")
      },
      Some("""WITH u AS (SELECT user_id, user_id % 2 AS t,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |c AS (SELECT SUM(t * y) AS a, SUM(t * (1 - y)) AS b,
             |        SUM((1 - t) * y) AS cc,
             |        SUM((1 - t) * (1 - y)) AS d
             |      FROM u),
             |p AS (SELECT a, b, cc, d, a + b AS n1, cc + d AS n0
             |      FROM c),
             |e AS (SELECT a, b, cc, d, n1, n0,
             |        CAST(a AS DOUBLE) / n1 AS p1,
             |        CAST(cc AS DOUBLE) / n0 AS p0,
             |        round(ln(round(CAST(a AS DOUBLE) * n0 /
             |          (cc * n1), 6)), 6) AS lrr,
             |        round(sqrt(1.0 / a - 1.0 / n1 + 1.0 / cc -
             |          1.0 / n0), 6) AS serr,
             |        round(ln(round(CAST(a AS DOUBLE) * d /
             |          (b * cc), 6)), 6) AS lor,
             |        round(sqrt(1.0 / a + 1.0 / b + 1.0 / cc +
             |          1.0 / d), 6) AS seor
             |      FROM p)
             |SELECT CAST(a AS BIGINT) AS conv_treat,
             |  CAST(cc AS BIGINT) AS conv_ctrl,
             |  CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
             |  round(p1 - p0, 6) AS risk_diff,
             |  round(exp(lrr), 6) AS risk_ratio,
             |  round(exp(lrr - 1.96 * serr), 6) AS rr_ci_lower,
             |  round(exp(lrr + 1.96 * serr), 6) AS rr_ci_upper,
             |  round(exp(lor), 6) AS odds_ratio,
             |  round(exp(lor - 1.96 * seor), 6) AS or_ci_lower,
             |  round(exp(lor + 1.96 * seor), 6) AS or_ci_upper,
             |  CASE WHEN abs(p1 - p0) > 0
             |    THEN round(1.0 / abs(p1 - p0), 6) ELSE 0.0 END AS nnt
             |FROM e ORDER BY n1""".stripMargin)),
    // Univariate feature screen (the "filter method" of feature
    // selection — Guyon & Elisseeff, JMLR 2003 §2): per-feature AUC
    // against the high-value label for four behavioral features,
    // computed in ONE pass by MELTING the user grid into (feature,
    // value) rows and running the x135 integer midrank device
    // partitioned by feature — the screen every modeling pipeline
    // runs before x121/x150 fit anything. |auc − 0.5| ranks the
    // features; direction says which way the signal points. Windows
    // partition by feature over value-bounded grids.
    QuerySpec(
      "x287_univariate_screen",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            sum(expr("CAST(round(value * 100) AS BIGINT)") *
              when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("spend"),
            countDistinct(to_date(col("ts"))).as("days"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("errors"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
        val melt = u.select(col("y"), explode(array(
            struct(lit("1_activity").as("feature"), col("act").as("v")),
            struct(lit("2_spend_cents").as("feature"),
              col("spend").as("v")),
            struct(lit("3_active_days").as("feature"),
              col("days").as("v")),
            struct(lit("4_errors").as("feature"), col("errors").as("v"))))
            .as("f"))
          .select(col("f.feature").as("feature"), col("f.v").as("v"),
            col("y"))
        val grid = melt.groupBy("feature", "v")
          .agg(sum(col("y")).as("cp"), sum(lit(1L) - col("y")).as("cn"))
          .withColumn("cnt", col("cp") + col("cn"))
        val wc = W.partitionBy("feature").orderBy("v")
          .rowsBetween(W.unboundedPreceding, -1)
        grid.withColumn("cumprev",
            coalesce(sum(col("cnt")).over(wc), lit(0L)))
          .groupBy("feature")
          .agg(sum(col("cp")).as("n1"), sum(col("cn")).as("n0"),
            sum(col("cp") * (lit(2L) * col("cumprev") + col("cnt") + 1L))
              .as("r2p"))
          .select(col("feature"),
            round((col("r2p") - col("n1") * (col("n1") + 1L))
              .cast("double") / (lit(2.0) * col("n1") * col("n0")), 6)
              .as("auc"))
          .select(col("feature"), col("auc"),
            round(abs(col("auc") - 0.5), 6).as("separation"),
            when(col("auc") >= 0.5, "positive").otherwise("negative")
              .as("direction"))
          .orderBy("feature")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS spend,
             |        COUNT(DISTINCT CAST(ts AS DATE)) AS days,
             |        SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
             |          END) AS errors,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |melt AS (SELECT '1_activity' AS feature, act AS v, y FROM u
             |      UNION ALL SELECT '2_spend_cents', spend, y FROM u
             |      UNION ALL SELECT '3_active_days', days, y FROM u
             |      UNION ALL SELECT '4_errors', errors, y FROM u),
             |grid AS (SELECT feature, v, SUM(y) AS cp,
             |        SUM(1 - y) AS cn, COUNT(*) AS cnt
             |      FROM melt GROUP BY 1, 2),
             |g2 AS (SELECT feature, v, cp, cn, cnt,
             |        COALESCE(SUM(cnt) OVER (PARTITION BY feature
             |          ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
             |          1 PRECEDING), 0) AS cumprev
             |      FROM grid),
             |m AS (SELECT feature, SUM(cp) AS n1, SUM(cn) AS n0,
             |        SUM(cp * (2 * cumprev + cnt + 1)) AS r2p
             |      FROM g2 GROUP BY 1),
             |a AS (SELECT feature,
             |        round(CAST(r2p - n1 * (n1 + 1) AS DOUBLE) /
             |          (2.0 * n1 * n0), 6) AS auc FROM m)
             |SELECT feature, auc,
             |  round(abs(auc - 0.5), 6) AS separation,
             |  CASE WHEN auc >= 0.5 THEN 'positive' ELSE 'negative' END
             |    AS direction
             |FROM a ORDER BY feature""".stripMargin)),
    // Page's trend test (Page, JASA 1963): is daily volume trending
    // MONOTONICALLY across the weeks, judged within day-of-week
    // blocks — the ordered-alternative companion to x248's Friedman
    // (Friedman asks "do the treatments differ AT ALL"; Page asks
    // "do they increase in the stated order", which is strictly more
    // powerful when trend is the hypothesis; Mann-Kendall x177 tests
    // the raw series, Page blocks out the weekly seasonality first).
    // L = Σ_j j·R_j over week-ranks within each dow block (midranks
    // as exact halves — the x248 device, ×2 integers throughout),
    // z = (L − μ_L)/σ_L with the standard moments; only COMPLETE
    // weeks enter so every block ranks the same k treatments.
    QuerySpec(
      "x288_page_trend",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val d0 = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .select(col("day"), col("n"),
            expr("CAST(floor(datediff(day, DATE '1970-01-01') / 7) AS BIGINT)")
              .as("week"),
            expr("datediff(day, DATE '1970-01-01') % 7").cast("long")
              .as("dow"))
        val fullWeeks = d0.groupBy("week")
          .agg(count(lit(1)).as("ndays")).filter(col("ndays") === 7)
          .select(col("week"))
        val d = d0.join(broadcast(fullWeeks), "week")
          .localCheckpoint() // |complete days| rows
        val wr = W.partitionBy("dow")
        val ranked = d
          .withColumn("lt", count(lit(1)).over(
            wr.orderBy("n").rangeBetween(W.unboundedPreceding, -1)))
          .withColumn("eq", count(lit(1)).over(
            wr.orderBy("n").rangeBetween(0, 0)))
          .select(col("dow"), col("week"),
            (lit(2L) * col("lt") + col("eq") + 1L).as("r2"))
        val k = d.select(countDistinct(col("week")).as("k"))
        val nb = d.select(countDistinct(col("dow")).as("nb"))
        val lsum = ranked
          .join(broadcast(d.select(col("week")).distinct()
            .withColumn("j", row_number().over(W.orderBy("week"))
              .cast("long"))), "week")
          .agg(sum(col("j") * col("r2")).as("l2"))
        lsum.crossJoin(broadcast(k)).crossJoin(broadcast(nb))
          .select(col("k").as("k_weeks"), col("nb").as("n_blocks"),
            (col("l2").cast("double") / 2).as("l"),
            (col("nb").cast("double") * col("k") *
              (col("k") + 1L) * (col("k") + 1L) / 4).as("mu"),
            sqrt(col("nb").cast("double") * col("k") * col("k") *
              (col("k") + 1L) * (col("k") * col("k") - 1L) / 144)
              .as("sd"))
          .select(col("k_weeks"), col("n_blocks"),
            round(col("l"), 6).as("page_l"),
            round((col("l") - col("mu")) / col("sd"), 6).as("z"),
            (abs((col("l") - col("mu")) / col("sd")) > 1.96)
              .cast("long").as("reject_05"))
          .orderBy("k_weeks")
      },
      Some("""WITH d0 AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             |        CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) // 7 AS BIGINT) AS week,
             |        CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) % 7 AS BIGINT) AS dow
             |      FROM events GROUP BY 1, 3, 4),
             |fw AS (SELECT week FROM d0 GROUP BY 1
             |      HAVING COUNT(*) = 7),
             |d AS (SELECT d0.* FROM d0 JOIN fw USING (week)),
             |rk AS (SELECT dow, week,
             |        2 * (SELECT COUNT(*) FROM d b WHERE b.dow = d.dow
             |          AND b.n < d.n) +
             |        (SELECT COUNT(*) FROM d b WHERE b.dow = d.dow
             |          AND b.n = d.n) + 1 AS r2
             |      FROM d),
             |wj AS (SELECT week, row_number() OVER (ORDER BY week)
             |          AS j
             |      FROM (SELECT DISTINCT week FROM d)),
             |ls AS (SELECT SUM(wj.j * rk.r2) AS l2 FROM rk
             |      JOIN wj USING (week)),
             |kk AS (SELECT COUNT(DISTINCT week) AS k,
             |        COUNT(DISTINCT dow) AS nb FROM d),
             |st AS (SELECT kk.k, kk.nb,
             |        CAST(ls.l2 AS DOUBLE) / 2 AS l,
             |        CAST(kk.nb AS DOUBLE) * kk.k * (kk.k + 1) *
             |          (kk.k + 1) / 4 AS mu,
             |        sqrt(CAST(kk.nb AS DOUBLE) * kk.k * kk.k *
             |          (kk.k + 1) * (kk.k * kk.k - 1) / 144) AS sd
             |      FROM ls CROSS JOIN kk)
             |SELECT CAST(k AS BIGINT) AS k_weeks,
             |  CAST(nb AS BIGINT) AS n_blocks,
             |  round(l, 6) AS page_l,
             |  round((l - mu) / sd, 6) AS z,
             |  CAST(abs((l - mu) / sd) > 1.96 AS BIGINT) AS reject_05
             |FROM st ORDER BY k_weeks""".stripMargin)),
    // DeLong test for two CORRELATED AUCs (DeLong, DeLong &
    // Clarke-Pearson, Biometrics 1988): does the activity feature
    // rank high-value users better than the spend feature — computed
    // on the SAME users, so the AUC difference needs the placement
    // covariance the x284 Hanley-McNeil SE cannot provide (comparing
    // two models with independent CIs double-counts shared variance,
    // the classic mistake). Per-user placements V₁₀/V₀₁ come from the
    // combined (feature, value) grid's cumulative class counts —
    // value-bounded windows partitioned by feature, then one user-
    // keyed join pairs the two features' placements for the
    // covariance; all moments ride rounded-9 DECIMAL sums.
    QuerySpec(
      "x289_delong",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("spend"),
            when(sum(when(col("event_type") === "purchase" &&
              col("value") > 90.0, 1L).otherwise(0L)) >= 2, 1L)
              .otherwise(0L).as("y"))
          .localCheckpoint() // one user grid feeds both features
        val melt = u.select(col("user_id"), col("y"), explode(array(
            struct(lit("act").as("f"), col("act").as("v")),
            struct(lit("spend").as("f"), col("spend").as("v")))).as("m"))
          .select(col("user_id"), col("y"), col("m.f").as("f"),
            col("m.v").as("v"))
        val grid = melt.groupBy("f", "v")
          .agg(sum(col("y")).as("cp"), sum(lit(1L) - col("y")).as("cn"))
        val wc = W.partitionBy("f").orderBy("v")
          .rowsBetween(W.unboundedPreceding, -1)
        val g2 = grid
          .withColumn("cumn", coalesce(sum(col("cn")).over(wc), lit(0L)))
          .withColumn("cump", coalesce(sum(col("cp")).over(wc), lit(0L)))
        val tot = grid.groupBy("f")
          .agg(sum(col("cp")).as("n1"), sum(col("cn")).as("n0"))
        val pl = melt.join(g2, Seq("f", "v")).join(broadcast(tot), "f")
          .select(col("user_id"), col("y"), col("f"),
            round((col("cumn").cast("double") +
              col("cn").cast("double") / 2) / col("n0"), 9).as("v10"),
            round((col("n1").cast("double") - col("cump") - col("cp") +
              col("cp").cast("double") / 2) / col("n1"), 9).as("v01"))
        val pv = pl.groupBy("user_id", "y").pivot("f",
            Seq("act", "spend"))
          .agg(first(when(col("y") === 1, col("v10"))
            .otherwise(col("v01"))).as("pl"))
          .select(col("y"), col("act").as("p1"), col("spend").as("p2"))
        def mo(cls: Int, tag: String) = pv.filter(col("y") === cls)
          .agg(count(lit(1)).as(s"n$tag"),
            sum(col("p1").cast("decimal(38,9)")).cast("double")
              .as(s"s1$tag"),
            sum(col("p2").cast("decimal(38,9)")).cast("double")
              .as(s"s2$tag"),
            sum(round(col("p1") * col("p1"), 9).cast("decimal(38,9)"))
              .cast("double").as(s"q1$tag"),
            sum(round(col("p2") * col("p2"), 9).cast("decimal(38,9)"))
              .cast("double").as(s"q2$tag"),
            sum(round(col("p1") * col("p2"), 9).cast("decimal(38,9)"))
              .cast("double").as(s"x$tag"))
        val mp = mo(1, "p")
        val mn = mo(0, "n")
        mp.crossJoin(broadcast(mn))
          .select(col("np").as("n_pos"), col("nn").as("n_neg"),
            round(col("s1p") / col("np"), 6).as("auc_act"),
            round(col("s2p") / col("np"), 6).as("auc_spend"),
            round((col("s1p") - col("s2p")) / col("np"), 6).as("diff"),
            round(((col("q1p") - col("s1p") * col("s1p") / col("np")) /
              (col("np") - 1L) +
              (col("q2p") - col("s2p") * col("s2p") / col("np")) /
                (col("np") - 1L) -
              lit(2.0) * (col("xp") - col("s1p") * col("s2p") /
                col("np")) / (col("np") - 1L)) / col("np") +
              ((col("q1n") - col("s1n") * col("s1n") / col("nn")) /
                (col("nn") - 1L) +
                (col("q2n") - col("s2n") * col("s2n") / col("nn")) /
                  (col("nn") - 1L) -
                lit(2.0) * (col("xn") - col("s1n") * col("s2n") /
                  col("nn")) / (col("nn") - 1L)) / col("nn"), 9)
              .as("var_diff"))
          .select(col("n_pos"), col("n_neg"), col("auc_act"),
            col("auc_spend"), col("diff"),
            when(col("var_diff") > 0,
              round(col("diff") / sqrt(col("var_diff")), 6))
              .otherwise(lit(0.0)).as("z"),
            (col("var_diff") > 0 &&
              abs(col("diff") / sqrt(col("var_diff"))) > 1.96)
              .cast("long").as("reject_05"))
          .orderBy("n_pos")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS act,
             |        SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS spend,
             |        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
             |            AND value > 90.0 THEN 1 ELSE 0 END) >= 2
             |          THEN 1 ELSE 0 END AS y
             |      FROM events GROUP BY 1),
             |melt AS (SELECT user_id, y, 'act' AS f, act AS v FROM u
             |      UNION ALL SELECT user_id, y, 'spend', spend FROM u),
             |grid AS (SELECT f, v, SUM(y) AS cp, SUM(1 - y) AS cn
             |      FROM melt GROUP BY 1, 2),
             |g2 AS (SELECT f, v, cp, cn,
             |        COALESCE(SUM(cn) OVER w, 0) AS cumn,
             |        COALESCE(SUM(cp) OVER w, 0) AS cump
             |      FROM grid
             |      WINDOW w AS (PARTITION BY f ORDER BY v ROWS BETWEEN
             |        UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |tot AS (SELECT f, SUM(cp) AS n1, SUM(cn) AS n0 FROM grid
             |      GROUP BY 1),
             |pl AS (SELECT m.user_id, m.y, m.f,
             |        round((CAST(g2.cumn AS DOUBLE) +
             |          CAST(g2.cn AS DOUBLE) / 2) / tot.n0, 9) AS v10,
             |        round((CAST(tot.n1 AS DOUBLE) - g2.cump - g2.cp +
             |          CAST(g2.cp AS DOUBLE) / 2) / tot.n1, 9) AS v01
             |      FROM melt m JOIN g2 ON g2.f = m.f AND g2.v = m.v
             |      JOIN tot ON tot.f = m.f),
             |pv AS (SELECT user_id, y,
             |        MAX(CASE WHEN f = 'act' THEN
             |          CASE WHEN y = 1 THEN v10 ELSE v01 END END) AS p1,
             |        MAX(CASE WHEN f = 'spend' THEN
             |          CASE WHEN y = 1 THEN v10 ELSE v01 END END) AS p2
             |      FROM pl GROUP BY 1, 2),
             |mp AS (SELECT COUNT(*) AS np,
             |        CAST(SUM(CAST(p1 AS DECIMAL(38,9))) AS DOUBLE)
             |          AS s1p,
             |        CAST(SUM(CAST(p2 AS DECIMAL(38,9))) AS DOUBLE)
             |          AS s2p,
             |        CAST(SUM(CAST(round(p1 * p1, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS q1p,
             |        CAST(SUM(CAST(round(p2 * p2, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS q2p,
             |        CAST(SUM(CAST(round(p1 * p2, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS xp
             |      FROM pv WHERE y = 1),
             |mn AS (SELECT COUNT(*) AS nn,
             |        CAST(SUM(CAST(p1 AS DECIMAL(38,9))) AS DOUBLE)
             |          AS s1n,
             |        CAST(SUM(CAST(p2 AS DECIMAL(38,9))) AS DOUBLE)
             |          AS s2n,
             |        CAST(SUM(CAST(round(p1 * p1, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS q1n,
             |        CAST(SUM(CAST(round(p2 * p2, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS q2n,
             |        CAST(SUM(CAST(round(p1 * p2, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS xn
             |      FROM pv WHERE y = 0),
             |vd AS (SELECT np, nn,
             |        s1p / np AS a1, s2p / np AS a2,
             |        (s1p - s2p) / np AS diff,
             |        ((q1p - s1p * s1p / np) / (np - 1) +
             |         (q2p - s2p * s2p / np) / (np - 1) -
             |         2.0 * (xp - s1p * s2p / np) / (np - 1)) / np +
             |        ((q1n - s1n * s1n / nn) / (nn - 1) +
             |         (q2n - s2n * s2n / nn) / (nn - 1) -
             |         2.0 * (xn - s1n * s2n / nn) / (nn - 1)) / nn
             |          AS v
             |      FROM mp CROSS JOIN mn)
             |SELECT CAST(np AS BIGINT) AS n_pos,
             |  CAST(nn AS BIGINT) AS n_neg,
             |  round(a1, 6) AS auc_act, round(a2, 6) AS auc_spend,
             |  round(diff, 6) AS diff,
             |  CASE WHEN round(v, 9) > 0
             |    THEN round(round(diff, 6) / sqrt(round(v, 9)), 6)
             |    ELSE 0.0 END AS z,
             |  CAST(round(v, 9) > 0 AND
             |    abs(round(diff, 6) / sqrt(round(v, 9))) > 1.96
             |    AS BIGINT) AS reject_05
             |FROM vd ORDER BY n_pos""".stripMargin)),
    // Weibull fit by median-rank regression (Weibull 1951; the
    // median-rank plotting position (i−0.3)/(n+0.4) is Benard's
    // approximation, the reliability-engineering standard): shape and
    // scale of the inter-event gap distribution — the PARAMETRIC
    // survival fit between x124's nonparametric KM and x285's
    // lognormal alternative (Weibull shape <1 = bursty/clumped
    // arrivals, =1 = memoryless, >1 = regularizing — THE
    // inter-arrival diagnostic). Ranks come from the distinct-gap
    // grid's cumulative counts (midranks — value-bounded windows, the
    // x135 device); ln(−ln(1−F)) on rounded-6 arguments; the
    // count-weighted OLS runs on exact-rounded DECIMAL sums, R²
    // rides along as the fit-quality read.
    QuerySpec(
      "x291_weibull_fit",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("nts", lead(col("ts"), 1).over(w))
          .where(col("nts").isNotNull)
          .select((unix_timestamp(col("nts")) -
            unix_timestamp(col("ts"))).as("g"))
          .filter(col("g") > 0)
        val grid = gap.groupBy("g").agg(count(lit(1)).as("cnt"))
        val tot = grid.agg(sum(col("cnt")).as("n"))
        val wc = W.orderBy("g").rowsBetween(W.unboundedPreceding, -1)
        val pts = grid
          .withColumn("cumprev", coalesce(sum(col("cnt")).over(wc),
            lit(0L)))
          .crossJoin(broadcast(tot))
          .select(col("cnt"),
            round(log(col("g").cast("double")), 6).as("x"),
            round(log(-log(lit(1.0) -
              round(((col("cumprev").cast("double") +
                col("cnt").cast("double") / 2) - 0.3) /
                (col("n").cast("double") + 0.4), 9))), 6).as("yv"))
        val m = pts.agg(sum(col("cnt")).as("sw"),
          sum(round(col("cnt") * col("x"), 6).cast("decimal(38,6)"))
            .cast("double").as("sx"),
          sum(round(col("cnt") * col("yv"), 6).cast("decimal(38,6)"))
            .cast("double").as("sy"),
          sum(round(col("cnt") * col("x") * col("x"), 6)
            .cast("decimal(38,6)")).cast("double").as("sxx"),
          sum(round(col("cnt") * col("x") * col("yv"), 6)
            .cast("decimal(38,6)")).cast("double").as("sxy"),
          sum(round(col("cnt") * col("yv") * col("yv"), 6)
            .cast("decimal(38,6)")).cast("double").as("syy"))
        val fit = m.select(col("sw"),
          ((col("sw") * col("sxy") - col("sx") * col("sy")) /
            (col("sw") * col("sxx") - col("sx") * col("sx")))
            .as("shape"),
          ((col("sy") - (col("sw") * col("sxy") - col("sx") *
            col("sy")) / (col("sw") * col("sxx") - col("sx") *
            col("sx")) * col("sx")) / col("sw")).as("icept"),
          (((col("sw") * col("sxy") - col("sx") * col("sy")) *
            (col("sw") * col("sxy") - col("sx") * col("sy"))) /
            ((col("sw") * col("sxx") - col("sx") * col("sx")) *
              (col("sw") * col("syy") - col("sy") * col("sy"))))
            .as("r2"))
        fit.select(col("sw").as("n_gaps"),
            round(col("shape"), 6).as("shape_k"),
            round(exp(-col("icept") / col("shape")), 6)
              .as("scale_seconds"),
            round(col("r2"), 6).as("r_squared"),
            when(col("shape") < 0.95, "bursty (k<1)")
              .when(col("shape") > 1.05, "regular (k>1)")
              .otherwise("memoryless (k~1)").as("regime"))
          .orderBy("n_gaps")
      },
      Some("""WITH sq AS (SELECT user_id, ts, event_id,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS nts
             |      FROM events),
             |gap AS (SELECT CAST(date_diff('second', ts, nts) AS BIGINT)
             |          AS g
             |      FROM sq WHERE nts IS NOT NULL
             |        AND date_diff('second', ts, nts) > 0),
             |grid AS (SELECT g, COUNT(*) AS cnt FROM gap GROUP BY 1),
             |tot AS (SELECT SUM(cnt) AS n FROM grid),
             |pts AS (SELECT cnt,
             |        round(ln(CAST(g AS DOUBLE)), 6) AS x,
             |        round(ln(-ln(1.0 -
             |          round(((COALESCE(SUM(cnt) OVER (ORDER BY g ROWS
             |            BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |            0) + CAST(cnt AS DOUBLE) / 2) - 0.3) /
             |            (CAST(tot.n AS DOUBLE) + 0.4), 9))), 6) AS yv
             |      FROM grid CROSS JOIN tot),
             |m AS (SELECT SUM(cnt) AS sw,
             |        CAST(SUM(CAST(round(cnt * x, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(round(cnt * yv, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(round(cnt * x * x, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             |        CAST(SUM(CAST(round(cnt * x * yv, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             |        CAST(SUM(CAST(round(cnt * yv * yv, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS syy
             |      FROM pts),
             |fit AS (SELECT sw,
             |        (sw * sxy - sx * sy) / (sw * sxx - sx * sx)
             |          AS shape,
             |        (sy - (sw * sxy - sx * sy) /
             |          (sw * sxx - sx * sx) * sx) / sw AS icept,
             |        ((sw * sxy - sx * sy) * (sw * sxy - sx * sy)) /
             |          ((sw * sxx - sx * sx) * (sw * syy - sy * sy))
             |          AS r2
             |      FROM m)
             |SELECT CAST(sw AS BIGINT) AS n_gaps,
             |  round(shape, 6) AS shape_k,
             |  round(exp(-icept / shape), 6) AS scale_seconds,
             |  round(r2, 6) AS r_squared,
             |  CASE WHEN shape < 0.95 THEN 'bursty (k<1)'
             |    WHEN shape > 1.05 THEN 'regular (k>1)'
             |    ELSE 'memoryless (k~1)' END AS regime
             |FROM fit ORDER BY n_gaps""".stripMargin)),
    // Circular statistics of event time-of-day (Fisher, "Statistical
    // Analysis of Circular Data" 1993; Rayleigh 1880 for the
    // uniformity test): the mean activity direction and concentration
    // on the 24 h CLOCK — x136's day-of-week profile bins linearly and
    // can't say "activity concentrates at 14:37"; hours are a circle,
    // so 23:50 and 00:10 must average to midnight, not noon. Per
    // event-type: θ = 2π·(second of day)/86400, mean direction
    // atan2(ΣS, ΣC) mapped back to a clock time, resultant length R̄,
    // and the Rayleigh z = nR̄² with its standard p ≈ e^{−z}
    // (documented large-n approximation — no lookup table needed).
    // Per-row cos/sin round 6 into DECIMAL sums; one corpus pass.
    QuerySpec(
      "x292_circular_stats",
      (s, dir) => {
        val sod = (unix_timestamp(col("ts")) % 86400L).cast("double")
        val theta = sod * (2.0 * math.Pi / 86400.0)
        val m = Tables.events(s, dir)
          .select(col("event_type"),
            round(cos(theta), 6).as("c"), round(sin(theta), 6).as("sn"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("c").cast("decimal(38,6)")).cast("double").as("sc"),
            sum(col("sn").cast("decimal(38,6)")).cast("double").as("ss"))
        m.select(col("event_type"), col("n"),
            round((atan2(col("ss"), col("sc")) / (2.0 * math.Pi) * 24.0
              + 24.0) % 24.0, 4).as("mean_hour"),
            round(sqrt(col("sc") * col("sc") + col("ss") * col("ss")) /
              col("n"), 6).as("resultant_r"),
            round(col("n") * (col("sc") * col("sc") + col("ss") *
              col("ss")) / (col("n").cast("double") * col("n")), 6)
              .as("rayleigh_z"),
            round(exp(-(col("sc") * col("sc") + col("ss") * col("ss")) /
              col("n")), 6).as("p_approx"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |        round(cos(CAST(CAST(floor(epoch(ts)) AS BIGINT)
             |          % 86400 AS DOUBLE) * (2 * pi() / 86400)), 6)
             |          AS c,
             |        round(sin(CAST(CAST(floor(epoch(ts)) AS BIGINT)
             |          % 86400 AS DOUBLE) * (2 * pi() / 86400)), 6)
             |          AS sn
             |      FROM events),
             |m AS (SELECT event_type, COUNT(*) AS n,
             |        CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE)
             |          AS sc,
             |        CAST(SUM(CAST(sn AS DECIMAL(38,6))) AS DOUBLE)
             |          AS ss
             |      FROM e GROUP BY 1)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |  round((atan2(ss, sc) / (2 * pi()) * 24.0 + 24.0) % 24.0,
             |    4) AS mean_hour,
             |  round(sqrt(sc * sc + ss * ss) / n, 6) AS resultant_r,
             |  round(n * (sc * sc + ss * ss) /
             |    (CAST(n AS DOUBLE) * n), 6) AS rayleigh_z,
             |  round(exp(-(sc * sc + ss * ss) / n), 6) AS p_approx
             |FROM m ORDER BY event_type""".stripMargin)),
    // Session-threshold sensitivity curve (Ortiz-Cordova & Jansen
    // 2012; the "30-minute timeout" every analytics stack hardcodes —
    // this query shows what that choice COSTS): for eight candidate
    // inactivity thresholds at once, the session count, sessions per
    // user and share of gaps broken — the parameter-sensitivity read
    // behind q38/EventsStream's single fixed sessionization. ONE pass:
    // each gap row-locally bins into the 8-threshold ladder (the
    // decile-assignment device), the cumulative-from-above window
    // runs over the 9-row bucket histogram, and sessions(t) =
    // n_users + #gaps > t by the split-count identity.
    QuerySpec(
      "x294_session_sensitivity",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy("user_id").orderBy("ts", "event_id")
        val thr = Seq(60L, 300L, 900L, 1800L, 3600L, 7200L, 14400L,
          28800L)
        val gap = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("nts", lead(col("ts"), 1).over(w))
          .where(col("nts").isNotNull)
          .select((unix_timestamp(col("nts")) -
            unix_timestamp(col("ts"))).as("g"))
        val binned = gap.select(
          thr.map(t => (col("g") > t).cast("long")).reduce(_ + _)
            .as("b"))
          .groupBy("b").agg(count(lit(1)).as("cnt"))
        val nu = Tables.events(s, dir)
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
        val grid = broadcast(s.createDataFrame(
          thr.zipWithIndex.map { case (t, i) => (i.toLong, t) })
          .toDF("i", "threshold_s"))
        val wc = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
        val above = binned
          .withColumn("cumle", sum(col("cnt")).over(wc))
          .crossJoin(broadcast(gap.agg(count(lit(1)).as("ng"))))
          .select(col("b"), (col("ng") - col("cumle")).as("n_above"),
            col("ng"))
        grid.join(above, col("i") === col("b"), "left")
          .crossJoin(broadcast(nu))
          .select(col("threshold_s"),
            coalesce(col("n_above"), lit(0L)).as("gaps_broken"),
            (col("n_users") + coalesce(col("n_above"), lit(0L)))
              .as("n_sessions"),
            round((col("n_users") + coalesce(col("n_above"), lit(0L)))
              .cast("double") / col("n_users"), 6)
              .as("sessions_per_user"),
            round(coalesce(col("n_above"), lit(0L)).cast("double") /
              coalesce(col("ng"), lit(1L)), 6).as("share_gaps_broken"))
          .orderBy("threshold_s")
      },
      Some("""WITH sq AS (SELECT user_id, ts, event_id,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS nts
             |      FROM events),
             |gap AS (SELECT CAST(date_diff('second', ts, nts) AS BIGINT)
             |          AS g
             |      FROM sq WHERE nts IS NOT NULL),
             |binned AS (SELECT
             |        CAST(g > 60 AS BIGINT) + CAST(g > 300 AS BIGINT) +
             |        CAST(g > 900 AS BIGINT) + CAST(g > 1800 AS BIGINT)
             |        + CAST(g > 3600 AS BIGINT) +
             |        CAST(g > 7200 AS BIGINT) +
             |        CAST(g > 14400 AS BIGINT) +
             |        CAST(g > 28800 AS BIGINT) AS b,
             |        COUNT(*) AS cnt
             |      FROM gap GROUP BY 1),
             |ng AS (SELECT COUNT(*) AS ng FROM gap),
             |nu AS (SELECT COUNT(DISTINCT user_id) AS n_users
             |      FROM events),
             |above AS (SELECT b,
             |        ng.ng - SUM(cnt) OVER (ORDER BY b ROWS BETWEEN
             |          UNBOUNDED PRECEDING AND CURRENT ROW) AS n_above,
             |        ng.ng
             |      FROM binned CROSS JOIN ng),
             |grid AS (SELECT * FROM (VALUES (0, 60), (1, 300),
             |        (2, 900), (3, 1800), (4, 3600), (5, 7200),
             |        (6, 14400), (7, 28800)) t(i, threshold_s))
             |SELECT CAST(grid.threshold_s AS BIGINT) AS threshold_s,
             |  CAST(COALESCE(above.n_above, 0) AS BIGINT)
             |    AS gaps_broken,
             |  CAST(nu.n_users + COALESCE(above.n_above, 0) AS BIGINT)
             |    AS n_sessions,
             |  round(CAST(nu.n_users + COALESCE(above.n_above, 0)
             |    AS DOUBLE) / nu.n_users, 6) AS sessions_per_user,
             |  round(CAST(COALESCE(above.n_above, 0) AS DOUBLE) /
             |    COALESCE(above.ng, 1), 6) AS share_gaps_broken
             |FROM grid LEFT JOIN above ON above.b = grid.i
             |CROSS JOIN nu ORDER BY threshold_s""".stripMargin)),
    // Horvitz-Thompson estimation under deterministic-hash sampling
    // (Horvitz & Thompson, JASA 1952; the π-estimator every survey
    // and data-profiling stack uses): estimate each source's total
    // token count from ONLY the doc_id%7==0 sample — completing the
    // sampling-theory arc (x226 allocates the budget, x49/x24 draw,
    // this ESTIMATES from the draw with a design-based SE). π = 1/7
    // exactly under the hash-uniformity the suite's seed-id devices
    // already assume (stated, not hidden); the SE is the SRSWOR
    // approximation N_h²(1−f)s_h²/n_h. The true totals ride along —
    // on the probe corpus the estimator is audited against them.
    QuerySpec(
      "x295_horvitz_thompson",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("y"))
          .localCheckpoint() // one scan feeds truth, sample, and sizes
        val pop = d.groupBy("source")
          .agg(count(lit(1)).as("nh"), sum(col("y")).as("true_total"))
        val smp = d.filter(col("doc_id") % 7 === 0)
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"))
        pop.join(smp, Seq("source"), "left")
          .na.fill(0L, Seq("n", "sy", "syy"))
          .select(col("source"), col("nh").as("n_docs"),
            col("n").as("n_sampled"), col("true_total"),
            (col("sy") * 7L).as("ht_estimate"),
            when(col("n") > 1,
              round(sqrt(col("nh").cast("double") * col("nh") *
                (lit(1.0) - col("n").cast("double") / col("nh")) *
                ((col("syy").cast("double") -
                  col("sy").cast("double") * col("sy") / col("n")) /
                  (col("n") - 1L)) / col("n")), 4))
              .otherwise(lit(0.0)).as("se"),
            when(col("true_total") > 0,
              round((col("sy") * 7L - col("true_total")).cast("double")
                / col("true_total"), 6)).otherwise(lit(0.0))
              .as("rel_err"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source, doc_id,
             |        CAST(len(list_filter(regexp_split_to_array(
             |          trim(text), '\s+'), x -> x <> '')) AS BIGINT)
             |          AS y
             |      FROM documents),
             |pop AS (SELECT source, COUNT(*) AS nh,
             |        SUM(y) AS true_total FROM d GROUP BY 1),
             |smp AS (SELECT source, COUNT(*) AS n, SUM(y) AS sy,
             |        SUM(y * y) AS syy
             |      FROM d WHERE doc_id % 7 = 0 GROUP BY 1)
             |SELECT pop.source, CAST(pop.nh AS BIGINT) AS n_docs,
             |  CAST(COALESCE(smp.n, 0) AS BIGINT) AS n_sampled,
             |  CAST(pop.true_total AS BIGINT) AS true_total,
             |  CAST(COALESCE(smp.sy, 0) * 7 AS BIGINT) AS ht_estimate,
             |  CASE WHEN COALESCE(smp.n, 0) > 1 THEN
             |    round(sqrt(CAST(pop.nh AS DOUBLE) * pop.nh *
             |      (1.0 - CAST(smp.n AS DOUBLE) / pop.nh) *
             |      ((CAST(smp.syy AS DOUBLE) -
             |        CAST(smp.sy AS DOUBLE) * smp.sy / smp.n) /
             |        (smp.n - 1)) / smp.n), 4)
             |    ELSE 0.0 END AS se,
             |  CASE WHEN pop.true_total > 0 THEN
             |    round(CAST(COALESCE(smp.sy, 0) * 7 - pop.true_total
             |      AS DOUBLE) / pop.true_total, 6) ELSE 0.0 END
             |    AS rel_err
             |FROM pop LEFT JOIN smp ON smp.source = pop.source
             |ORDER BY pop.source""".stripMargin)),
    // Two-way ANOVA with interaction (Fisher 1925 ch. 7; the balanced-
    // design decomposition, unbalanced cells via the cell-mean
    // Type-I-at-this-layout convention stated here): arm × activity
    // tercile on user spend — x157's one-way asks if groups differ,
    // this SPLITS the variance into the two factors AND their
    // interaction (the "does the treatment work differently for heavy
    // users" read x260 eyeballs per-stratum). All sums exact cents;
    // cell/marginal means on the ≤6-cell grid; F thresholds are the
    // published large-denominator values (3.84 for df1=1, 3.00 for
    // df1=2); one user-grid pass + ONE bounded percentile aggregate.
    QuerySpec(
      "x296_two_way_anova",
      (s, dir) => {
        val u0 = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("y"))
          .select((col("user_id") % 2).as("a"), col("act"), col("y"))
        val cuts = u0.agg(
          round(expr("percentile(act, CAST(1 AS DOUBLE) / 3)"), 6)
            .as("c1"),
          round(expr("percentile(act, CAST(2 AS DOUBLE) / 3)"), 6)
            .as("c2"))
        val u = u0.crossJoin(broadcast(cuts))
          .select(col("a"),
            ((col("act") > col("c1")).cast("long") +
              (col("act") > col("c2")).cast("long")).as("b"), col("y"))
        val cell = u.groupBy("a", "b")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum((col("y") * col("y")).cast("decimal(38,0)")).as("qy"))
          .localCheckpoint() // <=6 cells
        val g = cell.agg(sum(col("n")).as("nn"), sum(col("sy")).as("st"),
          sum(col("qy")).cast("decimal(38,0)").as("qt"))
        val am = cell.groupBy("a").agg(sum(col("n")).as("na"),
          sum(col("sy")).as("sa"))
        val bm = cell.groupBy("b").agg(sum(col("n")).as("nb"),
          sum(col("sy")).as("sb"))
        val ssa = am.crossJoin(broadcast(g))
          .agg(sum(round(
            (col("sa").cast("double") / col("na") -
              col("st").cast("double") / col("nn")) *
              (col("sa").cast("double") / col("na") -
                col("st").cast("double") / col("nn")) * col("na"), 6)
            .cast("decimal(38,6)")).cast("double").as("ssa"))
        val ssb = bm.crossJoin(broadcast(g))
          .agg(sum(round(
            (col("sb").cast("double") / col("nb") -
              col("st").cast("double") / col("nn")) *
              (col("sb").cast("double") / col("nb") -
                col("st").cast("double") / col("nn")) * col("nb"), 6)
            .cast("decimal(38,6)")).cast("double").as("ssb"))
        val sscell = cell.crossJoin(broadcast(g))
          .agg(sum(round(
            (col("sy").cast("double") / col("n") -
              col("st").cast("double") / col("nn")) *
              (col("sy").cast("double") / col("n") -
                col("st").cast("double") / col("nn")) * col("n"), 6)
            .cast("decimal(38,6)")).cast("double").as("ssc"),
            sum((col("qy").cast("double") -
              col("sy").cast("double") * col("sy") / col("n")))
              .as("ssw"),
            sum(col("n")).as("nn2"),
            count(lit(1)).as("kc"))
        // ss_interaction = SScells − SSA − SSB is exact only for
        // balanced/proportional cell counts (Type-I style partition);
        // with unbalanced user_id%2 × tercile cells it can come out
        // slightly negative, so clamp at 0 (round-10 advisor note).
        // Error df uses the OBSERVED non-empty cell count kc, not a
        // hard-coded 6, so an empty cell can't corrupt the df.
        val ssi = greatest(col("ssc") - col("ssa") - col("ssb"), lit(0.0))
        val msw = col("ssw") / (col("nn2") - col("kc"))
        ssa.crossJoin(broadcast(ssb)).crossJoin(broadcast(sscell))
          .select(col("nn2").as("n_users"),
            round(col("ssa"), 2).as("ss_arm"),
            round(col("ssb"), 2).as("ss_tercile"),
            round(ssi, 2).as("ss_interaction"),
            round(col("ssw"), 2).as("ss_within"),
            round(col("ssa") / 1 / msw, 6).as("f_arm"),
            round(col("ssb") / 2 / msw, 6).as("f_tercile"),
            round(ssi / 2 / msw, 6).as("f_interaction"),
            (col("ssa") / 1 / msw > 3.84)
              .cast("long").as("arm_sig_05"),
            (ssi / 2 / msw > 3.00)
              .cast("long").as("interaction_sig_05"))
          .orderBy("n_users")
      },
      Some("""WITH u0 AS (SELECT user_id % 2 AS a, COUNT(*) AS act,
             |        SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS y
             |      FROM events GROUP BY user_id),
             |cuts AS (SELECT
             |        round(quantile_cont(act, CAST(1 AS DOUBLE) / 3), 6)
             |          AS c1,
             |        round(quantile_cont(act, CAST(2 AS DOUBLE) / 3), 6)
             |          AS c2
             |      FROM u0),
             |u AS (SELECT a,
             |        CAST(act > c1 AS BIGINT) +
             |        CAST(act > c2 AS BIGINT) AS b, y
             |      FROM u0 CROSS JOIN cuts),
             |cell AS (SELECT a, b, COUNT(*) AS n, SUM(y) AS sy,
             |        SUM(CAST(y * y AS DECIMAL(38,0))) AS qy
             |      FROM u GROUP BY 1, 2),
             |g AS (SELECT SUM(n) AS nn, SUM(sy) AS st FROM cell),
             |am AS (SELECT a, SUM(n) AS na, SUM(sy) AS sa FROM cell
             |      GROUP BY 1),
             |bm AS (SELECT b, SUM(n) AS nb, SUM(sy) AS sb FROM cell
             |      GROUP BY 1),
             |ssa AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(sa AS DOUBLE) / na - CAST(g.st AS DOUBLE)
             |          / g.nn) *
             |        (CAST(sa AS DOUBLE) / na - CAST(g.st AS DOUBLE)
             |          / g.nn) * na, 6) AS DECIMAL(38,6))) AS DOUBLE)
             |        AS ssa
             |      FROM am CROSS JOIN g),
             |ssb AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(sb AS DOUBLE) / nb - CAST(g.st AS DOUBLE)
             |          / g.nn) *
             |        (CAST(sb AS DOUBLE) / nb - CAST(g.st AS DOUBLE)
             |          / g.nn) * nb, 6) AS DECIMAL(38,6))) AS DOUBLE)
             |        AS ssb
             |      FROM bm CROSS JOIN g),
             |ssc AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(sy AS DOUBLE) / n - CAST(g.st AS DOUBLE)
             |          / g.nn) *
             |        (CAST(sy AS DOUBLE) / n - CAST(g.st AS DOUBLE)
             |          / g.nn) * n, 6) AS DECIMAL(38,6))) AS DOUBLE)
             |        AS ssc,
             |        SUM(CAST(qy AS DOUBLE) -
             |          CAST(sy AS DOUBLE) * sy / n) AS ssw,
             |        SUM(n) AS nn2,
             |        COUNT(*) AS kc
             |      FROM cell CROSS JOIN g)
             |SELECT CAST(nn2 AS BIGINT) AS n_users,
             |  round(ssa.ssa, 2) AS ss_arm,
             |  round(ssb.ssb, 2) AS ss_tercile,
             |  round(greatest(ssc.ssc - ssa.ssa - ssb.ssb, 0.0), 2)
             |    AS ss_interaction,
             |  round(ssc.ssw, 2) AS ss_within,
             |  round(ssa.ssa / 1 / (ssc.ssw / (nn2 - kc)), 6) AS f_arm,
             |  round(ssb.ssb / 2 / (ssc.ssw / (nn2 - kc)), 6)
             |    AS f_tercile,
             |  round(greatest(ssc.ssc - ssa.ssa - ssb.ssb, 0.0) / 2 /
             |    (ssc.ssw / (nn2 - kc)), 6) AS f_interaction,
             |  CAST(ssa.ssa / 1 / (ssc.ssw / (nn2 - kc)) > 3.84
             |    AS BIGINT) AS arm_sig_05,
             |  CAST(greatest(ssc.ssc - ssa.ssa - ssb.ssb, 0.0) / 2 /
             |    (ssc.ssw / (nn2 - kc)) > 3.00 AS BIGINT)
             |    AS interaction_sig_05
             |FROM ssa CROSS JOIN ssb CROSS JOIN ssc
             |ORDER BY n_users""".stripMargin)),
    // Collinearity audit: pairwise Pearson r, PARTIAL correlations and
    // VIFs for the three behavioral features (Yule 1907 for partials;
    // Marquardt 1970 names the VIF; the 3×3 closed-form inverse means
    // no iterative solver) — the pre-regression hygiene x229's OLS
    // assumes away: a feature with VIF ≫ 10 carries no independent
    // signal and its x229 coefficient is noise. r_xy.z =
    // (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)); VIF_x = 1/(1−R²_x)
    // with R²_x from the same matrix. One exact-moment corpus pass;
    // all downstream algebra is a 1-row expression tree on rounded-6
    // correlations, so both engines invert identical matrices.
    QuerySpec(
      "x297_collinearity_audit",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("x1"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("x2"),
            countDistinct(to_date(col("ts"))).as("x3"))
        val m = u.agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
          sum(col("x3")).as("s3"),
          sum(col("x1") * col("x1")).as("q1"),
          sum((col("x2") * col("x2")).cast("decimal(38,0)")).as("q2"),
          sum(col("x3") * col("x3")).as("q3"),
          sum(col("x1") * col("x2")).as("p12"),
          sum(col("x1") * col("x3")).as("p13"),
          sum(col("x2") * col("x3")).as("p23"))
        def r(sp: org.apache.spark.sql.Column,
            sa: org.apache.spark.sql.Column,
            sb: org.apache.spark.sql.Column,
            qa: org.apache.spark.sql.Column,
            qb: org.apache.spark.sql.Column) =
          round((sp.cast("double") - sa.cast("double") * sb /
            col("n")) / sqrt((qa.cast("double") - sa.cast("double") *
            sa / col("n")) * (qb.cast("double") - sb.cast("double") *
            sb / col("n"))), 6)
        val cors = m.select(col("n"),
          r(col("p12"), col("s1"), col("s2"), col("q1"), col("q2"))
            .as("r12"),
          r(col("p13"), col("s1"), col("s3"), col("q1"), col("q3"))
            .as("r13"),
          r(col("p23"), col("s2"), col("s3"), col("q2"), col("q3"))
            .as("r23"))
        cors.select(col("n").as("n_users"), col("r12"), col("r13"),
            col("r23"),
            round((col("r12") - col("r13") * col("r23")) /
              sqrt((lit(1.0) - col("r13") * col("r13")) *
                (lit(1.0) - col("r23") * col("r23"))), 6)
              .as("partial_r12_given_3"),
            round((col("r13") - col("r12") * col("r23")) /
              sqrt((lit(1.0) - col("r12") * col("r12")) *
                (lit(1.0) - col("r23") * col("r23"))), 6)
              .as("partial_r13_given_2"),
            round(lit(1.0) / (lit(1.0) -
              (col("r12") * col("r12") + col("r13") * col("r13") -
                lit(2.0) * col("r12") * col("r13") * col("r23")) /
              (lit(1.0) - col("r23") * col("r23"))), 6).as("vif_x1"),
            round(lit(1.0) / (lit(1.0) -
              (col("r12") * col("r12") + col("r23") * col("r23") -
                lit(2.0) * col("r12") * col("r13") * col("r23")) /
              (lit(1.0) - col("r13") * col("r13"))), 6).as("vif_x2"),
            round(lit(1.0) / (lit(1.0) -
              (col("r13") * col("r13") + col("r23") * col("r23") -
                lit(2.0) * col("r12") * col("r13") * col("r23")) /
              (lit(1.0) - col("r12") * col("r12"))), 6).as("vif_x3"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS x1,
             |        SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS x2,
             |        COUNT(DISTINCT CAST(ts AS DATE)) AS x3
             |      FROM events GROUP BY 1),
             |m AS (SELECT COUNT(*) AS n,
             |        SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3,
             |        SUM(x1 * x1) AS q1,
             |        SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS q2,
             |        SUM(x3 * x3) AS q3,
             |        SUM(x1 * x2) AS p12, SUM(x1 * x3) AS p13,
             |        SUM(x2 * x3) AS p23
             |      FROM u),
             |cors AS (SELECT n,
             |        round((CAST(p12 AS DOUBLE) - CAST(s1 AS DOUBLE) *
             |          s2 / n) / sqrt((CAST(q1 AS DOUBLE) -
             |          CAST(s1 AS DOUBLE) * s1 / n) *
             |          (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2
             |          / n)), 6) AS r12,
             |        round((CAST(p13 AS DOUBLE) - CAST(s1 AS DOUBLE) *
             |          s3 / n) / sqrt((CAST(q1 AS DOUBLE) -
             |          CAST(s1 AS DOUBLE) * s1 / n) *
             |          (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3
             |          / n)), 6) AS r13,
             |        round((CAST(p23 AS DOUBLE) - CAST(s2 AS DOUBLE) *
             |          s3 / n) / sqrt((CAST(q2 AS DOUBLE) -
             |          CAST(s2 AS DOUBLE) * s2 / n) *
             |          (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3
             |          / n)), 6) AS r23
             |      FROM m)
             |SELECT CAST(n AS BIGINT) AS n_users, r12, r13, r23,
             |  round((r12 - r13 * r23) / sqrt((1.0 - r13 * r13) *
             |    (1.0 - r23 * r23)), 6) AS partial_r12_given_3,
             |  round((r13 - r12 * r23) / sqrt((1.0 - r12 * r12) *
             |    (1.0 - r23 * r23)), 6) AS partial_r13_given_2,
             |  round(1.0 / (1.0 - (r12 * r12 + r13 * r13 -
             |    2.0 * r12 * r13 * r23) / (1.0 - r23 * r23)), 6)
             |    AS vif_x1,
             |  round(1.0 / (1.0 - (r12 * r12 + r23 * r23 -
             |    2.0 * r12 * r13 * r23) / (1.0 - r13 * r13)), 6)
             |    AS vif_x2,
             |  round(1.0 / (1.0 - (r13 * r13 + r23 * r23 -
             |    2.0 * r12 * r13 * r23) / (1.0 - r12 * r12)), 6)
             |    AS vif_x3
             |FROM cors ORDER BY n_users""".stripMargin)),
    // Gap-distribution model selection by AIC/BIC (Akaike 1974;
    // Schwarz 1978; Burnham & Anderson 2002 for the ΔAIC reading):
    // exponential vs lognormal vs Weibull log-likelihoods for the
    // inter-event gaps, each in CLOSED FORM from one or two moment
    // passes — the decision layer above x285's lognormal diagnostics
    // and x291's Weibull fit (fitting is not choosing; AIC prices the
    // fits against each other with their parameter counts).
    // Exponential: λ̂=1/ḡ, ℓ = −n(ln ḡ + 1). Lognormal: ℓ from the
    // ln-moment sums. Weibull: k̂,λ̂ plug in from the x291 median-rank
    // regression (stated: plug-in, not MLE), ℓ needs Σ(g/λ̂)^k̂ — ONE
    // extra pass with a per-row pow (the corpus-grain transcendental
    // class, rounded 6 into DECIMAL sums).
    QuerySpec(
      "x298_gap_model_selection",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("nts", lead(col("ts"), 1).over(w))
          .where(col("nts").isNotNull)
          .select((unix_timestamp(col("nts")) -
            unix_timestamp(col("ts"))).as("g"))
          .filter(col("g") > 0)
          .localCheckpoint() // feeds moments, the fit, and the pow pass
        val mom = gap.agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
            sum(round(log(col("g").cast("double")), 6)
              .cast("decimal(38,6)")).cast("double").as("sl"),
            sum(round(log(col("g").cast("double")) *
              log(col("g").cast("double")), 6).cast("decimal(38,6)"))
              .cast("double").as("sll"))
          .select(col("n"), col("sg"), col("sl"), col("sll"),
            round(col("sl") / col("n"), 6).as("mu"),
            round(sqrt((col("sll") - col("sl") * col("sl") / col("n")) /
              col("n")), 6).as("sig"))
        // Weibull plug-in from the x291 median-rank regression
        val grid = gap.groupBy("g").agg(count(lit(1)).as("cnt"))
        val tot = grid.agg(sum(col("cnt")).as("nn"))
        val wc = W.orderBy("g").rowsBetween(W.unboundedPreceding, -1)
        val pts = grid
          .withColumn("cumprev", coalesce(sum(col("cnt")).over(wc),
            lit(0L)))
          .crossJoin(broadcast(tot))
          .select(col("cnt"),
            round(log(col("g").cast("double")), 6).as("x"),
            round(log(-log(lit(1.0) -
              round(((col("cumprev").cast("double") +
                col("cnt").cast("double") / 2) - 0.3) /
                (col("nn").cast("double") + 0.4), 9))), 6).as("yv"))
        val fit = pts.agg(sum(col("cnt")).as("sw"),
            sum(round(col("cnt") * col("x"), 6).cast("decimal(38,6)"))
              .cast("double").as("sx"),
            sum(round(col("cnt") * col("yv"), 6).cast("decimal(38,6)"))
              .cast("double").as("sy"),
            sum(round(col("cnt") * col("x") * col("x"), 6)
              .cast("decimal(38,6)")).cast("double").as("sxx"),
            sum(round(col("cnt") * col("x") * col("yv"), 6)
              .cast("decimal(38,6)")).cast("double").as("sxy"))
          .select(
            round((col("sw") * col("sxy") - col("sx") * col("sy")) /
              (col("sw") * col("sxx") - col("sx") * col("sx")), 6)
              .as("k"),
            round((col("sy") - (col("sw") * col("sxy") - col("sx") *
              col("sy")) / (col("sw") * col("sxx") - col("sx") *
              col("sx")) * col("sx")) / col("sw"), 6).as("ic"))
          .select(col("k"), round(exp(-col("ic") / col("k")), 6)
            .as("lam"))
          .localCheckpoint() // 1 row
        val pw = gap.crossJoin(broadcast(fit))
          .agg(sum(round(pow(col("g").cast("double") / col("lam"),
            col("k")), 6).cast("decimal(38,6)")).cast("double")
            .as("spow"))
        val ll = mom.crossJoin(broadcast(fit)).crossJoin(broadcast(pw))
          .select(col("n"), col("k"), col("lam"),
            round(-col("n") * (log(col("sg").cast("double") / col("n"))
              + 1.0), 4).as("ll_exp"),
            round(-col("n") / 2.0 * log(lit(2.0) * math.Pi) -
              col("n") * log(col("sig")) - col("sl") -
              col("n") / 2.0, 4).as("ll_lognorm"),
            round(col("n") * (log(col("k")) - col("k") *
              log(col("lam"))) + (col("k") - 1.0) * col("sl") -
              col("spow"), 4).as("ll_weibull"))
        ll.select(explode(array(
            struct(lit("exponential").as("model"), lit(1L).as("k_params"),
              col("ll_exp").as("loglik")),
            struct(lit("lognormal").as("model"), lit(2L).as("k_params"),
              col("ll_lognorm").as("loglik")),
            struct(lit("weibull").as("model"), lit(2L).as("k_params"),
              col("ll_weibull").as("loglik")))).as("x"), col("n"))
          .select(col("x.model").as("model"),
            col("x.k_params").as("k_params"),
            round(col("x.loglik"), 4).as("loglik"),
            round(lit(2.0) * col("x.k_params") -
              lit(2.0) * col("x.loglik"), 4).as("aic"),
            round(col("x.k_params") * log(col("n").cast("double")) -
              lit(2.0) * col("x.loglik"), 4).as("bic"))
          .orderBy("model")
      },
      Some("""WITH sq AS (SELECT user_id, ts, event_id,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS nts
             |      FROM events),
             |gap AS (SELECT CAST(date_diff('second', ts, nts) AS BIGINT)
             |          AS g
             |      FROM sq WHERE nts IS NOT NULL
             |        AND date_diff('second', ts, nts) > 0),
             |mom AS (SELECT COUNT(*) AS n, SUM(g) AS sg,
             |        CAST(SUM(CAST(round(ln(CAST(g AS DOUBLE)), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sl,
             |        CAST(SUM(CAST(round(ln(CAST(g AS DOUBLE)) *
             |          ln(CAST(g AS DOUBLE)), 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sll
             |      FROM gap),
             |mo2 AS (SELECT n, sg, sl, sll,
             |        round(sl / n, 6) AS mu,
             |        round(sqrt((sll - sl * sl / n) / n), 6) AS sig
             |      FROM mom),
             |grid AS (SELECT g, COUNT(*) AS cnt FROM gap GROUP BY 1),
             |tot AS (SELECT SUM(cnt) AS nn FROM grid),
             |pts AS (SELECT cnt,
             |        round(ln(CAST(g AS DOUBLE)), 6) AS x,
             |        round(ln(-ln(1.0 -
             |          round(((COALESCE(SUM(cnt) OVER (ORDER BY g ROWS
             |            BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |            0) + CAST(cnt AS DOUBLE) / 2) - 0.3) /
             |            (CAST(tot.nn AS DOUBLE) + 0.4), 9))), 6) AS yv
             |      FROM grid CROSS JOIN tot),
             |fitm AS (SELECT SUM(cnt) AS sw,
             |        CAST(SUM(CAST(round(cnt * x, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(round(cnt * yv, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(round(cnt * x * x, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             |        CAST(SUM(CAST(round(cnt * x * yv, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sxy
             |      FROM pts),
             |fit AS (SELECT
             |        round((sw * sxy - sx * sy) / (sw * sxx - sx * sx),
             |          6) AS k,
             |        round(exp(-(round((sy - (sw * sxy - sx * sy) /
             |          (sw * sxx - sx * sx) * sx) / sw, 6)) /
             |          round((sw * sxy - sx * sy) /
             |          (sw * sxx - sx * sx), 6)), 6) AS lam
             |      FROM fitm),
             |pw AS (SELECT CAST(SUM(CAST(round(
             |        power(CAST(g AS DOUBLE) / fit.lam, fit.k), 6)
             |        AS DECIMAL(38,6))) AS DOUBLE) AS spow
             |      FROM gap CROSS JOIN fit),
             |ll AS (SELECT mo2.n, fit.k, fit.lam,
             |        round(-mo2.n * (ln(CAST(mo2.sg AS DOUBLE) / mo2.n)
             |          + 1.0), 4) AS ll_exp,
             |        round(-mo2.n / 2.0 * ln(2 * pi()) -
             |          mo2.n * ln(mo2.sig) - mo2.sl - mo2.n / 2.0, 4)
             |          AS ll_lognorm,
             |        round(mo2.n * (ln(fit.k) - fit.k * ln(fit.lam)) +
             |          (fit.k - 1.0) * mo2.sl - pw.spow, 4)
             |          AS ll_weibull
             |      FROM mo2 CROSS JOIN fit CROSS JOIN pw),
             |o AS (SELECT 'exponential' AS model, 1 AS k_params,
             |        ll_exp AS loglik, n FROM ll
             |      UNION ALL SELECT 'lognormal', 2, ll_lognorm, n
             |      FROM ll
             |      UNION ALL SELECT 'weibull', 2, ll_weibull, n
             |      FROM ll)
             |SELECT model, CAST(k_params AS BIGINT) AS k_params,
             |  round(loglik, 4) AS loglik,
             |  round(2.0 * k_params - 2.0 * loglik, 4) AS aic,
             |  round(k_params * ln(CAST(n AS DOUBLE)) - 2.0 * loglik,
             |    4) AS bic
             |FROM o ORDER BY model""".stripMargin)),
    // Cook's distance for the daily-volume trend (Cook, Technometrics
    // 1977; Belsley-Kuh-Welsch 1980 for the 4/n screen): WHICH days
    // drive the x282 fit — the influence diagnostic completing the
    // regression-hygiene pair (DW says residuals correlate; Cook says
    // one launch day may own the slope). Simple-regression leverage
    // h_t = 1/n + (t−t̄)²/Sxx and D_t = e²h/(p·s²(1−h)²) are CLOSED
    // FORM per day from the exact integer OLS sums — no refitting, no
    // leave-one-out loop; top-10 by D with the 4/n flag.
    QuerySpec(
      "x299_cooks_distance",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val span = d.agg(min(col("day")).as("a"))
        val idx = d.crossJoin(broadcast(span))
          .select(col("day"),
            datediff(col("day"), col("a")).cast("long").as("t"),
            col("n"))
        val m = idx.agg(count(lit(1)).as("k"), sum(col("t")).as("st"),
          sum(col("t") * col("t")).as("stt"), sum(col("n")).as("sn"),
          sum(col("t") * col("n")).as("stn"))
        val fit = m.select(col("k"), col("st"), col("stt"),
          ((col("k") * col("stn") - col("st") * col("sn")).cast("double")
            / (col("k") * col("stt") - col("st") * col("st")))
            .as("slope"),
          ((col("sn").cast("double") * col("stt") -
            col("st").cast("double") * col("stn")) /
            (col("k") * col("stt") - col("st") * col("st"))
              .cast("double")).as("icept"))
        val e = idx.crossJoin(broadcast(fit))
          .select(col("day"), col("t"), col("k"), col("st"),
            col("stt"),
            round(col("n") - col("icept") - col("slope") * col("t"), 6)
              .as("e"))
        val s2 = e.agg(
          (sum(round(col("e") * col("e"), 6).cast("decimal(38,6)"))
            .cast("double") / (max(col("k")) - 2L)).as("s2"))
        e.crossJoin(broadcast(s2))
          .withColumn("h", round(lit(1.0) / col("k") +
            (col("t") - col("st").cast("double") / col("k")) *
              (col("t") - col("st").cast("double") / col("k")) /
              (col("stt").cast("double") - col("st").cast("double") *
                col("st") / col("k")), 9))
          .select(col("day"), round(col("e"), 4).as("residual"),
            round(col("h"), 6).as("leverage"),
            round(col("e") * col("e") * col("h") /
              (lit(2.0) * col("s2") * (lit(1.0) - col("h")) *
                (lit(1.0) - col("h"))), 6).as("cooks_d"),
            (col("e") * col("e") * col("h") /
              (lit(2.0) * col("s2") * (lit(1.0) - col("h")) *
                (lit(1.0) - col("h"))) >
              lit(4.0) / col("k")).cast("long").as("influential"))
          .orderBy(col("cooks_d").desc, col("day")).limit(10)
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |span AS (SELECT MIN(day) AS a FROM d),
             |idx AS (SELECT day,
             |        CAST(date_diff('day', span.a, day) AS BIGINT) AS t,
             |        n
             |      FROM d CROSS JOIN span),
             |m AS (SELECT COUNT(*) AS k, SUM(t) AS st,
             |        SUM(t * t) AS stt, SUM(n) AS sn, SUM(t * n) AS stn
             |      FROM idx),
             |fit AS (SELECT k, st, stt,
             |        CAST(k * stn - st * sn AS DOUBLE) /
             |          (k * stt - st * st) AS slope,
             |        (CAST(sn AS DOUBLE) * stt -
             |          CAST(st AS DOUBLE) * stn) /
             |          CAST(k * stt - st * st AS DOUBLE) AS icept
             |      FROM m),
             |e AS (SELECT idx.day, idx.t, fit.k, fit.st, fit.stt,
             |        round(idx.n - fit.icept - fit.slope * idx.t, 6)
             |          AS e
             |      FROM idx CROSS JOIN fit),
             |s2 AS (SELECT CAST(SUM(CAST(round(e * e, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) / (MAX(k) - 2)
             |          AS s2
             |      FROM e),
             |cd AS (SELECT day, e,
             |        round(1.0 / k + (t - CAST(st AS DOUBLE) / k) *
             |          (t - CAST(st AS DOUBLE) / k) /
             |          (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st
             |          / k), 9) AS h,
             |        k
             |      FROM e),
             |out AS (SELECT day, round(e, 4) AS residual,
             |        round(h, 6) AS leverage,
             |        round(e * e * h / (2.0 * s2.s2 * (1.0 - h) *
             |          (1.0 - h)), 6) AS cooks_d,
             |        CAST(e * e * h / (2.0 * s2.s2 * (1.0 - h) *
             |          (1.0 - h)) > 4.0 / k AS BIGINT) AS influential
             |      FROM cd CROSS JOIN s2)
             |SELECT * FROM out
             |ORDER BY cooks_d DESC, day LIMIT 10""".stripMargin)),
    // Trending items by week (the z-score burst screen — Kleinberg,
    // KDD 2002 motivates burst detection; this is its cheap two-state
    // screen over the x101/x175 item universe): item-weeks whose
    // share of that week's interactions spikes against the item's
    // all-time share, z = (o − e)/√(e(1−p)) under the binomial null —
    // WHICH item burst WHEN, where x95 alarms on total volume and
    // x175 smooths popularity. One corpus pass → the bounded
    // (item × week) grid; expected counts are exact rationals; top-10
    // bursts with deterministic tie-break.
    QuerySpec(
      "x300_trending_items",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(expr("CAST(get_json_object(props, '$.k') AS INT)")
            .as("item"),
            expr("CAST(floor(datediff(to_date(ts), DATE '1970-01-01') / 7) " +
              "AS BIGINT)").as("week"))
          .filter(col("item").isNotNull)
        val iw = ev.groupBy("item", "week").agg(count(lit(1)).as("o"))
          .localCheckpoint() // item-vocab x weeks grid
        val it = iw.groupBy("item").agg(sum(col("o")).as("ni"))
        val wk = iw.groupBy("week").agg(sum(col("o")).as("nw"))
        val tot = iw.agg(sum(col("o")).as("nn"))
        iw.join(broadcast(it), "item").join(broadcast(wk), "week")
          .crossJoin(broadcast(tot))
          .select(col("item"), col("week"), col("o"),
            round(col("ni").cast("double") * col("nw") / col("nn"), 6)
              .as("expected"),
            round((col("o") - col("ni").cast("double") * col("nw") /
              col("nn")) / sqrt(col("ni").cast("double") * col("nw") /
              col("nn") * (lit(1.0) - col("ni").cast("double") /
              col("nn"))), 6).as("z"))
          .orderBy(col("z").desc, col("item"), col("week")).limit(10)
      },
      Some("""WITH ev AS (SELECT
             |        CAST(json_extract_string(props, '$.k') AS INT)
             |          AS item,
             |        CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) // 7 AS BIGINT) AS week
             |      FROM events
             |      WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |iw AS (SELECT item, week, COUNT(*) AS o FROM ev
             |      GROUP BY 1, 2),
             |it AS (SELECT item, SUM(o) AS ni FROM iw GROUP BY 1),
             |wk AS (SELECT week, SUM(o) AS nw FROM iw GROUP BY 1),
             |tot AS (SELECT SUM(o) AS nn FROM iw)
             |SELECT CAST(iw.item AS INT) AS item,
             |  CAST(iw.week AS BIGINT) AS week,
             |  CAST(iw.o AS BIGINT) AS o,
             |  round(CAST(it.ni AS DOUBLE) * wk.nw / tot.nn, 6)
             |    AS expected,
             |  round((iw.o - CAST(it.ni AS DOUBLE) * wk.nw / tot.nn) /
             |    sqrt(CAST(it.ni AS DOUBLE) * wk.nw / tot.nn *
             |      (1.0 - CAST(it.ni AS DOUBLE) / tot.nn)), 6) AS z
             |FROM iw JOIN it USING (item) JOIN wk USING (week)
             |CROSS JOIN tot
             |ORDER BY z DESC, item, week LIMIT 10""".stripMargin)),
    // Bland-Altman agreement (Bland & Altman, Lancet 1986 — the
    // method-comparison standard correlation gets WRONG: two measures
    // can correlate at .99 and still disagree by 2x): does the
    // dependency-free approxLlmTokens proxy agree with the exact
    // whitespace tokenCount — the audit behind every budget the suite
    // prices in "LLM tokens" (x74 fertility, x93 budget selection).
    // Bias = mean(proxy − exact), limits of agreement ±1.96·sd, plus
    // the out-of-limits share — all exact-integer difference moments
    // in one doc pass.
    QuerySpec(
      "x301_bland_altman",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("a"),
            graft.functions.TextFunctions.approxLlmTokens(col("text"))
              .as("b"))
          .select(col("a"), col("b"), (col("b") - col("a")).as("dd"))
          .localCheckpoint() // one pass feeds moments and the OOL count
        val m = d.agg(count(lit(1)).as("n"), sum(col("dd")).as("sd1"),
            sum(col("dd") * col("dd")).as("sdd"),
            sum(col("a")).as("sa"), sum(col("b")).as("sb"))
          .select(col("n"), col("sa"), col("sb"),
            round(col("sd1").cast("double") / col("n"), 6).as("bias"),
            round(sqrt((col("sdd").cast("double") -
              col("sd1").cast("double") * col("sd1") / col("n")) /
              (col("n") - 1L)), 6).as("sd"))
        val lim = m.select(col("n"), col("sa"), col("sb"), col("bias"),
          col("sd"),
          round(col("bias") - lit(1.96) * col("sd"), 6).as("lo"),
          round(col("bias") + lit(1.96) * col("sd"), 6).as("hi"))
        val ool = d.crossJoin(broadcast(lim))
          .agg(max(col("n")).as("n_docs"), max(col("bias")).as("bias"),
            max(col("sd")).as("sd_diff"), max(col("lo")).as("loa_lower"),
            max(col("hi")).as("loa_upper"),
            round(sum((col("dd") < col("lo") || col("dd") > col("hi"))
              .cast("long")).cast("double") / max(col("n")), 6)
              .as("share_outside_loa"),
            round(max(col("sb")).cast("double") / max(col("sa")), 6)
              .as("total_ratio"))
        ool.orderBy("n_docs")
      },
      Some("""WITH d AS (SELECT
             |        CAST(len(list_filter(regexp_split_to_array(
             |          trim(text), '\s+'), x -> x <> '')) AS BIGINT)
             |          AS a,
             |        greatest(CAST(len(list_filter(
             |          regexp_split_to_array(trim(text), '\s+'),
             |          x -> x <> '')) AS BIGINT),
             |          CAST(ceil(length(text) / 4.0) AS BIGINT)) AS b
             |      FROM documents),
             |dd AS (SELECT a, b, b - a AS dd FROM d),
             |m AS (SELECT COUNT(*) AS n, SUM(dd) AS sd1,
             |        SUM(dd * dd) AS sdd, SUM(a) AS sa, SUM(b) AS sb
             |      FROM dd),
             |lim AS (SELECT n, sa, sb,
             |        round(CAST(sd1 AS DOUBLE) / n, 6) AS bias,
             |        round(sqrt((CAST(sdd AS DOUBLE) -
             |          CAST(sd1 AS DOUBLE) * sd1 / n) / (n - 1)), 6)
             |          AS sd
             |      FROM m),
             |l2 AS (SELECT n, sa, sb, bias, sd,
             |        round(bias - 1.96 * sd, 6) AS lo,
             |        round(bias + 1.96 * sd, 6) AS hi
             |      FROM lim)
             |SELECT CAST(l2.n AS BIGINT) AS n_docs, l2.bias,
             |  l2.sd AS sd_diff, l2.lo AS loa_lower, l2.hi AS loa_upper,
             |  round(CAST((SELECT COUNT(*) FROM dd CROSS JOIN l2
             |    WHERE dd.dd < l2.lo OR dd.dd > l2.hi) AS DOUBLE)
             |    / l2.n, 6) AS share_outside_loa,
             |  round(CAST(l2.sb AS DOUBLE) / l2.sa, 6) AS total_ratio
             |FROM l2 ORDER BY n_docs""".stripMargin)),
    // Hill-number diversity profile (Hill, Ecology 1973; Jost 2006
    // for why "effective number of species" beats raw indices): per
    // source, the q=0/1/2 profile — richness, exp(Shannon), and
    // 1/Simpson — PLUS Pielou's evenness J = H/ln(S). One frequency-
    // spectrum pass UNIFIES the suite's scattered diversity reads
    // (x235 estimates asymptotic richness, x254 reports Simpson's
    // repeat-rate, x59 uses entropy for drift): on the Hill scale all
    // three are the same object at different q, directly comparable.
    // Exact BIGINT spectra; ln on exact-rational arguments rounded 6
    // (the x262 discipline); q=2 from the exact Σf² rational.
    QuerySpec(
      "x302_hill_numbers",
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("source"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("f"))
        val nTot = tf.groupBy("source").agg(sum(col("f")).as("nt"),
          count(lit(1)).as("s0"), sum(col("f") * col("f")).as("f2"))
        val sh = tf.join(nTot, "source")
          .select(col("source"),
            round((col("f").cast("double") / col("nt")) *
              log(col("f").cast("double") / col("nt")), 9)
              .cast("decimal(38,9)").as("t"))
          .groupBy("source")
          .agg((-sum(col("t")).cast("double")).as("h"))
        nTot.join(sh, "source")
          .select(col("source"), col("nt").as("n_tokens"),
            col("s0").as("hill_q0"),
            round(exp(col("h")), 6).as("hill_q1"),
            round(col("nt").cast("double") * col("nt") / col("f2"), 6)
              .as("hill_q2"),
            round(col("h") / log(col("s0").cast("double")), 6)
              .as("pielou_j"))
          .orderBy("source")
      },
      Some("""WITH tok AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS tok
             |      FROM documents),
             |tf AS (SELECT source, tok, COUNT(*) AS f FROM tok
             |      GROUP BY 1, 2),
             |nt AS (SELECT source, SUM(f) AS nt, COUNT(*) AS s0,
             |        SUM(f * f) AS f2 FROM tf GROUP BY 1),
             |sh AS (SELECT tf.source,
             |        -CAST(SUM(CAST(round(
             |          (CAST(tf.f AS DOUBLE) / nt.nt) *
             |          ln(CAST(tf.f AS DOUBLE) / nt.nt), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS h
             |      FROM tf JOIN nt ON nt.source = tf.source
             |      GROUP BY 1)
             |SELECT nt.source, CAST(nt.nt AS BIGINT) AS n_tokens,
             |  CAST(nt.s0 AS BIGINT) AS hill_q0,
             |  round(exp(sh.h), 6) AS hill_q1,
             |  round(CAST(nt.nt AS DOUBLE) * nt.nt / nt.f2, 6)
             |    AS hill_q2,
             |  round(sh.h / ln(CAST(nt.s0 AS DOUBLE)), 6) AS pielou_j
             |FROM nt JOIN sh ON sh.source = nt.source
             |ORDER BY nt.source""".stripMargin)),
    // Gumbel block-maxima fit with return levels (Gumbel 1958; Coles
    // 2001 ch. 3; method-of-moments μ̂ = m − γ·β̂, β̂ = s√6/π with
    // Euler's γ = 0.5772156649): what daily volume should the
    // capacity plan expect once a month / once a quarter — the
    // block-maxima EVT route where x186's Hill index is the
    // heavy-tail route, and the formal version of x95's ad-hoc
    // peak read. Weekly maxima of daily counts (complete weeks, the
    // x288 convention) → exact-integer moments → return level
    // x_T = μ − β·ln(−ln(1 − 1/T)) for T = 4, 13, 52 weeks.
    QuerySpec(
      "x303_gumbel_maxima",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .select(col("day"), col("n"),
            expr("CAST(floor(datediff(day, DATE '1970-01-01') / 7) AS BIGINT)")
              .as("week"))
        val fw = d.groupBy("week").agg(count(lit(1)).as("nd"),
          max(col("n")).as("mx")).filter(col("nd") === 7)
        val m = fw.agg(count(lit(1)).as("k"), sum(col("mx")).as("sm"),
            sum(col("mx") * col("mx")).as("smm"))
          .select(col("k"),
            round(col("sm").cast("double") / col("k"), 6).as("mean"),
            // one-week guard (the CusumChart device): a span with a
            // single full week makes the (k − 1) sample sd degenerate
            when(col("k") > 1,
              round(sqrt((col("smm").cast("double") -
                col("sm").cast("double") * col("sm") / col("k")) /
                (col("k") - 1L)), 6)).otherwise(lit(0.0)).as("sd"))
        val fit = m.select(col("k").as("n_weeks"), col("mean"),
          col("sd"),
          round(col("sd") * math.sqrt(6.0) / math.Pi, 6).as("beta"))
          .select(col("n_weeks"), col("mean"), col("sd"), col("beta"),
            round(col("mean") - lit(0.5772156649) * col("beta"), 6)
              .as("mu"))
        fit.select(col("n_weeks"), col("mu"), col("beta"),
            round(col("mu") - col("beta") *
              log(-log(lit(1.0) - 1.0 / 4)), 2).as("rl_monthly"),
            round(col("mu") - col("beta") *
              log(-log(lit(1.0) - 1.0 / 13)), 2).as("rl_quarterly"),
            round(col("mu") - col("beta") *
              log(-log(lit(1.0) - 1.0 / 52)), 2).as("rl_yearly"))
          .orderBy("n_weeks")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             |        CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) // 7 AS BIGINT) AS week
             |      FROM events GROUP BY 1, 3),
             |fw AS (SELECT week, COUNT(*) AS nd, MAX(n) AS mx FROM d
             |      GROUP BY 1 HAVING COUNT(*) = 7),
             |m AS (SELECT COUNT(*) AS k, SUM(mx) AS sm,
             |        SUM(mx * mx) AS smm FROM fw),
             |mo AS (SELECT k,
             |        round(CAST(sm AS DOUBLE) / k, 6) AS mean,
             |        CASE WHEN k > 1 THEN
             |          round(sqrt((CAST(smm AS DOUBLE) -
             |            CAST(sm AS DOUBLE) * sm / k) / (k - 1)), 6)
             |          ELSE 0.0 END AS sd
             |      FROM m),
             |fit AS (SELECT k AS n_weeks, mean, sd,
             |        round(sd * sqrt(6.0) / pi(), 6) AS beta
             |      FROM mo),
             |f2 AS (SELECT n_weeks, beta,
             |        round(mean - 0.5772156649 * beta, 6) AS mu
             |      FROM fit)
             |SELECT CAST(n_weeks AS BIGINT) AS n_weeks, mu, beta,
             |  round(mu - beta * ln(-ln(1.0 - 1.0 / 4)), 2)
             |    AS rl_monthly,
             |  round(mu - beta * ln(-ln(1.0 - 1.0 / 13)), 2)
             |    AS rl_quarterly,
             |  round(mu - beta * ln(-ln(1.0 - 1.0 / 52)), 2)
             |    AS rl_yearly
             |FROM f2 ORDER BY n_weeks""".stripMargin)),
    // PERMANOVA pseudo-F (Anderson, Austral Ecology 2001; with
    // Euclidean distance it reduces to the classical multivariate
    // ANOVA identity SSW = Σ‖x − centroid_g‖², so NO pairwise
    // distance matrix exists at any scale): do the embedding labels
    // explain the geometry — the significance companion to x215's
    // silhouette (silhouette scores the clustering, pseudo-F tests
    // the partition) on the exact same table. One posexplode pass:
    // per-(label, dim) sums give SSB via the centroid identity,
    // per-row squared norms give SST; R² = SSB/SST and
    // F = (SSB/(k−1))/(SSW/(n−k)) are 1-row algebra. The permutation
    // p-value is deliberately left to the x269 hash-lane pattern —
    // stated, not hidden.
    QuerySpec(
      "x304_permanova",
      (s, dir) => {
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("label"), col("dim"),
            col("v").cast("double").as("v"))
          .localCheckpoint() // feeds group sums, grand sums, and SST
        val g = ex.groupBy("label", "dim")
          .agg(sum(round(col("v"), 6).cast("decimal(38,6)"))
            .cast("double").as("sv"), count(lit(1)).as("ng"))
        val gg = g.groupBy("dim")
          .agg(sum(col("sv").cast("decimal(38,6)")).cast("double")
            .as("st"), sum(col("ng")).as("nn"))
        val ssb = g.join(broadcast(gg), "dim")
          .select(round(col("sv") * col("sv") / col("ng") -
            lit(2.0) * col("sv") * col("st") / col("nn") +
            col("st") * col("st") * col("ng") / (col("nn") *
              col("nn")), 9).cast("decimal(38,9)").as("t"))
          .agg(sum(col("t")).cast("double").as("ssb"))
        val sst = ex.crossJoin(broadcast(gg.agg(
            (sum(col("st") * col("st")) / max(col("nn"))).as("gnorm"),
            max(col("nn")).as("nn"))))
          .agg(sum(round(col("v") * col("v"), 6).cast("decimal(38,6)"))
            .cast("double").as("sq"), max(col("gnorm")).as("gnorm"),
            max(col("nn")).as("nn"))
          .select((col("sq") - col("gnorm")).as("sst"), col("nn"))
        val k = Tables.embeddings(s, dir)
          .agg(countDistinct(col("label")).as("k"),
            count(lit(1)).as("nv"))
        ssb.crossJoin(broadcast(sst)).crossJoin(broadcast(k))
          .select(col("nv").as("n_vectors"), col("k").as("n_labels"),
            round(col("ssb"), 4).as("ss_between"),
            round(col("sst") - col("ssb"), 4).as("ss_within"),
            round(col("ssb") / col("sst"), 6).as("r_squared"),
            round((col("ssb") / (col("k") - 1L)) /
              ((col("sst") - col("ssb")) / (col("nv") - col("k"))), 6)
              .as("pseudo_f"))
          .orderBy("n_vectors")
      },
      Some("""WITH ex AS (SELECT vec_id, label, g.i - 1 AS dim,
             |        CAST(embedding[g.i] AS DOUBLE) AS v
             |      FROM embeddings CROSS JOIN (SELECT unnest(
             |        range(1, 65)) AS i) g),
             |g AS (SELECT label, dim,
             |        CAST(SUM(CAST(round(v, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sv,
             |        COUNT(*) AS ng
             |      FROM ex GROUP BY 1, 2),
             |gg AS (SELECT dim,
             |        CAST(SUM(CAST(sv AS DECIMAL(38,6))) AS DOUBLE)
             |          AS st,
             |        SUM(ng) AS nn
             |      FROM g GROUP BY 1),
             |ssb AS (SELECT CAST(SUM(CAST(round(
             |        g.sv * g.sv / g.ng -
             |        2.0 * g.sv * gg.st / gg.nn +
             |        gg.st * gg.st * g.ng / (gg.nn * gg.nn), 9)
             |        AS DECIMAL(38,9))) AS DOUBLE) AS ssb
             |      FROM g JOIN gg ON gg.dim = g.dim),
             |gn AS (SELECT SUM(st * st) / MAX(nn) AS gnorm,
             |        MAX(nn) AS nn FROM gg),
             |sst AS (SELECT
             |        CAST(SUM(CAST(round(v * v, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) - MAX(gn.gnorm) AS sst
             |      FROM ex CROSS JOIN gn),
             |k AS (SELECT COUNT(DISTINCT label) AS k, COUNT(*) AS nv
             |      FROM embeddings)
             |SELECT CAST(k.nv AS BIGINT) AS n_vectors,
             |  CAST(k.k AS BIGINT) AS n_labels,
             |  round(ssb.ssb, 4) AS ss_between,
             |  round(sst.sst - ssb.ssb, 4) AS ss_within,
             |  round(ssb.ssb / sst.sst, 6) AS r_squared,
             |  round((ssb.ssb / (k.k - 1)) /
             |    ((sst.sst - ssb.ssb) / (k.nv - k.k)), 6) AS pseudo_f
             |FROM ssb CROSS JOIN sst CROSS JOIN k
             |ORDER BY n_vectors""".stripMargin)))
}
