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
object ExtensionStats2Queries {

  def all: Seq[QuerySpec] = Seq(
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
        // fan the under-split events scan before the per-row parse_json
        // (guide §2.5; no-op on a well-split table), projecting first so
        // only the needed columns cross the exchange (guide §2.3)
        val iv = Tables.fanOut(Tables.events(s, dir)
            .select(col("user_id"), to_date(col("ts")).as("day"),
              col("props"), col("value")), col("user_id"))
          .select(col("user_id"), col("day"),
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
          // The normalizer is a GLOBAL sum of the ITEM-VOCAB-bounded raw
          // strengths, so it rides a partition-less window over the
          // aggregate instead of a separate agg + crossJoin(broadcast)
          // branch — one consumer of raw, no tot subtree. The checkpoint
          // stays, but ONCE per step instead of the old
          // checkpoint+agg+broadcast trio: the next step joins p on BOTH
          // sides (p and pj), and an unpinned lazy p would re-evaluate
          // the whole previous-step subtree per side (measured: the
          // window-only form read 3.4 s — flat — exactly because of that
          // doubling; window+checkpoint reads ~2.6 s). Same decimal sum,
          // same rounding; scale-safe because the window input is the
          // |items|-row aggregate (PlansSpec rule 1).
          raw.withColumn("sraw",
              sum(col("raw").cast("decimal(18,6)")).over(WgAll)
                .cast("double"))
            .select(col("i"), round(col("raw") / col("sraw"), 6).as("p"))
            .localCheckpoint()
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
             |        CASE WHEN COUNT(*) > 1 THEN
             |          round(sqrt((CAST(SUM(n * n) AS DOUBLE) -
             |            CAST(SUM(n) AS DOUBLE) * SUM(n) / COUNT(*)) /
             |            (COUNT(*) - 1)), 6) ELSE 0.0 END AS sigma
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
            // one-day guard, mirrored in EwmaChart.fromCounts
            when(col("d") > 1,
              round(sqrt((col("snn").cast("double") -
                col("sn").cast("double") * col("sn") / col("d")) /
                (col("d") - 1)), 6)).otherwise(lit(0.0)).as("sigma"))
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
             |        CASE WHEN COUNT(*) > 1 THEN
             |          round(sqrt((CAST(SUM(n * n) AS DOUBLE) -
             |            CAST(SUM(n) AS DOUBLE) * SUM(n) / COUNT(*)) /
             |            (COUNT(*) - 1)), 6) ELSE 0.0 END AS sigma
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
        val base = m0.localCheckpoint()
        val channels = Seq("click", "error", "signup", "view")
        def removed(c: String) = base.filter(col("i") =!= c)
          .select(col("i"),
            when(col("j") === c, lit("null")).otherwise(col("j")).as("j"),
            col("p"))
          .groupBy("i", "j").agg(sum(col("p")).as("p"))
        // ONE squaring chain for all five variants, keyed by a `v`
        // column (round-10 advisor ask): the per-variant chains never
        // interact — the join requires equal v on both sides — so
        // stacking them turns 5 chains × 10 squarings (~50 bounded
        // Spark jobs of pure scheduler overhead) into 10 joins over a
        // ≤245-row frame, with the every-other-round checkpoint kept.
        // Per-variant arithmetic (and its 9-dp DECIMAL rounding) is
        // unchanged, so the oracle replays bit-identically.
        val stacked = base.withColumn("v", lit("base"))
          .unionByName(channels.map(c =>
            removed(c).withColumn("v", lit(c))).reduce(_ unionByName _))
        // The squaring chain runs on a SCHEMA-bounded matrix: states are
        // the event-type enum (7 incl. start/conv/null), so the stacked
        // frame is <= 5 x 49 rows BY CONSTRUCTION — k-bounded the same
        // way x74's collected merge list is. Ten distributed join+agg
        // rounds on it were 10 bounded Spark jobs of pure scheduler
        // overhead (r16 profiler: 81 jobs, 3.9 s, every stage < 0.5 s of
        // task time); the squarings now run on the driver with the SAME
        // arithmetic step for step — round(p_a*p_b, 9) HALF_UP, exact
        // DECIMAL(18,9) summation, cast double, round 9 — so the values
        // are bit-identical (oracle replays the same chain in SQL and
        // still hash-matches). The corpus-sized work (events window,
        // transition counts) stays in Spark; only the 7x7-per-variant
        // matrix power moved.
        val rm = java.math.RoundingMode.HALF_UP
        def r9(x: Double): Double =
          java.math.BigDecimal.valueOf(x).setScale(9, rm).doubleValue
        var mat: Map[(String, String, String), Double] = stacked.collect()
          .map(r => ((r.getAs[String]("v"), r.getAs[String]("i"),
            r.getAs[String]("j")), r.getAs[Double]("p"))).toMap
        for (_ <- 1 to 10) {
          val next = scala.collection.mutable.HashMap
            .empty[(String, String, String), java.math.BigDecimal]
          mat.foreach { case ((v, i, k), pa) =>
            mat.foreach { case ((v2, k2, j), pb) =>
              if (v2 == v && k2 == k) {
                val term = java.math.BigDecimal.valueOf(r9(pa * pb))
                  .setScale(9, rm)
                val key = (v, i, j)
                next(key) = next.get(key).map(_.add(term)).getOrElse(term)
              }
            }
          }
          mat = next.map { case (key, s) =>
            key -> r9(s.doubleValue)
          }.toMap
        }
        val cur = s.createDataFrame(mat.toSeq.map { case ((v, i, j), p) =>
          (v, i, j, p)
        }).toDF("v", "i", "j", "p")
        // left join against the variant list so a variant whose
        // start→conv mass vanished still reports 0.0 (the old per-chain
        // agg-on-empty behavior)
        val vlist = (Seq("base") ++ channels).toDF("v")
        val pAll = vlist.join(
            cur.filter(col("i") === "start" && col("j") === "conv")
              .groupBy("v").agg(sum(col("p")).as("p")),
            Seq("v"), "left")
          .na.fill(0.0, Seq("p"))
        val pBase = pAll.filter(col("v") === "base")
          .select(col("p").as("p_base"))
        val rows = pAll.filter(col("v") =!= "base")
          .select(col("v").as("channel"), col("p").as("pr"))
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
             |FROM t ORDER BY d""".stripMargin)))
}
