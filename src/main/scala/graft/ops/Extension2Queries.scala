package graft.ops

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Round-11 extension queries (x305+): the analytics tail continues —
  * concentration indexes, spectral/robust statistics, cluster validity,
  * and embedding-geometry reads — each oracle-checked against DuckDB and
  * priced with a 10x scale probe in the same commit (COVERAGE.md
  * discipline). Split from [[ExtensionQueries]] purely to keep that file's
  * single registry `Seq` from growing without bound.
  */
object Extension2Queries {

  def all: Seq[QuerySpec] = Seq(

    // Herfindahl-Hirschman concentration index (Herfindahl 1950;
    // Hirschman 1945/1964 AER note on who invented it first) of revenue
    // share, by customer market segment and by customer nation — the
    // antitrust-standard concentration read complementing x statistical
    // dispersion (Gini/Lorenz measure inequality ACROSS units; HHI
    // measures how few units hold the mass: sum of squared shares, 1/k
    // at perfect balance, 1.0 at monopoly). Normalized form
    // (HHI − 1/k)/(1 − 1/k) rescales to [0,1] across unequal group
    // counts. Scale shape: ONE fact-dim equi-join feeds a 2x row-local
    // fan-out (struct explode), then everything is group-bounded
    // aggregates (|segments| + |nations| rows); shares and share² sums
    // ride the round-6/9 DECIMAL bridge so both engines sum exactly.
    QuerySpec(
      "x305_herfindahl",
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .join(Tables.customer(s, dir),
            col("o_custkey") === col("c_custkey"))
          .select(explode(array(
            struct(lit("segment").as("dim"),
              col("c_mktsegment").as("grp")),
            struct(lit("nation").as("dim"),
              col("c_nationkey").cast("string").as("grp")))).as("dg"),
            col("o_totalprice"))
          .select(col("dg.dim").as("dim"), col("dg.grp").as("grp"),
            col("o_totalprice"))
        val g = base.groupBy("dim", "grp")
          .agg(sum(round(col("o_totalprice"), 6).cast("decimal(18,6)"))
            .cast("double").as("rev"))
        val t = g.groupBy("dim")
          .agg(sum(col("rev").cast("decimal(18,6)")).cast("double")
            .as("tot"), count(lit(1)).as("k"))
        g.join(t, "dim")
          .groupBy("dim")
          .agg(max(col("k")).as("n_groups"),
            sum(round((col("rev") / col("tot")) * (col("rev") / col("tot")),
              9).cast("decimal(18,9)")).cast("double").as("hhi0"),
            max(round(col("rev") / col("tot"), 6)).as("top_share"))
          .select(col("dim"), col("n_groups"),
            round(col("hhi0"), 6).as("hhi"),
            round((col("hhi0") - lit(1.0) / col("n_groups")) /
              (lit(1.0) - lit(1.0) / col("n_groups")), 6).as("hhi_norm"),
            col("top_share"))
          .orderBy("dim")
      },
      Some("""WITH base AS (SELECT dg.dim, dg.grp, o.o_totalprice
             |      FROM orders o JOIN customer c
             |        ON o.o_custkey = c.c_custkey,
             |      LATERAL (SELECT unnest([
             |        {'dim': 'segment', 'grp': c.c_mktsegment},
             |        {'dim': 'nation',
             |         'grp': CAST(c.c_nationkey AS VARCHAR)}],
             |        recursive := true)) dg(dim, grp)),
             |g AS (SELECT dim, grp,
             |        CAST(SUM(CAST(round(o_totalprice, 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS rev
             |      FROM base GROUP BY 1, 2),
             |t AS (SELECT dim,
             |        CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE)
             |          AS tot,
             |        COUNT(*) AS k
             |      FROM g GROUP BY 1),
             |h AS (SELECT g.dim, MAX(t.k) AS n_groups,
             |        CAST(SUM(CAST(round((g.rev / t.tot) * (g.rev / t.tot),
             |          9) AS DECIMAL(18,9))) AS DOUBLE) AS hhi0,
             |        MAX(round(g.rev / t.tot, 6)) AS top_share
             |      FROM g JOIN t ON t.dim = g.dim GROUP BY 1)
             |SELECT dim, CAST(n_groups AS BIGINT) AS n_groups,
             |  round(hhi0, 6) AS hhi,
             |  round((hhi0 - 1.0 / n_groups) / (1.0 - 1.0 / n_groups), 6)
             |    AS hhi_norm,
             |  top_share
             |FROM h ORDER BY dim""".stripMargin)),

    // Effective rank of the embedding covariance via the participation
    // ratio PR = tr(C)² / ‖C‖²_F = (Σλ)²/Σλ² (Roy & Vetterli, EUSIPCO
    // 2007 call the entropy variant "effective rank"; the participation
    // ratio is the standard closed-form proxy in the representation-
    // collapse literature). The 100 TB insight: PR needs NO
    // eigendecomposition — tr(C) and Σ_ij C_ij² come from the raw second
    // moments, so the whole read is ONE linear scan. Determinism +
    // speed come from fixed-pointing the INPUT once (4-dp integer units
    // per coordinate — floats carry ~7 significant digits, and the read
    // is insensitive at its own 9-dp rounding): the 64x64 outer product
    // is then PURE LONG multiplies (row-local, codegen'd) and the grid
    // aggregation a two-level order-free sum with map-side combine into
    // 4096 cells — no per-element BigDecimal (the decimal-sum first cut
    // paid 14.9 s at sf0.1; this form ~1 s). Element bound: |x|·10⁴ ≤
    // ~5·10⁴, so a per-row cell product is ≤ ~2.5·10⁹ and a single
    // flat Long cell sum would wrap past ~3.7·10⁹ vectors — reachable at
    // the 100 TB design point, so the sum IS sharded (round-14 judge ask
    // #2, mechanism tested in ShardedSumSpec): level 1 sums Longs inside
    // each scan partition (split size bounds a shard at ≲250k vectors ×
    // 2.5·10⁹ ≈ 6·10¹⁴ « 2⁶³ — exceeding it would need a single 2 TB
    // input split), level 2 sums the per-shard partials as DECIMAL(38,0),
    // exact at any corpus size. The first-moment sums (si) stay flat
    // Longs: |x|·10⁴ ≤ 5·10⁴ per row bounds them to ~1.8·10¹⁴ rows,
    // three decades past the design point. PR near dim =
    // isotropic (healthy); PR « dim = collapsed directions — the global
    // twin of x277's mean-pairwise-cosine anisotropy read.
    QuerySpec(
      "x306_effective_rank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val nd = e.agg(count(lit(1)).as("n"),
          max(size(col("embedding"))).as("dim"))
        // fan the under-split scan before the two moment explodes (the
        // 2080-cell Gram expansion and the per-dim sums both sit above the
        // first exchange — measured 2×2.0 s single-task at sf0.1; guide
        // §2.5, no-op on a well-split table). ShardedSum's two-level sum
        // is exact under ANY row placement, so the fan-out cannot move a
        // value.
        val ints = Tables.fanOut(e.select(col("vec_id"), expr(
          """transform(embedding,
            |  x -> CAST(round(CAST(x AS DOUBLE) * 10000.0, 0) AS BIGINT))"""
            .stripMargin).as("iv")), col("vec_id"))
          .select(col("iv"))
        // upper triangle only (round-15): the Gram matrix is symmetric and
        // x_i*x_j = x_j*x_i is EXACT in longs, so exploding j >= i (2080
        // cells/row instead of 4096) and mirroring after the aggregate
        // halves the dominant explode+hash-agg term's CPU. The mirrored
        // union references qUp twice; single execution of the heavy
        // subtree rests on AQE RUNTIME stage reuse (both branches share
        // one expression tree, so the idx-exchange canonicalizes equal
        // and the second branch reads the materialized stage — verified
        // ReusedQueryStage>=1 in the EXECUTED plan; the initial static
        // plan always prints both branches, which is not evidence of
        // double work). PlansSpec gates this so a Spark-config or
        // canonicalization regression that silently re-doubles the
        // explode turns a test red instead of a cluster bill.
        val qUp = ShardedSum.byKey(
            ints.select(explode(expr(
              """flatten(transform(iv, (x, i) ->
                |  transform(slice(iv, i + 1, 64 - i), (y, jj) ->
                |    named_struct('idx', i * 64 + i + jj, 'p', x * y))))"""
                .stripMargin)).as("s"))
              .select(col("s.idx").as("idx"), col("s.p").as("p")),
            Seq("idx"), col("p"), "ql")
          .select(expr("idx div 64").as("i"), (col("idx") % 64).as("j"),
            (col("ql").cast("double") / 100000000.0).as("q"))
        val q = qUp.unionByName(qUp.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("q")))
        val sm = ints.select(posexplode(col("iv")).as(Seq("i", "v")))
          .groupBy("i")
          .agg((sum(col("v")).cast("double") / 10000.0).as("si"))
        val c = q
          .join(sm.select(col("i"), col("si")), "i")
          .join(sm.select(col("i").as("j"), col("si").as("sj")), "j")
          .crossJoin(broadcast(nd))
          .select(col("i"), col("j"), col("n"), col("dim"),
            round(col("q") / col("n") -
              (col("si") / col("n")) * (col("sj") / col("n")), 9).as("c"))
        c.groupBy("n", "dim")
          .agg(
            sum(when(col("i") === col("j"), col("c").cast("decimal(38,9)"))
              .otherwise(lit(0).cast("decimal(38,9)"))).cast("double")
              .as("tr"),
            sum(round(col("c") * col("c"), 12).cast("decimal(38,12)"))
              .cast("double").as("fro"))
          .select(col("n").as("n_vectors"),
            col("dim").cast("long").as("dim"),
            round(col("tr"), 6).as("trace"),
            round(col("tr") * col("tr") / col("fro"), 4)
              .as("effective_rank"),
            round(col("tr") * col("tr") / col("fro") / col("dim"), 6)
              .as("er_ratio"))
          .orderBy("n_vectors")
      },
      Some("""WITH e AS (SELECT vec_id,
             |        [CAST(round(CAST(x AS DOUBLE) * 10000.0, 0) AS BIGINT)
             |          for x in embedding] AS iv
             |      FROM embeddings),
             |nd AS (SELECT COUNT(*) AS n, MAX(len(iv)) AS dim FROM e),
             |q AS (SELECT r1.i, r2.j,
             |        CAST(SUM(iv[r1.i + 1] * iv[r2.j + 1]) AS DOUBLE)
             |          / 100000000.0 AS q
             |      FROM e CROSS JOIN range(64) r1(i)
             |        CROSS JOIN range(64) r2(j)
             |      GROUP BY 1, 2),
             |sm AS (SELECT r.i,
             |        CAST(SUM(iv[r.i + 1]) AS DOUBLE) / 10000.0 AS si
             |      FROM e CROSS JOIN range(64) r(i) GROUP BY 1),
             |c AS (SELECT q.i, q.j, nd.n, nd.dim,
             |        round(q.q / nd.n -
             |          (a.si / nd.n) * (b.si / nd.n), 9) AS c
             |      FROM q JOIN sm a ON a.i = q.i
             |        JOIN sm b ON b.i = q.j
             |        CROSS JOIN nd),
             |f AS (SELECT n, dim,
             |        CAST(SUM(CASE WHEN i = j
             |          THEN CAST(c AS DECIMAL(38,9))
             |          ELSE CAST(0 AS DECIMAL(38,9)) END) AS DOUBLE) AS tr,
             |        CAST(SUM(CAST(round(c * c, 12) AS DECIMAL(38,12)))
             |          AS DOUBLE) AS fro
             |      FROM c GROUP BY 1, 2)
             |SELECT CAST(n AS BIGINT) AS n_vectors,
             |  CAST(dim AS BIGINT) AS dim,
             |  round(tr, 6) AS trace,
             |  round(tr * tr / fro, 4) AS effective_rank,
             |  round(tr * tr / fro / dim, 6) AS er_ratio
             |FROM f ORDER BY n_vectors""".stripMargin)),

    // Nelson-Aalen cumulative hazard (Nelson 1972, Aalen 1978) over the
    // same right-censored time-to-first-error durations as x124's
    // Kaplan-Meier — the ADDITIVE twin of KM's product-limit curve:
    // H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, preferred when the hazard itself (not
    // survival) is the read, and the Fleming-Harrington survival
    // exp(−H) it implies is the standard small-risk-set alternative to
    // KM. Because the estimator is a SUM, no recursive product fold is
    // needed: the whole curve is two windows over the |distinct t|
    // aggregate (at-risk integer running sum + a DECIMAL(18,9) running
    // sum of rounded hazard increments), both Rule-1-safe. Scale shape:
    // subjects collapse to the duration aggregate first, same as x124.
    QuerySpec(
      "x307_nelson_aalen",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
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
        val agg = durations.groupBy("t")
          .agg(sum(col("obs")).as("d"),
            sum(lit(1L) - col("obs")).as("c"))
        val tot = durations.agg(count(lit(1)).as("n"))
        val wPrior = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
        val wCum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
        agg.crossJoin(broadcast(tot))
          .withColumn("n_at_risk",
            col("n") - coalesce(sum(col("d") + col("c")).over(wPrior),
              lit(0L)))
          .withColumn("hinc",
            round(col("d").cast("double") / col("n_at_risk"), 9)
              .cast("decimal(18,9)"))
          .withColumn("h", sum(col("hinc")).over(wCum).cast("double"))
          .select(col("t"), col("n_at_risk"), col("d").as("n_events"),
            round(col("h"), 6).as("cum_hazard"),
            round(exp(-col("h")), 6).as("fh_survival"))
          .orderBy("t")
      },
      Some("""WITH span AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             |        MIN(CASE WHEN event_type = 'error'
             |          THEN CAST(ts AS DATE) END) AS e
             |      FROM events GROUP BY 1),
             |g AS (SELECT MAX(greatest(f, e)) AS gmax FROM span),
             |u AS (SELECT CAST(CASE WHEN e IS NOT NULL
             |          THEN datediff('day', f, e)
             |          ELSE datediff('day', f, g.gmax) END AS BIGINT) AS t,
             |        CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS obs
             |      FROM span CROSS JOIN g),
             |agg AS (SELECT t, SUM(obs) AS d, SUM(1 - obs) AS c FROM u
             |      GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n FROM u),
             |r AS (SELECT t, d, c,
             |        tot.n - COALESCE(SUM(d + c) OVER (ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) AS n_at_risk
             |      FROM agg CROSS JOIN tot),
             |h AS (SELECT t, n_at_risk, d,
             |        CAST(SUM(CAST(round(CAST(d AS DOUBLE) / n_at_risk, 9)
             |          AS DECIMAL(18,9))) OVER (ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS DOUBLE) AS h
             |      FROM r)
             |SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
             |  CAST(d AS BIGINT) AS n_events,
             |  round(h, 6) AS cum_hazard,
             |  round(exp(-h), 6) AS fh_survival
             |FROM h ORDER BY t""".stripMargin)),

    // Schuster periodogram at candidate calendar periods (Schuster 1898;
    // Fisher's g-test, 1929, motivates the relative-power read) of the
    // mean-centered daily event-count series — the frequency-domain
    // seasonality detector next to the time-domain suite (x231 trend,
    // x227/x236 control charts, x?? dow chi-square): for period P,
    // I(P) = (Σdev·cos(2πt/P))² + (Σdev·sin(2πt/P))², reported with its
    // share of the tested-grid total. Determinism devices live in the
    // shared [[Periodogram]] core (angle reduced mod-period, trig rounded
    // at 10 dp, DECIMAL sums — the x236 rounded-transcendental device),
    // which the PeriodogramStream twin consumes verbatim. Scale: the
    // corpus collapses to the calendar-bounded day grid FIRST; the
    // (day x period) lattice is |days|·7 rows of pure row-local math.
    QuerySpec(
      "x308_periodogram",
      (s, dir) => Periodogram.fromCounts(
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))),
      Some("""WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) AS BIGINT) AS t,
             |        COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |m AS (SELECT COUNT(*) AS nd,
             |        round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS mu
             |      FROM d),
             |grid AS (SELECT p.p, m.nd,
             |        round(d.n - m.mu, 6) AS dev,
             |        6.283185307179586 * CAST(d.t % p.p AS DOUBLE) /
             |          CAST(p.p AS DOUBLE) AS ang
             |      FROM d CROSS JOIN m
             |        CROSS JOIN (SELECT unnest([2, 3, 5, 7, 10, 14, 30])
             |          AS p) p),
             |pw AS (SELECT p AS period, MAX(nd) AS n_days,
             |        CAST(SUM(CAST(round(dev * round(cos(ang), 10), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS cs,
             |        CAST(SUM(CAST(round(dev * round(sin(ang), 10), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS ss
             |      FROM grid GROUP BY 1),
             |pp AS (SELECT period, n_days,
             |        round((cs * cs + ss * ss) / n_days, 4) AS power
             |      FROM pw),
             |tot AS (SELECT CAST(SUM(CAST(power AS DECIMAL(18,4)))
             |          AS DOUBLE) AS tp FROM pp)
             |SELECT CAST(period AS BIGINT) AS period,
             |  CAST(n_days AS BIGINT) AS n_days, power,
             |  round(power / tot.tp, 6) AS rel_power
             |FROM pp CROSS JOIN tot ORDER BY period""".stripMargin)),

    // Theil's uncertainty coefficient (Theil 1970) between day-of-week
    // and event type — the ASYMMETRIC categorical-association read the
    // suite's Cramér's V (symmetric, chi-square-based) can't give:
    // U(type|dow) = I(type;dow)/H(type) answers "how much does knowing
    // the weekday reduce event-type uncertainty" and U(dow|type) the
    // converse; both are 0 under independence and 1 under perfect
    // prediction. Exact: the corpus collapses to the 7x5 contingency
    // grid, entropies are Σ(c/N)·ln(N/c) with rounded-9 log terms into
    // DECIMAL sums — bounded algebra end to end.
    QuerySpec(
      "x309_theils_u",
      (s, dir) => {
        val g = Tables.events(s, dir)
          .groupBy(expr("datediff(to_date(ts), DATE '1970-01-01') % 7")
            .cast("long").as("dow"), col("event_type"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // <= 35 cells feed all four entropies
        val n = g.agg(sum(col("c")).as("n"))
        def ent(keyed: org.apache.spark.sql.DataFrame) = keyed
          .crossJoin(broadcast(n))
          .select(round((col("k").cast("double") / col("n")) *
            log(col("n").cast("double") / col("k")), 9)
            .cast("decimal(18,9)").as("term"))
          .agg(sum(col("term")).cast("double").as("h"))
        val hx = ent(g.groupBy("event_type").agg(sum(col("c")).as("k")))
          .select(col("h").as("hx"))
        val hy = ent(g.groupBy("dow").agg(sum(col("c")).as("k")))
          .select(col("h").as("hy"))
        val hxy = ent(g.select(col("c").as("k")))
          .select(col("h").as("hxy"))
        hx.crossJoin(broadcast(hy)).crossJoin(broadcast(hxy))
          .crossJoin(broadcast(n))
          .select(col("n").as("n_events"),
            round(col("hx"), 6).as("h_type"),
            round(col("hy"), 6).as("h_dow"),
            round(col("hx") + col("hy") - col("hxy"), 6).as("mi"),
            round((col("hx") + col("hy") - col("hxy")) / col("hx"), 6)
              .as("u_type_given_dow"),
            round((col("hx") + col("hy") - col("hxy")) / col("hy"), 6)
              .as("u_dow_given_type"),
            round(lit(2.0) * (col("hx") + col("hy") - col("hxy")) /
              (col("hx") + col("hy")), 6).as("u_symmetric"))
          .orderBy("n_events")
      },
      Some("""WITH g AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) % 7 AS BIGINT) AS dow,
             |        event_type, COUNT(*) AS c
             |      FROM events GROUP BY 1, 2),
             |n AS (SELECT SUM(c) AS n FROM g),
             |hx AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(k AS DOUBLE) / n.n) *
             |        ln(CAST(n.n AS DOUBLE) / k), 9) AS DECIMAL(18,9)))
             |        AS DOUBLE) AS hx
             |      FROM (SELECT event_type, SUM(c) AS k FROM g GROUP BY 1)
             |        CROSS JOIN n),
             |hy AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(k AS DOUBLE) / n.n) *
             |        ln(CAST(n.n AS DOUBLE) / k), 9) AS DECIMAL(18,9)))
             |        AS DOUBLE) AS hy
             |      FROM (SELECT dow, SUM(c) AS k FROM g GROUP BY 1)
             |        CROSS JOIN n),
             |hxy AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(c AS DOUBLE) / n.n) *
             |        ln(CAST(n.n AS DOUBLE) / c), 9) AS DECIMAL(18,9)))
             |        AS DOUBLE) AS hxy
             |      FROM g CROSS JOIN n)
             |SELECT CAST(n.n AS BIGINT) AS n_events,
             |  round(hx.hx, 6) AS h_type,
             |  round(hy.hy, 6) AS h_dow,
             |  round(hx.hx + hy.hy - hxy.hxy, 6) AS mi,
             |  round((hx.hx + hy.hy - hxy.hxy) / hx.hx, 6)
             |    AS u_type_given_dow,
             |  round((hx.hx + hy.hy - hxy.hxy) / hy.hy, 6)
             |    AS u_dow_given_type,
             |  round(2.0 * (hx.hx + hy.hy - hxy.hxy) / (hx.hx + hy.hy), 6)
             |    AS u_symmetric
             |FROM hx CROSS JOIN hy CROSS JOIN hxy CROSS JOIN n
             |ORDER BY n_events""".stripMargin)),

    // Kendall's coefficient of concordance W (Kendall & Babington Smith,
    // Ann. Math. Stat. 1939), tie-corrected: do the m weekly "judges"
    // agree on how they rank the 5 event types by volume? W=1 means every
    // week ranks the types identically (a stable product), W≈0 means the
    // weekly type ordering is noise — the multi-judge generalization of
    // x240's two-half Kendall tau. Average ranks within each week come
    // from rank() + (ties−1)/2 (halves are exactly representable, so the
    // rank table is bit-identical in both engines); the tie correction
    // Σ(t³−t) and every squared deviation are exact integers/halves until
    // the single final division. χ² = m(n−1)W reports against the
    // published df=4, α=0.05 critical 9.488 (the x275 constant). Scale:
    // corpus → (week, type) counts → a ≤|weeks|x5 rank lattice.
    QuerySpec(
      "x310_kendall_w",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val wk0 = Tables.events(s, dir)
          .groupBy(expr("CAST(floor(datediff(to_date(ts), " +
            "DATE '1970-01-01') / 7) AS BIGINT)").as("week"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
        // COMPLETE WEEKS ONLY (the x303 device; round-11 advice): a week
        // missing an event type would rank only the k<nt types present,
        // while the deviation term below assumes the global expectation
        // m(nt+1)/2 — silently skewing rsum and letting W leave [0,1] on
        // sparse spans. Restricting the judge panel to weeks that rank
        // ALL types keeps the Kendall-W identity exact.
        val ntAll = wk0.agg(countDistinct(col("event_type")).as("ntall"))
        val complete = wk0.groupBy("week")
          .agg(countDistinct(col("event_type")).as("k"))
          .crossJoin(broadcast(ntAll))
          .filter(col("k") === col("ntall")).select("week")
        val wk = wk0.join(broadcast(complete), Seq("week"))
        val ranked = wk
          .withColumn("rmin", rank().over(
            W.partitionBy("week").orderBy("c")))
          .withColumn("ties", count(lit(1)).over(
            W.partitionBy("week", "c")))
          .select(col("week"), col("event_type"),
            (col("rmin").cast("double") +
              (col("ties") - 1).cast("double") / 2.0).as("r"))
        val rj = ranked.groupBy("event_type")
          .agg(sum(col("r")).as("rsum"))
        val mn = ranked.agg(
          countDistinct(col("week")).as("m"),
          countDistinct(col("event_type")).as("nt"))
        val tie = wk.groupBy("week", "c").agg(count(lit(1)).as("t"))
          .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tt"))
        val dev = rj.crossJoin(broadcast(mn))
          .select((col("rsum") - col("m").cast("double") *
            (col("nt") + 1).cast("double") / 2.0).as("d2v"))
          .agg(sum(round(col("d2v") * col("d2v"), 6)
            .cast("decimal(18,6)")).cast("double").as("ssd"))
        dev.crossJoin(broadcast(mn)).crossJoin(broadcast(tie))
          .select(col("m").as("n_weeks"), col("nt").as("n_types"),
            round(lit(12.0) * col("ssd") /
              (col("m").cast("double") * col("m") *
                (col("nt") * col("nt") * col("nt") - col("nt")) -
                col("m").cast("double") * col("tt")), 6).as("w"))
          .select(col("n_weeks"), col("n_types"), col("w"),
            round(col("n_weeks") * (col("n_types") - 1) * col("w"), 4)
              .as("chi2"),
            (col("n_weeks") * (col("n_types") - 1) * col("w") > 9.488)
              .cast("long").as("concordant_sig_05"))
          .orderBy("n_weeks")
      },
      Some("""WITH wk0 AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
             |          CAST(ts AS DATE)) // 7 AS BIGINT) AS week,
             |        event_type, COUNT(*) AS c
             |      FROM events GROUP BY 1, 2),
             |cw AS (SELECT week FROM wk0 GROUP BY week
             |      HAVING COUNT(DISTINCT event_type) =
             |        (SELECT COUNT(DISTINCT event_type) FROM wk0)),
             |wk AS (SELECT wk0.* FROM wk0 JOIN cw USING (week)),
             |rk AS (SELECT week, event_type,
             |        CAST(rank() OVER (PARTITION BY week ORDER BY c)
             |          AS DOUBLE) +
             |        CAST(COUNT(*) OVER (PARTITION BY week, c) - 1
             |          AS DOUBLE) / 2.0 AS r
             |      FROM wk),
             |rj AS (SELECT event_type, SUM(r) AS rsum FROM rk GROUP BY 1),
             |mn AS (SELECT COUNT(DISTINCT week) AS m,
             |        COUNT(DISTINCT event_type) AS nt FROM rk),
             |tie AS (SELECT SUM(t * t * t - t) AS tt FROM (
             |      SELECT week, c, COUNT(*) AS t FROM wk GROUP BY 1, 2)),
             |dev AS (SELECT CAST(SUM(CAST(round(
             |        (rsum - CAST(mn.m AS DOUBLE) *
             |          (mn.nt + 1) / 2.0) *
             |        (rsum - CAST(mn.m AS DOUBLE) *
             |          (mn.nt + 1) / 2.0), 6) AS DECIMAL(18,6)))
             |        AS DOUBLE) AS ssd
             |      FROM rj CROSS JOIN mn),
             |wst AS (SELECT mn.m AS n_weeks, mn.nt AS n_types,
             |        round(12.0 * dev.ssd /
             |          (CAST(mn.m AS DOUBLE) * mn.m *
             |            (mn.nt * mn.nt * mn.nt - mn.nt) -
             |            CAST(mn.m AS DOUBLE) * tie.tt), 6) AS w
             |      FROM dev CROSS JOIN mn CROSS JOIN tie)
             |SELECT CAST(n_weeks AS BIGINT) AS n_weeks,
             |  CAST(n_types AS BIGINT) AS n_types, w,
             |  round(n_weeks * (n_types - 1) * w, 4) AS chi2,
             |  CAST(n_weeks * (n_types - 1) * w > 9.488 AS BIGINT)
             |    AS concordant_sig_05
             |FROM wst ORDER BY n_weeks""".stripMargin)),

    // Lag-1 Granger-causality screen (Granger, Econometrica 1969)
    // between the daily 'view' and 'purchase' count series, BOTH
    // directions — the predictive-precedence read the contemporaneous
    // correlation suite can't give. The add-one-regressor F-test is
    // computed through its PARTIAL-CORRELATION identity (F =
    // (T−3)·r²_{y,x₁·y₁}/(1−r²)), so the whole test reduces to three
    // pairwise Pearson r's over exact integer lag moments — no matrix
    // solve, no per-row regression residuals. Significance reports
    // against the conservative F(1,30) critical 4.17 (documented: exact
    // df2 = T−3 ≥ 30 here, and F criticals fall as df2 grows, so a flag
    // at 4.17 never overclaims). Scale: corpus → calendar day grid →
    // (t, t−1) self-join on consecutive day index — all bounded.
    QuerySpec(
      "x311_granger_screen",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            sum((col("event_type") === "view").cast("long")).as("v"),
            sum((col("event_type") === "purchase").cast("long")).as("p"))
          .select(expr("datediff(day, DATE '1970-01-01')").cast("long")
            .as("t"), col("v"), col("p"))
          .localCheckpoint() // calendar-bounded; feeds both lag joins
        val lagged = d.as("a").join(d.as("b"),
            col("a.t") === col("b.t") + 1)
          .select(col("a.v").as("v"), col("a.p").as("p"),
            col("b.v").as("vl"), col("b.p").as("pl"))
          .localCheckpoint()
        def dirRow(yN: String, y1N: String, x1N: String, label: String) = {
          val (y, y1, x1) = (col(yN), col(y1N), col(x1N))
          lagged.agg(count(lit(1)).as("tn"),
              sum(y).as("sy"), sum(y1).as("sy1"), sum(x1).as("sx1"),
              sum(y * y).as("syy"), sum(y1 * y1).as("sy1y1"),
              sum(x1 * x1).as("sx1x1"), sum(y * y1).as("syy1"),
              sum(y * x1).as("syx1"), sum(y1 * x1).as("sy1x1"))
            .select(col("tn"),
              ((col("tn") * col("syy1") - col("sy") * col("sy1"))
                .cast("double") /
                sqrt((col("tn") * col("syy") - col("sy") * col("sy"))
                  .cast("double") *
                  (col("tn") * col("sy1y1") - col("sy1") * col("sy1"))
                    .cast("double"))).as("r_yy1"),
              ((col("tn") * col("syx1") - col("sy") * col("sx1"))
                .cast("double") /
                sqrt((col("tn") * col("syy") - col("sy") * col("sy"))
                  .cast("double") *
                  (col("tn") * col("sx1x1") - col("sx1") * col("sx1"))
                    .cast("double"))).as("r_yx1"),
              ((col("tn") * col("sy1x1") - col("sy1") * col("sx1"))
                .cast("double") /
                sqrt((col("tn") * col("sy1y1") - col("sy1") * col("sy1"))
                  .cast("double") *
                  (col("tn") * col("sx1x1") - col("sx1") * col("sx1"))
                    .cast("double"))).as("r_y1x1"))
            .select(col("tn"),
              round((col("r_yx1") - col("r_yy1") * col("r_y1x1")) /
                sqrt((lit(1.0) - col("r_yy1") * col("r_yy1")) *
                  (lit(1.0) - col("r_y1x1") * col("r_y1x1"))), 9)
                .as("pr"))
            .select(lit(label).as("direction"),
              col("tn").as("n_days"),
              round(col("pr"), 6).as("partial_r"),
              round((col("tn") - 3).cast("double") * col("pr") * col("pr") /
                (lit(1.0) - col("pr") * col("pr")), 4).as("f_stat"),
              ((col("tn") - 3).cast("double") * col("pr") * col("pr") /
                (lit(1.0) - col("pr") * col("pr")) > 4.17)
                .cast("long").as("causes_sig_05"))
        }
        dirRow("p", "pl", "vl", "view_causes_purchase")
          .unionByName(dirRow("v", "vl", "pl", "purchase_causes_view"))
          .orderBy("direction")
      },
      Some {
        def dirSql(y: String, y1: String, x1: String, label: String) =
          s"""SELECT '$label' AS direction, tn AS n_days,
             |  round(pr, 6) AS partial_r,
             |  round(CAST(tn - 3 AS DOUBLE) * pr * pr / (1.0 - pr * pr), 4)
             |    AS f_stat,
             |  CAST(CAST(tn - 3 AS DOUBLE) * pr * pr / (1.0 - pr * pr)
             |    > 4.17 AS BIGINT) AS causes_sig_05
             |FROM (SELECT tn,
             |  round((r_yx1 - r_yy1 * r_y1x1) /
             |    sqrt((1.0 - r_yy1 * r_yy1) * (1.0 - r_y1x1 * r_y1x1)), 9)
             |    AS pr
             |  FROM (SELECT tn,
             |    CAST(tn * syy1 - sy * sy1 AS DOUBLE) /
             |      sqrt(CAST(tn * syy - sy * sy AS DOUBLE) *
             |        CAST(tn * sy1y1 - sy1 * sy1 AS DOUBLE)) AS r_yy1,
             |    CAST(tn * syx1 - sy * sx1 AS DOUBLE) /
             |      sqrt(CAST(tn * syy - sy * sy AS DOUBLE) *
             |        CAST(tn * sx1x1 - sx1 * sx1 AS DOUBLE)) AS r_yx1,
             |    CAST(tn * sy1x1 - sy1 * sx1 AS DOUBLE) /
             |      sqrt(CAST(tn * sy1y1 - sy1 * sy1 AS DOUBLE) *
             |        CAST(tn * sx1x1 - sx1 * sx1 AS DOUBLE)) AS r_y1x1
             |  FROM (SELECT COUNT(*) AS tn,
             |    SUM($y) AS sy, SUM($y1) AS sy1, SUM($x1) AS sx1,
             |    SUM($y * $y) AS syy, SUM($y1 * $y1) AS sy1y1,
             |    SUM($x1 * $x1) AS sx1x1, SUM($y * $y1) AS syy1,
             |    SUM($y * $x1) AS syx1, SUM($y1 * $x1) AS sy1x1
             |  FROM lagged)))""".stripMargin
        s"""WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
           |        CAST(ts AS DATE)) AS BIGINT) AS t,
           |      SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
           |      SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |        AS p
           |    FROM events GROUP BY 1),
           |lagged AS (SELECT a.v AS v, a.p AS p, b.v AS vl, b.p AS pl
           |    FROM d a JOIN d b ON a.t = b.t + 1)
           |SELECT * FROM (
           |${dirSql("p", "pl", "vl", "view_causes_purchase")}
           |UNION ALL
           |${dirSql("v", "vl", "pl", "purchase_causes_view")})
           |ORDER BY direction""".stripMargin
      }),

    // Hodges-Lehmann pseudomedian (Hodges & Lehmann, Ann. Math. Stat.
    // 1963) of the daily event count: the median of all Walsh averages
    // (xᵢ+xⱼ)/2, i ≤ j — the location estimator dual to the Wilcoxon
    // signed-rank test, robust like the median but ~96% Gaussian-
    // efficient (the median is 64%). Walsh averages are exact HALVES of
    // integers, so the whole lattice is bit-identical across engines and
    // the only interpolation is the final percentile (both engines share
    // the sorted-linear-interpolation definition). Scale: the corpus
    // collapses to the calendar day grid FIRST; the Walsh lattice is
    // |days|²/2 over that bounded grid — never data-sized.
    QuerySpec(
      "x312_hodges_lehmann",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .select(expr("datediff(day, DATE '1970-01-01')").cast("long")
            .as("t"), col("n"))
          .localCheckpoint() // calendar-bounded; both Walsh join sides
        val walsh = d.as("a").join(d.as("b"), col("a.t") <= col("b.t"))
          .select(((col("a.n") + col("b.n")).cast("double") / 2.0)
            .as("w"))
        val hl = walsh.agg(count(lit(1)).as("n_walsh"),
          expr("percentile(w, 0.5)").as("hl"))
        val base = d.agg(count(lit(1)).as("n_days"),
          expr("percentile(CAST(n AS DOUBLE), 0.5)").as("med"),
          round(sum(col("n")).cast("double") / count(lit(1)), 6)
            .as("mean"))
        hl.crossJoin(broadcast(base))
          .select(col("n_days"), col("n_walsh"),
            round(col("hl"), 6).as("hl_pseudomedian"),
            round(col("med"), 6).as("median"),
            col("mean"))
          .orderBy("n_days")
      },
      Some("""WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
             |        CAST(ts AS DATE)) AS BIGINT) AS t, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |walsh AS (SELECT CAST(a.n + b.n AS DOUBLE) / 2.0 AS w
             |      FROM d a JOIN d b ON a.t <= b.t),
             |hl AS (SELECT COUNT(*) AS n_walsh,
             |        quantile_cont(w, 0.5) AS hl FROM walsh),
             |base AS (SELECT COUNT(*) AS n_days,
             |        quantile_cont(CAST(n AS DOUBLE), 0.5) AS med,
             |        round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS mean
             |      FROM d)
             |SELECT CAST(n_days AS BIGINT) AS n_days,
             |  CAST(n_walsh AS BIGINT) AS n_walsh,
             |  round(hl, 6) AS hl_pseudomedian,
             |  round(med, 6) AS median, mean
             |FROM hl CROSS JOIN base ORDER BY n_days""".stripMargin)),

    // Paired sign test (Arbuthnott 1710 — the oldest significance test
    // on record; Dixon & Mood 1946 for the modern form) of first-half vs
    // second-half daily volume, matched by position within each half
    // (day k pairs with day k+H, which aligns weekday phase whenever the
    // span is a whole number of weeks): distribution-free — no variance,
    // no normality, just signs of differences. z uses the continuity-
    // corrected normal approximation (|pos − n/2| − 0.5)/√(n/4), ties
    // dropped per Dixon-Mood. The nonparametric sibling of x313's
    // parametric paired reads. Scale: corpus → day grid → an H-row
    // position join — all calendar-bounded.
    QuerySpec(
      "x313_sign_test",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // ts IS NOT NULL (round-12, AdversarialDataSpec): a null timestamp
        // has no day — and the null DAY GRID ROW would otherwise sit at a
        // different end of the row_number index in each engine (Spark
        // orders nulls first, DuckDB last), shifting every half-spaced pair
        val d = Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("idx", row_number().over(W.orderBy("day"))
            .cast("long") - 1)
          .localCheckpoint() // calendar-bounded day grid + index
        val h = d.agg((count(lit(1)) / 2).cast("long").as("hn"))
        val pairs = d.as("a").crossJoin(broadcast(h))
          .filter(col("a.idx") < col("hn"))
          .join(d.as("b"),
            col("b.idx") === col("a.idx") + col("hn"))
          .select((col("b.n") - col("a.n")).as("diff"))
        pairs.agg(
            sum((col("diff") > 0).cast("long")).as("n_pos"),
            sum((col("diff") < 0).cast("long")).as("n_neg"),
            sum((col("diff") === 0).cast("long")).as("n_tie"))
          .select(col("n_pos"), col("n_neg"), col("n_tie"),
            (col("n_pos") + col("n_neg")).as("n_eff"))
          .select(col("n_eff").as("n_pairs_effective"),
            col("n_pos"), col("n_neg"), col("n_tie"),
            round((abs(col("n_pos").cast("double") -
              col("n_eff").cast("double") / 2.0) - 0.5) /
              sqrt(col("n_eff").cast("double") / 4.0), 6).as("z"),
            ((abs(col("n_pos").cast("double") -
              col("n_eff").cast("double") / 2.0) - 0.5) /
              sqrt(col("n_eff").cast("double") / 4.0) > 1.959964)
              .cast("long").as("shift_sig_05"))
          .orderBy("n_pairs_effective")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |di AS (SELECT n, row_number() OVER (ORDER BY day) - 1 AS idx
             |      FROM d),
             |h AS (SELECT COUNT(*) // 2 AS hn FROM di),
             |pairs AS (SELECT b.n - a.n AS diff
             |      FROM di a CROSS JOIN h
             |        JOIN di b ON b.idx = a.idx + h.hn
             |      WHERE a.idx < h.hn),
             |c AS (SELECT
             |        SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS n_pos,
             |        SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS n_neg,
             |        SUM(CASE WHEN diff = 0 THEN 1 ELSE 0 END) AS n_tie
             |      FROM pairs)
             |SELECT CAST(n_pos + n_neg AS BIGINT) AS n_pairs_effective,
             |  CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(n_neg AS BIGINT) AS n_neg,
             |  CAST(n_tie AS BIGINT) AS n_tie,
             |  round((abs(CAST(n_pos AS DOUBLE) -
             |    CAST(n_pos + n_neg AS DOUBLE) / 2.0) - 0.5) /
             |    sqrt(CAST(n_pos + n_neg AS DOUBLE) / 4.0), 6) AS z,
             |  CAST((abs(CAST(n_pos AS DOUBLE) -
             |    CAST(n_pos + n_neg AS DOUBLE) / 2.0) - 0.5) /
             |    sqrt(CAST(n_pos + n_neg AS DOUBLE) / 4.0) > 1.959964
             |    AS BIGINT) AS shift_sig_05
             |FROM c ORDER BY n_pairs_effective""".stripMargin)),

    // Bartlett's test of variance homogeneity (Bartlett, Proc. Roy. Soc.
    // A 1937) of event `value` across the five event types — the
    // homoscedasticity GATE in front of the suite's pooled-variance
    // tests (x220 Tukey HSD and the ANOVA family assume equal variances;
    // Bartlett is the classical check that assumption deserves).
    // Integer-cents second moments (the x220 device) make every group
    // variance an exact rational; the ln terms round at 9 into DECIMAL
    // sums; Bartlett's C correction uses the exact Σ1/(nᵢ−1) harmonic
    // term. Reports against the published χ²₄ critical 9.488, plus the
    // max/min variance ratio (Hartley's F_max read) for effect size.
    // Scale: one scan → 5 group moment rows → 1-row algebra.
    QuerySpec(
      "x314_bartlett",
      (s, dir) => {
        val g = Tables.events(s, dir)
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            sum(col("c") * col("c")).as("scc"))
          // DOMAIN (round-12, surfaced by AdversarialDataSpec's singleton
          // hostile event types): Bartlett is defined only over groups
          // that can contribute a variance — n ≥ 2 (the (n−1) divisor)
          // and s² > 0 (the ln term); degenerate groups are excluded on
          // both engine sides, the textbook treatment
          .filter(col("n") >= 2)
          .select(col("event_type"), col("n"),
            round(((col("scc").cast("double") -
              col("sc").cast("double") * col("sc") / col("n")) /
              (col("n") - 1)) / 10000.0, 9).as("s2"))
          .filter(col("s2") > 0)
          .localCheckpoint() // 5 rows feed pooled + per-group terms
        val agg = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
          sum(round((col("n") - 1).cast("double") * col("s2"), 6)
            .cast("decimal(38,6)")).cast("double").as("ssw"),
          sum(round((col("n") - 1).cast("double") *
            log(col("s2")), 9).cast("decimal(38,9)")).cast("double")
            .as("slns"),
          sum(lit(1.0) / (col("n") - 1).cast("double")).as("hinv"),
          max(col("s2")).as("s2max"), min(col("s2")).as("s2min"))
        agg.filter(col("k") >= 2) // comparing variances needs >= 2 groups
          .select(col("k").as("n_groups"), col("nn").as("n_events"),
            round((((col("nn") - col("k")).cast("double") *
              log(col("ssw") / (col("nn") - col("k")).cast("double")) -
              col("slns")) /
              (lit(1.0) + (col("hinv") - lit(1.0) /
                (col("nn") - col("k")).cast("double")) /
                (lit(3.0) * (col("k") - 1).cast("double")))), 4)
              .as("bartlett_t"),
            round(col("s2max") / col("s2min"), 4).as("fmax_ratio"))
          .select(col("n_groups"), col("n_events"), col("bartlett_t"),
            (col("bartlett_t") > 9.488).cast("long")
              .as("heteroscedastic_sig_05"),
            col("fmax_ratio"))
          .orderBy("n_groups")
      },
      Some("""WITH g AS (SELECT event_type, COUNT(*) AS n,
             |        SUM(c) AS sc, SUM(c * c) AS scc
             |      FROM (SELECT event_type,
             |        CAST(round(value * 100) AS BIGINT) AS c FROM events)
             |      GROUP BY 1),
             |v AS (SELECT event_type, n,
             |        round(((CAST(scc AS DOUBLE) -
             |          CAST(sc AS DOUBLE) * sc / n) / (n - 1)) /
             |          10000.0, 9) AS s2
             |      FROM g WHERE n >= 2),
             |v2 AS (SELECT * FROM v WHERE s2 > 0),
             |a AS (SELECT COUNT(*) AS k, SUM(n) AS nn,
             |        CAST(SUM(CAST(round(CAST(n - 1 AS DOUBLE) * s2, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS ssw,
             |        CAST(SUM(CAST(round(CAST(n - 1 AS DOUBLE) * ln(s2),
             |          9) AS DECIMAL(38,9))) AS DOUBLE) AS slns,
             |        SUM(1.0 / CAST(n - 1 AS DOUBLE)) AS hinv,
             |        MAX(s2) AS s2max, MIN(s2) AS s2min
             |      FROM v2),
             |t AS (SELECT k, nn,
             |        round((CAST(nn - k AS DOUBLE) *
             |          ln(ssw / CAST(nn - k AS DOUBLE)) - slns) /
             |          (1.0 + (hinv - 1.0 / CAST(nn - k AS DOUBLE)) /
             |            (3.0 * CAST(k - 1 AS DOUBLE))), 4) AS bt,
             |        round(s2max / s2min, 4) AS fmax_ratio
             |      FROM a)
             |SELECT CAST(k AS BIGINT) AS n_groups,
             |  CAST(nn AS BIGINT) AS n_events,
             |  bt AS bartlett_t,
             |  CAST(bt > 9.488 AS BIGINT) AS heteroscedastic_sig_05,
             |  fmax_ratio
             |FROM t WHERE k >= 2 ORDER BY n_groups""".stripMargin)),

    // Intrinsic-dimension estimate (Levina & Bickel, NIPS 2004 MLE): for
    // each query point, m̂ = 1/(ln T_k − mean_{j<k} ln T_j) over its kNN
    // Euclidean distances — the geometry read that tells you whether the
    // 64-dim embedding actually LIVES on a much lower-dimensional
    // manifold (it prices how aggressively the suite's JL/PQ/matryoshka
    // compressions can cut dims before recall falls). Queries are the
    // fixed 200-id hash-ordered sample (the x276 device — estimator is
    // an average over query points anyway), so the score join is 200·n:
    // linear in the corpus at any scale. Distances round at 6 before
    // ranking and logs round at 9 into DECIMAL sums, so rank order and
    // the MLE replay identically in SQL.
    QuerySpec(
      "x315_intrinsic_dim",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        val W = org.apache.spark.sql.expressions.Window
        // a missing vector has no geometry: null embeddings are excluded
        // on both sides — a null distance would otherwise sort nulls-first
        // into Spark's top-k where DuckDB's unnest emits no row (round-12)
        val e = Tables.embeddings(s, dir)
          .filter(col("embedding").isNotNull)
        val seeds = e.select(col("vec_id"))
          .orderBy((col("vec_id") % 1000003L * 48271L % 1000003L).asc,
            col("vec_id").asc)
          .limit(200)
        val q = e.join(broadcast(seeds), Seq("vec_id"))
          .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
          .withColumn("qq", expr("float_dot(q_emb, q_emb)"))
        val c = e.select(col("vec_id").as("cid"),
            col("embedding").as("c_emb"))
          .withColumn("cc", expr("float_dot(c_emb, c_emb)"))
        val k = 8
        val nn = q.crossJoin(c)
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            round(sqrt(greatest(col("qq") + col("cc") -
              lit(2.0) * expr("float_dot(q_emb, c_emb)"), lit(0.0))), 6)
              .as("d"))
          .withColumn("rn", row_number().over(
            W.partitionBy("qid").orderBy(col("d").asc, col("cid"))))
          .filter(col("rn") <= k)
        val perSeed = nn.groupBy("qid")
          .agg(
            max(when(col("rn") === k,
              round(log(greatest(col("d"), lit(1e-6))), 9))).as("lntk"),
            sum(when(col("rn") < k,
              round(log(greatest(col("d"), lit(1e-6))), 9)
                .cast("decimal(18,9)"))).cast("double").as("slnj"))
          .select(col("qid"),
            round(lit(1.0) / greatest(col("lntk") -
              col("slnj") / (k - 1), lit(1e-6)), 6).as("mhat"))
        perSeed.agg(count(lit(1)).as("n_queries"),
            sum(col("mhat").cast("decimal(18,6)")).cast("double")
              .as("sm"),
            expr("percentile(mhat, 0.5)").as("med"),
            min(col("mhat")).as("mn"), max(col("mhat")).as("mx"))
          .select(col("n_queries"), lit(k.toLong).as("k"),
            round(col("sm") / col("n_queries"), 4).as("id_mle_mean"),
            round(col("med"), 4).as("id_mle_median"),
            round(col("mn"), 4).as("id_mle_min"),
            round(col("mx"), 4).as("id_mle_max"))
          .orderBy("n_queries")
      },
      Some("""WITH e AS (SELECT vec_id,
             |        [CAST(x AS DOUBLE) for x in embedding] AS emb
             |      FROM embeddings WHERE embedding IS NOT NULL),
             |s AS (SELECT vec_id FROM embeddings
             |      WHERE embedding IS NOT NULL
             |      ORDER BY vec_id % 1000003 * 48271 % 1000003, vec_id
             |      LIMIT 200),
             |f AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |        unnest(q.emb) AS qv, unnest(c.emb) AS cv
             |      FROM e q CROSS JOIN e c
             |      WHERE q.vec_id IN (SELECT vec_id FROM s)
             |        AND q.vec_id <> c.vec_id),
             |d AS (SELECT qid, cid,
             |        round(sqrt(greatest(SUM((qv - cv) * (qv - cv)),
             |          0.0)), 6) AS d
             |      FROM f GROUP BY 1, 2),
             |r AS (SELECT qid, d, row_number() OVER (PARTITION BY qid
             |        ORDER BY d, cid) AS rn FROM d),
             |ps AS (SELECT qid,
             |        MAX(CASE WHEN rn = 8
             |          THEN round(ln(greatest(d, 1e-6)), 9) END) AS lntk,
             |        CAST(SUM(CASE WHEN rn < 8
             |          THEN CAST(round(ln(greatest(d, 1e-6)), 9)
             |            AS DECIMAL(18,9)) END) AS DOUBLE) AS slnj
             |      FROM r WHERE rn <= 8 GROUP BY 1),
             |mh AS (SELECT qid,
             |        round(1.0 / greatest(lntk - slnj / 7, 1e-6), 6)
             |          AS mhat
             |      FROM ps),
             |agg AS (SELECT COUNT(*) AS n_queries,
             |        CAST(SUM(CAST(mhat AS DECIMAL(18,6))) AS DOUBLE)
             |          AS sm,
             |        quantile_cont(mhat, 0.5) AS med,
             |        MIN(mhat) AS mn, MAX(mhat) AS mx
             |      FROM mh)
             |SELECT CAST(n_queries AS BIGINT) AS n_queries,
             |  CAST(8 AS BIGINT) AS k,
             |  round(sm / n_queries, 4) AS id_mle_mean,
             |  round(med, 4) AS id_mle_median,
             |  round(mn, 4) AS id_mle_min,
             |  round(mx, 4) AS id_mle_max
             |FROM agg ORDER BY n_queries""".stripMargin)),

    // Davies-Bouldin cluster-validity index (Davies & Bouldin, IEEE
    // TPAMI 1979) of the embedding label partition — the centroid-based
    // validity read between x215's silhouette (pairwise, sampled) and
    // x304's PERMANOVA pseudo-F (variance-ratio): R_i = max_j (σᵢ+σⱼ)/dᵢⱼ
    // penalizes cluster pairs that are wide relative to their centroid
    // separation, per cluster, so it NAMES the worst-confused pair
    // instead of averaging it away. Exact shapes: centroids from
    // rounded-9 DECIMAL per-dim sums; member spreads via one broadcast
    // join against the 640-cell centroid grid; the (i,j) ratio lattice is
    // |labels|² — bounded algebra after two linear scans.
    QuerySpec(
      "x316_davies_bouldin",
      (s, dir) => {
        // null embeddings excluded on both sides (round-12): Spark's
        // posexplode silently drops them while the oracle's range(64)
        // cross join kept them in every COUNT(*) denominator
        val ex = Tables.embeddings(s, dir)
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("label"), col("dim"),
            col("v").cast("double").as("v"))
        val cent = ex.groupBy("label", "dim")
          .agg(count(lit(1)).as("n"),
            sum(round(col("v"), 9).cast("decimal(38,9)")).cast("double")
              .as("sv"))
          .select(col("label"), col("dim"), col("n"),
            round(col("sv") / col("n"), 9).as("c"))
          .localCheckpoint() // <= |labels| x 64 cells, read three ways
        val sig = ex.join(broadcast(cent.select(col("label"), col("dim"),
            col("c"))), Seq("label", "dim"))
          .select(col("vec_id"), col("label"),
            round((col("v") - col("c")) * (col("v") - col("c")), 9)
              .cast("decimal(38,9)").as("sq"))
          .groupBy("vec_id", "label")
          .agg(round(sqrt(sum(col("sq")).cast("double")), 6).as("d"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_members"),
            (sum(round(col("d"), 6).cast("decimal(18,6)")).cast("double") /
              count(lit(1))).as("sigma"))
        val cd = cent.as("a").join(cent.as("b"),
            col("a.dim") === col("b.dim") &&
              col("a.label") < col("b.label"))
          .select(col("a.label").as("li"), col("b.label").as("lj"),
            round((col("a.c") - col("b.c")) * (col("a.c") - col("b.c")), 9)
              .cast("decimal(38,9)").as("sq"))
          .groupBy("li", "lj")
          .agg(round(sqrt(sum(col("sq")).cast("double")), 6).as("dij"))
        val ratios = cd
          .unionByName(cd.select(col("lj").as("li"), col("li").as("lj"),
            col("dij")))
          .join(sig.select(col("label").as("li"),
            col("sigma").as("si")), Seq("li"))
          .join(sig.select(col("label").as("lj"),
            col("sigma").as("sj")), Seq("lj"))
          .select(col("li"), col("lj"),
            round((col("si") + col("sj")) / col("dij"), 6).as("r"))
        val W = org.apache.spark.sql.expressions.Window
        val ri = ratios
          .withColumn("rn", row_number().over(W.partitionBy("li")
            .orderBy(col("r").desc, col("lj"))))
          .filter(col("rn") === 1)
          .select(col("li").as("label"), col("lj").as("worst_other"),
            col("r").as("r_i"))
        val db = ri.agg(round(sum(col("r_i").cast("decimal(18,6)"))
            .cast("double") / count(lit(1)), 6).as("db_index"))
        ri.join(sig, "label")
          .crossJoin(broadcast(db))
          .select(col("label").cast("long").as("label"),
            col("n_members"), round(col("sigma"), 6).as("sigma"),
            col("worst_other").cast("long").as("worst_other"),
            col("r_i"), col("db_index"))
          .orderBy("label")
      },
      Some("""WITH ex AS (SELECT vec_id, label, r.i AS dim,
             |        CAST(embedding[r.i + 1] AS DOUBLE) AS v
             |      FROM embeddings CROSS JOIN range(64) r(i)
             |      WHERE embedding IS NOT NULL),
             |cent AS (SELECT label, dim, COUNT(*) AS n,
             |        round(CAST(SUM(CAST(round(v, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) / COUNT(*), 9) AS c
             |      FROM ex GROUP BY 1, 2),
             |md AS (SELECT ex.vec_id, ex.label,
             |        round(sqrt(CAST(SUM(CAST(round(
             |          (ex.v - cent.c) * (ex.v - cent.c), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE)), 6) AS d
             |      FROM ex JOIN cent ON cent.label = ex.label
             |        AND cent.dim = ex.dim
             |      GROUP BY 1, 2),
             |sig AS (SELECT label, COUNT(*) AS n_members,
             |        CAST(SUM(CAST(round(d, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) / COUNT(*) AS sigma
             |      FROM md GROUP BY 1),
             |cd0 AS (SELECT a.label AS li, b.label AS lj,
             |        round(sqrt(CAST(SUM(CAST(round(
             |          (a.c - b.c) * (a.c - b.c), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE)), 6) AS dij
             |      FROM cent a JOIN cent b ON a.dim = b.dim
             |        AND a.label < b.label
             |      GROUP BY 1, 2),
             |cd AS (SELECT li, lj, dij FROM cd0
             |      UNION ALL SELECT lj, li, dij FROM cd0),
             |ratios AS (SELECT cd.li, cd.lj,
             |        round((si.sigma + sj.sigma) / cd.dij, 6) AS r
             |      FROM cd JOIN sig si ON si.label = cd.li
             |        JOIN sig sj ON sj.label = cd.lj),
             |ri AS (SELECT li AS label, lj AS worst_other, r AS r_i
             |      FROM (SELECT li, lj, r, row_number() OVER (
             |        PARTITION BY li ORDER BY r DESC, lj) AS rn
             |        FROM ratios) WHERE rn = 1),
             |db AS (SELECT round(CAST(SUM(CAST(r_i AS DECIMAL(18,6)))
             |        AS DOUBLE) / COUNT(*), 6) AS db_index FROM ri)
             |SELECT CAST(ri.label AS BIGINT) AS label,
             |  CAST(sig.n_members AS BIGINT) AS n_members,
             |  round(sig.sigma, 6) AS sigma,
             |  CAST(ri.worst_other AS BIGINT) AS worst_other,
             |  ri.r_i, db.db_index
             |FROM ri JOIN sig ON sig.label = ri.label CROSS JOIN db
             |ORDER BY label""".stripMargin)),

    // Diagonal-Mahalanobis embedding outliers (the variance-scaled twin
    // of Quantized's Euclidean centroid-outlier read): score every
    // vector by Σ_d ((v_d − μ_d)/σ_d)² — under near-Gaussian coordinates
    // the score is ~χ²₆₄, so the published 0.99 quantile 93.217 gives a
    // calibrated tail flag no Euclidean threshold can. One 64-cell
    // moment pass (exact DECIMAL sums), one broadcast join back, one
    // row-local score — linear at any corpus size. Top-10 named
    // outliers ride with the global tail share.
    QuerySpec(
      "x317_mahalanobis_outliers",
      (s, dir) => {
        // null embeddings excluded on both sides (same x316 asymmetry)
        val ex = Tables.embeddings(s, dir)
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("dim", "v")))
          .select(col("vec_id"), col("dim"),
            col("v").cast("double").as("v"))
        val st = ex.groupBy("dim")
          .agg(count(lit(1)).as("n"),
            sum(round(col("v"), 9).cast("decimal(38,9)")).cast("double")
              .as("sv"),
            sum(round(col("v") * col("v"), 9).cast("decimal(38,9)"))
              .cast("double").as("svv"))
          .select(col("dim"),
            round(col("sv") / col("n"), 9).as("mu"),
            round(sqrt(greatest(col("svv") / col("n") -
              (col("sv") / col("n")) * (col("sv") / col("n")),
              lit(1e-12))), 9).as("sd"))
        val scored = ex.join(broadcast(st), "dim")
          .select(col("vec_id"),
            round(((col("v") - col("mu")) / col("sd")) *
              ((col("v") - col("mu")) / col("sd")), 9)
              .cast("decimal(38,9)").as("z2"))
          .groupBy("vec_id")
          .agg(round(sum(col("z2")).cast("double"), 4).as("score"))
          .localCheckpoint() // corpus-row-bounded score table
        val glob = scored.agg(count(lit(1)).as("n_vectors"),
          round(sum(col("score").cast("decimal(18,4)")).cast("double") /
            count(lit(1)), 4).as("mean_score"),
          round(sum((col("score") > 93.217).cast("long"))
            .cast("double") / count(lit(1)), 6).as("tail_share_chi2_99"))
        scored.orderBy(col("score").desc, col("vec_id")).limit(10)
          .crossJoin(broadcast(glob))
          .select(col("vec_id").as("outlier_vec_id"), col("score"),
            col("n_vectors"), col("mean_score"),
            col("tail_share_chi2_99"))
          .orderBy(col("score").desc, col("outlier_vec_id"))
      },
      Some("""WITH ex AS (SELECT vec_id, r.i AS dim,
             |        CAST(embedding[r.i + 1] AS DOUBLE) AS v
             |      FROM embeddings CROSS JOIN range(64) r(i)
             |      WHERE embedding IS NOT NULL),
             |st AS (SELECT dim,
             |        round(CAST(SUM(CAST(round(v, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) / COUNT(*), 9) AS mu,
             |        round(sqrt(greatest(
             |          CAST(SUM(CAST(round(v * v, 9) AS DECIMAL(38,9)))
             |            AS DOUBLE) / COUNT(*) -
             |          (CAST(SUM(CAST(round(v, 9) AS DECIMAL(38,9)))
             |            AS DOUBLE) / COUNT(*)) *
             |          (CAST(SUM(CAST(round(v, 9) AS DECIMAL(38,9)))
             |            AS DOUBLE) / COUNT(*)), 1e-12)), 9) AS sd
             |      FROM ex GROUP BY 1),
             |sc AS (SELECT ex.vec_id,
             |        round(CAST(SUM(CAST(round(
             |          ((ex.v - st.mu) / st.sd) *
             |          ((ex.v - st.mu) / st.sd), 9) AS DECIMAL(38,9)))
             |          AS DOUBLE), 4) AS score
             |      FROM ex JOIN st ON st.dim = ex.dim GROUP BY 1),
             |gstats AS (SELECT COUNT(*) AS n_vectors,
             |        round(CAST(SUM(CAST(score AS DECIMAL(18,4)))
             |          AS DOUBLE) / COUNT(*), 4) AS mean_score,
             |        round(CAST(SUM(CASE WHEN score > 93.217 THEN 1
             |          ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             |          AS tail_share_chi2_99
             |      FROM sc),
             |top AS (SELECT vec_id, score FROM sc
             |      ORDER BY score DESC, vec_id LIMIT 10)
             |SELECT CAST(top.vec_id AS BIGINT) AS outlier_vec_id,
             |  top.score,
             |  CAST(gstats.n_vectors AS BIGINT) AS n_vectors,
             |  gstats.mean_score, gstats.tail_share_chi2_99
             |FROM top CROSS JOIN gstats
             |ORDER BY score DESC, outlier_vec_id""".stripMargin)),

    // Jonckheere-Terpstra ordered-alternative trend test (Terpstra 1952;
    // Jonckheere, Biometrika 1954): does per-user purchase spend rise
    // MONOTONICALLY across activity terciles? Kruskal-Wallis (x204) asks
    // "any difference"; JT asks the a-priori-ORDERED question and buys
    // power for it: J = Σ_{g<g'} U_{gg'}, each U from the combined
    // average-rank identity U = R_hi − n_hi(n_hi+1)/2 (ties counted as
    // halves, exact — the x135 rank-grid device, windows PARTITIONED by
    // group pair). The normal approximation uses the classical no-tie
    // variance (n²(2n+3) − Σnⱼ²(2nⱼ+3))/72, documented (cent-valued
    // spend makes ties sparse; the tie-corrected variance differs in the
    // 4th decimal here). Scale: users → (tercile, spend) counts → a
    // 3-pair x |distinct spend| lattice.
    QuerySpec(
      "x318_jonckheere",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val u0 = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("y"))
        val cuts = u0.agg(
          round(expr("percentile(act, CAST(1 AS DOUBLE) / 3)"), 6).as("c1"),
          round(expr("percentile(act, CAST(2 AS DOUBLE) / 3)"), 6).as("c2"))
        val u = u0.crossJoin(broadcast(cuts))
          .select(((col("act") > col("c1")).cast("long") +
            (col("act") > col("c2")).cast("long")).as("g"), col("y"))
        val cnt = u.groupBy("g", "y").agg(count(lit(1)).as("c"))
          .localCheckpoint() // (tercile, spend) grid feeds pairs + sizes
        val pc = cnt.select(col("g"), col("y"), col("c"),
            explode(array(
              struct(lit(0L).as("pl"), lit(1L).as("ph")),
              struct(lit(0L).as("pl"), lit(2L).as("ph")),
              struct(lit(1L).as("pl"), lit(2L).as("ph")))).as("pr"))
          .filter(col("g") === col("pr.pl") || col("g") === col("pr.ph"))
          .select(concat(col("pr.pl"), lit("-"), col("pr.ph")).as("pair"),
            (col("g") === col("pr.ph")).cast("long").as("hi"),
            col("y"), col("c"))
        val py = pc.groupBy("pair", "y")
          .agg(sum(col("c")).as("ct"),
            sum(when(col("hi") === 1, col("c")).otherwise(0L)).as("chi"))
        val wp = W.partitionBy("pair").orderBy("y")
          .rowsBetween(W.unboundedPreceding, -1)
        val ranked = py
          .withColumn("cumprev", coalesce(sum(col("ct")).over(wp), lit(0L)))
          .select(col("pair"), col("chi"),
            (col("cumprev").cast("double") +
              (col("ct") + 1).cast("double") / 2.0).as("ravg"))
        val upair = ranked.groupBy("pair")
          .agg(sum(round(col("chi") * col("ravg"), 6)
            .cast("decimal(38,6)")).cast("double").as("rhi"))
          .join(pc.groupBy("pair").agg(
            sum(when(col("hi") === 1, col("c")).otherwise(0L)).as("nhi")),
            "pair")
          .select(col("pair"),
            (col("rhi") - col("nhi").cast("double") *
              (col("nhi") + 1).cast("double") / 2.0).as("u"))
        val j = upair.agg(sum(round(col("u"), 6).cast("decimal(38,6)"))
          .cast("double").as("j"))
        val sizes = u.groupBy("g").agg(count(lit(1)).as("ng"))
          .agg(sum(col("ng")).as("n"),
            sum(col("ng") * col("ng")).as("sn2"),
            sum(col("ng") * col("ng") * (col("ng") * 2 + 3)).as("sv"))
        j.crossJoin(broadcast(sizes))
          .select(col("n").as("n_users"),
            round(col("j"), 2).as("j_stat"),
            round((col("n") * col("n") - col("sn2")).cast("double") / 4.0,
              2).as("j_expected"),
            round((col("j") - (col("n") * col("n") - col("sn2"))
              .cast("double") / 4.0) /
              sqrt((col("n") * col("n") * (col("n") * 2 + 3) - col("sv"))
                .cast("double") / 72.0), 6).as("z"),
            (abs((col("j") - (col("n") * col("n") - col("sn2"))
              .cast("double") / 4.0) /
              sqrt((col("n") * col("n") * (col("n") * 2 + 3) - col("sv"))
                .cast("double") / 72.0)) > 1.959964).cast("long")
              .as("trend_sig_05"))
          .orderBy("n_users")
      },
      Some("""WITH u0 AS (SELECT user_id, COUNT(*) AS act,
             |        SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS y
             |      FROM events GROUP BY 1),
             |cuts AS (SELECT
             |        round(quantile_cont(act, CAST(1 AS DOUBLE) / 3), 6)
             |          AS c1,
             |        round(quantile_cont(act, CAST(2 AS DOUBLE) / 3), 6)
             |          AS c2 FROM u0),
             |u AS (SELECT CAST(act > c1 AS BIGINT) +
             |        CAST(act > c2 AS BIGINT) AS g, y
             |      FROM u0 CROSS JOIN cuts),
             |cnt AS (SELECT g, y, COUNT(*) AS c FROM u GROUP BY 1, 2),
             |pc AS (SELECT CAST(pr.pl AS VARCHAR) || '-' ||
             |          CAST(pr.ph AS VARCHAR) AS pair,
             |        CAST(cnt.g = pr.ph AS BIGINT) AS hi, cnt.y, cnt.c
             |      FROM cnt, LATERAL (SELECT unnest([
             |          {'pl': 0, 'ph': 1}, {'pl': 0, 'ph': 2},
             |          {'pl': 1, 'ph': 2}], recursive := true))
             |        pr(pl, ph)
             |      WHERE cnt.g = pr.pl OR cnt.g = pr.ph),
             |py AS (SELECT pair, y, SUM(c) AS ct,
             |        SUM(CASE WHEN hi = 1 THEN c ELSE 0 END) AS chi
             |      FROM pc GROUP BY 1, 2),
             |rk AS (SELECT pair, chi,
             |        CAST(COALESCE(SUM(ct) OVER (PARTITION BY pair
             |          ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND
             |          1 PRECEDING), 0) AS DOUBLE) +
             |        CAST(ct + 1 AS DOUBLE) / 2.0 AS ravg
             |      FROM py),
             |up AS (SELECT rk.pair,
             |        CAST(SUM(CAST(round(rk.chi * rk.ravg, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) -
             |        CAST(sz.nhi AS DOUBLE) * (sz.nhi + 1) / 2.0 AS u
             |      FROM rk JOIN (SELECT pair,
             |          SUM(CASE WHEN hi = 1 THEN c ELSE 0 END) AS nhi
             |        FROM pc GROUP BY 1) sz ON sz.pair = rk.pair
             |      GROUP BY rk.pair, sz.nhi),
             |j AS (SELECT CAST(SUM(CAST(round(u, 6) AS DECIMAL(38,6)))
             |        AS DOUBLE) AS j FROM up),
             |sizes AS (SELECT SUM(ng) AS n, SUM(ng * ng) AS sn2,
             |        SUM(ng * ng * (ng * 2 + 3)) AS sv
             |      FROM (SELECT g, COUNT(*) AS ng FROM u GROUP BY 1))
             |SELECT CAST(n AS BIGINT) AS n_users,
             |  round(j.j, 2) AS j_stat,
             |  round(CAST(n * n - sn2 AS DOUBLE) / 4.0, 2) AS j_expected,
             |  round((j.j - CAST(n * n - sn2 AS DOUBLE) / 4.0) /
             |    sqrt(CAST(n * n * (n * 2 + 3) - sv AS DOUBLE) / 72.0), 6)
             |    AS z,
             |  CAST(abs((j.j - CAST(n * n - sn2 AS DOUBLE) / 4.0) /
             |    sqrt(CAST(n * n * (n * 2 + 3) - sv AS DOUBLE) / 72.0))
             |    > 1.959964 AS BIGINT) AS trend_sig_05
             |FROM j CROSS JOIN sizes ORDER BY n_users""".stripMargin)),

    // Hellinger / Bhattacharyya / total-variation distances (Hellinger
    // 1909; Bhattacharyya 1943) between the first-half and second-half
    // event-value distributions over the x203 20-bin grid — the
    // f-divergence corner of the drift suite: x?? Wasserstein prices
    // HOW FAR mass moved, PSI is unbounded and asymmetric-binned, KS
    // reads only the worst CDF gap; Hellinger is a bounded [0,1] metric
    // and BC feeds the classical Bhattacharyya error bound. Exact bin
    // counts; √(pq) terms round at 9 into DECIMAL sums; one scan to the
    // 20-bin grid.
    QuerySpec(
      "x319_hellinger_drift",
      (s, dir) => {
        // null-ts rows are EXCLUDED on both sides: the Spark half-flag
        // `(to_date(ts) <= mid)::long` nulls out on a null timestamp
        // (dropped by both SUMs) while the oracle's CASE lands in ELSE 0
        // (counted as second half) — an asymmetry AdversarialDataSpec
        // exposed; an event with no timestamp belongs to neither half
        val ev = Tables.events(s, dir).filter(col("ts").isNotNull)
        val mid = ev.agg(min(to_date(col("ts"))).as("a"),
            max(to_date(col("ts"))).as("b"))
          .select(expr("date_add(a, CAST(datediff(b, a) div 2 AS INT))")
            .as("mid"))
        val mx = ev.agg(max(col("value")).as("mx"))
        // both-ends clamp (round-11 advice): `least(..., 19)` alone lets a
        // negative value (or mx <= 0) mint bin ids below 0 and silently
        // grow the promised 20-bin grid — greatest(..., 0) pins the floor
        val bins = ev.crossJoin(broadcast(mid)).crossJoin(broadcast(mx))
          .select(greatest(
            least(floor(col("value") / col("mx") * 20), lit(19L)), lit(0L))
            .as("bin"),
            (to_date(col("ts")) <= col("mid")).cast("long").as("fh"))
          .groupBy("bin")
          .agg(sum(col("fh")).as("c1"),
            sum(lit(1L) - col("fh")).as("c2"))
        val tot = bins.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val terms = bins.crossJoin(broadcast(tot))
          .select(
            round(sqrt((col("c1").cast("double") / col("n1")) *
              (col("c2").cast("double") / col("n2"))), 9)
              .cast("decimal(18,9)").as("bct"),
            round(abs(col("c1").cast("double") / col("n1") -
              col("c2").cast("double") / col("n2")), 9)
              .cast("decimal(18,9)").as("tvt"),
            col("n1"), col("n2"))
        terms.groupBy("n1", "n2")
          .agg(count(lit(1)).as("n_bins"),
            sum(col("bct")).cast("double").as("bc"),
            sum(col("tvt")).cast("double").as("tvs"))
          .select(col("n_bins"), col("n1").as("n_first"),
            col("n2").as("n_second"),
            round(col("bc"), 6).as("bhattacharyya_coef"),
            round(sqrt(greatest(lit(1.0) - col("bc"), lit(0.0))), 6)
              .as("hellinger"),
            round(col("tvs") / 2.0, 6).as("total_variation"))
          .orderBy("n_bins")
      },
      Some("""WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
             |mid AS (SELECT MIN(CAST(ts AS DATE)) +
             |          CAST(date_diff('day', MIN(CAST(ts AS DATE)),
             |            MAX(CAST(ts AS DATE))) // 2 AS INT) AS mid
             |      FROM e),
             |mx AS (SELECT MAX(value) AS mx FROM e),
             |bins AS (SELECT greatest(least(CAST(floor(value / mx.mx * 20)
             |          AS BIGINT), 19), 0) AS bin,
             |        CASE WHEN CAST(ts AS DATE) <= mid.mid THEN 1
             |          ELSE 0 END AS fh
             |      FROM e CROSS JOIN mid CROSS JOIN mx),
             |g AS (SELECT bin, SUM(fh) AS c1, SUM(1 - fh) AS c2
             |      FROM bins GROUP BY 1),
             |tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM g),
             |terms AS (SELECT
             |        CAST(round(sqrt((CAST(c1 AS DOUBLE) / n1) *
             |          (CAST(c2 AS DOUBLE) / n2)), 9) AS DECIMAL(18,9))
             |          AS bct,
             |        CAST(round(abs(CAST(c1 AS DOUBLE) / n1 -
             |          CAST(c2 AS DOUBLE) / n2), 9) AS DECIMAL(18,9))
             |          AS tvt,
             |        n1, n2
             |      FROM g CROSS JOIN tot)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
             |  CAST(n1 AS BIGINT) AS n_first,
             |  CAST(n2 AS BIGINT) AS n_second,
             |  round(CAST(SUM(bct) AS DOUBLE), 6) AS bhattacharyya_coef,
             |  round(sqrt(greatest(1.0 - CAST(SUM(bct) AS DOUBLE), 0.0)),
             |    6) AS hellinger,
             |  round(CAST(SUM(tvt) AS DOUBLE) / 2.0, 6)
             |    AS total_variation
             |FROM terms GROUP BY n1, n2 ORDER BY n_bins""".stripMargin)),

    // Ansari-Bradley scale test (Ansari & Bradley, Ann. Math. Stat.
    // 1960): do the two experiment arms (user parity) differ in the
    // SPREAD of purchase value, location aside — the nonparametric
    // companion to x314's Bartlett (which assumes normality). Scores
    // a(r) = min(r, N+1−r) fold inward from both ends; ties take the
    // EXACT average score over each tie run, computed in closed form
    // (the run's ranks are consecutive integers, so Σmin(r, N+1−r)
    // splits into two arithmetic series at ⌊(N+1)/2⌋ — all BIGINT until
    // one division per run). The z uses the exact conditional variance
    // mn(NΣa² − (Σa)²)/(N²(N−1)) over the tie-averaged scores. Scale:
    // purchases → |distinct cents| grid, one global window over it.
    QuerySpec(
      "x320_ansari_bradley",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // a two-sample scale test needs a KNOWN arm and a RECORDED value:
        // null user/value rows are excluded on both sides — a null cents
        // run would otherwise sit at a different end of the rank window
        // per engine (round-12, AdversarialDataSpec)
        val v = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("user_id").isNotNull && col("value").isNotNull)
          .select((col("user_id") % 2).as("arm"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        val g = v.groupBy("c")
          .agg(count(lit(1)).as("ct"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("cx"))
        val tot = v.agg(count(lit(1)).as("nn"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("m"))
        val wc = W.orderBy("c").rowsBetween(W.unboundedPreceding, -1)
        // tie-run rank span [a, b]; Σ f(r) over the run in closed form
        val runs = g.crossJoin(broadcast(tot))
          .withColumn("cumprev", coalesce(sum(col("ct")).over(wc), lit(0L)))
          .withColumn("ra", col("cumprev") + 1)
          .withColumn("rb", col("cumprev") + col("ct"))
          .withColumn("mm", expr("(nn + 1) div 2"))
          .withColumn("lowb", least(col("rb"), col("mm")))
          .withColumn("s1", when(col("lowb") >= col("ra"),
            expr("(ra + lowb) * (lowb - ra + 1) div 2")).otherwise(lit(0L)))
          .withColumn("higha", greatest(col("ra"), col("mm") + 1))
          .withColumn("s2", when(col("rb") >= col("higha"),
            expr("(nn + 1) * (rb - higha + 1) - " +
              "(higha + rb) * (rb - higha + 1) div 2")).otherwise(lit(0L)))
          .withColumn("srun", col("s1") + col("s2"))
          .withColumn("abar",
            round(col("srun").cast("double") / col("ct"), 9))
        val agg = runs.agg(
          max(col("nn")).as("nn"), max(col("m")).as("m"),
          sum(col("srun")).as("sa"),
          sum(round(col("ct") * col("abar") * col("abar"), 6)
            .cast("decimal(38,6)")).cast("double").as("sa2"),
          sum(round(col("cx") * col("abar"), 6).cast("decimal(38,6)"))
            .cast("double").as("abx"))
        agg.select(col("nn").as("n_purchases"), col("m").as("n_arm0"),
            round(col("abx"), 2).as("ab_stat"),
            round(col("m").cast("double") * col("sa") / col("nn"), 2)
              .as("ab_expected"),
            round((col("abx") - col("m").cast("double") * col("sa") /
              col("nn")) /
              sqrt(col("m").cast("double") * (col("nn") - col("m")) *
                (col("nn") * col("sa2") - col("sa").cast("double") *
                  col("sa")) /
                (col("nn").cast("double") * col("nn") * (col("nn") - 1))),
              6).as("z"))
          .select(col("n_purchases"), col("n_arm0"), col("ab_stat"),
            col("ab_expected"), col("z"),
            (abs(col("z")) > 1.959964).cast("long")
              .as("scale_diff_sig_05"))
          .orderBy("n_purchases")
      },
      Some("""WITH v AS (SELECT user_id % 2 AS arm,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events WHERE event_type = 'purchase'
             |        AND user_id IS NOT NULL AND value IS NOT NULL),
             |g AS (SELECT c, COUNT(*) AS ct,
             |        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS cx
             |      FROM v GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS nn,
             |        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS m
             |      FROM v),
             |runs AS (SELECT g.ct, g.cx, tot.nn, tot.m,
             |        COALESCE(SUM(g.ct) OVER (ORDER BY g.c
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) + 1 AS ra,
             |        COALESCE(SUM(g.ct) OVER (ORDER BY g.c
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) + g.ct AS rb,
             |        (tot.nn + 1) // 2 AS mm
             |      FROM g CROSS JOIN tot),
             |sc AS (SELECT ct, cx, nn, m,
             |        (CASE WHEN least(rb, mm) >= ra
             |          THEN (ra + least(rb, mm)) *
             |            (least(rb, mm) - ra + 1) // 2 ELSE 0 END) +
             |        (CASE WHEN rb >= greatest(ra, mm + 1)
             |          THEN (nn + 1) * (rb - greatest(ra, mm + 1) + 1) -
             |            (greatest(ra, mm + 1) + rb) *
             |              (rb - greatest(ra, mm + 1) + 1) // 2
             |          ELSE 0 END) AS srun
             |      FROM runs),
             |sc2 AS (SELECT ct, cx, nn, m, srun,
             |        round(CAST(srun AS DOUBLE) / ct, 9) AS abar
             |      FROM sc),
             |agg AS (SELECT MAX(nn) AS nn, MAX(m) AS m,
             |        SUM(srun) AS sa,
             |        CAST(SUM(CAST(round(ct * abar * abar, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sa2,
             |        CAST(SUM(CAST(round(cx * abar, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS abx
             |      FROM sc2)
             |SELECT CAST(nn AS BIGINT) AS n_purchases,
             |  CAST(m AS BIGINT) AS n_arm0,
             |  round(abx, 2) AS ab_stat,
             |  round(CAST(m AS DOUBLE) * sa / nn, 2) AS ab_expected,
             |  round((abx - CAST(m AS DOUBLE) * sa / nn) /
             |    sqrt(CAST(m AS DOUBLE) * (nn - m) *
             |      (nn * sa2 - CAST(sa AS DOUBLE) * sa) /
             |      (CAST(nn AS DOUBLE) * nn * (nn - 1))), 6) AS z,
             |  CAST(abs((abx - CAST(m AS DOUBLE) * sa / nn) /
             |    sqrt(CAST(m AS DOUBLE) * (nn - m) *
             |      (nn * sa2 - CAST(sa AS DOUBLE) * sa) /
             |      (CAST(nn AS DOUBLE) * nn * (nn - 1)))) > 1.959964
             |    AS BIGINT) AS scale_diff_sig_05
             |FROM agg ORDER BY n_purchases""".stripMargin)),

    // Box-Cox transform selection by profile log-likelihood (Box & Cox,
    // JRSS-B 1964) over the positive event values: for each λ on the
    // standard grid, ℓ(λ) = −n/2·ln(σ̂²_λ) + (λ−1)Σln y — the principled
    // answer to "should this heavy-tailed metric be logged, square-
    // rooted, or left alone" that the suite's normality-assuming tests
    // (x314, x220, ANOVA family) quietly depend on. One scan fans each
    // row into the 6-λ lattice (row-local pow), transformed moments ride
    // rounded-6 DECIMAL sums and Σln y a rounded-9 sum shared across λ.
    // Scale: |grid| = 6 groups, map-side combined.
    QuerySpec(
      "x321_boxcox",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // fan the under-split scan before the 6-λ explode + ln/pow per row
        // (measured 1.8 s single-task at sf0.1; guide §2.5, no-op on a
        // well-split table)
        val y = Tables.fanOut(Tables.events(s, dir)
            .filter(col("value") > 0)
            .select(col("value").cast("double").as("y")), col("y"))
        val lam = y.select(col("y"),
            explode(array(lit(-1.0), lit(-0.5), lit(0.0), lit(0.5),
              lit(1.0), lit(2.0))).as("lam"))
          .select(col("lam"),
            round(log(col("y")), 9).cast("decimal(18,9)").as("lny"),
            when(col("lam") === 0.0, round(log(col("y")), 6))
              .otherwise(round((pow(col("y"), col("lam")) - 1.0) /
                col("lam"), 6)).as("t"))
        val mom = lam.groupBy("lam")
          .agg(count(lit(1)).as("n"),
            sum(col("lny")).cast("double").as("slny"),
            sum(round(col("t"), 6).cast("decimal(38,6)")).cast("double")
              .as("st"),
            sum(round(col("t") * col("t"), 6).cast("decimal(38,6)"))
              .cast("double").as("stt"))
          .select(col("lam"), col("n"),
            round(lit(-0.5) * col("n") *
              log((col("stt") - col("st") * col("st") / col("n")) /
                col("n")) +
              (col("lam") - 1.0) * col("slny"), 4).as("loglik"))
        mom.withColumn("best", max(col("loglik")).over(
            W.partitionBy())) // 6-row aggregate below: Rule-1-safe
          .select(col("lam").as("lambda"), col("n").as("n_values"),
            col("loglik"),
            (col("loglik") === col("best")).cast("long").as("is_best"))
          .orderBy("lambda")
      },
      Some("""WITH y AS (SELECT CAST(value AS DOUBLE) AS y FROM events
             |      WHERE value > 0),
             |lam AS (SELECT l.lam,
             |        CAST(round(ln(y), 9) AS DECIMAL(18,9)) AS lny,
             |        CASE WHEN l.lam = 0.0 THEN round(ln(y), 6)
             |          ELSE round((pow(y, l.lam) - 1.0) / l.lam, 6)
             |          END AS t
             |      FROM y CROSS JOIN (SELECT unnest(
             |        [-1.0, -0.5, 0.0, 0.5, 1.0, 2.0]) AS lam) l),
             |mom AS (SELECT lam, COUNT(*) AS n,
             |        CAST(SUM(lny) AS DOUBLE) AS slny,
             |        CAST(SUM(CAST(round(t, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS st,
             |        CAST(SUM(CAST(round(t * t, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS stt
             |      FROM lam GROUP BY 1),
             |ll AS (SELECT lam, n,
             |        round(-0.5 * n * ln((stt - st * st / n) / n) +
             |          (lam - 1.0) * slny, 4) AS loglik
             |      FROM mom),
             |b AS (SELECT MAX(loglik) AS best FROM ll)
             |SELECT lam AS lambda, CAST(n AS BIGINT) AS n_values,
             |  loglik,
             |  CAST(loglik = b.best AS BIGINT) AS is_best
             |FROM ll CROSS JOIN b ORDER BY lambda""".stripMargin)),

    // Breusch-Pagan heteroscedasticity screen (Breusch & Pagan,
    // Econometrica 1979; Koenker's 1981 studentized LM form, the one
    // statistical practice defaults to) on the per-user spend ~ activity
    // regression: does residual VARIANCE grow with activity? If yes, the
    // x299 Cook's-distance influence reads and plain OLS standard errors
    // on this pair are understated — this is the gate in front of them.
    // LM = n·R² of the e²-on-x auxiliary regression, all from exact
    // integer/rounded moments in two passes (fit broadcast, residuals
    // row-local), vs the published χ²₁ critical 3.841.
    QuerySpec(
      "x322_breusch_pagan",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("x"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("y"))
          .localCheckpoint() // fit pass + residual pass share one frame
        val fit = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")).as("b"),
            col("sx"), col("sy"))
          .select(col("n"), round(col("b"), 9).as("b"),
            round((col("sy").cast("double") - round(col("b"), 9) *
              col("sx")) / col("n"), 9).as("a"))
        val e2 = u.crossJoin(broadcast(fit))
          .select(col("x"),
            round((col("y") - col("a") - col("b") * col("x")) *
              (col("y") - col("a") - col("b") * col("x")) / 10000.0, 6)
              .as("e2"))
        val aux = e2.agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
            sum(round(col("e2"), 6).cast("decimal(38,6)")).cast("double")
              .as("se"),
            sum(round(col("e2") * col("e2"), 6).cast("decimal(38,6)"))
              .cast("double").as("see"),
            sum(round(col("x") * col("e2"), 6).cast("decimal(38,6)"))
              .cast("double").as("sxe"))
        aux.select(col("n").as("n_users"),
            round((col("n") * col("sxe") - col("sx") * col("se")) *
              (col("n") * col("sxe") - col("sx") * col("se")) /
              ((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("n") * col("see") - col("se") * col("se"))), 6)
              .as("r2_aux"))
          .select(col("n_users"), col("r2_aux"),
            round(col("n_users") * col("r2_aux"), 4).as("lm_stat"),
            (col("n_users") * col("r2_aux") > 3.841).cast("long")
              .as("heteroscedastic_sig_05"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id, COUNT(*) AS x,
             |        SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS y
             |      FROM events GROUP BY 1),
             |f0 AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             |        SUM(x * x) AS sxx, SUM(x * y) AS sxy FROM u),
             |fit AS (SELECT n,
             |        round(CAST(n * sxy - sx * sy AS DOUBLE) /
             |          CAST(n * sxx - sx * sx AS DOUBLE), 9) AS b,
             |        sx, sy FROM f0),
             |fit2 AS (SELECT n, b,
             |        round((CAST(sy AS DOUBLE) - b * sx) / n, 9) AS a
             |      FROM fit),
             |e2 AS (SELECT u.x,
             |        round((u.y - fit2.a - fit2.b * u.x) *
             |          (u.y - fit2.a - fit2.b * u.x) / 10000.0, 6) AS e2
             |      FROM u CROSS JOIN fit2),
             |aux AS (SELECT COUNT(*) AS n, SUM(x) AS sx,
             |        SUM(x * x) AS sxx,
             |        CAST(SUM(CAST(round(e2, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS se,
             |        CAST(SUM(CAST(round(e2 * e2, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS see,
             |        CAST(SUM(CAST(round(x * e2, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sxe
             |      FROM e2)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |  round((n * sxe - sx * se) * (n * sxe - sx * se) /
             |    (CAST(n * sxx - sx * sx AS DOUBLE) *
             |      (n * see - se * se)), 6) AS r2_aux,
             |  round(n * ((n * sxe - sx * se) * (n * sxe - sx * se) /
             |    (CAST(n * sxx - sx * sx AS DOUBLE) *
             |      (n * see - se * se))), 4) AS lm_stat,
             |  CAST(n * ((n * sxe - sx * se) * (n * sxe - sx * se) /
             |    (CAST(n * sxx - sx * sx AS DOUBLE) *
             |      (n * see - se * se))) > 3.841 AS BIGINT)
             |    AS heteroscedastic_sig_05
             |FROM aux ORDER BY n_users""".stripMargin)),

    // HyperBall / ANF: the approximate neighborhood function N(h) and
    // effective diameter of the item graph via HLL register propagation
    // (Palmer, Gibbons & Faloutsos, ANF, KDD 2002; Boldi, Rosa & Vigna,
    // HyperBall, WWW 2011) — THE way distance distributions are computed
    // on graphs too big for all-pairs BFS: each node carries a 64-register
    // HLL of its h-ball, and one round is ONE edge equi-join + a
    // (node, bucket) max — registers are per-bucket maxima, so rounds
    // merge map-side and replay under any partitioning. x139's k-hop
    // reach is the exact-BFS read for chosen sources; this is the
    // all-sources sketch whose cost stays |nodes|·64 state rows at any
    // graph size. Registers use the repo's HLL arithmetic (48-bit md5
    // key, bucket = h mod 64, rank = 43 − bitlen, linear counting when
    // zeros remain — every step integer, SQL-replayable); estimates
    // round at 6 and sum DECIMAL. Effective diameter = smallest h with
    // N(h) ≥ 0.9·N(4).
    QuerySpec(
      "x323_hyperball_anf",
      (s, dir) => {
        val edges = ExtensionQueries.itemEdges(s, dir, 3)
          .select("src", "dst").localCheckpoint()
        val init = edges.select(col("src").as("node")).distinct()
          .select(col("node"),
            conv(substring(md5(concat(lit("anf:"),
              col("node").cast("string"))), 1, 12), 16, 10)
              .cast("long").as("h"))
          .select(col("node"), (col("h") % 64).cast("int").as("bucket"),
            expr("CAST(43 - CASE WHEN h div 64 = 0 THEN 0 ELSE " +
              "length(conv(h div 64, 10, 2)) END AS INT)").as("rank"))
          .localCheckpoint()
        def estimate(st: org.apache.spark.sql.DataFrame, h: Int) =
          st.groupBy("node")
            .agg(count(lit(1)).as("c"),
              sum(round(pow(lit(0.5), col("rank")), 14)
                .cast("decimal(18,14)")).cast("double").as("sp"))
            .select(
              when((lit(64) - col("c")) > 0 &&
                lit(0.709 * 4096.0) /
                  (col("sp") + (lit(64) - col("c"))) <= 160.0,
                round(lit(64.0) *
                  log(lit(64.0) / (lit(64) - col("c"))), 6))
                .otherwise(round(lit(0.709 * 4096.0) /
                  (col("sp") + (lit(64) - col("c"))), 6)).as("est"))
            .agg(round(sum(col("est").cast("decimal(18,6)"))
              .cast("double"), 2).as("nf_est"))
            .select(lit(h.toLong).as("h"), col("nf_est"))
        var st = init
        val rounds = scala.collection.mutable.ArrayBuffer(estimate(st, 0))
        for (h <- 1 to 4) {
          st = st
            .unionByName(edges
              .join(st.withColumnRenamed("node", "src"), "src")
              .select(col("dst").as("node"), col("bucket"), col("rank")))
            .groupBy("node", "bucket").agg(max(col("rank")).as("rank"))
            .localCheckpoint() // |nodes| x 64 rows, bounded per round
          rounds += estimate(st, h)
        }
        val all = rounds.reduce(_ unionByName _)
        val last = all.filter(col("h") === 4)
          .select(col("nf_est").as("nf_max"))
        all.crossJoin(broadcast(last))
          .select(col("h"), col("nf_est"),
            round(col("nf_est") / col("nf_max"), 6).as("coverage"),
            (col("nf_est") >= lit(0.9) * col("nf_max")).cast("long")
              .as("reached_90pct"))
          .orderBy("h")
      },
      Some {
        def estSql(r: String, h: Int): String =
          s"""SELECT $h AS h, round(CAST(SUM(CAST(est AS DECIMAL(18,6)))
             |    AS DOUBLE), 2) AS nf_est FROM (
             |  SELECT CASE WHEN 64 - COUNT(*) > 0 AND
             |      0.709 * 4096.0 / (CAST(SUM(CAST(round(pow(0.5, rank),
             |        14) AS DECIMAL(18,14))) AS DOUBLE) +
             |        (64 - COUNT(*))) <= 160.0
             |    THEN round(64.0 * ln(64.0 / (64 - COUNT(*))), 6)
             |    ELSE round(0.709 * 4096.0 /
             |      (CAST(SUM(CAST(round(pow(0.5, rank), 14)
             |        AS DECIMAL(18,14))) AS DOUBLE) +
             |        (64 - COUNT(*))), 6) END AS est
             |  FROM $r GROUP BY node)""".stripMargin
        def roundSql(prev: String, cur: String): String =
          s"""$cur AS MATERIALIZED (SELECT node, bucket, MAX(rank) AS rank
             |  FROM (SELECT node, bucket, rank FROM $prev
             |    UNION ALL SELECT e.dst AS node, $prev.bucket, $prev.rank
             |    FROM e JOIN $prev ON $prev.node = e.src)
             |  GROUP BY 1, 2)""".stripMargin
        s"""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
           |      CAST(json_extract_string(props, '$$.k') AS INT) AS item
           |    FROM events),
           |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
           |    FROM ctx a JOIN ctx b ON a.user_id = b.user_id
           |      AND a.day = b.day AND a.item < b.item
           |    GROUP BY 1, 2 HAVING COUNT(*) >= 3),
           |e AS (SELECT ia AS src, ib AS dst FROM pc
           |    UNION ALL SELECT ib, ia FROM pc),
           |r0 AS MATERIALIZED (SELECT node,
           |    CAST(h % 64 AS INT) AS bucket,
           |    CAST(43 - CASE WHEN h // 64 = 0 THEN 0
           |      ELSE length(printf('%b', h // 64)) END AS INT) AS rank
           |  FROM (SELECT node, CAST(('0x' || substr(md5('anf:' ||
           |      CAST(node AS VARCHAR)), 1, 12)) AS BIGINT) AS h
           |    FROM (SELECT DISTINCT src AS node FROM e))),
           |${roundSql("r0", "r1")},
           |${roundSql("r1", "r2")},
           |${roundSql("r2", "r3")},
           |${roundSql("r3", "r4")},
           |nf AS (${estSql("r0", 0)}
           |  UNION ALL ${estSql("r1", 1)}
           |  UNION ALL ${estSql("r2", 2)}
           |  UNION ALL ${estSql("r3", 3)}
           |  UNION ALL ${estSql("r4", 4)}),
           |mx AS (SELECT nf_est AS nf_max FROM nf WHERE h = 4)
           |SELECT CAST(nf.h AS BIGINT) AS h, nf.nf_est,
           |  round(nf.nf_est / mx.nf_max, 6) AS coverage,
           |  CAST(nf.nf_est >= 0.9 * mx.nf_max AS BIGINT)
           |    AS reached_90pct
           |FROM nf CROSS JOIN mx ORDER BY h""".stripMargin
      }),

    // Moran's I and Geary's C (Moran, Biometrika 1950; Geary 1954) of
    // per-item purchase volume over the item co-occurrence graph — GRAPH
    // autocorrelation: do high-volume items sit NEXT TO high-volume
    // items (I > E[I] = −1/(n−1)), and is the local read (C, more
    // sensitive to neighbor-pair differences) consistent with the global
    // one? The spatial-statistics pair every geo stack ships, here on
    // the co-purchase topology where "space" is the basket graph. One
    // |edges|-row join against the broadcast volume table; every z
    // product/difference rides rounded-6 DECIMAL sums; weights are the
    // co-occurrence counts w.
    QuerySpec(
      "x324_morans_i",
      (s, dir) => {
        val edges = ExtensionQueries.itemEdges(s, dir, 3).localCheckpoint()
        val vol = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(expr("variant_get(parse_json(props), '$.k', 'int')")
            .as("item"))
          .filter(col("item").isNotNull)
          .groupBy("item").agg(count(lit(1)).as("v"))
        val nodes = edges.select(col("src").as("item")).distinct()
          .join(vol, Seq("item"), "left").na.fill(0L, Seq("v"))
          .localCheckpoint() // graph-bounded volume table
        val m = nodes.agg(count(lit(1)).as("n"),
            sum(col("v")).as("sv"))
          .select(col("n"),
            round(col("sv").cast("double") / col("n"), 6).as("mu"))
        val z = nodes.crossJoin(broadcast(m))
          .select(col("item"), col("n"),
            round(col("v") - col("mu"), 6).as("z"))
        val den = z.agg(max(col("n")).as("n"),
          sum(round(col("z") * col("z"), 6).cast("decimal(38,6)"))
            .cast("double").as("szz"))
        val cross = edges
          .join(z.select(col("item").as("src"), col("z").as("zi")), "src")
          .join(z.select(col("item").as("dst"), col("z").as("zj")), "dst")
          .agg(sum(col("w")).as("wtot"),
            sum(round(col("w") * col("zi") * col("zj"), 6)
              .cast("decimal(38,6)")).cast("double").as("swzz"),
            sum(round(col("w") * (col("zi") - col("zj")) *
              (col("zi") - col("zj")), 6).cast("decimal(38,6)"))
              .cast("double").as("swdd"))
        cross.crossJoin(broadcast(den))
          .select(col("n").as("n_items"), col("wtot").as("w_total"),
            round(col("n").cast("double") / col("wtot") *
              col("swzz") / col("szz"), 6).as("morans_i"),
            round(lit(-1.0) / (col("n") - 1), 6).as("e_i"),
            round((col("n") - 1).cast("double") /
              (lit(2.0) * col("wtot")) * col("swdd") / col("szz"), 6)
              .as("gearys_c"))
          .orderBy("n_items")
      },
      Some("""WITH ctx AS (SELECT DISTINCT user_id, CAST(ts AS DATE)
             |          AS day,
             |        CAST(json_extract_string(props, '$.k') AS INT)
             |          AS item
             |      FROM events),
             |pc AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS w
             |      FROM ctx a JOIN ctx b ON a.user_id = b.user_id
             |        AND a.day = b.day AND a.item < b.item
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 3),
             |e AS (SELECT ia AS src, ib AS dst, w FROM pc
             |      UNION ALL SELECT ib, ia, w FROM pc),
             |vol AS (SELECT CAST(json_extract_string(props, '$.k')
             |          AS INT) AS item, COUNT(*) AS v
             |      FROM events WHERE event_type = 'purchase'
             |        AND json_extract_string(props, '$.k') IS NOT NULL
             |      GROUP BY 1),
             |nodes AS (SELECT n.item, COALESCE(vol.v, 0) AS v
             |      FROM (SELECT DISTINCT src AS item FROM e) n
             |      LEFT JOIN vol ON vol.item = n.item),
             |m AS (SELECT COUNT(*) AS n,
             |        round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mu
             |      FROM nodes),
             |z AS (SELECT item, m.n, round(v - m.mu, 6) AS z
             |      FROM nodes CROSS JOIN m),
             |den AS (SELECT MAX(n) AS n,
             |        CAST(SUM(CAST(round(z * z, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS szz
             |      FROM z),
             |crs AS (SELECT SUM(e.w) AS wtot,
             |        CAST(SUM(CAST(round(e.w * zi.z * zj.z, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swzz,
             |        CAST(SUM(CAST(round(e.w * (zi.z - zj.z) *
             |          (zi.z - zj.z), 6) AS DECIMAL(38,6))) AS DOUBLE)
             |          AS swdd
             |      FROM e JOIN z zi ON zi.item = e.src
             |        JOIN z zj ON zj.item = e.dst)
             |SELECT CAST(den.n AS BIGINT) AS n_items,
             |  CAST(crs.wtot AS BIGINT) AS w_total,
             |  round(CAST(den.n AS DOUBLE) / crs.wtot *
             |    crs.swzz / den.szz, 6) AS morans_i,
             |  round(-1.0 / (den.n - 1), 6) AS e_i,
             |  round(CAST(den.n - 1 AS DOUBLE) / (2.0 * crs.wtot) *
             |    crs.swdd / den.szz, 6) AS gearys_c
             |FROM crs CROSS JOIN den ORDER BY n_items""".stripMargin)),

    // External cluster-agreement panel — adjusted Rand index (Hubert &
    // Arabie, J. Classification 1985), sqrt-normalized mutual
    // information (Strehl & Ghosh, JMLR 2002) and Fowlkes-Mallows (JASA
    // 1983) — between the embedding labels and a fully SQL-replayable
    // partition: nearest of the 8 seed vectors (corpus rows vec_id 0–7,
    // the x13 seed-vector device) by rounded Euclidean distance. This is
    // the external-validity companion to the internal panel
    // (x215 silhouette / x316 Davies-Bouldin / x304 pseudo-F): does the
    // geometry RECOVER the labels? ARI/FM are exact pair combinatorics
    // over the ≤80-cell contingency table; NMI rides rounded-9 p·ln
    // sums. Scale: one 8-way broadcast score join (bounded side is 8
    // literal-bounded rows), then bounded-grid algebra.
    QuerySpec(
      "x325_cluster_agreement",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        val W = org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, dir)
          .filter(col("embedding").isNotNull) // no geometry, no cluster
        val seeds = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("sid"), col("embedding").as("s_emb"))
          .withColumn("ss", expr("float_dot(s_emb, s_emb)"))
        val asg = e.select(col("vec_id"), col("label"),
            col("embedding").as("v_emb"))
          .withColumn("vv", expr("float_dot(v_emb, v_emb)"))
          .crossJoin(broadcast(seeds))
          .select(col("vec_id"), col("label"), col("sid"),
            round(sqrt(greatest(col("vv") + col("ss") -
              lit(2.0) * expr("float_dot(v_emb, s_emb)"), lit(0.0))), 6)
              .as("d"))
          .withColumn("rn", row_number().over(
            W.partitionBy("vec_id").orderBy(col("d").asc, col("sid"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("label"), col("sid").as("cell"))
        val ct = asg.groupBy("label", "cell").agg(count(lit(1)).as("c"))
          .localCheckpoint() // <= 80 cells feed all three indexes
        val n = ct.agg(sum(col("c")).as("n"))
        val a = ct.groupBy("label").agg(sum(col("c")).as("ai"))
          .agg(sum(expr("ai * (ai - 1) div 2")).as("sa"))
        val b = ct.groupBy("cell").agg(sum(col("c")).as("bj"))
          .agg(sum(expr("bj * (bj - 1) div 2")).as("sb"))
        val nij = ct.agg(sum(expr("c * (c - 1) div 2")).as("sn"))
        // entropies for NMI
        def ent(keyed: org.apache.spark.sql.DataFrame) = keyed
          .crossJoin(broadcast(n))
          .select(round((col("k").cast("double") / col("n")) *
            log(col("n").cast("double") / col("k")), 9)
            .cast("decimal(18,9)").as("term"))
          .agg(sum(col("term")).cast("double").as("h"))
        val ha = ent(ct.groupBy("label").agg(sum(col("c")).as("k")))
          .select(col("h").as("ha"))
        val hb = ent(ct.groupBy("cell").agg(sum(col("c")).as("k")))
          .select(col("h").as("hb"))
        val hab = ent(ct.select(col("c").as("k")))
          .select(col("h").as("hab"))
        nij.crossJoin(broadcast(a)).crossJoin(broadcast(b))
          .crossJoin(broadcast(n))
          .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
          .crossJoin(broadcast(hab))
          .select(col("n").as("n_vectors"),
            round((col("sn").cast("double") -
              col("sa").cast("double") * col("sb") /
                expr("CAST(n * (n - 1) div 2 AS DOUBLE)")) /
              ((col("sa") + col("sb")).cast("double") / 2.0 -
                col("sa").cast("double") * col("sb") /
                  expr("CAST(n * (n - 1) div 2 AS DOUBLE)")), 6)
              .as("ari"),
            round((col("ha") + col("hb") - col("hab")) /
              sqrt(col("ha") * col("hb")), 6).as("nmi_sqrt"),
            round(col("sn").cast("double") /
              sqrt(col("sa").cast("double") * col("sb")), 6)
              .as("fowlkes_mallows"))
          .orderBy("n_vectors")
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |        [CAST(x AS DOUBLE) for x in embedding] AS emb
             |      FROM embeddings WHERE embedding IS NOT NULL),
             |sd AS (SELECT vec_id AS sid, emb AS s_emb FROM e
             |      WHERE vec_id < 8),
             |f AS (SELECT e.vec_id, e.label, sd.sid,
             |        unnest(e.emb) AS ev, unnest(sd.s_emb) AS sv
             |      FROM e CROSS JOIN sd),
             |d AS (SELECT vec_id, label, sid,
             |        round(sqrt(greatest(SUM((ev - sv) * (ev - sv)),
             |          0.0)), 6) AS d
             |      FROM f GROUP BY 1, 2, 3),
             |asg AS (SELECT vec_id, label, sid AS cell FROM (
             |      SELECT vec_id, label, sid, row_number() OVER (
             |        PARTITION BY vec_id ORDER BY d, sid) AS rn FROM d)
             |      WHERE rn = 1),
             |ct AS (SELECT label, cell, COUNT(*) AS c FROM asg
             |      GROUP BY 1, 2),
             |n AS (SELECT SUM(c) AS n FROM ct),
             |a AS (SELECT SUM(ai * (ai - 1) // 2) AS sa FROM (
             |      SELECT label, SUM(c) AS ai FROM ct GROUP BY 1)),
             |b AS (SELECT SUM(bj * (bj - 1) // 2) AS sb FROM (
             |      SELECT cell, SUM(c) AS bj FROM ct GROUP BY 1)),
             |nij AS (SELECT SUM(c * (c - 1) // 2) AS sn FROM ct),
             |ha AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(k AS DOUBLE) / n.n) *
             |        ln(CAST(n.n AS DOUBLE) / k), 9) AS DECIMAL(18,9)))
             |        AS DOUBLE) AS ha
             |      FROM (SELECT label, SUM(c) AS k FROM ct GROUP BY 1)
             |        CROSS JOIN n),
             |hb AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(k AS DOUBLE) / n.n) *
             |        ln(CAST(n.n AS DOUBLE) / k), 9) AS DECIMAL(18,9)))
             |        AS DOUBLE) AS hb
             |      FROM (SELECT cell, SUM(c) AS k FROM ct GROUP BY 1)
             |        CROSS JOIN n),
             |hab AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(c AS DOUBLE) / n.n) *
             |        ln(CAST(n.n AS DOUBLE) / c), 9) AS DECIMAL(18,9)))
             |        AS DOUBLE) AS hab
             |      FROM ct CROSS JOIN n)
             |SELECT CAST(n.n AS BIGINT) AS n_vectors,
             |  round((CAST(nij.sn AS DOUBLE) -
             |    CAST(a.sa AS DOUBLE) * b.sb /
             |      CAST(n.n * (n.n - 1) // 2 AS DOUBLE)) /
             |    (CAST(a.sa + b.sb AS DOUBLE) / 2.0 -
             |      CAST(a.sa AS DOUBLE) * b.sb /
             |        CAST(n.n * (n.n - 1) // 2 AS DOUBLE)), 6) AS ari,
             |  round((ha.ha + hb.hb - hab.hab) /
             |    sqrt(ha.ha * hb.hb), 6) AS nmi_sqrt,
             |  round(CAST(nij.sn AS DOUBLE) /
             |    sqrt(CAST(a.sa AS DOUBLE) * b.sb), 6)
             |    AS fowlkes_mallows
             |FROM nij CROSS JOIN a CROSS JOIN b CROSS JOIN n
             |  CROSS JOIN ha CROSS JOIN hb CROSS JOIN hab
             |ORDER BY n_vectors""".stripMargin)),

    // Own-price demand elasticity (the Marshall 1890 textbook read,
    // estimated as the log-log OLS slope — Working 1943 for the
    // double-log demand specification): across parts, regress
    // ln(total quantity) on ln(mean unit price) — the one number a
    // pricing read wants from the lineitem fact. Parts aggregate first
    // (map-side combined), so the regression runs over the |parts|-
    // bounded grid; quantities are integral (BIGINT-exact), prices ride
    // the round-6 DECIMAL bridge, lns round at 9 into DECIMAL moments.
    QuerySpec(
      "x326_price_elasticity",
      (s, dir) => {
        // DOMAIN (round-12, AdversarialDataSpec): quantity is a unit
        // COUNT ≥ 1 (also keeps the per-row unit price inside the
        // DECIMAL(18,6) domain — a near-zero divisor overflowed it), and
        // the log-log regression needs a positive mean unit price —
        // without the sp > 0 guard Spark's ln(negative) is silently NULL
        // while DuckDB's errors, a cross-engine semantics trap
        val pg = Tables.lineitem(s, dir)
          .filter(col("l_quantity") >= 1)
          .groupBy("l_partkey")
          .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"),
            sum(round(col("l_extendedprice") / col("l_quantity"), 6)
              .cast("decimal(18,6)")).cast("double").as("sp"),
            count(lit(1)).as("cnt"))
          .filter(col("q") > 0 && col("sp") > 0)
          .select(
            round(log(col("sp") / col("cnt")), 9).as("x"),
            round(log(col("q").cast("double")), 9).as("y"))
        val mom = pg.agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(18,9)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(18,9)")).cast("double").as("sy"),
          sum(round(col("x") * col("x"), 9).cast("decimal(38,9)"))
            .cast("double").as("sxx"),
          sum(round(col("y") * col("y"), 9).cast("decimal(38,9)"))
            .cast("double").as("syy"),
          sum(round(col("x") * col("y"), 9).cast("decimal(38,9)"))
            .cast("double").as("sxy"))
        mom.select(col("n").as("n_parts"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6)
              .as("elasticity"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") *
              col("sy")) / (col("n") * col("sxx") - col("sx") *
              col("sx")) * col("sx")) / col("n"), 6).as("intercept"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) *
              (col("n") * col("sxy") - col("sx") * col("sy")) /
              ((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))), 6)
              .as("r2"))
          .select(col("n_parts"), col("elasticity"), col("intercept"),
            col("r2"),
            (col("elasticity") < -1.0).cast("long").as("is_elastic"))
          .orderBy("n_parts")
      },
      Some("""WITH pg AS (SELECT l_partkey,
             |        SUM(CAST(round(l_quantity) AS BIGINT)) AS q,
             |        CAST(SUM(CAST(round(l_extendedprice / l_quantity,
             |          6) AS DECIMAL(18,6))) AS DOUBLE) AS sp,
             |        COUNT(*) AS cnt
             |      FROM lineitem WHERE l_quantity >= 1 GROUP BY 1 HAVING
             |        SUM(CAST(round(l_quantity) AS BIGINT)) > 0
             |        AND CAST(SUM(CAST(round(l_extendedprice / l_quantity,
             |          6) AS DECIMAL(18,6))) AS DOUBLE) > 0),
             |xy AS (SELECT round(ln(sp / cnt), 9) AS x,
             |        round(ln(CAST(q AS DOUBLE)), 9) AS y
             |      FROM pg),
             |mom AS (SELECT COUNT(*) AS n,
             |        CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS sxx,
             |        CAST(SUM(CAST(round(y * y, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS syy,
             |        CAST(SUM(CAST(round(x * y, 9) AS DECIMAL(38,9)))
             |          AS DOUBLE) AS sxy
             |      FROM xy)
             |SELECT CAST(n AS BIGINT) AS n_parts,
             |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             |    AS elasticity,
             |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
             |    * sx) / n, 6) AS intercept,
             |  round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
             |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
             |  CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) < -1.0
             |    AS BIGINT) AS is_elastic
             |FROM mom ORDER BY n_parts""".stripMargin)),

    // Peaks-over-threshold GPD tail fit by probability-weighted moments
    // (Pickands 1975 for the GPD limit; Hosking & Wallis, Technometrics
    // 1987 for the CLOSED-FORM PWM estimators ξ = 2 − b0/(b0−2b1),
    // σ = 2·b0·b1/(b0−2b1) — no iteration, so the whole fit is exact
    // algebra over two weighted moments): how heavy is the event-value
    // tail ABOVE the 95th percentile, and what value does the fitted
    // tail put at P99.9 — the extreme-value read between x186's Hill
    // exponent (assumes pure power law) and x303's Gumbel block maxima
    // (weekly maxima, not exceedances). b1's plotting weights use
    // average ranks over tie runs (exact halves); exceedances ride
    // rounded-6 DECIMAL sums. One scan + windows over the bounded
    // exceedance-value grid.
    QuerySpec(
      "x327_gpd_tail",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select(col("value").cast("double").as("v"))
        val thr = ev.agg(
          round(expr("percentile(v, 0.95)"), 6).as("u"),
          count(lit(1)).as("ntot"))
        val exc = ev.crossJoin(broadcast(thr))
          .filter(col("v") > col("u"))
          .select(col("u"), col("ntot"),
            round(col("v") - col("u"), 6).as("y"))
        val g = exc.groupBy("u", "ntot", "y").agg(count(lit(1)).as("ct"))
        val wc = W.partitionBy("u").orderBy("y")
          .rowsBetween(W.unboundedPreceding, -1)
        val ranked = g
          .withColumn("cumprev", coalesce(sum(col("ct")).over(wc), lit(0L)))
          .withColumn("ravg", col("cumprev").cast("double") +
            (col("ct") + 1).cast("double") / 2.0)
        val mom = ranked.groupBy("u", "ntot")
          .agg(sum(col("ct")).as("k"),
            sum(round(col("ct") * col("y"), 6).cast("decimal(38,6)"))
              .cast("double").as("sy"),
            sum(round(col("ct") * col("y") * (col("ravg") - 1.0), 6)
              .cast("decimal(38,6)")).cast("double").as("syr"))
          .select(col("u"), col("ntot"), col("k"),
            round(col("sy") / col("k"), 9).as("b0"),
            round(col("syr") / (col("k").cast("double") *
              (col("k") - 1)), 9).as("b1"))
        mom.select(col("u").as("threshold"),
            col("k").as("n_exceedances"),
            round(lit(2.0) - col("b0") / (col("b0") - col("b1") * 2.0), 6)
              .as("xi_shape"),
            round(lit(2.0) * col("b0") * col("b1") /
              (col("b0") - col("b1") * 2.0), 6).as("sigma_scale"),
            col("ntot"), col("b0"), col("b1"))
          .select(col("threshold"), col("n_exceedances"),
            col("xi_shape"), col("sigma_scale"),
            round(col("threshold") + col("sigma_scale") / col("xi_shape") *
              (pow(col("ntot").cast("double") * 0.001 /
                col("n_exceedances"), -col("xi_shape")) - 1.0), 4)
              .as("p999_value"))
          .orderBy("threshold")
      },
      Some("""WITH ev AS (SELECT CAST(value AS DOUBLE) AS v FROM events),
             |thr AS (SELECT round(quantile_cont(v, 0.95), 6) AS u,
             |        COUNT(*) AS ntot FROM ev),
             |exc AS (SELECT thr.u, thr.ntot, round(v - thr.u, 6) AS y
             |      FROM ev CROSS JOIN thr WHERE v > thr.u),
             |g AS (SELECT u, ntot, y, COUNT(*) AS ct FROM exc
             |      GROUP BY 1, 2, 3),
             |rk AS (SELECT u, ntot, y, ct,
             |        CAST(COALESCE(SUM(ct) OVER (PARTITION BY u
             |          ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND
             |          1 PRECEDING), 0) AS DOUBLE) +
             |          CAST(ct + 1 AS DOUBLE) / 2.0 AS ravg
             |      FROM g),
             |mom AS (SELECT u, ntot, SUM(ct) AS k,
             |        round(CAST(SUM(CAST(round(ct * y, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) / SUM(ct), 9) AS b0,
             |        round(CAST(SUM(CAST(round(ct * y * (ravg - 1.0), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) /
             |          (CAST(SUM(ct) AS DOUBLE) * (SUM(ct) - 1)), 9)
             |          AS b1
             |      FROM rk GROUP BY 1, 2),
             |fit AS (SELECT u AS threshold, k AS n_exceedances,
             |        round(2.0 - b0 / (b0 - 2.0 * b1), 6) AS xi_shape,
             |        round(2.0 * b0 * b1 / (b0 - 2.0 * b1), 6)
             |          AS sigma_scale,
             |        ntot
             |      FROM mom)
             |SELECT threshold, CAST(n_exceedances AS BIGINT)
             |    AS n_exceedances,
             |  xi_shape, sigma_scale,
             |  round(threshold + sigma_scale / xi_shape *
             |    (pow(CAST(ntot AS DOUBLE) * 0.001 / n_exceedances,
             |      -xi_shape) - 1.0), 4) AS p999_value
             |FROM fit ORDER BY threshold""".stripMargin)),

    // Deming regression (Adcock 1878; Deming 1943 popularized it) with
    // λ = 1 between per-user view and purchase counts — the errors-in-
    // BOTH-variables line OLS gets wrong whenever the x-axis is itself a
    // noisy measurement (OLS attenuates the slope toward 0; Deming's
    // closed form slope = (s_yy − s_xx + √((s_yy−s_xx)² + 4s_xy²))/(2s_xy)
    // is the TLS fix). The method-comparison read next to x311's
    // predictive screen. Integer count moments are BIGINT-exact; the fit
    // is one 1-row closed-form expression.
    QuerySpec(
      "x328_deming",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(sum((col("event_type") === "view").cast("long")).as("x"),
            sum((col("event_type") === "purchase").cast("long")).as("y"))
        val mom = u.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        val c = mom.select(col("n"),
          (col("sx").cast("double") / col("n")).as("mx"),
          (col("sy").cast("double") / col("n")).as("my"),
          ((col("sxx").cast("double") - col("sx").cast("double") *
            col("sx") / col("n")) / col("n")).as("vxx"),
          ((col("syy").cast("double") - col("sy").cast("double") *
            col("sy") / col("n")) / col("n")).as("vyy"),
          ((col("sxy").cast("double") - col("sx").cast("double") *
            col("sy") / col("n")) / col("n")).as("vxy"))
        c.select(col("n").as("n_users"),
            round((col("vyy") - col("vxx") +
              sqrt((col("vyy") - col("vxx")) * (col("vyy") - col("vxx")) +
                col("vxy") * col("vxy") * 4.0)) / (col("vxy") * 2.0), 6)
              .as("deming_slope"),
            round(col("vxy") / col("vxx"), 6).as("ols_slope"),
            col("mx"), col("my"))
          .select(col("n_users"), col("deming_slope"), col("ols_slope"),
            round(col("my") - col("deming_slope") * col("mx"), 6)
              .as("deming_intercept"),
            round(col("deming_slope") / col("ols_slope"), 6)
              .as("attenuation_ratio"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
             |          END) AS x,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1
             |          ELSE 0 END) AS y
             |      FROM events GROUP BY 1),
             |mom AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             |        SUM(x * x) AS sxx, SUM(y * y) AS syy,
             |        SUM(x * y) AS sxy FROM u),
             |c AS (SELECT n,
             |        CAST(sx AS DOUBLE) / n AS mx,
             |        CAST(sy AS DOUBLE) / n AS my,
             |        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
             |          / n AS vxx,
             |        (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
             |          / n AS vyy,
             |        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
             |          / n AS vxy
             |      FROM mom),
             |f AS (SELECT n,
             |        round((vyy - vxx + sqrt((vyy - vxx) * (vyy - vxx) +
             |          4.0 * vxy * vxy)) / (2.0 * vxy), 6)
             |          AS deming_slope,
             |        round(vxy / vxx, 6) AS ols_slope, mx, my
             |      FROM c)
             |SELECT CAST(n AS BIGINT) AS n_users, deming_slope,
             |  ols_slope,
             |  round(my - deming_slope * mx, 6) AS deming_intercept,
             |  round(deming_slope / ols_slope, 6) AS attenuation_ratio
             |FROM f ORDER BY n_users""".stripMargin)),

    // Empirical upper-tail dependence (the λ_U read from copula theory —
    // Sibuya 1960 defined it; Joe 1997 ch. 2 is the standard reference):
    // GIVEN a heavy view day, how likely is a heavy purchase day —
    // λ̂_U(t) = P(Y > q_y(t) | X > q_x(t)) at t ∈ {0.75, 0.9}, the
    // dependence-in-extremes number that Pearson/Kendall correlations
    // (which average over the whole distribution) structurally cannot
    // see. Quantiles round at 6; everything after is exact counting over
    // the calendar-bounded day grid, one row per t.
    QuerySpec(
      "x329_tail_dependence",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            sum((col("event_type") === "view").cast("long")).as("x"),
            sum((col("event_type") === "purchase").cast("long")).as("y"))
          .localCheckpoint() // day grid feeds quantiles + counting
        val q = d.agg(
          round(expr("percentile(CAST(x AS DOUBLE), 0.75)"), 6).as("qx75"),
          round(expr("percentile(CAST(y AS DOUBLE), 0.75)"), 6).as("qy75"),
          round(expr("percentile(CAST(x AS DOUBLE), 0.9)"), 6).as("qx90"),
          round(expr("percentile(CAST(y AS DOUBLE), 0.9)"), 6).as("qy90"))
        val j = d.crossJoin(broadcast(q))
          .select(explode(array(
            struct(lit(0.75).as("t"),
              (col("x") > col("qx75")).cast("long").as("hx"),
              (col("y") > col("qy75")).cast("long").as("hy")),
            struct(lit(0.9).as("t"),
              (col("x") > col("qx90")).cast("long").as("hx"),
              (col("y") > col("qy90")).cast("long").as("hy")))).as("r"))
          .select(col("r.t").as("t"), col("r.hx").as("hx"),
            col("r.hy").as("hy"))
        j.groupBy("t")
          .agg(count(lit(1)).as("n_days"),
            sum(col("hx")).as("n_hx"),
            sum(col("hx") * col("hy")).as("n_both"))
          .select(col("t").as("quantile_t"), col("n_days"),
            col("n_hx").as("n_heavy_view_days"),
            col("n_both").as("n_joint_heavy_days"),
            round(col("n_both").cast("double") / col("n_hx"), 6)
              .as("lambda_u_hat"))
          .orderBy("quantile_t")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
             |        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
             |          END) AS x,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1
             |          ELSE 0 END) AS y
             |      FROM events GROUP BY 1),
             |q AS (SELECT
             |        round(quantile_cont(CAST(x AS DOUBLE), 0.75), 6)
             |          AS qx75,
             |        round(quantile_cont(CAST(y AS DOUBLE), 0.75), 6)
             |          AS qy75,
             |        round(quantile_cont(CAST(x AS DOUBLE), 0.9), 6)
             |          AS qx90,
             |        round(quantile_cont(CAST(y AS DOUBLE), 0.9), 6)
             |          AS qy90
             |      FROM d),
             |j AS (SELECT r.t,
             |        CASE r.t WHEN 0.75 THEN CAST(d.x > q.qx75 AS BIGINT)
             |          ELSE CAST(d.x > q.qx90 AS BIGINT) END AS hx,
             |        CASE r.t WHEN 0.75 THEN CAST(d.y > q.qy75 AS BIGINT)
             |          ELSE CAST(d.y > q.qy90 AS BIGINT) END AS hy
             |      FROM d CROSS JOIN q
             |        CROSS JOIN (SELECT unnest([0.75, 0.9]) AS t) r)
             |SELECT t AS quantile_t, CAST(COUNT(*) AS BIGINT) AS n_days,
             |  CAST(SUM(hx) AS BIGINT) AS n_heavy_view_days,
             |  CAST(SUM(hx * hy) AS BIGINT) AS n_joint_heavy_days,
             |  round(CAST(SUM(hx * hy) AS DOUBLE) / SUM(hx), 6)
             |    AS lambda_u_hat
             |FROM j GROUP BY 1 ORDER BY quantile_t""".stripMargin)),

    // Theil-T inequality with exact between/within decomposition (Theil
    // 1967) + Atkinson ε=1 (Atkinson, JET 1970) of per-customer revenue
    // by nation — the decomposable complement to the suite's Gini/Lorenz
    // read: Gini CANNOT split into between-group + within-group parts
    // (its decomposition leaves a residual); Theil splits EXACTLY,
    // T = Σ_g s_g·T_g + Σ_g s_g·ln((s_g)/(n_g/n)), so "how much revenue
    // inequality is ACROSS nations vs WITHIN them" is a well-posed
    // number. Atkinson(1) = 1 − geomean/mean rides the same rounded-9
    // ln sums. Customers with zero revenue are excluded (both indexes
    // need x > 0), count reported. One fact-dim join, then group-grid
    // algebra; cents are BIGINT-exact.
    QuerySpec(
      "x330_theil_decomposition",
      (s, dir) => {
        val cust = Tables.orders(s, dir)
          .join(Tables.customer(s, dir),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_nationkey").as("nation"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("x"))
          .filter(col("x") > 0)
          .localCheckpoint() // per-customer revenue feeds all three sums
        val tot = cust.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val base = cust.crossJoin(broadcast(tot))
        val tTotal = base
          .select(round((col("x").cast("double") / col("sx")) *
            log(col("x").cast("double") * col("n") / col("sx")), 9)
            .cast("decimal(18,9)").as("term"))
          .agg(sum(col("term")).cast("double").as("t_total"))
        val grp = base.groupBy("nation")
          .agg(count(lit(1)).as("ng"), sum(col("x")).as("sxg"),
            max(col("n")).as("n"), max(col("sx")).as("sx"))
        val between = grp
          .select(round((col("sxg").cast("double") / col("sx")) *
            log((col("sxg").cast("double") / col("sx")) *
              (col("n").cast("double") / col("ng"))), 9)
            .cast("decimal(18,9)").as("bterm"))
          .agg(count(lit(1)).as("n_nations"),
            sum(col("bterm")).cast("double").as("t_between"))
        val lnsum = base
          .select(round(log(col("x").cast("double")), 9)
            .cast("decimal(18,9)").as("lnx"))
          .agg(sum(col("lnx")).cast("double").as("slnx"))
        tTotal.crossJoin(broadcast(between))
          .crossJoin(broadcast(lnsum)).crossJoin(broadcast(tot))
          .select(col("n").as("n_customers"), col("n_nations"),
            round(col("t_total"), 6).as("theil_total"),
            round(col("t_between"), 6).as("theil_between"),
            round(col("t_total") - col("t_between"), 6)
              .as("theil_within"),
            round(col("t_between") / col("t_total"), 6)
              .as("between_share"),
            round(lit(1.0) - exp(col("slnx") / col("n")) /
              (col("sx").cast("double") / col("n")), 6).as("atkinson_1"))
          .orderBy("n_customers")
      },
      Some("""WITH cust AS (SELECT o.o_custkey, c.c_nationkey AS nation,
             |        SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |          AS x
             |      FROM orders o JOIN customer c
             |        ON o.o_custkey = c.c_custkey
             |      GROUP BY 1, 2 HAVING
             |        SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) > 0),
             |tot AS (SELECT COUNT(*) AS n, SUM(x) AS sx FROM cust),
             |tt AS (SELECT CAST(SUM(CAST(round(
             |        (CAST(x AS DOUBLE) / tot.sx) *
             |        ln(CAST(x AS DOUBLE) * tot.n / tot.sx), 9)
             |        AS DECIMAL(18,9))) AS DOUBLE) AS t_total
             |      FROM cust CROSS JOIN tot),
             |grp AS (SELECT nation, COUNT(*) AS ng, SUM(x) AS sxg,
             |        MAX(tot.n) AS n, MAX(tot.sx) AS sx
             |      FROM cust CROSS JOIN tot GROUP BY 1),
             |btw AS (SELECT COUNT(*) AS n_nations,
             |        CAST(SUM(CAST(round(
             |          (CAST(sxg AS DOUBLE) / sx) *
             |          ln((CAST(sxg AS DOUBLE) / sx) *
             |            (CAST(n AS DOUBLE) / ng)), 9)
             |          AS DECIMAL(18,9))) AS DOUBLE) AS t_between
             |      FROM grp),
             |ls AS (SELECT CAST(SUM(CAST(round(ln(CAST(x AS DOUBLE)), 9)
             |        AS DECIMAL(18,9))) AS DOUBLE) AS slnx FROM cust)
             |SELECT CAST(tot.n AS BIGINT) AS n_customers,
             |  CAST(btw.n_nations AS BIGINT) AS n_nations,
             |  round(tt.t_total, 6) AS theil_total,
             |  round(btw.t_between, 6) AS theil_between,
             |  round(tt.t_total - btw.t_between, 6) AS theil_within,
             |  round(btw.t_between / tt.t_total, 6) AS between_share,
             |  round(1.0 - exp(ls.slnx / tot.n) /
             |    (CAST(tot.sx AS DOUBLE) / tot.n), 6) AS atkinson_1
             |FROM tt CROSS JOIN btw CROSS JOIN ls CROSS JOIN tot
             |ORDER BY n_customers""".stripMargin)),

    // Competing-risks cumulative incidence (Aalen & Johansen, Scand. J.
    // Stat. 1978; Kalbfleisch & Prentice ch. 8): per user, time from
    // first event to the FIRST of {error, purchase} — two risks that
    // COMPETE, where the x124 per-cause Kaplan-Meier is the textbook
    // mistake (censoring error times by purchases treats purchases as
    // non-informative and overstates both curves; 1−KM_error + 1−KM_buy
    // can exceed 1). CIF_k(t) = Σ_{t'≤t} S(t'−)·d_k(t')/n(t') with the
    // ALL-CAUSE survival S — estimated here via exp(Σ ln((n−d)/n))
    // (rounded-9 ln terms into DECIMAL window sums, the x307 additive
    // device — no recursion), so both CIFs and their sum ≤ 1 replay
    // bit-identically. Date ties between the two causes resolve to
    // 'error' (documented). Subjects collapse to the |distinct t| grid
    // first; everything serial runs on that bounded table.
    QuerySpec(
      "x331_cumulative_incidence",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        val gmax = ev.agg(max(to_date(col("ts"))).as("gmax"))
        val span = ev.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("f"),
            min(when(col("event_type") === "error", to_date(col("ts"))))
              .as("e"),
            min(when(col("event_type") === "purchase",
              to_date(col("ts")))).as("p"))
        val dur = span.crossJoin(broadcast(gmax))
          .withColumn("m", expr(
            """CASE WHEN e IS NULL THEN p WHEN p IS NULL THEN e
              |WHEN e <= p THEN e ELSE p END""".stripMargin))
          .select(
            when(col("m").isNotNull, datediff(col("m"), col("f")))
              .otherwise(datediff(col("gmax"), col("f")))
              .cast("long").as("t"),
            when(col("m").isNotNull && col("e").isNotNull &&
              (col("p").isNull || col("e") <= col("p")), 1L)
              .otherwise(0L).as("de"),
            when(col("m").isNotNull && (col("e").isNull ||
              (col("p").isNotNull && col("p") < col("e"))), 1L)
              .otherwise(0L).as("dp"))
        val agg = dur.groupBy("t")
          .agg(sum(col("de")).as("d_err"), sum(col("dp")).as("d_pur"),
            sum(lit(1L) - col("de") - col("dp")).as("c"))
        val tot = dur.agg(count(lit(1)).as("n"))
        val wPrior = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
        val wCum = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
        agg.crossJoin(broadcast(tot))
          .withColumn("n_at_risk",
            col("n") - coalesce(sum(col("d_err") + col("d_pur") +
              col("c")).over(wPrior), lit(0L)))
          .withColumn("lnterm",
            when(col("n_at_risk") - col("d_err") - col("d_pur") > 0,
              round(log((col("n_at_risk") - col("d_err") - col("d_pur"))
                .cast("double") / col("n_at_risk")), 9))
              .otherwise(lit(0.0)).cast("decimal(18,9)"))
          .withColumn("s_prev",
            round(exp(coalesce(sum(col("lnterm")).over(wPrior),
              lit(0).cast("decimal(18,9)")).cast("double")), 6))
          .withColumn("ie", round(col("s_prev") *
            col("d_err").cast("double") / col("n_at_risk"), 9)
            .cast("decimal(18,9)"))
          .withColumn("ip", round(col("s_prev") *
            col("d_pur").cast("double") / col("n_at_risk"), 9)
            .cast("decimal(18,9)"))
          .select(col("t"), col("n_at_risk"),
            col("d_err").as("d_error"), col("d_pur").as("d_purchase"),
            round(sum(col("ie")).over(wCum).cast("double"), 6)
              .as("cif_error"),
            round(sum(col("ip")).over(wCum).cast("double"), 6)
              .as("cif_purchase"))
          .orderBy("t")
      },
      Some("""WITH g AS (SELECT MAX(CAST(ts AS DATE)) AS gmax
             |      FROM events),
             |span AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             |        MIN(CASE WHEN event_type = 'error'
             |          THEN CAST(ts AS DATE) END) AS e,
             |        MIN(CASE WHEN event_type = 'purchase'
             |          THEN CAST(ts AS DATE) END) AS p
             |      FROM events GROUP BY 1),
             |dur AS (SELECT
             |        CAST(CASE WHEN m IS NOT NULL
             |          THEN datediff('day', f, m)
             |          ELSE datediff('day', f, g.gmax) END AS BIGINT)
             |          AS t,
             |        CASE WHEN m IS NOT NULL AND e IS NOT NULL AND
             |          (p IS NULL OR e <= p) THEN 1 ELSE 0 END AS de,
             |        CASE WHEN m IS NOT NULL AND (e IS NULL OR
             |          (p IS NOT NULL AND p < e)) THEN 1 ELSE 0 END AS dp
             |      FROM (SELECT *, CASE WHEN e IS NULL THEN p
             |          WHEN p IS NULL THEN e
             |          WHEN e <= p THEN e ELSE p END AS m
             |        FROM span) CROSS JOIN g),
             |agg AS (SELECT t, SUM(de) AS d_err, SUM(dp) AS d_pur,
             |        SUM(1 - de - dp) AS c
             |      FROM dur GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n FROM dur),
             |r AS (SELECT t, d_err, d_pur,
             |        tot.n - COALESCE(SUM(d_err + d_pur + c) OVER (
             |          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
             |          1 PRECEDING), 0) AS n_at_risk
             |      FROM agg CROSS JOIN tot),
             |lt AS (SELECT t, d_err, d_pur, n_at_risk,
             |        CAST(CASE WHEN n_at_risk - d_err - d_pur > 0
             |          THEN round(ln(CAST(n_at_risk - d_err - d_pur
             |            AS DOUBLE) / n_at_risk), 9)
             |          ELSE 0.0 END AS DECIMAL(18,9)) AS lnterm
             |      FROM r),
             |sp AS (SELECT t, d_err, d_pur, n_at_risk,
             |        round(exp(CAST(COALESCE(SUM(lnterm) OVER (
             |          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
             |          1 PRECEDING), CAST(0 AS DECIMAL(18,9)))
             |          AS DOUBLE)), 6) AS s_prev
             |      FROM lt),
             |inc AS (SELECT t, n_at_risk, d_err, d_pur,
             |        CAST(round(s_prev * CAST(d_err AS DOUBLE) /
             |          n_at_risk, 9) AS DECIMAL(18,9)) AS ie,
             |        CAST(round(s_prev * CAST(d_pur AS DOUBLE) /
             |          n_at_risk, 9) AS DECIMAL(18,9)) AS ip
             |      FROM sp)
             |SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
             |  CAST(d_err AS BIGINT) AS d_error,
             |  CAST(d_pur AS BIGINT) AS d_purchase,
             |  round(CAST(SUM(ie) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS DOUBLE), 6) AS cif_error,
             |  round(CAST(SUM(ip) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS DOUBLE), 6) AS cif_purchase
             |FROM inc ORDER BY t""".stripMargin)),

    // Median (LAD) regression of per-user spend on activity via THREE
    // fixed IRLS steps (Schlossmacher, JASA 1973 — IRLS with weights
    // 1/max(|e|, δ) converges to the L1 line; the fixed step count +
    // rounded weights make the whole trajectory deterministic, the
    // x121 fixed-iteration discipline): the robust companion to x322's
    // OLS-based screens — LAD slope ignores the heavy spender tail that
    // drags the OLS line (both slopes report, plus mean |residual| for
    // each, so the robustness gain is measured, not asserted). Each
    // step is one weighted-moment aggregate over the |users| frame with
    // the coefficient pair broadcast back — 3 bounded passes, no
    // windows, no joins wider than a 1-row broadcast.
    QuerySpec(
      "x332_lad_regression",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("x"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("yc"))
          .select(col("x"), (col("yc").cast("double") / 100.0).as("y"))
          .localCheckpoint() // 3 IRLS passes + 2 residual reads
        // OLS start (step 0)
        val ols = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(round(col("y"), 6).cast("decimal(38,6)")).cast("double")
              .as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(round(col("x") * col("y"), 6).cast("decimal(38,6)"))
              .cast("double").as("sxy"))
          .select(
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double"), 9).as("b"),
            col("n"), col("sx"), col("sy"))
          .select(col("b"),
            round((col("sy") - col("b") * col("sx")) / col("n"), 9)
              .as("a"))
        var fit = ols.localCheckpoint()
        for (_ <- 1 to 3) {
          val wmom = u.crossJoin(broadcast(fit))
            .select(col("x"), col("y"),
              round(lit(1.0) / greatest(
                abs(col("y") - col("a") - col("b") * col("x")),
                lit(0.01)), 9).as("w"))
            .agg(
              sum(round(col("w"), 9).cast("decimal(38,9)"))
                .cast("double").as("sw"),
              sum(round(col("w") * col("x"), 9).cast("decimal(38,9)"))
                .cast("double").as("swx"),
              sum(round(col("w") * col("y"), 6).cast("decimal(38,6)"))
                .cast("double").as("swy"),
              sum(round(col("w") * col("x") * col("x"), 6)
                .cast("decimal(38,6)")).cast("double").as("swxx"),
              sum(round(col("w") * col("x") * col("y"), 6)
                .cast("decimal(38,6)")).cast("double").as("swxy"))
          fit = wmom.select(
              round((col("sw") * col("swxy") - col("swx") * col("swy")) /
                (col("sw") * col("swxx") - col("swx") * col("swx")), 9)
                .as("b"),
              col("sw"), col("swx"), col("swy"))
            .select(col("b"),
              round((col("swy") - col("b") * col("swx")) / col("sw"), 9)
                .as("a"))
            .localCheckpoint() // 1-row coefficient state per step
        }
        val olsN = ols.select(col("a").as("a0"), col("b").as("b0"))
        val resid = u.crossJoin(broadcast(fit)).crossJoin(broadcast(olsN))
          .agg(count(lit(1)).as("n_users"),
            sum(round(abs(col("y") - col("a") - col("b") * col("x")), 6)
              .cast("decimal(38,6)")).cast("double").as("sad_lad"),
            sum(round(abs(col("y") - col("a0") - col("b0") * col("x")), 6)
              .cast("decimal(38,6)")).cast("double").as("sad_ols"),
            max(col("a")).as("a"), max(col("b")).as("b"),
            max(col("a0")).as("a0"), max(col("b0")).as("b0"))
        resid.select(col("n_users"),
            round(col("b"), 6).as("lad_slope"),
            round(col("a"), 6).as("lad_intercept"),
            round(col("b0"), 6).as("ols_slope"),
            round(col("sad_lad") / col("n_users"), 4)
              .as("mean_abs_resid_lad"),
            round(col("sad_ols") / col("n_users"), 4)
              .as("mean_abs_resid_ols"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT COUNT(*) AS x,
             |        CAST(SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS DOUBLE) / 100.0 AS y
             |      FROM events GROUP BY user_id),
             |m0 AS (SELECT COUNT(*) AS n, SUM(x) AS sx,
             |        CAST(SUM(CAST(round(y, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sy,
             |        SUM(x * x) AS sxx,
             |        CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS sxy
             |      FROM u),
             |f0 AS (SELECT round((n * sxy - sx * sy) /
             |          CAST(n * sxx - sx * sx AS DOUBLE), 9) AS b,
             |        n, sx, sy FROM m0),
             |g0 AS (SELECT b, round((sy - b * sx) / n, 9) AS a FROM f0),
             |w1 AS (SELECT COUNT(*) AS cn,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g0.a - g0.b * x), 0.01), 9), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS sw,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g0.a - g0.b * x), 0.01), 9) * x, 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS swx,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g0.a - g0.b * x), 0.01), 9) * y, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swy,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g0.a - g0.b * x), 0.01), 9) * x * x, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swxx,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g0.a - g0.b * x), 0.01), 9) * x * y, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swxy
             |      FROM u CROSS JOIN g0),
             |g1 AS (SELECT b, round((swy - b * swx) / sw, 9) AS a FROM (
             |      SELECT round((sw * swxy - swx * swy) /
             |        (sw * swxx - swx * swx), 9) AS b, sw, swx, swy
             |      FROM w1)),
             |w2 AS (SELECT
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g1.a - g1.b * x), 0.01), 9), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS sw,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g1.a - g1.b * x), 0.01), 9) * x, 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS swx,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g1.a - g1.b * x), 0.01), 9) * y, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swy,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g1.a - g1.b * x), 0.01), 9) * x * x, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swxx,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g1.a - g1.b * x), 0.01), 9) * x * y, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swxy
             |      FROM u CROSS JOIN g1),
             |g2 AS (SELECT b, round((swy - b * swx) / sw, 9) AS a FROM (
             |      SELECT round((sw * swxy - swx * swy) /
             |        (sw * swxx - swx * swx), 9) AS b, sw, swx, swy
             |      FROM w2)),
             |w3 AS (SELECT
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g2.a - g2.b * x), 0.01), 9), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS sw,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g2.a - g2.b * x), 0.01), 9) * x, 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS swx,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g2.a - g2.b * x), 0.01), 9) * y, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swy,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g2.a - g2.b * x), 0.01), 9) * x * x, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swxx,
             |        CAST(SUM(CAST(round(round(1.0 / greatest(
             |          abs(y - g2.a - g2.b * x), 0.01), 9) * x * y, 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS swxy
             |      FROM u CROSS JOIN g2),
             |g3 AS (SELECT b, round((swy - b * swx) / sw, 9) AS a FROM (
             |      SELECT round((sw * swxy - swx * swy) /
             |        (sw * swxx - swx * swx), 9) AS b, sw, swx, swy
             |      FROM w3)),
             |res AS (SELECT COUNT(*) AS n_users,
             |        CAST(SUM(CAST(round(abs(y - g3.a - g3.b * x), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sad_lad,
             |        CAST(SUM(CAST(round(abs(y - g0.a - g0.b * x), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS sad_ols,
             |        MAX(g3.a) AS a, MAX(g3.b) AS b,
             |        MAX(g0.b) AS b0
             |      FROM u CROSS JOIN g3 CROSS JOIN g0)
             |SELECT CAST(n_users AS BIGINT) AS n_users,
             |  round(b, 6) AS lad_slope,
             |  round(a, 6) AS lad_intercept,
             |  round(b0, 6) AS ols_slope,
             |  round(sad_lad / n_users, 4) AS mean_abs_resid_lad,
             |  round(sad_ols / n_users, 4) AS mean_abs_resid_ols
             |FROM res ORDER BY n_users""".stripMargin)),

    // Poisson bootstrap (Chamandy, Muralidharan, Najmi & Naidu, Google
    // tech report 2012; Kleiner et al's BLB is the academic sibling) of
    // the mean per-user spend: THE bootstrap that works at 100 TB —
    // independent Poisson(1) replicate weights per (row, replicate) need
    // no global resample index, so B replicate means are B weighted
    // map-side sums over ONE scan. Weights are deterministic: one md5
    // per (user, digest-half) BEFORE the lane fan-out (the x216 8-lane
    // discipline — PlansSpec rule 4 bans the per-replicate-digest
    // shape), 16-bit lanes inverse-CDF'd through the literal Poisson(1)
    // breakpoint ladder (e⁻¹-derived constants, 5-capped). Output: the
    // point mean, the bootstrap SE, and the percentile CI over B=32
    // replicate means — all SQL-replayable.
    QuerySpec(
      "x333_poisson_bootstrap",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
            .as("yc"))
          .select(col("user_id"),
            (col("yc").cast("double") / 100.0).as("y"))
        // four digests per user (one per 8-lane group: 32 hex chars = 8
        // independent 16-bit lanes each), fan-out 8 per digest — the
        // x216 lane discipline, under PlansSpec rule 4's threshold
        val lanes = u.select(col("user_id"), col("y"),
            explode(array(lit(0), lit(1), lit(2), lit(3))).as("half"))
          .withColumn("dg", md5(concat(lit("pboot:"), col("user_id"),
            lit(":"), col("half"))))
          .select(col("user_id"), col("y"), col("half"), col("dg"),
            explode(expr("sequence(0, 7)")).as("lane"))
          .select(col("y"), (col("half") * 8 + col("lane")).as("b"),
            conv(expr("substring(dg, lane * 4 + 1, 4)"), 16, 10)
              .cast("long").as("u16"))
          .select(col("y"), col("b"),
            (col("u16").cast("double") / 65536.0).as("uu"))
          .select(col("y"), col("b"),
            when(col("uu") < 0.367879441, 0L)
              .when(col("uu") < 0.735758882, 1L)
              .when(col("uu") < 0.919698603, 2L)
              .when(col("uu") < 0.981011843, 3L)
              .when(col("uu") < 0.996340153, 4L)
              .otherwise(5L).as("w"))
        val reps = lanes.groupBy("b")
          .agg(sum(col("w")).as("nw"),
            sum(round(col("w") * col("y"), 6).cast("decimal(38,6)"))
              .cast("double").as("swy"))
          .select(col("b"), round(col("swy") / col("nw"), 6).as("rm"))
        val base = u.agg(count(lit(1)).as("n"),
          round(sum(round(col("y"), 6).cast("decimal(38,6)"))
            .cast("double") / count(lit(1)), 6).as("mean"))
        val boot = reps.agg(count(lit(1)).as("nb"),
          sum(col("rm").cast("decimal(18,6)")).cast("double").as("srm"),
          sum(round(col("rm") * col("rm"), 6).cast("decimal(38,6)"))
            .cast("double").as("srm2"),
          round(expr("percentile(rm, 0.025)"), 6).as("lo"),
          round(expr("percentile(rm, 0.975)"), 6).as("hi"))
        base.crossJoin(broadcast(boot))
          .select(col("n").as("n_users"), col("mean").as("mean_spend"),
            col("nb").as("n_replicates"),
            round(sqrt((col("srm2") - col("srm") * col("srm") /
              col("nb")) / (col("nb") - 1)), 6).as("bootstrap_se"),
            col("lo").as("ci_lo_pct"), col("hi").as("ci_hi_pct"))
          .orderBy("n_users")
      },
      Some("""WITH u AS (SELECT user_id,
             |        CAST(SUM(CASE WHEN event_type = 'purchase'
             |          THEN CAST(round(value * 100) AS BIGINT)
             |          ELSE 0 END) AS DOUBLE) / 100.0 AS y
             |      FROM events GROUP BY 1),
             |hl AS (SELECT user_id, y, h.half,
             |        md5('pboot:' || CAST(user_id AS VARCHAR) || ':' ||
             |          CAST(h.half AS VARCHAR)) AS dg
             |      FROM u CROSS JOIN (SELECT unnest([0, 1, 2, 3])
             |        AS half) h),
             |ln AS (SELECT y, half * 8 + l.lane AS b,
             |        CAST(('0x' || substr(dg, l.lane * 4 + 1, 4))
             |          AS BIGINT) AS u16
             |      FROM hl CROSS JOIN (SELECT unnest(range(8)) AS lane)
             |        l),
             |w AS (SELECT y, b,
             |        CASE WHEN CAST(u16 AS DOUBLE) / 65536.0
             |            < 0.367879441 THEN 0
             |          WHEN CAST(u16 AS DOUBLE) / 65536.0
             |            < 0.735758882 THEN 1
             |          WHEN CAST(u16 AS DOUBLE) / 65536.0
             |            < 0.919698603 THEN 2
             |          WHEN CAST(u16 AS DOUBLE) / 65536.0
             |            < 0.981011843 THEN 3
             |          WHEN CAST(u16 AS DOUBLE) / 65536.0
             |            < 0.996340153 THEN 4
             |          ELSE 5 END AS w
             |      FROM ln),
             |reps AS (SELECT b, round(
             |        CAST(SUM(CAST(round(w * y, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) / SUM(w), 6) AS rm
             |      FROM w GROUP BY 1),
             |base AS (SELECT COUNT(*) AS n,
             |        round(CAST(SUM(CAST(round(y, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) / COUNT(*), 6) AS mean FROM u),
             |boot AS (SELECT COUNT(*) AS nb,
             |        CAST(SUM(CAST(rm AS DECIMAL(18,6))) AS DOUBLE)
             |          AS srm,
             |        CAST(SUM(CAST(round(rm * rm, 6) AS DECIMAL(38,6)))
             |          AS DOUBLE) AS srm2,
             |        round(quantile_cont(rm, 0.025), 6) AS lo,
             |        round(quantile_cont(rm, 0.975), 6) AS hi
             |      FROM reps)
             |SELECT CAST(base.n AS BIGINT) AS n_users,
             |  base.mean AS mean_spend,
             |  CAST(boot.nb AS BIGINT) AS n_replicates,
             |  round(sqrt((boot.srm2 - boot.srm * boot.srm / boot.nb) /
             |    (boot.nb - 1)), 6) AS bootstrap_se,
             |  boot.lo AS ci_lo_pct, boot.hi AS ci_hi_pct
             |FROM base CROSS JOIN boot ORDER BY n_users""".stripMargin)),

    // Chatterjee's xi rank correlation (Chatterjee, JASA 2021 — "A new
    // coefficient of correlation"): ξ(X→Y) = 1 − 3Σ|r_{i+1} − r_i| /
    // (n² − 1) over Y-ranks taken in X-sorted order — 0 iff independent,
    // 1 iff Y is a measurable FUNCTION of X, and deliberately ASYMMETRIC
    // (ξ(view→purchase) ≠ ξ(purchase→view)) — it detects nonmonotone
    // dependence that Pearson/Spearman/Kendall (all ≈ for monotone) are
    // blind to. Over the calendar-bounded daily (view, purchase) series,
    // both directions; Y-ranks are max-ranks (right-continuous CDF, the
    // paper's definition), ties in the X order break by day (documented
    // deterministic stand-in for the paper's random tie-break). Because
    // daily counts DO tie, the denominator is the paper's tie-robust form
    // 2·Σ lᵢ(n−lᵢ) (lᵢ = #{j: Yⱼ ≥ Yᵢ}) rather than the no-ties constant
    // n(n²−1)/3 — with ties the latter biases ξ low and caps it below 1
    // for exact functional dependence (round-11 advice). Σ lᵢ(n−lᵢ) is
    // computed as n·Σl − Σl², all exact integers until the single final
    // division. Lag windows over the day grid only.
    QuerySpec(
      "x334_chatterjee_xi",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // NOT checkpointed: the global rank/lead windows are Rule-1-legal
        // only because the bounding day-grid aggregate sits visibly below
        // them (a checkpoint would truncate that evidence; the grid is
        // cheap enough to recompute per direction)
        // ts IS NOT NULL: the day grid's X-order tie-break is BY DAY, and
        // a null day would take a different position per engine (round-12)
        val d = Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            // when/otherwise, not boolean-cast: a day whose every event
            // has a NULL type must count 0 like the oracle's CASE…ELSE 0 —
            // the cast form yields NULL, which then rides the engines'
            // opposite null placement through the rank windows (round-12;
            // the x319 asymmetry, resurfacing one level up)
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("v"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("p"))
        def xi(xN: String, yN: String, label: String) = {
          val ranked = d
            .withColumn("r", count(lit(1)).over(
              W.orderBy(col(yN)).rangeBetween(W.unboundedPreceding, 0)))
            .withColumn("l", count(lit(1)).over(
              W.orderBy(col(yN).desc).rangeBetween(W.unboundedPreceding, 0)))
            .withColumn("rn", lead(col("r"), 1).over(
              W.orderBy(col(xN), col("day"))))
          ranked.agg(count(lit(1)).as("n"),
              sum(when(col("rn").isNotNull,
                abs(col("rn") - col("r"))).otherwise(lit(0L))).as("sd"),
              sum(col("l")).as("sl"),
              sum(col("l") * col("l")).as("sl2"))
            .select(lit(label).as("direction"), col("n").as("n_days"),
              round(lit(1.0) -
                col("n").cast("double") * col("sd").cast("double") /
                (lit(2.0) * (col("n").cast("double") *
                  col("sl").cast("double") -
                  col("sl2").cast("double"))), 6).as("xi"))
        }
        xi("v", "p", "view_to_purchase")
          .unionByName(xi("p", "v", "purchase_to_view"))
          .orderBy("direction")
      },
      Some {
        def dirSql(x: String, y: String, label: String) =
          s"""SELECT '$label' AS direction, COUNT(*) AS n_days,
             |  round(1.0 -
             |    CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CASE WHEN rn IS
             |      NOT NULL THEN abs(rn - r) ELSE 0 END) AS DOUBLE) /
             |    (2.0 * (CAST(COUNT(*) AS DOUBLE) *
             |      CAST(SUM(l) AS DOUBLE) -
             |      CAST(SUM(l * l) AS DOUBLE))), 6) AS xi
             |FROM (SELECT r, l, lead(r) OVER (ORDER BY $x, day) AS rn
             |  FROM (SELECT day, $x,
             |    COUNT(*) OVER (ORDER BY $y
             |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS r,
             |    COUNT(*) OVER (ORDER BY $y DESC
             |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS l
             |    FROM d))""".stripMargin
        s"""WITH d AS (SELECT CAST(ts AS DATE) AS day,
           |      SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           |        AS v,
           |      SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           |        END) AS p
           |    FROM events WHERE ts IS NOT NULL GROUP BY 1)
           |SELECT CAST(n_days AS BIGINT) AS n_days, direction, xi
           |FROM (${dirSql("v", "p", "view_to_purchase")}
           |UNION ALL
           |${dirSql("p", "v", "purchase_to_view")})
           |ORDER BY direction""".stripMargin
      }),

    // Anytime-valid confidence sequence for the running conversion rate
    // (Hoeffding 1963 bound, stitched across looks by the union-bound
    // α_t = α/(t(t+1)) device — Σ α_t = α, so coverage holds at EVERY
    // day simultaneously; Howard-Ramdas-McAuliffe-Sekhon 2021 is the
    // modern treatment this approximates from first principles): the
    // "peeking-proof" monitor the fixed-n z-interval gets wrong — a team
    // that checks the rate daily and stops on significance inflates its
    // error unless the band is valid at all times. Per day: cumulative
    // purchases/events, the running rate, and the sequence bound
    // ε_t = √(ln(2t(t+1)/α)/(2nₜ)); the `excluded_half` flag records
    // whether 0.5 has ever been outside the band (a decision that, with
    // this band, is safe to act on at first crossing). Cumulative sums
    // over the calendar day grid; ln rounds at 9, output at 6. The math
    // lives in the shared ConfSeq core — ConfSeqStream (the monitor is
    // inherently a streaming object) reports through the same code, and
    // ConfSeqStreamSpec proves stream == batch == this registry entry.
    QuerySpec(
      "x335_confidence_sequence",
      (s, dir) => ConfSeq.fromCounts(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull) // null ts has no day (round-12)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum((col("event_type") === "purchase").cast("long"))
              .as("k"))),
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             |        SUM(CASE WHEN event_type = 'purchase' THEN 1
             |          ELSE 0 END) AS k
             |      FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |c AS (SELECT day,
             |        CAST(row_number() OVER (ORDER BY day) AS BIGINT)
             |          AS t,
             |        SUM(n) OVER w AS cn, SUM(k) OVER w AS ck
             |      FROM d WINDOW w AS (ORDER BY day
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |b AS (SELECT day, t, CAST(cn AS BIGINT) AS n_events,
             |        round(CAST(ck AS DOUBLE) / cn, 6) AS rate,
             |        round(sqrt(round(ln(2.0 *
             |          CAST(t * (t + 1) AS DOUBLE) / 0.05), 9) /
             |          (2.0 * cn)), 6) AS eps
             |      FROM c)
             |SELECT day, t, n_events, rate,
             |  round(greatest(rate - eps, 0.0), 6) AS cs_lo,
             |  round(least(rate + eps, 1.0), 6) AS cs_hi,
             |  CAST(rate + eps < 0.5 OR rate - eps > 0.5 AS BIGINT)
             |    AS excludes_half,
             |  MAX(CAST(rate + eps < 0.5 OR rate - eps > 0.5 AS BIGINT))
             |    OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS excluded_half_ever
             |FROM b ORDER BY day""".stripMargin)),

    // Depth-2 binary segmentation (Scott & Knott 1974; Vostrikova 1981
    // proved consistency) over daily volume — the MULTIPLE-changepoint
    // read x143's single-split CUSUM can't give: find the best split of
    // the whole series, then the best split WITHIN each side, ranking
    // all three by their between-segment SSE gain
    // n_l·n_r/(n_l+n_r)·(mean_l − mean_r)² (the classical decomposition;
    // at fixed depth this is binseg exactly, and the greedy recursion is
    // the standard scalable alternative to O(n²) PELT-style DP). Every
    // candidate's gain comes from prefix sums over the calendar-bounded
    // day grid (windows over an aggregate, Rule-1-safe); winners are
    // 1-row TakeOrdered broadcasts; integers exact, gains rounded 6 with
    // day tie-breaks so both engines pick identical splits.
    QuerySpec(
      "x336_binseg_changepoints",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val d = Tables.events(s, dir)
          .filter(col("ts").isNotNull) // null ts has no day (round-12)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
        val tot = d.agg(count(lit(1)).as("nd"), sum(col("n")).as("st"))
        val base = d
          .withColumn("cnt", row_number().over(W.orderBy("day"))
            .cast("long"))
          .withColumn("cum", sum(col("n")).over(wc))
          .crossJoin(broadcast(tot))
          .localCheckpoint() // day grid + prefix sums, feeds both stages
        def gain(cntC: org.apache.spark.sql.Column,
            cumC: org.apache.spark.sql.Column,
            ndC: org.apache.spark.sql.Column,
            stC: org.apache.spark.sql.Column) = {
          val ml = cumC.cast("double") / cntC
          val mr = (stC - cumC).cast("double") / (ndC - cntC)
          round((ml - mr) * (ml - mr) *
            (cntC * (ndC - cntC)).cast("double") / ndC, 6)
        }
        val s1 = base.filter(col("cnt") < col("nd"))
          .select(col("day"), col("cnt"), col("cum"), col("nd"),
            col("st"),
            gain(col("cnt"), col("cum"), col("nd"), col("st")).as("g"),
            round(col("cum").cast("double") / col("cnt"), 6).as("ml"),
            round((col("st") - col("cum")).cast("double") /
              (col("nd") - col("cnt")), 6).as("mr"))
          .orderBy(col("g").desc, col("day")).limit(1)
          .localCheckpoint() // stage-1 winner, 1 row
        val seg = base.crossJoin(broadcast(
            s1.select(col("day").as("cp1"))))
          .withColumn("seg", (col("day") > col("cp1")).cast("int"))
        val segTot = seg.groupBy("seg")
          .agg(count(lit(1)).as("snd"), sum(col("n")).as("sst"))
        val ws = W.partitionBy("seg").orderBy("day")
          .rowsBetween(W.unboundedPreceding, 0)
        val s2 = seg
          .withColumn("scnt", row_number().over(
            W.partitionBy("seg").orderBy("day")).cast("long"))
          .withColumn("scum", sum(col("n")).over(ws))
          .join(segTot, "seg")
          .filter(col("scnt") < col("snd"))
          .select(col("seg"), col("day"),
            gain(col("scnt"), col("scum"), col("snd"), col("sst"))
              .as("g"),
            round(col("scum").cast("double") / col("scnt"), 6).as("ml"),
            round((col("sst") - col("scum")).cast("double") /
              (col("snd") - col("scnt")), 6).as("mr"))
          .withColumn("rn", row_number().over(
            W.partitionBy("seg").orderBy(col("g").desc, col("day"))))
          .filter(col("rn") === 1)
        s1.select(lit("all").as("segment"), col("day").as("split_day"),
            col("g").as("gain"), col("ml").as("mean_left"),
            col("mr").as("mean_right"))
          .unionByName(s2.select(
            when(col("seg") === 0, "left").otherwise("right")
              .as("segment"),
            col("day").as("split_day"), col("g").as("gain"),
            col("ml").as("mean_left"), col("mr").as("mean_right")))
          .orderBy(col("gain").desc, col("split_day"))
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS nd, SUM(n) AS st FROM d),
             |base AS (SELECT day, n,
             |        CAST(row_number() OVER (ORDER BY day) AS BIGINT)
             |          AS cnt,
             |        SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) AS cum,
             |        tot.nd, tot.st
             |      FROM d CROSS JOIN tot),
             |s1 AS (SELECT day, g, ml, mr FROM (
             |      SELECT day,
             |        round((CAST(cum AS DOUBLE) / cnt -
             |          CAST(st - cum AS DOUBLE) / (nd - cnt)) *
             |          (CAST(cum AS DOUBLE) / cnt -
             |          CAST(st - cum AS DOUBLE) / (nd - cnt)) *
             |          CAST(cnt * (nd - cnt) AS DOUBLE) / nd, 6) AS g,
             |        round(CAST(cum AS DOUBLE) / cnt, 6) AS ml,
             |        round(CAST(st - cum AS DOUBLE) / (nd - cnt), 6)
             |          AS mr
             |      FROM base WHERE cnt < nd)
             |      ORDER BY g DESC, day LIMIT 1),
             |seg AS (SELECT base.day, base.n,
             |        CAST(base.day > s1.day AS INT) AS seg
             |      FROM base CROSS JOIN s1),
             |st2 AS (SELECT seg, COUNT(*) AS snd, SUM(n) AS sst
             |      FROM seg GROUP BY 1),
             |sb AS (SELECT seg.seg, seg.day,
             |        CAST(row_number() OVER (PARTITION BY seg.seg
             |          ORDER BY seg.day) AS BIGINT) AS scnt,
             |        SUM(seg.n) OVER (PARTITION BY seg.seg
             |          ORDER BY seg.day ROWS BETWEEN UNBOUNDED PRECEDING
             |          AND CURRENT ROW) AS scum,
             |        st2.snd, st2.sst
             |      FROM seg JOIN st2 ON st2.seg = seg.seg),
             |s2 AS (SELECT seg, day, g, ml, mr FROM (
             |      SELECT seg, day,
             |        round((CAST(scum AS DOUBLE) / scnt -
             |          CAST(sst - scum AS DOUBLE) / (snd - scnt)) *
             |          (CAST(scum AS DOUBLE) / scnt -
             |          CAST(sst - scum AS DOUBLE) / (snd - scnt)) *
             |          CAST(scnt * (snd - scnt) AS DOUBLE) / snd, 6)
             |          AS g,
             |        round(CAST(scum AS DOUBLE) / scnt, 6) AS ml,
             |        round(CAST(sst - scum AS DOUBLE) / (snd - scnt), 6)
             |          AS mr,
             |        row_number() OVER (PARTITION BY seg
             |          ORDER BY round((CAST(scum AS DOUBLE) / scnt -
             |            CAST(sst - scum AS DOUBLE) / (snd - scnt)) *
             |            (CAST(scum AS DOUBLE) / scnt -
             |            CAST(sst - scum AS DOUBLE) / (snd - scnt)) *
             |            CAST(scnt * (snd - scnt) AS DOUBLE) / snd, 6)
             |            DESC, day) AS rn
             |      FROM sb WHERE scnt < snd) WHERE rn = 1)
             |SELECT segment, split_day, gain, mean_left, mean_right
             |FROM (
             |  SELECT 'all' AS segment, day AS split_day, g AS gain,
             |    ml AS mean_left, mr AS mean_right FROM s1
             |  UNION ALL
             |  SELECT CASE WHEN seg = 0 THEN 'left' ELSE 'right' END,
             |    day, g, ml, mr FROM s2)
             |ORDER BY gain DESC, split_day""".stripMargin)),
  )
}
