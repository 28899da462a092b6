package graft.fuzz

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output column descriptor for generated plans:
  * l=int/long, d=double, s=string, t=timestamp. */
case class FCol(name: String, t: Char)

/** Seeded random relational-plan generator over the TPC-H tables, shared by
  * DifferentialFuzzSpec (stock sf0.001 parquet) and AdversarialDataSpec
  * (degenerate/hostile tables with the same schemas). Each seed yields a
  * plan rendered BOTH as DataFrame operations (bound to `dir`'s parquet)
  * and as ANSI SQL for DuckDB, plus the output schema and a feature-tag set
  * for coverage accounting. See DifferentialFuzzSpec's header for the
  * determinism constraints every generated plan obeys.
  */
class FuzzPlanGen(spark: SparkSession, dir: String) {

  private val tableCols: Map[String, Seq[FCol]] = Map(
    "nation" -> Seq(FCol("n_nationkey", 'l'), FCol("n_name", 's'),
      FCol("n_regionkey", 'l')),
    "customer" -> Seq(FCol("c_custkey", 'l'), FCol("c_name", 's'),
      FCol("c_nationkey", 'l'), FCol("c_acctbal", 'd'),
      FCol("c_mktsegment", 's')),
    "orders" -> Seq(FCol("o_orderkey", 'l'), FCol("o_custkey", 'l'),
      FCol("o_orderstatus", 's'), FCol("o_totalprice", 'd'),
      FCol("o_orderdate", 't'), FCol("o_orderpriority", 's')),
    "lineitem" -> Seq(FCol("l_orderkey", 'l'), FCol("l_partkey", 'l'),
      FCol("l_suppkey", 'l'), FCol("l_linenumber", 'l'),
      FCol("l_quantity", 'd'), FCol("l_extendedprice", 'd'),
      FCol("l_discount", 'd'), FCol("l_tax", 'd'),
      FCol("l_returnflag", 's'), FCol("l_linestatus", 's'),
      FCol("l_shipdate", 't')))

  private val stringPools: Map[String, Seq[String]] = Map(
    "o_orderstatus" -> Seq("O", "F", "P"),
    "l_returnflag" -> Seq("A", "N", "R"),
    "l_linestatus" -> Seq("O", "F"),
    "c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY"),
    "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW"))

  private val longHi: Map[String, Long] = Map(
    "n_nationkey" -> 25, "n_regionkey" -> 5, "c_custkey" -> 1500,
    "c_nationkey" -> 25, "o_orderkey" -> 60000, "o_custkey" -> 1500,
    "l_orderkey" -> 60000, "l_partkey" -> 2000, "l_suppkey" -> 100,
    "l_linenumber" -> 7)

  private val doubleRange: Map[String, (Double, Double)] = Map(
    "c_acctbal" -> (-1000.0, 10000.0), "o_totalprice" -> (1000.0, 300000.0),
    "l_quantity" -> (1.0, 50.0), "l_extendedprice" -> (900.0, 105000.0),
    "l_discount" -> (0.0, 0.11), "l_tax" -> (0.0, 0.09))

  private val joinTrees: Seq[Seq[String]] = Seq(
    Seq("nation"), Seq("customer"), Seq("orders"), Seq("lineitem"),
    Seq("nation", "customer"), Seq("customer", "orders"),
    Seq("orders", "lineitem"), Seq("customer", "orders", "lineitem"))

  private val fk: Map[(String, String), (String, String)] = Map(
    ("nation", "customer") -> (("n_nationkey", "c_nationkey")),
    ("customer", "orders") -> (("c_custkey", "o_custkey")),
    ("orders", "lineitem") -> (("o_orderkey", "l_orderkey")))

  /** One random plan: (DataFrame, equivalent DuckDB SQL, output columns,
    * plan-feature tags for the coverage line). */
  def gen(seed: Int): (DataFrame, String, Seq[FCol], Set[String]) = {
    val rng = new scala.util.Random(seed)
    val feats = scala.collection.mutable.Set.empty[String]

    // ---- one random predicate over a given column set ----
    def predFor(pcols: Seq[FCol]): Option[(Column, String)] = {
      val c = pcols(rng.nextInt(pcols.length))
      c.t match {
        case 'l' =>
          if (rng.nextBoolean()) {
            val k = 1 + rng.nextLong(longHi.getOrElse(c.name, 100L))
            Some((col(c.name) < k, s"${c.name} < $k"))
          } else {
            val m = 2 + rng.nextInt(6); val r = rng.nextInt(m)
            Some((col(c.name) % m === r, s"${c.name} % $m = $r"))
          }
        case 's' =>
          stringPools.get(c.name) match {
            case Some(pool) =>
              if (rng.nextBoolean() || pool.size < 3) {
                val v = pool(rng.nextInt(pool.size))
                Some((col(c.name) === v, s"${c.name} = '$v'"))
              } else {
                val vs = rng.shuffle(pool).take(2 + rng.nextInt(pool.size - 1))
                Some((col(c.name).isin(vs: _*),
                  s"${c.name} IN (${vs.map(v => s"'$v'").mkString(", ")})"))
              }
            case None =>
              val ch = ('A' + rng.nextInt(26)).toChar
              Some((col(c.name) >= ch.toString, s"${c.name} >= '$ch'"))
          }
        case 'd' =>
          val (lo, hi) = doubleRange(c.name)
          val k = math.rint((lo + rng.nextDouble() * (hi - lo)) * 100) / 100
          val litS = java.lang.String.format(java.util.Locale.ROOT, "%.2f",
            Double.box(k))
          if (rng.nextBoolean()) Some((col(c.name) < k, s"${c.name} < $litS"))
          else Some((col(c.name) >= k, s"${c.name} >= $litS"))
        case 't' =>
          val d = f"${1992 + rng.nextInt(7)}%d-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d"
          Some((to_date(col(c.name)) < lit(d),
            s"CAST(${c.name} AS DATE) < DATE '$d'"))
        case _ => None
      }
    }

    // ---- join tree ----
    val tree = joinTrees(rng.nextInt(joinTrees.length))
    var df: DataFrame = spark.read.parquet(s"$dir/${tree.head}.parquet")
    var cols: Seq[FCol] = tableCols(tree.head)
    var from = tree.head
    var semiWhere = "" // EXISTS/NOT EXISTS predicate, applied at the tree's top
    for (i <- 1 until tree.length) {
      val (lk, rk) = fk((tree(i - 1), tree(i)))
      val right = spark.read.parquet(s"$dir/${tree(i)}.parquet")
      val kind = rng.nextInt(8)
      if (kind >= 6 && i == tree.length - 1) {
        // ---- semi/anti on the LAST edge (round-12): Spark's
        // left_semi/left_anti vs the oracle's EXISTS / NOT EXISTS — the
        // null-key semantics (a null key matches nothing, so anti KEEPS
        // it) must agree; the child side optionally carries its own
        // predicate inside the subquery ----
        val anti = kind == 7
        feats += (if (anti) "anti" else "semi")
        val childPred = if (rng.nextBoolean()) predFor(tableCols(tree(i)))
          else None
        val childDf = childPred match {
          case Some((c, _)) => right.filter(c)
          case None => right
        }
        df = df.join(childDf, col(lk) === col(rk),
          if (anti) "left_anti" else "left_semi")
        val predSql = childPred.map { case (_, p) => s" AND $p" }.getOrElse("")
        semiWhere = s"${if (anti) "NOT " else ""}EXISTS " +
          s"(SELECT 1 FROM ${tree(i)} WHERE $lk = $rk$predSql)"
        // child columns do NOT join the frame
      } else {
        // inner (kind 0-3), left (4), or FULL OUTER (5) — full outer
        // nulls BOTH sides' columns (unmatched parents AND unmatched
        // children), the widest null fan-out the downstream stages see
        val (how, kw) = kind match {
          case 4 => ("left", "LEFT JOIN")
          case 5 => ("full", "FULL JOIN")
          case _ => ("inner", "JOIN")
        }
        if (how == "full") feats += "full"
        df = df.join(right, col(lk) === col(rk), how)
        from = s"$from $kw ${tree(i)} ON $lk = $rk"
        cols = cols ++ tableCols(tree(i))
      }
    }
    val semiW = if (semiWhere.isEmpty) "" else s" WHERE $semiWhere"
    var sql = s"SELECT ${cols.map(_.name).mkString(", ")} FROM $from$semiW"
    var depth = 1

    def wrap(select: String, where: String = "", group: String = "",
        tail: String = ""): Unit = {
      depth += 1
      val w = if (where.isEmpty) "" else s" WHERE $where"
      val g = if (group.isEmpty) "" else s" GROUP BY $group"
      sql = s"SELECT $select FROM ($sql) t$depth$w$g$tail"
    }

    // ---- one random predicate over the current columns ----
    def pred(): Option[(Column, String)] = predFor(cols)

    // ---- set-op stage (two filtered copies of the same frame) ----
    if (rng.nextDouble() < 0.2) {
      val keep = rng.shuffle(cols.filter(_.t != 't')).take(1 + rng.nextInt(3))
      val (pa, pb) = (pred(), pred())
      if (keep.nonEmpty && pa.isDefined && pb.isDefined) {
        val selCols = keep.map(c => col(c.name))
        val dfA = df.filter(pa.get._1).select(selCols: _*)
        val dfB = df.filter(pb.get._1).select(selCols: _*)
        val colList = keep.map(_.name).mkString(", ")
        val (df2, opSql) = rng.nextInt(3) match {
          case 0 => (dfA.unionAll(dfB), "UNION ALL")
          case 1 => (dfA.intersect(dfB), "INTERSECT")
          case _ => (dfA.except(dfB), "EXCEPT")
        }
        df = df2
        feats += "setop"
        depth += 1
        sql = s"(SELECT $colList FROM ($sql) sa$depth " +
          s"WHERE ${pa.get._2}) $opSql (SELECT $colList FROM ($sql) " +
          s"sb$depth WHERE ${pb.get._2})"
        cols = keep
      }
    }

    // ---- filter stage ----
    if (rng.nextDouble() < 0.75) {
      val ps = (0 until 1 + rng.nextInt(2)).flatMap(_ => pred())
      if (ps.nonEmpty) {
        val cond = ps.map(_._1).reduce(_ && _)
        df = df.filter(cond)
        wrap(cols.map(_.name).mkString(", "),
          where = ps.map(_._2).mkString(" AND "))
      }
    }

    // ---- projection stage (keeps a subset + 0..2 computed columns) ----
    if (rng.nextDouble() < 0.6) {
      val keep0 = rng.shuffle(cols.filter(_.t != 't'))
        .take(1 + rng.nextInt(4))
      val keep = if (keep0.nonEmpty) keep0 else cols.filter(_.t != 't').take(1)
      if (keep.nonEmpty) {
        val longs = cols.filter(_.t == 'l')
        val strs = cols.filter(_.t == 's')
        val tss = cols.filter(_.t == 't')
        val dbls = cols.filter(_.t == 'd')
        val computed = scala.collection.mutable.ArrayBuffer
          .empty[(String, Column, String, Char)]
        val nComp = rng.nextInt(3)
        for (i <- 1 to nComp) {
          val name = s"c$i"
          val choice = rng.nextInt(13)
          if (choice == 0 && longs.nonEmpty) {
            val a = longs(rng.nextInt(longs.length))
            val b = longs(rng.nextInt(longs.length))
            computed += ((name, col(a.name) + col(b.name),
              s"${a.name} + ${b.name}", 'l'))
          } else if (choice == 1 && longs.nonEmpty) {
            val a = longs(rng.nextInt(longs.length))
            computed += ((name, col(a.name) * 2 + 1,
              s"${a.name} * 2 + 1", 'l'))
          } else if (choice == 2 && strs.nonEmpty) {
            val a = strs(rng.nextInt(strs.length))
            computed += ((name, length(col(a.name)), s"length(${a.name})", 'l'))
          } else if (choice == 3 && strs.nonEmpty) {
            val a = strs(rng.nextInt(strs.length))
            val len = 1 + rng.nextInt(3)
            computed += ((name, substring(col(a.name), 1, len),
              s"substr(${a.name}, 1, $len)", 's'))
          } else if (choice == 4 && longs.nonEmpty) {
            val a = longs(rng.nextInt(longs.length))
            val k = rng.nextInt(100)
            computed += ((name, coalesce(col(a.name), lit(k.toLong)),
              s"coalesce(${a.name}, $k)", 'l'))
          } else if (choice == 5 && tss.nonEmpty) {
            val a = tss(rng.nextInt(tss.length))
            computed += ((name, year(col(a.name)).cast("long"),
              s"CAST(year(${a.name}) AS BIGINT)", 'l'))
          } else if (choice == 6 && dbls.nonEmpty) {
            // double +/-/*: one IEEE op over identical stored bits —
            // bit-exact on both engines, safe to emit
            val a = dbls(rng.nextInt(dbls.length))
            val b = dbls(rng.nextInt(dbls.length))
            val (c2, e) = rng.nextInt(3) match {
              case 0 => (col(a.name) + col(b.name), s"${a.name} + ${b.name}")
              case 1 => (col(a.name) - col(b.name), s"${a.name} - ${b.name}")
              case _ => (col(a.name) * col(b.name), s"${a.name} * ${b.name}")
            }
            feats += "dbl_arith"
            computed += ((name, c2, s"($e)", 'd'))
          } else if (choice == 7 && (dbls.nonEmpty || longs.nonEmpty)) {
            // division with an |x|+1 denominator guard: denominator >= 1,
            // so no div-by-zero / Inf / NaN on either engine; single IEEE
            // divide over identical bits -> bit-exact
            val nums = dbls ++ longs
            val a = nums(rng.nextInt(nums.length))
            val b = nums(rng.nextInt(nums.length))
            feats += "dbl_div"
            computed += ((name,
              col(a.name).cast("double") /
                (abs(col(b.name).cast("double")) + lit(1.0)),
              s"CAST(${a.name} AS DOUBLE) / " +
                s"(abs(CAST(${b.name} AS DOUBLE)) + CAST(1 AS DOUBLE))", 'd'))
          } else if (choice == 8 && dbls.nonEmpty && longs.nonEmpty) {
            // mixed long->double promotion (exact: |long| << 2^53)
            val a = longs(rng.nextInt(longs.length))
            val b = dbls(rng.nextInt(dbls.length))
            feats += "dbl_arith"
            computed += ((name,
              col(a.name).cast("double") * col(b.name),
              s"(CAST(${a.name} AS DOUBLE) * ${b.name})", 'd'))
          } else if (choice == 9 && dbls.nonEmpty) {
            val a = dbls(rng.nextInt(dbls.length))
            feats += "dbl_arith"
            computed += ((name, negate(col(a.name)), s"(- ${a.name})", 'd'))
          } else if (choice == 11 && longs.nonEmpty && dbls.nonEmpty) {
            // NaN/±Infinity injection (round-13): keyed on a long column so
            // both engines derive the identical non-finite value per row,
            // which then flows through grouping, sorting, min/max, windows,
            // set ops and the division stage. Spark and DuckDB share the
            // same floating-point TOTAL ORDER (NaN = NaN is true, NaN sorts
            // and compares greater than everything incl. +Inf) — this
            // injector is what proves that equivalence differentially.
            // A NULL key falls through to the finite ELSE on both engines
            // (null % 5 matches no branch).
            val k = longs(rng.nextInt(longs.length))
            val d = dbls(rng.nextInt(dbls.length))
            feats += "nan"
            computed += ((name,
              when(col(k.name) % 5 === 0, lit(Double.NaN))
                .when(col(k.name) % 5 === 1, lit(Double.PositiveInfinity))
                .when(col(k.name) % 5 === 2, lit(Double.NegativeInfinity))
                .otherwise(col(d.name)),
              s"CASE WHEN ${k.name} % 5 = 0 THEN CAST('NaN' AS DOUBLE) " +
                s"WHEN ${k.name} % 5 = 1 THEN CAST('Infinity' AS DOUBLE) " +
                s"WHEN ${k.name} % 5 = 2 THEN CAST('-Infinity' AS DOUBLE) " +
                s"ELSE ${d.name} END", 'd'))
          } else if (choice == 10 && tss.nonEmpty) {
            // DATE EMISSION through the string bridge: both engines render
            // a DATE as 'yyyy-MM-dd' text, so the calendar value itself —
            // not just filters over it — finally reaches the compare
            val a = tss(rng.nextInt(tss.length))
            feats += "date_emit"
            computed += ((name, to_date(col(a.name)).cast("string"),
              s"CAST(CAST(${a.name} AS DATE) AS VARCHAR)", 's'))
          } else if (longs.nonEmpty) {
            val a = longs(rng.nextInt(longs.length))
            computed += ((name,
              when(col(a.name) % 2 === 0, "even").otherwise("odd"),
              s"CASE WHEN ${a.name} % 2 = 0 THEN 'even' ELSE 'odd' END", 's'))
          }
        }
        val sel: Seq[Column] = keep.map(c => col(c.name)) ++
          computed.map { case (n, c, _, _) => c.as(n) }
        df = df.select(sel: _*)
        wrap((keep.map(_.name) ++
          computed.map { case (n, _, e, _) => s"($e) AS $n" }).mkString(", "))
        cols = keep ++ computed.map { case (n, _, _, t) => FCol(n, t) }
      }
    }

    // ---- window stage (round-12): deterministic window functions only.
    // Round-13: doubles join the partition-key candidates — partitioning
    // hashes on grouping equality, where both engines unify NaNs and
    // -0.0/0.0, so a non-finite (or signed-zero) partition key is exactly
    // the semantics the nan injector needs exercised ----
    if (rng.nextDouble() < 0.4 && cols.exists(_.t != 't')) {
      val partCands = cols.filter(c => c.t == 'l' || c.t == 's' || c.t == 'd')
      val part = if (partCands.nonEmpty && rng.nextBoolean())
        Some(partCands(rng.nextInt(partCands.length))) else None
      val orderCands = cols.filter(_.t != 't')
      def overSql(order: Seq[String]): String = {
        val p = part.map(c => s"PARTITION BY ${c.name}").getOrElse("")
        val o = if (order.isEmpty) ""
          else order.map(k => s"$k ASC NULLS FIRST").mkString("ORDER BY ", ", ", "")
        s"OVER (${Seq(p, o).filter(_.nonEmpty).mkString(" ")})"
      }
      def winSpec(order: Seq[String]) = {
        val base = part match {
          case Some(p) => Window.partitionBy(col(p.name))
          case None => Window.partitionBy(Seq.empty[Column]: _*)
        }
        if (order.isEmpty) base
        else base.orderBy(order.map(k => col(k).asc_nulls_first): _*)
      }
      val wins = scala.collection.mutable.ArrayBuffer
        .empty[(String, Column, String, Char)]
      val nWin = 1 + rng.nextInt(2)
      for (i <- 1 to nWin) {
        val name = s"w$i"
        rng.nextInt(5) match {
          case 0 =>
            // rank/dense_rank: deterministic under ties by definition
            val nk = 1 + rng.nextInt(math.min(2, orderCands.length))
            val ks = rng.shuffle(orderCands).take(nk).map(_.name)
            val (fn, fnSql) =
              if (rng.nextBoolean()) (rank(), "RANK()")
              else (dense_rank(), "DENSE_RANK()")
            wins += ((name, fn.over(winSpec(ks)).cast("long"),
              s"CAST($fnSql ${overSql(ks)} AS BIGINT)", 'l'))
          case 1 =>
            // row_number ordered by EVERY column of the frame: rows tied on
            // all order keys are identical in every emitted column, so
            // whichever of them gets which number, the output MULTISET is
            // engine-independent. (The first cut ordered by a per-table
            // "unique key" — the fuzzer itself caught that the synthetic
            // lineitem has up to 5 duplicate (l_orderkey, l_linenumber)
            // pairs, seeds 298/390, and the numbers swapped between
            // engines. Ordering by all columns needs no uniqueness
            // assumption at all.)
            val ks = cols.map(_.name)
            wins += ((name, row_number().over(winSpec(ks)).cast("long"),
              s"CAST(ROW_NUMBER() ${overSql(ks)} AS BIGINT)", 'l'))
          case 2 =>
            wins += ((name, count(lit(1)).over(winSpec(Nil)),
              s"COUNT(*) ${overSql(Nil)}", 'l'))
          case 3 if cols.exists(_.t == 'l') =>
            // running sum with ORDER BY: both engines default to
            // RANGE UNBOUNDED PRECEDING..CURRENT ROW, which includes peer
            // rows, so tied order keys cannot flip the result
            val lcols = cols.filter(_.t == 'l')
            val a = lcols(rng.nextInt(lcols.length))
            val nk = 1 + rng.nextInt(math.min(2, orderCands.length))
            val ks = rng.shuffle(orderCands).take(nk).map(_.name)
            wins += ((name, sum(col(a.name)).over(winSpec(ks)),
              s"SUM(${a.name}) ${overSql(ks)}", 'l'))
          case _ =>
            val mcands = cols.filter(_.t != 't')
            val a = mcands(rng.nextInt(mcands.length))
            wins += ((name, max(col(a.name)).over(winSpec(Nil)),
              s"MAX(${a.name}) ${overSql(Nil)}", a.t))
        }
      }
      if (wins.nonEmpty) {
        feats += "window"
        val sel: Seq[Column] = cols.map(c => col(c.name)) ++
          wins.map { case (n, c, _, _) => c.as(n) }
        df = df.select(sel: _*)
        wrap((cols.map(_.name) ++
          wins.map { case (n, _, e, _) => s"$e AS $n" }).mkString(", "))
        cols = cols ++ wins.map { case (n, _, _, t) => FCol(n, t) }
      }
    }

    // ---- aggregate stage. Round-13: doubles are group-key candidates too
    // (grouping equality unifies all NaN payloads and the zero signs on
    // both engines; the emitted representative's zero sign is erased by
    // fmtDouble's -0.0 normalization) ----
    if (rng.nextDouble() < 0.55) {
      val keyCands = cols.filter(c => c.t == 'l' || c.t == 's' || c.t == 'd')
      val keys = rng.shuffle(keyCands).take(rng.nextInt(3))
      val aggCands = cols.filter(_.t != 't')
      val aggs = scala.collection.mutable.ArrayBuffer
        .empty[(String, Column, String, Char)]
      aggs += (("cnt", count(lit(1)), "COUNT(*)", 'l'))
      for (i <- 1 to rng.nextInt(3); if aggCands.nonEmpty) {
        val c = aggCands(rng.nextInt(aggCands.length))
        val name = s"a$i"
        rng.nextInt(3) match {
          case 0 => aggs += ((name, min(col(c.name)), s"MIN(${c.name})", c.t))
          case 1 => aggs += ((name, max(col(c.name)), s"MAX(${c.name})", c.t))
          case _ =>
            if (c.t == 'l')
              aggs += ((name, sum(col(c.name)), s"SUM(${c.name})", 'l'))
            else
              aggs += ((name, max(col(c.name)), s"MAX(${c.name})", c.t))
        }
      }
      val aggExprs = aggs.map { case (n, c, _, _) => c.as(n) }
      if (keys.nonEmpty && rng.nextDouble() < 0.3) {
        // ---- ROLLUP class (round-12): grouping-set expansion with the
        // standard GROUPING bit vector emitted so a data-NULL key is
        // distinguishable from a rolled-up one. The trailing `cnt > 0`
        // guard is LOAD-BEARING: on ZERO input rows Spark's rollup emits
        // nothing while the standard (DuckDB) emits the grand-total row
        // with cnt 0 — a pinned fixture divergence
        // (AdversarialDataSpec) — and the guard is a no-op on every
        // non-empty group (count(*) >= 1), so the two engines agree on
        // ALL inputs including the adversarial empty tables ----
        feats += "rollup"
        df = df.rollup(keys.map(k => col(k.name)): _*)
          .agg(aggExprs.head,
            (aggExprs.tail.toSeq :+ grouping_id().cast("long").as("gid")): _*)
          .filter(col("cnt") > 0)
        wrap((keys.map(_.name) ++
          aggs.map { case (n, _, e, _) => s"$e AS $n" } :+
          s"CAST(GROUPING(${keys.map(_.name).mkString(", ")}) AS BIGINT) AS gid")
          .mkString(", "),
          group = s"ROLLUP (${keys.map(_.name).mkString(", ")})")
        depth += 1
        sql = s"SELECT * FROM ($sql) r$depth WHERE cnt > 0"
        cols = keys ++ aggs.map { case (n, _, _, t) => FCol(n, t) } :+
          FCol("gid", 'l')
      } else {
        df =
          if (keys.isEmpty) df.agg(aggExprs.head, aggExprs.tail.toSeq: _*)
          else df.groupBy(keys.map(k => col(k.name)): _*)
            .agg(aggExprs.head, aggExprs.tail.toSeq: _*)
        wrap((keys.map(_.name) ++
          aggs.map { case (n, _, e, _) => s"$e AS $n" }).mkString(", "),
          group = keys.map(_.name).mkString(", "))
        cols = keys ++ aggs.map { case (n, _, _, t) => FCol(n, t) }
        // HAVING-shaped post-aggregate filter on the count
        if (rng.nextDouble() < 0.4) {
          val k = 1 + rng.nextInt(5)
          df = df.filter(col("cnt") > k)
          wrap(cols.map(_.name).mkString(", "), where = s"cnt > $k")
        }
      }
    }

    // ---- never emit timestamps (canonical form is l/d/s only) ----
    if (cols.exists(_.t == 't')) {
      val keep0 = cols.filter(_.t != 't')
      val keep = if (keep0.nonEmpty) keep0 else Seq(cols.head)
      if (keep.exists(_.t == 't')) {
        // degenerate all-timestamp frame: count it instead
        df = df.agg(count(lit(1)).as("cnt"))
        wrap("COUNT(*) AS cnt")
        cols = Seq(FCol("cnt", 'l'))
      } else {
        df = df.select(keep.map(c => col(c.name)): _*)
        wrap(keep.map(_.name).mkString(", "))
        cols = keep
      }
    }

    // ---- ORDER BY + LIMIT (round-12): sort by ALL columns so boundary
    // ties are full duplicate rows -> deterministic result multiset ----
    if (rng.nextDouble() < 0.3 && cols.nonEmpty) {
      feats += "limit"
      val k = 1 + rng.nextInt(50)
      df = df.orderBy(cols.map(c => col(c.name).asc_nulls_first): _*).limit(k)
      wrap("*", tail = " ORDER BY " +
        cols.map(c => s"${c.name} ASC NULLS FIRST").mkString(", ") +
        s" LIMIT $k")
    }
    (df, sql, cols, feats.toSet)
  }
}

object FuzzPlanGen {

  /** Exact-binary round-half-even at 4 decimals: lock-step with CPython's
    * f"{v:.4f}" in scripts/fuzz_oracle.py. String.format("%.4f") is WRONG
    * here (HALF_UP over the shortest decimal repr — see the formatting
    * fixture test in DifferentialFuzzSpec). Negative values that round to
    * zero normalize to unsigned zero on both sides. NaN/±Infinity render
    * as the specials NaN / Inf / -Inf (round-13: the non-finite domain
    * entered the differential surface — BigDecimal would throw on them). */
  def fmtDouble(v0: Double): String = {
    if (v0.isNaN) "NaN"
    else if (v0 == Double.PositiveInfinity) "Inf"
    else if (v0 == Double.NegativeInfinity) "-Inf"
    else {
      val v = if (v0 == 0.0) 0.0 else v0 // normalize -0.0 (python side too)
      val s = new java.math.BigDecimal(v)
        .setScale(4, java.math.RoundingMode.HALF_EVEN).toPlainString
      if (s == "-0.0000") "0.0000" else s
    }
  }

  /** Binary-safe string escaping for the '|'-framed line-oriented canonical
    * form (round-13): the frame characters themselves may now appear INSIDE
    * string values (AdversarialDataSpec's framing-hostile pools), so they
    * are escaped per value — backslash first, then newline/CR/pipe, and the
    * null marker U+2205 (escaped so a literal '∅' string can never collide
    * with the bare null marker). Lock-step with fuzz_oracle.py's esc(). */
  def escapeString(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("\r", "\\r")
      .replace("|", "\\p").replace("∅", "\\0")

  /** Canonical result: one string per row, values '|'-joined, sorted.
    * MUST stay in lock-step with scripts/fuzz_oracle.py's fmt(). */
  def canon(df: DataFrame, cols: Seq[FCol]): Seq[String] = {
    df.collect().map { r =>
      cols.zipWithIndex.map { case (c, i) =>
        if (r.isNullAt(i)) "∅"
        else c.t match {
          case 'd' => fmtDouble(r.getDouble(i))
          case 's' => escapeString(r.getString(i))
          case _ => r.get(i).toString
        }
      }.mkString("|")
    }.sorted.toSeq
  }

  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Runs scripts/fuzz_oracle.py over the plans' SQL against `sfDir` and
    * returns the oracle output directory (one canonical .txt per plan).
    * Returns None if python3+duckdb is unavailable (caller should assume). */
  def runOracle(sfDir: String,
      plans: Seq[(Int, (DataFrame, String, Seq[FCol], Set[String]))])
      : Option[Path] = {
    import scala.sys.process._
    val pyOk =
      try Process(Seq("python3", "-c", "import duckdb")).! == 0
      catch { case _: Throwable => false }
    if (!pyOk) return None
    val dir = Files.createTempDirectory("graft_fuzz")
    val outDir = dir.resolve("oracle")
    val spec = s"""{"sfDir": ${jsonStr(sfDir)}, "outDir": ${jsonStr(outDir.toString)}, "queries": [""" +
      plans.map { case (s, (_, sql, _, _)) =>
        s"""{"name": ${jsonStr(s"q$s")}, "sql": ${jsonStr(sql)}}"""
      }.mkString(", ") + "]}"
    val specPath = dir.resolve("spec.json")
    Files.writeString(specPath, spec)
    // Environmental-failure discipline (round-13 flake adjudication): a
    // DuckDB subprocess can die for host reasons (OOM killer, tmp-dir
    // pressure) that say nothing about value correctness. Capture its
    // output, retry ONCE on a nonzero exit, and if it fails twice raise
    // with the stderr tail so the red names the actual cause instead of
    // reading as an unattributed correctness failure.
    def runOnce(): (Int, Seq[String]) = {
      val log = scala.collection.mutable.ArrayBuffer.empty[String]
      val rc = Process(Seq("python3", "scripts/fuzz_oracle.py",
        specPath.toString)).!(ProcessLogger(log += _, log += "[stderr] " + _))
      (rc, log.toSeq)
    }
    val (rc1, log1) = runOnce()
    if (rc1 != 0) {
      val (rc2, log2) = runOnce()
      require(rc2 == 0,
        s"fuzz_oracle.py exited $rc1 then $rc2 on retry (environmental " +
          "subprocess failure, not a value mismatch). Last output:\n" +
          (log1 ++ log2).takeRight(30).mkString("\n"))
    }
    Some(outDir)
  }

  /** Compares every plan's Spark result against the oracle dump; returns
    * human-readable mismatch reports (empty = all row-identical) and fills
    * `rowCounts` with per-seed Spark row counts for non-vacuity checks. */
  def compare(outDir: Path,
      plans: Seq[(Int, (DataFrame, String, Seq[FCol], Set[String]))],
      rowCounts: scala.collection.mutable.Map[Int, Long]): Seq[String] = {
    plans.flatMap { case (s, (df, sql, cols, _)) =>
      val mine = canon(df, cols)
      rowCounts(s) = mine.size.toLong
      val oracleFile = outDir.resolve(s"q$s.txt")
      // attribute a missing dump to its seed instead of letting a raw
      // NoSuchFileException read as an anonymous suite error
      if (!Files.exists(oracleFile))
        return Seq(s"seed $s: oracle dump $oracleFile missing — " +
          s"fuzz_oracle.py died mid-run (environmental)?\n  SQL: $sql")
      val theirs0 = new String(Files.readAllBytes(oracleFile), "UTF-8")
      val theirs = if (theirs0.isEmpty) Seq.empty[String]
        else theirs0.split("\n", -1).toSeq
      if (mine == theirs) None
      else {
        val diff = mine.zipAll(theirs, "<absent>", "<absent>")
          .filter { case (a, b) => a != b }.take(3)
        Some(s"seed $s: spark ${mine.size} rows vs duckdb ${theirs.size}; " +
          s"first diffs: ${diff.mkString("; ")}\n  SQL: $sql")
      }
    }
  }
}
