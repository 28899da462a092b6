package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness test tables (TESTDATA.md / FIXTURES.md §2).
  *
  * All tables are parquet (SURVEY.md §2.1 S12 — the engine's default scan).
  * Schemas come from the parquet footers; we do not re-declare them so that
  * Catalyst's vectorized parquet reader + column pruning + filter pushdown
  * apply untouched. At 100 TB these reads are partition-pruned / column-pruned
  * by whatever query sits on top — nothing here forces a materialization.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.parquet has shipped with two physical `ts` encodings across
    * harness refreshes: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long, truncate to microseconds, identical to
    * DuckDB's ns→µs handling) and plain TIMESTAMP(MICROS) (isAdjustedToUTC
    * false → TIMESTAMP_NTZ). Normalize both to session-TZ TIMESTAMP (all
    * sessions pin spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast is
    * value-exact and oracle comparisons stay byte-identical). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** Fan an UNDER-SPLIT input across the configured shuffle parallelism
    * before a CPU-heavy per-row expansion (suffix/shingle/bigram explode,
    * md5 grids, per-dim outer products, parse_json). Guide §2.5's
    * "one unsplittable input file → repartition immediately after the
    * read": a single small parquet file scans as ONE task, so everything
    * fused above the first exchange — exactly the expansion work these
    * operators are made of — runs on one core (measured: x99's suffix
    * explode spent 2.8 s of a 5.0 s query in a 1-task stage; x127's
    * moment pass 2×2.0 s single-task).
    *
    * Scale-adaptive by construction, not tuned to local[32]:
    *   - the target count is the session's shuffle parallelism
    *     (spark.sql.shuffle.partitions — conf, follows the cluster);
    *   - it is a NO-OP whenever the scan already has at least that many
    *     file splits (a 100 TB table arrives in thousands of files, so
    *     production plans never pay the extra exchange — only the
    *     under-split small-file read does, and for it the shuffled bytes
    *     equal the (tiny) input).
    * Hash-partitioning on the row key is deterministic under retry
    * (guide §2.5 — no round-robin, no rand()), so results are unchanged:
    * this moves rows, never values. The explicit partition count pins the
    * layout against AQE's byte-based coalescing, which would otherwise
    * re-serialize a CPU-bound stage onto 1-4 tasks because its INPUT
    * bytes are small (measured on x238's checkpointed tf: 4 partitions,
    * 5.1 s of task time on a 32-core host).
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val p = numShufflePartitions(df.sparkSession)
    if (df.inputFiles.length >= p) df else df.repartition(p, key)
  }

  /** The session's configured shuffle parallelism (conf-driven, so it
    * follows the cluster / the driver's per-run core count — never a
    * local constant). */
  def numShufflePartitions(s: SparkSession): Int = scala.util.Try(
    s.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    .getOrElse(s.sparkContext.defaultParallelism)
}
