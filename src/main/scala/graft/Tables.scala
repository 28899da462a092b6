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
}
