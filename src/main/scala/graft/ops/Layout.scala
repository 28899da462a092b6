package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical data-layout helpers — the write-side half of scan pruning.
  * At 100 TB the cheapest query is the one whose files never open:
  * clustering on write gives every parquet file tight min/max zone maps,
  * and the reader's predicate pushdown (PushedFilters) skips whole files.
  */
object Layout {

  /** Z-order clustering on two dimensions: range-partition + in-partition
    * sort on the interleaved [[graft.plans.ZOrderKey]], so each output
    * partition (and file, on write) covers one compact rectangle-ish region
    * of (a, b) space — predicates on EITHER column prune files, which no
    * single-column sort gives (sorting by a leaves every file spanning the
    * full b range).
    *
    * Both columns are min-max scaled to the full 21-bit key domain first
    * — raw interleaving makes the WIDER column's high bits dominate the
    * key, so the narrow column never narrows per file (observed: cust
    * 0..150 vs day 0..2400 left cust spans at 97% until scaled; Delta/
    * Iceberg Z-ORDER writers scale per-column for the same reason). The
    * min/max pass is one cheap aggregate (a layout job scans its input
    * anyway, and repartitionByRange runs its own sampling job besides);
    * for heavily SKEWED columns swap min-max for a rank-based scale.
    * Precondition: column range (max - min) must fit in ~2^40 so the
    * scaling multiply stays inside a LONG. */
  def zOrdered(df: DataFrame, a: String, b: String,
      numPartitions: Int): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val s = df.agg(
      min(col(a).cast("long")), max(col(a).cast("long")),
      min(col(b).cast("long")), max(col(b).cast("long"))).head()
    def scaled(c: String, lo: Long, hi: Long) =
      if (hi <= lo) lit(0L)
      else (col(c).cast("long") - lit(lo)) * lit(graft.plans.ZOrderKey.Limit) /
        lit(hi - lo + 1)
    df.withColumn("__za", scaled(a, s.getLong(0), s.getLong(1)).cast("long"))
      .withColumn("__zb", scaled(b, s.getLong(2), s.getLong(3)).cast("long"))
      .withColumn("__zkey", expr("zorder_key(__za, __zb)"))
      .repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__za", "__zb", "__zkey")
  }
}
