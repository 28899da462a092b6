package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named relational operators beyond raw DataFrame calls — the declared
  * engine surface (SURVEY §2.3/§2.5 notes: semi/anti/top-k/as-of ship even
  * though the reference never needed them).
  */
object Relational {

  /** Top-k rows per group, deterministic via explicit tiebreak columns.
    * One shuffle (the window partition); no global sort. */
  def topKPerGroup(df: DataFrame, k: Int, partition: Seq[Column],
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** As-of join: for each left row, the latest right row with the same key
    * and rightTs <= leftTs.
    *
    * Implementation is the scalable union+window trick: tag both sides,
    * union, one window over (key, ts) carrying the last right value forward.
    * Single shuffle on the key — no range-join explosion, no per-key
    * collect. Equal timestamps: the right row sorts first (tag order), so
    * ties are included, matching DuckDB/pandas ASOF `>=` semantics. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVal: String,
      asCol: String = "asof_value"): DataFrame = {
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__val", lit(null).cast(right.schema(rightVal).dataType))
    val r = right.select(
      col(key), col(rightTs).as("__ts"), lit(0).as("__tag"),
      col(rightVal).as("__val"))
    val unioned = l.select((l.columns.filterNot(Seq(rightVal, "__ts", "__tag", "__val").contains)
      .map(col) ++ Seq(col("__ts"), col("__tag"), col("__val"))): _*)
      .unionByName(r, allowMissingColumns = true)
    // __val in the sort keeps duplicate-(ts) right rows deterministic
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"), col("__val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asCol, last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__ts", "__val")
  }

  /** Deterministic hash-mod split (the 100 TB split path — no global sort,
    * no window; O1 standardized). fraction in [0,1] with denominator 100. */
  def hashModSplit(df: DataFrame, keyCol: String, trainPct: Int): (DataFrame, DataFrame) = {
    val bucket = pmod(col(keyCol), lit(100))
    (df.filter(bucket < trainPct), df.filter(bucket >= trainPct))
  }

  /** Bounded range join (inner): for each left row, right rows with the same
    * key and rightTs in (leftTs - gap, leftTs].
    *
    * Scalable shape: both sides bucket to floor(ts / gap); each left row
    * probes only its own and the previous bucket (the window spans at most
    * two), so the join is equi on (key, bucket) — no quadratic range
    * explosion, no broadcast requirement. Emits left columns + `matched`
    * (the right ts); callers wanting outer semantics left-join the
    * aggregated result back (see q37_range_join). */
  def rangeJoinWithinGap(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, gapSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val l = left
      .withColumn("__lb", expr(s"unix_micros($leftTs) div ${gapUs}L"))
      .withColumn("__probe", explode(array(col("__lb") - 1, col("__lb"))))
    val r = right.select(
      col(key).as("__rkey"),
      col(rightTs).as("__rts"),
      expr(s"unix_micros($rightTs) div ${gapUs}L").as("__rb"))
    l.join(r,
        col(key) === col("__rkey") && col("__probe") === col("__rb") &&
          col("__rts") > col(leftTs) - expr(s"INTERVAL $gapSeconds SECONDS") &&
          col("__rts") <= col(leftTs))
      .drop("__lb", "__probe", "__rkey", "__rb")
      .withColumnRenamed("__rts", "matched")
  }

  /** Skew-salted inner equi-join: the left (skewed) side gets a deterministic
    * salt derived from a secondary column, the right side is replicated
    * across all salt values — the classic hot-key spreading that AQE's
    * skew-join does adaptively, available explicitly. Results are identical
    * to a plain join (asserted in RelationalSpec). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      saltFrom: String, salts: Int): DataFrame = {
    val l = skewed.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(salts)))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** SCD-2 history construction (Kimball's type-2 slowly changing
    * dimension) from an append-only change feed: per key ordered by
    * (ts, seq), consecutive repeats of the tracked attribute collapse,
    * and each surviving change opens a version row valid from its own
    * timestamp until the next change's timestamp (NULL while current).
    *
    * Scale shape: both windows partition on the dimension key — per-key
    * history is bounded by that key's change count, never corpus-global —
    * so the op is one shuffle on `key` and streams within each partition.
    * `seq` breaks same-timestamp ties deterministically (the change feed's
    * own monotonic id), which makes the output reproducible under
    * re-delivery — the property a warehouse MERGE pipeline needs. */
  def scd2History(feed: DataFrame, key: String, ts: String, seq: String,
      attr: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
    val changes = feed
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
    val wc = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
    changes
      .withColumn("version", row_number().over(wc).cast("long"))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(wc))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .select(col(key), col("version"), col(attr).as("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
