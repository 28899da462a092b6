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
}
