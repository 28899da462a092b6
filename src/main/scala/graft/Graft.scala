package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: register the harness tables as temp views plus the
  * engine's SQL extensions, then query via `spark.sql` or the module APIs
  * ([[Queries]], [[ops.Relational]], [[ops.Dedup]], [[ops.Similarity]],
  * [[functions.TextFunctions]], [[Pipeline]], [[streaming.EventsStream]]).
  */
object Graft {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Register every harness table as a temp view + the custom SQL functions
    * (`sorted_intersect_size`). Afterwards arbitrary `spark.sql` over the
    * engine's surface works. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach {
      case n @ "events" => Tables.events(spark, dir).createOrReplaceTempView(n)
      case n =>
        spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n)
    }
    plans.GraftFunctions.register(spark)
  }
}
