package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: relational core ([[Queries]]), LLM-pipeline extensions
  * ([[graft.ops.ExtensionQueries]]), augmentation pipeline
  * ([[graft.ops.AugmentQueries]]). Every entry with an oracle is verified
  * against DuckDB on sf0.01 by the driver's Verify run.
  */
object SparkEntry {

  private def specs: Seq[QuerySpec] =
    Queries.all ++ ops.ExtensionQueries.all ++ ops.Extension2Queries.all ++
      ops.AugmentQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all.find(_.name == "q3_regional_revenue").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
