package graft.ops

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Scale-shape assertions: the plan properties the 100 TB design depends on,
  * checked against the actual physical plans at test scale. */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables co-locate the join: no shuffle on the join key") {
    spark.sql("DROP TABLE IF EXISTS l_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sfDir).write.bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("l_bucketed")
    Tables.orders(spark, sfDir).write.bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("o_bucketed")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = spark.table("l_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = physicalPlan(joined)
      // SMJ reads both bucketed sides without an Exchange below the join
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      val joinIdx = plan.indexOf("SortMergeJoin")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey"),
        "lineitem side re-shuffled despite bucketing")
      assert(joined.count() > 0)
      // bucket pruning: an equality predicate on the bucket column opens
      // only that bucket's files (auto-bucketed-scan normally skips the
      // bucketed layout for filter-only plans; pin it on to assert pruning)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val onePlan = physicalPlan(
          spark.table("o_bucketed").filter(col("o_orderkey") === 7L))
        assert(onePlan.contains("SelectedBucketsCount: 1 out of 4"),
          onePlan.take(1500))
      } finally
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS l_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("tfidf term join carries no broadcast hint: with the threshold off, " +
      "the vocabulary side shuffles (the 100 TB path)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.SparkEntry.queries("x29_tfidf_topterm")(spark, sfDir)
      val plan = physicalPlan(df)
      // the 1-row corpus count keeps its explicit hint (BroadcastNestedLoop)
      // but the term join must NOT hash-broadcast the vocabulary
      assert(!plan.contains("BroadcastHashJoin"), plan.take(3000))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(3000))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("broadcast hint produces BroadcastHashJoin for dim joins") {
    val j = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
    assert(physicalPlan(j).contains("BroadcastHashJoin"))
  }

  test("augmentation plan has no shuffle: pixels never cross an exchange") {
    val imgs = Augment.syntheticImages(spark, Tables.part(spark, sfDir),
      size = 16, maxImages = 5)
    val plan = physicalPlan(Augment.runPass(imgs, 1).toDF())
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("partitioned parquet write enables partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.lineitem(spark, sfDir)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.partitionBy("ship_year").mode("overwrite").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("ship_year") === 1995)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("ship_year"), scan.take(1500))
    // pruned read returns only that partition's rows
    val expected = Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")) === 1995).count()
    assert(filtered.count() === expected && expected > 0)
  }

  test("streaming file source end-to-end: readStream json -> window -> sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // two micro-batch files of events-shaped json
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b1.json"),
      """{"ts":"2024-01-01T00:01:00.000Z","event_type":"click","value":1.0}
        |{"ts":"2024-01-01T00:02:00.000Z","event_type":"click","value":2.0}""".stripMargin)
    val schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"
    val stream = spark.readStream.schema(schema).json(dir)
    assert(stream.isStreaming)
    val q = graft.streaming.EventsStream.tumblingAgg(stream, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    q.processAllAvailable()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b2.json"),
      """{"ts":"2024-01-01T00:03:00.000Z","event_type":"view","value":4.0}""")
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT event_type, n, sum_value FROM file_stream_test ORDER BY event_type")
      .as[(String, Long, Double)].collect().toSeq
    q.stop()
    assert(rows === Seq(("click", 2L, 3.0), ("view", 1L, 4.0)))
  }
}
