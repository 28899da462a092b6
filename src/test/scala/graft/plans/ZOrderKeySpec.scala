package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderKeySpec extends SparkSpec {
  import spark.implicits._

  test("interleave places a on even bits, b on odd bits; inverse recovers both") {
    assert(ZOrderKey.interleave(0L, 0L) === 0L)
    assert(ZOrderKey.interleave(1L, 0L) === 1L)
    assert(ZOrderKey.interleave(0L, 1L) === 2L)
    assert(ZOrderKey.interleave(3L, 3L) === 15L)
    // round-trip a sample of the domain
    for (a <- Seq(0L, 7L, 255L, 123456L, ZOrderKey.Limit - 1);
         b <- Seq(0L, 1L, 9999L, ZOrderKey.Limit - 1)) {
      val z = ZOrderKey.interleave(a, b)
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until ZOrderKey.Bits) {
        ra |= ((z >>> (2 * i)) & 1L) << i
        rb |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      assert((ra, rb) === ((a, b)))
    }
  }

  test("expression: codegen result matches eval, out-of-range is NULL") {
    GraftFunctions.register(spark)
    val df = Seq((899L, 1371L), (0L, 0L), (-1L, 5L), (5L, ZOrderKey.Limit))
      .toDF("a", "b")
      .select($"a", $"b", expr("zorder_key(a, b)").as("z"))
    val rows = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows(899L) === Some(ZOrderKey.interleave(899L, 1371L)))
    assert(rows(0L) === Some(0L))
    assert(rows(-1L) === None) // negative input
    assert(rows(5L) === None)  // >= 2^21
  }

  test("zOrdered layout narrows BOTH dimensions per partition") {
    val orders = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("long").as("cust"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
          .cast("long").as("day"))
    val global = orders.agg(
      (max("cust") - min("cust") + 1).as("cw"),
      (max("day") - min("day") + 1).as("dw")).head()
    val (custW, dayW) = (global.getLong(0), global.getLong(1))

    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("__pid", spark_partition_id())
        .groupBy("__pid")
        .agg((max("cust") - min("cust") + 1).as("cs"),
          (max("day") - min("day") + 1).as("ds"))
        .select("cs", "ds").as[(Long, Long)].collect().toSeq

    val z = spans(graft.ops.Layout.zOrdered(orders, "cust", "day", 16))
    // single-column layout: every partition spans the FULL day range
    val single = spans(orders.repartitionByRange(16, col("cust")))

    assert(z.size === 16)
    // z-layout: both dimensions narrow ON AVERAGE (a 16-way z-range split
    // is a ~4x4 grid; individual cuts straddling a quadrant boundary can
    // leave a few partitions wide in one dimension, so the claim is about
    // the mean — which is what expected-files-scanned measures anyway)
    assert(z.map(_._1).sum.toDouble / z.size <= 0.5 * custW,
      s"mean cust span too wide: $z")
    assert(z.map(_._2).sum.toDouble / z.size <= 0.5 * dayW,
      s"mean day span too wide: $z")
    // while the single-column layout leaves day unpruned everywhere
    assert(single.forall { case (_, ds) => ds >= 0.95 * dayW })
  }
}
