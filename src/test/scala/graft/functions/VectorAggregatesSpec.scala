package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("CentroidAggregator matches the relational posexplode/avg twin") {
    val agg = new VectorAggregates.CentroidAggregator(64).toColumn
    val typed = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding"))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("centroid"))
      .collect().toMap

    val relational = Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }

    assert(typed.keySet === relational.keySet)
    typed.foreach { case (label, centroid) =>
      centroid.zip(relational(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label")
      }
    }
  }

  test("partial aggregation: result independent of partitioning") {
    val agg = new VectorAggregates.CentroidAggregator(64).toColumn
    def run(parts: Int) = Tables.embeddings(spark, sfDir)
      .repartition(parts)
      .select(col("label"), col("embedding")).as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .collect().toMap
    val a = run(1); val b = run(7)
    a.foreach { case (l, c) =>
      c.zip(b(l)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }
}
