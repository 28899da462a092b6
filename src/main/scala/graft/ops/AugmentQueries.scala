package graft.ops

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Augmentation-pipeline queries: fan-out counts are deterministic (RNG only
  * perturbs pixels/boxes, never row counts), so the multiplier table
  * (SURVEY §2.7) is oracle-checkable from the driving `part` table. Pixel
  * and box semantics are covered by KernelsSpec/AugmentSpec. */
object AugmentQueries {

  def all: Seq[QuerySpec] = Seq(

    // Per-source-image fan-out across all 7 passes: positives 190, negatives 20.
    QuerySpec(
      "aug1_fanout",
      (s, dir) => {
        val imgs = Augment.syntheticImages(s, Tables.part(s, dir)).cache()
        Augment.allPasses(imgs).toDF()
          .select(split(col("id"), "-").getItem(0).as("source_id"))
          .groupBy("source_id").agg(count(lit(1)).as("n_aug"))
          .orderBy("source_id")
      },
      Some("""SELECT CAST(p_partkey AS VARCHAR) AS source_id,
             |  CAST(CASE WHEN p_partkey % 3 <> 0 THEN 190 ELSE 20 END AS BIGINT) AS n_aug
             |FROM part WHERE p_partkey <= 40 ORDER BY source_id""".stripMargin)),

    // Per-pass fan-out: replicas × flip-twin × positives-gate, per SURVEY §2.7.
    QuerySpec(
      "aug2_pass_counts",
      (s, dir) => {
        val imgs = Augment.syntheticImages(s, Tables.part(s, dir)).cache()
        Augment.allPasses(imgs).toDF()
          .select(element_at(split(col("id"), "-"), -1).cast("long").as("pass"))
          .groupBy("pass").agg(count(lit(1)).as("n"))
          .orderBy("pass")
      },
      Some("""SELECT CAST(m.pass AS BIGINT) AS pass,
             |  CAST(SUM(CASE WHEN p.p_partkey % 3 <> 0 THEN m.pos ELSE m.neg END) AS BIGINT) AS n
             |FROM part p CROSS JOIN (VALUES
             |  (1, 10, 10), (2, 50, 0), (3, 50, 0), (4, 10, 10),
             |  (5, 50, 0), (6, 10, 0), (7, 10, 0)) AS m(pass, pos, neg)
             |WHERE p.p_partkey <= 40
             |GROUP BY m.pass ORDER BY pass""".stripMargin)),

    // Reference-scale throughput probe: full 1024×1024 pixels (the
    // reference's fixed image size) through the whole-image passes 1 and 4.
    // 20 source images → 400 augmented MB-scale frames, kernels running
    // task-parallel — the BENCH entry that measures image-pipeline
    // throughput against the reference's single-threaded stage 1.
    QuerySpec(
      "aug3_fullres_throughput",
      (s, dir) => {
        val imgs = Augment.syntheticImages(s, Tables.part(s, dir),
          size = 1024, maxImages = 20)
        (Augment.runPass(imgs, 1) union Augment.runPass(imgs, 4)).toDF()
          .select(split(col("id"), "-").getItem(0).as("source_id"))
          .groupBy("source_id").agg(count(lit(1)).as("n_aug"))
          .orderBy("source_id")
      },
      Some("""SELECT CAST(p_partkey AS VARCHAR) AS source_id,
             |  CAST(20 AS BIGINT) AS n_aug
             |FROM part WHERE p_partkey <= 20 ORDER BY source_id""".stripMargin))
  )
}
