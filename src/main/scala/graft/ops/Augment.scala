package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Kernels.{Box, Rng}

/** The reference's 7 augmentation passes (SURVEY.md §2.7 K7,
  * generate_images_from_dicom.py:281-561) as Dataset flatMaps.
  *
  * Execution shape, designed for the 100 TB point:
  *  - the image Dataset is scanned ONCE and each pass is a row-local
  *    flatMap fan-out (reference re-reads every DICOM 7× — SURVEY §4.1);
  *  - kernels run inside the task, pixels never shuffle; the only wide
  *    operation in stage 1 is the (tiny) label aggregation feeding the
  *    broadcast join;
  *  - replica fan-out happens INSIDE flatMap (not explode→UDF→explode), so
  *    intermediate 1–8 MB pixel rows of composed passes are never
  *    materialized between operators (SURVEY §4.3's rule idea, achieved by
  *    plain function composition).
  *
  * Pass table (params at reference :299,:337,:374,:412,:451,:494,:535-538):
  *   1 shift(10,10)×5 all          5 scale_bbox(.25)→shift_bbox(50,50)×25 pos
  *   2 shift_bbox(50,50)×25 pos    6 shift(10,10)→shift_bbox(50,50)×5 pos
  *   3 scale_bbox(.25)×25 pos      7 scale_image(.625!)→scale_bbox(.25)
  *   4 scale_image(.0625)×5 all        →shift_bbox(50,50)×5 pos
  * Every output gets a flipped twin (K2). Pass-7's 0.625 (10× pass-4) is
  * preserved verbatim from the reference (:535 — SURVEY §7.4 keeps params).
  * Id grammar: {id}-{opname}[-flipped]-{replica}-{pass} (reference :300-541).
  */
object Augment {

  /** One image row: SURVEY §1.2's ImageExample. */
  final case class ImageEx(
      id: String,
      pixels: Array[Short],
      width: Int,
      height: Int,
      boxes: Seq[Box],
      target: String)

  /** Kernel chain for one pass, closed over image dims. */
  private def chain(pass: Int, w: Int, h: Int): (Array[Short], Seq[Box], Rng) => (Array[Short], Seq[Box]) =
    pass match {
      case 1 => (p, b, r) => Kernels.shiftImage(10, 10, p, w, h, b, r)
      case 2 => (p, b, r) => Kernels.shiftBbox(50, 50, p, w, h, b, r)
      case 3 => (p, b, r) => Kernels.scaleBbox(0.25, p, w, h, b, r)
      case 4 => (p, b, r) => Kernels.scaleImage(0.0625, p, w, h, b, r)
      case 5 => (p, b, r) => {
        val (p1, b1) = Kernels.scaleBbox(0.25, p, w, h, b, r)
        Kernels.shiftBbox(50, 50, p1, w, h, b1, r)
      }
      case 6 => (p, b, r) => {
        val (p1, b1) = Kernels.shiftImage(10, 10, p, w, h, b, r)
        Kernels.shiftBbox(50, 50, p1, w, h, b1, r)
      }
      case 7 => (p, b, r) => {
        val (p1, b1) = Kernels.scaleImage(0.625, p, w, h, b, r) // :535 — 10× pass 4, kept
        val (p2, b2) = Kernels.scaleBbox(0.25, p1, w, h, b1, r)
        Kernels.shiftBbox(50, 50, p2, w, h, b2, r)
      }
    }

  val passNames: Map[Int, String] = Map(
    1 -> "shift", 2 -> "shift-bbox", 3 -> "scale-bbox", 4 -> "scale-image",
    5 -> "scale-shift-bbox", 6 -> "shift-shift", 7 -> "scale-scale-shift-bbox")

  private val passReplicas = Map(1 -> 5, 2 -> 25, 3 -> 25, 4 -> 5, 5 -> 25, 6 -> 5, 7 -> 5)
  private val passPositivesOnly = Map(
    1 -> false, 2 -> true, 3 -> true, 4 -> false, 5 -> true, 6 -> true, 7 -> true)

  /** Expected outputs per input image for a pass (reference multiplier table,
    * SURVEY §2.7): replicas × 2 (flip twin), 0 for negatives of
    * positives-only passes. Box-less positives still pass the `if
    * box_map[id]` gate check (reference :331 etc.). */
  def expectedFanout(pass: Int, hasBoxes: Boolean): Int =
    if (passPositivesOnly(pass) && !hasBoxes) 0 else passReplicas(pass) * 2

  /** Run one pass over the image Dataset: row-local flatMap, no shuffle. */
  def runPass(ds: Dataset[ImageEx], pass: Int): Dataset[ImageEx] = {
    import ds.sparkSession.implicits._
    val op = passNames(pass)
    val replicas = passReplicas(pass)
    val positivesOnly = passPositivesOnly(pass)
    ds.flatMap { img =>
      if (positivesOnly && img.boxes.isEmpty) Iterator.empty
      else {
        val k = chain(pass, img.width, img.height)
        (0 until replicas).iterator.flatMap { x =>
          val rng = new Rng(Kernels.seedFor(img.id, pass, x))
          val (p1, b1) = k(img.pixels, img.boxes, rng)
          val base = img.copy(id = s"${img.id}-$op-$x-$pass", pixels = p1, boxes = b1)
          val (fp, fb) = Kernels.flipImage(p1, img.width, img.height, b1)
          val flip = img.copy(id = s"${img.id}-$op-flipped-$x-$pass", pixels = fp, boxes = fb)
          Iterator(base, flip)
        }
      }
    }
  }

  /** All 7 passes, unioned. Cache the input first if it is expensive to
    * recompute — each pass re-reads it (`.persist` is the caller's call). */
  def allPasses(ds: Dataset[ImageEx]): Dataset[ImageEx] =
    (1 to 7).map(runPass(ds, _)).reduce(_ union _)

  /** Deterministic synthetic image table derived from `part` rows — the
    * harness stand-in for a DICOM directory (FIXTURES.md §1.2): gradient
    * pixels keyed by p_partkey, one box for "positive" parts. */
  def syntheticImages(spark: SparkSession, part: DataFrame, size: Int = 64,
      maxImages: Int = 40): Dataset[ImageEx] = {
    import spark.implicits._
    part.filter(col("p_partkey") <= maxImages)
      .select(col("p_partkey").cast("long"), col("p_size").cast("int"))
      .as[(Long, Int)]
      .map { case (key, psize) =>
        val px = new Array[Short](size * size)
        var i = 0
        while (i < px.length) { px(i) = ((key * 31 + i) % 251).toShort; i += 1 }
        val positive = key % 3 != 0 // deterministic 2/3 positives
        val boxes =
          if (positive) Seq(Box((key % (size / 2)).toInt, (psize % (size / 2)),
            size / 4, size / 4))
          else Seq.empty
        ImageEx(key.toString, px, size, size, boxes, if (positive) "1" else "0")
      }
  }
}
