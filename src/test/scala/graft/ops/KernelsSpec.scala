package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import Kernels.{Box, Rng}

/** K1–K5 unit + property tests (SURVEY §5.1-5.2): exact-pixel fixtures for
  * shift/flip, geometric invariants under ScalaCheck for the rest. Pure
  * functions — no Spark session needed. */
class KernelsSpec extends AnyFunSuite {

  /** Property check over a deterministic seed sweep (scalacheck bridge is
    * not in the offline cache; an explicit sweep is just as rigorous here). */
  private def forAllSeeds(f: Long => Unit): Unit = (0L until 200L).foreach(f)

  private def grid(w: Int, h: Int): Array[Short] =
    Array.tabulate(w * h)(i => i.toShort)

  /** RNG whose first draws are fixed — for exact-pixel assertions. */
  private def rngWithSeed(seed: Long) = new Rng(seed)

  test("flip of 3x3 mirrors each row; boxes mirror as w - x - bw") {
    val px = grid(3, 3) // 0 1 2 / 3 4 5 / 6 7 8
    val (out, boxes) = Kernels.flipImage(px, 3, 3, Seq(Box(0, 0, 1, 1)))
    assert(out.toSeq === Seq[Short](2, 1, 0, 5, 4, 3, 8, 7, 6))
    assert(boxes === Seq(Box(2, 0, 1, 1)))
  }

  test("flip ∘ flip = identity (pixels and boxes)") {
    for (w <- 2 to 12; h <- 2 to 12) {
      val px = Array.tabulate(w * h)(i => ((i * 7) % 251).toShort)
      val boxes = Seq(Box(0, 0, math.max(1, w / 2), math.max(1, h / 2)))
      val (f1, b1) = Kernels.flipImage(px, w, h, boxes)
      val (f2, b2) = Kernels.flipImage(f1, w, h, b1)
      assert(f2.toSeq === px.toSeq)
      assert(b2 === boxes)
    }
  }

  test("shift translates pixels with zero fill and offsets boxes") {
    // deterministic: find the (rx, ry) the seeded RNG produced, then assert
    val px = grid(4, 4)
    val rng = rngWithSeed(123)
    val (out, boxes) = Kernels.shiftImage(1, 1, px, 4, 4, Seq(Box(1, 1, 2, 2)), rng)
    val rng2 = rngWithSeed(123)
    val rx = rng2.randint(-1, 1); val ry = rng2.randint(-1, 1)
    // every in-bounds destination pixel equals source shifted by (rx, ry)
    for (r <- 0 until 4; c <- 0 until 4) {
      val (sr, sc) = (r - ry, c - rx)
      val expected: Short =
        if (sr >= 0 && sr < 4 && sc >= 0 && sc < 4) px(sr * 4 + sc) else 0
      assert(out(r * 4 + c) === expected, s"at ($r,$c) shift ($rx,$ry)")
    }
    assert(boxes === Seq(Box(1 + rx, 1 + ry, 2, 2)))
  }

  test("shift preserves pixel multiset minus clipped border") {
    forAllSeeds { seed =>
      val px = grid(8, 8)
      val (out, _) = Kernels.shiftImage(2, 2, px, 8, 8, Seq.empty, new Rng(seed))
      val nonZeroOut = out.filter(_ != 0).toSeq.sorted
      // every surviving pixel value came from the input
      assert(nonZeroOut.toSet.subsetOf(px.toSet))
    }
  }

  test("shiftBbox keeps boxes in-bounds at origin, never increases count") {
    forAllSeeds { seed =>
      val boxes = Seq(Box(10, 10, 8, 8), Box(40, 40, 10, 6))
      val (out, nb) = Kernels.shiftBbox(20, 20, grid(64, 64), 64, 64, boxes, new Rng(seed))
      assert(nb.length <= boxes.length)
      nb.foreach { b => assert(b.x >= 0 && b.y >= 0) } // rejection-sampled ≥ 0
      assert(out.length === 64 * 64)
    }
  }

  test("shiftBbox moves the patch content with the box") {
    val w = 16
    val px = new Array[Short](w * w)
    // bright 2x2 patch at (4,4)
    px(4 * w + 4) = 100; px(4 * w + 5) = 101
    px(5 * w + 4) = 102; px(5 * w + 5) = 103
    val (out, nb) = Kernels.shiftBbox(3, 3, px, w, w, Seq(Box(4, 4, 2, 2)), new Rng(7))
    assert(nb.length === 1)
    val b = nb.head
    assert(out(b.y * w + b.x) === 100)
    assert(out(b.y * w + b.x + 1) === 101)
    assert(out((b.y + 1) * w + b.x) === 102)
    // the old location was zeroed (unless re-covered by the paste)
    if (math.abs(b.x - 4) > 1 || math.abs(b.y - 4) > 1)
      assert(out(4 * w + 4) === 0)
  }

  test("scaleBbox: emitted box within bounds, scaled dims match rint(w*rf)") {
    forAllSeeds { seed =>
      val (_, nb) = Kernels.scaleBbox(0.25, grid(64, 64), 64, 64,
        Seq(Box(20, 20, 12, 10)), new Rng(seed))
      assert(nb.length === 1)
      val b = nb.head
      assert(b.x >= 0 && b.y >= 0)
      assert(b.w >= math.rint(12 / 1.25).toInt && b.w <= math.rint(12 * 1.25).toInt)
      assert(b.h >= math.rint(10 / 1.25).toInt && b.h <= math.rint(10 * 1.25).toInt)
    }
  }

  test("scaleImage preserves dims, transforms boxes about the center") {
    forAllSeeds { seed =>
      val (out, nb) = Kernels.scaleImage(0.0625, grid(64, 64), 64, 64,
        Seq(Box(10, 10, 20, 20)), new Rng(seed))
      assert(out.length === 64 * 64)
      assert(nb.length === 1)
      // box center distance from image center shrinks/grows with rf but the
      // box must stay a valid rectangle
      assert(nb.head.w > 0 && nb.head.h > 0)
    }
  }

  test("identical seed ⇒ identical output; different seed ⇒ different draw") {
    val px = grid(32, 32)
    val boxes = Seq(Box(8, 8, 6, 6))
    val a = Kernels.scaleBbox(0.25, px, 32, 32, boxes, new Rng(99))
    val b = Kernels.scaleBbox(0.25, px, 32, 32, boxes, new Rng(99))
    assert(a._1.toSeq === b._1.toSeq && a._2 === b._2)
    val seeds = (0L until 50L).map(s =>
      Kernels.shiftImage(10, 10, px, 32, 32, boxes, new Rng(s))._2.head)
    assert(seeds.distinct.length > 1)
  }

  test("seedFor is stable and discriminates pass/replica/id") {
    assert(Kernels.seedFor("p1", 1, 0) === Kernels.seedFor("p1", 1, 0))
    assert(Kernels.seedFor("p1", 1, 0) !== Kernels.seedFor("p1", 1, 1))
    assert(Kernels.seedFor("p1", 1, 0) !== Kernels.seedFor("p1", 2, 0))
    assert(Kernels.seedFor("p1", 1, 0) !== Kernels.seedFor("p2", 1, 0))
  }
}
