package graft.ops

import graft.{SparkSpec, Tables}

class AugmentSpec extends SparkSpec {
  import spark.implicits._

  private def images = Augment.syntheticImages(spark, Tables.part(spark, sfDir),
    size = 32, maxImages = 9)

  test("pass fan-out matches the reference multiplier table") {
    val imgs = images.cache()
    val byInput = imgs.collect().map(i => i.id -> i.boxes.nonEmpty).toMap
    for (pass <- 1 to 7) {
      val out = Augment.runPass(imgs, pass).collect()
      val expected = byInput.map { case (_, pos) => Augment.expectedFanout(pass, pos) }.sum
      assert(out.length === expected, s"pass $pass")
      // flip twins pair off exactly
      assert(out.count(_.id.contains("-flipped-")) === out.length / 2)
      // id grammar: {src}-{op}[-flipped]-{replica}-{pass}
      out.foreach { ex =>
        assert(ex.id.endsWith(s"-$pass"), ex.id)
        assert(ex.id.contains(s"-${Augment.passNames(pass)}"), ex.id)
      }
    }
  }

  test("augmented output is deterministic across runs") {
    val a = Augment.runPass(images, 3).collect().map(e => e.id -> e.pixels.toSeq).toMap
    val b = Augment.runPass(images, 3).collect().map(e => e.id -> e.pixels.toSeq).toMap
    assert(a === b)
  }

  test("flip twin is the exact mirror of its base image") {
    val out = Augment.runPass(images, 1).collect()
    val byId = out.map(e => e.id -> e).toMap
    val base = out.find(!_.id.contains("flipped")).get
    val twinId = base.id.replaceFirst("-shift-", "-shift-flipped-")
    val twin = byId(twinId)
    val (mirror, _) = Kernels.flipImage(base.pixels, base.width, base.height, base.boxes)
    assert(twin.pixels.toSeq === mirror.toSeq)
  }

  test("positives-only passes emit nothing for negative images") {
    val negs = images.filter(_.boxes.isEmpty)
    assert(negs.count() > 0)
    assert(Augment.runPass(negs, 2).count() === 0)
    assert(Augment.runPass(negs, 1).count() === negs.count() * 10)
  }
}
