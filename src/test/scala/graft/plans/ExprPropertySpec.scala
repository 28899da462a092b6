package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property sweeps for the native codegen expressions, run through REAL
  * DataFrame execution (whole-stage codegen path) against plain-Scala
  * reference implementations. The oracle queries exercise these on corpus
  * data; this spec pins their contracts on adversarial shapes — empty
  * arrays, singletons, disjoint/identical inputs, mismatched lengths —
  * via a deterministic seed sweep (the KernelsSpec device; the scalacheck
  * bridge is not in the offline cache). */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  test("sorted_intersect_size == set-intersection size over 200 random shapes") {
    GraftFunctions.register(spark)
    val rnd = new java.util.Random(42)
    def arr(): Array[Long] = {
      val n = rnd.nextInt(40) // includes 0: empty-array edge
      Array.fill(n)(rnd.nextInt(60).toLong).distinct.sorted
    }
    val cases = (0 until 200).map(i => (i.toLong, arr(), arr())) :+
      (200L, Array.empty[Long], Array.empty[Long]) :+
      (201L, Array(7L), Array(7L))
    val expected = cases.map { case (id, a, b) =>
      id -> a.toSet.intersect(b.toSet).size
    }.toMap
    val got = cases.toDF("id", "a", "b")
      .select($"id", expr("sorted_intersect_size(a, b)").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    expected.foreach { case (id, e) =>
      assert(got(id) === e, s"case $id: expected $e got ${got(id)}")
    }
  }

  test("float_dot == sequential double accumulation; length mismatch is NULL") {
    GraftFunctions.register(spark)
    val rnd = new java.util.Random(7)
    def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextGaussian().toFloat)
    val cases = (0 until 200).map { i =>
      val n = rnd.nextInt(80)
      (i.toLong, vec(n), vec(n))
    }
    val expected = cases.map { case (id, a, b) =>
      // the expression's documented contract: double accumulation
      // ascending by index — compare EXACTLY, not within epsilon
      var acc = 0.0
      var j = 0
      while (j < a.length) { acc += a(j).toDouble * b(j).toDouble; j += 1 }
      id -> acc
    }.toMap
    val got = cases.toDF("id", "a", "b")
      .select($"id", expr("float_dot(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    expected.foreach { case (id, e) =>
      assert(got(id) === e, s"case $id: expected $e got ${got(id)}")
    }
    val mismatched = Seq((0L, vec(8), vec(9))).toDF("id", "a", "b")
      .select(expr("float_dot(a, b)").as("d")).collect()
    assert(mismatched.head.isNullAt(0),
      "mismatched lengths must yield NULL, not a partial dot")
  }

  test("rolling_fingerprint == the SQL HOF fold over 200 random unicode strings") {
    GraftFunctions.register(spark)
    val rnd = new java.util.Random(99)
    // mixed-plane alphabet: ASCII, Latin-1, CJK, an astral code point —
    // exercises every UTF-8 sequence length the byte walk decodes
    val alphabet = "abc XYZ09üß€漢字😀".toCharArray
    def str(): String = {
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val c = alphabet(rnd.nextInt(alphabet.length))
        // never emit a lone surrogate: take the pair together
        if (Character.isHighSurrogate(c)) { sb.append("😀"); i += 1 }
        else if (!Character.isLowSurrogate(c)) sb.append(c)
        i += 1
      }
      sb.toString
    }
    val cases = (0 until 200).map(i => (i.toLong, str())) :+ (200L, "")
    val df = cases.toDF("id", "text")
    val native = df.select($"id", expr("rolling_fingerprint(text)").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.select($"id",
        graft.functions.TextFunctions.fingerprintHof($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // plain-Scala reference: fold over code points
    val local = cases.map { case (id, s) =>
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      id -> acc
    }.toMap
    cases.foreach { case (id, s) =>
      assert(native(id) === local(id), s"native vs local for '$s'")
      assert(hof(id) === local(id), s"HOF vs local for '$s'")
    }
  }
}
