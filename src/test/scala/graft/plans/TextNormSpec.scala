package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** UnicodeNormalize / RepairMojibake — eval'd through the codegen path
  * (df.select over a real plan) so doGenCode is what's under test. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def one(input: String, exprSql: String): String = {
    GraftFunctions.register(spark)
    Seq(input).toDF("s").select(expr(exprSql).as("r")).as[String].head()
  }

  test("nfc_normalize composes combining sequences") {
    assert(one("Café Å", "nfc_normalize(s)") === "Café Å")
    // already-NFC text is a no-op
    assert(one("Café", "nfc_normalize(s)") === "Café")
    assert(one("plain ascii", "nfc_normalize(s)") === "plain ascii")
  }

  test("nfkc_normalize folds compatibility forms NFC keeps") {
    // U+FB01 LATIN SMALL LIGATURE FI and U+2460 CIRCLED DIGIT ONE
    assert(one("ﬁle ①", "nfkc_normalize(s)") === "file 1")
    assert(one("ﬁle", "nfc_normalize(s)") === "ﬁle")
  }

  test("repair_mojibake undoes a windows-1252 double-decode only") {
    // "café’s" damaged: é → Ã©, ’ → â€™
    assert(one("cafÃ©â€™s", "repair_mojibake(s)")
      === "café’s")
    // clean UTF-8 text with a real é must NOT be corrupted
    assert(one("café", "repair_mojibake(s)") === "café")
    // ASCII round-trips to itself → unchanged
    assert(one("plain ascii", "repair_mojibake(s)") === "plain ascii")
    // characters outside cp1252 (CJK) → encoder REPORTs → unchanged
    assert(one("你好", "repair_mojibake(s)") === "你好")
  }

  test("normalize expressions propagate null") {
    GraftFunctions.register(spark)
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "s")
      .select(expr("nfc_normalize(s)").as("a"), expr("repair_mojibake(s)").as("b"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
