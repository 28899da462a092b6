package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class LcpSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("lcp: ascii, identical, disjoint, prefix-of, empty") {
    assert(LcpChars.lcp(u("abcdef"), u("abcxyz")) === 3)
    assert(LcpChars.lcp(u("same"), u("same")) === 4)
    assert(LcpChars.lcp(u("abc"), u("xyz")) === 0)
    assert(LcpChars.lcp(u("ab"), u("abette")) === 2)
    assert(LcpChars.lcp(u(""), u("abc")) === 0)
  }

  test("lcp counts CHARACTERS, not bytes, and never splits a codepoint") {
    // é = 2 bytes, 日 = 3 bytes
    assert(LcpChars.lcp(u("héllo"), u("héllx")) === 4)
    assert(LcpChars.lcp(u("日本語"), u("日本学")) === 2)
    // common byte prefix ends INSIDE the 3rd codepoint (語 vs 誤 share
    // their first UTF-8 byte) — must not count the partial char
    assert(LcpChars.lcp(u("日本語"), u("日本誤")) === 2)
  }

  test("expression: codegen matches eval and SQL equal-k-prefix counting") {
    GraftFunctions.register(spark)
    val pairs = Seq(("abcdef", "abcxyz"), ("same", "same"), ("abc", "xyz"),
      ("héllo", "héllx"), ("日本語", "日本誤"), ("ab", "abette"))
    val df = pairs.toDF("a", "b")
      .withColumn("native", expr("lcp_chars(a, b)"))
      // the SQL formulation the x99 oracle replays: count the k whose
      // k-prefixes are equal, capped at the shorter length
      .withColumn("sql", least(length(col("a")), length(col("b")),
        size(filter(sequence(lit(1), lit(12)),
          k => col("a").substr(lit(1), k) === col("b").substr(lit(1), k)))))
    df.collect().foreach { r =>
      assert(r.getInt(2) === r.getInt(3),
        s"${r.getString(0)} vs ${r.getString(1)}")
      assert(r.getInt(2) ===
        LcpChars.lcp(u(r.getString(0)), u(r.getString(1))))
    }
  }
}
