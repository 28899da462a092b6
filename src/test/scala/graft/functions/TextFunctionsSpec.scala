package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokens drops empties and splits on any whitespace") {
    val t = one("  the quick\t brown\nfox ")
      .select(TextFunctions.tokens($"text")).as[Seq[String]].head()
    assert(t === Seq("the", "quick", "brown", "fox"))
  }

  test("shingles3 of 'abcd' is {abc, bcd}; short strings empty") {
    assert(one("abcd").select(TextFunctions.shingles3($"text"))
      .as[Seq[String]].head() === Seq("abc", "bcd"))
    assert(one("ab").select(TextFunctions.shingles3($"text"))
      .as[Seq[String]].head() === Seq.empty)
  }

  test("fingerprint: exact polynomial rolling hash, order-sensitive") {
    graft.plans.GraftFunctions.register(spark)
    val expected = "ab".foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L)
    assert(one("ab").select(TextFunctions.fingerprint($"text"))
      .as[Long].head() === expected)
    val fpAb = one("ab").select(TextFunctions.fingerprint($"text")).as[Long].head()
    val fpBa = one("ba").select(TextFunctions.fingerprint($"text")).as[Long].head()
    assert(fpAb !== fpBa)
  }

  test("normalized collapses case/whitespace variants to one form") {
    val df = Seq("The  Quick\tFox", "the quick fox ", "THE QUICK  FOX").toDF("text")
    val forms = df.select(TextFunctions.normalized($"text")).as[String]
      .collect().toSet
    assert(forms === Set("the quick fox"))
  }

  test("winnowing: shared runs share fingerprints; window-min invariant") {
    val h1 = Seq(9L, 3L, 7L, 5L, 8L, 2L, 6L)
    val df = Seq(Tuple1(h1)).toDF("h")
    val fp = df.select(TextFunctions.winnowUdf($"h", lit(3))).as[Seq[Long]].head()
    // windows of 3: min(9,3,7)=3, min(3,7,5)=3, min(7,5,8)=5, min(5,8,2)=2,
    // min(8,2,6)=2 → {2,3,5}
    assert(fp === Seq(2L, 3L, 5L))
    // short input falls back to distinct sorted
    val short = Seq(Tuple1(Seq(4L, 1L))).toDF("h")
      .select(TextFunctions.winnowUdf($"h", lit(3))).as[Seq[Long]].head()
    assert(short === Seq(1L, 4L))
  }

  test("winnowStats: kernel equals positional brute force; shared runs collide") {
    // brute-force reference: positional trigram hashes, window minima, distinct
    def brute(text: String, w: Int): Set[Long] = {
      val hs = (0 until text.length - 2).map(i =>
        text.charAt(i).toLong * 961 + text.charAt(i + 1).toLong * 31 + text.charAt(i + 2))
      if (hs.isEmpty) Set.empty
      else if (hs.length < w) hs.toSet
      else (0 to hs.length - w).map(i => hs.slice(i, i + w).min).toSet
    }
    def viaUdf(text: String, w: Int): (Long, Option[Long], Option[Long], Option[Long]) = {
      val r = Seq(text).toDF("text")
        .select(TextFunctions.winnowStatsUdf($"text", lit(w)).as("st"))
        .select("st.*").head()
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }
    // kernel == brute on: plain text, REPEATED text (positional windows must
    // not collapse — the round-1 distinct-shingle formulation did), short
    // text (< w shingles), CJK (BMP code units), empty
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcabcabcabcabcabc",
      "abcd",
      "中文文本测试文本中文",
      "xy")
    samples.foreach { s =>
      val exp = brute(s, 8)
      val (n, mn, mx, sm) = viaUdf(s, 8)
      assert(n === exp.size, s"count for '$s'")
      assert(mn === (if (exp.isEmpty) None else Some(exp.min)))
      assert(mx === (if (exp.isEmpty) None else Some(exp.max)))
      assert(sm === (if (exp.isEmpty) None else Some(exp.sum)))
    }
    // MOSS property: docs sharing a run of >= w+2 consecutive shingles share
    // a fingerprint (kernel == brute above makes brute a faithful proxy)
    val shared = "COMMONSHAREDSEGMENTXYZ" // 22 chars => 20 shingles >= 10
    val f1 = brute("aaaa " + shared + " bbbb", 8)
    val f2 = brute("zzzz " + shared + " qqqq", 8)
    assert(f1.intersect(f2).nonEmpty)
  }

  test("repetition fractions: closed-form values on crafted docs") {
    def rep(text: String): (Double, Double, Double) =
      one(text).select(TextFunctions.repetitionUdf(
          TextFunctions.tokens($"text")).as("r"))
        .select($"r._1", $"r._2", $"r._3")
        .as[(Double, Double, Double)].head()
    // "a b a b a": bigrams = ab, ba, ab, ba → all 4 occurrences duplicated,
    // top bigram (ab) occurs 2 of 4; trigrams = aba, bab, aba → 2 of 3
    assert(rep("a b a b a") === ((1.0, 0.5, 2.0 / 3)))
    // all-distinct text: zero duplication, top bigram share = 1/total
    val (d2, t2, d3) = rep("one two three four")
    assert(d2 === 0.0 && d3 === 0.0)
    assert(math.abs(t2 - 1.0 / 3) < 1e-12)
    // fully repeated token: every n-gram identical
    assert(rep("x x x x") === ((1.0, 1.0, 1.0)))
  }

  test("slidingChunks: overlap invariant and tail handling") {
    def chunks(text: String, w: Int, s: Int): Seq[(Int, String)] =
      one(text).select(explode(TextFunctions.slidingChunks(
          TextFunctions.tokens($"text"), w, s)).as("c"))
        .select($"c.idx", $"c.chunk").as[(Int, String)].collect().toSeq
    // 7 tokens, window 3, stride 2: starts 0,2,4 cover [0,3),[2,5),[4,7)
    val c = chunks("t0 t1 t2 t3 t4 t5 t6", 3, 2)
    assert(c === Seq((0, "t0 t1 t2"), (1, "t2 t3 t4"), (2, "t4 t5 t6")))
    // every adjacent pair overlaps by window - stride tokens
    c.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a.split(" ").takeRight(1).toSeq === b.split(" ").take(1).toSeq) }
    // tail shorter than a window still emitted; short doc = one chunk
    assert(chunks("a b c d e", 3, 3) === Seq((0, "a b c"), (1, "d e")))
    assert(chunks("a b", 3, 2) === Seq((0, "a b")))
  }

  test("langId votes with fixed priority, und when no markers") {
    assert(one("the cat is on a mat").select(TextFunctions.langId($"text"))
      .as[String].head() === "en")
    assert(one("der hund und die katze").select(TextFunctions.langId($"text"))
      .as[String].head() === "de")
    assert(one("xyz qrs tuv").select(TextFunctions.langId($"text"))
      .as[String].head() === "und")
  }

  test("trigram-profile langid classifies real sentences") {
    assert(TextFunctions.classifyByProfile(
      "the cat sat on the mat and it was happy with that") === "en")
    assert(TextFunctions.classifyByProfile(
      "der hund und die katze sind nicht in dem haus mit einer maus") === "de")
    assert(TextFunctions.classifyByProfile(
      "el perro y el gato estan en la casa con una taza para los dos") === "es")
    assert(TextFunctions.classifyByProfile(
      "le chien et le chat sont dans la maison avec une tasse pour vous") === "fr")
    assert(TextFunctions.classifyByProfile("zzzz qqqq xxxx") === "und")
    assert(TextFunctions.classifyByProfile("") === "und")
  }

  test("quality score: clean text 1.0, degenerate text lower") {
    assert(one("the quick brown fox jumps over a lazy dog")
      .select(TextFunctions.qualityScore($"text")).as[Double].head() === 1.0)
    // two tokens -> fails length gate; no stopwords -> fails stopword gate
    assert(one("xx yy")
      .select(TextFunctions.qualityScore($"text")).as[Double].head() < 0.5)
  }

  test("gopher stats: hand-computed fixture, repeated-bigram detection") {
    val g = one("a a b the")
      .select(TextFunctions.gopherStatsUdf($"text").as("g")).select("g.*")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(g._1 === 4L)                     // n_words
    assert(g._2 === 0.75)                   // distinct: {a, b, the} / 4
    assert(g._3 === 0.75)                   // stopwords: a, a, the / 4
    assert(g._4 === 1.5)                    // mean len: (1+1+1+3)/4
    assert(math.abs(g._5 - 1.0 / 3) < 1e-12) // bigrams all unique: top 1 of 3
    assert(g._6 === 0.0)                    // no duplicate trigram
    // "x y x y x y x y": top bigram "x y" covers 4 of 7 slots; trigram dups
    val rep = one("x y x y x y x y")
      .select(TextFunctions.gopherStatsUdf($"text").as("g")).select("g.*")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(math.abs(rep._5 - 4.0 / 7) < 1e-12)
    assert(rep._6 === 4.0 / 6) // 6 trigrams, 2 distinct
    // degenerate inputs don't throw
    assert(one("").select(TextFunctions.gopherStatsUdf($"text"))
      .collect().length === 1)
  }
}
