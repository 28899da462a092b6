package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline surface
  * (BASELINE.md scale design point; SURVEY.md §2.9 extension ops).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs — so the expressions inline into
  * whole-stage codegen and scale linearly with no shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization; empty tokens dropped (leading/trailing space). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Distinct character 3-gram shingles — the unit for Jaccard/MinHash dedup. */
  def shingles3(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(
        transform(sequence(lit(1), length(text) - 2), i => text.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** Adjacent word-bigram bag from an ALREADY-BOUND token-array column
    * (order-preserving, duplicates KEPT — the weighted-set unit for ICWS
    * x238: on a small closed vocabulary the unigram bag is
    * near-degenerate, bigrams restore discrimination).
    *
    * Takes a column, not text: pass `tokens(text)` through a select
    * first so `toks` is an attribute — handing the tokenizer expression
    * straight in makes every element_at in the lambda re-run split()
    * (measured 10 s for the x238 tf build at sf0.1 vs ~1 s bound). */
  def bigramsOfTokens(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2), i =>
        concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Token count (whitespace tokenizer), as BIGINT. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish sub-word proxy: count of word pieces after splitting on
    * non-alphanumerics AND lower/upper boundaries won't apply to this corpus,
    * so: ceil(chars/4) heuristic blended with word count — a deterministic,
    * tokenizer-free estimate of LLM token count. */
  def approxLlmTokens(text: Column): Column =
    greatest(tokenCount(text), ceil(length(text) / 4.0).cast("long"))

  /** GPT-2-style pre-tokenization (simplified to an RE2-safe pattern so the
    * same regex runs in any engine): letter runs, digit runs, and
    * non-alphanumeric-non-space runs each become one pre-token — the unit a
    * BPE vocabulary would then merge within. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def bpePreTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column =
    size(bpePreTokens(text)).cast("long")

  /** Mean token length, rounded to 4 decimals (deterministic across
    * engines). ZERO tokens → NULL, matching the oracle dialect where x/0 is
    * NULL — the unguarded division ANSI-threw DIVIDE_BY_ZERO on
    * empty/whitespace-only documents (AdversarialDataSpec finding). */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0, round(
      aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double") /
        size(t), 4))
  }

  /** Share of characters that are sentence punctuation, rounded 4. */
  def punctRatio(text: Column): Column =
    round(size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)), 4)

  /** Share of tokens drawn from a stopword list, rounded to 4 decimals.
    * ZERO tokens → NULL (same divide-by-zero contract as avgTokenLen). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    when(size(t) > 0, round(
      size(filter(t, x => x.isin(stopwords.map(lit): _*))).cast("double") /
        size(t), 4))
  }

  /** Quality score in [0,1]: penalizes extreme doc length, very short/long
    * mean tokens, and stopword-free text (classic heuristic filters used to
    * clean web corpora). Pure arithmetic — deterministic. */
  def qualityScore(text: Column, stopwords: Seq[String] = Seq("a", "the")): Column = {
    val nTok = tokenCount(text)
    val lenOk = when(nTok.between(5, 100000), lit(1.0)).otherwise(lit(0.0))
    val atl = avgTokenLen(text)
    val atlOk = when(atl.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val swr = stopwordRatio(text, stopwords)
    val swOk = when(swr > 0.0, lit(1.0)).otherwise(lit(0.0))
    round((lenOk + atlOk + swOk) / 3.0, 4)
  }

  /** Per-document repetition / quality signals in the style of the Gopher
    * corpus filters (Rae et al. 2021, "Scaling Language Models", §A1.1 —
    * public paper): word count, distinct-word fraction, stopword fraction,
    * mean word length, fraction of word-bigram slots covered by the single
    * most frequent bigram, and the duplicate word-trigram fraction. All raw
    * (unrounded) doubles; callers round to 4 decimals for cross-engine
    * comparison. One compiled counting pass per row — row-local, no shuffle.
    */
  final case class GopherStats(
      n_words: Long,
      distinct_frac: Double,
      stopword_frac: Double,
      mean_word_len: Double,
      top_bigram_frac: Double,
      dup_trigram_frac: Double)

  val gopherStatsUdf = org.apache.spark.sql.functions.udf { text: String =>
    val toks: Array[String] =
      if (text == null) Array.empty
      else text.trim.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) GopherStats(0L, 0.0, 0.0, 0.0, 0.0, 0.0)
    else {
      val distinct = new java.util.HashSet[String]()
      var stop = 0
      var chars = 0L
      var i = 0
      while (i < n) {
        val w = toks(i)
        distinct.add(w)
        if (w == "a" || w == "the") stop += 1
        chars += w.length
        i += 1
      }
      val topBigramFrac =
        if (n < 2) 0.0
        else {
          val counts = new java.util.HashMap[String, Int]()
          var best = 0
          var j = 0
          while (j < n - 1) {
            val bg = toks(j) + " " + toks(j + 1)
            val c = counts.merge(bg, 1, (a, b) => a + b)
            if (c > best) best = c
            j += 1
          }
          best.toDouble / (n - 1)
        }
      val dupTrigramFrac =
        if (n < 3) 0.0
        else {
          val seen = new java.util.HashSet[String]()
          var dups = 0
          var j = 0
          while (j < n - 2) {
            if (!seen.add(toks(j) + " " + toks(j + 1) + " " + toks(j + 2))) dups += 1
            j += 1
          }
          dups.toDouble / (n - 2)
        }
      GopherStats(n.toLong, distinct.size.toDouble / n, stop.toDouble / n,
        chars.toDouble / n, topBigramFrac, dupTrigramFrac)
    }
  }

  /** Text normalization for dedup pre-processing: lowercase, collapse
    * whitespace runs, trim — the standard canonical form hashed by exact
    * dedup so formatting variants collapse. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Winnowing fingerprints (MOSS-style): the minimum shingle hash of every
    * sliding window of `w` consecutive shingle hashes, deduplicated. Robust
    * local fingerprints — two documents sharing any sufficiently long run
    * share a fingerprint. Compiled kernel over the (ordered, not distinct)
    * shingle hash sequence. */
  val winnowUdf = org.apache.spark.sql.functions.udf {
    (hashes: Seq[Long], w: Int) =>
      if (hashes.length < w || w <= 0) hashes.distinct.sorted.toArray
      else {
        val out = new java.util.TreeSet[java.lang.Long]()
        var i = 0
        while (i + w <= hashes.length) {
          var m = Long.MaxValue
          var j = i
          while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
          out.add(m)
          i += 1
        }
        val arr = new Array[Long](out.size)
        val it = out.iterator(); var k = 0
        while (it.hasNext) { arr(k) = it.next(); k += 1 }
        arr
      }
  }

  /** Winnowing summary emitted by [[winnowStatsUdf]]: distinct-fingerprint
    * count plus min/max/sum (None on unshingleable text) — a compact,
    * order-insensitive digest an oracle can recompute exactly. */
  final case class WinnowStats(n_fingerprints: Long, fp_min: Option[Long],
      fp_max: Option[Long], fp_sum: Option[Long])

  /** Fused winnowing-fingerprint kernel with MOSS positional semantics:
    * windows of `w` slide over the ORDERED, NON-DISTINCT char-trigram hash
    * sequence (deduplicating shingles first — as the round-1 x17 did —
    * changes which fingerprints survive). One compiled pass per row:
    * trigram hashing, monotonic-deque window minima (O(n)), distinct set,
    * stats.
    *
    * The trigram hash is a plain polynomial over UTF-16 code units,
    * h(i) = c(i)*961 + c(i+1)*31 + c(i+2) — no mixing round, deliberately:
    * an external oracle recomputes it from the text alone (SQL `ord()` ==
    * UTF-16 unit for BMP text). Texts shorter than w+2 chars degrade to the
    * distinct hash set, the standard winnowing edge case. */
  val winnowStatsUdf = org.apache.spark.sql.functions.udf {
    (text: String, w: Int) =>
      if (text == null || text.length < 3 || w <= 0) WinnowStats(0L, None, None, None)
      else {
        val n = text.length - 2
        val hs = new Array[Long](n)
        var i = 0
        while (i < n) {
          hs(i) = text.charAt(i).toLong * 961 +
            text.charAt(i + 1).toLong * 31 + text.charAt(i + 2).toLong
          i += 1
        }
        val fp = new java.util.HashSet[Long]()
        if (n < w) {
          var j = 0
          while (j < n) { fp.add(hs(j)); j += 1 }
        } else {
          val dq = new java.util.ArrayDeque[Int]()
          var j = 0
          while (j < n) {
            while (!dq.isEmpty && hs(dq.peekLast()) >= hs(j)) dq.pollLast()
            dq.addLast(j)
            if (dq.peekFirst() <= j - w) dq.pollFirst()
            if (j >= w - 1) fp.add(hs(dq.peekFirst()))
            j += 1
          }
        }
        var mn = Long.MaxValue; var mx = Long.MinValue; var sm = 0L
        val it = fp.iterator()
        while (it.hasNext) {
          val v = it.next(); if (v < mn) mn = v; if (v > mx) mx = v; sm += v
        }
        if (fp.isEmpty) WinnowStats(0L, None, None, None)
        else WinnowStats(fp.size.toLong, Some(mn), Some(mx), Some(sm))
      }
  }

  /** Shannon entropy (bits/char) of the character distribution — the classic
    * cheap perplexity proxy: near-zero for degenerate repetition, ~4.1 for
    * English prose, higher for random noise; corpora are filtered to a
    * [low, high] band. Kernel UDF (one counting pass per row); accumulation
    * order is fixed (by code unit), and callers round to 4 decimals so an
    * oracle summing in any order agrees. */
  val charEntropyUdf = org.apache.spark.sql.functions.udf { text: String =>
    if (text == null || text.isEmpty) 0.0
    else {
      val counts = new java.util.TreeMap[Char, Long]()
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        counts.put(c, counts.getOrDefault(c, 0L) + 1L)
        i += 1
      }
      val n = text.length.toDouble
      var h = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next() / n
        h -= p * (math.log(p) / math.log(2.0))
      }
      h
    }
  }

  /** Polynomial rolling-hash fingerprint of the full text
    * (acc*31 + codepoint, mod 2^31-1) — order-sensitive, so reordered
    * near-dups fingerprint differently while exact copies collide.
    * Served by the native codegen [[graft.plans.RollingFingerprint]]
    * (one UTF-8 byte walk, zero allocation); [[fingerprintHof]] keeps the
    * SQL-replayable fold the oracle mirrors, and ExprPropertySpec pins
    * the two equal on random unicode inputs. */
  def fingerprint(text: Column): Column =
    call_function("rolling_fingerprint", text)

  /** The HOF formulation of [[fingerprint]] — the exact shape DuckDB
    * replays with list_reduce; retained as the property-test twin. */
  def fingerprintHof(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)), lit(2147483647L)))

  /** Language-ID votes: occurrences of each marker word as a token.
    * Returns the vote count for the given marker set. */
  def markerVotes(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*))).cast("long")

  /** Heuristic language ID over marker-word votes. Marker sets are standard
    * high-frequency function words per language; ties resolve in fixed order
    * (en, de, es, fr), unknown when no markers hit. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  /** Char-trigram-profile language ID (the n-gram heuristic proper): cosine
    * similarity of the document's trigram frequency profile against small
    * built-in language profiles. More robust than marker votes on text that
    * lacks function words; pure Scala kernel, used via [[langIdProfileUdf]].
    * Profiles are derived from common-word corpora embedded below (public
    * high-frequency word lists). */
  private val profileCorpora: Map[String, String] = Map(
    "en" -> ("the of and to in is you that it he was for on are as with his they I at " +
      "be this have from or one had by word but not what all were we when your can said"),
    "de" -> ("der die und in den von zu das mit sich des auf ist im dem nicht ein eine " +
      "als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie"),
    "es" -> ("de la que el en y a los del se las por un para con no una su al lo como " +
      "mas pero sus le ya o este si porque esta entre cuando muy sin sobre tambien me"),
    "fr" -> ("de la le et les des en un du une que est pour qui dans a par plus pas au " +
      "sur ne se ce il sont la vous je avec son ils mais comme ou si leur y ont ete"))

  private def trigramProfile(s: String): Map[String, Double] = {
    val t = s.toLowerCase
    val counts = collection.mutable.Map.empty[String, Double]
    var i = 0
    while (i + 3 <= t.length) {
      val g = t.substring(i, i + 3)
      if (!g.contains("  ")) counts(g) = counts.getOrElse(g, 0.0) + 1.0
      i += 1
    }
    val norm = math.sqrt(counts.values.map(v => v * v).sum)
    if (norm == 0) Map.empty else counts.map { case (k, v) => k -> v / norm }.toMap
  }

  private lazy val langProfiles: Seq[(String, Map[String, Double])] =
    profileCorpora.toSeq.sortBy(_._1).map { case (l, c) => l -> trigramProfile(c) }

  /** Classify a string by trigram-profile cosine; "und" when nothing scores
    * above `minScore`. Deterministic (fixed profiles, fixed tie order). */
  def classifyByProfile(text: String, minScore: Double = 0.05): String = {
    if (text == null || text.length < 3) return "und"
    val p = trigramProfile(text)
    if (p.isEmpty) return "und"
    val scored = langProfiles.map { case (lang, prof) =>
      val dot = p.iterator.map { case (g, v) => v * prof.getOrElse(g, 0.0) }.sum
      (lang, dot)
    }
    val (bestLang, bestScore) = scored.maxBy { case (l, sc) => (sc, l) }
    if (bestScore >= minScore) bestLang else "und"
  }

  val langIdProfileUdf =
    org.apache.spark.sql.functions.udf((s: String) => classifyByProfile(s))

  def langId(text: Column): Column = {
    val votes = langMarkers.map { case (lang, m) => lang -> markerVotes(text, m) }
    val best = votes.map(_._2).reduce((a, b) => greatest(a, b))
    votes.foldRight(lit("und")) { case ((lang, v), acc) =>
      when(v > 0 && v === best, lit(lang)).otherwise(acc)
    }
  }

  /** Overlapping sliding token windows — the chunking stage of an
    * embed-and-index pipeline (fixed-size passages with overlap so no
    * answer span straddles a chunk boundary unseen). Declarative HOF
    * (sequence → transform → slice), fully codegen'd, no UDF: returns
    * ARRAY<STRUCT<idx INT, chunk STRING>> where chunk k covers tokens
    * [k·stride, k·stride + window); the tail chunk may be shorter, docs
    * shorter than one window yield a single chunk. */
  def slidingChunks(toks: Column, window: Int, stride: Int): Column = {
    val n = size(toks)
    val nChunks = when(n <= window, lit(1L))
      .otherwise(ceil((n - lit(window)).cast("double") / stride).cast("long") + 1L)
    transform(sequence(lit(0L), nChunks - 1L), k =>
      struct(k.cast("int").as("idx"),
        concat_ws(" ", slice(toks, (k * stride).cast("int") + 1, lit(window)))
          .as("chunk")))
  }

  /** Within-doc n-gram repetition fractions (the Gopher §A1.1 repetition
    * filters, Rae et al. 2021, public — templated/boilerplate docs repeat
    * internal n-grams long before they duplicate ACROSS docs, so these
    * row-local signals gate what document-level dedup cannot see):
    * (_1) fraction of bigram occurrences whose bigram occurs >1 time in
    * the doc, (_2) occurrence share of the single most frequent bigram,
    * (_3) same as _1 for trigrams. Raw ratios — callers round. One hash
    * map pass per row over materialized token arrays (generic Seq access
    * in the loop is the measured 45x boxing trap). */
  val repetitionUdf = udf { toksIn: Seq[String] =>
    val toks = toksIn.toArray
    def fracs(n: Int): (Double, Double) = {
      val total = toks.length - n + 1
      if (total <= 0) (0.0, 0.0)
      else {
        val counts = new java.util.HashMap[String, Int]()
        var i = 0
        while (i < total) {
          val sb = new StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          counts.merge(sb.toString, 1, Integer.sum)
          i += 1
        }
        var dup = 0L; var top = 0
        val it = counts.values().iterator()
        while (it.hasNext) {
          val c = it.next()
          if (c > 1) dup += c
          if (c > top) top = c
        }
        (dup.toDouble / total, top.toDouble / total)
      }
    }
    val (dup2, top2) = fracs(2)
    val (dup3, _) = fracs(3)
    (dup2, top2, dup3)
  }
}
