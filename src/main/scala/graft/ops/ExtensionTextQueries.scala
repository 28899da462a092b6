package graft.ops

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions
import graft.ops.ExtensionQueries._

/** Text-analysis family: quality scoring, language ID, tokenization/BPE,
  * n-gram LMs, keyword extraction, and corpus statistics.
  *
  * Split out of ExtensionQueries (round 14: the single file had grown to
  * 21k lines); the shared helpers (context/pair builders, oracle CTEs,
  * sink-cleanup hooks) stay in [[ExtensionQueries]] and are imported
  * wholesale. Registered via ExtensionQueries.all — same names, same
  * specs, zero behavior change.
  */
object ExtensionTextQueries {

  def all: Seq[QuerySpec] = Seq(
  // ------------------------------------------------------ text analysis
    QuerySpec(
      "x7_text_quality",
      (s, dir) => {
        val t = TextFunctions.tokens(col("text"))
        Tables.documents(s, dir).select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_distinct"),
          TextFunctions.avgTokenLen(col("text")).as("avg_token_len"),
          TextFunctions.stopwordRatio(col("text"), STOPWORDS).as("stopword_ratio"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"),
          TextFunctions.qualityScore(col("text"), STOPWORDS).as("quality"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text AS txt,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS BIGINT) AS n_tokens,
             |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             |    round(CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks), 4) AS avg_token_len,
             |    round(CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
             |    round(CAST(len(regexp_extract_all(txt, '[.,;:!?]')) AS DOUBLE)
             |          / greatest(length(txt), 1), 4) AS punct_ratio
             |  FROM t)
             |SELECT doc_id, n_tokens, n_distinct, avg_token_len, stopword_ratio, punct_ratio,
             |  round(((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
             |       + (CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
             |       + (CASE WHEN stopword_ratio > 0.0 THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
             |FROM m ORDER BY doc_id""".stripMargin)),
    QuerySpec(
      "x8_langid",
      (s, dir) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          TextFunctions.langId(col("text")).as("predicted"),
          TextFunctions.markerVotes(col("text"), TextFunctions.langMarkers.head._2)
            .as("en_votes"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |v AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(toks, x -> x IN ('the','a','and','of','to','is'))) AS BIGINT) AS v_en,
             |    CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS BIGINT) AS v_de,
             |    CAST(len(list_filter(toks, x -> x IN ('el','la','los','las','es','una'))) AS BIGINT) AS v_es,
             |    CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','une'))) AS BIGINT) AS v_fr
             |  FROM t)
             |SELECT doc_id,
             |  CASE WHEN v_en > 0 AND v_en >= greatest(v_en, v_de, v_es, v_fr) THEN 'en'
             |       WHEN v_de > 0 AND v_de >= greatest(v_en, v_de, v_es, v_fr) THEN 'de'
             |       WHEN v_es > 0 AND v_es >= greatest(v_en, v_de, v_es, v_fr) THEN 'es'
             |       WHEN v_fr > 0 AND v_fr >= greatest(v_en, v_de, v_es, v_fr) THEN 'fr'
             |       ELSE 'und' END AS predicted,
             |  v_en AS en_votes
             |FROM v ORDER BY doc_id""".stripMargin)),
    QuerySpec(
      "x9_token_freq",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy("token"),
      Some("""SELECT token, COUNT(*) AS n FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                            x -> x <> '')) AS token
             |  FROM documents)
             |GROUP BY token ORDER BY token""".stripMargin)),
    // BPE-ish pre-token counting (letter/digit/punct runs).
    QuerySpec(
      "x14_bpe_tokens",
      (s, dir) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe"),
          TextFunctions.approxLlmTokens(col("text")).as("n_llm_est"),
          TextFunctions.tokenCount(col("text")).as("n_ws"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${TextFunctions.bpePattern}')) AS BIGINT) AS n_bpe,
              |  CAST(greatest(
              |    len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')),
              |    CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS n_llm_est,
              |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_ws
              |FROM documents ORDER BY doc_id""".stripMargin)),
    // PII scrubbing: pattern counts + the digest of the redacted text, so
    // the oracle verifies the REDACTION itself, not just the counts.
    // Patterns are RE2-safe so the same regex runs in any engine.
    QuerySpec(
      "x20_pii_redact",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val digits = "[0-9]{4,}"
        Tables.documents(s, dir).select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(digits), lit(0)))
            .cast("long").as("n_digit_runs"),
          sha2(regexp_replace(
            regexp_replace(col("text"), email, "<EMAIL>"),
            digits, "<NUM>").cast("binary"), 256).as("redacted_digest"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS BIGINT) AS n_digit_runs,
             |  sha256(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '[0-9]{4,}', '<NUM>', 'g')) AS redacted_digest
             |FROM documents ORDER BY doc_id""".stripMargin)),
    // Character-entropy quality filter (the classic cheap perplexity proxy:
    // C4/RefinedWeb-style pipelines band-filter on it). Kernel UDF; the
    // oracle recomputes H from a char-frequency group-by, and the 4-decimal
    // round absorbs summation-order ULPs.
    QuerySpec(
      "x23_char_entropy",
      (s, dir) =>
        Tables.documents(s, dir)
          // bind the kernel once; band-check the ROUNDED value so both
          // engines compare the identical 4-decimal number at the boundary
          .select(col("doc_id"),
            round(TextFunctions.charEntropyUdf(col("text")), 4).as("entropy_bits"))
          .select(col("doc_id"), col("entropy_bits"),
            col("entropy_bits").between(2.5, 5.5).cast("long").as("passes_band"))
          .orderBy("doc_id"),
      Some("""WITH c AS (
             |  SELECT doc_id, length(text) AS n, unnest(string_split(text, '')) AS ch
             |  FROM documents),
             |f AS (SELECT doc_id, n, COUNT(*) AS cnt FROM c GROUP BY doc_id, n, ch),
             |h AS (
             |  SELECT doc_id,
             |    round(-SUM((CAST(cnt AS DOUBLE)/n) * log2(CAST(cnt AS DOUBLE)/n)), 4)
             |      AS entropy_bits
             |  FROM f GROUP BY doc_id)
             |SELECT doc_id, entropy_bits,
             |  CAST(CASE WHEN entropy_bits BETWEEN 2.5 AND 5.5 THEN 1 ELSE 0 END AS BIGINT)
             |    AS passes_band
             |FROM h ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------- quality (Gopher-style)
    // Repetition/quality signals from the Gopher corpus filters (public
    // paper, Rae et al. 2021 §A1.1) + a keep gate over the ROUNDED values
    // (both engines gate on the identical 4-decimal number, so boundary
    // rows can't flip). Row-local compiled kernel — no shuffle at any scale.
    QuerySpec(
      "x26_gopher_quality",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            TextFunctions.gopherStatsUdf(col("text")).as("g"))
          .select(col("doc_id"), col("g.n_words").as("n_words"),
            round(col("g.distinct_frac"), 4).as("distinct_frac"),
            round(col("g.stopword_frac"), 4).as("stopword_frac"),
            round(col("g.mean_word_len"), 4).as("mean_word_len"),
            round(col("g.top_bigram_frac"), 4).as("top_bigram_frac"),
            round(col("g.dup_trigram_frac"), 4).as("dup_trigram_frac"))
          .withColumn("keep",
            (col("n_words") >= 30 && col("mean_word_len").between(3.0, 10.0) &&
              col("stopword_frac") >= 0.01 && col("distinct_frac") >= 0.3 &&
              col("top_bigram_frac") <= 0.1 && col("dup_trigram_frac") <= 0.02)
              .cast("long"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, toks, len(toks) AS n_words,
             |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bigrams,
             |    [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)] AS trigrams
             |  FROM t),
             |m AS (
             |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             |    round(CAST(len(list_distinct(toks)) AS DOUBLE)/n_words, 4) AS distinct_frac,
             |    round(CAST(len(list_filter(toks, w -> w = 'a' OR w = 'the')) AS DOUBLE)/n_words, 4) AS stopword_frac,
             |    round(CAST(list_sum([length(w) for w in toks]) AS DOUBLE)/n_words, 4) AS mean_word_len,
             |    round(CAST(list_max([len(list_filter(bigrams, x -> x = b)) for b in bigrams]) AS DOUBLE)/len(bigrams), 4) AS top_bigram_frac,
             |    round(CAST(len(trigrams) - len(list_distinct(trigrams)) AS DOUBLE)/len(trigrams), 4) AS dup_trigram_frac
             |  FROM g)
             |SELECT *,
             |  CAST(CASE WHEN n_words >= 30 AND mean_word_len BETWEEN 3.0 AND 10.0
             |    AND stopword_frac >= 0.01 AND distinct_frac >= 0.3
             |    AND top_bigram_frac <= 0.1 AND dup_trigram_frac <= 0.02
             |    THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------------ BPE merge-pair counts
    // The counting step of one BPE merge iteration (Sennrich et al. 2015,
    // public): adjacent character-pair frequencies across the corpus, top 20
    // (count desc, pair asc — deterministic). explode + groupBy: one
    // key-distributed shuffle over a ≤(alphabet²)-cardinality key space, so
    // the reduce side is tiny no matter the corpus size.
    QuerySpec(
      "x28_bpe_merge_pairs",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("word"))
          .where(length(col("word")) >= 2)
          .select(explode(
            transform(sequence(lit(1), length(col("word")) - 1),
              i => col("word").substr(i, lit(2)))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(20),
      Some("""WITH w AS (
             |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                x -> x <> '')) AS word
             |  FROM documents),
             |p AS (
             |  SELECT unnest([substr(word, i, 2) for i in range(1, len(word))]) AS pair
             |  FROM w WHERE len(word) >= 2)
             |SELECT pair, COUNT(*) AS cnt FROM p
             |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin)),
    // ---------------------------------------------------------- TF-IDF
    // Corpus IDF + per-doc top tf-idf term (rank by the ROUNDED score, then
    // term — both engines rank the identical number, so ulp differences in
    // ln() can't flip the winner). The df side is NOT broadcast: at the
    // 100 TB design point the distinct-term table (typos, numbers, code
    // tokens) is 10⁸–10⁹ rows, far past executor memory. Both sides are
    // already hash-clustered by `term` from their own groupBys, so the
    // shuffle join co-partitions cheaply — and AQE still converts to a
    // broadcast at runtime when the vocabulary is genuinely small.
    QuerySpec(
      "x29_tfidf_topterm",
      (s, dir) => {
        val terms = Tables.documents(s, dir)
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = terms.groupBy("term").agg(countDistinct("doc_id").as("df"))
        val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
        val scored = tf.join(df, "term").crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"),
            round(col("tf") * log(col("n").cast("double") / col("df")), 4).as("tfidf"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
        scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("doc_id"), col("term").as("top_term"), col("tf"), col("tfidf"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |           x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n FROM documents),
             |s AS (SELECT tf.doc_id, tf.term, tf.tf,
             |        round(tf.tf * ln(CAST(n.n AS DOUBLE)/df.df), 4) AS tfidf
             |      FROM tf JOIN df USING(term) CROSS JOIN n),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY tfidf DESC, term) AS rn FROM s)
             |SELECT doc_id, term AS top_term, tf, tfidf FROM r WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),
    // ------------------------------------------- unicode canonicalization
    // NFC normalization + mojibake repair (the cleaning every production
    // corpus pipeline runs BEFORE dedup). The corpus is ASCII, so each doc
    // is suffixed in-plan with a decomposed sequence (e + U+0301, A +
    // U+030A) and a windows-1252 double-decode ("cafÃ©â€™s") — both sides
    // build the identical damaged string from the data, normalize/repair
    // with their own engine (Spark: codegen'd UnicodeNormalize /
    // RepairMojibake expressions; DuckDB: nfc_normalize + the targeted
    // byte-sequence replaces the general repair provably reduces to here).
    QuerySpec(
      "x32_unicode_normalize",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 40),
              lit(" Cafe\u0301 A\u030A")).as("raw"), // decomposed e+acute, A+ring
            concat(substring(col("text"), 1, 40),
              lit(" caf\u00C3\u00A9\u00E2\u20AC\u2122s")).as("moji")) // "café’s" cp1252-damaged
          .select(col("doc_id"),
            expr("nfc_normalize(raw)").as("nfc_text"),
            (col("raw") =!= expr("nfc_normalize(raw)")).cast("long").as("nfc_changed"),
            (length(col("raw")) - length(expr("nfc_normalize(raw)"))).as("nfc_len_delta"),
            expr("repair_mojibake(moji)").as("fixed_text"),
            (col("moji") =!= expr("repair_mojibake(moji)")).cast("long").as("fixed_changed"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (
             |  SELECT doc_id,
             |         substr(text, 1, 40) || ' Cafe' || chr(769) || ' A' || chr(778) AS raw,
             |         substr(text, 1, 40) || ' caf' || chr(195) || chr(169)
             |           || chr(226) || chr(8364) || chr(8482) || 's' AS moji
             |  FROM documents)
             |SELECT doc_id,
             |       nfc_normalize(raw) AS nfc_text,
             |       CAST(raw <> nfc_normalize(raw) AS BIGINT) AS nfc_changed,
             |       length(raw) - length(nfc_normalize(raw)) AS nfc_len_delta,
             |       replace(replace(moji, chr(195)||chr(169), chr(233)),
             |               chr(226)||chr(8364)||chr(8482), chr(8217)) AS fixed_text,
             |       CAST(moji <> replace(replace(moji, chr(195)||chr(169), chr(233)),
             |               chr(226)||chr(8364)||chr(8482), chr(8217)) AS BIGINT) AS fixed_changed
             |FROM r ORDER BY doc_id""".stripMargin)),
    // --------------------------------------------------- BPE merge training
    // The full iterative loop (x28 is one iteration's counts). The oracle
    // replays every iteration with a recursive CTE: the whole segmented
    // vocabulary rides in ONE row as LIST<STRUCT(s, cnt)>, each word's
    // segmentation a chr(1)-delimited string ("\x01l\x01\x01o\x01\x01w\x01")
    // so applying a merge is a non-overlapping string replace with exactly
    // the greedy left-to-right BPE semantics of [[BpeTrain.applyMerge]].
    QuerySpec(
      "x33_bpe_train",
      (s, dir) => BpeTrain.trainMerges(Tables.documents(s, dir), "text", BpeNumMerges)
        .orderBy("step"),
      Some(bpeTrainCte + """
             |SELECT step, m_left AS merge_left, m_right AS merge_right, m_cnt AS pair_cnt
             |FROM bpe WHERE step >= 1 ORDER BY step""".stripMargin)),
    // Tokenizer APPLICATION: segment every document with the 20 merges x33
    // trains (train → apply, the full tokenizer lifecycle). The merge list
    // is driver state by construction (vocab-sized → 20 rows), shipped in
    // the UDF closure; segmentation is row-local. The oracle replays
    // training to the same step-20 vocabulary state, whose per-word
    // segmentation IS the application result — one equi-join on `word`.
    QuerySpec(
      "x35_bpe_apply",
      (s, dir) => {
        val merges = BpeTrain.trainMerges(Tables.documents(s, dir), "text", BpeNumMerges)
          .orderBy("step").select("merge_left", "merge_right")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        // fan the under-split scan before the per-word BPE segmentation
        // UDF (guide §2.5; no-op on a well-split table)
        Tables.fanOut(Tables.documents(s, dir)
            .select(col("doc_id"), col("text")), col("doc_id"))
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .where(size(col("toks")) > 0)
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            BpeTrain.bpeTokenCountUdf(merges)(col("toks")).as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(bpeTrainCte + """,
             |final AS (SELECT vocab FROM bpe
             |          WHERE step = (SELECT MAX(step) FROM bpe)),
             |wmap AS (SELECT replace(u.w.s, chr(1), '') AS word,
             |                CAST(len(list_filter(string_split(u.w.s, chr(1)),
             |                         x -> x <> '')) AS BIGINT) AS nseg
             |         FROM final f, unnest(f.vocab) AS u(w)),
             |dt AS (SELECT doc_id, unnest(list_filter(
             |         regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS word
             |       FROM documents)
             |SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             |       CAST(SUM(wmap.nseg) AS BIGINT) AS n_bpe_tokens
             |FROM dt JOIN wmap USING (word)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),
    // Corpus-level unigram LM cross-entropy per doc (the CCNet/KenLM-style
    // quality signal, here with the LM trained on the corpus itself):
    // add-one-smoothed p(term) from global counts, xent = -mean log p.
    // Per-term log-probs are rounded to 6 decimals and summed as
    // DECIMAL(18,6) so the per-doc sum is exact and order-independent —
    // double accumulation order across partitions can never flip the hash.
    // Scale shape: one (doc,term) shuffle, one term shuffle for the vocab,
    // one term-keyed join back (no broadcast hint: the distinct-term table
    // is corpus-sized at 100 TB; AQE broadcasts it when it is small).
    QuerySpec(
      "x40_unigram_lm",
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
        val vocab = tf.groupBy("term").agg(sum("cnt").as("c"))
        val tot = vocab.agg(sum("c").cast("long").as("n"),
          count(lit(1)).as("v"))
        val lp = vocab.crossJoin(broadcast(tot)) // tot is one row
          .select(col("term"),
            round(log((col("c") + 1.0) / (col("n") + col("v"))), 6)
              .cast("decimal(18,6)").as("logp"))
        tf.join(lp, "term")
          .groupBy("doc_id")
          .agg(sum("cnt").cast("long").as("n_tokens"),
            round((-sum(col("cnt") * col("logp"))).cast("double") /
              sum("cnt"), 4).as("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
             |tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
             |vocab AS (SELECT term, CAST(SUM(cnt) AS BIGINT) AS c FROM tf GROUP BY 1),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM vocab),
             |lp AS (SELECT term, CAST(round(ln((c + 1.0) / (n + v)), 6) AS DECIMAL(18,6)) AS logp
             |       FROM vocab CROSS JOIN tot)
             |SELECT tf.doc_id, CAST(SUM(tf.cnt) AS BIGINT) AS n_tokens,
             |  round(-CAST(SUM(tf.cnt * lp.logp) AS DOUBLE) / SUM(tf.cnt), 4) AS xent
             |FROM tf JOIN lp USING (term)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // Bigram LM cross-entropy per doc — x40's unigram signal upgraded to
    // the conditional p(w2|w1) with add-one smoothing over the corpus
    // vocabulary. Bigrams come from a codegen'd zip_with over the token
    // array (no UDF); the per-doc sum uses the same rounded-DECIMAL(18,6)
    // device as x40 so partition order can never flip the hash. Scale
    // shape: shuffles keyed on (doc,bigram), bigram, and first-word — all
    // corpus-sized tables joined WITHOUT broadcast hints (AQE decides).
    QuerySpec(
      "x44_bigram_lm",
      (s, dir) => {
        val toks = TextFunctions.tokens(col("text"))
        val bigrams = when(size(col("toks")) < 2, array())
          .otherwise(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b)))
        // fan the under-split scan before tokenize: base feeds the bigram
        // explode AND the vocab explode (guide §2.5; no-op at scale)
        val base = Tables.fanOut(Tables.documents(s, dir)
            .select(col("doc_id"), col("text")), col("doc_id"))
          .select(col("doc_id"), toks.as("toks"))
        val tf = base
          .select(col("doc_id"), explode(bigrams).as("big"))
          .groupBy("doc_id", "big").agg(count(lit(1)).as("cnt"))
        val bcnt = tf.groupBy("big").agg(sum("cnt").cast("long").as("cb"))
        val ctx = tf
          .select(substring_index(col("big"), " ", 1).as("w1"), col("cnt"))
          .groupBy("w1").agg(sum("cnt").cast("long").as("cw"))
        val vocab = base.select(explode(col("toks")).as("w"))
          .agg(count_distinct(col("w")).as("v"))
        val lp = bcnt
          .join(ctx, substring_index(bcnt("big"), " ", 1) === ctx("w1"))
          .crossJoin(broadcast(vocab)) // vocab is one row
          .select(col("big"),
            round(log((col("cb") + 1.0) / (col("cw") + col("v"))), 6)
              .cast("decimal(18,6)").as("logp"))
        tf.join(lp, "big")
          .groupBy("doc_id")
          .agg(sum("cnt").cast("long").as("n_bigrams"),
            round((-sum(col("cnt") * col("logp"))).cast("double") /
              sum("cnt"), 4).as("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |bg AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS big FROM t),
             |bgf AS (SELECT doc_id, big, split_part(big, ' ', 1) AS w1 FROM bg),
             |uni AS (SELECT DISTINCT unnest(toks) AS w FROM t),
             |v AS (SELECT COUNT(*) AS v FROM uni),
             |tf AS (SELECT doc_id, big, COUNT(*) AS cnt FROM bgf GROUP BY 1, 2),
             |bc AS (SELECT big, CAST(SUM(cnt) AS BIGINT) AS cb FROM tf GROUP BY 1),
             |ctx AS (SELECT w1, COUNT(*) AS cw FROM bgf GROUP BY 1),
             |lp AS (SELECT bc.big,
             |         CAST(round(ln((bc.cb + 1.0) / (ctx.cw + v.v)), 6) AS DECIMAL(18,6)) AS logp
             |       FROM bc JOIN ctx ON split_part(bc.big, ' ', 1) = ctx.w1 CROSS JOIN v)
             |SELECT tf.doc_id, CAST(SUM(tf.cnt) AS BIGINT) AS n_bigrams,
             |  round(-CAST(SUM(tf.cnt * lp.logp) AS DOUBLE) / SUM(tf.cnt), 4) AS xent
             |FROM tf JOIN lp USING (big)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // Hashed linear quality scorer (fastText shape, Joulin et al. 2016):
    // unigram+bigram bag hashed to 4096 buckets, margin = Σ bucket weights
    // — all-integer accumulation, one double division at the end. Row-local
    // compiled kernel, zero shuffle at any corpus size; the weights are a
    // deterministic function of the bucket id so hashing AND model replay
    // in the oracle (a trained model would broadcast the same array).
    QuerySpec(
      "x50_quality_classifier",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text")))
              .as("sc"))
          .select(col("doc_id"), col("sc.n_feats").as("n_feats"),
            col("sc.margin").as("margin"))
          .withColumn("score",
            when(col("n_feats") > 0,
              round(col("margin").cast("double") / (col("n_feats") * 1048576L), 6))
              .otherwise(lit(0.0)))
          .withColumn("keep", (col("margin") > 0).cast("long"))
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |f AS (SELECT doc_id,
             |  unnest(list_concat(toks, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS feat FROM t),
             |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |       [CAST(ord(c) AS BIGINT) for c in string_split(feat, '')]),
             |       (acc, x) -> (acc*31 + x) % 2147483647) % 4096 AS b FROM f),
             |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
             |        CAST(SUM((b * 2654435761) % 1048576 - 524288) AS BIGINT) AS margin
             |      FROM h GROUP BY 1)
             |SELECT t.doc_id, COALESCE(m.n_feats, 0) AS n_feats, COALESCE(m.margin, 0) AS margin,
             |  CASE WHEN COALESCE(m.n_feats, 0) > 0
             |       THEN round(CAST(m.margin AS DOUBLE) / (m.n_feats * 1048576), 6) ELSE 0.0 END AS score,
             |  CAST(CASE WHEN COALESCE(m.margin, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM t LEFT JOIN m USING (doc_id) ORDER BY doc_id""".stripMargin)),
    // Within-doc n-gram repetition metrics (Gopher §A1.1 repetition
    // filters): templated/spam docs repeat internal n-grams long before
    // they duplicate across docs, so these row-local fractions gate what
    // document-level dedup cannot see — the quality-filter complement of
    // x26's length/stopword gates. One hash-map pass per row; no shuffle.
    QuerySpec(
      "x72_repetition_metrics",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), TextFunctions.repetitionUdf(col("toks")).as("r"))
          .select(col("doc_id"),
            round(col("r._1"), 4).as("dup_bigram_frac"),
            round(col("r._2"), 4).as("top_bigram_frac"),
            round(col("r._3"), 4).as("dup_trigram_frac"))
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |g2 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS g
             |       FROM t WHERE len(toks) >= 3),
             |g3 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]) AS g
             |       FROM t WHERE len(toks) >= 3),
             |c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
             |c3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2),
             |m2 AS (SELECT doc_id, SUM(cnt) AS n2,
             |         COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS dup2, MAX(cnt) AS top2
             |       FROM c2 GROUP BY 1),
             |m3 AS (SELECT doc_id, SUM(cnt) AS n3,
             |         COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS dup3
             |       FROM c3 GROUP BY 1)
             |SELECT m2.doc_id,
             |  round(CAST(dup2 AS DOUBLE) / n2, 4) AS dup_bigram_frac,
             |  round(CAST(top2 AS DOUBLE) / n2, 4) AS top_bigram_frac,
             |  round(CAST(dup3 AS DOUBLE) / n3, 4) AS dup_trigram_frac
             |FROM m2 JOIN m3 USING (doc_id) ORDER BY m2.doc_id""".stripMargin)),
    // Quality-gate calibration: per-source DISCRETE percentiles of x50's
    // continuous classifier score plus the threshold that keeps the top
    // 70% — the table a gating policy reads before anyone picks a cutoff
    // (a global threshold keeps 72% of one source and 44% of another;
    // per-source calibration is how mixing stays controlled). Discrete
    // (index-picked) percentiles, not interpolated: interpolation
    // midpoints land on round-half boundaries where engines disagree,
    // index picks are exact in both. One window per source — at 100 TB
    // this runs per-source-sampled; the exact contract here is what the
    // sample estimates.
    QuerySpec(
      "x73_quality_gate_calibration",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text"))).as("sc"))
          .select(col("doc_id"), col("source"),
            when(col("sc.n_feats") > 0,
              round(col("sc.margin").cast("double") / (col("sc.n_feats") * 1048576L), 6))
              .otherwise(lit(0.0)).as("score"))
        val w = Window.partitionBy("source").orderBy(col("score"), col("doc_id"))
        val wn = Window.partitionBy("source")
        def pick(q: Double) =
          max(when(col("rn") === ceil(lit(q) * col("n")).cast("long"), col("score")))
        scored
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("source")
          .agg(max(col("n")).as("n_docs"),
            pick(0.25).as("p25"), pick(0.50).as("p50"), pick(0.75).as("p75"),
            pick(0.30).as("keep70_threshold"),
            round(avg(when(col("score") > 0, 1.0).otherwise(0.0)), 4).as("pos_rate"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |f AS (SELECT doc_id,
             |  unnest(list_concat(toks, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS feat FROM t),
             |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |       [CAST(ord(c) AS BIGINT) for c in string_split(feat, '')]),
             |       (acc, x) -> (acc*31 + x) % 2147483647) % 4096 AS b FROM f),
             |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
             |        CAST(SUM((b * 2654435761) % 1048576 - 524288) AS BIGINT) AS margin
             |      FROM h GROUP BY 1),
             |s AS (SELECT t.doc_id, t.source,
             |        CASE WHEN COALESCE(m.n_feats, 0) > 0
             |             THEN round(CAST(m.margin AS DOUBLE) / (m.n_feats * 1048576), 6) ELSE 0.0 END AS score
             |      FROM t LEFT JOIN m USING (doc_id)),
             |r AS (SELECT source, score,
             |        row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
             |        COUNT(*) OVER (PARTITION BY source) AS n
             |      FROM s)
             |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
             |  MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN score END) AS p25,
             |  MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN score END) AS p50,
             |  MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN score END) AS p75,
             |  MAX(CASE WHEN rn = CAST(ceil(0.30 * n) AS BIGINT) THEN score END) AS keep70_threshold,
             |  round(AVG(CASE WHEN score > 0 THEN 1.0 ELSE 0.0 END), 4) AS pos_rate
             |FROM r GROUP BY source ORDER BY source""".stripMargin)),
    // Tokenizer fertility per (lang, source): BPE tokens per word and raw
    // chars per BPE token — the table that prices every mixing decision
    // in TOKENS instead of documents (a source whose fertility is 1.4x
    // costs 1.4x the training budget per word; token-budget mixing reads
    // this, not row counts). Composes x33's trained merges + x35's
    // row-local segmentation; one groupBy on the (lang, source) key.
    // chars_per_token is over raw document chars (n_chars) — the
    // bytes-on-disk per token lens, deliberately including whitespace.
    QuerySpec(
      "x74_tokenizer_fertility",
      (s, dir) => {
        val merges = BpeTrain.trainMerges(Tables.documents(s, dir), "text", BpeNumMerges)
          .orderBy("step").select("merge_left", "merge_right")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        // fan the under-split scan before the per-word BPE segmentation
        // UDF (guide §2.5; no-op on a well-split table)
        Tables.fanOut(Tables.documents(s, dir)
            .select(col("doc_id"), col("lang"), col("source"),
              col("n_chars"), col("text")), col("doc_id"))
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            TextFunctions.tokens(col("text")).as("toks"))
          .where(size(col("toks")) > 0)
          .select(col("lang"), col("source"), col("n_chars"),
            size(col("toks")).cast("long").as("n_words"),
            BpeTrain.bpeTokenCountUdf(merges)(col("toks")).as("n_bpe"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("n_words"),
            sum(col("n_bpe")).as("n_bpe_tokens"),
            sum(col("n_chars")).as("n_chars"),
            round(sum(col("n_bpe")).cast("double") / sum(col("n_words")), 4)
              .as("fertility"),
            round(sum(col("n_chars")).cast("double") / sum(col("n_bpe")), 4)
              .as("chars_per_token"))
          .orderBy("lang", "source")
      },
      Some(bpeTrainCte + """,
             |final AS (SELECT vocab FROM bpe
             |          WHERE step = (SELECT MAX(step) FROM bpe)),
             |wmap AS (SELECT replace(u.w.s, chr(1), '') AS word,
             |                CAST(len(list_filter(string_split(u.w.s, chr(1)),
             |                         x -> x <> '')) AS BIGINT) AS nseg
             |         FROM final f, unnest(f.vocab) AS u(w)),
             |dt AS (SELECT doc_id, lang, source, n_chars, unnest(list_filter(
             |         regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS word
             |       FROM documents),
             |per AS (SELECT doc_id, lang, source, MAX(n_chars) AS nc,
             |          CAST(COUNT(*) AS BIGINT) AS nw, CAST(SUM(wmap.nseg) AS BIGINT) AS nb
             |        FROM dt JOIN wmap USING (word) GROUP BY 1, 2, 3)
             |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(nw) AS BIGINT) AS n_words,
             |  CAST(SUM(nb) AS BIGINT) AS n_bpe_tokens,
             |  CAST(SUM(nc) AS BIGINT) AS n_chars,
             |  round(CAST(SUM(nb) AS DOUBLE) / SUM(nw), 4) AS fertility,
             |  round(CAST(SUM(nc) AS DOUBLE) / SUM(nb), 4) AS chars_per_token
             |FROM per GROUP BY 1, 2 ORDER BY lang, source""".stripMargin)),
    // Passage chunking for embed-and-index (the retrieval/RAG prep stage):
    // overlapping 32-token windows at stride 24, so no 8-token span ever
    // straddles a boundary unseen by both neighbors. Fully declarative
    // (sequence → transform → slice HOFs, codegen'd, zero UDF); the
    // explode is row-local fan-out — no shuffle until a consumer
    // aggregates. Emits slim (doc, idx, n_tokens, sha) rows: the chunk
    // digest is what a downstream embedding cache keys on.
    QuerySpec(
      "x75_passage_chunks",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .where(size(col("toks")) > 0)
          .select(col("doc_id"),
            explode(TextFunctions.slidingChunks(col("toks"), 32, 24)).as("ch"))
          .select(col("doc_id"), col("ch.idx").as("chunk_idx"),
            size(TextFunctions.tokens(col("ch.chunk"))).cast("long").as("n_tokens"),
            sha2(col("ch.chunk").cast("binary"), 256).as("chunk_sha"))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
             |c AS (SELECT doc_id,
             |  unnest([{'idx': k, 'chunk': array_to_string(toks[k*24+1 : k*24+32], ' ')}
             |          for k in range(0, CASE WHEN len(toks) <= 32 THEN 1
             |            ELSE CAST(ceil(CAST(len(toks) - 32 AS DOUBLE) / 24) AS BIGINT) + 1 END)]) AS ch
             |  FROM t WHERE len(toks) > 0)
             |SELECT doc_id, CAST(ch.idx AS INT) AS chunk_idx,
             |  CAST(len(list_filter(regexp_split_to_array(ch.chunk, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             |  sha256(ch.chunk) AS chunk_sha
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),
    // Vocabulary coverage curve: what fraction of all token OCCURRENCES
    // does a top-V vocabulary cover, at doubling V — the curve that sizes
    // a tokenizer vocab (or quantifies OOV pressure) before training one.
    // The token count is one distributed groupBy; ranking is a bounded
    // top-32 (raw row_number filter => Partial+Final WindowGroupLimit,
    // never a global window over the full vocab), and the curve join runs
    // 6 sizes x 32 ranked rows.
    QuerySpec(
      "x90_vocab_coverage",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("t"))
          .filter(col("t") =!= "")
        val tc = tok.groupBy("t").agg(count(lit(1)).as("n"))
        val tot = tc.agg(sum(col("n")).as("total"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("t"))
        val top = tc.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 32)
        val sizes = s.range(0, 6)
          .select(pow(lit(2), col("id")).cast("long").as("vocab_size"))
        sizes.join(top, col("rk") <= col("vocab_size"))
          .crossJoin(broadcast(tot))
          .groupBy("vocab_size")
          .agg(sum(col("n")).as("cum_tokens"),
            round(sum(col("n")).cast("double") / max(col("total")), 6)
              .as("coverage"))
          .orderBy("vocab_size")
      },
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
             |tc AS (SELECT t, COUNT(*) AS n FROM tok WHERE t <> '' GROUP BY 1),
             |tot AS (SELECT SUM(n) AS total FROM tc),
             |r AS (SELECT t, n, row_number() OVER (ORDER BY n DESC, t) AS rk FROM tc QUALIFY rk <= 32),
             |v AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS v)
             |SELECT CAST(v.v AS BIGINT) AS vocab_size, CAST(SUM(r.n) AS BIGINT) AS cum_tokens,
             |  round(CAST(SUM(r.n) AS DOUBLE) / MAX(tot.total), 6) AS coverage
             |FROM v JOIN r ON r.rk <= v.v CROSS JOIN tot
             |GROUP BY v.v ORDER BY vocab_size""".stripMargin)),
    // Boilerplate/tag stripping (the extraction stage between crawl and
    // every text op; jusText/trafilatura territory, here the regex-chain
    // core). The corpus is plain text, so the markup is built IN-PLAN
    // from the data (the x32 unicode-damage device): wrap each doc in
    // head/nav/footer chrome, then strip container blocks (non-greedy,
    // no backreferences — RE2-safe for the oracle) and remaining tags.
    // Both engines damage and clean with their own regex engines; the
    // hash compare proves the cleaned text and removed-char accounting
    // agree byte-for-byte. Row-local, codegen, no shuffle.
    QuerySpec(
      "x97_boilerplate_strip",
      (s, dir) => {
        val h = Tables.documents(s, dir)
          .select(col("doc_id"), concat(
            lit("<html><head><title>t</title></head><body><nav>menu home about</nav><p>"),
            substring(col("text"), 1, 60),
            lit("</p><footer>copyright 2024 corp</footer></body></html>"))
            .as("html"))
        val clean = regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(col("html"),
            "<head>.*?</head>", ""),
            "<nav>.*?</nav>", ""),
            "<footer>.*?</footer>", ""),
            "<[^>]*>", "")
        h.select(col("doc_id"), clean.as("clean"),
            (length(col("html")) - length(clean)).cast("long")
              .as("removed_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
             |  '<html><head><title>t</title></head><body><nav>menu home about</nav><p>' ||
             |  substr(text, 1, 60) || '</p><footer>copyright 2024 corp</footer></body></html>' AS html
             |  FROM documents),
             |c AS (SELECT doc_id, html,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
             |    '<head>.*?</head>', '', 'g'),
             |    '<nav>.*?</nav>', '', 'g'),
             |    '<footer>.*?</footer>', '', 'g'),
             |    '<[^>]*>', '', 'g') AS clean
             |  FROM h)
             |SELECT doc_id, clean, CAST(length(html) - length(clean) AS BIGINT) AS removed_chars
             |FROM c ORDER BY doc_id""".stripMargin)),
    // Dictionary / topic tagging — the C4-badwords-style wordlist stage
    // every corpus pipeline runs (flagging, topic routing, blocklist
    // filtering), here as per-(source, topic) coverage: documents hit,
    // total hits, share of the source's docs. The dictionary is a tiny
    // BROADCAST dim joined against row-local exploded tokens — at 100 TB
    // the corpus side never shuffles on content, only the (source, topic)
    // aggregate moves; a real deployment swaps the literal list for a
    // loaded wordlist, same plan.
    QuerySpec(
      "x100_dict_tag",
      (s, dir) => {
        import s.implicits._
        val dict = Seq(
          ("join", "relational"), ("filter", "relational"),
          ("sort", "relational"), ("agg", "relational"),
          ("stream", "streaming"), ("window", "streaming"),
          ("batch", "streaming"),
          ("vector", "vectorized"), ("column", "vectorized"),
          ("scan", "vectorized")).toDF("word", "topic")
        val d = Tables.documents(s, dir)
        val tok = d.select(col("doc_id"), col("source"),
          explode(split(lower(col("text")), " ")).as("w"))
        val hits = tok.join(broadcast(dict), tok("w") === dict("word"))
          .groupBy("source", "topic")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_hits"))
        val tot = d.groupBy("source").agg(count(lit(1)).as("n_tot"))
        hits.join(tot, "source")
          .select(col("source"), col("topic"), col("n_docs"), col("n_hits"),
            round(col("n_docs").cast("double") / col("n_tot"), 4)
              .as("doc_share"))
          .orderBy("source", "topic")
      },
      Some("""WITH dict(word, topic) AS (VALUES
             |  ('join','relational'), ('filter','relational'),
             |  ('sort','relational'), ('agg','relational'),
             |  ('stream','streaming'), ('window','streaming'),
             |  ('batch','streaming'),
             |  ('vector','vectorized'), ('column','vectorized'),
             |  ('scan','vectorized')),
             |tok AS (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
             |h AS (SELECT source, topic, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_hits
             |      FROM tok JOIN dict ON tok.w = dict.word GROUP BY 1, 2),
             |t AS (SELECT source, COUNT(*) AS n_tot FROM documents GROUP BY 1)
             |SELECT h.source, h.topic, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_hits AS BIGINT) AS n_hits,
             |  round(CAST(n_docs AS DOUBLE) / t.n_tot, 4) AS doc_share
             |FROM h JOIN t USING (source) ORDER BY 1, 2""".stripMargin)),
    // Okapi BM25 top-k retrieval (Robertson et al., TREC-3 1994, public) —
    // the lexical scorer every hybrid stack pairs with the vector arm:
    // x94 fuses rank lists; THIS is the ranker that produces the lexical
    // one (its overlap arm was a placeholder scorer). Plan shape is the
    // inverted-index join: postings (doc, term, tf) shuffle once on term,
    // the query side (terms of docs 0-2 + per-term idf) is a few hundred
    // rows and BROADCASTS — candidates are only docs sharing a query
    // term, never all pairs; per-candidate scoring is row-local; the
    // top-10 window is qid-partitioned and rank-pushed (WindowGroupLimit
    // keeps ≤10 rows/partition pre-shuffle). Constants k1=1.2, b=0.75
    // appear as the SAME decimal literals in both engines and every
    // fp op is written in the same order, so scores agree bit-for-bit;
    // per-term contributions round to 6 and sum as DECIMAL(18,6)
    // internally (the x101/x105 add-order discipline), emitted DOUBLE.
    QuerySpec(
      "x106_bm25_topk",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Bm25.topK(Bm25.termFreqs(docs),
          docs.agg(count(lit(1)).as("n_docs")))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
             |st AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             |         CAST((SELECT SUM(tf) FROM tf) AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS avgdl),
             |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |qdf AS (SELECT q.doc_id AS qid, q.term,
             |          ln(1 + (st.n_docs - df.df + 0.5e0) / (df.df + 0.5e0)) AS idf, st.avgdl
             |        FROM tf q JOIN df USING (term) CROSS JOIN st WHERE q.doc_id < 3),
             |cand AS (SELECT qdf.qid, tf.doc_id AS cid,
             |           round(qdf.idf * (tf.tf * 2.2e0) /
             |             (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / qdf.avgdl)), 6) AS contrib
             |         FROM tf JOIN qdf ON tf.term = qdf.term AND tf.doc_id <> qdf.qid
             |         JOIN dl ON dl.doc_id = tf.doc_id),
             |sc AS (SELECT qid, cid, CAST(COUNT(*) AS BIGINT) AS n_terms,
             |         CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS score
             |       FROM cand GROUP BY 1, 2)
             |SELECT qid, cid, n_terms, score,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS BIGINT) AS rn
             |FROM sc QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),
    // TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) — the
    // unsupervised corpus-keyword read: words (length >= 4, the classic
    // content-word heuristic in lieu of POS tags) co-occurring within a
    // 2-token window form a weighted undirected graph; 3 damped PageRank
    // iterations (the x101 kernel, same DECIMAL-bridged contribution
    // sums) rank them; top-20 out. Scale shape: the window join is EQUI
    // on (doc, position+offset) — per-doc bounded, never cross-doc — the
    // graph collapses to |vocab pairs| counts before any iteration, and
    // each iteration is one edge equi-join + map-side-combined aggregate
    // over the |vocab| node set; top-20 is a TakeOrdered.
    QuerySpec(
      "x160_textrank_keywords",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("p", "wd")))
          .filter(length(col("wd")) >= 4)
        val offs = tok.select(col("doc_id"), col("p"), col("wd"),
          explode(array(lit(1), lit(2))).as("off"))
        val pairs = offs.alias("a").join(tok.alias("b"),
            col("a.doc_id") === col("b.doc_id") &&
            col("b.p") === col("a.p") + col("a.off") &&
            col("a.wd") =!= col("b.wd"))
          .select(least(col("a.wd"), col("b.wd")).as("wa"),
            greatest(col("a.wd"), col("b.wd")).as("wb"))
        val pc = pairs.groupBy("wa", "wb").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
        val edges = pc.select(col("wa").as("src"), col("wb").as("dst"), col("w"))
          .union(pc.select(col("wb").as("src"), col("wa").as("dst"), col("w")))
          .localCheckpoint() // consumed by wout, nodes, and 3 iterations
        val wout = edges.groupBy("src").agg(sum(col("w")).as("wout"))
        val e2 = edges.join(wout, "src")
        val nodes = edges.select(col("src").as("v")).distinct()
        val nN = nodes.agg(count(lit(1)).as("n"))
        var pr = nodes.crossJoin(broadcast(nN))
          .select(col("v"), round(lit(1.0) / col("n"), 6).as("pr"))
        for (_ <- 1 to 3) {
          pr = e2.join(pr.select(col("v").as("src"), col("pr")), "src")
            .select(col("dst").as("v"),
              round(col("pr") * col("w") / col("wout"), 6)
                .cast("decimal(18,6)").as("c"))
            .groupBy("v")
            .agg(sum(col("c")).as("csum"))
            .crossJoin(broadcast(nN))
            .select(col("v"),
              round(lit(0.15) / col("n") +
                lit(0.85) * col("csum").cast("double"), 6).as("pr"))
        }
        pr.select(col("v").as("word"), col("pr"))
          .orderBy(col("pr").desc, col("word"))
          .limit(20)
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS wd, generate_subscripts(toks, 1) AS p FROM t),
             |tk AS (SELECT doc_id, wd, p FROM tok WHERE length(wd) >= 4),
             |pp AS (SELECT least(a.wd, b.wd) AS wa, greatest(a.wd, b.wd) AS wb
             |       FROM tk a JOIN tk b ON a.doc_id = b.doc_id
             |         AND (b.p - a.p) IN (1, 2) AND a.wd <> b.wd),
             |pc AS (SELECT wa, wb, COUNT(*) AS w FROM pp GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |e AS (SELECT wa AS src, wb AS dst, w FROM pc UNION ALL SELECT wb, wa, w FROM pc),
             |wo AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
             |e2 AS (SELECT e.src, e.dst, e.w, wo.wout FROM e JOIN wo USING (src)),
             |nodes AS (SELECT DISTINCT src AS v FROM e),
             |nn AS (SELECT COUNT(*) AS n FROM nodes),
             |pr0 AS (SELECT v, round(CAST(1.0 AS DOUBLE) / nn.n, 6) AS pr FROM nodes CROSS JOIN nn),
             |pr1 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr0 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n),
             |pr2 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr1 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n),
             |pr3 AS (SELECT e2.dst AS v,
             |          round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
             |            CAST(SUM(CAST(round(p.pr * e2.w / e2.wout, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS pr
             |        FROM e2 JOIN pr2 p ON p.v = e2.src CROSS JOIN nn GROUP BY e2.dst, nn.n)
             |SELECT v AS word, pr FROM pr3 ORDER BY pr DESC, word LIMIT 20""".stripMargin)),
    // Inter-arrival burstiness (Goh & Barabási, EPL 2008): per user, the
    // event-gap statistic B = (σ−μ)/(σ+μ) — −1 metronome-periodic (bot
    // cadence), 0 Poisson, →1 human-bursty — the behavioral-forensics
    // read that complements x82's integrity audit and x81's key skew
    // with WHO, not just how much. Gaps are exact integer SECONDS
    // (micros div 1e6 — squared micro-gaps would overflow int64 on
    // multi-day gaps) from a per-user lag window (bounded per user);
    // μ/σ from the
    // n·Σx²−(Σx)² integer-moment identity so B is one fixed-order
    // double expression, bit-identical per engine, and the 0.1-wide
    // histogram bins on that identical double (floor can't diverge).
    // Output is the bounded |bins| distribution + a NULL-bin row
    // counting EVERY user without a B (single-event users — who never
    // produce a lag row — and all-same-second users whose μ = σ = 0
    // would make B = 0/0) against the full event user set — nothing
    // per-user leaves the aggregate, nothing excluded silently.
    QuerySpec(
      "x171_burstiness",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("sec", expr("unix_micros(ts) div 1000000"))
          .withColumn("gap", col("sec") - lag(col("sec"), 1).over(W))
          .filter(col("gap").isNotNull)
        val mom = gaps.groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum(col("gap")).as("sg"),
            sum(col("gap") * col("gap")).as("sgg"))
        // B needs >= 2 gaps AND a nonzero gap sum (sg = 0 means every
        // event landed in one wall-clock second: μ = σ = 0 and B is
        // 0/0). Excluded users are counted against the FULL event user
        // set — incl. single-event users who never produce a lag row —
        // so the NULL-bin row truly is "everyone without a B".
        val b = mom.filter(col("n") >= 2 && col("sg") > 0)
          .select(col("user_id"),
            ((sqrt((col("n").cast("double") * col("sgg") -
                col("sg").cast("double") * col("sg")) /
                (col("n").cast("double") * col("n"))) -
              col("sg").cast("double") / col("n")) /
             (sqrt((col("n").cast("double") * col("sgg") -
                col("sg").cast("double") * col("sg")) /
                (col("n").cast("double") * col("n"))) +
              col("sg").cast("double") / col("n"))).as("bness"))
        val allUsers = Tables.events(s, dir).select("user_id").distinct()
          .agg(count(lit(1)).as("n_all"))
        val excluded = b.agg(count(lit(1)).as("n_b"))
          .crossJoin(broadcast(allUsers))
          .select(lit(null).cast("long").as("bin"),
            (col("n_all") - col("n_b")).as("n_users"),
            lit(null).cast("double").as("mean_b"))
        b.groupBy(floor(col("bness") * 10).as("bin"))
          .agg(count(lit(1)).as("n_users"),
            round(sum(round(col("bness"), 6).cast("decimal(18,6)"))
              .cast("double") / count(lit(1)), 6).as("mean_b"))
          .union(excluded)
          .orderBy(col("bin").asc_nulls_last)
      },
      Some("""WITH g AS (SELECT user_id,
             |        epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000) OVER
             |          (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |      FROM events),
             |m AS (SELECT user_id, COUNT(*) AS n, SUM(gap) AS sg,
             |        SUM(gap * gap) AS sgg
             |      FROM g WHERE gap IS NOT NULL GROUP BY 1),
             |b AS (SELECT user_id,
             |        (sqrt((CAST(n AS DOUBLE) * sgg - CAST(sg AS DOUBLE) * sg)
             |           / (CAST(n AS DOUBLE) * n)) - CAST(sg AS DOUBLE) / n) /
             |        (sqrt((CAST(n AS DOUBLE) * sgg - CAST(sg AS DOUBLE) * sg)
             |           / (CAST(n AS DOUBLE) * n)) + CAST(sg AS DOUBLE) / n)
             |          AS bness
             |      FROM m WHERE n >= 2 AND sg > 0),
             |h AS (SELECT CAST(floor(bness * 10) AS BIGINT) AS bin,
             |        COUNT(*) AS n_users,
             |        round(CAST(SUM(CAST(round(bness, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) / COUNT(*), 6) AS mean_b
             |      FROM b GROUP BY 1),
             |t AS (SELECT CAST(NULL AS BIGINT) AS bin,
             |        CAST((SELECT COUNT(DISTINCT user_id) FROM events)
             |          - (SELECT COUNT(*) FROM b) AS BIGINT) AS n_users,
             |        CAST(NULL AS DOUBLE) AS mean_b)
             |SELECT bin, CAST(n_users AS BIGINT) AS n_users, mean_b FROM h
             |UNION ALL SELECT bin, n_users, mean_b FROM t
             |ORDER BY bin NULLS LAST""".stripMargin)),
    // Good-Turing frequency-of-frequencies (Good 1953; Gale & Sampson's
    // simple GT): the vocabulary histogram "how many words occur r
    // times" plus the unseen-mass estimate P₀ = N₁/N — the quantity
    // behind smoothing decisions, OOV-rate forecasts, and "is the
    // corpus big enough" reads (complements x90's coverage curve and
    // x77's novelty curve with the CLASSIC estimator). Per r: n_types,
    // the adjusted Good-Turing count r* = (r+1)·N_{r+1}/N_r where the
    // next bucket exists (integer inputs, one division, round 6). Two
    // bounded aggregates — token counts then count-of-counts (the
    // freq-of-freq table is tiny: max r buckets) — and a 1-row total.
    QuerySpec(
      "x173_good_turing",
      (s, dir) => {
        val wc = Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("r"))
        val fof = wc.groupBy("r").agg(count(lit(1)).as("n_types"))
          .localCheckpoint() // consumed by the self-join and the total
        val tot = fof.agg(sum(col("r") * col("n_types")).as("nn"),
          sum(when(col("r") === 1, col("n_types")).otherwise(0L)).as("n1"))
        val nxt = fof.select((col("r") - 1).as("r"),
          col("n_types").as("n_types_next"))
        fof.join(nxt, Seq("r"), "left_outer")
          .crossJoin(broadcast(tot))
          .select(col("r"), col("n_types"),
            when(col("n_types_next").isNotNull,
              round((col("r") + 1).cast("double") * col("n_types_next") /
                col("n_types"), 6))
              .otherwise(lit(null).cast("double")).as("r_star"),
            round(col("n1").cast("double") / col("nn"), 6).as("p_unseen"))
          .orderBy("r")
      },
      Some("""WITH t AS (SELECT unnest(list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
             |        AS w
             |      FROM documents),
             |wc AS (SELECT w, COUNT(*) AS r FROM t GROUP BY 1),
             |fof AS (SELECT r, COUNT(*) AS n_types FROM wc GROUP BY 1),
             |tot AS (SELECT SUM(r * n_types) AS nn,
             |         SUM(CASE WHEN r = 1 THEN n_types ELSE 0 END) AS n1
             |       FROM fof)
             |SELECT CAST(f.r AS BIGINT) AS r,
             |  CAST(f.n_types AS BIGINT) AS n_types,
             |  CASE WHEN nx.n_types IS NOT NULL
             |       THEN round((f.r + 1) * CAST(nx.n_types AS DOUBLE) /
             |            f.n_types, 6)
             |       ELSE NULL END AS r_star,
             |  round(CAST(tot.n1 AS DOUBLE) / tot.nn, 6) AS p_unseen
             |FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1
             |CROSS JOIN tot ORDER BY r""".stripMargin)),
    // Zipf rank-frequency fit (Zipf 1949; the log-log least-squares
    // diagnostic): slope ≈ −1 is the natural-language signature — a
    // corpus whose token distribution fits much flatter (scraped
    // boilerplate) or steeper (template spam) fails the sanity gate
    // before training. Word ranks come from the `countBelow` bucket
    // device over NEGATED counts (descending rank without a vocab-scale
    // single-partition window) + a within-count-group window (bounded
    // per distinct count); the OLS slope/intercept over (ln rank,
    // ln freq) sums 6-dp-rounded terms through the DECIMAL bridge (the
    // x85 ln discipline), so both engines reduce identical decimals.
    // Scale: one token shuffle, one |vocab| rank join, one 1-row fit.
    QuerySpec(
      "x174_zipf_fit",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val wc = Tables.documents(s, dir)
          .select(explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("r"))
          .withColumn("nr", -col("r"))
          .localCheckpoint() // consumed by the grid and the rank join
        val cb = countBelow(wc.groupBy("nr").agg(count(lit(1)).as("c")), "nr")
        val wi = W.partitionBy("nr").orderBy("w")
        val ranked = wc
          .withColumn("ri", row_number().over(wi).cast("long"))
          .join(cb.select(col("nr"), col("below")), "nr")
          .select(col("w"), col("r"), (col("below") + col("ri")).as("rank"))
        val terms = ranked.select(
          round(log(col("rank").cast("double")), 6).as("x"),
          round(log(col("r").cast("double")), 6).as("y"))
        val m = terms.agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
          sum(round(col("x") * col("y"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxy"),
          sum(round(col("x") * col("x"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxx"))
        m.select(col("n").as("n_types"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6)
              .as("zipf_slope"),
            round((col("sy") - ((col("n") * col("sxy") -
                col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
              col("n"), 6).as("intercept"))
          .orderBy("n_types")
      },
      Some("""WITH t AS (SELECT unnest(list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
             |        AS w
             |      FROM documents),
             |wc AS (SELECT w, COUNT(*) AS r FROM t GROUP BY 1),
             |rk AS (SELECT w, r,
             |        CAST(row_number() OVER (ORDER BY r DESC, w) AS BIGINT)
             |          AS rank
             |      FROM wc),
             |tm AS (SELECT round(ln(CAST(rank AS DOUBLE)), 6) AS x,
             |        round(ln(CAST(r AS DOUBLE)), 6) AS y
             |      FROM rk),
             |m AS (SELECT COUNT(*) AS n,
             |        CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxy,
             |        CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxx
             |      FROM tm)
             |SELECT CAST(n AS BIGINT) AS n_types,
             |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             |    AS zipf_slope,
             |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             |    / n, 6) AS intercept
             |FROM m ORDER BY n_types""".stripMargin)),
    // RAKE keyword extraction (Rose, Engel, Cramer & Cowley, "Automatic
    // Keyword Extraction from Individual Documents", Text Mining 2010) —
    // the degree/frequency device, a DIFFERENT extraction principle from
    // x160's TextRank (co-occurrence random walk): candidate phrases are
    // maximal runs of content words between delimiter tokens, word score =
    // deg(w)/freq(w) where deg counts phrase-length mass per occurrence,
    // phrase score = Σ member word scores. Delimiters are short words
    // (length < 4, the x160 convention) PLUS the paper's own §1.2.2
    // refinement — a FREQUENCY-GENERATED stoplist (the top-10 corpus
    // words), computed from the data, not hand-curated; candidates are
    // capped at 4 words (the standard RAKE candidate-length cap), which
    // keeps phrase keys bounded at any corpus size. Shapes:
    // gaps-and-islands (p − row_number) per doc builds phrases with
    // PER-DOC windows only; the stoplist is a 10-row broadcast; word
    // stats are plain groupBys; nothing pairwise anywhere (vs TextRank's
    // window-pair edges). Word scores are exact-rational doubles
    // (int/int); per-phrase sums ride the round-6 DECIMAL bridge so
    // phrase scores are engine-identical.
    QuerySpec(
      "x178_rake_keywords",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // Examined for the r16 fan-out pass and deliberately left on the
        // scan layout: the tokenize runs ONCE into this checkpoint (never
        // re-computed per consumer), so the fan-out exchange only added
        // cost — measured 1.98 -> 2.2-2.4 s isolated on two independent
        // windows with it, reverted.
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("p", "wd")))
          .filter(length(col("wd")) >= 4)
          .localCheckpoint() // one tokenize feeds the stoplist and islands
        val stop = tok.groupBy("wd").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("wd")).limit(10)
          .select(col("wd"))
        val ph = tok
          .join(broadcast(stop), Seq("wd"), "left_anti")
          .withColumn("grp",
            col("p") - row_number().over(W.partitionBy("doc_id").orderBy("p")))
          .localCheckpoint() // feeds members, lengths, freq
        val phLen = ph.groupBy("doc_id", "grp")
          .agg(count(lit(1)).as("ph_len"),
            concat_ws(" ",
              transform(array_sort(collect_list(struct(col("p"), col("wd")))),
                x => x.getField("wd"))).as("phrase"))
          .filter(col("ph_len") <= 4)
        // Word stats over CANDIDATE members only (the paper scores words
        // within the candidate keyword set, not the whole corpus).
        val members = ph.join(phLen.select("doc_id", "grp", "ph_len"),
          Seq("doc_id", "grp"))
        val score = members.groupBy("wd")
          .agg(count(lit(1)).as("freq"), sum(col("ph_len")).as("deg"))
          .select(col("wd"),
            (col("deg").cast("double") / col("freq").cast("double")).as("ws"))
        val phScore = members.join(broadcast(score), "wd")
          .groupBy("doc_id", "grp")
          .agg(sum(round(col("ws"), 6).cast("decimal(18,6)"))
            .cast("double").as("psc"))
        phLen.join(phScore, Seq("doc_id", "grp"))
          .groupBy("phrase")
          .agg(count(lit(1)).as("n_occ"), max(col("psc")).as("sc"),
            max(col("ph_len")).as("n_words"))
          .select(col("phrase"), col("n_words"), col("n_occ"),
            round(col("sc"), 6).as("score"))
          .orderBy(col("score").desc, col("phrase")).limit(10)
      },
      Some("""WITH t AS (SELECT doc_id,
             |        list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |      FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS wd,
             |        generate_subscripts(toks, 1) AS p FROM t),
             |cw AS (SELECT doc_id, wd, p FROM tok WHERE length(wd) >= 4),
             |stop AS (SELECT wd FROM (
             |        SELECT wd, COUNT(*) AS cnt FROM cw GROUP BY 1)
             |      ORDER BY cnt DESC, wd LIMIT 10),
             |tk AS (SELECT doc_id, wd, p,
             |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
             |      FROM cw WHERE wd NOT IN (SELECT wd FROM stop)),
             |pl AS (SELECT doc_id, grp, COUNT(*) AS ph_len,
             |        string_agg(wd, ' ' ORDER BY p) AS phrase
             |      FROM tk GROUP BY 1, 2
             |      HAVING COUNT(*) <= 4),
             |mem AS (SELECT tk.doc_id, tk.grp, tk.wd, pl.ph_len
             |      FROM tk JOIN pl USING (doc_id, grp)),
             |sc AS (SELECT wd,
             |        CAST(SUM(ph_len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ws
             |      FROM mem GROUP BY 1),
             |ps AS (SELECT mem.doc_id, mem.grp,
             |        CAST(SUM(CAST(round(sc.ws, 6) AS DECIMAL(18,6))) AS DOUBLE) AS psc
             |      FROM mem JOIN sc USING (wd) GROUP BY 1, 2)
             |SELECT pl.phrase, MAX(pl.ph_len) AS n_words, COUNT(*) AS n_occ,
             |  round(MAX(ps.psc), 6) AS score
             |FROM pl JOIN ps USING (doc_id, grp)
             |GROUP BY pl.phrase
             |ORDER BY score DESC, phrase LIMIT 10""".stripMargin)),
    // RFM segmentation (Hughes, "Strategic Database Marketing" 1994;
    // Fader, Hardie & Lee, J Interactive Marketing 19, 2005): score
    // every purchasing user 1–5 on Recency / Frequency / Monetary by
    // quintile, then map score triples to the marketing segments a
    // curation pipeline samples by. Quintile boundaries come from ONE
    // broadcast percentile row over integer inputs (days, counts,
    // cents — the x196 device, so Spark `percentile` and DuckDB
    // `quantile_cont` interpolate identically); each user's scores are
    // then row-local threshold counts — no ntile, no global sort, two
    // shuffles total (user aggregate + segment aggregate) at any scale.
    // Recency scores INVERTED (recent = 5). Monetary sums exact cents.
    QuerySpec(
      "x208_rfm_segments",
      (s, dir) => {
        val gmx = Tables.events(s, dir)
          .agg(max(to_date(col("ts"))).as("gmax"))
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .crossJoin(broadcast(gmx))
          .groupBy("user_id")
          .agg(min(datediff(col("gmax"), to_date(col("ts"))))
            .cast("long").as("rec"),
            count(lit(1)).as("freq"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
          .localCheckpoint() // feeds the percentile row and the scoring
        val qs = u.agg(
          expr("percentile(rec, array(0.2, 0.4, 0.6, 0.8))").as("qr"),
          expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").as("qf"),
          expr("percentile(cents, array(0.2, 0.4, 0.6, 0.8))").as("qm"))
        def score(c: org.apache.spark.sql.Column,
            q: org.apache.spark.sql.Column) =
          lit(1L) + (c > element_at(q, 1)).cast("long") +
            (c > element_at(q, 2)).cast("long") +
            (c > element_at(q, 3)).cast("long") +
            (c > element_at(q, 4)).cast("long")
        val scored = u.crossJoin(broadcast(qs))
          .select(col("cents"),
            (lit(6L) - score(col("rec"), col("qr"))).as("r"),
            score(col("freq"), col("qf")).as("f"),
            score(col("cents"), col("qm")).as("m"))
          .withColumn("segment",
            when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4,
              "champion")
              .when(col("f") >= 4, "loyal")
              .when(col("m") >= 4, "big spender")
              .when(col("r") <= 2 && col("f") >= 3, "at risk")
              .when(col("r") <= 2, "hibernating")
              .otherwise("regular"))
        scored.groupBy("segment")
          .agg(count(lit(1)).as("n_users"),
            round(avg(col("r")), 6).as("avg_r"),
            round(avg(col("f")), 6).as("avg_f"),
            round(sum(col("cents")).cast("double") / count(lit(1)) / 100.0,
              2).as("avg_spend"))
          .orderBy("segment")
      },
      Some("""WITH gmx AS (SELECT MAX(CAST(ts AS DATE)) AS gmax FROM events),
             |u AS (SELECT user_id,
             |        CAST(MIN(datediff('day', CAST(ts AS DATE), gmx.gmax))
             |          AS BIGINT) AS rec,
             |        COUNT(*) AS freq,
             |        SUM(CAST(round(value * 100) AS BIGINT)) AS cents
             |      FROM events CROSS JOIN gmx
             |      WHERE event_type = 'purchase' GROUP BY 1, gmx.gmax),
             |qs AS (SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS qr,
             |        quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS qf,
             |        quantile_cont(cents, [0.2, 0.4, 0.6, 0.8]) AS qm
             |      FROM u),
             |sc AS (SELECT cents,
             |        6 - (1 + CASE WHEN rec > qr[1] THEN 1 ELSE 0 END
             |          + CASE WHEN rec > qr[2] THEN 1 ELSE 0 END
             |          + CASE WHEN rec > qr[3] THEN 1 ELSE 0 END
             |          + CASE WHEN rec > qr[4] THEN 1 ELSE 0 END) AS r,
             |        1 + CASE WHEN freq > qf[1] THEN 1 ELSE 0 END
             |          + CASE WHEN freq > qf[2] THEN 1 ELSE 0 END
             |          + CASE WHEN freq > qf[3] THEN 1 ELSE 0 END
             |          + CASE WHEN freq > qf[4] THEN 1 ELSE 0 END AS f,
             |        1 + CASE WHEN cents > qm[1] THEN 1 ELSE 0 END
             |          + CASE WHEN cents > qm[2] THEN 1 ELSE 0 END
             |          + CASE WHEN cents > qm[3] THEN 1 ELSE 0 END
             |          + CASE WHEN cents > qm[4] THEN 1 ELSE 0 END AS m
             |      FROM u CROSS JOIN qs),
             |seg AS (SELECT cents, r, f, m,
             |        CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
             |             WHEN f >= 4 THEN 'loyal'
             |             WHEN m >= 4 THEN 'big spender'
             |             WHEN r <= 2 AND f >= 3 THEN 'at risk'
             |             WHEN r <= 2 THEN 'hibernating'
             |             ELSE 'regular' END AS segment
             |      FROM sc)
             |SELECT segment, COUNT(*) AS n_users,
             |  round(avg(r), 6) AS avg_r, round(avg(f), 6) AS avg_f,
             |  round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 2)
             |    AS avg_spend
             |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin)),
    // Query-likelihood retrieval with Dirichlet smoothing (Ponte &
    // Croft, SIGIR 1998; Zhai & Lafferty, SIGIR 2001, μ=300): the
    // language-model ranking alternative to x106's BM25 over the same
    // postings. log P(q|d) decomposes (the Zhai trick) into a SPARSE
    // matched-term part Σ qtf·ln(1 + c(w,d)/(μ·p(w|C))) served by the
    // inverted-index join, plus a per-candidate length part
    // |q|·ln(μ/(|d|+μ)) — so no dense query×corpus scan exists at any
    // scale; candidates are docs sharing a query term, exactly x106's
    // plan shape. p(w|C) is an exact BIGINT ratio; each ln term rounds
    // to 6 dp and DECIMAL-sums (add-order-proof); the final top-10 is
    // a qid-partitioned rank with WindowGroupLimit pushdown.
    QuerySpec(
      "x210_qlm_retrieval",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val tf = Bm25.termFreqs(Tables.documents(s, dir))
          .localCheckpoint() // postings feed cf, dl, queries, candidates
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val cstats = tf.agg(sum("tf").as("ctot"))
        val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
        val q = tf.filter(col("doc_id") < 3)
          .select(col("doc_id").as("qid"), col("term"),
            col("tf").as("qtf"))
        val qlen = q.groupBy("qid").agg(sum("qtf").as("qlen"))
        val matched = tf.join(broadcast(q.join(cf, "term")
            .crossJoin(cstats)
            .select(col("qid"), col("term"), col("qtf"),
              (col("cf").cast("double") / col("ctot")).as("pc"))), Seq("term"))
          .filter(col("doc_id") =!= col("qid"))
          .select(col("qid"), col("doc_id").as("cid"),
            round(col("qtf") * log(lit(1.0) +
              col("tf").cast("double") / (lit(300.0) * col("pc"))), 6)
              .as("contrib"))
          .groupBy("qid", "cid")
          .agg(count(lit(1)).as("n_terms"),
            sum(col("contrib").cast("decimal(18,6)")).cast("double")
              .as("match_part"))
        val sc = matched
          .join(dl.select(col("doc_id").as("cid"), col("dl")), "cid")
          .join(broadcast(qlen), "qid")
          .select(col("qid"), col("cid"), col("n_terms"),
            round(col("match_part") +
              round(col("qlen") * log(lit(300.0) /
                (col("dl") + lit(300.0))), 6), 6).as("score"))
        sc.withColumn("rn", row_number().over(
            W.partitionBy("qid").orderBy(col("score").desc, col("cid")))
            .cast("long"))
          .filter(col("rn") <= 10)
          .orderBy("qid", "rn")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
             |cs AS (SELECT SUM(tf) AS ctot FROM tf),
             |cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
             |q AS (SELECT tf.doc_id AS qid, tf.term, tf.tf AS qtf,
             |        CAST(cf.cf AS DOUBLE) / cs.ctot AS pc
             |      FROM tf JOIN cf USING (term) CROSS JOIN cs
             |      WHERE tf.doc_id < 3),
             |ql AS (SELECT qid, SUM(qtf) AS qlen FROM q GROUP BY 1),
             |m AS (SELECT q.qid, tf.doc_id AS cid,
             |        CAST(COUNT(*) AS BIGINT) AS n_terms,
             |        CAST(SUM(CAST(round(q.qtf * ln(1.0 +
             |          CAST(tf.tf AS DOUBLE) / (300.0 * q.pc)), 6)
             |          AS DECIMAL(18,6))) AS DOUBLE) AS match_part
             |      FROM tf JOIN q ON tf.term = q.term
             |        AND tf.doc_id <> q.qid
             |      GROUP BY 1, 2),
             |sc AS (SELECT m.qid, m.cid, m.n_terms,
             |        round(m.match_part + round(ql.qlen *
             |          ln(300.0 / (dl.dl + 300.0)), 6), 6) AS score
             |      FROM m JOIN dl ON dl.doc_id = m.cid
             |        JOIN ql ON ql.qid = m.qid)
             |SELECT qid, cid, n_terms, score,
             |  CAST(row_number() OVER (PARTITION BY qid
             |    ORDER BY score DESC, cid) AS BIGINT) AS rn
             |FROM sc QUALIFY rn <= 10 ORDER BY qid, rn""".stripMargin)),
    // Interpolated Kneser-Ney bigram LM (Kneser & Ney, ICASSP 1995;
    // Chen & Goodman, Harvard TR-10-98 — the smoothing inside KenLM,
    // i.e. the actual CCNet/quality-filter perplexity model, where
    // x44's add-one is the classroom baseline): train on even doc_ids,
    // score held-out odd docs per source. P(w2|w1) = max(c12−D,0)/c1 +
    // D·N1+(w1,·)/c1 · Pcont(w2), D = 0.75, with the CONTINUATION
    // probability Pcont(w2) = (N1+(·,w2)+1)/(T+V) — distinct-context
    // counts, not raw frequency (the Kneser insight: "Francisco" is
    // frequent but follows only "San"), +1/V-floored so unseen held-out
    // words score finitely instead of ln 0. Unseen w1 backs off to
    // Pcont alone. Per-bigram ln rounds to 6 dp into DECIMAL sums (the
    // x44 device). Scale shape: identical to x44 — shuffles keyed on
    // bigram, first-word, and second-word, all size-driven joins, one
    // bounded per-source reduce.
    QuerySpec(
      "x218_kneser_ney",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextFunctions.tokens(col("text")).as("ws"))
          .filter(size(col("ws")) >= 2)
        val big = toks.select(col("doc_id"), col("source"),
            explode(expr("transform(sequence(0, size(ws)-2), " +
              "i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
          .select(col("doc_id"), col("source"),
            col("b.w1").as("w1"), col("b.w2").as("w2"))
        val bg = big.filter(col("doc_id") % 2 === 0)
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          .localCheckpoint() // feeds c1, continuation counts, totals, scoring
        val c1 = bg.groupBy("w1")
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
        val cont = bg.groupBy("w2").agg(count(lit(1)).as("nc"))
        val tots = bg.agg(count(lit(1)).as("tbt"))
        val vc = cont.agg(count(lit(1)).as("vc"))
        val pcont = (coalesce(col("nc"), lit(0L)) + 1).cast("double") /
          (col("tbt") + col("vc"))
        val p = when(col("c1").isNull, pcont)
          .otherwise(
            greatest(coalesce(col("c12"), lit(0L)).cast("double") - 0.75,
              lit(0.0)) / col("c1") +
              lit(0.75) * col("n1p") / col("c1") * pcont)
        big.filter(col("doc_id") % 2 === 1)
          .join(bg, Seq("w1", "w2"), "left")
          .join(c1, Seq("w1"), "left")
          .join(cont, Seq("w2"), "left")
          .crossJoin(broadcast(tots)).crossJoin(broadcast(vc))
          .select(col("doc_id"), col("source"),
            round(log(p), 6).cast("decimal(18,6)").as("lp"))
          .groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_bigrams"),
            round(-sum(col("lp")).cast("double") / count(lit(1)), 6)
              .as("xent"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |        list_filter(regexp_split_to_array(trim(text), '\s+'),
             |          x -> x <> '') AS ws FROM documents),
             |big AS (SELECT doc_id, source, ws[i] AS w1, ws[i+1] AS w2
             |      FROM d, unnest(range(1, len(ws))) r(i)
             |      WHERE len(ws) >= 2),
             |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM big
             |      WHERE doc_id % 2 = 0 GROUP BY 1, 2),
             |c1 AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p
             |      FROM bg GROUP BY 1),
             |cont AS (SELECT w2, COUNT(*) AS nc FROM bg GROUP BY 1),
             |tots AS (SELECT COUNT(*) AS tbt FROM bg),
             |vcq AS (SELECT COUNT(*) AS vc FROM cont),
             |sc AS (SELECT te.doc_id, te.source,
             |        CAST(round(ln(CASE WHEN c1.c1 IS NULL
             |          THEN CAST(COALESCE(cont.nc, 0) + 1 AS DOUBLE)
             |            / (tots.tbt + vcq.vc)
             |          ELSE greatest(CAST(COALESCE(bg.c12, 0) AS DOUBLE)
             |              - 0.75, 0.0)
             |            / c1.c1 + 0.75 * c1.n1p / c1.c1 *
             |            (CAST(COALESCE(cont.nc, 0) + 1 AS DOUBLE)
             |              / (tots.tbt + vcq.vc))
             |          END), 6) AS DECIMAL(18,6)) AS lp
             |      FROM big te
             |      LEFT JOIN bg ON bg.w1 = te.w1 AND bg.w2 = te.w2
             |      LEFT JOIN c1 ON c1.w1 = te.w1
             |      LEFT JOIN cont ON cont.w2 = te.w2
             |      CROSS JOIN tots CROSS JOIN vcq
             |      WHERE te.doc_id % 2 = 1)
             |SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
             |  COUNT(*) AS n_bigrams,
             |  round(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS xent
             |FROM sc GROUP BY 1 ORDER BY source""".stripMargin)),
    // Heaps'-law vocabulary-growth fit (Heaps 1978; Herdan 1960):
    // V(n) = K·n^β — how fast the type inventory grows as the corpus
    // does, THE capacity question behind tokenizer sizing and
    // dedup-payoff forecasts (β near 1 = unbounded novelty, e.g.
    // boilerplate IDs; lower β = saturating reuse). Types are WORD
    // TRIGRAM shingles (the x2/x4 dedup unit — and the harness corpus
    // has a 31-word closed unigram vocabulary, which saturates in the
    // first prefix; trigram contexts are what actually grow). The
    // at-scale trick: V(n) at a prefix is #{types whose FIRST occurrence
    // falls inside it} — one min(doc_id) aggregate per type, never a
    // distinct-count per prefix. 20 integer doc-id thresholds bucket
    // both docs and first occurrences; prefix counts are cumulative
    // sums over the 20-row grid (aggregate below window = Rule-1
    // escape); the fit is the x174 log-log OLS with rounded-6
    // DECIMAL-bridged terms. exp appears once, on the final rounded
    // intercept (the x206/x211 precedent).
    QuerySpec(
      "x222_heaps_law",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val bounds = docs.agg(min(col("doc_id")).as("lo"),
          (max(col("doc_id")) - min(col("doc_id")) + 1L).as("span"))
        val grid = s.range(20).toDF("b")
        val dbkt = docs.crossJoin(broadcast(bounds))
          .select(expr("(doc_id - lo) * 20 div span").as("b"))
          .groupBy("b").agg(count(lit(1)).as("nd"))
        val wbkt = docs
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(ws) - 3), " +
              "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))")).as("w"))
          .groupBy("w").agg(min(col("doc_id")).as("fd"))
          .crossJoin(broadcast(bounds))
          .select(expr("(fd - lo) * 20 div span").as("b"))
          .groupBy("b").agg(count(lit(1)).as("nv"))
        val wc = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
        val pref = grid
          .join(dbkt, Seq("b"), "left").na.fill(0L, Seq("nd"))
          .join(wbkt, Seq("b"), "left").na.fill(0L, Seq("nv"))
          .withColumn("n", sum(col("nd")).over(wc))
          .withColumn("v", sum(col("nv")).over(wc))
          .filter(col("n") > 0 && col("v") > 0)
        val terms = pref.select(
          round(log(col("n").cast("double")), 6).as("x"),
          round(log(col("v").cast("double")), 6).as("y"),
          col("n"), col("v"))
        val m = terms.agg(count(lit(1)).as("np"),
          max(col("n")).as("n_docs"), max(col("v")).as("n_types"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
          sum(round(col("x") * col("y"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxy"),
          sum(round(col("x") * col("x"), 6).cast("decimal(18,6)"))
            .cast("double").as("sxx"))
        val slope = (col("np") * col("sxy") - col("sx") * col("sy")) /
          (col("np") * col("sxx") - col("sx") * col("sx"))
        m.select(col("np").as("n_points"), col("n_docs"), col("n_types"),
            (round(slope, 6) + lit(0.0)).as("heaps_beta"),
            round(exp(round((col("sy") - slope * col("sx")) / col("np"), 6)),
              6).as("heaps_k"))
          .orderBy("n_points")
      },
      Some("""WITH bounds AS (SELECT MIN(doc_id) AS lo,
             |        MAX(doc_id) - MIN(doc_id) + 1 AS span FROM documents),
             |dbkt AS (SELECT (d.doc_id - b.lo) * 20 // b.span
             |          AS b, COUNT(*) AS nd
             |      FROM documents d CROSS JOIN bounds b GROUP BY 1),
             |tk AS (SELECT doc_id, list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> '')
             |        AS toks
             |      FROM documents),
             |t AS (SELECT doc_id,
             |        unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                for i in range(1, len(toks) - 1)]) AS w
             |      FROM tk WHERE len(toks) >= 3),
             |fw AS (SELECT w, MIN(doc_id) AS fd FROM t GROUP BY 1),
             |wbkt AS (SELECT (f.fd - b.lo) * 20 // b.span
             |          AS b, COUNT(*) AS nv
             |      FROM fw f CROSS JOIN bounds b GROUP BY 1),
             |grid AS (SELECT g.g AS b FROM range(0, 20) g(g)),
             |pref AS (SELECT grid.b,
             |        SUM(COALESCE(dbkt.nd, 0)) OVER (ORDER BY grid.b
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS n,
             |        SUM(COALESCE(wbkt.nv, 0)) OVER (ORDER BY grid.b
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS v
             |      FROM grid LEFT JOIN dbkt ON dbkt.b = grid.b
             |      LEFT JOIN wbkt ON wbkt.b = grid.b),
             |terms AS (SELECT round(ln(CAST(n AS DOUBLE)), 6) AS x,
             |        round(ln(CAST(v AS DOUBLE)), 6) AS y, n, v
             |      FROM pref WHERE n > 0 AND v > 0),
             |m AS (SELECT COUNT(*) AS np, MAX(n) AS n_docs,
             |        MAX(v) AS n_types,
             |        CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxy,
             |        CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(18,6)))
             |          AS DOUBLE) AS sxx
             |      FROM terms)
             |SELECT CAST(np AS BIGINT) AS n_points,
             |  CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  round((np * sxy - sx * sy) / (np * sxx - sx * sx), 6) + 0.0
             |    AS heaps_beta,
             |  round(exp(round((sy - ((np * sxy - sx * sy) /
             |      (np * sxx - sx * sx)) * sx) / np, 6)), 6) AS heaps_k
             |FROM m ORDER BY n_points""".stripMargin)),
    // Self-BLEU corpus diversity (Papineni et al., ACL 2002 BLEU; the
    // self-BLEU diversity read of Zhu et al., SIGIR 2018 "Texygen"): how
    // much each document's n-grams are already covered by OTHER docs —
    // HIGH self-BLEU = mode collapse, the synthetic-data failure x72's
    // within-doc repetition can't see (it reads one doc at a time).
    // Modified n-gram precision clips each doc-gram count against the
    // best count for that gram in any OTHER single doc: per gram the
    // top-2 (count, doc) pairs suffice (rank ≤ 2 per gram plans a
    // WindowGroupLimit — the x221 device), so the clip table is two
    // bounded columns per gram, never a doc × gram fan-out. p₁, p₂ are
    // exact integer ratios; √(p₁p₂) rounds to 6 per doc (bounded-risk
    // corpus-grain transcendental, the x225 class) and averages per
    // source through the DECIMAL bridge.
    QuerySpec(
      "x230_self_bleu",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        // fan the under-split scan before tokenize: toks feeds BOTH
        // precision passes' gram explodes (guide §2.5; no-op on a
        // well-split table)
        val toks = Tables.fanOut(Tables.documents(s, dir)
            .select(col("doc_id"), col("source"), col("text")),
            col("doc_id"))
          .select(col("doc_id"), col("source"),
            TextFunctions.tokens(col("text")).as("ws"))
          .filter(size(col("ws")) >= 2)
        def prec(gramExpr: String): org.apache.spark.sql.DataFrame = {
          val dg = toks
            .select(col("doc_id"), col("source"),
              explode(expr(gramExpr)).as("g"))
            .groupBy("doc_id", "source", "g")
            .agg(count(lit(1)).as("c"))
          val top2 = dg
            .withColumn("rn", row_number().over(
              W.partitionBy("g").orderBy(col("c").desc, col("doc_id"))))
            .filter(col("rn") <= 2)
            .groupBy("g")
            .agg(max(when(col("rn") === 1,
                struct(col("c").as("c"), col("doc_id").as("d")))).as("m1"),
              max(when(col("rn") === 2, col("c"))).as("m2"))
          dg.join(top2, "g")
            .select(col("doc_id"), col("source"), col("c"),
              when(col("doc_id") === col("m1.d"),
                coalesce(col("m2"), lit(0L)))
                .otherwise(col("m1.c")).as("clip"))
            .groupBy("doc_id", "source")
            .agg(sum(least(col("c"), col("clip"))).as("num"),
              sum(col("c")).as("den"))
        }
        val p1 = prec("ws")
          .select(col("doc_id"), col("source"),
            col("num").as("n1"), col("den").as("d1"))
        val p2 = prec("transform(sequence(0, size(ws) - 2), " +
            "i -> concat(ws[i], ' ', ws[i+1]))")
          .select(col("doc_id"), col("num").as("n2"), col("den").as("d2"))
        val perDoc = p1.join(p2, "doc_id")
          .select(col("source"),
            round(sqrt((col("n1").cast("double") / col("d1")) *
              (col("n2").cast("double") / col("d2"))), 6).as("bleu"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("bleu").cast("decimal(18,6)")).cast("double") /
              count(lit(1))).as("sb"))
          .select(col("source"), col("n_docs"),
            round(col("sb"), 6).as("self_bleu"),
            round(lit(1.0) - col("sb"), 6).as("diversity"))
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT doc_id, source, list_filter(
             |        regexp_split_to_array(trim(text), '\s+'), x -> x <> '')
             |        AS ws
             |      FROM documents),
             |d AS (SELECT doc_id, source, ws FROM tk WHERE len(ws) >= 2),
             |g1 AS (SELECT doc_id, source, unnest(ws) AS g FROM d),
             |dg1 AS (SELECT doc_id, source, g, COUNT(*) AS c
             |      FROM g1 GROUP BY 1, 2, 3),
             |t1 AS (SELECT g, doc_id, c, row_number() OVER (PARTITION BY g
             |        ORDER BY c DESC, doc_id) AS rn FROM dg1),
             |m1 AS (SELECT g,
             |        MAX(CASE WHEN rn = 1 THEN c END) AS m1c,
             |        MAX(CASE WHEN rn = 1 THEN doc_id END) AS m1d,
             |        MAX(CASE WHEN rn = 2 THEN c END) AS m2c
             |      FROM t1 WHERE rn <= 2 GROUP BY 1),
             |pr1 AS (SELECT dg1.doc_id, dg1.source,
             |        SUM(least(dg1.c, CASE WHEN dg1.doc_id = m1.m1d
             |          THEN COALESCE(m1.m2c, 0) ELSE m1.m1c END)) AS n1,
             |        SUM(dg1.c) AS d1
             |      FROM dg1 JOIN m1 USING (g) GROUP BY 1, 2),
             |g2 AS (SELECT doc_id, source,
             |        unnest([ws[i] || ' ' || ws[i+1]
             |                for i in range(1, len(ws))]) AS g
             |      FROM d),
             |dg2 AS (SELECT doc_id, source, g, COUNT(*) AS c
             |      FROM g2 GROUP BY 1, 2, 3),
             |t2 AS (SELECT g, doc_id, c, row_number() OVER (PARTITION BY g
             |        ORDER BY c DESC, doc_id) AS rn FROM dg2),
             |m2 AS (SELECT g,
             |        MAX(CASE WHEN rn = 1 THEN c END) AS m1c,
             |        MAX(CASE WHEN rn = 1 THEN doc_id END) AS m1d,
             |        MAX(CASE WHEN rn = 2 THEN c END) AS m2c
             |      FROM t2 WHERE rn <= 2 GROUP BY 1),
             |pr2 AS (SELECT dg2.doc_id,
             |        SUM(least(dg2.c, CASE WHEN dg2.doc_id = m2.m1d
             |          THEN COALESCE(m2.m2c, 0) ELSE m2.m1c END)) AS n2,
             |        SUM(dg2.c) AS d2
             |      FROM dg2 JOIN m2 USING (g) GROUP BY 1),
             |pd AS (SELECT pr1.source,
             |        round(sqrt((CAST(pr1.n1 AS DOUBLE) / pr1.d1) *
             |          (CAST(pr2.n2 AS DOUBLE) / pr2.d2)), 6) AS bleu
             |      FROM pr1 JOIN pr2 ON pr2.doc_id = pr1.doc_id),
             |agg AS (SELECT source, COUNT(*) AS n_docs,
             |        CAST(SUM(CAST(bleu AS DECIMAL(18,6))) AS DOUBLE)
             |          / COUNT(*) AS sb
             |      FROM pd GROUP BY 1)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |  round(sb, 6) AS self_bleu,
             |  round(1.0 - sb, 6) AS diversity
             |FROM agg ORDER BY source""".stripMargin)),
    // Log-likelihood-ratio keyness (Dunning, Computational Linguistics
    // 1993 — the corpus-linguistics standard that replaced chi-square
    // for sparse counts): per source, the top-5 OVER-REPRESENTED tokens
    // by the G² statistic of the 2×2 (source vs rest) × (term vs other
    // terms) table — "what vocabulary makes this source itself", the
    // corpus-comparison read that x85's PMI (co-occurrence within
    // baskets) and x29's tf-idf (doc-level salience) don't give.
    // G² = 2·Σ k·ln(k/E) over the 4 cells with the 0·ln0 = 0 convention;
    // each cell ratio is k·N/(row·col) — exact integers pushed through
    // ONE double division — and the four rounded-6 contributions are
    // DECIMAL-summed (a plain double sum of rounded values drifts ~1e-10
    // and can straddle the 4-dp output round across ~60k terms). Per-
    // source top-5 is a rank-over-(llr, term) WindowGroupLimit on the
    // vocab-bounded scored grid.
    QuerySpec(
      "x241_llr_keyness",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, dir)
          .select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
        val st = tok.groupBy("source", "tok").agg(count(lit(1)).as("a"))
        val gt = st.groupBy("tok").agg(sum(col("a")).as("g"))
        val srcTot = st.groupBy("source").agg(sum(col("a")).as("rt"))
        val nTot = srcTot.agg(sum(col("rt")).as("nn"))
        val full = st.join(gt, Seq("tok")).join(broadcast(srcTot),
            Seq("source"))
          .crossJoin(broadcast(nTot))
          .select(col("source"), col("tok"), col("a"), col("g"),
            col("rt"), col("nn"),
            (col("g") - col("a")).as("b"),
            (col("rt") - col("a")).as("c"),
            (col("nn") - col("g") - col("rt") + col("a")).as("d"))
        def xl(k: org.apache.spark.sql.Column,
            row: org.apache.spark.sql.Column,
            ct: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          when(k > 0, round(k.cast("double") *
            log(k.cast("double") * col("nn") /
              (row.cast("double") * ct)), 6))
            .otherwise(lit(0.0)).cast("decimal(18,6)")
        val scored = full.select(col("source"), col("tok"), col("a"),
          round((xl(col("a"), col("rt"), col("g")) +
            xl(col("b"), col("nn") - col("rt"), col("g")) +
            xl(col("c"), col("rt"), col("nn") - col("g")) +
            xl(col("d"), col("nn") - col("rt"), col("nn") - col("g")))
            .cast("double") * 2, 4).as("llr"),
          (col("a").cast("double") * col("nn") >
            col("g").cast("double") * col("rt")).as("over"))
        val wr = W.partitionBy("source")
          .orderBy(col("llr").desc, col("tok"))
        scored.filter(col("over"))
          .withColumn("rank", row_number().over(wr))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank"), col("tok").as("term"),
            col("a").as("freq"), col("llr"))
          .orderBy("source", "rank")
      },
      Some("""WITH tk AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS tok
             |      FROM documents),
             |st AS (SELECT source, tok, COUNT(*) AS a FROM tk
             |      GROUP BY 1, 2),
             |gt AS (SELECT tok, SUM(a) AS g FROM st GROUP BY 1),
             |rt AS (SELECT source, SUM(a) AS rt FROM st GROUP BY 1),
             |nn AS (SELECT SUM(rt) AS nn FROM rt),
             |f AS (SELECT st.source, st.tok, st.a, gt.g, rt.rt, nn.nn,
             |        gt.g - st.a AS b, rt.rt - st.a AS c,
             |        nn.nn - gt.g - rt.rt + st.a AS d
             |      FROM st JOIN gt USING (tok) JOIN rt USING (source)
             |      CROSS JOIN nn),
             |sc AS (SELECT source, tok, a,
             |        round(CAST(
             |          CAST(CASE WHEN a > 0 THEN round(CAST(a AS DOUBLE) *
             |            ln(CAST(a AS DOUBLE) * nn / (CAST(rt AS DOUBLE)
             |            * g)), 6) ELSE 0.0 END AS DECIMAL(18,6)) +
             |          CAST(CASE WHEN b > 0 THEN round(CAST(b AS DOUBLE) *
             |            ln(CAST(b AS DOUBLE) * nn / (CAST(nn - rt
             |            AS DOUBLE) * g)), 6) ELSE 0.0 END
             |            AS DECIMAL(18,6)) +
             |          CAST(CASE WHEN c > 0 THEN round(CAST(c AS DOUBLE) *
             |            ln(CAST(c AS DOUBLE) * nn / (CAST(rt AS DOUBLE)
             |            * (nn - g))), 6) ELSE 0.0 END
             |            AS DECIMAL(18,6)) +
             |          CAST(CASE WHEN d > 0 THEN round(CAST(d AS DOUBLE) *
             |            ln(CAST(d AS DOUBLE) * nn / (CAST(nn - rt
             |            AS DOUBLE) * (nn - g))), 6) ELSE 0.0 END
             |            AS DECIMAL(18,6))
             |          AS DOUBLE) * 2, 4) AS llr
             |      FROM f
             |      WHERE CAST(a AS DOUBLE) * nn > CAST(g AS DOUBLE) * rt),
             |r AS (SELECT source, tok, a, llr, row_number() OVER (
             |        PARTITION BY source ORDER BY llr DESC, tok) AS rank
             |      FROM sc)
             |SELECT source, CAST(rank AS BIGINT) AS rank, tok AS term,
             |  CAST(a AS BIGINT) AS freq, llr
             |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin)),
    // Burrows' Delta stylometric distance (Burrows, LLC 2002; Argamon
    // 2008 for the formal reading as Manhattan distance in z-space):
    // pairwise source distance over the z-scored relative frequencies of
    // the top-50 corpus-wide tokens — the STYLOMETRY read (who writes
    // like whom) next to x59's KL and x219's JS divergences (which
    // compare full distributions, not function-word style profiles).
    // Top-50 is a rank over the vocab-bounded global counts; the
    // source × top-word grid is zero-filled (a missing function word IS
    // stylometric signal); per-word mean/σ across the 20 sources from
    // exact DECIMAL moments of rounded-9 frequencies; σ=0 words
    // contribute z=0 on both engines. The pair set is the source grid's
    // own square — 190 pairs at any corpus size.
    QuerySpec(
      "x243_burrows_delta",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val st = Tables.documents(s, dir)
          .select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("a"))
        val top = st.groupBy("tok").agg(sum(col("a")).as("g"))
          .withColumn("rk", row_number().over(
            W.orderBy(col("g").desc, col("tok"))))
          .filter(col("rk") <= 50)
          .select("tok")
        val rt = st.groupBy("source").agg(sum(col("a")).as("rt"))
        val grid = rt.crossJoin(broadcast(top))
          .join(st, Seq("source", "tok"), "left")
          .na.fill(0L, Seq("a"))
          .select(col("source"), col("tok"),
            round(col("a").cast("double") / col("rt"), 9).as("f"))
        val ms = grid.groupBy("tok").agg(
            count(lit(1)).as("ns"),
            sum(col("f").cast("decimal(18,9)")).cast("double").as("sf"),
            sum(round(col("f") * col("f"), 9).cast("decimal(18,9)"))
              .cast("double").as("sff"))
          .select(col("tok"),
            round(col("sf") / col("ns"), 12).as("mu"),
            round(sqrt(greatest(col("sff") / col("ns") -
              round(col("sf") / col("ns"), 12) *
              round(col("sf") / col("ns"), 12), lit(0.0))), 9).as("sg"))
        val z = grid.join(broadcast(ms), Seq("tok"))
          .select(col("source"), col("tok"),
            when(col("sg") > 0,
              round((col("f") - col("mu")) / col("sg"), 6))
              .otherwise(lit(0.0)).as("z"))
        val pairs = z.as("x").join(z.as("y"),
            col("x.tok") === col("y.tok") &&
              col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("source_a"),
            col("y.source").as("source_b"))
          .agg(count(lit(1)).as("n_words"),
            sum(round(abs(col("x.z") - col("y.z")), 6)
              .cast("decimal(18,6)")).cast("double").as("sd"))
          .select(col("source_a"), col("source_b"),
            // round at 8, not 6: sd is an exact 6-dp DECIMAL and /50
            // widens it to exactly 8 decimal digits, so a 6-dp round can
            // land on a TRUE decimal tie (hit in verification: .xxxxxx50)
            // where Spark's shortest-repr HALF_UP and DuckDB's binary
            // round disagree; at 8 the quotient is exact — no tie class
            round(col("sd") / col("n_words"), 8).as("delta"))
        pairs.orderBy("source_a", "source_b")
      },
      Some("""WITH tk AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS tok
             |      FROM documents),
             |st AS (SELECT source, tok, COUNT(*) AS a FROM tk
             |      GROUP BY 1, 2),
             |top AS (SELECT tok FROM (SELECT tok, row_number() OVER (
             |        ORDER BY SUM(a) DESC, tok) AS rk FROM st GROUP BY tok)
             |      WHERE rk <= 50),
             |rt AS (SELECT source, SUM(a) AS rt FROM st GROUP BY 1),
             |grid AS (SELECT rt.source, top.tok,
             |        round(CAST(COALESCE(st.a, 0) AS DOUBLE) / rt.rt, 9)
             |          AS f
             |      FROM rt CROSS JOIN top
             |      LEFT JOIN st ON st.source = rt.source
             |        AND st.tok = top.tok),
             |ms AS (SELECT tok, COUNT(*) AS ns,
             |        CAST(SUM(CAST(f AS DECIMAL(18,9))) AS DOUBLE) AS sf,
             |        CAST(SUM(CAST(round(f * f, 9) AS DECIMAL(18,9)))
             |          AS DOUBLE) AS sff
             |      FROM grid GROUP BY 1),
             |m2 AS (SELECT tok, round(sf / ns, 12) AS mu,
             |        round(sqrt(greatest(sff / ns -
             |          round(sf / ns, 12) * round(sf / ns, 12), 0.0)), 9)
             |          AS sg
             |      FROM ms),
             |z AS (SELECT grid.source, grid.tok,
             |        CASE WHEN m2.sg > 0
             |          THEN round((grid.f - m2.mu) / m2.sg, 6)
             |          ELSE 0.0 END AS z
             |      FROM grid JOIN m2 USING (tok))
             |SELECT x.source AS source_a, y.source AS source_b,
             |  round(CAST(SUM(CAST(round(abs(x.z - y.z), 6)
             |    AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 8) AS delta
             |FROM z x JOIN z y ON y.tok = x.tok AND x.source < y.source
             |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin)),
    // Flesch readability (Flesch, J.Appl.Psych 1948; Kincaid et al.
    // 1975 for the grade-level recast): per-source reading ease and
    // FK grade from words/sentences/syllables — the classic
    // curation-filter feature the x23/x72 quality reads don't include
    // (C4 and friends gate on sentence structure; readability is the
    // one-number summary reviewers expect). Syllables are the standard
    // dependency-free proxy — vowel-group runs, floor 1 per word —
    // and sentences are [.!?]+ runs, floor 1 per doc; both are one
    // regexp_count per doc (row-local, codegen'd), the per-doc scores
    // are exact rationals rounded 6, and source means ride the DECIMAL
    // bridge.
    QuerySpec(
      "x249_readability",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("source"),
            TextFunctions.tokens(col("text")).as("ws"), col("text"))
          .filter(size(col("ws")) > 0)
          .select(col("source"), size(col("ws")).cast("long").as("w"),
            greatest(expr("CAST(regexp_count(text, '[.!?]+') AS LONG)"),
              lit(1L)).as("sen"),
            expr("""aggregate(transform(ws, x ->
              greatest(CAST(regexp_count(x, '[aeiouy]+') AS LONG),
              CAST(1 AS LONG))), CAST(0 AS LONG), (a, b) -> a + b)""")
              .as("syl"))
        val scored = d.select(col("source"),
          round(lit(206.835) - lit(1.015) * col("w") / col("sen") -
            lit(84.6) * col("syl") / col("w"), 6).as("fre"),
          round(lit(0.39) * col("w") / col("sen") +
            lit(11.8) * col("syl") / col("w") - lit(15.59), 6).as("fk"))
        scored.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("fre").cast("decimal(18,6)")).cast("double") /
              count(lit(1)), 4).as("mean_reading_ease"),
            round(sum(col("fk").cast("decimal(18,6)")).cast("double") /
              count(lit(1)), 4).as("mean_fk_grade"),
            round(sum(when(col("fre") >= 60, 1L).otherwise(0L))
              .cast("double") / count(lit(1)), 6).as("share_easy"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, text,
             |        list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '') AS ws
             |      FROM documents),
             |d AS (SELECT source, CAST(len(ws) AS BIGINT) AS w,
             |        greatest(CAST(len(regexp_extract_all(text,
             |          '[.!?]+')) AS BIGINT), 1) AS sen,
             |        CAST(list_sum([greatest(len(regexp_extract_all(x,
             |          '[aeiouy]+')), 1) for x in ws]) AS BIGINT) AS syl
             |      FROM t WHERE len(ws) > 0),
             |sc AS (SELECT source,
             |        round(206.835 - 1.015 * w / sen - 84.6 * syl / w, 6)
             |          AS fre,
             |        round(0.39 * w / sen + 11.8 * syl / w - 15.59, 6)
             |          AS fk
             |      FROM d)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  round(CAST(SUM(CAST(fre AS DECIMAL(18,6))) AS DOUBLE)
             |    / COUNT(*), 4) AS mean_reading_ease,
             |  round(CAST(SUM(CAST(fk AS DECIMAL(18,6))) AS DOUBLE)
             |    / COUNT(*), 4) AS mean_fk_grade,
             |  round(CAST(SUM(CASE WHEN fre >= 60 THEN 1 ELSE 0 END)
             |    AS DOUBLE) / COUNT(*), 6) AS share_easy
             |FROM sc GROUP BY 1 ORDER BY source""".stripMargin)),
    // Yule's characteristic K (Yule 1944, "The Statistical Study of
    // Literary Vocabulary") + Simpson's repeat-rate D per source —
    // length-invariant vocabulary-richness constants where x222's Heaps
    // fit prices vocabulary GROWTH: K = 10⁴·(Σm²V_m − N)/N² measures
    // repetitiveness of the frequency spectrum itself, the classic
    // authorship/MT-detection feature (template-generated and
    // model-generated text drives K up; Burrows x243 reads WHICH words,
    // K reads the shape). Everything to the final division is exact
    // BIGINT on the token-count spectrum (Σf and Σf² per source, no
    // doubles in any shuffle); the whitespace tokenization is x9's
    // convention so both engines split identically.
    QuerySpec(
      "x254_yule_k",
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("source"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("f"))
        tf.groupBy("source")
          .agg(sum(col("f")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            sum(col("f") * col("f")).as("f2"),
            sum(col("f") * (col("f") - 1L)).as("rep"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            round(lit(10000.0) *
              (col("f2") - col("n_tokens")).cast("double") /
              (col("n_tokens").cast("double") * col("n_tokens")), 6)
              .as("yule_k"),
            round(col("rep").cast("double") /
              (col("n_tokens").cast("double") * (col("n_tokens") - 1L)), 9)
              .as("simpson_d"))
          .orderBy("source")
      },
      Some("""WITH tok AS (SELECT source,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS token
             |      FROM documents),
             |tf AS (SELECT source, token, COUNT(*) AS f FROM tok
             |      GROUP BY 1, 2)
             |SELECT source, CAST(SUM(f) AS BIGINT) AS n_tokens,
             |  COUNT(*) AS vocab,
             |  round(10000.0 * CAST(SUM(f * f) - SUM(f) AS DOUBLE) /
             |    (CAST(SUM(f) AS DOUBLE) * SUM(f)), 6) AS yule_k,
             |  round(CAST(SUM(f * (f - 1)) AS DOUBLE) /
             |    (CAST(SUM(f) AS DOUBLE) * (SUM(f) - 1)), 9) AS simpson_d
             |FROM tf GROUP BY source ORDER BY source""".stripMargin)),
    // Markov entropy rate (Shannon 1948 §7; Cover & Thomas ch. 4 for
    // H(X_{t+1}|X_t) as the first-order rate; Song, Qu, Blumm & Barabási,
    // Science 2010 use exactly this as behavioral "predictability"): the
    // plug-in conditional entropy of the next event type given the
    // current one, over the x79 per-user transition sequences — the
    // single-number read OF x79's matrix (x79 reports p_ij; this prices
    // how much those conditionals actually buy over the marginal:
    // predictability_gain = 1 − H_rate/H_marginal). π̂ is the empirical
    // source-state distribution (the MLE under stationarity — no power
    // iteration needed, unlike x239's absorbing-chain read). Per-state
    // rows carry π̂ and the row entropy; transition counts are exact
    // BIGINTs, each ln lands on an exact-rational argument rounded 6
    // into DECIMAL sums (the x262 discipline).
    QuerySpec(
      "x264_entropy_rate",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy("user_id").orderBy("ts", "event_id")
        val tr = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
          .localCheckpoint() // <=25 rows
        val rh = tr.withColumn("na",
            sum(col("n")).over(W.partitionBy("event_type")))
          .select(col("event_type"), col("na"),
            round((col("n").cast("double") / col("na")) *
              log(col("n").cast("double") / col("na")), 6)
              .cast("decimal(38,6)").as("t"))
          .groupBy("event_type", "na")
          .agg((-sum(col("t")).cast("double")).as("h_state"))
        val tot = rh.agg(sum(col("na")).as("nt"))
        val st = rh.crossJoin(broadcast(tot))
          .select(col("event_type"), col("na"), col("nt"),
            round(col("na").cast("double") / col("nt"), 9).as("pi"),
            round(col("h_state"), 6).as("h_state"))
          .localCheckpoint() // 5 rows
        val hr = st.agg(
          sum(round(col("pi") * col("h_state"), 9).cast("decimal(38,9)"))
            .cast("double").as("h_rate"),
          (-sum(round((col("na").cast("double") / col("nt")) *
            log(col("na").cast("double") / col("nt")), 9)
            .cast("decimal(38,9)")).cast("double")).as("h_marg"))
        st.crossJoin(broadcast(hr))
          .select(col("event_type"), col("na").as("n_from"),
            round(col("pi"), 6).as("pi"), col("h_state"),
            round(col("h_rate"), 6).as("h_rate_nats"),
            round(col("h_marg"), 6).as("h_marginal_nats"),
            round(lit(1.0) - col("h_rate") / col("h_marg"), 6)
              .as("predictability_gain"))
          .orderBy("event_type")
      },
      Some("""WITH sq AS (SELECT user_id, event_type,
             |        lead(event_type) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS next_type
             |      FROM events),
             |tr AS (SELECT event_type, next_type, COUNT(*) AS n FROM sq
             |      WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |na AS (SELECT event_type, SUM(n) AS na FROM tr GROUP BY 1),
             |rh AS (SELECT tr.event_type, na.na,
             |        -CAST(SUM(CAST(round(
             |          (CAST(tr.n AS DOUBLE) / na.na) *
             |          ln(CAST(tr.n AS DOUBLE) / na.na), 6)
             |          AS DECIMAL(38,6))) AS DOUBLE) AS h_state
             |      FROM tr JOIN na ON na.event_type = tr.event_type
             |      GROUP BY 1, 2),
             |tot AS (SELECT SUM(na) AS nt FROM rh),
             |st AS (SELECT event_type, na, tot.nt,
             |        round(CAST(na AS DOUBLE) / tot.nt, 9) AS pi,
             |        round(h_state, 6) AS h_state
             |      FROM rh CROSS JOIN tot),
             |hr AS (SELECT
             |        CAST(SUM(CAST(round(pi * h_state, 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS h_rate,
             |        -CAST(SUM(CAST(round(
             |          (CAST(na AS DOUBLE) / nt) *
             |          ln(CAST(na AS DOUBLE) / nt), 9)
             |          AS DECIMAL(38,9))) AS DOUBLE) AS h_marg
             |      FROM st)
             |SELECT event_type, CAST(na AS BIGINT) AS n_from,
             |  round(pi, 6) AS pi, h_state,
             |  round(hr.h_rate, 6) AS h_rate_nats,
             |  round(hr.h_marg, 6) AS h_marginal_nats,
             |  round(1.0 - hr.h_rate / hr.h_marg, 6)
             |    AS predictability_gain
             |FROM st CROSS JOIN hr ORDER BY event_type""".stripMargin)),
    // Language-ID evaluation against the corpus's OWN lang labels —
    // the documents table carries ground truth, so the x8 marker-vote
    // classifier gets the full multi-class report card: per-class
    // precision/recall/F1 over the (true ∪ predicted) class set plus
    // overall accuracy and Cohen's κ (Cohen 1960 — the chance-corrected
    // read; x111's κ is BETWEEN LABELERS, this is classifier-vs-truth).
    // The structurally honest part: 'zh' exists in truth but not in the
    // marker model's vocabulary, so its recall is 0 by construction and
    // the 'und' row shows where that mass lands — exactly what a
    // curation pipeline needs to see before trusting x8's routing.
    // One corpus pass → ≤6×6 confusion grid; everything after is exact
    // integer algebra on that grid.
    QuerySpec(
      "x268_langid_eval",
      (s, dir) => {
        val cm = Tables.documents(s, dir)
          .select(col("lang").as("t"),
            graft.functions.TextFunctions.langId(col("text")).as("p"))
          .groupBy("t", "p").agg(count(lit(1)).as("n"))
          .localCheckpoint() // <=36 cells
        val classes = cm.select(col("t").as("cls"))
          .unionByName(cm.select(col("p").as("cls"))).distinct()
        val tN = cm.groupBy(col("t").as("cls"))
          .agg(sum(col("n")).as("n_true"))
        val pN = cm.groupBy(col("p").as("cls"))
          .agg(sum(col("n")).as("n_pred"))
        val tp = cm.filter(col("t") === col("p"))
          .select(col("t").as("cls"), col("n").as("tp"))
        val tot = cm.agg(sum(col("n")).as("nn"),
          sum(when(col("t") === col("p"), col("n")).otherwise(0L))
            .as("cor"))
        val pe = tN.join(pN, Seq("cls"), "full")
          .na.fill(0L, Seq("n_true", "n_pred"))
          .agg(sum(col("n_true") * col("n_pred")).as("sprod"))
        val per = classes
          .join(tN, Seq("cls"), "left").join(pN, Seq("cls"), "left")
          .join(tp, Seq("cls"), "left")
          .na.fill(0L, Seq("n_true", "n_pred", "tp"))
        per.crossJoin(broadcast(tot)).crossJoin(broadcast(pe))
          .select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
            when(col("n_pred") > 0,
              round(col("tp").cast("double") / col("n_pred"), 6))
              .otherwise(lit(0.0)).as("precision"),
            when(col("n_true") > 0,
              round(col("tp").cast("double") / col("n_true"), 6))
              .otherwise(lit(0.0)).as("recall"),
            when(col("n_pred") + col("n_true") > 0,
              round(lit(2.0) * col("tp") /
                (col("n_pred") + col("n_true")), 6))
              .otherwise(lit(0.0)).as("f1"),
            round(col("cor").cast("double") / col("nn"), 6)
              .as("accuracy"),
            round((col("cor").cast("double") / col("nn") -
              col("sprod").cast("double") / col("nn") / col("nn")) /
              (lit(1.0) - col("sprod").cast("double") / col("nn") /
                col("nn")), 6).as("kappa"))
          .orderBy("cls")
      },
      Some("""WITH t0 AS (SELECT lang AS t,
             |        list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '') AS toks
             |      FROM documents),
             |v AS (SELECT t,
             |        CAST(len(list_filter(toks, x -> x IN ('the','a',
             |          'and','of','to','is'))) AS BIGINT) AS v_en,
             |        CAST(len(list_filter(toks, x -> x IN ('der','die',
             |          'das','und','ist','ein'))) AS BIGINT) AS v_de,
             |        CAST(len(list_filter(toks, x -> x IN ('el','la',
             |          'los','las','es','una'))) AS BIGINT) AS v_es,
             |        CAST(len(list_filter(toks, x -> x IN ('le','la',
             |          'les','et','est','une'))) AS BIGINT) AS v_fr
             |      FROM t0),
             |pr AS (SELECT t,
             |        CASE WHEN v_en > 0 AND v_en >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'en'
             |          WHEN v_de > 0 AND v_de >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'de'
             |          WHEN v_es > 0 AND v_es >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'es'
             |          WHEN v_fr > 0 AND v_fr >= greatest(v_en, v_de,
             |            v_es, v_fr) THEN 'fr'
             |          ELSE 'und' END AS p
             |      FROM v),
             |cm AS (SELECT t, p, COUNT(*) AS n FROM pr GROUP BY 1, 2),
             |classes AS (SELECT DISTINCT t AS cls FROM cm
             |      UNION SELECT DISTINCT p FROM cm),
             |tn AS (SELECT t AS cls, SUM(n) AS n_true FROM cm GROUP BY 1),
             |pn AS (SELECT p AS cls, SUM(n) AS n_pred FROM cm GROUP BY 1),
             |tpx AS (SELECT t AS cls, n AS tp FROM cm WHERE t = p),
             |tot AS (SELECT SUM(n) AS nn,
             |        SUM(CASE WHEN t = p THEN n ELSE 0 END) AS cor
             |      FROM cm),
             |pe AS (SELECT SUM(COALESCE(tn.n_true, 0) *
             |          COALESCE(pn.n_pred, 0)) AS sprod
             |      FROM tn FULL JOIN pn USING (cls)),
             |per AS (SELECT classes.cls,
             |        COALESCE(tn.n_true, 0) AS n_true,
             |        COALESCE(pn.n_pred, 0) AS n_pred,
             |        COALESCE(tpx.tp, 0) AS tp
             |      FROM classes LEFT JOIN tn USING (cls)
             |      LEFT JOIN pn USING (cls) LEFT JOIN tpx USING (cls))
             |SELECT cls, CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
             |  CASE WHEN n_pred > 0
             |    THEN round(CAST(tp AS DOUBLE) / n_pred, 6)
             |    ELSE 0.0 END AS precision,
             |  CASE WHEN n_true > 0
             |    THEN round(CAST(tp AS DOUBLE) / n_true, 6)
             |    ELSE 0.0 END AS recall,
             |  CASE WHEN n_pred + n_true > 0
             |    THEN round(2.0 * tp / (n_pred + n_true), 6)
             |    ELSE 0.0 END AS f1,
             |  round(CAST(tot.cor AS DOUBLE) / tot.nn, 6) AS accuracy,
             |  round((CAST(tot.cor AS DOUBLE) / tot.nn -
             |    CAST(pe.sprod AS DOUBLE) / tot.nn / tot.nn) /
             |    (1.0 - CAST(pe.sprod AS DOUBLE) / tot.nn / tot.nn), 6)
             |    AS kappa
             |FROM per CROSS JOIN tot CROSS JOIN pe
             |ORDER BY cls""".stripMargin)),
    // Term burstiness / adaptation (Church & Gale, "Poisson mixtures",
    // NLE 1995; Church, ACL 2000 for P(≥2|≥1) adaptation): which words
    // REPEAT WITHIN documents far beyond their corpus rate — the
    // document-level repeat read that x171 (temporal burstiness) and
    // x254 (whole-spectrum shape) bracket but don't give per term.
    // Adaptation ≈ cf/df ratios expose topical/template terms
    // (adaptation ≫ corpus rate) vs function words; the classic
    // cheap feature for boilerplate and keyword screening. One tf
    // pass → per-term (cf, df, df₂) exact integers; top-20 by
    // adaptation at df ≥ 5 via TakeOrderedAndProject.
    QuerySpec(
      "x274_term_burstiness",
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("f"))
        val t = tf.groupBy("token").agg(
          sum(col("f")).as("cf"), count(lit(1)).as("df"),
          sum((col("f") >= 2).cast("long")).as("df2"))
        val nd = Tables.documents(s, dir).agg(count(lit(1)).as("nd"))
        t.filter(col("df") >= 5).crossJoin(broadcast(nd))
          .select(col("token"), col("cf"), col("df"), col("df2"),
            round(col("df2").cast("double") / col("df"), 6)
              .as("adaptation"),
            round(col("cf").cast("double") / col("df"), 6)
              .as("burstiness"),
            round(col("df").cast("double") / col("nd"), 6)
              .as("doc_rate"))
          .orderBy(col("adaptation").desc, col("token")).limit(20)
      },
      Some("""WITH tok AS (SELECT doc_id,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS token
             |      FROM documents),
             |tf AS (SELECT doc_id, token, COUNT(*) AS f FROM tok
             |      GROUP BY 1, 2),
             |t AS (SELECT token, SUM(f) AS cf, COUNT(*) AS df,
             |        SUM(CASE WHEN f >= 2 THEN 1 ELSE 0 END) AS df2
             |      FROM tf GROUP BY 1),
             |nd AS (SELECT COUNT(*) AS nd FROM documents)
             |SELECT token, CAST(cf AS BIGINT) AS cf,
             |  CAST(df AS BIGINT) AS df, CAST(df2 AS BIGINT) AS df2,
             |  round(CAST(df2 AS DOUBLE) / df, 6) AS adaptation,
             |  round(CAST(cf AS DOUBLE) / df, 6) AS burstiness,
             |  round(CAST(df AS DOUBLE) / nd.nd, 6) AS doc_rate
             |FROM t CROSS JOIN nd WHERE df >= 5
             |ORDER BY adaptation DESC, token LIMIT 20""".stripMargin)),
    // "Fightin' Words" — log-odds with an informative Dirichlet prior
    // (Monroe, Colaresi & Quinn, Political Analysis 2008): which terms
    // distinguish the English subcorpus from the rest, z-scored — the
    // corpus-comparison standard BEYOND x241's LLR: LLR over-weights
    // high-frequency terms and ignores estimation variance; the
    // Monroe prior (α_w ∝ global frequency, α₀=100) shrinks rare-term
    // noise and the per-term σ makes ζ comparable across frequencies.
    // ζ_w = [ln((a+α)/(n₁+α₀−a−α)) − ln((b+α)/(n₂+α₀−b−α))] /
    // √(1/(a+α)+1/(b+α)); every ln argument is rounded 6 BEFORE the
    // transcendental (the x262 discipline) so both engines z-score
    // identical values. Top-20 |ζ| each side via one ordered limit.
    QuerySpec(
      "x279_fightin_words",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select((col("lang") === "en").cast("long").as("grp"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("tok"))
        val ct = tok.groupBy("tok")
          .agg(sum(when(col("grp") === 1, 1L).otherwise(0L)).as("a"),
            sum(when(col("grp") === 0, 1L).otherwise(0L)).as("b"))
          .localCheckpoint() // vocab-bounded
        val tot = ct.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
          (sum(col("a")) + sum(col("b"))).as("nn"))
        val z = ct.crossJoin(broadcast(tot))
          .withColumn("alpha",
            round(lit(100.0) * (col("a") + col("b")) / col("nn"), 6))
          .withColumn("la", round(log(round(
            (col("a") + col("alpha")) /
              (col("n1") + lit(100.0) - col("a") - col("alpha")), 6)), 6))
          .withColumn("lb", round(log(round(
            (col("b") + col("alpha")) /
              (col("n2") + lit(100.0) - col("b") - col("alpha")), 6)), 6))
          .withColumn("sig", round(sqrt(
            lit(1.0) / (col("a") + col("alpha")) +
              lit(1.0) / (col("b") + col("alpha"))), 6))
          .select(col("tok"), col("a").as("n_en"), col("b").as("n_rest"),
            round((col("la") - col("lb")) / col("sig"), 4).as("zeta"))
        z.orderBy(abs(col("zeta")).desc, col("tok")).limit(20)
          .orderBy(col("zeta").desc, col("tok"))
      },
      Some("""WITH tok AS (SELECT
             |        CAST(lang = 'en' AS BIGINT) AS grp,
             |        unnest(list_filter(regexp_split_to_array(trim(text),
             |          '\s+'), x -> x <> '')) AS tok
             |      FROM documents),
             |ct AS (SELECT tok,
             |        SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS a,
             |        SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS b
             |      FROM tok GROUP BY 1),
             |tot AS (SELECT SUM(a) AS n1, SUM(b) AS n2,
             |        SUM(a) + SUM(b) AS nn FROM ct),
             |z AS (SELECT tok, a AS n_en, b AS n_rest,
             |        round((round(ln(round((a + alpha) /
             |          (n1 + 100.0 - a - alpha), 6)), 6) -
             |          round(ln(round((b + alpha) /
             |          (n2 + 100.0 - b - alpha), 6)), 6)) /
             |          round(sqrt(1.0 / (a + alpha) +
             |          1.0 / (b + alpha)), 6), 4) AS zeta
             |      FROM (SELECT ct.tok, ct.a, ct.b, tot.n1, tot.n2,
             |          round(100.0 * (ct.a + ct.b) / tot.nn, 6) AS alpha
             |        FROM ct CROSS JOIN tot))
             |SELECT tok, CAST(n_en AS BIGINT) AS n_en,
             |  CAST(n_rest AS BIGINT) AS n_rest, zeta
             |FROM (SELECT * FROM z ORDER BY abs(zeta) DESC, tok
             |      LIMIT 20)
             |ORDER BY zeta DESC, tok""".stripMargin)),
    // Binary segmentation for MULTIPLE changepoints (Scott & Knott
    // 1974; Killick et al. 2012 frame it as the classic greedy
    // baseline PELT improves on): x143 finds THE single best mean
    // shift; this recurses one level — the root split, then the best
    // split inside each half — giving up to three changepoints and
    // the segment means, the "how many regimes" read a single split
    // can't answer. Same prefix-sum BSS device as x143, but the
    // child-level windows PARTITION BY segment (each side's prefix
    // sums are segment-local), so one extra bounded pass finds both
    // children at once; deterministic earliest-day tie-break via
    // max(struct). Children of size <2 simply produce no row.
    QuerySpec(
      "x293_binary_segmentation",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        def bestSplit(df: org.apache.spark.sql.DataFrame) = {
          // per-segment BSS argmax over prefix sums; df: (seg, day, n)
          val w = W.partitionBy("seg").orderBy("day")
            .rowsBetween(W.unboundedPreceding, 0)
          val tot = df.groupBy("seg")
            .agg(sum(col("n")).as("ts"), count(lit(1)).as("nd"))
          df.withColumn("cums", sum(col("n")).over(w))
            .withColumn("k", count(lit(1)).over(w))
            .join(broadcast(tot), "seg")
            .filter(col("k") < col("nd"))
            .select(col("seg"), col("day"), col("k").as("nl"),
              (col("nd") - col("k")).as("nr"),
              (col("cums").cast("double") / col("k")).as("ml"),
              ((col("ts") - col("cums")).cast("double") /
                (col("nd") - col("k"))).as("mr"),
              (col("ts").cast("double") / col("nd")).as("mu"))
            .withColumn("bss", round(col("nl") * (col("ml") - col("mu"))
              * (col("ml") - col("mu")) + col("nr") *
              (col("mr") - col("mu")) * (col("mr") - col("mu")), 6))
            .groupBy("seg")
            .agg(max(struct(col("bss"),
              (-datediff(col("day"), lit("1970-01-01"))).as("nd2"),
              col("nl"), col("nr"),
              round(col("ml"), 6).as("ml"), round(col("mr"), 6)
                .as("mr"))).as("b"))
            .select(col("seg"), expr("date_add(DATE '1970-01-01', " +
              "CAST(-b.nd2 AS INT))").as("split_day"),
              col("b.bss").as("bss"), col("b.nl").as("n_left"),
              col("b.nr").as("n_right"), col("b.ml").as("mean_left"),
              col("b.mr").as("mean_right"))
        }
        val root = bestSplit(d.withColumn("seg", lit(0L)))
          .localCheckpoint() // 1 row
        val kids = bestSplit(d.crossJoin(broadcast(
            root.select(col("split_day").as("cp"))))
          .select(when(col("day") < col("cp"), 1L).otherwise(2L)
            .as("seg"), col("day"), col("n")))
        root.select(lit(0L).as("level"), col("split_day"), col("bss"),
            col("n_left"), col("n_right"), col("mean_left"),
            col("mean_right"))
          .unionByName(kids.select(col("seg").as("level"),
            col("split_day"), col("bss"), col("n_left"), col("n_right"),
            col("mean_left"), col("mean_right")))
          .orderBy("level")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |      FROM events GROUP BY 1),
             |root0 AS (SELECT 0 AS seg, day, n FROM d),
             |rs AS (SELECT seg, day,
             |        SUM(n) OVER w AS cums,
             |        CAST(row_number() OVER (PARTITION BY seg
             |          ORDER BY day) AS BIGINT) AS k
             |      FROM root0
             |      WINDOW w AS (PARTITION BY seg ORDER BY day ROWS
             |        BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |rt AS (SELECT seg, SUM(n) AS ts_, COUNT(*) AS nd
             |      FROM root0 GROUP BY 1),
             |rb AS (SELECT rs.seg, rs.day, rs.k AS nl,
             |        rt.nd - rs.k AS nr,
             |        CAST(rs.cums AS DOUBLE) / rs.k AS ml,
             |        CAST(rt.ts_ - rs.cums AS DOUBLE) / (rt.nd - rs.k)
             |          AS mr,
             |        CAST(rt.ts_ AS DOUBLE) / rt.nd AS mu
             |      FROM rs JOIN rt ON rt.seg = rs.seg
             |      WHERE rs.k < rt.nd),
             |rbs AS (SELECT seg, day, nl, nr, ml, mr,
             |        round(nl * (ml - mu) * (ml - mu) +
             |          nr * (mr - mu) * (mr - mu), 6) AS bss
             |      FROM rb),
             |root AS (SELECT * FROM rbs ORDER BY bss DESC, day
             |      LIMIT 1),
             |kid0 AS (SELECT CASE WHEN d.day < root.day THEN 1 ELSE 2
             |          END AS seg, d.day, d.n
             |      FROM d CROSS JOIN root),
             |ks AS (SELECT seg, day,
             |        SUM(n) OVER w AS cums,
             |        CAST(row_number() OVER (PARTITION BY seg
             |          ORDER BY day) AS BIGINT) AS k
             |      FROM kid0
             |      WINDOW w AS (PARTITION BY seg ORDER BY day ROWS
             |        BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |kt AS (SELECT seg, SUM(n) AS ts_, COUNT(*) AS nd
             |      FROM kid0 GROUP BY 1),
             |kb AS (SELECT ks.seg, ks.day, ks.k AS nl,
             |        kt.nd - ks.k AS nr,
             |        CAST(ks.cums AS DOUBLE) / ks.k AS ml,
             |        CAST(kt.ts_ - ks.cums AS DOUBLE) / (kt.nd - ks.k)
             |          AS mr,
             |        CAST(kt.ts_ AS DOUBLE) / kt.nd AS mu
             |      FROM ks JOIN kt ON kt.seg = ks.seg
             |      WHERE ks.k < kt.nd),
             |kbs AS (SELECT seg, day, nl, nr, ml, mr,
             |        round(nl * (ml - mu) * (ml - mu) +
             |          nr * (mr - mu) * (mr - mu), 6) AS bss
             |      FROM kb),
             |kbest AS (SELECT * FROM (SELECT seg, day, nl, nr, ml, mr,
             |          bss, row_number() OVER (PARTITION BY seg
             |          ORDER BY bss DESC, day) AS rn FROM kbs)
             |      WHERE rn = 1)
             |SELECT CAST(level AS BIGINT) AS level, split_day,
             |  bss, CAST(n_left AS BIGINT) AS n_left,
             |  CAST(n_right AS BIGINT) AS n_right,
             |  round(mean_left, 6) AS mean_left,
             |  round(mean_right, 6) AS mean_right
             |FROM (SELECT 0 AS level, day AS split_day, bss, nl AS
             |        n_left, nr AS n_right, ml AS mean_left,
             |        mr AS mean_right FROM root
             |      UNION ALL SELECT seg, day, bss, nl, nr, ml, mr
             |      FROM kbest)
             |ORDER BY level""".stripMargin)))
}
