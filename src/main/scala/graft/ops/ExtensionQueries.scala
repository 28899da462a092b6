package graft.ops

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions

/** LLM-data-pipeline extension queries (BASELINE.md north star): dedup,
  * similarity search, text analysis, multimodal plumbing — each a
  * `queries()` entry; oracle SQL where DuckDB can express the same
  * computation, rows-only otherwise (minhash/simhash/LSH use engine-specific
  * hash functions no oracle can replicate).
  */
object ExtensionQueries {

  private val STOPWORDS = Seq("a", "the")

  def all: Seq[QuerySpec] = Seq(

    // -------------------------------------------------------------- dedup
    QuerySpec(
      "x1_dedup_exact",
      (s, dir) =>
        Dedup.exact(Tables.documents(s, dir), "doc_id", "text").orderBy("digest"),
      Some("""SELECT sha256(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin)),

    // MinHash+LSH near-dups. No oracle: the signature family is
    // engine-specific (xxhash64); correctness is covered by x4 (the exact
    // Jaccard twin) + DedupSpec unit tests.
    QuerySpec(
      "x2_dedup_minhash",
      (s, dir) =>
        Dedup.minhashNearDups(Tables.documents(s, dir), "doc_id", "text",
            k = 64, bands = 16, threshold = 0.8)
          .orderBy("doc_a", "doc_b"),
      None),

    QuerySpec(
      "x3_dedup_simhash",
      (s, dir) =>
        Dedup.simhashNearDups(Tables.documents(s, dir), "doc_id", "text",
            maxHamming = 6)
          .orderBy("doc_a", "doc_b"),
      None),

    // Exact blocked n-gram Jaccard — oracle-checkable dedup ground truth.
    QuerySpec(
      "x4_ngram_jaccard",
      (s, dir) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), threshold = 0.65)
          .orderBy("doc_a", "doc_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id, lang, source, n_chars,
             |    list_distinct([text[i:i+2] for i in range(1, length(text)-1)]) AS sh
             |  FROM documents),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.sh, b.sh)) AS i,
             |    len(a.sh) AS na, len(b.sh) AS nb
             |  FROM sh a JOIN sh b
             |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |    AND abs(a.n_chars - b.n_chars) <= greatest(a.n_chars, b.n_chars) * 0.2)
             |SELECT doc_a, doc_b,
             |  round(CAST(i AS DOUBLE) / (na + nb - i), 4) AS jaccard
             |FROM pairs
             |WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 4) >= 0.65
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // --------------------------------------------------------- similarity
    // Brute-force cosine top-5 for query vectors (vec_id < 20) — the exact
    // baseline an ANN variant is judged against.
    QuerySpec(
      "x5_cosine_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.cosineTopK(
            e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS emb
             |  FROM embeddings),
             |n AS (SELECT vec_id, emb, sqrt(list_sum([x * x for x in emb])) AS nrm FROM e),
             |f AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.nrm AS qn, c.nrm AS cn,
             |    unnest(q.emb) AS qv, unnest(c.emb) AS cv
             |  FROM n q CROSS JOIN n c
             |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
             |d AS (
             |  SELECT qid, cid,
             |    round(sum(qv * cv) / (any_value(qn) * any_value(cn)), 4) AS sim
             |  FROM f GROUP BY qid, cid)
             |SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
             |FROM d QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // LSH-bucketed ANN — approximate by construction, so no oracle; recall
    // vs x5 is asserted in SimilaritySpec.
    QuerySpec(
      "x6_ann_lsh",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopK(
            e.filter(col("vec_id") < 20), e, "vec_id", "embedding",
            k = 5, nBits = 4, dim = 64)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      None),

    // IVF ANN — k-means cells + multi-probe; approximate, so rows-only
    // (recall vs x5 asserted in SimilaritySpec).
    QuerySpec(
      "x13_ann_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfTopK(
            e.filter(col("vec_id") < 20), e, "vec_id", "embedding",
            k = 5, nCells = 8, nProbe = 3)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      None),

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

    QuerySpec(
      "x10_fingerprint",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |                 [CAST(ord(c) AS BIGINT) for c in string_split(text, '')]),
             |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Normalized-text exact dedup: formatting variants collapse to one
    // canonical form before hashing (standard dedup preprocessing).
    QuerySpec(
      "x16_normalized_dedup",
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(sha2(TextFunctions.normalized(col("text")).cast("binary"), 256)
            .as("digest"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_variants"))
          .orderBy("digest"),
      Some("""SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS digest,
             |  MIN(doc_id) AS keep_id, COUNT(*) AS n_variants
             |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin)),

    // Winnowing fingerprints: count of distinct window-min fingerprints per
    // doc (rows-only: fingerprint values are hash-family specific; the
    // kernel's invariants are covered in TextFunctionsSpec).
    QuerySpec(
      "x17_winnow_fingerprints",
      (s, dir) => {
        val hashes = transform(TextFunctions.shingles3(col("text")),
          sh => xxhash64(sh).bitwiseAND(lit(0xFFFFFFFFL)))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(TextFunctions.winnowUdf(hashes, lit(8))).cast("long")
              .as("n_fingerprints"))
          .orderBy("doc_id")
      },
      None),

    // Embedding-cosine near-dup pairs, LSH-bucketed (approximate recall by
    // construction → rows-only; threshold 0.4 matches this corpus's tail).
    QuerySpec(
      "x15_cosine_neardup",
      (s, dir) =>
        Similarity.cosineNearDups(Tables.embeddings(s, dir), "vec_id",
            "embedding", threshold = 0.4, nBits = 2, dim = 64)
          .orderBy("id_a", "id_b"),
      None),

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

    // ---------------------------------------------------------- multimodal
    QuerySpec(
      "x11_multimodal_meta",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
        Multimodal.featurize(s, media).toDF()
          .select(col("media_id"), col("n_bytes"), col("sha256"),
            col("width").cast("int").as("width"), col("height").cast("int").as("height"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  sha256(text) AS sha256,
             |  CAST(doc_id % 64 + 1 AS INTEGER) AS width,
             |  CAST(doc_id % 48 + 1 AS INTEGER) AS height
             |FROM documents ORDER BY media_id""".stripMargin)),

    // Per-label embedding centroid, element-wise (the relational twin of
    // functions.VectorAggregates.CentroidAggregator — equality of the two
    // is asserted in VectorAggregatesSpec; this flat shape is what the
    // oracle can express).
    QuerySpec(
      "x12_centroid",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("label"), (col("pos") + 1).cast("long").as("pos"))
          // + 0.0 folds IEEE -0.0 to +0.0 (engines differ; hash compare cares)
          .agg((round(avg(col("v").cast("double")), 3) + 0.0).as("mean_v"),
            count(lit(1)).as("n"))
          .orderBy("label", "pos"),
      Some("""SELECT label, CAST(pos AS BIGINT) AS pos,
             |  round(avg(CAST(v AS DOUBLE)), 3) + 0.0 AS mean_v, COUNT(*) AS n
             |FROM (SELECT label, unnest(embedding) AS v,
             |        generate_subscripts(embedding, 1) AS pos
             |      FROM embeddings)
             |GROUP BY label, pos ORDER BY label, pos""".stripMargin))
  )
}
