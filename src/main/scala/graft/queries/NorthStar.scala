package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** North-star LLM-data-pipeline operators as driver-facing queries:
  * deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
  * cosine), similarity search (brute-force, IVF, LSH), text analysis
  * (tokens, quality, language-ID, fingerprints), and multimodal binary
  * plumbing. Approximate/hash-based ops have no ANSI oracle (driver records
  * the rows-only check); everything deterministic ships one.
  */
object NorthStar {

  private val queryIds: Seq[Long] = (0L until 10L)

  /** Exact dedup groups by content digest (shuffle carries a 32-byte digest,
    * not document text). */
  val dedupExact = QueryDef(
    "q_ns_dedup_exact",
    """SELECT sha256(text) AS content_sha, min(doc_id) AS keep_doc_id,
      |       count(*) AS n_copies
      |FROM documents
      |GROUP BY sha256(text)
      |ORDER BY content_sha""".stripMargin) { (s, d) =>
    Dedup.exactGroups(T.documents(s, d)).orderBy("content_sha")
  }

  /** MinHash-LSH near-dup candidates (shingle → 64-slot signature → banded
    * buckets → verified Jaccard); per-doc candidate count. */
  val dedupMinHash = QueryDef.noOracle("q_ns_dedup_minhash") { (s, d) =>
    val docs = T.documents(s, d)
    val cands = Dedup.minHashCandidates(docs).filter(col("jaccard") >= 0.5)
    docs.select(col("doc_id"))
      .join(cands.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_candidates"))
      .orderBy("doc_id")
  }

  /** SimHash near-dups: 64-bit signed-bit-vote signature, 16-bit prefix
    * buckets, Hamming <= 3. */
  val dedupSimHash = QueryDef.noOracle("q_ns_dedup_simhash") { (s, d) =>
    Dedup.simHashNearDups(T.documents(s, d)).orderBy("doc_id")
  }

  /** Exact n-gram Jaccard best match per doc, length-band blocked. */
  val dedupNgram = QueryDef.noOracle("q_ns_dedup_ngram_jaccard") { (s, d) =>
    Dedup.ngramJaccardBestMatch(T.documents(s, d)).orderBy("doc_id")
  }

  /** Embedding-cosine near-dup counts at cos >= 0.8. */
  val dedupCosine = QueryDef.noOracle("q_ns_dedup_cosine") { (s, d) =>
    Similarity.cosineNearDupCounts(T.embeddings(s, d), 0.8).orderBy("vec_id")
  }

  /** Brute-force cosine top-5 (rank-only output — ranks are stable across
    * engines, raw scores differ in the last ulp). */
  val simBrute = QueryDef(
    "q_ns_sim_brute_topk",
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id < 10
      |)
      |SELECT query_id, rank, neighbor_id
      |FROM (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |         row_number() OVER (
      |           PARTITION BY q.query_id
      |           ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
      |                    e.vec_id) AS rank
      |  FROM embeddings e CROSS JOIN q
      |  WHERE e.vec_id <> q.query_id
      |) x
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    Similarity.bruteForceTopK(T.embeddings(s, d), queryIds, 5)
      .orderBy("query_id", "rank")
  }

  /** IVF-style ANN: per-label centroids, nprobe=1 routing, in-list rerank. */
  val simIvf = QueryDef(
    "q_ns_sim_ivf_topk",
    """WITH expanded AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS pos,
      |         unnest(CAST(embedding AS DOUBLE[])) AS v
      |  FROM embeddings
      |),
      |cent AS (
      |  SELECT label, list(c ORDER BY pos) AS centroid
      |  FROM (SELECT label, pos, avg(v) AS c FROM expanded GROUP BY label, pos) g
      |  GROUP BY label
      |),
      |q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id < 10
      |),
      |routed AS (
      |  SELECT query_id, qe, label AS probe_label
      |  FROM (
      |    SELECT q.query_id, q.qe, c.label,
      |           row_number() OVER (
      |             PARTITION BY q.query_id
      |             ORDER BY list_cosine_similarity(q.qe, c.centroid) DESC, c.label) AS rn
      |    FROM q CROSS JOIN cent c
      |  ) x WHERE rn = 1
      |)
      |SELECT query_id, probe_label, rank, neighbor_id
      |FROM (
      |  SELECT r.query_id, r.probe_label, e.vec_id AS neighbor_id,
      |         row_number() OVER (
      |           PARTITION BY r.query_id
      |           ORDER BY list_cosine_similarity(r.qe, CAST(e.embedding AS DOUBLE[])) DESC,
      |                    e.vec_id) AS rank
      |  FROM embeddings e JOIN routed r ON e.label = r.probe_label
      |  WHERE e.vec_id <> r.query_id
      |) x
      |WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    Similarity.ivfTopK(T.embeddings(s, d), queryIds, 3)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN (xxhash64-derived hyperplanes — no cross-engine
    * oracle; recall tracked in ScalaTest against brute force). */
  val simLsh = QueryDef.noOracle("q_ns_sim_lsh_topk") { (s, d) =>
    Similarity.lshTopK(T.embeddings(s, d), queryIds, 3)
      .orderBy("query_id", "rank")
  }

  /** Token counting: whitespace + BPE-ish pre-tokenizer. */
  val textTokens = QueryDef(
    "q_ns_text_tokens",
    """SELECT doc_id,
      |       CASE WHEN trim(text) = '' THEN 0
      |            ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_ws_tokens,
      |       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.withTokenCounts(T.documents(s, d))
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
      .orderBy("doc_id")
  }

  /** Quality scoring: word stats, punctuation/stopword ratios, weighted
    * score (per-row double math — bit-identical cross-engine). */
  val textQuality = QueryDef(
    "q_ns_text_quality",
    """SELECT doc_id,
      |       CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
      |       CAST(list_sum(list_transform(string_split_regex(lower(trim(text)), '\s+'), x -> length(x))) AS DOUBLE)
      |         / len(string_split_regex(lower(trim(text)), '\s+')) AS mean_word_len,
      |       CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |         / length(text) AS punct_ratio,
      |       CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |              x -> list_contains(['the','a','an','of','and','to','in','is'], x))) AS DOUBLE)
      |         / len(string_split_regex(lower(trim(text)), '\s+')) AS stopword_ratio,
      |       (CAST(list_sum(list_transform(string_split_regex(lower(trim(text)), '\s+'), x -> length(x))) AS DOUBLE)
      |          / len(string_split_regex(lower(trim(text)), '\s+'))) * 0.2
      |        + (CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |               x -> list_contains(['the','a','an','of','and','to','in','is'], x))) AS DOUBLE)
      |           / len(string_split_regex(lower(trim(text)), '\s+'))) * 2.0
      |        - (CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |           / length(text)) * 5.0 AS quality_score
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.withQuality(T.documents(s, d))
      .select("doc_id", "n_words", "mean_word_len", "punct_ratio",
        "stopword_ratio", "quality_score")
      .orderBy("doc_id")
  }

  /** Language ID: marker-set hit counts, argmax with alphabetical
    * tie-break, 'und' on zero evidence. */
  val textLangId = QueryDef(
    "q_ns_text_langid",
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> list_contains(['the','a','an','of','and','to','in','is','value','table'], x))) AS BIGINT) AS score_en,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], x))) AS BIGINT) AS score_de,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> list_contains(['el','la','de','y','que','los','una','por'], x))) AS BIGINT) AS score_es,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> list_contains(['le','la','et','les','des','une','est','pour'], x))) AS BIGINT) AS score_fr
      |  FROM documents
      |)
      |SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
      |       CASE WHEN score_en + score_de + score_es + score_fr = 0 THEN 'und'
      |            WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
      |            WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
      |            WHEN score_es >= score_fr THEN 'es'
      |            ELSE 'fr' END AS predicted_lang
      |FROM scored
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.withLangId(T.documents(s, d))
      .select("doc_id", "lang", "score_en", "score_de", "score_es", "score_fr",
        "predicted_lang")
      .orderBy("doc_id")
  }

  /** Content fingerprints: raw md5 + order-insensitive bag-of-words md5. */
  val textFingerprint = QueryDef(
    "q_ns_text_fingerprint",
    """SELECT doc_id,
      |       md5(text) AS text_md5,
      |       md5(array_to_string(list_sort(list_distinct(
      |         string_split_regex(lower(trim(text)), '\s+'))), ' ')) AS canon_fp,
      |       substring(md5(array_to_string(list_sort(list_distinct(
      |         string_split_regex(lower(trim(text)), '\s+'))), ' ')), 1, 8) AS fp_prefix
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.withFingerprints(T.documents(s, d))
      .select("doc_id", "text_md5", "canon_fp", "fp_prefix")
      .orderBy("doc_id")
  }

  /** Multimodal metadata path: binary payload length + digest (oracle-
    * checkable slice of the media pipeline). */
  val multimodalMeta = QueryDef(
    "q_ns_multimodal_meta",
    """SELECT doc_id, source,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS payload_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.binaryMeta(Multimodal.asMediaTable(T.documents(s, d)))
      .orderBy("doc_id")
  }

  /** Multimodal batch decode path: typed Dataset + mapPartitions with the
    * stub codec (deterministic fake features; plumbing is real). */
  val multimodalFeatures = QueryDef.noOracle("q_ns_multimodal_features") { (s, d) =>
    implicit val spark = s
    Multimodal.extractFeatures(Multimodal.asMediaTable(T.documents(s, d)))
      .toDF()
      .orderBy("doc_id")
  }

  /** Corpus vocabulary: global word frequencies with document frequency —
    * the tokenizer-training / stopword-mining primitive. One explode + one
    * partial-aggregated count shuffle at any scale. */
  val textVocab = QueryDef(
    "q_ns_text_vocab",
    """SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
      |      FROM documents) w
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY tf DESC, word
      |LIMIT 100""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("tf"), asc("word"))
      .limit(100)
  }

  val defs: Seq[QueryDef] = Seq(
    dedupExact, dedupMinHash, dedupSimHash, dedupNgram, dedupCosine,
    simBrute, simIvf, simLsh,
    textTokens, textQuality, textLangId, textFingerprint, textVocab,
    multimodalMeta, multimodalFeatures)
}
