package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Cluster, Quantize, Sampling, TextAnalysis}

/** Embedding-corpus preparation queries: deterministic k-means + SemDeDup,
  * int8 scalar quantization, quality-weighted sampling, and canonical text
  * normalization. The iterative k-means oracle is the PageRank pattern —
  * the fixed-point unrolled into one MATERIALIZED CTE per step, each step
  * bit-reproducible via the decimal-mean determinism contract; assignment
  * parity rides on argmax ranks (cosine gaps between centroids dwarf any
  * cross-engine ulp difference, the same rank-only argument the ANN
  * queries use).
  */
object EmbeddingQueries {

  private val K = 8
  private val ITERS = 3
  private val SEM_MIN_COS = 0.45

  /** Unrolled Lloyd iterations: e (double-cast corpus), c0 (md5-ordered
    * seeds), then a1, c1, a2, c2, ..., a_iters. */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |),
         |c0 AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cluster,
         |         v AS c
         |  FROM (SELECT vec_id, v FROM e
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k) s
         |)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(
        s""",
           |a$i AS MATERIALIZED (
           |  SELECT vec_id, cluster FROM (
           |    SELECT e.vec_id, c.cluster,
           |           row_number() OVER (PARTITION BY e.vec_id
           |             ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cluster) AS rn
           |    FROM e CROSS JOIN c${i - 1} c) t WHERE rn = 1
           |)""".stripMargin)
      if (i < iters) sb.append(
        s""",
           |c$i AS MATERIALIZED (
           |  SELECT cluster, list(mean_v ORDER BY pos) AS c FROM (
           |    SELECT x.cluster, x.pos,
           |           CAST(sum(CAST(x.val AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_v
           |    FROM (
           |      SELECT a$i.cluster, generate_subscripts(e.v, 1) - 1 AS pos, unnest(e.v) AS val
           |      FROM a$i JOIN e USING (vec_id)
           |    ) x GROUP BY x.cluster, x.pos
           |  ) m GROUP BY cluster
           |)""".stripMargin)
    }
    sb.toString
  }

  private val kmeansOracleSql =
    kmeansCtes(K, ITERS) +
      s"""
         |SELECT vec_id, cluster FROM a$ITERS ORDER BY vec_id""".stripMargin

  /** Deterministic k-means cluster assignments after a fixed number of
    * Lloyd iterations. */
  val kmeans = QueryDef(
    "q_ns_kmeans",
    kmeansOracleSql) { (s, d) =>
    Cluster.kmeansAssign(T.embeddings(s, d), K, ITERS).orderBy("vec_id")
  }

  /** k-means assignment served from PERSISTED centroids (ops.Models
    * fit/apply split): build-once per JVM via Cluster.kmeansBuild, then a
    * single broadcast argmax pass with no Lloyd iterations — the shape
    * that classifies corpus increments against a fixed fitted model.
    * Deterministic fit ⇒ oracle shared with q_ns_kmeans. */
  val kmeansServed = QueryDef(
    "q_ns_kmeans_served",
    kmeansOracleSql) { (s, d) =>
    val dir = graft.ops.Models.ensureBuilt(s"kmeans|$d|k=$K,it=$ITERS") {
      tmp => Cluster.kmeansBuild(T.embeddings(s, d), tmp, K, ITERS)
    }
    Cluster.kmeansAssignServed(s, dir, T.embeddings(s, d)).orderBy("vec_id")
  }

  /** SemDeDup: intra-cluster near-dup pruning (keep the smallest vec_id of
    * each near pair) on top of the k-means assignment. */
  val semDedup = QueryDef(
    "q_ns_semdedup",
    kmeansCtes(K, ITERS) +
      s""",
         |ae AS MATERIALIZED (
         |  SELECT a$ITERS.vec_id, a$ITERS.cluster, e.v FROM a$ITERS JOIN e USING (vec_id)
         |),
         |dropped AS MATERIALIZED (
         |  SELECT DISTINCT b.vec_id FROM ae a JOIN ae b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.v, b.v) >= $SEM_MIN_COS
         |)
         |SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS kept
         |FROM ae a LEFT JOIN dropped d USING (vec_id)
         |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
    Cluster.semDedup(T.embeddings(s, d), SEM_MIN_COS, K, ITERS).orderBy("vec_id")
  }

  /** Int8 scalar quantization: per-vector code digest + decimal-rounded
    * reconstruction error. */
  val quantize = QueryDef(
    "q_ns_embed_quantize",
    """WITH x AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |),
      |st AS MATERIALIZED (
      |  SELECT pos, min(v) AS mn, max(v) AS mx FROM x GROUP BY pos
      |),
      |qq AS (
      |  SELECT vec_id, pos, v, mn, mx,
      |         CASE WHEN mx > mn
      |              THEN least(255, greatest(0, CAST(floor(((v - mn) * 255.0) / (mx - mn)) AS BIGINT)))
      |              ELSE 0 END AS q
      |  FROM x JOIN st USING (pos)
      |),
      |r AS (
      |  SELECT vec_id, pos, q,
      |         CAST(abs(v - (CASE WHEN mx > mn
      |                            THEN mn + ((CAST(q AS DOUBLE) + 0.5) * (mx - mn)) / 255.0
      |                            ELSE mn END)) AS DECIMAL(18,6)) AS err
      |  FROM qq
      |)
      |SELECT vec_id,
      |       md5(array_to_string(list(CAST(q AS VARCHAR) ORDER BY pos), ',')) AS code_hash,
      |       CAST(sum(err) AS DOUBLE) AS recon_err
      |FROM r GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Quantize.sqQuantize(T.embeddings(s, d)).orderBy("vec_id")
  }

  private val bucketSql =
    """CAST(CAST(list_sum(list_transform(generate_series(1, 4),
      |    i -> (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
      |         * CASE i WHEN 1 THEN 4096 WHEN 2 THEN 256 WHEN 3 THEN 16 ELSE 1 END)) AS BIGINT)
      |    % 100 AS BIGINT)""".stripMargin

  private val qualityScoreSql =
    """(CAST(list_sum(list_transform(string_split_regex(lower(trim(text)), '\s+'), x -> length(x))) AS DOUBLE)
      |          / len(string_split_regex(lower(trim(text)), '\s+'))) * 0.2
      |        + (CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |               x -> list_contains(['the','a','an','of','and','to','in','is'], x))) AS DOUBLE)
      |           / len(string_split_regex(lower(trim(text)), '\s+'))) * 2.0
      |        - (CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |           / length(text)) * 5.0""".stripMargin

  /** Quality-weighted deterministic sampling: acceptance percentage
    * floor(quality_score·100) clamped to [0,100], decided by the stable
    * md5 split bucket. */
  val qualitySample = QueryDef(
    "q_ns_quality_sample",
    s"""WITH q AS (
       |  SELECT doc_id,
       |         $bucketSql AS keep_bucket,
       |         greatest(0, least(100, CAST(floor(($qualityScoreSql) * 100) AS BIGINT))) AS keep_pct
       |  FROM documents
       |)
       |SELECT doc_id, keep_bucket, keep_pct,
       |       keep_bucket < keep_pct AS kept
       |FROM q ORDER BY doc_id""".stripMargin) { (s, d) =>
    Sampling.weightedKeep(TextAnalysis.withQuality(T.documents(s, d)))
      .select("doc_id", "keep_bucket", "keep_pct", "kept")
      .orderBy("doc_id")
  }

  /** Quality-band (curriculum-phase) assignment: quartile boundaries of
    * the quality score computed once (exact percentile) and BROADCAST,
    * per-row band = count of boundaries at or below the score — the
    * scale-safe ntile (an empty-OVER ntile funnels the corpus through
    * one partition; this is map-only after a 1-row aggregate). Exact
    * percentile interpolation matches cross-engine (q_a13 precedent),
    * so band populations and score ranges hash-match. */
  val curriculumBands = QueryDef(
    "q_ns_curriculum_bands",
    s"""WITH q AS (
       |  SELECT doc_id, ($qualityScoreSql) AS score FROM documents
       |),
       |b AS (
       |  SELECT quantile_cont(score, [0.25, 0.5, 0.75]) AS bounds FROM q
       |)
       |SELECT CAST(len(list_filter(b.bounds, x -> q.score >= x)) AS BIGINT) AS band,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       min(q.score) AS min_score,
       |       max(q.score) AS max_score
       |FROM q CROSS JOIN b
       |GROUP BY 1
       |ORDER BY band""".stripMargin) { (s, d) =>
    val scored = TextAnalysis.withQuality(T.documents(s, d))
    Sampling.withQualityBands(scored, "quality_score", nBands = 4)
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality_score")).as("min_score"),
        max(col("quality_score")).as("max_score"))
      .orderBy("band")
  }

  /** Canonical text normalization: lowercase, punctuation to spaces,
    * whitespace collapsed; md5 equality witness. */
  val textNormalize = QueryDef(
    "q_ns_text_normalize",
    """SELECT doc_id,
      |       CAST(length(trim(regexp_replace(regexp_replace(lower(text),
      |              '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS norm_chars,
      |       md5(trim(regexp_replace(regexp_replace(lower(text),
      |              '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_hash
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.withNormalizedText(T.documents(s, d))
      .select("doc_id", "norm_chars", "norm_hash")
      .orderBy("doc_id")
  }

  /** Unicode NFC normalization via the custom codegen Expression
    * ([[graft.expr.NfcNormalize]]): planted decomposed sequences (é as
    * e + combining U+0301; decomposed Hangul jamo U+1100 U+1161) on even
    * doc_ids compose to single code points, odd doc_ids stay ASCII and
    * ride the isNormalized fast path — both visible in the raw-vs-NFC
    * code-point counts and the md5 of the canonical bytes, which DuckDB's
    * nfc_normalize (same Unicode algorithm) reproduces exactly. */
  val textNfc = QueryDef(
    "q_ns_text_nfc",
    """WITH raw AS (
      |  SELECT doc_id,
      |         text || (CASE WHEN doc_id % 2 = 0
      |           THEN ' cafe' || chr(769) || ' ' || chr(4352) || chr(4449)
      |           ELSE ' plain ascii tail' END) AS t
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(length(t) AS BIGINT) AS raw_chars,
      |       CAST(length(nfc_normalize(t)) AS BIGINT) AS nfc_chars,
      |       md5(nfc_normalize(t)) AS nfc_hash
      |FROM raw
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val raw = concat(col("text"),
      when(col("doc_id") % 2 === 0, lit(" cafe\u0301 \u1100\u1161"))
        .otherwise(lit(" plain ascii tail")))
    T.documents(s, d)
      .select(col("doc_id"), raw.as("t"))
      .select(col("doc_id"),
        length(col("t")).cast("long").as("raw_chars"),
        length(graft.expr.NfcNormalize.nfc(col("t"))).cast("long")
          .as("nfc_chars"),
        md5(graft.expr.NfcNormalize.nfc(col("t"))).as("nfc_hash"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------ product quantization

  private val PQ_M = 4
  private val PQ_SUBDIM = 16
  private val PQ_K = 8
  private val PQ_ITERS = 2

  /** Per-subspace unrolled k-means CTE chain, suffixed `_s$s`: e_s$s is
    * the subvector slice, then c0_s$s, a1_s$s, c1_s$s, ..., a{iters}_s$s
    * — the kmeansCtes pattern parameterized by subspace. */
  private def pqKmeansCtes(s: Int, subDim: Int, k: Int, iters: Int): String = {
    val lo = s * subDim + 1
    val hi = (s + 1) * subDim
    val sb = new StringBuilder
    sb.append(
      s"""e_s$s AS MATERIALIZED (
         |  SELECT vec_id, list_slice(CAST(embedding AS DOUBLE[]), $lo, $hi) AS v
         |  FROM embeddings
         |),
         |c0_s$s AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cluster,
         |         v AS c
         |  FROM (SELECT vec_id, v FROM e_s$s
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k) x
         |)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(
        s""",
           |a${i}_s$s AS MATERIALIZED (
           |  SELECT vec_id, cluster FROM (
           |    SELECT e.vec_id, c.cluster,
           |           row_number() OVER (PARTITION BY e.vec_id
           |             ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cluster) AS rn
           |    FROM e_s$s e CROSS JOIN c${i - 1}_s$s c) t WHERE rn = 1
           |)""".stripMargin)
      if (i < iters) sb.append(
        s""",
           |c${i}_s$s AS MATERIALIZED (
           |  SELECT cluster, list(mean_v ORDER BY pos) AS c FROM (
           |    SELECT x.cluster, x.pos,
           |           CAST(sum(CAST(x.val AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_v
           |    FROM (
           |      SELECT a.cluster, generate_subscripts(e.v, 1) - 1 AS pos, unnest(e.v) AS val
           |      FROM a${i}_s$s a JOIN e_s$s e USING (vec_id)
           |    ) x GROUP BY x.cluster, x.pos
           |  ) mm GROUP BY cluster
           |)""".stripMargin)
    }
    sb.toString
  }

  private def pqAllCtes: String =
    "WITH " + (0 until PQ_M).map(s =>
      pqKmeansCtes(s, PQ_SUBDIM, PQ_K, PQ_ITERS)).mkString(",\n")

  /** PQ code table: m=4 subspaces × 16 dims, k=8 codes each — the code
    * columns are the oracle-parity witness (same idea as the LSH bucket
    * ids: code equality proves the whole per-subspace k-means matched). */
  private val pqCodesOracleSql =
    pqAllCtes +
      s"""
         |SELECT a0.vec_id, ${(0 until PQ_M).map(s => s"CAST(a$s.cluster AS BIGINT) AS code_$s").mkString(", ")}
         |FROM a${PQ_ITERS}_s0 a0
         |${(1 until PQ_M).map(s => s"JOIN a${PQ_ITERS}_s$s a$s ON a$s.vec_id = a0.vec_id").mkString("\n")}
         |ORDER BY a0.vec_id""".stripMargin

  val pqCodes = QueryDef(
    "q_ns_pq_codes",
    pqCodesOracleSql) { (s, d) =>
    Quantize.pqEncode(T.embeddings(s, d), PQ_M, PQ_SUBDIM, PQ_K, PQ_ITERS)
      .orderBy("vec_id")
  }

  /** PQ encode served from PERSISTED codebooks (ops.Models fit/apply
    * split — the daily-ingest append path): vectors get codes via one
    * broadcast argmax per subspace against the artifact's codebooks,
    * zero Lloyd work. Encoding the fit corpus reproduces the fit's codes
    * exactly (the fit's final assignment IS this argmax), so the oracle
    * is shared verbatim with q_ns_pq_codes. */
  val pqCodesServed = QueryDef(
    "q_ns_pq_codes_served",
    pqCodesOracleSql) { (s, d) =>
    val dir = graft.ops.Models.ensureBuilt(
      s"ivfpq|$d|m=$PQ_M,sub=$PQ_SUBDIM,k=$PQ_K,it=$PQ_ITERS") { tmp =>
      Quantize.ivfPqBuild(T.embeddings(s, d), tmp,
        PQ_M, PQ_SUBDIM, PQ_K, PQ_ITERS)
    }
    Quantize.pqEncodeServed(s, dir, T.embeddings(s, d), PQ_M, PQ_SUBDIM)
      .orderBy("vec_id")
  }

  /** Shared ADC building blocks: q (query vectors), lut_s (per-subspace
    * query x codebook dots), codes — reused by the brute ADC tail and the
    * IVF-routed variant. */
  private def pqQLutCodesCtes: String =
    s"""q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < 10
       |),
       |${(0 until PQ_M).map(s =>
        s"""lut_$s AS MATERIALIZED (
           |  SELECT q.query_id, CAST(c.cluster AS BIGINT) AS code_$s,
           |         list_reduce(list_transform(generate_series(1, len(c.c)),
           |           i -> qv[${s * PQ_SUBDIM} + i] * c.c[i]), (a, b) -> a + b) AS d_$s
           |  FROM q CROSS JOIN c${PQ_ITERS - 1}_s$s c
           |)""".stripMargin).mkString(",\n")},
       |codes AS (
       |  SELECT a0.vec_id, ${(0 until PQ_M).map(s => s"CAST(a$s.cluster AS BIGINT) AS code_$s").mkString(", ")}
       |  FROM a${PQ_ITERS}_s0 a0
       |  ${(1 until PQ_M).map(s => s"JOIN a${PQ_ITERS}_s$s a$s ON a$s.vec_id = a0.vec_id").mkString("\n  ")}
       |)""".stripMargin

  /** Full-corpus ADC oracle tail: blocks + scored (fixed-order score sum
    * over every corpus vector). */
  private def pqAdcCtes: String =
    s"""$pqQLutCodesCtes,
       |scored AS (
       |  SELECT l0.query_id, codes.vec_id,
       |         (${(0 until PQ_M).map(s => s"d_$s").mkString(" + ")}) AS score
       |  FROM codes
       |  ${(0 until PQ_M).map(s =>
          if (s == 0) s"JOIN lut_0 l0 ON l0.code_0 = codes.code_0"
          else s"JOIN lut_$s l$s ON l$s.query_id = l0.query_id AND l$s.code_$s = codes.code_$s")
         .mkString("\n  ")}
       |  WHERE codes.vec_id <> l0.query_id
       |)""".stripMargin

  /** Inner-product ADC top-5 over the PQ codes: per-query m×k dot lookup
    * tables against the subspace codebooks (c{iters-1}), score = the m
    * lookups summed in fixed order (bit-exact cross-engine), rank-only
    * output with vec_id tie-break (identical code tuples tie exactly). */
  val pqTopK = QueryDef(
    "q_ns_pq_topk",
    pqAllCtes + ",\n" + pqAdcCtes +
      s"""
         |SELECT query_id, rank, neighbor_id
         |FROM (
         |  SELECT query_id, vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY score DESC, vec_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    Quantize.pqTopK(T.embeddings(s, d), (0L until 10L), 5,
      PQ_M, PQ_SUBDIM, PQ_K, PQ_ITERS)
      .orderBy("query_id", "rank")
  }

  /** PQ recall@5 against the EXACT inner-product ranking — ANN quality
    * measured inside the hash gate: both rankings and the per-query hit
    * count reproduce cross-engine (exact dots run the same left-to-right
    * fold, ADC score ties break on vec_id). NOTE on the value itself: the
    * synthetic embeddings are near-uniform random, the worst case for PQ
    * (no cluster structure to exploit), so recall@5 at m=4/k=8 sits
    * around 0.1-0.3 here — the point of the query is that the metric a
    * config decision needs is computed and verified in-gate; structured
    * inputs code tightly (ClusterSpec's planted-copy test). */
  val pqRecall = QueryDef(
    "q_ns_pq_recall",
    pqAllCtes + ",\n" + pqAdcCtes +
      s""",
         |approx AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM (
         |    SELECT query_id, vec_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY score DESC, vec_id) AS rank
         |    FROM scored) t
         |  WHERE rank <= 5
         |),
         |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |exact AS (
         |  SELECT query_id, vec_id AS neighbor_id
         |  FROM (
         |    SELECT q.query_id, ev.vec_id,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY list_reduce(list_transform(generate_series(1, len(ev.v)),
         |               i -> q.qv[i] * ev.v[i]), (a, b) -> a + b) DESC, ev.vec_id) AS rank
         |    FROM ev CROSS JOIN q
         |    WHERE ev.vec_id <> q.query_id) t
         |  WHERE rank <= 5
         |),
         |hits AS (
         |  SELECT a.query_id, count(*) AS n_hits
         |  FROM approx a JOIN exact USING (query_id, neighbor_id)
         |  GROUP BY a.query_id
         |)
         |SELECT q.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
         |FROM q LEFT JOIN hits h USING (query_id)
         |ORDER BY q.query_id""".stripMargin) { (s, d) =>
    Quantize.pqRecallAtK(T.embeddings(s, d), (0L until 10L), 5,
      PQ_M, PQ_SUBDIM, PQ_K, PQ_ITERS)
      .orderBy("query_id")
  }

  /** IVF-PQ: coarse label-centroid routing (nprobe = 2) bounding the scan
    * to the probed inverted lists, PQ-ADC scoring within them — the
    * billion-vector serving composition with both halves already
    * oracle-proven separately (q_ns_sim_ivf_* routing, q_ns_pq_topk ADC).
    * Rank-only output; routing ranks and ADC score ordering are both
    * stable cross-engine. */
  private val ivfPqOracleSql =
    pqAllCtes + ",\n" + pqQLutCodesCtes +
      s""",
         |expanded AS (
         |  SELECT label, generate_subscripts(embedding, 1) AS pos,
         |         unnest(CAST(embedding AS DOUBLE[])) AS v
         |  FROM embeddings
         |),
         |cent AS (
         |  SELECT label, list(c ORDER BY pos) AS centroid
         |  FROM (SELECT label, pos, avg(v) AS c FROM expanded GROUP BY label, pos) g
         |  GROUP BY label
         |),
         |routed AS (
         |  SELECT query_id, label AS probe_label
         |  FROM (
         |    SELECT q.query_id, c.label,
         |           row_number() OVER (
         |             PARTITION BY q.query_id
         |             ORDER BY list_cosine_similarity(q.qv, c.centroid) DESC, c.label) AS rn
         |    FROM q CROSS JOIN cent c
         |  ) x WHERE rn <= 2
         |),
         |cand AS (
         |  SELECT r.query_id, e.vec_id
         |  FROM embeddings e JOIN routed r ON e.label = r.probe_label
         |  WHERE e.vec_id <> r.query_id
         |),
         |scored AS (
         |  SELECT cand.query_id, cand.vec_id,
         |         (${(0 until PQ_M).map(s => s"d_$s").mkString(" + ")}) AS score
         |  FROM cand
         |  JOIN codes ON codes.vec_id = cand.vec_id
         |  ${(0 until PQ_M).map(s =>
            s"JOIN lut_$s l$s ON l$s.query_id = cand.query_id AND l$s.code_$s = codes.code_$s")
           .mkString("\n  ")}
         |)
         |SELECT query_id, rank, neighbor_id
         |FROM (
         |  SELECT query_id, vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY score DESC, vec_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin

  val ivfPqTopK = QueryDef(
    "q_ns_ivfpq_topk",
    ivfPqOracleSql) { (s, d) =>
    Quantize.ivfPqTopK(T.embeddings(s, d), (0L until 10L), 3,
      nprobe = 2, PQ_M, PQ_SUBDIM, PQ_K, PQ_ITERS)
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ served from a PERSISTED index — the fit/apply split
    * (ops.Models): the first call in a JVM builds the parquet artifact
    * (coarse centroids + codebooks + encoded corpus) via
    * Quantize.ivfPqBuild; every later call — and every later bench rep —
    * serves top-k with ZERO fitting, reading only the query batch and the
    * index tables. Deterministic fit ⇒ identical output to the refitting
    * form, so the oracle is shared verbatim with q_ns_ivfpq_topk. This is
    * the lifecycle a billion-vector index actually runs: Lloyd paid once
    * offline, serving cost proportional to probed lists only. */
  val ivfPqServed = QueryDef(
    "q_ns_ivfpq_served",
    ivfPqOracleSql) { (s, d) =>
    val dir = graft.ops.Models.ensureBuilt(
      s"ivfpq|$d|m=$PQ_M,sub=$PQ_SUBDIM,k=$PQ_K,it=$PQ_ITERS") { tmp =>
      Quantize.ivfPqBuild(T.embeddings(s, d), tmp,
        PQ_M, PQ_SUBDIM, PQ_K, PQ_ITERS)
    }
    val queries = T.embeddings(s, d)
      .filter(col("vec_id").isin((0L until 10L): _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    Quantize.ivfPqServe(s, dir, queries, 3, nprobe = 2, PQ_M, PQ_SUBDIM)
      .orderBy("query_id", "rank")
  }

  /** md5-seeded Rademacher (Johnson-Lindenstrauss) projection to 8 dims,
    * flat (vec_id, pos, v) output — projections are exact doubles on both
    * engines (same fold order), so the hash gate compares them directly. */
  val randomProjection = QueryDef(
    "q_ns_random_projection",
    graft.ops.Neutral.randomProjectOracleSql(8)) { (s, d) =>
    graft.ops.Neutral.randomProjectFlat(T.embeddings(s, d), outDim = 8)
      .orderBy("vec_id", "pos")
  }

  val defs: Seq[QueryDef] =
    Seq(kmeans, kmeansServed, semDedup, quantize, qualitySample,
      curriculumBands,
      textNormalize, textNfc, pqCodes, pqCodesServed, pqTopK, pqRecall, ivfPqTopK,
      ivfPqServed, randomProjection)
}
