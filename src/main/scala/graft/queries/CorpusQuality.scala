package graft.queries

import graft.ops.{CorpusQuality => CQ}

/** Corpus-quality pipeline queries: Gopher-style repetition filtering,
  * boilerplate segment removal, sliding-window chunking, domain mixture
  * weighting, and train/val split drift — each with a full DuckDB oracle
  * reproducing the same arithmetic (fractions divide exact BIGINTs once;
  * ln terms round to DECIMAL(18,6) per the determinism contract).
  */
object CorpusQueries {

  private val toks =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  val gopherQuality = QueryDef(
    "q_ns_gopher_quality",
    s"""WITH w AS (
      |  SELECT doc_id, $toks AS ws FROM documents
      |), base AS (
      |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens,
      |         CASE WHEN len(ws) >= 3 THEN
      |           list_transform(generate_series(1, len(ws) - 2),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |         ELSE CAST([] AS VARCHAR[]) END AS tg
      |  FROM w
      |), tri AS (
      |  SELECT doc_id, n_tokens, CAST(len(tg) AS BIGINT) AS n_tri,
      |         CAST(len(tg) - len(list_distinct(tg)) AS BIGINT) AS n_dup_tri
      |  FROM base
      |), bg AS (
      |  SELECT doc_id, unnest(CASE WHEN len(ws) >= 2 THEN
      |           list_transform(generate_series(1, len(ws) - 1),
      |             i -> ws[i] || ' ' || ws[i+1])
      |         ELSE CAST([] AS VARCHAR[]) END) AS g
      |  FROM w
      |), topbg AS (
      |  SELECT doc_id, CAST(max(n) AS BIGINT) AS top_bigram_n
      |  FROM (SELECT doc_id, g, count(*) AS n FROM bg GROUP BY doc_id, g)
      |  GROUP BY doc_id
      |)
      |SELECT t.doc_id, t.n_tokens, t.n_tri, t.n_dup_tri,
      |       COALESCE(top_bigram_n, 0) AS top_bigram_n,
      |       CASE WHEN t.n_tokens > 0
      |            THEN CAST(COALESCE(top_bigram_n, 0) * 2 AS DOUBLE) / t.n_tokens
      |            ELSE 0.0 END AS top_bigram_frac,
      |       CASE WHEN t.n_tri > 0
      |            THEN CAST(t.n_dup_tri AS DOUBLE) / t.n_tri
      |            ELSE 0.0 END AS dup_tri_frac,
      |       (t.n_tokens >= 20
      |        AND (CASE WHEN t.n_tokens > 0
      |             THEN CAST(COALESCE(top_bigram_n, 0) * 2 AS DOUBLE) / t.n_tokens
      |             ELSE 0.0 END) <= 0.08
      |        AND (CASE WHEN t.n_tri > 0
      |             THEN CAST(t.n_dup_tri AS DOUBLE) / t.n_tri
      |             ELSE 0.0 END) <= 0.55) AS keep
      |FROM tri t LEFT JOIN topbg USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    CQ.gopherRepetition(T.documents(s, d)).orderBy("doc_id")
  }

  val boilerplate = QueryDef(
    "q_ns_boilerplate",
    s"""WITH w AS (
      |  SELECT doc_id, $toks AS ws FROM documents
      |), segs AS (
      |  SELECT doc_id,
      |         md5(array_to_string(ws[i*8+1 : i*8+8], ' ')) AS seg_hash,
      |         CAST(least(8, len(ws) - i*8) AS BIGINT) AS seg_len
      |  FROM w, unnest(range(CAST(floor((len(ws) + 7) / 8) AS BIGINT))) AS t(i)
      |), dfs AS (
      |  SELECT seg_hash, count(DISTINCT doc_id) AS seg_df FROM segs GROUP BY seg_hash
      |)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_segments,
      |       CAST(count(*) FILTER (WHERE seg_df >= 2) AS BIGINT) AS n_removed,
      |       CAST(COALESCE(sum(seg_len) FILTER (WHERE seg_df < 2), 0) AS BIGINT) AS kept_tokens
      |FROM segs JOIN dfs USING (seg_hash)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    CQ.boilerplateSegments(T.documents(s, d)).orderBy("doc_id")
  }

  val chunkOverlap = QueryDef(
    "q_ns_chunk_overlap",
    s"""WITH w AS (
      |  SELECT doc_id, $toks AS ws FROM documents
      |), d AS (
      |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM w WHERE len(ws) > 0
      |)
      |SELECT doc_id,
      |       CAST(i AS BIGINT) AS chunk_id,
      |       CAST(i * 24 AS BIGINT) AS start_tok,
      |       CAST(least(32, n - i * 24) AS BIGINT) AS chunk_tokens,
      |       md5(array_to_string(ws[i*24+1 : i*24+32], ' ')) AS chunk_hash
      |FROM d, unnest(range(CAST(floor((greatest(n - 32, 0) + 23) / 24) AS BIGINT) + 1)) AS t(i)
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    CQ.chunkWithOverlap(T.documents(s, d)).orderBy("doc_id", "chunk_id")
  }

  val domainMix = QueryDef(
    "q_ns_domain_mix",
    s"""WITH w AS (
      |  SELECT source, $toks AS ws FROM documents
      |), per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(len(ws)) AS BIGINT) AS tokens
      |  FROM w GROUP BY source
      |), tot AS (
      |  SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
      |         CAST(count(*) AS BIGINT) AS n_sources
      |  FROM per
      |)
      |SELECT source, n_docs, tokens,
      |       CAST(tokens AS DOUBLE) / total_tokens AS token_share,
      |       least(4.0, (1.0 / n_sources)
      |                  / (CAST(tokens AS DOUBLE) / total_tokens)) AS weight
      |FROM per CROSS JOIN tot
      |ORDER BY source""".stripMargin) { (s, d) =>
    CQ.domainMixWeights(T.documents(s, d)).orderBy("source")
  }

  /** Shared temperature-mix CTE chain: per-source token shares, sqrt
    * weights (DECIMAL-exact normalizer) — tail ends at `ps`/`z`. */
  private val tempCtes =
    s"""w AS (
       |  SELECT source, $toks AS ws FROM documents
       |), per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(len(ws)) AS BIGINT) AS tokens
       |  FROM w GROUP BY source
       |), tot AS (
       |  SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM per
       |), ps AS (
       |  SELECT source, n_docs, tokens,
       |         CAST(tokens AS DOUBLE) / total_tokens AS p,
       |         CAST(sqrt(CAST(tokens AS DOUBLE) / total_tokens)
       |              AS DECIMAL(18,9)) AS sp
       |  FROM per CROSS JOIN tot
       |), z AS (SELECT sum(sp) AS z FROM ps)""".stripMargin

  /** Temperature-weighted source mixing (α = 0.5 — sqrt is IEEE-exact in
    * both engines; pow's last ulp is not): w ∝ sqrt(token share),
    * normalized with a DECIMAL(18,9) exact sum; boost = w/p is the
    * sampler's per-source multiplier. */
  val temperatureMix = QueryDef(
    "q_ns_temperature_mix",
    s"""WITH $tempCtes
      |SELECT source, n_docs, tokens, p,
      |       CAST(sp AS DOUBLE) / CAST(z AS DOUBLE) AS w,
      |       (CAST(sp AS DOUBLE) / CAST(z AS DOUBLE)) / p AS boost
      |FROM ps CROSS JOIN z
      |ORDER BY source""".stripMargin) { (s, d) =>
    CQ.temperatureMixWeights(T.documents(s, d)).orderBy("source")
  }

  /** The DuckDB twin of Sampling.splitBucket / saltedBucket: first 4 md5
    * hex digits of `arg` as an integer, mod 100. Shared with every oracle
    * that mirrors a salted-bucket decision (e.g. TrainPrep's lmfit half). */
  private[queries] def bucketSqlOf(arg: String) =
    s"""CAST(CAST(list_sum(list_transform(generate_series(1, 4),
      |    i -> (instr('0123456789abcdef', substring(md5($arg), i, 1)) - 1)
      |         * CASE i WHEN 1 THEN 4096 WHEN 2 THEN 256 WHEN 3 THEN 16 ELSE 1 END)) AS BIGINT)
      |    % 100 AS BIGINT)""".stripMargin

  /** Resampling uses the "resample"-salted bucket (independent of the
    * split bucket — see Sampling.saltedBucket). */
  private val resampleBucketExpr =
    bucketSqlOf("'resample:' || CAST(doc_id AS VARCHAR)")

  /** The mix weights MATERIALIZED: every doc emitted floor(boost) times
    * plus a fractional extra decided by the stable md5 bucket — the
    * weights-to-training-rows step, deterministic across engines. */
  val temperatureResample = QueryDef(
    "q_ns_temperature_resample",
    s"""WITH $tempCtes,
      |bw AS (
      |  SELECT source,
      |         (CAST(sp AS DOUBLE) / CAST(z AS DOUBLE)) / p AS boost
      |  FROM ps CROSS JOIN z
      |), nc AS (
      |  SELECT d.doc_id, d.source,
      |         CAST(floor(boost) AS BIGINT)
      |         + CASE WHEN CAST($resampleBucketExpr AS DOUBLE) / 100.0
      |                     < boost - floor(boost) THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN bw USING (source)
      |)
      |SELECT doc_id, source, CAST(copy AS BIGINT) AS copy
      |FROM nc, unnest(generate_series(1, CAST(n_copies AS INTEGER))) AS t(copy)
      |ORDER BY doc_id, copy""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    graft.ops.Sampling.resampleByWeight(docs, CQ.temperatureMixWeights(docs))
      .orderBy("doc_id", "copy")
  }

  val splitDrift = QueryDef(
    "q_ns_split_drift",
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(generate_series(1, 4),
      |      i -> (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
      |           * CASE i WHEN 1 THEN 4096 WHEN 2 THEN 256 WHEN 3 THEN 16 ELSE 1 END)) AS BIGINT)
      |      % 100 AS sb,
      |    least(n_chars // 50, 9) AS bucket
      |  FROM documents
      |), s AS (
      |  SELECT CASE WHEN sb < 80 THEN 'train' ELSE 'val' END AS split, bucket
      |  FROM b WHERE sb < 90
      |), c AS (
      |  SELECT split, bucket, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY split, bucket
      |), tr AS (SELECT bucket, n AS n_train FROM c WHERE split = 'train'),
      |va AS (SELECT bucket, n AS n_val FROM c WHERE split = 'val'),
      |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot_train FROM c WHERE split = 'train'),
      |tv AS (SELECT CAST(sum(n) AS BIGINT) AS tot_val FROM c WHERE split = 'val')
      |SELECT bucket,
      |       COALESCE(n_train, 0) AS n_train,
      |       COALESCE(n_val, 0) AS n_val,
      |       CAST(COALESCE(n_train, 0) AS DOUBLE) / tot_train AS p_train,
      |       CAST(COALESCE(n_val, 0) AS DOUBLE) / tot_val AS p_val,
      |       CAST(CASE WHEN COALESCE(n_train, 0) > 0 AND COALESCE(n_val, 0) > 0 THEN
      |         CAST((CAST(n_train AS DOUBLE) / tot_train)
      |              * ln((CAST(n_train AS DOUBLE) / tot_train)
      |                   / (CAST(n_val AS DOUBLE) / tot_val)) AS DECIMAL(18,6))
      |       END AS DOUBLE) AS kl_term
      |FROM tr FULL OUTER JOIN va USING (bucket) CROSS JOIN tt CROSS JOIN tv
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    CQ.splitDrift(T.documents(s, d)).orderBy("bucket")
  }

  /** Content-defined chunking: boundaries where the token-bigram hash
    * lands in the 1/16 class — chunk identity is a function of local
    * content, so edits upstream don't shift downstream chunk hashes
    * (the dedup-stability fixed-stride chunking lacks; measured in
    * OpsSpec). Map-only per-doc array work. */
  val chunkCdc = QueryDef(
    "q_ns_chunk_cdc",
    s"""WITH w AS (
      |  SELECT doc_id, $toks AS ws FROM documents
      |), b AS (
      |  SELECT doc_id, ws,
      |         list_filter(generate_series(2, len(ws) - 1),
      |           i -> (CAST('0x' || substr(md5(ws[i-1] || ' ' || ws[i]), 1, 8)
      |                 AS BIGINT) % 16) = 0) AS bpos
      |  FROM w WHERE len(ws) > 0
      |), c AS (
      |  SELECT doc_id, ws,
      |         list_prepend(CAST(1 AS BIGINT),
      |           list_transform(bpos, x -> x + 1)) AS starts,
      |         list_append(bpos, CAST(len(ws) AS BIGINT)) AS ends
      |  FROM b
      |)
      |SELECT doc_id,
      |       CAST(j - 1 AS BIGINT) AS chunk_id,
      |       CAST(ends[j] - starts[j] + 1 AS BIGINT) AS n_tokens,
      |       md5(array_to_string(ws[starts[j] : ends[j]], ' ')) AS chunk_hash
      |FROM c, unnest(generate_series(1, len(starts))) AS t(j)
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    CQ.chunkContentDefined(T.documents(s, d)).orderBy("doc_id", "chunk_id")
  }

  val defs: Seq[QueryDef] =
    Seq(gopherQuality, boilerplate, chunkOverlap, domainMix, temperatureMix,
      temperatureResample, splitDrift, chunkCdc)
}
