package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Pipeline, Similarity}

/** Training-data layout operators: concat-and-chunk sequence packing and
  * per-label embedding centroids — both exactly SQL-expressible with the
  * decimal determinism contract, so both carry DuckDB oracles.
  */
object TrainPrep {

  /** Pack documents into 256-token training sequences per source shard;
    * per-sequence doc/token stats. One window cumsum partitioned by
    * source — packing parallelizes across groups. */
  val packSequences = QueryDef(
    "q_ns_pack_sequences",
    """WITH d AS (
      |  SELECT source, doc_id,
      |         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                              w -> w <> '')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT source, doc_id, n_tokens,
      |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d
      |)
      |SELECT source, CAST(floor((cum - n_tokens) / 256) AS BIGINT) AS seq_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
      |FROM c GROUP BY source, seq_id
      |ORDER BY source, seq_id""".stripMargin) { (s, d) =>
    Pipeline.packSequences(T.documents(s, d), budget = 256)
      .orderBy("source", "seq_id")
  }

  /** Per-label mean embedding, flattened to (label, pos, mean_v) — the
    * class-prototype primitive (nearest-centroid labeling, drift checks).
    * Element sums accumulate in DECIMAL(18,6) on both engines. */
  val embedCentroids = QueryDef(
    "q_ns_embed_centroids",
    """WITH x AS (
      |  SELECT label, generate_subscripts(embedding, 1) - 1 AS p,
      |         unnest(embedding) AS v
      |  FROM embeddings
      |)
      |SELECT label, CAST(p AS INT) AS pos,
      |       CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6)))
      |            AS DOUBLE) / count(*) AS mean_v
      |FROM x GROUP BY label, p
      |ORDER BY label, pos""".stripMargin) { (s, d) =>
    Similarity.labelCentroidsFlat(T.embeddings(s, d))
      .orderBy("label", "pos")
  }

  val defs: Seq[QueryDef] = Seq(packSequences, embedCentroids)
}
