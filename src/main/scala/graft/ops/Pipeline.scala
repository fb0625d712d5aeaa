package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition the individual
  * north-star operators exist for: language gate → quality floor → exact +
  * near dedup → token-count annotation, as one call. Every stage is one of
  * the proven operators (same columns, same semantics), so the composite
  * sits under the DuckDB hash gate too (`q_ns_prepare_corpus`).
  *
  * Shape at 100 TB: the gates are map-only column predicates evaluated at
  * scan speed BEFORE the dedup shuffles, so the expensive stages see only
  * surviving rows — filter-first is the whole design.
  */
object Pipeline {

  /** Returns the retained docs annotated with token counts:
    * (doc_id, n_ws_tokens, n_bpe_tokens). */
  def prepareCorpus(docs: DataFrame, lang: String = "en",
      minQuality: Double = 0.8, minJaccard: Double = 0.8): DataFrame = {
    val gated = TextAnalysis.withQuality(TextAnalysis.withLangId(docs))
      .filter(col("predicted_lang") === lang &&
        col("quality_score") >= minQuality)
      .select(docs.columns.toIndexedSeq.map(col): _*)
    val deduped = Dedup.dedupCorpus(gated, minJaccard = minJaccard)
    TextAnalysis.withTokenCounts(deduped)
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
  }

  /** [[prepareCorpus]] with the heuristic language gate replaced by the
    * SUPERVISED Naive Bayes classifier served from a persisted model
    * artifact — the CCNet shape: a fastText-style classifier trained on a
    * labeled slice gates the whole corpus, then the quality floor, dedup,
    * and token annotation run as before. The model tables arrive by
    * broadcast (classes x vocab bounded, loaded from `modelDir` — zero
    * fitting in this plan); the per-doc argmax is a doc-partitioned
    * window; the only corpus-keyed exchange the gate adds is the doc_id
    * score aggregation + keep-set semi join — both on the primary key,
    * both AQE-coalesced. Filter-first still holds: the quality floor is
    * map-only and prunes rows before the dedup shuffles. */
  def prepareCorpusClassified(spark: org.apache.spark.sql.SparkSession,
      modelDir: String, docs: DataFrame, lang: String = "en",
      minQuality: Double = 0.8, minJaccard: Double = 0.8): DataFrame = {
    val keep = Classify.nbServe(spark, modelDir, docs)
      .filter(col("pred_label") === lang)
      .select("doc_id")
    val gated = TextAnalysis.withQuality(docs)
      .filter(col("quality_score") >= minQuality)
      .select(docs.columns.toIndexedSeq.map(col): _*)
      .join(keep, Seq("doc_id"), "left_semi")
    val deduped = Dedup.dedupCorpus(gated, minJaccard = minJaccard)
    TextAnalysis.withTokenCounts(deduped)
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
  }

  /** Concat-and-chunk sequence packing (the GPT-style pre-training layout):
    * documents are laid head-to-tail in deterministic (groupCol, doc_id)
    * order and cut every `budget` tokens; a doc belongs to the sequence
    * containing its first token. Returns per-sequence stats
    * (group, seq_id, n_docs, seq_tokens).
    *
    * Scale shape: ONE window cumsum partitioned by `groupCol` — packing
    * parallelizes across groups (source shards / languages), which is how
    * production packers run anyway; a single global order would serialize.
    * The cumsum is rank-partitioned within each group by Spark's window
    * sort, and everything downstream is a partial-aggregated groupBy. */
  def packSequences(docs: DataFrame, textCol: String = "text",
      groupCol: String = "source", budget: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTokens = size(filter(split(lower(trim(col(textCol))), "\\s+"), w => w =!= ""))
    val w = Window.partitionBy(groupCol).orderBy("doc_id")
    docs
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // budget is a power of two in practice, so the double division below
      // is exact; floor (not cast) because engines disagree on double->int
      // rounding (Spark truncates, DuckDB rounds)
      .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / budget))
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"))
  }
}
