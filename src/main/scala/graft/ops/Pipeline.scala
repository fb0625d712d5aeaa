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
      .select(docs.columns.map(col): _*)
    val deduped = Dedup.dedupCorpus(gated, minJaccard = minJaccard)
    TextAnalysis.withTokenCounts(deduped)
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
  }
}
