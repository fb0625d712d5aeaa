package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation for crawl pipelines: canonicalization, host / registered-
  * domain extraction (public-suffix-list semantics via a broadcast suffix
  * table), and canonical-URL dedup — the first dedup stage any crawler runs,
  * BEFORE content fingerprinting (a URL-level exact dup is free to drop; a
  * MinHash pass on it is wasted work). Everything is built from codegen'd
  * string expressions (regexp_replace / split / filter / array_join), so
  * the whole family stays inside WholeStageCodegen — no UDFs.
  *
  * Reference scope: the reference stores image URLs as opaque text columns
  * (ufc_dbt/models/marts: fighter_image_url) and never parses them; this
  * family is part of the beyond-reference LLM-pipeline surface.
  */
object UrlOps {

  /** Tracking query parameters any canonicalizer strips (the de-facto
    * standard list: UTM campaign tags + click identifiers). */
  val TrackingParamRe = "^(utm_[a-z0-9_]+|ref|fbclid|gclid)="

  /** Canonicalize an absolute http(s) URL, the standard crawl-frontier
    * normalization, in order:
    *  1. drop the fragment (`#...` — never sent to the server);
    *  2. lowercase the scheme://host[:port] prefix (case-insensitive per
    *     RFC 3986) while PRESERVING path/query case (case-sensitive);
    *  3. strip default ports (https:443, http:80);
    *  4. strip a trailing slash from the path;
    *  5. drop tracking query parameters ([[TrackingParamRe]]), keeping
    *     the rest in their original order, and the `?` only if any
    *     parameter survives.
    * Pure per-row string work — map-only, no shuffle, at any scale.
    * Contract: input is an absolute `scheme://host...` URL (a crawl
    * frontier's shape); the URL carries at most one `?` (split limit 2
    * treats later `?` as query content, matching the URL grammar). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/]*//[^/]+)", 1)),
      regexp_extract(noFrag, "^[^/]*//[^/]+(.*)$", 1))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443($|[/?#])", "$1$2"),
      "^(http://[^/:?#]+):80($|[/?#])", "$1$2")
    // try_element_at: a URL without '?' splits to one element, and under
    // ANSI semantics a plain element_at(_, 2) would throw, not null out
    val pathPart = regexp_replace(element_at(split(noPort, "\\?", 2), 1), "/$", "")
    val qRaw = coalesce(try_element_at(split(noPort, "\\?", 2), lit(2)), lit(""))
    val kept = filter(split(qRaw, "&"),
      x => !x.rlike(TrackingParamRe) && x =!= "")
    val q = array_join(kept, "&")
    concat(pathPart, when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Host of a canonicalized URL (post-[[canonicalizeUrl]]: scheme and
    * host are already lowercase, default ports stripped). */
  def urlHost(canonical: Column): Column =
    regexp_extract(canonical, "^[a-z]+://([^/:?#]+)", 1)

  /** Number of non-empty path segments of a canonicalized URL. */
  def pathDepth(canonical: Column): Column =
    size(filter(
      split(regexp_extract(canonical, "^[a-z]+://[^/]+([^?#]*)", 1), "/"),
      s => s =!= "")).cast("long")

  /** Registered domain (public-suffix-list semantics): the longest
    * matching public suffix plus one more label — `www.a.example.com`
    * → `example.com` ("com" is a suffix), `b.sample.co.uk` →
    * `sample.co.uk` ("co.uk" beats "uk"). `suffixes` is a one-column
    * (`suffix`) table — the real PSL is ~9k rows, so BOTH probe joins
    * broadcast it and the corpus never shuffles; hosts whose tail
    * matches no suffix fall back to their last two labels. Suffixes up
    * to two labels are supported (covers the PSL's overwhelming mass;
    * a third probe join extends it the same way). */
  def withRegisteredDomain(df: DataFrame, hostCol: String,
      suffixes: DataFrame): DataFrame = {
    val h = col(hostCol)
    df.withColumn("__last2", regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .withColumn("__last3", regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .join(broadcast(suffixes.select(col("suffix").as("__sfx2"))),
        col("__last2") === col("__sfx2"), "left")
      .join(broadcast(suffixes.select(col("suffix").as("__sfx1"))),
        regexp_extract(h, "([^.]+)$", 1) === col("__sfx1"), "left")
      .withColumn("registered_domain",
        when(col("__sfx2").isNotNull, col("__last3"))
          .when(col("__sfx1").isNotNull, col("__last2"))
          .otherwise(col("__last2")))
      .drop("__last2", "__last3", "__sfx1", "__sfx2")
  }

  /** Canonical-URL dedup: one surviving row id per canonical form (the
    * first-seen = smallest id, the crawler convention) plus the dup
    * count. One hash-partitioned aggregate on the canonical string —
    * the same shuffle shape as exact text dedup, and like it the keys
    * can be pre-hashed to fixed width upstream if URL lengths bite. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"), col(idCol))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_urls"))
}
