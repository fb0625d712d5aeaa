package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.UrlOps

/** URL-curation queries ([[graft.ops.UrlOps]]). The testdata carries no
  * URL column, so each query derives a deterministic URL per document from
  * (doc_id, source) — identically in the Spark code and the DuckDB oracle —
  * with planted canonicalization work: mixed-case scheme/host, default
  * ports, tracking params, trailing slashes, fragments, and genuine
  * canonical collisions (odd doc_ids drop their only query param, so docs
  * sharing `doc_id % 20` collapse to one canonical URL).
  *
  * NOTE: the SQL here is assembled from plain (margin-free) fragments —
  * `stripMargin` would eat the leading pipe of a line-initial `||` concat.
  */
object UrlQueries {

  /** Deterministic synthetic URL, Spark side. Must stay in lockstep with
    * [[urlSynthSql]]. */
  private def urlExpr = {
    val d = col("doc_id")
    concat(
      when(d % 4 === 0, lit("HTTPS://"))
        .when(d % 4 === 2, lit("http://"))
        .otherwise(lit("https://")),
      when(d % 2 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit("."),
      when(d % 4 === 0, lit("Example.COM"))
        .when(d % 4 === 1, lit("sample.co.uk"))
        .when(d % 4 === 2, lit("test.org"))
        .otherwise(lit("demo.ac.uk")),
      when(d % 4 === 0, lit(":443"))
        .when(d % 4 === 2, lit(":80"))
        .otherwise(lit("")),
      lit("/Page/"), (d % 10).cast("string"),
      when(d % 5 === 0, lit("/")).otherwise(lit("")),
      when(d % 2 === 0,
        concat(lit("?utm_source=feed&id="), d.cast("string"),
          lit("&utm_campaign=x")))
        .otherwise(lit("?ref=rss")),
      when(d % 7 === 0, lit("#Section-2")).otherwise(lit("")))
  }

  /** The same synthetic URL as a DuckDB CTE over `documents`. */
  private val urlSynthSql =
    """urls AS (
  SELECT doc_id,
    (CASE doc_id % 4 WHEN 0 THEN 'HTTPS://' WHEN 2 THEN 'http://'
     ELSE 'https://' END) ||
    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
    source || '.' ||
    (CASE doc_id % 4 WHEN 0 THEN 'Example.COM' WHEN 1 THEN 'sample.co.uk'
     WHEN 2 THEN 'test.org' ELSE 'demo.ac.uk' END) ||
    (CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 2 THEN ':80' ELSE '' END) ||
    '/Page/' || CAST(doc_id % 10 AS VARCHAR) ||
    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
    (CASE WHEN doc_id % 2 = 0
     THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
     ELSE '?ref=rss' END) ||
    (CASE WHEN doc_id % 7 = 0 THEN '#Section-2' ELSE '' END) AS url
  FROM documents
)"""

  /** The canonicalization pipeline as DuckDB CTEs over `urls` (the same
    * five steps as [[graft.ops.UrlOps.canonicalizeUrl]]; DuckDB regex
    * replacement uses `\1` backrefs where Java uses `$1`). */
  private val canonSql =
    """c1 AS (
  SELECT doc_id, url,
    lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^([^/]*//[^/]+)', 1)) ||
    regexp_extract(regexp_replace(url, '#.*$', ''), '^[^/]*//[^/]+(.*)$', 1) AS u
  FROM urls
),
c2 AS (
  SELECT doc_id, url,
    regexp_replace(regexp_replace(u, '^(https://[^/:?#]+):443($|[/?#])', '\1\2'),
                   '^(http://[^/:?#]+):80($|[/?#])', '\1\2') AS u
  FROM c1
),
c3 AS (
  SELECT doc_id, url,
    regexp_replace(string_split(u, '?')[1], '/$', '') AS p,
    coalesce(array_to_string(
      list_filter(string_split(coalesce(string_split(u, '?')[2], ''), '&'),
        x -> NOT regexp_matches(x, '^(utm_[a-z0-9_]+|ref|fbclid|gclid)=')
             AND x <> ''),
      '&'), '') AS q
  FROM c2
),
canon AS (
  SELECT doc_id, url,
    p || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url,
    regexp_extract(p, '^[a-z]+://([^/:?#]+)', 1) AS host,
    CAST(len(list_filter(
      string_split(regexp_extract(p, '^[a-z]+://[^/]+(.*)$', 1), '/'),
      x -> x <> '')) AS BIGINT) AS path_depth
  FROM c3
)"""

  /** URL canonicalization: fragment/port/tracking-param/trailing-slash
    * normalization with host + path-depth extraction — per-row string
    * expressions, fully inside WholeStageCodegen, map-only at any scale. */
  val urlCanonicalize = QueryDef(
    "q_ns_url_canonicalize",
    s"""WITH $urlSynthSql,
$canonSql
SELECT doc_id, url, canonical_url, host, path_depth
FROM canon
ORDER BY doc_id""") { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), urlExpr.as("url"))
      .withColumn("canonical_url", UrlOps.canonicalizeUrl(col("url")))
      .withColumn("host", UrlOps.urlHost(col("canonical_url")))
      .withColumn("path_depth", UrlOps.pathDepth(col("canonical_url")))
      .orderBy("doc_id")
  }

  /** Registered-domain rollup (public-suffix-list semantics): the PSL is
    * a ~9k-row table, so both probe joins BROADCAST it — the corpus-side
    * host column never shuffles for the domain derivation; the only
    * shuffle is the final per-domain aggregate. */
  val urlRegdomain = QueryDef(
    "q_ns_url_regdomain",
    s"""WITH $urlSynthSql,
$canonSql,
suff(suffix) AS (VALUES ('com'), ('org'), ('co.uk'), ('ac.uk'), ('uk')),
rd AS (
  SELECT c.doc_id, c.host,
    CASE WHEN s2.suffix IS NOT NULL
           THEN regexp_extract(c.host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)
         WHEN s1.suffix IS NOT NULL
           THEN regexp_extract(c.host, '([^.]+\\.[^.]+)$$', 1)
         ELSE regexp_extract(c.host, '([^.]+\\.[^.]+)$$', 1) END AS registered_domain
  FROM canon c
  LEFT JOIN suff s2 ON regexp_extract(c.host, '([^.]+\\.[^.]+)$$', 1) = s2.suffix
  LEFT JOIN suff s1 ON regexp_extract(c.host, '([^.]+)$$', 1) = s1.suffix
)
SELECT registered_domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM rd
GROUP BY registered_domain
ORDER BY registered_domain""") { (s, d) =>
    import s.implicits._
    val suffixes = Seq("com", "org", "co.uk", "ac.uk", "uk").toDF("suffix")
    val hosts = T.documents(s, d)
      .select(col("doc_id"), urlExpr.as("url"))
      .select(col("doc_id"),
        UrlOps.urlHost(UrlOps.canonicalizeUrl(col("url"))).as("host"))
    UrlOps.withRegisteredDomain(hosts, "host", suffixes)
      .groupBy("registered_domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("host")).as("n_hosts"))
      .orderBy("registered_domain")
  }

  /** Canonical-URL dedup — the crawl frontier's first dedup stage: odd
    * doc_ids lose their only (tracking) query param, so every odd doc
    * in a `doc_id % 20` class collapses to one canonical URL; the
    * keeper is the smallest doc_id (first-seen). One hash aggregate on
    * the canonical string. */
  val urlDedup = QueryDef(
    "q_ns_url_dedup",
    s"""WITH $urlSynthSql,
$canonSql
SELECT canonical_url,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT) AS n_urls
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url""") { (s, d) =>
    UrlOps.urlDedup(
      T.documents(s, d).select(col("doc_id"), urlExpr.as("url")),
      "doc_id", "url")
      .orderBy("canonical_url")
  }

  val defs: Seq[QueryDef] = Seq(urlCanonicalize, urlRegdomain, urlDedup)
}
