package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus retrieval primitives: TF-IDF term weighting and Okapi BM25
  * scoring — the sparse-retrieval half of a training-data curation stack
  * (the dense half is `Similarity`). Built shuffle-minimal:
  *
  *  - one explode + one partial-aggregated (doc, term) count shuffle builds
  *    the posting statistics; doc length is derived from that relation (far
  *    smaller than the raw token stream);
  *  - document frequency for a BM25 query is computed AFTER filtering the
  *    postings to the query's terms, so the df relation is bounded by the
  *    query vocabulary and broadcast;
  *  - corpus-level scalars (N, avgdl) are a 1-row broadcast.
  *
  * At 100 TB the only O(corpus) shuffles are the (doc, term) count and the
  * per-doc score combine — both partial-aggregated map-side. Nothing is
  * proportional to corpus² and no collect touches the driver.
  *
  * Cross-engine determinism: per-term scores pass through `ln`, whose last
  * ulp differs between the JVM and libm (~1.5e-4 of inputs). Every score is
  * therefore rounded to DECIMAL(18,6) BEFORE any sum or rank — the decimal
  * sum is then exact and order-independent on both engines.
  */
object Retrieval {

  /** (id, word) token stream: whitespace tokenization, lowercased. Same
    * tokenizer as `TextAnalysis`/the corpus-vocab query so stats compose. */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")

  /** Posting stats per (doc, term): tf, df, corpus size and raw tf-idf
    * (tf * ln(N/df)). The df join stays a plain equi join — query-term
    * vocabularies broadcast under AQE, open-vocab corpora shuffle on word. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "word")
      .join(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
  }

  /** Okapi BM25 scores of every document against a bag of query terms.
    * Returns (idCol, score) — score is an exact decimal(18,6) sum of
    * per-term contributions, cast to double. */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // postings feed four consumers (dl, stats, hits->df, score join);
    // uncached, the explode+count lineage re-executes for each
    val tf = Pins.track(tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
      .cache())
    val dl = tf.groupBy(idCol).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    bm25Score(tf, dl, stats, idCol, terms, k1, b)
  }

  /** The query-time half of BM25, shared by [[bm25]] and [[bm25Serve]]:
    * filter the postings to the query vocabulary, broadcast the (bounded)
    * df table and 1-row corpus stats, combine 6dp-rounded per-term
    * contributions per doc. No corpus tokenization happens here. */
  private def bm25Score(tf: DataFrame, dl: DataFrame, stats: DataFrame,
      idCol: String, terms: Seq[String], k1: Double, b: Double): DataFrame = {
    val hits = tf.filter(col("word").isin(terms: _*))
    val dfreq = hits.groupBy("word").agg(count(lit(1)).as("df"))
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    hits
      .join(dl, idCol)
      .join(broadcast(dfreq), "word")
      .join(broadcast(stats))
      .withColumn("c", contrib.cast(DecimalType(18, 6)))
      .groupBy(idCol)
      .agg(sum(col("c")).cast("double").as("score"))
  }

  /** Build and persist the sparse index ONCE (`ops.Models` fit/apply
    * split): `postings` (id, word, tf), `doclen` (id, dl), `stats`
    * (1 row: n_docs, avgdl) as parquet under `dir`. The corpus is
    * tokenized exactly once here; serving never touches the raw text —
    * the inverted-index lifecycle every search system runs, and the
    * incremental-ingest shape (re-build appends postings for new docs;
    * stats recompute from doclen, not from text). */
  def bm25Build(df: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = Pins.scoped {
    val tf = Pins.track(tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
      .cache())
    val dl = Pins.track(
      tf.groupBy(idCol).agg(sum(col("tf")).as("dl")).cache())
    Models.save(tf, s"$dir/postings")
    Models.save(dl, s"$dir/doclen")
    Models.save(
      dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")),
      s"$dir/stats")
  }

  /** Positional phrase search: exact-phrase occurrence counts per doc —
    * the retrieval semantics BM25's bag-of-words cannot express (adjacent
    * word ORDER matters). Scan form: one map-only pass counting the
    * phrase's token-sequence occurrences in each doc's token array, then
    * top-k by (occurrences desc, id) as a TakeOrderedAndProject. At
    * 100 TB this rides the corpus scan like the rest of prep; a served
    * form would intersect positional postings, with the rarest word's
    * list bounding candidates — the same df-shape argument as winnow's
    * maxPostings. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String], k: Int = 20): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two words")
    val l = phrase.size
    val ws = filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= "")
    val target = array(phrase.map(w => lit(w.toLowerCase)): _*)
    df.select(col(idCol), ws.as("__ws"))
      .filter(size(col("__ws")) >= l)
      .select(col(idCol),
        size(filter(sequence(lit(1), size(col("__ws")) - (l - 1)),
          i => slice(col("__ws"), i, lit(l)) === target))
          .cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
      .orderBy(desc("n_occurrences"), asc(idCol))
      .limit(k)
  }

  /** Build the positional-postings index under `dir`: one (word, id,
    * pos) row per token occurrence. Corpus-sized by nature (it IS the
    * corpus, re-keyed by word), but written once and word-filterable at
    * the parquet scan — the point of serving phrase search from it. */
  def phraseIndexBuild(df: DataFrame, dir: String, idCol: String,
      textCol: String): Unit =
    Models.save(
      df.select(col(idCol),
          posexplode(filter(split(lower(trim(col(textCol))), "\\s+"),
            x => x =!= "")).as(Seq("pos", "word"))),
      s"$dir/positions")

  /** Phrase search SERVED from the positional index: each phrase word's
    * postings come from a word-filtered scan of the persisted table
    * (predicate pushdown — the scan skips row groups without the word,
    * no tokenization at query time), adjacency is an equi join on
    * (id, pos offset), and the count/top-k match [[phraseSearch]]
    * exactly (same oracle). The first word's postings bound the join —
    * phrase words are rare-ish by Zipf, so the candidate stream is a
    * tiny fraction of the corpus, which is what the index buys over the
    * scan form. */
  def phraseSearchServed(spark: org.apache.spark.sql.SparkSession,
      dir: String, idCol: String, phrase: Seq[String],
      k: Int = 20): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two words")
    val pos = Models.load(spark, s"$dir/positions")
    val first = pos.filter(col("word") === phrase.head.toLowerCase)
      .select(col(idCol), col("pos"))
    val matches = phrase.toIndexedSeq.zipWithIndex.tail
      .foldLeft(first) { case (acc, (w, off)) =>
        acc.join(
          pos.filter(col("word") === w.toLowerCase)
            .select(col(idCol), (col("pos") - off).as("pos")),
          Seq(idCol, "pos"))
      }
    matches.groupBy(idCol)
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(desc("n_occurrences"), asc(idCol))
      .limit(k)
  }

  /** BM25 from a PERSISTED index ([[bm25Build]]) — reads only the posting
    * tables, no tokenization: the plan starts at the parquet index scan.
    * Deterministic build ⇒ identical scores to [[bm25]]. */
  def bm25Serve(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25Score(
      Models.load(spark, s"$dir/postings"),
      Models.load(spark, s"$dir/doclen"),
      Models.load(spark, s"$dir/stats"),
      idCol, terms, k1, b)
}
