package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Retrieval

/** Behavioral tests for sparse retrieval: a hand-built corpus with a known
  * best answer — a doc stuffed with a rare query term must outrank longer
  * docs that mention it once, and TF-IDF must zero out a term that appears
  * in every document.
  */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  lazy val corpus = Seq(
    (0L, "zebra zebra zebra cat"),               // dense in the rare term
    (1L, "zebra cat dog dog dog dog dog dog dog dog dog dog dog dog"),
    (2L, "cat dog bird fish cat dog bird fish"), // no zebra
    (3L, "dog cat"),
    (4L, "bird fish cat dog bird fish bird bird")).toDF("doc_id", "text")

  test("bm25 ranks the term-dense short doc first and excludes non-matching docs") {
    val scored = Retrieval.bm25(corpus, "doc_id", "text", terms = Seq("zebra"))
      .orderBy(desc("score")).collect()
    assert(scored.map(_.getLong(0)).toSeq == Seq(0L, 1L),
      "only docs containing the term, dense-short first")
    assert(scored.head.getDouble(1) > scored.last.getDouble(1))
  }

  test("tfidf gives zero weight to a corpus-wide term and df counts documents") {
    val t = Retrieval.tfidf(corpus, "doc_id", "text")
    val catRows = t.filter(col("word") === "cat").collect()
    assert(catRows.length == 5 && catRows.forall(_.getAs[Double]("tfidf") == 0.0),
      "'cat' appears in all 5 docs -> ln(5/5) = 0")
    assert(t.filter(col("word") === "zebra").head().getAs[Long]("df") == 2L)
  }

  test("phrase search is order-sensitive and counts overlapping positions") {
    val docs = Seq(
      (0L, "cat dog cat dog cat"),   // "cat dog" twice
      (1L, "dog cat dog cat"),       // "cat dog" once (order matters)
      (2L, "cat cat cat"),           // adjacency of the SAME word
      (3L, "cat and dog"),           // words present, not adjacent
      (4L, "dog dog dog")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("cat", "dog")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 1L),
      s"expected order-sensitive adjacency counts, got $got")
    // overlapping occurrences all count: "cat cat cat" has two "cat cat"
    val over = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("cat", "cat")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(over == Map(2L -> 2L), s"overlap counting wrong: $over")
  }

  test("served phrase search equals the scan form on real corpus data") {
    val docs = graft.queries.T.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("phraseidx").toString
    Retrieval.phraseIndexBuild(docs, dir, "doc_id", "text")
    for (phrase <- Seq(Seq("value", "table"), Seq("the", "line"),
        Seq("a", "a"), Seq("scan", "slow", "fast"))) {
      val scan = Retrieval.phraseSearch(docs, "doc_id", "text", phrase, 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val served = Retrieval.phraseSearchServed(spark, dir, "doc_id",
          phrase, 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(scan == served,
        s"phrase $phrase: scan $scan != served $served")
    }
  }

  test("bm25 multi-term sums per-term contributions (superset doc wins)") {
    val scored = Retrieval.bm25(corpus, "doc_id", "text", terms = Seq("bird", "fish"))
      .orderBy(desc("score")).collect()
    // doc 4 has bird x4 + fish x2; doc 2 has bird x2 + fish x2; others none
    assert(scored.map(_.getLong(0)).toSeq == Seq(4L, 2L))
  }

  test("RRF fusion: doc in both lists outranks single-list docs; absent ranks contribute zero") {
    import spark.implicits._
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, "doc_id", k0 = 60, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == Seq(2L, 1L, 3L), s"fusion order wrong: $got")
    assert(got(0)._2 == 1.0 / 62 + 1.0 / 61, "both-lists score wrong")
    assert(got(1)._2 == 1.0 / 61 && got(2)._2 == 1.0 / 62,
      "single-list scores must carry a zero for the missing list")
  }

  test("phrase index append: a served query finds batch-2 docs and matches the cumulative scan") {
    val all = graft.queries.T.documents(spark, "/root/testdata/sf0.001")
    val base = all.filter(col("doc_id") % 5 =!= 0)
    val batch2 = all.filter(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("phraseidx_inc").toString
    Retrieval.phraseIndexBuild(base, dir, "doc_id", "text")
    Retrieval.phraseIndexAppend(batch2, dir, "doc_id", "text", batchId = 1L)
    val phrase = Seq("value", "table")
    val served = Retrieval.phraseSearchServed(spark, dir, "doc_id", phrase, 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val scan = Retrieval.phraseSearch(all, "doc_id", "text", phrase, 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == scan, "served-after-append != cumulative scan")
    // the lifecycle claim with teeth: at least one hit comes from the
    // APPENDED batch (otherwise the test would pass on a stale index)
    assert(served.exists { case (id, _) => id % 5 == 0 },
      s"no batch-2 docs among the hits — appended postings not served: $served")
  }

  test("bm25 append: served scores equal a full rebuild on the cumulative corpus") {
    val all = graft.queries.T.documents(spark, "/root/testdata/sf0.001")
    val inc = java.nio.file.Files.createTempDirectory("bm25_inc").toString
    val full = java.nio.file.Files.createTempDirectory("bm25_full").toString
    Retrieval.bm25Build(all.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", inc)
    Retrieval.bm25Append(all.filter(col("doc_id") % 5 === 0), inc, "doc_id",
      "text", batchId = 1L)
    Retrieval.bm25Build(all, "doc_id", "text", full)
    val terms = Seq("vector", "join", "hash")
    def scores(dir: String) =
      Retrieval.bm25Serve(spark, dir, "doc_id", terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(scores(inc) == scores(full),
      "build+append does not reproduce the cumulative rebuild bit-for-bit")
  }

  test("posting compaction: N append generations fold to one file set, " +
      "results bit-identical, stats partials folded to one exact row") {
    val all = graft.queries.T.documents(spark, "/root/testdata/sf0.001")
    def parquetFiles(path: String): Int =
      new java.io.File(path).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    // phrase index: build + 2 appends, compact, same served answer
    val pdir = java.nio.file.Files.createTempDirectory("phraseidx_cmp").toString
    Retrieval.phraseIndexBuild(all.filter(col("doc_id") % 3 === 0), pdir,
      "doc_id", "text")
    Retrieval.phraseIndexAppend(all.filter(col("doc_id") % 3 === 1), pdir,
      "doc_id", "text", batchId = 1L)
    Retrieval.phraseIndexAppend(all.filter(col("doc_id") % 3 === 2), pdir,
      "doc_id", "text", batchId = 2L)
    val phrase = Seq("value", "table")
    val before = Retrieval.phraseSearchServed(spark, pdir, "doc_id", phrase, 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val filesBefore = parquetFiles(s"$pdir/positions")
    Retrieval.phraseIndexCompact(spark, pdir, "doc_id")
    val filesAfter = parquetFiles(s"$pdir/positions")
    assert(filesAfter < filesBefore,
      s"compaction did not shrink the file count: $filesBefore -> $filesAfter")
    val after = Retrieval.phraseSearchServed(spark, pdir, "doc_id", phrase, 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == before, "compaction changed served phrase results")
    // bm25: same lifecycle; stats collapse to ONE row with the exact fold
    val bdir = java.nio.file.Files.createTempDirectory("bm25_cmp").toString
    Retrieval.bm25Build(all.filter(col("doc_id") % 3 === 0), "doc_id", "text", bdir)
    Retrieval.bm25Append(all.filter(col("doc_id") % 3 === 1), bdir, "doc_id",
      "text", batchId = 1L)
    Retrieval.bm25Append(all.filter(col("doc_id") % 3 === 2), bdir, "doc_id",
      "text", batchId = 2L)
    val terms = Seq("vector", "join", "hash")
    def scores() = Retrieval.bm25Serve(spark, bdir, "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val sBefore = scores()
    assert(spark.read.parquet(s"$bdir/stats").count() == 3L)
    Retrieval.bm25Compact(spark, bdir, "doc_id")
    assert(spark.read.parquet(s"$bdir/stats").count() == 1L,
      "stats partials not folded to one row")
    val statsRow = spark.read.parquet(s"$bdir/stats").head()
    assert(statsRow.getLong(statsRow.fieldIndex("n_docs")) == all.count())
    assert(scores() == sBefore, "compaction changed served bm25 scores")
  }
}
