package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expr.ArrayExprs.{jaccardSorted, minhashSignature}

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Scale design (the 100 TB contract):
  *  - Exact dedup groups by a 256-bit content digest, so the shuffle carries
  *    32 bytes + id per row instead of full document text.
  *  - MinHash/LSH is the classic shingle → signature → banded-bucket-join
  *    pipeline: per-row signature computation is embarrassingly parallel,
  *    and the only shuffle is on (band, bucket_key) — candidate pairs are
  *    generated per-bucket, never all-pairs.
  *  - SimHash probes maxHamming+1 disjoint 16-bit block tables (recall 1
  *    by pigeonhole); the quadratic pair check runs only inside buckets.
  *  - Hashing/signatures/pair-scoring run in custom Catalyst expressions
  *    (graft.expr.ShingleHashes/MinHashSignature/JaccardSorted) — compiled
  *    single-pass loops where the built-in lambda forms pay interpreted
  *    per-element overhead; still plain Columns to Catalyst, never UDFs.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content digest with the
    * survivor id (min) and the number of copies. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Lower-cased whitespace word array. */
  def words(textCol: String): Column = split(lower(trim(col(textCol))), "\\s+")

  /** Word n-gram shingle array (distinct), built with array lambdas —
    * no explode, no UDF. Indexed concat (w[i] is 0-based in Spark SQL)
    * rather than slice+array_join: ~3x cheaper in the interpreted
    * higher-order-function path. */
  def shingleExpr(n: Int): String = {
    val parts = (0 until n).map(k => s"w[i + $k]").mkString(", ")
    // guard: sequence(0, negative) steps backwards in Spark, so short texts
    // must short-circuit to an empty array
    s"CASE WHEN size(w) < $n THEN array() " +
      s"ELSE array_distinct(transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $parts))) END"
  }

  /** docs + `shingles` column of word n-grams. */
  def withShingles(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    docs.withColumn("w", words(textCol))
      .withColumn("shingles", expr(shingleExpr(n)))
      .drop("w")

  /** (doc_id, hs): distinct shingles hashed to xxhash64 longs, cached.
    * Every dedup pipeline fans out into several branches over this table
    * (signature, document frequency, pair scoring) — materializing it once
    * replaces 3-4 recomputations of the interpreted shingle lambda, and
    * long arrays make the cache, the shuffles, and the set ops
    * (array_intersect/union) several times cheaper than string shingles.
    * Jaccard on 64-bit hashes equals Jaccard on shingles up to negligible
    * collision probability. At 100 TB this is the persisted intermediate
    * table between pipeline stages. */
  private def shingleTable(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .select(col("doc_id"),
        graft.expr.ShingleHashes.shingleHashes(col(textCol), n).as("hs"))
      .filter(size(col("hs")) > 0)
      .cache()
      .transform(Pins.track)

  /** MinHash-LSH candidate pairs: signatures banded into `bands` bands of
    * `rows` slots; docs sharing any band bucket become candidates and are
    * verified with exact shingle-set Jaccard. Returns (doc_a, doc_b,
    * jaccard) with doc_a < doc_b.
    *
    * `maxBucket` is the degenerate-corpus guard for 100 TB runs: a bucket
    * holding B docs emits B² candidate pairs, and a pathological corpus
    * (boilerplate-heavy, near-constant pages) concentrates mass in few
    * buckets. Capping skips buckets larger than `maxBucket` — a documented
    * recall trade (members of a skipped bucket usually co-occur in other,
    * smaller buckets of their 15 remaining bands). Default off: exact
    * reference behavior, and what the dedupCorpus oracle reproduces.
    *
    * `starCap` (r16) is the closure/drop-decision-preserving alternative
    * (the [[graft.ops.Neutral.minHashEdgesSkewSafe]] policy): oversized
    * buckets emit hub-verified STAR candidates (bucket-min rep → member,
    * O(size)) instead of being skipped; every candidate still pays exact
    * Jaccard verification. Only member↔member pairs meeting EXCLUSIVELY
    * inside over-cap buckets are traded for the hub edge. At most one of
    * maxBucket/starCap may be set. */
  def minHashCandidates(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, bands: Int = 16, rows: Int = 4,
      maxBucket: Option[Int] = None,
      starCap: Option[Int] = None): DataFrame = {
    require(bands * rows == 64, "bands*rows must equal the 64-slot signature")
    require(maxBucket.isEmpty || starCap.isEmpty,
      "maxBucket (drop) and starCap (star) are alternative bucket policies")
    import org.apache.spark.sql.expressions.Window
    val sig = shingleTable(docs, textCol, shingleN)
      .withColumn("sig", minhashSignature(col("hs")))
      .select(col("doc_id"), col("hs"), col("sig"))
    // one row per (doc, band): bucket key = hash of the band's slice
    val banded0 = sig.select(
      col("doc_id"), col("hs"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))"))
        .as(Seq("band", "bucket")))
    val banded = maxBucket match {
      case Some(m) =>
        // window over the same (band, bucket) key the join shuffles on —
        // the size count reuses that partitioning, no extra exchange
        banded0
          .withColumn("bsize",
            count(lit(1)).over(Window.partitionBy("band", "bucket")))
          .filter(col("bsize") <= m)
          .drop("bsize")
      case None => banded0
    }
    val cand = starCap match {
      case Some(cap) =>
        // candidates travel as narrow (doc_a, doc_b) here and the shingle
        // arrays re-attach afterwards: star dedup must not carry `hs`
        // through the union/distinct
        val w = Window.partitionBy("band", "bucket")
        val sized = banded0
          .withColumn("bsize", count(lit(1)).over(w))
          .withColumn("rep", min(col("doc_id")).over(w))
        val small = sized.filter(col("bsize") <= cap)
          .select("band", "bucket", "doc_id")
        val pairsSmall = small.select(col("band"), col("bucket"),
            col("doc_id").as("doc_a"))
          .join(small.select(col("band"), col("bucket"),
            col("doc_id").as("doc_b")), Seq("band", "bucket"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b")
        val star = sized.filter(col("bsize") > cap &&
            col("doc_id") =!= col("rep"))
          .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
        pairsSmall.unionByName(star).distinct()
          .join(sig.select(col("doc_id").as("doc_a"), col("hs").as("sh_a")),
            Seq("doc_a"))
          .join(sig.select(col("doc_id").as("doc_b"), col("hs").as("sh_b")),
            Seq("doc_b"))
      case None =>
        val a = banded.select(col("band"), col("bucket"),
          col("doc_id").as("doc_a"), col("hs").as("sh_a"))
        val b = banded.select(col("band"), col("bucket"),
          col("doc_id").as("doc_b"), col("hs").as("sh_b"))
        a.join(b, Seq("band", "bucket"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sh_a", "sh_b")
          .distinct()
    }
    cand
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash: per-word xxhash64, signed bit-vote per bit position,
    * assembled into one long. Explode → 64 conditional sums → bit OR fold. */
  def simHash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val hashed = docs
      .select(col("doc_id"), explode(words(textCol)).as("word"))
      .filter(col("word") =!= "")
      .select(col("doc_id"), xxhash64(col("word")).as("h"))
    val votes = (0 until 64).map { j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sim = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup candidate count per doc, with multi-table probing:
    * the 64-bit signature splits into `maxHamming + 1` disjoint bit blocks,
    * each block is a bucket table, and candidates collide in ANY table. By
    * pigeonhole, <= maxHamming differing bits cannot touch all
    * maxHamming + 1 blocks, so every true pair shares at least one bucket —
    * recall is exactly 1 (single-prefix bucketing silently missed pairs
    * differing in a prefix bit). The quadratic check still runs only inside
    * buckets; pairs are deduped before counting (a near pair collides in
    * several tables). */
  def simHashNearDups(docs: DataFrame, textCol: String = "text",
      maxHamming: Int = 3): DataFrame =
    simHashNearDupsFromSig(simHash(docs, textCol), maxHamming)

  /** Multi-table near-dup counts over precomputed (doc_id, simhash)
    * signatures — split out so tests can plant exact signatures. */
  def simHashNearDupsFromSig(sh: DataFrame, maxHamming: Int = 3): DataFrame = {
    val tables = maxHamming + 1
    val width = 64 / tables
    // width = 64 (maxHamming = 0, exact-match table): 1L << 64 wraps to 1
    // in JVM shift semantics, so the all-bits mask needs its own arm
    val mask = if (width >= 64) -1L else (1L << width) - 1
    val buckets = (0 until tables).map(t =>
      expr(s"(simhash >> ${t * width}) & $mask"))
    val bucketed = sh.select(col("doc_id"), col("simhash"),
      posexplode(array(buckets: _*)).as(Seq("t", "bucket")))
    val a = bucketed.select(col("t"), col("bucket"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = bucketed.select(col("t"), col("bucket"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    val pairs = a.join(b, Seq("t", "bucket"))
      .filter(col("doc_a") < col("doc_b") &&
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= maxHamming)
      .select("doc_a", "doc_b")
      .distinct()
    sh.select(col("doc_id"), col("simhash"))
      .join(
        pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_near")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_near"))
  }

  /** Shared core of the n-gram pipeline (PPJoin-style rarest-prefix
    * blocking): candidates must share one of each doc's `prefixK`
    * globally-RAREST shingles — rare shingles have small inverted lists,
    * so the candidate pair space scales with near-dup density, not
    * quadratically with corpus size. Pairs are deduped on narrow (id, id)
    * keys before shingle arrays are re-attached for exact scoring.
    * Returns DIRECTED (doc_a, doc_b, jaccard), both orientations. */
  private def ngramScoredPairs(docs: DataFrame, textCol: String,
      shingleN: Int, prefixK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingleTable(docs, textCol, shingleN)
    // rarest-prefix selection works on STRING shingles ordered by
    // (df, shingle) — a deterministic, engine-neutral order (hash-value
    // tie-breaks can't be reproduced by a SQL oracle), so the candidate set
    // is exactly reproducible in DuckDB; exact pair scoring still runs on
    // the hashed arrays (merge-walk kernel), where the volume is. At 100 TB
    // the exploded string shingles would be dictionary-encoded first; the
    // shuffle key order (df, shingle) is the same either way. Compiled
    // kernel (ShingleStrings): this subtree is planned on four branches
    // (dfreq + both candidate sides + prefix), and the interpreted lambda
    // form re-paid ~2ms/doc on each.
    val exploded = docs.select(col("doc_id"),
      explode(graft.expr.ShingleStrings.shingleStrings(col(textCol), shingleN)).as("g"))
    val dfreq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    val wRare = Window.partitionBy("doc_id").orderBy(col("df").asc, col("g").asc)
    val prefix = exploded.join(dfreq, "g")
      .withColumn("rn", row_number().over(wRare))
      .filter(col("rn") <= prefixK)
      .select("doc_id", "g")
    val cand = prefix.select(col("doc_id").as("doc_a"), col("g"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact n-gram Jaccard best-match per doc over the rarest-prefix
    * candidate set. Docs with no candidate get a null best match. */
  def ngramJaccardBestMatch(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, prefixK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBest = Window.partitionBy("doc_a")
      .orderBy(col("jaccard").desc, col("doc_b").asc)
    val best = ngramScoredPairs(docs, textCol, shingleN, prefixK)
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("best_match_id"),
        col("jaccard").as("best_jaccard"))
    docs.select("doc_id").join(best, Seq("doc_id"), "left")
  }

  /** UNDIRECTED near-dup pairs (doc_a < doc_b) at `minJaccard` from the
    * rarest-prefix candidate set — the deterministic, oracle-reproducible
    * edge list for cluster-level dedup. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, prefixK: Int = 5, minJaccard: Double = 0.8): DataFrame =
    ngramScoredPairs(docs, textCol, shingleN, prefixK)
      .filter(col("doc_a") < col("doc_b") && col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b")

  /** Connected components over an undirected (doc_a, doc_b) edge list by
    * min-label propagation: every node repeatedly adopts the smallest
    * component id among itself and its neighbors until fixpoint — the
    * cluster identification step that turns pairwise near-dup hits into
    * dedup groups (pair-level dropping over-drops on transitive chains
    * A~B~C where A!~C). Each iteration is one join + partial-aggregated
    * min shuffle, plus a pointer jump (component -> that node's own
    * component) that halves remaining path lengths — O(log diameter)
    * rounds. The driver loop carries only a 1-row label-sum convergence
    * check, never data. Returns (doc_id, component) for every node that
    * appears in `pairs`. The result is left as one materialized local
    * checkpoint (constant-size plan for downstream consumers); the
    * per-query clearState in Bench/Verify releases it.
    *
    * Errors (rather than silently returning intermediate labels) if the
    * graph has not converged within `maxIter` hops — near-dup clusters are
    * shallow, so hitting 100 hops means the input is not the expected
    * near-dup graph and partial labels would diverge from the exact
    * closure. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 100): DataFrame = {
    // localCheckpoint, not cache: the pair list usually arrives with a BIG
    // logical plan behind it (a full minhash/ngram candidate pipeline), and
    // a cache only saves EXECUTION — every loop iteration's plan would
    // still embed and re-analyze the giant lineage driver-side, which
    // measured as ~1s per action at sf0.1 (~15s per components call).
    // Checkpointing truncates the logical plan to the materialized rows,
    // so the iteration plans stay a few nodes deep. The checkpoint RDD is
    // released by the per-query clearState in Bench/Verify.
    val sc = pairs.sparkSession.sparkContext
    val rddsBefore = sc.getPersistentRDDs.keySet
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val checkpointIds = sc.getPersistentRDDs.keySet -- rddsBefore
    // Labels are localCheckpoint'ed per iteration, NOT cached: the
    // pointer-jump below references the step result on BOTH sides of a
    // self-join, so a cached-but-lazy plan TREE doubles per iteration —
    // measured as ~700 exchanges in the returned plan after 6 rounds
    // (execution dedups through the cache, but the driver re-analyzes the
    // exponential tree on every downstream action). Checkpointing resets
    // each round's plan to its materialized rows; superseded checkpoint
    // RDDs are released by id as the loop advances.
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("component", col("doc_id"))
      .cache()
    val initialLabels = labels
    var labelCkptIds: scala.collection.Set[Int] = Set.empty[Int]
    // Convergence via the label-sum invariant: every step takes a least()
    // of the current label, so per-node labels are monotonically
    // non-increasing and the exact sum is strictly decreasing until the
    // fixpoint — equal sums ⟺ no label moved. This replaces a
    // per-iteration join against the previous labels with a one-row
    // aggregate in the same action that materializes the new labels.
    // DECIMAL(38,0), not BIGINT: Spark's non-ANSI sum(LongType) wraps
    // silently on overflow, and a billion-node graph with large doc_ids
    // overflows 2^63 — a wrapped sum could alias across iterations and
    // fake convergence. Decimal sums are exact (and error on 38-digit
    // overflow instead of wrapping).
    def labelSum(df: DataFrame): BigDecimal = {
      val r = df.agg(sum(col("component").cast(DecimalType(38, 0)))).head()
      if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
    }
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nc")).as("nbr_min"))
      // cached: the pointer-jump below reads it on BOTH join sides —
      // uncached it would re-execute the neighbor-min subtree twice per
      // round (released before the round ends)
      val stepped = labels
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .cache()
      // pointer jumping: follow component -> that node's own component
      // (labels are always node ids, so the lookup relation is `stepped`
      // itself). Halves the remaining path length every round on top of
      // the 1-hop neighbor min, so convergence is O(log diameter) rounds
      // instead of O(diameter) — a 15-long near-dup chain converges in 4
      // rounds, and each driver round costs a full job. Same fixpoint:
      // jumping only short-circuits label flow along already-discovered
      // paths, it never crosses a non-edge.
      val before = sc.getPersistentRDDs.keySet
      val next = stepped
        .join(stepped.select(col("doc_id").as("component"), col("component").as("jc")),
          Seq("component"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("jc"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val newIds = sc.getPersistentRDDs.keySet -- before
      val newSum = labelSum(next)
      if (iter == 0) initialLabels.unpersist()
      labelCkptIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      labelCkptIds = newIds
      stepped.unpersist()
      labels = next
      converged = newSum == prevSum
      prevSum = newSum
      iter += 1
    }
    // release the edge checkpoint (df.unpersist cannot reach a checkpoint
    // RDD, so the ids were captured at creation)
    checkpointIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    require(converged,
      s"connectedComponents did not converge within $maxIter iterations — " +
        "component ids would be partial; raise maxIter for deep graphs")
    // the returned labels ride the final checkpoint — register its RDD ids
    // so Pins.releaseAll() can free what DataFrame.unpersist cannot reach.
    // NOTE the checkpoint contract: release only AFTER consuming the result
    // (truncated lineage cannot recompute).
    Pins.trackRdds(sc, labelCkptIds)
    labels
  }

  /** Eval-set decontamination: per corpus doc, the count of distinct word
    * n-gram shingles shared with ANY benchmark doc and the count of
    * benchmark docs touched; `contaminated` when shared shingles >=
    * `minShared`. The join is an inverted-list equi join on the shingle —
    * the contamination-check shape every training pipeline runs before a
    * release (benchmark sets are small: at scale the benchmark side
    * broadcast-joins against the corpus scan). Self-pairs (same doc id on
    * both sides) are excluded so a benchmark drawn from the corpus doesn't
    * flag itself. */
  def contaminationCheck(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", shingleN: Int = 3,
      minShared: Int = 2): DataFrame = {
    def ex(df: DataFrame, idAs: String) = df.select(
      col("doc_id").as(idAs),
      explode(graft.expr.ShingleStrings.shingleStrings(col(textCol), shingleN)).as("g"))
    val shared = ex(docs, "doc_id")
      .join(ex(benchmark, "bench_id"), Seq("g"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id")
      .agg(
        countDistinct(col("g")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
    docs.select("doc_id")
      .join(shared, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shared_shingles", "n_bench_docs"))
      .withColumn("contaminated", col("n_shared_shingles") >= minShared)
  }

  /** End-to-end corpus dedup — the API a training-data pipeline calls:
    * drop exact duplicates (keep min doc_id per digest), then drop the
    * larger id of every MinHash-verified near-dup pair at `minJaccard`.
    * Returns the retained rows of `docs` unchanged.
    *
    * Defaults to the skew-safe star candidates (r16): a dominant
    * duplicate class measured quadratic under full enumeration (r15 sf1
    * sweep), while star edges keep the drop decision on genuine classes —
    * every member is the greater side of its hub edge, so all but the
    * hub still drop — at O(size) bucket cost. The cap never engages at
    * driver-oracle scale (largest fixture bucket ≪ 256), so the oracle's
    * full-enumeration pair set yields bit-identical results there;
    * `starCap = None` restores exact enumeration at any scale. */
  def dedupCorpus(docs: DataFrame, textCol: String = "text",
      minJaccard: Double = 0.8,
      starCap: Option[Int] = Some(256)): DataFrame = {
    val exactKeep = exactGroups(docs, textCol)
      .select(col("keep_doc_id").as("doc_id"))
    // kept feeds both the near-dup candidate search and the final anti
    // join — uncached, the exact-dedup digest groupBy re-executes twice
    val kept = Pins.track(docs.join(exactKeep, Seq("doc_id"), "left_semi").cache())
    val nearDrop = minHashCandidates(kept, textCol, starCap = starCap)
      .filter(col("jaccard") >= minJaccard)
      .select(greatest(col("doc_a"), col("doc_b")).as("doc_id"))
      .distinct()
    kept.join(nearDrop, Seq("doc_id"), "left_anti")
  }

  /** Duplicated-span detection — the exact-substring dedup family of Lee
    * et al., "Deduplicating Training Data Makes Language Models Better"
    * (arXiv:2107.06499), re-expressed for Spark. The reference algorithm
    * builds a corpus-wide suffix array, which is inherently sequential;
    * the distributed equivalent anchors on fixed-width token k-grams: any
    * duplicated substring of >= k tokens is a run of duplicated k-grams,
    * so marking every occurrence whose gram appears >= 2 times corpus-wide
    * (in another doc OR elsewhere in the same doc) and merging the
    * overlapping marks per document recovers every maximal duplicated span
    * (boundaries resolved to k-gram granularity).
    *
    * Scale: the occurrence stream is map-generated; grams travel as full
    * 32-hex-char (128-bit) md5 digests so the duplicate-count groupBy and
    * the join back both shuffle on the same narrow key (colocated, partial
    * aggregation on the count side). 128 bits matter here: at the target
    * scale (~10^12 token positions) a 64-bit key would take ~10^4 birthday
    * collisions, each falsely marking a unique gram "duplicated" and
    * letting [[scrubSpans]] silently delete genuinely unique text; at 128
    * bits the expected collision count is ~10^-15 — the same tolerance the
    * exact suffix-array formulation has in practice. The island merge is a
    * per-document
    * window — one shuffle on doc_id, then partition-local. No all-pairs
    * stage exists at any point, so the plan survives a 100x scale-up;
    * candidate volume is proportional to actual duplication.
    *
    * Returns one row per maximal span: (doc_id, span_start, span_end,
    * span_tokens), positions 0-based token indexes, end inclusive. */
  def duplicatedSpans(docs: DataFrame, textCol: String = "text",
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span gram width k must be >= 2, got $k")
    val toks = docs
      .select(col("doc_id"), split(lower(trim(col(textCol))), "\\s+").as("w"))
      .filter(size(col("w")) >= k)
    val occ = toks
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("w")) - k),
          i => md5(array_join(slice(col("w"), i + 1, lit(k)), " ")))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("g"))
    val dup = occ.groupBy("g").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select("g")
    val marked = occ.join(dup, Seq("g")).select("doc_id", "pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevMax = max(col("pos"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    // a new island starts when this gram's span [pos, pos+k-1] neither
    // overlaps nor touches the furthest end seen so far (prevMax + k - 1)
    val isl = marked
      .withColumn("brk", when(col("pos") > prevMax + k, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(byDoc))
    isl.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Rewrite each document with its duplicated spans (duplicatedSpans at
    * the same k) removed. Output text is the surviving token stream joined
    * by single spaces — i.e. whitespace-normalized, lower-cased, exactly
    * the stream the span detector tokenized. Documents whose every token
    * is covered come back as ''. Covered positions are span-exploded then
    * anti-joined — both map-side from the span table's perspective; the
    * rebuild is one per-doc aggregation. */
  def scrubSpans(docs: DataFrame, textCol: String = "text",
      k: Int = 5): DataFrame = {
    val tokens = split(lower(trim(col(textCol))), "\\s+")
    val cov = duplicatedSpans(docs, textCol, k)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val tok = docs
      .select(col("doc_id"), posexplode(tokens))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("word"))
    val kept = tok.join(cov, Seq("doc_id", "pos"), "left_anti")
    val res = kept.groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs
      .select(col("doc_id"), size(tokens).cast("long").as("n_tokens"))
      .join(res, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  // ----------------------- incremental component labels (artifact)
  //
  // Cluster labels were rebuild-only: a daily crawl adding near-dup
  // edges re-ran connectedComponents over the CUMULATIVE edge list. The
  // appendable form is the distributed union-find: persist
  //   $dir/labels — (doc_id, component) rows, appended for NEW nodes
  //                 only (a node's stored label is its component AS OF
  //                 its append);
  //   $dir/merges — (from_rep, to_rep) rows, one per component-merge
  //                 event (to_rep < from_rep, min-label order);
  // and serve by resolving stored labels through the merge map's
  // closure. An append scans ONLY its batch plus one equi join against
  // the labels table (the batch endpoints' current labels — never the
  // edge history), runs CC on the batch's COMPONENT-compressed edge
  // graph (size ∝ batch, not corpus), and appends merge rows + new-node
  // labels. The merge map is bounded by merge events (≤ clusters ever
  // merged), so its closure is a log-depth pointer-jumping loop over a
  // small broadcastable table — the path-compression half of union-find,
  // run at serve time.

  /** Build the label artifact from an initial edge list. Terminal (the
    * artifact is written inside), so the whole body runs under
    * Pins.scoped: the CC label checkpoint is consumed by the save and
    * released on exit — a build leaves zero pins behind. */
  def ccBuild(pairs: DataFrame, dir: String): Unit = Pins.scoped {
    val spark = pairs.sparkSession
    Models.save(connectedComponents(pairs), s"$dir/labels")
    import spark.implicits._
    Models.save(Seq.empty[(Long, Long)].toDF("from_rep", "to_rep"),
      s"$dir/merges")
    Models.logGen(spark, dir, batchId = -1L, fresh = true)
  }

  /** Transitive closure of the merge map by pointer jumping: each round
    * re-targets every edge at its target's target, halving chain depth.
    * The map is FUNCTIONAL by construction (a rep merges away at most
    * once — appends only emit merges FROM currently-terminal reps). */
  private[graft] def closeMerges(merges: DataFrame): DataFrame = {
    // DataFrame.unpersist cannot reach a localCheckpoint's RDD (the repo's
    // checkpoint-release contract, see connectedComponents above), so every
    // checkpoint's RDD ids are captured by diffing the context registry:
    // superseded generations are unpersisted BY ID inside the loop and the
    // final one is Pins.trackRdds'd — under a streaming fold (ccIngest)
    // the per-micro-batch Pins.scoped can then actually free it.
    val sc = merges.sparkSession.sparkContext
    val before0 = sc.getPersistentRDDs.keySet
    var m = merges.localCheckpoint()
    var ckptIds = sc.getPersistentRDDs.keySet -- before0
    var iter = 0
    var open = m.as("x").join(m.as("y"),
      col("x.to_rep") === col("y.from_rep"), "left_semi").count()
    while (open > 0) {
      require(iter < 48, "merge chains deeper than 2^48 — corrupt artifact")
      val before = sc.getPersistentRDDs.keySet
      val next = m.as("x")
        .join(broadcast(m.as("y")),
          col("x.to_rep") === col("y.from_rep"), "left")
        .select(col("x.from_rep"),
          coalesce(col("y.to_rep"), col("x.to_rep")).as("to_rep"))
        .localCheckpoint()
      val newIds = sc.getPersistentRDDs.keySet -- before
      ckptIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      ckptIds = newIds
      m = next
      open = m.as("x").join(m.as("y"),
        col("x.to_rep") === col("y.from_rep"), "left_semi").count()
      iter += 1
    }
    Pins.trackRdds(sc, ckptIds)
    m
  }

  private def resolve(labels: DataFrame, closed: DataFrame): DataFrame =
    labels.join(
        broadcast(closed.withColumnRenamed("from_rep", "component")),
        Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("to_rep"), col("component")).as("component"))

  /** Fold a batch of new edges into the artifact. Scans the batch plus
    * one labels equi join; CC runs over the component-compressed batch
    * graph only. Terminal (both appends land inside), so the body runs
    * under Pins.scoped: the merge-closure and batch-CC checkpoints are
    * released on exit — one append (or one ccIngest micro-batch) accrues
    * nothing in the block manager. */
  def ccAppend(newPairs: DataFrame, dir: String,
      batchId: Long): Unit = Pins.scoped {
    require(batchId >= 0, "appends need an explicit batch/sequence id")
    val spark = newPairs.sparkSession
    val labels = Models.load(spark, s"$dir/labels")
    val closed = closeMerges(Models.load(spark, s"$dir/merges"))
    val resolved = resolve(labels, closed)
    // current representative of each batch endpoint: its resolved stored
    // label, or itself if the node is new to the graph
    def reps(side: String) = newPairs.select(col(side).as("doc_id"))
    // checkpoint ids captured at creation: endpoints.unpersist() cannot
    // reach a checkpoint RDD, so release happens by id at the end
    val sc = spark.sparkContext
    val beforeEp = sc.getPersistentRDDs.keySet
    val endpoints = reps("doc_a").unionByName(reps("doc_b")).distinct()
      .join(resolved, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("rep"))
      .localCheckpoint() // feeds two joins + the new-node anti join
    val endpointIds = sc.getPersistentRDDs.keySet -- beforeEp
    val e = newPairs
      .join(endpoints.select(col("doc_id").as("doc_a"),
        col("rep").as("rep_a")), Seq("doc_a"))
      .join(endpoints.select(col("doc_id").as("doc_b"),
        col("rep").as("rep_b")), Seq("doc_b"))
      .filter(col("rep_a") =!= col("rep_b"))
      .select(least(col("rep_a"), col("rep_b")).as("doc_a"),
        greatest(col("rep_a"), col("rep_b")).as("doc_b"))
      .distinct()
    val cc =
      if (e.head(1).isEmpty) e.select(col("doc_a").as("doc_id"),
        col("doc_b").as("component")) // empty, schema-compatible
      else connectedComponents(e)
    // merge events: old TERMINAL reps (some stored label resolves to
    // them) whose component moved; brand-new nodes' labels are written
    // already-resolved below, so they need no merge row
    val newMerges = cc.filter(col("doc_id") =!= col("component"))
      .join(resolved.select(col("component").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("from_rep"), col("component").as("to_rep"))
    Models.append(newMerges, s"$dir/merges")
    val newNodeLabels = endpoints
      .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(cc.select(col("doc_id").as("rep"),
        col("component").as("__c")), Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("__c"), col("rep")).as("component"))
    Models.append(newNodeLabels, s"$dir/labels")
    Models.logGen(spark, dir, batchId)
    endpointIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Current labels: stored rows resolved through the merge closure.
    * Reads the labels table + the bounded merge map — never the edges. */
  def ccServe(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    resolve(Models.load(spark, s"$dir/labels"),
      closeMerges(Models.load(spark, s"$dir/merges")))

  /** Compact the union-find artifact — the path-compression pass run as
    * maintenance instead of at every serve: rewrite `labels` as the
    * RESOLVED table (every stored label pushed through the merge
    * closure, via generation swap — the labels table is read while its
    * replacement is written) and reset `merges` to empty. Serving after
    * compaction resolves through an empty closure — identity — so
    * serve-after-compact ≡ serve-before; appends after compaction see
    * the same current representatives (a resolved label IS its rep).
    * Without this, a year of daily appends leaves every serve paying the
    * closure's pointer-jumping loop over the full merge history; after
    * compaction the merge map restarts from the append deltas only. */
  def ccCompact(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = Pins.scoped {
    val resolved = resolve(Models.load(spark, s"$dir/labels"),
      closeMerges(Models.load(spark, s"$dir/merges")))
    val tmp = s"$dir/labels__compacting"
    Models.save(resolved, tmp)
    Models.swapIn(spark, tmp, s"$dir/labels")
    import spark.implicits._
    Models.save(Seq.empty[(Long, Long)].toDF("from_rep", "to_rep"),
      s"$dir/merges")
    Models.resetGens(spark, dir)
  }
}
