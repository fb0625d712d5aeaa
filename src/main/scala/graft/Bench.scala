package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Headline benchmark set: one representative per operator family
    * (scan/agg/join/window/set/sort + the north-star dedup, ANN, text, and
    * streaming-shaped ops, plus the skew-salting demonstration pair). The
    * full registry still runs under the correctness gate (Verify); set
    * SPARK_GRAFT_BENCH_ALL=1 to time all of it here too. */
  val headline: Seq[String] = Seq(
    "q_s1_scan_prune",
    "q_a1_agg_pricing",
    "q_a6_count_distinct",
    "q_j2_join_agg_datediff",
    "q_j5_theta_join",
    "q_j7_asof_join",
    "q_w2_top1_per_group",
    "q_w7_gaps_islands",
    "q_u1_unpivot_union",
    "q_o1_multisort_topk",
    "q_ns_dedup_exact",
    "q_ns_dedup_minhash",
    "q_ns_dedup_cosine",
    "q_ns_dedup_corpus",
    "q_ns_sim_brute_topk",
    "q_ns_sim_ivf_topk",
    "q_ns_text_quality",
    "q_stream_tumbling_window",
    "q_scale_skew_plain",
    "q_scale_salted_join",
    // round-3 families: retrieval, graph, stream-stream join, lifecycle
    "q_ret_bm25_topk",
    "q_graph_pagerank",
    "q_stream_join_attrib",
    "q_e_scd2",
    // round-5 families: iterative clustering + semantic dedup, quantization
    "q_ns_semdedup",
    "q_ns_embed_quantize",
    // round-6: cluster-aware corpus dedup (md5-minhash pairs -> connected
    // components -> one survivor per component), product-quantized ANN,
    // ingest-time incremental dedup
    "q_ns_dedup_corpus_clustered",
    "q_ns_pq_topk",
    "q_ns_dedup_incremental",
    // round-7: chained ingest (admission + within-batch dedup), IVF-PQ,
    // duplicated-span detection (the heaviest new shuffle: one gram per
    // token position), token-budget selection
    "q_ns_dedup_ingest_e2e",
    "q_ns_ivfpq_topk",
    "q_ns_span_dedup",
    "q_ns_budget_select",
    "q_ns_winnow_pairs",
    // round-8: the fit/apply split — IVF-PQ served from a persisted index
    // (first rep builds the artifact, warm reps serve with zero fitting;
    // the warm median is the serving cost the fit/apply split buys) —
    // and the bigram-LM quality filter (fit on the salted reference half
    // + backoff-scored whole corpus: the heaviest new text chain)
    "q_ns_ivfpq_served",
    "q_ns_lm_bigram",
    // round-9: admission dedup served from the persisted corpus index —
    // the refitting twin q_ns_dedup_incremental stays listed above, so
    // the artifact carries the fit/serve delta for the ingest lifecycle.
    // The admit_daily pair is the corpus>>batch shape where the index
    // pays: refit re-hashes the large corpus, served hashes the batch.
    "q_ns_dedup_incremental_served",
    "q_ns_dedup_ingest_e2e_served",
    "q_ns_dedup_admit_daily",
    "q_ns_dedup_admit_daily_served",
    // round-9 (cont.): DSIR data selection served from the persisted
    // log-ratio artifact (first rep builds, warm reps serve — the
    // ivfpq_served pattern), and the two new media near-dup paths
    // (decode + fingerprint + banded/inverted candidate join)
    "q_ns_dsir_served",
    "q_ns_multimodal_audio_dedup",
    "q_ns_multimodal_video_dedup",
    // round-10: the retrieval lifecycle pair (scan-form phrase search vs
    // the served positional index), the explicit bloom-pruned join vs its
    // plain twin (the measured 90% shuffle cut), URL-frontier dedup (the
    // cheapest dedup stage, all codegen'd string work), and the CDC
    // chunker (map-only array fan-out)
    "q_ret_phrase_topk",
    "q_ret_phrase_served",
    "q_scale_bloom_join_prune",
    "q_ns_url_dedup",
    "q_ns_chunk_cdc",
    // round-10 (session d): the frequency/set-operation sketches (CMS
    // point estimates over the planted-skew feed; KMV signature-only
    // pairwise overlap), the maintained join view (build + one append +
    // aggregate serve inside the gated query), and M4 downsampling (one
    // bounded groupBy with struct-min/max argfirst/arglast)
    "q_sk_cms_topk",
    "q_sk_kmv_overlap",
    "q_e_join_maintain",
    "q_ts_m4_downsample",
    // round-10 (session e): the two-pass prefix-aggregation consumers
    // (sweep-line concurrency; skyline — the O(n log n) replacement for
    // the oracle's quadratic NOT EXISTS), the bucketed big-big interval
    // join, the bottom-k sample-quantile sketch (scan-form build), the
    // blocked entity-resolution pipeline with connected-components
    // clustering, and the point-in-time SCD2 enrichment join
    "q_ts_concurrency_sweep",
    "q_o3_pareto_skyline",
    "q_j11_interval_bucket_join",
    "q_sk_sample_quantiles",
    "q_er_golden_record",
    "q_e_scd2_pit",
    // round-11: the dominance-grid 3-D skyline (prefix-max doesn't
    // generalize past 2 dims), the fused per-field golden record (shares
    // the persisted ER cluster labels with q_er_golden_record — warm reps
    // measure the survivorship aggregate, not the clustering), the
    // posting append→compact lifecycle served end-to-end, and the
    // corpus-wide IVF-routed kNN graph (the query set IS the corpus —
    // shuffled label probe, map-side route pruning)
    "q_o5_skyline_3d",
    "q_er_field_merge",
    "q_ret_phrase_served_compacted",
    "q_ns_sim_knn_graph",
    // round-12: the retrain lifecycle (first rep builds+appends+retrains,
    // warm reps serve — the ivfpq_served pattern) and the full PII scrub
    // chain (map-only regex stack, the heaviest codegen'd string work)
    "q_ns_sim_ivf_retrained",
    "q_ns_text_scrub_pii",
    // round-13: the drift-triggered retrain policy (first rep builds the
    // two policy artifacts — drifted fires, control doesn't — warm reps
    // measure the occupancy-stats serve)
    "q_ns_sim_ivf_drift_policy",
    // round-14: the θ-sweep operating-point table (declarative prefix
    // occupancy — no artifact), the chroma-plane pixel gate (full-frame
    // VP8 YUV decode ×20), and the baseline-JPEG pixel gate
    "q_ns_sim_ivf_drift_theta_sweep",
    "q_ns_multimodal_chroma_plane",
    "q_ns_multimodal_jpeg_luma")

  /** Contention sentinel: a fixed single-threaded CPU workload (one-
    * partition range sum — no IO, no shuffle, size-independent of sf)
    * timed BEFORE EVERY QUERY plus once at sweep end. On an idle
    * container each probe lands inside [[CalEnvelopeSec]]; under external
    * CPU contention it inflates with everything else. A probe >2x the
    * envelope marks the queries it brackets `contended` (per-query span
    * flags in the artifact) and the whole artifact when any probe fires —
    * the r7/r8 lesson: start/end-only probes passed a run whose pagerank
    * median was 2.1x its steady value because the contamination happened
    * mid-sweep, invisible to the boundary probes. ~0.2 s x n queries of
    * probe cost buys a per-query trust label. A flagged query says
    * "re-run before judging its delta" in the data itself. */
  val CalEnvelopeSec = 0.20 // committed idle-container envelope (measured
                            // 0.14-0.21 s across runs on this machine;
                            // the 2x contended threshold is 0.40 s)

  /** PARALLEL envelope: the same per-partition workload fanned across
    * every core. The serial probe has a blind spot (the r9 bm25 lesson):
    * a background load stealing 30 of 32 cores barely moves a
    * 1-partition probe but halves every 32-way query — exactly the
    * parallel-efficiency drift the committed r9 sweep showed (bm25_topk
    * 1.38 s in-sweep vs 1.17 s standalone at a CLEAN serial probe).
    * Idle, the fan-out finishes in about the serial time plus scheduling
    * overhead; measured 0.25-0.35 s at cpus=32 on this machine, so the
    * envelope is 0.45 and the 2x contended threshold 0.90 s. */
  val CalParEnvelopeSec = 0.45

  def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 30000000L, 1L, 1)
      .selectExpr("sum(id * 31 + (id % 7))").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** [[calibrate]]'s n-way twin: one 30M-row partition PER CORE (id
    * folded mod 30M so the sum stays inside Long under ANSI overflow
    * checking). Wall time = per-partition work / achieved parallelism,
    * so it inflates under exactly the contention the serial probe
    * cannot see. */
  def calibratePar(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 30000000L * cpus, 1L, cpus)
      .selectExpr("sum((id % 30000000) * 31 + (id % 7))").collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // partitions default to cores; the scale sweep overrides them upward
    // so per-task working sets stay memory-sized as sf grows (the r15 sf1
    // sweep OOM'd shuffle tasks at 32 partitions / 8g heap — partition
    // count, like executor count, is a function of DATA, not cores)
    // parsed to Int up front: the value is interpolated into the bench
    // JSON artifact, so a non-numeric env var must fail HERE with a
    // clear message, not downstream as malformed JSON (r15 ADVICE)
    val shufParts: Int =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus).toIntOption
        .getOrElse(sys.error(
          "SPARK_GRAFT_SHUFFLE_PARTITIONS/SPARK_GRAFT_CPUS must be an integer, got " +
            s"'${sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)}'"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.ui.enabled", "false")
      // parity with Verify/tests: the NTZ→TIMESTAMP cast in T.events is
      // only value-preserving under UTC, so bench must pin it too
      .config("spark.sql.session.timeZone", "UTC")
      // experiment knob for the skew pair: AQE's runtime skew split vs
      // explicit salting (SCALING.md records both)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // plan fingerprints must not depend on WHERE a FileScan's metadata
      // string truncates: expression ids grow over the sweep JVM's
      // lifetime, so the default 100-char cut lands mid-filter at a
      // rep-dependent spot and fakes a plan flip (measured r12)
      .config("spark.sql.maxMetadataStringLength", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-footer warmup so per-query timings measure the
    // query, not first-touch JIT and classloading
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    calibrate(spark) // warm the calibration path itself (JIT) before timing
    calibratePar(spark, cpus.toInt)
    val all = SparkEntry.queries
    val names =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY"))
        // dev knob: comma-separated names — family-level A/Bs in a fresh
        // JVM (the q_j* drift bisection shape) without sweeping everything
        sys.env("SPARK_GRAFT_BENCH_ONLY").split(",").toSeq
          .map(_.trim).filter(all.contains)
      else if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) all.keys.toSeq.sorted
      else headline.filter(all.contains)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // flaky-watch list: r6 showed these two with cross-rep spread from JVM
    // noise (a 2.2x GC/contention outlier rep for pageRank, ~25% for scd2)
    // even though every rep starts from cleared state. Extra reps tighten
    // the steady estimate and queries_reps makes the envelope auditable;
    // SCALING.md records the measured variance.
    val extraReps = Map("q_graph_pagerank" -> 5, "q_e_scd2" -> 5,
      "q_ns_dedup_ingest_e2e" -> 5)
    var errors = List.empty[String]
    // first failure message per query (r17): a -1.0 wall with no cause
    // in the artifact forces a manual re-run to diagnose; the root
    // exception class+message is cheap to carry
    val errorDetail = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Per-RUN isolation: several operators intentionally return a cached
    // result (pageRank, kmeans/semDedup) or keep an internal intermediate
    // cached (dedup's shingle table, bm25's postings). In a single-JVM bench
    // those accumulate across queries — memory/GC pressure that round 5
    // showed inflating UNRELATED later queries 2-7x — and between reps of
    // the SAME query a surviving cache would let the CacheManager serve
    // rep 2 from rep 1's data, faking the steady-state number. Clearing
    // both the SQL cache and any persistent RDDs before every run keeps
    // each timing an honest end-to-end execution.
    def clearState(): Unit = {
      ops.Pins.releaseAll() // also empties the op-level ledger
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // physical evidence per rep (plan fingerprint + stage metrics) — the
    // r11 ask: a cross-round timing flip must be attributable from the
    // artifact alone (plan flip vs work change vs GC/JVM aging).
    // SPARK_GRAFT_PROBE=0 runs the CONTROL: same sweep, no listeners, so
    // an on/off A/B at matched cal_start_sec MEASURES the instrument's
    // own overhead instead of attributing it by elimination (r12 ask)
    val probeEnabled = sys.env.getOrElse("SPARK_GRAFT_PROBE", "1") != "0"
    val probe = new BenchProbe(spark, probeEnabled)
    def runOnce(name: String): (Double, BenchProbe.Snap) = {
      clearState()
      probe.reset()
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() lets the optimizer ELIMINATE a
      // cardinality-preserving left join (right side provably unique on
      // the key) plus the output sort — for the "per-row annotation"
      // query shape (docs LEFT JOIN counts) that pruned the entire
      // operator under test and timed a bare table count. The noop
      // write consumes every row and column, so the timed plan is the
      // plan the driver's parquet dump actually executes.
      try {
        all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, probe.snapshot())
      }
      catch { case e: Throwable =>
        var root = e
        while (root.getCause != null && root.getCause != root) root = root.getCause
        errorDetail.getOrElseUpdate(name,
          s"${root.getClass.getSimpleName}: ${String.valueOf(root.getMessage).take(300)}")
        (-1.0, probe.snapshot())
      }
    }
    // one probe before each query + one after the last: probe i and
    // probe i+1 bracket query i, so a contaminated span is attributable
    // to the specific queries inside it
    val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val probesPar = scala.collection.mutable.ArrayBuffer.empty[Double]
    val results = names.map { name =>
      probes += calibrate(spark)
      probesPar += calibratePar(spark, cpus.toInt)
      val qReps = if (reps == 1) 1 else extraReps.getOrElse(name, reps)
      var runs = (1 to qReps).map(_ => runOnce(name))
      // variance fold-in: when THIS run's warm reps spread >50% of their
      // median, the flakiness is happening here and now — take extra reps
      // (to 5 total) so the median is estimated where the noise occurs,
      // not where it was last seen. (The static extraReps list stays for
      // the known offenders; this catches new ones automatically.)
      if (reps > 1 && runs.forall(_._1 >= 0) && runs.length < 5) {
        val warm = runs.tail.map(_._1)
        val med = warm.sorted.apply(warm.length / 2)
        if (med > 0 && (warm.max - warm.min) / med > 0.5)
          runs = runs ++ (runs.length until 5).map(_ => runOnce(name))
      }
      val times = runs.map(_._1)
      if (times.exists(_ < 0)) errors ::= name
      // cold = first run; steady = min over reps. A crashed query is
      // flagged with negative time, never folded into total.
      val steady = if (times.exists(_ < 0)) -1.0 else times.min
      (name, steady, times, runs.map(_._2))
    }
    val qs = results.map(r => s"\"" + r._1 + "\":" + r._2)
      .mkString("{", ",", "}")
    val cold = results.map(r => s"\"" + r._1 + "\":" + r._3.head)
      .mkString("{", ",", "}")
    // every rep's time, so run-to-run spread is auditable from the artifact
    val allReps = results
      .map(r => s"\"" + r._1 + "\":" + r._3.mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    // median over the warm reps (cold excluded when reps > 1): the noise-
    // robust per-query estimate the flaky-watch queries gate on
    def median(ts: Seq[Double]): Double = {
      val warm = (if (ts.length > 1) ts.tail else ts).sorted
      if (warm.exists(_ < 0)) -1.0
      else if (warm.length % 2 == 1) warm(warm.length / 2)
      else (warm(warm.length / 2 - 1) + warm(warm.length / 2)) / 2.0
    }
    val medians = results
      .map(r => s"\"" + r._1 + "\":" + median(r._3))
      .mkString("{", ",", "}")
    // per-rep physical evidence: plan fingerprint + stage metrics per
    // query per rep, in rep order (aligned with queries_reps)
    val probeJson = results
      .map(r => s"\"" + r._1 + "\":" + r._4.map(_.json)
        .mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    // queries whose plans CONFLICTED between reps in this very sweep —
    // the in-artifact "it was an AQE flip" verdict. Rule: two reps
    // conflict iff neither rep's distinct action-plan set contains the
    // other (a missing zero-job event makes one rep's set a SUBSET of
    // another's — delivery flake, not a plan change; a genuine AQE flip
    // — e.g. the measured BuildLeft<->BuildRight build-side swap in the
    // dedup-ingest CC loop — puts a DIFFERENT hash in each set).
    def conflicting(snaps: Seq[BenchProbe.Snap]): Boolean = {
      val sets = snaps.map(_.actions.toSet).distinct
      sets.combinations(2).exists { case Seq(a, b) =>
        !a.subsetOf(b) && !b.subsetOf(a)
      }
    }
    val planFlips = results
      .filter(r => conflicting(r._4))
      .map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    // per-query union of distinct action-plan hashes across reps: the
    // cross-round diffable plan identity (robust to per-rep event loss)
    val planActions = results
      .map(r => s"\"" + r._1 + "\":" +
        r._4.flatMap(_.actions).distinct.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val errJson = errors.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errDetailJson = errorDetail
      .map { case (q, m) =>
        "\"" + q + "\":\"" + m.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", " ") + "\""
      }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    probes += calibrate(spark)
    probesPar += calibratePar(spark, cpus.toInt)
    val calStart = probes.head
    val calEnd = probes.last
    val hot = (p: Double) => p > 2 * CalEnvelopeSec
    val hotPar = (p: Double) => p > 2 * CalParEnvelopeSec
    // query i is suspect if either bracketing probe fired — in EITHER
    // series: the serial probe sees core-speed drift, the parallel one
    // sees parallel-efficiency drift (a 30-of-32-core thief halves every
    // fanned-out query while the 1-partition probe stays clean)
    val contendedQueries = names.zipWithIndex
      .filter { case (_, i) => hot(probes(i)) || hot(probes(i + 1)) }
      .map(_._1)
    val contendedQueriesPar = names.zipWithIndex
      .filter { case (_, i) => hotPar(probesPar(i)) || hotPar(probesPar(i + 1)) }
      .map(_._1)
    val contended = probes.exists(hot) || probesPar.exists(hotPar)
    val calJson = names.zipWithIndex
      .map { case (n, i) => s"\"" + n + "\":" + probes(i) }
      .mkString("{", ",", "}")
    val calParJson = names.zipWithIndex
      .map { case (n, i) => s"\"" + n + "\":" + probesPar(i) }
      .mkString("{", ",", "}")
    val contQJson = contendedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val contQParJson =
      contendedQueriesPar.map("\"" + _ + "\"").mkString("[", ",", "]")
    // cpus is part of the measurement conditions: the r7 vs r8 full-sweep
    // join-family "drift" was uninterpretable partly because the artifacts
    // didn't record what parallelism they ran at
    // the flagging rule, stated IN the artifact so a reader never has to
    // guess whether the envelope or its 2x threshold is the flag line
    // (the r10 bookkeeping nit: a 0.211 s probe sat above the 0.20 s
    // envelope but below the 0.40 s threshold and was correctly unflagged
    // — now the artifact says so itself)
    val rule = "per-probe strict: query i is flagged iff either probe " +
      "bracketing it (before/after) exceeds 2x its series envelope — " +
      "serial > cal_flag_threshold_sec or parallel > " +
      "cal_par_flag_threshold_sec; a probe between the envelope and the " +
      "threshold is within normal host jitter and does NOT flag; the " +
      "artifact-level contended bit fires iff any probe in either " +
      "series exceeds its threshold"
    // scale-sweep comparability (r15 verdict #7): synthetic sf dirs carry
    // a _meta.json (generator version + seed + row counts) written by
    // tools/gen_scale.py; embedding it makes every sweep artifact say
    // exactly which data it measured. Driver-shipped dirs have none → null.
    val genMeta = {
      val p = java.nio.file.Paths.get(sfDir, "_meta.json")
      if (java.nio.file.Files.exists(p)) {
        val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
        // fail FAST on a corrupt/hand-edited _meta.json instead of
        // interpolating garbage into the artifact and breaking every
        // downstream parse (r17 advisor — the same failure mode the
        // partitions env var got in r16). A full JSON parser is overkill
        // for a dev-tool-written file; object shape + balanced quotes is
        // the cheap invariant that catches truncation and stray text.
        require(raw.startsWith("{") && raw.endsWith("}") &&
            raw.count(_ == '"') % 2 == 0,
          s"$p is not a JSON object — regenerate the sf dir with " +
            "tools/gen_scale.py or delete the corrupt _meta.json")
        raw
      } else "null"
    }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","generator":$genMeta,"queries":$qs,"queries_cold":$cold,"queries_reps":$allReps,"queries_median":$medians,"queries_probe":$probeJson,"plan_flips":$planFlips,"plan_actions":$planActions,"reps":$reps,"errors":$errJson,"errors_detail":$errDetailJson,"cal_start_sec":$calStart,"cal_end_sec":$calEnd,"cal_envelope_sec":$CalEnvelopeSec,"cal_flag_threshold_sec":${2 * CalEnvelopeSec},"queries_cal":$calJson,"cal_par_envelope_sec":$CalParEnvelopeSec,"cal_par_flag_threshold_sec":${2 * CalParEnvelopeSec},"queries_cal_par":$calParJson,"contended_rule":"$rule","contended_queries":$contQJson,"contended_queries_par":$contQParJson,"contended":$contended,"probe_enabled":$probeEnabled,"cpus":$cpus,"shuffle_partitions":$shufParts,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a well-known file: the driver's parser must not depend
    // on stdout surviving sbt/log4j decoration.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
