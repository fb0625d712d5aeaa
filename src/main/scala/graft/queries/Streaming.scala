package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Batch-equivalent views of the streaming operators (the identical
  * transforms run under readStream in StreamingSpec — Structured Streaming
  * incrementalizes the same plan). */
object Streaming {

  /** Tumbling 1h window counts per event_type. */
  val tumbling = QueryDef(
    "q_stream_tumbling_window",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    StreamOps.tumblingCounts(T.events(s, d))
      .orderBy("window_start", "event_type")
  }

  /** Sessionization (30-minute inactivity gap) per user. */
  val sessions = QueryDef(
    "q_stream_sessionize",
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |sess AS (
      |  SELECT user_id,
      |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, count(DISTINCT session_id) AS n_sessions,
      |       max(session_events) AS max_session_events
      |FROM (SELECT user_id, session_id, count(*) AS session_events
      |      FROM sess GROUP BY user_id, session_id) g
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    StreamOps.sessionStats(T.events(s, d))
      .orderBy("user_id")
  }

  /** Native session_window (30-minute gap) per user — the Structured
    * Streaming session operator run on the batch path. Boundary semantics:
    * session_window starts a new session at gap >= 30min (an event at
    * exactly prev + 30min does NOT extend), hence the >= in the oracle's
    * lag/cumsum twin; comparisons run at microsecond precision on both
    * sides (events ts truncates ns -> µs, see T.events / CAST AS
    * TIMESTAMP). */
  val sessionWindow = QueryDef(
    "q_stream_session_window",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |),
      |marked AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 1800 SECOND
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked
      |)
      |SELECT user_id, min(ts) AS session_start, count(*) AS session_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    StreamOps.sessionWindowCounts(T.events(s, d))
      .orderBy("user_id", "session_start")
  }

  /** The flatMapGroupsWithState sessionizer on the batch path — same
    * session semantics as session_window (gap >= 30min closes, µs
    * precision), so it shares the same oracle shape. Puts the custom-state
    * API under the hash gate, not just StreamingSpec. */
  val statefulSessions = QueryDef(
    "q_stream_stateful_sessions",
    sessionWindow.oracle.get) { (s, d) =>
    implicit val spark = s
    StreamOps.sessionsWithState(T.events(s, d))
      .toDF()
      .orderBy("user_id", "session_start")
  }

  /** At-least-once feed repaired to exactly-once: a planted duplicate
    * slice (every 7th user's events delivered twice) must vanish under
    * key dedup — per-type stats equal the clean feed's. Streaming twin
    * (dropDuplicatesWithinWatermark) runs in StreamingSpec. */
  val streamDedup = QueryDef(
    "q_stream_dedup",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = T.events(s, d)
    val redelivered = ev.unionByName(ev.filter(col("user_id") % 7 === 0))
    StreamOps.dedupDeliveries(redelivered)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        Fns.dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  /** Stream-stream interval join on the batch path: clicks attributed to
    * same-user views within the previous hour. The readStream twin (both
    * sides watermarked, state evicted past the attribution window) runs in
    * StreamingSpec. */
  val streamJoin = QueryDef(
    "q_stream_join_attrib",
    """WITH v AS (
      |  SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
      |  FROM events WHERE event_type = 'view'
      |), c AS (
      |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT v.user_id, view_id, click_id
      |FROM v JOIN c ON v.user_id = c.user_id
      | AND click_ts >= view_ts AND click_ts < view_ts + INTERVAL 1 HOUR
      |ORDER BY view_id, click_id""".stripMargin) { (s, d) =>
    StreamOps.attributionJoin(T.events(s, d))
      .select("user_id", "view_id", "click_id")
      .orderBy("view_id", "click_id")
  }

  /** Stream-static dim enrichment on the batch path: per-segment event
    * stats via a broadcast customer join — the no-state streaming join
    * (the readStream twin runs in StreamingSpec; stream-static equi joins
    * need no watermark, the static side re-broadcasts per micro-batch). */
  val streamStaticEnrich = QueryDef(
    "q_stream_static_enrich",
    """SELECT COALESCE(c_mktsegment, '<none>') AS segment, event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, event_type
      |ORDER BY segment, event_type""".stripMargin) { (s, d) =>
    graft.streaming.StreamOps
      .enrichedSegmentStats(T.events(s, d), T.customer(s, d))
      .orderBy("segment", "event_type")
  }

  /** Streaming ingest admission on the batch path: the incoming half of
    * the documents table admitted against the existing half by content
    * digest — a stream-static LEFT ANTI join with zero state (the
    * readStream twin and the foreachBatch near-dup chain run in
    * StreamingSpec). */
  val streamAdmitExact = QueryDef(
    "q_stream_admit_exact",
    """SELECT i.doc_id FROM documents i
      |WHERE i.doc_id >= 250 AND NOT EXISTS (
      |  SELECT 1 FROM documents c
      |  WHERE c.doc_id < 250 AND sha256(c.text) = sha256(i.text))
      |ORDER BY i.doc_id""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    StreamOps.admitNewDocs(
        docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250))
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Streaming LM quality gate on the batch path: the incoming half of
    * the documents table scored against a bigram-LM model fit on the
    * existing half's "lmfit"-salted reference slice, kept iff the avg
    * log-prob clears -3.5 (drops the bottom ~quartile at sf0.01). The
    * readStream twin (foreachBatch against the PERSISTED model artifact)
    * runs in StreamingSpec — same model parquet, same scores. */
  val streamLmGate = QueryDef(
    "q_stream_lm_gate",
    TrainPrep.lmOracleSql(
      s"WHERE doc_id < 250 AND ${CorpusQueries.bucketSqlOf("'lmfit:' || CAST(doc_id AS VARCHAR)")} < 50",
      "WHERE doc_id >= 250",
      "HAVING CAST(sum(lp) AS DOUBLE) / count(*) >= -3.5")) { (s, d) =>
    val docs = T.documents(s, d)
    val (big, bo) = graft.ops.TextAnalysis.lmBigramModel(
      docs.filter(col("doc_id") < 250 &&
        graft.ops.Sampling.saltedBucket("lmfit", col("doc_id")) < 50))
    graft.ops.TextAnalysis
      .lmBigramScoreWith(docs.filter(col("doc_id") >= 250), big, bo)
      .filter(col("avg_lp") >= -3.5)
      .orderBy("doc_id")
  }

  /** Streaming DSIR admission gate, batch form: fit the target/raw
    * log-ratio model on the corpus slice (doc_id < 250; target = its
    * lang='en' subset), weight the incoming slice (doc_id >= 250), admit
    * docs whose importance log-weight clears 0 — "keep the crawl that
    * looks like the target corpus". The readStream twin (foreachBatch
    * against the PERSISTED model artifact) runs in StreamingSpec — same
    * model, same admissions. */
  val streamDsirGate = QueryDef(
    "q_stream_dsir_gate",
    TrainPrep.dsirGateOracle) { (s, d) =>
    val docs = T.documents(s, d)
    val model = graft.ops.Dsir.dsirModelSubset(
      docs.filter(col("doc_id") < 250), col("lang") === "en")
    graft.ops.Dsir.dsirWeightsWith(docs.filter(col("doc_id") >= 250), model)
      .filter(col("dsir_logw") >= 0.0)
      .select("doc_id", "n_grams", "dsir_logw")
      .orderBy("doc_id")
  }

  /** Streaming ANN-index maintenance, batch form: build the IVF index
    * on the 80% base slice, then land the 20% remainder as TWO
    * sequential ivfAppend batches (the micro-batch cadence of
    * [[graft.streaming.StreamOps.ivfIngest]], whose readStream twin
    * runs in StreamingSpec), then serve a query batch from the
    * maintained lists. Per-vector nearest-centroid assignment is
    * order-independent and deterministic, so two appends produce the
    * same cumulative lists as one — the oracle is the incremental-IVF
    * SQL unchanged, and serving keeps the partition-pruned probed-lists
    * plan (no corpus-side assignment at query time). */
  val streamIvfIngest = QueryDef(
    "q_stream_ivf_ingest",
    NorthStar.simIvfServedIncremental.oracle.get) { (s, d) =>
    val dir = graft.ops.Models.ensureBuilt(s"ivfstream|$d") { tmp =>
      val emb = T.embeddings(s, d)
      graft.ops.Similarity.ivfBuild(emb.filter(col("vec_id") % 5 =!= 0), tmp)
      val delta = emb.filter(col("vec_id") % 5 === 0)
      graft.ops.Similarity.ivfAppend(s, delta.filter(col("vec_id") % 2 === 0), tmp,
        batchId = 1L)
      graft.ops.Similarity.ivfAppend(s, delta.filter(col("vec_id") % 2 =!= 0), tmp,
        batchId = 2L)
    }
    val queries = T.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.ops.Similarity.ivfServe(s, dir, queries, 3, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  /** Time-decayed trending counts per event type (half-life 7 days,
    * reference = max event time): each event weighs 2^(−age/halfLife),
    * weights round to DECIMAL(18,9) before the exact sum, so the score
    * is order-independent and engine-neutral. */
  val streamTrending = QueryDef(
    "q_stream_trending",
    """WITH tref AS (SELECT max(ts) AS tr FROM events),
      |w AS (
      |  SELECT event_type,
      |         CAST(power(0.5,
      |           CAST(epoch_us(tr) - epoch_us(ts) AS DOUBLE)
      |             / 86400000000.0 / 7.0) AS DECIMAL(18,9)) AS w
      |  FROM events CROSS JOIN tref
      |)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(w) AS DOUBLE) AS decayed_count,
      |       CAST(sum(w) AS DOUBLE) / count(*) AS trend_intensity
      |FROM w GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    StreamOps.trendingCounts(T.events(s, d)).orderBy("event_type")
  }

  val defs: Seq[QueryDef] = Seq(tumbling, sessions, sessionWindow,
    statefulSessions, streamDedup, streamJoin, streamStaticEnrich,
    streamAdmitExact, streamLmGate, streamDsirGate, streamIvfIngest,
    streamTrending)
}
