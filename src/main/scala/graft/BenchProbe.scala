package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query physical evidence for the bench artifact — the instrument
  * the r8–r11 drift debates were missing: when a query's wall time moves
  * between rounds with unchanged code, the artifact itself must say
  * whether the PLAN changed (AQE/codegen flip), the WORK changed
  * (shuffle bytes / task count), or the JVM changed (GC share), instead
  * of restarting the host-noise-vs-regression argument from timings
  * alone.
  *
  * Two listeners, both reset per rep:
  *  - a [[SparkListener]] summing task-level metrics (task count, job
  *    count, executor run/GC ms, shuffle read/write bytes) — the "work"
  *    axis;
  *  - a [[QueryExecutionListener]] hashing the NORMALIZED executed-plan
  *    string of every action in the rep — the "plan" axis. Plans are
  *    normalized (expression ids, temp paths, codegen stage ids stripped)
  *    so the fingerprint is stable across JVMs and temp dirs and differs
  *    only when the plan SHAPE differs; a rep may run several actions
  *    (artifact builds + the measured serve), so the rep fingerprint is
  *    the hash of the sorted action-hash multiset.
  * JVM GC is read from the GC MXBeans as a per-rep delta (local mode:
  * driver and executors share the JVM, so this is total collector time
  * attributable to the rep's span — the sweep-aging signal), alongside
  * task-attributed GC from the metrics.
  *
  * Listener buses are asynchronous; [[snapshot]] settles by polling until
  * the counters stop moving (bounded wait) rather than reaching into
  * Spark's private waitUntilEmpty.
  *
  * `enabled = false` constructs the instrument's CONTROL: no listeners
  * are registered, [[reset]]/[[snapshot]] are constant-time no-ops
  * returning the sentinel snap (`plan_fp = "off"`), so a sweep run with
  * `SPARK_GRAFT_PROBE=0` differs from an instrumented sweep ONLY by the
  * probe's own cost (listener-callback CPU overlapping the timed
  * queries + the out-of-window settle polls). The on/off A/B is how the
  * probe's overhead is MEASURED rather than argued by elimination — the
  * r12 verdict's standing ask (SCALING.md records the result).
  */
final class BenchProbe(spark: SparkSession, val enabled: Boolean = true) {
  private val tasks = new AtomicInteger(0)
  private val jobs = new AtomicInteger(0)
  private val execRunMs = new AtomicLong(0L)
  private val taskGcMs = new AtomicLong(0L)
  private val shReadBytes = new AtomicLong(0L)
  private val shWriteBytes = new AtomicLong(0L)
  private val shReadRows = new AtomicLong(0L)
  private val shWriteRows = new AtomicLong(0L)
  private val planHashes = new ConcurrentLinkedQueue[String]()
  private var gcMsAtReset = 0L
  private var heapMbAtReset = 0L

  private val taskListener = new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        execRunMs.addAndGet(m.executorRunTime)
        taskGcMs.addAndGet(m.jvmGCTime)
        shReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        // shuffle ROW counts (r15): the scale sweep's primary evidence —
        // candidate-pair and exchange volumes must follow the predicted
        // curve across sf, and rows are comparable across compression
        shReadRows.addAndGet(m.shuffleReadMetrics.recordsRead)
        shWriteRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(): Unit
    }
  }

  private val planListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val raw = qe.executedPlan.toString
      val h = BenchProbe.planHash(raw)
      // debug knob: dump each normalized plan for fingerprint forensics
      sys.env.get("SPARK_GRAFT_PROBE_DUMP").foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir,
            s"plan_${System.nanoTime()}_$h.txt"),
          BenchProbe.normalizePlan(raw)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      planHashes.add(h): Unit
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  if (enabled) {
    spark.sparkContext.addSparkListener(taskListener)
    spark.listenerManager.register(planListener)
  }

  private def jvmGcMs: Long = {
    import scala.jdk.CollectionConverters._
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Poll until the async listener buses stop delivering (bounded):
    * without this, a calibration probe's late-arriving onSuccess event
    * lands AFTER reset() and pollutes the first rep's fingerprint. */
  private def settle(): Unit = {
    // require 3 consecutive unchanged polls: a single stable 30 ms poll
    // missed the final onSuccess event ~once per few hundred reps (the
    // ExecutionListenerBus rides the async listener bus and can lag the
    // returning action by more than one poll under GC)
    var stable = 0
    var prev = (-1, -1, -1)
    var waited = 0
    while (stable < 3 && waited < 1200) {
      val cur = (tasks.get, jobs.get, planHashes.size)
      if (cur == prev) stable += 1 else stable = 0
      prev = cur
      Thread.sleep(30)
      waited += 30
    }
  }

  def reset(): Unit = if (enabled) {
    settle() // drain in-flight events from the PREVIOUS action first
    tasks.set(0); jobs.set(0); execRunMs.set(0L); taskGcMs.set(0L)
    shReadBytes.set(0L); shWriteBytes.set(0L)
    shReadRows.set(0L); shWriteRows.set(0L)
    planHashes.clear()
    gcMsAtReset = jvmGcMs
    val rt = Runtime.getRuntime
    heapMbAtReset = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
  }

  /** Settle the async listener buses (poll until counters stop moving,
    * ≤ ~600 ms), then freeze the rep's counters. Disabled probe: the
    * constant "off" sentinel, zero work. */
  def snapshot(): BenchProbe.Snap = {
    if (!enabled) return BenchProbe.OffSnap
    settle()
    import scala.jdk.CollectionConverters._
    val hs = planHashes.iterator().asScala.toSeq.sorted
    BenchProbe.Snap(
      // "none" = every event for the rep was dropped by the async bus —
      // readable in the artifact, and the empty set is subset-tolerated
      // by the flip rule
      planFp = if (hs.isEmpty) "none"
        else BenchProbe.md5Hex(hs.mkString("|")).take(12),
      actions = hs.distinct,
      nPlans = hs.size,
      tasks = tasks.get,
      jobs = jobs.get,
      execRunMs = execRunMs.get,
      taskGcMs = taskGcMs.get,
      jvmGcMs = jvmGcMs - gcMsAtReset,
      heapMb = heapMbAtReset,
      shReadMb = shReadBytes.get / 1048576.0,
      shWriteMb = shWriteBytes.get / 1048576.0,
      shReadRows = shReadRows.get,
      shWriteRows = shWriteRows.get)
  }
}

object BenchProbe {

  /** One rep's physical evidence (fields documented in [[BenchProbe]]).
    * `actions` is the rep's DISTINCT action-plan hash set — flip
    * detection compares these as sets because the ExecutionListenerBus
    * occasionally drops the onSuccess event of a zero-job secondary
    * action (~1 rep in 10 for the cached-result queries), so multiset
    * fingerprints alone would fake flips. */
  final case class Snap(planFp: String, actions: Seq[String], nPlans: Int,
      tasks: Int, jobs: Int,
      execRunMs: Long, taskGcMs: Long, jvmGcMs: Long, heapMb: Long,
      shReadMb: Double, shWriteMb: Double,
      shReadRows: Long = 0L, shWriteRows: Long = 0L) {
    def json: String =
      s"""{"plan_fp":"$planFp","n_plans":$nPlans,"tasks":$tasks,""" +
        s""""jobs":$jobs,"exec_run_ms":$execRunMs,"task_gc_ms":$taskGcMs,""" +
        s""""jvm_gc_ms":$jvmGcMs,"heap_mb":$heapMb,""" +
        f""""sh_read_mb":$shReadMb%.2f,"sh_write_mb":$shWriteMb%.2f,""" +
        s""""sh_read_rows":$shReadRows,"sh_write_rows":$shWriteRows}"""
  }

  /** The disabled-probe sentinel: `plan_fp = "off"` distinguishes "the
    * instrument was off" from "every event was dropped" (`"none"`), so
    * `diff_bench.py` can label control-sweep rows NO_PROBE_DATA instead
    * of inventing flips against them. */
  val OffSnap: Snap = Snap("off", Seq.empty, 0, 0, 0, 0L, 0L, 0L, 0L, 0.0, 0.0)

  /** Normalize an executed-plan string so its hash is a SHAPE
    * fingerprint: equal across JVMs/temp dirs/attribute-id counters,
    * different iff an operator, join strategy, exchange, or codegen
    * stage boundary changed. Strips: expression/exchange/subquery ids
    * (#123), plan_id tags, codegen stage ids, object addresses, file
    * paths (temp artifact dirs differ per JVM), and bare row-count-ish
    * bracket numbers in scan metadata. */
  def normalizePlan(plan: String): String = plan
    .replaceAll("#\\d+[A-Z]*", "#")
    .replaceAll("plan_id=\\d+", "plan_id=")
    .replaceAll("\\[codegen id : \\d+\\]", "[codegen id :]")
    .replaceAll("\\[stage id : \\d+\\]", "[stage id :]")
    // AQE materializes independent stages in parallel, so QueryStage
    // ORDINALS and whole-stage-codegen span ids (*(N)) vary run-to-run
    // on identical shapes — measured: the only rep-to-rep diff in a
    // 3-rep bm25 sweep was stage 8<->9 numbering swaps
    .replaceAll("QueryStage \\d+", "QueryStage")
    .replaceAll("\\*\\(\\d+\\)", "*")
    // generated lambda-variable names (higher-order array functions)
    // embed a global counter: `lambda x_4#` vs `lambda x_6#` on identical
    // shapes — applied AFTER the #id strip so `x_4#32` → `x_4#` → `x_#`
    .replaceAll("_\\d+#", "_#")
    .replaceAll("@[0-9a-fA-F]{4,}", "@")
    .replaceAll("(file|hdfs|s3a?):[^\\s,\\)\\]]+", "$1:PATH")
    .replaceAll("Location: [^\\n]+", "Location: PATH")
    .replaceAll("isFinalPlan=(true|false)", "isFinalPlan=")

  def planHash(plan: String): String = md5Hex(normalizePlan(plan)).take(12)

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
