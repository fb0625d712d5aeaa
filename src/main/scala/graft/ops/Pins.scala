package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Self-contained cache lifecycle for the operators that pin tables by
  * contract (pageRank's result, kmeansFit's final centroids, the MinHash
  * signature tables, pqFit's subspace table, connectedComponents' label
  * checkpoint, ...). Every cache or localCheckpoint an operator creates is
  * registered here; a library consumer calls [[releaseAll]] after consuming
  * results — e.g. once per loop iteration — and accumulates nothing, with
  * no need for the harness-level `clearCache` sweep (which would also
  * clobber the consumer's OWN cached tables).
  *
  * Releasing is always safe: unpersisting a cached DataFrame means
  * recompute-on-next-use, never wrong data. The one exception is a
  * localCheckpoint — its lineage is truncated, so a released checkpoint
  * cannot recompute; release results only AFTER consuming them (the same
  * contract the Bench/Verify per-query clearState enforces).
  *
  * Pins is ONE JVM-wide ledger, so [[releaseAll]] from an async callback
  * (a streaming foreachBatch thread, a parallel query runner) would release
  * pins belonging to OTHER concurrently running operators — forcing silent
  * recompute of their cached tables and, for checkpoint pins, failing their
  * job outright. Callbacks use [[scoped]] instead: it releases exactly the
  * pins the current thread created inside the block, never a concurrent
  * operator's. Driver-side operator code runs on the calling thread, so
  * thread identity is the correct ownership boundary.
  *
  * The ledger self-prunes: tracking a new pin drops entries that are no
  * longer materialized (operators release superseded pins internally as
  * they loop), so the ledger stays proportional to LIVE pins even if a
  * consumer never calls [[releaseAll]].
  */
object Pins {

  private final class DfPin(val df: DataFrame, val thread: Long, val seq: Long)
  private final class RddPin(val sc: SparkContext, val id: Int,
      val thread: Long, val seq: Long)

  private val dfs = scala.collection.mutable.ArrayBuffer.empty[DfPin]
  private val rdds = scala.collection.mutable.ArrayBuffer.empty[RddPin]
  private var seqCounter = 0L

  /** Register a cached DataFrame; returns it for chaining. */
  private[graft] def track[A <: DataFrame](df: A): A = synchronized {
    dfs.filterInPlace(_.df.storageLevel != StorageLevel.NONE)
    seqCounter += 1
    dfs += new DfPin(df, Thread.currentThread().getId, seqCounter)
    df
  }

  /** Register localCheckpoint RDD ids (a DataFrame handle cannot unpersist
    * those — they are reachable only through the context's RDD registry). */
  private[graft] def trackRdds(sc: SparkContext, ids: Iterable[Int]): Unit =
    synchronized {
      rdds.filterInPlace(p => p.sc.getPersistentRDDs.contains(p.id))
      ids.foreach { id =>
        seqCounter += 1
        rdds += new RddPin(sc, id, Thread.currentThread().getId, seqCounter)
      }
    }

  /** Tracked pins that are still materialized (cached DataFrames at a
    * non-NONE storage level plus live checkpoint RDDs). */
  def liveCount: Int = synchronized {
    dfs.count(_.df.storageLevel != StorageLevel.NONE) +
      rdds.count(p => p.sc.getPersistentRDDs.contains(p.id))
  }

  /** Release every pin any graft operator still holds. Single-threaded
    * consumers only — from a concurrent callback use [[scoped]]. */
  def releaseAll(): Unit = synchronized {
    dfs.foreach(_.df.unpersist(blocking = false))
    dfs.clear()
    rdds.foreach(p =>
      p.sc.getPersistentRDDs.get(p.id).foreach(_.unpersist(blocking = false)))
    rdds.clear()
  }

  /** Run `body`, then release exactly the pins the CURRENT thread created
    * inside it — pins registered by concurrent operators on other threads
    * are untouched. This is the release path for async callbacks (e.g. a
    * streaming foreachBatch): consume the results inside the block (write
    * the sink, collect the counts), because released checkpoint pins
    * cannot recompute afterwards. */
  def scoped[T](body: => T): T = {
    val tid = Thread.currentThread().getId
    val mark = synchronized(seqCounter)
    try body
    finally releaseSince(mark, tid)
  }

  /** Release pins created after `mark` by thread `tid`; keep the rest. */
  private def releaseSince(mark: Long, tid: Long): Unit = synchronized {
    dfs.filterInPlace { p =>
      val mine = p.seq > mark && p.thread == tid
      if (mine) p.df.unpersist(blocking = false)
      !mine
    }
    rdds.filterInPlace { p =>
      val mine = p.seq > mark && p.thread == tid
      if (mine) p.sc.getPersistentRDDs.get(p.id)
        .foreach(_.unpersist(blocking = false))
      !mine
    }
  }
}
