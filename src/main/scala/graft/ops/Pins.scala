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
  * The ledger self-prunes: tracking a new pin drops entries that are no
  * longer materialized (operators release superseded pins internally as
  * they loop), so the ledger stays proportional to LIVE pins even if a
  * consumer never calls [[releaseAll]].
  */
object Pins {

  private val dfs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val rdds = scala.collection.mutable.ArrayBuffer.empty[(SparkContext, Int)]

  /** Register a cached DataFrame; returns it for chaining. */
  private[graft] def track[A <: DataFrame](df: A): A = synchronized {
    dfs.filterInPlace(_.storageLevel != StorageLevel.NONE)
    dfs += df
    df
  }

  /** Register localCheckpoint RDD ids (a DataFrame handle cannot unpersist
    * those — they are reachable only through the context's RDD registry). */
  private[graft] def trackRdds(sc: SparkContext, ids: Iterable[Int]): Unit =
    synchronized {
      rdds.filterInPlace { case (c, id) => c.getPersistentRDDs.contains(id) }
      ids.foreach(id => rdds += ((sc, id)))
    }

  /** Tracked pins that are still materialized (cached DataFrames at a
    * non-NONE storage level plus live checkpoint RDDs). */
  def liveCount: Int = synchronized {
    dfs.count(_.storageLevel != StorageLevel.NONE) +
      rdds.count { case (c, id) => c.getPersistentRDDs.contains(id) }
  }

  /** Release every pin any graft operator still holds. */
  def releaseAll(): Unit = synchronized {
    dfs.foreach(_.unpersist(blocking = false))
    dfs.clear()
    rdds.foreach { case (c, id) =>
      c.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    rdds.clear()
  }
}
