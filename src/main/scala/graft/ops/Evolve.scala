package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-evolution primitives for a warehouse built on append-only logs:
  * SCD Type-2 history construction and last-write-wins incremental merge.
  *
  * The reference rebuilds every table full-refresh on each run
  * (`/root/reference/startup.sh:12-18` — `dbt run` over full-replace
  * models); these operators are what the same warehouse needs the moment
  * the input stops fitting a nightly full rebuild: dimension history
  * (dbt's "snapshot" surface) and idempotent delta merges.
  *
  * Scale notes:
  *   - `scd2` shuffles once on the entity key; both windows share the same
  *     partitioning/ordering so Catalyst plans a single exchange. Per-key
  *     history is assumed executor-bounded (true for dimension-shaped data;
  *     a key with 10^9 change rows is an upstream modeling bug).
  *   - `mergeUpsert` is a hash aggregate with `max_by` — partial (map-side)
  *     aggregation applies, so the shuffle carries one candidate row per
  *     (partition, key), NOT the full delta. This beats the classic
  *     union + row_number plan, which must sort every row.
  */
object Evolve {

  /** Build SCD Type-2 history from an append-only change log.
    *
    * Keeps the first observation per key plus every row where any tracked
    * attribute differs (null-safely) from the previous observation, then
    * derives `valid_from`/`valid_to`/`is_current` intervals.
    *
    * @param tieBreak extra ordering columns to total-order rows whose
    *                 timestamp collides (e.g. a log sequence number).
    */
  def scd2(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val attrChanged = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    changes
      .withColumn("_rn", row_number().over(w))
      .withColumn("_chg", attrChanged)
      // row_number()==1 keeps the first version even when its attributes are
      // all NULL (lag NULL <=> NULL would read as "unchanged" and drop it)
      .filter(col("_rn") === 1 || col("_chg"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_rn", "_chg")
  }

  /** Last-write-wins merge of a delta into a base snapshot: for each key,
    * the row with the greatest `versionCols` tuple (lexicographic) wins.
    * Equivalent to MERGE ... WHEN MATCHED THEN UPDATE for full-row updates.
    *
    * Implemented as one hash aggregate (`max_by` over a version struct)
    * rather than union + window row_number: partial aggregation shrinks the
    * shuffle to ~one row per key per input partition, and no per-key sort
    * is needed.
    */
  def mergeUpsert(
      base: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty)
    val all = base.unionByName(delta)
    val payload = all.columns.filterNot(keyCols.contains)
    all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.toIndexedSeq.map(col): _*),
        struct(versionCols.map(col): _*)).as("_top"))
      .select(keyCols.map(col) ++ payload.toIndexedSeq.map(p => col(s"_top.`$p`").as(p)): _*)
  }

  /** Snapshot reconciliation: classify every key across two table versions
    * as added / removed / changed / unchanged by comparing an md5 over the
    * compare columns (cast to string explicitly — engine-neutral only for
    * string/integer columns; floats and dates format differently across
    * engines and must not be fed here uncast).
    *
    * One full-outer shuffle join on the key with fixed-width digests —
    * the audit pattern that diffs two 100 TB snapshots without moving
    * payload data. Returns (diff_status, n). */
  private val aggDec = org.apache.spark.sql.types.DecimalType(18, 6)

  /** Partial per-group aggregate of one batch: (key, n, amount) with the
    * amount accumulated in DECIMAL (the cross-engine sum discipline). */
  private def aggPartial(df: DataFrame, keyCol: String,
      amountCol: String): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("n"),
      sum(col(amountCol).cast(aggDec)).as("amount"))

  /** Incremental aggregate maintenance — the warehouse-side instance of
    * the additive-artifact lifecycle this engine uses everywhere a
    * dataset grows (dedup-index append, Bloom position fold-in, DSIR
    * count append): maintain a per-group count/sum table under arriving
    * delta batches by appending each delta's PARTIAL aggregate and
    * folding at read. Count and decimal-sum are associative, so
    * [[aggServe]] equals a full recompute over base ∪ all deltas EXACTLY
    * — no delta ever re-scans history, the artifact is group-bounded
    * (never history-sized), and each fold shuffles only the delta's
    * partial rows. This is what replaces the reference's nightly
    * full-refresh `dbt run` the moment the fact table stops fitting a
    * rebuild window. */
  def aggBuild(base: DataFrame, dir: String, keyCol: String,
      amountCol: String): Unit =
    Models.save(aggPartial(base, keyCol, amountCol), s"$dir/agg")

  /** Fold one delta batch into the maintained aggregate (scans the BATCH
    * only). */
  def aggFold(delta: DataFrame, dir: String, keyCol: String,
      amountCol: String): Unit =
    Models.append(aggPartial(delta, keyCol, amountCol), s"$dir/agg")

  /** Serve the maintained aggregate: fold the appended partial rows —
    * one groupBy over a table bounded by |groups| × |batches|. */
  def aggServe(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String): DataFrame =
    Models.load(spark, s"$dir/agg")
      .groupBy(keyCol)
      .agg(sum(col("n")).as("n_rows"), sum(col("amount")).as("total_amount"))

  /** Compact the folded artifact back to one row per group: fold the
    * appended partials and REPLACE the table (localCheckpoint severs the
    * read from the overwrite — Spark cannot overwrite a path its plan is
    * still scanning). Serve results are unchanged by construction; run
    * whenever batch count makes the artifact's |groups| × |batches| rows
    * worth collapsing. */
  def aggCompact(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String): Unit = {
    // cast back to the partial schema (sum widens decimal precision;
    // future appends must stay parquet-schema-compatible)
    val folded = aggServe(spark, dir, keyCol)
      .select(col(keyCol), col("n_rows").cast("long").as("n"),
        col("total_amount")
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)).as("amount"))
      .localCheckpoint()
    Models.save(folded, s"$dir/agg")
  }

  /** Incremental JOIN-view maintenance (insert-only deltas on BOTH
    * sides) — the join-shaped sibling of the maintained aggregate
    * ([[aggBuild]]), closing the materialized-view lifecycle: the
    * reference's dashboards read a fact ⋈ dim join rebuilt full-refresh
    * per `dbt run`; past a rebuild window the view must absorb deltas.
    *
    * Delta algebra for J = L ⋈ R under inserts ΔL, ΔR:
    * ΔJ = ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR — the three terms cover each NEW joined
    * pair exactly once (old×old is already in the view; new×old, old×new
    * and new×new are disjoint), so append-of-ΔJ keeps the view EXACTLY a
    * full re-join of the cumulative bases; multiset semantics, no
    * approximation. Scale shape: both delta-side joins hint
    * `broadcast(delta)`, so each maintenance batch is two MAP-ONLY
    * passes over the stored bases plus a delta×delta broadcast join —
    * no corpus-sized shuffle, where the full re-join it replaces
    * shuffles both entire tables; the stored bases are scanned, not
    * shuffled, and a bucketed/partitioned base layout would prune even
    * the scan. Failure contract (batch op, no checkpoint here): the
    * three appends are not atomic — a crash mid-append leaves view and
    * bases inconsistent; repair is [[joinViewBuild]] over the source of
    * truth (the periodic rebuild a production view runs anyway). The
    * streaming loops that need exactly-once fold this op into
    * checkpointed foreachBatch like [[graft.streaming.StreamOps]]. */
  def joinViewBuild(left: DataFrame, right: DataFrame, dir: String,
      key: String): Unit = {
    Models.save(left, s"$dir/left")
    Models.save(right, s"$dir/right")
    Models.save(left.join(right, key), s"$dir/view")
  }

  /** The ΔJ term of one maintenance batch — exposed so the map-only
    * claim is plan-testable (LifecycleSpec asserts every join in here is
    * a broadcast join, no shuffle join, no exchange on the base side
    * for batch-sized deltas). The broadcast is NOT forced (r17): a
    * hard `broadcast()` hint turned a catch-up-sized delta (half the
    * corpus in the driver fixture at sf10) into a driver OOM —
    * "Not enough memory to build and broadcast the table". Deltas are
    * left unhinted so the planner broadcasts daily-batch-sized deltas
    * (static size estimate or AQE runtime re-plan) and degrades to a
    * sort-merge join when a delta genuinely outgrows memory — slower
    * but correct, which is the right failure mode for a maintenance
    * job. */
  private[graft] def joinViewDelta(l: DataFrame, r: DataFrame,
      dLeft: DataFrame, dRight: DataFrame, key: String): DataFrame =
    dLeft.join(r, key)
      .unionByName(l.join(dRight, key))
      .unionByName(dLeft.join(dRight, key))

  /** Fold one insert batch per side into the maintained join view (either
    * delta may be empty). Scans the BASES once each (map-only broadcast
    * joins), never re-joins them. */
  def joinViewAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
      dLeft: DataFrame, dRight: DataFrame, key: String): Unit = {
    val l = Models.load(spark, s"$dir/left")
    val r = Models.load(spark, s"$dir/right")
    Models.append(joinViewDelta(l, r, dLeft, dRight, key), s"$dir/view")
    Models.append(dLeft, s"$dir/left")
    Models.append(dRight, s"$dir/right")
  }

  /** The maintained join view — a plain scan; no fold step is needed
    * because the view rows ARE the join rows (append-only multiset). */
  def joinViewServe(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    Models.load(spark, s"$dir/view")

  def tableDiff(
      base: DataFrame,
      current: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, h: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("|", compareCols.map(c => col(c).cast("string")): _*)).as(h): _*)
    val a = hashed(base, "h_base")
    val b = hashed(current, "h_cur")
    a.join(b, keyCols, "full_outer")
      .select(
        when(col("h_base").isNull, "added")
          .when(col("h_cur").isNull, "removed")
          .when(col("h_base") =!= col("h_cur"), "changed")
          .otherwise("unchanged").as("diff_status"))
      .groupBy("diff_status")
      .agg(count(lit(1)).as("n"))
  }
}
