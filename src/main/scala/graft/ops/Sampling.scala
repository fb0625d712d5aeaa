package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines. Splits must be
  * reproducible across runs, engines, AND partitionings — `rand()` is none
  * of those — so the bucket is pure content-independent arithmetic on the
  * row id: the first 16 bits of md5(id) mod 100. Map-only at any scale,
  * and a row's split never changes when the corpus grows (the property
  * that keeps eval sets stable across dataset versions). */
object Sampling {

  /** Stable bucket in [0, 100) from the row id. */
  def splitBucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("long") % 100

  /** Deterministic stratified sample: keep `rates(stratum)`% of each
    * stratum (`defaultPct`% for unlisted strata) using the same md5 bucket
    * as [[withSplit]] — the language/source-rebalancing primitive. Map-only
    * (the rate lookup folds into a CASE expression, no join), reproducible,
    * and monotone in the rate: raising a stratum's rate only ADDS rows,
    * never swaps them (bucket membership is fixed per id). */
  def stratifiedSample(df: DataFrame, idCol: String = "doc_id",
      stratumCol: String = "lang", rates: Map[String, Int] = Map.empty,
      defaultPct: Int = 0): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "rates must be percentages in [0, 100]")
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(splitBucket(col(idCol)) < pct)
  }

  /** Quality-weighted deterministic sampling: keep a row with probability
    * proportional to a per-row weight in [0, 1] (a quality score), decided
    * by the same md5 bucket as [[withSplit]] — reproducible across runs and
    * engines, map-only, and monotone (raising a row's weight can only flip
    * it from dropped to kept). The per-row acceptance percentage is
    * floor(weight·100) clamped to [0, 100]. */
  def weightedKeep(df: DataFrame, idCol: String = "doc_id",
      weightCol: String = "quality_score"): DataFrame =
    df.withColumn("keep_pct",
        greatest(lit(0L), least(lit(100L),
          floor(col(weightCol) * 100).cast("long"))))
      .withColumn("keep_bucket", splitBucket(col(idCol)))
      .withColumn("kept", col("keep_bucket") < col("keep_pct"))

  /** Materialize per-source mix weights into an actual resampled corpus:
    * each doc is emitted `floor(boost)` times plus one more with
    * probability frac(boost), decided by the stable md5 bucket — the step
    * that turns [[CorpusQuality.temperatureMixWeights]]' `boost` column
    * (or any per-source multiplier) into training rows. Deterministic
    * across runs/engines/partitionings, map-only after a broadcast join
    * of the (tiny) weight table; a boost < 1 degenerates to weighted
    * downsampling, a boost > 1 to replication with a fractional tail.
    * Output keys are (doc_id, copy) — downstream shuffles see distinct
    * keys, not duplicated ids. */
  def resampleByWeight(docs: DataFrame, weights: DataFrame,
      idCol: String = "doc_id", keyCol: String = "source",
      boostCol: String = "boost"): DataFrame = {
    val nCopies =
      (floor(col(boostCol)).cast("long")
        + when(splitBucket(col(idCol)).cast("double") / 100.0
            < col(boostCol) - floor(col(boostCol)), 1L).otherwise(0L))
        .as("n_copies")
    docs
      .join(broadcast(weights.select(col(keyCol), col(boostCol))), keyCol)
      .select(col(idCol), col(keyCol), nCopies)
      .withColumn("copy",
        explode(when(col("n_copies") > 0,
            sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<long>"))))
      .select(idCol, keyCol, "copy")
  }

  /** Adds `split_bucket` and a `split` label: first `trainPct` buckets →
    * train, next `valPct` → val, rest → test. */
  def withSplit(df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "train + val must leave room for test")
    val b = splitBucket(col(idCol))
    df.withColumn("split_bucket", b)
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .when(col("split_bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }
}
