package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar (int8) embedding quantization — the storage/serving compression
  * step an embedding corpus goes through before ANN serving: per-dimension
  * min/max over the corpus, each element mapped to an 8-bit code, plus the
  * reconstruction error that decides whether int8 is acceptable.
  *
  * Two passes, both scale-safe: pass 1 reduces to a dim-sized min/max
  * table (partial-aggregated, broadcast back); pass 2 is map-only per
  * element. Codes are integer-exact cross-engine: min/max of exact
  * float→double values are order-independent, and floor((v-mn)*255/(mx-mn))
  * evaluates one identical IEEE expression tree on both sides. The
  * reconstruction-error sum rounds each |v - v̂| term to DECIMAL(18,6)
  * before the cross-row sum (the ln-ulp contract shape), so per-vector
  * totals are partition-order-independent.
  */
object Quantize {

  /** Per-dimension corpus min/max (pass 1) — dim rows, broadcastable. */
  def sqStats(emb: DataFrame, embCol: String = "embedding"): DataFrame =
    emb.select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))

  /** Per-vector int8 codes and reconstruction error (pass 2): code_hash is
    * md5 over the position-ordered code string (a compact equality witness
    * for the whole code vector), recon_err the decimal-rounded sum of
    * per-element |v - v̂| with v̂ = mn + (q + 0.5)·(mx - mn)/255 (the same
    * 255-wide grid the codes use, so every element reconstructs within
    * half a step). Constant
    * dimensions (mx == mn) code to 0 with zero error contribution's v̂
    * pinned to mn. */
  def sqQuantize(emb: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val stats = sqStats(emb, embCol)
    val vd = col("v").cast("double")
    val q = when(col("mx") > col("mn"),
      least(lit(255L), greatest(lit(0L),
        floor(((vd - col("mn")) * 255.0) / (col("mx") - col("mn"))).cast("long"))))
      .otherwise(lit(0L))
    emb.select(col(idCol), posexplode(col(embCol)).as(Seq("pos", "v")))
      .join(broadcast(stats), "pos")
      .withColumn("q", q)
      .withColumn("vhat",
        when(col("mx") > col("mn"),
          col("mn") + ((col("q").cast("double") + 0.5) * (col("mx") - col("mn"))) / 255.0)
          .otherwise(col("mn")))
      .withColumn("err", abs(vd - col("vhat")).cast(DecimalType(18, 6)))
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("q")))).as("pc"),
        sum(col("err")).cast("double").as("recon_err"))
      .select(col(idCol),
        md5(array_join(transform(col("pc"), x => x.getField("q").cast("string")), ","))
          .as("code_hash"),
        col("recon_err"))
  }
}
