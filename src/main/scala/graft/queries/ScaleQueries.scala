package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

/** Skew-handling under the driver gate: the same deliberately-skewed join
  * (97% of lineitem rows share one hot key) run plain and salted. Both must
  * produce identical results (one oracle SQL shape), which puts
  * ScaleOps.saltedJoin itself under the hash gate; Bench times the pair so
  * SCALING.md's skew claims carry measured numbers.
  */
object ScaleQueries {

  /** Lineitem with a synthetic hot key: l_orderkey % 32 != 0 collapses to
    * key 0 (~97% of rows), the rest keep their own key. */
  private def skewedLeft(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).select(
      when(col("l_orderkey") % 32 =!= 0, lit(0L))
        .otherwise(col("l_orderkey")).as("skew_key"),
      col("l_orderkey"), col("l_extendedprice"))

  /** Dim side: the distinct skewed keys with a derived tag. hint("merge")
    * forces a shuffle join — the skew being demonstrated lives in the
    * shuffle; a broadcast would sidestep it (and at 100 TB the dim may not
    * broadcast). */
  private def dim(left: DataFrame): DataFrame =
    left.select("skew_key").distinct()
      .withColumn("tag", pmod(col("skew_key"), lit(7)))
      .hint("merge")

  private val oracle =
    """WITH l AS (
      |  SELECT CASE WHEN l_orderkey % 32 <> 0 THEN 0 ELSE l_orderkey END AS skew_key,
      |         l_extendedprice
      |  FROM lineitem
      |),
      |dim AS (SELECT DISTINCT skew_key, skew_key % 7 AS tag FROM l)
      |SELECT tag, count(*) AS n,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM l JOIN dim USING (skew_key)
      |GROUP BY tag
      |ORDER BY tag""".stripMargin

  private def aggregate(joined: DataFrame): DataFrame =
    joined.groupBy("tag")
      .agg(count(lit(1)).as("n"), Fns.dsum(col("l_extendedprice")).as("total"))
      .orderBy("tag")

  /** The skewed join as Catalyst plans it (AQE's runtime skew split is the
    * built-in mitigation; measured against the salted form in Bench). */
  val skewPlain = QueryDef("q_scale_skew_plain", oracle) { (s, d) =>
    val left = skewedLeft(s, d)
    aggregate(left.join(dim(left), Seq("skew_key")))
  }

  /** The same join through ScaleOps.saltedJoin: the hot key spreads over 16
    * salt buckets (left side hash-salted on l_orderkey, dim replicated
    * 16×), so no reducer owns 97% of the rows. */
  val saltedJoin = QueryDef("q_scale_salted_join", oracle) { (s, d) =>
    val left = skewedLeft(s, d)
    aggregate(
      ScaleOps.saltedJoin(left, dim(left), "skew_key",
        saltBy = col("l_orderkey"), salts = 16))
  }

  /** Heavy hitters over the event stream's user key: fixed-memory
    * Misra-Gries candidate pass, exact recount of candidates only, then the
    * support·N threshold — provably equal to the exact HAVING answer while
    * never shuffling the full key space (ScaleOps.heavyHitters; this is
    * the skew detector that feeds saltedJoin's salt list at 100 TB).
    * support = 0.5% of rows. */
  val heavyHitters = QueryDef(
    "q_scale_heavy_hitters",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      |FROM events
      |GROUP BY user_id
      |HAVING count(*) > CAST(0.005 AS DOUBLE) * (SELECT count(*) FROM events)
      |ORDER BY user_id NULLS LAST""".stripMargin) { (s, d) =>
    // null placement pinned on BOTH sides: the op deliberately admits a
    // NULL key group, Spark sorts NULLs first by default, DuckDB last
    ScaleOps.heavyHitters(T.events(s, d), "user_id", support = 0.005)
      .orderBy(col("user_id").asc_nulls_last)
  }

  /** Z-order layout stats: orders quantized on (o_custkey, o_totalprice)
    * to an 8-bit grid, Morton-interleaved, split into 64 files by z-prefix;
    * per-file count + min/max of BOTH dims — the footer stats a reader
    * prunes multi-dimensional range predicates with. A single-column sort
    * would leave the other dim spanning every file; the z-curve bounds
    * both (quantified in ScaleSpec's pruning test). */
  val zorderLayout = QueryDef(
    "q_scale_zorder_layout",
    """WITH b AS (
      |  SELECT CAST(min(o_custkey) AS DOUBLE) AS xmin,
      |         CAST(max(o_custkey) AS DOUBLE) AS xmax,
      |         CAST(min(o_totalprice) AS DOUBLE) AS ymin,
      |         CAST(max(o_totalprice) AS DOUBLE) AS ymax
      |  FROM orders
      |), q AS (
      |  SELECT o_custkey, o_totalprice,
      |         least(255, greatest(0, CAST(floor((CAST(o_custkey AS DOUBLE) - xmin)
      |           / (xmax - xmin + 1e-9) * 256.0) AS BIGINT))) AS qx,
      |         least(255, greatest(0, CAST(floor((CAST(o_totalprice AS DOUBLE) - ymin)
      |           / (ymax - ymin + 1e-9) * 256.0) AS BIGINT))) AS qy
      |  FROM orders CROSS JOIN b
      |), z AS (
      |  SELECT o_custkey, o_totalprice,
      |         CAST(list_sum(list_transform(generate_series(0, 7),
      |           i -> ((qx >> i) & 1) * (1 << (2 * i + 1))
      |              + ((qy >> i) & 1) * (1 << (2 * i)))) AS BIGINT) AS zval
      |  FROM q
      |)
      |SELECT CAST(zval >> 10 AS BIGINT) AS zfile,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       min(o_custkey) AS x_min, max(o_custkey) AS x_max,
      |       min(o_totalprice) AS y_min, max(o_totalprice) AS y_max
      |FROM z GROUP BY zfile ORDER BY zfile""".stripMargin) { (s, d) =>
    ScaleOps.zorderFileStats(T.orders(s, d), "o_custkey", "o_totalprice",
        bits = 8, fileBits = 6)
      .orderBy("zfile")
  }

  /** Bloom-pruned fact⋈dim join: a ~1-in-26 selective orders slice
    * (o_totalprice < 20000 — a NON-KEY predicate, so Catalyst cannot
    * infer it onto the fact side the way it propagates key predicates
    * through equi joins) joins lineitem; the fact side is pre-filtered
    * MAP-SIDE by four broadcast left-semi probes of the dim keys' Bloom
    * positions before the exact shuffle join, so ~96% of the fact
    * shuffle volume never leaves the map side (measured in SCALING.md).
    * No false negatives + exact join after ⇒ result is EXACTLY the
    * plain join's — which is the oracle. */
  val bloomJoinPrune = QueryDef(
    "q_scale_bloom_join_prune",
    """WITH sel AS (
      |  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice < 20000
      |)
      |SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem l JOIN sel ON l.l_orderkey = sel.o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val sel = T.orders(s, d).filter(col("o_totalprice") < 20000)
      .select("o_orderkey", "o_orderpriority")
    ScaleOps.bloomJoinPruned(T.lineitem(s, d), sel, "l_orderkey", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        Fns.dsum(col("l_extendedprice")).as("total"))
      .orderBy("o_orderpriority")
  }

  /** Small-file compaction: a deliberately fragmented orders copy (one
    * file per ~40 rows — the shape an append-per-micro-batch sink
    * accretes) is compacted into range-sorted files; the aggregate over
    * the compacted table must equal the aggregate over the original
    * (the oracle), proving the rewrite is lossless. File-count and
    * footer-tightness claims are asserted in ScaleSpec, where the
    * filesystem is visible. */
  val compaction = QueryDef(
    "q_scale_compaction",
    """SELECT o_orderstatus,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
      |       CAST(min(o_orderkey) AS BIGINT) AS min_key,
      |       CAST(max(o_orderkey) AS BIGINT) AS max_key
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val dir = graft.ops.Models.ensureBuilt(s"compact|$d") { tmp =>
      T.orders(s, d).repartition(200)
        .write.mode("overwrite").parquet(s"$tmp/fragmented")
      graft.ops.ScaleOps.compactTo(s, s"$tmp/fragmented", s"$tmp/compacted",
        targetRowsPerFile = 50000, sortCols = Seq("o_orderkey"))
    }
    s.read.parquet(s"$dir/compacted")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        Fns.dsum(col("o_totalprice"), scale = 6).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")
  }

  val defs: Seq[QueryDef] =
    Seq(skewPlain, saltedJoin, heavyHitters, zorderLayout, bloomJoinPrune,
      compaction)
}
