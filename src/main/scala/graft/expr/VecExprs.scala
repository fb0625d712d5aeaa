package graft.expr

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Vector kernels for the similarity/dedup operators, as compiled Catalyst
  * expressions. The composable form (`aggregate(zip_with(...))`) re-enters
  * the interpreted lambda evaluator per element — fine for one-off columns,
  * ~25µs per 64-dim cosine in the ANN hot loops. These do the same work in
  * a tight single pass (sub-µs) and participate in whole-stage codegen via
  * static kernel calls, so the candidate-pair scoring stages stay inside
  * one codegen span.
  */
private[expr] object VecKernels {
  /** Element read as double regardless of FLOAT/DOUBLE storage. */
  @inline def toDoubles(a: ArrayData, isDouble: Boolean): Array[Double] =
    if (isDouble) a.toDoubleArray()
    else {
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    }

  def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  def isDoubleVec(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** Cosine similarity of two FLOAT/DOUBLE vectors in one compiled pass
  * (dot and both norms accumulated left-to-right in double precision —
  * bit-identical to the sequential `aggregate(zip_with(...))` fold it
  * replaces, so rank-only oracle outputs are unaffected). Malformed input
  * — a null element, or mismatched lengths — yields NULL, matching the
  * zip_with form (which null-pads the shorter side and poisons the fold)
  * rather than silently scoring truncated/zero-filled vectors. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecKernels.isVec(left.dataType) && VecKernels.isVec(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
    }

  private lazy val lDouble = VecKernels.isDoubleVec(left.dataType)
  private lazy val rDouble = VecKernels.isDoubleVec(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.computeBoxed(l.asInstanceOf[ArrayData], lDouble,
      r.asInstanceOf[ArrayData], rDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r =
         |  graft.expr.CosineSim.computeBoxed($a, $lDouble, $b, $rDouble);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Static kernel shared by interpreted eval and codegen; null on
    * malformed input (length mismatch or null element). */
  def computeBoxed(l: ArrayData, lDouble: Boolean,
      r: ArrayData, rDouble: Boolean): java.lang.Double = {
    val n = l.numElements()
    if (n != r.numElements()) return null
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      i += 1
    }
    val a = VecKernels.toDoubles(l, lDouble)
    val b = VecKernels.toDoubles(r, rDouble)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    i = 0
    while (i < n) {
      val x = a(i)
      val y = b(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** `tables` random-hyperplane LSH bucket ids (each `nbits` sign bits) for a
  * FLOAT/DOUBLE vector — the OR-amplification family for near-dup blocking:
  * a pair is a candidate if it collides in ANY table, so per-table recall
  * shortfall multiplies away. Hyperplane weights are derived
  * deterministically from XXH64(pos, table*nbits + bit) (no stored model,
  * reproducible across runs) and cached per (bits, dim) — bucket
  * computation is then `tables*nbits*dim` fused multiply-adds per row. */
case class LshBuckets(child: Expression, nbits: Int, tables: Int)
    extends UnaryExpression {

  require(nbits >= 1 && nbits <= 62, "nbits must be in [1, 62]")
  require(tables >= 1, "tables must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecKernels.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires an array<float|double> input, got ${child.dataType}")

  override def nullable: Boolean = true

  private lazy val isDouble = VecKernels.isDoubleVec(child.dataType)

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], isDouble, nbits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expr.LshBuckets.compute($c, $isDouble, $nbits, $tables);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** Hyperplane weight rows, uniform in [-1, 1), keyed by (totalBits, dim).
    * Weights are row-independent, so one matrix serves the whole scan. */
  private val cache = new ConcurrentHashMap[Long, Array[Array[Double]]]()

  private def weights(bits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((bits.toLong << 32) | dim.toLong, _ => {
      val w = Array.ofDim[Double](bits, dim)
      var b = 0
      while (b < bits) {
        var p = 0
        while (p < dim) {
          val h = XXH64.hashLong(p.toLong, b.toLong)
          w(b)(p) = (((h % 1000L) + 1000L) % 1000L) / 500.0 - 1.0
          p += 1
        }
        b += 1
      }
      w
    })

  /** Static kernel shared by interpreted eval and codegen; null when the
    * vector contains a null element (a bucket from a zero-filled vector
    * would silently collide everything). */
  def compute(input: ArrayData, isDouble: Boolean, nbits: Int, tables: Int): ArrayData = {
    var p0 = 0
    while (p0 < input.numElements()) {
      if (input.isNullAt(p0)) return null
      p0 += 1
    }
    val v = VecKernels.toDoubles(input, isDouble)
    val w = weights(nbits * tables, v.length)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < nbits) {
        val wb = w(t * nbits + j)
        var d = 0.0
        var p = 0
        while (p < v.length) { d += v(p) * wb(p); p += 1 }
        if (d > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

object VecExprs {
  def cosineSim(a: Column, b: Column): Column =
    exprToColumn(CosineSim(columnToExpr(a), columnToExpr(b)))

  def lshBuckets(c: Column, nbits: Int, tables: Int): Column =
    exprToColumn(LshBuckets(columnToExpr(c), nbits, tables))
}
