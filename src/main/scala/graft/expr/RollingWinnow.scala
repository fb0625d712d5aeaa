package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint over a TRUE rolling hash: Rabin-Karp polynomial
  * k-gram hashes (O(1) incremental update per position — the property that
  * makes char-level fingerprinting affordable at scan speed on 100 TB),
  * then the standard w-window minimum selection. Guarantees any substring
  * of length >= w + k - 1 shared by two documents contributes a shared
  * fingerprint. Returns the SORTED DISTINCT selected hashes.
  *
  * The md5-gram twin (TextAnalysis.withWinnowedFingerprint) runs the same
  * selection over an engine-neutral hash so the algorithm sits under the
  * DuckDB oracle gate; this kernel is the throughput path (no per-gram
  * digest, single compiled pass), rows-only checked plus the
  * shared-substring guarantee in OpsSpec.
  */
case class RollingWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_winnow requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_winnow"

  override def nullSafeEval(input: Any): Any =
    RollingWinnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.RollingWinnow.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): RollingWinnow =
    copy(child = newChild)
}

object RollingWinnow {
  def rollingWinnow(c: Column, k: Int = 8, w: Int = 8): Column =
    exprToColumn(RollingWinnow(columnToExpr(c), k, w))

  private val B = 1000003L

  /** Static single-pass kernel shared by interpreted eval and codegen. */
  def compute(input: UTF8String, k: Int, w: Int): ArrayData = {
    val s = input.toString
    val g = s.length - k + 1
    if (g < 1) return new GenericArrayData(Array.empty[Long])
    // precompute B^(k-1) in wrapping 64-bit arithmetic
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    val hashes = new Array[Long](g)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < g) {
      h = (h - s.charAt(i - 1) * bk) * B + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    // w-window minimum selection (windows clamp to the gram range, so
    // g < w degenerates to one whole-range window)
    val selected = new java.util.TreeSet[java.lang.Long]()
    val nw = math.max(g - w + 1, 1)
    var j = 0
    while (j < nw) {
      var m = hashes(j)
      var t = j + 1
      val end = math.min(j + w, g)
      while (t < end) { if (hashes(t) < m) m = hashes(t); t += 1 }
      selected.add(m)
      j += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    new GenericArrayData(out)
  }
}
