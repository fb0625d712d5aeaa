package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All four language trigram scores in ONE compiled pass over the text:
  * per position, one hash lookup of the 3-char gram against the literal
  * weight table, accumulating each language's weighted count. The
  * semantic reference is the built-in form in
  * `TextAnalysis.withLangIdTrigramRef` (per-language
  * `aggregate(grams, 0L, acc + CASE gram ...)`) — four interpreted-lambda
  * passes whose per-element evaluator re-entry measured 40 s for the
  * sf0.1 registry query; the kernel is the same integer arithmetic
  * (bit-exact, ExprSpec-pinned) at scan speed. Output: array<long> of
  * scores in [[TrigramLang.table]] order. */
case class TrigramLangScores(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_lang_scores requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_lang_scores"

  override def nullSafeEval(input: Any): Any =
    TrigramLang.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TrigramLang.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TrigramLangScores =
    copy(child = newChild)
}

object TrigramLang {

  /** Per-language character-trigram weight profiles (the fastText/langid
    * family's feature shape, reduced to a literal table): frequent
    * trigrams of each language incl. word-boundary spaces, weight 3 for
    * the most distinctive, 1 for common-but-shared. Literal and integer
    * so the score sum is exact on any engine and partitioning — the ONE
    * source of truth for the kernel, the built-in reference form, and
    * the generated DuckDB oracle CASE tables. */
  val table: Seq[(String, Seq[(String, Int)])] = Seq(
    "en" -> Seq(" th" -> 3, "the" -> 3, "he " -> 2, "and" -> 2, "nd " -> 1,
      "ing" -> 3, "ng " -> 2, " of" -> 3, "of " -> 2, "ion" -> 1,
      " to" -> 2, "to " -> 1, " is" -> 2, "is " -> 1, "ed " -> 2,
      " in" -> 1, "ent" -> 1, "ati" -> 2, " wi" -> 2, "th " -> 1),
    "de" -> Seq("der" -> 3, "er " -> 2, " de" -> 1, "die" -> 3, "ie " -> 2,
      "und" -> 3, " un" -> 1, "ein" -> 3, "ich" -> 3, "ch " -> 2,
      "sch" -> 3, "ung" -> 3, " ge" -> 2, "ten" -> 2, "cht" -> 3,
      "das" -> 2, "ver" -> 2, "gen" -> 2, "nde" -> 1, "ens" -> 1),
    "es" -> Seq(" de" -> 2, "de " -> 2, "os " -> 3, " la" -> 3, "la " -> 2,
      " el" -> 3, "el " -> 2, "que" -> 2, "ue " -> 1, " qu" -> 1,
      "es " -> 2, "ar " -> 2, " co" -> 1, "ado" -> 3, "por" -> 2,
      " po" -> 1, "una" -> 2, "nte" -> 1, "cio" -> 3, "ien" -> 2),
    "fr" -> Seq(" le" -> 3, "le " -> 2, "es " -> 1, " de" -> 2, "de " -> 1,
      "ent" -> 2, "nt " -> 2, " et" -> 3, "et " -> 2, " la" -> 2,
      "ait" -> 3, "que" -> 1, " qu" -> 1, "les" -> 2, " pa" -> 2,
      "our" -> 3, "pou" -> 3, "eur" -> 3, "ais" -> 3, "une" -> 2))

  val langs: Seq[String] = table.map(_._1)

  /** gram -> per-language weight vector, built once. */
  private val weights: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    for (((_, ws), li) <- table.zipWithIndex; (g, w) <- ws) {
      var arr = m.get(g)
      if (arr == null) { arr = new Array[Long](table.length); m.put(g, arr) }
      arr(li) += w
    }
    m
  }

  /** Static single-pass kernel shared by interpreted eval and codegen. */
  def compute(input: UTF8String): ArrayData = {
    val s = input.toString
    val out = new Array[Long](table.length)
    val n = s.length - 2
    var i = 0
    while (i < n) {
      val arr = weights.get(s.substring(i, i + 3))
      if (arr != null) {
        var j = 0
        while (j < out.length) { out(j) += arr(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def trigramLangScores(c: Column): Column =
    exprToColumn(TrigramLangScores(columnToExpr(c)))
}
