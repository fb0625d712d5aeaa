package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's private[sql] Expression<->Column conversion
  * (Spark 4 moved `new Column(expr)` behind classic.ExpressionUtils).
  * Lives in the org.apache.spark.sql package solely to cross that access
  * boundary — the standard extension-library idiom.
  */
package object graftbridge {
  def exprToColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def columnToExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize the optimizer rules an extension set would inject
    * (buildOptimizerRules is private[sql]; tests assert injection). */
  def optimizerRulesOf(ext: SparkSessionExtensions, spark: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
