package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for the SQL surface, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works alongside the Column
  * API.
  *
  * Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftExtensions.buildDotProduct))
  }
}

object GraftExtensions {
  private[plans] def buildDotProduct(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): DotProduct = {
    // a clear analysis-time arity error instead of IndexOutOfBounds from
    // deep inside the analyzer
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`dot_product`", "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
    DotProduct(exprs(0), exprs(1))
  }

  /** Register on an already-running session (extensions only apply at
    * session construction; `getOrCreate` on a live session ignores them).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", buildDotProduct, "scala_udf")
}
