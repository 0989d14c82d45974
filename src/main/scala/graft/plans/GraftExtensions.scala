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
    e.injectFunction((
      new FunctionIdentifier("hex60"),
      new ExpressionInfo("graft.Exprs", "hex60"),
      GraftExtensions.buildHex60))
    e.injectFunction((
      new FunctionIdentifier("norm_text"),
      new ExpressionInfo("graft.Exprs", "norm_text"),
      GraftExtensions.buildNormText))
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

  import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Lower, Md5, RegExpReplace, StringTrim, Substring}
  import org.apache.spark.sql.types.LongType

  private def checkUnary(name: String, exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`", "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
    exprs.head
  }

  // raw Catalyst trees (the Column→Expression bridge yields an unresolved
  // ColumnNodeExpression that a FunctionBuilder cannot return); these MUST
  // mirror graft.Exprs.hex60 / normText — the registerAll spec asserts it
  private[plans] val buildHex60: Seq[Expression] => Expression = exprs =>
    Cast(Conv(Substring(Md5(checkUnary("hex60", exprs)),
      Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)
  private[plans] val buildNormText: Seq[Expression] => Expression = exprs =>
    StringTrim(RegExpReplace(Lower(checkUnary("norm_text", exprs)),
      Literal("\\s+"), Literal(" ")))

  /** Register on an already-running session (extensions only apply at
    * session construction; `getOrCreate` on a live session ignores them).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", buildDotProduct, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hex60", buildHex60, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_text", buildNormText, "scala_udf")
  }
}
