package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product of two ARRAY<DOUBLE> columns.
  *
  * The built-in formulation `aggregate(zip_with(a, b, *), 0d, +)` builds an
  * intermediate array per row and interprets two lambdas per element — at
  * millions of candidate pairs (similarity joins) that dominates the query.
  * This expression is a tight codegen'd loop over the two `ArrayData`
  * buffers: no allocation, stays inside whole-stage codegen.
  *
  * Accumulation is sequential left-to-right — the same order as the
  * higher-order formulation and DuckDB's list_dot_product — so results are
  * bit-identical with the differential oracle. Length mismatch throws (like
  * list_dot_product) rather than silently truncating: a corrupt vector
  * should fail loudly, not get ranked on a partial sum. A null ELEMENT on
  * either side yields a null result — the same propagation as
  * `aggregate(zip_with(a,b,*),0d,+)` — instead of silently reading 0.0 out
  * of the unset slot.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // always nullable: even non-nullable array columns can carry null
  // ELEMENTS, and codegen would otherwise fold ev.isNull to the literal
  // `false` and reject the null-element assignment
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product: array length mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: array length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object ArrayExprs {
  /** Column API for [[DotProduct]] (expects ARRAY<DOUBLE> inputs). */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
