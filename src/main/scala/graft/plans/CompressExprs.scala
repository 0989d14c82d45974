package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate helpers shared by [[DeflatedLength]]'s interpreted and generated
  * paths. The Deflater configuration is pinned (level 6, default strategy,
  * zlib wrapper) so the output length is a property of the input bytes, not
  * of a knob — the same contract as `TextOps.compressRatio`.
  *
  * One Deflater + scratch buffer per EXECUTOR THREAD (ThreadLocal), reused
  * across every row and task the thread ever runs: native zlib state is
  * bounded by the thread-pool size (32 on local[32]) for the life of the
  * executor, instead of one allocation per task whose native buffers wait
  * for GC — the off-heap-accumulation failure mode a per-task Deflater
  * without `end()` has on long-lived executors.
  */
object Zlib {
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** Length in bytes of the pinned-config deflate stream for `bytes`. */
  def deflatedLength(bytes: Array[Byte]): Long = {
    val d = deflater.get()
    val buf = scratch.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  /** [[deflatedLength]] over a UTF8String without a detour through String. */
  def deflatedLength(s: UTF8String): Long = deflatedLength(s.getBytes)
}

/** Codegen'd deflate-stream length of a STRING column (UTF-8 bytes).
  *
  * The Dataset-tuple formulation (`as[(Long, String)]` → `mapPartitions`)
  * deserializes every document to a Scala object and breaks whole-stage
  * codegen around the scan; this expression keeps the scan → project
  * pipeline inside Tungsten — the generated code hands the UnsafeRow's
  * UTF8String straight to [[Zlib.deflatedLength]], no row object, no
  * encoder round-trip.
  *
  * No SQL engine exposes zlib, so relations built on this expression take
  * the spec-pinned contract (determinism, bounds, ordering) rather than a
  * DuckDB oracle — same standing as the multimodal codecs.
  */
case class DeflatedLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflated_length"

  override def nullSafeEval(input: Any): Any =
    Zlib.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Zlib.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflatedLength =
    copy(child = newChild)
}

object CompressExprs {
  /** Column API for [[DeflatedLength]] (expects a STRING input). */
  def deflatedLength(c: Column): Column =
    ColumnBridge.column(DeflatedLength(ColumnBridge.expression(c)))
}
