package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native compression-ratio expression: `deflate(bytes(text)) /
  * bytes(text)` at a fixed zlib level — the classic
  * cheap-but-surprisingly-strong quality signal for training corpora
  * (highly repetitive/templated junk compresses far below natural prose;
  * cf. the compression-based filters in CCNet-descendant pipelines and
  * deduplication literature). Values roughly: natural text ≈ 0.4–0.7,
  * degenerate repetition → 0.1 and below, random/binary-ish ≳ 1.0 (the
  * deflate header costs a few bytes).
  *
  * Why an expression and not a UDF: a ScalaUDF is a per-row
  * serialization boundary opaque to codegen (PlanGuardSpec bans them
  * repo-wide); this expression codegens to a static call on the UTF-8
  * bytes already in Tungsten memory — no row boxing, stays inside
  * whole-stage codegen like [[ArrayDotProduct]].
  *
  * Determinism: `java.util.zip.Deflater` (zlib) is deterministic for a
  * fixed (input, level, strategy) on a given zlib build; the q125 golden
  * pins this container's output. A zlib upgrade that changes emitted
  * bytes would surface as a golden diff — regenerate deliberately via
  * GoldenGen, never silently.
  *
  * Empty input yields ratio 1.0 (nothing to compress, nothing saved). */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    GraftCompress.ratio(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftCompress.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper the codegen'd call sites share. The Deflater is
  * thread-local and `reset()` per row: allocating a fresh native zlib
  * state (hundreds of KB of window/hash buffers) per ROW would dominate
  * the actual deflate work on short documents and hammer the native
  * allocator across codegen threads; reset() restores the identical
  * initial state for the fixed (level, strategy), so output bytes — and
  * the q125 golden — are unchanged. The per-thread instance lives as
  * long as the executor task thread; the JDK's cleaner reclaims it on
  * thread death. */
object GraftCompress {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) 1.0
    else {
      val d = local.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    }
  }
}
