package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the dot product of two array<double>
  * columns, with whole-stage codegen (`doGenCode` emits a tight primitive
  * loop — no per-element lambda dispatch, no boxing). The higher-order
  * `aggregate(zip_with(...))` formulation allocates an intermediate array
  * and evaluates a lambda per element; in the kNN hot path (candidates ×
  * queries × dims multiply-adds) the fused loop is the difference between
  * a memory-bound and a compute-bound scan at cluster scale.
  *
  * Null handling: standard binary-expression null propagation for the
  * arrays themselves; elements are assumed non-null (embedding vectors).
  * Lengths may differ — the shorter length wins (zip semantics).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for the library's native expressions: per-session
  * (`GraftFunctions.register`) or via `SparkSessionExtensions`
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`). */
object GraftFunctions {
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_dot" -> (exprs => ArrayDotProduct(exprs(0), exprs(1))),
    "minhash_sigs" -> (exprs => {
      // clear analysis-time errors for the spark.sql surface: arity first,
      // then the literal-k requirement, instead of raw IndexOutOfBounds
      if (exprs.length != 2)
        throw new IllegalArgumentException(
          s"minhash_sigs expects 2 arguments (array<string>, k literal), got ${exprs.length}")
      if (!exprs(1).foldable)
        throw new IllegalArgumentException(
          "minhash_sigs: k (2nd argument) must be a literal integer")
      exprs(1).eval() match {
        case n: Number => MinHashSignature(exprs(0), n.intValue())
        case other => throw new IllegalArgumentException(
          s"minhash_sigs: k must be a non-null integer literal, got $other")
      }
    }),
    "simhash_sig" -> (exprs => SimHashSignature(exprs(0))),
    "array_top_count" -> (exprs => ArrayTopCount(exprs(0))),
    "winnow_fps" -> (exprs => {
      if (exprs.length != 2)
        throw new IllegalArgumentException(
          s"winnow_fps expects 2 arguments (array<string>, w literal), got ${exprs.length}")
      if (!exprs(1).foldable)
        throw new IllegalArgumentException(
          "winnow_fps: w (2nd argument) must be a literal integer")
      exprs(1).eval() match {
        case n: Number => WinnowFingerprints(exprs(0), n.intValue())
        case other => throw new IllegalArgumentException(
          s"winnow_fps: w must be a non-null integer literal, got $other")
      }
    }))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private val classNames = Map(
    "array_dot" -> classOf[ArrayDotProduct].getName,
    "minhash_sigs" -> classOf[MinHashSignature].getName,
    "simhash_sig" -> classOf[SimHashSignature].getName,
    "array_top_count" -> classOf[ArrayTopCount].getName,
    "winnow_fps" -> classOf[WinnowFingerprints].getName)

  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classNames(name), name),
        builder))
    }
}
