package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF cell assignment and PQ encoding — the map-side argmin
  * projections of [[graft.ops.Similarity.assignCells]]/[[graft.ops.Similarity.encodePq]],
  * with the trained centroids carried as expression DATA instead of
  * nCells (or m × kSub) separate literal-dot subtrees.
  *
  * Why native: at the corpus-scaled cell counts the round-15 recall
  * floors demand (64 cells at sf1; 16 × 32 PQ codebooks), the composed
  * argmin tree's PLAN COMPILATION dominated the probe queries — the
  * same disease [[LshBuckets]] cured for the banded-LSH family. These
  * evaluate one primitive loop per row over the centroid matrix
  * (codegen references the deserialized expression's arrays directly).
  *
  * Bit-equality with the composed forms (IvfOpsSpec): the distance is
  * ‖c‖² − 2·û·c with û_j = emb_j / norm computed once per row, the dot
  * accumulated in ascending j (array_dot's fold order), ‖c‖² pre-folded
  * ascending at construction (the composed form's `c.map(x*x).sum`),
  * and the winner is the FIRST minimum (array_position-of-array_min). */
case class IvfAssign(left: Expression, right: Expression,
                     centroids: Seq[Seq[Double]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) if centroids.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double> emb, double norm) and non-empty " +
          s"centroids; got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms2: Array[Double] =
    cents.map { c => var s = 0.0; var j = 0; while (j < c.length) { s += c(j) * c(j); j += 1 }; s }

  override def nullSafeEval(e: Any, n: Any): Any =
    IvfOps.assign(e.asInstanceOf[ArrayData], n.asInstanceOf[Double], cents, norms2)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val nRef = ctx.addReferenceObj("ivfNorms2", norms2, "double[]")
    nullSafeCodeGen(ctx, ev, (e, n) => {
      s"${ev.value} = graft.functions.IvfOps.assign($e, $n, $cRef, $nRef);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ codes: per sub-space, the first-argmin codebook entry for the
  * unit vector's contiguous dSub-slice. See [[IvfAssign]]'s equality
  * contract — identical arithmetic, per sub-space. */
case class PqEncode(left: Expression, right: Expression,
                    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType)
        if codebooks.nonEmpty && codebooks.forall(_.nonEmpty) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double> emb, double norm) and non-empty " +
          s"codebooks; got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val norms2: Array[Array[Double]] =
    books.map(_.map { c =>
      var s = 0.0; var j = 0; while (j < c.length) { s += c(j) * c(j); j += 1 }; s })

  override def nullSafeEval(e: Any, n: Any): Any =
    IvfOps.encode(e.asInstanceOf[ArrayData], n.asInstanceOf[Double], books, norms2)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val nRef = ctx.addReferenceObj("pqNorms2", norms2, "double[][]")
    nullSafeCodeGen(ctx, ev, (e, n) => {
      s"${ev.value} = graft.functions.PqEncodeHolder.encode($e, $n, $bRef, $nRef);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen entry points (static, primitive). */
object IvfOps {
  /** û = emb/norm once per row; d_i = ‖c_i‖² − 2·û·c_i (ascending-j
    * fold); first minimum wins. Dot zips to min(dim, centroid length)
    * — array_dot's zip semantics. */
  def assign(arr: ArrayData, norm: Double,
             cents: Array[Array[Double]], norms2: Array[Double]): Int = {
    val dim = arr.numElements()
    val u = new Array[Double](dim)
    var j = 0
    while (j < dim) { u(j) = arr.getDouble(j) / norm; j += 1 }
    var best = 0
    var bestD = Double.NaN
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val m = math.min(dim, c.length)
      var s = 0.0
      var k = 0
      while (k < m) { s += u(k) * c(k); k += 1 }
      val d = norms2(i) - 2.0 * s
      if (i == 0 || d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Per sub-space first-argmin over the unit vector's dSub-slice. */
  def encode(arr: ArrayData, norm: Double,
             books: Array[Array[Array[Double]]],
             norms2: Array[Array[Double]]): GenericArrayData = {
    val dim = arr.numElements()
    val u = new Array[Double](dim)
    var j = 0
    while (j < dim) { u(j) = arr.getDouble(j) / norm; j += 1 }
    val m = books.length
    val out = new Array[Int](m)
    var mm = 0
    var off = 0
    while (mm < m) {
      val cents = books(mm)
      val dSub = cents(0).length
      var best = 0
      var bestD = Double.NaN
      var i = 0
      while (i < cents.length) {
        val c = cents(i)
        val lim = math.min(dSub, math.max(0, dim - off))
        var s = 0.0
        var k = 0
        while (k < lim) { s += u(off + k) * c(k); k += 1 }
        val d = norms2(mm)(i) - 2.0 * s
        if (i == 0 || d < bestD) { bestD = d; best = i }
        i += 1
      }
      out(mm) = best
      off += dSub
      mm += 1
    }
    new GenericArrayData(out)
  }
}

/** Alias holder: keeps the generated-code call sites short. */
object PqEncodeHolder {
  def encode(arr: ArrayData, norm: Double,
             books: Array[Array[Array[Double]]],
             norms2: Array[Array[Double]]): GenericArrayData =
    IvfOps.encode(arr, norm, books, norms2)
}
