package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native banded sign-LSH bucket ids: for an `array<double>` embedding,
  * the `tables` bucket ids of the classic r-rows × L-tables scheme — bit
  * i of table t's bucket = (emb · plane_{t·rows+i} > 0), planes drawn
  * from [[graft.ops.Similarity.hyperplanes]]'s seeded xorshift stream
  * (bit-identical to the composed
  * `array(tables × Σ_i when(array_dot(emb, plane) > 0, 1L<<i))` form —
  * LshBucketsSpec pins the equality).
  *
  * Why native: the composed form is rows×tables separate dot-product
  * subtrees — at the corpus-scaled table counts the round-15 recall
  * floors demand (r≈6 × L≈30 at sf1 → 180 plane literals), plan
  * compilation alone dominated the query (measured ~7–15 s per banded
  * call in the parameter grid). This expression evaluates all planes in
  * one primitive loop over a memoized flat plane matrix: no literal
  * trees, no per-plane codegen, one map-side call per row.
  *
  * Plane memoization is keyed (rows·tables, dim, seed); the matrix is a
  * pure function of the key, so concurrent compute is idempotent. The
  * embedding dimension is read per row — mixed-dim corpora would bucket
  * per their own dim (the composed form pins dim from one sampled row
  * instead; real corpora are fixed-dim and the two agree). */
case class LshBuckets(child: Expression, rows: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if rows > 0 && rows <= 63 && tables > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, 0 < rows <= 63 and " +
        s"tables > 0; got ${child.dataType.simpleString}, rows=$rows, tables=$tables")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(v: Any): Any =
    LshBuckets.compute(v.asInstanceOf[ArrayData], rows, tables)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.LshBuckets.compute($a, $rows, $tables);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  /** Flat row-major plane matrix per (nPlanes, dim): the same seeded
    * stream as Similarity.hyperplanes(nPlanes, dim) (seed 42), flattened
    * for cache-friendly dot loops. Idempotent to race. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def planes(nPlanes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((nPlanes, dim), _ => {
      var s = 42L
      val out = new Array[Double](nPlanes * dim)
      var i = 0
      while (i < out.length) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
        i += 1
      }
      out
    })

  /** Exposed for generated code. */
  def compute(arr: ArrayData, rows: Int, tables: Int): GenericArrayData = {
    val dim = arr.numElements()
    val emb = arr.toDoubleArray()
    val p = planes(rows * tables, dim)
    val out = new Array[Long](tables)
    var plane = 0
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < rows) {
        var s = 0.0
        var j = 0
        val off = plane * dim
        while (j < dim) { s += emb(j) * p(off + j); j += 1 }
        if (s > 0.0) bucket |= (1L << i)
        plane += 1
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
