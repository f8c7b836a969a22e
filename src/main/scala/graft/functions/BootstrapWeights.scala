package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row Poisson-bootstrap weight vector: for replicate
  * k ∈ [0, b), the weight is the Poisson(1) inverse CDF applied to the
  * seed-salted md5-uniform of `"bs <seed> <k> <id>"` — bit-identical to
  * the composed form
  * `Shard.orderKey(concat_ws(" ", lit(seed), col("rep"), id), "bs")`
  * pushed through the [[graft.ops.Sampling.poisson1Cum]] thresholds
  * after `explode(sequence(0, b-1))`.
  *
  * Why native: the composed form multiplies the corpus by b BEFORE
  * hashing — b·N rows flow through a projection whose per-row work is an
  * md5 over a freshly concatenated string, a hex `substring`, and a
  * string-parsing `conv(hex, 16, 10)` (three UTF8String allocations per
  * replicate per row). This expression computes all b weights in ONE
  * map-side call per row: the digest is thread-local, the "<k> " rep
  * prefixes are precomputed per b, the 60-bit order key is assembled
  * from the raw digest bytes (no hex round-trip), and the output is one
  * primitive long array. The b·N row expansion then happens AFTER the
  * hash work as a cheap `posexplode` of an in-memory array feeding a
  * map-side partial aggregate — at 100 TB the difference between b
  * string-hash projections of the corpus and one.
  *
  * Value contract (pinned by BootstrapWeightsSpec against the composed
  * form, and by the q126 DuckDB oracle which replays the identical
  * draw): md5 over UTF-8 "bs <seed> <k> <id>", first 15 hex nibbles as
  * a 60-bit integer v, u = (v + 0.5) / 2^60, weight = #{thresholds
  * < u} capped at 6.
  */
case class BootstrapWeights(child: Expression, seed: String, b: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if b > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and b > 0, got " +
        s"${child.dataType.simpleString} with b=$b")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bootstrap_weights"

  // "bs <seed> " — the constant head of every hashed string
  private lazy val prefixBytes: Array[Byte] =
    ("bs " + seed + " ").getBytes("UTF-8")

  override def nullSafeEval(v: Any): Any =
    BootstrapWeights.compute(v.asInstanceOf[UTF8String], prefixBytes, b)

  /** One static-call site inside whole-stage codegen; the prefix bytes
    * ride along as a referenced object, not generated-source literals. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("bsPrefix", prefixBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.BootstrapWeights.compute($a, $prefixRef, $b);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BootstrapWeights {

  /** Cumulative Poisson(1) thresholds — MUST stay literal-identical to
    * [[graft.ops.Sampling.poisson1Cum]] (cross-pinned by
    * BootstrapWeightsSpec) and to the q126 oracle SQL. */
  private val cum: Array[Double] = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** "<k> " byte strings for replicate indices, computed once per b —
    * never per row (b is an analysis-time literal, so the map stays tiny). */
  private val repCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()
  private def repBytes(b: Int): Array[Array[Byte]] =
    repCache.computeIfAbsent(b, n =>
      Array.tabulate(n)(k => (k.toString + " ").getBytes("UTF-8")))

  /** Exposed for generated code. */
  def compute(id: UTF8String, prefix: Array[Byte], b: Int): GenericArrayData = {
    val md = md5Local.get()
    val reps = repBytes(b)
    val idBytes = id.getBytes
    val out = new Array[Long](b)
    var k = 0
    while (k < b) {
      md.reset()
      md.update(prefix)
      md.update(reps(k))
      md.update(idBytes)
      val h = md.digest()
      // first 15 hex nibbles of the digest = bytes 0..6 in full plus the
      // HIGH nibble of byte 7 — exactly conv(substring(hex, 1, 15), 16, 10)
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
      v = (v << 4) | ((h(7) & 0xf0L) >>> 4)
      val u = (v + 0.5) / 1152921504606846976.0 // 2^60
      var w = 0
      while (w < 6 && u >= cum(w)) w += 1
      out(k) = w.toLong
      k += 1
    }
    new GenericArrayData(out)
  }
}
