package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-row MinHash signature over an array<string> shingle column:
  * k minima of `xxhash64(shingle, i)` for i in 0 until k, bit-identical to
  * the composed form `min(xxhash64(col, lit(i)))` after explode
  * (seed-chaining replicated: string hashed with seed 42, then the
  * constant i folded in with one integer round).
  *
  * Why native: the composed form evaluates `xxhash64(sh, lit(i))` from
  * scratch for each of the k aggregates — the string (the expensive part)
  * is hashed k times per shingle, and the whole computation needs an
  * explode plus a k-wide partial-aggregate shuffle. This expression hashes
  * each string ONCE, applies k cheap integer finalizations, and emits the
  * signature as a map-side projection — no explode, no shuffle, ~k× less
  * hash work. At 100 TB this is the difference between a scan and a
  * shuffle stage per signature build.
  *
  * Empty arrays yield NULL (the explode form simply produces no rows for
  * such documents — callers filter `isNotNull` to match). Elements are
  * assumed non-null (shingles of non-null text).
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument and k > 0, got " +
        s"${child.dataType.simpleString} with k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], k)

  /** Stays inside whole-stage codegen by calling the compiled helper — the
    * generated code is one static-call site, not an interpreted fallback. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinHashSignature.compute($a, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Exposed for generated code. Returns null for an empty array. */
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native per-row winnowing fingerprints (Schleimer et al., SIGMOD'03)
  * over an array<string> k-gram column: hash every k-gram (xxhash64
  * semantics, seed 42), slide a window of `w` hashes keeping each
  * window's minimum, return the distinct minima. Matches the
  * posexplode + sliding-min-window formulation bit-for-bit, including
  * the short-document rule (fewer than `w` k-grams → the single global
  * minimum) — but as a map-side projection: the windowed form shuffles
  * every k-gram row by document to order the window frames; this touches
  * nothing but the row. Empty arrays yield NULL (the exploded form emits
  * no rows). Elements are assumed non-null (k-grams of non-null text). */
case class WinnowFingerprints(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument and w > 0, got " +
        s"${child.dataType.simpleString} with w=$w")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.compute(v.asInstanceOf[ArrayData], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.WinnowFingerprints.compute($a, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Exposed for generated code. Returns null for an empty array. */
  def compute(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L); i += 1 }
    // primitive minima buffer, then in-place sort + dedup — no boxing,
    // no per-row tree (consecutive windows mostly share their minimum)
    val minima = new Array[Long](if (n < w) 1 else n - w + 1)
    if (n < w) {
      var m = h(0); i = 1
      while (i < n) { if (h(i) < m) m = h(i); i += 1 }
      minima(0) = m
    } else {
      // O(n·w) sliding min — w is a small constant (4 by default)
      var start = 0
      while (start <= n - w) {
        var m = h(start)
        var j = start + 1
        while (j < start + w) { if (h(j) < m) m = h(j); j += 1 }
        minima(start) = m
        start += 1
      }
    }
    java.util.Arrays.sort(minima)
    var distinct = 0
    i = 0
    while (i < minima.length) {
      if (i == 0 || minima(i) != minima(i - 1)) { minima(distinct) = minima(i); distinct += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(minima, distinct))
  }
}

/** Native per-row 64-bit SimHash over an array<string> token column:
  * bit-identical to the explode + 64-sign-sum aggregation form (token
  * hashed once with seed 42; counter sign convention `(h>>j & 1)*2 − 1`,
  * bit set when the counter is strictly positive). Same rationale as
  * [[MinHashSignature]]: one string hash + 64 integer updates per token,
  * map-side, no explode/shuffle. Empty arrays yield NULL. */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null else SimHashSignature.compute(a)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $arr = $a;
         |if ($arr.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SimHashSignature.compute($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native max-occurrence count over an array<string>: the count of the
  * most frequent element (the numerator of Gopher's top-n-gram coverage),
  * one hashmap pass per row. The built-in alternatives are quadratic
  * (per-distinct `filter` counts) or an interpreted struct-state fold over
  * a sort — both measured much slower at corpus scale. Empty → 0. */
case class ArrayTopCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_top_count"

  override def nullSafeEval(v: Any): Any =
    ArrayTopCount.compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ArrayTopCount.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayTopCount {
  /** Exposed for generated code. */
  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2)
    var best = 0
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val c = counts.merge(s, 1, (x: Integer, y: Integer) => x + y)
      if (c > best) best = c
      j += 1
    }
    best
  }
}

/** Native per-row unigram entropy over an array<string> token column:
  * −Σ p·ln(p) over the token distribution. Bit-identical to the
  * HOF formulation in `Text.tokenEntropy` — counts accumulate in ONE
  * hashmap pass, then per-term contributions are summed in SORTED term
  * order with the same (c/n)·ln(c/n) arithmetic, because IEEE addition
  * is order-sensitive and the DuckDB oracle folds over the sorted
  * distinct-token list. The HOF form is O(|distinct|·n) lambda
  * dispatches per row (2.2 s at sf0.1); this is one pass + one sort of
  * the distinct terms. Empty arrays yield −0.0 — the negation of the
  * empty fold, bit-matching the HOF form (tokens of any non-null text
  * are never empty, so this is unreachable in practice). NULL elements
  * are skipped (entropy of the present tokens): unreachable from
  * `Text.tokens`, but the function is on the SQL surface and
  * `token_entropy(array('a', NULL))` must not throw. */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_entropy"

  override def nullSafeEval(v: Any): Any =
    TokenEntropy.compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenEntropy.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenEntropy {
  /** Exposed for generated code. */
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2 + 1)
    var j = 0
    var present = 0
    while (j < n) {
      // skip NULL elements: Arrays.sort's natural-order comparator (and
      // the p computation) would NPE on a null key
      val t = arr.getUTF8String(j)
      if (t != null) {
        counts.merge(t, 1, (x: Integer, y: Integer) => x + y)
        present += 1
      }
      j += 1
    }
    // sorted-term fold: UTF8String's binary comparator is exactly the
    // ordering array_sort applies to strings, so the summation order —
    // and therefore every low bit — matches the HOF/oracle formulation
    val terms = counts.keySet().toArray(new Array[org.apache.spark.unsafe.types.UTF8String](0))
    java.util.Arrays.sort(terms,
      java.util.Comparator.naturalOrder[org.apache.spark.unsafe.types.UTF8String]())
    val dn = present.toDouble
    var acc = 0.0
    var i = 0
    while (i < terms.length) {
      val p = counts.get(terms(i)).doubleValue() / dn
      acc += p * math.log(p)
      i += 1
    }
    -acc
  }
}

object SimHashSignature {
  /** Exposed for generated code. Caller guards the empty case. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        counters(b) += (((h >>> b) & 1L).toInt * 2) - 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Native per-row n-gram hash set: the DISTINCT `xxhash64(n, ngram)`
  * values of a token array's word n-grams (space-joined), bit-identical
  * to the composed form
  * `array_distinct(transform(shingles, x => xxhash64(lit(n), x)))` over
  * [[graft.ops.Text.shingles]] — seed chaining replicated exactly
  * (42 → hashInt(n) → hashUnsafeBytes over the joined UTF-8 bytes).
  *
  * Why native: the composed shingle build is a chain of n−1 `zip_with`
  * + `concat` higher-order functions — every level materializes an
  * intermediate array of progressively longer strings, O(n²) string
  * bytes per document, and it runs once per requested n. Profiled on the
  * q265 decontamination sweep it was the dominant cost (the explode
  * projection alone: 4.5 s warm at sf1 for a 50 k-doc corpus). This
  * expression builds each n-gram's bytes once in a reusable buffer,
  * hashes in place, and dedups primitively — no intermediate arrays, no
  * string allocation, one map-side call per (row, n).
  *
  * Fewer than n tokens yields an EMPTY array (the composed form's
  * `when(size < n, array())` branch), so `explode` drops the row either
  * way. First-occurrence order preserved, matching `array_distinct`. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument and n > 0, got " +
        s"${child.dataType.simpleString} with n=$n")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(v: Any): Any =
    NgramHashes.compute(v.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.NgramHashes.compute($a, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashes {
  private val empty = new GenericArrayData(new Array[Long](0))

  /** Exposed for generated code. */
  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    if (len < n) return empty
    // token bytes once per row; n-gram bytes assembled in one reusable
    // buffer (tokens joined by ' ' — UTF-8-safe, space is 1 byte).
    // A NULL token is legal (ArrayType(..., containsNull=true) is
    // accepted): in the composed form every shingle containing it
    // concat-nulls, and xxhash64(lit(n), null) skips the null child —
    // the hash degrades to the seed. Mirror that exactly: a window
    // with any null token hashes to `seed`, never an NPE.
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val seed = XXH64.hashInt(n, 42L) // xxhash64(lit(n), x) chaining
    val m = len - n + 1
    val out = new Array[Long](m)
    var distinct = 0
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    var buf = new Array[Byte](64)
    var p = 0
    while (p < m) {
      var need = n - 1
      var hasNull = false
      var j = p
      while (j < p + n) {
        if (toks(j) == null) hasNull = true else need += toks(j).length
        j += 1
      }
      if (hasNull) {
        if (seen.add(seed)) { out(distinct) = seed; distinct += 1 }
      } else {
        if (need > buf.length) buf = new Array[Byte](math.max(need, buf.length * 2))
        var at = 0
        j = p
        while (j < p + n) {
          if (j > p) { buf(at) = ' '; at += 1 }
          System.arraycopy(toks(j), 0, buf, at, toks(j).length)
          at += toks(j).length
          j += 1
        }
        val h = XXH64.hashUnsafeBytes(
          buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, at, seed)
        if (seen.add(h)) { out(distinct) = h; distinct += 1 }
      }
      p += 1
    }
    if (distinct == m) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, distinct))
  }
}
