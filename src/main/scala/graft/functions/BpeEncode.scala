package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row BPE encode of a text column under a trained merge
  * list: each space-separated word's symbol sequence (characters +
  * `</w>`) is merged greedily — always the lowest-rank pair present,
  * leftmost occurrence on ties — until no learned pair remains. This is
  * the standard BPE apply algorithm (Sennrich et al. 2016, alg. 1),
  * bit-identical to [[graft.ops.Bpe.encodeUdf]] (the builtins-only
  * cross-check path, spec-asserted).
  *
  * Why native rather than a Scala UDF: encoding runs over every
  * document of the corpus — the tokenizer-apply scan IS the hot path of
  * a training-data export. A ScalaUDF is a per-row serialization
  * boundary that breaks whole-stage codegen around it; this expression
  * stays inside the generated stage (the merge table rides along as a
  * codegen reference object, built into a hash map once per executor,
  * not per row).
  *
  * `merges` carries the learned pairs in rank order, each entry
  * `left + " " + right` (unambiguous: symbols are substrings of
  * whitespace-split words plus the `</w>` marker, so none contains a
  * space).
  * NULL text yields NULL; the empty word contributes its bare `</w>`
  * symbol (same as the UDF's character-split of ""). */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  // built once per executor-side deserialized expression, shared by all
  // rows; HashMap (not Scala Map) so generated code calls straight in
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (pair, r) =>
      if (!m.containsKey(pair)) m.put(pair, r)
    }
    m
  }

  override def nullSafeEval(v: Any): Any =
    BpeEncode.compute(v.asInstanceOf[UTF8String], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.functions.BpeEncode.compute($t, $ranksRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  val Sep = " "
  private val EndOfWord = graft.ops.Bpe.EndOfWord

  /** Exposed for generated code. Greedy lowest-rank-first merge per word;
    * mirrors the UDF reference implementation exactly. */
  def compute(text: UTF8String,
              ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val words = text.toString.split(" ")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var syms = new java.util.ArrayList[String](w.length + 1)
      var ci = 0
      while (ci < w.length) { syms.add(String.valueOf(w.charAt(ci))); ci += 1 }
      syms.add(EndOfWord)
      var continue = true
      while (continue && syms.size > 1) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < syms.size - 1) {
          val r = ranks.get(syms.get(i) + Sep + syms.get(i + 1))
          if (r != null && r < bestRank) { bestRank = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) continue = false
        else {
          syms.set(bestAt, syms.get(bestAt) + syms.get(bestAt + 1))
          syms.remove(bestAt + 1)
        }
      }
      var si = 0
      while (si < syms.size) { out += UTF8String.fromString(syms.get(si)); si += 1 }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}
