package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING, Spark-first — the vocabulary
  * step every LLM data pipeline runs before token counting, packing, or
  * length bucketing means anything. No ML library: the corpus collapses
  * once into a (word, count) table, and each merge iteration is one
  * aggregation over that table — the same "Spark as a parameter server"
  * shape as [[Classify.trainLogistic]], with the driver holding only
  * the ordered merge list.
  *
  * Scale shape:
  *
  *  - the corpus is scanned ONCE ([[wordTable]]); training then runs on
  *    the word-frequency table, whose size is the corpus's distinct-word
  *    vocabulary (~10^8 rows at 100 TB — a distributed frame, never
  *    driver-side), not the corpus;
  *  - one merge iteration = adjacent-pair explode + groupBy-sum +
  *    `limit(1)` — partial aggregation does the heavy lifting and ONE
  *    row reaches the driver per iteration;
  *  - the winning merge is applied with a builtins-only left-to-right
  *    `aggregate` fold over each word's symbol array (greedy BPE
  *    semantics exactly), and the table is `localCheckpoint`ed per
  *    iteration so plan depth stays O(1) across hundreds of merges;
  *  - [[encode]] is map-side: the learned merge ranks broadcast as a
  *    plain Map, each partition encodes words with the standard
  *    lowest-rank-first algorithm, and nothing shuffles.
  *
  * Determinism: pair counts are exact longs and ties break on
  * (count desc, pair asc), so the learned vocabulary is bit-stable
  * across partitionings — golden-pinnable.
  *
  * Reference anchor: the reference has no tokenizer surface (its text
  * ops stop at whitespace splitting); north-star training-data scope.
  */
object Bpe {

  /** End-of-word sentinel: keeps a word-final symbol distinct from the
    * same string mid-word, the standard BPE trick. */
  val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String, count: Long) {
    def merged: String = left + right
  }
  final case class BpeModel(merges: Seq[Merge])

  /** One corpus scan → (syms array<string>, n) word-frequency table:
    * each distinct token becomes its character symbols + [[EndOfWord]].
    * Tokenization matches [[Text.tokens]] so the trained vocab serves
    * the same surface the token stats run on. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(split(col("w"), ""), array(lit(EndOfWord))).as("syms"),
        col("n"))

  /** Adjacent symbol pairs of one row, weighted by the word count:
    * struct(left, right) per position. A fully-merged word (one symbol)
    * has no pairs — guarded, because `sequence(0, -1)` DESCENDS rather
    * than yielding empty. */
  private def adjacentPairs: Column =
    when(size(col("syms")) >= 2,
      transform(sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("left"),
          element_at(col("syms"), i + 1 + 1).as("right"))))
      .otherwise(array().cast("array<struct<left:string,right:string>>"))

  /** Greedy left-to-right application of one merge to a symbol array —
    * the `aggregate` fold IS BPE's merge semantics: a freshly merged
    * symbol can immediately merge again only if it equals `left`, which
    * comparing the accumulator's tail reproduces. */
  private def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0
          && element_at(acc, -1) === lit(left) && s === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(s))))

  /** Learn `nMerges` merges. Stops early when no adjacent pair occurs
    * at least `minCount` times. One aggregation job per merge; the
    * driver sees one row each. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L): BpeModel = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    var words = wordTable(df, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = words
        .select(explode(adjacentPairs).as("p"), col("n"))
        .groupBy(col("p.left"), col("p.right"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      top.headOption.filter(_.getAs[Long]("cnt") >= minCount) match {
        case None => done = true
        case Some(r) =>
          val m = Merge(rank, r.getAs[String]("left"), r.getAs[String]("right"),
            r.getAs[Long]("cnt"))
          merges += m
          val next = words
            .select(applyMerge(col("syms"), m.left, m.right).as("syms"), col("n"))
            .localCheckpoint(true)
          words.unpersist(blocking = false)
          words = next
          rank += 1
      }
    }
    words.unpersist(blocking = false)
    BpeModel(merges.result())
  }

  /** The learned vocabulary as a frame: (rank, left, right, merged,
    * pair_count) — what q83 golden-pins. */
  def mergeTable(df: DataFrame, textCol: String, nMerges: Int,
                 minCount: Long = 2L, memo: Boolean = true): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val model = trainedModel(df, textCol, nMerges, minCount, memo)
    model.merges.map(m => (m.rank, m.left, m.right, m.merged, m.count))
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** The memoized train-once path behind [[mergeTable]] (keyed like the
    * IVF cache: canonicalized corpus plan + hyperparameters), exposed so
    * [[encode]] callers reuse the same fitted model instead of paying
    * the merge loop per query. */
  def trainedModel(df: DataFrame, textCol: String, nMerges: Int,
                   minCount: Long = 2L, memo: Boolean = true): BpeModel = {
    val key = (df.queryExecution.analyzed.canonicalized.semanticHash(),
      textCol, nMerges, minCount)
    if (memo) modelMemo.computeIfAbsent(key, _ => train(df, textCol, nMerges, minCount))
    else train(df, textCol, nMerges, minCount)
  }

  /** Map-side BPE encode of a text column under a trained model: each
    * word's symbols merge lowest-rank-first (the standard encode
    * algorithm). Output column `bpe_tokens` (array<string>).
    *
    * Computed by the native [[graft.functions.BpeEncode]] expression
    * (whole-stage-codegen resident; the rank map rides along as a
    * codegen reference object) — the tokenizer-apply scan is the hot
    * path of a training-data export, so it must not carry a ScalaUDF
    * serialization boundary. [[encodeUdf]] is the builtins-only
    * reference implementation; BpeSpec asserts bit equality. */
  def encode(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("bpe_tokens",
      call_function("bpe_encode", col(textCol),
        lit(model.merges.map(m => m.left + " " + m.right).toArray)))
  }

  /** The ScalaUDF reference form of [[encode]] — kept as the cross-check
    * path for the native expression, never on the query surface. */
  private[graft] def encodeUdf(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    val s = df.sparkSession
    val ranks: Map[(String, String), Int] =
      model.merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = s.sparkContext.broadcast(ranks)
    val enc = udf { text: String =>
      if (text == null) null
      else text.split(" ").toSeq.flatMap { w =>
        var syms = (w.map(_.toString) :+ EndOfWord).toVector
        var continue = true
        while (continue && syms.length > 1) {
          // lowest-rank pair present in the word, leftmost occurrence
          var bestRank = Int.MaxValue; var bestAt = -1
          var i = 0
          while (i < syms.length - 1) {
            val r = bc.value.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestRank) { bestRank = r; bestAt = i }
            i += 1
          }
          if (bestAt < 0) continue = false
          else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
            syms.drop(bestAt + 2)
        }
        syms
      }
    }
    df.withColumn("bpe_tokens", enc(col(textCol)))
  }

  private val modelMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int, Long), BpeModel]()
}
