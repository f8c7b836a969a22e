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
  *  - one driver round = adjacent-pair explode + groupBy-sum +
  *    `limit(maxBatch)` — partial aggregation does the heavy lifting and
  *    at most `maxBatch` rows reach the driver; the greedy-equivalent
  *    prefix of them ([[selectBatch]]) applies in ONE projection, so a
  *    non-chaining vocabulary learns ~`maxBatch` merges per corpus-table
  *    scan instead of one (the learned model is identical either way —
  *    the memo key deliberately omits `maxBatch`);
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
    FanOut.perRowCompute(df, col(textCol))
      .select(explode(Text.tokens(col(textCol))).as("w"))
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

  /** Greedy-equivalent batch selection: walk the (count desc, pair asc)
    * sorted snapshot and keep a PREFIX, stopping at the first pair that
    * (a) drops below `minCount`, or (b) shares a symbol with any
    * already-selected merge — including the selected merges' OUTPUT
    * strings, which can collide with a pre-existing symbol. The kept
    * prefix is then truncated to pairs with count STRICTLY ABOVE the
    * stop boundary (the first overlapping pair's count, or the last
    * seen count when the `limit` was exhausted with unseen pairs
    * behind it); an empty truncation falls back to the head pair,
    * which is always the exact sequential step.
    *
    * Why this reproduces the sequential greedy sequence EXACTLY:
    * applying a merge only changes the counts of pairs sharing one of
    * its symbols, and every pair newly created by merge (l,r)→lr has
    * count ≤ the snapshot count of some pair containing l or r (each
    * (x,lr) occurrence was an (x,l) occurrence). Any such source pair
    * with count above the stop boundary would sort before the stop and
    * have halted the walk as the first overlap — contradiction — so
    * every overlapping source, and hence every created pair, has count
    * ≤ boundary < every kept pair's count: nothing created mid-batch
    * can outrank or TIE a kept pair. Pairs below `minCount` (and
    * anything beyond an exhausted complete listing) are strictly
    * smaller than every kept count, so they need no boundary.
    * BpeSpec pins batched ≡ sequential on chaining- and
    * tie-adversarial corpora. */
  private[graft] def selectBatch(rows: Seq[Merge], minCount: Long,
                                 limitWasHit: Boolean = false): Seq[Merge] = {
    val used = scala.collection.mutable.Set.empty[String]
    var out = Vector.empty[Merge]
    var boundary: Option[Long] = None
    var halted = false
    for (m <- rows if !halted) {
      if (m.count < minCount) halted = true
      else if (used(m.left) || used(m.right) || used(m.merged)) {
        boundary = Some(m.count); halted = true
      } else { out :+= m; used ++= Seq(m.left, m.right, m.merged) }
    }
    if (!halted && limitWasHit && rows.nonEmpty)
      boundary = Some(rows.last.count) // unseen pairs may tie the tail
    boundary match {
      case Some(c) =>
        val kept = out.takeWhile(_.count > c)
        if (kept.nonEmpty) kept else out.take(1)
      case None => out
    }
  }

  /** Observable scan count — lets specs assert the batching actually
    * cuts driver rounds. */
  private[graft] val trainScanCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Learn `nMerges` merges. Stops early when no adjacent pair occurs
    * at least `minCount` times.
    *
    * Each driver round is ONE aggregation job returning up to `maxBatch`
    * rows, from which [[selectBatch]] keeps the greedy-equivalent prefix
    * — all of it applied in a single projection (the per-merge folds
    * compose, and symbol-disjointness makes the composition equal to
    * sequential table-wide application). Non-chaining vocabularies batch
    * near `maxBatch` merges per scan, collapsing the 50-round loop to a
    * handful of jobs; a fully-chaining corpus degrades gracefully to the
    * old one-merge-per-scan behavior (`maxBatch = 1` forces it). */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L, maxBatch: Int = 16): BpeModel = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    require(maxBatch > 0, s"maxBatch must be positive: $maxBatch")
    var words = wordTable(df, textCol).localCheckpoint(true)
    var ckpt: Option[DataFrame] = Some(words)
    var roundsSinceCkpt = 0
    // Size-adaptive layout: the training loop's per-round cost is task
    // scheduling, not compute — a distinct-word table far smaller than
    // one row group spread over the session's default parallelism pays
    // ~50 rounds × dozens of empty tasks for nothing. Pack it into the
    // fewest partitions that keep ~64k words each (a 100 TB corpus's
    // ~10^8-word vocabulary still spans the cluster; a bench corpus
    // collapses to one task per round). The count is free: the frame was
    // just checkpoint-materialized.
    val nWords = words.count()
    val targetParts = math.max(1L, math.min(
      words.rdd.getNumPartitions.toLong, nWords / 65536L + 1L)).toInt
    if (targetParts < words.rdd.getNumPartitions) {
      val packed = words.repartition(targetParts).localCheckpoint(true)
      ckpt.foreach(_.unpersist(blocking = false))
      ckpt = Some(packed)
      words = packed
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    // AQE off for the merge loop only: every round's pair-count is a
    // fixed-shape aggregation over the (small, already-packed) word
    // table, and AQE's per-job stage materialization adds two scheduling
    // round-trips with nothing to re-plan — measured 6.0 s → 3.9 s over
    // 50 merges at sf0.1. The corpus scan in [[wordTable]] above runs
    // BEFORE the toggle, so the one genuinely large job keeps AQE. The
    // session-conf mutation is restored in `finally`; the loop is
    // driver-coordinated and sequential by nature, same posture as the
    // `nanosAsLong` conf in Tables.
    val s = df.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    try {
    while (rank < nMerges && !done) {
      trainScanCount.incrementAndGet()
      val lim = math.min(maxBatch, nMerges - rank)
      val top = words
        .select(explode(adjacentPairs).as("p"), col("n"))
        .groupBy(col("p.left"), col("p.right"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(lim).collect()
      val batch = selectBatch(
        top.toSeq.map(r => Merge(0, r.getAs[String]("left"),
          r.getAs[String]("right"), r.getAs[Long]("cnt"))), minCount,
        limitWasHit = top.length == lim)
        .zipWithIndex.map { case (m, i) => m.copy(rank = rank + i) }
      if (batch.isEmpty) done = true
      else {
        merges ++= batch
        words = words
          .select(batch.foldLeft(col("syms"))((c, m) =>
            applyMerge(c, m.left, m.right)).as("syms"), col("n"))
        rank += batch.length
        // Checkpoint every few rounds, not every round: the eager
        // localCheckpoint is a full job, and on a bench-sized word table
        // job-scheduling latency IS the round cost. A handful of stacked
        // fold projections keeps plan depth O(1) per checkpoint while
        // halving the jobs per round.
        roundsSinceCkpt += 1
        if (roundsSinceCkpt >= CkptEvery) {
          val next = words.localCheckpoint(true)
          ckpt.foreach(_.unpersist(blocking = false))
          ckpt = Some(next)
          words = next
          roundsSinceCkpt = 0
        }
      }
    }
    } finally s.conf.set(aqeKey, aqeWas)
    ckpt.foreach(_.unpersist(blocking = false))
    BpeModel(merges.result())
  }
  private val CkptEvery = 4

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
    // same wholesale-clear bound as the IVF/route memos: a long-lived
    // driver training many distinct corpora must not accumulate models
    if (modelMemo.size() > ModelMemoMax) modelMemo.clear()
    if (memo) modelMemo.computeIfAbsent(key, _ => train(df, textCol, nMerges, minCount))
    else train(df, textCol, nMerges, minCount)
  }
  private val ModelMemoMax = 64

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
    FanOut.perRowCompute(df, col(textCol)).withColumn("bpe_tokens",
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
