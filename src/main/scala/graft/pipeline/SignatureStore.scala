package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The accumulating MinHash signature store behind
  * [[CurationStream.startNearDup]]: the dedup horizon that outlives the
  * streaming checkpoint.
  *
  * Layout (all under one root):
  * {{{
  *   <store>/delta/batch=<seq>/  one dir per micro-batch since the last
  *                               compaction (written with overwrite, so a
  *                               replayed batch is idempotent on the store)
  *   <store>/gen-<n>/bucket=<b>/ compacted generation n, hash-partitioned
  *                               on the probe join key (band_id, band_hash)
  *   <store>/_ptr/v<n>           pointers; the LIVE pointer is the max n
  *                               ("maxBatch buckets g1,...,gn" inside —
  *                               the TIER LIST of live generations; see
  *                               [[compact]] for minor/major tiering)
  *   <store>/_runs/<runTag>      epoch registry: one file per checkpoint
  *                               lineage that ever wrote this store
  * }}}
  *
  * Batch identity is LINEAGE-SCOPED: micro-batch ids are only unique
  * within one streaming checkpoint, so a stream restarted against the
  * same store with a FRESH checkpoint restarts them at 0 — raw ids would
  * overwrite `delta/batch=0` (losing the prior run's signatures) and the
  * probe's `batch < current` replay guard would hide every surviving
  * prior-run row, silently admitting near-duplicates of already-admitted
  * documents. Instead each run registers an epoch ([[registerRun]], keyed
  * by the run's [[IdempotentSink.tagFor]] tag and monotonic across runs)
  * and stores ordinals `seq = epoch << 40 | batchId` ([[seqOf]]): stable
  * under replay within a lineage (same dir overwritten), strictly above
  * every prior lineage's ordinals across them (prior rows stay visible as
  * references, nothing is overwritten). Stores written before the epoch
  * scheme hold raw-id dirs, which sort below every epoch ≥ 1 ordinal —
  * their rows stay visible and are never overwritten either.
  *
  * A long-running stream accumulates one small parquet dir per micro-batch
  * — the classic small-files/listing-cost trap. [[compact]] folds the
  * deltas into a new `gen-<n>` directory partitioned by a hash bucket of
  * the join key, so a probe that knows its candidate buckets scans only
  * those directories (static partition pruning) instead of the whole
  * store. Pointer publication is by CREATING `_ptr/v<n+1>` — a single
  * atomic file create, no delete/rename race: a reader always sees either
  * the old pointer set or the new one, and a crash mid-compaction leaves
  * the previous generation live with all deltas intact.
  *
  * Replay safety: rows keep their `batch` column through compaction, so
  * the probe's `batch < currentBatchId` guard holds even when a crashed
  * (uncommitted) batch's rows were already absorbed into a generation. If
  * that batch then replays, its delta dir is rewritten and its rows exist
  * twice (generation + delta) until the next compaction — harmless to the
  * probe, whose pair generation deduplicates on (doc_id, ref_id), and
  * collapsed by the next [[compact]]'s exact-row dedup.
  *
  * [[vacuum]] (separate from [[compact]], so a concurrent probe holding
  * the old file listing never has files deleted out from under it) drops
  * absorbed deltas and superseded generations; run it with a grace period
  * after compaction, exactly like log-structured table formats do.
  */
private[graft] object SignatureStore {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("band_id", IntegerType),
    StructField("band_hash", LongType),
    StructField("batch", LongType)))

  private val compactedSchema: StructType =
    StructType(schema.fields :+ StructField("bucket", IntegerType))

  /** Live compacted state: the `gens` TIER LIST (oldest → newest
    * `gen-<g>` dirs, all hash-partitioned into the same `buckets` bucket
    * count) together covers every batch id ≤ maxBatch. `gen` is the
    * newest tier (= this pointer's version number). A single-generation
    * store is the `gens.size == 1` special case; pre-tiering pointers
    * parse to exactly that. */
  final case class Pointer(gen: Long, maxBatch: Long, buckets: Int,
                           gens: Seq[Long]) {
    require(gens.nonEmpty && gens.last == gen, s"pointer tiers corrupt: $this")
  }

  /** Bucket of a probe join key. Must match between compaction writes and
    * probe pruning — single definition, parameterized only by the bucket
    * count recorded in the generation's pointer. */
  def bucketOf(bandId: Column, bandHash: Column, buckets: Int): Column =
    pmod(xxhash64(bandId, bandHash), lit(buckets.toLong)).cast("int")

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  def ensure(spark: SparkSession, store: String): Unit =
    PipelineFs.ensureDir(spark, s"$store/delta")

  /** Register (or look up) this checkpoint lineage's epoch: the first
    * run against a store gets 1, each new lineage gets max+1, and a
    * RESTART of the NEWEST lineage gets its existing epoch back — so
    * replayed batches land on their original ordinals.
    *
    * A restarted lineage whose stored epoch is no longer the registry
    * max does NOT get it back: a newer lineage has compacted/advanced
    * the pointer past this epoch's ordinal range, so new batches written
    * under the old epoch would sit at `seq <= pointer.maxBatch` —
    * invisible to [[refs]]'s delta filter, skipped by [[compact]], and
    * deleted by the next [[vacuum]] (silent signature loss). Such a
    * lineage is RE-REGISTERED above the max instead. The only cost is
    * that its one in-flight replayed batch lands under a fresh ordinal
    * next to its orphaned original rows — harmless, because the probe's
    * pair output deduplicates on (doc_id, ref_id) and self-pairs are
    * guarded out.
    *
    * Same-tag create races stay benign (the loser re-reads the winner's
    * file). Distinct fresh lineages that race past each other's create
    * can both claim one epoch; [[registerRun]] re-lists after publishing
    * and settles duplicates deterministically — the lexicographically
    * first tag keeps the epoch, every other holder re-publishes above
    * the registry max — so the race degrades to a retry, not to two
    * lineages silently overwriting each other's `delta/batch=<seq>`
    * dirs. (Two distinct lineages writing one store CONCURRENTLY is
    * still outside the contract — same as any single-writer table
    * format — but registration itself no longer loses data.) */
  def registerRun(spark: SparkSession, store: String, runTag: String): Long = {
    val f = fs(spark, store)
    val dir = new org.apache.hadoop.fs.Path(s"$store/_runs")
    f.mkdirs(dir)
    val myName = runTag.stripSuffix("-")
    val mine = new org.apache.hadoop.fs.Path(dir, myName)
    def read(p: org.apache.hadoop.fs.Path): Long = {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    def registry(): Map[String, Long] =
      f.listStatus(dir).toSeq.map(s => s.getPath.getName -> read(s.getPath)).toMap
    def publish(epoch: Long, overwrite: Boolean): Boolean =
      try {
        val out = f.create(mine, overwrite)
        try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    // settle a duplicate epoch left by a concurrent-register race: the
    // lexicographically-first tag keeps it (both sides agree on the
    // tie-break without coordination), everyone else re-publishes above
    // the registry max until unique
    @annotation.tailrec
    def settle(myEpoch: Long): Long = {
      val all = registry()
      val clash = all.exists { case (tag, e) =>
        tag != myName && e == myEpoch && tag < myName }
      if (!clash) myEpoch
      else { val next = all.values.max + 1; publish(next, overwrite = true); settle(next) }
    }
    if (f.exists(mine)) {
      val stored = read(mine)
      val othersMax = (registry() - myName).values.maxOption.getOrElse(0L)
      if (stored > othersMax) return stored // newest lineage: replay-stable resume
      val fresh = othersMax + 1             // stale (or duplicated) epoch: re-register
      publish(fresh, overwrite = true)
      return settle(fresh)
    }
    val next = (registry().values.toSeq :+ 0L).max + 1
    if (publish(next, overwrite = false)) settle(next)
    else read(mine) // lost the same-tag create race: the winner's epoch is ours
  }

  /** Store ordinal of (run epoch, micro-batch id): monotonic across
    * checkpoint lineages, stable under replay within one. 40 bits of
    * batch id (a trillion micro-batches per run) under 23 bits of epoch
    * — both overflow-guarded rather than silently wrapped. */
  def seqOf(epoch: Long, batchId: Long): Long = {
    require(epoch > 0 && epoch < (1L << 23) && batchId >= 0 && batchId < (1L << 40),
      s"store ordinal out of range: epoch=$epoch batch=$batchId")
    (epoch << 40) | batchId
  }

  def currentPointer(spark: SparkSession, store: String): Option[Pointer] = {
    val dir = new org.apache.hadoop.fs.Path(s"$store/_ptr")
    val f = fs(spark, store)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).toSeq
      .flatMap(s => "^v(\\d+)$".r.findFirstMatchIn(s.getPath.getName).map(_.group(1).toLong))
    versions.maxOption.map { gen =>
      val in = f.open(new org.apache.hadoop.fs.Path(s"$store/_ptr/v$gen"))
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                    finally in.close()
      // "maxBatch buckets [g1,g2,...]" — the tier list is absent in
      // pre-tiering pointers (single live generation = this version)
      val parts = content.split("\\s+")
      val gens =
        if (parts.length > 2) parts(2).split(",").toSeq.map(_.toLong)
        else Seq(gen)
      Pointer(gen, parts(0).toLong, parts(1).toInt, gens)
    }
  }

  /** Append one micro-batch's survivor bucket rows under its
    * lineage-scoped ordinal (see [[seqOf]]). Overwrite into the
    * seq-keyed dir keeps a replayed batch idempotent. */
  def appendBatch(rows: DataFrame, store: String, seq: Long): Unit =
    rows.select(col("doc_id"), col("sig"), col("band_id"), col("band_hash"))
      .write.mode("overwrite").parquet(s"$store/delta/batch=$seq")

  private def deltas(spark: SparkSession, store: String): DataFrame =
    spark.read.schema(schema).parquet(s"$store/delta")

  /** Reference rows visible to probe batch `beforeBatch`: the live
    * generation (pruned to `candidateBuckets` when given — static
    * partition pruning against the bucket dirs) plus the deltas newer
    * than it. Both sides carry the `batch < beforeBatch` replay guard.
    *
    * `ptr` is the caller's ONE pointer read for the whole probe: the
    * candidate-bucket set is computed under a specific generation's
    * bucket modulus, so re-resolving the pointer here would race a
    * concurrent [[compact]] publishing a generation with a different
    * bucket count — the pruning would then silently skip true candidate
    * buckets. One read, threaded through, no TOCTOU window. */
  def refs(spark: SparkSession, store: String, beforeBatch: Long,
           ptr: Option[Pointer],
           candidateBuckets: Option[Set[Int]] = None): DataFrame = {
    val delta = deltas(spark, store)
      .where(col("batch") > ptr.map(_.maxBatch).getOrElse(Long.MinValue)
        && col("batch") < beforeBatch)
    ptr match {
      case None => delta
      case Some(p) =>
        // union of the pointer's tier list — every tier shares the same
        // bucket modulus (a bucket-count change forces a major merge),
        // so one candidate-bucket set prunes all of them
        val gen0 = p.gens.map { g =>
            spark.read.schema(compactedSchema).parquet(s"$store/gen-$g")
          }.reduce(_ unionByName _)
          .where(col("batch") < beforeBatch)
        val gen = candidateBuckets match {
          case Some(bs) if bs.isEmpty => gen0.where(lit(false))
          case Some(bs)               => gen0.where(col("bucket").isin(bs.toSeq: _*))
          case None                   => gen0
        }
        gen.drop("bucket").unionByName(delta)
    }
  }

  /** Fold newer deltas into generation n+1 and publish it — TIERED, so
    * steady-state maintenance is O(new data), not O(store):
    *
    *  - MINOR (the common case): only the deltas newer than the live
    *    pointer are bucketed into the new generation, which is APPENDED
    *    to the pointer's tier list. Cost is proportional to what
    *    arrived since the last compaction — the write amplification a
    *    week-long stream actually feels.
    *  - MAJOR: when the tier list would exceed `maxGenerations` (or the
    *    bucket count changes), all live tiers + deltas merge into one
    *    generation and the list resets. Majors are 1-in-`maxGenerations`
    *    compactions, so total rewrite work over a T-batch stream drops
    *    from O(T²/cadence) to O(T²/(cadence·maxGenerations)) with probe
    *    file count still bounded at O(maxGenerations·buckets).
    *
    * Returns the new pointer, or None when there is nothing new to
    * absorb. A replayed batch whose rows were absorbed while uncommitted
    * may appear in two tiers until the next MAJOR collapses them (its
    * exact-row dedup); harmless to the probe, whose pair generation
    * deduplicates on (doc_id, ref_id) — same argument as the gen+delta
    * duplication in the class doc. */
  def compact(spark: SparkSession, store: String, buckets: Int = 64,
              maxGenerations: Int = 8): Option[Pointer] = {
    require(maxGenerations >= 1, s"maxGenerations must be >= 1")
    val f = fs(spark, store)
    val deltaDir = new org.apache.hadoop.fs.Path(s"$store/delta")
    val prev = currentPointer(spark, store)
    val prevMax = prev.map(_.maxBatch).getOrElse(Long.MinValue)
    val newBatches =
      if (!f.exists(deltaDir)) Seq.empty[Long]
      else f.listStatus(deltaDir).toSeq
        .flatMap(s => "^batch=(\\d+)$".r.findFirstMatchIn(s.getPath.getName).map(_.group(1).toLong))
        .filter(_ > prevMax)
    if (newBatches.isEmpty) return None
    val nextGen = prev.map(_.gen + 1).getOrElse(0L)
    val minor = prev.exists(p =>
      p.buckets == buckets && p.gens.size < maxGenerations)
    val (source, gens) =
      if (minor) {
        // deltas only; the live tiers are untouched on disk
        val d = deltas(spark, store).where(col("batch") > prevMax)
        (d, prev.get.gens :+ nextGen)
      } else {
        // full merge: live tiers + deltas; replay-duplicate rows collapse
        (refs(spark, store, beforeBatch = Long.MaxValue, ptr = prev),
          Seq(nextGen))
      }
    val next = Pointer(nextGen, newBatches.max, buckets, gens)
    source
      .dropDuplicates("doc_id", "band_id", "batch")
      .withColumn("bucket", bucketOf(col("band_id"), col("band_hash"), buckets))
      // one shuffle sized by the bucket count: each bucket dir gets one
      // file, so file count is O(buckets), independent of stream length
      .repartition(buckets, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$store/gen-${next.gen}")
    val tmp = new org.apache.hadoop.fs.Path(s"$store/_ptr/.v${next.gen}.tmp")
    val out = f.create(tmp, true)
    try out.write(s"${next.maxBatch} ${next.buckets} ${next.gens.mkString(",")}"
      .getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, new org.apache.hadoop.fs.Path(s"$store/_ptr/v${next.gen}")))
      throw new java.io.IOException(s"could not publish pointer v${next.gen} for $store")
    Some(next)
  }

  /** Drop deltas absorbed by the live generation and superseded
    * generations/pointers. Separate from [[compact]] so it can run after
    * a grace period — a probe planned against the old listing finishes
    * before its files disappear. */
  def vacuum(spark: SparkSession, store: String): Unit = {
    val f = fs(spark, store)
    currentPointer(spark, store).foreach { p =>
      val deltaDir = new org.apache.hadoop.fs.Path(s"$store/delta")
      if (f.exists(deltaDir)) f.listStatus(deltaDir).foreach { s =>
        "^batch=(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
          .filter(_.group(1).toLong <= p.maxBatch)
          .foreach(_ => f.delete(s.getPath, true))
      }
      val live = p.gens.toSet
      f.listStatus(new org.apache.hadoop.fs.Path(store)).foreach { s =>
        "^gen-(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
          .filter(m => !live.contains(m.group(1).toLong))
          .foreach(_ => f.delete(s.getPath, true))
      }
      val ptrDir = new org.apache.hadoop.fs.Path(s"$store/_ptr")
      f.listStatus(ptrDir).foreach { s =>
        "^v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
          .filter(_.group(1).toLong < p.gen)
          .foreach(_ => f.delete(s.getPath, true))
      }
    }
  }
}
