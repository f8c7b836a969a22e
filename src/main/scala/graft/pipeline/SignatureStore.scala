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
  *   <store>/_ptr/v<n>           generation pointers; the LIVE generation
  *                               is the max n ("maxBatch buckets" inside)
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
private[pipeline] object SignatureStore {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("band_id", IntegerType),
    StructField("band_hash", LongType),
    StructField("batch", LongType)))

  private val compactedSchema: StructType =
    StructType(schema.fields :+ StructField("bucket", IntegerType))

  /** Live compacted generation: `gen-<gen>` covers every batch id
    * ≤ maxBatch, hash-partitioned into `buckets` bucket dirs. */
  final case class Pointer(gen: Long, maxBatch: Long, buckets: Int)

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
    * RESTART of a known lineage gets its existing epoch back — so
    * replayed batches land on their original ordinals. Create-if-absent
    * keeps a lost race benign: the loser re-reads the winner's file.
    * (Two *distinct* lineages writing one store concurrently is outside
    * the store's contract — same as any single-writer table format.) */
  def registerRun(spark: SparkSession, store: String, runTag: String): Long = {
    val f = fs(spark, store)
    val dir = new org.apache.hadoop.fs.Path(s"$store/_runs")
    f.mkdirs(dir)
    val mine = new org.apache.hadoop.fs.Path(dir, runTag.stripSuffix("-"))
    def read(p: org.apache.hadoop.fs.Path): Long = {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    if (f.exists(mine)) return read(mine)
    val next = (f.listStatus(dir).toSeq.map(s => read(s.getPath)) :+ 0L).max + 1
    try {
      val out = f.create(mine, false)
      try out.write(next.toString.getBytes("UTF-8")) finally out.close()
      next
    } catch { case _: java.io.IOException => read(mine) }
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
      val Array(maxBatch, buckets) = content.split("\\s+")
      Pointer(gen, maxBatch.toLong, buckets.toInt)
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
        val gen0 = spark.read.schema(compactedSchema).parquet(s"$store/gen-${p.gen}")
          .where(col("batch") < beforeBatch)
        val gen = candidateBuckets match {
          case Some(bs) if bs.isEmpty => gen0.where(lit(false))
          case Some(bs)               => gen0.where(col("bucket").isin(bs.toSeq: _*))
          case None                   => gen0
        }
        gen.drop("bucket").unionByName(delta)
    }
  }

  /** Fold the live generation + newer deltas into generation n+1 and
    * publish it. Returns the new pointer, or None when there is nothing
    * new to absorb. Exact-duplicate rows (a replayed batch that was
    * absorbed while uncommitted — see class doc) collapse here. */
  def compact(spark: SparkSession, store: String, buckets: Int = 64): Option[Pointer] = {
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
    val next = Pointer(prev.map(_.gen + 1).getOrElse(0L), newBatches.max, buckets)
    refs(spark, store, beforeBatch = Long.MaxValue, ptr = prev)
      .dropDuplicates("doc_id", "band_id", "batch")
      .withColumn("bucket", bucketOf(col("band_id"), col("band_hash"), buckets))
      // one shuffle sized by the bucket count: each bucket dir gets one
      // file, so file count is O(buckets), independent of stream length
      .repartition(buckets, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$store/gen-${next.gen}")
    val tmp = new org.apache.hadoop.fs.Path(s"$store/_ptr/.v${next.gen}.tmp")
    val out = f.create(tmp, true)
    try out.write(s"${next.maxBatch} ${next.buckets}".getBytes("UTF-8")) finally out.close()
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
      f.listStatus(new org.apache.hadoop.fs.Path(store)).foreach { s =>
        "^gen-(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
          .filter(_.group(1).toLong < p.gen)
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
