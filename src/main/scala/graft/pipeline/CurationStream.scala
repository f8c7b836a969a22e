package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ops.{Dedup, Text}

/** Streaming corpus curation — the training-data analog of the medallion
  * flow, composed from the SAME operator library the batch queries use
  * (q42's stages, streamed): incoming documents are scrubbed to canonical
  * form, exact-deduplicated against recently-seen content
  * (watermark-bounded state keyed on the content fingerprint), then
  * quality-routed to clean/rejected sinks from one scan per micro-batch.
  *
  * Scale posture: scrubbing and scoring are map-side projections; the only
  * stateful operator is `dropDuplicatesWithinWatermark` whose state
  * carries one 32-char fingerprint per distinct document inside the
  * watermark horizon — bounded by arrival rate × watermark, not corpus
  * size (cross-horizon dedup belongs to the batch pass, q20/q42). The
  * dual sink reuses the single-scan `DualSink` writer, and rejected rows
  * keep their quality score for the audit trail.
  */
object CurationStream {

  /** @param minQuality  quality-gate threshold (see [[Text.qualityScore]])
    * @param scrubRules  ordered regex scrubbing applied BEFORE dedup, so
    *                    documents differing only in scrubbed content
    *                    (e.g. numeric ids) deduplicate together
    * @param watermark   dedup-state horizon on the `ingest_ts` column */
  case class CurationConfig(minQuality: Double = 0.6,
                            scrubRules: Seq[(String, String)] = Nil,
                            watermark: String = "10 minutes")

  /** The composed streaming transform (unstarted — tests inspect it).
    * Input columns: doc_id, text, ingest_ts (event time). Output adds
    * `quality`; text is scrubbed; duplicates within the watermark are
    * dropped. Across micro-batches the earlier batch's document wins
    * (its fingerprint is already in state); WITHIN one micro-batch the
    * survivor among same-batch duplicates is whichever row reaches the
    * state partition first — stable for a given plan and partitioning
    * but not a cross-partition arrival-order guarantee. */
  def curated(docs: DataFrame, cfg: CurationConfig): DataFrame = {
    val scrubbed = docs.withColumn("text", Text.scrub(col("text"), cfg.scrubRules))
    val wc = Text.tokenCount(col("text"))
    val awl = Text.sumTokenLen(col("text")) / wc
    val stopRatio = Text.stopwordCount(col("text")) / wc
    scrubbed
      .withColumn("quality", Text.qualityScore(wc, stopRatio, awl))
      .withColumn("fp", md5(col("text")))
      .withWatermark("ingest_ts", cfg.watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
  }

  def start(spark: SparkSession, input: DataFrame, cfg: CurationConfig,
            cleanPath: String, rejectedPath: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit = (batch, _) =>
      DualSink.write(batch.toDF(), col("quality") >= cfg.minQuality,
        cleanPath, rejectedPath, partitionCols = Nil)
    curated(input, cfg).writeStream
      .queryName("curation_stream")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }

  /** MinHash near-dup stage parameters (same S-curve semantics as the
    * batch `Dedup.minhashCandidates`: k/bands rows per band, threshold
    * ≈ (1/bands)^(bands/k)). */
  case class NearDupConfig(k: Int = 64, bands: Int = 16,
                           minEstJaccard: Double = 0.5)

  private def storeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("band_id", IntegerType),
    StructField("band_hash", LongType),
    StructField("batch", LongType)))

  /** Streaming MinHash near-dup curation — the continuous counterpart of
    * the batch near-dup pass (q25/q42), composed AFTER the exact stage
    * ([[start]]). Each micro-batch:
    *
    *   1. computes the batch documents' MinHash signatures with the SAME
    *      native expression the batch path uses
    *      ([[graft.ops.Dedup.minhashSignatures]]) and bands them;
    *   2. probes an accumulating parquet signature store of everything
    *      previously admitted — the probe is a (band_id, band_hash)
    *      equi-join, partition-PRUNED to `batch < currentBatchId` so a
    *      replayed batch never matches its own earlier attempt — plus an
    *      intra-batch self-probe (smaller doc_id wins, matching the batch
    *      operator's survivor rule);
    *   3. routes near-duplicates (estimated Jaccard ≥ threshold against
    *      any admitted doc) to the audit sink, admits the rest to the
    *      clean sink, and appends the survivors' bucket rows to the store
    *      as `batch=<id>/` — written with overwrite so a batch replay is
    *      idempotent on the store (the sinks themselves are append, the
    *      same at-least-once posture as every other foreachBatch sink
    *      here).
    *
    * Scale posture: signatures/banding are map-side; the store carries
    * `bands` narrow rows per admitted distinct-signature document and the
    * probe join is hash-partitioned on (band_id, band_hash) — at
    * production scale the store is periodically compacted (and optionally
    * bucketed on the join key) by a maintenance job; state never lives in
    * the streaming checkpoint, so restarts are cheap and the horizon is
    * the whole corpus, not a watermark. Documents too short to shingle
    * have no signature: they are admitted (near-dup undefined) and do not
    * enter the store. */
  def startNearDup(spark: SparkSession, input: DataFrame, cfg: NearDupConfig,
                   cleanPath: String, nearDupPath: String, storePath: String,
                   checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(cfg.k % cfg.bands == 0, s"bands must divide k (got ${cfg.k}/${cfg.bands})")
    PipelineFs.ensureDir(spark, storePath)
    val r = cfg.k / cfg.bands
    val fn: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      val s = batch.sparkSession
      import s.implicits._
      val docs = batch.toDF().persist()
      try {
        val bandStructs = (0 until cfg.bands).map { j =>
          struct(lit(j).as("band_id"),
            xxhash64(slice($"sig", j * r + 1, r)).as("band_hash"))
        }
        val buckets = Dedup.minhashSignatures(docs, "doc_id", "text", cfg.k)
          .select($"doc".cast("long").as("doc_id"), $"sig",
            explode(array(bandStructs: _*)).as("band"))
          .select($"doc_id", $"sig", $"band.band_id", $"band.band_hash")
          .persist()
        // reference side: everything admitted in PRIOR batches (partition
        // filter prunes to batch=* < batchId, so a replay can't see its own
        // earlier attempt), plus smaller-id docs of THIS batch
        val prior = s.read.schema(storeSchema).parquet(storePath)
          .where($"batch" < batchId)
          .select($"doc_id".as("ref_id"), $"sig".as("ref_sig"),
            $"band_id", $"band_hash", lit(true).as("is_prior"))
        val intra = buckets
          .select($"doc_id".as("ref_id"), $"sig".as("ref_sig"),
            $"band_id", $"band_hash", lit(false).as("is_prior"))
        val nearIds = buckets
          .join(prior.unionByName(intra), Seq("band_id", "band_hash"))
          .where($"is_prior" || $"ref_id" < $"doc_id")
          .dropDuplicates("doc_id", "ref_id")
          .withColumn("est_jaccard",
            aggregate(zip_with($"sig", $"ref_sig",
                (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (a, x) => a + x) / lit(cfg.k.toDouble))
          .where($"est_jaccard" >= cfg.minEstJaccard)
          .select($"doc_id").distinct()
        val admitted = docs.join(nearIds, Seq("doc_id"), "left_anti")
        admitted.write.mode("append").parquet(cleanPath)
        docs.join(nearIds, Seq("doc_id"), "left_semi")
          .write.mode("append").parquet(nearDupPath)
        buckets.join(nearIds, Seq("doc_id"), "left_anti")
          .select($"doc_id", $"sig", $"band_id", $"band_hash")
          .write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
        buckets.unpersist(); ()
      } finally { docs.unpersist(); () }
    }
    input.writeStream
      .queryName("curation_neardup_stream")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }
}
