package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Text

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
}
