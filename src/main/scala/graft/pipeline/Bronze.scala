package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.{Derive, Quality}

/** Shared dual-sink writer: one micro-batch scan feeds both the valid sink
  * and the quarantine sink. The reference runs valid and rejected as
  * independent streaming queries that each rescan the source
  * (`bronze_ingest.py:64-103` — 4 queries per layer); at 100 TB that is 2×
  * the I/O. Inside `foreachBatch` we cache the batch once and write both
  * sides through [[IdempotentSink]], whose stage → publish → mark protocol
  * makes each sink exactly-once under failure-replay — a crash between the
  * clean and rejected writes replays into the same final file set instead
  * of double-appending.
  */
private[pipeline] object PipelineFs {
  /** Create a stream-source dir if missing: a file-stream source refuses
    * to START on a nonexistent path, so on a cold simultaneous start
    * (continuous mode) every tier must be able to open its upstream dir
    * before the upstream has produced anything. Hadoop FS API, so it
    * works on HDFS/S3 as well as local files. */
  def ensureDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(p)
    ()
  }
}

private[pipeline] object DualSink {
  def write(batch: DataFrame, valid: Column, validPath: String,
            rejectedPath: String, partitionCols: Seq[String], batchId: Long,
            transformValid: DataFrame => DataFrame = identity,
            runTag: String = ""): Unit = {
    val cached = batch.persist()
    try {
      // Quality.split owns the 3VL routing rule (NULL predicate →
      // quarantine) so batch and streaming paths cannot drift
      val (ok, bad) = Quality.split(cached, valid)
      IdempotentSink.write(transformValid(ok), validPath, batchId, partitionCols, runTag)
      IdempotentSink.write(bad, rejectedPath, batchId, Nil, runTag)
    } finally { cached.unpersist(); () }
  }
}

/** Bronze ingestion: schema-enforced JSON landing-zone stream → parsed
  * timestamps + partition date → valid rows to bronze, unparseable rows to
  * quarantine (SURVEY.md §2 S1/K1/K2/P1/P2/F1/F2; ref `bronze_ingest.py`).
  */
object Bronze {

  /** P1/P2 — timestamp parsing + partition-date derivation
    * (ref `bronze_ingest.py:44-49`). */
  def derive(df: DataFrame): DataFrame =
    Derive.partitionDate(
      Derive.parseTs(Derive.parseTs(df, "event_time", "event_time_ts"),
        "ingest_time", "ingest_time_ts"),
      "event_time_ts")

  /** One streaming query per sensor landing zone. The bronze sink is
    * date-partitioned (scale improvement: partition pruning for all
    * downstream batch reads; the reference writes a flat dir). */
  def start(spark: SparkSession, cfg: PipelineConfig, sensor: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    PipelineFs.ensureDir(spark, cfg.landingDir(sensor))
    // schema includes the date partition column (see Schemas.rawLanding),
    // then drops it — keeping the plan schema stable whether or not
    // date= subdirs exist at stream start
    val raw = spark.readStream.schema(Schemas.rawLanding)
      .options(cfg.sourceOptions).json(cfg.landingDir(sensor))
      .select(Schemas.raw.fieldNames.map(col).toIndexedSeq: _*)
    val derived = derive(raw)
    // optional streaming exact dedup: watermark-bounded state keyed on the
    // natural event identity (RAW event_time string, not the parsed
    // timestamp). The WATERMARK column must be non-null for every row —
    // a NULL event-time row would otherwise be discarded as late by the
    // stateful operator once the watermark advances, silently losing the
    // quarantine audit trail — so unparseable rows ride on ingest time
    // (falling back to processing time when that is unparseable too).
    val deduped =
      if (cfg.dedupeLanding)
        derived
          .withColumn("wm_ts",
            coalesce(col("event_time_ts"), col("ingest_time_ts"), current_timestamp()))
          .withWatermark("wm_ts", cfg.watermark)
          .dropDuplicatesWithinWatermark("bridge_id", "sensor_type", "event_time")
          .drop("wm_ts")
      else derived
    val fn: (Dataset[Row], Long) => Unit = (batch, batchId) =>
      DualSink.write(batch.toDF(), Quality.bronzeValid(),
        cfg.bronzeDir(sensor), cfg.bronzeRejectedDir(sensor), Seq("partition_date"), batchId,
        runTag = IdempotentSink.tagFor(cfg.checkpoint(s"bronze_$sensor")))
    deduped.writeStream
      .queryName(s"bronze_$sensor")
      .option("checkpointLocation", cfg.checkpoint(s"bronze_$sensor"))
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }

  def startAll(spark: SparkSession, cfg: PipelineConfig,
               trigger: Trigger = Trigger.AvailableNow()): Seq[StreamingQuery] =
    Schemas.sensors.map(start(spark, cfg, _, trigger))
}
