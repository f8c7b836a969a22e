package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Sketches

/** Streaming windowed quantile telemetry — DDSketch over event-time
  * windows. The reason this exists as a STREAMING operator at all is the
  * sketch's relational shape ([[graft.ops.Sketches]]): its state is
  * additive (log-bucket → count), so the streaming side is nothing more
  * than a watermarked `groupBy(window, group, bucket).count()` —
  * Spark-native stateful aggregation with state bounded by
  * windows-in-flight × groups × ~hundreds of buckets, NOT by event
  * volume, and mergeable across micro-batches by construction. A
  * percentile_approx-style order-sensitive sketch could not be composed
  * this way without custom state (its merge is neither commutative nor
  * relational).
  *
  * The sink carries closed windows' bucket counts (append mode after the
  * watermark — each window's counts are final and written exactly once by
  * the parquet streaming sink's commit log). Quantile PROBES run
  * batch-side over the sink ([[quantiles]]): monitoring dashboards ask
  * for p50/p95/p99 long after ingestion, at any q, without re-reading
  * events — and counts from any window range also roll up (sum) into
  * coarser windows before probing, the same additivity again.
  *
  * 100 TB posture: the only shuffle is the windowed aggregation's, and it
  * carries partial-aggregated bucket counts (map-side combine collapses
  * each partition to ≤ |groups|·|buckets| rows per window), not events.
  */
object QuantileMonitor {

  /** @param windowDur tumbling event-time window
    * @param watermark lateness horizon (bounds state and emission delay)
    * @param alpha     DDSketch relative-error target */
  case class MonitorConfig(windowDur: String = "1 minute",
                           watermark: String = "2 minutes",
                           groupCol: String = "event_type",
                           valueCol: String = "value",
                           tsCol: String = "ts",
                           alpha: Double = 0.01)

  /** The streaming transform (unstarted — tests inspect it): watermarked
    * tumbling-window bucket counts, flattened for the sink. */
  def bucketed(events: DataFrame, cfg: MonitorConfig): DataFrame = {
    val (sgn, j) = Sketches.bucketCols(col(cfg.valueCol), Sketches.gammaFor(cfg.alpha))
    events
      .where(col(cfg.valueCol).isNotNull)
      .select(col(cfg.tsCol), col(cfg.groupCol), sgn.as("sgn"), j.as("j"))
      .withWatermark(cfg.tsCol, cfg.watermark)
      .groupBy(window(col(cfg.tsCol), cfg.windowDur), col(cfg.groupCol),
        col("sgn"), col("j"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(cfg.groupCol), col("sgn"), col("j"), col("cnt"))
  }

  /** Start the monitor: append-mode parquet sink of closed-window bucket
    * counts (exactly-once via the streaming parquet sink's commit log). */
  def start(spark: SparkSession, events: DataFrame, cfg: MonitorConfig,
            sinkPath: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    bucketed(events, cfg).writeStream
      .queryName("quantile_monitor")
      .format("parquet")
      .option("path", sinkPath)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Batch-side probe of the accumulated sink: per (window, group, q)
    * quantile estimates. Counts are re-summed per bucket first, so the
    * probe is also correct over a sink that was compacted or unioned
    * across monitor generations (additivity). */
  def quantiles(spark: SparkSession, sinkPath: String, qs: Seq[Double],
                groupCol: String = "event_type",
                alpha: Double = 0.01): DataFrame = {
    val keys = Seq("window_start", "window_end", groupCol)
    val counts = spark.read.parquet(sinkPath)
      .groupBy((keys :+ "sgn" :+ "j").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    Sketches.quantilesFromCounts(counts, keys, qs, alpha)
  }
}
