package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming windowed cardinality telemetry — distinct-count sibling of
  * [[FrequencyMonitor]] (counts) and [[QuantileMonitor]] (values): how
  * many distinct keys (users, urls, content fingerprints) appeared per
  * event-time window, over key domains no exact per-key state could
  * hold.
  *
  * The sink stores the MERGEABLE HLL sketch per window (DataSketches
  * `hll_sketch_agg`, the same binary q38 pins), not the estimate —
  * because distinct counts do not add: summing per-window numbers
  * double-counts every key active in two windows. Union-merging the
  * per-window sketches ([[rollup]]) gives the whole-horizon distinct
  * with each window's state a fixed 2^lgK registers. Streaming state =
  * windows-in-flight × sketch size; watermark closes windows exactly
  * once into the parquet sink.
  *
  * 100 TB posture: the aggregation is Spark-native two-phase (register
  * merge map-side), the sink rows are (window, ~KB sketch), and any
  * horizon rollup touches only windows-count rows.
  */
object CardinalityMonitor {

  case class CardConfig(windowDur: String = "1 minute",
                        watermark: String = "2 minutes",
                        keyCol: String = "user_id",
                        tsCol: String = "ts",
                        lgK: Int = 12)

  /** The streaming transform (unstarted — tests inspect it): watermarked
    * tumbling-window HLL sketches, one binary column per closed window. */
  def sketches(events: DataFrame, cfg: CardConfig): DataFrame =
    events
      .where(col(cfg.keyCol).isNotNull)
      .withWatermark(cfg.tsCol, cfg.watermark)
      .groupBy(window(col(cfg.tsCol), cfg.windowDur))
      .agg(hll_sketch_agg(col(cfg.keyCol), lit(cfg.lgK)).as("sk"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("sk"))

  /** Append-mode parquet sink of closed windows' sketches (exactly-once
    * via the streaming parquet sink's commit log). */
  def start(spark: SparkSession, events: DataFrame, cfg: CardConfig,
            sinkPath: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    sketches(events, cfg).writeStream
      .queryName("cardinality_monitor")
      .format("parquet")
      .option("path", sinkPath)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Per-window distinct estimates over the accumulated sink. Windows
    * written across multiple generations union-merge first, so the
    * estimate is correct over compacted or restarted sinks — INCLUDING a
    * sink whose generations were written under different `lgK` configs (a
    * restart with a retuned CardConfig): `allowDifferentLgConfigK` makes
    * the union downgrade to the smallest lgK present instead of throwing
    * at read time. */
  def estimates(spark: SparkSession, sinkPath: String): DataFrame =
    spark.read.parquet(sinkPath)
      .groupBy(col("window_start"), col("window_end"))
      .agg(hll_union_agg(col("sk"), lit(true)).as("sk"))
      .select(col("window_start"), col("window_end"),
        hll_sketch_estimate(col("sk")).as("approx_distinct"))

  /** Whole-horizon distinct: union-merge every window's sketch — the
    * operation a per-window NUMBER sink could not support. Mixed-lgK
    * generations union-merge at the smallest lgK ([[estimates]]). */
  def rollup(spark: SparkSession, sinkPath: String): DataFrame =
    spark.read.parquet(sinkPath)
      .agg(hll_union_agg(col("sk"), lit(true)).as("sk"))
      .select(hll_sketch_estimate(col("sk")).as("approx_distinct"))
}
