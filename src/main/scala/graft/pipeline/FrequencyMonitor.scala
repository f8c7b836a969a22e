package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Sketches

/** Streaming windowed frequency telemetry — CountMin over event-time
  * windows, the frequency sibling of [[QuantileMonitor]]. Same reason it
  * composes at all: the CMS state ([[Sketches.countMinCounts]]) is an
  * additive (row, bucket) → count matrix, so the streaming side is just a
  * watermarked `groupBy(window, r, bucket).count()` — Spark-native
  * stateful aggregation with state bounded by windows-in-flight ×
  * depth×width CELLS, never by key cardinality. That is the whole point
  * at 100 TB: an exact per-key count over an unbounded key domain (urls,
  * user ids, shingles) needs per-key state; the sketch's state is a
  * constant-size matrix per window, yet answers point queries for ANY
  * key after the fact with a one-sided ≤ ε·N error.
  *
  * Probes run batch-side over the sink ([[estimates]]): cells re-sum
  * first, so windows roll up into coarser horizons (a day's estimate from
  * minute files) by the same additivity.
  */
object FrequencyMonitor {

  case class FreqConfig(windowDur: String = "1 minute",
                        watermark: String = "2 minutes",
                        keyCol: String = "event_type",
                        tsCol: String = "ts",
                        depth: Int = 3,
                        width: Int = 64)

  /** The streaming transform (unstarted — tests inspect it): watermarked
    * tumbling-window CMS cell counts, flattened for the sink. */
  def cells(events: DataFrame, cfg: FreqConfig): DataFrame = {
    val cellArr = array((0 until cfg.depth).map(r =>
      struct(lit(r).as("r"),
        Sketches.cmsBucket(col(cfg.keyCol), r, cfg.width).as("bucket"))): _*)
    events
      .where(col(cfg.keyCol).isNotNull)
      .select(col(cfg.tsCol), explode(cellArr).as("cell"))
      .withWatermark(cfg.tsCol, cfg.watermark)
      .groupBy(window(col(cfg.tsCol), cfg.windowDur),
        col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("r"), col("bucket"), col("cnt"))
  }

  /** Start the monitor: append-mode parquet sink of closed windows' CMS
    * cells (exactly-once via the streaming parquet sink's commit log). */
  def start(spark: SparkSession, events: DataFrame, cfg: FreqConfig,
            sinkPath: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    cells(events, cfg).writeStream
      .queryName("frequency_monitor")
      .format("parquet")
      .option("path", sinkPath)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Batch-side point queries over the accumulated sink, per window:
    * estimate for every probe key in every window the sink holds. Cells
    * re-sum per (window, r, bucket) first, so the probe is correct over
    * compacted or multi-generation sinks; pass `rollUp = true` to collapse
    * all windows into one whole-horizon sketch before probing. */
  def estimates(spark: SparkSession, sinkPath: String, probes: DataFrame,
                cfg: FreqConfig, rollUp: Boolean = false): DataFrame = {
    val raw = spark.read.parquet(sinkPath)
    if (rollUp) {
      val sketch = raw.groupBy(col("r"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      Sketches.cmsEstimate(sketch, probes, cfg.keyCol, cfg.depth, cfg.width)
    } else {
      val sketch = raw.groupBy(col("window_start"), col("window_end"),
          col("r"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      // per-window estimate: join probes against every window's sketch
      val windows = sketch.select(col("window_start"), col("window_end")).distinct()
      val probed = probes.crossJoin(broadcast(windows))
      val probeCells = probed.select(col("*"),
        explode(array((0 until cfg.depth).map(r =>
          struct(lit(r).as("r"),
            Sketches.cmsBucket(col(cfg.keyCol), r, cfg.width).as("bucket"))): _*)).as("cell"))
        .select(col("*"), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
        .drop("cell")
      val outCols = probes.columns.toSeq ++ Seq("window_start", "window_end")
      probeCells.join(broadcast(sketch),
          Seq("window_start", "window_end", "r", "bucket"), "left")
        .groupBy(outCols.map(col): _*)
        .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
    }
  }

  /** Sketch-based distribution drift per window: PSI of each window's
    * cell distribution against the whole-horizon baseline, averaged over
    * the `depth` hash rows. The point is the STATE BOUND: token-level
    * drift ([[graft.ops.Text.tokenDrift]]) needs the vocabulary; this
    * needs only the depth×width matrix the monitor already sinks, so it
    * works over key domains (urls, ids) no vocabulary can hold — cell
    * distributions are hash projections of the key distribution, so a
    * key-mix shift moves them (by the same argument sketches estimate
    * frequencies). Domain = the horizon's observed cells, add-one
    * smoothed; a window matching the baseline mix scores ≈ 0, a shifted
    * window scores high. Everything here is vocabulary-free aggregates
    * over ≤ depth·width rows per window. */
  def cellDrift(spark: SparkSession, sinkPath: String): DataFrame = {
    val cells = spark.read.parquet(sinkPath)
      .groupBy(col("window_start"), col("window_end"), col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val base = cells.groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("base_cnt"))
    val bTot = base.groupBy(col("r")).agg(sum(col("base_cnt")).as("b_tot"),
      count(lit(1)).as("n_cells"))
    val windows = cells.select(col("window_start"), col("window_end")).distinct()
    // full (window × observed-cell) domain so absent cells still contribute
    val domain = windows.crossJoin(broadcast(base))
    val wTot = cells.groupBy(col("window_start"), col("window_end"), col("r"))
      .agg(sum(col("cnt")).as("w_tot"))
    val joined = domain
      .join(cells, Seq("window_start", "window_end", "r", "bucket"), "left")
      .join(broadcast(wTot), Seq("window_start", "window_end", "r"), "left")
      .join(broadcast(bTot), Seq("r"))
      .select(col("window_start"), col("window_end"), col("r"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("w_tot"), lit(0L)).as("w_tot"),
        col("base_cnt"), col("b_tot"), col("n_cells"))
    val p = (col("cnt") + 1) / (col("w_tot") + col("n_cells"))
    val q = (col("base_cnt") + 1) / (col("b_tot") + col("n_cells"))
    joined
      .groupBy(col("window_start"), col("window_end"), col("r"))
      .agg(sum((p - q) * log(p / q)).as("psi_r"))
      .groupBy(col("window_start"), col("window_end"))
      .agg(avg(col("psi_r")).as("psi"))
  }
}
