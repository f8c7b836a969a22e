package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Sketches
import graft.pipeline.FrequencyMonitor
import graft.pipeline.FrequencyMonitor.FreqConfig

/** Streaming CountMin windows: closed windows' cells land in the sink
  * exactly once; per-window probes equal the batch sketch over the same
  * events; the whole-horizon rollup equals one sketch over everything —
  * the additivity argument made executable (QuantileMonitorSpec's shape
  * for the frequency sketch). */
class FrequencyMonitorSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("closed-window estimates equal the batch sketch; rollup sums windows") {
    implicit val sqlCtx = spark.sqlContext
    val sink = tmpDir("fm-sink")
    val cp = tmpDir("fm-cp")
    val cfg = FreqConfig(windowDur = "1 minute", watermark = "2 minutes",
      keyCol = "event_type", depth = 3, width = 32)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")

    val w0 = Seq.fill(7)((ts(0, 5), "view")) ++ Seq.fill(3)((ts(0, 30), "click")) ++
      Seq((ts(0, 50), "purchase"))
    input.addData(w0 :+ ((ts(4, 0), "view")): _*)
    val q1 = FrequencyMonitor.start(spark, df, cfg, sink, cp)
    try q1.awaitTermination() finally q1.stop()
    input.addData((ts(10, 0), "view"))
    val q2 = FrequencyMonitor.start(spark, df, cfg, sink, cp)
    try q2.awaitTermination() finally q2.stop()

    val probes = Seq("view", "click", "purchase", "absent").toDF("event_type")
    val got = FrequencyMonitor.estimates(spark, sink, probes, cfg)
      .where($"window_start" === ts(0, 0))
      .select($"event_type", $"cms_cnt")
    val batchSketch = Sketches.countMinCounts(
      w0.toDF("ts", "event_type"), "event_type", cfg.depth, cfg.width)
    val want = Sketches.cmsEstimate(batchSketch, probes, "event_type",
      cfg.depth, cfg.width)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"streaming probe != batch sketch:\n${got.collect().mkString("\n")}" +
        s"\nvs\n${want.collect().mkString("\n")}")
    // 11 keyed events in the window; estimates are upper bounds and the
    // absent key reads (close to) zero — with 4 probes over 3x32 cells a
    // collision with a real key is possible but the bound still holds
    val m = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("view") >= 7 && m("click") >= 3 && m("purchase") >= 1)

    // whole-horizon rollup = one sketch over all closed windows' events
    val rolled = FrequencyMonitor.estimates(spark, sink, probes, cfg,
      rollUp = true).select($"event_type", $"cms_cnt")
    val allClosed = (w0 :+ ((ts(4, 0), "view"))).toDF("ts", "event_type")
    val wantAll = Sketches.cmsEstimate(
      Sketches.countMinCounts(allClosed, "event_type", cfg.depth, cfg.width),
      probes, "event_type", cfg.depth, cfg.width)
    assert(rolled.exceptAll(wantAll).isEmpty && wantAll.exceptAll(rolled).isEmpty)
  }

  test("cellDrift: stable windows score near zero, a shifted mix scores high") {
    implicit val sqlCtx = spark.sqlContext
    val sink = tmpDir("fm-drift-sink")
    val cp = tmpDir("fm-drift-cp")
    val cfg = FreqConfig(windowDur = "1 minute", watermark = "2 minutes",
      keyCol = "event_type", depth = 3, width = 32)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    // windows 0 and 1 share the baseline mix; window 2 is a new key
    // flooding in — the scraper-change shape
    def mix(min: Int) = (1 to 20).map(i =>
      (ts(min, i), if (i % 4 == 0) "click" else "view"))
    val flood = (1 to 20).map(i => (ts(2, i), "weird_new_key"))
    input.addData(mix(0) ++ mix(1) ++ flood :+ ((ts(6, 0), "view")): _*)
    val q1 = FrequencyMonitor.start(spark, df, cfg, sink, cp)
    try q1.awaitTermination() finally q1.stop()
    input.addData((ts(12, 0), "view"))
    val q2 = FrequencyMonitor.start(spark, df, cfg, sink, cp)
    try q2.awaitTermination() finally q2.stop()

    val drift = FrequencyMonitor.cellDrift(spark, sink)
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(2)).toMap
    assert(drift.contains(ts(0, 0)) && drift.contains(ts(2, 0)), drift.toString)
    // the flooded window must score well above both baseline windows
    assert(drift(ts(2, 0)) > 2 * drift(ts(0, 0)) &&
      drift(ts(2, 0)) > 2 * drift(ts(1, 0)),
      s"drift scores: $drift")
  }

  test("streaming state is the cell matrix, not per-key rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val plan = FrequencyMonitor.cells(df, FreqConfig()).queryExecution.analyzed
    val agg = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    // grouping keys are (window, r, bucket): state per window is bounded
    // by depth x width cells no matter how many distinct keys arrive
    assert(agg.nonEmpty && agg.head.groupingExpressions.size == 3)
  }
}
