package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Sketches
import graft.pipeline.QuantileMonitor
import graft.pipeline.QuantileMonitor.MonitorConfig

/** Streaming DDSketch windows: closed windows' bucket counts land in the
  * sink exactly once, and the batch-side probe over the sink equals the
  * batch ddQuantiles over the same events — the additivity argument made
  * executable. */
class QuantileMonitorSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("closed-window quantiles from the sink equal batch ddQuantiles") {
    implicit val sqlCtx = spark.sqlContext
    val sink = tmpDir("qm-sink")
    val cp = tmpDir("qm-cp")
    val cfg = MonitorConfig(windowDur = "1 minute", watermark = "2 minutes")
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")

    // window of interest: [00:00, 00:01) with two groups; the 00:04
    // sentinel advances the NEXT run's watermark to 00:02 so that window
    // closes (append mode emits nothing while a window can still change)
    val w0 = Seq(
      (ts(0, 1), "view", 10.0), (ts(0, 10), "view", 55.5),
      (ts(0, 20), "view", 700.0), (ts(0, 30), "view", 0.0),
      (ts(0, 5), "click", -3.25), (ts(0, 40), "click", 42.0))
    input.addData(w0 :+ ((ts(4, 0), "view", 1.0)): _*)
    val q1 = QuantileMonitor.start(spark, df, cfg, sink, cp)
    try q1.awaitTermination() finally q1.stop()

    // second run (same checkpoint): watermark from run 1's max event time
    // closes [00:00, 00:01); its bucket counts are appended exactly once
    input.addData((ts(10, 0), "view", 2.0))
    val q2 = QuantileMonitor.start(spark, df, cfg, sink, cp)
    try q2.awaitTermination() finally q2.stop()

    val got = QuantileMonitor.quantiles(spark, sink, Seq(0.5, 0.95))
      .where($"window_start" === ts(0, 0))
      .select($"event_type", $"quantile", $"est", $"n_values")
    val want = Sketches.ddQuantiles(
      w0.toDF("ts", "event_type", "value"), "event_type", "value", Seq(0.5, 0.95))
    assert(got.count() == 4) // 2 groups x 2 quantiles in the window under test
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"streaming probe != batch sketch:\n${got.collect().mkString("\n")}\nvs\n${want.collect().mkString("\n")}")

    // exactly the closed windows are in the sink ([00:00,00:01) under
    // test; the 00:04 sentinel's own window closed once 00:10 advanced
    // the watermark); the 00:10 event's window is still open
    val winStarts = spark.read.parquet(sink)
      .select($"window_start").distinct().as[java.sql.Timestamp].collect().toSet
    assert(winStarts == Set(ts(0, 0), ts(4, 0)), winStarts.toString)
  }

  test("streaming state carries buckets, not events (plan + additivity rollup)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val plan = QuantileMonitor.bucketed(df, MonitorConfig()).queryExecution.analyzed
    // the aggregation keys are (window, group, sgn, j) — state rows per
    // window are bounded by groups x buckets regardless of event volume
    val agg = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(agg.nonEmpty && agg.head.groupingExpressions.size == 4)

    // additivity: bucket counts of two halves sum to the whole, and the
    // probe over the summed counts equals the probe over the whole
    val all = (1 to 500).map(i => ("g", (i % 97).toDouble - 11.0))
      .toDF("g", "value")
    val h1 = all.limit(250)
    val h2 = all.exceptAll(h1)
    val merged = Sketches.bucketCounts(h1, Seq("g"), "value")
      .unionByName(Sketches.bucketCounts(h2, Seq("g"), "value"))
      .groupBy($"g", $"sgn", $"j").agg(org.apache.spark.sql.functions.sum($"cnt").as("cnt"))
    val fromMerged = Sketches.quantilesFromCounts(merged, Seq("g"), Seq(0.5, 0.9))
    val direct = Sketches.ddQuantiles(all, "g", "value", Seq(0.5, 0.9))
    assert(fromMerged.exceptAll(direct).isEmpty && direct.exceptAll(fromMerged).isEmpty)
  }
}
