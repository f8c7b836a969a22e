package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.CardinalityMonitor
import graft.pipeline.CardinalityMonitor.CardConfig

/** Streaming HLL windows: closed windows' sketches land exactly once;
  * per-window estimates equal the batch sketch over the same events; the
  * horizon rollup union-merges (NOT sums) — a key active in two windows
  * counts once, matching one batch sketch over everything. */
class CardinalityMonitorSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("stream estimates = batch; rollup union-merges across windows") {
    implicit val sqlCtx = spark.sqlContext
    val sink = tmpDir("cm-sink")
    val cp = tmpDir("cm-cp")
    val cfg = CardConfig(windowDur = "1 minute", watermark = "2 minutes",
      keyCol = "user_id", lgK = 12)
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")

    // window 0: users 1..40 (some repeated); window 1: users 21..60 —
    // overlap 21..40 must count once in the rollup
    val w0 = (1L to 40L).map(u => (ts(0, (u % 60).toInt), u)) ++
      Seq((ts(0, 10), 7L), (ts(0, 20), 7L))
    val w1 = (21L to 60L).map(u => (ts(1, (u % 60).toInt), u))
    input.addData((w0 ++ w1) :+ ((ts(5, 0), 999L)): _*)
    val q1 = CardinalityMonitor.start(spark, df, cfg, sink, cp)
    try q1.awaitTermination() finally q1.stop()
    input.addData((ts(11, 0), 998L))
    val q2 = CardinalityMonitor.start(spark, df, cfg, sink, cp)
    try q2.awaitTermination() finally q2.stop()

    val got = CardinalityMonitor.estimates(spark, sink)
      .select($"window_start", $"approx_distinct")
      .as[(java.sql.Timestamp, Double)].collect().toMap
    // batch reference per window, same lgK
    def batchEst(rows: Seq[(java.sql.Timestamp, Long)]): Double =
      rows.toDF("ts", "user_id")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))))
        .as[Double].head()
    assert(got(ts(0, 0)) == batchEst(w0), s"w0: ${got(ts(0, 0))}")
    assert(got(ts(1, 0)) == batchEst(w1), s"w1: ${got(ts(1, 0))}")

    // rollup: union semantics — equals one batch sketch over ALL closed
    // windows' events, and is strictly less than the per-window sum
    // (overlap 21..40 counted once)
    val closed = w0 ++ w1 ++ Seq((ts(5, 0), 999L))
    val rolled = CardinalityMonitor.rollup(spark, sink).as[Double].head()
    assert(rolled == batchEst(closed), s"rollup $rolled != batch")
    assert(rolled < got(ts(0, 0)) + got(ts(1, 0)) + 1.0,
      "rollup must not double-count the overlapping users")
  }

  test("streaming state is windowed aggregation, not per-key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val plan = CardinalityMonitor.sketches(
      input.toDF().toDF("ts", "user_id"),
      CardConfig()).queryExecution.analyzed.toString
    // grouping is the event-time window alone — per-key state would
    // show user_id among the grouping expressions
    assert(plan.contains("window"), plan)
    assert(!plan.matches("(?s).*Aggregate \\[[^\\]]*user_id[^\\]]*\\], .*"),
      s"per-key grouping leaked into the streaming aggregate:\n$plan")
  }
}
