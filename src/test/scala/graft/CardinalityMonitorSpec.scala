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

  test("mixed-lgK sink generations union-merge instead of throwing") {
    // a restart with a retuned CardConfig writes sketches at a different
    // lgK into the SAME sink; estimates/rollup must downgrade to the
    // smaller lgK, not fail at read time
    val sink = tmpDir("cm-mixed")
    def gen(users: Range, minute: Int, lgK: Int): Unit =
      users.map(u => (ts(minute, (u % 60).toInt), u.toLong))
        .toDF("ts", "user_id")
        .groupBy(window($"ts", "1 minute"))
        .agg(hll_sketch_agg($"user_id", lit(lgK)).as("sk"))
        .select($"window.start".as("window_start"),
          $"window.end".as("window_end"), $"sk")
        .write.mode("append").parquet(sink)
    gen(1 to 40, minute = 0, lgK = 12)
    gen(21 to 60, minute = 0, lgK = 10) // same window, different config
    val est = CardinalityMonitor.estimates(spark, sink)
      .select($"approx_distinct").as[Double].collect()
    assert(est.length == 1 && est.head > 55 && est.head < 65,
      s"union over mixed lgK should see ~60 distinct: ${est.toSeq}")
    val rolled = CardinalityMonitor.rollup(spark, sink).as[Double].head()
    assert(rolled > 55 && rolled < 65, s"rollup $rolled")
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
