package graft

import org.apache.spark.sql.functions._
import graft.pipeline.RateIngest

/** The continuous-source path: a prefix of the rate-backed event stream
  * must equal the batch mapping over the same ids (pure-function-of-id
  * determinism), and the stream must compose with a downstream stateful
  * operator unchanged. */
class RateIngestSpec extends SparkSuite {
  import spark.implicits._

  test("streamed events equal the batch mapping over the same ids") {
    val sink = tmpDir("rate-sink")
    val cp = tmpDir("rate-cp")
    val q = RateIngest.events(spark, rowsPerBatch = 100)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(10))
      .start()
    try {
      // rate-micro-batch is unbounded: run until a few batches landed
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 300 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        n = try spark.read.parquet(sink).count() catch { case _: Exception => 0L }
      }
      assert(n >= 300, s"stream produced only $n rows in 60s")
    } finally q.stop()

    val got = spark.read.parquet(sink)
    val ids = got.select("event_id").as[Long].collect()
    assert(ids.distinct.length == ids.length, "rate ids must be unique")
    // batch-side recompute over a synthetic (timestamp, value) frame with
    // the SAME timestamps the source emitted (1000 ms per 100-row batch)
    val base = spark.range(ids.max + 1).select(
      timestamp_millis(floor(col("id") / 100) * 1000).as("timestamp"),
      col("id").as("value"))
    val want = RateIngest.mapRate(base)
      .where(col("event_id").isin(ids.toSeq: _*))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed prefix must equal the pure batch mapping")
    // sanity on the synthesized distributions
    val types = got.select("event_type").distinct().as[String].collect().toSet
    assert(types == Set("signup", "click", "error", "view", "purchase"))
    assert(got.where(col("value") < 0).isEmpty)
    assert(got.where(col("user_id") < 0 || col("user_id") >= 15000).isEmpty)
  }

  test("rate-backed events drive the quantile monitor unchanged") {
    val sink = tmpDir("rate-qm-sink")
    val cp = tmpDir("rate-qm-cp")
    // 100 rows per batch, event time advancing 30s per batch: 1-minute
    // windows close after a few batches under the 30s watermark
    val cfg = graft.pipeline.QuantileMonitor.MonitorConfig(
      windowDur = "1 minute", watermark = "30 seconds")
    val q = graft.pipeline.QuantileMonitor.start(spark,
      RateIngest.events(spark, rowsPerBatch = 100, advanceMillisPerBatch = 30000L),
      cfg, sink, cp,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(10))
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 1 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        n = try spark.read.parquet(sink).count() catch { case _: Exception => 0L }
      }
      assert(n >= 1, "no window closed within 60s")
    } finally q.stop()
    val quants = graft.pipeline.QuantileMonitor.quantiles(spark, sink, Seq(0.5))
    assert(quants.count() > 0)
    assert(quants.where(col("est") < 0).isEmpty, "exp-distributed values: median > 0")
    // the advance option must really apply: 30 s of event time per
    // 100-row batch → a closed 1-minute window holds 200 events, 40 per
    // event_type group (the silent-default failure mode would put 1200)
    assert(quants.where(col("n_values") =!= 40).isEmpty,
      quants.select("window_start", "n_values").distinct().collect().mkString(", "))
  }
}
