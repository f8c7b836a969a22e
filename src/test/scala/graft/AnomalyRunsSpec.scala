package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.pipeline.{AnomalyRuns, SensorReading}

/** Custom-state streaming operator: consecutive-anomaly runs must alert
  * exactly once per streak, with the streak surviving micro-batch
  * boundaries (the part no built-in stateful operator expresses). */
class AnomalyRunsSpec extends SparkSuite {
  import spark.implicits._

  private def r(bridge: Int, sec: Int, v: Double) =
    SensorReading(bridge, "temperature",
      java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), v)

  test("alerts once per run, state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SensorReading]
    val q = AnomalyRuns.alerts(input.toDS(), _.value > 100.0, minRun = 3)
      .writeStream.format("memory").queryName("anomaly_alerts")
      .outputMode("append").start()
    try {
      // batch 1: two anomalies — below threshold, no alert yet
      input.addData(r(1, 1, 50.0), r(1, 2, 200.0), r(1, 3, 201.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_alerts").count() == 0)

      // batch 2: third consecutive anomaly (streak crosses batches) →
      // exactly one alert; the 4th does NOT re-alert; a normal reading
      // resets; a fresh 3-streak alerts again
      input.addData(r(1, 4, 202.0), r(1, 5, 203.0), r(1, 6, 50.0),
        r(1, 7, 300.0), r(1, 8, 301.0), r(1, 9, 302.0))
      q.processAllAvailable()
      val alerts = spark.table("anomaly_alerts")
        .as[graft.pipeline.AnomalyAlert].collect().sortBy(_.start_ts.getTime)
      assert(alerts.length == 2, alerts.mkString("; "))
      assert(alerts(0).run_len == 3)
      assert(alerts(0).start_ts == java.sql.Timestamp.valueOf("2024-01-01 00:00:02"))
      assert(alerts(0).end_ts == java.sql.Timestamp.valueOf("2024-01-01 00:00:04"))
      assert(alerts(1).start_ts == java.sql.Timestamp.valueOf("2024-01-01 00:00:07"))
      assert(alerts(1).end_ts == java.sql.Timestamp.valueOf("2024-01-01 00:00:09"))

      // independent keys: bridge 2 keeps its own streak
      input.addData(r(2, 10, 500.0), r(2, 11, 500.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_alerts").count() == 2)
      input.addData(r(2, 12, 500.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_alerts").count() == 3)
    } finally q.stop()
  }

  test("out-of-order readings within one batch fold in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SensorReading]
    val q = AnomalyRuns.alerts(input.toDS(), _.value > 100.0, minRun = 2)
      .writeStream.format("memory").queryName("anomaly_alerts_ooo")
      .outputMode("append").start()
    try {
      // arrival order: bad(t=3), ok(t=2), bad(t=1) — event-time order is
      // bad, ok, bad → longest run is 1, no alert
      input.addData(r(1, 3, 200.0), r(1, 2, 50.0), r(1, 1, 200.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_alerts_ooo").count() == 0)
      // arrival order: bad(t=5), bad(t=4) → run of 2 in event order
      input.addData(r(1, 5, 200.0), r(1, 4, 200.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_alerts_ooo").count() == 1)
    } finally q.stop()
  }
}
