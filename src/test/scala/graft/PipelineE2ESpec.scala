package graft

import java.io.{File, FileWriter}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Golden end-to-end run (SURVEY.md §5): seeded generator → bronze →
  * silver → gold through temp dirs, with injected DQ violations and a
  * two-phase drain so the gold watermark advances and append-mode windows
  * finalize (SURVEY.md §7.5 hard parts 1–2).
  */
class PipelineE2ESpec extends SparkSuite {

  private val root = tmpDir("graft-e2e")
  private val cfg = PipelineConfig.under(root, s"$root/bridges.csv")

  private def writeLanding(sensor: String, date: String, name: String, lines: Seq[String]): Unit = {
    val dir = new File(s"${cfg.landingDir(sensor)}/date=$date")
    dir.mkdirs()
    val w = new FileWriter(new File(dir, name))
    try w.write(lines.mkString("", "\n", "\n")) finally w.close()
  }

  test("bronze/silver/gold with quarantine routing and watermark finalization") {
    Generator.writeBridgesCsv(cfg.bridgesCsv)
    // phase 1: 2 simulated minutes of valid traffic
    val n = Generator.generate(cfg.landingRoot, rate = 5, durationSeconds = 120, seed = 42L)
    assert(n == 600)
    // injected violations (phase 1):
    writeLanding("temperature", "2024-03-01", "inject_bad.json", Seq(
      // unparseable event_time -> bronze quarantine (F1)
      """{"event_time": "not-a-timestamp", "bridge_id": 1, "sensor_type": "temperature", "value": 20.0, "ingest_time": "2024-03-01T00:00:30.000Z"}""",
      // null value -> bronze quarantine (F1)
      """{"event_time": "2024-03-01T00:00:10.000Z", "bridge_id": 2, "sensor_type": "temperature", "value": null, "ingest_time": "2024-03-01T00:00:30.000Z"}""",
      // out-of-range temperature -> silver quarantine (F3)
      """{"event_time": "2024-03-01T00:00:20.000Z", "bridge_id": 3, "sensor_type": "temperature", "value": 999.0, "ingest_time": "2024-03-01T00:00:40.000Z"}""",
      // unknown bridge, valid value -> silver with null dimension (J1 left join)
      """{"event_time": "2024-03-01T00:00:25.000Z", "bridge_id": 99, "sensor_type": "temperature", "value": 21.5, "ingest_time": "2024-03-01T00:00:45.000Z"}"""))

    Pipelines.drainOnce(spark, cfg)

    val bronzeAll = Schemas.sensors.map(s => spark.read.parquet(cfg.bronzeDir(s)))
      .reduce(_ unionByName _)
    assert(bronzeAll.count() == n + 2) // 600 valid + out-of-range + unknown-bridge
    assert(bronzeAll.columns.toSet == Schemas.bronze.fieldNames.toSet)
    val bronzeRejected = spark.read.parquet(cfg.bronzeRejectedRoot)
    assert(bronzeRejected.count() == 2) // bad ts + null value

    val silverTemp = spark.read.parquet(cfg.silverDir("temperature"))
    assert(silverTemp.columns.toSet == Schemas.silver.fieldNames.toSet)
    val silverRejected = spark.read.parquet(cfg.silverRejectedRoot)
    assert(silverRejected.count() == 1) // the 999.0 temperature
    assert(silverRejected.head.getAs[Double]("value") == 999.0)
    // join success: known bridges enriched, unknown bridge kept with nulls
    assert(silverTemp.where(col("bridge_id") === 99).count() == 1)
    assert(silverTemp.where(col("bridge_id") === 99 && col("name").isNull).count() == 1)
    assert(silverTemp.where(col("bridge_id") <= 5 && col("name").isNull).count() == 0)

    // gold: after one drain the watermark has not passed any window end in
    // the same batch, so append mode emitted nothing yet
    val goldAfter1 = spark.read.schema(Schemas.gold).parquet(cfg.goldDir)
    assert(goldAfter1.count() == 0)

    // phase 2: traffic 10 simulated minutes later advances the watermark
    // past every phase-1 window end
    Generator.generate(cfg.landingRoot, rate = 5, durationSeconds = 60, seed = 43L,
      base = java.time.Instant.parse("2024-03-01T00:10:00Z"))
    Pipelines.drainOnce(spark, cfg)

    val gold = spark.read.parquet(cfg.goldDir)
    assert(gold.count() > 0)
    assert(gold.columns.toSet == Schemas.gold.fieldNames.toSet)
    // emitted exactly once per (bridge, window)
    assert(gold.groupBy("bridge_id", "window_start").count().where(col("count") > 1).count() == 0)

    // values match a batch recomputation over silver for the same windows
    val silverAll = Schemas.sensors.map(s => spark.read.parquet(cfg.silverDir(s)))
      .reduce(_ unionByName _)
    val expected = silverAll
      .groupBy(col("bridge_id"), window(col("event_time_ts"), "1 minute").as("w"),
        col("sensor_type"))
      .agg(avg("value").as("a"), max("value").as("m"))
      .groupBy(col("bridge_id"), col("w.start").as("window_start"))
      .agg(
        max(when(col("sensor_type") === "temperature", col("a"))).as("e_avg_temp"),
        max(when(col("sensor_type") === "vibration", col("m"))).as("e_max_vib"),
        max(when(col("sensor_type") === "tilt", col("m"))).as("e_max_tilt"))
    val joined = gold.join(expected, Seq("bridge_id", "window_start"))
    assert(joined.count() == gold.count()) // every emitted window recomputable
    val mismatches = joined.where(
      abs(col("avg_temperature") - col("e_avg_temp")) > 1e-9 ||
        abs(col("max_vibration") - col("e_max_vib")) > 1e-9 ||
        abs(col("max_tilt_angle") - col("e_max_tilt")) > 1e-9)
    assert(mismatches.count() == 0)
  }

  test("late event beyond the watermark is dropped from gold") {
    // phase 3: an event far older than the current watermark (~00:09)
    writeLanding("temperature", "2024-03-01", "inject_late.json", Seq(
      """{"event_time": "2024-03-01T00:00:05.000Z", "bridge_id": 1, "sensor_type": "temperature", "value": 39.999, "ingest_time": "2024-03-01T00:11:00.000Z"}"""))
    val goldBefore = spark.read.parquet(cfg.goldDir).count()
    Pipelines.drainOnce(spark, cfg)
    val gold = spark.read.parquet(cfg.goldDir)
    // the late row reached silver but its (already finalized) window was
    // not re-emitted, and no window carries its sentinel value
    assert(gold.count() == goldBefore)
    assert(gold.where(col("avg_temperature") === 39.999).count() == 0)
  }
}
