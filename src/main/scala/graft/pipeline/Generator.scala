package graft.pipeline

import java.io.{File, FileWriter}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Locale

/** Deterministic NDJSON event generator — same workload semantics as the
  * reference's generator (`data_generator.py`): `rate` events per simulated
  * second across 5 bridges × 3 sensors, event_time lagging ingest_time by
  * uniform(0, 60 s) to exercise late-data/watermark behavior
  * (`data_generator.py:34-36`), sensor-specific value ranges rounded to
  * 3 dp (`:39-44,50`), files flushed per sensor per `flushIntervalSec` of
  * simulated time into Hive-partitioned dirs
  * `streams/bridge_<sensor>/date=YYYY-MM-DD/events_<n>.json` (`:71-85`).
  *
  * Differences by design: time is *simulated* from a fixed base instant
  * (no sleeping, no wall clock) so tests are instant and reproducible; the
  * seed is mandatory (the reference's `--test-seed`).
  */
object Generator {

  /** CLI mirroring the reference generator's surface
    * (`data_generator.py:139-165`):
    * `runMain graft.pipeline.Generator <landingRoot> [rate] [durationSeconds] [seed]` */
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(sys.error("usage: Generator <landingRoot> [rate] [duration] [seed]"))
    val rate = args.lift(1).map(_.toInt).getOrElse(10)
    val duration = args.lift(2).map(_.toInt).getOrElse(60)
    val seed = args.lift(3).map(_.toLong).getOrElse(42L)
    val n = generate(root, rate, duration, seed)
    println(s"[generator] wrote $n events to $root (rate=$rate duration=${duration}s seed=$seed)")
  }

  val bridges: Seq[Int] = 1 to 5
  val sensors: Seq[String] = Schemas.sensors

  private val isoFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(ZoneOffset.UTC)
  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  private def valueFor(rng: java.util.Random, sensor: String): Double = {
    val raw = sensor match {
      case "temperature" => 5.0 + rng.nextDouble() * 35.0 // 5–40 °C
      case "vibration"   => rng.nextDouble() * 10.0       // 0–10
      case _             => rng.nextDouble() * 30.0       // tilt 0–30°
    }
    math.round(raw * 1000.0) / 1000.0
  }

  /** One generated raw event, already JSON-encoded (NDJSON line). */
  private def eventJson(rng: java.util.Random, ingest: Instant): (String, String) = {
    val sensor = sensors(rng.nextInt(sensors.size))
    val bridge = bridges(rng.nextInt(bridges.size))
    val lagMs = (rng.nextDouble() * 60000.0).toLong // 0–60 s late
    val eventTime = ingest.minusMillis(lagMs)
    val v = valueFor(rng, sensor)
    val line =
      s"""{"event_time": "${isoFmt.format(eventTime)}", "bridge_id": $bridge, """ +
        s""""sensor_type": "$sensor", "value": ${"%.3f".formatLocal(Locale.US, v)}, """ +
        s""""ingest_time": "${isoFmt.format(ingest)}"}"""
    (sensor, line)
  }

  /** Generate `durationSeconds` of simulated traffic at `rate` events per
    * second, flushing one file per sensor per `flushIntervalSec`. Returns
    * the number of events written. */
  def generate(landingRoot: String, rate: Int, durationSeconds: Int, seed: Long,
               base: Instant = Instant.parse("2024-03-01T00:00:00Z"),
               flushIntervalSec: Int = 10): Int = {
    val rng = new java.util.Random(seed)
    var written = 0
    var fileIdx = 0
    // filenames are namespaced by ALL run parameters: a second generate()
    // into the same landing zone must never reuse a path with different
    // content — Spark's file-stream source tracks seen files by path and
    // silently ignores overwritten ones. Identical-argument calls produce
    // byte-identical files (idempotent); any differing argument changes
    // the tag.
    val runTag = s"${base.getEpochSecond}_${seed}_${rate}x$durationSeconds"
    val buffers = scala.collection.mutable.Map.empty[String, StringBuilder]
    def flush(at: Instant): Unit = {
      buffers.foreach { case (sensor, sb) =>
        if (sb.nonEmpty) {
          val dir = new File(s"$landingRoot/bridge_$sensor/date=${dateFmt.format(at)}")
          dir.mkdirs()
          val f = new FileWriter(new File(dir, f"events_${runTag}_$fileIdx%05d.json"))
          try f.write(sb.toString) finally f.close()
        }
      }
      buffers.clear()
      fileIdx += 1
    }
    var sec = 0
    while (sec < durationSeconds) {
      val tick = base.plusSeconds(sec)
      var i = 0
      while (i < rate) {
        val (sensor, line) = eventJson(rng, tick)
        buffers.getOrElseUpdate(sensor, new StringBuilder).append(line).append('\n')
        written += 1
        i += 1
      }
      sec += 1
      if (sec % flushIntervalSec == 0) flush(tick)
    }
    flush(base.plusSeconds(durationSeconds.toLong))
    written
  }

  /** Write the 5-row bridges dimension CSV (ref `metadata/bridges.csv`). */
  def writeBridgesCsv(path: String): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new FileWriter(f)
    try {
      w.write("bridge_id,name,location,installation_date\n")
      val rows = Seq(
        (1, "Bridge A", "City X", "2010-05-01"),
        (2, "Bridge B", "City X", "2012-08-15"),
        (3, "Bridge C", "City Y", "2015-03-30"),
        (4, "Bridge D", "City Y", "2018-11-11"),
        (5, "Bridge E", "City Z", "2020-07-04"))
      rows.foreach { case (id, n, loc, d) => w.write(s"$id,$n,$loc,$d\n") }
    } finally w.close()
  }
}
