package graft.tools

import org.apache.spark.sql.functions._

/** Per-round machine-readable STREAMING correctness artifact
  * (`perf/streaming_gate.json`) — the driver's correctness gate is
  * batch-only (DuckDB oracles), so without this a streaming regression
  * could hide behind a green batch artifact (round-10 verdict item 4).
  *
  * One run = the full medallion DAG (3 bronze sources → quarantine/
  * silver routing → 5-stateful-op gold join+window) drained end-to-end
  * TWICE, under the HDFS-backed and RocksDB state-store providers, at a
  * gate-sized corpus, plus an exactly-once restart probe. Checks
  * recorded (each a named pass/fail the driver can ingest):
  *
  *  - `equal_output`    — both providers emit the identical gold rowset
  *                        (count + order-independent multiset checksum);
  *  - `nonzero_gold`    — the drain actually produced windows (a gate
  *                        that green-lights an empty pipeline is no gate);
  *  - `bounded_state`   — peak state rows stay at watermark scale
  *                        (< `maxStateRows`, default 100× the ~900-row
  *                        1M-event GoldSoak ceiling — state must track
  *                        in-flight windows, not corpus size);
  *  - `exactly_once`    — restarting the gold query on the SAME
  *                        checkpoint with no new input emits ZERO new
  *                        rows (idempotent recovery).
  *
  * Usage: `runMain graft.tools.StreamingGate [outJson] [rate] [durationSec]`
  * (defaults: perf/streaming_gate.json, 100, 1200 → 120k events, ~2 min).
  * Exit is nonzero on any failed check. The full-scale counterpart
  * (1M events) remains [[GoldSoak]]; this gate reuses its drain. */
object StreamingGate {

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("perf/streaming_gate.json")
    val rate = args.lift(1).map(_.toInt).getOrElse(100)
    val duration = args.lift(2).map(_.toInt).getOrElse(1200)
    val maxStateRows = 100000L
    val spark = GoldSoak.session()
    val work = java.nio.file.Files.createTempDirectory("graft-streaming-gate")
      .toString

    val (equal, soakDoc) = GoldSoak.run(spark, work, rate, duration, fpt = 40)

    // parse back the two runs' headline numbers from the soak doc (the
    // JSON is this repo's own single-line format; a regex pull keeps the
    // gate free of JSON-library dependencies)
    def longs(field: String): Seq[Long] =
      s""""$field":(-?\\d+)""".r.findAllMatchIn(soakDoc)
        .map(_.group(1).toLong).toSeq
    val goldRows = longs("gold_out_rows")
    val peakRows = longs("state_peak_rows")
    val nonzeroGold = goldRows.forall(_ > 0L)
    val boundedState = peakRows.forall(_ < maxStateRows)

    // exactly-once restart probe: re-start the gold query on the HDFS
    // run's existing checkpoint with NO new input — a correct recovery
    // emits zero additional rows (the committed offsets already cover
    // the whole landing corpus)
    val cfg = graft.pipeline.PipelineConfig(
      landingRoot = s"$work/landing",
      bronzeRoot = s"$work/hdfs/bronze",
      silverRoot = s"$work/hdfs/silver",
      goldRoot = s"$work/hdfs/gold",
      checkpointRoot = s"$work/hdfs/checkpoints",
      bridgesCsv = s"$work/bridges.csv",
      sourceMaxFilesPerTrigger = Some(40))
    cfg.applySessionConf(spark)
    val before = spark.read.schema(graft.pipeline.Schemas.gold)
      .parquet(cfg.goldDir).count()
    val q = graft.pipeline.Gold.start(spark, cfg)
    q.awaitTermination()
    val after = spark.read.schema(graft.pipeline.Schemas.gold)
      .parquet(cfg.goldDir).count()
    val exactlyOnce = after == before

    val pass = equal && nonzeroGold && boundedState && exactlyOnce
    val doc =
      s"""{"gate":"streaming","pass":$pass,""" +
        s""""checks":{"equal_output":$equal,"nonzero_gold":$nonzeroGold,""" +
        s""""bounded_state":$boundedState,"exactly_once":$exactlyOnce},""" +
        s""""gold_rows":[${goldRows.mkString(",")}],""" +
        s""""state_peak_rows":[${peakRows.mkString(",")}],""" +
        s""""restart_rows_before":$before,"restart_rows_after":$after,""" +
        s""""events":${rate.toLong * duration},""" +
        s""""soak":$soakDoc}"""
    Option(new java.io.File(outJson).getParentFile).foreach(_.mkdirs())
    val w = new java.io.FileWriter(outJson)
    try w.write(doc + "\n") finally w.close()
    println(doc)
    spark.stop()
    if (!pass) sys.error(s"streaming gate FAILED — see $outJson")
  }
}
