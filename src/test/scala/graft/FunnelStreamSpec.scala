package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Funnel
import graft.pipeline.FunnelStream

/** Streaming funnel: cross-batch state chains steps exactly like the
  * batch operator on an in-order stream; progress emits append-only and
  * only on advancement. */
case class FunnelProgressRow(user_id: Long, step_reached: Int, ts_micros: Long)

class FunnelStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val steps = Seq("view", "click", "purchase")

  private def runBatches(batches: Seq[Seq[(Long, Timestamp, String)]]): Seq[(Long, Int, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = FunnelStream.funnelEvents(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps)
    val q = FunnelStream.progress(events, steps.size).writeStream
      .format("memory").queryName("funnel_progress")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table("funnel_progress")
      .select($"user_id", $"step_reached", $"ts_micros")
      .as[(Long, Int, Long)].collect().toSeq
  }

  test("cross-batch chaining equals the batch funnel on an in-order stream") {
    // u1 progresses one step per BATCH (state must carry); u2 completes
    // inside batch 1; u3's purchase precedes its click (stays at 2)
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:01"), "click"),
      (2L, ts("2024-01-01 10:00:02"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "view"))
    val b2 = Seq(
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (3L, ts("2024-01-01 10:01:00"), "purchase"))
    val b3 = Seq(
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (3L, ts("2024-01-01 10:02:00"), "click"))
    val log = runBatches(Seq(b1, b2, b3))
    // final position per user = the row with the highest step_reached
    val finalPos = log.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(_._2).max }
    assert(finalPos == Map(1L -> 3, 2L -> 3, 3L -> 2), finalPos.toString)
    // u1 advanced in every batch -> three progress rows; u2 one; u3 two
    val emits = log.groupBy(_._1).map { case (u, r) => u -> r.size }
    assert(emits == Map(1L -> 3, 2L -> 1, 3L -> 2), emits.toString)

    // parity with the batch operator over the union of all batches
    val all = (b1 ++ b2 ++ b3).toDF("user_id", "ts", "event_type")
    val batch = Funnel.funnel(all, "user_id", "ts", "event_type", steps)
      .select($"step", $"n_users").as[(Int, Long)].collect().toMap
    val streamCounts = (1 to steps.size).map(i =>
      i -> finalPos.count(_._2 >= i).toLong).toMap
    assert(batch == streamCounts, s"$batch vs $streamCounts")
  }

  test("checkpointed state survives a restart that LENGTHENS the funnel") {
    val staging = tmpDir("fns-staging")
    val sink = tmpDir("fns-sink")
    val cp = tmpDir("fns-cp")
    def writeSlice(name: String, mtime: Long,
                   rows: Seq[(Long, Timestamp, String)]): Unit = {
      val dir = s"$staging/$name"
      rows.toDF("user_id", "ts", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(mtime))
    }
    def runOnce(steps: Seq[String]): Unit = {
      val stream = spark.readStream
        .schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$staging/*")
      val q = FunnelStream.progress(
          FunnelStream.funnelEvents(stream, "user_id", "ts", "event_type", steps),
          steps.size)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    // run 1: two-step funnel, user completes both -> state length 2
    writeSlice("s1", 1700000000000L, Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click")))
    runOnce(Seq("view", "click"))
    // run 2: SAME checkpoint, three-step funnel — the restored 2-long
    // state must pad, not crash, and the chain must continue into step 3
    writeSlice("s2", 1700000001000L, Seq(
      (1L, ts("2024-01-01 10:02:00"), "purchase")))
    runOnce(Seq("view", "click", "purchase"))
    val rows = spark.read.parquet(sink)
      .as[FunnelProgressRow].collect().map(r => (r.step_reached, r.ts_micros)).toSet
    assert(rows == Set(
      (2, ts("2024-01-01 10:01:00").getTime * 1000),
      (3, ts("2024-01-01 10:02:00").getTime * 1000)), rows.toString)
  }

  private def runBuffered(batches: Seq[Seq[(Long, Timestamp, String)]],
                          delay: String): Map[Long, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = FunnelStream.funnelEventsWatermarked(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, delay)
    val name = s"funnel_buffered_${System.nanoTime()}"
    val q = FunnelStream.progressBuffered(events, steps.size).writeStream
      .format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).select($"user_id", $"step_reached")
      .as[(Long, Int)].collect().toSeq
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
  }

  test("buffered variant: disordered delivery still matches batch semantics") {
    // u1's view is delivered LAST although it happened first. The
    // in-order variant (greedy, no buffer) is stuck at step 1; the
    // watermark-buffered variant reorders inside the 10 s horizon and
    // completes all 3 steps.
    val b1 = Seq((1L, ts("2024-01-01 10:00:05"), "click"),
      (1L, ts("2024-01-01 10:00:08"), "purchase"))
    val b2 = Seq((1L, ts("2024-01-01 10:00:00"), "view"),
      (99L, ts("2024-01-01 10:01:00"), "view")) // flush: advance watermark
    val b3 = Seq((99L, ts("2024-01-01 10:02:00"), "click")) // fire timeouts
    val buffered = runBuffered(Seq(b1, b2, b3), "10 seconds")
    assert(buffered(1L) == 3, buffered.toString)
    val inOrder = runBatches(Seq(b1, b2, b3))
      .groupBy(_._1).map { case (u, r) => u -> r.map(_._2).max }
    assert(inOrder(1L) == 1,
      s"fixture must demonstrate the in-order degradation: $inOrder")
  }

  test("buffered variant: shuffled replay parity under bounded disorder") {
    // 12 users with varied sequences (complete, inverted, partial),
    // arrival = event time + deterministic jitter < 8 s, watermark 10 s:
    // disorder is bounded by the horizon, so the final per-user position
    // must equal the batch chain over the SORTED events — for every user.
    val base = ts("2024-01-01 10:00:00").getTime
    def t(offSec: Int) = new Timestamp(base + offSec * 1000L)
    val rnd = new scala.util.Random(42)
    val events = (1L to 12L).flatMap { u =>
      val o = (u % 4).toInt match {
        case 0 => Seq(("view", 0), ("click", 20), ("purchase", 40))   // full
        case 1 => Seq(("view", 0), ("purchase", 20), ("click", 40))   // inverted tail
        case 2 => Seq(("click", 0), ("purchase", 20))                  // never enters
        case 3 => Seq(("view", 0), ("view", 20), ("click", 21))        // repeat + pair
      }
      o.map { case (tp, s) => (u, t((u % 7).toInt + s), tp) }
    }
    val arrivals = events.sortBy { case (_, tss, _) =>
      tss.getTime + rnd.nextInt(7999) }
    val flushA = Seq((999L, t(3600), "view"))
    val flushB = Seq((999L, t(7200), "click"))
    val batches = arrivals.grouped(5).toSeq ++ Seq(flushA, flushB)
    val got = runBuffered(batches, "10 seconds") - 999L
    // reference: the batch greedy chain per user on time-sorted events
    val expect = events.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map { case (_, tss, tp) =>
        (tss.getTime, steps.indexOf(tp)) }.sortBy(identity)
      val times = Array.fill(steps.size)(-1L)
      sorted.foreach { case (tm, i) =>
        if (times(i) < 0 && (i == 0 || (times(i - 1) >= 0 && tm > times(i - 1))))
          times(i) = tm }
      u -> times.count(_ >= 0)
    }
    val expectReached = expect.filter(_._2 > 0)
    assert(got == expectReached, s"\ngot:    $got\nexpect: $expectReached")
  }

  test("buffered variant: buffer and watermark survive a checkpointed restart") {
    // run 1 buffers u1's (click, purchase) — nothing finalized, nothing
    // emitted; run 2 on the SAME checkpoint delivers the late view plus
    // flush traffic. The BufferedFunnelState (times + buffer) must
    // round-trip the state store and the restored watermark must keep
    // the late view admissible, so the chain completes to step 3.
    val staging = tmpDir("fnb-staging")
    val sink = tmpDir("fnb-sink")
    val cp = tmpDir("fnb-cp")
    def writeSlice(name: String, mtime: Long,
                   rows: Seq[(Long, Timestamp, String)]): Unit = {
      val dir = s"$staging/$name"
      rows.toDF("user_id", "ts", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(mtime))
    }
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$staging/*")
      val q = FunnelStream.progressBuffered(
          FunnelStream.funnelEventsWatermarked(stream, "user_id", "ts",
            "event_type", steps, delay = "10 minutes"),
          steps.size)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    writeSlice("s1", 1700000000000L, Seq(
      (1L, ts("2024-01-01 10:00:05"), "click"),
      (1L, ts("2024-01-01 10:00:08"), "purchase")))
    runOnce()
    assert(spark.read.schema("user_id long, step_reached int, ts_micros long")
      .parquet(sink).isEmpty, "run 1 must emit nothing — all buffered")
    writeSlice("s2", 1700000001000L, Seq(
      (1L, ts("2024-01-01 10:00:00"), "view")))       // late, within horizon
    writeSlice("s3", 1700000002000L, Seq(
      (99L, ts("2024-01-01 10:30:00"), "view")))      // advances watermark
    writeSlice("s4", 1700000003000L, Seq(
      (99L, ts("2024-01-01 11:00:00"), "view")))      // fires the timeout
    runOnce()
    val rows = spark.read.parquet(sink).as[FunnelProgressRow]
      .collect().filter(_.user_id == 1L)
      .map(r => (r.step_reached, r.ts_micros)).toSet
    assert(rows == Set((3, ts("2024-01-01 10:00:08").getTime * 1000)),
      rows.toString)
  }

  test("no progress, no emission; late same-timestamp click never counts") {
    val log = runBatches(Seq(
      Seq((9L, ts("2024-01-01 10:00:00"), "view")),
      Seq((9L, ts("2024-01-01 10:00:00"), "click")), // not strictly after
      Seq((9L, ts("2024-01-01 09:00:00"), "click"))))  // out-of-order past
    assert(log == Seq((9L, 1, ts("2024-01-01 10:00:00").getTime * 1000)),
      log.toString)
  }
}
