package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Windows
import graft.pipeline.SessionStream

/** Streaming sessionization: batch parity on a shuffled multi-batch
  * replay, cross-batch session merging, and gap-split behavior. */
class SessionStreamSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
  private def m(min: Int) = new Timestamp(t0.getTime + min * 60000L)

  /** Run the stream over `batches`, then a far-future flush event for
    * user -1 so the watermark closes every real session. The watermark
    * delay (2h) covers the fixtures' full cross-batch disorder — the
    * same bound a deployment sets to its event bus's reordering. */
  private def run(batches: Seq[Seq[(Long, Timestamp)]]): Seq[(Long, Timestamp, Timestamp, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = SessionStream.sessions(
      input.toDF().toDF("user_id", "ts"), "user_id", "ts", gapMin = 30,
      watermark = "2 hours")
    val name = s"sessions_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData((-1L, new Timestamp(t0.getTime + 86400000L * 30)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .where($"user_id" =!= -1L)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
  }

  test("stream sessions equal the batch sessionize rollup on shuffled batches") {
    // u1: two sessions (gap 45 > 30 between minute 20 and 65);
    // u2: one long session held together by 25-min steps
    val events = Seq(
      (1L, m(0)), (1L, m(10)), (1L, m(20)),
      (1L, m(65)), (1L, m(80)),
      (2L, m(0)), (2L, m(25)), (2L, m(50)))
    val shuffled = events.sortBy { case (u, ts) => (ts.getTime * 7 + u) % 5 }
    val got = run(shuffled.grouped(3).toSeq).toSet

    val batch = Windows.sessionize(
        events.zipWithIndex.map { case ((u, ts), i) => (i.toLong, u, ts) }
          .toDF("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", 30)
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("s"), max($"ts").as("e"),
        count(lit(1)).cast("long").as("n"))
      .select($"user_id", $"s", $"e", $"n")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got == batch, s"stream $got\nbatch $batch")
    assert(got.count(_._1 == 1L) == 2 && got.count(_._1 == 2L) == 1)
  }

  test("a late-but-inside-watermark event merges two provisional sessions") {
    // minute 0 and minute 40 would be two sessions (gap 40 > 30); the
    // minute-20 event arrives in a LATER batch and bridges them
    val got = run(Seq(
      Seq((5L, m(0)), (5L, m(40))),
      Seq((5L, m(20)))))
    assert(got == Seq((5L, m(0), m(40), 3L)), got.toString)
  }

  test("events past the gap start a fresh session") {
    val got = run(Seq(Seq((7L, m(0))), Seq((7L, m(31))))).toSet
    assert(got == Set((7L, m(0), m(0), 1L), (7L, m(31), m(31), 1L)),
      got.toString)
  }
}
