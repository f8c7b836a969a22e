package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Stream-stream interval join: purchases matched to the same user's
  * views within the trailing 30 minutes, as a watermarked streaming
  * query (the streaming counterpart of q60). */
class StreamRangeJoinSpec extends SparkSuite {

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("interval join matches in-window views across micro-batches, drops out-of-window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val purchases = MemoryStream[(String, Timestamp, Long)]
    val views = MemoryStream[(String, Timestamp, Double)]
    val p = purchases.toDF.toDF("k", "pts", "pid").withWatermark("pts", "10 minutes")
    val v = views.toDF.toDF("k", "vts", "vv").withWatermark("vts", "10 minutes")

    val joined = RangeJoin.intervalJoinStream(p, v, "k", "pts", "vts",
        before = Duration.ofMinutes(30), after = Duration.ZERO)
      .select(col("pid"), col("vv"))

    val q = joined.writeStream.format("memory").queryName("stream_rj")
      .outputMode("append").start()
    try {
      // batch 1: one purchase at 10:30, views at 10:00 (boundary, in),
      // 10:20 (in), 10:31 (after purchase → out), 09:59 (out)
      purchases.addData(("u1", ts(10, 30), 1L))
      views.addData(("u1", ts(10, 0), 1.0), ("u1", ts(10, 20), 2.0),
        ("u1", ts(10, 31), 3.0), ("u1", ts(9, 59), 4.0), ("u2", ts(10, 20), 5.0))
      q.processAllAvailable()
      // batch 2: a view arriving in a LATER micro-batch still joins a
      // buffered purchase (symmetric hash join state)
      views.addData(("u1", ts(10, 29), 6.0))
      q.processAllAvailable()

      val got = spark.table("stream_rj").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 1.0), (1L, 2.0), (1L, 6.0)))
    } finally q.stop()
  }
}
