package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.KafkaShape

/** The documented "one-line Kafka swap" as running code: a broker-shaped
  * (key, value, topic, partition, offset, timestamp) frame goes through
  * the from_json projection into the same operators RateIngest drives,
  * with every schema-drift case routed to quarantine instead of thrown
  * or silently nulled. */
class KafkaShapeSpec extends SparkSuite {
  import spark.implicits._

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")
  private val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def payload(id: Long, ts: String, user: Long, et: String,
                      v: Double): String =
    s"""{"event_id":$id,"ts":"$ts","user_id":$user,"event_type":"$et","value":$v,"props":"{}"}"""

  test("drift matrix: valid / extra-field / missing-field / corrupt / tombstone / bad ts") {
    val rows = Seq(
      // valid
      (b("k1"), b(payload(1, "2024-01-01T00:00:05", 7, "view", 1.5)),
        "events", 0, 100L, T0),
      // EXTRA field: producers add fields before consumers upgrade —
      // must bind by name and stay valid
      (b("k2"), b("""{"event_id":2,"ts":"2024-01-01T00:00:06","user_id":8,"event_type":"click","value":2.0,"props":"{}","brand_new_field":true}"""),
        "events", 0, 101L, T0),
      // MISSING required field (no event_type)
      (b("k3"), b("""{"event_id":3,"ts":"2024-01-01T00:00:07","user_id":9,"value":3.0}"""),
        "events", 1, 102L, T0),
      // corrupt JSON
      (b("k4"), b("""{"event_id":4,"ts":"""), "events", 1, 103L, T0),
      // tombstone (null payload)
      (null, null, "events", 0, 104L, T0),
      // unparseable timestamp
      (b("k6"), b(payload(6, "not-a-time", 11, "view", 6.0)),
        "events", 2, 105L, T0))
    val parsed = KafkaShape.parseEvents(KafkaShape.frame(spark, rows))

    val reasons = parsed.select($"offset", $"quarantine_reason")
      .as[(Long, Option[String])].collect().toMap
    assert(reasons == Map(
      100L -> None, 101L -> None,
      102L -> Some("missing_required"),
      103L -> Some("corrupt_json"),
      104L -> Some("null_payload"),
      105L -> Some("bad_timestamp")), reasons.toString)

    // valid side is typed and RateIngest-shaped
    val ok = KafkaShape.valid(parsed)
    assert(ok.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(ok.select($"event_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(ok.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)

    // quarantine keeps replay provenance: reason + exact offset + raw
    val bad = KafkaShape.quarantined(parsed)
    assert(bad.count() == 4)
    val corrupt = bad.where($"quarantine_reason" === "corrupt_json")
      .select($"offset", $"raw").as[(Long, String)].collect().toSeq
    assert(corrupt == Seq((103L, """{"event_id":4,"ts":""")))
  }

  test("streamed broker frame drives the same downstream ops as RateIngest") {
    implicit val sqlCtx = spark.sqlContext
    // stream the broker SHAPE through the projection into a watermarked
    // windowed aggregation — the quantile monitor's consumption contract
    val input = MemoryStream[(Array[Byte], String, Int, Long)]
    val stream = input.toDF().toDF("value", "topic", "partition", "offset")
      .select(lit(null).cast("binary").as("key"), $"value", $"topic",
        $"partition", $"offset", lit(T0).as("timestamp"),
        lit(0).as("timestampType"))
    val events = KafkaShape.valid(KafkaShape.parseEvents(stream))

    val sink = tmpDir("ks-sink"); val cp = tmpDir("ks-cp")
    val counts = events
      .withWatermark("ts", "2 minutes")
      .groupBy($"event_type", window($"ts", "1 minute"))
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .select($"event_type", $"window.start".as("ws"), $"n", $"sv")
    val feed = Seq(
      payload(1, "2024-01-01T00:00:05", 1, "view", 1.0),
      payload(2, "2024-01-01T00:00:25", 2, "view", 2.0),
      payload(3, "2024-01-01T00:00:45", 3, "click", 4.0),
      """{"bad json""", // corrupt row rides the same stream, silently routed out
      payload(4, "2024-01-01T00:05:00", 4, "view", 0.0)) // watermark sentinel
    input.addData(feed.zipWithIndex.map { case (p, i) =>
      (b(p), "events", 0, i.toLong) }: _*)
    val q1 = counts.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q1.awaitTermination() finally q1.stop()
    // advance watermark past the window under test
    input.addData((b(payload(5, "2024-01-01T00:10:00", 5, "view", 0.0)),
      "events", 0, 99L))
    val q2 = counts.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()

    val got = spark.read.parquet(sink)
      .where($"ws" === java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      .select($"event_type", $"n", $"sv")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("view", 2L, 3.0), ("click", 1L, 4.0)), got.toString)
  }
}
