package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broker-shaped ingestion: the projection that sits between a Kafka
  * source and the event operators.
  *
  * [[RateIngest]] documents the production swap as "one `format("kafka")`
  * plus a `from_json` projection"; this module IS that projection,
  * exercised broker-free. A Kafka source emits a fixed frame — (key
  * binary, value binary, topic, partition, offset, timestamp,
  * timestampType) — and everything this engine needs is a parse of
  * `value` with explicit schema-drift routing. The real-world failure
  * mode is not the happy path but drift: a producer drops a field, adds
  * one, or ships malformed bytes. Routing mirrors the landing-zone
  * contract (reference `bronze_ingest.py:26-42`): never throw, never
  * silently null — quarantine with a reason.
  *
  * Drift semantics:
  *  - tombstone / null payload        → `null_payload`
  *  - malformed JSON                  → `corrupt_json` (PERMISSIVE parse
  *    with a corrupt-record column, so partial JSON cannot masquerade as
  *    an all-null valid row)
  *  - missing required field          → `missing_required`
  *  - unparseable event timestamp     → `bad_timestamp` (ANSI-safe
  *    `try_to_timestamp`, as everywhere else in the engine)
  *  - EXTRA fields in the payload     → ignored by construction
  *    (`from_json` binds by name against the declared schema)
  *
  * Provenance (topic, partition, offset, broker timestamp) rides along
  * on every row — quarantined rows are replayable to the exact offset.
  * All of it is per-row column work: no shuffle, no state, fully
  * codegen'd, so the projection adds nothing to the streaming
  * topology's scale posture.
  */
object KafkaShape {

  /** The Kafka source's frame, verbatim (spark-sql-kafka emits exactly
    * this) — specs synthesize it so no broker is needed. */
  val sourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Payload contract: the events-table columns, event time as an ISO
    * string (parsed separately, so a bad timestamp is ROUTED, not
    * thrown). `_corrupt` captures malformed input under PERMISSIVE. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt", StringType)))

  /** Parse + route one broker-shaped frame. Output carries the typed
    * event columns, provenance, and `quarantine_reason` (null = valid).
    * Works identically on a batch or streaming frame. */
  def parseEvents(df: DataFrame): DataFrame = {
    val parsed = df.select(
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("broker_ts"),
      col("value").cast("string").as("raw"))
      .withColumn("j", when(col("raw").isNotNull,
        from_json(col("raw"), payloadSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt"))))
    parsed.select(
      col("j.event_id").as("event_id"),
      try_to_timestamp(col("j.ts")).as("ts"),
      col("j.user_id").as("user_id"),
      col("j.event_type").as("event_type"),
      col("j.value").as("value"),
      col("j.props").as("props"),
      col("topic"), col("partition"), col("offset"), col("broker_ts"),
      col("raw"),
      when(col("raw").isNull, "null_payload")
        .when(col("j").isNull || col("j._corrupt").isNotNull, "corrupt_json")
        .when(col("j.event_id").isNull || col("j.event_type").isNull
          || col("j.ts").isNull, "missing_required")
        .when(try_to_timestamp(col("j.ts")).isNull, "bad_timestamp")
        .as("quarantine_reason"))
  }

  /** Valid events, shaped exactly like [[RateIngest.mapRate]]'s output —
    * the downstream operators (quantile monitor, DQ, curation) consume
    * this frame without knowing the source was a broker. */
  def valid(parsed: DataFrame): DataFrame =
    parsed.where(col("quarantine_reason").isNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))

  /** Quarantined rows with reason + full provenance + raw payload — the
    * audit trail that makes drift debuggable and replayable. */
  def quarantined(parsed: DataFrame): DataFrame =
    parsed.where(col("quarantine_reason").isNotNull)
      .select(col("quarantine_reason"), col("topic"), col("partition"),
        col("offset"), col("broker_ts"), col("raw"))

  /** Helper for specs and local drills: wrap (key, value, topic,
    * partition, offset, ts) tuples into the exact source frame. */
  def frame(spark: SparkSession,
            rows: Seq[(Array[Byte], Array[Byte], String, Int, Long,
              java.sql.Timestamp)]): DataFrame = {
    import org.apache.spark.sql.Row
    val withType = rows.map { case (k, v, t, p, o, ts) =>
      Row(k, v, t, p, o, ts, 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(withType), sourceSchema)
  }
}
