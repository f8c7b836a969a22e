package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous-source ingestion: the reference pipeline (and this library's
  * E2E specs) ingest FILES; a production deployment sits on a message bus.
  * Spark's source abstraction makes the difference one `format(...)` call —
  * every downstream operator (medallion DQ, curation, the quantile
  * monitor) consumes a DataFrame and never knows. This module wires the
  * built-in `rate-micro-batch` source (deterministic row ids + timestamps,
  * designed for reproducible tests) through a pure-column synthesis of the
  * events schema, so the full streaming surface is exercisable against a
  * continuous unbounded source with NO files and NO external broker.
  * A Kafka deployment swaps `format("rate-micro-batch")` for
  * `format("kafka")` + a `from_json` projection — the transform below and
  * everything after it are unchanged.
  *
  * Determinism: every synthesized column is a pure function of the
  * source's monotonically-increasing `value` id (xxhash64-mixed, the same
  * construction ScaleGen uses), so any prefix of the stream equals the
  * batch mapping applied to `spark.range` — the property RateIngestSpec
  * asserts exactly.
  */
object RateIngest {

  private val EventTypes = Seq("signup", "click", "error", "view", "purchase")

  /** Uniform [0,1) from the row id and a column salt (mirrors ScaleGen's
    * splitmix construction with Spark-native xxhash64). */
  private def u(id: Column, salt: String): Column =
    shiftrightunsigned(xxhash64(id, lit(salt)), 11).cast("double") /
      lit((1L << 53).toDouble)

  /** The schema mapping, shared by stream and batch (spec equality):
    * input needs (timestamp, value) — exactly what rate sources emit. */
  def mapRate(df: DataFrame, nUsers: Int = 15000): DataFrame =
    df.select(
      col("value").as("event_id"),
      col("timestamp").as("ts"),
      pmod(xxhash64(col("value"), lit("user")), lit(nUsers.toLong)).as("user_id"),
      element_at(typedLit(EventTypes), (pmod(col("value"), lit(5L)) + 1).cast("int"))
        .as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - u(col("value"), "val")), 2).as("value"),
      concat(lit("{\"k\": "), (u(col("value"), "k") * 100).cast("int"), lit("}"))
        .as("props"))

  /** Unbounded deterministic event stream: `rowsPerBatch` events per
    * micro-batch, event time advancing `advanceMillisPerBatch` per batch
    * from epoch 0. */
  def events(spark: SparkSession, rowsPerBatch: Int = 100,
             advanceMillisPerBatch: Long = 1000L,
             numPartitions: Int = 2): DataFrame =
    mapRate(spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
      .option("advanceMillisPerBatch", advanceMillisPerBatch)
      .option("startTimestamp", 0L)
      .option("numPartitions", numPartitions.toLong)
      .load())
}
