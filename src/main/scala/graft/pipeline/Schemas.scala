package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas for every layer of the bridge-monitoring medallion DAG
  * (SURVEY.md §1.2). Streaming reads always get an explicit schema — the
  * reference's one deviation (gold inferring silver's schema from a batch
  * sample read, `gold_aggregation.py:27-28`) is a startup-order hazard we
  * deliberately do not reproduce.
  */
object Schemas {

  /** Raw landing-zone event (ref `data_generator.py:46-52`). */
  val raw: StructType = StructType(Seq(
    StructField("event_time", StringType),
    StructField("bridge_id", IntegerType),
    StructField("sensor_type", StringType),
    StructField("value", DoubleType),
    StructField("ingest_time", StringType)))

  /** Raw schema + the landing zone's `date=` Hive partition column. The
    * column MUST be declared in the stream-read schema: a file-stream
    * source started against an empty landing dir captures a plan schema
    * without it, and the first batch that lists `date=` subdirs then
    * carries a discovered extra column — killing the query with
    * "Invalid batch: ... != ... date#N" on any cold start. */
  val rawLanding: StructType = StructType(raw.fields :+ StructField("date", StringType))

  /** Bronze = raw + parsed timestamps + partition date
    * (ref `bronze_ingest.py:18-24,44-49`). */
  val bronze: StructType = StructType(raw.fields ++ Seq(
    StructField("event_time_ts", TimestampType),
    StructField("ingest_time_ts", TimestampType),
    StructField("partition_date", DateType)))

  /** Bridges dimension (ref `silver_enrichment.py:22-27`);
    * installation_date stays a string, as in the reference. */
  val bridges: StructType = StructType(Seq(
    StructField("bridge_id", IntegerType),
    StructField("name", StringType),
    StructField("location", StringType),
    StructField("installation_date", StringType)))

  /** Silver = bronze + dimension columns (ref `silver_enrichment.py:104-106`). */
  val silver: StructType = StructType(bronze.fields ++ Seq(
    StructField("name", StringType),
    StructField("location", StringType),
    StructField("installation_date", StringType)))

  /** Gold windowed metrics (ref `gold_aggregation.py:102-109`). */
  val gold: StructType = StructType(Seq(
    StructField("bridge_id", IntegerType),
    StructField("window_start", TimestampType),
    StructField("window_end", TimestampType),
    StructField("avg_temperature", DoubleType),
    StructField("max_vibration", DoubleType),
    StructField("max_tilt_angle", DoubleType)))

  val sensors: Seq[String] = Seq("temperature", "vibration", "tilt")
}
