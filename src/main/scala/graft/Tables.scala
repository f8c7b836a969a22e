package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables at `/root/testdata/sf*`
  * (see TESTDATA.md). All engine operators take DataFrames, so these are
  * the only places that know about physical paths.
  *
  * Scale posture: plain `spark.read.parquet` gives Spark's vectorized
  * Parquet reader with predicate pushdown, column pruning and (for
  * partitioned layouts) partition pruning for free — on a cluster the same
  * call scans 100 TB split by `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path flows through here, so the library's native
    // functions are always registered regardless of query-map iteration
    // order (idempotent, cheap)
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as a long and truncate
    * to microseconds — the same truncation DuckDB applies implicitly — so
    * both engines see identical timestamp values.
    *
    * The session-conf mutation is deliberate: `nanosAsLong` is a legacy
    * SQL conf with NO reader-level (`.option(...)`) equivalent — probed on
    * Spark 4.1.2, a reader option is ignored and the scan still throws.
    * The conf only affects schema mapping of nanos columns (a no-op for
    * every other table here) and is idempotent, so setting it per read is
    * the least-state alternative available. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Time-bounded events read with the lower bound applied to the RAW
    * nanosecond long, BEFORE the timestamp conversion: a predicate on
    * `timestamp_micros(ts div 1000)` cannot push through the projection,
    * but `ts >= <nanos>` reaches the parquet scan as a pushed filter and
    * prunes row groups — the difference between scanning a day and
    * scanning 100 TB. Equivalent row set for whole-second bounds (nanos
    * below the bound truncate to a microsecond value below it too). */
  def eventsFrom(s: SparkSession, d: String, fromUtc: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val inst = java.time.Instant.parse(fromUtc)
    val nanos = Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000000L), inst.getNano.toLong)
    load(s, d, "events")
      .where(org.apache.spark.sql.functions.col("ts") >= nanos)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
