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

  /** (estimated splits, total bytes) for a local parquet path — splits =
    * Σ ceil(fileLen / maxPartitionBytes), an UPPER bound on scan
    * parallelism (parquet can't split below a row group). Computed fresh
    * on every call — pure file-metadata arithmetic (one dir listing, no
    * Spark job), so caching would only buy staleness: a keyed cache here
    * baked in the first session's maxPartitionBytes and kept serving
    * pre-rewrite file sizes after tests/tools regenerated a table dir. */
  private def layoutStats(spark: SparkSession, path: String): (Long, Long) = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .filter(x => x.isFile && x.getName.endsWith(".parquet"))
      else Array(f)
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    (files.map(x => math.max(1L, (x.length + maxPart - 1) / maxPart)).sum,
      files.map(_.length).sum)
  }

  /** Per-row-compute tables fan out across the cluster when the physical
    * layout can't: the fixture corpora ship as 1–2 single-row-group
    * parquet files, so WITHOUT this every tokenize/hash/decode projection
    * over them runs on as many cores as there are row groups (measured:
    * the q29 winnow projection at sf3 ran on 1 of 32 cores; 25 s → 5 s
    * with the fan-out). The exchange moves only the pruned columns
    * (projections and filters push below RepartitionByExpression, so
    * scan-level pushdown is unchanged — PlanAudit verifies), keyed by the
    * table's unique id for a uniform, deterministic placement.
    *
    * At 100 TB this is a NO-OP by construction: a real corpus has
    * thousands of splits, `estimatedSplits ≥ parallelism`, and the read
    * passes through untouched — the guard only compensates for
    * small-file layouts, it never adds a shuffle a real cluster corpus
    * would pay.
    *
    * documents + embeddings ONLY — the per-row-compute tables, where the
    * projection above the scan (tokenize / shingle / hash / decode /
    * vector math) dwarfs the exchange. Measured on the relational fact
    * tables (lineitem/orders/events) the same fan-out LOSES: their map
    * work is cheap column arithmetic, so scan + partial-agg on few cores
    * beats scan + full-row shuffle (q02 0.36→0.71 s, q303 0.64→1.53 s at
    * sf1) — the partial aggregate IS the right parallelism fix there. */
  private val fanOutKeys = Map(
    "documents" -> "doc_id", "embeddings" -> "vec_id")
  /** Below this corpus size the fan-out is net-negative: the extra
    * exchange STAGE costs ~0.1–0.3 s of scheduling per query, which at
    * fixture scale (sf0.1 documents: 0.6 MB, whole queries in the
    * 0.2–0.9 s band) outweighs any parallelism it buys — measured as a
    * 1.24× median slow-down across the sf0.1 sweep when unconditional,
    * and still a 2–2.8× regression on the CHEAP document queries at sf1
    * (5.8 MB corpus: the heavy text family gained 3–5 s each, q44
    * 5.2→0.96 s, but ~dozens of sub-second scans paid +0.3–1 s of extra
    * stage each — net-neutral in total, net-negative per query). From
    * ~8 MB the heavy-family win dominates everything in sight: at sf3
    * (17.4 MB) q44 reads 15.1→1.84 s and q29 25.4→5.3 s with no cheap-
    * query regression visible above noise. */
  private val fanOutMinBytes = 8L << 20
  private def fanOut(spark: SparkSession, df: DataFrame, name: String,
                     path: String): DataFrame =
    fanOutKeys.get(name) match {
      case Some(key) =>
        val target = spark.sparkContext.defaultParallelism
        val (splits, bytes) = layoutStats(spark, path)
        if (splits >= math.max(2, target / 2) || bytes < fanOutMinBytes) df
        else df.repartition(target, org.apache.spark.sql.functions.col(key))
      case None => df
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path flows through here, so the library's native
    // functions are always registered regardless of query-map iteration
    // order (idempotent, cheap)
    graft.functions.GraftFunctions.register(spark)
    val path = s"$sfDir/$name.parquet"
    fanOut(spark, spark.read.parquet(path), name, path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped under THREE physical parquet encodings across
    * testdata generations: TIMESTAMP(NANOS) (Spark surfaces it as a long
    * only under `nanosAsLong`; rejects it outright otherwise), plain INT64
    * epoch-nanos (the ScaleGen sf1 corpus), and TIMESTAMP(MICROS) with or
    * without isAdjustedToUTC. Hardcoding any one of them is brittle by
    * design — round 7 lost 32 queries to exactly that — so the loader
    * inspects the schema Spark actually inferred and branches:
    *
    *   - LongType          → epoch nanos; truncate to micros (the same
    *                         truncation DuckDB applies implicitly)
    *   - TimestampType     → already micros, adjusted to UTC; pass through
    *   - TimestampNTZType  → micros, no zone; reinterpret in the session
    *                         zone (all entry points pin it to UTC), so the
    *                         wall-clock values are unchanged
    *
    * Every branch lands on TimestampType so downstream operators, goldens
    * and oracle hashes see one stable logical schema.
    *
    * The session-conf mutation is deliberate: `nanosAsLong` is a legacy
    * SQL conf with NO reader-level (`.option(...)`) equivalent — probed on
    * Spark 4.1.2, a reader option is ignored and the scan still throws.
    * The conf only affects schema mapping of TIMESTAMP(NANOS) columns (a
    * no-op for every other encoding and table here) and is idempotent, so
    * setting it per read is the least-state alternative available. */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  private def tsType(df: DataFrame): org.apache.spark.sql.types.DataType =
    df.schema("ts").dataType

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = eventsRaw(s, d)
    tsType(raw) match {
      case LongType      => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Time-bounded events read with the lower bound applied to the column's
    * NATIVE type, BEFORE any conversion: a predicate on a converted column
    * (`timestamp_micros(ts div 1000)`, or a cast) cannot push through the
    * projection, but a bound expressed in the scan's own type reaches the
    * parquet reader as a pushed filter and prunes row groups — the
    * difference between scanning a day and scanning 100 TB. For the nanos
    * encodings the bound is the raw nanosecond long (equivalent row set
    * for whole-second bounds: nanos below the bound truncate to a
    * microsecond value below it too); for the timestamp encodings it is a
    * native timestamp / timestamp_ntz literal. */
  def eventsFrom(s: SparkSession, d: String, fromUtc: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw  = eventsRaw(s, d)
    val inst = java.time.Instant.parse(fromUtc)
    tsType(raw) match {
      case LongType =>
        val nanos = Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000000L), inst.getNano.toLong)
        raw.where(col("ts") >= nanos)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType =>
        raw.where(col("ts") >= lit(inst))
      case _ => // TimestampNTZ: compare in the same naive type, then normalize
        val ldt = java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
        raw.where(col("ts") >= lit(ldt))
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
