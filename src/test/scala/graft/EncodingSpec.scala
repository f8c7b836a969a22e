package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Physical-encoding regression gate for the events loader.
  *
  * Round 7 postmortem: the driver regenerated `/root/testdata` and
  * `events.ts` silently switched parquet encoding from TIMESTAMP(NANOS)
  * to TIMESTAMP(MICROS); a loader hardcoding the nanos workaround took
  * down 32 of 93 queries and 15 test cases in one stroke. This spec pins
  * the contract that can never regress silently again: `Tables.events` /
  * `Tables.eventsFrom` must load THE SAME logical rows from every
  * physical encoding the corpus has ever shipped under, and the time
  * bound must reach the parquet scan as a pushed filter in every one.
  *
  * The fixtures are tiny committed parquet files (12 rows each) with
  * bit-controlled footers: TIMESTAMP(NANOS) (with a +500 ns residue so
  * truncation is exercised), TIMESTAMP(MICROS) no-zone (TimestampNTZ to
  * Spark — the current driver testdata), and TIMESTAMP(MICROS)
  * adjusted-to-UTC (TimestampType to Spark).
  */
class EncodingSpec extends SparkSuite {
  import spark.implicits._

  private def dir(enc: String): String =
    getClass.getResource(s"/encodings/$enc").getPath
  private val encodings = Seq("nanos", "micros_ntz", "micros_utc")

  test("Tables.events loads every encoding to one stable logical schema") {
    val frames = encodings.map(e => e -> Tables.events(spark, dir(e))).toMap
    for ((e, df) <- frames) {
      assert(df.schema("ts").dataType == TimestampType,
        s"$e: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
      assert(df.count() == 12, s"$e: expected 12 fixture rows")
    }
    // identical values row-for-row across encodings (nanos residue truncates)
    val want = frames("micros_utc")
      .select($"event_id", $"ts".cast("string")).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    for (e <- encodings) {
      val got = frames(e)
        .select($"event_id", $"ts".cast("string")).as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      assert(got == want, s"$e: values diverge from micros_utc")
    }
  }

  test("eventsFrom returns the same bounded row set in every encoding") {
    val bound = "2024-01-10T00:00:00Z"
    for (e <- encodings) {
      val ids = Tables.eventsFrom(spark, dir(e), bound)
        .select($"event_id").as[Long].collect().sorted.toSeq
      // fixture rows 5..12 are at/after the bound (row 5 is exactly on it)
      assert(ids == (5L to 12L), s"$e: got $ids")
    }
  }

  test("the eventsFrom bound reaches the parquet scan in every encoding") {
    for (e <- encodings) {
      val plan = Tables.eventsFrom(spark, dir(e), "2024-01-10T00:00:00Z")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts,.*"),
        s"$e: expected a pushed ts lower bound, plan:\n${plan.take(2000)}")
    }
  }
}
