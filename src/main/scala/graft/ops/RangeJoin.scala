package graft.ops

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (time-range) join — match each left row with the right rows on
  * the same key whose timestamp falls in `[leftTs − before, leftTs +
  * after]`. Spark has no native interval join; the naive formulation is an
  * equi-join on the key followed by a range filter, whose per-key cost is
  * |L_k|·|R_k| — quadratic on hot keys — or, without a key, a full cross
  * join.
  *
  * This implementation bucketizes time into windows of width `before +
  * after`: a right row lands in exactly one (key, bucket); a left row's
  * interval overlaps at most two adjacent buckets, so the left side
  * explodes to ≤ 2 bucket rows and the join becomes a plain shuffled
  * equi-join on (key, bucket) with the exact range predicate re-checked on
  * the candidates. Per-key-bucket cost is |L_kb|·|R_kb| — bounded by
  * temporal locality, not total key volume. This is the same shape
  * Flink's interval join and kdb's window join use, and it survives
  * 100 TB because the shuffle is (key, bucket)-partitioned and candidate
  * generation never leaves the bucket.
  *
  * Returns the left row plus `payload` columns from the right (caller
  * renames collisions beforehand, as with [[AsOf.join]]). Inner semantics:
  * one row per matching (left, right) pair; left rows with no match emit
  * nothing (aggregate-and-rejoin for left-outer counting — see q60).
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   before: Duration, after: Duration,
                   payload: Seq[String]): DataFrame = {
    val beforeUs = before.toNanos / 1000L
    val afterUs = after.toNanos / 1000L
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      s"need non-negative bounds spanning a positive interval " +
        s"(got before=$before, after=$after)")
    val w = beforeUs + afterUs
    // exact long floor-division (subtract the non-negative pmod remainder,
    // then divide): plain `/` truncates toward zero, mis-bucketing
    // pre-1970 (negative-micros) timestamps, and a double `floor` loses
    // exactness past 2^53 µs
    def bucket(tsUs: org.apache.spark.sql.Column) =
      ((tsUs - pmod(tsUs, lit(w))) / w).cast("long")
    val lt = unix_micros(col(leftTs))
    val l = left
      .withColumn("__bkt",
        explode(sequence(bucket(lt - beforeUs), bucket(lt + afterUs))))
    val r = right.select(
      (col(key) +: bucket(unix_micros(col(rightTs))).as("__bkt") +:
        unix_micros(col(rightTs)).as("__rts") +: payload.map(col)): _*)
    l.join(r, Seq(key, "__bkt"))
      .where($"__rts" >= lt - beforeUs && $"__rts" <= lt + afterUs)
      .drop("__bkt", "__rts")
  }

  /** Streaming interval join — the stream-stream counterpart of
    * [[intervalJoin]]. No bucketing here: Spark's
    * StreamingSymmetricHashJoin recognizes the `rightTs BETWEEN leftTs −
    * before AND leftTs + after` condition and, given watermarks on BOTH
    * sides, derives each side's state retention from the interval — rows
    * are evicted once the watermark passes their possible-match range, so
    * state is bounded by (watermark delay + interval) × arrival rate, not
    * by stream length. Callers must `withWatermark` both inputs (Spark
    * rejects the query otherwise in append mode).
    *
    * Both timestamp columns must be event-time (TimestampType) columns;
    * the condition intentionally references them bare — wrapping them in
    * expressions would defeat Spark's watermark-predicate detection. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String,
                         before: Duration, after: Duration): DataFrame = {
    val beforeExpr = expr(s"INTERVAL ${before.toMillis} MILLISECONDS")
    val afterExpr = expr(s"INTERVAL ${after.toMillis} MILLISECONDS")
    val cond = col(s"l.$key") === col(s"r.$key") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") - beforeExpr &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + afterExpr
    left.alias("l").join(right.alias("r"), cond)
  }
}
