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
  * Returns the left row plus `payload` columns from the right. Column
  * hygiene (enforced with loud `require`s, matching the [[AsOf.join]]
  * caveat style): `__graft_bkt`/`__graft_rts` are reserved temp names,
  * and no payload column may collide with a left-side column — the range
  * predicate re-references `leftTs` after the join, so a payload column
  * of the same name would make it silently ambiguous. Inner semantics:
  * one row per matching (left, right) pair; left rows with no match emit
  * nothing (aggregate-and-rejoin for left-outer counting — see q60).
  */
object RangeJoin {

  private val BktCol = "__graft_bkt"
  private val RtsCol = "__graft_rts"

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   before: Duration, after: Duration,
                   payload: Seq[String]): DataFrame = {
    val beforeUs = before.toNanos / 1000L
    val afterUs = after.toNanos / 1000L
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      s"need non-negative bounds spanning a positive interval " +
        s"(got before=$before, after=$after)")
    val reserved = Seq(BktCol, RtsCol)
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved temp columns of intervalJoin; " +
        "rename them on the inputs first")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(", ")} collide with left-side " +
        "columns (the post-join range predicate would be ambiguous); rename " +
        "them on the right side first")
    val w = beforeUs + afterUs
    // the join key is the bucket's START in µs (ts minus its non-negative
    // pmod remainder) — pure long arithmetic, no division: a bucket INDEX
    // would need floor division, and Spark's `/` on longs is double
    // division, which rounds past 2^53 µs and would silently mis-bucket
    // far-future (sentinel-date) timestamps by one. pmod keeps the floor
    // semantics exact for pre-1970 (negative) timestamps too.
    def bucketStart(tsUs: org.apache.spark.sql.Column) =
      tsUs - pmod(tsUs, lit(w))
    val lt = unix_micros(col(leftTs))
    val l = left
      .withColumn(BktCol,
        explode(sequence(bucketStart(lt - beforeUs), bucketStart(lt + afterUs),
          lit(w))))
    val r = right.select(
      (col(key) +: bucketStart(unix_micros(col(rightTs))).as(BktCol) +:
        unix_micros(col(rightTs)).as(RtsCol) +: payload.map(col)): _*)
    l.join(r, Seq(key, BktCol))
      .where(col(RtsCol) >= lt - beforeUs && col(RtsCol) <= lt + afterUs)
      .drop(BktCol, RtsCol)
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
    // microsecond resolution, matching the batch variant's bounds (a
    // sub-millisecond Duration would truncate to zero under toMillis)
    val beforeExpr = expr(s"INTERVAL ${before.toNanos / 1000L} MICROSECOND")
    val afterExpr = expr(s"INTERVAL ${after.toNanos / 1000L} MICROSECOND")
    val cond = col(s"l.$key") === col(s"r.$key") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") - beforeExpr &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + afterExpr
    left.alias("l").join(right.alias("r"), cond)
  }
}
