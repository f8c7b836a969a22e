package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the stateful gaps-and-islands operator
  * whose batch analog is [[graft.ops.Windows.sessionize]] (q18): group
  * events into per-user sessions that close after `gapMin` minutes of
  * event-time silence, emitting one row per closed session.
  *
  * Built on Structured Streaming's native `session_window` (dynamic-gap
  * state merging in the state store — sessions EXTEND and MERGE as
  * late-but-inside-watermark events arrive, which a fixed tumbling
  * window cannot do), not a hand-rolled flatMapGroupsWithState: the
  * built-in participates in watermark-driven state eviction, AQE-less
  * streaming codegen, and RocksDB state stores unchanged.
  *
  * Scale shape: state is one (user, open-session) entry keyed by the
  * grouping columns — hash-partitioned across executors, evicted the
  * moment the watermark passes session end + gap. Append mode emits a
  * session exactly once, when it can no longer grow.
  *
  * Batch parity: `session_start`/`session_end` are min/max event time
  * (the q18 columns), not the padded window bounds — the committed spec
  * pins stream-vs-batch equality on a shuffled multi-batch replay. */
object SessionStream {

  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapMin: Int, watermark: String = "1 minute"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), s"$gapMin minutes"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(col(userCol), col("session_start"), col("session_end"),
        col("n_events"))
}
