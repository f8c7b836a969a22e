package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality predicates and valid/quarantine routing
  * (SURVEY.md §2.4, F1–F5; reference `bronze_ingest.py:55-62`,
  * `silver_enrichment.py:70-96`, rules documented `README.md:202-208`).
  *
  * The reference routes each stream through complementary `where`
  * predicates into a main sink and a rejected sink. We expose the split as
  * a pure function pair so batch and streaming pipelines share one
  * implementation, and (unlike the reference, which runs valid and invalid
  * as two independent queries that each rescan the source —
  * `bronze_ingest.py:64-103`) the streaming pipeline writes both sides
  * from a single scan inside `foreachBatch`.
  */
object Quality {

  /** F1 — bronze-level validity: parseable event time and present value
    * (ref `bronze_ingest.py:55-58`). */
  def bronzeValid(tsCol: String = "event_time_ts", valueCol: String = "value"): Column =
    col(tsCol).isNotNull && col(valueCol).isNotNull

  /** F3 — silver-level per-sensor range rules
    * (ref `silver_enrichment.py:70-88`; `README.md:202-208`). */
  def sensorRange(sensorType: String): Column = sensorType match {
    case "temperature" => col("value") >= -40.0 && col("value") <= 80.0
    case "vibration"   => col("value") >= 0.0
    case "tilt"        => col("value") >= 0.0 && col("value") <= 90.0
    case other         => throw new IllegalArgumentException(s"unknown sensor type: $other")
  }

  /** Generic numeric range predicate (batch-query surface). */
  def inRange(c: Column, lo: Double, hi: Double): Column = c >= lo && c <= hi

  /** F2/F4 — complementary split. `invalid` must catch rows where the
    * predicate is NULL as well as false (SQL three-valued logic: `!p`
    * alone drops NULL rows on both sides), so quarantine routing never
    * loses a row: valid ∪ invalid = input, valid ∩ invalid = ∅. */
  def split(df: DataFrame, valid: Column): (DataFrame, DataFrame) =
    (df.where(valid), df.where(!coalesce(valid, lit(false))))

  /** Rejection-reason attribution: label every row with the FIRST failing
    * rule (ordered — deterministic for the audit) or NULL when all rules
    * pass. A quarantine table with reasons is what makes DQ actionable
    * (which upstream broke, how often) instead of a write-only dump; the
    * label is one map-side conditional, so attribution costs nothing at
    * scale. Rule predicates are evaluated NULL-safe: a rule whose
    * predicate is NULL (e.g. a range check on a NULL value) counts as
    * failed, mirroring [[split]]'s routing. */
  def rejectReason(rules: Seq[(String, Column)]): Column =
    rules.foldRight(lit(null).cast("string")) { case ((name, pred), els) =>
      when(!coalesce(pred, lit(false)), lit(name)).otherwise(els)
    }
}
