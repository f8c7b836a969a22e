package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / derivation operators (SURVEY.md §2.3, P1–P6).
  *
  * Reference semantics: ISO-8601 string → timestamp → date derivation
  * (`bronze_ingest.py:44-49`), nested window-struct flattening
  * (`gold_aggregation.py:102-109`), interval arithmetic
  * (`demo.ipynb` cell 19). All are pure Column compositions — codegen'd,
  * pushdown-transparent, no UDFs.
  */
object Derive {

  /** P1 — parse an ISO-8601 string column to timestamp
    * (ref `bronze_ingest.py:46-47`). `try_to_timestamp`, not
    * `to_timestamp`: under Spark 4's default ANSI mode the latter THROWS
    * on malformed input, but quarantine routing (F1/F2) requires bad rows
    * to surface as NULL and flow to the rejected sink. */
  def parseTs(df: DataFrame, src: String, dst: String): DataFrame =
    df.withColumn(dst, try_to_timestamp(col(src)))

  /** P2 — derive the partition date from an event-time timestamp
    * (ref `bronze_ingest.py:48`). */
  def partitionDate(df: DataFrame, tsCol: String, dst: String = "partition_date"): DataFrame =
    df.withColumn(dst, to_date(col(tsCol)))

  /** Tumbling 1-minute bucket start — batch analog of
    * `window(ts, "1 minute").start` (ref `gold_aggregation.py:57`):
    * for epoch-aligned tumbling windows they coincide exactly, and
    * `date_trunc` is directly oracle-expressible in ANSI SQL. */
  def minuteStart(c: Column): Column = date_trunc("minute", c)

  /** P5 — interval arithmetic escape hatch (ref `demo.ipynb` cell 19's
    * `timestampadd(MINUTE, -2, ...)`). */
  def plusMinutes(c: Column, minutes: Int): Column =
    c + expr(s"INTERVAL $minutes MINUTES")

  /** North-star JSON props access (`events.props` is a JSON string).
    * `get_json_object` is a codegen'd built-in; no UDF. */
  def jsonInt(c: Column, path: String): Column =
    get_json_object(c, path).cast("int")
}
