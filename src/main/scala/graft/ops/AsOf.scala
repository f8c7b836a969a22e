package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the payload of the
  * latest right row with `rightTs <= leftTs` on the same key. Spark has no
  * native as-of operator; the naive formulations are an O(n·m) range join
  * or a per-key aggregation-and-rejoin. This implementation unions the two
  * tagged sides and forward-fills the right payload with
  * `last(_, ignoreNulls)` over one (key, ts, tag) sort — a single shuffle,
  * linear work, bounded per-key state, which is exactly how it survives
  * 100 TB (the same shape Flink/kdb use for temporal joins).
  *
  * Ties: a right row AT the left row's timestamp is eligible (`<=`), so
  * right rows sort before left rows at equal ts.
  */
object AsOf {

  /** @param payload right-side columns to carry (must not collide with
    *                left column names; rename beforehand if needed)
    *
    * The forward-fill carries ONE struct of all payload columns rather
    * than filling each column independently: the struct is non-null
    * whenever a right row exists, so a matched right row whose payload
    * *value* is NULL yields NULL (true as-of / DuckDB ASOF semantics)
    * instead of leaking an older row's value past the match. */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__tag", lit(1)).withColumn("__ts", col(leftTs))
    val r = right.select(col(key), col(rightTs).as("__ts"), lit(0).as("__tag"),
      struct(payload.map(col): _*).as("__p"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__p", F.last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    payload.foldLeft(filled)((df, p) => df.withColumn(p, col("__p")(p)))
      .drop("__tag", "__ts", "__p")
  }
}
