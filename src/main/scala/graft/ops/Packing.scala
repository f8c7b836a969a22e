package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: assign documents to
  * fixed-token-budget bins (the "pack short sequences into one context
  * window" step of a pretraining pipeline).
  *
  * The packing rule is contiguous boundary-split: documents are laid out
  * in a deterministic order within each group, and a document's bin is
  * `floor(preceding_tokens / budget)` — i.e. bins are contiguous runs of
  * the ordered stream, a document starting in bin b belongs to bin b even
  * if it crosses the boundary. One window (cumulative sum) per group, no
  * driver loop, and the rule is pure SQL — which is what lets the DuckDB
  * oracle verify it verbatim.
  *
  * Scale posture: the window partitions by `groupCols`, so parallelism =
  * number of groups and no global sort exists. Packing an UNGROUPED
  * 100 TB corpus through one window would serialize — shard first (any
  * deterministic shard key, e.g. `pmod(xxhash64(id), nShards)`) and pack
  * per shard; cross-shard bins don't exist, which real pipelines accept
  * (shards are the unit of data loading anyway).
  */
object Packing {

  /** Add `bin_id`: the 0-based bin of each row within its group under
    * `budget` tokens per bin, rows ordered by `orderCol` (must be a
    * deterministic total order within the group, e.g. a unique id). */
  def packSequences(df: DataFrame, groupCols: Seq[String], orderCol: String,
                    tokenCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 (got $budget)")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val preceding: Column = sum(col(tokenCol).cast("long")).over(w) - col(tokenCol)
    // integer `div`, not double /: exact at any cumulative magnitude
    // (double division drifts past 2^53 tokens — reachable in a 100 TB
    // corpus group)
    df.withColumn("__prec", preceding)
      .withColumn("bin_id", expr(s"__prec div $budget"))
      .drop("__prec")
  }
}
