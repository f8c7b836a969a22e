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

  /** Context-length truncation loss curve — the sizing table a training
    * team reads before fixing max_seq_len: for each candidate context
    * length L, how many documents get truncated and what fraction of
    * the corpus's tokens is cut off. `tokCol` is a per-row token count
    * (long).
    *
    * Scale shape: ONE corpus scan. Each row projects a literal array of
    * per-L structs (docs-over, tokens-kept), the array aggregates
    * position-wise (exact longs — no doubles until the final ratio),
    * and posexplode of the |lengths|-row result melts to the output —
    * the q167 threshold-sweep pattern: never |lengths| scans.
    *
    * Output per L: `ctx_len`, `n_docs`, `n_truncated`, `total_tokens`,
    * `kept_tokens`, `loss_frac` (9 dp). */
  def truncationReport(df: DataFrame, tokCol: String,
                       lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths == lengths.sorted,
      s"lengths must be non-empty ascending: $lengths")
    val tok = col(tokCol).cast("long")
    val aggCols = lengths.zipWithIndex.flatMap { case (l, i) =>
      Seq(sum(when(tok > l, 1L).otherwise(0L)).as(s"__tr$i"),
        sum(least(tok, lit(l.toLong))).as(s"__kp$i"))
    }
    val melted = lengths.zipWithIndex.map { case (l, i) =>
      struct(lit(l).as("ctx_len"), col(s"__tr$i").as("n_truncated"),
        col(s"__kp$i").as("kept_tokens"))
    }
    df.agg(count(lit(1)).as("__n"), (sum(tok).as("__tot") +: aggCols): _*)
      .select(col("__n"), col("__tot"),
        posexplode(array(melted: _*)).as(Seq("__i", "r")))
      .select(col("r.ctx_len"), col("__n").cast("long").as("n_docs"),
        col("r.n_truncated").cast("long").as("n_truncated"),
        col("__tot").cast("long").as("total_tokens"),
        col("r.kept_tokens").cast("long").as("kept_tokens"),
        round(lit(1.0) - col("r.kept_tokens").cast("double") /
          col("__tot").cast("double"), 9).as("loss_frac"))
      .orderBy(col("ctx_len"))
  }
}
