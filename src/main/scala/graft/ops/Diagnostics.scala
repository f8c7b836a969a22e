package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Operational diagnostics a 100 TB deployment runs BEFORE committing to
  * a partitioning or join strategy — the numbers that decide whether a
  * key needs salting, AQE skew handling, or a broadcast.
  */
object Diagnostics {

  /** Join/partition-key skew report for one key column: one row with the
    * key's cardinality, the heaviest key's frequency and share, exact
    * frequency percentiles, and the Herfindahl concentration index
    * (Σ shareᵢ² — 1/n_keys for uniform keys, →1 as one key dominates).
    *
    * Shape: ONE shuffle (the frequency rollup, map-side combined); every
    * statistic — including HHI, computed as Σn²/(Σn)² so no per-key
    * division or second pass is needed — aggregates the key-cardinality
    * frequency frame. NULL keys are excluded (they route to a null-safe
    * join path, not a partition). */
  def keySkew(df: DataFrame, keyCol: String, name: String): DataFrame = {
    val freq = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).cast("long").as("n"))
    freq.agg(
        sum($"n").cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_keys"),
        max($"n").cast("long").as("max_n"),
        round(F.percentile($"n", lit(0.5)), 6).as("p50_n"),
        round(F.percentile($"n", lit(0.99)), 6).as("p99_n"),
        // decimal sum: n² can overflow a long's partial sums at extreme
        // row counts, and the sum must be reduction-order-free
        sum(($"n" * $"n").cast("decimal(38,0)")).as("__sum_n2"))
      .select(lit(name).as("key_name"), $"n_rows", $"n_keys", $"max_n",
        $"p50_n", $"p99_n",
        round($"max_n" / $"n_rows", 9).as("top_share"),
        round($"__sum_n2".cast("double") /
          ($"n_rows".cast("double") * $"n_rows".cast("double")), 9).as("hhi"))
  }
}
