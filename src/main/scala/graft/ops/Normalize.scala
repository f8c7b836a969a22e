package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise feature normalization — the per-group z-score step of a
  * feature-engineering pipeline (normalize a metric within its segment
  * before thresholding/modeling).
  *
  * Two-pass shape, not a window: a windowed
  * `(x - avg(x) over g) / stddev(x) over g` hash-partitions the FULL
  * fact table by group and materializes every row in the window state;
  * the aggregate-and-join-back form shuffles only the tiny per-group
  * stats frame and re-attaches it with a broadcast join, leaving the
  * fact side un-shuffled — the correct plan when groups are few and rows
  * are 100 TB.
  *
  * The stat components (n, Σx, Σx²) are decimal-exact ([[Exact]]
  * rationale), so the derived mean/variance — and therefore the z-scores
  * — are identical doubles on any engine and any partitioning; variance
  * is the sample variance (n−1).
  */
object Normalize {

  /** Appends `<valueCol>_z`. Rows in groups with fewer than 2 rows or
    * non-positive computed variance yield NULL. Both halves of the gate
    * are load-bearing: without the explicit `__n >= 2`, an n=1 group
    * divides by (n−1)=0 — double division gives ±Infinity, and a positive
    * decimal-quantization residual in Σx²−(Σx)²/n then makes
    * variance=+Infinity, so `variance > 0` alone would PASS and emit 0.0
    * instead of NULL; and the `> 0` half matters because decimal
    * quantization of x² can push an all-but-constant group's variance
    * slightly NEGATIVE, where sqrt is NaN in Spark but an error in
    * DuckDB. Rows whose group key is NULL are preserved (left join) with
    * a NULL z-score — there is no group to normalize within. */
  def zscore(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol)
    val stats = df.groupBy(col(groupCol)).agg(
      count(x).cast("double").as("__n"),
      Exact.dsum(x).as("__sx"),
      Exact.dsum(x * x).as("__sxx"))
    val mean = $"__sx" / $"__n"
    val variance = ($"__sxx" - $"__sx" * $"__sx" / $"__n") / ($"__n" - 1.0)
    df.join(broadcast(stats), Seq(groupCol), "left")
      .withColumn(s"${valueCol}_z",
        when($"__n" >= 2 && variance > 0, (x - mean) / sqrt(variance)))
      .drop("__n", "__sx", "__sxx")
  }
}
