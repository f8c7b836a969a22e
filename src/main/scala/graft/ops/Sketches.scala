package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-order-independent approximate quantiles — the DDSketch
  * construction (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019), expressed
  * as plain relational operators instead of an opaque aggregation buffer.
  *
  * Why not `percentile_approx`: Spark's built-in quantile sketch
  * (Greenwald–Khanna derived) is INSERTION-ORDER-sensitive — the same
  * data under a different partitioning or merge order yields a slightly
  * different estimate, which makes the output untestable by golden file
  * and non-reproducible run-to-run at cluster scale. DDSketch's state is
  * just (log-bucket → count): inserts are commutative, merges are counter
  * addition, so the estimate is a pure function of the multiset — fully
  * deterministic under any partitioning, with a γ-relative error
  * guarantee (|est − true| ≤ α·|true| for any rank-q value).
  *
  * Relational form (no custom aggregate needed — Catalyst sees through
  * the whole thing): bucket id is a map-side projection, the sketch "add"
  * is a groupBy count (partial-aggregated map-side, so the shuffle
  * carries ≤ |groups|·|buckets| narrow rows — bucket count is bounded by
  * ~⌈ln(max/min)/ln γ⌉, a few hundred for α=1% over any realistic value
  * range), and the quantile probe is a cumulative-count window over the
  * bucket order. At 100 TB the events scan dominates; the sketch plumbing
  * is a rounding error.
  *
  * Bucketing (paper §2.1, extended for sign as real implementations do):
  * v>0 → (sign=+1, j=⌈ln v / ln γ⌉), v<0 mirrored on a negative store,
  * v=0 → its own bucket; estimate for bucket j is 2γʲ/(γ+1) (the
  * γ-relative midpoint of (γ^(j−1), γ^j]), negated on the negative store.
  * Bucket order (ascending value) is (sign, sign·j). The rank rule is the
  * paper's: the q-quantile is the first bucket whose cumulative count
  * exceeds q·(n−1).
  */
object Sketches {

  /** γ for a target relative accuracy α. */
  def gammaFor(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** (sign, j) log-bucket of `v` — deterministic map-side projection.
    * NULLs must be filtered by the caller (a NULL value has no bucket). */
  private[graft] def bucketCols(v: Column, gamma: Double): (Column, Column) = {
    val sign = when(v > 0, 1).when(v < 0, -1).otherwise(0)
    val j = when(v === 0, 0L)
      .otherwise(ceil(log(abs(v)) / lit(math.log(gamma))))
    (sign, j)
  }

  /** The sketch "add": per-group (sgn, j, cnt) bucket counts. This IS the
    * DDSketch state in relational form — additive, so it composes with any
    * further groupBy-sum (mergeable rollups) AND with watermarked streaming
    * aggregation (see [[graft.pipeline.QuantileMonitor]]): counts from
    * different partitions, micro-batches, or store generations just sum. */
  def bucketCounts(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   alpha: Double = 0.01): DataFrame = {
    val (sgn, j) = bucketCols(col(valueCol), gammaFor(alpha))
    df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ sgn.as("sgn") :+ j.as("j"): _*)
      .groupBy((groupCols :+ "sgn" :+ "j").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** The quantile probe over an additive bucket-count frame (columns:
    * groupCols..., sgn, j, cnt — e.g. [[bucketCounts]] output, or any
    * sum-merge of such frames). One output row per (group, q). */
  def quantilesFromCounts(counts: DataFrame, groupCols: Seq[String],
                          qs: Seq[Double], alpha: Double = 0.01): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"bad quantiles $qs")
    val gamma = gammaFor(alpha)
    val gcols = groupCols.map(col)
    // ascending-value bucket order; cumulative count probes the rank
    val ord = col("sgn") * col("j")
    val cum = sum(col("cnt")).over(
      Window.partitionBy(gcols: _*).orderBy(col("sgn"), ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val total = sum(col("cnt")).over(Window.partitionBy(gcols: _*))
    val est = when(col("sgn") === 0, 0.0)
      .otherwise(col("sgn") * lit(2.0) * pow(lit(gamma), col("j")) / lit(gamma + 1))
    // windows FIRST, explode in a separate select after them: in one
    // combined Select the Generate would run below the Window and the
    // cumulative/total counts would be computed over the fanned-out rows
    val cumulated = counts
      .select(gcols :+ col("sgn") :+ col("j") :+ cum.as("cum") :+
        total.as("n_values") :+ est.as("bucket_est"): _*)
    // explode is a Generate (per-row fan-out of the |qs| probes), not a join
    val probed = cumulated
      .select(col("*"), explode(array(qs.map(lit): _*)).as("quantile"))
      .where(col("cum") > col("quantile") * (col("n_values") - 1))
    probed
      .groupBy(gcols :+ col("quantile"): _*)
      .agg(
        min_by(col("bucket_est"), struct(col("sgn"), col("sgn") * col("j"))).as("est"),
        // every surviving bucket row carries the same group total
        max(col("n_values")).as("n_values"))
      .orderBy(gcols :+ col("quantile"): _*)
  }

  /** Per-group equi-width histogram quantiles — the ABSOLUTE-error
    * counterpart of [[ddQuantiles]]. DDSketch's buckets are geometric in
    * |v|, so its γ-relative guarantee collapses on a distribution that
    * clusters tightly far from zero: a ±α·|v| band can swallow the whole
    * observed range (exactly the shape of per-doc LM log-prob scores —
    * measured: both terciles of a [−3.62, −3.31] score corpus landed in
    * one DDSketch bucket). The histogram spends `nBuckets` uniformly
    * over the observed per-group [min, max], so rank error is bounded by
    * one bucket's mass at width (hi−lo)/nBuckets regardless of where the
    * range sits.
    *
    * Two scans, both scale-clean: a per-group (min, max) aggregate
    * (taxonomy-sized, broadcast back) and a map-side bucket projection
    * into a (group, bucket) count — the cumulative probe then runs over
    * ≤ nBuckets rows per group. Deterministic: membership is a pure
    * function of the value and its group's range. Output (group...,
    * quantile, est, n_values); `est` is the UPPER edge of the bucket
    * where the cumulative count crosses q·(n−1), so `v >= est`
    * thresholding cleanly excludes the crossing bucket's interior. */
  def histQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    qs: Seq[Double], nBuckets: Int = 4096): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"bad quantiles $qs")
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val v = col(valueCol).cast("double")
    val gcols = groupCols.map(col)
    val nn = df.where(col(valueCol).isNotNull)
    val stats = nn.groupBy(gcols: _*)
      .agg(min(v).as("__lo"), max(v).as("__hi"))
    val width = (col("__hi") - col("__lo")) / lit(nBuckets.toDouble)
    val bucket = when(col("__hi") === col("__lo"), lit(0L))
      .otherwise(least(lit((nBuckets - 1).toLong),
        floor((v - col("__lo")) / width)))
    val counts = nn.join(broadcast(stats), groupCols)
      .groupBy(gcols :+ col("__lo") :+ col("__hi") :+ bucket.as("__b"): _*)
      .agg(count(lit(1)).as("cnt"))
    val cum = sum(col("cnt")).over(
      Window.partitionBy(gcols: _*).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val total = sum(col("cnt")).over(Window.partitionBy(gcols: _*))
    val est = col("__lo") + (col("__b") + 1) * width
    val cumulated = counts.select(gcols :+ col("__b") :+ cum.as("cum") :+
      total.as("n_values") :+ est.as("bucket_est"): _*)
    cumulated
      .select(col("*"), explode(array(qs.map(lit): _*)).as("quantile"))
      .where(col("cum") > col("quantile") * (col("n_values") - 1))
      .groupBy(gcols :+ col("quantile"): _*)
      .agg(min_by(col("bucket_est"), col("__b")).as("est"),
        max(col("n_values")).as("n_values"))
      .orderBy(gcols :+ col("quantile"): _*)
  }

  /** Per-group DDSketch quantiles: one output row per (group, q) with the
    * γ-relative estimate and the group's non-null value count. Output:
    * (groupCol, quantile, est, n_values), ordered by (groupCol, quantile).
    *
    * `qs` ∈ [0, 1]; α is the relative-error target (default 1%). */
  def ddQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                  qs: Seq[Double], alpha: Double = 0.01): DataFrame =
    quantilesFromCounts(bucketCounts(df, Seq(groupCol), valueCol, alpha),
      Seq(groupCol), qs, alpha)

  // --------------------------------------------------------------------
  // CountMin sketch (Cormode & Muthukrishnan, "An improved data stream
  // summary: the count-min sketch and its applications", J. Algorithms
  // 55(1), 2005) in the same relational posture as DDSketch above: the
  // sketch state is a (row, bucket) → count frame, inserts are a map-side
  // projection + partial-aggregated groupBy (the shuffle carries at most
  // depth×width narrow rows PER PARTITION, not per input row), merges are
  // counter addition, and the point-query is a min over `depth` cells.
  // Guarantees: estimate ≥ true count always (one-sided), and with
  // depth=⌈ln 1/δ⌉, width=⌈e/ε⌉ the overshoot is ≤ ε·N w.p. 1−δ.
  //
  // Complements the exact frequency surface: Misra–Gries
  // (functions.FrequentItems) answers "the heavy hitters and a lower
  // bound"; CountMin answers point queries for ANY key with an upper
  // bound, from additive state a streaming aggregation can maintain.
  //
  // Hashing is the repo's engine-portable md5 discipline (Shard.orderKey):
  // bucket_r(k) = conv(md5(r + " " + k)[0,15), 16, 10) mod width — DuckDB
  // replays it exactly, so the sketch itself is oracle-checkable.
  // --------------------------------------------------------------------

  /** Row-`r` bucket of `key` — deterministic, engine-portable. */
  def cmsBucket(key: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(" ", lit(row), key.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(width.toLong))

  /** The sketch "add": the depth×width counter matrix as a frame
    * (r, bucket, cnt). Each input row contributes one increment per hash
    * row (a map-side explode of `depth` precomputed cells); partial
    * aggregation collapses to ≤ depth·width rows per partition before the
    * single narrow shuffle. Additive: matrices from different partitions,
    * micro-batches, or days merge by summing `cnt` on (r, bucket). */
  def countMinCounts(df: DataFrame, keyCol: String,
                     depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape $depth x $width")
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(keyCol), r, width).as("bucket"))): _*)
    df.where(col(keyCol).isNotNull)
      .select(explode(cells).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query a sketch frame for every key in `probes`: min over the
    * `depth` cells the key hashes to (0 when a cell was never touched).
    * The sketch is ≤ depth·width rows, so the join broadcasts — the probe
    * side never shuffles. Output: probes columns + `cms_cnt`. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probeCells = probes.select(col("*"), explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(keyCol), r, width).as("bucket"))): _*)).as("cell"))
      .select(col("*"), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .drop("cell")
    val outCols = probes.columns
    probeCells.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(outCols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
  }
}
