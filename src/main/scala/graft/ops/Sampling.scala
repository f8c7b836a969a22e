package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample()` is seed-stable only for a fixed partitioning — repartition
  * the input (or run another engine) and the sample changes. These
  * operators decide membership per ROW from a content hash, so the sample
  * is a pure function of the data: reproducible across engines, partition
  * layouts, and reruns, and any row's membership is auditable after the
  * fact. The hash is md5 (identical lowercase hex in Spark and DuckDB —
  * which is what makes the DuckDB oracle able to verify the sampler), and
  * the keep rule is a lexicographic threshold on the hex digest — a
  * uniform [0,1) draw compared at 2⁻⁶⁴ threshold resolution.
  *
  * At scale this is a map-side filter — no shuffle, pushes nothing, reads
  * only the key column beyond the projection.
  */
object Sampling {

  /** Hex threshold for a fraction: first 16 nibbles of the unit interval
    * scaled to 16^16, zero-padded to the full 32-digit digest width.
    * Resolution is therefore 2⁻⁶⁴ — fractions are quantized to that grid
    * (a double has only 53 mantissa bits anyway, so the threshold is
    * exact for every representable fraction). */
  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1] (got $fraction)")
    val scaled = (BigDecimal(fraction) * BigDecimal(BigInt(1) << 64)).toBigInt
    f"${scaled.toString(16)}%16s".replace(' ', '0') + "0" * 16
  }

  /** Membership predicate: md5(key as string) < threshold(fraction). */
  def keepPredicate(key: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true)
    else md5(key.cast("string")) < lit(hexThreshold(fraction))

  /** Uniform deterministic sample: keep ~`fraction` of rows, decided per
    * row by content hash of `keyCol`. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.where(keepPredicate(col(keyCol), fraction))

  /** Weighted corpus mixture: union several corpora, each thinned to its
    * weight by the deterministic sampler — the "mix Wikipedia at 3×, web
    * crawl at 0.2×" step of training-data assembly, reproducible across
    * reruns and engines. Weights are capped at 1.0 (upsampling means
    * repeating data; do that explicitly if intended). Columns are aligned
    * by name; a `source` tag column records provenance. */
  def mixCorpora(corpora: Seq[(String, DataFrame, Double)], keyCol: String): DataFrame = {
    require(corpora.nonEmpty, "mixCorpora needs at least one corpus")
    corpora.map { case (name, df, weight) =>
      require(weight >= 0.0 && weight <= 1.0,
        s"weight for '$name' must be in [0,1] (got $weight); repeat data explicitly to upsample")
      deterministicSample(df, keyCol, weight).withColumn("source", lit(name))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Deterministic train/val/test split assignment: every row labeled with
    * the split whose cumulative-fraction interval its content hash falls
    * in. The same md5-as-uniform-draw machinery as the samplers, so the
    * assignment is a pure function of the key — reproducible across
    * engines/partitionings, and disjoint-and-covering by construction
    * (intervals partition [0,1)). Map-side projection, no shuffle.
    * Fractions must sum to 1 (a silent remainder would dump rows in an
    * unnamed split). */
  def splitAssign(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
                  outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "splitAssign needs at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1 (got ${splits.map(_._2).sum})")
    val key = md5(col(keyCol).cast("string"))
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // chained ascending-threshold conditionals; the final split is the
    // unconditional otherwise so hex-threshold truncation can't orphan
    // the top of the hash range
    val labeled = splits.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        val cond = key < lit(hexThreshold(cum))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.get.otherwise(splits.last._1)
    df.withColumn(outCol, labeled)
  }

  /** Stratified deterministic sample: per-stratum fractions (e.g.
    * downsample dominant languages, keep the tail whole). Strata missing
    * from the map use `defaultFraction`. The per-row decision is a single
    * chained conditional on the stratum column — one map-side filter, no
    * shuffle, no per-stratum passes. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    val key = col(keyCol)
    val pred = fractions.toSeq.sortBy(_._1).foldRight(
      keepPredicate(key, defaultFraction): Column) { case ((stratum, f), els) =>
      when(col(strataCol) === stratum, keepPredicate(key, f)).otherwise(els)
    }
    df.where(pred)
  }
}
