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
                  outCol: String = "split", salt: String = ""): DataFrame = {
    require(splits.size >= 2, "splitAssign needs at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1 (got ${splits.map(_._2).sum})")
    // salt = "" degenerates to md5(key) exactly (concat with the empty
    // string is the identity), so every existing assignment/oracle is
    // unchanged; a non-empty salt re-keys the whole assignment (the
    // q288 split-churn audit measures the cost of doing that)
    val key = md5(concat(lit(salt), col(keyCol).cast("string")))
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

  /** Deterministic upsampling with explicit repetition epochs — the
    * other half of the mixing contract ([[mixCorpora]] caps weights at
    * 1.0 and says "repeat data explicitly to upsample"; this is that
    * explicit form, the "Wikipedia at 2.3 epochs" move of LLaMA-style
    * mixtures): every row appears in epochs 0 .. ⌊weight⌋−1 whole, plus
    * a final fractional epoch it joins iff its seed-salted content hash
    * clears the fractional threshold. Membership is a pure row function
    * (row, epoch, seed) — reproducible across engines and partitionings,
    * auditable per row, and a map-side generate + filter in the plan (no
    * shuffle; output volume is weight × input by construction). The
    * epoch column lets the downstream shard/export step interleave
    * repetitions deterministically instead of colocating copies. */
  def upsampleEpochs(df: DataFrame, keyCol: String, weight: Double,
                     seed: String = "epoch"): DataFrame = {
    require(weight > 0.0, s"weight must be positive: $weight")
    val full = math.floor(weight).toInt
    val frac = weight - full
    val nEpochs = if (frac > 1e-12) full + 1 else full
    df.select(col("*"),
        explode(sequence(lit(0), lit(nEpochs - 1))).as("epoch"))
      .where(col("epoch") < full ||
        md5(concat_ws(" ", lit(seed), col("epoch").cast("string"),
          col(keyCol).cast("string"))) < lit(hexThreshold(frac)))
  }

  /** Token-budget corpus mixing: per group (source/domain), keep the
    * deterministic greedy prefix of documents — in seeded-hash order —
    * whose running token total stays within `budget`. This is the "mix
    * each domain at N tokens" step of training-data assembly (domain
    * weights in tokens, not row fractions: the unit the training run
    * actually consumes), reproducible bit-for-bit from (corpus, seed).
    *
    * Keep rule: order each group's docs by the seed-salted 60-bit md5
    * key ([[Shard.orderKey]], ties on id); doc kept iff its running
    * token sum (inclusive) ≤ budget.
    *
    * Spark shape, sized for 100 TB — the naive form is ONE window
    * partitioned by group (a whole domain's running sum on one task:
    * the classic window-skew cliff). Instead the running sum is
    * decomposed by the hash key's own radix: bucket = top 8 bits of the
    * order key (bucket order IS a prefix of hash order, so within-group
    * order never crosses buckets out of sequence):
    *
    *  1. per-(group, bucket) token totals — tiny aggregate, map-side
    *     partials;
    *  2. running bucket totals per group — a window over ≤256 rows per
    *     group, broadcast back;
    *  3. buckets whose prefix already exceeds the budget are PRUNED
    *     before any per-row work (at 100 TB with a budget that keeps
    *     1% of a domain, ~99% of rows never reach a window);
    *  4. the per-row running sum runs inside (group, bucket) partitions
    *     — 256× finer than the naive window, and only over live
    *     buckets.
    *
    * Output: (group, id, n_tok, cum_tok, ord) for every kept doc —
    * `cum_tok` is the group's running total at this doc (≤ budget, by
    * construction), `ord` the permutation key (order by it to read the
    * sample in admission order). Engine-portable: DuckDB recomputes
    * `ord` exactly (same md5 discipline as [[Shard]]), so the oracle
    * verifies the bucketed decomposition against its own naive
    * single-window form. */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, budget: Long,
                        seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be positive: $budget")
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        size(Text.tokens(col(textCol))).cast("long").as("n_tok"),
        Shard.orderKey(col(idCol), seed).as("ord"))
      .withColumn("bucket", shiftright(col("ord"), 52).cast("int"))
    val bucketCums = base.groupBy(col("grp"), col("bucket"))
      .agg(sum(col("n_tok")).as("b_tok"))
      .withColumn("cum_end",
        sum(col("b_tok")).over(Window.partitionBy(col("grp")).orderBy(col("bucket"))))
      .withColumn("cum_prev", col("cum_end") - col("b_tok"))
      .select(col("grp"), col("bucket"), col("cum_prev"))
    val live = base.join(broadcast(bucketCums), Seq("grp", "bucket"))
      .where(col("cum_prev") < budget)
    val wIn = Window.partitionBy(col("grp"), col("bucket"))
      .orderBy(col("ord"), col("id"))
    live.withColumn("cum_tok", col("cum_prev") + sum(col("n_tok")).over(wIn))
      .where(col("cum_tok") <= budget)
      .select(col("grp").as(groupCol), col("id").as(idCol),
        col("n_tok"), col("cum_tok"), col("ord"))
  }

  /** Per-group admission rates for temperature-scaled mixing: rate_g ∝
    * n_g^(α−1), normalized so the expected admitted total is
    * `targetFraction` of the corpus, capped at 1. α < 1 flattens the
    * group distribution toward uniform (the multilingual-sampling rule
    * of mBERT/XLM-R: dominant groups downsample hardest, tail groups
    * keep more), α = 1 is proportional sampling. Rates are rounded to
    * 9 dp so the DuckDB oracle reproduces them bit-identically despite
    * libm ulp differences.
    *
    * Scale shape: one aggregate whose cardinality is the group taxonomy
    * (dozens–thousands), never the corpus. */
  def temperatureRates(df: DataFrame, groupCol: String, alpha: Double,
                       targetFraction: Double): DataFrame =
    temperatureRatesFromCounts(
      df.groupBy(col(groupCol)).agg(count(lit(1)).as("n")),
      groupCol, alpha, targetFraction)

  /** [[temperatureRates]] from an ALREADY-AGGREGATED (groupCol, n)
    * frame — split out so a sweep over several α values (q270) pays the
    * corpus aggregate once and re-derives only the taxonomy-sized
    * arithmetic per α. Same 9-dp rounding contract. */
  def temperatureRatesFromCounts(counts: DataFrame, groupCol: String,
                                 alpha: Double, targetFraction: Double): DataFrame = {
    val tot = counts.agg(sum(col("n")).cast("double").as("nn"),
      sum(pow(col("n"), alpha)).as("sw"))
    counts.crossJoin(broadcast(tot))
      .select(col(groupCol),
        round(least(lit(1.0),
          lit(targetFraction) * col("nn") * pow(col("n"), alpha) / col("sw") / col("n")),
          9).as("rate"))
  }

  /** Temperature-scaled deterministic mix: admit each row iff its salted
    * content hash clears its group's [[temperatureRates]] rate. The
    * threshold is derived from the rate IN-PLAN (floor(rate·2⁶⁰) as a
    * 15-nibble hex string compared against the digest prefix), because
    * the rates are data — no driver round-trip, and the whole admission
    * is the broadcast-join + map-side filter shape: the corpus is
    * scanned once and never shuffled. */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
                     alpha: Double, targetFraction: Double,
                     seed: String): DataFrame =
    admitAtRates(df, keyCol, groupCol,
      temperatureRates(df, groupCol, alpha, targetFraction), seed)

  /** The admission half of [[temperatureMix]], split out so a STREAM can
    * admit against rates a batch job published (computing the rates
    * aggregates the corpus, which a stream cannot do) — a stateless
    * stream-static broadcast join + map-side filter, the same
    * train-in-batch/serve-in-stream discipline as the quality
    * classifier. `rates` is (groupCol, rate). */
  def admitAtRates(df: DataFrame, keyCol: String, groupCol: String,
                   rates: DataFrame, seed: String): DataFrame = {
    val digest = substring(
      md5(concat(lit(seed + " "), col(keyCol).cast("string"))), 1, 15)
    val thr = lpad(lower(conv(
      floor(col("rate") * lit(math.pow(2, 60))).cast("long"), 10, 16)), 15, "0")
    df.join(broadcast(rates), Seq(groupCol))
      .where(col("rate") >= 1.0 || digest < thr)
  }

  /** Leakage-free split assignment: hash-split by NEAR-DUP CLUSTER, not
    * by document. A plain per-doc [[splitAssign]] puts near-duplicates
    * on both sides of a train/val boundary — the evaluation then scores
    * memorization, the classic contamination-through-duplication leak
    * (the reason Lee et al.'s "Deduplicating Training Data ..." dedup
    * before splitting). Here every document keyed by its duplicate
    * cluster (`clusters` = (doc_id, component_id), e.g. from
    * [[Dedup.connectedComponents]]; docs absent from it are singleton
    * clusters keyed by their own id) draws ONE split per cluster, so a
    * cluster can never straddle a boundary by construction.
    *
    * Scale shape: one left join onto the cluster map (shuffle bounded by
    * the near-dup pair volume — the cluster frame is tiny next to the
    * corpus) + the same map-side threshold conditional as
    * [[splitAssign]]. */
  def leakageFreeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       splits: Seq[(String, Double)],
                       outCol: String = "split"): DataFrame = {
    val cc = clusters.select(col("doc_id").as("__cc_doc"),
      col("component_id").as("__cc_comp"))
    splitAssign(
      df.join(cc, col(idCol) === col("__cc_doc"), "left")
        .withColumn("split_key", coalesce(col("__cc_comp"), col(idCol)))
        .drop("__cc_doc", "__cc_comp"),
      "split_key", splits, outCol)
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

  /** Weighted sampling without replacement — Efraimidis & Spirakis'
    * A-ES scheme ("Weighted random sampling with a reservoir", IPL 2006):
    * each row draws uᵢ ∈ (0,1] and the k largest uᵢ^(1/wᵢ) win, which is
    * exactly a weighted without-replacement draw. The classic use: sample
    * a fixed-size corpus slice where long/high-quality documents should
    * be proportionally likelier, reproducibly.
    *
    * Determinism: uᵢ comes from the seed-salted 60-bit md5 key
    * ([[Shard.orderKey]]) scaled to (0,1] — a pure row function, so the
    * sample is identical across engines, partitionings and reruns, and
    * DuckDB can replay the draw. Rows with NULL or non-positive weight
    * are excluded (their sampling key is undefined).
    *
    * Scale: the global top-k plans as TakeOrderedAndProject — per-partition
    * k-row heaps, k·P rows to a single merge, no full sort and no shuffle
    * of the corpus. Output = input columns + `samp_key`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = col(weightCol).cast("double")
    val u = (Shard.orderKey(col(idCol), seed) + 1).cast("double") /
      lit(1152921504606846976.0) // 2^60: key ∈ [0, 2^60-1] → u ∈ (0, 1]
    df.where(w.isNotNull && w > 0)
      .withColumn("samp_key", pow(u, lit(1.0) / w))
      .orderBy(col("samp_key").desc, col(idCol))
      .limit(k)
  }

  /** Cumulative Poisson(1) thresholds for the bootstrap draw — written
    * out in full so the DuckDB oracle can carry the IDENTICAL literals. */
  private[graft] val poisson1Cum: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** Deterministic Poisson bootstrap CI for the mean of an integral
    * per-row statistic: `b` replicates, each reweighting every row by an
    * independent Poisson(1) draw (the standard scalable bootstrap — the
    * multinomial resample Poissonizes at corpus scale, Chamandy et al.;
    * the Bag of Little Bootstraps is the next step when even `b` passes
    * over the corpus are too many). The draw is the seed-salted
    * md5-uniform pushed through the Poisson(1) inverse CDF (capped at 6,
    * cum. prob 0.99992), so every engine — and the oracle — reproduces
    * the exact replicate weights.
    *
    * Engine-exactness: weights and values are integers, so per-replicate
    * (Σwx, Σw) are EXACT integer aggregates (no float summation order);
    * the only doubles are the final b-sized divisions and the percentile
    * over b replicate means — both deterministic. Output: one row with
    * the point mean, ci_lo (2.5%), ci_hi (97.5%).
    *
    * Shape: ONE map-side native weight-vector call per row
    * ([[graft.functions.BootstrapWeights]], bit-identical to the
    * composed md5 form — BootstrapWeightsSpec pins the equality), then a
    * `posexplode` of the in-memory array feeding a map-side partial
    * aggregate (b groups). The b·N term still exists — it is the
    * bootstrap's inherent cost — but as a cheap array explode of
    * precomputed longs, NOT b string-hash projections of the corpus:
    * the md5/hex/conv work that used to run per (row, replicate) now
    * runs per row. */
  def poissonBootstrapCI(df: DataFrame, idCol: String, valueCol: String,
                         b: Int, seed: String): DataFrame = {
    require(b >= 2, s"need at least 2 replicates: $b")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // NULL ids still weight their row: bootstrap_weights is null-safe
    // (null in → null out), and posexplode(null) would silently drop the
    // row from every replicate while the point mean kept it — so the id
    // is coalesced to a sentinel draw key first (all null-id rows share
    // one weight stream, the same degradation the legacy concat_ws draw
    // had; pass a non-null id column for independent draws).
    val reps = df
      .select(col(valueCol).cast("long").as("__x"),
        call_function("bootstrap_weights",
          coalesce(col(idCol).cast("string"), lit(" __null_id")),
          lit(seed), lit(b)).as("__ws"))
      .select($"__x", posexplode($"__ws").as(Seq("rep", "__w")))
      .groupBy(col("rep"))
      .agg(sum(col("__w") * col("__x")).as("swx"), sum(col("__w")).as("sw"))
      .select(($"swx".cast("double") / $"sw").as("rep_mean"))
    val point = df.agg(
      (sum(col(valueCol).cast("long")).cast("double") / count(lit(1)))
        .as("mean"))
    reps.agg(
        round(percentile($"rep_mean", lit(0.025)), 6).as("ci_lo"),
        round(percentile($"rep_mean", lit(0.975)), 6).as("ci_hi"))
      .crossJoin(broadcast(point))
      .select(round($"mean", 6).as("mean"), $"ci_lo", $"ci_hi",
        lit(b).as("n_replicates"))
  }

  /** Deterministic EXACT-k sample per group — reservoir-sampling
    * semantics without reservoir state: rows rank inside their group by
    * the seeded md5 content hash (the library's rerun- and
    * partitioning-stable order; [[deterministicSample]]'s key, ranked
    * instead of thresholded) and the k smallest survive, carrying their
    * rank as `sample_rank`. Unlike a fraction-based sample, every group
    * yields EXACTLY min(k, |group|) rows — the contract a
    * fixed-size-per-stratum eval set needs.
    *
    * One shuffle (the per-group rank window); groups with ≤ k rows pass
    * through whole. At 100 TB, bucket the input by `groupCol` and the
    * exchange disappears. */
  /** Deterministic curriculum / interleave schedule — the training-data
    * ORDER a loader consumes after mixing ratios are chosen
    * (q95-style weights say HOW MUCH of each group; this says WHEN):
    * stride scheduling, the classic proportional-share interleave.
    * Each row ranks inside its group by the seeded hash (rerun- and
    * partitioning-stable, [[exactKPerGroup]]'s key) and is assigned
    * virtual time vt = rank/weight; consuming rows in vt order yields
    * every prefix with group proportions tracking the weights to within
    * one stride — no RNG, no coordination, replayable from any offset.
    *
    * Output: id, group, rank_in_group, vt (9 dp), in (vt, group, id)
    * order. One shuffle (the per-group rank window — bucket by group at
    * 100 TB and it disappears); the schedule ORDER is a distributed
    * range sort, never a global window. `weights` must cover every
    * group (checked: unmatched groups fail fast rather than silently
    * dropping). */
  def curriculumOrder(df: DataFrame, groupCol: String, idCol: String,
                      weights: Map[String, Double], seed: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val h = conv(substring(md5(concat_ws(" ", lit(seed),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("bigint")
    // built over the INTERNAL "group" name — the weight case expression
    // is applied after the select that renames `groupCol`
    val w = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (g, wt)) => when(col("group") === g, wt).otherwise(acc) }
    val wChecked = when(w.isNull, raise_error(concat(
        lit("curriculumOrder: no weight for group "), col("group"))))
      .otherwise(w)
    Windows.topNPerGroup(
        df.select(col(idCol).as("id"), col(groupCol).as("group"),
          h.as("__h")),
        Seq(col("group")), Seq(col("__h"), col("id")), Int.MaxValue)
      .withColumnRenamed("rn", "rank_in_group")
      .select($"id", $"group", $"rank_in_group",
        round($"rank_in_group" / wChecked, 9).as("vt"))
      .orderBy($"vt", $"group", $"id")
  }

  def exactKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                     k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val h = conv(substring(md5(concat_ws(" ", lit(seed),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("bigint")
    Windows.topNPerGroup(df.withColumn("__h", h),
        Seq(col(groupCol)), Seq(col("__h"), col(idCol)), k)
      .withColumnRenamed("rn", "sample_rank")
      .drop("__h")
  }

  /** UniMax mixture allocation (Chung et al. 2023, "UniMax: fairer and
    * more effective language sampling") — split a token `budget` across
    * domains, capping every domain at `maxEpochs` passes over its data
    * and redistributing what the cap frees to the still-open domains:
    * visit domains by ascending token count; each takes
    * `min(tokens·maxEpochs, remaining/domains_left)`.
    *
    * The per-domain token totals aggregate DISTRIBUTED (map-side
    * partials over any corpus size); only the ≤|taxonomy|-row total
    * table collects for the sequential water-fill — the same bounded
    * collect as the BPE merge table, because the recurrence is
    * inherently ordered. The fold is pure IEEE +,−,÷,min (no libm), so
    * any engine replaying it on the same longs reproduces the doubles
    * bit-for-bit; rounding happens in-plan on the returned frame.
    * Output: `(domain, tokens, alloc (6 dp), epochs (9 dp))`. */
  def unimaxAllocation(df: DataFrame, domainCol: String, tokenCol: String,
                       budget: Double, maxEpochs: Double): DataFrame = {
    require(budget > 0 && maxEpochs > 0, s"bad budget/epochs: $budget, $maxEpochs")
    val s = df.sparkSession
    import s.implicits._
    val totals = df.groupBy(col(domainCol).as("domain"))
      .agg(sum(col(tokenCol).cast("long")).as("tokens"))
      .select(col("domain").cast("string"), col("tokens").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (dom, tok) => (tok, dom) }
    var rem = budget
    var left = totals.length
    val rows = totals.map { case (dom, tok) =>
      require(tok > 0, s"domain '$dom' has no tokens")
      val a = math.min(tok.toDouble * maxEpochs, rem / left)
      rem -= a; left -= 1
      (dom, tok, a)
    }
    rows.toSeq.toDF("domain", "tokens", "__a")
      .select(col("domain"), col("tokens"), round(col("__a"), 6).as("alloc"),
        round(col("__a") / col("tokens"), 9).as("epochs"))
  }
}
