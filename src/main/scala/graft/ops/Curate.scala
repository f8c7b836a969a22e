package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-curation gates a large-scale training-data pipeline runs before
  * anything expensive touches a document: PII redaction and rule-based
  * quality gating (the Gopher-style heuristic filters). Both are pure
  * map-side column expressions — no shuffle, no UDF, whole-stage
  * codegen — so they compose with any scan at any scale and Catalyst
  * pushes surviving filters into the source.
  *
  * Reference anchor: the reference pipeline has no text-curation surface
  * (its DQ rules are numeric range checks, `silver_enrichment.py:50-57`);
  * north-star training-data scope. The rule set follows the published
  * Gopher/MassiveText heuristics (Rae et al. 2021, table A1) reduced to
  * the signals the synthetic corpus carries.
  */
object Curate {

  /** PII patterns, deliberately in the regex subset Java and RE2 share
    * (character classes, bounded repetition, non-capturing groups, \b):
    * the DuckDB oracle replays the same literals verbatim. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re  = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Redact emails, phone numbers and IPv4 addresses from `textCol`:
    * adds `clean_text` plus per-kind match counts. Replacement order
    * matters and is fixed — emails first (their domains contain dots an
    * IP pattern could claim), then phones, then IPs — so the counts are
    * of the ORIGINAL text and the masks never cascade. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    // round-16: per-row-compute fan-out (three regex counts + three
    // regex rewrites per row — q94 measured 4.2 s vs its 0.85 s r14
    // fanned record at sf1). No id column in this signature; the text
    // itself is a fine distribution key for a round placement.
    val t = col(textCol)
    FanOut.perRowCompute(df, t)
      .withColumn("n_email", regexp_count(t, lit(EmailRe)))
      .withColumn("n_phone", regexp_count(t, lit(PhoneRe)))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))
  }

  /** Scale-path perplexity bucketing: the q97 exact global ntile is a
    * single-partition sort — fine for a corpus report, fatal at 100 TB.
    * This variant computes approximate tercile BOUNDARIES with the
    * equi-width histogram sketch ([[Sketches.histQuantiles]] — the
    * absolute-error tool; DDSketch's relative-error buckets collapse on
    * tightly-clustered log-prob scores) and buckets map-side against the
    * two broadcast thresholds: the corpus is scanned, never globally
    * sorted. Disagreement with the exact ntile is confined to docs in
    * the boundary buckets — width (hi−lo)/nBuckets — plus rank ties
    * (duplicate texts share a score; the ntile splits them arbitrarily,
    * a threshold cannot). CurateSpec pins agreement + adjacency. `head`
    * = best model fit (highest log-prob), as in q97. */
  def pplBucketsScaled(df: DataFrame, idCol: String, textCol: String,
                       lambda: Double = 0.75, nBuckets: Int = 4096): DataFrame =
    pplBucketsScaledFrom(Text.bigramLogProb(df, idCol, textCol, lambda),
      idCol, nBuckets)

  /** [[pplBucketsScaled]] over an ALREADY-SCORED frame
    * ((idCol, n_tokens, bigram_logprob) — e.g. the persisted LM-score
    * store), so the scoring pass is not re-derived per consumer. */
  def pplBucketsScaledFrom(scored: DataFrame, idCol: String,
                           nBuckets: Int = 4096): DataFrame = {
    val qs = Seq(1.0 / 3, 2.0 / 3)
    // deliberately NOT Staged: the scored frame feeds both the boundary
    // sketch and the final bucketing, but AQE's runtime exchange reuse
    // already deduplicates the shared scoring subtree (and a store-fed
    // frame is just a parquet re-scan) — persisting it only adds a
    // materialization barrier (measured: staged 3.47 s vs unstaged
    // 2.71 s at sf0.1, 9.2 vs 7.8 at sf1).
    val bnd = Sketches.histQuantiles(scored, Nil, "bigram_logprob", qs, nBuckets)
      .agg(max(when(col("quantile") === qs.head, col("est"))).as("t_lo"),
        max(when(col("quantile") === qs(1), col("est"))).as("t_hi"))
    scored.crossJoin(broadcast(bnd))
      .select(col(idCol), col("n_tokens"), col("bigram_logprob"),
        when(col("bigram_logprob") >= col("t_hi"), "head")
          .when(col("bigram_logprob") >= col("t_lo"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** The default stopword list for [[gopherGate]] — the function words
    * present in the synthetic vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in")

  /** Count of the most frequent element: longest run of the SORTED array
    * via one aggregate fold — O(n log n) per row vs the obvious
    * O(distinct·n) distinct×filter scan ([[topWordCountNaive]], kept as
    * the spec's reference; CurateSpec pins value equality). Per-row
    * constant factors are the whole cost of a map-side gate at 100 TB. */
  private[graft] def topWordCount(words: Column): Column =
    aggregate(array_sort(words),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, w) => {
        val run = when(w === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Reference form of [[topWordCount]] — the distinct×filter scan. */
  private[graft] def topWordCountNaive(words: Column): Column =
    array_max(transform(array_distinct(words),
      d => size(filter(words, w => w === d))))

  /** Gopher-style rule gate: per-document quality metrics plus a
    * composite pass verdict and the comma-joined list of failed rules
    * (fixed rule order, so the reasons string is deterministic).
    *
    * Metrics (all builtins, decimal-rounded for cross-engine parity):
    * `n_words`; `mean_wlen` = non-space chars / words; `stop_frac` =
    * fraction of words in [[Stopwords]]; `top_word_frac` = the most
    * frequent word's share of the document. Rules: `minWords ≤ n_words
    * ≤ maxWords`, `minMeanWlen ≤ mean_wlen ≤ maxMeanWlen`, `stop_frac ≥
    * minStopFrac`, `top_word_frac ≤ maxTopWordFrac` (the published
    * Gopher value 0.2) — the MassiveText posture that a real document
    * has sentence-like word lengths, carries function words, and is not
    * one token stuttered. The top-word count is an O(distinct·words)
    * array fold per row — still map-side, no shuffle. */
  def gopherGate(df: DataFrame, idCol: String, textCol: String,
                 minWords: Int = 20, maxWords: Int = 100000,
                 minMeanWlen: Double = 4.0, maxMeanWlen: Double = 10.0,
                 minStopFrac: Double = 0.02,
                 maxTopWordFrac: Double = 0.2,
                 carry: Seq[Column] = Nil): DataFrame = {
    // round-16: per-row-compute fan-out. The gate tokenizes + runs three
    // token-array passes per row; without the opt-in this lost the r14
    // table-level fan-out and measured 1.6-2.2x slower at sf1 (q96/q266/
    // q269/q299 in bench_r16_sf1_final vs bench_r14_sf1_final).
    val df2 = FanOut.perRowCompute(df, idCol)
    val words: Column = Text.tokens(col(textCol))
    val nWords = size(words)
    val meanWlen = round(
      length(regexp_replace(col(textCol), " ", "")).cast("double") / nWords, 6)
    val stopFrac = round(
      size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / nWords, 6)
    val topFrac = round(topWordCount(words).cast("double") / nWords, 6)
    val wordsOk = nWords.between(minWords, maxWords)
    val wlenOk = meanWlen.between(minMeanWlen, maxMeanWlen)
    val stopOk = stopFrac >= minStopFrac
    val topOk = topFrac <= maxTopWordFrac
    // `carry` columns (e.g. a score over the same text) evaluate in the
    // SAME projection, so a consumer needing gate label + its own signal
    // pays one corpus scan and no re-join (q299's shape)
    df2.select((Seq(col(idCol), nWords.cast("long").as("n_words"), meanWlen.as("mean_wlen"),
        stopFrac.as("stop_frac"), topFrac.as("top_word_frac"),
        (wordsOk && wlenOk && stopOk && topOk).as("passes"),
        concat_ws(",",
          when(!wordsOk, lit("n_words")),
          when(!wlenOk, lit("mean_wlen")),
          when(!stopOk, lit("stop_frac")),
          when(!topOk, lit("top_word_frac"))).as("fail_reasons")) ++ carry): _*)
  }

  /** Gate ablation matrix — the calibration table read before shipping a
    * [[gopherGate]] config: for each rule, how many documents it fails
    * in total, how many it ALONE fails (the rule's marginal kill set —
    * the docs you'd recover by dropping just that rule), and the token
    * mass of that unique kill set. A rule with large `n_fail` but tiny
    * `n_fail_unique` is redundant with the others; a rule whose unique
    * kills carry real token mass is the one to re-threshold.
    *
    * Scale shape: ONE corpus scan — the per-doc gate booleans project
    * map-side (same expressions as [[gopherGate]], same thresholds), a
    * 4-struct literal array melts the per-rule columns position-wise,
    * and the only shuffled rows are 4 partial-aggregate rows. Counts
    * are exact longs throughout.
    *
    * Output per rule (fixed rule order): `rule`, `n_docs`, `n_fail`,
    * `n_fail_unique`, `tokens_lost_unique`. */
  val GateRules: Seq[String] =
    Seq("n_words", "mean_wlen", "stop_frac", "top_word_frac")

  def gateAblation(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 20, maxWords: Int = 100000,
                   minMeanWlen: Double = 4.0, maxMeanWlen: Double = 10.0,
                   minStopFrac: Double = 0.02,
                   maxTopWordFrac: Double = 0.2): DataFrame = {
    // build ON gopherGate's output — same expressions, same thresholds,
    // same fixed rule order; the two views cannot drift apart
    val gated = gopherGate(df, idCol, textCol, minWords, maxWords,
        minMeanWlen, maxMeanWlen, minStopFrac, maxTopWordFrac)
      .withColumn("__fails", split(col("fail_reasons"), ","))
    val perRule = GateRules.map { name =>
      val f = array_contains(col("__fails"), name)
      struct(lit(name).as("rule"),
        f.cast("long").as("fail"),
        (f && size(col("__fails")) === 1).cast("long").as("uniq"),
        when(f && size(col("__fails")) === 1, col("n_words"))
          .otherwise(0L).as("toks"))
    }
    gated.select(posexplode(array(perRule: _*)).as(Seq("__i", "r")))
      .groupBy(col("r.rule").as("rule"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("r.fail")).cast("long").as("n_fail"),
        sum(col("r.uniq")).cast("long").as("n_fail_unique"),
        sum(col("r.toks")).cast("long").as("tokens_lost_unique"))
  }

  /** Corpus snapshot diff — the versioning primitive of an iterating
    * curation pipeline: between two corpus versions, which documents were
    * added, removed, changed (same id, different content), or unchanged.
    * Both sides collapse to (id, 32-char content hash) BEFORE the join,
    * so the full-outer join — the one unavoidable shuffle, keyed on the
    * id both sides are naturally bucketed by in a versioned layout —
    * carries narrow rows, never document bodies. Output: id, old_fp,
    * new_fp, status. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"), md5(col(textCol)).as("old_fp"))
    val n = newDf.select(col(idCol).as("id"), md5(col(textCol)).as("new_fp"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when($"old_fp".isNull, "added")
          .when($"new_fp".isNull, "removed")
          .when($"old_fp" === $"new_fp", "unchanged")
          .otherwise("changed"))
  }

  /** k-anonymity suppression for published statistics: group rollups
    * whose population is below `k` are not dropped (dropping still leaks
    * "this group exists and is small") but folded into ONE `__suppressed__`
    * row per grouping, so every published row describes ≥ k individuals
    * and the suppressed mass is still accounted for. The standard
    * small-cell rule of statistical disclosure control — INCLUDING
    * complementary suppression: if the folded sub-k mass is itself below
    * k (a lone small cell would otherwise be published as an
    * identifiable "suppressed" row of, say, 2 people), the smallest
    * surviving groups fold in too, ascending, until the suppressed row
    * reaches k. A corpus whose total is below k publishes as a single
    * suppressed row — no finer disclosure is possible.
    *
    * `aggs` are the published measures (must be summable — the suppressed
    * row re-aggregates them with `sum`). The fact table shuffles once
    * (the rollup); every suppression decision — including the ascending
    * prefix window — runs on the ≤|groups| rollup frame.
    *
    * Key columns must be strings (checked at call time — masking a
    * numeric key with the sentinel would silently coerce the output
    * schema), and the sentinel is reserved: a genuine key value equal to
    * `__suppressed__` would merge real sub-k mass into a published row,
    * so the plan raises at execution if one appears (zero cost on the
    * non-colliding path — the check is a codegen'd branch). */
  def kAnonSuppress(df: DataFrame, keyCols: Seq[String], k: Long,
                    aggs: Seq[Column]): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    keyCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.StringType,
        s"kAnonSuppress key column '$c' must be STRING (got ${dt.sql}): " +
          "masking would silently coerce the output schema")
    }
    import org.apache.spark.sql.expressions.Window
    val rolled = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val measureCols = rolled.columns.filterNot(keyCols.contains)
    // sub-k mass (scalar, broadcast); if 0 < mass < k, the smallest
    // surviving groups (ascending by n_rows then keys) join the fold
    // until the suppressed row reaches k: a group folds when the
    // surviving-prefix sum BEFORE it is still short of (k - mass)
    val subMass = rolled.where($"n_rows" < k)
      .agg(coalesce(sum($"n_rows"), lit(0L)).as("__smass"))
    val ascOrder = col("n_rows") +: keyCols.map(col)
    val wPrev = Window.orderBy(ascOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = rolled.where($"n_rows" >= k)
      .withColumn("__prev", coalesce(sum($"n_rows").over(wPrev), lit(0L)))
      .crossJoin(broadcast(subMass))
      .withColumn("__fold",
        $"__smass" > 0 && $"__smass" < k && $"__prev" < (lit(k) - $"__smass"))
    val marked = rolled.where($"n_rows" < k).withColumn("__fold", lit(true))
      .unionByName(survivors.drop("__prev", "__smass"))
    // reserved-sentinel guard: a genuine '__suppressed__' key would merge
    // real sub-k mass into a published row — fail loudly instead
    def guarded(c: String): Column =
      when(col(c) === "__suppressed__",
        raise_error(lit(s"kAnonSuppress: key column '$c' contains the " +
          "reserved sentinel '__suppressed__'")).cast("string"))
        .otherwise(col(c))
    val masked = keyCols.map(c =>
      when(!$"__fold", guarded(c)).otherwise(lit("__suppressed__")).as(c))
    marked.select(masked ++ measureCols.map(col): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum($"n_rows").cast("long").as("n_rows"),
        measureCols.filterNot(_ == "n_rows")
          .map(c => sum(col(c)).as(c)): _*)
  }

  /** Differentially-private counts with DETERMINISTIC seeded Laplace
    * noise — ε-DP release of per-key counts where the noise draw is a
    * pure function of (seed, key), so a re-run — or the DuckDB oracle —
    * reproduces the release bit-for-bit (the "seeded DP" pattern used
    * when releases must be auditable; a production release would rotate
    * the seed per release and keep it secret).
    *
    * Laplace(b = 1/ε) via inverse CDF of the md5-uniform draw:
    *   u = (h + 0.5) / 2^60  ∈ (0,1) strictly  (h = 60-bit md5 prefix)
    *   v = u − 0.5           ∈ (−0.5, 0.5) strictly — the ±0.5 endpoints
    *                         (where ln(0) diverges) are unreachable
    *   noise = −b · sign(v) · ln(1 − 2|v|)
    * Count sensitivity is 1, so b = 1/ε gives ε-DP per key. One grouped
    * count (the only shuffle), noise applied map-side on the key-sized
    * rollup. */
  def dpNoisyCounts(df: DataFrame, keyCol: String, epsilon: Double,
                    seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    val b = 1.0 / epsilon
    val h = conv(substring(md5(concat_ws(" ", lit(seed),
      col(keyCol).cast("string"))), 1, 15), 16, 10).cast("double")
    val u = (h + 0.5) / lit(1152921504606846976.0) // 2^60, q107's divisor
    val v = u - 0.5
    // explicit CASE, not signum(): DuckDB's sign() returns an integer
    // type while Spark's signum returns double — a CASE with double
    // literals is the identical expression tree in both engines
    val sgn = when(v >= 0.0, lit(1.0)).otherwise(lit(-1.0))
    val noise = -lit(b) * sgn * log(lit(1.0) - lit(2.0) * abs(v))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("true_count"))
      .withColumn("noisy_count",
        round(($"true_count" + noise), 6))
  }

  /** Winsorization report — the tail-clipping cleanup a metrics/feature
    * pipeline applies before means and models see sensor spikes: per
    * group, the exact [pLo, pHi] quantile bounds, how many values each
    * tail clips, and the mean before vs after clipping.
    *
    * Two passes by necessity (bounds must exist before clipping): a
    * per-group exact-percentile aggregation, broadcast back onto the
    * scan (group cardinality is small — event types, sensors — so the
    * bounds frame broadcasts at any corpus size), then one clipped
    * re-aggregation. Same shape as the median/MAD outlier gate (q110).
    *
    * Determinism: interpolated percentiles are the one value the two
    * engines compute via different lerp expression trees, so bounds
    * round to 6 dp BEFORE the clip comparisons — identical thresholds on
    * both sides; means are reduction-order-free decimal-exact sums. */
  def winsorizeReport(df: DataFrame, groupCol: String, valueCol: String,
                      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad bounds: $pLo, $pHi")
    val D = "decimal(28,12)"
    val bounds = df.groupBy(col(groupCol).as("__g")).agg(
      round(percentile(col(valueCol), lit(pLo)), 6).as("p_lo"),
      round(percentile(col(valueCol), lit(pHi)), 6).as("p_hi"))
    df.select(col(groupCol).as("__g"), col(valueCol).as("v"))
      .join(broadcast(bounds), Seq("__g"))
      .withColumn("w", least(greatest($"v", $"p_lo"), $"p_hi"))
      .groupBy($"__g".as(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(($"v" < $"p_lo").cast("long")).as("n_lo"),
        sum(($"v" > $"p_hi").cast("long")).as("n_hi"),
        round(min($"p_lo"), 6).as("p_lo"),
        round(max($"p_hi"), 6).as("p_hi"),
        round(sum($"v".cast(D)).cast("double") / count(lit(1)), 9)
          .as("mean_raw"),
        round(sum($"w".cast(D)).cast("double") / count(lit(1)), 9)
          .as("mean_winsor"))
  }
}
