package graft

/** Scale-shape regression gate: builds the physical plan of EVERY query
  * in the driver surface and rejects unbounded join shapes. A
  * CartesianProduct anywhere, or a BroadcastNestedLoopJoin outside the
  * explicit whitelist below, means a candidate-generation rewrite
  * regressed to all-pairs — the one plan family that cannot survive a
  * 100 TB input no matter how the cluster is sized.
  *
  * NOTE: building every plan executes the index-build actions embedded in
  * a few queries (q59's bloom build, q41's IVF training, q42/q43's staged
  * persists) — this "plan-only" gate runs real (small) jobs.
  */
class PlanGuardSpec extends SparkSuite {

  // same resolution as the rest of the harness: driver-provided dir,
  // falling back to the smallest local fixture
  private val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  /** Queries whose BroadcastNestedLoopJoin is intentional and bounded:
    * a deliberately-broadcast small side (query vectors in brute-force
    * kNN) or a 1-row aggregate attached by cross join (corpus size N in
    * TF-IDF). The broadcast side's size bounds the work per row — these
    * are linear scans, not quadratic blowups. */
  private val allowBnlj = Set(
    "q27_knn_cosine",     // candidates × broadcast(query vectors), k queries
    "q57_tfidf_terms",    // term frame × broadcast(1-row corpus count)
    "q71_unigram_logprob", // token frame × broadcast(1-row token total)
    "q75_embed_decontam",  // train scan × broadcast(eval vectors), small eval side
    "q89_dsir_weights",    // token frame × broadcast(1-row totals/vocab)
    "q91_curation_v2",     // same 1-row totals join inside its DSIR gate
    "q92_bigram_logprob",  // token frame × broadcast(1-row corpus total)
    "q95_temperature_mix", // taxonomy counts × broadcast(1-row totals)
    "q56_token_deciles",   // doc scan × broadcast(1-row decile bounds)
    "q97_ppl_buckets",     // q92's scoring shape × broadcast(1-row tercile bounds)
    "q98_ppl_buckets_scaled", // scores × broadcast(1-row tercile bounds)
    "q109_token_drift",    // vocab frame × broadcast(1-row totals)
    "q111_ann_recall",     // q27's brute-force ground truth inside the recall eval
    "q113_funnel",         // k-row step frame × broadcast(1-row step counts)
    "q115_pmi_collocations", // pair frame × broadcast(1-row totals) ×2
    "q118_kanon",          // rollup frame × broadcast(1-row sub-k mass)
    "q126_bootstrap_ci",   // 1-row CI frame × broadcast(1-row point mean)
    "q129_fk_health",      // 1-row child count × broadcast(1-row orphan count), per edge
    "q134_mutual_knn",     // 200-row eval slice × broadcast(itself), brute-force top-1
    "q136_annotator_kappa", // 1-row totals × broadcast(1-row chance agreement)
    "q141_retrieval_eval", // q134's eval-slice brute-force ranking under the metrics
    "q143_krippendorff",   // 1-row totals × broadcast(1-row marginal sum)
    "q152_multiprobe_recall", // q111's brute-force ground truth under the recall compare
    "q154_bm25",           // postings × broadcast(1-row corpus stats)
    "q155_pagerank",       // node frame × broadcast(1-row node count)
    "q157_hard_negatives", // q27's brute-force shape with a label anti-predicate
    "q160_time_decay",     // event scan × broadcast(1-row max timestamp)
    "q164_degree_dist",    // degree histogram × broadcast(1-row node total)
    "q166_triplets",       // q157's brute-force shape, dual-rank pivot
    "q177_novelty",        // doc scan × broadcast(1-row max doc_id)
    "q179_token_bursts",   // doc scan × broadcast(1-row max id + total)
    "q181_ks_drift",       // length grid × broadcast(sources + 1-row total)
    "q183_rrf_fusion",     // q154's postings × broadcast(1-row corpus stats)
    "q184_log_odds_terms", // count frame × broadcast(1-row corpus totals)
    "q186_markov_stationary", // state frame × broadcast(1-row state count)
    "q199_split_divergence", // token-count frame × broadcast(1-row split totals)
    "q203_lpa_modularity",  // community frame × broadcast(1-row edge total)
    "q205_knn_hubness",     // q134's 200-row eval-slice brute-force kNN
    "q211_rfm_segments",    // per-customer frame × broadcast(1-row max date)
    "q233_idle_customers",  // customer scan × broadcast(1-row avg balance)
    "q242_dedup_whatif",    // 4-row sweep × broadcast(1-row corpus count)
    "q255_transitivity_audit", // 1-row wedge aggregate × broadcast(1-row edge count)
    "q265_decontam_ngram_sweep", // 1-row contaminated count × broadcast(1-row test count), per n
    "q270_temperature_sweep", // taxonomy counts × broadcast(1-row totals), per alpha
    "q295_zonemap_pruning",  // block frame × broadcast(1-row span, 3-row pct grid)
    "q296_chi2_lang_source", // cell frame × broadcast(1-row corpus totals)
    "q300_t_closeness",      // cell-label frame × broadcast(1-row corpus total)
    "q302_null_cosine_baseline", // embedding scan × broadcast(1-row count) for the derangement partner
    "q306_conversion_latency_quantiles", // latency histogram × broadcast(1-row total)
    "q307_llr_collocations", // bigram-count frame × broadcast(1-row bigram total)
    "q309_anova_dow_revenue", // 7-row group frame × broadcast(1-row totals)
    "q310_theilsen_trend",   // span-bounded day frame × itself (t<t inequality pairing) + 1-row broadcasts
    "q311_runs_test",        // day frame × broadcast(1-row median)
    "q272_retrieval_overlap", // q154's postings × broadcast(1-row corpus stats)
    "q324_kruskal_wallis",   // 1-row pivoted rank terms × broadcast(1-row tie totals)
    "q325_kendall_tau",      // span-bounded day frame × itself (day<day pairing, q310's shape)
    "q326_wasserstein_values", // value-grid CDF frame × broadcast(1-row sample sizes)
    "q328_equidepth_hist",     // price histogram × broadcast(1-row total)
    "q329_randomization_test", // doc slice × broadcast(128-row perm ids + 1-row observed diff)
    "q330_jackknife_ratio",    // month frame × broadcast(1-row totals)
    "q331_bloom_fpp_audit",    // 1-row member/bit/probe counts × broadcast, assembled
    "q333_simpson_audit",      // 3-row stratum frame × broadcast(1-row overall cov)
    "q334_changepoint",        // day frame × broadcast(1-row totals)
    "q335_srm_audit",          // 1-row user counts × broadcast(1-row event counts)
    "q336_negative_sampling",  // 50-row head × broadcast(1-row normalizer)
    "q337_fano_burstiness",    // 5-row type frame × broadcast(1-row hour span)
    "q338_seasonal_strength",  // 1-row residual moments × broadcast(1-row totals)
    "q340_hill_tail_index",    // 100-row head × broadcast(1-row threshold)
    "q341_james_stein",        // source frame × broadcast(1-row grand/within/between masses)
    "q343_good_turing",        // 6-row freq-of-freqs × broadcast(1-row total)
    "q344_burrows_delta",      // source frame × broadcast(20-row top-token frame)
    "q346_quantile_drift_bands", // month bands × broadcast(1-row global band)
    "q348_friedman_test",      // 1-row rank pivot × broadcast(1-row n/ties)
    "q349_sprt_boundary",      // 1-row walk tail × broadcast(1-row first crossing)
    "q350_theil_decomposition", // doc scan × broadcast(1-row totals)
    "q355_neyman_allocation",  // source frame × broadcast(1-row budget normalizer)
    "q357_token_pmi",          // 1-row pair-count pivot, exploded to 5 rows
    "q358_quality_length_tau", // bounded contingency cells × broadcast(itself), ≤10⁴ cell pairs
    "q360_lang_source_mi",     // cell frame × broadcast(1-row corpus total)
    "q365_retrieval_diversity") // q27's brute-force shape (candidates × broadcast(10 query vectors))

  test("no query plans a CartesianProduct, unexpected BNLJ, or any ScalaUDF") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val exec = fn(spark, sf).queryExecution.sparkPlan
      val plan = exec.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !allowBnlj(name)
      // a ScalaUDF node is a per-row serialization boundary opaque to
      // codegen — the whole surface is built from native expressions.
      // Walk the actual expression trees: physical plans print ScalaUDF
      // as just "UDF(...)", so a string match never fires (it let the
      // q88 prototype's UDF through until the native rewrite)
      val sudf = exec.find(_.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]))).nonEmpty
      if (cart || bnlj || sudf)
        Some(s"$name: ${Seq(
          if (cart) Some("CartesianProduct") else None,
          if (bnlj) Some("unexpected BroadcastNestedLoopJoin") else None,
          if (sudf) Some("ScalaUDF") else None).flatten.mkString(", ")}")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("no query emits a DecimalType (or any non-oracle-hashable type)") {
    // The driver's hash compare reads the Spark parquet dump via pyarrow
    // and the oracle result via a DuckDB fetch; a decimal column
    // round-trips as object-dtype Decimal('1.000000000') on one side and
    // float64 1.0 on the other, so equal VALUES hash differently (the
    // round-8 q109/q113–q117/q129 failure). House rule: decimals stay
    // internal (exact reduction-order-free sums) and every surface column
    // is one of the proven-hashable primitives below.
    import org.apache.spark.sql.types._
    val hashable: DataType => Boolean = {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType | _: StringType | _: BooleanType |
           _: TimestampType | _: DateType => true
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf).schema.fields.collect {
          case f if !hashable(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      s"surface columns outside the hashable set: ${offenders.mkString("; ")}")
  }

  /** Queries whose UNPARTITIONED SORT-WINDOW over a non-aggregate frame
    * is audited. EMPTY since round 12: the last two entries
    * (q56_token_deciles, q97_ppl_buckets) were rewritten onto exact
    * nearest-rank histogram boundaries (the q211 technique), so every
    * global sort-window left in the surface runs over a collapsed
    * (aggregate/top-k) frame — an unpartitioned Window with an orderSpec
    * over a per-row frame is a SINGLE-PARTITION SORT of its whole input,
    * the straggler-by-construction shape, and is now banned outright. */
  private val allowGlobalSortWindow = Set.empty[String]

  test("no unpartitioned sort-window over an unbounded per-row frame") {
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !allowGlobalSortWindow(name) =>
        val plan = fn(spark, sf).queryExecution.sparkPlan
        plan.collect {
          case w: WindowExec
              if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty =>
            // a global sort-window is scale-safe only when its input is
            // already collapsed: an aggregate frame (value-cardinality
            // histograms, rollups) or an explicitly bounded one (top-k).
            // A Staged (cached) frame hides its producer behind an
            // InMemoryTableScan; the cached plan is still right there —
            // recurse into it, the guarantee is identical.
            def collapsed(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
              p.collectFirst {
                case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
                case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
                case l: org.apache.spark.sql.execution.GlobalLimitExec => l
                case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
                    if collapsed(m.relation.cachedPlan match {
                      // AQE wraps the cached plan; the inner plan is a
                      // field, not a child, so collect needs the unwrap
                      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                        a.inputPlan
                      case p => p
                    }) => m
              }.nonEmpty
            if (collapsed(w.child)) None else Some(s"$name: $w")
        }.flatten
      case _ => Nil
    }
    assert(offenders.isEmpty,
      "unpartitioned sort-windows over unbounded per-row frames " +
        s"(single-partition sorts at scale): ${offenders.mkString("; ")}")
  }

  test("top-k heads plan TakeOrderedAndProject, windows only over bounded frames") {
    // q101 (top-10 tokens) and q124 (top-1000 Zipf head) take their heads
    // with orderBy+limit — per-partition heaps and a k-row merge. A
    // single-partition Window over the unbounded vocabulary frame is the
    // regression this pins: any Window in these plans must sit above the
    // k-row limit (TakeOrderedAndProject / GlobalLimit in its subtree).
    for (q <- Seq("q101_countmin", "q124_zipf_fit")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      assert(plan.toString.contains("TakeOrderedAndProject"),
        s"$q: expected a TakeOrderedAndProject top-k head")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      windows.foreach { w =>
        val bounded = w.child.collectFirst {
          case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
          case l: org.apache.spark.sql.execution.GlobalLimitExec => l
        }.nonEmpty
        assert(bounded, s"$q: Window over an unbounded frame:\n$w")
      }
    }
  }

  test("funnel plans ONE user-keyed Exchange regardless of depth") {
    // the funnel's claim: k chained conditional-min windows share the
    // user hash-partitioning, so depth adds Window nodes, not shuffles.
    // Count exchanges BELOW the per-user aggregation (the final ordering
    // and the 1-row counts aggregate legitimately exchange above it).
    val events = Tables.events(spark, sf)
    val deep = graft.ops.Funnel.funnel(events, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase", "error", "signup"))
    val plan = deep.queryExecution.executedPlan.toString
    val nWindows = "Window \\[".r.findAllIn(plan).size
    assert(nWindows == 5, s"expected 5 chained Window nodes, got $nWindows")
    val userShuffles =
      "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userShuffles == 1,
      s"funnel depth 5 must shuffle on user once, got $userShuffles:\n${plan.take(1500)}")
  }

  test("delta dedup never joins text against text") {
    // the base collapses to digest frames before any join: every join in
    // the plan must key on a hash/digest or the doc id, so join rows are
    // narrow. A plan carrying the text column through a join means the
    // digest collapse regressed.
    import spark.implicits._
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    val delta = base.limit(50)
    val plan = graft.ops.Incremental.deltaDedupStatus(base, delta,
      "doc_id", "text").queryExecution.sparkPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val keys = j.leftKeys.flatMap(_.references.map(_.name)).toSet
      assert(!keys.contains("text"),
        s"join keys must be digests/ids, got $keys")
    }
  }

  test("int8 quantization broadcasts dim stats, never shuffles vectors") {
    val plan = graft.ops.Similarity.int8QuantReport(
      Tables.embeddings(spark, sf), "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "per-dim scales must broadcast")
    // every shuffle keys on the dim column (aggregate partials / the
    // final dim ordering) or on vec_id (Tables' small-layout fan-out,
    // which spreads the 1–2-split fixture scan across the cluster before
    // the per-vector math) — the embedding VECTORS never exchange on any
    // other key
    val parts = "Exchange (?:hash|range)partitioning\\((\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(parts.nonEmpty && parts.forall(p => p == "dim" || p == "vec_id"),
      s"only dim-/fan-out-keyed exchanges expected, got $parts")
  }

  test("q02's time bound reaches the parquet scan as a pushed filter") {
    // the raw-nanos predicate (Tables.eventsFrom) must appear in
    // PushedFilters — a regression here turns a row-group-pruned read
    // into a full scan, the difference between a day and 100 TB
    val plan = SparkEntry.queries("q02_event_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts,.*"),
      s"expected a pushed ts lower bound, plan:\n${plan.take(2000)}")
  }
}
