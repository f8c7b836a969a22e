package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the metric harness run before an
  * embedding model or ANN index is trusted for retrieval-augmented
  * training data: rank every query's neighbors, treat same-label
  * items as relevant, and report MRR@k / precision@k / recall@k /
  * nDCG@k per label class.
  *
  * Scale shape: the ranking comes from whatever candidate generator the
  * caller trusts — here [[Similarity.knnBruteForce]] over an
  * EVALUATION-SIZED slice (the standard eval protocol: exact
  * ground-truth ranking on a held-out set; at corpus scale the same
  * metric frame runs over [[Similarity.knnIvf]]/[[Similarity.knnLsh]]
  * candidates, q111's recall-eval precedent). Everything after the
  * ranked frame is per-query then per-label aggregation — work
  * proportional to queries×k, never corpus².
  *
  * Determinism: the DCG discounts 1/log₂(rank+1) and their prefix sums
  * (the ideal DCG) are precomputed driver-side and baked in as plan
  * LITERALS, so both engines in a cross-check consume bit-identical
  * constants instead of each taking its own log₂; per-query metrics
  * round to 9 dp before the decimal-exact per-label mean. */
object Ranking {

  private val D = "decimal(28,12)"

  /** DCG discount table: discounts(i) = 1/log₂(i+2) for 0-based i
    * (rank i+1), and idcg(r) = Σ_{j<r} discounts(j). */
  def discounts(k: Int): Array[Double] =
    Array.tabulate(k)(i => 1.0 / (math.log(i + 2.0) / math.log(2.0)))
  def idcgTable(k: Int): Array[Double] =
    discounts(k).scanLeft(0.0)(_ + _).tail

  /** Per-label retrieval metrics over `vecs` (a [[Similarity.prepared]]
    * frame) with `labels` = (id, label). Relevant = same label as the
    * query, self excluded. Output one row per label: n_queries and the
    * label-mean MRR@k, precision@k, recall@k, nDCG@k (9 dp).
    *
    * recall@k and the ideal DCG normalize by min(k, R) where R = the
    * query's total relevant count (label size − 1) — the standard
    * truncated-ideal convention, so a label larger than k can still
    * reach 1.0. */
  def retrievalEval(vecs: DataFrame, labels: DataFrame, k: Int): DataFrame =
    retrievalEvalRanked(Similarity.knnBruteForce(vecs, vecs, k),
      labels, k)

  /** Same metric frame over a CALLER-SUPPLIED ranking `(query_id,
    * neighbor_id, rank)` — the corpus-scale path: feed
    * [[Similarity.knnIvf]]/[[Similarity.knnLsh]] candidates (or any
    * reranked retrieval) and get the identical per-label report, so an
    * ANN index is graded by the SAME metrics as the exact ground truth
    * it approximates. A query with no candidates at all simply has no
    * row in `ranked` and drops from its label's mean (an ANN miss-all
    * is visible in n_queries, not silently scored). */
  def retrievalEvalRanked(rankedCandidates: DataFrame, labels: DataFrame,
                          k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val disc = discounts(k)
    val idcg = idcgTable(k)

    val lab = labels.select(col("id"), col("label"))
    val ranked = rankedCandidates
      .where($"rank" <= k)
      .join(broadcast(lab.select($"id".as("query_id"),
        $"label".as("q_label"))), Seq("query_id"))
      .join(broadcast(lab.select($"id".as("neighbor_id"),
        $"label".as("n_label"))), Seq("neighbor_id"))
      .withColumn("rel", ($"q_label" === $"n_label").cast("int"))

    // R per query = label size − 1 (self excluded) — label-cardinality
    val labelSizes = lab.groupBy($"label".as("q_label"))
      .agg(count(lit(1)).cast("long").as("__lsz"))

    val discLit = array(disc.map(lit): _*)
    val idcgLit = array(idcg.map(lit): _*)
    val perQuery = ranked.groupBy($"query_id", $"q_label")
      .agg(
        min(when($"rel" === 1, $"rank")).as("first_rel"),
        sum($"rel").cast("long").as("n_rel_at_k"),
        sum(round(when($"rel" === 1,
            element_at(discLit, $"rank")).otherwise(lit(0.0)), 9)
          .cast(D)).cast("double").as("dcg"))
      .join(broadcast(labelSizes), Seq("q_label"))
      .select($"q_label",
        round(coalesce(lit(1.0) / $"first_rel", lit(0.0)), 9).as("mrr"),
        round($"n_rel_at_k" / lit(k.toDouble), 9).as("prec"),
        round(when($"__lsz" > 1,
            $"n_rel_at_k" / least(lit(k.toLong), $"__lsz" - 1))
          .otherwise(lit(0.0)), 9).as("rec"),
        round(when($"__lsz" > 1,
            $"dcg" / element_at(idcgLit,
              least(lit(k), ($"__lsz" - 1).cast("int"))))
          .otherwise(lit(0.0)), 9).as("ndcg"))

    def dmean(c: String) =
      round(sum(col(c).cast(D)).cast("double") / count(lit(1)), 9).as(c)
    perQuery.groupBy($"q_label".as("label"))
      .agg(count(lit(1)).cast("long").as("n_queries"),
        dmean("mrr"), dmean("prec"), dmean("rec"), dmean("ndcg"))
  }

  /** Okapi BM25 top-k retrieval — the lexical ranking a RAG/data-mining
    * pipeline runs beside its embedding kNN: for each query (a bag of
    * terms in `queryTerms(query_id, term)`), the `topK` highest-scoring
    * documents under BM25(k1, b).
    *
    * Scale shape: one corpus scan builds the (doc, term, tf, dl)
    * postings RESTRICTED to query vocabulary (the broadcast semi-join
    * prunes before the aggregation, so posting volume is bounded by the
    * query vocabulary's document frequency, not corpus size); document
    * frequency and the per-query scores derive from that postings frame
    * alone; corpus stats (N, avgdl) attach as a 1-row broadcast. The
    * head is a per-query top-k window over score-matched docs only —
    * candidates per query are the union of its terms' postings, the
    * inverted-index bound every search engine relies on.
    *
    * Determinism: per-(query,doc,term) scores round to 9 dp, sum
    * exactly as DECIMAL(28,12), and the rank orders by the rounded
    * score with a doc-id tie-break — reproducible on any engine
    * computing the same tree (constants embedded via Double.toString).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: DataFrame, topK: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lens = docs.select(col(idCol).as("doc"),
      Text.tokenCount(col(textCol)).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("long").as("n"),
      (sum($"dl").cast("double") / count(lit(1))).as("avgdl"))
    val terms = queryTerms.select($"term").distinct()
    val postings = docs.select(col(idCol).as("doc"),
        Text.tokenCount(col(textCol)).cast("long").as("dl"),
        explode(Text.tokens(col(textCol))).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy($"doc", $"term")
      .agg(count(lit(1)).cast("long").as("tf"), min($"dl").as("dl"))
    val dfreq = postings.groupBy($"term")
      .agg(count(lit(1)).cast("long").as("dfc"))
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(queryTerms.select($"query_id", $"term")), Seq("term"))
      .crossJoin(broadcast(stats))
      .select($"query_id", $"doc",
        round(log(lit(1.0) + ($"n" - $"dfc" + lit(0.5)) / ($"dfc" + lit(0.5))) *
          (($"tf" * lit(k1 + 1.0)) /
            ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * ($"dl" / $"avgdl")))),
          9).as("s"))
    val agg = scored.groupBy($"query_id", $"doc")
      .agg(round(sum($"s".cast(D)).cast("double"), 9).as("score"))
    Windows.topNPerGroup(agg, Seq($"query_id"), Seq($"score".desc, $"doc"), topK)
      .select($"query_id", $"doc".as(idCol), $"score", $"rn".as("rnk"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    * runs — the standard hybrid-retrieval combiner (BM25 + dense, or
    * any pair of rankers): score(q, d) = Σ_runs 1/(k0 + rank), items
    * absent from a run contribute 0. Scores depend only on RANKS, so
    * fusion is immune to the incomparable score scales that break
    * linear interpolation — the reason RRF is the default in hybrid
    * search stacks.
    *
    * Scale shape: one full-outer equi-join of two (query, item, rank)
    * frames that are already top-k-sized (queries×k rows, never
    * corpus-sized), then a per-query window over ≤ 2k candidates. The
    * reciprocal terms are exact small-integer divisions summed in a
    * FIXED two-term expression order — engine-bit-reproducible, no
    * decimal machinery needed. Ranks surface as nullable `rank_a` /
    * `rank_b` so a consumer can see which system contributed. */
  def rrfFuse(runA: DataFrame, runB: DataFrame, queryCol: String,
              itemCol: String, rankCol: String, k0: Int = 60,
              topK: Int = 10): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    val a = runA.select(col(queryCol).as("__q"), col(itemCol).as("__i"),
      col(rankCol).as("rank_a"))
    val b = runB.select(col(queryCol).as("__q"), col(itemCol).as("__i"),
      col(rankCol).as("rank_b"))
    val fused = a.join(b, Seq("__q", "__i"), "full_outer")
      .select($"__q", $"__i", $"rank_a", $"rank_b",
        round(coalesce(lit(1.0) / (lit(k0) + $"rank_a"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + $"rank_b"), lit(0.0)), 9).as("rrf"))
    Windows.topNPerGroup(fused, Seq($"__q"), Seq($"rrf".desc, $"__i"), topK)
      .select($"__q".as(queryCol), $"__i".as(itemCol), $"rank_a", $"rank_b",
        $"rrf", $"rn".as("rnk"))
  }
}
