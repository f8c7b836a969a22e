package graft

import org.apache.spark.sql.functions._
import graft.ops.{Classify, Dedup, Kmeans, Ranking, Similarity, Text}

/** Sixth-wave operators: Lloyd k-means (planted recovery, partitioning
  * invariance, empty clusters), retrieval eval (hand-computed metrics,
  * perfect-retrieval bound), Krippendorff's alpha (agreement extremes,
  * missing ratings, a hand-computed mixed case), majority vote
  * (tie-break, consensus confidence), vocabulary growth (exact counts,
  * saturated-corpus β), boilerplate report (planted header, clean doc). */
class Wave6Spec extends SparkSuite {
  import spark.implicits._

  // ---- k-means ----------------------------------------------------------

  private def plantedVecs = {
    // 3 tight clusters around orthogonal unit axes in R^4, 5 points each
    val base = Seq(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    (0 until 15).map { i =>
      val c = base(i % 3)
      (i.toLong, c.map(_ + 0.01 * (i / 3)).toSeq)
    }.toDF("id", "emb")
  }

  test("kmeans recovers planted clusters with exact sizes") {
    val m = Kmeans.fit(plantedVecs, "emb", "id", k = 3, iters = 6,
      memo = false)
    assert(m.sizes.sorted.toSeq == Seq(5L, 5L, 5L), m.sizes.toSeq.toString)
    assert(m.n == 15L)
    // every planted point sits nearest its own cluster's centroid:
    // assignments must be pure (each cluster one plant family)
    val assigned = Kmeans.assign(plantedVecs, "emb", "c", m)
      .select($"id", $"c").as[(Long, Int)].collect()
    val families = assigned.groupBy(_._1 % 3).values.map(_.map(_._2).toSet)
    assert(families.forall(_.size == 1), assigned.toSeq.toString)
  }

  test("kmeans is bit-identical under repartitioning") {
    val a = Kmeans.fit(plantedVecs, "emb", "id", k = 3, iters = 6,
      memo = false)
    val b = Kmeans.fit(plantedVecs.repartition(7), "emb", "id", k = 3,
      iters = 6, memo = false)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.inertia == b.inertia && a.sizes.toSeq == b.sizes.toSeq)
  }

  test("kmeans: an empty cluster keeps its seed centroid, sizes account all rows") {
    // 2 distinct points, k=3: one cluster ends empty
    val two = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 1.0)),
      (3L, Seq(0.0, 0.0))).toDF("id", "emb")
    val m = Kmeans.fit(two, "emb", "id", k = 3, iters = 3, memo = false)
    assert(m.sizes.sum == 3L)
    assert(m.sizes.count(_ == 0L) >= 1)
  }

  // ---- retrieval eval ---------------------------------------------------

  test("retrievalEval: hand-computed metrics on a 4-vector fixture") {
    // ids 1,2 label A near the x-axis; 3,4 label B near y. For query 1
    // the ranking at k=2 is (2: same label, rank 1), (3 or 4). Perfect
    // first-rank retrieval for every query -> mrr 1, and with R=1
    // relevant per query: prec@2 = 0.5, rec = 1, ndcg = 1.
    val vecs = Similarity.prepared(Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.1, 0.9))).toDF("id", "emb"),
      "id", "emb")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("id", "label")
    val got = Ranking.retrievalEval(vecs, labels, k = 2)
      .select($"label", $"n_queries", $"mrr", $"prec", $"rec", $"ndcg")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(("A", 2L, 1.0, 0.5, 1.0, 1.0),
      ("B", 2L, 1.0, 0.5, 1.0, 1.0)), got.toString)
  }

  test("retrievalEval: miss at rank 1 discounts mrr and ndcg by the table") {
    // 3 vectors: query 1 (label A) ranks the B vector first, its A
    // partner second -> mrr 1/2, dcg = disc(2), idcg = disc(1)
    val vecs = Similarity.prepared(Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.8, 0.6))).toDF("id", "emb"), "id", "emb")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("id", "label")
    val row = Ranking.retrievalEval(vecs, labels, k = 2)
      .where($"label" === "A").select($"mrr", $"ndcg")
      .as[(Double, Double)].collect()
    val disc = Ranking.discounts(2)
    // query 1: first_rel=2; query 2: its A partner (id 1) outranks id 3
    // (cos(2,1)=0 < cos(2,3)=0.6) -> first_rel=2 as well
    val expNdcg = BigDecimal(disc(1) / disc(0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.head == ((0.5, expNdcg)), row.toSeq.toString)
  }

  // ---- Krippendorff's alpha --------------------------------------------

  test("krippendorffAlpha: perfect agreement scores 1, unpairable units drop") {
    val df = Seq(
      (1L, "x", "x", "x"), (2L, "y", "y", "y"),
      (3L, "z", null, null) // single rating: unpairable
    ).toDF("unit", "a", "b", "c")
    val got = Classify.krippendorffAlpha(df, "unit", Seq("a", "b", "c"))
      .select($"n_units", $"n_ratings", $"alpha")
      .as[(Long, Long, Double)].collect().head
    assert(got == ((2L, 6L, 1.0)), got.toString)
  }

  test("krippendorffAlpha: hand-computed mixed fixture") {
    // units: (x,x), (x,y) -> D_o = (1/4)*(0 + 2) = 0.5
    // marginals: x=3, y=1, n=4 -> D_e = (16-10)/12 = 0.5 -> alpha = 0
    val df = Seq((1L, "x", "x"), (2L, "x", "y")).toDF("unit", "a", "b")
    val got = Classify.krippendorffAlpha(df, "unit", Seq("a", "b"))
      .select($"d_o", $"d_e", $"alpha")
      .as[(Double, Double, Double)].collect().head
    assert(got == ((0.5, 0.5, 0.0)), got.toString)
  }

  test("krippendorffAlpha: one-category degenerate scores 1.0") {
    val df = Seq((1L, "x", "x"), (2L, "x", "x")).toDF("unit", "a", "b")
    val got = Classify.krippendorffAlpha(df, "unit", Seq("a", "b"))
      .select($"alpha").as[Double].collect().head
    assert(got == 1.0)
  }

  // ---- majority vote ----------------------------------------------------

  test("majorityVoteReport: modal consensus, lexicographic ties, missing ratings") {
    val df = Seq(
      (1L, "x", "x", "y"),  // consensus x (2/3)
      (2L, "y", "x", null), // 1-1 tie -> lexicographic "x" (1/2)
      (3L, "z", "z", "z")   // unanimous
    ).toDF("unit", "a", "b", "c")
    val got = Classify.majorityVoteReport(df, "unit", Seq("a", "b", "c"))
      .select($"annotator", $"n_rated", $"n_agree", $"score")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((3L, 2L, 0.666666667)), got.toString) // misses unit 2
    assert(got("b") == ((3L, 3L, 1.0)), got.toString)
    // c rated units 1 and 3 only; its y on unit 1 loses to consensus x
    assert(got("c") == ((2L, 1L, 0.5)), got.toString)
  }

  test("majorityVoteReport: consensus row reports share and unanimity") {
    val df = Seq(
      (1L, "x", "x", "y"), (2L, "y", "x", null), (3L, "z", "z", "z")
    ).toDF("unit", "a", "b", "c")
    val cons = Classify.majorityVoteReport(df, "unit", Seq("a", "b", "c"))
      .where($"annotator" === "__consensus__")
      .select($"n_rated", $"n_agree", $"score")
      .as[(Long, Long, Double)].collect().head
    // shares: 2/3, 1/2, 1 -> mean = (0.666666667+0.5+1)/3; unanimous: 1
    assert(cons._1 == 3L && cons._2 == 1L)
    assert(math.abs(cons._3 - 0.722222222) < 1e-9, cons.toString)
  }

  // ---- vocabulary growth ------------------------------------------------

  test("vocabGrowth: exact counts and a saturated corpus fits beta 0") {
    // one group, every doc the same two tokens: vocab stops growing
    val docs = (1L to 20L).map(i => (i, "g1", "aa bb")).toDF("id", "g", "text")
    val got = Text.vocabGrowth(docs, "id", "text", "g", buckets = 5)
      .select($"n_docs", $"n_tokens", $"vocab", $"hapax", $"ttr",
        $"heaps_beta")
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == 20L && got._2 == 40L && got._3 == 2L && got._4 == 0L)
    assert(got._5 == 0.05) // 2 / 40
    assert(got._6 == 0.0, s"saturated corpus must fit beta 0, got ${got._6}")
  }

  test("vocabGrowth: growing vocabulary fits a positive beta below 1") {
    // doc i contributes one new token + one repeated token: V ~ N/2
    val docs = (1L to 30L).map(i => (i, "g1", s"tok$i common"))
      .toDF("id", "g", "text")
    val got = Text.vocabGrowth(docs, "id", "text", "g", buckets = 5)
      .select($"vocab", $"hapax", $"heaps_beta")
      .as[(Long, Long, Double)].collect().head
    assert(got._1 == 31L && got._2 == 30L)
    assert(got._3 > 0.8 && got._3 < 1.05, s"near-linear growth, got ${got._3}")
  }

  // ---- boilerplate ------------------------------------------------------

  test("boilerplateReport: planted shared header flags, unique docs score 0") {
    val header = "one two three four" // one full 4-token tile when prepended
    val docs = ((1L to 8L).map(i => (i, s"$header body$i filler$i end$i")) :+
      (9L, "clean doc with unique tokens only here")).toDF("doc_id", "text")
    val got = Dedup.boilerplateReport(docs, "doc_id", "text", k = 4,
        minDf = 8, tileKey = c => md5(c))
      .select($"doc_id", $"n_tiles", $"n_bp_tiles", $"bp_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // docs 1-8: 2 tiles each (header + 3-token tail), header df=8 -> bp
    got.take(8).foreach { r =>
      assert(r._2 == 2L && r._3 == 1L && r._4 == 0.5, r.toString)
    }
    assert(got.last == ((9L, 2L, 0L, 0.0)), got.last.toString)
  }

  test("boilerplateReport: below-threshold recurrence is not boilerplate") {
    val header = "one two three four"
    val docs = (1L to 7L).map(i => (i, s"$header tail$i")).toDF("doc_id", "text")
    val flagged = Dedup.boilerplateReport(docs, "doc_id", "text", k = 4,
        minDf = 8, tileKey = c => md5(c))
      .agg(sum($"n_bp_tiles")).as[Long].collect().head
    assert(flagged == 0L, s"df=7 < minDf=8 must not flag, got $flagged")
  }
}
