package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curate, Graph, Ranking, Similarity, Text}

/** Eighth-wave operators: BM25 (idf/tf/length-norm behavior), PageRank
  * (authority vs degree, mass conservation, partition determinism),
  * readability (hand-computed Flesch), hard negatives (label exclusion),
  * and winsorization (exact clip counts on a known distribution). */
class Wave8Spec extends SparkSuite {
  import spark.implicits._

  // ---- BM25 -------------------------------------------------------------

  test("bm25TopK: tf wins within a term, rare terms outscore common ones") {
    val docs = Seq(
      (1L, "cat cat cat dog"),   // tf(cat)=3
      (2L, "cat dog dog dog"),   // tf(cat)=1
      (3L, "cat bird bird bird"),
      (4L, "fish fish fish fish") // no query terms -> absent
    ).toDF("doc_id", "text")
    val qt = Seq(("q1", "cat"), ("q2", "bird")).toDF("query_id", "term")
    val got = Ranking.bm25TopK(docs, "doc_id", "text", qt, topK = 10)
      .select($"query_id", $"doc_id", $"rnk", $"score")
      .as[(String, Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // q1: doc1 (tf 3) above docs 2/3 (tf 1, equal dl -> id tie-break)
    assert(got("q1") == Seq(1L, 2L, 3L), got.toString)
    // q2: only doc3 contains "bird"; doc4 never appears anywhere
    assert(got("q2") == Seq(3L), got.toString)
  }

  test("bm25TopK: multi-term queries sum per-term scores") {
    val docs = Seq(
      (1L, "alpha beta gap gap"), // both terms
      (2L, "alpha gap gap gap"),  // one term
      (3L, "beta gap gap gap")).toDF("doc_id", "text")
    val qt = Seq(("q", "alpha"), ("q", "beta")).toDF("query_id", "term")
    val rows = Ranking.bm25TopK(docs, "doc_id", "text", qt, topK = 3)
      .select($"doc_id", $"rnk", $"score")
      .as[(Long, Int, Double)].collect().sortBy(_._2)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), rows.mkString(","))
    // doc1's score = doc2's + doc3's contributions (same tf=1, same dl)
    val Seq(s1, s2, s3) = rows.map(_._3).toSeq
    assert(math.abs(s1 - (s2 + s3)) < 1e-8, s"$s1 vs ${s2 + s3}")
  }

  // ---- PageRank ---------------------------------------------------------

  /** Undirected edge list (both directions). */
  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("pageRank: star hub outranks leaves; symmetric mass conserves") {
    val e = undirected((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val pr = Graph.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(pr(1L) > pr(2L) * 2, s"hub should dominate: $pr")
    assert(Seq(2L, 3L, 4L, 5L).map(pr).distinct.size == 1, "leaves equal")
    // no dangling nodes -> total mass stays 1 (up to per-round rounding)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, pr.values.sum.toString)
  }

  test("pageRank: second-order authority — a hub's neighbor beats a leaf of equal degree") {
    // two stars joined: 1-(2,3,4), 5-(6,7,8), bridge 1-5. Nodes 2-4 and
    // 6-8 all have degree 1, but hang off high-rank hubs; a pendant
    // chain node 9 off node 2 gives 2 degree 2 -> still the hubs win
    val e = undirected((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (5L, 7L),
      (5L, 8L), (1L, 5L), (2L, 9L))
    val pr = Graph.pageRank(e, "src", "dst", iters = 8)
      .as[(Long, Double)].collect().toMap
    assert(pr(1L) > pr(2L) && pr(5L) > pr(6L), pr.toString)
    // 2 (degree 2, hub-adjacent) outranks 6 (degree 1, hub-adjacent)
    assert(pr(2L) > pr(6L), pr.toString)
  }

  test("pageRank: invariant under input partitioning") {
    val pairs = (1L to 30L).map(i => (i, i % 10 + 31L))
    val a = Graph.pageRank(undirected(pairs: _*), "src", "dst")
      .as[(Long, Double)].collect().toSet
    val b = Graph.pageRank(undirected(pairs: _*).repartition(13), "src", "dst")
      .as[(Long, Double)].collect().toSet
    assert(a == b)
  }

  // ---- readability ------------------------------------------------------

  test("readabilityScore: hand-computed Flesch on a punctuated doc") {
    val df = Text.readabilityScore(
      Seq((1L, "go go go. stop now."), (2L, "unpunctuated run")).toDF("id", "text"),
      "text")
      .select($"id", $"n_words", $"n_sents", $"n_sylls", $"flesch")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    val (_, w1, s1, y1, f1) = df(0)
    // "go go go. stop now." -> 5 words, 2 dots, vowel runs: o,o,o,o,o(w) = 5
    assert((w1, s1, y1) == (5L, 2L, 5L), df(0).toString)
    val expect = BigDecimal(206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(f1 == expect, s"$f1 vs $expect")
    // unpunctuated doc: sentence floor of 1, not division by zero
    assert(df(1)._3 == 1L, df(1).toString)
  }

  // ---- hard negatives ---------------------------------------------------

  test("hardNegatives: same-label neighbors are excluded, k nearest kept") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), 0),   // query, label 0
      (2L, Seq(0.999, 0.01), 0), // nearest overall but SAME label
      (3L, Seq(0.9, 0.1), 1),
      (4L, Seq(0.8, 0.2), 1),
      (5L, Seq(0.0, 1.0), 2)).toDF("vec_id", "embedding", "label")
    val e = Similarity.prepared(vecs, "vec_id", "embedding")
    val lab = vecs.select($"vec_id".as("id"), $"label")
    val got = Similarity.hardNegatives(e.where($"id" === 1), e, lab, k = 2)
      .select($"neighbor_id", $"rnk", $"n_label")
      .as[(Long, Int, Int)].collect().sortBy(_._2).toSeq
    assert(got.map(_._1) == Seq(3L, 4L), got.toString) // 2 excluded
    assert(got.forall(_._3 != 0), "no same-label negatives")
  }

  // ---- winsorize --------------------------------------------------------

  test("winsorizeReport: exact P5/P95 clip counts on 1..100") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = Curate.winsorizeReport(df, "grp", "v", 0.05, 0.95)
      .select($"n", $"n_lo", $"n_hi", $"p_lo", $"p_hi", $"mean_raw",
        $"mean_winsor")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    // quantile_cont(0.05) over 1..100 = 5.95; (0.95) = 95.05
    assert(r == ((100L, 5L, 5L, 5.95, 95.05, 50.5, 50.5)), r.toString)
  }

  test("winsorizeReport: clipping pulls a spiked mean toward the body") {
    val df = ((1 to 99).map(i => ("g", 1.0)) :+ ("g", 1000.0)).toDF("grp", "v")
    val r = Curate.winsorizeReport(df, "grp", "v", 0.05, 0.95)
      .select($"mean_raw", $"mean_winsor", $"n_hi")
      .as[(Double, Double, Long)].head()
    assert(r._1 > 10.0 && r._2 < 2.0 && r._3 == 1L, r.toString)
  }
}
