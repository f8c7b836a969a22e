package graft

import org.apache.spark.sql.functions._
import graft.ops.{Classify, Diagnostics, Funnel, Linkage, Similarity, Text}

/** Fourth-wave operators: record linkage (blocking recall bounds, master
  * vocabulary collapse), event transitions (ordering + normalization),
  * code-switch halving, mutual top-1 (asymmetry filter), key skew
  * (exact stats), classifier eval (degenerate classes), Cohen's kappa
  * (agreement extremes). */
class Wave4Spec extends SparkSuite {
  import spark.implicits._

  test("matchToMaster: swaps/case/punct link at 0, suffix typo at 1, prefix typo missed") {
    val master = Seq(
      (10L, "small ring"), (11L, "red widget"), (12L, "small ring"))
      .toDF("id", "name")
    val dirty = Seq(
      (1L, "Ring, SMALL"),   // swap + case + punctuation -> dist 0
      (2L, "red widgetx"),   // suffix typo -> dist 1
      (3L, "Xed widget"),    // typo INSIDE the 4-char prefix -> key miss
      (4L, "blue gear")      // no master counterpart
    ).toDF("id", "name")
    val got = Linkage.matchToMaster(dirty, "id", master, "id", "name", maxDist = 2)
      .select($"dirty_id", $"master_id", $"edit_dist")
      .as[(Long, Long, Int)].collect().toSet
    // master_id 10 (not 12): the vocabulary collapse keeps the SMALLEST
    // id per name; the prefix typo and the unmatched record emit nothing
    assert(got == Set((1L, 10L, 0), (2L, 11L, 1)), got.toString)
  }

  test("eventTransitions: counts, row-normalized probs, deterministic ties") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)
    // u1: a->b->a; u2: a->b; same-time pair for u3 ordered by event_id
    val events = Seq(
      (1L, 1L, t(0), "a"), (2L, 1L, t(1), "b"), (3L, 1L, t(2), "a"),
      (4L, 2L, t(0), "a"), (5L, 2L, t(1), "b"),
      (6L, 3L, t(0), "b"), (7L, 3L, t(0), "a") // tie: event_id orders b then a
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.eventTransitions(events, "user_id", "ts", "event_id", "event_type")
      .select($"from_type", $"to_type", $"n_trans", $"prob")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 1.0),          // both a-transitions go to b
      ("b", "a", 2L, 1.0)),         // u1's b->a and u3's tie-ordered b->a
      got.toString)
  }

  test("codeSwitch: glued languages flag, uniform and tiny docs do not") {
    val docs = Seq(
      (1L, "the a of and der die und das"), // en head, de tail -> switch
      (2L, "the a of and is to in the"),    // en throughout
      (3L, "the")                           // 1 token: empty tail, no signal
    ).toDF("doc_id", "text")
    val got = Text.codeSwitch(docs, "doc_id", "text")
      .select($"doc_id", $"lang_head", $"lang_tail", $"is_switch")
      .as[(Long, String, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "en", "de", true),
      (2L, "en", "en", false),
      (3L, "en", "en", false)), got.toString)
  }

  test("mutualTopOnePairs: keeps only reciprocal nearest neighbors") {
    // a and b are each other's top-1; c's top-1 is b, but b's is a — so
    // (b, c) must NOT survive the mutual filter
    val vecs = Similarity.prepared(Seq(
      (1L, Array(1.0f, 0.0f)),        // a
      (2L, Array(0.99f, 0.14f)),      // b: closest to a
      (3L, Array(0.7f, 0.7f))         // c: closest to b, not reciprocated
    ).toDF("id", "emb"), "id", "emb")
    val got = Similarity.mutualTopOnePairs(vecs)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), got.toString)
  }

  test("keySkew: exact stats on a constructed distribution") {
    // key frequencies: x=6, y=2, z=2 (plus nulls, which are excluded)
    val df = (Seq.fill(6)("x") ++ Seq.fill(2)("y") ++ Seq.fill(2)("z"))
      .map(Option(_)).appended(None).toDF("k")
    val r = Diagnostics.keySkew(df, "k", "t.k").collect().head
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("max_n") == 6L)
    assert(r.getAs[Double]("p50_n") == 2.0)
    assert(r.getAs[Double]("top_share") == 0.6)
    // hhi = (36 + 4 + 4) / 100
    assert(r.getAs[Double]("hhi") == 0.44)
  }

  test("classifierEval: degenerate classes (never predicted / predicted only)") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), // a: tp 2, fn 1
      ("b", "a"),                          // b: tp 0, fn 1; a gains fp
      ("c", "d")                           // c never predicted; d never true
    ).toDF("truth", "pred")
    val got = Classify.classifierEval(df, "truth", "pred")
      .select($"label", $"support", $"tp", $"fp", $"fn", $"precision", $"recall", $"f1")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) == Seq(
      ("a", 3L, 2L, 1L, 1L), ("b", 1L, 0L, 1L, 1L),
      ("c", 1L, 0L, 0L, 1L), ("d", 0L, 0L, 1L, 0L)), got.toString)
    val a = got.head
    assert(a._6 == BigDecimal(2.0 / 3).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(a._7 == BigDecimal(2.0 / 3).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // zero-tp / zero-denominator classes score 0.0, not null/NaN
    assert(got.drop(1).forall(_._6 == 0.0))
    assert(got.forall(r => !r._6.isNaN && !r._7.isNaN && !r._8.isNaN))
  }

  test("pca: recovers a planted dominant direction, partitioning-free, orthonormal") {
    // 400 vectors in 8 dims: strong variance along (1,1,0,...)/√2 (±3),
    // weak iid noise elsewhere — PC1 must align with the plant
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val s = if (i % 2 == 0) 3.0 else -3.0
      val base = Array.fill(8)(rnd.nextGaussian() * 0.1)
      base(0) += s / math.sqrt(2); base(1) += s / math.sqrt(2)
      (i.toLong, base.map(_.toFloat))
    }
    val df = rows.toDF("id", "emb")
    val m = graft.ops.Pca.topComponents(df, "emb", k = 2, iters = 12, memo = false)
    val c1 = m.components(0)
    val alignment = math.abs((c1(0) + c1(1)) / math.sqrt(2))
    assert(alignment > 0.99, s"PC1 misaligned: ${c1.toSeq}")
    assert(m.eigenvalues(0) > 8.0 && m.eigenvalues(1) < 0.1,
      s"eigenvalues ${m.eigenvalues.toSeq}")
    // orthonormal output even before convergence arguments
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(c1, c1) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(1), m.components(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(c1, m.components(1))) < 1e-9)
    // decimal-exact sums: repartitioning must not change a single bit
    val m2 = graft.ops.Pca.topComponents(df.repartition(13), "emb",
      k = 2, iters = 12, memo = false)
    assert(m.components.flatten.toSeq == m2.components.flatten.toSeq &&
      m.eigenvalues.toSeq == m2.eigenvalues.toSeq,
      "partitioning changed the fit")
  }

  test("removeTopComponents kills the planted direction, preserves the rest") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val s = if (i % 2 == 0) 3.0 else -3.0
      val base = Array.fill(8)(rnd.nextGaussian() * 0.1)
      base(0) += s / math.sqrt(2); base(1) += s / math.sqrt(2)
      (i.toLong, base.map(_.toFloat))
    }
    val df = rows.toDF("id", "emb")
    val m = graft.ops.Pca.topComponents(df, "emb", k = 1, iters = 12, memo = false)
    val cleaned = graft.ops.Pca.removeTopComponents(df, "emb", "x", m)
      .select($"id", $"x")
    val s1 = graft.ops.Similarity.dotHof($"x", typedLit(m.components(0).toSeq))
    val (vAfter, maxResid) = cleaned.agg(
        (sum(s1 * s1) / (count(lit(1)) - 1)).as("v"),
        max(abs(element_at($"x", 8))).as("m")) // dim 7 untouched by the plant
      .as[(Double, Double)].head()
    assert(vAfter < 1e-6 * m.eigenvalues(0),
      s"variance along PC1 must collapse: $vAfter vs ${m.eigenvalues(0)}")
    // the orthogonal complement survives: dim 7 still carries its noise
    assert(maxResid > 0.05, s"projection must not flatten other dims: $maxResid")
    // output arrays are centered: the per-dim mean of x' is ~0
    val meanResid = cleaned
      .select(posexplode($"x").as(Seq("dim", "v")))
      .groupBy($"dim").agg(avg($"v").as("m"))
      .agg(max(abs($"m"))).as[Double].head()
    assert(meanResid < 1e-9, s"x' must be centered: $meanResid")
  }

  test("exactKPerGroup: exact sizes, rerun-stable, seed-sensitive") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val got = graft.ops.Sampling.exactKPerGroup(df, "g", "id", k = 10, seed = "s1")
    val sizes = got.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 10L), sizes.toString)
    assert(got.agg(max($"sample_rank")).as[Int].head() == 10)
    // a group smaller than k passes through whole
    val small = graft.ops.Sampling.exactKPerGroup(
      df.where($"id" <= 5), "g", "id", k = 10, seed = "s1")
    assert(small.count() == 5)
    // deterministic under repartitioning; different under a new seed
    val again = graft.ops.Sampling.exactKPerGroup(
      df.repartition(7), "g", "id", k = 10, seed = "s1")
    assert(got.select($"id").exceptAll(again.select($"id")).isEmpty)
    val other = graft.ops.Sampling.exactKPerGroup(df, "g", "id", 10, "s2")
    assert(other.select($"id").exceptAll(got.select($"id")).count() > 0)
  }

  test("containmentPairs: finds the excerpt Jaccard misses; boilerplate capped") {
    val w = (0 until 64).map(i => f"tok$i%02d")
    val docs = Seq(
      (1L, w.mkString(" ")),              // 8 tiles
      (2L, w.take(16).mkString(" ")),     // excerpt: 2 tiles, both in doc 1
      (3L, w.reverse.mkString(" "))       // same vocab, different tiles
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.containmentPairs(docs, "doc_id", "text",
        k = 8, minFrac = 0.8)
      .select($"inner_doc", $"outer_doc", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((2L, 1L, 1.0)), got.toString)
    // the symmetric Jaccard on the same pair is far below any threshold
    // (2 shared tiles over 8+2-2 distinct): containment is the only
    // signal that catches the excerpt
    // boilerplate cap: a tile in > maxDf docs generates no candidates
    val boiler = (1L to 20L).map(i => (i, "same eight tokens repeated here x y z"))
      .toDF("doc_id", "text")
    val none = graft.ops.Dedup.containmentPairs(boiler, "doc_id", "text",
      k = 8, minFrac = 0.8, maxDf = 10)
    assert(none.isEmpty, "df-capped boilerplate must emit no pairs")
  }

  test("cohenKappa: perfect, degenerate, and known mixed agreement") {
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(Classify.cohenKappa(perfect, "a", "b")
      .select($"kappa").as[Double].head() == 1.0)
    // both annotators constant and equal: pe = 1 -> kappa defined as 0
    val degen = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Classify.cohenKappa(degen, "a", "b")
      .select($"kappa").as[Double].head() == 0.0)
    // hand-computed: n=4, agree=1 (po=.25); marginals a:{x:2,y:2}
    // b:{x:3,y:1}; pe = (2*3 + 2*1)/16 = .5 -> kappa = -.25/.5 = -0.5
    val mixed = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "x"))
      .toDF("a", "b")
    val r = Classify.cohenKappa(mixed, "a", "b").collect().head
    assert(r.getAs[Double]("po") == 0.25 &&
      r.getAs[Double]("pe") == 0.5 && r.getAs[Double]("kappa") == -0.5,
      r.toString)
  }
}
