package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, Similarity, Text}

/** Round-7 curation operators: tile-level keep-first dedup (CCNet-style),
  * SemDeDup, DSIR importance weights, token-budget domain mixing. */
class TrainingDataOpsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------- tileDedupKeepFirst

  private val tileDocs = Seq(
    (0L, "a b c d e f g h i j"),        // tiles (k=4): "a b c d", "e f g h", "i j"
    (1L, "a b c d x y z w"),            // first tile duplicates doc 0's
    (2L, "i j"),                        // duplicates doc 0's trailing partial tile
    (3L, "p q r s p q r s")             // within-doc duplicate tile
  ).toDF("doc_id", "text")

  test("tileDedup keeps the corpus-wide first occurrence and rewrites later docs") {
    val out = Dedup.tileDedupKeepFirst(tileDocs, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byDoc(0L) == ((3L, 3L, "a b c d e f g h i j")),
      "the first doc keeps everything")
    assert(byDoc(1L) == ((2L, 1L, "x y z w")),
      "a tile seen earlier in the corpus is cut from later docs")
    assert(byDoc(2L) == ((1L, 0L, "")),
      "a doc made entirely of earlier tiles is rewritten to empty")
    assert(byDoc(3L) == ((2L, 1L, "p q r s")),
      "within-doc repeats keep only the first copy")
  }

  test("tileDedup: xxhash64 and md5 key routes agree; result is partitioning-invariant") {
    val viaHash = Dedup.tileDedupKeepFirst(tileDocs, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect().toSeq
    val viaMd5 = Dedup.tileDedupKeepFirst(tileDocs.repartition(7), "doc_id", "text",
        k = 4, tileKey = md5(_))
      .orderBy($"doc_id").collect().toSeq
    assert(viaHash == viaMd5)
  }

  test("tileDedup on a real corpus: token conservation and one-survivor-per-tile") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.tileDedupKeepFirst(docs, "doc_id", "text", k = 8)
    // every doc present, kept <= total, and the corpus-wide kept-tile
    // multiset has no duplicates (keep-first means one copy survives)
    assert(out.count() == docs.count())
    assert(out.where($"n_kept" > $"n_tiles").count() == 0)
    // keep-first means exactly one copy of every distinct tile survives:
    // Σ n_kept must equal the independently-recomputed distinct tile count
    val distinctTiles = docs.select($"doc_id", split($"text", " ").as("t"))
      .select($"t", explode(sequence(lit(0),
        ceil(size($"t") / lit(8.0)).cast("int") - 1)).as("i"))
      .select(concat_ws(" ", slice($"t", $"i" * 8 + 1, lit(8))).as("tile"))
      .distinct().count()
    assert(out.agg(sum($"n_kept")).head().getLong(0) == distinctTiles)
  }

  // ------------------------------------------------------- dsirWeights

  test("dsirWeights: docs made of target-domain tokens outscore raw-domain docs") {
    // target speaks 'aa bb', raw speaks 'zz yy'; mixed doc sits between
    val docs = Seq(
      (0L, "aa bb aa bb", "tgt"),
      (1L, "zz yy zz yy", "raw"),
      (2L, "aa bb zz yy", "raw")
    ).toDF("doc_id", "text", "dom")
    val w = Text.dsirWeights(docs, "doc_id", "text", $"dom" === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0L) > w(2L) && w(2L) > w(1L),
      s"expected target > mixed > raw, got $w")
    assert(w(1L) < 0 && w(0L) > 0,
      "pure-raw docs score negative, pure-target positive")
  }

  test("dsirWeights is partitioning-invariant (decimal-exact summation)") {
    val docs = Tables.documents(spark, sf)
    val a = Text.dsirWeights(docs, "doc_id", "text", $"source" === "src0")
      .orderBy($"doc_id").collect().toSeq
    val b = Text.dsirWeights(docs.repartition(13), "doc_id", "text", $"source" === "src0")
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  // ------------------------------------------- tokenBudgetSample

  test("tokenBudgetSample matches the naive single-window greedy prefix") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val budget = 300L
    val got = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
        budget, seed = "spec")
      .orderBy($"source", $"ord").collect().toSeq
    val naive = docs.select($"source", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tok"),
        graft.ops.Shard.orderKey($"doc_id", "spec").as("ord"))
      .withColumn("cum_tok", sum($"n_tok").over(
        Window.partitionBy($"source").orderBy($"ord", $"doc_id")))
      .where($"cum_tok" <= budget)
      .select($"source", $"doc_id", $"n_tok", $"cum_tok", $"ord")
      .orderBy($"source", $"ord").collect().toSeq
    assert(got == naive,
      "bucketed decomposition must reproduce the defining naive window rule")
    assert(got.nonEmpty && got.size < docs.count(),
      "budget should bind (some docs kept, some cut) for this fixture")
  }

  test("tokenBudgetSample: boundary lands mid-bucket and still cuts exactly at the budget") {
    // one group, ids chosen freely; every doc is 10 tokens so the kept
    // count is exactly budget/10 regardless of hash order
    val docs = (0L until 50L).map(i => (i, Seq.fill(10)("w").mkString(" "), "g"))
      .toDF("doc_id", "text", "src")
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "text", "src", 170L, "s2")
    assert(out.count() == 17)
    assert(out.agg(max($"cum_tok")).head().getLong(0) == 170L)
    assert(out.agg(sum($"n_tok")).head().getLong(0) == 170L)
  }

  // ---------------------------------------------------- bigramLogProb

  test("bigramLogProb: common transitions outscore rare ones; first token is unigram-scored") {
    // corpus stats: n(a)=n(b)=5, N=10; n(a b)=4, n(b a)=3 — so "a b"
    // must outscore "b a" (same unigrams, different transition)
    val docs = Seq((1L, "a b a b a b"), (2L, "a b"), (3L, "b a"))
      .toDF("doc_id", "text")
    val got = Text.bigramLogProb(docs, "doc_id", "text", lambda = 0.75)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(2L)._1 == 2 && got(3L)._1 == 2)
    assert(got(2L)._2 > got(3L)._2, s"expected p(a b) > p(b a): $got")
    // hand check doc 2: (ln(0.5) + ln(0.75*4/5 + 0.25*0.5)) / 2, 9dp-rounded terms
    val want2 = (BigDecimal(math.log(0.5)).setScale(9, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(math.log(0.75 * 4.0 / 5.0 + 0.25 * 0.5))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toDouble / 2
    assert(math.abs(got(2L)._2 - (math.rint(want2 * 1e6) / 1e6)) < 1e-9,
      s"got ${got(2L)._2}, want ~$want2")
  }

  test("bigramLogProb is partitioning-invariant on a real corpus") {
    val docs = Tables.documents(spark, sf)
    val a = Text.bigramLogProb(docs, "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    val b = Text.bigramLogProb(docs.repartition(11), "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  // --------------------------------------------------- upsampleEpochs

  test("upsampleEpochs: whole epochs complete, fractional epoch hash-gated, all deterministic") {
    val docs = Tables.documents(spark, sf).select($"doc_id")
    val n = docs.count()
    val up = Sampling.upsampleEpochs(docs, "doc_id", weight = 2.3)
    val byEpoch = up.groupBy($"epoch").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byEpoch(0) == n && byEpoch(1) == n, "whole epochs must be complete copies")
    assert(byEpoch(2) > 0 && byEpoch(2) < n, "fractional epoch must be a strict subset")
    // ~30% with a content hash; allow generous slack on a small corpus
    assert(math.abs(byEpoch(2).toDouble / n - 0.3) < 0.15, s"epoch-2 frac ${byEpoch(2)}/$n")
    // integer weight: exactly two copies, no epoch 2
    assert(Sampling.upsampleEpochs(docs, "doc_id", 2.0).count() == 2 * n)
    // membership is partitioning-invariant
    val x = up.orderBy($"doc_id", $"epoch").collect().toSeq
    val y = Sampling.upsampleEpochs(docs.repartition(9), "doc_id", 2.3)
      .orderBy($"doc_id", $"epoch").collect().toSeq
    assert(x == y)
  }

  // ------------------------------------------------------- semDedup

  test("semDedup drops the near-centroid member of every near-dup pair") {
    val prep = Similarity.prepared(
      Tables.embeddings(spark, "/root/testdata/sf0.01"), "vec_id", "embedding")
    val out = Similarity.semDedup(prep, nCells = 8, minCosine = 0.3).cache()
    try {
      val n = prep.count()
      assert(out.count() == n, "one row per input embedding")
      // dropped implies an in-cell near partner was found
      assert(out.where($"dropped" && $"n_near" === 0).count() == 0)
      // something survives, something is pruned at this threshold
      val dropped = out.where($"dropped").count()
      assert(dropped > 0 && dropped < n)
      // pair rule on a constructed fixture: two near-identical vectors in
      // the same cell — the one with the HIGHER centroid cosine is dropped
      val base = out.select($"id", $"cell", $"cent_cos", $"dropped")
        .orderBy($"id").collect()
      assert(base.forall(r => !r.isNullAt(2)), "cent_cos is total")
    } finally out.unpersist()
  }

  test("semDedup keep-rule: the prototypical (near-centroid) copy is the one dropped") {
    // cluster A around (1,0,...), cluster B around (0,1,...); a/b are
    // near-dups of each other inside cluster A, a sits nearer the
    // centroid (it IS the direction the other 6 points average to)
    val dim = 8
    def v(xs: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(dim)(0.0); xs.foreach { case (i, x) => a(i) = x }; a.toSeq
    }
    val rows =
      (0 until 6).map(i => (i.toLong, v(0 -> 1.0, 7 -> (0.01 * i)))) ++
        Seq((10L, v(0 -> 1.0, 1 -> 0.05)),        // 'a': aligned with centroid
          (11L, v(0 -> 1.0, 1 -> 0.30))) ++       // 'b': same dup group, off-axis
        (20 until 26).map(i => (i.toLong, v(1 -> 1.0, 6 -> (0.01 * (i - 20)))))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.semDedup(
        Similarity.prepared(df, "vec_id", "embedding"), nCells = 2, minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(4), r.getDouble(2))).toMap
    val (aDropped, aCos) = out(10L)
    val (bDropped, bCos) = out(11L)
    assert(aCos > bCos, "fixture: 'a' must sit nearer its centroid than 'b'")
    assert(aDropped, "the near-centroid member of the pair is dropped")
    assert(!bDropped || out.count { case (_, (d, _)) => d } > 1,
      "the outlier member survives its pair")
  }
}
