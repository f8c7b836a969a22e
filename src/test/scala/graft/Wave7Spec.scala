package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{Classify, Dedup, Funnel, Kmeans, Ranking, Sampling, Similarity}
import graft.pipeline.ReservoirStream

/** Seventh-wave operators: weighted re-vote (a reliable annotator
  * overturns a 2-vote majority), attribution (bookend models, no-touch
  * conversions, same-timestamp ties), k-means margins (separated vs
  * boundary points), and the streaming reservoir (exact batch parity,
  * idempotent replay). */
class Wave7Spec extends SparkSuite {
  import spark.implicits._

  // ---- weighted re-vote -------------------------------------------------

  test("weightedVoteReport: a reliable annotator overturns a 2-1 majority") {
    // a and b are 50%-ish annotators, c is near-perfect: on units 21-22
    // the majority (y,y vs x) flips to c's x under log-odds weights
    val rows =
      (1L to 10L).map(u => (u, "x", "y", "x")) ++   // majority x; b wrong
      (11L to 20L).map(u => (u, "y", "x", "x")) ++  // majority x; a wrong
      (21L to 22L).map(u => (u, "y", "y", "x"))     // majority y; c wrong
    val got = Classify.weightedVoteReport(rows.toDF("unit", "a", "b", "c"),
        "unit", Seq("a", "b", "c"))
      .select($"label", $"n_majority", $"n_weighted", $"n_gained")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // weights: a=b=ln(13/11)≈0.17, c=ln(21/3)≈1.95 -> c outvotes a+b
    assert(got == Seq(("x", 20L, 22L, 2L), ("y", 2L, 0L, 0L)), got.toString)
  }

  test("weightedVoteReport: unanimous corpus is a fixed point") {
    val rows = (1L to 6L).map(u => (u, "p", "p", "p"))
    val got = Classify.weightedVoteReport(rows.toDF("unit", "a", "b", "c"),
        "unit", Seq("a", "b", "c"))
      .select($"label", $"n_majority", $"n_weighted", $"n_gained")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("p", 6L, 6L, 0L)), got.toString)
  }

  // ---- attribution ------------------------------------------------------

  test("attribution: bookend credit, no-touch conversions, same-ts ties") {
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def t(s: Int) = new Timestamp(t0.getTime + s * 1000L)
    val events = Seq(
      // u1: view -> click -> purchase: first=view, last=click
      (1L, 1L, t(0), "view"), (2L, 1L, t(1), "click"), (3L, 1L, t(2), "purchase"),
      // u2: bare purchase -> (none)
      (4L, 2L, t(0), "purchase"),
      // u3: click -> purchase -> view -> purchase
      (5L, 3L, t(0), "click"), (6L, 3L, t(1), "purchase"),
      (7L, 3L, t(2), "view"), (8L, 3L, t(3), "purchase"),
      // u4: view and purchase at the SAME ts; event_id orders view first
      (9L, 4L, t(0), "view"), (10L, 4L, t(0), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.attribution(events, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("view", "click", "signup"))
      .select($"touch_type", $"n_first", $"n_last")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("(none)", 1L, 1L), ("click", 2L, 2L),
      ("view", 2L, 2L)), got.toString)
  }

  // ---- k-means margins --------------------------------------------------

  test("marginReport: separated points are confident, a midpoint is ambiguous") {
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)),
      (3L, Seq(10.0, 10.0)), (4L, Seq(10.1, 10.0))).toDF("id", "emb")
    val m = Kmeans.fit(vecs, "emb", "id", k = 2, iters = 4, memo = false)
    val withMid = vecs.unionByName(
      Seq((5L, Seq(5.025, 5.0))).toDF("id", "emb")) // near-equidistant
    val rep = Kmeans.marginReport(withMid, "emb", m, ambThreshold = 1.0)
      .select($"cluster", $"n_members", $"n_ambiguous")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rep.map(_._2).sum == 5L, rep.toString)
    assert(rep.map(_._3).sum == 1L,
      s"exactly the midpoint is ambiguous: $rep")
  }

  // ---- multi-probe LSH / ranked retrieval eval --------------------------

  test("knnLshMultiProbe recall dominates single-probe at the same hash bits") {
    val e = Similarity.prepared(
      Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding")
    val qs = e.where($"id" < 30)
    val bf = Similarity.knnBruteForce(qs, e, k = 5)
      .select($"query_id", $"neighbor_id")
    def recall(c: org.apache.spark.sql.DataFrame): Double = {
      val hit = bf.join(c.select($"query_id", $"neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      hit.toDouble / bf.count()
    }
    val single = recall(Similarity.knnLsh(qs, e, k = 5, h = 8))
    val multi = recall(Similarity.knnLshMultiProbe(qs, e, k = 5, h = 8))
    // probe expansion is a superset of the single bucket's candidates
    assert(multi >= single, s"multi $multi < single $single")
    assert(multi > 0.0)
  }

  test("retrievalEvalRanked over the brute-force ranking equals retrievalEval") {
    val e = Similarity.prepared(
      Tables.embeddings(spark, "/root/testdata/sf0.001")
        .where($"vec_id" < 100), "vec_id", "embedding")
    val labels = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where($"vec_id" < 100).select($"vec_id".as("id"), $"label")
    val direct = Ranking.retrievalEval(e, labels, k = 5).collect().toSet
    val viaRanked = Ranking.retrievalEvalRanked(
      Similarity.knnBruteForce(e, e, k = 5), labels, k = 5).collect().toSet
    assert(direct == viaRanked)
  }

  // ---- curriculum order -------------------------------------------------

  test("curriculumOrder: every prefix tracks the weights within one stride") {
    // 300 docs, 2:1 weights -> any prefix of length 3k holds ~2k a / ~k b
    val docs = (1L to 300L).map(i =>
      (i, if (i <= 200) "a" else "b")).toDF("id", "grp")
    val sched = Sampling.curriculumOrder(docs, "grp", "id",
        Map("a" -> 2.0, "b" -> 1.0), seed = "c1")
      .select($"group").as[String].collect()
    for (k <- Seq(30, 90, 150, 300)) {
      val nA = sched.take(k).count(_ == "a")
      val expected = k * 2 / 3
      assert(math.abs(nA - expected) <= 2,
        s"prefix $k: $nA a's vs ~$expected")
    }
  }

  test("curriculumOrder: deterministic under repartitioning, exhaustive") {
    // caller-side column names deliberately differ from the operator's
    // internal id/group names (a rename-shadowing regression hid here)
    val docs = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "x" else "y")).toDF("d_key", "category")
    val w = Map("x" -> 1.0, "y" -> 3.0)
    val a = Sampling.curriculumOrder(docs, "category", "d_key", w, "c2")
      .select($"id", $"vt").as[(Long, Double)].collect().toSeq
    val b = Sampling.curriculumOrder(docs.repartition(7), "category", "d_key", w, "c2")
      .select($"id", $"vt").as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1).sorted == (1L to 60L), "schedule covers every doc once")
  }

  test("curriculumOrder: a group without a weight fails fast") {
    val docs = Seq((1L, "a"), (2L, "zz")).toDF("id", "grp")
    val ex = intercept[Exception] {
      Sampling.curriculumOrder(docs, "grp", "id", Map("a" -> 1.0), "c3")
        .collect()
    }
    assert(ex.getMessage.contains("no weight") ||
      ex.getCause != null, ex.getMessage)
  }

  // ---- duplication hubs -------------------------------------------------

  test("duplicationHubs: planted template family surfaces as the hub set") {
    val tmpl = "one two three four five six seven eight"
    val docs = ((1L to 6L).map(i => (i, s"$tmpl uniq${i}a uniq${i}b uniq${i}c")) ++
      (7L to 9L).map(i => (i, s"plain${i}a plain${i}b plain${i}c plain${i}d")))
      .toDF("doc_id", "text")
    val got = Dedup.duplicationHubs(docs, "doc_id", "text", k = 4,
        maxDf = 64, minShared = 2, topK = 10, tileKey = c => md5(c))
      .select($"doc_id", $"n_partners", $"max_shared")
      .as[(Long, Long, Long)].collect().toSeq
    // docs 1-6 share the 2 template tiles (tiles are 4 tokens, k=4):
    // each has 5 partners at n_shared=2; plain docs never appear
    assert(got.map(_._1).toSet == (1L to 6L).toSet, got.toString)
    assert(got.forall(r => r._2 == 5L && r._3 == 2L), got.toString)
  }

  // ---- streaming reservoir ----------------------------------------------

  private def runReservoir(k: Int, seed: String,
                           batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val cands = ReservoirStream.candidates(
      input.toDF().toDF("grp", "id"), "grp", "id", seed)
    val name = s"reservoir_${seed}_${System.nanoTime()}"
    val q = ReservoirStream.sample(cands, k).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
      .select($"group", $"id", $"hk", $"sample_rank")
      .as[(String, Long, Long, Int)].collect().toSeq
  }

  test("streaming reservoir converges to the batch exactKPerGroup sample") {
    val all = (1L to 40L).map(i => (if (i % 2 == 0) "g1" else "g2", i))
    // arrival order scrambled across 3 batches
    val shuffled = all.sortBy(_._2 * 2654435761L % 97)
    val batches = shuffled.grouped(14).toSeq
    val log = runReservoir(k = 5, seed = "rs1", batches)
    // the hash at a fixed (group, rank) only ever improves; the final
    // sample is the min-hk row per (group, rank)
    val finalSample = log.groupBy(r => (r._1, r._4)).map { case (_, rows) =>
      rows.minBy(_._3)
    }.map(r => (r._1, r._2, r._4)).toSet
    val batchSample = Sampling.exactKPerGroup(
        all.toDF("grp", "id"), "grp", "id", k = 5, seed = "rs1")
      .select($"grp", $"id", $"sample_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(finalSample == batchSample,
      s"stream $finalSample\nbatch $batchSample")
  }

  test("streaming reservoir: replayed events emit nothing (idempotent)") {
    val batch = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L))
    val log = runReservoir(k = 2, seed = "rs2", Seq(batch, batch))
    // batch 2 is a pure replay: the reservoir is unchanged, no emission
    val perEmission = log.size
    val expectFirst = 2 // k = 2 rows emitted once
    assert(perEmission == expectFirst, s"expected one emission of $expectFirst rows, got $log")
  }
}
