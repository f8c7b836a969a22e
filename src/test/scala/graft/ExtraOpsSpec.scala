package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, Sketches}

/** Round-8 second-wave operators: CountMin sketch (one-sided error,
  * additivity, partitioning invariance), soft dedup (cap semantics,
  * determinism), cross-source duplication matrix (hand-computed fixture),
  * embedding whitening (output moments, invariance). */
class ExtraOpsSpec extends SparkSuite {
  import spark.implicits._

  private def tokens(rows: Seq[String]) = rows.toDF("token")

  test("countMin: estimate >= true count for every key, exact when wide") {
    val data = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(9)("gamma") ++ Seq.fill(1)("delta") ++
      (0 until 30).map(i => s"tail$i")
    val df = tokens(data)
    val truth = df.groupBy($"token").agg(count(lit(1)).as("true_cnt"))
    // tight sketch: one-sided error only
    val tight = Sketches.cmsEstimate(
      Sketches.countMinCounts(df, "token", 3, 8), truth, "token", 3, 8)
    assert(tight.where($"cms_cnt" < $"true_cnt").isEmpty,
      "CMS must never underestimate")
    // wide sketch: 34 distinct keys across 3x4096 cells — identical md5-row
    // collisions are astronomically unlikely, estimates are exact
    val wide = Sketches.cmsEstimate(
      Sketches.countMinCounts(df, "token", 3, 4096), truth, "token", 3, 4096)
    assert(wide.where($"cms_cnt" =!= $"true_cnt").isEmpty,
      "wide CMS should be exact on this fixture")
  }

  test("countMin: sketch state is additive and partitioning-invariant") {
    val a = tokens(Seq.fill(7)("x") ++ Seq.fill(3)("y"))
    val b = tokens(Seq.fill(5)("x") ++ Seq.fill(11)("z"))
    val merged = Sketches.countMinCounts(a.unionAll(b), "token", 2, 16)
    val summed = Sketches.countMinCounts(a, "token", 2, 16)
      .unionAll(Sketches.countMinCounts(b, "token", 2, 16))
      .groupBy($"r", $"bucket").agg(sum($"cnt").as("cnt"))
    assert(merged.exceptAll(summed).isEmpty && summed.exceptAll(merged).isEmpty,
      "sum of per-part sketches must equal the sketch of the union")
    val repart = Sketches.countMinCounts(
      a.unionAll(b).repartition(7), "token", 2, 16)
    assert(merged.exceptAll(repart).isEmpty && repart.exceptAll(merged).isEmpty,
      "sketch must not depend on partitioning")
  }

  test("softDedupCap: caps every content group, keeps rank order, deterministic") {
    val df = Seq(
      (1L, "same"), (2L, "same"), (3L, "same"), (4L, "same"),
      (10L, "only"), (20L, "pair"), (21L, "pair")).toDF("doc_id", "text")
    val out = Dedup.softDedupCap(df, "doc_id", "text", cap = 2, seed = "s")
    val byText = out.collect().groupBy(_.getString(1))
    assert(byText("same").length == 2 && byText("pair").length == 2 &&
      byText("only").length == 1)
    assert(out.where($"copy_rank" > 2).isEmpty)
    // cap=1 reduces to exact dedup survivors (one per content)
    val hard = Dedup.softDedupCap(df, "doc_id", "text", cap = 1, seed = "s")
    assert(hard.count() == 3)
    // deterministic under partitioning: same survivor set
    val again = Dedup.softDedupCap(df.repartition(5), "doc_id", "text",
      cap = 2, seed = "s")
    assert(out.select($"doc_id").exceptAll(again.select($"doc_id")).isEmpty)
    // a different seed may pick different survivors but the same counts
    val other = Dedup.softDedupCap(df, "doc_id", "text", cap = 2, seed = "t")
    assert(other.count() == out.count())
  }

  test("crossSourceDupMatrix: hand-computed pair counts") {
    val df = Seq(
      // "a": 2 copies in s1, 1 in s2 -> within s1: 1, s1-s2 cross: 2
      (1L, "a", "s1"), (2L, "a", "s1"), (3L, "a", "s2"),
      // "b": 1 copy each in s1, s3 -> s1-s3 cross: 1
      (4L, "b", "s1"), (5L, "b", "s3"),
      // "c": unique -> contributes nothing
      (6L, "c", "s2")).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("s1", "s1", 1L), ("s1", "s2", 2L), ("s1", "s3", 1L)),
      got.toString)
  }

  test("whitenDims: output dimensions have mean ~0 and sample std ~1") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(4)((rng.nextDouble() - 0.3) * (i % 3 + 1)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val z = Similarity.whitenDims(df, "vec_id", "embedding")
    val moments = z.groupBy($"dim").agg(
        avg($"z").as("m"),
        (sum($"z" * $"z") / (count(lit(1)) - 1)).as("v"))
      .collect()
    assert(moments.length == 4)
    moments.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-9, s"mean ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6, s"var ${r.getDouble(2)}")
    }
    // partitioning invariance: decimal-exact sums make z bit-stable
    val z2 = Similarity.whitenDims(df.repartition(13), "vec_id", "embedding")
    assert(z.exceptAll(z2).isEmpty && z2.exceptAll(z).isEmpty)
  }

  test("weightedSample: deterministic, weight-biased, plans a top-k not a sort") {
    val df = (1L to 300L).map(i => (i, if (i == 7L) 1e9 else 10.0))
      .toDF("doc_id", "w")
    val got = graft.ops.Sampling.weightedSample(df, "doc_id", "w", 20, "s")
    // a weight 8 orders of magnitude above the field is all but certain
    // to win one of 20 slots (P(miss) < 1e-7 per draw)
    assert(got.where($"doc_id" === 7L).count() == 1)
    val again = graft.ops.Sampling.weightedSample(
      df.repartition(11), "doc_id", "w", 20, "s")
    assert(got.select($"doc_id").exceptAll(again.select($"doc_id")).isEmpty,
      "sample must not depend on partitioning")
    // k >= n with positive weights returns everything; non-positive and
    // NULL weights are excluded
    val mixed = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0))
      .toDF("doc_id", "w")
      .unionByName(Seq((4L, Option.empty[Double])).toDF("doc_id", "w"))
    val all = graft.ops.Sampling.weightedSample(mixed, "doc_id", "w", 10, "s")
    assert(all.select($"doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // scale shape: global top-k must plan as TakeOrderedAndProject
    val plan = graft.ops.Sampling.weightedSample(df, "doc_id", "w", 20, "s")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("corpusDiff: classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B!"), (4L, "d")).toDF("doc_id", "text")
    val got = graft.ops.Curate.corpusDiff(v1, v2, "doc_id", "text")
      .select($"id", $"status").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")), got.toString)
  }

  test("tokenDrift: zero on identical corpora, positive and ranked on drift") {
    val v1 = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a a b f")).toDF("doc_id", "text")
    val same = graft.ops.Text.tokenDrift(v1, v1, "text")
    assert(same.where($"psi" =!= java.math.BigDecimal.ZERO).isEmpty,
      "identical corpora must show zero PSI everywhere")
    // v2 drops every 'a' and floods 'z': both ends must dominate the ranking
    val v2 = Seq((1L, "z b c d"), (2L, "z b c e"), (3L, "z z b f")).toDF("doc_id", "text")
    val drift = graft.ops.Text.tokenDrift(v1, v2, "text")
    assert(drift.where($"psi" < java.math.BigDecimal.ZERO).isEmpty,
      "PSI contributions are non-negative by construction")
    val top2 = drift.orderBy($"psi".desc, $"token")
      .limit(2).collect().map(_.getString(0)).toSet
    assert(top2 == Set("a", "z"), top2.toString)
    // partitioning invariance (decimal-rounded doubles)
    val again = graft.ops.Text.tokenDrift(
      v1.repartition(7), v2.repartition(5), "text")
    assert(drift.exceptAll(again).isEmpty && again.exceptAll(drift).isEmpty)
  }

  test("whitenDims: constant dimension yields NULL z, never Infinity") {
    val df = Seq((1L, Array(1.0, 5.0)), (2L, Array(2.0, 5.0)),
      (3L, Array(3.0, 5.0))).toDF("vec_id", "embedding")
    val z = Similarity.whitenDims(df, "vec_id", "embedding")
    assert(z.where($"dim" === 1 && $"z".isNotNull).isEmpty)
    assert(z.where($"dim" === 0 && $"z".isNull).isEmpty)
  }
}
