package graft

import org.apache.spark.sql.functions._
import graft.ops.Classify

/** Aggregation-only logistic regression: convergence, separation,
  * bit-determinism, and the train-on-sample/score-everything surface. */
class ClassifySpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("trainLogistic converges on a linearly separable fixture and separates it") {
    // y = 1 iff f1 > 0.5; bias + one informative + one noise feature
    val rows = (0 until 200).map { i =>
      val f1 = (i % 100) / 100.0
      val noise = ((i * 37) % 100) / 100.0
      (Array(1.0, f1, noise), if (f1 > 0.5) 1.0 else 0.0)
    }
    val df = rows.toDF("features", "label")
    val m = Classify.trainLogistic(df, "features", "label", nFeatures = 3,
      iters = 200, lr = 5.0)
    assert(m.nRows == 200)
    // convex objective, fixed lr: loss must improve substantially and
    // never blow up
    assert(m.losses.head > m.losses.last,
      s"loss did not improve: ${m.losses.head} -> ${m.losses.last}")
    assert(m.losses.last < 0.2, s"final loss too high: ${m.losses.last}")
    val scored = df.select($"label",
      Classify.score($"features", m).as("p"))
      .withColumn("pred", ($"p" >= 0.5).cast("double"))
    val acc = scored.where($"pred" === $"label").count() / 200.0
    assert(acc >= 0.97, s"separable fixture accuracy $acc")
  }

  test("training is bit-deterministic (decimal-exact gradient sums)") {
    val docs = Tables.documents(spark, sf)
    val feats = docs.select(
      Classify.qualityFeatures($"text").as("features"),
      Classify.seedQualityLabel($"text").as("label"))
    def weights() = Classify.trainLogistic(feats, "features", "label",
      iters = 10, lr = 2.0).weights.toSeq
    val a = weights(); val b = weights()
    assert(a == b, "two identical trainings must produce bit-identical weights")
  }

  test("qualityClassifier distills the seed rule: high agreement, scores in (0,1)") {
    val out = Classify.qualityClassifier(Tables.documents(spark, sf),
      "doc_id", "text", memo = false)
    val n = out.count()
    val agree = out.where($"predicted" === $"label").count()
    assert(agree.toDouble / n >= 0.9,
      s"classifier agrees with seed labels on only $agree/$n docs")
    // both classes must actually occur — a constant predictor can score
    // high agreement on a skewed corpus
    assert(out.where($"predicted" === 1.0).count() > 0)
    assert(out.where($"predicted" === 0.0).count() > 0)
    val bad = out.where($"score" <= 0.0 || $"score" >= 1.0 || $"score".isNull).count()
    assert(bad == 0, "scores must lie strictly inside (0,1)")
  }

  test("train-in-batch / serve-in-stream: streamed scores are bit-identical to batch scores") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.CurationStream
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val model = Classify.trainLogistic(
      docs.select(Classify.qualityFeatures($"text").as("features"),
        Classify.seedQualityLabel($"text").as("label")),
      "features", "label", iters = 10, lr = 2.0)
    val batchScores = docs.select($"doc_id",
      Classify.score(Classify.qualityFeatures($"text"), model).as("q"))

    val clean = tmpDir("tq-clean"); val rejected = tmpDir("tq-rej")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val rows = docs.as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")) }
    input.addData(rows: _*)
    val cfg = CurationStream.CurationConfig(minQuality = 0.5)
    val q = CurationStream.startTrained(spark,
      input.toDF().toDF("doc_id", "text", "ingest_ts"), model, cfg,
      clean, rejected, tmpDir("tq-cp"))
    try q.awaitTermination() finally q.stop()

    val streamed = spark.read.parquet(clean)
      .unionByName(spark.read.parquet(rejected))
      .select($"doc_id", $"quality")
    assert(streamed.count() == rows.size, "stream must route every doc")
    // bit-identical: same literal expression tree in both modes, so
    // strict double equality, not a tolerance
    val mismatched = streamed.join(batchScores, "doc_id")
      .where($"quality" =!= $"q").count()
    assert(mismatched == 0, s"$mismatched docs scored differently in-stream")
    val wrongSide = spark.read.parquet(clean).where($"quality" < 0.5).count() +
      spark.read.parquet(rejected).where($"quality" >= 0.5).count()
    assert(wrongSide == 0, "routing must follow the calibrated threshold")
  }

  test("scoring is a stateless projection: no shuffle below the score column") {
    // raw read, NOT Tables.documents: the no-Exchange assertion pins the
    // OPERATOR's shape; the loader's small-layout fan-out adds its own
    // documented exchange upstream
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = Classify.trainLogistic(
      docs.select(Classify.qualityFeatures($"text").as("features"),
        Classify.seedQualityLabel($"text").as("label")),
      "features", "label", iters = 2, lr = 1.0)
    val scored = docs.select($"doc_id",
      Classify.score(Classify.qualityFeatures($"text"), m).as("score"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must not shuffle — weights are plan literals:\n$plan")
  }
}
