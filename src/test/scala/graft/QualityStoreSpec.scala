package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Classify

/** Pins the persisted quality-classifier score store
  * ([[Classify.qualityScoresPersisted]]) — the derive-once table behind
  * q79. Contract (the LM/pair-store contract): cold = train + score +
  * publish, warm = load without re-running gradient descent, loaded rows
  * IDENTICAL to a direct train+score (bit-exact training makes that an
  * equality, not a tolerance), and a hyperparameter change re-derives
  * loudly instead of serving the old model's scores. */
class QualityStoreSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("quality store: cold derive+publish, warm load, ≡ direct train+score") {
    val path = tmpDir("qualitystore") + "/quality"
    val docs = Tables.documents(spark, sf)
    // memo = false: force a REAL independent training run for the truth
    // side, so the equality check cannot be satisfied by both sides
    // reading the same memoized weights
    val direct = rows(
      Classify.qualityClassifier(docs, "doc_id", "text", memo = false))
    val c0 = Classify.qualityScoresComputeCount.get()
    val cold = rows(
      Classify.qualityScoresPersisted(docs, "doc_id", "text", path))
    assert(Classify.qualityScoresComputeCount.get() == c0 + 1,
      "cold path must derive")
    assert(cold == direct,
      "published quality scores diverge from direct train+score")
    val warm = rows(
      Classify.qualityScoresPersisted(docs, "doc_id", "text", path))
    assert(Classify.qualityScoresComputeCount.get() == c0 + 1,
      "warm hit re-ran training")
    assert(warm == cold)
  }

  test("quality store: hyperparameter change is staleness — re-derives") {
    val path = tmpDir("qualitystore2") + "/quality"
    val docs = Tables.documents(spark, sf)
    val c0 = Classify.qualityScoresComputeCount.get()
    val at30 = rows(
      Classify.qualityScoresPersisted(docs, "doc_id", "text", path))
    assert(Classify.qualityScoresComputeCount.get() == c0 + 1)
    val at5 = rows(Classify.qualityScoresPersisted(docs, "doc_id", "text",
      path, iters = 5))
    assert(Classify.qualityScoresComputeCount.get() == c0 + 2,
      "iters=5 against an iters=30 store must re-derive")
    assert(at5 != at30, "different iteration counts produced identical scores")
  }

  test("q79 through the store matches the in-session training path") {
    // the reroute contract: zero golden drift — the store-served q79
    // must be row-identical to scoring with freshly trained weights
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val fresh = Classify.qualityClassifier(docs, "doc_id", "text", memo = false)
      .select(col("doc_id"), col("label"),
        round(col("score"), 6).as("score"), col("predicted"))
      .orderBy(col("doc_id"))
    val served = SparkEntry.queries("q79_quality_classifier")(spark, sf)
    assert(rows(served) == rows(fresh),
      "store-served q79 drifted from the direct training path")
    assert(served.schema == fresh.schema,
      s"schema drift: ${served.schema} vs ${fresh.schema}")
  }
}
