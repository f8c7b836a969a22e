package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Text

/** Pins the persisted LM-score store ([[Text.lmScoresPersisted]]) — the
  * derive-once table behind q71/q92/q97/q98. Contract (the pair-store
  * contract): cold = derive + publish, warm = load without re-scoring,
  * loaded rows IDENTICAL to the direct unigram+bigram scoring passes,
  * and a parameter change (λ) re-derives loudly instead of serving the
  * old model's scores. */
class LmStoreSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("lm store: cold derive+publish, warm load, ≡ direct scoring") {
    val path = tmpDir("lmstore") + "/lmscores"
    val docs = Tables.documents(spark, sf)
    val direct = rows(Text.lmScores(docs, "doc_id", "text"))
    val c0 = Text.lmScoresComputeCount.get()
    val cold = rows(Text.lmScoresPersisted(docs, "doc_id", "text", path))
    assert(Text.lmScoresComputeCount.get() == c0 + 1, "cold path must derive")
    assert(cold == direct, "published LM scores diverge from direct scoring")
    val warm = rows(Text.lmScoresPersisted(docs, "doc_id", "text", path))
    assert(Text.lmScoresComputeCount.get() == c0 + 1,
      "warm hit re-ran the scoring passes")
    assert(warm == cold)
  }

  test("lm store: lambda change is staleness — re-derives, not serves") {
    val path = tmpDir("lmstore2") + "/lmscores"
    val docs = Tables.documents(spark, sf)
    val c0 = Text.lmScoresComputeCount.get()
    val at75 = rows(Text.lmScoresPersisted(docs, "doc_id", "text", path))
    assert(Text.lmScoresComputeCount.get() == c0 + 1)
    val at50 = rows(Text.lmScoresPersisted(docs, "doc_id", "text", path,
      lambda = 0.5))
    assert(Text.lmScoresComputeCount.get() == c0 + 2,
      "λ=0.5 against a λ=0.75 store must re-derive")
    assert(at50 != at75, "different λ produced identical score tables")
    assert(at50 == rows(Text.lmScores(docs, "doc_id", "text", lambda = 0.5)),
      "republished λ=0.5 store diverges from direct λ=0.5 scoring")
  }
}
