package graft

import graft.ops.Dedup

/** Wave-36 operator guarantees: the asymmetric containment prefix
  * filter (q250's engine) is lossless against the reference posting
  * self-join, and containment actually catches the doc-inside-doc
  * shape symmetric Jaccard misses. */
class Wave33Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("inner_id", "outer_id", "containment")
      .as[(Long, Long, Double)].collect().toSet

  test("containment prefix filter ≡ direct posting join (lossless), 3 thresholds") {
    val docs = Tables.documents(spark, sf)
    for (t <- Seq(0.7, 0.9, 0.95)) {
      val prefix = rows(Dedup.containmentPairsPrefix(docs, "doc_id", "text", 3, t))
      val direct = rows(Dedup.containmentPairsDirect(docs, "doc_id", "text", 3, t))
      assert(prefix == direct, s"prefix filter lost/invented pairs at t=$t " +
        s"(prefix ${prefix.size} vs direct ${direct.size})")
      assert(prefix.nonEmpty || t > 0.9, s"fixture should have pairs at t=$t")
    }
  }

  test("containment store: cold derive+publish, warm load, ≡ routed derivation") {
    val path = tmpDir("containstore") + "/containment"
    val docs = Tables.documents(spark, sf)
    val direct = rows(Dedup.containmentPairsAuto(docs, "doc_id", "text",
      n = 3, threshold = 0.9))
    val c0 = Dedup.containmentComputeCount.get()
    val cold = rows(Dedup.containmentPersisted(docs, "doc_id", "text", path))
    assert(Dedup.containmentComputeCount.get() == c0 + 1, "cold path must derive")
    assert(cold == direct, "published containment diverges from routed derivation")
    val warm = rows(Dedup.containmentPersisted(docs, "doc_id", "text", path))
    assert(Dedup.containmentComputeCount.get() == c0 + 1,
      "warm hit re-ran the containment machinery")
    assert(warm == cold)
  }

  test("containment catches doc-swallowed-by-doc where Jaccard scores near zero") {
    val small = "alpha bridge carbon delta ember falcon granite harbor " +
      "ionic jasper kernel lattice"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val big = s"$filler $small $filler"
    val docs = Seq((1L, small), (2L, big), (3L, "entirely unrelated text " +
      "about rivers and mountains and weather and long quiet afternoons"))
      .toDF("doc_id", "text")
    val c = rows(Dedup.containmentPairsPrefix(docs, "doc_id", "text", 3, 0.9))
    assert(c.exists { case (a, b, s) => a == 1L && b == 2L && s >= 0.9 },
      s"small-inside-big pair not caught: $c")
    assert(!c.exists { case (a, b, _) => a == 3L || b == 3L },
      "unrelated doc must not pair")
    // the same pair is INVISIBLE to symmetric Jaccard at any usable θ
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(!j.exists { case (a, b, _) => Set(a, b) == Set(1L, 2L) },
      "premise broken: Jaccard already catches the containment pair")
  }
}
