package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Pins the persisted near-dup cluster store ([[Dedup.clustersPersisted]]):
  * derive-once/publish semantics, bit-identical loads, and loud
  * staleness re-derivation — the contract that lets the whole q43/q185/
  * q191–q193 family share one derivation per corpus (VERDICT r9 item 1).
  */
class ClusterStoreSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "component_id").as[(Long, Long)].collect().toSet

  test("clustersPersisted: cold derive+publish, warm load, identical rows") {
    val path = tmpDir("clstore") + "/clusters"
    val docs = Tables.documents(spark, sf)
    val direct = rows(Dedup.connectedComponents(
      Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", n = 3,
        threshold = 0.5).select(col("doc_a"), col("doc_b"))))

    val c0 = Dedup.clusterComputeCount.get()
    val cold = rows(Dedup.clustersPersisted(docs, "doc_id", "text", path))
    assert(Dedup.clusterComputeCount.get() == c0 + 1, "cold path must derive")
    assert(new java.io.File(s"$path/clusters").exists(), "data not published")
    assert(new java.io.File(s"$path/meta").exists(), "meta not published")
    assert(cold == direct, "published table diverges from direct derivation")

    // warm path: same corpus + params → pure parquet load, zero derivation
    val warm = rows(Dedup.clustersPersisted(docs, "doc_id", "text", path))
    assert(Dedup.clusterComputeCount.get() == c0 + 1,
      "warm hit re-ran the pair machinery")
    assert(warm == cold)

    // a FRESH session (new session state, same published files) also
    // loads rather than deriving — the store outlives the session
    val s2 = spark.newSession()
    val warm2 = Dedup.clustersPersisted(
      Tables.documents(s2, sf), "doc_id", "text", path)
      .select("doc_id", "component_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Dedup.clusterComputeCount.get() == c0 + 1)
    assert(warm2 == cold)
  }

  test("clustersPersisted: parameter and corpus staleness re-derive loudly") {
    val dir = tmpDir("clstale")
    val path = s"$dir/clusters"
    val docs = Tables.documents(spark, sf)
    Dedup.clustersPersisted(docs, "doc_id", "text", path).count()

    // different threshold → meta mismatch → re-derivation (NOT a silent
    // serve of the 0.5-threshold table)
    val c0 = Dedup.clusterComputeCount.get()
    val strict = rows(Dedup.clustersPersisted(docs, "doc_id", "text", path,
      threshold = 0.9))
    assert(Dedup.clusterComputeCount.get() == c0 + 1,
      "threshold change served the stale store")
    val loose = rows(Dedup.clustersPersisted(docs, "doc_id", "text", path,
      threshold = 0.5))
    assert(strict.size <= loose.size,
      s"0.9-threshold clustered rows (${strict.size}) exceed 0.5's (${loose.size})")

    // same PATH, same params, different FILES behind an identical plan
    // (corpus rewritten in place) → corpus_fp mismatch → re-derivation
    val corpus = s"$dir/docs.parquet"
    def write(tag: String): Unit =
      docs.limit(40).withColumn("text", concat(col("text"), lit(tag)))
        .write.mode("overwrite").parquet(corpus)
    write(" alpha")
    val p2 = s"$dir/clusters2"
    Dedup.clustersPersisted(spark.read.parquet(corpus), "doc_id", "text", p2).count()
    val c1 = Dedup.clusterComputeCount.get()
    write(" beta beta")
    Dedup.clustersPersisted(spark.read.parquet(corpus), "doc_id", "text", p2).count()
    assert(Dedup.clusterComputeCount.get() == c1 + 1,
      "rewritten corpus files served the stale store")
  }
}
