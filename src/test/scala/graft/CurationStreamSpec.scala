package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.pipeline.CurationStream
import graft.pipeline.CurationStream.CurationConfig

/** Streaming curation: scrub-before-dedup, watermark-bounded exact dedup
  * across micro-batches, and quality routing from one scan. */
class CurationStreamSpec extends SparkSuite {
  import spark.implicits._

  private val goodText =
    ("the quick brown fox jumps over lazy dogs near riverbank " * 8).trim
  private def ts(sec: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")

  test("dedups scrubbed content across batches and routes by quality") {
    implicit val sqlCtx = spark.sqlContext
    val clean = tmpDir("cur-clean")
    val rejected = tmpDir("cur-rej")
    val cp = tmpDir("cur-cp")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val cfg = CurationConfig(minQuality = 0.6,
      scrubRules = Seq("[0-9]+" -> "#"), watermark = "10 minutes")
    // batch 1: a good doc, a scrub-equal twin (differs only in digits),
    // and a low-quality short doc (data added BEFORE start: AvailableNow
    // snapshots the available offsets when the query starts)
    input.addData(
      (1L, goodText + " 111", ts(1)),
      (2L, goodText + " 999", ts(2)), // scrubs to the same text as doc 1
      (3L, "too short", ts(3)))
    val q = CurationStream.start(spark, df, cfg, clean, rejected, cp,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      q.awaitTermination()
      val clean1 = spark.read.parquet(clean)
      assert(clean1.count() == 1, "scrub-equal twin must deduplicate")
      assert(clean1.select("doc_id").as[Long].head() == 1L) // first arrival wins
      assert(clean1.select("text").as[String].head().endsWith(" #"))
      val rej1 = spark.read.parquet(rejected)
      assert(rej1.select("doc_id").as[Long].collect().toSeq == Seq(3L))
      assert(rej1.schema.fieldNames.contains("quality")) // audit trail kept
    } finally q.stop()

    // batch 2 on a RESTARTED query (same checkpoint): the dedup state
    // survives the restart, so a cross-batch duplicate is still dropped
    input.addData(
      (4L, goodText + " 42", ts(20)), // still a duplicate of doc 1 post-scrub
      (5L, goodText + " fresh words entirely", ts(21)))
    val q2 = CurationStream.start(spark, df, cfg, clean, rejected, cp,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      q2.awaitTermination()
      val cleanIds = spark.read.parquet(clean).select("doc_id").as[Long].collect().toSet
      assert(cleanIds == Set(1L, 5L), s"got $cleanIds")
    } finally q2.stop()
  }

  test("near-dup stage: cross-batch near-duplicate hits the audit sink, restart-safe") {
    implicit val sqlCtx = spark.sqlContext
    val clean = tmpDir("nd-clean")
    val audit = tmpDir("nd-audit")
    val store = tmpDir("nd-store")
    val cp = tmpDir("nd-cp")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val cfg = CurationStream.NearDupConfig()
    val base = "the quick brown fox jumps over the lazy dog while rain falls " +
      "softly on ancient rooftops and children play games under bright summer " +
      "skies every single afternoon without any worry at all"
    val other = "completely different content about spark execution engines and " +
      "distributed shuffle management across very large analytics clusters " +
      "running continuously in several regions with careful cost controls"
    // batch 1: two unrelated docs — both admitted, both enter the store
    input.addData((1L, base), (2L, other))
    val q = CurationStream.startNearDup(spark, df, cfg, clean, audit, store, cp)
    try q.awaitTermination() finally q.stop()
    assert(spark.read.parquet(clean).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L))
    assert(spark.read.schema(schema).parquet(audit).count() == 0)
    val store1 = spark.read.parquet(s"$store/delta")
    assert(store1.select("doc_id").distinct().as[Long].collect().toSet == Set(1L, 2L))
    assert(store1.count() == 2 * cfg.bands) // `bands` bucket rows per admitted doc

    // batch 2 on a RESTARTED query (same checkpoint): doc 3 is a near-dup
    // of doc 1 (one word changed), doc 4 is fresh — the store probe spans
    // the restart because the signature store, not streaming state,
    // carries the dedup horizon
    input.addData(
      (3L, base.replace("afternoon", "morning")),
      (4L, "another entirely fresh document mentioning gardens telescopes and " +
        "the gentle art of repairing old wooden furniture on quiet weekends"))
    val q2 = CurationStream.startNearDup(spark, df, cfg, clean, audit, store, cp)
    try q2.awaitTermination() finally q2.stop()
    assert(spark.read.parquet(clean).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 4L), "near-dup must not reach clean; batch 1 not reprocessed")
    assert(spark.read.schema(schema).parquet(audit).select("doc_id").as[Long]
      .collect().toSeq == Seq(3L))
    // audited docs never enter the store
    assert(spark.read.parquet(s"$store/delta").select("doc_id").distinct()
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
  }
}
