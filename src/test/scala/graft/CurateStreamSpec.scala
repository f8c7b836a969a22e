package graft

import org.apache.spark.sql.functions._
import graft.ops.Curate

/** The curation gates (PII redaction, Gopher rules) are pure map-side
  * column expressions, so they must compose with `readStream` unchanged
  * and produce BIT-IDENTICAL output to the batch path regardless of how
  * arrivals are sliced into micro-batches — the property that lets one
  * gate definition serve both the backfill job and the live stream (the
  * train-in-batch/serve-in-stream discipline CurationStream already
  * uses for the classifier). */
class CurateStreamSpec extends SparkSuite {
  import spark.implicits._

  test("redactPii + gopherGate through a file stream ≡ the batch path") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"source")
    val dir = tmpDir("curatestream")
    docs.repartition(5, pmod($"doc_id", lit(5L)))
      .write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = Curate.gopherGate(Curate.redactPii(stream, "text"),
        "doc_id", "clean_text")
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val viaStream = spark.table("curate_stream").orderBy($"doc_id").collect().toSeq
    val viaBatch = Curate.gopherGate(Curate.redactPii(docs, "text"),
        "doc_id", "clean_text")
      .orderBy($"doc_id").collect().toSeq
    assert(viaStream == viaBatch,
      "streamed gate output must be bit-identical to the batch path")
    assert(viaStream.size == 500)
  }
}
