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

  test("temperature mixing admits identically against batch-published rates") {
    // deployment shape: a batch job computes the corpus rates; the live
    // stream joins the (static, broadcast) rate table and admits with
    // the same in-plan hash threshold — stream-static join, stateless
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang")
    val dir = tmpDir("tempmixstream")
    docs.repartition(5, pmod($"doc_id", lit(5L)))
      .write.mode("overwrite").parquet(s"$dir/in")

    val rates = graft.ops.Sampling.temperatureRates(docs, "lang",
      alpha = 0.5, targetFraction = 0.5)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = graft.ops.Sampling.admitAtRates(stream, "doc_id", "lang",
        rates, seed = "sm")
      .writeStream.format("memory").queryName("tmix_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val viaStream = spark.table("tmix_stream")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val viaBatch = graft.ops.Sampling.temperatureMix(docs, "doc_id", "lang",
        alpha = 0.5, targetFraction = 0.5, seed = "sm")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(viaStream == viaBatch,
      "stream-admitted set must equal the batch-admitted set")
    assert(viaStream.nonEmpty && viaStream.size < 500,
      "the mix must actually thin the corpus for the parity to mean anything")
  }
}
