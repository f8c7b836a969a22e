package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.pipeline.{AdmittedDoc, BudgetAdmission, DocArrival}

/** Streaming token-budget admission: single-batch parity with the batch
  * sampler, cross-batch budget state, prefix (no skip-and-fill)
  * semantics, per-source independence. */
class BudgetAdmissionSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val budget = 300L

  test("whole corpus in one batch reproduces the batch sampler exactly") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val input = MemoryStream[DocArrival]
    val q = BudgetAdmission.admitted(input.toDS(), budget)
      .writeStream.format("memory").queryName("ba_parity")
      .outputMode("append").start()
    try {
      input.addData(
        BudgetAdmission.arrivals(docs, "doc_id", "text", "source", "spec")
          .collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ba_parity").as[AdmittedDoc]
        .collect().map(a => (a.source, a.doc_id, a.n_tok, a.cum_tok)).toSet
      val batch = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
          budget, seed = "spec")
        .select($"source", $"doc_id", $"n_tok", $"cum_tok")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == batch, "one-batch streaming admission ≡ batch sampler")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("arrivals drops NULL-text rows instead of poisoning the primitive encoder") {
    val df = Seq((1L, Option("a b"), "s"), (2L, Option.empty[String], "s"))
      .toDF("doc_id", "text", "source")
    val a = BudgetAdmission.arrivals(df, "doc_id", "text", "source", "x").collect()
    assert(a.map(_.doc_id).toSeq == Seq(1L) && a.head.n_tok == 2L)
  }

  test("budget state survives micro-batches; prefix closes the source") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocArrival]
    val q = BudgetAdmission.admitted(input.toDS(), 100L)
      .writeStream.format("memory").queryName("ba_state")
      .outputMode("append").start()
    try {
      // batch 1: 60 tokens admitted
      input.addData(DocArrival(1L, "a", 60L, 10L))
      q.processAllAvailable()
      // batch 2: 30 fits (cum 90); the 20 that follows overflows (110) —
      // and the later 5 must NOT skip-and-fill (prefix clock at 115)
      input.addData(DocArrival(2L, "a", 30L, 5L), DocArrival(3L, "a", 20L, 7L),
        DocArrival(4L, "a", 5L, 9L))
      q.processAllAvailable()
      val got = spark.table("ba_state").as[AdmittedDoc].collect()
        .sortBy(_.cum_tok).map(a => (a.doc_id, a.cum_tok)).toSeq
      // within batch 2 the ord order is doc2(5) < doc3(7) < doc4(9):
      // doc2 admits at 90, doc3 overflows to 110, doc4's prefix clock is
      // 115 — rejected even though 90+5 would fit
      assert(got == Seq((1L, 60L), (2L, 90L)), s"got $got")

      // batch 3: source exhausted — nothing further admits
      input.addData(DocArrival(5L, "a", 1L, 1L))
      q.processAllAvailable()
      assert(spark.table("ba_state").count() == 2)

      // independent source: fresh budget
      input.addData(DocArrival(6L, "b", 99L, 1L))
      q.processAllAvailable()
      val b = spark.table("ba_state").as[AdmittedDoc].collect()
        .filter(_.source == "b").toSeq
      assert(b.map(a => (a.doc_id, a.cum_tok)) == Seq((6L, 99L)))
    } finally q.stop()
  }

  test("within one micro-batch, admission follows the seeded ord, not arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocArrival]
    val q = BudgetAdmission.admitted(input.toDS(), 50L)
      .writeStream.format("memory").queryName("ba_order")
      .outputMode("append").start()
    try {
      // arrival order 7,8 but ord order 8 (ord=1) before 7 (ord=2):
      // doc8 admits (40), doc7 overflows (80)
      input.addData(DocArrival(7L, "a", 40L, 2L), DocArrival(8L, "a", 40L, 1L))
      q.processAllAvailable()
      val got = spark.table("ba_order").as[AdmittedDoc].collect().toSeq
      assert(got.map(_.doc_id) == Seq(8L), s"got $got")
    } finally q.stop()
  }
}
