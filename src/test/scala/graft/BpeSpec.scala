package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE training as distributed aggregation: hand-checkable merge order,
  * greedy-overlap fold semantics, encode round-trip, determinism. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learns the hand-computed merge order on a tiny corpus") {
    // "low low low lower" — pair counts over chars + </w>:
    // (l,o) 4, (o,w) 4, (w,</w>) 3, (w,e) 1, (e,r) 1, (r,</w>) 1
    val df = Seq("low low low lower").toDF("text")
    val m = Bpe.train(df, "text", nMerges = 3, minCount = 1)
    val got = m.merges.map(x => (x.left, x.right, x.count))
    // ties (4,4) break lexicographically: (l,o) before (o,w); after
    // "lo" merges, (lo,w) has count 4 and beats (w,</w>)'s 3
    assert(got == Seq(("l", "o", 4L), ("lo", "w", 4L), ("low", "</w>", 3L)),
      s"got $got")
  }

  test("greedy left-to-right overlap: aaa merges to (aa, a)") {
    val df = Seq("aaa aaa").toDF("text")
    val m = Bpe.train(df, "text", nMerges = 1, minCount = 1)
    assert(m.merges.head.left == "a" && m.merges.head.right == "a")
    val enc = Bpe.encode(df, "text", m)
      .select(explode($"bpe_tokens").as("t")).as[String].collect().toSeq
    // each "aaa" -> aa, a, </w> (the fold must not re-merge the fresh
    // "aa" with the trailing "a" -- that pair is (aa,a), never learned)
    assert(enc == Seq("aa", "a", "</w>", "aa", "a", "</w>"), s"got $enc")
  }

  test("encode round-trips: concatenated tokens reconstruct each word") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val model = Bpe.train(docs, "text", nMerges = 40)
    assert(model.merges.size == 40, s"expected 40 merges, got ${model.merges.size}")
    val enc = Bpe.encode(docs.limit(50), "text", model)
    val bad = enc.select($"text",
        concat_ws(" ",
          transform(split(col("text"), " "), w => concat(w, lit(Bpe.EndOfWord))))
          .as("expect"),
        concat_ws("", $"bpe_tokens").as("joined"))
      .where(regexp_replace($"joined", lit("</w>"), lit("</w> ")) =!=
        concat($"expect", lit(" ")))
      .count()
    assert(bad == 0, "BPE tokens must concatenate back to the original words")
    // merges actually fire: token count strictly below character count
    val counts = enc.select(
      sum(size($"bpe_tokens")).as("toks"),
      sum(length(regexp_replace($"text", " ", "")) + size(split($"text", " ")))
        .as("chars")).head()
    assert(counts.getLong(0) < counts.getLong(1),
      "encoding with 40 merges must compress below character count")
  }

  test("native bpe_encode expression is bit-identical to the ScalaUDF reference") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val model = Bpe.train(docs, "text", nMerges = 40)
    val native = Bpe.encode(docs, "text", model)
      .select($"doc_id", $"bpe_tokens").orderBy($"doc_id").collect().toSeq
    val viaUdf = Bpe.encodeUdf(docs, "text", model)
      .select($"doc_id", $"bpe_tokens").orderBy($"doc_id").collect().toSeq
    assert(native == viaUdf)
    // edge rows the corpus doesn't cover: null text, empty text, repeated
    // spaces (empty words degenerate to a bare </w> symbol)
    val edges = Seq((0L, null), (1L, ""), (2L, "a  b")).toDF("doc_id", "text")
    val en = Bpe.encode(edges, "text", model)
      .select($"doc_id", $"bpe_tokens").orderBy($"doc_id").collect().toSeq
    val eu = Bpe.encodeUdf(edges, "text", model)
      .select($"doc_id", $"bpe_tokens").orderBy($"doc_id").collect().toSeq
    assert(en == eu)
  }

  test("training is deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.train(docs, "text", nMerges = 20).merges
    val b = Bpe.train(docs.repartition(13), "text", nMerges = 20).merges
    assert(a == b, "merge list must be identical regardless of partitioning")
  }

  test("early stop: no pair above minCount ends training cleanly") {
    val df = Seq("ab cd").toDF("text")
    val m = Bpe.train(df, "text", nMerges = 100, minCount = 5)
    assert(m.merges.isEmpty)
  }
}
