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

  test("selectBatch keeps the greedy-equivalent prefix and stops on overlap") {
    def m(l: String, r: String, c: Long) = Bpe.Merge(0, l, r, c)
    // disjoint pairs all batch
    assert(Bpe.selectBatch(Seq(m("a", "b", 9), m("c", "d", 8), m("e", "f", 7)), 1)
      .map(x => (x.left, x.right)) == Seq(("a", "b"), ("c", "d"), ("e", "f")))
    // overlap STOPS the batch (later disjoint pairs must NOT be skipped
    // past it — their ranking vs the overlap's changed count is unknown)
    assert(Bpe.selectBatch(Seq(m("a", "b", 9), m("b", "c", 8), m("e", "f", 7)), 1)
      .map(x => (x.left, x.right)) == Seq(("a", "b")))
    // a pair containing a selected merge's OUTPUT string also stops it
    assert(Bpe.selectBatch(Seq(m("a", "b", 9), m("ab", "c", 8)), 1)
      .map(x => (x.left, x.right)) == Seq(("a", "b")))
    // minCount cuts the prefix
    assert(Bpe.selectBatch(Seq(m("a", "b", 9), m("c", "d", 1)), 2)
      .map(x => (x.left, x.right)) == Seq(("a", "b")))
    // self-pair: anything else touching the symbol stops after it
    assert(Bpe.selectBatch(Seq(m("a", "a", 9), m("a", "b", 8)), 1)
      .map(x => (x.left, x.right)) == Seq(("a", "a")))
    // COUNT TIE with the overlap boundary: a tied source pair sorting
    // after a selected candidate can create a pair that outranks it on
    // the lexicographic tie-break, so ties at the boundary are cut —
    // here everything ties at 10 and the batch degenerates to the head
    assert(Bpe.selectBatch(Seq(m("b", "r", 10), m("n", "w", 10), m("r", "o", 10)), 1)
      .map(x => (x.left, x.right)) == Seq(("b", "r")))
    // mixed counts: the strict-majority above the boundary survives
    assert(Bpe.selectBatch(Seq(m("a", "b", 12), m("c", "d", 11), m("e", "f", 10),
        m("b", "z", 10)), 1)
      .map(x => (x.left, x.right)) == Seq(("a", "b"), ("c", "d")))
    // an exhausted limit leaves unseen pairs that may tie the tail:
    // the tail count becomes the boundary only when the limit was hit
    assert(Bpe.selectBatch(Seq(m("a", "b", 9), m("c", "d", 8)), 1,
      limitWasHit = true).map(x => (x.left, x.right)) == Seq(("a", "b")))
    assert(Bpe.selectBatch(Seq(m("a", "b", 9), m("c", "d", 8)), 1,
      limitWasHit = false).map(x => (x.left, x.right)) ==
      Seq(("a", "b"), ("c", "d")))
  }

  test("batched training equals sequential on chaining-adversarial corpora") {
    // heavy chaining: every merge's output feeds the next round's top pair
    val chain = Seq.fill(20)("aaaaaaaa bbbbbbbb abababab").toDF("text")
    // mixed: disjoint head pairs plus chained tails
    val mixed = Seq.fill(10)("the quick brown fox the quick fox " +
      "thethethe quickquick").toDF("text")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for ((df, n) <- Seq((chain, 12), (mixed, 25), (docs, 50))) {
      val seqModel = Bpe.train(df, "text", nMerges = n, maxBatch = 1)
      val batched  = Bpe.train(df, "text", nMerges = n, maxBatch = 16)
      assert(batched.merges == seqModel.merges,
        s"batched model diverged from sequential greedy on n=$n")
    }
  }

  test("batching cuts driver rounds; the exactness guard bounds it on text") {
    // disjoint-pair corpus: 13 two-letter alternating words over disjoint
    // alphabets, frequencies strictly descending — the (x,y) pairs have
    // double the count of their chained (y,x)/(y,</w>) shadows, so one
    // scan batches all 13 head merges under the tie-truncation guard
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val words = (0 until 13).map(i =>
      s"${letters(2 * i)}${letters(2 * i + 1)}" * 2)
    val disjoint = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(100 - i)(w) }.mkString(" ")
    val dDf = Seq(disjoint).toDF("text")
    val d0 = Bpe.trainScanCount.get()
    val batchedD = Bpe.train(dDf, "text", nMerges = 13, maxBatch = 16)
    val dScans = Bpe.trainScanCount.get() - d0
    assert(dScans <= 3, s"13 disjoint merges should batch into <=3 scans, got $dScans")
    assert(batchedD.merges ==
      Bpe.train(dDf, "text", nMerges = 13, maxBatch = 1).merges)
    // natural text chains through shared letters, so the EXACTNESS guard
    // legitimately limits batch width — but never regresses past one
    // scan per merge
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val s0 = Bpe.trainScanCount.get()
    Bpe.train(docs, "text", nMerges = 50, maxBatch = 1)
    val seqScans = Bpe.trainScanCount.get() - s0
    val b0 = Bpe.trainScanCount.get()
    Bpe.train(docs, "text", nMerges = 50, maxBatch = 16)
    val batchScans = Bpe.trainScanCount.get() - b0
    assert(seqScans == 50, s"sequential must scan once per merge, got $seqScans")
    assert(batchScans < seqScans,
      s"batching must save scans even on chained text, got $batchScans vs $seqScans")
  }
}
