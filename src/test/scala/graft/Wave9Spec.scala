package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Graph, Sampling, Windows}

/** Ninth-wave operators: label propagation (spread, tie-break, seed
  * immutability), decayed means (hand-computed half-life weights),
  * stitch pairs (planted continuation, df cap), and UniMax allocation
  * (hand-computed water-fill with cap redistribution). */
class Wave9Spec extends SparkSuite {
  import spark.implicits._

  // ---- label propagation ------------------------------------------------

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("labelPropagate: seeds spread hop-by-hop, seeds never change") {
    // chain 1-2-3-4; node 1 seeded "a", node 4 seeded "b"
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L))
    val seeds = Seq((1L, "a"), (4L, "b")).toDF("node", "label")
    val got = Graph.labelPropagate(e, "src", "dst", seeds, iters = 3)
      .as[(Long, Option[String])].collect().toMap
    // round 1: 2<-a, 3<-b; ties never arise; seeds keep their labels
    assert(got == Map(1L -> Some("a"), 2L -> Some("a"),
      3L -> Some("b"), 4L -> Some("b")), got.toString)
  }

  test("labelPropagate: modal vote with lexicographic tie-break; unreached stays null") {
    // node 10 has neighbors seeded b,b,a -> modal b; node 20 has a,b ->
    // tie -> lexicographically smaller "a"; node 99 in a far component
    val e = undirected((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (98L, 99L))
    val seeds = Seq((1L, "b"), (2L, "b"), (3L, "a"), (4L, "a"), (5L, "b"))
      .toDF("node", "label")
    val got = Graph.labelPropagate(e, "src", "dst", seeds, iters = 1)
      .as[(Long, Option[String])].collect().toMap
    assert(got(10L) == Some("b") && got(20L) == Some("a"), got.toString)
    assert(got(99L).isEmpty && got(98L).isEmpty, got.toString)
  }

  // ---- decayed mean -----------------------------------------------------

  test("decayedMean: a half-life-old value counts half") {
    val t0 = Timestamp.valueOf("2024-03-15 00:00:00")
    def daysAgo(d: Int) = new Timestamp(t0.getTime - d * 86400000L)
    val df = Seq(
      ("m", t0, 10.0),          // age 0 -> w = 1
      ("m", daysAgo(7), 4.0),   // age = half-life -> w = 0.5
      ("m", daysAgo(7), Double.NaN)).filter(!_._3.isNaN)
      .toDF("grp", "ts", "v")
    val r = Windows.decayedMean(df, "grp", "ts", "v", halfLifeDays = 7.0)
      .select($"n", $"decayed_sum", $"weight_sum", $"mean_raw", $"mean_decayed")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == 2L)
    assert(r._2 == 12.0 && r._3 == 1.5, r.toString) // 10·1 + 4·0.5 / 1+0.5
    assert(r._4 == 7.0 && r._5 == 8.0, r.toString)
  }

  test("decayedMean: null values excluded from both sums") {
    val t0 = Timestamp.valueOf("2024-03-15 00:00:00")
    val df = Seq(("g", t0, Some(6.0)), ("g", t0, None))
      .toDF("grp", "ts", "v")
    val r = Windows.decayedMean(df, "grp", "ts", "v", 7.0)
      .select($"n", $"weight_sum", $"mean_decayed")
      .as[(Long, Double, Double)].head()
    assert(r == ((1L, 1.0, 6.0)), r.toString)
  }

  // ---- stitch pairs -----------------------------------------------------

  test("stitchPairs: tail-of-A = head-of-B surfaces; short docs drop") {
    val bridge = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (1L, s"intro words here then $bridge"),     // ends with bridge
      (2L, s"$bridge continuation of the story"), // starts with bridge
      (3L, "unrelated text with eight tokens pad pad pad"),
      (4L, "short doc")                            // < 8 tokens
    ).toDF("doc_id", "text")
    val got = Dedup.stitchPairs(docs, "doc_id", "text", k = 8)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), got.toString)
  }

  test("stitchPairs: df cap suppresses boilerplate edge tiles") {
    val tile = "t1 t2 t3 t4 t5 t6 t7 t8"
    // 5 docs end with the tile, 5 start with it -> 25 pairs at maxDf 64,
    // zero once the cap is below the side df
    val docs = ((1L to 5L).map(i => (i, s"u$i a b c $tile")) ++
      (6L to 10L).map(i => (i, s"$tile x y z v$i"))).toDF("doc_id", "text")
    assert(Dedup.stitchPairs(docs, "doc_id", "text", k = 8).count() == 25L)
    assert(Dedup.stitchPairs(docs, "doc_id", "text", k = 8, maxDf = 4)
      .count() == 0L)
  }

  // ---- UniMax allocation ------------------------------------------------

  test("unimaxAllocation: capped low-resource domains free budget for large ones") {
    val df = (Seq.fill(1)(("a", 100L)) ++ Seq(("b", 1000L), ("c", 10000L)))
      .toDF("dom", "tok")
    val got = Sampling.unimaxAllocation(df, "dom", "tok",
        budget = 9000.0, maxEpochs = 4.0)
      .select($"domain", $"tokens", $"alloc", $"epochs")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // asc order a(100) b(1000) c(10000):
    //   a: min(400, 9000/3=3000) = 400, rem 8600
    //   b: min(4000, 8600/2=4300) = 4000, rem 4600
    //   c: min(40000, 4600/1) = 4600
    assert(got("a") == ((100L, 400.0, 4.0)), got.toString)
    assert(got("b") == ((1000L, 4000.0, 4.0)), got.toString)
    assert(got("c") == ((10000L, 4600.0, 0.46)), got.toString)
  }

  test("unimaxAllocation: uncapped domains split the budget evenly") {
    val df = Seq(("x", 5000L), ("y", 5000L)).toDF("dom", "tok")
    val got = Sampling.unimaxAllocation(df, "dom", "tok", 6000.0, 4.0)
      .select($"domain", $"alloc").as[(String, Double)].collect().toMap
    assert(got == Map("x" -> 3000.0, "y" -> 3000.0), got.toString)
  }
}
