package graft

import graft.ops.{Graph, Ranking}

/** Wave-14 operator: triangle census (clique vs star vs path fixtures,
  * duplicate/reversed-edge canonicalization, partition invariance). */
class Wave12Spec extends SparkSuite {
  import spark.implicits._

  private def tri(pairs: (Long, Long)*) =
    Graph.triangles(
        (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("triangles: K4 is all-triangles, a pendant node sees none") {
    // K4 on 1..4 (every node: deg 3, 3 triangles, coef 1.0) plus
    // pendant 5-1 (node 5: deg 1, 0 triangles; node 1's deg rises to 4)
    val got = tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L))
    assert(got(5L) == ((1L, 0L, 0.0)), got.toString)
    assert(got(2L) == ((3L, 3L, 1.0)) && got(4L) == ((3L, 3L, 1.0)))
    // node 1: degree 4, still 3 triangles, coef 2*3/(4*3) = 0.5
    assert(got(1L) == ((4L, 3L, 0.5)), got.toString)
  }

  test("triangles: a path has none; a star has none") {
    val path = tri((1L, 2L), (2L, 3L), (3L, 4L))
    assert(path.values.forall { case (_, t, c) => t == 0L && c == 0.0 })
    val star = tri((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    assert(star(10L) == ((4L, 0L, 0.0)), star.toString)
  }

  test("triangles: duplicate + reversed edges canonicalize; partitioning irrelevant") {
    // triangle 1-2-3 fed with duplicates, both directions, and a self
    // loop that must drop
    val raw = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 3L), (2L, 2L)).toDF("a", "b")
    val expect = Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)), 3L -> ((2L, 1L, 1.0)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.triangles(df, "a", "b")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(run(raw) == expect)
    assert(run(raw.repartition(7)) == expect)
  }

  // ---- k-core -----------------------------------------------------------

  private def core(k: Int, maxRounds: Int, pairs: (Long, Long)*) =
    Graph.kCore(pairs.toDF("a", "b"), "a", "b", k, maxRounds)
      .as[(Long, Long)].collect().toMap

  test("kCore: the clique survives, the tail chain peels shell by shell") {
    // K4 on 1..4 with a chain 4-5-6 hanging off; 3-core = the K4 alone
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(3, 5, g: _*) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // round 1 peels 5 and 6; a 1-round budget ends mid-peel with
    // convergence UNcertified → fail-loud, never a maybe-core
    assertThrows[IllegalStateException](core(3, 1, g: _*))
  }

  test("kCore: unconverged long chain fails loud, converges given budget") {
    // path 1-2-...-8: k=2 peels one endpoint pair per round (~4 rounds
    // to empty); a 2-round budget must throw, a 10-round budget must
    // certify the empty core (a path has no 2-core)
    val path = (1L to 7L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](core(2, 2, path: _*))
    assert(core(2, 10, path: _*).isEmpty)
  }

  test("kCore: a star has no 2-core; a cycle IS its own 2-core") {
    assert(core(2, 3, (10L, 1L), (10L, 2L), (10L, 3L)).isEmpty)
    assert(core(2, 3, (1L, 2L), (2L, 3L), (3L, 1L)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  // ---- reciprocal-rank fusion -------------------------------------------

  test("rrfFuse: agreement outranks either single-run winner") {
    // run A: x@1, y@2; run B: y@1, z@2 — y (1/62 + 1/61) beats
    // x (1/61) and z (1/62); absent runs contribute 0, ranks surface
    val a = Seq(("q1", "x", 1), ("q1", "y", 2)).toDF("query", "item", "rnk")
    val b = Seq(("q1", "y", 1), ("q1", "z", 2)).toDF("query", "item", "rnk")
    val got = Ranking.rrfFuse(a, b, "query", "item", "rnk")
      .as[(String, String, Option[Int], Option[Int], Double, Int)]
      .collect().sortBy(_._6)
    assert(got.map(r => (r._2, r._3, r._4, r._6)).toSeq == Seq(
      ("y", Some(2), Some(1), 1), ("x", Some(1), None, 2),
      ("z", None, Some(2), 3)), got.mkString(", "))
    val y = got.head
    assert(math.abs(y._5 - (1.0 / 62 + 1.0 / 61)) < 1e-9)
  }

  test("rrfFuse: equal scores tie-break by item; topK truncates") {
    // symmetric ranks → identical scores for p and s; p < s wins rank 1
    val a = Seq(("q1", "p", 1), ("q1", "s", 2)).toDF("query", "item", "rnk")
    val b = Seq(("q1", "s", 1), ("q1", "p", 2)).toDF("query", "item", "rnk")
    val got = Ranking.rrfFuse(a, b, "query", "item", "rnk", topK = 1)
      .as[(String, String, Option[Int], Option[Int], Double, Int)].collect()
    assert(got.length == 1 && got.head._2 == "p" && got.head._6 == 1,
      got.mkString(", "))
  }

  // ---- link prediction --------------------------------------------------

  private def links(maxDeg: Int, pairs: (Long, Long)*) =
    Graph.linkCandidates(pairs.toDF("a", "b"), "a", "b", maxDeg)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("linkCandidates: shared neighbors predict, adjacency excludes") {
    // 1 and 2 share neighbors 10, 11 but are NOT adjacent → predicted
    // with n_common=2; deg(1)=deg(2)=2 → jaccard 2/(2+2-2)=1.0.
    // 1-10 are adjacent → never emitted even though they share nothing.
    val got = links(64, (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    assert(got((1L, 2L)) == ((2L, 1.0)), got.toString)
    assert(!got.contains((1L, 10L)) && !got.contains((1L, 11L)))
    // 10 and 11 also share {1, 2}: the symmetric prediction, and the
    // only other candidate — C4 has exactly two diagonals
    assert(got((10L, 11L)) == ((2L, 1.0)) && got.size == 2, got.toString)
  }

  test("linkCandidates: a center above the degree cap contributes no wedges") {
    // star center 100 with 5 spokes; cap 4 < 5 → no candidate pairs
    val spokes = (1L to 5L).map(i => (100L, i))
    assert(links(4, spokes: _*).isEmpty)
    // raising the cap to 5 admits the center: C(5,2)=10 spoke pairs,
    // each deg-1 endpoints → jaccard 1/(1+1-1)=1.0
    val open = links(5, spokes: _*)
    assert(open.size == 10 && open.values.forall(_ == ((1L, 1.0))))
  }

  // ---- randomized cross-checks vs in-memory reference -------------------

  /** Deterministic pseudo-random edge sets (seeded LCG — no
    * Math.random in tests either). */
  private def randomGraph(seed: Long, nodes: Int, edges: Int): Seq[(Long, Long)] = {
    var x = seed
    def next(bound: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % bound + bound) % bound).toInt
    }
    (1 to edges).map(_ => (next(nodes).toLong, next(nodes).toLong))
      .filter(p => p._1 != p._2)
  }

  private def canon(es: Seq[(Long, Long)]): Set[(Long, Long)] =
    es.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet

  test("triangles: matches brute-force enumeration on random graphs") {
    for (seed <- 1L to 4L) {
      val es = randomGraph(seed * 7919, nodes = 10, edges = 18)
      if (es.nonEmpty) {
        val und = canon(es)
        val adj = und.flatMap(e => Seq(e, e.swap))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val nodes = adj.keySet.toSeq.sorted
        val refTri = nodes.map { u =>
          u -> (for {
            v <- adj(u).toSeq; w <- adj(u).toSeq
            if v < w && adj(v).contains(w)
          } yield 1).size.toLong
        }.toMap
        val got = Graph.triangles(es.toDF("a", "b"), "a", "b")
          .as[(Long, Long, Long, Double)].collect()
          .map(r => r._1 -> r._3).toMap
        assert(got == refTri.filter { case (n, _) => adj(n).nonEmpty },
          s"seed $seed: $got vs $refTri")
      }
    }
  }

  test("kCore: converged result matches in-memory peel on random graphs") {
    for (seed <- 1L to 4L) {
      val es = randomGraph(seed * 104729, nodes = 12, edges = 20)
      if (es.nonEmpty) {
        var und = canon(es)
        var stable = false
        while (!stable) {
          val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).map { case (k, v) => k -> v.size }
          val keep = deg.filter(_._2 >= 2).keySet
          val next = und.filter(e => keep(e._1) && keep(e._2))
          stable = next == und
          und = next
        }
        val refDeg = und.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val got = Graph.kCore(es.toDF("a", "b"), "a", "b", k = 2,
            maxRounds = 12).as[(Long, Long)].collect().toMap
        assert(got == refDeg, s"seed $seed: $got vs $refDeg")
      }
    }
  }

  test("kCore: partitioning irrelevant") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val a = Graph.kCore(g, "a", "b", 3, 3).as[(Long, Long)].collect().toMap
    val b = Graph.kCore(g.repartition(5), "a", "b", 3, 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b && a == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
