package graft

import graft.ops.Graph

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
}
