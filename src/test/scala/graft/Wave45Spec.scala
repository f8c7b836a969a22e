package graft

/** Wave-48 cross-checks (queries live in Wave45Queries.scala): the
  * histogram nearest-rank quantiles against a sorted-array walk, the
  * assortativity against an in-memory edge-list Pearson, and Chao1
  * against a literal frequency-of-frequencies recomputation. */
class Wave45Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q304 assortativity ≡ in-memory edge-list Pearson") {
    val pairs = graft.queries.Stores.docPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val dir = pairs.flatMap(p => Seq(p, p.swap))
    val deg = dir.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val xs = dir.map(e => deg(e._1))
    val ys = dir.map(e => deg(e._2))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val exp = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = q("q304_degree_assortativity")
      .select("n_edges", "assortativity").as[(Long, Double)].collect().head
    assert(got._1 == pairs.length.toLong)
    assert(math.abs(got._2 - exp) < 1e-5, s"assortativity ${got._2} vs $exp")
  }

  test("q305 Chao1 ≡ literal frequency-of-frequencies recomputation") {
    val tf = Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)].collect()
      .flatMap { case (l, t) => t.split(" ").map(l -> _) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val byLang = tf.keys.groupBy(_._1)
    val got = q("q305_chao1_richness")
      .select("lang", "v_obs", "f1", "f2", "chao1")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, v, f1, f2, chao1) =>
      val fs = byLang(lang).toSeq.map(tf)
      assert(v == fs.length.toLong, s"$lang v_obs")
      assert(f1 == fs.count(_ == 1).toLong, s"$lang f1")
      assert(f2 == fs.count(_ == 2).toLong, s"$lang f2")
      val exp = v + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))
      assert(math.abs(chao1 - exp) < 1e-5, s"$lang chao1 $chao1 vs $exp")
      assert(chao1 >= v, s"$lang Chao1 below observed richness")
    }
  }

  test("q306/q308 nearest-rank quantiles ≡ sorted-array walk") {
    // q308: recompute per-type p50/p99 from the literal sorted counts
    val mc = Tables.events(spark, sf)
      .groupBy($"event_type",
        org.apache.spark.sql.functions.date_trunc("minute", $"ts").as("m"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("long").as("c"))
      .select("event_type", "c").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def nearestRank(xs: Seq[Long], p: Int): Long =
      xs((p * xs.length + 99) / 100 - 1)
    val got = q("q308_arrival_rate_quantiles")
      .select("event_type", "n_active_minutes", "p50_per_min",
        "p99_per_min", "max_per_min")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, n, p50, p99, mx) =>
      val xs = mc(et)
      assert(n == xs.length.toLong, s"$et n")
      assert(p50 == nearestRank(xs, 50), s"$et p50")
      assert(p99 == nearestRank(xs, 99), s"$et p99")
      assert(mx == xs.max, s"$et max")
    }
  }
}
