package graft

/** Wave-49 cross-checks (queries live in Wave46Queries.scala): every
  * statistic recomputed in memory by the textbook definition — ANOVA
  * from raw group lists, Theil–Sen from the literal all-pairs slope
  * median, the runs test from a sequential walk, Spearman from sorted
  * rank assignment. */
class Wave46Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def dayRevenue(): Seq[(Int, Double)] =
    Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.datediff(
        org.apache.spark.sql.functions.to_date($"o_orderdate"),
        org.apache.spark.sql.functions.lit("1995-01-01").cast("date"))
        .as("t"), $"o_totalprice")
      .as[(Int, Double)].collect()
      .groupBy(_._1).view
      .mapValues(xs => math.rint(xs.map(x => math.rint(x._2 * 100)).sum) / 100.0)
      .toSeq.sortBy(_._1)

  test("q309 ANOVA F ≡ in-memory group decomposition") {
    val g = Tables.orders(spark, sf)
      .select($"o_orderdate", $"o_totalprice")
      .as[(java.sql.Timestamp, Double)].collect()
      .groupBy(_._1.toLocalDateTime.getDayOfWeek.getValue % 7) // 0=Sunday
      .view.mapValues(_.map(_._2)).toMap
    val n = g.values.map(_.length).sum.toDouble
    val k = g.size.toDouble
    val grand = g.values.flatten.sum / n
    val ssb = g.values.map(xs => xs.length *
      math.pow(xs.sum / xs.length - grand, 2)).sum
    val ssw = g.values.map(xs => {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum
    }).sum
    val expF = (ssb / (k - 1)) / (ssw / (n - k))
    val row = q("q309_anova_dow_revenue")
      .select("n", "k", "f_stat").as[(Long, Long, Double)].collect().head
    assert(row._1 == n.toLong && row._2 == k.toLong)
    assert(math.abs(row._3 - expF) < 1e-4, s"F ${row._3} vs $expF")
  }

  test("q310 Theil–Sen ≡ literal all-pairs slope median (grid-quantized)") {
    val day = dayRevenue()
    val slopes = for {
      i <- day.indices; j <- (i + 1) until day.length
    } yield math.floor((day(j)._2 - day(i)._2).toDouble /
      (day(j)._1 - day(i)._1) * 100).toLong
    val sorted = slopes.sorted
    val med = sorted((sorted.length + 1) / 2 - 1) / 100.0
    val got = q("q310_theilsen_trend")
      .select("n_pairs", "theil_sen_slope").as[(Long, Double)].collect().head
    assert(got._1 == slopes.length.toLong)
    assert(got._2 == med, s"theil-sen ${got._2} vs $med")
  }

  test("q311 runs test ≡ sequential walk") {
    val day = dayRevenue()
    val rs = day.map(_._2).sorted
    val median = rs((rs.length + 1) / 2 - 1) // nearest-rank, matches query
    val signs = day.filter(_._2 != median).map(_._2 > median)
    val runs = 1 + signs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
    val (n1, n2) = (signs.count(identity).toDouble,
      signs.count(!_).toDouble)
    val mu = 2 * n1 * n2 / (n1 + n2) + 1
    val sg = math.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) /
      ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))
    val expZ = (runs - mu) / sg
    val got = q("q311_runs_test")
      .select("n_above", "n_below", "n_runs", "z")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._1 == n1.toLong && got._2 == n2.toLong)
    assert(got._3 == runs.toLong, s"runs ${got._3} vs $runs")
    assert(math.abs(got._4 - expZ) < 1e-5, s"z ${got._4} vs $expZ")
  }

  test("q312 Spearman ≡ in-memory rank assignment") {
    val rev = Tables.lineitem(spark, sf)
      .where(org.apache.spark.sql.functions.year($"l_shipdate")
        .isin(1996, 1997))
      .select(org.apache.spark.sql.functions.year($"l_shipdate").as("yr"),
        $"l_partkey",
        ($"l_extendedprice" * (org.apache.spark.sql.functions.lit(1)
          - $"l_discount")).as("v"))
      .as[(Int, Long, Double)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    def ranks(yr: Int): Map[Long, Long] = {
      val parts = rev.keys.filter(_._1 == yr).map(_._2).toSeq
      parts.sortBy(p => (-rev((yr, p)), p)).zipWithIndex
        .map { case (p, i) => p -> (i + 1).toLong }.toMap
    }
    val (ra, rb) = (ranks(1996), ranks(1997))
    val common = ra.keySet.intersect(rb.keySet).toSeq
    val xs = common.map(ra(_).toDouble)
    val ys = common.map(rb(_).toDouble)
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val exp = (n * xs.zip(ys).map(p => p._1 * p._2).sum - sx * sy) /
      math.sqrt((n * xs.map(x => x * x).sum - sx * sx) *
        (n * ys.map(y => y * y).sum - sy * sy))
    val got = q("q312_rank_stability")
      .select("n_parts", "spearman").as[(Long, Double)].collect().head
    assert(got._1 == common.length.toLong)
    assert(math.abs(got._2 - exp) < 1e-4, s"spearman ${got._2} vs $exp")
  }
}
