package graft

/** Wave-47 cross-checks (queries live in Wave44Queries.scala): the
  * histogram rank-sum AUC against the O(n⁺·n⁻) pairwise definition,
  * the quantized moments against direct in-memory statistics, the
  * TVD against a literal per-cell distribution walk, and the ACF
  * against an in-memory Pearson of the shifted series. Each check
  * recomputes by a DIFFERENT algorithm than the query under test. */
class Wave44Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q299 histogram rank-sum AUC ≡ pairwise P(s⁺>s⁻) + ½P(tie)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val gate = graft.ops.Curate.gopherGate(docs, "doc_id", "text")
      .select($"doc_id", $"passes")
    val wc = graft.ops.Text.tokenCount($"text")
    val score = graft.ops.Text.qualityScore(wc,
      graft.ops.Text.stopwordCount($"text") / wc,
      graft.ops.Text.sumTokenLen($"text") / wc)
    val rows = docs.select($"doc_id", floor(score * 10000).cast("long").as("s"))
      .join(gate, Seq("doc_id"))
      .select($"s", $"passes").as[(Long, Boolean)].collect()
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture must have both classes")
    var num = 0.0
    for (p <- pos; m <- neg)
      num += (if (p > m) 1.0 else if (p == m) 0.5 else 0.0)
    val expected = round6(num / (pos.length.toDouble * neg.length))
    val got = q("q299_roc_auc").select("auc").as[Double].collect().head
    assert(got == expected, s"rank-sum AUC $got vs pairwise $expected")
  }

  test("q301 quantized moments ≡ direct in-memory statistics") {
    val byPrio = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_totalprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => math.floor(t._2 / 1000))).toMap
    val got = q("q301_price_moments")
      .select("o_orderpriority", "n", "mean_k", "skewness", "kurtosis_excess")
      .as[(String, Long, Double, Double, Double)].collect()
    got.foreach { case (prio, n, mean, skew, kurt) =>
      val xs = byPrio(prio)
      assert(n == xs.length)
      val m = xs.sum / xs.length
      val m2 = xs.map(x => (x - m) * (x - m)).sum / xs.length
      val m3 = xs.map(x => math.pow(x - m, 3)).sum / xs.length
      val m4 = xs.map(x => math.pow(x - m, 4)).sum / xs.length
      assert(math.abs(mean - m) < 1e-5, s"$prio mean $mean vs $m")
      assert(math.abs(skew - m3 / math.pow(m2, 1.5)) < 1e-5,
        s"$prio skew $skew vs ${m3 / math.pow(m2, 1.5)}")
      assert(math.abs(kurt - (m4 / (m2 * m2) - 3)) < 1e-5,
        s"$prio kurt $kurt vs ${m4 / (m2 * m2) - 3}")
    }
  }

  test("q300 TVD ≡ literal distribution walk, and bounds hold") {
    val raw = Tables.documents(spark, sf).select($"doc_id", $"lang", $"source")
      .join(Tables.embeddings(spark, sf)
        .select($"vec_id".as("doc_id"), $"label"), Seq("doc_id"))
      .select($"lang", $"source", $"label")
      .as[(String, String, Int)].collect()
    val n = raw.length.toDouble
    val glob = raw.groupBy(_._3).view.mapValues(_.length / n).toMap
    val got = q("q300_t_closeness")
      .select("lang", "source", "n", "tvd")
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, src, nc, tvd) =>
      val cell = raw.filter(r => r._1 == lang && r._2 == src)
      assert(cell.length.toLong == nc)
      val cd = cell.groupBy(_._3).view.mapValues(_.length.toDouble / cell.length).toMap
      val exp = 0.5 * (glob.keySet ++ cd.keySet).toSeq
        .map(l => math.abs(cd.getOrElse(l, 0.0) - glob.getOrElse(l, 0.0))).sum
      assert(tvd >= -1e-9 && tvd <= 1.0 + 1e-9, s"TVD out of range: $tvd")
      assert(math.abs(tvd - exp) < 1e-5, s"($lang,$src) tvd $tvd vs $exp")
    }
  }

  test("q303 lag-1 ACF ≡ in-memory Pearson of the shifted day series") {
    val day = Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date($"o_orderdate").as("day"))
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .round($"o_totalprice" * 100, 0).cast("long")) / 100.0, 2).as("r"))
      .select("day", "r").as[(java.sql.Date, Double)].collect()
      .map { case (d, r) => d.toLocalDate -> r }.toMap
    val pairs = day.toSeq.flatMap { case (d, r) =>
      day.get(d.plusDays(1)).map(r2 => (r, r2)) }
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val exp = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = q("q303_revenue_acf")
      .where($"lag" === 1).select("n_pairs", "acf")
      .as[(Long, Double)].collect().head
    assert(got._1 == pairs.length.toLong)
    assert(math.abs(got._2 - exp) < 1e-5, s"lag-1 acf ${got._2} vs $exp")
  }

  test("q302 derangement: no pair loss on fixtures AND on gapped ids") {
    // The round-14 rewrite derives a DENSE index (md5-bucketed rank +
    // prefix-sum offsets) instead of assuming vec_id is 0..N−1, so the
    // derangement is a bijection on ANY id set. Guards: (a) the banded
    // histogram accounts for exactly N pairs on the real fixtures, and
    // (b) the same holds on a deliberately GAPPED/re-based id column —
    // the case the pre-r14 formula silently dropped pairs on.
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val n = Tables.embeddings(spark, dir).count()
      val accounted = SparkEntry.queries("q302_null_cosine_baseline")(spark, dir)
        .agg(sum($"n_pairs")).as[Long].collect().head
      assert(accounted == n,
        s"$dir: q302 histogram accounts $accounted of $n vectors")
    }
    // gapped ids: re-key sf0.001 embeddings to 1000 + 7·vec_id (+ a hole),
    // write to a temp dir, run the SAME query body against it
    val src = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val gapped = src
      .where($"vec_id" =!= 13L)
      .withColumn("vec_id", $"vec_id" * 7 + 1000)
    val dir = tmpDir("q302gap")
    gapped.write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val nG = gapped.count()
    val out = SparkEntry.queries("q302_null_cosine_baseline")(spark, dir)
    val accountedG = out.agg(sum($"n_pairs")).as[Long].collect().head
    assert(accountedG == nG,
      s"gapped ids: q302 histogram accounts $accountedG of $nG vectors")
    // derangement: no self-pair can reach cosine exactly 1 via identity —
    // with a hole and re-base the old formula would have lost ≥1 pair, so
    // equality above is the regression signal
  }
}
