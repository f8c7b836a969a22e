package graft

/** Wave-52 cross-checks (queries live in Wave49Queries.scala): FD
  * strength against a literal per-key max walk (plus the exact-FD
  * law on a planted frame), the overlap coefficient against in-memory
  * token sets, and the schema profile against literal JSON parsing. */
class Wave49Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q320 FD strength ≡ literal per-key max walk; bounds hold") {
    val cells = Tables.documents(spark, sf)
      .groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
    val n = cells.map(_._3).sum
    val exp = cells.groupBy(_._1).values.map(_.map(_._3).max).sum.toDouble / n
    val got = q("q320_fd_discovery")
      .where($"table_name" === "documents" && $"determinant" === "lang")
      .select("fd_strength", "n_rows").as[(Double, Long)].collect().head
    assert(got._2 == n)
    assert(math.abs(got._1 - exp) < 1e-6, s"fd ${got._1} vs $exp")
    // every reported strength is a valid row share
    q("q320_fd_discovery").select("fd_strength").as[Double].collect()
      .foreach(s => assert(s > 0.0 && s <= 1.0))
  }

  test("q321 overlap coefficient ≡ in-memory token sets") {
    val vocab = Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ")).toSet).toMap
    val got = q("q321_source_vocab_overlap")
      .select("source_a", "source_b", "n_common", "overlap_coef")
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, nc, oc) =>
      val inter = vocab(a).intersect(vocab(b)).size
      assert(nc == inter.toLong, s"($a,$b) common $nc vs $inter")
      val exp = inter.toDouble / math.min(vocab(a).size, vocab(b).size)
      assert(math.abs(oc - exp) < 1e-6, s"($a,$b) oc $oc vs $exp")
    }
  }

  test("q322 schema profile: coverage bounds, keys are real props keys") {
    val rows = q("q322_props_schema_profile")
      .select("event_type", "key", "coverage", "integer_share")
      .as[(String, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, cov, is) =>
      assert(cov > 0.0 && cov <= 1.0 + 1e-9)
      assert(is >= 0.0 && is <= 1.0 + 1e-9)
    }
    // the fixture's props is {"k": <int>} — key set must be exactly {k}
    // with full integer share (pins the map-explode against the JSON)
    assert(rows.map(_._2).distinct.toSeq == Seq("k"), rows.mkString(","))
    rows.foreach { case (et, _, _, is) =>
      assert(is == 1.0, s"$et integer_share $is") }
  }
}
