package graft

/** Wave-50 cross-checks (queries live in Wave47Queries.scala): the
  * generalization ladder's monotonicity law, the HT estimator's
  * identity on the full population, and the encoding audit against
  * literal distinct counts. */
class Wave47Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q314 ladder: coarser granularity never increases risk") {
    val rows = q("q314_generalization_ladder")
      .select("granularity", "n_cells", "n_singleton_cells", "risk_frac")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(10, 100, 1000))
    // coarsening merges cells: cell count and singleton count are
    // monotone non-increasing up the ladder
    assert(rows.sliding(2).forall(w => w(1)._2 <= w(0)._2), "n_cells rose")
    assert(rows.sliding(2).forall(w => w(1)._4 <= w(0)._4 + 1e-9),
      s"risk_frac rose up the ladder: ${rows.toSeq}")
  }

  test("q315 HT estimator ≡ in-memory sample replay") {
    val thr = graft.ops.Sampling.hexThreshold(0.2)
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val bySource = docs.groupBy(_._1)
    val got = q("q315_ht_estimator")
      .select("source", "n_sampled", "true_total_chars", "ht_estimate")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, nSampled, total, ht) =>
      val rows = bySource(src)
      val sampled = rows.filter(r => md5hex(r._2.toString) < thr)
      assert(nSampled == sampled.length.toLong, s"$src n_sampled")
      assert(total == rows.map(_._3).sum, s"$src true total")
      val exp = BigDecimal(sampled.map(_._3).sum / 0.2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ht == exp, s"$src HT $ht vs $exp")
    }
  }

  test("q316 encoding audit ≡ literal distinct counts, bits law holds") {
    val (types, users) = {
      val ev = Tables.events(spark, sf)
        .select("event_type", "user_id").as[(String, Long)].collect()
      (ev.map(_._1).distinct.length.toLong,
        ev.map(_._2).distinct.length.toLong)
    }
    val got = q("q316_encoding_audit")
      .select("column_name", "card", "dict_bits_per_value")
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("event_type")._1 == types)
    assert(got("user_id")._1 == users)
    got.values.foreach { case (card, bits) =>
      if (card > 1) {
        assert(BigInt(card - 1).bitLength == bits,
          s"bits $bits != ceil(log2($card))")
        assert((BigInt(1) << bits) >= BigInt(card) &&
          (BigInt(1) << bits) < BigInt(card) * 2)
      } else assert(bits == 0)
    }
  }
}
