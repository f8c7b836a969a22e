package graft

import java.time.temporal.ChronoUnit

/** Wave-46 cross-checks (queries live in Wave43Queries.scala): the
  * chi-square statistic against a from-scratch in-memory computation,
  * the sweep-line concurrency peak against brute-force interval
  * counting, and the gap-sweep's internal consistency with q18's
  * sessionization. Each check re-derives the answer by a DIFFERENT
  * algorithm than the query under test. */
class Wave43Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q296 chi2 + Cramér's V ≡ in-memory recomputation from raw counts") {
    val cells = Tables.documents(spark, sf)
      .groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
    val n = cells.map(_._3).sum.toDouble
    val rl = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cs = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // same 9-dp per-cell quantization as the query, summed exactly
    val chi2raw = cells.map { case (l, src, o) =>
      val e = rl(l) * cs(src) / n
      BigDecimal(math.pow(o - e, 2) / e).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val k = math.min(rl.size - 1, cs.size - 1)
    val expChi2 = BigDecimal(chi2raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expV = BigDecimal(math.sqrt(chi2raw / (n * k)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = q("q296_chi2_lang_source")
      .select("n", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Double, Double)].collect().head
    assert(row._1 == n.toLong)
    assert(row._2 == (rl.size - 1).toLong * (cs.size - 1))
    assert(math.abs(row._3 - expChi2) < 1e-6, s"chi2 ${row._3} vs $expChi2")
    assert(math.abs(row._4 - expV) < 1e-6, s"V ${row._4} vs $expV")
  }

  test("q298 sweep-line peak ≡ brute-force interval counting per change point") {
    val sess = graft.ops.Windows
      .sessionize(Tables.events(spark, sf), "user_id", "ts", "event_id", 30)
      .groupBy($"user_id", $"session_id")
      .agg(org.apache.spark.sql.functions.min($"ts").as("st"),
        org.apache.spark.sql.functions.max($"ts").as("en"))
      .select("st", "en")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].collect()
      .map { case (a, b) =>
        (a.toInstant.truncatedTo(ChronoUnit.MINUTES),
          b.toInstant.truncatedTo(ChronoUnit.MINUTES).plus(1, ChronoUnit.MINUTES))
      }
    // change points: session start minutes and (end+1min) minutes
    val points = sess.flatMap(s => Seq(s._1, s._2)).distinct
    // brute force: at each change point, count sessions covering it
    val peakByDay = points
      .map(m => (m.toString.substring(0, 10),
        sess.count(s => !m.isBefore(s._1) && m.isBefore(s._2)).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val got = q("q298_concurrency_peak")
      .select("day", "peak_concurrency")
      .as[(java.sql.Date, Long)].collect()
      .map { case (day, p) => day.toString -> p }.toMap
    assert(got == peakByDay,
      s"sweep-line ${got.toSeq.sorted} vs brute ${peakByDay.toSeq.sorted}")
  }

  test("q297 gap sweep: sessions monotone in gap; 30-min row ≡ q18's count") {
    val rows = q("q297_session_gap_sweep")
      .select("gap_min", "n_sessions")
      .as[(Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(15, 30, 60))
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2,
      "session count must not increase with a larger gap threshold")
    val q18Sessions = q("q18_sessionize").count()
    assert(rows(1)._2 == q18Sessions,
      s"30-min sweep row ${rows(1)._2} != q18 session count $q18Sessions")
  }

  test("q295 zone-map audit: prune fraction monotone, skipped ≤ total rows") {
    val total = Tables.events(spark, sf).count()
    val rows = q("q295_zonemap_pruning")
      .select("pct", "prune_frac", "rows_skipped", "n_blocks", "n_pruned")
      .as[(Int, Double, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(25, 50, 75))
    assert(rows.sliding(2).forall(w => w(0)._2 <= w(1)._2),
      "a later cutoff must prune at least as many blocks")
    rows.foreach { r =>
      assert(r._3 <= total && r._5 <= r._4,
        s"impossible pruning row $r (total=$total)")
    }
    // append-ordered fixture: time-correlated ids ⇒ the 25% cutoff must
    // already prune a nonzero share (the audit's entire point)
    assert(rows(0)._5 > 0, "expected nonzero pruning on append-ordered events")
  }
}
