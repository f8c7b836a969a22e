package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curate, Packing}

/** Randomized cross-checks for the round-10 operator additions: the
  * truncation-loss ladder, the gate-ablation matrix, and the
  * histogram-trick exact percentile — each checked against a brute-force
  * in-memory reference on seeded random data (the triangles/kCore
  * cross-check discipline), so the melt/positional-aggregate plumbing
  * can't silently misalign a column with its length/rule/rank. */
class Wave30OpsSpec extends SparkSuite {
  import spark.implicits._

  private val rng = new scala.util.Random(20260815L)

  test("truncationReport matches a brute-force reference on random token counts") {
    val toks = Seq.fill(500)(rng.nextInt(300).toLong)
    val lengths = Seq(16, 64, 128, 256)
    val got = Packing.truncationReport(
        toks.toDF("tok"), "tok", lengths)
      .collect().map(r => (r.getAs[Int]("ctx_len"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_truncated"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("kept_tokens"))).toSeq
    val want = lengths.map { l =>
      (l, toks.size.toLong, toks.count(_ > l).toLong, toks.sum,
        toks.map(t => math.min(t, l.toLong)).sum)
    }
    assert(got == want)
    // loss_frac consistency: 1 - kept/total, 9 dp
    val fracs = Packing.truncationReport(toks.toDF("tok"), "tok", lengths)
      .collect().map(r => r.getAs[Double]("loss_frac"))
    got.zip(fracs).foreach { case ((_, _, _, tot, kept), f) =>
      assert(math.abs(f - BigDecimal(1.0 - kept.toDouble / tot)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
    }
  }

  test("gateAblation is consistent with gopherGate's own verdicts") {
    // random-ish corpus spanning all failure modes: too short, stopword-
    // free, stuttered (top-word), long-word gibberish, and clean docs
    val docs = (0 until 120).map { i =>
      val clean = "the quick brown fox jumps over a lazy dog of the " +
        "morning and walks to town in light rain " * 3
      val text = i % 5 match {
        case 0 => "tiny doc"                                   // n_words
        case 1 => Seq.fill(30)("zebra").mkString(" ")          // stop+top
        case 2 => Seq.fill(25)(s"w$i xylophone quartz").mkString(" ") // stop_frac
        case 3 => Seq.fill(24)("incomprehensibilities").mkString(" ") // wlen+stop+top
        case _ => clean + i
      }
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val gated = Curate.gopherGate(df, "doc_id", "text")
      .select($"doc_id", $"n_words", $"fail_reasons")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[String]("fail_reasons").split(",").filter(_.nonEmpty).toSet))
    val abl = Curate.gateAblation(df, "doc_id", "text")
      .collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_fail"),
          r.getAs[Long]("n_fail_unique"),
          r.getAs[Long]("tokens_lost_unique")))).toMap
    assert(abl.keySet == Curate.GateRules.toSet)
    Curate.GateRules.foreach { rule =>
      val (nDocs, nFail, nUniq, toks) = abl(rule)
      assert(nDocs == docs.size.toLong)
      assert(nFail == gated.count(_._3.contains(rule)).toLong,
        s"$rule n_fail")
      assert(nUniq == gated.count(g => g._3 == Set(rule)).toLong,
        s"$rule n_fail_unique")
      assert(toks == gated.filter(g => g._3 == Set(rule)).map(_._2).sum,
        s"$rule tokens_lost_unique")
    }
    // every failure mode above must actually be exercised
    assert(abl.values.forall(_._2 > 0), "a rule had zero failures — fixture drift")
  }

  test("histogram-trick percentile (q215's shape) equals sort-based nearest-rank") {
    val lags = Seq.fill(400)(rng.nextInt(60))
    val df = lags.zipWithIndex.map { case (l, i) => (i.toLong, "P", l) }
      .toDF("id", "grp", "lag_days")
    // the q215 expression shape, single group
    val hist = df.groupBy($"grp", $"lag_days")
      .agg(count(lit(1)).cast("long").as("cnt"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"lag_days")
    val wa = org.apache.spark.sql.expressions.Window.partitionBy($"grp")
    val got = hist.withColumn("cum", sum($"cnt").over(wc))
      .withColumn("n", sum($"cnt").over(wa))
      .groupBy($"grp")
      .agg(
        min(when($"cum" >= floor(($"n" * 50 + 99) / 100), $"lag_days"))
          .cast("int").as("p50"),
        min(when($"cum" >= floor(($"n" * 95 + 99) / 100), $"lag_days"))
          .cast("int").as("p95"))
      .head()
    val sorted = lags.sorted
    def nearestRank(q: Int) = sorted((q * lags.size + 99) / 100 - 1)
    assert(got.getAs[Int]("p50") == nearestRank(50))
    assert(got.getAs[Int]("p95") == nearestRank(95))
  }
}
