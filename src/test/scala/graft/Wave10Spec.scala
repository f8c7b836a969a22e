package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Tenth-wave operators: contrastive triplets (pos/neg selection,
  * singleton-label nulls), survival summary (hand-computed bookends),
  * and threshold-sweep monotonicity on the driver surface. */
class Wave10Spec extends SparkSuite {
  import spark.implicits._

  // ---- contrastive triplets ---------------------------------------------

  private val vecFixture = Seq(
    (1L, Seq(1.0, 0.0), 0),    // query
    (2L, Seq(0.99, 0.14), 0),  // same label, nearest
    (3L, Seq(0.7, 0.7), 0),    // same label, farther
    (4L, Seq(0.95, 0.31), 1),  // diff label, nearest
    (5L, Seq(0.0, 1.0), 1),
    (9L, Seq(0.5, 0.5), 7)     // label singleton (for the null-pos case)
  ).toDF("vec_id", "embedding", "label")

  test("contrastiveTriplets: nearest same-label positive, nearest diff-label negative") {
    val e = Similarity.prepared(vecFixture, "vec_id", "embedding")
    val lab = vecFixture.select($"vec_id".as("id"), $"label")
    val r = Similarity.contrastiveTriplets(e.where($"id" === 1), e, lab)
      .select($"pos_id", $"neg_id", $"margin")
      .as[(Long, Long, Double)].head()
    assert(r._1 == 2L && r._2 == 4L, r.toString)
    assert(r._3 > 0.0, s"positive should be closer than negative: $r")
  }

  test("contrastiveTriplets: singleton-label query has null positive, real negative") {
    val e = Similarity.prepared(vecFixture, "vec_id", "embedding")
    val lab = vecFixture.select($"vec_id".as("id"), $"label")
    val row = Similarity.contrastiveTriplets(e.where($"id" === 9), e, lab)
      .select($"pos_id", $"neg_id", $"margin").head()
    assert(row.isNullAt(0) && !row.isNullAt(1) && row.isNullAt(2),
      row.toString)
  }

  // ---- survival / threshold sweep (driver-surface shapes) ---------------

  test("q168 shape: bookend deltas, non-converters, pre-view purchases") {
    val t0 = Timestamp.valueOf("2024-02-05 08:00:00") // a Monday
    def h(x: Int) = new Timestamp(t0.getTime + x * 3600000L)
    val ev = Seq(
      (1L, 1L, t0, "view"), (2L, 1L, h(2), "purchase"),   // converts in 2h
      (3L, 2L, t0, "view"),                               // never converts
      (4L, 3L, h(1), "purchase"), (5L, 3L, h(3), "view"), // purchase BEFORE view
      (6L, 4L, t0, "click")                               // no view at all
    ).toDF("event_id", "user_id", "ts", "event_type")
    val u = ev.groupBy($"user_id").agg(
      min(when($"event_type" === "view", $"ts")).as("fv"),
      min(when($"event_type" === "purchase", $"ts")).as("fp"))
    val c = u.where($"fv".isNotNull)
      .select(when($"fp" > $"fv",
        (unix_micros($"fp") - unix_micros($"fv")) / lit(3600000000.0))
        .as("delta_h"))
    val r = c.agg(count(lit(1)).cast("long"), count($"delta_h").cast("long"),
        round(percentile($"delta_h", lit(0.5)), 6))
      .as[(Long, Long, Double)].head()
    // users 1,2,3 have a view; only user 1 converts (user 3's purchase
    // precedes their view and must NOT count); median of {2.0} = 2.0
    assert(r == ((3L, 1L, 2.0)), r.toString)
  }

  test("q167 sweep counts are monotone non-increasing in the threshold") {
    val rows = SparkEntry.queries("q167_threshold_sweep")(
        spark, "/root/testdata/sf0.001")
      .select($"threshold", $"n_pairs").as[(Double, Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(0.3, 0.5, 0.7, 0.9))
    assert(rows.sliding(2).forall(p => p.head._2 >= p.last._2), rows.toString)
  }

  test("q164 degree-share column sums to 1") {
    val fr = SparkEntry.queries("q164_degree_dist")(
        spark, "/root/testdata/sf0.001")
      .agg(sum($"node_frac")).as[Double].head()
    assert(math.abs(fr - 1.0) < 1e-6, fr.toString)
  }
}
