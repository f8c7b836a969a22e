package graft

/** Wave-51 cross-checks (queries live in Wave48Queries.scala): the
  * estimate audit's actual-count identity, the sortedness audit
  * against a literal sequential walk, and the fan-out audit against
  * the materialized join. */
class Wave48Spec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q317 actual_rows ≡ materialized join count; est exact on 1:N keys") {
    val actual = Tables.lineitem(spark, sf).select($"l_orderkey")
      .join(Tables.orders(spark, sf).select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey").count()
    val row = q("q317_join_estimate_audit")
      .select("actual_rows", "est_rows", "rel_err")
      .as[(Long, Long, Double)].collect().head
    assert(row._1 == actual, s"actual ${row._1} vs $actual")
    // orderkey is the orders PK: d_R = |R| per bucket, so the uniform
    // estimate nl·no/max(dl,dx) = nl exactly — rel_err must be 0
    assert(row._2 == row._1 && row._3 == 0.0,
      s"PK-join estimate should be exact: $row")
  }

  test("q318 sortedness ≡ literal per-block sequential walk") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts").as[(Long, java.sql.Timestamp)].collect()
      .sortBy(_._1)
    val blocks = ev.groupBy(e => e._1 / 256).values.map(_.sortBy(_._1))
    val pairs = blocks.map(b => b.length - 1).sum
    val breaks = blocks.map(_.sliding(2).count(w =>
      w.length == 2 && w(1)._2.getTime < w(0)._2.getTime)).sum
    val got = q("q318_sortedness_audit")
      .select("n_events", "in_order_frac", "n_runs", "mean_run_length")
      .as[(Long, Double, Long, Double)].collect().head
    assert(got._1 == ev.length.toLong)
    assert(got._3 == (breaks + blocks.size).toLong,
      s"runs ${got._3} vs ${breaks + blocks.size}")
    assert(math.abs(got._2 - (pairs - breaks).toDouble / pairs) < 1e-6)
  }

  test("q319 out_rows ≡ materialized join count; max ≡ hottest key") {
    val joined = Tables.events(spark, sf).select($"user_id")
      .join(Tables.customer(spark, sf).select($"c_custkey".as("user_id")),
        Seq("user_id"))
    val outRows = joined.count()
    val hottest = joined.groupBy("user_id").count()
      .agg(org.apache.spark.sql.functions.max("count"))
      .as[Long].collect().head
    val got = q("q319_join_fanout_audit")
      .select("out_rows", "max_fanout", "p50_fanout", "p99_fanout")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._1 == outRows, s"out_rows ${got._1} vs $outRows")
    assert(got._2 == hottest, s"max_fanout ${got._2} vs $hottest")
    assert(got._3 <= got._4 && got._4 <= got._2, "quantile ordering")
  }
}
