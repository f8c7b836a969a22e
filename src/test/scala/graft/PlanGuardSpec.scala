package graft

/** Scale-shape regression gate: builds the physical plan of EVERY query
  * in the driver surface and rejects unbounded join shapes. A
  * CartesianProduct anywhere, or a BroadcastNestedLoopJoin outside the
  * explicit whitelist below, means a candidate-generation rewrite
  * regressed to all-pairs — the one plan family that cannot survive a
  * 100 TB input no matter how the cluster is sized. */
class PlanGuardSpec extends SparkSuite {

  /** Queries whose BroadcastNestedLoopJoin is intentional and bounded:
    * a deliberately-broadcast small side (query vectors in brute-force
    * kNN) or a 1-row aggregate attached by cross join (corpus size N in
    * TF-IDF). The broadcast side's size bounds the work per row — these
    * are linear scans, not quadratic blowups. */
  private val allowBnlj = Set(
    "q27_knn_cosine",   // candidates × broadcast(query vectors), k queries
    "q57_tfidf_terms")  // term frame × broadcast(1-row corpus count)

  test("no query plans a CartesianProduct; BNLJ only where whitelisted") {
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !allowBnlj(name)
      if (cart || bnlj)
        Some(s"$name: ${if (cart) "CartesianProduct" else "unexpected BroadcastNestedLoopJoin"}")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("q02's time bound reaches the parquet scan as a pushed filter") {
    // the raw-nanos predicate (Tables.eventsFrom) must appear in
    // PushedFilters — a regression here turns a row-group-pruned read
    // into a full scan, the difference between a day and 100 TB
    val plan = SparkEntry.queries("q02_event_filter")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts,.*"),
      s"expected a pushed ts lower bound, plan:\n${plan.take(2000)}")
  }
}
