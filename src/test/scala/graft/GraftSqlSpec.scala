package graft

/** The SQL surface: every table reachable as a view, native functions
  * callable from SQL, and SQL results identical to the DataFrame API
  * (same Catalyst plans underneath). */
class GraftSqlSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("views + native functions are reachable through spark.sql") {
    GraftSql.registerViews(spark, sf)
    // all tables registered and readable (events via the nanos handling)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1L, s"view $t")
    }
    // a join + aggregate in SQL equals the DataFrame formulation
    val sqlRes = spark.sql(
      """SELECT n.n_name, count(*) AS n_cust
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin).collect()
    val dfRes = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_cust"))
      .orderBy($"n_name").collect()
    assert(sqlRes.toSeq == dfRes.toSeq)
    // native expressions work from SQL
    val dot = spark.sql(
      "SELECT array_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS d " +
        "FROM embeddings WHERE vec_id = 0").as[Double].head()
    assert(dot > 0.0)
    val top = spark.sql(
      "SELECT array_top_count(array('a','b','a','a')) AS c").as[Int].head()
    assert(top == 3)
    val sigs = spark.sql(
      "SELECT minhash_sigs(array('x y z'), 4) AS s").as[Seq[Long]].head()
    assert(sigs.length == 4)
  }

  test("persisted stores are reachable through spark.sql views") {
    GraftSql.registerStores(spark, sf)
    // the pair view IS the store content: θ≥0.3 scored pairs
    val pairRows = spark.sql(
      "SELECT count(*) FROM graft_pairs WHERE jaccard >= 0.3")
      .as[Long].head()
    assert(pairRows > 0L, "pair store view is empty")
    assert(spark.sql(
      "SELECT count(*) FROM graft_pairs WHERE jaccard < 0.3")
      .as[Long].head() == 0L, "pair view leaked sub-threshold rows")
    // SQL over both views: every cluster member pair scores ≥ the
    // clustering threshold OR is transitively connected (spot-check:
    // cluster view nonempty and ids resolve against documents)
    val clustered = spark.sql(
      """SELECT count(*) FROM graft_clusters gc
        |JOIN documents d ON gc.doc_id = d.doc_id""".stripMargin)
      .as[Long].head()
    assert(clustered > 0L, "cluster store view empty or ids unresolvable")
  }
}
