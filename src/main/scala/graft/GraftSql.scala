package graft

import org.apache.spark.sql.SparkSession

/** SQL entry point: registers every test table as a temp view (with the
  * TIMESTAMP(NANOS) handling the events table needs) and the library's
  * native functions, so the whole engine surface is reachable through
  * `spark.sql(...)` — a user can run the DataFrame queries or plain SQL
  * interchangeably (same Catalyst plans either way). */
object GraftSql {

  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Tables.all.foreach { t =>
      val df = t match {
        case "events" => Tables.events(spark, sfDir)
        case other    => Tables.load(spark, sfDir, other)
      }
      df.createOrReplaceTempView(t)
    }
  }

  /** Additionally expose the persisted derivation stores as views —
    * `graft_pairs` (doc_a, doc_b, jaccard at θ≥0.3) and
    * `graft_clusters` (doc_id, component_id at θ=0.5) — so SQL users
    * get the same read-through semantics the DataFrame surface uses
    * (first touch derives + publishes; every later session scans the
    * published parquet). Separate from [[registerViews]] because the
    * first call on a cold store pays the derivation. */
  def registerStores(spark: SparkSession, sfDir: String): Unit = {
    graft.queries.Stores.docPairs(spark, sfDir)
      .createOrReplaceTempView("graft_pairs")
    graft.queries.Stores.docClusters(spark, sfDir)
      .createOrReplaceTempView("graft_clusters")
  }
}
