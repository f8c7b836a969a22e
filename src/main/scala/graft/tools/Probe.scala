package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Text

/** Dev-only stage profiler for pipeline hot spots (not part of any
  * gate): times the building blocks of a query in isolation so a
  * regression can be attributed to a stage instead of guessed at.
  * Edit the body for the investigation at hand; keep the committed
  * version pointed at the most recent frontier (currently q29's
  * winnow fingerprint growth). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (_ <- 1 to 2) {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      time("docs count")(docs.count())
      val fps = Text.winnowFingerprintRows(docs, "doc_id", "text")
      time("fps explode (no sort)")(
        fps.write.format("noop").mode("overwrite").save())
      time("fps + total orderBy")(
        fps.orderBy($"doc_id", $"fp")
          .write.format("noop").mode("overwrite").save())
      val rep = Text.winnowFingerprintRows(
        docs.repartition(col("doc_id")), "doc_id", "text")
      time("repartitioned fps (no sort)")(
        rep.write.format("noop").mode("overwrite").save())
      time("repartitioned fps + orderBy")(
        rep.orderBy($"doc_id", $"fp")
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
