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
}
