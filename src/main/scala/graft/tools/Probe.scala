package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only stage profiler for pipeline hot spots (not part of any
  * gate): times the building blocks of a query in isolation so a
  * regression can be attributed to a stage instead of guessed at.
  * Edit the body for the investigation at hand; keep the committed
  * version pointed at the most recent frontier (currently round-15
  * A/B harness: old vs new formulation of the query under
  * investigation, interleaved in one JVM so bursty host noise
  * cancels). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-40s $dt%7.2f s")
      dt
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/orders.parquet").count()

    // OLD q310 form (pre-r15): un-repartitioned stream side.
    def oldQ310(s: SparkSession, d: String): DataFrame = {
      val day = Tables.orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(round(sum(round($"o_totalprice" * 100, 0).cast("long")) / 100.0, 2)
          .as("r"))
        .select(datediff($"day", lit("1995-01-01").cast("date")).cast("long")
          .as("t"), $"r")
        .transform(graft.ops.Staged(_))
      val slopes = day.as("a").join(day.as("b"), $"a.t" < $"b.t")
        .select(floor((($"b.r" - $"a.r") / ($"b.t" - $"a.t")) * 100)
          .cast("long").as("sl"))
        .withColumn("bkt", floor($"sl" / 100000.0).cast("long"))
        .transform(graft.ops.Staged(_))
      val bhist = slopes.groupBy($"bkt").agg(count(lit(1)).cast("long").as("c"))
      val locate = bhist
        .withColumn("cum", sum($"c").over(Window.orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(bhist.agg(sum($"c").cast("long").as("np"))))
        .where($"cum" >= floor(($"np" + 1) / 2).cast("long"))
        .agg(min(struct($"bkt", ($"cum" - $"c").as("before"), $"np")).as("m"))
        .select($"m.bkt".as("mb"), $"m.before".as("before"), $"m.np".as("np"))
      val med = slopes.join(broadcast(locate), $"bkt" === $"mb")
        .groupBy($"sl", $"before", $"np")
        .agg(count(lit(1)).cast("long").as("c"))
        .withColumn("cum", $"before" + sum($"c").over(Window.orderBy($"sl")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .agg(max($"np").as("n_pairs"),
          (min(when($"cum" >= floor(($"np" + 1) / 2).cast("long"), $"sl")) /
            lit(100.0)).as("theil_sen_slope"))
      val ols = day.agg(count(lit(1)).cast("double").as("n"),
          sum($"t".cast("decimal(28,0)")).cast("double").as("sx"),
          sum(($"t" * $"t").cast("decimal(38,0)")).cast("double").as("sxx"),
          sum($"r".cast("decimal(28,2)")).cast("double").as("sy"),
          sum(round($"t" * $"r", 2).cast("decimal(38,2)")).cast("double")
            .as("sxy"))
        .select($"n".cast("long").as("n_days"),
          round(($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("ols_slope"))
      med.crossJoin(broadcast(ols))
        .select($"n_days", $"n_pairs", $"theil_sen_slope", $"ols_slope")
    }

    val newQ = graft.SparkEntry.queries("q310_theilsen_trend")
    noop(oldQ310(spark, dir)); graft.ops.Staged.releaseAll(); spark.catalog.clearCache()
    noop(newQ(spark, dir)); graft.ops.Staged.releaseAll(); spark.catalog.clearCache()
    val oldT = collection.mutable.ArrayBuffer[Double]()
    val newT = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to 5) {
      oldT += time(s"old q310 #$i")(noop(oldQ310(spark, dir)))
      graft.ops.Staged.releaseAll(); spark.catalog.clearCache()
      newT += time(s"new q310 #$i")(noop(newQ(spark, dir)))
      graft.ops.Staged.releaseAll(); spark.catalog.clearCache()
    }
    println(f"[probe] old min=${oldT.min}%.2f median=${oldT.sorted.apply(2)}%.2f")
    println(f"[probe] new min=${newT.min}%.2f median=${newT.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
