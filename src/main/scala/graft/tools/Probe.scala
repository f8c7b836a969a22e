package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Sampling, Text}

/** Dev-only stage profiler for pipeline hot spots (not part of any
  * gate): times the building blocks of a query in isolation so a
  * regression can be attributed to a stage instead of guessed at. */
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

    val splitDefs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    for (_ <- 1 to 2) {
      val lab = Sampling.splitAssign(
          Tables.documents(spark, sfDir).select($"doc_id"), "doc_id", splitDefs)
        .select($"doc_id", $"split")
      val docs = Tables.documents(spark, sfDir).join(lab, "doc_id")
        .where($"split".isin("train", "test"))
        .select($"doc_id", $"split", $"text")
      time("docs join+filter count")(docs.count())
      val ns = Seq(4, 8, 13)
      def shFromToks(n: Int) = {
        val m = size($"toks") - (n - 1)
        val parts = (0 until n).map(i => slice($"toks", lit(i + 1), m))
        val joined = parts.reduceLeft((acc, p) =>
          zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
        when(size($"toks") >= n, joined).otherwise(array().cast("array<string>"))
      }
      val tagged = concat(ns.map(n => transform(
        array_distinct(shFromToks(n)),
        x => struct(lit(n).as("n"), xxhash64(lit(n), x).as("h")))): _*)
      val sh = docs
        .repartition(col("doc_id"))
        .select($"doc_id", $"split", Text.tokens($"text").as("toks"))
        .select($"doc_id", $"split", explode(tagged).as("g"))
        .select($"doc_id", $"split", $"g.n".as("n"), $"g.h".as("h"))
      time("merged explode count")(sh.count())
      val trainSh = sh.where($"split" === "train").select($"h").distinct()
      time("train distinct count")(trainSh.count())
      val cont = sh.where($"split" === "test")
        .join(trainSh, Seq("h"), "left_semi")
        .select($"n", $"doc_id").distinct()
        .groupBy($"n").agg(count(lit(1)).as("n_contaminated"))
      time("semi-join + rollup")(cont.collect().foreach(r => println(s"  $r")))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
