package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Similarity, Staged, Text}

/** Dev-only stage profiler for pipeline hot spots (not part of any
  * gate): times the building blocks of a query in isolation so a
  * regression can be attributed to a stage instead of guessed at.
  * Edit the body for the investigation at hand; keep the committed
  * version pointed at the most recent frontier (currently round-16:
  * q152's arm decomposition + staging the prepared embedding frame
  * that four of its subtrees re-derive). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "32768"))
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
    def clear(): Unit = { Staged.releaseAll(); spark.catalog.clearCache() }

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/documents.parquet").count()

    def q152Of(stageE: Boolean): DataFrame = {
      val e0 = Similarity.prepared(Tables.embeddings(spark, dir), "vec_id", "embedding")
      val e = if (stageE) Staged(e0) else e0
      val qs = e.where($"id" < 50)
      val bf = Similarity.knnBruteForce(qs, e, k = 5)
        .select($"query_id", $"neighbor_id")
      val cand =
        Similarity.knnLsh(qs, e, k = 5, h = 8)
          .select(lit("single").as("probe_mode"), $"query_id", $"neighbor_id")
          .unionByName(
            Similarity.knnLshBanded(qs, e, k = 5, targetRecall = 0.7)
              .select(lit("multi").as("probe_mode"), $"query_id", $"neighbor_id"))
      val hits = cand.join(bf, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy($"probe_mode", $"query_id").agg(count(lit(1)).as("n_hit"))
      qs.select($"id".as("query_id"),
          explode(array(lit("single"), lit("multi"))).as("probe_mode"))
        .join(hits, Seq("probe_mode", "query_id"), "left")
        .groupBy($"probe_mode")
        .agg(round(sum(round(coalesce($"n_hit", lit(0L)) / 5.0, 9)
            .cast("decimal(28,12)")).cast("double") / count(lit(1)), 9)
          .as("mean_recall_at_5"))
        .orderBy($"probe_mode")
    }

    // value identity for the staged variant
    val base = q152Of(false).collect().map(_.toString).sorted; clear()
    val got = q152Of(true).collect().map(_.toString).sorted; clear()
    println(s"[probe] q152 stagedE identity: ${base.sameElements(got)}")

    // component decomposition (unstaged)
    def comps(): Unit = {
      val e = Similarity.prepared(Tables.embeddings(spark, dir), "vec_id", "embedding")
      val qs = e.where($"id" < 50)
      time("  bf truth")(noop(Similarity.knnBruteForce(qs, e, 5))); clear()
      val e2 = Similarity.prepared(Tables.embeddings(spark, dir), "vec_id", "embedding")
      val qs2 = e2.where($"id" < 50)
      time("  single arm")(noop(Similarity.knnLsh(qs2, e2, 5, 8))); clear()
      val e3 = Similarity.prepared(Tables.embeddings(spark, dir), "vec_id", "embedding")
      val qs3 = e3.where($"id" < 50)
      time("  banded arm")(noop(Similarity.knnLshBanded(qs3, e3, 5, 0.7))); clear()
    }
    comps(); comps()

    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    noop(q152Of(false)); clear(); noop(q152Of(true)); clear()
    for (i <- 1 to 5) {
      a += time(s"q152 plain  #$i")(noop(q152Of(false))); clear()
      b += time(s"q152 stagedE#$i")(noop(q152Of(true))); clear()
    }
    println(f"[probe] q152 plain   min=${a.min}%.2f median=${a.sorted.apply(2)}%.2f")
    println(f"[probe] q152 stagedE min=${b.min}%.2f median=${b.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
