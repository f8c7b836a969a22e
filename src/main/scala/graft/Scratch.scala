package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: standalone timing of the hot queries (not part of the
  * driver contract; remove or repurpose freely). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("q24_ngram_jaccard", "q42_curation")
    for (n <- names; i <- 1 to 2)
      time(s"$n#$i") {
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    // stage breakdown of the jaccard path
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docsT = graft.Tables.documents(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      time(s"shingle-explode#$i") {
        noop(docsT.select($"doc_id".as("doc"),
          explode(array_distinct(graft.ops.Text.shingles($"text", 3))).as("sh")))
      }
      time(s"postings#$i") {
        noop(docsT.select($"doc_id".as("doc"),
            explode(array_distinct(graft.ops.Text.shingles($"text", 3))).as("sh"))
          .groupBy($"sh").agg(collect_list($"doc").as("ds")))
      }
      time(s"quality-score#$i") {
        val wc = graft.ops.Text.tokenCount($"text")
        val awl = graft.ops.Text.sumTokenLen($"text") / wc
        val sr = graft.ops.Text.stopwordCount($"text") / wc
        noop(docsT.withColumn("q", graft.ops.Text.qualityScore(wc, sr, awl)).where($"q" >= 0.6))
      }
    }
    spark.stop()
  }
}
