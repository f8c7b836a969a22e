package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session so the first measured query doesn't absorb startup
    // cost: one scan (FileIndex/parquet reader JIT) plus one full run of
    // the first-alphabetical query — the latter exercises Janino codegen
    // compilation, the two-phase HashAggregate path, and the noop sink,
    // which a bare count() leaves cold (measured ~2s of q01's first-run
    // time was aggregate-codegen warmup, not query work)
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries.get("q01_pricing_summary")
        .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => }
    // noop write, not count(): count() lets Catalyst prune every column
    // and skip the projections/sorts, under-measuring projection-heavy
    // queries; the noop sink materializes the full result. A failed query
    // records -1 (not a plausible-looking partial duration).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that stage frames (persist) would otherwise accumulate
      // cache across the run: later queries get nondeterministic hits and
      // the tail of the run measures under memory pressure (the round-1
      // last-query blowup pattern). Clearing between queries makes every
      // measurement standalone; the clear itself is outside the timer.
      spark.catalog.clearCache()
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
