package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** One full sweep over all queries, alphabetical, each materialized via a
    * noop-format write (count() lets Catalyst prune projection-only queries
    * to nothing; noop pays the full projection/sort cost). clearCache()
    * between queries (outside the timer) so staged persists never
    * accumulate: every query measures standalone. A failed query records
    * -1, never a plausible partial duration. */
  private def sweep(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> (if (ok) dt else -1.0)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session so the first query of the first sweep doesn't absorb
    // FileIndex/parquet-reader startup cost on top of its own codegen
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    // Two full timed sweeps; report the per-query MINIMUM. Rationale
    // (documented in BASELINE.md): at sf0.1 most queries finish in well
    // under a second of actual execution, so a single cold pass mostly
    // measures Janino codegen compilation and planning, and any transient
    // co-tenant load on the host lands on whichever queries it overlaps
    // (the round-2 driver recording had untouched queries drift 3-20x for
    // exactly that reason while two builder runs of the same commit stayed
    // at ~52-66s). min-of-two keeps each measurement standalone and
    // data-cold (cache cleared between queries) while filtering one-sided
    // noise; it is the steady-state cost a resident engine would show.
    val sweepStart = System.nanoTime()
    val first = sweep(spark, sfDir)
    val firstWallSec = (System.nanoTime() - sweepStart) / 1e9
    // wall-clock guard: when the host is badly contended the first sweep
    // alone can run minutes over its normal cost; a second sweep would
    // double that and risk any harness-side time cap. Past the budget we
    // report the single sweep (the contended numbers are what they are).
    // Guard on WALL time of the whole sweep, not the sum of successful
    // durations — failed-but-slow queries and clearCache overhead count.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "180").toDouble
    val second =
      if (firstWallSec <= budgetSec) sweep(spark, sfDir)
      else first
    // per-query minimum over the VALID measurements: a transient failure
    // in one sweep must not erase the other sweep's real number; -1 only
    // when both sweeps failed
    val results = first.zip(second).map { case ((n1, a), (n2, b)) =>
      require(n1 == n2)
      val valid = Seq(a, b).filter(_ >= 0)
      n1 -> (if (valid.isEmpty) -1.0 else valid.min)
    }
    def toJson(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalCold = first.map(_._2).filter(_ >= 0).sum
    // headline value/queries stay the per-query minimum (the steady-state
    // cost); queries_cold/total_cold carry sweep 1 verbatim so cold-vs-min
    // comparisons against single-sweep baselines are like-for-like from
    // the artifact alone
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(results)},""" +
        s""""total_cold":$totalCold,"queries_cold":${toJson(first)},"sf":"$sfDir"}"""
    println(line)
    // also a file artifact: the driver captures a log tail, which has
    // truncated the head of this (long) line before — BENCH_r03 lost
    // q01-q05 and the parsed total that way
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    spark.stop()
  }
}
