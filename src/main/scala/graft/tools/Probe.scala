package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Text}

/** Dev-only stage profiler for pipeline hot spots (not part of any
  * gate): times the building blocks of a query in isolation so a
  * regression can be attributed to a stage instead of guessed at.
  * Edit the body for the investigation at hand; keep the committed
  * version pointed at the most recent frontier (currently round-15
  * A/B: does the tileSegments fan-out pay on the rare-tile-pair graph
  * family (q164's shape), or only on the heavy tile-dedup consumers). */
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

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/documents.parquet").count()

    val tmpl16 = "template header boilerplate nav sidebar footer " +
      "promo banner subscribe follow share like comment related trending latest"
    def plantedDocs(s: SparkSession, d: String): DataFrame =
      Tables.documents(s, d).select($"doc_id",
        when($"doc_id" % 11 === 0, concat(lit(tmpl16 + " "), $"text"))
          .otherwise($"text").as("text"))

    // pre-r15 rareTilePairs (no fan-out), inlined from public pieces
    def oldRareTilePairs(df: DataFrame, k: Int, maxDf: Int, minShared: Int,
                         tileKey: Column => Column): DataFrame = {
      val seg = df.select($"doc_id".as("doc"), Text.tokens($"text").as("t"))
        .where(size($"t") >= 1)
        .select($"doc", $"t",
          explode(sequence(lit(0), ceil(size($"t") / lit(k.toDouble)).cast("int") - 1))
            .as("pos"))
        .select($"doc", $"pos",
          concat_ws(" ", slice($"t", $"pos" * k + 1, lit(k))).as("tile"))
      val tiles = seg.select($"doc", tileKey($"tile").as("h")).distinct()
      val rare = tiles.join(
        tiles.groupBy($"h").agg(count(lit(1)).as("__df"))
          .where($"__df" <= maxDf).select($"h"),
        Seq("h"))
      rare.select($"h", $"doc".as("doc_a"))
        .join(rare.select($"h", $"doc".as("doc_b")), Seq("h"))
        .where($"doc_a" =!= $"doc_b")
        .groupBy($"doc_a", $"doc_b")
        .agg(count(lit(1)).cast("long").as("n_shared"))
        .where($"n_shared" >= minShared)
    }

    def degHist(edges: DataFrame): DataFrame = {
      val hist = edges.groupBy($"doc_a")
        .agg(count(lit(1)).cast("long").as("degree"))
        .groupBy($"degree").agg(count(lit(1)).cast("long").as("n_nodes"))
      hist.crossJoin(broadcast(
          hist.agg(sum($"n_nodes").cast("long").as("__t"))))
        .select($"degree", $"n_nodes",
          round($"n_nodes" / $"__t", 9).as("node_frac"))
        .orderBy($"degree")
    }

    // q203 A/B: staged edge list vs recomputed-per-consumer (old form,
    // inlined — identical to the committed q203 minus the Staged call)
    import graft.ops.Graph
    def q203Of(stage: Boolean)(s: SparkSession, d: String): DataFrame = {
      val docs = plantedDocs(s, d)
      val e0 = Dedup.rareTilePairs(docs, "doc_id", "text", k = 8,
        maxDf = 64, minShared = 2, tileKey = c => md5(c))
      val edges = if (stage) graft.ops.Staged(e0) else e0
      val seeds = Tables.documents(s, d).where($"doc_id" % 7 === 0)
        .select($"doc_id".as("node"), $"lang".as("label"))
      val lab = Graph.labelPropagate(edges, "doc_a", "doc_b", seeds, iters = 3)
        .select($"node", coalesce($"label",
          concat(lit("n"), $"node".cast("string"))).as("community"))
      val e2 = edges.select($"doc_a", $"doc_b")
        .join(lab.select($"node".as("doc_a"), $"community".as("ca")), Seq("doc_a"))
        .join(lab.select($"node".as("doc_b"), $"community".as("cb")), Seq("doc_b"))
      val tot = broadcast(e2.agg(count(lit(1)).cast("long").as("m2")))
      val per = e2.groupBy($"ca".as("community"))
        .agg(count(lit(1)).cast("long").as("degree_sum"),
          sum(when($"ca" === $"cb", 1L).otherwise(0L)).cast("long")
            .as("internal_edges"))
      val nn = lab.groupBy($"community").agg(count(lit(1)).cast("long").as("n_nodes"))
      per.join(nn, Seq("community")).crossJoin(tot)
        .select($"community", $"n_nodes", $"internal_edges", $"degree_sum",
          round($"internal_edges".cast("double") / $"m2".cast("double") -
            ($"degree_sum".cast("double") / $"m2".cast("double")) *
            ($"degree_sum".cast("double") / $"m2".cast("double")), 9)
            .as("modularity_term"))
        .orderBy($"community")
    }
    def clear(): Unit = { graft.ops.Staged.releaseAll(); spark.catalog.clearCache() }
    noop(q203Of(false)(spark, dir)); clear(); noop(q203Of(true)(spark, dir)); clear()
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to 5) {
      a += time(s"q203 unstaged #$i")(noop(q203Of(false)(spark, dir))); clear()
      b += time(s"q203 staged   #$i")(noop(q203Of(true)(spark, dir))); clear()
    }
    println(f"[probe] unstaged min=${a.min}%.2f median=${a.sorted.apply(2)}%.2f")
    println(f"[probe] staged   min=${b.min}%.2f median=${b.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
