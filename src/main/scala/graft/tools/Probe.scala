package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Funnel, Graph, Staged, Text}

/** Dev-only stage profiler for pipeline hot spots (not part of any
  * gate): times the building blocks of a query in isolation so a
  * regression can be attributed to a stage instead of guessed at.
  * Edit the body for the investigation at hand; keep the committed
  * version pointed at the most recent frontier (currently round-16:
  * per-round materialization strategy of the iterative graph family —
  * eager checkpoint per round vs broadcast-hinted rounds vs a fully
  * lazy unrolled plan over checkpointed leaves). */
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

    val tmpl16 = "template header boilerplate nav sidebar footer " +
      "promo banner subscribe follow share like comment related trending latest"
    def plantedDocs(s: SparkSession, d: String): DataFrame =
      Tables.documents(s, d).select($"doc_id",
        when($"doc_id" % 11 === 0, concat(lit(tmpl16 + " "), $"text"))
          .otherwise($"text").as("text"))
    def edgesOf: DataFrame =
      Dedup.rareTilePairs(plantedDocs(spark, dir), "doc_id", "text", k = 8,
        maxDf = 64, minShared = 2, tileKey = c => md5(c))

    val D = "decimal(28,12)"

    // bcast: per-round joins take broadcast hints; ckpt: materialize
    // every `ckptEvery` rounds (0 = never, final frame stays lazy too).
    def pageRankV(edges: DataFrame, iters: Int, damping: Double,
                  bcast: Boolean, ckptEvery: Int): DataFrame = {
      def h(df: DataFrame) = if (bcast) broadcast(df) else df
      val e = edges.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .localCheckpoint(true)
      val eo = e.join(
          e.groupBy($"src").agg(count(lit(1)).cast("long").as("outdeg")),
          Seq("src"))
        .localCheckpoint(true)
      val nodes = e.select($"src".as("node"))
        .union(e.select($"dst".as("node"))).distinct()
      val nRow = nodes.agg(count(lit(1)).cast("long").as("__n"))
      val nodesN = nodes.crossJoin(broadcast(nRow)).localCheckpoint(true)
      var pr = nodesN.select($"node", (lit(1.0) / $"__n").as("pr"))
      for (i <- 1 to iters) {
        val inw = eo.join(h(pr.select($"node".as("src"), $"pr")), Seq("src"))
          .select($"dst", round($"pr" / $"outdeg", 12).as("w"))
          .groupBy($"dst")
          .agg(sum($"w".cast(D)).cast("double").as("inw"))
        val next = nodesN
          .join(h(inw.select($"dst".as("node"), $"inw")), Seq("node"), "left")
          .select($"node",
            round(lit(1.0 - damping) / $"__n" +
              lit(damping) * coalesce($"inw", lit(0.0)), 12).as("pr"))
        pr = if (ckptEvery > 0 && i % ckptEvery == 0 && i < iters)
               next.localCheckpoint(true)
             else next
      }
      pr.select($"node", round($"pr", 9).as("pr"))
    }

    def q155Of(v: Int): DataFrame = {
      val pr = v match {
        case 0 => Graph.pageRank(edgesOf, "doc_a", "doc_b", 5, 0.85)
        case 1 => pageRankV(edgesOf, 5, 0.85, bcast = true, ckptEvery = 0)
        case 2 => pageRankV(edgesOf, 5, 0.85, bcast = false, ckptEvery = 0)
        case _ => pageRankV(edgesOf, 5, 0.85, bcast = true, ckptEvery = 2)
      }
      pr.orderBy($"pr".desc, $"node").limit(50)
        .select($"node".as("doc_id"), $"pr")
    }

    // ---- q186 markov variants: tiny frames, 8 rounds -------------------
    def q186Of(v: Int): DataFrame = {
      val p0 = Funnel.eventTransitions(Tables.events(spark, dir), "user_id",
          "ts", "event_id", "event_type")
        .select($"from_type", $"to_type", $"prob")
        .localCheckpoint(true)
      val st = p0.select($"from_type".as("state"))
        .union(p0.select($"to_type".as("state"))).distinct()
      val stN = st.crossJoin(broadcast(
        st.agg(count(lit(1)).cast("long").as("__n")))).localCheckpoint(true)
      var pi = stN.select($"state", (lit(1.0) / $"__n").as("pi"))
      def h(df: DataFrame) = if (v >= 1) broadcast(df) else df
      for (i <- 1 to 8) {
        val sw = p0.join(h(pi.select($"state".as("from_type"), $"pi")),
            Seq("from_type"))
          .select($"to_type", round($"pi" * $"prob", 12).as("__w"))
          .groupBy($"to_type")
          .agg(sum($"__w".cast(D)).cast("double").as("__sw"))
        val next = stN.join(h(sw.select($"to_type".as("state"), $"__sw")),
            Seq("state"), "left")
          .select($"state", round(coalesce($"__sw", lit(0.0)), 12).as("pi"))
        pi = v match {
          case 0 => next.localCheckpoint(true)          // committed shape
          case 1 => if (i % 4 == 0 && i < 8) next.localCheckpoint(true) else next
          case _ => next                                 // fully lazy rounds
        }
      }
      pi.select($"state", round($"pi", 9).as("pi")).orderBy($"state")
    }

    // value identity
    val base155 = q155Of(0).collect().map(_.toString).sorted; clear()
    for (v <- 1 to 3) {
      val rows = q155Of(v).collect().map(_.toString).sorted; clear()
      println(s"[probe] q155 v$v identity: ${base155.sameElements(rows)}")
    }
    val base186 = q186Of(0).collect().map(_.toString).sorted; clear()
    for (v <- 1 to 2) {
      val rows = q186Of(v).collect().map(_.toString).sorted; clear()
      println(s"[probe] q186 v$v identity: ${base186.sameElements(rows)}")
    }

    val t = Array.fill(4)(collection.mutable.ArrayBuffer[Double]())
    val m = Array.fill(3)(collection.mutable.ArrayBuffer[Double]())
    for (v <- 0 to 3) { noop(q155Of(v)); clear() }
    for (v <- 0 to 2) { noop(q186Of(v)); clear() }
    for (i <- 1 to 5) {
      for (v <- 0 to 3) { t(v) += time(s"q155 v$v #$i")(noop(q155Of(v))); clear() }
      for (v <- 0 to 2) { m(v) += time(s"q186 v$v #$i")(noop(q186Of(v))); clear() }
    }
    for (v <- 0 to 3)
      println(f"[probe] q155 v$v min=${t(v).min}%.2f median=${t(v).sorted.apply(2)}%.2f")
    for (v <- 0 to 2)
      println(f"[probe] q186 v$v min=${m(v).min}%.2f median=${m(v).sorted.apply(2)}%.2f")
    spark.stop()
  }
}
