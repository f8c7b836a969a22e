package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Similarity

/** Dev-only stage profiler for pipeline hot spots (not part of any
  * gate): times the building blocks of a query in isolation so a
  * regression can be attributed to a stage instead of guessed at.
  * Edit the body for the investigation at hand; keep the committed
  * version pointed at the most recent frontier (currently the
  * round-15 corpus-scaled ANN parameter derivation: recall/cost grid
  * for banded LSH and fraction-probed IVF across testdata scales). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val sfDirs = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> "/root/repo/testdata-sf1")

    for ((sf, dir) <- sfDirs) {
      val e = Similarity.prepared(Tables.embeddings(spark, dir), "vec_id", "embedding")
      val n = e.count()
      val qs = e.where($"id" < 10)
      val bf = Similarity.knnBruteForce(qs, e, k = 5)
        .select($"query_id", $"neighbor_id").cache()
      val nTruth = bf.count()
      def recall(approx: DataFrame): Double =
        bf.join(approx.select($"query_id", $"neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / nTruth

      println(s"=== $sf  n=$n ===")
      val pHat = Similarity.estimatedNeighborP(e, 5)
      println(f"[probe] $sf pHat(k=5) = $pHat%.4f")

      for (tr <- Seq(0.5, 0.7, 0.8)) {
        val prm = Similarity.bandedParams(n, pHat, tr)
        val r = time(f"$sf knnLshBanded tr=$tr (r=${prm.rows} L=${prm.tables})") {
          recall(Similarity.knnLshBanded(qs, e, k = 5, targetRecall = tr))
        }
        println(f"[probe] $sf knnLshBanded tr=$tr recall = $r%.3f")
      }

      for (frac <- Seq(0.25, 0.35, 0.45)) {
        val (cells, probe) = Similarity.ivfScaledParams(n, frac)
        val r = time(f"$sf knnIvf frac=$frac (cells=$cells probe=$probe)") {
          recall(Similarity.knnIvf(qs, e, k = 5, nCells = cells, nProbe = probe))
        }
        println(f"[probe] $sf knnIvf frac=$frac recall = $r%.3f")
      }

      for ((frac, m, kSub, refine) <- Seq(
          (0.35, 8, 16, 8), (0.35, 16, 16, 8), (0.35, 16, 32, 8),
          (0.35, 16, 32, 16), (0.45, 16, 32, 16))) {
        val (cells, probe) = Similarity.ivfScaledParams(n, frac)
        val r = time(f"$sf knnIvfPq frac=$frac m=$m kSub=$kSub refine=$refine") {
          recall(Similarity.knnIvfPq(qs, e, k = 5, nCells = cells,
            nProbe = probe, m = m, kSub = kSub, refine = refine))
        }
        println(f"[probe] $sf knnIvfPq frac=$frac m=$m kSub=$kSub refine=$refine recall = $r%.3f")
      }

      // near-dup slice recall: truth = exact pairs among id<500
      val sl = e.where($"id" < 500)
      val a = sl.select($"id".as("id_a"), $"emb".as("ea"), $"norm".as("na"))
      val b2 = sl.select($"id".as("id_b"), $"emb".as("eb"), $"norm".as("nb"))
      val truth = a.join(broadcast(b2), $"id_a" < $"id_b")
        .where(Similarity.cosine($"ea", $"eb", $"na", $"nb") >= 0.4)
        .select($"id_a", $"id_b").cache()
      val nT = truth.count()
      for (tr <- Seq(0.5, 0.7, 0.8)) {
        val pairs = time(f"$sf nearDupPairsBanded tr=$tr full corpus") {
          val p = Similarity.nearDupPairsBanded(e, minCosine = 0.4, targetRecall = tr)
          p.cache(); p.count(); p
        }
        val found = truth.join(pairs, Seq("id_a", "id_b"), "left_semi").count()
        val total = pairs.count()
        println(f"[probe] $sf nearDupBanded tr=$tr: pairs=$total sliceTruth=$nT found=$found recall=${found.toDouble / math.max(1, nT)}%.3f")
        pairs.unpersist()
      }
      bf.unpersist(); truth.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
