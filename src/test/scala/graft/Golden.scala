package graft

import org.apache.spark.sql.DataFrame

/** Golden-file machinery for the queries the DuckDB oracle cannot express
  * (LSH banding, simhash, winnowing, ANN probes — xxhash64 and the seeded
  * hyperplanes have no DuckDB equivalent). These queries are fully
  * deterministic (fixed seeds, order-independent aggregates, total ORDER
  * BY), so their sf0.01 outputs are committed verbatim and any hash-level
  * regression breaks `sbt test` — not just the driver's rows-only check.
  *
  * q38 (approx sketches) joined the golden set in round 5: its quantile
  * side moved from insertion-order-sensitive `percentile_approx` to the
  * merge-order-independent DDSketch (ops.Sketches), and its HLL side
  * merges register-wise max — both pure functions of the data multiset,
  * so the output is stable under any partitioning. The error-bound spec
  * in OpsSpec still covers accuracy.
  */
object Golden {
  /** no-oracle queries with deterministic output, checked against
    * committed sf0.01 golden files. */
  val queries: Seq[String] = Seq(
    "q25_minhash_pairs", "q26_simhash_pairs", "q28_knn_lsh",
    "q29_winnow_fp", "q32_embed_neardup", "q38_approx_sketches",
    "q41_knn_ivf", "q45_embed_clusters", "q47_sketch_rollup",
    "q73_knn_ivfpq", "q74_knn_ivf_saved", "q79_quality_classifier",
    "q82_image_dhash", "q83_bpe_vocab", "q84_audio_fp",
    "q85_video_frame_hashes", "q87_semdedup", "q88_bpe_encode",
    "q98_ppl_buckets_scaled", "q105_fertility", "q111_ann_recall",
    "q125_compress_ratio", "q137_pca_components", "q140_anisotropy_removal",
    "q142_kmeans", "q148_kmeans_margin", "q152_multiprobe_recall",
    "q153_ivf_retrieval_eval")

  val sfDir = "/root/testdata/sf0.01"

  /** Canonical text form: header + tab-separated rows in the query's own
    * (total) ORDER BY, doubles via Double.toString (bit-exact). */
  def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.toSeq
    val rows = df.collect().map { r =>
      cols.indices.map { i =>
        if (r.isNullAt(i)) "NULL"
        else r.get(i) match {
          case d: java.lang.Double => java.lang.Double.toString(d)
          case f: java.lang.Float  => java.lang.Float.toString(f)
          case x                   => x.toString
        }
      }.mkString("\t")
    }.toSeq
    cols.mkString("\t") +: rows
  }
}

/** Regenerate the committed golden files after an INTENDED output change:
  * `sbt "Test/runMain graft.GoldenGen"` — then review the diff like any
  * other code change. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "src/test/resources/golden")
    java.nio.file.Files.createDirectories(outDir)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Golden.queries.foreach { name =>
      val lines = Golden.canon(SparkEntry.queries(name)(spark, Golden.sfDir))
      java.nio.file.Files.write(outDir.resolve(s"$name.tsv"),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      println(s"[golden] wrote $name: ${lines.size - 1} rows")
    }
    spark.stop()
  }
}
