package graft

import org.apache.spark.sql.DataFrame

/** Golden-file machinery for the queries the DuckDB oracle cannot express
  * (LSH banding, simhash, winnowing, ANN probes — xxhash64 and the seeded
  * hyperplanes have no DuckDB equivalent). These queries are fully
  * deterministic (fixed seeds, order-independent aggregates, total ORDER
  * BY), so their sf0.01 outputs are committed verbatim and any hash-level
  * regression breaks `sbt test` — not just the driver's rows-only check.
  *
  * Lives in `src/main` (not test) because [[Verify]] ALSO surfaces these
  * checks to the driver: for every name here it emits an oracle SQL that
  * reads the committed golden TSV back through DuckDB (`read_csv` with
  * the result's exact column types), so the driver's correctness
  * artifact records a genuine value-level check for all queries instead
  * of 28 `no_oracle` gaps that were only covered inside `sbt test`.
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
    "q153_ivf_retrieval_eval", "q194_pca_saved", "q195_kmeans_saved",
    "q196_kmeans_label_profile", "q207_lsh_eval", "q208_pq_distortion",
    "q209_ivf_cell_balance", "q228_minhash_calibration",
    "q240_lsh_band_sweep")

  val sfDir = "/root/testdata/sf0.01"

  /** The committed golden directory, as an absolute path (the oracle SQL
    * embeds it, and the driver's DuckDB runs from an unknown cwd).
    * Resolution order: `SPARK_GRAFT_GOLDEN_DIR`, then the repo-relative
    * default against the JVM's cwd — with a FAIL-LOUD existence check,
    * because an oracle SQL pointing at a nonexistent TSV (Verify
    * launched from the wrong directory) would otherwise surface as 34
    * baffling driver-side read_csv failures instead of one clear
    * message at dump time. */
  def goldenDir: String = {
    val dir = sys.env.get("SPARK_GRAFT_GOLDEN_DIR")
      .map(new java.io.File(_))
      .getOrElse(new java.io.File("src/test/resources/golden"))
    require(dir.isDirectory && new java.io.File(dir, s"${queries.head}.tsv").isFile,
      s"golden directory ${dir.getAbsolutePath} is missing or has no " +
        s"${queries.head}.tsv — run from the repo root or set " +
        "SPARK_GRAFT_GOLDEN_DIR to the checkout's src/test/resources/golden")
    dir.getAbsolutePath
  }

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

  /** DuckDB oracle SQL for a golden query: read the committed TSV back
    * with the Spark result's EXACT column types, so the driver's
    * value-level compare (columns sorted by name, exact equality) runs
    * against the same pinned output `sbt test` enforces. Types matter —
    * `read_csv` auto-detection would hand back e.g. BIGINT for an int32
    * column and fail the schema leg — so each column is declared from
    * the result schema and unsupported types fail loud at dump time
    * (never a silently-wrong oracle). The TSV dialect is [[canon]]'s:
    * header row, literal tabs, no quoting (`quote=''`), `NULL` for
    * nulls; doubles round-trip bit-exactly because Double.toString is
    * shortest-round-trip. */
  def oracleSql(name: String, schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types._
    val cols = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType    => "BIGINT"
        case IntegerType => "INTEGER"
        case DoubleType  => "DOUBLE"
        case FloatType   => "FLOAT"
        case StringType  => "VARCHAR"
        case BooleanType => "BOOLEAN"
        case DateType    => "DATE"
        case other => sys.error(
          s"golden oracle $name.${f.name}: no TSV round-trip mapping for " +
            s"$other — add one (and prove the text form parses back " +
            "bit-exactly) before shipping this column")
      }
      s"'${f.name}': '$t'"
    }.mkString("{", ", ", "}")
    s"SELECT * FROM read_csv('$goldenDir/$name.tsv', header=true, " +
      s"delim='\t', quote='', escape='', nullstr='NULL', columns=$cols)"
  }
}
