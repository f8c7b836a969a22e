package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Similarity

/** FILE→WAVE MAP: Wave25Queries.scala holds round-10 WAVE-28 queries
  * q209–q211 (file numbering lags wave numbering across this package —
  * each file's header carries this map).
  *
  * Index health and classic BI: IVF cell balance (the probe-cost
  * uniformity check), a per-source charset/noise profile, and RFM
  * customer segmentation. q210/q211 are DuckDB-oracle-checked; q209 is
  * golden-pinned (Lloyd centroids have no SQL form). */
object Wave25Queries {
  type Q = (SparkSession, String) => DataFrame

  /** IVF cell-balance report: vectors per cell and the load factor vs a
    * uniform split — the check an ANN deployment runs before trusting
    * nProbe cost estimates (one hot cell makes every probe that hits it
    * scan a disproportionate candidate set). Assignment is the map-side
    * [[Similarity.assignCells]] projection; the window runs over the
    * 16-row cell frame only. */
  private val q209: Q = (s, d) => {
    import s.implicits._
    val vecs = Similarity.prepared(
      Tables.embeddings(s, d), "vec_id", "embedding")
    val idx = Similarity.buildIvfIndex(vecs, nCells = 16)
    Similarity.assignCells(vecs, idx)
      .groupBy($"cell").agg(count(lit(1)).cast("long").as("n_vectors"))
      .withColumn("load_factor",
        round($"n_vectors".cast("double") * 16.0 /
          sum($"n_vectors").over(Window.partitionBy()).cast("double"), 9))
      .orderBy($"cell")
  }

  /** Per-source charset/noise profile: digit, uppercase, space, and
    * non-printable-ASCII character fractions — the encoding-noise
    * screen that catches mojibake feeds and OCR dumps before they hit
    * tokenization. Exact integer char counts (regex class strip +
    * length diff, identical character classes both engines), one scan,
    * double fractions only at the end. */
  private val q210: Q = (s, d) => {
    import s.implicits._
    def cnt(cls: String) =
      (length($"text") - length(regexp_replace($"text", cls, ""))).cast("long")
    Tables.documents(s, d)
      .select($"source", length($"text").cast("long").as("n"),
        cnt("[0-9]").as("d"), cnt("[A-Z]").as("u"),
        cnt("[ ]").as("sp"), cnt("[^\\x20-\\x7e]").as("na"))
      .groupBy($"source")
      .agg(sum($"n").cast("long").as("n_chars"),
        round(sum($"d").cast("double") / sum($"n").cast("double"), 9)
          .as("digit_frac"),
        round(sum($"u").cast("double") / sum($"n").cast("double"), 9)
          .as("upper_frac"),
        round(sum($"sp").cast("double") / sum($"n").cast("double"), 9)
          .as("space_frac"),
        round(sum($"na").cast("double") / sum($"n").cast("double"), 9)
          .as("nonascii_frac"))
      .orderBy($"source")
  }

  /** RFM segmentation of the orders table: per customer — days since
    * last order (vs the corpus max date), order count, exact monetary
    * total — then quintile codes and the (R, F) segment rollup a
    * marketing/BI team reads. The ntile windows run over the GROUPED
    * per-customer frame (orders collapse first — the aggregate-then-
    * window shape), with custkey tie-breaks so bucket assignment is
    * total-order deterministic on both engines. */
  private val q211: Q = (s, d) => {
    import s.implicits._
    val perCust = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate".cast("date")).as("last_d"),
        count(lit(1)).cast("long").as("frequency"),
        sum(round($"o_totalprice", 2).cast("decimal(28,12)"))
          .cast("double").as("monetary"))
    val mx = broadcast(perCust.agg(max($"last_d").as("max_d")))
    val scored = perCust.crossJoin(mx)
      .select($"o_custkey", datediff($"max_d", $"last_d").as("recency_days"),
        $"frequency", $"monetary")
    val r = ntile(5).over(Window.orderBy($"recency_days", $"o_custkey"))
    val f = ntile(5).over(Window.orderBy($"frequency".desc, $"o_custkey"))
    scored.select($"o_custkey", r.as("r_bucket"), f.as("f_bucket"),
        $"monetary")
      .groupBy($"r_bucket", $"f_bucket")
      .agg(count(lit(1)).cast("long").as("n_customers"),
        round(sum($"monetary".cast("decimal(28,12)")).cast("double"), 2)
          .as("total_monetary"))
      .orderBy($"r_bucket", $"f_bucket")
  }

  val queries: Map[String, Q] = Map(
    "q209_ivf_cell_balance" -> q209,
    "q210_charset_profile" -> q210,
    "q211_rfm_segments" -> q211)

  // ---- oracle SQL -------------------------------------------------------

  val oracle: Map[String, String] = Map(
    "q210_charset_profile" ->
      """WITH c AS (SELECT source,
        |    CAST(length(text) AS BIGINT) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS BIGINT) AS d,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
        |      AS BIGINT) AS u,
        |    CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
        |      AS BIGINT) AS sp,
        |    CAST(length(text) - length(regexp_replace(text, '[^\x20-\x7e]', '', 'g'))
        |      AS BIGINT) AS na
        |  FROM documents)
        |SELECT source,
        |  CAST(sum(n) AS BIGINT) AS n_chars,
        |  round(CAST(sum(d) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 9) AS digit_frac,
        |  round(CAST(sum(u) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 9) AS upper_frac,
        |  round(CAST(sum(sp) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 9) AS space_frac,
        |  round(CAST(sum(na) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 9)
        |    AS nonascii_frac
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "q211_rfm_segments" ->
      """WITH pc AS (SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_d,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |mx AS (SELECT max(last_d) AS max_d FROM pc),
        |sc AS (SELECT o_custkey,
        |    CAST(mx.max_d - pc.last_d AS INTEGER) AS recency_days,
        |    frequency, monetary
        |  FROM pc CROSS JOIN mx),
        |b AS (SELECT o_custkey, monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS INTEGER)
        |      AS r_bucket,
        |    CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER)
        |      AS f_bucket
        |  FROM sc)
        |SELECT r_bucket, f_bucket,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  round(CAST(sum(CAST(monetary AS DECIMAL(28,12))) AS DOUBLE), 2)
        |    AS total_monetary
        |FROM b GROUP BY r_bucket, f_bucket
        |ORDER BY r_bucket, f_bucket""".stripMargin)
}
