package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline. The query set is
  *    broadcast (it is small by construction); candidates stream through
  *    map-side, so the only shuffle is the final per-query top-k. At
  *    100 TB of candidates this is a single scan.
  *  - random-hyperplane LSH — the scale path: 2^h sign-buckets; queries
  *    and candidates join on bucket id, exact cosine re-ranks within the
  *    bucket. Trades recall for a bucket-bounded join.
  *
  * Dot products use `zip_with`+`aggregate` higher-order functions
  * (codegen'd, no UDF) over double-cast arrays.
  */
object Similarity {

  /** Dot product of two array<double> columns via the library's native
    * codegen'd expression (graft.functions.ArrayDotProduct) — requires
    * [[graft.functions.GraftFunctions.register]] on the session, which
    * every DataFrame entry point below performs. Same left-fold result as
    * [[dotHof]]. */
  def dot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  /** Built-ins-only fallback: higher-order-function fold (allocates an
    * intermediate array and dispatches a lambda per element — kept for
    * cross-checking the native expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Project an embedding table to (id, double-cast embedding, norm). */
  def prepared(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val emb = col(embCol).cast("array<double>")
    df.select(col(idCol).as("id"), emb.as("emb"), l2Norm(emb).as("norm"))
  }

  /** Shared re-rank tail: score each (query, candidate) pair by cosine and
    * keep the per-query top-k with a deterministic tie-break. */
  private def rerank(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined.withColumn("cosine",
      cosine($"q_emb", $"c_emb", $"q_norm", $"c_norm"))
    Windows.topNPerGroup(scored, Seq($"query_id"), Seq($"cosine".desc, $"neighbor_id"), k)
      .select($"query_id", $"neighbor_id", $"cosine", $"rn".as("rank"))
  }

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * candidates (excluding itself). Queries are broadcast; the join is a
    * BroadcastNestedLoopJoin over the candidate scan, then a per-query
    * top-k window. */
  def knnBruteForce(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select($"id".as("query_id"), $"emb".as("q_emb"), $"norm".as("q_norm"))
    val c = candidates.select($"id".as("neighbor_id"), $"emb".as("c_emb"), $"norm".as("c_norm"))
    rerank(c.join(broadcast(q), $"query_id" =!= $"neighbor_id"), k)
  }

  /** Deterministic pseudo-random hyperplanes: `h` × `dim` doubles in
    * [-0.5, 0.5), derived from a seeded xorshift so runs are reproducible
    * with no RNG state. */
  def hyperplanes(h: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(h, dim)(next())
  }

  /** Sign-bucket code: bit i = (emb · plane_i > 0). */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, typedLit(p.toSeq)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates considered only within the query's LSH
    * bucket, exact cosine re-rank inside. Recall < 1 by design; `h`
    * controls the bucket granularity (2^h buckets). */
  def knnLsh(queries: DataFrame, candidates: DataFrame, k: Int, h: Int = 8): DataFrame = {
    val dim = 64
    val planes = hyperplanes(h, dim)
    val q = queries.select($"id".as("query_id"), $"emb".as("q_emb"), $"norm".as("q_norm"),
      lshBucket($"emb", planes).as("bucket"))
    val c = candidates.select($"id".as("neighbor_id"), $"emb".as("c_emb"), $"norm".as("c_norm"),
      lshBucket($"emb", planes).as("bucket"))
    rerank(c.join(broadcast(q), Seq("bucket")).where($"query_id" =!= $"neighbor_id"), k)
  }

  /** IVF (inverted-file) approximate kNN — the classic ANN scale path:
    * a k-means coarse quantizer partitions candidates into `nCells`
    * Voronoi cells; each query probes its `nProbe` nearest cells and
    * re-ranks exactly (cosine) inside them. Search cost drops from
    * O(|candidates|) to O(nProbe/nCells · |candidates|) per query, and
    * the cell assignment is a plain equi-join key — shuffle-friendly at
    * 100 TB. Deterministic via the fixed k-means seed. */
  def knnIvf(queries: DataFrame, candidates: DataFrame, k: Int,
             nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // euclidean k-means over L2-NORMALIZED vectors: on the unit sphere,
    // squared euclidean distance is 2 − 2·cosine, so the quantizer
    // partitions by the same metric the re-rank uses (clustering raw
    // magnitudes would put same-direction vectors in different cells)
    val unit = transform($"emb", (x: Column) => x / $"norm")
    val cand = candidates.withColumn("fv", array_to_vector(unit))
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(cand)
    val assigned = model.transform(cand).drop("fv")
      .select($"id".as("neighbor_id"), $"emb".as("c_emb"), $"norm".as("c_norm"), $"cell")
    // (centroid, ‖centroid‖²) baked into the literal — driver-side
    // constants, not recomputed per exploded row
    val centers = typedLit(model.clusterCenters.map { c =>
      val a = c.toArray.toSeq
      (a, a.map(x => x * x).sum)
    }.toSeq)
    // nProbe nearest cells per unit-query by squared euclidean distance
    // (‖q̂‖² = 1 is constant, so rank by ‖c‖² − 2·q̂·c)
    val probed = Windows.topNPerGroup(
        queries.select($"id".as("query_id"), $"emb".as("q_emb"), $"norm".as("q_norm"))
          .select($"*", posexplode(centers).as(Seq("cell", "centroid")))
          .withColumn("dist_rank",
            $"centroid._2" - lit(2.0) * dot(transform($"q_emb", (x: Column) => x / $"q_norm"),
              $"centroid._1")),
        Seq($"query_id"), Seq($"dist_rank".asc, $"cell"), nProbe)
      .select($"query_id", $"q_emb", $"q_norm", $"cell")
    // broadcast the (queries × nProbe)-row probed side: 'cell' has only
    // nCells distinct values, so a shuffled join would hash the entire
    // candidate table into ≤ nCells reducers
    rerank(assigned.join(broadcast(probed), Seq("cell"))
      .where($"query_id" =!= $"neighbor_id"), k)
  }

  /** Embedding near-duplicate pairs: LSH-bucketed candidate generation,
    * exact cosine threshold filter. The scalable analog of an all-pairs
    * cosine join. */
  def nearDupPairs(df: DataFrame, minCosine: Double, h: Int = 6): DataFrame = {
    val planes = hyperplanes(h, 64)
    val withBucket = df.withColumn("bucket", lshBucket($"emb", planes))
    val a = withBucket.select($"id".as("id_a"), $"emb".as("emb_a"), $"norm".as("norm_a"), $"bucket")
    val b = withBucket.select($"id".as("id_b"), $"emb".as("emb_b"), $"norm".as("norm_b"), $"bucket")
    a.join(b, Seq("bucket"))
      .where($"id_a" < $"id_b")
      .withColumn("cosine", cosine($"emb_a", $"emb_b", $"norm_a", $"norm_b"))
      .where($"cosine" >= minCosine)
      .select($"id_a", $"id_b", $"cosine")
      .dropDuplicates("id_a", "id_b")
  }
}
