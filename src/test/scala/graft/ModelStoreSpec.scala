package graft

import org.apache.spark.sql.functions._
import graft.ops.{Kmeans, Pca}

/** Pins the persisted PCA / k-means model stores
  * ([[Pca.topComponentsPersisted]] / [[Kmeans.fitPersisted]]): fit-once/
  * publish semantics, bit-exact loads (doubles round-trip parquet
  * losslessly), cross-session reuse, and loud staleness re-fits — the
  * contract that drops q137/q142's repeat-session cost from the full
  * iterative fit to a few-KB parquet read (VERDICT r9 item 4).
  */
class ModelStoreSpec extends SparkSuite {
  import spark.implicits._

  /** A tiny parquet-backed embedding corpus, unique per call (so the
    * in-JVM fit memo can never serve a prior test's model and the
    * fitCount assertions observe genuine fits). */
  private def corpus(dir: String, tag: Double): org.apache.spark.sql.DataFrame = {
    val path = s"$dir/emb.parquet"
    (0 until 60).map { i =>
      (i.toLong, Seq(i % 5 + tag, (i % 7) * 0.5, i % 3 - 1.0), i % 4)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  private def samePca(a: Pca.PcaModel, b: Pca.PcaModel): Boolean =
    a.n == b.n && a.mean.sameElements(b.mean) &&
      a.eigenvalues.sameElements(b.eigenvalues) &&
      a.components.length == b.components.length &&
      a.components.indices.forall(i =>
        a.components(i).sameElements(b.components(i)))

  private def sameKmeans(a: Kmeans.KmeansModel, b: Kmeans.KmeansModel): Boolean =
    a.n == b.n && a.inertia == b.inertia && a.sizes.sameElements(b.sizes) &&
      a.centroids.length == b.centroids.length &&
      a.centroids.indices.forall(i =>
        a.centroids(i).sameElements(b.centroids(i)))

  test("topComponentsPersisted: cold fit+publish, warm load, bit-exact") {
    val dir = tmpDir("pcastore")
    val emb = corpus(dir, 0.125)
    val path = s"$dir/pca"

    val c0 = Pca.fitCount.get()
    val cold = Pca.topComponentsPersisted(emb, "embedding", k = 2,
      iters = 12, path)
    assert(Pca.fitCount.get() == c0 + 1, "cold path must fit")
    assert(new java.io.File(s"$path/components").exists(), "not published")
    assert(new java.io.File(s"$path/meta").exists(), "meta not published")

    // warm path: pure parquet load, zero fitting, bit-identical model
    val warm = Pca.topComponentsPersisted(emb, "embedding", k = 2,
      iters = 12, path)
    assert(Pca.fitCount.get() == c0 + 1, "warm hit re-ran the fit")
    assert(samePca(warm, cold), "loaded model diverges from fitted")

    // a FRESH session (same published files) also loads — the store
    // outlives the session and its memo
    val s2 = spark.newSession()
    val warm2 = Pca.topComponentsPersisted(
      s2.read.parquet(s"$dir/emb.parquet"), "embedding", k = 2,
      iters = 12, path)
    assert(Pca.fitCount.get() == c0 + 1)
    assert(samePca(warm2, cold))
  }

  test("topComponentsPersisted: parameter and corpus staleness re-fit loudly") {
    val dir = tmpDir("pcastale")
    val emb = corpus(dir, 0.25)
    val path = s"$dir/pca"
    Pca.topComponentsPersisted(emb, "embedding", k = 2, iters = 12, path)

    // different k → meta mismatch → re-fit (NOT a silent k=2 serve)
    val c0 = Pca.fitCount.get()
    val m1 = Pca.topComponentsPersisted(emb, "embedding", k = 1,
      iters = 12, path)
    assert(Pca.fitCount.get() == c0 + 1, "k change served the stale store")
    assert(m1.components.length == 1)

    // corpus rewritten in place behind an identical plan → corpus_fp
    // mismatch → re-fit
    corpus(dir, 0.5)
    val c1 = Pca.fitCount.get()
    Pca.topComponentsPersisted(spark.read.parquet(s"$dir/emb.parquet"),
      "embedding", k = 1, iters = 12, path)
    assert(Pca.fitCount.get() == c1 + 1,
      "rewritten corpus files served the stale store")
  }

  test("fitPersisted: cold fit+publish, warm load, bit-exact; scoring path") {
    val dir = tmpDir("kmstore")
    val emb = corpus(dir, 0.375)
    val path = s"$dir/kmeans"

    val c0 = Kmeans.fitCount.get()
    val cold = Kmeans.fitPersisted(emb, "embedding", "vec_id", k = 3,
      iters = 4, seed = "kmeans", path)
    assert(Kmeans.fitCount.get() == c0 + 1, "cold path must fit")

    val warm = Kmeans.fitPersisted(emb, "embedding", "vec_id", k = 3,
      iters = 4, seed = "kmeans", path)
    assert(Kmeans.fitCount.get() == c0 + 1, "warm hit re-ran the fit")
    assert(sameKmeans(warm, cold), "loaded model diverges from fitted")

    // the loaded model scores identically to the fitted one (assign is a
    // pure projection against literal centroids)
    val aFit = Kmeans.assign(emb, "embedding", "c", cold)
      .select($"vec_id", $"c").as[(Long, Int)].collect().toMap
    val aLoad = Kmeans.assign(emb, "embedding", "c", warm)
      .select($"vec_id", $"c").as[(Long, Int)].collect().toMap
    assert(aFit == aLoad)
    assert(cold.sizes.sum == 60L)
  }

  test("fitPersisted: parameter and corpus staleness re-fit loudly") {
    val dir = tmpDir("kmstale")
    val emb = corpus(dir, 0.625)
    val path = s"$dir/kmeans"
    Kmeans.fitPersisted(emb, "embedding", "vec_id", k = 3, iters = 4,
      seed = "kmeans", path)

    // different seed → meta mismatch → re-fit
    val c0 = Kmeans.fitCount.get()
    Kmeans.fitPersisted(emb, "embedding", "vec_id", k = 3, iters = 4,
      seed = "other", path)
    assert(Kmeans.fitCount.get() == c0 + 1, "seed change served the stale store")

    // corpus rewritten in place → corpus_fp mismatch → re-fit
    corpus(dir, 0.75)
    val c1 = Kmeans.fitCount.get()
    Kmeans.fitPersisted(spark.read.parquet(s"$dir/emb.parquet"),
      "embedding", "vec_id", k = 3, iters = 4, seed = "other", path)
    assert(Kmeans.fitCount.get() == c1 + 1,
      "rewritten corpus files served the stale store")
  }
}
