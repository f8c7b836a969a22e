package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.ops.Dedup

/** Shared persisted-derivation stores for the query surface.
  *
  * The θ-scored exact-Jaccard PAIR table (3-gram Jaccard ≥ 0.3 over the
  * full `documents` corpus) is the shared upstream of the whole
  * near-dup family: the raw pair listings (q24/q76), the curation
  * anti-join (q42), the threshold sweep (q167), the decontamination
  * split (q72), LSH ground truth (q207), and — via connected components
  * at θ=0.5 — the cluster table every cluster analytic reads (q43,
  * q185, q191–q193, …). Jaccard is pairwise (independent of the rest of
  * the corpus), so one θ=0.3 store serves every tighter-θ, sub-corpus,
  * and split consumer as a parquet-scan + filter. Deriving it costs a
  * minute at sf1 (hours at 100 TB); reading it back is a scan. So the
  * family shares ONE [[Dedup.pairsPersisted]] store: the first query of
  * a session (or the first session ever, for a cold store root) derives
  * + publishes, everything after loads. The CLUSTER store is derived
  * FROM the pair store ([[Dedup.clustersPersisted]]'s `pairSource`), so
  * the two can never disagree on pair scores.
  *
  * Store paths are keyed by a walk of the corpus files (name, length,
  * mtime) — the q74_knn_ivf_saved convention — so a regenerated corpus
  * under the same directory gets a FRESH path and re-derives instead of
  * probing a stale table; each read-through additionally verifies the
  * corpus/plan fingerprints and algorithm version in the store's meta
  * row before trusting it, and publishes atomically
  * ([[graft.ops.StoreIO.publish]]).
  *
  * SECURITY/ISOLATION: everything lives under ONE per-user 0700 root
  * (override: `SPARK_GRAFT_STORE_DIR`), not bare world-shared tmpdir
  * paths — on a multi-user host a world-writable store prefix would let
  * anyone who can read the corpus pre-plant a matching meta row plus
  * arbitrary store data that the read-through would then trust. */
object Stores {

  /** Per-user store root: `$SPARK_GRAFT_STORE_DIR`, else
    * `tmpdir/graft-stores-<user>`, created 0700. Fails loudly if the
    * directory exists but is not owned-and-private to this user (a
    * pre-planted root is exactly the attack the 0700 root exists to
    * stop). */
  lazy val root: String = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.PosixFilePermissions
    val dir = sys.env.getOrElse("SPARK_GRAFT_STORE_DIR",
      s"${sys.props("java.io.tmpdir")}/graft-stores-${sys.props("user.name")}")
    val p = Paths.get(dir)
    if (!Files.exists(p))
      scala.util.Try(Files.createDirectories(p,
        PosixFilePermissions.asFileAttribute(
          PosixFilePermissions.fromString("rwx------"))))
        .getOrElse(Files.createDirectories(p)) // non-POSIX fs fallback
    scala.util.Try {
      Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwx------"))
      val owner = Files.getOwner(p).getName
      require(owner == sys.props("user.name"),
        s"store root $dir is owned by '$owner', not '${sys.props("user.name")}' — " +
          "refusing to trust a store root this user does not own " +
          "(set SPARK_GRAFT_STORE_DIR to a private directory)")
    }.recover {
      case _: UnsupportedOperationException => () // non-POSIX fs: no-op
    }.get
    dir
  }

  /** (name, length, mtime) walk-hash of one table's files under `d`. */
  private def tableFp(d: String, table: String): Long = {
    def walk(f: java.io.File): Seq[(String, Long, Long)] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq((f.getAbsolutePath, f.length(), f.lastModified()))
    graft.ops.StoreIO.fpOrdered64(walk(new java.io.File(d, table)))
  }

  /** Store path under [[root]] for `kind`, keyed by `table`'s files. */
  def storePath(d: String, kind: String, table: String): String =
    s"$root/$kind-${java.lang.Long.toHexString(tableFp(d, table))}"

  /** Store root for the θ=0.3 scored-pair table of `d`'s documents. */
  def pairStorePath(d: String): String =
    storePath(d, "pairs", "documents.parquet")

  /** Store root for the full-corpus near-dup cluster table of `d`. */
  def clusterStorePath(d: String): String =
    storePath(d, "clusters", "documents.parquet")

  /** Store root for the top-2 PCA model of `d`'s embeddings. */
  def pcaStorePath(d: String): String =
    storePath(d, "pca", "embeddings.parquet")

  /** Store root for the k=4 Lloyd k-means model of `d`'s embeddings. */
  def kmeansStorePath(d: String): String =
    storePath(d, "kmeans", "embeddings.parquet")

  /** Store root for the 16-cell IVF index of `d`'s embeddings (q74). */
  def ivfStorePath(d: String): String =
    storePath(d, "ivf", "embeddings.parquet")

  /** Store root for the media-features store of `d`'s documents. */
  def mediaStorePath(d: String): String =
    storePath(d, "media", "documents.parquet")

  /** Store root for the θ=0.4 banded embedding near-dup pair table of
    * `d`'s embeddings (q32/q45). */
  def embedPairsStorePath(d: String): String =
    storePath(d, "embedpairs", "embeddings.parquet")

  /** Store root for the θ=0.9 containment-pair table of `d`. */
  def containmentStorePath(d: String): String =
    storePath(d, "containment", "documents.parquet")

  /** Store root for the centroid-classifier score store of `d`'s
    * embeddings (q132). */
  def scoresStorePath(d: String): String =
    storePath(d, "scores", "embeddings.parquet")

  /** Store root for the per-document LM-score store of `d` (q71/q92/
    * q97/q98). */
  def lmStorePath(d: String): String =
    storePath(d, "lmscores", "documents.parquet")

  /** Store root for the trained quality-classifier score store of `d`'s
    * documents (q79). */
  def qualityStorePath(d: String): String =
    storePath(d, "quality", "documents.parquet")

  /** The canonical θ-scored pair table of `d`'s documents —
    * (doc_a, doc_b, jaccard) at the loosest surface threshold θ=0.3,
    * loaded from the published store or derived (routed exact Jaccard)
    * + published on first touch. Deterministic: exact integer
    * intersections over distinct shingle sets, one double division —
    * identical whether a caller hit the store or paid the derivation. */
  def docPairs(s: SparkSession, d: String): DataFrame =
    Dedup.pairsPersisted(Tables.documents(s, d), "doc_id", "text",
      pairStorePath(d), n = 3, threshold = 0.3)

  /** GUARANTEED-EXACT θ=0.3 pairs with both endpoints below `maxDocId`
    * — the ground-truth feed of the LSH evaluations (q207/q240). Reads
    * the persisted store when its recorded derivation route is exact
    * (prefix/direct); when the router took the df-capped route (a
    * corpus past the Σdf² budget — the store then UNDERCOUNTS pairs and
    * would silently inflate eval recall), or the route is unrecorded
    * (pre-route-column store), the slice's truth is re-derived EXACTLY
    * on the slice itself — bounded cost at any corpus size (the slice
    * is an eval-sized id prefix), which is precisely why slice-truth
    * evals stay affordable when full-corpus exact truth is not. */
  def docPairsExactSlice(s: SparkSession, d: String,
                         maxDocId: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val stored = docPairs(s, d) // ensures the store exists + is fresh
      .where(col("doc_a") < maxDocId && col("doc_b") < maxDocId)
    Dedup.loadPairsRoute(s, pairStorePath(d)) match {
      case Some("prefix") | Some("direct") => stored
      case other =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"docPairsExactSlice: pair store route is $other (not exact) — " +
            s"re-deriving exact truth on the doc_id < $maxDocId slice")
        Dedup.ngramJaccardPairs(
          Tables.documents(s, d).where(col("doc_id") < maxDocId),
          "doc_id", "text", n = 3, threshold = 0.3)
    }
  }

  /** The canonical top-2 PCA model of `d`'s embeddings (the q137 fit) —
    * loaded from the published store or fitted + published on first
    * touch. Deterministic: decimal-exact power iteration, so loaded and
    * fitted models are bit-identical ([[graft.ops.Pca.savePcaModel]]). */
  def pcaModel(s: SparkSession, d: String): graft.ops.Pca.PcaModel =
    graft.ops.Pca.topComponentsPersisted(Tables.embeddings(s, d),
      "embedding", k = 2, iters = 12, pcaStorePath(d))

  /** The canonical k=4 k-means model of `d`'s embeddings (the q142
    * fit) — loaded from the published store or fitted + published on
    * first touch. */
  def kmeansModel(s: SparkSession, d: String): graft.ops.Kmeans.KmeansModel =
    graft.ops.Kmeans.fitPersisted(Tables.embeddings(s, d), "embedding",
      "vec_id", k = 4, iters = 8, seed = "kmeans", kmeansStorePath(d))

  /** The canonical near-dup cluster table of `d`'s documents —
    * (doc_id, component_id), loaded from the published store or derived
    * + published on first touch. Derived FROM [[docPairs]] (θ=0.3 store
    * filtered to the clustering threshold 0.5), so pair analytics and
    * cluster analytics always agree. Deterministic: min-label components
    * over exact routed Jaccard pairs, so every caller (and the DuckDB
    * oracle's recursive walk) sees identical rows whether it hit the
    * store or paid the derivation. */
  def docClusters(s: SparkSession, d: String): DataFrame =
    Dedup.clustersPersisted(Tables.documents(s, d), "doc_id", "text",
      clusterStorePath(d), n = 3, threshold = 0.5,
      pairSource = Some(() => docPairs(s, d)))

  /** The canonical θ=0.4 embedding near-dup pair table of `d` —
    * (id_a, id_b, cosine), CORPUS-SCALED banded LSH candidates with
    * exact cosine verification ([[graft.ops.Similarity.nearDupPairsBanded]]
    * at targetRecall 0.7 — band rows/tables derive from N and the
    * threshold's exact collision probability, the round-15 fix for the
    * fixed-bucket pass whose recall collapsed 16× over one corpus
    * decade), loaded from the published store or derived + published on
    * first touch. Precision is exact by construction (every reported
    * pair is cosine-verified); recall is the collision-model floor the
    * sf1 golden gate enforces. */
  def embedPairs(s: SparkSession, d: String): DataFrame =
    graft.ops.Similarity.nearDupPairsPersisted(
      graft.ops.Similarity.prepared(Tables.embeddings(s, d), "vec_id", "embedding"),
      embedPairsStorePath(d), minCosine = 0.4, targetRecall = 0.7)

  /** The canonical media-features store of `d`'s documents (decoded
    * metadata, image dHash, audio fingerprints, per-frame video hashes,
    * 10×10-resized metadata, per-frame decoded metadata) — loaded from
    * the published store or derived (one staged encode, six codec
    * passes) + published on first touch. Deterministic: every feature is
    * a pure function of the payload bytes through the real JVM codecs,
    * so loaded and derived tables are identical
    * ([[graft.ops.MediaStore]]). */
  def media(s: SparkSession, d: String): graft.ops.MediaStore.Handle =
    graft.ops.MediaStore.persisted(Tables.documents(s, d),
      mediaStorePath(d), resizeW = 10, resizeH = 10)

  /** The canonical θ=0.9 directed containment-pair table of `d`'s
    * documents — (inner_id, outer_id, containment), loaded from the
    * published store or derived (routed containment —
    * [[Dedup.containmentPairsAuto]]) + published on first touch.
    * Containment is pairwise, so sub-corpus/tighter-θ consumers are
    * filters over this one table. */
  def docContainment(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPersisted(Tables.documents(s, d), "doc_id", "text",
      containmentStorePath(d), n = 3, threshold = 0.9)

  /** The canonical centroid-classifier predictions of `d`'s embeddings
    * (the q132 scoring) — loaded from the published store or derived +
    * published on first touch. Deterministic: decimal-exact dot
    * products, label-order tie-break
    * ([[graft.ops.Classify.centroidPredictions]]). */
  def centroidPredictions(s: SparkSession, d: String): DataFrame =
    graft.ops.Classify.predictionsPersisted(Tables.embeddings(s, d),
      scoresStorePath(d))

  /** The canonical per-document LM-score table of `d`'s documents —
    * (doc_id, n_tokens, logprob, bigram_logprob) at λ = 0.75, loaded
    * from the published store or derived (one unigram + one bigram
    * scoring pass) + published on first touch. Deterministic:
    * decimal-exact per-token sums rounded to the 6-dp grid, so loaded
    * and derived tables are bit-identical and every perplexity consumer
    * (q71/q92/q97/q98) reads a parquet scan instead of re-scoring the
    * corpus ([[graft.ops.Text.lmScoresPersisted]]). */
  def lmScores(s: SparkSession, d: String): DataFrame =
    graft.ops.Text.lmScoresPersisted(Tables.documents(s, d), "doc_id",
      "text", lmStorePath(d))

  /** The canonical trained quality-classifier score table of `d`'s
    * documents — (doc_id, label, score, predicted) at the default
    * hyperparameters, loaded from the published store or trained
    * (decimal-exact batch GD on the 30% hash sample) + scored +
    * published on first touch. Deterministic: bit-exact training makes
    * loaded and derived tables identical, so q79 (and any future
    * consumer of the calibrated scores) reads a parquet scan instead of
    * re-running 30 gradient passes per session
    * ([[graft.ops.Classify.qualityScoresPersisted]]). */
  def qualityScores(s: SparkSession, d: String): DataFrame =
    graft.ops.Classify.qualityScoresPersisted(Tables.documents(s, d),
      "doc_id", "text", qualityStorePath(d))
}
