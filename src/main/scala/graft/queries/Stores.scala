package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.ops.Dedup

/** Shared persisted-derivation stores for the query surface.
  *
  * The near-dup cluster table (3-gram Jaccard ≥ 0.5 pairs → connected
  * components over the full `documents` corpus) is read by a whole
  * family of analytics — the raw table (q43), cluster purity (q185),
  * size histogram / drop-rate / largest-cluster readers (q191–q193).
  * Deriving it costs tens of seconds at sf1 (hours at 100 TB); reading
  * it back is a parquet scan. So the family shares ONE
  * [[Dedup.clustersPersisted]] store: the first query of a session (or
  * the first session ever, for a cold filesystem) derives + publishes,
  * everything after loads.
  *
  * The store path is keyed by a walk of the corpus files (name, length,
  * mtime) — the q74_knn_ivf_saved convention — so a regenerated corpus
  * under the same directory gets a FRESH path and re-derives instead of
  * probing a stale table; `clustersPersisted` additionally verifies the
  * corpus/plan fingerprints in the store's meta row before trusting it.
  */
object Stores {

  /** (name, length, mtime) walk-hash of one table's files under `d`. */
  private def tableFp(d: String, table: String): Int = {
    def walk(f: java.io.File): Seq[(String, Long, Long)] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq((f.getAbsolutePath, f.length(), f.lastModified()))
    scala.util.hashing.MurmurHash3.orderedHash(walk(new java.io.File(d, table)))
  }

  /** Store root for the full-corpus near-dup cluster table of `d`. */
  def clusterStorePath(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-clusters-" +
      java.lang.Integer.toHexString(tableFp(d, "documents.parquet"))

  /** Store root for the top-2 PCA model of `d`'s embeddings. */
  def pcaStorePath(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-pca-" +
      java.lang.Integer.toHexString(tableFp(d, "embeddings.parquet"))

  /** Store root for the k=4 Lloyd k-means model of `d`'s embeddings. */
  def kmeansStorePath(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-kmeans-" +
      java.lang.Integer.toHexString(tableFp(d, "embeddings.parquet"))

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
    * + published on first touch. Deterministic: min-label components
    * over exact routed Jaccard pairs, so every caller (and the DuckDB
    * oracle's recursive walk) sees identical rows whether it hit the
    * store or paid the derivation. */
  def docClusters(s: SparkSession, d: String): DataFrame =
    Dedup.clustersPersisted(Tables.documents(s, d), "doc_id", "text",
      clusterStorePath(d), n = 3, threshold = 0.5)
}
