package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persisted MEDIA-FEATURES store — the pair-store pattern
  * ([[Dedup.pairsPersisted]]) applied to the codec family.
  *
  * Every media feature this library serves (decoded metadata, image
  * dHash, audio fingerprint, per-frame video hashes, resized-image
  * metadata, sampled-frame metadata) is a PURE FUNCTION of the corpus
  * bytes — yet before this store each sweep of q67/q69/q82/q84/q85
  * re-encoded and re-decoded the whole corpus through the real JVM
  * codecs (~8.5 s of every sf1 sweep; at 100 TB the decode pass is the
  * kind of job measured in cluster-days). So: derive ONCE per corpus
  * fingerprint, publish atomically ([[StoreIO.publish]]), and let every
  * query/session/JVM read parquet. Steady-state cost is a columnar scan
  * of 8-byte signatures — flat across corpus decades, like the pair
  * store's.
  *
  * Layout under `path` (one atomic publish; readers see all-or-nothing):
  *   path/features         — decoded metadata of every media record
  *                           (doc_id, media_type, byte_len, checksum,
  *                           width, height, n_frames, channels)
  *   path/image_dhash      — (doc_id, dhash)        [decodable images]
  *   path/audio_fp         — (doc_id, audio_fp)     [decodable audio]
  *   path/frame_hashes     — (doc_id, frame_idx, dhash), EVERY frame
  *                           (everyN = 1; consumers sample by filter)
  *   path/resized_features — decoded metadata AFTER the real
  *                           resize_w × resize_h bilinear resize+re-encode
  *   path/frame_features   — (doc_id, frame_idx, width, height,
  *                           channels), every sampled frame decoded
  *                           (everyN = 1; consumers sample by filter)
  *   path/meta             — ONE row (corpus_fp, plan_fp, resize_w,
  *                           resize_h, algo_version)
  *
  * Frame tables are stored at everyN = 1 (every frame) so ANY sampling
  * cadence downstream is a `frame_idx % N = 0` filter over the store —
  * the store never needs re-deriving when a consumer changes its
  * cadence. The resize target IS a store parameter (the resized
  * metadata depends on it), carried in the meta row: a consumer with a
  * different target is a stale-store re-derive, loudly logged.
  *
  * The derivation encodes the corpus once ([[Multimodal.attachMedia]],
  * staged MEMORY_AND_DISK for its six consumers), runs each codec pass
  * map-side exactly as the direct operators do, and publishes. Bumping
  * [[AlgoVersion]] on ANY codec/feature change invalidates every
  * published store (same contract as the pair/cluster/model stores).
  */
object MediaStore {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Bump on any change to [[Codecs]]/[[Multimodal]] feature semantics:
    * a store published by older code must re-derive, never silently
    * serve stale features. */
  val AlgoVersion = 1

  /** Observable derivation count (spec hook, like `pairComputeCount`):
    * a warm store must load without incrementing this. */
  private[graft] val computeCount =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Read handle over a PUBLISHED store (no staleness check — the
    * caller owns provenance; [[persisted]] is the checked path). */
  final case class Handle(spark: SparkSession, path: String) {
    def features: DataFrame        = spark.read.parquet(s"$path/features")
    def imageDhash: DataFrame      = spark.read.parquet(s"$path/image_dhash")
    def audioFp: DataFrame         = spark.read.parquet(s"$path/audio_fp")
    def frameHashes: DataFrame     = spark.read.parquet(s"$path/frame_hashes")
    def resizedFeatures: DataFrame = spark.read.parquet(s"$path/resized_features")
    def frameFeatures: DataFrame   = spark.read.parquet(s"$path/frame_features")
  }

  private def readMeta(spark: SparkSession, path: String)
      : Option[(Long, Long, Int, Int, Int)] = {
    import spark.implicits.newProductEncoder
    scala.util.Try(
      spark.read.parquet(s"$path/meta")
        .select(col("corpus_fp").cast("long"), col("plan_fp").cast("long"),
          col("resize_w").cast("int"), col("resize_h").cast("int"),
          col("algo_version").cast("int"))
        .as[(Long, Long, Int, Int, Int)].head()).toOption
  }

  /** Derive every feature table from one staged encode of the corpus and
    * publish atomically. Exposed for pipelines that own provenance;
    * [[persisted]] is the checked read-through. */
  def save(docs: DataFrame, path: String, corpusFp: Long, planFp: Long,
           resizeW: Int, resizeH: Int,
           replaceExisting: Boolean = true): Boolean = {
    val spark = docs.sparkSession
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    StoreIO.publish(spark, path, replaceExisting) { tmp =>
      // ONE encode of the corpus feeds all six passes; MEMORY_AND_DISK so
      // payload volume spills instead of evicting (binary never shuffles —
      // each pass is a map over the staged partitions)
      val media = Multimodal.attachMedia(docs).persist(StorageLevel.MEMORY_AND_DISK)
      try {
        Multimodal.extractFeatures(media).toDF()
          .write.mode("overwrite").parquet(s"$tmp/features")
        Multimodal.imageDHash(media)
          .select(col("doc").cast("long").as("doc_id"), col("sig").as("dhash"))
          .write.mode("overwrite").parquet(s"$tmp/image_dhash")
        Multimodal.audioFingerprints(media)
          .select(col("doc").cast("long").as("doc_id"), col("sig").as("audio_fp"))
          .write.mode("overwrite").parquet(s"$tmp/audio_fp")
        Multimodal.videoFrameHashes(media, everyN = 1)
          .select(col("doc").cast("long").as("doc_id"), col("frame_idx"),
            col("sig").as("dhash"))
          .write.mode("overwrite").parquet(s"$tmp/frame_hashes")
        Multimodal.extractFeatures(Multimodal.resizeImages(media, resizeW, resizeH))
          .toDF().write.mode("overwrite").parquet(s"$tmp/resized_features")
        Multimodal.frameFeatures(media, everyN = 1).toDF()
          .write.mode("overwrite").parquet(s"$tmp/frame_features")
        Seq((corpusFp, planFp, resizeW, resizeH, AlgoVersion))
          .toDF("corpus_fp", "plan_fp", "resize_w", "resize_h", "algo_version")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
      } finally { media.unpersist(); () }
    }
  }

  /** The checked read-through: return a [[Handle]] over the store at
    * `path` if its meta matches `docs`' corpus/plan fingerprints, the
    * resize target, and [[AlgoVersion]]; else derive + publish (atomic,
    * race-safe: strict no-replace on the cold branch — see
    * [[StoreIO.publish]]) and return a handle over the published store.
    * Either way every downstream plan scans parquet. */
  def persisted(docs: DataFrame, path: String,
                resizeW: Int = 10, resizeH: Int = 10): Handle = {
    val spark = docs.sparkSession
    val want = (Similarity.fileFingerprint(docs),
      StoreIO.fp64(docs.queryExecution.analyzed.canonicalized.toString),
      resizeW, resizeH, AlgoVersion)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def haveMeta(): Option[(Long, Long, Int, Int, Int)] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/meta")) ||
          !fs.exists(new org.apache.hadoop.fs.Path(s"$path/features"))) None
      else readMeta(spark, path)
    def computeAndPublish(replaceStale: Boolean): Handle = {
      computeCount.incrementAndGet()
      save(docs, path, want._1, want._2, resizeW, resizeH,
        replaceExisting = replaceStale)
      // whether this writer won or lost the publish race, the live store
      // must now hold the same pure function of the same inputs
      if (!haveMeta().contains(want)) sys.error(
        s"MediaStore: store at $path does not match its own publish " +
          s"(want $want) — concurrent writer with different inputs?")
      Handle(spark, path)
    }
    haveMeta() match {
      case Some(have) if have == want =>
        log.info(s"MediaStore: loading published media features at $path")
        Handle(spark, path)
      case Some(have) =>
        log.warn(s"MediaStore: store at $path is stale " +
          s"(have $have, want $want) — re-deriving and republishing")
        computeAndPublish(replaceStale = true)
      case None =>
        // None covers BOTH a truly cold slot AND an occupied-but-
        // unreadable store — only the former may use no-replace publish
        computeAndPublish(replaceStale =
          fs.exists(new org.apache.hadoop.fs.Path(path)))
    }
  }
}
