package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record: an opaque binary payload plus typed metadata. */
case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

/** Decoded/extracted features for a media record. Width/height/frames come
  * from the (stubbed) decoder; byte_len/checksum from the raw payload. */
case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
                         checksum: Long, width: Int, height: Int, n_frames: Int)

/** Multimodal-column plumbing: image/audio/video carried as opaque
  * `binary` columns with typed metadata, decoded partition-wise.
  *
  * The Spark-side architecture is real and tested — schema, partitioning,
  * iterator-batched per-partition processing (the Scala analog of
  * `mapInPandas`: one decoder instantiation per partition, streaming
  * through rows without materializing the partition). The *decoder itself*
  * is a clearly-marked STUB (`decodeStub`): this container has no image /
  * audio codecs, so it derives deterministic fake dimensions from the
  * payload bytes. Swapping in a real codec changes only that function.
  *
  * Scale posture: binary payloads never enter a shuffle — features are
  * extracted map-side and only the (small) typed metadata flows
  * downstream. `withBinaryBudget` sizes the partition count from the
  * total payload volume so the EXPECTED per-task payload is ~budget
  * bytes (hash distribution; not a hard per-task cap under size skew).
  */
object Multimodal {

  /** Attach a fake binary payload to the documents table (UTF-8 bytes of
    * the text) so the pipeline shape is exercised end-to-end without real
    * media files. */
  def attachBinary(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col(textCol).cast("binary").as("content"))

  /** STUB decoder — deterministic fake. A real deployment replaces this
    * with an actual codec call (e.g. javax.imageio / ffmpeg bindings);
    * everything around it (batching, schema, partitioning) is production
    * shape. */
  private[ops] def decodeStub(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
    // ??? <- real codec goes here; deterministic fake below keeps tests runnable
    val n = bytes.length
    mediaType match {
      case "image" => (64 + n % 512, 64 + (n / 7) % 512, 1)
      case "audio" => (0, 0, n / 100 + 1)
      case _       => (320, 240, n / 50 + 1)
    }
  }

  private def crc64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a
    var i = 0
    while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Partition-wise feature extraction (the mapInPandas analog): the
    * iterator is consumed lazily, one decoder context per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would happen here (once, not per row)
      it.map { r =>
        val (w, h, frames) = decodeStub(r.media_type, r.content)
        MediaFeatures(r.doc_id, r.media_type, r.content.length, crc64(r.content), w, h, frames)
      }
    }
  }

  /** One sampled video frame: parent doc, frame index, fake frame bytes. */
  case class FrameSample(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB resize — a real deployment calls an image library; the fake is
    * deterministic in (payload, target dims) so tests can pin it. The
    * plumbing (typed Dataset in/out, partition-wise batching, binary
    * stays map-side) is the production shape. */
  private[ops] def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? <- real codec goes here; deterministic fake: header + truncated payload
    val header = s"resized:${w}x$h:".getBytes("UTF-8")
    header ++ bytes.take(math.max(0, w * h / 64))
  }

  /** Partition-wise resize of image records (non-images pass through
    * unchanged): one decoder/scaler context per partition, lazy iterator,
    * binary never shuffles. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition scaler init would happen here (once, not per row)
      it.map { r =>
        if (r.media_type == "image") r.copy(content = resizeStub(r.content, w, h))
        else r
      }
    }
  }

  /** Partition-wise frame sampling of video records: every `everyN`-th
    * frame (index 0, everyN, 2·everyN, …) of each video becomes one
    * output row. The fan-out happens inside the partition iterator
    * (`flatMap`) — frames of one video never need co-location, so no
    * shuffle is introduced; downstream feature extraction sees frame rows
    * exactly like any other binary record. Frame *decode* is the same
    * honest stub as [[decodeStub]] (no codecs in this container): fake
    * frame bytes are a deterministic function of (payload, frame index).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[FrameSample] = {
    require(everyN >= 1, s"everyN must be >= 1 (got $everyN)")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(_.media_type == "video").flatMap { r =>
        val (_, _, nFrames) = decodeStub(r.media_type, r.content)
        (0 until nFrames by everyN).iterator.map { f =>
          // ??? <- real frame grab goes here; deterministic fake below
          val fake = s"frame:$f:".getBytes("UTF-8") ++
            r.content.slice(f % math.max(1, r.content.length), math.min(r.content.length, f % math.max(1, r.content.length) + 16))
          FrameSample(r.doc_id, f, fake)
        }
      }
    }
  }

  /** Re-partition so each task holds roughly `budgetBytes` of payload in
    * EXPECTATION: the partition count is total/budget and records
    * hash-spread by doc_id, so the average task carries ~budget bytes.
    * This bounds the mean, not the tail — a pathological size skew (one
    * record ≫ budget) still lands somewhere; a hard per-task byte cap
    * would need a cumulative-size assignment pass (a metadata-only
    * prefix-sum), which this deliberately avoids. */
  def withBinaryBudget(media: DataFrame, budgetBytes: Long, totalBytes: Long): DataFrame = {
    val parts = math.max(1, (totalBytes / budgetBytes).toInt)
    media.repartition(parts, col("doc_id"))
  }

  /** End-to-end: documents → binary records → partition-wise features. */
  def featuresOf(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(attachBinary(docs).as[MediaRecord])
  }
}
