package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** The multimodal plumbing is real (schema, binary columns, partition-wise
  * extraction); only the codec is stubbed. These tests pin the plumbing. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("attachBinary produces typed binary records with media routing") {
    val m = Multimodal.attachBinary(Tables.documents(spark, sf))
    assert(m.schema.fieldNames.toSeq == Seq("doc_id", "media_type", "content"))
    assert(m.schema("content").dataType.typeName == "binary")
    val types = m.select("media_type").distinct().as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("partition-wise feature extraction is deterministic and complete") {
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.featuresOf(spark, docs).cache()
    assert(feats.count() == docs.count())
    // payload is the utf-8 text; corpus is ascii so byte_len == n_chars
    val joined = feats.toDF().join(docs, "doc_id")
      .where(col("byte_len") =!= col("n_chars"))
    assert(joined.count() == 0)
    // determinism: same checksums on recompute
    val a = feats.select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    val b = Multimodal.featuresOf(spark, docs)
      .select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    assert(a == b)
    // stub decoder fills plausible per-type metadata
    assert(feats.where(col("media_type") === "audio" && col("n_frames") <= 0).count() == 0)
    assert(feats.where(col("media_type") === "image" && (col("width") < 64 || col("height") < 64)).count() == 0)
    feats.unpersist()
  }

  test("resizeImages rewrites image payloads only, deterministically") {
    val media = Multimodal.attachBinary(Tables.documents(spark, sf)).as[graft.ops.MediaRecord]
    val resized = Multimodal.resizeImages(media, 32, 32).cache()
    assert(resized.count() == media.count())
    val byType = resized.collect().groupBy(_.media_type)
    assert(byType("image").forall(r => new String(r.content.take(11), "UTF-8") == "resized:32x"))
    // non-images untouched (byte-equal to the original payloads)
    val orig = media.collect().map(r => r.doc_id -> r.content).toMap
    assert(byType("audio").forall(r => r.content.sameElements(orig(r.doc_id))))
    assert(byType("video").forall(r => r.content.sameElements(orig(r.doc_id))))
    // deterministic on recompute
    val again = Multimodal.resizeImages(media, 32, 32).collect()
      .map(r => r.doc_id -> r.content.toSeq).toMap
    assert(resized.collect().forall(r => again(r.doc_id) == r.content.toSeq))
    resized.unpersist()
  }

  test("sampleFrames emits every Nth frame of videos only, no shuffle") {
    val media = Multimodal.attachBinary(Tables.documents(spark, sf)).as[graft.ops.MediaRecord]
    val frames = Multimodal.sampleFrames(media, everyN = 5).cache()
    val videos = media.filter(_.media_type == "video").collect()
    // expected count: ceil(n_frames / 5) per video, from the stub decoder
    val expected = videos.map { r =>
      val n = r.content.length / 50 + 1
      (n + 4) / 5
    }.sum
    assert(frames.count() == expected)
    // frame indices are 0, 5, 10, ... and unique per video
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.values.forall(fs => fs.map(_.frame_idx).sorted.sameElements(
      (0 until fs.length).map(_ * 5))))
    // the sampling plan introduces no exchange (map-side fan-out)
    val plan = Multimodal.sampleFrames(media, 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    frames.unpersist()
  }
}
