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
}
