package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Pins [[graft.functions.IvfAssign]]/[[graft.functions.PqEncode]]
  * bit-identical to the composed per-centroid-literal forms they
  * replaced ([[Similarity.assignCellsComposed]]/[[Similarity.encodePqComposed]])
  * — same ‖c‖²−2·û·c distance with ascending-fold dots, same first-min
  * tie-break — on the real fixture corpus at several geometries. */
class IvfOpsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ivf_assign: bit-identical to the composed argmin tree") {
    val e = Similarity.prepared(Tables.embeddings(spark, sf), "vec_id", "embedding")
    for (nCells <- Seq(4, 16, 64)) {
      val idx = Similarity.buildIvfIndex(e, nCells)
      val native = Similarity.assignCells(e, idx)
        .select($"id", $"cell").as[(Long, Int)].collect().toMap
      val composed = Similarity.assignCellsComposed(e, idx)
        .select($"id", $"cell").as[(Long, Int)].collect().toMap
      assert(native == composed, s"nCells=$nCells")
      assert(native.values.toSet.size > 1, s"degenerate assignment at $nCells")
    }
  }

  test("pq_encode: bit-identical to the composed per-subspace argmin trees") {
    val e = Similarity.prepared(Tables.embeddings(spark, sf), "vec_id", "embedding")
    for ((m, kSub) <- Seq((8, 16), (16, 32), (4, 8))) {
      val pq = Similarity.buildPqIndex(e, m = m, kSub = kSub)
      val native = Similarity.encodePq(e, pq)
        .select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
      val composed = Similarity.encodePqComposed(e, pq)
        .select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
      assert(native.keySet == composed.keySet)
      native.foreach { case (id, codes) =>
        assert(codes == composed(id), s"m=$m kSub=$kSub id=$id")
      }
    }
  }
}
