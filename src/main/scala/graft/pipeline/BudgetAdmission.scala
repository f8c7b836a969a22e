package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.ops.{Shard, Text}

/** One document arrival, reduced to its admission facts: token count and
  * the seeded within-batch tie-break key ([[BudgetAdmission.arrivals]]
  * derives both from the raw (doc_id, text, source) frame). */
case class DocArrival(doc_id: Long, source: String, n_tok: Long, ord: Long)

/** An admitted document: `cum_tok` is the source's running token total
  * at this doc — identical in meaning to the batch sampler's column. */
case class AdmittedDoc(doc_id: Long, source: String, n_tok: Long, cum_tok: Long)

/** Streaming token-budget admission — the streaming counterpart of
  * [[graft.ops.Sampling.tokenBudgetSample]]: each source (domain) admits
  * documents while its running token total stays within `budget`, with
  * the total SURVIVING micro-batch boundaries. The batch operator picks
  * its prefix in seeded-hash order over a corpus it can see whole; a
  * stream cannot reorder what has not arrived, so the admission order is
  * arrival order across batches and seeded-hash order WITHIN a batch
  * (making each micro-batch deterministic under replay — the group
  * iterator itself carries no ordering guarantee, same discipline as
  * [[AnomalyRuns]]). Fed the whole corpus as one batch, the admitted set
  * is EXACTLY the batch sampler's (spec-pinned parity).
  *
  * Prefix semantics, deliberately: the running total counts every
  * ARRIVED token, not every admitted token, so the first over-budget
  * document closes the source — later smaller documents do not
  * skip-and-fill. That matches the batch rule (a pure prefix of the
  * permutation order), keeps the admitted set independent of trigger
  * boundaries given the same total order, and means an exhausted
  * source's state stops changing.
  *
  * Scale posture: state is ONE long per source — cardinality is the
  * domain taxonomy (dozens–thousands), not the corpus; NoTimeout is
  * safe. Per-group batch work is bounded by (arrival rate × trigger),
  * and the in-memory sort of a group's slice is over that bound, never
  * the corpus. Runs identically under the RocksDB provider (nothing in
  * state but a product encoder).
  *
  * Reference anchor: no streaming admission exists in the reference
  * (its streams aggregate, `gold_aggregation.py`); north-star surface —
  * "stop ingesting a domain once its token budget fills" is the
  * streaming face of training-data mixing. */
object BudgetAdmission {

  /** Per-source admission state: `cum` = tokens ARRIVED so far (the
    * prefix clock, not the admitted sum). */
  case class BudgetState(cum: Long)

  /** Project a raw (idCol, textCol, groupCol) document frame — static or
    * streaming — onto [[DocArrival]]: token count and the seed-salted
    * order key, both map-side (same [[Shard.orderKey]] the batch sampler
    * uses, so single-batch parity is exact). NULL-text rows are dropped
    * here, explicitly: a NULL token count would poison the primitive
    * encoder mid-stream, and "charge zero tokens" would let contentless
    * rows consume admission slots — neither is an admission semantic. */
  def arrivals(df: DataFrame, idCol: String, textCol: String,
               groupCol: String, seed: String): Dataset[DocArrival] = {
    implicit val enc = Encoders.product[DocArrival]
    df.where(col(textCol).isNotNull)
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(groupCol).cast("string").as("source"),
        Text.tokenCount(col(textCol)).cast("long").as("n_tok"),
        Shard.orderKey(col(idCol), seed).as("ord"))
      .as[DocArrival]
  }

  /** The admission transform (unstarted). Append-mode output: a doc is
    * emitted exactly once, in the micro-batch it arrives, iff its
    * source's running total (inclusive) still fits the budget. */
  def admitted(docs: Dataset[DocArrival], budget: Long): Dataset[AdmittedDoc] = {
    require(budget > 0, s"budget must be positive: $budget")
    implicit val stateEnc = Encoders.product[BudgetState]
    implicit val outEnc = Encoders.product[AdmittedDoc]
    implicit val keyEnc = Encoders.STRING
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[BudgetState, AdmittedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (source, rows, state) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[AdmittedDoc]
          rows.toSeq.sortBy(r => (r.ord, r.doc_id)).foreach { r =>
            cum += r.n_tok
            if (cum <= budget) out += AdmittedDoc(r.doc_id, source, r.n_tok, cum)
          }
          state.update(BudgetState(cum))
          out.iterator
      }
  }
}
