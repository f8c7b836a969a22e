package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One keyed sample candidate: the group, the row id, and its seeded
  * order hash (computed map-side by the SAME SQL expression the batch
  * operator uses, so stream and batch rank identically). */
case class SampleCandidate(group: String, id: Long, hk: Long)

/** A group's current sample after a batch: `sample_rank` is 1-based in
  * (hk, id) order — the exact rows [[graft.ops.Sampling.exactKPerGroup]]
  * would pick on the same data. */
case class SampleState(group: String, id: Long, hk: Long, sample_rank: Int)

/** Streaming exact-k-per-group sampling — the live face of
  * [[graft.ops.Sampling.exactKPerGroup]]: each group's fixed-size eval
  * sample, maintained as events arrive. The batch operator ranks every
  * row by a seeded md5 hash and keeps the k smallest per group; because
  * that selection is a pure ORDER STATISTIC of the hash, a stream can
  * maintain it with k rows of state per group and converge to the
  * IDENTICAL sample the batch run would produce over the same data —
  * no approximation, no arrival-order dependence (ReservoirStreamSpec
  * pins stream ≡ batch under shuffled replay).
  *
  * This is the streaming eval-set builder: "keep a fresh fixed-size
  * per-language/per-source sample of the corpus as it ingests" without
  * rescanning, where classic reservoir sampling (Vitter's R) would keep
  * a DIFFERENT, arrival-order-dependent sample that no batch oracle can
  * replay.
  *
  * Scale: state = at most k (hk, id) pairs per group (the key domain is
  * the stratum set — languages, sources — so NoTimeout, the
  * [[FunnelStream]] posture); each batch folds only its own rows and
  * emission happens only when the sample CHANGES (append-only log of
  * sample revisions; latest rows per group = current sample). */
object ReservoirStream {

  /** Per-group state: the k smallest (hk, id) pairs, in order. */
  case class Reservoir(pairs: Seq[(Long, Long)])

  /** Map-side projection onto candidates — the seeded hash is the batch
    * operator's exact expression ([[graft.ops.Sampling.exactKPerGroup]]:
    * 60-bit md5 prefix of "seed id"). */
  def candidates(df: DataFrame, groupCol: String, idCol: String,
                 seed: String): Dataset[SampleCandidate] = {
    implicit val enc = Encoders.product[SampleCandidate]
    df.select(col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("id"),
        conv(substring(md5(concat_ws(" ", lit(seed),
          col(idCol).cast("string"))), 1, 15), 16, 10).cast("long").as("hk"))
      .as[SampleCandidate]
  }

  /** The stateful sampler: per group, fold the batch's candidates into
    * the k-smallest set and emit the group's FULL current sample
    * whenever it changed (so a sink compaction keyed on (group, rank)
    * always holds the live sample). Duplicate ids fold idempotently —
    * a replayed event cannot displace anything. */
  def sample(events: Dataset[SampleCandidate], k: Int): Dataset[SampleState] = {
    require(k >= 1, s"k must be >= 1: $k")
    implicit val stateEnc = Encoders.product[Reservoir]
    implicit val outEnc = Encoders.product[SampleState]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(_.group)
      .flatMapGroupsWithState[Reservoir, SampleState](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          val prev = state.getOption.map(_.pairs).getOrElse(Seq.empty)
          val merged = (prev ++ rows.map(r => (r.hk, r.id)))
            .distinct.sorted.take(k)
          if (merged == prev) Iterator.empty
          else {
            state.update(Reservoir(merged))
            merged.iterator.zipWithIndex.map { case ((hk, id), i) =>
              SampleState(group, id, hk, i + 1)
            }
          }
      }
  }
}
