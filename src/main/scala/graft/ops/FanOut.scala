package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit scan fan-out for PER-ROW-COMPUTE operator inputs — the
  * round-15 replacement for the corpus-bytes floor that used to live in
  * [[graft.Tables]].
  *
  * The problem (measured in rounds 13–14): parquet cannot split below a
  * row group, so a fixture corpus shipped as 1–2 single-row-group files
  * pins every projection above its scan to 1–2 of 32 cores. For CHEAP
  * scans that is irrelevant (the scan is the cost); for the per-row-
  * compute operators — tokenize / shingle / hash / winnow / BPE / codec
  * decode / vector math — the map work dwarfs an exchange at every
  * scale, and the right signal is the QUERY SHAPE, not corpus bytes: a
  * bytes floor both taxed sub-second scans above it and forfeited
  * 3–5 s/query wins below it (round-14 verdict, What's wrong #1).
  *
  * So the heavy operator entry points opt in explicitly: they call
  * [[perRowCompute]] on their input, which repartitions by the
  * operator's id key ONLY when all of the following hold —
  *
  *  1. the input plan is a bare scan pipeline (projections/filters over
  *     exactly one file relation). Anything that already shuffles —
  *     join, aggregate, window, explicit repartition — distributes
  *     itself, and an input that is not file-backed (in-memory test
  *     frames) parallelizes at creation;
  *  2. the file layout caps scan parallelism: estimated splits
  *     (Σ ceil(fileLen / maxPartitionBytes), an upper bound — parquet
  *     can't split below a row group) < half the default parallelism.
  *
  * At 100 TB this is a structural no-op: a real corpus has thousands of
  * splits, so condition 2 never fires and the read passes through
  * untouched. The exchange, when it does fire, moves only the pruned
  * columns (projections and filters push below RepartitionByExpression —
  * PlanAudit pins this), keyed by the operator's unique id for a
  * uniform, deterministic placement.
  */
object FanOut {

  /** Fan `df` out across the cluster for a per-row-compute consumer,
    * keyed by `key`; see the conditions above. Pure plan surgery — no
    * Spark job, one driver-side file-metadata listing. */
  def perRowCompute(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 2) return df
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = df.queryExecution.analyzed
    var blocked = false
    plan.foreach {
      case _: Join | _: Aggregate | _: Window | _: RepartitionOperation |
           _: Sort | _: GlobalLimit | _: Deduplicate => blocked = true
      case _ => ()
    }
    if (blocked) return df
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // one relation, or a UNION of scan pipelines (round 15: the
    // augmented-corpus pattern — a table unioned with filtered
    // projections of itself — is still a file-split-capped read; each
    // arm's splits count separately because each arm scans separately)
    val rels = plan.collect { case lr: LogicalRelation => lr }
    if (rels.isEmpty) return df
    import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val perRelSplits = rels.map { lr =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location match {
            case p: PartitioningAwareFileIndex =>
              p.allFiles()
                .map(f => math.max(1L, (f.getLen + maxPart - 1) / maxPart)).sum
            // exotic FileIndex impls don't expose file sizes — leave the
            // read untouched rather than guess
            case _ => -1L
          }
        case _ => -1L
      }
    }
    if (perRelSplits.exists(_ < 0)) return df
    if (perRelSplits.sum >= math.max(2, target / 2)) df
    else df.repartition(target, key)
  }

  def perRowCompute(df: DataFrame, key: String): DataFrame =
    perRowCompute(df, df(key))
}
