package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge frames — here PageRank, the
  * authority measure a curation pipeline runs over its duplication
  * graph ([[Dedup.rareTilePairs]]) or citation/link structure to find
  * the documents whose duplication mass actually matters (a hub copied
  * by other hubs outranks one copied by leaves, which plain degree —
  * [[Dedup.duplicationHubs]] — cannot see).
  *
  * Scale shape: each iteration is one equi-join of the rank frame
  * against the (persisted) out-degree-annotated edge list followed by
  * one destination-keyed aggregation — the standard two-shuffle
  * Pregel-on-relations round. Iteration count is a fixed small
  * parameter, so the lineage stays bounded; at cluster scale a caller
  * running tens of iterations would checkpoint the rank frame every ~10
  * rounds to truncate lineage, which this fixed-depth form doesn't
  * need. No collect, no driver loop over data — the driver loop is over
  * ITERATIONS only.
  *
  * Determinism (oracle parity): per-node edge contributions are rounded
  * to 12 dp, summed exactly as DECIMAL(28,12) (reduction-order-free),
  * and each iteration's rank is re-rounded to 12 dp — so any engine
  * computing the same unrolled expression tree reproduces the ranks
  * bit-for-bit.
  */
object Graph {

  private val D = "decimal(28,12)"

  /** `iters` rounds of damped PageRank over `edges`. Nodes are the
    * distinct endpoint set; every rank starts at 1/N. A node with no
    * out-edges (impossible in a symmetric dup graph, possible in a
    * citation graph) simply leaks its mass — the (1-d)/N floor keeps
    * ranks positive; callers needing strict mass conservation can add
    * the dangling-mass redistribution as one extra 1-row broadcast per
    * round. Output: `(node, pr)` with pr rounded to 9 dp. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // out-degree-annotated edges: reused every round — stage once
    val eo = Staged(e.join(
      e.groupBy($"src").agg(count(lit(1)).cast("long").as("outdeg")),
      Seq("src")))
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).cast("long").as("__n"))
    // the constant (node, N) frame every round rebuilds from — staged so
    // the rank recurrence references its PREDECESSOR exactly once per
    // round (a second reference would double the plan per iteration)
    val nodesN = Staged(nodes.crossJoin(broadcast(nRow)))
    var pr = nodesN.select($"node", (lit(1.0) / $"__n").as("pr"))
    for (_ <- 1 to iters) {
      val inw = eo.join(pr.select($"node".as("src"), $"pr"), Seq("src"))
        .select($"dst", round($"pr" / $"outdeg", 12).as("w"))
        .groupBy($"dst")
        .agg(sum($"w".cast(D)).cast("double").as("inw"))
      pr = nodesN
        .join(inw.select($"dst".as("node"), $"inw"), Seq("node"), "left")
        .select($"node",
          round(lit(1.0 - damping) / $"__n" +
            lit(damping) * coalesce($"inw", lit(0.0)), 12).as("pr"))
    }
    pr.select($"node", round($"pr", 9).as("pr"))
  }
}
