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
  * against the materialized out-degree-annotated edge list followed by
  * one destination-keyed aggregation — the standard two-shuffle
  * Pregel-on-relations round. The LOOP-INVARIANT frames (edge list,
  * out-degree annotation, node set) are EAGERLY materialized
  * (`localCheckpoint`, the [[Bpe.train]] iterative-operator precedent)
  * so the expensive edge subtree runs exactly once and every round's
  * plan bottoms out in leaves. The per-ROUND recurrence, by contrast,
  * stays lazy up to the final round (round 16): the unrolled chain over
  * those leaves is bounded (single-digit `iters` by contract — a deeper
  * run should re-introduce periodic checkpoints), AQE's ReusedExchange
  * de-duplicates the repeated leaf exchanges inside the one consuming
  * job, and dropping the per-round materialization job helps (round-16
  * A/B: q155 1.55 → 1.33 s median at sf0.1, identical ranks). History:
  * round 9 measured 6.2 → 3.0 s from truncating an UNBOUNDED lazy
  * recurrence whose leaves were not yet checkpointed — the cure was the
  * leaf checkpoints, not the per-round ones. The FINAL frame still
  * checkpoints eagerly so multi-consumer callers pay the loop once. On
  * a cluster the same call works unchanged (localCheckpoint blocks live
  * on executors; a fault-tolerant long run would swap in reliable
  * checkpointing — same shape, different sink). No collect, no driver
  * loop over data — the driver loop is over ITERATIONS only.
  *
  * Determinism (oracle parity): per-node edge contributions are rounded
  * to 12 dp, summed exactly as DECIMAL(28,12) (reduction-order-free),
  * and each iteration's rank is re-rounded to 12 dp — so any engine
  * computing the same unrolled expression tree reproduces the ranks
  * bit-for-bit. Materialization does not change values: every persisted
  * row is already rounded.
  */
object Graph {

  private val D = "decimal(28,12)"

  /** `iters` rounds of damped PageRank over `edges`. Nodes are the
    * distinct endpoint set; every rank starts at 1/N. A node with no
    * out-edges (impossible in a symmetric dup graph, possible in a
    * citation graph) simply leaks its mass — the (1-d)/N floor keeps
    * ranks positive; callers needing strict mass conservation can add
    * the dangling-mass redistribution as one extra 1-row broadcast per
    * round. Output: `(node, pr)` with pr rounded to 9 dp.
    *
    * Eager: the edge list materializes at CALL time (iterative
    * operator, [[Bpe.trainedModel]] precedent), not first action. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // one pass over the caller's (possibly expensive) edge subtree
    // computes edges + out-degrees + node set; each becomes a leaf
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val eo = e.join(
        e.groupBy($"src").agg(count(lit(1)).cast("long").as("outdeg")),
        Seq("src"))
      .localCheckpoint(true)
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).cast("long").as("__n"))
    val nodesN = nodes.crossJoin(broadcast(nRow)).localCheckpoint(true)
    var pr = nodesN.select($"node", (lit(1.0) / $"__n").as("pr"))
    for (i <- 1 to iters) {
      val inw = eo.join(pr.select($"node".as("src"), $"pr"), Seq("src"))
        .select($"dst", round($"pr" / $"outdeg", 12).as("w"))
        .groupBy($"dst")
        .agg(sum($"w".cast(D)).cast("double").as("inw"))
      val next = nodesN
        .join(inw.select($"dst".as("node"), $"inw"), Seq("node"), "left")
        .select($"node",
          round(lit(1.0 - damping) / $"__n" +
            lit(damping) * coalesce($"inw", lit(0.0)), 12).as("pr"))
      // Round-16: intermediate rounds stay LAZY — the unrolled round
      // chain over the three checkpointed leaves is bounded (iters is
      // single-digit by contract), AQE's ReusedExchange de-duplicates
      // the per-round leaf exchanges inside the one consuming job, and
      // dropping the per-round materialization job measured q155
      // 1.55 -> 1.33 s median at sf0.1 (interleaved A/B, identical
      // ranks). The FINAL frame still checkpoints eagerly so a
      // multi-consumer caller (the q203 pattern) pays the loop once.
      pr = if (i == iters) next.localCheckpoint(true) else next
    }
    pr.select($"node", round($"pr", 9).as("pr"))
  }

  /** Semi-supervised label propagation — the cheap label-spreading pass
    * a curation pipeline runs when a fraction of documents carry
    * trusted labels (human-annotated language, topic, quality tier) and
    * the duplication/similarity graph should carry them to near-copies:
    * each round, every still-unlabeled node adopts the MODAL label of
    * its labeled in-neighbors (ties break to the lexicographically
    * smallest label); labeled nodes never change. `seeds` is `(node,
    * label)`; nodes absent from the edge list take no part.
    *
    * Same round shape and eager-materialization rationale as
    * [[pageRank]] — one labeled-neighbor join + a (dst,label) count +
    * a `min(struct)` argmax (q121's no-window pattern) per round.
    * Entirely integer/string arithmetic: deterministic on any engine
    * with the same tie-break, no float parity concerns at all.
    * Output: `(node, label)`, label null where propagation never
    * reached. */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
                     seeds: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct()
    var lab = nodes
      .join(seeds.select(col("node"), col("label").as("__seed")),
        Seq("node"), "left")
      .select($"node", $"__seed".as("label")).localCheckpoint(true)
    for (i <- 1 to iters) {
      val votes = e.join(
          lab.where($"label".isNotNull).select($"node".as("src"), $"label"),
          Seq("src"))
        .groupBy($"dst", $"label").agg(count(lit(1)).as("cnt"))
        .groupBy($"dst")
        .agg(min(struct((-$"cnt").as("neg"), $"label".as("l"))).as("top"))
        .select($"dst".as("node"), $"top.l".as("__new"))
      val next = lab.join(votes, Seq("node"), "left")
        .select($"node", coalesce($"label", $"__new").as("label"))
      // intermediate rounds lazy, final eager — see [[pageRank]]'s
      // round-16 note (q203 consumes the result twice)
      lab = if (i == iters) next.localCheckpoint(true) else next
    }
    lab
  }

  /** The k-core of an undirected graph, peeled to FIXPOINT — the
    * degeneracy structure a dedup pipeline reads to find the DENSE
    * heart of a duplication cluster (a k-core survives removing any
    * single hub; a star collapses at k=2). Each round drops every node
    * whose remaining degree is < k and restricts the edge list to
    * survivors — monotone, so once a round removes nothing the
    * survivors are EXACTLY the k-core, and every reported degree is a
    * genuine within-core degree ≥ k. Convergence is certified, never
    * assumed: a round budget that ran out mid-peel (through round 9 the
    * loop was a fixed 5-round unroll) could emit survivor rows whose
    * degree still sat below k — rows that self-contradict the k-core
    * contract — so an unconverged run now FAILS LOUD
    * (`IllegalStateException`, the [[Dedup.connectedComponents]]
    * fail-before-wrong-output discipline) instead of returning an
    * unlabeled upper bound. Peeling depth needed in practice is small —
    * each round removes a full "shell", not one node — and the
    * convergence check is a `count()` on the round's already-
    * materialized checkpoint, so fixpoint costs one extra no-op round
    * over the old unroll.
    *
    * Input: pair list in either or both directions (canonicalized and
    * symmetrized internally). Each round is one degree aggregation +
    * two semi-joins, eagerly materialized ([[pageRank]] precedent).
    * Output: `(node, degree)` of survivors with their within-core
    * degree, pure integer arithmetic. */
  def kCore(pairs: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val und = pairs
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where($"a" =!= $"b").distinct()
    var sym = und.select($"a".as("src"), $"b".as("dst"))
      .unionAll(und.select($"b".as("src"), $"a".as("dst")))
      .localCheckpoint(true)
    var edgeRows = sym.count()
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      val keep = sym.groupBy($"src").agg(count(lit(1)).as("__deg"))
        .where($"__deg" >= k).select($"src")
      sym = sym
        .join(keep, Seq("src"), "left_semi")
        .join(keep.select($"src".as("dst")), Seq("dst"), "left_semi")
        .select($"src", $"dst")
        .localCheckpoint(true)
      val next = sym.count()
      converged = next == edgeRows // peel removed nothing → at fixpoint
      edgeRows = next
      r += 1
    }
    if (!converged)
      throw new IllegalStateException(s"kCore: peeling did not converge " +
        s"within maxRounds=$maxRounds ($edgeRows directed edges remain); " +
        "raise maxRounds — emitting the unconverged survivor set would " +
        "break the degree >= k contract")
    sym.groupBy($"src".as("node"))
      .agg(count(lit(1)).cast("long").as("degree"))
  }

  /** Common-neighbor link prediction — the "missed duplicate" candidate
    * generator: pairs NOT directly connected in the graph but sharing
    * many neighbors (two docs never tile-matched, yet both near-dups of
    * the same third documents, e.g. two clean re-renders of one
    * template). Output `(u, w, n_common, jaccard)` for non-adjacent
    * pairs, jaccard = |N(u)∩N(w)| / (deg(u)+deg(w)−|∩|).
    *
    * Scale shape: wedges are enumerated at their CENTER, and centers
    * with degree > `maxCenterDeg` are skipped — the Σ deg(z)² wedge
    * bound with the boilerplate-hub tail cut off (a 10⁵-degree hub
    * would contribute 10¹⁰ wedges while certifying almost nothing:
    * co-citation of a universal hub is not evidence of similarity —
    * same rationale as [[Dedup.rareTilePairs]]' df cap, documented
    * semantics rather than an approximation). Degrees in the Jaccard
    * denominator stay UNcapped, so capped scores are conservative. */
  def linkCandidates(pairs: DataFrame, srcCol: String, dstCol: String,
                     maxCenterDeg: Int = 64): DataFrame = {
    require(maxCenterDeg >= 2, s"maxCenterDeg must be >= 2: $maxCenterDeg")
    val und = pairs
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where($"a" =!= $"b").distinct()
      .localCheckpoint(true)
    val sym = und.select($"a".as("z"), $"b".as("nbr"))
      .unionAll(und.select($"b".as("z"), $"a".as("nbr")))
      .localCheckpoint(true)
    val deg = sym.groupBy($"z")
      .agg(count(lit(1)).cast("long").as("degree"))
      .localCheckpoint(true)
    val symC = sym.join(
      deg.where($"degree" <= maxCenterDeg).select($"z"), Seq("z"), "left_semi")
    symC.select($"z", $"nbr".as("u"))
      .join(symC.select($"z", $"nbr".as("w")), Seq("z"))
      .where($"u" < $"w")
      .groupBy($"u", $"w")
      .agg(count(lit(1)).cast("long").as("n_common"))
      .join(und.select($"a".as("u"), $"b".as("w")), Seq("u", "w"), "left_anti")
      .join(deg.select($"z".as("u"), $"degree".as("__du")), Seq("u"))
      .join(deg.select($"z".as("w"), $"degree".as("__dw")), Seq("w"))
      .select($"u", $"w", $"n_common",
        round($"n_common".cast("double") / ($"__du" + $"__dw" - $"n_common"),
          9).as("jaccard"))
  }

  /** Triangle count + local clustering coefficient per node — the graph
    * diagnostic that separates a TEMPLATE family (near-clique: high
    * triangle density, coefficient → 1) from a HUB-and-spoke mirror
    * pattern (star: high degree, zero triangles), which degree (q164)
    * and PageRank (q155) cannot tell apart. Input `pairs` is an
    * undirected pair list in either or both directions; edges are
    * canonicalized (least, greatest) + distinct first.
    *
    * Scale shape: edges are ORIENTED from the (degree, id)-smaller
    * endpoint to the larger before the two-hop self-join — the standard
    * compact-forward bound: every out-degree is ≤ √(2m), so the wedge
    * join costs Σ d_out² ≤ m·√(2m) instead of the Σ d² a naive
    * orientation pays on a skewed graph (one 10⁶-degree hub would
    * otherwise contribute 10¹² wedges alone). Each triangle is counted
    * exactly once (the orientation is acyclic), then credited to its 3
    * vertices by one explode. Canonical edge list and degree frame are
    * eagerly materialized ([[pageRank]] precedent) — each is read three
    * times downstream.
    *
    * Output: `(node, degree, n_tri, clust_coef)` for every node of the
    * graph, coefficient = 2·T/(deg·(deg−1)) rounded to 9 dp (0.0 for
    * degree-1 nodes). Pure integer arithmetic until the one final
    * division — no float-parity surface. */
  def triangles(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = pairs
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where($"a" =!= $"b").distinct()
      .localCheckpoint(true)
    val deg = und.select($"a".as("node"))
      .unionAll(und.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).cast("long").as("degree"))
      .localCheckpoint(true)
    val fwd = $"__da" < $"__db" || ($"__da" === $"__db" && $"a" < $"b")
    val oriented = und
      .join(deg.select($"node".as("a"), $"degree".as("__da")), Seq("a"))
      .join(deg.select($"node".as("b"), $"degree".as("__db")), Seq("b"))
      .select(when(fwd, $"a").otherwise($"b").as("src"),
        when(fwd, $"b").otherwise($"a").as("dst"))
      .localCheckpoint(true)
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .join(oriented.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))
    val tn = tri.select(explode(array($"u", $"v", $"w")).as("node"))
      .groupBy($"node").agg(count(lit(1)).cast("long").as("n_tri"))
    deg.join(tn, Seq("node"), "left")
      .select($"node", $"degree",
        coalesce($"n_tri", lit(0L)).as("n_tri"),
        round(when($"degree" > 1,
          lit(2.0) * coalesce($"n_tri", lit(0L)) /
            ($"degree".cast("double") * ($"degree" - 1)))
          .otherwise(0.0), 9).as("clust_coef"))
  }
}
