package graft

import graft.ops.{Dedup, Staged}

/** Storage-memory discipline for operator-staged frames: a long-lived
  * session running the staged operators repeatedly must not accumulate
  * cached blocks — the round-5 review found fire-and-forget persists in
  * the Jaccard/bloom/media/sketch paths that only the bench driver's
  * between-query clearCache masked. */
class StagedSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // every query family that routes through a Staged(...) site:
  // Dedup posting lists (q24/q43/q72), signature sets (q25/q26), bloom
  // benchmark shingles (q59), curation survivors + attached media
  // (q42/q69, ExtQueries), sketch bucket counts (q70, AdvQueries)
  private val stagedQueries =
    Seq("q24_ngram_jaccard", "q25_minhash_pairs", "q26_simhash_pairs",
      "q42_curation", "q43_dedup_clusters", "q59_bloom_decontam",
      "q69_media_pipeline", "q70_sketch_day_rollup", "q72_eval_neardup")

  test("scoped runs of the staged query surface leave zero persistent RDDs") {
    // pre-existing blocks from earlier suites in the shared session
    // would mask nothing but could fail the final assert — clear first
    Staged.releaseAll()
    spark.catalog.clearCache()
    assume(spark.sparkContext.getPersistentRDDs.isEmpty,
      "another suite left persistent RDDs; cannot assert cleanly")

    // twice, as the review asked: growth across REPEATED runs is the bug
    for (round <- 1 to 2; name <- stagedQueries) {
      Staged.scoped {
        val n = SparkEntry.queries(name)(spark, sf).count()
        assert(n >= 0)
      }
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$name round $round leaked persistent RDDs: " +
          spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", "))
    }
  }

  /** Blocks another suite left behind (e.g. a distributed-CC checkpoint
    * pending ContextCleaner GC) are not THIS spec's leak — assert that
    * no NEW ids survive, not that the shared JVM is globally empty. */
  private def baselineIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet
  private def assertNoNewBlocks(baseline: Set[Int], what: String): Unit = {
    val extra = spark.sparkContext.getPersistentRDDs.filterNot {
      case (id, _) => baseline(id) }
    assert(extra.isEmpty,
      s"$what leaked persistent RDDs: ${extra.values.map(_.name).mkString(", ")}")
  }

  test("release is correctness-neutral: staged operator results identical") {
    val base = baselineIds
    val docs = Tables.documents(spark, sf)
    val a = Staged.scoped {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
        .collect().toSet
    }
    // a second scoped run recomputes (prior stage released) — same result
    val b = Staged.scoped {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
        .collect().toSet
    }
    assert(a == b)
    assertNoNewBlocks(base, "scoped jaccard runs")
  }

  test("releaseAll is thread-scoped: a concurrent caller cannot release another's frames") {
    Staged.releaseAll(); spark.catalog.clearCache()
    val base = baselineIds
    // caller A (this thread) stages a frame and is still consuming it
    val mine = Staged(Tables.documents(spark, sf).select($"doc_id"))
    assert(mine.count() > 0 && mine.storageLevel.useMemory)
    // caller B (another thread) stages its own frame and releases — the
    // old global registry would have unpersisted A's frame here too,
    // silently re-running A's staged subtree per remaining consumer
    val t = new Thread(() => {
      val theirs = Staged(Tables.documents(spark, sf).select($"lang"))
      theirs.count()
      Staged.releaseAll()
      assert(!theirs.storageLevel.useMemory, "B's own release must free B's frame")
    })
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    t.setUncaughtExceptionHandler((_, e) => { errs.add(e); () })
    t.start(); t.join()
    assert(errs.isEmpty, s"concurrent caller failed: ${errs.peek()}")
    assert(mine.storageLevel.useMemory,
      "another thread's releaseAll stole this thread's staged frame")
    // A's release still frees A's frame
    Staged.releaseAll()
    assert(!mine.storageLevel.useMemory)
    assertNoNewBlocks(base, "thread-scoped release round-trip")
  }
}
