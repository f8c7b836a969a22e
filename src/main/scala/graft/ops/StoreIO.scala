package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared plumbing for the persisted-derivation stores (near-dup pair
  * table, cluster table, PCA / k-means models, IVF index): honest
  * fingerprints and atomic publish.
  *
  * Two defects this module exists to close (round-10 advice):
  *
  *  - FINGERPRINT WIDTH. `MurmurHash3.stringHash(...).toLong` is a
  *    32-bit value in a 64-bit coat — at ~77 k keys the birthday bound
  *    gives even odds of a collision, and a cross-session store that
  *    collides is silently served the WRONG table. [[StoreIO.fp64]] /
  *    [[StoreIO.fpOrdered64]] combine two independently-seeded 32-bit
  *    murmurs into an honest 64-bit key (collision odds at the same
  *    population: ~2⁻³²).
  *
  *  - PUBLISH ATOMICITY. `write.mode("overwrite")` into the live store
  *    path means a reader overlapping a republish can see a transient
  *    mixed state (new meta + half-deleted data, or vice versa), and two
  *    JVMs racing a cold store corrupt each other. [[StoreIO.publish]]
  *    writes the whole store into `path.tmp-<nonce>` and RENAMES the
  *    directory over the live path — rename is atomic on every
  *    filesystem the store targets (POSIX local, HDFS), so readers see
  *    either the complete old store or the complete new one, never a
  *    mixture. A writer that loses the rename race simply discards its
  *    temp dir: the winner published the same pure function of the same
  *    inputs.
  */
object StoreIO {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Honest 64-bit string hash: two independently-seeded 32-bit murmurs
    * packed high/low. */
  def fp64(s: String): Long = {
    val hi = scala.util.hashing.MurmurHash3.stringHash(s, 0x9E3779B9)
    val lo = scala.util.hashing.MurmurHash3.stringHash(s, 0x85EBCA6B)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** Honest 64-bit ordered-sequence hash, same two-seed construction. */
  def fpOrdered64[T](xs: Iterable[T]): Long = {
    val hi = scala.util.hashing.MurmurHash3.orderedHash(xs, 0x9E3779B9)
    val lo = scala.util.hashing.MurmurHash3.orderedHash(xs, 0x85EBCA6B)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** Atomically publish a store directory: `write` fills a fresh temp
    * sibling (`path.tmp-<nonce>`), which is then renamed over `path`.
    *
    * Concurrency contract (provable with local-FS rename semantics):
    *  - a READER never observes partial state — every transition of the
    *    live path is a whole-directory rename, so it flips between
    *    complete stores in one metadata operation;
    *  - with `replaceExisting = false` (the read-through COLD branch),
    *    a concurrent second writer is a strict no-op: the plain rename
    *    is attempted FIRST, whichever lands second fails (destination
    *    exists), and the loser deletes its temp dir and returns `false`
    *    so the caller reloads the winner's store and re-checks
    *    fingerprints (both writers derived the same pure function, so
    *    the check passes). Without this flag, a cold-race loser whose
    *    existence check ran after the winner's rename would mistake the
    *    winner's FRESH store for a stale one and swap it out — both
    *    writers "winning" (the round-11 publish-race flake);
    *  - with `replaceExisting = true` (the caller OBSERVED a stale
    *    store, or an unconditional pipeline publish), a conflicting
    *    live directory is renamed aside and the publish retried once.
    *    CAVEAT (not a full guarantee): between the aside-rename and the
    *    fresh rename the live path briefly does not exist, so a
    *    concurrent reader's existence check in that window sees a cold
    *    slot and pays a spurious (correct, just redundant) re-derivation;
    *    a reader that already RESOLVED the old directory's files keeps
    *    reading them under the `.old-<nonce>` name — which is why the
    *    aside copy is NOT deleted inline: it ages out via
    *    [[sweepOrphans]] (next publish at this path, or
    *    `graft.tools.StoreGc`) after [[OrphanGraceMs]], long past any
    *    in-flight scan.
    *
    * Returns true when this writer's store is the one now live. */
  def publish(spark: SparkSession, path: String,
              replaceExisting: Boolean = true)(write: String => Unit): Boolean = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val tmp = new Path(s"$path.tmp-$nonce")
    write(tmp.toString)
    // fresh-slot attempt first: on a cold store this is the whole
    // publish, and in a cold race it is what makes exactly one winner
    var won = atomicRename(fs, tmp, live)
    if (!won && replaceExisting) {
      // stale republish: move the old store aside (atomic) so the live
      // path is free; readers that already resolved the old path keep a
      // complete table under the .old name until the GRACE-AGED sweep
      // below (never an inline delete — an in-flight scan of the old
      // files must be able to finish)
      val old = new Path(s"$path.old-$nonce")
      if (atomicRename(fs, live, old)) {
        won = atomicRename(fs, tmp, live)
        if (!won) atomicRename(fs, old, live) // put the old store back
        // only if the live path is still free (a winner filled it)
      }
    }
    if (!won) {
      log.warn(s"StoreIO.publish: lost the publish race for $path — " +
        "discarding this writer's temp store and deferring to the winner")
      fs.delete(tmp, true)
    }
    // deferred lifecycle: sweep THIS path's aged `.old-*` / `.tmp-*`
    // siblings (previous republishes' aside copies, crashed writers'
    // temp dirs). Grace-aged so in-flight readers of a just-replaced
    // store finish; a crash before this line leaves orphans that the
    // next publish — or tools.StoreGc — removes.
    sweepOrphans(fs, path)
    won
  }

  /** Age after which an orphaned `.old-<nonce>` / `.tmp-<nonce>` sibling
    * of a store path is eligible for removal (15 min — orders of
    * magnitude past any single store scan; override for tests via
    * [[sweepOrphans]]' `graceMs`). */
  val OrphanGraceMs: Long = 15L * 60 * 1000

  /** Remove AGED orphan siblings of `path`: directories named
    * `<store>.old-*` (aside copies from stale republishes) or
    * `<store>.tmp-*` (crashed writers — a clean loser deletes its own).
    * Age = the directory's own modification time vs now; younger
    * orphans are left for in-flight readers. Returns the paths removed.
    * Never touches the live store or other stores' directories. */
  def sweepOrphans(fs: org.apache.hadoop.fs.FileSystem, path: String,
                   graceMs: Long = OrphanGraceMs): Seq[String] = {
    val live = new Path(path)
    val parent = live.getParent
    if (parent == null || !fs.exists(parent)) return Nil
    val prefixes = Seq(s"${live.getName}.old-", s"${live.getName}.tmp-")
    val now = System.currentTimeMillis()
    try {
      fs.listStatus(parent).toSeq
        .filter(st => prefixes.exists(st.getPath.getName.startsWith))
        .filter(st => now - st.getModificationTime > graceMs)
        .map { st =>
          log.info(s"StoreIO.sweepOrphans: removing aged orphan ${st.getPath}")
          fs.delete(st.getPath, true)
          st.getPath.toString
        }
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"StoreIO.sweepOrphans: sweep under $parent failed " +
          s"(${e.getMessage}) — orphans left for the next publish/StoreGc")
        Nil
    }
  }

  /** Checked read-through shared by the (data + one-row meta) stores
    * (centroid predictions, LM scores, quality-classifier scores): load
    * the published table when the store's meta row matches `want` =
    * (corpus fingerprint, plan fingerprint, algorithm version); on a
    * stale or cold store run `publishStore` (which must write data AND
    * meta through [[publish]] — `replaceStale` forwards publish's
    * replaceExisting) and re-load, failing loudly if the meta it finds
    * afterwards is not its own (a concurrent writer with different
    * inputs).
    *
    * Cold-vs-stale distinction matters for race safety: a truly cold
    * slot publishes with strict no-replace semantics (a cold-race loser
    * must defer to the winner, not swap it out), while an
    * occupied-but-stale/unreadable store is replaced. */
  def readThrough(spark: SparkSession, path: String, dataDir: String,
                  want: (Long, Long, Int), label: String)
                 (publishStore: Boolean => Unit)
                 (load: () => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    def haveMeta(): Option[(Long, Long, Int)] = {
      import spark.implicits.newProductEncoder
      if (!fs.exists(new Path(s"$path/meta")) ||
          !fs.exists(new Path(s"$path/$dataDir"))) None
      else scala.util.Try(
        spark.read.parquet(s"$path/meta")
          .select(col("corpus_fp").cast("long"), col("plan_fp").cast("long"),
            col("algo_version").cast("int"))
          .as[(Long, Long, Int)].head()).toOption
    }
    def computeAndPublish(replaceStale: Boolean): org.apache.spark.sql.DataFrame = {
      publishStore(replaceStale)
      if (!haveMeta().contains(want)) sys.error(
        s"$label: store at $path does not match its own publish " +
          s"(want $want) — concurrent writer with different inputs?")
      load()
    }
    haveMeta() match {
      case Some(have) if have == want => load()
      case Some(have) =>
        log.warn(s"$label: store at $path is stale (have $have, " +
          s"want $want) — re-deriving and republishing")
        computeAndPublish(replaceStale = true)
      case None =>
        // a truly cold slot gets the strict no-replace publish; an
        // occupied-but-unreadable store must be REPLACED
        computeAndPublish(replaceStale = fs.exists(new Path(path)))
    }
  }

  /** The standard one-row staleness meta of a [[readThrough]] store,
    * written into the temp dir during [[publish]]. */
  def writeMeta(spark: SparkSession, tmp: String,
                want: (Long, Long, Int)): Unit = {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    Seq(want).toDF("corpus_fp", "plan_fp", "algo_version")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
  }

  /** Directory rename with FAIL-if-destination-exists semantics on every
    * backend. On `file:` this goes straight to rename(2)
    * (`Files.move(ATOMIC_MOVE)`) — necessary because Hadoop's
    * `RawLocalFileSystem.rename` falls back to COPYING the source *into*
    * an existing destination directory and returning true, which would
    * make a race's loser "win" by dumping its temp dir inside the
    * winner's live store. On HDFS, `FileSystem.rename` already returns
    * false when the destination exists. Object stores without atomic
    * rename are outside this store design's contract (documented in
    * README — use an HDFS-semantics layer there). */
  private def atomicRename(fs: org.apache.hadoop.fs.FileSystem,
                           src: Path, dst: Path): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      try {
        Files.move(Paths.get(src.toUri.getPath), Paths.get(dst.toUri.getPath),
          StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.io.IOException => false }
    } else fs.rename(src, dst)
  }
}
