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
    *    live directory is renamed aside and the publish retried once —
    *    the republish window presents a complete (old) store rather
    *    than a hole, and the aside copy is deleted after the new store
    *    lands.
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
      // complete table under the .old name until cleanup
      val old = new Path(s"$path.old-$nonce")
      if (atomicRename(fs, live, old)) {
        won = atomicRename(fs, tmp, live)
        if (!won) atomicRename(fs, old, live) // put the old store back
        // only if the live path is still free (a winner filled it)
        if (fs.exists(old)) fs.delete(old, true)
      }
    }
    if (!won) {
      log.warn(s"StoreIO.publish: lost the publish race for $path — " +
        "discarding this writer's temp store and deferring to the winner")
      fs.delete(tmp, true)
    }
    won
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
