package graft.tools

import java.io.File

/** Store-lifecycle janitor for the persisted-derivation store root
  * (`graft.queries.Stores.root`): [[graft.ops.StoreIO.publish]] can
  * strand `.tmp-<nonce>` dirs (a writer crashed between its temp write
  * and rename) and intentionally LEAVES `.old-<nonce>` aside copies for
  * in-flight readers (deferred cleanup — see `StoreIO.sweepOrphans`).
  * Publishes at a path sweep that path's own aged orphans, but a store
  * that is never republished keeps its debris forever and abandoned
  * corpus fingerprints accumulate whole stores — this tool is the
  * one-command cleanup (documented in README):
  *
  *   sbt "runMain graft.tools.StoreGc [--apply] [--grace-minutes N] [--max-age-days D]"
  *
  * Default is a DRY RUN (report only). `--apply` deletes:
  *  - orphans (`*.tmp-*` / `*.old-*`) older than the grace (default
  *    [[graft.ops.StoreIO.OrphanGraceMs]]);
  *  - with `--max-age-days D`, whole stores untouched for D days —
  *    abandoned corpus fingerprints (every store is a pure derivation:
  *    deleting one costs exactly one re-derivation if its corpus ever
  *    returns, never correctness).
  *
  * The staleness report lists every live store with its kind, corpus
  * fingerprint (from the path), age since last modification, and
  * recursive size — the inventory an operator reads before widening
  * `--max-age-days`. Local-filesystem scope, matching where
  * `Stores.root` lives; an HDFS deployment runs the same sweep via
  * `StoreIO.sweepOrphans` per store path. */
object StoreGc {

  final case class Entry(name: String, kind: String, orphan: Boolean,
                         ageMs: Long, sizeBytes: Long)
  final case class Report(root: String, entries: Seq[Entry],
                          removed: Seq[String])

  private def du(f: File): Long =
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(du).sum
    else f.length()

  /** Newest mtime anywhere under `f` — a store's "last touched". */
  private def newestMtime(f: File): Long = {
    val own = f.lastModified()
    if (!f.isDirectory) own
    else (own +: Option(f.listFiles()).toSeq.flatten.map(newestMtime)).max
  }

  /** One sweep over `root`. Pure given (root state, now): classifies
    * every child as a live store or an orphan, removes (when `apply`)
    * orphans past `graceMs` and live stores past `maxAgeMs` (∞ = keep),
    * and returns the full inventory. Exposed for StoreGcSpec. */
  def sweep(root: File, graceMs: Long, maxAgeMs: Long = Long.MaxValue,
            apply: Boolean = false,
            now: Long = System.currentTimeMillis()): Report = {
    val children = Option(root.listFiles()).toSeq.flatten.sortBy(_.getName)
    val entries = children.map { f =>
      val orphan = f.getName.contains(".tmp-") || f.getName.contains(".old-")
      val kind = f.getName.takeWhile(_ != '-')
      Entry(f.getName, kind, orphan, now - newestMtime(f), du(f))
    }
    def rmTree(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
      f.delete(); ()
    }
    val doomed = entries.filter { e =>
      (e.orphan && e.ageMs > graceMs) || (!e.orphan && e.ageMs > maxAgeMs)
    }
    if (apply) doomed.foreach(e => rmTree(new File(root, e.name)))
    Report(root.getPath, entries, doomed.map(_.name))
  }

  def main(args: Array[String]): Unit = {
    val apply = args.contains("--apply")
    def flag(name: String): Option[Long] = {
      val i = args.indexOf(name)
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1).toLong) else None
    }
    val graceMs = flag("--grace-minutes").map(_ * 60000L)
      .getOrElse(graft.ops.StoreIO.OrphanGraceMs)
    val maxAgeMs = flag("--max-age-days").map(_ * 86400000L)
      .getOrElse(Long.MaxValue)
    val root = new File(graft.queries.Stores.root)
    val r = sweep(root, graceMs, maxAgeMs, apply)
    val entriesJson = r.entries.map { e =>
      s"""{"name":"${e.name}","kind":"${e.kind}","orphan":${e.orphan},""" +
        s""""age_hours":${e.ageMs / 3600000.0},"size_bytes":${e.sizeBytes}}"""
    }.mkString("[", ",", "]")
    val removedJson = r.removed.map(n => s""""$n"""").mkString("[", ",", "]")
    println(s"""{"tool":"store_gc","root":"${r.root}","dry_run":${!apply},""" +
      s""""n_stores":${r.entries.count(!_.orphan)},""" +
      s""""n_orphans":${r.entries.count(_.orphan)},""" +
      s""""stores":$entriesJson,""" +
      s""""${if (apply) "removed" else "would_remove"}":$removedJson}""")
  }
}
