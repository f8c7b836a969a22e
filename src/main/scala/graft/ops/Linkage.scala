package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match dirty records against a
  * master table — the merge/purge step every ingested catalog, author
  * list, or source registry runs before counting anything per entity.
  * (The reference has no counterpart; this extends the dedup family from
  * "same content" to "same entity, differently spelled".)
  *
  * Shape (the 100 TB posture): no all-pairs anywhere.
  *
  *  1. Both sides project to a CANONICAL BLOCKING KEY — lowercase, strip
  *     non-alphanumerics, sort tokens, truncate each token to a prefix.
  *     Token swaps and case/punctuation noise collapse to the same key;
  *     a short suffix typo survives truncation. Map-side, codegen'd.
  *  2. The master collapses to its NAME VOCABULARY per key
  *     (`groupBy(key, name) → min(id)`): edit distance depends only on
  *     the name, so a name shared by a million master rows verifies
  *     once, and the join side is vocabulary-sized, not row-sized.
  *  3. One equi-join on the key; Levenshtein verifies inside the block
  *     (order-insensitive: the distance runs over the sorted-token
  *     normal form, so swapped tokens score 0); per-dirty-record top-1
  *     by (distance, master id).
  *
  * Recall bounds are explicit: a typo inside the first `prefixLen`
  * characters of a token changes the key and the pair is missed — the
  * standard blocking trade. Widen with a second pass on a different key
  * (e.g. reversed-prefix) if the miss rate matters.
  */
object Linkage {

  /** Sorted-token normal form: lowercase, strip non-alphanumerics,
    * tokens sorted — token order and case/punctuation noise vanish. */
  def normalForm(name: Column): Column =
    array_join(array_sort(
      split(trim(regexp_replace(lower(name), "[^a-z0-9 ]", "")), " +")), " ")

  /** Blocking key: the normal form with each token truncated to
    * `prefixLen` chars — tolerates suffix typos at block-assignment
    * time while keeping blocks small. */
  def blockingKey(name: Column, prefixLen: Int = 4): Column =
    array_join(array_sort(transform(
      split(trim(regexp_replace(lower(name), "[^a-z0-9 ]", "")), " +"),
      t => substring(t, lit(1), lit(prefixLen)))), " ")

  /** Best master match per dirty record: rows (dirty_id, dirty_name,
    * master_id, master_name, edit_dist), at most one per dirty record,
    * only where the blocked Levenshtein distance (on normal forms) is
    * ≤ `maxDist`. `master_id` is the smallest id carrying the matched
    * name (deterministic). Unmatched dirty records emit no row — the
    * caller left-antis if it wants the residue. */
  def matchToMaster(dirty: DataFrame, dirtyIdCol: String,
                    master: DataFrame, masterIdCol: String,
                    nameCol: String, maxDist: Int,
                    prefixLen: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1: $prefixLen")
    val mNames = master
      .groupBy(blockingKey(col(nameCol), prefixLen).as("__key"),
        normalForm(col(nameCol)).as("__mname"))
      .agg(min(col(masterIdCol)).as("master_id"))
    val d = dirty.select(col(dirtyIdCol).as("dirty_id"),
      col(nameCol).as("dirty_name"),
      normalForm(col(nameCol)).as("__dname"),
      blockingKey(col(nameCol), prefixLen).as("__key"))
    val scored = d.join(mNames, Seq("__key"))
      .withColumn("edit_dist", levenshtein($"__dname", $"__mname"))
      .where($"edit_dist" <= maxDist)
    Windows.topNPerGroup(scored, Seq($"dirty_id"),
        Seq($"edit_dist".asc, $"master_id".asc), 1)
      .select($"dirty_id", $"dirty_name", $"master_id",
        $"__mname".as("master_name"), $"edit_dist")
  }
}
