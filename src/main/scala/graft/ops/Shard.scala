package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic shuffled sharding — the training-data EXPORT step: a
  * curated corpus leaves the engine as N shard files whose global row
  * order is a seeded pseudo-random permutation (training consumes shards
  * sequentially, so inter-document correlation must be broken at export
  * time, not by the data loader), reproducible bit-for-bit from (corpus,
  * seed) alone.
  *
  * Spark shape, sized for 100 TB:
  *
  *  - the order key is a seed-salted md5 projection (codegen'd, fused
  *    into the scan — no shuffle to DECIDE placement, unlike
  *    `orderBy(rand(seed))` whose rand is partition-index-dependent and
  *    whose global sort is a range-exchange over the full corpus);
  *  - shard assignment is `key mod nShards`, so a shard's membership is
  *    a pure function of the row — shards can be written independently,
  *    re-written incrementally, and verified by re-hashing;
  *  - within-shard order is ONE hash-partitioned sort (`row_number` over
  *    a shard-partitioned window): the only exchange in the plan, sized
  *    by nShards, with no global ordering bottleneck. At 100 TB /
  *    100 k shards each sort is ~1 GB — executor-local work.
  *
  * Engine-portable: the key is built from md5 hex (same discipline as
  * [[Sampling]]) so an external system — or the DuckDB oracle — can
  * recompute placement exactly: Spark `conv(substr(md5(x),1,15),16,10)`
  * ≡ DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`. 15 nibbles =
  * 60 bits, inside both engines' signed-64 range.
  *
  * Reference anchor: the reference has no export stage (its gold sink
  * is an analytics table — `gold_aggregate.py` writes windowed
  * aggregates); this is north-star surface for the curation pipeline.
  */
object Shard {

  /** Seed-salted 60-bit order key: `md5(seed + " " + key)` parsed from hex.
    * Uniform, deterministic, identical across engines and partitionings. */
  def orderKey(key: Column, seed: String): Column =
    conv(substring(md5(concat_ws(" ", lit(seed), key.cast("string"))),
      1, 15), 16, 10).cast("long")

  /** Assign every row a shard (0-based, `key mod nShards`) and its
    * 0-based position within the shard's seeded shuffle order. Output =
    * input columns + `ord`, `shard`, `pos`. Ties on `ord` (md5
    * collisions truncated to 60 bits) break on the key itself, keeping
    * the permutation total and reproducible. */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
                  seed: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    df.withColumn("ord", orderKey(col(keyCol), seed))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("ord"), col(keyCol)))
        - 1).cast("long"))
  }

  /** Write the corpus as `nShards` shard directories, rows stored in
    * shuffle order: one exchange keyed by shard, an executor-local sort,
    * one file per shard (`maxRecordsPerFile` would split oversized
    * shards; membership keeps files self-describing). Returns the
    * written path. */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int, seed: String,
                  path: String): String = {
    df.withColumn("ord", orderKey(col(keyCol), seed))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      // shard leads the sort so the dynamic-partition writer's required
      // ordering (partition columns first) is already satisfied — else
      // FileFormatWriter inserts its own shard-only sort, which is not
      // stable and would scramble the shuffle order inside each shard
      .sortWithinPartitions(col("shard"), col("ord"), col(keyCol))
      .drop("ord")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    path
  }

  /** Integrity manifest of a placement: per shard, row count and the md5
    * checksum of the key sequence in shuffle position order. A re-run,
    * another engine, or a read-back of the written files must reproduce
    * every checksum (ShardSpec proves the read-back; the q112 oracle
    * proves DuckDB). Per-shard fold over the placement — the checksum
    * concatenation is bounded by shard size, and shard count is chosen so
    * shards are file-sized. */
  def manifest(df: DataFrame, keyCol: String, nShards: Int,
               seed: String): DataFrame =
    shardAssign(df, keyCol, nShards, seed)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_rows"),
        md5(array_join(
          transform(array_sort(collect_list(struct($"pos", col(keyCol)))),
            x => x.getField(keyCol).cast("string")), ",")).as("checksum"))

  /** [[writeShards]] plus a `_manifest` parquet next to the shard dirs
    * (underscore-prefixed, so shard reads ignore it). The export and its
    * integrity datasheet come from the same placement arithmetic — a
    * consumer verifies a shard by folding the key column in stored order
    * and comparing one hash. */
  def writeShardsWithManifest(df: DataFrame, keyCol: String, nShards: Int,
                              seed: String, path: String): String = {
    writeShards(df, keyCol, nShards, seed, path)
    manifest(df, keyCol, nShards, seed)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    path
  }

  /** Incremental placement: append a delta batch to an EXISTING export
    * without touching the already-written shards. Shard membership uses
    * the same `key mod nShards` rule (a doc lands where a full re-export
    * would put it), and positions continue after the base counts — so an
    * appended shard file concatenates cleanly behind the existing one and
    * the manifest extends additively. `baseCounts` is (shard, n_rows) —
    * typically read straight from the existing `_manifest`, a
    * shard-count-sized frame that broadcasts. The delta pays one
    * shard-partitioned sort; the base corpus is NOT rescanned — the whole
    * point at 100 TB, where re-exporting for a 0.1% drop is absurd. */
  def appendAssign(baseCounts: DataFrame, delta: DataFrame, keyCol: String,
                   nShards: Int, seed: String): DataFrame =
    shardAssign(delta, keyCol, nShards, seed)
      .join(broadcast(baseCounts.select($"shard",
        $"n_rows".cast("long").as("__base_n"))), Seq("shard"), "left")
      .withColumn("pos", $"pos" + coalesce($"__base_n", lit(0L)))
      .drop("__base_n")
}
