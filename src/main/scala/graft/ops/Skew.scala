package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins: salt the skewed (fact) side
  * into `saltFactor` sub-keys and replicate the build side across every
  * salt value, so one hot key spreads over `saltFactor` reducers instead
  * of melting a single one. AQE's skew-join handles moderate skew
  * automatically at runtime; explicit salting is the deterministic tool
  * for the pathological keys (a null-heavy foreign key, a celebrity user)
  * known in advance.
  *
  * The salt is derived from `xxhash64` of the fact side's whole row
  * (`struct(*)`) — deterministic, no RNG, uniform enough for spreading.
  */
object Skew {

  /** Fact-side-preserving join types only: the dim side is replicated
    * across all `saltFactor` salts, so any type that can emit an
    * *unmatched dim row* (right/full outer) would emit it saltFactor
    * times. */
  private val safeJoinTypes =
    Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(safeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin replicates the dim side; join type '$joinType' would " +
        "duplicate unmatched dim rows (supported: inner/cross/left/left_semi/left_anti)")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
