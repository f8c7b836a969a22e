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

  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
