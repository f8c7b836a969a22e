package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.functions.BootstrapWeights]] bit-identical to the composed
  * md5 draw it replaced inside [[graft.ops.Sampling.poissonBootstrapCI]]:
  * same 60-bit order key, same Poisson(1) inverse CDF, same weights for
  * every (seed, replicate, id) — so the native rewrite can NEVER silently
  * shift the q126 interval. Also cross-pins the threshold literals the
  * expression carries against [[graft.ops.Sampling.poisson1Cum]]. */
class BootstrapWeightsSpec extends SparkSuite {
  import spark.implicits._

  test("bootstrap_weights: bit-identical to the composed md5/conv draw") {
    graft.functions.GraftFunctions.register(spark)
    val ids = Seq("1", "42", "99991", "doc x", "", "-7").toDF("id")
    val b = 32
    // composed form: exactly the pre-rewrite expression tree
    val u = (graft.ops.Shard.orderKey(
      concat_ws(" ", lit("s1"), col("rep"), col("id")), "bs") + 0.5)
      .cast("double") / lit(1152921504606846976.0)
    val w = graft.ops.Sampling.poisson1Cum.zipWithIndex
      .foldRight(lit(6): org.apache.spark.sql.Column) { case ((c, k), acc) =>
        when(u < c, k).otherwise(acc) }
    val composed = ids
      .select(col("id"), explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .select(col("id"), col("rep"), w.cast("long").as("w"))
    val native = ids
      .select(col("id"),
        posexplode(call_function("bootstrap_weights",
          col("id"), lit("s1"), lit(b))).as(Seq("rep", "w")))
    val joined = composed.alias("c")
      .join(native.alias("n"), Seq("id", "rep"))
      .select(col("id"), col("rep"), col("c.w").as("cw"), col("n.w").as("nw"))
      .collect()
    assert(joined.length == ids.count() * b)
    joined.foreach { r =>
      assert(r.getAs[Long]("cw") == r.getAs[Long]("nw"),
        s"weight mismatch at id=${r.get(0)} rep=${r.get(1)}: $r")
    }
    // weights actually vary (a constant array would trivially "match")
    assert(joined.map(_.getAs[Long]("nw")).distinct.length > 1)
  }

  test("bootstrap_weights: null id yields null, b must be positive") {
    graft.functions.GraftFunctions.register(spark)
    val row = Seq(Option.empty[String]).toDF("id")
      .select(call_function("bootstrap_weights", col("id"), lit("s"), lit(4)))
      .collect().head
    assert(row.isNullAt(0))
    val err = intercept[Exception] {
      Seq("a").toDF("id")
        .select(call_function("bootstrap_weights", col("id"), lit("s"), lit(0)))
        .collect()
    }
    assert(err.getMessage != null)
  }
}
