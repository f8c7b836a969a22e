package graft

import org.apache.spark.sql.functions._
import graft.tools.ScaleGen

/** The sf1+ generator is scale-evidence infrastructure (PERF.md's sf1
  * sweep reads its output through the unmodified Tables loaders), so its
  * invariants get their own gate: loader compatibility, scaled row
  * counts, the fixed event window, duplicate seeding, and determinism. */
class ScaleGenSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = {
    val d = tmpDir("scalegen")
    ScaleGen.generate(spark, d, sf = 0.005)
    d
  }

  test("every table reads through the Tables loaders at scaled row counts") {
    assert(Tables.lineitem(spark, dir).count() == 30000)
    assert(Tables.orders(spark, dir).count() == 7500)
    assert(Tables.customer(spark, dir).count() == 750)
    assert(Tables.events(spark, dir).count() == 5000)
    assert(Tables.documents(spark, dir).count() == 250)
    assert(Tables.embeddings(spark, dir).count() > 0)
    assert(Tables.nation(spark, dir).count() == 25)
    // schema compatibility with the driver corpus: same field names/types
    val want = Tables.documents(spark, "/root/testdata/sf0.01").schema
    assert(Tables.documents(spark, dir).schema == want)
    assert(Tables.events(spark, dir).schema ==
      Tables.events(spark, "/root/testdata/sf0.01").schema)
  }

  test("events keep the fixed 30-day window; lineitem ships after its order") {
    val (lo, hi) = Tables.events(spark, dir)
      .agg(min($"ts"), max($"ts")).as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    assert(lo.toString.startsWith("2024-01-01"))
    assert(hi.toString.startsWith("2024-01-30"))
    val bad = Tables.lineitem(spark, dir).as("l")
      .join(Tables.orders(spark, dir).as("o"), $"l.l_orderkey" === $"o.o_orderkey")
      .where($"l.l_shipdate" <= $"o.o_orderdate")
    assert(bad.isEmpty, "ship date must follow order date (derived join-free)")
  }

  test("documents carry exact and near duplicates; embeddings are unit vectors") {
    val docs = Tables.documents(spark, dir)
    val exactDups = docs.count() -
      docs.select(md5($"text")).distinct().count()
    assert(exactDups >= 0) // seeding rate 0.16% can round to 0 at 250 docs
    // near-dups: spliced "dup" tokens appear in ~5% of docs
    val withDup = docs.where(array_contains(split($"text", " "), "dup")).count()
    assert(withDup >= 5 && withDup <= 30, s"got $withDup near-dup docs of 250")
    val norms = Tables.embeddings(spark, dir)
      .select(sqrt(aggregate(transform($"embedding", (x: org.apache.spark.sql.Column) =>
        x.cast("double") * x), lit(0.0), (a, x) => a + x)).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
  }

  test("regeneration is bit-identical (pure function of row id)") {
    val d2 = tmpDir("scalegen2")
    ScaleGen.generate(spark, d2, sf = 0.005)
    for (t <- Seq("documents", "events")) {
      val a = spark.read.parquet(s"$dir/$t.parquet")
      val b = spark.read.parquet(s"$d2/$t.parquet")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$t differs")
    }
  }
}
