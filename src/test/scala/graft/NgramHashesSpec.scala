package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** Pins [[graft.functions.NgramHashes]] bit-identical to the composed
  * form it replaced in q265 —
  * `array_distinct(transform(Text.shingles(text, n), x =>
  * xxhash64(lit(n), x)))` — including seed chaining, the space join,
  * first-occurrence dedup order, and the fewer-than-n-tokens empty
  * array. */
class NgramHashesSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a a a a",                       // heavy dup n-grams
    "one two three",                          // shorter than the larger n
    "x",                                      // shorter than every n
    "unicode töken café 中文 mixed in here ok fine",
    ""                                        // empty text
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("ngram_hashes: bit-identical to composed shingle-hash form") {
    graft.functions.GraftFunctions.register(spark)
    for (n <- Seq(2, 4, 13)) {
      val composed = docs.select($"id",
        array_distinct(transform(Text.shingles($"text", n),
          x => xxhash64(lit(n), x))).as("hs"))
      val native = docs.select($"id",
        call_function("ngram_hashes", Text.tokens($"text"), lit(n)).as("hs"))
      val c = composed.orderBy($"id").collect().map(_.getSeq[Long](1))
      val nv = native.orderBy($"id").collect().map(_.getSeq[Long](1))
      assert(c.length == nv.length)
      c.zip(nv).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"n=$n doc=$i: composed=$a native=$b")
      }
    }
  }

  test("ngram_hashes: null tokens degrade to the seed, matching the composed form (no NPE)") {
    graft.functions.GraftFunctions.register(spark)
    // the SQL function accepts array<string> with containsNull=true —
    // an array built with explicit nulls exercises the guard. The
    // composed-equivalent semantics: every window containing a null
    // token hashes to xxhash64(lit(n)) (the null child is skipped), so
    // the expected set is the non-null windows' hashes plus the seed.
    val arr = typedLit(Seq[Option[String]](
      Some("alpha"), None, Some("beta"), Some("gamma"), None))
    for (n <- Seq(2, 3)) {
      val got = spark.range(1)
        .select(call_function("ngram_hashes", arr, lit(n)).as("hs"))
        .collect().head.getSeq[Long](0)
      // composed reference on the same array (shingle join via
      // aggregate-free concat chain is Text-internal; replicate with a
      // window scan here): null-containing windows → seed
      val toks = Seq[Option[String]](
        Some("alpha"), None, Some("beta"), Some("gamma"), None)
      val seed = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(n, 42L)
      val expect = toks.sliding(n).map { w =>
        if (w.exists(_.isEmpty)) seed
        else {
          val bytes = w.map(_.get).mkString(" ").getBytes("UTF-8")
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, seed)
        }
      }.toSeq.distinct
      assert(got == expect, s"n=$n: got=$got expect=$expect")
    }
  }

  test("ngram_hashes: hashes vary across n and text") {
    graft.functions.GraftFunctions.register(spark)
    val all = docs.select(
        explode(call_function("ngram_hashes", Text.tokens($"text"), lit(3)))
          .as("h"))
      .collect().map(_.getLong(0))
    assert(all.nonEmpty && all.distinct.length > 1)
  }
}
