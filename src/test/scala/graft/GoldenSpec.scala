package graft

/** Hash-level regression gate for the no-oracle queries: recompute each
  * at sf0.01 and require bit-identical output vs the committed golden
  * files (see [[Golden]]; regenerate with `Test/runMain graft.GoldenGen`
  * only for an intended semantic change). */
class GoldenSpec extends SparkSuite {
  Golden.queries.foreach { name =>
    test(s"$name matches its committed sf0.01 golden file") {
      val stream = getClass.getResourceAsStream(s"/golden/$name.tsv")
      assert(stream != null, s"missing golden file for $name — run Test/runMain graft.GoldenGen")
      val expected = scala.io.Source.fromInputStream(stream, "UTF-8").getLines().toSeq
      val actual = Golden.canon(SparkEntry.queries(name)(spark, Golden.sfDir))
      if (actual != expected) {
        val firstBad = actual.zipAll(expected, "<missing>", "<missing>")
          .zipWithIndex.find { case ((a, e), _) => a != e }
        fail(s"$name diverges from golden (${actual.size - 1} vs ${expected.size - 1} rows); " +
          firstBad.map { case ((a, e), i) => s"first diff at line $i:\n  actual:   $a\n  expected: $e" }
            .getOrElse(""))
      }
    }
  }
}
