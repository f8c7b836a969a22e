package graft

/** Independent (non-hash) cross-checks for the two golden-pinned queries
  * that had none (the rest of the golden set is covered by per-family
  * property/recall/bit-equality specs — COVERAGE.md names each): q105's
  * per-language BPE fertility is recomputed through the ScalaUDF
  * reference encoder and a driver-side fold, and q125's deflate ratio is
  * recomputed through a FRESH java.util.zip.Deflater written here (not
  * through [[graft.functions.GraftCompress]], which is the very code the
  * query's expression calls). Either check failing while the golden file
  * still matches would mean the pinned output itself is wrong — the gap
  * hashes cannot see. */
class GoldenCoverageSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q105 fertility ≡ ScalaUDF reference encode + driver-side fold") {
    val docs = Tables.documents(spark, sf)
    val model = graft.ops.Bpe.trainedModel(docs, "text", nMerges = 50)
    // reference path: the UDF encoder (independent implementation of the
    // merge loop) + plain Scala aggregation of the collected rows
    val ref = graft.ops.Bpe.encodeUdf(
        docs.select($"doc_id", $"lang", $"text"), "text", model)
      .select($"lang", graft.ops.Text.tokenCount($"text").as("w"),
        org.apache.spark.sql.functions.size($"bpe_tokens").as("b"))
      .as[(String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues { rows =>
        (rows.length.toLong, rows.map(_._2).sum, rows.map(_._3.toLong).sum)
      }.toMap
    val got = SparkEntry.queries("q105_fertility")(spark, sf)
      .select("lang", "n_docs", "n_words", "n_bpe_tokens", "fertility")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty && got.map(_._1).toSet == ref.keySet)
    got.foreach { case (lang, nDocs, nWords, nBpe, fert) =>
      val (rDocs, rWords, rBpe) = ref(lang)
      assert(nDocs == rDocs, s"$lang n_docs $nDocs vs $rDocs")
      assert(nWords == rWords, s"$lang n_words $nWords vs $rWords")
      assert(nBpe == rBpe, s"$lang n_bpe_tokens $nBpe vs $rBpe (native " +
        "encode diverged from the ScalaUDF reference on the corpus)")
      assert(fert == round6(rBpe.toDouble / rWords),
        s"$lang fertility $fert vs ${round6(rBpe.toDouble / rWords)}")
      assert(fert >= 1.0, s"$lang fertility $fert < 1 — a word must " +
        "encode to at least one token")
    }
  }

  test("q125 compress_ratio ≡ an independently-written zlib pass") {
    // the check's own deflater, NOT GraftCompress (that is the expression
    // under test); same parameters the query documents: level 6, raw
    // ratio compressed/input bytes, empty input defined as 1.0
    def refRatio(text: String): Double = {
      val bytes = text.getBytes("UTF-8")
      if (bytes.isEmpty) 1.0
      else {
        val d = new java.util.zip.Deflater(6)
        try {
          d.setInput(bytes); d.finish()
          val buf = new Array[Byte](8192)
          var total = 0L
          while (!d.finished()) total += d.deflate(buf)
          total.toDouble / bytes.length
        } finally d.end()
      }
    }
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("q125_compress_ratio")(spark, sf)
      .select("doc_id", "compress_ratio").as[(Long, Double)].collect()
    assert(got.length == texts.size)
    got.foreach { case (id, r) =>
      assert(r == round6(refRatio(texts(id))),
        s"doc $id ratio $r vs ${round6(refRatio(texts(id)))}")
    }
  }
}
