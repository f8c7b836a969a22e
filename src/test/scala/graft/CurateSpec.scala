package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curate, Sampling}

/** Curation operators: PII redaction (mask placement, counts, ordering),
  * Gopher gate (each rule fires independently, reason order fixed),
  * temperature mixing (rate math, flattening direction, determinism). */
class CurateSpec extends SparkSuite {
  import spark.implicits._

  test("redactPii masks emails, phones and IPs without cascading") {
    val rows = Seq(
      (1L, "mail a.b-c_d%x@sub.example.co.uk now"),
      (2L, "call 123-456-7890 or 999-555-0001"),
      (3L, "host 10.0.255.3 and 192.168.1.1"),
      (4L, "mixed bob@ex.org 555-123-4567 8.8.8.8"),
      (5L, "none of these: bob@, 12-34, 1.2.3"),
      (6L, "")).toDF("doc_id", "text")
    val got = Curate.redactPii(rows, "text")
      .select($"doc_id", $"clean_text", $"n_email", $"n_phone", $"n_ip")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "mail <EMAIL> now", 1, 0, 0),
      (2L, "call <PHONE> or <PHONE>", 0, 2, 0),
      (3L, "host <IP> and <IP>", 0, 0, 2),
      (4L, "mixed <EMAIL> <PHONE> <IP>", 1, 1, 1),
      (5L, "none of these: bob@, 12-34, 1.2.3", 0, 0, 0),
      (6L, "", 0, 0, 0)), got.mkString("\n"))
  }

  test("gopherGate: each rule fires independently, reasons in fixed order") {
    // 29 distinct 5-char words + "the": every metric in range
    val diverse = (0 until 29).map(i => f"word$i%02d").mkString(" ") + " the"
    val rows = Seq(
      (1L, diverse),
      // too short (6 diverse words incl a stopword)
      (2L, "word1 word2 word3 word4 word5 the"),
      // word length too small (distinct 2-char words + stopword "a")
      (3L, (0 until 29).map(i => ('a' + i % 26).toChar.toString +
        ('a' + i / 26).toChar).mkString(" ") + " a"),
      // no stopwords (distinct words otherwise fine)
      (4L, (0 until 30).map(i => f"term$i%02d").mkString(" ")),
      // one token stuttered: top_word_frac 25/30 >> 0.2, all else fine
      (5L, Seq.fill(25)("spark").mkString(" ") + " " +
        (0 until 4).map(i => f"fill$i%02d").mkString(" ") + " the"),
      // everything wrong: short, tiny words, no stopword, stuttered
      (6L, "zz zz zz")).toDF("doc_id", "text")
    val got = Curate.gopherGate(rows, "doc_id", "text")
      .select($"doc_id", $"passes", $"fail_reasons")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, true, ""),
      (2L, false, "n_words"),
      (3L, false, "mean_wlen"),
      (4L, false, "stop_frac"),
      (5L, false, "top_word_frac"),
      (6L, false, "n_words,mean_wlen,stop_frac,top_word_frac")),
      got.mkString("\n"))
  }

  test("topWordCount (sorted-run fold) equals the naive distinct×filter scan") {
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text") union Seq("", "a", "a a a", "b a b a b",
        "x y z x y z z").toDF("text")
    val cmp = texts.select(
      Curate.topWordCount(graft.ops.Text.tokens($"text")).as("fold"),
      Curate.topWordCountNaive(graft.ops.Text.tokens($"text")).as("naive"))
    assert(cmp.where($"fold" =!= $"naive").isEmpty,
      "fold and naive top-word counts must agree on every row")
  }

  test("temperatureRates flatten toward uniform as alpha drops") {
    // skewed: group a 800 rows, b 150, c 50
    val df = ((1L to 800L).map((_, "a")) ++ (801L to 950L).map((_, "b")) ++
      (951L to 1000L).map((_, "c"))).toDF("id", "g")
    def rates(alpha: Double) = Sampling.temperatureRates(df, "g", alpha, 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha = 1: proportional — every group keeps the target fraction
    val r1 = rates(1.0)
    assert(r1.values.forall(v => math.abs(v - 0.5) < 1e-9), r1.toString)
    // alpha < 1: dominant group admits at a LOWER rate than tail groups
    val r5 = rates(0.5)
    assert(r5("a") < r5("b") && r5("b") < r5("c"), r5.toString)
    // rates match the analytic formula (tail group c caps at 1.0 here:
    // uncapped 1.49 — the cap deliberately under-fills rather than
    // redistributing, so expected total is Σ n_g·min(1, ·), not target)
    val sw = Seq(800, 150, 50).map(math.sqrt(_).toDouble).sum
    for ((g, n) <- Seq("a" -> 800, "b" -> 150, "c" -> 50)) {
      val want = BigDecimal(math.min(1.0, 0.5 * 1000 * math.sqrt(n) / sw / n))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r5(g) - want) < 1e-9, s"$g: ${r5(g)} vs $want")
    }
    assert(r5("c") == 1.0, "tail group must cap at 1.0 on this skew")
    // alpha = 0: pure uniform-over-groups quota (n_g * rate equal)
    val r0 = rates(0.0)
    assert(math.abs(800 * r0("a") - 150 * r0("b")) < 1e-3 ||
      r0("b") >= 1.0, r0.toString) // b/c may cap at 1
  }

  test("pplBucketsScaled agrees with the exact ntile away from boundaries") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val approx = Curate.pplBucketsScaled(docs, "doc_id", "text")
      .select($"doc_id", $"bigram_logprob", $"ppl_bucket".as("b_approx"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"bigram_logprob".desc, $"doc_id")
    val exact = graft.ops.Text.bigramLogProb(docs, "doc_id", "text")
      .withColumn("n", ntile(3).over(w))
      .select($"doc_id",
        when($"n" === 1, "head").when($"n" === 2, "middle")
          .otherwise("tail").as("b_exact"))
    val j = approx.join(exact, Seq("doc_id")).collect()
      .map(r => (r.getString(2), r.getString(3)))
    val n = j.length
    val mismatch = j.count { case (a, e) => a != e }
    // boundary-band disagreement only: small, and never two buckets apart
    assert(mismatch.toDouble / n <= 0.10,
      s"approx terciles diverge on $mismatch of $n docs")
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    assert(j.forall { case (a, e) => math.abs(rank(a) - rank(e)) <= 1 },
      "a doc may never skip a bucket")
    // and the thresholds are monotone: every approx-head score >= every
    // approx-tail score
    val byB = approx.collect().map(r => (r.getString(2), r.getDouble(1)))
    val minHead = byB.filter(_._1 == "head").map(_._2).min
    val maxTail = byB.filter(_._1 == "tail").map(_._2).max
    assert(minHead >= maxTail)
  }

  test("leakageFreeSplit: no near-dup cluster straddles a split boundary") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.ops.Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text")
      .select($"doc_a", $"doc_b")
    val cc = graft.ops.Dedup.connectedComponents(pairs)
    val out = graft.ops.Sampling.leakageFreeSplit(docs, "doc_id", cc,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // the invariant that per-doc splitting violates: one split per cluster
    val straddling = out.join(cc, Seq("doc_id"))
      .groupBy($"component_id")
      .agg(countDistinct($"split").as("n_splits"))
      .where($"n_splits" > 1)
    assert(straddling.isEmpty, "a near-dup cluster crossed a split boundary")
    // and the contrast: the plain per-doc split DOES leak on this corpus
    // (it has seeded duplicate pairs whose members hash apart)
    val perDoc = graft.ops.Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val leaked = perDoc.join(cc, Seq("doc_id"))
      .groupBy($"component_id")
      .agg(countDistinct($"split").as("n_splits"))
      .where($"n_splits" > 1)
    assert(!leaked.isEmpty,
      "fixture should demonstrate the per-doc leak this operator removes")
    // every doc keeps exactly one row and singletons key by their own id
    assert(out.count() == docs.count())
    assert(out.where($"split_key" === $"doc_id").count() > 0)
  }

  test("temperatureMix is deterministic and tracks its rates") {
    val df = ((1L to 800L).map((_, "a")) ++ (801L to 950L).map((_, "b")) ++
      (951L to 1000L).map((_, "c"))).toDF("id", "g")
    val out = Sampling.temperatureMix(df, "id", "g", 0.5, 0.5, "s1")
    val counts = out.groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Sampling.temperatureRates(df, "g", 0.5, 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // admitted counts are binomial around n_g * rate; 5 sigma bounds
    for ((g, n) <- Seq("a" -> 800, "b" -> 150, "c" -> 50)) {
      val exp = n * rates(g)
      val sd = math.sqrt(n * rates(g) * (1 - rates(g)))
      assert(math.abs(counts.getOrElse(g, 0L) - exp) <= 5 * sd + 1,
        s"$g: got ${counts.getOrElse(g, 0L)}, expected ~$exp")
    }
    // partitioning-independent (membership is a pure content hash)
    val again = Sampling.temperatureMix(df.repartition(13), "id", "g", 0.5, 0.5, "s1")
    assert(out.select($"id").exceptAll(again.select($"id")).isEmpty &&
      again.select($"id").exceptAll(out.select($"id")).isEmpty)
    // different seed, different sample
    val other = Sampling.temperatureMix(df, "id", "g", 0.5, 0.5, "s2")
    assert(other.select($"id").exceptAll(out.select($"id")).count() > 0)
  }
}
