package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Similarity, TextAnalysis}

/** Specs for the Gopher quality-rule battery, C4 line-level cleaning,
  * and reciprocal-rank fusion — rule-by-rule ground truth on planted
  * degenerates plus plan-shape checks (all three are narrow or
  * tiny-aggregate operators; none may shuffle the corpus). */
class QualityRulesSpec extends SparkSpec {

  private def gopher(rows: (Long, String)*): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    TextAnalysis.gopherRules(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def flag(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  test("gopher: a healthy document passes all seven rules") {
    val healthy = "the cat sat on of and that have with mat " * 6
    val r = gopher(1L -> healthy)(1L)
    Seq("fail_word_count", "fail_mean_word_len", "fail_symbol_ratio",
      "fail_bullet_ratio", "fail_ellipsis_ratio", "fail_alpha_ratio",
      "fail_stopwords").foreach(f =>
      assert(!flag(r, f), s"healthy doc must pass $f"))
    assert(flag(r, "keep"))
  }

  test("gopher: each degenerate trips its rule") {
    val m = gopher(
      1L -> "a b c",                              // too few words, no stopwords
      2L -> ("the of " + ("42 " * 60)),           // numeric words → alpha fail
      3L -> ("the of " + ("### " * 60)),          // hash soup → symbol fail
      4L -> ("- the first bullet item of the list\n" * 10), // bullets
      5L -> (("trail off here and there of the mat..." + "\n") * 9 +
        "a closing line"))                        // 9/10 lines end "..."
    assert(flag(m(1L), "fail_word_count"))
    assert(flag(m(1L), "fail_stopwords"))
    assert(flag(m(1L), "fail_mean_word_len")) // mean 1 < 3
    assert(flag(m(2L), "fail_alpha_ratio"))
    assert(flag(m(3L), "fail_symbol_ratio"))
    assert(flag(m(4L), "fail_bullet_ratio"))
    assert(flag(m(5L), "fail_ellipsis_ratio"))
    m.values.foreach(r => assert(!flag(r, "keep")))
  }

  test("gopher: boundary arithmetic is exact (10/11 bullets > 0.9; 9/10 is not > 0.9... wait)") {
    // 10 bullet lines + trailing empty segment = 11 lines, 10 bullets:
    // 10·10 > 11·9 (100 > 99) → fail. Drop the trailing newline: 10
    // lines, 9 bullets: 9·10 > 10·9 is 90 > 90 → false → pass.
    val failing = gopher(1L -> ("- the first bullet item of the list\n" * 10))(1L)
    assert(flag(failing, "fail_bullet_ratio"))
    val passing = gopher(2L ->
      (("- the first bullet item of the list\n" * 9) +
        "a plain closing line of the document"))(2L)
    assert(!flag(passing, "fail_bullet_ratio"))
  }

  test("gopher: empty text fails word count but no divide-by-zero rules fire") {
    val r = gopher(1L -> "")(1L)
    assert(flag(r, "fail_word_count"))
    assert(!flag(r, "fail_mean_word_len"))
    assert(!flag(r, "fail_alpha_ratio"))
    assert(!flag(r, "keep"))
  }

  test("gopher: one narrow projection — no exchange, no UDF") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"doc $i text here")).toDF("id", "text")
    val plan = TextAnalysis.gopherRules(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherRules must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"gopherRules must not use UDFs:\n$plan")
  }

  // ── gopherRepetition ──────────────────────────────────────────────────

  private def rep(rows: (Long, String)*): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    TextAnalysis.gopherRepetition(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("repetition: each degenerate trips exactly its family") {
    val u = (1 to 25).map("u" + _).mkString(" ")
    val v = (1 to 25).map("v" + _).mkString(" ")
    val m = rep(
      1L -> (("same line here\n" * 4) + "unique closer"),
      2L -> ("ha " * 40).trim,
      3L -> ("p1 p2 p3 p4 p5 " + u + " p1 p2 p3 p4 p5 " + v),
      4L -> (1 to 60).map("w" + _).mkString(" "))
    // 1: 4 of 5 lines identical -> dup-line fail; single line of grams
    assert(flag(m(1L), "fail_dup_lines"))
    // 2: one 2-gram is every position -> top fails at all n; coverage too
    assert(flag(m(2L), "fail_top_2gram"))
    assert(flag(m(2L), "fail_top_3gram"))
    assert(flag(m(2L), "fail_dup_5gram"))
    assert(flag(m(2L), "fail_dup_10gram"))
    // 3: exactly one repeated 5-token run in 60 tokens: 10/60 = 16.7%
    // fails ONLY the 5-gram coverage rule (no 6-gram repeats; top-2gram
    // share is 2/59)
    assert(flag(m(3L), "fail_dup_5gram"))
    assert(!flag(m(3L), "fail_dup_6gram"))
    assert(!flag(m(3L), "fail_top_2gram"))
    assert(!flag(m(3L), "fail_dup_lines"))
    // 4: 60 distinct tokens, one line -> everything passes
    Seq("fail_dup_lines", "fail_top_2gram", "fail_top_3gram",
      "fail_top_4gram", "fail_dup_5gram", "fail_dup_10gram").foreach(f =>
      assert(!flag(m(4L), f), s"distinct doc must pass $f"))
    assert(flag(m(4L), "keep"))
    assert(!flag(m(1L), "keep") && !flag(m(2L), "keep") && !flag(m(3L), "keep"))
  }

  test("repetition: narrow plan — no exchange, no explode") {
    val s = spark
    import s.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"doc $i words here now")).toDF("id", "text")
    val plan = TextAnalysis.gopherRepetition(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherRepetition must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"gopherRepetition must not explode:\n$plan")
  }

  // ── cleanC4 ───────────────────────────────────────────────────────────

  private def c4(rows: (Long, String)*): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    TextAnalysis.cleanC4(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("c4: only sentence-ending ≥5-word lines without blockwords survive") {
    val text = Seq(
      "this healthy sentence has enough words to survive.",   // kept
      "short line.",                                          // <5 words
      "no terminal punctuation on this line at all",          // no punct
      "this line mentions lorem ipsum so it dies.",           // blockword
      "please enable javascript to view this content.",       // blockword
      "if (x) { return y; } looks like code here.",           // brace
      "a second healthy sentence also has enough words!",     // kept (!)
      "and a third question counts as terminal too, yes?"     // kept (?)
    ).mkString("\n")
    val r = c4(1L -> text)(1L)
    assert(r.getLong(r.fieldIndex("n_lines")) === 8L)
    assert(r.getLong(r.fieldIndex("n_kept")) === 3L)
    assert(r.getBoolean(r.fieldIndex("keep")))
  }

  test("c4: keep boundary is minKeptLines and md5 pins WHICH lines survived") {
    val two = c4(1L -> ("good sentence with five words here.\n" * 2))(1L)
    assert(two.getLong(two.fieldIndex("n_kept")) === 2L)
    assert(!two.getBoolean(two.fieldIndex("keep")))
    val three = c4(2L -> ("good sentence with five words here.\n" * 3))(2L)
    assert(three.getBoolean(three.fieldIndex("keep")))
    // md5 over re-joined kept lines — order-sensitive, content-sensitive
    val a = c4(3L -> "first good sentence with enough words.\nsecond good sentence with enough words.")(3L)
    val b = c4(4L -> "second good sentence with enough words.\nfirst good sentence with enough words.")(4L)
    assert(a.getString(a.fieldIndex("cleaned_md5")) !==
      b.getString(b.fieldIndex("cleaned_md5")))
  }

  test("c4: narrow plan — no exchange, no explode") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"line $i one.\nline $i two.")).toDF("id", "text")
    val plan = TextAnalysis.cleanC4(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cleanC4 must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"cleanC4 must not explode lines:\n$plan")
  }

  // ── kernel properties ─────────────────────────────────────────────────

  test("property: containment kernel matches a sequential reference on generated texts") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val textGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    def refContainment(a: String, b: String, n: Int): Option[Double] = {
      def sh(t: String): Set[String] = {
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        if (toks.length < n) Set.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet
      }
      val (sa, sb) = (sh(a), sh(b))
      if (sa.isEmpty || sb.isEmpty) None
      else {
        val i = (sa & sb).size.toDouble
        Some(math.max(i / sa.size, i / sb.size))
      }
    }
    val texts = (0 until 60).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(77L + i)))
    val pairs = texts.zipWithIndex.flatMap { case (a, i) =>
      texts.drop(i + 1).take(3).map(b => (a, b)) }
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        call_function("graft_shingle_containment", col("a"), col("b"), lit(3))
          .as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val want = refContainment(a, b, 3)
      assert(got(i.toLong) === want, s"pair $i: '$a' vs '$b'")
    }
  }

  test("property: ngram_top kernel matches a brute-force count map on generated texts") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val wordGen = Gen.oneOf("x", "y", "z")
    val textGen = Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    val texts = (0 until 80).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(500L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val got = df.select(col("id"),
          call_function("graft_ngram_top", col("text"), lit(n)).as("st"))
        .select(col("id"), col("st.n_pos"), col("st.top_count"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty) match {
          case a if t.trim.isEmpty => Array("")
          case a => a
        }
        val want =
          if (toks.length < n) (0L, 0L)
          else {
            val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
            (grams.size.toLong,
              grams.groupBy(identity).values.map(_.size).max.toLong)
          }
        assert(got(i.toLong) === want, s"doc $i n=$n: '$t'")
      }
    }
  }

  test("ngram_top rejects n < 1 at analysis time, not as an executor task failure") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
    for (n <- Seq(0, -1)) {
      val e = intercept[Exception] {
        df.select(call_function("graft_ngram_top", col("text"), lit(n))).collect()
      }
      assert(e.getMessage.contains("n >= 1"), s"n=$n: ${e.getMessage}")
    }
  }

  test("trained langid: held-out sentences in all four languages classify correctly") {
    val s = spark
    import s.implicits._
    import graft.ops.TextAnalysis
    import graft.queries.TrainingQueries
    val models = TextAnalysis.langIdTrain(
      TrainingQueries.langIdTrainSet.toDF("lang", "text"),
      "text", "lang", Seq("en", "de", "fr", "es"), buckets = 256)
    assert(models.map(_.language) == Seq("en", "de", "fr", "es"))
    // unequal training sizes -> asymmetric priors and OOV constants
    assert(models.map(_.logPrior).distinct.size == 3) // 4/3/3/2 docs
    val got = TextAnalysis.langIdPredictTrained(
        TrainingQueries.langIdHeldout.toDF("doc_id", "text"), "text", models)
      .select("doc_id", "predicted_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    TrainingQueries.langIdHeldoutExpected.foreach { case (id, want) =>
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("trained langid: discriminative refinement lowers training cross-entropy, held-out accuracy holds") {
    val s = spark
    import s.implicits._
    import graft.ops.TextAnalysis
    import graft.queries.TrainingQueries
    val train = TrainingQueries.langIdTrainSet.toDF("lang", "text")
    val langs = Seq("en", "de", "fr", "es")
    val nb = TextAnalysis.langIdTrain(train, "text", "lang", langs, buckets = 256)

    def xent(models: Seq[TextAnalysis.LangIdModel]): Double = {
      val rows = TextAnalysis.langIdPredictTrained(train, "text", models)
        .select((col("lang") +: langs.map(l => col(s"score_$l"))): _*)
        .collect()
      rows.map { r =>
        val zs = langs.indices.map(i => r.getDouble(i + 1))
        val m = zs.max
        val es = zs.map(z => math.exp(z - m))
        val p = es(langs.indexOf(r.getString(0))) / es.sum
        -math.log(math.max(p, 1e-12))
      }.sum / rows.length
    }

    val refined = TextAnalysis.langIdRefine(train, "text", "lang", nb,
      learningRate = 0.5, iterations = 5)
    val before = xent(nb)
    val after = xent(refined)
    assert(after < before, s"refinement must lower training xent: $before -> $after")

    val got = TextAnalysis.langIdPredictTrained(
        TrainingQueries.langIdHeldout.toDF("doc_id", "text"), "text", refined)
      .select("doc_id", "predicted_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    TrainingQueries.langIdHeldoutExpected.foreach { case (id, want) =>
      assert(got(id) == want, s"doc $id after refinement: got ${got(id)}, want $want")
    }
  }

  test("trained langid: per-line composition — mixed doc majority, tie order, empty doc") {
    val s = spark
    import s.implicits._
    import graft.ops.TextAnalysis
    import graft.queries.TrainingQueries
    val models = TextAnalysis.langIdTrain(
      TrainingQueries.langIdTrainSet.toDF("lang", "text"),
      "text", "lang", Seq("en", "de", "fr", "es"), buckets = 256)
    val docs = TrainingQueries.langIdLineDocs
      .map { case (id, ls) => (id, ls.mkString("\n")) }.toDF("doc_id", "text")
    val got = TextAnalysis.langIdLineShares(docs, "text", models)
      .select("doc_id", "n_lines", "n_lines_en", "n_lines_de", "line_major_lang")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // -3: one English line among two German -> majority de
    assert(got(-3L) == ((3L, 1L, 2L, "de")), s"got $got")
    // -2: fr/es tie -> model order resolves to fr
    assert(got(-2L)._4 == "fr")
    // -1: no non-blank lines -> und
    assert(got(-1L) == ((0L, 0L, 0L, "und")))
  }

  // ── rrfFuse ───────────────────────────────────────────────────────────

  test("rrf: fused score is the sum of reciprocal ranks; singles keep one term") {
    val s = spark
    import s.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val out = Similarity.rrfFuse(a, b, "id", "rank", k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), Option(r.get(2)), Option(r.get(3)))).toMap
    def rr(r: Int) = 1.0 / (60.0 + r)
    assert(math.abs(out(10L)._1 - (rr(1) + rr(2))) < 1e-6)
    assert(math.abs(out(20L)._1 - (rr(2) + rr(1))) < 1e-6)
    assert(math.abs(out(30L)._1 - rr(3)) < 1e-6)
    assert(out(30L)._2 === Some(3L) && out(30L)._3 === None)
    assert(out(40L)._2 === None && out(40L)._3 === Some(3L))
    // both-list docs outrank single-list docs at equal ranks
    val order = Similarity.rrfFuse(a, b, "id", "rank", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(order.take(2).toSet === Set(10L, 20L))
  }

  test("rrf: k bounds the output and ties break by id ascending") {
    val s = spark
    import s.implicits._
    val a = Seq((5L, 1L), (3L, 1L)).toDF("id", "rank") // same rank → same score
    val b = spark.emptyDataFrame
      .select(lit(0L).as("id"), lit(0L).as("rank")).filter(lit(false))
    val out = Similarity.rrfFuse(a, b, "id", "rank", k = 1).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 3L, "tie must break to the smaller id")
  }
}
