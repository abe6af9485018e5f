package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.GraftFunctions._

/** SF1–SF9 scalar-function semantics, incl. the reference's timestamp
  * formats (`MetsProcessorTest.java:262-306`, `OaiHarvesterTest.java:821-826`)
  * and the anchored-regex filter (`QucosaDocumentFilter.java:27`). */
class GraftFunctionsSpec extends SparkSpec {

  private def parse(s: String): Option[Timestamp] = {
    val sp = spark
    import sp.implicits._
    Option(Seq(s).toDF("x").select(tsParseIso8601(col("x"))).head.getTimestamp(0))
  }

  test("SF1: parses Z, colon offset, no-colon offset, local, date-only") {
    assert(parse("2014-05-06T17:33:25Z").contains(Timestamp.valueOf("2014-05-06 17:33:25")))
    assert(parse("2016-05-24T12:33:56+02:00").contains(Timestamp.valueOf("2016-05-24 10:33:56")))
    assert(parse("2016-10-10T11:27:33+0200").contains(Timestamp.valueOf("2016-10-10 09:27:33")))
    assert(parse("2016-10-10T11:27:33").contains(Timestamp.valueOf("2016-10-10 11:27:33")))
    assert(parse("2008-08-04").contains(Timestamp.valueOf("2008-08-04 00:00:00")))
    assert(parse("not a timestamp").isEmpty)
  }

  test("SF2: FC3 format omits the Z, spec format appends it") {
    val sp = spark
    import sp.implicits._
    val row = Seq(Timestamp.valueOf("2016-05-24 10:33:56")).toDF("t")
      .select(tsFormatFc3(col("t")), tsFormatSpec(col("t"))).head
    assert(row.getString(0) == "2016-05-24T10:33:56")
    assert(row.getString(1) == "2016-05-24T10:33:56Z")
  }

  test("SF4: local id strips oai prefix and authority") {
    val sp = spark
    import sp.implicits._
    val out = Seq("oai:example.org:qucosa:7455").toDF("x")
      .select(localId(col("x"))).head.getString(0)
    assert(out == "qucosa:7455")
  }

  test("SF4: column localId equals the reference substring semantics — byte-for-byte with the driver-side twin") {
    val sp = spark
    import sp.implicits._
    // the reference (MetsProcessor.java:285-287) is substring after the
    // first ':' at/past index 4 — non-canonical ids included; the
    // column form and OaiRequestBuilder.localIdentifier must key
    // IDENTICALLY or enrichment joins silently drop rows
    val cases = Seq(
      "oai:example.org:qucosa:7455", // canonical
      "qucosa:7455",                 // no oai: prefix
      "oai::x",                      // empty authority
      "oai:x",                       // no second colon → passes whole
      "abc",                         // no colon at/past 4 → passes whole
      "oai:a:b:c:d")                 // extra colons stay in the local id
    val got = cases.toDF("x").select(col("x"), localId(col("x")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { id =>
      val expected = graft.pipeline.OaiRequestBuilder.localIdentifier(id)
      assert(got(id) == expected,
        s"'$id': column gave '${got(id)}', driver twin gave '$expected'")
    }
  }

  test("F1/SF6: anchored full-match semantics equals Java String.matches (property)") {
    val pattern = ".+qucosa:\\d+"
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.alphaNumStr.map(s => s"oai:$s:qucosa:${s.length}"),
      Gen.alphaNumStr.map(s => s"qucosa:$s"),
      Gen.alphaNumStr.map(s => s"${s}qucosa:123x"))
    val samples = (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .filterNot(s => s.contains("\n") || s.contains("\r"))
    val sp = spark
    import sp.implicits._
    val got = samples.toDF("x")
      .select(col("x"), fullMatch(col("x"), pattern)).collect()
    got.foreach { r =>
      assert(r.getBoolean(1) == r.getString(0).matches(pattern),
        s"mismatch on '${r.getString(0)}'")
    }
  }

  test("SF6: fullMatch anchors alternation and escaped-dollar patterns like String.matches") {
    val sp = spark
    import sp.implicits._
    // top-level alternation: a bare ^foo|bar$ would find-match
    // "foobar baz"; String.matches does not
    val alt = Seq("foo", "bar", "foobar baz", "xfoo").toDF("x")
      .select(col("x"), fullMatch(col("x"), "foo|bar")).collect()
    alt.foreach(r => assert(r.getBoolean(1) == r.getString(0).matches("foo|bar"),
      s"alternation mismatch on '${r.getString(0)}'"))
    // an escaped trailing \$ is a literal dollar, not an anchor
    val dollar = Seq("price$", "price$extra").toDF("x")
      .select(col("x"), fullMatch(col("x"), "price\\$")).collect()
    dollar.foreach(r =>
      assert(r.getBoolean(1) == r.getString(0).matches("price\\$"),
        s"escaped-dollar mismatch on '${r.getString(0)}'"))
  }

  test("SF1: format→parse round-trips across the whole timestamp-format union (property)") {
    // Random post-epoch instants, rendered in each of the reference's
    // formats; parsing must recover the UTC instant exactly.
    val seconds = (0 until 150).flatMap(i =>
      Gen.chooseNum(0L, 4102444800L).apply(Gen.Parameters.default, Seed(i.toLong)))
    val sp = spark
    import sp.implicits._
    val rendered = seconds.zipWithIndex.map { case (sec, i) =>
      val utc = java.time.Instant.ofEpochSecond(sec)
      val local = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC).format(utc)
      i % 5 match {
        case 0 => (local + "Z", sec)                 // zulu
        case 1 => // colon offset, shifted so the instant is preserved
          val plus2 = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
            .withZone(java.time.ZoneOffset.ofHours(2)).format(utc)
          (plus2 + "+02:00", sec)
        case 2 => // Joda-style no-colon offset
          val plus2 = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
            .withZone(java.time.ZoneOffset.ofHours(2)).format(utc)
          (plus2 + "+0200", sec)
        case 3 => (local, sec)                        // zone-less (session UTC)
        case 4 => // date-only → instant truncated to day
          (local.take(10), sec / 86400L * 86400L)
      }
    }
    val got = rendered.toDF("iso", "expected_sec")
      .select(col("expected_sec"), unix_timestamp(tsParseIso8601(col("iso"))))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("F1: the reference's accept/reject examples") {
    val sp = spark
    import sp.implicits._
    val accept = Seq("oai:example.org:qucosa:1044", "x qucosa:1")
    val reject = Seq("qucosa:123x", "oai:example.org:qucosa:", "fedora-system:ContentModel-3.0",
      "oai:example.org:qucosa:CModel", "")
    (accept ++ reject).foreach { s =>
      val got = Seq(s).toDF("x").select(isQucosaId(col("x"))).head.getBoolean(0)
      assert(got == accept.contains(s), s"id '$s'")
    }
  }

  test("SF5/SF9: blank and case-insensitive helpers") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("  ", "DELETED"), ("x", "deleted"), ("", "other"))
      .toDF("a", "b")
      .select(isBlank(col("a")), ciEquals(col("b"), "deleted"))
    val rows = df.collect()
    assert(rows.map(_.getBoolean(0)).toSeq == Seq(true, false, true))
    assert(rows.map(_.getBoolean(1)).toSeq == Seq(true, true, false))
  }

  test("text metrics: fused kernel matches the regex definitions on edge cases") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "", " ", "   \t\n", "the", "The THE the.", "a_b the-and to",
      "auto to too", "der und die nicht", "le la et el los une est",
      "é ü ñ the", "123 456a !!", "word",
      "theand of", "the  and\tof\nto is was", "to-to,to;to",
      "was_", "_was", "3was was3 was",
      // multilingual: Unicode alpha + script buckets (kernel must match
      // the \p{...} regex definitions, including supplementary planes)
      "深度学习模型需要大量的训练数据", "Глубокое обучение требует данных",
      "التعلم العميق يتطلب بيانات", "深層学習には大量のデータが必要です",
      "머신 러닝 모델", "Ελληνικά γράμματα", "mixed 深度 данные data 123",
      "😀 emoji 𝕏 math", "ﬁ ligature ℕ ℤ")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val m = graft.ops.TextAnalysis.metrics(col("t"))
    val fused = df.select(col("id"),
      m.getField("score_en"), m.getField("score_de"),
      m.getField("score_fr"), m.getField("score_es"),
      m.getField("n_chars"), m.getField("n_tokens"),
      m.getField("n_bpe_tokens"), m.getField("alpha_chars"),
      m.getField("latin_chars"), m.getField("cyrillic_chars"),
      m.getField("cjk_chars"), m.getField("arabic_chars"))
      .orderBy("id").collect().map(_.toSeq.drop(1))
    def score(pat: String) =
      size(regexp_extract_all(lower(col("t")), lit(pat), lit(0))).cast("long")
    def strip(cls: String) =
      length(regexp_replace(col("t"), s"[^$cls]", "")).cast("long")
    val regex = df.select(col("id"),
      score("\\b(the|and|of|to|is|was)\\b"),
      score("\\b(der|und|die|nicht|das|ist)\\b"),
      score("\\b(le|la|et|les|une|est)\\b"),
      score("\\b(el|los|una|por|las|este)\\b"),
      length(col("t")).cast("long"),
      size(split(trim(col("t")), "\\s+")).cast("long"),
      size(regexp_extract_all(col("t"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"),
      strip("\\p{L}"),
      strip("\\p{IsLatin}"), strip("\\p{IsCyrillic}"),
      strip("\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}"),
      strip("\\p{IsArabic}"))
      .orderBy("id").collect().map(_.toSeq.drop(1))
    fused.zip(regex).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f == r, s"metrics mismatch on case ${i}: '${cases(i)}' fused=$f regex=$r")
    }
  }

  test("unicode alpha: a CJK document passes the corpus_filter alpha gate") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "深度学习模型需要大量的训练数据来学习语言结构"), // zh
      (2L, "Глубокое обучение требует больших объёмов данных"), // ru
      (3L, "the quick brown fox jumps over the lazy dog"), // en
      (4L, "!!! 123 ??? ### 456 $$$")) // genuine garbage
      .toDF("doc_id", "text")
    val q = graft.ops.TextAnalysis.qualityMetrics(docs, col("text"))
      .select(col("doc_id"), col("alpha_ratio")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1L) >= 0.6, s"CJK doc must pass the alpha gate, got ${q(1L)}")
    assert(q(2L) >= 0.6, s"Cyrillic doc must pass the alpha gate, got ${q(2L)}")
    assert(q(3L) >= 0.6)
    assert(q(4L) < 0.6, "symbol soup must still fail the gate")
  }

  test("scriptMetrics: dominant script routes multilingual docs with explicit tie order") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "latin only text"), (2L, "Только кириллица"),
      (3L, "深度学习"), (4L, "ひらがなとカタカナ"), (5L, "한글 텍스트"),
      (6L, "نص عربي"), (7L, "Ελληνικά"), (8L, "123 !!!"),
      (9L, "mixed 深度 данные data")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.scriptMetrics(docs, col("text"))
      .select(col("doc_id"), col("dominant_script")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "latin", 2L -> "cyrillic", 3L -> "cjk",
      4L -> "cjk", 5L -> "cjk", 6L -> "arabic", 7L -> "other",
      8L -> "none", 9L -> "latin"))
  }

  test("shingle-set and ngram-stats kernels match the column-expression forms") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "", " ", "   \t\n", "word", "a b", "a b c", "a b c d",
      "a a a a a", "one two three four five", "x  y\tz ",
      " lead and trail ", "a b a b a b", "é ü ñ the and of")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (n <- Seq(1, 2, 3, 8)) {
      val rows = df.select(col("id"),
        sort_array(graft.ops.Dedup.shingleSet(col("t"), n)).as("kernel"),
        sort_array(graft.ops.Dedup.shingleSetColumnForm(col("t"), n)).as("colform"),
        call_function("graft_ngram_stats", col("t"), lit(n)).as("st"),
        graft.ops.TextAnalysis.ngramsWithDuplicates(col("t"), n).as("dups"))
        .orderBy("id").collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"shingle set mismatch n=$n case '${cases(i)}'")
        val st = r.getStruct(3)
        assert(st.getLong(0) === r.getSeq[String](4).length.toLong,
          s"ngram total mismatch n=$n case '${cases(i)}'")
        assert(st.getLong(1) === r.getSeq[String](4).distinct.length.toLong,
          s"ngram distinct mismatch n=$n case '${cases(i)}'")
      }
    }
  }

  test("ngram-list kernel: ordered multiset, empty below n tokens") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "", " ", "word", "a b", "a b c", "a a a a a",
      "x  y\tz ", " lead and trail ", "a b a b a b")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (n <- Seq(2, 3)) {
      // reference semantics: Spark's split/trim token array, adjacent
      // n-windows in order, repeats kept, <n tokens -> empty
      val toks = split(trim(col("t")), "\\s+")
      val ref = when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
      val rows = df.select(col("id"),
        call_function("graft_ngram_list", col("t"), lit(n)).as("kernel"),
        ref.as("colform")).orderBy("id").collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"ngram list mismatch n=$n case '${cases(i)}': " +
            s"kernel=${r.getSeq[String](1)} ref=${r.getSeq[String](2)}")
      }
    }
  }

  test("absMillisBetween: symmetric, zero on equality, exact on known gaps") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("2016-07-26 18:05:24", "2016-07-26 18:05:24", 0L),
      ("2016-07-26 18:05:24", "2016-07-26 18:06:30", 66000L),
      ("2016-07-26 19:05:24", "2016-07-26 18:05:24", 3600000L))
      .toDF("a", "b", "expected")
      .select(col("a").cast("timestamp").as("a"),
        col("b").cast("timestamp").as("b"), col("expected"))
    val rows = df.select(
      graft.functions.GraftFunctions.absMillisBetween(col("a"), col("b")).as("g"),
      graft.functions.GraftFunctions.absMillisBetween(col("b"), col("a")).as("r"),
      col("expected")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), s"forward: $r")
      assert(r.getLong(1) == r.getLong(2), s"symmetry: $r")
    }
  }

  test("markerScore reference regex agrees with the fused kernel's score fields") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "the cat and the dog of the house",
      "der Hund und die Katze ist nicht das",
      "le chat et la maison est une",
      "El perro por los gatos una este",
      "THE AND OF TO IS WAS", // case folding
      "no marker words here whatsoever",
      "", "the der le el") // one each
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val m = graft.ops.TextAnalysis.metrics(col("t"))
    graft.ops.TextAnalysis.LangMarkers.foreach { case (lang, pat) =>
      val rows = df.select(col("id"),
        graft.ops.TextAnalysis.markerScore(col("t"), pat).as("ref"),
        m.getField(s"score_$lang").as("kernel")).orderBy("id").collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == r.getLong(2),
          s"score_$lang mismatch on '${cases(i)}': ref=${r.getLong(1)} kernel=${r.getLong(2)}")
      }
    }
  }

  test("vector kernels NULL out NaN inputs; function misuse errors are named") {
    val sp = spark
    import sp.implicits._
    // a corrupted embedding (NaN component) must yield NULL, never a
    // NaN that tops every descending top-k, and never a valid-looking
    // quantized CSV
    val rows = Seq(
      (1L, Array(1.0f, 2.0f), Array(1.0f, 1.0f)),       // clean
      (2L, Array(Float.NaN, 0.0f), Array(1.0f, 1.0f)),  // NaN left
      (3L, Array(1.0f, 1.0f), Array(Float.NaN, 1.0f)),  // NaN right
      (4L, Array(0.0f, 0.0f), Array(1.0f, 1.0f)))       // zero norm
      .toDF("id", "x", "y")
    val cos = rows.selectExpr("id", "graft_cosine_sim(x, y) AS c")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(cos(1L) != null && math.abs(cos(1L) - 3.0 / math.sqrt(10.0)) < 1e-9)
    assert(cos(2L) == null, "NaN component must NULL the similarity")
    assert(cos(3L) == null)
    assert(cos(4L) == null, "zero norm stays NULL")
    val q8 = rows.selectExpr("id", "graft_vec_q8_csv(x) AS q")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else r.getStruct(1).getString(0))).toMap
    assert(q8(1L) == "64,127")
    assert(q8(2L) == null,
      "a NaN component must NULL the row, not quantize to '0'")
    assert(q8(4L) == "0,0", "a zero vector still serializes as zeros")

    // misuse surfaces as a NAMED error, not IndexOutOfBounds/wrapping
    val arity = intercept[Exception] {
      rows.selectExpr("graft_minhash_sig(cast(id as string))").collect()
    }
    assert(arity.getMessage.contains("graft_minhash_sig") &&
      arity.getMessage.contains("3 arguments"), arity.getMessage)
    val range = intercept[Exception] {
      rows.selectExpr(
        "graft_minhash_sig(cast(id as string), 3, 4294967297)").collect()
    }
    assert(range.getMessage.contains("out of Int range"), range.getMessage)
  }
}
