package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, TextAnalysis}

/** Corpus-assembly operator specs: packing invariants, sampling
  * determinism, quota enforcement, decontamination ground truth,
  * shuffle permutation properties. */
class CorpusSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  // ── hexThreshold ──────────────────────────────────────────────────────

  test("hexThreshold encodes fixed-point probabilities") {
    assert(Corpus.hexThreshold(0.5) === "80000000")
    assert(Corpus.hexThreshold(0.25) === "40000000")
    assert(Corpus.hexThreshold(0.0) === "00000000")
    assert(Corpus.hexThreshold(1.0) === "ffffffff")
    assertThrows[IllegalArgumentException](Corpus.hexThreshold(1.5))
  }

  // ── sampleStratified ──────────────────────────────────────────────────

  test("stratified sample is deterministic and rate-faithful per stratum") {
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    def run() = Corpus.sampleStratified(docs, "doc_id", "lang", rates,
      defaultRate = 0.1, seed = "s1")
    val a = run().select("doc_id").collect().map(_.getLong(0)).toSet
    val b = run().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "same seed must keep the same rows")

    val kept = run().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, rate) <- rates) {
      val frac = kept.getOrElse(lang, 0L).toDouble / total(lang)
      // md5 uniformity at n≈10–50 rows/stratum: allow a wide but
      // meaningful band around the target rate
      assert(math.abs(frac - rate) < 0.25,
        s"$lang kept fraction $frac vs rate $rate")
    }
  }

  test("different seed produces a different sample") {
    val rates = Map("en" -> 0.5)
    val a = Corpus.sampleStratified(docs, "doc_id", "lang", rates, 0.0, "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.sampleStratified(docs, "doc_id", "lang", rates, 0.0, "s2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }

  // ── domainQuota ───────────────────────────────────────────────────────

  test("domain quota caps every domain and keeps the highest-priority rows") {
    val q = Corpus.domainQuota(docs, "lang", quota = 5,
      ordering = Seq(col("n_chars").desc, col("doc_id").asc))
    val perLang = q.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ <= 5), s"quota exceeded: $perLang")

    // kept rows per lang are exactly the top-5 by (n_chars desc, id asc)
    val keptEn = q.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectEn = docs.filter(col("lang") === "en")
      .orderBy(col("n_chars").desc, col("doc_id").asc).limit(5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptEn === expectEn)
  }

  // ── packChunks ────────────────────────────────────────────────────────

  test("packed chunks: offsets bounded, shard streams contiguous") {
    val p = Corpus.packChunks(docs, "doc_id", "text", nShards = 4,
      chunkTokens = 128).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      val off = r.getAs[Long]("chunk_offset")
      assert(off >= 0 && off < 128, s"offset out of range: $r")
    }
    // per shard, in id order, each doc starts where the previous ended:
    // start(i+1) = start(i) + n_tokens(i)  (mod nothing — the raw stream)
    p.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val byId = rows.sortBy(_.getAs[Long]("doc_id"))
      byId.sliding(2).foreach {
        case Array(a, b) =>
          val aStart = a.getAs[Long]("chunk_id") * 128 + a.getAs[Long]("chunk_offset")
          val bStart = b.getAs[Long]("chunk_id") * 128 + b.getAs[Long]("chunk_offset")
          assert(bStart === aStart + a.getAs[Long]("n_tokens"))
        case _ => ()
      }
    }
  }

  // ── decontaminate ─────────────────────────────────────────────────────

  test("decontamination flags every planted leak and nothing on a clean corpus") {
    val d = docs.select("doc_id", "text")
    val bench = d.filter(col("doc_id") % 7 === 0)
    val leaks = bench.select((col("doc_id") + 500000).as("doc_id"),
      concat(lit("prefix tokens here "), col("text")).as("text"))
    val clean = d.filter(col("doc_id") % 7 =!= 0)

    val flagged = Corpus.decontaminate(clean.unionByName(leaks), bench,
      "doc_id", "text").collect().map(_.getLong(0)).toSet
    val plantedIds = bench.select("doc_id").collect()
      .map(_.getLong(0) + 500000).toSet
    assert(plantedIds.subsetOf(flagged),
      s"missed leaks: ${plantedIds -- flagged}")

    // The synthetic corpus draws from a small vocabulary, so a few
    // NATURAL 8-token overlaps exist — those are genuine contamination.
    // Cross-check every extra flag against a brute-force shingle
    // overlap computed in plain Scala (independent of the Spark path).
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.length < 8) Set(toks.mkString(" "))
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val benchShingles = bench.select("text").collect()
      .flatMap(r => shingles(r.getString(0))).toSet
    val corpusText = clean.unionByName(leaks).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val extras = flagged -- plantedIds
    extras.foreach { id =>
      assert(shingles(corpusText(id)).intersect(benchShingles).nonEmpty,
        s"doc $id flagged without real overlap")
    }
    // and no contaminated doc was MISSED
    val trueContaminated = corpusText.collect {
      case (id, t) if shingles(t).intersect(benchShingles).nonEmpty => id
    }.toSet
    assert(flagged === trueContaminated)
  }

  // ── deterministicShuffle ──────────────────────────────────────────────

  test("deterministic shuffle is a stable permutation with per-shard dense positions") {
    val s1 = Corpus.deterministicShuffle(docs.select("doc_id"), "doc_id", "z")
    val rows = s1.collect()
    assert(rows.length === docs.count())
    // positions within each shard are 1..n dense
    rows.groupBy(_.getAs[String]("shard")).foreach { case (sh, rs) =>
      val ps = rs.map(_.getAs[Long]("pos")).sorted
      assert(ps.toSeq === (1L to rs.length).toSeq, s"shard $sh not dense")
    }
    // stable across re-evaluation
    val again = Corpus.deterministicShuffle(docs.select("doc_id"), "doc_id", "z")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("shard"), r.getAs[Long]("pos"))).toMap
    rows.foreach { r =>
      assert(again(r.getAs[Long]("doc_id")) ===
        (r.getAs[String]("shard"), r.getAs[Long]("pos")))
    }
  }

  // ── property tests (generated corpora) ────────────────────────────────

  test("property: nested sample rates — every row kept at rate p survives at rate q > p") {
    // hex thresholds are monotone in p, and the draw is per-row fixed,
    // so samples are NESTED: raising a stratum's rate only ADDS rows.
    // This is the property that makes rate changes reproducible corpus
    // diffs instead of full reshuffles.
    val lo = Corpus.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 0.2), 0.05, "pseed").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val hi = Corpus.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 0.6), 0.15, "pseed").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), s"missing at higher rate: ${lo -- hi}")
  }

  test("property: packChunks conserves the token stream for generated corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val wordGen = Gen.oneOf("alpha", "beta", "g", "dd", "e55", "", " ")
    val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val texts = (0 until 120).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong)).map(t => (i.toLong, t)))
    val df = texts.toDF("doc_id", "text")
    val packed = Corpus.packChunks(df, "doc_id", "text", nShards = 3,
      chunkTokens = 16).collect()
    // 1) every doc appears exactly once
    assert(packed.length === texts.length)
    // 2) per shard: chunk stream is gapless — total tokens equals the
    //    final doc's start + its tokens, and chunk_ids are the floor
    //    division of reconstructed starts (cross-checked in Scala)
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var expectStart = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val start = r.getAs[Long]("chunk_id") * 16 + r.getAs[Long]("chunk_offset")
        assert(start === expectStart, s"gap at doc ${r.getAs[Long]("doc_id")}")
        expectStart = start + r.getAs[Long]("n_tokens")
      }
    }
    // 3) kernel n_tokens matches Spark's split semantics (split keeps
    //    empty leading/trailing segments; all-space text → [""] → 1)
    val expected = df.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    packed.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === expected(r.getAs[Long]("doc_id")))
    }
  }

  // ── ngramDistinctRatio ────────────────────────────────────────────────

  test("repetition ratio: degenerate text scores low, varied text high") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b a b a b a b a b"),        // 1 distinct bigram each way
      (2L, "one two three four five six"), // all distinct
      (3L, "word"),                        // shorter than n → single gram
      (4L, "")                             // empty → single gram of ""
    ).toDF("id", "text")
    val r = df.select(col("id"),
      TextAnalysis.ngramDistinctRatio(col("text"), 2).as("r2"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1) < 0.25, s"repetitive text must score low: ${r(1)}")
    assert(r(2) === 1.0)
    assert(r(3) === 1.0)
    assert(r(4) === 1.0)
  }
}
