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
    // p = 1.0 is the above-any-hex sentinel, so `u < t` keeps ALL rows
    // (a clamped ffffffff would drop a draw of exactly ffffffff)
    assert(Corpus.hexThreshold(1.0) === "g0000000")
    assertThrows[IllegalArgumentException](Corpus.hexThreshold(1.5))
  }

  test("rate 1.0 keeps every row of the stratum") {
    val kept = Corpus.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0, seed = "s1")
    val en = docs.filter(col("lang") === "en")
    assert(kept.count() === en.count())
    assert(kept.filter(col("lang") =!= "en").count() === 0L)
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

  // ── mixByTokenBudget ──────────────────────────────────────────────────

  test("token-budget mixture: rates track budgets, unbudgeted sources keep all, budgets nest") {
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
    val totals = base
      .withColumn("n", graft.ops.TextAnalysis.tokenCount(col("text")))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val budget = totals("en") / 3
    val mixed = Corpus.mixByTokenBudget(base, "doc_id", "lang", "text",
      budgets = Map("en" -> budget), seed = "m1")
    val keptTokens = mixed.groupBy("lang").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // unbudgeted sources keep every row
    (totals.keySet - "en").foreach { lang =>
      assert(keptTokens(lang) === totals(lang), s"$lang must keep all tokens")
    }
    // budgeted source lands near its budget (sampling noise at ~70 docs)
    assert(keptTokens("en") < totals("en"))
    assert(math.abs(keptTokens("en") - budget).toDouble / budget < 0.6,
      s"en kept ${keptTokens("en")} vs budget $budget")

    // zero budget drops the source entirely; huge budget keeps all
    val extremes = Corpus.mixByTokenBudget(base, "doc_id", "lang", "text",
      budgets = Map("en" -> 0L, "de" -> Long.MaxValue / 2), seed = "m1")
    val perLang = extremes.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!perLang.contains("en"))
    assert(perLang("de") === docs.filter(col("lang") === "de").count())

    // nested: raising the budget only ADDS rows (same seed)
    val lo = Corpus.mixByTokenBudget(base, "doc_id", "lang", "text",
      Map("en" -> budget), "m1").select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = Corpus.mixByTokenBudget(base, "doc_id", "lang", "text",
      Map("en" -> budget * 2), "m1").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
  }

  // ── mixByTemperature ──────────────────────────────────────────────────

  test("temperature mixture: smallest source kept whole, tau=1 keeps all, lower tau nests downward") {
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
    val totals = base
      .withColumn("n", graft.ops.TextAnalysis.tokenCount(col("text")))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = totals.minBy(_._2)._1
    val maxLang = totals.maxBy(_._2)._1

    // tau = 1: proportional mixture = keep everything
    assert(Corpus.mixByTemperature(base, "doc_id", "lang", "text",
      tau = 1.0, seed = "t1").count() === base.count())

    val mixed = Corpus.mixByTemperature(base, "doc_id", "lang", "text",
      tau = 0.5, seed = "t1")
    val perLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest source is kept whole by construction (rate = 1)
    assert(perLang(minLang) ===
      base.filter(col("lang") === minLang).count(), "min source must keep all")
    // the biggest source is genuinely downsampled
    assert(perLang(maxLang) < base.filter(col("lang") === maxLang).count(),
      "max source must shed rows")

    // rates are monotone in tau, and the hash-threshold keep is nested:
    // a colder (smaller-tau) mixture is a subset of a warmer one
    val cold = Corpus.mixByTemperature(base, "doc_id", "lang", "text",
      tau = 0.25, seed = "t1").select("doc_id").collect().map(_.getLong(0)).toSet
    val warm = Corpus.mixByTemperature(base, "doc_id", "lang", "text",
      tau = 0.5, seed = "t1").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cold.subsetOf(warm), "tau=0.25 keep set must nest inside tau=0.5")

    // a zero-token source neither crashes the rate rule (0/0 -> NaN)
    // nor anchors tMin at 0 (which would zero every other rate)
    val r = Corpus.temperatureRates(Map("z" -> 0L, "b" -> 100L, "c" -> 400L), 0.5)
    assert(!r.contains("z") && r("b") == 1.0 && r("c") == 0.5, s"got $r")

    // a source whose rows are ALL null text sums to NULL in the totals
    // aggregate — must coalesce to 0 (and keep the rows), not NPE
    val s = spark
    import s.implicits._
    val withNullSrc = base.unionByName(
      Seq((900001L, "xx", null.asInstanceOf[String]),
          (900002L, "xx", null.asInstanceOf[String]))
        .toDF("doc_id", "lang", "text"))
    val gotNull = Corpus.mixByTemperature(withNullSrc, "doc_id", "lang", "text",
      tau = 0.5, seed = "t1")
    assert(gotNull.filter(col("lang") === "xx").count() === 2L,
      "null-text source keeps its rows (no rate applies)")
  }

  // ── sampleByScore ─────────────────────────────────────────────────────

  test("score-weighted sample: score 1 always kept, 0 always dropped, survivors nest under score increases") {
    val s = spark
    import s.implicits._
    val rows = (1L to 400L).map(i => (i, (i % 5) * 0.25)).toDF("doc_id", "sc")
    val kept = Corpus.sampleByScore(rows, "doc_id", col("sc"), seed = "t")
      .collect().map(r => r.getLong(0)).toSet
    // score 1.0 rows (i%5==4) all survive; score 0.0 rows never do
    assert((1L to 400L).filter(_ % 5 == 4).forall(kept))
    assert((1L to 400L).filter(_ % 5 == 0).forall(!kept(_)))
    // mid scores keep a nontrivial subset
    val mid = (1L to 400L).filter(i => i % 5 == 2) // score 0.5
    val midKept = mid.count(kept)
    assert(midKept > 0 && midKept < mid.size, s"0.5 kept $midKept of ${mid.size}")
    // nested: uniformly raising scores only ADDS survivors
    val keptHi = Corpus.sampleByScore(rows, "doc_id",
        least(col("sc") + 0.25, lit(1.0)), seed = "t")
      .collect().map(r => r.getLong(0)).toSet
    assert(kept.subsetOf(keptHi), "raising scores must never drop a survivor")
    // out-of-range scores clamp instead of corrupting the threshold
    val clamped = Corpus.sampleByScore(
        Seq((1L, 7.5), (2L, -3.0)).toDF("doc_id", "sc"), "doc_id", col("sc"), "t")
      .collect().map(_.getLong(0)).toSet
    assert(clamped == Set(1L))
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

  test("packed chunks: end spans locate the last token — chunk contents are recomputable") {
    val p = Corpus.packChunks(docs, "doc_id", "text", nShards = 4,
      chunkTokens = 128).collect()
    p.foreach { r =>
      val start = r.getAs[Long]("chunk_id") * 128 + r.getAs[Long]("chunk_offset")
      val end   = r.getAs[Long]("end_chunk") * 128 + r.getAs[Long]("end_offset")
      assert(end === start + r.getAs[Long]("n_tokens") - 1,
        s"span mismatch: $r")
      assert(r.getAs[Long]("end_offset") >= 0 && r.getAs[Long]("end_offset") < 128)
      assert(r.getAs[Long]("end_chunk") >= r.getAs[Long]("chunk_id"))
    }
    // a consumer materializing chunk (shard, c) selects docs whose span
    // covers c — every token slot of every non-final chunk is covered
    p.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rows) =>
      val lastEnd = rows.map(r =>
        r.getAs[Long]("end_chunk") * 128 + r.getAs[Long]("end_offset")).max
      val fullChunks = (lastEnd + 1) / 128
      val covered = Array.fill(((lastEnd + 1).toInt))(false)
      rows.foreach { r =>
        val s0 = r.getAs[Long]("chunk_id") * 128 + r.getAs[Long]("chunk_offset")
        val e0 = r.getAs[Long]("end_chunk") * 128 + r.getAs[Long]("end_offset")
        (s0 to e0).foreach(i => covered(i.toInt) = true)
      }
      assert(covered.take((fullChunks * 128).toInt).forall(identity),
        s"shard $sh has uncovered token slots")
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

  test("decontaminate: shuffle fallback for a non-broadcastable benchmark matches the broadcast path") {
    val d = docs.select("doc_id", "text")
    val bench = d.filter(col("doc_id") % 7 === 0)
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val viaBroadcast = Corpus.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    // threshold 1 forces the probe over the limit → shuffle left-semi
    val viaShuffle = Corpus.decontaminate(corpus, bench, "doc_id", "text",
      maxBroadcastShingles = 1L).collect().map(_.getLong(0)).toSet
    assert(viaShuffle === viaBroadcast)
  }

  test("bloom decontamination matches the exact path bit-for-bit, even under heavy false-positive pressure") {
    val d = docs.select("doc_id", "text")
    val bench = d.filter(col("doc_id") % 7 === 0)
    val leaks = bench.select((col("doc_id") + 500000).as("doc_id"),
      concat(lit("prefix tokens here "), col("text")).as("text"))
    val corpus = d.filter(col("doc_id") % 7 =!= 0).unionByName(leaks)
    val exact = Corpus.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val viaBloom = Corpus.decontaminateBloom(corpus, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(viaBloom === exact)
    // a DELIBERATELY tiny bloom (64 bits for thousands of shingles →
    // near-every probe is a false positive) must still be exact: the
    // verify semi-join, not the bloom, decides membership
    val tiny = Corpus.decontaminateBloom(corpus, bench, "doc_id", "text",
      expectedShingles = 8L, numBits = 64L)
      .collect().map(_.getLong(0)).toSet
    assert(tiny === exact, "false positives leaked through the verify join")
    // shuffle-fallback verify (non-broadcastable benchmark) agrees too
    val shuffled = Corpus.decontaminateBloom(corpus, bench, "doc_id", "text",
      maxBroadcastShingles = 1L)
      .collect().map(_.getLong(0)).toSet
    assert(shuffled === exact)
    // empty benchmark: null bloom aggregate -> empty result, no crash
    assert(Corpus.decontaminateBloom(corpus, bench.limit(0), "doc_id", "text")
      .count() == 0L)
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

  test("shuffle fan-out parameterized: 65,536 shards produce the same global order as 256") {
    // 4 hex chars = 65,536 shards (the ≥4096 scale fan-out); the total
    // order (shard, pos) must equal ordering the corpus by md5 key for
    // ANY fan-out — shards are just prefix buckets of the same keys
    def order(hexChars: Int): Seq[Long] =
      Corpus.deterministicShuffle(docs.select("doc_id"), "doc_id", "z", hexChars)
        .orderBy(col("shard"), col("pos")).collect().map(_.getAs[Long]("doc_id")).toSeq
    val at2 = order(2)
    val at4 = order(4)
    assert(at2 === at4, "fan-out must not change the permutation")
    // and shards really fan out: 4-char prefixes are strictly finer
    val shards4 = Corpus.deterministicShuffle(
      docs.select("doc_id"), "doc_id", "z", 4)
      .select("shard").distinct().collect().map(_.getString(0))
    assert(shards4.forall(_.length == 4))
    assert(shards4.length > docs.count() / 2,
      "md5 prefixes at 4 nibbles should spread ~one row per shard here")
  }

  test("shardHexCharsFor sizes the fan-out from the row count") {
    assert(Corpus.shardHexCharsFor(1000L) === 1)
    assert(Corpus.shardHexCharsFor(100_000_000L) === 2) // 256 shards × ~390k
    assert(Corpus.shardHexCharsFor(100_000_000_000L) === 4) // 100 TB scale
    assert(Corpus.shardHexCharsFor(Long.MaxValue / 2) === 8)
  }

  test("operators refuse inputs that already carry their output columns") {
    val s = spark
    import s.implicits._
    val clash = Seq((1L, "t", 2L)).toDF("doc_id", "text", "shard")
    assertThrows[IllegalArgumentException](
      Corpus.packChunks(clash, "doc_id", "text", 4, 128))
    assertThrows[IllegalArgumentException](
      Corpus.deterministicShuffle(clash, "doc_id"))
    val clashQ = Seq((1L, "en", 5L)).toDF("doc_id", "lang", "qrank")
    assertThrows[IllegalArgumentException](
      Corpus.domainQuota(clashQ, "lang", 5, Seq(col("doc_id"))))
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

  // ── sampleExactN ──────────────────────────────────────────────────────

  test("exact-n sample: correct size per stratum, nested under size increases") {
    val small = Corpus.sampleExactN(docs, "doc_id", "lang", n = 5, seed = "e1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Corpus.sampleExactN(docs, "doc_id", "lang", n = 12, seed = "e1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val perLang = Corpus.sampleExactN(docs, "doc_id", "lang", n = 5, seed = "e1")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1))
    perLang.foreach { case (lang, c) => assert(c <= 5L, s"$lang got $c") }
    assert(small.subsetOf(large), "growing n must only ADD documents")
  }

  // ── contaminationShare ────────────────────────────────────────────────

  test("contamination share: leaked copy scores 1.0, clean doc 0.0; fallback path identical") {
    val s = spark
    import s.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota"), // leak
      (11L, "one two three four five six seven eight nine ten"))   // clean
      .toDF("doc_id", "text")
    def run(budget: Long) = Corpus.contaminationShare(
      corpus, bench, "doc_id", "text", shingleLen = 8,
      maxBroadcastShingles = budget)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val broadcastPath = run(4_000_000L)
    assert(broadcastPath(0)._4 === 1.0, "identical leak must score share 1")
    assert(broadcastPath(1)._4 === 0.0, "clean doc must score share 0")
    assert(run(1L).toSeq === broadcastPath.toSeq,
      "shuffle fallback must produce identical output")
  }

  // ── chunkOverlap ──────────────────────────────────────────────────────

  test("chunkOverlap: spans tile the token stream with the configured stride") {
    val s = spark
    import s.implicits._
    val text = (1 to 95).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "a b c"), (3L, "")).toDF("id", "text")
    val rows = Corpus.chunkOverlap(df, "id", "text", 40, 30)
      .orderBy(col("id"), col("chunk_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

    // 95 tokens, C=40, S=30 → ceil((95-40)/30)+1 = 3 chunks
    val doc1 = rows.filter(_._1 == 1L)
    assert(doc1.map(c => (c._3, c._4)).toSeq ===
      Seq((0L, 40L), (30L, 70L), (60L, 95L)))
    // consecutive chunks overlap by C - S = 10 tokens
    assert(doc1(0)._5.split(" ").takeRight(10).toSeq ===
      doc1(1)._5.split(" ").take(10).toSeq)
    // every chunk's text is exactly its span's tokens
    val toks = text.split(" ")
    doc1.foreach { case (_, _, st, en, ct) =>
      assert(ct === toks.slice(st.toInt, en.toInt).mkString(" "))
    }
    // short doc: one clipped chunk; empty doc: one empty chunk
    assert(rows.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 3L, "a b c")))
    assert(rows.filter(_._1 == 3L).toSeq === Seq((3L, 0L, 0L, 0L, "")))
  }

  test("property: chunkOverlap tiles generated corpora against a sequential reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val wordGen = Gen.oneOf("a", "bb", "ccc", "d4", "", " ")
    val textGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    val cases = Seq((5, 3), (7, 7), (4, 1), (1, 1))
    for ((c, st) <- cases) {
      val texts = (0 until 60).flatMap(i =>
        textGen.apply(Gen.Parameters.default, Seed(1000L * c + st + i))
          .map(t => (i.toLong, t)))
      val df = texts.toDF("doc_id", "text")
      val got = Corpus.chunkOverlap(df, "doc_id", "text", c, st).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
        .groupBy(_._1)
      // sequential reference: same tokenization (non-empty split), same
      // chunk-count formula, slices recomputed independently
      texts.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        val expChunks =
          if (n <= c) 1 else ((n - c + st - 1) / st + 1)
        val rows = got(id).sortBy(_._2)
        assert(rows.length === expChunks, s"doc $id n=$n C=$c S=$st")
        rows.zipWithIndex.foreach { case ((_, idx, s0, e0, txt), i) =>
          assert(idx === i.toLong)
          assert(s0 === (i.toLong * st))
          assert(e0 === math.min(s0 + c, n.toLong))
          assert(txt === toks.slice(s0.toInt, e0.toInt).mkString(" "))
        }
        // every token position is covered by at least one chunk
        if (n > 0) {
          val covered = Array.fill(n)(false)
          rows.foreach { case (_, _, s0, e0, _) =>
            (s0.toInt until e0.toInt).foreach(covered(_) = true)
          }
          assert(covered.forall(identity), s"doc $id has uncovered tokens")
        }
      }
    }
  }

  test("chunkOverlap: stride == chunk gives disjoint cover (no overlap, no gap)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("id", "text")
    val spans = Corpus.chunkOverlap(df, "id", "text", 32, 32)
      .orderBy(col("chunk_idx"))
      .select("start_tok", "end_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(spans.head._1 === 0L)
    assert(spans.last._2 === 100L)
    spans.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(e1 === s2, "disjoint tiling")
      case _ => ()
    }
  }

  test("leakage-safe split: no verified near-dup pair straddles the split; both splits populated") {
    val s = spark
    import s.implicits._
    val d = Tables.documents(spark, sf0001).select("doc_id", "text")
    val planted = d.unionByName(
      d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text")))
    val out = Corpus.splitByNearDupCluster(planted, "doc_id", "text",
      minJaccard = 0.8, testFrac = 0.3)
    val splitOf = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.ops.Dedup.verifiedNearDupPairs(planted, "doc_id",
      "text", minJaccard = 0.8).select("a_id", "b_id").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(splitOf(a) == splitOf(b),
        s"near-dup pair ($a, $b) straddles the split: ${splitOf(a)} vs ${splitOf(b)}")
    }
    val frac = splitOf.values.count(_ == "test").toDouble / splitOf.size
    assert(frac > 0.05 && frac < 0.6, s"test fraction $frac implausible for 0.3")
  }

  test("writeLayout: file-count contract, directory pruning, within-file sort, lossless round trip") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-writelayout").toString
    val df = (0 until 500).map(i =>
      (i.toLong, s"doc number $i body", if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang").repartition(8) // many upstream tasks
    Corpus.writeLayout(df, s"$root/out",
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
      filesPerPartition = 2)

    val back = s.read.parquet(s"$root/out")
    // lossless round trip
    assert(back.count() == 500L)
    // file-count contract: 8 upstream tasks × 2 values would naively
    // write up to 16 files per value; the layout shuffle caps it at 2
    // (hash collisions may merge writers, never multiply them)
    for (lang <- Seq("en", "de")) {
      val files = new java.io.File(s"$root/out/lang=$lang")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 1 && files.length <= 2,
        s"$lang wrote ${files.length} files")
      // within-file sort: each file's doc_ids are non-decreasing
      files.foreach { f =>
        val ids = s.read.parquet(f.getPath)
          .select("doc_id").collect().map(_.getLong(0))
        assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
      }
    }
    // directory pruning: the partition-column filter becomes a
    // PartitionFilter on the scan (inputFiles ignores pruning, so the
    // plan is the evidence), and the counts confirm the split
    val pruned = back.filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(lang"),
      s"no partition filter in plan:\n$plan")
    assert(pruned.count() == (0 until 500).count(_ % 3 == 0))
  }

  // ── DSIR importance weights ───────────────────────────────────────────

  test("dsir: target-like documents outscore off-target ones, weights are deterministic") {
    val s = spark
    import s.implicits._
    val wiki = (1 to 8).map(i => (100L + i, "the quick brown fox jumps " + i))
    val spam = (1 to 8).map(i => (200L + i, "buy cheap pills now click " + i))
    val raw = (wiki ++ spam).toDF("doc_id", "text")
    val target = wiki.toDF("doc_id", "text")
    val w = Corpus.dsirWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wikiMin = wiki.map(d => w(d._1)).min
    val spamMax = spam.map(d => w(d._1)).max
    assert(wikiMin > spamMax,
      s"target docs must outscore off-target: wikiMin=$wikiMin spamMax=$spamMax")
    val w2 = Corpus.dsirWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w == w2, "weights must be deterministic across runs")
  }

  test("dsir: scoring is a narrow projection — no exchange in the scoring plan") {
    val s = spark
    import s.implicits._
    val raw = (1 to 20).map(i => (i.toLong, s"tok$i common words here")).toDF("doc_id", "text")
    val llr = Corpus.dsirLlrTable(raw, "text", raw.limit(5), "text", buckets = 64)
    assert(llr.size == 64)
    val plan = raw.select(col("doc_id"),
        Corpus.dsirScore(llr, col("text")).as("w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"dsir scoring must not shuffle:\n$plan")
    assertThrows[IllegalArgumentException](
      Corpus.dsirLlrTable(raw, "text", raw, "text", buckets = 0))
  }

  // ── snapshotDiff ──────────────────────────────────────────────────────

  test("snapshotDiff classifies all four statuses") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq(
      (1L, "same"), (2L, "was this"), (3L, "gone soon")).toDF("id", "body")
    val newSnap = Seq(
      (1L, "same"), (2L, "now this"), (4L, "brand new")).toDF("id", "body")
    val st = Corpus.snapshotDiff(oldSnap, newSnap, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val counts = Corpus.snapshotDiffCounts(oldSnap, newSnap, "id", "body")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("snapshotDiff: a NULL-KEY doc present in both snapshots matches itself (null-safe key join)") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq((Option.empty[Long], "same"), (Some(1L), "x"))
      .toDF("id", "body")
    val newSnap = Seq((Option.empty[Long], "same"), (Some(1L), "y"))
      .toDF("id", "body")
    val st = Corpus.snapshotDiff(oldSnap, newSnap, "id", "body").collect()
      .map(r => (if (r.isNullAt(0)) -999L else r.getLong(0)) -> r.getString(1))
      .toMap
    // pre-fix the NULL-key row emitted 'removed' PLUS 'added'
    assert(st === Map(-999L -> "unchanged", 1L -> "changed"), st.toString)
  }

  test("uniformHex samplers keep NULL-id rows deterministically instead of silently dropping them") {
    val s = spark
    import s.implicits._
    val df = Seq((Option.empty[Long], "web"), (Some(1L), "web"),
      (Some(2L), "web")).toDF("doc_id", "source")
    // rate 1.0 for every source: NOTHING may drop — pre-fix the null-id
    // row's NULL draw failed the threshold compare and vanished
    val kept = Corpus.keepBySourceRates(df, "doc_id", "source",
      Map("web" -> 1.0), "seed")
    assert(kept.count() == 3L,
      "keep-all rates must keep null-id rows too")
    // and the null-id row's draw is deterministic (same seed, same draw)
    val d1 = Corpus.keepBySourceRates(df, "doc_id", "source",
      Map("web" -> 0.5), "seed").count()
    val d2 = Corpus.keepBySourceRates(df, "doc_id", "source",
      Map("web" -> 0.5), "seed").count()
    assert(d1 == d2)
  }

  test("snapshotDiff: NULL content is data, not absence — presence comes from the side markers") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq(
      (1L, Option.empty[String]),      // removed (null content, old only)
      (2L, Option.empty[String]),      // unchanged (null == null)
      (3L, Option.empty[String]),      // changed (null -> value)
      (4L, Option("x"))                // changed (value -> null)
    ).toDF("id", "body")
    val newSnap = Seq(
      (2L, Option.empty[String]),
      (3L, Option("x")),
      (4L, Option.empty[String]),
      (5L, Option.empty[String])       // added (with null content)
    ).toDF("id", "body")
    val st = Corpus.snapshotDiff(oldSnap, newSnap, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "added"))
  }

  test("packBins: NULL text counts as an empty document, not a task failure") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, Option("a b c")), (4L, Option.empty[String]),
      (8L, Option("d e")))
    val out = Corpus.packBins(rows.toDF("id", "text"), "id", "text",
        nShards = 4, binTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // NULL -> "" -> one empty token under the kernel split discipline
    assert(out(4L)._1 === 1L)
    assert(out.size === 3)
  }

  test("snapshotDiff shuffles hashes, not bodies — md5 computed below the join, text never crosses an exchange") {
    val oldSnap = docs.filter(col("doc_id") % 2 === 0)
    val newSnap = docs.filter(col("doc_id") % 3 === 0)
    val plan = Corpus.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the hash is a project BELOW the join (between scan and exchange)
    assert(plan.contains("md5"), s"hash must be computed below the join:\n$plan")
    // nothing at or above the join references the raw text column
    val aboveScan = plan.linesIterator
      .filterNot(l => l.contains("FileScan") || l.contains("ReadSchema"))
      .mkString("\n")
    val joinLine = aboveScan.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinLine.nonEmpty && !joinLine.contains("text"),
      s"join must operate on key+hash only:\n$joinLine")
    aboveScan.linesIterator.filter(_.contains("Exchange")).foreach(l =>
      assert(!l.contains("text"), s"text must not cross an exchange:\n$l"))
  }

  // ── packBins ──────────────────────────────────────────────────────────

  test("packBins: next-fit invariants — no overflow, oversize alone, id-contiguous bins, deterministic") {
    val s = spark
    import s.implicits._
    // shard 0 only (ids are multiples of 4, nShards 4): tokens
    // 3,4,5,9,2 with capacity 8 → bins [3+4], [5], [9], [2]
    val rows = Seq(
      (0L, "a b c"), (4L, "a b c d"), (8L, "a b c d e"),
      (12L, "a b c d e f g h i"), (16L, "a b"))
    val out = Corpus.packBins(rows.toDF("id", "text"), "id", "text",
        nShards = 4, binTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(0L)._3 === 0L && out(4L)._3 === 0L, "3+4 <= 8 share bin 0")
    assert(out(8L)._3 === 1L, "5 opens bin 1")
    assert(out(12L)._3 === 2L, "oversize 9 occupies bin 2 alone")
    assert(out(16L)._3 === 3L, "2 cannot join the oversize bin")
    // per-bin fill never exceeds capacity except single-doc oversize bins
    val fills = out.values.groupBy(v => (v._1, v._3))
      .map { case (_, vs) => (vs.map(_._2).sum, vs.size) }
    fills.foreach { case (fill, n) =>
      assert(fill <= 8 || n == 1, s"overflowed multi-doc bin: $fill tokens") }
    // determinism under different parallelism
    val again = Corpus.packBins(
        rows.toDF("id", "text").repartition(7), "id", "text",
        nShards = 4, binTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.map { case (k, v) => k -> v._3 } === again)
  }

  test("packBins: bins are id-contiguous per shard (next-fit never reopens a bin)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 120).map(i => (i.toLong, ("w " * (1 + i % 17)).trim))
    val out = Corpus.packBins(rows.toDF("id", "text"), "id", "text",
        nShards = 4, binTokens = 24)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(3)))
    out.groupBy(_._1).values.foreach { shardRows =>
      val byId = shardRows.sortBy(_._2).map(_._3)
      assert(byId === byId.sorted, "bin ids must be monotone in doc id")
      assert(byId.distinct === (0L until byId.distinct.size).toSeq,
        "bin ids must be dense from 0")
    }
  }

  test("property: packBins matches a sequential next-fit reference on generated corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val tokGen = Gen.choose(1, 12)
    val rows = (0 until 200).flatMap { i =>
      tokGen.apply(Gen.Parameters.default, Seed(900L + i))
        .map(n => (i.toLong, ("w " * n).trim))
    }
    val cap = 10
    val got = Corpus.packBins(rows.toDF("id", "text"), "id", "text",
        nShards = 8, binTokens = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // reference: per shard in id order, next-fit with capacity reset
    val want = rows.groupBy(_._1 % 8).flatMap { case (_, docs) =>
      var bin = -1L; var used = 0L; var open = false
      docs.sortBy(_._1).map { case (id, text) =>
        val n = text.split(" ").length.toLong
        if (!open || used + n > cap) { bin += 1; used = n; open = true }
        else used += n
        id -> bin
      }
    }
    assert(got === want)
  }

  test("property: snapshotDiff matches a reference classifier on generated snapshots") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val contentGen = Gen.oneOf("a", "b", "c")
    def snap(seed: Long): Map[Long, String] =
      (0 until 60).flatMap { i =>
        // ~2/3 of keys present per side
        if ((i * seed) % 3 != 0)
          contentGen.apply(Gen.Parameters.default, Seed(seed * 100 + i))
            .map(c => i.toLong -> c)
        else None
      }.toMap
    val o = snap(7); val n = snap(11)
    val got = Corpus.snapshotDiff(
        o.toSeq.toDF("id", "body"), n.toSeq.toDF("id", "body"), "id", "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (o.keySet ++ n.keySet).map { k =>
      k -> ((o.get(k), n.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      })
    }.toMap
    assert(got === want)
  }

  // ── clusterBalance ────────────────────────────────────────────────────

  test("clusterBalance assigns to the nearest centroid and caps each cluster") {
    val s = spark
    import s.implicits._
    // axis-aligned centroids; points cluster by dominant coordinate
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val rows = (1 to 30).map(i => (i.toLong, Array(1.0f, 0.1f))) ++
      (31 to 40).map(i => (i.toLong, Array(0.1f, 1.0f)))
    val df = rows.toDF("id", "vec")
    val kept = Corpus.clusterBalance(df, "id", "vec", cents, quota = 5)
    val byCluster = kept.groupBy(col("cluster")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCluster(0L) === 5L, "over-quota cluster capped")
    assert(byCluster(1L) === 5L)
    // determinism: same seed → same kept ids
    val ids1 = kept.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Corpus.clusterBalance(df, "id", "vec", cents, quota = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // under-quota cluster survives whole
    val all = Corpus.clusterBalance(df, "id", "vec", cents, quota = 50)
    assert(all.count() === 40L)
  }

  test("clusterBalance: assignment is narrow (no exchange before the quota window)") {
    val s = spark
    import s.implicits._
    val df = (1 to 20).map(i => (i.toLong, Array(1.0f, 0.5f))).toDF("id", "vec")
    val assigned = graft.ops.Similarity.assignClusters(df, "vec",
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"centroid assignment must not shuffle:\n$plan")
  }
}
