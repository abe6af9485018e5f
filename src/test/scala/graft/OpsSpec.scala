package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Profile, Similarity, TextAnalysis}

/** Training-data operator specs: planted-duplicate ground truth for the
  * hash-based detectors the DuckDB oracle can't mirror. */
class OpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  private lazy val withNearDups = {
    val d = docs.select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text")))
  }

  test("dedup: minhash LSH finds every planted near-duplicate pair") {
    val pairs = Dedup.minhashLshPairs(withNearDups, "doc_id", "text")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    val found = planted.intersect(pairs)
    // ~0.98^16-band recall at jaccard≈0.95; demand full recall on this data
    assert(found.size >= (planted.size * 0.95).toInt,
      s"found ${found.size} of ${planted.size} planted pairs")
  }

  test("dedup: simhash of a near-duplicate is hamming-close, unrelated is far") {
    val sh = withNearDups
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // Measured on this corpus: planted-pair hamming max 14 / mean ~3.4;
    // unrelated-pair mean ~17. Thresholds sit between the two modes.
    val planted = sh.keys.filter(_ >= 100000).take(20)
    planted.foreach { id =>
      assert(hamming(sh(id), sh(id - 100000)) <= 16,
        s"near-dup $id hamming ${hamming(sh(id), sh(id - 100000))}")
    }
    // two unrelated docs should be far apart on average
    val ids = sh.keys.filter(_ < 100000).toSeq.sorted.take(40)
    val dists = ids.sliding(2).map { case Seq(a, b) => hamming(sh(a), sh(b)) }.toSeq
    assert(dists.sum.toDouble / dists.size > 12.0)
  }

  test("dedup: clusterPairs resolves transitive chains to the minimum member id") {
    val s = spark
    import s.implicits._
    // two chains: 1-2-3-4 (transitive, never directly 1-4) and 10-11;
    // plus an isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("a_id", "b_id")
    val clusters = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L))
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
    assert(clusters(20L) == 20L && clusters(21L) == 20L)
  }

  test("dedup: driver union-find and distributed pointer jumping agree exactly") {
    val s = spark
    import s.implicits._
    // deep chain (forces several distributed rounds), a star, an
    // isolated pair, and reversed-order edges
    val pairs = ((1L to 40L).sliding(2).map { case Seq(a, b) => (b, a) }.toSeq ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (200L, 201L)))
      .toDF("a_id", "b_id")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val small = asMap(Dedup.clusterPairs(pairs)) // driver path (default limit)
    val dist = asMap(Dedup.clusterPairs(pairs, driverEdgeLimit = 0L)) // forced distributed
    assert(small === dist)
    assert(small(40L) === 1L && small(103L) === 100L && small(201L) === 200L)
  }

  test("dedup: minhash pairs + clustering keep exactly one doc per planted dup group") {
    val pairs = Dedup.minhashLshPairs(withNearDups, "doc_id", "text")
    val clusters = Dedup.clusterPairs(pairs)
    // every cluster has exactly one keeper (id == cluster)
    val keepers = clusters.filter(col("id") === col("cluster")).count()
    val nClusters = clusters.select("cluster").distinct().count()
    assert(keepers == nClusters)
  }

  test("dedup: dedupCorpus keeps exactly one member per verified near-dup cluster") {
    val minJ = 0.5
    val kept = Dedup.dedupCorpus(withNearDups, "doc_id", "text", minJaccard = minJ)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val planted = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the vast majority of planted copies are dropped (short docs can
    // legitimately fall under the similarity threshold: +3 tokens on a
    // 10-token doc is Jaccard ~0.57)
    val dropped = planted.count(id => !keptIds.contains(id + 100000))
    assert(dropped >= (planted.size * 0.9).toInt, s"dropped $dropped of ${planted.size}")
    // per cluster exactly the canonical member survives (the corpus also
    // contains organic near-dup pairs among originals — those dedup too)
    val clusters = Dedup.clusterPairs(
        Dedup.minhashLshPairs(withNearDups, "doc_id", "text")
          .filter(col("est_jaccard") >= minJ))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    clusters.foreach { case (id, cluster) =>
      assert(keptIds.contains(id) == (id == cluster), s"id=$id cluster=$cluster")
    }
  }

  test("dedup: global line dedup keeps boilerplate only in its first document") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "unique alpha line\nshared footer\n\nunique beta line"),
      (2L, "another doc body\nshared footer\nits own ending"),
      (3L, "shared footer"), // nothing but boilerplate → reduced to ""
      (4L, "  \nunique gamma line\n  ")) // whitespace lines always survive
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.dedupLinesGlobal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique alpha line\nshared footer\n\nunique beta line",
      "first occurrence keeps the footer and the blank line")
    assert(out(2L) == "another doc body\nits own ending")
    assert(out(3L) == "", "a document of pure boilerplate reduces to empty")
    assert(out(4L) == "  \nunique gamma line\n  ")
    assert(out.size == 4, "every input document comes back")
  }

  test("dedup: repeated spans are excised everywhere but the globally-first occurrence") {
    val s = spark
    import s.implicits._
    val shared = "one two three four five" // exactly w=5 tokens
    val docs = Seq(
      (1L, s"intro words here $shared closing remarks now"), // owner: keeps the span
      (2L, s"different start $shared different end"),        // non-owner: span excised
      (3L, s"$shared"),                                      // nothing but the span → ""
      (4L, "short doc"),                                     // < w tokens: untouched
      (5L, "self self self self self self self self self self")) // within-ONE-doc repeat only
      .toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(docs, "doc_id", "text", w = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((11L, 0L, s"intro words here $shared closing remarks now")))
    assert(out(2L)._3 == "different start different end", "non-owner loses exactly the span")
    assert(out(2L)._2 == 5L)
    assert(out(3L) == ((5L, 5L, "")), "a document of pure duplicated span reduces to empty")
    assert(out(4L) == ((2L, 0L, "short doc")))
    assert(out(5L)._2 == 0L, "a span repeated only within one document is NOT excised")
    assert(out.size == 5)
  }

  test("dedup: overlapping duplicated spans merge their covered positions") {
    val s = spark
    import s.implicits._
    // docs 1 and 2 share a 7-token run → three overlapping 5-shingles are
    // duplicated; coverage in doc 2 must merge to the 7 tokens, not 15
    val run = "a b c d e f g"
    val docs = Seq(
      (1L, s"owner text $run and more"),
      (2L, s"copycat $run trailing")).toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(docs, "doc_id", "text", w = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, s"owner text $run and more")))
    assert(out(2L) == ((7L, "copycat trailing")))
  }

  test("property: span excision matches a sequential reference implementation") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val w = 3
    // tiny alphabet → natural cross-doc spans; "" and " " stress the
    // tokenizer's empty-segment filtering
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "", " ")
    val textGen = Gen.listOfN(10, wordGen).map(_.mkString(" "))
    val texts = (0 until 60).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(1000L + i)).map(t => (i.toLong, t)))

    // sequential reference: same semantics, no Spark
    val toks = texts.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    case class Occ(id: Long, start: Int)
    val occs = scala.collection.mutable.Map.empty[String, Vector[Occ]]
    for ((id, ts) <- toks.toSeq.sortBy(_._1); st <- 1 to ts.length - w + 1) {
      val key = ts.slice(st - 1, st - 1 + w).mkString("")
      occs(key) = occs.getOrElse(key, Vector()) :+ Occ(id, st)
    }
    val covered = scala.collection.mutable.Set.empty[(Long, Int)]
    for ((_, os) <- occs if os.map(_.id).distinct.size >= 2) {
      val owner = os.minBy(o => (o.id, o.start))
      for (o <- os if o != owner; p <- o.start until o.start + w)
        covered += ((o.id, p))
    }
    val expected = texts.map { case (id, _) =>
      val ts = toks(id)
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !covered((id, i + 1)) => t }
      id -> ((ts.length.toLong, (ts.length - kept.length).toLong,
        kept.mkString(" ")))
    }.toMap

    val got = Dedup.exciseRepeatedSpans(
        texts.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, actual) =>
      assert(actual == expected(id), s"doc $id: got $actual, want ${expected(id)}")
      // conservation: kept-token count equals n_tokens - n_removed
      val keptCount =
        if (actual._3.isEmpty) 0 else actual._3.split(" ").length
      assert(keptCount == actual._1 - actual._2)
    }
    // sanity: the generator actually produced cross-doc duplicated spans
    assert(covered.nonEmpty, "generator produced no duplicated spans — test is vacuous")
  }

  test("dedup: exact dedup counts planted copies (identical text collapses)") {
    val d = docs.select("doc_id", "text")
    val dup = d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
    val res = Dedup.exact(dup, "doc_id", "text")
    assert(res.filter(col("n_copies") >= 2).count() ==
      d.filter(col("doc_id") % 10 === 0).count())
  }

  test("similarity: brute-force top-1 of a query against itself is cosine 1") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val top1 = Similarity.bruteForceTopK(q, c, "q_id", "q_vec", "c_id", "c_vec", 1)
      .collect()
    assert(top1.length == 5)
    top1.foreach { r =>
      assert(r.getAs[Long]("q_id") == r.getAs[Long]("c_id"))
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-9)
    }
  }

  test("similarity: LSH top-k recall vs brute force is reasonable") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val exact = Similarity.bruteForceTopK(q, c, "q_id", "q_vec", "c_id", "c_vec", 1)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(q, c, "q_id", "q_vec", "c_id", "c_vec", 1, planes = 8)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // self-match always shares every bucket → top-1 recall is exact here;
    // require it to hold as a floor
    assert(approx.intersect(exact).size == exact.size)
  }

  test("similarity: zero vectors yield null cosine and are EXCLUDED from every top-k") {
    val s = spark
    import s.implicits._
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val c = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f))).toDF("c_id", "c_vec")
    val top = Similarity.bruteForceTopK(q, c, "q_id", "q_vec", "c_id", "c_vec", 3)
      .orderBy(col("rank")).collect()
    // a null cosine is "no similarity", never a neighbor — ONE contract
    // across brute/lsh/ivf/pq (the brute path used to pad short top-ks
    // with null-score phantoms while ivf filtered them; diffing
    // exact-vs-ANN answers then showed spurious rows on one side only)
    assert(top.map(_.getAs[Long]("c_id")).toSeq == Seq(1L, 3L),
      "the zero vector must not occupy a top-k slot")
    assert(top.forall(!_.isNullAt(top.head.fieldIndex("cos_sim"))))
    val lsh = Similarity.lshTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
      k = 3, planes = 4)
      .collect().map(_.getAs[Long]("c_id")).toSet
    assert(!lsh.contains(2L), "LSH must exclude the zero vector too")
  }

  test("similarity: IVF top-k self-match recall is exact") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val top1 = Similarity.ivfTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
        k = 1, nCentroids = 16, nProbe = 4).collect()
    // A query identical to a corpus vector lands in the same inverted
    // list (same similarities, same tie-break), so top-1 must be itself.
    assert(top1.length == 20)
    top1.foreach { r =>
      assert(r.getAs[Long]("q_id") == r.getAs[Long]("c_id"))
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-9)
    }
  }

  test("similarity: Lloyd-refined IVF centroids preserve exact self-match recall") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val top1 = Similarity.ivfTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
        k = 1, nCentroids = 8, nProbe = 3, refineIterations = 2).collect()
    assert(top1.length == 10)
    top1.foreach { r =>
      assert(r.getAs[Long]("q_id") == r.getAs[Long]("c_id"))
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-9)
    }
    // refinement actually moves the centroids off the raw sample
    val sample = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val s = spark
    import s.implicits._
    val tiny = Seq(Tuple1(Array(0.9f, 0.1f)), Tuple1(Array(0.8f, 0.0f)),
      Tuple1(Array(0.1f, 0.9f))).toDF("v")
    val refined = Similarity.refineCentroids(tiny, "v", sample, iterations = 1)
    assert(refined.head != sample.head)
    // spherical update: mean of L2-normalized members' first components
    val expected = (0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1) + 0.8 / 0.8) / 2.0
    assert(math.abs(refined.head.head - expected) < 1e-6)
  }

  test("text: filter cascade names every failed gate in fixed order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat and the dog went to the market and was happy to see all of it"),
      (2L, "a b c"),                       // short + und
      (3L, "x y x y x y x y x y x y"),     // low alpha + repetitive + und
      (4L, "le chat et le chien et le chat et le chien et le chat marchent"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.filterReasons(docs, col("text"))
      .select(col("doc_id"), col("fail_reasons"), col("keep")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ("" -> true))
    assert(out(2L) == ("too_short,wrong_lang" -> false))
    assert(out(3L) == ("low_alpha,repetitive,wrong_lang" -> false))
    assert(out(4L)._1.contains("wrong_lang") && !out(4L)._2) // fr is not a target
  }

  test("text: langid marker scores prefer english for english-marker text") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house is big"),
      (2L, "der hund und die katze ist nicht da das"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = TextAnalysis.langIdScores(df, col("text"))
      .select("doc_id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("multimodal: batched feature extraction preserves count and derives from bytes") {
    val media = Multimodal.asMediaTable(docs)
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 7)
    val n = docs.count()
    assert(feats.count() == n)
    val joined = feats.toDF().join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("len")).count() == 0)
  }

  test("multimodal: resize caps every payload at the target byte budget") {
    val media = Multimodal.asMediaTable(docs)
    val resized = Multimodal.resizeImages(spark, media, width = 8, height = 8)
    assert(resized.count() == docs.count())
    assert(resized.filter(r => r.payload.length > 64).count() == 0)
    assert(resized.filter(r => r.width != 8 || r.height != 8).count() == 0)
  }

  // ── Decoder contract: the REAL javax.imageio binding and the stub
  // satisfy the same MediaDecoder interface, so production codecs drop
  // in without touching the Spark plumbing. ────────────────────────────

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("multimodal: ImageIoDecoder decodes real PNG dimensions, resizes, and drops junk") {
    import Multimodal.{ImageIoDecoder, MediaRecord}
    val png = pngBytes(13, 7)
    val feats = ImageIoDecoder.decodeBatch(Seq(
      MediaRecord(1L, "image", png),
      MediaRecord(2L, "image", "not an image".getBytes("UTF-8"))))
    // junk payload dropped (F2-style validate-and-drop), real one decoded
    assert(feats.map(_.doc_id) == Seq(1L))
    assert(feats.head.fake_width == 13L && feats.head.fake_height == 7L)
    assert(feats.head.fake_frames == 1L)
    assert(feats.head.n_bytes == png.length.toLong)
    // resize produces a decodable PNG at the target resolution
    val resized = ImageIoDecoder.resize(png, 4, 5)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 4 && back.getHeight == 5)
    // frame 0 of a still image is the image itself
    val frame = ImageIoDecoder.decodeFrame(png, 0)
    val f0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
    assert(f0.getWidth == 13 && f0.getHeight == 7)
    assert(ImageIoDecoder.frameCount(png) == 1)
    assert(ImageIoDecoder.frameCount("junk".getBytes("UTF-8")) == 0)
  }

  test("multimodal: the Spark plumbing runs unchanged over the real decoder") {
    val s = spark
    import s.implicits._
    val media = Seq(
      (1L, "image", pngBytes(16, 9)),
      (2L, "image", pngBytes(3, 3)),
      (3L, "image", "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(spark, media,
        decoder = Multimodal.ImageIoDecoder)
      .collect().sortBy(_.doc_id)
    assert(feats.map(f => (f.doc_id, f.fake_width, f.fake_height)).toSeq ==
      Seq((1L, 16L, 9L), (2L, 3L, 3L)))
    val frames = Multimodal.sampleFrames(spark, media, everyNth = 1,
      decoder = Multimodal.ImageIoDecoder).collect()
    assert(frames.map(_.doc_id).sorted.toSeq == Seq(1L, 2L)) // junk → 0 frames
  }

  test("multimodal: WavDecoder recovers real WAV metadata and RMS, drops non-audio") {
    import Multimodal.{MediaRecord, WavDecoder}
    // a genuine RIFF/WAVE round-trip: encode 1600 samples of a ±2000
    // square wave at 16 kHz, decode it back
    val wav = Multimodal.syntheticWav(nSamples = 1600, amplitude = 2000, sampleRate = 16000)
    val feats = WavDecoder.decodeBatch(Seq(
      MediaRecord(1L, "audio", wav),
      MediaRecord(2L, "audio", "definitely not audio".getBytes("UTF-8"))))
    assert(feats.map(_.doc_id) == Seq(1L), "non-audio payload must drop")
    val f = feats.head
    assert(f.sample_rate == 16000.0)
    assert(f.channels == 1)
    assert(f.n_frames == 1600L)
    assert(math.abs(f.duration_sec - 0.1) < 1e-9)
    // square wave RMS = amplitude / 32767 exactly
    assert(math.abs(f.rms - 2000.0 / 32767.0) < 1e-9, s"rms ${f.rms}")
    assert(f.n_bytes == wav.length.toLong)

    // the Spark plumbing runs the same decode distributed
    val s = spark
    import s.implicits._
    val media = Seq(
      (10L, "audio", Multimodal.syntheticWav(800, 1000, 8000)),
      (11L, "audio", "junk".getBytes("UTF-8")))
      .toDF("doc_id", "kind", "payload")
    val got = Multimodal.extractAudioFeatures(s, media).collect()
    assert(got.map(_.doc_id).toSeq == Seq(10L))
    assert(math.abs(got.head.rms - 1000.0 / 32767.0) < 1e-9)
    assert(math.abs(got.head.duration_sec - 0.1) < 1e-9)
  }

  test("multimodal: dHash64 round-trips plantedImage bit-for-bit, drops junk") {
    import Multimodal.{dHash64, plantedImage}
    // arbitrary patterns including the sign bit and dense/sparse mixes —
    // the whole 64-bit space must survive PNG encode → decode → resample
    val vs = Seq(0L, -1L, 42L, 0x8000000000000000L, 0xDEADBEEFCAFEBABEL,
      0x0123456789ABCDEFL, 1L << 63 | 1L)
    vs.foreach { v =>
      assert(dHash64(plantedImage(v)) == Some(v), s"round-trip failed for $v")
    }
    assert(dHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("multimodal: imageNearDups finds re-encodes and close hashes, cuts at maxHamming") {
    val s = spark
    import s.implicits._
    val v = 0x0F0F0F0F0F0F0F0FL
    val media = Seq(
      (1L, v),          // base
      (2L, v),          // exact twin (re-encode: identical hash)
      (3L, v ^ 1L),              // hamming 1
      (4L, v ^ 0xF000000000000001L) // hamming 5 from base, 4 from doc 3 — cut
    ).toDF("doc_id", "v").as[(Long, Long)]
      .map { case (id, x) =>
        Multimodal.MediaRecord(id, "image", Multimodal.plantedImage(x)) }
      .toDF()
      // junk row: must drop, not crash or pair
      .unionByName(Seq((9L, "image", "junk".getBytes("UTF-8")))
        .toDF("doc_id", "kind", "payload"))
    val pairs = Multimodal.imageNearDups(s, media, maxHamming = 3, bands = 4)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)]
      .collect().sorted.toSeq
    assert(pairs == Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)),
      s"got $pairs")
  }

  test("multimodal: pairNearDups needs BOTH modalities — re-encode+paraphrase pairs only") {
    val s = spark
    import s.implicits._
    val v = 0x1234567890ABCDEFL
    val e1 = Array(1.0f, 0.0f, 2.0f, 0.0f)   // caption A (and its "paraphrase")
    val e2 = Array(0.0f, 3.0f, 0.0f, 1.0f)   // orthogonal caption: cos 0
    val pairsDf = Seq(
      Multimodal.PairRecord(1L, Multimodal.plantedImage(v), e1),        // original
      Multimodal.PairRecord(2L, Multimodal.plantedImage(v ^ 1L), e1),   // re-encode (hamming 1) + paraphrase -> DUP
      Multimodal.PairRecord(3L, Multimodal.plantedImage(v), e2),        // same image, different caption -> not a dup
      Multimodal.PairRecord(4L, Multimodal.plantedImage(v ^ 0xFFL), e1) // same caption, image 8 bits off -> not a dup
    ).toDF()
    val got = Multimodal.pairNearDups(s, pairsDf,
        maxHamming = 3, bands = 4, cosThreshold = 0.95)
      .select(col("a_id"), col("b_id"), col("hamming").cast("int"),
        round(col("cos_sim"), 4))
      .as[(Long, Long, Int, Double)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L, 1, 1.0)), s"got $got")
  }

  test("multimodal: WavDecoder handles 8-bit UNSIGNED PCM (WAV's native 8-bit form)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import Multimodal.{MediaRecord, WavDecoder}
    // 8-bit WAV is unsigned with silence at 128: a constant-128 stream
    // must read as RMS 0 (the old signed-byte math read it near FULL
    // scale: (-128/127)^2 ≈ 1), and a 128±100 square wave as 100/127
    def wav8(samples: Array[Int], rate: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate.toFloat, 8, 1, /*signed=*/ false, false)
      val data = samples.map(_.toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val silence = wav8(Array.fill(400)(128), 8000)
    val square = wav8(Array.tabulate(400)(i => if (i % 2 == 0) 228 else 28), 8000)
    val feats = WavDecoder.decodeBatch(Seq(
      MediaRecord(1L, "audio", silence), MediaRecord(2L, "audio", square)))
    assert(feats.map(_.doc_id) == Seq(1L, 2L))
    assert(math.abs(feats(0).rms - 0.0) < 1e-9, s"silence rms ${feats(0).rms}")
    assert(math.abs(feats(1).rms - 100.0 / 127.0) < 1e-9, s"square rms ${feats(1).rms}")
    assert(feats.forall(_.sample_rate == 8000.0))
    assert(feats.forall(_.n_frames == 400L))
  }

  test("joins: asofJoin takes the latest right row at-or-before, inclusive, null when none") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val left = Seq(
      (1L, 7L, t("2024-01-01 10:00:00")),  // before any right → null
      (2L, 7L, t("2024-01-01 11:00:00")),  // equal ts → inclusive match
      (3L, 7L, t("2024-01-01 12:30:00")),  // between rights → earlier one
      (4L, 8L, t("2024-01-01 12:00:00"))   // other key
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (7L, t("2024-01-01 11:00:00"), 100L),
      (7L, t("2024-01-01 12:00:00"), 200L),
      (8L, t("2024-01-01 09:00:00"), 300L)
    ).toDF("k", "ts", "v")
    val out = graft.ops.Joins.asofJoin(left, right, "k", "ts")
      .select(col("event_id"), col("asof_v")).orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((1L, -1L), (2L, 100L), (3L, 200L), (4L, 300L)))
  }

  test("embeddings: normalize yields unit vectors, zero vectors map to null / zero quant") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(-2.0f, 0.0f))
    ).toDF("vec_id", "v")
    import graft.ops.Embeddings
    val rows = df.select(col("vec_id"),
      Embeddings.l2Normalize(col("v")).as("u"),
      Embeddings.quantizeInt8(col("v")).as("q"),
      Embeddings.quantizeScale(col("v")).as("s")).orderBy("vec_id").collect()
    assert(rows(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(rows(0).getSeq[Int](2) == Seq(95, 127)) // round(3*127/4), 127
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(3))
    assert(rows(1).getSeq[Int](2) == Seq(0, 0))
    assert(rows(2).getSeq[Double](1) == Seq(-1.0, 0.0))
    assert(rows(2).getSeq[Int](2) == Seq(-127, 0))
  }

  test("embeddings: fused CSV kernels match the column-function semantics") {
    val s = spark
    import s.implicits._
    import graft.ops.Embeddings
    val real = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding").as("v"))
    val zero = Seq((100000L, Array.fill(4)(0.0f))).toDF("vec_id", "v")
    val df = real.unionByName(zero)
    val u = Embeddings.unitCsvStruct(col("v"))
    val q = Embeddings.quant8CsvStruct(col("v"))
    val rows = df.select(
      u.getField("unit_vec_micro").as("ku"),
      array_join(transform(Embeddings.l2Normalize(col("v")),
        x => round(x * 1e6).cast("long").cast("string")), ",").as("cu"),
      round(u.getField("l2_norm"), 6).as("kn"),
      round(sqrt(Embeddings.l2NormSq(col("v"))), 6).as("cn"),
      q.getField("q8_csv").as("kq"),
      array_join(transform(Embeddings.quantizeInt8(col("v")),
        _.cast("string")), ",").as("cq"),
      round(q.getField("scale"), 6).as("ks"),
      round(Embeddings.quantizeScale(col("v")), 6).as("cs")).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("ku") == r.getAs[String]("cu"))
      assert(r.getAs[Any]("kn") == r.getAs[Any]("cn"))
      assert(r.getAs[String]("kq") == r.getAs[String]("cq"))
      assert(r.getAs[Any]("ks") == r.getAs[Any]("cs"))
    }
  }

  test("joins: rangeJoinBucketed matches half-open intervals across bucket boundaries") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, -5.0), (2L, 0.0), (3L, 9.99), (4L, 10.0), (5L, 15.0), (6L, 25.0))
      .toDF("event_id", "value")
    val right = Seq(("A", -10.0, 0.0), ("B", 0.0, 10.0), ("C", 5.0, 25.0))
      .toDF("band", "lo", "hi")
    val out = graft.ops.Joins.rangeJoinBucketed(left, right,
        "value", "lo", "hi", bucketWidth = 10.0)
      .select(col("event_id"), col("band")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // half-open [lo, hi): 0.0 not in A, 10.0 not in B, 25.0 in nothing;
    // C spans three buckets and still matches 9.99 / 10 / 15
    assert(out == Set(
      (1L, "A"), (2L, "B"), (3L, "B"), (3L, "C"), (4L, "C"), (5L, "C")))
  }

  test("joins: fuzzyJoinBlocked on a hot-prefix corpus matches the brute-force pair set") {
    val s = spark
    import s.implicits._
    // Every string shares the 4-char block prefix — the worst case the
    // length band exists for. Lengths vary so the band splits the block.
    val strs = Seq(
      1L -> "abcd", 2L -> "abcde", 3L -> "abcdx", 4L -> "abcdefgh",
      5L -> "abcdefghx", 6L -> "abcdefghxy", 7L -> "abcdefghijklmnop",
      8L -> "abcdefghijklmnoq", 9L -> "abcd", 10L -> "abcdefghijklmnopqrstuvwx")
    val maxDist = 2
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val expected = (for {
      (ai, as_) <- strs; (bi, bs) <- strs if ai < bi
      d = lev(as_, bs) if d <= maxDist
    } yield (ai, bi, d.toLong)).toSet
    val out = graft.ops.Joins.fuzzyJoinBlocked(
        strs.toDF("id", "name"), "id", "name", blockLen = 4, maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expected, s"got $out\nexpected $expected")
  }

  test("joins: fuzzyJoinBlocked shuffles on (prefix, length-band) — the band reaches the join key") {
    val s = spark
    import s.implicits._
    val df = Seq(1L -> "aaaa", 2L -> "aaab").toDF("id", "name")
    val p = graft.ops.Joins.fuzzyJoinBlocked(df, "id", "name", 3, 1)
      .queryExecution.executedPlan.toString
    // both join key components present in the hash partitioning / join keys
    assert(p.contains("__blk") && p.contains("__band"),
      s"length band missing from the join key\n$p")
  }

  // ── Verified near-dup pairs (the oracle-checkable two-stage shape) ───

  test("dedup: verifiedNearDupPairs returns exact shingle Jaccard for every planted pair") {
    val pairs = Dedup.verifiedNearDupPairs(withNearDups, "doc_id", "text",
      minJaccard = 0.5).collect()
    val planted = withNearDups.filter(col("doc_id") >= 100000).count()
    val found = pairs.filter(p =>
      p.getAs[Long]("b_id") == p.getAs[Long]("a_id") + 100000)
    assert(found.length == planted)
    // jaccard is the EXACT (n-2)/(n+1) shingle overlap of an n-token doc
    // extended by 3 tokens — spot-check bounds rather than re-derive
    assert(found.forall { p =>
      val j = p.getAs[Double]("jaccard"); j > 0.5 && j <= 1.0
    })
  }

  test("dedup: native shingle-jaccard kernel matches the column-expression semantics") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("a b c d e", "a b c d e zz yy xx"),
      ("", ""), (" ", "\t"), ("one two", "one two"),
      ("a b c", "x y z"), ("a  b\tc ", "a b c"),
      ("tiny", "tiny doc"), ("a b", "a b c d"))
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
    val colExpr = {
      val sa = Dedup.shingleSet(col("a"), 3)
      val sb = Dedup.shingleSet(col("b"), 3)
      size(array_intersect(sa, sb)) * lit(1.0) / size(array_union(sa, sb))
    }
    val rows = df.select(col("id"),
      call_function("graft_shingle_jaccard", col("a"), col("b"), lit(3)).as("k"),
      colExpr.as("c")).orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"case ${r.getLong(0)}: kernel=${r.getDouble(1)} column=${r.getDouble(2)}")
    }
  }

  test("dedup: simhashBandPairs finds every pair within the pigeonhole bound") {
    val s = spark
    import s.implicits._
    // identical texts (hamming 0) MUST collide in all 4 bands
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words entirely here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashBandPairs(d, "doc_id", "text").collect()
    val exact = pairs.filter(_.getAs[Int]("hamming") == 0)
      .map(p => (p.getAs[Long]("a_id"), p.getAs[Long]("b_id")))
    assert(exact.toSeq == Seq((1L, 2L)))
  }

  test("similarity: multi-band LSH always finds an identical twin at top-1") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val twins = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("c_id"), col("embedding").as("c_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .unionByName(twins)
    val top1 = Similarity.lshTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
      k = 1, planes = 8, bands = 2, excludeSelf = true).collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getAs[Long]("c_id") == r.getAs[Long]("q_id") + 100000)
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-9)
    }
  }

  test("learn: batch GD fits a separable rule — loss decreases, classes separate") {
    val s = spark
    import s.implicits._
    // y = 1 iff x1 > 0.5, with margin; x2 is noise
    val rows = (0 until 400).map { i =>
      val x1 = (i % 100) / 100.0
      val x2 = ((i * 37) % 100) / 100.0
      (x1, x2, if (x1 > 0.5) 1.0 else 0.0)
    }.filter(r => math.abs(r._1 - 0.5) > 0.05)
    val df = rows.toDF("x1", "x2", "label")
    val before = graft.ops.Learn.logLoss(df, Seq("x1", "x2"), "label",
      Seq(0.0, 0.0), 0.0)
    val (w, b) = graft.ops.Learn.fitLogistic(df, Seq("x1", "x2"), "label",
      learningRate = 4.0, iterations = 60)
    val after = graft.ops.Learn.logLoss(df, Seq("x1", "x2"), "label", w, b)
    assert(after < before * 0.5, s"loss must halve: $before -> $after")
    assert(w.head > 0.0, "the discriminative feature must gain positive weight")
    // decision accuracy on the training rule
    val z = col("x1") * w(0) + col("x2") * w(1) + lit(b)
    val acc = df.select(avg(((z > 0) === (col("label") === 1.0)).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.95, s"separable rule should classify >95%: $acc")
  }

  test("learn: softmax GD fits a 3-class separable rule — loss decreases, classes separate") {
    val s = spark
    import s.implicits._
    // class = low/mid/high by x1 thirds, with margin; x2 is noise
    val rows = (0 until 600).map { i =>
      val x1 = (i % 100) / 100.0
      val x2 = ((i * 37) % 100) / 100.0
      val y = if (x1 < 0.33) "low" else if (x1 < 0.66) "mid" else "high"
      (x1, x2, y)
    }.filter(r => math.abs(r._1 - 0.33) > 0.04 && math.abs(r._1 - 0.66) > 0.04)
    val df = rows.toDF("x1", "x2", "label")
    val classes = Seq("low", "mid", "high")
    val zeroW = classes.map(_ => Seq(0.0, 0.0))
    val before = graft.ops.Learn.crossEntropyLoss(
      df, Seq("x1", "x2"), "label", classes, zeroW, Seq(0.0, 0.0, 0.0))
    val (w, b) = graft.ops.Learn.fitSoftmax(df, Seq("x1", "x2"), "label",
      classes, learningRate = 4.0, iterations = 120)
    val after = graft.ops.Learn.crossEntropyLoss(
      df, Seq("x1", "x2"), "label", classes, w, b)
    assert(after < before * 0.5, s"loss must halve: $before -> $after")
    // the x1 weight must order low < mid < high (the discriminative axis)
    assert(w(0)(0) < w(1)(0) && w(1)(0) < w(2)(0), s"weights: $w")
    val acc = graft.ops.Learn.predictSoftmax(df, Seq("x1", "x2"), classes, w, b)
      .select(avg((col("predicted_class") === col("label")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.9, s"separable 3-class rule should classify >90%: $acc")
  }

  test("learn: softmax gradient residuals sum to zero across classes per component") {
    val s = spark
    import s.implicits._
    // Σ_k p_k = 1 and Σ_k 1[y=k] = 1 for in-class labels, so class
    // gradients must cancel exactly — a structural invariant of softmax
    val df = (1 to 50).map(i => (i / 50.0, if (i % 2 == 0) "a" else "b"))
      .toDF("x", "label")
    val (gw, gb, n) = graft.ops.Learn.softmaxGradient(
      df, Seq("x"), "label", Seq("a", "b"),
      Seq(Seq(0.7), Seq(-0.2)), Seq(0.1, 0.3))
    assert(n == 50L)
    assert(math.abs(gw(0).head + gw(1).head) < 1e-12)
    assert(math.abs(gb(0) + gb(1)) < 1e-12)
  }

  test("learn: gradient at the optimum of a constant label is zero bias direction") {
    val s = spark
    import s.implicits._
    // all labels 1, weights pushed far positive → sigmoid ≈ 1 → residual ≈ 0
    val df = (1 to 100).map(i => (i / 100.0, 1.0)).toDF("x", "label")
    val (gw, gb, n) = graft.ops.Learn.logisticGradient(
      df, Seq("x"), "label", Seq(50.0), 50.0)
    assert(n === 100L)
    assert(math.abs(gb) < 1e-9 && math.abs(gw.head) < 1e-9)
  }

  test("drift: identical slices score zero KS and PSI; a location shift scores both") {
    val s = spark
    import s.implicits._
    val a = (1 to 1000).map(i => (i % 100).toDouble).toDF("value")
    val b = (1 to 1000).map(i => (i % 100).toDouble + 40.0).toDF("value")
    val same = Profile.driftBins(a, a, "value", binWidth = 8.0).collect()
    assert(same.nonEmpty)
    assert(same.forall(r => r.getAs[Double]("ks_gap") == 0.0))
    assert(same.forall(r => r.getAs[Double]("psi_term") == 0.0))

    val drift = Profile.driftBins(a, b, "value", binWidth = 8.0)
    val maxKs = drift.agg(max(col("ks_gap"))).head().getDouble(0)
    assert(maxKs > 0.3, s"40-point shift must show a large CDF gap, got $maxKs")
    // every PSI term is (pa-pb)·ln(pa/pb) ≥ 0; the shift makes some > 0
    val psi = drift.filter(col("psi_term").isNotNull)
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(psi > 0.0, s"PSI over overlapping bins must be positive, got $psi")
  }

  test("pq: codes are m argmins in [0, k); identical vectors share codes") {
    val e = Tables.embeddings(spark, sf0001)
    val cb = Similarity.pqCodebooks(e, "embedding", "vec_id", m = 8, kCodes = 16)
    assert(cb.length === 8 * 16 * 8) // [m][k][sub] for dim 64
    val coded = Similarity.pqEncode(e, "embedding", cb, m = 8, kCodes = 16)
      .select(col("vec_id"), col("pq_codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(coded.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // a codebook sample vector reconstructs exactly → codes (i, i, …, i)?
    // no — sample ki supplies subvector ki of EVERY block, so sample 3's
    // codes are all 3 unless another sample's subvector ties closer
    val self = coded(3L)
    assert(self.forall(_ == 3), s"sample vector should pick itself: $self")
  }

  test("pq: twin recall at small rerank — ADC of a code-identical twin is minimal") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val twins = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("c_id"), col("embedding").as("c_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .unionByName(twins)
    val top1 = Similarity.pqTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
      k = 1, m = 8, kCodes = 16, rerank = 8, excludeSelf = true).collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getAs[Long]("c_id") == r.getAs[Long]("q_id") + 100000)
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-9)
    }
  }

  test("pq: Lloyd-refined codebooks recover recall a degenerate id-order sample loses") {
    val s = spark
    import s.implicits._
    // Adversarial-for-raw-sampling corpus: the 16 LOWEST ids (exactly
    // kCodes — the raw codebook sample) sit in ONE tight cluster, so
    // every raw codeword is nearly identical and ADC can barely
    // distinguish candidates. The real structure — 8 spread clusters on
    // the coordinate axes — lives at higher ids. All deterministic.
    val dim = 8
    def vec(base: Int, i: Int): Seq[Double] =
      Seq.tabulate(dim)(d =>
        (if (d == base) 1.0 else 0.0) + (if (d == (base + 1) % dim) 0.01 * i else 0.0))
    val tight = (0 until 16).map(i => i.toLong -> Seq.tabulate(dim)(d => 1.0 + 0.001 * i * d))
    val spread = for (c <- 0 until 8; i <- 0 until 10)
      yield (100L + c * 10 + i) -> vec(c, i)
    val corpus = (tight ++ spread).toDF("c_id", "c_vec")
    val queries = (0 until 8).map(c => (1000L + c) -> vec(c, 3)).toDF("q_id", "q_vec")
    val k = 3
    // ground truth by exact cosine, computed locally
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val all = (tight ++ spread)
    val truth: Map[Long, Set[Long]] = (0 until 8).map { c =>
      val qv = vec(c, 3)
      (1000L + c) -> all.sortBy { case (id, v) => (-cos(qv, v), id) }.take(k).map(_._1).toSet
    }.toMap
    def recall(refine: Int): Double = {
      // rerank = one cluster's size: stage-1 ADC must place the right
      // CLUSTER into the candidate set (that's what codebook quality
      // controls — within a cluster all members share codes and tie),
      // and the exact re-rank orders within it. A corpus-sized rerank
      // would let exact re-scoring paper over any codebook.
      val got = Similarity.pqTopK(queries, corpus, "q_id", "q_vec", "c_id", "c_vec",
          k = k, m = 4, kCodes = 16, rerank = 10, refineIterations = refine)
        .collect().groupBy(_.getAs[Long]("q_id"))
        .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
      truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t) / k.toDouble }
        .sum / truth.size
    }
    val raw = recall(0)
    val refined = recall(2)
    assert(refined >= raw, s"refined recall $refined < raw $raw")
    assert(refined >= 0.6, s"refined codebooks should mostly find the true top-$k, got $refined")
    assert(raw < refined || raw >= 0.6, s"corpus not adversarial enough to exercise refinement (raw=$raw)")
  }

  test("recallAtK: exact fractions for a constructed miss; refined PQ never loses to raw") {
    val s = spark
    import s.implicits._
    // truth@2 is unambiguous by construction: q10's nearest two are
    // {1, 2}, q11's are {3, 2}. The approx answer recovers both for q10
    // but swaps 2 for 1 on q11 → avg 0.75, min 0.5 — checked EXACTLY.
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)))
      .toDF("c_id", "c_vec")
    val queries = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(0.0, 1.0)))
      .toDF("q_id", "q_vec")
    val approx = Seq((10L, 1L), (10L, 2L), (11L, 3L), (11L, 1L))
      .toDF("q_id", "c_id")
    val r = Similarity.recallAtK(approx, queries, corpus,
      "q_id", "q_vec", "c_id", "c_vec", k = 2, sampleN = 2).collect().head
    assert(r.getInt(0) === 2 && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 0.75) < 1e-9, s"avg ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-9, s"min ${r.getDouble(3)}")

    // The tuning story the diagnostic exists for: measured through
    // recallAtK, Lloyd-refined PQ codebooks never score below the raw
    // id-order sample on the adversarial corpus of the previous test.
    val dim = 8
    def vec(base: Int, i: Int): Seq[Double] =
      Seq.tabulate(dim)(d =>
        (if (d == base) 1.0 else 0.0) + (if (d == (base + 1) % dim) 0.01 * i else 0.0))
    val tight = (0 until 16).map(i => i.toLong -> Seq.tabulate(dim)(d => 1.0 + 0.001 * i * d))
    val spread = for (c <- 0 until 8; i <- 0 until 10)
      yield (100L + c * 10 + i) -> vec(c, i)
    val c2 = (tight ++ spread).toDF("c_id", "c_vec")
    val q2 = (0 until 8).map(c => (1000L + c) -> vec(c, 3)).toDF("q_id", "q_vec")
    def measured(refine: Int): Double =
      Similarity.recallAtK(
        Similarity.pqTopK(q2, c2, "q_id", "q_vec", "c_id", "c_vec",
          k = 3, m = 4, kCodes = 16, rerank = 10, refineIterations = refine),
        q2, c2, "q_id", "q_vec", "c_id", "c_vec", k = 3, sampleN = 8)
      .collect().head.getDouble(2)
    val rawR = measured(0)
    val refR = measured(2)
    assert(refR >= rawR, s"refined recall@3 $refR < raw $rawR")
  }

  test("bm25: term-stuffed document ranks first; termless documents are excluded") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark is one engine among many engines in the world"),
      (3L, "nothing relevant whatsoever appears here"),
      (4L, "")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.bm25TopK(df, "doc_id", "text",
      queryTerms = Seq("spark"), k = 10).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(1L, 2L),
      "higher tf (and shorter doc) must outrank; docs without the term drop out")
    assert(top.forall(_.getDouble(1) > 0.0))
  }

  test("bm25: longer document with equal tf scores lower (length normalization)") {
    val s = spark
    import s.implicits._
    val short = "vector index"
    val long = "vector " + (1 to 60).map(i => s"pad$i").mkString(" ")
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val scores = TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq("vector"), k = 2).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
  }

  test("property: bm25 matches a sequential reference bit-for-bit on generated corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val wordGen = Gen.oneOf("red", "blue", "green", "fish", "cat", "dog", "x")
    val textGen = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    val texts = (0 until 80).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i + 31L)).map(t => (i.toLong, t)))
    val df = texts.toDF("doc_id", "text")
    val terms = Seq("red", "fish", "dog")
    val (k1, b) = (1.2, 0.75)
    val got = TextAnalysis.bm25TopK(df, "doc_id", "text", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))

    // sequential reference: same formula, same operation order
    val toks = texts.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = texts.size.toLong
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n
    def df0(t: String) = toks.values.count(_.contains(t)).toLong
    val scores = toks.toSeq.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val score = terms.map { t =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log((n - df0(t) + 0.5) / (df0(t) + 0.5) + 1.0)
        idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.sum
      if (tk.exists(terms.contains)) Some(id ->
        BigDecimal(score).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      else None
    }.toMap
    val expected = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    assert(got.toSeq === expected,
      s"engine top-10 must equal the sequential reference")
  }

  test("bm25/lm: degenerate inputs return empty results, not driver errors") {
    val s = spark
    import s.implicits._
    val noTerms = Seq((1L, "nothing matches here"), (2L, ""))
      .toDF("doc_id", "text")
    assert(TextAnalysis.bm25TopK(noTerms, "doc_id", "text",
      Seq("absent"), k = 5).count() === 0L)
    val tiny = Seq((1L, "word"), (2L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.lmBigramScore(tiny, "doc_id", "text").count() === 0L)
  }

  test("lm score: corpus-typical text scores lower NLL than an outlier document") {
    val s = spark
    import s.implicits._
    val common = (1 to 30).map(_ => "the quick brown fox jumps")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val outlier = Seq((1000L, "zzq xkw vvm pqr lmn"))
    val df = (common ++ outlier).toDF("doc_id", "text")
    val r = TextAnalysis.lmBigramScore(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(0L) < r(1000L),
      s"typical ${r(0L)} should beat outlier ${r(1000L)}")
    // a <2-token document has no bigrams and is excluded
    val tiny = Seq((1L, "word"), (2L, "two tokens")).toDF("doc_id", "text")
    val ids = TextAnalysis.lmBigramScore(tiny, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }

  test("strict funnel: min-chain semantics, out-of-order resumption, same-ts ties, completion counts") {
    val s = spark
    import s.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val rows = Seq(
      // u1: click BEFORE first view and again after -> advances (the
      // case the min-per-type formulation gets wrong), completes
      (1L, ts(1), "click"), (1L, ts(2), "view"), (1L, ts(3), "click"),
      (1L, ts(4), "purchase"),
      // u2: purchase before click -> stuck at stage 2
      (2L, ts(1), "view"), (2L, ts(2), "purchase"), (2L, ts(3), "click"),
      // u3: click at the SAME ts as the first view -> strict > rejects it
      (3L, ts(1), "view"), (3L, ts(1), "click"),
      // u4: only irrelevant events -> stage 0
      (4L, ts(1), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.ops.Events.funnel(rows, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got == Map(1L -> ((3, true)), 2L -> ((2, false)),
      3L -> ((1, false)), 4L -> ((0, false))), s"got $got")

    val counts = graft.ops.Events.funnelCounts(rows, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 3L, 2 -> 2L, 3 -> 1L), s"got $counts")

    // Routing equivalence: with cap=1 EVERY user with >1 stage event is
    // forced through the join-chain path; the answer must be identical
    // (both paths compute the same min-chain, incl. the same-ts tie)
    val routed = graft.ops.Events.funnel(rows, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), maxEventsPerUser = 1)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(routed == got, s"join-chain routing diverged: $routed vs $got")
  }

  test("funnel overflow routing: a 1M-event user completes without an oversized fold buffer") {
    val s = spark
    import s.implicits._
    // One bot user with 10^6 stage events (view-spam, then one click and
    // one purchase at the end), one normal user. With the cap at 1000
    // the bot routes to the join-chain (per-user state = one row per
    // stage) while the normal user takes the fold; without routing this
    // history would sit in a single million-element aggregation buffer.
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000L)
    val bot = s.range(1000000L).select(
      lit(7L).as("user_id"),
      expr(s"timestamp_millis($base + id * 1000)").as("ts"),
      lit("view").as("event_type"))
    val tail = Seq(
      (7L, ts(2000000L), "click"), (7L, ts(2000001L), "purchase"),
      (8L, ts(1L), "view"), (8L, ts(2L), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.ops.Events.funnel(bot.unionByName(tail), "user_id",
        "ts", "event_type", Seq("view", "click", "purchase"),
        maxEventsPerUser = 1000)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got == Map(7L -> ((3, true)), 8L -> ((2, false))), s"got $got")
  }

  test("funnel bounded-source assertion: Int.MaxValue sentinel drops the guard from the plan") {
    val s = spark
    import s.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val rows = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "view"), (2L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val stages = Seq("view", "click", "purchase")
    def plan(cap: Int): String = graft.ops.Events.funnel(
      rows, "user_id", "ts", "event_type", stages, maxEventsPerUser = cap)
      .queryExecution.executedPlan.toString
    // Bounded assertion: the overflow count-aggregate and both routing
    // joins vanish — no anti/semi join anywhere, and the only joins
    // left are the final left join onto the distinct user list.
    val bounded = plan(Int.MaxValue)
    assert(!bounded.contains("LeftAnti") && !bounded.contains("LeftSemi"),
      s"routing joins survived the bounded assertion\n$bounded")
    // Default guard: the routing pair is present (correct-under-
    // re-execution lazy guard), unchanged by the sentinel's existence.
    val guarded = plan(1000)
    assert(guarded.contains("LeftAnti") && guarded.contains("LeftSemi"),
      s"default guard lost its routing joins\n$guarded")
    // Both variants compute the same funnel.
    def run(cap: Int) = graft.ops.Events.funnel(
      rows, "user_id", "ts", "event_type", stages, maxEventsPerUser = cap)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(Int.MaxValue) == run(1000))
    assert(run(Int.MaxValue) == Map(1L -> 3, 2L -> 1))
  }

  test("hard negatives: same-label neighbors never appear, even when they are the nearest") {
    val s = spark
    import s.implicits._
    val a = Seq.fill(8)(1.0f)
    def tilt(i: Int) = a.updated(0, 1.0f + i * 0.1f)
    val q = Seq((1L, a, 0)).toDF("q_id", "q_vec", "q_label")
    // nearest corpus rows share the query's label; the best negatives
    // are farther — they must still fill all k slots
    val c = Seq(
      (10L, a, 0),          // identical, same label -> excluded
      (11L, tilt(1), 0),    // near, same label -> excluded
      (12L, tilt(2), 1), (13L, tilt(3), 1), (14L, tilt(4), 2))
      .toDF("c_id", "c_vec", "c_label")
    val got = Similarity.hardNegatives(q, c, "q_id", "q_vec", "q_label",
      "c_id", "c_vec", "c_label", k = 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(12L, 13L, 14L), s"got $got")
  }

  test("winnowing: shared-run guarantee, rightmost tie-break, short docs emit nothing") {
    val s = spark
    import s.implicits._
    val sharedRun = "alpha beta gamma delta epsilon zeta" // 6 = window+k-1 tokens
    val docs = Seq(
      1L -> s"one two $sharedRun three four",
      2L -> s"$sharedRun completely different tail here",
      3L -> "x x x x x x",   // all gram hashes equal -> rightmost wins
      4L -> "too short")     // < window+k-1 tokens -> no full window
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // guarantee: any shared window+k-1 token run yields >= 1 shared hash
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      s"shared run produced no shared fingerprint: $byDoc")
    // identical grams: one window (pos 1..4), tie -> rightmost pos 4
    val d3 = fps.filter(_._1 == 3L)
    assert(d3.length == 1 && d3.head._3 == 4L, s"got ${d3.toSeq}")
    assert(!fps.exists(_._1 == 4L))
  }

  test("semantic survivors: component collapses to its min id, chain semantics, singletons survive") {
    val s = spark
    import s.implicits._
    // identical triplet {1,2,3} -> one component (collides in every LSH
    // bucket deterministically); 9 points the other way -> singleton
    val v = Seq.fill(8)(1.0f) ++ Seq.fill(8)(0.0f)
    val w = v.reverse
    val df = Seq(3L -> v, 1L -> v, 2L -> v, 9L -> w)
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticSurvivors(df, "vec_id", "embedding", 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L), s"got $kept")

    // chain semantics via clusterPairs directly: a~b, b~c but not a~c
    // still collapses to min(a) — the property a greedy pairwise rule
    // lacks (LSH-free check; the pair graph is given)
    val chain = Seq((10L, 11L), (11L, 12L)).toDF("a_id", "b_id")
    val cl = Dedup.clusterPairs(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("semantic decontamination: drops exactly the within-threshold rows; shuffle fallback identical; empty benchmark is a no-op") {
    val s = spark
    import s.implicits._
    // v1 and its scaled copy v3 (cosine exactly 1, identical LSH signs)
    // lie on the benchmark direction; v2/v4 are orthogonal axes
    val corpus = Seq(
      1L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      2L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      3L -> Array(2.0f, 0.0f, 0.0f, 0.0f),
      4L -> Array(0.0f, 0.0f, 0.0f, 1.0f)
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      Tuple1(Array(1.0f, 0.0f, 0.0f, 0.0f)),
      Tuple1(Array(0.0f, 0.0f, 0.0f, 3.0f))
    ).toDF("embedding")
    def run(maxBroadcastRows: Long): Seq[Long] =
      Dedup.decontaminateSemantic(corpus, "vec_id", "embedding",
          bench, "embedding", threshold = 0.95,
          maxBroadcastRows = maxBroadcastRows)
        .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    // b1 contaminates v1 and v3; b2 contaminates v4; only v2 survives
    assert(run(1_000_000L) == Seq(2L))
    // over-budget probe (2 bucketed bench rows > 1): shuffle path, same answer
    assert(run(1L) == Seq(2L))
    // empty benchmark: nothing is contaminated, corpus passes through whole
    val none = Dedup.decontaminateSemantic(corpus, "vec_id", "embedding",
        bench.limit(0), "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(none == Seq(1L, 2L, 3L, 4L))
    // graded report: each flagged row carries its hit count + max cosine
    // (all three planted hits are exact-direction matches -> cos 1.0)
    val rep = Dedup.semanticContaminationReport(corpus, "vec_id", "embedding",
        bench, "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rep == Set((1L, 1L, 1.0), (3L, 1L, 1.0), (4L, 1L, 1.0)), s"got $rep")
    // multi-band: exact copies collide in EVERY band, so recall of the
    // planted leaks is unchanged; a pair colliding in several bands
    // scores once, and duplicate benchmark VECTORS count once
    val benchDup = bench.unionByName(bench.limit(1))
    val rep4 = Dedup.semanticContaminationReport(corpus, "vec_id", "embedding",
        benchDup, "embedding", threshold = 0.95, planes = 12, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rep4 == rep, s"banded/duplicated report diverged: $rep4 vs $rep")
    val banded = Dedup.decontaminateSemantic(corpus, "vec_id", "embedding",
        bench, "embedding", threshold = 0.95, planes = 12, bands = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(banded == Seq(2L), s"got $banded")
  }

  test("cosine kernel properties: self-similarity 1, symmetry, bounded, scale-invariant (property)") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random vectors across dims 2..48, incl.
    // negative components and magnitudes spanning 6 orders
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 60).map { i =>
      val dim = 2 + rnd.nextInt(47)
      val scale = math.pow(10.0, rnd.nextInt(7) - 3).toFloat
      (i.toLong, Array.fill(dim)((rnd.nextFloat() * 2 - 1) * scale))
    }.filter(_._2.exists(_ != 0.0f))
    val pairs = for ((ia, va) <- vecs; (ib, vb) <- vecs
                     if ia < ib && va.length == vb.length)
      yield (ia, ib, va, vb)
    val df = (vecs.map { case (i, v) => (i, i, v, v) } ++ pairs)
      .toDF("a_id", "b_id", "a_v", "b_v")
      .select(col("a_id"), col("b_id"),
        graft.ops.Similarity.cosine(col("a_v"), col("b_v")).as("ab"),
        graft.ops.Similarity.cosine(col("b_v"), col("a_v")).as("ba"),
        graft.ops.Similarity.cosine(
          transform(col("a_v"), x => x * lit(4.0f)), col("b_v")).as("ab_scaled"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ab, ba, abS) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(ab - ba) < 1e-9, s"asymmetric cos($a,$b): $ab vs $ba")
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"cos($a,$b) out of range: $ab")
      assert(math.abs(ab - abS) < 1e-6, s"not scale-invariant at ($a,$b): $ab vs $abS")
      if (a == b) assert(math.abs(ab - 1.0) < 1e-6, s"cos($a,$a) != 1: $ab")
    }
  }

  test("misra-gries: superset guarantee holds across partitions; heavyHitters is exact") {
    val s = spark
    import s.implicits._
    // adversarial shape for a k=3 sketch: one true heavy hitter buried
    // in a long tail of singletons, spread over many partitions so the
    // merge path (normalize, sum, cut at (k+1)-th largest) is exercised
    val hot = Seq.fill(400)("hot")
    val tail = (0 until 900).map(i => s"t$i")
    val stream = new scala.util.Random(11).shuffle(hot ++ tail)
    val df = stream.toDF("token").repartition(16)
    val summary = graft.ops.Sketches.misraGries(df, "token", k = 3)
    assert(summary.total == 1300L)
    // true freq 400 > total/(k+1) = 325 -> MUST survive the sketch
    assert(summary.items.contains("hot"),
      s"superset guarantee violated: ${summary.items.mkString(",")}")

    // end-to-end: exact counts after recount, sketch noise gone
    val docs = Seq(
      1L -> (Seq.fill(50)("alpha") ++ Seq.fill(30)("beta")).mkString(" "),
      2L -> (Seq.fill(25)("alpha") ++ (0 until 80).map(i => s"u$i")).mkString(" "),
      3L -> null.asInstanceOf[String]).toDF("doc_id", "text")
    // total tokens = 80 + 105 = 185; minShare 0.15 -> cutoff ceil(27.75)=28
    val hh = graft.ops.TextAnalysis.heavyHitters(docs, col("text"), minShare = 0.15)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("alpha" -> 75L, "beta" -> 30L), s"got $hh")
  }

  test("dup-ngram coverage kernel: hand cases + parity with the window-based reference semantics") {
    val s = spark
    import s.implicits._
    def kernel(df: org.apache.spark.sql.DataFrame) = {
      val st = call_function("graft_dup_ngram_cov", col("text"), lit(2))
      df.select(col("doc_id"), st.getField("n_tokens").as("n_tokens"),
        st.getField("n_dup_tokens").as("n_dup_tokens"))
    }
    val hand = Seq(
      1L -> "a b a b c", // "a b" twice -> positions 1..4 covered
      2L -> "x x x",     // "x x" twice, overlapping -> all 3 covered
      3L -> "a b c",     // no repeats
      4L -> "solo")      // <2 tokens -> no grams
      .toDF("doc_id", "text")
    val got = kernel(hand).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((5L, 4L)))
    assert(got(2L) == ((3L, 3L)))
    assert(got(3L) == ((3L, 0L)))
    assert(got(4L) == ((1L, 0L)))

    // parity on a generated repetitive corpus vs the pre-kernel
    // formulation (corpus-wide (doc, gram) window + position distinct)
    val words = Seq("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 200).map { i =>
      i.toLong -> (0 until (2 + rnd.nextInt(30)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    }.toDF("doc_id", "text")
    val reference = {
      import org.apache.spark.sql.expressions.Window
      val base = corpus
        .select(col("doc_id"),
          posexplode(TextAnalysis.ngramList(col("text"), 2))
            .as(Seq("__p0", "__g")))
        .select(col("doc_id"), (col("__p0") + 1).cast("long").as("__i"),
          col("__g"))
      base.withColumn("__c", count(lit(1))
          .over(Window.partitionBy(col("doc_id"), col("__g"))))
        .filter(col("__c") >= 2)
        .select(col("doc_id"),
          explode(array(col("__i"), col("__i") + 1)).as("__pos"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_tokens"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    kernel(corpus).collect().foreach { r =>
      assert(r.getLong(2) == reference.getOrElse(r.getLong(0), 0L),
        s"doc ${r.getLong(0)}: kernel ${r.getLong(2)} vs reference ${reference.getOrElse(r.getLong(0), 0L)}")
    }
  }

  test("bpe merges: leftmost non-overlapping fuse, tie-break on pair string, merged tokens pair on") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a a a"), (2L, "b c b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, col("text"), merges = 4)
      .orderBy("merge_step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // round 1: (a,a)=2 from "a a a" (LEFTMOST pair only — the merged
    //   "a a" token must not re-pair with the trailing "a" this round)
    //   ties (b,c)=2; "a a" < "b c" → "a a" wins
    // round 2: doc1 is now ["a a", "a"]; (b,c)=2 wins
    // round 3: both docs offer one pair; "a a a" < "b c b c"
    // round 4: only doc2 has a pair left
    assert(got == Seq((1, "a a", 2L), (2, "b c", 2L),
      (3, "a a a", 1L), (4, "b c b c", 1L)))
  }

  test("bpe merges: loop stops early when no pairs remain") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x y"), (2L, "z"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, col("text"), merges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "x y", 1L)))
  }

  test("bpe encode: learned merges tokenize in one projection, ambiguous pairs replay exactly") {
    val s = spark
    import s.implicits._
    // "a a a" learns merge (a,a) then ("a a", a) — the second merge's
    // pair STRING is "a a a", ambiguous without the typed (l, r) split
    val docs = Seq((1L, "a a a"), (2L, "b c b c")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(docs, col("text"), merges = 4)
    assert(learned.map { case (_, l, r, _) => (l, r) } ==
      Seq(("a", "a"), ("b", "c"), ("a a", "a"), ("b c", "b c")))
    val enc = TextAnalysis.bpeEncode(docs, col("text"),
        learned.map { case (_, l, r, _) => (l, r) })
      .select(col("doc_id"), col("bpe_tokens"), col("n_bpe_tokens"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1).toSeq, r.getLong(2)))).toMap
    // doc 1: a a a -> [a a, a] -> [a a a]; doc 2: [b c, b c] -> [b c b c]
    assert(enc(1L) == ((Seq("a a a"), 1L)), s"got ${enc(1L)}")
    assert(enc(2L) == ((Seq("b c b c"), 1L)), s"got ${enc(2L)}")
    // encoding with a PREFIX of the merges stops mid-way
    val partial = TextAnalysis.bpeEncode(docs, col("text"), Seq(("a", "a")))
      .select(col("doc_id"), col("bpe_tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(partial(1L) == Seq("a a", "a"))
    assert(partial(2L) == Seq("b", "c", "b", "c"))
    // no merges = whitespace tokenization
    val none = TextAnalysis.bpeEncode(docs, col("text"), Nil)
      .select(col("doc_id"), col("n_bpe_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none == Map(1L -> 3L, 2L -> 4L))
  }

  test("bpe encode: kernel replays the sequential-global-replace reference exactly") {
    val s = spark
    import s.implicits._
    // reference: the semantics the composed sentinel-replace plan had —
    // per merge IN ORDER, one global greedy left-to-right token pass
    def reference(text: String, merges: Seq[(String, String)]): Seq[String] = {
      var toks: Vector[String] = text.trim.split("\\s+").toVector
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
            out += (l + " " + r); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    // edge-heavy corpus: overlap runs, chained merges consuming merged
    // tokens, absent ranks interleaved, multi-space and tab whitespace,
    // single tokens, and a rank that only becomes applicable through a
    // LATER-learned constituent (never — but the case documents it)
    val merges = Seq(("a", "a"), ("x", "y"), ("a a", "a"), ("q", "q"),
      ("a a a", "b"), ("x y", "x y"), ("c", "d"))
    val texts = Seq(
      "a a a a a", "a a a b", "x y x y x y", "a", "", "  a\t b  ",
      "q q q q", "c d c d x y", "a a a b x y c", "z z z",
      "a a a a b b", "x y q q a a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(docs, col("text"), merges)
      .select(col("doc_id"), col("bpe_tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == reference(t, merges),
        s"mismatch on '$t': got ${got(i.toLong)}, want ${reference(t, merges)}")
    }
  }

  test("bpe encode: plan depth is O(1) in merge-list size (1k merges, one kernel call)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    // cumulative chain: rank i merges the growing prefix with t_{i+1},
    // so the first 5 ranks fold the 6-token doc to ONE token and the
    // other 995 are absent-but-registered vocab (the 32k-vocab shape)
    val big = (0 until 1000).map(i =>
      ((0 to i).map(k => s"t$k").mkString(" "), s"t${i + 1}"))
    val small = big.take(2)
    def exprDepth(m: Seq[(String, String)]): Int = {
      def depth(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
        if (e.children.isEmpty) 1 else 1 + e.children.map(depth).max
      TextAnalysis.bpeEncode(docs, col("text"), m)
        .queryExecution.analyzed.expressions.map(depth).max
    }
    // the merge table rides as ONE literal pair of arrays, not one
    // nested replace per merge: tree depth must not move at all
    assert(exprDepth(big) == exprDepth(small),
      s"expression depth grew with merges: ${exprDepth(small)} -> ${exprDepth(big)}")
    // and the kernel applies the chain: the doc folds to one token
    val enc = TextAnalysis.bpeEncode(docs, col("text"), big)
      .select(col("n_bpe_tokens")).collect().head.getLong(0)
    assert(enc == 1L, s"1k-merge chain should fold the doc to one token, got $enc")
  }

  test("bpe merges: one action per round — no dedicated materializer job") {
    val s = spark
    import s.implicits._
    // Long repetitive docs so every round has a pair to merge. The
    // marginal Spark-job cost of one EXTRA round must not exceed the
    // cost of a whole one-round run (top-pair collect + setup): the old
    // shape added a per-round count() on top of the collect, making the
    // marginal cost strictly larger.
    val docs = Seq.tabulate(20)(i => (i.toLong, ("t" + i + " u v w x y z ") * 4))
      .toDF("doc_id", "text")
    // Count via a dedicated listener, NOT statusTracker.getJobIdsForGroup:
    // the status store retains a bounded number of jobs, so once a long
    // test session passes the retention limit, async eviction between the
    // before/after reads makes the delta arbitrary (observed -97 in full-
    // suite runs while the same test passed in isolation).
    def jobsDuring(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      s.sparkContext.addSparkListener(listener)
      // the listener bus is asynchronous; give it a moment to drain
      try { body; Thread.sleep(1500) }
      finally s.sparkContext.removeSparkListener(listener)
      n.get()
    }
    val j1 = jobsDuring {
      TextAnalysis.bpeMerges(docs, col("text"), merges = 1).collect()
    }
    val j3 = jobsDuring {
      TextAnalysis.bpeMerges(docs, col("text"), merges = 3).collect()
    }
    val marginalPerRound = (j3 - j1) / 2.0
    assert(marginalPerRound >= 1.0,
      s"each round must run its collect: marginal=$marginalPerRound")
    assert(marginalPerRound <= j1,
      s"a round must cost one action, not collect+materializer: " +
        s"marginal=$marginalPerRound vs one-round total=$j1")
  }

  test("unigram lm: segmentation kernel equals the brute-force argmax; frequent words fuse") {
    val s = spark
    import s.implicits._
    // 'alpha' dominates -> its long pieces win their substring mass;
    // rare 'beta' decomposes over shared chars
    val docs = Seq.tabulate(30)(i => (i.toLong, "alpha alpha beta")).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramTrain(docs, col("text"),
      maxPieceLen = 4, iterations = 2)
    val byPiece = vocab.map { case (p, c, _) => p -> c }.toMap
    // 'beta' fits in one max-len piece: a single piece always beats any
    // split (products of probabilities < each factor)
    assert(byPiece.get("beta").contains(30L), s"vocab: $vocab")
    // 'alpha' (5 chars > maxPieceLen) settles on exactly two pieces,
    // each used once per occurrence (60), concatenating back to it
    val alphaPieces = vocab.collect { case (p, 60L, _) => p }
    assert(alphaPieces.map(_.length).sum == 5, s"vocab: $vocab")
    assert(alphaPieces.forall("alpha".contains(_)))
    // probs are the smoothed final-count ratios, all in (0, 1)
    assert(vocab.forall { case (_, c, p) => c > 0 && p > 0.0 && p < 1.0 })

    // kernel Viterbi equals an exhaustive enumeration under the same
    // (product, count, lex-path) order for every corpus word
    val words = Seq("alpha", "beta")
    val cand = words.flatMap(w =>
      (0 until w.length).flatMap(i =>
        (1 to math.min(4, w.length - i)).map(l => w.substring(i, i + l))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val d = (cand.values.sum + cand.size).toDouble
    val probs = cand.toSeq.sortBy(_._1)
    val pieceArr = probs.map(_._1)
    val probArr = probs.map { case (_, c) => (c + 1.0) / d }
    val pMap = pieceArr.zip(probArr).toMap
    def brute(w: String): Seq[String] = {
      def rec(i: Int): Seq[Seq[String]] =
        if (i == w.length) Seq(Nil)
        else (1 to math.min(4, w.length - i)).flatMap { l =>
          val piece = w.substring(i, i + l)
          if (pMap.contains(piece)) rec(i + l).map(piece +: _) else Nil
        }
      rec(0).map { seg =>
        (seg.foldLeft(1.0)(_ * pMap(_)), seg.size, seg.mkString("\u0001"))
      }.minBy { case (sc, k, path) => (-sc, k, path) }._3.split("\u0001").toSeq
    }
    val got = words.toDF("w")
      .select(col("w"), call_function("graft_unigram_segment", col("w"),
        typedlit(pieceArr), typedlit(probArr)).as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach(w => assert(got(w) == brute(w), s"$w: ${got(w)} vs ${brute(w)}"))
    // uncoverable word -> null (char outside the table)
    val un = Seq("zq").toDF("w")
      .select(call_function("graft_unigram_segment", col("w"),
        typedlit(pieceArr), typedlit(probArr)))
      .collect().head
    assert(un.isNullAt(0))
  }

  test("unigram lm: vocabSize prunes to top-K plus the single-char coverage floor") {
    val s = spark
    import s.implicits._
    val docs = Seq.tabulate(20)(i => (i.toLong, "alpha alpha beta gamma")).toDF("doc_id", "text")
    val full = TextAnalysis.unigramTrain(docs, col("text"),
      maxPieceLen = 4, iterations = 2)
    val pruned = TextAnalysis.unigramTrain(docs, col("text"),
      maxPieceLen = 4, iterations = 2, vocabSize = Some(2))
    // the kept table is top-2 pieces + the single-char coverage floor,
    // so at most 2 multi-char pieces can appear in the output (the
    // USED set may exceed the full fit's — forced char decomposition)
    assert(pruned.count(_._1.length > 1) <= 2, s"pruned: $pruned")
    assert(full.count(_._1.length > 1) > 2, s"unpruned baseline: $full")
    // coverage floor: every corpus word still segments (usage covers
    // all corpus char positions — each word's pieces span it fully)
    val totalChars = 20L * "alphaalphabetagamma".length
    assert(pruned.map { case (p, c, _) => p.length * c }.sum == totalChars,
      s"pruned vocab must still cover the corpus: $pruned")
    // probabilities renormalize over the pruned table
    val probsSumBound = pruned.map(_._3).sum
    assert(probsSumBound > 0.0 && probsSumBound <= 1.0)
  }

  test("unigram lm: encode applies the pruned vocab; UNK words stay whole; empty/null -> 0") {
    val s = spark
    import s.implicits._
    val train = Seq.tabulate(10)(i => (i.toLong, "alpha alpha beta")).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramTrain(train, col("text"),
      maxPieceLen = 4, iterations = 2)
    val pv = vocab.map { case (p, _, pr) => (p, pr) }
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "zzz alpha"),          // 'z' not in the vocab -> UNK whole
      (3L, ""), (4L, null.asInstanceOf[String]),
      (5L, "a" * 20)              // > maxWordLen -> UNK whole even if coverable
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramEncode(docs, col("text"), pv)
      .select(col("doc_id"), col("unigram_tokens"), col("n_unigram_tokens"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getLong(2)))).toMap
    // every word's pieces concatenate back to the word (lossless)
    assert(got(1L)._1.mkString == "alphabeta")
    assert(got(1L)._2 >= 2L) // alpha (5 chars > maxPieceLen) is >= 2 pieces
    assert(got(2L)._1.contains("zzz"), s"got ${got(2L)._1}")
    assert(got(3L) == ((Seq.empty[String], 0L)))
    assert(got(4L) == ((Seq.empty[String], 0L)))
    assert(got(5L)._1 == Seq("a" * 20))
  }

  test("property: unigram segmentation equals brute force on random words and vocabularies") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val wordGen = Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val words = (0 until 60).flatMap(i =>
      wordGen.apply(Gen.Parameters.default, Seed(900L + i))).distinct
    // vocab: all substrings <= 3 chars of the words, deterministic
    // pseudo-probs from a hash (distinct values -> near-zero tie mass,
    // plus the tie-break path is still exercised by repeated pieces)
    val cand = words.flatMap(w =>
      (0 until w.length).flatMap(i =>
        (1 to math.min(3, w.length - i)).map(l => w.substring(i, i + l))))
      .distinct.sorted
    val probs = cand.map(p =>
      (math.abs(scala.util.hashing.MurmurHash3.stringHash(p)) % 1000 + 1) / 2000.0)
    val pMap = cand.zip(probs).toMap
    def brute(w: String): Seq[String] = {
      def rec(i: Int): Seq[Seq[String]] =
        if (i == w.length) Seq(Nil)
        else (1 to math.min(3, w.length - i)).flatMap { l =>
          val piece = w.substring(i, i + l)
          if (pMap.contains(piece)) rec(i + l).map(piece +: _) else Nil
        }
      rec(0).map { seg =>
        (seg.foldLeft(1.0)(_ * pMap(_)), seg.size, seg.mkString("\u0001"))
      }.minBy { case (sc, k, path) => (-sc, k, path) }._3.split("\u0001").toSeq
    }
    val got = words.toDF("w")
      .select(col("w"), call_function("graft_unigram_segment", col("w"),
        typedlit(cand), typedlit(probs)).as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == brute(w), s"$w: ${got(w)} vs ${brute(w)}")
      assert(got(w).mkString == w, s"segmentation must cover $w")
    }
  }

  test("unigram lm: one action per EM round — no dedicated materializer job") {
    val s = spark
    import s.implicits._
    val docs = Seq.tabulate(20)(i => (i.toLong, "gamma delta gamma")).toDF("doc_id", "text")
    def jobsDuring(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      s.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(1500) }
      finally s.sparkContext.removeSparkListener(listener)
      n.get()
    }
    val j1 = jobsDuring {
      TextAnalysis.unigramTrain(docs, col("text"), iterations = 1)
    }
    val j3 = jobsDuring {
      TextAnalysis.unigramTrain(docs, col("text"), iterations = 3)
    }
    val marginalPerRound = (j3 - j1) / 2.0
    assert(marginalPerRound >= 1.0,
      s"each round must run its usage collect: marginal=$marginalPerRound")
    assert(marginalPerRound <= j1,
      s"a round must cost ONE action (usage collect), not collect+" +
        s"materializer: marginal=$marginalPerRound vs one-round total=$j1")
  }

  test("unigram lm: a too-large candidate vocabulary fails fast WITHOUT materializing it") {
    val s = spark
    import s.implicits._
    // 30k distinct hex words -> tens of thousands of distinct candidate
    // substrings, far past maxVocab=100. The guard must trip via the
    // pre-bounded TakeOrdered collect (limit maxVocab+1), so the driver
    // sees at most ~(partitions x 101) candidate rows, never the full
    // aggregate. We measure that with the serialized task-result bytes:
    // a full collect of the candidate table would ship megabytes.
    val docs = s.range(30000)
      .select(col("id").as("doc_id"), md5(col("id").cast("string")).substr(1, 8).as("text"))
    val resultBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) resultBytes.addAndGet(te.taskMetrics.resultSize)
        ()
      }
    }
    s.sparkContext.addSparkListener(listener)
    val ex = try {
      val e = intercept[IllegalArgumentException] {
        TextAnalysis.unigramTrain(docs, col("text"),
          maxPieceLen = 4, iterations = 1, maxVocab = 100)
      }
      Thread.sleep(1500) // drain listener events
      e
    } finally s.sparkContext.removeSparkListener(listener)
    assert(ex.getMessage.contains("exceeds maxVocab"),
      s"wrong failure: ${ex.getMessage}")
    assert(resultBytes.get() < (1L << 20),
      s"guard must fire from the BOUNDED collect, not after materializing " +
        s"the candidate table: ${resultBytes.get()} result bytes shipped")
  }

  test("containment: fragment-in-document found at 1.0 where Jaccard misses it") {
    val s = spark
    import s.implicits._
    val body = (1 to 40).map(i => s"w$i").mkString(" ")
    val frag = (1 to 12).map(i => s"w$i").mkString(" ") // 12-token prefix
    val docs = Seq(
      1L -> body,                         // containing document
      2L -> frag,                         // fragment: S(2) subset of S(1)
      3L -> (1 to 40).map(i => s"z$i").mkString(" "), // unrelated
      4L -> "too short")                  // < k tokens -> no shingles
      .toDF("doc_id", "text")
    val got = Dedup.containmentNearDupPairs(docs, "doc_id", "text",
        minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0)), s"got $got")
    // the same pair is invisible to symmetric Jaccard at any near-dup
    // threshold: |A intersect B| / |A union B| = 10/38
    val jac = Dedup.winnowNearDupPairs(docs, "doc_id", "text",
      minJaccard = 0.8).collect()
    assert(jac.isEmpty, s"Jaccard unexpectedly found ${jac.toSeq}")
  }

  test("containment: symmetric for equal docs, direction-max for subsets, short side never divides by zero") {
    val s = spark
    import s.implicits._
    val t = (1 to 20).map(i => s"q$i").mkString(" ")
    val docs = Seq(5L -> t, 6L -> t, 7L -> "a b").toDF("doc_id", "text")
    val got = Dedup.containmentNearDupPairs(docs, "doc_id", "text",
        minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((5L, 6L, 1.0)), s"got $got")
  }
}
