package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

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

  test("similarity: zero vectors yield null cosine, never rank in top-k") {
    val s = spark
    import s.implicits._
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val c = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f))).toDF("c_id", "c_vec")
    val top = Similarity.bruteForceTopK(q, c, "q_id", "q_vec", "c_id", "c_vec", 3)
      .orderBy(col("rank")).collect()
    // the zero vector's cosine is null (NOT NaN, which Spark sorts first)
    // so it ranks LAST
    assert(top.map(_.getAs[Long]("c_id")).toSeq == Seq(1L, 3L, 2L))
    assert(top.last.isNullAt(top.last.fieldIndex("cos_sim")))
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
}
