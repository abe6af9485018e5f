package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Hot-bucket guard for the LSH all-pairs joins: a mass-duplicated
  * ("boilerplate-heavy") corpus concentrates rows in one sign-LSH
  * bucket — exactly the dedup workload. The guard must (a) keep the
  * pair/survivor OUTPUT bit-identical, (b) bound per-task work via the
  * blocked self-join decomposition, and (c) make the dedup edge set
  * LINEAR in the duplicate count via the exact-duplicate collapse. */
class HotBucketSpec extends SparkSpec {

  private def toDF(rows: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // one hot direction (exact copies all land in one bucket
  // deterministically) plus a few orthogonal singletons
  private val hotVec = Array(1.0f, 2.0f, 3.0f, 4.0f, 0.0f, 0.0f, 0.0f, 0.0f)
  private def axis(i: Int) = {
    val a = Array.fill(8)(0.0f); a(i) = 1.0f; a
  }

  test("blocked self-join emits the exact naive pair set on a hot bucket") {
    val rows = (0 until 300).map(i => (i.toLong, hotVec)) ++
      Seq(1000L -> axis(4), 1001L -> axis(5), 1002L -> axis(6))
    val df = toDF(rows)
    def run(cap: Int): Set[(Long, Long, Double)] =
      Dedup.embeddingNearDups(df, "vec_id", "embedding",
          threshold = 0.95, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val naive = run(Int.MaxValue)       // G = 1 everywhere: original join
    assert(naive.size == 300 * 299 / 2, s"naive pair count ${naive.size}")
    // cap 25 forces G = ceil(300/25) = 12 groups, 78 block tasks
    assert(run(25) == naive)
    // cap 2 (the minimum) stresses the decomposition hardest
    assert(run(2) == naive)
  }

  test("block groups are hash-balanced: no (bucket, group) cell exceeds ~cap") {
    // 10k duplicated-boilerplate rows: the scenario that used to land
    // one quadratic bucket on a single shuffle task
    val df = toDF((0 until 10000).map(i => (i.toLong, hotVec)))
    val cap = 256
    val b = Similarity.lshBuckets(
      df.select(col("vec_id").as("__id"), col("embedding").as("__v")),
      "__v", 12)
    val occ = b.groupBy("bucket").agg(count(lit(1)).as("__occ"))
    val cells = b.join(broadcast(occ), Seq("bucket"))
      .withColumn("__ngroups",
        greatest(lit(1L), ceil(col("__occ") / cap)).cast("int"))
      .withColumn("__g",
        pmod(xxhash64(col("__id")), col("__ngroups")).cast("int"))
      .groupBy("bucket", "__g").agg(count(lit(1)).as("n"))
      .agg(max(col("n")), count(lit(1))).collect().head
    val (maxCell, nCells) = (cells.getLong(0), cells.getLong(1))
    // 10000 rows over G = 40 groups: expect ~250/cell; xxhash64 balance
    // keeps the worst cell well under 1.5x the target
    assert(nCells == 40L, s"expected 40 cells, got $nCells")
    assert(maxCell <= (cap * 3) / 2, s"worst cell $maxCell exceeds 1.5x cap")
  }

  test("exact-duplicate collapse: 10k boilerplate copies yield a LINEAR edge set and unchanged survivors") {
    val singles = (0 until 50).map(i => ((20000 + i).toLong, {
      // distinct far-apart directions: alternating-sign patterns keyed
      // by i, mutually below the 0.95 threshold
      val a = Array.fill(8)(0.0f)
      a(i % 8) = 1.0f; a((i + 3) % 8) = if (i % 2 == 0) 0.5f else -0.5f
      a
    }))
    val df = toDF((0 until 10000).map(i => (i.toLong, hotVec)) ++ singles)
    // candidate-pair bound: N copies of one vector contribute N-1
    // member edges (not N(N-1)/2 pairs); the rep problem is 51 vectors
    val edges = Dedup.semanticEdges(df, "vec_id", "embedding",
      threshold = 0.95, planes = 12, maxBucketSize = 4096)
    val edgeCount = edges.count()
    val repPairCount = edgeCount - 9999L
    assert(repPairCount >= 0 && repPairCount <= 51L * 50 / 2,
      s"edge count $edgeCount not linear + bounded-rep")
    // survivors: min id of the duplicate component, every singleton
    // whose direction stands alone
    val kept = Dedup.semanticSurvivors(df, "vec_id", "embedding", 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.exists(id => id > 0 && id < 10000),
      "duplicate component must collapse to vec_id 0")
    // no row may vanish unless its connected component (brute-force
    // cosine graph over the 51 distinct-ish ids — the singles repeat
    // with period 8, so some are exact duplicates of each other and
    // must collapse too) holds a smaller id
    val reps = (Seq(0L -> hotVec) ++ singles).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      dot / (math.sqrt(x.map(v => v.toDouble * v).sum) *
        math.sqrt(y.map(v => v.toDouble * v).sum))
    }
    val ids = reps.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- ids; b <- ids if a < b && cos(reps(a), reps(b)) >= 0.95) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectKept = ids.filter(i => find(i) == i).toSet
    assert(kept == expectKept,
      s"survivors diverge: extra=${kept.diff(expectKept)} missing=${expectKept.diff(kept)}")
  }

  test("minhash blocked self-join emits the exact naive pair set on a boilerplate corpus") {
    val s = spark
    import s.implicits._
    // 200 identical documents (identical signatures -> one hot
    // (band, band_hash) bucket in EVERY band) + distinct singletons
    val rows = (0 until 200).map(i => (i.toLong, "the same boilerplate page body repeated verbatim")) ++
      Seq(900L -> "completely different text one", 901L -> "another unrelated document body")
    val df = rows.toDF("doc_id", "text")
    def run(cap: Int): Set[(Long, Long, Double)] =
      Dedup.minhashLshPairs(df, "doc_id", "text", maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val naive = run(Int.MaxValue)
    assert(naive.size == 200 * 199 / 2, s"naive pair count ${naive.size}")
    assert(naive.forall(_._3 == 1.0), "identical docs must agree on every hash")
    assert(run(16) == naive)
  }

  test("duplicated benchmark mass collapses: decontamination output and hit counts unchanged") {
    val s = spark
    import s.implicits._
    val corpus = toDF(Seq(1L -> hotVec, 2L -> axis(4), 3L -> axis(5)))
    val bench1 = Seq(Tuple1(hotVec)).toDF("embedding")
    val benchDup = (0 until 2000).map(_ => Tuple1(hotVec)).toDF("embedding")
    def survivors(bench: org.apache.spark.sql.DataFrame): Seq[Long] =
      Dedup.decontaminateSemantic(corpus, "vec_id", "embedding",
          bench, "embedding", threshold = 0.95)
        .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(survivors(bench1) == Seq(2L, 3L))
    assert(survivors(benchDup) == Seq(2L, 3L))
    // the graded report counts DISTINCT benchmark vectors: 2000 copies
    // of one leak are one hit, not 2000
    val rep = Dedup.semanticContaminationReport(corpus, "vec_id", "embedding",
        benchDup, "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rep == Set((1L, 1L)), s"got $rep")
  }

  test("incremental bipartite guard: duplicated batch x duplicated index emits the exact pair set") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-hotincr-").toString
    // index holds 40 copies of the hot vector (ids 0..39); the batch
    // brings 30 more copies (ids 1000..1029) plus a clean orthogonal row
    def run(cap: Int): Set[(Long, Long)] = {
      val index = new graft.pipeline.BucketedStateTable(
        s, s"$root/idx-$cap",
        keyCols = Seq("bucket", "vec_id"), numBuckets = 8,
        bucketCols = Seq("bucket"))
      Dedup.indexEmbeddings(index,
        (0 until 40).map(i => (i.toLong, hotVec)).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      val batch = ((1000 until 1030).map(i => (i.toLong, hotVec)) :+
        (2000L, axis(5))).toDF("vec_id", "embedding")
      Dedup.incrementalEmbeddingNearDups(index, batch, "vec_id", "embedding",
          threshold = 0.95, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // expected: every (index copy, batch copy) cross pair + every
    // intra-batch pair among the 30 copies; the clean row pairs nothing
    val expected =
      (for (o <- 0 until 40; n <- 1000 until 1030) yield (o.toLong, n.toLong)).toSet ++
      (for (a <- 1000 until 1030; b <- (a + 1) until 1030) yield (a.toLong, b.toLong)).toSet
    assert(run(Int.MaxValue) == expected)
    assert(run(8) == expected)
  }

  test("fitsBroadcast boundary: maxBroadcastRows above Int.MaxValue must not wrap") {
    val s = spark
    import s.implicits._
    val corpus = toDF(Seq(1L -> hotVec, 2L -> axis(4)))
    val bench = Seq(Tuple1(hotVec)).toDF("embedding")
    for (budget <- Seq(Int.MaxValue.toLong + 5L, Long.MaxValue)) {
      val kept = Dedup.decontaminateSemantic(corpus, "vec_id", "embedding",
          bench, "embedding", threshold = 0.95, maxBroadcastRows = budget)
        .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(kept == Seq(2L), s"budget $budget: got $kept")
    }
  }
}
