package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Designed for 100 TB: every
  * stage is either a narrow map (shingling, hashing) or a single
  * hash-shuffle on a dedup/bucket key; candidate generation never goes
  * quadratic — pairs only form inside LSH buckets.
  */
object Dedup {

  /** Exact dedup via content hash: one row per distinct fingerprint, the
    * smallest id wins. Single shuffle on the (high-cardinality, uniform)
    * hash — the cheapest possible plan at scale. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("text_md5", TextAnalysis.fingerprint(col(textCol)))
      .groupBy("text_md5")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature of a text column — a single native-expression pass
    * ([[graft.expressions.ShingleMinHashSig]]): tokenize → shingle →
    * per-permutation minima, with no per-element interpreted lambdas. */
  def minhashSignature(text: Column, shingleLen: Int, numHashes: Int): Column =
    call_function("graft_minhash_sig", text, lit(shingleLen), lit(numHashes))

  /** MinHash + banded LSH near-duplicate candidate pairs.
    *
    * `bands` bands of `rowsPerBand` hashes each; a pair is a candidate if
    * any band agrees. The plan is: narrow signature map → explode to
    * `bands` rows per doc → hash-shuffle on (band, bandHash) → within-
    * bucket self-join → distinct pairs. Bucket sizes stay tiny for
    * non-duplicate corpora, so the self-join never blows up; at 100 TB the
    * shuffle key (band hash) is uniform by construction.
    *
    * Returns (a_id, b_id, est_jaccard) with a_id < b_id, where
    * est_jaccard is the signature-agreement fraction.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Null text must not reach the banding: a null signature slices to
    // null band inputs, and xxhash64(null) is a CONSTANT — every
    // null-text row would share every bucket (quadratic self-join, all
    // but one null row "deduped"). Null-text rows simply have no pairs.
    val sig = Balance.widen(df.filter(col(textCol).isNotNull))
      .select(col(idCol).as("__id"),
        minhashSignature(col(textCol), shingleLen, numHashes).as("__sig"))

    val banded = sig.select(
      col("__id"), col("__sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(array_join(
            transform(slice(col("__sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)),
              _.cast("string")), ","))
            .as("band_hash")))).as("__b"))
      .select(col("__id"), col("__sig"),
        col("__b.band").as("band"), col("__b.band_hash").as("band_hash"))

    val l = banded.select(col("band"), col("band_hash"),
      col("__id").as("a_id"), col("__sig").as("a_sig"))
    val r = banded.select(col("band"), col("band_hash"),
      col("__id").as("b_id"), col("__sig").as("b_sig"))

    l.join(r, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(call_function("graft_sig_agree", col("a_sig"), col("b_sig")), 6)
          .as("est_jaccard"))
      .distinct()
  }

  /** 64-bit SimHash over word tokens: per-token xxhash64, bit-majority
    * vote. Hamming-close simhashes ⇒ near-duplicate texts. Implemented as
    * pure array expressions (one pass, no shuffle). */
  def simhash64(text: Column): Column =
    call_function("graft_simhash", text)

  /** Connected components over near-duplicate pairs → one cluster id
    * (the minimum member id) per document. This is the step that turns a
    * candidate-pair list into keep/drop decisions: keep `id == cluster`,
    * drop the rest.
    *
    * Iterative min-label propagation: each round every node adopts the
    * smallest label in its neighborhood; rounds = graph diameter (near-
    * dup clusters are tiny, so convergence is fast). Each iteration is
    * one shuffle; results are persisted per round and the loop stops on
    * a converged count — the standard Spark pattern for iterative graph
    * algorithms without lineage blowup.
    *
    * Returns (id, cluster).
    */
  def clusterPairs(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")).persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster", "n_cluster"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("n_cluster")).as("n_min"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_min"), col("cluster")))
            .as("cluster"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      labels.unpersist(); edges.unpersist()
      throw new IllegalStateException(
        s"clusterPairs did not converge in $maxIter rounds (component " +
          "diameter exceeds maxIter) — raise maxIter; silent partial labels " +
          "would keep redundant near-duplicates")
    }
    // Hand back a lineage-cut copy and release the iteration caches —
    // a persisted result would pin executor storage until the caller
    // remembered to unpersist it. (localCheckpoint blocks are GC-cleaned
    // once the returned frame is dropped.)
    val out = labels.localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    out
  }

  /** One-call near-duplicate corpus dedup: MinHash-LSH candidate pairs,
    * VERIFIED against the signature-agreement estimate (`minJaccard` —
    * raw LSH candidates include ~Jaccard-0.5 false positives at the
    * default banding), → connected components → drop every document that
    * is not its cluster's canonical (minimum-id) member. Documents in no
    * cluster (including null-text rows) pass through. The anti-join
    * ships only (id, cluster) pairs — tiny next to the corpus. */
  def dedupCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double = 0.7,
      shingleLen: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 20): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, shingleLen, bands, rowsPerBand)
      .filter(col("est_jaccard") >= minJaccard)
    val losers = clusterPairs(pairs, maxIter = maxIter)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact Jaccard similarity between the distinct-word sets of two text
    * columns (the verification step behind MinHash candidates). */
  def wordSetJaccard(a: Column, b: Column): Column = {
    val sa = array_distinct(split(trim(a), "\\s+"))
    val sb = array_distinct(split(trim(b), "\\s+"))
    round(size(array_intersect(sa, sb)) * lit(1.0) /
      size(array_union(sa, sb)), 6)
  }

  /** Embedding near-duplicates: cosine ≥ threshold among LSH-bucketed
    * candidates (delegates bucketing to [[Similarity.lshBuckets]]). */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 12): DataFrame = {
    val b = Similarity.lshBuckets(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")), "__v", planes)
    val l = b.select(col("bucket"), col("__id").as("a_id"), col("__v").as("a_v"))
    val r = b.select(col("bucket"), col("__id").as("b_id"), col("__v").as("b_v"))
    l.join(r, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        Similarity.cosine(col("a_v"), col("b_v")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }
}
