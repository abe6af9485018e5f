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
    * are COLLECTED (tiny) and inlined as literals, so corpus assignment
    * is a narrow per-row argmax — no window, no corpus shuffle, no
    * pairwise blowup — and the only exchange is the per-query top-k over
    * the candidate set (`~nProbe/nCentroids` of the corpus).
    *
    * Zero vectors have undefined cosine (null) and drop out of both the
    * index and the probes.
    */
  /** One-or-more Lloyd iterations over the corpus to refine IVF
    * centroids: narrow argmax assignment (centroids inlined as
    * literals), then per-(cluster, dimension) means via posexplode —
    * map-side combined, so the shuffle carries only
    * `nCentroids × dims` partials. Each iteration collects the tiny
    * centroid matrix back to the driver; empty clusters keep their
    * previous centroid. */
  def refineCentroids(
      corpus: DataFrame,
      vecCol: String,
      initial: Seq[Seq[Double]],
      iterations: Int = 2): Seq[Seq[Double]] = {
    // widen once; reused every iteration. Members are L2-NORMALIZED
    // before averaging — assignment is by cosine, so the spherical
    // k-means update is the mean of directions; a raw mean would let
    // large-norm vectors drag the centroid (the resulting centroid need
    // not be re-normalized: cosine argmax is scale-invariant).
    val wide = Balance.widen(corpus)
      .filter(col(vecCol).isNotNull)
      .select(col(vecCol).as("__v"))
      .withColumn("__norm", expr(
        "sqrt(aggregate(transform(__v, x -> cast(x as double) * x), " +
          "cast(0.0 as double), (a, b) -> a + b))"))
      .filter(col("__norm") > 0.0)
    var cents = initial
    for (_ <- 0 until iterations) {
      val current = cents
      val scores = array(current.map(c =>
        cosine(col("__v"), typedlit(c))): _*)
      val means = wide
        .withColumn("__cent",
          (call_function("array_position", scores, array_max(scores)) - 1)
            .cast("int"))
        .filter(col("__cent").isNotNull)
        .select(col("__cent"), col("__norm"),
          posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy("__cent", "__d")
        .agg(avg(col("__x") / col("__norm")).as("__m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cent, rows) =>
          cent -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = current.indices.map(i => means.getOrElse(i, current(i)))
    }
    cents
  }

  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String, qVec: String,
      cId: String, cVec: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      refineIterations: Int = 0): DataFrame = {
    // null and zero vectors are excluded from the centroid sample — a
    // null would NPE the driver-side collect and a zero-norm centroid
    // scores null against everything
    val sampled: Seq[Seq[Double]] = corpus
      .filter(col(cVec).isNotNull).orderBy(col(cId)).limit(nCentroids)
      .select(col(cVec)).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: java.lang.Number => n.doubleValue
      }.toSeq).toSeq
      .filter(_.exists(_ != 0.0))
    require(sampled.nonEmpty, "ivfTopK needs a non-empty corpus with nonzero vectors")
    val cents =
      if (refineIterations > 0)
        refineCentroids(corpus, cVec, sampled, refineIterations)
      else sampled

    def scores(vec: Column): Column =
      array(cents.map(c => cosine(vec, typedlit(c))): _*)

    // argmax over the literal centroid array — first index wins ties
    val lists = Balance.widen(corpus)
      .withColumn("__scores", scores(col(cVec)))
      .withColumn("__cent",
        (call_function("array_position", col("__scores"),
          array_max(col("__scores"))) - 1).cast("long"))
      .filter(col("__cent").isNotNull)
      .drop("__scores")

    // top-nProbe centroid indices per query: sort (−score, index)
    // structs. Null scores (zero-vector queries) map to +∞ so they sort
    // LAST — struct-field nulls would otherwise sort FIRST and a dead
    // centroid would occupy every query's first probe slot.
    val idx = sequence(lit(0), lit(cents.length - 1))
    val probes = queries
      .withColumn("__scores", scores(col(qVec)))
      .withColumn("__cent", explode(transform(
        slice(array_sort(zip_with(col("__scores"), idx,
          (s, i) => struct(coalesce(-s, lit(Double.MaxValue)).as("negs"),
            i.as("i")))), 1, nProbe),
        x => x.getField("i").cast("long"))))
      .select(col("__cent"), col(qId), col(qVec))

    val w = Window.partitionBy(col(qId))
      .orderBy(col("cos_sim").desc, col(cId))
    lists.join(broadcast(probes), Seq("__cent"))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cos_sim"))
      .filter(col("cos_sim").isNotNull) // zero-vector queries emit nothing
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
