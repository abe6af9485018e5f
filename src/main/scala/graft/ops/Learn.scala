package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training primitives for the quality-classifier loop a
  * corpus pipeline runs (CCNet / fasttext-distillation shape: featurize
  * documents, fit a small linear model, score and gate the corpus).
  *
  * The pattern is data-parallel gradients + a driver optimizer step:
  * each iteration is ONE map-side-combined aggregate over the feature
  * frame (the shuffle carries `|features| + 2` partial sums per
  * partition, nothing else), the weight update is driver arithmetic on
  * a handful of doubles. At 100 TB that is the textbook batch-GD shape
  * — N narrow scans, zero data movement beyond the partial aggregates —
  * and any higher-capacity model would leave the engine for a training
  * framework anyway; THIS is the part that belongs in the engine.
  */
object Learn {

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** One batch gradient of mean log-loss for logistic regression at
    * (`weights`, `bias`): returns (∂/∂w_j, ∂/∂bias, n) where
    * ∂/∂w_j = avg((σ(w·x + b) − y)·x_j). Weights are inlined as plan
    * literals; the pass is one map-side-combined aggregate. Rows with a
    * null feature or label are excluded from EVERY component (the
    * gradient stays consistent). */
  def logisticGradient(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      weights: Seq[Double],
      bias: Double): (Seq[Double], Double, Long) = {
    require(weights.length == featureCols.length,
      s"${weights.length} weights for ${featureCols.length} features")
    val complete = df.filter(
      featureCols.map(col(_).isNotNull).reduce(_ && _) && col(labelCol).isNotNull)
    val z = featureCols.zip(weights)
      .map { case (c, w) => col(c) * w }
      .foldLeft(lit(bias): Column)(_ + _)
    val resid = sigmoid(z) - col(labelCol).cast("double")
    val aggs = featureCols.map(c => avg(resid * col(c))) :+
      avg(resid) :+ count(lit(1)).cast("long")
    val row = complete.agg(aggs.head, aggs.tail: _*).first()
    val n = row.getLong(featureCols.length + 1)
    if (n == 0L) (featureCols.map(_ => 0.0), 0.0, 0L)
    else (featureCols.indices.map(row.getDouble), row.getDouble(featureCols.length), n)
  }

  /** Fit by batch gradient descent: `iterations` passes over the data,
    * one aggregate each; returns (weights, bias). Deterministic — same
    * data, same init, same trajectory on any cluster/partitioning up to
    * the FP-summation order inside each avg (bounded by double epsilon
    * per pass). */
  def fitLogistic(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      learningRate: Double = 1.0,
      iterations: Int = 20,
      initWeights: Option[Seq[Double]] = None,
      initBias: Double = 0.0): (Seq[Double], Double) = {
    var w = initWeights.getOrElse(featureCols.map(_ => 0.0))
    var b = initBias
    for (_ <- 0 until iterations) {
      val (gw, gb, n) = logisticGradient(df, featureCols, labelCol, w, b)
      if (n > 0) {
        w = w.zip(gw).map { case (wi, gi) => wi - learningRate * gi }
        b = b - learningRate * gb
      }
    }
    (w, b)
  }

  /** Per-class linear scores and stabilized softmax residual columns —
    * shared plan pieces of the K-class operators. `z_k` folds
    * bias-first then feature terms in `featureCols` order (the same
    * association the binary path uses, so a SQL oracle can mirror the
    * arithmetic exactly); probabilities are max-shifted before `exp`
    * (softmax is shift-invariant, and the shift keeps `exp` in range
    * for any score magnitude). */
  /** Validated per-class linear scores `z_k` — the shared front half of
    * training ([[softmaxParts]]) and prediction ([[predictSoftmax]]), so
    * the shape checks and the bias-first fold order cannot drift between
    * fit and serve (an unvalidated predict with a short weight row would
    * silently TRUNCATE via zip and score a partial model). */
  private def linearScores(
      featureCols: Seq[String],
      classes: Seq[String],
      weights: Seq[Seq[Double]],
      biases: Seq[Double]): Seq[Column] = {
    require(classes.size >= 2 && classes.distinct == classes,
      s"need >= 2 distinct classes: $classes")
    require(weights.size == classes.size && biases.size == classes.size,
      s"${weights.size} weight rows / ${biases.size} biases for ${classes.size} classes")
    require(weights.forall(_.size == featureCols.size),
      s"every weight row needs ${featureCols.size} entries")
    classes.indices.map { k =>
      featureCols.zip(weights(k))
        .map { case (c, w) => col(c) * w }
        .foldLeft(lit(biases(k)): Column)(_ + _)
    }
  }

  private def softmaxParts(
      featureCols: Seq[String],
      classes: Seq[String],
      weights: Seq[Seq[Double]],
      biases: Seq[Double]): Seq[Column] = {
    val zs = linearScores(featureCols, classes, weights, biases)
    val m = greatest(zs: _*)
    val es = zs.map(z => exp(z - m))
    val denom = es.reduceLeft(_ + _)
    es.map(_ / denom)
  }

  /** One batch gradient of mean cross-entropy for K-class softmax
    * regression at (`weights` (K×F), `biases` (K)): returns
    * (∂W (K×F), ∂b (K), n) where ∂w_kj = avg((p_k − 1[y=k])·x_j) —
    * the multiclass twin of [[logisticGradient]], still ONE
    * map-side-combined aggregate (K·(F+1)+1 partial sums cross the
    * exchange, nothing else). Rows with a null feature or label are
    * excluded from every component. Labels outside `classes` train as
    * all-zero one-hot (pure negatives for every class). */
  def softmaxGradient(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      classes: Seq[String],
      weights: Seq[Seq[Double]],
      biases: Seq[Double]): (Seq[Seq[Double]], Seq[Double], Long) = {
    val ps = softmaxParts(featureCols, classes, weights, biases)
    val resids = classes.zip(ps).map { case (cls, p) =>
      p - (col(labelCol) === cls).cast("double")
    }
    val complete = df.filter(
      (featureCols.map(col(_).isNotNull) :+ col(labelCol).isNotNull).reduce(_ && _))
    val aggs = resids.flatMap(r => featureCols.map(c => avg(r * col(c))) :+ avg(r)) :+
      count(lit(1)).cast("long")
    val row = complete.agg(aggs.head, aggs.tail: _*).first()
    val stride = featureCols.size + 1
    val n = row.getLong(classes.size * stride)
    if (n == 0L)
      (classes.map(_ => featureCols.map(_ => 0.0)), classes.map(_ => 0.0), 0L)
    else {
      val gw = classes.indices.map(k =>
        featureCols.indices.map(j => row.getDouble(k * stride + j)))
      val gb = classes.indices.map(k => row.getDouble(k * stride + featureCols.size))
      (gw, gb, n)
    }
  }

  /** Fit K-class softmax regression by batch gradient descent — one
    * aggregate per iteration, driver weight update; returns
    * (weights (K×F), biases (K)). Deterministic like [[fitLogistic]]. */
  def fitSoftmax(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      classes: Seq[String],
      learningRate: Double = 1.0,
      iterations: Int = 20): (Seq[Seq[Double]], Seq[Double]) = {
    var w: Seq[Seq[Double]] = classes.map(_ => featureCols.map(_ => 0.0))
    var b: Seq[Double] = classes.map(_ => 0.0)
    for (_ <- 0 until iterations) {
      val (gw, gb, n) = softmaxGradient(df, featureCols, labelCol, classes, w, b)
      if (n > 0) {
        w = w.zip(gw).map { case (wr, gr) =>
          wr.zip(gr).map { case (wi, gi) => wi - learningRate * gi } }
        b = b.zip(gb).map { case (bi, gi) => bi - learningRate * gi }
      }
    }
    (w, b)
  }

  /** Mean cross-entropy of the softmax model (clamped like [[logLoss]];
    * NaN when no complete row exists). */
  def crossEntropyLoss(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      classes: Seq[String],
      weights: Seq[Seq[Double]],
      biases: Seq[Double]): Double = {
    val ps = softmaxParts(featureCols, classes, weights, biases)
    val pOfLabel = classes.zip(ps).tail
      .foldLeft(when(col(labelCol) === classes.head, ps.head)) {
        case (acc, (cls, p)) => acc.when(col(labelCol) === cls, p)
      }
    val p = least(greatest(coalesce(pOfLabel, lit(1e-12)), lit(1e-12)),
      lit(1.0 - 1e-12))
    val complete = df.filter(
      (featureCols.map(col(_).isNotNull) :+ col(labelCol).isNotNull).reduce(_ && _) &&
        col(labelCol).isin(classes: _*))
    val row = complete.agg(avg(-log(p))).first()
    if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
  }

  /** Argmax prediction column for a fitted softmax model: adds
    * `predicted_<labelAlias>` — ties resolve to the earlier class
    * (fixed, engine-portable order). The scores are the linear `z_k`
    * (argmax of z equals argmax of softmax(z)); zero shuffle. */
  def predictSoftmax(
      df: DataFrame,
      featureCols: Seq[String],
      classes: Seq[String],
      weights: Seq[Seq[Double]],
      biases: Seq[Double],
      outputCol: String = "predicted_class"): DataFrame = {
    val zs = linearScores(featureCols, classes, weights, biases)
    val best = greatest(zs: _*)
    val pred = classes.zip(zs).foldRight(lit(classes.last): Column) {
      case ((cls, z), rest) => when(z === best, cls).otherwise(rest)
    }
    // a row with ANY null feature has every z null and every when()
    // false — the foldRight base would confidently label it the LAST
    // class; predict null instead, like the training path excludes
    // incomplete rows
    val complete = featureCols.map(col(_).isNotNull).reduce(_ && _)
    df.withColumn(outputCol, when(complete, pred))
  }

  /** Mean log-loss of the model on the frame — the convergence metric
    * ([[fitLogistic]]'s spec asserts it decreases). Clamped away from
    * exact 0/1 so a confidently-wrong row scores a large finite loss,
    * not infinity. `Double.NaN` when no complete row exists (the mean
    * of nothing is undefined — not a driver NPE). */
  def logLoss(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      weights: Seq[Double],
      bias: Double): Double = {
    val z = featureCols.zip(weights)
      .map { case (c, w) => col(c) * w }
      .foldLeft(lit(bias): Column)(_ + _)
    val p0 = sigmoid(z)
    val p = least(greatest(p0, lit(1e-12)), lit(1.0 - 1e-12))
    val y = col(labelCol).cast("double")
    val complete = df.filter(
      featureCols.map(col(_).isNotNull).reduce(_ && _) && col(labelCol).isNotNull)
    val row = complete
      .agg(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))))
      .first()
    if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
  }
}
