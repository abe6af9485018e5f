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
