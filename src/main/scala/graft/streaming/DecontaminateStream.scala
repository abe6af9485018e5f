package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Streaming semantic decontamination — filter a live embedding feed
  * against a STATIC benchmark (eval set) at ingestion time, the
  * streaming face of [[graft.ops.Dedup.decontaminateSemantic]] (drop
  * every incoming row within `threshold` cosine of any benchmark
  * vector, paraphrase-level eval-leak removal before anything lands in
  * the corpus).
  *
  * Stateless by construction, which is what makes it a sound stream
  * transform: the benchmark's sign-LSH buckets collapse to ONE
  * array-of-candidates row per bucket (tiny — eval sets are small by
  * construction — and broadcast), each incoming row computes its own
  * bucket in a narrow projection, left-joins its bucket's candidate
  * list, and an `exists` higher-order scan verifies exact cosine. No
  * shuffle of the stream, no state store, no watermark requirement;
  * replays produce identical output because nothing is remembered.
  * Recall equals the batch operator's (same single-band signature —
  * an identical or near-identical leak always collides); precision is
  * exact.
  *
  * Works identically on a batch frame (nothing here is
  * streaming-specific), where it is also the shuffle-free plan shape
  * for pipelines that cannot afford the batch operator's bounded
  * count-probe actions at plan-build time.
  */
object DecontaminateStream {

  def apply(
      events: DataFrame,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double,
      planes: Int = 12): DataFrame = {
    require(threshold > -1.0 && threshold <= 1.0,
      s"threshold must be a cosine in (-1, 1]: $threshold")
    // one row per occupied benchmark bucket: (bucket, candidate
    // vectors). distinct() first: a duplicated eval row is not more
    // evidence, and it keeps candidate lists proportional to DISTINCT
    // benchmark vectors even for boilerplate-duplicated benchmarks
    val benchBuckets = benchmark
      .select(col(benchVecCol).as("__bv"))
      .distinct()
      .withColumn("__bench_bucket",
        call_function("graft_lsh_bucket", col("__bv"), lit(planes)))
      .groupBy(col("__bench_bucket"))
      .agg(collect_list(col("__bv")).as("__cands"))
    val bucketed = events.withColumn("__bucket",
      call_function("graft_lsh_bucket", col(vecCol), lit(planes)))
    val hit: Column = exists(col("__cands"),
      v => Similarity.cosine(v, col(vecCol)) >= lit(threshold))
    // coalesce the NULL-cosine case (zero-norm incoming or candidate
    // vector → graft_cosine_sim yields SQL NULL → `exists` yields NULL
    // when no other candidate is a true hit): a null hit is NOT a hit,
    // matching the batch operator where `__cos >= threshold` filters
    // the null out and the row SURVIVES the anti join
    bucketed
      .join(broadcast(benchBuckets),
        col("__bucket") === col("__bench_bucket"), "left_outer")
      .filter(col("__cands").isNull || !coalesce(hit, lit(false)))
      .drop("__bucket", "__bench_bucket", "__cands")
  }
}
