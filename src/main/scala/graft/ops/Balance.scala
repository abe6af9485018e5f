package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for per-row-heavy narrow maps (MinHash, cosine,
  * media decode): a small input (one parquet file → one partition) would
  * otherwise pin the whole computation to a single core.
  *
  * Repartitions ONLY when the estimated scan width falls below the
  * session's configured shuffle parallelism — at real scale (100 TB →
  * thousands of input splits) this is a no-op, so the guard never inserts
  * a wasteful exchange into a big plan.
  *
  * The width estimate comes from LOGICAL-plan statistics run through
  * Spark's own file-split arithmetic (`maxSplitBytes` =
  * min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism))) —
  * no physical planning. The previous probe (`df.rdd.getNumPartitions`)
  * read the true partition count but forced a second full physical
  * planning + RDD DAG build per widened query; the estimate agrees with
  * it in both regimes that matter (tiny input → below target → widen;
  * big input → splits ≥ target → untouched) and is free.
  */
object Balance {

  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target =
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (estimatedScanPartitions(df) < target) df.repartition(target) else df
  }

  /** ≈ the number of scan partitions Spark's file-split packing would
    * produce for `df`'s input, from optimized-plan stats only. */
  private def estimatedScanPartitions(df: DataFrame): Long = {
    val spark = df.sparkSession
    def bytesConf(key: String, default: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(key, default))
    val maxPartitionBytes =
      bytesConf("spark.sql.files.maxPartitionBytes", "128MB")
    val openCost = bytesConf("spark.sql.files.openCostInBytes", "4MB")
    val parallelism = math.max(1, spark.sparkContext.defaultParallelism)
    // BigInt: unknown-size relations report 8 EB, far past Long
    val sizeInBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bytesPerCore = sizeInBytes / parallelism
    val maxSplit = BigInt(maxPartitionBytes)
      .min(BigInt(openCost).max(bytesPerCore))
    val est = (sizeInBytes + maxSplit - 1) / maxSplit.max(1)
    est.min(BigInt(Long.MaxValue)).toLong.max(1L)
  }
}
