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
  * The width estimate reads the LEAF relations' statistics (raw input
  * bytes — the same quantity Spark's file-split packing consumes, so
  * projection/filter stat-scaling higher in the plan cannot skew it)
  * and runs them through Spark's own split arithmetic (`maxSplitBytes`
  * = min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism)))
  * — no physical planning. Sources that report no real size (LogicalRDD,
  * JDBC — `defaultSizeInBytes` sentinels) fall back to the honest
  * `df.rdd.getNumPartitions` probe, which pays one physical planning
  * exactly as every caller did before the estimate existed; file-backed
  * inputs (the hot path for every query in this repo) never do.
  */
object Balance {

  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target =
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // A frame that already contains an exchange (groupBy/join/window/
    // global sort/repartition) runs at shuffle parallelism regardless of
    // its leaf scan width — the leaf-stats estimate below measures only
    // the scans, so small leaves would make it insert a redundant full
    // shuffle on top of the one the plan already pays. Skip: the guard
    // exists for narrow maps over raw scans.
    val optimized = df.queryExecution.optimizedPlan
    // limit FIRST: a global limit collapses to one partition even when
    // an exchange sits BELOW it (join-then-limit), so the exchange
    // check must not short-circuit the widen for exactly the
    // single-partition regime this guard exists for
    if (hasGlobalLimit(optimized)) df.repartition(target)
    else if (hasExchange(optimized)) df
    else {
      val width = estimatedScanPartitions(df)
        .getOrElse(df.rdd.getNumPartitions.toLong)
      if (width < target) df.repartition(target) else df
    }
  }

  /** Optimized-plan nodes that compile to a shuffle (or an AQE-sized
    * exchange): their output parallelism is the session's shuffle
    * setting, not the leaf scan width. Distinct/set-ops rewrite to
    * Aggregate/Join before this runs on the OPTIMIZED plan. */
  private def hasExchange(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan.exists {
      case _: Aggregate | _: Join | _: Window => true
      case s: Sort => s.global
      // shuffle=false is coalesce(n): it NARROWS parallelism with no
      // exchange, so it must not claim shuffle-width output — a
      // coalesce(1) feeding a heavy map still needs the widen
      case r: Repartition => r.shuffle
      case _: RepartitionByExpression => true
      case _ => false
    }
  }

  /** A global limit collapses to ONE partition physically — the leaf
    * stats still report full scan width, so without this case a
    * `bigTable.limit(n)` feeding a per-row-heavy map would pass the
    * width check yet run single-core, exactly the regime the guard
    * exists for. (Not an "exchange" — the limited frame must still be
    * WIDENED, not skipped, so it gets its own predicate.) */
  private def hasGlobalLimit(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan.exists {
      case _: GlobalLimit => true
      case _ => false
    }
  }

  /** Bytes at/above this are size-UNKNOWN sentinels
    * (`spark.sql.defaultSizeInBytes` defaults to Long.MaxValue), not
    * data: no real corpus reports an exabyte from one leaf. */
  private val UnknownSizeFloor = BigInt(1L << 50) // 1 PiB

  /** ≈ the number of scan partitions Spark's file-split packing would
    * produce for `df`'s input, from leaf-relation stats only. None when
    * any leaf hides its size (caller falls back to the physical probe). */
  private def estimatedScanPartitions(df: DataFrame): Option[Long] = {
    val spark = df.sparkSession
    def bytesConf(key: String, default: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(key, default))
    val leafSizes = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes)
    if (leafSizes.isEmpty || leafSizes.exists(_ >= UnknownSizeFloor)) None
    else {
      val sizeInBytes = leafSizes.sum
      val maxPartitionBytes =
        bytesConf("spark.sql.files.maxPartitionBytes", "128MB")
      val openCost = bytesConf("spark.sql.files.openCostInBytes", "4MB")
      val parallelism = math.max(1, spark.sparkContext.defaultParallelism)
      val bytesPerCore = sizeInBytes / parallelism
      val maxSplit = BigInt(maxPartitionBytes)
        .min(BigInt(openCost).max(bytesPerCore))
      val est = (sizeInBytes + maxSplit - 1) / maxSplit.max(1)
      Some(est.min(BigInt(Long.MaxValue)).toLong.max(1L))
    }
  }
}
