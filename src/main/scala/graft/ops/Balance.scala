package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for per-row-heavy narrow maps (MinHash, cosine,
  * media decode): a small input (one parquet file → one partition) would
  * otherwise pin the whole computation to a single core.
  *
  * Repartitions ONLY when the scan yields fewer partitions than the
  * session's configured shuffle parallelism — at real scale (100 TB →
  * thousands of input splits) this is a no-op, so the guard never inserts
  * a wasteful exchange into a big plan.
  */
object Balance {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // inputFiles walks the analyzed plan for file scans — much cheaper
    // than df.rdd, which forces full physical planning just to read a
    // partition count. Fall back to the RDD only for non-file plans.
    val files = df.inputFiles.length
    val narrow =
      if (files > 0) files < target
      else df.rdd.getNumPartitions < target
    if (narrow) df.repartition(target) else df
  }
}
