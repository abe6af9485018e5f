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
    // df.rdd forces physical planning, but it is the only honest
    // partition count: file COUNTS mis-estimate in both directions
    // (large files split into many scan partitions; many small files
    // coalesce into few). Planning a second time costs milliseconds;
    // a wrong widening decision costs a full-table shuffle.
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
