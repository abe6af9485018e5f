package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality sweep a training pipeline runs
  * before ingesting a new source: per-column row/non-null/distinct
  * counts from ONE aggregation pass (every counter is a single-row agg,
  * map-side combined; the row count is shared across columns), unpivoted
  * to one row per column.
  *
  * `exact = false` swaps `count_distinct` for HyperLogLog++
  * `approx_count_distinct`, which is the 100 TB default: exact distinct
  * counts on N columns keep N hash sets per partition, the sketch keeps
  * N fixed-size registers.
  */
object Profile {

  def table(df: DataFrame, exact: Boolean = true, rsd: Double = 0.05): DataFrame = {
    val cols = df.columns.toSeq
    def distinctAgg(c: String) =
      if (exact) count_distinct(col(c))
      else approx_count_distinct(col(c), rsd)
    val aggs =
      count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(
          count(col(c)).as(s"__nn_$c"),
          distinctAgg(c).as(s"__nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via stack: (column, n_rows, n_nonnull, n_distinct)
    val stackArgs = cols.map(c =>
      s"'$c', __nn_$c, __nd_$c").mkString(", ")
    wide.select(
      expr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, n_distinct)"),
      col("__n").as("n_rows"))
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"))
  }

  /** Top-`k` heaviest values of a key column with their share of all
    * rows — the diagnosis you run BEFORE deciding to salt a join or
    * aggregate on that key ([[graft.operators.Scale.saltedJoin]]): a
    * top key holding >1/partitions of the rows is the straggler.
    *
    * 100 TB: one map-side-combined count per key plus a single-row
    * total broadcast into the share division; the top-k reduces via
    * TakeOrderedAndProject (per-partition heads + driver merge), never
    * a global sort. Keys render as strings so the profile is
    * column-type-agnostic. */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        round(col("n") / col("__total"), 6).as("share"))
      .orderBy(col("n").desc, col("key")).limit(k)
  }
}
