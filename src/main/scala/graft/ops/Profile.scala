package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    // names go through generated SQL: escape BACKSLASHES then quotes in
    // the literal (the default parser processes \-escapes, so an
    // unescaped "c:\path" would silently lose its backslash and a
    // trailing one would swallow the closing quote) and backtick-quote
    // the aliased refs, or a column named "word count" breaks the parse
    val stackArgs = cols.map { c =>
      val litName = c.replace("\\", "\\\\").replace("'", "''")
      val ref = c.replace("`", "``")
      s"'$litName', `__nn_$ref`, `__nd_$ref`"
    }.mkString(", ")
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
    // total from the (tiny) per-key counts — a df.agg(count) would
    // re-scan the full input a second time just for one scalar
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        round(col("n") / col("__total"), 6).as("share"))
      .orderBy(col("n").desc, col("key")).limit(k)
  }

  /** Distribution-drift check between two slices of a numeric column —
    * the gate a long-running ingest pipeline runs when a new crawl/day
    * lands: Kolmogorov–Smirnov distance (max CDF gap) and Population
    * Stability Index over fixed-width bins, one row per occupied bin
    * plus the running statistics, so the caller can both threshold the
    * scalars (`max(ks_gap)`, `sum(psi_term)`) and see WHICH value region
    * drifted.
    *
    * Bins are `floor(value / binWidth)` with a caller-fixed width — data-
    * independent, so two engines (and two runs over different partitions)
    * bin identically; pick a binary-exact width (0.25, 0.5, 1, 2 …) and
    * the division itself is exact IEEE. PSI terms use the standard
    * "skip one-sided bins" convention (a bin empty on either side
    * contributes null, not ±∞); `ln` is 1-ulp, so threshold on the
    * 6-dp-rounded sums.
    *
    * 100 TB: two map-side-combined counts (one per slice) shuffle at
    * most `|occupied bins|` rows each; the CDF windows run over that
    * bin frame — bounded by the bin count, NOT the data (an
    * unpartitioned window over ≤ thousands of bin rows, the same
    * checkpoint-scale exception as `appendWithSeq`) — so the heavy side
    * of the plan is two narrow scans. */
  def driftBins(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def binned(df: DataFrame, n: String) = df
      .filter(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / binWidth).as("bin"))
      .agg(count(lit(1)).as(n))
    val joined = binned(a, "n_a").join(binned(b, "n_b"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    graft.util.Logs.quietGlobalWindowWarning()
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // an EMPTY slice (no non-null values — e.g. "the new day has no
    // data", maximal drift) would make its total 0 and every cdf NaN;
    // NaN comparisons are false, so a gate thresholding max(ks_gap)
    // would silently PASS the degenerate case. Define the empty side's
    // cdf as 0 instead: ks_gap becomes the other side's cdf (→ 1 at the
    // top bin) and the gate alarms.
    def cdf(c: String) = when(sum(col(c)).over(tot) === 0L, lit(0.0))
      .otherwise(sum(col(c)).over(w) / sum(col(c)).over(tot))
    joined
      .withColumn("cdf_a", cdf("n_a"))
      .withColumn("cdf_b", cdf("n_b"))
      .withColumn("ks_gap", round(abs(col("cdf_a") - col("cdf_b")), 6))
      .withColumn("psi_term",
        round(psiTerm(
          when(sum(col("n_a")).over(tot) === 0L, lit(0.0))
            .otherwise(col("n_a") / sum(col("n_a")).over(tot)),
          when(sum(col("n_b")).over(tot) === 0L, lit(0.0))
            .otherwise(col("n_b") / sum(col("n_b")).over(tot))), 6))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(col("cdf_a"), 6).as("cdf_a"),
        round(col("cdf_b"), 6).as("cdf_b"),
        col("ks_gap"), col("psi_term"))
  }

  /** (pa′ − pb′)·ln(pa′/pb′) with both shares FLOORED at 1e-6 — the
    * standard epsilon-smoothed PSI. The floor is what makes
    * `sum(psi_term)` a safe threshold scalar: under the
    * skip-one-sided-bins convention a TOTAL distribution shift (the two
    * slices share no occupied bin) would make every term null and the
    * sum NULL/0, silently passing a `> 0.2` gate on the maximal-drift
    * day; floored, each one-sided bin contributes a large finite term
    * and the gate alarms. Bins where both shares exceed the floor are
    * numerically identical to the unfloored convention. */
  private def psiTerm(pa: Column, pb: Column): Column = {
    val fa = greatest(pa, lit(1e-6))
    val fb = greatest(pb, lit(1e-6))
    (fa - fb) * log(fa / fb)
  }
}
