package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB plan shapes the engine leans
  * on: bucketing for shuffle-free co-located joins, and key salting for
  * skewed join keys that AQE's skew-split cannot fix (e.g. a single hot
  * key inside one logical partition).
  */
object Scale {

  /** Persist `df` bucketed (and sorted) by `keys` into the session
    * catalog. Two tables bucketed by the same keys into the same bucket
    * count join WITHOUT an exchange — the co-located join that turns the
    * repeated big-big join of a daily pipeline into a scan-side merge.
    * (`sortBy` additionally removes the per-bucket sort for sort-merge.) */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
    // explicit path → external table; avoids LOCATION_ALREADY_EXISTS when
    // a fresh (in-memory) catalog meets a leftover managed-table dir
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Salted join against a skewed fact side: the dimension is replicated
    * `saltFactor` times (one copy per salt value) and the fact side gets
    * a DETERMINISTIC per-row salt, splitting each hot key across
    * `saltFactor` reducers. Equivalent to `fact.join(dim, keys, "inner")`.
    *
    * The salt hashes `saltOn` when given (pass the fact's unique id —
    * deterministic under task retry AND distinct for value-identical
    * hot rows), else all fact columns (retry-safe; fully identical
    * duplicate rows then share a salt, so provide `saltOn` when the
    * skew is duplicate-shaped). Position-based salts
    * (`monotonically_increasing_id`, `rand`) are NOT used: they change
    * across task retries and can duplicate/lose join rows.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      saltOn: Seq[String] = Nil): DataFrame = {
    val SaltCol = "__graft_salt"
    val saltCols = if (saltOn.nonEmpty) saltOn else fact.columns.toSeq
    val salted = fact.withColumn(SaltCol,
      pmod(xxhash64(saltCols.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn(SaltCol,
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion behind co-located joins. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
