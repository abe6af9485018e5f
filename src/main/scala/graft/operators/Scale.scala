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
    * a per-row salt, splitting each hot key across `saltFactor` reducers.
    * Equivalent to `fact.join(dim, keys, "inner")`.
    *
    * The salt hashes the row's position (`monotonically_increasing_id`:
    * partition id + offset — stable under task retry for a deterministic
    * scan) rather than the row's VALUES: fully identical duplicate rows
    * are the classic hot-key shape, and a value-derived salt would send
    * them all back to one reducer.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val SaltCol = "__graft_salt"
    val salted = fact.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn(SaltCol,
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion behind co-located joins. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
