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
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor" +
      " (0 divides by zero in the salt pmod; negatives would replicate " +
      "the dimension zero times and silently return an empty join)")
    val SaltCol = "__graft_salt"
    // default salt source: every HASHABLE fact column — xxhash64
    // refuses MapType at analysis, and an unhashable column must not
    // break the documented all-columns default
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case st: org.apache.spark.sql.types.StructType =>
        st.fields.exists(f => hasMap(f.dataType))
      case at: org.apache.spark.sql.types.ArrayType => hasMap(at.elementType)
      case _ => false
    }
    val hashable = fact.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(_.name).toSeq
    val saltCols = if (saltOn.nonEmpty) saltOn else hashable
    val salted = fact.withColumn(SaltCol,
      pmod(xxhash64(saltCols.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn(SaltCol,
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Rows close in BOTH dimensions get close
    * z-values, so range-partitioning and sorting by z clusters the data
    * for min/max file skipping on EITHER column — the multi-dimensional
    * layout trick behind Delta/Iceberg OPTIMIZE ZORDER. Pure integer
    * shift/mask arithmetic (one codegen'd expression, no UDF), identical
    * in any engine.
    *
    * `bits` = 16 covers keys < 65,536 per dimension (z < 2^32); raise it
    * toward 31 for wider domains (2·bits ≤ 63 keeps the interleave in a
    * positive long). Values are masked to `bits` (callers with wider
    * domains should pre-scale, e.g. bucket timestamps to days).
    * NEGATIVE inputs interleave their two's-complement low bits — all
    * ones, so every negative row clusters at the TOP of the z range and
    * file skipping silently degrades; shift the domain to non-negative
    * first (the contract, now stated rather than implied). */
  def zorderValue(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && 2 * bits <= 63, s"bits must be in [1,31]: $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Range-partition `df` into `numPartitions` by the z-order of
    * (`colA`, `colB`) and sort within each partition — the
    * write-side layout pass: parquet written from this frame carries
    * per-file z min/max footers that prune to a bounded number of files
    * for a predicate box on either dimension (at 100 TB, the difference
    * between scanning the table and scanning a few files). The `zval`
    * column is kept so readers can push `zval BETWEEN lo AND hi`
    * range predicates derived from a query box. */
  def zorderRepartition(
      df: DataFrame,
      colA: String,
      colB: String,
      numPartitions: Int,
      bits: Int = 16): DataFrame = {
    // zval is part of the OUTPUT contract (readers push zval ranges),
    // so it cannot hide behind a dunder name — but silently replacing
    // a caller's same-named column would lose their data
    require(!df.columns.contains("zval"),
      "zorderRepartition emits a `zval` column; the input frame " +
        "already has one — rename it first")
    df.withColumn("zval", zorderValue(col(colA), col(colB), bits))
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }

  /** True when the physical plan of `df` contains no SHUFFLE exchange —
    * the assertion behind co-located joins. Broadcast and reused
    * exchanges don't count: a broadcast-hash join moves no partitioned
    * data, and flagging it spuriously failed co-location assertions
    * whenever AQE converted the probe join to broadcast. */
  def isExchangeFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
      .replace("BroadcastExchange", "")
      .replace("ReusedExchange", "")
    !plan.contains("Exchange")
  }
}
