package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * The driver has shipped `events.parquet`'s `ts` column in three different
  * physical shapes across regenerations, and the loader must accept all of
  * them so the suite survives the next one:
  *
  *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
  *     ([PARQUET_TYPE_ILLEGAL]) unless `nanosAsLong` is set, under which it
  *     arrives as raw LongType nanos — we floor-truncate to microseconds,
  *     the same truncation DuckDB applies, so oracles agree bit-for-bit.
  *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
  *     TIMESTAMP_NTZ by default, which `unix_micros`/`unix_millis` reject
  *     at analysis. We disable NTZ inference (session TZ is UTC, so the
  *     wall-clock micros are identical to what DuckDB reads) and keep a
  *     defensive NTZ→TIMESTAMP cast arm for frames loaded by sessions we
  *     didn't configure.
  *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=true): plain TimestampType,
  *     passes through untouched.
  */
object Tables {

  /** Session defaults shared by Verify / Bench / tests. Also registers the
    * graft native expressions so library code works on caller-provided
    * sessions (the `spark.sql.extensions` route via
    * [[graft.expressions.GraftExtensions]] is equivalent). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // ObjectHashAggregate (min_by/collect_list/collect_set — the owner
    // elections and per-doc rebuilds) falls back to SORT-based
    // aggregation once a task's hash map passes this many distinct
    // keys; the 128 default re-sorts every high-cardinality rebuild.
    // 8192 boxed buffers per task is a bounded, data-size-independent
    // memory cost (~1 MB/task for the struct buffers used here) and
    // keeps the hash path for realistic per-task group counts at any
    // scale — the threshold is per TASK, so it needs no retuning for
    // cluster size (guide §2.3 map-side aggregation).
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8192")
    graft.expressions.GraftExpressions.ensureRegistered(spark)
    spark
  }

  /** Drop whatever the previous query left in the block manager — a few
    * operators hand back persisted frames whose lifetime the caller
    * owns, and a long session of queries (Verify's 100+, Bench's ×3
    * trials) accumulating leftovers squeezes the unified memory pool
    * until shuffle-heavy queries spill. Shared by both driver mains so
    * the hygiene cannot diverge. */
  def dropCachedLeftovers(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Normalize every historical `ts` shape to TimestampType (UTC session):
    * NANOS-as-long → floor ns→µs; NTZ (a reader configured elsewhere with
    * inference on) → value-identical cast under the UTC session TZ; plain
    * TIMESTAMP passes through. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == LongType =>
        acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      case (acc, f) if f.name == "ts" && f.dataType == TimestampNTZType =>
        acc.withColumn(f.name, col(f.name).cast(TimestampType))
      case (acc, _) => acc
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
