package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos
  * as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and floor-truncate
  * to microseconds — the same truncation DuckDB applies when casting a
  * nanosecond parquet timestamp to its microsecond TIMESTAMP, so oracle
  * comparisons agree bit-for-bit.
  */
object Tables {

  /** Session defaults shared by Verify / Bench / tests. Also registers the
    * graft native expressions so library code works on caller-provided
    * sessions (the `spark.sql.extensions` route via
    * [[graft.expressions.GraftExtensions]] is equivalent). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Any TIMESTAMP(NANOS) column arrives as LongType under nanosAsLong:
    // convert ns → µs (floor division; all testdata timestamps are post-epoch).
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == LongType =>
        acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      case (acc, _) => acc
    }
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
