package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The `ts` data-shape contract (round 9's regression): the driver has
  * shipped `events.parquet`'s `ts` as TIMESTAMP(NANOS), as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4: TIMESTAMP_NTZ),
  * and as plain TIMESTAMP across regenerations. The loader and every
  * `ts` consumer must survive all three — these specs re-create the NTZ
  * shape on disk and drive the exact query paths that broke. */
class TablesNtzSpec extends SparkSpec {

  /** An events dir whose parquet `ts` is written as NTZ micros
    * (isAdjustedToUTC=false) — the round-9 driver shape. */
  private lazy val ntzDir: String = {
    val dir = Files.createTempDirectory("graft-ntz-events").toFile
    dir.deleteOnExit()
    val events = Tables.events(spark, sf0001)
    events.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  test("Tables.load normalizes an NTZ-written parquet ts to TimestampType, value-identical") {
    val orig = Tables.events(spark, sf0001)
    val loaded = Tables.events(spark, ntzDir)
    assert(loaded.schema("ts").dataType == TimestampType)
    // wall-clock micros must agree bit-for-bit with the original table
    val a = orig.select(sum(unix_micros(col("ts"))), count(lit(1))).head()
    val b = loaded.select(sum(unix_micros(col("ts"))), count(lit(1))).head()
    assert(a == b, s"NTZ round-trip drifted: $a vs $b")
  }

  test("Tables.normalizeTs handles all three historical ts shapes") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.123456")))
      .toDF("event_id", "ts")
    // plain TIMESTAMP: passes through untouched
    assert(Tables.normalizeTs(base).schema("ts").dataType == TimestampType)
    // NTZ: value-identical cast under the UTC session
    val ntz = base.withColumn("ts", col("ts").cast("timestamp_ntz"))
    val normNtz = Tables.normalizeTs(ntz)
    assert(normNtz.schema("ts").dataType == TimestampType)
    assert(normNtz.select(unix_micros(col("ts"))).head().getLong(0) ==
      base.select(unix_micros(col("ts"))).head().getLong(0))
    // NANOS-as-long (what nanosAsLong yields): floor ns → µs
    val nanos = base.withColumn("ts", (unix_micros(col("ts")) * 1000L + 789L))
    assert(nanos.schema("ts").dataType == LongType)
    val normNanos = Tables.normalizeTs(nanos)
    assert(normNanos.schema("ts").dataType == TimestampType)
    assert(normNanos.select(unix_micros(col("ts"))).head().getLong(0) ==
      base.select(unix_micros(col("ts"))).head().getLong(0))
  }

  test("tsEpochMicros/Millis accept NTZ columns and agree with unix_micros/millis on TIMESTAMP") {
    import graft.functions.GraftFunctions.{tsEpochMicros, tsEpochMillis}
    val base = Tables.events(spark, sf0001).select(col("event_id"), col("ts"))
    val ntz = base.withColumn("ts_ntz", col("ts").cast("timestamp_ntz"))
    val drift = ntz.select(
        sum(abs(tsEpochMicros(col("ts_ntz")) - unix_micros(col("ts")))).as("us"),
        sum(abs(tsEpochMillis(col("ts_ntz")) - unix_millis(col("ts")))).as("ms"))
      .head()
    assert(drift.getLong(0) == 0L && drift.getLong(1) == 0L, s"drift: $drift")
  }

  test("the round-9 broken query paths all run over an NTZ-written events table") {
    // each of these reads ONLY the events table, so the NTZ-only temp
    // dir drives the full query; round 9 failed them all at analysis
    val keys = Seq("sf3_ts_arith", "window_rolling_range", "events_sessionize",
      "events_funnel_strict", "events_funnel_counts")
    keys.foreach { k =>
      val n = SparkEntry.queries(k)(spark, ntzDir).count()
      assert(n > 0, s"$k returned no rows over NTZ events")
    }
  }
}
