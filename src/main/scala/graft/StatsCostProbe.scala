package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.BucketedStateTable

/** Counted-metrics disposition of the zone-map maintenance cost: wall
  * time could not settle whether the per-commit stats job costs
  * anything material (r17 measured the state-DML family 1.4–1.66×
  * slower in one run and FASTER in an isolated re-run of the same
  * code), so this probe prices a merge commit in units host load
  * cannot inflate — Spark JOB/STAGE COUNTS and INPUT BYTES per commit
  * ([[BenchMetrics]]) — on two otherwise-identical tables:
  *
  *  - '''stats_off''' — a plain handle (no `statsCols`): the baseline
  *    commit shape. The zone-map opt-out must be truly zero-cost, so
  *    this leg also PINS the baseline job count.
  *  - '''stats_on''' — `statsCols` on two columns: the same commits
  *    plus the one footer-driven aggregation job over the DIRTY
  *    buckets (`collectBucketStats`) per commit.
  *
  * The deltas are the answer: stats maintenance adds a fixed number
  * of jobs per commit and reads only the freshly-written dirty-bucket
  * files (input bytes scale with the COMMIT, not the table — the
  * seed-vs-increment comparison shows it), and the stats_off leg's
  * counts are identical to a handle that never heard of zone maps.
  *
  * Run: `sbt "runMain graft.StatsCostProbe"` →
  * `SCALE_PROBE_STATSCOST.json`. Knobs: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_PROBE_COMMITS (incremental commits per leg, default 5).
  * Synthetic data (no SF dir): the commit shape, not the corpus, is
  * under test. */
object StatsCostProbe {

  private case class CommitCost(jobs: Long, stages: Long,
      inputBytes: Long, shuffleWriteBytes: Long, seconds: Double) {
    def json: String =
      s"""{"jobs":$jobs,"stages":$stages,"input_bytes":$inputBytes,""" +
        s""""shuffle_write_bytes":$shuffleWriteBytes,"seconds":${"%.3f"
          .formatLocal(java.util.Locale.ROOT, seconds)}}"""
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nCommits =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_COMMITS", "5").toInt.max(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = BenchMetrics.install(spark.sparkContext)
    val root = java.nio.file.Files
      .createTempDirectory("graft-statscost").toString

    def batch(fromId: Long, n: Long) =
      spark.range(fromId, fromId + n)
        .select(concat(lit("k"), col("id") % 100000).as("k"),
          col("id").as("v"),
          timestamp_seconds(lit(1700000000L) + col("id") % 86400).as("ts"))

    def leg(name: String, statsCols: Seq[String]): Seq[CommitCost] = {
      val t = new BucketedStateTable(spark, s"$root/$name",
        keyCols = Seq("k"), numBuckets = 64, retentionFloorMillis = 0L,
        statsCols = statsCols)
      // warmup leg-independent lazies once so the FIRST measured commit
      // isn't charged for classloading (a separate throwaway table)
      (0 until (nCommits + 1)).map { i =>
        val df =
          if (i == 0) batch(0L, 200000L)       // seed: all buckets dirty
          else batch(200000L + i * 20000L, 20000L) // increment: subset
        metrics.reset()
        val t0 = System.nanoTime()
        t.merge(df, keys = Seq("k"))
        val snap = metrics.snapshot(spark.sparkContext)
        CommitCost(snap.jobs, snap.stages, snap.inputBytes,
          snap.shuffleWriteBytes, (System.nanoTime() - t0) / 1e9)
      }
    }

    // throwaway warmup table: first-ever commit pays classloading/codegen
    locally {
      val w = new BucketedStateTable(spark, s"$root/warmup",
        keyCols = Seq("k"), numBuckets = 16, retentionFloorMillis = 0L,
        statsCols = Seq("v"))
      w.merge(batch(0L, 1000L), keys = Seq("k"))
      w.merge(batch(1000L, 1000L), keys = Seq("k"))
    }

    val off = leg("stats_off", Nil)
    val on = leg("stats_on", Seq("v", "ts"))

    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    // the INCREMENTAL commits (drop the seed) are the steady-state cost
    val offInc = off.drop(1)
    val onInc = on.drop(1)
    val dJobs = avg(onInc.map(_.jobs)) - avg(offInc.map(_.jobs))
    val dStages = avg(onInc.map(_.stages)) - avg(offInc.map(_.stages))
    val dInput = avg(onInc.map(_.inputBytes)) - avg(offInc.map(_.inputBytes))
    def n(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    val json =
      s"""{"metric":"stats_cost","commits_per_leg":${nCommits + 1},""" +
        s""""legs":{""" +
        s""""stats_off":{"seed":${off.head.json},"incremental":[${offInc.map(_.json).mkString(",")}]},""" +
        s""""stats_on":{"seed":${on.head.json},"incremental":[${onInc.map(_.json).mkString(",")}]}},""" +
        s""""delta_per_incremental_commit":{"jobs":${n(dJobs)},"stages":${n(dStages)},"input_bytes":${n(dInput)}}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_PROBE_STATSCOST.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
    System.out.flush()
  }
}
