package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one compact JSON line PER QUERY
  * ({"metric":"query","name":…,"value":…}) followed by a final compact
  * {"metric":"total","value":N,"unit":"sec","nqueries":…,"sf":…} line.
  * The total comes LAST and carries no embedded per-query map, so a
  * bounded tail capture of stdout always retains the headline number
  * (round 3 lost it to tail truncation of one giant line).
  *
  * Each query is forced through the `noop` sink so the FULL plan executes
  * (a bare `count()` would let Catalyst prune projections and undercount
  * the work).
  *
  * Host-noise hardening: every query runs SPARK_GRAFT_BENCH_TRIALS
  * times (default 3) and reports the per-query MINIMUM — the sandbox has
  * documented run-to-run CPU contention of up to +50%, and the min is
  * the standard low-noise estimator of a query's true cost (noise only
  * ever ADDS time). The headline total is the sum of per-query minima.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.configure(spark)
    // ERROR, not WARN: the deliberate global windows used to spray hundreds
    // of WindowExec "No Partition Defined" WARN lines into stderr, and the
    // driver's bounded tail capture evicted the per-query stdout lines
    // (BENCH_r03..r05 all lost their per-query record to this).
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = BenchMetrics.install(spark.sparkContext)

    // JVM/codegen warmup on the smallest SF so per-query numbers measure
    // the plan, not first-use classloading.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // A failed query reports -1, not its elapsed time — a broken query
    // must never masquerade as a fast one in the JSON. A query that
    // failed on ANY trial is failed (no cherry-picking a lucky run).
    // Each query is measured from a clean cache state
    // (Tables.dropCachedLeftovers runs OUTSIDE the timed window —
    // leftover persisted blocks were measured causing multi-× slowdowns
    // late in a 90+-query run).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val trialRuns = (0 until trials).map { _ =>
        Tables.dropCachedLeftovers(spark)
        metrics.reset()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, metrics.snapshot(spark.sparkContext))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (-1.0, metrics.snapshot(spark.sparkContext))
        }
      }
      // Shuffle/spill come from the FASTEST trial: bytes are plan-
      // deterministic (identical across trials), but spill is a
      // pressure symptom and the min-time trial is the one the
      // headline number describes.
      val (best, bestSnap) =
        if (trialRuns.exists(_._1 < 0)) (-1.0, trialRuns.head._2)
        else trialRuns.minBy(_._1)
      println(s"""{"metric":"query","name":"$name","value":$best,"unit":"sec"}""")
      (name, best, bestSnap)
    }
    // any failure poisons the headline total: a run missing its slowest
    // query must not look FASTER than a healthy run
    val total =
      if (results.exists(_._2 < 0)) -1.0
      else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"sf":"$sfDir"}""")

    // Durable record: stdout passes through a bounded (~2k char) tail
    // capture that can hold ~21 of 120+ per-query lines, so the official
    // artifact has carried "parsed": null for six straight rounds. The
    // full per-query map + total is therefore ALSO written to
    // BENCH_LOCAL.json in the working directory (the repo root under
    // sbt), committed per round, so regressions can be diffed without
    // tail archaeology.
    val queriesJson = results
      .map { case (n, v, _) => s""""$n":$v""" }
      .mkString("{", ",", "}")
    // Resource record per query (shuffle read/write, mem/disk spill from
    // the fastest trial) rides in a PARALLEL map so existing consumers
    // of the numeric "queries" map keep parsing unchanged.
    val metricsJson = results
      .map { case (n, _, snap) => s""""$n":${snap.json}""" }
      .mkString("{", ",", "}")
    val localJson =
      s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"trials":$trials,"sf":"$sfDir","queries":$queriesJson,"resources":$metricsJson}"""
    try {
      val out = java.nio.file.Paths.get("BENCH_LOCAL.json")
      java.nio.file.Files.write(out, (localJson + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
