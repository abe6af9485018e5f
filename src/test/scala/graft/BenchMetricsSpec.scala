package graft

import org.apache.spark.sql.functions._

/** The bench resource listener: shuffle bytes must be observed for a
  * genuinely-shuffling query, zero for a narrow one, and the
  * representative non-state-building bench queries must run spill-free
  * at test scale — the property BENCH_LOCAL.json's `resources` map
  * asserts per round at sf0.1. */
class BenchMetricsSpec extends SparkSpec {

  test("listener accounts shuffle bytes for a shuffling query, zero for a narrow one") {
    val m = BenchMetrics.install(spark.sparkContext)
    try {
      m.reset()
      Tables.lineitem(spark, sf0001)
        .groupBy("l_returnflag").agg(sum("l_quantity"))
        .write.format("noop").mode("overwrite").save()
      val agg = m.snapshot(spark.sparkContext)
      assert(agg.shuffleWriteBytes > 0, "groupBy must shuffle")
      assert(agg.shuffleReadBytes > 0)

      m.reset()
      Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_quantity")
        .filter(col("l_quantity") > 10)
        .write.format("noop").mode("overwrite").save()
      val narrow = m.snapshot(spark.sparkContext)
      assert(narrow.shuffleWriteBytes == 0,
        s"narrow filter+project must NOT shuffle, saw ${narrow.shuffleWriteBytes}")
      assert(narrow.shuffleReadBytes == 0)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("reset isolates queries: second window does not inherit the first's bytes") {
    val m = BenchMetrics.install(spark.sparkContext)
    try {
      m.reset()
      Tables.orders(spark, sf0001).groupBy("o_orderstatus").count()
        .write.format("noop").mode("overwrite").save()
      val first = m.snapshot(spark.sparkContext)
      assert(first.shuffleWriteBytes > 0)
      m.reset()
      val second = m.snapshot(spark.sparkContext)
      assert(second.shuffleWriteBytes == 0 && second.shuffleReadBytes == 0)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("job/stage/input counters: a materialized shuffle counts jobs, stages, and scan bytes") {
    // the wall-time-independent overhead unit: commit-cost questions
    // ("does stats maintenance add a job per commit?") are answered in
    // these counts, which host load cannot inflate
    val m = BenchMetrics.install(spark.sparkContext)
    try {
      m.reset()
      Tables.lineitem(spark, sf0001).groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
      val s = m.snapshot(spark.sparkContext)
      assert(s.jobs >= 1 && s.stages >= 2,
        s"a shuffling write must count a job with ≥2 stages, got jobs=${s.jobs} stages=${s.stages}")
      assert(s.inputBytes > 0, "the parquet scan must account input bytes")
      m.reset()
      val idle = m.snapshot(spark.sparkContext)
      assert(idle.jobs == 0 && idle.stages == 0 && idle.inputBytes == 0)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("representative non-state-building bench queries run spill-free") {
    // the zero-spill claim the cache-hygiene work implies, pinned for
    // the queries that shuffle hardest without building persistent
    // state (the state builders pay file I/O, not memory pressure)
    val names = Seq("q1_pricing_summary", "text_tfidf_topk", "dedup_minhash_lsh",
      "events_session_window")
    val m = BenchMetrics.install(spark.sparkContext)
    try {
      names.foreach { name =>
        Tables.dropCachedLeftovers(spark)
        m.reset()
        SparkEntry.queries(name)(spark, sf0001)
          .write.format("noop").mode("overwrite").save()
        val snap = m.snapshot(spark.sparkContext)
        assert(snap.memorySpillBytes == 0 && snap.diskSpillBytes == 0,
          s"$name spilled: mem=${snap.memorySpillBytes} disk=${snap.diskSpillBytes}")
      }
    } finally spark.sparkContext.removeSparkListener(m)
  }
}
