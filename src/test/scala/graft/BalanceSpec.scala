package graft

import org.apache.spark.sql.functions._

import graft.ops.Balance

/** The parallelism guard must decide from logical-plan statistics
  * alone: widening a small scan to the session's shuffle width, leaving
  * a big scan untouched, and never forcing physical planning (the old
  * `df.rdd` probe planned every widened query twice). */
class BalanceSpec extends SparkSpec {

  test("widen raises a small scan to the configured shuffle width") {
    val df = Tables.documents(spark, sf0001).select("doc_id", "text")
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val w = Balance.widen(df)
    assert(w.rdd.getNumPartitions == target,
      s"small input must widen to $target partitions")
  }

  test("widen is a no-op when the estimated scan width meets the target") {
    // shrink the split size so the same small file estimates to many
    // splits — the at-scale regime without terabytes of test data
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, "1KB")
    try {
      val df = Tables.documents(spark, sf0001).select("doc_id", "text")
      val w = Balance.widen(df)
      assert(w eq df, "a wide-enough scan must come back untouched — " +
        "no repartition exchange in the plan")
    } finally spark.conf.set(key, old)
  }

  test("a source without real size stats still widens via the physical fallback") {
    val s = spark
    import s.implicits._
    // LogicalRDD reports the defaultSizeInBytes sentinel, not data size;
    // the stat estimate must NOT silently skip the guard for it
    val rdd = spark.sparkContext
      .parallelize(Seq(1L -> "a", 2L -> "b"), numSlices = 1)
    val df = spark.createDataFrame(rdd).toDF("id", "t")
    assert(df.rdd.getNumPartitions == 1)
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(Balance.widen(df).rdd.getNumPartitions == target,
      "stat-less source must fall back to the honest probe and widen")
  }

  test("widen skips a frame that already contains an exchange") {
    // a groupBy/join/repartition frame runs at shuffle parallelism no
    // matter how small its leaf scan is — widening it would stack a
    // redundant full shuffle on top of the one the plan already pays
    val docs = Tables.documents(spark, sf0001)
    val agg = docs.groupBy("lang").agg(count("*").as("n"))
    assert(Balance.widen(agg) eq agg, "aggregate frame must come back untouched")
    val joined = docs.select("doc_id").join(
      docs.select(col("doc_id").as("d2")), col("doc_id") === col("d2"))
    assert(Balance.widen(joined) eq joined, "join frame must come back untouched")
    val rep = docs.repartition(4)
    assert(Balance.widen(rep) eq rep, "repartitioned frame must come back untouched")
    // a global sort range-partitions at shuffle width too
    val sorted = docs.orderBy("doc_id")
    assert(Balance.widen(sorted) eq sorted, "sorted frame must come back untouched")
  }

  test("widen does not trigger physical planning (plan-count)") {
    val df = Tables.documents(spark, sf0001).select("doc_id", "text")
      .filter(col("text").isNotNull)
    Balance.widen(df)
    val phases = df.queryExecution.tracker.phases.keySet
    assert(phases.contains("optimization"),
      s"stats read should have optimized: $phases")
    assert(!phases.contains("planning"),
      s"widen must not physically plan its input: $phases")
  }
}
