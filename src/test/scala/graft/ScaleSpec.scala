package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Physical-layout assertions: bucketed joins skip the exchange, salted
  * joins match plain-join results while splitting hot keys. */
class ScaleSpec extends SparkSpec {

  test("bucketing: equal-bucketed tables join with no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    Scale.writeBucketed(o, "b_orders", Seq("o_orderkey"), numBuckets = 8,
      path = Some(s"$tmp/b_orders"))
    Scale.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), numBuckets = 8,
      path = Some(s"$tmp/b_lineitem"))

    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    // disable broadcast so the join planner actually considers an exchange
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      assert(Scale.isExchangeFree(j), j.queryExecution.executedPlan.toString)
      // sanity: the same join over the raw (unbucketed) parquet DOES shuffle
      val raw = o.join(l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(!Scale.isExchangeFree(raw))
      // and results agree
      assert(j.count() == raw.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert(joined.count() > 0)
  }

  test("salting: salted join equals the plain join on a skewed key") {
    val s = spark
    import s.implicits._
    // 10k rows, 90% on one hot key
    val fact = (1 to 10000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong)
    }.toDF("k", "v")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum(col("v"))).head()
    val salted = Scale.saltedJoin(fact, dim, Seq("k"), saltFactor = 8)
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(plain == salted)

    // the hot key actually spreads across salt values
    val spread = fact.withColumn("salt",
        pmod(xxhash64(fact.columns.map(col): _*), lit(8)))
      .filter(col("k") === 42L)
      .select(countDistinct(col("salt"))).head().getLong(0)
    assert(spread == 8L)
  }
}
