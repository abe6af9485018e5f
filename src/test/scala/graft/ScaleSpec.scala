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

  test("zorder: interleave round-trips the two dimensions bit-exactly") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L)).toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Scale.zorderValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    got.foreach { case (a, b, z) => assert(z === ref(a, b), s"($a,$b)") }
    assert(ref(0, 0) === 0L)
    assert(ref(1, 0) === 1L)
    assert(ref(0, 1) === 2L)
    assert(ref(65535, 65535) === (1L << 32) - 1)
  }

  test("property: zorder preserves box containment on generated keys") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val keyGen = Gen.choose(0L, 65535L)
    val pairs = (0 until 200).flatMap { i =>
      for {
        a <- keyGen.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- keyGen.apply(Gen.Parameters.default, Seed(i + 7919L))
      } yield (a, b)
    }
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Scale.zorderValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      // de-interleave recovers both keys exactly (bijectivity on 16 bits)
      var ra = 0L; var rb = 0L
      (0 until 16).foreach { i =>
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra === a && rb === b, s"($a,$b) -> $z -> ($ra,$rb)")
      // aligned power-of-two box containment: masking low key bits
      // can only lower z, so z is within the box's z-interval
      val boxA = a & ~15L; val boxB = b & ~15L
      var lo = 0L
      (0 until 16).foreach { i =>
        lo |= ((boxA >> i) & 1L) << (2 * i)
        lo |= ((boxB >> i) & 1L) << (2 * i + 1)
      }
      assert(z >= lo, "z must be >= its aligned box's lower corner")
    }
  }

  test("zorder: range partitioning yields disjoint per-partition z-ranges and a skippable box query") {
    val li = Tables.lineitem(spark, sf0001)
    val parts = 8
    // persist: the layout is fixed at write time — without it Catalyst
    // pushes the probe filter BELOW repartitionByRange and the range
    // bounds get recomputed over the filtered rows (observed), which is
    // not what a reader of written files sees
    val laid = Scale.zorderRepartition(li, "l_partkey", "l_suppkey", parts)
      .persist()
    try {
      laid.count()
      // per-partition [min,max] z-ranges must not overlap — the property
      // that gives parquet files disjoint min/max footers (file skipping)
      val ranges = laid
        .groupBy(spark_partition_id().as("pid"))
        .agg(min(col("zval")).as("lo"), max(col("zval")).as("hi"))
        .orderBy(col("lo"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"partition z-ranges overlap: $hi1 > $lo2")
        case _ => ()
      }
      // a box predicate on BOTH dimensions maps to a z interval touching
      // a strict subset of partitions: the aligned box [0,127]² is
      // exactly z <= z(127,127), so only partitions whose range
      // intersects that interval hold matching rows
      val boxMax = Scale.zorderValue(lit(127L), lit(127L))
      val hit = laid
        .filter(col("zval") <= boxMax &&
          col("l_partkey") <= 127 && col("l_suppkey") <= 127)
        .select(spark_partition_id()).distinct().count()
      assert(hit < parts, s"box query should touch < $parts partitions, hit $hit")
    } finally laid.unpersist()
  }
}
