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

  test("property: strict funnel equals a sequential min-chain reference on generated streams") {
    val s = spark
    import s.implicits._
    val stages = Seq("A", "B", "C")
    val types = stages ++ Seq("X", "Y") // noise types interleave
    val rnd = new scala.util.Random(42)
    // several shapes per run: sparse users, dense users, heavy ties
    val events = (0 until 2000).map { i =>
      val u = rnd.nextInt(40).toLong
      // coarse timestamps force plenty of equal-ts ties
      val t = java.sql.Timestamp.valueOf(
        f"2026-02-01 00:${rnd.nextInt(60)}%02d:00")
      (u, t, types(rnd.nextInt(types.length)))
    }
    def reference(evs: Seq[(java.sql.Timestamp, String)]): Int = {
      // min-chain: t1 = min ts of stage 1; t_i = min ts of stage i > t_(i-1)
      var last = Long.MinValue
      var stage = 0
      var found = true
      while (stage < stages.size && found) {
        val nxt = evs.filter(e => e._2 == stages(stage) && e._1.getTime > last)
          .map(_._1.getTime).minOption
        nxt match {
          case Some(t) => last = t; stage += 1
          case None => found = false
        }
      }
      stage
    }
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      u -> reference(evs.map(e => (e._2, e._3)))
    }
    val got = graft.ops.Events.funnel(
      events.toDF("user_id", "ts", "event_type").repartition(16),
      "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected,
      s"diverged: ${got.toSet.diff(expected.toSet)} vs ${expected.toSet.diff(got.toSet)}")

    // the overflow join-chain path must agree with both on the SAME
    // generated tie-heavy stream: cap=1 routes every multi-event user
    // through it
    val chained = graft.ops.Events.funnel(
      events.toDF("user_id", "ts", "event_type").repartition(16),
      "user_id", "ts", "event_type", stages, maxEventsPerUser = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chained == expected,
      s"join-chain diverged: ${chained.toSet.diff(expected.toSet)} " +
        s"vs ${expected.toSet.diff(chained.toSet)}")
  }

  test("property: winnowing equals a sequential reference on generated corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val words = Seq("a", "b", "c", "d") // tiny vocab -> dense hash ties
    val docs = (0 until 150).map { i =>
      i.toLong -> (0 until rnd.nextInt(20)) // includes too-short docs
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    }
    val (k, w) = (3, 4)
    def md5_8(sx: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def reference(text: String): Set[(Long, Long)] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) return Set.empty
      val ghs = toks.sliding(k).map(g => md5_8(g.mkString(" "))).toArray
      if (ghs.length < w) return Set.empty
      (0 to ghs.length - w).map { i =>
        // min hash in the window, rightmost position on ties (1-based)
        val win = (i until i + w).map(j => (ghs(j), j + 1))
        win.minBy { case (h, p) => (h, -p) }
      }.map { case (h, p) => (h, p.toLong) }.toSet
    }
    val expected = docs.flatMap { case (id, t) =>
      reference(t).map { case (h, p) => (id, h, p) }
    }.toSet
    val got = graft.ops.TextAnalysis.winnowFingerprints(
      docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"diverged: extra=${got.diff(expected).take(5)} missing=${expected.diff(got).take(5)}")
  }

  test("property: heavy hitters are exact against a naive count on Zipf-ish streams") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // Zipf-ish: token i drawn with weight ~ 1/(i+1)
    val vocab = (0 until 500).map(i => s"w$i")
    val weights = vocab.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val stream = (0 until 20000).map { _ =>
      val x = rnd.nextDouble() * total
      vocab(cum.indexWhere(x <= _))
    }
    val docs = stream.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(8)
    val minShare = 0.01
    val naive = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= math.ceil(stream.size * minShare).toLong)
    val got = graft.ops.TextAnalysis.heavyHitters(docs, col("text"), minShare)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive,
      s"diverged: ${got.toSet.diff(naive.toSet)} vs ${naive.toSet.diff(got.toSet)}")
  }
}
