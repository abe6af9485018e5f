package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.DecontaminateStream

/** Ingestion-time semantic decontamination as a true stream: planted
  * leaks (exact and scaled copies of benchmark vectors) drop at arrival,
  * clean rows pass, and the batch operator agrees row-for-row on the
  * same data. */
class DecontaminateStreamSpec extends SparkSpec {

  private val bench = Seq(
    Seq(1.0f, 0.0f, 0.0f, 0.0f),
    Seq(0.0f, 0.0f, 1.0f, 0.0f))

  test("streaming: benchmark-similar rows drop at ingestion; clean rows pass; Append mode, no state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val benchDf = bench.map(Tuple1(_)).toDF("embedding")
    val q = DecontaminateStream(
        in.toDF().toDF("vec_id", "embedding"), "embedding",
        benchDf, "embedding", threshold = 0.95)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode(OutputMode.Append()).start()
    def kept(): Set[Long] = s.sql("SELECT vec_id FROM decon_stream")
      .collect().map(_.getLong(0)).toSet
    try {
      // batch 1: a leak (exact copy of bench 0) and a clean orthogonal row
      in.addData(
        10L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
        11L -> Seq(0.0f, 1.0f, 0.0f, 0.0f))
      q.processAllAvailable()
      assert(kept() == Set(11L), s"got ${kept()}")
      // batch 2: a SCALED copy of bench 1 (cosine exactly 1, identical
      // sign bits) and another clean row — stateless: batch 1's
      // decisions are unaffected, batch 2 filters independently
      in.addData(
        20L -> Seq(0.0f, 0.0f, 5.0f, 0.0f),
        21L -> Seq(0.0f, 3.0f, 0.0f, 4.0f))
      q.processAllAvailable()
      assert(kept() == Set(11L, 21L), s"got ${kept()}")
    } finally q.stop()
  }

  test("batch parity: the stream transform and Dedup.decontaminateSemantic keep the same rows") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      2L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
      3L -> Seq(0.0f, 0.0f, 2.0f, 0.0f),
      4L -> Seq(0.0f, 0.6f, 0.0f, 0.8f)
    ).toDF("vec_id", "embedding")
    val benchDf = bench.map(Tuple1(_)).toDF("embedding")
    val viaStreamShape = DecontaminateStream(
        corpus, "embedding", benchDf, "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val viaBatch = graft.ops.Dedup.decontaminateSemantic(
        corpus, "vec_id", "embedding", benchDf, "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaStreamShape == viaBatch && viaStreamShape == Set(2L, 4L),
      s"stream-shape $viaStreamShape vs batch $viaBatch")
    // schema passes through untouched (no helper columns leak)
    assert(DecontaminateStream(corpus, "embedding", benchDf, "embedding", 0.95)
      .columns.toSeq == Seq("vec_id", "embedding"))
  }

  test("batch parity holds under zero-norm vectors: NULL cosine is not a hit") {
    val s = spark
    import s.implicits._
    // a zero-norm corpus row (NULL cosine against every candidate), a
    // clean row that shares its LSH bucket with a zero-norm BENCHMARK
    // vector (exists() scans a null cosine before deciding), and a leak
    val corpus = Seq(
      1L -> Seq(0.0f, 0.0f, 0.0f, 0.0f),   // zero-norm: must SURVIVE
      2L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),   // clean: must survive
      3L -> Seq(1.0f, 0.0f, 0.0f, 0.0f)    // exact leak: must drop
    ).toDF("vec_id", "embedding")
    // the zero benchmark vector lands in bucket 0 alongside nothing in
    // particular, but its NULL cosine rides in every list it joins
    val benchDf = (bench :+ Seq(0.0f, 0.0f, 0.0f, 0.0f))
      .map(Tuple1(_)).toDF("embedding")
    val viaStreamShape = DecontaminateStream(
        corpus, "embedding", benchDf, "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val viaBatch = graft.ops.Dedup.decontaminateSemantic(
        corpus, "vec_id", "embedding", benchDf, "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaBatch == Set(1L, 2L), s"batch kept $viaBatch")
    assert(viaStreamShape == viaBatch,
      s"zero-norm parity broke: stream $viaStreamShape vs batch $viaBatch")
  }
}
