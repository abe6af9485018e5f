package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Corpus
import graft.streaming.PackBinsStream

/** Streaming bin packing: per-shard fill state advances across
  * micro-batches, and id-ordered arrival reproduces the batch
  * operator's placement exactly. */
class PackBinsStreamSpec extends SparkSpec {

  test("per-shard fill carries across batches; id-ordered arrival matches batch packBins") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // one shard (nShards = 1): capacity 8, tokens 3,4,5,2 → the
    // cross-batch boundary matters: batch 1 fills bin 0 to 7; batch 2's
    // 5 opens bin 1, the 2 joins it
    val in = MemoryStream[(Long, String)]
    val q = PackBinsStream(in.toDF().toDF("id", "text"), "id", "text",
        nShards = 1, binTokens = 8)
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    def placed(): Map[Long, Long] =
      s.sql("SELECT id, bin FROM pack_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      in.addData(1L -> "a b c", 2L -> "a b c d")
      q.processAllAvailable()
      assert(placed() === Map(1L -> 0L, 2L -> 0L))
      in.addData(3L -> "a b c d e", 4L -> "a b")
      q.processAllAvailable()
      assert(placed() === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L),
        "batch-2 fill must start from the persisted bin state")
    } finally q.stop()
    // parity with the batch operator on the same id-ordered data
    val batch = Corpus.packBins(
        Seq((1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e"), (4L, "a b"))
          .toDF("id", "text"),
        "id", "text", nShards = 1, binTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(batch === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("restart on the same checkpoint resumes the per-shard fill state") {
    val s = spark
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-packbins-").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(Paths.get(in))
    def start() = PackBinsStream(
        s.readStream.schema("id long, text string").json(in),
        "id", "text", nShards = 1, binTokens = 8)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // run 1: tokens 3 + 4 fill bin 0 to 7
    Files.writeString(Paths.get(in, "b1.json"),
      """{"id":1,"text":"a b c"}
        |{"id":2,"text":"a b c d"}""".stripMargin)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // run 2 (fresh query on the same checkpoint): the 5-token doc must
    // see used=7 from the RESTORED state and open bin 1 — a lost state
    // store would restart it at bin 0
    Files.writeString(Paths.get(in, "b2.json"),
      """{"id":3,"text":"a b c d e"}
        |{"id":4,"text":"a b"}""".stripMargin)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val bins = s.read.parquet(out)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    assert(bins === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L),
      s"restored fill state must continue the open bin: $bins")
  }

  test("shards pack independently and state is one pair per shard") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = PackBinsStream(in.toDF().toDF("id", "text"), "id", "text",
        nShards = 2, binTokens = 4)
      .writeStream.format("memory").queryName("pack_stream2")
      .outputMode("append").start()
    try {
      // ids 0,2 → shard 0; ids 1,3 → shard 1; each shard's first two
      // docs share its bin 0 (2+2 <= 4) independently of the other
      in.addData(0L -> "a b", 1L -> "a b", 2L -> "c d", 3L -> "c d")
      q.processAllAvailable()
      val out = s.sql("SELECT id, shard, bin FROM pack_stream2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out === Set((0L, 0L, 0L), (2L, 0L, 0L), (1L, 1L, 0L), (3L, 1L, 0L)))
    } finally q.stop()
  }
}
