package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Sketches
import graft.pipeline.MgSummaryStore
import graft.streaming.HotTokensStream

/** Streaming vocabulary monitor: totals accumulate across micro-batches,
  * a planted hot token survives the merged summary (the union-stream
  * superset guarantee), and a replayed batch id is a marker-guarded
  * no-op — the non-idempotent sketch merge must not double-count. */
class HotTokensStreamSpec extends SparkSpec {

  test("summary accumulates across batches; hot token survives; replay cannot double-count") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = Files.createTempDirectory("graft-hot").toString
    val store = new MgSummaryStore(spark, s"$root/summary")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = HotTokensStream.start(
      in.toDF().toDF("doc_id", "text"), store, s"$root/ck", col("text"),
      k = 8, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // batch 1: 30 "hot" among 20 tail tokens; batch 2: 30 more hot
      in.addData(1L -> (Seq.fill(30)("hot") ++ (0 until 20).map(i => s"t$i"))
        .mkString(" "))
      q.processAllAvailable()
      val s1 = store.read().get
      assert(s1.total == 50L)
      in.addData(2L -> (Seq.fill(30)("hot") ++ (20 until 40).map(i => s"t$i"))
        .mkString(" "))
      q.processAllAvailable()
      val s2 = store.read().get
      assert(s2.total == 100L, s"total ${s2.total}")
      // hot: true count 60 > 100/(8+1) -> guaranteed present
      assert(s2.items.contains("hot"), s"hot lost: ${s2.items.mkString(",")}")
      // and its weight can never exceed the true count (MG never overcounts)
      assert(s2.weights(s2.items.indexOf("hot")) <= 60L)
    } finally q.stop()

    // replay batch id 1 by hand: marker-guarded, nothing changes
    val before = store.read().get
    val ran = store.updateOnceForBatch(1L, s"$root/ck") { prev =>
      Sketches.mergeSummaries(prev.get,
        Sketches.MgSummary(999L, Array("bogus"), Array(999L)), 8)
    }
    assert(!ran, "replayed batch must not run the update")
    val after = store.read().get
    assert(after.total == before.total &&
      after.items.sameElements(before.items))
  }
}
