package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline._
import graft.sources.OaiPageSource
import graft.streaming.HarvestStream

/** Streaming crash-recovery end-to-end (ST4 at the streaming layer):
  * a crash in the worst window — AFTER the state merge committed,
  * BEFORE the engine committed the micro-batch — must replay as an
  * idempotent no-op and converge to exactly the batch pipeline's state.
  * Plus the DSv2 `oai-pages` restart guard: single-use resumption
  * tokens mean a restarted query must FAIL FAST with guidance, never
  * silently lose or re-fetch pages. */
class StreamRecoverySpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-recover").toString

  private val qucosaFilter
      : org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    _.filter(graft.functions.GraftFunctions.isQucosaId(col("record_identifier")))

  test("crash between state commit and engine commit replays idempotently and converges to the batch-pipeline state") {
    val dir = tmp()
    val pages = s"$dir/pages"
    Files.createDirectories(Paths.get(pages))
    Files.writeString(Paths.get(pages, "p1.xml"), fixture("/oai/resumptionToken.xml"))

    // the state table is the BUCKETED layout — streaming recovery and
    // bucket-pruned merges must compose
    val headers = new BucketedStateTable(spark, s"$dir/headers",
      keyCols = Seq("record_identifier"), numBuckets = 8,
      retentionFloorMillis = 0L)

    // run 1: drains page 1 cleanly
    HarvestStream.start(spark, pages, s"$dir/ckpt", headers,
      headerFilter = qucosaFilter).awaitTermination()
    assert(headers.read().get.count() == 1L)

    // page 2 arrives; run 2 CRASHES in the worst window — merge already
    // committed, engine batch commit not reached
    Files.writeString(Paths.get(pages, "p2.xml"), fixture("/oai/listIdentifiers.xml"))
    val q2 = HarvestStream.start(spark, pages, s"$dir/ckpt", headers,
      headerFilter = qucosaFilter,
      afterBatch = _ => throw new RuntimeException("injected crash"))
    val crash = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(crash).exists(t =>
      Option(t.getMessage).exists(_.contains("injected crash"))))
    // the merge DID land before the crash (at-least-once writes first)
    assert(headers.read().get.count() == 2L)
    val commitsAfterCrash = headers.lastCommit.get.commitId

    // run 3: healthy restart on the same checkpoint — the engine REPLAYS
    // the uncommitted batch; the batch marker turns the replayed merge
    // into a no-op (no new state commit), and the stream finishes clean
    HarvestStream.start(spark, pages, s"$dir/ckpt", headers,
      headerFilter = qucosaFilter).awaitTermination()
    assert(headers.lastCommit.get.commitId == commitsAfterCrash,
      "replayed batch must not commit a duplicate merge")

    // convergence: state equals the BATCH pipeline over the same pages
    val batchDir = tmp()
    val batchHeaders = new ParquetStateTable(spark, s"$batchDir/headers")
    val runs = new ParquetStateTable(spark, s"$batchDir/runs")
    val p = new HarvestPipeline(spark, batchHeaders, runs, "http://h/oai",
      headerFilter = qucosaFilter)
    val fetch = new PageFetcher {
      def apply(uri: String): Either[String, String] =
        Map(
          "resumptionToken=111111111111111" -> fixture("/oai/listIdentifiers.xml"),
          "metadataPrefix" -> fixture("/oai/resumptionToken.xml"))
          .collectFirst { case (k, v) if uri.contains(k) => v }
          .toRight(s"404 for $uri")
    }
    p.runToCompletion(fetch, Timestamp.valueOf("2024-03-01 10:00:00"), interPageDelayMillis = 0L)

    def snap(t: StateTable): Set[String] =
      t.read().get.orderBy("record_identifier").collect().map(_.toString).toSet
    assert(snap(headers) == snap(batchHeaders))
    assert(snap(headers).size == 2)
  }

  test("oai-pages restart guard: a restarted DSv2 stream fails fast with guidance instead of losing pages") {
    val page1 = fixture("/oai/resumptionToken.xml")
    val page2 = fixture("/oai/listIdentifiers.xml")
    OaiPageSource.registerFetcher("recover-guard", uri =>
      if (uri.contains("resumptionToken=111111111111111")) Some(page2)
      else if (uri.contains("metadataPrefix")) Some(page1)
      else None)
    val dir = tmp()
    val ckpt = s"$dir/ckpt"
    val out = s"$dir/out"

    // parquet sink: supports checkpoint recovery (memory sink does not)
    def start() = spark.readStream.format("oai-pages")
      .option("url", "http://h/oai")
      .option("fetcher", "recover-guard")
      .option("maxPagesPerTrigger", 1)
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1 drains both pages and stops cleanly
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 2L)

    // restart on the same checkpoint: resumption tokens are single-use,
    // so the fresh stream instance cannot seek back into the chain — it
    // must fail fast with the documented guidance, not re-fetch or skip
    val q2 = start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t => Option(t.getMessage)
      .exists(_.contains("resumption tokens are single-use"))),
      s"expected the restart-guard message, got: ${ex.getMessage}")
  }
}
