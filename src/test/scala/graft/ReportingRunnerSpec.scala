package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.pipeline._

/** End-to-end deployment wiring: config layering, both loops over one
  * shared queue, wait policies, graceful stop. */
class ReportingRunnerSpec extends SparkSpec {

  test("config: three-layer precedence — defaults < file < system properties") {
    val f = Files.createTempFile("graft-conf", ".properties")
    Files.writeString(f, "oai.pollseconds=10\nmets.url=http://file-layer/mets\n")
    val cfg = ReportingConfig.load(
      defaultsFile = Some(f),
      systemProperties = Map("oai.pollseconds" -> "5", "ignored.key" -> "x"))
    assert(cfg.oaiPollSeconds == 5L)                  // system wins
    assert(cfg.metsUrl == "http://file-layer/mets")   // file beats defaults
    assert(cfg.metsPollSeconds == 600L)               // untouched default
    assert(cfg.fc3CompatibilityMode)
  }

  test("runner: two loops drain OAI pages into reporting rows, then stop cleanly") {
    driveRunner(bucketed = false)
  }

  test("runner: state.bucketed=true swaps in bucket-pruned tables, same end state") {
    driveRunner(bucketed = true)
  }

  private def driveRunner(bucketed: Boolean): Unit = {
    val root = Files.createTempDirectory("graft-runner").toString
    val cfg = ReportingConfig.fromMap(Map(
      "oai.url" -> "http://h/oai",
      "oai.pollseconds" -> "1",
      "mets.pollseconds" -> "1",
      "state.bucketed" -> bucketed.toString,
      "state.buckets" -> "8"))
    if (bucketed) assert(cfg.stateBucketed && cfg.stateBuckets == 8)

    val pages = new PageFetcher {
      def apply(uri: String): Either[String, String] =
        Right(fixture("/oai/listIdentifiers.xml")) // 2 headers, no token
    }
    val mets = Map(
      "qucosa:1044" -> fixture("/mets/qucosa7455-mets.xml"),
      "qucosa:1234" -> fixture("/mets/qucosa13-mets.xml"))
    val docs = new DocumentFetcher {
      def apply(localId: String): Option[String] = mets.get(localId)
    }

    val sleeps = new ConcurrentLinkedQueue[Long]()
    val runner = new ReportingRunner(spark, cfg, root, pages, docs,
      headerFilter = (df: DataFrame) =>
        df.filter(isQucosaId(col("record_identifier"))),
      sleeper = ms => { sleeps.add(ms); Thread.sleep(math.min(ms, 20L)) })

    val threads = runner.start()
    var n = 0L
    try {
      // wait (bounded) until the enrichment stage produced both rows
      val deadline = System.currentTimeMillis() + 120000L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200L)
        // a concurrent commit may prune the version between list and
        // count — retry on the next poll rather than failing the test
        n = scala.util.Try(
          runner.reportingTable.read().map(_.count()).getOrElse(0L)).getOrElse(n)
      }
    } finally {
      assert(runner.stopAndAwait(threads, graceMillis = 30000L)) // ST6
    }
    assert(!runner.isRunning)
    // assertions run against QUIESCED tables (no more concurrent pruning)
    assert(n == 2L, s"reporting rows after drain: $n")
    assert(runner.harvest.lastRun().id >= 1L)
    // golden check: enrichment projected the right reporting fields
    val byId = runner.reportingTable.read().get.collect()
      .map(r => r.getAs[String]("record_identifier") ->
        r.getAs[String]("mandator")).toMap
    assert(byId("oai:example.org:qucosa:1044") == "slub")
    assert(byId("oai:example.org:qucosa:1234") == "SLUB")
  }
}
