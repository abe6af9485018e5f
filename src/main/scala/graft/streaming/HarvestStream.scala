package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tables
import graft.pipeline.StateTable
import graft.xml.XmlProjections

/** Structured Streaming wrapper for the harvest stage (SURVEY §7.1's
  * "Trigger.ProcessingTime wrapper"): an unbounded stream of OAI page
  * documents → P1 header projection → F1 filter → idempotent U1 merge per
  * micro-batch.
  *
  * The page stream arrives as a file source (one page per file — the
  * stand-in for the paginated HTTP source; a DSv2 `MicroBatchStream` over
  * HTTP slots in behind the same DataFrame). Offset tracking, replay and
  * commit-after-write ordering (ST3/ST4) are exactly Structured
  * Streaming's checkpoint contract: a batch that fails mid-merge is
  * replayed, and the merge is idempotent, so state converges —
  * the engine-level equivalent of the reference's
  * "headers before run-result" ordering (`OaiHarvester.java:150-165`).
  *
  * ST6 graceful stop = `StreamingQuery.stop()`.
  */
object HarvestStream {

  /** Start the stream. `trigger` defaults to AvailableNow (drain all
    * pending pages, then stop — the reference's backlog fast-drain); use
    * `Trigger.ProcessingTime("360 seconds")` for the reference's steady
    * 6-minute poll (ST1). */
  /** @param afterBatch invoked after each micro-batch's merge commits
    *        but BEFORE the engine commits the batch — a metrics seam,
    *        and the crash-injection point the recovery spec uses to
    *        prove that a failure in exactly that window replays as an
    *        idempotent no-op merge (ST4). */
  def start(
      spark: SparkSession,
      pagesDir: String,
      checkpointDir: String,
      headersTable: StateTable,
      headerFilter: DataFrame => DataFrame = identity,
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => ()): StreamingQuery = {
    Tables.configure(spark)
    val pages = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(pagesDir)
      .withColumnRenamed("value", "xml")

    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val headers = headerFilter(
          XmlProjections.projectOaiHeaders(batch, col("xml"))
            .select("record_identifier", "datestamp", "set_spec",
              "status_is_deleted"))
        // batch-id marker (scoped to this checkpoint) upgrades
        // foreachBatch's at-least-once replay to effective exactly-once;
        // the merge runs as an atomic read-modify-write. versionCols:
        // AvailableNow drains MANY page files into one batch, so a
        // record re-harvested across pages appears twice with no page
        // order to break the tie — the newest datestamp must win, the
        // same row the batch pipeline's sequential page-by-page merges
        // land on
        headersTable.mergeOnceForBatch(batchId, checkpointDir, headers,
          keys = Seq("record_identifier"), versionCols = Seq("datestamp"))
        afterBatch(batchId)
      }
      .start()
  }
}
