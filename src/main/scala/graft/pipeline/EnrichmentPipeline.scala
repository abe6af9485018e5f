package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.StateOps
import graft.xml.XmlProjections

/** One queued header as drained from the headers state (§1.2). */
case class QueuedHeader(
    record_identifier: String,
    datestamp: Timestamp,
    set_spec: Seq[String],
    status_is_deleted: Boolean)

private[pipeline] case class FetchedHeader(
    record_identifier: String,
    datestamp: Timestamp,
    set_spec: Seq[String],
    status_is_deleted: Boolean,
    mets_xml: String)

/** Pluggable per-record document transport: local id (`qucosa:7455`) →
  * METS XML body, None on 404/empty (reference
  * `MetsProcessor.java:165-187`). Must be serializable — it runs inside
  * `mapPartitions` on executors; a production implementation builds its
  * HTTP client lazily per partition. */
trait DocumentFetcher extends (String => Option[String]) with Serializable

/** Result of one enrichment iteration. */
case class EnrichmentSummary(
    processed: Long,
    reported: Long,
    rejected: Long,
    notRemoved: Long)

/** The enrichment stage (SURVEY §3.3) re-expressed Spark-first: one
  * iteration = `drain batch (L1) → per-record METS fetch (S2, partition-
  * parallel) → project (P4) → validate (F2) → merge reporting docs (U2) →
  * optimistic queue delete (D1)`.
  *
  * Reference semantics preserved:
  *  - EVERY drained header is treated as processed — fetch failures and
  *    incomplete METS documents are dropped from the reporting output but
  *    their queue rows are still cleared (`MetsProcessor.java:126-147`,
  *    test `MetsProcessorTest.java:218-254`);
  *  - the queue delete is full-tuple conditional (ST5): a header
  *    re-harvested mid-flight survives, and the survivor set is reported
  *    (`PersistenceService.java:72-86`);
  *  - reporting merge and queue delete are separate commits — replay
  *    after a crash between them is safe because the merge is idempotent
  *    (`MetsProcessor.java:148-156`).
  */
class EnrichmentPipeline(
    spark: SparkSession,
    headersTable: ParquetStateTable,
    reportingTable: ParquetStateTable,
    batchSize: Int = 100) extends Serializable {
  // Serializable so shell/notebook-defined fetchers (anonymous classes
  // whose $outer drags this instance into the task closure) still ship.

  import spark.implicits._

  Tables.configure(spark)

  def runOnce(fetch: DocumentFetcher): EnrichmentSummary =
    headersTable.read() match {
      case None        => EnrichmentSummary(0, 0, 0, 0)
      case Some(queue) => drain(queue, fetch)
    }

  /** Drain the whole backlog: iterate batches while the queue yields
    * rows (the reference's `moreOAIHeadersToProcess` fast-drain,
    * `MetsProcessor.java:108-116,260-268`). */
  def runToCompletion(fetch: DocumentFetcher, maxBatches: Int = 1000): Seq[EnrichmentSummary] = {
    val out = Seq.newBuilder[EnrichmentSummary]
    var batches = 0
    var continue = true
    while (continue && batches < maxBatches) {
      val s = runOnce(fetch)
      out += s
      batches += 1
      continue = s.processed > 0
    }
    out.result()
  }

  private def drain(queue: DataFrame, fetch: DocumentFetcher): EnrichmentSummary = {

    // L1 — bounded drain. The reference takes an arbitrary 100; we order
    // by key so runs are deterministic.
    val batch = StateOps.limitBatch(
      queue.orderBy(col("record_identifier")), batchSize).as[QueuedHeader]

    // S2 — per-record enrichment fetch, parallel across partitions.
    // Persisted so the downstream merge + delete don't re-trigger the
    // remote fetch (one HTTP call per record per drain).
    val fetched = batch.mapPartitions { it =>
      it.map { h =>
        val xml = fetch(OaiRequestBuilder.localIdentifier(h.record_identifier))
        FetchedHeader(h.record_identifier, h.datestamp, h.set_spec,
          h.status_is_deleted, xml.orNull)
      }
    }.toDF().persist()

    // P4 projection + F2 validation → reporting rows. Null XML (fetch
    // miss) nulls every projected field, so F2 drops it.
    val projected = XmlProjections.projectMets(fetched, col("mets_xml"))
      .withColumn("header_last_modified", col("datestamp"))
    val reportingRows = XmlProjections.validateReportingRow(projected)
      .select("record_identifier", "mandator", "document_type",
        "distribution_date", "header_last_modified")

    val processed = fetched.count()
    val reported = reportingRows.count()

    // U2 — idempotent keyed merge into the reporting table.
    reportingTable.write(StateOps.mergeByKey(
      reportingTable.readOrEmpty(reportingRows), reportingRows,
      keys = Seq("record_identifier")))

    // D1 — optimistic full-tuple delete of exactly the drained rows.
    val processedHeaders = fetched.select(queue.columns.map(col).toSeq: _*)
    val delete = StateOps.deleteIfUnmodified(queue, processedHeaders)
    val notRemoved = delete.notRemoved.count()
    headersTable.write(delete.newState)
    fetched.unpersist()

    EnrichmentSummary(processed, reported, processed - reported, notRemoved)
  }
}
