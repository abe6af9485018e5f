package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.TextAnalysis
import graft.pipeline.BucketedStateTable

/** Structured Streaming twin of
  * [[graft.ops.TextAnalysis.indexPostings]] — the retrieval member of
  * the one-streaming-face-per-incremental-op family ([[NearDupStream]],
  * [[EmbedNearDupStream]], [[IvfIngestStream]], [[PairNearDupStream]]):
  * each micro-batch of documents tokenizes, aggregates (term, doc_id)
  * postings, and merges into the persistent term-bucketed postings
  * index plus the (doc_id, dl) length table. Queries run any time via
  * [[graft.ops.TextAnalysis.incrementalBm25TopK]] and see exactly the
  * corpus ingested so far.
  *
  * Delivery: at-least-once `foreachBatch` + keyed merges only
  * (postings on `(term, doc_id)`, lengths on the id) — a replayed
  * micro-batch recomputes identical rows and every merge is a no-op;
  * no accumulator rows exist to double-count (N and avgdl derive from
  * the keyed length table).
  *
  * 100 TB: per batch a narrow tokenize + one map-side-combined
  * aggregate; the merges rewrite only the buckets the batch's terms
  * and ids hash into — ingest cost is batch-proportional while the
  * index grows to corpus scale. */
object PostingsStream {

  /** Start the stream over `batches` (a streaming DataFrame carrying
    * `idCol` + `textCol`; ids unique across index ∪ stream). Wire a
    * `stats` table to maintain the running (n_docs, sum_dl) row that
    * frees [[graft.ops.TextAnalysis.incrementalBm25TopK]] queries from
    * the per-query corpus aggregate — the row is ANCHORED to the
    * docLengths commit it reflects and maintained from the table's own
    * change feed, so at-least-once delivery needs no extra guard: a
    * replayed batch diffs to zero, and a crash between an ingest's
    * lengths and stats commits heals on the next ingest (or in-memory
    * at query time) by folding the missed window from the feed. */
  def start(
      batches: DataFrame,
      postings: BucketedStateTable,
      docLengths: BucketedStateTable,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => (),
      stats: Option[BucketedStateTable] = None): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextAnalysis.indexPostings(postings, docLengths, batch,
          idCol, textCol, stats)
        afterBatch(batchId)
      }
      .start()
}
