package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Similarity
import graft.pipeline.BucketedStateTable

/** Structured Streaming face of [[graft.ops.Similarity.indexIvf]]: an
  * unbounded stream of embeddings → per-micro-batch nearest-centroid
  * assignment (narrow literal-argmax map) → keyed merge into the
  * persistent IVF index. Completes the pattern that every incremental
  * state operator has a streaming twin (exact dedup in
  * `IncrementalDedupSpec`, near-dup in [[NearDupStream]], harvest in
  * [[HarvestStream]]).
  *
  * Delivery: `foreachBatch` is at-least-once; the index merge is keyed
  * on `(centroid_id, vec_id)`, so a replayed batch is a no-op and state
  * converges without a batch marker. Probes ([[graft.ops.Similarity
  * .probeIvf]]) run against whatever commit is current — a vector is
  * searchable as soon as its batch commits, the
  * freshness-over-rebuild property that distinguishes an ingest stream
  * from nightly index rebuilds.
  *
  * 100 TB: per batch the work is one narrow map over the batch plus a
  * merge that rewrites only the buckets the batch's centroid
  * assignments hash into — batch-proportional, never index-
  * proportional. Centroids are fixed at stream start (they define the
  * list geometry; re-centroiding is an offline index rebuild, as with
  * any IVF system).
  */
object IvfIngestStream {

  /** Start the ingest stream over `batches` (a streaming DataFrame
    * carrying `idCol` and `vecCol`). `centroids` must be the ones the
    * index was built with ([[graft.ops.Similarity.sampleCentroids]] /
    * [[graft.ops.Similarity.refineCentroids]]). */
  def start(
      batches: DataFrame,
      index: BucketedStateTable,
      centroids: Seq[Seq[Double]],
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => ()): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.indexIvf(index, batch, idCol, vecCol, centroids)
        afterBatch(batchId)
      }
      .start()
}
