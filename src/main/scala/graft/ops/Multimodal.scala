package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns plus typed metadata, with decode/feature
  * extraction running as a batched per-partition transform (the Scala
  * analog of an Arrow-batched pandas UDF).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — behind [[FakeDecoder]], a deterministic stand-in with the same
  * signature a real decoder would have. The Spark-side plumbing (schema,
  * binary encoding, batch shape, partition-parallel execution) is real and
  * tested.
  */
object Multimodal {

  /** One media record: id + raw bytes + declared kind. */
  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features. For a real decoder these would be pixel/sample
    * stats; the stub derives them deterministically from the byte length
    * so results are verifiable end-to-end. */
  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      fake_width: Long,
      fake_height: Long,
      fake_frames: Long)

  /** STUB decoder ??? — replace with a real codec binding in production.
    * Deterministic: features are pure functions of payload size, so the
    * DuckDB oracle can verify the full pipeline. A real decoder would
    * consume the byte array exactly the same way. */
  object FakeDecoder {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val n = r.payload.length.toLong
        MediaFeatures(r.doc_id, r.kind, n, n % 512, (n * 7) % 512, n % 30 + 1)
      }
  }

  /** Wrap a text table as a fake media table: binary payload + metadata.
    * In production this is `spark.read.format("binaryFile")` or a parquet
    * table with a binary column. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched per-partition decode: iterator grouped into codec-friendly
    * batches (mirroring Arrow record-batch shape), each batch decoded as a
    * unit. Runs embarrassingly parallel across partitions — the 100 TB
    * plan is scan → this narrow map → sink, with partition count sized by
    * `spark.sql.files.maxPartitionBytes`. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.grouped(batchSize).flatMap(b => FakeDecoder.decodeBatch(b.toSeq))
    }
  }
}
