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

  /** One sampled frame of a (fake-)decoded video payload. */
  case class FrameSample(doc_id: Long, frame_index: Long, frame_bytes: Array[Byte])

  /** One resized image. */
  case class ResizedImage(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB decoder ??? — replace with a real codec binding in production.
    * Deterministic: outputs are pure functions of payload bytes, so the
    * DuckDB oracle can verify the full pipeline. A real decoder would
    * consume the byte arrays exactly the same way. */
  object FakeDecoder {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val n = r.payload.length.toLong
        MediaFeatures(r.doc_id, r.kind, n, n % 512, (n * 7) % 512, n % 30 + 1)
      }

    /** ??? — a real impl decodes frame `idx`; the stub returns a
      * deterministic 64-byte-capped slice. */
    def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte] =
      payload.take(64)

    /** ??? — a real impl rescales pixels; the stub truncates/pads the
      * byte budget of the target resolution. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, math.min(payload.length, w * h))
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

  /** Frame sampling — the 1→N multimodal shape: each payload explodes
    * into every `everyNth`-th frame of its (stub-)decoded stream. Narrow
    * per-partition flatMap; output cardinality is data-dependent, which
    * is exactly why it must run distributed, not on the driver. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyNth: Int = 10): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.flatMap { r =>
        val nFrames = r.payload.length % 30 + 1
        (0 until nFrames by everyNth).iterator.map(i =>
          FrameSample(r.doc_id, i.toLong, FakeDecoder.decodeFrame(r.payload, i)))
      }
    }
  }

  /** Batched resize — same batch shape as [[extractFeatures]], binary →
    * binary. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      width: Int, height: Int, batchSize: Int = 64): Dataset[ResizedImage] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.grouped(batchSize).flatMap(_.map(r =>
        ResizedImage(r.doc_id, width, height,
          FakeDecoder.resize(r.payload, width, height))))
    }
  }
}
