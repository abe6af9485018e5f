package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns plus typed metadata, with decode/feature
  * extraction running as a batched per-partition transform (the Scala
  * analog of an Arrow-batched pandas UDF).
  *
  * Decoding is pluggable via [[Multimodal.MediaDecoder]]:
  *  - [[Multimodal.ImageIoDecoder]] is a REAL image decoder bound to the
  *    JDK's `javax.imageio` (PNG/JPEG/GIF/BMP — no external codec
  *    needed), used for genuine image payloads;
  *  - [[Multimodal.FakeDecoder]] is the deterministic stand-in for the
  *    synthetic test corpus (text bytes are not decodable images), kept
  *    so the driver's DuckDB oracle can verify the full pipeline
  *    end-to-end.
  * Both satisfy the same contract (`MultimodalSpec`'s decoder-contract
  * tests), so swapping in a production codec is a one-line change.
  */
object Multimodal {

  /** One media record: id + raw bytes + declared kind. */
  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features. A real decoder reports pixel dimensions and
    * frame counts; the stub derives them deterministically from the byte
    * length so results are verifiable end-to-end. */
  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      fake_width: Long,
      fake_height: Long,
      fake_frames: Long)

  /** One sampled frame of a decoded video/animation payload. */
  case class FrameSample(doc_id: Long, frame_index: Long, frame_bytes: Array[Byte])

  /** One resized image. */
  case class ResizedImage(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** The decode contract every codec binding implements. Runs on
    * executors inside `mapPartitions` — implementations must be
    * serializable and stateless (or build state lazily per partition).
    * Undecodable payloads are DROPPED from `decodeBatch` output (the
    * F2-style validate-and-drop discipline), and yield 0 from
    * [[frameCount]] / empty bytes from the per-frame calls. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
    def frameCount(payload: Array[Byte]): Int
    def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte]
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]

    /** Every `everyNth`-th frame as (index, bytes). The default composes
      * [[frameCount]] + [[decodeFrame]] — fine for single-frame formats
      * and opaque stubs — but each `decodeFrame` call opens a fresh
      * decode session and may re-parse preceding frames, O(frames²/
      * everyNth) on a long animation; a multi-frame decoder should
      * override to decode ONCE per payload ([[ImageIoDecoder]] does). */
    def sampledFrames(payload: Array[Byte],
        everyNth: Int): Iterator[(Int, Array[Byte])] = {
      val n = frameCount(payload)
      (0 until n by math.max(everyNth, 1)).iterator
        .map(i => i -> decodeFrame(payload, i))
    }
  }

  /** Deterministic stub decoder for non-image payloads (the synthetic
    * corpus): outputs are pure functions of payload bytes, so the DuckDB
    * oracle can verify the full pipeline. A real decoder consumes the
    * byte arrays exactly the same way. */
  object FakeDecoder extends MediaDecoder {
    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      // a NULL payload (encode(NULL) upstream) is undecodable: DROP per
      // the contract, never NPE the task
      batch.filter(_.payload != null).map { r =>
        val n = r.payload.length.toLong
        MediaFeatures(r.doc_id, r.kind, n, n % 512, (n * 7) % 512, n % 30 + 1)
      }

    override def frameCount(payload: Array[Byte]): Int =
      if (payload == null) 0 else payload.length % 30 + 1

    /** Deterministic 64-byte-capped slice standing in for frame `idx`. */
    override def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte] =
      if (payload == null) Array.emptyByteArray else payload.take(64)

    /** Truncates/pads to the byte budget of the target resolution. */
    override def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (payload == null) Array.emptyByteArray
      else java.util.Arrays.copyOf(payload, math.min(payload.length, w * h))
  }

  /** REAL image decoder over the JDK's `javax.imageio` (PNG, JPEG, GIF,
    * BMP readers ship with Java SE — zero external dependencies).
    * Features carry true pixel dimensions; GIF animations report their
    * real frame count; `decodeFrame` re-encodes the requested frame as
    * PNG; `resize` is a bilinear raster rescale re-encoded as PNG.
    * Undecodable payloads are dropped (decodeBatch) / empty (frames). */
  object ImageIoDecoder extends MediaDecoder {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    private def withReader[A](payload: Array[Byte])(
        f: javax.imageio.ImageReader => A): Option[A] = {
      if (payload == null) return None // undecodable: drop, never NPE
      // createImageInputStream is itself fallible: it spills to a disk
      // cache by default (IOException on a full/unwritable tmp dir) and
      // returns NULL when no stream SPI matches — both are "this payload
      // is undecodable HERE", not a reason to fail the whole stage
      val in =
        try ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (in == null) return None
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(in); Some(f(r)) }
          catch { case _: Exception => None }
          finally r.dispose()
        }
      } finally in.close()
    }

    private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.flatMap { r =>
        withReader(r.payload) { rd =>
          MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong,
            rd.getWidth(0).toLong, rd.getHeight(0).toLong,
            math.max(rd.getNumImages(true), 1).toLong)
        }
      }

    override def frameCount(payload: Array[Byte]): Int =
      withReader(payload)(rd => math.max(rd.getNumImages(true), 1)).getOrElse(0)

    override def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte] =
      withReader(payload)(rd => encodePng(rd.read(idx)))
        .getOrElse(Array.emptyByteArray)

    /** ONE decode session per payload: a single reader serves every
      * sampled frame (the default would rebuild stream+reader per frame
      * and re-parse preceding frames each call — O(frames²/everyNth) on
      * a long GIF). A frame that fails to decode is skipped, same
      * drop-not-crash contract as the rest of the decoder. */
    override def sampledFrames(payload: Array[Byte],
        everyNth: Int): Iterator[(Int, Array[Byte])] =
      withReader(payload) { rd =>
        val n = math.max(rd.getNumImages(true), 1)
        (0 until n by math.max(everyNth, 1)).flatMap { i =>
          try Some(i -> encodePng(rd.read(i)))
          catch { case _: Exception => None }
        }
      }.getOrElse(Seq.empty).iterator

    override def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = try ImageIO.read(new ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) Array.emptyByteArray
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        encodePng(dst)
      }
    }
  }

  /** Decoded audio features: container metadata + one signal statistic
    * (RMS over normalized samples — the level/silence screen an audio
    * curation pipeline filters on). */
  case class AudioFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      sample_rate: Double,
      channels: Int,
      n_frames: Long,
      duration_sec: Double,
      rms: Double)

  /** Audio decode contract — same discipline as [[MediaDecoder]]:
    * executor-side, serializable, undecodable payloads DROPPED. */
  trait AudioDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[AudioFeatures]
  }

  /** REAL WAV decoder over the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * readers ship with Java SE — zero external dependencies, the audio
    * analogue of [[ImageIoDecoder]]). Reports the container's true
    * sample rate / channel count / frame length, duration from frames ÷
    * frame rate, and RMS over all interleaved PCM samples normalized to
    * [-1, 1] (16-bit signed, 8-bit signed, and 8-bit unsigned PCM — WAV's
    * canonical 8-bit form IS unsigned, so the branch is picked on
    * (encoding, bits), not bit width alone; any other encoding reports
    * NaN rather than a wrong number). Non-audio payloads are dropped. */
  object WavDecoder extends AudioDecoder {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    override def decodeBatch(batch: Seq[MediaRecord]): Seq[AudioFeatures] =
      batch.flatMap { r =>
        try {
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val f = ais.getFormat
            val nFrames = ais.getFrameLength
            val data = ais.readAllBytes()
            val rms = (f.getEncoding, f.getSampleSizeInBits) match {
              case (AudioFormat.Encoding.PCM_SIGNED, 16) =>
                val bb = java.nio.ByteBuffer.wrap(data).order(
                  if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                  else java.nio.ByteOrder.LITTLE_ENDIAN)
                var sum = 0.0; var n = 0L
                while (bb.remaining() >= 2) {
                  val v = bb.getShort / 32767.0; sum += v * v; n += 1
                }
                if (n == 0) 0.0 else math.sqrt(sum / n)
              case (AudioFormat.Encoding.PCM_SIGNED, 8) =>
                var sum = 0.0
                data.foreach { b => val v = b / 127.0; sum += v * v }
                if (data.isEmpty) 0.0 else math.sqrt(sum / data.length)
              case (AudioFormat.Encoding.PCM_UNSIGNED, 8) =>
                // WAV's native 8-bit form: 0..255 with silence at 128.
                var sum = 0.0
                data.foreach { b => val v = ((b & 0xff) - 128) / 127.0; sum += v * v }
                if (data.isEmpty) 0.0 else math.sqrt(sum / data.length)
              case _ => Double.NaN
            }
            Some(AudioFeatures(r.doc_id, r.kind, r.payload.length.toLong,
              f.getSampleRate.toDouble, f.getChannels, nFrames,
              nFrames / f.getFrameRate.toDouble, rms))
          } finally ais.close()
        } catch { case _: Exception => None }
      }
  }

  /** Deterministic mono 16-bit PCM WAV payload: `nSamples` of a
    * ±`amplitude` square wave at `sampleRate` — a REAL RIFF/WAVE byte
    * stream (written by `AudioSystem`, decoded back by [[WavDecoder]])
    * whose features are closed-form: duration = nSamples/sampleRate,
    * RMS = amplitude/32767. The planted payload the audio oracle query
    * round-trips. */
  def syntheticWav(nSamples: Int, amplitude: Short, sampleRate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nSamples) {
      bb.putShort(if (i % 2 == 0) amplitude else (-amplitude).toShort)
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Batched per-partition audio decode — identical plumbing to
    * [[extractFeatures]] (scan → narrow batched map → sink; no shuffle,
    * partition count from `maxPartitionBytes`). */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64,
      decoder: AudioDecoder = WavDecoder): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.grouped(batchSize).flatMap(b => decoder.decodeBatch(b.toSeq))
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
      batchSize: Int = 64,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.grouped(batchSize).flatMap(b => decoder.decodeBatch(b.toSeq))
    }
  }

  /** Frame sampling — the 1→N multimodal shape: each payload explodes
    * into every `everyNth`-th frame of its decoded stream. Narrow
    * per-partition flatMap; output cardinality is data-dependent, which
    * is exactly why it must run distributed, not on the driver. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyNth: Int = 10,
      decoder: MediaDecoder = FakeDecoder): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.flatMap { r =>
        decoder.sampledFrames(r.payload, everyNth).map { case (i, bytes) =>
          FrameSample(r.doc_id, i.toLong, bytes)
        }
      }
    }
  }

  /** Batched resize — same batch shape as [[extractFeatures]], binary →
    * binary. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      width: Int, height: Int, batchSize: Int = 64,
      decoder: MediaDecoder = FakeDecoder): Dataset[ResizedImage] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.grouped(batchSize).flatMap(_.map(r =>
        ResizedImage(r.doc_id, width, height,
          decoder.resize(r.payload, width, height))))
    }
  }

  // ── Perceptual image hashing / near-dup ──────────────────────────────

  /** One hashed image. */
  case class ImageHash(doc_id: Long, phash: Long)

  /** ITU-R BT.601 luma of a packed RGB int. */
  private def luma(rgb: Int): Double =
    0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)

  /** 64-bit difference hash (dHash) of an encoded image: decode
    * (`javax.imageio`), bilinear-downsample to 9x8 grayscale, then bit
    * i = y*8+x set iff luma(x+1, y) > luma(x, y) — the standard
    * horizontal-gradient perceptual hash (public algorithm; robust to
    * re-encode/resize, brittle to crops by design). None for
    * undecodable payloads (the validate-and-drop discipline). */
  def dHash64(payload: Array[Byte]): Option[Long] = {
    val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val dst = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 9, 8, null)
      } finally g.dispose()
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(dst.getRGB(x + 1, y)) > luma(dst.getRGB(x, y)))
            bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Some(bits)
    }
  }

  /** Deterministic 9x8 grayscale PNG whose [[dHash64]] is EXACTLY `v` —
    * the planted fixture the image-dedup oracle query round-trips (the
    * image analogue of [[syntheticWav]]'s closed-form RMS). Per row the
    * pixel walk starts at 128 and steps +-8 per bit (range 64..192), so
    * every horizontal comparison is strict and the hash is recovered
    * bit-for-bit through the real PNG encode -> ImageIO decode ->
    * bilinear 9x8 resample path (identity at equal size). */
  def plantedImage(v: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var p = 128
      img.setRGB(0, y, (p << 16) | (p << 8) | p)
      var x = 0
      while (x < 8) {
        p = if (((v >>> (y * 8 + x)) & 1L) == 1L) p + 8 else p - 8
        img.setRGB(x + 1, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Batched per-partition dHash — the same scan → narrow map plumbing
    * as [[extractFeatures]]; undecodable payloads drop. */
  def imageHashes(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[ImageHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.grouped(batchSize).flatMap(_.flatMap(r =>
        dHash64(r.payload).map(h => ImageHash(r.doc_id, h))))
    }
  }

  /** Perceptual near-duplicate image pairs — the multimodal-corpus
    * cleaning step (re-encoded / slightly-recompressed copies of the
    * same picture): dHash each payload, then band the 64-bit hashes
    * through [[graft.ops.Dedup.bandPairs64]] (the SimHash banding shape
    * — candidates only ever form inside a (band, band-bits) bucket,
    * never all-pairs) and keep candidates at Hamming <= `maxHamming`.
    * The Hamming cut IS the exact verification: it runs on the full
    * 64-bit hash of each candidate, not on band bits.
    *
    * Deterministic recall for `maxHamming < bands` by the pigeonhole
    * guarantee — near-identical images (re-encodes: hamming 0) are
    * always found. 100 TB: decode is a narrow batched map; pairing
    * shuffles (band, bucket) keys whose occupancy a production corpus
    * spreads by hash (a pathological single-bucket corpus degrades the
    * same way text SimHash does, and the same maxDocFreq-style cap
    * applies if needed). */
  def imageNearDups(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, bands: Int = 4,
      batchSize: Int = 64): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming ($maxHamming) must stay below bands ($bands) for deterministic recall")
    // eager localCheckpoint: the banded SELF-join below reads the hashed
    // frame once per side, so an unmaterialized lineage would run the
    // ImageIO decode of every payload TWICE (decode dominates on a real
    // image corpus); the checkpointed frame is (id, hash) — tiny. Same
    // loud-on-executor-loss stance as incrementalNearDups' checkpoint.
    val hashed = imageHashes(spark, media, batchSize).toDF().localCheckpoint(true)
    Dedup.bandPairs64(hashed, "doc_id", "phash", bands)
      .filter(col("hamming") <= maxHamming)
  }

  /** One image–text pair awaiting cross-modal dedup: id + encoded image
    * bytes + caption embedding. */
  case class PairRecord(pair_id: Long, payload: Array[Byte],
      embedding: Array[Float])

  /** Cross-modal near-duplicate detection for image–TEXT pairs — the
    * multimodal-corpus analog of document near-dup: a pair duplicates
    * another when BOTH modalities agree, i.e. the images are perceptual
    * near-dups (dHash Hamming <= `maxHamming`; catches re-encodes and
    * recompressions) AND the captions are semantic near-dups (embedding
    * cosine >= `cosThreshold`; catches paraphrases). Either modality
    * alone is not a duplicate: the same stock photo under genuinely
    * different captions is two training examples, and the same caption
    * on different images likewise.
    *
    * Candidate generation blocks on the IMAGE leg only —
    * [[imageNearDups]]' banded dHash join, deterministic-complete for
    * `maxHamming < bands` by pigeonhole — because the conjunction lets
    * the cheaper, exactly-blockable modality prune for both: any pair
    * the image bands miss has image Hamming > maxHamming and fails the
    * AND regardless of its captions. The caption leg then runs as an
    * exact verify over the surviving candidates: two keyed equi-joins
    * fetch each side's embedding and the fused cosine kernel
    * ([[graft.ops.Similarity.cosine]]) filters — never an
    * embedding-space candidate search, and never all-pairs.
    *
    * 100 TB: decode+hash is a narrow batched map over the pair scan;
    * banding shuffles (band, bits) keys; the verify joins shuffle only
    * candidate ids against the (id, embedding) projection — candidates
    * post-blocking are a vanishing fraction of the corpus, so AQE
    * broadcast-promotes that side when small. Hamming and cosine both
    * ride in the output for downstream threshold audits. */
  def pairNearDups(spark: SparkSession, pairs: DataFrame,
      idCol: String = "pair_id", payloadCol: String = "payload",
      embCol: String = "embedding",
      maxHamming: Int = 3, bands: Int = 4, cosThreshold: Double = 0.95,
      batchSize: Int = 64): DataFrame = {
    val media = pairs.select(col(idCol).as("doc_id"),
      lit("image").as("kind"), col(payloadCol).as("payload"))
    val candidates =
      imageNearDups(spark, media, maxHamming, bands, batchSize)
    val emb = pairs.select(col(idCol).as("__eid"), col(embCol).as("__ev"))
    candidates
      .join(emb.select(col("__eid").as("a_id"), col("__ev").as("__va")),
        Seq("a_id"))
      .join(emb.select(col("__eid").as("b_id"), col("__ev").as("__vb")),
        Seq("b_id"))
      .withColumn("cos_sim", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("cos_sim") >= cosThreshold)
      .select(col("a_id"), col("b_id"), col("hamming"), col("cos_sim"))
  }

  /** Banded index rows of an image–text pair batch: one row per
    * (dHash band, band bits) per pair, carrying the full hash AND the
    * caption embedding so an incremental probe verifies BOTH modalities
    * from the index slice alone — no second lookup into the corpus. */
  private def pairBandRows(spark: SparkSession, pairs: DataFrame,
      idCol: String, payloadCol: String, embCol: String,
      bands: Int, batchSize: Int): DataFrame = {
    val media = pairs.select(col(idCol).as("doc_id"),
      lit("image").as("kind"), col(payloadCol).as("payload"))
    val hashed = imageHashes(spark, media, batchSize).toDF()
    val emb = pairs.select(col(idCol).as("doc_id"), col(embCol).as("embedding"))
    // band keys come from the ONE shared slicer ([[Dedup.bandSlices64]])
    // — the incremental index only collides with the batch path's
    // candidates while both compute bit-identical (band, bh) keys
    hashed.join(emb, Seq("doc_id"))
      .select(col("doc_id").as("pair_id"), col("phash"), col("embedding"),
        explode(Dedup.bandSlices64(col("phash"), bands)).as("__b"))
      .select(col("__b.band").as("band"), col("__b.bh").as("bh"),
        col("pair_id"), col("phash"), col("embedding"))
  }

  /** Index an image–text pair corpus for [[incrementalPairNearDups]]:
    * banded dHash rows (hash + caption embedding as payload) into a
    * [[graft.pipeline.BucketedStateTable]] keyed
    * `(band, bh, pair_id)` and BUCKETED by `(band, bh)`, so a probe
    * that knows only its band keys is bucket-pruned — the cross-modal
    * twin of [[graft.ops.Dedup.indexEmbeddings]]. */
  def indexPairs(index: graft.pipeline.BucketedStateTable,
      pairs: DataFrame,
      idCol: String = "pair_id", payloadCol: String = "payload",
      embCol: String = "embedding",
      bands: Int = 4, batchSize: Int = 64): Unit = {
    // persisted around the merge: merge evaluates its updates twice
    // (dirty-bucket probe + bucket write), and an unpersisted lineage
    // would decode every image payload twice per ingest
    val rows = pairBandRows(SparkSession.active, pairs, idCol, payloadCol,
        embCol, bands, batchSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try index.merge(rows, keys = Seq("band", "bh", "pair_id"))
    finally rows.unpersist()
  }

  /** Incremental cross-modal pair dedup: every pair-of-pairs meeting
    * BOTH thresholds (image dHash Hamming <= `maxHamming` AND caption
    * cosine >= `cosThreshold`) with at least one side in `batch`,
    * against a corpus indexed by [[indexPairs]] — then the batch joins
    * the index. Same contract as
    * [[graft.ops.Dedup.incrementalEmbeddingNearDups]]: the probe reads
    * ONLY the index buckets the batch's band keys hash into, the slice
    * is pinned before the merge, candidates are batch-proportional
    * (hot band buckets go through the bounded bipartite decomposition),
    * and replaying an ingested batch re-emits the same pairs over an
    * unchanged index (keyed merge — at-least-once safe). Returns
    * `(a_id, b_id, hamming, cos_sim)` with a_id < b_id. */
  def incrementalPairNearDups(index: graft.pipeline.BucketedStateTable,
      batch: DataFrame,
      idCol: String = "pair_id", payloadCol: String = "payload",
      embCol: String = "embedding",
      maxHamming: Int = 3, bands: Int = 4, cosThreshold: Double = 0.95,
      batchSize: Int = 64, maxBucketSize: Int = 4096): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming ($maxHamming) must stay below bands ($bands) for deterministic recall")
    val spark = SparkSession.active
    // ONE decode+hash pass: the persisted band rows carry the full hash
    // AND the caption embedding, so every leg below (cross probe, intra
    // pairing, index merge) reads this cache — the batch's upstream
    // lineage and the image decode both run exactly once per batch.
    // persisted, NOT eagerly counted: the first action over b is the
    // bucket probe inside readForKeys below, which materializes the pin
    // (one decode pass) — a count() here was an extra cache scan
    val b = pairBandRows(spark, batch, idCol, payloadCol, embCol,
        bands, batchSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val (slice0, probedDirty) =
      index.readForKeysProbed(b.select(col("band"), col("bh")), b.limit(0))
    val slice = slice0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // ONE occupancy action answers the cross AND intra hot-bucket
    // decisions (both sides of intra are b) — and doubles as the slice
    // pin's materialization pass
    val occ = Dedup.occupancyMax(Seq(
      ("b", b, Seq("band", "bh")), ("slice", slice, Seq("band", "bh"))))
    val cross = Dedup.bipartiteJoinPre(
        b.select(col("band"), col("bh"), col("pair_id").as("__nid"),
          col("phash").as("__nh"), col("embedding").as("__nv")),
        "__nid", occ("b"),
        slice.select(col("band"), col("bh"), col("pair_id").as("__oid"),
          col("phash").as("__oh"), col("embedding").as("__ov")),
        "__oid", occ("slice"),
        keys = Seq("band", "bh"), maxBucketSize = maxBucketSize)
      .filter(col("__oid") =!= col("__nid"))
      .select(least(col("__oid"), col("__nid")).as("a_id"),
        greatest(col("__oid"), col("__nid")).as("b_id"),
        bit_count(col("__nh").bitwiseXOR(col("__oh"))).as("hamming"),
        Similarity.cosine(col("__nv"), col("__ov")).as("cos_sim"))
    // intra-batch pairs from the SAME persisted band rows (zero extra
    // decodes — the hashes and embeddings already ride in b), through
    // the same bounded bipartite decomposition as the cross leg, so an
    // intra-batch hot bucket cannot go quadratic either. Candidate set
    // is identical to pairNearDups over the batch: same-bucket pairs,
    // Hamming cut on the full hash, cosine on the captions.
    val intra = Dedup.bipartiteJoinPre(
        b.select(col("band"), col("bh"), col("pair_id").as("__ai"),
          col("phash").as("__ahh"), col("embedding").as("__av")),
        "__ai", occ("b"),
        b.select(col("band"), col("bh"), col("pair_id").as("__bi"),
          col("phash").as("__bhh"), col("embedding").as("__bv")),
        "__bi", occ("b"),
        keys = Seq("band", "bh"), maxBucketSize = maxBucketSize)
      .filter(col("__ai") < col("__bi"))
      .select(col("__ai").as("a_id"), col("__bi").as("b_id"),
        bit_count(col("__ahh").bitwiseXOR(col("__bhh"))).as("hamming"),
        Similarity.cosine(col("__av"), col("__bv")).as("cos_sim"))
    val out = cross
      .unionByName(intra)
      .filter(col("hamming") <= maxHamming && col("cos_sim") >= cosThreshold)
      .distinct()
      // eager pre-merge checkpoint pins the probe result before the
      // index mutates (same discipline as the text/embedding paths)
      .localCheckpoint(true)
    index.mergeProbed(b.select(col("band"), col("bh"), col("pair_id"),
      col("phash"), col("embedding")), keys = Seq("band", "bh", "pair_id"),
      dirty = probedDirty)
    b.unpersist()
    slice.unpersist()
    out
  }
}
