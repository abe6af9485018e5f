package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Balance, Dedup, Multimodal, Similarity, TextAnalysis}

import TrainingQueries._

/** Multimodal payloads (audio features, frame sampling, image dHash, cross-modal pair dedup) —
  * one domain slice of the training-data query inventory, split out of
  * [[TrainingQueries]] along the map's section seams as a pure move
  * (r17, no behavior change). [[TrainingQueries.queries]] /
  * [[TrainingQueries.oracles]] compose the slices back into the single
  * public surface the driver contract reads; shared fixtures stay on
  * [[TrainingQueries]] so specs and oracles can never drift. */
private[queries] object MultimodalQueries {

  def queries: Map[String, Q] = Map(

    // ── Multimodal: binary payload → batched feature extraction ─────────
    "multimodal_features" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(Tables.documents(s, dir))
      Multimodal.extractFeatures(s, media).toDF()
        .orderBy(col("doc_id"))
    }),

    // ── Multimodal: 1→N frame sampling (exploding per-record shape) ─────
    "multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(Tables.documents(s, dir))
      Multimodal.sampleFrames(s, media, everyNth = 10).toDF()
        .select(col("doc_id"), col("frame_index"),
          length(col("frame_bytes")).cast("long").as("frame_bytes_len"))
        .orderBy(col("doc_id"), col("frame_index"))
    }),

    // ── Multimodal: REAL WAV round-trip. Payloads are genuine RIFF/WAVE
    // byte streams (square wave, parameters closed-form in doc_id)
    // written and then DECODED by javax.sound.sampled — the features
    // the oracle recomputes arithmetically: duration = n/8000,
    // RMS = amplitude/32767. A header mis-parse, channel/rate confusion
    // or sample-normalization bug all break the hash. ───────────────────
    "multimodal_audio" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .filter(col("doc_id") < 100).select(col("doc_id")).as[Long]
      val media = ids.map { id =>
        Multimodal.MediaRecord(id, "audio",
          Multimodal.syntheticWav(
            nSamples = 800 + (id % 5).toInt * 400,
            amplitude = (1000 + (id % 7).toInt * 100).toShort,
            sampleRate = 8000))
      }.toDF()
      Multimodal.extractAudioFeatures(s, media).toDF()
        .select(col("doc_id"), col("n_frames"), col("sample_rate"),
          col("channels"),
          round(col("duration_sec"), 6).as("duration_sec"),
          round(col("rms"), 6).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // ── Multimodal: perceptual-hash image dedup. Payloads are REAL PNGs
    // whose dHash is doc_id by construction (plantedImage round-trips
    // the 64 bits through PNG encode → ImageIO decode → bilinear 9x8
    // resample), with re-encoded twins planted at +100000 — so the
    // near-dup pair set is exactly { (a,b) : popcount(v_a XOR v_b) <= 3 },
    // which DuckDB enumerates arithmetically. maxHamming=3 < bands=4
    // keeps every qualifying pair inside the pigeonhole guarantee, so
    // banding finds them deterministically, not probabilistically. A
    // decode bug, luma/resample drift, banding miss or hamming slip all
    // break the hash. ───────────────────────────────────────────────────
    "multimodal_dedup" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") < 64).select(col("doc_id"))
      val ids = base.select(col("doc_id").as("id"), col("doc_id").as("v"))
        .unionByName(base.filter(col("doc_id") % 8 === 0)
          .select((col("doc_id") + 100000).as("id"), col("doc_id").as("v")))
      val media = ids.as[(Long, Long)].map { case (id, v) =>
        Multimodal.MediaRecord(id, "image", Multimodal.plantedImage(v))
      }.toDF()
      Multimodal.imageNearDups(s, media, maxHamming = 3, bands = 4)
        .select(col("a_id"), col("b_id"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ── Multimodal: CROSS-MODAL pair dedup (image dHash × caption
    // embedding conjunction). Planted at +100000: a RE-ENCODED image
    // (dHash one bit off — hamming 1) with a PARAPHRASED caption
    // (identical embedding — cosine 1): the true duplicate pair. Planted
    // foils: +200000 keeps the image but swaps the caption embedding
    // (image-only match — NOT a dup), +300000 keeps the caption but
    // perturbs 8 dHash bits (caption-only match — NOT a dup; image
    // banding prunes it, and the conjunction would reject it anyway).
    // The oracle replays the conjunction arithmetically: dHash = v by
    // plantedImage construction, cosine in closed list arithmetic. ──────
    "multimodal_pair_dedup" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val base = Tables.documents(s, dir).filter(col("doc_id") < 64)
        .select(col("doc_id").as("id"))
        .join(emb, col("id") === col("vec_id"))
        .select(col("id"), col("id").as("v"), col("embedding"))
      val dup = base.filter(col("id") % 8 === 0)
        .select((col("id") + 100000).as("id"),
          col("v").bitwiseXOR(lit(1L)).as("v"), col("embedding"))
      val imgOnly = base.filter(col("id") % 16 === 4)
        .select(col("id"), col("v"))
        .join(emb, col("id") + 1 === col("vec_id"))
        .select((col("id") + 200000).as("id"), col("v"), col("embedding"))
      val captOnly = base.filter(col("id") % 16 === 8)
        .select((col("id") + 300000).as("id"),
          col("v").bitwiseXOR(lit(255L)).as("v"), col("embedding"))
      val pairs = base.unionByName(dup).unionByName(imgOnly).unionByName(captOnly)
        .as[(Long, Long, Array[Float])]
        .map { case (id, v, e) =>
          Multimodal.PairRecord(id, Multimodal.plantedImage(v), e) }
        .toDF()
      Multimodal.pairNearDups(s, pairs,
          maxHamming = 3, bands = 4, cosThreshold = 0.95)
        .select(col("a_id"), col("b_id"),
          col("hamming").cast("int").as("hamming"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ── Multimodal: INCREMENTAL cross-modal pair dedup — the pair
    // twin of dedup_incr_near/embed_incr_near: index the base catalog's
    // banded dHash rows (hash + caption embedding) once, then probe a
    // batch of planted twins and foils bucket-pruned. Base ids < 64,
    // batch ids >= 100000, so "pairs with at least one side in the
    // batch" is id >= 100000 and the oracle replays the conjunction
    // arithmetically over base ∪ batch exactly as multimodal_pair_dedup
    // does, restricted to batch-involving pairs. The base filter is
    // STRIDE-RELATIVE (doc_id % 10000000 < 64 — identical to
    // doc_id < 64 on every sf dir, whose ids stay far below the
    // stride) so the ScaleProbe's id-strided N-copies corpus grows the
    // pair catalog per copy and the probe measures real scaling. The
    // planted dHash replicates the id at bit 0 and bit 32
    // (v = id·(2^32+1)) so every 16-bit band carries id-varying bits at
    // probe scale — a bare v = id zeroes bands 2–3 corpus-wide, the
    // degenerate single-bucket skew (kept as a separate stress probe in
    // SCALE.md). The twin/foil xors touch only low bits, so the
    // conjunction arithmetic (hamming 1 dup, hamming 8 foil) is
    // unchanged and the oracle replays v in closed form. ────────────────
    "multimodal_pair_incr" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") % 10000000L < 64)
        .select(col("doc_id").as("id"))
        .join(emb, col("id") === col("vec_id"))
        .select(col("id"),
          (col("id") * lit(4294967297L)).as("v"), col("embedding"))
      def mk(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Array[Float])]
          .map { case (id, v, e) =>
            Multimodal.PairRecord(id, Multimodal.plantedImage(v), e) }
          .toDF()
      val root = QueryScratch.freshPath("pairidx")
      val index = new graft.pipeline.BucketedStateTable(
        s, s"$root/index",
        keyCols = Seq("band", "bh", "pair_id"), numBuckets = 32,
        bucketCols = Seq("band", "bh"))
      Multimodal.indexPairs(index, mk(base))
      val dup = base.filter(col("id") % 8 === 0)
        .select((col("id") + 100000).as("id"),
          col("v").bitwiseXOR(lit(1L)).as("v"), col("embedding"))
      val imgOnly = base.filter(col("id") % 16 === 4)
        .select(col("id"), col("v"))
        .join(emb, col("id") + 1 === col("vec_id"))
        .select((col("id") + 200000).as("id"), col("v"), col("embedding"))
      val captOnly = base.filter(col("id") % 16 === 8)
        .select((col("id") + 300000).as("id"),
          col("v").bitwiseXOR(lit(255L)).as("v"), col("embedding"))
      Multimodal.incrementalPairNearDups(index,
          mk(dup.unionByName(imgOnly).unionByName(captOnly)),
          maxHamming = 3, bands = 4, cosThreshold = 0.95)
        .select(col("a_id"), col("b_id"),
          col("hamming").cast("int").as("hamming"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("a_id"), col("b_id"))
    })
  )

  def oracles: Map[String, String] = Map(

    "multimodal_features" ->
      """SELECT doc_id, 'image' AS kind,
        | CAST(length(text) AS BIGINT) AS n_bytes,
        | CAST(length(text) % 512 AS BIGINT) AS fake_width,
        | CAST((length(text) * 7) % 512 AS BIGINT) AS fake_height,
        | CAST(length(text) % 30 + 1 AS BIGINT) AS fake_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      """SELECT doc_id,
        | CAST(unnest(range(0, length(text) % 30 + 1, 10)) AS BIGINT) AS frame_index,
        | CAST(least(64, length(text)) AS BIGINT) AS frame_bytes_len
        |FROM documents ORDER BY doc_id, frame_index""".stripMargin,

    // The planted square-wave WAVs have closed-form features; the Spark
    // side genuinely encodes and decodes RIFF bytes to recover them.
    "multimodal_audio" ->
      """SELECT doc_id,
        | CAST(800 + (doc_id % 5) * 400 AS BIGINT) AS n_frames,
        | CAST(8000.0 AS DOUBLE) AS sample_rate,
        | CAST(1 AS INTEGER) AS channels,
        | round((800 + (doc_id % 5) * 400) / 8000.0, 6) AS duration_sec,
        | round((1000 + (doc_id % 7) * 100) / 32767.0, 6) AS rms
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    // The planted PNGs carry dHash = doc_id bit-for-bit, so the pair set
    // is pure 64-bit arithmetic: popcount(v_a XOR v_b) <= 3 over the
    // planted (id, v) catalog, twins at +100000 sharing their original's
    // hash. Mirrors the Spark side's a_id < b_id, (a,b) by id ordering.
    "multimodal_dedup" ->
      """WITH imgs AS (
        | SELECT doc_id AS id, doc_id AS v FROM documents WHERE doc_id < 64
        | UNION ALL
        | SELECT doc_id + 100000 AS id, doc_id AS v FROM documents
        | WHERE doc_id < 64 AND doc_id % 8 = 0)
        |SELECT a.id AS a_id, b.id AS b_id,
        | CAST(bit_count(xor(a.v, b.v)) AS INTEGER) AS hamming
        |FROM imgs a JOIN imgs b ON a.id < b.id
        |WHERE bit_count(xor(a.v, b.v)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // Cross-modal conjunction replayed arithmetically: dHash = v by
    // plantedImage construction (so image Hamming is 64-bit XOR
    // popcount), caption cosine in closed list arithmetic over the same
    // planted catalog — +100000 re-encode+paraphrase twins (hamming 1,
    // cos 1), +200000 image-only foils, +300000 caption-only foils.
    "multimodal_pair_dedup" ->
      """WITH emb AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |base AS (
        | SELECT d.doc_id AS bid, d.doc_id AS bv, emb.e
        | FROM documents d JOIN emb ON emb.vec_id = d.doc_id
        | WHERE d.doc_id < 64),
        |all_p AS (
        | SELECT bid AS id, bv AS v, e FROM base
        | UNION ALL
        | SELECT bid + 100000, xor(bv, 1), e FROM base WHERE bid % 8 = 0
        | UNION ALL
        | SELECT b.bid + 200000, b.bv, emb.e FROM base b
        |  JOIN emb ON emb.vec_id = b.bid + 1 WHERE b.bid % 16 = 4
        | UNION ALL
        | SELECT bid + 300000, xor(bv, 255), e FROM base WHERE bid % 16 = 8),
        |p AS (
        | SELECT a.id AS a_id, b.id AS b_id,
        |  CAST(bit_count(xor(a.v, b.v)) AS INTEGER) AS hamming,
        |  list_dot_product(a.e, b.e) /
        |   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
        | FROM all_p a JOIN all_p b ON a.id < b.id)
        |SELECT a_id, b_id, hamming, round(cos, 4) AS cos_sim
        |FROM p WHERE hamming <= 3 AND cos >= 0.95
        |ORDER BY a_id, b_id""".stripMargin,

    // Same arithmetic replay as multimodal_pair_dedup, restricted to
    // pairs with at least one batch side (batch ids >= 100000): the
    // incremental probe must surface exactly the batch-involving slice
    // of the full conjunction — nothing extra (no base×base pairs), and
    // nothing missed (cross via the index, intra via the batch itself).
    "multimodal_pair_incr" ->
      """WITH emb AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |base AS (
        | SELECT d.doc_id AS bid, d.doc_id * 4294967297 AS bv, emb.e
        | FROM documents d JOIN emb ON emb.vec_id = d.doc_id
        | WHERE d.doc_id % 10000000 < 64),
        |all_p AS (
        | SELECT bid AS id, bv AS v, e FROM base
        | UNION ALL
        | SELECT bid + 100000, xor(bv, 1), e FROM base WHERE bid % 8 = 0
        | UNION ALL
        | SELECT b.bid + 200000, b.bv, emb.e FROM base b
        |  JOIN emb ON emb.vec_id = b.bid + 1 WHERE b.bid % 16 = 4
        | UNION ALL
        | SELECT bid + 300000, xor(bv, 255), e FROM base WHERE bid % 16 = 8),
        |p AS (
        | SELECT a.id AS a_id, b.id AS b_id,
        |  CAST(bit_count(xor(a.v, b.v)) AS INTEGER) AS hamming,
        |  list_dot_product(a.e, b.e) /
        |   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
        | FROM all_p a JOIN all_p b ON a.id < b.id
        | WHERE a.id >= 100000 OR b.id >= 100000)
        |SELECT a_id, b_id, hamming, round(cos, 4) AS cos_sim
        |FROM p WHERE hamming <= 3 AND cos >= 0.95
        |ORDER BY a_id, b_id""".stripMargin
  )
}
