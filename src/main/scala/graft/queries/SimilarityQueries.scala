package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Balance, Dedup, Multimodal, Similarity, TextAnalysis}

import TrainingQueries._

/** Similarity search and embeddings (brute-force/LSH/IVF/PQ ANN, semantic dedup/decontamination, RRF fusion) —
  * one domain slice of the training-data query inventory, split out of
  * [[TrainingQueries]] along the map's section seams as a pure move
  * (r17, no behavior change). [[TrainingQueries.queries]] /
  * [[TrainingQueries.oracles]] compose the slices back into the single
  * public surface the driver contract reads; shared fixtures stay on
  * [[TrainingQueries]] so specs and oracles can never drift. */
private[queries] object SimilarityQueries {

  def queries: Map[String, Q] = Map(

    // ── Similarity: exact brute-force cosine top-k ───────────────────────
    "ann_cosine_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      Similarity.bruteForceTopK(q, c, "q_id", "q_vec", "c_id", "c_vec", k = 3)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // ── Similarity: hard-negative mining — per query the top-3 nearest
    // corpus vectors with a DIFFERENT label (the contrastive-training
    // negatives). Label predicate applies before the top-k reduction. ───
    "ann_hard_negatives" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_label"))
      val c = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
          col("label").as("c_label"))
      Similarity.hardNegatives(q, c, "q_id", "q_vec", "q_label",
          "c_id", "c_vec", "c_label", k = 3)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // ── Similarity: LSH-bucketed ANN as a near-dup probe. Queries are
    // the 10 vectors with a planted identical twin; the twin shares
    // every LSH band deterministically and wins top-1 at cosine 1.0, so
    // the result provably equals the exact top-1 the DuckDB oracle
    // computes by brute force. General-k recall is spec-tested
    // (OpsSpec). ────────────────────────────────────────────────────────
    "ann_lsh_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val twins = e.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("c_id"), col("embedding").as("c_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .unionByName(twins)
      Similarity.lshTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
          k = 1, planes = 8, bands = 2, excludeSelf = true)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"))
    }),

    // ── Similarity: IVF coarse-quantized ANN. nProbe=6/16 empirically
    // reaches full recall on this corpus (and recall is monotone in
    // nProbe), so the exact-top-k DuckDB oracle applies; the PLAN stays
    // the honest IVF shape — narrow argmax assignment, probed lists
    // only. ─────────────────────────────────────────────────────────────
    "ann_ivf_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      Similarity.ivfTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
          k = 3, nCentroids = 16, nProbe = 6)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // ── ANN: PERSISTENT incremental IVF index — the serving shape: the
    // index lives in a BucketedStateTable bucketed by centroid_id, a
    // second batch (planted exact twins) is ingested incrementally, and
    // the probe reads only its nProbe centroids' buckets. Twins share
    // their original's list by construction, so the same nProbe=6/16
    // full-recall argument as ann_ivf_topk extends to the union and the
    // exact-top-k DuckDB oracle applies; a lost batch, a stale slice or
    // broken bucket pruning all change the ranks and break the hash. ────
    "ann_ivf_incremental" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val cents = Similarity.sampleCentroids(c, "c_id", "c_vec", 16)
      val root = QueryScratch.freshPath("ivfidx")
      val index = new graft.pipeline.BucketedStateTable(
        s, s"$root/index",
        keyCols = Seq("centroid_id", "vec_id"), numBuckets = 16,
        bucketCols = Seq("centroid_id"))
      Similarity.indexIvf(index, c, "c_id", "c_vec", cents)
      val batch = c.filter(col("c_id") % 7 === 0)
        .select((col("c_id") + 100000).as("c_id"), col("c_vec"))
      Similarity.indexIvf(index, batch, "c_id", "c_vec", cents)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.probeIvf(index, q, "q_id", "q_vec", cents,
          k = 3, nProbe = 6)
        .select(col("q_id"), col("rank"), col("vec_id").as("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // ── ANN: recall@k diagnostic. The "index" under test is a brute-
    // force search over only the EVEN-id half of the corpus — an index
    // blind to odd ids by construction — so the exact recall fraction
    // is SQL-reproducible: per query, recall@3 = |top-3-among-evens ∩
    // global top-3| / 3. Exercises the real diagnostic machinery
    // (sampled brute-force truth, per-query intersection, summary row)
    // with a non-trivial answer strictly between 0 and 1. ──────────────
    "ann_recall_probe" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val approx = Similarity.bruteForceTopK(
        q, c.filter(col("c_id") % 2 === 0),
        "q_id", "q_vec", "c_id", "c_vec", k = 3)
      Similarity.recallAtK(approx, q, c, "q_id", "q_vec", "c_id", "c_vec",
          k = 3, sampleN = 8)
        .select(col("k"), col("n_queries"),
          round(col("avg_recall"), 4).as("avg_recall"),
          round(col("min_recall"), 4).as("min_recall"))
    }),

    // ── ANN: IVF with Lloyd-refined centroids. Two spherical k-means
    // iterations run LIVE (assignment + per-dimension means); probing
    // every list (nProbe = nCentroids) makes the result exact by
    // construction, so the DuckDB top-k oracle checks the whole refined
    // pipeline — any refinement bug that corrupts assignment, drops
    // rows, or skews cosines breaks the hash. ───────────────────────────
    "ann_ivf_refined" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      Similarity.ivfTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
          k = 3, nCentroids = 16, nProbe = 16, refineIterations = 2)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // ── Embedding: product-quantization codes — the compressed index a
    // PQ ANN search scans (8 codes instead of 64 floats). The argmin is
    // deterministic (lowest code wins ties) and both engines replay the
    // same subvector L2 arithmetic over the same deterministic sample
    // codebook, so the codes themselves are oracle-exact. Ships as CSV
    // (the driver compare hashes flat values, not arrays). ──────────────
    "embed_pq_codes" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cb = Similarity.pqCodebooks(e, "embedding", "vec_id", m = 8, kCodes = 16)
      Similarity.pqEncode(e, "embedding", cb, m = 8, kCodes = 16)
        .select(col("vec_id"),
          array_join(col("pq_codes").cast("array<string>"), ",").as("pq_csv"))
        .orderBy(col("vec_id"))
    }),

    // ── ANN: PQ search with exact re-ranking as a near-dup probe — the
    // same planted-twin construction as ann_lsh_topk: the twin shares
    // the query's codes, and per-subvector argmin codes MINIMIZE each
    // ADC term, so no candidate can score a lower ADC — the twin always
    // survives the rerank cut and wins top-1 at cosine 1.0 = the exact
    // top-1 the oracle computes by brute force. General-k recall is
    // spec-tested (OpsSpec). ────────────────────────────────────────────
    "ann_pq_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val twins = e.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("c_id"), col("embedding").as("c_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .unionByName(twins)
      Similarity.pqTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
          k = 1, m = 8, kCodes = 16, rerank = 16, excludeSelf = true)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"))
    }),

    // ── ANN: PQ with Lloyd-refined codebooks (production index path;
    // same twin-recall argument — argmin codes score minimal ADC under
    // ANY codebook, so the exact-top-1 oracle still applies; the two
    // Lloyd iterations run live inside the measured query) ──────────────
    "ann_pq_refined" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val twins = e.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("c_id"), col("embedding").as("c_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .unionByName(twins)
      Similarity.pqTopK(q, c, "q_id", "q_vec", "c_id", "c_vec",
          k = 1, m = 8, kCodes = 16, rerank = 16, excludeSelf = true,
          refineIterations = 2)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("q_id"))
    }),

    // ── Embedding near-dups via LSH buckets (rows-only) ──────────────────
    "embed_near_dups" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      // Plant exact dup vectors (vec_id+100000) so the detector has
      // ground truth: cosine(v, v) = 1 ≥ any threshold.
      val planted = e.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"),
          col("label"))
      Dedup.embeddingNearDups(e.unionByName(planted), "vec_id", "embedding",
          threshold = 0.95)
        .select(col("a_id"), col("b_id"), round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ── Embedding: INCREMENTAL near-dup against a persistent LSH
    // index — the embedding twin of dedup_incr_near: index the corpus
    // once, probe a twin batch bucket-pruned, add the batch. Exact
    // twins share their original's LSH bucket deterministically; the
    // oracle enumerates all ≥-threshold pairs involving the batch. ──────
    "embed_incr_near" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val root = QueryScratch.freshPath("embidx")
      val index = new graft.pipeline.BucketedStateTable(
        s, s"$root/index",
        keyCols = Seq("bucket", "vec_id"), numBuckets = 16,
        bucketCols = Seq("bucket"))
      Dedup.indexEmbeddings(index, e, "vec_id", "embedding")
      val batch = e.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      Dedup.incrementalEmbeddingNearDups(index, batch, "vec_id",
          "embedding", threshold = 0.95)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ── Embedding preprocessing: L2 normalize (unit vectors) ─────────────
    // Components ship as micro-scaled-integer CSV: the driver compare
    // hashes flat values (arrays don't hash), and integers stringify
    // identically across engines where float formatting would not.
    "embed_normalize" -> ((s, dir) => {
      val u = graft.ops.Embeddings.unitCsvStruct(col("embedding"))
      Balance.widen(Tables.embeddings(s, dir))
        .select(col("vec_id"),
          u.getField("unit_vec_micro").as("unit_vec_micro"),
          round(u.getField("l2_norm"), 6).as("l2_norm"))
        .orderBy(col("vec_id"))
    }),

    // ── Embedding preprocessing: symmetric int8 quantization ─────────────
    "embed_quantize" -> ((s, dir) => {
      val q = graft.ops.Embeddings.quant8CsvStruct(col("embedding"))
      Balance.widen(Tables.embeddings(s, dir))
        .select(col("vec_id"),
          q.getField("q8_csv").as("q8_csv"),
          round(q.getField("scale"), 6).as("scale"))
        .orderBy(col("vec_id"))
    }),

    // ── Embedding: per-label centroids — classifier prototypes / the
    // semantic-dedup cluster summary. Map-side-combined partials: the
    // shuffle carries |labels| × dims rows, never the corpus. ───────────
    "embed_centroid_per_label" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("x")), 6).as("mean_val"),
          count(lit(1)).as("n"))
        .orderBy(col("label"), col("dim"))),

    // ── Search: hybrid retrieval via reciprocal-rank fusion — BM25
    // lexical top-15 (the text_bm25_topk ranking) fused with the
    // embedding-cosine top-15 for query vector 0 (doc_id and vec_id
    // share the id space by construction). RRF is score-free, so the
    // incomparable BM25/cosine scales fuse cleanly; output is the
    // fused top-10 with both source ranks. ──────────────────────────────
    "search_rrf_fusion" -> ((s, dir) => {
      val lex = TextAnalysis.bm25TopK(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text",
          queryTerms = Seq("spark", "vector", "merge", "window"), k = 15)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      val e = Tables.embeddings(s, dir)
      val sem = Similarity.bruteForceTopK(
          e.filter(col("vec_id") === 0)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
          e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
          "q_id", "q_vec", "c_id", "c_vec", k = 15)
        .select(col("c_id").as("doc_id"), col("rank"))
      Similarity.rrfFuse(lex.select(col("doc_id"), col("rank")), sem,
          "doc_id", "rank", k = 10)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }),

    // ── Search: hybrid retrieval ENTIRELY over persistent incremental
    // state — the streaming-RAG shape: the lexical leg scores from the
    // term-bucketed postings index (two-batch ingest,
    // incrementalBm25TopK == batch exactly), the semantic leg runs
    // exact cosine top-k over a keyed embedding STORE ingested in two
    // batches, and RRF fuses the ranks. Every byte of retrieval state
    // lives in a replay-safe state table; the oracle is the batch RRF
    // SQL verbatim. ─────────────────────────────────────────────────────
    "search_rrf_incr" -> ((s, dir) => {
      val root = QueryScratch.freshPath("rrfidx")
      val postings = new graft.pipeline.BucketedStateTable(
        s, s"$root/postings", keyCols = Seq("term", "doc_id"),
        numBuckets = 32, bucketCols = Seq("term"))
      val docLengths = new graft.pipeline.BucketedStateTable(
        s, s"$root/doclen", keyCols = Seq("doc_id"), numBuckets = 16)
      val stats = Some(new graft.pipeline.BucketedStateTable(
        s, s"$root/stats", keyCols = Seq("stat"), numBuckets = 1))
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      TextAnalysis.indexPostings(postings, docLengths,
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", stats)
      TextAnalysis.indexPostings(postings, docLengths,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", stats)
      val lex = TextAnalysis.incrementalBm25TopK(postings, docLengths,
          queryTerms = Seq("spark", "vector", "merge", "window"), k = 15,
          stats = stats)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      val embStore = new graft.pipeline.BucketedStateTable(
        s, s"$root/emb", keyCols = Seq("vec_id"), numBuckets = 16)
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      embStore.merge(e.filter(col("vec_id") % 2 === 0), keys = Seq("vec_id"))
      embStore.merge(e.filter(col("vec_id") % 2 === 1), keys = Seq("vec_id"))
      val stored = embStore.read().get
      // query-vector fetch is a POINT LOOKUP on the store's bucket
      // column: readWhere hash-prunes to the one bucket vec_id=0 lives
      // in (superset semantics — the equality filter still applies on
      // top) instead of scanning all 16 bucket directories; the
      // candidate side legitimately reads the whole store (brute-force
      // is the semantics)
      val qRow = embStore.readWhere(Seq(
          org.apache.spark.sql.sources.EqualTo("vec_id", 0L)))
        .getOrElse(stored.limit(0))
        .filter(col("vec_id") === 0)
      val sem = Similarity.bruteForceTopK(
          qRow.select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
          stored.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
          "q_id", "q_vec", "c_id", "c_vec", k = 15)
        .select(col("c_id").as("doc_id"), col("rank"))
      Similarity.rrfFuse(lex.select(col("doc_id"), col("rank")), sem,
          "doc_id", "rank", k = 10)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(

    // RRF replay: the text_bm25_topk CTE chain gives the lexical ranks,
    // brute-force cosine for query vector 0 gives the semantic ranks,
    // and the fusion is one union-aggregate — 1/(60+r) is the same IEEE
    // division in both engines, rounded at 6 dp.
    "search_rrf_fusion" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '') AS toks
        | FROM documents),
        |st AS (SELECT count(*) AS n, avg(CAST(len(toks) AS BIGINT)) AS avgdl FROM d),
        |tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term FROM d),
        |tf AS (SELECT doc_id, max(dl) AS dl,
        |  count(*) FILTER (WHERE term = 'spark') AS tf_spark,
        |  count(*) FILTER (WHERE term = 'vector') AS tf_vector,
        |  count(*) FILTER (WHERE term = 'merge') AS tf_merge,
        |  count(*) FILTER (WHERE term = 'window') AS tf_window
        | FROM tk WHERE term IN ('spark', 'vector', 'merge', 'window')
        | GROUP BY doc_id),
        |dfq AS (SELECT
        |  count(*) FILTER (WHERE tf_spark > 0) AS df_spark,
        |  count(*) FILTER (WHERE tf_vector > 0) AS df_vector,
        |  count(*) FILTER (WHERE tf_merge > 0) AS df_merge,
        |  count(*) FILTER (WHERE tf_window > 0) AS df_window
        | FROM tf),
        |sc AS (SELECT doc_id,
        |   ln((n - df_spark + 0.5) / (df_spark + 0.5) + 1.0) * (tf_spark * (1.2 + 1.0)) / (tf_spark + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        | + ln((n - df_vector + 0.5) / (df_vector + 0.5) + 1.0) * (tf_vector * (1.2 + 1.0)) / (tf_vector + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        | + ln((n - df_merge + 0.5) / (df_merge + 0.5) + 1.0) * (tf_merge * (1.2 + 1.0)) / (tf_merge + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        | + ln((n - df_window + 0.5) / (df_window + 0.5) + 1.0) * (tf_window * (1.2 + 1.0)) / (tf_window + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        |  AS score
        | FROM tf, st, dfq),
        |lex AS (SELECT doc_id, r FROM (
        |  SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY round(score, 6) DESC, doc_id) AS BIGINT) AS r FROM sc)
        | WHERE r <= 15),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |s2 AS (SELECT e.vec_id AS c_id,
        |  list_dot_product(qv, e.v) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos
        | FROM e, q),
        |sem AS (SELECT c_id, r FROM (
        |  SELECT c_id, CAST(row_number() OVER (ORDER BY cos DESC, c_id) AS BIGINT) AS r
        |  FROM s2) WHERE r <= 15),
        |u AS (SELECT doc_id, 'a' AS side, r FROM lex
        |      UNION ALL SELECT c_id, 'b', r FROM sem)
        |SELECT doc_id, round(sum(1.0 / (60.0 + r)), 6) AS rrf_score,
        | max(CASE WHEN side = 'a' THEN r END) AS rank_lexical,
        | max(CASE WHEN side = 'b' THEN r END) AS rank_semantic
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,

    // Incremental hybrid == batch hybrid: both legs are exact
    // (incrementalBm25TopK matches bm25TopK bit-for-bit; the embedding
    // store round-trips the embeddings table unchanged), so the fused
    // oracle is the batch RRF replay verbatim.
    "search_rrf_incr" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '') AS toks
        | FROM documents),
        |st AS (SELECT count(*) AS n, avg(CAST(len(toks) AS BIGINT)) AS avgdl FROM d),
        |tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term FROM d),
        |tf AS (SELECT doc_id, max(dl) AS dl,
        |  count(*) FILTER (WHERE term = 'spark') AS tf_spark,
        |  count(*) FILTER (WHERE term = 'vector') AS tf_vector,
        |  count(*) FILTER (WHERE term = 'merge') AS tf_merge,
        |  count(*) FILTER (WHERE term = 'window') AS tf_window
        | FROM tk WHERE term IN ('spark', 'vector', 'merge', 'window')
        | GROUP BY doc_id),
        |dfq AS (SELECT
        |  count(*) FILTER (WHERE tf_spark > 0) AS df_spark,
        |  count(*) FILTER (WHERE tf_vector > 0) AS df_vector,
        |  count(*) FILTER (WHERE tf_merge > 0) AS df_merge,
        |  count(*) FILTER (WHERE tf_window > 0) AS df_window
        | FROM tf),
        |sc AS (SELECT doc_id,
        |   ln((n - df_spark + 0.5) / (df_spark + 0.5) + 1.0) * (tf_spark * (1.2 + 1.0)) / (tf_spark + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        | + ln((n - df_vector + 0.5) / (df_vector + 0.5) + 1.0) * (tf_vector * (1.2 + 1.0)) / (tf_vector + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        | + ln((n - df_merge + 0.5) / (df_merge + 0.5) + 1.0) * (tf_merge * (1.2 + 1.0)) / (tf_merge + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        | + ln((n - df_window + 0.5) / (df_window + 0.5) + 1.0) * (tf_window * (1.2 + 1.0)) / (tf_window + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        |  AS score
        | FROM tf, st, dfq),
        |lex AS (SELECT doc_id, r FROM (
        |  SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY round(score, 6) DESC, doc_id) AS BIGINT) AS r FROM sc)
        | WHERE r <= 15),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |s2 AS (SELECT e.vec_id AS c_id,
        |  list_dot_product(qv, e.v) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos
        | FROM e, q),
        |sem AS (SELECT c_id, r FROM (
        |  SELECT c_id, CAST(row_number() OVER (ORDER BY cos DESC, c_id) AS BIGINT) AS r
        |  FROM s2) WHERE r <= 15),
        |u AS (SELECT doc_id, 'a' AS side, r FROM lex
        |      UNION ALL SELECT c_id, 'b', r FROM sem)
        |SELECT doc_id, round(sum(1.0 / (60.0 + r)), 6) AS rrf_score,
        | max(CASE WHEN side = 'a' THEN r END) AS rank_lexical,
        | max(CASE WHEN side = 'b' THEN r END) AS rank_semantic
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,

    // Exact top-1 neighbor (self excluded) over the twin-planted corpus;
    // the planted identical twin wins at cosine 1.0, and LSH finds it in
    // every band deterministically.
    "ann_lsh_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e
        |      UNION ALL
        |      SELECT vec_id + 100000 AS c_id, v AS cv FROM e WHERE vec_id % 50 = 0),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c WHERE c_id <> q_id)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 1 ORDER BY q_id""".stripMargin,

    // Exact top-3 over the FULL corpus (self-matches included, as in the
    // Spark query); IVF at nProbe=6/16 reaches full recall here.
    // Exact top-3 over corpus ∪ planted twins: the probe must surface
    // the incrementally ingested batch (twins tie their originals at
    // cos 1.0 and rank right behind them on the c_id tie-break).
    "ann_ivf_incremental" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e
        |      UNION ALL
        |      SELECT vec_id + 100000, v FROM e WHERE vec_id % 7 = 0),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    "ann_ivf_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // Recall@3 of a brute-force "index" that only knows even-id
    // candidates, against the exact global top-3 — both sides are plain
    // windowed top-k, so the recall fractions replay exactly.
    "ann_recall_probe" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id >= 8),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c),
        |truth AS (SELECT q_id, c_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, c_id) AS r FROM s) t
        |  WHERE r <= 3),
        |approx AS (SELECT q_id, c_id FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, c_id) AS r
        |  FROM s WHERE c_id % 2 = 0) t
        |  WHERE r <= 3),
        |pq AS (SELECT truth.q_id,
        |  CAST(count(approx.c_id) AS DOUBLE) / count(*) AS recall
        | FROM truth LEFT JOIN approx
        |   ON truth.q_id = approx.q_id AND truth.c_id = approx.c_id
        | GROUP BY truth.q_id)
        |SELECT 3 AS k, count(*) AS n_queries,
        |  round(avg(recall), 4) AS avg_recall,
        |  round(min(recall), 4) AS min_recall
        |FROM pq""".stripMargin,

    // Refined IVF probes every list → exact top-k; same oracle shape.
    "ann_ivf_refined" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // Exhaustive ≥0.95-cosine pair enumeration over the twin-planted
    // corpus; only the identical twins qualify, and identical vectors
    // share every LSH bucket deterministically.
    "embed_near_dups" ->
      """WITH all_e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        | UNION ALL
        | SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 50 = 0),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        | FROM all_e a JOIN all_e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, round(cos, 4) AS cos_sim FROM p WHERE cos >= 0.95
        |ORDER BY a_id, b_id""".stripMargin,

    // All ≥-threshold pairs with at least one side in the twin batch
    // (same exhaustive-enumeration soundness as embed_near_dups: every
    // qualifying pair collides in its LSH bucket on this geometry).
    "embed_incr_near" ->
      """WITH corpus AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |batch AS (
        | SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
        | FROM embeddings WHERE vec_id % 50 = 0),
        |all_e AS (SELECT * FROM corpus UNION ALL SELECT * FROM batch),
        |p AS (SELECT least(a.vec_id, b.vec_id) AS a_id,
        |  greatest(a.vec_id, b.vec_id) AS b_id,
        |  list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        | FROM all_e a JOIN batch b ON a.vec_id <> b.vec_id)
        |SELECT DISTINCT a_id, b_id, round(cos, 4) AS cos_sim FROM p
        |WHERE cos >= 0.95 ORDER BY a_id, b_id""".stripMargin,

    "ann_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS ql FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS c_id, v AS cv, label AS cl FROM e WHERE vec_id >= 8),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c WHERE cl <> ql)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    "ann_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id >= 8),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    "embed_normalize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT vec_id,
        | CASE WHEN nrm > 0 THEN array_to_string(
        |   list_transform(v, x -> CAST(CAST(round(x / nrm * 1000000.0) AS BIGINT) AS VARCHAR)), ',')
        | END AS unit_vec_micro,
        | round(nrm, 6) AS l2_norm
        |FROM n ORDER BY vec_id""".stripMargin,

    "embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS mx FROM e)
        |SELECT vec_id,
        | CASE WHEN mx > 0
        |   THEN array_to_string(list_transform(v,
        |     x -> CAST(CAST(round(x * (127.0 / mx)) AS INTEGER) AS VARCHAR)), ',')
        |   ELSE array_to_string(list_transform(v, x -> '0'), ',') END AS q8_csv,
        | CASE WHEN mx > 0 THEN round(127.0 / mx, 6) END AS scale
        |FROM m ORDER BY vec_id""".stripMargin,

    "embed_centroid_per_label" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (SELECT label, unnest(v) AS x,
        |        CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim FROM e)
        |SELECT label, dim, round(avg(x), 6) AS mean_val,
        | CAST(count(*) AS BIGINT) AS n
        |FROM d GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    // The codebook is RECONSTRUCTED in SQL from the same deterministic
    // sample (16 lowest vec_ids, subvector mi of sample ki), distances
    // replay the same dimension-ascending IEEE arithmetic, and ties
    // break to the lowest code in both engines (kernel: strict <;
    // SQL: ORDER BY d2, code).
    "embed_pq_codes" ->
      """WITH s AS (
        | SELECT row_number() OVER (ORDER BY vec_id) - 1 AS smp,
        |        CAST(embedding AS DOUBLE[]) AS sv
        | FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16),
        |ms AS (SELECT unnest(range(8)) AS m_idx),
        |cb AS (SELECT CAST(smp AS INT) AS code, m_idx,
        |         sv[m_idx * 8 + 1 : m_idx * 8 + 8] AS c
        |       FROM s CROSS JOIN ms),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sub AS (SELECT vec_id, m_idx, e[m_idx * 8 + 1 : m_idx * 8 + 8] AS sv
        |        FROM v CROSS JOIN ms),
        |d AS (SELECT vec_id, m_idx, code,
        |        list_sum(list_transform(range(1, 9),
        |          i -> (sv[i] - c[i]) * (sv[i] - c[i]))) AS d2
        |      FROM sub JOIN cb USING (m_idx)),
        |r AS (SELECT vec_id, m_idx, code, row_number() OVER (
        |        PARTITION BY vec_id, m_idx ORDER BY d2, code) AS rn FROM d)
        |SELECT vec_id,
        | string_agg(CAST(code AS VARCHAR), ',' ORDER BY m_idx) AS pq_csv
        |FROM r WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // Identical construction to ann_lsh_topk's oracle: exact brute-force
    // top-1 over the twin-planted corpus (PQ only changes HOW the
    // candidate is found, and twin recall is deterministic — see the
    // query comment).
    "ann_pq_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e
        |      UNION ALL
        |      SELECT vec_id + 100000 AS c_id, v AS cv FROM e WHERE vec_id % 50 = 0),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c WHERE c_id <> q_id)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 1 ORDER BY q_id""".stripMargin,

    // Refined-codebook PQ answers the same exact-top-1 question — the
    // codebook only changes how the candidate is FOUND, never which
    // candidate is the true nearest.
    "ann_pq_refined" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e
        |      UNION ALL
        |      SELECT vec_id + 100000 AS c_id, v AS cv FROM e WHERE vec_id % 50 = 0),
        |s AS (SELECT q_id, c_id,
        |  list_dot_product(qv, cv) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        | FROM q, c WHERE c_id <> q_id)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, round(cos, 4) AS cos_sim
        |FROM (SELECT *, row_number() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank FROM s) t
        |WHERE rank <= 1 ORDER BY q_id""".stripMargin
  )
}
