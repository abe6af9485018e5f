package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Balance, Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators (BASELINE.json north-star: dedup,
  * similarity search, multimodal columns, text analysis) as verifiable
  * queries — every entry carries a DuckDB oracle. The hash-based
  * operators (MinHash/SimHash/LSH) are restated so their EXPECTED output
  * is SQL-expressible: candidates are verified against an exact,
  * DuckDB-computable metric (shingle Jaccard / text equality / cosine),
  * and recall of the verified set is deterministic on the fixed corpora
  * (pigeonhole or identical-hash guarantees, empirically cross-checked).
  * Probabilistic general-k recall remains spec-tested in OpsSpec.
  */
object TrainingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Labeled training sentences for `text_langid_trained` — DELIBERATELY
    * unequal per-language counts (4/3/3/2) so no two one-vs-rest models
    * are symmetric (even fully-OOV documents then score distinctly per
    * language). ASCII-only so the fixture survives any JVM default
    * encoding. Shared with the accuracy spec. */
  val langIdTrainSet: Seq[(String, String)] = Seq(
    "en" -> "the model learns language structure from data",
    "en" -> "machine learning needs large amounts of text data",
    "en" -> "we train a classifier on labeled examples",
    "en" -> "the quick brown fox jumps over the lazy dog",
    "de" -> "das modell lernt die struktur der sprache aus daten",
    "de" -> "maschinelles lernen braucht grosse mengen an text",
    "de" -> "wir trainieren einen klassifikator mit beispielen",
    "fr" -> "le modele apprend la structure de la langue a partir des donnees",
    "fr" -> "apprentissage automatique necessite beaucoup de texte",
    "fr" -> "nous entrainons un classifieur sur des exemples annotes",
    "es" -> "el modelo aprende la estructura del idioma a partir de los datos",
    "es" -> "el aprendizaje automatico necesita grandes cantidades de texto")

  /** Held-out sentences (never trained on) with their expected
    * language — the spec asserts the trained models classify each
    * correctly; the oracle replays the scores. */
  val langIdHeldout: Seq[(Long, String)] = Seq(
    -4L -> "el modelo necesita los datos",
    -3L -> "la structure de la langue",
    -2L -> "wir lernen aus daten und text",
    -1L -> "the dog learns from labeled examples")

  val langIdHeldoutExpected: Map[Long, String] =
    Map(-4L -> "es", -3L -> "fr", -2L -> "de", -1L -> "en")

  /** Mixed-language documents (doc_id → lines) for the per-line
    * composition operator: -3 is majority-German with an English line,
    * -2 ties French/Spanish (model order resolves), -1 is empty. */
  val langIdLineDocs: Seq[(Long, Seq[String])] = Seq(
    -3L -> Seq(
      "the dog learns from labeled examples",
      "wir lernen aus daten und text",
      "das modell lernt die struktur der sprache aus daten"),
    -2L -> Seq(
      "la structure de la langue",
      "el modelo necesita los datos"),
    -1L -> Seq.empty)

  /** SQL VALUES fixtures generated from the shared rows (fixture and
    * oracle can never drift; texts are ASCII with no quotes). */
  private def langIdTrainVals: String =
    langIdTrainSet.map { case (l, t) => s"('$l', '$t')" }.mkString(", ")
  private def langIdHeldoutVals: String =
    langIdHeldout.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
  private def langIdLineVals: String =
    langIdLineDocs.flatMap { case (i, ls) => ls.map(l => s"($i, '$l')") }
      .mkString(", ")
  private def langIdLineDocIdVals: String =
    langIdLineDocs.map { case (i, _) => s"($i)" }.mkString(", ")

  /** Shared unigram-LM training replay (candidates → 2 unrolled
    * Viterbi-EM rounds; `u2`/`t2`/`nv` are the final usage counts,
    * total, and candidate-vocab size) — the common prefix of the
    * `text_unigram_lm` and `text_unigram_encode` oracles. The DOUBLE
    * cast on the recursion anchors is load-bearing: a bare 1.0 types
    * as DECIMAL(2,1) in DuckDB and silently truncates every product
    * score to one decimal place. */
  private val unigramTrainCte: String =
    """WITH RECURSIVE
      |words AS (
      | SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
      |  SELECT unnest(list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\s+'), x -> x <> '')) AS w
      |  FROM documents) WHERE len(w) <= 16 GROUP BY w),
      |cand AS (
      | SELECT substr(w, i, l) AS piece, CAST(sum(f) AS BIGINT) AS c
      | FROM words, unnest(range(1, len(w) + 1)) AS a(i), unnest([1, 2, 3, 4]) AS b(l)
      | WHERE i + l - 1 <= len(w)
      | GROUP BY 1),
      |nv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM cand),
      |t0 AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM cand),
      |p0 AS (SELECT piece, (c + 1.0) / (tot + v) AS p FROM cand, t0, nv),
      |s1(w, pos, score, k, path) AS (
      | SELECT w, 0, CAST(1.0 AS DOUBLE), 0, '' FROM words
      | UNION ALL
      | SELECT s1.w, s1.pos + len(p0.piece), s1.score * p0.p, s1.k + 1,
      |  CASE WHEN s1.path = '' THEN p0.piece ELSE s1.path || chr(1) || p0.piece END
      | FROM s1, unnest([1, 2, 3, 4]) AS e(l), p0
      | WHERE s1.pos + l <= len(s1.w) AND p0.piece = substr(s1.w, s1.pos + 1, l)),
      |seg1 AS (
      | SELECT w, path FROM (
      |  SELECT w, path, row_number() OVER (
      |   PARTITION BY w ORDER BY score DESC, k ASC, path ASC) AS rn
      |  FROM s1 WHERE pos = len(w)) WHERE rn = 1),
      |u1 AS (
      | SELECT piece, CAST(sum(f) AS BIGINT) AS c
      | FROM seg1 JOIN words USING (w), unnest(string_split(path, chr(1))) AS x(piece)
      | GROUP BY piece),
      |c1 AS (SELECT cand.piece, CAST(coalesce(u1.c, 0) AS BIGINT) AS c
      | FROM cand LEFT JOIN u1 ON cand.piece = u1.piece),
      |t1 AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM c1),
      |p1 AS (SELECT piece, (c + 1.0) / (tot + v) AS p FROM c1, t1, nv),
      |s2(w, pos, score, k, path) AS (
      | SELECT w, 0, CAST(1.0 AS DOUBLE), 0, '' FROM words
      | UNION ALL
      | SELECT s2.w, s2.pos + len(p1.piece), s2.score * p1.p, s2.k + 1,
      |  CASE WHEN s2.path = '' THEN p1.piece ELSE s2.path || chr(1) || p1.piece END
      | FROM s2, unnest([1, 2, 3, 4]) AS e(l), p1
      | WHERE s2.pos + l <= len(s2.w) AND p1.piece = substr(s2.w, s2.pos + 1, l)),
      |seg2 AS (
      | SELECT w, path FROM (
      |  SELECT w, path, row_number() OVER (
      |   PARTITION BY w ORDER BY score DESC, k ASC, path ASC) AS rn
      |  FROM s2 WHERE pos = len(w)) WHERE rn = 1),
      |u2 AS (
      | SELECT piece, CAST(sum(f) AS BIGINT) AS c
      | FROM seg2 JOIN words USING (w), unnest(string_split(path, chr(1))) AS x(piece)
      | GROUP BY piece),
      |t2 AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM u2)""".stripMargin

  /** Documents plus planted near-duplicates: every doc_id % 5 == 0 row is
    * copied to doc_id+100000 with three extra trailing tokens, so
    * near-dup detectors have known ground truth at every scale factor. */
  private def withPlantedNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text")))
  }

  def queries: Map[String, Q] = Map(
    // ── Exact dedup: content-hash groupBy ────────────────────────────────
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(withPlantedNearDups(s, dir), "doc_id", "text")
        .orderBy(col("text_md5"))),

    // ── Incremental dedup: a new batch filtered against a PERSISTENT
    // seen-set (BucketedStateTable keyed on content_hash — the real
    // state path runs inside the oracle-checked query). seen = the
    // whole documents table; the batch plants all three outcomes:
    // exact re-ingests (dropped as seen), a twice-planted fresh text
    // (intra-batch dup — smallest id wins), and unique fresh texts
    // (kept). Oracle = the same construction as one anti-join in SQL. ──
    "dedup_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val batch = d.filter(col("doc_id") % 7 === 1)
        .select((col("doc_id") + 200000).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 9 === 2)
          .select((col("doc_id") + 400000).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text")))
        .unionByName(d.filter(col("doc_id") % 9 === 2)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text")))
        .unionByName(d.filter(col("doc_id") % 11 === 3)
          .select((col("doc_id") + 600000).as("doc_id"),
            concat(col("text"), lit(" unique")).as("text")))
      val root = QueryScratch.freshPath("incr")
      val state = new graft.pipeline.BucketedStateTable(
        s, s"$root/seen", keyCols = Seq("content_hash"), numBuckets = 16)
      state.merge(
        d.select(TextAnalysis.fingerprint(col("text")).as("content_hash"),
            col("doc_id").cast("long").as("first_id"))
          .groupBy("content_hash").agg(min("first_id").as("first_id")),
        keys = Seq("content_hash"))
      Dedup.incrementalExact(state, batch, "doc_id", "text")
        .select(col("doc_id"), col("content_hash"))
        .orderBy(col("doc_id"))
    }),

    // ── Span-level dedup: 5-token shingles duplicated across documents
    // are excised everywhere but their globally-first occurrence. A
    // boilerplate sentence is planted on every doc_id % 4 == 0 row, so
    // ground truth exists at every scale factor; any NATURAL cross-doc
    // spans are computed identically by both engines (the semantics are
    // exact, not probabilistic). ─────────────────────────────────────────
    "text_dedup_spans" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = d.withColumn("text",
        when(col("doc_id") % 4 === 0,
          concat(col("text"),
            lit(" subscribe to our newsletter for daily updates today")))
          .otherwise(col("text")))
      Dedup.exciseRepeatedSpans(corpus, "doc_id", "text", w = 5)
        .orderBy(col("doc_id"))
    }),

    // ── Near-dup: exact word-set Jaccard on planted pairs ────────────────
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val all = withPlantedNearDups(s, dir)
      val a = all.filter(col("doc_id") < 100000)
        .select(col("doc_id").as("a_id"), col("text").as("a_text"))
      val b = all.filter(col("doc_id") >= 100000)
        .select((col("doc_id") - 100000).as("a_id"), col("text").as("b_text"))
      a.join(b, "a_id")
        .select(col("a_id").as("doc_id"),
          Dedup.wordSetJaccard(col("a_text"), col("b_text")).as("jaccard"))
        .orderBy(col("doc_id"))
    }),

    // ── Near-dup: MinHash-LSH candidates verified by exact shingle
    // Jaccard. Oracle-checkable: the verified output equals (checked by
    // exhaustive DuckDB enumeration) the full ≥-0.8 shingle-Jaccard pair
    // set — LSH only changes HOW candidates are found, not the result. ──
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.verifiedNearDupPairs(withPlantedNearDups(s, dir), "doc_id", "text",
          minJaccard = 0.8)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))),

    // ── Incremental near-dup: the planted batch probed against a
    // PERSISTENT LSH band index of the original corpus (built, then
    // probed bucket-pruned, inside the oracle-checked query). The
    // verified output is every exact-Jaccard ≥ 0.8 pair INVOLVING the
    // batch — which the DuckDB oracle enumerates exhaustively; recall
    // of the banding is the same deterministic-on-this-corpus argument
    // as dedup_minhash_lsh. ─────────────────────────────────────────────
    "dedup_incr_near" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val batch = d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text"))
      val root = QueryScratch.freshPath("incrnd")
      val index = new graft.pipeline.BucketedStateTable(
        s, s"$root/index",
        keyCols = Seq("band", "band_hash", "doc_id"), numBuckets = 32,
        bucketCols = Seq("band", "band_hash"))
      Dedup.indexNearDups(index, d, "doc_id", "text")
      Dedup.incrementalNearDups(index, d, batch, "doc_id", "text",
          minJaccard = 0.8)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ── Near-dup: connected components over the VERIFIED pair set; the
    // oracle recomputes the same components via a recursive-CTE
    // transitive closure in DuckDB. ──────────────────────────────────────
    "dedup_cluster" -> ((s, dir) =>
      Dedup.clusterPairs(
          Dedup.verifiedNearDupPairs(withPlantedNearDups(s, dir), "doc_id",
            "text", minJaccard = 0.8))
        .orderBy(col("id"))),

    // ── Exact-dup detection via banded SimHash: candidates only form
    // inside a (band, band-bits) bucket (never across the corpus);
    // hamming==0 candidates are text-verified. Identical texts have
    // identical simhashes, hence collide in EVERY band — detection of
    // the planted exact dups is deterministic, so the text-equality
    // self-join is a sound oracle. Near-dup hamming behavior is
    // spec-tested (OpsSpec). ─────────────────────────────────────────────
    "dedup_simhash" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val all = d.unionByName(
        d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      Dedup.simhashBandPairs(all, "doc_id", "text")
        .filter(col("hamming") === 0)
        .join(all.select(col("doc_id").as("a_id"), col("text").as("a_text")), "a_id")
        .join(all.select(col("doc_id").as("b_id"), col("text").as("b_text")), "b_id")
        .filter(col("a_text") === col("b_text"))
        .select(col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id"))
    }),

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

    // ── Embedding: SemDeDup-style semantic dedup — survivors after
    // dropping every non-minimum member of each cosine-≥0.95 connected
    // component. Planted exact twins give deterministic pairs; the
    // oracle recomputes components via recursive transitive closure. ────
    "dedup_semantic" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val planted = e.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"),
          col("label"))
      Dedup.semanticSurvivors(e.unionByName(planted), "vec_id", "embedding",
          threshold = 0.95)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // ── Embedding: SEMANTIC decontamination — corpus rows within 0.95
    // cosine of any benchmark vector are dropped (paraphrase-level eval
    // leakage, vs corpus_decontaminate's exact 8-gram overlap). The
    // benchmark is exact copies of every 40th vector, so the planted
    // leaks collide in their LSH bucket deterministically and the
    // oracle's exhaustive corpus × benchmark enumeration agrees. ────────
    "corpus_decontaminate_semantic" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val bench = e.filter(col("vec_id") % 40 === 0).select(col("embedding"))
      Dedup.decontaminateSemantic(e, "vec_id", "embedding",
          bench, "embedding", threshold = 0.95)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // ── Embedding: graded semantic-contamination report — per flagged
    // corpus row, how many benchmark vectors sit within 0.95 cosine and
    // the strongest of those similarities (the gray-zone review form of
    // corpus_decontaminate_semantic). ────────────────────────────────────
    "corpus_contamination_semantic" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val bench = e.filter(col("vec_id") % 40 === 0).select(col("embedding"))
      Dedup.semanticContaminationReport(e, "vec_id", "embedding",
          bench, "embedding", threshold = 0.95)
        .select(col("vec_id"), col("n_hits"),
          round(col("max_cos"), 4).as("max_cos"))
        .orderBy(col("vec_id"))
    }),

    // ── Embedding: semantic-decontamination RECALL probe — quantifies
    // the multi-band recall knob. Perturbed leaks (one coordinate of
    // each benchmark vector nudged by a fixed delta — NOT exact copies,
    // so sign-LSH collision is genuinely probabilistic) are pushed
    // through decontaminateSemantic at bands=1 and bands=3; recall is
    // caught/true-leaks. Oracle-exact because the hyperplanes derive
    // deterministically from (plane, dim): the oracle SQL replays the
    // SAME sign bits from inlined plane constants and the same exact
    // cosine, so both engines compute the identical caught set. Band 0
    // of the 3-band signature IS the 1-band signature, so recall is
    // provably monotone in bands. ────────────────────────────────────────
    "corpus_decontaminate_recall" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val bench = e.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("src_id"),
          expr("transform(embedding, x -> cast(x as double))").as("bv"))
      val variants = Seq((1, 1, 0.20), (2, 2, -0.25), (3, 3, 0.30), (4, 4, -0.35))
        .toDF("variant", "coord", "delta")
      val planted = bench.crossJoin(broadcast(variants))
        .select((col("src_id") * 10 + col("variant")).as("leak_id"),
          expr("concat(slice(bv, 1, coord - 1), " +
            "array(element_at(bv, coord) + delta), " +
            "slice(bv, coord + 1, size(bv) - coord))").as("lv"))
      val benchV = bench.select(col("bv"))
      // ground truth: planted rows whose EXACT cosine reaches the
      // threshold against any benchmark vector (brute force)
      val nLeaks = planted.crossJoin(broadcast(benchV))
        .filter(Similarity.cosine(col("lv"), col("bv")) >= 0.95)
        .select(col("leak_id")).distinct()
        .agg(count(lit(1)).as("n_leaks"))
      val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
      def recallRow(bands: Int): DataFrame = {
        // every dropped row is exact-cosine-verified, so caught ⊆ leaks
        val surv = Dedup.decontaminateSemantic(planted, "leak_id", "lv",
          benchV, "bv", threshold = 0.95, planes = 12, bands = bands)
        surv.agg(count(lit(1)).as("n_surv"))
          .crossJoin(nPlanted).crossJoin(nLeaks)
          .select(lit(bands).as("bands"), col("n_leaks"),
            (col("n_planted") - col("n_surv")).as("n_caught"),
            round((col("n_planted") - col("n_surv")).cast("double") /
              col("n_leaks"), 4).as("recall"))
      }
      recallRow(1).unionByName(recallRow(3)).orderBy(col("bands"))
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

    // ── Text: language-ID heuristic ──────────────────────────────────────
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langIdScores(Tables.documents(s, dir), col("text"))
        .select(col("doc_id"), col("score_en"), col("score_de"),
          col("score_fr"), col("score_es"), col("predicted_lang"))
        .orderBy(col("doc_id"))),

    // ── Text: TRAINED language ID — one-vs-rest hashed-n-gram models
    // fit from planted labeled sentences (unequal per-language sizes so
    // no two one-vs-rest models are symmetric), then scored over
    // held-out planted sentences (negative ids — the accuracy check)
    // plus a corpus slice. Training is ONE bucket-count aggregate;
    // scoring is a zero-shuffle literal-table projection. The oracle
    // replays the ENTIRE fit (same md5 bucket hash, same Laplace
    // log-odds) in SQL. ─────────────────────────────────────────────────
    "text_langid_trained" -> ((s, dir) => {
      import s.implicits._
      val models = TextAnalysis.langIdTrain(
        TrainingQueries.langIdTrainSet.toDF("lang", "text"),
        "text", "lang", Seq("en", "de", "fr", "es"), buckets = 256)
      val heldout = TrainingQueries.langIdHeldout.toDF("doc_id", "text")
      val test = Tables.documents(s, dir)
        .filter(col("doc_id") < 30)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .unionByName(heldout)
      TextAnalysis.langIdPredictTrained(test, "text", models)
        .select(col("doc_id"),
          round(col("score_en"), 6).as("score_en"),
          round(col("score_de"), 6).as("score_de"),
          round(col("score_fr"), 6).as("score_fr"),
          round(col("score_es"), 6).as("score_es"),
          col("predicted_lang"))
        .orderBy(col("doc_id"))
    }),

    // ── Text: per-LINE language composition of mixed-language docs —
    // each non-blank line classified by the trained models inside a
    // transform lambda (no explode, no shuffle), per-doc line counts
    // per language + majority language. Planted multiline docs mix
    // held-out sentences; base docs are single-line. ────────────────────
    "text_langid_lines" -> ((s, dir) => {
      import s.implicits._
      val models = TextAnalysis.langIdTrain(
        TrainingQueries.langIdTrainSet.toDF("lang", "text"),
        "text", "lang", Seq("en", "de", "fr", "es"), buckets = 256)
      val planted = TrainingQueries.langIdLineDocs
        .map { case (id, ls) => (id, ls.mkString("\n")) }
        .toDF("doc_id", "text")
      val test = Tables.documents(s, dir)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .unionByName(planted)
      TextAnalysis.langIdLineShares(test, "text", models)
        .select(col("doc_id"), col("n_lines"), col("n_lines_en"),
          col("n_lines_de"), col("n_lines_fr"), col("n_lines_es"),
          col("line_major_lang"))
        .orderBy(col("doc_id"))
    }),

    // ── Text: unigram-LM tokenizer training (SentencePiece shape) —
    // candidate substrings → 2 Viterbi-EM rounds (one distributed
    // E-step action per round, driver M-step) → final piece vocab with
    // usage counts and smoothed probs. Scores are PRODUCTS of exact
    // ratios (no ln), ties fewest-pieces-then-lex, so the oracle
    // replays the whole fit by exhaustive segmentation enumeration in
    // two unrolled recursive CTEs. ──────────────────────────────────────
    "text_unigram_lm" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.unigramTrain(Tables.documents(s, dir), col("text"),
          maxPieceLen = 4, iterations = 2)
        .toDF("piece", "n_uses", "prob")
        .select(col("piece"), col("n_uses"), round(col("prob"), 6).as("prob"))
        .orderBy(col("n_uses").desc, col("piece"))
    }),

    // ── Text: unigram-LM PRUNE-TO-TARGET — train, keep the top-24
    // pieces by usage PLUS all single chars (the coverage floor), one
    // more E-step under the pruned table. Usage redistributes onto
    // survivors; the oracle unrolls the extra round. ────────────────────
    "text_unigram_prune" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.unigramTrain(Tables.documents(s, dir), col("text"),
          maxPieceLen = 4, iterations = 2, vocabSize = Some(24))
        .toDF("piece", "n_uses", "prob")
        .select(col("piece"), col("n_uses"), round(col("prob"), 6).as("prob"))
        .orderBy(col("n_uses").desc, col("piece"))
    }),

    // ── Text: unigram-LM ENCODE — train (as above), PRUNE to the used
    // vocab, tokenize every document with the Viterbi kernel. UNK rule:
    // a word the pruned vocab cannot cover, or one past maxWordLen,
    // stays whole as one piece. The oracle replays train + prune + a
    // third enumeration round under the pruned vocab. ───────────────────
    "text_unigram_encode" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val vocab = TextAnalysis.unigramTrain(d, col("text"),
        maxPieceLen = 4, iterations = 2)
      TextAnalysis.unigramEncode(d, col("text"),
          vocab.map { case (p, _, pr) => (p, pr) })
        .select(col("doc_id"), col("n_unigram_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ── Text: token counting (whitespace + BPE-ish) ──────────────────────
    "text_token_count" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.tokenCountBpeIsh(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))),

    // ── Text: quality metrics ────────────────────────────────────────────
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(Tables.documents(s, dir), col("text"))
        .select(col("doc_id"), col("n_chars_q"), col("n_tokens"),
          col("alpha_chars"), col("alpha_ratio"), col("mean_token_len"))
        .orderBy(col("doc_id"))),

    // ── Text: per-script counts + dominant script (multilingual
    // routing). Non-Latin rows are PLANTED as literal values — SQL-
    // expressible on both engines — so the oracle verifies real
    // CJK/Cyrillic/Arabic/Greek handling, not just the ASCII corpus. ─────
    "text_scripts" -> ((s, dir) => {
      import s.implicits._
      val planted = Seq(
        (-7L, "mixed script: 深度 данные data 123"),
        (-6L, "Η μηχανική μάθηση χρειάζεται δεδομένα"),
        (-5L, "머신 러닝 모델은 많은 데이터가 필요하다"),
        (-4L, "深層学習には大量のデータが必要です"),
        (-3L, "التعلم العميق يتطلب كميات كبيرة من البيانات"),
        (-2L, "Глубокое обучение требует больших объёмов данных"),
        (-1L, "深度学习模型需要大量的训练数据来学习语言结构"))
        .toDF("doc_id", "text")
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") < 40).select(col("doc_id"), col("text"))
      TextAnalysis.scriptMetrics(base.unionByName(planted), col("text"))
        .select(col("doc_id"), col("alpha_chars"), col("latin_chars"),
          col("cyrillic_chars"), col("cjk_chars"), col("arabic_chars"),
          col("dominant_script"))
        .orderBy(col("doc_id"))
    }),

    // ── Text: PII redaction ──────────────────────────────────────────────
    "text_redact_pii" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("text",
          concat(col("text"),
            lit(" contact "), col("lang"), lit(".user@example.org"),
            lit(" or call 01234 5678"), col("doc_id").cast("string"),
            lit(" see https://example.org/d/"), col("doc_id").cast("string")))
        .select(col("doc_id"),
          TextAnalysis.redactPii(col("text")).as("redacted"))
        .orderBy(col("doc_id"))),

    // ── Text: document fingerprint ───────────────────────────────────────
    "text_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),

    // ── Composed corpus filter: quality + language + exact-dedup keep ────
    // The end-use of the text metrics: a training-corpus materialization
    // that keeps one copy per content hash, in a target language, inside
    // quality bounds. One narrow metrics pass + one hash-shuffle for the
    // keep-one-per-fingerprint window.
    "corpus_filter" -> ((s, dir) => {
      val d = withPlantedNearDups(s, dir)
      val scored = TextAnalysis.langIdScores(
        TextAnalysis.qualityMetrics(d, col("text")), col("text"))
      val kept = scored.filter(
        col("predicted_lang").isin("en", "de") &&
        col("alpha_ratio") >= 0.6 && col("n_tokens").between(10, 1000))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("__fp")).orderBy(col("doc_id"))
      kept.withColumn("__fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("predicted_lang"),
          round(col("alpha_ratio"), 6).as("alpha_ratio"), col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ── Corpus filter with REASONS: the debuggable cascade — planted
    // degenerate documents (too short, repetitive, symbol soup, 1100
    // tokens of filler) exercise every gate; the reason string is
    // deterministic and SQL-recomputable. ───────────────────────────────
    "corpus_filter_reasons" -> ((s, dir) => {
      import s.implicits._
      val planted = Seq(
        (-4L, "__LONG__"), // placeholder replaced by the repeat below
        (-3L, "!!! 000 ??? 111 !!!"),
        (-2L, "x y x y x y x y x y x y"),
        (-1L, "a b c")).toDF("doc_id", "text")
        .withColumn("text", when(col("doc_id") === -4L,
          trim(repeat(lit("w "), 1100))).otherwise(col("text")))
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      TextAnalysis.filterReasons(base.unionByName(planted), col("text"))
        .select(col("doc_id"), col("predicted_lang"),
          col("fail_reasons"), col("keep"))
        .orderBy(col("doc_id"))
    }),

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
    }),

    // ── AS-OF join: latest purchase at-or-before each click ─────────────
    // The point-in-time lookup Spark lacks natively, in the scalable
    // union-window shape (one keyed shuffle, no range-join blowup) —
    // oracle is DuckDB's native ASOF LEFT JOIN.
    "join_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      // right side unique per (user, ts): cents summed per purchase instant
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(sum(round(col("value") * 100).cast("long")).as("purchase_cents"))
      graft.ops.Joins.asofJoin(clicks, purchases, key = "user_id", ts = "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("last_purchase_ts"),
          col("asof_purchase_cents").as("last_purchase_cents"))
        .orderBy(col("event_id"))
    }),

    // ── RANGE join: value-in-interval matching via bucketization ────────
    // A bare BETWEEN join plans as broadcast-nested-loop; the bucketized
    // rewrite is an equi-join on bucket ids (hash/broadcast, AQE-governed)
    // plus the exact filter — the shape that survives big×big range joins.
    "join_range" -> ((s, dir) => {
      val bands = s.range(0, 10).select(col("id").as("band_id"),
        (col("id") * 10.0).as("lo"), (col("id") * 10.0 + 10.0).as("hi"))
      graft.ops.Joins.rangeJoinBucketed(
          Tables.events(s, dir).select("event_id", "value"), bands,
          valueCol = "value", loCol = "lo", hiCol = "hi", bucketWidth = 10.0)
        .select(col("event_id"), col("band_id"))
        .orderBy(col("event_id"), col("band_id"))
    }),

    // ── Analytics surface: CUBE (all grouping-set combinations) ──────────
    "agg_cube" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("day", date_trunc("day", col("ts")))
        .cube(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)),

    // ── Analytics surface: explicit GROUPING SETS — disjoint
    // single-column sets plus the grand total, a shape neither cube nor
    // rollup expresses. ──────────────────────────────────────────────────
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("day", date_trunc("day", col("ts")))
        .createOrReplaceTempView("events_gs")
      s.sql("""SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
              |  sum(CAST(round(value * 100) AS BIGINT)) AS value_cents
              |FROM events_gs
              |GROUP BY GROUPING SETS ((event_type), (day), ())
              |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST"""
        .stripMargin)
    }),

    // ── Profiling: key-skew diagnosis (run BEFORE salting a join) ───────
    "profile_key_skew" -> ((s, dir) =>
      graft.ops.Profile.keySkew(Tables.events(s, dir), "user_id", k = 10)),

    // ── Analytics surface: rank-family windows ───────────────────────────
    // ── Join: FULL OUTER over two per-user aggregates with asymmetric
    // coverage (high-value clicks vs high-value purchases) — both
    // null-padded sides exercised, coalesced to zeros. ──────────────────
    "join_full_outer" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click" && col("value") > 90.0)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_big_clicks"))
      val purchases = e.filter(col("event_type") === "purchase" && col("value") > 90.0)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_big_purchases"))
      clicks.join(purchases, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_big_clicks"), lit(0L)).as("n_big_clicks"),
          coalesce(col("n_big_purchases"), lit(0L)).as("n_big_purchases"))
        .orderBy(col("user_id"))
    }),

    "window_ranks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          dense_rank().over(w).cast("long").as("drank"))
        .orderBy(col("event_id"))
    }),

    // ── Data profiling: per-column counts in one aggregation pass ────────
    "profile_table" -> ((s, dir) =>
      graft.ops.Profile.table(Tables.orders(s, dir))
        .orderBy(col("column_name"))),

    // ── Sketches: approximate distinct count (HyperLogLog++) ────────────
    // The 100 TB cardinality-estimation path: one pass, fixed-size sketch,
    // map-side combinable — versus the exact count-distinct shuffle. The
    // oracle contract is the standard sketch guarantee: the estimate must
    // land within tolerance of the exact count (rsd 0.05 → 15 % is 3σ),
    // emitted as a boolean the DuckDB oracle asserts alongside the exact
    // counts it recomputes.
    "sketch_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count_distinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.05).as("__approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__approx") - col("n_exact"))
            <= col("n_exact") * 0.15).as("approx_ok"))
        .orderBy(col("event_type"))),

    // ── Sketches: approximate percentiles (GK/KLL-style) ─────────────────
    // Rank-tolerance contract: the approx p50/p90 must lie inside the
    // exact [p45,p55] / [p85,p95] value bands (±5 % rank error at
    // accuracy 1000 is generous and deterministic on fixed data).
    "sketch_quantile_approx" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          // ONE exact-percentile agg with an array argument (one sort)
          // and one sketch agg — not a scalar agg per quantile
          expr("percentile(value, array(0.45, 0.5, 0.55, 0.85, 0.9, 0.95))")
            .as("__e"),
          expr("approx_percentile(value, array(0.5, 0.9), 1000)").as("__a"))
        .select(col("event_type"),
          round(element_at(col("__e"), 2), 6).as("p50_exact"),
          round(element_at(col("__e"), 5), 6).as("p90_exact"),
          element_at(col("__a"), 1)
            .between(element_at(col("__e"), 1), element_at(col("__e"), 3))
            .as("p50_ok"),
          element_at(col("__a"), 2)
            .between(element_at(col("__e"), 4), element_at(col("__e"), 6))
            .as("p90_ok"))
        .orderBy(col("event_type"))),

    // ── Analytics surface: exact percentiles per group ───────────────────
    "agg_quantiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy(col("event_type"))),

    // ── Analytics surface: ROLLUP with subtotal rows ─────────────────────
    "agg_rollup" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("day", date_trunc("day", col("ts")))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)),

    // ── Analytics surface: pivot (wide per-type counts) ──────────────────
    "agg_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.events(s, dir)
        .withColumn("user_bucket", col("user_id") % 10)
        .groupBy(col("user_bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      // empty (bucket, type) cells pivot to NULL; count semantics say 0
      pivoted.select(col("user_bucket") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_bucket"))
    }),

    // ── Streaming-analog: sessionization (30-min gap) ────────────────────
    "events_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapUs = 1800L * 1000000L
      val ev = Tables.events(s, dir)
        .withColumn("new_session",
          when(lag(col("ts"), 1).over(w).isNull ||
            graft.functions.GraftFunctions.tsEpochMicros(col("ts")) -
              graft.functions.GraftFunctions.tsEpochMicros(lag(col("ts"), 1).over(w)) > gapUs,
            1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // ── Streaming-analog: tumbling-window aggregation ────────────────────
    "events_windowed_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("window_start"), col("event_type"))),

    // ── Streaming-analog: native session_window aggregation — the same
    // gap-merge semantics Structured Streaming uses (EventStreams has
    // the streaming twin), exercised in batch where the oracle can
    // recompute it via the lag-gap construction. ────────────────────────
    "events_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("value_cents"))
        .orderBy(col("user_id"), col("session_start"))),

    // ── Corpus assembly: concat-and-chunk sequence packing ──────────────
    // Where each document lands in the fixed-size token-chunk stream,
    // per shard — the layout step between cleaning and tokenization.
    "corpus_pack_chunks" -> ((s, dir) =>
      graft.ops.Corpus.packChunks(Tables.documents(s, dir), "doc_id", "text",
          nShards = 8, chunkTokens = 256)
        .orderBy(col("doc_id"))),

    // ── Corpus assembly: deterministic stratified sampling ──────────────
    // Content-hash mixture control: per-language keep rates with an
    // engine-portable hex-threshold u < p test (no rand(), replay-safe).
    "corpus_sample_stratified" -> ((s, dir) =>
      graft.ops.Corpus.sampleStratified(Tables.documents(s, dir),
          "doc_id", "lang",
          rates = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.125, "es" -> 0.25),
          defaultRate = 0.0625, seed = "graft42")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // ── Corpus assembly: per-domain quota (cap the biggest domains) ─────
    "corpus_domain_quota" -> ((s, dir) =>
      graft.ops.Corpus.domainQuota(Tables.documents(s, dir), "lang",
          quota = 40,
          ordering = Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("qrank"))
        .orderBy(col("doc_id"))),

    // ── Corpus assembly: benchmark decontamination ──────────────────────
    // Planted leaks (benchmark texts with a prefix, shifted ids) must be
    // flagged by 8-token shingle overlap; the oracle enumerates overlap
    // exhaustively, so natural collisions agree across engines too.
    "corpus_decontaminate" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val bench = d.filter(col("doc_id") % 97 === 0)
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
        .unionByName(bench.select((col("doc_id") + 300000).as("doc_id"),
          concat(lit("leaked copy "), col("text")).as("text")))
      graft.ops.Corpus.decontaminate(corpus, bench, "doc_id", "text",
          shingleLen = 8)
        .orderBy(col("doc_id"))
    }),

    // ── Corpus: BLOOM-prefiltered decontamination — same contaminated
    // ids as corpus_decontaminate (the bloom only pre-filters; an exact
    // semi-join on the real shingles kills its false positives), but
    // the corpus side never shuffles even when the benchmark shingle
    // set exceeds the broadcast budget. Oracle: identical enumeration
    // to corpus_decontaminate's, because the OUTPUT is identical. ────────
    "corpus_decontaminate_bloom" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val bench = d.filter(col("doc_id") % 97 === 0)
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
        .unionByName(bench.select((col("doc_id") + 300000).as("doc_id"),
          concat(lit("leaked copy "), col("text")).as("text")))
      graft.ops.Corpus.decontaminateBloom(corpus, bench, "doc_id", "text",
          shingleLen = 8)
        .orderBy(col("doc_id"))
    }),

    // ── Corpus: exact-size deterministic sample — 20 docs per language
    // by content-hash rank (nested under size increases; WindowGroupLimit
    // discards over-quota rows map-side). ───────────────────────────────
    "corpus_sample_exact_n" -> ((s, dir) =>
      graft.ops.Corpus.sampleExactN(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", n = 20, seed = "ev1")
        .orderBy(col("doc_id"))),

    // ── Corpus: graded contamination — per-document benchmark-shingle
    // overlap SHARE (the review-form of binary decontamination). Same
    // broadcast shape; one map-side-combined per-doc count. ─────────────
    "corpus_contamination_share" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val bench = d.filter(col("doc_id") % 97 === 0)
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
        .unionByName(bench.select((col("doc_id") + 300000).as("doc_id"),
          concat(lit("leaked copy "), col("text")).as("text")))
      graft.ops.Corpus.contaminationShare(corpus, bench, "doc_id", "text",
          shingleLen = 8)
        .filter(col("n_hit") > 0)
        .orderBy(col("doc_id"))
    }),

    // ── Text: within-document duplicated-ngram coverage (Gopher's
    // dup_ngram_frac): the fraction of token positions covered by a
    // 2-gram occurring ≥ 2 times in the SAME document — the quality
    // signal that catches internal boilerplate repetition distinct from
    // the cross-document span dedup. Shuffles on (doc, gram) then doc —
    // per-document cardinalities, never corpus-wide. ────────────────────
    "text_dup_ngram_frac" -> ((s, dir) => {
      // the whole signal is per-document, so it's ONE fused kernel pass
      // (graft_dup_ngram_cov) — the previous corpus-wide (doc, gram)
      // window + position-distinct shuffle formulation survives as the
      // reference semantics in OpsSpec's parity test and the oracle SQL
      val st = call_function("graft_dup_ngram_cov", col("text"), lit(2))
      Tables.documents(s, dir)
        .select(col("doc_id"), st.getField("n_tokens").as("n_tokens"),
          st.getField("n_dup_tokens").as("n_dup_tokens"))
        .filter(col("n_tokens") >= 2)
        .select(col("doc_id"), col("n_tokens"), col("n_dup_tokens"),
          round(col("n_dup_tokens") * lit(1.0) / col("n_tokens"), 6)
            .as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    // ── Corpus assembly: deterministic global shuffle ───────────────────
    // (shard, pos) IS the total order; per-shard windows only — the
    // randomize-before-training pass without a global sort.
    "corpus_global_shuffle" -> ((s, dir) =>
      graft.ops.Corpus.deterministicShuffle(
          Tables.documents(s, dir).select("doc_id"), "doc_id", seed = "shuf7")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))),

    // ── Skew-safe big×small join via deterministic salting — the manual
    // mitigation for hot keys AQE's skew-split can't fix (a single hot
    // key within one logical partition). Salting is result-invariant:
    // the oracle is the PLAIN join + aggregate. Salt derives from the
    // fact row's unique id (retry-safe; never rand()/monotonic id). ─────
    "join_salted_skew" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Scale.saltedJoin(li, o, Seq("l_orderkey"),
          saltFactor = 4, saltOn = Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("revenue_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // ── Text: global token frequencies, top-20 — the vocabulary-building
    // pass. Explode → hash agg (map-side combined: the shuffle carries
    // one partial count per distinct token per partition, not one row
    // per token occurrence) → TakeOrderedAndProject (per-partition
    // top-k + driver merge, no global sort). ────────────────────────────
    "text_word_freq_topk" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)),

    // ── Text: per-document top-3 characteristic terms by a log-free
    // tf-idf (integer ops + one IEEE division → bitwise cross-engine
    // score parity; a ln-based idf can flip near-tied RANKS between
    // engines' 1-ulp libm implementations). ─────────────────────────────
    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(
          Tables.documents(s, dir).select("doc_id", "text"),
          "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // ── Text: exact edit distance (fuzzy matching; integer DP — same
    // algorithm both engines, no float parity risk) ─────────────────────
    "text_levenshtein" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          levenshtein(
            substring(col("text"), 1, 80),
            substring(concat(lit("typo "), col("text")), 1, 80))
            .cast("long").as("edit_distance"))
        .orderBy(col("doc_id"))),

    // ── Text: token-distribution entropy — low entropy = templated or
    // keyword-stuffed text (complements the n-gram repetition ratio).
    // Two map-side-combined shuffles: (doc, token) counts, then doc. ────
    "text_ngram_entropy" -> ((s, dir) => {
      val toks = filter(split(coalesce(col("text"), lit("")), "\\s+"),
        t => t =!= "")
      val tk = Tables.documents(s, dir)
        .select(col("doc_id"), explode(toks).as("term"))
      val c = tk.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("c"))
      val n = c.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      val p = col("c") * lit(1.0) / col("n")
      c.join(n, Seq("doc_id"))
        .groupBy(col("doc_id"), col("n"))
        .agg(round(-sum(p * log(p)), 6).as("token_entropy"))
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          col("token_entropy"))
        .orderBy(col("doc_id"))
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

    // ── Text: repetition ratios (Gopher-style quality signal) ───────────
    "text_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.ops.TextAnalysis.ngramDistinctRatio(col("text"), 2)
            .as("distinct_2gram_ratio"),
          graft.ops.TextAnalysis.ngramDistinctRatio(col("text"), 3)
            .as("distinct_3gram_ratio"))
        .orderBy(col("doc_id"))),

    // ── Events: JSON property extraction through the VARIANT type —
    // Spark 4's semi-structured path (parse once into variant, typed
    // get at query time). Narrow map; the variant never shuffles. ──────
    "events_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k_val"))
        .orderBy(col("event_id"))),

    // ── Text: adjacent-token pair counts, top-20 — the tokenizer-
    // training (BPE merge) statistic. Kernel multiset grams (repeats
    // count, <2-token docs contribute nothing) → map-side-combined
    // hash agg → TakeOrderedAndProject. ─────────────────────────────────
    "text_bpe_pairs" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(graft.ops.TextAnalysis.ngramList(col("text"), 2))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(20)),

    // ── Corpus: leakage-safe train/test split — split by near-dup
    // CLUSTER hash, so no verified near-dup pair straddles the split
    // (the intra-corpus counterpart of decontamination). ────────────────
    "corpus_split_leakage_safe" -> ((s, dir) =>
      graft.ops.Corpus.splitByNearDupCluster(
          withPlantedNearDups(s, dir), "doc_id", "text",
          minJaccard = 0.8, testFrac = 0.1)
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))),

    // ── Corpus: partitioned output layout — route by (language, length
    // bucket), write hive-partitioned with the file-count/sort
    // contract, READ BACK and count per partition: the oracle checks
    // the full write→read round trip, not just the routing columns. ─────
    "corpus_write_layout" -> ((s, dir) => {
      val root = QueryScratch.freshPath("layout")
      val routed = graft.ops.TextAnalysis
        .langIdScores(Tables.documents(s, dir), col("text"))
        .select(col("doc_id"), col("text"), col("predicted_lang"),
          graft.ops.Corpus.lengthBucket(col("text")).as("bucket"))
      graft.ops.Corpus.writeLayout(routed, s"$root/corpus",
        partitionCols = Seq("predicted_lang", "bucket"),
        sortCols = Seq("doc_id"))
      s.read.parquet(s"$root/corpus")
        .groupBy(col("predicted_lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("predicted_lang"), col("bucket"))
    }),

    // ── Near-dup via winnowing: fingerprint-sharing candidates (with
    // the MOSS boilerplate cap), exact-Jaccard verified — candidates
    // are structurally complete for pairs sharing a 6-token run, so the
    // planted twins are found deterministically. ────────────────────────
    "dedup_winnow" -> ((s, dir) =>
      Dedup.winnowNearDupPairs(withPlantedNearDups(s, dir), "doc_id",
          "text", minJaccard = 0.8)
        .select(col("a_id"), col("b_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))),

    // ── Text: winnowing fingerprints (MOSS) — windowed rightmost-min
    // selection over portable md5-derived gram hashes; any shared
    // window+k-1 token run between documents shares a fingerprint. ──────
    "text_winnow" -> ((s, dir) =>
      graft.ops.TextAnalysis.winnowFingerprints(
        Tables.documents(s, dir), "doc_id", "text", k = 3, window = 4)
        .orderBy(col("doc_id"), col("fp_pos"), col("fp"))),

    // ── Text: exact heavy-hitter tokens via a fixed-memory Misra-Gries
    // sketch (superset-guaranteed candidates) + exact recount of ≤ k
    // keys — the head of a Zipf vocabulary WITHOUT shuffling its tail.
    // The oracle recomputes the ground truth with a plain GROUP BY /
    // HAVING; equality holds because the sketch phase cannot lose a
    // true heavy hitter and the recount is exact. ───────────────────────
    "text_heavy_hitters" -> ((s, dir) =>
      graft.ops.TextAnalysis.heavyHitters(
        Tables.documents(s, dir), col("text"), minShare = 0.002)
        .orderBy(col("n_occurrences").desc, col("token"))),

    // ── Text: the full BPE merge LOOP — 4 rounds of top-pair → fuse →
    // recount (driver-loop over a distributed aggregate, like
    // Learn.fitLogistic). The oracle unrolls the same 4 rounds as
    // static CTE stages; the merge itself is a sentinel-guarded
    // `replace`, identical left-to-right non-overlapping semantics in
    // both engines. ─────────────────────────────────────────────────────
    "text_bpe_merges" -> ((s, dir) =>
      graft.ops.TextAnalysis.bpeMerges(
        Tables.documents(s, dir), col("text"), merges = 4)
        .orderBy(col("merge_step"))),

    // ── Text: BPE ENCODE — tokenize the corpus with the merges learned
    // by bpeTrain (train: 4 corpus passes; encode: ONE narrow pass, the
    // 4 sentinel replaces composed in the scan projection). The oracle
    // replays the same 4 learned rounds as static CTEs, then hashes
    // each document's final token sequence — any divergence in merge
    // order, boundary guarding, or token splitting breaks the hash. ─────
    "text_bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
      val learned = graft.ops.TextAnalysis.bpeTrain(docs, col("text"), merges = 4)
      graft.ops.TextAnalysis.bpeEncode(docs, col("text"),
          learned.map { case (_, l, r, _) => (l, r) })
        .select(col("doc_id"), col("n_bpe_tokens"),
          md5(array_join(col("bpe_tokens"), 1.toChar.toString)).as("enc_hash"))
        .orderBy(col("doc_id"))
    }),

    // ── Text: composed logistic quality classifier — fixed-weight
    // sigmoid over fused kernel metrics; threshold applied to the
    // 6-dp ROUNDED score (exp is 1-ulp accurate, not correctly rounded,
    // so a raw-score threshold could flip `keep` across engines). ───────
    "text_quality_logistic" -> ((s, dir) => {
      val q = round(graft.ops.TextAnalysis.qualityLogistic(col("text")), 6)
      Tables.documents(s, dir)
        .select(col("doc_id"), q.as("quality"),
          (q >= 0.945).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // ── Corpus assembly: token-length buckets for pad-efficient
    // batching (integer threshold CASEs — no float log2 boundaries). ────
    "corpus_length_buckets" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(graft.ops.Corpus.lengthBucket(col("text")).as("bucket"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("bucket")),

    // ── Text: C4-style global line dedup — boilerplate footer lines are
    // PLANTED on every document (SQL-expressible construction: split the
    // text on a common word, append two shared footer lines), so the
    // oracle verifies that each footer survives only in the first
    // document corpus-wide while every document's own lines remain. ─────
    "text_dedup_lines" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(
            call_function("replace", col("text"), lit(" the "), lit("\n")),
            lit("\nsubscribe to our newsletter for updates"),
            lit("\nall rights reserved site footer")).as("text"))
      graft.ops.Dedup.dedupLinesGlobal(corpus, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ── Corpus: token-budget mixture — per-source keep rates derived
    // from aggregate token totals (en/de downsampled, zh budget above
    // total → keep-all, fr unbudgeted → keep-all, es zero → drop-all).
    // Rates are IEEE-double arithmetic both engines reproduce exactly. ──
    "corpus_mix_budget" -> ((s, dir) =>
      graft.ops.Corpus.mixByTokenBudget(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "lang", "text",
        budgets = Map("en" -> 4000L, "de" -> 1500L, "zh" -> 999999L, "es" -> 0L),
        seed = "mix9")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy(col("doc_id"))),

    // ── Corpus: quality-WEIGHTED sampling — keep probability = the
    // document's own 6-dp-rounded logistic quality score (soft curation,
    // vs corpus_filter's hard threshold). Per-row fixed-point threshold
    // against the same md5 draw as every sampler; exact replay. ─────────
    "corpus_sample_by_score" -> ((s, dir) => {
      val q = round(graft.ops.TextAnalysis.qualityLogistic(col("text")), 6)
      graft.ops.Corpus.sampleByScore(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", q, seed = "qs3")
        .select(col("doc_id"), q.as("quality"))
        .orderBy(col("doc_id"))
    }),

    // ── Corpus: temperature-flattened mixture — keep rate
    // (t_min/t_s)^(1-tau) per source, tau=0.5 so the exponent computes
    // via IEEE-exact sqrt (pow's 1-ulp slack is the one cross-engine
    // divergence risk); rates round to 6 dp before the fixed-point
    // threshold. Smallest source keeps everything by construction. ──────
    "corpus_mix_temperature" -> ((s, dir) =>
      graft.ops.Corpus.mixByTemperature(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "lang", "text", tau = 0.5, seed = "temp7")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy(col("doc_id"))),

    // ── Corpus: sliding-window chunking with overlap — the RAG/context
    // layout (packChunks is the pretraining concat-and-chunk layout).
    // Pure narrow map + explode, no shuffle (plan-asserted). ────────────
    "corpus_chunk_overlap" -> ((s, dir) =>
      graft.ops.Corpus.chunkOverlap(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", chunkTokens = 40, strideTokens = 30)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // ── Text: BM25 top-k retrieval against a fixed query term set — the
    // lexical-retrieval baseline of a RAG stack. Shuffled rows are the
    // query terms' posting lists only; final top-k plans as
    // TakeOrderedAndProject. Boundary on the 6-dp ROUNDED score. ────────
    "text_bm25_topk" -> ((s, dir) =>
      graft.ops.TextAnalysis.bm25TopK(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text",
        queryTerms = Seq("spark", "vector", "merge", "window"), k = 15)),

    // ── Text: INCREMENTAL BM25 against a persistent bucketed postings
    // index — the retrieval twin of dedup_incremental: ingest the
    // corpus in two batches (keyed merges → replay-safe), then score
    // reading only the query terms' buckets. Incremental == batch
    // exactly, so the oracle is the SAME SQL as text_bm25_topk. ─────────
    "text_bm25_incr" -> ((s, dir) => {
      val root = QueryScratch.freshPath("bm25idx")
      val postings = new graft.pipeline.BucketedStateTable(
        s, s"$root/postings", keyCols = Seq("term", "doc_id"),
        numBuckets = 32, bucketCols = Seq("term"))
      val docLengths = new graft.pipeline.BucketedStateTable(
        s, s"$root/doclen", keyCols = Seq("doc_id"), numBuckets = 16)
      // running (n_docs, sum_dl) row: the query reads two scalars from
      // one bucket instead of aggregating corpus-cardinality doc lengths
      val stats = Some(new graft.pipeline.BucketedStateTable(
        s, s"$root/stats", keyCols = Seq("stat"), numBuckets = 1))
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      graft.ops.TextAnalysis.indexPostings(postings, docLengths,
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", stats)
      graft.ops.TextAnalysis.indexPostings(postings, docLengths,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", stats)
      graft.ops.TextAnalysis.incrementalBm25TopK(postings, docLengths,
        queryTerms = Seq("spark", "vector", "merge", "window"), k = 15,
        stats = stats)
    }),

    // ── Text: bigram-LM quality score (CCNet shape) — model trained ON
    // the corpus (one map-side-combined bigram count), documents scored
    // by mean negative log-likelihood via a skew-tolerant join back on
    // the bigram key. ───────────────────────────────────────────────────
    "text_lm_score" -> ((s, dir) =>
      graft.ops.TextAnalysis.lmBigramScore(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text")
        .orderBy(col("doc_id"))),

    // ── Layout: Morton (Z-order) interleave of two join/filter
    // dimensions — the multi-dimensional clustering key behind min/max
    // file skipping. Pure integer shift/mask arithmetic, exact in any
    // engine; the write-side range partitioning is ScaleSpec-asserted. ──
    "layout_zorder" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.operators.Scale.zorderValue(
            col("l_partkey"), col("l_suppkey")).as("zval"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // ── Join: blocked fuzzy matching — planted last-char typos share
    // their original's prefix block by construction, so the blocked
    // contract is exactly reproducible; distance verified by codegen'd
    // Levenshtein on candidate pairs only. ──────────────────────────────
    "join_fuzzy_blocked" -> ((s, dir) => {
      // distinct entities (min id per name): ER runs on deduped records,
      // and the synthetic part names repeat heavily — raw rows would make
      // every block quadratic in the scale factor
      val p = Tables.part(s, dir).groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("id"))
        .select(col("id"), col("p_name").as("name"))
      val typos = p.filter(col("id") % 3 === 0)
        .select((col("id") + 100000).as("id"),
          concat(expr("substring(name, 1, length(name) - 1)"), lit("x"))
            .as("name"))
      graft.ops.Joins.fuzzyJoinBlocked(p.unionByName(typos),
          "id", "name", blockLen = 6, maxDist = 2)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ── Learn: one distributed logistic-regression gradient pass over
    // kernel-derived document features (label: lang == 'en') at fixed
    // weights — the data-parallel half of the quality-classifier
    // training loop, ONE map-side-combined aggregate. Driver rounding
    // uses HALF_UP to match both engines' round(). ──────────────────────
    "ml_logreg_grad" -> ((s, dir) => {
      val m = graft.ops.TextAnalysis.metrics(col("text"))
      val st = call_function("graft_ngram_stats", col("text"), lit(2))
      val feats = Tables.documents(s, dir).select(
        (m.getField("alpha_chars") * lit(1.0) /
          nullif(m.getField("n_chars"), lit(0L))).as("x_alpha"),
        log(lit(1.0) + m.getField("n_tokens")).as("x_lntok"),
        (st.getField("n_distinct") * lit(1.0) / st.getField("n_grams"))
          .as("x_rep"),
        (col("lang") === "en").cast("double").as("label"))
      val (gw, gb, n) = graft.ops.Learn.logisticGradient(
        feats, Seq("x_alpha", "x_lntok", "x_rep"), "label",
        weights = Seq(0.5, -0.25, 1.0), bias = 0.1)
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      import s.implicits._
      Seq((r6(gw(0)), r6(gw(1)), r6(gw(2)), r6(gb), n))
        .toDF("grad_alpha", "grad_lntok", "grad_rep", "grad_bias", "n_rows")
    }),

    // ── ML: one K-class softmax gradient over document features — the
    // multiclass twin of ml_logreg_grad (3 classes from lang, 2
    // features, fixed literal weights): one map-side-combined aggregate
    // carrying K·(F+1)+1 partial sums. Max-shifted softmax; the oracle
    // mirrors the exact fold association. ───────────────────────────────
    "ml_softmax_grad" -> ((s, dir) => {
      val m = graft.ops.TextAnalysis.metrics(col("text"))
      val feats = Tables.documents(s, dir).select(
        (m.getField("alpha_chars") * lit(1.0) /
          nullif(m.getField("n_chars"), lit(0L))).as("x_alpha"),
        log(lit(1.0) + m.getField("n_tokens")).as("x_lntok"),
        when(col("lang") === "en", "en")
          .when(col("lang") === "de", "de")
          .otherwise("xx").as("label"))
      val (gw, gb, n) = graft.ops.Learn.softmaxGradient(
        feats, Seq("x_alpha", "x_lntok"), "label",
        classes = Seq("en", "de", "xx"),
        weights = Seq(Seq(0.8, -0.1), Seq(-0.3, 0.2), Seq(0.1, 0.05)),
        biases = Seq(0.2, -0.1, 0.0))
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      import s.implicits._
      Seq((r6(gw(0)(0)), r6(gw(0)(1)), r6(gb(0)),
        r6(gw(1)(0)), r6(gw(1)(1)), r6(gb(1)),
        r6(gw(2)(0)), r6(gw(2)(1)), r6(gb(2)), n))
        .toDF("g_en_alpha", "g_en_lntok", "g_en_bias",
          "g_de_alpha", "g_de_lntok", "g_de_bias",
          "g_xx_alpha", "g_xx_lntok", "g_xx_bias", "n_rows")
    }),

    // ── Events: trending types per hour window — the windowed top-k
    // dashboard shape (map-side-combined hourly counts, then a rank
    // whose ≤3 bound pushes a partial WindowGroupLimit). ────────────────
    "events_windowed_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("hour"))
        .orderBy(col("n").desc, col("event_type"))
      hourly.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy(col("hour"), col("rnk"))
    }),

    // ── Events: funnel analysis — strict ordering of FIRST occurrences
    // (first view < first click < first purchase). One map-side-combined
    // shuffle on user_id; conditional mins, no joins, no windows. ───────
    "events_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val perUser = e.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t1"),
        min(when(col("event_type") === "click", col("ts"))).as("t2"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t3"))
      val s1 = col("t1").isNotNull
      val s2 = s1 && col("t2") > col("t1")
      val s3 = s2 && col("t3") > col("t2")
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(s1.cast("long")).as("n_viewed"),
        sum(s2.cast("long")).as("n_clicked_after"),
        sum(s3.cast("long")).as("n_purchased_after"))
    }),

    // ── Events: STRICT ordered funnel — min-chain semantics (stage i+1
    // counts only strictly after the earliest valid stage i, resuming
    // past out-of-order occurrences), which `events_funnel`'s
    // min-per-type comparison cannot express: a user who clicks both
    // before AND after their first view advances here, not there. One
    // shuffle: per-user sorted fold over stage-type events. ─────────────
    "events_funnel_strict" -> ((s, dir) =>
      graft.ops.Events.funnel(Tables.events(s, dir),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))),

    // ── Events: funnel chart counts — users reaching AT LEAST each
    // stage of the strict funnel. ───────────────────────────────────────
    "events_funnel_counts" -> ((s, dir) =>
      graft.ops.Events.funnelCounts(Tables.events(s, dir),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("stage"))),

    // ── Events: cohort retention — users grouped by first-activity week
    // (ISO date_trunc, engine-portable), counted per week offset. Two
    // keyed shuffles (first-week agg, distinct activity weeks). ─────────
    "events_cohort_retention" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      val firstWeek = e.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      val active = e.distinct()
      active.join(firstWeek, Seq("user_id"))
        .select(col("cohort_week"),
          ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week")))
            / 604800L).cast("long").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // ── Profile: distribution drift between two event slices — binned
    // KS gaps + PSI terms (binary-exact bin width 8, so the float
    // division is exact in any engine; ln-carrying PSI rounded 6 dp).
    // The window runs over the BIN frame (≤ ~65 rows), never the data. ──
    "profile_drift" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.ops.Profile.driftBins(
        e.filter(col("event_type") === "click").select(col("value")),
        e.filter(col("event_type") === "view").select(col("value")),
        "value", binWidth = 8.0)
        .orderBy(col("bin"))
    }),

    // ── Warehouse: SCD2 validity intervals — turn an order event
    // history into [valid_from, valid_to) dimension rows (lead() per
    // key; one keyed shuffle, windows bounded by per-customer history). ─
    "scd2_intervals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("valid_from"))
        .withColumn("valid_to",
          date_sub(lead(col("valid_from"), 1).over(w), 1))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),

    // ── Dedup: near-CONTAINMENT pairs — the asymmetric case symmetric
    // Jaccard misses (a 15-token fragment quoted inside its source doc
    // has Jaccard ≈ 0.1 but containment 1.0). Planted fragments =
    // 15-token prefixes of every 7th doc; candidates via shared winnow
    // fingerprints (local, so they survive inside the containing doc),
    // verified by exact distinct-shingle containment. The oracle is the
    // exhaustive ≥-0.9 containment pair set — equality proves the
    // fingerprint candidate stage loses no qualifying pair. ─────────────
    "dedup_containment" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
      val frags = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 15), " ")
            .as("text"))
      Dedup.containmentNearDupPairs(d.unionByName(frags), "doc_id", "text",
          minContainment = 0.9)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ── Corpus: DSIR importance weights (hashed unigram+bigram
    // log-likelihood ratio vs a target domain — here lang='en') — the
    // standard "make the corpus look like the target" selection score.
    // Two bounded bucket aggregates + one narrow scoring projection;
    // the oracle recomputes the same smoothed counts per feature
    // occurrence. ───────────────────────────────────────────────────────
    "corpus_dsir_weights" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      graft.ops.Corpus.dsirWeights(d, "doc_id", "text",
          d.filter(col("lang") === "en"), "text", buckets = 1024)
        .orderBy(col("doc_id"))
    }),

    // ── Corpus: snapshot delta between two corpus versions — the
    // incremental-refresh primitive (recrawl diff → re-process only
    // added ∪ changed, retire removed). Old = docs except doc_id%17=3;
    // new = docs except doc_id%13=5, with text amended where
    // doc_id%11=0 — so all four statuses occur. Each side prunes to
    // (key, md5) BEFORE the one full-outer hash join. ───────────────────
    "corpus_snapshot_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      val oldSnap = d.filter(col("doc_id") % 17 =!= 3)
      val newSnap = d.filter(col("doc_id") % 13 =!= 5)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [v2]")))
            .otherwise(col("text")))
      graft.ops.Corpus.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ── Corpus: the Gopher quality-rule battery — per-rule fail flags
    // + combined keep; planted degenerates (ids −1..−5) each trip a
    // specific rule and one planted healthy doc (−6) passes all seven.
    // Integer-arithmetic thresholds ⇒ bitwise engine parity. ────────────
    "corpus_gopher_rules" -> ((s, dir) => {
      import s.implicits._
      val planted = Seq(
        -6L -> ("the cat sat on of and that have with mat " * 6),
        -5L -> ("the of " + ("42 " * 60)),
        -4L -> ("the of " + ("### " * 60)),
        -3L -> (("the cat sat on the mat and that is that...\n" * 4) +
          "but of course not every line trails off here"),
        -2L -> ("- the first bullet item of the list\n" * 10),
        -1L -> "a b c").toDF("doc_id", "text")
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      TextAnalysis.gopherRules(base.unionByName(planted), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ── Text: C4 line-level cleaning — sentence-ending lines with ≥5
    // words survive, boilerplate markers (lorem ipsum / javascript /
    // braces) kill their line, docs keep ≥3 surviving lines. Corpus
    // text is re-lined on sentence ends ('. ' → '.\n'); planted docs
    // (ids −1..−4) exercise each blocklist path and the keep boundary.
    // cleaned_md5 hashes the surviving lines re-joined — the SAME
    // lines must survive, not merely the same count. ────────────────────
    "text_clean_c4" -> ((s, dir) => {
      import s.implicits._
      val planted = Seq(
        -4L -> ("this line is long enough to survive the filter.\n" * 4),
        -3L -> ("this line mentions lorem ipsum so it dies today.\n" +
          ("a healthy sentence with enough words stays alive.\n" * 3)),
        -2L -> ("enable javascript to view this page properly now.\n" +
          "short line.\nno terminal punctuation on this line either\n" +
          "if (x) { return; } is code not prose.\n" +
          "one surviving sentence is simply not enough here."),
        -1L -> "too short.").toDF("doc_id", "text")
      val base = Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_replace(coalesce(col("text"), lit("")), "\\. ", ".\n")
            .as("text"))
      TextAnalysis.cleanC4(base.unionByName(planted), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

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
      val sem = Similarity.bruteForceTopK(
          stored.filter(col("vec_id") === 0)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
          stored.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
          "q_id", "q_vec", "c_id", "c_vec", k = 15)
        .select(col("c_id").as("doc_id"), col("rank"))
      Similarity.rrfFuse(lex.select(col("doc_id"), col("rank")), sem,
          "doc_id", "rank", k = 10)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }),

    // ── Corpus: cluster-balanced sampling (SemDeDup/topic-balance
    // shape) — nearest-centroid assignment to the 8 deterministic seed
    // centroids (vec_id < 8, the sampleCentroids order), then each
    // cluster capped at 40 rows by the md5 draw. Emits the KEPT rows
    // with cluster and qrank — the oracle must reproduce the exact
    // sampling choice, not just the counts. ─────────────────────────────
    "corpus_cluster_balance" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = Similarity.sampleCentroids(
        e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
        "c_id", "c_vec", 8)
      // sampleCentroids drops zero-norm vectors AFTER taking the 8
      // smallest ids, while the oracle indexes vec_id < 8
      // unconditionally — a zero embedding among the seeds would shift
      // every cluster index and silently desync the comparison. Fail
      // loudly instead: the seed set must be exactly the oracle's.
      require(cents.size == 8,
        "corpus_cluster_balance seeds: a vec_id < 8 embedding is null/zero-norm; " +
          "the DuckDB oracle indexes vec_id < 8 unconditionally and would desync")
      graft.ops.Corpus.clusterBalance(e.select("vec_id", "embedding"),
          "vec_id", "embedding", cents, quota = 40)
        .select(col("cluster"), col("qrank"), col("vec_id"))
        .orderBy(col("cluster"), col("qrank"))
    }),

    // ── Corpus: the Gopher REPETITION battery — dup-line share, top
    // n-gram concentration (n=2..4), duplicated-n-gram coverage
    // (n=5..10), all as integer-threshold fail flags. Planted docs trip
    // each family in isolation: -1 dup lines, -2 total repetition,
    // -3 exactly one repeated 5-token run (fails ONLY dup_5gram),
    // -4 fully distinct (passes everything). ────────────────────────────
    "corpus_gopher_repetition" -> ((s, dir) => {
      import s.implicits._
      val u = (1 to 25).map("u" + _).mkString(" ")
      val v = (1 to 25).map("v" + _).mkString(" ")
      val w = (1 to 60).map("w" + _)
      val planted = Seq(
        -4L -> (w.take(20).mkString(" ") + "\n" + w.slice(20, 40).mkString(" ") +
          "\n" + w.drop(40).mkString(" ")),
        -3L -> ("p1 p2 p3 p4 p5 " + u + " p1 p2 p3 p4 p5 " + v),
        -2L -> ("ha " * 40).trim,
        -1L -> (("same line here\n" * 4) + "unique closer")).toDF("doc_id", "text")
      TextAnalysis.gopherRepetition(
          Tables.documents(s, dir).select(col("doc_id"), col("text"))
            .unionByName(planted),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ── Corpus: no-split bin packing (padded layout) — greedy next-fit
    // in id order per shard; the oracle replays the per-shard recursion
    // with a recursive CTE. (shard, bin) identity is deterministic. ─────
    "corpus_pack_bins" -> ((s, dir) =>
      graft.ops.Corpus.packBins(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text", nShards = 16, binTokens = 512)
        .orderBy(col("doc_id"))),

    // ── Corpus: the per-source quality dashboard — ONE narrow pass
    // computes every per-doc signal (Gopher keep, C4 keep, language,
    // token/char counts from the fused kernel), one tiny aggregate
    // reduces to a row per source. alpha_ratio divides two exact
    // integer sums, so the 6-dp round replays bitwise. ──────────────────
    "corpus_quality_report" -> ((s, dir) =>
      TextAnalysis.qualityReport(
          Tables.documents(s, dir).select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text")),
          "text", "source")
        .orderBy(col("source")))
  )

  def oracles: Map[String, String] = Map(
    // Exhaustive ≥-0.9 distinct-shingle containment pair set over
    // documents ∪ planted 15-token-prefix fragments (ids +200000).
    // max(|A∩B|/|A|, |A∩B|/|B|) — both directions, either side may be
    // the contained one. Docs with no full 3-token shingle drop out on
    // both engines (len(toks) >= 3 here; empty ngram list in Spark).
    "dedup_containment" ->
      """WITH all_docs AS (
        | SELECT doc_id, trim(text) AS t FROM documents WHERE text IS NOT NULL
        | UNION ALL
        | SELECT doc_id + 200000,
        |   array_to_string(regexp_split_to_array(trim(text), '\s+')[1:15], ' ')
        | FROM documents WHERE text IS NOT NULL AND doc_id % 7 = 0),
        |tk AS (SELECT doc_id, regexp_split_to_array(t, '\s+') AS toks FROM all_docs),
        |sh AS (
        | SELECT doc_id, list(DISTINCT gram) AS s FROM (
        |   SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS gram
        |   FROM tk, unnest(range(1, len(toks) - 1)) AS u(i)
        |   WHERE len(toks) >= 3)
        | GROUP BY doc_id)
        |SELECT a_id, b_id, containment FROM (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(greatest(
        |    len(list_intersect(a.s, b.s)) * 1.0 / len(a.s),
        |    len(list_intersect(a.s, b.s)) * 1.0 / len(b.s)), 6) AS containment
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |WHERE containment >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,

    // DSIR log-likelihood-ratio weight per document: hashed (md5-prefix
    // % 1024) unigram+bigram buckets, Laplace-smoothed target(lang=en)
    // vs raw counts, summed per feature occurrence. Token discipline
    // matches the Spark kernel: split of trim(text), NO empty-token
    // filter (empty text → one '' unigram on both engines). Docs whose
    // text is NULL score 0 via the '' coalesce on both engines.
    "corpus_dsir_weights" ->
      """WITH docs AS (
        | SELECT doc_id, lang,
        |  regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        | FROM documents),
        |feats AS (
        | SELECT doc_id, lang, w FROM docs, unnest(t) AS u(w)
        | UNION ALL
        | SELECT doc_id, lang, t[i] || ' ' || t[i + 1]
        | FROM docs, unnest(range(1, len(t))) AS r(i)),
        |fb AS (SELECT doc_id, lang,
        |  CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 1024 AS b FROM feats),
        |tc AS (SELECT b, count(*) AS c FROM fb WHERE lang = 'en' GROUP BY b),
        |tt AS (SELECT count(*) + 1024 AS n FROM fb WHERE lang = 'en'),
        |rc AS (SELECT b, count(*) AS c FROM fb GROUP BY b),
        |rt AS (SELECT count(*) + 1024 AS n FROM fb),
        |pd AS (
        | SELECT doc_id, sum(
        |   ln((coalesce(tc.c, 0) + 1.0) / tt.n) -
        |   ln((coalesce(rc.c, 0) + 1.0) / rt.n)) AS w
        | FROM fb LEFT JOIN tc USING (b) LEFT JOIN rc USING (b), tt, rt
        | GROUP BY doc_id)
        |SELECT d.doc_id, round(coalesce(pd.w, 0.0), 6) AS llr_weight
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Same full-outer key join over (key, md5) with the same CASE order;
    // both engines hash the identical amended text.
    "corpus_snapshot_diff" ->
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
        |o AS (SELECT doc_id, md5(text) AS h FROM d WHERE doc_id % 17 <> 3),
        |n AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [v2]' ELSE text END) AS h
        | FROM d WHERE doc_id % 13 <> 5)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        | CASE WHEN o.h IS NULL THEN 'added'
        |      WHEN n.h IS NULL THEN 'removed'
        |      WHEN o.h = n.h THEN 'unchanged' ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // Gopher battery replay: identical word/line splits, identical
    // integer-arithmetic thresholds (a/b > p/q as a·q > b·p — no float
    // seam anywhere), identical planted degenerates.
    "corpus_gopher_rules" ->
      """WITH base AS (
        | SELECT doc_id, coalesce(text, '') AS t FROM documents
        | UNION ALL
        | SELECT * FROM (VALUES
        |  (-6, repeat('the cat sat on of and that have with mat ', 6)),
        |  (-5, 'the of ' || repeat('42 ', 60)),
        |  (-4, 'the of ' || repeat('### ', 60)),
        |  (-3, repeat('the cat sat on the mat and that is that...' || chr(10), 4)
        |       || 'but of course not every line trails off here'),
        |  (-2, repeat('- the first bullet item of the list' || chr(10), 10)),
        |  (-1, 'a b c')) v(doc_id, t)),
        |m AS (SELECT doc_id, t,
        |  list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS words,
        |  string_split(t, chr(10)) AS lines
        | FROM base),
        |c AS (SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT) AS sum_len,
        |  CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash,
        |  CAST((length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT) AS n_ell,
        |  CAST(len(list_filter(lines, l -> left(ltrim(l), 2) IN ('- ', '* ', '• '))) AS BIGINT) AS n_bullet,
        |  CAST(len(list_filter(lines, l -> right(rtrim(l), 3) = '...')) AS BIGINT) AS n_ellend,
        |  CAST(len(list_filter(words, w -> regexp_matches(w, '\p{L}'))) AS BIGINT) AS n_alpha,
        |  CAST(len(list_filter(words, w -> lower(w) IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stop,
        |  CAST(len(lines) AS BIGINT) AS n_lines
        | FROM m)
        |SELECT doc_id, n_words,
        | (n_words < 50 OR n_words > 100000) AS fail_word_count,
        | (n_words > 0 AND (sum_len < n_words * 3 OR sum_len > n_words * 10)) AS fail_mean_word_len,
        | ((n_hash + n_ell) * 10 > n_words) AS fail_symbol_ratio,
        | (n_bullet * 10 > n_lines * 9) AS fail_bullet_ratio,
        | (n_ellend * 10 > n_lines * 3) AS fail_ellipsis_ratio,
        | (n_words > 0 AND n_alpha * 5 < n_words * 4) AS fail_alpha_ratio,
        | (n_stop < 2) AS fail_stopwords,
        | (NOT (n_words < 50 OR n_words > 100000)
        |  AND NOT (n_words > 0 AND (sum_len < n_words * 3 OR sum_len > n_words * 10))
        |  AND NOT ((n_hash + n_ell) * 10 > n_words)
        |  AND NOT (n_bullet * 10 > n_lines * 9)
        |  AND NOT (n_ellend * 10 > n_lines * 3)
        |  AND NOT (n_words > 0 AND n_alpha * 5 < n_words * 4)
        |  AND NOT (n_stop < 2)) AS keep
        |FROM c ORDER BY doc_id""".stripMargin,

    // C4 line filter replay: same per-line predicate, same re-lining of
    // the corpus text, md5 over the surviving lines re-joined.
    "text_clean_c4" ->
      """WITH base AS (
        | SELECT doc_id, replace(coalesce(text, ''), '. ', '.' || chr(10)) AS t
        | FROM documents
        | UNION ALL
        | SELECT * FROM (VALUES
        |  (-4, repeat('this line is long enough to survive the filter.' || chr(10), 4)),
        |  (-3, 'this line mentions lorem ipsum so it dies today.' || chr(10)
        |       || repeat('a healthy sentence with enough words stays alive.' || chr(10), 3)),
        |  (-2, 'enable javascript to view this page properly now.' || chr(10)
        |       || 'short line.' || chr(10)
        |       || 'no terminal punctuation on this line either' || chr(10)
        |       || 'if (x) { return; } is code not prose.' || chr(10)
        |       || 'one surviving sentence is simply not enough here.'),
        |  (-1, 'too short.')) v(doc_id, t)),
        |l AS (SELECT doc_id, string_split(t, chr(10)) AS lines FROM base),
        |k AS (SELECT doc_id, lines,
        |  list_filter(lines, x ->
        |    right(rtrim(x), 1) IN ('.', '!', '?', '"')
        |    AND len(list_filter(string_split_regex(x, '\s+'), w -> w <> '')) >= 5
        |    AND strpos(lower(x), 'lorem ipsum') = 0
        |    AND strpos(lower(x), 'javascript') = 0
        |    AND strpos(x, '{') = 0) AS kept
        | FROM l)
        |SELECT doc_id,
        | CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(kept) AS BIGINT) AS n_kept,
        | CAST(coalesce(list_sum(list_transform(kept, x -> length(x))), 0) AS BIGINT) AS cleaned_chars,
        | md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5,
        | (len(kept) >= 3) AS keep
        |FROM k ORDER BY doc_id""".stripMargin,

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

    // Cluster-balance replay: centroids are the 8 smallest vec_ids (the
    // sampleCentroids order, 0-indexed by that order), assignment is
    // argmax cosine with first-index tie-break, and the per-cluster cap
    // ranks by the same md5 hex draw — the kept ROWS must match, which
    // pins assignment, draw, and cap simultaneously.
    "corpus_cluster_balance" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cidx,
        |  v AS cv FROM e WHERE vec_id < 8),
        |s AS (SELECT e.vec_id, cents.cidx,
        |  list_dot_product(e.v, cents.cv) /
        |   (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.cv, cents.cv))) AS cos
        | FROM e, cents),
        |a AS (SELECT vec_id, cidx AS cluster FROM (
        |  SELECT vec_id, cidx, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY cos DESC, cidx) AS r FROM s) WHERE r = 1),
        |ranked AS (SELECT cluster, vec_id,
        |  CAST(row_number() OVER (PARTITION BY cluster
        |    ORDER BY substr(md5('cluster-balance:' || CAST(vec_id AS VARCHAR)), 1, 8),
        |      vec_id) AS BIGINT) AS qrank
        | FROM a)
        |SELECT cluster, qrank, vec_id FROM ranked WHERE qrank <= 40
        |ORDER BY cluster, qrank""".stripMargin,

    // Greedy next-fit replay: the per-shard capacity-reset recursion as
    // a recursive CTE joined on rn+1 (set-based: all shards advance one
    // row per iteration; depth = max rows per shard).
    "corpus_pack_bins" ->
      """WITH RECURSIVE d AS (
        | SELECT doc_id, doc_id % 16 AS shard,
        |  CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM d),
        |packed AS (
        | SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin, n_tokens AS used
        | FROM r WHERE rn = 1
        | UNION ALL
        | SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
        |  CASE WHEN p.used + r.n_tokens <= 512 THEN p.bin ELSE p.bin + 1 END,
        |  CASE WHEN p.used + r.n_tokens <= 512 THEN p.used + r.n_tokens ELSE r.n_tokens END
        | FROM r JOIN packed p ON r.shard = p.shard AND r.rn = p.rn + 1)
        |SELECT doc_id, shard, n_tokens, bin FROM packed ORDER BY doc_id""".stripMargin,

    // Repetition battery replay: same sorted-adjacent dup-line scan,
    // same n-gram groupings per n (top share and duplicated-position
    // coverage), all thresholds as a*100 > b*p integer comparisons.
    "corpus_gopher_repetition" ->
      """WITH base AS (
        | SELECT doc_id, coalesce(text, '') AS t FROM documents
        | UNION ALL
        | SELECT * FROM (VALUES
        |  (-4, array_to_string(list_transform(range(1, 21), i -> 'w' || i), ' ')
        |       || chr(10) || array_to_string(list_transform(range(21, 41), i -> 'w' || i), ' ')
        |       || chr(10) || array_to_string(list_transform(range(41, 61), i -> 'w' || i), ' ')),
        |  (-3, 'p1 p2 p3 p4 p5 '
        |       || array_to_string(list_transform(range(1, 26), i -> 'u' || i), ' ')
        |       || ' p1 p2 p3 p4 p5 '
        |       || array_to_string(list_transform(range(1, 26), i -> 'v' || i), ' ')),
        |  (-2, trim(repeat('ha ', 40))),
        |  (-1, repeat('same line here' || chr(10), 4) || 'unique closer')) v(doc_id, t)),
        |lns AS (SELECT doc_id,
        |  list_filter(string_split(t, chr(10)), l -> l <> '') AS ls,
        |  list_sort(list_filter(string_split(t, chr(10)), l -> l <> '')) AS ss
        | FROM base),
        |dl AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(range(1, len(ls) + 1), i ->
        |    (i > 1 AND ss[i] = ss[i - 1]) OR
        |    (i < len(ls) AND ss[i] = ss[i + 1]))) AS BIGINT) AS n_dup_lines
        | FROM lns),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(t), '\s+') AS tk FROM base),
        |ns AS (SELECT unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS n),
        |g AS (SELECT doc_id, n, CAST(i AS BIGINT) AS i,
        |  array_to_string(tk[i:i+n-1], ' ') AS gram,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(tk) - n + 1 AS BIGINT) AS n_pos
        | FROM toks, ns, unnest(range(1, len(tk) - n + 2)) AS u(i)
        | WHERE len(tk) >= n),
        |counts AS (SELECT doc_id, n, gram, count(*) AS c,
        |  min(n_pos) AS n_pos, min(n_tokens) AS n_tokens
        | FROM g GROUP BY 1, 2, 3),
        |top AS (SELECT doc_id, n, max(c) AS top_count, min(n_pos) AS n_pos
        | FROM counts GROUP BY 1, 2),
        |dupg AS (SELECT doc_id, n, gram, min(n_tokens) AS n_tokens
        | FROM counts WHERE c >= 2 GROUP BY 1, 2, 3),
        |cov AS (SELECT DISTINCT doc_id, n, pos FROM (
        |  SELECT g.doc_id, g.n, unnest(range(g.i, g.i + g.n)) AS pos
        |  FROM g JOIN dupg USING (doc_id, n, gram)) u0),
        |covc AS (SELECT doc_id, n, CAST(count(*) AS BIGINT) AS n_dup
        | FROM cov GROUP BY 1, 2),
        |tokn AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks),
        |tflag AS (SELECT doc_id,
        |  coalesce(bool_or(CASE WHEN n = 2 THEN top_count * 100 > n_pos * 20 END), false) AS fail_top_2gram,
        |  coalesce(bool_or(CASE WHEN n = 3 THEN top_count * 100 > n_pos * 18 END), false) AS fail_top_3gram,
        |  coalesce(bool_or(CASE WHEN n = 4 THEN top_count * 100 > n_pos * 16 END), false) AS fail_top_4gram
        | FROM top GROUP BY doc_id),
        |dflag AS (SELECT c.doc_id,
        |  coalesce(bool_or(CASE WHEN n = 5 THEN n_dup * 100 > t.n_tokens * 15 END), false) AS fail_dup_5gram,
        |  coalesce(bool_or(CASE WHEN n = 6 THEN n_dup * 100 > t.n_tokens * 14 END), false) AS fail_dup_6gram,
        |  coalesce(bool_or(CASE WHEN n = 7 THEN n_dup * 100 > t.n_tokens * 13 END), false) AS fail_dup_7gram,
        |  coalesce(bool_or(CASE WHEN n = 8 THEN n_dup * 100 > t.n_tokens * 12 END), false) AS fail_dup_8gram,
        |  coalesce(bool_or(CASE WHEN n = 9 THEN n_dup * 100 > t.n_tokens * 11 END), false) AS fail_dup_9gram,
        |  coalesce(bool_or(CASE WHEN n = 10 THEN n_dup * 100 > t.n_tokens * 10 END), false) AS fail_dup_10gram
        | FROM covc c JOIN tokn t USING (doc_id) GROUP BY c.doc_id)
        |SELECT b.doc_id, dl.n_lines,
        | (dl.n_dup_lines * 100 > dl.n_lines * 30) AS fail_dup_lines,
        | coalesce(tf.fail_top_2gram, false) AS fail_top_2gram,
        | coalesce(tf.fail_top_3gram, false) AS fail_top_3gram,
        | coalesce(tf.fail_top_4gram, false) AS fail_top_4gram,
        | coalesce(df.fail_dup_5gram, false) AS fail_dup_5gram,
        | coalesce(df.fail_dup_6gram, false) AS fail_dup_6gram,
        | coalesce(df.fail_dup_7gram, false) AS fail_dup_7gram,
        | coalesce(df.fail_dup_8gram, false) AS fail_dup_8gram,
        | coalesce(df.fail_dup_9gram, false) AS fail_dup_9gram,
        | coalesce(df.fail_dup_10gram, false) AS fail_dup_10gram,
        | (NOT (dl.n_dup_lines * 100 > dl.n_lines * 30)
        |  AND NOT coalesce(tf.fail_top_2gram, false)
        |  AND NOT coalesce(tf.fail_top_3gram, false)
        |  AND NOT coalesce(tf.fail_top_4gram, false)
        |  AND NOT coalesce(df.fail_dup_5gram, false)
        |  AND NOT coalesce(df.fail_dup_6gram, false)
        |  AND NOT coalesce(df.fail_dup_7gram, false)
        |  AND NOT coalesce(df.fail_dup_8gram, false)
        |  AND NOT coalesce(df.fail_dup_9gram, false)
        |  AND NOT coalesce(df.fail_dup_10gram, false)) AS keep
        |FROM base b
        |JOIN dl USING (doc_id)
        |LEFT JOIN tflag tf USING (doc_id)
        |LEFT JOIN dflag df USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    // Per-source dashboard replay: the gopher/c4/langid per-doc columns
    // from their own oracles, reduced per source; alpha_ratio from two
    // exact integer sums.
    "corpus_quality_report" ->
      """WITH base AS (SELECT source, coalesce(text, '') AS t FROM documents),
        |per AS (SELECT source, t,
        |  list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS words,
        |  string_split(t, chr(10)) AS lines,
        |  CAST(len(regexp_split_to_array(trim(t), '\s+')) AS BIGINT) AS n_tok,
        |  CAST(length(regexp_replace(t, '[^\p{L}]', '', 'g')) AS BIGINT) AS alpha,
        |  CAST(length(t) AS BIGINT) AS chars,
        |  CAST(len(regexp_extract_all(lower(t), '\b(the|and|of|to|is|was)\b')) AS BIGINT) AS score_en,
        |  CAST(len(regexp_extract_all(lower(t), '\b(der|und|die|nicht|das|ist)\b')) AS BIGINT) AS score_de,
        |  CAST(len(regexp_extract_all(lower(t), '\b(le|la|et|les|une|est)\b')) AS BIGINT) AS score_fr,
        |  CAST(len(regexp_extract_all(lower(t), '\b(el|los|una|por|las|este)\b')) AS BIGINT) AS score_es
        | FROM base),
        |calc AS (SELECT source, n_tok, alpha, chars,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT) AS sum_len,
        |  CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash,
        |  CAST((length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT) AS n_ell,
        |  CAST(len(list_filter(lines, l -> left(ltrim(l), 2) IN ('- ', '* ', '• '))) AS BIGINT) AS n_bullet,
        |  CAST(len(list_filter(lines, l -> right(rtrim(l), 3) = '...')) AS BIGINT) AS n_ellend,
        |  CAST(len(list_filter(words, w -> regexp_matches(w, '\p{L}'))) AS BIGINT) AS n_alpha_w,
        |  CAST(len(list_filter(words, w -> lower(w) IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stop,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(lines, l ->
        |    right(rtrim(l), 1) IN ('.', '!', '?', '"')
        |    AND len(list_filter(string_split_regex(l, '\s+'), w -> w <> '')) >= 5
        |    AND strpos(lower(l), 'lorem ipsum') = 0
        |    AND strpos(lower(l), 'javascript') = 0
        |    AND strpos(l, '{') = 0)) AS BIGINT) AS n_kept,
        |  CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |       WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |       WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |       ELSE 'es' END AS plang
        | FROM per),
        |doc AS (SELECT source, n_tok, alpha, chars, plang,
        |  (NOT (n_words < 50 OR n_words > 100000)
        |   AND NOT (n_words > 0 AND (sum_len < n_words * 3 OR sum_len > n_words * 10))
        |   AND NOT ((n_hash + n_ell) * 10 > n_words)
        |   AND NOT (n_bullet * 10 > n_lines * 9)
        |   AND NOT (n_ellend * 10 > n_lines * 3)
        |   AND NOT (n_words > 0 AND n_alpha_w * 5 < n_words * 4)
        |   AND NOT (n_stop < 2)) AS gk,
        |  (n_kept >= 3) AS ck
        | FROM calc)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(*) FILTER (WHERE gk) AS BIGINT) AS n_pass_gopher,
        | CAST(count(*) FILTER (WHERE ck) AS BIGINT) AS n_pass_c4,
        | CAST(count(*) FILTER (WHERE plang = 'en') AS BIGINT) AS n_docs_en,
        | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        | CASE WHEN sum(chars) = 0 THEN NULL
        |      ELSE round(sum(alpha) * 1.0 / sum(chars), 6) END AS alpha_ratio
        |FROM doc GROUP BY source ORDER BY source""".stripMargin,
    // Exhaustive enumeration of the ≥0.8 shingle-Jaccard pair set — the
    // LSH-verified Spark result must equal it (same shingle definition:
    // whitespace tokens, 3-token shingles, one shingle when shorter).
    "dedup_minhash_lsh" ->
      """WITH all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM all_docs),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS s
        | FROM tk),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(list_concat(a.s, b.s))) AS j
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, round(j, 6) AS jaccard FROM p WHERE j >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,

    // Same exhaustive enumeration, restricted to pairs involving the
    // incrementally-ingested batch (ids >= 100000).
    "dedup_incr_near" ->
      """WITH all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM all_docs),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS s
        | FROM tk),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(list_concat(a.s, b.s))) AS j
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, round(j, 6) AS jaccard FROM p
        |WHERE j >= 0.8 AND b_id >= 100000
        |ORDER BY a_id, b_id""".stripMargin,

    // Transitive closure (recursive CTE) over the same verified pair set
    // → min-member component labels, matching Dedup.clusterPairs.
    "dedup_cluster" ->
      """WITH RECURSIVE all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM all_docs),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS s
        | FROM tk),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(list_concat(a.s, b.s))) AS j
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |edg AS (SELECT a_id AS s, b_id AS d FROM p WHERE j >= 0.8
        |        UNION SELECT b_id, a_id FROM p WHERE j >= 0.8),
        |reach(s, d) AS (
        | SELECT s, d FROM edg
        | UNION
        | SELECT r.s, edg.d FROM reach r JOIN edg ON r.d = edg.s)
        |SELECT s AS id, least(s, min(d)) AS cluster FROM reach GROUP BY s
        |ORDER BY id""".stripMargin,

    // All exact-duplicate text pairs in the exact-dup-planted corpus —
    // banded SimHash finds these deterministically (identical text ⇒
    // identical simhash ⇒ every band collides) and text-verifies them.
    "dedup_simhash" ->
      """WITH all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 200000, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM all_docs a JOIN all_docs b ON a.text = b.text AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,

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

    // Per-row qualifying-hit count and max similarity, enumerated
    // exhaustively (the planted exact copies are the only ≥-threshold
    // pairs on this geometry, and they collide deterministically).
    "corpus_contamination_semantic" ->
      """WITH e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bench AS (SELECT v AS bv FROM e WHERE vec_id % 40 = 0),
        |hits AS (SELECT e.vec_id,
        |  list_dot_product(e.v, b.bv) /
        |   (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(b.bv, b.bv))) AS cos
        | FROM e JOIN bench b ON true)
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits,
        |  round(max(cos), 4) AS max_cos
        |FROM hits WHERE cos >= 0.95 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // Survivors = corpus minus every row within 0.95 cosine of some
    // benchmark vector, enumerated exhaustively (the planted exact
    // copies are the only qualifying pairs on this geometry, and they
    // share their original's LSH bucket deterministically).
    "corpus_decontaminate_semantic" ->
      """WITH e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bench AS (SELECT v AS bv FROM e WHERE vec_id % 40 = 0),
        |hits AS (SELECT DISTINCT e.vec_id FROM e JOIN bench b
        | ON list_dot_product(e.v, b.bv) /
        |    (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(b.bv, b.bv))) >= 0.95)
        |SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT vec_id FROM hits)
        |ORDER BY vec_id""".stripMargin,

    // Recall probe: the oracle replays the engine's sign-LSH exactly —
    // the hyperplane components are deterministic constants of
    // (plane, dim) (Hashing.planeComponent, splitmix64-derived), so
    // they are inlined below as literal DOUBLE arrays generated from
    // the very same function. Caught = collides in some band (replayed
    // sign bits) AND exact cosine ≥ 0.95; recall = caught / true leaks
    // (brute force). Both engines do identical double arithmetic on
    // identical inputs, so the caught set matches bit-for-bit.
    "corpus_decontaminate_recall" -> {
      val planeRows = (0 until 36).map { p =>
        val comps = (0 until 64)
          .map(d => graft.expressions.Hashing.planeComponent(p, d).toString)
          .mkString(", ")
        s"($p, [$comps])"
      }.mkString(",\n")
      s"""WITH planes(p, comp) AS (SELECT * FROM (VALUES
        |$planeRows
        |) t(p, comp)),
        |bench AS (SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS bv
        | FROM embeddings WHERE vec_id % 40 = 0),
        |variants(variant, coord, delta) AS (SELECT * FROM (VALUES
        | (1, 1, CAST(0.20 AS DOUBLE)), (2, 2, CAST(-0.25 AS DOUBLE)),
        | (3, 3, CAST(0.30 AS DOUBLE)), (4, 4, CAST(-0.35 AS DOUBLE))) v(variant, coord, delta)),
        |planted AS (SELECT src_id * 10 + variant AS leak_id,
        |  list_concat(list_concat(bv[1:coord-1], [bv[coord] + delta]), bv[coord+1:]) AS lv
        | FROM bench, variants),
        |cosines AS (SELECT p.leak_id, b.src_id AS bench_id,
        |  list_dot_product(p.lv, b.bv) /
        |   (sqrt(list_dot_product(p.lv, p.lv)) * sqrt(list_dot_product(b.bv, b.bv))) AS cos
        | FROM planted p, bench b),
        |leaks AS (SELECT DISTINCT leak_id FROM cosines WHERE cos >= 0.95),
        |lsig AS (SELECT p.leak_id, pl.p // 12 AS band,
        |  string_agg(CASE WHEN list_dot_product(p.lv, pl.comp) >= 0 THEN '1' ELSE '0' END,
        |    '' ORDER BY pl.p) AS sub
        | FROM planted p, planes pl GROUP BY p.leak_id, pl.p // 12),
        |bsig AS (SELECT b.src_id AS bench_id, pl.p // 12 AS band,
        |  string_agg(CASE WHEN list_dot_product(b.bv, pl.comp) >= 0 THEN '1' ELSE '0' END,
        |    '' ORDER BY pl.p) AS sub
        | FROM bench b, planes pl GROUP BY b.src_id, pl.p // 12),
        |hits AS (SELECT c.leak_id, ls.band
        | FROM cosines c
        | JOIN lsig ls ON ls.leak_id = c.leak_id
        | JOIN bsig bs ON bs.bench_id = c.bench_id AND bs.band = ls.band AND bs.sub = ls.sub
        | WHERE c.cos >= 0.95),
        |settings(bands) AS (SELECT * FROM (VALUES (1), (3)) s(bands)),
        |caught AS (SELECT s.bands, count(DISTINCT h.leak_id) AS n_caught
        | FROM settings s LEFT JOIN hits h ON h.band < s.bands
        | GROUP BY s.bands)
        |SELECT c.bands, (SELECT count(*) FROM leaks) AS n_leaks,
        |  c.n_caught,
        |  round(CAST(c.n_caught AS DOUBLE) / (SELECT count(*) FROM leaks), 4) AS recall
        |FROM caught c ORDER BY bands""".stripMargin
    },

    // Survivors = everything minus ids with a smaller node reachable in
    // the ≥0.95 cosine pair graph (same closure technique as
    // dedup_cluster's oracle; same pair geometry as embed_near_dups).
    "dedup_semantic" ->
      """WITH RECURSIVE all_e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        | UNION ALL
        | SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 50 = 0),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        | FROM all_e a JOIN all_e b ON a.vec_id < b.vec_id),
        |edg AS (SELECT a_id AS s, b_id AS d FROM p WHERE cos >= 0.95
        |        UNION SELECT b_id, a_id FROM p WHERE cos >= 0.95),
        |reach(s, d) AS (
        | SELECT s, d FROM edg
        | UNION
        | SELECT r.s, edg.d FROM reach r JOIN edg ON r.d = edg.s),
        |dropped AS (SELECT s AS id FROM reach GROUP BY s HAVING min(d) < s)
        |SELECT vec_id FROM all_e WHERE vec_id NOT IN (SELECT id FROM dropped)
        |ORDER BY vec_id""".stripMargin,

    "dedup_exact" ->
      """WITH all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0)
        |SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_md5,
        | min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM all_docs WHERE text IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_incremental" ->
      """WITH seen AS (
        | SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
        | FROM documents),
        |batch AS (
        | SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 7 = 1
        | UNION ALL
        | SELECT doc_id + 400000, text || ' fresh' FROM documents WHERE doc_id % 9 = 2
        | UNION ALL
        | SELECT doc_id + 500000, text || ' fresh' FROM documents WHERE doc_id % 9 = 2
        | UNION ALL
        | SELECT doc_id + 600000, text || ' unique' FROM documents WHERE doc_id % 11 = 3),
        |firsts AS (
        | SELECT min(doc_id) AS doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
        | FROM batch GROUP BY 2)
        |SELECT f.doc_id, f.content_hash
        |FROM firsts f LEFT JOIN seen s ON f.content_hash = s.h
        |WHERE s.h IS NULL
        |ORDER BY f.doc_id""".stripMargin,

    "text_dedup_spans" ->
      """WITH corpus AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0
        |   THEN text || ' subscribe to our newsletter for daily updates today'
        |   ELSE text END AS text
        | FROM documents),
        |toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS ts
        | FROM corpus),
        |pos AS (
        | SELECT doc_id, unnest(range(1, len(ts) + 1)) AS p, unnest(ts) AS tok
        | FROM toks),
        |sh AS (
        | SELECT doc_id, p AS start,
        |  tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
        |      || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS key
        | FROM pos
        | WINDOW w AS (PARTITION BY doc_id ORDER BY p)
        | QUALIFY lead(tok, 4) OVER w IS NOT NULL),
        |occ AS (
        | SELECT doc_id, start,
        |  min(doc_id) OVER (PARTITION BY key) AS mind,
        |  max(doc_id) OVER (PARTITION BY key) AS maxd,
        |  row_number() OVER (PARTITION BY key ORDER BY doc_id, start) AS rn
        | FROM sh),
        |covered AS (
        | SELECT DISTINCT doc_id, start + off AS p
        | FROM (SELECT doc_id, start FROM occ WHERE mind <> maxd AND rn > 1)
        | CROSS JOIN (SELECT unnest(range(0, 5)) AS off)),
        |kept AS (
        | SELECT pos.doc_id, pos.p, pos.tok
        | FROM pos LEFT JOIN covered c ON pos.doc_id = c.doc_id AND pos.p = c.p
        | WHERE c.p IS NULL),
        |reb AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(tok, ' ' ORDER BY p) AS text
        | FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
        | CAST(len(t.ts) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
        | coalesce(r.text, '') AS text
        |FROM toks t LEFT JOIN reb r USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """SELECT doc_id,
        | round(len(list_intersect(a, b)) * 1.0 /
        |   len(list_distinct(list_concat(a, b))), 6) AS jaccard
        |FROM (
        | SELECT doc_id,
        |  list_distinct(regexp_split_to_array(trim(text), '\s+')) AS a,
        |  list_distinct(regexp_split_to_array(trim(text || ' zz yy xx'), '\s+')) AS b
        | FROM documents WHERE doc_id % 5 = 0) t
        |ORDER BY doc_id""".stripMargin,

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

    "text_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS n_chars_q,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS BIGINT) AS alpha_chars,
        | round(length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 / length(text), 6) AS alpha_ratio,
        | round(length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 /
        |   len(regexp_split_to_array(trim(text), '\s+')), 6) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_scripts" ->
      """WITH base AS (
        | SELECT doc_id, text FROM documents WHERE doc_id < 40
        | UNION ALL SELECT * FROM (VALUES
        |  (CAST(-7 AS BIGINT), 'mixed script: 深度 данные data 123'),
        |  (CAST(-6 AS BIGINT), 'Η μηχανική μάθηση χρειάζεται δεδομένα'),
        |  (CAST(-5 AS BIGINT), '머신 러닝 모델은 많은 데이터가 필요하다'),
        |  (CAST(-4 AS BIGINT), '深層学習には大量のデータが必要です'),
        |  (CAST(-3 AS BIGINT), 'التعلم العميق يتطلب كميات كبيرة من البيانات'),
        |  (CAST(-2 AS BIGINT), 'Глубокое обучение требует больших объёмов данных'),
        |  (CAST(-1 AS BIGINT), '深度学习模型需要大量的训练数据来学习语言结构')) t(doc_id, text)),
        |c AS (
        | SELECT doc_id,
        |  CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS BIGINT) AS alpha_chars,
        |  CAST(length(regexp_replace(text, '[^\p{Latin}]', '', 'g')) AS BIGINT) AS latin_chars,
        |  CAST(length(regexp_replace(text, '[^\p{Cyrillic}]', '', 'g')) AS BIGINT) AS cyrillic_chars,
        |  CAST(length(regexp_replace(text, '[^\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]', '', 'g')) AS BIGINT) AS cjk_chars,
        |  CAST(length(regexp_replace(text, '[^\p{Arabic}]', '', 'g')) AS BIGINT) AS arabic_chars
        | FROM base)
        |SELECT doc_id, alpha_chars, latin_chars, cyrillic_chars, cjk_chars, arabic_chars,
        | CASE WHEN alpha_chars = 0 THEN 'none'
        |  WHEN greatest(latin_chars, cyrillic_chars, cjk_chars, arabic_chars) = 0 THEN 'other'
        |  WHEN latin_chars = greatest(latin_chars, cyrillic_chars, cjk_chars, arabic_chars) THEN 'latin'
        |  WHEN cyrillic_chars = greatest(latin_chars, cyrillic_chars, cjk_chars, arabic_chars) THEN 'cyrillic'
        |  WHEN cjk_chars = greatest(latin_chars, cyrillic_chars, cjk_chars, arabic_chars) THEN 'cjk'
        |  ELSE 'arabic' END AS dominant_script
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_redact_pii" ->
      """SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(
        |   text || ' contact ' || lang || '.user@example.org' ||
        |     ' or call 01234 5678' || CAST(doc_id AS VARCHAR) ||
        |     ' see https://example.org/d/' || CAST(doc_id AS VARCHAR),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   'https?://[^\s]+', '<URL>', 'g'),
        |   '[0-9][0-9 ()+./-]{7,}[0-9]', '<NUMBER>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH s AS (SELECT doc_id,
        | CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|was)\b')) AS BIGINT) AS score_en,
        | CAST(len(regexp_extract_all(lower(text), '\b(der|und|die|nicht|das|ist)\b')) AS BIGINT) AS score_de,
        | CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|une|est)\b')) AS BIGINT) AS score_fr,
        | CAST(len(regexp_extract_all(lower(text), '\b(el|los|una|por|las|este)\b')) AS BIGINT) AS score_es
        | FROM documents)
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        | CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        |      WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |      WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |      WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |      ELSE 'es' END AS predicted_lang
        |FROM s ORDER BY doc_id""".stripMargin,

    // Full unigram-LM training replay: same candidate enumeration,
    // same Laplace ratios, and exhaustive segmentation enumeration per
    // word (the Spark side's Viterbi DP equals this argmax because the
    // (product-score, piece-count, lex-path) order is prefix-stable) —
    // two EM rounds unrolled as two recursive CTEs.
    "text_unigram_lm" ->
      (unigramTrainCte +
        """
        |SELECT u2.piece, u2.c AS n_uses,
        | round((u2.c + 1.0) / (t2.tot + nv.v), 6) AS prob
        |FROM u2, t2, nv
        |ORDER BY n_uses DESC, piece""").stripMargin,

    // Train, rank-prune to 24 + single-char coverage floor, one more
    // enumeration round under the pruned table — mirrors
    // unigramTrain(vocabSize = Some(24)) exactly.
    "text_unigram_prune" ->
      (unigramTrainCte +
        """,
        |kept AS (
        | SELECT DISTINCT piece FROM (
        |  SELECT piece FROM (SELECT piece FROM u2 ORDER BY c DESC, piece LIMIT 24)
        |  UNION ALL
        |  SELECT piece FROM cand WHERE len(piece) = 1) kall),
        |kc AS (SELECT kept.piece, CAST(coalesce(u2.c, 0) AS BIGINT) AS c
        | FROM kept LEFT JOIN u2 ON kept.piece = u2.piece),
        |kn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM kc),
        |kt AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM kc),
        |p4 AS (SELECT piece, (c + 1.0) / (tot + v) AS p FROM kc, kt, kn),
        |s4(w, pos, score, k, path) AS (
        | SELECT w, 0, CAST(1.0 AS DOUBLE), 0, '' FROM words
        | UNION ALL
        | SELECT s4.w, s4.pos + len(p4.piece), s4.score * p4.p, s4.k + 1,
        |  CASE WHEN s4.path = '' THEN p4.piece ELSE s4.path || chr(1) || p4.piece END
        | FROM s4, unnest([1, 2, 3, 4]) AS e(l), p4
        | WHERE s4.pos + l <= len(s4.w) AND p4.piece = substr(s4.w, s4.pos + 1, l)),
        |seg4 AS (
        | SELECT w, path FROM (
        |  SELECT w, path, row_number() OVER (
        |   PARTITION BY w ORDER BY score DESC, k ASC, path ASC) AS rn
        |  FROM s4 WHERE pos = len(w)) WHERE rn = 1),
        |u4 AS (
        | SELECT piece, CAST(sum(f) AS BIGINT) AS c
        | FROM seg4 JOIN words USING (w), unnest(string_split(path, chr(1))) AS x(piece)
        | GROUP BY piece),
        |t4 AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM u4)
        |SELECT u4.piece, u4.c AS n_uses,
        | round((u4.c + 1.0) / (t4.tot + kn.v), 6) AS prob
        |FROM u4, t4, kn
        |ORDER BY n_uses DESC, piece""").stripMargin,

    // Train + prune + a THIRD enumeration round under the pruned vocab
    // (probs = final smoothed ratios); per-document piece counts join
    // each document token to its word's segmentation, UNK (uncoverable
    // or >16 chars — never in `words`) counting 1 via the LEFT JOIN.
    "text_unigram_encode" ->
      (unigramTrainCte +
        """,
        |p2 AS (SELECT u2.piece, (u2.c + 1.0) / (t2.tot + nv.v) AS p FROM u2, t2, nv),
        |s3(w, pos, score, k, path) AS (
        | SELECT w, 0, CAST(1.0 AS DOUBLE), 0, '' FROM words
        | UNION ALL
        | SELECT s3.w, s3.pos + len(p2.piece), s3.score * p2.p, s3.k + 1,
        |  CASE WHEN s3.path = '' THEN p2.piece ELSE s3.path || chr(1) || p2.piece END
        | FROM s3, unnest([1, 2, 3, 4]) AS e(l), p2
        | WHERE s3.pos + l <= len(s3.w) AND p2.piece = substr(s3.w, s3.pos + 1, l)),
        |seg3 AS (
        | SELECT w, k FROM (
        |  SELECT w, k, row_number() OVER (
        |   PARTITION BY w ORDER BY score DESC, k ASC, path ASC) AS rn
        |  FROM s3 WHERE pos = len(w)) WHERE rn = 1),
        |doctok AS (
        | SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\s+'), x -> x <> '')) AS w
        | FROM documents),
        |perdoc AS (
        | SELECT doc_id, CAST(sum(coalesce(seg3.k, 1)) AS BIGINT) AS n
        | FROM doctok LEFT JOIN seg3 USING (w) GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(perdoc.n, 0) AS BIGINT) AS n_unigram_tokens
        |FROM documents d LEFT JOIN perdoc ON d.doc_id = perdoc.doc_id
        |ORDER BY d.doc_id""").stripMargin,

    // Same trained-model arithmetic applied per LINE (planted multiline
    // docs from langIdLineDocs; base docs are single-line), then
    // per-doc language line counts and the majority language.
    "text_langid_lines" ->
      ("""WITH train(lang, text) AS (VALUES """ + langIdTrainVals + """),
        |pl(doc_id, line) AS (VALUES """ + langIdLineVals + """),
        |pdoc(doc_id) AS (VALUES """ + langIdLineDocIdVals + """),
        |ttok AS (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS t FROM train),
        |tfeat AS (
        | SELECT lang, w FROM ttok, unnest(t) AS u(w)
        | UNION ALL
        | SELECT lang, t[i] || ' ' || t[i + 1] FROM ttok, unnest(range(1, len(t))) AS r(i)),
        |tfb AS (SELECT lang, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 256 AS b FROM tfeat),
        |cnt AS (SELECT b,
        |  count(*) FILTER (WHERE lang = 'en') AS c_en,
        |  count(*) FILTER (WHERE lang = 'de') AS c_de,
        |  count(*) FILTER (WHERE lang = 'fr') AS c_fr,
        |  count(*) FILTER (WHERE lang = 'es') AS c_es,
        |  count(*) AS c_all
        | FROM tfb GROUP BY b),
        |tot AS (SELECT
        |  count(*) FILTER (WHERE lang = 'en') AS n_en,
        |  count(*) FILTER (WHERE lang = 'de') AS n_de,
        |  count(*) FILTER (WHERE lang = 'fr') AS n_fr,
        |  count(*) FILTER (WHERE lang = 'es') AS n_es,
        |  count(*) AS n_all FROM tfb),
        |pri AS (SELECT
        |  ln((count(*) FILTER (WHERE lang = 'en') + 1.0) / (count(*) + 4)) AS p_en,
        |  ln((count(*) FILTER (WHERE lang = 'de') + 1.0) / (count(*) + 4)) AS p_de,
        |  ln((count(*) FILTER (WHERE lang = 'fr') + 1.0) / (count(*) + 4)) AS p_fr,
        |  ln((count(*) FILTER (WHERE lang = 'es') + 1.0) / (count(*) + 4)) AS p_es
        | FROM train),
        |lines AS (
        | SELECT doc_id, line, row_number() OVER () AS lid FROM (
        |  SELECT doc_id, line FROM (
        |   SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS line
        |   FROM documents WHERE doc_id < 20) WHERE trim(line) <> ''
        |  UNION ALL
        |  SELECT doc_id, line FROM pl WHERE trim(line) <> '') raw),
        |ltok AS (SELECT doc_id, lid, regexp_split_to_array(trim(line), '\s+') AS t FROM lines),
        |lfeat AS (
        | SELECT doc_id, lid, w FROM ltok, unnest(t) AS u(w)
        | UNION ALL
        | SELECT doc_id, lid, t[i] || ' ' || t[i + 1] FROM ltok, unnest(range(1, len(t))) AS r(i)),
        |lfb AS (SELECT doc_id, lid, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 256 AS b FROM lfeat),
        |ls AS (SELECT doc_id, lid,
        |  max(p_en) + sum(ln((coalesce(c_en, 0) + 1.0) / (n_en + 256)) - ln((coalesce(c_all, 0) - coalesce(c_en, 0) + 1.0) / (n_all - n_en + 256))) AS s_en,
        |  max(p_de) + sum(ln((coalesce(c_de, 0) + 1.0) / (n_de + 256)) - ln((coalesce(c_all, 0) - coalesce(c_de, 0) + 1.0) / (n_all - n_de + 256))) AS s_de,
        |  max(p_fr) + sum(ln((coalesce(c_fr, 0) + 1.0) / (n_fr + 256)) - ln((coalesce(c_all, 0) - coalesce(c_fr, 0) + 1.0) / (n_all - n_fr + 256))) AS s_fr,
        |  max(p_es) + sum(ln((coalesce(c_es, 0) + 1.0) / (n_es + 256)) - ln((coalesce(c_all, 0) - coalesce(c_es, 0) + 1.0) / (n_all - n_es + 256))) AS s_es
        | FROM lfb LEFT JOIN cnt USING (b), tot, pri
        | GROUP BY doc_id, lid, n_en, n_de, n_fr, n_es, n_all),
        |pred AS (SELECT doc_id,
        |  CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |       ELSE 'es' END AS pl
        | FROM ls),
        |agg AS (SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE pl = 'en') AS BIGINT) AS n_en,
        |  CAST(count(*) FILTER (WHERE pl = 'de') AS BIGINT) AS n_de,
        |  CAST(count(*) FILTER (WHERE pl = 'fr') AS BIGINT) AS n_fr,
        |  CAST(count(*) FILTER (WHERE pl = 'es') AS BIGINT) AS n_es
        | FROM pred GROUP BY doc_id),
        |docs_all AS (
        | SELECT doc_id FROM documents WHERE doc_id < 20
        | UNION ALL SELECT doc_id FROM pdoc)
        |SELECT d.doc_id,
        | CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
        | CAST(coalesce(n_en, 0) AS BIGINT) AS n_lines_en,
        | CAST(coalesce(n_de, 0) AS BIGINT) AS n_lines_de,
        | CAST(coalesce(n_fr, 0) AS BIGINT) AS n_lines_fr,
        | CAST(coalesce(n_es, 0) AS BIGINT) AS n_lines_es,
        | CASE WHEN coalesce(n_lines, 0) = 0 THEN 'und'
        |      WHEN n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en'
        |      WHEN n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de'
        |      WHEN n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr'
        |      ELSE 'es' END AS line_major_lang
        |FROM docs_all d LEFT JOIN agg USING (doc_id)
        |ORDER BY d.doc_id""").stripMargin,

    // Full training replay: the same md5 bucket hash, Laplace log-odds
    // and prior arithmetic as TextAnalysis.langIdTrain, over the SAME
    // shared fixture rows (VALUES generated from langIdTrainSet /
    // langIdHeldout so the two sides can never drift).
    "text_langid_trained" ->
      ("""WITH train(lang, text) AS (VALUES """ + langIdTrainVals + """),
        |heldout(doc_id, text) AS (VALUES """ + langIdHeldoutVals + """),
        |test AS (
        | SELECT doc_id, coalesce(text, '') AS text FROM documents WHERE doc_id < 30
        | UNION ALL SELECT doc_id, text FROM heldout),
        |ttok AS (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS t FROM train),
        |tfeat AS (
        | SELECT lang, w FROM ttok, unnest(t) AS u(w)
        | UNION ALL
        | SELECT lang, t[i] || ' ' || t[i + 1] FROM ttok, unnest(range(1, len(t))) AS r(i)),
        |tfb AS (SELECT lang, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 256 AS b FROM tfeat),
        |cnt AS (SELECT b,
        |  count(*) FILTER (WHERE lang = 'en') AS c_en,
        |  count(*) FILTER (WHERE lang = 'de') AS c_de,
        |  count(*) FILTER (WHERE lang = 'fr') AS c_fr,
        |  count(*) FILTER (WHERE lang = 'es') AS c_es,
        |  count(*) AS c_all
        | FROM tfb GROUP BY b),
        |tot AS (SELECT
        |  count(*) FILTER (WHERE lang = 'en') AS n_en,
        |  count(*) FILTER (WHERE lang = 'de') AS n_de,
        |  count(*) FILTER (WHERE lang = 'fr') AS n_fr,
        |  count(*) FILTER (WHERE lang = 'es') AS n_es,
        |  count(*) AS n_all FROM tfb),
        |pri AS (SELECT
        |  ln((count(*) FILTER (WHERE lang = 'en') + 1.0) / (count(*) + 4)) AS p_en,
        |  ln((count(*) FILTER (WHERE lang = 'de') + 1.0) / (count(*) + 4)) AS p_de,
        |  ln((count(*) FILTER (WHERE lang = 'fr') + 1.0) / (count(*) + 4)) AS p_fr,
        |  ln((count(*) FILTER (WHERE lang = 'es') + 1.0) / (count(*) + 4)) AS p_es
        | FROM train),
        |qtok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM test),
        |qfeat AS (
        | SELECT doc_id, w FROM qtok, unnest(t) AS u(w)
        | UNION ALL
        | SELECT doc_id, t[i] || ' ' || t[i + 1] FROM qtok, unnest(range(1, len(t))) AS r(i)),
        |qfb AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 256 AS b FROM qfeat),
        |sc AS (SELECT doc_id,
        |  max(p_en) + sum(ln((coalesce(c_en, 0) + 1.0) / (n_en + 256)) - ln((coalesce(c_all, 0) - coalesce(c_en, 0) + 1.0) / (n_all - n_en + 256))) AS s_en,
        |  max(p_de) + sum(ln((coalesce(c_de, 0) + 1.0) / (n_de + 256)) - ln((coalesce(c_all, 0) - coalesce(c_de, 0) + 1.0) / (n_all - n_de + 256))) AS s_de,
        |  max(p_fr) + sum(ln((coalesce(c_fr, 0) + 1.0) / (n_fr + 256)) - ln((coalesce(c_all, 0) - coalesce(c_fr, 0) + 1.0) / (n_all - n_fr + 256))) AS s_fr,
        |  max(p_es) + sum(ln((coalesce(c_es, 0) + 1.0) / (n_es + 256)) - ln((coalesce(c_all, 0) - coalesce(c_es, 0) + 1.0) / (n_all - n_es + 256))) AS s_es
        | FROM qfb LEFT JOIN cnt USING (b), tot, pri
        | GROUP BY doc_id, n_en, n_de, n_fr, n_es, n_all)
        |SELECT doc_id,
        | round(s_en, 6) AS score_en, round(s_de, 6) AS score_de,
        | round(s_fr, 6) AS score_fr, round(s_es, 6) AS score_es,
        | CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |      WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |      WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |      ELSE 'es' END AS predicted_lang
        |FROM sc ORDER BY doc_id""").stripMargin,

    "corpus_filter" ->
      """WITH all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0),
        |scored AS (
        | SELECT doc_id, text,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  round(length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 / length(text), 6) AS alpha_ratio,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|was)\b')) AS BIGINT) AS score_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|und|die|nicht|das|ist)\b')) AS BIGINT) AS score_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|une|est)\b')) AS BIGINT) AS score_fr,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|una|por|las|este)\b')) AS BIGINT) AS score_es
        | FROM all_docs),
        |lang AS (
        | SELECT *,
        |  CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |       WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |       WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |       ELSE 'es' END AS predicted_lang
        | FROM scored),
        |kept AS (
        | SELECT *, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        | FROM lang
        | WHERE predicted_lang IN ('en', 'de') AND alpha_ratio >= 0.6
        |  AND n_tokens BETWEEN 10 AND 1000)
        |SELECT doc_id, predicted_lang, alpha_ratio, n_tokens FROM (
        | SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        | FROM kept) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

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
        |ORDER BY a_id, b_id""".stripMargin,

    "join_asof" ->
      """WITH clicks AS (
        | SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        | SELECT user_id, ts,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS purchase_cents
        | FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts,
        | p.ts AS last_purchase_ts, p.purchase_cents AS last_purchase_cents
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "join_range" ->
      """WITH bands AS (
        | SELECT CAST(x AS BIGINT) AS band_id, x * 10.0 AS lo, x * 10.0 + 10.0 AS hi
        | FROM range(0, 10) t(x))
        |SELECT e.event_id, b.band_id
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |ORDER BY e.event_id, b.band_id""".stripMargin,

    "agg_cube" ->
      """SELECT event_type, date_trunc('day', ts) AS day,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY CUBE (event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT event_type, date_trunc('day', ts) AS day,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY GROUPING SETS ((event_type), (day), ())
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "profile_key_skew" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
        | CAST(count(*) AS BIGINT) AS n,
        | round(count(*) / (SELECT count(*) FROM events), 6) AS share
        |FROM events GROUP BY 1
        |ORDER BY n DESC, key LIMIT 10""".stripMargin,

    "join_full_outer" ->
      """WITH c AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS n_big_clicks
        | FROM events WHERE event_type = 'click' AND value > 90 GROUP BY user_id),
        |p AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS n_big_purchases
        | FROM events WHERE event_type = 'purchase' AND value > 90 GROUP BY user_id)
        |SELECT coalesce(c.user_id, p.user_id) AS user_id,
        | coalesce(n_big_clicks, 0) AS n_big_clicks,
        | coalesce(n_big_purchases, 0) AS n_big_purchases
        |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
        |ORDER BY user_id""".stripMargin,

    "window_ranks" ->
      """SELECT event_id, event_type,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume,
        | CAST(dense_rank() OVER w AS BIGINT) AS drank
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,

    "profile_table" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
        |SELECT column_name, n_rows, n_nonnull, n_distinct FROM n, (
        | SELECT 'o_orderkey' AS column_name,
        |  CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders
        | UNION ALL SELECT 'o_custkey', CAST(count(o_custkey) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
        | UNION ALL SELECT 'o_orderstatus', CAST(count(o_orderstatus) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
        | UNION ALL SELECT 'o_totalprice', CAST(count(o_totalprice) AS BIGINT),
        |  CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders
        | UNION ALL SELECT 'o_orderdate', CAST(count(o_orderdate) AS BIGINT),
        |  CAST(count(DISTINCT o_orderdate) AS BIGINT) FROM orders
        | UNION ALL SELECT 'o_orderpriority', CAST(count(o_orderpriority) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders) t
        |ORDER BY column_name""".stripMargin,

    "sketch_approx_distinct" ->
      """SELECT event_type,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        | true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sketch_quantile_approx" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50_exact,
        | round(quantile_cont(value, 0.9), 6) AS p90_exact,
        | true AS p50_ok, true AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_quantiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_rollup" ->
      """SELECT event_type, date_trunc('day', ts) AS day,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY ROLLUP (event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "agg_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        | CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        | CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        | CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        | CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,

    "events_sessionize" ->
      """WITH x AS (SELECT *,
        | CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT *, sum(new_session) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM x)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | min(ts) AS session_start, max(ts) AS session_end,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "events_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // session_window gap-merge semantics: an event extends the session
    // iff it lands strictly before last_ts + gap; end = last_ts + gap.
    "events_session_window" ->
      """WITH x AS (SELECT *,
        | CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT *, sum(new_session) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        | FROM x)
        |SELECT user_id, min(ts) AS session_start,
        | max(ts) + INTERVAL 30 MINUTE AS session_end,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "corpus_pack_chunks" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT *, sum(n_tokens) OVER (
        |  PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        | FROM d)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
        | CAST((cum - n_tokens) // 256 AS BIGINT) AS chunk_id,
        | CAST((cum - n_tokens) % 256 AS BIGINT) AS chunk_offset,
        | CAST((cum - 1) // 256 AS BIGINT) AS end_chunk,
        | CAST((cum - 1) % 256 AS BIGINT) AS end_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "corpus_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5('graft42:' || CAST(doc_id AS VARCHAR)), 1, 8) <
        |  CASE lang WHEN 'en' THEN '80000000' WHEN 'de' THEN '40000000'
        |            WHEN 'fr' THEN '20000000' WHEN 'es' THEN '40000000'
        |            ELSE '10000000' END
        |ORDER BY doc_id""".stripMargin,

    "corpus_domain_quota" ->
      """SELECT doc_id, lang, n_chars, qrank FROM (
        | SELECT doc_id, lang, n_chars,
        |  CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS qrank
        | FROM documents) t
        |WHERE qrank <= 40 ORDER BY doc_id""".stripMargin,

    // 8-token shingle overlap with the benchmark set (doc_id % 97 = 0),
    // corpus = originals minus benchmark plus planted leaked copies.
    "corpus_decontaminate" ->
      """WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |corpus AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        | UNION ALL
        | SELECT doc_id + 300000, 'leaked copy ' || text FROM bench),
        |ct AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM corpus),
        |bt AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM bench),
        |cs AS (SELECT doc_id, unnest(
        |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |   ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END) AS sh
        | FROM ct),
        |bs AS (SELECT DISTINCT unnest(
        |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |   ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END) AS sh
        | FROM bt)
        |SELECT DISTINCT c.doc_id FROM cs c JOIN bs b USING (sh)
        |ORDER BY doc_id""".stripMargin,

    // Bloom pre-filter + exact verify = the SAME contaminated-id set as
    // corpus_decontaminate (no false negatives in a bloom; false
    // positives die in the exact semi-join), so the oracle is the same
    // exhaustive shingle-overlap enumeration.
    "corpus_decontaminate_bloom" ->
      """WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |corpus AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        | UNION ALL
        | SELECT doc_id + 300000, 'leaked copy ' || text FROM bench),
        |ct AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM corpus),
        |bt AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM bench),
        |cs AS (SELECT doc_id, unnest(
        |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |   ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END) AS sh
        | FROM ct),
        |bs AS (SELECT DISTINCT unnest(
        |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |   ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END) AS sh
        | FROM bt)
        |SELECT DISTINCT c.doc_id FROM cs c JOIN bs b USING (sh)
        |ORDER BY doc_id""".stripMargin,

    "corpus_global_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |  md5('shuf7:' || CAST(doc_id AS VARCHAR)) AS key FROM documents)
        |SELECT doc_id, substr(key, 1, 2) AS shard,
        | CAST(row_number() OVER (
        |   PARTITION BY substr(key, 1, 2) ORDER BY key, doc_id) AS BIGINT) AS pos
        |FROM k ORDER BY doc_id""".stripMargin,

    // plain join — salting must not change the result
    "join_salted_skew" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |  AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_word_freq_topk" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |      FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "text_tfidf_topk" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS term
        | FROM documents),
        |tf AS (
        | SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        | FROM toks GROUP BY 1, 2),
        |dfreq AS (
        | SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |ranked AS (
        | SELECT tf.doc_id, tf.term,
        |  tf.tf * (n.n + 1) / (dfreq.df + 1) AS score,
        |  row_number() OVER (PARTITION BY tf.doc_id
        |    ORDER BY tf.tf * (n.n + 1) / (dfreq.df + 1) DESC, tf.term) AS rank
        | FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, rank, term, round(score, 6) AS score
        |FROM ranked WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "text_levenshtein" ->
      """SELECT doc_id,
        | CAST(levenshtein(substr(text, 1, 80),
        |   substr('typo ' || text, 1, 80)) AS BIGINT) AS edit_distance
        |FROM documents WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |   ELSE list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' ')) END AS g2,
        |  CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |   ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END AS g3
        | FROM t)
        |SELECT doc_id,
        | round(len(list_distinct(g2)) * 1.0 / len(g2), 6) AS distinct_2gram_ratio,
        | round(len(list_distinct(g3)) * 1.0 / len(g3), 6) AS distinct_3gram_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "events_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    // Zipped unnest of the shifted token arrays = adjacent pairs with
    // repeats kept; docs with <2 tokens contribute nothing (matches the
    // graft_ngram_list kernel contract).
    "text_bpe_pairs" ->
      """WITH toks AS (
        | SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |pairs AS (
        | SELECT unnest(t[1:len(t)-1]) || ' ' || unnest(t[2:len(t)]) AS pair
        | FROM toks WHERE len(t) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // Near-dup clusters via the same recursive closure as
    // dedup_cluster's oracle; singletons cluster as themselves; split
    // by the portable md5-hex threshold on the CLUSTER id
    // (hexThreshold(0.1) = '19999999').
    "corpus_split_leakage_safe" ->
      """WITH RECURSIVE all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM all_docs),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS s
        | FROM tk),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(list_concat(a.s, b.s))) AS j
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |edg AS (SELECT a_id AS s, b_id AS d FROM p WHERE j >= 0.8
        |        UNION SELECT b_id, a_id FROM p WHERE j >= 0.8),
        |reach(s, d) AS (
        | SELECT s, d FROM edg
        | UNION
        | SELECT r.s, edg.d FROM reach r JOIN edg ON r.d = edg.s),
        |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster FROM reach GROUP BY s)
        |SELECT a.doc_id, coalesce(cl.cluster, a.doc_id) AS cluster,
        | CASE WHEN substr(md5('graftsplit:' || CAST(coalesce(cl.cluster, a.doc_id) AS VARCHAR)), 1, 8)
        |        < '19999999' THEN 'test' ELSE 'train' END AS split
        |FROM all_docs a LEFT JOIN cl ON a.doc_id = cl.doc_id
        |ORDER BY a.doc_id""".stripMargin,

    // Partition counts from the same routing logic (langid priority
    // en>de>fr>es, token-length buckets) — equality after the round
    // trip proves no rows were lost or misrouted by the writer.
    "corpus_write_layout" ->
      """WITH s AS (SELECT doc_id, text,
        | CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|was)\b')) AS BIGINT) AS score_en,
        | CAST(len(regexp_extract_all(lower(text), '\b(der|und|die|nicht|das|ist)\b')) AS BIGINT) AS score_de,
        | CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|une|est)\b')) AS BIGINT) AS score_fr,
        | CAST(len(regexp_extract_all(lower(text), '\b(el|los|una|por|las|este)\b')) AS BIGINT) AS score_es
        | FROM documents),
        |r AS (SELECT doc_id,
        | CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        |      WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |      WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |      WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |      ELSE 'es' END AS predicted_lang,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
        | FROM s)
        |SELECT predicted_lang,
        | CASE WHEN nt <= 32 THEN '0_le_32' WHEN nt <= 64 THEN '1_le_64'
        |      WHEN nt <= 128 THEN '2_le_128' WHEN nt <= 256 THEN '3_le_256'
        |      ELSE '4_gt_256' END AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Winnow both corpora, cap boilerplate fingerprints at the same
    // doc-frequency, pair on shared fingerprints, verify with the same
    // distinct-shingle Jaccard as the other dedup oracles.
    "dedup_winnow" ->
      """WITH all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0),
        |toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM all_docs),
        |g AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 8)) AS BIGINT) AS gh
        | FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        | WHERE len(t) >= 3),
        |w AS (
        | SELECT doc_id, gh,
        |  count(*) OVER win AS cnt,
        |  min({'gh': gh, 'np': -pos}) OVER win AS sel
        | FROM g
        | WINDOW win AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
        |fp AS (SELECT DISTINCT doc_id, sel.gh AS fp FROM w WHERE cnt = 4),
        |kept AS (SELECT doc_id, fp FROM fp QUALIFY count(*) OVER (PARTITION BY fp) <= 8),
        |cand AS (
        | SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        | FROM kept a JOIN kept b USING (fp) WHERE a.doc_id < b.doc_id),
        |sh AS (SELECT doc_id,
        | list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |   ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END) AS s
        | FROM toks),
        |p AS (
        | SELECT a_id, b_id,
        |  len(list_intersect(sa.s, sb.s)) * 1.0 / len(list_distinct(list_concat(sa.s, sb.s))) AS j
        | FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)
        |SELECT a_id, b_id, round(j, 6) AS jaccard FROM p WHERE j >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,

    // Same winnowing selection: grams as in the span-dedup oracle,
    // first-8-hex-of-md5 hashes, struct-min windows (ties rightmost via
    // the negated position).
    "text_winnow" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |g AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 8)) AS BIGINT) AS gh
        | FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        | WHERE len(t) >= 3),
        |w AS (
        | SELECT doc_id, pos, gh,
        |  count(*) OVER win AS cnt,
        |  min({'gh': gh, 'np': -pos}) OVER win AS sel
        | FROM g
        | WINDOW win AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING))
        |SELECT DISTINCT doc_id, sel.gh AS fp, -sel.np AS fp_pos
        |FROM w WHERE cnt = 4 ORDER BY doc_id, fp_pos, fp""".stripMargin,

    // Ground truth for the sketch-plus-recount pipeline: the exact
    // full-vocabulary answer. ceil() keeps the cutoff semantics aligned
    // with the Spark side's math.ceil(total * minShare).
    "text_heavy_hitters" ->
      """WITH toks AS (
        | SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents WHERE text IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
        |SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM toks, tot
        |GROUP BY token, tot.n
        |HAVING count(*) >= ceil(tot.n * 0.002)
        |ORDER BY n_occurrences DESC, token""".stripMargin,

    // The 4-round merge loop unrolled: each stage recounts pairs from
    // the previous state and fuses the top pair via the same
    // sentinel-guarded replace the Spark loop uses. Tie-break is
    // (n DESC, pair ASC, l ASC) in both engines.
    "text_bpe_merges" ->
      """WITH state0 AS (
        | SELECT chr(1) || array_to_string(regexp_split_to_array(trim(text), '\s+'), chr(1)||chr(1)) || chr(1) AS s
        | FROM documents WHERE text IS NOT NULL),
        |cnt1 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state0)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top1 AS (SELECT l, r, pair, n FROM cnt1 ORDER BY n DESC, pair, l LIMIT 1),
        |state1 AS (
        | SELECT replace(s, chr(1)||top1.l||chr(1)||chr(1)||top1.r||chr(1),
        |                   chr(1)||top1.l||' '||top1.r||chr(1)) AS s
        | FROM state0, top1),
        |cnt2 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state1)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top2 AS (SELECT l, r, pair, n FROM cnt2 ORDER BY n DESC, pair, l LIMIT 1),
        |state2 AS (
        | SELECT replace(s, chr(1)||top2.l||chr(1)||chr(1)||top2.r||chr(1),
        |                   chr(1)||top2.l||' '||top2.r||chr(1)) AS s
        | FROM state1, top2),
        |cnt3 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state2)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top3 AS (SELECT l, r, pair, n FROM cnt3 ORDER BY n DESC, pair, l LIMIT 1),
        |state3 AS (
        | SELECT replace(s, chr(1)||top3.l||chr(1)||chr(1)||top3.r||chr(1),
        |                   chr(1)||top3.l||' '||top3.r||chr(1)) AS s
        | FROM state2, top3),
        |cnt4 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state3)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top4 AS (SELECT l, r, pair, n FROM cnt4 ORDER BY n DESC, pair, l LIMIT 1)
        |SELECT 1 AS merge_step, pair, n FROM top1
        |UNION ALL SELECT 2, pair, n FROM top2
        |UNION ALL SELECT 3, pair, n FROM top3
        |UNION ALL SELECT 4, pair, n FROM top4
        |ORDER BY merge_step""".stripMargin,

    // The encode oracle replays the same four learned rounds (identical
    // CTE chain, doc_id carried through the per-doc states), then hashes
    // each document's final token sequence.
    "text_bpe_encode" ->
      """WITH state0 AS (
        | SELECT doc_id, chr(1) || array_to_string(regexp_split_to_array(trim(text), '\s+'), chr(1)||chr(1)) || chr(1) AS s
        | FROM documents WHERE text IS NOT NULL),
        |cnt1 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state0)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top1 AS (SELECT l, r FROM cnt1 ORDER BY n DESC, pair, l LIMIT 1),
        |state1 AS (
        | SELECT doc_id, replace(s, chr(1)||top1.l||chr(1)||chr(1)||top1.r||chr(1),
        |                   chr(1)||top1.l||' '||top1.r||chr(1)) AS s
        | FROM state0, top1),
        |cnt2 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state1)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top2 AS (SELECT l, r FROM cnt2 ORDER BY n DESC, pair, l LIMIT 1),
        |state2 AS (
        | SELECT doc_id, replace(s, chr(1)||top2.l||chr(1)||chr(1)||top2.r||chr(1),
        |                   chr(1)||top2.l||' '||top2.r||chr(1)) AS s
        | FROM state1, top2),
        |cnt3 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state2)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top3 AS (SELECT l, r FROM cnt3 ORDER BY n DESC, pair, l LIMIT 1),
        |state3 AS (
        | SELECT doc_id, replace(s, chr(1)||top3.l||chr(1)||chr(1)||top3.r||chr(1),
        |                   chr(1)||top3.l||' '||top3.r||chr(1)) AS s
        | FROM state2, top3),
        |cnt4 AS (
        | SELECT l, r, l || ' ' || r AS pair, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT unnest(t[1:len(t)-1]) AS l, unnest(t[2:len(t)]) AS r
        |       FROM (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM state3)
        |       WHERE len(t) >= 2)
        | GROUP BY l, r),
        |top4 AS (SELECT l, r FROM cnt4 ORDER BY n DESC, pair, l LIMIT 1),
        |state4 AS (
        | SELECT doc_id, replace(s, chr(1)||top4.l||chr(1)||chr(1)||top4.r||chr(1),
        |                   chr(1)||top4.l||' '||top4.r||chr(1)) AS s
        | FROM state3, top4)
        |SELECT doc_id,
        | CAST(len(string_split(trim(s, chr(1)), chr(1)||chr(1))) AS BIGINT) AS n_bpe_tokens,
        | md5(array_to_string(string_split(trim(s, chr(1)), chr(1)||chr(1)), chr(1))) AS enc_hash
        |FROM state4 ORDER BY doc_id""".stripMargin,

    // Same fixed weights, same operation order; keep-threshold on the
    // ROUNDED score — JVM Math.exp is 1-ulp accurate, not correctly
    // rounded, so a raw score within 1 ulp of the threshold could flip
    // `keep` across engines; 6-dp rounding removes that cliff.
    "text_quality_logistic" ->
      """WITH toks AS (
        | SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |g AS (SELECT doc_id, text, t,
        |  CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        |   ELSE list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' ')) END AS g2
        | FROM toks),
        |f AS (SELECT doc_id,
        |  length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 / nullif(length(text), 0) AS alpha_ratio,
        |  ln(1.0 + len(t)) AS ln_tok,
        |  len(list_distinct(g2)) * 1.0 / len(g2) AS d2
        | FROM g),
        |sc AS (SELECT doc_id,
        |  round(1.0 / (1.0 + exp(-(-2.0 + 2.5 * alpha_ratio + 0.5 * ln_tok + 1.0 * d2))), 6) AS q
        | FROM f)
        |SELECT doc_id, q AS quality, q >= 0.945 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin,

    "corpus_length_buckets" ->
      """WITH n AS (
        | SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
        | FROM documents)
        |SELECT CASE WHEN nt <= 32 THEN '0_le_32' WHEN nt <= 64 THEN '1_le_64'
        |            WHEN nt <= 128 THEN '2_le_128' WHEN nt <= 256 THEN '3_le_256'
        |            ELSE '4_gt_256' END AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS sum_tokens
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same gates, same rounded thresholds; concat_ws skips NULL CASEs in
    // both engines so the reason string is identical.
    "corpus_filter_reasons" ->
      """WITH all_docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL SELECT * FROM (VALUES
        |  (CAST(-4 AS BIGINT), trim(repeat('w ', 1100))),
        |  (CAST(-3 AS BIGINT), '!!! 000 ??? 111 !!!'),
        |  (CAST(-2 AS BIGINT), 'x y x y x y x y x y x y'),
        |  (CAST(-1 AS BIGINT), 'a b c')) t(doc_id, text)),
        |toks AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS tk FROM all_docs),
        |g AS (SELECT doc_id, text, tk,
        |  CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
        |   ELSE list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i+1], ' ')) END AS g2
        | FROM toks),
        |m AS (SELECT doc_id, text,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  round(length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 / length(text), 6) AS alpha_ratio,
        |  round(len(list_distinct(g2)) * 1.0 / len(g2), 6) AS d2,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|was)\b')) AS BIGINT) AS score_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|und|die|nicht|das|ist)\b')) AS BIGINT) AS score_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|une|est)\b')) AS BIGINT) AS score_fr,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|una|por|las|este)\b')) AS BIGINT) AS score_es
        | FROM g),
        |lang AS (SELECT *,
        |  CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |       WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |       WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |       ELSE 'es' END AS predicted_lang
        | FROM m),
        |r AS (SELECT doc_id, predicted_lang,
        |  concat_ws(',',
        |   CASE WHEN alpha_ratio < 0.6 THEN 'low_alpha' END,
        |   CASE WHEN n_tokens < 10 THEN 'too_short' END,
        |   CASE WHEN n_tokens > 1000 THEN 'too_long' END,
        |   CASE WHEN d2 < 0.3 THEN 'repetitive' END,
        |   CASE WHEN predicted_lang NOT IN ('en', 'de') THEN 'wrong_lang' END) AS fail_reasons
        | FROM lang)
        |SELECT doc_id, predicted_lang, fail_reasons, fail_reasons = '' AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // Parallel unnest keeps (position, line) aligned; first occurrence
    // corpus-wide = row_number over (doc_id, position); blank lines
    // bypass dedup; docs rebuilt in original line order.
    "text_dedup_lines" ->
      """WITH corpus AS (
        | SELECT doc_id,
        |  replace(text, ' the ', chr(10)) || chr(10) ||
        |  'subscribe to our newsletter for updates' || chr(10) ||
        |  'all rights reserved site footer' AS t
        | FROM documents),
        |lines AS (
        | SELECT doc_id, unnest(range(1, len(s) + 1)) AS ln, unnest(s) AS line
        | FROM (SELECT doc_id, string_split(t, chr(10)) AS s FROM corpus)),
        |keep AS (
        | SELECT doc_id, ln, line FROM (
        |  SELECT doc_id, ln, line,
        |   CASE WHEN trim(line) = '' THEN 1
        |    ELSE row_number() OVER (PARTITION BY line ORDER BY doc_id, ln)
        |   END AS rn
        |  FROM lines) q WHERE rn = 1)
        |SELECT c.doc_id,
        | coalesce(string_agg(k.line, chr(10) ORDER BY k.ln), '') AS text
        |FROM corpus c LEFT JOIN keep k USING (doc_id)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    // Same rate derivation: double division, fixed-point floor, hex
    // threshold compare; 'g0000000' is the above-any-hex keep-all
    // sentinel (every hex digit < 'g' lexicographically).
    // Same quality formula as text_quality_logistic (rounded before the
    // threshold), same per-row fixed-point hash-threshold replay.
    "corpus_sample_by_score" ->
      """WITH toks AS (
        | SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |g AS (SELECT doc_id, text, t,
        |  CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        |   ELSE list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' ')) END AS g2
        | FROM toks),
        |f AS (SELECT doc_id,
        |  length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 / nullif(length(text), 0) AS alpha_ratio,
        |  ln(1.0 + len(t)) AS ln_tok,
        |  len(list_distinct(g2)) * 1.0 / len(g2) AS d2
        | FROM g),
        |sc AS (SELECT doc_id,
        |  round(1.0 / (1.0 + exp(-(-2.0 + 2.5 * alpha_ratio + 0.5 * ln_tok + 1.0 * d2))), 6) AS q
        | FROM f)
        |SELECT doc_id, q AS quality
        |FROM sc
        |WHERE substr(md5('qs3:' || CAST(doc_id AS VARCHAR)), 1, 8) <
        | CASE WHEN q >= 1.0 THEN 'g0000000'
        |      ELSE printf('%08x', CAST(floor(q * 4294967296.0) AS BIGINT)) END
        |ORDER BY doc_id""".stripMargin,

    // Same hash-threshold replay as corpus_mix_budget; the rate derives
    // from per-source token totals via sqrt (IEEE-exact in any engine).
    "corpus_mix_temperature" ->
      """WITH tok AS (
        | SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |tot AS (SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS t FROM tok GROUP BY lang),
        |mn AS (SELECT min(t) AS tmin FROM tot),
        |th AS (SELECT lang, round(sqrt(tmin / t), 6) AS rate FROM tot, mn)
        |SELECT doc_id, lang, n_tokens
        |FROM tok JOIN th USING (lang)
        |WHERE substr(md5('temp7:' || CAST(doc_id AS VARCHAR)), 1, 8) <
        | CASE WHEN rate >= 1.0 THEN 'g0000000'
        |      ELSE printf('%08x', CAST(floor(rate * 4294967296.0) AS BIGINT)) END
        |ORDER BY doc_id""".stripMargin,

    "corpus_mix_budget" ->
      """WITH tok AS (
        | SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |tot AS (SELECT lang, sum(n_tokens) AS t FROM tok GROUP BY lang),
        |th AS (SELECT lang,
        |  CASE lang
        |   WHEN 'en' THEN least(1.0, 4000.0 / t)
        |   WHEN 'de' THEN least(1.0, 1500.0 / t)
        |   WHEN 'zh' THEN least(1.0, 999999.0 / t)
        |   WHEN 'es' THEN least(1.0, 0.0 / t)
        |   ELSE NULL END AS rate
        | FROM tot)
        |SELECT doc_id, lang, n_tokens
        |FROM tok JOIN th USING (lang)
        |WHERE substr(md5('mix9:' || CAST(doc_id AS VARCHAR)), 1, 8) <
        | CASE WHEN rate IS NULL OR rate >= 1.0 THEN 'g0000000'
        |      ELSE printf('%08x', CAST(floor(rate * 4294967296.0) AS BIGINT)) END
        |ORDER BY doc_id""".stripMargin,

    "scd2_intervals" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(o_orderdate AS DATE) AS valid_from,
        | lead(CAST(o_orderdate AS DATE)) OVER (
        |   PARTITION BY o_custkey
        |   ORDER BY CAST(o_orderdate AS DATE), o_orderkey) - 1 AS valid_to
        |FROM orders ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    // Same integer chunk-count arithmetic (no float ceil), same 1-based
    // inclusive list slicing; an empty document yields one empty chunk.
    "corpus_chunk_overlap" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d),
        |c AS (SELECT doc_id, toks, n,
        |  CAST(CASE WHEN n <= 40 THEN 1 ELSE ((n - 40 + 30 - 1) // 30) + 1 END AS BIGINT) AS n_chunks
        | FROM n),
        |e AS (SELECT doc_id, toks, n, unnest(range(n_chunks)) AS chunk_idx FROM c),
        |s AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(chunk_idx * 30 AS BIGINT) AS start_tok,
        |  CAST(least(chunk_idx * 30 + 40, n) AS BIGINT) AS end_tok, toks
        | FROM e)
        |SELECT doc_id, chunk_idx, start_tok, end_tok,
        | array_to_string(toks[CAST(start_tok + 1 AS INT):CAST(end_tok AS INT)], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    // Okapi BM25, operation-for-operation the Spark expression (double
    // constants written as the same arithmetic, e.g. (1.2 + 1.0), so
    // both engines fold identical IEEE values); ln is 1-ulp so ordering
    // and the top-k boundary use the 6-dp ROUNDED score.
    "text_bm25_topk" ->
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
        | FROM tf, st, dfq)
        |SELECT doc_id, round(score, 6) AS score FROM sc
        |ORDER BY round(score, 6) DESC, doc_id LIMIT 15""".stripMargin,

    // Incremental == batch exactly (same tokenization, same operation
    // order, same rounding), so the incremental key reuses the batch
    // BM25 oracle verbatim.
    "text_bm25_incr" ->
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
        | FROM tf, st, dfq)
        |SELECT doc_id, round(score, 6) AS score FROM sc
        |ORDER BY round(score, 6) DESC, doc_id LIMIT 15""".stripMargin,

    // Same bigram extraction as text_bpe_pairs (zipped unnest, repeats
    // kept, <2-token docs contribute nothing), add-one smoothing over
    // the observed vocabulary.
    "text_lm_score" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |pairs AS (
        | SELECT doc_id, unnest(t[1:len(t)-1]) || ' ' || unnest(t[2:len(t)]) AS g
        | FROM toks WHERE len(t) >= 2),
        |model AS (SELECT g, count(*) AS cnt FROM pairs GROUP BY g),
        |tv AS (SELECT sum(cnt) AS t_tot, count(*) AS v FROM model),
        |sc AS (SELECT doc_id, count(*) AS n_bigrams,
        |  avg(-ln((cnt + 1.0) / (t_tot + v))) AS nll
        | FROM pairs JOIN model USING (g), tv GROUP BY doc_id)
        |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, round(nll, 6) AS nll
        |FROM sc ORDER BY doc_id""".stripMargin,

    // Same tokenization, same p·ln(p) terms; the sum order differs only
    // in FP last bits, absorbed by the 6-dp rounding.
    "text_ngram_entropy" ->
      """WITH tk AS (
        | SELECT doc_id,
        |  unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS term
        | FROM documents),
        |c AS (SELECT doc_id, term, count(*) AS c FROM tk GROUP BY 1, 2),
        |n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        | round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS token_entropy
        |FROM c JOIN n USING (doc_id) GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    "embed_centroid_per_label" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (SELECT label, unnest(v) AS x,
        |        CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim FROM e)
        |SELECT label, dim, round(avg(x), 6) AS mean_val,
        | CAST(count(*) AS BIGINT) AS n
        |FROM d GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    // Same md5-hex draw as the rate-based sampler oracles, ranked per
    // stratum with the id tie-break.
    "corpus_sample_exact_n" ->
      """SELECT doc_id, lang, CAST(srank AS BIGINT) AS srank FROM (
        | SELECT doc_id, lang, row_number() OVER (
        |   PARTITION BY lang
        |   ORDER BY substr(md5('ev1:' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS srank
        | FROM documents) t
        |WHERE srank <= 20 ORDER BY doc_id""".stripMargin,

    // Same shingle definition as corpus_decontaminate's oracle (distinct
    // 8-token shingles, single shingle when shorter), counted per doc.
    "corpus_contamination_share" ->
      """WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |corpus AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        | UNION ALL
        | SELECT doc_id + 300000, 'leaked copy ' || text FROM bench),
        |sh AS (SELECT doc_id,
        |  unnest(list_distinct(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 6), i -> array_to_string(t[i:i+7], ' ')) END)) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM corpus) x),
        |bs AS (SELECT DISTINCT
        |  unnest(list_distinct(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 6), i -> array_to_string(t[i:i+7], ' ')) END)) AS s
        | FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM bench) x),
        |agg AS (SELECT doc_id, count(*) AS n_shingles,
        |  sum(CASE WHEN bs.s IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        | FROM sh LEFT JOIN bs USING (s) GROUP BY doc_id)
        |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
        | CAST(n_hit AS BIGINT) AS n_hit,
        | round(n_hit * 1.0 / n_shingles, 6) AS share
        |FROM agg WHERE n_hit > 0 ORDER BY doc_id""".stripMargin,

    // Same gram construction as text_bpe_pairs, positions 1-based; a
    // gram occurring >= 2 times in ONE document covers token positions
    // {i, i+1} of each occurrence.
    "text_dup_ngram_frac" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |gr AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |   unnest(range(1, len(t))) AS i, t
        | FROM toks WHERE len(t) >= 2),
        |g2 AS (SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS i,
        |   t[i] || ' ' || t[i + 1] AS gram FROM gr),
        |dup AS (SELECT doc_id, gram FROM g2
        |        GROUP BY doc_id, gram HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |  SELECT g2.doc_id, unnest([g2.i, g2.i + 1]) AS pos
        |  FROM g2 JOIN dup USING (doc_id, gram)) u),
        |agg AS (SELECT doc_id, count(*) AS n_dup FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        | CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_tokens,
        | round(coalesce(a.n_dup, 0) * 1.0 / len(t.t), 6) AS dup_frac
        |FROM toks t LEFT JOIN agg a USING (doc_id)
        |WHERE len(t.t) >= 2 ORDER BY t.doc_id""".stripMargin,

    // Same prefix blocking, same integer edit distance (parity
    // established by text_levenshtein).
    "join_fuzzy_blocked" ->
      """WITH ents AS (
        | SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name),
        |p AS (
        | SELECT id, name FROM ents
        | UNION ALL
        | SELECT id + 100000, substr(name, 1, length(name) - 1) || 'x'
        | FROM ents WHERE id % 3 = 0),
        |b AS (SELECT id, name, substr(name, 1, 6) AS blk FROM p)
        |SELECT a.id AS a_id, b2.id AS b_id,
        | CAST(levenshtein(a.name, b2.name) AS BIGINT) AS dist
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.id < b2.id
        |WHERE levenshtein(a.name, b2.name) <= 2
        |ORDER BY a_id, b_id""".stripMargin,

    // Same feature construction as text_quality_logistic's oracle, same
    // left-to-right z accumulation, same residual products; exp is
    // 1-ulp, handled by the 6-dp rounding on each gradient component.
    "ml_logreg_grad" ->
      """WITH toks AS (
        | SELECT doc_id, text, lang, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |g AS (SELECT doc_id, text, lang, t,
        |  CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        |   ELSE list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' ')) END AS g2
        | FROM toks),
        |f AS (SELECT
        |  length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 / nullif(length(text), 0) AS x1,
        |  ln(1.0 + len(t)) AS x2,
        |  len(list_distinct(g2)) * 1.0 / len(g2) AS x3,
        |  CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        | FROM g),
        |c AS (SELECT x1, x2, x3, y,
        |  (1.0 / (1.0 + exp(-(((0.1 + (x1 * 0.5)) + (x2 * -0.25)) + (x3 * 1.0))))) - y AS r
        | FROM f WHERE x1 IS NOT NULL AND x2 IS NOT NULL AND x3 IS NOT NULL AND y IS NOT NULL)
        |SELECT round(avg(r * x1), 6) AS grad_alpha,
        | round(avg(r * x2), 6) AS grad_lntok,
        | round(avg(r * x3), 6) AS grad_rep,
        | round(avg(r), 6) AS grad_bias,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM c""".stripMargin,

    // Mirrors Learn.softmaxGradient's exact association: z folds
    // bias-first then features, softmax max-shifts before exp, the
    // denominator sums left-to-right.
    "ml_softmax_grad" ->
      """WITH toks AS (
        | SELECT text, lang, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |f AS (SELECT
        |  length(regexp_replace(text, '[^\p{L}]', '', 'g')) * 1.0 / nullif(length(text), 0) AS x1,
        |  ln(1.0 + len(t)) AS x2,
        |  CASE WHEN lang = 'en' THEN 'en' WHEN lang = 'de' THEN 'de' ELSE 'xx' END AS y
        | FROM toks),
        |z AS (SELECT x1, x2, y,
        |  ((0.2 + (x1 * 0.8)) + (x2 * -0.1)) AS z1,
        |  ((-0.1 + (x1 * -0.3)) + (x2 * 0.2)) AS z2,
        |  ((0.0 + (x1 * 0.1)) + (x2 * 0.05)) AS z3
        | FROM f WHERE x1 IS NOT NULL AND x2 IS NOT NULL AND y IS NOT NULL),
        |e AS (SELECT x1, x2, y,
        |  exp(z1 - greatest(z1, z2, z3)) AS e1,
        |  exp(z2 - greatest(z1, z2, z3)) AS e2,
        |  exp(z3 - greatest(z1, z2, z3)) AS e3
        | FROM z),
        |c AS (SELECT x1, x2,
        |  e1 / ((e1 + e2) + e3) - CASE WHEN y = 'en' THEN 1.0 ELSE 0.0 END AS r1,
        |  e2 / ((e1 + e2) + e3) - CASE WHEN y = 'de' THEN 1.0 ELSE 0.0 END AS r2,
        |  e3 / ((e1 + e2) + e3) - CASE WHEN y = 'xx' THEN 1.0 ELSE 0.0 END AS r3
        | FROM e)
        |SELECT round(avg(r1 * x1), 6) AS g_en_alpha,
        | round(avg(r1 * x2), 6) AS g_en_lntok,
        | round(avg(r1), 6) AS g_en_bias,
        | round(avg(r2 * x1), 6) AS g_de_alpha,
        | round(avg(r2 * x2), 6) AS g_de_lntok,
        | round(avg(r2), 6) AS g_de_bias,
        | round(avg(r3 * x1), 6) AS g_xx_alpha,
        | round(avg(r3 * x2), 6) AS g_xx_lntok,
        | round(avg(r3), 6) AS g_xx_bias,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM c""".stripMargin,

    "events_windowed_topk" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT hour, event_type, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT hour, event_type, n, row_number() OVER (
        |        PARTITION BY hour ORDER BY n DESC, event_type) AS rnk FROM h) t
        |WHERE rnk <= 3 ORDER BY hour, rnk""".stripMargin,

    // NULL step-times fall out identically: a null comparison makes the
    // AND null → CASE false → 0, matching Spark's null-skipping sum of
    // a null boolean cast.
    // At-least-stage counts from the same min-chain ground truth.
    "events_funnel_counts" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        |SELECT CAST(1 AS INT) AS stage, (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
        |UNION ALL
        |SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |UNION ALL
        |SELECT 3, (SELECT CAST(count(*) AS BIGINT) FROM s3)
        |ORDER BY stage""".stripMargin,

    // Min-chain ground truth: each stage's timestamp is the earliest
    // occurrence strictly after the previous stage's.
    "events_funnel_strict" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        | CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |           WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached_stage,
        | (t3 IS NOT NULL) AS completed
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |       LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "events_funnel" ->
      """WITH p AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
        |  min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
        |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
        | FROM events GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        | CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        | CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after,
        | CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after
        |FROM p""".stripMargin,

    // Same ISO Monday week truncation; offsets are exact multiples of
    // 604800 s, so the division is exact in either engine.
    "events_cohort_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, week FROM e)
        |SELECT cohort_week,
        | CAST((epoch(week) - epoch(cohort_week)) / 604800 AS BIGINT) AS week_offset,
        | CAST(count(*) AS BIGINT) AS n_active_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same binning (floor over an exact-width division), same long
    // count arithmetic, same skip-one-sided-bins PSI convention; CDF
    // divisions are long/long in both engines.
    "profile_drift" ->
      """WITH a AS (SELECT floor(value / 8.0) AS bin, count(*) AS n_a
        |           FROM events WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1),
        |b AS (SELECT floor(value / 8.0) AS bin, count(*) AS n_b
        |      FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1),
        |j AS (SELECT coalesce(a.bin, b.bin) AS bin,
        |        coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |      FROM a FULL OUTER JOIN b ON a.bin = b.bin),
        |c AS (SELECT bin, n_a, n_b,
        |  sum(n_a) OVER (ORDER BY bin) * 1.0 / sum(n_a) OVER () AS cdf_a,
        |  sum(n_b) OVER (ORDER BY bin) * 1.0 / sum(n_b) OVER () AS cdf_b,
        |  n_a * 1.0 / sum(n_a) OVER () AS pa,
        |  n_b * 1.0 / sum(n_b) OVER () AS pb
        | FROM j)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_a AS BIGINT) AS n_a,
        | CAST(n_b AS BIGINT) AS n_b,
        | round(cdf_a, 6) AS cdf_a, round(cdf_b, 6) AS cdf_b,
        | round(abs(cdf_a - cdf_b), 6) AS ks_gap,
        | round((greatest(pa, 0.000001) - greatest(pb, 0.000001))
        |   * ln(greatest(pa, 0.000001) / greatest(pb, 0.000001)), 6) AS psi_term
        |FROM c ORDER BY bin""".stripMargin,

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
        |WHERE rank <= 1 ORDER BY q_id""".stripMargin,

    // Bit-for-bit the same shift/mask interleave as Scale.zorderValue.
    "layout_zorder" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         | CAST($zorderSqlExpr AS BIGINT) AS zval
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )

  /** The 16-bit Morton interleave of (l_partkey, l_suppkey) as portable
    * SQL — generated term-by-term so the oracle is the same shift/mask
    * arithmetic as [[graft.operators.Scale.zorderValue]]. */
  private def zorderSqlExpr: String =
    (0 until 16).map { i =>
      s"(((l_partkey >> $i) & 1) << ${2 * i}) | (((l_suppkey >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
