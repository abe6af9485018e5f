package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Balance, Dedup, Multimodal, Similarity, TextAnalysis}

import TrainingQueries._

/** Deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, winnowing, containment, clustering, incremental) —
  * one domain slice of the training-data query inventory, split out of
  * [[TrainingQueries]] along the map's section seams as a pure move
  * (r17, no behavior change). [[TrainingQueries.queries]] /
  * [[TrainingQueries.oracles]] compose the slices back into the single
  * public surface the driver contract reads; shared fixtures stay on
  * [[TrainingQueries]] so specs and oracles can never drift. */
private[queries] object DedupQueries {

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
    })
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
        |ORDER BY a_id, b_id""".stripMargin
  )
}
