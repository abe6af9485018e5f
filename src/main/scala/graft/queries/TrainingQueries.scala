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
  private[queries] def langIdTrainVals: String =
    langIdTrainSet.map { case (l, t) => s"('$l', '$t')" }.mkString(", ")
  private[queries] def langIdHeldoutVals: String =
    langIdHeldout.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
  private[queries] def langIdLineVals: String =
    langIdLineDocs.flatMap { case (i, ls) => ls.map(l => s"($i, '$l')") }
      .mkString(", ")
  private[queries] def langIdLineDocIdVals: String =
    langIdLineDocs.map { case (i, _) => s"($i)" }.mkString(", ")

  /** Shared unigram-LM training replay (candidates → 2 unrolled
    * Viterbi-EM rounds; `u2`/`t2`/`nv` are the final usage counts,
    * total, and candidate-vocab size) — the common prefix of the
    * `text_unigram_lm` and `text_unigram_encode` oracles. The DOUBLE
    * cast on the recursion anchors is load-bearing: a bare 1.0 types
    * as DECIMAL(2,1) in DuckDB and silently truncates every product
    * score to one decimal place. */
  private[queries] val unigramTrainCte: String =
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
  private[queries] def withPlantedNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text")))
  }

  /** All training-data queries — composed from the per-domain slices
    * ([[DedupQueries]], [[SimilarityQueries]], [[TextQueries]],
    * [[CorpusQueries]], [[MultimodalQueries]], [[AnalyticsQueries]];
    * split r17 along the map's section seams, a pure move). Key sets
    * are disjoint by the naming convention the split follows. */
  def queries: Map[String, Q] =
    DedupQueries.queries ++ SimilarityQueries.queries ++
      TextQueries.queries ++ CorpusQueries.queries ++
      MultimodalQueries.queries ++ AnalyticsQueries.queries

  /** DuckDB oracle SQL per query key — same composition as [[queries]]. */
  def oracles: Map[String, String] =
    DedupQueries.oracles ++ SimilarityQueries.oracles ++
      TextQueries.oracles ++ CorpusQueries.oracles ++
      MultimodalQueries.oracles ++ AnalyticsQueries.oracles
}
