package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Balance, Dedup, Multimodal, Similarity, TextAnalysis}

import TrainingQueries._

/** Corpus assembly (sampling, mixing, packing, decontamination, splits, layout, quality reports) —
  * one domain slice of the training-data query inventory, split out of
  * [[TrainingQueries]] along the map's section seams as a pure move
  * (r17, no behavior change). [[TrainingQueries.queries]] /
  * [[TrainingQueries.oracles]] compose the slices back into the single
  * public surface the driver contract reads; shared fixtures stay on
  * [[TrainingQueries]] so specs and oracles can never drift. */
private[queries] object CorpusQueries {

  def queries: Map[String, Q] = Map(

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
      // planted and the two scalar aggregates are read by BOTH band
      // rows (and nLeaks is a brute-force cosine cross join) — pinned so
      // each computes once instead of once per recallRow (r20; the
      // bench's clean-state hygiene unpersists them after the query)
      val planted = bench.crossJoin(broadcast(variants))
        .select((col("src_id") * 10 + col("variant")).as("leak_id"),
          expr("concat(slice(bv, 1, coord - 1), " +
            "array(element_at(bv, coord) + delta), " +
            "slice(bv, coord + 1, size(bv) - coord))").as("lv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val benchV = bench.select(col("bv"))
      // ground truth: planted rows whose EXACT cosine reaches the
      // threshold against any benchmark vector (brute force)
      val nLeaks = planted.crossJoin(broadcast(benchV))
        .filter(Similarity.cosine(col("lv"), col("bv")) >= 0.95)
        .select(col("leak_id")).distinct()
        .agg(count(lit(1)).as("n_leaks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
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

    // ── Corpus assembly: deterministic global shuffle ───────────────────
    // (shard, pos) IS the total order; per-shard windows only — the
    // randomize-before-training pass without a global sort.
    "corpus_global_shuffle" -> ((s, dir) =>
      graft.ops.Corpus.deterministicShuffle(
          Tables.documents(s, dir).select("doc_id"), "doc_id", seed = "shuf7")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))),

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

    // ── Corpus assembly: token-length buckets for pad-efficient
    // batching (integer threshold CASEs — no float log2 boundaries). ────
    "corpus_length_buckets" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(graft.ops.Corpus.lengthBucket(col("text")).as("bucket"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("bucket")),

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

    "corpus_pack_chunks" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS BIGINT) AS n_tokens
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
        |FROM agg WHERE n_hit > 0 ORDER BY doc_id""".stripMargin
  )
}
