package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Balance, Dedup, Multimodal, Similarity, TextAnalysis}

import TrainingQueries._

/** Text analysis (language ID, quality, tokenization, BPE, unigram LM, BM25, fingerprints, PII) —
  * one domain slice of the training-data query inventory, split out of
  * [[TrainingQueries]] along the map's section seams as a pure move
  * (r17, no behavior change). [[TrainingQueries.queries]] /
  * [[TrainingQueries.oracles]] compose the slices back into the single
  * public surface the driver contract reads; shared fixtures stay on
  * [[TrainingQueries]] so specs and oracles can never drift. */
private[queries] object TextQueries {

  def queries: Map[String, Q] = Map(

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

    // ── Text: repetition ratios (Gopher-style quality signal) ───────────
    "text_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.ops.TextAnalysis.ngramDistinctRatio(col("text"), 2)
            .as("distinct_2gram_ratio"),
          graft.ops.TextAnalysis.ngramDistinctRatio(col("text"), 3)
            .as("distinct_3gram_ratio"))
        .orderBy(col("doc_id"))),

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
    })
  )

  def oracles: Map[String, String] = Map(

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
        | SELECT token FROM (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents WHERE text IS NOT NULL)
        | WHERE token <> ''),
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
        | SELECT chr(1) || array_to_string(
        |   list_filter(regexp_split_to_array(trim(text), '\s+'), t -> strpos(t, chr(1)) = 0),
        |   chr(1)||chr(1)) || chr(1) AS s
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
        |WHERE len(t.t) >= 2 ORDER BY t.doc_id""".stripMargin
  )
}
