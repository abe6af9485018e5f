package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for large-scale training-data pipelines:
  * sequence packing, stratified sampling, per-domain quotas, benchmark
  * decontamination, and deterministic global shuffling. These are the
  * steps BETWEEN cleaning (TextAnalysis/Dedup) and tokenizer output —
  * the part of a pretraining pipeline that decides what the model
  * actually sees and in what mixture.
  *
  * Scale stance shared by every operator here:
  *   - no global windows — every window is partitioned by an explicit
  *     shard/domain key, so work parallelizes across however many
  *     executors hold the shards;
  *   - determinism from content, not from partitioning — sampling and
  *     shuffling decisions hash stable ids (md5), never `rand()`, so a
  *     retried task or a re-run cluster reproduces the same corpus
  *     (the at-least-once replay contract the reference's upsert
  *     pipeline establishes, SURVEY §2 ST4);
  *   - narrow where possible — sampling and packing metadata are pure
  *     column maps; only quota ranking and shuffle positioning shuffle,
  *     and each shuffles once on its partition key.
  */
object Corpus {

  /** A uniform-in-[0,1) draw as an 8-hex-char string, derived from
    * md5(seed:id). Comparing the hex string against a fixed-point hex
    * threshold is an engine-portable "u < p" test: fixed-length
    * lowercase hex compares lexicographically exactly like the integer
    * it encodes, so Spark, DuckDB, and any SQL engine agree without
    * any hex→int parsing. */
  def uniformHex(id: Column, seed: String): Column =
    // NULL ids draw from a sentinel, not NULL: md5(NULL) is NULL and a
    // NULL draw fails every `u < threshold` compare — every sampler
    // built on this silently DROPPED null-id rows, even from keep-all
    // sources. All null-id rows share one deterministic draw (they are
    // indistinguishable by id); callers needing per-row draws for such
    // rows must key on content instead. The null branch swaps the
    // SEPARATOR (";" for ":"), so no real id value can ever alias the
    // null draw — "seed:anything" and "seed;null" differ at the
    // separator byte — while every non-null draw (and the oracle SQL
    // that replays it) is untouched.
    substring(md5(when(id.isNull, lit(seed + ";null"))
      .otherwise(concat(lit(seed + ":"), id.cast("string")))), 1, 8)

  /** The 8-hex-char threshold encoding probability `p` (e.g. 0.25 →
    * "40000000"): floor(p·2^32) zero-padded to 8 nibbles. `p = 1.0`
    * returns "g0000000" — every hex digit sorts below 'g', so `u <
    * threshold` is keep-ALL (a clamped "ffffffff" would drop the one
    * row in 2^32 whose draw is exactly ffffffff). The sentinel obeys
    * the same lexicographic rule in any engine, so oracle SQL carries
    * the literal unchanged. */
  def hexThreshold(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"probability out of range: $p")
    if (p >= 1.0) "g0000000"
    else f"${(p * 4294967296.0).toLong}%08x"
  }

  /** Guard for operators that add contract output columns (`shard`,
    * `pos`, `qrank`, …): refuse input that already carries the name
    * instead of silently clobbering caller data. */
  private def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename them; " +
        "these names are produced by this operator")
  }

  /** The packers shard by `pmod(id, nShards)`, which needs a numeric id
    * — a string/UUID id would throw an ANSI cast error at runtime (or,
    * pre-ANSI, silently collapse every row into one NULL shard and sort
    * the corpus in a single task). Refuse at PLAN time with guidance. */
  private[graft] def requireNumericId(df: DataFrame, idCol: String, what: String): Unit =
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$what shards by pmod($idCol, nShards) and needs a NUMERIC id " +
        s"(got ${df.schema(idCol).dataType.simpleString}) — derive one " +
        s"first, e.g. xxhash64($idCol), and keep the original alongside")

  /** Deterministic stratified sampling: keep a row iff its content-hash
    * uniform draw falls under its stratum's rate. This is the mixture
    * step of corpus assembly (downsample over-represented domains /
    * languages). Pure narrow filter — no shuffle, no state, and the
    * same rows survive on any cluster, any partitioning, any retry.
    *
    * 100 TB: the filter sits directly on the scan, so column pruning
    * and predicate pushdown still apply to everything else; the
    * md5 is one codegen'd call per row. */
  def sampleStratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      seed: String = "graft"): DataFrame = {
    df.filter(uniformHex(col(idCol), seed) <
      rateThreshold(strataCol, rates, defaultRate))
  }

  /** The shared hash-threshold when-chain behind [[sampleStratified]]
    * and [[keepBySourceRates]] (one implementation, one null-group
    * rule): a NULL rates key matches NULL group values via isNull —
    * `===` never matches NULL, which silently ignored the caller's
    * null-group rate. */
  private def rateThreshold(groupCol: String,
      rates: Map[String, Double], defaultRate: Double): Column =
    rates.foldRight(lit(hexThreshold(defaultRate))) {
      case ((g, p), els) =>
        val cond = if (g == null) col(groupCol).isNull
          else col(groupCol) === g
        when(cond, lit(hexThreshold(p))).otherwise(els)
    }

  /** Exact-SIZE deterministic sample: the `n` rows of each stratum whose
    * content-hash draw ranks lowest — the fixed-size counterpart of
    * [[sampleStratified]]'s fixed-rate keep (eval subsets are specified
    * as "1,000 documents per language", not as rates). Ranking by
    * `(uniformHex, id)` makes the sample deterministic on any cluster
    * and NESTED: the top-n sample is a prefix of the top-m (m > n)
    * sample, so growing an eval set only adds documents.
    *
    * 100 TB: one hash shuffle on the stratum; the `srank <= n` bound
    * pushes a partial `WindowGroupLimit` below the exchange (same
    * plan-asserted shape as [[domainQuota]]), so over-quota rows are
    * discarded map-side. */
  def sampleExactN(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      n: Int,
      seed: String = "graft"): DataFrame = {
    requireFresh(df, "srank")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(uniformHex(col(idCol), seed), col(idCol))
    df.withColumn("srank", row_number().over(w).cast("long"))
      .filter(col("srank") <= n)
  }

  /** Per-domain quota: keep at most `quota` rows per domain, ranked by
    * the given ordering (pass a deterministic tie-break, e.g. the id,
    * as the last column) — the "cap the biggest domains" half of data
    * mixing, where [[sampleStratified]] is the proportional half.
    *
    * 100 TB: one hash shuffle on the domain key; the rank window is
    * per-domain and Spark's `WindowGroupLimit` pushes the `rank <=
    * quota` bound into a partial top-k BEFORE the shuffle, so no
    * executor ever sorts a whole domain (plan-asserted in PlanSpec).
    * Skewed domains (the usual: en ≫ everything) are exactly the rows
    * the partial limit discards early. */
  def domainQuota(
      df: DataFrame,
      domainCol: String,
      quota: Int,
      ordering: Seq[Column]): DataFrame = {
    requireFresh(df, "qrank")
    val w = Window.partitionBy(col(domainCol)).orderBy(ordering: _*)
    df.withColumn("qrank", row_number().over(w).cast("long"))
      .filter(col("qrank") <= quota)
  }

  /** Sequence packing, concat-and-chunk style: documents are laid out
    * back-to-back per shard in id order, and the resulting token stream
    * is cut into fixed `chunkTokens` windows. Emits the full span each
    * document occupies: (shard, chunk_id, chunk_offset, end_chunk,
    * end_offset) — chunk_id/chunk_offset locate the first token,
    * end_chunk/end_offset the last (inclusive), so a consumer can
    * materialize every chunk's contents directly from the spans without
    * re-deriving the running layout (split-allowed packing, the
    * standard pretraining layout where documents are concatenated with
    * EOD separators and chunked).
    *
    * 100 TB: token counts come from the fused one-pass text kernel
    * (narrow); the only shuffle is the per-shard running sum, and
    * shards are a free parameter — 10k shards at 100 TB keeps every
    * window partition bounded. Within a shard the layout is
    * id-deterministic, so two runs produce byte-identical packing. */
  def packChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      chunkTokens: Int): DataFrame = {
    requireFresh(df, "shard", "n_tokens")
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    requireNumericId(df, idCol, "packChunks")
    // rowsBetween, not the default RANGE frame: duplicate ids within a
    // shard would be RANGE-frame peers and both receive the combined
    // cumulative sum — two overlapping spans, a silently corrupt chunk
    // layout. With a ROWS frame duplicates still pack (arbitrary but
    // valid relative order); ids SHOULD be unique per the layout
    // contract (hash-derived ids can collide at ~10^11 docs — dedupe
    // first or widen the id).
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // last token of the document (inclusive): every text has ≥1 token
    // under split semantics, so token_end = token_start + n_tokens − 1.
    // NULL text coalesces to "" (one empty token — packBins' documented
    // discipline), not a NULL n_tokens that would void the whole span
    val tokenEnd = col("token_start") + col("n_tokens") - 1
    df.withColumn("shard", pmod(col(idCol), lit(nShards)).cast("long"))
      .withColumn("n_tokens",
        TextAnalysis.tokenCount(coalesce(col(textCol), lit(""))))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("token_start", col("__cum") - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("token_start") / chunkTokens).cast("long").as("chunk_id"),
        (col("token_start") % chunkTokens).cast("long").as("chunk_offset"),
        (tokenEnd / chunkTokens).cast("long").as("end_chunk"),
        (tokenEnd % chunkTokens).cast("long").as("end_offset"))
  }

  /** No-split (padded) bin packing — the OTHER standard pretraining
    * layout next to [[packChunks]]' concat-and-chunk: each document
    * goes WHOLE into a bin of `binTokens` capacity (greedy next-fit in
    * id order per shard: if the open bin cannot take the document, a
    * new bin opens; an oversized document occupies a bin alone). Used
    * when cross-document attention is off and sequences are padded —
    * the packing density / padding waste trade a data pipeline tunes.
    * Emits `(idCol, shard, n_tokens, bin)`; `(shard, bin)` is the
    * global bin identity, deterministic on any partitioning or retry.
    *
    * This operator is genuinely SEQUENTIAL per shard (each placement
    * depends on the previous fill level — the capacity-reset recursion
    * no window or aggregate expresses), so it is the one documented
    * `mapPartitions` case: repartition on shard, sort (shard, id)
    * within partitions, then one O(1)-memory streaming pass whose
    * state resets at shard boundaries. Parallelism is the shard count
    * (a free parameter — 10k shards at 100 TB), and the pass touches
    * `(id, shard, n_tokens)` rows only, never text. */
  def packBins(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      binTokens: Int): DataFrame = {
    requireFresh(df, "shard", "n_tokens", "bin")
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    require(binTokens >= 1, s"binTokens must be >= 1: $binTokens")
    requireNumericId(df, idCol, "packBins")
    // NULL text coalesces to "" (one empty token — the kernel split
    // discipline) instead of a NULL n_tokens that would NPE getLong
    val meta = df.select(col(idCol),
      pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
      TextAnalysis.tokenCount(coalesce(col(textCol), lit("")))
        .as("n_tokens"))
    val parted = meta.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(
      parted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "bin", org.apache.spark.sql.types.LongType, nullable = false))
    parted.mapPartitions { it =>
      var shard = Long.MinValue
      var bin = -1L
      var used = 0L
      var open = false
      it.map { r =>
        val s = r.getLong(1)
        val tok = r.getLong(2)
        if (s != shard) { shard = s; bin = -1L; used = 0L; open = false }
        if (!open || used + tok > binTokens) { bin += 1; used = tok; open = true }
        else used += tok
        org.apache.spark.sql.Row(r.get(0), s, tok, bin)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Sliding-window chunking with overlap: each document is cut into
    * windows of `chunkTokens` whitespace tokens advancing by
    * `strideTokens` (< chunk ⇒ consecutive chunks overlap) — the
    * retrieval/context-assembly layout, where [[packChunks]] is the
    * pretraining concat-and-chunk layout. A document of `n` tokens
    * yields `1` chunk when `n <= chunkTokens`, else
    * `(n - chunkTokens + strideTokens - 1) div strideTokens + 1`
    * (integer arithmetic — no float ceil whose boundary rounding could
    * differ across engines); the final chunk is clipped to the text.
    * Emits `(id, chunk_idx, start_tok, end_tok, chunk_text)` with
    * `start_tok` 0-based and `end_tok` exclusive; an empty document
    * yields one empty chunk (span [0,0)).
    *
    * 100 TB: a pure narrow map + explode — no shuffle, no state; the
    * ~(n/stride)× row fan-out is the contract (chunks ARE the output),
    * and each output row carries one bounded window, never the whole
    * document. Chunk identity is (id, chunk_idx) — deterministic on
    * any partitioning or retry. */
  def chunkOverlap(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens]: $strideTokens")
    requireFresh(df, "chunk_idx", "start_tok", "end_tok", "chunk_text")
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    val n = size(toks).cast("long")
    // the guard reads the child Project's __n, NOT the raw `n`
    // expression: codegen subexpression elimination cannot span the
    // Generate boundary, so referencing `n` here re-tokenized every
    // document a second time inside the explode
    val nChunks = when(col("__n") <= chunkTokens, lit(1L)).otherwise(
      expr(s"(__n - $chunkTokens + $strideTokens - 1) div $strideTokens") + 1L)
    val start = col("chunk_idx") * strideTokens
    val end = least(start + chunkTokens, col("__n"))
    df.withColumn("__toks", toks)
      .withColumn("__n", n)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), nChunks - 1)))
      .select(col(idCol), col("chunk_idx"),
        start.as("start_tok"), end.as("end_tok"),
        array_join(
          slice(col("__toks"), (start + 1).cast("int"), (end - start).cast("int")),
          " ").as("chunk_text"))
  }

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one `k`-token shingle with a benchmark/eval document — the
    * standard n-gram-overlap test-set leak check run before training.
    * Returns the distinct contaminated ids.
    *
    * 100 TB: the benchmark side is usually small by construction (eval
    * sets are thousands of documents, not billions) — its distinct
    * shingle set is broadcast, so the corpus side stays a narrow
    * explode + broadcast semi-join: NO shuffle of corpus data at all.
    * The explode is 1→~L rows per document but each row is one short
    * shingle string, and the semi-join short-circuits per partition.
    *
    * A benchmark that is NOT broadcast-small (decontaminating against
    * another large corpus) would OOM the driver/executors, so the
    * shingle count is probed against `maxBroadcastShingles` first
    * (a bounded `limit(n+1).count()` — never a full count) and the
    * join falls back to a plain shuffle left-semi with identical
    * output; the probe touches only the benchmark side. */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 8,
      maxBroadcastShingles: Long = 4_000_000L): DataFrame = {
    val (corpusShingles, bench) = shingleProbe(
      corpus, benchmark, idCol, textCol, shingleLen, maxBroadcastShingles)
    corpusShingles
      .join(bench, Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Shared probe for the contamination operators: the corpus exploded
    * to (id, shingle) and the benchmark's distinct shingle set —
    * broadcast when its size (probed with a bounded `limit(n+1).count()`,
    * never a full count) fits `maxBroadcastShingles`, a plain shuffle
    * side otherwise. */
  private def shingleProbe(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      maxBroadcastShingles: Long): (DataFrame, DataFrame) = {
    val corpusShingles = corpus.select(col(idCol),
      explode(Dedup.shingleSet(col(textCol), shingleLen)).as("__sh"))
    // eager localCheckpoint: the broadcast-size probe (limit.count) and
    // the caller's join would otherwise EACH re-run the benchmark scan +
    // shingle explode + distinct — the call's dominant cost, paid twice
    // (decontaminateBloom documents and fixes the same re-run)
    val benchShingles = benchmark
      .select(explode(Dedup.shingleSet(col(textCol), shingleLen)).as("__sh"))
      .distinct()
      .localCheckpoint(true)
    (corpusShingles, broadcastIfSmall(benchShingles, maxBroadcastShingles))
  }

  /** Broadcast `df` when its row count — probed with a bounded
    * `limit(n+1).count()`, never a full count — fits `maxRows`; the
    * plain frame otherwise. Clamp BEFORE toInt: a budget above
    * Int.MaxValue would wrap negative and turn the probe into
    * limit(2), green-lighting an arbitrarily large broadcast. */
  private def broadcastIfSmall(df: DataFrame, maxRows: Long): DataFrame = {
    val probe = math.min(maxRows, Int.MaxValue - 1L).toInt.max(1) + 1
    if (df.limit(probe).count() <= maxRows) broadcast(df) else df
  }

  /** Bloom-filter decontamination — [[decontaminate]]'s plan shape for
    * the regime where the benchmark's shingle set is TOO BIG to
    * broadcast (decontaminating one corpus against another, or against
    * a very large eval union). Output is IDENTICAL to [[decontaminate]]
    * by construction: the bloom only PRE-FILTERS (its false positives
    * are eliminated by an exact semi-join on the real shingle strings),
    * and a bloom has no false negatives.
    *
    * 100 TB shape: the benchmark aggregates once into a `numBits`-wide
    * bloom (Spark's own runtime-filter aggregate, ~`numBits/8` bytes —
    * megabytes where the distinct shingle set would be gigabytes),
    * which reaches the probe as a SCALAR SUBQUERY — the same plan shape
    * Spark's own `InjectRuntimeFilter` emits. The corpus side is then a
    * narrow explode + bloom probe with NO shuffle and no broadcast of
    * benchmark data. Only the surviving candidate rows — true leaks
    * plus the bloom's small false-positive mass — reach the exact
    * verify join, so where [[decontaminate]]'s non-broadcast fallback
    * shuffles EVERY corpus shingle, this path shuffles only candidates.
    * The bloom bytes never exist as a driver-side Catalyst literal:
    * an `Array[Byte]` `Literal` is hashed/compared O(bytes) on every
    * analyzer/optimizer pass that canonicalizes the tree, which at the
    * 4 MB default cost ~6 s of pure driver time per call (measured
    * r20); the subquery result materializes only at execution, inside
    * the physical plan. */
  def decontaminateBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 8,
      expectedShingles: Long = 4_000_000L,
      numBits: Long = 33_554_432L,
      maxBroadcastShingles: Long = 4_000_000L): DataFrame = {
    // plan-time bounds (the dsirLlrTable discipline): the bloom BYTES
    // materialize on the driver as the scalar-subquery result and ship
    // inside the probe stage's task binary, so an oversized numBits is
    // a driver OOM / task-binary blowup mid-job; non-positive
    // parameters would fail deep inside the kernel aggregate instead
    // of here with guidance
    require(expectedShingles > 0,
      s"decontaminateBloom: expectedShingles must be positive, got $expectedShingles")
    require(numBits > 0 && numBits <= (1L << 31),
      s"decontaminateBloom: numBits must be in (0, 2^31] (= 256 MB of " +
        s"bloom bytes shipped to every task), got $numBits — shard the " +
        "benchmark across several calls instead of one giant filter")
    // ONE pinned artifact: the DISTINCT benchmark shingles. Every
    // consumer — the bloom aggregate (insertion is idempotent, so a
    // bloom over distinct shingles is the same filter, with a tighter
    // fit to expectedShingles), the broadcast-size probe, and the
    // exact-verify join — reads this one cache, so the benchmark scan +
    // explode runs once and the distinct shuffle runs once. (r19
    // persisted the RAW exploded frame AND its distinct — two caches,
    // the larger one serialized only to feed the distinct; that double
    // persist was the round's one real wall regression.) persist, NOT
    // localCheckpoint: checkpoint blocks have no unpersist hook here
    // and LEAKED the largest cached artifact into the caller's session
    // (exactly what the eager result materialization below prevents).
    val benchDistinct = benchmark
      .select(explode(Dedup.shingleSet(col(textCol), shingleLen)).as("__sh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // an EMPTY benchmark short-circuits BEFORE the corpus is touched:
      // the null bloom from the subquery would drop every row at
      // execution anyway, but only after a full corpus-side explode +
      // probe pass — a plan-time-known-empty result must not cost a
      // corpus scan. isEmpty reads the already-persisted distinct frame.
      if (benchDistinct.isEmpty)
        return corpus.select(col(idCol)).limit(0)
      // the bloom rides into the probe as a scalar subquery — computed
      // once at execution over the cached distinct shingles, never a
      // driver literal (see the scaladoc: a 4 MB binary Literal costs
      // seconds of O(bytes) driver-side canonicalization per call)
      val bloom = benchDistinct
        .agg(call_function("graft_bloom_agg", xxhash64(col("__sh")),
          lit(expectedShingles), lit(numBits)).as("bf"))
        .scalar()
      val cand = corpus
        .select(col(idCol), explode(Dedup.shingleSet(col(textCol), shingleLen)).as("__sh"))
        .filter(call_function("graft_bloom_might_contain",
          bloom, xxhash64(col("__sh"))))
      val bench = broadcastIfSmall(benchDistinct, maxBroadcastShingles)
      // eager: the contaminated-id set is small by nature, and
      // materializing it here lets the benchmark cache free in the
      // finally instead of leaking into the caller's session
      cand.join(bench, Seq("__sh"), "left_semi")
        .select(col(idCol)).distinct()
        .localCheckpoint(true)
    } finally benchDistinct.unpersist(blocking = false)
  }

  /** Graded contamination report: for every corpus document, the
    * FRACTION of its distinct `k`-token shingles that appear in the
    * benchmark — the report form of [[decontaminate]] (binary flagging
    * drops documents; real decontamination reviews usually threshold on
    * overlap share and inspect the gray zone). Returns
    * `(id, n_shingles, n_hit, share)` for every document with ≥ 1
    * shingle.
    *
    * 100 TB: same shape as [[decontaminate]] — benchmark shingles
    * broadcast (with the same size-guarded fallback), corpus side is a
    * narrow explode; the per-document counts are one map-side-combined
    * aggregate on the document id. */
  def contaminationShare(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 8,
      maxBroadcastShingles: Long = 4_000_000L): DataFrame = {
    val (corpusShingles, benchSide) = shingleProbe(
      corpus, benchmark, idCol, textCol, shingleLen, maxBroadcastShingles)
    val bench = benchSide.withColumn("__hit", lit(1L))
    corpusShingles
      .join(bench, Seq("__sh"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col(idCol), col("n_shingles"), col("n_hit"),
        round(col("n_hit") * lit(1.0) / col("n_shingles"), 6).as("share"))
  }

  /** Token-budget mixture: downsample each source so its EXPECTED token
    * contribution hits `budgets(source)` — the third leg of mixture
    * control ([[sampleStratified]] fixes proportions, [[domainQuota]]
    * caps row counts, this targets token budgets, which is how
    * pretraining mixtures are actually specified). Per-source keep rate
    * = min(1, budget / totalTokens); sources without a budget keep
    * everything.
    *
    * Decisions stay content-hash deterministic ([[uniformHex]]), so the
    * mixture is reproducible and NESTED under budget increases (raising
    * a budget only adds rows). Returns the sampled frame plus each
    * row's token count as `n_tokens`.
    *
    * 100 TB: one map-side-combined aggregate computes per-source token
    * totals (rows = |sources|, collected to the driver — mixture specs
    * have tens of sources, not millions); the sample itself is the same
    * pure narrow filter as [[sampleStratified]]. Rates derive from
    * IEEE-double division and [[hexThreshold]]'s fixed-point floor, so
    * any engine recomputes the identical keep set. */
  def mixByTokenBudget(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      budgets: Map[String, Long],
      seed: String = "mix"): DataFrame = {
    requireFresh(df, "n_tokens")
    // coalesce like packBins/packChunks: a null-text row would carry a
    // NULL n_tokens in the RETURNED contract column (downstream getLong
    // NPEs; SQL aggregates silently skip it)
    val withTokens = df.withColumn("n_tokens",
      TextAnalysis.tokenCount(coalesce(col(textCol), lit(""))))
    val totals = sourceTokenTotals(withTokens, sourceCol)
    val rates = budgets.flatMap { case (src, budget) =>
      // a 0-token source (all-null text) must not divide to NaN and
      // crash hexThreshold: keep-all when it has budget (its rows cost
      // nothing against it), keep-none when it has none
      totals.get(src).map(t =>
        src -> (if (t == 0L) (if (budget > 0L) 1.0 else 0.0)
                else math.min(1.0, budget.toDouble / t.toDouble)))
    }
    keepBySourceRates(withTokens, idCol, sourceCol, rates, seed)
  }

  /** Per-source token totals, collected to the driver (rows =
    * |sources| — mixture specs have tens of sources, not millions) —
    * shared by [[mixByTokenBudget]] and [[mixByTemperature]]. Coalesce:
    * a source whose rows are all null-text sums to NULL and
    * Row.getLong would NPE — report 0 tokens instead (a 0-token source
    * has nothing to rebalance/budget, so downstream rate rules ignore
    * or full-keep it, both harmless). */
  private def sourceTokenTotals(
      withTokens: DataFrame, sourceCol: String): Map[String, Long] =
    withTokens.groupBy(col(sourceCol))
      .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("__t"))
      .collect()
      // a NULL source maps under the null key — a real group that
      // keepBySourceRates matches with isNull, so malformed rows are
      // rebalanced like any source instead of silently kept whole.
      // Non-string source columns (an int source id) render via
      // toString — getString threw a bare ClassCastException AFTER the
      // full corpus aggregate had already run; the rendered key matches
      // rateThreshold's === compare, which casts the column the same way
      .map(r => (r.get(0) match {
        case null => null
        case s: String => s
        case other => other.toString
      }) -> r.getLong(1)).toMap

  /** Quality-weighted downsampling: keep each row with probability
    * equal to its own (clamped to [0, 1]) score — soft curation where
    * higher-quality documents survive at higher rates instead of a
    * hard keep/drop threshold. The per-ROW generalization of
    * [[sampleStratified]]'s per-stratum rate: the same content-hash
    * draw, compared against a threshold computed from the row's score
    * in the same fixed-point hex encoding, so the survivor set is
    * deterministic, replayable cross-engine, and NESTED under score
    * increases (raising a document's score can only keep it).
    *
    * Pass an engine-exact score (round to 6 dp — same discipline as
    * the quality-classifier queries) or two engines can disagree at
    * the fixed-point floor. Pure narrow filter: no shuffle, composes
    * with scan pushdown at 100 TB. */
  def sampleByScore(
      df: DataFrame,
      idCol: String,
      scoreCol: org.apache.spark.sql.Column,
      seed: String = "score"): DataFrame = {
    // NaN-safe BEFORE the clamp: greatest/least treat NaN as larger
    // than everything, so a NaN score (0/0 from upstream ratio
    // arithmetic — the unscoreable, typically worst documents) would
    // clamp to 1.0 and be kept with certainty; it drops instead.
    // nanvl evaluates the (possibly expensive) score expression ONCE —
    // a when(isnan(sc)).otherwise(sc) form evaluated it twice
    val p = least(greatest(nanvl(scoreCol.cast("double"), lit(0.0)),
      lit(0.0)), lit(1.0))
    val th = when(p >= 1.0, lit("g0000000"))
      .otherwise(format_string("%08x",
        floor(p * lit(4294967296.0)).cast("long")))
    df.filter(uniformHex(col(idCol), seed) < th)
  }

  /** Temperature-flattened token mixture (the multilingual-pretraining
    * rebalance: sample source s with probability ∝ tokens_s^tau): keep
    * rate `r_s = (t_min / t_s)^(1-tau)`, so expected post-sampling
    * token mass follows the temperature distribution while the
    * SMALLEST source is kept whole — maximum data retention subject to
    * r ≤ 1. `tau = 1` keeps everything (proportional mixture); tau → 0
    * equalizes sources. The fourth leg of mixture control next to
    * [[sampleStratified]] / [[domainQuota]] / [[mixByTokenBudget]].
    *
    * Rates round to 6 dp before the [[hexThreshold]] fixed-point floor,
    * and `tau = 0.5` computes via `sqrt` (correctly rounded per IEEE —
    * `pow`'s 1-ulp slack is the one place two engines could disagree),
    * so the keep set replays exactly cross-engine. Same narrow
    * hash-threshold filter as every sampler here; the only distributed
    * work is one map-side-combined per-source token total. */
  def mixByTemperature(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      tau: Double,
      seed: String = "mix"): DataFrame = {
    requireFresh(df, "n_tokens")
    val withTokens = df.withColumn("n_tokens", // coalesce: see mixByTokenBudget
      TextAnalysis.tokenCount(coalesce(col(textCol), lit(""))))
    keepBySourceRates(withTokens, idCol, sourceCol,
      temperatureRates(sourceTokenTotals(withTokens, sourceCol), tau), seed)
  }

  /** The pure temperature rate rule — `(t_min / t_s)^(1-tau)`, 6-dp
    * rounded, sqrt-exact at tau=0.5 — shared by [[mixByTemperature]]
    * and the streaming twin (which feeds RUNNING totals instead of a
    * one-shot aggregate). */
  def temperatureRates(
      totals: Map[String, Long], tau: Double): Map[String, Double] = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    // a zero-token source has nothing to rebalance: it neither anchors
    // tMin (0/0 = NaN would crash the rounding, and a zero tMin would
    // zero EVERY other source's rate) nor gets a rate (absent = keep,
    // harmless for rows with no tokens)
    val positive = totals.filter(_._2 > 0L)
    if (positive.isEmpty) return Map.empty
    val tMin = positive.values.min.toDouble
    val e = 1.0 - tau
    def powE(x: Double): Double =
      if (e == 0.5) math.sqrt(x) else math.pow(x, e)
    positive.map { case (src, t) =>
      src -> BigDecimal(powE(tMin / t.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Hash-threshold keep at per-source rates (sources absent from
    * `rates` keep everything) — the shared narrow filter behind the
    * mixture samplers. */
  def keepBySourceRates(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      rates: Map[String, Double],
      seed: String): DataFrame = {
    // a NULL source is a real group (sourceTokenTotals' groupBy
    // collects it, temperatureRates can rate it) — rateThreshold's
    // isNull arm covers it; sources absent from `rates` keep all
    df.filter(uniformHex(col(idCol), seed) <
      rateThreshold(sourceCol, rates, defaultRate = 1.0))
  }

  /** Length-bucket assignment for batch assembly: documents grouped
    * into power-of-two-ish token-length buckets so a training batcher
    * can pad within a bucket instead of to the global max. Buckets are
    * explicit threshold CASEs (portable integer comparisons — no
    * float log2 whose boundary rounding could differ across engines).
    *
    * 100 TB: the label is a narrow one-pass expression (token count
    * from the fused kernel); the per-bucket stats aggregate is
    * map-side combined into at most |buckets| rows per partition. */
  def lengthBucket(textCol: Column, bounds: Seq[Long] = Seq(32L, 64L, 128L, 256L)): Column = {
    require(bounds.nonEmpty, "lengthBucket needs at least one bound")
    require(bounds == bounds.distinct.sorted,
      s"lengthBucket bounds must be strictly ascending, got $bounds — " +
        "an out-of-order bound silently mislabels every longer document")
    // NULL text counts as empty: a NULL token count fails every <=
    // threshold comparison and would fall through to the LARGEST
    // bucket's otherwise-branch — an absent document padded to the
    // longest sequence is the worst possible mislabel
    val n = TextAnalysis.tokenCount(coalesce(textCol, lit("")))
    val labeled = bounds.zipWithIndex.foldRight(
      lit(s"${bounds.size}_gt_${bounds.last}")) { case ((b, i), els) =>
      when(n <= b, lit(s"${i}_le_$b")).otherwise(els)
    }
    labeled
  }

  /** Deterministic global shuffle: the final randomize-before-training
    * pass. Each row gets a content-derived shuffle key md5(seed:id);
    * the total order is (shard, pos) where shard = the first
    * `shardHexChars` key nibbles and pos ranks within the shard —
    * equivalent to ordering the whole corpus by md5 key, but computed
    * with per-shard windows only.
    *
    * 100 TB: one hash shuffle into 16^shardHexChars shards, each
    * sorted independently — the classic sort-within-partitions shuffle
    * that never materializes a global sort. ONE shard is ONE window
    * task's sort, so size the fan-out to the data: at the default 2
    * (256 shards) 100 TB means ~400 GB per task — a straggler/spill
    * wall; 4 (65,536 shards) keeps tasks at ~1.5 GB
    * ([[shardHexCharsFor]] computes this). Deterministic: same seed +
    * same fan-out → same permutation on any cluster topology, which
    * makes training runs reproducible and resumable. */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      seed: String = "shuffle",
      shardHexChars: Int = 2): DataFrame = {
    require(shardHexChars >= 1 && shardHexChars <= 8,
      s"shardHexChars must be in [1,8], got $shardHexChars")
    requireFresh(df, "shard", "pos", "__key")
    // the sentinel keeps a null-id row's (shard, pos) DEFINED and
    // deterministic (a NULL key sorted arbitrarily); SEVERAL null-id
    // rows still tie (nothing distinguishes them) — reproducibility
    // requires unique ids, as the contract states. Separator-swapped
    // null branch as in [[uniformHex]]: no real id aliases the null key
    val key = md5(when(col(idCol).isNull, lit(seed + ";null"))
      .otherwise(concat(lit(seed + ":"), col(idCol).cast("string"))))
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard", substring(col("__key"), 1, shardHexChars))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }

  /** Shard fan-out sized so one shard's sort stays a healthy task:
    * the smallest hex-prefix length whose 16^n shards hold at most
    * `targetRowsPerShard` rows each. */
  def shardHexCharsFor(
      totalRows: Long, targetRowsPerShard: Long = 4_000_000L): Int = {
    require(totalRows >= 0 && targetRowsPerShard > 0)
    var n = 1
    var shards = 16L
    while (n < 8 && totalRows / shards > targetRowsPerShard) {
      n += 1; shards *= 16L
    }
    n
  }

  /** Leakage-safe train/test split: assign each document its near-dup
    * CLUSTER (connected components over the verified ≥-`minJaccard`
    * pair graph; singletons are their own cluster), then split by a
    * content-derived hash of the CLUSTER id — so two near-duplicate
    * documents can never straddle the split. Splitting by document hash
    * instead would leak: a test document's near-twin lands in train and
    * the eval measures memorization of the twin, not generalization —
    * the intra-corpus counterpart of benchmark decontamination
    * ([[decontaminate]]).
    *
    * Returns `df` plus `cluster` and `split` ("train"/"test") columns.
    * Deterministic from content ([[uniformHex]] of the cluster id,
    * [[hexThreshold]] cut) — reruns and retried tasks agree.
    *
    * 100 TB: the pair graph and components come from the bucketed LSH
    * + hybrid union-find machinery ([[Dedup.verifiedNearDupPairs]] /
    * [[Dedup.clusterPairs]] — candidates never go quadratic); the
    * assignment itself is one left join on the id plus a narrow hash
    * map. */
  def splitByNearDupCluster(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double,
      testFrac: Double,
      seed: String = "graftsplit"): DataFrame = {
    requireFresh(df, "cluster", "split")
    val clusters = Dedup.clusterPairs(
      Dedup.verifiedNearDupPairs(df, idCol, textCol, minJaccard))
      .withColumnRenamed("id", idCol)
    df.join(clusters, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("split",
        when(uniformHex(col("cluster"), seed) < lit(hexThreshold(testFrac)),
          lit("test")).otherwise(lit("train")))
  }

  /** Write the corpus hive-partitioned by `partitionCols` with an
    * explicit file-count and row-order contract — the output layout a
    * downstream consumer (training job, per-language tokenizer, spot
    * audit) prunes by:
    *
    *   - ONE shuffle on (partitionCols, salt) with the salt ranging
    *     over `filesPerPartition` values, so a naive
    *     `write.partitionBy` from `P` upstream tasks cannot explode
    *     into `P × |values|` small files — the classic layout killer at
    *     100 TB — and a hot partition value fans out over UP TO
    *     `filesPerPartition` writers instead of one straggler (hash
    *     collisions can only merge writers, never multiply files);
    *   - rows sorted by `sortCols` within each file, so parquet
    *     row-group min/max footers prune point/range reads INSIDE a
    *     partition (same discipline as the bucketed state table's
    *     commit sort);
    *   - directory pruning comes free from the hive layout: a filter on
    *     the partition columns reads only matching directories
    *     (spec-asserted via `inputFiles`).
    *
    * Determinism from content: the salt hashes `sortCols`, never
    * `rand()`, so a retried task writes identical files. */
  def writeLayout(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "writeLayout needs partition columns")
    require(sortCols.nonEmpty,
      "writeLayout needs sort columns (row-group pruning + deterministic salt)")
    require(filesPerPartition > 0, "filesPerPartition must be positive")
    val salt = pmod(xxhash64(sortCols.map(col): _*), lit(filesPerPartition))
    df.repartition((partitionCols.map(col) :+ salt): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("errorifexists")
      .parquet(path)
  }

  /** Hashed unigram+bigram feature buckets of one document — the DSIR
    * feature map (Xie et al., "Data Selection for Language Models via
    * Importance Resampling", NeurIPS 2023): every word and every
    * adjacent word pair hashes into one of `buckets` cells. The hash is
    * the engine-portable md5-prefix integer (same idiom as the winnow
    * gram hash), so a SQL oracle reproduces the bucketing exactly. */
  private[ops] def dsirBuckets(text: Column, buckets: Int): Column =
    // fused kernel ([[graft.expressions.DsirBucketsExpr]]): the previous
    // transform(concat(ngramList 1, ngramList 2), md5-bucket) paid one
    // md5 Column call per feature through the interpreted lambda walker,
    // in every counting AND scoring pass — same order, same values
    call_function("graft_dsir_buckets", coalesce(text, lit("")), lit(buckets))

  /** Per-bucket feature counts of a corpus: `buckets` rows of
    * `(bucket, count)`, map-side combined — the shuffle moves at most
    * `buckets × partitions` counter cells no matter the corpus size. */
  private def dsirBucketCounts(
      df: DataFrame, textCol: String, buckets: Int): Array[Long] = {
    val rows = df
      .select(explode(dsirBuckets(col(textCol), buckets)).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .collect()
    val counts = new Array[Long](buckets)
    rows.foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    counts
  }

  /** The per-bucket log-likelihood-ratio table
    * `ln((target_b + 1) / (targetTotal + B)) − ln((raw_b + 1) /
    * (rawTotal + B))` (Laplace-smoothed), as a plain array — at most
    * `buckets` doubles, a driver-side object by construction, reusable
    * as a literal in batch scoring ([[dsirWeights]]) or in a streaming
    * projection (the scorer is stateless once the table is fixed). */
  def dsirLlrTable(
      raw: DataFrame, rawTextCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024): Seq[Double] = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets must be in [1, 2^20] (the table broadcasts as a literal): $buckets")
    val rc = dsirBucketCounts(raw, rawTextCol, buckets)
    val tc = dsirBucketCounts(target, targetTextCol, buckets)
    val rTot = rc.sum.toDouble + buckets
    val tTot = tc.sum.toDouble + buckets
    (0 until buckets).map(b =>
      math.log((tc(b) + 1.0) / tTot) - math.log((rc(b) + 1.0) / rTot))
  }

  /** Score column: Σ over the document's hashed unigram+bigram
    * features of `llr(bucket)` — the DSIR importance log-weight. A
    * narrow codegen'd projection (kernel n-gram list + literal-array
    * lookup + fold): scoring shuffles NOTHING, whatever the corpus
    * size, and the same column works unchanged over a stream. */
  def dsirScore(llr: Seq[Double], text: Column): Column =
    // fused kernel ([[graft.expressions.DsirScoreExpr]]): same feature
    // order and the same left-fold IEEE accumulation as the previous
    // aggregate(dsirBuckets, 0.0, acc + element_at(table, b + 1)) —
    // bit-identical scores with the llr table as ONE reference object
    // instead of a buckets-sized literal array walked per feature
    call_function("graft_dsir_score", coalesce(text, lit("")),
      typedLit(llr))

  /** DSIR importance weights for every `raw` document against a
    * `target` domain sample: rows of `(idCol, llr_weight)` where
    * positive means "looks more like the target corpus than like the
    * raw corpus" under smoothed hashed-n-gram unigram+bigram models.
    * Selection composes downstream: threshold at 0, take the top
    * fraction, or resample ∝ exp(weight) via [[sampleByScore]].
    *
    * 100 TB shape: two bounded aggregates (one over raw, one over the
    * — typically far smaller — target) build the `buckets`-entry LLR
    * table; the scoring pass is a narrow projection with the table as
    * a literal. Zero joins, zero corpus shuffle, and the target corpus
    * never needs to fit anywhere but its own aggregate. */
  def dsirWeights(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024): DataFrame = {
    val llr = dsirLlrTable(raw, textCol, target, targetTextCol, buckets)
    raw.select(col(idCol),
      round(dsirScore(llr, col(textCol)), 6).as("llr_weight"))
  }

  /** Snapshot delta between two corpus versions: every key classified
    * as `added` (new only), `removed` (old only), `changed` (both, but
    * content hash differs), or `unchanged`. This is the incremental-
    * refresh primitive of a continuously recrawled corpus — the
    * downstream pipeline (re-embed, re-dedup, re-tokenize) runs over
    * `added ∪ changed` instead of the full snapshot, and `removed`
    * drives retention deletes (the reference's queue-drain shape,
    * SURVEY §2 D1/D2, generalized to whole-corpus versions).
    *
    * 100 TB: each side is pruned to `(key, md5(content))` — ~50 bytes a
    * row regardless of document size, with the hash computed BEFORE the
    * exchange — so the full-outer hash join shuffles two key+hash
    * columns, never document bodies. One shuffle per side, AQE-coalesced;
    * no window, no skew (keys are unique per side by contract). */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCol: String, contentCol: String): DataFrame = {
    // presence is an explicit marker column, NOT hash nullability: a row
    // with NULL content hashes to NULL, and reading that as "absent"
    // would classify a removed NULL-content doc as 'added'. The content
    // compare is null-SAFE (<=>), so NULL == NULL content is 'unchanged'
    // and NULL vs non-NULL is 'changed'.
    val o = oldDf.select(col(keyCol).as("__k"),
      md5(col(contentCol).cast("string")).as("__old_h"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(keyCol).as("__k"),
      md5(col(contentCol).cast("string")).as("__new_h"),
      lit(true).as("__in_new"))
    // NULL-SAFE key join: a USING join never matches NULL keys, so a
    // NULL-key doc present in both snapshots emitted 'removed' PLUS
    // 'added' (and double-counted downstream) instead of matching
    // itself — the same hazard the content compare already guards
    o.as("__o").join(n.as("__n"),
        col("__o.__k") <=> col("__n.__k"), "full_outer")
      .select(coalesce(col("__o.__k"), col("__n.__k")).as(keyCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__old_h") <=> col("__new_h"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Per-status counts of [[snapshotDiff]] — the one-line dashboard form
    * (4 rows out, map-side-combined aggregate over the diff). */
  def snapshotDiffCounts(
      oldDf: DataFrame, newDf: DataFrame,
      keyCol: String, contentCol: String): DataFrame =
    snapshotDiff(oldDf, newDf, keyCol, contentCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))

  /** Cluster-balanced sampling (the SemDeDup/topic-balance shape): every
    * vector is assigned to its nearest centroid
    * ([[graft.ops.Similarity.assignClusters]] — a NARROW literal-argmax
    * map), then each cluster is capped at `quota` rows chosen by the
    * deterministic md5 draw ([[uniformHex]]) — so an over-represented
    * topic (boilerplate, templated pages) cannot dominate the mixture,
    * while small topics survive whole. Returns the kept rows with their
    * `cluster` and `qrank`; [[clusterBalanceCounts]] is the dashboard
    * form.
    *
    * 100 TB: assignment shuffles nothing; the only exchange is the
    * per-cluster quota window, partitioned by cluster — with `quota`
    * bounded the window state is bounded, and Spark's WindowGroupLimit
    * pushes the rank cutoff below the shuffle (the [[sampleExactN]]
    * plan shape), so over-quota clusters drop rows map-side instead of
    * sorting whole topics in one task. */
  def clusterBalance(
      emb: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]],
      quota: Int,
      seed: String = "cluster-balance"): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    val assigned =
      graft.ops.Similarity.assignClusters(emb, vecCol, cents)
    domainQuota(assigned, "cluster", quota,
      Seq(uniformHex(col(idCol), seed).asc, col(idCol).asc))
  }

  /** Per-cluster before/after row counts of [[clusterBalance]] — one
    * row per cluster, the balance report a mixture owner reads. */
  def clusterBalanceCounts(
      emb: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]],
      quota: Int,
      seed: String = "cluster-balance"): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    // assign ONCE, MATERIALIZED: the before-counts aggregate and the
    // quota ranking are two independent plan subtrees — without the
    // checkpoint each would re-execute the argmax scoring scan (the
    // dominant per-row cost) from lineage
    val assigned = graft.ops.Similarity.assignClusters(emb, vecCol, cents)
      .select(col(idCol), col("cluster"))
      .localCheckpoint(true)
    val before = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_before"))
    val after = domainQuota(assigned, "cluster", quota,
        Seq(uniformHex(col(idCol), seed).asc, col(idCol).asc))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_after"))
    before.join(after, Seq("cluster"), "left")
      .select(col("cluster"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
  }
}
