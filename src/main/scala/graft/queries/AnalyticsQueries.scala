package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Balance, Dedup, Multimodal, Similarity, TextAnalysis}

import TrainingQueries._

/** Analytics surface (joins, grouping sets, windows, sketches, events/funnels, profiling, ML grads, z-order) —
  * one domain slice of the training-data query inventory, split out of
  * [[TrainingQueries]] along the map's section seams as a pure move
  * (r17, no behavior change). [[TrainingQueries.queries]] /
  * [[TrainingQueries.oracles]] compose the slices back into the single
  * public surface the driver contract reads; shared fixtures stay on
  * [[TrainingQueries]] so specs and oracles can never drift. */
private[queries] object AnalyticsQueries {

  def queries: Map[String, Q] = Map(

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

    // ── Events: JSON property extraction through the VARIANT type —
    // Spark 4's semi-structured path (parse once into variant, typed
    // get at query time). Narrow map; the variant never shuffles. ──────
    "events_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k_val"))
        .orderBy(col("event_id"))),

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
      // NEGATED typo ids, not id + offset: an additive offset collides
      // with real ids once min-partkeys exceed it (sf ≳ 0.5), silently
      // dropping pairs to the a_id < b_id filter and making the output
      // order nondeterministic on the duplicate id
      val typos = p.filter(col("id") % 3 === 0)
        .select((col("id") * -1).as("id"),
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
    })
  )

  def oracles: Map[String, String] = Map(

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

    // plain join — salting must not change the result
    "join_salted_skew" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |  AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "scd2_intervals" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(o_orderdate AS DATE) AS valid_from,
        | lead(CAST(o_orderdate AS DATE)) OVER (
        |   PARTITION BY o_custkey
        |   ORDER BY CAST(o_orderdate AS DATE), o_orderkey) - 1 AS valid_to
        |FROM orders ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    // Same prefix blocking, same integer edit distance (parity
    // established by text_levenshtein).
    "join_fuzzy_blocked" ->
      """WITH ents AS (
        | SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name),
        |p AS (
        | SELECT id, name FROM ents
        | UNION ALL
        | SELECT -id, substr(name, 1, length(name) - 1) || 'x'
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
