package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch event-sequence analytics over the `events` shape
  * (`user_id, ts, event_type, …`) — the funnel/journey operators an
  * analytics engine is expected to ship next to windowed aggs and
  * sessionization (whose batch twins live in the query inventory).
  */
object Events {

  /** Ordered-funnel progression: for each user, how far through
    * `stages` they advanced, where stage `i+1` must occur STRICTLY
    * after the earliest valid occurrence of stage `i` (the min-chain
    * semantics: t₁ = min ts of stage 1, tᵢ = min ts of stage i with
    * ts > tᵢ₋₁). Returns `(userCol, reached_stage, completed)` for
    * every user with at least one event.
    *
    * Typical users take ONE shuffle: events are pruned to the stage
    * types, collected and sorted per user, and folded through a
    * codegen'd `aggregate` lambda — processing events in ts order and
    * advancing greedily at the first qualifying event IS the min-chain
    * (greedy earliest-advance is exactly tᵢ's minimality, and the
    * strict `ts > last` guard resolves equal-timestamp ties identically
    * to the join-chain formulation regardless of sort order).
    *
    * 100 TB: the type prune cuts the shuffle to funnel-relevant rows,
    * and per-user fold state is bounded by `maxEventsPerUser` — a
    * map-side-combined count pass (kept lazily IN the plan, so the
    * guard is correct at every re-execution) routes
    * any user above the cap (a bot with 10⁸ events would otherwise OOM
    * the aggregation buffer) to the
    * join-chain evaluation instead: n bounded min-aggregates
    * ([[funnelJoinChain]]'s tᵢ definition computed literally), whose
    * state per user is ONE (ts) row regardless of history length. Both
    * paths compute the same min-chain, so routing never changes the
    * answer — it only moves pathological users off the list-building
    * path.
    *
    * Passing `maxEventsPerUser = Int.MaxValue` is the caller's
    * ASSERTION that per-user history is bounded (a pre-filtered slice,
    * a capped source): the guard — its count aggregate and both
    * routing joins — drops out of the plan entirely and every user
    * takes the one-shuffle fold. The assertion is the caller's to
    * keep: a genuinely unbounded user then builds an unbounded
    * aggregation buffer, exactly what the default guard exists to
    * prevent. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxEventsPerUser: Int = 1 << 20): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct (a repeated type is ambiguous)")
    require(maxEventsPerUser > 0, "maxEventsPerUser must be positive")
    val n = stages.size
    val pruned = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol),
        graft.functions.GraftFunctions.tsEpochMicros(col(tsCol)).as("__t"),
        col(typeCol).as("__ty"))
      // a NULL ts can never satisfy the strict `__t > last` chain, so
      // the fold already ignores such events — but chainReached's
      // per-stage min() would yield a NULL frontier for a user whose
      // stage-1 events are ALL null-ts and report stage 1 where the
      // fold reports 0 (routing must never change the answer)
      .filter(col("__t").isNotNull)
    // The routing guard stays IN the lazy plan: an eager existence
    // check here would freeze the decision at BUILD time, and a plan
    // re-executed later over a grown source (new files, cache refresh)
    // would take the bare fold into exactly the unbounded buffer the
    // cap exists to prevent. Cost of keeping it lazy: one map-side-
    // combined count aggregate plus two joins on the same user-hash
    // partitioning — a constant factor, and the price of a guard that
    // is correct at every execution. The Int.MaxValue sentinel (caller
    // asserts a bounded source) is the one case where the guard can
    // soundly vanish: no count can exceed it, so the anti join is the
    // identity and the semi join is empty BY CONSTRUCTION, not by data.
    val perUser =
      if (maxEventsPerUser == Int.MaxValue) foldReached(pruned, userCol, stages)
      else {
        val overflow = pruned.groupBy(col(userCol))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxEventsPerUser)
          .select(col(userCol))
        foldReached(
            pruned.join(overflow, Seq(userCol), "left_anti"), userCol, stages)
          .unionByName(chainReached(
            pruned.join(overflow, Seq(userCol), "left_semi"), userCol, stages))
      }
    // NULL-SAFE user join: groupBy forms a null-user group and folds
    // its progress, but a plain left join never matches NULL = NULL —
    // the null user's computed stage was silently zeroed (the row
    // existed, its progress vanished)
    import graft.operators.StateOps.aliasedCol
    events.select(col(userCol)).distinct().as("__au")
      .join(perUser.as("__pu"),
        aliasedCol("__au", userCol) <=> aliasedCol("__pu", userCol), "left")
      .select(aliasedCol("__au", userCol).as(userCol),
        coalesce(col("reached_stage"), lit(0)).as("reached_stage"),
        (coalesce(col("reached_stage"), lit(0)) === n).as("completed"))
  }

  /** The one-shuffle fold: per-user sorted stage events through a
    * codegen'd `aggregate` lambda. Input is the pruned
    * `(userCol, __t, __ty)` shape; per-user buffer is that user's
    * stage-event list (callers bound it via [[funnel]]'s routing). */
  private def foldReached(
      pruned: DataFrame, userCol: String, stages: Seq[String]): DataFrame = {
    val n = stages.size
    val stageArr = array(stages.map(lit): _*)
    pruned
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("__t"), col("__ty"))))
        .as("__evs"))
      .select(col(userCol),
        aggregate(col("__evs"),
          struct(lit(0).as("stage"), lit(Long.MinValue).as("last")),
          (acc, e) => {
            val stage = acc.getField("stage")
            // least() keeps the index in bounds once the funnel is
            // complete (ANSI element_at throws out-of-bounds)
            val want = element_at(stageArr, least(stage + 1, lit(n)))
            val ok = stage < n && e.getField("__ty") === want &&
              e.getField("__t") > acc.getField("last")
            when(ok, struct((stage + 1).as("stage"),
              e.getField("__t").as("last"))).otherwise(acc)
          }).getField("stage").as("reached_stage"))
  }

  /** The join-chain evaluation of the SAME min-chain, with per-user
    * state bounded by one row per stage: t₁ = per-user min ts of
    * stage-1 events; tᵢ = per-user min ts of stage-i events with
    * ts > tᵢ₋₁ (one bounded min-aggregate per stage, each joined to
    * the previous frontier). Users who never reach stage 1 are simply
    * absent (callers coalesce to 0). Costs n shuffles instead of one —
    * which is why [[funnel]] reserves it for users whose history
    * exceeds the fold's buffer cap. */
  private def chainReached(
      pruned: DataFrame, userCol: String, stages: Seq[String]): DataFrame = {
    val n = stages.size
    var frontier = pruned.filter(col("__ty") === stages.head)
      .groupBy(col(userCol)).agg(min(col("__t")).as("__last"))
    var acc = frontier.select(col(userCol), lit(1).as("reached_stage"))
    var i = 1
    while (i < n) {
      frontier = pruned.filter(col("__ty") === stages(i))
        .join(frontier, Seq(userCol))
        .filter(col("__t") > col("__last"))
        .groupBy(col(userCol)).agg(min(col("__t")).as("__last"))
      acc = acc.unionByName(
        frontier.select(col(userCol), lit(i + 1).as("reached_stage")))
      i += 1
    }
    acc.groupBy(col(userCol))
      .agg(max(col("reached_stage")).as("reached_stage"))
  }

  /** Funnel completion counts: how many users reached AT LEAST each
    * stage — the report a funnel chart renders. One extra tiny
    * aggregate over [[funnel]]'s per-user output. */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxEventsPerUser: Int = 1 << 20): DataFrame = {
    val per = funnel(events, userCol, tsCol, typeCol, stages, maxEventsPerUser)
    val n = stages.size
    per.select(explode(sequence(lit(1), lit(n))).as("stage"),
        col("reached_stage"))
      .groupBy(col("stage"))
      .agg(count(when(col("reached_stage") >= col("stage"), 1))
        .as("n_users"))
      .select(col("stage").cast("int").as("stage"), col("n_users"))
  }
}
