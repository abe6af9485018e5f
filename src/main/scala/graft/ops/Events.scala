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
    * Implemented as ONE shuffle: events are pruned to the stage types,
    * collected and sorted per user, and folded through a codegen'd
    * `aggregate` lambda — processing events in ts order and advancing
    * greedily at the first qualifying event IS the min-chain (greedy
    * earliest-advance is exactly tᵢ's minimality, and the strict
    * `ts > last` guard resolves equal-timestamp ties identically to the
    * join-chain formulation regardless of sort order). The stage-join
    * alternative costs one shuffle join per stage over the full event
    * table; here the per-user state is just that user's stage-type
    * events.
    *
    * 100 TB: the type prune cuts the shuffle to funnel-relevant rows;
    * per-user lists are bounded by per-user activity (the same bound
    * sessionization state carries). A pathological single user with
    * billions of events would need the join-chain form instead. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct (a repeated type is ambiguous)")
    val n = stages.size
    val stageArr = array(stages.map(lit): _*)
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol), unix_micros(col(tsCol)).as("__t"),
        col(typeCol).as("__ty"))
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
    events.select(col(userCol)).distinct()
      .join(perUser, Seq(userCol), "left")
      .select(col(userCol),
        coalesce(col("reached_stage"), lit(0)).as("reached_stage"),
        (coalesce(col("reached_stage"), lit(0)) === n).as("completed"))
  }

  /** Funnel completion counts: how many users reached AT LEAST each
    * stage — the report a funnel chart renders. One extra tiny
    * aggregate over [[funnel]]'s per-user output. */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    val per = funnel(events, userCol, tsCol, typeCol, stages)
    val n = stages.size
    per.select(explode(sequence(lit(1), lit(n))).as("stage"),
        col("reached_stage"))
      .groupBy(col("stage"))
      .agg(count(when(col("reached_stage") >= col("stage"), 1))
        .as("n_users"))
      .select(col("stage").cast("int").as("stage"), col("n_users"))
  }
}
