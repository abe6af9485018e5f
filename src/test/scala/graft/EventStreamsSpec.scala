package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.{Event, Session}

/** True-streaming tests (MemoryStream micro-batches): watermarked window
  * aggregation and stateful gap sessionization. */
class EventStreamsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click",
      v: Double = 1.0) = Event(id, ts(t), user, typ, v)

  test("streaming: watermarked tumbling-window agg emits closed windows and drops late data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]

    val q = EventStreams.windowedAgg(in.toDF(), window = "1 hour",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in the 10:00 window
      in.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00", v = 2.0))
      q.processAllAvailable()
      // batch 2: event far ahead — watermark advances to 11:30, closing 10:00
      in.addData(ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      // batch 3: a LATE event for the already-closed 10:00 window — dropped
      in.addData(ev(4, "2024-01-01 10:40:00"))
      q.processAllAvailable()

      val rows = s.sql("SELECT * FROM win_agg ORDER BY window_start").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Timestamp]("window_start") == ts("2024-01-01 10:00:00"))
      assert(rows(0).getAs[Long]("n_events") == 2L)   // late event NOT counted
      assert(rows(0).getAs[Double]("value_sum") == 3.0)
    } finally q.stop()
  }

  test("streaming: native session_window merges within gap, closes after watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]

    val q = EventStreams.sessionWindowAgg(in.toDF(), gap = "30 minutes",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("sw_agg")
      .outputMode(OutputMode.Append()).start()
    try {
      // one session: 10:00 and 10:20 merge (gap < 30 min); 11:10 starts a
      // second session (10:20 session ends 10:50 < 11:10)
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:20:00", v = 2.0),
        ev(3, "2024-01-01 11:10:00", v = 5.0))
      q.processAllAvailable()
      // advance the watermark far past both session ends to close them
      in.addData(ev(4, "2024-01-01 15:00:00"))
      q.processAllAvailable()

      val rows = s.sql("SELECT * FROM sw_agg ORDER BY session_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
      // session end = last event + gap
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:50:00"))
      assert(rows(0).getAs[Long]("n_events") == 2L)
      assert(rows(0).getAs[Double]("value_sum") == 3.0)
      assert(rows(1).getAs[Timestamp]("session_start") == ts("2024-01-01 11:10:00"))
      assert(rows(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("streaming: dropDuplicatesWithinWatermark dedups replayed events with bounded state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]

    val q = EventStreams.dedupWithinWatermark(in.toDF(),
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: an event + its at-least-once duplicate (same event_id)
      in.addData(ev(1, "2024-01-01 10:05:00"), ev(1, "2024-01-01 10:05:00"),
        ev(2, "2024-01-01 10:06:00"))
      q.processAllAvailable()
      // batch 2: cross-batch replay of event 1 inside the window — dropped
      in.addData(ev(1, "2024-01-01 10:05:00"), ev(3, "2024-01-01 10:30:00"))
      q.processAllAvailable()

      val ids = s.sql("SELECT event_id FROM dedup_stream ORDER BY event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming: flatMapGroupsWithState sessionization closes sessions on gap timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]

    val q = EventStreams.sessionize(s, in.toDS(), gapSeconds = 1800L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart (one session); user 2: one event
      in.addData(
        ev(1, "2024-01-01 10:00:00", user = 1),
        ev(2, "2024-01-01 10:10:00", user = 1, v = 2.0),
        ev(3, "2024-01-01 10:15:00", user = 2, v = 5.0))
      q.processAllAvailable()
      // advance event time far beyond both sessions' end+gap → timeouts fire
      in.addData(ev(9, "2024-01-01 13:00:00", user = 99))
      q.processAllAvailable()
      in.addData(ev(10, "2024-01-01 15:00:00", user = 99))
      q.processAllAvailable()

      val rows = s.sql(
        "SELECT * FROM sessions WHERE user_id IN (1, 2) ORDER BY user_id").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("user_id") == 1L)
      assert(rows(0).getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
      assert(rows(0).getAs[Long]("n_events") == 2L)
      assert(rows(0).getAs[Double]("value_sum") == 3.0)
      assert(rows(1).getAs[Long]("user_id") == 2L)
      assert(rows(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("streaming: a far-earlier late event opens its OWN session — it must not stretch the open one across a gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(s, in.toDS(), gapSeconds = 1800L,
        watermark = "6 hours") // generous watermark keeps the 08:00 event legal
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 opens session [10:00, 10:10]
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      // batch 2: a legal late event at 08:00 — 2 h before the open
      // session's start, far beyond the 30 min gap: the batch oracle
      // (consecutive-gap rule) emits TWO sessions; absorbing it would
      // fuse them into one [08:00, 10:10] span
      in.addData(ev(3, "2024-01-01 08:00:00"))
      q.processAllAvailable()
      // advance the watermark far past everything → both close
      in.addData(ev(9, "2024-01-02 12:00:00", user = 99))
      q.processAllAvailable()
      in.addData(ev(10, "2024-01-02 18:00:00", user = 99))
      q.processAllAvailable()
      val rows = s.sql("SELECT session_start, session_end, n_events " +
        "FROM late_sessions WHERE user_id = 1 ORDER BY session_start").collect()
      assert(rows.length == 2, s"expected two sessions, got ${rows.toSeq}")
      assert(rows(0).getAs[Timestamp]("session_start") == ts("2024-01-01 08:00:00"))
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-01-01 08:00:00"))
      assert(rows(0).getAs[Long]("n_events") == 1L)
      assert(rows(1).getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
      assert(rows(1).getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }

  test("streaming: a late event WITHIN gap of the open session's start still merges (the legal absorb)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(s, in.toDS(), gapSeconds = 1800L,
        watermark = "6 hours")
      .writeStream.format("memory").queryName("absorb_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      in.addData(ev(3, "2024-01-01 09:45:00")) // 15 min before start: merges
      q.processAllAvailable()
      in.addData(ev(9, "2024-01-02 12:00:00", user = 99))
      q.processAllAvailable()
      in.addData(ev(10, "2024-01-02 18:00:00", user = 99))
      q.processAllAvailable()
      val rows = s.sql("SELECT session_start, session_end, n_events " +
        "FROM absorb_sessions WHERE user_id = 1").collect()
      assert(rows.length == 1, s"expected one merged session, got ${rows.toSeq}")
      assert(rows(0).getAs[Timestamp]("session_start") == ts("2024-01-01 09:45:00"))
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
      assert(rows(0).getAs[Long]("n_events") == 3L)
    } finally q.stop()
  }

  test("streaming: null ts and null event_type records must not kill the funnel queries") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.funnelStream(s, in.toDS(),
        stages = Seq("view", "click"))
      .writeStream.format("memory").queryName("poison_funnel")
      .outputMode(OutputMode.Update()).start()
    try {
      // a null-ts event (filtered) and a null-type event tying on ts
      // with a real one (sorted null-safely, can never match a stage)
      in.addData(
        Event(1, null, 1L, "view", 1.0),
        Event(2, ts("2024-01-01 10:00:00"), 2L, null, 1.0),
        Event(3, ts("2024-01-01 10:00:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, reached_stage FROM poison_funnel ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(rows == Seq((2L, 1)), s"got $rows")
    } finally q.stop()
  }

  test("streaming: funnel state advances across micro-batches, matches batch on in-order data, never regresses") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val stages = Seq("view", "click", "purchase")
    val q = EventStreams.funnelStream(s, in.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_prog")
      .outputMode(OutputMode.Update()).start()
    def stageOf(u: Long): Int = {
      // memory sink in Update mode appends; latest row wins
      val rows = s.sql(
        s"SELECT reached_stage FROM funnel_prog WHERE user_id = $u").collect()
      rows.last.getInt(0)
    }
    try {
      // u1 advances across three batches; u2 stalls without a click
      in.addData(ev(1, "2024-01-01 10:00:00", user = 1, typ = "view"),
        ev(2, "2024-01-01 10:00:00", user = 2, typ = "view"))
      q.processAllAvailable()
      assert(stageOf(1) == 1 && stageOf(2) == 1)
      in.addData(ev(3, "2024-01-01 10:05:00", user = 1, typ = "click"),
        ev(4, "2024-01-01 10:05:00", user = 2, typ = "purchase")) // out of order for u2
      q.processAllAvailable()
      assert(stageOf(1) == 2 && stageOf(2) == 1)
      in.addData(ev(5, "2024-01-01 10:10:00", user = 1, typ = "purchase"))
      q.processAllAvailable()
      assert(stageOf(1) == 3)

      // a LATE event (ts behind u1's progress) cannot regress the stage
      in.addData(ev(6, "2024-01-01 09:00:00", user = 1, typ = "view"))
      q.processAllAvailable()
      assert(stageOf(1) == 3)

      // parity with the batch operator on the in-order event set
      val batch = graft.ops.Events.funnel(
        Seq((1L, ts("2024-01-01 10:00:00"), "view"),
          (1L, ts("2024-01-01 10:05:00"), "click"),
          (1L, ts("2024-01-01 10:10:00"), "purchase"),
          (2L, ts("2024-01-01 10:00:00"), "view"),
          (2L, ts("2024-01-01 10:05:00"), "purchase"))
          .toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(batch == Map(1L -> 3, 2L -> 1))
    } finally q.stop()
  }

  test("streaming: funnel counts accumulate across batches; a late event never regresses them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val stages = Seq("view", "click", "purchase")
    val q = EventStreams.funnelCountsStream(s, in.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_counts")
      .outputMode(OutputMode.Complete()).start()
    def counts(): Map[Int, Long] = s.sql(
        "SELECT stage, n_users FROM funnel_counts")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    try {
      // batch 1: u1 and u2 view; u1 also clicks
      in.addData(
        ev(1, "2024-01-01 10:00:00", user = 1, typ = "view"),
        ev(2, "2024-01-01 10:05:00", user = 1, typ = "click"),
        ev(3, "2024-01-01 10:00:00", user = 2, typ = "view"))
      q.processAllAvailable()
      assert(counts() == Map(1 -> 2L, 2 -> 1L), s"got ${counts()}")
      // batch 2: u1 completes; u2 clicks. Each crossing counted once.
      in.addData(
        ev(4, "2024-01-01 10:10:00", user = 1, typ = "purchase"),
        ev(5, "2024-01-01 10:06:00", user = 2, typ = "click"))
      q.processAllAvailable()
      assert(counts() == Map(1 -> 2L, 2 -> 2L, 3 -> 1L), s"got ${counts()}")
      // a LATE view behind u1's progress emits no transition — counts
      // hold (no double-count, no regression)
      in.addData(ev(6, "2024-01-01 09:00:00", user = 1, typ = "view"))
      q.processAllAvailable()
      assert(counts() == Map(1 -> 2L, 2 -> 2L, 3 -> 1L), s"got ${counts()}")
    } finally q.stop()
  }

  test("streaming: funnel idle TTL evicts a stale user; a returning user restarts at stage 0") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val stages = Seq("view", "click", "purchase")
    // TTL = 1h of EVENT time; the TTL contract requires a watermarked
    // source (timeouts fire as the watermark advances)
    val q = EventStreams.funnelStream(s,
        in.toDS().withWatermark("ts", "0 seconds"), stages,
        idleTtlSeconds = Some(3600L))
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode(OutputMode.Update()).start()
    def rowsOf(u: Long): Seq[Int] = s.sql(
        s"SELECT reached_stage FROM funnel_ttl WHERE user_id = $u")
      .collect().map(_.getInt(0)).toSeq
    try {
      // B1: both users view. Deadlines armed at 11:00.
      in.addData(ev(1, "2024-01-01 10:00:00", user = 1, typ = "view"),
        ev(2, "2024-01-01 10:00:00", user = 2, typ = "view"))
      q.processAllAvailable()
      assert(rowsOf(1) == Seq(1) && rowsOf(2) == Seq(1))
      // B2: only u2 advances, far ahead — the watermark jumps to 13:00,
      // past u1's 11:00 deadline. processAllAvailable() also drains the
      // no-data micro-batch Spark runs after the watermark advance
      // (spark.sql.streaming.noDataMicroBatches.enabled defaults true),
      // so u1's timeout fires within THIS call: one final snapshot row
      // (same stage, so a keyed sink sees no change), then the state is
      // gone. Assert the eviction OUTCOME, not a batch index — which
      // micro-batch carries the timeout is an engine scheduling detail.
      in.addData(ev(3, "2024-01-01 13:00:00", user = 2, typ = "click"))
      q.processAllAvailable()
      assert(rowsOf(1) == Seq(1, 1), s"expected timeout snapshot, got ${rowsOf(1)}")
      // B3: u2 again. u1's state is already gone — no second snapshot,
      // no resurrection of the evicted user on later watermark advances.
      in.addData(ev(4, "2024-01-01 13:30:00", user = 2, typ = "purchase"))
      q.processAllAvailable()
      assert(rowsOf(1) == Seq(1, 1), s"evicted user must not re-fire, got ${rowsOf(1)}")
      assert(rowsOf(2).last == 3)
      // B4: u1 RETURNS with a click. An un-evicted u1 would advance
      // 1 -> 2; the documented TTL semantics restart them at 0 instead
      // (click is not stage 1's type), pinning the regress tradeoff.
      in.addData(ev(5, "2024-01-01 14:00:00", user = 1, typ = "click"))
      q.processAllAvailable()
      assert(rowsOf(1) == Seq(1, 1, 0),
        s"evicted user should restart at stage 0, got ${rowsOf(1)}")
      // u2 kept eventing, so their state survived throughout.
      assert(rowsOf(2) == Seq(1, 2, 3))
    } finally q.stop()
  }

  test("streaming: funnel counts TTL holds counts on eviction; a returning user re-emits (upper bound)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val stages = Seq("view", "click", "purchase")
    // documented TTL requirement: the transition rows carry no event-time
    // column, so the downstream count agg cannot misbehave on the global
    // watermark — disable the (conservative) multi-stateful-op check
    val checkConf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prevCheck = s.conf.getOption(checkConf)
    s.conf.set(checkConf, "false")
    val q = EventStreams.funnelCountsStream(s,
        in.toDS().withWatermark("ts", "0 seconds"), stages,
        idleTtlSeconds = Some(3600L))
      .writeStream.format("memory").queryName("funnel_counts_ttl")
      .outputMode(OutputMode.Update()).start()
    // The memory sink ACCUMULATES update-mode rows across batches, so
    // read each stage's latest value — counts are monotone
    // non-decreasing (advance-only emission), so MAX is latest.
    def counts(): Map[Int, Long] = s.sql(
        "SELECT stage, MAX(n_users) AS n_users FROM funnel_counts_ttl GROUP BY stage")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    try {
      // B1: u1 views+clicks, u2 views. Crossings: u1 -> 1,2; u2 -> 1.
      in.addData(
        ev(1, "2024-01-01 10:00:00", user = 1, typ = "view"),
        ev(2, "2024-01-01 10:05:00", user = 1, typ = "click"),
        ev(3, "2024-01-01 10:00:00", user = 2, typ = "view"))
      q.processAllAvailable()
      assert(counts() == Map(1 -> 2L, 2 -> 1L), s"got ${counts()}")
      // B2: u2 jumps far ahead — the watermark passes u1's 11:05
      // deadline (incl. the no-data micro-batch), so u1 is EVICTED.
      // Eviction emits nothing: counts hold at their pre-eviction
      // values (only the memory of u1's progress is dropped).
      in.addData(ev(4, "2024-01-01 14:00:00", user = 2, typ = "click"))
      q.processAllAvailable()
      assert(counts() == Map(1 -> 2L, 2 -> 2L), s"eviction must hold counts, got ${counts()}")
      // B3: evicted u1 RETURNS and re-walks view->click. With their
      // state gone they restart at stage 0 and RE-EMIT crossings 1 and
      // 2 — the documented upper-bound behavior: stage 1 counts u1
      // twice (3 = u1×2 + u2), stage 2 likewise.
      in.addData(
        ev(5, "2024-01-01 14:10:00", user = 1, typ = "view"),
        ev(6, "2024-01-01 14:15:00", user = 1, typ = "click"))
      q.processAllAvailable()
      assert(counts() == Map(1 -> 3L, 2 -> 3L),
        s"returning evicted user re-emits crossings (upper bound), got ${counts()}")
    } finally {
      q.stop()
      prevCheck.fold(s.conf.unset(checkConf))(v => s.conf.set(checkConf, v))
    }
  }

  test("streaming: a chronically-late user is evicted exactly once, not resurrected per batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val stages = Seq("view", "click")
    val q = EventStreams.funnelStream(s,
        in.toDS().withWatermark("ts", "0 seconds"), stages,
        idleTtlSeconds = Some(3600L))
      .writeStream.format("memory").queryName("funnel_ttl_once")
      .outputMode(OutputMode.Update()).start()
    def rowsOf(u: Long): Seq[Int] = s.sql(
        s"SELECT reached_stage FROM funnel_ttl_once WHERE user_id = $u")
      .collect().map(_.getInt(0)).toSeq
    try {
      // B1: u9 and u2 both view at 09:00 — watermark lands at 09:00,
      // below u9's 10:00 deadline, so nothing fires yet. (A user whose
      // events sit BEHIND the watermark never reaches the state op at
      // all — stateful operators filter late rows — which is why
      // armIdleTimeout's watermark+1 clamp is defensive, not a path a
      // public caller can hit.)
      in.addData(
        ev(1, "2024-01-01 09:00:00", user = 9, typ = "view"),
        ev(2, "2024-01-01 09:00:00", user = 2, typ = "view"))
      q.processAllAvailable()
      assert(rowsOf(9) == Seq(1))
      // B2: u2 jumps the watermark to 20:00, far past u9's deadline —
      // u9 is evicted: exactly one snapshot row, state removed.
      in.addData(ev(3, "2024-01-01 20:00:00", user = 2, typ = "click"))
      q.processAllAvailable()
      assert(rowsOf(9) == Seq(1, 1), s"expected one eviction snapshot, got ${rowsOf(9)}")
      // B3+B4: further watermark advances with NO u9 events must not
      // resurrect them — no state, no timeout, no more rows.
      in.addData(ev(4, "2024-01-01 22:00:00", user = 2, typ = "view"))
      q.processAllAvailable()
      in.addData(ev(5, "2024-01-01 23:00:00", user = 2, typ = "view"))
      q.processAllAvailable()
      assert(rowsOf(9) == Seq(1, 1),
        s"evicted user resurrected by later watermark advances: ${rowsOf(9)}")
    } finally q.stop()
  }

  test("streaming: stream-stream interval join pairs events within the window only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[Event]
    val convs = MemoryStream[Event]

    val q = EventStreams.intervalJoin(clicks.toDF(), convs.toDF(),
        intervalSeconds = 600L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(ev(1, "2024-01-01 10:00:00", user = 1, typ = "click"))
      convs.addData(
        ev(100, "2024-01-01 10:05:00", user = 1, typ = "conv"),   // within 10 min
        ev(101, "2024-01-01 10:20:00", user = 1, typ = "conv"),   // outside
        ev(102, "2024-01-01 10:05:00", user = 2, typ = "conv"))   // other user
      q.processAllAvailable()
      // advance both watermarks so results flush
      clicks.addData(ev(9, "2024-01-01 12:00:00", user = 99))
      convs.addData(ev(999, "2024-01-01 12:00:00", user = 99))
      q.processAllAvailable()

      val rows = s.sql("SELECT * FROM attrib WHERE user_id = 1").collect()
      assert(rows.map(r => (r.getAs[Long]("l_event_id"), r.getAs[Long]("r_event_id"))).toSet
        == Set((1L, 100L)))
    } finally q.stop()
  }

  test("streaming: windowed histogram bins values per event-time window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.binnedHistogram(in.toDF(), binWidth = 8.0,
        window = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("histo")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:05:00", user = 1, v = 3.0),   // bin 0
        ev(2, "2024-01-01 10:10:00", user = 2, v = 7.9),   // bin 0
        ev(3, "2024-01-01 10:20:00", user = 3, v = 8.0),   // bin 1
        ev(4, "2024-01-01 11:10:00", user = 4, v = 20.0))  // next window, bin 2
      q.processAllAvailable()
      // advance the watermark past both windows so they close and emit
      in.addData(ev(9, "2024-01-01 14:00:00", user = 99, v = 1.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT window_start, bin, n FROM histo WHERE window_start < timestamp'2024-01-01 12:00:00' ORDER BY window_start, bin")
        .collect()
        .map(r => (r.getAs[Timestamp](0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq === Seq(
        (ts("2024-01-01 10:00:00"), 0L, 2L),
        (ts("2024-01-01 10:00:00"), 1L, 1L),
        (ts("2024-01-01 11:00:00"), 2L, 1L)))
    } finally q.stop()
  }

  test("streaming: LEFT OUTER interval join null-pads an unmatched click once the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[Event]
    val convs = MemoryStream[Event]

    val q = EventStreams.intervalJoin(clicks.toDF(), convs.toDF(),
        intervalSeconds = 600L, watermark = "10 minutes",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        ev(1, "2024-01-01 10:00:00", user = 1, typ = "click"), // converts
        ev(2, "2024-01-01 10:00:00", user = 2, typ = "click")) // never does
      convs.addData(ev(100, "2024-01-01 10:05:00", user = 1, typ = "conv"))
      q.processAllAvailable()
      // the unmatched click can only emit once NO conversion can still
      // arrive for it: advance both watermarks past click_ts + interval
      clicks.addData(ev(9, "2024-01-01 12:00:00", user = 99))
      convs.addData(ev(999, "2024-01-01 12:00:00", user = 99))
      q.processAllAvailable()

      val rows = s.sql(
        "SELECT * FROM attrib_outer WHERE user_id IN (1, 2)").collect()
      val matched = rows.filter(!_.isNullAt(2))
        .map(r => (r.getAs[Long]("l_event_id"), r.getAs[Long]("r_event_id")))
      val unmatched = rows.filter(_.isNullAt(2))
        .map(_.getAs[Long]("l_event_id"))
      assert(matched.toSet == Set((1L, 100L)))
      assert(unmatched.toSet == Set(2L),
        "the never-converted click must emit exactly once, null-padded")
    } finally q.stop()
  }

  test("streaming: a new event within the gap extends the open session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(s, in.toDS(), gapSeconds = 1800L,
        watermark = "1 minutes")
      .writeStream.format("memory").queryName("sessions2")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", user = 7))
      q.processAllAvailable()
      in.addData(ev(2, "2024-01-01 10:25:00", user = 7)) // within gap → extends
      q.processAllAvailable()
      in.addData(ev(3, "2024-01-01 23:00:00", user = 99)) // fires timeout
      q.processAllAvailable()
      in.addData(ev(4, "2024-01-02 23:00:00", user = 99))
      q.processAllAvailable()

      val rows = s.sql("SELECT * FROM sessions2 WHERE user_id = 7").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:25:00"))
      assert(rows(0).getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }

  test("streaming: a gap split is not final until the watermark passes — a legal late event re-bridges it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]
    // gap 30 min, watermark 30 min
    val q = EventStreams.sessionize(s, in.toDS(), gapSeconds = 1800L,
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("sessions3")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: events at 10:00 and 10:45 — an in-batch gap split, but
      // the watermark is only 10:15, so the 10:00 session is NOT final:
      // an event at 10:20 is still legal and would bridge the two
      in.addData(ev(1, "2024-01-01 10:00:00", user = 5),
        ev(2, "2024-01-01 10:45:00", user = 5))
      q.processAllAvailable()
      assert(s.sql("SELECT count(*) FROM sessions3 WHERE user_id = 5")
        .collect().head.getLong(0) == 0L,
        "nothing may emit while a bridging event is still legal")

      // batch 2: the legal late event at 10:20 merges EVERYTHING into
      // one event-time-true session [10:00, 10:45]
      in.addData(ev(3, "2024-01-01 10:20:00", user = 5))
      q.processAllAvailable()

      // advance the watermark far past end+gap: the single session closes
      in.addData(ev(8, "2024-01-01 20:00:00", user = 99))
      q.processAllAvailable()
      in.addData(ev(9, "2024-01-02 20:00:00", user = 99))
      q.processAllAvailable()

      val rows = s.sql("SELECT * FROM sessions3 WHERE user_id = 5").collect()
      assert(rows.length == 1, s"expected ONE bridged session, got ${rows.length}")
      assert(rows(0).getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:45:00"))
      assert(rows(0).getAs[Long]("n_events") == 3L)
    } finally q.stop()
  }
}
