package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.{Event, EventStreams, FunnelCheckpointMigration, FunnelProgress}

/** The pre-r18 state layout: stage + last ADVANCING stamp in epoch
  * MILLIS, no max-seen field. Top-level: encoders cannot resolve
  * class-nested case classes. */
case class LegacyFunnelState(stage: Int, last: Long)

/** End-to-end upgrade path for a running funnel stream: build a REAL
  * checkpoint with the pre-r18 2-field millisecond state (by running a
  * faithful replica of the legacy fold through mapGroupsWithState),
  * migrate it with [[FunnelCheckpointMigration]], then restart the
  * CURRENT [[EventStreams.funnelStream]] on the migrated directory and
  * prove the keyed state carried over — mid-funnel users continue from
  * their recorded stage, and the ms→µs stamp scaling preserves the
  * strict `ts > last` ordering contract.
  */
class FunnelMigrationSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long, typ: String) =
    Event(id, ts(t), user, typ, 1.0)

  /** Faithful replica of the r17 funnel fold (strict ms ordering). */
  private def legacyFunnel(
      in: MemoryStream[Event], stages: Seq[String]) = {
    val s = spark
    import s.implicits._
    val n = stages.size
    in.toDS().groupByKey(_.user_id)
      .mapGroupsWithState[LegacyFunnelState, FunnelProgress](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[LegacyFunnelState]) =>
          var st = state.getOption.getOrElse(LegacyFunnelState(0, Long.MinValue))
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (st.stage < n && e.event_type == stages(st.stage) &&
                e.ts.getTime > st.last)
              st = LegacyFunnelState(st.stage + 1, e.ts.getTime)
          }
          state.update(st)
          FunnelProgress(userId, st.stage, st.stage == n)
      }
  }

  test("migration refuses a non-funnel checkpoint BEFORE writing anything — the target stays clean for retry") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-funnel-mig-wrong").toString
    val in = MemoryStream[Event]
    // a sessionization checkpoint: real, committed, NOT the funnel layout
    val q = EventStreams.sessionize(s, in.toDS(), gapSeconds = 1800L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("mig_wrong_kind")
      .option("checkpointLocation", s"$root/old")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", user = 1, typ = "click"))
      q.processAllAvailable()
    } finally q.stop()

    val e = intercept[IllegalArgumentException] {
      FunnelCheckpointMigration.migrate(s, s"$root/old", s"$root/new")
    }
    assert(e.getMessage.contains("refusing to migrate"), e.getMessage)
    // nothing written: a half-written target would poison the retry
    // against the no-overwrite guard and masquerade as a checkpoint
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/new")),
      "failed validation must leave the migration target absent")
  }

  test("funnel stream survives the 2-field->3-field checkpoint upgrade via migration") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-funnel-mig").toString
    val stages = Seq("signup", "activate", "purchase")
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Event]

    // ── phase 1: run the LEGACY stream to a real checkpoint ──────────
    val legacy = legacyFunnel(in, stages)
      .writeStream.format("memory").queryName("mig_legacy")
      .option("checkpointLocation", s"$root/old")
      .outputMode(OutputMode.Update()).start()
    try {
      // user 1 reaches stage 1; user 2 reaches stage 2
      in.addData(
        ev(1, "2024-01-01 10:00:00", user = 1, typ = "signup"),
        ev(2, "2024-01-01 10:00:00", user = 2, typ = "signup"),
        ev(3, "2024-01-01 10:01:00", user = 2, typ = "activate"))
      legacy.processAllAvailable()
      // second batch so the migration reads a multi-batch delta chain
      in.addData(ev(4, "2024-01-01 10:02:00", user = 1, typ = "activate"))
      legacy.processAllAvailable()
    } finally legacy.stop()

    // ── phase 2: migrate ─────────────────────────────────────────────
    val report = FunnelCheckpointMigration.migrate(s, s"$root/old", s"$root/new")
    assert(report.oldBatchId == 1L, s"expected 2 committed batches, got $report")
    assert(report.totalRows == 2L,
      s"both in-flight users must migrate, got $report")
    // refuses to clobber an existing migration target
    val clobber = intercept[IllegalArgumentException] {
      FunnelCheckpointMigration.migrate(s, s"$root/old", s"$root/new")
    }
    assert(clobber.getMessage.contains("refusing to overwrite"))

    // ── phase 3: restart the CURRENT funnel on the migrated state ────
    // (foreachBatch, not the memory sink — the memory sink refuses to
    // recover from an existing checkpoint)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[FunnelProgress]()
    val q = EventStreams.funnelStream(s, in.toDS(), stages)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelProgress], _: Long) =>
        batch.collect().foreach(emitted.add)
      }
      .option("checkpointLocation", s"$root/new")
      .outputMode(OutputMode.Update()).start()
    try {
      def reached(user: Long): Seq[Int] = {
        import scala.jdk.CollectionConverters._
        emitted.asScala.toSeq.filter(_.user_id == user).map(_.reached_stage)
      }

      // user 1 (migrated at stage 2): 'purchase' completes the funnel —
      // only possible if the keyed state survived the upgrade (a fresh
      // state would hold them at stage 0, where 'purchase' cannot match)
      // user 2 (migrated at stage 2, last = 10:01:00): a 'purchase'
      // BEFORE their recorded last-advance stamp must NOT advance — this
      // pins the ms→µs scaling (a stamp mistakenly kept in ms would be
      // ~1000× too small and let this stale event through)
      in.addData(
        ev(5, "2024-01-01 10:03:00", user = 1, typ = "purchase"),
        ev(6, "2024-01-01 10:00:30", user = 2, typ = "purchase"))
      q.processAllAvailable()
      assert(reached(1) == Seq(3), s"user 1 should complete, got ${reached(1)}")
      assert(reached(2) == Seq(2), s"user 2 must not advance on a stale event, got ${reached(2)}")

      // and a purchase AFTER user 2's stamp does advance
      in.addData(ev(7, "2024-01-01 10:05:00", user = 2, typ = "purchase"))
      q.processAllAvailable()
      assert(reached(2).lastOption.contains(3), s"got ${reached(2)}")

      // ground truth: the batch funnel over ALL events agrees with the
      // migrated stream's final stages
      val all = Seq(
        ev(1, "2024-01-01 10:00:00", 1, "signup"),
        ev(2, "2024-01-01 10:00:00", 2, "signup"),
        ev(3, "2024-01-01 10:01:00", 2, "activate"),
        ev(4, "2024-01-01 10:02:00", 1, "activate"),
        ev(5, "2024-01-01 10:03:00", 1, "purchase"),
        ev(6, "2024-01-01 10:00:30", 2, "purchase"),
        ev(7, "2024-01-01 10:05:00", 2, "purchase"))
      import s.implicits._
      val batch = graft.ops.Events.funnel(
          all.toDS().toDF(), "user_id", "ts", "event_type", stages)
        .collect()
        .map(r => r.getLong(0) -> r.getAs[Number]("reached_stage").intValue)
        .toMap
      assert(batch(1L) == 3 && batch(2L) == 3)
    } finally q.stop()
  }
}
