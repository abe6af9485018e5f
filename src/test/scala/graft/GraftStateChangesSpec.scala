package graft

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._

import graft.pipeline.BucketedStateTable

/** `graft-state-changes`: the streaming twin of
  * [[BucketedStateTable.changesBetween]] — offsets are commit ids, each
  * micro-batch is the net CDC diff of its commit range, checkpoints
  * make restarts exactly-once, and the creation-time base commit is
  * persisted so a batch-0 replay diffs from the original base. */
class GraftStateChangesSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-changes").toString

  private type Change = (String, String, Long, Long) // type, k, v, commit

  test("readStream tails commits as net CDC batches; checkpoint restart re-emits nothing") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 60_000L)

    // c1: the base world; c2/c3: history before the stream starts
    t.merge(spark.range(100)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("v")),
      keys = Seq("k"))
    val c1 = t.commits().last
    t.merge(Seq(("k7", -7L), ("knew", 1L)).toDF("k", "v"), keys = Seq("k"))
    t.applyDelta(upserts = Seq(("k7", 70L)).toDF("k", "v"),
      deleteKeys = Seq("knew", "k11").map(Tuple1(_)).toDF("k"),
      keys = Seq("k"))
    val c3 = t.commits().last

    val batches = TrieMap.empty[Long, Seq[Change]]
    def startQ() = spark.readStream.format("graft-state-changes")
      .option("startingCommit", c1)
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.as[Change].collect().toSeq)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    val q = startQ()
    try {
      q.processAllAvailable()
      // batch 0 replays history (c1, c3] as ONE net diff: knew
      // (inserted then deleted in between) is absent
      assert(batches(0L).toSet == Set(
        ("update_preimage", "k7", 7L, c3), ("update_postimage", "k7", 70L, c3),
        ("delete", "k11", 11L, c3)))

      // a live commit lands → next batch carries exactly its diff
      t.merge(Seq(("k2", -2L)).toDF("k", "v"), keys = Seq("k"))
      val c4 = t.commits().last
      q.processAllAvailable()
      assert(batches(1L).toSet == Set(
        ("update_preimage", "k2", 2L, c4), ("update_postimage", "k2", -2L, c4)))
    } finally q.stop()

    // restart from the same checkpoint: nothing re-emits, new commits flow
    batches.clear()
    t.applyDelta(upserts = Seq.empty[(String, Long)].toDF("k", "v"),
      deleteKeys = Seq(Tuple1("k3")).toDF("k"), keys = Seq("k"))
    val c5 = t.commits().last
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      val emitted = batches.values.flatten.toSet
      assert(emitted == Set(("delete", "k3", 3L, c5)),
        s"restart must emit only the new commit's diff, got $emitted")
    } finally q2.stop()
  }

  test("maxCommitsPerTrigger drains a long backlog in bounded batches with exactly-once snapshot parity") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, keepCommits = 30,
      retentionFloorMillis = 60_000L)
    t.merge(Seq(("base", 0L)).toDF("k", "v"), keys = Seq("k"))
    val c1 = t.commits().last
    // a 6-commit backlog accumulated while the consumer was down —
    // including an update and a delete so per-segment NET semantics are
    // visible, not just inserts
    (1 to 4).foreach(i =>
      t.merge(Seq((s"k$i", i.toLong)).toDF("k", "v"), keys = Seq("k")))
    t.merge(Seq(("k1", 11L)).toDF("k", "v"), keys = Seq("k"))
    t.applyDelta(upserts = Seq.empty[(String, Long)].toDF("k", "v"),
      deleteKeys = Seq(Tuple1("k2")).toDF("k"), keys = Seq("k"))
    val backlog = t.commits().filter(_ > c1)
    assert(backlog.size == 6)

    val batches = TrieMap.empty[Long, Seq[Change]]
    def startQ() = spark.readStream.format("graft-state-changes")
      .option("startingCommit", c1)
      .option("maxCommitsPerTrigger", "2")
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.as[Change].collect().toSeq)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    val q = startQ()
    try q.processAllAvailable() finally q.stop()
    assert(batches.keySet == Set(0L, 1L, 2L),
      s"a 6-commit backlog under cap 2 must drain in 3 batches, got ${batches.keySet}")

    // each batch is exactly the net diff of its 2-commit segment, and
    // ends exactly at the 2nd/4th/6th backlog commit
    val ends = Seq(backlog(1), backlog(3), backlog(5))
    val starts = c1 +: ends.dropRight(1)
    starts.zip(ends).zipWithIndex.foreach { case ((st, en), i) =>
      val expect = t.changesBetween(st, en)
        .as[(String, String, Long)].collect().toSet
        .map((x: (String, String, Long)) => (x._1, x._2, x._3, en))
      assert(batches(i.toLong).toSet == expect, s"batch $i range ($st,$en]")
    }

    // exactly-once parity: applying the capped batches IN ORDER over
    // the base snapshot reproduces the table snapshot a single
    // uncapped batch would have
    val replica = scala.collection.mutable.Map.empty[String, Long]
    replica ++= t.readAt(c1).get.as[(String, Long)].collect()
    def apply(ch: Seq[Change]): Unit = ch.foreach {
      case ("insert", k, v, _) => replica(k) = v
      case ("update_postimage", k, v, _) => replica(k) = v
      case ("delete", k, _, _) => replica.remove(k); ()
      case _ => () // preimages carry no apply action
    }
    batches.keys.toSeq.sorted.foreach(id => apply(batches(id)))
    assert(replica.toMap ==
      t.read().get.as[(String, Long)].collect().toMap)

    // a checkpoint restart with fresh backlog: the cap still binds (the
    // admitted floor persisted under the stream metadata keeps the
    // recovery batch bounded too)
    batches.clear()
    (7 to 9).foreach(i =>
      t.merge(Seq((s"k$i", i.toLong)).toDF("k", "v"), keys = Seq("k")))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    assert(batches.keySet == Set(3L, 4L),
      s"3 new commits under cap 2 must drain in 2 batches, got ${batches.keySet}")
    batches.keys.toSeq.sorted.foreach(id => apply(batches(id)))
    assert(replica.toMap ==
      t.read().get.as[(String, Long)].collect().toMap)
  }

  test("maxChangeRowsPerTrigger prices commits from the manifest counts; stats-less tables degrade to one per trigger") {
    val s = spark
    import s.implicits._

    def backlogTable(root: String, stats: Boolean): BucketedStateTable = {
      val t = new BucketedStateTable(spark, s"$root/state",
        keyCols = Seq("k"), numBuckets = 4, keepCommits = 30,
        retentionFloorMillis = 60_000L,
        statsCols = if (stats) Seq("v") else Nil)
      t.merge(Seq(("base", 0L)).toDF("k", "v"), keys = Seq("k"))
      (1 to 6).foreach(i =>
        t.merge(Seq((s"k$i", i.toLong)).toDF("k", "v"), keys = Seq("k")))
      t
    }
    def drain(root: String, from: Long, capRows: Long): Map[Long, Set[Change]] = {
      val batches = TrieMap.empty[Long, Seq[Change]]
      val q = spark.readStream.format("graft-state-changes")
        .option("startingCommit", from)
        .option("maxChangeRowsPerTrigger", capRows.toString)
        .load(s"$root/state")
        .writeStream
        .option("checkpointLocation", s"$root/ck-$capRows")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.put(id, df.as[Change].collect().toSeq)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        .start()
      try q.processAllAvailable() finally q.stop()
      batches.toMap.view.mapValues(_.toSet).toMap
    }
    def replay(t: BucketedStateTable, from: Long,
        batches: Map[Long, Set[Change]]): Unit = {
      val replica = scala.collection.mutable.Map.empty[String, Long]
      replica ++= t.readAt(from).get.as[(String, Long)].collect()
      batches.keys.toSeq.sorted.foreach(id => batches(id).foreach {
        case ("insert", k, v, _) => replica(k) = v
        case ("update_postimage", k, v, _) => replica(k) = v
        case ("delete", k, _, _) => replica.remove(k); ()
        case _ => ()
      })
      assert(replica.toMap == t.read().get.as[(String, Long)].collect().toMap)
    }

    // stats-enabled: a 1-row cap forces one commit per batch (every
    // commit costs more), a huge cap takes the whole backlog in one
    val r1 = tmp()
    val t1 = backlogTable(r1, stats = true)
    val from1 = t1.commits().head
    val capped = drain(r1, from1, capRows = 1L)
    assert(capped.size == 6,
      s"cap=1 row must admit one commit per batch, got ${capped.size}")
    replay(t1, from1, capped)
    val r2 = tmp()
    val t2 = backlogTable(r2, stats = true)
    val from2 = t2.commits().head
    val one = drain(r2, from2, capRows = 1000000L)
    assert(one.size == 1,
      s"a cap above the whole backlog must drain in one batch, got ${one.size}")
    replay(t2, from2, one)

    // stats-less: every commit's cost is UNKNOWN — bounded to one
    // commit per trigger instead of one unbounded batch
    val r3 = tmp()
    val t3 = backlogTable(r3, stats = false)
    val from3 = t3.commits().head
    val blunt = drain(r3, from3, capRows = 1000000L)
    assert(blunt.size == 6,
      s"unknown costs must degrade to one commit per trigger, got ${blunt.size}")
    replay(t3, from3, blunt)
  }

  test("row-capped drain of a high-volume backlog across per-batch restarts: bounded batches, oversized commit alone, exactly-once") {
    val s = spark
    import s.implicits._

    def rowsDf(from: Int, n: Int, v: Long) =
      (from until from + n).map(i => (s"k$i", v)).toDF("k", "v")
    def build(root: String, stats: Boolean): (BucketedStateTable, Long) = {
      val t = new BucketedStateTable(spark, s"$root/state",
        keyCols = Seq("k"), numBuckets = 8, keepCommits = 40,
        retentionFloorMillis = 60_000L,
        statsCols = if (stats) Seq("v") else Nil)
      t.merge(rowsDf(0, 40, 0L), keys = Seq("k")) // seed
      val base = t.commits().last
      // four small commits, then ONE 100×-volume commit: the admission
      // estimator must coalesce the smalls under the cap and admit the
      // oversized one ALONE (first-commit progress guarantee)
      (1 to 4).foreach(i =>
        t.merge(rowsDf(1000 * i, 10, i.toLong), keys = Seq("k")))
      t.merge(rowsDf(100000, 5000, 9L), keys = Seq("k"))
      (t, base)
    }

    // drain ONE trigger per query start (Trigger.Once): every batch
    // boundary is a full stop + checkpoint restart — the mid-drain
    // restart is not an extra scenario, it is the loop itself
    def drainRestarting(root: String, base: Long, capRows: Long)
        : Seq[(Long, Seq[Change])] = {
      val collected = TrieMap.empty[Long, Seq[Change]]
      var rounds = 0
      var before = -1
      while (collected.size != before && rounds < 20) {
        before = collected.size
        rounds += 1
        val q = spark.readStream.format("graft-state-changes")
          .option("startingCommit", base)
          .option("maxChangeRowsPerTrigger", capRows.toString)
          .load(s"$root/state")
          .writeStream
          .option("checkpointLocation", s"$root/ck")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            val got = df.selectExpr("change_type", "k", "v", "_commit_id")
              .as[Change].collect().toSeq
            if (got.nonEmpty) collected.put(id, got)
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .start()
        q.awaitTermination(60_000)
      }
      collected.toSeq.sortBy(_._1)
    }

    val capRows = 400L
    val root = tmp()
    val (t, base) = build(root, stats = true)
    val backlog = t.commits().filter(_ > base)
    val batches = drainRestarting(root, base, capRows)

    // every row of a batch is tagged with the batch's range END
    // commit (net-diff semantics); the admitted COMMIT GROUPING is
    // therefore the partition of the backlog by those ends
    val ends = batches.map(_._2.map(_._4).max)
    assert(ends == ends.sorted && ends.distinct == ends,
      s"range ends must strictly advance across restarts: $ends")
    assert(ends.last == backlog.max,
      s"the drain must reach the newest commit: $ends vs $backlog")
    val starts = base +: ends.dropRight(1)
    val perBatchCommits = starts.zip(ends).map { case (st, en) =>
      backlog.filter(c => c > st && c <= en) }
    assert(perBatchCommits.flatten == backlog.sorted,
      s"batches must cover the backlog exactly once: $perBatchCommits vs $backlog")
    assert(batches.size >= 2 && batches.size < backlog.size,
      s"the cap must both bind (≥2 batches) and coalesce small commits " +
        s"(<${backlog.size} batches), got ${batches.size}: " +
        perBatchCommits.map(_.size).mkString(","))
    // the oversized commit drains ALONE
    val bigCommit = backlog.max // the 5000-row merge is the newest
    val bigIdx = perBatchCommits.indexWhere(_.contains(bigCommit))
    assert(perBatchCommits(bigIdx) == Seq(bigCommit),
      s"an over-cap commit must drain alone, batch held ${perBatchCommits(bigIdx)}")
    // every multi-commit batch stays under the row cap (the estimator
    // counts rewritten-bucket rows, an overestimate of emitted rows)
    perBatchCommits.zip(batches).filter(_._1.size > 1).foreach {
      case (_, (id, rows)) =>
        assert(rows.size <= capRows,
          s"batch $id: ${rows.size} rows admitted over the $capRows cap")
    }
    // replica parity: applying the batches in order reproduces the table
    val replica = scala.collection.mutable.Map.empty[String, Long]
    replica ++= t.readAt(base).get.as[(String, Long)].collect()
    batches.foreach(_._2.foreach {
      case ("insert", k, v, _) => replica(k) = v
      case ("update_postimage", k, v, _) => replica(k) = v
      case ("delete", k, _, _) => replica.remove(k); ()
      case _ => ()
    })
    assert(replica.toMap == t.read().get.as[(String, Long)].collect().toMap)

    // the stats-less twin under the SAME restart loop: every commit's
    // cost is unknown, so the drain degrades to one commit per batch —
    // never an unbounded batch
    val rootB = tmp()
    val (tB, baseB) = build(rootB, stats = false)
    val backlogB = tB.commits().filter(_ > baseB)
    val bluntBatches = drainRestarting(rootB, baseB, capRows)
    assert(bluntBatches.size == backlogB.size,
      s"unknown costs must degrade to one commit per trigger across " +
        s"restarts: ${bluntBatches.size} batches for ${backlogB.size} commits")
    assert(bluntBatches.map(_._2.map(_._4).max) == backlogB.sorted,
      "each degraded batch must end at the next single commit")
  }

  test("a table using a reserved feed column name refuses at creation, not with an ambiguous-reference crash-loop") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 60_000L)
    t.merge(Seq(("a", "ins")).toDF("k", "change_type"), keys = Seq("k"))
    val ex = intercept[Exception] {
      spark.readStream.format("graft-state-changes").load(s"$root/state")
    }
    assert(ex.getMessage.contains("reserves column"), ex.getMessage)
  }

  test("enabling maxCommitsPerTrigger on an existing checkpoint stays exactly-once; a lost floor refuses loudly") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, keepCommits = 30,
      retentionFloorMillis = 60_000L)
    t.merge(Seq(("base", 0L)).toDF("k", "v"), keys = Seq("k"))
    val c1 = t.commits().last
    t.merge(Seq(("k1", 1L)).toDF("k", "v"), keys = Seq("k"))

    val batches = TrieMap.empty[Long, Seq[Change]]
    def startQ(cap: Option[Int]) = {
      val r0 = spark.readStream.format("graft-state-changes")
        .option("startingCommit", c1)
      cap.fold(r0)(m => r0.option("maxCommitsPerTrigger", m.toString))
        .load(s"$root/state")
        .writeStream
        .option("checkpointLocation", s"$root/ck")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.put(id, df.as[Change].collect().toSeq)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        .start()
    }

    // phase 1: an UNCAPPED run processes history (and, with this
    // version, persists the admitted floor as a side effect)
    val q1 = startQ(None)
    try q1.processAllAvailable() finally q1.stop()
    assert(batches.values.flatten.exists(_._2 == "k1"))

    // phase 2: a 5-commit backlog, then a restart WITH the cap — the
    // floor keeps the admission above the engine's position, so the
    // backlog drains capped and NOTHING already processed re-emits
    batches.clear()
    (2 to 6).foreach(i =>
      t.merge(Seq((s"k$i", i.toLong)).toDF("k", "v"), keys = Seq("k")))
    val q2 = startQ(Some(2))
    try q2.processAllAvailable() finally q2.stop()
    assert(batches.size == 3,
      s"5 commits under cap 2 must drain in 3 batches, got ${batches.keySet}")
    val emitted = batches.values.flatten.map(_._2).toSet
    assert(emitted == (2 to 6).map(i => s"k$i").toSet,
      s"no re-emission of processed commits allowed, got $emitted")

    // phase 3: the floor file vanishes (pre-admission-control
    // checkpoint / the rename fallback's crash window) — the engine's
    // restart protocol SELF-HEALS it: the last committed batch's
    // getBatch replays first and re-ratchets the floor to the
    // committed position, so the capped restart emits NOTHING already
    // processed and keeps the cap (the readFloor refusal stays as
    // defense-in-depth for an engine that skips the replay)
    val floor = new java.io.File(s"$root/ck/sources/0/graft-changes-admitted")
    assert(floor.exists(),
      "every getBatch must persist the floor, capped or not")
    Files.delete(floor.toPath)
    batches.clear()
    (7 to 9).foreach(i =>
      t.merge(Seq((s"k$i", i.toLong)).toDF("k", "v"), keys = Seq("k")))
    val q3 = startQ(Some(2))
    try q3.processAllAvailable() finally q3.stop()
    assert(batches.size == 2,
      s"3 commits under cap 2 must drain in 2 batches, got ${batches.keySet}")
    assert(batches.values.flatten.map(_._2).toSet ==
      (7 to 9).map(i => s"k$i").toSet,
      "a healed floor must not re-emit processed commits")
    assert(floor.exists(), "the replayed getBatch must re-persist the floor")
  }

  test("maxSnapshotBucketsPerTrigger seeds a replica in bounded bucket chunks; a mid-bootstrap crash resumes exactly") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 8, keepCommits = 20,
      retentionFloorMillis = 60_000L)
    t.merge((0 until 100).map(i => (s"k$i", i.toLong)).toDF("k", "v"),
      keys = Seq("k"))
    val c1 = t.commits().last
    t.merge(Seq(("k5", -5L)).toDF("k", "v"), keys = Seq("k"))
    val c2 = t.commits().last

    val bucketOfKey: Map[String, Int] =
      (0 until 100).map(i => s"k$i").toDF("k")
        .select(col("k"),
          pmod(xxhash64(col("k")), lit(8L)).cast("int").as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val populated = bucketOfKey.values.toSet.size
    val chunks = math.ceil(populated / 3.0).toInt

    val batches = TrieMap.empty[Long, Seq[Change]]
    @volatile var failOnce = true
    def readerWith(snapCap: Option[Int]) = {
      val r0 = spark.readStream.format("graft-state-changes")
        .option("startingCommit", c1)
        .option("initialSnapshot", "true")
      snapCap.fold(r0)(m =>
        r0.option("maxSnapshotBucketsPerTrigger", m.toString))
    }
    def startQWith(snapCap: Option[Int]) = readerWith(snapCap)
      .option("maxCommitsPerTrigger", "1")
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.as[Change].collect().toSeq
        // crash AFTER the engine logged batch 1's offsets but BEFORE
        // the sink committed it — the classic mid-bootstrap failure;
        // the restart must replay exactly this chunk and walk on
        if (id == 1L && failOnce) { failOnce = false; sys.error("injected crash") }
        batches.put(id, rows)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    def messagesOf(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")

    val q = startQWith(Some(3))
    intercept[Exception] { q.processAllAvailable() }
    q.stop()

    // MID-bootstrap the recorded cap pins the chunk space: restarting
    // with a different value (or without the option — that would
    // abandon the unseeded chunks) refuses
    val qBad = startQWith(Some(5))
    val badErr = intercept[Exception] { qBad.processAllAvailable() }
    qBad.stop()
    assert(messagesOf(badErr).contains("recorded cap"), messagesOf(badErr))
    val qDrop = startQWith(None)
    val dropErr = intercept[Exception] { qDrop.processAllAvailable() }
    qDrop.stop()
    assert(messagesOf(dropErr).contains("has not finished"),
      messagesOf(dropErr))

    val q2 = startQWith(Some(3))
    try q2.processAllAvailable() finally q2.stop()

    // ⌈populated/3⌉ snapshot chunks then exactly one capped diff batch
    assert(batches.keySet == (0 to chunks.toInt).map(_.toLong).toSet,
      s"expected $chunks snapshot batches + 1 diff batch, got ${batches.keySet}")
    val snapRows = (0 until chunks).flatMap(i => batches(i.toLong))
    assert(snapRows.forall(r => r._1 == "insert" && r._4 == c1),
      "bootstrap batches must be pure base-snapshot inserts")
    // each chunk touches at most 3 DISTINCT buckets — the bounded-I/O
    // claim, asserted through the same hash the table buckets by
    (0 until chunks).foreach { i =>
      val bs = batches(i.toLong).map(r => bucketOfKey(r._2)).distinct
      assert(bs.size <= 3, s"chunk $i read ${bs.size} buckets: $bs")
    }
    // the union is the exact base snapshot: every key once, base values
    assert(snapRows.map(r => (r._2, r._3)).sorted ==
      (0 until 100).map(i => (s"k$i", i.toLong)).sorted,
      "chunks must cover the base snapshot exactly once (no loss, no dup)")
    // then the pending commit's diff flows as an ordinary capped batch
    assert(batches(chunks.toLong).toSet == Set(
      ("update_preimage", "k5", 5L, c2), ("update_postimage", "k5", -5L, c2)))

    // replica parity end-to-end
    val replica = scala.collection.mutable.Map.empty[String, Long]
    batches.keys.toSeq.sorted.foreach(id => batches(id).foreach {
      case ("insert", k, v, _) => replica(k) = v
      case ("update_postimage", k, v, _) => replica(k) = v
      case ("delete", k, _, _) => replica.remove(k); ()
      case _ => ()
    })
    assert(replica.toMap == t.read().get.as[(String, Long)].collect().toMap)

    // POST-bootstrap the walk is complete, so the option may be
    // dropped — the stream keeps tailing the diff phase normally
    t.merge(Seq(("k5", 55L)).toDF("k", "v"), keys = Seq("k"))
    val q5 = startQWith(None)
    try q5.processAllAvailable() finally q5.stop()
    assert(batches.values.flatten.exists(r =>
      r._1 == "update_postimage" && r._2 == "k5" && r._3 == 55L))
  }

  test("batch-0 replay after restart diffs from the PERSISTED base, not today's latest") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 60_000L)
    t.merge(Seq(("a", 1L)).toDF("k", "v"), keys = Seq("k"))
    t.merge(Seq(("b", 2L)).toDF("k", "v"), keys = Seq("k"))
    val c2 = t.commits().last

    val batches = TrieMap.empty[Long, Seq[Change]]
    def startQ(ck: String) = spark.readStream.format("graft-state-changes")
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.as[Change].collect().toSeq)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    // the empty first processAllAvailable pins source creation: batch 0
    // is (base=c2, c2] = empty, and the DEFAULT base c2 is persisted
    val q = startQ(s"$root/ck")
    try {
      q.processAllAvailable()
      t.merge(Seq(("c", 3L)).toDF("k", "v"), keys = Seq("k"))
      q.processAllAvailable()
    } finally q.stop()
    val c3 = t.commits().last
    assert(batches(0L).isEmpty)
    assert(batches(1L).toSet == Set(("insert", "c", 3L, c3)))

    // engineer the V1 recovery trap: a checkpoint whose log holds ONLY
    // offsets/0 — restart replays batch 0 as getBatch(start=None, c2).
    // A source that re-resolved "latest" as its base (now c4) would
    // compute changesBetween(c4, c2) and blow the from<=to contract;
    // the PERSISTED base c2 makes the replay the original empty batch,
    // and the uncommitted range is rediscovered as (c2, latest]
    // afterwards. The pruned copy restarts under a FRESH checkpoint
    // path (Spark pins opened checkpoint logs and would call in-place
    // surgery a concurrent writer).
    def cp(from: java.io.File, to: java.io.File): Unit = {
      if (from.isDirectory) {
        to.mkdirs()
        from.listFiles().foreach(f => cp(f, new java.io.File(to, f.getName)))
      } else if (!from.getName.endsWith(".crc")) // stale checksum sidecars
        java.nio.file.Files.copy(from.toPath, to.toPath)
    }
    cp(new java.io.File(s"$root/ck"), new java.io.File(s"$root/ck2"))
    assert(new java.io.File(s"$root/ck2/commits/0").delete())
    assert(new java.io.File(s"$root/ck2/commits/1").delete())
    assert(new java.io.File(s"$root/ck2/offsets/1").delete())
    t.merge(Seq(("d", 4L)).toDF("k", "v"), keys = Seq("k"))
    val c4 = t.commits().last
    batches.clear()
    val q2 = startQ(s"$root/ck2")
    try q2.processAllAvailable() finally q2.stop()
    assert(batches(0L).isEmpty,
      s"replayed batch 0 must be the original empty range, got ${batches.get(0L)}")
    assert(batches(1L).toSet == Set(
      ("insert", "c", 3L, c4), ("insert", "d", 4L, c4)),
      "the uncommitted range is rediscovered as one net batch")

    // a bogus startingCommit refuses loudly at first creation
    val provider = new graft.sources.GraftStateChangesProvider
    val err = intercept[IllegalArgumentException] {
      provider.createSource(spark.sqlContext, s"$root/meta2", None,
        "graft-state-changes",
        Map("path" -> s"$root/state", "startingCommit" -> "999"))
    }
    assert(err.getMessage.contains("not a retained commit"))
  }

  test("initialSnapshot seeds a replica: batch 0 = base snapshot as inserts + pending diff; restart re-emits nothing") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 60_000L)
    t.merge(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v"),
      keys = Seq("k"))
    val c1 = t.commits().last
    // history AFTER the base: an update and a delete the bootstrap
    // batch must carry as a net diff alongside the snapshot
    t.applyDelta(upserts = Seq(("b", 20L)).toDF("k", "v"),
      deleteKeys = Seq(Tuple1("c")).toDF("k"), keys = Seq("k"))

    val batches = TrieMap.empty[Long, Seq[Change]]
    def startQ() = spark.readStream.format("graft-state-changes")
      .option("startingCommit", c1)
      .option("initialSnapshot", "true")
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.as[Change].collect().toSeq)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    val q = startQ()
    try {
      q.processAllAvailable()
      val c2 = t.commits().last
      // snapshot-as-inserts AT c1 (pre-update values, stamped c1) plus
      // the (c1, c2] net diff — one batch seeds the replica completely
      assert(batches(0L).toSet == Set(
        ("insert", "a", 1L, c1), ("insert", "b", 2L, c1),
        ("insert", "c", 3L, c1),
        ("update_preimage", "b", 2L, c2), ("update_postimage", "b", 20L, c2),
        ("delete", "c", 3L, c2)),
        s"got ${batches(0L).toSet}")
    } finally q.stop()

    // restart from the same checkpoint: the snapshot does NOT re-emit
    // (batch 0 is committed); only new commits flow
    batches.clear()
    t.merge(Seq(("d", 4L)).toDF("k", "v"), keys = Seq("k"))
    val c3 = t.commits().last
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(batches.values.flatten.toSet == Set(("insert", "d", 4L, c3)),
        s"restart must emit only the new diff, got ${batches.values.flatten.toSet}")
    } finally q2.stop()
  }

  test("a widening commit mid-stream keeps the pinned shape; a checkpoint restart carries the new column") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 60_000L)
    t.merge(spark.range(50)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("v")),
      keys = Seq("k"))
    val c1 = t.commits().last

    val batches = TrieMap.empty[Long,
      (org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row])]
    def startQ() = spark.readStream.format("graft-state-changes")
      .option("startingCommit", c1)
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, (df.schema, df.collect().toSeq))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    val q = startQ()
    try {
      q.processAllAvailable()
      // widen + a widened merge land WHILE the stream runs: a V1
      // source's schema is pinned at start, so the diff flows under
      // the pinned shape — the new column is invisible (not misbound,
      // not a crash) until the consumer restarts to pick it up
      t.widenTo(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.StringType))))
      t.merge(Seq(("k5", 500L, "five")).toDF("k", "v", "w"), keys = Seq("k"))
      q.processAllAvailable()
      val pinned = batches.values.filter(_._2.nonEmpty).toSeq
      assert(pinned.nonEmpty, "the widened commit's diff must flow")
      assert(pinned.forall(_._1.fieldNames.toSeq ==
        Seq("change_type", "k", "v", "_commit_id")),
        s"mid-stream batches keep the pinned shape, got ${pinned.map(_._1)}")
      val visible = pinned.flatMap(_._2)
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(visible == Set(
        ("update_preimage", "k5", 5L), ("update_postimage", "k5", 500L)))
    } finally q.stop()

    // restart from the SAME checkpoint: offsets are kept (nothing
    // re-emits) and the source re-derives its schema from the manifest,
    // so the widened column now flows
    batches.clear()
    t.merge(Seq(("k9", 900L, "nine")).toDF("k", "v", "w"), keys = Seq("k"))
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      val emitted = batches.values.filter(_._2.nonEmpty).toSeq
      assert(emitted.forall(_._1.fieldNames.toSeq ==
        Seq("change_type", "k", "v", "w", "_commit_id")),
        s"restarted stream must carry the widened shape, got ${emitted.map(_._1)}")
      val rows = emitted.flatMap(_._2)
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          Option(r.getString(3)).orNull)).toSet
      assert(rows == Set(
        ("update_preimage", "k9", 9L, null),
        ("update_postimage", "k9", 900L, "nine")),
        s"got $rows")
    } finally q2.stop()
  }

  test("a pending pre-widening batch replays under the re-derived wide schema (null-filled), not a crash loop") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, retentionFloorMillis = 60_000L)
    t.merge(Seq(("a", 1L)).toDF("k", "v"), keys = Seq("k"))
    val c1 = t.commits().last

    val batches = TrieMap.empty[Long,
      (org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row])]
    def startQ(ck: String) = spark.readStream.format("graft-state-changes")
      .option("startingCommit", c1)
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, (df.schema, df.collect().toSeq))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    // process one NARROW commit, then engineer the uncommitted-batch
    // window: a checkpoint whose offset log holds the batch but whose
    // commit log entry is lost (crash between offset write and commit)
    val q = startQ(s"$root/ck")
    try {
      q.processAllAvailable()
      t.merge(Seq(("b", 2L)).toDF("k", "v"), keys = Seq("k"))
      q.processAllAvailable()
    } finally q.stop()
    def cp(from: java.io.File, to: java.io.File): Unit = {
      if (from.isDirectory) {
        to.mkdirs()
        from.listFiles().foreach(f => cp(f, new java.io.File(to, f.getName)))
      } else if (!from.getName.endsWith(".crc"))
        java.nio.file.Files.copy(from.toPath, to.toPath)
    }
    cp(new java.io.File(s"$root/ck"), new java.io.File(s"$root/ck2"))
    assert(new java.io.File(s"$root/ck2/commits/1").delete())

    // the table widens WHILE the stream is down
    t.widenTo(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.StringType))))

    // restart: batch 1 replays a commit range that PREDATES the new
    // column, under a source schema re-derived wide — it must flow with
    // w null-filled instead of crash-looping on an unresolved column
    batches.clear()
    val q2 = startQ(s"$root/ck2")
    try q2.processAllAvailable() finally q2.stop()
    val replayed = batches(1L)
    assert(replayed._1.fieldNames.toSeq ==
      Seq("change_type", "k", "v", "w", "_commit_id"), s"got ${replayed._1}")
    assert(replayed._2.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      Option(r.getString(3)).orNull)).toSet == Set(("insert", "b", 2L, null)),
      s"got ${replayed._2}")
  }

  test("the feed tails ACROSS a splitBuckets boundary: replica parity, nothing re-emitted on restart") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, keepCommits = 10,
      retentionFloorMillis = 60_000L)
    t.merge(spark.range(100)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("v")),
      keys = Seq("k"))
    val c1 = t.commits().last

    // the replica: seeded from the c1 snapshot, maintained from the feed
    val replica = TrieMap.empty[String, Long]
    t.readAt(c1).get.as[(String, Long)].collect()
      .foreach { case (k, v) => replica.put(k, v) }
    def startQ(ck: String) = spark.readStream.format("graft-state-changes")
      .option("startingCommit", c1)
      .load(s"$root/state")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.as[Change].collect().foreach {
          case ("insert" | "update_postimage", k, v, _) => replica.put(k, v)
          case ("delete", k, _, _) => replica.remove(k)
          case _ => () // preimages carry no apply step for a keyed replica
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()

    val q = startQ(s"$root/ck")
    val t8 = try {
      q.processAllAvailable()
      // pre-split live traffic
      t.merge(Seq(("k7", -7L), ("kpre", 1L)).toDF("k", "v"), keys = Seq("k"))
      q.processAllAvailable()
      // the table outgrows its layout MID-STREAM: 4 -> 8 buckets
      val t8 = t.splitBuckets(2)
      // post-split traffic, including the delete of a pre-split insert
      t8.merge(Seq(("k7", 77L), ("kpost", 9L)).toDF("k", "v"), keys = Seq("k"))
      t8.applyDelta(upserts = Seq.empty[(String, Long)].toDF("k", "v"),
        deleteKeys = Seq("kpre", "k3").map(Tuple1(_)).toDF("k"),
        keys = Seq("k"))
      q.processAllAvailable()
      t8
    } finally q.stop()

    val want = t8.read().get.as[(String, Long)].collect().toMap
    assert(replica.toMap == want,
      s"replica lost parity across the split: " +
        s"extra=${replica.toMap.toSet -- want.toSet} " +
        s"missing=${want.toSet -- replica.toMap.toSet}")

    // restart from the same checkpoint: exactly-once — nothing
    // re-applies (a re-emitted delete of k3 would be visible as a
    // remove of a key the replica no longer holds; a re-emitted insert
    // would be masked, so probe with a sentinel perturbation instead)
    replica.put("k3", -999L) // would be wiped by a replayed delete
    val q2 = startQ(s"$root/ck2-fresh-nothing") // fresh ck → full replay
    try q2.processAllAvailable() finally q2.stop()
    assert(!replica.contains("k3"),
      "a FRESH checkpoint must replay history (sanity of the probe)")
    replica.put("k3", -999L)
    val q3 = startQ(s"$root/ck")
    try q3.processAllAvailable() finally q3.stop()
    assert(replica("k3") == -999L,
      "a committed checkpoint restart must re-emit nothing")
  }

  test("an arbitrary rebucket strands the feed LOUDLY; the reseed recipe (fresh checkpoint + initialSnapshot) recovers") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val t = new BucketedStateTable(spark, s"$root/state",
      keyCols = Seq("k"), numBuckets = 4, keepCommits = 10,
      retentionFloorMillis = 60_000L)
    t.merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), keys = Seq("k"))
    val c1 = t.commits().last

    val replica = TrieMap.empty[String, Long]
    def startQ(ck: String, opts: Map[String, String]) = {
      val r = spark.readStream.format("graft-state-changes")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(s"$root/state")
        .writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[Change].collect().foreach {
            case ("insert" | "update_postimage", k, v, _) => replica.put(k, v)
            case ("delete", k, _, _) => replica.remove(k)
            case _ => ()
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        .start()
    }

    val q = startQ(s"$root/ck", Map("startingCommit" -> c1.toString))
    val t16 = try {
      q.processAllAvailable()
      val t16 = t.rebucket(16) // NOT a split: truncates feed history
      t16.merge(Seq(("c", 3L)).toDF("k", "v"), keys = Seq("k"))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      // the refusal surfaces the reseed recipe, not a bare layout error
      val msgs = Iterator.iterate(err: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("initialSnapshot") ||
        msgs.contains("not retained"), msgs)
      t16
    } finally q.stop()

    // recover exactly as the error instructs: fresh checkpoint,
    // initialSnapshot bootstrap from the post-rebucket world
    replica.clear()
    val q2 = startQ(s"$root/ck-reseed", Map("initialSnapshot" -> "true"))
    try {
      q2.processAllAvailable()
      t16.merge(Seq(("d", 4L)).toDF("k", "v"), keys = Seq("k"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(replica.toMap == t16.read().get.as[(String, Long)].collect().toMap,
      s"reseeded replica must match the table, got $replica")
  }
}
