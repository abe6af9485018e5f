package graft

import java.nio.file.Files
import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.pipeline.{JdbcStateTable, QueuedHeader}
import graft.sinks.{ConnectionFactory, SqlDialect}

/** Cross-process contention for [[JdbcStateTable]]: the reference's
  * actual concurrency mode is two stages (harvester + reporter) sharing
  * one PostgreSQL (`ReportingManager.java:93-95` runs them against the
  * same database), so the JDBC twin must keep its contracts when two
  * CONNECTIONS — not two calls on one handle — interleave. Each
  * `ConnectionFactory()` call here opens a fresh connection to the same
  * embedded database, so every table handle below transacts separately,
  * like separate processes against one server.
  *
  * The exactly-once marker race (two writers of the SAME batch) is
  * driven deterministically through `commitBatchOnce` — the write
  * transaction entered after the replay pre-check passed — planting the
  * rival's commit exactly inside the race window instead of hoping a
  * thread scheduler lands there. */
class JdbcContentionSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val headerSchema = StructType(Seq(
    StructField("record_identifier", StringType, nullable = false),
    StructField("datestamp", TimestampType, nullable = true),
    StructField("set_spec", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("status_is_deleted", BooleanType, nullable = true)))

  /** DuckDB wire behavior with the insert-first marker scheme enabled:
    * the marker table only ever inserts NEW (scope, batch) pairs and
    * prunes OLD batches — never a delete + same-key reinsert in one
    * transaction — so DuckDB's documented ART limitation (the reason
    * [[SqlDialect.DuckDb]] defaults to select-then-insert) does not
    * apply to it, and the unique-index arbitration path can be proven
    * against a real driver. */
  private object DuckDbUnique extends SqlDialect {
    override def upsertByDeleteInsert: Boolean = true
    override def supportsUniqueIndex: Boolean = true
    def arrayPlaceholder: String = SqlDialect.DuckDb.arrayPlaceholder
    def bindStringArray(conn: Connection, ps: PreparedStatement, pos: Int,
        values: Seq[String]): Unit =
      SqlDialect.DuckDb.bindStringArray(conn, ps, pos, values)
  }

  /** Two independent handles on the SAME database — separate connection
    * factories sharing one anchor (embedded DuckDB shuts the instance
    * down with its last connection), every operation on its own
    * connection + transaction. */
  private def mkTwoWriters(dialect: SqlDialect = SqlDialect.DuckDb)
      : (JdbcStateTable, JdbcStateTable, ConnectionFactory) = {
    val dir = Files.createTempDirectory("graft-jdbccontention").toString
    val url = s"jdbc:duckdb:$dir/state.db"
    val cf = new ConnectionFactory {
      @transient private lazy val anchor: Connection =
        DriverManager.getConnection(url)
      def apply(): Connection = { anchor; DriverManager.getConnection(url) }
    }
    val a = new JdbcStateTable(spark, "OAIHeader", headerSchema,
      Seq("record_identifier"), cf, s"$dir/scratch/a", dialect)
    val b = new JdbcStateTable(spark, "OAIHeader", headerSchema,
      Seq("record_identifier"), cf, s"$dir/scratch/b", dialect)
    a.ensureTables()
    (a, b, cf)
  }

  private def markerCount(cf: ConnectionFactory, scope: String): Long = {
    val conn = cf()
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT count(*) FROM \"OAIHeader__batch_markers\" " +
          s"WHERE \"stream_scope\" = '$scope'")
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("contention: harvester re-upsert between reporter read and delete — survivor exact across connections") {
    val (harvester, reporter, _) = mkTwoWriters()
    val s = spark
    import s.implicits._

    harvester.merge(Seq(
      QueuedHeader("a", ts("2024-01-01 01:00:00"), Seq("s1"), false),
      QueuedHeader("b", ts("2024-01-01 02:00:00"), Seq("s2"), false),
      QueuedHeader("c", ts("2024-01-01 03:00:00"), Nil, true)
    ).toDF(), Seq("record_identifier"))

    // reporter drains the queue (reads the tuples it will later delete)
    val drained = reporter.read().get.collect()
    assert(drained.length == 3)

    // harvester re-upserts "b" with a newer datestamp WHILE the
    // reporter's batch is in flight — the ST5 late-update window,
    // through a different connection
    harvester.merge(Seq(
      QueuedHeader("b", ts("2024-02-02 02:00:00"), Seq("s2"), false)
    ).toDF(), Seq("record_identifier"))

    // reporter deletes what it READ: "b"'s stored tuple changed, so it
    // must survive and be counted; "a"/"c" go
    val survivors = reporter.deleteWhereUnmodified(
      spark.createDataFrame(
        spark.sparkContext.parallelize(drained.toSeq), headerSchema))
    assert(survivors == 1L)

    val left = harvester.read().get.collect()
    assert(left.map(_.getString(0)).toSeq == Seq("b"))
    assert(left.head.getTimestamp(1) == ts("2024-02-02 02:00:00"))
  }

  test("contention: same batch committed by a rival INSIDE the race window — unique index arbitrates, no double merge") {
    val (w1, w2, cf) = mkTwoWriters(DuckDbUnique)
    val s = spark
    import s.implicits._

    val batch = Seq(
      QueuedHeader("x", ts("2024-01-01 01:00:00"), Seq("s1"), false),
      QueuedHeader("y", ts("2024-01-01 02:00:00"), Nil, false)
    ).toDF()
    val rows = batch.select(headerSchema.fieldNames.map(col).toSeq: _*)
      .collect().toSeq

    // w1 passed its pre-check (no marker yet) and is about to enter the
    // write transaction; w2 commits the WHOLE batch first — the exact
    // race window select-then-insert loses
    assert(w2.mergeOnceForBatch(7L, "scopeA", batch, Seq("record_identifier")))
    assert(!w1.commitBatchOnce(7L, "scopeA", rows),
      "the racing writer must see the unique-index violation and report false")

    // exactly one marker, exactly one copy of the state
    assert(markerCount(cf, "scopeA") == 1L)
    assert(w1.read().get.count() == 2L)

    // a DIFFERENT batch from the loser still lands
    assert(w1.mergeOnceForBatch(8L, "scopeA",
      Seq(QueuedHeader("z", ts("2024-01-01 03:00:00"), Nil, false)).toDF(),
      Seq("record_identifier")))
    assert(w1.read().get.count() == 3L)
  }

  test("contention: threaded writers over disjoint batches — every batch exactly once, markers exact") {
    val (w1, w2, cf) = mkTwoWriters(DuckDbUnique)
    val s = spark
    import s.implicits._

    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    try {
      val futs = (0 until 8).map { i =>
        val w = if (i % 2 == 0) w1 else w2
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            start.await(10, TimeUnit.SECONDS)
            w.mergeOnceForBatch(i.toLong, "scopeT",
              Seq(QueuedHeader(s"rec$i", ts("2024-01-01 01:00:00"), Nil, false)).toDF(),
              Seq("record_identifier"))
          }
        })
      }
      start.countDown()
      val results = futs.map(_.get(120, TimeUnit.SECONDS))
      assert(results.forall(identity), "disjoint batches must all land")
    } finally pool.shutdownNow()

    assert(w1.read().get.count() == 8L)
    assert(markerCount(cf, "scopeT") == 8L)
    // replay of every batch is a no-op on either handle
    (0 until 8).foreach { i =>
      val w = if (i % 2 == 0) w2 else w1
      assert(!w.mergeOnceForBatch(i.toLong, "scopeT",
        Seq(QueuedHeader(s"rec$i", ts("2024-01-01 01:00:00"), Nil, false)).toDF(),
        Seq("record_identifier")))
    }
    assert(w1.read().get.count() == 8L)
  }

  test("contention: marker history stays bounded across a long stream (pruned like BatchMarkers)") {
    val (w1, _, cf) = mkTwoWriters()
    val s = spark
    import s.implicits._
    (0L until 150L).foreach { b =>
      assert(w1.mergeOnceForBatch(b, "scopeL",
        Seq(QueuedHeader("k", ts("2024-01-01 01:00:00"), Nil, false)).toDF(),
        Seq("record_identifier")))
    }
    val markers = markerCount(cf, "scopeL")
    assert(markers <= 101L, s"marker table must prune old batches: $markers rows")
    // batches within the retention window still replay as no-ops
    assert(!w1.mergeOnceForBatch(149L, "scopeL",
      Seq(QueuedHeader("k", ts("2024-01-01 01:00:00"), Nil, false)).toDF(),
      Seq("record_identifier")))
  }
}
