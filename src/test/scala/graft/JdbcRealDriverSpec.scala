package graft

import java.nio.file.Files
import java.sql.{Connection, DriverManager, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sinks.{ConnectionFactory, JdbcUpsertSink, SqlDialect}

/** Real-database integration tests for the JDBC sinks — the statements
  * run through an actual SQL engine (DuckDB over JDBC), not the
  * reflective in-JVM fake, so type-mapping and dialect errors a real
  * driver rejects are caught here. Mirrors the reference's live-
  * PostgreSQL integration suite behavior for behavior
  * (`PostgrePersistenceServiceTestIT.java:364-494`): upsert
  * insert-then-update, conditional delete with survivors, the
  * do-not-delete-modified guarantee, and array values with embedded
  * quotes/commas (`insertOaiHeaders.sql:18`'s
  * `'test," with separator and quotes'`).
  *
  * The database is file-backed so the executor-side connections opened
  * by `foreachPartition` and the driver-side assertion connection see
  * one store (local mode shares the process; DuckDB shares a database
  * instance per path within a process). Writes use one partition — the
  * reference service is a single sequential connection, and DuckDB's
  * optimistic concurrency would otherwise inject spurious write-write
  * aborts unrelated to what is under test.
  */
class JdbcRealDriverSpec extends SparkSpec {

  private val headerSchema = StructType(Seq(
    StructField("record_identifier", StringType, nullable = false),
    StructField("datestamp", TimestampType, nullable = true),
    StructField("set_spec", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("status_is_deleted", BooleanType, nullable = true)))

  private val trickySetSpec = Seq("test", "test,\" with separator and quotes")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def withDb(testBody: (String, ConnectionFactory) => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-duckdb").toString
    val url = s"jdbc:duckdb:$dir/it.db"
    // anchor pins one embedded-database instance for the test (see
    // JdbcStateTable scaladoc: instance shutdown/reopen between two
    // operations can drop the previous lifecycle's WAL)
    val cf = new ConnectionFactory {
      @transient private lazy val anchor: Connection =
        DriverManager.getConnection(url)
      def apply(): Connection = { anchor; DriverManager.getConnection(url) }
    }
    val conn = cf()
    try {
      // no PRIMARY KEY: the DuckDb dialect's delete+insert upsert
      // maintains keyed uniqueness itself, and DuckDB's ART index
      // rejects delete + same-key reinsert inside one transaction
      // (documented index limitation) — see SqlDialect.DuckDb
      conn.createStatement().execute(
        """CREATE TABLE "OAIHeader" (
          |  "record_identifier" VARCHAR,
          |  "datestamp" TIMESTAMP,
          |  "set_spec" VARCHAR[],
          |  "status_is_deleted" BOOLEAN)""".stripMargin)
    } finally conn.close()
    testBody(url, cf)
  }

  private def headerDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), headerSchema)

  private def readAll(cf: ConnectionFactory): Seq[(String, Timestamp, Seq[String], Boolean)] = {
    val conn = cf()
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT "record_identifier", "datestamp", "set_spec", "status_is_deleted"
          |FROM "OAIHeader" ORDER BY "record_identifier"""".stripMargin)
      val out = Seq.newBuilder[(String, Timestamp, Seq[String], Boolean)]
      while (rs.next()) {
        val arr = rs.getArray(3)
        val spec =
          if (arr == null) null
          else arr.getArray.asInstanceOf[Array[AnyRef]].toSeq
            .map(v => if (v == null) null else v.toString)
        out += ((rs.getString(1), rs.getTimestamp(2), spec, rs.getBoolean(4)))
      }
      out.result()
    } finally conn.close()
  }

  test("IT: upsert writes headers a real driver reads back — including the quotes/commas array") {
    withDb { (_, cf) =>
      val df = headerDf(Seq(
        Row("oai:example.org:qucosa:123", ts("2016-07-20 11:22:57"), null, false),
        Row("oai:example.org:qucosa:199", ts("2012-03-30 06:54:12"), trickySetSpec, true)))
      JdbcUpsertSink.writeUpsert(df, "OAIHeader", Seq("record_identifier"),
        cf, dialect = SqlDialect.DuckDb)

      val got = readAll(cf)
      assert(got.size == 2)
      assert(got(0) == (("oai:example.org:qucosa:123", ts("2016-07-20 11:22:57"), null, false)))
      assert(got(1) == (("oai:example.org:qucosa:199", ts("2012-03-30 06:54:12"), trickySetSpec, true)))
    }
  }

  test("IT: second upsert with same key UPDATES in place (datestamp, set_spec, flag)") {
    withDb { (_, cf) =>
      val id = "oai:example.org:qucosa:123"
      JdbcUpsertSink.writeUpsert(
        headerDf(Seq(Row(id, ts("2012-03-30 06:54:12"), null, false))),
        "OAIHeader", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)
      JdbcUpsertSink.writeUpsert(
        headerDf(Seq(Row(id, ts("2016-07-20 11:22:57"), trickySetSpec, true))),
        "OAIHeader", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)

      val got = readAll(cf)
      assert(got == Seq((id, ts("2016-07-20 11:22:57"), trickySetSpec, true)))
    }
  }

  test("IT: conditional delete removes matching tuples, keeps the rest") {
    withDb { (_, cf) =>
      val h1 = Row("oai:example.org:qucosa:123", ts("2016-07-20 11:22:57"), null, false)
      val h2 = Row("oai:example.org:qucosa:456", ts("2012-03-30 06:54:12"), null, true)
      val h3 = Row("oai:example.org:qucosa:789", ts("2010-04-14 03:27:52"), null, true)
      JdbcUpsertSink.writeUpsert(headerDf(Seq(h1, h2, h3)),
        "OAIHeader", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)

      JdbcUpsertSink.deleteIfUnmodified(headerDf(Seq(h1, h2)),
        "OAIHeader", cf, dialect = SqlDialect.DuckDb)

      assert(readAll(cf).map(_._1) == Seq("oai:example.org:qucosa:789"))
    }
  }

  test("IT: a header modified after it was read is NOT deleted (full-tuple match)") {
    withDb { (_, cf) =>
      val id = "oai:example.org:qucosa:123"
      val v1 = Row(id, ts("2012-03-30 06:54:12"), null, false)
      JdbcUpsertSink.writeUpsert(headerDf(Seq(v1)),
        "OAIHeader", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)
      // harvester lands v2 while v1 is in flight
      val v2 = Row(id, ts("2016-07-20 11:22:57"), null, false)
      JdbcUpsertSink.writeUpsert(headerDf(Seq(v2)),
        "OAIHeader", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)

      JdbcUpsertSink.deleteIfUnmodified(headerDf(Seq(v1)),
        "OAIHeader", cf, dialect = SqlDialect.DuckDb)

      // v2 survives: the consumer must re-process the new version
      assert(readAll(cf) == Seq((id, ts("2016-07-20 11:22:57"), null, false)))
    }
  }

  test("IT: array edge cases round-trip — empty array, null element, null array") {
    withDb { (_, cf) =>
      val df = headerDf(Seq(
        Row("a", ts("2020-01-01 00:00:00"), Seq.empty[String], false),
        Row("b", ts("2020-01-01 00:00:00"), Seq("x", null, ""), false),
        Row("c", ts("2020-01-01 00:00:00"), null, false)))
      JdbcUpsertSink.writeUpsert(df, "OAIHeader", Seq("record_identifier"),
        cf, dialect = SqlDialect.DuckDb)

      val bySpec = readAll(cf).map(r => r._1 -> r._3).toMap
      assert(bySpec("a") == Seq.empty[String])
      assert(bySpec("b") == Seq("x", null, ""))
      assert(bySpec("c") == null)
    }
  }

  test("IT: null-safe delete matches a stored NULL column (IS NOT DISTINCT FROM)") {
    withDb { (_, cf) =>
      val row = Row("n1", null, null, true)
      JdbcUpsertSink.writeUpsert(headerDf(Seq(row)),
        "OAIHeader", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)
      // a plain `=` would never match the NULL datestamp/set_spec and
      // the queue row would reprocess forever
      JdbcUpsertSink.deleteIfUnmodified(headerDf(Seq(row)),
        "OAIHeader", cf, dialect = SqlDialect.DuckDb)
      assert(readAll(cf).isEmpty)
    }
  }

  test("IT: duplicate keys within one batch — last row wins, exactly one stored") {
    withDb { (_, cf) =>
      val id = "oai:example.org:qucosa:dup"
      val df = headerDf(Seq(
        Row(id, ts("2012-03-30 06:54:12"), Seq("first"), false),
        Row(id, ts("2016-07-20 11:22:57"), Seq("last"), true)))
      JdbcUpsertSink.writeUpsert(df, "OAIHeader", Seq("record_identifier"),
        cf, dialect = SqlDialect.DuckDb)
      assert(readAll(cf) == Seq((id, ts("2016-07-20 11:22:57"), Seq("last"), true)))
    }
  }

  test("IT: property — adversarial array values round-trip through the real driver") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    withDb { (_, cf) =>
      // strings drawn from the troublemaker alphabet: JSON/SQL
      // metacharacters, control chars, non-ASCII, separators
      val charGen = Gen.oneOf(
        Gen.oneOf('"', '\\', ',', '\'', '[', ']', '{', '}', ':'),
        Gen.oneOf('\n', '\t', '\r', '\u0001', '\u001f'),
        Gen.oneOf('a', 'z', '0', ' ', 'é', '中'),
        Gen.alphaNumChar)
      val strGen = Gen.choose(0, 12).flatMap(n =>
        Gen.listOfN(n, charGen).map(_.mkString))
      val arrGen = Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, strGen))
      val arrays = (0 until 40).flatMap(i =>
        arrGen.apply(Gen.Parameters.default, Seed(4242L + i)))
      val rows = arrays.zipWithIndex.map { case (a, i) =>
        Row(s"k$i", ts("2024-01-01 00:00:00"), a, false)
      }
      JdbcUpsertSink.writeUpsert(headerDf(rows), "OAIHeader",
        Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)
      val got = readAll(cf).map(r => r._1 -> r._3).toMap
      arrays.zipWithIndex.foreach { case (a, i) =>
        assert(got(s"k$i") == a, s"row $i: ${got(s"k$i")} vs $a")
      }
    }
  }

  test("IT: reporting-doc table shape — 5-col upsert insert-then-update through the driver") {
    val dir = Files.createTempDirectory("graft-duckdb-rep").toString
    val url = s"jdbc:duckdb:$dir/rep.db"
    val cf = new ConnectionFactory {
      @transient private lazy val anchor: Connection =
        DriverManager.getConnection(url)
      def apply(): Connection = { anchor; DriverManager.getConnection(url) }
    }
    val c0 = cf()
    try c0.createStatement().execute(
      """CREATE TABLE "ReportingDoc" (
        |  "record_identifier" VARCHAR,
        |  "mandator" VARCHAR, "document_type" VARCHAR,
        |  "distribution_date" TIMESTAMP, "header_last_modified" TIMESTAMP)""".stripMargin)
    finally c0.close()

    val schema = StructType(Seq(
      StructField("record_identifier", StringType, nullable = false),
      StructField("mandator", StringType, nullable = true),
      StructField("document_type", StringType, nullable = true),
      StructField("distribution_date", TimestampType, nullable = true),
      StructField("header_last_modified", TimestampType, nullable = true)))
    def df(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

    JdbcUpsertSink.writeUpsert(
      df(Seq(Row("oai:example.org:qucosa:7455", "slub", "article",
        ts("2014-02-04 00:00:00"), ts("2016-07-20 11:22:57")))),
      "ReportingDoc", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)
    JdbcUpsertSink.writeUpsert(
      df(Seq(Row("oai:example.org:qucosa:7455", "slub", "monograph",
        ts("2014-02-04 00:00:00"), ts("2016-08-01 09:00:00")))),
      "ReportingDoc", Seq("record_identifier"), cf, dialect = SqlDialect.DuckDb)

    val conn = cf()
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT count(*), max("document_type") FROM "ReportingDoc"""")
      rs.next()
      assert(rs.getLong(1) == 1L)
      assert(rs.getString(2) == "monograph")
    } finally conn.close()
  }
}
