package graft.sinks

import java.sql.{Connection, PreparedStatement, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pluggable connection source for the JDBC sinks. Runs on executors —
  * implementations must be serializable and should open lazily (one
  * connection per partition, the Spark analog of the reference's
  * connection-per-operation; `PostgrePersistenceService.java:227`). */
trait ConnectionFactory extends (() => Connection) with Serializable

/** The one per-driver SQL variation the sinks cannot hide behind plain
  * JDBC: how a string-array column is bound. Standard JDBC — PostgreSQL,
  * the reference's target — binds a `java.sql.Array` via
  * `createArrayOf`; drivers without array write support (e.g. DuckDB's,
  * which throws `SQLFeatureNotSupportedException`) route a lossless
  * JSON encoding through a SQL placeholder expression instead. All
  * other bindings (primitives, timestamps, nulls) are uniform JDBC. */
trait SqlDialect extends Serializable {
  /** Placeholder expression for ONE string-array bind position in
    * `VALUES (...)` / `WHERE`. Must consume exactly one `?`. */
  def arrayPlaceholder: String
  /** Bind a non-null string array at `pos` (null ELEMENTS preserved). */
  def bindStringArray(conn: Connection, ps: PreparedStatement, pos: Int,
      values: Seq[String]): Unit
  /** Engines whose conflict clause cannot update every column type
    * (DuckDB 1.x: "List Update is not supported") upsert as
    * delete-by-key + insert inside the same transaction instead — a
    * full-row replace, semantically identical to `DO UPDATE SET` of
    * every non-key column. */
  def upsertByDeleteInsert: Boolean = false
  /** Whether the engine supports unique indexes reliably enough for the
    * batch-marker insert-first scheme (a unique index on the marker
    * table lets concurrent writers arbitrate on a constraint violation
    * instead of racing select-then-insert). Engines with documented
    * index limitations (DuckDB's ART — see [[SqlDialect.DuckDb]]) keep
    * the select-then-insert scheme, whose race degrades to an
    * idempotent re-merge. */
  def supportsUniqueIndex: Boolean = true
  /** DDL type for a BinaryType column — the one portable-looking name
    * that is NOT portable: PostgreSQL has no BLOB (it is BYTEA), while
    * DuckDB has no BYTEA spelled that way pre-1.x aliasing. */
  def binaryType: String = "BYTEA"
}

object SqlDialect {
  /** Standard JDBC array binding (PostgreSQL et al.). */
  object Standard extends SqlDialect {
    def arrayPlaceholder: String = "?"
    def bindStringArray(conn: Connection, ps: PreparedStatement, pos: Int,
        values: Seq[String]): Unit =
      ps.setArray(pos, conn.createArrayOf("varchar", values.toArray[AnyRef]))
  }

  /** DuckDB: `createArrayOf` is unsupported by the driver, so the array
    * crosses as one JSON string parsed server-side — lossless for
    * embedded quotes/commas/control chars, empty arrays, and null
    * elements (JSON escaping is well-defined where a hand-rolled list
    * literal is not).
    *
    * Upserts run as delete+insert (`upsertByDeleteInsert`): DuckDB 1.x
    * rejects conflict-clause updates of LIST columns ("List Update is
    * not supported"). Target tables should carry NO unique index on the
    * keys — the sink's keyed replace maintains uniqueness itself, and
    * DuckDB's documented ART limitation makes a delete + same-key
    * reinsert inside one transaction trip the constraint spuriously. */
  object DuckDb extends SqlDialect {
    override def upsertByDeleteInsert: Boolean = true
    override def supportsUniqueIndex: Boolean = false
    override def binaryType: String = "BLOB"
    def arrayPlaceholder: String = "from_json(?, '[\"VARCHAR\"]')"
    def bindStringArray(conn: Connection, ps: PreparedStatement, pos: Int,
        values: Seq[String]): Unit =
      ps.setString(pos, values.map(jsonString).mkString("[", ",", "]"))
    private def jsonString(s: String): String =
      if (s == null) "null"
      else {
        val sb = new java.lang.StringBuilder("\"")
        s.foreach {
          case '"'  => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
          case c => sb.append(c)
        }
        sb.append('"').toString
      }
  }
}

/** U1/U2 as a JDBC sink — Spark's JDBC writer has no upsert mode
  * (SURVEY §7.4), so the merge goes through `foreachPartition` with the
  * reference's exact statement shape
  * (`PostgrePersistenceService.java:224`):
  *
  * {{{
  * INSERT INTO "T" ("k", "a", "b") VALUES (?, ?, ?)
  * ON CONFLICT ("k") DO UPDATE SET "a" = EXCLUDED."a", "b" = EXCLUDED."b"
  * }}}
  *
  * Batched statements in a single transaction per partition
  * (`addBatch`/`executeBatch`, autoCommit off — reference `:230-252`).
  * `EXCLUDED.col` replaces the reference's duplicated positional
  * parameters (same semantics, half the bind variables). The sink is
  * idempotent under Spark task retries — a replayed partition re-upserts
  * the same keyed rows (ST4).
  *
  * String-array columns map to SQL `varchar[]` via `createArrayOf`
  * (SF7 round-trip; reference `:238-239`).
  */
object JdbcUpsertSink {

  private def q(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** The PostgreSQL `ON CONFLICT` upsert statement for (table, cols, keys).
    * All-key tables degrade to `DO NOTHING`. */
  def upsertSql(table: String, cols: Seq[String], keys: Seq[String]): String =
    upsertSql(table, cols, keys, cols.map(_ => "?"))

  /** General form: `placeholders(i)` is the bind expression for
    * `cols(i)` (each consuming exactly one `?`) — dialects without
    * `createArrayOf` route array binds through a SQL expression. */
  def upsertSql(table: String, cols: Seq[String], keys: Seq[String],
      placeholders: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"keys $keys must be a subset of columns $cols")
    val nonKeys = cols.filterNot(keys.contains)
    val conflict =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        nonKeys.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${placeholders.mkString(", ")}) " +
      s"ON CONFLICT (${keys.map(q).mkString(", ")}) $conflict"
  }

  /** D1's full-tuple conditional delete as a statement
    * (reference `PostgrePersistenceService.java:351`).
    *
    * `IS NOT DISTINCT FROM` instead of `=`: a plain equality never
    * matches SQL NULL, so a processed row carrying a null column could
    * never be deleted from the queue (infinite reprocess). The
    * reference's columns are all NOT NULL, which made this latent — but
    * this sink is schema-agnostic, so null-safe matching is the correct
    * general form. */
  def deleteIfUnmodifiedSql(table: String, cols: Seq[String]): String =
    deleteIfUnmodifiedSql(table, cols, cols.map(_ => "?"))

  /** General form with per-column bind expressions (see [[upsertSql]]). */
  def deleteIfUnmodifiedSql(table: String, cols: Seq[String],
      placeholders: Seq[String]): String =
    s"DELETE FROM ${q(table)} WHERE " +
      cols.zip(placeholders)
        .map { case (c, p) => s"${q(c)} IS NOT DISTINCT FROM $p" }
        .mkString(" AND ")

  /** Driver-side refusal of types [[binder]] cannot bind portably —
    * without it a struct/map/non-string-array column dies per-partition
    * with an opaque driver "can't infer SQL type" after executors spin
    * up. Mirrors the construction-time whitelist JdbcStateTable.sqlType
    * applies to its own schema. */
  private[graft] def requireBindable(fields: Array[StructField],
      what: String): Unit =
    fields.foreach { f =>
      f.dataType match {
        case StringType | BooleanType | IntegerType | LongType |
             DoubleType | FloatType | ShortType | ByteType |
             TimestampType | DateType | BinaryType => ()
        case _: DecimalType => ()
        case ArrayType(StringType, _) => ()
        case dt => throw new IllegalArgumentException(
          s"$what: column `${f.name}` has JDBC-unbindable type " +
            s"${dt.simpleString} — primitives, decimal, date/timestamp, " +
            "binary, and ARRAY<STRING> bind; serialize anything else " +
            "first (e.g. to_json)")
      }
    }

  private[graft] def placeholders(fields: Array[StructField],
      dialect: SqlDialect): Seq[String] =
    fields.toSeq.map(_.dataType match {
      case ArrayType(StringType, _) => dialect.arrayPlaceholder
      case _ => "?"
    })

  private[graft] def binder(conn: Connection, ps: PreparedStatement,
      fields: Array[StructField], dialect: SqlDialect): (Row, Int) => Unit = { (row, i) =>
    val pos = i + 1
    if (row.isNullAt(i)) ps.setObject(pos, null)
    else fields(i).dataType match {
      case StringType    => ps.setString(pos, row.getString(i))
      case BooleanType   => ps.setBoolean(pos, row.getBoolean(i))
      case IntegerType   => ps.setInt(pos, row.getInt(i))
      case LongType      => ps.setLong(pos, row.getLong(i))
      case DoubleType    => ps.setDouble(pos, row.getDouble(i))
      case TimestampType => row.get(i) match {
        // java8API sessions hand back Instant, not Timestamp — both
        // must bind, or every partition dies on a ClassCastException
        case t: Timestamp => ps.setTimestamp(pos, t)
        case inst: java.time.Instant => ps.setTimestamp(pos, Timestamp.from(inst))
        case other => ps.setObject(pos, other)
      }
      case ArrayType(StringType, _) =>
        dialect.bindStringArray(conn, ps, pos, row.getSeq[String](i))
      case _ => ps.setObject(pos, row.get(i))
    }
  }

  /** The ONE batched statement loop: bind every row positionally,
    * execute in `batchSize` batches — shared by [[executeBatched]] and
    * [[upsertOnConnection]]'s ON CONFLICT branch so a fix to the
    * batching discipline cannot land in one copy and miss the other. */
  private def bindAndExecute(conn: Connection, ps: PreparedStatement,
      fields: Array[StructField], rows: Iterator[Row],
      batchSize: Int, dialect: SqlDialect): Unit = {
    val bind = binder(conn, ps, fields, dialect)
    var pending = 0
    rows.foreach { row =>
      var i = 0
      while (i < fields.length) { bind(row, i); i += 1 }
      ps.addBatch()
      pending += 1
      if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
    }
    if (pending > 0) ps.executeBatch()
  }

  /** Shared per-partition transaction loop: one connection + one
    * transaction per partition, statements batched `batchSize` at a
    * time, every row bound positionally with [[binder]]. */
  private def executeBatched(
      df: DataFrame,
      sql: String,
      connectionFactory: ConnectionFactory,
      batchSize: Int,
      dialect: SqlDialect): Unit = {
    val fields = df.schema.fields
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connectionFactory()
        try {
          conn.setAutoCommit(false)
          try {
            val ps = conn.prepareStatement(sql)
            try {
              bindAndExecute(conn, ps, fields, rows, batchSize, dialect)
              conn.commit()
            } finally ps.close()
          } catch {
            case e: Throwable =>
              // explicit rollback before close: a driver that commits
              // on close would turn a failed half-bound partition into
              // committed state (same discipline as
              // JdbcStateTable.withConnection)
              try conn.rollback() catch { case _: Throwable => () }
              throw e
          }
        } finally conn.close()
      }
    }
  }

  /** Value-equality key component for Map-based keep-last dedup:
    * `Row.get` on a BinaryType column yields `Array[Byte]`, whose
    * equals/hashCode are REFERENTIAL — two identical byte keys would
    * both survive the dedup and then collide in the database (a PK
    * violation on the delete+insert dialect). Wrapping in an immutable
    * Seq restores content equality; every other JDBC-bindable type
    * already has it. */
  private[graft] def dedupKeyComponent(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case other => other
  }

  /** Plain insert statement (the second half of the delete+insert
    * upsert strategy). */
  def insertSql(table: String, cols: Seq[String],
      placeholders: Seq[String]): String =
    s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${placeholders.mkString(", ")})"

  /** Connection-level upsert of an iterator of rows — the shared core
    * of the executor-side sink (once per partition) and the
    * driver-side `JdbcStateTable` (once per transaction): an
    * ON CONFLICT statement when the dialect supports it, chunked
    * delete-by-key + insert keyed replace otherwise (keep-last per key
    * within a chunk — two same-key rows would otherwise both insert).
    * The CALLER owns the connection, the transaction, and close. */
  private[graft] def upsertOnConnection(
      conn: Connection,
      rows: Iterator[Row],
      fields: Array[StructField],
      table: String,
      keys: Seq[String],
      batchSize: Int,
      dialect: SqlDialect): Unit = {
    val cols = fields.map(_.name).toSeq
    // the ON CONFLICT branch gets this check from upsertSql; the
    // delete+insert branch must fail just as clearly, not with an
    // opaque fields(-1) AIOOBE inside executor tasks
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"upsert keys ${keys.mkString(", ")} must be a subset of " +
        s"columns ${cols.mkString(", ")}")
    if (dialect.upsertByDeleteInsert) {
      val keyIdx = keys.map(cols.indexOf).toArray
      val keyFields = keyIdx.map(fields)
      val del = conn.prepareStatement(deleteIfUnmodifiedSql(table, keys,
        placeholders(keyFields, dialect)))
      val ins = conn.prepareStatement(
        insertSql(table, cols, placeholders(fields, dialect)))
      try {
        val bindDel = binder(conn, del, keyFields, dialect)
        val bindIns = binder(conn, ins, fields, dialect)
        rows.grouped(batchSize).foreach { chunk =>
          val deduped = scala.collection.mutable.LinkedHashMap
            .empty[Seq[Any], Row]
          chunk.foreach(row => deduped.put(
            keyIdx.map(i => dedupKeyComponent(row.get(i))).toSeq, row))
          deduped.values.foreach { row =>
            val keyRow = Row(keyIdx.map(row.get).toIndexedSeq: _*)
            var k = 0
            while (k < keyIdx.length) { bindDel(keyRow, k); k += 1 }
            del.addBatch()
            var i = 0
            while (i < fields.length) { bindIns(row, i); i += 1 }
            ins.addBatch()
          }
          del.executeBatch()
          ins.executeBatch()
        }
      } finally { ins.close(); del.close() }
    } else {
      val ps = conn.prepareStatement(
        upsertSql(table, cols, keys, placeholders(fields, dialect)))
      try bindAndExecute(conn, ps, fields, rows, batchSize, dialect)
      finally ps.close()
    }
  }

  /** Upsert `df` into `table` keyed on `keys` — one connection + one
    * transaction per partition over [[upsertOnConnection]]. */
  def writeUpsert(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      connectionFactory: ConnectionFactory,
      batchSize: Int = 500,
      dialect: SqlDialect = SqlDialect.Standard): Unit = {
    val fields = df.schema.fields
    requireBindable(fields, "writeUpsert")
    // key-ordered within each partition (no shuffle, Spark's spillable
    // sort): concurrent transactions over overlapping keys then acquire
    // row locks in one global order and serialize on the database
    // instead of aborting each other with a deadlock
    val ordered = df.sortWithinPartitions(
      keys.map(org.apache.spark.sql.functions.col): _*)
    ordered.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connectionFactory()
        try {
          conn.setAutoCommit(false)
          try {
            upsertOnConnection(conn, rows, fields, table, keys, batchSize,
              dialect)
            conn.commit()
          } catch {
            case e: Throwable =>
              try conn.rollback() catch { case _: Throwable => () }
              throw e
          }
        } finally conn.close()
      }
    }
  }

  /** Conditional full-tuple delete of `df`'s rows from `table` (D1).
    * Rows whose stored tuple changed since they were read survive —
    * the database-side twin of `StateOps.deleteIfUnmodified`. */
  def deleteIfUnmodified(
      df: DataFrame,
      table: String,
      connectionFactory: ConnectionFactory,
      batchSize: Int = 500,
      dialect: SqlDialect = SqlDialect.Standard): Unit = {
    requireBindable(df.schema.fields, "deleteIfUnmodified")
    executeBatched(
      // tuple-ordered for the same lock-order reason as writeUpsert
      df.sortWithinPartitions(
        df.columns.toSeq.map(org.apache.spark.sql.functions.col): _*),
      deleteIfUnmodifiedSql(table, df.columns.toSeq,
        placeholders(df.schema.fields, dialect)),
      connectionFactory, batchSize, dialect)
  }
}
