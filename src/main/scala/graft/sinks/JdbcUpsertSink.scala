package graft.sinks

import java.sql.{Connection, PreparedStatement, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pluggable connection source for the JDBC sinks. Runs on executors —
  * implementations must be serializable and should open lazily (one
  * connection per partition, the Spark analog of the reference's
  * connection-per-operation; `PostgrePersistenceService.java:227`). */
trait ConnectionFactory extends (() => Connection) with Serializable

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

  private def q(ident: String): String = "\"" + ident + "\""

  /** The PostgreSQL `ON CONFLICT` upsert statement for (table, cols, keys).
    * All-key tables degrade to `DO NOTHING`. */
  def upsertSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"keys $keys must be a subset of columns $cols")
    val nonKeys = cols.filterNot(keys.contains)
    val conflict =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        nonKeys.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
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
    s"DELETE FROM ${q(table)} WHERE " +
      cols.map(c => s"${q(c)} IS NOT DISTINCT FROM ?").mkString(" AND ")

  private def binder(conn: Connection, ps: PreparedStatement,
      fields: Array[StructField]): (Row, Int) => Unit = { (row, i) =>
    val pos = i + 1
    if (row.isNullAt(i)) ps.setObject(pos, null)
    else fields(i).dataType match {
      case StringType    => ps.setString(pos, row.getString(i))
      case BooleanType   => ps.setBoolean(pos, row.getBoolean(i))
      case IntegerType   => ps.setInt(pos, row.getInt(i))
      case LongType      => ps.setLong(pos, row.getLong(i))
      case DoubleType    => ps.setDouble(pos, row.getDouble(i))
      case TimestampType => ps.setTimestamp(pos, row.getAs[Timestamp](i))
      case ArrayType(StringType, _) =>
        val arr = row.getSeq[String](i).toArray[AnyRef]
        ps.setArray(pos, conn.createArrayOf("varchar", arr))
      case _ => ps.setObject(pos, row.get(i))
    }
  }

  /** Shared per-partition transaction loop: one connection + one
    * transaction per partition, statements batched `batchSize` at a
    * time, every row bound positionally with [[binder]]. */
  private def executeBatched(
      df: DataFrame,
      sql: String,
      connectionFactory: ConnectionFactory,
      batchSize: Int): Unit = {
    val fields = df.schema.fields
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connectionFactory()
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            val bind = binder(conn, ps, fields)
            var pending = 0
            rows.foreach { row =>
              var i = 0
              while (i < fields.length) { bind(row, i); i += 1 }
              ps.addBatch()
              pending += 1
              if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }

  /** Upsert `df` into `table` keyed on `keys`. */
  def writeUpsert(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      connectionFactory: ConnectionFactory,
      batchSize: Int = 500): Unit =
    executeBatched(df, upsertSql(table, df.columns.toSeq, keys),
      connectionFactory, batchSize)

  /** Conditional full-tuple delete of `df`'s rows from `table` (D1).
    * Rows whose stored tuple changed since they were read survive —
    * the database-side twin of `StateOps.deleteIfUnmodified`. */
  def deleteIfUnmodified(
      df: DataFrame,
      table: String,
      connectionFactory: ConnectionFactory,
      batchSize: Int = 500): Unit =
    executeBatched(df, deleteIfUnmodifiedSql(table, df.columns.toSeq),
      connectionFactory, batchSize)
}
