package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, Timestamp}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.sinks.{ConnectionFactory, JdbcUpsertSink}

/** Recording in-JVM JDBC fake (reflective proxies) — captures every
  * prepared statement, bound batch, and commit so the foreachPartition
  * sink logic is testable without a database (local mode shares the JVM,
  * so executor-side writes land in this driver-visible state). */
object RecordingJdbc {
  val preparedSql = new ConcurrentLinkedQueue[String]()
  val executedBatches = new ConcurrentLinkedQueue[Vector[Any]]()
  val commits = new AtomicInteger(0)

  def reset(): Unit = { preparedSql.clear(); executedBatches.clear(); commits.set(0) }

  private def proxy[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals"   => Boolean.box(p.asInstanceOf[AnyRef] eq args(0))
            case "toString" => s"proxy(${cls.getSimpleName})"
            case name       => h(name, args)
          }
      }).asInstanceOf[T]

  private def sqlArray(elems: Array[AnyRef]): java.sql.Array =
    proxy(classOf[java.sql.Array]) {
      case ("getArray", _) => elems
      case _ => null
    }

  private def preparedStatement(): PreparedStatement = {
    val params = scala.collection.mutable.Map[Int, Any]()
    val local = scala.collection.mutable.Buffer[Vector[Any]]()
    proxy(classOf[PreparedStatement]) {
      case (s, args) if s.startsWith("set") =>
        params(args(0).asInstanceOf[Int]) =
          (if (args.length > 1) args(1) else null); null
      case ("addBatch", _) =>
        local += (1 to params.keys.max).map(params.getOrElse(_, null)).toVector
        null
      case ("executeBatch", _) =>
        val out = Array.fill(local.size)(1)
        local.foreach(executedBatches.add)
        local.clear()
        out
      case _ => null
    }
  }

  def connection(): Connection = proxy(classOf[Connection]) {
    case ("prepareStatement", args) =>
      preparedSql.add(args(0).asInstanceOf[String]); preparedStatement()
    case ("createArrayOf", args) =>
      sqlArray(args(1).asInstanceOf[Array[AnyRef]])
    case ("commit", _) => commits.incrementAndGet(); null
    case _ => null
  }
}

class JdbcUpsertSinkSpec extends SparkSpec {

  private val factory = new ConnectionFactory {
    def apply(): Connection = RecordingJdbc.connection()
  }

  test("upsertSql mirrors the reference's ON CONFLICT statement shape") {
    assert(JdbcUpsertSink.upsertSql("OAIHeader",
      Seq("recordIdentifier", "datestamp", "setSpec", "statusIsDeleted"),
      Seq("recordIdentifier")) ==
      """INSERT INTO "OAIHeader" ("recordIdentifier", "datestamp", "setSpec", "statusIsDeleted") """ +
      """VALUES (?, ?, ?, ?) ON CONFLICT ("recordIdentifier") DO UPDATE SET """ +
      """"datestamp" = EXCLUDED."datestamp", "setSpec" = EXCLUDED."setSpec", "statusIsDeleted" = EXCLUDED."statusIsDeleted"""")
    assert(JdbcUpsertSink.upsertSql("T", Seq("k"), Seq("k")) ==
      """INSERT INTO "T" ("k") VALUES (?) ON CONFLICT ("k") DO NOTHING""")
  }

  test("deleteIfUnmodifiedSql matches every column (full-tuple delete, null-safe)") {
    // IS NOT DISTINCT FROM: a '=' comparison never matches SQL NULL, so
    // a null-bearing processed row could never be deleted (infinite
    // reprocess) — latent in the reference only because its columns are
    // NOT NULL
    assert(JdbcUpsertSink.deleteIfUnmodifiedSql("OAIHeader",
      Seq("recordIdentifier", "datestamp", "statusIsDeleted")) ==
      """DELETE FROM "OAIHeader" WHERE "recordIdentifier" IS NOT DISTINCT FROM ? """ +
        """AND "datestamp" IS NOT DISTINCT FROM ? AND "statusIsDeleted" IS NOT DISTINCT FROM ?""")
  }

  test("writeUpsert batches rows per partition in one transaction, arrays via createArrayOf") {
    RecordingJdbc.reset()
    val s = spark
    import s.implicits._
    val df = Seq(
      ("oai:q:1", Timestamp.valueOf("2024-01-01 00:00:00"), Seq("a", "b"), false),
      ("oai:q:2", Timestamp.valueOf("2024-01-02 00:00:00"), Seq.empty[String], true),
      ("oai:q:3", Timestamp.valueOf("2024-01-03 00:00:00"), Seq("c,\"x\""), false)
    ).toDF("recordIdentifier", "datestamp", "setSpec", "statusIsDeleted")
      .repartition(2)

    JdbcUpsertSink.writeUpsert(df, "OAIHeader", Seq("recordIdentifier"),
      factory, batchSize = 2)

    import scala.jdk.CollectionConverters._
    assert(RecordingJdbc.preparedSql.asScala.forall(_.startsWith("INSERT INTO \"OAIHeader\"")))
    val batches = RecordingJdbc.executedBatches.asScala.toVector
    assert(batches.size == 3)
    assert(RecordingJdbc.commits.get() >= 1)

    val byId = batches.map(b => b(0).asInstanceOf[String] -> b).toMap
    assert(byId("oai:q:1")(1) == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(byId("oai:q:1")(2).asInstanceOf[java.sql.Array]
      .getArray.asInstanceOf[Array[AnyRef]].toSeq == Seq("a", "b"))
    assert(byId("oai:q:2")(3) == java.lang.Boolean.TRUE)
    // embedded quotes/commas survive untouched (SF7 array round-trip —
    // JDBC binds the array natively, no escaping layer)
    assert(byId("oai:q:3")(2).asInstanceOf[java.sql.Array]
      .getArray.asInstanceOf[Array[AnyRef]].toSeq == Seq("c,\"x\""))
  }

  test("deleteIfUnmodified binds the full tuple per row") {
    RecordingJdbc.reset()
    val s = spark
    import s.implicits._
    val df = Seq(("oai:q:1", false), ("oai:q:2", true)).toDF("recordIdentifier", "statusIsDeleted")
    JdbcUpsertSink.deleteIfUnmodified(df, "OAIHeader", factory)
    import scala.jdk.CollectionConverters._
    assert(RecordingJdbc.preparedSql.asScala.head.startsWith("DELETE FROM \"OAIHeader\" WHERE"))
    assert(RecordingJdbc.executedBatches.size == 2)
  }
}
