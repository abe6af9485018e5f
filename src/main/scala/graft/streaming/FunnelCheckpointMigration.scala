package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.streaming.state.{
  NoPrefixKeyStateEncoderSpec, StateStoreConf, StateStoreId,
  StateStoreProvider, StateStoreProviderId}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Offline migration of a pre-r18 funnel checkpoint (2-field
  * millisecond [[FunnelState]]) to the current 3-field microsecond
  * layout — the upgrade path [[EventStreams.funnelStream]]'s scaladoc
  * used to declare impossible. A long-lived funnel stream restarted
  * across the upgrade no longer has to discard its checkpoint and
  * re-read the source from an earlier offset (minus whatever retention
  * already aged out): run this once against the stopped stream's
  * checkpoint, point the restarted query at the migrated directory, and
  * the keyed state continues where it left off.
  *
  * What it does, per state partition:
  *  1. reads the last COMMITTED batch's state (version B+1 for batch B)
  *     through a state store provider opened with the LEGACY value
  *     layout — `mapGroupsWithState` state format v2 under NoTimeout
  *     wraps the user state as
  *     `struct(groupState struct<stage:int,last:long>)`, verified
  *     against the old checkpoint's own per-partition schema file so a
  *     checkpoint that is NOT a pre-r18 funnel fails loudly before
  *     anything is written;
  *  2. converts each row: `lastUs = last * 1000` (the legacy stamp was
  *     epoch MILLIS; `Long.MinValue` sentinels pass through unscaled —
  *     scaling would overflow), `seenUs = lastUs` (the legacy state
  *     never recorded the max-seen stamp, and the last ADVANCING event
  *     is the tightest floor it proves; a TTL enabled after migration
  *     can therefore evict up to one TTL early for users whose newest
  *     event never advanced a stage — the conservative direction);
  *  3. writes the converted rows as state version 1 of a NEW checkpoint
  *     directory, REBASED to batch 0: `offsets/0` and `commits/0` carry
  *     the old last batch's content verbatim (source positions,
  *     watermark, and the pinned conf map — including the state format
  *     version — survive), `metadata` is copied, and no state-schema
  *     file is copied so the restart records the new schema cleanly.
  *
  * Scope: the default [[HDFSBackedStateStoreProvider]] only (RocksDB
  * state dirs have a different on-disk layout), one stateful operator
  * (operatorId 0 — what a funnel query has). Because batch numbering
  * restarts at 1, a sink that deduplicates on `(queryId, batchId)` —
  * the file sink's `_spark_metadata`, for one — would treat re-emitted
  * rows as new; the funnel's own idempotent-merge JDBC sink and any
  * at-least-once sink are unaffected.
  *
  * Driver-side by design: funnel state is one small row per in-flight
  * user and the migration is a one-shot offline tool; the sequential
  * per-partition loop is I/O-bound on the checkpoint filesystem, not a
  * query path.
  */
object FunnelCheckpointMigration {

  /** Rows migrated per partition, plus the rebased batch id. */
  final case class Report(oldBatchId: Long, rowsPerPartition: Map[Int, Long]) {
    def totalRows: Long = rowsPerPartition.values.sum
  }

  private val keySchema =
    new StructType().add("value", LongType, nullable = false)
  private val legacyUserSchema = new StructType()
    .add("stage", IntegerType, nullable = false)
    .add("last", LongType, nullable = false)
  private val currentUserSchema = new StructType()
    .add("stage", IntegerType, nullable = false)
    .add("lastUs", LongType, nullable = false)
    .add("seenUs", LongType, nullable = false)
  // mapGroupsWithState state format v2 with NoTimeout: the user state
  // rides nested under a single `groupState` field (a `timeoutTimestamp`
  // column joins the wrapper only for timeout-enabled queries — which
  // the pre-r18 funnel, TTL-less by construction, never was; the
  // restarted query must likewise run without a TTL first, the same
  // schema constraint any Spark restart imposes)
  private def wrapped(user: StructType): StructType =
    new StructType().add("groupState", user, nullable = true)

  def migrate(
      spark: SparkSession,
      oldCheckpoint: String,
      newCheckpoint: String): Report = {
    val hc = spark.sessionState.newHadoopConf()
    val oldRoot = new Path(oldCheckpoint)
    val newRoot = new Path(newCheckpoint)
    val fs = oldRoot.getFileSystem(hc)
    require(fs.exists(oldRoot), s"no checkpoint at $oldCheckpoint")
    require(!fs.exists(new Path(newRoot, "offsets")),
      s"$newCheckpoint already holds a checkpoint — refusing to overwrite")

    val lastBatch = committedBatches(fs, new Path(oldRoot, "commits"))
      .maxOption.getOrElse(throw new IllegalStateException(
        s"$oldCheckpoint has no committed batch — nothing to migrate"))

    val oldStateRoot = new Path(oldRoot, "state/0")
    val partitions = fs.listStatus(oldStateRoot).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toInt).sorted
    require(partitions.nonEmpty,
      s"$oldCheckpoint has no state partitions under state/0")
    // EVERY partition's schema record validates before anything is
    // written: a non-funnel checkpoint must fail with the target
    // directory untouched — control files written first would poison
    // the target against retry (the no-overwrite guard would refuse)
    // and leave a plausible-looking checkpoint with no state behind
    partitions.foreach { p =>
      validateLegacySchema(fs, new Path(oldStateRoot, s"$p/_metadata/schema"))
    }

    // control files, rebased to batch 0 (content verbatim: source
    // offsets, watermark, and the pinned conf map must survive)
    copyFile(fs, new Path(oldRoot, s"offsets/$lastBatch"),
      new Path(newRoot, "offsets/0"), hc)
    copyFile(fs, new Path(oldRoot, s"commits/$lastBatch"),
      new Path(newRoot, "commits/0"), hc)
    copyFile(fs, new Path(oldRoot, "metadata"),
      new Path(newRoot, "metadata"), hc)

    val rows = partitions.map { p =>
      p -> migratePartition(spark, hc,
        oldRoot.toString, newRoot.toString, p, lastBatch + 1)
    }.toMap
    Report(lastBatch, rows)
  }

  /** The old checkpoint's own schema record must describe the pre-r18
    * funnel layout — migrating anything else would silently corrupt a
    * different operator's state. The file is DataOutputStream UTF
    * triplets: version tag, key schema JSON, value schema JSON. A
    * missing file (possible for very old checkpoints that predate the
    * schema record) is tolerated; a PRESENT-but-different one is not. */
  private def validateLegacySchema(fs: FileSystem, schemaFile: Path): Unit = {
    if (!fs.exists(schemaFile)) return
    val in = new java.io.DataInputStream(fs.open(schemaFile))
    val (keyJson, valueJson) =
      try {
        val version = in.readUTF()
        require(version == "v2",
          s"$schemaFile: unsupported state schema record version $version")
        // each schema is stored as writeInt(chunkCount) + chunked
        // writeUTF strings (writeUTF caps one string at 64 KB)
        def chunked(): String =
          (0 until in.readInt()).map(_ => in.readUTF()).mkString
        (chunked(), chunked())
      }
      finally in.close()
    val key = org.apache.spark.sql.types.DataType.fromJson(keyJson)
    val value = org.apache.spark.sql.types.DataType.fromJson(valueJson)
    require(key == keySchema && value == wrapped(legacyUserSchema),
      s"$schemaFile does not record the pre-r18 funnel state layout " +
        s"(key=$keyJson value=$valueJson) — refusing to migrate")
  }

  /** One partition: legacy-read at `readVersion`, convert, commit as
    * version 1 of the new directory. */
  private def migratePartition(
      spark: SparkSession,
      hc: Configuration,
      oldCheckpoint: String,
      newCheckpoint: String,
      partition: Int,
      readVersion: Long): Long = {
    val conf = new StateStoreConf(spark.sessionState.conf)
    val legacySchema = wrapped(legacyUserSchema)
    val currentSchema = wrapped(currentUserSchema)

    // createAndInit resolves the provider class from the session conf —
    // the default HDFSBackedStateStoreProvider (whose class itself is
    // private[sql]; the factory is the public seam)
    def open(checkpoint: String, schema: StructType): StateStoreProvider =
      StateStoreProvider.createAndInit(
        StateStoreProviderId(
          StateStoreId(s"$checkpoint/state", 0L, partition),
          java.util.UUID.randomUUID()),
        keySchema, schema, NoPrefixKeyStateEncoderSpec(keySchema),
        useColumnFamilies = false, conf, hc,
        useMultipleValuesPerKey = false, stateSchemaProvider = None)
    val reader = open(oldCheckpoint, legacySchema)
    val writer = open(newCheckpoint, currentSchema)
    try {
      val in = reader.getReadStore(readVersion)
      val out = writer.getStore(0L)
      val project = UnsafeProjection.create(currentSchema)
      val buf = new SpecificInternalRow(currentSchema)
      val userBuf = new SpecificInternalRow(currentUserSchema)
      var n = 0L
      try {
        val it = in.iterator()
        while (it.hasNext) {
          val pair = it.next()
          out.put(pair.key.copy(), convert(pair.value, project, buf, userBuf))
          n += 1
        }
        val committed = out.commit()
        require(committed == 1L,
          s"expected to commit state version 1, got $committed")
      } catch { case e: Throwable => out.abort(); throw e }
      finally in.release()
      n
    } finally { reader.close(); writer.close() }
  }

  private def convert(
      old: UnsafeRow,
      project: UnsafeProjection,
      buf: SpecificInternalRow,
      userBuf: SpecificInternalRow): UnsafeRow = {
    if (old.isNullAt(0)) buf.setNullAt(0)
    else {
      val legacy = old.getStruct(0, legacyUserSchema.length)
      val lastMs = legacy.getLong(1)
      // the unreached-stage sentinel predates the ms→µs move: scale
      // real stamps, pass sentinels through
      val lastUs =
        if (lastMs == Long.MinValue) Long.MinValue else lastMs * 1000L
      userBuf.setInt(0, legacy.getInt(0))
      userBuf.setLong(1, lastUs)
      userBuf.setLong(2, lastUs)
      buf.update(0, userBuf)
    }
    project(buf).copy()
  }

  private def committedBatches(fs: FileSystem, commits: Path): Seq[Long] =
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).toSeq.map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong)

  private def copyFile(
      fs: FileSystem, from: Path, to: Path, hc: Configuration): Unit = {
    require(fs.exists(from), s"missing checkpoint file $from")
    org.apache.hadoop.fs.FileUtil.copy(fs, from, fs, to, false, hc)
  }
}
