package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.pipeline.BucketedStateTable

/** DSv2 batch source over a [[graft.pipeline.BucketedStateTable]]
  * snapshot — the SQL-addressable face of the engine's big-state layout,
  * matching how the reference's users reach its tables in plain SQL
  * (`createSequencesAndTablesProductionDB.sql:19-89` defines them for
  * ad-hoc querying, not just the service).
  *
  * {{{
  * spark.read.format("graft-state").load("/state/oai_headers")
  * spark.read.format("graft-state").option("commit", 3).load(root)  // time travel
  * }}}
  *
  * Resolution happens ONCE at table load: the newest manifest (or the
  * `commit` option's) maps each bucket to the commit directory holding
  * its current rows, and the scan is a plain parquet scan of exactly
  * those directories — [[graft.pipeline.BucketedStateTable.read]]'s
  * one-consistent-snapshot semantics, now with the full DSv2 scan
  * machinery attached: filter pushdown, column pruning, and partition
  * coalescing all ride the built-in parquet path ([[ParquetTable]] is
  * the delegate), so `SELECT count(*)` or a keyed lookup over SQL plans
  * exactly like the library call would.
  *
  * Read-only by design: mutations go through the [[graft.pipeline.StateTable]]
  * trait, whose commit protocol (write lock, lease, manifest rename) is
  * what MAKES the snapshot this source resolves consistent. */
class GraftStateSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-state"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftStateSource.resolve(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    GraftStateSource.resolve(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object GraftStateSource {
  /** Manifest-resolved snapshot as a parquet-backed DSv2 table. */
  private[sources] def resolve(options: CaseInsensitiveStringMap): ParquetTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-state needs a path: spark.read.format(\"graft-state\").load(<table root>)"))
    val commit = Option(options.get("commit")).map(_.toLong)
    parquetTable(path, commit, options)
  }

  private[sources] def parquetTable(path: String, commit: Option[Long],
      options: CaseInsensitiveStringMap): ParquetTable = {
    val spark = SparkSession.active
    val paths = BucketedStateTable.snapshotPaths(
      spark.sessionState.newHadoopConf(), path, commit)
    if (paths.isEmpty)
      throw new IllegalArgumentException(
        s"graft-state table at $path has no committed snapshot" +
          commit.map(c => s" readable at commit $c").getOrElse(""))
    ParquetTable(s"graft-state `$path`", spark, options, paths,
      userSpecifiedSchema = None, fallbackFileFormat = classOf[ParquetFileFormat])
  }
}

/** Catalog plugin exposing a DIRECTORY of bucketed state tables to
  * plain SQL — every subdirectory of `root` that has published at least
  * one manifest is a table:
  *
  * {{{
  * spark.sql.catalog.graft_state      graft.sources.GraftStateCatalog
  * spark.sql.catalog.graft_state.root /state
  *
  * SELECT count(*) FROM graft_state.oai_headers;
  * SHOW TABLES IN graft_state;
  * }}}
  *
  * Each `loadTable` resolves the CURRENT newest manifest, so a new SQL
  * statement sees new commits while a running one keeps its snapshot.
  * Read-only: DDL/DML surface throws; state mutates through the
  * [[graft.pipeline.StateTable]] commit protocol only. */
class GraftStateCatalog extends TableCatalog {
  private var catalogName: String = _
  private var rootPath: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootPath = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root=<state directory>"))
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): Path =
    new Path((ident.namespace() :+ ident.name())
      .foldLeft(new Path(rootPath))((p, seg) => new Path(p, seg)).toString)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val spark = SparkSession.active
    val base = namespace.foldLeft(new Path(rootPath))((p, s) => new Path(p, s))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && fs.exists(new Path(s.getPath, "_commits")))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val spark = SparkSession.active
    val dir = tableDir(ident)
    val commits = BucketedStateTable.snapshotCommits(
      spark.sessionState.newHadoopConf(), dir.toString)
    if (commits.isEmpty) throw new NoSuchTableException(ident)
    GraftStateSource.parquetTable(dir.toString, None, CaseInsensitiveStringMap.empty())
  }

  override def tableExists(ident: Identifier): Boolean =
    BucketedStateTable.snapshotCommits(
      SparkSession.active.sessionState.newHadoopConf(),
      tableDir(ident).toString).nonEmpty

  private def readOnly(): Nothing = throw new UnsupportedOperationException(
    s"catalog $catalogName is read-only: graft state tables mutate through " +
      "the StateTable commit protocol (merge/deleteWhereUnmodified/" +
      "mergeOnceForBatch), which is what makes the snapshots this catalog " +
      "resolves consistent")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = readOnly()
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly()
  override def dropTable(ident: Identifier): Boolean = readOnly()
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly()
}
