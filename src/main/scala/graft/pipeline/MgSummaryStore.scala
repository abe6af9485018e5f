package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.ops.Sketches.MgSummary

/** Tiny persistent store for one Misra-Gries summary — the state behind
  * a streaming vocabulary monitor. A summary is ≤ k (item, weight)
  * pairs plus a total, so it lives as ONE driver-written text file per
  * version (`s%012d.tsv`, newest wins — the same versioned-publish
  * crash-safety as the bucketed manifest: a torn write is an orphan tmp
  * file, never a corrupt current version). No Spark jobs are involved
  * in reading or writing state; the distributed work is producing the
  * BATCH summary, which the caller merges in.
  *
  * Sketch merges are NOT idempotent (re-merging a batch double-counts —
  * unlike the engine's keyed merges), so [[updateOnceForBatch]] guards
  * each update with the same batch-marker discipline as
  * `StateTable.mergeOnceForBatch`: an at-least-once replay of a
  * committed micro-batch is a no-op and the accumulated summary
  * converges. */
class MgSummaryStore(spark: SparkSession, rootDir: String) {

  private val root = new Path(rootDir)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def lockKey = "mgstore:" + root.toString

  private def versions(): Seq[(Long, Path)] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.getPath.getName.matches("s\\d{12}\\.tsv"))
      .map(s => (s.getPath.getName.drop(1).dropRight(4).toLong, s.getPath))
      .sortBy(_._1)

  /** Newest stored summary, if any. */
  def read(): Option[MgSummary] = versions().lastOption.map { case (_, p) =>
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val total = lines.head.toLong
    val (items, weights) = lines.tail.map { l =>
      val i = l.lastIndexOf('\t')
      (l.substring(0, i), l.substring(i + 1).toLong)
    }.unzip
    MgSummary(total, items, weights)
  }

  /** Apply `update` to the stored summary and publish the result as the
    * next version — once per (batchId, streamScope); a replay returns
    * false and changes nothing. Serialized per store path in-JVM. */
  def updateOnceForBatch(batchId: Long, streamScope: String)(
      update: Option[MgSummary] => MgSummary): Boolean =
    MgSummaryStore.lockFor(lockKey).synchronized {
      BatchMarkers.runOnce(fs, root, batchId, streamScope) {
        val next = update(read())
        val nextId = versions().lastOption.map(_._1 + 1).getOrElse(1L)
        val tmp = new Path(root, f".tmp-s$nextId%012d")
        fs.mkdirs(root)
        val out = fs.create(tmp, true)
        try {
          val sb = new StringBuilder
          sb.append(next.total).append('\n')
          next.items.indices.foreach { i =>
            sb.append(next.items(i)).append('\t')
              .append(next.weights(i)).append('\n')
          }
          out.write(sb.toString.getBytes("UTF-8"))
        } finally out.close()
        val dest = new Path(root, f"s$nextId%012d.tsv")
        if (!fs.rename(tmp, dest))
          throw new IllegalStateException(s"summary publish lost a race at $dest")
        // keep a short history (time travel is not the point here)
        versions().dropRight(3).foreach { case (_, p) => fs.delete(p, false) }
      }
    }
}

object MgSummaryStore {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    locks.computeIfAbsent(path, _ => new Object)
}
