package graft.queries

import org.apache.spark.sql.SparkSession

/** Scratch-dir + catalog bookkeeping for query keys that build real
  * on-disk state per invocation (the u4–u7 state-table keys, the
  * incremental-index keys in [[TrainingQueries]]): a multi-trial bench
  * session must not accumulate temp dirs or catalog registrations.
  *
  * One JVM-wide scratch ROOT (swept by a shutdown hook), one DSv2
  * catalog registration per session (the CatalogManager instantiates a
  * plugin per NAME with its options pinned at first use — so the name
  * stays fixed and each trial gets a fresh TABLE under the fixed root
  * instead of a fresh catalog), and each trial deletes its key's
  * PREVIOUS scratch dir — safe because a trial's frame is fully
  * consumed (benched / verified) before the same key's next trial
  * starts, so at most one live dir per key ever exists. */
private[graft] object QueryScratch {
  private val counter = new java.util.concurrent.atomic.AtomicLong()
  private val last =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile private var rootDir: String = _

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  def root(): String = synchronized {
    if (rootDir == null) {
      rootDir = java.nio.file.Files
        .createTempDirectory("graft-query-scratch-").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRec(new java.io.File(rootDir))))
    }
    rootDir
  }

  /** Fresh scratch path for `key`, reaping the key's previous trial.
    * Returns (root, name) — the scratch dir is `root/name`. */
  def freshDir(key: String): (String, String) = {
    val r = root()
    val name = s"${key}_${counter.incrementAndGet()}"
    Option(last.put(key, name)).foreach(prev =>
      deleteRec(new java.io.File(r, prev)))
    (r, name)
  }

  /** [[freshDir]] joined to a single path — for keys that only need a
    * scratch directory, not a catalog-addressable table name. */
  def freshPath(key: String): String = {
    val (r, n) = freshDir(key)
    new java.io.File(r, n).toString
  }

  /** The session's (register-once) graft-state DSv2 catalog over
    * [[root]]. */
  def catalog(s: SparkSession): String = {
    val cat = "gdml_scratch"
    if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftStateCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root())
    }
    cat
  }
}
