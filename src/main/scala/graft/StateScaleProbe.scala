package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.StateOps
import graft.pipeline.BucketedStateTable

/** Inverted scale probes for the state-table platform — the two legs
  * `SCALE_PROBE_CDC.json` (corpus 100×, change volume fixed) cannot
  * see:
  *
  *  1. '''Change volume 100× against a FIXED corpus''': prices
  *     [[BucketedStateTable.changesBetween]]'s rewritten-bucket reads
  *     and [[StateOps.maintainSumCount]]'s group-delta shuffle as the
  *     CHANGED row count grows. Expected ~row-linear in changed rows,
  *     zero spill — the feed and the view refresh must cost what the
  *     change costs, never what the table costs.
  *
  *  2. '''Fixed-size SQL row-level DML against a 100× table''': a
  *     16-key MERGE + modulo UPDATE + modulo DELETE through the DSv2
  *     catalog against 1× and N× tables (256 buckets). The evidence is
  *     the manifests' own bucket pointers: the three statements
  *     rewrite only the buckets their keys hash into — a constant set
  *     — while the table grows N-fold around them. Wall time grows
  *     only with the SIZE of those matched buckets (the documented
  *     `numBuckets ≈ bytes / target-bucket` sizing rule's domain),
  *     never with the bucket COUNT the table holds.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  * sbt "runMain graft.StateScaleProbe"` → `SCALE_PROBE_CDC_VOL.json`.
  * Knobs: SPARK_GRAFT_PROBE_COPIES (DML table growth, default 100),
  * SPARK_GRAFT_PROBE_VOL (change-volume growth, default 100),
  * SPARK_GRAFT_CPUS. */
object StateScaleProbe {

  private def num(v: Double, digits: Int = 3): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))

  /** Bucket pointers of a manifest file (the plain-text `b=c` lines) —
    * read directly so the probe can diff layouts the way the feed
    * does, without private access. */
  private def manifestBuckets(path: java.io.File): Map[Int, Long] =
    scala.io.Source.fromFile(path, "UTF-8").getLines()
      .filter(l => l.nonEmpty && l.head.isDigit)
      .map { l => val Array(b, c) = l.split("=", 2); b.toInt -> c.toLong }
      .toMap

  private def manifests(root: String): Seq[java.io.File] =
    Option(new java.io.File(s"$root/_commits").listFiles()).toSeq.flatten
      .filter(_.getName.matches("c\\d+\\.txt")).sortBy(_.getName)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "100").toInt.max(2)
    val volFactor = sys.env.getOrElse("SPARK_GRAFT_PROBE_VOL", "100").toInt.max(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = BenchMetrics.install(spark.sparkContext)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-stateprobe-").toString

    def timed[A](body: => A): (A, Double, BenchMetrics.Snapshot) = {
      Tables.dropCachedLeftovers(spark)
      metrics.reset()
      val t0 = System.nanoTime()
      val a = body
      ((a, (System.nanoTime() - t0) / 1e9,
        metrics.snapshot(spark.sparkContext)))
    }

    // ── leg 1: change volume grows, corpus fixed ──────────────────────
    // One table per volume point, both seeded with the SAME corpus;
    // the change batch touches `vol` keys (2/3 value updates, 1/3
    // deletes via applyDelta) — the diff and the view refresh are then
    // timed in isolation against retained commits.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val nDocs = docs.count()
    val baseVol = math.max(20L, nDocs / (volFactor.toLong * 10L))
    def cdcLeg(tag: String, vol: Long): String = {
      val root = s"$scratch/cdc_$tag"
      val t = new BucketedStateTable(spark, root,
        keyCols = Seq("doc_id"), numBuckets = 64,
        keepCommits = 10, retentionFloorMillis = 0L)
      t.merge(docs, keys = Seq("doc_id"))
      val c1 = t.commits().last
      // the maintained view EXISTS before pricing starts — collected to
      // the driver and rebuilt as a local frame (a per-lang aggregate,
      // a handful of rows) because the timed legs run
      // dropCachedLeftovers, which would evict a localCheckpoint
      val shaped = StateOps.aggregateShape(t.readAt(c1).get,
        Seq("lang"), "n_chars")
      val agg0 = spark.createDataFrame(
        java.util.Arrays.asList(shaped.collect(): _*), shaped.schema)
      val touched = docs.filter(col("doc_id") % lit(nDocs / vol) === 0)
      t.merge(touched.filter(col("doc_id") % 3 =!= 0)
          .withColumn("n_chars", col("n_chars") + 1000L),
        keys = Seq("doc_id"))
      t.applyDelta(upserts = docs.limit(0),
        deleteKeys = touched.filter(col("doc_id") % 3 === 0)
          .select("doc_id"),
        keys = Seq("doc_id"))
      val c2 = t.commits().last
      val (nChanges, cdcSec, cdcSnap) = timed {
        t.changesBetween(c1, c2).write.format("noop").mode("overwrite").save()
        t.changesBetween(c1, c2).count()
      }
      val (_, ivmSec, ivmSnap) = timed {
        StateOps.maintainSumCount(agg0, t.changesBetween(c1, c2),
            Seq("lang"), "n_chars")
          .write.format("noop").mode("overwrite").save()
      }
      s""""$tag":{"changed_keys":$vol,"change_rows":$nChanges,""" +
        s""""cdc_sec":${num(cdcSec)},"cdc_resources":${cdcSnap.json},""" +
        s""""ivm_sec":${num(ivmSec)},"ivm_resources":${ivmSnap.json}}"""
    }
    val cdc1 = cdcLeg("vol_1x", baseVol)
    val cdcN = cdcLeg(s"vol_${volFactor}x", baseVol * volFactor)

    // ── leg 2: fixed DML, table grows `copies`-fold ───────────────────
    // The N× table reuses ScaleProbe's divergent-copy corpus (id
    // stride keeps the fixed DML window copy-0-only). 256 buckets so
    // the 16-key statements touch a SMALL constant subset — the
    // manifest pointer diff is the rewrite evidence.
    def dmlLeg(tag: String, nCopies: Int): String = {
      val dataDir = s"$scratch/corpus_$tag"
      ScaleProbe.materialize(spark, sfDir, dataDir, nCopies)
      val d = Tables.documents(spark, dataDir)
        .select(col("doc_id"), col("n_chars"))
      val root = s"$scratch/dml_$tag"
      val t = new BucketedStateTable(spark, root,
        keyCols = Seq("doc_id"), numBuckets = 256,
        keepCommits = 10, retentionFloorMillis = 0L)
      t.merge(d, keys = Seq("doc_id"))
      val rows = t.read().get.count()
      val preManifests = manifests(root).length
      val cat = "gprobe_" + tag
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftStateCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", scratch)
      d.filter(col("doc_id").between(150, 165))
        .createOrReplaceTempView("probe_src")
      val (_, dmlSec, dmlSnap) = timed {
        spark.sql(
          s"""MERGE INTO $cat.dml_$tag t USING probe_src s ON t.doc_id = s.doc_id
             |WHEN MATCHED AND s.doc_id % 5 = 0 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars + 1000000
             |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars) VALUES (s.doc_id, s.n_chars)
             |""".stripMargin)
        spark.sql(s"UPDATE $cat.dml_$tag SET n_chars = CAST(0 AS BIGINT) " +
          "WHERE doc_id BETWEEN 200 AND 207")
        spark.sql(s"DELETE FROM $cat.dml_$tag WHERE doc_id BETWEEN 300 AND 303")
      }
      // rewrite evidence: pointers changed between the pre-DML manifest
      // and the final one — the union of the three statements' dirty
      // buckets, out of 256
      val ms = manifests(root)
      val before = manifestBuckets(ms(preManifests - 1))
      val after = manifestBuckets(ms.last)
      val rewritten = (before.keySet ++ after.keySet)
        .count(b => before.get(b) != after.get(b))
      s""""$tag":{"table_rows":$rows,"dml_sec":${num(dmlSec)},""" +
        s""""buckets_rewritten":$rewritten,"buckets_total":256,""" +
        s""""dml_resources":${dmlSnap.json}}"""
    }
    val dml1 = dmlLeg("x1", 1)
    val dmlN = dmlLeg(s"x$copies", copies)

    // ── leg 3: splitBuckets at table scale ────────────────────────────
    // The split is a full rewrite (priced here, honestly linear in
    // table size) — the CLAIM under test is what follows: a
    // cross-boundary diff of one small post-split change stays
    // bucket-pruned (reads one parent + its children, never the
    // table), so CDC consumers pay change-volume cost through a
    // relayout of ANY size.
    def splitLeg(tag: String, nCopies: Int): String = {
      val dataDir = s"$scratch/corpus_$tag" // reuses dmlLeg's corpus
      val d = Tables.documents(spark, dataDir)
        .select(col("doc_id"), col("n_chars"))
      val root = s"$scratch/split_$tag"
      val t = new BucketedStateTable(spark, root,
        keyCols = Seq("doc_id"), numBuckets = 64,
        keepCommits = 10, retentionFloorMillis = 0L)
      t.merge(d, keys = Seq("doc_id"))
      val rows = t.read().get.count()
      val preSplit = t.commits().last
      val (t2, splitSec, splitSnap) = timed { t.splitBuckets(2) }
      t2.merge(d.filter(col("doc_id").between(150, 165))
        .withColumn("n_chars", col("n_chars") + 1L), keys = Seq("doc_id"))
      val (nDiff, diffSec, diffSnap) = timed {
        val diff = t2.changesBetween(preSplit, t2.commits().last)
        diff.write.format("noop").mode("overwrite").save()
        diff.count()
      }
      s""""$tag":{"table_rows":$rows,"split_sec":${num(splitSec)},""" +
        s""""split_resources":${splitSnap.json},""" +
        s""""cross_diff_rows":$nDiff,"cross_diff_sec":${num(diffSec)},""" +
        s""""cross_diff_resources":${diffSnap.json}}"""
    }
    val split1 = splitLeg("x1", 1)
    val splitN = splitLeg(s"x$copies", copies)

    val json =
      s"""{"base_sf_dir":"$sfDir","vol_factor":$volFactor,"copies":$copies,""" +
        s""""note":"leg cdc_volume: FIXED corpus ($nDocs docs, 64 buckets), change volume grows - prices changesBetween rewritten-bucket reads and maintainSumCount group-delta shuffle by CHANGED rows; leg sql_dml: fixed 16-key MERGE/UPDATE/DELETE vs a table grown by divergent copies (256 buckets) - manifest pointer diff counts the rewritten buckets",""" +
        s""""cdc_volume":{$cdc1,$cdcN},"sql_dml":{$dml1,$dmlN},""" +
        s""""split_at_scale":{$split1,$splitN}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_PROBE_CDC_VOL.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    try {
      val rp = new org.apache.hadoop.fs.Path(scratch)
      rp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(rp, true)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
