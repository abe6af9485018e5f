package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter for fast
    // local iteration (the driver always runs the full set). Trimmed and
    // VALIDATED: a typo'd or space-padded name matching nothing would
    // silently write zero outputs (the Bench.scala guard, same rationale)
    val only: Option[Set[String]] =
      if (args.length > 2)
        Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"filter names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.configure(spark)
    // ERROR, not WARN — same bounded-tail-capture protection as Bench.scala:
    // WindowExec WARN spam must not evict driver-visible output.
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // Write TIMESTAMP columns as timestamp_ntz so the parquet logical type
    // (isAdjustedToUTC=false) matches what DuckDB produces for the oracle —
    // values are identical under the pinned UTC session timezone.
    def ntz(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.foldLeft(df) {
        case (acc, f) if f.dataType == org.apache.spark.sql.types.TimestampType =>
          acc.withColumn(f.name, org.apache.spark.sql.functions.col(f.name)
            .cast(org.apache.spark.sql.types.TimestampNTZType))
        case (acc, _) => acc
      }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        Tables.dropCachedLeftovers(spark)
        try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // a REUSED outDir must not keep the previous round's passing
          // output for a now-failing query — the driver's compare would
          // silently report green on stale results; a missing directory
          // fails loudly instead
          try {
            val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
          } catch { case _: Throwable => () }
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The FULL oracle map is written even on a filtered run — a reused
    // outDir must never silently skip absent queries' oracle checks.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
