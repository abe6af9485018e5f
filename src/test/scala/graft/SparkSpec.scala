package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM — sbt forks one
  * test JVM, so every suite reuses the same session). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.configure(s)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"

  def fixture(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource(path).toURI)), "UTF-8")
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sf0001: String = SparkSpec.Sf0001
  def fixture(path: String): String = SparkSpec.fixture(path)
  def xmlDf(xmls: String*): DataFrame = {
    val s = spark
    import s.implicits._
    xmls.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "xml")
  }
}
