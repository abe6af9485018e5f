package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.operators.StateOps
import graft.queries.{ReferenceQueries, TrainingQueries}
import graft.xml.XmlProjections

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in [[graft.queries.ReferenceQueries]] (the
  * SURVEY §2 reference-derived operators) and
  * [[graft.queries.TrainingQueries]] (dedup / similarity / multimodal /
  * text-analysis extensions).
  */
object SparkEntry {

  /** Flagship: the reference's harvest pipeline end-to-end on sf0.001 —
    * synthesize OAI envelopes, project headers (P1), filter qucosa ids
    * (F1), merge into header state (U1), summarize (A2/F3). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val d = Tables.documents(spark, dir)
    val xml = concat(
      lit("<OAI-PMH><ListIdentifiers><header"),
      when(col("doc_id") % 4 === 0, lit(" status=\"deleted\"")).otherwise(lit("")),
      lit("><identifier>oai:example.org:"),
      when(col("doc_id") % 7 === 0,
        concat(lit("qucosa:"), col("doc_id").cast("string")))
        .otherwise(concat(lit("fedora-system:"), col("doc_id").cast("string"))),
      lit("</identifier><datestamp>2024-01-02T03:04:05Z</datestamp></header></ListIdentifiers></OAI-PMH>"))
    val headers = XmlProjections
      .projectOaiHeaders(d.select(col("doc_id"), xml.as("xml")), col("xml"))
      .filter(isQucosaId(col("record_identifier")))
      .select("record_identifier", "datestamp", "set_spec", "status_is_deleted")
    val state = headers.limit(0) // empty initial state, same schema
    val merged = StateOps.mergeByKey(state, headers, Seq("record_identifier"))
    merged.groupBy(col("status_is_deleted"))
      .agg(count(lit(1)).as("n_headers"))
  }

  /** One entry per implemented operator from SURVEY.md §2. Every query
    * configures the session first (timezone, nanos handling, custom
    * expression registration) so the map works on ANY caller-provided
    * session, not just our Verify/Bench mains. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (ReferenceQueries.queries ++ TrainingQueries.queries).map {
      case (name, fn) =>
        name -> ((s: SparkSession, dir: String) => {
          Tables.configure(s); fn(s, dir)
        })
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the xxhash64-based ops
    * (MinHash/SimHash/LSH) → driver records a rows-only check; those are
    * covered by planted-duplicate ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ TrainingQueries.oracles
}
