package graft.xml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.functions.GraftFunctions._

/** P1–P4 — semi-structured → structured XML projections (SURVEY.md §2.2)
  * over a string payload column, each parsing every document exactly
  * once: `from_xml` with a struct schema for the repeated-element shapes
  * (P1 headers, P3 errors) and the namespace-aware multi-path expression
  * [[graft.expressions.XPathStructNs]] for the scalar projections
  * (P2 envelope incl. the tri-state token, P4 METS fields with real
  * namespace URIs).
  */
object XmlProjections {

  /** P1 — `//header` rows from an OAI-PMH `ListIdentifiers` envelope
    * (reference `OaiHarvester.java:528-564`).
    *
    * A flat `xpath` over the whole envelope would mis-align the per-header
    * repeated `setSpec` elements and optional `status` attributes, so the
    * envelope is first sliced into one row per `<header>` fragment (the
    * fragments are self-contained XML — element names carry no prefixes),
    * then each fragment is projected independently. Slicing + projection
    * are narrow, fully codegen'd operations — no shuffle.
    *
    * Output columns: `record_identifier`, `datestamp`, `set_spec`,
    * `status_is_deleted` (the `status` attribute is compared
    * case-insensitively to "deleted", reference `OaiHarvester.java:541`).
    */
  def projectOaiHeaders(df: DataFrame, xmlCol: Column): DataFrame = {
    // Self-closing branch FIRST: with the lazy full-element branch first,
    // a '<header .../>'' would match across element boundaries up to the
    // NEXT '</header>', swallowing a sibling header into one malformed
    // fragment. The lookahead pins the element name exactly.
    val frag = explode(
      call_function("regexp_extract_all", xmlCol,
        // attribute values may legally contain '>' — consume quoted
        // runs atomically so a '>' inside quotes cannot end the tag
        lit("<header(?=[\\s/>])(?:\"[^\"]*\"|'[^']*'|[^>\"'])*/>|<header(?=[\\s>])[\\s\\S]*?</header>"),
        lit(0)))
    // One from_xml parse per fragment (vs 4 xpath parses): the header
    // struct is materialized in its own projection and field-projected.
    val headerSchema = StructType(Seq(
      StructField("identifier", StringType),
      StructField("datestamp", StringType),
      StructField("setSpec", ArrayType(StringType)),
      StructField("_status", StringType)))
    df.select(df.columns.map(col).toSeq :+ frag.as("__frag"): _*)
      .withColumn("__h", from_xml(col("__frag"), headerSchema))
      .select(
        col("*"),
        col("__h.identifier").as("record_identifier"),
        tsParseIso8601(col("__h.datestamp")).as("datestamp"),
        coalesce(col("__h.setSpec"), array()).as("set_spec"),
        ciEquals(coalesce(col("__h._status"), lit("")), "deleted")
          .as("status_is_deleted"))
      .drop("__frag", "__h")
  }

  /** P2 — envelope scalars with the tri-state resumption token
    * (reference `OaiHarvester.java:473-519`):
    *
    *   - token node absent        → `token_state='absent'`,  token null
    *   - token node empty         → `token_state='empty'`,   token ''
    *   - token node has a value   → `token_state='value'`,   token trimmed
    *
    * Fully codegen'd StAX path (no per-row DOM walk — the r1 DOM
    * expression made P2 ~9× slower than its `from_xml` sibling P1):
    * `responseDate` comes from ONE `from_xml` parse of the envelope, and
    * the token element is sliced out with the same fragment regex P1
    * uses, which preserves the tri-state that `xpath_string` collapses
    * (absent and empty both → `''`, SURVEY §7.4): a missing fragment is
    * SQL null = 'absent', a parsed fragment with no text is 'empty'.
    * The OAI envelope paths are namespace-free element names, matching
    * the reference's namespace-unaware parse — the namespace-aware DOM
    * expression [[graft.expressions.XPathStructNs]] is reserved for P4,
    * where real METS/MODS namespace URIs are the point.
    */
  def projectOaiEnvelope(df: DataFrame, xmlCol: Column): DataFrame = {
    val envSchema = StructType(Seq(StructField("responseDate", StringType)))
    val tokSchema = StructType(Seq(
      StructField("_VALUE", StringType),
      StructField("_expirationDate", StringType)))
    // Self-closing branch FIRST (same pitfall as the P1 fragment regex)
    val frags = call_function("regexp_extract_all", xmlCol,
      lit("<resumptionToken(?=[\\s/>])(?:\"[^\"]*\"|'[^']*'|[^>\"'])*/>|<resumptionToken(?=[\\s>])[\\s\\S]*?</resumptionToken>"),
      lit(0))
    val tokText = trimAll(col("__tok._VALUE"))
    df.withColumn("__env", from_xml(xmlCol, envSchema))
      .withColumn("__frag", get(frags, lit(0))) // null ⇔ token absent
      .withColumn("__tok", from_xml(col("__frag"), tokSchema))
      .withColumn("response_date", tsParseIso8601(col("__env.responseDate")))
      .withColumn("resumption_token",
        when(col("__frag").isNotNull, coalesce(tokText, lit(""))))
      .withColumn("token_state",
        when(col("__frag").isNull, lit("absent"))
          .when(coalesce(tokText, lit("")) === "", lit("empty"))
          .otherwise(lit("value")))
      .withColumn("token_expiration",
        tsParseIso8601(col("__tok._expirationDate")))
      .drop("__env", "__frag", "__tok")
  }

  /** P3 — OAI error elements → `map(code → message)`
    * (reference `OaiHarvester.java:446-471`). */
  def projectOaiErrors(df: DataFrame, xmlCol: Column): DataFrame = {
    // OAI errors are direct children of the envelope root; one from_xml
    // parse replaces two xpath parses. Absent errors → empty map (the
    // reference builds an empty map, OaiHarvester.java:448).
    val errSchema = StructType(Seq(
      StructField("error", ArrayType(StructType(Seq(
        StructField("_VALUE", StringType),
        StructField("_code", StringType)))))))
    // the OAI spec allows REPEATED error codes and map_from_arrays
    // throws on duplicate (or null) keys under the default dedup
    // policy — replicate the reference's Map.put last-wins instead:
    // walk the entries REVERSED keeping each code's first (= last in
    // document order) occurrence, after dropping code-less entries
    val entryType = "array<struct<_VALUE:string,_code:string>>"
    val withCode = filter(col("__e.error"), e => e.getField("_code").isNotNull)
    val lastWins = aggregate(
      reverse(withCode),
      array().cast(entryType),
      (acc, e) => when(
        exists(acc, x => x.getField("_code") === e.getField("_code")), acc)
        .otherwise(array_append(acc, e)))
    df.withColumn("__e", from_xml(xmlCol, errSchema))
      .withColumn("errors",
        coalesce(
          map_from_arrays(
            transform(lastWins, e => e.getField("_code")),
            transform(lastWins, e => e.getField("_VALUE"))),
          map_from_arrays(array(), array())))
      .drop("__e")
  }

  /** P4 — the three reporting fields from a METS/MODS document, with the
    * reference's EXACT namespace-resolved XPaths
    * (`MetsProcessor.java:67-69,81-85`) via the custom namespace-aware
    * projection expression [[graft.expressions.XPathStructNs]] — one DOM
    * parse per document, all three fields evaluated on it (Spark's
    * built-in `xpath_*` is namespace-unaware and re-parses per call).
    *
    * `distribution_date` uses the SF1 multi-format parser (no-colon zone
    * offsets and date-only values appear in real METS,
    * reference `MetsProcessorTest.java:178,262-306`).
    */
  def projectMets(df: DataFrame, xmlCol: Column): DataFrame = {
    val struct = call_function("graft_xpath_struct", xmlCol,
      array(lit("mandator"), lit("document_type"), lit("distribution_date")),
      array(
        lit("//mets:metsHdr/mets:agent[@ROLE='EDITOR']/mets:name"),
        lit("//mets:structMap[@TYPE='LOGICAL']/mets:div/@TYPE"),
        lit("//mods:originInfo[@eventType='distribution']/mods:dateIssued")),
      array(lit("mets"), lit("mods")),
      array(lit("http://www.loc.gov/METS/"), lit("http://www.loc.gov/mods/v3")))
    df.withColumn("__mets", struct)
      .withColumn("mandator", blankToNull(col("__mets.mandator")))
      .withColumn("document_type", blankToNull(col("__mets.document_type")))
      .withColumn("distribution_date",
        tsParseIso8601(col("__mets.distribution_date")))
      .drop("__mets")
  }

  /** F2 — required-field validation: rows with any blank/null reporting
    * field are dropped (the reference rejects them at construction,
    * `ReportingDocumentMetadata.java:49-58`; drop-with-log on parse
    * failure, `MetsProcessor.java:212-218`). */
  def validateReportingRow(df: DataFrame): DataFrame =
    df.filter(
      isNotBlank(col("record_identifier")) &&
      isNotBlank(col("mandator")) &&
      isNotBlank(col("document_type")) &&
      col("distribution_date").isNotNull &&
      col("header_last_modified").isNotNull)

  // trimAll, not Spark's space-only trim: the reference's Java trim()
  // strips newlines/tabs too, and METS values arrive pretty-printed —
  // a "\n  Acme\n" mandator must key as "Acme"
  private def blankToNull(c: Column): Column =
    when(trimAll(c) =!= "", trimAll(c))
}
