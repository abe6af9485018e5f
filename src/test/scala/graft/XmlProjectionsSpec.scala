package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.functions.GraftFunctions._
import graft.xml.XmlProjections

/** Golden-fixture tests for P1–P4 against the reference's own test XML
  * (fixtures copied from `/root/reference/src/test/resources/{oai,mets}`,
  * Apache-2.0; expected values mirror `OaiHarvesterTest.java:91-155` and
  * `MetsProcessorTest.java:91-132`). */
class XmlProjectionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("P1: listIdentifiers.xml projects 2 headers with setSpec + deleted flag") {
    val df = XmlProjections.projectOaiHeaders(
      xmlDf(fixture("/oai/listIdentifiers.xml")), col("xml"))
    val rows = df.select("record_identifier", "datestamp", "set_spec",
      "status_is_deleted").orderBy("record_identifier").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "oai:example.org:qucosa:1044")
    assert(rows(0).getTimestamp(1) == ts("2014-05-06 17:33:25"))
    assert(rows(0).getSeq[String](2).isEmpty)
    assert(!rows(0).getBoolean(3))
    assert(rows(1).getString(0) == "oai:example.org:qucosa:1234")
    assert(rows(1).getSeq[String](2) == Seq("test:11", "test:22"))
    assert(rows(1).getBoolean(3))
  }

  test("F1: ListIdentifiersToFilter.xml — 13 headers, 6 qucosa ids survive") {
    val df = XmlProjections.projectOaiHeaders(
      xmlDf(fixture("/oai/ListIdentifiersToFilter.xml")), col("xml"))
    assert(df.count() == 13)
    assert(df.filter(isQucosaId(col("record_identifier"))).count() == 6)
  }

  test("P2: tri-state resumption token across the three envelope fixtures") {
    val df = XmlProjections.projectOaiEnvelope(
      xmlDf(
        fixture("/oai/listIdentifiers.xml"),        // no token element
        fixture("/oai/emptyResumptionToken.xml"),   // self-closed token
        fixture("/oai/resumptionToken.xml")),       // real token (whitespace-padded)
      col("xml"))
    val rows = df.select("id", "token_state", "resumption_token",
      "token_expiration", "response_date").orderBy("id").collect()
    assert(rows(0).getString(1) == "absent" && rows(0).isNullAt(2))
    assert(rows(1).getString(1) == "empty" && rows(1).getString(2) == "")
    assert(rows(2).getString(1) == "value")
    assert(rows(2).getString(2) == "111111111111111") // trimmed
    assert(rows(2).getTimestamp(3) == ts("2014-06-09 18:34:15"))
    assert(rows(0).getTimestamp(4) == ts("2014-06-08 11:43:00"))
  }

  test("P3: multipleErrors.xml yields a 4-entry code→message map") {
    val df = XmlProjections.projectOaiErrors(
      xmlDf(fixture("/oai/multipleErrors.xml")), col("xml"))
    val m = df.select("errors").head.getMap[String, String](0)
    assert(m.keySet == Set("badArgument", "badVerb",
      "cannotDisseminateFormat", "noSetHierarchy"))
  }

  test("P3/ST3: error fixtures carry their single codes") {
    val df = XmlProjections.projectOaiErrors(
      xmlDf(fixture("/oai/errorNoRecordsMatch.xml"),
        fixture("/oai/errorBadResumptionToken.xml")), col("xml"))
    val maps = df.orderBy("id").select("errors").collect()
      .map(_.getMap[String, String](0))
    assert(maps(0).keySet == Set("noRecordsMatch"))
    assert(maps(1).keySet == Set("badResumptionToken"))
  }

  test("P4: METS fixtures project (mandator, documentType, distributionDate)") {
    val df = XmlProjections.projectMets(
      xmlDf(
        fixture("/mets/qucosa7455-mets.xml"),
        fixture("/mets/qucosa13-mets.xml"),
        fixture("/mets/qucosa22-mets.xml"),
        fixture("/mets/qucosa31790-mets.xml")),
      col("xml"))
    val rows = df.select("id", "mandator", "document_type", "distribution_date")
      .orderBy("id").collect()
    // qucosa7455: slub / in_book / 2016-05-24T12:33:56+0200 → 10:33:56 UTC
    assert(rows(0).getString(1) == "slub")
    assert(rows(0).getString(2) == "in_book")
    assert(rows(0).getTimestamp(3) == ts("2016-05-24 10:33:56"))
    // qucosa13: SLUB / issue / 2008-08-04 (date-only)
    assert(rows(1).getString(1) == "SLUB")
    assert(rows(1).getString(2) == "issue")
    assert(rows(1).getTimestamp(3) == ts("2008-08-04 00:00:00"))
    // qucosa22: TU Dresden / issue
    assert(rows(2).getString(1) == "TU Dresden")
    assert(rows(2).getString(2) == "issue")
    // qucosa31790: slub / article / no-colon offset +0200
    assert(rows(3).getString(1) == "slub")
    assert(rows(3).getString(2) == "article")
    assert(rows(3).getTimestamp(3) == ts("2016-10-10 09:27:33"))
  }

  test("P1: a self-closing header does not swallow its sibling") {
    val page = "<OAI-PMH><ListIdentifiers>" +
      "<header status=\"deleted\"/>" +
      "<header><identifier>oai:x:qucosa:7</identifier>" +
      "<datestamp>2024-01-02T03:04:05Z</datestamp></header>" +
      "</ListIdentifiers></OAI-PMH>"
    val rows = XmlProjections.projectOaiHeaders(xmlDf(page), col("xml"))
      .select("record_identifier", "status_is_deleted")
      .orderBy(col("record_identifier").asc_nulls_first).collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == null && rows(0).getBoolean(1)) // the deleted stub
    assert(rows(1).getString(0) == "oai:x:qucosa:7" && !rows(1).getBoolean(1))
  }

  test("P1: text content containing '/>' inside quotes cannot truncate the fragment") {
    // the self-closing branch's catch-all must not consume a quote and
    // re-anchor on a later one — with plain [^>] the regex could span
    // '>content "' and terminate at a '/>' INSIDE text content (legal
    // raw XML), emitting a malformed truncated fragment and losing the
    // real header
    val page = "<OAI-PMH><ListIdentifiers>" +
      "<header attr=\"x\"><identifier>oai:x:qucosa:9</identifier>" +
      "<datestamp>2024-01-02T03:04:05Z</datestamp>" +
      "<setSpec>says \"quoted /> text\" here</setSpec></header>" +
      "</ListIdentifiers></OAI-PMH>"
    val rows = XmlProjections.projectOaiHeaders(xmlDf(page), col("xml"))
      .select("record_identifier").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "oai:x:qucosa:9",
      s"got ${rows.toSeq}")
  }

  test("P4: whitespace-padded METS values trim fully (Java trim semantics, not space-only)") {
    // real METS is pretty-printed: element text arrives newline/tab
    // padded, and the reference's Java trim() strips it all — a
    // "\n  slub\n" mandator must key as "slub"
    val padded =
      """<mets:mets xmlns:mets="http://www.loc.gov/METS/" xmlns:mods="http://www.loc.gov/mods/v3">
        |<mets:metsHdr><mets:agent ROLE="EDITOR"><mets:name>
        |	 slub
        |</mets:name></mets:agent></mets:metsHdr>
        |<mets:dmdSec><mods:mods><mods:originInfo eventType="distribution"><mods:dateIssued>2016-05-24</mods:dateIssued></mods:originInfo></mods:mods></mets:dmdSec>
        |<mets:structMap TYPE="LOGICAL"><mets:div TYPE="article"/></mets:structMap>
        |</mets:mets>""".stripMargin
    val row = XmlProjections.projectMets(xmlDf(padded), col("xml")).head
    assert(row.getAs[String]("mandator") == "slub",
      s"got '${row.getAs[String]("mandator")}'")
  }

  test("P4: namespace fidelity — identical local names in a foreign namespace do NOT match") {
    // Same element structure, wrong namespace URI: a local-name() match
    // would wrongly project these; the namespace-aware expression must not
    // (reference resolves real METS/MODS URIs, MetsProcessor.java:305-326).
    val foreign =
      """<m:mets xmlns:m="http://evil.example/NotMETS" xmlns:mods="http://evil.example/NotMODS">
        |<m:metsHdr><m:agent ROLE="EDITOR"><m:name>slub</m:name></m:agent></m:metsHdr>
        |<m:dmdSec><mods:mods><mods:originInfo eventType="distribution"><mods:dateIssued>2016-05-24</mods:dateIssued></mods:originInfo></mods:mods></m:dmdSec>
        |<m:structMap TYPE="LOGICAL"><m:div TYPE="article"/></m:structMap>
        |</m:mets>""".stripMargin
    val row = XmlProjections.projectMets(xmlDf(foreign), col("xml")).head
    assert(row.getAs[String]("mandator") == null)
    assert(row.getAs[String]("document_type") == null)
    assert(row.getAs[java.sql.Timestamp]("distribution_date") == null)
  }

  test("F2: incomplete METS (no agent) is dropped by validation") {
    val projected = XmlProjections.projectMets(
      xmlDf(fixture("/mets/qucosa31789-mets.xml")), col("xml"))
      .withColumn("record_identifier", lit("qucosa:31789"))
      .withColumn("header_last_modified",
        lit("2024-01-01 00:00:00").cast("timestamp"))
    assert(projected.count() == 1)
    assert(projected.head.getAs[String]("mandator") == null)
    assert(XmlProjections.validateReportingRow(projected).count() == 0)
  }
}
