package graft.model

import java.sql.Timestamp

/** Typed row models mirroring the reference's three fixed schemas
  * (SURVEY.md §1; reference DDL
  * `src/main/db/createSequencesAndTablesProductionDB.sql:19-89`).
  *
  * Value semantics (equals/hashCode) come free from case classes, matching
  * the reference's hand-written value classes
  * (`fedora/oai/OaiHeader.java:96-147`, `fedora/oai/OaiRunResult.java:133-221`).
  */

/** One OAI record header — the work-queue row
  * (reference `fedora/oai/OaiHeader.java:29-59`).
  * `setSpec` may be empty but never null; `recordIdentifier` non-blank.
  */
case class OaiHeader(
    recordIdentifier: String,
    datestamp: Timestamp,
    setSpec: Seq[String],
    statusIsDeleted: Boolean)

/** One harvest-run checkpoint row
  * (reference `fedora/oai/OaiRunResult.java:30-108`).
  *
  * `resumptionToken` is tri-state (reference `OaiRunResult.java:60-65`):
  *   None        — response contained no resumptionToken element
  *   Some("")    — response contained an *empty* token (end of paginated list)
  *   Some(value) — mid-pagination
  */
case class OaiRunResult(
    id: Long,
    timestampOfRun: Timestamp,
    responseDate: Timestamp,
    resumptionToken: Option[String],
    resumptionTokenExpirationDate: Option[Timestamp],
    nextFromTimestamp: Option[Timestamp]) {

  /** Non-blank token ⇒ pagination in progress
    * (reference `OaiRunResult.java:124-131`). */
  def hasResumptionToken: Boolean =
    resumptionToken.exists(_.trim.nonEmpty)
}

/** One reporting-output row, all fields required
  * (reference `fedora/mets/ReportingDocumentMetadata.java:23-65`). */
case class ReportingDocumentMetadata(
    recordIdentifier: String,
    mandator: String,
    documentType: String,
    distributionDate: Timestamp,
    headerLastModified: Timestamp)

/** Scalars projected from one OAI-PMH response envelope (SURVEY.md §1.4). */
case class ParsedPage(
    responseDate: Option[Timestamp],
    resumptionToken: Option[String],
    resumptionTokenExpirationDate: Option[Timestamp],
    errors: Map[String, String])
