package graft.pipeline

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import graft.model.OaiRunResult

/** S1 — `ListIdentifiers` request construction from the checkpoint
  * (reference `OaiHarvester.java:296-318`): a resumption token and the
  * `metadataPrefix`+`from` pair are mutually exclusive — mid-pagination
  * the token carries ALL request state.
  *
  * The `from` timestamp is formatted per SF2 (reference
  * `OaiHarvester.java:71-83`): Fedora Commons 3 has a bug where a
  * spec-conforming trailing `Z` shifts results by one day, so FC3 mode
  * omits it.
  */
object OaiRequestBuilder {

  private val Fc3Format =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)
  private val SpecFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(ZoneOffset.UTC)

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8.name())

  def formatFrom(ts: Timestamp, fc3CompatibilityMode: Boolean): String =
    (if (fc3CompatibilityMode) Fc3Format else SpecFormat).format(ts.toInstant)

  /** Low-level request assembly shared by the pipeline and the DSv2
    * connector — a token excludes `metadataPrefix`/`from` entirely. */
  def listIdentifiersUriRaw(
      baseUrl: String,
      resumptionToken: Option[String],
      metadataPrefix: String,
      fromFormatted: Option[String]): String = {
    val b = new StringBuilder(baseUrl)
    b.append(if (baseUrl.contains("?")) "&" else "?")
    b.append("verb=ListIdentifiers")
    resumptionToken match {
      case Some(t) =>
        b.append("&resumptionToken=").append(enc(t.trim))
      case None =>
        b.append("&metadataPrefix=").append(enc(metadataPrefix))
        fromFormatted.foreach(f => b.append("&from=").append(enc(f)))
    }
    b.toString
  }

  /** Build the harvest request URI for the state recorded in `lastRun`. */
  def listIdentifiersUri(
      baseUrl: String,
      lastRun: OaiRunResult,
      fc3CompatibilityMode: Boolean,
      metadataPrefix: String = "oai_dc"): String =
    listIdentifiersUriRaw(baseUrl,
      if (lastRun.hasResumptionToken) lastRun.resumptionToken else None,
      metadataPrefix,
      lastRun.nextFromTimestamp.map(formatFrom(_, fc3CompatibilityMode)))

  /** S2/SF4 — the local identifier of an OAI id: everything after the
    * first `:` at or past index 4 (reference `MetsProcessor.java:285-287`,
    * `oai:example.org:qucosa:7455` → `qucosa:7455`). */
  def localIdentifier(oaiId: String): String =
    oaiId.substring(oaiId.indexOf(':', "oai:".length) + 1)

  /** METS dissemination request from an already-LOCAL id — the ONE
    * place the `?`/`&` separator + URL-encoded `pid` assembly lives
    * ([[metsUri]] and `DocumentFetcher.mets` both compose through it,
    * so the two can never drift into the double-strip 404 their doc
    * comments warn about). */
  def metsUriFromLocal(baseUrl: String, localId: String): String = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    s"$baseUrl${sep}pid=${enc(localId)}"
  }

  /** METS dissemination request for one record, from the FULL OAI id
    * (reference `MetsProcessor.java:279-283`). NOT a `DocumentFetcher`
    * `urlFor`: the enrichment pipeline hands that function the LOCAL id
    * and this helper strips again — use `DocumentFetcher.mets`. */
  def metsUri(baseUrl: String, oaiId: String): String =
    metsUriFromLocal(baseUrl, localIdentifier(oaiId))
}
