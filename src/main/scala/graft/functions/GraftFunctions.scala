package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function library (SURVEY.md §2.4, SF1–SF9) — every helper is a
  * composition of codegen'd `org.apache.spark.sql.functions`, no UDFs.
  */
object GraftFunctions {

  /** SF1 — ISO-8601 timestamp parser covering the reference's "timestamp
    * zoo": `xsd:dateTime` with colon zone offset or `Z`
    * (reference `OaiHarvester.java:571-579`), Joda-tolerated *no-colon*
    * offsets like `2016-10-10T11:27:33+0200`
    * (reference `MetsProcessor.java:221-231`), zone-less local datetimes,
    * and date-only `2008-08-04` values
    * (reference test `MetsProcessorTest.java:178`).
    * First matching format wins; unparseable input yields null (caller
    * routes to a rejects sink, F2).
    */
  def tsParseIso8601(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),          // +02:00 / Z
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssxx")),           // +0200 (no colon)
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),      // millis + zone
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSxx")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),             // zone-less
    try_to_timestamp(c, lit("yyyy-MM-dd")))                        // date-only

  /** SF2 — FC3-compatible `from`-parameter format: *no* trailing `Z`
    * (reference `OaiHarvester.java:71-76` — Fedora Commons 3 shifts results
    * by a day when the spec-mandated `Z` is present). */
  def tsFormatFc3(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss")

  /** SF2 — spec-conforming UTC format with trailing `Z`
    * (reference `OaiHarvester.java:80-83`). */
  def tsFormatSpec(c: Column): Column =
    concat(date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), lit("Z"))

  /** SF4 — strip the `oai:` prefix and authority from an OAI identifier:
    * `oai:example.org:qucosa:7455` → `qucosa:7455`
    * (reference `MetsProcessor.java:285-287`:
    * `substring(indexOf(':', 4) + 1)`). EXACT reference semantics, byte
    * for byte with the driver-side
    * [[graft.pipeline.OaiRequestBuilder.localIdentifier]] — a
    * non-canonical id (`qucosa:7455`, no `oai:` prefix) yields the part
    * after its first `:` at/past index 4, and an id with no such colon
    * passes through WHOLE, where the previous regex form yielded `""`
    * for both. Column-side and driver-side ids must key identically or
    * enrichment joins silently drop rows. */
  def localId(c: Column): Column =
    // locate is 1-based: searching from position 5 = Java's
    // indexOf(':', 4); absent → 0 → substr(1) = the whole string,
    // exactly Java's substring(-1 + 1)
    c.substr(locate(":", c, 5) + lit(1), length(c))

  /** Java `String.trim()` semantics: strip ALL leading/trailing whitespace
    * incl. newlines/tabs (Spark's `trim` removes only 0x20 spaces). */
  def trimAll(c: Column): Column =
    regexp_replace(c, "^[\\s]+|[\\s]+$", "")

  /** SF5 — `StringUtils.isBlank` equivalent (null, empty, or whitespace;
    * reference usage e.g. `OaiHeader.java:48`, `OaiRunResult.java:89`). */
  def isBlank(c: Column): Column =
    c.isNull || trimAll(c) === ""

  def isNotBlank(c: Column): Column = !isBlank(c)

  /** SF6 — full-anchored regex match (Java `String.matches` semantics;
    * reference `QucosaDocumentFilter.java:27,38`). Spark's `rlike` is a
    * *find*, so anchor both ends. */
  def fullMatch(c: Column, pattern: String): Column =
    // ALWAYS wrap in a non-capturing group before anchoring: a bare
    // "^foo|bar$" lets top-level alternation escape the anchors
    // ("foobar baz" would match), and an escaped trailing \$ would be
    // mistaken for an existing anchor — String.matches semantics need
    // the whole pattern anchored as one unit
    c.rlike("^(?:" + pattern + ")$")

  /** F1 — the qucosa record-id predicate `.+qucosa:\d+`
    * (reference `QucosaDocumentFilter.java:27`). */
  def isQucosaId(c: Column): Column = fullMatch(c, ".+qucosa:\\d+")

  /** SF9 — `equalsIgnoreCase` (reference `OaiHarvester.java:541`). */
  def ciEquals(c: Column, value: String): Column =
    // Locale.ROOT: the default-locale toLowerCase breaks under tr/az
    // ("ID" -> dotless-i) while equalsIgnoreCase (the SF9 reference,
    // OaiHarvester.java:541) is locale-independent
    lower(c) === value.toLowerCase(java.util.Locale.ROOT)

  /** SF3 — absolute difference in milliseconds (clock-skew check,
    * reference `OaiHarvester.java:513-517`). */
  def absMillisBetween(a: Column, b: Column): Column =
    abs(tsEpochMillis(a) - tsEpochMillis(b))

  /** Epoch microseconds of a timestamp column, tolerant of TIMESTAMP_NTZ
    * inputs. `unix_micros`/`unix_millis` reject NTZ at analysis time, and
    * the driver's parquet testdata has shipped `ts` as NTZ micros in some
    * regenerations ([[graft.Tables.load]]); casting to TimestampType first
    * is value-identical under the UTC session TZ and a no-op for columns
    * already of TimestampType, so every `ts` consumer should go through
    * these instead of calling `unix_micros`/`unix_millis` directly. */
  def tsEpochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Epoch milliseconds; see [[tsEpochMicros]] for the NTZ rationale. */
  def tsEpochMillis(c: Column): Column = unix_millis(c.cast("timestamp"))
}
