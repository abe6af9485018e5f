package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a DataSource V2 connector: `spark.read.format("oai-pages")` /
  * `spark.readStream.format("oai-pages")` yields one row per OAI
  * `ListIdentifiers` page — `(page_index, request_uri, xml)` — following
  * the resumption-token chain exactly like the reference's harvest loop
  * (`OaiHarvester.java:239-269,304-318`).
  *
  * Page fetching is inherently sequential (each request URI depends on
  * the previous page's token), so the DRIVER walks the chain at planning
  * time and ships page bodies to executors as input partitions; all
  * downstream work (P1 projection, filtering, merging) is distributed.
  * In streaming mode each trigger advances the chain by up to
  * `maxPagesPerTrigger` pages; the offset is the count of pages consumed
  * (Structured Streaming replays uncommitted batches from the cache —
  * the engine-side half of ST4's at-least-once contract).
  *
  * Options:
  *   - `url` (required): OAI endpoint base URL
  *   - `metadataPrefix` (default `oai_dc`), `from` (optional; passed
  *     through verbatim — format it per the server's grammar, e.g. with
  *     `OaiRequestBuilder`'s FC3 dual format)
  *   - `maxPages` (batch, default 100), `maxPagesPerTrigger` (streaming,
  *     default 10)
  *   - `fetcher`: name of a transport registered via
  *     [[OaiPageSource.registerFetcher]] (tests, custom HTTP stacks);
  *     defaults to [[OaiPageSource.httpFetch]] — `HttpURLConnection`
  *     with timeouts + status handling for http/https, plain stream
  *     open for other schemes (e.g. `file:` fixtures)
  *   - `connectTimeoutMs` (default 10000), `readTimeoutMs` (default
  *     30000) — timeouts for the default transport
  */
class OaiPageSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "oai-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OaiPageSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OaiPageTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object OaiPageSource {
  val Schema: StructType = StructType(Seq(
    StructField("page_index", LongType, nullable = false),
    StructField("request_uri", StringType, nullable = false),
    StructField("xml", StringType, nullable = false)))

  /** URI → page body; None = transport failure (run skipped, reference
    * `OaiHarvester.java:253-264`). */
  type Fetch = String => Option[String]

  private val fetchers = new ConcurrentHashMap[String, Fetch]()

  /** Register a named transport (in-JVM; for tests and custom clients). */
  def registerFetcher(name: String, fetch: Fetch): Unit =
    fetchers.put(name, fetch)

  /** The default real-socket transport: `HttpURLConnection` with explicit
    * connect/read timeouts and status handling — the same failure surface
    * the reference's `CloseableHttpClient` loop distinguishes
    * (`OaiHarvester.java:239-269`: non-200 or transport error ⇒ failed
    * run, never a silently-empty page). Non-http(s) URIs (e.g. `file:`
    * fixtures) fall back to a plain stream open. Any failure maps to
    * None; the chain walker decides whether that fails the batch or ends
    * the trigger. */
  def httpFetch(uri: String, connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000): Option[String] =
    try {
      val url = new java.net.URI(uri).toURL
      url.openConnection() match {
        case http: java.net.HttpURLConnection =>
          http.setConnectTimeout(connectTimeoutMs)
          http.setReadTimeout(readTimeoutMs)
          http.setRequestProperty("Accept", "text/xml, application/xml")
          try {
            if (http.getResponseCode != 200) None
            else {
              val in = http.getInputStream
              try Some(new String(in.readAllBytes(), "UTF-8"))
              finally in.close()
            }
          } finally http.disconnect()
        case conn =>
          // same timeout discipline as the HTTP branch: a hung stream
          // (stale NFS file: mount) must not wedge the DRIVER forever —
          // the chain walks inside planInputPartitions/latestOffset
          conn.setConnectTimeout(connectTimeoutMs)
          conn.setReadTimeout(readTimeoutMs)
          val in = conn.getInputStream
          try Some(new String(in.readAllBytes(), "UTF-8"))
          finally in.close()
      }
    } catch {
      // fetch misses are retryable (the ST3 error policy upstream) —
      // but ONLY genuinely non-fatal ones: an interrupt during the
      // driver-side chain walk is a cancellation, and mapping it to
      // None would clear the flag and keep walking instead of honoring
      // the stop; re-assert it and let the walk unwind
      case _: InterruptedException | _: java.io.InterruptedIOException =>
        Thread.currentThread().interrupt()
        None
      case scala.util.control.NonFatal(_) => None
    }

  private[sources] def resolveFetcher(options: CaseInsensitiveStringMap): Fetch =
    Option(options.get("fetcher")) match {
      case Some(name) =>
        Option(fetchers.get(name)).getOrElse(
          throw new IllegalArgumentException(s"no fetcher registered as '$name'"))
      case None =>
        val connectMs = options.getInt("connectTimeoutMs", 10000)
        val readMs = options.getInt("readTimeoutMs", 30000)
        uri => httpFetch(uri, connectMs, readMs)
    }

  /** Walk the resumption-token chain from `state`, fetching up to `max`
    * pages. Returns fetched (uri, xml) pages plus the next chain state
    * (None = chain exhausted). Driver-side by necessity: request N+1
    * depends on page N's token. */
  private[sources] def fetchChain(
      options: CaseInsensitiveStringMap,
      state: Option[ChainState],
      max: Int,
      failOnFetchError: Boolean = false): (Seq[(String, String)], Option[ChainState]) = {
    val fetch = resolveFetcher(options)
    val base = Option(options.get("url")).getOrElse(
      throw new IllegalArgumentException("oai-pages requires option 'url'"))
    val prefix = options.getOrDefault("metadataPrefix", "oai_dc")
    val from = Option(options.get("from"))

    var cur = state.getOrElse(ChainState(firstRequest = true, token = None))
    val out = Seq.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < max && !done) {
      if (!cur.firstRequest && cur.token.isEmpty) { done = true }
      else {
        val uri = graft.pipeline.OaiRequestBuilder.listIdentifiersUriRaw(
          base, cur.token, prefix, from)
        fetch(uri) match {
          case None if failOnFetchError =>
            // batch semantics: a mid-chain transport failure must FAIL
            // the read — returning fewer pages would be silent truncation
            // indistinguishable from a complete harvest (the reference
            // treats HTTP failure as a failed run, OaiHarvester.java:253-264)
            throw new java.io.IOException(
              s"oai-pages: transport failure fetching $uri after $n page(s); " +
                "failing the batch read rather than returning a silently " +
                "truncated page set")
          case None => done = true // streaming: stop here, retry next trigger
          case Some(xml) =>
            // An OAI-level error page (HTTP 200, <error code=...>) ends
            // the chain (it never carries a token). MID-chain that means
            // the token expired or the server lost the cursor — in batch
            // mode that is the same silent truncation the transport
            // branch above refuses: fewer pages than the harvest has,
            // indistinguishable from completion. A FIRST-page error
            // (noRecordsMatch on an empty selection) is a legitimate
            // one-page result and flows through for the consumer's
            // error policy (P3) to project.
            val errCode = errorCode(xml)
            if (failOnFetchError && n > 0 && errCode.isDefined)
              throw new java.io.IOException(
                s"oai-pages: OAI error '${errCode.get}' at $uri after $n " +
                  "successful page(s) — the resumption chain broke " +
                  "mid-harvest; failing the batch read rather than " +
                  "returning a silently truncated page set")
            out += ((uri, xml))
            n += 1
            cur = ChainState(firstRequest = false, token = extractToken(xml))
        }
      }
    }
    (out.result(), if (cur.firstRequest || cur.token.nonEmpty) Some(cur) else None)
  }

  /** Resumption token of a page (trimmed); None when absent or empty —
    * either way the chain ends (P2's tri-state matters for checkpoint
    * semantics, not for pagination). */
  private[graft] def extractToken(xml: String): Option[String] = {
    val m = "<resumptionToken[^>]*>([\\s\\S]*?)</resumptionToken>".r
      .findFirstMatchIn(xml)
    // UNESCAPE before reuse: the token is XML text content, so a server
    // token like 'offset=100&set=x' arrives as 'offset=100&amp;set=x' —
    // resending the escaped form corrupts the next request and the
    // server answers badResumptionToken (the from_xml pipeline path
    // unescapes automatically; this regex path must match it)
    m.map(t => xmlUnescape(t.group(1).trim)).filter(_.nonEmpty)
  }

  /** The five predefined XML entities plus numeric character
    * references — everything a well-formed document can escape in text
    * content without a DTD.
    *
    * One left-to-right pass over a single alternation, so replacement
    * text is never rescanned: `&#38;lt;` yields `&lt;` (not `<`), same
    * as `&amp;lt;`. The digit run is bounded at 8 and the expansion is
    * `Try`-guarded — an overflowing (`&#99999999999;`) or out-of-range
    * (`> 0x10FFFF`) reference from a malformed server page is left
    * VERBATIM instead of throwing on the driver mid-chain-walk. */
  private[graft] val XmlEntityRe =
    "&(#(x?)([0-9a-fA-F]{1,8})|lt|gt|quot|apos|amp);".r

  private[graft] def xmlUnescape(s: String): String =
    XmlEntityRe.replaceAllIn(s, m => {
      val rep = m.group(1) match {
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case "amp" => "&"
        case _ =>
          scala.util.Try {
            val cp = Integer.parseInt(m.group(3),
              if (m.group(2).isEmpty) 10 else 16)
            new String(Character.toChars(cp)) // throws when cp > 0x10FFFF
          }.getOrElse(m.matched)
      }
      java.util.regex.Matcher.quoteReplacement(rep)
    })

  /** OAI protocol error code of a page, when the page is an error
    * response (`<error code="...">`). */
  private[graft] def errorCode(xml: String): Option[String] =
    "<error[^>]*\\scode=\"([^\"]+)\"".r.findFirstMatchIn(xml).map(_.group(1))
}

private[sources] case class ChainState(firstRequest: Boolean, token: Option[String])

private[sources] class OaiPageTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  // batch memo — see OaiPageBatch.planInputPartitions: one chain walk
  // per loaded table, however many actions consume the DataFrame
  @volatile private[sources] var fetchedOnce: Array[InputPartition] = _
  override def name(): String = s"oai-pages(${options.get("url")})"
  override def schema(): StructType = OaiPageSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new OaiPageScan(opts, this)
}

private[sources] class OaiPageScan(options: CaseInsensitiveStringMap,
    table: OaiPageTable) extends Scan {
  override def readSchema(): StructType = OaiPageSource.Schema
  override def toBatch: Batch = new OaiPageBatch(options, table)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OaiPageMicroBatchStream(options)
}

private[sources] case class PagePartition(startIndex: Long, uri: String, xml: String)
  extends InputPartition

private[sources] object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = if (consumed) false else { consumed = true; true }
      override def get(): InternalRow = InternalRow(
        part.startIndex,
        UTF8String.fromString(part.uri),
        UTF8String.fromString(part.xml))
      override def close(): Unit = ()
    }
  }
}

private[sources] class OaiPageBatch(options: CaseInsensitiveStringMap,
    table: OaiPageTable) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    // ONE chain walk per loaded table: every ACTION on the same
    // DataFrame replans the scan, and re-walking a single-use
    // resumption-token chain would re-harvest the whole server per
    // action (df.count(); df.write would fetch everything twice — and
    // the second walk can die on a consumed token). The table-level
    // memo pins the batch to its first walk, which also makes
    // multi-action consumption read ONE consistent page set.
    table.synchronized {
      if (table.fetchedOnce == null) {
        val max = options.getInt("maxPages", 100)
        val (pages, pending) =
          OaiPageSource.fetchChain(options, None, max, failOnFetchError = true)
        // a live token after `max` pages means the harvest CONTINUES —
        // returning the prefix would be silent truncation
        // indistinguishable from a complete harvest, the exact failure
        // the mid-chain branches above throw for. Batch semantics: fail
        // loudly; raise maxPages (or stream with maxPagesPerTrigger)
        // for bigger chains.
        if (pending.exists(_.token.nonEmpty))
          throw new java.io.IOException(
            s"oai-pages: resumption chain still live after maxPages=$max " +
              "pages — refusing to return a silently truncated harvest; " +
              "raise option(\"maxPages\") or use readStream with " +
              "maxPagesPerTrigger")
        table.fetchedOnce = pages.zipWithIndex.map { case ((uri, xml), i) =>
          PagePartition(i.toLong, uri, xml): InputPartition
        }.toArray
      }
      table.fetchedOnce
    }
  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
}

private[sources] case class PageOffset(pagesConsumed: Long) extends Offset {
  override def json(): String = s"""{"pagesConsumed":$pagesConsumed}"""
}

/** Streaming chain walker: each `latestOffset` call advances the chain by
  * up to `maxPagesPerTrigger` pages and caches them until committed.
  *
  * RESTART LIMITATION: OAI resumption tokens are single-use — a page
  * consumed but not committed before a driver restart CANNOT be
  * re-fetched (the chain state lived in memory). Rather than silently
  * committing an empty replacement batch (data loss), `planInputPartitions`
  * fails fast on a cache miss with instructions. Durable harvesting
  * belongs to `HarvestPipeline`, which checkpoints `OaiRunResult` rows
  * and re-harvests from the backed-up `from` timestamp on replay. */
private[sources] class OaiPageMicroBatchStream(options: CaseInsensitiveStringMap)
  extends MicroBatchStream {

  private val maxPerTrigger = options.getInt("maxPagesPerTrigger", 10)
  private var consumed = 0L
  private var restoredFloor = 0L
  private var chain: Option[ChainState] = Some(ChainState(firstRequest = true, None))
  private val cache = scala.collection.mutable.Map[Long, (String, String)]()

  private def failRestart(detail: String): Nothing =
    throw new IllegalStateException(
      s"oai-pages: $detail. OAI resumption tokens are single-use, so a " +
        "restarted query cannot seek back into the page chain; delete the " +
        "checkpoint to re-harvest from the start, or use HarvestPipeline " +
        "for durable checkpointed harvesting.")

  override def initialOffset(): Offset = PageOffset(0L)

  override def latestOffset(): Offset = synchronized {
    if (restoredFloor > consumed)
      failRestart(s"restarted at committed offset $restoredFloor but this " +
        "stream instance has consumed 0 pages — offsets would regress and " +
        "re-walk the chain under stale ordinals")
    if (chain.nonEmpty) {
      val (pages, next) = OaiPageSource.fetchChain(options, chain, maxPerTrigger)
      pages.foreach { p => cache(consumed) = p; consumed += 1 }
      chain = next
    }
    PageOffset(consumed)
  }

  override def deserializeOffset(json: String): Offset = {
    // STRICT: a corrupted/truncated checkpoint offset must fail HERE
    // with its actual cause — silently mapping it to page 0 would
    // restart ordinals from scratch and surface later as a misleading
    // missing-cache error (or as silently re-walked pages)
    val off = "\"pagesConsumed\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"oai-pages: unparseable checkpoint offset '$json' — the " +
          "offsets log entry is corrupt; restore the checkpoint or " +
          "restart the harvest with a fresh one"))
    synchronized { restoredFloor = math.max(restoredFloor, off) }
    PageOffset(off)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val s = start.asInstanceOf[PageOffset].pagesConsumed
    val e = end.asInstanceOf[PageOffset].pagesConsumed
    (s until e).map { i =>
      cache.get(i) match {
        case Some((uri, xml)) => PagePartition(i, uri, xml): InputPartition
        case None => throw new IllegalStateException(
          s"oai-pages: page $i is not in the in-memory chain cache — the " +
            "query was restarted with uncommitted pages. OAI resumption " +
            "tokens are single-use, so these pages cannot be re-fetched; " +
            "delete the checkpoint to re-harvest from the start, or use " +
            "HarvestPipeline for durable checkpointed harvesting.")
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PageOffset].pagesConsumed
    cache.keys.filter(_ < e).toSeq.foreach(cache.remove)
  }

  override def stop(): Unit = ()
}
