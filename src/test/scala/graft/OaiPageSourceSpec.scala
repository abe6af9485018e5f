package graft

import org.apache.spark.sql.functions._

import graft.sources.OaiPageSource
import graft.xml.XmlProjections

/** DSv2 `oai-pages` connector: batch chain walk, micro-batch streaming,
  * and composition with the P1 projection. */
class OaiPageSourceSpec extends SparkSpec {

  private def pagedFetcher: OaiPageSource.Fetch = {
    val page1 = fixture("/oai/resumptionToken.xml")       // 1 header + token
    val page2 = fixture("/oai/listIdentifiers.xml")       // 2 headers, no token
    uri =>
      if (uri.contains("resumptionToken=111111111111111")) Some(page2)
      else if (uri.contains("metadataPrefix")) Some(page1)
      else None
  }

  test("batch read walks the resumption-token chain") {
    OaiPageSource.registerFetcher("spec-batch", pagedFetcher)
    val df = spark.read.format("oai-pages")
      .option("url", "http://h/oai")
      .option("fetcher", "spec-batch")
      .load()
    val rows = df.orderBy("page_index").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("request_uri").contains("metadataPrefix=oai_dc"))
    assert(rows(1).getAs[String]("request_uri")
      .contains("resumptionToken=111111111111111"))
    assert(rows(1).getAs[String]("xml").contains("qucosa:1234"))
  }

  test("batch read refuses a live chain at maxPages (no silent truncation); from reaches the request") {
    OaiPageSource.registerFetcher("spec-max", pagedFetcher)
    def read(max: Int) = spark.read.format("oai-pages")
      .option("url", "http://h/oai")
      .option("fetcher", "spec-max")
      .option("from", "2024-02-03T04:05:06")
      .option("maxPages", max)
      .load()
    // page 1 carries a live resumption token: stopping there would be a
    // silently truncated harvest indistinguishable from a complete one —
    // batch semantics fail loudly instead
    val ex = intercept[Exception] { read(1).collect() }
    assert(ex.getMessage.contains("still live after maxPages"), ex.getMessage)
    // a cap the chain fits under reads completely, from-window applied
    val rows = read(2).orderBy("page_index").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("request_uri")
      .contains("from=2024-02-03T04%3A05%3A06"))
  }

  test("batch read walks the chain ONCE however many actions consume the frame") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    OaiPageSource.registerFetcher("spec-once", uri => {
      calls.incrementAndGet(); pagedFetcher(uri)
    })
    val df = spark.read.format("oai-pages")
      .option("url", "http://h/oai")
      .option("fetcher", "spec-once")
      .load()
    assert(df.count() == 2L)
    assert(df.collect().length == 2) // second ACTION on the same frame
    assert(calls.get() == 2,
      s"resumption tokens are single-use: the chain must be walked once " +
        s"(2 fetches), not per action — saw ${calls.get()} fetches")
  }

  test("micro-batch stream pages through the chain one page per trigger") {
    OaiPageSource.registerFetcher("spec-stream", pagedFetcher)
    val q = spark.readStream.format("oai-pages")
      .option("url", "http://h/oai")
      .option("fetcher", "spec-stream")
      .option("maxPagesPerTrigger", 1)
      .load()
      .writeStream.format("memory").queryName("oai_pages")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM oai_pages ORDER BY page_index").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("page_index")).toSeq == Seq(0L, 1L))
    } finally q.stop()
  }

  test("source composes with P1: pages -> header rows") {
    OaiPageSource.registerFetcher("spec-compose", pagedFetcher)
    val pages = spark.read.format("oai-pages")
      .option("url", "http://h/oai")
      .option("fetcher", "spec-compose")
      .load()
    val headers = XmlProjections.projectOaiHeaders(pages, col("xml"))
      .select("record_identifier", "status_is_deleted")
      .orderBy("record_identifier")
    // page1: 1044; page2: 1044 + 1234(deleted) → 3 header rows pre-merge
    val rows = headers.collect()
    assert(rows.length == 3)
    assert(rows.count(_.getAs[Boolean]("status_is_deleted")) == 1)
  }

  test("transport failure mid-chain FAILS the batch read (no silent truncation)") {
    // A partial page set would be indistinguishable from a complete
    // harvest — batch reads must fail instead (the reference treats HTTP
    // failure as a failed run, OaiHarvester.java:253-264). Streaming
    // keeps stop-and-retry semantics (chain state is preserved across
    // triggers), covered by the micro-batch specs.
    OaiPageSource.registerFetcher("spec-fail",
      uri => if (uri.contains("metadataPrefix"))
        Some(fixture("/oai/resumptionToken.xml")) else None)
    val ex = intercept[Exception] {
      spark.read.format("oai-pages")
        .option("url", "http://h/oai")
        .option("fetcher", "spec-fail")
        .load().collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("transport failure"))))
  }

  test("resumption tokens are XML-unescaped before reuse") {
    // a server token containing '&' is serialized as '&amp;' in the page
    // body; resending the escaped form corrupts the next request
    val xml = """<OAI-PMH><ListIdentifiers>
      |<resumptionToken>offset=100&amp;set=a&lt;b&#65;</resumptionToken>
      |</ListIdentifiers></OAI-PMH>""".stripMargin
    assert(OaiPageSource.extractToken(xml) == Some("offset=100&set=a<bA"))
    // &amp;lt; must decode to the literal text '&lt;', not '<'
    assert(OaiPageSource.xmlUnescape("a&amp;lt;b") == "a&lt;b")
    // numeric form of '&' followed by 'lt;' is the same case — single
    // pass, replacement text never rescanned
    assert(OaiPageSource.xmlUnescape("a&#38;lt;b") == "a&lt;b")
    assert(OaiPageSource.xmlUnescape("&#x26;amp;") == "&amp;")
    // malformed references from a broken server page are left VERBATIM,
    // never thrown: digit-run overflow, out-of-range code point,
    // hex digits under a decimal radix
    assert(OaiPageSource.xmlUnescape("a&#99999999999;b") == "a&#99999999999;b")
    assert(OaiPageSource.xmlUnescape("a&#xFFFFFF;b") == "a&#xFFFFFF;b")
    assert(OaiPageSource.xmlUnescape("a&#9a;b") == "a&#9a;b")
    assert(OaiPageSource.xmlUnescape("a&#x10FFFF;b") == // max valid cp
      "a" + new String(Character.toChars(0x10FFFF)) + "b")
    assert(OaiPageSource.extractToken(
      "<x><resumptionToken/></x>") == None)
  }

  test("mid-chain OAI error page FAILS the batch read; a first-page error flows through") {
    // token expiry mid-harvest answers HTTP 200 with an <error> page —
    // the same silent truncation as a transport failure
    val errPage = """<OAI-PMH><error code="badResumptionToken">expired</error></OAI-PMH>"""
    OaiPageSource.registerFetcher("spec-err-mid",
      uri => if (uri.contains("resumptionToken")) Some(errPage)
        else Some(fixture("/oai/resumptionToken.xml")))
    val ex = intercept[Exception] {
      spark.read.format("oai-pages")
        .option("url", "http://h/oai")
        .option("fetcher", "spec-err-mid")
        .load().collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("badResumptionToken"))))

    // a FIRST-page error (noRecordsMatch on an empty selection) is a
    // legitimate one-page result for the consumer's error policy
    OaiPageSource.registerFetcher("spec-err-first", _ => Some(
      """<OAI-PMH><error code="noRecordsMatch"/></OAI-PMH>"""))
    val rows = spark.read.format("oai-pages")
      .option("url", "http://h/oai")
      .option("fetcher", "spec-err-first")
      .load().collect()
    assert(rows.length == 1)
    assert(rows(0).getString(2).contains("noRecordsMatch"))
  }
}
