package graft.expressions

import java.io.StringReader

import javax.xml.XMLConstants
import javax.xml.namespace.NamespaceContext
import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.xpath.{XPathConstants, XPathExpression, XPathFactory}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.w3c.dom.Node
import org.xml.sax.InputSource

/** Namespace-aware multi-field XPath projection: ONE secure DOM parse
  * per document, N compiled XPath evaluations → a struct of strings
  * (null per field when the path matches nothing).
  *
  * Closes both gaps of Spark's built-in `xpath_*` family (SURVEY §7.4):
  *  - built-ins are namespace-UNaware (local-name matching only), while
  *    the reference resolves real METS/MODS namespace URIs
  *    (`MetsProcessor.java:81-85,305-326`);
  *  - N built-in calls parse the XML string N times; this parses once.
  *
  * XXE-hardened: external entities and DTDs disabled. Parser and
  * compiled XPath machinery are per-thread (neither is thread-safe) and
  * rebuilt after serialization to executors.
  *
  * Codegen: emits a single virtual call on the serialized expression
  * instance (via `addReferenceObj`) instead of `CodegenFallback` — the
  * DOM work is unchanged, but the expression participates in
  * whole-stage codegen, so it no longer splits the codegen span of
  * every plan it appears in (r1's main P2/P4 perf finding).
  */
case class XPathStructNs(
    child: Expression,
    fields: Seq[(String, String)],
    namespaces: Map[String, String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got ${child.dataType}")
    else {
      // compile every path NOW: a syntactically invalid XPath should be
      // a plannable analysis error, not a first-row executor throw from
      // inside a ThreadLocal initializer. Compile WITH the expression's
      // namespace context, exactly as the runtime machinery does — the
      // JDK default factory defers prefix resolution past compile, but a
      // prefix-resolving XPathFactory on the classpath (Saxon registers
      // itself via the same ServiceLoader) rejects namespaced paths
      // compiled without a context, which would fail EVERY namespaced
      // projection at analysis while evaluation would have succeeded
      val checkCtx = XPathStructNs.nsContext(namespaces)
      val bad = fields.collectFirst {
        case (name, path) if scala.util.Try {
          val xp = XPathStructNs.newXPath()
          xp.setNamespaceContext(checkCtx)
          xp.compile(path)
        }.isFailure => (name, path)
      }
      bad match {
        case Some((name, path)) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: field '$name' has an invalid XPath '$path'")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    }

  override def dataType: DataType =
    StructType(fields.map { case (name, _) => StructField(name, StringType) })

  override def prettyName: String = "graft_xpath_struct"

  override protected def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("xpathStructNs", this,
      classOf[XPathStructNs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalRow($c);")
  }

  /** Shared by interpreted eval and generated code. */
  def evalRow(input: UTF8String): InternalRow = {
    val (builder, compiled) = XPathStructNs.machineryFor(fields, namespaces)
    // parse from a CHARACTER stream: the document is already a decoded
    // Spark string, so an in-document encoding declaration must be
    // ignored — re-encoding to UTF-8 bytes and letting the parser honor
    // a declared ISO-8859-1 would mojibake every non-ASCII field, and a
    // declared UTF-16 would null the whole row despite valid content
    val doc =
      try {
        builder.reset()
        builder.parse(new InputSource(new StringReader(input.toString)))
      } catch { case _: Exception => null }
    // one preallocated slot array per row (a null-filled array IS the
    // all-null row for unparseable documents) — no intermediate Seqs
    // on the per-document hot path
    val slots = new Array[Any](compiled.length)
    if (doc != null) {
      var i = 0
      while (i < compiled.length) {
        // a compiled path can still fail at EVALUATION (e.g. a numeric
        // XPath asked for a NODE): null the field, never the task
        val node =
          try compiled(i).evaluate(doc, XPathConstants.NODE).asInstanceOf[Node]
          catch { case _: Exception => null }
        if (node != null) {
          val text =
            if (node.getNodeType == Node.ATTRIBUTE_NODE) node.getNodeValue
            else node.getTextContent
          if (text != null) slots(i) = UTF8String.fromString(text)
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(slots)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM-global factories AND machinery cache.
  *
  * Factories: `DocumentBuilderFactory.newInstance` /
  * `XPathFactory.newInstance` run a ServiceLoader scan under a global
  * lock — doing that per task serialized all tasks on classpath
  * scanning and dominated wall time. The factories are created once;
  * per-thread builder/XPath creation synchronizes on them because the
  * factory classes are not thread-safe.
  *
  * Machinery: the per-thread (DocumentBuilder, compiled XPaths) pairs
  * are cached JVM-globally KEYED BY (fields, namespaces, thread) —
  * not held per expression instance (every query run plans a fresh
  * instance, and instance-local caching made all 32 task threads
  * re-create builders and re-compile XPaths under the factory locks on
  * every run — measured as multi-second run-to-run jitter on the METS
  * projection). Each thread builds its machinery once per JVM per
  * distinct projection. */
private object XPathStructNs {
  private lazy val dbf = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f
  }
  private lazy val xpf = XPathFactory.newInstance()

  def newDocumentBuilder(): javax.xml.parsers.DocumentBuilder =
    dbf.synchronized { dbf.newDocumentBuilder() }
  def newXPath(): javax.xml.xpath.XPath =
    xpf.synchronized { xpf.newXPath() }

  // keyed by (projection, THREAD id), not projection → ThreadLocal:
  // a ThreadLocal-valued cache's clear() only drops the map entries —
  // each task thread's ThreadLocalMap keeps the builder + compiled
  // XPaths alive until that thread happens to expunge stale slots, so
  // the size bound was never promptly realized. A flat keyed map frees
  // everything the moment clear() runs. Per-row cost is one hash
  // lookup — noise next to the DOM parse it guards.
  private val machineryCache = new java.util.concurrent.ConcurrentHashMap[
    (Seq[(String, String)], Map[String, String], Long),
    (javax.xml.parsers.DocumentBuilder, Array[XPathExpression])]()

  /** Bound the keyed cache: a long-lived session planning many DISTINCT
    * generated projections must not pin builders + compiled XPaths for
    * the JVM lifetime. Eviction is clear-all past the cap — crude but
    * correct (entries lazily rebuild), and the cap (projections ×
    * task threads) is far above any static query inventory. */
  private val MaxCachedEntries = 64 * 64

  /** The ONE NamespaceContext both analysis-time path checking and the
    * runtime machinery use — they must resolve identically or analysis
    * accepts paths the runtime rejects (or vice versa, under a
    * prefix-resolving XPathFactory like Saxon). */
  def nsContext(namespaces: Map[String, String]): NamespaceContext =
    new NamespaceContext {
      override def getNamespaceURI(prefix: String): String =
        namespaces.getOrElse(prefix, XMLConstants.NULL_NS_URI)
      override def getPrefix(uri: String): String =
        namespaces.collectFirst { case (p, u) if u == uri => p }.orNull
      override def getPrefixes(uri: String): java.util.Iterator[String] =
        java.util.Collections.emptyIterator()
    }

  def machineryFor(
      fields: Seq[(String, String)],
      namespaces: Map[String, String])
      : (javax.xml.parsers.DocumentBuilder, Array[XPathExpression]) = {
    if (machineryCache.size() > MaxCachedEntries) machineryCache.clear()
    machineryCache.computeIfAbsent(
      (fields, namespaces, Thread.currentThread().getId), _ => {
        val ctx = nsContext(namespaces)
        val compiled = fields.map { case (_, path) =>
          val xp = newXPath()
          xp.setNamespaceContext(ctx)
          xp.compile(path)
        }.toArray
        (newDocumentBuilder(), compiled)
      })
  }
}
