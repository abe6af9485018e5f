package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.GraftFunctions

/** User-facing registry for OAI header filters — the engine's face of
  * the reference's ONE extension point (`OaiHeaderFilter.java:21-24`, an
  * abstract `filterOaiHeaders(List<OaiHeader>)` users subclass; its one
  * production subclass is the qucosa-id predicate,
  * `QucosaDocumentFilter.java:27`).
  *
  * A filter is a whole-frame transform `DataFrame => DataFrame` over the
  * projected header columns (`record_identifier`, `datestamp`,
  * `set_spec`, `status_is_deleted`) — strictly more expressive than the
  * reference's per-element predicate (a transform can also dedup,
  * rewrite, or enrich) while staying declarative: whatever it returns
  * composes into the harvest plan BEFORE the state merge, so Catalyst
  * still pushes the work into the page projection.
  *
  * Names make filters deployable by configuration: third-party code
  * registers under a name at startup, and pipeline wiring resolves the
  * name — the same in-JVM registry pattern as
  * [[graft.sources.OaiPageSource.registerFetcher]].
  *
  * {{{
  * OaiHeaderFilters.register("mandator-x", _.filter(col("set_spec")(0) === "x"))
  * new HarvestPipeline(spark, headers, runs, url,
  *   headerFilter = OaiHeaderFilters("mandator-x"))
  * }}}
  *
  * Built-ins: `identity` (harvest everything) and `qucosa` (the
  * reference's production filter, F1). */
object OaiHeaderFilters {

  type HeaderFilter = DataFrame => DataFrame

  private val registry = new ConcurrentHashMap[String, HeaderFilter]()

  /** Register (or replace — last wins, like fetchers) a named filter. */
  def register(name: String, filter: HeaderFilter): Unit = {
    registry.put(name, filter); ()
  }

  /** Resolve a named filter; unknown names fail loudly with the known
    * set, so a config typo cannot silently harvest unfiltered. */
  def apply(name: String): HeaderFilter = {
    val f = registry.get(name)
    require(f != null,
      s"no OAI header filter registered under '$name' " +
        s"(registered: ${names.toSeq.sorted.mkString(", ")})")
    f
  }

  /** Currently registered filter names. */
  def names: Set[String] = {
    val it = registry.keys()
    val b = Set.newBuilder[String]
    while (it.hasMoreElements) b += it.nextElement()
    b.result()
  }

  register("identity", identity[DataFrame] _)
  // F1 — the reference's production filter (QucosaDocumentFilter.java:27)
  register("qucosa",
    _.filter(GraftFunctions.isQucosaId(col("record_identifier"))))
}
