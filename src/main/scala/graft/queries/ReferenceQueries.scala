package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.operators.StateOps
import graft.streaming.OffsetStateMachine
import graft.xml.XmlProjections

/** The reference-derived operator inventory (SURVEY.md §2) as verifiable
  * queries over the driver testdata, each with a DuckDB oracle.
  *
  * Numeric discipline for hash-stable oracle comparison: money-like sums
  * are computed in integer cents (`round(x*100)::long` per row, then
  * summed — exact in both engines); ratios are `round(_, 6)`; every
  * integer-ish output is cast to long to match DuckDB's BIGINT defaults.
  */
object ReferenceQueries {

  type Q = (SparkSession, String) => DataFrame

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  def queries: Map[String, Q] = Map(
    // ── A2/A3 aggregate showcase (TPC-H Q1 shape) ─────────────────────────
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity"))).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_price_cents"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ── Join pipeline (shipping-priority shape); dims broadcast ─────────
    "q3_shipping_priority" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }),

    // ── Multi-join with broadcast dims (local-supplier shape) ────────────
    "q5_revenue_by_nation" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),

    // ── Skew-heavy multi-join (TPC-H Q9 shape, sans partsupp — the
    // testdata carries no ps_supplycost, so profit reduces to the
    // revenue term; the join graph is the point: a filtered part dim
    // and the full supplier/nation dims BROADCAST, so the only
    // shuffle join is lineitem⋈orders on the fact key. At 100 TB the
    // same plan holds: dims are orders-of-magnitude below the
    // broadcast threshold, the fact-fact join shuffles once on
    // l_orderkey, and per-(nation, year) aggregation map-side
    // combines before the final exchange. ──────────────────────────
    "q9_product_type_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_name").contains("red"))
      val sup = Tables.supplier(s, dir)
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("sum_profit_cents"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // ── High-cardinality aggregate with HAVING (TPC-H Q18 shape —
    // large-volume customers): the groupBy(l_orderkey) runs at ORDER
    // cardinality (the highest-cardinality aggregate in the headline
    // set — partial aggregation barely combines because nearly every
    // group has its rows on one partition's worth of input), and the
    // HAVING shrinks it to a rare-order key set. The per-order sum the
    // final projection needs IS the HAVING aggregate, so lineitem is
    // read and aggregated ONCE — no second pass, no re-join of
    // lineitem (the canonical SQL's self-semi-join collapses into
    // reuse). The shrunken aggregate then joins orders on the fact
    // key and customer on custkey; at 100 TB both joins shuffle at
    // MOST the qualifying-order cardinality on the left (HAVING-bound,
    // orders of magnitude below lineitem), AQE broadcasts at small SF,
    // and TakeOrderedAndProject bounds the top-100 without a global
    // sort. ──────────────────────────────────────────────────────────
    "q18_large_volume_customer" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val big = l.groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity"))).cast("long").as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), cents(col("o_totalprice")).as("o_totalprice_cents"),
          col("sum_qty"))
        .orderBy(col("o_totalprice_cents").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    }),

    // ── F1: anchored-regex record filter ─────────────────────────────────
    "f1_filter_qucosa_id" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("oai:example.org:"),
            when(col("doc_id") % 7 === 0,
              concat(lit("qucosa:"), col("doc_id").cast("string")))
              .otherwise(concat(lit("fedora-system:"), col("doc_id").cast("string"))))
            .as("record_identifier"))
        .filter(isQucosaId(col("record_identifier")))
        .orderBy(col("doc_id"))
    }),

    // ── F2: required-field validation (blank rows dropped) ───────────────
    "f2_validate_required" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, lit("   ")).otherwise(col("text")))
        .filter(isNotBlank(col("text")) && isNotBlank(col("lang")) &&
          col("n_chars").isNotNull)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ── F3: boolean-flag predicate ────────────────────────────────────────
    "f3_filter_flag" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ── A1/S3: newest row by insertion sequence ──────────────────────────
    "a1_top1_by_seq" -> ((s, dir) =>
      StateOps.top1BySeq(Tables.events(s, dir), "event_id")),

    // ── A2: count ────────────────────────────────────────────────────────
    "a2_count_rows" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows"))),

    // ── A3: dedup last-write-wins per key ────────────────────────────────
    "a3_dedup_last_write_wins" -> ((s, dir) =>
      StateOps.dedupLastWriteWins(Tables.events(s, dir),
          keys = Seq("user_id", "event_type"),
          orderDescCols = Seq("ts", "event_id"))
        .orderBy(col("user_id"), col("event_type"))),

    // ── L1/S4: bounded batch ─────────────────────────────────────────────
    "l1_limit_batch" -> ((s, dir) =>
      StateOps.limitBatch(
        Tables.orders(s, dir).orderBy(col("o_orderkey")), 100)),

    // ── U1: keyed upsert merge (updates beat state) ──────────────────────
    "u1_merge_headers" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val state = ev.filter(col("event_id") % 10 < 5)
      val updates = ev.filter(col("event_id") % 10 >= 3 && col("event_id") % 10 <= 7)
        .withColumn("value", col("value") + 1000.0)
      StateOps.mergeByKey(state, updates, keys = Seq("event_id"))
        .orderBy(col("event_id"))
    }),

    // ── U2: same merge shape, reporting-doc flavored ─────────────────────
    "u2_merge_reporting_docs" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "lang", "source")
      val state = d.filter(col("doc_id") % 2 === 0)
      val updates = d.filter(col("doc_id") % 3 === 0)
        .withColumn("lang", lit("xx"))
      StateOps.mergeByKey(state, updates, keys = Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // ── U3: append with sequence assignment ──────────────────────────────
    "u3_append_run_result" -> ((s, dir) => {
      val runs = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("run_day"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("max_ts"))
      val cut = lit("2024-01-16").cast("timestamp")
      val state = runs.filter(col("run_day") < cut)
        .withColumn("id", {
          graft.util.Logs.quietGlobalWindowWarning()
          row_number().over(Window.orderBy(col("run_day"))).cast("long")
        })
        .select("id", "run_day", "n_events", "max_ts")
      val fresh = runs.filter(col("run_day") >= cut)
        .withColumn("id", lit(0L))
        .select("id", "run_day", "n_events", "max_ts")
      StateOps.appendWithSeq(state, fresh, "id", Seq("run_day"))
        .orderBy(col("id"))
    }),

    // ── U4: SQL row-level DML — a three-clause MERGE INTO, a modulo
    // UPDATE and a modulo DELETE (both outside the pushable filter
    // algebra → the delta write path) run against a REAL bucketed state
    // table through the DSv2 catalog, then the final table is read
    // back. Every statement is one atomic manifest commit. Scratch
    // hygiene lives in [[QueryScratch]]: one catalog registration per
    // session, a fresh TABLE per trial under its fixed root, previous
    // trials reaped. ─────────────────────────────────────────────────────
    "u4_sql_row_dml" -> ((s, dir) => {
      val (root, tbl) = QueryScratch.freshDir("u4")
      val t = new graft.pipeline.BucketedStateTable(s, s"$root/$tbl",
        keyCols = Seq("doc_id"), numBuckets = 8)
      val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      t.merge(d.filter(col("doc_id") < 300), keys = Seq("doc_id"))
      val cat = QueryScratch.catalog(s)
      d.filter(col("doc_id").between(150, 449))
        .createOrReplaceTempView("u4_src")
      s.sql(
        s"""MERGE INTO $cat.$tbl t USING u4_src s ON t.doc_id = s.doc_id
           |WHEN MATCHED AND s.doc_id % 5 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars + 1000000
           |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars) VALUES (s.doc_id, s.n_chars)
           |""".stripMargin)
      s.sql(s"UPDATE $cat.$tbl SET n_chars = CAST(0 AS BIGINT) " +
        "WHERE doc_id % 7 = 0")
      s.sql(s"DELETE FROM $cat.$tbl WHERE doc_id % 11 = 0")
      s.read.format("graft-state").load(s"$root/$tbl")
        .select(col("doc_id"), col("n_chars")).orderBy(col("doc_id"))
    }),

    // ── U5: change feed (CDC) between two retained commits — seed a
    // bucketed state table, run a merge (updates + inserts) and a keyed
    // delete as separate commits, then read the NET row-level diff
    // first→last: Delta-CDF-shaped (insert / delete / update_preimage /
    // update_postimage), rows inserted-then-deleted in between absent,
    // value-identical rewrites absent. The oracle recomputes both
    // snapshots in SQL and diffs them. ───────────────────────────────────
    "u5_change_feed" -> ((s, dir) => {
      val (root, tbl) = QueryScratch.freshDir("u5")
      val t = new graft.pipeline.BucketedStateTable(s, s"$root/$tbl",
        keyCols = Seq("doc_id"), numBuckets = 8)
      val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      t.merge(d.filter(col("doc_id") < 400), keys = Seq("doc_id"))
      val c1 = t.commits().last
      t.merge(d.filter(col("doc_id").between(200, 599))
          .withColumn("n_chars",
            when(col("doc_id") % 3 === 0, col("n_chars") + 1000L)
              .otherwise(col("n_chars"))),
        keys = Seq("doc_id"))
      t.applyDelta(upserts = d.limit(0),
        deleteKeys = d.filter(col("doc_id") % 5 === 0).select("doc_id"),
        keys = Seq("doc_id"))
      t.changesBetween(c1, t.commits().last)
        .orderBy(col("doc_id"), col("change_type"))
    }),

    // ── U6: incremental view maintenance — a count/sum aggregate kept
    // current from the change feed alone (signed deltas; group-moving
    // updates and drained groups included), never rescanning the base
    // table. The oracle recomputes the aggregate from scratch over the
    // final snapshot. ────────────────────────────────────────────────────
    "u6_ivm_aggregate" -> ((s, dir) => {
      val (root, tbl) = QueryScratch.freshDir("u6")
      val t = new graft.pipeline.BucketedStateTable(s, s"$root/$tbl",
        keyCols = Seq("doc_id"), numBuckets = 8)
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      t.merge(d.filter(col("doc_id") < 400), keys = Seq("doc_id"))
      val c1 = t.commits().last
      val agg0 = StateOps.aggregateShape(
        t.readAt(c1).get, Seq("lang"), "n_chars")
      t.merge(d.filter(col("doc_id").between(200, 599))
          .withColumn("n_chars",
            when(col("doc_id") % 3 === 0, col("n_chars") + 1000L)
              .otherwise(col("n_chars")))
          .withColumn("lang",
            when(col("doc_id") % 7 === 0, lit("xx")).otherwise(col("lang"))),
        keys = Seq("doc_id"))
      t.applyDelta(upserts = d.limit(0),
        deleteKeys = d.filter(col("doc_id") % 5 === 0).select("doc_id"),
        keys = Seq("doc_id"))
      StateOps.maintainSumCount(agg0,
          t.changesBetween(c1, t.commits().last), Seq("lang"), "n_chars")
        .orderBy(col("lang"))
    }),

    // ── U7: schema evolution — widen a live state table by a
    // metadata-only ADD COLUMN ([[BucketedStateTable.widenTo]]: zero
    // data I/O, one manifest rename regardless of table size), then
    // backfill through an ordinary bucket-pruned merge. Pre-widening
    // rows in never-rewritten buckets read back null-filled under the
    // manifest's recorded schema. The oracle recomputes the final
    // snapshot in SQL. ───────────────────────────────────────────────────
    // ── U8: change feed ACROSS relayout boundaries — the same logical
    // history as U5 with an 8 → 16 layout SPLIT and then a 16 → 8
    // COALESCE inside the diffed range (the signed factor chain). Both
    // relayouts are pure rewrites (zero net rows), so the
    // cross-boundary net diff must be IDENTICAL to the un-relayouted
    // one ([[graft.pipeline.BucketedStateTable.changedAcrossSplits]]
    // remaps the touched set through each boundary) — and the oracle
    // is u5's snapshot diff verbatim. ───────────────────────────────────
    // ── U9: zone-map pruned read — a state table bucketed by `lang`
    // with manifest zone maps on `n_chars`
    // ([[graft.pipeline.BucketedStateTable.readWhere]]): the lang
    // equality pins ONE bucket via the driver-side hash, the n_chars
    // range consults the recorded per-bucket min/max, and the result
    // (superset read + residual filter) must equal the plain SQL
    // predicate over the same rows. ─────────────────────────────────────
    "u9_zonemap_scan" -> ((s, dir) => {
      val (root, tbl) = QueryScratch.freshDir("u9")
      val t = new graft.pipeline.BucketedStateTable(s, s"$root/$tbl",
        keyCols = Seq("lang", "doc_id"), bucketCols = Seq("lang"),
        numBuckets = 16, statsCols = Seq("n_chars"))
      val d = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars"))
      t.merge(d, keys = Seq("lang", "doc_id"))
      import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
      t.readWhere(Seq(EqualTo("lang", "en"), GreaterThan("n_chars", 300L)))
        .get
        .filter(col("lang") === "en" && col("n_chars") > 300L)
        .orderBy(col("doc_id"))
    }),

    "u8_split_feed" -> ((s, dir) => {
      val (root, tbl) = QueryScratch.freshDir("u8")
      val t = new graft.pipeline.BucketedStateTable(s, s"$root/$tbl",
        keyCols = Seq("doc_id"), numBuckets = 8, keepCommits = 10)
      val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      t.merge(d.filter(col("doc_id") < 400), keys = Seq("doc_id"))
      val c1 = t.commits().last
      t.merge(d.filter(col("doc_id").between(200, 599))
          .withColumn("n_chars",
            when(col("doc_id") % 3 === 0, col("n_chars") + 1000L)
              .otherwise(col("n_chars"))),
        keys = Seq("doc_id"))
      val t16 = t.splitBuckets(2)
      t16.applyDelta(upserts = d.limit(0),
        deleteKeys = d.filter(col("doc_id") % 5 === 0).select("doc_id"),
        keys = Seq("doc_id"))
      val t8b = t16.coalesceBuckets(2)
      t8b.changesBetween(c1, t8b.commits().last)
        .orderBy(col("doc_id"), col("change_type"))
    }),

    "u7_schema_evolution" -> ((s, dir) => {
      val (root, tbl) = QueryScratch.freshDir("u7")
      val t = new graft.pipeline.BucketedStateTable(s, s"$root/$tbl",
        keyCols = Seq("doc_id"), numBuckets = 8)
      val narrow = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val wide = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), col("lang"))
      t.merge(narrow.filter(col("doc_id") < 400), keys = Seq("doc_id"))
      t.widenTo(wide.schema) // metadata-only: no bucket is read or written
      t.merge(wide.filter(col("doc_id").between(200, 599)), keys = Seq("doc_id"))
      t.read().get.orderBy(col("doc_id"))
    }),

    // ── D1: optimistic delete-if-unmodified (full-tuple anti-join) ───────
    "d1_delete_if_unmodified" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val processed = ev.filter(col("value") >= 100)
        .withColumn("ts",
          when(col("event_id") % 10 === 0, col("ts") + expr("INTERVAL 1 HOUR"))
            .otherwise(col("ts")))
      StateOps.deleteIfUnmodified(ev, processed).newState
        .orderBy(col("event_id"))
    }),

    // ── D1 feedback: the not-removed survivor set (ST5) ──────────────────
    "d1_survivors" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val processed = ev.filter(col("value") >= 100)
        .withColumn("ts",
          when(col("event_id") % 10 === 0, col("ts") + expr("INTERVAL 1 HOUR"))
            .otherwise(col("ts")))
      StateOps.deleteIfUnmodified(ev, processed).notRemoved
        .orderBy(col("event_id"))
    }),

    // ── D2: retention with keep-latest exception ─────────────────────────
    "d2_retention_keep_latest" -> ((s, dir) =>
      StateOps.retentionKeepLatest(Tables.events(s, dir),
          seqCol = "event_id", tsCol = "ts",
          cutoff = lit("2024-01-25").cast("timestamp"))
        .orderBy(col("event_id"))),

    // ── SF1: ISO-8601 multi-format timestamp parsing ─────────────────────
    "sf1_ts_parse" -> ((s, dir) => {
      val o = graft.ops.Balance.widen(Tables.orders(s, dir))
      val base = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss")
      val iso = when(col("o_orderkey") % 3 === 0, base)
        .when(col("o_orderkey") % 3 === 1, concat(base, lit("+02:00")))
        .otherwise(concat(base, lit("+0200")))
      o.select(col("o_orderkey"), iso.as("iso"),
          tsParseIso8601(iso).as("parsed"))
        .orderBy(col("o_orderkey"))
    }),

    // ── SF2: FC3 vs spec timestamp formatting ────────────────────────────
    "sf2_ts_format_dual" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          tsFormatFc3(col("o_orderdate")).as("fc3_format"),
          tsFormatSpec(col("o_orderdate")).as("spec_format"))
        .orderBy(col("o_orderkey"))),

    // ── SF3: timestamp arithmetic (retention cutoff, skew) ───────────────
    "sf3_ts_arith" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          (col("ts") - expr("INTERVAL 48 HOURS")).as("cutoff_ts"),
          (tsEpochMillis(col("ts")) -
            tsEpochMillis(date_trunc("day", col("ts")))).as("ms_since_midnight"))
        .orderBy(col("event_id"))),

    // ── SF4: OAI identifier → local id ───────────────────────────────────
    "sf4_str_local_id" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          localId(concat(lit("oai:example.org:qucosa:"),
            col("doc_id").cast("string"))).as("local_id"))
        .orderBy(col("doc_id"))),

    // ── P1: OAI header projection (XML round-trip) ───────────────────────
    "p1_xml_headers_project" -> ((s, dir) => {
      val d = graft.ops.Balance.widen(Tables.documents(s, dir))
      val xml = concat(
        lit("<OAI-PMH><ListIdentifiers><header"),
        when(col("doc_id") % 4 === 0, lit(" status=\"deleted\"")).otherwise(lit("")),
        lit("><identifier>oai:example.org:qucosa:"), col("doc_id").cast("string"),
        lit("</identifier><datestamp>2024-01-02T03:04:05Z</datestamp>"),
        when(col("doc_id") % 2 === 0,
          concat(lit("<setSpec>"), col("lang"), lit("</setSpec><setSpec>"),
            col("source"), lit("</setSpec>"))).otherwise(lit("")),
        lit("</header></ListIdentifiers></OAI-PMH>"))
      XmlProjections.projectOaiHeaders(d.select(col("doc_id"), xml.as("xml")),
          col("xml"))
        .select(col("doc_id"), col("record_identifier"), col("datestamp"),
          array_join(col("set_spec"), ",").as("set_spec_csv"),
          col("status_is_deleted"))
        .orderBy(col("doc_id"))
    }),

    // ── P2: envelope scalars with tri-state resumption token ─────────────
    "p2_envelope_tristate" -> ((s, dir) => {
      val d = graft.ops.Balance.widen(Tables.documents(s, dir))
      val xml = when(col("doc_id") % 3 === 0, lit(
          "<OAI-PMH><responseDate>2014-06-08T11:43:00Z</responseDate><ListIdentifiers/></OAI-PMH>"))
        .when(col("doc_id") % 3 === 1, lit(
          "<OAI-PMH><responseDate>2014-06-08T11:43:00Z</responseDate><ListIdentifiers><resumptionToken cursor=\"0\"/></ListIdentifiers></OAI-PMH>"))
        .otherwise(concat(
          lit("<OAI-PMH><responseDate>2014-06-08T11:43:00Z</responseDate><ListIdentifiers><resumptionToken expirationDate=\"2014-06-09T18:34:15Z\">  tok"),
          col("doc_id").cast("string"),
          lit("  </resumptionToken></ListIdentifiers></OAI-PMH>")))
      XmlProjections.projectOaiEnvelope(
          d.select(col("doc_id"), xml.as("xml")), col("xml"))
        .select(col("doc_id"), col("response_date"), col("token_state"),
          col("resumption_token"), col("token_expiration"))
        .orderBy(col("doc_id"))
    }),

    // ── P3: OAI error map (exploded to rows) ─────────────────────────────
    "p3_errors_project" -> ((s, dir) => {
      val d = graft.ops.Balance.widen(Tables.documents(s, dir))
      val xml = when(col("doc_id") % 2 === 0, lit(
          "<OAI-PMH><error code=\"noRecordsMatch\">no records</error></OAI-PMH>"))
        .otherwise(lit(
          "<OAI-PMH><error code=\"badArgument\">bad arg</error><error code=\"badVerb\">bad verb</error></OAI-PMH>"))
      XmlProjections.projectOaiErrors(
          d.select(col("doc_id"), xml.as("xml")), col("xml"))
        .select(col("doc_id"), explode(col("errors")).as(Seq("code", "message")))
        .orderBy(col("doc_id"), col("code"))
    }),

    // ── P4: METS 3-field projection (namespace-prefixed XML) ─────────────
    "p4_mets_project" -> ((s, dir) => {
      import s.implicits._
      val docs = Seq(
        (1L, metsXml("slub", "in_book", "2016-05-24T12:33:56+0200")),
        (2L, metsXml("SLUB", "issue", "2008-08-04")),
        (3L, metsXml("TU Dresden", "article", "2016-10-10T11:27:33+0200")),
        (4L, metsXmlNoAgent("issue", "2011-03-31"))
      ).toDF("rec_id", "xml")
      XmlProjections.projectMets(docs, col("xml"))
        .select(col("rec_id"), col("mandator"), col("document_type"),
          col("distribution_date"))
        .orderBy(col("rec_id"))
    }),

    // ── Engine-completeness: set difference (free from Spark SQL; the
    // reference has no set ops — SURVEY §2.3 note) ────────────────────────
    "set_except" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.select("event_id", "user_id", "event_type")
        .except(ev.filter(col("value") >= 50)
          .select("event_id", "user_id", "event_type"))
        .orderBy(col("event_id"))
    }),

    // ── Engine-completeness: set intersection ────────────────────────────
    "set_intersect" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "event_type")
        .intersect(ev.filter(col("value") >= 50)
          .select("event_id", "user_id", "event_type"))
        .orderBy(col("event_id"))
    }),

    // ── Engine-completeness: bag-semantics set ops — EXCEPT ALL /
    // INTERSECT ALL over a deliberately duplicate-heavy projection
    // (multiset counts must subtract / min, not collapse). ───────────────
    "set_except_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.select("user_id", "event_type")
        .exceptAll(ev.filter(col("value") >= 50)
          .select("user_id", "event_type"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    "set_intersect_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type").isin("click", "view"))
        .select("user_id", "event_type")
        .intersectAll(ev.filter(col("value") >= 50)
          .select("user_id", "event_type"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // ── Engine-completeness: RANGE-frame rolling window — trailing
    // 7-day per-user sum keyed on exact microsecond epochs. Values sum
    // as DECIMAL(12,2) (exact in any engine — the synthetic values have
    // 2 decimals) and only the final total casts back to double. One
    // keyed shuffle; frames are per-user history, never global. ──────────
    "window_rolling_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(tsEpochMicros(col("ts")))
        .rangeBetween(-604800000000L, 0L)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").cast("decimal(12,2)").as("v"))
        .withColumn("rolling_7d", sum(col("v")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("rolling_7d"))
        .orderBy(col("event_id"))
    }),

    // ── Engine-completeness: anti join (orders with NO big lineitem) ─────
    "join_anti" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey"))
    }),

    // ── Engine-completeness: correlation / covariance / stddev per
    // group — the moment statistics a profiling sweep reports. ───────────
    "agg_corr_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("qty_disc_covar"),
          round(stddev_samp(col("l_quantity")), 6).as("qty_stddev"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // ── Engine-completeness: unpivot/melt — wide per-group aggregates
    // to (group, metric, value) long form. ───────────────────────────────
    "agg_unpivot" -> ((s, dir) => {
      val wide = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).cast("double").as("n_rows"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("n_rows"), col("avg_disc")),
        "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // ── Engine-completeness: semi join (queue ∩ referenced keys) ─────────
    "join_semi" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey"))
    }),

    // ── Engine-completeness: running windows (rank / running sum / lead) ─
    "window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("running_cents",
          sum(cents(col("value")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select("event_id", "user_id", "rn", "running_cents", "next_type")
        .orderBy(col("event_id"))
    }),

    // ── S2: per-record enrichment fetch (partition-parallel lookup) ──────
    // The dissemination transport is a deterministic stub (zero-egress
    // container); the Spark-side plumbing — typed mapPartitions with one
    // client per partition feeding the P4 projection — is the production
    // shape (reference MetsProcessor.java:126-147,165-187).
    "s2_mets_enrichment" -> ((s, dir) => {
      import s.implicits._
      val headers = graft.ops.Balance.widen(Tables.documents(s, dir))
        .select(col("doc_id"),
          concat(lit("oai:example.org:qucosa:"), col("doc_id").cast("string"))
            .as("record_identifier"),
          col("lang"), col("source"))
      val fetched = headers.as[(Long, String, String, String)]
        .mapPartitions { it =>
          // per-partition "client"; one fetch per record
          it.map { case (docId, rid, lang, source) =>
            val dist = f"2020-01-${docId % 28 + 1}%02d"
            (docId, rid,
              s"""<mets:mets xmlns:mets="http://www.loc.gov/METS/" xmlns:mods="http://www.loc.gov/mods/v3">""" +
              s"""<mets:metsHdr><mets:agent ROLE="EDITOR"><mets:name>$lang</mets:name></mets:agent></mets:metsHdr>""" +
              s"""<mets:dmdSec><mods:mods><mods:originInfo eventType="distribution"><mods:dateIssued>$dist</mods:dateIssued></mods:originInfo></mods:mods></mets:dmdSec>""" +
              s"""<mets:structMap TYPE="LOGICAL"><mets:div TYPE="$source"/></mets:structMap></mets:mets>""")
          }
        }.toDF("doc_id", "record_identifier", "mets_xml")
      XmlProjections.projectMets(fetched, col("mets_xml"))
        .select(col("doc_id"), col("record_identifier"), col("mandator"),
          col("document_type"), col("distribution_date"))
        .orderBy(col("doc_id"))
    }),

    // ── ST2: checkpoint-advance decision table (all branches) ────────────
    "st2_offset_advance" -> ((s, dir) => {
      import s.implicits._
      // (case_id, last_token, resp_state, error_code, fc3)
      val cases = Seq(
        (1L, null.asInstanceOf[String], "absent", null.asInstanceOf[String], false),
        (2L, "tok", "absent", null.asInstanceOf[String], true),
        (3L, "tok", "absent", null.asInstanceOf[String], false),
        (4L, null.asInstanceOf[String], "empty", null.asInstanceOf[String], false),
        (5L, "tok", "empty", null.asInstanceOf[String], false),
        (6L, "tok", "value", null.asInstanceOf[String], false),
        (7L, "tok", "absent", "noRecordsMatch", false),
        (8L, "tok", "absent", "badResumptionToken", false),
        (9L, "tok", "absent", "badArgument", false)
      ).toDF("case_id", "last_token", "resp_state", "error_code", "fc3")
      val start  = lit("2024-03-01 10:00:00").cast("timestamp")
      val backup = lit("2024-02-01 00:00:00").cast("timestamp")
      cases.select(col("case_id"),
          OffsetStateMachine.nextFromColumn(col("last_token"),
            col("resp_state"), col("error_code"), backup, start, col("fc3"))
            .as("next_from"))
        .orderBy(col("case_id"))
    })
  )

  /** Self-authored minimal METS document (shape per reference fixtures,
    * `MetsProcessor.java:67-69` XPaths). */
  private def metsXml(mandator: String, docType: String, dist: String): String =
    s"""<mets:mets xmlns:mets="http://www.loc.gov/METS/" xmlns:mods="http://www.loc.gov/mods/v3">
       |<mets:metsHdr><mets:agent ROLE="EDITOR" TYPE="ORGANIZATION"><mets:name>$mandator</mets:name></mets:agent></mets:metsHdr>
       |<mets:dmdSec><mets:mdWrap><mets:xmlData><mods:mods>
       |<mods:originInfo eventType="distribution"><mods:dateIssued>$dist</mods:dateIssued></mods:originInfo>
       |</mods:mods></mets:xmlData></mets:mdWrap></mets:dmdSec>
       |<mets:structMap TYPE="LOGICAL"><mets:div TYPE="$docType"/></mets:structMap>
       |</mets:mets>""".stripMargin

  private def metsXmlNoAgent(docType: String, dist: String): String =
    s"""<mets:mets xmlns:mets="http://www.loc.gov/METS/" xmlns:mods="http://www.loc.gov/mods/v3">
       |<mets:metsHdr></mets:metsHdr>
       |<mets:dmdSec><mets:mdWrap><mets:xmlData><mods:mods>
       |<mods:originInfo eventType="distribution"><mods:dateIssued>$dist</mods:dateIssued></mods:originInfo>
       |</mods:mods></mets:xmlData></mets:mdWrap></mets:dmdSec>
       |<mets:structMap TYPE="LOGICAL"><mets:div TYPE="$docType"/></mets:structMap>
       |</mets:mets>""".stripMargin

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_discount), 6) AS avg_disc,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        | AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_revenue_by_nation" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin,

    "q9_product_type_profit" ->
      """SELECT n_name AS nation,
        | CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_profit_cents,
        | CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q18_large_volume_customer" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | CAST(round(o_totalprice*100) AS BIGINT) AS o_totalprice_cents,
        | sum_qty
        |FROM (SELECT l_orderkey, CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING CAST(round(sum(l_quantity)) AS BIGINT) > 300) big
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice_cents DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,

    "f1_filter_qucosa_id" ->
      """SELECT doc_id, record_identifier FROM (
        | SELECT doc_id, 'oai:example.org:' ||
        |  CASE WHEN doc_id % 7 = 0 THEN 'qucosa:' || CAST(doc_id AS VARCHAR)
        |       ELSE 'fedora-system:' || CAST(doc_id AS VARCHAR) END AS record_identifier
        | FROM documents) t
        |WHERE regexp_matches(record_identifier, '^.+qucosa:[0-9]+$')
        |ORDER BY doc_id""".stripMargin,

    "f2_validate_required" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 13 <> 0 AND lang IS NOT NULL AND trim(lang) <> ''
        | AND n_chars IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "f3_filter_flag" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "a1_top1_by_seq" ->
      "SELECT * FROM events ORDER BY event_id DESC LIMIT 1",

    "a2_count_rows" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem",

    "a3_dedup_last_write_wins" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "l1_limit_batch" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 100",

    "u1_merge_headers" ->
      """SELECT event_id, ts, user_id, event_type,
        | CASE WHEN event_id % 10 BETWEEN 3 AND 7 THEN value + 1000.0 ELSE value END AS value,
        | props
        |FROM events
        |WHERE event_id % 10 < 5 OR event_id % 10 BETWEEN 3 AND 7
        |ORDER BY event_id""".stripMargin,

    "u2_merge_reporting_docs" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END AS lang,
        | source
        |FROM documents WHERE doc_id % 2 = 0 OR doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin,

    "u3_append_run_result" ->
      """SELECT CAST(row_number() OVER (ORDER BY run_day) AS BIGINT) AS id,
        | run_day, n_events, max_ts
        |FROM (SELECT date_trunc('day', ts) AS run_day,
        |  CAST(count(*) AS BIGINT) AS n_events, max(ts) AS max_ts
        | FROM events GROUP BY 1) t
        |ORDER BY id""".stripMargin,

    "u4_sql_row_dml" ->
      """WITH seed AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 300),
        |src AS (SELECT doc_id, n_chars FROM documents
        |        WHERE doc_id BETWEEN 150 AND 449),
        |merged AS (
        |  SELECT s.doc_id,
        |    CASE WHEN x.doc_id IS NOT NULL THEN x.n_chars + 1000000
        |         ELSE s.n_chars END AS n_chars
        |  FROM seed s LEFT JOIN src x ON s.doc_id = x.doc_id
        |  WHERE x.doc_id IS NULL OR x.doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id, n_chars FROM src WHERE doc_id >= 300
        |),
        |upd AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN CAST(0 AS BIGINT)
        |       ELSE n_chars END AS n_chars FROM merged)
        |SELECT doc_id, n_chars FROM upd WHERE doc_id % 11 <> 0
        |ORDER BY doc_id""".stripMargin,

    "u5_change_feed" ->
      """WITH a AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 400),
        |c AS (SELECT doc_id,
        |        CASE WHEN doc_id BETWEEN 200 AND 599 AND doc_id % 3 = 0
        |             THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |      FROM documents WHERE doc_id < 600 AND doc_id % 5 <> 0)
        |SELECT * FROM (
        |  SELECT 'delete' AS change_type, a.doc_id, a.n_chars
        |  FROM a LEFT JOIN c ON a.doc_id = c.doc_id WHERE c.doc_id IS NULL
        |  UNION ALL
        |  SELECT 'insert' AS change_type, c.doc_id, c.n_chars
        |  FROM c LEFT JOIN a ON a.doc_id = c.doc_id WHERE a.doc_id IS NULL
        |  UNION ALL
        |  SELECT 'update_preimage' AS change_type, a.doc_id, a.n_chars
        |  FROM a JOIN c ON a.doc_id = c.doc_id
        |  WHERE a.n_chars IS DISTINCT FROM c.n_chars
        |  UNION ALL
        |  SELECT 'update_postimage' AS change_type, c.doc_id, c.n_chars
        |  FROM a JOIN c ON a.doc_id = c.doc_id
        |  WHERE a.n_chars IS DISTINCT FROM c.n_chars
        |) ORDER BY doc_id, change_type""".stripMargin,

    // the pruned read is a superset + residual filter, so the oracle
    // is the plain predicate over the same rows
    "u9_zonemap_scan" ->
      """SELECT lang, doc_id, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars > 300
        |ORDER BY doc_id""".stripMargin,

    // the split is a pure rewrite: the cross-boundary net diff equals
    // u5's un-split one, so the oracle is the same snapshot diff
    "u8_split_feed" ->
      """WITH a AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 400),
        |c AS (SELECT doc_id,
        |        CASE WHEN doc_id BETWEEN 200 AND 599 AND doc_id % 3 = 0
        |             THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |      FROM documents WHERE doc_id < 600 AND doc_id % 5 <> 0)
        |SELECT * FROM (
        |  SELECT 'delete' AS change_type, a.doc_id, a.n_chars
        |  FROM a LEFT JOIN c ON a.doc_id = c.doc_id WHERE c.doc_id IS NULL
        |  UNION ALL
        |  SELECT 'insert' AS change_type, c.doc_id, c.n_chars
        |  FROM c LEFT JOIN a ON a.doc_id = c.doc_id WHERE a.doc_id IS NULL
        |  UNION ALL
        |  SELECT 'update_preimage' AS change_type, a.doc_id, a.n_chars
        |  FROM a JOIN c ON a.doc_id = c.doc_id
        |  WHERE a.n_chars IS DISTINCT FROM c.n_chars
        |  UNION ALL
        |  SELECT 'update_postimage' AS change_type, c.doc_id, c.n_chars
        |  FROM a JOIN c ON a.doc_id = c.doc_id
        |  WHERE a.n_chars IS DISTINCT FROM c.n_chars
        |) ORDER BY doc_id, change_type""".stripMargin,

    "u6_ivm_aggregate" ->
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id BETWEEN 200 AND 599 AND doc_id % 7 = 0
        |         THEN 'xx' ELSE lang END AS lang,
        |    CASE WHEN doc_id BETWEEN 200 AND 599 AND doc_id % 3 = 0
        |         THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id < 600 AND doc_id % 5 <> 0)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

    "u7_schema_evolution" ->
      """SELECT doc_id, n_chars,
        |  CASE WHEN doc_id BETWEEN 200 AND 599 THEN lang END AS lang
        |FROM documents WHERE doc_id < 600
        |ORDER BY doc_id""".stripMargin,

    "d1_delete_if_unmodified" ->
      """SELECT e.* FROM events e WHERE NOT EXISTS (
        | SELECT 1 FROM (
        |   SELECT event_id,
        |    CASE WHEN event_id % 10 = 0 THEN ts + INTERVAL 1 HOUR ELSE ts END AS ts,
        |    user_id, event_type, value, props
        |   FROM events WHERE value >= 100) p
        | WHERE p.event_id IS NOT DISTINCT FROM e.event_id AND p.ts IS NOT DISTINCT FROM e.ts
        |  AND p.user_id IS NOT DISTINCT FROM e.user_id
        |  AND p.event_type IS NOT DISTINCT FROM e.event_type
        |  AND p.value IS NOT DISTINCT FROM e.value AND p.props IS NOT DISTINCT FROM e.props)
        |ORDER BY event_id""".stripMargin,

    "d1_survivors" ->
      """SELECT event_id,
        | CASE WHEN event_id % 10 = 0 THEN ts + INTERVAL 1 HOUR ELSE ts END AS ts,
        | user_id, event_type, value, props
        |FROM events WHERE value >= 100 AND event_id % 10 = 0
        |ORDER BY event_id""".stripMargin,

    "d2_retention_keep_latest" ->
      """SELECT e.* FROM events e, (SELECT max(event_id) AS mx FROM events) m
        |WHERE e.ts > TIMESTAMP '2024-01-25 00:00:00' OR e.ts IS NULL
        |   OR e.event_id = m.mx
        |ORDER BY event_id""".stripMargin,

    "sf1_ts_parse" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
        |      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '+02:00'
        |      ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '+0200' END AS iso,
        | CASE WHEN o_orderkey % 3 = 0 THEN o_orderdate
        |      ELSE o_orderdate - INTERVAL 2 HOUR END AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sf2_ts_format_dual" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS fc3_format,
        | strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || 'Z' AS spec_format
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sf3_ts_arith" ->
      """SELECT event_id, ts - INTERVAL 48 HOUR AS cutoff_ts,
        | CAST(epoch_ms(ts) - epoch_ms(date_trunc('day', ts)) AS BIGINT) AS ms_since_midnight
        |FROM events ORDER BY event_id""".stripMargin,

    "sf4_str_local_id" ->
      """SELECT doc_id,
        | substring('oai:example.org:qucosa:' || CAST(doc_id AS VARCHAR),
        |   instr(substring('oai:example.org:qucosa:'
        |     || CAST(doc_id AS VARCHAR), 5), ':') + 5) AS local_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p1_xml_headers_project" ->
      """SELECT doc_id,
        | 'oai:example.org:qucosa:' || CAST(doc_id AS VARCHAR) AS record_identifier,
        | TIMESTAMP '2024-01-02 03:04:05' AS datestamp,
        | CASE WHEN doc_id % 2 = 0 THEN lang || ',' || source ELSE '' END AS set_spec_csv,
        | doc_id % 4 = 0 AS status_is_deleted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p2_envelope_tristate" ->
      """SELECT doc_id,
        | TIMESTAMP '2014-06-08 11:43:00' AS response_date,
        | CASE WHEN doc_id % 3 = 0 THEN 'absent'
        |      WHEN doc_id % 3 = 1 THEN 'empty' ELSE 'value' END AS token_state,
        | CASE WHEN doc_id % 3 = 0 THEN NULL
        |      WHEN doc_id % 3 = 1 THEN ''
        |      ELSE 'tok' || CAST(doc_id AS VARCHAR) END AS resumption_token,
        | CASE WHEN doc_id % 3 = 2 THEN TIMESTAMP '2014-06-09 18:34:15'
        |      ELSE NULL END AS token_expiration
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p3_errors_project" ->
      """SELECT doc_id, code, message FROM (
        | SELECT doc_id, 'noRecordsMatch' AS code, 'no records' AS message
        | FROM documents WHERE doc_id % 2 = 0
        | UNION ALL
        | SELECT doc_id, 'badArgument', 'bad arg' FROM documents WHERE doc_id % 2 = 1
        | UNION ALL
        | SELECT doc_id, 'badVerb', 'bad verb' FROM documents WHERE doc_id % 2 = 1) t
        |ORDER BY doc_id, code""".stripMargin,

    "p4_mets_project" ->
      """SELECT CAST(rec_id AS BIGINT) AS rec_id, mandator, document_type,
        | distribution_date FROM (VALUES
        | (1, 'slub', 'in_book', TIMESTAMP '2016-05-24 10:33:56'),
        | (2, 'SLUB', 'issue', TIMESTAMP '2008-08-04 00:00:00'),
        | (3, 'TU Dresden', 'article', TIMESTAMP '2016-10-10 09:27:33'),
        | (4, NULL, 'issue', TIMESTAMP '2011-03-31 00:00:00'))
        | AS t(rec_id, mandator, document_type, distribution_date)
        |ORDER BY rec_id""".stripMargin,

    "set_except" ->
      """SELECT event_id, user_id, event_type FROM events
        |EXCEPT
        |SELECT event_id, user_id, event_type FROM events WHERE value >= 50
        |ORDER BY event_id""".stripMargin,

    "set_intersect" ->
      """SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT event_id, user_id, event_type FROM events WHERE value >= 50
        |ORDER BY event_id""".stripMargin,

    "set_except_all" ->
      """SELECT user_id, event_type FROM events
        |EXCEPT ALL
        |SELECT user_id, event_type FROM events WHERE value >= 50
        |ORDER BY user_id, event_type""".stripMargin,

    "set_intersect_all" ->
      """SELECT user_id, event_type FROM events WHERE event_type IN ('click', 'view')
        |INTERSECT ALL
        |SELECT user_id, event_type FROM events WHERE value >= 50
        |ORDER BY user_id, event_type""".stripMargin,

    "join_anti" ->
      """SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin,

    "agg_corr_stats" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        | round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
        | round(stddev_samp(l_quantity), 6) AS qty_stddev,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // UNION ALL long form — portable across engines, same metric names
    // and value types as the Spark unpivot.
    "agg_unpivot" ->
      """WITH w AS (SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  CAST(count(*) AS DOUBLE) AS n_rows, round(avg(l_discount), 6) AS avg_disc
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        | SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        | UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w
        | UNION ALL SELECT l_returnflag, 'avg_disc', avg_disc FROM w) u
        |ORDER BY l_returnflag, metric""".stripMargin,

    // DECIMAL(12,2) summation is exact in both engines; only the total
    // casts back to double. Frame keys are exact microsecond epochs.
    "window_rolling_range" ->
      """SELECT event_id, user_id,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
        |   PARTITION BY user_id ORDER BY epoch_us(ts)
        |   RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
        |FROM events ORDER BY event_id""".stripMargin,

    "join_semi" ->
      """SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin,

    "window_running" ->
      """SELECT event_id, user_id,
        | CAST(row_number() OVER w AS BIGINT) AS rn,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
        | lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "s2_mets_enrichment" ->
      """SELECT doc_id,
        | 'oai:example.org:qucosa:' || CAST(doc_id AS VARCHAR) AS record_identifier,
        | lang AS mandator, source AS document_type,
        | TIMESTAMP '2020-01-01 00:00:00' + (doc_id % 28) * INTERVAL 1 DAY AS distribution_date
        |FROM documents ORDER BY doc_id""".stripMargin,

    "st2_offset_advance" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, next_from FROM (VALUES
        | (1, TIMESTAMP '2024-03-01 10:00:00'),
        | (2, TIMESTAMP '2024-03-01 10:00:00'),
        | (3, TIMESTAMP '2024-02-01 00:00:00'),
        | (4, TIMESTAMP '2024-02-01 00:00:00'),
        | (5, TIMESTAMP '2024-03-01 10:00:00'),
        | (6, TIMESTAMP '2024-02-01 00:00:00'),
        | (7, TIMESTAMP '2024-03-01 10:00:00'),
        | (8, TIMESTAMP '2024-02-01 00:00:00'),
        | (9, TIMESTAMP '2024-02-01 00:00:00'))
        | AS t(case_id, next_from)
        |ORDER BY case_id""".stripMargin
  )
}
