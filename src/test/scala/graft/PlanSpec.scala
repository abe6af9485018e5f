package graft

/** Physical-plan assertions for the headline queries — the scale
  * contract, held as tests: filters reach the parquet scan, projections
  * prune the read schema, small sides broadcast, top-k avoids global
  * sorts, and aggregates combine map-side. A regression here is a 100 TB
  * performance bug even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  /** A filter fragment appears inside a scan's PushedFilters list,
    * regardless of where Catalyst ordered it — inferred IsNotNull
    * constraints can sort ahead of the interesting predicate, so literal
    * list-prefix asserts are order-brittle (r19 shipped red on exactly
    * that).
    */
  private def pushedToScan(p: String, frag: String): Boolean =
    p.linesIterator.exists(l => l.contains("PushedFilters: [") && l.contains(frag))

  test("q1: shipdate filter pushed to scan, columns pruned, map-side combine") {
    val p = plan("q1_pricing_summary")
    assert(pushedToScan(p, "LessThanOrEqual(l_shipdate"), s"shipdate bound not pushed\n$p")
    // 6 of 11 lineitem columns read; the partkey/suppkey/tax trio must not be
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey") && !p.contains("l_tax"))
    assert(p.contains("partial_sum"))
  }

  test("q3: dimension joins broadcast; LIMIT 10 via TakeOrderedAndProject") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(pushedToScan(p, "EqualTo(c_mktsegment,BUILDING)"), s"segment filter not pushed\n$p")
  }

  test("q5: every dimension join broadcasts (no shuffle join in the chain)") {
    val p = plan("q5_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 4)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q9: part/supplier/nation dims broadcast, only the fact-fact join shuffles, no cartesian") {
    val p = plan("q9_product_type_profit")
    // three dimension joins broadcast (part is filter-shrunk, supplier
    // and nation are small); lineitem⋈orders is the one legitimate
    // shuffle join
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q9 fell back to a product\n$p")
    // the p_name filter reaches the part scan (no full-part broadcast)
    assert(p.contains("StringContains(p_name,red)"), p)
    // per-(nation, year) aggregate combines map-side before the exchange
    assert(p.contains("partial_sum"), p)
  }

  test("q18: order-cardinality aggregate combines map-side, lineitem read once, top-100 is TakeOrderedAndProject, no cartesian") {
    val p = plan("q18_large_volume_customer")
    // the HAVING aggregate IS the projection aggregate — lineitem must
    // be scanned exactly once (the canonical SQL's self-semi-join
    // collapses into reuse)
    assert("lineitem\\.parquet".r.findAllMatchIn(p).size == 1,
      s"lineitem scanned more than once\n$p")
    // order-cardinality group-by still combines map-side
    assert(p.contains("partial_sum"), p)
    // top-100 bounds via TakeOrderedAndProject, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q18 fell back to a product\n$p")
  }

  test("d1: full-tuple conditional delete plans as a broadcast anti-join") {
    val p = plan("d1_delete_if_unmodified")
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("a1: top-1-by-sequence avoids a global sort (per-partition top-1 + driver merge)") {
    val p = plan("a1_top1_by_seq")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("rangepartitioning"))
  }

  test("ivf: corpus centroid assignment is narrow (no corpus-wide shuffle)") {
    val p = plan("ann_ivf_topk")
    // broadcast probe join, no sort-merge; shuffles limited to the widen
    // repartition, the TWO top-k window phases (salted partial + global),
    // and the output sort
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert("Exchange (?!SinglePartition)".r.findAllMatchIn(p).size <= 5, p)
  }

  test("asof/range joins: no nested-loop or cartesian fallback") {
    for (q <- Seq("join_asof", "join_range")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q fell back to BNLJ\n$p")
      assert(!p.contains("CartesianProduct"), s"$q fell back to cartesian\n$p")
    }
  }

  test("ann top-k: no single-partition-per-query sort of the full candidate set") {
    for (q <- Seq("ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk")) {
      val p = plan(q)
      // phase 1: a window partitioned by (q_id, salt) bounds what any
      // final per-query partition can receive to salts × k rows
      assert(p.contains("__salt"), s"$q lost the salted partial top-k phase\n$p")
      // and Spark's rank-limit pushdown caps rows BEFORE each exchange
      assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
        s"$q lost the partial window-group-limit pushdown\n$p")
    }
  }

  test("dup-ngram coverage: fused kernel leaves only the output sort exchange") {
    val p = plan("text_dup_ngram_frac")
    // the per-document kernel removed the (doc, gram) window and the
    // position-distinct shuffle: no Window, no aggregate, one exchange
    assert(!p.contains("Window"), s"window reappeared\n$p")
    assert(!p.contains("HashAggregate"), s"aggregate reappeared\n$p")
    assert("Exchange".r.findAllMatchIn(p).size == 1, p)
  }

  test("hard negatives: label filter applies before the salted top-k, queries broadcast") {
    val p = plan("ann_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries not broadcast\n$p")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("__salt"), s"lost the salted partial top-k phase\n$p")
  }

  test("strict funnel: one keyed shuffle over type-pruned events, stage filter at the scan") {
    val p = plan("events_funnel_strict")
    // the stage-type isin prune must reach the parquet scan
    assert(pushedToScan(p, "In(event_type"), s"type prune not pushed\n$p")
    // no per-stage join chain over the event table: the funnel fold is
    // one aggregate; joins are only the tiny distinct-users stitch
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bpe encode: the whole tokenization is one projection — no agg, no join, only the sort exchange") {
    val p = plan("text_bpe_encode")
    // training collected its merges at construction; the ENCODE plan
    // must be scan → (replace-chain projection) → sort, nothing else
    assert(!p.contains("HashAggregate"), s"aggregate leaked into encode\n$p")
    assert(!p.contains("Join"), s"join leaked into encode\n$p")
    assert(!"\\bWindow\\b".r.findFirstIn(p).isDefined, s"window leaked into encode\n$p")
    assert("Exchange".r.findAllMatchIn(p).size == 1, p)
  }

  test("unigram encode: tokenization is one kernel projection — no agg, no join, only the sort exchange") {
    val p = plan("text_unigram_encode")
    // training ran its bounded EM actions at construction; the ENCODE
    // plan must be scan → (per-word Viterbi-kernel projection) → sort
    assert(!p.contains("HashAggregate"), s"aggregate leaked into encode\n$p")
    assert(!p.contains("Join"), s"join leaked into encode\n$p")
    assert("Exchange".r.findAllMatchIn(p).size == 1, p)
  }

  test("trained langid: scoring is a zero-shuffle literal-table projection (only the sort exchange)") {
    val p = plan("text_langid_trained")
    assert(!p.contains("HashAggregate"), s"aggregate leaked into scoring\n$p")
    assert(!p.contains("Join"), s"join leaked into scoring\n$p")
    assert("Exchange".r.findAllMatchIn(p).size == 1, p)
  }

  test("temperature mixture: the sample is a narrow filter — no join, only the sort exchange") {
    val p = plan("corpus_mix_temperature")
    // per-source totals were collected at construction; the returned
    // plan is scan → token-count projection → hash-threshold filter
    assert(!p.contains("Join"), s"join leaked into the sample\n$p")
    assert(!p.contains("HashAggregate"), s"aggregate leaked into the sample\n$p")
    assert("Exchange".r.findAllMatchIn(p).size == 1, p)
  }

  test("recall probe: truth pass broadcasts queries and keeps the salted top-k shape") {
    val p = plan("ann_recall_probe")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries not broadcast\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("__salt"), s"lost the salted partial top-k phase\n$p")
  }

  test("audio decode: doc filter pushed to scan, decode stays narrow (only the sort exchange)") {
    val p = plan("multimodal_audio")
    assert(p.contains("LessThan(doc_id,100)"), s"id filter not pushed\n$p")
    assert("Exchange".r.findAllMatchIn(p).size == 1, p)
  }

  test("image dedup: candidates pair through the banded equi-join, never all-pairs") {
    val p = plan("multimodal_dedup")
    assert(!p.contains("CartesianProduct"), s"all-pairs join\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"all-pairs join\n$p")
    // the (band, band-bits) bucket join is an equi-join on band keys
    assert(p.contains("band"), s"band keys missing from the join\n$p")
  }

  test("winnow: selection is array arithmetic in the projection — no Window operator") {
    val p = plan("text_winnow")
    // the per-doc windowed-min runs as a fold inside the scan
    // projection; a Window operator here means the explode+window
    // formulation (and its doc-keyed exchange + sort) regressed
    assert(!p.contains("RunningWindowFunction") && !p.contains("WindowExec")
      && !"\\bWindow\\b".r.findFirstIn(p).isDefined, s"window reappeared\n$p")
  }

  test("f3: predicate on the flag column reaches the scan") {
    val p = plan("f3_filter_flag")
    assert(p.contains("EqualTo(l_returnflag,R)"))
    assert(!p.contains("l_extendedprice")) // pruned
  }

  test("domain quota: rank bound pushes a partial WindowGroupLimit below the shuffle") {
    val p = plan("corpus_domain_quota")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"quota rank not partially limited before the exchange\n$p")
  }

  test("decontaminate: benchmark shingles broadcast; corpus side never shuffles") {
    val p = plan("corpus_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"decontamination lost the broadcast semi-join\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("decontaminate fallback: over-budget benchmark drops the forced broadcast hint") {
    // the guard removes OUR unconditional broadcast() hint and returns
    // the decision to Catalyst's size estimation — which at a real
    // over-threshold benchmark picks a shuffle join. The tiny fixture
    // would still auto-broadcast on statistics, so emulate the at-scale
    // estimate by disabling auto-broadcast for this plan.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      val q = graft.ops.Corpus.decontaminate(
        docs, docs.limit(50), "doc_id", "text", maxBroadcastShingles = 1L)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("LeftSemi"), s"fallback lost semi-join semantics\n$p")
      assert(!p.contains("BroadcastHashJoin"),
        s"over-budget benchmark must not force a broadcast\n$p")
      // and the normal path DOES force the broadcast even without
      // Catalyst's size estimate backing it
      val forced = graft.ops.Corpus.decontaminate(
        docs, docs.limit(50), "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(forced.contains("BroadcastHashJoin"))
    } finally spark.conf.set(key, prev)
  }

  test("semantic decontamination: candidate and anti joins both broadcast — corpus never sort-merges") {
    val p = plan("corpus_decontaminate_semantic")
    assert(p.contains("BroadcastHashJoin"),
      s"semantic decontamination lost the broadcast candidate join\n$p")
    assert(p.contains("LeftAnti"),
      s"semantic decontamination lost the anti join\n$p")
    // post-aggregation stats are opaque: without the probed hint the
    // anti join would sort-merge and shuffle the whole corpus
    assert(!p.contains("SortMergeJoin"), s"corpus side must not shuffle\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"bucket join must stay an equi-join\n$p")
  }

  test("token-budget mixture: the sample itself is a narrow filter on the scan") {
    val p = plan("corpus_mix_budget")
    // the per-source totals are a separate collected aggregate; the
    // surviving plan is scan → filter(+sort for the oracle ordering) —
    // no join against the totals, no exchange below the filter
    assert(!p.contains("Join"), s"mixture must inline rates as literals\n$p")
    val filterIdx = p.indexOf("Filter")
    val exchangeIdx = p.lastIndexOf("Exchange")
    assert(filterIdx >= 0)
    assert(exchangeIdx < filterIdx,
      s"no exchange may sit below the mixture filter\n$p")
  }

  test("stratified sample: pure narrow filter — no exchange before the scan filter") {
    val q = graft.ops.Corpus.sampleStratified(
      Tables.documents(spark, sf0001), "doc_id", "lang",
      Map("en" -> 0.5), 0.1)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle\n$p")
  }

  test("salted join: join keys carry the salt, so hot keys split across reducers") {
    val p = plan("join_salted_skew")
    assert(p.contains("__graft_salt"), s"salt column missing from the join\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("pack/shuffle: windows are shard-partitioned, never single-partition") {
    for (q <- Seq("corpus_pack_chunks", "corpus_global_shuffle")) {
      // executedPlan includes the final orderBy's range partitioning (the
      // oracle-stable output sort) — assert on the WINDOW partitioning:
      // hashpartitioning on the shard key, and no SinglePartition window
      val p = plan(q)
      assert("Window .*\\[shard".r.findFirstIn(p.replace("\n", " ")).isDefined
        || p.contains("hashpartitioning(shard"), s"$q window not shard-keyed\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q has a global window\n$p")
    }
  }

  test("bpe pairs: map-side combined count, top-k without a global sort") {
    val p = plan("text_bpe_pairs")
    assert(p.contains("partial_count"), s"pair count not map-side combined\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 should be TakeOrdered\n$p")
  }

  test("scd2: lead window partitioned by the dimension key, no global window") {
    val p = plan("scd2_intervals")
    assert(p.contains("hashpartitioning(o_custkey"), s"window not custkey-keyed\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"global window\n$p")
  }

  test("tfidf: per-doc rank bound pushes a partial WindowGroupLimit; counts combine map-side") {
    val p = plan("text_tfidf_topk")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"tfidf top-k rank not partially limited before the exchange\n$p")
    assert(p.contains("partial_count"), "tf/df counts should partially aggregate")
    // corpus N rides inside the plan as a broadcast one-row subtree …
    assert(p.contains("__graft_n_docs"),
      s"corpus N not folded into the plan as a broadcast scalar\n$p")
  }

  test("tfidf: query construction is lazy — no eager count() job for corpus N") {
    // The old implementation ran `df.count()` while BUILDING the query —
    // a full extra corpus action at 100 TB. Constructing the DataFrame
    // must now schedule zero Spark jobs. Ordering trick: the listener
    // bus is FIFO, so once a later marker job is observed, any job the
    // construction had launched would already be in the map.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val sc = spark.sparkContext
    val groups = scala.collection.concurrent.TrieMap.empty[Int, String]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        groups(js.jobId) = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
    }
    sc.addSparkListener(listener)
    try {
      // In-memory input: the full query's parquet read runs a (legit)
      // schema-inference job; the regression under guard is tfidfTopK
      // itself running an action during construction.
      val s = spark
      import s.implicits._
      val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
      sc.setJobGroup("tfidf-construct", "construction must be lazy", false)
      graft.ops.TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      sc.setJobGroup("tfidf-marker", "bus drain marker", false)
      spark.range(1).count()
      val deadline = System.nanoTime() + 30e9.toLong
      while (!groups.values.exists(_ == "tfidf-marker")
        && System.nanoTime() < deadline) Thread.sleep(20)
      assert(groups.values.exists(_ == "tfidf-marker"), "marker job never observed")
      assert(!groups.values.exists(_ == "tfidf-construct"),
        "building text_tfidf_topk launched Spark jobs (eager corpus count)")
    } finally { sc.removeSparkListener(listener); sc.clearJobGroup() }
  }

  test("span dedup: owner election is a map-side-combined agg, no per-key window, no cartesian") {
    val p = plan("text_dedup_spans")
    // the duplicated-key test + owner election must partial-aggregate on
    // the mappers (skew immunity for hot boilerplate spans) …
    assert(p.contains("partial_min") || p.contains("partial_max"),
      "owner election should partially aggregate map-side")
    // … and never fall back to a pairwise or single-partition shape
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window [")
      || !p.contains("Window [, "), "no empty-partition global window")
    assert(!p.contains("SinglePartition"), "no single-partition exchange")
  }

  test("runtime bloom filter: Spark injects might_contain into the big side of a selective shuffle join") {
    // At 100 TB the optimizer's runtime bloom filter prunes the fact-side
    // shuffle of a selective dim join. The size thresholds that gate the
    // rewrite never fire on KB-scale test data, so lower them to observe
    // the injected filter — the production configs stay at defaults.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      c.set("spark.sql.adaptive.enabled", "false")
      val li = Tables.lineitem(spark, sf0001)
      val o = Tables.orders(spark, sf0001)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val p = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), s"no runtime bloom filter injected\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("exact-n sample: rank bound pushes a partial WindowGroupLimit below the shuffle") {
    val p = plan("corpus_sample_exact_n")
    assert(p.contains("WindowGroupLimit"),
      s"srank <= n should push a group limit\n$p")
    assert(p.contains("Partial") || p.contains("partial"),
      s"the limit should run map-side before the exchange\n$p")
  }

  test("chunk overlap: pure narrow map + explode — no exchange at all") {
    val df = graft.ops.Corpus.chunkOverlap(
      Tables.documents(spark, sf0001).select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")),
      "doc_id", "text", chunkTokens = 40, strideTokens = 30)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle\n$p")
  }

  test("bm25: posting lists filtered before the one doc-id shuffle; top-k is TakeOrdered") {
    val p = plan("text_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k should be per-partition heads + driver merge\n$p")
    assert(p.contains("partial_max") || p.contains("partial_sum"),
      s"per-doc agg should combine map-side\n$p")
    // the isin(queryTerms) filter must sit below the aggregate's exchange:
    // shuffled rows are query-term occurrences, not the whole token stream
    // (" IN (" prints only in the Filter node; children print after parents)
    val exchangeIdx = p.indexOf("Exchange")
    val filterIdx = p.indexOf(" IN (")
    assert(filterIdx > exchangeIdx && exchangeIdx >= 0,
      s"query-term filter should be below (printed after) the shuffle\n$p")
  }

  test("lm score: bigram model combines map-side; scoring join is a shuffle join (vocab does not broadcast at scale)") {
    val p = plan("text_lm_score")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bigram counts should combine map-side\n$p")
  }

  test("pq: coded corpus streams narrow through ADC; rerank fetch broadcasts the candidates") {
    val p = plan("ann_pq_topk")
    // the ADC stage reads (id, codes) with broadcast queries — the full
    // corpus vectors must not shuffle; the only hash exchanges are the
    // salted top-k phases (keyed on q_id) and the rerank joins, whose
    // small sides broadcast
    assert(p.contains("graft_pq_adc"), s"ADC kernel missing\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"candidate/query sides should broadcast\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-shuffling join in the PQ path\n$p")
  }

  test("zorder: interleave is codegen'd integer arithmetic — no UDF, no shuffle") {
    val p = plan("layout_zorder")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"zorder must be pure column arithmetic\n$p")
    // the interleave is plain shift/mask expressions inside the Project
    assert(p.contains("shiftleft") || p.contains("<<"),
      s"zval should be shift/mask arithmetic in the projection\n$p")
  }

  test("cluster balance: quota rank bound pushes a partial WindowGroupLimit below the shuffle") {
    val p = plan("corpus_cluster_balance")
    assert(p.contains("WindowGroupLimit"),
      s"qrank <= quota should push a group limit\n$p")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"the limit should run map-side before the cluster exchange\n$p")
    // assignment is a literal argmax — no join against a centroid table
    assert(!p.contains("SortMergeJoin"),
      s"centroid assignment must not join\n$p")
  }

  test("quality report: one narrow pass + one map-side-combined aggregate, no joins") {
    val p = plan("corpus_quality_report")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"per-source counters should combine map-side\n$p")
    assert(!p.contains("Join"), s"the report must not join\n$p")
    // exactly one data exchange (source-keyed aggregate); the orderBy
    // adds a range exchange for presentation only
    val hashExchanges = "Exchange hashpartitioning".r.findAllMatchIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange, got $hashExchanges\n$p")
  }

  test("rrf fusion: fuses two top-k lists — the corpus never reaches the fusion aggregate") {
    val p = plan("search_rrf_fusion")
    // both rankers reduce before the union: bm25's TakeOrdered and the
    // brute-force top-k's WindowGroupLimit are both present
    assert(p.contains("TakeOrderedAndProject"),
      s"bm25 leg should reduce via TakeOrdered\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"cosine leg should reduce via the two-phase top-k\n$p")
  }

  test("incremental bm25: scoring tops out via TakeOrderedAndProject over the bucket slice") {
    val pl = plan("text_bm25_incr")
    assert(pl.contains("TakeOrderedAndProject"),
      s"top-k must avoid a global sort:\n$pl")
    // the probe scores from the postings slice; the corpus TEXT never
    // enters the scoring plan (it lives only in the ingest phase)
    assert(!pl.contains("ReadSchema: struct<doc_id:bigint,text:string"),
      s"scoring plan must read the index, not the corpus text:\n$pl")
  }

  test("state-table scan reports manifest statistics: exact rows/bytes cold, broadcast without AQE") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-plan-stats").toString
    val t = new graft.pipeline.BucketedStateTable(spark, s"$dir/state",
      keyCols = Seq("k"), numBuckets = 8, retentionFloorMillis = 0L,
      statsCols = Seq("v"))
    t.merge(spark.range(500)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("v")),
      keys = Seq("k"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dim = spark.read.format("graft-state").load(s"$dir/state")
      val fact = spark.range(200000)
        .select(concat(lit("k"), col("id") % 1000).as("k"),
          col("id").as("x"))
      val joined = fact.join(dim, Seq("k"))
      // COLD broadcast: no AQE, no catalog stats — the join strategy
      // must see the manifest-reported size at plan time
      assert(joined.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        s"a small state dimension must broadcast cold:\n${joined.queryExecution.executedPlan}")
      // the reported statistics are the manifest's zone-map sums, not
      // a file-listing guess: rowCount is EXACT
      val scanStats = joined.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.computeStats()
      }
      assert(scanStats.nonEmpty)
      assert(scanStats.head.rowCount.contains(BigInt(500)),
        s"rowCount must equal the manifest's zone-map rows sum, got ${scanStats.head.rowCount}")
      assert(scanStats.head.sizeInBytes > 0)

      // a bucket-pinning point lookup shrinks the statistics to the
      // one surviving bucket's recorded rows
      val point = dim.where(col("k") === "k7")
      val pointStats = point.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.computeStats()
      }.head
      val full = scanStats.head.rowCount.get
      assert(pointStats.rowCount.exists(rc => rc > 0 && rc < full),
        s"a point lookup's stats must shrink to its bucket: $pointStats vs full $full")

      // a COMPLETELY pushed aggregate changes what the scan emits
      // (one pre-aggregated row per file): the manifest sums would
      // describe the wrong relation, so the decoration must skip
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      try {
        val cnt = dim.agg(count(lit(1)).as("n"))
        val scans = cnt.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan
        }
        assert(scans.nonEmpty)
        assert(scans.forall(
          !_.isInstanceOf[graft.sources.ManifestStatsScan]),
          "a pushed-aggregate scan must not carry manifest statistics")
        assert(cnt.collect().head.getLong(0) == 500L)
      } finally
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
