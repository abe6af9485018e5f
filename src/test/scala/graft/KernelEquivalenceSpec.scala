package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.TextAnalysis

/** r20 optimization-round equivalence specs: every Column pipeline that
  * was fused into a codegen kernel this round is replayed here IN ITS
  * ORIGINAL FORM and compared row-for-row against the kernel on a
  * corpus slice plus adversarial planted shapes (null/empty/blank,
  * short docs, unicode, repeated grams, edge whitespace). The DuckDB
  * oracle already re-proves the md5 idioms end-to-end; these specs pin
  * the equivalence at the operator level so a future kernel edit that
  * drifts from the Column semantics fails HERE, with a named shape,
  * not as a round-gate hash mismatch. */
class KernelEquivalenceSpec extends SparkSpec {

  private lazy val base = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))

  private def planted = {
    val s2 = spark; import s2.implicits._
    Seq(
      (-1L, null.asInstanceOf[String]),
      (-2L, ""),
      (-3L, "   "),
      (-4L, "one"),
      (-5L, "one two"),
      (-6L, "one two three"),                // exactly k tokens (k=3)
      (-7L, "a b c d e f g h"),              // spans several windows
      (-8L, "x y x y x y x y x y"),          // heavy gram repetition
      (-9L, "  edge  \t whitespace\ncase "), // tabs/newlines inside
      (-10L, "日本 語 トークン 化 の 確認 です ね"), // non-ASCII tokens
      (-11L, ("dup " * 30).trim),            // one gram repeated
      (-12L, "p1 p2 p3 p4 p5 q1 q2 q3 p1 p2 p3 p4 p5 r1 r2")
    ).toDF("doc_id", "text")
  }

  private lazy val docs = base.unionByName(planted)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("winnow kernel == the original md5-Column window fold, every shape") {
    val k = 3; val window = 4
    // the ORIGINAL formulation (pre-r20), verbatim semantics
    val ghs = transform(TextAnalysis.ngramList(col("text"), k), g =>
      conv(substring(md5(g), 1, 8), 16, 10).cast("long"))
    val selType = "array<struct<gh:bigint,np:bigint>>"
    val zero = struct(lit(Long.MaxValue).as("gh"), lit(0L).as("np"))
    val sels = when(size(col("__ghs")) >= window,
      array_distinct(transform(
        sequence(lit(1), size(col("__ghs")) - window + 1),
        i => aggregate(sequence(i, i + window - 1), zero,
          (acc, j) => least(acc,
            struct(element_at(col("__ghs"), j).as("gh"),
              (-j).cast("long").as("np")))))))
      .otherwise(array().cast(selType))
    val old = docs.select(col("doc_id"), ghs.as("__ghs"))
      .select(col("doc_id"), explode(sels).as("__s"))
      .select(col("doc_id"), col("__s.gh").as("fp"), (-col("__s.np")).as("fp_pos"))
    val neu = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k, window)
    assert(rows(neu) == rows(old))
    assert(rows(neu).nonEmpty)
  }

  test("dsir kernels == the original per-feature md5 transform and literal-table fold") {
    val buckets = 64
    val feats = concat(TextAnalysis.ngramList(coalesce(col("text"), lit("")), 1),
      TextAnalysis.ngramList(coalesce(col("text"), lit("")), 2))
    val oldBuckets = transform(feats, w =>
      pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(buckets)))
    val old = docs.select(col("doc_id"), oldBuckets.as("b"))
    val neu = docs.select(col("doc_id"),
      call_function("graft_dsir_buckets", coalesce(col("text"), lit("")),
        lit(buckets)).as("b"))
    assert(rows(neu) == rows(old))

    val llr = (1 to buckets).map(i => math.log(i + 0.5) - 1.0)
    val table = typedLit(llr)
    val oldScore = docs.select(col("doc_id"),
      aggregate(oldBuckets, lit(0.0),
        (acc, b) => acc + element_at(table, (b + 1).cast("int"))).as("s"))
    val neuScore = docs.select(col("doc_id"),
      call_function("graft_dsir_score", coalesce(col("text"), lit("")),
        typedLit(llr)).as("s"))
    // bit-identical accumulation order is the contract, so compare raw
    assert(rows(neuScore) == rows(oldScore))
  }

  test("gopher_rep kernel == the nine standalone per-n kernel calls") {
    val t = coalesce(col("text"), lit(""))
    val rep = call_function("graft_gopher_rep", t)
    val checks = Seq(2, 3, 4).flatMap { n =>
      val st = call_function("graft_ngram_top", t, lit(n))
      Seq(
        (rep.getField(s"top${n}_pos") === st.getField("n_pos")).as(s"p$n"),
        (rep.getField(s"top${n}_cnt") === st.getField("top_count")).as(s"c$n"))
    } ++ Seq(5, 6, 7, 8, 9, 10).map { n =>
      val st = call_function("graft_dup_ngram_cov", t, lit(n))
      ((rep.getField(s"dup$n") === st.getField("n_dup_tokens")) &&
        (rep.getField("n_tokens") === st.getField("n_tokens"))).as(s"d$n")
    }
    val bad = docs.select(col("doc_id"), checks.reduce(_ && _).as("ok"))
      .filter(!col("ok")).count()
    assert(bad == 0L)
  }

  test("excise kernel == the original posexplode/anti-join/collect rebuild") {
    val s2 = spark; import s2.implicits._
    val w = 5
    // synthetic covered sets incl. empty, full coverage, dups, unsorted
    val rowsIn = Seq(
      (1L, "a b c d e f g", Seq.empty[Long]),
      (2L, "a b c d e f g", Seq(3L, 1L, 3L)),
      (3L, "a b c", Seq(1L, 2L, 3L)),
      (4L, "", Seq.empty[Long]),
      (5L, "solo", Seq(1L)),
      (6L, "x y z w v u t s", Seq(8L, 2L, 5L, 5L))
    ).toDF("id", "text", "cov")
    val toks = rowsIn.select(col("id"),
      filter(split(coalesce(col("text"), lit("")), "\\s+"), t => t =!= "")
        .as("__ts"), col("cov"))
      .withColumn("__n", size(col("__ts")).cast("long"))
    val old = {
      val covered = rowsIn.select(col("id"), explode(col("cov")).as("__p")).distinct()
      val pos = toks
        .select(col("id"), posexplode(col("__ts")).as(Seq("__p0", "__tok")))
        .select(col("id"), (col("__p0") + 1).cast("long").as("__p"), col("__tok"))
      val rebuilt = pos.join(covered, Seq("id", "__p"), "left_anti")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("__nkept"),
          concat_ws(" ",
            transform(array_sort(collect_list(struct(col("__p"), col("__tok")))),
              x => x.getField("__tok"))).as("__text"))
      toks.select(col("id"), col("__n"))
        .join(rebuilt, Seq("id"), "left")
        .select(col("id"), col("__n").as("n_tokens"),
          (col("__n") - coalesce(col("__nkept"), lit(0L))).as("n_removed"),
          coalesce(col("__text"), lit("")).as("text"))
    }
    val neu = toks
      .select(col("id"), col("__n").as("n_tokens"),
        call_function("graft_excise_tokens", col("__ts"),
          col("cov").cast("array<bigint>")).as("__r"))
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - col("__r.n_kept")).as("n_removed"),
        col("__r.text").as("text"))
    assert(rows(neu) == rows(old))
    // and the full operator still excises the planted repeated span
    val d = docs.filter(col("doc_id") >= -12)
    val out = graft.ops.Dedup.exciseRepeatedSpans(
      Seq((1L, "p1 p2 p3 p4 p5 tail one"),
        (2L, "head p1 p2 p3 p4 p5 tail two")).toDF("doc_id", "text"),
      "doc_id", "text", w = 5)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0L) // owner keeps the span
    // doc 2 shares TWO 5-gram occurrences with doc 1 ("p1..p5" at 2-6
    // and the overlapping "p2..tail" at 3-7) — positions 2..7 excised
    assert(out(1).getAs[Long]("n_removed") == 6L)
    assert(out(1).getAs[String]("text") == "head two")
    assert(d.count() > 0)
  }

  test("bpe pair kernel == the original strip/split/transform extraction") {
    val S = "\u0001"
    val s2 = spark; import s2.implicits._
    val states = Seq(
      S + "a" + S + S + "b" + S + S + "c" + S, // 3 tokens
      S + "only" + S,                          // 1 token -> no pairs
      S + S,                                   // zero tokens
      S + "a b" + S + S + "c" + S,             // merged token with space
      S + "x" + S + S + "" + S + S + "y" + S   // empty middle token
    ).toDF("s")
    val t = split(regexp_replace(col("s"), "^" + S + "|" + S + "$", ""), S + S)
    val old = states
      .select(t.as("t")).filter(size(col("t")) >= 2)
      .select(explode(transform(slice(col("t"), lit(1), size(col("t")) - 1),
        (x, i) => struct(x.as("l"), element_at(col("t"), i + lit(2)).as("r"))))
        .as("p"))
      .select(col("p.l"), col("p.r"))
    val neu = states
      .select(explode(call_function("graft_bpe_adjacent_pairs", col("s"))).as("p"))
      .select(col("p.l"), col("p.r"))
    assert(rows(neu) == rows(old))
    assert(neu.count() == 5) // (a,b),(b,c),(a b,c),(x,""),("",y)
  }

  test("mutation pin: an expensive non-deterministic batch commits consistently") {
    val s2 = spark; import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pin").toString
    val t = new graft.pipeline.BucketedStateTable(spark, s"$dir/t",
      keyCols = Seq("k"), numBuckets = 64, retentionFloorMillis = 0L)
    // aggregate lineage (pinned by the r20 heuristic) over keys derived
    // from now(): without the pin the dirty probe and the bucket write
    // would see DIFFERENT keys and trip the written-outside-dirty guard
    // (the BucketedStateTableSpec still proves that guard for CHEAP
    // lineages); with the pin both read the same materialized rows, so
    // the merge lands exactly one consistent row set
    val nd = spark.range(32)
      .select(concat(lit("k"), unix_micros(now()) + col("id")).as("k"),
        lit(1L).as("v"))
      .groupBy(col("k")).agg(sum(col("v")).as("v"))
    t.merge(nd, keys = Seq("k"))
    val got = t.read().get
    assert(got.count() == 32L)
    // every committed row is readable through the bucket probe — i.e.
    // the rows landed in the buckets their keys hash into
    val probed = t.readForKeys(got.select(col("k")), got.limit(0)).count()
    assert(probed == 32L)
  }

  test("bpe pair count sanity") {
    val S = "\u0001"
    val s2 = spark; import s2.implicits._
    val one = Seq(S + "a" + S + S + "b" + S).toDF("s")
      .select(explode(call_function("graft_bpe_adjacent_pairs", col("s"))).as("p"))
    assert(one.count() == 1L)
  }

  // ── r20.2: interned-id gram windows vs string grams ────────────────
  // The count/coverage/verify kernels now compare interned-id windows
  // instead of building one concatenated String per gram; these
  // references rebuild the ORIGINAL string-gram semantics independently
  // (Spark trim/split discipline: trim strips spaces only, split keeps
  // empty segments) and must match bit-for-bit on every planted shape.
  private def refToks(s: String): Array[String] =
    s.replaceAll("^ +", "").replaceAll(" +$", "").split("\\s+", -1)
  private def refGrams(toks: Array[String], n: Int): Seq[String] =
    (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))

  test("interned-gram count kernels == string-gram references, every shape") {
    val t = coalesce(col("text"), lit(""))
    val got = docs.select(col("doc_id"), t.as("__t"),
        call_function("graft_ngram_stats", t, lit(3)).as("st"),
        call_function("graft_ngram_top", t, lit(2)).as("tp"),
        call_function("graft_dup_ngram_cov", t, lit(5)).as("cv"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val s = r.getString(1)
      val toks = refToks(s)
      // ngramStats(3): (total, distinct); sub-n docs count (1, 1)
      val (tot, dist) =
        if (toks.length < 3) (1L, 1L)
        else { val g = refGrams(toks, 3); (g.size.toLong, g.distinct.size.toLong) }
      assert(r.getStruct(2).getLong(0) == tot && r.getStruct(2).getLong(1) == dist,
        s"ngram_stats mismatch for doc ${r.getLong(0)}")
      // ngramTop(2): (n_pos, top count); sub-n docs (0, 0)
      val (pos, top) =
        if (toks.length < 2) (0L, 0L)
        else { val g = refGrams(toks, 2)
          (g.size.toLong, g.groupBy(identity).values.map(_.size).max.toLong) }
      assert(r.getStruct(3).getLong(0) == pos && r.getStruct(3).getLong(1) == top,
        s"ngram_top mismatch for doc ${r.getLong(0)}")
      // dupNgramCov(5): positions covered by a >=2-occurrence 5-gram
      val cov =
        if (toks.length < 5) 0L
        else {
          val g = refGrams(toks, 5)
          val counts = g.groupBy(identity).map { case (k, v) => k -> v.size }
          val covered = Array.fill(toks.length)(false)
          g.zipWithIndex.foreach { case (gram, i) =>
            if (counts(gram) >= 2) (i until i + 5).foreach(covered(_) = true) }
          covered.count(identity).toLong
        }
      assert(r.getStruct(4).getLong(0) == toks.length.toLong &&
        r.getStruct(4).getLong(1) == cov,
        s"dup_ngram_cov mismatch for doc ${r.getLong(0)}")
    }
  }

  test("pair-interned jaccard/containment kernels == string-set references") {
    val s2 = spark; import s2.implicits._
    // pair every planted/corpus doc with its neighbor AND itself —
    // covers sub-n fallbacks meeting full grams, unicode, identical
    // and disjoint texts
    val txts = docs.orderBy("doc_id").collect()
      .map(r => Option(r.getString(1)).getOrElse("")).toVector
    val pairs = (txts.indices.map(i => (txts(i), txts((i + 1) % txts.size))) ++
      txts.indices.map(i => (txts(i), txts(i)))).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"),
        call_function("graft_shingle_jaccard", col("a"), col("b"), lit(3)).as("j"),
        call_function("graft_shingle_containment", col("a"), col("b"), lit(3)).as("c"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    pairs.foreach { case (id, a, b) =>
      def setOf(s: String): Set[String] = {
        val toks = refToks(s)
        if (toks.length < 3) Set(toks.mkString(" ")) else refGrams(toks, 3).toSet
      }
      def strictSetOf(s: String): Set[String] = {
        val toks = refToks(s)
        if (toks.length < 3) Set.empty else refGrams(toks, 3).toSet
      }
      val (sa, sb) = (setOf(a), setOf(b))
      val inter = (sa & sb).size
      val union = sa.size + sb.size - inter
      val refJ = if (union == 0) 0.0 else inter.toDouble / union
      assert(got(id)._1 == refJ, s"jaccard mismatch for pair $id")
      val (ta, tb) = (strictSetOf(a), strictSetOf(b))
      val refC: Any =
        if (ta.isEmpty || tb.isEmpty) null
        else {
          val i2 = (ta & tb).size
          math.max(i2.toDouble / ta.size, i2.toDouble / tb.size)
        }
      assert(got(id)._2 == refC, s"containment mismatch for pair $id")
    }
  }
}
