package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.{Corpus, TextAnalysis}

/** The stateless quality operators as ingestion-time stream filters:
  * [[TextAnalysis.gopherRules]], [[TextAnalysis.cleanC4]] and
  * [[Corpus.dsirScore]] are narrow projections, so the SAME code path
  * scores a stream with no state store, Append mode, and batch-parity
  * row for row — the shape a crawl-ingest pipeline runs them in. */
class StreamingQualitySpec extends SparkSpec {

  test("gopher rules filter a stream at ingestion — Append, stateless, batch parity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val healthy = "the cat sat on of and that have with mat " * 6
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.gopherRules(
        in.toDF().toDF("id", "text"), "id", "text")
      .filter(col("keep"))
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode(OutputMode.Append()).start()
    def kept(): Set[Long] = s.sql("SELECT id FROM gopher_stream")
      .collect().map(_.getLong(0)).toSet
    try {
      in.addData(1L -> healthy, 2L -> "a b c")
      q.processAllAvailable()
      assert(kept() === Set(1L))
      // stateless: a later batch cannot change batch-1 decisions
      in.addData(3L -> ("the of " + ("### " * 60)), 4L -> healthy)
      q.processAllAvailable()
      assert(kept() === Set(1L, 4L))
    } finally q.stop()
    // batch parity on the same rows
    val batchKept = TextAnalysis.gopherRules(
        Seq(1L -> healthy, 2L -> "a b c", 3L -> ("the of " + ("### " * 60)),
          4L -> healthy).toDF("id", "text"), "id", "text")
      .filter(col("keep")).select("id").collect().map(_.getLong(0)).toSet
    assert(batchKept === Set(1L, 4L))
  }

  test("c4 cleaning runs over a stream — per-doc line metrics at arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.cleanC4(in.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("c4_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        1L -> ("good sentence with five words here.\n" * 3),
        2L -> "too short.")
      q.processAllAvailable()
      val rows = s.sql("SELECT id, n_kept, keep FROM c4_stream")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(rows(1L) === ((3L, true)))
      assert(rows(2L) === ((0L, false)))
    } finally q.stop()
  }

  test("qualityReport runs as a streaming aggregation — per-source counters advance across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val healthy = "the cat sat on of and that have with mat " * 6
    val in = MemoryStream[(Long, String, String)]
    val q = TextAnalysis.qualityReport(
        in.toDF().toDF("id", "text", "src"), "text", "src")
      .writeStream.format("memory").queryName("qr_stream")
      .outputMode(OutputMode.Complete()).start()
    def report(): Map[String, (Long, Long)] =
      s.sql("SELECT source, n_docs, n_pass_gopher FROM qr_stream")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    try {
      in.addData((1L, healthy, "a"), (2L, "a b c", "a"))
      q.processAllAvailable()
      assert(report() === Map("a" -> ((2L, 1L))))
      // second batch updates the same source and introduces another —
      // the aggregate is stateful per source (bounded cardinality)
      in.addData((3L, healthy, "a"), (4L, healthy, "b"))
      q.processAllAvailable()
      assert(report() === Map("a" -> ((3L, 2L)), "b" -> ((1L, 1L))))
    } finally q.stop()
  }

  test("dsir scoring column works unchanged over a stream once the table is fixed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val raw = (1 to 8).map(i => (i.toLong, "the quick brown fox " + i)) ++
      (9 to 16).map(i => (i.toLong, "buy cheap pills now " + i))
    val target = (1 to 8).map(i => (i.toLong, "the quick brown fox " + i))
    val llr = Corpus.dsirLlrTable(
      raw.toDF("id", "text"), "text", target.toDF("id", "text"), "text",
      buckets = 256)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "text")
      .select(col("id"), Corpus.dsirScore(llr, col("text")).as("w"))
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(100L -> "the quick brown fox 99", 101L -> "buy cheap pills now 99")
      q.processAllAvailable()
      val w = s.sql("SELECT id, w FROM dsir_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(w(100L) > w(101L),
        s"target-like doc must outscore off-target on the stream: $w")
    } finally q.stop()
  }

  test("unigram encode tokenizes a stream at ingestion — stateless, batch parity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val train = Seq.tabulate(10)(i => (i.toLong, "alpha alpha beta")).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramTrain(train, col("text"),
      maxPieceLen = 4, iterations = 2).map { case (p, _, pr) => (p, pr) }
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.unigramEncode(in.toDF().toDF("id", "text"), col("text"), vocab)
      .select(col("id"), col("n_unigram_tokens"))
      .writeStream.format("memory").queryName("unigram_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(1L -> "alpha beta", 2L -> "zzz")
      q.processAllAvailable()
      val got = s.sql("SELECT id, n_unigram_tokens FROM unigram_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = TextAnalysis.unigramEncode(
          Seq(1L -> "alpha beta", 2L -> "zzz").toDF("id", "text"), col("text"), vocab)
        .select(col("id"), col("n_unigram_tokens"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got(2L) == 1L) // UNK word -> one whole piece
    } finally q.stop()
  }

  test("trained langid scores a stream at ingestion — stateless, held-out accuracy holds") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val models = TextAnalysis.langIdTrain(
      graft.queries.TrainingQueries.langIdTrainSet.toDF("lang", "text"),
      "text", "lang", Seq("en", "de", "fr", "es"), buckets = 256)
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.langIdPredictTrained(
        in.toDF().toDF("id", "text"), "text", models)
      .select(col("id"), col("predicted_lang"))
      .writeStream.format("memory").queryName("langid_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      graft.queries.TrainingQueries.langIdHeldout
        .foreach { case (id, t) => in.addData(id -> t) }
      q.processAllAvailable()
      val got = s.sql("SELECT id, predicted_lang FROM langid_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      graft.queries.TrainingQueries.langIdHeldoutExpected.foreach {
        case (id, want) => assert(got(id) == want, s"doc $id: $got")
      }
    } finally q.stop()
  }
}
