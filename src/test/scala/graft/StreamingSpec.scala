package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.StreamingAnalytics

/** Streaming twins (q32-q34): (a) batch/stream semantic equivalence on
  * the same transform, (b) true incremental execution through
  * MemoryStream + micro-batches + state store.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The three twins applied to the BATCH events table must agree with
    * the oracle-checked batch queries. */
  test("tumblingCounts on batch events == q32 rows") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val twin = StreamingAnalytics.tumblingCounts(events)
      .orderBy("win_start", "event_type").limit(200)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val batch = SparkEntry.queries("q32_window_tumbling")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(twin.toSeq == batch.toSeq)
  }

  test("slidingCounts on batch events == q33 rows") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val twin = StreamingAnalytics.slidingCounts(events)
      .orderBy("win_start_s", "event_type").limit(200)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val batch = SparkEntry.queries("q33_window_sliding")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(twin.toSeq == batch.toSeq)
  }

  test("sessionCounts on batch events == q34 session totals per user") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val twin = StreamingAnalytics.sessionCounts(events)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = SparkEntry.queries("q34_sessionize")(spark, TestSpark.sf0001)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(twin.toSeq == batch.toSeq)
  }

  /** Incremental execution: feed micro-batches through MemoryStream
    * and assert the state-store-backed aggregation converges to the
    * batch answer. */
  test("tumblingCounts runs incrementally over MemoryStream micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamingAnalytics.tumblingCounts(events).writeStream
      .format("memory").queryName("tumbling_test").outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 00:10:00"), "click", 1.0),
                  (ts("2024-01-01 00:20:00"), "click", 2.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:40:00"), "click", 3.0),
                  (ts("2024-01-01 01:10:00"), "view", 4.0))
      q.processAllAvailable()
      val out = spark.table("tumbling_test")
        .select("win_start", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(out == Set(
        (ts("2024-01-01 00:00:00"), "click", 3L),
        (ts("2024-01-01 01:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("dedupStream drops redelivered events across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("event_id", "ts")
    val q = StreamingAnalytics.dedupStream(events, "ts", "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:01")), (2L, ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      // batch 2 redelivers event 1 RESTAMPED 500ms later (the retry
      // case a (id, ts)-keyed dedup would miss) and adds event 3
      mem.addData((1L, ts("2024-01-01 00:00:01.500")), (3L, ts("2024-01-01 00:00:03")))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // event 1 exactly once
    } finally q.stop()
  }

  test("dedupStream over the documents corpus == q35 exact-dedup counts") {
    // the batch-equivalence gate the other twins have: stream every
    // document's content hash through the state-store dedup in two
    // micro-batches (so cross-batch duplicates exercise the state) and
    // land on exactly q35's n_unique survivors
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(graft.functions.Text.contentHash(col("text")).as("th"), col("doc_id"))
      .collect().map(r => (r.getString(0), ts("2024-01-01 00:00:00"), r.getLong(1)))
    val nUnique = SparkEntry.queries("q35_dedup_exact")(spark, TestSpark.sf0001)
      .collect().head.getLong(0)
    val mem = MemoryStream[(String, Timestamp, Long)]
    val stream = mem.toDF().toDF("th", "ts", "doc_id")
    val q = StreamingAnalytics.dedupStream(stream, "ts", "1 hour", Seq("th"))
      .writeStream.format("memory").queryName("dedup_corpus_test")
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
      assert(spark.table("dedup_corpus_test").count() == nUnique)
      // and the survivors' hash set matches the batch dedup exactly
      assert(spark.table("dedup_corpus_test").select("th").distinct().count() == nUnique)
    } finally q.stop()
  }

  test("nearDupStream drops signature-identical docs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingAnalytics.nearDupStream(docs, "ts", "1 hour")
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "a b c d a b c d", ts("2024-01-01 00:00:01")),
        (2L, "tiny one", ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      // batch 2: doc 3 is a true near-dup of doc 1 (same shingle SET,
      // different text, different content hash — the case exact dedup
      // misses), doc 4 re-sends doc 2's short text, doc 5 is new
      mem.addData(
        (3L, "b c d a b c d a", ts("2024-01-01 00:00:03")),
        (4L, "tiny one", ts("2024-01-01 00:00:04")),
        (5L, "w x y z", ts("2024-01-01 00:00:05")))
      q.processAllAvailable()
      val ids = spark.table("neardup_test").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 5L), s"survivors: $ids")
      // the working column never leaks into the survivor schema
      assert(!spark.table("neardup_test").columns.contains("_sig"))
    } finally q.stop()
  }

  test("enrich joins a stream against a static dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val events = mem.toDF().toDF("user_id", "value")
    val q = StreamingAnalytics.enrich(events, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_test").outputMode("append").start()
    try {
      mem.addData((1L, 5.0), (3L, 7.0)) // user 3 not in dim -> null tier
      q.processAllAvailable()
      val out = spark.table("enrich_test")
        .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
      assert(out == Map(1L -> Some("gold"), 3L -> None))
    } finally q.stop()
  }

  test("sessionCounts merges sessions incrementally in the state store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = StreamingAnalytics.sessionCounts(events).writeStream
      .format("memory").queryName("session_test").outputMode("complete").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 02:00:00"))) // > 30min gap -> new session
      q.processAllAvailable()
      val out = spark.table("session_test")
        .select("user_id", "session_start", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(out == Set(
        (1L, ts("2024-01-01 00:00:00"), 2L),
        (1L, ts("2024-01-01 02:00:00"), 1L)))
    } finally q.stop()
  }

  test("intervalJoin on batch events == q09 follow-within-5m counts") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val twin = StreamingAnalytics.intervalJoin(events, events, "user_id")
      .groupBy("event_type").agg(count(lit(1)).as("follow_within_5m"))
      .filter(col("follow_within_5m") > 0).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val batch = SparkEntry.queries("q09_join_range")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(twin.toSeq == batch.toSeq)
  }

  test("intervalJoin matches across two live streams, bounded by the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(Long, Timestamp, String)]
    val rmem = MemoryStream[(Long, Timestamp, String)]
    val l = lmem.toDF().toDF("user_id", "ts", "kind")
    val r = rmem.toDF().toDF("user_id", "ts", "kind")
    val q = StreamingAnalytics.intervalJoin(l, r, "user_id")
      .select("user_id", "kind", "r_kind")
      .writeStream.format("memory").queryName("interval_test").outputMode("append").start()
    try {
      // left arrives first; the matching right lands in a LATER
      // micro-batch (buffered left state must produce the match)
      lmem.addData((1L, ts("2024-01-01 00:00:00"), "click"))
      q.processAllAvailable()
      rmem.addData((1L, ts("2024-01-01 00:02:00"), "view"),   // within 5m -> match
                   (1L, ts("2024-01-01 00:10:00"), "late"),   // outside horizon
                   (2L, ts("2024-01-01 00:02:00"), "other"))  // wrong key
      q.processAllAvailable()
      val out = spark.table("interval_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(out == Set((1L, "click", "view")))
    } finally q.stop()
  }

  test("deterministicSplit runs unchanged on a stream and agrees with batch") {
    // The curation split is a pure per-row projection, so the SAME
    // operator call works on an unbounded stream — and because
    // membership is content-addressed (md5, no rand/state), the stream
    // assigns every doc exactly what batch does.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val docs = mem.toDF().toDF("doc_id")
    val q = graft.operators.Sampling
      .deterministicSplit(docs, "doc_id", Seq("train" -> "c", "val" -> "e"), "test")
      .writeStream.format("memory").queryName("split_test").outputMode("append").start()
    try {
      mem.addData(1L to 50L: _*)
      q.processAllAvailable()
      mem.addData(51L to 100L: _*)
      q.processAllAvailable()
      val streamed = spark.table("split_test")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = graft.operators.Sampling
        .deterministicSplit((1L to 100L).toDF("doc_id"), "doc_id",
          Seq("train" -> "c", "val" -> "e"), "test")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch && streamed.size == 100)
    } finally q.stop()
  }
}
