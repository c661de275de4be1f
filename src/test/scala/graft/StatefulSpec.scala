package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Alert, Event}

/** flatMapGroupsWithState: per-key running state across micro-batches. */
class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("anomaly state carries across micro-batches and respects warm-up") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StatefulOps.anomalies(mem.toDS(), factor = 3.0, minEvents = 3)
      .writeStream.format("memory").queryName("anomaly_test").outputMode("append").start()
    try {
      // batch 1: three normal events build the baseline (mean 10)
      mem.addData(
        Event(1L, ts("2024-01-01 00:00:01"), 10.0),
        Event(1L, ts("2024-01-01 00:00:02"), 10.0),
        Event(1L, ts("2024-01-01 00:00:03"), 10.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_test").count() == 0) // warm-up, no alerts

      // batch 2: spike (100 > 3*10) then normal; other user still warming up
      mem.addData(
        Event(1L, ts("2024-01-01 00:00:04"), 100.0),
        Event(1L, ts("2024-01-01 00:00:05"), 11.0),
        Event(2L, ts("2024-01-01 00:00:06"), 999.0))
      q.processAllAvailable()
      val alerts = spark.table("anomaly_test").as[Alert].collect()
      assert(alerts.length == 1)
      assert(alerts.head.user_id == 1L && alerts.head.value == 100.0)
      assert(math.abs(alerts.head.running_mean - 10.0) < 1e-9)
    } finally q.stop()
  }

  test("slidingCounts runs incrementally (q33 twin over MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = graft.streaming.StreamingAnalytics.slidingCounts(events)
      .writeStream.format("memory").queryName("sliding_test").outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 00:20:00"), "click", 1.0))
      q.processAllAvailable()
      val wins = spark.table("sliding_test")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      // event at 00:20 belongs to 4 sliding windows starting 23:30..00:15
      assert(wins.map(_._1) ==
        Set(ts("2023-12-31 23:30:00"), ts("2023-12-31 23:45:00"),
            ts("2024-01-01 00:00:00"), ts("2024-01-01 00:15:00"))
          .map(_.getTime / 1000))
      assert(wins.forall(_._2 == 1L))
    } finally q.stop()
  }

  test("streaming funnel advances across micro-batches; past-deadline events never advance") {
    import graft.streaming.StatefulOps.{StageAdvance, TypedEvent}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    // idleEviction doubles as the watermark delay: batch 2 delivers
    // events ~1.5h behind batch 1's max event time, so the horizon
    // must exceed that or they are (correctly) dropped as late
    val q = StatefulOps.funnel(mem.toDS(), Seq("view", "click", "purchase"),
        withinMs = 3600000L, idleEvictionMs = 14400000L)
      .writeStream.format("memory").queryName("funnel_test").outputMode("append").start()
    try {
      // batch 1: user 1 views; user 2 views then clicks past the hour
      mem.addData(
        TypedEvent(1L, ts("2024-01-01 00:00:00"), "view"),
        TypedEvent(2L, ts("2024-01-01 00:00:00"), "view"),
        TypedEvent(2L, ts("2024-01-01 02:00:00"), "click")) // window closed
      q.processAllAvailable()
      // batch 2: user 1 clicks within the hour (state carried), then purchases
      mem.addData(
        TypedEvent(1L, ts("2024-01-01 00:30:00"), "click"),
        TypedEvent(1L, ts("2024-01-01 00:45:00"), "purchase"),
        TypedEvent(2L, ts("2024-01-01 02:10:00"), "click")) // still past deadline
      q.processAllAvailable()
      val out = spark.table("funnel_test").as[StageAdvance].collect()
        .map(a => (a.user_id, a.stage)).toSet
      assert(out == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
    } finally q.stop()
  }

  test("gapFillStream emits gaps incrementally when the next bucket arrives") {
    import graft.streaming.StatefulOps.{Bucket, FilledBucket}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Bucket]
    val q = StatefulOps.gapFillStream(mem.toDS())
      .writeStream.format("memory").queryName("gapfill_test").outputMode("append").start()
    try {
      mem.addData(Bucket(1L, ts("2024-01-01 00:00:00"), 5L))
      q.processAllAvailable()
      assert(spark.table("gapfill_test").count() == 1) // no gaps yet
      // next observation 3 hours later: two zero-gap rows materialize
      mem.addData(Bucket(1L, ts("2024-01-01 03:00:00"), 2L))
      q.processAllAvailable()
      val out = spark.table("gapfill_test").as[FilledBucket].collect()
        .map(b => (b.ts, b.n, b.carried)).sortBy(_._1.getTime).toSeq
      assert(out == Seq(
        (ts("2024-01-01 00:00:00"), 5L, 5L),
        (ts("2024-01-01 01:00:00"), 0L, 5L),
        (ts("2024-01-01 02:00:00"), 0L, 5L),
        (ts("2024-01-01 03:00:00"), 2L, 2L)))
    } finally q.stop()
  }

  test("batch gapFillStream equals the batch gapFill operator row for row") {
    import graft.streaming.StatefulOps.Bucket
    import org.apache.spark.sql.functions._
    val hourly = graft.sources.Tables.load(spark, TestSpark.sf0001, "events")
      .filter(col("user_id") <= 3)
      .groupBy(col("user_id").as("key"), date_trunc("hour", col("ts")).as("ts"))
      .agg(count(lit(1)).as("n"))
    val streamed = StatefulOps.gapFillStream(hourly.as[Bucket])
      .select(col("key").as("user_id"), col("ts").as("h"), col("n"), col("carried"))
    val batch = graft.operators.TimeSeries.gapFill(
      hourly.withColumnRenamed("key", "user_id").withColumnRenamed("ts", "h"),
      "user_id", "h", "n")
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0)
  }

  test("batch funnel reproduces q71's stage totals") {
    import graft.streaming.StatefulOps.TypedEvent
    val events = graft.sources.Tables.load(spark, TestSpark.sf0001, "events")
      .selectExpr("user_id", "ts", "event_type").as[TypedEvent]
    val advances = StatefulOps.funnel(events, Seq("view", "click", "purchase"))
      .groupBy("stage").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = SparkEntry.queries("q71_funnel")(spark, TestSpark.sf0001).collect()(0)
    assert(advances.getOrElse(1, 0L) == expect.getLong(0), "stage 1 == n_view")
    assert(advances.getOrElse(2, 0L) == expect.getLong(1), "stage 2 == n_view_click")
    assert(advances.getOrElse(3, 0L) == expect.getLong(2), "stage 3 == n_view_click_purchase")
  }

  test("latestVersion: stale redelivery after a newer version emits nothing") {
    import graft.streaming.StatefulOps.Versioned
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Versioned]
    val q = StatefulOps.latestVersion(mem.toDS(), idleEvictionMs = 3600000L)
      .writeStream.format("memory").queryName("cdc_stale_test")
      .outputMode("append").start()
    try {
      // two ascending versions: both emit
      mem.addData(
        Versioned(1L, "a", ts("2024-01-01 00:00:01"), 1L, 10.0),
        Versioned(1L, "a", ts("2024-01-01 00:00:05"), 2L, 20.0))
      q.processAllAvailable()
      assert(spark.table("cdc_stale_test").count() == 2)
      // stale version (older ts, even with a higher id): no emission
      mem.addData(Versioned(1L, "a", ts("2024-01-01 00:00:03"), 9L, 30.0))
      q.processAllAvailable()
      assert(spark.table("cdc_stale_test").count() == 2)
      // equal ts, higher event_id wins the total order: emits
      mem.addData(Versioned(1L, "a", ts("2024-01-01 00:00:05"), 3L, 40.0))
      q.processAllAvailable()
      val rows = spark.table("cdc_stale_test").as[Versioned].collect()
      assert(rows.length == 3 && rows.map(_.value).toSet == Set(10.0, 20.0, 40.0))
    } finally q.stop()
  }

  private var oooRun = 0

  test("latestVersion converges to the batch survivor set under ANY replay order") {
    import graft.streaming.StatefulOps.Versioned
    import org.apache.spark.sql.functions._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    implicit val sqlCtx = spark.sqlContext
    // ScalaCheck drives the replay schedule: a shuffle seed (arbitrary
    // out-of-order, late, interleaved delivery) and a micro-batch count
    // (1 = everything at once .. 6 = drip-feed). The emitted champion
    // stream differs per schedule, but the per-key SURVIVOR (last
    // champion) must always equal the batch q83-style winner.
    val ev = graft.sources.Tables.load(spark, TestSpark.sf0001, "events")
      .filter(col("user_id") <= 10)
      .selectExpr("user_id", "event_type", "ts", "event_id", "value")
      .as[Versioned].collect().toVector
    assert(ev.length > 20, s"fixture too small: ${ev.length}")
    def survivorsOf(rows: Iterable[Versioned]) =
      rows.groupBy(e => (e.user_id, e.event_type)).values
        .map(_.maxBy(e => (e.ts.getTime, e.event_id)))
        .map(e => (e.user_id, e.event_type, e.ts.getTime, e.event_id, e.value))
        .toSet
    val expect = survivorsOf(ev)
    val prop = Prop.forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(1, 6)) {
      (seed, nb) =>
        oooRun += 1
        val name = s"cdc_ooo_$oooRun"
        val shuffled = new scala.util.Random(seed).shuffle(ev)
        val mem = MemoryStream[Versioned]
        // horizon far beyond the corpus span: no delivery order may be
        // watermark-dropped — this property isolates replay ORDER
        val q = StatefulOps.latestVersion(mem.toDS(),
            idleEvictionMs = 3650L * 86400000L)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          shuffled.grouped(math.max(1, shuffled.length / nb)).foreach { b =>
            mem.addData(b); q.processAllAvailable()
          }
          survivorsOf(spark.table(name).as[Versioned].collect()) == expect
        } finally q.stop()
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(r.passed, r.toString)
  }

  test("streaming latestVersion converges to q83's survivor set over the corpus") {
    import graft.streaming.StatefulOps.Versioned
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    implicit val sqlCtx = spark.sqlContext
    // stream the whole events table in three event-time-ordered
    // micro-batches; an upsert sink keyed on (user_id, event_type)
    // then holds each key's LAST champion — which must aggregate to
    // exactly q83's batch output
    val ev = graft.sources.Tables.load(spark, TestSpark.sf0001, "events")
      .selectExpr("user_id", "event_type", "ts", "event_id", "value")
      .as[Versioned].collect().sortBy(_.ts.getTime)
    val mem = MemoryStream[Versioned]
    val q = StatefulOps.latestVersion(mem.toDS(), idleEvictionMs = 30L * 86400000L)
      .writeStream.format("memory").queryName("cdc_corpus_test")
      .outputMode("append").start()
    try {
      val third = ev.length / 3
      mem.addData(ev.take(third).toIndexedSeq); q.processAllAvailable()
      mem.addData(ev.slice(third, 2 * third).toIndexedSeq); q.processAllAvailable()
      mem.addData(ev.drop(2 * third).toIndexedSeq); q.processAllAvailable()
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      val agg = spark.table("cdc_corpus_test")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_keys"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_latest"))
      val batch = SparkEntry.queries("q83_latest_version")(spark, TestSpark.sf0001)
      assert(agg.exceptAll(batch).count() == 0 && batch.exceptAll(agg).count() == 0)
    } finally q.stop()
  }
}
