package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sinks.Upsert
import graft.streaming.{Stateful, StreamingJob}

/** Keyed user event for the stream-stream join spec. */
case class UserEvent(user_id: Long, ts: java.sql.Timestamp, price: Double)

/** Streaming semantics (SURVEY.md §2.8 T1-T14) driven by MemoryStream. */
class StreamingSpec extends SparkSuite {

  import Stateful._

  private def envelope(symbol: String, tMillis: Long, price: Double,
      volume: Double, cv: Double): String =
    s"""{"data":[{"c":null,"p":$price,"s":"$symbol","t":$tMillis,"v":$volume,"cv":$cv}],"type":"trade"}"""

  private val t0 = 1700000000000L // stable epoch-millis base

  test("4-query DAG: decode fan-out, update-mode upsert, append-mode finalization") {
    import spark.implicits._
    val input = MemoryStream[String](spark)
    val out = tmpDir("graft-stream-out")
    val ckpt = tmpDir("graft-stream-ckpt")
    val queries = StreamingJob.run(spark, input.toDF().select(col("value")),
      StreamingJob.Config(out, ckpt))
    try {
      // two trades in minute 0, one in minute 1
      input.addData(
        envelope("BTC", t0, 10.0, 1.0, 1.0),
        envelope("BTC", t0 + 5000, 12.0, 2.0, 3.0),
        envelope("BTC", t0 + 60000, 11.0, 4.0, 7.0))
      queries.foreach(_.processAllAvailable())

      val vol = Upsert.read(spark, s"$out/volume_tracking").get
      assert(vol.count() === 2) // two 1-minute windows
      val m0 = vol.filter(col("total_volume") === 3.0).count()
      assert(m0 === 1)

      val price = Upsert.read(spark, s"$out/price_tracking").get
      assert(price.count() === 3)

      // update-mode re-emission: a later trade revises minute-1's window;
      // the upsert store must keep exactly one row per (symbol, minute).
      input.addData(envelope("BTC", t0 + 61000, 20.0, 6.0, 13.0))
      queries.foreach(_.processAllAvailable())
      val vol2 = Upsert.read(spark, s"$out/volume_tracking").get
      assert(vol2.count() === 2)
      assert(vol2.filter(col("total_volume") === 10.0).count() === 1) // 4+6

      // append-mode feature sink: windows finalize only once the 10s
      // watermark passes — push it far ahead and check output appears.
      input.addData(envelope("BTC", t0 + 600000, 15.0, 1.0, 14.0))
      queries.foreach(_.processAllAvailable())
      val features = spark.read.schema("key STRING, value STRING")
        .csv(s"$out/btc_features")
      assert(features.count() > 0)
      assert(features.filter(col("key") === "BTC").count() === features.count())

      // partitioned file sink wrote year=/month=/day= directories
      val stored = spark.read
        .schema("symbol STRING, timestamp TIMESTAMP, total_usd_volume DOUBLE, " +
          "total_btc_volume DOUBLE, close DOUBLE, high DOUBLE, low DOUBLE, " +
          "num_trades LONG, hour INT, year INT, month INT, day INT")
        .csv(s"$out/features_store")
      assert(stored.select("year").distinct().count() >= 1)
    } finally queries.foreach(_.stop())
  }

  test("late data beyond the watermark is dropped from append-mode aggs") {
    import spark.implicits._
    val input = MemoryStream[TradeEvent](spark)
    val agg = input.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "30 seconds", "10 seconds"), col("symbol"))
      .agg(sum(col("volume")).as("v"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_test").start()
    try {
      def ev(offsetMs: Long, v: Double) =
        TradeEvent("BTC", new java.sql.Timestamp(t0 + offsetMs), 1.0, v)
      input.addData(ev(0, 1.0), ev(5000, 1.0))
      q.processAllAvailable()
      input.addData(ev(120000, 1.0)) // advances watermark to ~110s
      q.processAllAvailable()
      val afterAdvance = spark.table("late_test")
        .agg(sum(col("v"))).head.getDouble(0)
      input.addData(ev(1000, 99.0)) // late by ~2 minutes: must be dropped
      q.processAllAvailable()
      val afterLate = spark.table("late_test")
        .agg(sum(col("v"))).head.getDouble(0)
      assert(afterLate === afterAdvance)
    } finally q.stop()
  }

  test("streaming funnel matches the batch fixpoint on ordered events") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"))
    val batch = graft.ops.EventAnalytics.funnel(events)
    val sorted = events.as[FunnelEvent].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos))
    val input = MemoryStream[FunnelEvent](spark)
    val q = Stateful.funnelProgress(spark, input.toDS()).toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream").start()
    try {
      sorted.grouped(400).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      // monotone refinement: the max-stages row per user is the final state
      val streamed = spark.table("funnel_stream")
        .groupBy("user_id")
        .agg(max(struct(col("stages_reached"), col("t_view"),
          col("t_click"), col("t_purchase"))).as("s"))
        .select(col("user_id"), col("s.t_view").as("t_view"),
          col("s.t_click").as("t_click"),
          col("s.t_purchase").as("t_purchase"),
          col("s.stages_reached").as("stages_reached"))
      assert(streamed.count() === batch.count())
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally q.stop()
  }

  test("streaming dedup: in-horizon re-deliveries dropped, state evicted after") {
    import spark.implicits._
    val input = MemoryStream[TradeEvent](spark)
    val deduped = StreamingJob.dedupWithinWatermark(
      input.toDF(), keyCols = Seq("symbol"), tsCol = "ts",
      horizon = "10 seconds")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_test").start()
    try {
      def ev(offsetMs: Long, v: Double) =
        TradeEvent("BTC", new java.sql.Timestamp(t0 + offsetMs), 1.0, v)
      // intra- and cross-batch re-deliveries inside the horizon: one row
      input.addData(ev(0, 1.0), ev(0, 1.0), ev(5000, 2.0))
      q.processAllAvailable()
      input.addData(ev(1000, 9.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 1)
      // watermark only advances at batch END: this far-future event still
      // sees the live BTC entry (evicted only after the batch), so it is
      // deduped — and its event time pushes the watermark to ~110s
      input.addData(ev(120000, 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 1)
      // now the entry is evicted: the key is accepted again and re-arms
      input.addData(ev(121000, 4.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 2)
      input.addData(ev(122000, 5.0)) // inside the re-armed horizon
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 2)
    } finally q.stop()
  }

  test("stateful cumulative volume carries across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[TradeEvent](spark)
    val q = Stateful.cumulativeVolume(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("cum_test").start()
    try {
      def ev(sym: String, offsetMs: Long, v: Double) =
        TradeEvent(sym, new java.sql.Timestamp(t0 + offsetMs), 1.0, v)
      input.addData(ev("A", 0, 1.0), ev("A", 1000, 2.0), ev("B", 0, 5.0))
      q.processAllAvailable()
      input.addData(ev("A", 2000, 3.0))
      q.processAllAvailable()
      val rows = spark.table("cum_test").as[CumRow].collect()
        .groupBy(_.symbol).view.mapValues(_.sortBy(_.ts.getTime).map(_.cumulative_volume))
      assert(rows("A").toSeq === Seq(1.0, 3.0, 6.0)) // state survived the batch boundary
      assert(rows("B").toSeq === Seq(5.0))
    } finally q.stop()
  }

  test("transformWithState cumulative volume matches fMGWS semantics") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[TradeEvent](spark)
      val q = Stateful.cumulativeVolumeTws(spark, input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("cum_tws").start()
      try {
        def ev(sym: String, offsetMs: Long, v: Double) =
          TradeEvent(sym, new java.sql.Timestamp(t0 + offsetMs), 1.0, v)
        input.addData(ev("A", 0, 1.0), ev("A", 1000, 2.0), ev("B", 0, 5.0))
        q.processAllAvailable()
        input.addData(ev("A", 2000, 3.0))
        q.processAllAvailable()
        val rows = spark.table("cum_tws").as[CumRow].collect()
          .groupBy(_.symbol).view
          .mapValues(_.sortBy(_.ts.getTime).map(_.cumulative_volume))
        assert(rows("A").toSeq === Seq(1.0, 3.0, 6.0))
        assert(rows("B").toSeq === Seq(5.0))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("lookback buffer emits only once full, FIXTURES.md §6 cases") {
    import spark.implicits._
    for ((count, expected) <- Seq(99 -> 0, 100 -> 1, 101 -> 2, 150 -> 51)) {
      val input = MemoryStream[TradeEvent](spark)
      val q = Stateful.lookbackBuffer(spark, input.toDS(), n = 100)
        .writeStream.outputMode("append")
        .format("memory").queryName(s"lb_$count").start()
      try {
        input.addData((1 to count).map(i =>
          TradeEvent("BTC", new java.sql.Timestamp(t0 + i * 1000L), i.toDouble, 1.0)))
        q.processAllAvailable()
        assert(spark.table(s"lb_$count").count() === expected, s"count=$count")
        if (count >= 100) {
          // last emission carries the most recent 100 rows, oldest
          // first (drop-oldest), and the matching running average
          val last = spark.table(s"lb_$count").as[LookbackRow].collect()
            .maxBy(_.ts.getTime)
          val lo = count - 100 + 1
          assert(math.abs(last.avg_price - (lo + count) / 2.0) < 1e-9)
          assert(last.matrix.length === 100)
          assert(last.matrix.map(_.price) === (lo to count).map(_.toDouble))
          assert(last.matrix.last.ts === last.ts) // newest row is the emission row
        }
      } finally q.stop()
    }
  }

  test("stream-stream interval join: only in-window click/purchase pairs emit") {
    import spark.implicits._
    val clicks = MemoryStream[UserEvent](spark)
    val purchases = MemoryStream[UserEvent](spark)
    val q = graft.streaming.StreamJoins
      .purchasesWithRecentClicks(purchases.toDF(), clicks.toDF(), windowSec = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    try {
      // user 1: click 30s before purchase (in window), click 90s before
      // (out of window); user 2: click AFTER the purchase (excluded)
      clicks.addData(
        UserEvent(1L, new java.sql.Timestamp(t0 + 30000), 1.0),
        UserEvent(1L, new java.sql.Timestamp(t0 - 40000), 1.0),
        UserEvent(2L, new java.sql.Timestamp(t0 + 70000), 1.0))
      purchases.addData(
        UserEvent(1L, new java.sql.Timestamp(t0 + 60000), 99.0),
        UserEvent(2L, new java.sql.Timestamp(t0 + 60000), 50.0))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select("user_id", "click_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSet
      assert(rows === Set((1L, new java.sql.Timestamp(t0 + 30000))))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops repeats, state stays bounded") {
    import spark.implicits._
    val input = MemoryStream[TradeEvent](spark)
    val q = Stateful.dedupWithinWatermark(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm").start()
    try {
      def ev(offsetMs: Long, v: Double) =
        TradeEvent("BTC", new java.sql.Timestamp(t0 + offsetMs), 1.0, v)
      // same (symbol, ts) three times in one batch + once more next batch
      input.addData(ev(0, 1.0), ev(0, 1.0), ev(0, 1.0), ev(5000, 2.0))
      q.processAllAvailable()
      input.addData(ev(0, 1.0)) // duplicate within watermark: dropped
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() === 2) // (0) and (5000)
    } finally q.stop()
  }

  test("streaming session windows merge per-user bursts, finalize on watermark") {
    import spark.implicits._
    val input = MemoryStream[TradeEvent](spark)
    val sessions = input.toDS().toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "30 seconds"), col("symbol"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("symbol"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n_events"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_stream").start()
    try {
      def ev(sym: String, offsetMs: Long) =
        TradeEvent(sym, new java.sql.Timestamp(t0 + offsetMs), 1.0, 1.0)
      // burst of 3 within 30s gaps, then silence, then a far event that
      // advances the watermark past the session end -> finalized once
      input.addData(ev("A", 0), ev("A", 10000), ev("A", 20000))
      q.processAllAvailable()
      input.addData(ev("A", 600000))
      q.processAllAvailable()
      val rows = spark.table("sess_stream")
        .select("symbol", "n_events").as[(String, Long)].collect().toSet
      assert(rows.contains(("A", 3L)), s"merged session of 3, got $rows")
    } finally q.stop()
  }

  test("transformWithState session windows: in-batch close + timer-driven finalize") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[TradeEvent](spark)
      val q = Stateful.sessionWindowsTws(spark, input.toDS(), gapMs = 30000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_tws").start()
      try {
        def ev(sym: String, offsetMs: Long, price: Double) =
          TradeEvent(sym, new java.sql.Timestamp(t0 + offsetMs), price, 2.0)
        // A: burst of 3 (10s apart), then a gap-exceeding event in the
        // SAME batch -> first session emits immediately, second stays open
        input.addData(ev("A", 0, 1.0), ev("A", 10000, 2.0),
          ev("A", 20000, 3.0), ev("A", 100000, 4.0), ev("B", 0, 5.0))
        q.processAllAvailable()
        // A's burst closes in-batch (gap proven by the 100s event); B's
        // lone session finalizes by timer because that same far event
        // advanced the watermark past B's gap. A's second session
        // (100s) is still open.
        val afterBatch = spark.table("sess_tws").as[Stateful.SessionRow]
          .collect()
        assert(afterBatch.map(_.symbol).sorted.toSeq === Seq("A", "B"),
          s"got ${afterBatch.toSeq}")
        val aFirst = afterBatch.find(_.symbol == "A").get
        assert(aFirst.n_events === 3)
        assert(aFirst.total_usd === (1.0 + 2.0 + 3.0) * 2.0)
        assert(aFirst.session_end.getTime === t0 + 20000 + 30000)
        // advance the watermark far past both open sessions -> timers fire
        input.addData(ev("C", 1000000, 1.0))
        q.processAllAvailable()
        val all = spark.table("sess_tws").as[Stateful.SessionRow].collect()
        val bySym = all.groupBy(_.symbol)
        assert(bySym("A").map(_.n_events).sorted.toSeq === Seq(1L, 3L))
        assert(bySym("B").head.n_events === 1)
        assert(bySym("B").head.total_usd === 10.0)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streamed volume agg equals batch recompute over on-time events") {
    import spark.implicits._
    // deterministic pseudo-random stream: 120 events, 3 symbols,
    // jittered timestamps, delivered in 3 chronological chunks plus one
    // event late beyond the 30s watermark (must be dropped).
    val rnd = new scala.util.Random(42)
    val events = (0 until 120).map { i =>
      (Seq("BTC", "ETH", "SOL")(rnd.nextInt(3)),
        t0 + i * 3000L + rnd.nextInt(2000),
        10.0 + rnd.nextInt(100) / 7.0,
        1.0 + rnd.nextInt(50) / 10.0)
    }
    val chunks = events.grouped(40).toSeq
    val late = ("BTC", t0, 99.0, 99.0) // ~6 min older than chunk 1 max

    val input = MemoryStream[String](spark)
    val out = tmpDir("graft-golden-out")
    val ckpt = tmpDir("graft-golden-ckpt")
    val queries = StreamingJob.run(spark, input.toDF().select(col("value")),
      StreamingJob.Config(out, ckpt))
    try {
      def send(es: Seq[(String, Long, Double, Double)]): Unit = {
        input.addData(es.map { case (s, t, p, v) => envelope(s, t, p, v, 0.0) })
        queries.foreach(_.processAllAvailable())
      }
      send(chunks(0))
      send(chunks(1) :+ late) // late event arrives with chunk 2
      send(chunks(2))

      val streamed = Upsert.read(spark, s"$out/volume_tracking").get
        .select(col("symbol"), col("timestamp"),
          round(col("total_volume"), 6).as("tv"),
          round(col("total_usd_volume"), 6).as("tuv"))

      val expected = events.toDF("symbol", "t", "price", "volume")
        .withColumn("timestamp", date_trunc("minute", timestamp_millis(col("t"))))
        .groupBy("symbol", "timestamp")
        .agg(round(sum(col("volume")), 6).as("tv"),
          round(sum(col("price") * col("volume")), 6).as("tuv"))

      assert(streamed.count() === expected.count())
      assert(streamed.exceptAll(expected).count() === 0,
        "streamed sink rows differ from batch recompute")
      assert(expected.exceptAll(streamed).count() === 0)
    } finally queries.foreach(_.stop())
  }

  test("upsert merge rewrites only the buckets the batch touches") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = tmpDir("graft-upsert-buckets")
    val b1 = (0 until 64).map(i => (s"k$i", 1L, i.toDouble)).toDF("k", "t", "v")
    Upsert.merge(b1, 0, root, Seq("k", "t"))
    def parquetFiles(): Set[String] =
      Files.walk(Paths.get(root)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSet
    val before = parquetFiles()
    // single-key batch → exactly one bucket rewritten; nBuckets given
    // here must be ignored (pinned at table creation) or the key→bucket
    // mapping would drift
    Upsert.merge(Seq(("k3", 1L, 99.0)).toDF("k", "t", "v"), 1, root,
      Seq("k", "t"), nBuckets = 999)
    // every original file survives (untouched buckets are carried by
    // manifest reference, not rewritten)
    assert(before.subsetOf(parquetFiles()))
    // the new generation contains exactly one bucket dir
    val gen1Buckets = Files.list(Paths.get(root, "gen1")).iterator().asScala
      .count(_.getFileName.toString.startsWith("_bucket="))
    assert(gen1Buckets === 1)
    val rows = Upsert.read(spark, root).get.select("k", "v")
      .as[(String, Double)].collect().toMap
    assert(rows("k3") === 99.0)
    assert(rows.size === 64)
  }

  test("AvailableNow trigger drains the backlog then stops on its own") {
    import java.nio.file.{Files, Paths}
    val in = tmpDir("graft-avnow-in")
    val out = tmpDir("graft-avnow-out")
    val ckpt = tmpDir("graft-avnow-ckpt")
    def envelope(tMillis: Long, p: Double): String =
      s"""{"data":[{"c":null,"p":$p,"s":"BTC","t":$tMillis,"v":1.0,"cv":1.0}],"type":"trade"}"""
    Files.write(Paths.get(in, "b1.json"),
      (1 to 5).map(i => envelope(1700000000000L + i * 1000, i.toDouble))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val q = StreamingJob.decode(spark.readStream.text(in).select(col("value")))
      .select("symbol", "timestamp", "price")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    // AvailableNow = process everything present at start, then terminate
    // without an external stop — the batch-catchup mode for a streaming
    // pipeline replaying history
    assert(q.awaitTermination(60000), "query must self-terminate")
    assert(spark.read.parquet(out).count() === 5)
    // a second run with new backlog resumes from the checkpoint
    Files.write(Paths.get(in, "b2.json"),
      Seq(envelope(1700000010000L, 9.0)).mkString("", "\n", "\n").getBytes("UTF-8"))
    val q2 = StreamingJob.decode(spark.readStream.text(in).select(col("value")))
      .select("symbol", "timestamp", "price")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    assert(q2.awaitTermination(60000))
    assert(spark.read.parquet(out).count() === 6, "no reprocessing, only the new file")
  }

  test("upsert GC removes stale bucket copies from surviving generations") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = tmpDir("graft-upsert-gc")
    val b1 = (0 until 64).map(i => (s"k$i", 1L, i.toDouble)).toDF("k", "t", "v")
    Upsert.merge(b1, 0, root, Seq("k", "t"))
    Upsert.merge(Seq(("k3", 1L, 91.0)).toDF("k", "t", "v"), 1, root, Seq("k", "t"))
    Upsert.merge(Seq(("k3", 1L, 92.0)).toDF("k", "t", "v"), 2, root, Seq("k", "t"))
    // one-version grace: gen1 is still referenced by the PREVIOUS
    // manifest (readers pinned just before the flip), so it survives
    // one merge and dies on the next
    assert(Files.exists(Paths.get(root, "gen1")))
    Upsert.merge(Seq(("k3", 1L, 93.0)).toDF("k", "t", "v"), 3, root, Seq("k", "t"))
    assert(!Files.exists(Paths.get(root, "gen1")))
    // k3's bucket dir: the only one in gen3
    val hot = Files.list(Paths.get(root, "gen3")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_bucket=")).toSeq.head
    // gen0 survives for its other buckets, but its stale copy of the
    // hot bucket has been GC'd
    assert(!Files.exists(Paths.get(root, "gen0", hot)))
    assert(Files.list(Paths.get(root, "gen0")).iterator().asScala
      .count(_.getFileName.toString.startsWith("_bucket=")) > 0)
    val rows = Upsert.read(spark, root).get.select("k", "v")
      .as[(String, Double)].collect().toMap
    assert(rows("k3") === 93.0)
    assert(rows.size === 64)
  }

  test("upsert readKey serves a point lookup from a single bucket dir") {
    import spark.implicits._
    val root = tmpDir("graft-upsert-pointread")
    val b1 = (0 until 200).map(i => (s"sym${i % 20}", i.toLong, i.toDouble))
      .toDF("symbol", "t", "v")
    Upsert.merge(b1, 0, root, Seq("symbol", "t"), bucketBy = Seq("symbol"))
    val served = Upsert.readKey(spark, root, Seq("sym7")).get
    // correct rows, and the scan touched exactly one bucket dir
    assert(served.count() === 10)
    assert(served.filter(col("symbol") =!= "sym7").count() === 0)
    val bucketDirs = served.inputFiles
      .map(_.replaceAll("/[^/]*$", "")).toSet
    assert(bucketDirs.size === 1, s"expected one bucket dir, got $bucketDirs")
    // matches the unpruned full-table read + filter
    val full = Upsert.read(spark, root).get.filter(col("symbol") === "sym7")
      .select("symbol", "t", "v").as[(String, Long, Double)].collect().toSet
    val viaKey = served.select("symbol", "t", "v")
      .as[(String, Long, Double)].collect().toSet
    assert(viaKey === full)
  }

  test("upsert merge is idempotent under batch replay") {
    import spark.implicits._
    val root = tmpDir("graft-upsert")
    val b1 = Seq(("A", 1L, 10.0), ("B", 1L, 20.0)).toDF("k", "t", "v")
    val b2 = Seq(("B", 1L, 25.0), ("C", 2L, 30.0)).toDF("k", "t", "v")
    Upsert.merge(b1, 0, root, Seq("k", "t"))
    Upsert.merge(b2, 1, root, Seq("k", "t"))
    Upsert.merge(b2, 1, root, Seq("k", "t")) // replay of batch 1
    val rows = Upsert.read(spark, root).get.select("k", "v").as[(String, Double)]
      .collect().toMap
    assert(rows === Map("A" -> 10.0, "B" -> 25.0, "C" -> 30.0))
  }

  test("query_05 predict vertical: stream agrees with batch predictNext on the same bars") {
    import spark.implicits._
    val n = 10 // small lookback so sf0.001 yields plenty of emissions
    val trades = Tables.trades(spark, sf)
    val bars = graft.ops.TradeOps.slidingFeatures(trades)
    // the scaler is fitted offline over the full bar history (the
    // reference pickles a fitted MinMaxScaler) — both sides score with it
    val stats = graft.ops.Predict.scalerStats(bars)
    val expected = graft.ops.Predict
      .predictNext(trades, n, scorer = graft.ops.Predict.linearScorer(n))
      .select("symbol", "timestamp", "predicted_close")
      .as[(String, java.sql.Timestamp, Double)].collect().toSet
    assert(expected.nonEmpty)

    // feed the SAME bars as the streaming features topic, in three
    // time-ordered chunks (order within a symbol is what matters)
    val feed = bars
      .select(col("symbol"), col("timestamp"), col("close"), col("high"),
        col("low"), col("total_usd_volume"),
        col("total_volume").as("total_btc_volume"), col("num_trades"))
      .as[(String, java.sql.Timestamp, Double, Double, Double, Double, Double, Long)]
      .collect().sortBy(_._2.getTime)
    val input = MemoryStream[(String, java.sql.Timestamp, Double, Double,
      Double, Double, Double, Long)](spark)
    val out = tmpDir("graft-predict-out")
    val ckpt = tmpDir("graft-predict-ckpt")
    val q = StreamingJob.runPredict(spark,
      input.toDF().toDF("symbol", "timestamp", "close", "high", "low",
        "total_usd_volume", "total_btc_volume", "num_trades"),
      stats, StreamingJob.Config(out, ckpt), n)
    try {
      feed.grouped((feed.length / 3).max(1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = Upsert.read(spark, s"$out/predictions").get
        .select("symbol", "timestamp", "predicted_close")
        .as[(String, java.sql.Timestamp, Double)].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("query_05 predict vertical: streamed store serves exactly k7_predict_writeback") {
    // Direct end-to-end closure (VERDICT r15 #5): the streamed
    // lookback→score→Upsert pipeline's SERVED table must equal what the
    // batch two-phase writeback (k7) serves — same n (the production
    // lookbackN=100), same fitted scaler, same store read path. The
    // n=10 spec above covers emission volume; this one pins the exact
    // production contract.
    import spark.implicits._
    val n = graft.ops.Predict.lookbackN
    val trades = Tables.trades(spark, sf)
    val expected = graft.ops.Predict
      .predictWriteback(spark, trades, "spec_k7_direct")
      .as[(String, java.sql.Timestamp, Double)].collect().toSet
    assert(expected.nonEmpty, "k7 must emit at this sf for the spec to bite")

    val bars = graft.ops.TradeOps.slidingFeatures(trades)
    val stats = graft.ops.Predict.scalerStats(bars)
    val feed = bars
      .select(col("symbol"), col("timestamp"), col("close"), col("high"),
        col("low"), col("total_usd_volume"),
        col("total_volume").as("total_btc_volume"), col("num_trades"))
      .as[(String, java.sql.Timestamp, Double, Double, Double, Double, Double, Long)]
      .collect().sortBy(_._2.getTime)
    val input = MemoryStream[(String, java.sql.Timestamp, Double, Double,
      Double, Double, Double, Long)](spark)
    val out = tmpDir("graft-predict-k7-out")
    val ckpt = tmpDir("graft-predict-k7-ckpt")
    val q = StreamingJob.runPredict(spark,
      input.toDF().toDF("symbol", "timestamp", "close", "high", "low",
        "total_usd_volume", "total_btc_volume", "num_trades"),
      stats, StreamingJob.Config(out, ckpt), n)
    try {
      feed.grouped((feed.length / 2).max(1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = Upsert.read(spark, s"$out/predictions").get
        .select("symbol", "timestamp", "predicted_close")
        .as[(String, java.sql.Timestamp, Double)].collect().toSet
      assert(got === expected,
        "streamed predictions store must serve exactly the k7 writeback table")
    } finally q.stop()
  }

  test("streaming cusum: bit-equal to the batch windows across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[TradeEvent](spark)
    val q = Stateful.cusumStream(spark, input.toDS(), h = 15.0).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_test").start()
    try {
      def ev(i: Int, sym: String, p: Double) =
        TradeEvent(sym, new java.sql.Timestamp(t0 + i * 1000L), p, 1.0)
      // drift up on BTC, drift down on ETH; split MID-DRIFT across
      // batches so the state carryover is what's being tested
      val all = (1 to 5).map(ev(_, "BTC", 100.0)) ++
        (6 to 9).map(ev(_, "BTC", 110.0)) ++
        (1 to 4).map(ev(_, "ETH", 50.0)) ++
        (5 to 8).map(ev(_, "ETH", 43.5))
      val (b1, b2) = all.splitAt(7)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("cusum_test")
        .select("symbol", "ts", "cusum_pos", "cusum_neg", "drifted")
      // the batch form needs (timestamp, event_id) — ts is unique per
      // symbol here, so any constant event_id gives the same order
      val batchIn = all.toDF()
        .select(lit(0L).as("event_id"), col("symbol"),
          col("ts").as("timestamp"), col("price"), col("volume"),
          (col("price") * col("volume")).as("usd_volume"))
      val batch = graft.ops.TradeOps.cusum(batchIn, h = 15.0)
        .select(col("symbol"), col("timestamp").as("ts"),
          col("cusum_pos"), col("cusum_neg"), col("drifted"))
      assert(streamed.count() === all.size)
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
      // the down-drift fires the negative side only
      assert(spark.table("cusum_test")
        .filter(col("symbol") === "ETH" && col("drifted"))
        .agg(min("cusum_neg")).head.getDouble(0) > 15.0)
    } finally q.stop()
  }

  test("streaming anomaly: flags the identical rows as the batch windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[TradeEvent](spark)
    val q = Stateful.anomalyStream(spark, input.toDS()).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("anomaly_test").start()
    try {
      def ev(i: Int, p: Double) =
        TradeEvent("BTC", new java.sql.Timestamp(t0 + i * 1000L), p, 1.0)
      // flat feed with two spikes, the second in a later micro-batch so
      // the ring buffer must carry across batches
      val all = (1 to 60).map { i =>
        ev(i, if (i == 30 || i == 52) 200.0 else 100.0)
      }
      val (b1, b2) = all.splitAt(40)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("anomaly_test")
        .select("symbol", "ts", "price")
      val batchIn = all.toDF()
        .select(lit(0L).as("event_id"), col("symbol"),
          col("ts").as("timestamp"), col("price"), col("volume"),
          (col("price") * col("volume")).as("usd_volume"))
      val batch = graft.ops.TradeOps.anomalyFlags(batchIn)
        .select(col("symbol"), col("timestamp").as("ts"), col("price"))
      assert(streamed.count() === 2) // exactly the two spike rows
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally q.stop()
  }

  test("observe API: per-batch ingest metrics arrive on query progress") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long)]() // (rows, usd_vol_cents) per micro-batch
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("ingest")
        if (m != null && m.getLong(0) > 0)
          metrics.add((m.getLong(0), m.getLong(1)))
      }
    }
    spark.streams.addListener(listener)
    val input = MemoryStream[TradeEvent](spark)
    val flat = input.toDF()
      .select(col("symbol"), col("ts").as("timestamp"), col("price"),
        col("volume"), (col("price") * col("volume")).as("usd_volume"))
    val q = graft.streaming.StreamingJob.withIngestMetrics(flat)
      .writeStream.outputMode("append")
      .format("memory").queryName("observe_test").start()
    try {
      def ev(i: Int, p: Double, v: Double) =
        TradeEvent("BTC", new java.sql.Timestamp(t0 + i * 1000L), p, v)
      input.addData(ev(1, 100.0, 2.0), ev(2, 50.0, 1.0))
      q.processAllAvailable()
      input.addData(ev(3, 10.0, 10.0))
      q.processAllAvailable()
      // listener delivery is async relative to processAllAvailable
      val deadline = System.nanoTime() + 10_000_000_000L
      while (metrics.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val seen = metrics.toArray(Array.empty[(Long, Long)]).sortBy(_._1)
      assert(seen.length === 2, s"got ${seen.mkString(",")}")
      assert(seen(0) === ((1L, 10000L)))   // 10.0 * 10.0 = 100.00 usd
      assert(seen(1) === ((2L, 25000L)))   // 200.00 + 50.00 usd
    } finally {
      q.stop(); spark.streams.removeListener(listener)
    }
  }

  test("t15 streaming sessions: cross-batch merge, append equals batch sessionize") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val feed = input.toDF().toDF("user_id", "timestamp", "usd_volume")
    val q = graft.ops.Scale.sessionizeStream(feed)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_test").start()
    try {
      def ev(u: Long, offSec: Long, v: Double) =
        (u, new java.sql.Timestamp(t0 + offSec * 1000L), v)
      // user 1: one session spanning BOTH micro-batches (events 0-240 s,
      // gaps < 5 min), then a separate session at +30 min; user 2: a
      // single-event session — state merge across batches is the test
      val b1 = Seq(ev(1L, 0, 10.0), ev(1L, 60, 5.0), ev(2L, 10, 7.0))
      val b2 = Seq(ev(1L, 240, 2.5), ev(1L, 1800, 1.0))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // two advancer batches push the watermark past every real session
      // (watermark for batch N comes from batch N-1's max event time)
      input.addData(ev(99L, 7200, 0.0)); q.processAllAvailable()
      input.addData(ev(99L, 7300, 0.0)); q.processAllAvailable()
      val streamed = spark.table("sessions_test")
        .filter(col("user_id") =!= 99L)
      val batch = graft.ops.Scale.sessionize(
        (b1 ++ b2).toDF("user_id", "timestamp", "usd_volume"))
        .filter(col("user_id") =!= 99L)
      // user 1's first session merged across batches: 3 events, one row
      assert(streamed.filter(col("user_id") === 1L &&
        col("n_events") === 3).count() === 1)
      assert(streamed.count() === 3) // u1 x2 sessions + u2 x1
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally q.stop()
  }

  test("query_06 incremental MV: streamed merge equals batch incrementalAgg, replay-safe") {
    import spark.implicits._
    // deterministic events over 5 days / 3 event types, fed in 3
    // micro-batches — the streamed view must equal the batch-tier
    // full-history incrementalAgg over the same rows
    val rnd = new scala.util.Random(7)
    val events = (0 until 90).map { i =>
      (i.toLong,
        new java.sql.Timestamp(t0 + (i % 5) * 86400000L + rnd.nextInt(900000)),
        1000L + i % 11,
        Seq("view", "click", "buy")(rnd.nextInt(3)),
        rnd.nextInt(10000) / 100.0,
        "{}")
    }
    val colNames = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)](spark)
    val out = tmpDir("graft-mv-out")
    val ckpt = tmpDir("graft-mv-ckpt")
    val q = StreamingJob.runIncrementalAgg(spark,
      input.toDF().toDF(colNames: _*), StreamingJob.Config(out, ckpt))
    val mvRoot = s"$out/mv_event_daily"
    val outCols = Seq("event_type", "day", "n_events", "sum_value_micro",
      "min_value", "max_value")
    try {
      events.grouped(30).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      def streamedView() = Upsert.read(spark, mvRoot).get
        .select(outCols.map(col): _*)
      val batch = graft.ops.Incremental
        .incrementalAgg(events.toDF(colNames: _*))
        .select(outCols.map(col): _*)
      val streamed = streamedView()
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed MV state differs from batch full recompute")
      // replay safety: re-applying the LAST batch id must be a no-op —
      // an additive merge would otherwise double-count on crash replay
      val before = streamed.collect().map(_.toString).sorted.toSeq
      StreamingJob.mergeIncrementalAgg(
        events.drop(60).toDF(colNames: _*), batchId = 2L, mvRoot)
      val after = streamedView().collect().map(_.toString).sorted.toSeq
      assert(after === before, "batch replay mutated the view (double count)")
    } finally q.stop()
  }

  test("query_08 incremental dedup: streamed screening equals batch crossDedup, replay-idempotent") {
    import spark.implicits._
    // the corpus arrives as a stream: the already-ingested docs
    // (doc_id % 10 != 0) first — the stored-corpus seed — then the
    // "new crawl" slice (doc_id % 10 == 0) in doc_id order over TWO
    // micro-batches, so the accumulated flags must equal the batch
    // operator's one-shot screen of the same slice
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val (newDocs, corpusDocs) = rows.partition(_._1 % 10 == 0)
    val chunks = Seq(corpusDocs.toSeq) ++
      newDocs.grouped((newDocs.length + 1) / 2).map(_.toSeq)
    val input = MemoryStream[(Long, String)](spark)
    val out = tmpDir("graft-dedup-out")
    val ckpt = tmpDir("graft-dedup-ckpt")
    val q = StreamingJob.runIncrementalDedup(spark,
      input.toDF().toDF("doc_id", "text"), StreamingJob.Config(out, ckpt))
    val flagsRoot = s"$out/dedup/flags"
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      def streamedFlags() = Upsert.read(spark, flagsRoot).get
        .filter(col("doc_id") % 10 === 0)
        .select("doc_id", "n_matches", "is_dup")
      val expected = graft.ops.Dedup.crossDedup(docs)
      assert(streamedFlags().count() === expected.count())
      assert(streamedFlags().exceptAll(expected).isEmpty &&
        expected.exceptAll(streamedFlags()).isEmpty,
        "streamed dedup flags differ from batch crossDedup")
      // replay idempotence across the WHOLE crash window: by the time a
      // foreachBatch replay runs, the store may already hold the batch's
      // signatures — screenBatch's anti-join must hide the batch from
      // itself, so re-applying the last batch changes nothing
      val before = streamedFlags().collect().map(_.toString).sorted.toSeq
      StreamingJob.applyDedupBatch(chunks.last.toDF("doc_id", "text"),
        batchId = (chunks.length - 1).toLong, s"$out/dedup")
      val after = streamedFlags().collect().map(_.toString).sorted.toSeq
      assert(after === before, "batch replay mutated the dedup flags")
    } finally q.stop()
  }

  test("query_09 retractable minmax: streamed Z-set merge equals batch retractableMinMax, replay-safe") {
    import spark.implicits._
    // the SAME deterministic events as query_06, but as a SIGNED change
    // feed: every row arrives as an insert (+1) and the batch
    // operator's retraction slice (event_id % RetractMod == 0) arrives
    // as deletes (−1) spread over later micro-batches — including ONE
    // delete racing AHEAD of its insert, the negative-multiplicity path
    val rnd = new scala.util.Random(7)
    val events = (0 until 90).map { i =>
      (i.toLong,
        new java.sql.Timestamp(t0 + (i % 5) * 86400000L + rnd.nextInt(900000)),
        1000L + i % 11,
        Seq("view", "click", "buy")(rnd.nextInt(3)),
        rnd.nextInt(10000) / 100.0,
        "{}")
    }
    val colNames = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def signed(e: (Long, java.sql.Timestamp, Long, String, Double, String),
        sign: Long) = (e._4, e._2, e._5, sign)
    val mod = graft.ops.Incremental.RetractMod
    val del = events.filter(_._1 % mod == 0)
    val aheadDel = del.filter(_._1 >= 60).head   // insert arrives in batch 3
    val batches = Seq(
      events.slice(0, 30).map(signed(_, 1L)),
      events.slice(30, 60).map(signed(_, 1L)) ++
        del.filter(_._1 < 30).map(signed(_, -1L)) :+ signed(aheadDel, -1L),
      events.slice(60, 90).map(signed(_, 1L)) ++
        del.filter(e => e._1 >= 30 && e != aheadDel).map(signed(_, -1L)))
    val input = MemoryStream[(String, java.sql.Timestamp, Double, Long)](spark)
    val out = tmpDir("graft-zset-out")
    val ckpt = tmpDir("graft-zset-ckpt")
    val q = StreamingJob.runRetractableMinMax(spark,
      input.toDF().toDF("event_type", "ts", "value", "sign"),
      StreamingJob.Config(out, ckpt))
    val root = s"$out/minmax_state"
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      def view() = StreamingJob.retractMinMaxView(spark, root)
      val batch = graft.ops.Incremental
        .retractableMinMax(events.toDF(colNames: _*))
      assert(view().count() === batch.count())
      assert(view().exceptAll(batch).isEmpty && batch.exceptAll(view()).isEmpty,
        "streamed Z-set view differs from batch retractableMinMax")
      // the SAME multiset store serves the holistic median view — no
      // extra state, and it must agree with the batch selection
      val medView = StreamingJob.retractMedianView(spark, root)
      val medBatch = graft.ops.Incremental
        .retractableMedian(events.toDF(colNames: _*))
      assert(medView.exceptAll(medBatch).isEmpty &&
        medBatch.exceptAll(medView).isEmpty,
        "streamed median view differs from batch retractableMedian")
      // replay safety: the additive multiset merge is guarded by the
      // applied-batch marker riding the store's atomic pointer flip
      val before = view().collect().map(_.toString).sorted.toSeq
      StreamingJob.applyRetractBatch(
        batches.last.toDF("event_type", "ts", "value", "sign"),
        batchId = 2L, root)
      val after = view().collect().map(_.toString).sorted.toSeq
      assert(after === before, "batch replay mutated the multiset (double count)")
    } finally q.stop()
  }

  test("query_10 retractable topk: streamed Z-set merge equals batch retractableTopK, eviction promotes") {
    import spark.implicits._
    // values are crafted so every retraction slice row (event_id %
    // RetractMod == 0) holds a TOP value for its type: the deletes
    // evict the reigning top-k members, forcing the promotion path —
    // exactly what a bounded-candidate top-k state cannot survive
    val mod = graft.ops.Incremental.RetractMod
    val events = (0 until 90).map { i =>
      val topValue = i % mod == 0
      (i.toLong,
        new java.sql.Timestamp(t0 + (i % 5) * 86400000L + i * 1000L),
        1000L + i % 11,
        Seq("view", "click", "buy")(i % 3),
        if (topValue) 500.0 + i else 10.0 + (i % 37),
        "{}")
    }
    val colNames = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def signed(e: (Long, java.sql.Timestamp, Long, String, Double, String),
        sign: Long) = (e._4, e._2, e._5, sign)
    val del = events.filter(_._1 % mod == 0)
    val batches = Seq(
      events.slice(0, 45).map(signed(_, 1L)),
      events.slice(45, 90).map(signed(_, 1L)) ++
        del.filter(_._1 < 45).map(signed(_, -1L)),
      del.filter(_._1 >= 45).map(signed(_, -1L)))
    val input = MemoryStream[(String, java.sql.Timestamp, Double, Long)](spark)
    val out = tmpDir("graft-topk-out")
    val ckpt = tmpDir("graft-topk-ckpt")
    val q = StreamingJob.runRetractableTopK(spark,
      input.toDF().toDF("event_type", "ts", "value", "sign"),
      StreamingJob.Config(out, ckpt))
    val root = s"$out/topk_state"
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      def view() = StreamingJob.retractTopKView(spark, root)
      val batch = graft.ops.Incremental
        .retractableTopK(events.toDF(colNames: _*))
      // the crafted top values really were deleted: no surviving value
      // reaches the 500-band, so the batch top-k is all promoted rows
      assert(batch.filter(col("value_micro") >= 500000000L).count() === 0)
      assert(view().count() === batch.count())
      assert(view().exceptAll(batch).isEmpty && batch.exceptAll(view()).isEmpty,
        "streamed Z-set top-k view differs from batch retractableTopK")
      // replay safety: additive merge behind the applied-batch marker
      val before = view().collect().map(_.toString).sorted.toSeq
      StreamingJob.applyRetractTopKBatch(
        batches.last.toDF("event_type", "ts", "value", "sign"),
        batchId = 2L, root)
      val after = view().collect().map(_.toString).sorted.toSeq
      assert(after === before, "batch replay mutated the multiset (double count)")
    } finally q.stop()
  }

  test("query_07 cdc apply: streamed tombstone merge equals batch cdcApply") {
    import spark.implicits._
    val trades = Tables.trades(spark, sf)
    val expected = graft.ops.Incremental.cdcApply(trades)
      .select("user_id", "last_ts", "last_price")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSet
    assert(expected.nonEmpty)
    // the identical change feed, in (timestamp, event_id) order, three
    // micro-batches — deletes interleaved exactly as the batch derives them
    val feed = trades
      .withColumn("op",
        when(col("event_id") % 10 === 0, lit("D")).otherwise(lit("U")))
      .select(col("user_id"), col("timestamp"), col("event_id"), col("price"),
        col("op"))
      .as[(Long, java.sql.Timestamp, Long, Double, String)]
      .collect().sortBy(r => (r._2.getTime, r._3))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double, String)](spark)
    val out = tmpDir("graft-cdc-out")
    val ckpt = tmpDir("graft-cdc-ckpt")
    val q = StreamingJob.runCdcApply(spark,
      input.toDF().toDF("user_id", "timestamp", "event_id", "price", "op"),
      StreamingJob.Config(out, ckpt))
    try {
      feed.grouped((feed.length / 3).max(1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = Upsert.read(spark, s"$out/cdc_state").get
        .select("user_id", "last_ts", "last_price")
        .as[(Long, java.sql.Timestamp, Double)].collect().toSet
      assert(got === expected,
        "streamed CDC snapshot differs from batch cdcApply fixpoint")
    } finally q.stop()
  }

  test("cdc tombstones: delete removes the key, a later change re-adds it") {
    import spark.implicits._
    val root = tmpDir("graft-cdc-tomb") + "/state"
    def row(uid: Long, t: Long, eid: Long, p: Double, op: String) =
      (uid, new java.sql.Timestamp(t0 + t), eid, p, op)
    def batch(id: Long, rows: Seq[(Long, java.sql.Timestamp, Long, Double, String)]): Unit =
      StreamingJob.applyCdcBatch(
        rows.toDF("user_id", "timestamp", "event_id", "price", "op"), id, root)
    batch(0, Seq(row(1, 1000, 1, 10.0, "U"), row(2, 1000, 2, 20.0, "U")))
    batch(1, Seq(row(1, 2000, 3, 0.0, "D"))) // delete user 1
    val afterDelete = Upsert.read(spark, root).get
      .select("user_id").as[Long].collect().toSet
    assert(afterDelete === Set(2L), "tombstone failed to remove the key")
    batch(2, Seq(row(1, 3000, 4, 30.0, "U"))) // re-insert user 1
    val afterReinsert = Upsert.read(spark, root).get
      .select("user_id", "last_price").as[(Long, Double)].collect().toMap
    assert(afterReinsert === Map(1L -> 30.0, 2L -> 20.0),
      "re-insert after delete must restore the key with the new value")
  }

  test("stream-static enrichment: broadcast dim join, left keeps unmatched") {
    import spark.implicits._
    val input = MemoryStream[TradeEvent](spark)
    val dim = Seq(("BTC", "crypto"), ("ETH", "crypto"))
      .toDF("symbol", "sector")
    val q = graft.streaming.StreamJoins
      .enrichWithDimension(input.toDF(), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich").start()
    try {
      input.addData(
        TradeEvent("BTC", new java.sql.Timestamp(t0), 1.0, 100.0),
        TradeEvent("XAU", new java.sql.Timestamp(t0), 1.0, 200.0))
      q.processAllAvailable()
      val out = spark.table("enrich")
        .select("symbol", "sector").as[(String, Option[String])]
        .collect().toMap
      // enriched where the dim knows the symbol, NULL (not dropped) where not
      assert(out === Map("BTC" -> Some("crypto"), "XAU" -> None))
    } finally q.stop()
  }

  test("streaming gaps: aggregated stream equals batch interarrival " +
    "histogram, state carries across batches, burst flags online") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    val input = MemoryStream[EventStream.UserEvent](spark)
    val q = EventStream.gapStream(spark, input.toDS()).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("gaps_test").start()
    try {
      def ev(id: Long, et: String, offMs: Long) =
        EventStream.UserEvent(id, 1L, et, new java.sql.Timestamp(t0 + offMs))
      // clicks: sub-second burst (decade-5 gaps) then a 2-minute lull
      // (decade 8); views steady at 10 s (decade 7); the lull SPLITS
      // across micro-batches so the cross-batch state pairing is
      // what's tested
      val all = Seq(
        ev(1, "click", 0), ev(2, "click", 100), ev(3, "click", 450),
        ev(4, "view", 0), ev(5, "view", 10000),
        ev(6, "click", 120450), ev(7, "view", 20000), ev(8, "view", 30000))
      val (b1, b2) = all.splitAt(5)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("gaps_test")
      assert(streamed.count() === all.size - 2) // one headless row per type
      // sub-second gaps flag burst online; the lull and the 10 s cadence
      // do not
      val bursts = streamed.filter(col("burst"))
        .select("event_id").as[Long].collect().toSet
      assert(bursts === Set(2L, 3L))
      // aggregating the stream reproduces the batch histogram bit-for-bit
      val agg = streamed.groupBy("event_type", "decade")
        .agg(count(lit(1)).as("n_gaps"), min("gap_us").as("min_gap_us"),
          max("gap_us").as("max_gap_us"), sum("gap_us").as("sum_gap_us"))
      val batchIn = all.toDF()
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), lit(0.0).as("value"), lit("").as("props"))
      val batch = graft.ops.EventAnalytics.interarrival(batchIn)
      assert(agg.except(batch).isEmpty && batch.except(agg).isEmpty,
        "stream aggregation must equal the batch interarrival histogram")
    } finally q.stop()
  }

  test("vpin stream: volume-clock bars equal the batch op bit-exactly " +
    "on the ppm outputs, cumulative emissions converge last-writer") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.VpinStream
    def tr(id: Long, sym: String, offMs: Long, p: Double, v: Double) =
      VpinStream.Trade(id, sym, new java.sql.Timestamp(t0 + offMs), p, v)
    // up/down/flat moves (tick rule exercises +1/-1/carry) and uneven
    // volumes so bars cut mid-tape, differently per symbol
    val tape = Seq(
      tr(1, "BTC", 0, 10.00, 1.5), tr(2, "BTC", 1000, 10.05, 2.0),
      tr(3, "BTC", 2000, 10.05, 0.7), tr(4, "BTC", 3000, 9.95, 3.1),
      tr(5, "BTC", 4000, 10.10, 1.1), tr(6, "BTC", 5000, 10.10, 2.2),
      tr(7, "BTC", 6000, 10.20, 0.4), tr(8, "BTC", 7000, 10.15, 1.9),
      tr(9, "ETH", 500, 5.00, 4.0), tr(10, "ETH", 1500, 5.10, 0.6),
      tr(11, "ETH", 2500, 5.05, 2.5), tr(12, "ETH", 3500, 5.05, 1.0),
      tr(13, "ETH", 4500, 5.20, 3.3), tr(14, "ETH", 5500, 5.15, 0.9))
    val bars = 3
    val batchIn = tape.toDF().withColumnRenamed("ts", "timestamp")
    val batch = graft.ops.TradeOps.vpin(batchIn, bars)
      .select("symbol", "bar", "n_ticks", "vol_micro", "imb_ppm")
    // the batch-derived per-symbol volume clocks, fed to the twin the
    // way production feeds yesterday's tape sizing
    val sizes = batchIn
      .withColumn("vm", expr("CAST(round(volume * 1000000) AS BIGINT)"))
      .groupBy("symbol").agg(expr(s"sum(vm) div $bars + 1").as("bs"))
      .as[(String, Long)].collect().toMap
    val input = MemoryStream[VpinStream.Trade](spark)
    val q = VpinStream.barStream(spark, input.toDS(), sizes,
      default = sizes.values.max).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("vpin_test").start()
    try {
      // three micro-batches so bars straddle batch boundaries and the
      // in-progress snapshots get overwritten by later fills
      val (b1, rest) = tape.splitAt(5)
      val (b2, b3) = rest.splitAt(5)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // last-writer per (symbol, bar): n_ticks only grows for a key,
      // so max-n_ticks IS the latest snapshot
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol", "bar").orderBy(col("n_ticks").desc)
      val streamed = spark.table("vpin_test")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
        "converged volume bars must equal the batch vpin table")
      // every ppm is bit-exact against the batch integer algebra
      assert(streamed.join(batch, Seq("symbol", "bar"))
        .count() === batch.count())
    } finally q.stop()
  }

  test("depth stream: converged level ladder equals the batch " +
    "depthLadder bit-exactly once the batch anchor is applied") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.DepthStream
    def tr(id: Long, sym: String, offMs: Long, p: Double, v: Double) =
      DepthStream.Trade(id, sym, new java.sql.Timestamp(t0 + offMs), p, v)
    // revisited levels (10.05 twice on different signs, 5.05 twice),
    // a first-tick neutral per symbol, and a level far outside the
    // serving window (99.99) that the anchor must exclude
    val tape = Seq(
      tr(1, "BTC", 0, 10.00, 1.5), tr(2, "BTC", 1000, 10.05, 2.0),
      tr(3, "BTC", 2000, 10.05, 0.7), tr(4, "BTC", 3000, 9.95, 3.1),
      tr(5, "BTC", 4000, 99.99, 0.2), tr(6, "BTC", 5000, 10.10, 1.1),
      tr(7, "BTC", 6000, 10.05, 0.4), tr(8, "BTC", 7000, 10.15, 1.9),
      tr(9, "ETH", 500, 5.00, 4.0), tr(10, "ETH", 1500, 5.10, 0.6),
      tr(11, "ETH", 2500, 5.05, 2.5), tr(12, "ETH", 3500, 5.05, 1.0),
      tr(13, "ETH", 4500, 5.20, 3.3), tr(14, "ETH", 5500, 5.15, 0.9))
    val batchIn = tape.toDF().withColumnRenamed("ts", "timestamp")
    val batch = graft.ops.TradeOps.depthLadder(batchIn, windowCents = 500)
    val input = MemoryStream[DepthStream.Trade](spark)
    val q = DepthStream.depthStream(spark, input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("depth_test").start()
    try {
      // three micro-batches so levels are revisited ACROSS batches and
      // earlier cumulative snapshots get overwritten by later ones
      val (b1, rest) = tape.splitAt(5)
      val (b2, b3) = rest.splitAt(5)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol", "pc").orderBy(col("n_trades").desc)
      val converged = spark.table("depth_test")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      // serving-time anchor: the batch op's final last price ±500
      val lastPx = batchIn
        .withColumn("pcl", expr("CAST(round(price * 100) AS BIGINT)"))
        .groupBy(col("symbol").as("sym2"))
        .agg(max_by(col("pcl"), col("event_id")).as("last_pc"))
      val anchored = converged
        .join(lastPx, col("symbol") === col("sym2"))
        .filter(abs(col("pc") - col("last_pc")) <= 500)
        .select(col("symbol"), col("pc"),
          (col("pc") - col("last_pc")).as("rel_cents"), col("n_trades"),
          col("buy_vol_micro"), col("sell_vol_micro"),
          col("neutral_vol_micro"))
      assert(anchored.except(batch).isEmpty && batch.except(anchored).isEmpty,
        "anchored converged ladder must equal the batch depthLadder table")
      // the excluded far level must be in the store but not the view
      assert(converged.filter(col("pc") === 9999L).count() === 1)
      assert(batch.filter(col("pc") === 9999L).count() === 0)
    } finally q.stop()
  }

  test("kyle stream: running impact slope equals the batch op " +
    "bit-exactly, cumulative emissions replay as no-ops") {
    import spark.implicits._
    import graft.streaming.KyleStream
    def tr(id: Long, sym: String, offMs: Long, p: Double, v: Double) =
      KyleStream.Trade(id, sym, new java.sql.Timestamp(t0 + offMs), p, v)
    // up/down/flat moves (tick rule: +1/-1/carry; leading flat pair
    // exercises the sgn=0 cold carry) and uneven volumes
    val tape = Seq(
      tr(1, "BTC", 0, 10.00, 1.5), tr(2, "BTC", 1000, 10.00, 2.0),
      tr(3, "BTC", 2000, 10.05, 0.7), tr(4, "BTC", 3000, 9.95, 3.1),
      tr(5, "BTC", 4000, 10.10, 1.1), tr(6, "BTC", 5000, 10.10, 2.2),
      tr(7, "BTC", 6000, 10.20, 0.4), tr(8, "BTC", 7000, 10.15, 1.9),
      tr(9, "ETH", 500, 5.00, 4.0), tr(10, "ETH", 1500, 5.10, 0.6),
      tr(11, "ETH", 2500, 5.05, 2.5), tr(12, "ETH", 3500, 5.05, 1.0),
      tr(13, "ETH", 4500, 5.20, 3.3), tr(14, "ETH", 5500, 5.15, 0.9),
      // single-trade symbol: batch emits no regression row, nor must we
      tr(15, "DOGE", 100, 0.10, 50.0))
    val batchIn = tape.toDF().withColumnRenamed("ts", "timestamp")
    val batch = graft.ops.TradeOps.kyleLambda(batchIn)
      .select("symbol", "n_ticks", "lambda_cents_per_unit")
    val input = MemoryStream[KyleStream.Trade](spark)
    val q = KyleStream.lambdaStream(spark, input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("kyle_test").start()
    try {
      // three micro-batches so the regression accumulates across
      // batch boundaries and earlier snapshots get superseded
      val (b1, rest) = tape.splitAt(5)
      val (b2, b3) = rest.splitAt(5)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // n_ticks only grows per symbol, so max-n_ticks IS the latest
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy(col("n_ticks").desc)
      val streamed = spark.table("kyle_test")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
        "converged slope snapshots must equal the batch kyleLambda table")
      // replay no-op: merging the same cumulative snapshot twice through
      // the idempotent upsert store leaves the table unchanged
      val store = tmpDir("kyle-upsert")
      val dataCols = streamed.columns.map(col).toSeq
      Upsert.merge(streamed, 0L, store, Seq("symbol"))
      val once = Upsert.read(spark, store).get
        .select(dataCols: _*).collect().toSet
      Upsert.merge(streamed, 1L, store, Seq("symbol"))
      val twice = Upsert.read(spark, store).get
        .select(dataCols: _*).collect().toSet
      assert(once === twice, "replaying a cumulative snapshot must be a no-op")
    } finally q.stop()
  }

  test("drawdown stream: running peak-to-trough equals the batch op " +
    "bit-exactly, cumulative emissions replay as no-ops") {
    import spark.implicits._
    import graft.streaming.DrawdownStream
    def tr(id: Long, sym: String, offMs: Long, p: Double, v: Double) =
      DrawdownStream.Trade(id, sym, new java.sql.Timestamp(t0 + offMs), p, v)
    // BTC: new high then deep trough then partial recovery (the dd
    // max lands mid-tape); ETH: monotone rise (zero drawdown, frac 0);
    // DOGE: single trade (n=1, dd=0)
    val tape = Seq(
      tr(1, "BTC", 0, 10.00, 1.0), tr(2, "BTC", 1000, 10.50, 1.0),
      tr(3, "BTC", 2000, 9.40, 1.0), tr(4, "BTC", 3000, 9.90, 1.0),
      tr(5, "BTC", 4000, 10.40, 1.0), tr(6, "BTC", 5000, 10.10, 1.0),
      tr(7, "ETH", 500, 5.00, 1.0), tr(8, "ETH", 1500, 5.10, 1.0),
      tr(9, "ETH", 2500, 5.20, 1.0),
      tr(10, "DOGE", 100, 0.10, 1.0))
    val batchIn = tape.toDF().withColumnRenamed("ts", "timestamp")
    val batch = graft.ops.TradeOps.maxDrawdown(batchIn)
      .select("symbol", "n_ticks", "max_dd_cents", "max_dd_frac")
    val input = MemoryStream[DrawdownStream.Trade](spark)
    val q = DrawdownStream.drawdownStream(spark, input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("dd_test").start()
    try {
      // three micro-batches so the peak carries across batch
      // boundaries and earlier snapshots get superseded
      val (b1, rest) = tape.splitAt(3)
      val (b2, b3) = rest.splitAt(4)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy(col("n_ticks").desc)
      val streamed = spark.table("dd_test")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
        "converged drawdown snapshots must equal the batch maxDrawdown table")
      // replay no-op through the idempotent upsert store
      val store = tmpDir("dd-upsert")
      val dataCols = streamed.columns.map(col).toSeq
      Upsert.merge(streamed, 0L, store, Seq("symbol"))
      val once = Upsert.read(spark, store).get
        .select(dataCols: _*).collect().toSet
      Upsert.merge(streamed, 1L, store, Seq("symbol"))
      val twice = Upsert.read(spark, store).get
        .select(dataCols: _*).collect().toSet
      assert(once === twice, "replaying a cumulative snapshot must be a no-op")
    } finally q.stop()
  }

  test("resample stream: converged dense grid equals the batch " +
    "interpolateHourly bit-exactly, including cross-batch revisions of " +
    "an open bucket's provisional gap values") {
    import spark.implicits._
    import graft.streaming.ResampleStream
    val H = 3600000L
    def tr(id: Long, sym: String, offMs: Long, p: Double) =
      ResampleStream.Trade(id, sym, new java.sql.Timestamp(t0 + offMs), p, 1.0)
    // BTC: h0 (two trades — last-by-event_id is the representative),
    // then a 2-hour gap to h3 whose value CHANGES across micro-batches
    // (13 → 16), then h5. ETH: adjacent h0/h1 (no gap) plus h3.
    val tape = Seq(
      tr(1, "BTC", 0, 10.0), tr(2, "BTC", 60000, 11.0),
      tr(3, "ETH", 1000, 5.0), tr(4, "ETH", H + 1000, 6.0),
      tr(5, "BTC", 3 * H, 13.0), tr(6, "BTC", 3 * H + 120000, 16.0),
      tr(7, "ETH", 3 * H + 500, 9.0), tr(8, "BTC", 5 * H + 1000, 20.0))
    val batchIn = tape.toDF().withColumnRenamed("ts", "timestamp")
    val batch = graft.ops.Resample.interpolateHourly(batchIn)
    val input = MemoryStream[ResampleStream.Trade](spark)
    val q = ResampleStream.resampleStream(spark, input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("resample_test").start()
    try {
      // batch split puts trades 5 and 6 (same open bucket, different
      // price) in DIFFERENT micro-batches: the h1/h2 gap rows are first
      // emitted provisionally interpolated toward 13, then re-emitted
      // toward 16 — the converged view must keep only the revision
      val (b1, rest) = tape.splitAt(5)
      val (b2, b3) = rest.splitAt(2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol", "bucket").orderBy(col("ver").desc)
      val converged = spark.table("resample_test")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("symbol", "bucket", "price_filled", "n_trades_ff")
      assert(converged.except(batch).isEmpty && batch.except(converged).isEmpty,
        "converged streamed grid must equal the batch interpolateHourly " +
          "table bit-exactly")
      // the provisional h1 gap row (toward 13) must have been emitted
      // before the revision (toward 16) — both generations in the store
      val h1 = spark.table("resample_test")
        .filter(col("symbol") === "BTC" &&
          col("bucket") === new java.sql.Timestamp(Math.floorDiv(t0, H) * H + H))
        .select("price_filled").as[Double].collect().toSet
      assert(h1.size === 2, s"expected provisional + revised h1 values: $h1")
    } finally q.stop()
  }
}
