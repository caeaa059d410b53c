package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

class SessionsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  // two users; u1 has a 35-min gap (2 sessions), u2 one session
  private val events = Seq(
    (1L, ts(0), "click", 1.50),
    (1L, ts(5), "click", 2.25),
    (1L, ts(41), "view", 1.00),
    (2L, ts(12), "click", 4.00),
    (2L, ts(14), "view", 0.50))
    .toDF("user_id", "ts", "event_type", "value")

  test("windowedCounts: 10-minute tumbling windows, epoch-second starts") {
    val out = Sessions.windowedCounts(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val base = ts(0).getTime / 1000
    assert(out.contains((base, "click", 2L, 3.75)))
    assert(out.contains((base + 600, "click", 1L, 4.00)))
    assert(out.contains((base + 2400, "view", 1L, 1.00)))
  }

  test("windowedDistinct: distinct users per window, expand-aggregate plan") {
    val out = Sessions.windowedDistinct(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = ts(0).getTime / 1000
    // window 0: u1 twice -> 1 distinct / 2 events; window 1: u2 twice
    assert(out.toSeq === Seq((base, 1L, 2L), (base + 600, 1L, 2L), (base + 2400, 1L, 1L)))
    val plan = Sessions.windowedDistinct(events).queryExecution.executedPlan.toString
    assert(plan.contains("Expand") || plan.contains("distinct"),
      s"expected a two-phase distinct aggregate:\n$plan")
  }

  test("slidingCounts: each event lands in exactly two 10/5-minute windows") {
    val n = Sessions.slidingCounts(events).collect().map(_.getLong(2)).sum
    assert(n === events.count() * 2)
  }

  test("sessionize: 30-minute gap splits sessions") {
    val out = Sessions.sessionize(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 3L), (2L, 1L, 2L)))
  }

  test("streamingDedup drops replayed event ids across micro-batches") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val withDups = Seq(
      (100L, ts(0), "click", 1.0),
      (101L, ts(1), "view", 2.0),
      (100L, ts(2), "click", 1.0)) // replay of event 100
      .toDF("event_id", "ts", "event_type", "value")
    withDups.write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = Sessions.streamingDedup(
      spark.readStream.schema(schema).parquet(s"$dir/in"))
    val q = stream.writeStream.format("memory").queryName("dd")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.sql("SELECT event_id FROM dd").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(100L, 101L))
  }

  test("quantileMonitor: streamed estimates == one-shot batch sketch, exactly") {
    import graft.expressions.{DDSketch, DDSketchAggregator}
    val dir = Files.createTempDirectory("graft-qmon").toString
    // two micro-batch files; commutative merges must make the split invisible
    val b1 = (1 to 300).map(i => ("a", ts(0), "api", math.exp(i % 50 / 10.0)))
    val b2 = (1 to 200).map(i => ("a", ts(1), "api", math.exp(i % 70 / 10.0)))
    b1.toDF("u", "ts", "event_type", "value").write.parquet(s"$dir/in/f1")
    b2.toDF("u", "ts", "event_type", "value").write.parquet(s"$dir/in/f2")
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val stream = Sessions.quantileMonitor(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*"))
    val q = stream.toDF().writeStream.format("memory").queryName("qmon")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // the LAST update (largest n) is the final cumulative estimate
    val fin = spark.sql("SELECT n, p50, p99 FROM qmon ORDER BY n DESC LIMIT 1")
      .head()
    val agg = new DDSketchAggregator[Double](Double.box, 0.01)
    val whole = (b1 ++ b2).map(_._4).foldLeft(agg.zero)(agg.reduce)
    assert(fin.getLong(0) === 500L)
    assert(fin.getDouble(1) === DDSketch.quantile(whole, 0.5, 0.01))
    assert(fin.getDouble(2) === DDSketch.quantile(whole, 0.99, 0.01))
    // batch-mode single pass gives the same final row
    val batch = Sessions.quantileMonitor(
      (b1 ++ b2).toDF("u", "ts", "event_type", "value")).collect()
    assert(batch.length === 1 && batch.head.n === 500L)
    assert(batch.head.p99 === fin.getDouble(2))
    // the certificate form walks the SAME sketch: its (sign, bucket)
    // cells must render to exactly the float estimates above, and the
    // micro-batch split must be invisible to it too
    val cert = Sessions.quantileMonitorCert(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*"))
    val qc = cert.toDF().writeStream.format("memory").queryName("qcert")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    qc.awaitTermination(60000)
    val cfin = spark.sql(
      "SELECT rk50, sign50, bucket50, rk99, sign99, bucket99 FROM qcert " +
        "ORDER BY n DESC LIMIT 1").head()
    assert((cfin.getLong(0), cfin.getLong(3)) ===
      ((0.5 * 499).toLong, (0.99 * 499).toLong))
    assert((cfin.getLong(1).toInt, cfin.getLong(2).toInt) ===
      DDSketch.quantileBucket(whole, 0.5))
    assert((cfin.getLong(4).toInt, cfin.getLong(5).toInt) ===
      DDSketch.quantileBucket(whole, 0.99))
  }

  test("heavyHittersMonitor: the MG guarantee survives batch splits") {
    val dir = Files.createTempDirectory("graft-hhmon").toString
    // one hot user (40% of all events) among 50 cold ones, split so
    // the hot mass straddles the batch boundary; capacity 8 ->
    // guarantee threshold n/9 ~ 11% << 40%
    val hot = (1 to 40).map(i => (999L, ts(i % 50), "api", 1.0))
    val cold = (1 to 60).map(i => ((i % 50).toLong, ts(i % 50), "api", 1.0))
    val (b1, b2) = (hot.take(20) ++ cold.take(30), hot.drop(20) ++ cold.drop(30))
    b1.toDF("user_id", "ts", "event_type", "value").write.parquet(s"$dir/in/f1")
    b2.toDF("user_id", "ts", "event_type", "value").write.parquet(s"$dir/in/f2")
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val stream = Sessions.heavyHittersMonitor(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*"), capacity = 8)
    val q = stream.toDF("event_type", "n", "counts").writeStream
      .format("memory").queryName("hhmon")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val fin = spark.sql("SELECT n, counts FROM hhmon ORDER BY n DESC LIMIT 1").head()
    assert(fin.getLong(0) === 100L)
    val counts = fin.getMap[String, Long](1)
    assert(counts.size <= 8) // bounded state
    // the guarantee: freq 40/100 > 100/9 -> the hot user MUST survive
    assert(counts.contains("999"), s"hot user lost from $counts")
    // batch mode single pass honors the same guarantee
    val batch = Sessions.heavyHittersMonitor(
      (b1 ++ b2).toDF("user_id", "ts", "event_type", "value"), capacity = 8)
      .collect().head
    assert(batch._2 === 100L && batch._3.contains("999"))
  }

  test("distinctMonitor: streamed estimate == batch twin; exact below k") {
    val dir = Files.createTempDirectory("graft-dmon").toString
    // 100 users split across two batch files with overlap; k = 16
    // saturates (est within ~1/sqrt(16) of truth), k = 256 stays exact
    val b1 = (1 to 60).map(u => (u.toLong, ts(0), "api", 1.0))
    val b2 = (30 to 100).map(u => (u.toLong, ts(1), "api", 1.0))
    b1.toDF("user_id", "ts", "event_type", "value").write.parquet(s"$dir/in/f1")
    b2.toDF("user_id", "ts", "event_type", "value").write.parquet(s"$dir/in/f2")
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val stream = Sessions.distinctMonitor(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*"), k = 16)
    val q = stream.toDF().writeStream.format("memory").queryName("dmon")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val all = (b1 ++ b2).toDF("user_id", "ts", "event_type", "value")
    val batch = Sessions.distinctMonitor(all, k = 16).collect().head
    // the last streamed update (the cumulative sketch) == one-shot batch
    val fin = spark.sql(
      "SELECT n_kept, distinct_est FROM dmon ORDER BY distinct_est DESC LIMIT 1").head()
    assert(fin.getLong(0) === batch.n_kept)
    assert(fin.getDouble(1) === batch.distinct_est)
    // saturated estimate lands near the true 100
    assert(batch.distinct_est > 60 && batch.distinct_est < 160)
    // below k the count is EXACT
    val exact = Sessions.distinctMonitor(all, k = 256).collect().head
    assert(exact.n_kept === 100L && exact.distinct_est === 100.0)
  }

  test("statefulUserTotals in batch mode: one pass, totals per user") {
    val out = Sessions.statefulUserTotals(events).collect().sortBy(_.user_id)
    assert(out.map(u => (u.user_id, u.n_events)).toSeq === Seq((1L, 3L), (2L, 2L)))
    assert(math.abs(out(0).sum_value - 4.75) < 1e-9)
  }

  test("stateful streaming is backend-portable: RocksDB state store == default") {
    // production streaming runs RocksDB-backed state (bounded executor
    // heap, changelog checkpointing); this drives the SAME stateful
    // query through both providers and proves identical results —
    // the config swap a real deployment makes must not change answers
    val dir = Files.createTempDirectory("graft-rocksdb").toString
    events.write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def run(tag: String): Seq[(Long, Long, Double)] = {
      val stream = Sessions.statefulUserTotals(
        spark.readStream.schema(schema).parquet(s"$dir/in"))
      val q = stream.toDF().writeStream.format("memory").queryName(s"rdb_$tag")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.sql(s"SELECT user_id, n_events, sum_value FROM rdb_$tag")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    }
    val default = run("hdfs")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = run("rocks")
      assert(rocks === default, "RocksDB state store changed streaming results")
      assert(rocks.map(u => (u._1, u._2)) === Seq((1L, 3L), (2L, 2L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("statefulUserTotals carries state across streaming micro-batches") {
    val dir = Files.createTempDirectory("graft-state").toString
    events.where($"user_id" === 1L).limit(2).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = Sessions.statefulUserTotals(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(s"$dir/in"))
    val q = stream.toDF().writeStream.format("memory").queryName("st")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // state accumulates: the LAST update for user 1 must equal the total
    val updates = spark.sql("SELECT n_events FROM st").collect().map(_.getLong(0))
    assert(updates.max === 2L)
  }

  test("statefulUserTotalsWithTimeout expires idle state; later events restart at zero") {
    val dir = Files.createTempDirectory("graft-timeout").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, Timestamp, String, Double)]): Unit =
      rows.toDF("user_id", "ts", "event_type", "value")
        .coalesce(1).write.parquet(s"$dir/in/$name")
    // batch 1: user 1 accumulates 2 events (timeout armed, 1 ms);
    // batch 2: only user 2 arrives -> well over 1 ms of processing
    //   time has passed for idle user 1 -> its state times out: one
    //   flush row is emitted and the state removed;
    // batch 3: user 1 reappears -> totals restart from zero.
    write("f1", Seq((1L, ts(0), "click", 1.0), (1L, ts(1), "click", 2.0)))
    write("f2", Seq((2L, ts(2), "view", 5.0)))
    write("f3", Seq((1L, ts(3), "click", 4.0)))
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val stream = Sessions.statefulUserTotalsWithTimeout(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in/*"),
      timeout = "1 millisecond")
    val q = stream.toDF().writeStream.format("memory").queryName("stt")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val u1 = spark.sql("SELECT n_events, sum_value FROM stt WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // batch-1 update (2, 3.0), expiry flush (2, 3.0), restarted (1, 4.0)
    assert(u1.count(_ == (2L, 3.0)) === 2,
      s"expected the accumulated update AND the expiry flush; got ${u1.toSeq}")
    assert(u1.contains((1L, 4.0)),
      s"state must restart from zero after expiry; got ${u1.toSeq}")
  }

  test("watermark drops late events from already-closed windows (append mode)") {
    val dir = Files.createTempDirectory("graft-late").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, Timestamp, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.parquet(s"$dir/in/$name")
    def run(): Long = {
      val schema = spark.read.parquet(s"$dir/in/*").schema
      val stream = Sessions.streamingWindowedCounts(spark,
        s"$dir/in/*", schema, width = "10 minutes", watermark = "10 minutes")
      // parquet sink: supports checkpoint recovery (memory sink doesn't),
      // so the watermark survives the restart between the two runs
      val q = stream.writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      // operational observability: the drop is COUNTED, not silent —
      // the metric an SLO monitor alerts on
      q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
    }
    // run 1: events at 10:00:30 and 10:30 -> watermark lands at 10:20,
    // closing and emitting window [10:00, 10:10) with ONE event
    write("b1", Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:30"), "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), "click", 1.0)))
    run()
    // run 2 (restart, same checkpoint): a LATE event for the already
    // closed 10:00 window arrives -> the watermark must drop it
    write("b2", Seq((3L, Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0)))
    val droppedRun2 = run()
    assert(droppedRun2 === 1L,
      s"the late row must surface in numRowsDroppedByWatermark, got $droppedRun2")
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    val emitted = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(emitted.count(_._1 == base) === 1,
      s"closed window must be emitted exactly once; got ${emitted.toSeq}")
    assert(emitted.toMap.get(base).contains(1L),
      s"closed window must hold exactly the on-time event; got ${emitted.toSeq}")
  }

  test("streamToParquet lands micro-batches in the lake and is restart-safe") {
    val dir = Files.createTempDirectory("graft-sink").toString
    events.write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def run(): Unit = {
      val q = Sessions.streamToParquet(
        spark.readStream.schema(schema).parquet(s"$dir/in"),
        s"$dir/out", s"$dir/ckpt")
      q.awaitTermination(60000)
    }
    run()
    assert(spark.read.parquet(s"$dir/out").count() === events.count())
    run() // restart with same checkpoint: no new data -> no duplicates
    assert(spark.read.parquet(s"$dir/out").count() === events.count())
  }

  test("document-frequency stats maintained per micro-batch equal the direct recompute") {
    // the C38 contract in its streaming home: each batch contributes
    // its dfShard, the persisted table folds via dfMerge — corpus
    // stats stay current under ingest with NO text rescan (the exact
    // analog of the bloom/sketch maintenance the ingest loop does)
    import graft.operators.CorpusStats
    val dir = Files.createTempDirectory("graft-dfstream").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/$name")
    write("f1", Seq((1L, "a b b c"), (2L, "b c")))
    write("f2", Seq((3L, "c d"), (4L, "a")))
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val dfPath = s"$dir/df"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val shard = CorpusStats.dfShard(batch)
        val merged =
          if (!new java.io.File(dfPath).exists()) CorpusStats.dfMerge(shard)
          else CorpusStats.dfMerge(shard, batch.sparkSession.read.parquet(dfPath))
        graft.sources.Lake.overwriteSelf(merged, dfPath)
        ()
      }.start()
    q.awaitTermination(60000)
    val maintained = spark.read.parquet(dfPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = CorpusStats.dfMerge(
      CorpusStats.dfShard(spark.read.parquet(s"$dir/in/*")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(maintained === direct)
    assert(direct === Map("a" -> 2L, "b" -> 2L, "c" -> 3L, "d" -> 1L))
  }

  test("sessionizeBatch is the exact replay twin of streaming session_window") {
    import org.apache.spark.sql.functions._
    // boundary case on purpose: u3's second event lands EXACTLY at the
    // 30-min gap — session_window MERGES sessions that touch (measured
    // here, not assumed from the [first, last+gap) window shape), so
    // it stays ONE session and the batch op's strict > must agree
    val ev = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(5)), (3L, 1L, ts(41)),
      (4L, 2L, ts(12)), (5L, 2L, ts(14)),
      (6L, 3L, ts(0)), (7L, 3L, ts(30)))
      .toDF("event_id", "user_id", "ts")
    val batch = graft.operators.Windows.sessionizeBatch(ev, gapUs = 1800000000L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(5))).toSet
    val stream = graft.functions.TimeCol.instant(ev)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0),
        r.getStruct(1).getTimestamp(0).getTime * 1000, r.getLong(2))).toSet
    assert(batch === stream, s"batch $batch vs streaming $stream")
    assert(batch.size === 4) // u1: 2 sessions, u2: 1, u3: 1 (exact gap merges)
  }

  test("histogram shards maintained per micro-batch equal the from-scratch histogram") {
    // the C50 contract in its streaming home: each batch contributes a
    // fixed-bin shard, the persisted histogram folds via histogramMerge
    // — the distribution profile stays current under ingest with no
    // fact rescan (the dfShard pattern for numeric profiling)
    import graft.operators.Profile
    val dir = Files.createTempDirectory("graft-histstream").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "v").coalesce(1).write.parquet(s"$dir/in/$name")
    write("f1", Seq((1L, 5.0), (2L, 15.0), (3L, 95.0)))
    write("f2", Seq((4L, 5.5), (5L, 250.0), (6L, -3.0))) // clamp both edges
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val histPath = s"$dir/hist"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val shard = Profile.histogramShard(batch, "v", lo = 0.0, hi = 100.0, nBins = 10)
        val shards =
          if (!new java.io.File(histPath).exists()) Seq(shard)
          else Seq(shard, batch.sparkSession.read.parquet(histPath))
        graft.sources.Lake.overwriteSelf(Profile.histogramMerge(shards, 10), histPath)
        ()
      }.start()
    q.awaitTermination(60000)
    val maintained = spark.read.parquet(histPath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = Profile.histogramMerge(
      Seq(Profile.histogramShard(spark.read.parquet(s"$dir/in/*"), "v", 0.0, 100.0, 10)), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(maintained === direct)
    assert(maintained(0L) === 3L && maintained(1L) === 1L && maintained(9L) === 2L)
  }

  test("SCD2 table maintained per micro-batch via scd2Merge equals the from-scratch build") {
    // C61 in its streaming home: each append-only micro-batch folds
    // into the persisted dimension through scd2Merge — history is
    // never recomputed, and the result tracks the full-log build
    import org.apache.spark.sql.functions.col
    import graft.operators.Windows
    val dir = Files.createTempDirectory("graft-scd2stream").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, Long, String, Timestamp)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "ts")
        .coalesce(1).write.parquet(s"$dir/in/$name")
    // file order IS batch order under maxFilesPerTrigger=1 +
    // AvailableNow (lexicographic listing) — name them so
    write("b1", Seq((1L, 1L, "a", ts(0)), (2L, 2L, "x", ts(1))))
    write("b2", Seq((3L, 1L, "a", ts(10)), (4L, 1L, "b", ts(12)))) // continue + change
    write("b3", Seq((5L, 3L, "z", ts(20)), (6L, 2L, "y", ts(21)))) // new key + change
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val dimPath = s"$dir/dim"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged =
          if (!new java.io.File(dimPath).exists())
            Windows.scd2(batch, "user_id", "event_type", "event_id")
          else Windows.scd2Merge(batch.sparkSession.read.parquet(dimPath),
            batch, "user_id", "event_type", "event_id")
        graft.sources.Lake.overwriteSelf(merged, dimPath)
        ()
      }.start()
    q.awaitTermination(60000)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("user_id"), col("valid_from_us")).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSeq
    val maintained = canon(spark.read.parquet(dimPath))
    val scratch = canon(Windows.scd2(
      spark.read.parquet(s"$dir/in/*"), "user_id", "event_type", "event_id"))
    assert(maintained === scratch)
    assert(maintained.count(_._5) === 3) // one current row per user
  }

  test("streamUpsert merges each micro-batch into the keyed table, latest seq wins") {
    val dir = Files.createTempDirectory("graft-cdc").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("k", "seq", "v").coalesce(1).write.parquet(s"$dir/in/$name")
    // batch 1: k=1,2 created; k=1 updated within the same batch (seq 2)
    write("f1", Seq((1L, 1L, "a0"), (2L, 1L, "b0"), (1L, 2L, "a1")))
    // batch 2: k=2 updated, k=3 created; k=1 untouched -> must survive
    write("f2", Seq((2L, 2L, "b1"), (3L, 1L, "c0")))
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    def run(): Unit = {
      val q = Sessions.streamUpsert(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$dir/in/*"),
        s"$dir/table", s"$dir/ckpt", keys = Seq("k"), seqCol = "seq")
      q.awaitTermination(60000)
    }
    run()
    val state = spark.read.parquet(s"$dir/table")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(state === Map(1L -> (2L, "a1"), 2L -> (2L, "b1"), 3L -> (1L, "c0")),
      s"got $state")
    // restart on the same checkpoint: no new files -> table unchanged
    run()
    val again = spark.read.parquet(s"$dir/table")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again === state)
    // late replay of an OLD change (seq 1 for k=1) must not regress the
    // row — and the batch must rewrite ONLY k=1's bucket: every other
    // bucket directory's files stay byte-identical (bounded rewrite)
    def snapshot(): Map[String, Map[String, Array[Byte]]] =
      new java.io.File(s"$dir/table").listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.isFile)
          .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
      }.toMap
    val beforeReplay = snapshot()
    write("f3", Seq((1L, 1L, "a0-replay")))
    run()
    val healed = spark.read.parquet(s"$dir/table")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(healed(1L) === ((2L, "a1")),
      s"an old change replayed late must not regress the newer row: $healed")
    val afterReplay = snapshot()
    val k1Bucket = Seq(Tuple1(1L)).toDF("k")
      .select(graft.sources.Lake.keyBucket(Seq("k"), 64)).head().getInt(0)
    val untouched = beforeReplay.keySet - s"${graft.sources.Lake.BucketCol}=$k1Bucket"
    assert(untouched.nonEmpty)
    untouched.foreach { bucket =>
      assert(afterReplay(bucket).keySet === beforeReplay(bucket).keySet,
        s"$bucket file set changed by an unrelated batch")
      beforeReplay(bucket).foreach { case (f, bytes) =>
        assert(java.util.Arrays.equals(afterReplay(bucket)(f), bytes),
          s"$bucket/$f rewritten by a batch that didn't touch its keys")
      }
    }
    // EQUAL-seq conflict in one batch: the payload tiebreak picks a
    // deterministic (lexicographically smallest) winner, and a re-run
    // over the same input keeps it — the seq alone is not a total order
    write("f4", Seq((4L, 1L, "z-later"), (4L, 1L, "a-first")))
    run()
    val conflicted = spark.read.parquet(s"$dir/table")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(conflicted(4L) === ((1L, "a-first")), s"got ${conflicted(4L)}")
    run()
    val stable = spark.read.parquet(s"$dir/table")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(stable(4L) === ((1L, "a-first")))
  }

  test("streamIngestDedup: cross-batch dedup via the persisted index + bloom") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/$name")
    // batch 1: two distinct docs + an intra-batch duplicate of doc 1
    write("f1", Seq((1L, "alpha document"), (2L, "beta document"), (3L, "alpha document")))
    // batch 2: one new doc + a re-crawl of doc 2's content
    write("f2", Seq((10L, "gamma document"), (11L, "beta document")))
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    def run(ckpt: String, maxFiles: Int = 1): Unit = {
      val q = Sessions.streamIngestDedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", maxFiles.toString)
          .parquet(s"$dir/in/*"),
        s"$dir/corpus", s"$dir/index", s"$dir/bloom", ckpt)
      q.awaitTermination(60000)
    }
    run(s"$dir/ckpt")
    val corpus = spark.read.parquet(s"$dir/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus === Set(1L, 2L, 10L),
      s"intra-batch and cross-batch duplicates must not reach the corpus: $corpus")
    val index = spark.read.parquet(s"$dir/index")
    assert(index.count() === 3L, "one index row per ingested doc")
    // the sketch tracks the index: every ingested fingerprint probes true
    val bloom = spark.read.parquet(s"$dir/bloom").head().getAs[Array[Byte]]("bloom")
    val misses = index.where(!graft.expressions.GraftFunctions.bloomContains(
      org.apache.spark.sql.functions.lit(bloom),
      org.apache.spark.sql.functions.xxhash64($"fingerprint"))).count()
    assert(misses === 0L)
    // a second pipeline run over the SAME input (fresh checkpoint =
    // full replay) ingests nothing new: the index makes ingest
    // idempotent across restarts, not just within a checkpoint
    run(s"$dir/ckpt2")
    val corpus2 = spark.read.parquet(s"$dir/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus2 === corpus, s"replayed input must be fully deduped: $corpus2")
    // a fresh checkpoint with DIFFERENT batch boundaries (2 files per
    // trigger instead of 1, plus a new file): content-keyed ingest
    // partitions mean the renumbered batches can't overwrite older
    // partitions holding different documents — no row loss, no
    // re-admitted duplicates, and the new doc lands exactly once
    write("f3", Seq((20L, "delta document"), (21L, "alpha document")))
    run(s"$dir/ckpt3", maxFiles = 2)
    val corpus3 = spark.read.parquet(s"$dir/corpus")
    assert(corpus3.select("doc_id").as[Long].collect().toSet === corpus + 20L,
      "re-batched replay must lose nothing and admit only the new doc")
    val index3 = spark.read.parquet(s"$dir/index")
    assert(index3.count() === 4L)
    assert(index3.select("fingerprint").distinct().count() === 4L,
      "no duplicate content may enter the index under re-batching")
  }

  test("streamPqIndexAppend: bootstrap trains, later batches frozen-append, drift vs build stats") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val root = Files.createTempDirectory("graft-pq-stream").toString
    (0 until 3).foreach { b =>
      emb.where(org.apache.spark.sql.functions.pmod($"vec_id",
        org.apache.spark.sql.functions.lit(3)) === b).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/in/f$b")
      new java.io.File(s"$root/in/f$b").listFiles()
        .foreach(f => { f.setLastModified(1600000000000L + b * 60000L); () })
    }
    val schema = spark.read.parquet(s"$root/in/f0").schema
    val q = Sessions.streamPqIndexAppend(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root/in/*"),
      s"$root/idx", s"$root/ckpt", m = 4, k = 8, dim = 64)
    q.awaitTermination(120000)
    val (codes, cbs) = graft.operators.Clustering.pqReadIndex(spark, s"$root/idx")
    // every vector of every batch carries m codes
    assert(codes.count() === 4L * emb.count())
    // codebooks == a direct train on the bootstrap batch alone (frozen
    // through both appends), and the appended codes == frozen encodes
    val boot = emb.where($"vec_id" % 3 === 0)
    val (bootCodes, bootCbs) = graft.operators.Clustering.pqTrainEncode(
      boot, m = 4, k = 8, iters = 2, dim = 64)
    def cbKey(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getInt(0), r.getInt(1)),
        r.getSeq[Double](2).toSeq)).sortBy(_._1).toSeq
    assert(cbKey(cbs) === cbKey(bootCbs), "streaming bootstrap retrained the codebooks")
    val expect = bootCodes.unionByName(graft.operators.Clustering.pqEncodeFrozen(
      emb.where($"vec_id" % 3 =!= 0), bootCbs, m = 4, k = 8, dim = 64))
    def codeKey(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "subspace", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(codeKey(codes) === codeKey(expect),
      "streamed codes diverged from bootstrap-train + frozen-append")
    // the build-time stats artifact exists and drives the trigger: a
    // same-distribution batch stays under tolerance, a 3x-scaled one
    // trips it (the ClusteringSpec anchors through the PERSISTED path)
    val stats = graft.operators.Clustering.pqReadStats(spark, s"$root/idx")
    assert(stats.count() > 0)
    val same = graft.operators.Clustering.pqEncodeFrozen(
      emb.where($"vec_id" % 3 === 1), cbs, m = 4, k = 8, dim = 64)
    assert(!graft.operators.Clustering.pqRetrainNeeded(
      graft.operators.Clustering.pqDriftFromStats(stats, same)))
    val shifted = emb.where($"vec_id" % 3 === 1).withColumn("embedding",
      org.apache.spark.sql.functions.transform($"embedding",
        x => x * org.apache.spark.sql.functions.lit(3.0f)))
    val drifted = graft.operators.Clustering.pqEncodeFrozen(
      shifted, cbs, m = 4, k = 8, dim = 64)
    assert(graft.operators.Clustering.pqRetrainNeeded(
      graft.operators.Clustering.pqDriftFromStats(stats, drifted)),
      "the streaming loop's persisted stats must still anchor the trigger")
    // replay idempotence: a FRESH checkpoint re-delivers all three
    // batches (renumbered from 0); the content-digest applied markers
    // must turn every one into a skip — a re-appended batch would
    // DOUBLE its vectors' ADC partial sums
    val q2 = Sessions.streamPqIndexAppend(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root/in/*"),
      s"$root/idx", s"$root/ckpt2", m = 4, k = 8, dim = 64)
    q2.awaitTermination(120000)
    val (codesReplay, cbsReplay) = graft.operators.Clustering.pqReadIndex(
      spark, s"$root/idx")
    assert(codesReplay.count() === 4L * emb.count(),
      "fresh-checkpoint replay must not duplicate code rows")
    assert(cbKey(cbsReplay) === cbKey(cbs),
      "fresh-checkpoint replay must not retrain the codebooks")
  }

  test("streamIndexAppend: fresh-checkpoint replay of applied batches is a no-op") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val root = Files.createTempDirectory("graft-tl-stream-replay").toString
    (0 until 2).foreach { b =>
      emb.where(org.apache.spark.sql.functions.pmod($"vec_id",
        org.apache.spark.sql.functions.lit(2)) === b).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/in/f$b")
      new java.io.File(s"$root/in/f$b").listFiles()
        .foreach(f => { f.setLastModified(1600000000000L + b * 60000L); () })
    }
    val schema = spark.read.parquet(s"$root/in/f0").schema
    val table = "tl_replay_" + java.lang.Long.toHexString(System.nanoTime())
    def run(ckpt: String): Unit = {
      val q = Sessions.streamIndexAppend(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*"),
        table, s"$root/idx", ckpt)
      q.awaitTermination(120000)
    }
    run(s"$root/ckpt")
    val (idx, cbs) = graft.operators.Clustering.twoLevelOpenIndex(
      spark, table, s"$root/idx", 16)
    assert(idx.count() === emb.count())
    // fresh checkpoint = full re-delivery; the digest markers (incl.
    // the bootstrap batch's, which would otherwise replay down the
    // APPEND path once the index exists) must skip every batch
    run(s"$root/ckpt2")
    assert(spark.table(table).count() === emb.count(),
      "replayed batches re-inserted index rows")
    val cbs2 = graft.operators.Clustering.twoLevelOpenIndex(
      spark, table, s"$root/idx", 16)._2
    assert(cbs2.map { case (c, v) => (c, v.toSeq) }.toSeq ===
      cbs.map { case (c, v) => (c, v.toSeq) }.toSeq)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streamIngestDedup with sigPath also drops near-duplicate re-crawls") {
    val dir = Files.createTempDirectory("graft-ingest-near").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def para(tag: String) =
      s"the quick brown fox $tag jumps over the lazy dog while seventeen " +
        "sailors watch from the harbor wall and debate the merits of " +
        "distributed deduplication at considerable length"
    def write(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/$name")
    write("f1", Seq((1L, para("one")), (2L, para("two"))))
    // batch 2: a lightly-EDITED re-crawl of doc 1 (near-dup, not exact)
    // and one genuinely new doc
    write("f2", Seq((10L, para("one") + " appended"),
      (11L, "a completely unrelated piece of writing about gardening and soup")))
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val q = Sessions.streamIngestDedup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in/*"),
      s"$dir/corpus", s"$dir/index", s"$dir/bloom", s"$dir/ckpt",
      sigPath = s"$dir/sigs")
    q.awaitTermination(60000)
    val corpus = spark.read.parquet(s"$dir/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus === Set(1L, 2L, 11L),
      s"the edited re-crawl must be caught by the signature probe: $corpus")
    // the signature table holds exactly the ingested docs
    val sigs = spark.read.parquet(s"$dir/sigs")
    assert(sigs.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 11L))
  }

  test("ingest batch-size rule reproduces the measured runbook points") {
    // the two PLANS.md latency bounds at the measured terms
    // (fixed 3.5 s, 66 k rows/s): L=30 s and L=10 s
    assert(Sessions.ingestBatchRows(30.0) === 1749000L)
    assert(Sessions.ingestBatchRows(10.0) === 429000L)
    // efficiency floor: rows where marginal == fixed
    assert(Sessions.ingestEfficiencyFloorRows() === 231000L)
    // forward model at the measured ×1000 anchor: 1.67 M rows -> ~28.8 s
    // predicted vs 26.3 s measured (the fit's residual, not a bug)
    val w = Sessions.ingestBatchWallSec(1670000L)
    assert(w > 28.0 && w < 30.0, s"forward model drifted: $w")
    // knob derivation: 100 k-row ingest files under a 30 s bound -> 17
    // files/trigger; a sub-file budget degrades to 1, never 0
    assert(Sessions.ingestMaxFilesPerTrigger(30.0, 100000L) === 17)
    assert(Sessions.ingestMaxFilesPerTrigger(4.0, 100000L) === 1)
    // a target inside the fixed cost must fail loud, naming the term
    val e = intercept[IllegalArgumentException] {
      Sessions.ingestBatchRows(3.0)
    }
    assert(e.getMessage.contains("fixed per-batch cost"))
    // re-fit terms flow through: double the rate, double the budget
    assert(Sessions.ingestBatchRows(30.0, rowsPerSec = 132000.0) === 3498000L)
  }

  test("enrichWithDim joins a stream against a static dim per micro-batch") {
    val dir = Files.createTempDirectory("graft-enrich").toString
    events.write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = Sessions.enrichWithDim(
      spark.readStream.schema(schema).parquet(s"$dir/in"), dim, "user_id")
    val q = stream.writeStream.format("memory").queryName("enr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val tiers = spark.sql("SELECT DISTINCT user_id, tier FROM enr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tiers === Map(1L -> "gold", 2L -> "silver"))
    assert(spark.sql("SELECT count(*) FROM enr").head().getLong(0) === events.count())
  }

  test("streamCorrelate: watermarked stream-stream join equals its batch twin") {
    val dir = Files.createTempDirectory("graft-sscorr").toString
    val evs = Seq(
      (10L, ts(0), "click", 1.0), (11L, ts(4), "view", 1.0),   // pair (10,11)
      (12L, ts(20), "click", 1.0), (13L, ts(45), "view", 1.0), // 25 min apart: no pair
      (14L, ts(46), "click", 1.0), (15L, ts(50), "view", 1.0)) // pair (14,15)
      .map { case (id, t, ty, v) => (id, t, ty, v, 1L) }
      .toDF("event_id", "ts", "event_type", "value", "user_id")
    evs.write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def split(df: org.apache.spark.sql.DataFrame) =
      (df.where($"event_type" === "click"), df.where($"event_type" =!= "click"))
    val (bl, br) = split(evs)
    val batch = Sessions.streamCorrelate(bl, br).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(batch === Set((10L, 11L), (14L, 15L)))
    val (sl, sr) = split(spark.readStream.schema(schema).parquet(s"$dir/in"))
    val q = Sessions.streamCorrelate(sl, sr)
      .writeStream.format("memory").queryName("sscorr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT left_id, right_id FROM sscorr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("streamingWindowedCounts over a file stream matches the batch result") {
    val dir = Files.createTempDirectory("graft-stream").toString
    events.write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = Sessions.streamingWindowedCounts(spark, s"$dir/in", schema)
    val q = stream.writeStream.format("memory").queryName("wc")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT window_start, event_type, n_events FROM wc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = Sessions.windowedCounts(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  // ---- the composed arc: streaming maintenance ON a versioned root ----

  /** Three deterministic micro-batches for the versioned loops: b0
    * bootstrap, b1 same-distribution, b2 scaled 3x (must trip the
    * drift trigger — the measured ~9x anchor). */
  private def writeVersionedBatches(root: String) = {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    (0 until 3).foreach { b =>
      val part = emb.where(org.apache.spark.sql.functions.pmod($"vec_id",
        org.apache.spark.sql.functions.lit(3)) === b)
      val batch =
        if (b == 2) part.withColumn("embedding",
          org.apache.spark.sql.functions.transform($"embedding",
            x => (x.cast("double") * org.apache.spark.sql.functions.lit(3.0))
              .cast("float")))
        else part
      batch.coalesce(1).write.mode("overwrite").parquet(s"$root/in/f$b")
      new java.io.File(s"$root/in/f$b").listFiles()
        .foreach(f => { f.setLastModified(1600000000000L + b * 60000L); () })
    }
    (emb, spark.read.parquet(s"$root/in/f0").schema)
  }

  /** Recursive (path-relative name -> length) snapshot of a published
    * generation dir — the byte-identity witness for "v1 is never
    * touched". */
  private def dirSnapshot(dir: String): Map[String, Long] = {
    val base = java.nio.file.Paths.get(dir)
    scala.util.Using.resource(java.nio.file.Files.walk(base)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(p => base.relativize(p).toString -> java.nio.file.Files.size(p))
        .toMap
    }
  }

  test("streamIndexAppendVersioned: bootstrap publishes v1, signals carry the decisions, retrain executes against the loop's root") {
    val root0 = Files.createTempDirectory("graft-tl-stream-v").toString
    val (emb, schema) = writeVersionedBatches(root0)
    val root = s"$root0/idx"
    val pfx = "tlsv_" + java.lang.Long.toHexString(System.nanoTime())
    val q = Sessions.streamIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      pfx, root, s"$root0/ckpt")
    q.awaitTermination(120000)
    // the loop published generation 1 and appended both later batches
    assert(graft.sources.Lake.latestVersion(spark, root) === Some(1L))
    val v1 = graft.operators.Clustering.twoLevelOpenVersion(spark, pfx, root, 16)
    assert(v1.index.count() === emb.count(),
      "bootstrap + both appends must land in the serving generation")
    // signals are DATA reproducing exactly the decisions the loop made:
    // bootstrap (no drift), clean append (ratio ~1, no retrain),
    // drifted append (ratio over tolerance, retrain) — and the flag is
    // derivable from the persisted ratio by the rule itself
    val sig = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    assert(sig.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    assert(sig.map(_.getString(1)).toSeq === Seq("bootstrap", "append", "append"))
    assert(sig.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L),
      "all three batches were served by generation 1")
    assert(sig(0).isNullAt(4) && !sig(1).isNullAt(4) && !sig(2).isNullAt(4))
    assert(sig.map(_.getBoolean(5)).toSeq === Seq(false, false, true),
      "only the 3x-scaled batch may trip the retrain trigger")
    sig.filter(_.getString(1) == "append").foreach { r =>
      assert(r.getBoolean(5) ===
        (r.getDouble(4) > graft.operators.Clustering.TwoLevelDriftTolerance),
        "the persisted ratio must reproduce the persisted decision")
    }
    val batchCounts = (0 until 3).map(b => emb.where($"vec_id" % 3 === b).count())
    assert(sig.map(_.getLong(3)).toSeq === batchCounts,
      "n_rows must be the digest's own batch count")
    // the retrain the signal schedules is EXECUTABLE against this root:
    // v2 publishes from v1's own table while v1's files stay
    // byte-identical, and a pinned v1 open still answers probes
    val v1Files = dirSnapshot(v1.dir)
    val v2v = graft.operators.Clustering.twoLevelRetrain(spark, pfx, root,
      nBuckets = 16, k1 = 4, k2 = 4)
    assert(v2v === 2L)
    assert(dirSnapshot(v1.dir) === v1Files,
      "the retrain must never touch the serving generation's files")
    val pinned = graft.operators.Clustering.twoLevelOpenVersion(spark, pfx, root,
      16, version = 1L)
    val qv = graft.operators.Similarity.vectorOf(emb, 1L)
    assert(graft.operators.Clustering.twoLevelTopK(pinned.index, pinned.codebooks,
      qv, k = 5).count() === 5L, "a pinned v1 open must keep answering")
    // the loop FOLLOWS _latest: a fourth batch appends into v2, and the
    // signal row records the new serving generation
    val extra = emb.where($"vec_id" % 3 === 0).limit(50)
      .withColumn("vec_id", $"vec_id" + org.apache.spark.sql.functions.lit(100000L))
    extra.coalesce(1).write.mode("overwrite").parquet(s"$root0/in/f3")
    new java.io.File(s"$root0/in/f3").listFiles()
      .foreach(f => { f.setLastModified(1600000000000L + 3 * 60000L); () })
    val q2 = Sessions.streamIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      pfx, root, s"$root0/ckpt")
    q2.awaitTermination(120000)
    val sig2 = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    assert(sig2.length === 4, "replayed batches must be skips, the new one a row")
    assert(sig2(3).getString(1) === "append" && sig2(3).getLong(2) === 2L,
      "post-retrain appends must land in the new serving generation")
    val v2 = graft.operators.Clustering.twoLevelOpenVersion(spark, pfx, root, 16)
    assert(v2.index.count() === emb.count() + extra.count())
    spark.sql(s"DROP TABLE IF EXISTS ${pfx}_v1")
    spark.sql(s"DROP TABLE IF EXISTS ${pfx}_v2")
  }

  test("streamPqIndexAppendVersioned: v1 publishes and serves, drifted batch signals the executable pqRetrain") {
    val root0 = Files.createTempDirectory("graft-pq-stream-v").toString
    val (emb, schema) = writeVersionedBatches(root0)
    val root = s"$root0/idx"
    val q = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt")
    q.awaitTermination(120000)
    assert(graft.sources.Lake.latestVersion(spark, root) === Some(1L))
    val v1 = graft.operators.Clustering.pqOpenVersion(spark, root)
    assert(v1.codes.count() === 4L * emb.count(),
      "every vector of every batch carries m codes in the serving generation")
    val sig = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    assert(sig.map(_.getString(1)).toSeq === Seq("bootstrap", "append", "append"))
    assert(sig.map(_.getBoolean(5)).toSeq === Seq(false, false, true),
      "only the 3x-scaled batch may trip the PQ retrain trigger")
    // the scheduler poll reads the pending decision straight off the
    // signals table: the drifted batch's retrain is PENDING now...
    assert(Sessions.pendingMaintenance(spark, root)._1 === true,
      "the drifted batch's retrain must be pending before execution")
    // the executable retrain: PQ codes are lossy, so the corpus is the
    // caller's upstream (what the stream delivered); v1 untouched
    val v1Files = dirSnapshot(v1.dir)
    val corpus = spark.read.schema(schema).parquet(s"$root0/in/*")
    val v2v = graft.operators.Clustering.pqRetrain(spark, root, corpus,
      m = 4, k = 8, dim = 64)
    assert(v2v === 2L)
    // ...and the EXECUTED retrain clears it with no writeback: the
    // pending signal's version (1) now predates the serving generation
    // (2) — the version protocol is the acknowledgement
    assert(Sessions.pendingMaintenance(spark, root) === ((false, false)),
      "an executed retrain must clear the pending decision")
    assert(dirSnapshot(v1.dir) === v1Files,
      "the PQ retrain must never touch the serving generation's files")
    val v2 = graft.operators.Clustering.pqOpenVersion(spark, root)
    assert(v2.version === 2L)
    assert(graft.operators.Clustering.pqTopK(v2.codes, v2.codebooks,
      graft.operators.Similarity.vectorOf(emb, 1L), m = 4, k = 5).count() === 5L)
    // fresh-checkpoint replay: every batch already applied — no new
    // signals, no duplicated codes in the generation the loop serves
    val q2 = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt2")
    q2.awaitTermination(120000)
    assert(Sessions.readIndexSignals(spark, root).count() === 3L,
      "replayed batches must not re-signal")
    assert(graft.operators.Clustering.pqOpenVersion(spark, root, version = 1L)
      .codes.count() === 4L * emb.count(),
      "replayed batches must not re-insert codes")
    // the audit trail compacts without loss: one file, identical rows
    val sigBefore = Sessions.readIndexSignals(spark, root).collect()
      .map(_.toString).sorted.toSeq
    Sessions.compactIndexSignals(spark, root)
    assert(Sessions.readIndexSignals(spark, root).collect()
      .map(_.toString).sorted.toSeq === sigBefore,
      "signal compaction changed the audit trail")
    assert(new java.io.File(s"$root/_signals").listFiles()
      .count(_.getName.endsWith(".parquet")) === 1)
  }

  test("pruneAppliedMarkers: retained window still skips, watermark records the prune") {
    val root0 = Files.createTempDirectory("graft-prune-markers").toString
    val (emb, schema) = writeVersionedBatches(root0)
    val root = s"$root0/idx"
    val q = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt")
    q.awaitTermination(120000)
    val dir = new java.io.File(s"$root/_applied")
    assert(dir.listFiles().count(f => !f.getName.startsWith("_") && !f.getName.startsWith(".")) === 3)
    // markers share a coarse FS mtime; order the prune DETERMINISTICALLY
    // so the dropped marker is an APPEND batch's (a pruned BOOTSTRAP
    // marker would be healed by the generation's _bootstrap_digest, not
    // re-applied — a different, stronger behavior tested separately)
    val sigRows = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    val bootDigest = sigRows.find(_.getString(1) == "bootstrap").get.getString(7)
    val appendDigests = sigRows.filter(_.getString(1) == "append").map(_.getString(7))
    new java.io.File(dir, bootDigest).setLastModified(1700000002000L)
    new java.io.File(dir, appendDigests(1)).setLastModified(1700000001000L)
    new java.io.File(dir, appendDigests(0)).setLastModified(1700000000000L)
    val dropped = Sessions.pruneAppliedMarkers(spark, root, keep = 2)
    assert(dropped === 1)
    assert(!new java.io.File(dir, appendDigests(0)).exists(),
      "the strictly-oldest marker (an append batch's) must be the pruned one")
    assert(dir.listFiles().count(f => !f.getName.startsWith("_") && !f.getName.startsWith(".")) === 2)
    assert(new java.io.File(dir, "_watermark").exists(),
      "the prune must leave its watermark")
    // a replay restricted to the RETAINED window is still a pure skip
    val before = graft.operators.Clustering.pqOpenVersion(spark, root)
      .codes.count()
    val q2 = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt2")
    q2.awaitTermination(120000)
    val sigAfter = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    // the two retained batches skipped; the PRUNED batch re-applied —
    // the documented replay-window tradeoff, visible as one new append
    // signal rather than silent corruption
    assert(sigAfter.length === 4,
      s"expected exactly the pruned batch to re-apply, got ${sigAfter.length} signals")
    val after = graft.operators.Clustering.pqOpenVersion(spark, root)
      .codes.count()
    assert(after - before === 4L * sigAfter(3).getLong(3),
      "the re-applied batch must re-append exactly its own m codes/vector")
    // idempotent prune: nothing further to drop at keep=2... the
    // re-applied batch added one marker back (3 again), prune once more
    dir.listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith(".")).zipWithIndex
      .foreach { case (f, i) => f.setLastModified(1700000100000L + i * 1000L); () }
    assert(Sessions.pruneAppliedMarkers(spark, root, keep = 3) === 0)
    // mtime TIES never prune: under coarse-granularity timestamps a
    // position-based drop could delete the newest batch's marker —
    // with every marker tied at one mtime, keep=1 must drop nothing
    dir.listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach { f => f.setLastModified(1700000200000L); () }
    assert(Sessions.pruneAppliedMarkers(spark, root, keep = 1) === 0,
      "tied mtimes must never be pruned (keep is a lower bound)")
    // the watermark's pruned total is CUMULATIVE across prunes (each
    // overwrite folds the previous total in), not just the last prune's
    def watermark(): String = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_watermark").toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(watermark().contains("pruned_total=1"),
      s"first prune must record total 1: ${watermark()}")
    dir.listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith(".")).zipWithIndex
      .foreach { case (f, i) => f.setLastModified(1700000300000L + i * 1000L); () }
    assert(Sessions.pruneAppliedMarkers(spark, root, keep = 2) === 1)
    assert(watermark().contains("pruned_total=2") &&
      watermark().contains("last_pruned=1"),
      s"second prune must accumulate the total: ${watermark()}")
  }

  test("versioned bootstrap replay after a LOST applied marker heals via the generation's digest") {
    // the publish-flip-then-crash window: the generation published (so
    // the replay goes down the APPEND path) but the applied marker was
    // never touched — without the _bootstrap_digest artifact this
    // replay would re-encode the whole bootstrap corpus and DOUBLE its
    // ADC partial sums
    val root0 = Files.createTempDirectory("graft-boot-heal").toString
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val b0 = emb.where($"vec_id" % 3 === 0)
    b0.coalesce(1).write.mode("overwrite").parquet(s"$root0/in/f0")
    val schema = spark.read.parquet(s"$root0/in/f0").schema
    val root = s"$root0/idx"
    val q = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).parquet(s"$root0/in/*"),
      root, s"$root0/ckpt")
    q.awaitTermination(120000)
    val v1 = graft.operators.Clustering.pqOpenVersion(spark, root)
    assert(v1.codes.count() === 4L * b0.count())
    // simulate the crash: the marker vanishes, the generation stays
    val dir = new java.io.File(s"$root/_applied")
    dir.listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach { f => f.delete(); () }
    val q2 = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).parquet(s"$root0/in/*"),
      root, s"$root0/ckpt2")
    q2.awaitTermination(120000)
    assert(graft.operators.Clustering.pqOpenVersion(spark, root)
      .codes.count() === 4L * b0.count(),
      "the bootstrap replay must heal, never re-insert")
    assert(dir.listFiles().count(f =>
      !f.getName.startsWith("_") && !f.getName.startsWith(".")) === 1,
      "the heal must restore the applied marker")
    assert(Sessions.readIndexSignals(spark, root).count() === 1L,
      "a healed replay is not a new decision — no new signal row")
  }

  test("pendingMaintenance: a clean batch after a drifted batch must NOT mask the pending retrain") {
    import org.apache.spark.sql.functions.{lit, pmod, transform}
    val root0 = Files.createTempDirectory("graft-mask-poll").toString
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // the drifted batch in the MIDDLE: bootstrap, 3x-scaled, then clean
    // — the masking sequence the round-15 latest-row poll lost
    (0 until 3).foreach { b =>
      val part = emb.where(pmod($"vec_id", lit(3)) === b)
      val batch =
        if (b == 1) part.withColumn("embedding",
          transform($"embedding", x => (x.cast("double") * lit(3.0)).cast("float")))
        else part
      batch.coalesce(1).write.mode("overwrite").parquet(s"$root0/in/f$b")
      new java.io.File(s"$root0/in/f$b").listFiles()
        .foreach(f => { f.setLastModified(1600000000000L + b * 60000L); () })
    }
    val schema = spark.read.parquet(s"$root0/in/f0").schema
    val root = s"$root0/idx"
    val q = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt")
    q.awaitTermination(120000)
    val sig = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    assert(sig.map(_.getBoolean(5)).toSeq === Seq(false, true, false),
      "only the scaled middle batch may trip the trigger")
    // latest row says retrain_needed=false — the fold must still report
    // the drifted batch's unanswered decision
    assert(Sessions.pendingMaintenance(spark, root)._1 === true,
      "a clean batch must not mask the drifted batch's pending retrain")
    graft.operators.Clustering.pqRetrain(spark, root,
      spark.read.schema(schema).parquet(s"$root0/in/*"), m = 4, k = 8, dim = 64)
    assert(Sessions.pendingMaintenance(spark, root)._1 === false,
      "the executed retrain answers via the version protocol")
  }

  test("compact acknowledgement: an executed compaction clears the poll with no new batch") {
    val root0 = Files.createTempDirectory("graft-compact-ack").toString
    val (emb, schema) = writeVersionedBatches(root0)
    val root = s"$root0/idx"
    // a 1-file budget makes every append signal compact_needed — the
    // poll mechanics under test, not the (separately tested) rule
    val q = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt", compactMaxFiles = 1)
    q.awaitTermination(120000)
    val sig = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    assert(sig.filter(_.getString(1) == "append").forall(_.getBoolean(6)),
      "every append must signal compaction at a 1-file budget")
    val (retrainP, compactP) = Sessions.pendingMaintenance(spark, root)
    assert(compactP === true, "the fragmentation decision must be pending")
    assert(retrainP === true, "the scaled last batch's retrain is pending too")
    // round-15 gap: compactPqIndex never moves _latest, so without an
    // ack the poll stayed pending forever and a scheduler re-compacted
    // in a loop. The executor wrapper rewrites the SERVING generation's
    // codes and appends the kind=compacted ack row.
    val (before, after) = Sessions.compactServingPqIndex(spark, root,
      targetFiles = 1)
    assert(before >= 3 && after === 1,
      s"the rewrite must collapse the serving codes dir ($before -> $after)")
    val (retrainP2, compactP2) = Sessions.pendingMaintenance(spark, root)
    assert(compactP2 === false,
      "the ack row must clear the compact pending with no new batch")
    assert(retrainP2 === true,
      "the compacted ack must not answer the RETRAIN decision")
    // a batch appended AFTER the ack re-opens the pending state: its
    // signal takes seq = max+1, strictly past the ack's reused max
    val extra = emb.where($"vec_id" % 3 === 0).limit(40)
      .withColumn("vec_id", $"vec_id" + org.apache.spark.sql.functions.lit(200000L))
    extra.coalesce(1).write.mode("overwrite").parquet(s"$root0/in/f3")
    new java.io.File(s"$root0/in/f3").listFiles()
      .foreach(f => { f.setLastModified(1600000000000L + 3 * 60000L); () })
    val q2 = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt2", compactMaxFiles = 1)
    q2.awaitTermination(120000)
    assert(Sessions.pendingMaintenance(spark, root)._2 === true,
      "a post-ack fragmented append must re-open the compact pending")
    // the unversioned-retrain ack kind: answered the same way
    Sessions.acknowledgeMaintenance(spark, root, "retrained")
    assert(Sessions.pendingMaintenance(spark, root)._1 === false,
      "an explicit retrained ack must answer retrain (the unversioned-root protocol)")
  }

  test("the loops compact _signals opportunistically under the file budget") {
    val root0 = Files.createTempDirectory("graft-sig-budget").toString
    val (_, schema) = writeVersionedBatches(root0)
    val root = s"$root0/idx"
    val q = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root0/in/*"),
      root, s"$root0/ckpt", signalsCompactMaxFiles = 1)
    q.awaitTermination(120000)
    assert(new java.io.File(s"$root/_signals").listFiles()
      .count(_.getName.endsWith(".parquet")) === 1,
      "a 1-file budget must hold the audit dir at one file after every batch")
    // compaction preserved the audit trail and the cached sequence
    val sig = Sessions.readIndexSignals(spark, root).orderBy($"seq").collect()
    assert(sig.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    assert(sig.map(_.getString(1)).toSeq === Seq("bootstrap", "append", "append"))
  }

  test("bootstrap heal restores the LOST bootstrap signal row idempotently") {
    // the narrower crash window inside the heal path: the marker flip
    // landed, appendIndexSignal did NOT — the replay must restore the
    // audit row, or the trail's first row is an append against an
    // undocumented generation
    val root0 = Files.createTempDirectory("graft-boot-sig-heal").toString
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val b0 = emb.where($"vec_id" % 3 === 0)
    b0.coalesce(1).write.mode("overwrite").parquet(s"$root0/in/f0")
    val schema = spark.read.parquet(s"$root0/in/f0").schema
    val root = s"$root0/idx"
    val q = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).parquet(s"$root0/in/*"),
      root, s"$root0/ckpt")
    q.awaitTermination(120000)
    val v1 = graft.operators.Clustering.pqOpenVersion(spark, root)
    val bootDigest = graft.operators.Clustering.bootstrapDigestOf(spark, v1.dir)
    // simulate the crash: marker AND signal row both lost, generation kept
    new java.io.File(s"$root/_applied").listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach { f => f.delete(); () }
    val sigDir = new java.io.File(s"$root/_signals")
    sigDir.listFiles().foreach { f => f.delete(); () }
    sigDir.delete()
    val q2 = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).parquet(s"$root0/in/*"),
      root, s"$root0/ckpt2")
    q2.awaitTermination(120000)
    assert(graft.operators.Clustering.pqOpenVersion(spark, root)
      .codes.count() === 4L * b0.count(), "the heal must never re-insert")
    val sig = Sessions.readIndexSignals(spark, root).collect()
    assert(sig.length === 1 && sig.head.getString(1) === "bootstrap" &&
      sig.head.getLong(2) === 1L && Some(sig.head.getString(7)) === bootDigest,
      "the heal must restore the generation's own bootstrap signal row")
    // idempotent: a THIRD replay with the marker lost again writes nothing
    new java.io.File(s"$root/_applied").listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach { f => f.delete(); () }
    val q3 = Sessions.streamPqIndexAppendVersioned(
      spark.readStream.schema(schema).parquet(s"$root0/in/*"),
      root, s"$root0/ckpt3")
    q3.awaitTermination(120000)
    assert(Sessions.readIndexSignals(spark, root).count() === 1L,
      "a second heal of the same window must be a no-op")
  }
}
