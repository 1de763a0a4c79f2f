package graft.streaming

import graft.SparkSpec
import graft.streaming.EventStreams._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

/** Structured Streaming specs: incremental windowed aggregation with
  * watermark finalization, mapGroupsWithState running totals, and
  * flatMapGroupsWithState sessionization — all driven deterministically
  * through MemoryStream + processAllAvailable. Also pins batch/stream
  * parity: the same transform over the same rows gives the same answer. */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def ev(id: Long, at: String, uid: Long = 1L, typ: String = "click",
                 v: Double = 1.0): Event = Event(id, ts(at), uid, typ, v)

  private def drain(q: StreamingQuery): Unit = { q.processAllAvailable() }

  test("streaming windowed counts finalize windows after the watermark passes") {
    import spark.implicits._
    val in = MemoryStream[Event](spark)
    val q = streamingWindowedCounts(in.toDF(), win = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("winsink").outputMode("append").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:05:00", v = 2.0),
        ev(2, "2024-01-01 10:20:00", v = 3.0),
        ev(3, "2024-01-01 10:40:00", typ = "view", v = 1.5))
      drain(q)
      // watermark still inside the 10:00 window → nothing finalized yet
      assert(spark.table("winsink").count() == 0)
      // jump event time far ahead: watermark (= max ts − 30 min) clears 11:00
      in.addData(ev(4, "2024-01-01 13:00:00"))
      drain(q)
      in.addData(ev(5, "2024-01-01 13:30:00"))
      drain(q)
      val rows = spark.table("winsink")
        .selectExpr("CAST(window_start AS STRING)", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L, 5.0),
        ("2024-01-01 10:00:00", "view", 1L, 1.5)))
    } finally q.stop()
  }

  test("native session_window: agrees with the lag-based sessionizer incl. the exact-gap edge; streams with watermark finalization") {
    import spark.implicits._
    // batch equivalence on the real fixture: session COUNTS and event
    // totals agree wherever no inter-event gap is exactly 30 min
    val dir = sfDir
    val events = graft.Tables.t(spark, dir, "events")
    val exactEdge = sessionizeBatch(spark, dir) // materializes the contract
    val lagSessions = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events.select($"user_id", $"event_id", $"ts")
        .withColumn("gap_us",
          unix_micros($"ts") - unix_micros(lag($"ts", 1).over(byUser)))
        .filter($"gap_us" === 30L * 60 * 1000000).count()
    }
    assert(lagSessions == 0, "fixture has an exactly-30min gap; edge case below covers it")
    val native = nativeSessionize(events).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("session_start")))
      .toSet
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events.select($"user_id", $"event_id", $"ts")
        .withColumn("gap_us",
          unix_micros($"ts") - unix_micros(lag($"ts", 1).over(byUser)))
        .withColumn("brk", when($"gap_us".isNull ||
          $"gap_us" > 30L * 60 * 1000000, 1).otherwise(0))
        .withColumn("sno", sum($"brk").over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"sno").agg(min($"ts").as("start"))
        .select($"user_id", $"start").collect()
        .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("start"))).toSet
    }
    assert(native == batch, "native and lag-based session starts diverge")
    // the documented edge: a gap of exactly 30 min MERGES natively too
    // (same as the lag form's `> gap` break rule)
    val edge = Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:30:00"))
    assert(nativeSessionize(edge.toDF()).count() == 1)
    // streaming: sessions finalize once the watermark passes their end
    val in = MemoryStream[Event](spark)
    val q = nativeSessionize(in.toDF(), watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("sesssink")
      .outputMode("append").start()
    try {
      in.addData(ev(10, "2024-01-01 09:00:00", uid = 7),
        ev(11, "2024-01-01 09:10:00", uid = 7, v = 2.0))
      drain(q)
      assert(spark.table("sesssink").count() == 0) // not finalized yet
      in.addData(ev(12, "2024-01-01 11:00:00", uid = 7))
      drain(q); in.addData(ev(13, "2024-01-01 11:30:00", uid = 7)); drain(q)
      val done = spark.table("sesssink")
        .selectExpr("user_id", "CAST(session_start AS STRING)", "n_events",
          "total_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(done == Set((7L, "2024-01-01 09:00:00", 2L, 3.0)))
    } finally q.stop()
  }

  test("batch and streaming windowed counts agree on the same data") {
    import spark.implicits._
    val events = Seq(
      ev(1, "2024-01-01 10:05:00", v = 2.0), ev(2, "2024-01-01 10:50:00", v = 3.0),
      ev(3, "2024-01-01 11:10:00", typ = "view", v = 4.0), ev(4, "2024-01-01 12:01:00", v = 1.0))
    val batch = windowedTypeCounts(events.toDF(), "1 hour").collect()
      .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4))).toSet
    val in = MemoryStream[Event](spark)
    val q = windowedTypeCounts(in.toDF(), "1 hour") // no watermark → complete mode
      .writeStream.format("memory").queryName("paritysink").outputMode("complete").start()
    try {
      in.addData(events.take(2)); drain(q)
      in.addData(events.drop(2)); drain(q)
      val streamed = spark.table("paritysink").collect()
        .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals accumulate across triggers") {
    import spark.implicits._
    val in = MemoryStream[Event](spark)
    val q = runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("totalsink").outputMode("update").start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", uid = 1, v = 2.0),
        ev(2, "2024-01-01 10:01:00", uid = 2, v = 5.0))
      drain(q)
      in.addData(ev(3, "2024-01-01 10:02:00", uid = 1, v = 3.0))
      drain(q)
      // update sink: keep the LAST emitted row per user
      val latest = spark.table("totalsink").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(latest == Map(1L -> ((2L, 5.0)), 2L -> ((1L, 5.0))))
    } finally q.stop()
  }

  test("streaming token-bucket rate limiter: decisions equal a sequential replay; bursts beyond capacity are denied") {
    import spark.implicits._
    import EventStreams.{BucketState, bucketDecide}
    val in = MemoryStream[Event](spark)
    val q = streamingRateLimit(in.toDS(), capacity = 3, refillPerMin = 2)
      .writeStream.format("memory").queryName("ratesink").outputMode("append").start()
    // burst of 5 in one minute (only 3 tokens), then a gap that refills,
    // then a late event behind the high-water mark (no retroactive refill)
    val batch1 = Seq(
      ev(1, "2024-01-01 10:00:00", uid = 1, v = 1.0),
      ev(2, "2024-01-01 10:00:10", uid = 1, v = 1.0),
      ev(3, "2024-01-01 10:00:20", uid = 1, v = 1.0),
      ev(4, "2024-01-01 10:00:30", uid = 1, v = 1.0),
      ev(5, "2024-01-01 10:00:40", uid = 1, v = 1.0))
    val batch2 = Seq(
      ev(6, "2024-01-01 10:02:00", uid = 1, v = 1.0), // ~2.67 tokens refilled
      ev(7, "2024-01-01 10:01:00", uid = 1, v = 1.0)) // late: behind mark
    try {
      in.addData(batch1: _*); drain(q)
      in.addData(batch2: _*); drain(q)
      val got = spark.table("ratesink")
        .select($"event_id", $"allowed", $"tokens_milli")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      // sequential replay with the SAME decision function, batch order
      // preserved (batch 2 sorts by ts, so the late event_id=7 runs last)
      var st = BucketState(3 * 60000L, Long.MinValue)
      val replay = (batch1 ++ batch2.sortBy(e => (e.ts.getTime, e.event_id)))
        .map { e =>
          val (d, n) = bucketDecide(st, e, 3, 2); st = n
          (d.event_id, d.allowed, d.tokens_milli)
        }.sortBy(_._1)
      assert(got == replay, s"streaming decisions diverge from replay:\n$got\nvs\n$replay")
      // the burst: 3 capacity tokens + 10 s gaps refill 1/3 token each, so
      // the 4th event lands on EXACTLY 1.0 accumulated token (admitted)
      // and the 5th is denied on a sub-token residue
      assert(got.take(5).map(_._2) == Seq(true, true, true, true, false))
      // refilled event admitted; the late one decides on residual tokens
      assert(got.find(_._1 == 6L).exists(_._2 == true))
    } finally q.stop()
  }

  test("sessionize closes a session when a same-user event lands past the gap") {
    import spark.implicits._
    val in = MemoryStream[Event](spark)
    val q = sessionize(in.toDS().withWatermark("ts", "10 minutes"), gap = 30.minutes)
      .writeStream.format("memory").queryName("sessionsink").outputMode("append").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", v = 1.0),
        ev(2, "2024-01-01 10:05:00", v = 2.0),
        ev(3, "2024-01-01 10:20:00", v = 3.0))
      drain(q)
      assert(spark.table("sessionsink").count() == 0) // still open
      in.addData(ev(4, "2024-01-01 12:00:00", v = 9.0)) // > 30 min gap
      drain(q)
      val rows = spark.table("sessionsink")
        .selectExpr("user_id", "CAST(session_start AS STRING)",
          "CAST(session_end AS STRING)", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getInt(3), r.getDouble(4))).toSet
      assert(rows == Set((1L, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 3, 6.0)))
    } finally q.stop()
  }

  test("streaming dedup: duplicate payloads within the watermark emit once") {
    import spark.implicits._
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val in = MemoryStream[(Long, Timestamp, String)](spark)
    val q = EventStreams.streamingDedup(
        in.toDF().toDF("doc_id", "ts", "text"), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedupsink").outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "alpha"),
        (2L, ts("2024-01-01 10:01:00"), "beta"))
      drain(q)
      // same content arrives again (re-crawl) in a later batch, inside watermark
      in.addData((3L, ts("2024-01-01 10:05:00"), "alpha"),
        (4L, ts("2024-01-01 10:06:00"), "gamma"))
      drain(q)
      val texts = spark.table("dedupsink").collect()
        .map(r => r.getAs[String]("text")).sorted.toSeq
      assert(texts == Seq("alpha", "beta", "gamma")) // second alpha suppressed
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch against the dim") {
    import spark.implicits._
    val dim = Seq(("click", 2.0), ("view", 0.5)).toDF("event_type", "weight")
    val in = MemoryStream[Event](spark)
    val q = enrichWithDim(in.toDF(), dim)
      .withColumn("weighted", $"value" * $"weight")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", v = 3.0),
        ev(2, "2024-01-01 10:01:00", typ = "view", v = 4.0),
        ev(3, "2024-01-01 10:02:00", typ = "purchase", v = 9.0)) // no dim row → dropped
      drain(q)
      val rows = spark.table("enriched")
        .select($"event_id", $"weighted")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 6.0), (2L, 2.0)))
    } finally q.stop()
  }

  test("batch and streaming sessionization agree on the same events") {
    import spark.implicits._
    // two users, three sessions' worth of events + a far-future sentinel
    // per user so the streaming side closes every real session
    val real = Seq(
      ev(1, "2024-01-01 10:00:00", uid = 1, v = 1.0),
      ev(2, "2024-01-01 10:10:00", uid = 1, v = 2.0),
      ev(3, "2024-01-01 13:00:00", uid = 1, v = 4.0), // new session (gap 2h50)
      ev(4, "2024-01-01 09:30:00", uid = 2, v = 8.0),
      ev(5, "2024-01-01 09:45:00", uid = 2, v = 0.5))
    val sentinels = Seq(
      ev(98, "2024-06-01 00:00:00", uid = 1), ev(99, "2024-06-01 00:00:00", uid = 2))
    val in = MemoryStream[Event](spark)
    val q = sessionize(in.toDS().withWatermark("ts", "1 minute"), gap = 30.minutes)
      .writeStream.format("memory").queryName("paritysess").outputMode("append").start()
    try {
      in.addData(real); drain(q)
      in.addData(sentinels); drain(q)
      in.addData(ev(100, "2024-06-02 00:00:00", uid = 1)); drain(q) // advance watermark
      val streamed = spark.table("paritysess")
        .filter($"session_start" < ts("2024-06-01 00:00:00"))
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
          r.getAs[Int]("n_events"), r.getAs[Double]("total_value"))).toSet
      // batch twin over the same real events, via a temp parquet-free path:
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      val batch = real.toDS().toDF()
        .withColumn("gap_us", unix_micros($"ts") - unix_micros(lag($"ts", 1).over(byUser)))
        .withColumn("brk", when($"gap_us".isNull || $"gap_us" > 30L * 60 * 1000000, 1).otherwise(0))
        .withColumn("sn", sum($"brk").over(byUser.rowsBetween(Long.MinValue, 0)))
        .groupBy($"user_id", $"sn")
        .agg(min($"ts").as("s"), max($"ts").as("e"),
          count(lit(1)).cast("int").as("n"), sum($"value").as("tv"))
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("s"),
          r.getAs[Timestamp]("e"), r.getAs[Int]("n"), r.getAs[Double]("tv"))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join matches only same-user purchases inside the hour") {
    import spark.implicits._
    val views = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    val q = streamingFunnelJoin(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("funnelsink").outputMode("append").start()
    try {
      views.addData(
        ev(1, "2024-01-01 10:00:00", uid = 1, typ = "view"),
        ev(2, "2024-01-01 10:00:00", uid = 3, typ = "view")) // never matched
      purchases.addData(
        ev(10, "2024-01-01 10:30:00", uid = 1, typ = "purchase", v = 5.0), // in window
        ev(11, "2024-01-01 12:30:00", uid = 1, typ = "purchase", v = 7.0), // past view_ts + 1 h
        ev(12, "2024-01-01 10:30:00", uid = 2, typ = "purchase", v = 9.0)) // other user
      drain(q)
      val rows = spark.table("funnelsink")
        .select($"view_id", $"user_id", $"value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize emits via event-time timeout when the watermark passes") {
    import spark.implicits._
    val in = MemoryStream[Event](spark)
    val q = sessionize(in.toDS().withWatermark("ts", "5 minutes"), gap = 30.minutes)
      .writeStream.format("memory").queryName("timeoutsink").outputMode("append").start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", uid = 7, v = 4.0))
      drain(q)
      // a DIFFERENT user's event advances the watermark past 10:30 + gap
      in.addData(ev(2, "2024-01-01 12:00:00", uid = 8))
      drain(q)
      in.addData(ev(3, "2024-01-01 12:30:00", uid = 8))
      drain(q)
      val uids = spark.table("timeoutsink").collect().map(_.getLong(0)).toSet
      assert(uids.contains(7L), "user 7's session should have timed out")
    } finally q.stop()
  }

  test("idempotent sink: replaying a batch rewrites the same snapshot, no duplicates") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-idem-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idem-ck").toString
    val in = MemoryStream[Event](spark)
    val q = idempotentCountsSink(in.toDF(), out, ckpt)
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", typ = "view", v = 2.0),
                 ev(2, "2024-01-01 10:01:00", typ = "view", v = 3.0),
                 ev(3, "2024-01-01 10:02:00", typ = "purchase", v = 5.0))
      drain(q)
      in.addData(ev(4, "2024-01-01 10:03:00", typ = "view", v = 1.0))
      drain(q)
      val snap = spark.read.parquet(out).collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("total_value").doubleValue))
        .toMap
      assert(snap == Map("view" -> ((3L, 6.0)), "purchase" -> ((1L, 5.0))),
        s"snapshot must reflect ALL batches exactly once: $snap")
      // simulated failure replay: re-running the SAME batch content through
      // the sink body must leave the snapshot unchanged (idempotence).
      // Materialize the rows FIRST — a lazy frame over `out` would be
      // reading the very files the overwrite deletes.
      val cur = spark.read.parquet(out)
      val rows = cur.collect().toSeq
      val schema = cur.schema
      val replay = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), schema)
      EventStreams.snapshotBatch(replay, out)
      val after = spark.read.parquet(out).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
      assert(after == Map("view" -> 3L, "purchase" -> 1L),
        "replaying a batch must not duplicate rows")
    } finally q.stop()
  }

  test("native session_window agrees with the gap-window sessionization") {
    import spark.implicits._
    // Spark's built-in session_window(ts, gap) must produce the same
    // sessions as the hand-rolled lag/break form the oracle checks:
    // same (user, start, size, value), and its window end = last event
    // + gap by definition.
    val batch = EventStreams.sessionizeBatch(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    val native = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
    val nat = native.collect().map(r => (r.getAs[Long]("user_id"),
      r.getAs[Timestamp]("session_start"), r.getAs[Long]("n_events"),
      r.getAs[Double]("total_value"))).toSet
    // sessionizeBatch limits to 500 rows; compare on its keyspace
    assert(batch.subsetOf(nat),
      s"missing from native: ${batch -- nat}")
    // window end is last-event + gap, never beyond
    native.collect().foreach { r =>
      val wEnd = r.getAs[org.apache.spark.sql.Row]("w").getAs[Timestamp]("end")
      val lastTs = r.getAs[Timestamp]("session_end")
      assert(wEnd.getTime - lastTs.getTime == 30L * 60 * 1000,
        "session_window end must be last event + gap")
    }
  }

  test("streaming incremental dedup: arriving re-crawls match the corpus index per micro-batch") {
    import spark.implicits._
    val dir = sfDir
    val sink = java.nio.file.Files.createTempDirectory("graft-incdedup-sink").toString
    // two re-crawled docs (same fixture transform as q_dedup_incremental)
    val recrawls = graft.Tables.t(spark, dir, "documents")
      .filter($"doc_id" % 10 === 0)
      .orderBy($"doc_id").limit(2)
      .select(($"doc_id" + 3000000L).as("doc_id"), $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)](spark)
    val q = streamingIncrementalDedup(
      in.toDF().toDF("doc_id", "text"), dir, sink)
    try {
      in.addData(recrawls.head); drain(q)
      in.addData(recrawls.last); drain(q)
    } finally q.stop()
    val matches = spark.read.parquet(sink)
      .select($"new_id", $"corpus_id", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // each re-crawl must rediscover its own original at J = 1 across
    // SEPARATE micro-batches (index reused, not rebuilt)
    val selfPairs = matches.filter(m => m._1 - 3000000L == m._2)
    assert(selfPairs.map(_._1).toSet == recrawls.map(_._1).toSet,
      s"each batch doc must match its original: $matches")
    selfPairs.foreach(m => assert(m._3 == 1.0))
    matches.foreach(m => assert(m._3 >= 0.8))
  }

  test("streaming incremental dedup: file source + checkpoint recovery across restart, no lost or duplicate matches") {
    import spark.implicits._
    val dir = sfDir
    val in = java.nio.file.Files.createTempDirectory("graft-incdedup-in").toString
    val sink = java.nio.file.Files.createTempDirectory("graft-incdedup-sink2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-incdedup-ckpt2").toString
    val recrawls = graft.Tables.t(spark, dir, "documents")
      .filter($"doc_id" % 10 === 0)
      .orderBy($"doc_id").limit(2)
      .select(($"doc_id" + 4000000L).as("doc_id"), $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def arrive(d: (Long, String)): Unit =
      Seq(d).toDF("doc_id", "text").coalesce(1)
        .write.mode("append").json(in)
    def source = spark.readStream
      .schema("doc_id LONG, text STRING").json(in)
    def run(): Unit = {
      val q = streamingIncrementalDedup(source, dir, sink, Some(ckpt))
      try q.processAllAvailable() finally q.stop()
    }
    arrive(recrawls.head)
    run()                 // run 1 processes doc 1, then "dies"
    arrive(recrawls.last) // doc 2 arrives while the query is down
    run()                 // run 2 must resume from the checkpoint: doc 2 only
    run()                 // run 3 with nothing new must emit nothing
    val matches = spark.read.parquet(sink)
      .select($"new_id", $"corpus_id", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // no losses: both docs rediscovered their originals across restarts
    val selfPairs = matches.filter(m => m._1 - 4000000L == m._2)
    assert(selfPairs.map(_._1).toSet == recrawls.map(_._1).toSet,
      s"restart lost a match: ${matches.toSeq}")
    selfPairs.foreach(m => assert(m._3 == 1.0))
    // no duplicates: the committed file-source offsets were not replayed
    val pairCounts = matches.groupBy(m => (m._1, m._2)).view.mapValues(_.length)
    assert(pairCounts.values.forall(_ == 1),
      s"restart re-emitted matches: ${pairCounts.filter(_._2 > 1).toMap}")
  }

  test("sliding disorder x anomaly join: finalized joined windows equal the batch twin; beyond-watermark drops from both legs") {
    import spark.implicits._
    // (event_id, ts, arr_ts, event_type, value)
    val in = MemoryStream[(Long, Timestamp, Timestamp, String, Double)](spark)
    val stream = in.toDF()
      .toDF("event_id", "ts", "arr_ts", "event_type", "value")
    val q = EventStreams.slidingDisorderAnomalyJoin(stream,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("disanom")
      .outputMode("append").start()
    def row(id: Long, at: String, arrivedAt: String, typ: String, v: Double) =
      (id, ts(at), ts(arrivedAt), typ, v)
    val onTime = Seq(
      row(1, "2024-01-01 10:05:00", "2024-01-01 10:06:00", "click", 10.0),
      row(2, "2024-01-01 10:10:00", "2024-01-01 10:40:00", "click", 99.0), // late arrival + flagged
      row(3, "2024-01-01 10:20:00", "2024-01-01 10:21:00", "view", 60.0))  // flagged
    val lateOk = row(4, "2024-01-01 09:50:00", "2024-01-01 11:00:00", "click", 70.0)
    val advance = row(5, "2024-01-02 12:00:00", "2024-01-02 12:00:30", "view", 1.0)
    val lateDropped = row(6, "2024-01-01 08:00:00", "2024-01-02 13:00:00", "click", 99.0)
    val sentinel = row(7, "2024-01-09 00:00:00", "2024-01-09 00:00:10", "view", 1.0)
    try {
      in.addData(onTime: _*); drain(q)
      in.addData(lateOk); drain(q)      // within the 1h watermark: folds in
      in.addData(advance); drain(q)     // watermark advances a day
      in.addData(lateDropped); drain(q) // beyond watermark: both legs drop it
      in.addData(sentinel); drain(q)    // finalize everything earlier
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))
    val got = spark.table("disanom").collect().map(key).toSet
    val kept = (onTime :+ lateOk :+ advance)
      .toDF("event_id", "ts", "arr_ts", "event_type", "value")
    val wantAll = EventStreams.slidingDisorderAnomalyBatchOn(kept)
      .collect().map(key)
    // streaming finalizes only windows fully before the final watermark
    // (sentinel - 1h); every such batch row must appear exactly once
    val horizon = ts("2024-01-08 00:00:00")
    val want = wantAll.filter(_._1.before(horizon)).toSet
    assert(want.subsetOf(got),
      s"finalized joined windows missing:\n got $got\n want $want")
    // the beyond-watermark event (value 99 at 08:00) leaked nowhere: its
    // two windows (07:30, 08:00) must be absent or not count it
    assert(got.filter(r => r._1 == ts("2024-01-01 07:30:00")
      || r._1 == ts("2024-01-01 08:00:00")).forall(_._3 == 0L))
    // the joined readout separates the legs: the sliding 09:30-10:30
    // click window holds ids 1, 2, 4 — 2 flagged (99, 70) and 2 late
    // arrivals (ids 2 and 4, > 15 min after event time)
    val w0930click = got.find(r => r._1 == ts("2024-01-01 09:30:00")
      && r._2 == "click")
    assert(w0930click.exists(r => r._3 == 3L && r._4 == 2L && r._5 == 2L),
      s"09:30 click window wrong: $w0930click")
  }

  test("streaming window anomalies: late-within-watermark folds in, late-beyond drops, finalized windows equal the batch twin") {
    import spark.implicits._
    val profile = typeProfile(spark, sfDir)
    val in = MemoryStream[Event](spark)
    val q = streamingWindowAnomalies(in.toDS().toDF(), profile, watermark = "1 hour")
      .writeStream.format("memory").queryName("winanom").outputMode("append").start()
    val onTime = Seq(
      ev(1, "2024-01-01 10:00:00", typ = "click", v = 2.0),
      ev(2, "2024-01-01 10:30:00", typ = "view", v = 3.0),
      ev(3, "2024-01-01 11:00:00", typ = "click", v = 1.5))
    val lateOk = ev(4, "2024-01-01 09:45:00", typ = "click", v = 2.5) // watermark still 10:00
    val advance = ev(5, "2024-01-03 00:00:00", typ = "view", v = 1.0)
    val lateDropped = ev(6, "2024-01-01 08:00:00", typ = "click", v = 99.0)
    val sentinel = ev(7, "2024-01-10 00:00:00", typ = "view", v = 1.0)
    try {
      in.addData(onTime: _*); drain(q)
      in.addData(lateOk); drain(q)    // disorder within the watermark: must fold
      in.addData(advance); drain(q)   // watermark → 2024-01-02 23:00
      in.addData(lateDropped); drain(q) // 46 h late: must be dropped
      in.addData(sentinel); drain(q)  // finalize everything before Jan 9
    } finally q.stop()
    val got = spark.table("winanom")
      .select($"window_start", $"event_type", $"n_events", $"flagged")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    // the batch twin over exactly the NON-dropped events, restricted to
    // the finalized (pre-sentinel) window range
    val kept = (onTime :+ lateOk :+ advance).toDS().toDF()
    val want = graft.streaming.EventStreams
      .windowAnomalyBatchOn(kept, profile)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == want,
      s"finalized streaming windows must equal the batch twin:\n got $got\n want $want")
    // the dropped event's value (99.0) must appear in NO window count:
    // its two windows were already finalized with the on-time events only
    val jan1Click = got.filter(w => w._2 == "click")
    assert(jan1Click.nonEmpty && jan1Click.forall(_._3 == 3L),
      s"beyond-watermark event leaked into a finalized window: $jan1Click")
  }

  test("streaming heavy hitters: state equals a sequential Misra-Gries replay and obeys the MG guarantee") {
    import spark.implicits._
    val in = MemoryStream[Event](spark)
    val k = 3
    val q = streamingHeavyHitters(in.toDS(), k = k)
      .writeStream.format("memory").queryName("hhsink").outputMode("update").start()
    try {
      // batch 1: user 7 dominates clicks; batch 2 keeps pushing 7 + noise
      val b1 = (1 to 12).map(i =>
        ev(i, f"2024-01-01 10:${i}%02d:00", uid = if (i % 2 == 0) 7L else i.toLong))
      val b2 = (13 to 24).map(i =>
        ev(i, f"2024-01-01 11:${i - 12}%02d:00", uid = if (i % 3 == 0) 7L else i.toLong))
      in.addData(b1: _*); drain(q)
      in.addData(b2: _*); drain(q)
      val last = spark.table("hhsink").as[HHSummary].collect()
        .filter(_.event_type == "click").maxBy(_.n_seen)
      // sequential driver replay with the same per-batch (ts, id) fold order
      val mg = new graft.ops.MisraGries(k)
      var st = Map.empty[String, Long]
      Seq(b1, b2).foreach(_.sortBy(e => (e.ts.getTime, e.event_id))
        .foreach(e => st = mg.reduce(st, e.user_id.toString)))
      assert(last.n_seen == 24L)
      assert(last.n_counters == st.size)
      val (eu, ec) = st.maxBy { case (u, c) => (c, u) }
      assert(last.top_user == eu && last.top_lb == ec,
        s"streaming (${last.top_user},${last.top_lb}) vs replay ($eu,$ec)")
      // MG guarantee vs exact counts: every counter is a lower bound and
      // undercounts by at most n/(k+1); the dominant key must be present
      val exact = (b1 ++ b2).groupBy(_.user_id.toString).view.mapValues(_.size.toLong).toMap
      val n = 24L
      st.foreach { case (u, c) =>
        assert(c <= exact(u), s"counter for $u overcounts")
        assert(exact(u) - c <= n / (k + 1), s"counter for $u undercounts past the bound")
      }
      assert(st.contains("7"), "dominant key must survive in the sketch")
    } finally q.stop()
  }

  test("streaming anomalies: Welford state flags only genuine outliers, never self-scores") {
    import spark.implicits._
    val in = MemoryStream[Event](spark)
    val q = streamingAnomalies(in.toDS(), minN = 10, zThresh = 3.0)
      .writeStream.format("memory").queryName("anomsink").outputMode("append").start()
    try {
      // 20 calm observations (values 1.0/2.0 alternating) in batch 1
      val calm = (1 to 20).map(i =>
        ev(i, f"2024-01-01 10:${i}%02d:00", v = if (i % 2 == 0) 2.0 else 1.0))
      in.addData(calm: _*); drain(q)
      assert(spark.table("anomsink").count() == 0,
        "calm traffic must not alarm")
      // batch 2: one wild value among normals
      in.addData(
        ev(21, "2024-01-01 11:01:00", v = 1.0),
        ev(22, "2024-01-01 11:02:00", v = 50.0),
        ev(23, "2024-01-01 11:03:00", v = 2.0))
      drain(q)
      val flagged = spark.table("anomsink").as[Anomaly].collect()
      assert(flagged.map(_.event_id).toSet == Set(22L), "exactly the outlier")
      val a = flagged.head
      // prior-only stats: 21 calm points (11 × 1.0, 10 × 2.0) at the
      // time event 22 is scored — replicate Welford in plain Scala
      var (n, mean, m2) = (0L, 0.0, 0.0)
      (calm.map(_.value) :+ 1.0).foreach { v =>
        n += 1; val d = v - mean; mean += d / n; m2 += d * (v - mean)
      }
      val expZ = (50.0 - mean) / math.sqrt(m2 / (n - 1))
      assert(math.abs(a.z - expZ) < 1e-9, s"z ${a.z} vs $expZ")
      // event 23 was scored against stats that ABSORBED the outlier —
      // the detector keeps learning — but 2.0 is still within 3σ of the
      // post-outlier distribution, so it must not alarm (checked above
      // by the exact flagged set)
      // batch 3: state persisted across triggers — another spike alarms
      in.addData(ev(24, "2024-01-01 11:10:00", v = 60.0)); drain(q)
      assert(spark.table("anomsink").as[Anomaly].collect()
        .map(_.event_id).toSet == Set(22L, 24L))
    } finally q.stop()
  }

  test("anomaly batch anchor: rollup matches a sequential driver-side Welford scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = EventStreams.anomalyBatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"ts", $"event_id", $"value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    rows.foreach { r =>
      val tp = r.getAs[String]("event_type")
      val seq = byType(tp).sortBy(e => (e._2, e._3)).map(_._4)
      var cnt = 0L; var sx = BigDecimal(0); var sxx = BigDecimal(0)
      var scored = 0L; var anom = 0L; var maxZ = 0.0
      seq.foreach { v =>
        if (cnt >= 30) {
          val m = sx.toDouble / cnt
          val va = (sxx.toDouble - sx.toDouble * sx.toDouble / cnt) / (cnt - 1)
          if (va > 0) {
            val z = (v - m) / math.sqrt(va)
            scored += 1
            if (math.abs(z) > 3.0) anom += 1
            if (math.abs(z) > maxZ) maxZ = math.abs(z)
          }
        }
        val vd = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        cnt += 1; sx += vd; sxx += (vd * vd)
      }
      assert(r.getAs[Long]("n_events") == seq.length.toLong, s"$tp n")
      assert(r.getAs[Long]("n_scored") == scored, s"$tp scored")
      assert(r.getAs[Long]("n_anomalies") == anom, s"$tp anomalies")
      assert(math.abs(r.getAs[Double]("max_abs_z") - maxZ) < 1e-5, s"$tp maxz")
    }
  }

  test("rate-limit batch anchor equals a driver bucketDecide fold per panel user") {
    import spark.implicits._
    import EventStreams.{BucketState, bucketDecide}
    val rows = EventStreams.rateLimitBatch(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_allowed"),
          r.getAs[Long]("n_denied"), r.getAs[Long]("tokens_milli"))).toMap
    assert(rows.nonEmpty)
    val panel = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event].collect()
      .filter { e =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rl:${e.user_id}".getBytes("UTF-8"))
        val h = java.lang.Long.parseLong(
          md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
        h % 10 == 0
      }
      .groupBy(_.user_id)
    assert(rows.keySet == panel.keySet)
    panel.foreach { case (uid, es) =>
      var st = BucketState(3 * 60000L, Long.MinValue)
      var allowed = 0L
      es.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val (d, n) = bucketDecide(st, e, 3, 2)
        st = n
        if (d.allowed) allowed += 1
      }
      assert(rows(uid) ==
        ((es.length.toLong, allowed, es.length - allowed, st.units / 60L)),
        s"user $uid")
    }
  }

  test("dedup-first batch anchor keeps each key's earliest arrival") {
    import spark.implicits._
    val got = EventStreams.dedupFirstBatch(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val events = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event].collect()
    val byType = events.groupBy(_.event_type)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (tp, es) =>
      val kept = es.groupBy(_.user_id).values
        .map(_.minBy(e => (e.ts.getTime, e.event_id))).toSeq
      val meanFirst = kept.map(e => BigDecimal(e.value)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / kept.size
      val (n, k, m) = got(tp)
      assert(n == es.length.toLong && k == kept.size.toLong, tp)
      assert(math.abs(m - BigDecimal(meanFirst)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, tp)
    }
  }

  test("gap-sessions batch anchor emits exactly the gap-closed sessions, last-per-user withheld") {
    import spark.implicits._
    val got = EventStreams.gapSessionsBatch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    // driver replay of the SAME ms-precision fold: sessions break on
    // gap > 30 min of Timestamp.getTime millis; the final (open)
    // session per user is withheld (batch never times out)
    val gapMs = 30L * 60 * 1000
    val events = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event].collect()
    val want = events.groupBy(_.user_id).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = sorted.foldLeft(List.empty[List[EventStreams.Event]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e.ts.getTime - cur.map(_.ts.getTime).max <= gapMs)
            (e :: cur) :: done
          else List(e) :: cur :: done
      }.reverse.dropRight(1) // last session stays open in state
      sessions.map { s =>
        val times = s.map(_.ts.getTime)
        (uid, new Timestamp(times.min), new Timestamp(times.max),
          s.size.toLong)
      }
    }.toSet
    // the anchor caps at 500 rows in (user, start) order — replay the cap
    val wantCapped = want.toSeq.sortBy { case (u, st, _, _) =>
      (u, st.getTime) }.take(500).toSet
    assert(got == wantCapped)
  }

  test("token heavy-hitters batch anchor equals first-principles heavy hitters (MG no-false-negative gate)") {
    import spark.implicits._
    val got = EventStreams.tokenHeavyHittersBatch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val toks = graft.Tables.t(spark, sfDir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("token"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = toks.groupBy(_._1)
    val want = bySource.flatMap { case (src, ts) =>
      val n = ts.length.toLong
      ts.groupBy(_._2).collect {
        case (tok, occ) if occ.length > n / 65.0 =>
          (src, tok) -> occ.length.toLong
      }
    }.toMap
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
  }
}
