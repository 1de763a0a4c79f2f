package graft.streaming

import graft.Tables.t
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.concurrent.duration.FiniteDuration

/** Structured Streaming surface over the `events` shape (event_id, ts,
  * user_id, event_type, value): the reference is bounded-only
  * (/root/reference/src/execution.rs:96 pins `Bounded`), so this module
  * is the extension path SURVEY §2b marks for streams — built so the
  * SAME transform runs batch or streaming:
  *
  *  - [[windowedTypeCounts]] is a plain groupBy(window(...)) aggregation;
  *    applied to a static frame it is the oracle-checked
  *    `q_stream_window`, applied to a `readStream` frame (via
  *    [[streamingWindowedCounts]], watermarked) it incrementalizes —
  *    Spark plans stateful partial aggregation per trigger, state keyed
  *    by (window, event_type), late data beyond the watermark dropped.
  *  - [[runningUserTotals]] — `mapGroupsWithState` running aggregates
  *    (Update mode): state is one row per user, shuffled once per
  *    trigger by user_id.
  *  - [[sessionize]] — `flatMapGroupsWithState` (Append mode, event-time
  *    timeout): gap-based session assembly; sessions close when a
  *    same-user event arrives past the gap OR the watermark passes the
  *    session end + gap.
  *
  * At scale the state store is the bottleneck, not the stream: state per
  * key is O(1) here (a window count, a user total, one open session), so
  * a 1000-executor job shards state by the groupBy key exactly like a
  * batch shuffle.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, total: Double)
  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Int,
                               total_value: Double)

  /** Tumbling-window per-type counts — identical semantics batch or
    * streaming (decimal-routed sum keeps doubles partition-order-exact). */
  def windowedTypeCounts(events: DataFrame, win: String): DataFrame =
    events
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming form: watermarked so Append mode can finalize windows and
    * bound state. */
  def streamingWindowedCounts(events: DataFrame, win: String = "1 hour",
                              watermark: String = "2 hours"): DataFrame =
    windowedTypeCounts(events.withWatermark("ts", watermark), win)

  /** Batch anchor for the oracle: 1-day tumbling windows over the events
    * table (epoch-aligned on both engines). */
  def windowBatch(s: SparkSession, dir: String): DataFrame =
    windowedTypeCounts(t(s, dir, "events"), "1 day")
      .orderBy(col("window_start"), col("event_type"))

  val windowBatchSql: String =
    """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
      |  time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin

  /** Sliding-window batch anchor: 1-day windows sliding every 12 h —
    * each event lands in two windows (`window()` emits one row per
    * membership; the oracle reproduces that with an unnest over the two
    * 12 h-aligned starts covering each event). */
  def slidingBatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))

  val slidingBatchSql: String =
    """SELECT time_bucket(INTERVAL '12 hours', ts) - k * INTERVAL '12 hours' AS window_start,
      |  event_type, COUNT(*) AS n_events
      |FROM events, (SELECT UNNEST([0, 1]) AS k)
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Batch sessionization anchor — the oracle-checkable twin of
    * [[sessionize]]: a session breaks where the same-user gap exceeds
    * 30 min; session id = running count of breaks (one sort-based
    * window per user, then a plain aggregate — both stages shuffle on
    * user_id only). Proves the gap semantics the streaming op
    * implements with state. */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("brk",
        when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("user_id"), col("session_no"))
      .limit(500)
  }

  val sessionizeBatchSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |b AS (
      |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
      |                 THEN 1 ELSE 0 END AS brk FROM g),
      |sess AS (
      |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      |  FROM b)
      |SELECT user_id, session_no, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, session_no
      |ORDER BY user_id, session_no LIMIT 500""".stripMargin

  /** NATIVE session windows — Spark's built-in `session_window` (gap-
    * based dynamic windows, engine-managed state) over the same 30-min
    * gap as [[sessionize]]/[[sessionizeBatch]]: the declarative form
    * that runs identically on batch AND streaming frames, with
    * watermark-driven state eviction for free. Boundary semantics match
    * the lag-based batch form INCLUDING the edge: a gap of exactly the
    * threshold merges in both (native windows are [ts, ts+gap] for
    * merging purposes; the lag form breaks only on `> gap`) — the spec
    * pins this. Prefer this form at scale: no per-user window sort, and
    * streaming state is evicted by watermark instead of
    * mapGroupsWithState timeouts. */
  def nativeSessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val base = watermark.fold(events)(w => events.withWatermark("ts", w))
    base
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))
  }

  /** Running per-user totals: bounded state (one row per user), updated
    * each trigger. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val upd = UserTotals(uid, n, tot)
          state.update(upd)
          upd
      }
  }

  /** Gap-based sessionization. A session closes when (a) a same-user
    * event lands more than `gap` after the session end — emitted
    * immediately — or (b) the event-time watermark passes
    * session end + gap (timeout path). Input must be watermarked. */
  def sessionize(events: Dataset[Event], gap: FiniteDuration): Dataset[UserSession] = {
    val s = events.sparkSession
    import s.implicits._
    val gapMs = gap.toMillis
    def emit(uid: Long, st: SessionState): UserSession =
      UserSession(uid, new Timestamp(st.start), new Timestamp(st.end),
        st.n, st.total)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = emit(uid, state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            var out = List.empty[UserSession]
            var cur = state.getOption
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val ems = e.ts.getTime
              cur match {
                case Some(st) if ems - st.end <= gapMs =>
                  cur = Some(SessionState(st.start, math.max(st.end, ems),
                    st.n + 1, st.total + e.value))
                case Some(st) =>
                  out ::= emit(uid, st)
                  cur = Some(SessionState(ems, ems, 1, e.value))
                case None =>
                  cur = Some(SessionState(ems, ems, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.end + gapMs)
            }
            out.reverseIterator
          }
      }
  }

  final case class TypeMoments(n: Long, mean: Double, m2: Double)
  final case class Anomaly(event_type: String, event_id: Long,
    value: Double, z: Double)

  /** Streaming anomaly flags per event type via WELFORD running moments
    * — the arrival-time twin of the batch z-score profile: each event is
    * scored against the statistics of everything that arrived BEFORE it
    * (never itself), then absorbed. `mapGroupsWithState` keeps exactly
    * three numbers (n, mean, M2) per event type — O(|types|) state
    * forever, the canonical bounded-state online aggregation — and
    * Welford's update is numerically stable where a naive Σx² running
    * sum cancels catastrophically at large n.
    *
    * Scoring uses the SAMPLE stddev (M2/(n−1)) and starts only once
    * `minN` prior observations exist (early arrivals score 0 — a z
    * against 3 points is noise). Within a micro-batch, events are
    * processed in (ts, event_id) order so replays are deterministic;
    * across batches the trigger order IS the stream order, as for any
    * online detector. */
  def streamingAnomalies(events: Dataset[Event], minN: Long = 30,
      zThresh: Double = 3.0): Dataset[Anomaly] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[Event], state: GroupState[TypeMoments]) =>
          var st = state.getOption.getOrElse(TypeMoments(0L, 0.0, 0.0))
          val out = List.newBuilder[Anomaly]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (st.n >= minN) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0) {
                val z = (e.value - st.mean) / sd
                if (math.abs(z) > zThresh) out += Anomaly(et, e.event_id, e.value, z)
              }
            }
            // Welford absorb AFTER scoring: mean/M2 never include e itself
            val n1 = st.n + 1
            val d = e.value - st.mean
            val mean1 = st.mean + d / n1
            st = TypeMoments(n1, mean1, st.m2 + d * (e.value - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class HHState(counters: Map[String, Long], n: Long)
  final case class HHSummary(event_type: String, n_seen: Long,
    n_counters: Int, top_user: String, top_lb: Long)

  /** Streaming HEAVY HITTERS per event type — the Misra–Gries summary
    * ([[graft.ops.MisraGries]], reused verbatim as the state-update
    * function) maintained continuously in `mapGroupsWithState`: O(k)
    * counters per event type FOREVER, emitting the refreshed summary
    * (top key + its lower-bound count) every trigger in Update mode.
    * The arrival-time twin of the batch `q_agg_heavy_hitters` rollup —
    * "which users dominate this event type RIGHT NOW" without ever
    * holding a per-user map.
    *
    * The MG guarantee survives streaming unchanged because the sketch
    * is a left fold and the stream IS a left fold: any key with true
    * frequency > n/(k+1) is present, and each counter undercounts by
    * at most n/(k+1). Within a micro-batch events fold in (ts,
    * event_id) order so replays are deterministic; across batches the
    * trigger order is the stream order, as for any online summary. */
  def streamingHeavyHitters(events: Dataset[Event], k: Int = 8)
      : Dataset[HHSummary] = {
    val s = events.sparkSession
    import s.implicits._
    val mg = new graft.ops.MisraGries(k)
    events.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[Event], state: GroupState[HHState]) =>
          var st = state.getOption.getOrElse(HHState(Map.empty, 0L))
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            st = HHState(mg.reduce(st.counters, e.user_id.toString), st.n + 1)
          }
          state.update(st)
          if (st.counters.isEmpty) HHSummary(et, st.n, 0, "", 0L)
          else {
            val (tu, tc) = st.counters.maxBy { case (u, c) => (c, u) }
            HHSummary(et, st.n, st.counters.size, tu, tc)
          }
      }
  }

  /** Token-bucket state in EXACT integer "units" = token × 60000, so a
    * refill rate expressed per minute adds a whole number of units per
    * elapsed millisecond and no FP ever enters an admission decision. */
  final case class BucketState(units: Long, lastMs: Long)
  final case class RateDecision(user_id: Long, event_id: Long,
                                ts: Timestamp, allowed: Boolean,
                                tokens_milli: Long)

  /** Per-key TOKEN-BUCKET RATE LIMITING in a stream — the standard
    * admission-control primitive (RFC 2697-style single-rate bucket):
    * each key holds up to `capacity` tokens, refilled at `refillPerMin`
    * tokens per minute of EVENT time; an event is admitted iff a whole
    * token is available and spends it. In a training-data pipeline this
    * is per-source crawl throttling and per-tenant ingest fairness; the
    * streaming form keeps one O(1) bucket per key in the state store —
    * exactly the state-sharding shape of [[runningUserTotals]], so a
    * 1000-executor job shards buckets like any batch shuffle.
    *
    * Event-time semantics: events are processed in (ts, event_id)
    * order WITHIN a micro-batch; an event arriving with ts behind the
    * bucket's high-water mark refills nothing (elapsed clamps at 0)
    * and the mark never moves backwards — the conservative policy for
    * late data (never grant retroactive tokens). Decisions are pure
    * integer arithmetic, so the spec's sequential driver replay must
    * match bit-for-bit. */
  def streamingRateLimit(events: Dataset[Event], capacity: Long = 3,
      refillPerMin: Long = 2): Dataset[RateDecision] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[BucketState]) =>
          var st = state.getOption
            .getOrElse(BucketState(capacity * 60000L, Long.MinValue))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map {
            e => val (d, next) = bucketDecide(st, e, capacity, refillPerMin)
                 st = next; d
          }
          state.update(st)
          out.iterator
      }
  }

  /** One admission decision — shared verbatim by the streaming operator
    * and the spec's sequential replay (the [[streamingHeavyHitters]]
    * shared-fold discipline). */
  private[graft] def bucketDecide(st: BucketState, e: Event,
      capacity: Long, refillPerMin: Long): (RateDecision, BucketState) = {
    val capU = capacity * 60000L
    val now = e.ts.getTime
    val refill =
      if (st.lastMs == Long.MinValue) 0L
      else math.max(0L, now - st.lastMs) * refillPerMin
    val avail = math.min(capU, st.units + refill)
    val allowed = avail >= 60000L
    val after = if (allowed) avail - 60000L else avail
    (RateDecision(e.user_id, e.event_id, e.ts, allowed, after / 60L),
      BucketState(after, math.max(now, st.lastMs)))
  }

  /** Streaming NEAR-dedup-on-ingest: every arriving micro-batch of
    * (doc_id, text) documents is matched against the persisted corpus
    * [[graft.ops.Dedup.BandIndex]] and the verified matches land in a
    * parquet sink — the production crawl-cycle loop, run continuously
    * instead of per job. `foreachBatch` is the idiomatic shape here
    * ON PURPOSE: the batch operator ([[graft.ops.Dedup.matchBatch]])
    * is reused verbatim per trigger, the corpus index is amortized
    * parquet (zero corpus passes per batch), and the sink write is
    * wrapped in the micro-batch's transactional retry. State is the
    * INDEX ARTIFACT, not stream state — the scoped variant unpersists
    * each trigger's shingle cache after its sink write, so nothing
    * accumulates in executors across triggers. */
  def streamingIncrementalDedup(docs: DataFrame, dir: String,
      sink: String, checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Dedup.matchBatchScoped(batch, batch.sparkSession, dir)(
          _.write.mode("append").parquet(sink))
      }
      // a STABLE checkpoint is what makes the loop restartable: a new
      // run of the same query resumes from the committed source offsets
      // (file-source: the processed-files log) instead of re-matching —
      // pass one in production; the temp default serves one-shot tests
      .option("checkpointLocation", checkpoint.getOrElse(
        java.nio.file.Files.createTempDirectory("graft-incdedup-ckpt").toString))
      .start()

  /** Streaming exact dedup — the ingestion-side twin of
    * [[graft.ops.Dedup.exact]]: arriving records are content-hashed and
    * only the first occurrence within the watermark horizon survives.
    * `dropDuplicatesWithinWatermark` bounds the dedup state (keys older
    * than the watermark are evicted), which is what makes exactly-once
    * ingestion dedup viable on an unbounded stream: state is
    * O(arrival rate × watermark), not O(stream history). Input needs a
    * `ts` event-time column and a `text` payload. */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_sha", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_sha")

  /** Batch anchor of the stream-stream interval join: for every `view`
    * event, the same-user `purchase` events within the hour after it —
    * the attribution/funnel primitive. The range predicate rides the
    * user_id equi-join (per-user groups are bounded, so the in-group
    * scan is cheap and AQE handles skewed users); views with no
    * qualifying purchase survive via the left join with count 0. The
    * value sum routes through decimal so partial-aggregation order
    * cannot perturb the double. */
  def funnelBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"), $"value")
    v.join(p, $"user_id" === $"pu" &&
        $"pts" >= $"view_ts" && $"pts" <= $"view_ts" + expr("INTERVAL 1 HOUR"),
        "left")
      .groupBy($"view_id", $"user_id", $"view_ts")
      .agg(count($"pts").as("n_purchases"),
        coalesce(sum($"value".cast("decimal(18,2)")),
          lit(0).cast("decimal(18,2)")).cast("double").as("purchase_value"))
      .orderBy($"view_id")
      .limit(500)
  }

  val funnelBatchSql: String =
    """WITH v AS (
      |  SELECT user_id, event_id AS view_id, ts AS view_ts
      |  FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id AS pu, ts AS pts, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT view_id, user_id, view_ts,
      |  COUNT(pts) AS n_purchases,
      |  CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))), 0) AS DOUBLE) AS purchase_value
      |FROM v LEFT JOIN p ON user_id = pu
      |  AND pts >= view_ts AND pts <= view_ts + INTERVAL 1 HOUR
      |GROUP BY view_id, user_id, view_ts
      |ORDER BY view_id LIMIT 500""".stripMargin

  /** Stream-stream interval join — the streaming twin of [[funnelBatch]]:
    * two unbounded streams joined on user_id with an event-time range.
    * BOTH sides are watermarked and the join condition bounds event time
    * on both sides, which is what lets Spark EVICT buffered rows: a view
    * can stop waiting once the watermark passes view_ts + 1 h, a
    * purchase once it passes pts. Join state is therefore
    * O(arrival rate × (watermark + interval)) per side — bounded on an
    * unbounded stream — versus the stream-static join's zero state and
    * a naive unwatermarked join's O(history). */
  def streamingFunnelJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("value"))
    v.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("view_ts") &&
        col("pts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .drop("pu")
  }

  /** Stream-static enrichment join: every micro-batch inner-joins the
    * (bounded, slowly-changing) dimension — the standard shape for
    * attaching reference data (type weights, source tiers, routing
    * rules) to an unbounded stream. The static side is broadcast, so
    * each batch is a map-side hash join with NO stateful join state and
    * no stream-side shuffle — unlike stream-stream joins, which buffer
    * both sides in the state store until the watermark clears them. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String = "event_type"): DataFrame =
    events.join(broadcast(dim), Seq(key))

  /** Idempotent micro-batch sink — exactly-once OUTPUT on top of
    * Structured Streaming's at-least-once batch replay. Each micro-batch
    * writes the FULL current aggregate snapshot (complete-mode frame)
    * with `overwrite`, so replaying a batch after a failure rewrites the
    * same content instead of appending duplicates — the standard
    * `foreachBatch` pattern when the sink is plain files rather than a
    * transactional table. The snapshot is small by construction (one row
    * per aggregate key), so the rewrite cost is O(|keys|) per trigger,
    * independent of stream history. */
  def snapshotBatch(batch: DataFrame, path: String): Unit =
    batch.write.mode("overwrite").parquet(path)

  /** Per-type running counts, checkpointed, snapshot-overwritten every
    * trigger via [[snapshotBatch]] — replay-safe end to end: the
    * checkpoint dedups triggers, and even a re-run batch rewrites
    * identical output. */
  def idempotentCountsSink(events: DataFrame, path: String,
                           checkpoint: String) =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: DataFrame, _: Long) => snapshotBatch(df, path))
      .start()

  /** q_stream_disorder entry: out-of-orderness profile per event type —
    * the measurement that SIZES A WATERMARK. For each event, disorder =
    * how far its timestamp lags the maximum timestamp already seen in
    * its user's arrival stream (0 for in-order); the per-type rollup
    * reports how many events a 10-minute watermark would call late and
    * the worst lag a watermark would have to absorb for zero loss.
    *
    * The fixture's ids are time-ordered (a clean export), so arrival
    * order is SIMULATED with a deterministic md5 jitter on the id
    * (events shuffle up to ~20 positions — network-style reordering),
    * identically on both engines; on real ingest the arrival sequence
    * is the ingest offset and the jitter disappears.
    *
    * Scale: arrival ranking and the running max share one exchange
    * keyed on user_id (per-user streams are the unit watermarks act
    * on); the rollup is domain-bounded, all integers (µs). */
  def disorderBatch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val jittered = graft.Tables.t(s, dir, "events")
      .select($"event_type", $"user_id", $"event_id",
        unix_micros($"ts").as("tus"))
      .withColumn("arrival",
        $"event_id" + graft.ops.Hashing.md5Bucket(
          $"event_id".cast("string"), 40) - 20)
    val byArr = Window.partitionBy($"user_id")
      .orderBy($"arrival", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    jittered
      .withColumn("lag_us",
        greatest(coalesce(max($"tus").over(byArr) - $"tus", lit(0L)), lit(0L)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"lag_us" > 0L, 1L).otherwise(0L)).as("n_disordered"),
        sum(when($"lag_us" > 600000000L, 1L).otherwise(0L)).as("n_late_10m"),
        max($"lag_us").as("max_lag_us"))
      .orderBy($"event_type")
  }

  val disorderBatchSql: String =
    """WITH j AS (
      |  SELECT event_type, user_id, event_id, epoch_us(ts) AS tus,
      |    event_id + ('0x' || substr(md5(event_id::VARCHAR), 1, 15))
      |      ::UBIGINT::BIGINT % 40 - 20 AS arrival
      |  FROM events),
      |l AS (
      |  SELECT event_type,
      |    greatest(COALESCE(MAX(tus) OVER (PARTITION BY user_id
      |      ORDER BY arrival, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - tus, 0), 0)
      |      AS lag_us
      |  FROM j)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN lag_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_disordered,
      |  CAST(SUM(CASE WHEN lag_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late_10m,
      |  MAX(lag_us) AS max_lag_us
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q_anomaly_running entry: the BATCH ANCHOR of the streaming Welford
    * anomaly detector — per event type, every event is z-scored against
    * the running mean/variance of all PRIOR events (30-event warmup),
    * and the rollup reports how many crossed |z| > 3. Same semantics
    * the `mapGroupsWithState` stream applies per trigger; anchoring it
    * as a deterministic batch query is what makes the streaming
    * operator oracle-checkable.
    *
    * Exactness: prefix count/sum/sumsq accumulate as DECIMAL(18,2)/
    * DECIMAL(38,4) cumulative windows — exact at any prefix, so each
    * row's z is one fixed IEEE tree over exact inputs; ordering is
    * pinned by (ts, event_id).
    *
    * Scale: one exchange keyed on the type serves all three prefix
    * windows and the final combinable rollup. */
  def anomalyBatch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val x = $"value".cast("decimal(18,2)")
    val scored = graft.Tables.t(s, dir, "events")
      .select($"event_type", $"ts", $"event_id", $"value", x.as("xd"))
      .withColumn("cnt", count($"xd").over(w))
      .withColumn("sx", sum($"xd").over(w))
      .withColumn("sxx", sum(($"xd" * $"xd").cast("decimal(38,4)")).over(w))
      // ANSI mode: divisions only materialize under the warmup guard
      .withColumn("mean_p",
        when($"cnt" >= 30, $"sx".cast("double") / $"cnt"))
      .withColumn("var_p",
        when($"cnt" >= 30,
          ($"sxx".cast("double") - $"sx".cast("double")
            * $"sx".cast("double") / $"cnt") / ($"cnt" - 1)))
      .withColumn("z",
        when($"var_p" > 0.0, ($"value" - $"mean_p") / sqrt($"var_p")))
    scored
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        count($"z").as("n_scored"),
        sum(when(abs($"z") > 3.0, 1L).otherwise(0L)).as("n_anomalies"),
        round(max(abs($"z")), 6).as("max_abs_z"))
      .orderBy($"event_type")
  }

  val anomalyBatchSql: String =
    """WITH p AS (
      |  SELECT event_type, value,
      |    COUNT(CAST(value AS DECIMAL(18,2))) OVER w AS cnt,
      |    SUM(CAST(value AS DECIMAL(18,2))) OVER w AS sx,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2))
      |        * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) OVER w
      |      AS sxx
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT event_type,
      |    CASE WHEN cnt >= 30 THEN
      |      CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
      |          * CAST(sx AS DOUBLE) / cnt) / (cnt - 1) > 0.0
      |      THEN (value - CAST(sx AS DOUBLE) / cnt)
      |        / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
      |            * CAST(sx AS DOUBLE) / cnt) / (cnt - 1))
      |      END
      |    END AS z
      |  FROM p)
      |SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(z) AS n_scored,
      |  CAST(SUM(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_anomalies,
      |  ROUND(MAX(abs(z)), 6) AS max_abs_z
      |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- registry -------------------------------------------------------------

  /** Per-type historical value profile — the static side of
    * [[streamingWindowAnomalies]]: exact decimal power sums collapsed
    * to (event_type, n_g, gmean, gvar). O(types) rows — broadcasts. */
  def typeProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"value".cast("decimal(18,2)")
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_g"),
        sum(x).as("sx"),
        sum((x * x).cast("decimal(38,4)")).as("sxx"))
      .select($"event_type", $"n_g",
        ($"sx".cast("double") / $"n_g").as("gmean"),
        (($"n_g".cast("double") * $"sxx".cast("double") -
          $"sx".cast("double") * $"sx".cast("double")) /
          ($"n_g".cast("double") * ($"n_g" - 1).cast("double"))).as("gvar"))
  }

  /** Window-level anomaly scoring shared by the batch twin and the
    * stream: per (sliding window, type), flag windows whose mean value
    * drifts more than 3 standard errors from the historical profile —
    * the load/revenue drift monitor a pipeline runs over its ingest.
    * All aggregates route through exact decimals; the z comparison is
    * one fixed IEEE tree over those exact inputs on both engines. */
  private def scoreWindows(windowed: DataFrame, profile: DataFrame): DataFrame =
    windowed
      .join(broadcast(profile), "event_type") // O(types) rows — static dim
      .select(col("window_start"), col("event_type"), col("n_events"),
        when(abs(col("wsum").cast("double") / col("n_events") - col("gmean")) >
          lit(3.0) * sqrt(col("gvar") / col("n_events")), 1)
          .otherwise(0).cast("int").as("flagged"))

  private def windowedSums(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("wsum"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("wsum"))

  /** q_anomaly_windows entry: the BATCH TWIN of
    * [[streamingWindowAnomalies]] — 1-day windows sliding every 12 h,
    * each scored against the global per-type profile. Deterministic end
    * to end (decimal sums, pinned expression tree), so the DuckDB
    * oracle can assert the streaming operator's exact finalization
    * semantics via this anchor. Scale: one window exchange + a
    * broadcast profile join — no second pass over events. */
  def windowAnomalyBatch(s: SparkSession, dir: String): DataFrame =
    scoreWindows(windowedSums(t(s, dir, "events")), typeProfile(s, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** The batch twin over an arbitrary events frame — what the streaming
    * spec compares finalized windows against. */
  private[graft] def windowAnomalyBatchOn(events: DataFrame,
      profile: DataFrame): DataFrame =
    scoreWindows(windowedSums(events), profile)

  /** SLIDING disorder × anomaly JOIN (VERDICT r9 item 7a): two
    * watermarked sliding-window aggregations over the SAME event
    * stream — one counting threshold-flagged values (the anomaly leg),
    * one profiling arrival lateness (`arr_ts` vs event time, the
    * disorder leg) — stream-stream joined on (window, event_type).
    * The joined row answers the question neither leg can alone: is an
    * anomaly burst REAL, or an artifact of a disordered-delivery burst
    * (a replaying upstream delivers stale events whose values trip the
    * detector)? Production pipelines gate paging on exactly this
    * late_fraction × flag_rate readout.
    *
    * This deliberately exercises Spark's multi-stateful-operator
    * support (two windowed aggregations + an equality join on the
    * window struct, all in append mode): both legs share one watermark,
    * so a window finalizes in both legs simultaneously and the join
    * emits exactly once per finalized (window, type) — asserted against
    * [[slidingDisorderAnomalyBatchOn]] in the spec, with
    * beyond-watermark rows dropped from BOTH legs consistently. State
    * is O(open windows × types) per leg plus the join buffer of
    * finalized-but-unmatched rows — bounded by the watermark horizon,
    * never stream history. */
  def slidingDisorderAnomalyJoin(events: DataFrame,
      win: String = "1 hour", slide: String = "30 minutes",
      lateThresh: String = "15 minutes", vThresh: Double = 50.0,
      watermark: String = "2 hours"): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    val anom = wm
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") > vThresh).cast("long")).as("n_flagged"))
    val dis = wm
      .groupBy(window(col("ts"), win, slide),
        col("event_type").as("d_type"))
      .agg(sum((col("arr_ts") > col("ts") + expr(s"interval $lateThresh"))
        .cast("long")).as("n_late"))
    anom.join(dis,
        anom("window") === dis("window") &&
          col("event_type") === col("d_type"))
      .select(anom("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_flagged"), col("n_late"),
        round(col("n_flagged").cast("double") / col("n_events"), 6)
          .as("flag_rate"),
        round(col("n_late").cast("double") / col("n_events"), 6)
          .as("late_fraction"))
  }

  /** Batch twin of [[slidingDisorderAnomalyJoin]] over an arbitrary
    * frame — identical expressions, no watermark. */
  private[graft] def slidingDisorderAnomalyBatchOn(events: DataFrame,
      win: String = "1 hour", slide: String = "30 minutes",
      lateThresh: String = "15 minutes", vThresh: Double = 50.0): DataFrame =
    events
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") > vThresh).cast("long")).as("n_flagged"),
        sum((col("arr_ts") > col("ts") + expr(s"interval $lateThresh"))
          .cast("long")).as("n_late"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_flagged"), col("n_late"),
        round(col("n_flagged").cast("double") / col("n_events"), 6)
          .as("flag_rate"),
        round(col("n_late").cast("double") / col("n_events"), 6)
          .as("late_fraction"))

  val windowAnomalySql: String =
    """WITH p AS (
      |  SELECT event_type, COUNT(*) AS n_g,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
      |        AS DECIMAL(38,4))) AS sxx
      |  FROM events GROUP BY event_type),
      |prof AS (
      |  SELECT event_type, CAST(sx AS DOUBLE) / n_g AS gmean,
      |    (CAST(n_g AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      / (CAST(n_g AS DOUBLE) * CAST(n_g - 1 AS DOUBLE)) AS gvar
      |  FROM p),
      |w AS (
      |  SELECT time_bucket(INTERVAL '12 hours', ts) - k * INTERVAL '12 hours'
      |      AS window_start,
      |    event_type, COUNT(*) AS n_events,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS wsum
      |  FROM events, (SELECT UNNEST([0, 1]) AS k)
      |  GROUP BY 1, 2)
      |SELECT w.window_start, w.event_type, w.n_events,
      |  CAST(CASE WHEN abs(CAST(wsum AS DOUBLE) / n_events - gmean)
      |    > 3.0 * sqrt(gvar / n_events) THEN 1 ELSE 0 END AS INT) AS flagged
      |FROM w JOIN prof ON w.event_type = prof.event_type
      |ORDER BY window_start, w.event_type""".stripMargin

  /** Streaming form of [[windowAnomalyBatch]]: watermarked sliding
    * windows stream-static-joined against the broadcast historical
    * profile; Append mode emits each window's verdict exactly once when
    * the watermark passes it. The watermark is what the
    * `q_stream_disorder` profile SIZES: late arrivals within it are
    * folded into their windows before finalization (the spec proves
    * equality with the batch twin under disorder); arrivals beyond it
    * are dropped — bounded state, explicitly surfaced staleness. */
  def streamingWindowAnomalies(events: DataFrame, profile: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    scoreWindows(windowedSums(events.withWatermark("ts", watermark)), profile)

  final case class RateLimitRow(user_id: Long, n_events: Long,
      n_allowed: Long, n_denied: Long, tokens_milli: Long)

  /** q_rate_limit entry: the BATCH ANCHOR of [[streamingRateLimit]] —
    * the same [[bucketDecide]] fold (capacity 3 tokens, refill 2/min of
    * event time), applied per user over the pinned (ts, event_id)
    * order, rolled up to (admitted, denied, final balance). Run on the
    * deterministic 1-in-10 md5 user panel (the audit-panel idiom) so
    * the DuckDB oracle — which must REPLAY the nonlinear clamp
    * recurrence via a recursive CTE, one step per event — stays
    * tractable while still checking every branch of the integer
    * admission arithmetic (clamp at capacity, conditional spend,
    * never-backwards high-water mark).
    *
    * Scale shape: the fold is per-user sequential BY DEFINITION (each
    * decision depends on the previous balance); `mapGroups` shards
    * users across executors exactly like the streaming state store —
    * group state is O(1), group size is per-user activity. Exactness:
    * the bucket is integer units end to end (units = token × 60000),
    * so batch, stream, and oracle agree bit-for-bit. */
  def rateLimitBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .filter(graft.ops.Hashing.md5Long60(concat(lit("rl:"),
        col("user_id").cast("string"))) % 10 === 0)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    ev.groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        var st = BucketState(3 * 60000L, Long.MinValue)
        var n = 0L
        var allowed = 0L
        it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val (d, next) = bucketDecide(st, e, 3, 2)
          st = next
          n += 1
          if (d.allowed) allowed += 1
        }
        RateLimitRow(uid, n, allowed, n - allowed, st.units / 60L)
      }
      .toDF()
      .orderBy(col("user_id"))
  }

  val rateLimitBatchSql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS i,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events
      |  WHERE ('0x' || substr(md5('rl:' || user_id::VARCHAR), 1, 15))
      |    ::UBIGINT::BIGINT % 10 = 0),
      |step AS (
      |  SELECT user_id, CAST(0 AS BIGINT) AS i,
      |    CAST(180000 AS BIGINT) AS units,
      |    CAST(NULL AS BIGINT) AS last_ms,
      |    CAST(0 AS BIGINT) AS n_allowed, n
      |  FROM (SELECT DISTINCT user_id, n FROM ev)
      |  UNION ALL
      |  SELECT user_id, i,
      |    CASE WHEN avail >= 60000 THEN avail - 60000 ELSE avail END,
      |    new_last,
      |    n_allowed + CASE WHEN avail >= 60000 THEN 1 ELSE 0 END,
      |    n
      |  FROM (
      |    SELECT e.user_id, e.i, e.n, s.n_allowed,
      |      least(180000, s.units + CASE WHEN s.last_ms IS NULL THEN 0
      |        ELSE greatest(0, e.ms - s.last_ms) * 2 END) AS avail,
      |      CASE WHEN s.last_ms IS NULL THEN e.ms
      |           ELSE greatest(e.ms, s.last_ms) END AS new_last
      |    FROM step s JOIN ev e ON e.user_id = s.user_id
      |      AND e.i = s.i + 1))
      |SELECT user_id, n AS n_events, n_allowed,
      |  n - n_allowed AS n_denied, units // 60 AS tokens_milli
      |FROM step WHERE i = n ORDER BY user_id""".stripMargin

  /** q_stream_dedup_first entry: BATCH ANCHOR of Structured Streaming's
    * `dropDuplicatesWithinWatermark` — first arrival per
    * (user, event_type) key wins, later duplicates drop. The batch twin
    * selects each key's minimum (ts, event_id) event with one
    * combinable `min(struct(...))` aggregate (never a per-key rank
    * window) and rolls up per type: arrivals vs kept, plus the mean of
    * the KEPT values (which differs from the all-events mean exactly
    * when dedup bites — the column that would catch a
    * keep-last-instead-of-first regression).
    *
    * Scale: two map-side-combinable aggregates, no window, no skew
    * exposure beyond the (user, type) key itself. */
  def dedupFirstBatch(s: SparkSession, dir: String): DataFrame = {
    val kept = t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_dup"),
        min(struct(col("ts"), col("event_id"), col("value"))).as("first"))
    kept.groupBy(col("event_type"))
      .agg(sum(col("n_dup")).cast("long").as("n_events"),
        count(lit(1)).as("n_kept"),
        round(sum(col("first.value").cast("decimal(18,2)")).cast("double")
          / count(lit(1)), 6).as("mean_first_value"))
      .orderBy(col("event_type"))
  }

  val dedupFirstBatchSql: String =
    """WITH k AS (
      |  SELECT user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_dup
      |  FROM events)
      |SELECT event_type, CAST(SUM(n_dup) AS BIGINT) AS n_events,
      |  CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_first_value
      |FROM k WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin

  /** q_stream_session entry: BATCH ANCHOR of the NATIVE
    * `session_window` operator — [[nativeSessionize]] run in batch mode
    * (the same declarative plan Structured Streaming executes with
    * watermark-evicted state), oracled against an independent lag-based
    * gap reconstruction in DuckDB. This is the operator the engine
    * itself owns (dynamic gap-merged windows), so the oracle must
    * re-derive BOTH boundary conventions: sessions break only on
    * gap > 30 min (the merge-on-equal edge the spec pins), and
    * session_end = last event + gap (native windows carry the gap
    * tail; the lag form's MAX(ts) + 30 min reproduces it exactly).
    *
    * Scale shape: one hash exchange on (user_id) with engine-side
    * window merging — no per-user sort window, no state beyond the
    * open session; the 500-row cap keeps the gate artifact bounded
    * while still crossing thousands of merge decisions. */
  def sessionNativeBatch(s: SparkSession, dir: String): DataFrame =
    nativeSessionize(t(s, dir, "events"))
      .orderBy(col("user_id"), col("session_start"))
      .limit(500)

  val sessionNativeBatchSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |b AS (
      |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
      |                 THEN 1 ELSE 0 END AS brk FROM g),
      |sess AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id
      |    ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM b)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start LIMIT 500""".stripMargin

  final case class UserTotalsState(user_id: Long, n_events: Long,
      total_cents: Long, last_ts: Timestamp)

  /** Exact per-event cents under the ORACLE's rounding contract
    * (VERDICT r14 item 5): DuckDB's `CAST(double AS DECIMAL(18,2))`
    * rounds the value's SHORTEST DECIMAL STRING half-up (probed:
    * 0.185 → 0.19 though the binary double is 0.18499…;
    * 1.005 → 1.01), which is `BigDecimal(Double.toString(v))`
    * half-up — NOT `math.round(v*100)`, which rounds the binary
    * product and diverges on 3-dp values (1.005 → 100 vs 101) and
    * negative ties (-2.125 → -212 vs -213). Both engines now round
    * PER EVENT under the same contract, so the fold is exact for any
    * value precision, not just the fixture's 2-dp cents
    * (UserTotalsCentsSpec pins the 3-dp divergence case). */
  private[streaming] def centsOf(v: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** q_stream_user_totals entry: BATCH ANCHOR of [[runningUserTotals]]
    * — the `mapGroupsWithState` running-totals fold run in batch mode,
    * where Spark feeds each key's whole group through the SAME state
    * transition the streaming state store applies per trigger; the
    * final state must equal the plain GROUP BY the oracle runs (the
    * exactly-once convergence contract). Values accumulate as exact
    * integer cents inside the fold (the [[rateLimitBatch]]
    * integer-units idiom) so the fold is iteration-order-independent,
    * and the output stays integer (total_cents) — zero FP anywhere.
    * last_ts rides along as the state-freshness column a monitoring
    * consumer reads.
    *
    * Scale shape: state is one row per user, sharded by the groupBy
    * key exactly like a batch shuffle; group iterators stream (no
    * per-group materialization). */
  def userTotalsBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    ev.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserTotalsState]) =>
          var n = 0L
          var cents = 0L
          // full-precision Timestamp comparison — getTime is
          // millisecond-truncated and the parquet events carry micros
          var last = new Timestamp(0L)
          it.foreach { e =>
            n += 1
            cents += centsOf(e.value)
            if (e.ts.compareTo(last) > 0) last = e.ts
          }
          val prev = state.getOption
            .getOrElse(UserTotalsState(uid, 0L, 0L, new Timestamp(0L)))
          val upd = UserTotalsState(uid, prev.n_events + n,
            prev.total_cents + cents,
            if (prev.last_ts.compareTo(last) > 0) prev.last_ts else last)
          state.update(upd)
          upd
      }
      .toDF()
      .orderBy(col("user_id"))
  }

  val userTotalsBatchSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    AS total_cents,
      |  MAX(ts) AS last_ts
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q_stream_gap_sessions entry: BATCH ANCHOR of [[sessionize]] — the
    * `flatMapGroupsWithState` gap sessionizer run in batch mode, where
    * each user's whole history folds through the VERBATIM streaming
    * state transition. Batch execution never fires event-time
    * timeouts, so the operator emits exactly the GAP-CLOSED sessions
    * and leaves each user's final (open) session in state — the
    * oracle reconstructs sessions from first principles and drops
    * each user's LAST one, pinning precisely the Append-mode emission
    * contract (the timeout path stays pinned by the streaming spec,
    * which drives a watermark past a session end). Two deliberate
    * contract points the oracle mirrors: (1) the operator compares
    * gaps in MILLISECONDS (`Timestamp.getTime`), so the oracle breaks
    * on `epoch_ms` gaps and emits ms-truncated boundaries — a
    * documented divergence from the µs-precision `q_sessionize` lag
    * form; (2) `total_value` is omitted: the fold accumulates doubles
    * in arrival order, and only boundary/count fields are
    * order-independent under same-timestamp ties.
    *
    * Scale shape: state is one open session per user, sharded by the
    * group key like any batch shuffle; the per-group sort is
    * micro-batch-bounded in streaming and per-user-bounded here. */
  def gapSessionsBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import scala.concurrent.duration._
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    sessionize(ev, 30.minutes).toDF()
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events").cast("long").as("n_events"))
      .orderBy(col("user_id"), col("session_start"))
      .limit(500)
  }

  val gapSessionsBatchSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    epoch_ms(ts) - LAG(epoch_ms(ts), 1) OVER w AS gap_ms
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |b AS (
      |  SELECT *, CASE WHEN gap_ms IS NULL OR gap_ms > 30 * 60 * 1000
      |                 THEN 1 ELSE 0 END AS brk FROM g),
      |sess AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id
      |    ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM b),
      |agg AS (
      |  SELECT user_id, sid,
      |    make_timestamp(MIN(epoch_ms(ts)) * 1000) AS session_start,
      |    make_timestamp(MAX(epoch_ms(ts)) * 1000) AS session_end,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM sess GROUP BY user_id, sid),
      |last AS (SELECT user_id, MAX(sid) AS last_sid FROM agg GROUP BY user_id)
      |SELECT a.user_id, a.session_start, a.session_end, a.n_events
      |FROM agg a JOIN last l
      |  ON a.user_id = l.user_id AND a.sid <> l.last_sid
      |ORDER BY a.user_id, a.session_start LIMIT 500""".stripMargin

  private val TokK = 64

  /** q_stream_token_hh entry: BATCH ANCHOR of the
    * [[streamingHeavyHitters]] Misra–Gries state fold, on a stream
    * with REAL skew — the per-source token stream ("which tokens
    * dominate each source right now"). Each source's tokens fold
    * through the verbatim `MisraGries.reduce` transition inside
    * `mapGroupsWithState`, and the FINAL counter set becomes the
    * candidate list for an exact confirmation count (the
    * `q_agg_heavy_hitters` two-pass discipline). The oracle recomputes true per-source heavy
    * hitters from first principles, so the compare IS the MG
    * no-false-negative theorem at k=64: every token above
    * n_source/(k+1) must appear among the fold's counters WHATEVER
    * the fold order — the order-dependent parts of the state (the
    * lower bounds) never reach the output, which is why this anchor
    * is exactly oracle-able while the raw summary is not, and why
    * (unlike the streaming operator, which sorts each micro-batch
    * for replay determinism) the batch fold streams the group
    * iterator AS-IS: materializing + sorting a source's whole token
    * stream per task cost 200 s / 16 s GC at sf10 before this was
    * dropped (r15 measurement), and buys nothing the theorem doesn't
    * already guarantee.
    *
    * Scale shape: O(k) state per source forever; group iterators
    * stream (no per-group materialization); the confirmation pass
    * semi-joins the corpus against ≤ 20·k broadcast candidates and
    * counts only those. */
  def tokenHeavyHittersBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mg = new graft.ops.MisraGries(TokK)
    val toks = t(s, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("token"))
    val cand = toks
      .select($"source".as[String], $"token".as[String])
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[(String, String)],
            state: GroupState[HHState]) =>
          var st = state.getOption.getOrElse(HHState(Map.empty, 0L))
          it.foreach { case (_, tok) =>
            st = HHState(mg.reduce(st.counters, tok), st.n + 1)
          }
          state.update(st)
          (src, st.n, st.counters.keys.toSeq.sorted)
      }
      .toDF("source", "n_source", "cands")
      .select(col("source"), col("n_source"),
        explode(col("cands")).as("token"))
    toks
      .join(broadcast(cand), Seq("source", "token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("n_source")).as("n"))
      .filter(col("n_occurrences") > col("n") / (TokK + 1.0))
      .select(col("source"), col("token"),
        col("n_occurrences").cast("long").as("n_occurrences"),
        round(col("n_occurrences").cast("double") / col("n"), 6)
          .as("frac"))
      .orderBy(col("source"), col("n_occurrences").desc, col("token"))
  }

  val tokenHeavyHittersBatchSql: String =
    s"""WITH tok AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |n AS (SELECT source, COUNT(*) AS n FROM tok GROUP BY 1)
      |SELECT t.source, t.token,
      |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n.n), 6) AS frac
      |FROM tok t JOIN n USING (source)
      |GROUP BY t.source, t.token
      |HAVING COUNT(*) > MAX(n.n) / ${TokK + 1}.0
      |ORDER BY source, n_occurrences DESC, token""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_gap_sessions" -> gapSessionsBatch,
    "q_stream_token_hh" -> tokenHeavyHittersBatch,
    "q_stream_session" -> sessionNativeBatch,
    "q_stream_user_totals" -> userTotalsBatch,
    "q_rate_limit" -> rateLimitBatch,
    "q_stream_dedup_first" -> dedupFirstBatch,
    "q_anomaly_windows" -> windowAnomalyBatch,
    "q_stream_window" -> windowBatch,
    "q_stream_sliding" -> slidingBatch,
    "q_sessionize" -> sessionizeBatch,
    "q_event_funnel" -> funnelBatch,
    "q_stream_disorder" -> disorderBatch,
    "q_anomaly_running" -> anomalyBatch)

  def oracle: Map[String, String] = Map(
    "q_stream_gap_sessions" -> gapSessionsBatchSql,
    "q_stream_token_hh" -> tokenHeavyHittersBatchSql,
    "q_stream_session" -> sessionNativeBatchSql,
    "q_stream_user_totals" -> userTotalsBatchSql,
    "q_rate_limit" -> rateLimitBatchSql,
    "q_stream_dedup_first" -> dedupFirstBatchSql,
    "q_stream_window" -> windowBatchSql,
    "q_anomaly_windows" -> windowAnomalySql,
    "q_stream_sliding" -> slidingBatchSql,
    "q_sessionize" -> sessionizeBatchSql,
    "q_event_funnel" -> funnelBatchSql,
    "q_stream_disorder" -> disorderBatchSql,
    "q_anomaly_running" -> anomalyBatchSql)
}
