package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators — a Spark-native EXTENSION beyond the
  * reference, which has no streaming execution at all (SURVEY §2.10:
  * presto-kafka reads snapshot offset ranges,
  * presto-kafka/.../KafkaRecordSet.java:53; no watermarks or stateful
  * operators exist in presto-main). These transforms work unchanged on a
  * batch DataFrame or a readStream source — the Spark contract.
  *
  * At scale: watermarking bounds state; the windowed agg shuffles on
  * (window, event_type) exactly like its batch twin
  * (EventQueries.ev_tumbling_hourly).
  */
object StreamingOps {

  /** Tumbling-window event counts with late-data handling: watermark
    * `lateness`, window `windowLen`. Schema: like the events fixture
    * (ts timestamp, event_type string, value double).
    */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Per-user session stats via Spark's NATIVE session_window (merging
    * event-time windows — the streaming-first sessionization primitive,
    * vs the lag/running-sum window-function formulation in
    * EventQueries.ev_sessionize). Two events share a session iff their
    * gap is strictly under `gap`; the emitted end is last-event-ts +
    * gap. In streaming mode the watermark both bounds state (closed
    * sessions are evicted) and gates append-mode emission; in batch the
    * same expression runs as a regular merging-window aggregation. At
    * 100 TB: one shuffle on user_id, per-key state is the OPEN sessions
    * only — exactly the bounded-state discipline an always-on
    * sessionizer needs.
    */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "30 minutes", streaming: Boolean = true): DataFrame = {
    val base = if (streaming) events.withWatermark("ts", lateness) else events
    base
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))
  }

  /** Running per-user event counts (complete-mode style aggregation). */
  def perUserCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))

  /** Streaming exact dedup on a fingerprint column with bounded state:
    * dropDuplicatesWithinWatermark keeps a key only until the watermark
    * passes it — the streaming twin of llm_dedup_exact, and the state
    * discipline an always-on ingest dedup needs at 100 TB (an unbounded
    * dropDuplicates state grows with the corpus; this one grows with the
    * lateness window).
    */
  def dedupWithinWatermark(docs: DataFrame, lateness: String = "30 minutes"): DataFrame =
    docs
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Watermarked stream-stream interval join: view→click attribution.
    * Each click pairs with the same user's views in the preceding
    * `attributionWindow`. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark evicts join state
    * past (lateness + window) — the bounded-state discipline an
    * always-on 100 TB attribution pipeline needs. Works identically on
    * a batch DataFrame (the batch twin is oracle-checked as
    * `ev_view_click_attribution`).
    */
  def viewClickAttribution(events: DataFrame,
      attributionWindow: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", lateness)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", lateness)
    clicks.join(views,
      expr(s"c_user = v_user AND v_ts <= c_ts AND c_ts <= v_ts + INTERVAL $attributionWindow"))
      .select(col("c_user").as("user_id"), col("v_ts"), col("c_ts"), col("c_value"))
  }

  /** LEFT OUTER stream-stream interval join: every view emits — joined
    * when a click lands inside the attribution window, with NULL click
    * columns once the watermark proves no click can still arrive. The
    * outer side is what an attribution pipeline actually bills on
    * (unconverted impressions), and the NULL emission is watermark-
    * driven state eviction: a view row is held in the join state only
    * until watermark > v_ts + window + lateness, so state is bounded by
    * the window span at any input rate.
    */
  def viewClickAttributionOuter(events: DataFrame,
      attributionWindow: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", lateness)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", lateness)
    views.join(clicks,
      expr(s"c_user = v_user AND v_ts <= c_ts AND c_ts <= v_ts + INTERVAL $attributionWindow"),
      "leftOuter")
      .select(col("v_user").as("user_id"), col("v_ts"), col("c_ts"), col("c_value"))
  }
}

/** Custom-state streaming: gap-based sessionization via
  * flatMapGroupsWithState (the KeyValueGroupedDataset custom-state path).
  * State is one bounded SessionState per live user key — the 100 TB
  * streaming discipline (no per-event state growth); a closed session is
  * emitted when the next event arrives past the gap, or on processing-
  * time timeout.
  */
object StatefulSessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionStart: Long, lastTs: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, evts: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      var cur = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        cur.foreach { st =>
          closed += Session(userId, new java.sql.Timestamp(st.sessionStart),
            new java.sql.Timestamp(st.lastTs), st.n, st.total)
        }
        state.remove()
        return closed.iterator
      }
      evts.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(st) if t - st.lastTs <= gapMs =>
            cur = Some(SessionState(st.sessionStart, math.max(st.lastTs, t), st.n + 1, st.total + e.value))
          case Some(st) =>
            closed += Session(userId, new java.sql.Timestamp(st.sessionStart),
              new java.sql.Timestamp(st.lastTs), st.n, st.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { st =>
        state.update(st)
        state.setTimeoutDuration(gapMs)
      }
      closed.iterator
    }

    events.groupByKey(_.user_id)(keyEnc)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(fn)
  }
}
