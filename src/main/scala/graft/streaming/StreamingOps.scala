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

  /** Running per-user event counts (complete-mode style aggregation). */
  def perUserCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
}
