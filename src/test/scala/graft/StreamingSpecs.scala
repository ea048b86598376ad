package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs (stretch beyond reference parity — the
  * reference has no streaming execution, SURVEY §2.10). Drives
  * StreamingOps through a MemoryStream source into a memory sink, the
  * streaming analog of the LocalQueryRunner harness.
  */
class StreamingSpecs extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.engine.Engine.session("local[2]", shufflePartitions = 2)

  override def beforeAll(): Unit = { spark.sparkContext }

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed streaming counts aggregate incrementally with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val query = graft.streaming.StreamingOps.windowedEventCounts(events, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_counts").outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 5.0))
      query.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "view", 1L, 5.0)))

      // late-but-within-watermark event still updates its window
      input.addData((ts("2024-01-01 10:55:00"), "click", 4.0))
      query.processAllAvailable()
      val updated = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(updated.contains(("2024-01-01 10:00:00.0", "click", 3L, 7.0)))
    } finally query.stop()
  }

  test("stream-stream interval join attributes clicks to in-window views") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = graft.streaming.StreamingOps
      .viewClickAttribution(events, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
        (2L, ts("2024-01-01 10:20:00"), 7L, "click", 3.0),   // in window -> joins
        (3L, ts("2024-01-01 11:30:00"), 7L, "click", 4.0),   // 90 min later -> no view
        (4L, ts("2024-01-01 10:10:00"), 8L, "click", 5.0),   // other user, no view
        (5L, ts("2024-01-01 12:30:00"), 7L, "view", 0.0))    // advances both watermarks
      query.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).toString, r.getDouble(3)))
      assert(rows.toSet == Set((7L, "2024-01-01 10:20:00.0", 3.0)))
    } finally query.stop()

    // the same transform on the same data as a plain batch DataFrame
    val batch = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, ts("2024-01-01 10:20:00"), 7L, "click", 3.0),
      (3L, ts("2024-01-01 11:30:00"), 7L, "click", 4.0),
      (4L, ts("2024-01-01 10:10:00"), 8L, "click", 5.0),
      (5L, ts("2024-01-01 12:30:00"), 7L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batchRows = graft.streaming.StreamingOps
      .viewClickAttribution(batch, "30 minutes", "10 minutes").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString, r.getDouble(3)))
    assert(batchRows.toSet == Set((7L, "2024-01-01 10:20:00.0", 3.0)))
  }

  test("streaming dedup drops repeats within the watermark window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, String)]
    val docs = input.toDF().toDF("ts", "fp", "text")
    val query = graft.streaming.StreamingOps.dedupWithinWatermark(docs, "30 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "fpA", "doc a"),
        (ts("2024-01-01 10:01:00"), "fpA", "doc a repeat"),
        (ts("2024-01-01 10:02:00"), "fpB", "doc b"))
      query.processAllAvailable()
      // duplicate fpA inside the window is dropped
      val texts = spark.table("dedup_out").collect().map(_.getString(2)).toSet
      assert(texts == Set("doc a", "doc b"))

      // same fingerprint again within the watermark window: still a dup
      input.addData((ts("2024-01-01 10:10:00"), "fpA", "doc a again"))
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally query.stop()
  }

  // flatMapGroupsWithState also runs on batch Datasets (empty initial
  // state, one invocation per key) — same user code, no streaming
  // runtime. (The streaming run of this operator spins continuous no-data
  // micro-batches under Spark 4.1's state-store maintenance, so the spec
  // drives the batch path; StreamingOps.windowedEventCounts covers the
  // streaming runtime above.)
  test("stateful sessionization closes sessions at gap boundaries (batch-mode state fn)") {
    import graft.streaming.StatefulSessionize._
    import spark.implicits._
    val events = Seq(
      Event(7L, ts("2024-01-01 10:00:00"), 1.0),
      Event(7L, ts("2024-01-01 10:10:00"), 2.0),
      Event(7L, ts("2024-01-01 12:30:00"), 5.0), // > 30 min gap: closes session 1
      Event(9L, ts("2024-01-01 09:00:00"), 4.0)).toDS()
    val sessions = sessionize(events, gapMinutes = 30).collect()
      .map(s => (s.user_id, s.session_start.toString, s.session_end.toString, s.n_events, s.total_value))
    // only CLOSED sessions are emitted (open ones stay in state)
    assert(sessions.toSeq == Seq((7L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 3.0)))
  }

  test("local-file log streams: appended .log files become micro-batches") {
    val dir = new java.io.File("tmp/graft_localfile_stream")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    def writeLog(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        lines.mkString("\n").getBytes)
    def line(t: String, code: Int, uri: String): String =
      s"1995-01-01T$t+00:00\t10.0.0.1\tGET\t$uri\tu1\tcli\t$code\t10\t100\t5\ttok"

    writeLog("http-00-0.log", Seq(
      line("00:00:01", 200, "/a"), line("00:00:02", 404, "/b"),
      line("00:00:03", 200, "/c")))
    val parsed = graft.sources.LocalFileOps.streamHttpRequestLog(spark, dir.toString)
    val query = parsed.groupBy("response_code").count()
      .writeStream.format("memory").queryName("lf_stream").outputMode("complete").start()
    try {
      query.processAllAvailable()
      val first = spark.table("lf_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(first == Map(200L -> 2L, 404L -> 1L))
      // a second file appended by the "server" arrives as a new batch
      writeLog("http-01-0.log", Seq(
        line("03:00:01", 500, "/d"), line("03:00:02", 200, "/e")))
      query.processAllAvailable()
      val second = spark.table("lf_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(second == Map(200L -> 3L, 404L -> 1L, 500L -> 1L))
      // typed parse carries through the stream (timestamp is real)
      assert(parsed.schema("timestamp").dataType.typeName == "timestamp")
    } finally query.stop()
  }

  test("left-outer stream-stream join emits unconverted views with NULLs after watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val query = graft.streaming.StreamingOps.viewClickAttributionOuter(events)
      .writeStream.format("memory").queryName("outer_attr").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
        (ts("2024-01-01 10:05:00"), 1L, "click", 7.0), // converts user 1's view
        (ts("2024-01-01 10:00:00"), 2L, "view", 0.0))  // user 2 never clicks
      query.processAllAvailable()
      // push the watermark far past v_ts + window + lateness so user 2's
      // view can no longer be matched and must be evicted with NULLs
      input.addData(
        (ts("2024-01-01 12:00:00"), 9L, "view", 0.0),
        (ts("2024-01-01 12:00:00"), 9L, "click", 0.0))
      query.processAllAvailable()
      input.addData() // one more batch to flush evicted state into append
      query.processAllAvailable()
      val rows = spark.table("outer_attr").filter($"user_id" < 9).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          Option(r.getTimestamp(2)).map(_.toString).orNull)).toSet
      assert(rows.contains((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0")),
        s"converted view must join its click; got $rows")
      assert(rows.contains((2L, "2024-01-01 10:00:00.0", null)),
        s"unconverted view must emit with NULL click after eviction; got $rows")
    } finally query.stop()
  }

  test("session_window: streaming append emits the same closed sessions as the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:10:00"), 1L, 2.0), // gap 10min -> same session
      (ts("2024-01-01 11:30:00"), 1L, 4.0), // gap 80min -> new session
      (ts("2024-01-01 10:05:00"), 2L, 8.0))
    val sentinel = (ts("2024-01-01 15:00:00"), 99L, 0.0) // advances the watermark
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val query = graft.streaming.StreamingOps.sessionWindowStats(events)
      .writeStream.format("memory").queryName("sess_win").outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      input.addData(sentinel)
      query.processAllAvailable()
      // one more batch so the state store evicts sessions the advanced
      // watermark closed and append emits them
      input.addData()
      query.processAllAvailable()
      val streamed = spark.table("sess_win")
        .filter($"user_id" < 99).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
          r.getLong(3), r.getDouble(4))).toSet
      val batch = graft.streaming.StreamingOps
        .sessionWindowStats((rows :+ sentinel).toDF("ts", "user_id", "value"), streaming = false)
        .filter($"user_id" < 99).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed === batch)
      assert(batch.size === 3) // user 1 splits at the 80-min gap; user 2 has one
      // merged session aggregates both events; end = last ts + gap
      assert(batch.contains((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L, 3.0)))
    } finally query.stop()
  }

  test("streaming transform matches its batch twin on the same data") {
    import spark.implicits._
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:40:00"), "click", 2.0),
      (ts("2024-01-01 11:10:00"), "view", 5.0)).toDF("ts", "event_type", "value")
    val res = graft.streaming.StreamingOps.windowedEventCounts(batch).collect()
    assert(res.length == 2) // same logical result as the streaming run
  }
}
