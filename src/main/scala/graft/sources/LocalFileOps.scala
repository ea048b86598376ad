package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** presto-local-file connector slice: the `http_request_log` table over
  * a directory of tab-separated log files.
  *
  * Reference: presto-local-file/.../LocalFileTables.java:113-128 (the
  * fixed 12-column schema, timestamp at ordinal 0, server_address
  * INJECTED by the connector rather than read from the file),
  * LocalFileRecordCursor.java:68-71 (tab splitter, ISO_OFFSET_DATE_TIME
  * timestamps), :316-345 (FilesReader skips a whole file when its first
  * record's timestamp fails the predicate — log files are time-ordered,
  * so the first line bounds the file), DataLocation.java:79-90
  * (directory + filename pattern listing).
  *
  * Spark-native shape: the parse is pure `split('\t')` + casts — all
  * codegen'd column expressions, no UDF — and file-level timestamp
  * pruning happens at PLAN time ([[plannedLogFiles]] reads one line per
  * file, metadata-sized) so the scan never opens a pruned file. At
  * 100 TB of logs the per-file first-record read is O(#files) driver
  * work against a listing, the same planning cost as the reference's
  * split manager; the data path reads only surviving files with
  * ordinary text-source parallelism.
  */
object LocalFileOps {

  /** http_request_log file columns in file order (server_address is
    * injected, not in the file — LocalFileTables.java:121 note). */
  val FileColumns: Seq[String] = Seq(
    "timestamp", "client_address", "method", "request_uri", "user",
    "agent", "response_code", "request_size", "response_size",
    "time_to_last_byte", "trace_token")

  /** Synthesize a deterministic request-log directory from `orders`
    * (the fixture-derived content the oracle can replay): one file per
    * 3-hour bucket of the day, rows time-ordered within each file.
    * Idempotent per (dir contents): rewrites from scratch.
    */
  def writeHttpLogs(spark: SparkSession, dir: String): Unit = {
    val root = new java.io.File(dir)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec); f.delete()
    }
    deleteRec(root)
    root.mkdirs()
    val lines = spark.table("orders").select(
      ((col("o_orderkey") * 7919) % 86400).cast("long").as("secs"),
      concat_ws("\t",
        // ISO_OFFSET_DATE_TIME over a fixed epoch day, UTC
        concat(lit("1995-01-01T"),
          lpad((((col("o_orderkey") * 7919) % 86400) / 3600).cast("int").cast("string"), 2, "0"),
          lit(":"),
          lpad(((((col("o_orderkey") * 7919) % 86400) / 60) % 60).cast("int").cast("string"), 2, "0"),
          lit(":"),
          lpad((((col("o_orderkey") * 7919) % 60)).cast("string"), 2, "0"),
          lit("+00:00")),
        concat(lit("10.0."), (col("o_custkey") % 256).cast("string"), lit("."),
          (col("o_custkey") % 100).cast("string")),
        element_at(array(lit("GET"), lit("POST"), lit("PUT"), lit("DELETE")),
          (col("o_orderkey") % 4).cast("int") + 1),
        concat(lit("/orders/"), col("o_orderkey").cast("string")),
        concat(lit("u"), col("o_custkey").cast("string")),
        lit("graft-cli/1.0"),
        when(col("o_orderkey") % 10 < 7, 200)
          .when(col("o_orderkey") % 10 < 9, 404).otherwise(500).cast("string"),
        (col("o_orderkey") % 1000).cast("string"),
        round(col("o_totalprice") * 100).cast("long").cast("string"),
        (col("o_orderkey") % 500).cast("string"),
        concat(lit("t"), col("o_orderkey").cast("string"))).as("value"))
    // one file per 3-hour bucket, rows sorted by time within the file —
    // the time-ordered layout the reference's file-skip depends on
    val tmp = new java.io.File(root, ".stage")
    lines.withColumn("bucket", (col("secs") / 10800).cast("int"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "secs")
      .select("bucket", "value")
      .write.partitionBy("bucket").text(tmp.toString)
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("bucket="))
      .sortBy(_.getName.stripPrefix("bucket=").toInt)
      .foreach { bdir =>
        val b = bdir.getName.stripPrefix("bucket=").toInt
        Option(bdir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.startsWith("part-"))
          .zipWithIndex.foreach { case (f, i) =>
            java.nio.file.Files.move(f.toPath,
              new java.io.File(root, f"http-$b%02d-$i.log").toPath)
          }
      }
    deleteRec(tmp)
  }

  /** The files a timestamp-lower-bound predicate leaves alive — the
    * reference's first-record file skip (LocalFileRecordCursor.java:
    * 316-345) done at plan time. Files are time-ordered by name and
    * internally sorted, so file i can be skipped when file i+1's first
    * timestamp is still below the bound. Reads ONE line per file.
    */
  def plannedLogFiles(dir: String, minTs: Option[java.time.OffsetDateTime]): Seq[java.io.File] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".log")).sortBy(_.getName).toSeq
    minTs match {
      case None => files
      case Some(bound) =>
        val firstTs = files.map { f =>
          val src = scala.io.Source.fromFile(f)
          try java.time.OffsetDateTime.parse(src.getLines().next().split("\t")(0))
          finally src.close()
        }
        files.zipWithIndex.filter { case (_, i) =>
          // keep file i unless the NEXT file still starts before the
          // bound (then everything in file i is below it too)
          i + 1 >= files.length || !firstTs(i + 1).isBefore(bound)
        }.map(_._1)
    }
  }

  /** Read http_request_log with optional timestamp lower bound (file
    * pruning) — typed columns per LocalFileTables.java, all-native
    * split/cast parse, server_address injected.
    */
  def readHttpRequestLog(spark: SparkSession, dir: String,
      serverAddress: String = "localhost:8080",
      minTs: Option[java.time.OffsetDateTime] = None): DataFrame = {
    val files = plannedLogFiles(dir, minTs)
    val raw =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType))))
      else spark.read.text(files.map(_.toString): _*)
    parseLog(raw, serverAddress)
  }

  /** STREAMING read of the log directory — new .log files appended by a
    * live server become micro-batches (Spark's FileStreamSource watches
    * the glob; the reference's connector re-lists the directory per
    * query, this is its continuous analog). Same typed parse; callers
    * add watermarks/windows downstream.
    */
  def streamHttpRequestLog(spark: SparkSession, dir: String,
      serverAddress: String = "localhost:8080"): DataFrame =
    parseLog(spark.readStream.text(s"$dir/*.log"), serverAddress)

  /** Typed columns per LocalFileTables.java — all-native split/cast
    * parse, server_address injected. Shared by batch + streaming. */
  private def parseLog(raw: DataFrame, serverAddress: String): DataFrame = {
    val f = split(col("value"), "\t")
    raw.select(
      lit(serverAddress).as("server_address"),
      // ISO_OFFSET_DATE_TIME; the writer emits +00:00 and the session is
      // UTC, so 'T'->' ' + offset strip parses with the default format.
      // (A quoted-literal pattern trips Spark's formatter tokenizer.)
      to_timestamp(regexp_replace(substring(element_at(f, 1), 1, 19),
        "T", " ")).as("timestamp"),
      element_at(f, 2).as("client_address"),
      element_at(f, 3).as("method"),
      element_at(f, 4).as("request_uri"),
      element_at(f, 5).as("user"),
      element_at(f, 6).as("agent"),
      element_at(f, 7).cast("long").as("response_code"),
      element_at(f, 8).cast("long").as("request_size"),
      element_at(f, 9).cast("long").as("response_size"),
      element_at(f, 10).cast("long").as("time_to_last_byte"),
      element_at(f, 11).as("trace_token"))
  }
}
