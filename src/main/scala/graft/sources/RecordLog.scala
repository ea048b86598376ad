package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record-decoder connector slice — the Kafka connector family without a
  * network (reference: presto-kafka/.../KafkaRecordSet.java:53 cursor
  * over a partition segment, KafkaSplitManager.java one split per
  * segment range, KafkaInternalFieldDescription.java:42-92 internal
  * columns; presto-record-decoder json/csv/raw RowDecoders —
  * JsonRowDecoder.java:75-83 slash-path field mapping,
  * CsvRowDecoder.java positional mapping, RawColumnDecoder.java
  * byte-range + endian format mapping).
  *
  * The zero-egress sandbox cannot run a broker, so the broker-side
  * surface is a FILE-BACKED OFFSET LOG with Kafka's segment layout:
  *
  *   <dir>/<topic>-p<P>/segment-<startOffset>-<endOffset>.log
  *
  * each segment holding length-prefixed (offset, key, message) records.
  * Everything downstream of the fetch is the real connector logic and
  * is identical to what would run against a broker:
  *
  *  - SPLITS: one split per (partition, segment) — planned driver-side
  *    from directory metadata only. An offset-range predicate prunes
  *    whole segments by their file-name range before any byte is read
  *    (the Kafka split manager's segment pruning; spec-pinned).
  *  - CURSOR: each split opens its one segment and streams records,
  *    applying the exact record-level offset filter — executor-side
  *    mapPartitions, memory O(1 record).
  *  - INTERNAL COLUMNS: _partition_id, _partition_offset, _segment_start,
  *    _segment_end, _key, _message, _key_length, _message_length — the
  *    reference's KafkaInternalFieldDescription names.
  *  - DECODERS: payload bytes -> typed columns. json and csv ride
  *    Spark's codegen'd from_json/from_csv (the Spark-first move — the
  *    reference hand-walks Jackson trees); a slash path like "d/price"
  *    maps to nested field access. raw is a byte-range decoder
  *    (start:end:FORMAT big-endian, VARCHAR = UTF-8 slice) as a UDF —
  *    no Spark builtin slices binary to numerics.
  *
  * Scale: splits fan out across executors exactly like Kafka partitions
  * + segments; a 1000-segment topic is a 1000-task scan. Decoding is
  * per-row map-side work inside whole-stage codegen (json/csv).
  */
/** Executor-side Avro schema cache (Schema parse once per JVM per
  * schema text; readers are per-call, they are not thread-safe). */
private[graft] object AvroSchemas {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.avro.Schema]()
  def parse(json: String): org.apache.avro.Schema =
    cache.computeIfAbsent(json, j => new org.apache.avro.Schema.Parser().parse(j))
}

object RecordLog {

  // ---- fixture writer (the "broker": segmented offset log on disk) ----

  /** Append `records` (offset, key, message) as the segment files of one
    * partition, `segmentSize` offsets per segment. Offsets must be
    * strictly increasing within the partition. */
  def writePartition(dir: String, topic: String, partition: Int,
      records: Seq[(Long, Array[Byte], Array[Byte])], segmentSize: Int): Unit = {
    val pDir = new java.io.File(dir, s"$topic-p$partition")
    pDir.mkdirs()
    records.grouped(segmentSize).foreach { seg =>
      val (lo, hi) = (seg.head._1, seg.last._1)
      val f = new java.io.File(pDir, s"segment-$lo-$hi.log")
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f)))
      try seg.foreach { case (off, key, msg) =>
        out.writeLong(off)
        out.writeInt(if (key == null) -1 else key.length)
        if (key != null) out.write(key)
        out.writeInt(if (msg == null) -1 else msg.length)
        if (msg != null) out.write(msg)
      } finally out.close()
    }
  }

  /** Fixture helper: one GenericRecord as an Avro data-file byte[] (the
    * container format the reference's DataFileStream decodes). */
  def avroDataFile(schemaJson: String)(
      fill: org.apache.avro.generic.GenericData.Record => Unit): Array[Byte] = {
    val schema = AvroSchemas.parse(schemaJson)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    fill(rec)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, bos)
    w.append(rec)
    w.close()
    bos.toByteArray
  }

  // ---- split planning + cursor ----

  private case class Split(partition: Int, path: String, segStart: Long, segEnd: Long)

  val schema: StructType = StructType(Seq(
    StructField("_partition_id", LongType, nullable = false),
    StructField("_partition_offset", LongType, nullable = false),
    StructField("_segment_start", LongType, nullable = false),
    StructField("_segment_end", LongType, nullable = false),
    StructField("_key", BinaryType, nullable = true),
    StructField("_message", BinaryType, nullable = true),
    StructField("_key_length", LongType, nullable = false),
    StructField("_message_length", LongType, nullable = false)))

  private val segmentRe = """segment-(\d+)-(\d+)\.log""".r

  /** Plan the splits for `topic`, pruning segments entirely outside
    * [offsetMin, offsetMax] from METADATA (file names) only. */
  private def planSplits(dir: String, topic: String,
      offsetMin: Long, offsetMax: Long): Seq[Split] = {
    val base = new java.io.File(dir)
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$topic-p"))
      .flatMap { pDir =>
        val p = pDir.getName.stripPrefix(s"$topic-p").toInt
        Option(pDir.listFiles()).getOrElse(Array.empty).flatMap { f =>
          f.getName match {
            case segmentRe(lo, hi) =>
              val (l, h) = (lo.toLong, hi.toLong)
              // segment pruning: skip ranges disjoint from the predicate
              if (h < offsetMin || l > offsetMax) None
              else Some(Split(p, f.getAbsolutePath, l, h))
            case _ => None
          }
        }
      }.toSeq.sortBy(s => (s.partition, s.segStart))
  }

  /** Number of segments a range scan would open (the pruning contract,
    * pinned by spec). */
  def plannedSegments(dir: String, topic: String,
      offsetMin: Long = Long.MinValue, offsetMax: Long = Long.MaxValue): Int =
    planSplits(dir, topic, offsetMin, offsetMax).size

  /** Scan `topic` as a DataFrame of internal columns, reading only the
    * segments intersecting [offsetMin, offsetMax] and applying the
    * exact offset filter record-level inside each split. */
  def readTopic(spark: SparkSession, dir: String, topic: String,
      offsetMin: Long = Long.MinValue, offsetMax: Long = Long.MaxValue): DataFrame = {
    val splits = planSplits(dir, topic, offsetMin, offsetMax)
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(1, splits.size))
      .flatMap { s =>
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(s.path)))
        new Iterator[Row] {
          private var nextRow: Row = advance()
          private def advance(): Row = {
            try {
              while (true) {
                val off =
                  try in.readLong()
                  catch { case _: java.io.EOFException => in.close(); return null }
                val kLen = in.readInt()
                val key = if (kLen < 0) null else { val b = new Array[Byte](kLen); in.readFully(b); b }
                val mLen = in.readInt()
                val msg = if (mLen < 0) null else { val b = new Array[Byte](mLen); in.readFully(b); b }
                if (off >= offsetMin && off <= offsetMax)
                  return Row(s.partition.toLong, off, s.segStart, s.segEnd, key, msg,
                    (if (key == null) 0L else key.length.toLong),
                    (if (msg == null) 0L else msg.length.toLong))
              }
              null // unreachable
            } catch { case e: Throwable => in.close(); throw e }
          }
          def hasNext: Boolean = nextRow != null
          def next(): Row = { val r = nextRow; nextRow = advance(); r }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---- decoders: payload bytes -> typed columns ----

  /** json decoder (JsonRowDecoder): `fields` maps output name ->
    * (slash path, SQL type). One from_json pass per row, then nested
    * field extraction — stays inside whole-stage codegen. */
  def decodeJson(df: DataFrame, fields: Seq[(String, String, String)]): DataFrame = {
    // Build a nested schema from the slash paths so from_json parses
    // exactly the referenced subtree.
    def insert(tree: Map[String, Any], path: List[String], tpe: String): Map[String, Any] =
      path match {
        case leaf :: Nil => tree + (leaf -> tpe)
        case node :: rest =>
          val sub = tree.get(node) match {
            case Some(m: Map[String @unchecked, Any @unchecked]) => m
            case _ => Map.empty[String, Any]
          }
          tree + (node -> insert(sub, rest, tpe))
        case Nil => tree
      }
    def render(tree: Map[String, Any]): String =
      tree.toSeq.sortBy(_._1).map {
        case (k, leaf: String) => s"`$k` $leaf"
        case (k, sub: Map[String @unchecked, Any @unchecked]) => s"`$k` STRUCT<${render(sub)}>"
      }.mkString(", ")
    val tree = fields.foldLeft(Map.empty[String, Any]) { case (t, (_, path, tpe)) =>
      insert(t, path.split('/').filter(_.nonEmpty).toList, tpe)
    }
    val parsed = from_json(col("_message").cast("string"), lit(render(tree)), new java.util.HashMap[String, String]())
    val cols = fields.map { case (name, path, _) =>
      path.split('/').filter(_.nonEmpty)
        .foldLeft(parsed)((c, step) => c.getField(step)).as(name)
    }
    df.select(df.columns.map(col).toSeq ++ cols: _*)
  }

  /** Temporal field decoders for json payloads — the per-field
    * `dataFormat` dispatch of JsonRowDecoderFactory.java:65-78, the
    * decoder surface real Kafka topics (epoch-millis timestamps
    * everywhere) hit first:
    *
    *   - "iso8601"                    ISO8601JsonFieldDecoder: full
    *     ISO_DATE_TIME text (optional seconds/fraction/offset/[zone]),
    *     read as EPOCH_DAY+MILLI_OF_DAY — a trailing offset is
    *     parsed-and-IGNORED for TIMESTAMP (sessions here run UTC so
    *     to_timestamp of the zone-free core is that same map)
    *   - "rfc2822"                    RFC2822JsonFieldDecoder: the
    *     reference's "EEE MMM dd HH:mm:ss Z yyyy" English-locale
    *     pattern (what it calls rfc2822 — Twitter's created_at shape)
    *   - "seconds-since-epoch"        SecondsSinceEpochJsonFieldDecoder:
    *     integral node or numeric text, x1000 to millis
    *   - "milliseconds-since-epoch"   MillisecondsSinceEpochJsonFieldDecoder
    *   - "custom-date-time"           CustomDateTimeJsonFieldDecoder:
    *     caller-supplied pattern via the formatHint (mapped to Java
    *     time patterns; the reference takes joda, same syntax for the
    *     letters this engine accepts)
    *   - ""                           DefaultJsonFieldDecoder — plain
    *     cast, decodeJson's existing behavior
    *
    * `fields` maps output name -> (slash path, dataFormat, formatHint).
    * Output columns are TIMESTAMP. Error contract: a present-but-
    * unparseable value RAISES the reference's
    * DECODER_CONVERSION_NOT_SUPPORTED text ("could not parse value
    * '<v>' as '<type>' for column '<name>'") instead of silently
    * nulling — FieldValueProvider throws, a row can't quietly drop its
    * timestamp. Missing/null nodes stay NULL (isNull in the
    * reference). Everything is from_json + codegen'd conditional
    * expressions: one parse pass, no UDFs, whole-stage codegen. */
  def decodeJsonTime(df: DataFrame,
      fields: Seq[(String, String, String, String)]): DataFrame = {
    // parse every referenced path as STRING once (numeric nodes read
    // back as their literal text, exactly asText())
    val base = decodeJson(df, fields.map { case (n, p, _, _) => (n, p, "STRING") })
    val out = fields.foldLeft(base) { case (d, (name, _, dataFormat, hint)) =>
      val raw = col(name)
      def failUnless(parsed: Column): Column =
        when(raw.isNull, lit(null).cast("timestamp"))
          // a {…}/[…] node is not a value node: the reference raises the
          // distinct "non-value node" text before ever looking at the
          // characters (FieldValueProvider.getLong's isValueNode guard).
          // from_json hands back the raw node text for a STRING field, so
          // the leading brace discriminates. (Known corner: a json STRING
          // whose content itself starts with '{' — the reference would
          // give the value-text error; indistinguishable post-extract and
          // both raise DECODER_CONVERSION_NOT_SUPPORTED.)
          .when(raw.rlike("^\\s*[\\[{]"), raise_error(lit(
            s"could not parse non-value node as 'timestamp' for column '$name'"))
            .cast("timestamp"))
          .when(parsed.isNull, raise_error(format_string(
            s"could not parse value '%s' as 'timestamp' for column '$name'", raw))
            .cast("timestamp"))
          .otherwise(parsed)
      // try_* variants null (never throw) on malformed input under any
      // ANSI setting, so the raised error is always the reference's text
      def tryLong: Column = raw.try_cast(LongType)
      val decoded = dataFormat match {
        case "iso8601" =>
          // ISO_DATE_TIME semantics (ISO8601JsonFieldDecoder.java:107-109):
          // for TIMESTAMP the reference parses the full ISO form — hour:
          // minute with optional seconds, an optional fraction of 1-9
          // digits (after seconds only), an optional offset Z/+HH[:mm[:ss]]
          // with an optional [zone] suffix — then reads ONLY
          // EPOCH_DAY+MILLI_OF_DAY: the offset is parsed-and-IGNORED
          // ("…09:20:11", "…09:20:11Z" and "…09:20:11+10:00" all decode to
          // the same local instant, TestISO8601JsonFieldDecoder.java:35-37).
          // One regex shape-validates and splits core/fraction; the
          // zone-free core parses with an optional-seconds pattern; the
          // fraction is truncated to millis (MILLI_OF_DAY semantics).
          // the [zone] suffix stands alone in ISO_DATE_TIME's grammar
          // (optional offset THEN optional bracketed zone), so it is
          // accepted after Z, after a numeric offset, or with no offset
          // at all ("…T09:20:11Z[UTC]", "…T09:20:11[Europe/Paris]")
          val isoRe = "^(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}(?::\\d{2})?)" +
            "(?:(?<=:\\d{2}:\\d{2})\\.(\\d{1,9}))?" +
            "(?:Z|[+-]\\d{2}(?::\\d{2}(?::\\d{2})?)?)?(?:\\[[^\\]]+\\])?$"
          val core = regexp_extract(raw, isoRe, 1)
          val frac = regexp_extract(raw, isoRe, 2)
          val baseTs = try_to_timestamp(core, lit("yyyy-MM-dd'T'HH:mm[:ss]"))
          val fracMs = when(frac === "", lit(0L))
            .otherwise(substring(rpad(frac, 3, "0"), 1, 3).cast(LongType))
          failUnless(when(core === "", lit(null).cast("timestamp"))
            .otherwise(timestamp_millis(unix_millis(baseTs) + fracMs)))
        case "rfc2822" =>
          // Joda "EEE MMM dd HH:mm:ss Z yyyy" (RFC2822JsonFieldDecoder.
          // java:51), English locale, UTC — and unlike the ISO TIMESTAMP
          // path the offset IS applied ("15:15:19 +02:00" == "13:15:19" Z,
          // TestRFC2822JsonFieldDecoder.java:40). Joda's Z parse token
          // accepts a literal "Z" (test :38), colon and compact numeric
          // offsets, and rejects zone NAMES (:65-66). Spark's corrected-
          // mode formatter refuses day-of-week letters when parsing and
          // its Z letter is numeric-only, so: require-and-strip the
          // (redundant — joda lets the absolute fields win) dow token,
          // normalize the zone token to the XXX-parseable +HH:mm form,
          // parse. A missing/unknown dow, missing zone, or zone name all
          // fall through to the raised conversion error.
          val dowStripped = regexp_replace(raw,
            "^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun) ", "")
          val zoneNorm = regexp_replace(regexp_replace(regexp_replace(
            dowStripped,
            " ([+-]\\d{2}):?(\\d{2}) ", " $1:$2 "),
            " ([+-]\\d{2}) ", " $1:00 "),
            " Z ", " +00:00 ")
          val shaped = when(raw.rlike("^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun) "), zoneNorm)
          failUnless(try_to_timestamp(shaped, lit("MMM dd HH:mm:ss XXX yyyy")))
        case "seconds-since-epoch" =>
          failUnless(when(tryLong.isNull, lit(null).cast("timestamp"))
            .otherwise(timestamp_seconds(tryLong)))
        case "milliseconds-since-epoch" =>
          failUnless(when(tryLong.isNull, lit(null).cast("timestamp"))
            .otherwise(timestamp_millis(tryLong)))
        case "custom-date-time" =>
          require(hint != null && hint.nonEmpty,
            s"format hint not defined for column '$name'") // CustomDateTimeJsonFieldDecoder checkArgument
          failUnless(try_to_timestamp(raw, lit(hint)))
        case "" => raw.cast("timestamp")
        case other =>
          throw new IllegalArgumentException(s"unknown data format: $other")
      }
      d.withColumn(name, decoded)
    }
    out
  }

  /** csv decoder (CsvRowDecoder): positional mapping. `fields` maps
    * output name -> (0-based index, SQL type). */
  def decodeCsv(df: DataFrame, fields: Seq[(String, Int, String)]): DataFrame = {
    val n = fields.map(_._2).max + 1
    val csvSchema = (0 until n).map(i => s"_c$i STRING").mkString(", ")
    val parsed = from_csv(col("_message").cast("string"), lit(csvSchema),
      new java.util.HashMap[String, String]())
    val cols = fields.map { case (name, idx, tpe) =>
      parsed.getField(s"_c$idx").cast(tpe).as(name)
    }
    df.select(df.columns.map(col).toSeq ++ cols: _*)
  }

  /** Container decodes per executor JVM — the single-parse contract's
    * measurement channel: decodeAvro opens exactly ONE DataFileStream
    * per row regardless of how many fields it extracts (spec-pinned).
    * A plain static counter, not an accumulator: local-mode specs read
    * it directly, and it stays out of the task-metrics hot path.
    */
  val avroContainerDecodes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** avro decoder (AvroRowDecoder.java:59-66): each payload is an Avro
    * DATA FILE (schema-embedded container, exactly what the reference's
    * DataFileStream expects); the first record is decoded and `fields`
    * maps output name -> (slash path, SQL type in LONG/DOUBLE/STRING/
    * BOOLEAN). Uses avro-core's GenericDatumReader — the published
    * generic-record API, no codegen classes.
    *
    * Decode-once shape (r8 finding): the container is parsed ONE time
    * per row and all M requested paths are pulled off that one
    * GenericRecord — the reference's AvroRowDecoder does exactly this
    * (decode once, hand every column the same record). The earlier
    * one-UDF-per-field version re-parsed the whole container M times
    * per row: M x the decode CPU at any scale. A mapPartitions kernel
    * rather than a struct UDF because the row schema is dynamic
    * (Spark's typed scala UDFs can't return a runtime-shaped struct
    * without the legacy untyped-UDF escape hatch) and it also hoists
    * the reader-schema parse to once per partition instead of per row.
    */
  def decodeAvro(df: DataFrame, readerSchemaJson: String,
      fields: Seq[(String, String, String)]): DataFrame = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    def sqlType(tpe: String): DataType = tpe.toUpperCase match {
      case "LONG" | "BIGINT" => LongType
      case "DOUBLE" => DoubleType
      case "BOOLEAN" => BooleanType
      case "STRING" | "VARCHAR" => StringType
      case "TIMESTAMP" => TimestampType
      case "DATE" => DateType
      case other => throw new IllegalArgumentException(s"unsupported avro target type: $other")
    }
    val outSchema = StructType(
      df.schema.fields ++ fields.map { case (name, _, tpe) =>
        StructField(name, sqlType(tpe), nullable = true)
      })
    val msgIdx = df.schema.fieldIndex("_message")
    val fieldSpecs = fields.map { case (_, path, tpe) =>
      (path.split('/').filter(_.nonEmpty).toSeq, tpe.toUpperCase)
    }
    df.mapPartitions { it =>
      // Reader schema parsed once per partition, not per row/field.
      val parsedSchema = AvroSchemas.parse(readerSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](parsedSchema)
      // Avro logical types (timestamp-millis / timestamp-micros / date)
      // are schema annotations on the primitive long/int — resolve each
      // requested path's annotation once per partition so TIMESTAMP/DATE
      // targets decode the annotated unit (the reference's Kafka avro
      // column decoders surface these logical temporal types; a bare
      // long decoding to TIMESTAMP defaults to millis).
      def unwrapUnion(s: org.apache.avro.Schema): org.apache.avro.Schema =
        if (s.getType == org.apache.avro.Schema.Type.UNION) {
          import scala.jdk.CollectionConverters._
          s.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL).getOrElse(s)
        } else s
      def logicalTypeAt(path: Seq[String]): Option[String] = {
        var s = parsedSchema
        path.foreach { step =>
          s = unwrapUnion(s)
          if (s.getType != org.apache.avro.Schema.Type.RECORD) return None
          val f = s.getField(step)
          if (f == null) return None
          s = f.schema()
        }
        Option(unwrapUnion(s).getProp("logicalType"))
      }
      val logicals: Seq[Option[String]] =
        fieldSpecs.map { case (path, _) => logicalTypeAt(path) }
      def navigate(rec: GenericRecord, path: Seq[String]): Any = {
        var cur: Any = rec
        path.foreach { step =>
          cur = cur match {
            case r: GenericRecord => r.get(step)
            case _ => null
          }
        }
        cur
      }
      def convert(v: Any, tpe: String, logical: Option[String]): Any = tpe match {
        case "LONG" | "BIGINT" => v match {
          case n: Number => java.lang.Long.valueOf(n.longValue()); case _ => null
        }
        case "DOUBLE" => v match {
          case n: Number => java.lang.Double.valueOf(n.doubleValue()); case _ => null
        }
        case "BOOLEAN" => v match { case b: java.lang.Boolean => b; case _ => null }
        case "TIMESTAMP" => v match {
          case n: Number =>
            val x = n.longValue()
            val instant =
              if (logical.contains("timestamp-micros"))
                java.time.Instant.ofEpochSecond(
                  java.lang.Math.floorDiv(x, 1000000L),
                  java.lang.Math.floorMod(x, 1000000L) * 1000L)
              else java.time.Instant.ofEpochMilli(x) // timestamp-millis or bare long
            java.sql.Timestamp.from(instant) // RowEncoder's TimestampType external type
          case _ => null
        }
        case "DATE" => v match {
          // valueOf(LocalDate) + fromJavaDate round-trip through the JVM
          // zone consistently: the y/m/d fields survive unchanged
          case n: Number => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.longValue()))
          case _ => null
        }
        case _ => if (v == null) null else v.toString
      }
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](msgIdx)
        val rec: GenericRecord =
          if (bytes == null) null
          else {
            avroContainerDecodes.incrementAndGet()
            val dfs = new org.apache.avro.file.DataFileStream[GenericRecord](
              new java.io.ByteArrayInputStream(bytes), reader)
            try { if (dfs.hasNext) dfs.next() else null } finally dfs.close()
          }
        val extracted = fieldSpecs.zip(logicals).map { case ((path, tpe), logical) =>
          if (rec == null) null else convert(navigate(rec, path), tpe, logical)
        }
        Row.fromSeq(row.toSeq ++ extracted)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** raw decoder (RawColumnDecoder): big-endian byte-range mapping
    * "start:end:FORMAT" with FORMAT in BYTE/SHORT/INT/LONG/FLOAT/DOUBLE/
    * VARCHAR. */
  private def rawField(bytes: Array[Byte], start: Int, end: Int, format: String): Any = {
    if (bytes == null || end > bytes.length) return null
    val bb = java.nio.ByteBuffer.wrap(bytes, start, end - start)
    format match {
      case "BYTE" => bb.get().toLong
      case "SHORT" => bb.getShort().toLong
      case "INT" => bb.getInt().toLong
      case "LONG" => bb.getLong()
      case "FLOAT" => bb.getFloat().toDouble
      case "DOUBLE" => bb.getDouble()
      case "VARCHAR" => new String(bytes, start, end - start, java.nio.charset.StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(s"unknown raw format: $other")
    }
  }

  def decodeRaw(df: DataFrame, fields: Seq[(String, String)]): DataFrame = {
    val cols = fields.map { case (name, mapping) =>
      val Array(s, e, fmt) = mapping.split(':')
      val (start, end, format) = (s.toInt, e.toInt, fmt.toUpperCase)
      val u = format match {
        case "FLOAT" | "DOUBLE" =>
          udf((b: Array[Byte]) => rawField(b, start, end, format).asInstanceOf[java.lang.Double])
        case "VARCHAR" =>
          udf((b: Array[Byte]) => rawField(b, start, end, format).asInstanceOf[String])
        case _ =>
          udf((b: Array[Byte]) => rawField(b, start, end, format).asInstanceOf[java.lang.Long])
      }
      u(col("_message")).as(name)
    }
    df.select(df.columns.map(col).toSeq ++ cols: _*)
  }
}
