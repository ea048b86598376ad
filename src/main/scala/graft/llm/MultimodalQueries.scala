package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.{Q, QueryModule}

/** Multimodal-column plumbing (north-star op; no counterpart in the
  * reference, which is purely relational — SURVEY §1.1).
  *
  * Media are opaque `binary` columns + typed metadata. The decode /
  * feature-extract step is a clearly-marked DETERMINISTIC STUB (this
  * container has no image/audio codecs): it derives fake
  * width/height/format from the byte stream. What is REAL and tested is
  * the Spark-side plumbing a production pipeline needs:
  *  - binary column construction + schema (`BinaryType`)
  *  - per-partition batch processing via `mapPartitions` (the Scala
  *    analog of `mapInPandas` batches: one iterator per partition, no
  *    per-row UDF dispatch, bounded memory)
  *  - deterministic feature schema returned as a typed DataFrame
  *
  * At 100 TB: binary payloads partition by size
  * (`spark.sql.files.maxPartitionBytes`); the decode stage is
  * embarrassingly parallel with no shuffle; only the small feature
  * output ever shuffles.
  */
object MultimodalQueries extends QueryModule {

  /** STUB decoder: pretends `bytes` is an encoded image and returns
    * deterministic fake dimensions. A real deployment swaps ONLY this
    * function for a codec call; the pipeline around it is unchanged.
    */
  def stubDecodeImage(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val n = bytes.length
    val width = n % 640 + 1
    val height = n % 480 + 1
    val channels = 3
    val format = (n % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    (width, height, channels, format)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType),
    StructField("b1", IntegerType),
    StructField("b2", IntegerType),
    StructField("b3", IntegerType),
    StructField("b4", IntegerType)))

  def queries: Seq[Q] = Seq(

    // Pure-SQL binary feature extraction (no stub): byte length + header
    // bytes — verifiable against DuckDB blob functions.
    Q("mm_binary_features",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
        |  octet_length(encode(text)) % 640 + 1 AS fake_width,
        |  octet_length(encode(text)) % 480 + 1 AS fake_height
        |FROM documents""".stripMargin) { (s, _) =>
      val bin = encode(col("text"), "UTF-8")
      s.table("documents").select(col("doc_id"),
        length(bin).as("n_bytes"),
        lower(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("header_hex"),
        (length(bin) % 640 + 1).as("fake_width"),
        (length(bin) % 480 + 1).as("fake_height"))
    },

    // mapPartitions batch pipeline over the binary column with the stub
    // decoder. First-4-byte features double as the oracle hook (text is
    // ASCII, so byte k == ascii(char k)).
    Q("mm_decode_pipeline",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  octet_length(encode(text)) % 640 + 1 AS width,
        |  octet_length(encode(text)) % 480 + 1 AS height,
        |  3 AS channels,
        |  CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        |  CASE WHEN length(text) >= 1 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS b1,
        |  CASE WHEN length(text) >= 2 THEN ascii(substr(text, 2, 1)) ELSE 0 END AS b2,
        |  CASE WHEN length(text) >= 3 THEN ascii(substr(text, 3, 1)) ELSE 0 END AS b3,
        |  CASE WHEN length(text) >= 4 THEN ascii(substr(text, 4, 1)) ELSE 0 END AS b4
        |FROM documents""".stripMargin) { (s, _) =>
      val binDf = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      val rowEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
      binDf.mapPartitions { rows =>
        // One iterator per partition = one "batch" — the decode library
        // would be initialized once here, not per row.
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, c, f) = stubDecodeImage(bytes)
          def byteAt(i: Int): Int = if (bytes.length > i) bytes(i).toInt else 0
          Row(docId, bytes.length, w, h, c, f,
            byteAt(0), byteAt(1), byteAt(2), byteAt(3))
        }
      }(rowEnc)
    },

    // Frame sampling — the 1→N row-expansion shape a video pipeline
    // needs: each binary payload ("video") emits up to 4 frame
    // descriptors at 256-byte strides via flatMap inside the same
    // mapPartitions batch (codec initialized once per partition, frames
    // emitted lazily — no per-row dispatch, no giant intermediate
    // array). Frame "features" are the stub byte-at-offset; the oracle
    // replays the stride arithmetic in SQL. At 100 TB the expansion is
    // map-side only; nothing shuffles until frames aggregate.
    Q("mm_frame_sample",
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(f * 256 AS INT) AS frame_offset,
        |  CAST(CASE WHEN octet_length(encode(text)) > f * 256
        |       THEN ascii(substr(text, CAST(f * 256 + 1 AS INT), 1)) ELSE 0 END AS INT) AS fbyte
        |FROM documents,
        |  unnest(range(least(4, octet_length(encode(text)) // 256 + 1))) AS t(f)""".stripMargin) { (s, _) =>
      val frameSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("frame_offset", IntegerType),
        StructField("fbyte", IntegerType)))
      val binDf = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      val rowEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
      binDf.mapPartitions { rows =>
        rows.flatMap { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nFrames = math.min(4, bytes.length / 256 + 1)
          (0 until nFrames).iterator.map { f =>
            val off = f * 256
            Row(docId, f, off, if (bytes.length > off) bytes(off).toInt else 0)
          }
        }
      }(rowEnc)
    })
}
