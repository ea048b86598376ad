package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.{Q, QueryModule}

/** Multimodal-column plumbing (north-star op; no counterpart in the
  * reference, which is purely relational — SURVEY §1.1).
  *
  * Media are opaque `binary` columns + typed metadata. Since r7 the
  * decode step is REAL: deterministic PNGs are rendered and encoded
  * into the binary column on the executors, then decoded back through
  * `javax.imageio` (the JDK's actual PNG codec — no external library)
  * inside the same mapPartitions batch shape a production pipeline
  * uses; pixel stats of the decoded raster are the oracle hook. The
  * Spark-side plumbing under test:
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

  /** Render the deterministic test image for `doc_id` and return its
    * PNG encoding: w×h RGB, gray value (doc_id + 7x + 13y) % 256 at
    * pixel (x, y). The closed form is what the DuckDB oracle replays.
    */
  def encodePng(docId: Long): Array[Byte] = {
    val w = (docId % 13 + 4).toInt
    val h = (docId % 11 + 3).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId + 7L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

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

    // Real encode -> binary column -> real decode pipeline: stage 1
    // renders the deterministic image and PNG-encodes it into a
    // BinaryType column (executor-side, no driver round-trip); stage 2
    // decodes those bytes back through javax.imageio in a mapPartitions
    // batch and emits raster stats. The oracle never sees a PNG — it
    // replays the closed-form pixel function (doc_id + 7x + 13y) % 256
    // over the w*h lattice in SQL, so any codec/roundtrip corruption
    // (dimensions, band count, any single pixel of the sum) fails hash.
    Q("mm_decode_pipeline",
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 13 + 4 AS INT) AS width,
        |    CAST(doc_id % 11 + 3 AS INT) AS height
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, width, height, x.f AS xi, y.f AS yi,
        |    CAST((doc_id + 7 * x.f + 13 * y.f) % 256 AS BIGINT) AS v
        |  FROM dims, unnest(range(width)) AS x(f), unnest(range(height)) AS y(f))
        |SELECT doc_id, width, height, 3 AS channels,
        |  CAST(sum(v) AS BIGINT) AS pixel_sum,
        |  CAST(max(CASE WHEN xi = 0 AND yi = 0 THEN v END) AS BIGINT) AS px_first,
        |  CAST(max(CASE WHEN xi = width - 1 AND yi = height - 1 THEN v END) AS BIGINT) AS px_last
        |FROM px GROUP BY doc_id, width, height""".stripMargin) { (s, _) =>
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media", BinaryType)))
      val statSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("channels", IntegerType),
        StructField("pixel_sum", LongType),
        StructField("px_first", LongType),
        StructField("px_last", LongType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val statEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(statSchema)
      // Stage 1: the "ingest" side — opaque PNG bytes in a binary column.
      val binDf = s.table("documents").select(col("doc_id"))
        .mapPartitions(rows => rows.map(r => Row(r.getLong(0), encodePng(r.getLong(0)))))(binEnc)
      // Stage 2: the decode batch — ImageIO initialized per partition
      // (per-batch), not per row; only small stats leave the stage.
      binDf.mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }
            y += 1
          }
          Row(docId, w, h, img.getRaster.getNumBands, sum,
            (img.getRGB(0, 0) & 0xFF).toLong,
            (img.getRGB(w - 1, h - 1) & 0xFF).toLong)
        }
      }(statEnc)
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
