package graft.llm

import graft.engine.Engine.PinOps

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
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

  // ImageIO's default stream cache is FILE-backed: every tiny encode/
  // decode round-trips a temp file, which dominates small-image cost
  // (mm_scene_cut's 50k frames spent ~7s in it). Memory-only caching is
  // correct for byte-array streams and an order faster. Runs on object
  // classload, i.e. once per JVM — driver here, each executor on a
  // cluster (the encode/decode kernels are methods of this object).
  javax.imageio.ImageIO.setUseCache(false)

  /** Allocation-free ImageInputStream over an in-memory payload —
    * ImageIO's own MemoryCacheImageInputStream allocates a cache and
    * registers a Disposer record PER DECODE; at the ×100 probe volume
    * that JVM housekeeping (registry scans, disposer queue) measured
    * ~2× the actual pixel work on the corpus's small frames. */
  private final class ByteArrayImageInputStream(buf: Array[Byte])
      extends javax.imageio.stream.ImageInputStreamImpl {
    override def read(): Int =
      if (streamPos >= buf.length) -1
      else { bitOffset = 0; val b = buf(streamPos.toInt) & 0xFF; streamPos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (streamPos >= buf.length) -1
      else {
        bitOffset = 0
        val n = math.min(len, buf.length - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    override def length(): Long = buf.length.toLong
    override def isCachedMemory: Boolean = true
  }

  /** Reader reuse: ImageIO.read runs a ServiceRegistry provider scan
    * and builds a fresh reader per call. Decoders are not thread-safe,
    * so each executor thread keeps ONE png reader for its lifetime —
    * the per-frame cost drops to setInput + parse, which is the
    * irreducible codec work. Decoded pixels are bit-identical to
    * ImageIO.read (same PNGImageReader underneath). */
  private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
  }

  /** Decode one PNG payload through the thread-cached reader. */
  def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val reader = pngReader.get()
    val iis = new ByteArrayImageInputStream(bytes)
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally {
      reader.setInput(null)
      iis.close()
    }
  }

  /** Doc-keyed exchange with an EXPLICIT partition count (cluster
    * parallelism) ahead of a render/decode kernel. Explicit because the
    * exchange carries only ids: AQE's byte-based coalescing folds a
    * ~50 KB id shuffle into ONE post-shuffle partition and serializes
    * the compute-dense kernel behind it (measured this round: the
    * scene-cut and video-dedup kernels ran as 1-task stages of
    * 2.7-3.7 s behind byte-coalesced exchanges). A REPARTITION_BY_NUM
    * shuffle is not AQE-coalescible, and the count tracks
    * defaultParallelism — cluster cores — at any scale.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  /** Render the deterministic test image for `doc_id` and return its
    * PNG encoding: w×h RGB, gray value (doc_id + 7x + 13y) % 256 at
    * pixel (x, y) — exactly encodeFrame at scene 0 (one shared render
    * kernel, so the closed form both DuckDB oracles replay cannot
    * drift between the image and video queries).
    */
  def encodePng(docId: Long): Array[Byte] = encodeFrame(docId, 0)

  /** Render the deterministic video frame for (videoId, scene): same
    * closed form as encodePng but with a scene-shifted key and dims
    * FIXED per video (a real cut changes content, not the container):
    * w×h gray, value (videoId + 1000*scene + 7x + 13y) % 256.
    */
  def encodeFrame(videoId: Long, scene: Long): Array[Byte] = {
    val w = (videoId % 13 + 4).toInt
    val h = (videoId % 11 + 3).toInt
    val key = videoId + 1000L * scene
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((key + 7L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Render the perceptual-dedup test image for `doc_id` and return its
    * PNG encoding. Class c = doc_id % 37 picks the underlying picture;
    * variant t = doc_id % 4 applies a REAL near-duplicate transform:
    * t=0 original 16×16 gray v(x,y) = (c·11 + 7x + 13y) % 224;
    * t=1 re-exposed (+16 brightness, never clipping since v < 224+16);
    * t=2 resized (2× pixel replication to 32×32 — a re-encoded upscale);
    * t=3 occluded (pixel (7,8) → 255, a small sticker/watermark).
    * dHash over a top-left-sampled 9×8 grid is EXACTLY invariant to
    * t=1 (order-preserving brightness) and t=2 (floor(floor(2a)/2) =
    * floor(a), so grid samples hit the same source pixels), and differs
    * by ≤ 2 bits for t=3 (one grid cell feeds two adjacent
    * comparisons) — the planted near-dup structure
    * mm_image_dedup_perceptual must rediscover from the decoded bytes.
    */
  def encodeVariantPng(docId: Long): Array[Byte] = {
    val c = docId % 37
    val t = docId % 4
    val scale = if (t == 2) 2 else 1
    val n = 16 * scale
    val img = new java.awt.image.BufferedImage(
      n, n, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var q = 0
    while (q < n) {
      var p = 0
      while (p < n) {
        val bx = p / scale
        val by = q / scale
        var v = ((c * 11 + 7L * bx + 13L * by) % 224).toInt
        if (t == 1) v += 16
        if (t == 3 && bx == 7 && by == 8) v = 255
        img.setRGB(p, q, (v << 16) | (v << 8) | v)
        p += 1
      }
      q += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Render the deterministic test "recording" for `doc_id` as a REAL
    * RIFF/WAVE file (16-bit little-endian PCM mono @8 kHz — the actual
    * on-disk format, built byte-for-byte; no external codec needed):
    * a square wave of amplitude A and period P samples, exactly K
    * periods. Square (not sine) keeps every analysis quantity integer-
    * exact: |sample| = A everywhere, and sign flips land on the half-
    * period lattice — so the oracle replays peak / energy / crossings
    * in closed form.
    */
  def encodeWav(docId: Long): Array[Byte] = {
    val amp = ((docId % 100 + 50) * 100).toInt
    val period = 2 * (docId % 7 + 2).toInt
    val periods = (100 + docId % 9).toInt
    val n = period * periods
    val dataBytes = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataBytes); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(8000) // sample rate
    bb.putInt(8000 * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes); bb.putInt(dataBytes)
    var i = 0
    while (i < n) {
      val phase = (i / (period / 2)) % 2
      bb.putShort((if (phase == 0) amp else -amp).toShort)
      i += 1
    }
    bb.array()
  }

  /** Candidate scene-signature pairs between representative videos,
    * with the stop-scene df cap (the `cappedShingleRows` convention):
    * a signature carried by more than max(10, 10% of `nVideos`)
    * representatives is boilerplate — black frames, title cards,
    * shared intros at crawl scale — and would put Σ_sig c² pairs on one
    * join key; it is dropped from PAIRING (both intersection counting
    * and the set sizes the Jaccard denominators use), identically on
    * the engine and oracle sides. Returns (ga, gb, ni, na, nb) for
    * ga < gb sharing ≥1 surviving signature.
    */
  private[graft] def videoCandidatePairs(repSets: DataFrame, nVideos: Long): DataFrame = {
    // INTEGER cap arithmetic (nVideos/10, never 0.1*n): Scala's .toLong
    // truncates while DuckDB's CAST(double AS BIGINT) rounds, so a
    // float cap diverges by 1 between engine and oracle whenever the
    // count ends in 5-9 — integer division is identical on both sides
    val cap = math.max(10L, nVideos / 10)
    val sigDf = repSets.groupBy("sig").agg(count(lit(1)).as("dfc"))
    val capped = repSets.join(sigDf.filter(col("dfc") <= cap).select("sig"), "sig")
    val rSizes = capped.groupBy("gmin").agg(count(lit(1)).as("n"))
    val a = capped.select(col("gmin").as("ga"), col("sig"))
    val b = capped.select(col("gmin").as("gb"), col("sig"))
    a.join(b, "sig").filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("ni"))
      .join(rSizes.select(col("gmin").as("ga"), col("n").as("na")), "ga")
      .join(rSizes.select(col("gmin").as("gb"), col("n").as("nb")), "gb")
  }

  /** Hamming-band candidate generation for perceptual image dedup,
    * with a band-bucket OCCUPANCY cap (the MinHash >128-split analog,
    * here a df-cap because exactness forbids key extension: extending
    * a hot bucket's key with bits from other bands could separate a
    * ≤3-flip pair whose flips sit in those bands). A 16-bit band value
    * carried by more than max(10, 10% of `nReps`) distinct
    * representatives is banal imagery (flat frames, template headers)
    * and would put Σ c² candidate pairs on one key — that bucket is
    * dropped from candidate generation, identically in the DuckDB
    * oracle. Recall for a ≤3-bit pair survives unless EVERY band the
    * pair agrees on is boilerplate-hot (the shingle-cap trade,
    * documented): 3 flips touch ≤3 of the 4 disjoint bands, so ≥1
    * agreeing band always exists. Returns distinct (h1, l1, h2, l2,
    * rep2) signature pairs sharing ≥1 surviving band bucket.
    */
  private[graft] def perceptualBandCandidates(reps: DataFrame, nReps: Long): DataFrame = {
    val cap = math.max(10L, nReps / 10) // integer cap — see videoCandidatePairs
    val banded = reps.select(col("psig_hi"), col("psig_lo"), col("rep_doc"),
      posexplode(array(
        col("psig_lo").bitwiseAND(lit(65535L)),
        shiftright(col("psig_lo"), 16).bitwiseAND(lit(65535L)),
        col("psig_hi").bitwiseAND(lit(65535L)),
        shiftright(col("psig_hi"), 16).bitwiseAND(lit(65535L)))))
      .select(col("psig_hi"), col("psig_lo"), col("rep_doc"),
        col("pos").as("band"), col("col").as("bval"))
    val occ = banded.groupBy("band", "bval").agg(count(lit(1)).as("cnt"))
    val live = banded.join(
      occ.filter(col("cnt") <= cap).select("band", "bval"), Seq("band", "bval"))
    val bA = live.select(col("band"), col("bval"),
      col("psig_hi").as("h1"), col("psig_lo").as("l1"))
    val bB = live.select(col("band"), col("bval"),
      col("psig_hi").as("h2"), col("psig_lo").as("l2"), col("rep_doc").as("rep2"))
    bA.join(bB, Seq("band", "bval"))
      .filter(col("h1") =!= col("h2") || col("l1") =!= col("l2"))
      .select("h1", "l1", "h2", "l2", "rep2").distinct()
  }

  /** The video-dedup body downstream of frame decoding: exact-set
    * collapse, df-capped signature-keyed candidate pairing
    * ([[videoCandidatePairs]]), Jaccard ≥ 0.4 verify, best-match
    * selection. Split out so specs can plant a hot shared scene
    * directly in the (doc_id, sig) frame and pin the candidate count.
    * NOTE: per-video n_scenes stays UNcapped — it describes the video,
    * not the pairing graph; only the Jaccard path sees capped sets.
    */
  private[graft] def videoDedupFromSets(distinctSets: DataFrame, nVideos: Long): DataFrame = {
    // sets feeds four consumers (sizes, the set fingerprint, the
    // representative scene sets, and the final join) — materialize
    // the 8-byte-signature rows ONCE (localCheckpoint: eager,
    // GC-reclaimed) so the corpus-wide render+decode pass runs once,
    // not per consumer
    val sets = distinctSets.pinned()
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n_scenes"))
    // exact-set collapse: order-independent fingerprint of the sorted
    // signature list — identical videos never reach pairing
    val setFp = sets.groupBy("doc_id")
      .agg(xxhash64(concat_ws(",",
        transform(sort_array(collect_list(col("sig"))), x => x.cast("string")))).as("fp"))
    val groups = setFp.groupBy("fp").agg(min("doc_id").as("gmin"))
    val repSets = sets.join(
      groups.select(col("gmin").as("doc_id"), col("gmin")), "doc_id")
      .select(col("gmin"), col("sig"))
    val jc = videoCandidatePairs(repSets, nVideos)
      .select(col("ga"), col("gb"),
        (col("ni") * lit(1.0) / (col("na") + col("nb") - col("ni"))).as("jac"))
      .filter(col("jac") >= 0.4)
    val cand = jc.select(col("ga").as("g1"), col("gb").as("g2"), col("jac"))
      .unionByName(jc.select(col("gb").as("g1"), col("ga").as("g2"), col("jac")))
    val best = cand.groupBy("g1")
      .agg(min(struct((-col("jac")).as("nj"), col("g2").as("g2"))).as("nn"))
      .select(col("g1"), col("nn.g2").as("dup_of"),
        round(-col("nn.nj"), 6).as("jaccard"))
    sizes
      .join(setFp, "doc_id").join(groups, "fp")
      .join(best, col("gmin") === col("g1"), "left")
      .select(col("doc_id"), col("n_scenes"), col("gmin").as("group_id"),
        col("dup_of"), col("jaccard"))
  }

  def queries: Seq[Q] = Seq(

    // Real audio pipeline: stage 1 encodes a RIFF/WAVE file into the
    // binary column (executor-side); stage 2 PARSES the WAV container
    // (fmt chunk: channels/rate/bits; data chunk: PCM samples) in a
    // mapPartitions batch and emits waveform features. The oracle never
    // sees a byte of WAV — it replays the square wave's closed forms:
    // |sample| = A so energy = n*A^2 and peak = A; sign flips on the
    // half-period lattice give exactly 2K-1 zero crossings for K whole
    // periods; duration = n/8000 s. Any header/endianness/sample error
    // breaks the hash. Scale shape: identical to the image decode —
    // map-side batches, only small features shuffle.
    Q("mm_audio_features",
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST((doc_id % 100 + 50) * 100 AS BIGINT) AS amp,
        |    CAST(2 * (doc_id % 7 + 2) AS BIGINT) AS period,
        |    CAST(100 + doc_id % 9 AS BIGINT) AS periods
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(1 AS INT) AS channels,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(16 AS INT) AS bits,
        |  CAST(period * periods AS BIGINT) AS n_samples,
        |  CAST(period * periods * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  amp AS peak,
        |  CAST(period * periods * amp * amp AS BIGINT) AS energy,
        |  CAST(2 * periods - 1 AS BIGINT) AS zero_crossings
        |FROM p""".stripMargin) { (s, _) =>
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media", BinaryType)))
      val featSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("channels", IntegerType),
        StructField("sample_rate", IntegerType),
        StructField("bits", IntegerType),
        StructField("n_samples", LongType),
        StructField("duration_ms", LongType),
        StructField("peak", LongType),
        StructField("energy", LongType),
        StructField("zero_crossings", LongType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val featEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
      val binDf = spread(s.table("documents").select(col("doc_id")))
        .mapPartitions(rows => rows.map(r => Row(r.getLong(0), encodeWav(r.getLong(0)))))(binEnc)
      binDf.mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bb = java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1))
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          require(bb.getInt(0) == 0x46464952, "not RIFF") // 'RIFF' LE
          require(bb.getInt(8) == 0x45564157, "not WAVE") // 'WAVE' LE
          val channels = bb.getShort(22).toInt
          val rate = bb.getInt(24)
          val bits = bb.getShort(34).toInt
          val dataLen = bb.getInt(40)
          val n = dataLen / 2
          var peak = 0L; var energy = 0L; var crossings = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val v = bb.getShort(44 + 2 * i).toInt
            if (math.abs(v) > peak) peak = math.abs(v)
            energy += v.toLong * v
            if (i > 0 && v.toLong * prev < 0) crossings += 1
            prev = v
            i += 1
          }
          Row(docId, channels, rate, bits, n.toLong,
            n.toLong * 1000 / rate, peak, energy, crossings)
        }
      }(featEnc)
    },

    // Image RESIZE over the real decoded raster: PNG decode (imageio)
    // then a nearest-neighbor downsample kernel — the index mapping
    // xi = floor(x2 * w / w2) is pure integer arithmetic, so the oracle
    // replays the resized lattice from the closed-form pixel function
    // without touching a codec. Output is the resized pixel sum +
    // corners; any resample-index or decode drift fails hash.
    Q("mm_image_resize",
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 13 + 4 AS INT) AS w,
        |    CAST(doc_id % 11 + 3 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, x2.f AS xi, y2.f AS yi,
        |    CAST((doc_id + 7 * (x2.f * w // 3) + 13 * (y2.f * h // 2)) % 256 AS BIGINT) AS v
        |  FROM dims, unnest(range(3)) AS x2(f), unnest(range(2)) AS y2(f))
        |SELECT doc_id, 3 AS out_w, 2 AS out_h,
        |  CAST(sum(v) AS BIGINT) AS resized_sum,
        |  CAST(max(CASE WHEN xi = 0 AND yi = 0 THEN v END) AS BIGINT) AS px00,
        |  CAST(max(CASE WHEN xi = 2 AND yi = 1 THEN v END) AS BIGINT) AS px21
        |FROM px GROUP BY doc_id""".stripMargin) { (s, _) =>
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("out_w", IntegerType),
        StructField("out_h", IntegerType),
        StructField("resized_sum", LongType),
        StructField("px00", LongType),
        StructField("px21", LongType)))
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media", BinaryType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
      val binDf = spread(s.table("documents").select(col("doc_id")))
        .mapPartitions(rows => rows.map(r => Row(r.getLong(0), encodePng(r.getLong(0)))))(binEnc)
      binDf.mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val img = readImage(r.getAs[Array[Byte]](1))
          val w = img.getWidth; val h = img.getHeight
          val (w2, h2) = (3, 2)
          def at(x2: Int, y2: Int): Long =
            (img.getRGB(x2 * w / w2, y2 * h / h2) & 0xFF).toLong
          var sum = 0L
          var y2 = 0
          while (y2 < h2) {
            var x2 = 0
            while (x2 < w2) { sum += at(x2, y2); x2 += 1 }
            y2 += 1
          }
          Row(docId, w2, h2, sum, at(0, 0), at(2, 1))
        }
      }(outEnc)
    },

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
      val binDf = spread(s.table("documents").select(col("doc_id")))
        .mapPartitions(rows => rows.map(r => Row(r.getLong(0), encodePng(r.getLong(0)))))(binEnc)
      // Stage 2: the decode batch — ImageIO initialized per partition
      // (per-batch), not per row; only small stats leave the stage.
      binDf.mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = readImage(bytes)
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

    // Image dedup by DECODED content (the multimodal twin of
    // llm_dedup_exact): the corpus plants duplicates by rendering each
    // document's image from doc_id % 37 — ~13 docs share every raster —
    // and the engine must rediscover exactly those groups by decoding
    // the PNG and hashing the pixel CONTENT (FNV-1a over w, h, gray
    // bytes), never the container bytes. Content-hashing is the real
    // production semantic: the same raster re-encoded (different
    // compressor level, metadata chunks) still dedups; a byte-hash
    // would not. Scale shape: decode + hash are map-side (codec per
    // partition batch); only (doc_id, 8-byte hash) shuffles once, and
    // the group stats are a window over the hash key. The oracle knows
    // the plant: groups must equal doc_id % 37 classes — any decode or
    // hash defect splits or merges a class and fails row hash.
    Q("mm_image_dedup",
      """SELECT doc_id,
        |  CAST(count(*) OVER (PARTITION BY doc_id % 37) AS BIGINT) AS n_copies,
        |  CAST(min(doc_id) OVER (PARTITION BY doc_id % 37) AS BIGINT) AS canonical_id
        |FROM documents""".stripMargin) { (s, _) =>
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media", BinaryType)))
      val hashSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("ihash", LongType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val hashEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(hashSchema)
      val binDf = spread(s.table("documents").select(col("doc_id")))
        .mapPartitions(rows => rows.map(r => Row(r.getLong(0), encodePng(r.getLong(0) % 37))))(binEnc)
      val hashed = binDf.mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = readImage(bytes)
          val w = img.getWidth; val h = img.getHeight
          var hsh = 0xcbf29ce484222325L // FNV-1a 64 offset basis
          def mix(b: Int): Unit = { hsh ^= (b & 0xFF); hsh *= 0x100000001b3L }
          mix(w); mix(w >> 8); mix(h); mix(h >> 8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { mix(img.getRGB(x, y) & 0xFF); x += 1 }
            y += 1
          }
          Row(docId, hsh)
        }
      }(hashEnc)
      val wByImg = Window.partitionBy("ihash")
      hashed.select(col("doc_id"),
        count(lit(1)).over(wByImg).as("n_copies"),
        min("doc_id").over(wByImg).as("canonical_id"))
    },

    // Scene-cut detection — the shot-segmentation step of a video
    // curation pipeline: each "video" (doc_id) is a frame sequence
    // (F = id%5+8 frames, scene changes every id%3+3 frames) rendered
    // into REAL PNG payloads; the engine decodes every frame
    // (javax.imageio, per-partition batch), reduces it to an intensity
    // signature, and declares a cut wherever the signature changes
    // against the previous frame (within a scene the rendered frames
    // are identical, so the exact-change rule is deterministic); scene
    // numbers are a running sum of cuts. Scale shape: frame build +
    // decode are map-side 1→N expansion, only (video, frame, 8-byte
    // signature) rows ever shuffle, and the lag/running-sum windows are
    // video-bounded. The oracle replays the closed-form pixel sums and
    // the same change rule — a decode defect shifts a sum and moves a
    // cut.
    Q("mm_scene_cut",
      """WITH fr AS (
        |  SELECT doc_id, f.f AS frame_idx,
        |    doc_id % 13 + 4 AS w, doc_id % 11 + 3 AS h,
        |    doc_id + 1000 * (f.f // (doc_id % 3 + 3)) AS key
        |  FROM documents, unnest(range(doc_id % 5 + 8)) AS f(f)),
        |psums AS (
        |  SELECT doc_id, frame_idx,
        |    CAST(sum((key + 7 * x.xi + 13 * y.yi) % 256) AS BIGINT) AS psum
        |  FROM fr, unnest(range(w)) AS x(xi), unnest(range(h)) AS y(yi)
        |  GROUP BY doc_id, frame_idx),
        |lagged AS (
        |  SELECT doc_id, frame_idx, psum,
        |    lag(psum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pp
        |  FROM psums)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, psum,
        |  (pp IS NOT NULL AND psum <> pp) AS is_cut,
        |  CAST(1 + sum(CASE WHEN pp IS NOT NULL AND psum <> pp THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT) AS scene_no
        |FROM lagged""".stripMargin) { (s, _) =>
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("media", BinaryType)))
      val sigSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("psum", LongType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val sigEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(sigSchema)
      val frames = spread(s.table("documents").select(col("doc_id"))).mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val nFrames = (id % 5 + 8).toInt
          val sceneLen = (id % 3 + 3).toInt
          (0 until nFrames).iterator.map { f =>
            Row(id, f, encodeFrame(id, f / sceneLen))
          }
        }
      }(binEnc)
      val sigs = frames.mapPartitions { rows =>
        rows.map { r =>
          val img = readImage(r.getAs[Array[Byte]](2))
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }
            y += 1
          }
          Row(r.getLong(0), r.getInt(1), sum)
        }
      }(sigEnc)
      val wv = Window.partitionBy("doc_id").orderBy("frame_idx")
      val cut = col("pp").isNotNull && col("psum") =!= col("pp")
      sigs.withColumn("pp", lag("psum", 1).over(wv))
        .select(col("doc_id"), col("frame_idx"), col("psum"),
          cut.as("is_cut"),
          (lit(1) + sum(when(cut, 1).otherwise(0)).over(wv)).cast("long").as("scene_no"))
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
    },

    // Cross-video near-duplicate detection — the video analog of the
    // document dedup family: two videos are near-dups when their FRAME
    // CONTENT overlaps (trimmed openings, re-edited scenes), measured
    // as Jaccard over decoded frame signatures. Fixture: each "video"
    // (class c = doc_id % 29, variant t = doc_id % 3) is 10 frames of
    // 5 scenes rendered through the shared encodeFrame kernel — t=0
    // original (scenes 0-4), t=1 trimmed start (scenes 1-5), t=2
    // re-edit (scene 2 replaced by the class-unique scene 51+32c; the
    // +32c stride keeps the render's mod-256 pixel lattice from ever
    // colliding replacement content with a real scene: Δscene·1000 ≡ 0
    // (mod 256) iff Δ ≡ 0 (mod 32), and 51+32c−s ≡ 51−s ≢ 0 for all
    // s ≤ 5 — so pixel equality is EXACTLY logical-scene equality and
    // the closed-form oracle cannot drift from the decode path).
    // J(orig,trim) = 4/6, J(orig,edit) = 4/6, J(trim,edit) = 3/7,
    // cross-class 0 (dims differ). Scale shape: render+decode+hash are
    // map-side 1→10 expansion with only 8-byte signatures shuffling;
    // videos collapse by identical scene-SET fingerprint FIRST (exact
    // re-uploads — the common case — never reach pairing), then the
    // ~|distinct sets| representatives pair through a signature-keyed
    // equi-join (shared-frame candidates only, never all pairs) with
    // the Jaccard verify on bounded set sizes.
    Q("mm_video_dedup",
      """WITH d AS (SELECT doc_id, doc_id % 29 AS c, doc_id % 3 AS t FROM documents),
        |fr AS (SELECT doc_id, c, t,
        |         (f.f + CASE WHEN t = 1 THEN 2 ELSE 0 END) // 2 AS s0
        |       FROM d, range(10) f(f)),
        |sc AS (SELECT DISTINCT doc_id, c, t,
        |         c * 1000 + CASE WHEN t = 2 AND s0 = 2 THEN 51 + 32*c ELSE s0 END AS scene
        |       FROM fr),
        |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_scenes FROM sc GROUP BY 1),
        |g AS (SELECT c, t, min(doc_id) AS gmin FROM d GROUP BY 1, 2),
        |rsets AS (SELECT g.gmin, sc.scene FROM g JOIN sc ON sc.doc_id = g.gmin),
        |rdf AS (SELECT scene, count(*) AS dfc FROM rsets GROUP BY 1),
        |rcap AS (SELECT r.gmin, r.scene FROM rsets r JOIN rdf USING (scene)
        |         WHERE rdf.dfc <= greatest(10, (SELECT count(*) FROM documents) // 10)),
        |rsizes AS (SELECT gmin, count(*)::BIGINT AS n FROM rcap GROUP BY 1),
        |inter AS (SELECT a.gmin AS ga, b.gmin AS gb, count(*)::BIGINT AS ni
        |          FROM rcap a JOIN rcap b ON a.scene = b.scene AND a.gmin < b.gmin
        |          GROUP BY 1, 2),
        |jc AS (SELECT ga, gb, ni * 1.0 / (x.n + y.n - ni) AS jac
        |       FROM inter JOIN rsizes x ON x.gmin = ga JOIN rsizes y ON y.gmin = gb),
        |cand AS (SELECT ga AS g1, gb AS g2, jac FROM jc WHERE jac >= 0.4
        |         UNION ALL SELECT gb, ga, jac FROM jc WHERE jac >= 0.4),
        |best AS (SELECT g1, g2 AS dup_of, round(jac, 6) AS jaccard FROM (
        |           SELECT g1, g2, jac,
        |             row_number() OVER (PARTITION BY g1 ORDER BY jac DESC, g2) AS rn
        |           FROM cand) WHERE rn = 1)
        |SELECT d.doc_id, sizes.n_scenes, g.gmin AS group_id,
        |       best.dup_of, best.jaccard
        |FROM d JOIN sizes USING (doc_id)
        |JOIN g ON g.c = d.c AND g.t = d.t
        |LEFT JOIN best ON best.g1 = g.gmin""".stripMargin) { (s, _) =>
      val frameSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("sig", LongType)))
      val frameEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
      // doc-keyed exchange BEFORE the render/decode kernel (the KN-LM
      // lesson): the per-frame PNG deflate+inflate is the dominant CPU
      // and must not be serialized by input split geometry — the ×100
      // probe ran this stage 8-wide on a 32-core box because the
      // scaled-up fixture ships 8 parquet splits. The exchange is a
      // doc_id/c/t projection (16 bytes/row), far below the kernel cost
      // it parallelizes; kernel width = cluster cores at any scale.
      val d = spread(s.table("documents").select(col("doc_id"),
        (col("doc_id") % 29).as("c"), (col("doc_id") % 3).as("t")))
      val frames = d.select(col("doc_id"), col("c"), col("t"),
          explode(sequence(lit(0L), lit(9L))).as("f"))
        .withColumn("s0", expr("(f + CASE WHEN t = 1 THEN 2 ELSE 0 END) div 2"))
        .withColumn("scene",
          when(col("t") === 2 && col("s0") === 2, lit(51L) + lit(32L) * col("c"))
            .otherwise(col("s0")))
        .select(col("doc_id"), col("c"), col("scene"))
      // render + decode + content-hash per frame, one codec per batch
      val sigs = frames.mapPartitions { rows =>
        rows.map { r =>
          val bytes = encodeFrame(r.getLong(1), r.getLong(2))
          val img = readImage(bytes)
          val w = img.getWidth; val h = img.getHeight
          var hsh = 0xcbf29ce484222325L
          def mix(b: Int): Unit = { hsh ^= (b & 0xFF); hsh *= 0x100000001b3L }
          mix(w); mix(w >> 8); mix(h); mix(h >> 8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { mix(img.getRGB(x, y) & 0xFF); x += 1 }
            y += 1
          }
          Row(r.getLong(0), hsh)
        }
      }(frameEnc)
      videoDedupFromSets(sigs.distinct(), s.table("documents").count())
    },

    // PERCEPTUAL near-duplicate image dedup — the signal exact-pixel
    // hashing (mm_image_dedup) misses: re-exposed, re-encoded/upscaled,
    // and lightly occluded copies of the same picture. Signature is a
    // 64-bit dHash (adjacent-cell luma comparisons on a 9×8 grid,
    // top-left sampling gx = i*w/9 — exactly invariant to integer
    // pixel-replication resizes since floor(floor(2a)/2) = floor(a),
    // and to order-preserving brightness shifts), kept as two uint32
    // halves so band/XOR arithmetic never touches the BIGINT sign bit
    // in either engine. Scale shape, the SimHash pattern: decode +
    // dHash are map-side; docs collapse by EXACT signature first (one
    // hash agg — the mass of true duplicates never reaches pairing);
    // only distinct-signature REPRESENTATIVES enter 4×16-bit Hamming
    // band candidate generation + exact bit_count verify. Banding is
    // EXACT for the <=3 predicate (pigeonhole: 3 flipped bits cannot
    // touch all 4 disjoint bands), and the planted occlusion flips <=2
    // bits (one grid cell feeds two adjacent comparisons), so recall
    // is 1 by construction, with NO all-pairs join anywhere. Band
    // buckets additionally carry an OCCUPANCY cap (see
    // perceptualBandCandidates: banal-imagery buckets with df >
    // max(10, 10% of reps) are dropped from candidate generation,
    // bounding Σc² on flat frames / template headers); the oracle
    // replays the render closed form, grid, bits, banding, AND the
    // cap in SQL, so both engines compute the identical relation.
    Q("mm_image_dedup_perceptual",
      """WITH d AS (SELECT doc_id, doc_id % 37 AS c, doc_id % 4 AS t FROM documents),
        |cells AS (
        |  SELECT doc_id, i.i AS i, j.j AS j,
        |    CASE WHEN t = 3 AND i.i = 4 AND j.j = 4 THEN 255
        |         ELSE (c*11 + 7*((i.i*16)//9) + 26*j.j) % 224
        |              + CASE WHEN t = 1 THEN 16 ELSE 0 END END AS v
        |  FROM d, range(9) i(i), range(8) j(j)),
        |bits AS (
        |  SELECT a.doc_id, (a.j * 8 + a.i) AS idx,
        |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b ON a.doc_id = b.doc_id AND a.j = b.j AND b.i = a.i + 1
        |  WHERE a.i < 8),
        |sig AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN idx >= 32 THEN bit::BIGINT << (idx - 32) ELSE 0 END)::BIGINT AS psig_hi,
        |    sum(CASE WHEN idx < 32 THEN bit::BIGINT << idx ELSE 0 END)::BIGINT AS psig_lo
        |  FROM bits GROUP BY doc_id),
        |ex AS (
        |  SELECT doc_id, psig_hi, psig_lo,
        |    min(doc_id) OVER (PARTITION BY psig_hi, psig_lo) AS exact_canonical,
        |    count(*) OVER (PARTITION BY psig_hi, psig_lo)::BIGINT AS n_exact_copies
        |  FROM sig),
        |reps AS (SELECT psig_hi, psig_lo, min(doc_id) AS rep_doc FROM sig GROUP BY 1, 2),
        |bnd AS (SELECT psig_hi, psig_lo, rep_doc, b.band,
        |          CASE b.band WHEN 0 THEN psig_lo & 65535
        |                      WHEN 1 THEN (psig_lo >> 16) & 65535
        |                      WHEN 2 THEN psig_hi & 65535
        |                      ELSE (psig_hi >> 16) & 65535 END AS bval
        |        FROM reps, (SELECT unnest([0, 1, 2, 3]) AS band) b),
        |occ AS (SELECT band, bval, count(*) AS cnt FROM bnd GROUP BY 1, 2),
        |live AS (SELECT bnd.* FROM bnd JOIN occ USING (band, bval)
        |         WHERE occ.cnt <= greatest(10, (SELECT count(*) FROM reps) // 10)),
        |cpairs AS (SELECT DISTINCT a.psig_hi AS h1, a.psig_lo AS l1,
        |             b.psig_hi AS h2, b.psig_lo AS l2, b.rep_doc AS rep2
        |           FROM live a JOIN live b ON a.band = b.band AND a.bval = b.bval
        |             AND (a.psig_hi <> b.psig_hi OR a.psig_lo <> b.psig_lo)),
        |pairs AS (
        |  SELECT h1, l1, rep2,
        |    bit_count(xor(h1, h2)) + bit_count(xor(l1, l2)) AS dist
        |  FROM cpairs),
        |near AS (
        |  SELECT h1, l1, rep2 AS near_dup_of, dist::BIGINT AS near_hamming FROM (
        |    SELECT h1, l1, rep2, dist,
        |      row_number() OVER (PARTITION BY h1, l1 ORDER BY dist, rep2) AS rn
        |    FROM pairs WHERE dist BETWEEN 1 AND 3) WHERE rn = 1)
        |SELECT e.doc_id, e.psig_hi, e.psig_lo, e.exact_canonical, e.n_exact_copies,
        |  n.near_dup_of, n.near_hamming
        |FROM ex e LEFT JOIN near n ON e.psig_hi = n.h1 AND e.psig_lo = n.l1""".stripMargin) { (s, _) =>
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media", BinaryType)))
      val sigSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("psig_hi", LongType),
        StructField("psig_lo", LongType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val sigEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(sigSchema)
      val binDf = spread(s.table("documents").select(col("doc_id")))
        .mapPartitions(rows => rows.map(r => Row(r.getLong(0), encodeVariantPng(r.getLong(0)))))(binEnc)
      val sig = binDf.mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val img = readImage(r.getAs[Array[Byte]](1))
          val w = img.getWidth; val h = img.getHeight
          val cell = Array.ofDim[Int](9, 8)
          var i = 0
          while (i < 9) {
            var j = 0
            while (j < 8) {
              cell(i)(j) = img.getRGB(i * w / 9, j * h / 8) & 0xFF
              j += 1
            }
            i += 1
          }
          var hi = 0L; var lo = 0L
          var j = 0
          while (j < 8) {
            var x = 0
            while (x < 8) {
              if (cell(x + 1)(j) > cell(x)(j)) {
                val idx = j * 8 + x
                if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
              }
              x += 1
            }
            j += 1
          }
          Row(docId, hi, lo)
        }
      }(sigEnc)
      // decode runs ONCE for both consumers (the exact-collapse window
      // and the representative set): 24-byte signature rows checkpoint
      val sigC = sig.pinned()
      val wSig = Window.partitionBy("psig_hi", "psig_lo")
      val withExact = sigC.select(col("doc_id"), col("psig_hi"), col("psig_lo"),
        min("doc_id").over(wSig).as("exact_canonical"),
        count(lit(1)).over(wSig).cast("long").as("n_exact_copies"))
      val reps = sigC.groupBy("psig_hi", "psig_lo").agg(min("doc_id").as("rep_doc"))
        .pinned()
      val cand = perceptualBandCandidates(reps, reps.count())
      val near = cand
        .withColumn("dist",
          bit_count(col("h1").bitwiseXOR(col("h2"))) +
            bit_count(col("l1").bitwiseXOR(col("l2"))))
        .filter(col("dist").between(1, 3))
        .groupBy("h1", "l1")
        .agg(min(struct(col("dist"), col("rep2"))).as("nn"))
        .select(col("h1").as("psig_hi"), col("l1").as("psig_lo"),
          col("nn.rep2").as("near_dup_of"),
          col("nn.dist").cast("long").as("near_hamming"))
      withExact.join(near, Seq("psig_hi", "psig_lo"), "left")
        .select(col("doc_id"), col("psig_hi"), col("psig_lo"),
          col("exact_canonical"), col("n_exact_copies"),
          col("near_dup_of"), col("near_hamming"))
    },

    // VOLUME-INVARIANT audio dedup — the recording-level signal exact
    // byte hashing misses: the same content re-leveled (normalized,
    // re-mastered, ripped at a different gain) differs in every PCM
    // byte but is the same recording. The content signature is derived
    // from the DECODED waveform's amplitude-independent structure:
    // sample count + fundamental period recovered from the
    // zero-crossing count (K whole periods flip sign exactly 2K-1
    // times, so period = n / ((zc+1)/2) — integer-exact on the square
    // fixture, the deterministic stand-in for a spectral fingerprint;
    // a real corpus would swap in chroma/constellation hashes with the
    // same plan shape). Dedup: recordings sharing (n_samples, period)
    // are the same content; the lowest doc id is canonical and
    // n_variants counts the distinct volume levels observed. Scale
    // shape: decode is map-side 1:1 (no expansion), only 32-byte
    // signature rows shuffle — ONE hash agg on the content key + a
    // signature-keyed join back, no pairwise stage at all (the
    // signature is exact, not banded). The oracle replays the square
    // wave's closed forms from doc_id, so any decode/zc/period error
    // breaks the hash.
    Q("mm_audio_dedup",
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST((doc_id % 100 + 50) * 100 AS BIGINT) AS peak,
        |    CAST(2 * (doc_id % 7 + 2) AS BIGINT) AS period,
        |    CAST(100 + doc_id % 9 AS BIGINT) AS periods
        |  FROM documents),
        |sig AS (SELECT doc_id, period * periods AS n_samples, period, peak FROM p),
        |g AS (SELECT n_samples, period, min(doc_id) AS content_id,
        |        count(DISTINCT peak)::BIGINT AS n_variants
        |      FROM sig GROUP BY 1, 2)
        |SELECT s.doc_id, s.n_samples, s.period, s.peak, g.content_id, g.n_variants,
        |  CASE WHEN s.doc_id <> g.content_id THEN g.content_id END AS dup_of
        |FROM sig s JOIN g USING (n_samples, period)""".stripMargin) { (s, _) =>
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media", BinaryType)))
      val sigSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("n_samples", LongType),
        StructField("period", LongType),
        StructField("peak", LongType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val sigEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(sigSchema)
      val binDf = spread(s.table("documents").select(col("doc_id")))
        .mapPartitions(rows => rows.map(r => Row(r.getLong(0), encodeWav(r.getLong(0)))))(binEnc)
      val sig = binDf.mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bb = java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1))
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          require(bb.getInt(0) == 0x46464952 && bb.getInt(8) == 0x45564157, "not RIFF/WAVE")
          val n = bb.getInt(40) / 2
          var peak = 0L; var crossings = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val v = bb.getShort(44 + 2 * i).toInt
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && v.toLong * prev < 0) crossings += 1
            prev = v
            i += 1
          }
          val wholePeriods = (crossings + 1) / 2
          Row(docId, n.toLong, n.toLong / wholePeriods, peak)
        }
      }(sigEnc)
        // decode runs ONCE for both consumers (the content-group agg and
        // the join back): 32-byte signature rows checkpoint — the same
        // convention as the video/perceptual paths
        .pinned()
      val g = sig.groupBy("n_samples", "period")
        .agg(min("doc_id").as("content_id"),
          count_distinct(col("peak")).as("n_variants"))
      sig.join(g, Seq("n_samples", "period"))
        .select(col("doc_id"), col("n_samples"), col("period"), col("peak"),
          col("content_id"), col("n_variants"),
          when(col("doc_id") =!= col("content_id"), col("content_id")).as("dup_of"))
    },

    // Text-in-image (OCR-shape) dedup — the last multimodal-column
    // pattern: binary -> TEXT column. Each doc renders a real PNG of
    // its label text ("DOC<doc_id%50>") in a 3x5 glyph-grid font; the
    // extraction kernel decodes the PNG through javax.imageio and READS
    // THE TEXT BACK FROM PIXELS ALONE (per-cell bit pattern -> injective
    // glyph table — the deterministic stand-in for an OCR model, which
    // this container cannot ship; the Spark-side plumbing — binary
    // column, mapPartitions batch decode, text-typed output — is the
    // real surface). Dedup then runs on the EXTRACTED text: one hash
    // agg (group -> size + min-doc representative), no pairwise stage,
    // map-side render+decode with zero exchanges before the single
    // keyed agg. The oracle never sees pixels: it recomputes the label
    // arithmetic directly, so any extraction error breaks the match.
    Q("mm_text_extract_dedup",
      """SELECT 'DOC' || CAST(doc_id % 50 AS VARCHAR) AS text_extracted,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS rep_doc
        |FROM documents GROUP BY 1""".stripMargin) { (s, _) =>
      val binSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("image", BinaryType)))
      val txtSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text_extracted", StringType)))
      val binEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(binSchema)
      val txtEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(txtSchema)
      val media = spread(s.table("documents").select(col("doc_id")))
        .mapPartitions(rows => rows.map(r =>
          Row(r.getLong(0), encodeTextPng(s"DOC${r.getLong(0) % 50}"))))(binEnc)
      val extracted = media.mapPartitions(rows => rows.map { r =>
        Row(r.getLong(0), extractTextFromPng(r.getAs[Array[Byte]](1)))
      })(txtEnc)
      extracted.groupBy("text_extracted")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("rep_doc"))
    })

  /** 3x5 bit-grid glyph font for the OCR-shape queries — every pattern
    * distinct (spec-checked injective), so pixel->char recovery is
    * exact. 'O' and '0' deliberately differ (rounded vs square). */
  private[graft] val Glyphs: Map[Char, Seq[String]] = Map(
    'D' -> Seq("110", "101", "101", "101", "110"),
    'O' -> Seq("010", "101", "101", "101", "010"),
    'C' -> Seq("011", "100", "100", "100", "011"),
    '0' -> Seq("111", "101", "101", "101", "111"),
    '1' -> Seq("010", "110", "010", "010", "111"),
    '2' -> Seq("111", "001", "111", "100", "111"),
    '3' -> Seq("111", "001", "011", "001", "111"),
    '4' -> Seq("101", "101", "111", "001", "001"),
    '5' -> Seq("111", "100", "111", "001", "111"),
    '6' -> Seq("111", "100", "111", "101", "111"),
    '7' -> Seq("111", "001", "010", "010", "010"),
    '8' -> Seq("111", "101", "111", "101", "111"),
    '9' -> Seq("111", "101", "111", "001", "111"))

  private val GlyphLookup: Map[String, Char] =
    Glyphs.map { case (c, rows) => rows.mkString -> c }

  /** Render `text` as a real PNG: 1-px margin, each char a 3x5 black-
    * on-white glyph cell with a 1-px gap (cell pitch 4). Layout is
    * self-describing: width = 4*len + 1, so the reader derives the
    * character count from the decoded image alone. */
  def encodeTextPng(text: String): Array[Byte] = {
    val w = 4 * text.length + 1
    val h = 7
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, 0xFFFFFF); x += 1 }
      y += 1
    }
    text.zipWithIndex.foreach { case (ch, i) =>
      val rows = Glyphs.getOrElse(ch,
        throw new IllegalArgumentException(s"no glyph for '$ch'"))
      for (r <- 0 until 5; c <- 0 until 3)
        if (rows(r).charAt(c) == '1') img.setRGB(1 + 4 * i + c, 1 + r, 0x000000)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** OCR the glyph grid back out of a PNG: decode via javax.imageio,
    * threshold each 3x5 cell to a bit pattern, look it up in the
    * injective glyph table. Pure function of the PIXELS. */
  def extractTextFromPng(png: Array[Byte]): String = {
    val img = readImage(png)
    val n = (img.getWidth - 1) / 4
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val pat = new StringBuilder(15)
      var r = 0
      while (r < 5) {
        var c = 0
        while (c < 3) {
          val dark = (img.getRGB(1 + 4 * i + c, 1 + r) & 0xFF) < 128
          pat.append(if (dark) '1' else '0')
          c += 1
        }
        r += 1
      }
      sb.append(GlyphLookup.getOrElse(pat.toString,
        throw new IllegalArgumentException(s"unrecognized glyph at cell $i")))
      i += 1
    }
    sb.toString
  }
}
