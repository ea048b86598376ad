package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Document-store connector slice — the MongoDB connector family
  * without a broker (reference: presto-mongodb/.../MongoSession.java
  * buildQuery/buildProjection — predicate pushdown into the server
  * query and PROJECTION pushdown so only requested document fields are
  * materialized; MongoPageSource.java streams the cursor).
  *
  * The zero-egress sandbox cannot run mongod, so the "server side" is a
  * file-backed collection of documents in the PUBLIC BSON wire layout
  * (bsonspec.org): every document and every string/subdocument value is
  * LENGTH-PREFIXED. That prefix is what makes Mongo-style projection
  * pushdown mechanically real rather than cosmetic: a cursor asked for
  * `meta.ck` SKIPS a megabyte `payload` subdocument by jumping its
  * length prefix — zero decode work proportional to the unrequested
  * data (spec-pinned via the decode/skip counters below). Everything
  * downstream of the fetch is the real connector logic:
  *
  *  - SPLITS: one per segment file, planned from directory metadata.
  *  - PROJECTION pushdown: dotted paths compile to a field trie; the
  *    cursor walks each document once, decoding ONLY trie-captured
  *    values, recursing ONLY into trie-interior subdocuments, and
  *    length-skipping everything else.
  *  - PREDICATE pushdown: (path, op, literal) conjuncts evaluate
  *    inside the cursor BEFORE row materialization (MongoSession
  *    buildQuery's $match analog); filter-only paths are added to the
  *    internal projection and dropped from the output row.
  *  - TYPES: double/string/document/array/bool/int64/null — the BSON
  *    element types the reference's MongoColumnHandle surface maps.
  *
  * Scale: the cursor is executor-side mapPartitions over splits,
  * memory O(1 document); projection/filter pushdown shrink both CPU
  * and the rows crossing into the engine, exactly like the reference's
  * server-side query.
  */
object DocStore {

  // ---- decode/skip accounting (single-parse/skip contracts in specs;
  // local-mode executors share the JVM so plain statics observe all) ----
  val fieldsDecoded = new java.util.concurrent.atomic.AtomicLong(0L)
  val bytesSkipped = new java.util.concurrent.atomic.AtomicLong(0L)
  val docsRejected = new java.util.concurrent.atomic.AtomicLong(0L)

  // BSON element types (bsonspec.org)
  private val TDouble = 0x01.toByte
  private val TString = 0x02.toByte
  private val TDoc = 0x03.toByte
  private val TArray = 0x04.toByte
  private val TBool = 0x08.toByte
  private val TNull = 0x0A.toByte
  private val TInt64 = 0x12.toByte

  // ---- writer (the fixture "server") ----

  /** Encode one document in BSON layout. Values: Long, Double, String,
    * Boolean, null, Seq[(String, Any)] (subdocument, ordered), or
    * Seq[Any] (array). */
  def encodeDoc(doc: Seq[(String, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream, doc: Seq[(String, Any)]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    doc.foreach { case (name, v) => writeElement(body, name, v) }
    val total = 4 + body.size() + 1
    writeInt32(out, total)
    body.writeTo(out)
    out.write(0x00)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String, v: Any): Unit = {
    def cstring(s: String): Unit = {
      out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.write(0x00)
    }
    v match {
      case null => out.write(TNull); cstring(name)
      case d: Double =>
        out.write(TDouble); cstring(name)
        writeInt64(out, java.lang.Double.doubleToLongBits(d))
      case l: Long => out.write(TInt64); cstring(name); writeInt64(out, l)
      case i: Int => out.write(TInt64); cstring(name); writeInt64(out, i.toLong)
      case b: Boolean => out.write(TBool); cstring(name); out.write(if (b) 1 else 0)
      case s: String =>
        out.write(TString); cstring(name)
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        writeInt32(out, bytes.length + 1); out.write(bytes, 0, bytes.length); out.write(0x00)
      case sub: Seq[_] if sub.isEmpty || sub.head.isInstanceOf[(_, _)] =>
        out.write(TDoc); cstring(name)
        writeDoc(out, sub.asInstanceOf[Seq[(String, Any)]])
      case arr: Seq[_] => // array = document with "0","1",... keys (BSON rule)
        out.write(TArray); cstring(name)
        writeDoc(out, arr.zipWithIndex.map { case (x, i) => (i.toString, x) })
      case other => throw new IllegalArgumentException(s"unsupported doc value: $other")
    }
  }

  private def writeInt32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def writeInt64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt32(out, v.toInt); writeInt32(out, (v >> 32).toInt)
  }

  /** Write a collection as `docsPerSegment`-sized segment files. */
  def writeCollection(dir: String, name: String, docs: Seq[Seq[(String, Any)]],
      docsPerSegment: Int): Unit = {
    val base = new java.io.File(dir, name)
    base.mkdirs()
    docs.grouped(docsPerSegment).zipWithIndex.foreach { case (group, i) =>
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(new java.io.File(base, f"seg-$i%05d.docs")))
      try group.foreach(d => out.write(encodeDoc(d)))
      finally out.close()
    }
  }

  // ---- projection trie ----

  private final case class Trie(capture: Map[String, Int], children: Map[String, Trie])

  private def buildTrie(paths: Seq[String]): Trie = buildTrieIndexed(paths.zipWithIndex)

  private def buildTrieIndexed(paths: Seq[(String, Int)]): Trie = {
    val (leaves, interior) = paths.partition(!_._1.contains('.'))
    val capture = leaves.toMap
    val children = interior.groupBy(_._1.takeWhile(_ != '.')).map { case (head, subs) =>
      head -> buildTrieIndexed(subs.map { case (p, i) => (p.drop(head.length + 1), i) })
    }
    require(capture.keySet.intersect(children.keySet).isEmpty,
      s"a path cannot be both a value and a prefix: ${capture.keySet.intersect(children.keySet)}")
    Trie(capture, children)
  }

  // ---- cursor ----

  private def readInt32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def readInt64(b: Array[Byte], off: Int): Long =
    (readInt32(b, off).toLong & 0xFFFFFFFFL) | (readInt32(b, off + 4).toLong << 32)

  /** Walk one document at `off`, filling `out` for trie-captured paths;
    * returns the offset past the document. Unrequested fields are
    * length-skipped without decoding (the pushdown mechanism). */
  private def projectDoc(b: Array[Byte], off: Int, trie: Trie, out: Array[Any]): Int = {
    val total = readInt32(b, off)
    var p = off + 4
    val end = off + total - 1 // 0x00 terminator
    while (p < end) {
      val t = b(p); p += 1
      val nameStart = p
      while (b(p) != 0) p += 1
      val name = new String(b, nameStart, p - nameStart, java.nio.charset.StandardCharsets.UTF_8)
      p += 1
      val valueLen = t match {
        case TDouble | TInt64 => 8
        case TBool => 1
        case TNull => 0
        case TString => 4 + readInt32(b, p)
        case TDoc | TArray => readInt32(b, p)
        case other => throw new IllegalArgumentException(s"unknown BSON type: $other")
      }
      trie.capture.get(name) match {
        case Some(idx) =>
          fieldsDecoded.incrementAndGet()
          out(idx) = t match {
            case TDouble => java.lang.Double.longBitsToDouble(readInt64(b, p))
            case TInt64 => readInt64(b, p)
            case TBool => b(p) != 0
            case TNull => null
            case TString =>
              new String(b, p + 4, readInt32(b, p) - 1, java.nio.charset.StandardCharsets.UTF_8)
            case _ => null // doc/array projected as a whole: unsupported -> null
          }
          p += valueLen
        case None =>
          trie.children.get(name) match {
            case Some(sub) if t == TDoc =>
              projectDoc(b, p, sub, out)
              p += valueLen
            case _ =>
              bytesSkipped.addAndGet(valueLen.toLong)
              p += valueLen
          }
      }
    }
    off + total
  }

  private def sqlType(tpe: String): DataType = tpe.toUpperCase match {
    case "LONG" | "BIGINT" => LongType
    case "DOUBLE" => DoubleType
    case "BOOLEAN" => BooleanType
    case "STRING" | "VARCHAR" => StringType
    case other => throw new IllegalArgumentException(s"unsupported doc target type: $other")
  }

  /** Pushed-down predicate: dotted path, op in = != < <= > >=, literal. */
  final case class Pred(path: String, op: String, value: Any) {
    def eval(v: Any): Boolean = {
      if (v == null) return false // SQL semantics: NULL compares unknown
      val c = (v, value) match {
        case (a: Long, b: Long) => java.lang.Long.compare(a, b)
        case (a: Long, b: Int) => java.lang.Long.compare(a, b.toLong)
        case (a: Double, b: Double) => java.lang.Double.compare(a, b)
        case (a: Double, b: Int) => java.lang.Double.compare(a, b.toDouble)
        case (a: String, b: String) => a.compareTo(b)
        case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
        case _ => throw new IllegalArgumentException(s"type mismatch: $v vs $value")
      }
      op match {
        case "=" => c == 0
        case "!=" => c != 0
        case "<" => c < 0
        case "<=" => c <= 0
        case ">" => c > 0
        case ">=" => c >= 0
        case other => throw new IllegalArgumentException(s"unknown op: $other")
      }
    }
  }

  /** Number of splits the planner would schedule (metadata only). */
  def plannedSplits(dir: String, name: String): Int =
    Option(new java.io.File(dir, name).listFiles())
      .map(_.count(_.getName.endsWith(".docs"))).getOrElse(0)

  /** Read a collection with projection + predicate pushdown.
    * `projection` maps output column -> (dotted path, SQL type).
    */
  def readCollection(spark: SparkSession, dir: String, name: String,
      projection: Seq[(String, String, String)],
      filters: Seq[Pred] = Seq.empty): DataFrame = {
    val base = new java.io.File(dir, name)
    val segments = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".docs")).map(_.getAbsolutePath).sorted.toSeq
    // internal projection = declared columns + filter-only paths
    val declaredPaths = projection.map(_._2)
    val filterOnly = filters.map(_.path).distinct.filterNot(declaredPaths.contains)
    val allPaths = declaredPaths ++ filterOnly
    val trie = buildTrie(allPaths)
    val filterIdx = filters.map(f => (allPaths.indexOf(f.path), f))
    val width = allPaths.length
    val outWidth = projection.length
    val schema = StructType(projection.map { case (col, _, tpe) =>
      StructField(col, sqlType(tpe), nullable = true)
    })
    val sc = spark.sparkContext
    val rdd = sc.parallelize(segments, math.max(segments.length, 1)).flatMap { path =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      new Iterator[Row] {
        private var off = 0
        private var nextRow: Row = null
        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && off < bytes.length) {
            val vals = new Array[Any](width)
            off = projectDoc(bytes, off, trie, vals)
            if (filterIdx.forall { case (i, f) => f.eval(vals(i)) })
              nextRow = Row.fromSeq(vals.take(outWidth).toIndexedSeq)
            else docsRejected.incrementAndGet()
          }
        }
        advance()
        override def hasNext: Boolean = nextRow != null
        override def next(): Row = { val r = nextRow; advance(); r }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
