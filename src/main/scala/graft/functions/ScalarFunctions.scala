package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Custom scalar functions the reference has and Spark lacks.
  *
  * Implemented as Scala UDFs only where no native composition exists;
  * anything expressible with `org.apache.spark.sql.functions` stays
  * native for whole-stage codegen (see `Fns`).
  *
  * References (SURVEY §2.9): operator/scalar/StringFunctions.java
  * (word_stem, normalize), UrlFunctions.java, MathFunctions.java
  * (to_base/from_base, cosine_similarity), VarbinaryFunctions.java
  * (ieee754, hmac).
  */
object ScalarFunctions {

  /** Minimal Porter stemmer (published algorithm, Porter 1980) —
    * reference: operator/scalar/WordStemFunction.java (Lucene snowball).
    */
  def porterStem(w: String): String = {
    if (w == null || w.length <= 2) return w
    var s = w.toLowerCase
    def isVowel(c: Char, i: Int, str: String): Boolean = c match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' => i > 0 && !isVowel(str(i - 1), i - 1, str)
      case _ => false
    }
    def measure(str: String): Int = {
      var m = 0; var prevVowel = false
      for (i <- str.indices) {
        val v = isVowel(str(i), i, str)
        if (!v && prevVowel) m += 1
        prevVowel = v
      }
      m
    }
    def hasVowel(str: String): Boolean = str.indices.exists(i => isVowel(str(i), i, str))
    // Step 1a
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ies")) s = s.dropRight(2)
    else if (s.endsWith("ss")) ()
    else if (s.endsWith("s") && s.length > 1) s = s.dropRight(1)
    // Step 1b (simplified)
    // *d rule: strip one of a DOUBLED CONSONANT (not vowel) unless l/s/z
    def doubledConsonant(str: String): Boolean =
      str.length >= 2 && str(str.length - 1) == str(str.length - 2) &&
        !"aeiou".contains(str.last) && !"lsz".contains(str.last)
    if (s.endsWith("eed")) { if (measure(s.dropRight(3)) > 0) s = s.dropRight(1) }
    else if (s.endsWith("ed") && hasVowel(s.dropRight(2))) {
      s = s.dropRight(2)
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s = s + "e"
      else if (doubledConsonant(s)) s = s.dropRight(1)
    } else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) {
      s = s.dropRight(3)
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s = s + "e"
      else if (doubledConsonant(s)) s = s.dropRight(1)
    }
    // Step 1c
    if (s.endsWith("y") && hasVowel(s.dropRight(1))) s = s.dropRight(1) + "i"
    s
  }

  def urlEncode(s: String): String =
    if (s == null) null else java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  def urlDecode(s: String): String =
    if (s == null) null else java.net.URLDecoder.decode(s, "UTF-8")

  def toBase(x: Long, radix: Int): String = java.lang.Long.toString(x, radix)
  def fromBase(s: String, radix: Int): Long = java.lang.Long.parseLong(s, radix)

  def toIeee754_64(d: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putDouble(d); bb.array()
  }
  def fromIeee754_64(b: Array[Byte]): Double =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.BIG_ENDIAN).getDouble

  def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def normalizeNfc(s: String): String =
    if (s == null) null else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** 64-bit SimHash over whitespace tokens (Charikar 2002). Per-doc cost
    * O(tokens); deterministic (xxhash64 per token via Spark's own impl
    * would need an expression — use a splitmix-style hash here).
    */
  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val weights = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { tok =>
      var h = tok.hashCode.toLong * 0x9E3779B97F4A7C15L
      h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 29)
      var i = 0
      while (i < 64) { if (((h >>> i) & 1L) == 1L) weights(i) += 1 else weights(i) -= 1; i += 1 }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (weights(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** MySQL-pattern date formatting (Presto's date_format /
    * DateTimeFunctions.java uses MySQL patterns, not Java's). Translates
    * the MySQL specifiers to DateTimeFormatter patterns.
    */
  private val mysqlToJava: Seq[(String, String)] = Seq(
    // u = ChronoField.YEAR, matching the parse defaults (y is year-of-era)
    "%Y" -> "uuuu", "%y" -> "uu", "%M" -> "MMMM", "%m" -> "MM", "%c" -> "M",
    "%d" -> "dd", "%e" -> "d", "%H" -> "HH", "%k" -> "H", "%h" -> "hh",
    "%i" -> "mm", "%s" -> "ss", "%S" -> "ss", "%f" -> "SSSSSS",
    "%W" -> "EEEE", "%a" -> "EEE", "%b" -> "MMM", "%j" -> "DDD",
    "%p" -> "a", "%T" -> "HH:mm:ss", "%%" -> "%")

  def translateMysqlPattern(p: String): String = {
    val sb = new StringBuilder
    val lit = new StringBuilder // pending literal run
    def flushLit(): Unit = if (lit.nonEmpty) {
      // one quoted section per run — emitting each char separately would
      // merge adjacent quotes into java.time's '' escape ("a'b" not "ab")
      sb.append("'").append(lit.toString.replace("'", "''")).append("'")
      lit.clear()
    }
    var i = 0
    while (i < p.length) {
      if (p(i) == '%' && i + 1 < p.length) {
        val spec = p.substring(i, i + 2)
        mysqlToJava.find(_._1 == spec) match {
          case Some((_, j)) => flushLit(); sb.append(j)
          case None => lit.append(p(i + 1))
        }
        i += 2
      } else if (p(i).isLetter || p(i) == '\'') { lit.append(p(i)); i += 1 }
      else { flushLit(); sb.append(p(i)); i += 1 }
    }
    flushLit()
    sb.toString
  }

  def dateFormatMysql(ts: java.sql.Timestamp, pattern: String): String = {
    if (ts == null || pattern == null) return null
    ts.toInstant.atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern(translateMysqlPattern(pattern)))
  }

  def dateParseMysql(s: String, pattern: String): java.sql.Timestamp = {
    if (s == null || pattern == null) return null
    // Presto's date_parse defaults every unspecified field (year 1970,
    // month/day 1, time 0) rather than erroring on date-only patterns.
    val f = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern(translateMysqlPattern(pattern))
      .parseDefaulting(java.time.temporal.ChronoField.YEAR, 1970)
      .parseDefaulting(java.time.temporal.ChronoField.MONTH_OF_YEAR, 1)
      .parseDefaulting(java.time.temporal.ChronoField.DAY_OF_MONTH, 1)
      .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter()
    java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(s, f).toInstant(java.time.ZoneOffset.UTC))
  }

  def install(spark: SparkSession): Unit = {
    spark.udf.register("date_format_mysql", (ts: java.sql.Timestamp, p: String) => dateFormatMysql(ts, p))
    spark.udf.register("date_parse_mysql", (s: String, p: String) => dateParseMysql(s, p))
    spark.udf.register("word_stem", (s: String) => porterStem(s))
    spark.udf.register("url_encode", (s: String) => urlEncode(s))
    spark.udf.register("url_decode", (s: String) => urlDecode(s))
    spark.udf.register("to_base", (x: Long, r: Int) => toBase(x, r))
    spark.udf.register("from_base", (s: String, r: Int) => fromBase(s, r))
    spark.udf.register("to_ieee754_64", (d: Double) => toIeee754_64(d))
    spark.udf.register("from_ieee754_64", (b: Array[Byte]) => fromIeee754_64(b))
    spark.udf.register("hmac_sha256", (k: Array[Byte], d: Array[Byte]) => hmacSha256(k, d))
    spark.udf.register("normalize_nfc", (s: String) => normalizeNfc(s))
    spark.udf.register("simhash64", (s: String) => simhash64(s))
  }
}

/** Native (codegen-friendly) Column compositions for ops the reference
  * exposes as functions but Spark expresses with higher-order functions.
  * These never leave WholeStageCodegen — preferred over UDFs at 100 TB.
  */
object Fns {

  /** Cosine similarity via the native codegen'd ArrayCosineSimilarity
    * expression (registered by FunctionRegistry.installAll) —
    * reference: operator/scalar/MathFunctions.java cosineSimilarity.
    */
  def cosineSim(a: Column, b: Column): Column =
    call_udf("cosine_similarity", a, b)

  /** Dot product of two numeric arrays. Elements are cast to double
    * BEFORE multiplying — float32 products would round differently from
    * any double-precision reference.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  /** L2 norm (double accumulation). */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** ngrams(arr, n): array of n-element sub-arrays —
    * reference: operator/scalar/ArrayNgramsFunction.java.
    * Guarded against Spark's descending sequence(1, 0): windows shorter
    * than n (arrays with < n elements) are filtered out.
    */
  def ngrams(arr: Column, n: Int): Column =
    filter(
      transform(
        sequence(lit(1), greatest(size(arr) - (n - 1), lit(1))),
        i => slice(arr, i, lit(n))),
      g => size(g) === n)

  /** Distinct character shingles of length n over a lowercased string —
    * the standard MinHash preprocessing step (Broder 1997).
    */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n))))
  }

  /** Distinct word tokens (whitespace split, lowercased, empties dropped). */
  def wordTokens(text: Column): Column =
    array_distinct(filter(split(lower(text), "\\s+"), t => length(t) > 0))

  /** MinHash signature (k values) over a string-array shingle set.
    * h_i(x) = xxhash64(i, x); signature[i] = min over shingles.
    * Fully native: transform + array_min, stays in codegen.
    * Reference: setdigest/SetDigestFunctions.java (minhash side).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** Estimated Jaccard from two equal-length minhash signatures. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)
}
