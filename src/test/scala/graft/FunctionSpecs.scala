package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Hll, ScalarFunctions, SetDigest, SpookyHash}

/** Unit specs for the custom function layer — the analog of the
  * reference's AbstractTestFunctions harness (per-function edge cases,
  * SURVEY §5.4), plus scalacheck properties for null/merge/accuracy
  * invariants.
  */
class FunctionSpecs extends AnyFunSuite {

  // ---- HLL (Flajolet et al. 2007) ----

  test("hll estimates within 5% across magnitudes") {
    for (n <- Seq(100, 10000, 200000)) {
      val regs = new Array[Byte](Hll.M)
      (0 until n).foreach(i => Hll.update(regs, Hll.hashAny(i.toLong)))
      val est = Hll.cardinality(regs)
      assert(math.abs(est - n).toDouble / n < 0.05, s"n=$n est=$est")
    }
  }

  test("hll merge == union (register max is associative/commutative)") {
    val a = new Array[Byte](Hll.M)
    val b = new Array[Byte](Hll.M)
    val u = new Array[Byte](Hll.M)
    (0 until 5000).foreach { i => Hll.update(a, Hll.hashAny(i.toLong)); Hll.update(u, Hll.hashAny(i.toLong)) }
    (2500 until 9000).foreach { i => Hll.update(b, Hll.hashAny(i.toLong)); Hll.update(u, Hll.hashAny(i.toLong)) }
    Hll.merge(a, b)
    assert(java.util.Arrays.equals(a, u))
  }

  test("hll hash is type-stable and null-safe") {
    assert(Hll.hashAny(null) == 0L)
    assert(Hll.hashAny(42L) == Hll.hashAny(42))
  }

  // ---- SetDigest (Broder bottom-k) ----

  private def digest(xs: Range): SetDigest.Buf = {
    val s = SetDigest.newBuf()
    xs.foreach(i => SetDigest.add(s, Hll.hashAny(i.toLong)))
    s
  }

  test("setdigest jaccard estimates overlap") {
    // |A∩B|/|A∪B| = 5000/15000 ≈ 0.333
    val a = digest(0 until 10000)
    val b = digest(5000 until 15000)
    val j = SetDigest.jaccard(a, b)
    assert(math.abs(j - 1.0 / 3.0) < 0.1, s"j=$j")
    // identical sets
    assert(SetDigest.jaccard(a, digest(0 until 10000)) == 1.0)
  }

  test("setdigest serialization round-trips") {
    val s = SetDigest.newBuf()
    (0 until 1000).foreach(i => SetDigest.add(s, Hll.hashAny(i.toLong)))
    assert(SetDigest.fromBytes(SetDigest.toBytes(s)) == s)
    assert(s.size() == SetDigest.K)
  }

  test("setdigest cardinality: exact below k, KMV within 15% above") {
    assert(SetDigest.cardinality(digest(0 until 100)) == 100L)
    val est = SetDigest.cardinality(digest(0 until 100000)).toDouble
    assert(math.abs(est - 100000) / 100000 < 0.15, s"est=$est")
  }

  test("setdigest intersection_cardinality: exact small sets, bounded estimate large") {
    // exact path: both digests unsaturated
    val a = digest(0 until 100)
    val b = digest(50 until 150)
    assert(SetDigest.intersectionCardinality(a, b) == 50L)
    // estimated path: 5000-element overlap of two 10k sets, within 25%
    val la = digest(0 until 10000)
    val lb = digest(5000 until 15000)
    val est = SetDigest.intersectionCardinality(la, lb).toDouble
    assert(math.abs(est - 5000) / 5000 < 0.25, s"est=$est")
    // subset guard: estimate never exceeds the smaller set's cardinality
    val small = digest(0 until 300)
    val big = digest(0 until 50000)
    assert(SetDigest.intersectionCardinality(small, big) <=
      SetDigest.cardinality(small))
  }

  test("spooky hash v2 matches reference vectors; long path is stable") {
    // reference TestVarbinaryFunctions.java:338-341
    def hex32(s: String) = f"${SpookyHash.hash32(s.getBytes("UTF-8"), 0)}%08X"
    def hex64(s: String) = f"${SpookyHash.hash64(s.getBytes("UTF-8"), 0L)}%016X"
    assert(hex32("") == "6BF50919")
    assert(hex32("hello") == "D382E6CA")
    assert(hex64("") == "232706FC6BF50919")
    assert(hex64("hello") == "3768826AD382E6CA")
    // long path (>= 192 bytes): deterministic, different from a 1-byte change
    val big = Array.tabulate[Byte](500)(i => (i * 31).toByte)
    val h1 = SpookyHash.hash64(big, 0L)
    assert(h1 == SpookyHash.hash64(big.clone(), 0L))
    big(499) = (big(499) ^ 1).toByte
    assert(h1 != SpookyHash.hash64(big, 0L))
  }

  test("setdigest hash_counts tracks occurrence counts through merge") {
    val s = SetDigest.newBuf()
    SetDigest.add(s, 7L); SetDigest.add(s, 7L); SetDigest.add(s, 9L)
    val t = SetDigest.fromBytes(SetDigest.toBytes(s))
    SetDigest.add(t, 7L)
    val hc = SetDigest.hashCounts(t)
    assert(hc(7L) == 3 && hc(9L) == 1)
  }

  // ---- Misra-Gries heavy hitters ----

  test("misra-gries guarantee: freq > N/k survives; counts within N/k") {
    import graft.functions.MisraGries
    val rnd = new scala.util.Random(42)
    val k = 20
    // 3 heavy values + uniform noise
    val data = Seq.fill(3000)("heavy" + rnd.nextInt(3)) ++
      Seq.fill(7000)("noise" + rnd.nextInt(5000))
    val shuffled = rnd.shuffle(data)
    // split into 4 partitions, update + merge (the Spark partial/final path)
    val parts = shuffled.grouped((shuffled.size + 3) / 4).toSeq.map { p =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      p.foreach(v => MisraGries.update(m, v, k))
      m
    }
    val merged = parts.reduce { (a, b) => MisraGries.merge(a, b, k); a }
    val n = data.size
    val exact = data.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    // every value with freq > N/k survives
    exact.filter(_._2 > n / k).keys.foreach(v => assert(merged.contains(v), s"$v missing"))
    assert(merged.size <= k - 1)
    // surviving counts underestimate by at most ~N/k per level of merging
    merged.foreach { case (v, c) =>
      assert(c <= exact.getOrElse(v, 0L), s"$v overcounted")
    }
  }

  // ---- Porter stemmer ----

  test("numeric_histogram merging regime: bounded buckets, conserved mass, ordered means") {
    val h = new graft.functions.NumHist(8)
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(10000)(rnd.nextGaussian() * 100)
    xs.foreach(x => h.add(x, 1.0))
    // merge a second shard, as a partial/final split would
    val ys = Array.fill(5000)(rnd.nextGaussian() * 100 + 50)
    val h2 = new graft.functions.NumHist(8)
    ys.foreach(x => h2.add(x, 1.0))
    h.mergeWith(h2)
    h.compact(8)
    assert(h.n == 8, s"expected 8 buckets, got ${h.n}")
    val totalW = (0 until h.n).map(h.weights).sum
    assert(math.abs(totalW - 15000.0) < 1e-6, s"mass not conserved: $totalW")
    val means = (0 until h.n).map(h.values)
    assert(means == means.sorted, "bucket means must stay ordered")
    val (lo, hi) = ((xs ++ ys).min, (xs ++ ys).max)
    assert(means.head >= lo && means.last <= hi, "means must stay within data range")
  }

  test("numeric_histogram exact while distinct <= buckets") {
    val h = new graft.functions.NumHist(10)
    val data = Seq(1.0, 2.0, 2.0, 3.0, 3.0, 3.0)
    data.foreach(h.add(_, 1.0))
    h.compact(10)
    val m = (0 until h.n).map(i => h.values(i) -> h.weights(i)).toMap
    assert(m == Map(1.0 -> 1.0, 2.0 -> 2.0, 3.0 -> 3.0))
  }

  test("porter stemmer known derivations") {
    val cases = Map(
      "running" -> "run", "cats" -> "cat", "happy" -> "happi",
      "agreed" -> "agree", "ponies" -> "poni", "caresses" -> "caress",
      "hopping" -> "hop", "falling" -> "fall",
      // *d rule must only strip doubled CONSONANTS (code-review finding)
      "seeing" -> "see", "agreeing" -> "agree", "cooed" -> "coo")
    cases.foreach { case (in, out) =>
      assert(ScalarFunctions.porterStem(in) == out, s"stem($in)")
    }
    assert(ScalarFunctions.porterStem(null) == null)
    assert(ScalarFunctions.porterStem("ab") == "ab") // too short to stem
  }

  // ---- SimHash ----

  test("simhash is deterministic and separates similar from different") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy cat again and again"
    val far = "completely unrelated words about database engines and columnar storage"
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ScalarFunctions.simhash64(base) == ScalarFunctions.simhash64(base))
    assert(hamming(ScalarFunctions.simhash64(base), ScalarFunctions.simhash64(near)) <
      hamming(ScalarFunctions.simhash64(base), ScalarFunctions.simhash64(far)))
  }

  // ---- scalar conversions (property-based, replacing the reference's
  // hand-enumerated cases) ----

  test("to_base/from_base round-trip (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val x = rnd.nextLong()
      Seq(2, 8, 16, 36).foreach { r =>
        assert(ScalarFunctions.fromBase(ScalarFunctions.toBase(x, r), r) == x)
      }
    }
  }

  test("ieee754 round-trip incl. specials (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    val specials = Seq(0.0, -0.0, Double.MaxValue, Double.MinPositiveValue,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
    (Seq.fill(500)(rnd.nextDouble() * math.pow(10, rnd.nextInt(200) - 100)) ++ specials)
      .foreach { d =>
        val back = ScalarFunctions.fromIeee754_64(ScalarFunctions.toIeee754_64(d))
        assert(back == d || (back.isNaN && d.isNaN))
      }
  }

  test("url encode/decode round-trip incl. unicode (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    val specials = Seq("", "a b", "a+b", "%20", "caf\u00e9 \u00fcber", "a&b=c?d#e/f")
    (Seq.fill(300)(rnd.nextString(20)) ++ specials).foreach { s =>
      assert(ScalarFunctions.urlDecode(ScalarFunctions.urlEncode(s)) == s)
    }
  }

  test("hmac sha256 matches published vector") {
    val out = ScalarFunctions.hmacSha256(
      "key".getBytes("UTF-8"),
      "The quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
    assert(out.map("%02x".format(_)).mkString ==
      "f7bc83f430538424b13298e6aa6fb143ef4d59a14946175997479dbc2d1a3cd8")
  }

  // ---- Function-registry tail (round 2): CDFs, hamming, endian codecs,
  // duration/data-size parsers, JSON predicates ----

  test("normal/beta cdfs match definitional constants and invert") {
    def r9(d: Double) = math.rint(d * 1e9) / 1e9
    assert(r9(ScalarFunctions.normalCdf(0, 1, -1.96)) == 0.024997895)
    assert(r9(ScalarFunctions.normalCdf(10, 5, 12.5)) == 0.691462461)
    assert(r9(ScalarFunctions.inverseNormalCdf(0, 1, 0.975)) == 1.959963985)
    assert(r9(ScalarFunctions.betaCdf(2, 5, 0.3)) == 0.579825)
    assert(r9(ScalarFunctions.betaCdf(0.5, 0.5, 0.25)) == 0.333333333)
    assert(r9(ScalarFunctions.inverseBetaCdf(2, 5, 0.5)) == 0.264449983)
    // inverse∘forward identity across the domain
    for (x <- Seq(-2.0, -0.5, 0.0, 1.3)) {
      assert(math.abs(ScalarFunctions.inverseNormalCdf(0, 1, ScalarFunctions.normalCdf(0, 1, x)) - x) < 1e-9)
    }
    for (v <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(ScalarFunctions.inverseBetaCdf(2, 5, ScalarFunctions.betaCdf(2, 5, v)) - v) < 1e-9)
    }
    intercept[IllegalArgumentException](ScalarFunctions.normalCdf(0, -1, 0))
    intercept[IllegalArgumentException](ScalarFunctions.betaCdf(2, 5, 1.5))
  }

  test("hamming_distance counts codepoints and rejects unequal lengths") {
    assert(ScalarFunctions.hammingDistance("abcde", "abcde") == 0L)
    assert(ScalarFunctions.hammingDistance("abcde", "abXdY") == 2L)
    assert(ScalarFunctions.hammingDistance("café", "cafe") == 1L)
    intercept[IllegalArgumentException](ScalarFunctions.hammingDistance("ab", "abc"))
    assert(ScalarFunctions.hammingDistance(null, "x") == null)
  }

  test("big-endian codecs round-trip and match bit patterns") {
    assert(ScalarFunctions.toBigEndian64(258L).map("%02x".format(_)).mkString == "0000000000000102")
    assert(ScalarFunctions.toBigEndian32(1).map("%02x".format(_)).mkString == "00000001")
    for (v <- Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, -123456789L)) {
      assert(ScalarFunctions.fromBigEndian64(ScalarFunctions.toBigEndian64(v)) == v)
    }
    for (v <- Seq(0, 1, -1, Int.MaxValue, Int.MinValue, -42)) {
      assert(ScalarFunctions.fromBigEndian32(ScalarFunctions.toBigEndian32(v)) == v)
    }
    intercept[IllegalArgumentException](ScalarFunctions.fromBigEndian64(Array[Byte](1, 2)))
  }

  test("parse_duration / parse_presto_data_size units") {
    assert(ScalarFunctions.durationToMillis(ScalarFunctions.parseDuration("1.5m")) == 90000L)
    assert(ScalarFunctions.durationToMillis(ScalarFunctions.parseDuration("129ms")) == 129L)
    assert(ScalarFunctions.durationToMillis(ScalarFunctions.parseDuration("2d")) == 172800000L)
    assert(ScalarFunctions.parseDataSize("2.3MB") == 2411724L)
    assert(ScalarFunctions.parseDataSize("100B") == 100L)
    assert(ScalarFunctions.parseDataSize("1kB") == 1024L)
    intercept[IllegalArgumentException](ScalarFunctions.parseDuration("5 parsecs"))
    intercept[IllegalArgumentException](ScalarFunctions.parseDataSize("x"))
  }

  test("json predicates/accessors: scalar, size, array get/contains") {
    assert(ScalarFunctions.isJsonScalar("42") == true)
    assert(ScalarFunctions.isJsonScalar("\"abc\"") == true)
    assert(ScalarFunctions.isJsonScalar("[1,2]") == false)
    assert(ScalarFunctions.isJsonScalar("{\"a\":1}") == false)
    assert(ScalarFunctions.isJsonScalar("not json") == null)
    assert(ScalarFunctions.jsonSize("""{"a":{"b":1,"c":2}}""", "$.a") == 2L)
    assert(ScalarFunctions.jsonSize("""{"a":{"b":1,"c":2}}""", "$.a.b") == 0L)
    assert(ScalarFunctions.jsonSize("""{"xs":[1,2,3]}""", "$.xs") == 3L)
    assert(ScalarFunctions.jsonSize("""{"a":1}""", "$.missing") == null)
    assert(ScalarFunctions.jsonArrayGet("[10,20,30]", 0) == "10")
    assert(ScalarFunctions.jsonArrayGet("[10,20,30]", -1) == "30")
    assert(ScalarFunctions.jsonArrayGet("[10,20,30]", 9) == null)
    assert(ScalarFunctions.jsonArrayGet("""["a","b"]""", 1) == "b")
    assert(ScalarFunctions.jsonArrayContains("[1,2,3]", "2") == true)
    assert(ScalarFunctions.jsonArrayContains("[1,2,3]", "7") == false)
    assert(ScalarFunctions.jsonArrayContains("""["a","b"]""", "b") == true)
    assert(ScalarFunctions.jsonArrayContains("[true,false]", "true") == true)
    assert(ScalarFunctions.jsonArrayContains("2", "2") == null) // not an array
  }

  test("split_to_multimap groups repeated keys in first-seen order") {
    val m = ScalarFunctions.splitToMultimap("a=1,a=2,b=3", ",", "=")
    assert(m("a") == Seq("1", "2"))
    assert(m("b") == Seq("3"))
    assert(m.keys.toSeq == Seq("a", "b"))
    intercept[IllegalArgumentException](ScalarFunctions.splitToMultimap("a=1,bad", ",", "="))
    // >1 kv-delimiter per entry is an error (SplitToMultimapFunction.java:84),
    // not a silent 'a' -> '1=2'
    intercept[IllegalArgumentException](ScalarFunctions.splitToMultimap("a=1=2", ",", "="))
  }

  test("json_extract_scalar returns NULL for containers, unquoted scalars otherwise") {
    import ScalarFunctions.jsonExtractScalar
    assert(jsonExtractScalar("""{"a":{"b":1}}""", "$.a") == null) // object -> NULL
    assert(jsonExtractScalar("""{"a":[1,2]}""", "$.a") == null)   // array -> NULL
    assert(jsonExtractScalar("""[1,2]""", "$") == null)           // root container -> NULL
    assert(jsonExtractScalar("""{"a":"x"}""", "$.a") == "x")      // string unquoted
    assert(jsonExtractScalar("""{"a":7.5}""", "$.a") == "7.5")    // number as JSON text
    assert(jsonExtractScalar("""{"a":true}""", "$.a") == "true")
    assert(jsonExtractScalar("""{"a":null}""", "$.a") == null)    // JSON null -> SQL NULL
    assert(jsonExtractScalar("""{"a":1}""", "$.b") == null)       // missing path
    assert(jsonExtractScalar("""{"a b":"v"}""", """$["a b"]""") == "v") // bracket dialect
  }

  test("parse_datetime maps Joda year to proleptic and defaults missing fields") {
    val ts = ScalarFunctions.parseDatetime("2001-07-04 10:30", "yyyy-MM-dd HH:mm")
    assert(ts.toInstant.toString == "2001-07-04T10:30:00Z")
    val dateOnly = ScalarFunctions.parseDatetime("2001-07-04", "yyyy-MM-dd")
    assert(dateOnly.toInstant.toString == "2001-07-04T00:00:00Z")
  }

  test("base64url uses the URL alphabet with padding and round-trips") {
    def hx(s: String) = ScalarFunctions.fromHex(s)
    assert(ScalarFunctions.toBase64Url(hx("01FBFF")) == "Afv_")  // std b64 would be Afv/
    assert(ScalarFunctions.toBase64Url(hx("01FB")) == "Afs=")
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt.toByte)
      assert(ScalarFunctions.fromBase64Url(ScalarFunctions.toBase64Url(b)).sameElements(b))
    }
  }

  test("ieee754_32 round-trips floats and matches the bit pattern") {
    assert(ScalarFunctions.toHex(ScalarFunctions.toIeee754_32(1.5f)) == "3FC00000")
    val rnd = new scala.util.Random(42)
    val specials = Seq(0.0f, -0.0f, Float.MaxValue, Float.MinPositiveValue,
      Float.PositiveInfinity, Float.NegativeInfinity, Float.NaN)
    (Seq.fill(300)(rnd.nextFloat() * math.pow(10, rnd.nextInt(60) - 30).toFloat) ++ specials)
      .foreach { f =>
        val back = ScalarFunctions.fromIeee754_32(ScalarFunctions.toIeee754_32(f))
        assert(back == f || (back.isNaN && f.isNaN))
      }
  }

  test("to_hex is uppercase; from_hex accepts either case and rejects odd length") {
    assert(ScalarFunctions.toHex(Array[Byte](1, -5)) == "01FB")
    assert(ScalarFunctions.fromHex("01fb").sameElements(Array[Byte](1, -5)))
    assert(ScalarFunctions.fromHex("01FB").sameElements(Array[Byte](1, -5)))
    intercept[IllegalArgumentException](ScalarFunctions.fromHex("abc"))
  }

  test("millisecond / year_of_week accessors") {
    assert(ScalarFunctions.millisecondOf(java.sql.Timestamp.valueOf("2001-08-22 03:04:05.321")) == 321L)
    assert(ScalarFunctions.millisecondOf(null) == null)
    // ISO week-based year straddles calendar years at both boundaries
    assert(ScalarFunctions.yearOfWeek(java.sql.Date.valueOf("2005-01-02")) == 2004L)
    assert(ScalarFunctions.yearOfWeek(java.sql.Date.valueOf("2008-12-31")) == 2009L)
    assert(ScalarFunctions.yearOfWeek(java.sql.Date.valueOf("2024-06-15")) == 2024L)
  }

  test("at_timezone / timezone_hour / timezone_minute are DST- and offset-aware") {
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    assert(ScalarFunctions.atTimezone(ts("2001-07-04T10:30:00Z"), "America/Los_Angeles")
      == "2001-07-04T03:30:00-07:00")
    assert(ScalarFunctions.timezoneHour(ts("2001-01-15T12:00:00Z"), "America/New_York") == -5L)
    assert(ScalarFunctions.timezoneHour(ts("2001-07-15T12:00:00Z"), "America/New_York") == -4L)
    assert(ScalarFunctions.timezoneMinute(ts("2001-07-15T12:00:00Z"), "Asia/Kathmandu") == 45L)
    assert(ScalarFunctions.timezoneHour(ts("2001-07-15T12:00:00Z"), "Asia/Kathmandu") == 5L)
  }

  // ---- ipaddress (IpAddressType.java:36, IpAddressOperators.java) ----

  test("ipaddress: v4 parses to the mapped 16-byte form and renders dotted-quad") {
    import graft.functions.IpFunctions._
    assert(ScalarFunctions.toHex(ipToBytes("1.2.3.4")) == "00000000000000000000FFFF01020304")
    assert(ipFromBytes(ipToBytes("255.255.255.255")) == "255.255.255.255")
    assert(ipFromBytes(ipToBytes("0.0.0.0")) == "0.0.0.0")
    intercept[IllegalArgumentException](ipToBytes("1.2.3"))
    intercept[IllegalArgumentException](ipToBytes("1.2.3.256"))
    intercept[IllegalArgumentException](ipToBytes("1.2.3.x"))
    intercept[IllegalArgumentException](ipFromBytes(Array[Byte](1, 2, 3)))
  }

  test("ipaddress: v6 parse + RFC 5952 canonical rendering") {
    import graft.functions.IpFunctions._
    // leftmost-longest zero-run compression, lowercase hex
    assert(ipFromBytes(ipToBytes("2001:0DB8:0000:0000:0000:0000:0000:0001")) == "2001:db8::1")
    assert(ipFromBytes(ipToBytes("2001:db8:0:1:0:0:0:1")) == "2001:db8:0:1::1")
    assert(ipFromBytes(ipToBytes("2001:0:0:1:0:0:0:1")) == "2001:0:0:1::1")
    assert(ipFromBytes(ipToBytes("::")) == "::")
    assert(ipFromBytes(ipToBytes("::1")) == "::1")
    assert(ipFromBytes(ipToBytes("fe80::")) == "fe80::")
    // single zero group is NOT compressed
    assert(ipFromBytes(ipToBytes("2001:db8:0:1:1:1:1:1")) == "2001:db8:0:1:1:1:1:1")
    // embedded v4 tail; plain mapped form renders as dotted-quad
    assert(ipFromBytes(ipToBytes("::ffff:1.2.3.4")) == "1.2.3.4")
    assert(ScalarFunctions.toHex(ipToBytes("64:ff9b::192.0.2.33")) == "0064FF9B0000000000000000C0000221")
    intercept[IllegalArgumentException](ipToBytes("1::2::3"))
    intercept[IllegalArgumentException](ipToBytes("1:2:3:4:5:6:7:8:9"))
    intercept[IllegalArgumentException](ipToBytes("12345::"))
    // embedded v4 must occupy the FINAL 32 bits (RFC 4291 §2.2.3):
    // a dotted token before a '::' fill can never be last, so reject
    intercept[IllegalArgumentException](ipToBytes("1.2.3.4::"))
    intercept[IllegalArgumentException](ipToBytes("::1.2.3.4:0"))
    intercept[IllegalArgumentException](ipToBytes("1:1.2.3.4::5"))
  }

  test("ipaddress: ordering via the byte form matches numeric order") {
    import graft.functions.IpFunctions._
    // unsigned byte comparison = address order (the reference's
    // comparison operators, IpAddressOperators.java:74-106)
    def lt(a: String, b: String): Boolean = {
      val (x, y) = (ipToBytes(a), ipToBytes(b))
      val i = x.zip(y).indexWhere { case (p, q) => p != q }
      i >= 0 && (x(i) & 255) < (y(i) & 255)
    }
    assert(lt("9.9.9.9", "10.0.0.0"))     // no string-order trap
    assert(lt("1.2.3.4", "1.2.3.5"))
    assert(lt("::1", "2001:db8::1"))
    assert(lt("1.2.3.4", "2001:db8::1")) // v4-mapped space sorts below 2001::/16
  }

  test("ipaddress: CIDR helpers — prefix, min/max, range, membership") {
    import graft.functions.IpFunctions._
    assert(ipPrefix("192.168.255.255", 9) == "192.128.0.0/9")
    assert(ipPrefix("1.2.3.4", 32) == "1.2.3.4/32")
    assert(ipPrefix("1.2.3.4", 0) == "0.0.0.0/0")
    assert(ipPrefix("2001:db8::8:800:200c:417a", 48) == "2001:db8::/48")
    assert(ipSubnetMin("192.64.1.1/9") == "192.0.0.0")
    assert(ipSubnetMax("192.64.1.1/9") == "192.127.255.255")
    assert(ipSubnetRange("10.1.2.3/24").toSeq == Seq("10.1.2.0", "10.1.2.255"))
    assert(ipSubnetMax("2001:db8::/126") == "2001:db8::3")
    assert(isSubnetOf("10.0.0.0/8", "10.255.0.1") == true)
    assert(isSubnetOf("10.0.0.0/8", "11.0.0.1") == false)
    assert(isSubnetOf("2001:db8::/32", "2001:db8:ff::1") == true)
    // a v6 probe never matches a v4 range (mapped space is ::ffff:0:0/96)
    assert(isSubnetOf("0.0.0.0/0", "2001:db8::1") == false)
    intercept[IllegalArgumentException](ipPrefix("1.2.3.4", 33))
    intercept[IllegalArgumentException](ipPrefix("::1", 129))
    intercept[IllegalArgumentException](ipSubnetMin("1.2.3.4"))
    // v4-ness is decided from the parsed VALUE: '::ffff:1.2.3.4' is an
    // IPv4 value, so its prefix is measured over the low 32 bits and
    // lengths >32 are rejected (the text form is irrelevant)
    assert(ipPrefix("::ffff:1.2.3.4", 24) == "1.2.3.0/24")
    assert(ipSubnetMax("::ffff:10.1.2.3/24") == "10.1.2.255")
    assert(isSubnetOf("::ffff:10.0.0.0/8", "10.255.0.1") == true)
    intercept[IllegalArgumentException](ipPrefix("::ffff:1.2.3.4", 33))
  }

  // ---- ML plugin (presto-ml) ----

  test("ml: regressor recovers exact linear coefficients (normal equations)") {
    import graft.functions.MlFunctions
    val samples = (0 until 200).map { i =>
      val x1 = (i * 7 % 100) / 10.0; val x2 = (i * 13 % 100) / 10.0
      (1.0 + 2.0 * x1 + 3.0 * x2, Array(x1, x2))
    }.toArray
    val model = MlFunctions.trainRegressor(samples)
    val coefs = model.stripPrefix("linreg:").split(",").map(_.toDouble)
    assert(math.abs(coefs(0) - 1.0) < 1e-6 && math.abs(coefs(1) - 2.0) < 1e-6 &&
      math.abs(coefs(2) - 3.0) < 1e-6, model)
    samples.foreach { case (y, x) =>
      assert(math.abs(MlFunctions.regress(Map(0L -> x(0), 1L -> x(1)), model) - y) < 1e-6)
    }
  }

  test("ml: classifier separates margin-separable data perfectly and deterministically") {
    import graft.functions.MlFunctions
    val all = (0 until 300).flatMap { i =>
      val x1 = (i * 7 % 100) / 10.0; val x2 = (i * 13 % 100) / 10.0
      val f = 2 * x1 + 3 * x2 - 25
      if (math.abs(f) <= 0.95) None
      else Some((if (f > 0.95) 1.0 else 0.0, Array(x1, x2)))
    }.toArray
    val model = MlFunctions.trainClassifier(all)
    all.foreach { case (y, x) =>
      assert(MlFunctions.classify(Map(0L -> x(0), 1L -> x(1)), model) == y.toLong,
        s"misclassified (${x(0)}, ${x(1)}) label $y")
    }
    // partitioning-invariance: the aggregate sorts its buffer before
    // training, so any arrival order yields the identical model string
    val shuffled = new scala.util.Random(42).shuffle(all.toSeq).toArray
    val viaSortedA = MlFunctions.trainClassifier(MlFunctions.sorted(
      new MlFunctions.Samples(scala.collection.mutable.ArrayBuffer(all.toSeq: _*))))
    val viaSortedB = MlFunctions.trainClassifier(MlFunctions.sorted(
      new MlFunctions.Samples(scala.collection.mutable.ArrayBuffer(shuffled.toSeq: _*))))
    assert(viaSortedA == viaSortedB)
  }

  test("multiclass learn/classify: one-vs-rest argmax separates 3 planted clusters exactly") {
    import graft.functions.MlFunctions
    val samples = (0 until 300).map { i =>
      val c = i % 3
      val x1 = (if (c == 1) 10.0 else 0.0) + (i * 7 % 30) / 20.0
      val x2 = (if (c == 2) 10.0 else 0.0) + (i * 13 % 30) / 20.0
      (c.toDouble, Array(x1, x2))
    }.toArray
    val model = MlFunctions.trainClassifier(samples)
    assert(model.startsWith("mlc:0.0|1.0|2.0;lr:"), model.take(40))
    samples.foreach { case (y, x) =>
      assert(MlFunctions.classify(Map(0L -> x(0), 1L -> x(1)), model) == y.toLong,
        s"misclassified cluster $y at (${x(0)}, ${x(1)})")
    }
    // binary inputs still produce the plain lr: model (oracle stability)
    val binary = samples.filter(_._1 < 2.0)
    assert(MlFunctions.trainClassifier(binary).startsWith("lr:"))
  }

  test("libsvm kernels: rbf (RFF) separates the disk-vs-ring set the linear kernel cannot") {
    import graft.functions.MlFunctions
    val all = (0 until 2000).flatMap { i =>
      val x1 = (i * 7919 % 201 - 100) / 100.0
      val x2 = (i * 104729 % 201 - 100) / 100.0
      val r2 = x1 * x1 + x2 * x2
      if (r2 < 0.35) Some((1.0, Array(x1, x2)))
      else if (r2 > 0.65) Some((0.0, Array(x1, x2)))
      else None
    }.toArray
    val rbf = MlFunctions.trainWithParams(all, "kernel=rbf,gamma=4", classifier = true)
    assert(rbf.startsWith("rff:2;"), rbf.take(30))
    val rbfErr = all.count { case (y, x) =>
      MlFunctions.classify(Map(0L -> x(0), 1L -> x(1)), rbf) != y.toLong }
    assert(rbfErr == 0, s"rbf misclassified $rbfErr of ${all.length}")
    val lin = MlFunctions.trainWithParams(all, "kernel=linear", classifier = true)
    val linErr = all.count { case (y, x) =>
      MlFunctions.classify(Map(0L -> x(0), 1L -> x(1)), lin) != y.toLong }
    assert(linErr > 0, "a linear separator cannot be exact on a disk-vs-ring labeling")
    // determinism: the fixed splitmix64 RFF stream yields the identical model text
    assert(rbf == MlFunctions.trainWithParams(all, "kernel=rbf,gamma=4", classifier = true))
  }

  test("libsvm kernels: poly degree=2 fits a quadratic target exactly; unsupported kinds raise") {
    import graft.functions.MlFunctions
    val samples = (0 until 300).map { i =>
      val x1 = (i * 7 % 100) / 10.0; val x2 = (i * 13 % 100) / 10.0
      (1.0 + 2 * x1 - x2 + 3 * x1 * x1 + 2 * x1 * x2 + 0.5 * x2 * x2, Array(x1, x2))
    }.toArray
    val m = MlFunctions.trainWithParams(samples, "kernel=poly,degree=2", classifier = false)
    assert(m.startsWith("poly2:2;linreg:"), m.take(30))
    samples.foreach { case (y, x) =>
      assert(math.abs(MlFunctions.regress(Map(0L -> x(0), 1L -> x(1)), m) - y) < 1e-6)
    }
    intercept[IllegalArgumentException] {
      MlFunctions.trainWithParams(samples, "kernel=chi2", classifier = true)
    }
    // param parsing mirrors LibSvmUtils: unknown keys ignored, defaults applied
    val p = MlFunctions.parseSvmParams("kernel=rbf,C=10,cache_size=100")
    assert(p.kernel == "rbf" && p.gamma == 0.0)
  }

  test("libsvm kernels: sigmoid and poly-3 classify via Nystrom landmarks (formerly raised)") {
    import graft.functions.MlFunctions
    // 1-D target sign(x^3 - x): THREE decision boundaries (-1, 0, 1).
    // A quadratic feature space [x, x^2] supports at most two sign
    // changes, so poly-2 cannot be exact; Nystrom poly-3 features are
    // linear combos of (g*x*l + c)^3 cubics and sigmoid features are
    // shifted tanh units — both express the boundary.
    val all = (-200 to 200).map(_ / 100.0)
      .filter(x => math.abs(x * x * x - x) > 0.08) // margin off the roots
      .map(x => (if (x * x * x - x > 0) 1.0 else 0.0, Array(x))).toArray
    def errors(model: String): Int = all.count { case (y, x) =>
      MlFunctions.classify(Map(0L -> x(0)), model) != y.toLong }
    val p3 = MlFunctions.trainWithParams(all, "kernel=poly,degree=3,gamma=1,coef0=1",
      classifier = true)
    assert(p3.startsWith("nys:1;"), p3.take(30))
    assert(errors(p3) == 0, s"poly-3 misclassified ${errors(p3)} of ${all.length}")
    val sig = MlFunctions.trainWithParams(all, "kernel=sigmoid,gamma=2,coef0=0",
      classifier = true)
    assert(sig.startsWith("nys:1;"), sig.take(30))
    assert(errors(sig).toDouble / all.length < 0.05,
      s"sigmoid misclassified ${errors(sig)} of ${all.length}")
    val p2 = MlFunctions.trainWithParams(all, "kernel=poly,degree=2", classifier = true)
    assert(errors(p2) > 0, "a quadratic cannot express three sign changes")
    // determinism: landmarks come from the KMV-ordered buffer, so the
    // model text is bit-identical across retrains
    assert(p3 == MlFunctions.trainWithParams(all, "kernel=poly,degree=3,gamma=1,coef0=1",
      classifier = true))
  }

  test("ML sample cap is KMV: retained subset is arrival-order-independent past the cap (r7 advice)") {
    import graft.functions.MlFunctions
    // n = cap + 20000: a keep-first cap would retain different subsets
    // for different arrival orders; bottom-k-by-hash must not.
    val n = MlFunctions.SampleCap + 20000
    val all = (0 until n).map(i => (i % 2.0, Array(i.toDouble, (i * 7 % 1000).toDouble)))
    val fwd = new MlFunctions.Samples(scala.collection.mutable.ArrayBuffer(all: _*))
    val rev = new MlFunctions.Samples(scala.collection.mutable.ArrayBuffer(all.reverse: _*))
    assert(fwd.size == MlFunctions.SampleCap && rev.size == MlFunctions.SampleCap)
    val a = MlFunctions.sorted(fwd).map { case (y, x) => (y, x.toSeq) }
    val b = MlFunctions.sorted(rev).map { case (y, x) => (y, x.toSeq) }
    assert(a.sameElements(b), "retained sample must not depend on arrival order")
    // merge-path equivalence: two half-reservoirs merged == one pass
    val (h1, h2) = all.splitAt(n / 2)
    val left = new MlFunctions.Samples(scala.collection.mutable.ArrayBuffer(h1: _*))
    val right = new MlFunctions.Samples(scala.collection.mutable.ArrayBuffer(h2: _*))
    right.heap.foreach { case (h, y, x) => left.addHashed(h, y, x) }
    val merged = MlFunctions.sorted(left).map { case (y, x) => (y, x.toSeq) }
    assert(merged.sameElements(a), "merge must equal the single-pass reservoir")
    // serde round-trip preserves the reservoir exactly
    val rt = MlFunctions.deserializeSamples(MlFunctions.serializeSamples(fwd))
    assert(MlFunctions.sorted(rt).map { case (y, x) => (y, x.toSeq) }.sameElements(a))
  }

  // ---- Color plugin (ColorFunctions.java) ----

  test("color value encoding: rgb packing, #rgb hex, system names") {
    import graft.functions.ColorFunctions._
    assert(rgb(255, 0, 170) == 0xFF00AAL)
    assert(colorOf("#f0a") == 0xFF00AAL) // single-nibble hex replicates
    assert(colorOf("red") == -2L && colorOf("green") == -3L &&
      colorOf("blue") == -5L && colorOf("white") == -8L)
    intercept[IllegalArgumentException](rgb(256, 0, 0))
    intercept[IllegalArgumentException](colorOf("mauve"))
  }

  test("color interpolation is linear in HSB (awt float path)") {
    import graft.functions.ColorFunctions._
    // endpoints exact
    assert(colorInterp(0.0, 0x123456L, 0xFEDCBAL) == 0x123456L)
    assert(colorInterp(1.0, 0x123456L, 0xFEDCBAL) == 0xFEDCBAL)
    // black->white midpoint: H=S=0, V=0.5 -> 0x808080
    assert(colorInterp(0.5, 0x000000L, 0xFFFFFFL) == 0x808080L)
    // out-of-range fraction clamps (reference ColorFunctions.java color(double,...))
    assert(colorScaled(-3.0, 0.0, 1.0, 0x000000L, 0xFFFFFFL) == 0x000000L)
    assert(colorScaled(9.0, 0.0, 1.0, 0x000000L, 0xFFFFFFL) == 0xFFFFFFL)
  }

  test("render and bar emit xterm-256 escapes") {
    import graft.functions.ColorFunctions._
    // red system color is index 1; 0xC86432 -> 16 + 4*36 + 2*6 + 1 = 173
    assert(render("x", colorOf("red")) == "[38;5;1mx[0m")
    assert(render("X", rgb(200, 100, 50)) == "[38;5;173mX[0m")
    val b = bar(0.5, 10, rgb(255, 0, 0), rgb(0, 255, 0))
    assert(b.count(_ == '█') == 5)
    assert(b.endsWith("[0m" + " " * 5)) // pad to width after reset
    assert(bar(0.0, 4, rgb(255, 0, 0), rgb(0, 255, 0)).count(_ == '█') == 0)
    assert(bar(1.0, 4, rgb(255, 0, 0), rgb(0, 255, 0)).count(_ == '█') == 4)
  }

  test("tstz packing: zone survives round-trips, offsets are DST-aware, Presto bit layout") {
    import graft.functions.TimestampTzFunctions._
    def wallMicros(s: String): Long =
      java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    // bit layout: (millisUtc << 12) | zoneKey, key 0 = UTC
    // (DateTimeEncoding.java:26-31, TimeZoneKey.java:41)
    val utcNoon = withTimezone(wallMicros("2020-06-01T12:00:00"), "UTC")
    assert((utcNoon & 0xFFFL) == 0L)
    assert(unpackMillis(utcNoon) ==
      java.time.Instant.parse("2020-06-01T12:00:00Z").toEpochMilli)
    // with_timezone interprets the WALL clock in the zone: noon in LA
    // winter = 20:00 UTC (PST, -8); summer = 19:00 UTC (PDT, -7)
    val winter = withTimezone(wallMicros("2020-01-15T12:00:00"), "America/Los_Angeles")
    val summer = withTimezone(wallMicros("2020-07-15T12:00:00"), "America/Los_Angeles")
    assert(unpackMillis(winter) == java.time.Instant.parse("2020-01-15T20:00:00Z").toEpochMilli)
    assert(unpackMillis(summer) == java.time.Instant.parse("2020-07-15T19:00:00Z").toEpochMilli)
    assert(offsetSeconds(winter) == -8 * 3600 && offsetSeconds(summer) == -7 * 3600,
      "timezone_hour must read the carried zone AT the carried instant (DST)")
    // at_timezone: instant fixed, zone re-tagged; zone survives a detour
    val tokyo = atTimezone(winter, "Asia/Tokyo")
    assert(unpackMillis(tokyo) == unpackMillis(winter))
    assert(unpackZone(atTimezone(tokyo, "America/Los_Angeles")) == "America/Los_Angeles")
    assert(offsetSeconds(tokyo) == 9 * 3600)
    // fixed-offset zones: +05:30 carries half-hour offsets
    val ist = withTimezone(wallMicros("2020-01-01T00:00:00"), "+05:30")
    assert(unpackZone(ist) == "+05:30" && offsetSeconds(ist) == 19800)
    // rendering preserves the wall clock of the carrying zone
    assert(format(winter) == "2020-01-15 12:00:00.000 America/Los_Angeles")
    assert(format(tokyo) == "2020-01-16 05:00:00.000 Asia/Tokyo")
    // zone keys: named zones round-trip through the 12-bit key space
    Seq("UTC", "Europe/Paris", "Asia/Kolkata", "America/Phoenix", "+14:00", "-09:15")
      .foreach(z => assert(zoneId(zoneKey(z)) == z, z))
    intercept[IllegalArgumentException](zoneKey("Not/AZone"))
  }

  test("tstz zone-key index persists: file order rules across sessions and tzdb reorderings") {
    import graft.functions.TimestampTzFunctions
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = Files.createTempDirectory("graft_tzidx")
    val idx = dir.resolve("zone-index.v1")
    val prev = sys.props.get("graft.tz.index")
    try {
      sys.props("graft.tz.index") = idx.toString
      TimestampTzFunctions.reloadZoneIndex()
      // first use writes the versioned index file (TimeZoneKey.java model)
      val k1 = TimestampTzFunctions.zoneKey("Asia/Tokyo")
      assert(Files.exists(idx), "first use must persist the index")
      val lines0 = new String(Files.readAllBytes(idx), UTF_8).split("\n").toSeq
      assert(lines0.head == "graft-zone-index v1")
      // key = 2048 + position in the FILE, and the same file read by a
      // "second session" (reload = fresh JVM) yields identical keys:
      // packed values round-trip across sessions.
      assert(k1 == 2048 + lines0.tail.indexOf("Asia/Tokyo"))
      val packed = TimestampTzFunctions.pack(1234567890123L, "Asia/Tokyo")
      TimestampTzFunctions.reloadZoneIndex()
      assert(TimestampTzFunctions.zoneKey("Asia/Tokyo") == k1)
      assert(TimestampTzFunctions.unpackZone(packed) == "Asia/Tokyo")
      // synthetically REORDER the index (what a key-from-local-tzdb
      // scheme would produce after a tzdb update): file order, not the
      // JVM's sorted list, must define the keys.
      Files.write(idx, (lines0.head +: lines0.tail.reverse).mkString("\n").getBytes(UTF_8))
      TimestampTzFunctions.reloadZoneIndex()
      val zones = lines0.tail.filter(_.nonEmpty)
      val kRev = TimestampTzFunctions.zoneKey("Asia/Tokyo")
      assert(kRev == 2048 + zones.reverse.indexOf("Asia/Tokyo"))
      assert(TimestampTzFunctions.unpackZone(
        TimestampTzFunctions.pack(7L, "Asia/Tokyo")) == "Asia/Tokyo")
      // a zone the file lacks but the JVM has APPENDS (existing keys
      // never move) and the file is rewritten
      val dropped = zones.reverse.last // drop the zone at the END of the reversed file
      Files.write(idx,
        (lines0.head +: zones.reverse.filterNot(_ == dropped)).mkString("\n").getBytes(UTF_8))
      TimestampTzFunctions.reloadZoneIndex()
      assert(TimestampTzFunctions.zoneKey("Asia/Tokyo") == kRev, "existing keys must not move")
      assert(TimestampTzFunctions.zoneKey(dropped) == 2048 + zones.length - 1,
        "unknown zones append at the end")
      val rewritten = new String(Files.readAllBytes(idx), UTF_8).split("\n").toSeq
      assert(rewritten.last == dropped, "append must be persisted")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.tz.index") = v
        case None => sys.props.remove("graft.tz.index")
      }
      TimestampTzFunctions.reloadZoneIndex()
      Files.deleteIfExists(idx)
      Files.deleteIfExists(idx.resolveSibling(idx.getFileName.toString + ".lock"))
      Files.deleteIfExists(dir)
    }
  }
}
