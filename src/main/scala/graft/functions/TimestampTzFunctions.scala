package graft.functions

import org.apache.spark.sql.SparkSession

/** Zone-carrying TIMESTAMP WITH TIME ZONE (reference:
  * presto-spi/.../DateTimeEncoding.java:26-62 — value is a BIGINT
  * packing `(millisUtc << 12) | zoneKey`, 4096 zone keys;
  * TimeZoneKey.java:41 key 0 = UTC, offset zones ±14h, named region
  * zones from a fixed index).
  *
  * Spark's TimestampType is instant-only (session-zone rendering), so a
  * faithful tstz needs the reference's packed-BIGINT carrier surfaced
  * through functions — exactly how the reference's engine treats the
  * type (a long; all zone logic lives in the functions):
  *
  *  - with_timezone(ts, zone)     wall-clock ts interpreted IN zone -> packed
  *  - at_timezone(packed, zone)   same instant, new zone           -> packed
  *  - timezone_hour/_minute(packed)  offset of the carried zone AT that
  *    instant (DST-aware via java.time rules)
  *  - tz_millis/tz_zone/tz_format(packed)  unpack + Presto rendering
  *  - current_timezone()          session zone
  *
  * Zone keys: 0 = UTC (reference TimeZoneKey.java:41); fixed-offset
  * zones get key 1024 + offsetMinutes (±840 fits the 12-bit mask);
  * named region zones get keys 2048.. assigned over the SORTED JVM tzdb
  * id list — deterministic within a JVM, the packed value is not
  * exchanged across tzdb versions (the reference pins a zone-index file
  * instead; documented delta).
  *
  * Scale: pure per-row long arithmetic + java.time offset lookup;
  * map-side, shuffle-free, no driver state.
  */
object TimestampTzFunctions {

  private val MillisShift = 12
  private val ZoneMask = 0xFFFL
  private val OffsetBase = 1024
  private val NamedBase = 2048

  private lazy val namedZones: Array[String] = {
    import scala.jdk.CollectionConverters._
    java.time.ZoneId.getAvailableZoneIds.asScala.toArray.sorted
  }
  private lazy val namedToKey: Map[String, Int] =
    namedZones.zipWithIndex.map { case (z, i) => z -> (NamedBase + i) }.toMap

  def zoneKey(zoneId: String): Int = zoneId match {
    case "UTC" | "Z" | "+00:00" => 0
    case z if z.startsWith("+") || z.startsWith("-") =>
      val off = java.time.ZoneOffset.of(z)
      val minutes = off.getTotalSeconds / 60
      require(minutes % 1 == 0 && math.abs(minutes) <= 14 * 60,
        s"offset out of range: $z")
      OffsetBase + minutes
    case z =>
      namedToKey.getOrElse(z,
        throw new IllegalArgumentException(s"unknown time zone: $z"))
  }

  def zoneId(key: Int): String = key match {
    case 0 => "UTC"
    case k if k >= NamedBase =>
      val i = k - NamedBase
      require(i < namedZones.length, s"unknown zone key: $k")
      namedZones(i)
    case k if k >= OffsetBase - 14 * 60 && k <= OffsetBase + 14 * 60 =>
      val minutes = k - OffsetBase
      val sign = if (minutes < 0) "-" else "+"
      f"$sign${math.abs(minutes) / 60}%02d:${math.abs(minutes) % 60}%02d"
    case k => throw new IllegalArgumentException(s"unknown zone key: $k")
  }

  def pack(millisUtc: Long, zone: String): Long =
    (millisUtc << MillisShift) | (zoneKey(zone) & ZoneMask)

  def unpackMillis(packed: Long): Long = packed >> MillisShift
  def unpackZone(packed: Long): String = zoneId((packed & ZoneMask).toInt)

  private def javaZone(packed: Long): java.time.ZoneId = {
    val z = unpackZone(packed)
    if (z.startsWith("+") || z.startsWith("-")) java.time.ZoneOffset.of(z)
    else java.time.ZoneId.of(z)
  }

  /** Offset seconds of the carried zone at the carried instant
    * (DST-aware). */
  def offsetSeconds(packed: Long): Int =
    javaZone(packed).getRules
      .getOffset(java.time.Instant.ofEpochMilli(unpackMillis(packed)))
      .getTotalSeconds

  /** with_timezone: wall-clock micros-since-epoch (as read from a Spark
    * TimestampType under a UTC session) interpreted in `zone`. */
  def withTimezone(wallMicrosUtc: Long, zone: String): Long = {
    val local = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(wallMicrosUtc, 1000000L),
      (Math.floorMod(wallMicrosUtc, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val zid = if (zone.startsWith("+") || zone.startsWith("-"))
      java.time.ZoneOffset.of(zone) else java.time.ZoneId.of(zone)
    pack(local.atZone(zid).toInstant.toEpochMilli, zone)
  }

  /** at_timezone: same instant, re-tagged zone. */
  def atTimezone(packed: Long, zone: String): Long =
    pack(unpackMillis(packed), zone)

  /** Presto rendering: `yyyy-MM-dd HH:mm:ss.SSS <zone>`. */
  def format(packed: Long): String = {
    val inst = java.time.Instant.ofEpochMilli(unpackMillis(packed))
    val zdt = inst.atZone(javaZone(packed))
    val f = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
    s"${f.format(zdt)} ${unpackZone(packed)}"
  }

  /** Spark's UDF registry has no overloading, and the Presto names
    * at_timezone/timezone_hour/timezone_minute are already taken by the
    * timestamp-typed convenience forms (func_datetime3). The
    * packed-BIGINT variants therefore carry a tz_ prefix — same
    * semantics, disambiguated by name instead of argument type
    * (documented delta). */
  def install(spark: SparkSession): Unit = {
    spark.udf.register("with_timezone", (ts: java.sql.Timestamp, zone: String) =>
      if (ts == null || zone == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(withTimezone(
        ts.getTime * 1000L + (ts.getNanos / 1000) % 1000, zone)))
    spark.udf.register("tz_at_timezone", (packed: java.lang.Long, zone: String) =>
      if (packed == null || zone == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(atTimezone(packed, zone)))
    spark.udf.register("tz_timezone_hour", (packed: java.lang.Long) =>
      if (packed == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(offsetSeconds(packed) / 3600L))
    spark.udf.register("tz_timezone_minute", (packed: java.lang.Long) =>
      if (packed == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf((offsetSeconds(packed) / 60L) % 60L))
    spark.udf.register("tz_millis", (packed: java.lang.Long) =>
      if (packed == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(unpackMillis(packed)))
    spark.udf.register("tz_zone", (packed: java.lang.Long) =>
      if (packed == null) null else unpackZone(packed))
    spark.udf.register("tz_format", (packed: java.lang.Long) =>
      if (packed == null) null else format(packed))
  }
}
