package graft.sql

import org.apache.spark.sql.SparkSession

/** Per-user/source default session properties — the reference's session
  * property managers (presto-session-property-managers/.../
  * FileSessionPropertyManager.java: every SessionMatchSpec whose
  * user/source regexes match contributes its `sessionProperties`, in
  * file order with later matches overriding;
  * SessionMatchSpec.java:42-47 is the JSON shape; QuerySessionSupplier
  * merges the result UNDER the client's explicit properties).
  *
  * Here: configured defaults surface in SHOW SESSION and their
  * Spark-conf analogs are applied for the statement's lifetime, but an
  * explicit SET SESSION (or a client-carried X-Presto-Session header)
  * always wins — the same layering the reference guarantees.
  */
object SessionDefaults {

  final case class MatchSpec(
      user: Option[scala.util.matching.Regex],
      source: Option[scala.util.matching.Regex],
      sessionProperties: Seq[(String, String)])

  private val configs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Seq[MatchSpec]]())

  /** Install match specs from the reference's JSON file shape:
    * `{"sessionProperties": [ {"user": re?, "source": re?,
    * "sessionProperties": {k: v, ...}}, ... ]}` (also accepts a bare
    * top-level array). Replaces any previous configuration. */
  def configure(spark: SparkSession, jsonPath: String): Unit =
    configure(spark, parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(jsonPath)),
      java.nio.charset.StandardCharsets.UTF_8)))

  def configure(spark: SparkSession, specs: Seq[MatchSpec]): Unit =
    configs.put(spark, specs)

  def disable(spark: SparkSession): Unit = configs.remove(spark)

  private[graft] def parse(jsonText: String): Seq[MatchSpec] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(jsonText)
    val arr = if (root.isArray) root else root.get("sessionProperties")
    val b = Seq.newBuilder[MatchSpec]
    if (arr != null) arr.forEach { s =>
      val props = Seq.newBuilder[(String, String)]
      Option(s.get("sessionProperties")).foreach { p =>
        p.fields().forEachRemaining(e => props += (e.getKey -> e.getValue.asText()))
      }
      b += MatchSpec(
        user = Option(s.get("user")).map(_.asText().r),
        source = Option(s.get("source")).map(_.asText().r),
        sessionProperties = props.result())
    }
    b.result()
  }

  /** Combined defaults for (user, source): every matching spec
    * contributes, later specs override earlier ones (the reference's
    * putAll loop). Empty when unconfigured. */
  def defaultsFor(spark: SparkSession, user: String, source: String): Seq[(String, String)] = {
    val specs = configs.get(spark)
    if (specs == null) Seq.empty
    else {
      val merged = scala.collection.mutable.LinkedHashMap.empty[String, String]
      specs.foreach { s =>
        if (s.user.forall(_.matches(user)) && s.source.forall(_.matches(source)))
          s.sessionProperties.foreach { case (k, v) => merged.put(k.toLowerCase, v) }
      }
      merged.toSeq
    }
  }
}
