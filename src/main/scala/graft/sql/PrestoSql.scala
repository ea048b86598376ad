package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.matching.Regex

/** Thin Presto-dialect SQL front door (SURVEY §7.0 graft.sql): installs
  * the Presto-named function aliases and applies light textual rewrites
  * for constructs whose syntax differs, then delegates to spark.sql (the
  * real parser/analyzer/optimizer — we do NOT rebuild those layers).
  *
  * Handled dialect deltas (reference: presto-docs functions + SqlBase.g4):
  *  - date_add('unit', n, ts)  -> timestampadd(unit, n, ts)
  *  - date_diff('unit', a, b)  -> timestampdiff(unit, a, b)
  *  - CAST(.. AS VARCHAR)      -> CAST(.. AS STRING) (bare varchar)
  *  - approx_distinct / strpos / arbitrary / codepoint — via registered
  *    aliases (FunctionRegistry), no rewrite needed.
  * Everything else (||, LIKE/ESCAPE, lambdas x -> x, TRY_CAST, INTERVAL,
  * GROUPING SETS, window frames ...) parses identically in Spark SQL.
  */
object PrestoSql {

  // TRY( must not swallow try_cast/try_divide/...: require a word
  // boundary before TRY and no word char after it.
  private val combined: Regex =
    """(?i)(date_add\s*\(\s*'(\w+)'\s*,)|(date_diff\s*\(\s*'(\w+)'\s*,)|(AS\s+VARCHAR\s*\))|(?<![\w.])(TRY\s*\()""".r

  /** Rewrite in one pass over the original text, skipping any match that
    * starts inside a single-quoted string literal ('' escapes handled) —
    * query constants are never corrupted. (The date_add unit itself is a
    * literal, but the match *starts* at the function name, outside it.)
    */
  def rewrite(sql: String): String = {
    val inLit = new Array[Boolean](sql.length)
    var i = 0
    var in = false
    while (i < sql.length) {
      if (sql(i) == '\'') {
        if (in && i + 1 < sql.length && sql(i + 1) == '\'') {
          inLit(i) = true; inLit(i + 1) = true; i += 1
        } else { in = !in; inLit(i) = true }
      } else inLit(i) = in
      i += 1
    }
    combined.replaceAllIn(sql, m =>
      if (inLit(m.start)) Regex.quoteReplacement(m.matched)
      else if (m.group(1) != null) s"timestampadd(${m.group(2).toUpperCase},"
      else if (m.group(3) != null) s"timestampdiff(${m.group(4).toUpperCase},"
      else if (m.group(6) != null) "try_eval("
      else "AS STRING)")
  }

  /** Run Presto-dialect SQL on the graft engine. */
  def sql(spark: SparkSession, text: String): DataFrame = {
    graft.functions.FunctionRegistry.installAll(spark)
    spark.sql(rewrite(text))
  }
}
