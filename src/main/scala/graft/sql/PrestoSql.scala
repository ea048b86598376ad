package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  private val dateAdd = """(?i)date_add\s*\(\s*'(\w+)'\s*,""".r
  private val dateDiff = """(?i)date_diff\s*\(\s*'(\w+)'\s*,""".r
  private val bareVarchar = """(?i)AS\s+VARCHAR\s*\)""".r

  def rewrite(sql: String): String = {
    var out = sql
    out = dateAdd.replaceAllIn(out, m => s"timestampadd(${m.group(1).toUpperCase},")
    out = dateDiff.replaceAllIn(out, m => s"timestampdiff(${m.group(1).toUpperCase},")
    out = bareVarchar.replaceAllIn(out, "AS STRING)")
    out
  }

  /** Run Presto-dialect SQL on the graft engine. */
  def sql(spark: SparkSession, text: String): DataFrame = {
    graft.functions.FunctionRegistry.installAll(spark)
    spark.sql(rewrite(text))
  }
}
