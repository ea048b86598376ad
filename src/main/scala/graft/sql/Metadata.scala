package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import scala.util.Try

/** Metadata statement family of the SQL front door: SHOW TABLES / SCHEMAS /
  * CATALOGS / COLUMNS / FUNCTIONS / CREATE TABLE, DESCRIBE, and
  * SHOW STATS FOR.
  *
  * Reference: `presto-parser/.../SqlBase.g4:71-87` (statement alternatives),
  * `presto-main/.../sql/rewrite/ShowQueriesRewrite.java` (output shapes:
  * SHOW TABLES -> "Table", SHOW SCHEMAS -> "Schema", SHOW CATALOGS ->
  * "Catalog", SHOW COLUMNS -> Column/Type/Extra/Comment, SHOW FUNCTIONS ->
  * Function/Return Type/Argument Types/Function Type/Deterministic/
  * Description, SHOW CREATE TABLE -> "Create Table"), and
  * `presto-main/.../sql/rewrite/ShowStatsRewrite.java:215-296` (SHOW STATS
  * columns column_name/data_size/distinct_values_count/nulls_fraction/
  * row_count/low_value/high_value; one row per column plus a summary row
  * whose only non-null stat is row_count).
  *
  * The reference rewrites each SHOW into a plain query over metadata the
  * engine already holds (`ShowQueriesRewrite` turns them into
  * information_schema queries; `ShowStatsRewrite` into a VALUES of
  * connector-provided `TableStatistics`). Same stance here: every statement
  * becomes a small DataFrame from the Spark catalog — except SHOW STATS,
  * which has no precomputed statistics to read for temp views over raw
  * parquet, so it COMPUTES them in one pass (the moral equivalent of Spark's
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS` followed by the
  * metadata read; a persistent deployment would cache the result in the
  * catalog exactly as the reference's connectors do).
  *
  * Scale notes for SHOW STATS at 100 TB: the plan is a UNION of one
  * single-column aggregate per column — parquet column pruning means each
  * branch reads only its own column, so total I/O across branches is one
  * pass over the table, and no branch carries an Expand the way a single
  * multi-count(DISTINCT) aggregate would. Exact NDV (count DISTINCT) is
  * deliberately used so the DuckDB oracle can verify values bit-for-bit;
  * the 100 TB path would flip those to approx_count_distinct (HLL), which
  * is also what the reference's ANALYZE collectors store.
  */
object Metadata {

  /** Spark DataType -> Presto type name (StandardTypes.java:18-45). */
  def prestoType(dt: DataType): String = dt match {
    case StringType       => "varchar"
    case LongType         => "bigint"
    case IntegerType      => "integer"
    case ShortType        => "smallint"
    case ByteType         => "tinyint"
    case DoubleType       => "double"
    case FloatType        => "real"
    case BooleanType      => "boolean"
    case BinaryType       => "varbinary"
    case DateType         => "date"
    case _: TimestampType => "timestamp"
    case TimestampNTZType => "timestamp"
    case d: DecimalType   => s"decimal(${d.precision},${d.scale})"
    case a: ArrayType     => s"array(${prestoType(a.elementType)})"
    case m: MapType       => s"map(${prestoType(m.keyType)}, ${prestoType(m.valueType)})"
    case s: StructType =>
      "row(" + s.fields.map(f => s"${f.name} ${prestoType(f.dataType)}").mkString(", ") + ")"
    case other => other.simpleString
  }

  private def sq(s: String): String = s.replace("'", "''")

  /** SQL LIKE filter over a one-column DataFrame (LIKE ... [ESCAPE ...]). */
  private def likeFilter(df: DataFrame, col: String, pattern: Option[String],
                         escape: Option[String]): DataFrame =
    pattern match {
      case None => df
      case Some(p) =>
        val esc = escape.map(e => s" ESCAPE '${sq(e)}'").getOrElse("")
        df.where(org.apache.spark.sql.functions.expr(s"`$col` LIKE '${sq(p)}'$esc"))
    }

  /** SHOW TABLES [FROM schema] [LIKE ...] -> one "Table" column, sorted.
    * Temp views (how the engine registers fixture tables) and catalog
    * tables both appear, as in the reference's information_schema.tables.
    */
  def showTables(spark: SparkSession, schema: Option[String], pattern: Option[String],
                 escape: Option[String]): DataFrame = {
    import spark.implicits._
    val ts = (schema match {
      case Some(db) => spark.catalog.listTables(db)
      case None     => spark.catalog.listTables()
    }).collect().map(_.name).distinct.sorted.toSeq
    likeFilter(ts.toDF("Table"), "Table", pattern, escape).orderBy("Table")
  }

  /** SHOW SCHEMAS [LIKE ...] -> "Schema". */
  def showSchemas(spark: SparkSession, pattern: Option[String],
                  escape: Option[String]): DataFrame = {
    import spark.implicits._
    val dbs = spark.catalog.listDatabases().collect().map(_.name).distinct.sorted.toSeq
    likeFilter(dbs.toDF("Schema"), "Schema", pattern, escape).orderBy("Schema")
  }

  /** SHOW CATALOGS [LIKE ...] -> "Catalog". */
  def showCatalogs(spark: SparkSession, pattern: Option[String]): DataFrame = {
    import spark.implicits._
    val cats = spark.catalog.listCatalogs().collect().map(_.name).distinct.sorted.toSeq
    likeFilter(cats.toDF("Catalog"), "Catalog", pattern, None).orderBy("Catalog")
  }

  /** SHOW COLUMNS FROM t / DESCRIBE t -> Column, Type (Presto names),
    * Extra ("partition key" for partition columns, else ""), Comment.
    */
  def showColumns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val schema = spark.table(table).schema
    val partitionCols: Set[String] =
      Try(spark.catalog.listColumns(table).collect().filter(_.isPartition).map(_.name).toSet)
        .getOrElse(Set.empty)
    schema.fields.toSeq.map { f =>
      val extra = if (partitionCols.contains(f.name)) "partition key" else ""
      val comment = f.getComment().getOrElse("")
      (f.name, prestoType(f.dataType), extra, comment)
    }.toDF("Column", "Type", "Extra", "Comment")
  }

  /** SHOW CREATE TABLE t -> one "Create Table" row with Presto-dialect DDL
    * (the reference formats via SqlFormatter: 3-space indent, one column
    * per line).
    */
  def showCreateTable(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val schema = spark.table(table).schema
    val cols = schema.fields
      .map(f => s"""   ${f.name} ${prestoType(f.dataType)}""")
      .mkString(",\n")
    val ddl = s"CREATE TABLE $table (\n$cols\n)"
    Seq(ddl).toDF("Create Table")
  }

  /** SHOW FUNCTIONS -> Function / Return Type / Argument Types /
    * Function Type / Deterministic / Description, sorted by name.
    *
    * Documented delta: Spark's function registry is untyped until analysis
    * binds a call site (ExpressionInfo carries no signature), so Return
    * Type / Argument Types are empty strings where the reference prints
    * concrete signatures; Function Type is derived from ExpressionInfo's
    * group tag, Description from its usage line.
    */
  def showFunctions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val reg = spark.sessionState.functionRegistry
    val rows = reg.listFunction().map { fi =>
      val info = reg.lookupFunction(fi)
      val group = info.map(_.getGroup).getOrElse("")
      val fnType = group match {
        case g if g != null && g.contains("agg")    => "aggregate"
        case g if g != null && g.contains("window") => "window"
        case _                                      => "scalar"
      }
      val desc = info.map(i => Option(i.getUsage).getOrElse("")).getOrElse("")
        .replaceAll("\\s+", " ").trim
      (fi.funcName, "", "", fnType, true, desc)
    }.distinct.sortBy(_._1)
    rows.toDF("Function", "Return Type", "Argument Types", "Function Type",
      "Deterministic", "Description")
  }

  /** Fixed-width sizes per the reference's FixedWidthType implementations
    * (used by DESCRIBE OUTPUT's Type Size column; variable-width -> 0). */
  private def typeSize(dt: DataType): Long = dt match {
    case LongType | DoubleType | _: TimestampType | TimestampNTZType => 8L
    case IntegerType | DateType | FloatType                          => 4L
    case ShortType                                                   => 2L
    case ByteType | BooleanType                                      => 1L
    case d: DecimalType                                              => if (d.precision <= 18) 8L else 16L
    case _                                                           => 0L
  }

  /** DESCRIBE INPUT name (DescribeInputRewrite.java:118-144): one
    * (Position, Type) row per `?` parameter of the prepared statement,
    * ordered by position; a statement with no parameters yields the
    * single all-null row the reference emits. Documented delta: the
    * reference runs type coercion analysis to name each parameter's
    * type; Spark has no unbound-parameter analysis, so Type is the
    * reference's own "unknown" placeholder for every position.
    */
  def describeInput(spark: SparkSession, preparedText: String): DataFrame = {
    import spark.implicits._
    // count '?' outside string literals (same scan as EXECUTE binding)
    var in = false
    var n = 0
    preparedText.foreach {
      case '\'' => in = !in
      case '?' if !in => n += 1
      case _ =>
    }
    if (n == 0)
      Seq((null.asInstanceOf[java.lang.Long], null.asInstanceOf[String]))
        .toDF("Position", "Type")
    else (0 until n).map(i => (i.toLong, "unknown")).toDF("Position", "Type")
  }

  /** DESCRIBE OUTPUT name (DescribeOutputRewrite.java:107-155): one row
    * per output column — Column Name, Catalog/Schema/Table, Type,
    * Type Size, Aliased. Parameters are bound to NULL for analysis (the
    * reference analyzes with placeholder parameters the same way).
    * Documented delta: Spark's analyzed schema does not carry per-column
    * origin-table lineage, so Catalog/Schema/Table are empty and Aliased
    * is false — the fields the reference fills from Field.getOriginTable.
    */
  def describeOutput(spark: SparkSession, preparedSql: String): DataFrame = {
    import spark.implicits._
    val sb = new StringBuilder
    var in = false
    preparedSql.foreach { c =>
      if (c == '\'') { in = !in; sb.append(c) }
      else if (c == '?' && !in) sb.append("NULL")
      else sb.append(c)
    }
    val schema = spark.sql(sb.toString).schema
    schema.fields.toSeq
      .map(f => (f.name, "", "", "", prestoType(f.dataType), typeSize(f.dataType), false))
      .toDF("Column Name", "Catalog", "Schema", "Table", "Type", "Type Size", "Aliased")
  }

  /** EXPLAIN (TYPE ..., FORMAT ...) — ExplainRewrite.java:116-140:
    * VALIDATE analyzes only and returns one "Valid"=true row; LOGICAL /
    * DISTRIBUTED return the one-row "Query Plan" text (optimized logical
    * plan / physical plan — the reference's fragmented distributed plan
    * maps to Spark's exchanged-marked physical plan); IO returns the
    * IOPlanPrinter.java JSON of input tables (catalog/schema/table, one
    * entry per scanned relation, sorted). FORMAT JSON serializes the
    * plan tree via Catalyst's own toJSON; GRAPHVIZ is not supported
    * (documented — the reference shells out to graphviz rendering).
    */
  def explainTyped(spark: SparkSession, sql: String, planType: String,
      format: String): DataFrame = {
    import spark.implicits._
    require(format != "GRAPHVIZ", "FORMAT GRAPHVIZ is not supported (TEXT or JSON)")
    val qe = spark.sql(sql).queryExecution
    planType match {
      case "VALIDATE" =>
        qe.analyzed // analysis errors propagate; reaching here means valid
        Seq(true).toDF("Valid")
      case "LOGICAL" =>
        val text = if (format == "JSON") qe.optimizedPlan.toJSON
          else qe.optimizedPlan.treeString
        Seq(text).toDF("Query Plan")
      case "DISTRIBUTED" =>
        val text = if (format == "JSON") qe.executedPlan.toJSON
          else qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        Seq(text).toDF("Query Plan")
      case "IO" =>
        // input tables from the analyzed tree: temp-view scans surface as
        // SubqueryAlias directly over a relation leaf, catalog tables via
        // their identifier. Sorted for determinism.
        import org.apache.spark.sql.catalyst.plans.logical._
        val names = scala.collection.mutable.SortedSet.empty[String]
        def walk(p: LogicalPlan): Unit = p match {
          // temp views resolve as SubqueryAlias(name, View(leaf)); direct
          // DataFrame-registered views as SubqueryAlias(name, leaf)
          case SubqueryAlias(id, v: View) if v.child.children.isEmpty =>
            names += id.name
          case SubqueryAlias(id, child) if child.children.isEmpty =>
            names += id.name
          case other =>
            other.children.foreach(walk)
            other.subqueries.foreach(walk)
        }
        walk(qe.analyzed)
        val entries = names.toSeq.map { t =>
          s"""{"table":{"catalog":"spark_catalog","schemaTable":{"schema":"default","table":"$t"}}}"""
        }
        Seq(entries.mkString("{\"inputTableColumnInfos\":[", ",", "]}"))
          .toDF("Query Plan")
      case other =>
        throw new IllegalArgumentException(s"unknown EXPLAIN type: $other")
    }
  }

  /** SHOW STATS FOR t / SHOW STATS FOR (SELECT * FROM t WHERE p).
    *
    * One row per column + a summary row (ShowStatsRewrite.java:255-296):
    *  - data_size: total bytes, varchar/varbinary only (fixed-width types
    *    are derivable from row_count; the reference likewise only stores
    *    data size for variable-width columns)
    *  - distinct_values_count: exact NDV (nulls excluded)
    *  - nulls_fraction
    *  - row_count: NULL on column rows, set on the summary row
    *  - low_value/high_value: rendered as varchar for ordered primitive
    *    types (the reference renders its numeric DoubleRange back through
    *    the column type); NULL for variable-width/nested types.
    *
    * The WHERE variant mirrors the reference's pushdown-constraint path
    * (stats for the filtered slice). Plan shape: UNION ALL of per-column
    * single-column aggregates — see the object doc for why that is the
    * scale-right layout.
    */
  def showStats(spark: SparkSession, table: String, where: Option[String]): DataFrame = {
    val schema = spark.table(table).schema
    val filter = where.map(w => s" WHERE $w").getOrElse("")
    val branches = schema.fields.map { f =>
      val c = s"`${f.name}`"
      val dataSize = f.dataType match {
        case StringType | BinaryType => s"CAST(sum(length($c)) AS DOUBLE)"
        case _                       => "CAST(NULL AS DOUBLE)"
      }
      def rng(agg: String): String = f.dataType match {
        case DoubleType | FloatType =>
          // fixed-scale render so the text is engine-independent
          s"CAST(CAST($agg($c) AS DECIMAL(38,6)) AS STRING)"
        case _: TimestampType | TimestampNTZType =>
          s"date_format($agg($c), 'yyyy-MM-dd HH:mm:ss')"
        case ByteType | ShortType | IntegerType | LongType | DateType | BooleanType |
             _: DecimalType =>
          s"CAST($agg($c) AS STRING)"
        case _ => "CAST(NULL AS STRING)"
      }
      s"""SELECT '${sq(f.name)}' AS column_name,
         |  $dataSize AS data_size,
         |  CAST(count(DISTINCT $c) AS DOUBLE) AS distinct_values_count,
         |  CAST(count(*) - count($c) AS DOUBLE) / count(*) AS nulls_fraction,
         |  CAST(NULL AS DOUBLE) AS row_count,
         |  ${rng("min")} AS low_value,
         |  ${rng("max")} AS high_value
         |FROM $table$filter""".stripMargin
    }
    val summary =
      s"""SELECT CAST(NULL AS STRING) AS column_name,
         |  CAST(NULL AS DOUBLE) AS data_size,
         |  CAST(NULL AS DOUBLE) AS distinct_values_count,
         |  CAST(NULL AS DOUBLE) AS nulls_fraction,
         |  CAST(count(*) AS DOUBLE) AS row_count,
         |  CAST(NULL AS STRING) AS low_value,
         |  CAST(NULL AS STRING) AS high_value
         |FROM $table$filter""".stripMargin
    spark.sql((branches :+ summary).mkString("\nUNION ALL\n"))
  }
}
