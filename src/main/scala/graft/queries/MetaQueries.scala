package graft.queries

import org.apache.spark.sql.SparkSession
import graft.sql.PrestoSql

/** Metadata statement family through the SQL front door: SHOW COLUMNS /
  * DESCRIBE, SHOW TABLES/SCHEMAS, SHOW CREATE TABLE, SHOW FUNCTIONS, and
  * SHOW STATS FOR (table and filtered-query forms).
  *
  * Reference: SqlBase.g4:71-87; output shapes from ShowQueriesRewrite.java
  * and ShowStatsRewrite.java (see graft.sql.Metadata). The SHOW STATS
  * oracles are REAL aggregate SQL over the same parquet — DuckDB recomputes
  * NDV / null fractions / ranges independently, so the statistics values
  * themselves are verified, not just the statement plumbing.
  */
object MetaQueries extends QueryModule {

  private def fd(s: SparkSession, sql: String) = PrestoSql.sql(s, sql)

  def queries: Seq[Q] = Seq(

    // SHOW COLUMNS FROM t — Column/Type/Extra/Comment with Presto type
    // names (ShowQueriesRewrite.java:315-318).
    Q("meta_show_columns",
      """SELECT * FROM (VALUES
        |  ('o_orderkey',    'bigint',    '', ''),
        |  ('o_custkey',     'bigint',    '', ''),
        |  ('o_orderstatus', 'varchar',   '', ''),
        |  ('o_totalprice',  'double',    '', ''),
        |  ('o_orderdate',   'timestamp', '', ''),
        |  ('o_orderpriority','varchar',  '', '')
        |) AS t("Column", "Type", "Extra", "Comment")""".stripMargin) { (s, _) =>
      fd(s, "SHOW COLUMNS FROM orders")
    },

    // SHOW TABLES LIKE pattern — single "Table" column, LIKE-filtered
    // (ShowQueriesRewrite.java:204).
    Q("meta_show_tables",
      """SELECT 'nation' AS "Table"""") { (s, _) =>
      fd(s, "SHOW TABLES LIKE 'nat%'")
    },

    // SHOW SCHEMAS — single "Schema" column (ShowQueriesRewrite.java:277).
    Q("meta_show_schemas",
      """SELECT 'default' AS "Schema"""") { (s, _) =>
      fd(s, "SHOW SCHEMAS LIKE 'def%'")
    },

    // SHOW CREATE TABLE — one "Create Table" row of Presto-dialect DDL
    // (ShowQueriesRewrite.java:412; SqlFormatter 3-space indent).
    Q("meta_show_create_table",
      """SELECT 'CREATE TABLE region (' || chr(10) ||
        |       '   r_regionkey integer,' || chr(10) ||
        |       '   r_name varchar' || chr(10) ||
        |       ')' AS "Create Table"""".stripMargin) { (s, _) =>
      fd(s, "SHOW CREATE TABLE region")
    },

    // SHOW FUNCTIONS — Presto-named functions the registry installs are
    // listed (ShowQueriesRewrite.java:464-499). Pinned to a fixed name
    // slice so the oracle is stable across Spark builtin growth.
    Q("meta_show_functions",
      """SELECT * FROM (VALUES
        |  ('approx_distinct', true),
        |  ('arbitrary',       true),
        |  ('codepoint',       true),
        |  ('strpos',          true),
        |  ('to_iso8601',      true),
        |  ('truncate',        true)
        |) AS t("Function", "Deterministic")""".stripMargin) { (s, _) =>
      import s.implicits._
      fd(s, "SHOW FUNCTIONS")
        .where($"Function".isin("approx_distinct", "arbitrary", "codepoint",
          "strpos", "to_iso8601", "truncate"))
        .select("Function", "Deterministic")
    },

    // DESCRIBE INPUT — one (Position, Type) row per ? parameter
    // (DescribeInputRewrite.java:118-144; Type is the reference's own
    // "unknown" placeholder absent coercion analysis).
    Q("meta_describe_input",
      """SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'unknown'),
        |                      (CAST(1 AS BIGINT), 'unknown'))
        |  AS t("Position", "Type")""".stripMargin) { (s, _) =>
      fd(s, "PREPARE graft_di FROM SELECT l_orderkey FROM lineitem WHERE l_quantity > ? AND l_partkey = ?")
      fd(s, "DESCRIBE INPUT graft_di")
    },

    // DESCRIBE OUTPUT — per-column name/type/size rows
    // (DescribeOutputRewrite.java:107-155; origin-table lineage not
    // tracked by Spark's schema -> empty Catalog/Schema/Table, see
    // Metadata.describeOutput).
    Q("meta_describe_output",
      """SELECT * FROM (VALUES
        |  ('l_returnflag', '', '', '', 'varchar', CAST(0 AS BIGINT), false),
        |  ('sum_qty',      '', '', '', 'double',  CAST(8 AS BIGINT), false))
        |  AS t("Column Name", "Catalog", "Schema", "Table", "Type", "Type Size", "Aliased")""".stripMargin) { (s, _) =>
      fd(s, "PREPARE graft_do FROM SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY l_returnflag")
      fd(s, "DESCRIBE OUTPUT graft_do")
    },

    // EXPLAIN (TYPE VALIDATE) — ExplainRewrite.java:123: analysis-only,
    // single "Valid"=true row.
    Q("meta_explain_validate",
      """SELECT true AS "Valid"""") { (s, _) =>
      fd(s, "EXPLAIN (TYPE VALIDATE) SELECT l_orderkey FROM lineitem WHERE l_quantity > 0")
    },

    // EXPLAIN (TYPE IO) — IOPlanPrinter.java JSON of scanned tables.
    Q("meta_explain_io",
      """SELECT '{"inputTableColumnInfos":[' ||
        |  '{"table":{"catalog":"spark_catalog","schemaTable":{"schema":"default","table":"lineitem"}}},' ||
        |  '{"table":{"catalog":"spark_catalog","schemaTable":{"schema":"default","table":"orders"}}}' ||
        |  ']}' AS "Query Plan"""".stripMargin) { (s, _) =>
      fd(s, "EXPLAIN (TYPE IO) SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
    },

    // SHOW STATS FOR orders — per-column NDV / null fraction / data size /
    // range plus the row_count summary row, all recomputed by DuckDB.
    Q("meta_show_stats", statsOracle(filtered = false)) { (s, _) =>
      fd(s, "SHOW STATS FOR orders")
    },

    // SHOW STATS FOR (SELECT * FROM orders WHERE ...) — the reference's
    // pushdown-constraint variant (ShowStatsRewrite.java:142-163 only
    // admits pushable conjuncts; same single-table SELECT * shape here).
    Q("meta_show_stats_filtered", statsOracle(filtered = true)) { (s, _) =>
      fd(s, "SHOW STATS FOR (SELECT * FROM orders WHERE o_orderstatus = 'F')")
    },

    // system.runtime tables (r8, graft.sql.SystemTables): nodes /
    // queries / transactions resolved as fully-qualified names through
    // the front door. Property oracle (the runtime state itself is not
    // DuckDB-recomputable): the driver node reports as coordinator, the
    // query log records both a FINISHED and a FAILED statement, and an
    // open transaction is visible with SNAPSHOT isolation then gone
    // after rollback.
    Q("meta_system_runtime",
      """SELECT true AS has_node, true AS node_is_coordinator,
        |  true AS queries_logged, true AS failure_logged,
        |  true AS txn_visible, true AS txn_gone""".stripMargin) { (s, _) =>
      import s.implicits._
      fd(s, "SELECT 1 AS probe").collect()
      try fd(s, "SELECT FROM WHERE broken").collect()
      catch { case scala.util.control.NonFatal(_) => () }
      val nodes = fd(s,
        """SELECT count(*) AS n, bool_or(coordinator) AS coord
          |FROM system.runtime.nodes""".stripMargin).head()
      val qlog = fd(s,
        """SELECT sum(CASE WHEN state = 'FINISHED' THEN 1 ELSE 0 END) AS fin,
          |       sum(CASE WHEN state = 'FAILED' THEN 1 ELSE 0 END) AS failed
          |FROM system.runtime.queries WHERE query LIKE '%probe%' OR query LIKE '%broken%'
          |""".stripMargin).head()
      fd(s, "START TRANSACTION")
      val tx = fd(s,
        """SELECT count(*) AS n, bool_and(isolation_level = 'SNAPSHOT') AS iso
          |FROM system.runtime.transactions""".stripMargin).head()
      fd(s, "ROLLBACK")
      val tx2 = fd(s,
        "SELECT count(*) AS n FROM system.runtime.transactions").head()
      Seq((nodes.getLong(0) >= 1L, nodes.getBoolean(1),
        qlog.getLong(0) >= 1L, qlog.getLong(1) >= 1L,
        tx.getLong(0) == 1L && tx.getBoolean(1), tx2.getLong(0) == 0L))
        .toDF("has_node", "node_is_coordinator", "queries_logged",
          "failure_logged", "txn_visible", "txn_gone")
    },

    // system.runtime.resource_groups — admission-control observability
    // (the reference exposes per-group running/queued via
    // ResourceGroupInfo on the coordinator). A group tree is installed,
    // the SELECT itself is admitted through it (instantiating the
    // pipeline.ingest path and holding one running slot on the path
    // while the statement-time snapshot is taken — the deterministic
    // running=1 below), and the counters surface through the same SQL
    // front door as every other runtime table.
    Q("meta_resource_groups",
      """SELECT * FROM (VALUES
        |  ('pipeline',        1, 0, 8, 100, 'weighted_fair', 1),
        |  ('pipeline.ingest', 1, 0, 2, 50,  'fair',          3)
        |) AS t(group_id, running, queued, hard_concurrency_limit, max_queued,
        |       scheduling_policy, scheduling_weight)""".stripMargin) { (s, _) =>
      import graft.sql.ResourceGroups
      ResourceGroups.configure(s, ResourceGroups.Config(
        rootGroups = Seq(ResourceGroups.GroupSpec("pipeline", 8, 100, Seq(
          ResourceGroups.GroupSpec("ingest", 2, 50, Nil, schedulingWeight = 3)),
          schedulingPolicy = "weighted_fair")),
        selectors = Seq(ResourceGroups.Selector(None, None, "pipeline.ingest"))))
      try {
        // the statement-time snapshot is embedded in a LocalRelation, so
        // the frame stays correct after the config is torn down
        val out = fd(s,
          """SELECT group_id, running, queued, hard_concurrency_limit, max_queued,
            |       scheduling_policy, scheduling_weight
            |FROM system.runtime.resource_groups ORDER BY group_id""".stripMargin)
        out.collect() // materialize under the installed config
        out
      } finally ResourceGroups.disable(s)
    },

    // system.metadata.catalogs (CatalogSystemTable.java:44) — the
    // queryable-table twin of SHOW CATALOGS, through the same front-door
    // rewrite as system.runtime.
    Q("meta_metadata_catalogs",
      """SELECT 'spark_catalog' AS catalog_name,
        |       'spark_catalog' AS connector_id""".stripMargin) { (s, _) =>
      fd(s,
        """SELECT catalog_name, connector_id
          |FROM system.metadata.catalogs ORDER BY catalog_name""".stripMargin)
    },

    // system.metadata property tables (TablePropertiesSystemTable.java
    // family): each catalog's declared WITH(...) property metadata. The
    // column/analyze tables exist with the reference shape but declare
    // no properties in this engine — pinned by the count arms.
    Q("meta_metadata_properties",
      """SELECT * FROM (VALUES
        |  ('table',  'bucket_count',   '0',       'integer'),
        |  ('table',  'bucketed_by',    '[]',      'array(varchar)'),
        |  ('table',  'format',         'PARQUET', 'varchar'),
        |  ('table',  'partitioned_by', '[]',      'array(varchar)'),
        |  ('table',  'zorder_by',      '[]',      'array(varchar)'),
        |  ('schema', 'location',       '',        'varchar')
        |) AS t(family, property_name, default_value, type)""".stripMargin) { (s, _) =>
      fd(s,
        """SELECT 'table' AS family, property_name, default_value, type
          |FROM system.metadata.table_properties
          |UNION ALL
          |SELECT 'schema', property_name, default_value, type
          |FROM system.metadata.schema_properties
          |UNION ALL
          |SELECT 'column', property_name, default_value, type
          |FROM system.metadata.column_properties
          |UNION ALL
          |SELECT 'analyze', property_name, default_value, type
          |FROM system.metadata.analyze_properties""".stripMargin)
    },

    // system.jdbc.* (connector/system/jdbc/ — CatalogJdbcTable.java,
    // SchemaJdbcTable.java, TableJdbcTable.java, TableTypeJdbcTable.java,
    // ProcedureJdbcTable.java): the metadata schema every JDBC client's
    // DatabaseMetaData.getTables()/getCatalogs()/getSchemas() calls
    // resolve through. The LIKE filter on table_name is the driver's
    // tableNamePattern argument — an ordinary predicate pruned
    // Catalyst-side (FilterUtil.java's TupleDomain pushdown analog).
    Q("meta_jdbc_tables",
      """SELECT * FROM (VALUES
        |  ('spark_catalog', 'default', 'lineitem', 'TABLE', CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('spark_catalog', 'default', 'nation',   'TABLE', CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('spark_catalog', 'default', 'region',   'TABLE', CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT))
        |) AS t(table_cat, table_schem, table_name, table_type,
        |       n_catalogs, n_table_types, n_default_schema, n_procedures)""".stripMargin) { (s, _) =>
      fd(s,
        """SELECT table_cat, table_schem, table_name, table_type,
          |  (SELECT count(*) FROM system.jdbc.catalogs) AS n_catalogs,
          |  (SELECT count(*) FROM system.jdbc.table_types) AS n_table_types,
          |  (SELECT count(*) FROM system.jdbc.schemas WHERE table_schem = 'default') AS n_default_schema,
          |  (SELECT count(*) FROM system.jdbc.procedures) AS n_procedures
          |FROM system.jdbc.tables
          |WHERE table_name LIKE '%i%'
          |  AND table_name IN ('nation', 'region', 'orders', 'lineitem', 'documents')
          |ORDER BY table_name""".stripMargin)
    },

    // system.jdbc.columns (ColumnJdbcTable.java:44-105): per-column JDBC
    // metadata — java.sql.Types codes (jdbcDataType), COLUMN_SIZE /
    // DECIMAL_DIGITS / NUM_PREC_RADIX / CHAR_OCTET_LENGTH per the
    // reference's closed forms, columnNullableUnknown (2) nullability,
    // 1-based ordinals. Unbounded varchar renders length as 2^31-1
    // exactly like VarcharType.UNBOUNDED_LENGTH.
    Q("meta_jdbc_columns",
      """SELECT * FROM (VALUES
        |  ('nation', 'n_nationkey',    CAST(4   AS BIGINT), 'integer',   CAST(10 AS BIGINT), CAST(NULL AS BIGINT), CAST(10 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), ''),
        |  ('nation', 'n_name',         CAST(12  AS BIGINT), 'varchar',   CAST(2147483647 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(2 AS BIGINT), CAST(2147483647 AS BIGINT), CAST(2 AS BIGINT), ''),
        |  ('nation', 'n_regionkey',    CAST(4   AS BIGINT), 'integer',   CAST(10 AS BIGINT), CAST(NULL AS BIGINT), CAST(10 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(3 AS BIGINT), ''),
        |  ('orders', 'o_orderkey',     CAST(-5  AS BIGINT), 'bigint',    CAST(19 AS BIGINT), CAST(NULL AS BIGINT), CAST(10 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), ''),
        |  ('orders', 'o_custkey',      CAST(-5  AS BIGINT), 'bigint',    CAST(19 AS BIGINT), CAST(NULL AS BIGINT), CAST(10 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(2 AS BIGINT), ''),
        |  ('orders', 'o_orderstatus',  CAST(12  AS BIGINT), 'varchar',   CAST(2147483647 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(2 AS BIGINT), CAST(2147483647 AS BIGINT), CAST(3 AS BIGINT), ''),
        |  ('orders', 'o_totalprice',   CAST(8   AS BIGINT), 'double',    CAST(53 AS BIGINT), CAST(NULL AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(4 AS BIGINT), ''),
        |  ('orders', 'o_orderdate',    CAST(93  AS BIGINT), 'timestamp', CAST(23 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(5 AS BIGINT), ''),
        |  ('orders', 'o_orderpriority',CAST(12  AS BIGINT), 'varchar',   CAST(2147483647 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(2 AS BIGINT), CAST(2147483647 AS BIGINT), CAST(6 AS BIGINT), '')
        |) AS t(table_name, column_name, data_type, type_name, column_size,
        |       decimal_digits, num_prec_radix, nullable, char_octet_length,
        |       ordinal_position, is_nullable)""".stripMargin) { (s, _) =>
      fd(s,
        """SELECT table_name, column_name, data_type, type_name, column_size,
          |  decimal_digits, num_prec_radix, nullable, char_octet_length,
          |  ordinal_position, is_nullable
          |FROM system.jdbc.columns
          |WHERE table_name IN ('nation', 'orders')
          |ORDER BY table_name, ordinal_position""".stripMargin)
    },

    // system.jdbc.types (TypesJdbcTable.java): getTypeInfo()'s inventory —
    // concrete scalar types (typeSearchable = 3, reference columnSize
    // precisions) then the parametric constructors (null precision,
    // typePredNone = 0), exactly the reference's two addRow families.
    Q("meta_jdbc_types",
      """SELECT * FROM (VALUES
        |  ('array',                    CAST(2003 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), false, CAST(0 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('bigint',                   CAST(-5   AS BIGINT), CAST(19   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(10   AS BIGINT)),
        |  ('boolean',                  CAST(16   AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('char',                     CAST(2000 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), false, CAST(0 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('date',                     CAST(91   AS BIGINT), CAST(14   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('decimal',                  CAST(2000 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), false, CAST(0 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('double',                   CAST(8    AS BIGINT), CAST(53   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(2    AS BIGINT)),
        |  ('integer',                  CAST(4    AS BIGINT), CAST(10   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(10   AS BIGINT)),
        |  ('map',                      CAST(2000 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), false, CAST(0 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('real',                     CAST(7    AS BIGINT), CAST(24   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(2    AS BIGINT)),
        |  ('row',                      CAST(2000 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), false, CAST(0 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('smallint',                 CAST(5    AS BIGINT), CAST(5    AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(10   AS BIGINT)),
        |  ('time',                     CAST(92   AS BIGINT), CAST(8    AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('time with time zone',      CAST(2013 AS BIGINT), CAST(14   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('timestamp',                CAST(93   AS BIGINT), CAST(23   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('timestamp with time zone', CAST(2014 AS BIGINT), CAST(29   AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('tinyint',                  CAST(-6   AS BIGINT), CAST(3    AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(10   AS BIGINT)),
        |  ('varbinary',                CAST(-3   AS BIGINT), CAST(2147483647 AS BIGINT), CAST(1 AS BIGINT), false, CAST(3 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('varchar',                  CAST(2000 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT), false, CAST(0 AS BIGINT), false, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT))
        |) AS t(type_name, data_type, precision, nullable, case_sensitive,
        |       searchable, fixed_prec_scale, minimum_scale, maximum_scale,
        |       num_prec_radix)""".stripMargin) { (s, _) =>
      fd(s,
        """SELECT type_name, data_type, precision, nullable, case_sensitive,
          |  searchable, fixed_prec_scale, minimum_scale, maximum_scale,
          |  num_prec_radix
          |FROM system.jdbc.types ORDER BY type_name""".stripMargin)
    })

  /** DuckDB twin of Metadata.showStats over `orders` — the same UNION of
    * per-column aggregates, value-identical rendering (fixed-scale decimal
    * for doubles, second-resolution strftime for timestamps).
    */
  private def statsOracle(filtered: Boolean): String = {
    val where = if (filtered) " WHERE o_orderstatus = 'F'" else ""
    def bigintCol(c: String) =
      s"""SELECT '$c' AS column_name, CAST(NULL AS DOUBLE) AS data_size,
         |  CAST(count(DISTINCT $c) AS DOUBLE) AS distinct_values_count,
         |  CAST(count(*) - count($c) AS DOUBLE) / count(*) AS nulls_fraction,
         |  CAST(NULL AS DOUBLE) AS row_count,
         |  CAST(min($c) AS VARCHAR) AS low_value,
         |  CAST(max($c) AS VARCHAR) AS high_value FROM orders$where""".stripMargin
    def varcharCol(c: String) =
      s"""SELECT '$c', CAST(sum(length($c)) AS DOUBLE),
         |  CAST(count(DISTINCT $c) AS DOUBLE),
         |  CAST(count(*) - count($c) AS DOUBLE) / count(*),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
         |  FROM orders$where""".stripMargin
    def doubleCol(c: String) =
      s"""SELECT '$c', CAST(NULL AS DOUBLE),
         |  CAST(count(DISTINCT $c) AS DOUBLE),
         |  CAST(count(*) - count($c) AS DOUBLE) / count(*),
         |  CAST(NULL AS DOUBLE),
         |  CAST(CAST(min($c) AS DECIMAL(38,6)) AS VARCHAR),
         |  CAST(CAST(max($c) AS DECIMAL(38,6)) AS VARCHAR)
         |  FROM orders$where""".stripMargin
    def tsCol(c: String) =
      s"""SELECT '$c', CAST(NULL AS DOUBLE),
         |  CAST(count(DISTINCT $c) AS DOUBLE),
         |  CAST(count(*) - count($c) AS DOUBLE) / count(*),
         |  CAST(NULL AS DOUBLE),
         |  strftime(min($c), '%Y-%m-%d %H:%M:%S'),
         |  strftime(max($c), '%Y-%m-%d %H:%M:%S')
         |  FROM orders$where""".stripMargin
    val summary =
      s"""SELECT CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  CAST(count(*) AS DOUBLE), CAST(NULL AS VARCHAR),
         |  CAST(NULL AS VARCHAR) FROM orders$where""".stripMargin
    Seq(
      bigintCol("o_orderkey"),
      bigintCol("o_custkey"),
      varcharCol("o_orderstatus"),
      doubleCol("o_totalprice"),
      tsCol("o_orderdate"),
      varcharCol("o_orderpriority"),
      summary).mkString("\nUNION ALL\n")
  }
}
