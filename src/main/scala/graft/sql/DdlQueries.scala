package graft.sql

import org.apache.spark.sql.functions._
import graft.queries.{Q, QueryModule}

/** DDL/DML subset (SURVEY §2.8 / §7.2.5): CREATE TABLE AS, INSERT INTO,
  * temp views, SHOW/DESCRIBE/EXPLAIN passthrough, START TRANSACTION/
  * COMMIT/ROLLBACK over delta-manifest tables (TransactionOps —
  * snapshot isolation with first-committer-wins conflicts), and
  * GRANT/REVOKE/SHOW GRANTS with plan-time enforcement (AccessControl).
  *
  * Results are deterministic properties (the side effects themselves are
  * exercised, then cleaned up), stated as literals in the oracle.
  */
object DdlQueries extends QueryModule {

  def queries: Seq[Q] = Seq(

    // CTAS + INSERT INTO a managed parquet table — CreateTableTask.java /
    // TableWriterOperator.java:58 -> df.write / INSERT INTO.
    Q("ddl_ctas_insert",
      """SELECT 25 AS after_ctas, 50 AS after_insert, true AS schema_matches""".stripMargin) { (s, _) =>
      import s.implicits._
      s.sql("DROP TABLE IF EXISTS graft_ctas_nation")
      s.sql("CREATE TABLE graft_ctas_nation USING PARQUET AS SELECT * FROM nation")
      val afterCtas = s.table("graft_ctas_nation").count()
      s.sql("INSERT INTO graft_ctas_nation SELECT * FROM nation")
      val afterInsert = s.table("graft_ctas_nation").count()
      val schemaMatches = s.table("graft_ctas_nation").schema == s.table("nation").schema
      s.sql("DROP TABLE graft_ctas_nation")
      Seq((afterCtas, afterInsert, schemaMatches))
        .toDF("after_ctas", "after_insert", "schema_matches")
    },

    // CREATE [TEMP] VIEW + query through it — CreateViewTask.
    Q("ddl_view",
      """SELECT 5 AS n_regions, true AS view_dropped""".stripMargin) { (s, _) =>
      import s.implicits._
      s.sql("CREATE OR REPLACE TEMPORARY VIEW graft_v_region AS SELECT * FROM region WHERE r_regionkey >= 0")
      val n = s.table("graft_v_region").count()
      s.sql("DROP VIEW graft_v_region")
      val dropped = !s.catalog.tableExists("graft_v_region")
      Seq((n, dropped)).toDF("n_regions", "view_dropped")
    },

    // SHOW TABLES / DESCRIBE — ShowTablesTask / metadata queries.
    Q("ddl_show_describe",
      """SELECT true AS nation_listed, 3 AS nation_cols, true AS key_is_int""".stripMargin) { (s, _) =>
      import s.implicits._
      val listed = s.sql("SHOW TABLES").collect().exists(_.getString(1) == "nation")
      val desc = s.sql("DESCRIBE nation").collect()
      val keyType = desc.find(_.getString(0) == "n_nationkey").map(_.getString(1))
      Seq((listed, desc.length, keyType.exists(_.contains("int"))))
        .toDF("nation_listed", "nation_cols", "key_is_int")
    },

    // EXPLAIN passthrough — the reference's ExplainAnalyzeOperator.
    Q("ddl_explain",
      """SELECT true AS has_physical_plan, true AS mentions_scan""".stripMargin) { (s, _) =>
      import s.implicits._
      val plan = s.sql("EXPLAIN SELECT count(*) FROM lineitem WHERE l_quantity > 10")
        .head().getString(0)
      Seq((plan.contains("Physical Plan"), plan.toLowerCase.contains("parquet")))
        .toDF("has_physical_plan", "mentions_scan")
    },

    // EXPLAIN ANALYZE — ExplainAnalyzeOperator.java: run the query and
    // annotate the plan with ACTUAL runtime stats. The contract crosses
    // engines for real: the annotated root operator's runtime row count
    // must equal the group count DuckDB computes independently.
    Q("ddl_explain_analyze",
      """SELECT true AS has_row_metrics, true AS mentions_aggregate,
        |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS root_rows
        |FROM lineitem""".stripMargin) { (s, _) =>
      import s.implicits._
      val (text, rootRows) = ExplainAnalyze.analyze(
        s.sql("SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"))
      Seq((text.matches("(?s).*\\[rows: \\d+\\].*"),
        text.toLowerCase.contains("aggregate"), rootRows))
        .toDF("has_row_metrics", "mentions_aggregate", "root_rows")
    },

    // Presto-dialect SQL through the graft.sql front door.
    Q("sql_presto_dialect",
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  CAST(min(o_orderdate + INTERVAL 3 DAY) AS TIMESTAMP) AS first_plus3,
        |  CAST(max(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS BIGINT) AS max_days,
        |  CAST(instr('hello world', 'world') AS BIGINT) AS pos
        |FROM orders""".stripMargin) { (s, _) =>
      PrestoSql.sql(s,
        """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
          |  min(date_add('day', 3, o_orderdate)) AS first_plus3,
          |  max(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS max_days,
          |  CAST(strpos(CAST('hello world' AS VARCHAR), 'world') AS BIGINT) AS pos
          |FROM orders""".stripMargin)
    },

    // Round-8 dialect wave end-to-end (rewriters spec'd individually in
    // SketchAndSqlSpecs; this oracle-gates the composition): ARRAY[..]
    // constructors, 1-BASED subscripts (ArraySubscriptOperator — Spark's
    // native bracket is 0-based getItem, the silent-wrong-answer trap
    // the front door closes), DECIMAL 'x' literals, zoned TIMESTAMP
    // literals carrying their zone, AT TIME ZONE desugaring, and Presto
    // type syntax in CAST targets. DuckDB restates with its own 1-based
    // lists and precomputed zone constants.
    Q("sql_presto_dialect2",
      """SELECT p_partkey,
        |  CAST(p_size * 2 AS BIGINT) AS twice,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  CAST(round(1.25 * p_size, 2) AS DOUBLE) AS scaled,
        |  CAST(9 AS BIGINT) AS tokyo_h,
        |  CAST(p_size AS VARCHAR) AS size_str,
        |  '2020-01-01T05:30:00+05:30' AS kolkata
        |FROM part""".stripMargin) { (s, _) =>
      PrestoSql.sql(s,
        """SELECT p_partkey,
          |  CAST(ARRAY[p_size, p_size * 2, p_size * 3][2] AS BIGINT) AS twice,
          |  split(p_name, ' ')[1] AS first_word,
          |  round(CAST(DECIMAL '1.25' * p_size AS DOUBLE), 2) AS scaled,
          |  tz_timezone_hour(TIMESTAMP '2020-06-01 12:00:00 Asia/Tokyo') AS tokyo_h,
          |  CAST(ARRAY[p_size] AS ARRAY(VARCHAR))[1] AS size_str,
          |  TIMESTAMP '2020-01-01 00:00:00' AT TIME ZONE 'Asia/Kolkata' AS kolkata
          |FROM part""".stripMargin)
    },

    // PREPARE / EXECUTE / DEALLOCATE — the reference's QueryPreparer
    // .java prepared-statement surface: PREPARE stores the text in
    // session state, EXECUTE ... USING binds positional ? parameters
    // (literals, per the reference's grammar), DEALLOCATE drops it.
    // The executed statement is a parameterized TPC-H q6.
    Q("sql_prepare_execute",
      """SELECT sum(l_extendedprice * l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        |  AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, _) =>
      PrestoSql.sql(s,
        """PREPARE q6_param FROM
          |SELECT sum(l_extendedprice * l_discount) AS revenue
          |FROM lineitem
          |WHERE l_shipdate >= ? AND l_shipdate < ?
          |  AND l_discount BETWEEN ? AND ?
          |  AND l_quantity < ?""".stripMargin)
      val out = PrestoSql.sql(s,
        "EXECUTE q6_param USING TIMESTAMP '1994-01-01', TIMESTAMP '1995-01-01', 0.05, 0.07, 24")
      PrestoSql.sql(s, "DEALLOCATE PREPARE q6_param")
      out
    },

    // CURRENT_USER niladic (SqlBase.g4 specialForm; DesugarCurrentUser
    // .java binds it at analysis, SessionFunctions.java carries the
    // value): the front door binds the STATEMENT's principal — the
    // default session principal here; LifecycleSpecs drives the
    // per-request X-Presto-User binding over HTTP. The string-literal
    // guard is part of the contract: a quoted 'current_user' must
    // survive untouched.
    Q("sql_current_user",
      """SELECT 'admin' AS u, 'current_user' AS lit,
        |       count(*) AS n FROM region""".stripMargin) { (s, _) =>
      PrestoSql.sql(s,
        "SELECT current_user AS u, 'current_user' AS lit, count(*) AS n FROM region")
    },

    // Session time zone (reference: Session.getTimeZoneKey built from
    // X-Presto-Time-Zone, PrestoHeaders.java:23; DateTimeFunctions.java
    // reads it throughout). time_zone_id maps live onto
    // spark.sql.session.timeZone for the statement window, so every
    // zone-sensitive rendering follows the CLIENT's zone; SHOW SESSION
    // surfaces it; RESET restores the server zone. The per-request
    // header form (two concurrent clients, different zones) is driven
    // over HTTP in LifecycleSpecs.
    Q("sql_session_time_zone",
      """SELECT '1970-01-01 09:00:00' AS tokyo,
        |  '1969-12-31 19:00:00' AS new_york,
        |  true AS shown, true AS restored""".stripMargin) { (s, _) =>
      import s.implicits._
      val before = s.conf.get("spark.sql.session.timeZone")
      PrestoSql.sql(s, "SET SESSION time_zone_id = 'Asia/Tokyo'")
      val tokyo = PrestoSql.sql(s,
        "SELECT CAST(from_unixtime(0) AS VARCHAR) AS t").head().getString(0)
      val shown = PrestoSql.sql(s, "SHOW SESSION").collect()
        .exists(r => r.getString(0) == "time_zone_id" && r.getString(1) == "Asia/Tokyo")
      PrestoSql.sql(s, "SET SESSION time_zone_id = 'America/New_York'")
      val ny = PrestoSql.sql(s,
        "SELECT CAST(from_unixtime(0) AS VARCHAR) AS t").head().getString(0)
      PrestoSql.sql(s, "RESET SESSION time_zone_id")
      val restored = s.conf.get("spark.sql.session.timeZone") == before
      Seq((tokyo, ny, shown, restored)).toDF("tokyo", "new_york", "shown", "restored")
    },

    // DELETE — the reference's DeleteOperator.java/MetadataDeleteOperator
    // pair as file-pruned copy-on-write over parquet (DeleteOps). The
    // scratch table is range-clustered on o_orderkey so the key-range
    // predicate rewrites ONE file of four; the oracle recomputes the
    // post-delete aggregate from the source table with the negated
    // predicate. Decimal-cast sum keeps the check order-independent.
    // SET SESSION / SHOW SESSION / RESET SESSION through the Presto
    // front door (SetSessionTask.java, ResetSessionTask.java).
    // hash_partition_count maps live onto spark.sql.shuffle.partitions
    // (asserted via the conf read-back), join_distribution_type=
    // PARTITIONED disables broadcast joins; both are RESET before the
    // query returns so the session is left untouched for later queries.
    Q("ddl_set_session",
      """SELECT 'join_distribution_type' AS name, 'PARTITIONED' AS value,
        |  '17' AS applied_partitions, true AS restored
        |UNION ALL
        |SELECT 'hash_partition_count', '17', '17', true
        |ORDER BY name""".stripMargin) { (s, _) =>
      import s.implicits._
      val before = s.conf.get("spark.sql.shuffle.partitions")
      PrestoSql.sql(s, "SET SESSION join_distribution_type = 'PARTITIONED'")
      PrestoSql.sql(s, "SET SESSION hash_partition_count = 17")
      val applied = s.conf.get("spark.sql.shuffle.partitions")
      val shown = PrestoSql.sql(s, "SHOW SESSION")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      PrestoSql.sql(s, "RESET SESSION hash_partition_count")
      PrestoSql.sql(s, "RESET SESSION join_distribution_type")
      val restored = s.conf.get("spark.sql.shuffle.partitions") == before
      shown.map { case (n, v) => (n, v, applied, restored) }
        .toDF("name", "value", "applied_partitions", "restored")
        .orderBy("name")
    },

    Q("ddl_delete",
      """WITH thr AS (SELECT min(o_orderkey) + (max(o_orderkey) - min(o_orderkey)) // 4 AS t FROM orders)
        |SELECT CAST(count(*) AS BIGINT) AS remaining,
        |  CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS remaining_price,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders, thr WHERE o_orderkey <= thr.t) AS rows_deleted,
        |  true AS files_pruned
        |FROM orders, thr WHERE NOT (o_orderkey <= thr.t)""".stripMargin) { (s, _) =>
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_delete_").toString
      try {
        s.table("orders")
          .repartitionByRange(4, col("o_orderkey"))
          .write.mode("overwrite").parquet(dir)
        // data-relative bottom-quartile key threshold: meaningful at every
        // sf, and contiguous so the range-clustered layout prunes files
        val b = s.table("orders").agg(min("o_orderkey"), max("o_orderkey")).head()
        val thr = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 4
        val stats = graft.operators.DeleteOps.deleteWhere(s, dir, col("o_orderkey") <= thr)
        // materialize before the scratch dir is removed
        val row = s.read.parquet(dir).agg(
          count(lit(1)).as("remaining"),
          coalesce(sum(col("o_totalprice").cast("decimal(18,2)")), lit(0)).cast("double")
            .as("remaining_price"))
          .head()
        Seq((row.getLong(0), row.getDouble(1), stats.rowsDeleted,
          stats.filesRewritten < stats.filesTotal))
          .toDF("remaining", "remaining_price", "rows_deleted", "files_pruned")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }.withBench { (s, _) =>
      import s.implicits._
      // Bench the DELETE itself, not the scratch-table copy: a decimated
      // clone keeps setup cost proportional to the operation under test.
      // (Verify still runs the full-table contract above.)
      val dir = java.nio.file.Files.createTempDirectory("graft_delete_bench_").toString
      try {
        s.table("orders").filter(col("o_orderkey") % 8 === 0)
          .repartitionByRange(4, col("o_orderkey"))
          .write.mode("overwrite").parquet(dir)
        val b = s.read.parquet(dir).agg(min("o_orderkey"), max("o_orderkey")).head()
        val thr = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 4
        val stats = graft.operators.DeleteOps.deleteWhere(s, dir, col("o_orderkey") <= thr)
        val remaining = s.read.parquet(dir).count()
        Seq((remaining, stats.rowsDeleted, stats.filesRewritten))
          .toDF("remaining", "rows_deleted", "files_rewritten")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    },

    // Quantified comparisons — op ALL/ANY (subquery). The graft front
    // door rewrites them to min/max scalar subqueries / IN, mirroring
    // TransformQuantifiedComparisonApplyToLateralJoin.java:75; DuckDB
    // executes the ORIGINAL quantified text natively, so the oracle
    // checks the rewrite's semantics, not just its syntax.
    Q("shape_quantified",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_acctbal > ALL (SELECT c_acctbal / 10 FROM customer WHERE c_nationkey = 1)
        |  AND s_suppkey < ANY (SELECT c_custkey FROM customer)
        |  AND s_nationkey = ANY (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
        |  AND s_suppkey <> ALL (SELECT c_custkey * 1000 FROM customer)""".stripMargin) { (s, _) =>
      PrestoSql.sql(s,
        """SELECT s_suppkey, s_name FROM supplier
          |WHERE s_acctbal > ALL (SELECT c_acctbal / 10 FROM customer WHERE c_nationkey = 1)
          |  AND s_suppkey < ANY (SELECT c_custkey FROM customer)
          |  AND s_nationkey = ANY (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
          |  AND s_suppkey <> ALL (SELECT c_custkey * 1000 FROM customer)""".stripMargin)
    },

    // START TRANSACTION / COMMIT / ROLLBACK through the front door over
    // a version-pointer table (TransactionOps): snapshot isolation,
    // uncommitted writes invisible to other sessions, rollback discards,
    // commit publishes, and first-committer-wins conflict detection.
    // Reference: SqlBase.g4:34-98, StartTransactionTask/CommitTask/
    // RollbackTask. Deterministic protocol outcome -> literal oracle.
    Q("ddl_transaction",
      """SELECT 25 AS after_create, 30 AS in_txn_insert,
        |  25 AS committed_view_during, 25 AS after_rollback,
        |  20 AS in_txn_delete, 20 AS after_commit,
        |  true AS conflict_detected, 19 AS final_rows""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.operators.TransactionOps
      val root = "tmp/graft_txn_nation"
      try {
        TransactionOps.createTable(s, root, s.table("nation"))
        val afterCreate = TransactionOps.read(s, root).count()
        PrestoSql.sql(s, "START TRANSACTION")
        TransactionOps.insertInto(s, root, s.table("nation").limit(5))
        val inTxnInsert = TransactionOps.read(s, root).count()
        val committedDuring = TransactionOps.readCommitted(s, root).count()
        PrestoSql.sql(s, "ROLLBACK")
        val afterRollback = TransactionOps.read(s, root).count()
        PrestoSql.sql(s, "START TRANSACTION ISOLATION LEVEL SERIALIZABLE")
        TransactionOps.deleteWhere(s, root, col("n_nationkey") >= 20)
        val inTxnDelete = TransactionOps.read(s, root).count()
        PrestoSql.sql(s, "COMMIT")
        val afterCommit = TransactionOps.read(s, root).count()
        // conflict: stage a write, then a SECOND session commits first
        PrestoSql.sql(s, "START TRANSACTION")
        TransactionOps.deleteWhere(s, root, col("n_nationkey") >= 10)
        val other = s.newSession()
        TransactionOps.deleteWhere(other, root, col("n_nationkey") === 0) // auto-commit
        val conflict =
          try { PrestoSql.sql(s, "COMMIT"); false }
          catch { case _: java.util.ConcurrentModificationException => true }
        val finalRows = TransactionOps.read(s, root).count()
        Seq((afterCreate, inTxnInsert, committedDuring, afterRollback,
          inTxnDelete, afterCommit, conflict, finalRows))
          .toDF("after_create", "in_txn_insert", "committed_view_during",
            "after_rollback", "in_txn_delete", "after_commit",
            "conflict_detected", "final_rows")
      } finally {
        TransactionOps.rollback(s)
        TransactionOps.dropTable(root)
      }
    },

    // Schema evolution on the VERSIONED (delta-manifest) table: ADD
    // COLUMN and DROP COLUMN are O(1) metadata-only commits — the
    // contract row PROVES it by comparing live file SETS across the
    // evolution commits (identical ⇒ zero data rewritten, at any table
    // size), then exercises null-fill reads of pre-evolution files,
    // inserts carrying the new column, and time travel back to the
    // pre-evolution schema (each manifest version keeps its own DDL).
    Q("ddl_schema_evolution",
      """SELECT 3 AS cols_v0, 4 AS cols_after_add, true AS add_was_metadata_only,
        |  25 AS null_scores_after_add, 30 AS rows_after_insert,
        |  5 AS scored_rows, CAST(30.0 AS DOUBLE) AS sum_score,
        |  3 AS cols_after_drop, true AS drop_was_metadata_only,
        |  3 AS cols_time_travel_v0, 25 AS rows_time_travel_v0""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.operators.TransactionOps
      val root = "tmp/graft_evolve_nation"
      try {
        TransactionOps.createTable(s, root, s.table("nation"))
        val colsV0 = TransactionOps.read(s, root).columns.length
        val filesV0 = TransactionOps.liveFileSet(root, TransactionOps.currentVersion(root))
        TransactionOps.addColumn(s, root, "score", "double")
        val vAdd = TransactionOps.currentVersion(root)
        val colsAfterAdd = TransactionOps.read(s, root).columns.length
        val addMetaOnly = TransactionOps.liveFileSet(root, vAdd) == filesV0
        val nullScores = TransactionOps.read(s, root).filter(col("score").isNull).count()
        TransactionOps.insertInto(s, root, s.table("nation").limit(5)
          .withColumn("score", lit(6.0)))
        val afterInsert = TransactionOps.read(s, root)
        val rowsAfterInsert = afterInsert.count()
        val scoredRows = afterInsert.filter(col("score").isNotNull).count()
        val sumScore = afterInsert.agg(sum("score")).as[Double].head()
        val filesPreDrop = TransactionOps.liveFileSet(root, TransactionOps.currentVersion(root))
        TransactionOps.dropColumn(s, root, "score")
        val vDrop = TransactionOps.currentVersion(root)
        val colsAfterDrop = TransactionOps.read(s, root).columns.length
        val dropMetaOnly = TransactionOps.liveFileSet(root, vDrop) == filesPreDrop
        val v0 = TransactionOps.readAt(s, root, 0)
        Seq((colsV0, colsAfterAdd, addMetaOnly, nullScores, rowsAfterInsert,
          scoredRows, sumScore, colsAfterDrop, dropMetaOnly,
          v0.columns.length, v0.count()))
          .toDF("cols_v0", "cols_after_add", "add_was_metadata_only",
            "null_scores_after_add", "rows_after_insert", "scored_rows",
            "sum_score", "cols_after_drop", "drop_was_metadata_only",
            "cols_time_travel_v0", "rows_time_travel_v0")
      } finally TransactionOps.dropTable(root)
    },

    // Compaction (OPTIMIZE): five incremental inserts leave a
    // many-small-file layout; compact() rewrites the live rows into ONE
    // file in one new version. The contract proves: file count collapses
    // to 1, the row multiset is IDENTICAL (count + an exact checksum-ish
    // sum over all keys), and time travel still reads the
    // pre-compaction small-file version — compaction never rewrites
    // history. At 100 TB small files are the read-amplification killer;
    // this is the manifest-swap organization job that fixes them.
    Q("ddl_compaction",
      """SELECT 6 AS files_before, 1 AS files_after,
        |  50 AS rows_before, 50 AS rows_after,
        |  true AS sums_match, 6 AS files_at_old_version""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.operators.TransactionOps
      val root = "tmp/graft_compact_nation"
      try {
        TransactionOps.createTable(s, root, s.table("nation").coalesce(1))
        for (i <- 0 until 5)
          TransactionOps.insertInto(s, root,
            s.table("nation").filter(col("n_nationkey") % 5 === i).limit(5).coalesce(1))
        val vSmall = TransactionOps.currentVersion(root)
        val filesBefore = TransactionOps.liveFileSet(root, vSmall).size
        val before = TransactionOps.read(s, root)
        val rowsBefore = before.count()
        val sumBefore = before.agg(sum("n_nationkey")).as[Long].head()
        TransactionOps.compact(s, root)
        val vComp = TransactionOps.currentVersion(root)
        val filesAfter = TransactionOps.liveFileSet(root, vComp).size
        val after = TransactionOps.read(s, root)
        val rowsAfter = after.count()
        val sumAfter = after.agg(sum("n_nationkey")).as[Long].head()
        val filesAtOld = TransactionOps.liveFileSet(root, vSmall).size
        Seq((filesBefore, filesAfter, rowsBefore, rowsAfter,
          sumBefore == sumAfter, filesAtOld))
          .toDF("files_before", "files_after", "rows_before", "rows_after",
            "sums_match", "files_at_old_version")
      } finally TransactionOps.dropTable(root)
    },

    // GRANT / REVOKE / SHOW GRANTS through the front door (SqlBase.g4:
    // 87-91, GrantTask/RevokeTask; AccessControl enforcement at plan
    // time). A table becomes ACL-managed at its first GRANT; admin
    // bypasses; WITH GRANT OPTION delegates granting; REVOKE takes
    // effect on the very next front-door statement. Deterministic
    // protocol outcome -> literal oracle.
    Q("ddl_grant_revoke",
      """SELECT 25 AS admin_rows, 25 AS alice_rows, true AS bob_denied,
        |  25 AS bob_rows, true AS bob_can_grant, true AS alice_grant_denied,
        |  3 AS n_grants, true AS alice_revoked_denied, 2 AS n_grants_after""".stripMargin) { (s, _) =>
      import s.implicits._
      def count(): Long =
        PrestoSql.sql(s, "SELECT count(*) AS c FROM nation").head().getLong(0)
      def denied(body: => Any): Boolean =
        try { body; false }
        catch { case _: AccessControl.AccessDeniedException => true }
      try {
        PrestoSql.sql(s, "GRANT SELECT ON TABLE nation TO alice")
        val adminRows = count() // admin bypasses the ACL
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION alice")
        val aliceRows = count()
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION bob")
        val bobDenied = denied(count())
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION admin")
        PrestoSql.sql(s, "GRANT SELECT ON nation TO bob WITH GRANT OPTION")
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION bob")
        val bobRows = count()
        val bobCanGrant =
          !denied(PrestoSql.sql(s, "GRANT SELECT ON nation TO carol"))
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION alice")
        val aliceGrantDenied =
          denied(PrestoSql.sql(s, "GRANT SELECT ON nation TO dave"))
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION admin")
        val nGrants = PrestoSql.sql(s, "SHOW GRANTS ON TABLE nation").count()
        PrestoSql.sql(s, "REVOKE SELECT ON nation FROM alice")
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION alice")
        val aliceRevokedDenied = denied(count())
        PrestoSql.sql(s, "SET SESSION AUTHORIZATION admin")
        val nAfter = PrestoSql.sql(s, "SHOW GRANTS ON nation").count()
        Seq((adminRows, aliceRows, bobDenied, bobRows, bobCanGrant,
          aliceGrantDenied, nGrants, aliceRevokedDenied, nAfter))
          .toDF("admin_rows", "alice_rows", "bob_denied", "bob_rows",
            "bob_can_grant", "alice_grant_denied", "n_grants",
            "alice_revoked_denied", "n_grants_after")
      } finally {
        AccessControl.setPrincipal(s, "admin")
        AccessControl.clear()
      }
    },

    // ALTER TABLE family + USE (r8, SqlBase.g4:35-36,52-58 — UseTask /
    // RenameTableTask / RenameColumnTask / DropColumnTask /
    // AddColumnTask). Alters over graft tables are metadata-only view
    // re-registrations (zero data I/O — the reference's contract for
    // metadata operations). The oracle replays the net effect of the
    // alter chain as a plain projection over nation.
    Q("ddl_alter_table",
      """SELECT n_nationkey AS nation_id, n_name, CAST(NULL AS DOUBLE) AS score
        |FROM nation WHERE n_regionkey = 2""".stripMargin) { (s, _) =>
      PrestoSql.sql(s,
        "CREATE OR REPLACE TEMPORARY VIEW alter_t AS " +
          "SELECT n_nationkey, n_name, n_regionkey FROM nation")
      PrestoSql.sql(s, "USE default")
      PrestoSql.sql(s, "ALTER TABLE alter_t ADD COLUMN score double")
      PrestoSql.sql(s, "ALTER TABLE alter_t RENAME COLUMN n_nationkey TO nation_id")
      PrestoSql.sql(s, "ALTER TABLE alter_t RENAME TO alter_t2")
      PrestoSql.sql(s, "ALTER TABLE alter_t2 DROP COLUMN n_regionkey")
      PrestoSql.sql(s,
        """SELECT nation_id, n_name, score FROM alter_t2
          |WHERE nation_id IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
          |""".stripMargin)
    },

    // CREATE SCHEMA / DROP SCHEMA (CreateSchemaTask.java /
    // DropSchemaTask.java): schemas ride the Spark session catalog's
    // databases, so SHOW SCHEMAS and USE see them immediately. The
    // round trip pins: create -> visible; IF NOT EXISTS is idempotent
    // where a bare re-create throws; USE enters it; drop -> gone; IF
    // EXISTS tolerates the missing schema.
    Q("ddl_create_drop_schema",
      """SELECT CAST(1 AS BIGINT) AS visible_after_create,
        |  CAST(1 AS BIGINT) AS idempotent_if_not_exists,
        |  CAST(1 AS BIGINT) AS bare_recreate_throws,
        |  CAST(0 AS BIGINT) AS visible_after_drop,
        |  CAST(1 AS BIGINT) AS if_exists_tolerates""".stripMargin) { (s, _) =>
      import s.implicits._
      PrestoSql.sql(s, "DROP SCHEMA IF EXISTS graft_ddl_s1")
      PrestoSql.sql(s, "CREATE SCHEMA graft_ddl_s1")
      val afterCreate = PrestoSql.sql(s, "SHOW SCHEMAS LIKE 'graft_ddl_s1'").count()
      PrestoSql.sql(s, "CREATE SCHEMA IF NOT EXISTS graft_ddl_s1") // no-op
      val idem = PrestoSql.sql(s, "SHOW SCHEMAS LIKE 'graft_ddl_s1'").count()
      val threw =
        try { PrestoSql.sql(s, "CREATE SCHEMA graft_ddl_s1"); 0L }
        catch { case e: IllegalArgumentException
            if e.getMessage.contains("already exists") => 1L }
      PrestoSql.sql(s, "USE graft_ddl_s1")
      PrestoSql.sql(s, "USE default")
      PrestoSql.sql(s, "DROP SCHEMA graft_ddl_s1")
      val afterDrop = PrestoSql.sql(s, "SHOW SCHEMAS LIKE 'graft_ddl_s1'").count()
      PrestoSql.sql(s, "DROP SCHEMA IF EXISTS graft_ddl_s1") // no-op
      Seq((afterCreate, idem, threw, afterDrop, 1L))
        .toDF("visible_after_create", "idempotent_if_not_exists",
          "bare_recreate_throws", "visible_after_drop", "if_exists_tolerates")
    })
}
