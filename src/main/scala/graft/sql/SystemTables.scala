package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The global system connector's runtime tables (reference:
  * presto-main/.../connector/system/ — NodeSystemTable.java:50-55,
  * QuerySystemTable.java:56-71, TaskSystemTable.java,
  * TransactionsSystemTable.java:60-68; wired by
  * GlobalSystemConnector.java). `SELECT ... FROM system.runtime.X`
  * resolves through the PrestoSql front door: the fully-qualified names
  * rewrite to session temp views refreshed (snapshot semantics) at
  * statement time.
  *
  * Spark mapping: nodes come from the SparkContext status tracker
  * (driver = coordinator — SURVEY §3.4: Spark's driver IS the
  * coordinator), tasks from the stage snapshot, queries from a
  * per-session bounded ring of front-door statements, transactions from
  * [[graft.operators.TransactionOps]]. Documented deltas: the query log
  * records front-door completion (no queued/analysis phase split — the
  * driver plans synchronously), and tasks are Spark STAGES (the
  * execution unit Spark schedules; Presto tasks = stage x node).
  */
object SystemTables {

  final case class QueryRecord(id: String, state: String, user: String,
      source: String, query: String, createdMs: Long, endMs: Long,
      clientTags: Seq[String] = Seq.empty, clientInfo: Option[String] = None,
      traceToken: Option[String] = None)

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)
  private val logs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.ArrayBuffer[QueryRecord]]())
  private val MaxLog = 1000

  private def logOf(spark: SparkSession) = {
    var l = logs.get(spark)
    if (l == null) { l = scala.collection.mutable.ArrayBuffer.empty[QueryRecord]; logs.put(spark, l) }
    l
  }

  /** QueryId shape: reference QueryIdGenerator —
    * yyyyMMdd_HHmmss_counter_suffix. */
  def newQueryId(createdMs: Long): String = {
    val ts = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
    ts.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    s"${ts.format(new java.util.Date(createdMs))}_${"%05d".format(counter.incrementAndGet())}_graft"
  }

  /** Record a front-door statement under its pre-assigned id. Upsert:
    * the HTTP protocol server records QUEUED/RUNNING before planning,
    * and the front door's completion record then TRANSITIONS the same
    * entry (state + end time only — the submission's user/source/
    * created are the facts of record, like the reference's
    * QueryStateMachine) rather than appending a duplicate id. `source`
    * is the client identity (QuerySystemTable's source column; the
    * reference fills it from the X-Presto-Source header). */
  def record(spark: SparkSession, id: String, query: String, state: String,
      createdMs: Long, source: String = "graft", user: String = null,
      clientTags: Seq[String] = Seq.empty, clientInfo: Option[String] = None,
      traceToken: Option[String] = None): Unit = {
    val l = logOf(spark)
    l.synchronized {
      val i = l.indexWhere(_.id == id)
      if (i >= 0) l(i) = l(i).copy(state = state, endMs = System.currentTimeMillis())
      else {
        l += QueryRecord(id, state,
          Option(user).getOrElse(AccessControl.principal(spark)), source,
          query, createdMs, System.currentTimeMillis(),
          clientTags, clientInfo, traceToken)
        if (l.length > MaxLog) l.remove(0, l.length - MaxLog)
      }
    }
  }

  /** FAIL the entry only if it is still live (QUEUED/RUNNING) — the
    * limit-enforcement timer's transition (QueryTracker.java's
    * query.fail is a no-op on done queries the same way). */
  def failIfActive(spark: SparkSession, id: String): Unit = {
    val l = logOf(spark)
    l.synchronized {
      val i = l.indexWhere(_.id == id)
      if (i >= 0 && (l(i).state == "QUEUED" || l(i).state == "RUNNING"))
        l(i) = l(i).copy(state = "FAILED", endMs = System.currentTimeMillis())
    }
  }

  /** In-place state transition for an already-recorded query (the HTTP
    * protocol server's RUNNING -> FINISHED/FAILED lifecycle; the
    * reference's Query.java drives the same transitions on
    * QueryStateMachine). No-op if the id is unknown. */
  def updateState(spark: SparkSession, id: String, state: String): Unit = {
    val l = logOf(spark)
    l.synchronized {
      val i = l.indexWhere(_.id == id)
      if (i >= 0) l(i) = l(i).copy(state = state, endMs = System.currentTimeMillis())
    }
  }

  /** CALL system.runtime.kill_query(id) — KillQueryProcedure.java:
    * cancels every Spark job tagged with the query's job group (the
    * front door tags the calling thread per statement, and Spark job
    * groups are sticky thread-locals, so later actions on a returned
    * lazy DataFrame from that thread carry the id). Marks the log
    * entry FAILED like the reference's generic user-cancel error.
    */
  def killQuery(spark: SparkSession, id: String): Unit = {
    spark.sparkContext.cancelJobGroup(id)
    val l = logOf(spark)
    l.synchronized {
      val i = l.indexWhere(_.id == id)
      if (i >= 0) l(i) = l(i).copy(state = "FAILED")
    }
  }

  /** Does the statement reference a system.runtime / system.metadata
    * table? (The reference's GlobalSystemConnector serves both schemas.) */
  private val sysRef =
    ("(?i)system\\.(runtime\\.(?:nodes|queries|tasks|transactions|resource_groups)" +
      "|metadata\\.(?:catalogs|table_properties|schema_properties|column_properties" +
      "|analyze_properties))").r

  def referencesSystemTables(text: String): Boolean =
    sysRef.findFirstIn(text).isDefined

  /** Rewrite fully-qualified system.X.Y references to the temp view
    * names (after [[refreshViews]] has materialized snapshots). */
  def rewriteRefs(text: String): String =
    sysRef.replaceAllIn(text, m => s"system_${m.group(1).toLowerCase.replace('.', '_')}")

  /** Materialize statement-time snapshots of the four runtime tables. */
  def refreshViews(spark: SparkSession): Unit = {
    import spark.implicits._
    val tracker = spark.sparkContext.statusTracker

    // system.runtime.nodes (NodeSystemTable.java:50-55). Only the
    // driver row is the coordinator (NodeSystemTable flags exactly one);
    // executors match by the driver's block-manager host:port — in
    // local mode the single entry IS the driver, on a cluster workers
    // report false.
    val driverHostPort = org.apache.spark.sql.graft.DriverNode.hostPort()
    val execs = tracker.getExecutorInfos.toSeq.map { e =>
      val id = e.host + ":" + e.port
      (id, s"http://$id", spark.version, id == driverHostPort, "active")
    }
    execs.toDF("node_id", "http_uri", "node_version", "coordinator", "state")
      .createOrReplaceTempView("system_runtime_nodes")

    // system.runtime.queries (QuerySystemTable.java:56-71 core columns
    // + client_tags / client_info / trace_token from the wire headers —
    // PrestoHeaders.java:25,38,39; the reference records them on
    // QueryInfo and this table is where tracing integrations read them)
    val l = logOf(spark)
    val qs = l.synchronized { l.toSeq }
    qs.map(r => (r.id, r.state, r.user, r.source, r.query,
        new java.sql.Timestamp(r.createdMs), new java.sql.Timestamp(r.endMs),
        r.clientTags, r.clientInfo.orNull, r.traceToken.orNull))
      .toDF("query_id", "state", "user", "source", "query", "created", "end",
        "client_tags", "client_info", "trace_token")
      .createOrReplaceTempView("system_runtime_queries")

    // system.runtime.tasks (TaskSystemTable.java; Spark stage = the
    // scheduled execution unit)
    val stages = tracker.getActiveStageIds.toSeq.flatMap(id =>
      Option(tracker.getStageInfo(id)).filter(_.isDefined).map(_.get))
      .map { s =>
        (s"stage-${s.stageId}.${s.currentAttemptId}", s.stageId.toLong,
          "driver", "RUNNING", s.numTasks.toLong, s.numActiveTasks.toLong,
          s.numCompletedTasks.toLong, s.numFailedTasks.toLong)
      }
    stages.toDF("task_id", "stage_id", "node_id", "state", "splits",
        "running_splits", "completed_splits", "failed_splits")
      .createOrReplaceTempView("system_runtime_tasks")

    // system.runtime.transactions (TransactionsSystemTable.java:60-68)
    val txns = graft.operators.TransactionOps.activeTransaction(spark).toSeq
      .map { case (id, created, staged) =>
        (id, "SNAPSHOT", staged.isEmpty, false,
          new java.sql.Timestamp(created),
          (System.currentTimeMillis() - created) / 1000L,
          staged.headOption.orNull, staged)
      }
    txns.toDF("transaction_id", "isolation_level", "read_only",
        "auto_commit_context", "create_time", "idle_time_secs",
        "written_catalog", "catalogs")
      .createOrReplaceTempView("system_runtime_transactions")

    // system.runtime.resource_groups — admission observability (the
    // reference exposes per-group state via ResourceGroupInfo /
    // ResourceGroupStateInfo on the coordinator): one row per
    // instantiated group with live running/queued counters, so a parked
    // QUEUED query is visible through the same front door as everything
    // else. Empty when no configuration is installed.
    ResourceGroups.snapshotDetail(spark)
      .map(r => (r.groupId, r.running, r.queued, r.hardConcurrencyLimit,
        r.maxQueued, r.schedulingPolicy, r.schedulingWeight))
      .toDF("group_id", "running", "queued", "hard_concurrency_limit",
        "max_queued", "scheduling_policy", "scheduling_weight")
      .createOrReplaceTempView("system_runtime_resource_groups")

    // ---- system.metadata.* (the global connector's metadata schema:
    // CatalogSystemTable.java:44 catalogs; TablePropertiesSystemTable /
    // SchemaPropertiesSystemTable / ColumnPropertiesSystemTable /
    // AnalyzePropertiesSystemTable expose each catalog's declared
    // property metadata — the queryable form behind SHOW CATALOGS and
    // the WITH (...) property surface). Properties listed are the ones
    // this engine's writer paths actually honor.
    val cats = spark.catalog.listCatalogs().collect().map(_.name).distinct.sorted.toSeq
    cats.map(c => (c, c)).toDF("catalog_name", "connector_id")
      .createOrReplaceTempView("system_metadata_catalogs")
    val tblProps = cats.flatMap(c => Seq(
      (c, "format", "PARQUET", "varchar", "File format for the table"),
      (c, "partitioned_by", "[]", "array(varchar)", "Partition columns"),
      (c, "bucketed_by", "[]", "array(varchar)", "Bucketing columns"),
      (c, "bucket_count", "0", "integer", "Number of buckets"),
      (c, "zorder_by", "[]", "array(varchar)", "Z-order layout columns")))
    tblProps.toDF("catalog_name", "property_name", "default_value", "type", "description")
      .createOrReplaceTempView("system_metadata_table_properties")
    cats.map(c => (c, "location", "", "varchar", "Base file system location URI"))
      .toDF("catalog_name", "property_name", "default_value", "type", "description")
      .createOrReplaceTempView("system_metadata_schema_properties")
    // column/analyze properties: none declared by this engine's
    // connector — empty tables with the reference shape
    Seq.empty[(String, String, String, String, String)]
      .toDF("catalog_name", "property_name", "default_value", "type", "description")
      .createOrReplaceTempView("system_metadata_column_properties")
    Seq.empty[(String, String, String, String, String)]
      .toDF("catalog_name", "property_name", "default_value", "type", "description")
      .createOrReplaceTempView("system_metadata_analyze_properties")
  }
}
