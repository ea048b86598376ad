package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{Metadata, PrestoSql}

/** Metadata statement family (SHOW x / DESCRIBE / SHOW STATS) — shapes per
  * ShowQueriesRewrite.java / ShowStatsRewrite.java, semantics pinned here.
  */
class MetadataSpecs extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Engine.session("local[4]", shufflePartitions = 4)
    graft.engine.Engine.registerTables(spark, sfDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("presto type names cover primitive and nested types") {
    assert(Metadata.prestoType(StringType) == "varchar")
    assert(Metadata.prestoType(LongType) == "bigint")
    assert(Metadata.prestoType(FloatType) == "real")
    assert(Metadata.prestoType(BinaryType) == "varbinary")
    assert(Metadata.prestoType(DecimalType(12, 2)) == "decimal(12,2)")
    assert(Metadata.prestoType(ArrayType(IntegerType)) == "array(integer)")
    assert(Metadata.prestoType(MapType(StringType, DoubleType)) == "map(varchar, double)")
    assert(Metadata.prestoType(StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))) == "row(a bigint, b varchar)")
  }

  test("DESCRIBE and SHOW COLUMNS agree and use presto names") {
    val a = PrestoSql.sql(spark, "DESCRIBE lineitem").collect()
    val b = PrestoSql.sql(spark, "SHOW COLUMNS FROM lineitem").collect()
    assert(a.toSeq == b.toSeq)
    val types = a.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("l_orderkey") == "bigint")
    assert(types("l_returnflag") == "varchar")
  }

  test("SHOW TABLES honors LIKE with ESCAPE") {
    spark.range(1).toDF("x").createOrReplaceTempView("meta_x_1")
    spark.range(1).toDF("x").createOrReplaceTempView("meta_xa1")
    // '_' is a single-char wildcard unless escaped: the escaped pattern
    // must match only the literal-underscore name.
    val unescaped = PrestoSql.sql(spark, "SHOW TABLES LIKE 'meta_x_1'")
      .collect().map(_.getString(0)).toSet
    val escaped = PrestoSql.sql(spark, "SHOW TABLES LIKE 'meta!_x!_1' ESCAPE '!'")
      .collect().map(_.getString(0)).toSet
    assert(unescaped == Set("meta_x_1", "meta_xa1"))
    assert(escaped == Set("meta_x_1"))
    spark.catalog.dropTempView("meta_x_1")
    spark.catalog.dropTempView("meta_xa1")
  }

  test("system.jdbc.*: getTables/getColumns metadata with LIKE pushdown; empty tables keep shape") {
    // jdbc.tables: the JDBC driver's getTables(catalog, schemaPattern,
    // tableNamePattern) — the pattern arrives as a LIKE conjunct
    // (FilterUtil.java's TupleDomain pushdown analog)
    val tabs = PrestoSql.sql(spark,
      "SELECT table_name, table_type FROM system.jdbc.tables WHERE table_name LIKE 'ord%'")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tabs.contains(("orders", "TABLE")), s"got $tabs")
    assert(tabs.forall(_._1.startsWith("ord")))
    // jdbc.columns: ordinals are 1-based and contiguous per table
    val cols = PrestoSql.sql(spark,
      """SELECT column_name, ordinal_position, data_type FROM system.jdbc.columns
        |WHERE table_name = 'region' ORDER BY ordinal_position""".stripMargin).collect()
    assert(cols.map(_.getLong(1)).toSeq == (1L to cols.length).toSeq)
    assert(cols.exists(r => r.getString(0) == "r_name" && r.getLong(2) == 12L),
      "varchar column must carry java.sql.Types.VARCHAR")
    // a DDL-created table surfaces through the same snapshot
    PrestoSql.sql(spark, "CREATE TABLE jdbc_probe_t AS SELECT 1 AS a, 'x' AS b")
    try {
      val probe = PrestoSql.sql(spark,
        """SELECT column_name, type_name FROM system.jdbc.columns
          |WHERE table_name = 'jdbc_probe_t' ORDER BY ordinal_position""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(probe == Seq(("a", "integer"), ("b", "varchar")), s"got $probe")
    } finally PrestoSql.sql(spark, "DROP TABLE jdbc_probe_t")
    // the reference's always-empty jdbc tables answer with zero rows,
    // correct shapes (getProcedures/getUDTs/getPseudoColumns...)
    for (t <- Seq("procedures", "procedure_columns", "pseudo_columns",
        "super_tables", "super_types", "udts", "attributes")) {
      assert(PrestoSql.sql(spark, s"SELECT * FROM system.jdbc.$t").count() == 0L, t)
    }
    assert(PrestoSql.sql(spark,
      "SELECT table_type FROM system.jdbc.table_types ORDER BY table_type")
      .collect().map(_.getString(0)).toSeq == Seq("TABLE", "VIEW"))
  }

  test("SHOW STATS: one row per column plus summary; summary carries row_count") {
    val df = PrestoSql.sql(spark, "SHOW STATS FOR nation")
    assert(df.columns.toSeq == Seq("column_name", "data_size", "distinct_values_count",
      "nulls_fraction", "row_count", "low_value", "high_value"))
    val rows = df.collect()
    val nCols = spark.table("nation").schema.size
    assert(rows.length == nCols + 1)
    val summary = rows.filter(_.isNullAt(0))
    assert(summary.length == 1)
    assert(summary.head.getDouble(4) == spark.table("nation").count().toDouble)
    // column rows: NULL row_count, NDV present
    val keyRow = rows.find(r => !r.isNullAt(0) && r.getString(0) == "n_nationkey").get
    assert(keyRow.isNullAt(4))
    assert(keyRow.getDouble(2) == spark.table("nation").count().toDouble)
    assert(keyRow.getDouble(3) == 0.0)
  }

  test("SHOW STATS FOR (SELECT * FROM t WHERE p) computes stats of the slice") {
    val all = PrestoSql.sql(spark, "SHOW STATS FOR orders").collect()
      .find(_.isNullAt(0)).get.getDouble(4)
    val slice = PrestoSql.sql(spark,
      "SHOW STATS FOR (SELECT * FROM orders WHERE o_orderstatus = 'F')").collect()
      .find(_.isNullAt(0)).get.getDouble(4)
    assert(slice > 0 && slice < all)
  }

  test("SHOW STATS data_size only for variable-width columns") {
    val rows = PrestoSql.sql(spark, "SHOW STATS FOR region").collect()
      .filter(!_.isNullAt(0)).map(r => r.getString(0) -> !r.isNullAt(1)).toMap
    assert(rows("r_name"))           // varchar: sized
    assert(!rows("r_regionkey"))     // bigint: derivable, NULL
  }

  test("SHOW CREATE TABLE emits presto-dialect DDL") {
    val ddl = PrestoSql.sql(spark, "SHOW CREATE TABLE region").collect().head.getString(0)
    assert(ddl == "CREATE TABLE region (\n   r_regionkey integer,\n   r_name varchar\n)")
  }

  test("SHOW FUNCTIONS lists presto-registered names with the six-column shape") {
    val df = PrestoSql.sql(spark, "SHOW FUNCTIONS")
    assert(df.columns.toSeq == Seq("Function", "Return Type", "Argument Types",
      "Function Type", "Deterministic", "Description"))
    val names = df.collect().map(_.getString(0)).toSet
    for (f <- Seq("approx_distinct", "strpos", "arbitrary", "codepoint", "truncate"))
      assert(names.contains(f), s"missing $f")
    // builtin aggregates carry the aggregate tag
    val sumRow = df.where("Function = 'sum'").collect().head
    assert(sumRow.getString(3) == "aggregate")
  }

  test("EXPLAIN (TYPE ...) variants: LOGICAL/DISTRIBUTED text, JSON format, graphviz raises") {
    val logical = PrestoSql.sql(spark, "EXPLAIN (TYPE LOGICAL) SELECT count(*) FROM nation")
    assert(logical.columns.toSeq == Seq("Query Plan"))
    assert(logical.collect().head.getString(0).contains("Aggregate"))
    val dist = PrestoSql.sql(spark, "EXPLAIN (TYPE DISTRIBUTED) SELECT count(*) FROM nation")
      .collect().head.getString(0)
    assert(dist.contains("HashAggregate") || dist.contains("Exchange"), dist.take(200))
    val json = PrestoSql.sql(spark,
      "EXPLAIN (TYPE LOGICAL, FORMAT JSON) SELECT count(*) FROM nation")
      .collect().head.getString(0)
    assert(json.trim.startsWith("["))
    intercept[IllegalArgumentException] {
      PrestoSql.sql(spark, "EXPLAIN (FORMAT GRAPHVIZ) SELECT 1")
    }
    // VALIDATE surfaces analysis errors rather than returning a row
    intercept[Exception] {
      PrestoSql.sql(spark, "EXPLAIN (TYPE VALIDATE) SELECT no_such_col FROM nation").collect()
    }
  }

  test("EXPLAIN (TYPE IO) walks through view bodies to base relations") {
    // q2-style query through the partsupp VIEW must report the base
    // parquet relations, not the view name
    val io = PrestoSql.sql(spark,
      "EXPLAIN (TYPE IO) SELECT ps_partkey FROM partsupp WHERE ps_availqty > 0")
      .collect().head.getString(0)
    assert(io.contains("\"table\":\"lineitem\"") && io.contains("\"table\":\"part\""), io)
  }

  test("DESCRIBE INPUT/OUTPUT of prepared statements") {
    PrestoSql.sql(spark, "PREPARE di_spec FROM SELECT * FROM nation WHERE n_nationkey = ?")
    val in = PrestoSql.sql(spark, "DESCRIBE INPUT di_spec").collect()
    assert(in.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((0L, "unknown")))
    // parameterless statement: the reference's single all-null row
    PrestoSql.sql(spark, "PREPARE di0_spec FROM SELECT 1")
    val in0 = PrestoSql.sql(spark, "DESCRIBE INPUT di0_spec").collect()
    assert(in0.length == 1 && in0.head.isNullAt(0) && in0.head.isNullAt(1))
    // a '?' inside a string literal is not a parameter
    PrestoSql.sql(spark, "PREPARE di1_spec FROM SELECT '?' AS q FROM nation WHERE n_nationkey = ?")
    assert(PrestoSql.sql(spark, "DESCRIBE INPUT di1_spec").collect().length == 1)
    // OUTPUT: analysis runs with NULL-bound parameters, presto type names
    val out = PrestoSql.sql(spark, "DESCRIBE OUTPUT di_spec").collect()
    assert(out.map(_.getString(0)).toSeq == spark.table("nation").columns.toSeq)
    assert(out.head.getString(4) == "integer" && out.head.getLong(5) == 4L)
    intercept[IllegalArgumentException] {
      PrestoSql.sql(spark, "DESCRIBE INPUT never_prepared")
    }
  }

  test("SHOW SCHEMAS / SHOW CATALOGS single-column shapes") {
    val s = PrestoSql.sql(spark, "SHOW SCHEMAS")
    assert(s.columns.toSeq == Seq("Schema"))
    assert(s.collect().map(_.getString(0)).contains("default"))
    val c = PrestoSql.sql(spark, "SHOW CATALOGS")
    assert(c.columns.toSeq == Seq("Catalog"))
    assert(c.collect().map(_.getString(0)).contains("spark_catalog"))
  }

  test("USE validates the schema; ALTER TABLE family is metadata-only") {
    PrestoSql.sql(spark, "USE default")
    intercept[IllegalArgumentException](PrestoSql.sql(spark, "USE no_such_schema"))
    intercept[IllegalArgumentException](PrestoSql.sql(spark, "USE badcat.default"))
    PrestoSql.sql(spark,
      "CREATE OR REPLACE TEMPORARY VIEW alt_spec AS SELECT n_nationkey, n_name FROM nation")
    PrestoSql.sql(spark, "ALTER TABLE alt_spec ADD COLUMN note varchar")
    intercept[IllegalArgumentException](
      PrestoSql.sql(spark, "ALTER TABLE alt_spec ADD COLUMN note varchar")) // duplicate
    PrestoSql.sql(spark, "ALTER TABLE alt_spec RENAME COLUMN n_name TO nation_name")
    PrestoSql.sql(spark, "ALTER TABLE alt_spec DROP COLUMN n_nationkey")
    intercept[IllegalArgumentException](
      PrestoSql.sql(spark, "ALTER TABLE alt_spec DROP COLUMN ghost"))
    PrestoSql.sql(spark, "ALTER TABLE alt_spec RENAME TO alt_spec2")
    assert(spark.table("alt_spec2").columns.toSeq == Seq("nation_name", "note"))
    assert(!spark.catalog.tableExists("alt_spec"))
    spark.catalog.dropTempView("alt_spec2")
    // schema DDL rides Spark natively; ALTER SCHEMA RENAME matches the
    // reference's primary-connector contract (RenameSchemaTask -> the
    // connector throws); SET PATH (SetPathTask) records and no-ops.
    PrestoSql.sql(spark, "CREATE SCHEMA IF NOT EXISTS meta_sch_spec")
    assert(spark.catalog.databaseExists("meta_sch_spec"))
    intercept[UnsupportedOperationException](
      PrestoSql.sql(spark, "ALTER SCHEMA meta_sch_spec RENAME TO meta_sch_spec2"))
    PrestoSql.sql(spark, "DROP SCHEMA meta_sch_spec")
    assert(!spark.catalog.databaseExists("meta_sch_spec"))
    assert(PrestoSql.sql(spark, "SET PATH a.b").head().getString(0) == "SET PATH")
    // EXPLAIN ANALYZE VERBOSE parses (SqlBase.g4:72) and returns the plan
    assert(PrestoSql.sql(spark, "EXPLAIN ANALYZE VERBOSE SELECT 1 AS x")
      .head().getString(0).nonEmpty)
  }

  test("CALL system.runtime.kill_query cancels a running statement (KillQueryProcedure.java)") {
    val ready = new java.util.concurrent.CountDownLatch(1)
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try {
        // the /*killme*/ marker makes the log entry findable; the front
        // door records the id at plan time, the collect runs after
        val df = PrestoSql.sql(spark,
          "SELECT /*killme*/ sum(xxhash64(a.id + b.id)) AS n " +
            "FROM range(30000000) a CROSS JOIN range(30000000) b")
        ready.countDown()
        df.collect()
      } catch { case e: Throwable => err = e; ready.countDown() }
    })
    t.start()
    ready.await()
    Thread.sleep(1000) // let the cartesian jobs actually start
    val id = PrestoSql.sql(spark,
      "SELECT query_id FROM system.runtime.queries " +
        "WHERE query LIKE '%kill' || 'me%' ORDER BY created DESC LIMIT 1")
      .head().getString(0)
    PrestoSql.sql(spark, s"CALL system.runtime.kill_query('$id')")
    t.join(60000)
    assert(!t.isAlive, "killed query thread should have terminated")
    assert(err != null, "cancelled collect must raise")
    val st = PrestoSql.sql(spark,
      s"SELECT state FROM system.runtime.queries WHERE query_id = '$id'")
      .head().getString(0)
    assert(st == "FAILED")
  }

  // ---- HTTP statement protocol (StatementResource.java:84,130,166) ----

  private def httpSend(method: String, uri: String, body: Option[String] = None)
      : (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
    val req = (method match {
      case "POST" => b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.get))
      case "DELETE" => b.DELETE()
      case _ => b.GET()
    }).build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  // minimal JSON field readers over the protocol envelope (jackson rides
  // the Spark classpath; using it keeps the spec honest about shape)
  private def json(body: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)

  test("HTTP protocol: POST returns id+nextUri, GET pages the full result, log shows FINISHED") {
    val server = graft.sql.StatementServer.start(spark)
    try {
      spark.range(3000).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v")
        .createOrReplaceTempView("http_rows")
      val (code, postBody) = httpSend("POST", s"${server.baseUri}/v1/statement",
        Some("SELECT k, v FROM http_rows ORDER BY k"))
      assert(code == 200)
      val post = json(postBody)
      val id = post.get("id").asText()
      assert(id.endsWith("_graft"), s"reference-shaped query id, got $id")
      assert(post.has("nextUri"), "POST must hand back a nextUri to poll")
      // client loop: follow nextUri until absent, accumulating data
      var uri = post.get("nextUri").asText()
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      var pagesWithData = 0
      var cols: Option[String] = None
      var spins = 0
      while (uri != null && spins < 500) {
        val (c, body) = httpSend("GET", uri)
        assert(c == 200, s"GET $uri -> $c: $body")
        val node = json(body)
        if (node.has("columns") && cols.isEmpty)
          cols = Some(node.get("columns").toString)
        if (node.has("data")) {
          pagesWithData += 1
          node.get("data").forEach(r => rows += ((r.get(0).asLong(), r.get(1).asDouble())))
        }
        uri = if (node.has("nextUri")) node.get("nextUri").asText() else null
        spins += 1
      }
      assert(rows.size == 3000, s"paged drain must return every row, got ${rows.size}")
      assert(pagesWithData >= 2, "3000 rows over 1024-row pages must span multiple pages")
      assert(rows.toSeq == (0L until 3000L).map(i => (i, i * 2.0)),
        "ordered values must round-trip the wire")
      assert(cols.exists(c => c.contains("\"k\"") && c.contains("bigint")
        && c.contains("\"v\"") && c.contains("double")), s"columns metadata: $cols")
      // the HTTP-submitted query is a first-class query-log citizen
      val st = PrestoSql.sql(spark,
        s"SELECT state FROM system.runtime.queries WHERE query_id = '$id'")
        .head().getString(0)
      assert(st == "FINISHED")
    } finally server.stop()
  }

  test("HTTP protocol: DELETE cancels the running statement and the log shows FAILED") {
    val server = graft.sql.StatementServer.start(spark)
    try {
      val (code, postBody) = httpSend("POST", s"${server.baseUri}/v1/statement",
        Some("SELECT sum(xxhash64(a.id + b.id)) AS n " +
          "FROM range(30000000) a CROSS JOIN range(30000000) b"))
      assert(code == 200)
      val post = json(postBody)
      val id = post.get("id").asText()
      Thread.sleep(1500) // let the cartesian jobs actually start
      val (dc, _) = httpSend("DELETE", s"${server.baseUri}/v1/statement/$id/0")
      assert(dc == 204)
      // the next GET reports the terminal state without a nextUri
      var state = ""
      var deadline = System.currentTimeMillis() + 60000
      while (state != "FAILED" && System.currentTimeMillis() < deadline) {
        val (_, body) = httpSend("GET", s"${server.baseUri}/v1/statement/$id/0")
        val node = json(body)
        state = node.get("stats").get("state").asText()
        if (state != "FAILED") Thread.sleep(200)
      }
      assert(state == "FAILED", "canceled query must surface FAILED through GET")
      val st = PrestoSql.sql(spark,
        s"SELECT state FROM system.runtime.queries WHERE query_id = '$id'")
        .head().getString(0)
      assert(st == "FAILED")
    } finally server.stop()
  }

  test("HTTP protocol: last-page retry is idempotent; out-of-order tokens are gone (410)") {
    val server = graft.sql.StatementServer.start(spark)
    try {
      spark.range(10).selectExpr("id AS k").createOrReplaceTempView("http_small")
      val (_, postBody) = httpSend("POST", s"${server.baseUri}/v1/statement",
        Some("SELECT k FROM http_small ORDER BY k"))
      val id = json(postBody).get("id").asText()
      // poll token 0 until the data page lands
      var body = ""
      var spins = 0
      var gotData = false
      while (!gotData && spins < 200) {
        body = httpSend("GET", s"${server.baseUri}/v1/statement/$id/0")._2
        gotData = json(body).has("data")
        spins += 1
        if (!gotData) Thread.sleep(50)
      }
      assert(gotData, "data page must arrive")
      // retrying the SAME token returns the identical page (client
      // retry semantics after a lost response)
      val retry = httpSend("GET", s"${server.baseUri}/v1/statement/$id/0")._2
      assert(retry == body, "same-token retry must be byte-identical")
      // skipping ahead is a protocol error
      val (gone, _) = httpSend("GET", s"${server.baseUri}/v1/statement/$id/5")
      assert(gone == 410)
    } finally server.stop()
  }

  // ---- client-carried session state over the wire (PrestoHeaders.java:
  // 26-37; StatementClient.processResponse folds response headers into
  // the state it echoes on later requests — this drives that loop) ----

  /** POST a statement with request headers, follow nextUri to the end;
    * returns (data rows as JSON arrays, accumulated response headers). */
  private def httpStatement(base: String, sql: String,
      headers: Seq[(String, String)] = Seq.empty)
      : (Seq[com.fasterxml.jackson.databind.JsonNode], Map[String, Seq[String]]) = {
    val client = java.net.http.HttpClient.newHttpClient()
    def send(method: String, uri: String, body: Option[String]) = {
      var b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
      headers.foreach { case (k, v) => b = b.header(k, v) }
      val req = (method match {
        case "POST" => b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.get))
        case _ => b.GET()
      }).build()
      client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[com.fasterxml.jackson.databind.JsonNode]
    var hdrs = Map.empty[String, Seq[String]]
    var resp = send("POST", s"$base/v1/statement", Some(sql))
    var spins = 0
    var done = false
    while (!done && spins < 600) {
      assert(resp.statusCode() == 200, s"${resp.statusCode()}: ${resp.body()}")
      import scala.jdk.CollectionConverters._
      resp.headers().map().asScala.foreach { case (k, vs) =>
        if (k.toLowerCase.startsWith("x-presto-"))
          hdrs = hdrs.updated(k.toLowerCase, hdrs.getOrElse(k.toLowerCase, Seq.empty) ++ vs.asScala)
      }
      val node = json(resp.body())
      if (node.has("error"))
        throw new RuntimeException(node.get("error").get("message").asText())
      if (node.has("data")) node.get("data").forEach(r => rows += r)
      if (node.has("nextUri")) { resp = send("GET", node.get("nextUri").asText(), None); spins += 1 }
      else done = true
    }
    assert(done, "statement did not finish draining")
    (rows.toSeq, hdrs)
  }

  test("HTTP protocol: SET SESSION round-trips via X-Presto-Session headers") {
    val server = graft.sql.StatementServer.start(spark)
    try {
      // SET SESSION answers with a Set-Session header for the client to
      // accumulate — and leaves NO state behind server-side
      val (_, setHdrs) = httpStatement(server.baseUri, "SET SESSION hash_partition_count = 7")
      assert(setHdrs.get("x-presto-set-session").exists(_.contains("hash_partition_count=7")),
        s"Set-Session header must carry the property: $setHdrs")
      // a client echoing the property back sees it in SHOW SESSION
      val (withState, _) = httpStatement(server.baseUri, "SHOW SESSION",
        Seq("X-Presto-Session" -> "hash_partition_count=7"))
      assert(withState.exists(r => r.get(0).asText() == "hash_partition_count"
        && r.get(1).asText() == "7"), s"header-carried property must be visible: $withState")
      // a client WITHOUT the header shares no state with the first one
      val (bare, _) = httpStatement(server.baseUri, "SHOW SESSION")
      assert(!bare.exists(_.get(0).asText() == "hash_partition_count"),
        "session state must live with the client, not the server")
      // RESET SESSION answers Clear-Session
      val (_, clrHdrs) = httpStatement(server.baseUri, "RESET SESSION hash_partition_count",
        Seq("X-Presto-Session" -> "hash_partition_count=7"))
      assert(clrHdrs.get("x-presto-clear-session").exists(_.contains("hash_partition_count")),
        s"Clear-Session header must name the property: $clrHdrs")
    } finally server.stop()
  }

  test("HTTP protocol: server-side prepared statements ride the prepare headers") {
    val server = graft.sql.StatementServer.start(spark)
    try {
      spark.range(10).selectExpr("id AS k").createOrReplaceTempView("http_prep")
      val prepSql = "SELECT k FROM http_prep WHERE k < ?"
      val (_, addHdrs) = httpStatement(server.baseUri, s"PREPARE ps1 FROM $prepSql")
      val added = addHdrs.getOrElse("x-presto-added-prepare", Seq.empty)
      assert(added.exists(_.startsWith("ps1=")), s"Added-Prepare must carry ps1: $addHdrs")
      val encoded = added.find(_.startsWith("ps1=")).get
      // EXECUTE with the client echoing the prepared statement back
      val (rows, _) = httpStatement(server.baseUri, "EXECUTE ps1 USING 5",
        Seq("X-Presto-Prepared-Statement" -> encoded))
      assert(rows.map(_.get(0).asLong()).sorted == Seq(0L, 1L, 2L, 3L, 4L),
        s"bound execute over the wire: $rows")
      // without the header the statement does not exist server-side
      val bare = intercept[RuntimeException](
        httpStatement(server.baseUri, "EXECUTE ps1 USING 5"))
      assert(bare.getMessage.contains("Prepared statement not found"))
      // DEALLOCATE answers Deallocated-Prepare
      val (_, dropHdrs) = httpStatement(server.baseUri, "DEALLOCATE PREPARE ps1",
        Seq("X-Presto-Prepared-Statement" -> encoded))
      assert(dropHdrs.get("x-presto-deallocated-prepare").exists(_.contains("ps1")),
        s"Deallocated-Prepare must name ps1: $dropHdrs")
    } finally server.stop()
  }

  test("HTTP protocol: a transaction spans statements via X-Presto-Transaction-Id") {
    val server = graft.sql.StatementServer.start(spark)
    try {
      val (_, startHdrs) = httpStatement(server.baseUri, "START TRANSACTION")
      val txnId = startHdrs.getOrElse("x-presto-started-transaction-id", Seq.empty).headOption
        .getOrElse(fail("START TRANSACTION must answer Started-Transaction-Id"))
      try {
        // two statements ride the same transaction id
        val (r1, _) = httpStatement(server.baseUri, "SELECT 1 AS x",
          Seq("X-Presto-Transaction-Id" -> txnId))
        assert(r1.head.get(0).asInt() == 1)
        val (r2, _) = httpStatement(server.baseUri, "SELECT 2 AS x",
          Seq("X-Presto-Transaction-Id" -> txnId))
        assert(r2.head.get(0).asInt() == 2)
        // an unknown id is the reference's error, not silent adoption
        val bad = intercept[RuntimeException](httpStatement(server.baseUri, "SELECT 3",
          Seq("X-Presto-Transaction-Id" -> "txn_deadbeef")))
        assert(bad.getMessage.contains("Unknown transaction"), bad.getMessage)
      } finally {
        val (_, endHdrs) = httpStatement(server.baseUri, "COMMIT",
          Seq("X-Presto-Transaction-Id" -> txnId))
        assert(endHdrs.get("x-presto-clear-transaction-id").exists(_.contains("true")),
          s"COMMIT must answer Clear-Transaction-Id: $endHdrs")
      }
    } finally server.stop()
  }

  // ---- resource-group admission (InternalResourceGroup.java
  // hardConcurrencyLimit/maxQueuedQueries; QueryQueueFullException.java;
  // FileResourceGroupConfigurationManager config shape) ----

  test("resource groups: concurrency-1 group queues, promotes, and rejects at maxQueued") {
    import graft.sql.ResourceGroups
    // http-sourced queries ride the gated group; the spec's own
    // front-door probes (source "graft") ride an unlimited one — the
    // per-source selector split the reference's StaticSelector does
    val cfg = ResourceGroups.Config(
      rootGroups = Seq(
        ResourceGroups.GroupSpec("limited", hardConcurrencyLimit = 1, maxQueued = 1, Nil),
        ResourceGroups.GroupSpec("adhoc", Int.MaxValue, Int.MaxValue, Nil)),
      selectors = Seq(
        ResourceGroups.Selector(None, Some("http".r), "limited"),
        ResourceGroups.Selector(None, None, "adhoc")))
    ResourceGroups.configure(spark, cfg)
    val server = graft.sql.StatementServer.start(spark)
    try {
      // q1 occupies the single slot: its worker parks on page
      // backpressure (no GETs yet) holding the permit mid-drain
      spark.range(100000).selectExpr("id AS k").createOrReplaceTempView("rg_rows")
      val (_, b1) = httpSend("POST", s"${server.baseUri}/v1/statement",
        Some("SELECT k FROM rg_rows"))
      val id1 = json(b1).get("id").asText()
      // q2 must go QUEUED (visible in system.runtime.queries), not run
      val (_, b2) = httpSend("POST", s"${server.baseUri}/v1/statement",
        Some("SELECT 42 AS x"))
      val id2 = json(b2).get("id").asText()
      def stateOf(id: String): String = PrestoSql.sql(spark,
        s"SELECT state FROM system.runtime.queries WHERE query_id = '$id'")
        .head().getString(0)
      Thread.sleep(500)
      assert(stateOf(id2) == "QUEUED",
        s"second query must wait for the group slot, got ${stateOf(id2)}")
      assert(ResourceGroups.snapshot(spark)
        .exists { case (g, running, queued, _, _) => g == "limited" && running == 1 && queued == 1 },
        s"group counters: ${ResourceGroups.snapshot(spark)}")
      // q3 overflows maxQueued=1: the reference's QUERY_QUEUE_FULL shape
      val (_, b3) = httpSend("POST", s"${server.baseUri}/v1/statement",
        Some("SELECT 43 AS x"))
      val id3 = json(b3).get("id").asText()
      var err3 = ""
      var spins = 0
      while (err3.isEmpty && spins < 100) {
        val node = json(httpSend("GET", s"${server.baseUri}/v1/statement/$id3/0")._2)
        if (node.has("error")) err3 = node.get("error").get("message").asText()
        else { Thread.sleep(50); spins += 1 }
      }
      assert(err3.contains("Too many queued queries for \"limited\""), s"got: $err3")
      // drain q1 -> slot frees -> q2 promotes and finishes with data
      var uri = s"${server.baseUri}/v1/statement/$id1/0"
      var n1 = 0
      while (uri != null) {
        val node = json(httpSend("GET", uri)._2)
        if (node.has("data")) node.get("data").forEach(_ => n1 += 1)
        uri = if (node.has("nextUri")) node.get("nextUri").asText() else null
      }
      assert(n1 == 100000, s"q1 must drain fully, got $n1")
      val deadline = System.currentTimeMillis() + 20000
      while (stateOf(id2) != "FINISHED" && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(stateOf(id2) == "FINISHED", s"queued query must promote and run: ${stateOf(id2)}")
      val r2 = json(httpSend("GET", s"${server.baseUri}/v1/statement/$id2/0")._2)
      assert(r2.has("data") && r2.get("data").get(0).get(0).asInt() == 42)
    } finally {
      ResourceGroups.disable(spark)
      server.stop()
    }
  }

  test("resource groups: reference JSON config parses; selectors expand ${USER} templates") {
    import graft.sql.ResourceGroups
    val cfg = ResourceGroups.parseConfig(
      """{
        |  "rootGroups": [
        |    {"name": "global", "softMemoryLimit": "1MB", "hardConcurrencyLimit": 100,
        |     "maxQueued": 1000, "softCpuLimit": "1h", "schedulingPolicy": "weighted",
        |     "subGroups": [
        |       {"name": "${USER}", "maxRunning": 3, "maxQueued": 4, "schedulingWeight": 5}
        |     ]}
        |  ],
        |  "selectors": [
        |    {"user": "bob|alice", "group": "global.${USER}"},
        |    {"source": ".*etl.*", "group": "global"}
        |  ],
        |  "cpuQuotaPeriod": "1h"
        |}""".stripMargin)
    assert(cfg.rootGroups.map(_.name) == Seq("global"))
    assert(cfg.rootGroups.head.hardConcurrencyLimit == 100 && cfg.rootGroups.head.maxQueued == 1000)
    assert(cfg.rootGroups.head.subGroups.head.hardConcurrencyLimit == 3, "maxRunning alias")
    assert(ResourceGroups.selectGroup(cfg, "bob", "cli") == Some("global.bob"),
      "first-match selector with template expansion")
    assert(ResourceGroups.selectGroup(cfg, "eve", "nightly-etl") == Some("global"))
    assert(ResourceGroups.selectGroup(cfg, "eve", "cli") == None, "no selector -> rejected")
  }

  test("session property defaults apply under SET SESSION (FileSessionPropertyManager)") {
    import graft.sql.SessionDefaults
    val specs = SessionDefaults.parse(
      """{"sessionProperties": [
        |  {"sessionProperties": {"query_max_run_time": "2h"}},
        |  {"source": "http", "sessionProperties": {"hash_partition_count": "11"}},
        |  {"user": "nobody-matches", "sessionProperties": {"query_priority": "1"}}
        |]}""".stripMargin)
    SessionDefaults.configure(spark, specs)
    try {
      // configured default is visible in SHOW SESSION without any SET
      def show(): Map[String, String] = PrestoSql.sql(spark, "SHOW SESSION")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(show().get("query_max_run_time") == Some("2h"),
        s"matching default must surface: ${show()}")
      assert(!show().contains("query_priority"), "non-matching spec must not apply")
      assert(!show().contains("hash_partition_count"),
        "source-scoped default must not apply to the graft front door")
      // explicit SET SESSION overrides the default
      PrestoSql.sql(spark, "SET SESSION query_max_run_time = '5m'")
      assert(show().get("query_max_run_time") == Some("5m"), "SET SESSION wins over default")
      PrestoSql.sql(spark, "RESET SESSION query_max_run_time")
      assert(show().get("query_max_run_time") == Some("2h"), "RESET falls back to the default")
      // the http-scoped default reaches an HTTP-submitted SHOW SESSION
      val server = graft.sql.StatementServer.start(spark)
      try {
        val (rows, _) = httpStatement(server.baseUri, "SHOW SESSION")
        assert(rows.exists(r => r.get(0).asText() == "hash_partition_count"
          && r.get(1).asText() == "11"), s"per-source default over HTTP: $rows")
      } finally server.stop()
    } finally SessionDefaults.disable(spark)
  }

  test("HTTP protocol: DELETE terminates the worker thread (no re-park on the page queue)") {
    val server = graft.sql.StatementServer.start(spark)
    try {
      // >16 pages of already-cheap rows: without the poison flag the
      // worker refills the 16-slot queue after cancel() drains it once
      // and parks forever on put (VERDICT r9 finding)
      spark.range(100000).selectExpr("id AS k").createOrReplaceTempView("http_big")
      val (_, postBody) = httpSend("POST", s"${server.baseUri}/v1/statement",
        Some("SELECT k FROM http_big"))
      val id = json(postBody).get("id").asText()
      // let the worker fill the queue to capacity
      var spins = 0
      while (spins < 100 && server.workerFinished(id)) { Thread.sleep(20); spins += 1 }
      Thread.sleep(300)
      val (dc, _) = httpSend("DELETE", s"${server.baseUri}/v1/statement/$id/0")
      assert(dc == 204)
      val deadline = System.currentTimeMillis() + 15000
      while (!server.workerFinished(id) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(server.workerFinished(id),
        "cancelled query's worker must exit instead of re-parking on the bounded queue")
    } finally server.stop()
  }
}
