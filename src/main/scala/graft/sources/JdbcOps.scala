package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedded JDBC connector slice (SURVEY §2.1 system connectors; the
  * reference's JDBC connector family — presto-base-jdbc
  * BaseJdbcClient.java `getSplits`/`buildSql` pushes column lists and
  * TupleDomain predicates into the remote SQL, and fans out one split
  * per table "chunk").
  *
  * Spark's analog is the built-in JDBC source: `spark.read.jdbc` plans a
  * `JDBCRelation` whose scan compiles Catalyst filters into the remote
  * WHERE clause (PushedFilters) and prunes columns into the remote
  * SELECT list; the partitioned-read form (partitionColumn/lower/upper/
  * numPartitions) is the split fan-out — N executors each open a
  * connection and read a key-range slice, which is THE scale path for
  * ingesting a big table from an RDBMS into a 1000-executor job.
  *
  * The database here is in-JVM Derby (`jdbc:derby:memory:`) because the
  * sandbox has zero egress — on a real cluster only the URL changes; the
  * Spark-side plumbing (dialect, pushdown, split generation) is
  * identical and is what the specs pin.
  */
object JdbcOps {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** CREATE + load a fixture slice into the embedded database (the
    * write side of the connector: JdbcUtils batches INSERTs, one
    * connection per partition — same shape as writing to a warehouse
    * RDBMS from a job).
    */
  def writeTable(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  /** Single-split read (schema discovery + full scan through one
    * connection).
    */
  def readTable(s: SparkSession, table: String): DataFrame =
    s.read.jdbc(url, table, props)

  /** Range-partitioned read: numPartitions key-range slices, each a
    * separate remote query — the split fan-out of the reference's
    * `getSplits`. At 100 TB-side scale this is how a large dimension
    * snapshot is ingested without serializing through one connection.
    */
  def readPartitioned(s: SparkSession, table: String, partCol: String,
      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    s.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)

  /** CREATE INDEX on the embedded table (the structure the index join
    * probes; Derby b-tree). */
  def createIndex(table: String, column: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.execute(s"""CREATE INDEX idx_${table}_$column ON $table ("$column")""")
      finally st.close()
    } finally c.close()
  }

  /** Index join — the reference's IndexJoinOptimizer.java:69 /
    * index/IndexLoader.java: instead of SCANNING the indexed table and
    * shuffling both sides, stream the probe side's keys against the
    * index in batches and emit matches. Spark-first shape: one
    * mapPartitions over the probe side — each partition opens one
    * connection and issues batched `WHERE key IN (...)` lookups that
    * Derby answers from the b-tree; no scan of the index side, no
    * shuffle of either side, probe partitioning preserved. This is the
    * right plan when the probe side is small relative to the indexed
    * table (the exact condition the reference's optimizer checks); for
    * probe >> index, broadcast or shuffle joins win and the declarative
    * path already produces them.
    *
    * Inner-join semantics: each probe ROW fans out once per index match.
    * Output schema: probe columns ++ looked-up columns.
    */
  def indexLookupJoin(s: SparkSession, probe: DataFrame, probeKey: String,
      table: String, indexKey: String, lookupCols: Seq[String],
      batchSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // The unquoted IN-list below is only sound for integral keys — fail
    // at plan time, not with broken SQL at runtime (ADVICE r7).
    probe.schema(probeKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"indexLookupJoin requires an integral probe key; $probeKey is $other")
    }
    val indexSchema = s.read.jdbc(url, table, props).select(
      lookupCols.map(org.apache.spark.sql.functions.col): _*).schema
    val outSchema = StructType(probe.schema.fields ++ indexSchema.fields)
    val probeIdx = probe.schema.fieldIndex(probeKey)
    val nProbeCols = probe.schema.size
    val dbUrl = url
    // Spark's JDBC writer quotes column identifiers (exact lowercase)
    // while the table name passes through unquoted (Derby canonicalizes
    // it to uppercase) — mirror that here.
    val cols = lookupCols.map(c => s""""$c"""").mkString(", ")
    val rows = probe.rdd.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val conn = java.sql.DriverManager.getConnection(dbUrl)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => if (!conn.isClosed) conn.close()))
        // one IN-list lookup per batch, streamed — memory is O(batch x
        // fanout), never the whole partition's output
        it.grouped(batchSize).flatMap { chunk =>
          // NULL never equi-joins: null probe keys are excluded from the
          // IN-list and their rows dropped below (inner-join semantics).
          val keys = chunk.map(_.get(probeIdx)).filter(_ != null).distinct
          val matches = scala.collection.mutable.Map[Long, List[Array[Any]]]()
          if (keys.nonEmpty) {
            val in = keys.mkString(", ") // integral keys only (checked above)
            val st = conn.createStatement()
            try {
              val rs = st.executeQuery(
                s"""SELECT "$indexKey", $cols FROM $table WHERE "$indexKey" IN ($in)""")
              while (rs.next()) {
                val k = rs.getLong(1)
                val vals = Array.tabulate[Any](lookupCols.length) { i =>
                  rs.getObject(i + 2) match {
                    // Spark's Derby dialect writes StringType as CLOB
                    case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
                    case v => v
                  }
                }
                matches(k) = vals :: matches.getOrElse(k, Nil)
              }
              rs.close()
            } finally st.close()
          }
          chunk.iterator.flatMap { pr =>
            pr.get(probeIdx) match {
              case null => Nil
              case n: Number =>
                matches.getOrElse(n.longValue(), Nil).reverse.map(vals =>
                  Row.fromSeq(pr.toSeq ++ vals.toSeq))
            }
          }
        }
      }
    }
    s.createDataFrame(rows, outSchema)
  }
}
