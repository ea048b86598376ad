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
}
