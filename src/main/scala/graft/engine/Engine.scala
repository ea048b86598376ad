package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + catalog bootstrap for the graft engine.
  *
  * Mirrors the role of the reference's LocalQueryRunner bootstrap
  * (presto-tests/.../LocalQueryRunner: catalog registration + session
  * defaults) but Spark-native: one `SparkSession` with AQE + CBO enabled,
  * UTC session time zone, and the driver's parquet fixtures registered as
  * temp views.
  *
  * Scale notes (100 TB discipline): nothing here caches or collects; table
  * registration is metadata-only (parquet footer reads). Shuffle
  * partitioning is left to the session builder (32 on local[32]; a real
  * cluster would size it to cores × executors with AQE coalescing).
  */
object Engine {

  /** Fixture tables the driver generates (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Build a tuned local session (tests / standalone use). */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  // Remember which fixture dir each session has registered so per-query
  // re-registration is a no-op (avoids re-reading parquet footers for
  // every one of the ~dozens of Verify queries). Keyed on session
  // identity (weak) — hashCode collisions would skip registration.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every fixture table under `dir` as a temp view. Idempotent
    * per (session, dir). Also installs the graft function extensions.
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) != dir) {
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read nanos as long and restore a micros timestamp column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      tableNames.foreach { t =>
        val p = s"$dir/$t.parquet"
        if (new java.io.File(p).exists()) {
          val df0 = spark.read.parquet(p)
          val df =
            if (t == "events")
              df0.withColumn("ts",
                org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
            else df0
          df.createOrReplaceTempView(t)
        }
      }
      graft.functions.FunctionRegistry.installAll(spark)
      registered.put(spark, dir)
    }
  }

  /** Convenience: registered view as DataFrame. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerTables(spark, dir)
    spark.table(name)
  }
}
