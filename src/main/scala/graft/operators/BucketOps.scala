package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) tables — the reference's Hive bucketing
  * (presto-hive/.../HiveBucketing.java) and grouped execution
  * (presto-main/.../operator/PipelineExecutionStrategy.java role):
  * co-locate both sides of a hot join ONCE at write time so every
  * subsequent join/aggregate on the bucket key runs shuffle-free.
  *
  * This is the single biggest structural lever for the TPC-H-shaped
  * workload at 100 TB: q3/q18/q21 each shuffle lineitem on l_orderkey
  * per query; bucketing lineitem and orders by orderkey at ingest pays
  * that shuffle once. Spark picks the bucketing up through
  * `HashPartitioning` — the join's `EnsureRequirements` sees the
  * distribution already satisfied and plans no Exchange (asserted by
  * spec). Bucket counts must match on both sides (Spark requirement;
  * Hive bucketing has the same constraint).
  */
object BucketOps {

  /** Write `df` as a managed parquet table bucketed (and in-bucket
    * sorted) on `key`. Sorted buckets let sort-merge joins skip the
    * per-partition sort when Spark can prove one file per bucket.
    * A stale warehouse location from a previous session (the in-memory
    * catalog forgets the table; the directory survives) is cleared
    * first, or saveAsTable refuses the name.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** True when `plan` contains no shuffle exchange — the property
    * bucketing exists to deliver.
    */
  def isShuffleFree(spark: SparkSession, df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
