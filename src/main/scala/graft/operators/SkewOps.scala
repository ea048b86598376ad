package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators — the 100 TB discipline as a first-class
  * API. The reference handles skew implicitly via page-level work
  * stealing (operator/Driver.java); Spark's shuffle hashes whole keys to
  * one reducer, so a hot key (one user with 10^9 events) needs either
  * AQE skew-join splitting (enabled in Engine.session) or explicit
  * salting for aggregations, which AQE does NOT rebalance.
  *
  * Two-stage salted aggregation: stage 1 groups on (key, salt) spreading
  * a hot key over `buckets` reducers; stage 2 re-aggregates partials by
  * key. Correct for any algebraic aggregate (sum/count/min/max) — the
  * partial and final functions are supplied per column.
  */
object SkewOps {

  /** Retry-stable salt: a content hash of the whole row, not
    * `monotonically_increasing_id`/`spark_partition_id` — those change on
    * task retry and recompute-after-eviction, which makes the salted plan
    * nondeterministic exactly when a 1000-executor run needs it stable.
    * Hot-key rows still spread: identical duplicate rows sharing a bucket
    * is fine (the partial agg absorbs them).
    */
  private def contentSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets))

  /** salted sum/count: df.groupBy(key) but hot keys spread over
    * `buckets` partial groups first.
    */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column, buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", contentSalt(df, buckets))
    salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("__key"))
      .agg(sum("__psum").as("total"), sum("__pcnt").as("cnt"))
  }

  /** Generic two-stage aggregation: `partials` computed per (key, salt),
    * then `finals` merge them per key. Caller guarantees the pair is a
    * valid partial/final decomposition.
    */
  def salted(df: DataFrame, key: Column, buckets: Int)(
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    df.withColumn("__salt", contentSalt(df, buckets))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(finals.head, finals.tail: _*)
  }
}
