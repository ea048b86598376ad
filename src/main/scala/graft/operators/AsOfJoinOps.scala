package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * rightTime <= leftTime in the same key group. The canonical
  * time-series / feature-backfill join (quotes→trades, state→events),
  * absent from both Spark and the reference's SQL surface, but required
  * by any training-data pipeline that joins point-in-time features.
  *
  * NOT a range theta-join (O(n·m) per key) and NOT a per-row correlated
  * subquery: both sides union into one stream, ONE hash shuffle on the
  * key, one within-partition sort by (time, side), and a running
  * `last(payload, ignoreNulls)` window carries the most recent right
  * payload forward into each left row. Cost is that of a single window
  * over the combined stream — linear after sort, no join explosion,
  * AQE-skew-safe like any window. Ties at equal time sort the right row
  * first, giving the ASOF `<=` semantics.
  */
object AsOfJoinOps {

  /** Left columns pass through; right payload columns (everything except
    * `key` and `rightTime`) are appended, null where no right row
    * precedes the left row. Payload names must not collide with left
    * column names (caller renames).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    require(payload.nonEmpty, "right side needs at least one payload column")
    require(payload.forall(!left.columns.contains(_)),
      s"payload columns ${payload.mkString(",")} must not collide with left columns")

    // All payload columns ride in ONE struct so the carried values always
    // come from the SAME right row, and a right row whose payload field is
    // genuinely NULL still wins the as-of match (the struct itself is
    // non-null for every right row; per-column last(ignoreNulls) would
    // skip it and stitch together fields from different rows).
    val leftCols = left.columns.toSeq
    val pay = struct(payload.map(col): _*)
    val lNorm = left.select(
      leftCols.map(col) ++
        Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(right.select(pay).schema.head.dataType).as("__pay")): _*)
    val rNorm = right.select(
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
          pay.as("__pay")): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__pay.$c").as(c)): _*)
  }
}
