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

    val leftCols = left.columns.toSeq
    val lNorm = left.select(
      leftCols.map(col) ++
        Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val rNorm = right.select(
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(lNorm.unionByName(rNorm)) { (df, c) =>
      df.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__p_$c").as(c)): _*)
  }
}
