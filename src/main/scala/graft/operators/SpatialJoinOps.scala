package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spatial join — the reference's SpatialJoinOperator
  * (operator/SpatialJoinOperator.java:40, PagesRTreeIndex.java, planned
  * by iterative/rule/ExtractSpatialJoins.java) re-expressed Spark-first.
  *
  * The reference builds an in-memory R-tree over the build side and
  * probes it per row — a single-node index structure. The distributed
  * equivalent is GRID BINNING: with cell size >= radius, any two points
  * within `radius` are at most one cell apart per axis, so binning the
  * left side to its cell and expanding the right side to its 3x3
  * neighborhood turns ST_Distance(a,b) < r into an EQUI-join on
  * (cell_x, cell_y) + an exact distance refine. Catalyst then plans a
  * plain shuffled hash/sort-merge join — no cartesian product, no
  * driver-side index; candidate pairs are bounded by local density
  * (the same guarantee the R-tree gives, but shuffle-partitionable to
  * any cluster size).
  *
  * Each (left, right) pair is emitted at most once: the left point
  * belongs to exactly one cell, and the right point's 9 neighbor copies
  * carry distinct cell keys.
  */
object SpatialJoinOps {

  /** Euclidean ST_Distance for point coordinates (GeoFunctions.java
    * stDistance) — pure codegen arithmetic. */
  def stDistance(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    // explicit multiply, not pow(): Math.pow is not guaranteed correctly
    // rounded, x*x is — keeps the oracle hash-comparable bit-for-bit
    sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))

  /** All (left, right) pairs with distance(l, r) <= radius.
    * Output: left.* ++ right.* ++ `dist`. Column names must not collide.
    */
  def distanceJoin(left: DataFrame, lx: String, ly: String,
      right: DataFrame, rx: String, ry: String, radius: Double): DataFrame = {
    require(radius > 0, "radius must be positive")
    val cellL = left
      .withColumn("__cx", floor(col(lx) / radius))
      .withColumn("__cy", floor(col(ly) / radius))
    val cellR = right
      .withColumn("__dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__dy", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__cx", floor(col(rx) / radius) + col("__dx"))
      .withColumn("__cy", floor(col(ry) / radius) + col("__dy"))
      .drop("__dx", "__dy")
    val dist = stDistance(col(lx), col(ly), col(rx), col(ry))
    cellL.join(cellR, Seq("__cx", "__cy"))
      .filter(dist <= radius)
      .drop("__cx", "__cy")
      .withColumn("dist", dist)
  }
}
