package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned band (range) join — |left.x − right.x| <= width as an
  * EQUI-join. Spark plans a bare band predicate as a nested-loop join
  * (BroadcastNestedLoopJoin: O(n·m) compares, broadcast-bounded), which
  * dies at 100 TB. Binning is the standard decomposition: bucket both
  * sides into width-sized bins, replicate each left row into its bin
  * and both neighbors (3×), equi-join on the bin, then apply the exact
  * band predicate. Every qualifying pair shares the right row's bin
  * with one of the three left copies — exactly one match emission, no
  * dedup pass. Cost: one hash shuffle per side on the bin key + a
  * selective post-filter; the 3× fan-out is constant, not data-sized.
  * (Same decomposition the reference's spatial joins use for their
  * grid-partitioned path.)
  */
object RangeJoinOps {

  def bandJoin(left: DataFrame, right: DataFrame, leftCol: String,
      rightCol: String, width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val lb = left.withColumn("__jbin",
      explode(array(floor(col(leftCol) / width) - 1,
        floor(col(leftCol) / width),
        floor(col(leftCol) / width) + 1)))
    val rb = right.withColumn("__rbin", floor(col(rightCol) / width))
    lb.join(rb, col("__jbin") === col("__rbin") &&
        abs(col(leftCol) - col(rightCol)) <= width)
      .drop("__jbin", "__rbin")
  }
}
