package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional data layout
  * for scan pruning. The reference's layout levers are single-dimension
  * (Hive partition keys + sorted-by-one-column files); a 100 TB
  * scan-heavy workload filtering on TWO columns needs both to cluster,
  * which is exactly what interleaving their bits delivers: files (and
  * parquet row groups) become tight min/max boxes in BOTH dimensions,
  * so a 2-D predicate touches a small fraction of files instead of all
  * of them. This is the OPTIMIZE ZORDER pattern of modern lakehouse
  * formats, built from pure Catalyst bit arithmetic (codegen'd, no UDF).
  */
object ZOrderOps {

  /** Morton-interleave two 16-bit normalized columns into a 32-bit
    * z-value: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Pure native bit ops — stays inside whole-stage codegen.
    */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Scale a numeric column to [0, 65535] given its min/max (computed
    * once, metadata-scale).
    */
  def normalize16(c: Column, minV: Double, maxV: Double): Column = {
    val span = math.max(maxV - minV, 1e-12)
    least(lit(65535L), greatest(lit(0L),
      ((c.cast("double") - lit(minV)) * lit(65535.0 / span)).cast("long")))
  }

  /** Write `df` to parquet at `path` z-ordered on (c1, c2) across
    * `numFiles` files: range-partition + sort by the z-value so each
    * file covers a tight Morton-curve segment (a small min/max box in
    * both dimensions). One extra shuffle at write time buys every
    * subsequent 2-D range scan its pruning.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int): Unit = {
    val b = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    val z = interleave16(
      normalize16(col(c1), b.getDouble(0), b.getDouble(1)),
      normalize16(col(c2), b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Number of distinct files that contain rows matching `pred` — the
    * measurable proxy for layout quality: tighter clustering means
    * fewer files hold any given range's rows (and parquet min/max
    * skips the rest).
    */
  def filesTouched(df: DataFrame, pred: Column): Long =
    df.filter(pred).select(input_file_name()).distinct().count()
}
