package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KDB-tree spatial partitioning — the reference's
  * spatial_partitioning() + partitioned spatial join
  * (presto-geospatial-toolkit/.../KdbTree.java:275-299,
  * presto-geospatial/.../SpatialPartitioningAggregateFunction.java,
  * sql/planner/optimizations/ExtractSpatialJoins.java partitioned path)
  * re-expressed Spark-first.
  *
  * Where the uniform grid (SpatialJoinOps) keys a join on fixed-size
  * cells, a KDB tree ADAPTS the partition boundaries to the observed
  * density: recursive median splits on the wider-extent axis (the
  * reference's `extent.getWidth() >= extent.getHeight()` rule,
  * KdbTree.java:291) until each leaf holds <= capacity sample points.
  * Heavily clustered data therefore gets many small leaves where the
  * mass is and a few huge ones where it isn't — bounded per-partition
  * candidate counts without guessing a cell size, which is exactly why
  * the reference partitions its distributed spatial joins this way.
  *
  * Scale shape: the tree is built from a BOUNDED deterministic sample
  * (hash-mod thinning, ~targetSample rows collected to the driver —
  * same role as the reference's sampled spatial_partitioning agg),
  * then shipped to executors inside closure UDFs that descend the tree
  * in O(log leaves) per row. The join itself is a plain equi-join on
  * leaf id: left rows hash to exactly one leaf (half-open boundaries),
  * right rows replicate to every leaf whose box intersects their
  * radius envelope, so each qualifying pair meets in exactly the
  * left row's leaf — duplicate-free with no distinct().
  */
object KdbTreeOps {

  sealed trait Kdb extends Serializable
  final case class KdbLeaf(id: Int) extends Kdb
  /** axis 0 = x, 1 = y; lo covers < value, hi covers >= value. */
  final case class KdbSplit(axis: Int, value: Double, lo: Kdb, hi: Kdb) extends Kdb

  /** Recursive median build, wider-extent axis first (KdbTree.java:291).
    * Points are a deterministic multiset; ties on the median stay in
    * `hi` (>= value), and a degenerate split (all sample points equal
    * on both axes) terminates as a leaf.
    */
  def build(points: Array[(Double, Double)], leafCapacity: Int): Kdb = {
    var nextId = -1
    def go(pts: Array[(Double, Double)]): Kdb = {
      if (pts.length <= leafCapacity) { nextId += 1; return KdbLeaf(nextId) }
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      val width = xs.max - xs.min; val height = ys.max - ys.min
      val axis = if (width >= height) 0 else 1
      def splitOn(a: Int): Option[Kdb] = {
        val keyed = if (a == 0) xs else ys
        val sorted = keyed.sorted
        val median = sorted(sorted.length / 2)
        val (lo, hi) = pts.partition(p => (if (a == 0) p._1 else p._2) < median)
        if (lo.isEmpty || hi.isEmpty) None
        else Some(KdbSplit(a, median, go(lo), go(hi)))
      }
      splitOn(axis).orElse(splitOn(1 - axis)).getOrElse { nextId += 1; KdbLeaf(nextId) }
    }
    go(points.sorted)
  }

  def numLeaves(tree: Kdb): Int = tree match {
    case KdbLeaf(_) => 1
    case KdbSplit(_, _, lo, hi) => numLeaves(lo) + numLeaves(hi)
  }

  def maxDepth(tree: Kdb): Int = tree match {
    case KdbLeaf(_) => 1
    case KdbSplit(_, _, lo, hi) => 1 + math.max(maxDepth(lo), maxDepth(hi))
  }

  /** The unique leaf containing (x, y) — O(depth) descent. */
  def leafOf(tree: Kdb, x: Double, y: Double): Int = tree match {
    case KdbLeaf(id) => id
    case KdbSplit(a, v, lo, hi) =>
      leafOf(if ((if (a == 0) x else y) < v) lo else hi, x, y)
  }

  /** All leaves whose region intersects the closed box
    * [x-r, x+r] x [y-r, y+r] — descends both children only where the
    * envelope straddles the split. */
  def leavesNear(tree: Kdb, x: Double, y: Double, r: Double): List[Int] = tree match {
    case KdbLeaf(id) => List(id)
    case KdbSplit(a, v, lo, hi) =>
      val c = if (a == 0) x else y
      val goLo = c - r < v
      val goHi = c + r >= v
      (if (goLo) leavesNear(lo, x, y, r) else Nil) :::
        (if (goHi) leavesNear(hi, x, y, r) else Nil)
  }

  /** Deterministic bounded sample of exactly min(n, targetSample)
    * (x, y) points in ONE pass: bottom-k by xxhash64 (a KMV/bottom-k
    * sketch — the same uniform-sample-without-count trick SetDigest
    * uses). orderBy+limit plans as TakeOrderedAndProject: per-partition
    * k-row heaps, one k-row merge — no global sort, no count() pre-scan
    * (the previous form scanned the input twice: once to count, once to
    * thin). Partitioning-independent and retry-stable: the selected set
    * depends only on the hash values.
    */
  def samplePoints(df: DataFrame, xCol: String, yCol: String,
      targetSample: Int): Array[(Double, Double)] = {
    df.select(col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
      .orderBy(xxhash64(col("__x"), col("__y")))
      .limit(math.max(1, targetSample))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
  }

  /** All (left, right) pairs with euclidean distance <= radius, joined
    * via KDB-tree leaf partitioning. Output: left.* ++ right.* ++ `dist`
    * (column names must not collide).
    */
  def distanceJoinKdb(left: DataFrame, lx: String, ly: String,
      right: DataFrame, rx: String, ry: String, radius: Double,
      leafCapacity: Int = 64, targetSample: Int = 4096): DataFrame = {
    require(radius > 0, "radius must be positive")
    val tree = build(samplePoints(left, lx, ly, targetSample), leafCapacity)
    val leafU = udf((x: Double, y: Double) => leafOf(tree, x, y))
    val nearU = udf((x: Double, y: Double) => leavesNear(tree, x, y, radius))
    val l = left.withColumn("__leaf", leafU(col(lx), col(ly)))
    val r = right.withColumn("__leaf", explode(nearU(col(rx), col(ry))))
    val dist = SpatialJoinOps.stDistance(col(lx), col(ly), col(rx), col(ry))
    l.join(r, Seq("__leaf"))
      .filter(dist <= radius)
      .drop("__leaf")
      .withColumn("dist", dist)
  }
}
