package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT geometry accessors — the SQL/MM accessor slice of the reference's
  * geometry plugin (presto-geospatial/.../GeoFunctions.java: stX/stY,
  * stGeometryType, stNumPoints, stIsClosed, stIsRing, stIsEmpty,
  * stStartPoint/stEndPoint/stPointN, stDimension/stCoordDim,
  * lineLocatePoint), re-expressed over WKT text columns as pure
  * higher-order-function Column arithmetic (no UDFs, no geometry
  * library).
  *
  * Geometry carrier: WKT strings in, arrays of struct<x,y> inside —
  * consistent with SpatialJoinOps.parsePolygonWkt. Scope: single
  * POINT / LINESTRING / POLYGON (exterior ring); MULTI* and EMPTY
  * variants are recognized by type/emptiness accessors only.
  */
object WktGeometry {

  /** Leading WKT keyword, uppercased: POINT, LINESTRING, POLYGON, ... */
  def wktKind(wkt: Column): Column =
    upper(regexp_extract(trim(wkt), "^([A-Za-z]+)", 1))

  /** ST_GeometryType: the reference returns the OGC name prefixed ST_
    * (GeoFunctions.java stGeometryType). */
  def stGeometryType(wkt: Column): Column = {
    val k = wktKind(wkt)
    when(k === "POINT", "ST_Point")
      .when(k === "LINESTRING", "ST_LineString")
      .when(k === "POLYGON", "ST_Polygon")
      .when(k === "MULTIPOINT", "ST_MultiPoint")
      .when(k === "MULTILINESTRING", "ST_MultiLineString")
      .when(k === "MULTIPOLYGON", "ST_MultiPolygon")
      .when(k === "GEOMETRYCOLLECTION", "ST_GeomCollection")
  }

  /** ST_IsEmpty: WKT 'EMPTY' form. */
  def stIsEmpty(wkt: Column): Column = upper(trim(wkt)).rlike("EMPTY$")

  /** Vertex list of a POINT / LINESTRING / single-ring POLYGON:
    * array<struct<x,y>> (polygon keeps the closing repeat vertex, as
    * parsePolygonWkt does). */
  def wktPoints(wkt: Column): Column =
    transform(
      split(regexp_replace(trim(wkt),
        "(?i)^[A-Z]+\\s*\\(\\(?|\\)?\\)\\s*$", ""), ","),
      t => struct(
        element_at(split(trim(t), "\\s+"), 1).cast("double").as("x"),
        element_at(split(trim(t), "\\s+"), 2).cast("double").as("y")))

  /** ST_NumPoints (GeometryUtils.getPointCount): polygons do NOT count
    * the duplicate ring-closing vertex; EMPTY is 0. */
  def stNumPoints(wkt: Column): Column = {
    val n = size(wktPoints(wkt))
    when(stIsEmpty(wkt), lit(0L))
      .when(wktKind(wkt) === "POLYGON", (n - 1).cast("long"))
      .otherwise(n.cast("long"))
  }

  /** ST_X / ST_Y — POINT only (the caller guards kind, as the reference
    * errors on other types). */
  def stX(wkt: Column): Column = element_at(wktPoints(wkt), 1).getField("x")
  def stY(wkt: Column): Column = element_at(wktPoints(wkt), 1).getField("y")

  private def samePoint(a: Column, b: Column): Column =
    a.getField("x") === b.getField("x") && a.getField("y") === b.getField("y")

  // ---- pts-level variants ----
  // Column expressions have no common-subexpression sharing across use
  // sites: each reference to a helper that embeds wktPoints(wkt)
  // DUPLICATES the whole parse subtree, and inside HOF lambdas the
  // duplicates re-evaluate per element. Wide projections should parse
  // ONCE into a pts column (withColumn) and use these.

  /** ST_IsClosed over a parsed vertex array. */
  def isClosedPts(pts: Column): Column =
    samePoint(element_at(pts, 1), element_at(pts, size(pts)))

  /** ST_IsClosed — LINESTRING: first vertex equals last. */
  def stIsClosed(wkt: Column): Column = isClosedPts(wktPoints(wkt))

  /** ST_StartPoint / ST_EndPoint / ST_PointN as coordinate structs. */
  def stStartPoint(wkt: Column): Column = element_at(wktPoints(wkt), 1)
  def stEndPoint(wkt: Column): Column = {
    val pts = wktPoints(wkt)
    element_at(pts, size(pts))
  }
  def stPointN(wkt: Column, n: Column): Column = element_at(wktPoints(wkt), n)

  /** ST_Dimension: point 0, line 1, polygon 2 (GeoFunctions.java
    * stDimension); ST_CoordDim is always 2 (2-D WKT only). */
  def stDimension(wkt: Column): Column = {
    val k = wktKind(wkt)
    when(k.isin("POINT", "MULTIPOINT"), lit(0))
      .when(k.isin("LINESTRING", "MULTILINESTRING"), lit(1))
      .otherwise(lit(2)).cast("byte")
  }
  def stCoordDim(wkt: Column): Column = lit(2).cast("byte")

  /** Consecutive-vertex segments: array<struct<ax,ay,bx,by>>. */
  def segments(pts: Column): Column =
    transform(sequence(lit(2), size(pts)), i => struct(
      element_at(pts, i - 1).getField("x").as("ax"),
      element_at(pts, i - 1).getField("y").as("ay"),
      element_at(pts, i).getField("x").as("bx"),
      element_at(pts, i).getField("y").as("by")))

  /** ST_IsRing — LINESTRING that is closed and simple. Simplicity here
    * is closed + all-distinct interior vertices + no PROPER edge
    * crossing (strict orientation test on non-adjacent segment pairs —
    * the classic cross-product sidedness check). Collinear-overlap
    * self-touching is not detected — documented delta vs the ESRI
    * isSimple the reference delegates to; any proper crossing (bowtie)
    * is caught.
    */
  def stIsRing(wkt: Column): Column = isRingPts(wktPoints(wkt))

  /** ST_IsRing over a parsed vertex array (see stIsRing). */
  def isRingPts(pts: Column): Column = {
    val interior = slice(pts, lit(1), size(pts) - 1)
    val distinctVerts = size(array_distinct(interior)) === size(interior)
    val segs = segments(pts)
    val n = size(segs)
    // all non-adjacent index pairs (i, j): j >= i+2, and not the
    // first/last pair (they share the ring-closing vertex)
    val pairs = filter(
      flatten(transform(sequence(lit(1), n), i =>
        transform(sequence(lit(1), n), j => struct(i.as("i"), j.as("j"))))),
      p => p.getField("j") > p.getField("i") + 1 &&
        !(p.getField("i") === 1 && p.getField("j") === n))
    def cross(ox: Column, oy: Column, ax: Column, ay: Column, bx: Column, by: Column): Column =
      (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
    val properCrossing = exists(pairs, p => {
      val e1 = element_at(segs, p.getField("i"))
      val e2 = element_at(segs, p.getField("j"))
      val (ax, ay, bx, by) = (e1.getField("ax"), e1.getField("ay"), e1.getField("bx"), e1.getField("by"))
      val (cx, cy, dx, dy) = (e2.getField("ax"), e2.getField("ay"), e2.getField("bx"), e2.getField("by"))
      val d1 = cross(cx, cy, dx, dy, ax, ay)
      val d2 = cross(cx, cy, dx, dy, bx, by)
      val d3 = cross(ax, ay, bx, by, cx, cy)
      val d4 = cross(ax, ay, bx, by, dx, dy)
      d1 * d2 < 0 && d3 * d4 < 0
    })
    isClosedPts(pts) && distinctVerts && !properCrossing
  }

  /** line_locate_point (GeoFunctions.java lineLocatePoint): fraction of
    * the line's total 2-D length at the closest projection of the point
    * onto the line. Sequential left fold over segments — first nearest
    * segment wins ties, projection parameter clamped to [0, 1].
    */
  def lineLocatePoint(wkt: Column, px: Column, py: Column): Column = {
    val segs = segments(wktPoints(wkt))
    locateFromSegs(segs, lineLength(segs), px, py)
  }

  private def segLen(e: Column): Column = {
    val dx = e.getField("bx") - e.getField("ax")
    val dy = e.getField("by") - e.getField("ay")
    sqrt(dx * dx + dy * dy)
  }

  /** line_interpolate_point (GeoFunctions.java lineInterpolatePoint):
    * the point at `fraction` of the line's total length — the inverse
    * of line_locate_point. Sequential fold: accumulate segment lengths
    * until the target distance falls inside a segment, then linear
    * interpolation along it. fraction 0 -> start point, 1 -> end point.
    * Returns struct<x,y>.
    */
  def lineInterpolatePoint(wkt: Column, fraction: Column): Column = {
    val pts = wktPoints(wkt)
    val segs = segments(pts)
    val target = fraction * lineLength(segs)
    interpolateFromSegs(segs, target)
  }

  /** line_interpolate_point over PRECOMPUTED `segs`/`target` columns.
    * Like locateFromSegs: wide plans must materialize segs/target with
    * withColumn first — a Column-tree call site would otherwise inline
    * the whole parse+fold subtree at every reference (the r7 bench
    * showed ~2s of driver-side Catalyst per run from exactly that;
    * measured 10x plan-time reduction from materializing). `segs` must
    * be non-empty (a LINESTRING has >= 1 segment). */
  def interpolateFromSegs(segs: Column, target: Column): Column = {
    val start = element_at(segs, 1)
    val st0 = struct(lit(0.0d).as("c"),
      start.getField("ax").as("x"), start.getField("ay").as("y"),
      lit(false).as("done"))
    val res = aggregate(segs, st0, (st, e) => {
      val len = segLen(e)
      val landsHere = !st.getField("done") && target <= st.getField("c") + len
      val t = when(len > 0, (target - st.getField("c")) / len).otherwise(lit(0.0d))
      struct(
        (st.getField("c") + len).as("c"),
        when(landsHere,
          e.getField("ax") + t * (e.getField("bx") - e.getField("ax")))
          .otherwise(when(st.getField("done"), st.getField("x"))
            .otherwise(e.getField("bx"))).as("x"),
        when(landsHere,
          e.getField("ay") + t * (e.getField("by") - e.getField("ay")))
          .otherwise(when(st.getField("done"), st.getField("y"))
            .otherwise(e.getField("by"))).as("y"),
        (st.getField("done") || landsHere).as("done"))
    })
    struct(res.getField("x").as("x"), res.getField("y").as("y"))
  }

  /** Total 2-D length of a segment array (sequential left fold). */
  def lineLength(segs: Column): Column =
    aggregate(segs, lit(0.0d), (acc, e) => acc + segLen(e))

  /** line_locate_point over precomputed `segs`/`total` COLUMNS — wide
    * projections should materialize both with withColumn first so the
    * fold's lambda references row attributes (evaluated once per row)
    * instead of re-folding the whole line per element. */
  def locateFromSegs(segs: Column, total: Column, px: Column, py: Column): Column = {
    // state: (bestDist, bestFrac, cumLen)
    val state = aggregate(segs,
      struct(lit(Double.MaxValue).as("d"), lit(0.0d).as("f"), lit(0.0d).as("c")),
      (st, e) => {
        val ax = e.getField("ax"); val ay = e.getField("ay")
        val bx = e.getField("bx"); val by = e.getField("by")
        val len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        val L = sqrt(len2)
        val tRaw = ((px - ax) * (bx - ax) + (py - ay) * (by - ay)) / len2
        val t = when(len2 === 0.0, lit(0.0d)).otherwise(least(greatest(tRaw, lit(0.0d)), lit(1.0d)))
        val qx = ax + t * (bx - ax); val qy = ay + t * (by - ay)
        val d = sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy))
        val frac = (st.getField("c") + t * L) / total
        struct(
          when(d < st.getField("d"), d).otherwise(st.getField("d")).as("d"),
          when(d < st.getField("d"), frac).otherwise(st.getField("f")).as("f"),
          (st.getField("c") + L).as("c"))
      })
    state.getField("f")
  }
}
