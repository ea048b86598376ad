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

  /** ST_Contains for an axis-aligned envelope (GeoFunctions.java
    * stContains restricted to rectangle⊇point — the envelope fast path
    * every real geometry test runs first). Border-inclusive like the
    * ESRI `contains` on closed rectangles. */
  def stContainsBoxPoint(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      px: Column, py: Column): Column =
    px >= xmin && px <= xmax && py >= ymin && py <= ymax

  /** ST_Intersects for two axis-aligned envelopes (GeoFunctions.java
    * stIntersects envelope pre-check): closed boxes overlap iff they
    * overlap on both axes. */
  def stIntersectsBoxes(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    axmin <= bxmax && bxmin <= axmax && aymin <= bymax && bymin <= aymax

  /** DE-9IM predicate family restricted to axis-aligned envelopes
    * (GeoFunctions.java stWithin/stDisjoint/stTouches/stOverlaps/
    * stEquals — the envelope fast path of each). Boxes are CLOSED;
    * "interior" tests use strict inequalities.
    */
  def stWithinBoxes(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    axmin >= bxmin && axmax <= bxmax && aymin >= bymin && aymax <= bymax

  def stDisjointBoxes(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    !stIntersectsBoxes(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax)

  def stEqualsBoxes(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    axmin === bxmin && axmax === bxmax && aymin === bymin && aymax === bymax

  private def interiorsOverlap(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    axmin < bxmax && bxmin < axmax && aymin < bymax && bymin < aymax

  /** Boundaries meet but interiors do not. */
  def stTouchesBoxes(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    stIntersectsBoxes(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax) &&
      !interiorsOverlap(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax)

  /** Interiors overlap but neither side contains the other. */
  def stOverlapsBoxes(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    interiorsOverlap(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax) &&
      !stWithinBoxes(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax) &&
      !stWithinBoxes(bxmin, bymin, bxmax, bymax, axmin, aymin, axmax, aymax)

  /** ST_Intersection of two envelopes: the clipped box, as a
    * struct<xmin,ymin,xmax,ymax> (null when disjoint). */
  def stIntersectionBoxes(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    when(stIntersectsBoxes(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax),
      struct(greatest(axmin, bxmin).as("xmin"), greatest(aymin, bymin).as("ymin"),
        least(axmax, bxmax).as("xmax"), least(aymax, bymax).as("ymax")))

  /** Envelope of the union of two boxes (what ST_Envelope(ST_Union(..))
    * returns for rectangles). */
  def stUnionEnvelope(axmin: Column, aymin: Column, axmax: Column, aymax: Column,
      bxmin: Column, bymin: Column, bxmax: Column, bymax: Column): Column =
    struct(least(axmin, bxmin).as("xmin"), least(aymin, bymin).as("ymin"),
      greatest(axmax, bxmax).as("xmax"), greatest(aymax, bymax).as("ymax"))

  // A box covers every grid cell its envelope touches: the per-row
  // explode is bounded by ceil(w/cell+1) * ceil(h/cell+1) copies — pick
  // cellSize >= the typical box edge so that stays ~4.
  private def explodeBoxToCells(df: DataFrame, xmin: String, ymin: String,
      xmax: String, ymax: String, cellSize: Double): DataFrame =
    df.withColumn("__cx",
        explode(sequence(floor(col(xmin) / cellSize), floor(col(xmax) / cellSize))))
      .withColumn("__cy",
        explode(sequence(floor(col(ymin) / cellSize), floor(col(ymax) / cellSize))))

  /** ST_Contains(box, point) join — the reference plans this via
    * ExtractSpatialJoins.java + an R-tree probe (SpatialJoinOperator
    * .java:40); distributed form: boxes replicate to each covered grid
    * cell, points hash to exactly one cell, and Catalyst plans an
    * EQUI-join on the cell key + exact refine. Each qualifying pair is
    * emitted exactly once because the point's cell is unique.
    * Output: boxes.* ++ points.* (names must not collide).
    */
  def containsJoin(boxes: DataFrame, xmin: String, ymin: String, xmax: String, ymax: String,
      points: DataFrame, px: String, py: String, cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val cellB = explodeBoxToCells(boxes, xmin, ymin, xmax, ymax, cellSize)
    val cellP = points
      .withColumn("__cx", floor(col(px) / cellSize))
      .withColumn("__cy", floor(col(py) / cellSize))
    cellB.join(cellP, Seq("__cx", "__cy"))
      .filter(stContainsBoxPoint(col(xmin), col(ymin), col(xmax), col(ymax), col(px), col(py)))
      .drop("__cx", "__cy")
  }

  /** Parse a `POLYGON ((x1 y1, x2 y2, ...))` WKT ring to
    * array<struct<x,y>> (GeoFunctions.java stGeometryFromText for the
    * polygon case, minus holes/multi — single ring only). Pure string
    * ops; the closing repeat vertex is kept (edge building consumes it).
    */
  def parsePolygonWkt(wkt: Column): Column =
    transform(
      split(regexp_replace(wkt, "(?i)^\\s*POLYGON\\s*\\(\\(|\\)\\)\\s*$", ""), ","),
      t => struct(
        element_at(split(trim(t), "\\s+"), 1).cast("double").as("x"),
        element_at(split(trim(t), "\\s+"), 2).cast("double").as("y")))

  /** Consecutive-pair edges of a closed ring (first == last vertex):
    * array<struct<a, b>> of the n-1 segments.
    */
  private[graft] def ringEdges(pts: Column): Column =
    transform(sequence(lit(2), size(pts)),
      i => struct(element_at(pts, i - 1).as("a"), element_at(pts, i).as("b")))

  private def edgeCross(e: Column): Column = {
    val a = e.getField("a"); val b = e.getField("b")
    a.getField("x") * b.getField("y") - b.getField("x") * a.getField("y")
  }

  /** Twice the signed shoelace area of a closed ring (CCW positive) —
    * sequential left fold, so the accumulation order is reproducible.
    */
  def stSignedAreaTwice(pts: Column): Column =
    aggregate(ringEdges(pts), lit(0.0d), (acc, e) => acc + edgeCross(e))

  /** ST_Area of a WKT polygon ring (GeoFunctions.java stArea). */
  def stArea(pts: Column): Column = abs(stSignedAreaTwice(pts)) / 2

  /** ST_Length of the ring boundary / perimeter (GeoFunctions.java
    * stLength on the polygon exterior).
    */
  def stLengthRing(pts: Column): Column =
    aggregate(ringEdges(pts), lit(0.0d), (acc, e) => {
      val ax = e.getField("a").getField("x"); val ay = e.getField("a").getField("y")
      val bx = e.getField("b").getField("x"); val by = e.getField("b").getField("y")
      acc + sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay))
    })

  /** ST_Centroid (x or y) of a WKT polygon ring (GeoFunctions.java
    * stCentroid): C = 1/(6A) * sum (v_i + v_{i+1}) * cross_i.
    */
  def stCentroidX(pts: Column): Column =
    aggregate(ringEdges(pts), lit(0.0d), (acc, e) =>
      acc + (e.getField("a").getField("x") + e.getField("b").getField("x")) * edgeCross(e)) /
      (lit(3.0d) * stSignedAreaTwice(pts))

  def stCentroidY(pts: Column): Column =
    aggregate(ringEdges(pts), lit(0.0d), (acc, e) =>
      acc + (e.getField("a").getField("y") + e.getField("b").getField("y")) * edgeCross(e)) /
      (lit(3.0d) * stSignedAreaTwice(pts))

  /** Ray-casting point-in-polygon (the classic even-odd rule — PNPOLY,
    * Franklin; GeoFunctions.java stContains delegates the same test to
    * ESRI after the envelope pre-check). `pts` is a closed ring
    * (first == last): edges are consecutive pairs. Boundary points are
    * NOT contained, matching ST_Contains (OGC: the point's interior
    * must meet the polygon's interior). Works for any simple polygon,
    * convex or not.
    *
    * Evaluated by the native codegen'd [[graft.functions.PointInRings]]
    * kernel (the HOF formulation it replaces materialized an edge-struct
    * array per candidate, interpreted — see that file's scaladoc).
    */
  def pointInPolygon(pts: Column, px: Column, py: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PointInRings(
        org.apache.spark.sql.graft.ColumnBridge.expression(pts),
        org.apache.spark.sql.graft.ColumnBridge.expression(px.cast("double")),
        org.apache.spark.sql.graft.ColumnBridge.expression(py.cast("double"))))

  /** Parse a multi-ring `POLYGON ((outer), (hole1), ...)` WKT to
    * array<array<struct<x,y>>> — one vertex array per ring, closing
    * repeat vertices kept (GeoFunctions.java stGeometryFromText polygon
    * case WITH interior rings). */
  def parsePolygonRingsWkt(wkt: Column): Column =
    transform(
      split(regexp_replace(wkt, "(?i)^\\s*POLYGON\\s*\\(\\s*\\(|\\)\\s*\\)\\s*$", ""),
        "\\)\\s*,\\s*\\("),
      ring => transform(split(ring, ","), t => struct(
        element_at(split(trim(t), "\\s+"), 1).cast("double").as("x"),
        element_at(split(trim(t), "\\s+"), 2).cast("double").as("y"))))

  /** Parse `MULTIPOLYGON (((...)), ((...), (hole)))` to a flat
    * array<array<struct<x,y>>> of ALL rings across components: the
    * even-odd parity sum is component-agnostic, so for disjoint
    * components (+ holes) the flat ring list is exactly what
    * pointInPolygonRings needs — no per-component bookkeeping. */
  def parseMultiPolygonRingsWkt(wkt: Column): Column = {
    val body = regexp_replace(wkt,
      "(?i)^\\s*MULTIPOLYGON\\s*\\(\\s*\\(\\s*\\(|\\)\\s*\\)\\s*\\)\\s*$", "")
    // component separator `)), ((` -> plain ring separator `), (`
    val normalized = regexp_replace(body, "\\)\\s*\\)\\s*,\\s*\\(\\s*\\(", "), (")
    transform(split(normalized, "\\)\\s*,\\s*\\("),
      ring => transform(split(ring, ","), t => struct(
        element_at(split(trim(t), "\\s+"), 1).cast("double").as("x"),
        element_at(split(trim(t), "\\s+"), 2).cast("double").as("y"))))
  }

  /** Even-odd point-in-polygon over MULTIPLE rings: holes fall out of
    * the parity sum (a point inside the outer ring and inside a hole
    * crosses both boundaries -> even -> outside), which is exactly how
    * the even-odd rule defines polygon-with-holes interiors. Boundary
    * points are not contained (as in pointInPolygon). Same native
    * codegen'd kernel ([[graft.functions.PointInRings]]). */
  def pointInPolygonRings(rings: Column, px: Column, py: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PointInRings(
        org.apache.spark.sql.graft.ColumnBridge.expression(rings),
        org.apache.spark.sql.graft.ColumnBridge.expression(px.cast("double")),
        org.apache.spark.sql.graft.ColumnBridge.expression(py.cast("double"))))

  /** ST_Contains(polygon-with-holes / multipolygon, point) join.
    *
    * Cells come from PER-RING envelopes, not the whole geometry's: a
    * MULTIPOLYGON's global envelope spans the empty gap between
    * disjoint components, and grid-replicating it makes every point in
    * that gap a candidate (measured 17 s at sf0.1 on the two-component
    * fixture before this change — the gap is ~100 units wide vs ring
    * radii of ~4). Per-ring cell sets are unioned with array_distinct
    * (a hole's envelope sits inside its outer's, so its cells are
    * duplicates), keeping each (polygon, cell) pair unique — candidate
    * pairs stay unique and output needs no dedup shuffle. The
    * even-odd refine runs over ALL rings, so containment is evaluated
    * against the full geometry no matter which ring's cell produced
    * the candidate. Cell generation is codegen'd HOF arithmetic; the
    * interpreted parity cast sees only cell-local candidates.
    */
  def containsPolygonRingsJoin(polys: DataFrame, wktCol: String,
      points: DataFrame, px: String, py: String, cellSize: Double,
      multi: Boolean = false): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val parsed = if (multi) parseMultiPolygonRingsWkt(col(wktCol))
      else parsePolygonRingsWkt(col(wktCol))
    val cells = array_distinct(flatten(transform(parsed, ring => {
      val xs = transform(ring, p => p.getField("x"))
      val ys = transform(ring, p => p.getField("y"))
      flatten(transform(
        sequence(floor(array_min(xs) / cellSize).cast("long"),
          floor(array_max(xs) / cellSize).cast("long")),
        cx => transform(
          sequence(floor(array_min(ys) / cellSize).cast("long"),
            floor(array_max(ys) / cellSize).cast("long")),
          cy => struct(cx.as("cx"), cy.as("cy")))))
    })))
    // Per-ring bboxes, computed ONCE per polygon row and carried through
    // the explode: the O(rings) bbox disjunction below kills cell-corner
    // candidates before the O(vertices) parity cast sees them (dropping
    // this pre-check doubled the holes-join wall).
    val ringBoxes = transform(parsed, ring => {
      val xs = transform(ring, p => p.getField("x"))
      val ys = transform(ring, p => p.getField("y"))
      struct(array_min(xs).as("xmin"), array_min(ys).as("ymin"),
        array_max(xs).as("xmax"), array_max(ys).as("ymax"))
    })
    val cellPoly = polys
      .withColumn("__rings", parsed)
      .withColumn("__bb", ringBoxes)
      .withColumn("__cell", explode(cells))
      .withColumn("__cx", col("__cell").getField("cx"))
      .withColumn("__cy", col("__cell").getField("cy"))
      .drop("__cell")
    val cellP = points
      .withColumn("__cx", floor(col(px) / cellSize).cast("long"))
      .withColumn("__cy", floor(col(py) / cellSize).cast("long"))
    val bbHit = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.AnyBoxContainsPoint(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__bb")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col(px).cast("double")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col(py).cast("double"))))
    cellPoly.join(cellP, Seq("__cx", "__cy"))
      .filter(bbHit)
      .filter(pointInPolygonRings(col("__rings"), col(px), col(py)))
      .drop("__cx", "__cy", "__rings", "__bb")
  }

  /** ST_Contains(polygon, point) join over WKT polygons: envelope from
    * the parsed ring, polygons replicate to envelope-covered grid cells,
    * points hash to exactly one cell (duplicate-free like containsJoin),
    * and the ray-casting refine runs only on cell-local candidates —
    * never all pairs. The refine is an interpreted higher-order filter
    * (O(vertices) per candidate), which is fine off the scan hot path;
    * the grid join itself stays a codegen'd equi-join.
    * Output: polys.* ++ `__pts` dropped ++ points.*.
    */
  def containsPolygonJoin(polys: DataFrame, wktCol: String,
      points: DataFrame, px: String, py: String, cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val withEnv = polys
      .withColumn("__pts", parsePolygonWkt(col(wktCol)))
      .withColumn("__xmin", array_min(transform(col("__pts"), p => p.getField("x"))))
      .withColumn("__ymin", array_min(transform(col("__pts"), p => p.getField("y"))))
      .withColumn("__xmax", array_max(transform(col("__pts"), p => p.getField("x"))))
      .withColumn("__ymax", array_max(transform(col("__pts"), p => p.getField("y"))))
    val cellPoly = explodeBoxToCells(withEnv, "__xmin", "__ymin", "__xmax", "__ymax", cellSize)
    val cellP = points
      .withColumn("__cx", floor(col(px) / cellSize))
      .withColumn("__cy", floor(col(py) / cellSize))
    // Envelope pre-check BEFORE the ray cast — the same two-stage refine
    // the reference runs (GeoFunctions.java stContains tests the
    // envelope first): the box test is codegen'd and kills most
    // candidates; the interpreted O(vertices) ray cast only sees
    // envelope survivors.
    cellPoly.join(cellP, Seq("__cx", "__cy"))
      .filter(stContainsBoxPoint(col("__xmin"), col("__ymin"), col("__xmax"), col("__ymax"),
        col(px), col(py)))
      .filter(pointInPolygon(col("__pts"), col(px), col(py)))
      .drop("__cx", "__cy", "__pts", "__xmin", "__ymin", "__xmax", "__ymax")
  }

  /** ST_Intersects(boxA, boxB) join. Both sides replicate to covered
    * cells; a pair meeting in k shared cells must still be emitted once,
    * so the refine keeps only the REPORT CELL — the cell containing the
    * intersection's lower-left corner (greatest(xmin), greatest(ymin)),
    * which exists iff the boxes overlap and is covered by both sides.
    * This is the standard duplicate-free grid join: no distinct(), no
    * second shuffle. Output: a.* ++ b.* (names must not collide).
    */
  def intersectsJoin(a: DataFrame, axmin: String, aymin: String, axmax: String, aymax: String,
      b: DataFrame, bxmin: String, bymin: String, bxmax: String, bymax: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val cellA = explodeBoxToCells(a, axmin, aymin, axmax, aymax, cellSize)
    val cellB = explodeBoxToCells(b, bxmin, bymin, bxmax, bymax, cellSize)
    cellA.join(cellB, Seq("__cx", "__cy"))
      .filter(stIntersectsBoxes(
        col(axmin), col(aymin), col(axmax), col(aymax),
        col(bxmin), col(bymin), col(bxmax), col(bymax)))
      .filter(col("__cx") === floor(greatest(col(axmin), col(bxmin)) / cellSize) &&
              col("__cy") === floor(greatest(col(aymin), col(bymin)) / cellSize))
      .drop("__cx", "__cy")
  }
}
