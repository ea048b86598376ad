package graft.functions

/** General (non-convex × non-convex) polygon intersection — the
  * remaining piece of the reference's ST_Intersection surface
  * (presto-geospatial/.../GeoFunctions.java stIntersection delegates to
  * the ESRI core for arbitrary simple polygons; GeometryConstructors'
  * Sutherland–Hodgman path is exact but requires a convex clip).
  *
  * Algorithm: Greiner & Hormann 1998 ("Efficient clipping of arbitrary
  * polygons", ACM TOG 17(2)) — the published doubly-linked-list
  * clipping algorithm:
  *   1. intersect every subject edge with every clip edge; splice the
  *      intersection points into both rings, neighbour-linked;
  *   2. mark each intersection entry/exit by point-in-polygon parity of
  *      the traversal start;
  *   3. trace result rings: walk forward from entries / backward from
  *      exits, switching rings at each intersection.
  * No intersections -> containment test decides (subject, clip, or
  * EMPTY). Output: POLYGON, MULTIPOLYGON (a non-convex pair can
  * intersect in several parts), or POLYGON EMPTY.
  *
  * Degeneracy policy: inputs in general position. An intersection
  * landing exactly on a vertex, or collinear overlapping edges, RAISES —
  * callers catch and hand the input to [[ExactOverlay]] (exact rational
  * planar-arrangement overlay), which resolves every degenerate
  * configuration without perturbation. This split keeps the hot path in
  * doubles and the exact path on the measure-zero degenerate inputs
  * (the reference's ESRI core reaches the same end with robust
  * arithmetic inside one code path).
  *
  * Scale: per-row scalar over WKT, O(nm) edge pairs — map-side,
  * shuffle-free, row-parallel like the rest of the geometry surface.
  */
object PolygonClip {

  type Pt = (Double, Double)

  /** Dispatch by boolean-op tag ([[ExactOverlay.BoolOp]]) — the shared
    * vocabulary between the fast path here and the exact fallback. */
  def run(op: ExactOverlay.BoolOp, a: Array[Pt], b: Array[Pt]): Seq[Array[Pt]] = op match {
    case ExactOverlay.OpIntersect => intersect(a, b)
    case ExactOverlay.OpUnion => union(a, b)
    case ExactOverlay.OpDifference => difference(a, b)
  }
  private val Eps = 1e-12

  private final class Vert(
      val x: Double, val y: Double,
      var next: Vert = null, var prev: Vert = null,
      val isInter: Boolean = false,
      var entry: Boolean = false,
      var neighbour: Vert = null,
      val alpha: Double = 0.0,
      var processed: Boolean = false)

  private def ringToList(pts: Array[Pt]): Vert = {
    val verts = pts.map(p => new Vert(p._1, p._2))
    verts.indices.foreach { i =>
      verts(i).next = verts((i + 1) % verts.length)
      verts(i).prev = verts((i + verts.length - 1) % verts.length)
    }
    verts(0)
  }

  private[functions] def insideRing(p: Pt, ring: Array[Pt]): Boolean = {
    // even-odd ray cast (PNPOLY, Franklin)
    var in = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > p._2) != (yj > p._2) &&
        p._1 < (xj - xi) * (p._2 - yi) / (yj - yi) + xi) in = !in
      j = i; i += 1
    }
    in
  }

  /** Intersection parameters (t on a->b, u on c->d), or None if
    * parallel/disjoint. Raises on a degenerate (endpoint) touch. */
  private def segInter(a: Pt, b: Pt, c: Pt, d: Pt): Option[(Double, Double)] = {
    val den = (b._1 - a._1) * (d._2 - c._2) - (b._2 - a._2) * (d._1 - c._1)
    if (math.abs(den) < Eps) return None // parallel (collinear overlap checked by caller's fixture scope)
    val t = ((c._1 - a._1) * (d._2 - c._2) - (c._2 - a._2) * (d._1 - c._1)) / den
    val u = ((c._1 - a._1) * (b._2 - a._2) - (c._2 - a._2) * (b._1 - a._1)) / den
    if (t < -Eps || t > 1 + Eps || u < -Eps || u > 1 + Eps) None
    else if (t < Eps || t > 1 - Eps || u < Eps || u > 1 - Eps)
      throw new IllegalArgumentException(
        "degenerate intersection (vertex on edge / touching boundaries) not supported")
    else Some((t, u))
  }

  /** Intersection of two simple rings (no holes), general position.
    * Returns the result parts as rings (possibly empty / several). */
  /** A ∩ B. No-intersection policy: contained polygon, or EMPTY. */
  def intersect(subject0: Array[Pt], clip0: Array[Pt]): Seq[Array[Pt]] =
    clipCore(subject0, clip0, invSubject = false, invClip = false).getOrElse {
      if (insideRing(subject0(0), clip0)) Seq(subject0)
      else if (insideRing(clip0(0), subject0)) Seq(clip0)
      else Seq.empty
    }

  /** A ∪ B — same machinery with BOTH entry mark sets inverted (the
    * published Greiner–Hormann boolean-op table): the forward walks then
    * collect the arcs OUTSIDE the other polygon. Output rings may nest
    * (two C-shapes can enclose a hole) — the caller classifies
    * shells/holes by containment. No intersections: containment keeps
    * the outer polygon, disjoint keeps both. */
  def union(subject0: Array[Pt], clip0: Array[Pt]): Seq[Array[Pt]] =
    clipCore(subject0, clip0, invSubject = true, invClip = true).getOrElse {
      if (insideRing(subject0(0), clip0)) Seq(clip0)
      else if (insideRing(clip0(0), subject0)) Seq(subject0)
      else Seq(subject0, clip0)
    }

  /** A \ B — subject marks inverted only: forward walks collect
    * subject-outside-B arcs and clip-inside-A arcs (traversed reverse).
    * No intersections: B interior to A yields (A, B) — B classifies as
    * A's hole by containment; A inside B yields EMPTY; disjoint yields
    * A. */
  def difference(subject0: Array[Pt], clip0: Array[Pt]): Seq[Array[Pt]] =
    clipCore(subject0, clip0, invSubject = true, invClip = false).getOrElse {
      if (insideRing(clip0(0), subject0)) Seq(subject0, clip0)
      else if (insideRing(subject0(0), clip0)) Seq.empty
      else Seq(subject0)
    }

  /** Greiner–Hormann core; None when the boundaries do not intersect
    * (caller applies the per-operation containment policy). */
  private def clipCore(subject0: Array[Pt], clip0: Array[Pt],
      invSubject: Boolean, invClip: Boolean): Option[Seq[Array[Pt]]] = {
    require(subject0.length >= 3 && clip0.length >= 3, "polygon needs >= 3 vertices")
    val subject = subject0
    val clip = clip0

    // phase 1: find and splice intersections
    val sHead = ringToList(subject)
    val cHead = ringToList(clip)
    // original edge vertices (stable iteration while we splice)
    val sOrig = Iterator.iterate(sHead)(_.next).take(subject.length).toArray
    val cOrig = Iterator.iterate(cHead)(_.next).take(clip.length).toArray
    // per original edge: inserted intersection verts sorted by alpha
    val sIns = Array.fill(subject.length)(scala.collection.mutable.ArrayBuffer.empty[Vert])
    val cIns = Array.fill(clip.length)(scala.collection.mutable.ArrayBuffer.empty[Vert])
    var nInter = 0
    for (i <- subject.indices; j <- clip.indices) {
      val a = subject(i); val b = subject((i + 1) % subject.length)
      val c = clip(j); val d = clip((j + 1) % clip.length)
      segInter(a, b, c, d).foreach { case (t, u) =>
        val x = a._1 + t * (b._1 - a._1)
        val y = a._2 + t * (b._2 - a._2)
        val sv = new Vert(x, y, isInter = true, alpha = t)
        val cv = new Vert(x, y, isInter = true, alpha = u)
        sv.neighbour = cv; cv.neighbour = sv
        sIns(i) += sv; cIns(j) += cv
        nInter += 1
      }
    }
    if (nInter == 0) return None // containment/disjoint policy is per-op
    // splice AFTER collecting (orig .next pointers change as we insert,
    // so insert each edge's batch in one pass against the saved stop)
    def spliceAll(): Unit = {
      val sStops = sOrig.map(_.next)
      sOrig.indices.foreach { i =>
        var prev = sOrig(i)
        sIns(i).sortBy(_.alpha).foreach { v =>
          v.prev = prev; v.next = sStops(i)
          prev.next = v; sStops(i).prev = v
          prev = v
        }
      }
      val cStops = cOrig.map(_.next)
      cOrig.indices.foreach { i =>
        var prev = cOrig(i)
        cIns(i).sortBy(_.alpha).foreach { v =>
          v.prev = prev; v.next = cStops(i)
          prev.next = v; cStops(i).prev = v
          prev = v
        }
      }
    }
    spliceAll()

    // phase 2: entry/exit marking by parity (inverted per the GH
    // boolean-op table when the caller asks for union/difference arcs)
    def markEntries(head: Vert, n: Int, other: Array[Pt], inv: Boolean): Unit = {
      var entry = !insideRing((head.x, head.y), other) ^ inv
      var v = head
      var count = 0
      val total = n + nInter
      while (count < total) {
        if (v.isInter) { v.entry = entry; entry = !entry }
        v = v.next; count += 1
      }
    }
    markEntries(sHead, subject.length, clip, invSubject)
    markEntries(cHead, clip.length, subject, invClip)

    // phase 3: trace
    val results = scala.collection.mutable.ArrayBuffer.empty[Array[Pt]]
    def unprocessed(): Option[Vert] = {
      var v = sHead
      val total = subject.length + nInter
      var count = 0
      while (count < total) {
        if (v.isInter && !v.processed) return Some(v)
        v = v.next; count += 1
      }
      None
    }
    var guard = 0
    var startOpt = unprocessed()
    while (startOpt.isDefined && guard < 10000) {
      val start = startOpt.get
      val ring = scala.collection.mutable.ArrayBuffer.empty[Pt]
      var cur = start
      do {
        cur.processed = true
        cur.neighbour.processed = true
        if (cur.entry) {
          // walk forward to the next intersection
          do { ring += ((cur.x, cur.y)); cur = cur.next; guard += 1 }
          while (!cur.isInter && guard < 100000)
        } else {
          do { ring += ((cur.x, cur.y)); cur = cur.prev; guard += 1 }
          while (!cur.isInter && guard < 100000)
        }
        cur = cur.neighbour // switch rings
        guard += 1
      } while ((cur.x != start.x || cur.y != start.y) && guard < 100000)
      if (ring.length >= 3) results += ring.toArray
      startOpt = unprocessed()
      guard += 1
    }
    require(guard < 100000, "polygon clipping failed to converge (degenerate input?)")
    Some(results.toSeq)
  }

  // ---- non-convex buffer: offset curve + outer-face walk ----

  /** Outward buffer of an arbitrary SIMPLE polygon (no holes) by d > 0.
    *
    * Published construction (the straight-skeleton-free offset used by
    * clipper-style libraries): emit each edge translated along its
    * outward normal, join consecutive edges with sampled arcs at CONVEX
    * vertices and a direct chord at REFLEX vertices (where the offset
    * locally self-intersects), then resolve the self-intersecting closed
    * curve by walking its OUTER face. A buffer of a simply-connected
    * region is simply connected, so the outer boundary IS the buffer
    * boundary — no hole bookkeeping exists by construction.
    *
    * The face walk is the standard planar-subdivision rule: split every
    * segment at every proper intersection, start at the lowest node
    * (guaranteed outer), and at each node take the first edge
    * COUNTERclockwise from the reversed incoming direction — that traces
    * the face with the interior on the left, i.e. the outer ring CCW.
    */
  def bufferPolygon(pts0: Array[Pt], d: Double, circleSegments: Int = 32): Array[Pt] = {
    require(pts0.length >= 3, "polygon needs >= 3 vertices")
    require(d > 0, "buffer distance must be positive")
    // normalize CCW
    var area2 = 0.0
    pts0.indices.foreach { i =>
      val a = pts0(i); val b = pts0((i + 1) % pts0.length)
      area2 += a._1 * b._2 - b._1 * a._2
    }
    val pts = if (area2 < 0) pts0.reverse else pts0
    val n = pts.length

    // offset curve: edge strips + arcs (convex) / chords (reflex)
    val curve = scala.collection.mutable.ArrayBuffer.empty[Pt]
    var i = 0
    while (i < n) {
      val a = pts(i); val b = pts((i + 1) % n); val c = pts((i + 2) % n)
      val (ex, ey) = (b._1 - a._1, b._2 - a._2)
      val len = math.hypot(ex, ey)
      val (nx, ny) = (ey / len, -ex / len) // outward normal of a CCW ring
      curve += ((a._1 + d * nx, a._2 + d * ny))
      curve += ((b._1 + d * nx, b._2 + d * ny))
      val (fx, fy) = (c._1 - b._1, c._2 - b._2)
      val flen = math.hypot(fx, fy)
      val (mx, my) = (fy / flen, -fx / flen)
      val cross = ex * fy - ey * fx
      if (cross > 0) {
        // convex vertex: arc from normal (nx,ny) to (mx,my), CCW
        val a0 = math.atan2(ny, nx)
        var a1 = math.atan2(my, mx)
        if (a1 < a0) a1 += 2 * math.Pi
        val sweep = a1 - a0
        val steps = math.max(1, math.ceil(sweep / (2 * math.Pi / circleSegments)).toInt)
        var k = 1
        while (k < steps) {
          val th = a0 + sweep * k / steps
          curve += ((b._1 + d * math.cos(th), b._2 + d * math.sin(th)))
          k += 1
        }
      }
      // reflex vertex: fall through — the chord to the next edge's start
      // creates the local loop the outer walk removes
      i += 1
    }

    outerFace(curve.toArray)
  }

  /** Outer boundary of a closed, possibly self-intersecting curve. */
  private[functions] def outerFace(curve: Array[Pt]): Array[Pt] = {
    val m = curve.length
    // split all segments at proper pairwise intersections
    val splits = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[(Double, Pt)])
    var i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val adjacent = (j == i + 1) || (i == 0 && j == m - 1)
        if (!adjacent) {
          val a = curve(i); val b = curve((i + 1) % m)
          val c = curve(j); val d = curve((j + 1) % m)
          val den = (b._1 - a._1) * (d._2 - c._2) - (b._2 - a._2) * (d._1 - c._1)
          if (math.abs(den) > Eps) {
            val t = ((c._1 - a._1) * (d._2 - c._2) - (c._2 - a._2) * (d._1 - c._1)) / den
            val u = ((c._1 - a._1) * (b._2 - a._2) - (c._2 - a._2) * (b._1 - a._1)) / den
            if (t > Eps && t < 1 - Eps && u > Eps && u < 1 - Eps) {
              val p = (a._1 + t * (b._1 - a._1), a._2 + t * (b._2 - a._2))
              splits(i) += ((t, p)); splits(j) += ((u, p))
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // build the undirected node graph (coordinates quantized for identity)
    def key(p: Pt): (Long, Long) =
      (math.round(p._1 * 1e9), math.round(p._2 * 1e9))
    val coord = scala.collection.mutable.Map.empty[(Long, Long), Pt]
    val adj = scala.collection.mutable.Map.empty[(Long, Long), scala.collection.mutable.Set[(Long, Long)]]
    def addEdge(p: Pt, q: Pt): Unit = {
      val (kp, kq) = (key(p), key(q))
      if (kp != kq) {
        coord.getOrElseUpdate(kp, p); coord.getOrElseUpdate(kq, q)
        adj.getOrElseUpdate(kp, scala.collection.mutable.Set.empty) += kq
        adj.getOrElseUpdate(kq, scala.collection.mutable.Set.empty) += kp
      }
    }
    i = 0
    while (i < m) {
      val a = curve(i); val b = curve((i + 1) % m)
      val pointsOn = ((0.0, a) +: splits(i).sortBy(_._1).toSeq :+ ((1.0, b))).map(_._2)
      pointsOn.sliding(2).foreach { w => addEdge(w(0), w(1)) }
      i += 1
    }
    // outer walk: from the lowest node, first-clockwise-from-reverse rule
    val start = adj.keys.minBy(k => (coord(k)._2, coord(k)._1))
    def angle(from: (Long, Long), to: (Long, Long)): Double = {
      val p = coord(from); val q = coord(to)
      math.atan2(q._2 - p._2, q._1 - p._1)
    }
    // first hop: lowest node, leave along the smallest polar angle
    var prev = start
    var cur = adj(start).minBy(nb => angle(start, nb))
    val ring = scala.collection.mutable.ArrayBuffer[Pt](coord(start))
    var guard = 0
    while (cur != start && guard < 100000) {
      ring += coord(cur)
      val rev = angle(cur, prev)
      val nxt = adj(cur).filter(_ != prev) match {
        case s if s.nonEmpty =>
          s.minBy { nb =>
            val delta = angle(cur, nb) - rev // first edge CCW from reverse
            val dm = delta % (2 * math.Pi)
            val pos = if (dm <= 0) dm + 2 * math.Pi else dm
            pos
          }
        case _ => prev
      }
      prev = cur; cur = nxt
      guard += 1
    }
    require(guard < 100000, "outer-face walk failed to converge (degenerate offset curve?)")
    ring.toArray
  }
}
