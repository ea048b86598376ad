package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructType}

/** Native even-odd ray-casting point-in-polygon test — the per-candidate
  * kernel of every polygon-contains spatial join.
  *
  * Reference: GeoFunctions.java stContains runs an envelope pre-check and
  * then delegates the exact test to ESRI's relate machinery; the grid
  * join (SpatialJoinOps) re-expresses the R-tree probe as a cell
  * equi-join, and THIS expression is the exact refine that runs on each
  * cell-local candidate pair.
  *
  * It replaces the higher-order-function formulation
  * (`aggregate(rings, .. size(filter(ringEdges(..))))`): Spark HOFs are
  * CodegenFallback — per candidate they materialized an array of edge
  * structs and walked it interpreted, ~8-30 us/pair measured at sf1
  * (~400 CPU-s across the three polygon joins). This expression loops the
  * vertex ArrayData directly inside whole-stage codegen — no allocation,
  * no boxing. The crossing arithmetic is byte-identical to the HOF form
  * (same comparison and same `(bx-ax)*(py-ay)/(by-ay)+ax` intercept, in
  * the same order), so results — including the boundary-not-contained
  * convention — are unchanged.
  *
  * `rings` is either array<array<struct<x,y>>> (polygon with holes /
  * multipolygon: the parity sum over ALL rings makes holes and disjoint
  * components fall out, see SpatialJoinOps.pointInPolygonRings) or a
  * single array<struct<x,y>> closed ring. Rings keep their closing repeat
  * vertex; edges are consecutive pairs.
  */
case class PointInRings(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_rings"

  private def isRing(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) if s.length == 2 =>
      s.fields.forall(_.dataType == DoubleType)
    case _ => false
  }

  /** True when `first` is a flat list of rings, false when it is one ring. */
  private lazy val nested: Boolean = first.dataType match {
    case ArrayType(inner, _) => isRing(inner)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ringsOk = nested || isRing(first.dataType)
    if (ringsOk && second.dataType == DoubleType && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"point_in_rings expects (array<array<struct<x,y>>> | array<struct<x,y>>, double, double), " +
        s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  private def ringCrossings(pts: ArrayData, px: Double, py: Double): Int = {
    val n = pts.numElements()
    var c = 0
    var i = 1
    while (i < n) {
      val a = pts.getStruct(i - 1, 2)
      val b = pts.getStruct(i, 2)
      val ax = a.getDouble(0); val ay = a.getDouble(1)
      val bx = b.getDouble(0); val by = b.getDouble(1)
      if (((ay > py) != (by > py)) && (px < (bx - ax) * (py - ay) / (by - ay) + ax)) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(r: Any, x: Any, y: Any): Any = {
    val px = x.asInstanceOf[Double]
    val py = y.asInstanceOf[Double]
    var total = 0
    if (nested) {
      val rings = r.asInstanceOf[ArrayData]
      var k = 0
      val m = rings.numElements()
      while (k < m) {
        total += ringCrossings(rings.getArray(k), px, py)
        k += 1
      }
    } else {
      total = ringCrossings(r.asInstanceOf[ArrayData], px, py)
    }
    total % 2 == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (r, x, y) => {
      val total = ctx.freshName("crossings")
      val ring = ctx.freshName("ring")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val ax = ctx.freshName("ax"); val ay = ctx.freshName("ay")
      val bx = ctx.freshName("bx"); val by = ctx.freshName("by")
      val edgeLoop = (src: String) =>
        s"""
           |int $n = $src.numElements();
           |for (int $i = 1; $i < $n; $i++) {
           |  InternalRow $a = $src.getStruct($i - 1, 2);
           |  InternalRow $b = $src.getStruct($i, 2);
           |  double $ax = $a.getDouble(0); double $ay = $a.getDouble(1);
           |  double $bx = $b.getDouble(0); double $by = $b.getDouble(1);
           |  if ((($ay > $y) != ($by > $y)) && ($x < ($bx - $ax) * ($y - $ay) / ($by - $ay) + $ax)) {
           |    $total++;
           |  }
           |}
         """.stripMargin
      if (nested) {
        val k = ctx.freshName("k")
        val m = ctx.freshName("m")
        s"""
           |int $total = 0;
           |int $m = $r.numElements();
           |for (int $k = 0; $k < $m; $k++) {
           |  ArrayData $ring = $r.getArray($k);
           |  ${edgeLoop(ring)}
           |}
           |${ev.value} = ($total % 2) == 1;
         """.stripMargin
      } else {
        s"""
           |int $total = 0;
           |${edgeLoop(r)}
           |${ev.value} = ($total % 2) == 1;
         """.stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PointInRings =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native "point falls in ANY of these envelopes" — the codegen'd form of
  * the per-ring bbox disjunction (`exists(__bb, ..)`) that kills
  * cell-corner candidates before the parity cast. Boxes are closed
  * (border-inclusive), matching stContainsBoxPoint. Early-exits on the
  * first hit. `first` is array<struct<xmin,ymin,xmax,ymax>>.
  */
case class AnyBoxContainsPoint(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "any_box_contains_point"

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 4 && s.fields.forall(_.dataType == DoubleType)
          && second.dataType == DoubleType && third.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"any_box_contains_point expects (array<struct<xmin,ymin,xmax,ymax>>, double, double), " +
        s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override def nullSafeEval(bs: Any, x: Any, y: Any): Any = {
    val boxes = bs.asInstanceOf[ArrayData]
    val px = x.asInstanceOf[Double]
    val py = y.asInstanceOf[Double]
    var i = 0
    val n = boxes.numElements()
    while (i < n) {
      val b = boxes.getStruct(i, 4)
      if (px >= b.getDouble(0) && px <= b.getDouble(2) &&
          py >= b.getDouble(1) && py <= b.getDouble(3)) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (bs, x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      s"""
         |${ev.value} = false;
         |int $n = $bs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  InternalRow $b = $bs.getStruct($i, 4);
         |  if ($x >= $b.getDouble(0) && $x <= $b.getDouble(2) &&
         |      $y >= $b.getDouble(1) && $y <= $b.getDouble(3)) {
         |    ${ev.value} = true;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AnyBoxContainsPoint =
    copy(first = newFirst, second = newSecond, third = newThird)
}
