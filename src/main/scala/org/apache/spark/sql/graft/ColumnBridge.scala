// Lives under org.apache.spark.sql because ExpressionUtils is
// private[sql] — the standard placement for extension libraries that
// need to round-trip between Column and catalyst Expression.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionUtils, UserDefinedFunctionUtils}
import org.apache.spark.sql.expressions.{SparkUserDefinedFunction, UserDefinedFunction}

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a `functions.udf(...)` handle to catalyst children, yielding the
    * codegen-able ScalaUDF expression (the Column-level apply wraps the call
    * in a lazily-resolved node that FunctionBuilder lambdas can't return). */
  def applyUdf(u: UserDefinedFunction, args: Seq[Expression]): Expression =
    UserDefinedFunctionUtils.toScalaUDF(u.asInstanceOf[SparkUserDefinedFunction], args.toSeq)
}
