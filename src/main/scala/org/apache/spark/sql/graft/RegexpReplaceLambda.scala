// Lives under org.apache.spark.sql because HigherOrderFunction's
// signature uses the private[sql] AbstractDataType — the same placement
// every Spark extension library uses for native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** regexp_replace(string, pattern, lambda) — replaces every match of
  * `pattern` with the lambda's result; the lambda receives the ARRAY of
  * capturing groups (1-based groups, like the reference). A lambda
  * returning NULL nulls the whole result, matching the reference.
  *
  * Reference: presto-main/.../operator/scalar/JoniRegexpReplaceLambdaFunction.java:39.
  *
  * A real Catalyst `HigherOrderFunction`, so SQL lambdas
  * (`x -> upper(element_at(x, 1))`) bind through the analyzer exactly as
  * they do for transform/filter. Interpreted eval (CodegenFallback) —
  * per-match lambda dispatch is inherently row-at-a-time; the reference's
  * implementation is too.
  */
case class RegexpReplaceLambda(
    source: Expression,
    pattern: Expression,
    function: Expression)
  extends Expression with HigherOrderFunction with CodegenFallback {

  override def arguments: Seq[Expression] = Seq(source, pattern)
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(source, pattern, function)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_replace"

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function = f(function, Seq((ArrayType(StringType, containsNull = true), false))))

  @transient private lazy val groupsVar: NamedLambdaVariable =
    function.asInstanceOf[LambdaFunction].arguments.head.asInstanceOf[NamedLambdaVariable]

  @transient private lazy val replaceFn: Expression = functionsForEval.head

  // pattern is almost always a literal: compile once.
  @transient private lazy val staticPattern: Option[java.util.regex.Pattern] = pattern match {
    case Literal(p: UTF8String, StringType) if p != null =>
      Some(java.util.regex.Pattern.compile(p.toString))
    case _ => None
  }

  override def eval(input: InternalRow): Any = {
    val src = source.eval(input).asInstanceOf[UTF8String]
    if (src == null) return null
    val rx = staticPattern.getOrElse {
      val p = pattern.eval(input).asInstanceOf[UTF8String]
      if (p == null) return null
      java.util.regex.Pattern.compile(p.toString)
    }
    val str = src.toString
    val m = rx.matcher(str)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(str, last, m.start())
      val groups = new Array[Any](m.groupCount())
      var g = 0
      while (g < m.groupCount()) {
        val gv = m.group(g + 1)
        groups(g) = if (gv == null) null else UTF8String.fromString(gv)
        g += 1
      }
      groupsVar.value.set(new GenericArrayData(groups))
      val rep = replaceFn.eval(input)
      if (rep == null) return null
      sb.append(rep.asInstanceOf[UTF8String].toString)
      last = m.end()
    }
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegexpReplaceLambda =
    copy(source = newChildren(0), pattern = newChildren(1), function = newChildren(2))
}
