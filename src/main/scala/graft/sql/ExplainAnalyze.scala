package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** EXPLAIN ANALYZE analog — the reference's ExplainAnalyzeOperator.java
  * runs the query and annotates the plan with actual runtime stats.
  * Spark-first form: execute the DataFrame, then render the executed
  * (AQE-final) physical plan with each operator's runtime SQLMetrics —
  * output row counts always, plus a curated set of cost metrics when
  * present. No custom operator needed: Spark's metric accumulators
  * already collect exactly what the reference's operator stats carry
  * (ExplainAnalyzeOperator reads QueryInfo stage stats; here the
  * accumulators are the stage stats).
  */
object ExplainAnalyze {

  private val costMetrics =
    Seq("spillSize", "numFiles", "dataSize", "shuffleBytesWritten", "peakMemory")

  /** Execute `df` and return (annotated plan text, root output rows).
    * Root rows = the first operator (pre-order) carrying a
    * numOutputRows metric — the operator that produced the result.
    */
  def analyze(df: DataFrame): (String, Long) = {
    df.collect() // run: metrics are runtime accumulators, filled by the action
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => finalPlan(q.plan)
      case other => other
    }
    val root = finalPlan(df.queryExecution.executedPlan)
    val sb = new StringBuilder
    var rootRows = -1L
    def walk(p: SparkPlan, depth: Int): Unit = {
      val node = finalPlan(p)
      sb.append("  " * depth).append(node.nodeName)
      node.metrics.get("numOutputRows").foreach { m =>
        sb.append(s" [rows: ${m.value}]")
        if (rootRows < 0) rootRows = m.value
      }
      costMetrics.foreach { k =>
        node.metrics.get(k).filter(_.value > 0).foreach(m => sb.append(s" [$k: ${m.value}]"))
      }
      sb.append('\n')
      node.children.foreach(walk(_, depth + 1))
    }
    walk(root, 0)
    (sb.toString, rootRows)
  }
}
