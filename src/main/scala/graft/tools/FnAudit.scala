package graft.tools

import graft.engine.Engine

/** Audit: which function names from a newline-delimited list resolve in
  * the session registry (built-in or graft-installed). Prints missing.
  */
object FnAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    Engine.registerTables(spark, "/root/testdata/sf0.001")
    val names = scala.io.Source.fromFile(args(0)).getLines().map(_.trim).filter(_.nonEmpty).toSeq
    val reg = spark.sessionState.functionRegistry
    val missing = names.filterNot { n =>
      reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    }
    println("MISSING_START")
    missing.foreach(println)
    println("MISSING_END")
    spark.stop()
  }
}
