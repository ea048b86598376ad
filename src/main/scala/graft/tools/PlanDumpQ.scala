package graft.tools

import graft.SparkEntry

/** Per-query formatted-plan dumper for optimization evidence:
  * writes `<outDir>/<query>_<tag>.txt` with `.explain("formatted")` output
  * for each named query.
  *
  * Usage: sbt "runMain graft.tools.PlanDumpQ <sfDir> <outDir> <tag> <query...>"
  */
object PlanDumpQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDumpQ <sfDir> <outDir> <tag> <query...>")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.engine.Engine.session("local[8]")
    graft.engine.Engine.registerTables(spark, sfDir)
    val qs = SparkEntry.queries
    for (name <- names) {
      val df = qs(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $name -> ${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
