package graft.tools

import graft.SparkEntry

/** Per-query timer: runs named bench queries N times each and prints
  * per-iteration wall times, separating fixed overhead (first-run codegen,
  * job-launch count) from data-proportional work.
  *
  * Usage: sbt "runMain graft.tools.Profile <sfDir> <n> <query...>"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Profile <sfDir> <n> <query...>")
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.engine.Engine.session("local[32]")
    // Slow-stage tracer (GRAFT_STAGE_DEBUG): which stages dominate, and
    // with how many tasks — the first question for any regression.
    if (sys.env.contains("GRAFT_STAGE_DEBUG"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = ev.stageInfo
          val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
          if (dur.exists(_ > 1500))
            System.err.println(
              s"[stage] id=${si.stageId} tasks=${si.numTasks} ms=${dur.get} name=${si.name.take(80)}")
        }
      })
    graft.engine.Engine.registerTables(spark, sfDir)
    spark.table("lineitem").write.format("noop").mode("overwrite").save()
    val qs = SparkEntry.benchQueries
    for (name <- names) {
      val fn = qs(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
