package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only scratch profiler: times semicolon-separated SQL statements
  * (Spark dialect) with per-statement wall + executor CPU. Not part of
  * any query path; used for optimization-round attribution runs.
  *
  * Usage: sbt "runMain graft.tools.Scratch <sfDir> <n> <sqlFile>"
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val sqls = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(2))), "UTF-8")
      .split(";;").map(_.trim).filter(_.nonEmpty)
    val spark = graft.engine.Engine.session("local[32]")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        cpuNs.addAndGet(ev.stageInfo.taskMetrics.executorCpuTime)
    })
    graft.engine.Engine.registerTables(spark, sfDir)
    spark.table("lineitem").write.format("noop").mode("overwrite").save()
    for ((sql, i) <- sqls.zipWithIndex) {
      val label = sql.linesIterator.next().take(70)
      for (r <- 1 to n) {
        org.apache.spark.sql.graft.ListenerBusFlush.drain(spark.sparkContext)
        val c0 = cpuNs.get(); val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.ListenerBusFlush.drain(spark.sparkContext)
        val cpu = (cpuNs.get() - c0) / 1e9
        println(f"[scratch] #$i%02d run$r wall=$wall%7.3f cpu=$cpu%8.3f  $label")
      }
    }
    spark.stop()
  }
}
