package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are fully materialized through a noop datasource write —
  * `count()` would let Spark prune projections and undercount the work
  * (the reference's benchmarks drain full pages through the operator,
  * presto-benchmark/.../AbstractOperatorBenchmark.java).
  *
  * Methodology (round 6): every query runs twice — one full first pass,
  * then a full second pass — and reports the min wall time of the two,
  * alongside the executor CPU time of the min run and the first-pass wall
  * time (`t1`). Reporting CPU next to wall makes a contaminated run
  * self-diagnosing: host-level stalls inflate wall but not CPU, so
  * wall≫cpu on a shuffle-free scan means the box was busy, not the code.
  * (Earlier rounds retried only the >3s tail; totals are therefore not
  * directly comparable to r5-and-before single-pass numbers.)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Keep compute-dense but byte-light shuffles parallel: the default
      // 1MB floor coalesces a 3MB candidate-pair exchange to 3 tasks and
      // serializes the (expensive) downstream verify on a 32-core box.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64kb")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Always-on CPU accounting: per-stage executorCpuTime accumulated into a
    // counter, snapshotted around each query (bus drained first — stage
    // events are async). CPU time is immune to the whole-host stall windows
    // that wrecked the round-5 driver wall numbers.
    val cpuNs = new AtomicLong(0L)
    val stageDebug = sys.env.contains("GRAFT_STAGE_DEBUG")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        cpuNs.addAndGet(si.taskMetrics.executorCpuTime)
        if (stageDebug) {
          val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
          if (dur.exists(_ > 3000))
            System.err.println(s"[stage] id=${si.stageId} tasks=${si.numTasks} ms=${dur.get} " +
              s"cpuMs=${si.taskMetrics.executorCpuTime / 1000000} " +
              s"runMs=${si.taskMetrics.executorRunTime} gcMs=${si.taskMetrics.jvmGCTime} " +
              s"name=${si.name.take(60)}")
        }
      }
    })

    // Prewarm: session + parquet footers + function registry (excluded
    // from measured time, like the reference's prewarm runs in
    // presto-benchto-benchmarks tpch.yaml). The sketch queries also get
    // one unmeasured pass: their TypedImperativeAggregate inner loops
    // are the most JIT-sensitive code in the suite, and r2→r3 showed
    // 3-5x run-order jitter on exactly this group until compiled.
    graft.engine.Engine.registerTables(spark, sfDir)
    spark.table("lineitem").write.format("noop").mode("overwrite").save()
    Seq("sketch_hll_merge", "sketch_qdigest", "sketch_setdigest_jaccard", "sketch_heavy_hitters")
      .foreach { q =>
        try SparkEntry.benchQueries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(_) => () }
      }

    // Dev convenience mirroring Verify: SPARK_GRAFT_BENCH_ONLY=prefix1,prefix2
    // times only matching queries (the driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    var sinceGc = 0
    // One measured run: (wall sec, executor-cpu sec). Bus drained on both
    // sides of the window so stage events land in the right query.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      org.apache.spark.sql.graft.ListenerBusFlush.drain(spark.sparkContext)
      val c0 = cpuNs.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.ListenerBusFlush.drain(spark.sparkContext)
      (wall, (cpuNs.get() - c0) / 1e9)
    }
    def measured(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      sinceGc += 1
      if (sinceGc >= 25) { System.gc(); sinceGc = 0 } // JMH-style: bound generated-class buildup
      // A failed query must not masquerade as a (fast) timing: recorded as
      // -1 and listed under "failures", excluded from totals.
      try once(fn)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); (-1.0, -1.0) }
    }
    val queries = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val firstPass = queries.map { case (name, fn) => (name, fn, measured(name, fn)) }
    // Second full pass AFTER the whole suite, min of the two runs per query:
    // the stall windows this box exhibits span several consecutive queries,
    // so an immediate retry lands in the same window — a retry minutes
    // later does not. Keeping the retried run's CPU paired with its wall.
    val results = firstPass.map { case (name, fn, (w1, c1)) =>
      val (wall, cpu) =
        if (w1 < 0) (w1, c1)
        else {
          val (w2, c2) = try once(fn) catch { case _: Throwable => (Double.MaxValue, 0.0) }
          if (w2 < w1) (w2, c2) else (w1, c1)
        }
      (name, wall, cpu, w1, wall >= 0)
    }
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val wallTotal = results.collect { case (_, w, _, _, true) => w }.sum
    val cpuTotal = results.collect { case (_, _, c, _, true) => c }.sum
    val failures = results.collect { case (k, _, _, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")

    // Full per-query detail goes to a file: the driver captures only the
    // last ~2000 chars of stdout, so the printed line must stay compact
    // (190+ timing objects would overflow and leave the line unparseable).
    val fullQs = results.map { case (k, w, c, t1, _) =>
      "\"" + k + "\":{\"wall\":" + r3(w) + ",\"cpu\":" + r3(c) + ",\"t1\":" + r3(t1) + "}"
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${r3(wallTotal)},"cpu":${r3(cpuTotal)},"unit":"sec","n_queries":${results.size},"methodology":"min-of-2 wall per query, second pass after full suite; cpu = executorCpuTime of the min run","queries":$fullQs,"failures":$failures,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Compact stdout line: headline TPC-H queries by name, everything else
    // rolled up into per-module prefixes sums.
    val headline = results.filter { case (k, _, _, _, ok) => ok && k.matches("^q\\d+_.*") }
      .map { case (k, w, _, _, _) => "\"" + k.split('_').head + "\":" + r3(w) }
    val groups = results.filter { case (k, _, _, _, ok) => ok && !k.matches("^q\\d+_.*") }
      .groupBy(_._1.split('_').head).toSeq.sortBy(_._1)
      .map { case (g, rs) => "\"" + g + "\":" + r3(rs.map(_._2).sum) }
    val qs = (headline ++ groups).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(wallTotal)},"cpu":${r3(cpuTotal)},"unit":"sec","n_queries":${results.size},"queries":$qs,"failures":$failures,"sf":"$sfDir","detail":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
