package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only write-parallelism auditor (VERDICT r16 item 7): performs the
  * same writes the src_* queries perform and reports how many part files
  * (and, where relevant, write tasks) each produced under the session's
  * core count. Run twice — SPARK_GRAFT_CPUS=8 and =32 — to show which
  * counts track input splits / layout parameters and which would need a
  * bytes-derived parameter at 100 TB. Not on any query path.
  *
  * Usage: SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.WriteParallelism [sfDir]"
  */
object WriteParallelism {

  private def partFiles(dir: String): Int = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).iterator.flatMap(_.iterator).flatMap(walk)
      else Iterator(f)
    walk(new java.io.File(dir)).count { f =>
      val n = f.getName
      n.startsWith("part-") && !n.endsWith(".crc")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Engine.session(s"local[$cpus]", cpus.toInt)
    graft.engine.Engine.registerTables(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_writepar_").toString
    def report(label: String, n: Int): Unit =
      println(s"[writepar] cpus=$cpus $label files=$n")
    try {
      // Format roundtrips (src_roundtrip_*): write the nation dim.
      for (fmt <- Seq("parquet", "orc", "csv", "json")) {
        spark.table("nation").write.mode("overwrite").format(fmt).save(s"$base/$fmt")
        report(s"roundtrip_$fmt(nation)", partFiles(s"$base/$fmt"))
      }
      // Fact-sized write: lineitem scan straight to parquet — write tasks
      // = scan splits (maxPartitionBytes), the bytes-proportional case.
      spark.table("lineitem").write.mode("overwrite").parquet(s"$base/fact")
      report("fact_parquet(lineitem)", partFiles(s"$base/fact"))
      // Bucketed write (src_bucketed_join): files = write tasks x buckets
      // touched; bucket count (8) is the tested layout contract.
      graft.operators.BucketOps.writeBucketed(
        spark.table("lineitem").select("l_orderkey", "l_extendedprice"),
        "graft_writepar_bkt", "l_orderkey", 8)
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      report("bucketed(lineitem,8)", partFiles(s"$warehouse/graft_writepar_bkt"))
      spark.sql("DROP TABLE IF EXISTS graft_writepar_bkt")
      // Z-order write (src_zorder_pruning): numFiles is a caller
      // parameter (the query passes 16) — range shuffle, tasks = files.
      graft.operators.ZOrderOps.writeZOrdered(
        spark.table("lineitem").select("l_partkey", "l_suppkey", "l_quantity"),
        s"$base/zorder", "l_partkey", "l_suppkey", 16)
      report("zorder(lineitem,16)", partFiles(s"$base/zorder"))
      // Hive-partitioned write (src_partition_pruning): files = write
      // tasks x dates held per task.
      spark.table("events").withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(s"$base/part")
      report("partitioned(events,by_date)", partFiles(s"$base/part"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      spark.stop()
    }
  }
}
