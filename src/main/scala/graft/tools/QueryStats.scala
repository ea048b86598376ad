package graft.tools

/** Algorithm-internal counters published into the bench artifact.
  *
  * A query builder records scale-relevant internals (LSH candidate-pair
  * counts, bucket occupancies, band widths) under its query name while it
  * plans/executes; Bench snapshots the map after each measured run and
  * emits the values as extra per-query fields in BENCH_FULL.json. This is
  * what makes scale claims falsifiable from the artifact alone: "bucketed,
  * not all-pairs" is checkable only if the candidate count ships with the
  * timing (VERDICT r8 next-round #1 and #6).
  *
  * Values are plain longs; last write per (query, key) wins — Bench reads
  * after the min-run completes, so the snapshot matches the reported run.
  */
object QueryStats {
  private val stats =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Map[String, Long]]()

  def record(query: String, key: String, value: Long): Unit = {
    stats
      .computeIfAbsent(query, _ => new java.util.concurrent.ConcurrentHashMap[String, Long]())
      .put(key, value)
    ()
  }

  /** Snapshot for one query, sorted by key for stable artifact output. */
  def snapshot(query: String): Seq[(String, Long)] = {
    val m = stats.get(query)
    if (m == null) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      m.asScala.toSeq.sortBy(_._1)
    }
  }

  def clear(): Unit = stats.clear()
}
