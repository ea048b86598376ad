package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write DELETE over a parquet directory — the reference's
  * Delete/TableFinish pair (presto-main/.../operator/DeleteOperator.java,
  * MetadataDeleteOperator.java) re-expressed for immutable columnar
  * storage.
  *
  * Strategy: DELETE on parquet cannot be in-place; the scalable move is
  * file-pruned copy-on-write —
  *   1. one pass finds the files that contain matching rows
  *      (`input_file_name()` + the predicate, a metadata-sized result);
  *   2. ONLY those files are rewritten with the predicate negated
  *      (null-safe: rows where the predicate is NULL are kept, matching
  *      SQL DELETE semantics);
  *   3. untouched files are left byte-identical — at 100 TB with
  *      range-clustered data a selective DELETE rewrites a handful of
  *      files, not the table.
  * Parquet min/max pushdown prunes step 1's scan to the same files when
  * the predicate is on a clustered column, so both passes are bounded by
  * the affected key range.
  *
  * Swap is rename-based per file (old file deleted after its replacement
  * lands). Crash-consistency across the whole DELETE needs a snapshotting
  * table format (Delta/Iceberg) — documented delta vs the reference,
  * whose connectors own that transactionality.
  */
object DeleteOps {

  final case class DeleteStats(filesTotal: Long, filesRewritten: Long, rowsDeleted: Long)

  /** Delete rows matching `predicate` from the parquet table at `path`.
    * Returns (filesTotal, filesRewritten, rowsDeleted).
    */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): DeleteStats = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val tableDir = new org.apache.hadoop.fs.Path(path)
    val fs = tableDir.getFileSystem(hconf)

    def dataFiles(): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(tableDir).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath)

    val before = dataFiles()

    // Pass 1: which files hold matching rows + how many rows go. One scan,
    // pushdown-prunable, result is O(#files) — metadata, not data.
    val touchedRows = spark.read.parquet(path)
      .filter(predicate)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val touched = touchedRows.map(r => new org.apache.hadoop.fs.Path(
      new java.net.URI(r.getString(0))).getName).toSet
    val rowsDeleted = touchedRows.map(_.getLong(1)).sum

    if (touched.isEmpty) return DeleteStats(before.size, 0, 0)

    // Pass 2: rewrite ONLY the touched files, keeping rows where the
    // predicate is false OR null (SQL DELETE removes only TRUE matches).
    val touchedPaths = before.filter(p => touched.contains(p.getName))
    val tmp = new org.apache.hadoop.fs.Path(tableDir, s".delete_tmp_${java.util.UUID.randomUUID}")
    spark.read.parquet(touchedPaths.map(_.toString): _*)
      .filter(!coalesce(predicate, lit(false)))
      .write.parquet(tmp.toString)

    // Swap: move rewritten parts in (fresh names can't collide with the
    // UUID-suffixed originals), then drop the originals. Every rename must
    // succeed BEFORE any original is deleted — a failed rename followed by
    // deletion of the originals would silently drop that file's surviving
    // rows; aborting here leaves extra rewrite files (re-runnable) but
    // never loses data.
    val parts = fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
    parts.zipWithIndex.foreach { case (st, i) =>
      val dest = new org.apache.hadoop.fs.Path(tableDir,
        s"rewrite-${java.util.UUID.randomUUID}-$i.parquet")
      if (!fs.rename(st.getPath, dest))
        throw new java.io.IOException(
          s"DELETE aborted before removing originals: rename ${st.getPath} -> $dest failed")
    }
    touchedPaths.foreach { p =>
      if (!fs.delete(p, false) && fs.exists(p))
        throw new java.io.IOException(s"DELETE: could not remove original $p")
    }
    fs.delete(tmp, true)

    DeleteStats(before.size, touchedPaths.size, rowsDeleted)
  }
}
