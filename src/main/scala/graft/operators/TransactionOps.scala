package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Transactions over graft-managed tables (SURVEY §2.8; reference:
  * SqlBase.g4:34-98 START TRANSACTION / COMMIT / ROLLBACK,
  * execution/StartTransactionTask.java, CommitTask.java,
  * RollbackTask.java, transaction/TransactionManager.java).
  *
  * The reference brokers transactions through connector metadata; Spark
  * has no native multi-statement transactions, so this is the minimal
  * honest table format that supports them: a versioned directory layout
  * (`<root>/v<N>/` parquet + a `_current` pointer file) with
  * snapshot-isolation semantics via atomic pointer swap — the public
  * Iceberg/Delta design in its simplest form.
  *
  *  - Reads resolve the pointer once per statement (or once per
  *    transaction: the snapshot version is pinned at BEGIN-first-touch).
  *  - Writes (insert/delete) produce a NEW full version directory
  *    (copy-on-write, like DeleteOps) and either move the pointer
  *    immediately (auto-commit) or stage the move until COMMIT.
  *  - COMMIT validates that no other committer moved the pointer since
  *    the snapshot (first-committer-wins conflict detection, the
  *    reference's transaction-conflict error); on conflict the
  *    transaction rolls back and the error propagates.
  *  - ROLLBACK deletes staged version directories.
  *
  * Scale: the pointer file is O(1) metadata; version data is written
  * once per statement by distributed jobs (no driver data path). At
  * 100 TB the same layout works with manifest files instead of full
  * directory rewrites — the pointer-swap commit protocol is unchanged.
  */
object TransactionOps {

  final class Txn {
    // table root -> version observed at first touch inside this txn
    val snapshots = scala.collection.mutable.Map[String, Int]()
    // table root -> staged (uncommitted) version
    val staged = scala.collection.mutable.Map[String, Int]()
  }

  private val txns =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Txn]())

  private def currentTxn(spark: SparkSession): Option[Txn] = Option(txns.get(spark))

  // ---- versioned layout ----

  private def pointerFile(root: String) = new java.io.File(root, "_current")

  private def readPointer(root: String): Int = {
    val f = pointerFile(root)
    require(f.exists(), s"not a transactional table: $root")
    new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toInt
  }

  private def writePointer(root: String, v: Int): Unit = {
    // write-rename for atomicity on a local/posix fs; object stores get
    // the same effect from conditional puts
    val tmp = new java.io.File(root, s"_current.tmp.$v")
    java.nio.file.Files.write(tmp.toPath, v.toString.getBytes)
    java.nio.file.Files.move(tmp.toPath, pointerFile(root).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def versionDir(root: String, v: Int) = s"$root/v$v"

  private def nextVersion(root: String): Int = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
    dirs.filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(f => scala.util.Try(f.getName.drop(1).toInt).toOption)
      .foldLeft(-1)(math.max) + 1
  }

  private def deleteDir(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete()
    }
    rec(new java.io.File(path))
  }

  // ---- table operations ----

  /** CREATE: writes v0 and points at it. */
  def createTable(spark: SparkSession, root: String, df: DataFrame): Unit = {
    deleteDir(root)
    new java.io.File(root).mkdirs()
    df.write.mode("overwrite").parquet(versionDir(root, 0))
    writePointer(root, 0)
  }

  /** The version this session should read: staged write if any, else the
    * transaction's pinned snapshot, else the committed pointer (pinning
    * it if a transaction is open — repeatable reads). */
  private def readVersion(spark: SparkSession, root: String): Int =
    currentTxn(spark) match {
      case Some(t) =>
        t.staged.getOrElse(root,
          t.snapshots.getOrElseUpdate(root, readPointer(root)))
      case None => readPointer(root)
    }

  /** Read at this session's visibility (snapshot inside a txn). */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(versionDir(root, readVersion(spark, root)))

  /** Read the last COMMITTED state regardless of any open transaction —
    * what every other session sees. */
  def readCommitted(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(versionDir(root, readPointer(root)))

  private def stageOrCommit(spark: SparkSession, root: String, v: Int): Unit =
    currentTxn(spark) match {
      case Some(t) => t.staged.put(root, v)
      case None => writePointer(root, v) // auto-commit
    }

  /** INSERT INTO: copy-on-write append as a new version. */
  def insertInto(spark: SparkSession, root: String, rows: DataFrame): Unit = {
    val base = read(spark, root)
    val v = nextVersion(root)
    base.unionByName(rows).write.mode("overwrite").parquet(versionDir(root, v))
    stageOrCommit(spark, root, v)
  }

  /** DELETE WHERE: copy-on-write filter as a new version. */
  def deleteWhere(spark: SparkSession, root: String, predicate: Column): Unit = {
    val base = read(spark, root)
    val v = nextVersion(root)
    base.filter(!predicate || predicate.isNull).write.mode("overwrite")
      .parquet(versionDir(root, v))
    stageOrCommit(spark, root, v)
  }

  // ---- transaction protocol ----

  def begin(spark: SparkSession): Unit = {
    require(currentTxn(spark).isEmpty,
      "Nested transactions unsupported") // reference: NOT_SUPPORTED
    txns.put(spark, new Txn)
  }

  def commit(spark: SparkSession): Unit = {
    val t = currentTxn(spark).getOrElse(
      throw new IllegalStateException("No transaction in progress"))
    // first-committer-wins validation across every table written
    t.staged.keys.foreach { root =>
      val committed = readPointer(root)
      if (t.snapshots.get(root).exists(_ != committed)) {
        rollback(spark)
        throw new java.util.ConcurrentModificationException(
          s"transaction conflict: $root moved to v$committed since snapshot")
      }
    }
    t.staged.foreach { case (root, v) => writePointer(root, v) }
    txns.remove(spark)
  }

  def rollback(spark: SparkSession): Unit = {
    currentTxn(spark).foreach { t =>
      t.staged.foreach { case (root, v) => deleteDir(versionDir(root, v)) }
    }
    txns.remove(spark)
  }

  def inTransaction(spark: SparkSession): Boolean = currentTxn(spark).isDefined

  /** Drop the whole table (cleanup helper). */
  def dropTable(root: String): Unit = deleteDir(root)
}
