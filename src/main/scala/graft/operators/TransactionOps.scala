package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactions over graft-managed tables (SURVEY §2.8; reference:
  * SqlBase.g4:34-98 START TRANSACTION / COMMIT / ROLLBACK,
  * execution/StartTransactionTask.java, CommitTask.java,
  * RollbackTask.java, transaction/TransactionManager.java).
  *
  * The reference brokers transactions through connector metadata; Spark
  * has no native multi-statement transactions, so this is the minimal
  * honest table format that supports them — the public Iceberg/Delta
  * design in its simplest form:
  *
  *   <root>/_current               committed version number (atomic swap)
  *   <root>/manifest-v<N>.txt      schema DDL + the live data files of vN
  *   <root>/data/fs-<uuid>/        immutable parquet file sets
  *
  *  - A version is a MANIFEST (list of live files), not a data copy.
  *    INSERT writes only the new rows as a fresh file set and a manifest
  *    that is {parent's live files + new files} — O(delta) data I/O,
  *    O(#files) metadata. At 100 TB an appended row costs one small file,
  *    not a table rewrite.
  *  - DELETE is file-pruned copy-on-write like [[DeleteOps]]: one
  *    metadata-sized pass finds the live files containing matching rows
  *    (input_file_name + predicate, parquet min/max prunable); only those
  *    files are rewritten (filtered) into a new file set; untouched files
  *    are SHARED byte-identical across versions via the manifest.
  *  - Reads resolve the pointer once per statement (or once per
  *    transaction: the snapshot version is pinned at first touch —
  *    repeatable reads) and scan exactly the manifest's files.
  *  - COMMIT validates that no other committer moved the pointer since
  *    the snapshot (first-committer-wins, the reference's
  *    transaction-conflict error) and swaps the pointer. Validation and
  *    swap run under a per-table-root lock so two in-process committers
  *    cannot interleave check-then-act; cross-process safety rides on the
  *    atomic pointer rename (single-writer-host assumption, same as any
  *    filesystem-pointer table format without a locking service).
  *  - ROLLBACK deletes staged manifests and the file sets this
  *    transaction created; committed files are never touched.
  *
  * Old versions stay readable ([[readAt]]) until [[vacuum]] — time travel
  * for free, exactly the Iceberg snapshot model.
  */
object TransactionOps {

  final class Txn {
    // identity + birth time surfaced by system.runtime.transactions
    val id: String = java.util.UUID.randomUUID().toString
    val createdAtMs: Long = System.currentTimeMillis()
    // table root -> version observed at first touch inside this txn
    val snapshots = scala.collection.mutable.Map[String, Int]()
    // table root -> staged (uncommitted) version
    val staged = scala.collection.mutable.Map[String, Int]()
    // table root -> file-set dirs created by this txn (for rollback)
    val created = scala.collection.mutable.Map[String, List[String]]()
  }

  private val txns =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Txn]())

  private def currentTxn(spark: SparkSession): Option[Txn] = Option(txns.get(spark))

  /** Per-root lock guarding version allocation and pointer validate+swap
    * within this process (ADVICE r7: commit was check-then-act). */
  private val rootLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(new java.io.File(root).getAbsolutePath, _ => new Object)

  // ---- pointer ----

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

  // ---- manifests ----

  private def manifestFile(root: String, v: Int) =
    new java.io.File(root, s"manifest-v$v.txt")

  /** First line: schema DDL. Remaining lines: root-relative data files. */
  private def writeManifest(root: String, v: Int, schemaDdl: String,
      files: Seq[String]): Unit = {
    val body = (s"#schema\t$schemaDdl" +: files).mkString("\n")
    val tmp = new java.io.File(root, s".manifest-v$v.tmp")
    java.nio.file.Files.write(tmp.toPath, body.getBytes)
    java.nio.file.Files.move(tmp.toPath, manifestFile(root, v).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def readManifest(root: String, v: Int): (String, Seq[String]) = {
    val lines = new String(java.nio.file.Files.readAllBytes(
      manifestFile(root, v).toPath)).split("\n").toSeq
    val schema = lines.head.stripPrefix("#schema\t")
    (schema, lines.tail.filter(_.nonEmpty))
  }

  private def nextVersion(root: String): Int = {
    val fs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
    fs.filter(f => f.isFile && f.getName.startsWith("manifest-v"))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix("manifest-v").stripSuffix(".txt").toInt).toOption)
      .foldLeft(-1)(math.max) + 1
  }

  /** Write `df` as a new immutable file set; returns (dir, relative file paths). */
  private def writeFileSet(root: String, df: DataFrame): (String, Seq[String]) = {
    val rel = s"data/fs-${java.util.UUID.randomUUID}"
    val dir = new java.io.File(root, rel)
    df.write.parquet(dir.toString)
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => s"$rel/${f.getName}").toSeq
    (rel, parts)
  }

  private def deleteDir(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete()
    }
    rec(new java.io.File(path))
  }

  // ---- table operations ----

  /** CREATE: writes file set + manifest v0 and points at it. */
  def createTable(spark: SparkSession, root: String, df: DataFrame): Unit = {
    deleteDir(root)
    new java.io.File(root).mkdirs()
    val (_, files) = writeFileSet(root, df)
    writeManifest(root, 0, df.schema.toDDL, files)
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

  /** Read a specific version's manifest — time travel. */
  def readAt(spark: SparkSession, root: String, v: Int): DataFrame = {
    val (ddl, files) = readManifest(root, v)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    else spark.read.schema(ddl)
      .parquet(files.map(f => new java.io.File(root, f).toString): _*)
  }

  /** Read at this session's visibility (snapshot inside a txn). */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, readVersion(spark, root))

  /** Read the last COMMITTED state regardless of any open transaction —
    * what every other session sees. */
  def readCommitted(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, readPointer(root))

  private def stageOrCommit(spark: SparkSession, root: String, v: Int,
      newDirs: List[String]): Unit =
    currentTxn(spark) match {
      case Some(t) =>
        t.staged.put(root, v)
        t.created.updateWith(root)(c => Some(newDirs ::: c.getOrElse(Nil)))
      case None => writePointer(root, v) // auto-commit: swap under the caller's lock
    }

  /** INSERT INTO: writes ONLY `rows` as a new file set; the new manifest
    * is {parent live files + new files}. O(delta) data written. */
  def insertInto(spark: SparkSession, root: String, rows: DataFrame): Unit =
    lockFor(root).synchronized {
      val parent = readVersion(spark, root)
      val (ddl, live) = readManifest(root, parent)
      val (dir, newFiles) = writeFileSet(root, rows)
      val v = nextVersion(root)
      writeManifest(root, v, ddl, live ++ newFiles)
      stageOrCommit(spark, root, v, List(dir))
    }

  /** DELETE WHERE: file-pruned copy-on-write. Finds the live files that
    * contain matching rows (one metadata-sized, pushdown-prunable pass),
    * rewrites ONLY those filtered into a new file set, and shares every
    * untouched file with the parent version via the manifest. */
  def deleteWhere(spark: SparkSession, root: String, predicate: Column): Unit =
    lockFor(root).synchronized {
      val parent = readVersion(spark, root)
      val (ddl, live) = readManifest(root, parent)
      val abs = live.map(f => new java.io.File(root, f).getAbsolutePath)
      val relByName = live.map(f => new java.io.File(f).getName -> f).toMap

      // Pass 1: which live files hold matching rows — O(#files) result.
      val touchedNames: Set[String] =
        if (live.isEmpty) Set.empty
        else spark.read.schema(ddl).parquet(abs: _*)
          .filter(predicate)
          .select(input_file_name().as("f")).distinct().collect()
          .map(r => new java.io.File(new java.net.URI(r.getString(0)).getPath).getName)
          .toSet

      val (touched, untouched) = live.partition(f =>
        touchedNames.contains(new java.io.File(f).getName))
      val v = nextVersion(root)
      if (touched.isEmpty) {
        // no matches: new version shares every file with its parent
        writeManifest(root, v, ddl, live)
        stageOrCommit(spark, root, v, Nil)
      } else {
        // Pass 2: rewrite only the touched files, keeping rows where the
        // predicate is false OR null (SQL DELETE removes only TRUE matches).
        val survivors = spark.read.schema(ddl)
          .parquet(touched.map(f => new java.io.File(root, f).toString): _*)
          .filter(!coalesce(predicate, lit(false)))
        val (dir, newFiles) = writeFileSet(root, survivors)
        writeManifest(root, v, ddl, untouched ++ newFiles)
        stageOrCommit(spark, root, v, List(dir))
      }
    }

  /** ALTER TABLE ADD COLUMN as an O(1) METADATA-ONLY commit (the
    * reference's AddColumnTask contract, SqlBase.g4:57-58): the new
    * manifest carries the extended schema and the parent's EXACT file
    * list — zero data rewritten at any table size; the parquet reader
    * null-fills the new column for pre-evolution files. Time travel
    * keeps each version's own schema (manifests are schema-versioned).
    */
  def addColumn(spark: SparkSession, root: String, name: String,
      sparkType: String): Unit =
    lockFor(root).synchronized {
      val parent = readVersion(spark, root)
      val (ddl, live) = readManifest(root, parent)
      val st = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      require(!st.fieldNames.contains(name), s"column $name already exists")
      val extended = st.add(name, sparkType)
      val v = nextVersion(root)
      writeManifest(root, v, extended.toDDL, live)
      stageOrCommit(spark, root, v, Nil)
    }

  /** ALTER TABLE DROP COLUMN — also metadata-only (DropColumnTask,
    * SqlBase.g4:55-56): the schema shrinks, the file list is shared
    * verbatim; parquet reads project the surviving subset and simply
    * never touch the dropped column's pages (columnar pruning makes the
    * drop free at read time too).
    */
  def dropColumn(spark: SparkSession, root: String, name: String): Unit =
    lockFor(root).synchronized {
      val parent = readVersion(spark, root)
      val (ddl, live) = readManifest(root, parent)
      val st = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      require(st.fieldNames.contains(name), s"column $name does not exist")
      val shrunk = org.apache.spark.sql.types.StructType(st.filterNot(_.name == name))
      val v = nextVersion(root)
      writeManifest(root, v, shrunk.toDDL, live)
      stageOrCommit(spark, root, v, Nil)
    }

  /** OPTIMIZE / compaction (the Raptor-style file-organization job —
    * reference raptor compaction semantics: many small files from
    * incremental commits rewritten into few, contents identical): the
    * live row set is rewritten into `targetFiles` files as ONE new
    * version; prior versions keep their manifests untouched, so time
    * travel still reads the pre-compaction layout. At scale this runs
    * per partition/bucket with the same manifest swap; the small-file
    * problem is THE read-amplification killer at 100 TB (per-file open
    * cost and footer reads dominate under thousands of tiny commits).
    */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 1): Unit =
    lockFor(root).synchronized {
      val parent = readVersion(spark, root)
      val (ddl, live) = readManifest(root, parent)
      if (live.nonEmpty) {
        val df = spark.read.schema(ddl)
          .parquet(live.map(f => new java.io.File(root, f).toString): _*)
          .coalesce(targetFiles)
        val (dir, newFiles) = writeFileSet(root, df)
        val v = nextVersion(root)
        writeManifest(root, v, ddl, newFiles)
        stageOrCommit(spark, root, v, List(dir))
      }
    }

  /** The live data-file set of a version — exposed so specs/queries can
    * PROVE a commit was metadata-only (file set shared with the parent).
    */
  def liveFileSet(root: String, v: Int): Set[String] =
    readManifest(root, v)._2.toSet

  /** Current committed version pointer (for time-travel assertions). */
  def currentVersion(root: String): Int = readPointer(root)

  // ---- transaction protocol ----

  def begin(spark: SparkSession): Unit = {
    require(currentTxn(spark).isEmpty,
      "Nested transactions unsupported") // reference: NOT_SUPPORTED
    txns.put(spark, new Txn)
  }

  def commit(spark: SparkSession): Unit = {
    val t = currentTxn(spark).getOrElse(
      throw new IllegalStateException("No transaction in progress"))
    // first-committer-wins validation + swap, each table under its root
    // lock so a concurrent in-process committer cannot interleave.
    t.staged.keys.toSeq.sorted.foreach { root => // sorted: stable lock order
      lockFor(root).synchronized {
        val committed = readPointer(root)
        if (t.snapshots.get(root).exists(_ != committed)) {
          rollback(spark)
          throw new java.util.ConcurrentModificationException(
            s"transaction conflict: $root moved to v$committed since snapshot")
        }
        writePointer(root, t.staged(root))
      }
    }
    txns.remove(spark)
  }

  def rollback(spark: SparkSession): Unit = {
    currentTxn(spark).foreach { t =>
      t.staged.foreach { case (root, v) => manifestFile(root, v).delete() }
      t.created.foreach { case (root, dirs) =>
        dirs.foreach(d => deleteDir(new java.io.File(root, d).toString))
      }
    }
    txns.remove(spark)
  }

  def inTransaction(spark: SparkSession): Boolean = currentTxn(spark).isDefined

  /** (id, createdAtMs, tables staged for write) of this session's open
    * transaction, if any — the system.runtime.transactions row. */
  def activeTransaction(spark: SparkSession): Option[(String, Long, Seq[String])] =
    currentTxn(spark).map(t => (t.id, t.createdAtMs, t.staged.keys.toSeq.sorted))

  /** Versions currently on disk (ascending). */
  def versions(root: String): Seq[Int] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("manifest-v"))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix("manifest-v").stripSuffix(".txt").toInt).toOption)
      .sorted.toSeq

  /** Drop manifests older than the current pointer and any data file no
    * surviving manifest references — the Iceberg expire-snapshots step. */
  def vacuum(root: String): Unit = lockFor(root).synchronized {
    val keep = readPointer(root)
    versions(root).filter(_ != keep).foreach(v => manifestFile(root, v).delete())
    val (_, liveFiles) = readManifest(root, keep)
    val liveSet = liveFiles.toSet
    val dataDir = new java.io.File(root, "data")
    Option(dataDir.listFiles()).getOrElse(Array.empty).filter(_.isDirectory).foreach { fsDir =>
      val rel = s"data/${fsDir.getName}"
      val parts = Option(fsDir.listFiles()).getOrElse(Array.empty)
      if (!parts.exists(p => liveSet.contains(s"$rel/${p.getName}")))
        deleteDir(fsDir.toString)
    }
  }

  /** Drop the whole table (cleanup helper). */
  def dropTable(root: String): Unit = deleteDir(root)
}
