package graft.sql

import org.apache.spark.sql.SparkSession

/** Session-scoped access control for the SQL front door — the last §2.8
  * statement family (reference: SqlBase.g4:87-91 GRANT/REVOKE/SHOW
  * GRANTS, execution/GrantTask.java, RevokeTask.java,
  * ShowGrantsTask.java(*via metadata), presto-spi AccessControl).
  *
  * Model (mirrors the reference's split between AllowAllAccessControl
  * and a configured ACL): a table is UNPROTECTED (allow-all) until it
  * first appears in a GRANT or REVOKE statement; from then on only the
  * admin principal and grantees holding the required privilege may
  * touch it through the front door. Grants carry an optional GRANT
  * OPTION; granting requires admin or a grantable grant on the same
  * (table, privilege). The session principal defaults to `admin` and
  * switches via SET SESSION AUTHORIZATION (the engine-level analog of
  * the reference's session user).
  *
  * Scale note: the ACL is O(#grants) driver-side metadata consulted
  * once per statement at plan time — nothing touches the data path, so
  * enforcement cost is independent of data size.
  */
object AccessControl {

  val AllPrivileges: Seq[String] = Seq("SELECT", "INSERT", "DELETE", "UPDATE")

  final class AccessDeniedException(msg: String)
    extends RuntimeException(s"Access Denied: $msg")

  final case class Grant(grantee: String, table: String, privilege: String,
      grantable: Boolean)

  private val AdminPrincipal = "admin"

  private val principals =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  // Statement-scoped identity override: the HTTP protocol carries the
  // user on every request (X-Presto-User, PrestoHeaders.java:25;
  // QuerySessionSupplier builds the session identity from it), so a
  // worker thread serving that statement must act as THAT user — for
  // grants, resource-group selection, and session defaults — not as the
  // server session's principal. Thread-local because the whole
  // statement (enforce, selectors, defaults) runs on the one worker.
  private val userOverride = new ThreadLocal[String]()

  /** Run `f` with the session principal overridden to `user` on this
    * thread (no-op when user is null). */
  def withUser[T](user: String)(f: => T): T =
    if (user == null) f
    else {
      val prev = userOverride.get()
      userOverride.set(user)
      try f finally {
        if (prev == null) userOverride.remove() else userOverride.set(prev)
      }
    }

  def principal(spark: SparkSession): String =
    Option(userOverride.get())
      .orElse(Option(principals.get(spark))).getOrElse(AdminPrincipal)

  def setPrincipal(spark: SparkSession, user: String): Unit =
    principals.put(spark, user)

  // (table -> grantee -> privilege -> grantable); guarded by `lock`
  private val acl =
    scala.collection.mutable.Map[String,
      scala.collection.mutable.Map[String,
        scala.collection.mutable.Map[String, Boolean]]]()
  private val lock = new Object

  private def norm(s: String): String = s.trim.toLowerCase

  /** Canonical ACL key for a table reference: `schema.table`, resolved
    * the way the session would resolve the name (CreateTableTask.java
    * and friends check privileges on the FULLY QUALIFIED object). A
    * bare name is qualified with the session's current schema — except
    * temp views, which Spark resolves schema-independently and which
    * therefore key on the bare name. Three-part catalog.schema.table
    * drops the catalog (single-catalog engine). Keying on the last
    * part alone (pre-r9) collapsed `schema_a.t` and `schema_b.t` into
    * one entry, so a grant on one leaked onto the other.
    */
  private def qualify(spark: SparkSession, name0: String): String = {
    val parts = name0.split('.').map(norm).filter(_.nonEmpty).toSeq
    parts match {
      case Seq(single) =>
        if (spark.sessionState.catalog.getTempView(single).isDefined) single
        else s"${norm(spark.catalog.currentDatabase)}.$single"
      case more => more.takeRight(2).mkString(".")
    }
  }

  /** Parse a privilege list: "SELECT, INSERT" / "ALL PRIVILEGES". */
  def parsePrivileges(text: String): Seq[String] = {
    val t = text.trim.toUpperCase
    if (t == "ALL" || t == "ALL PRIVILEGES") AllPrivileges
    else t.split(",").map(_.trim).toSeq.map { p =>
      require(AllPrivileges.contains(p), s"Unknown privilege: $p")
      p
    }
  }

  private def canGrant(who: String, table: String, priv: String): Boolean =
    who == AdminPrincipal || lock.synchronized {
      acl.get(table).flatMap(_.get(who)).flatMap(_.get(priv)).contains(true)
    }

  def grant(spark: SparkSession, privText: String, table0: String,
      grantee: String, withGrantOption: Boolean): Unit = {
    val table = qualify(spark, table0)
    val who = principal(spark)
    parsePrivileges(privText).foreach { p =>
      if (!canGrant(who, table, p))
        throw new AccessDeniedException(
          s"$who may not grant $p on $table (no grant option)")
      lock.synchronized {
        acl.getOrElseUpdate(table, scala.collection.mutable.Map())
          .getOrElseUpdate(norm(grantee), scala.collection.mutable.Map())
          .updateWith(p)(prev => Some(withGrantOption || prev.contains(true)))
      }
    }
  }

  def revoke(spark: SparkSession, privText: String, table0: String,
      grantee: String, grantOptionOnly: Boolean): Unit = {
    val table = qualify(spark, table0)
    val who = principal(spark)
    parsePrivileges(privText).foreach { p =>
      if (!canGrant(who, table, p))
        throw new AccessDeniedException(s"$who may not revoke $p on $table")
      lock.synchronized {
        // REVOKE on a previously unprotected table still protects it
        // (same as GRANT: the table has entered managed mode)
        val t = acl.getOrElseUpdate(table, scala.collection.mutable.Map())
        t.get(norm(grantee)).foreach { g =>
          if (grantOptionOnly) { if (g.contains(p)) g(p) = false }
          else g.remove(p)
        }
      }
    }
  }

  /** SHOW GRANTS [ON table] rows, deterministically ordered. The
    * filter resolves through the same qualification as grants do. */
  def grants(spark: SparkSession, tableFilter: Option[String]): Seq[Grant] =
    grantsByKey(tableFilter.map(qualify(spark, _)))

  private def grantsByKey(keyFilter: Option[String]): Seq[Grant] = lock.synchronized {
    (for {
      (table, byGrantee) <- acl.toSeq
      if keyFilter.forall(_ == table)
      (grantee, privs) <- byGrantee.toSeq
      (p, grantable) <- privs.toSeq
    } yield Grant(grantee, table, p, grantable))
      .sortBy(g => (g.table, g.grantee, g.privilege))
  }

  /** Throws AccessDeniedException iff `table` is ACL-managed and the
    * session principal lacks `priv`. Unmanaged tables are allow-all. */
  def check(spark: SparkSession, table0: String, priv: String): Unit = {
    val table = qualify(spark, table0)
    val who = principal(spark)
    if (who == AdminPrincipal) return
    val managed = lock.synchronized { acl.get(table).map(_.toMap.view.mapValues(_.toMap).toMap) }
    managed.foreach { byGrantee =>
      if (!byGrantee.get(norm(who)).exists(_.contains(priv)))
        throw new AccessDeniedException(s"$who cannot $priv on $table")
    }
  }

  /** Enforce privileges for every ACL-managed table a statement
    * references: INSERT targets need INSERT, DELETE targets DELETE,
    * CTAS / CREATE VIEW / REPLACE targets need INSERT (the
    * write-equivalent of the reference's CREATE check in
    * CreateTableTask.java), every other relation SELECT. Tables key on
    * their qualified `schema.table` name — see [[qualify]]. Fast-path
    * exit when no table is managed. Called by the front door
    * pre-execution. */
  def enforce(spark: SparkSession, sqlText: String): Unit = {
    val empty = lock.synchronized(acl.isEmpty)
    if (empty || principal(spark) == AdminPrincipal) return
    val plan = spark.sessionState.sqlParser.parsePlan(sqlText)
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.plans.logical.{CreateTableAsSelect, CreateView, DeleteFromTable, InsertIntoStatement, ReplaceTableAsSelect}
    val writes = scala.collection.mutable.Set[String]()
    def write(name: String, priv: String): Unit = {
      writes += qualify(spark, name); check(spark, name, priv)
    }
    def identName(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Option[String] =
      p match {
        case u: UnresolvedIdentifier => Some(u.nameParts.mkString("."))
        case _ => None
      }
    plan.foreach {
      case i: InsertIntoStatement => i.table match {
        case r: UnresolvedRelation => write(r.multipartIdentifier.mkString("."), "INSERT")
        case _ =>
      }
      case d: DeleteFromTable => d.table match {
        case r: UnresolvedRelation => write(r.multipartIdentifier.mkString("."), "DELETE")
        case _ =>
      }
      case c: CreateTableAsSelect =>
        identName(c.name).foreach(write(_, "INSERT"))
      case c: ReplaceTableAsSelect =>
        identName(c.name).foreach(write(_, "INSERT"))
      case v: CreateView =>
        identName(v.child).foreach(write(_, "INSERT"))
      case _ =>
    }
    plan.foreach {
      case r: UnresolvedRelation =>
        val n = r.multipartIdentifier.mkString(".")
        if (!writes.contains(qualify(spark, n))) check(spark, n, "SELECT")
      case _ =>
    }
  }

  /** Drop all ACL state (tests / fixture queries). */
  def clear(): Unit = lock.synchronized(acl.clear())
}
