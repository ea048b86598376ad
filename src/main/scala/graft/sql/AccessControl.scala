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

  def principal(spark: SparkSession): String =
    Option(principals.get(spark)).getOrElse(AdminPrincipal)

  def setPrincipal(spark: SparkSession, user: String): Unit =
    principals.put(spark, user)

  // (table -> grantee -> privilege -> grantable); guarded by `lock`
  private val acl =
    scala.collection.mutable.Map[String,
      scala.collection.mutable.Map[String,
        scala.collection.mutable.Map[String, Boolean]]]()
  private val lock = new Object

  private def norm(s: String): String = s.trim.toLowerCase

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
    val table = norm(table0)
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
    val table = norm(table0)
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

  /** SHOW GRANTS [ON table] rows, deterministically ordered. */
  def grants(tableFilter: Option[String]): Seq[Grant] = lock.synchronized {
    (for {
      (table, byGrantee) <- acl.toSeq
      if tableFilter.forall(f => norm(f) == table)
      (grantee, privs) <- byGrantee.toSeq
      (p, grantable) <- privs.toSeq
    } yield Grant(grantee, table, p, grantable))
      .sortBy(g => (g.table, g.grantee, g.privilege))
  }

  /** Throws AccessDeniedException iff `table` is ACL-managed and the
    * session principal lacks `priv`. Unmanaged tables are allow-all. */
  def check(spark: SparkSession, table0: String, priv: String): Unit = {
    val table = norm(table0)
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
    * every other relation SELECT. Fast-path exit when no table is
    * managed. Called by the front door pre-execution. */
  def enforce(spark: SparkSession, sqlText: String): Unit = {
    val empty = lock.synchronized(acl.isEmpty)
    if (empty || principal(spark) == AdminPrincipal) return
    val plan = spark.sessionState.sqlParser.parsePlan(sqlText)
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement}
    val writes = scala.collection.mutable.Set[String]()
    plan.foreach {
      case i: InsertIntoStatement => i.table match {
        case r: UnresolvedRelation =>
          val n = r.multipartIdentifier.last
          writes += norm(n); check(spark, n, "INSERT")
        case _ =>
      }
      case d: DeleteFromTable => d.table match {
        case r: UnresolvedRelation =>
          val n = r.multipartIdentifier.last
          writes += norm(n); check(spark, n, "DELETE")
        case _ =>
      }
      case _ =>
    }
    plan.foreach {
      case r: UnresolvedRelation =>
        val n = r.multipartIdentifier.last
        if (!writes.contains(norm(n))) check(spark, n, "SELECT")
      case _ =>
    }
  }

  /** Drop all ACL state (tests / fixture queries). */
  def clear(): Unit = lock.synchronized(acl.clear())
}
