package graft.sql

/** Password authentication for the statement server — the reference's
  * pluggable HTTP password auth stack re-expressed for a zero-egress
  * engine:
  *
  *   - RFC 7617 Basic-credential parsing exactly as
  *     server/security/PasswordAuthenticator.java:36-61: the
  *     case-insensitive "Basic" scheme, base64 payload decoded as
  *     ISO-8859-1 (the charset the reference CLI/JDBC pre-authenticate
  *     with, :63-75), user:password split on the FIRST colon with both
  *     parts required non-empty ("Malformed decoded credentials").
  *   - The PasswordAuthenticator SPI contract
  *     (spi/security/PasswordAuthenticator.java:
  *     createAuthenticatedPrincipal(user, password) -> Principal, or
  *     AccessDeniedException), installed on the server the way
  *     PasswordAuthenticatorManager wires the configured factory.
  *   - A file/map-backed credential store as the in-repo provider
  *     (user -> SHA-256(password) hex). The reference ships only an
  *     LDAP provider (presto-password-authenticators/LdapAuthenticator
  *     .java) — a live directory is environmental in this sandbox, so
  *     the file store plays the provider role; the parsing, challenge,
  *     and principal plumbing are the surfaces under test.
  *
  * The authenticated principal then feeds the EXISTING identity path:
  * X-Presto-User (when present) must match the principal — the
  * principal-matching rule of checkCanSetUser
  * (QuerySessionSupplier.java:63) — and the effective user drives
  * ${USER} resource groups, per-user session defaults, and GRANT
  * enforcement exactly as an unauthenticated X-Presto-User does.
  */
object PasswordAuth {

  /** 401 payload: optional WWW-Authenticate challenge + message (the
    * reference's AuthenticationException carries both). */
  final case class AuthFailure(message: Option[String], challenge: Option[String])

  private val Challenge = "Basic realm=\"Presto\""

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(java.lang.Integer.parseInt(_, 16).toByte).toArray

  /** A stored credential. Both verifications compare with
    * MessageDigest.isEqual — constant-time over the full digest, no
    * hex-prefix timing side channel (ordinary String.equals bails at
    * the first differing character). */
  sealed trait Credential { def verify(password: String): Boolean }

  /** Legacy line shape `user:sha256hex` — unsalted single round, kept
    * readable for existing files. */
  final case class Sha256(hashHex: String) extends Credential {
    def verify(password: String): Boolean =
      java.security.MessageDigest.isEqual(
        hexBytes(hashHex),
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(password.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Salted iterated PBKDF2-HMAC-SHA256 — the shape file-based password
    * authenticators in the reference ecosystem store, resistant to
    * offline rainbow/brute-force if the credential file leaks. */
  final case class Pbkdf2(iterations: Int, saltHex: String, hashHex: String)
      extends Credential {
    def verify(password: String): Boolean =
      java.security.MessageDigest.isEqual(
        hexBytes(hashHex),
        Pbkdf2.derive(password, hexBytes(saltHex), iterations, hashHex.length * 4))
  }

  object Pbkdf2 {
    def derive(password: String, salt: Array[Byte], iterations: Int,
        bits: Int): Array[Byte] = {
      val spec = new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, iterations, bits)
      javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(spec).getEncoded
    }

    /** Render a password-file line `user:pbkdf2:<iter>:<saltHex>:<hashHex>`
      * with a fresh random salt. */
    def line(user: String, password: String, iterations: Int = 100000): String = {
      val salt = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(salt)
      val hash = derive(password, salt, iterations, 256)
      s"$user:pbkdf2:$iterations:${salt.map(b => f"$b%02x").mkString}:" +
        hash.map(b => f"$b%02x").mkString
    }
  }

  /** The SPI: user+password -> principal name, or AccessDeniedException
    * (here SecurityException with the access-denied text). */
  final case class Authenticator(users: Map[String, Credential]) {
    def createAuthenticatedPrincipal(user: String, password: String): String =
      if (users.get(user).exists(_.verify(password))) user
      else throw new SecurityException("Access Denied: Invalid credentials")
  }

  /** File provider: one credential per line — either the legacy
    * `user:sha256hex` or salted `user:pbkdf2:<iter>:<saltHex>:<hashHex>`;
    * blank lines and #-comments ignored (the password-file layout). */
  def fromFile(path: String): Authenticator = {
    import scala.jdk.CollectionConverters._
    val users = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .asScala.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        // hex shape is validated at LOAD: a malformed line must fail
        // server start as "malformed credential line", not turn a login
        // attempt into a 500 when hexBytes throws at verify time
        def isHex(s: String) =
          s.nonEmpty && s.length % 2 == 0 && s.forall(c => "0123456789abcdef".indexOf(c) >= 0)
        l.split(":").toSeq match {
          case Seq(u, "pbkdf2", iter, salt, hash)
              if u.nonEmpty && iter.nonEmpty && iter.forall(_.isDigit) &&
                isHex(salt.toLowerCase) && isHex(hash.toLowerCase) =>
            (u, Pbkdf2(iter.toInt, salt.toLowerCase, hash.toLowerCase): Credential)
          case Seq(u, h) if u.nonEmpty && isHex(h.toLowerCase) =>
            (u, Sha256(h.toLowerCase): Credential)
          case _ => throw new IllegalArgumentException(s"malformed credential line: $l")
        }
      }.toMap
    Authenticator(users)
  }

  /** PasswordAuthenticator.authenticate(request) — parse the
    * Authorization header and resolve the principal. Left = the 401 to
    * send; Right = the authenticated principal. */
  def authenticate(auth: Authenticator, header: Option[String]): Either[AuthFailure, String] = {
    val h = header.getOrElse("")
    val space = h.indexOf(' ')
    if (space < 0 || !h.substring(0, space).equalsIgnoreCase("basic"))
      return Left(AuthFailure(None, Some(Challenge)))
    val decoded =
      try new String(java.util.Base64.getDecoder.decode(h.substring(space + 1).trim),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      catch {
        case _: IllegalArgumentException =>
          return Left(AuthFailure(Some("Invalid base64 encoded credentials"), None))
      }
    decoded.split(":", 2) match {
      case Array(user, password) if user.nonEmpty && password.nonEmpty =>
        try Right(auth.createAuthenticatedPrincipal(user, password))
        catch {
          case e: SecurityException =>
            Left(AuthFailure(Some(e.getMessage), Some(Challenge)))
        }
      case _ => Left(AuthFailure(Some("Malformed decoded credentials"), None))
    }
  }
}
