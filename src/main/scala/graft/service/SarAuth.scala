package graft.service

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.Base64

import javax.crypto.{Mac, SecretKeyFactory}
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

import org.apache.spark.sql.SparkSession

/** Bearer-token auth for the HTTP shell, mirroring the reference's
  * stateless HMAC scheme and PBKDF2 user store:
  *
  *   - passwords: PBKDF2-HMAC-SHA512, 100k iterations, 64-hex-char salt
  *     prefix + 128-hex-char hash (code/hashing.py:13-30 byte-for-byte,
  *     so a stored hash from the reference's SQLite DB verifies here);
  *   - tokens: `base64url(username|expiry|purpose) + "." +
  *     hex(hmac_sha256(secret, payload))` with a 24 h TTL
  *     (api/auth.py:29-57) — stateless, so no token table to shard and
  *     nothing server-side to look up per request;
  *   - roles: `user` / `admin`; admin gates the user-management and
  *     maintenance routes (api/main.py:166-226).
  *
  * The user table is tiny operational metadata (like [[UserStatus]]),
  * so it lives in memory and persists to one parquet file under
  * `<baseDir>/config` on every change — login/role checks never run a
  * Spark job, only mutations do. The reference's SSO/UI single-use
  * token surface (api/auth.py purpose='ui') belongs to the scoped-out
  * Streamlit UI (SURVEY §7.5); `purpose` is carried in the payload for
  * wire compatibility and anything but 'api' is rejected exactly like
  * get_current_user (api/auth.py:95-108).
  */
class SarAuth(spark: SparkSession, baseDir: String,
    secret: String = java.util.UUID.randomUUID().toString,
    tokenTtlSeconds: Long = 24 * 3600) {

  import SarAuth._

  val Roles: Set[String] = Set("user", "admin")

  private val usersPath = s"$baseDir/config/users.parquet"
  // username -> (pwhash, role)
  private var users: Map[String, (String, String)] = load()

  private def load(): Map[String, (String, String)] = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(usersPath)))
      Map.empty
    else spark.read.parquet(usersPath).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
  }

  private def persist(): Unit = {
    import spark.implicits._
    users.toSeq.map { case (u, (h, r)) => (u, h, r) }
      .toDF("username", "pwhash", "role")
      .coalesce(1).write.mode("overwrite").parquet(usersPath)
    spark.catalog.refreshByPath(usersPath)
  }

  /** add_userdata (sql_stuff.py:112): false when the user exists. */
  def addUser(username: String, password: String,
      role: String = "user"): Boolean = synchronized {
    require(Roles(role), s"unknown role '$role'; available: $Roles")
    require(username.matches(SarTenants.UserPattern),
      s"invalid username '$username'")
    require(password.length >= 6, "password must be at least 6 characters")
    if (users.contains(username)) false
    else {
      users += username -> (hashPassword(password), role)
      persist(); true
    }
  }

  /** Idempotent seeding (the API bootstrap's role): create-or-leave. */
  def ensureUser(username: String, password: String,
      role: String = "user"): Unit = synchronized {
    if (!users.contains(username)) addUser(username, password, role)
  }

  /** login_user (sql_stuff.py:103): hash verify, false for unknown. */
  def login(username: String, password: String): Boolean =
    synchronized(users.get(username))
      .exists { case (h, _) => verifyPassword(h, password) }

  def role(username: String): Option[String] =
    synchronized(users.get(username)).map(_._2)

  def isAdmin(username: String): Boolean = role(username).contains("admin")

  /** view_all_users (sql_stuff.py:94): (username, role), name-ordered. */
  def listUsers(): Seq[(String, String)] =
    synchronized(users).toSeq.map { case (u, (_, r)) => (u, r) }.sortBy(_._1)

  def changePassword(username: String, password: String): Boolean =
    synchronized {
      require(password.length >= 6, "password must be at least 6 characters")
      users.get(username) match {
        case Some((_, r)) =>
          users += username -> (hashPassword(password), r)
          persist(); true
        case None => false
      }
    }

  // ---- stateless tokens (api/auth.py:40-83) -------------------------

  /** Issue a signed bearer token; returns (token, expiresAtEpochSec). */
  def createToken(username: String,
      ttlSeconds: Long = tokenTtlSeconds): (String, Long) = {
    val expiry = System.currentTimeMillis() / 1000 + ttlSeconds
    val payload = s"$username|$expiry|api"
    val b64 = Base64.getUrlEncoder.withoutPadding
      .encodeToString(payload.getBytes(UTF_8))
    (b64 + "." + sign(payload), expiry)
  }

  /** Verify signature + expiry + purpose; Left(detail) maps to 401. */
  def decode(token: String): Either[String, String] = {
    val dot = token.lastIndexOf('.')
    if (dot < 0) return Left("Malformed token")
    val (b64, sig) = (token.substring(0, dot), token.substring(dot + 1))
    val payload = try new String(Base64.getUrlDecoder.decode(b64), UTF_8)
      catch { case _: IllegalArgumentException => return Left("Malformed token") }
    // constant-time compare, like hmac.compare_digest (api/auth.py:68)
    if (!java.security.MessageDigest.isEqual(
        sign(payload).getBytes(US_ASCII), sig.getBytes(US_ASCII)))
      return Left("Invalid token signature")
    payload.split("\\|", -1) match {
      case fields if fields.length >= 2 =>
        val purpose = if (fields.length > 2) fields(2) else "api"
        fields(1).toLongOption match {
          case None => Left("Malformed token")
          case Some(exp) if exp < System.currentTimeMillis() / 1000 =>
            Left("Token expired")
          case Some(_) if purpose != "api" =>
            Left("This token is not valid for API access")
          case Some(_) => Right(fields(0))
        }
      case _ => Left("Malformed token")
    }
  }

  private def sign(payload: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    hex(mac.doFinal(payload.getBytes(UTF_8)))
  }
}

object SarAuth {

  /** hash_password (code/hashing.py:13): 64-hex salt + pbkdf2 sha512. */
  def hashPassword(password: String): String = {
    val saltBytes = new Array[Byte](60)
    new java.security.SecureRandom().nextBytes(saltBytes)
    val salt = hex(java.security.MessageDigest.getInstance("SHA-256")
      .digest(saltBytes))
    salt + pbkdf2(password, salt)
  }

  /** verify_password (code/hashing.py:22): recompute with stored salt. */
  def verifyPassword(stored: String, provided: String): Boolean = {
    if (stored.length < 64) return false
    val (salt, hash) = stored.splitAt(64)
    java.security.MessageDigest.isEqual(
      pbkdf2(provided, salt).getBytes(US_ASCII), hash.getBytes(US_ASCII))
  }

  private def pbkdf2(password: String, salt: String): String = {
    val spec = new PBEKeySpec(password.toCharArray,
      salt.getBytes(US_ASCII), 100000, 512)
    hex(SecretKeyFactory.getInstance("PBKDF2WithHmacSHA512")
      .generateSecret(spec).getEncoded)
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString
}
