package graft.service

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Multi-tenant hub mirroring the reference's per-user storage scoping
  * (api/services.py:46-47,67,141-145,355-361): every upload, query,
  * delete and cleanup is rooted at `baseDir/<username>`, usernames are
  * validated against the reference's `USERNAME_PATTERN`
  * (`^[A-Za-z0-9][A-Za-z0-9._@+-]*$`, api/services.py:46), and the
  * `config` directory is never a tenant (EXCLUDED_UPLOAD_DIRS,
  * api/services.py:347).
  *
  * Isolation falls out of composition: each user owns a [[SarService]]
  * instance whose storage directory, parquet files and DataFrame cache
  * are private to that user — one user's re-upload or delete can never
  * evict or serve another user's frames. The hub adds what a
  * per-directory service cannot see: cross-user enumeration, the
  * per-user disk-usage report (disk_usage_report, api/services.py:379)
  * and all-users age-based cleanup (cleanup_old_files,
  * api/services.py:524-543).
  */
class SarTenants(spark: SparkSession, baseDir: String) {

  Files.createDirectories(Paths.get(baseDir))

  import SarTenants.UserPattern
  private val ExcludedDirs = Set("config")
  // concurrent: the hub backs a REST surface (parallel per-user requests)
  private val services =
    new java.util.concurrent.ConcurrentHashMap[String, SarService]()

  /** Username guard (api/services.py:46,67,356): pattern-checked so a
    * caller-supplied user like `../peer` can never escape `baseDir`,
    * and the excluded `config` directory is not addressable as a user. */
  private def validated(username: String): String = {
    require(username.matches(UserPattern) && !ExcludedDirs(username),
      s"invalid username '$username' " +
        s"(allowed: $UserPattern, excluding ${ExcludedDirs.mkString(",")})")
    username
  }

  /** The user's own service, created (with its directory) on first use —
    * the reference creates the user directory at registration/upload
    * (api/services.py:141-145); first-touch creation here is the same
    * contract without the auth layer. */
  def forUser(username: String): SarService =
    services.computeIfAbsent(validated(username),
      u => new SarService(spark, s"$baseDir/$u"))

  /** Users with an existing storage directory (disk_usage_report's
    * enumeration, api/services.py:385-388: directories under the base,
    * excluded names skipped). Only pattern-conforming names count as
    * users — a stray non-tenant directory must not make the all-users
    * sweeps (diskUsage, cleanup) throw on forUser validation. */
  def listUsers(): Seq[String] =
    Option(new java.io.File(baseDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches(UserPattern) &&
        !ExcludedDirs(f.getName))
      .map(_.getName).toSeq.sorted

  /** Per-user disk usage, largest consumers first (disk_usage_report,
    * api/services.py:379-400): (username, totalBytes, fileCount). */
  def diskUsage(): Seq[(String, Long, Long)] =
    listUsers().map { u =>
      val perFile = forUser(u).diskUsage()
      (u, perFile.map(_._2).sum, perFile.length.toLong)
    }.sortBy { case (u, bytes, _) => (-bytes, u) }

  /** Age-based cleanup across one user or every user (cleanup_old_files,
    * api/services.py:524-543): per-user stale-file lists, deletion
    * delegated to each user's own service so caches drop with the files
    * and never across tenants. Mirrors `_existing_user_dir`
    * (api/services.py:355-361): naming a user without a storage
    * directory is an error, while the all-users sweep just walks what
    * exists. dryRun returns the identical map without touching anything. */
  def cleanupOldFiles(days: Int, username: Option[String] = None,
      dryRun: Boolean = true,
      today: java.time.LocalDate = java.time.LocalDate.now())
      : Map[String, Seq[String]] = {
    val targets = username match {
      case Some(u) =>
        require(Files.isDirectory(Paths.get(s"$baseDir/${validated(u)}")),
          s"no upload directory for user '$u'")
        Seq(u)
      case None => listUsers()
    }
    targets.map { u =>
      u -> forUser(u).cleanupOldFiles(days, dryRun, today)
    }.filter(_._2.nonEmpty).toMap
  }
}

object SarTenants {
  /** The reference's USERNAME_PATTERN (api/services.py:46) — shared with
    * [[SarAuth]] so a registrable user is always a valid tenant. */
  val UserPattern = "[A-Za-z0-9][A-Za-z0-9._@+-]*"
}
