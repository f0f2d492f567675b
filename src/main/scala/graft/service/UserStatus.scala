package graft.service

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Login history + counter tables (reference handle_user_status.py,
  * SURVEY §2.6 G9): two tiny parquet-backed tables under
  * `<storage>/config` with read-modify-write update semantics.
  *
  * The reference's atomic_write_parquet (tmp file + POSIX rename)
  * prevents torn reads between Streamlit threads; here Spark's job-commit
  * protocol plays that role (SURVEY §4) and in-JVM calls are
  * synchronized. Like the reference, concurrent writers can still lose
  * updates — the tables are operational telemetry, not ledgers.
  */
class UserStatus(spark: SparkSession, storageDir: String,
    counterExcludedUser: String = "jschaef") {
  import spark.implicits._

  private val configDir = s"$storageDir/config"
  private val statusPath = s"$configDir/user_df.parquet"
  private val counterPath = s"$configDir/login_counter.parquet"

  private def exists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  /** Seed row mirroring create_user_status_df (admin, now, success). */
  private def seedStatus(): DataFrame =
    Seq(("admin", new Timestamp(System.currentTimeMillis()), true))
      .toDF("user_name", "login_time", "success")

  /** The login-history table, created on first access. */
  def statusDf(): DataFrame = synchronized {
    if (!exists(statusPath)) {
      seedStatus().write.mode("overwrite").parquet(statusPath)
      spark.catalog.refreshByPath(statusPath)
    }
    spark.read.parquet(statusPath)
  }

  /** Append one login record (add_record: vstack + rewrite). */
  def addRecord(userName: String, loginTime: Timestamp,
      success: Boolean): Unit = synchronized {
    val cur = statusDf()
    val schema = cur.schema
    val next = cur.unionByName(
      Seq((userName, loginTime, success))
        .toDF("user_name", "login_time", "success"))
      .collect() // materialize BEFORE overwriting the file being read
    spark.createDataFrame(java.util.Arrays.asList(next: _*), schema)
      .coalesce(1)
      .write.mode("overwrite").parquet(statusPath)
    spark.catalog.refreshByPath(statusPath)
  }

  /** Drop history rows at or before `cutoff` (remove_old_logins). */
  def removeOldLogins(df: DataFrame, cutoff: Timestamp): DataFrame =
    df.filter(col("login_time") > lit(cutoff))

  /** Current successful-login count (0 when the table is missing). */
  def loginCounter(): Long = synchronized {
    if (!exists(counterPath)) {
      Seq(0L).toDF("count").write.mode("overwrite").parquet(counterPath)
      spark.catalog.refreshByPath(counterPath)
    }
    spark.read.parquet(counterPath).head().getLong(0)
  }

  /** Increment and persist the counter; logins of the excluded user (the
    * app owner in the reference) are not counted. Returns the value
    * after this call. */
  def incrementLoginCounter(userName: String): Long = synchronized {
    val current = loginCounter()
    if (userName == counterExcludedUser) return current
    val next = current + 1
    Seq(next).toDF("count").write.mode("overwrite").parquet(counterPath)
    spark.catalog.refreshByPath(counterPath)
    next
  }
}
