package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.expressions.CosineSimilarity

/** SparkSessionExtensions registration: exposes the engine's native
  * expressions to SQL (`SELECT cosine_similarity(a, b)`), so SQL users
  * get the same codegen'd kernels as the Column API.
  * Activate with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Register the functions into an ALREADY-RUNNING session — extensions
    * passed to the builder only apply at session creation, and
    * `getOrCreate` silently returns a pre-existing session without them. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
}

/** Canonical session factory: the configuration every entry point
  * (Verify/Bench/Demo/user code) should run with. */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def get(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    GraftExtensions.register(s) // in case getOrCreate reused a session
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
