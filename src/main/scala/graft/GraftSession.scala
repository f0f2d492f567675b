package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import org.apache.spark.sql.catalyst.expressions.Expression

import graft.expressions.{CosineSimilarity, TDigestQuantiles}

/** SparkSessionExtensions registration: exposes the engine's native
  * expressions to SQL (`SELECT cosine_similarity(a, b)`,
  * `SELECT tdigest_quantiles(v, 0.25, 0.5, 0.75)`), so SQL users get
  * the same codegen'd / mergeable kernels as the Column API.
  * Activate with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("tdigest_quantiles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TDigestQuantiles].getName, "tdigest_quantiles"),
      GraftExtensions.tdigestBuilder))
  }
}

object GraftExtensions {
  /** SQL builder: tdigest_quantiles(col, p1[, p2, ...]) — trailing
    * percentage args must be literals (they shape the aggregate). */
  private[graft] def tdigestBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 2,
      "tdigest_quantiles(col, p1[, p2, ...]) needs at least one percentage")
    val ps = exprs.tail.map { e =>
      require(e.foldable, "tdigest_quantiles percentages must be literals")
      e.eval().toString.toDouble
    }
    TDigestQuantiles(exprs.head, ps).toAggregateExpression()
  }

  /** Register the functions into an ALREADY-RUNNING session — extensions
    * passed to the builder only apply at session creation, and
    * `getOrCreate` silently returns a pre-existing session without them. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tdigest_quantiles", tdigestBuilder, "built-in")
  }
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
