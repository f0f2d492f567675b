package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink — a plain count() would
  * let Catalyst prune every column and skip the actual expressions. A
  * warmup pass (q1_agg) absorbs JVM/codegen startup, and every query runs
  * `runs` times with the median reported, so round-over-round deltas are
  * signal rather than JIT variance.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Double = {
      val fn = SparkEntry.queries(name) // lookup outside the timed region
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0 // failure marker: never report a broken query as a timing
      }
    }

    exec("q1_agg") // warmup, not reported

    // median of `runs` timings; any failed run marks the query -1 (a
    // query that fails even once is not a timing)
    def medianExec(name: String): Double = {
      val ts = (1 to runs).map(_ => exec(name))
      if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(ts.length / 2)
    }

    // optional comma-separated name filter (local iteration only — the
    // driver never sets it, so the contract output is unchanged)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val results = SparkEntry.all
      .filter(q => only.forall(_.contains(q.name)))
      .map(q => q.name -> medianExec(q.name))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures stay visible per-query as -1 but must not subtract from
    // the headline total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":$runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
