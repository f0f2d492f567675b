package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup: first named query (q1_agg needs TPC-H tables, which
    // ScaleGen corpora don't carry)
    SparkEntry.queries(args(1))(spark, sfDir).write.mode("overwrite").format("noop").save()
    for (name <- args.drop(1); i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[benchone] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
