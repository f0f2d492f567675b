package graft


/** Local iteration harness: time a handful of named queries against one
  * data dir (`runMain graft.BenchOne <sfDir> <query> [query ...]`).
  * Every query gets a uniform protocol — one untimed warmup run then two
  * timed runs — so no query is advantaged by absorbing codegen/session
  * startup for the others (the old single-warmup form ran the first
  * query 3× and the rest 2×, an asymmetry in the timing protocol). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchOne <sfDir> <queryName> [queryName ...]")
    val sfDir = args(0)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(1)) {
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save() // warmup, untimed
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        println(f"[benchone] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
