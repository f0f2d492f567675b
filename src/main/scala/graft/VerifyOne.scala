package graft


/** Single-query slice of [[Verify]] for local iteration: writes one
  * query's result parquet + its oracle SQL so tools/local_verify.py
  * --no-run --only=<q> can diff it without re-running all 120+. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, name) = args.take(3)
    val spark = GraftSession.get(8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    // shared escape with Verify: all control chars covered, so a tab/CR
    // in the SQL can't produce invalid JSON here either
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"""{${Verify.jsonQuote(name)}: ${
        Verify.jsonQuote(SparkEntry.oracleSql(name))}}""")
    spark.stop()
  }
}
