package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.service.SarService

/** End-to-end usage example: upload a SAR file (text/xz/sadf-JSON all
  * accepted), then query it the way the reference's REST API would.
  * Usage: runMain graft.Demo <sar-file> [aliasOrHeader] */
object Demo {
  def main(args: Array[String]): Unit = {
    val file = args.headOption.getOrElse(
      getClass.getResource("/sar/sa_24h.txt") match {
        case null => sys.error("pass a SAR file path")
        case u => u.getPath
      })
    val alias = if (args.length > 1) args(1) else "CPU"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val svc = new SarService(spark,
      Files.createTempDirectory("graft_demo").toString)
    val info = svc.upload(file, "demo")
    println(s"[demo] uploaded: ${info.rows} rows, ${info.headers.length} sections")
    info.headers.foreach(h => println(s"[demo]   section: $h"))

    svc.headerDetails("demo").foreach(d =>
      println(s"[demo] ${d.alias}: deviceScoped=${d.deviceScoped} devices=${d.devices}"))

    val table = svc.getTable("demo", alias)
    println(s"[demo] table for '$alias' (${table.count()} rows):")
    table.show(5, truncate = false)

    val stats = svc.statistics("demo", alias)
    println("[demo] statistics:")
    stats.show(truncate = false)

    print(svc.statisticsCsv(Seq(alias -> stats)))

    val (records, truncated) = svc.jsonRecords(table, maxRows = 3)
    records.foreach(r => println(s"[demo] json: $r"))
    println(s"[demo] truncated=$truncated")
    spark.stop()
  }
}
