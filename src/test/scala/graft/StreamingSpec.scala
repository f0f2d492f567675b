package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Tables
import graft.streaming.SarStreaming

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed stream over event files matches the batch aggregate") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(dir).schema, dir)
    val result = SarStreaming.runToMemory(
      SarStreaming.windowedCounts(stream), "win_counts")

    val batch = events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(result.count() == batch.count())
    val streamTotal = result.agg(sum("n")).collect().head.getLong(0)
    assert(streamTotal == events.count())
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(200)
    val dir = Files.createTempDirectory("graft_dedup").toString
    // simulate a source that re-delivers the same batch twice
    events.write.mode("overwrite").parquet(s"$dir/batch1")
    events.write.mode("overwrite").parquet(s"$dir/batch2")
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(s"$dir/batch1").schema, s"$dir/*")
    val deduped = SarStreaming.dedupStream(stream,
      Seq("event_id"), "ts", "2 hours")
    val result = SarStreaming.runToMemory(deduped, "dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(spark.read.parquet(s"$dir/*").count() == 400)
    assert(result.count() == 200)
  }

  test("stateful sessionization matches the batch window query") {
    import spark.implicits._
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val ds = events.select(col("user_id"), col("ts"))
      .as[SarStreaming.SessionEvent]
    // batch oracle: q_sessionize logic
    val batch = SparkEntry.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = SarStreaming.sessionize(ds).collect()
      .map(u => u.user_id -> (u.n_sessions, u.n_events)).toMap
    assert(got == batch)
  }
}
