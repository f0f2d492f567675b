package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming extension (SURVEY.md §2.10: the reference is
  * batch-only; this exposes the same event analytics over an unbounded
  * file source). Streams are first-class for the 100 TB target: a
  * continuously-landing telemetry directory gets the identical windowed
  * aggregates the batch path computes, with watermarks bounding state.
  */
object SarStreaming {

  /** File-source stream over a directory of parquet event files. */
  def readEvents(spark: SparkSession, schema: StructType,
      path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling-window counts + sums per event type with a watermark that
    * bounds state (late rows beyond the watermark are dropped). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionState(sessionCount: Long, lastTs: Long)
  final case class SessionUpdate(user_id: Long, n_sessions: Long,
      n_events: Long)

  /** Stateful sessionization with mapGroupsWithState: a new session starts
    * after `gapSeconds` of inactivity per user (streaming analog of the
    * batch q_sessionize window query). */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long = 1800)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long, Long), SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Long, Long)]) =>
          val (sess0, last0, n0) =
            state.getOption.getOrElse((0L, Long.MinValue, 0L))
          var sess = sess0; var last = last0; var n = n0
          rows.toSeq.sortBy(e => e.ts.getTime).foreach { e =>
            val sec = e.ts.getTime / 1000
            // cross-batch late events (sec < last) are counted but never
            // regress `last` — a regressed watermark would open a spurious
            // session at the next on-time event
            if (sec >= last || last == Long.MinValue) {
              if (last == Long.MinValue || sec - last > gapSeconds) sess += 1
              last = sec
            }
            n += 1
          }
          state.update((sess, last, n))
          SessionUpdate(user, sess, n)
      }
  }

  /** Streaming exact deduplication: drop repeats of `keyCols` arriving
    * within the watermark delay — the streaming face of the batch
    * hash-groupBy dedup, with state bounded by the watermark (a landing
    * directory re-delivering files cannot double-count). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkCol: String, delay: String = "1 hour"): DataFrame =
    events.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Drive a stream to completion against a memory sink and return the
    * result table (test/local harness; production uses a real sink). */
  def runToMemory(df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Update()): DataFrame = {
    val q = df.writeStream.outputMode(outputMode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
