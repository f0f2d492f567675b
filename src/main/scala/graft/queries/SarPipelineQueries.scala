package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.SarOps
import graft.stats.DescribeStats

/** The SAR engine spine (SURVEY.md §7.2: parse → selectHeader → toMetrics →
  * forDevice → wide frame → describe) driven end-to-end against the DuckDB
  * oracle. The testdata has no SAR files, so a long SAR frame is
  * synthesized from `events`: header := event_type (section), data :=
  * "<user_id> <value>" (device-scoped sample line). The oracle recomputes
  * the same numbers straight from `events`, proving the whole pipeline —
  * string split, device pop, Float32 cast/round, wide unpack, describe —
  * preserves the data. (The text parser itself is covered by golden-file
  * ScalaTest fixtures; SURVEY §5.)
  */
object SarPipelineQueries extends QueryPack {

  /** events → long SAR frame (header/data/os_details/restart/date). */
  private def longFrame(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events").select(
      col("event_type").as("header"),
      concat_ws(" ", col("user_id"), col("value")).as("data"),
      lit("").as("os_details"),
      lit("").as("restart"),
      col("ts").as("date"))

  def queries: Seq[QueryDef] = Seq(

    // header inventory of the long frame (P1 slicing + G4 distinct)
    QueryDef("q_sar_headers", (s, dir) => {
      longFrame(s, dir).groupBy("header").agg(count(lit(1)).as("n"))
        .orderBy("header")
    }, Some(
      """SELECT event_type AS header, count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""")),

    // full spine on one section + one device
    QueryDef("q_sar_pipeline", (s, dir) => {
      val section = SarOps.selectHeader(longFrame(s, dir), "purchase")
      val metrics = SarOps.toMetrics(section, "purchase", Some(true))
      val dev = SarOps.forDevice(metrics, "7")
      val wide = SarOps.createMetricsDf(dev, "purchase")
      roundedDescribe(DescribeStats.describe(wide, Seq("purchase")), 4)
    }, Some(
      """WITH x AS (SELECT CAST(round(CAST(value AS FLOAT), 2) AS DOUBLE) AS v
                    FROM events
                    WHERE event_type = 'purchase'
                      AND CAST(user_id AS VARCHAR) = '7')
         SELECT 'purchase' AS metric, CAST(count(v) AS DOUBLE) AS count,
           0.0 AS null_count,
           round(avg(v), 4) AS mean, round(stddev_samp(v), 4) AS std,
           round(min(v), 4) AS min,
           round(quantile_cont(v, 0.25), 4) AS p25,
           round(quantile_cont(v, 0.50), 4) AS p50,
           round(quantile_cont(v, 0.75), 4) AS p75,
           round(max(v), 4) AS max
         FROM x""")),

    // device enumeration on a section (P6/G4/O2; ordering checked in tests)
    QueryDef("q_sar_devices", (s, dir) => {
      val section = SarOps.selectHeader(longFrame(s, dir), "click")
      val metrics = SarOps.toMetrics(section, "click", Some(true))
      metrics.groupBy(col("sub_device")).agg(count(lit(1)).as("n"))
        .orderBy(col("sub_device"))
    }, Some(
      """SELECT CAST(user_id AS VARCHAR) AS sub_device, count(*) AS n
         FROM events WHERE event_type = 'click'
         GROUP BY 1 ORDER BY 1""")),

    // E2 restart zero-row insertion over a daily series
    QueryDef("q_sar_restart_zeros", (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(date_trunc("DAY", col("ts")).as("date"))
        .agg(round(sum("value"), 2).as("revenue"))
      val withZeros = SarOps.insertRestartZeros(daily, "date", Seq(
        utcTs("2024-01-10T00:00:00Z"),  // collides → +1s
        utcTs("2024-01-15T12:00:00Z"))) // clean insert
      withZeros.select(
        date_format(col("date"), "yyyy-MM-dd HH:mm:ss").as("date_s"),
        col("revenue")).orderBy("date_s")
    }, Some(
      """WITH daily AS (
           SELECT date_trunc('day', ts) AS date,
                  round(sum(value), 2) AS revenue
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT strftime(date, '%Y-%m-%d %H:%M:%S') AS date_s, revenue
         FROM (SELECT date, revenue FROM daily
               UNION ALL SELECT TIMESTAMP '2024-01-10 00:00:01', 0.0
               UNION ALL SELECT TIMESTAMP '2024-01-15 12:00:00', 0.0)
         ORDER BY date_s"""))
  )
}
