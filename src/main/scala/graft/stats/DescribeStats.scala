package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** describe()-style summary statistics (reference G1: dia_compute_pl.py:
  * 68-73, api/main.py:314-331; SURVEY.md §2.6).
  *
  * Pandas semantics pinned (SURVEY §7.4.2): count, mean, sample std
  * (ddof=1), min, exact linearly-interpolated 25/50/75% quantiles, max —
  * plus Polars' null_count. Exact quantiles use Spark's `percentile`
  * (sort-based); everything is computed in ONE aggregation pass over the
  * input, so a 100 TB scan happens once, with map-side partial aggregation
  * for all moments and a single shuffle of per-column sort buffers for the
  * percentiles.
  */
object DescribeStats {

  /** One output row per metric column:
    * (metric, count, null_count, mean, std, min, p25, p50, p75, max). */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val col_ = col(c).cast("double")
      Seq(
        count(col_).as(s"${c}__count"),
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}__null_count"),
        avg(col_).as(s"${c}__mean"),
        stddev_samp(col_).as(s"${c}__std"),
        min(col_).as(s"${c}__min"),
        percentile(col_, array(lit(0.25), lit(0.5), lit(0.75))).as(s"${c}__q"),
        max(col_).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("metric"),
        col(s"${c}__count").cast("double").as("count"),
        col(s"${c}__null_count").cast("double").as("null_count"),
        col(s"${c}__mean").as("mean"),
        col(s"${c}__std").as("std"),
        col(s"${c}__min").as("min"),
        element_at(col(s"${c}__q"), 1).as("p25"),
        element_at(col(s"${c}__q"), 2).as("p50"),
        element_at(col(s"${c}__q"), 3).as("p75"),
        col(s"${c}__max").as("max"))
    }
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }

  /** Cross-file pooled stats: union the frames, then one describe pass
    * (reference layout_helper_pl.py:236-267 display_averages). */
  def pooledStats(dfs: Seq[DataFrame], cols: Seq[String]): DataFrame =
    describe(dfs.reduce(_ unionByName _), cols)

  /** Scale-path describe: percentile_approx (mergeable sketch, bounded
    * memory) instead of exact sort-based percentile. At 100 TB the exact
    * quantile's per-column value buffer is the bottleneck; the sketch
    * keeps the whole pass map-side mergeable. accuracy=10000 ⇒ rank error
    * ≤ 0.01%. Use `describe` when oracle-exact quantiles are required. */
  def describeApprox(df: DataFrame, cols: Seq[String],
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val col_ = col(c).cast("double")
      Seq(
        count(col_).as(s"${c}__count"),
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}__null_count"),
        avg(col_).as(s"${c}__mean"),
        stddev_samp(col_).as(s"${c}__std"),
        min(col_).as(s"${c}__min"),
        percentile_approx(col_, array(lit(0.25), lit(0.5), lit(0.75)),
          lit(accuracy)).as(s"${c}__q"),
        max(col_).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("metric"),
        col(s"${c}__count").cast("double").as("count"),
        col(s"${c}__null_count").cast("double").as("null_count"),
        col(s"${c}__mean").as("mean"),
        col(s"${c}__std").as("std"),
        col(s"${c}__min").as("min"),
        element_at(col(s"${c}__q"), 1).as("p25"),
        element_at(col(s"${c}__q"), 2).as("p50"),
        element_at(col(s"${c}__q"), 3).as("p75"),
        col(s"${c}__max").as("max"))
    }
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }
}
