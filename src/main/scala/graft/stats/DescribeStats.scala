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

  /** Exact linear-interpolated quantiles via distributed sort +
    * zipWithIndex row selection. Spark's built-in exact `percentile`
    * aggregates every distinct value into one in-memory map on a single
    * reducer — fine for low-cardinality metrics, O(distinct) memory on a
    * high-cardinality column (it cannot survive 100 TB). A distributed
    * sort spills and scales; only the ≤2·|ps| boundary rows are
    * collected. */
  def exactQuantilesSorted(df: DataFrame, c: String,
      ps: Seq[Double]): Seq[Double] = {
    val sorted = df.select(col(c).cast("double").as("v"))
      .na.drop().sort(col("v"))
    val indexed = sorted.rdd.map(_.getDouble(0)).zipWithIndex()
      .map { case (v, i) => (i, v) }
    indexed.cache()
    try {
      val n = indexed.count()
      if (n == 0) return ps.map(_ => Double.NaN)
      val targets = ps.flatMap { p =>
        val k = (n - 1) * p
        Seq(math.floor(k).toLong, math.ceil(k).toLong)
      }.toSet
      val picked = indexed.filter { case (i, _) => targets.contains(i) }
        .collect().toMap
      ps.map { p =>
        val k = (n - 1) * p
        val lo = math.floor(k).toLong
        val hi = math.ceil(k).toLong
        val vLo = picked(lo); val vHi = picked(hi)
        vLo + (k - lo) * (vHi - vLo)
      }
    } finally indexed.unpersist(blocking = false)
  }

  /** describe() with sort-based exact quantiles: same output as
    * `describe` (one row per metric, pandas semantics) but the quantile
    * memory profile is a distributed spillable sort instead of the
    * built-in Percentile's single value-count map. Moments still come
    * from one aggregation pass; quantile sorts run as one extra job per
    * column. */
  def describeSorted(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs: Seq[Column] = cols.flatMap { c =>
      val col_ = col(c).cast("double")
      Seq(
        count(col_).as(s"${c}__count"),
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}__null_count"),
        avg(col_).as(s"${c}__mean"),
        stddev_samp(col_).as(s"${c}__std"),
        min(col_).as(s"${c}__min"),
        max(col_).as(s"${c}__max"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*).collect().head
    val quantiles = cols.map(c =>
      c -> exactQuantilesSorted(df, c, Seq(0.25, 0.5, 0.75))).toMap
    val rows = cols.zipWithIndex.map { case (c, ci) =>
      val base = ci * 6
      def d(i: Int): Double =
        if (m.isNullAt(base + i)) Double.NaN
        else m.get(base + i) match {
          case l: java.lang.Long => l.toDouble
          case x: java.lang.Double => x
          case x => x.toString.toDouble
        }
      (c, d(0), d(1), d(2), d(3), d(4),
        quantiles(c)(0), quantiles(c)(1), quantiles(c)(2), d(5))
    }
    rows.toDF("metric", "count", "null_count", "mean", "std", "min",
      "p25", "p50", "p75", "max")
  }

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
