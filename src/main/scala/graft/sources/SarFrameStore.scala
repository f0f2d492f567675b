package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialization layer for co-located (shuffle-free) joins at scale.
  *
  * At 100 TB the dominant cost of fact↔fact joins is the shuffle. Spark's
  * answer is bucketing: write both sides bucketed+sorted on the join key
  * and the sort-merge join reads co-located buckets with NO Exchange on
  * either side. This is what `repartition` can't give you across jobs —
  * bucketing persists the partitioning in the table layout. */
object SarFrameStore {

  /** Write a frame bucketed+sorted by `key` as a saved table (external at
    * `path` when given, else managed under the warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — plans with zero
    * Exchange when both sides share bucket count and key. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Skew-salted equi-join: replicate the (small-ish) right side
    * `salt`-fold and scatter the skewed left side across the replicas, so
    * one hot key spreads over `salt` tasks instead of one straggler.
    * Complements AQE's skew-join (which only splits post-shuffle
    * partitions of sort-merge joins); use this when a single key is so
    * hot that even a split partition is one reducer's worth of work. */
  def saltedJoin(bigSide: DataFrame, smallSide: DataFrame, key: String,
      salt: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val saltedLeft = bigSide.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedRight = smallSide.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
