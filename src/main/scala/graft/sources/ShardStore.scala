package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Curation

/** Training-shard store — the on-disk endpoint of
  * [[Curation.packShards]]: the curated corpus written as contiguous
  * token-budget shards, one directory (and one parquet file) per shard,
  * so a training job streams `shard=N` directories in order and every
  * shard holds ~`shardTokens` tokens. The deterministic (md5(id), id)
  * pack order means re-running the writer on the same corpus produces
  * byte-identical shard membership — resumable pipelines re-derive,
  * never diff.
  *
  * Layout: `<path>/shard=<n>/part-*.parquet`. Shard values are dense
  * longs from 0 (no leading-zero partition-inference hazard — unlike
  * hex buckets they round-trip as integers). The pre-write
  * `repartition(shard)` hash-routes each shard's rows to exactly one
  * task, so each directory receives exactly ONE file — file count ∝
  * shards, the property a 100k-shard corpus needs (a naive write from
  * 32 tasks would strand tasks × shards files).
  */
object ShardStore {

  /** Pack `docs` into token-budget shards and write them partitioned by
    * shard id. Returns the shard count — read from the written
    * directory listing (one driver-side FS call, no extra Spark job,
    * and 0 for an empty corpus instead of a schema-inference crash). */
  def write(docs: DataFrame, idCol: String, textCol: String,
      path: String, shardTokens: Long): Long = {
    val packed = Curation.packShards(docs, idCol, textCol, shardTokens)
    packed
      .repartition(col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
    val spark = packed.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).count(st =>
      st.isDirectory && st.getPath.getName.startsWith("shard=")).toLong
  }

  /** Read the shard store back (all shards, or one via
    * `spark.read.parquet(s"$path/shard=$n")` — partition pruning makes
    * a `filter(col("shard") === n)` over this equivalent). The shard
    * column is cast back to long: partition-value inference narrows
    * small values to int, and readers should see the writer's schema. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.withColumn("shard", col("shard").cast("long"))
  }
}
