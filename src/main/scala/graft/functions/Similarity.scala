package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine is the exact baseline: a broadcast of the query
  * vector + one codegen'd scan — no shuffle at all, scales linearly with
  * executors. The scale path for query *sets* is `assignNearest` /
  * LSH-style bucketing (centroid assignment = one IVF routing step):
  * centroids are tiny (k × dim), always broadcast, so the only shuffle is
  * the k×dim centroid aggregation itself.
  */
object Similarity {

  /** Element-wise ops via sequential fold — deterministic summation order,
    * so results are reproducible across partitionings and engines. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (taken from the row
    * with `queryId`). Deterministic: ordered by rounded similarity with id
    * tie-break. */
  def topKCosine(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    df.crossJoin(broadcast(q))
      .select(col(idCol),
        round(cosine(col(vecCol), col("__qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Element-wise mean vector per label (the IVF coarse codebook). */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("v").cast("double")).as("cv"))
      .groupBy(col(labelCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pc"))
      .select(col(labelCol).as("centroid_label"),
        transform(col("pc"), _.getField("cv")).as("cvec"))

  /** Assign every vector to its nearest centroid by cosine (deterministic
    * tie-break on centroid label). Centroids are broadcast. */
  def assignNearest(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val scored = df.crossJoin(broadcast(cents))
      .withColumn("__cos", round(cosine(col(vecCol), col("cvec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("centroid_label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumnRenamed("centroid_label", "assigned")
      .drop("__rn", "cvec")
  }
}
