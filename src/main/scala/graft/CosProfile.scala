package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity}
object CosProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = t("count")(emb.count())
    val targetBucket = 128
    val k = math.max(Similarity.codebookSize(n),
      math.min(65536L, n / targetBucket).toInt)
    println(s"[prof] n=$n k=$k")
    val cents = t("trainCodebook")(
      { val c = Similarity.trainCodebook(emb, "vec_id", "embedding", k, 5,
          samplePerCentroid = 40, knownN = n); c.count(); c })
    val probes = math.min(20, k)
    val routed = Similarity.assignTopK(emb, cents, "vec_id", "embedding", probes)
      .select(col("vec_id").as("a"),
        posexplode(col("probe_buckets")).as(Seq("pos", "bucket")),
        col("embedding").as("__va"))
    t("route (n x k scores)")(
      routed.write.mode("overwrite").format("noop").save())
    val sizes = t("residence sizes")(
      routed.filter(col("pos") === 0).groupBy("bucket").count()
        .agg(max("count"), expr("percentile(count, 0.5)"),
          expr("percentile(count, 0.99)"), sum(expr("count*count")),
          count(lit(1))).head())
    println(s"[prof] bucket max/p50/p99/sumSq/nbuckets = $sizes")
    // probe-side rows per bucket
    val psz = routed.groupBy("bucket").count()
      .agg(max("count"), expr("percentile(count, 0.99)")).head()
    println(s"[prof] probe rows per bucket max/p99 = $psz")
    // candidate volume = sum over buckets probeRows*resSize
    val res = routed.filter(col("pos") === 0).groupBy("bucket")
      .agg(count(lit(1)).as("r"))
    val pro = routed.groupBy("bucket").agg(count(lit(1)).as("p"))
    val cand = res.join(pro, "bucket").agg(sum(col("r") * col("p"))).head()
    println(s"[prof] candidate volume = $cand")
    val pairs = t("full blocked join")(
      { val p = Dedup.cosineDupPairsBlocked(emb, cents, "vec_id", "embedding",
          0.45, probes); p.write.mode("overwrite").format("noop").save() })
    spark.stop()
  }
}
