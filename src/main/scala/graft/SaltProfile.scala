package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Max-task profile of the chunk-salted int8 candidate join on a
  * deliberately HOT-bucketed corpus (VERDICT r7 item 8's "show the
  * max task shrinking ∝ chunk count"): 60k vectors share ONE residence
  * bucket (anchor + 2σ noise — co-bucketed at cos ≈ 0.45 to the
  * anchor centroid, but pairwise cos ≈ 0.2, far BELOW the 0.9
  * threshold, so candidate work is hot while the answer stays tiny),
  * plus 20k background vectors across 15 far-away centroids. The join
  * runs twice — `chunkSize` huge (1 chunk: the salt degenerates to
  * bucket-only keying, all ~120k probe rows × 60k members of the hot
  * bucket land in ONE task) vs the 4096 default (≈15 chunks: the
  * salted (bucket, __chunk) exchange spreads them across reducers).
  * The codebook is HANDCRAFTED (anchor + 15 hash-random directions),
  * not trained — Lloyd's would split the pile across near-identical
  * centroids and dilute the very hotness under test. Prints per-run
  * wall clock and the longest single task (TaskEnd listener); total
  * work is identical, so max task should shrink ≈ chunk count.
  *
  *   runMain graft.SaltProfile
  */
object SaltProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Dedup
    def dirExpr(seed: String): String =
      s"""transform(sequence(0, 63), d -> cast(
          (pmod(xxhash64($seed, d, 7), 2001) - 1000) / 500.0 as float))"""
    val emb = spark.range(0, 80000).selectExpr(
        "id AS vec_id",
        s"""CASE WHEN id < 60000 THEN
            zip_with(${dirExpr("0L")},
              transform(sequence(0, 63), d -> cast(
                2.0 * (pmod(xxhash64(id, d, 8), 2001) - 1000) / 500.0
                as float)),
              (a, n) -> a + n)
          ELSE ${dirExpr("id")} END AS embedding""")
      .localCheckpoint(eager = true)
    // handcrafted codebook: centroid 1 = the pile anchor, 2..16 far
    // hash-random directions (expected pairwise cos ~ N(0, 1/8))
    val cents = spark.range(1, 17).selectExpr(
      "cast(id as int) AS centroid_label",
      s"""CASE WHEN id = 1 THEN
          transform(${dirExpr("0L")}, x -> cast(x as double))
        ELSE transform(${dirExpr("id * 1000000L")}, x -> cast(x as double))
        END AS cvec""")

    def run(label: String, chunkSize: Int): Unit = {
      var maxTaskMs = 0L
      var tasks = 0L
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          if (t.taskInfo != null) {
            tasks += 1
            maxTaskMs = math.max(maxTaskMs, t.taskInfo.duration)
          }
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = Dedup.cosineDupPairsBlockedInt8(emb, cents, "vec_id",
        "embedding", 0.9, probes = 2, chunkSize = chunkSize).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus drains asynchronously
      spark.sparkContext.removeSparkListener(l)
      println(f"[salt] $label%-28s pairs=$n%d wall=$wall%7.2fs " +
        f"maxTask=${maxTaskMs / 1000.0}%7.2fs tasks=$tasks%d")
    }
    run("unsalted (1 chunk)", 1 << 28)
    run("salted (4096/chunk, ~15)", 4096)
    spark.stop()
  }
}
