package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** A/B for the r10 BATCHED cell-matrix routing (VERDICT r9 item 4):
  * runs the in-query sharded dedup twice over the same corpus and the
  * same pre-trained codebooks — once with the legacy per-row routing
  * join (probeBatch = 0: every joined probe row materializes its
  * cell's whole packed fine matrix) and once with the batched shape
  * (probeBatch = 1024: one matrix per ~1024-probe batch) — and reports
  * wall time, the SHUFFLE WRITE BYTES each variant moved (the
  * bytes-per-row claim, measured at the source: stage-aggregated
  * task metrics), and whether the two pair sets hash-match (they must:
  * batching regroups the work, never changes it).
  *
  * Codebooks are trained ONCE and shared so the A/B isolates the
  * routing-join shape. Settings mirror the oracle-exhaustive sharded
  * declaration (pCoarse=8, pFine=64, threshold 0.45) — the heaviest
  * registered sharded chain, where the matrix constant matters most.
  *
  *   runMain graft.ShardBatchProfile <outJson> <scaleDir>
  */
object ShardBatchProfile {
  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    val dir = args(1)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    if (!sys.env.contains("SPARK_GRAFT_INITIAL_PARTITIONS"))
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", 256)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val (coarse, fine) = graft.functions.Similarity
      .trainShardedCodebook(emb, "vec_id", "embedding")
    coarse.persist(); coarse.count()
    fine.persist(); fine.count()

    /** (seconds, shuffleWriteBytes, xor-hash of the pair set). The
      * byte counter reads with a settle loop after each run because
      * listener events drain asynchronously. */
    def run(probeBatch: Int): (Double, Long, Long) = {
      val before = shuffleBytes.get()
      val t0 = System.nanoTime()
      val h = graft.functions.Dedup.cosineDupPairsShardedInt8(emb, coarse,
          fine, "vec_id", "embedding", threshold = 0.45, pCoarse = 8,
          pFine = 64, probeBatch = probeBatch)
        .agg(count(lit(1)), expr("bit_xor(xxhash64(a, b, cos))")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before reading
      var last = -1L
      var now = shuffleBytes.get()
      while (now != last) { last = now; Thread.sleep(300); now = shuffleBytes.get() }
      val pairHash = h.getLong(0) ^ (if (h.isNullAt(1)) 0L else h.getLong(1))
      // reclaim the run's shuffle files before the next one starts:
      // each exhaustive-probe campaign writes ~50 GB of shuffle at the
      // 500k tier (see SCALE_r10_batch.json's shuffle_write_bytes), and
      // without a GC the ShuffleDependencys stay reachable until the
      // JVM exits — accumulated runs filled the sandbox disk (measured
      // ENOSPC). Same discipline as KneeBench/ScaleBench; the sleep
      // gives the async ContextCleaner time to unlink.
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(5000)
      (secs, now - before, pairHash)
    }

    run(1024) // warmup: codegen + file listing, untimed
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt
    def best(pb: Int): (Double, Long, Long) = {
      val all = (0 until runs).map(_ => run(pb))
      (all.map(_._1).min, all.map(_._2).min, all.head._3)
    }
    val (tBatch, bBatch, hBatch) = best(1024)
    val (tRow, bRow, hRow) = best(0)
    val matches = hBatch == hRow
    val violations = if (matches) Seq.empty[String]
      else Seq("batched-vs-per-row pair sets diverge")
    val json = s"""{
  ${BenchUtil.commitJsonFields()},
  "chain": "cosineDupPairsShardedInt8 pCoarse=8 pFine=64 (shared codebooks)",
  "dir": "$dir",
  "per_row":  {"secs": ${f"$tRow%.3f"}, "shuffle_write_bytes": $bRow},
  "batched":  {"secs": ${f"$tBatch%.3f"}, "shuffle_write_bytes": $bBatch},
  "shuffle_bytes_ratio": ${f"${bRow.toDouble / math.max(1L, bBatch)}%.2f"},
  "hash_match": $matches,
  "contract_violations": ${violations.map(n => s""""$n"""")
        .mkString("[", ",", "]")}
}
"""
    Files.writeString(Paths.get(outJson), json)
    println(s"[shardbatch] wrote $outJson; per_row ${f"$tRow%.1f"}s/" +
      s"${bRow / (1 << 20)}MiB vs batched ${f"$tBatch%.1f"}s/" +
      s"${bBatch / (1 << 20)}MiB; hash_match=$matches")
    spark.stop()
    if (!matches) sys.exit(2)
  }
}
