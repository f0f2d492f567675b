package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity}
import graft.sources.IvfStore
import graft.streaming.SarStreaming

/** Plan-shape contract of the streaming ingest micro-batch (r14 —
  * VERDICT r13 item 7: the streaming path had never been profiled or
  * plan-asserted). One epoch of the ingest screen must stay
  * DELTA-scale against a large index:
  *  - every read of the index `data` directory is partition-pruned
  *    (PartitionFilters on `bucket`) or column-pruned to the narrow
  *    probe columns — the full-index (id, embedding) scan must never
  *    appear in an epoch's plans;
  *  - the only per-epoch driver actions are delta-scale (the touched
  *    bucket set, the loser count) — asserted indirectly: the epoch's
  *    candidate-pair frame collects pairs, never corpus rows.
  * StreamingSpec pins the VALUES (stream == batch == exact oracle);
  * this spec pins the SHAPE the 100 TB contract depends on.
  */
class StreamPlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture(): (DataFrame, DataFrame) = {
    val emb = spark.range(0, 400).selectExpr("id AS vec_id").selectExpr(
      "vec_id",
      """transform(sequence(0, 15), d -> cast(
          (pmod(xxhash64(vec_id, d), 2001) - 1000) / 500.0 as float))
        AS embedding""")
    (emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1))
  }

  test("ingest epoch: index reads are partition- or column-pruned") {
    val (base, delta) = fixture()
    val (coarse, fine) = Similarity.trainShardedCodebook(base, "vec_id",
      "embedding", targetBucket = 32)
    val dir = Files.createTempDirectory("graft_planshape_ivf").toString
    IvfStore.writeShardedInt8(base, coarse, fine, "vec_id", "embedding",
      dir, pCoarse = coarse.count().toInt, pFine = 8, targetBucket = 32)
    val pairs = Dedup.cosineDupPairsDeltaIndexInt8(spark, dir, delta,
      "vec_id", "embedding", threshold = 0.9)
    pairs.collect() // execute so the adaptive plan is final
    val plan = pairs.queryExecution.executedPlan.toString
    // scan A / scan C: bucket-pruned reads of the data dir
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition-pruned index read in the epoch plan:\n$plan")
    // scan B reads the narrow probe columns only — no plan node may
    // scan the data dir with BOTH the embedding column and no bucket
    // partition filter (that would be the corpus-scale read the delta
    // screen exists to avoid). Each FileScan renders as ONE line in
    // toString, carrying Location + PartitionFilters + ReadSchema — a
    // single-line test, so a neighboring scan's fields cannot bleed in.
    val dataScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains(s"$dir/data"))
      .toSeq
    assert(dataScans.nonEmpty, s"no index data scans found in:\n$plan")
    val fullScan = dataScans.filter(l =>
      l.contains("embedding") && l.contains("PartitionFilters: []"))
    assert(fullScan.isEmpty,
      s"unpruned full-width index scan in epoch plan:\n${fullScan.mkString("\n")}")
  }

  test("batch frames handed to foreachBatch take the spread; streaming " +
      "frames pass through; the width decision is data-scaled") {
    val (base, _) = fixture()
    // a streaming frame passes through untouched
    val src = Files.createTempDirectory("graft_planshape_src").toString
    base.coalesce(1).write.mode("overwrite").parquet(src)
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(src).schema, src, Map.empty)
    assert(graft.functions.Spread.across(stream) eq stream,
      "streaming frames must pass through Spread untouched")
    // the width decision, at the bench session's shape (target = 32,
    // 128 MB splits, 32 KB/part default — the gate cannot fire live at
    // the suite's local[4], where scanTasks·4 >= 4 always):
    import graft.functions.Spread.spreadWidth
    val mb = 1L << 20
    // a single-split 600 KB corpus spreads to ~bytes/32 KB lanes
    assert(spreadWidth(BigInt(600 * 1024), 128 * mb, 32, 32768,
      perRowCorpusScaled = false) == Some(18))
    // tiny input: the 4·scanTasks floor keeps a genuine 4× spread
    assert(spreadWidth(BigInt(10 * 1024), 128 * mb, 32, 32768,
      perRowCorpusScaled = false) == Some(4))
    // per-row-corpus-scaled sites (pair scans) take full parallelism
    assert(spreadWidth(BigInt(600 * 1024), 128 * mb, 32, 32768,
      perRowCorpusScaled = true) == Some(32))
    // a corpus that already scans wide passes through (scale no-op)
    assert(spreadWidth(BigInt(2L * 1024 * mb), 128 * mb, 32, 32768,
      perRowCorpusScaled = false).isEmpty)
    // unknown stats (huge) pass through — the conservative direction
    assert(spreadWidth(BigInt(Long.MaxValue), 128 * mb, 32, 32768,
      perRowCorpusScaled = false).isEmpty)
  }
}
