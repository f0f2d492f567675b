package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Crash-safe live-directory replacement — the ONE copy of the
  * two-rename swap shared by [[IvfStore.retrain]],
  * [[DedupLedger.compact]], and [[NearDupLedger.compact]]: a rebuilt
  * dataset is written ASIDE first, then live→aside, tmp→live, delete
  * aside — so a complete copy of the data exists at every instant (a
  * delete-then-rename would leave a crash window with no copy at all).
  * A failed second rename rolls the aside back, keeping the old data
  * live. Rename is atomic per path on HDFS and local FS alike. */
private[sources] object DirSwap {

  /** Replace `live` with `tmp`, staging the old copy at `aside`. */
  def swapLive(conf: Configuration, live: Path, tmp: Path,
      aside: Path): Unit = {
    val fs = live.getFileSystem(conf)
    fs.delete(aside, true) // leftover from an earlier crashed swap
    require(fs.rename(live, aside), s"swap failed: $live -> $aside")
    if (!fs.rename(tmp, live)) {
      // Roll back so the old data stays live. If the rollback itself
      // fails, `live` is missing — tell the operator exactly where the
      // intact staged copy sits so they can restore it by hand.
      if (fs.rename(aside, live))
        throw new IllegalStateException(s"swap failed: $tmp -> $live")
      else
        throw new IllegalStateException(
          s"swap failed: $tmp -> $live, AND rollback $aside -> $live " +
            s"failed; $live is missing — restore the staged copy at $aside")
    }
    fs.delete(aside, true)
  }
}

/** Eager lineage truncation before a store mutates: reliable checkpoint
  * when a checkpoint dir is configured (the cluster deployment),
  * localCheckpoint otherwise. ONE copy of the idiom shared by both
  * ledgers' `append` and `CorpusIngest.ingest` — the refreshByPath
  * lesson those call sites document. */
private[sources] object Lineage {
  def truncated(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (spark.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
