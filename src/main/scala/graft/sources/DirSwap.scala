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
      fs.rename(aside, live) // roll back: the old data stays live
      throw new IllegalStateException(s"swap failed: $tmp -> $live")
    }
    fs.delete(aside, true)
  }
}
