package graft

import java.nio.file.{Files, Paths}

/** Parser throughput measurement: runMain graft.ParseBench <sar-file>
  * Runs the pure per-file fold (the same code the distributed path
  * executes per task) and reports rows + MB/s. */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val bytes = Files.size(Paths.get(path))
    val content = Files.readString(Paths.get(path))
    // warmup + 3 measured runs
    graft.ingest.SarTextParser.parseContent(content)
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val rows = graft.ingest.SarTextParser.parseContent(content)
      ((System.nanoTime() - t0) / 1e9, rows.length)
    }
    val best = times.map(_._1).min
    println(f"[parsebench] $path: ${times.head._2} rows, " +
      f"best ${best}%.2f s, ${bytes / 1e6 / best}%.1f MB/s")
  }
}
