package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query profiling harness (optimization-guide §1: measure first).
  *
  * For each named query (or every registered query with `all`) it runs
  * one untimed warmup, then a timed run split into BUILD (the QueryDef
  * closure — includes any eager driver-side actions the query performs
  * while assembling its result frame: counts, codebook collects,
  * calibration reads) and EXEC (the noop-sink write of the returned
  * frame), with a listener accumulating job/stage counts, summed task
  * time, and shuffle bytes. `taskTime ≪ wall` is the smoking gun for
  * driver-side overhead (planning, codegen, job scheduling) rather
  * than data-path work — the dominant regime at oracle scale factors.
  *
  * Usage: runMain graft.QueryProfile <sfDir> (all | name [name ...])
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: QueryProfile <sfDir> (all | queryName [queryName ...])")
    val sfDir = args(0)
    val names =
      if (args(1) == "all") SparkEntry.all.map(_.name)
      else args.drop(1).toSeq
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_QPROF_JOBS=1 additionally prints one line per Spark
    // job (callsite, wall, summed task time, task count) — the drill-
    // down that locates WHICH action inside a multi-job query burns the
    // time the summary row reports.
    val perJob = sys.env.get("SPARK_GRAFT_QPROF_JOBS").contains("1")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val shufRead = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobTask = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) {
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobStart.put(j.jobId, (System.nanoTime(), site))
          j.stageIds.foreach(s => stageJob.put(s, j.jobId))
        }
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        if (perJob) {
          val (t0, site) = jobStart.getOrDefault(j.jobId, (0L, "?"))
          val (tt, nt) = jobTask.getOrDefault(j.jobId, (0L, 0L))
          if (t0 > 0)
            println(f"[qprof-job]   #${j.jobId}%-4d " +
              f"${(System.nanoTime() - t0) / 1e9}%7.2f s " +
              f"task ${tt / 1e3}%7.2f s  n=$nt%-5d $site%s")
        }
        ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          if (perJob) {
            val jid = stageJob.getOrDefault(sc.stageInfo.stageId, -1)
            if (jid >= 0) {
              jobTask.merge(jid,
                (m.executorRunTime, sc.stageInfo.numTasks.toLong),
                (a, b) => (a._1 + b._1, a._2 + b._2))
            }
          }
        }
        ()
      }
    })

    println("[qprof] query                              build   exec " +
      "jobs stages  taskSum  shufR_MB shufW_MB")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        // deterministic drain (r14, ADVICE r13): block until every
        // already-posted warmup/previous-query event is delivered
        // before resetting the counters — a fixed sleep raced late
        // events under load
        org.apache.spark.GraftBusBridge.waitUntilListenerBusEmpty(
          spark.sparkContext)
        jobs.set(0); stages.set(0); taskTimeMs.set(0)
        shufRead.set(0); shufWrite.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        // same deterministic drain before READING the counters, so the
        // timed query's own trailing events are all counted
        org.apache.spark.GraftBusBridge.waitUntilListenerBusEmpty(
          spark.sparkContext)
        println(f"[qprof] $name%-32s ${(t1 - t0) / 1e9}%7.2f" +
          f"${(t2 - t1) / 1e9}%7.2f ${jobs.get}%4d ${stages.get}%6d" +
          f" ${taskTimeMs.get / 1e3}%8.2f ${shufRead.get / 1e6}%9.2f" +
          f" ${shufWrite.get / 1e6}%8.2f")
      } catch { case e: Throwable =>
        println(s"[qprof] $name FAILED: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
