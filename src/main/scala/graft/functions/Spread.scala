package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct,
  GlobalLimit, Join, RepartitionOperation, Sort, Window}

/** Scale-adaptive input spreading for per-row-expensive stages.
  *
  * A production corpus scans as thousands of splits, and [[across]] is
  * then a no-op; the pathological regime is the SMALL end: a sub-128 MB
  * parquet file plans as ONE scan task, so a per-row-heavy map stage
  * (shingle explodes, per-token hashing, O(n²) pair scoring) runs on a
  * single core regardless of session width — the optimization guide's
  * "input skew: one small/unsplittable file" case (§2.5), measured on
  * the oracle corpora as taskSum ≈ wall on a 32-core session (e.g. the
  * exact cosine pair baseline: 6.0 s wall, 5.8 s summed task time, one
  * task). The remedy is the guide's — repartition right after the read
  * — applied ONLY when it buys real parallelism (≥ 4× more partitions
  * than the scan would yield), so at scale nothing is added: an
  * unconditional round-robin repartition would be a full extra shuffle
  * of the corpus.
  *
  * The decision reads the OPTIMIZED LOGICAL plan, never `Dataset.rdd`:
  * materializing the RDD of an adaptive plan executes its upstream
  * query stages eagerly (measured: a probe on a windowed frame ran the
  * whole upstream once for the probe and again in the real query). Two
  * rules:
  *  - a frame whose plan already contains a shuffle-inducing operator
  *    (aggregate/join/window/sort/distinct/repartition/limit) passes
  *    through untouched — its rows already landed on
  *    `spark.sql.shuffle.partitions` reducers;
  *  - otherwise (scan-shaped: leaf + filter/project/union/explode) the
  *    scan's task count is estimated from the plan's size statistics
  *    over `spark.sql.files.maxPartitionBytes`, and the frame spreads
  *    iff that estimate is under a quarter of the session's default
  *    parallelism.
  *
  * Determinism: round-robin repartition sorts rows within each input
  * partition before assigning them (`sortBeforeRepartition`, on since
  * SPARK-23207), so the row→partition mapping is a pure function of
  * the input and retries/reruns see identical layouts. Callers remain
  * responsible for spreading only stages whose RESULTS are partition-
  * independent — per-row projections, integer/min/max/count
  * aggregates, sorted collects, order-free count-map merges — never
  * ahead of a floating-point SUM or a mergeable sketch, whose
  * partial-merge order would become nondeterministic.
  */
object Spread {

  /** `df` repartitioned to the session's default parallelism when it is
    * scan-shaped and its estimated scan yields less than a quarter of
    * that parallelism; `df` unchanged otherwise. Streaming frames pass
    * through untouched (foreachBatch hands callers BATCH frames, which
    * do take the spread). Purely plan-level — runs no job. */
  def across(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val spark = df.sparkSession
      val target = spark.sparkContext.defaultParallelism
      val plan = df.queryExecution.optimizedPlan
      val alreadyDistributed = plan.exists {
        case _: Aggregate | _: Join | _: Window | _: Sort | _: Distinct |
            _: RepartitionOperation | _: GlobalLimit => true
        case _ => false
      }
      if (alreadyDistributed) df
      else {
        val maxSplit = math.max(1L,
          spark.sessionState.conf.filesMaxPartitionBytes)
        val bytes = plan.stats.sizeInBytes
        // unknown stats default to Long.MaxValue-ish — treated as huge,
        // i.e. never spread (the conservative direction)
        val scanTasks = (bytes / maxSplit).min(BigInt(Int.MaxValue))
          .toLong.max(1L)
        if (scanTasks * 4 >= target) df else df.repartition(target)
      }
    }
}
