package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity
import graft.queries.Tables

/** Recall invariants of the approximate IVF k-NN join against the exact
  * cross-join baseline. The synthetic embeddings are near-uniform (no
  * cluster structure), which is the WORST case for IVF routing — distant
  * top-k neighbors sit in arbitrary buckets — so these tests pin the
  * invariants that hold regardless of data shape rather than a recall
  * level that only clustered data delivers.
  */
class AnnJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  lazy val emb = Tables.load(spark, dir, "embeddings").cache()
  lazy val cents = Similarity.centroids(emb, "label", "embedding")
  lazy val queries = emb.filter(col("vec_id") < 30)

  private def key(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  lazy val exact = key(Similarity.knnJoin(
    queries, emb, "vec_id", "vec_id", "embedding", 5))

  test("self-search rank 1 is always the query itself, at any probe count") {
    val ann = Similarity.annJoin(queries, emb, "vec_id", "vec_id",
      "embedding", cents, k = 5, probes = 1)
    val r1 = ann.filter(col("rank") === 1).collect()
    assert(r1.length == queries.count())
    r1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getDouble(2) == 1.0,
        s"query ${r.getLong(0)}: rank-1 is ${r.getLong(1)} @ ${r.getDouble(2)}")
    }
  }

  test("recall rises monotonically with probes and is exact when exhaustive") {
    val k = cents.count().toInt // codebook size = exhaustive probing
    var prev = -1.0
    for (p <- Seq(1, 3, 6, k)) {
      val got = key(Similarity.annJoin(queries, emb, "vec_id", "vec_id",
        "embedding", cents, k = 5, probes = p))
      val recall = (exact intersect got).size.toDouble / exact.size
      assert(recall >= prev, s"recall regressed at probes=$p: $recall < $prev")
      prev = recall
      if (p == k) assert(got == exact,
        s"exhaustive probing must equal the exact join (recall $recall)")
    }
  }

  test("trainCodebook: deterministic, k stable, objective non-decreasing") {
    def objective(cents: DataFrame): Double =
      Similarity.assignNearest(emb, cents
          .select(col("centroid_label"), col("cvec")), "vec_id", "embedding")
        .join(cents.withColumnRenamed("centroid_label", "assigned"),
          Seq("assigned"))
        .select(avg(Similarity.cosine(col("embedding"), col("cvec"))))
        .head().getDouble(0)
    val c0 = Similarity.trainCodebook(emb, "vec_id", "embedding", 8, iters = 0)
    val c3 = Similarity.trainCodebook(emb, "vec_id", "embedding", 8, iters = 3)
    assert(c0.count() == 8 && c3.count() == 8)
    assert(c3.select("centroid_label").collect().map(_.getInt(0)).sorted
      .sameElements(1 to 8))
    // Lloyd's iterations must not make the mean assigned-cosine worse
    // than the raw hash-sampled initialization
    assert(objective(c3) >= objective(c0) - 1e-9)
    // reruns produce the identical codebook (md5-seeded init, no RNG)
    val c3b = Similarity.trainCodebook(emb, "vec_id", "embedding", 8, iters = 3)
    val a = c3.orderBy("centroid_label").collect().map(_.getSeq[Double](1))
    val b = c3b.orderBy("centroid_label").collect().map(_.getSeq[Double](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
    // the trained codebook routes annJoin end-to-end (no labels needed)
    val ann = Similarity.annJoin(queries, emb, "vec_id", "vec_id",
      "embedding", c3.select(col("centroid_label"), col("cvec")), 3, 2)
    assert(ann.filter(col("rank") === 1).count() == queries.count())
  }

  test("trainCodebook scans the corpus exactly iters+3 times (flat lineage)") {
    // every row-read through the corpus ticks the accumulator, so
    // scans = value / rowcount; a lazily-folded Lloyd's loop would pay
    // O(iters²) scans instead of one per iteration. The constant is
    // iters + 3: seed selection costs the size bound (1 — skipped when
    // the caller passes knownN), the cutoff-realization count (1) and
    // the top-k itself (1) — the price of keeping the seed collect
    // k-scale instead of TakeOrderedAndProject's k × partitions rows
    // (a measured driver OOM at dedup-sized k), then one scan per
    // Lloyd's iteration.
    val scans = spark.sparkContext.longAccumulator("corpus-row-reads")
    val tick = udf { () => scans.add(1); true }.asNondeterministic()
    val n = emb.count()
    val counted = emb.filter(tick())
    val iters = 4
    Similarity.trainCodebook(counted, "vec_id", "embedding", 8, iters)
      .collect() // local rows — collecting the result must not rescan
    assert(scans.value <= n * (iters + 3),
      s"expected <= ${iters + 3} corpus scans, measured ${scans.value}/$n = " +
        s"${scans.value.toDouble / n}")
    assert(scans.value >= n * iters,
      s"implausibly few scans: ${scans.value}/$n")
  }

  test("IvfStore: partition-pruned search matches in-memory routing") {
    import graft.sources.IvfStore
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfStore.write(emb, cents, "vec_id", "embedding", path)
    val qv = emb.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    // driver-side probe routing must equal assignTopK for the same vector
    val buckets = IvfStore.probeBuckets(spark, path, qv, probes = 3)
    val expected = Similarity.assignTopK(
        emb.filter(col("vec_id") === 7), cents, "vec_id", "embedding", 3)
      .select("probe_buckets").head().getSeq[Any](0).map(_.toString)
    assert(buckets == expected)
    // search result equals brute-force top-k restricted to those buckets
    val got = IvfStore.search(spark, path, qv, "vec_id", "embedding",
      k = 5, probes = 3).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val routed = Similarity.assignNearest(emb, cents, "vec_id", "embedding")
      .filter(col("assigned").cast("string").isin(buckets: _*))
    val bf = Similarity.topKCosine(routed, "vec_id", "embedding", 7L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == bf.toSeq)
    // the bucket predicate must prune partitions at planning time
    val plan = IvfStore.search(spark, path, qv, "vec_id", "embedding", 5, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition pruning in:\n$plan")
  }

  test("trained k≈√n codebook lifts the candidate join's parallelism ceiling") {
    // the candidate join shuffles on the probe-bucket key, so its
    // max parallelism = distinct buckets actually hit: a fixed
    // 10-label codebook caps it at ≤10 tasks (skew magnet at scale);
    // the trained k≈√n codebook must spread candidates over more
    // buckets than that, with every bucket non-empty
    val n = emb.count()
    val k = Similarity.codebookSize(n)
    assert(k > 10, s"codebookSize($n) = $k not finer than the 10-label book")
    val trained = Similarity.trainCodebook(emb, "vec_id", "embedding", k)
    val routed = Similarity.assignTopK(emb, trained, "vec_id",
        "embedding", 2)
      .select(explode(col("probe_buckets")).as("bucket"))
    val hit = routed.distinct().count()
    assert(hit > 10 && hit <= k, s"only $hit distinct buckets hit (k=$k)")
    // and the blocked-dedup plan over it still contains no nested loop
    val plan = graft.functions.Dedup.cosineDupPairsBlocked(emb, trained,
        "vec_id", "embedding", 0.45, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in:\n$plan")
  }

  test("IvfStore.writeTrained: trained buckets survive the disk round-trip") {
    import graft.sources.IvfStore
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_t").toString
    val cents = IvfStore.writeTrained(emb, "vec_id", "embedding", path)
    val k = Similarity.codebookSize(emb.count())
    assert(cents.count() == k)
    // every corpus row landed in exactly one on-disk bucket
    val stored = spark.read.parquet(s"$path/data")
    assert(stored.count() == emb.count())
    val buckets = stored.select("bucket").distinct().count()
    assert(buckets > 10 && buckets <= k, s"$buckets buckets on disk")
    // search through the trained index still prunes partitions
    val qv = emb.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    val plan = IvfStore.search(spark, path, qv, "vec_id", "embedding", 5, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"))
  }

  test("IvfStore.append adds into buckets without rewrite; drift triggers retrain") {
    import graft.sources.IvfStore
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_a").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    IvfStore.writeTrained(base, "vec_id", "embedding", path)

    def dataFiles: Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
          .toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Nil
      walk(new java.io.File(s"$path/data")).toSet
    }
    val before = dataFiles
    val d0 = IvfStore.meanDrift(spark, path, "embedding")

    // same-distribution append: every original data file survives
    // untouched (no rewrite), counts add up, drift barely moves
    assert(IvfStore.append(batch, "vec_id", "embedding", path)
      == batch.count())
    val after = dataFiles
    assert(before.subsetOf(after) && after.size > before.size,
      "append must only ADD files inside bucket directories")
    assert(spark.read.parquet(s"$path/data").count() == emb.count())
    // an appended vector is findable through the pruned search path
    val qv = batch.select("embedding").head().getSeq[Float](0)
    val qid = batch.select("vec_id").head().getLong(0)
    val top = IvfStore.search(spark, path, qv, "vec_id", "embedding",
      k = 1, probes = 1).head()
    assert(top.getLong(0) == qid && top.getDouble(1) == 1.0)
    val d1 = IvfStore.meanDrift(spark, path, "embedding")

    // adversarial append (negated vectors) drags bucket means away
    // from their stored centroids — the staleness signal fires
    val neg = batch
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding",
        transform(col("embedding"), x => -x))
    assert(IvfStore.append(neg, "vec_id", "embedding", path)
      == batch.count())
    val d2 = IvfStore.meanDrift(spark, path, "embedding")
    assert(d2 > d1 && d2 > d0,
      s"negated batch must raise drift: d0=$d0 d1=$d1 d2=$d2")

    // retrain rebuilds at k≈√n on the CURRENT corpus and swaps in place
    IvfStore.retrain(spark, path, "vec_id", "embedding")
    val total = emb.count() + batch.count()
    assert(spark.read.parquet(s"$path/data").count() == total)
    val d3 = IvfStore.meanDrift(spark, path, "embedding")
    assert(d3 < d2, s"retrain must reduce drift: $d3 !< $d2")
    val plan = IvfStore.search(spark, path, qv, "vec_id", "embedding", 5, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"))

    // the one-call policy: below-trigger appends never rebuild,
    // above-trigger ones do
    val more = batch.withColumn("vec_id", col("vec_id") + 2000000L)
    assert(!IvfStore.appendOrRetrain(more, "vec_id", "embedding", path,
      driftTrigger = 0.9))
    val neg2 = neg.withColumn("vec_id", col("vec_id") + 3000000L)
    assert(IvfStore.appendOrRetrain(neg2, "vec_id", "embedding", path,
      driftTrigger = 1e-9))
  }

  test("every annJoin result row is a true cosine, never fabricated") {
    val got = key(Similarity.annJoin(queries, emb, "vec_id", "vec_id",
      "embedding", cents, k = 5, probes = 3))
    val truth = key(Similarity.knnJoin(queries, emb, "vec_id", "vec_id",
      "embedding", emb.count().toInt))
    // ranks differ (they are ranks within the probed subset) but every
    // (query, neighbor, cos) must appear in the full exact ranking
    val gotPairs = got.map { case (q, n, c, _) => (q, n, c) }
    val truthPairs = truth.map { case (q, n, c, _) => (q, n, c) }
    assert(gotPairs.subsetOf(truthPairs))
  }

  test("codebook ships by broadcast: plan size independent of k") {
    import spark.implicits._
    // 2048 centroids × 64 dims as inline literals would be ~130k literal
    // nodes of expression tree serialized into every task binary (the r3
    // 2 MB task-binary warning); the broadcast scorer keeps the plan at
    // a single expression node regardless of k
    val cents = (1 to 2048).map(i => (i, Seq.fill(64)(i.toDouble)))
      .toDF("centroid_label", "cvec")
    val assigned = Similarity.assignNearest(emb, cents, "vec_id", "embedding")
    val nLits = assigned.queryExecution.analyzed.expressions.map(
      _.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal => l
      }.size).sum
    assert(nLits < 50, s"$nLits literals in the plan — codebook inlined?")
    // and the big codebook still routes every vector
    assert(assigned.filter(col("assigned").isNull).count() == 0)
    val probed = Similarity.assignTopK(emb, cents, "vec_id", "embedding", 4)
      .select("probe_buckets").head().getSeq[Int](0)
    assert(probed.length == 4 && probed.distinct.length == 4)
  }

  test("randomProject: basis vectors read the sign matrix row exactly") {
    import spark.implicits._
    val m = Similarity.signMatrix(8, 4)
    val scale = 1.0 / math.sqrt(8.0)
    // e_2 picks column 2 of every sign row: proj_j = s_j2 / √8, with
    // the zero terms contributing exact ±0.0 through the fold
    val got = Similarity.randomProject(
        Seq((0L, Seq(0f, 0f, 1f, 0f))).toDF("id", "v"), "v", 4, 8)
      .select("proj").head().getSeq[Double](0)
    (0 until 8).foreach(j => assert(got(j) == m(j)(2) * scale))
    // a different salt draws a different matrix (decorrelated draws)
    assert(Similarity.signMatrix(8, 64).flatten.toSeq !=
      Similarity.signMatrix(8, 64, salt = "rp2").flatten.toSeq)
    // a dim mismatch RAISES instead of null-padding into silently
    // dropped rows; a null vector null-propagates
    intercept[Exception] {
      Similarity.randomProject(
          Seq((1L, Seq(1f, 2f))).toDF("id", "v"), "v", 4, 8)
        .collect()
    }
    assert(Similarity.randomProject(
        Seq((1L, null: Seq[Float])).toDF("id", "v"), "v", 4, 8)
      .select("proj").head().isNullAt(0))
  }

  test("randomProject composes with the IVF store unchanged") {
    import graft.sources.IvfStore
    val dir = java.nio.file.Files.createTempDirectory("graft_proj_ivf")
      .toString
    // project 64->16, then build and search the SAME on-disk ANN index
    // the full-dim path uses — the composition claim, executed
    val proj = Similarity.randomProject(emb, "embedding", 64, 16)
      .select(col("vec_id"), col("proj"))
    IvfStore.writeTrained(proj, "vec_id", "proj", dir, iters = 2)
    val got = IvfStore.search(spark, dir,
      proj.filter(col("vec_id") === 7L).select("proj").head()
        .getSeq[Double](0).map(_.toFloat),
      "vec_id", "proj", k = 5, probes = 64) // >= nBuckets: exhaustive
    val ids = got.select("vec_id").collect().map(_.getLong(0))
    assert(ids.length == 5 && ids.contains(7L))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("randomProject preserves cosine structure on real embeddings") {
    val sample = emb.filter(col("vec_id") < 60)
    val rows = Similarity.randomProject(sample, "embedding", 64, 32)
      .select("vec_id", "embedding", "proj").collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val pairs = for (i <- rows.indices; j <- rows.indices if i < j)
      yield (cos(rows(i)._1, rows(j)._1), cos(rows(i)._2, rows(j)._2))
    // Pearson correlation between original and projected pairwise
    // cosines: 64→32 sign projection keeps the similarity ORDERING
    // strongly intact (distortion ~1/√32); the bound is loose on
    // purpose — it must hold for any data shape, not this draw
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val r = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    assert(r > 0.5, s"cosine-structure correlation $r")
  }

  test("digit-string labels tie-break numerically in EVERY assignment path") {
    import spark.implicits._
    // two IDENTICAL centroids labeled "10" and "2": every vector ties
    // exactly. Native order says "2" < "10"; a lexicographic in-plan
    // sort would say "10" < "2" — all three paths must agree on "2".
    val vec = Seq(1.0, 0.0, 0.0)
    val cents = Seq(("10", vec), ("2", vec)).toDF("centroid_label", "cvec")
    val one = Seq((1L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.assignNearest(one, cents, "vec_id", "embedding")
      .select("assigned").head().get(0).toString == "2")
    val probed = Similarity.assignTopK(one, cents, "vec_id", "embedding", 2)
      .select("probe_buckets").head().getSeq[Any](0).map(_.toString)
    assert(probed == Seq("2", "10"), s"probe order $probed")
  }

  test("IvfStore.writeInt8: packs and probe lists round-trip the disk " +
      "bit-identically, and pairs-from-index == exact baseline") {
    import graft.sources.IvfStore
    import graft.functions.Dedup
    val base = java.nio.file.Files.createTempDirectory("graft_i8x").toString
    val trained = Similarity.trainCodebook(emb, "vec_id", "embedding",
      Similarity.codebookSize(emb.count()), 5)
    val p = math.min(20, trained.count().toInt)
    // build once, atomically; a second cachedBuild must NOT rebuild
    var builds = 0
    def build(): String = IvfStore.cachedBuild(spark, s"$base/idx",
        "data/_SUCCESS") { tmp =>
      builds += 1
      IvfStore.writeInt8(emb, trained, "vec_id", "embedding", tmp,
        maxProbes = p)
    }
    val path = build(); build()
    assert(builds == 1, s"cachedBuild rebuilt a published index: $builds")
    // field-wise pack comparison (Row.toString on binary prints array
    // identity — compare codes/cnorm/eps explicitly), plus the probe
    // list, against a freshly computed routing of the same corpus
    val fresh = Similarity.assignTopK(emb, trained, "vec_id", "embedding", p)
      .select(col("vec_id"),
        graft.expressions.Int8VecPack.int8_pack(col("embedding")).as("pk"),
        col("probe_buckets"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getStruct(1), r.getSeq[Any](2))))
      .toMap
    val stored = spark.read.parquet(s"$path/data")
      .select(col("vec_id"), col("int8_pack"), col("probe_buckets"))
      .collect()
    assert(stored.length == fresh.size)
    stored.foreach { r =>
      val (fp, fprobes) = fresh(r.getLong(0))
      val sp = r.getStruct(1)
      assert(java.util.Arrays.equals(sp.getAs[Array[Byte]](0),
        fp.getAs[Array[Byte]](0)), s"codes drifted for ${r.getLong(0)}")
      assert(sp.getDouble(1) == fp.getDouble(1) &&
        sp.getDouble(2) == fp.getDouble(2),
        s"cnorm/eps drifted for ${r.getLong(0)}")
      assert(r.getSeq[Any](2) == fprobes,
        s"probe list drifted for ${r.getLong(0)}")
    }
    // the fully-amortized pair path reproduces the exact O(n²) answer
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromIdx = Dedup.cosineDupPairsFromInt8Index(spark, path,
        "vec_id", "embedding", 0.4, probes = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromIdx == exact)
    // asking for deeper probes than the index stores must RAISE, not
    // silently lose recall
    intercept[IllegalArgumentException] {
      Dedup.cosineDupPairsFromInt8Index(spark, path, "vec_id",
        "embedding", 0.4, probes = p + 1)
    }
  }
}
