package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity}

/** Calibration harness for the scale-path dispatch knobs (run by hand,
  * numbers land in NOTES_r*.md):
  *
  *   runMain graft.Calibrate blocked <sfDir>   — trained-codebook blocked
  *     dedup: recall + candidate-pair count per probe count, vs the
  *     labeled 10-centroid codebook and the exact O(n²) baseline.
  *   runMain graft.Calibrate jaccard <sfDir>   — direct vs prefix Jaccard
  *     join wall time on the documents corpus (the jaccardPairsAuto
  *     crossover evidence).
  */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "blocked" => blocked(spark, sfDir)
      case "jaccard" => jaccard(spark, sfDir)
      case "blowup" => blowup(spark, sfDir)
      case "heavy" => heavy(spark, sfDir)
      case "pq" => pq(spark, sfDir)
      case "sdc" => sdc(spark, sfDir)
      case "project" => project(spark, sfDir)
      case "clustered" => clustered(spark, sfDir,
        if (args.length > 2) args(2).toInt else 8,
        if (args.length > 3) args(3).toDouble else 0.8)
    }
    spark.stop()
  }

  /** Random-projection retrieval calibration: recall@10 of the
    * projected-cosine top-10 vs the exact top-10 for 20 queries, per
    * output dimension — the measured evidence behind randomProject's
    * "compose ANN on the projected column" claim (and behind
    * q_project_knn's documented worst-case overlap: the synthetic
    * embeddings are near-uniform, so these numbers are a FLOOR for
    * real clustered corpora). */
  def project(spark: SparkSession, sfDir: String): Unit = {
    val emb = graft.queries.Tables.load(spark, sfDir, "embeddings").cache()
    val queries = emb.filter(col("vec_id") < 20)
    // k+1 then drop self: the query ranks 1 in BOTH spaces (identical
    // vector → identical projection), so counting it would inflate
    // every recall by a tautological 1/k
    def topNoSelf(qs: DataFrame, corpus: DataFrame, vc: String) =
      Similarity.knnJoin(qs, corpus, "vec_id", "vec_id", vc, k = 11)
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(_._1).iterator.flatMap { case (_, rows) =>
          rows.sortBy(_._3).take(10).map(t => (t._1, t._2))
        }.toSet
    val exact = topNoSelf(queries, emb, "embedding")
    for (k <- Seq(8, 16, 32, 64)) {
      val pr = Similarity.randomProject(emb, "embedding", 64, k)
        .select(col("vec_id"), col("proj"))
      val got = topNoSelf(pr.filter(col("vec_id") < 20), pr, "proj")
      val recall = (exact intersect got).size.toDouble / exact.size
      println(f"[calibrate] project outDim=$k%2d " +
        f"neighbor-recall@10=$recall%.3f (self excluded)")
    }
  }

  /** SDC recall calibration: recall@5 of the code-to-code k-NN join vs
    * the exact join, plus the count of queries keeping themselves in
    * their top-5. Feeds the q_pq_sdc_recall floor. */
  def sdc(spark: SparkSession, sfDir: String): Unit = {
    import graft.functions.Quantize
    val emb = graft.queries.Tables.load(spark, sfDir, "embeddings").cache()
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 32, iters = 3)
    val codes = Quantize.pqEncode(emb, "embedding", cb)
      .select("vec_id", "pq_code").cache()
    codes.count()
    val q = codes.filter(col("vec_id") < 30)
    val got = Quantize.pqKnnJoin(q, codes, "vec_id", "vec_id",
        "pq_code", cb, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnJoin(emb.filter(col("vec_id") < 30), emb,
        "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    val selfIn = got.count { case (a, b) => a == b }
    println(f"[cal] n=${emb.count()} recall@5=$recall%.3f selfInTop5=$selfIn/30")
  }

  /** PQ recall calibration: for several query ids, recall@10 of the
    * ADC-shortlist + exact-rerank path vs exact top-10, plus the ADC
    * rank of the query itself (the self-in-shortlist margin), at two
    * shortlist sizes. Feeds the q_pq_search floor. */
  /** Recall calibration on the CLUSTERED corpus (Similarity.clusterPull
    * over the embeddings table): the mixture-of-Gaussians regime where
    * real recall is high, so the companion floors can be tight. Prints
    * PQ rerank recall@10, SDC recall@5, and projection overlap — the
    * numbers behind q_pq_search_clustered / q_sdc_clustered /
    * q_project_knn_clustered. */
  def clustered(spark: SparkSession, sfDir: String, nClusters: Int,
      w: Double): Unit = {
    import graft.functions.Quantize
    println(s"[cal] clustered nClusters=$nClusters w=$w")
    val emb = Similarity.clusterPull(
      graft.queries.Tables.load(spark, sfDir, "embeddings"),
      "vec_id", "embedding", nClusters, w).cache()
    val n = emb.count()
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 32, iters = 3)
    val codes = Quantize.pqEncode(emb, "embedding", cb)
      .select("vec_id", "pq_code").cache()
    codes.count()
    // PQ shortlist-100 rerank vs exact top-10
    for (qid <- Seq(0L, 3L, 7L, 11L)) {
      val qv = emb.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      val exact = Similarity.topKCosine(emb, "vec_id", "embedding", qid, 10)
        .collect().map(_.getLong(0)).toSet
      val got = Quantize.pqSearchRerank(emb, "vec_id", "embedding",
          codes, "pq_code", cb, qv, k = 10, shortlist = 100)
        .collect().map(_.getLong(0)).toSet
      val recall = (exact intersect got).size.toDouble / exact.size
      println(f"[cal] clustered pq qid=$qid recall@10=$recall%.2f")
    }
    // SDC code-to-code join vs exact join
    val q = codes.filter(col("vec_id") < 30)
    val gotS = Quantize.pqKnnJoin(q, codes, "vec_id", "vec_id",
        "pq_code", cb, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactS = Similarity.knnJoin(emb.filter(col("vec_id") < 30), emb,
        "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallS = (exactS intersect gotS).size.toDouble / exactS.size
    val selfIn = gotS.count { case (a, b) => a == b }
    println(f"[cal] clustered sdc n=$n recall@5=$recallS%.3f " +
      f"selfInTop5=$selfIn/30")
    // 64→16 projection neighbor overlap at 5 (self excluded): @5 stays
    // inside the co-member set — the tail past the cluster is random
    // ~0-cosine noise that no projection could rank stably
    def topNoSelf(qs: DataFrame, corpus: DataFrame, vc: String) =
      Similarity.knnJoin(qs, corpus, "vec_id", "vec_id", vc, k = 6)
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(_._1).iterator.flatMap { case (_, rows) =>
          rows.sortBy(_._3).take(5).map(t => (t._1, t._2))
        }.toSet
    val queries = emb.filter(col("vec_id") < 20)
    val exactP = topNoSelf(queries, emb, "embedding")
    val pr = Similarity.randomProject(emb, "embedding", 64, 16)
      .select(col("vec_id"), col("proj"))
    val gotP = topNoSelf(pr.filter(col("vec_id") < 20), pr, "proj")
    val recallP = (exactP intersect gotP).size.toDouble / exactP.size
    println(f"[cal] clustered project 64->16 overlap@5=$recallP%.3f")
  }

  def pq(spark: SparkSession, sfDir: String): Unit = {
    import graft.functions.Quantize
    val emb = graft.queries.Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val t0 = System.nanoTime()
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 32, iters = 3)
    val codes = Quantize.pqEncode(emb, "embedding", cb).cache()
    codes.count()
    println(f"[cal] n=$n train+encode=${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (qid <- Seq(0L, 3L, 7L, 11L); shortlist <- Seq(50, 100)) {
      val qv = emb.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      val exact = Similarity.topKCosine(emb, "vec_id", "embedding", qid, 10)
        .collect().map(_.getLong(0)).toSet
      val got = Quantize.pqSearchRerank(emb, "vec_id", "embedding",
          codes, "pq_code", cb, qv, k = 10, shortlist = shortlist)
        .collect().map(_.getLong(0)).toSet
      // indexOf yields -1 when absent; keep it -1 (never 0, which would
      // read as better-than-rank-1 in the calibration log)
      val selfIdx = Quantize.adcTopK(codes, "vec_id", "pq_code", cb,
          qv, n.toInt)
        .collect().map(_.getLong(0)).indexOf(qid)
      val adcRankSelf = if (selfIdx < 0) -1 else selfIdx + 1
      val recall = (exact intersect got).size.toDouble / exact.size
      println(f"[cal] qid=$qid short=$shortlist recall=$recall%.2f " +
        f"selfAdcRank=$adcRankSelf selfIn=${got.contains(qid)}")
    }
  }

  /** Heavy-tailed regime: the SAME boilerplate block appended to every
    * document (the web-corpus shape — headers, footers, license text)
    * makes each boilerplate shingle appear in all n docs, so the direct
    * self-join generates ~n² candidate rows PER hot shingle while true
    * near-dup pairs stay sparse. This is the regime the prefix filter
    * exists for — and the measured crossover evidence behind
    * jaccardPairsAuto's blowupLimit. */
  private def heavy(spark: SparkSession, sfDir: String): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
    val docs = base.select(col("doc_id"),
      concat(col("text"), lit(" " + boiler)).as("text"))
    val n = docs.count()
    val cs = Dedup.jaccardCandidateBlowup(docs, "text", "doc_id")
    println(f"[cal] heavy n=$n est_CS=$cs%.1f")
    for (i <- 1 to 2) {
      val (nd, td) = time {
        Dedup.jaccardPairs(docs, "text", "doc_id").count()
      }
      val (np, tp) = time {
        Dedup.jaccardPairsPrefix(docs, "text", "doc_id").count()
      }
      println(f"[cal] heavy n=$n run$i direct=$td%.2f s ($nd pairs) " +
        f"prefix=$tp%.2f s ($np pairs)")
    }
  }

  /** The doc-sampled C/S estimator vs the exact value — validates the
    * debiased estimate tracks truth on the shipped corpora. */
  private def blowup(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exactAgg = Dedup.docShingles(docs, "text", "doc_id")
      .groupBy("sh").agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("c2"))
      .head()
    val exact = exactAgg.getLong(1).toDouble / exactAgg.getLong(0)
    for (slices <- Seq(4, 16)) {
      val est = Dedup.jaccardCandidateBlowup(docs, "text", "doc_id",
        slices = slices)
      println(f"[cal] n=${docs.count()} exact_CS=$exact%.2f " +
        f"slices=$slices est_CS=$est%.2f")
    }
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def blocked(spark: SparkSession, sfDir: String): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val threshold = 0.45
    val (exact, tExact) = time {
      Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(f"[cal] n=$n exact_pairs=${exact.size} t=$tExact%.2f s")
    val k = Similarity.codebookSize(n)
    val trainedVariants = Seq(1, 2, 3, 5).map { iters =>
      val (c, tTrain) = time {
        val c0 = Similarity.trainCodebook(emb, "vec_id", "embedding", k,
          iters)
        c0.collect(); c0
      }
      println(f"[cal] trainCodebook k=$k iters=$iters t=$tTrain%.2f s")
      (c, s"trained${k}_i$iters", k)
    }
    val labeled = Similarity.centroids(emb, "label", "embedding")
    for ((cents, tag, kk) <- (labeled, "labeled10", 10) +: trainedVariants;
        probes <- Seq(1, 2, 3, 4, 6, 8).filter(_ <= kk)) {
      val routed = Similarity.assignTopK(emb, cents, "vec_id",
          "embedding", probes)
        .select(col("vec_id"), explode(col("probe_buckets")).as("bucket"))
      val nCand = routed.toDF("a", "bucket")
        .join(routed.toDF("b", "bucket"), Seq("bucket"))
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
      val (got, t) = time {
        Dedup.cosineDupPairsBlocked(emb, cents, "vec_id", "embedding",
            threshold, probes)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = (exact intersect got).size.toDouble / math.max(1, exact.size)
      println(f"[cal] $tag probes=$probes cand=$nCand " +
        f"pairs=${got.size}/${exact.size} recall=$recall%.3f t=$t%.2f s")
    }
  }

  private def jaccard(spark: SparkSession, sfDir: String): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = base.count()
    // scale the corpus by replication with shifted ids + a doc-unique
    // token appended (so replicas are not trivial duplicates but the
    // shingle-frequency shape is preserved) — crossover evidence beyond
    // the largest shipped SF
    for (mult <- Seq(1, 4, 16)) {
      val docs =
        if (mult == 1) base
        else (0 until mult).map { m =>
          base.select((col("doc_id") + lit(m.toLong * 1000000)).as("doc_id"),
            concat(col("text"), lit(s" replica$m "),
              col("doc_id").cast("string")).as("text"))
        }.reduce(_ unionByName _)
      val n = n0 * mult
      for (i <- 1 to 2) {
        val (nd, td) = time {
          Dedup.jaccardPairs(docs, "text", "doc_id").count()
        }
        val (np, tp) = time {
          Dedup.jaccardPairsPrefix(docs, "text", "doc_id").count()
        }
        println(f"[cal] docs=$n run$i direct=$td%.2f s ($nd pairs) " +
          f"prefix=$tp%.2f s ($np pairs)")
      }
    }
  }
}
