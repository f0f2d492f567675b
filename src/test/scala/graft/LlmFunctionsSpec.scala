package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.multimodal.Multimodal
import graft.queries.Tables

class LlmFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.load(spark, dir, "documents").cache()

  test("jaccard pairs find the planted near-duplicates") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8).collect()
    assert(pairs.length > 10)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.8))
  }

  test("prefix-filtered jaccard equals the direct self-join exactly") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = key(Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8))
    val prefix = key(Dedup.jaccardPairsPrefix(docs, "text", "doc_id", 3, 0.8))
    assert(direct == prefix && direct.nonEmpty)
    // the dispatcher picks a branch on measured candidate blowup; both
    // branches produce the identical result set
    val autoSmall = key(Dedup.jaccardPairsAuto(docs, "text", "doc_id", 3, 0.8))
    val autoPrefix = key(Dedup.jaccardPairsAuto(docs, "text", "doc_id", 3, 0.8,
      blowupLimit = 0.0))
    assert(autoSmall == direct && autoPrefix == direct)
    // this flat-frequency corpus sits well below the heavy-tail crossover
    // (C/S measured 2.1 at sf0.001-size, 10.7 at sf0.1), so auto must
    // pick the direct join here
    val blowup = Dedup.jaccardCandidateBlowup(docs, "text", "doc_id")
    assert(blowup > 0.0 && blowup < 32.0, s"blowup $blowup")

    // boilerplate appended to EVERY doc (the web-corpus shape) drives
    // the estimate over the crossover — the regime auto must route to
    // the df-ordered prefix filter, which keeps hot shingles out of
    // every prefix (and stays result-identical)
    val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
    val heavy = docs.select(col("doc_id"),
      concat(col("text"), lit(" " + boiler)).as("text"))
    val heavyBlowup = Dedup.jaccardCandidateBlowup(heavy, "text", "doc_id")
    assert(heavyBlowup > 32.0, s"heavy blowup $heavyBlowup")
    assert(key(Dedup.jaccardPairsAuto(heavy, "text", "doc_id", 3, 0.8)) ==
      key(Dedup.jaccardPairs(heavy, "text", "doc_id", 3, 0.8)))
  }

  test("density dispatch: dup-dense corpora route to direct past the " +
      "blowup crossover; sparse heavy-tail corpora still route to prefix") {
    // 25 identical replicas per doc: every shingle frequency ×25 puts
    // C/S far past the crossover, but most candidate pairs QUALIFY
    // (replica cliques) — the r6 regime where prefix lost to direct
    val dense = docs.crossJoin(spark.range(0, 25).toDF("r"))
      .selectExpr("doc_id * 100 + r AS doc_id", "text")
    assert(Dedup.jaccardCandidateBlowup(dense, "text", "doc_id") > 32.0)
    assert(Dedup.jaccardQualifyDensity(dense, "text", "doc_id") > 0.015)
    assert(!Dedup.jaccardAutoPicksPrefix(dense, "text", "doc_id", 3, 0.8,
      32.0, 0.015))
    // boilerplate on EVERY doc: same blowup signal, but pairs stay
    // below threshold — candidates prune, prefix is the right branch
    val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
    val heavy = docs.select(col("doc_id"),
      concat(col("text"), lit(" " + boiler)).as("text"))
    assert(Dedup.jaccardQualifyDensity(heavy, "text", "doc_id") < 0.015)
    assert(Dedup.jaccardAutoPicksPrefix(heavy, "text", "doc_id", 3, 0.8,
      32.0, 0.015))
  }

  test("dispatch probe density-leg guard (r9): a slice-degenerate " +
      "boilerplate shingle cannot make the PROBE quadratic, and the " +
      "decision stays prefix") {
    // 12k docs, every one carrying the same boilerplate trigrams: the
    // 1/16 probe slice holds ~750 occurrences of each — nearly 3× the
    // 256-frequency cap, so the ungated pair self-join would emit
    // ~750²/2 ≈ 280k probe pairs PER boilerplate shingle. The guard
    // cuts those shingles from the density leg only; blowup (the freq
    // leg) still sees them and screams, density measures the unique
    // remainder (≈ 0), and auto picks prefix — the pinned decision for
    // the boilerplate regime.
    val boiler = (1 to 8).map(i => s"boiler$i").mkString(" ")
    val degen = spark.range(0, 12000).selectExpr(
      "id AS doc_id",
      s"""concat('$boiler ', 'u', id, 'a u', id, 'b u', id, 'c u', id,
          'd u', id, 'e') AS text""")
    // the fixture provably crosses the cap on the slice the probe reads
    val sliceBoilerFreq = graft.functions.Dedup.docShingles(
        degen.filter(pmod(xxhash64(col("doc_id")), lit(16L)) === 0L),
        "text", "doc_id", 3)
      .filter(col("sh") === "boiler1 boiler2 boiler3")
      .count()
    assert(sliceBoilerFreq > Dedup.dispatchDensityFreqCap,
      s"fixture too small: slice freq $sliceBoilerFreq")
    val t0 = System.nanoTime()
    val (blowup, density) =
      Dedup.jaccardDispatchProbe(degen, "text", "doc_id", 3, 0.8)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(blowup > 32.0, s"blowup $blowup must still see the boilerplate")
    assert(density < 0.015, s"density $density")
    assert(Dedup.jaccardAutoPicksPrefix(degen, "text", "doc_id", 3, 0.8,
      32.0, 0.015))
    // generous wall bound — the point is sub-quadratic, not a race:
    // the ungated join's ~2.2M pair rows per 8 shared shingles would
    // blow far past this on the suite's 4-core session
    assert(secs < 30.0, s"dispatch probe took ${secs}s — the guard is off")
  }

  test("the fused dispatch probe runs ONE query execution (the r7 " +
      "dispatcher ran two) and agrees with the standalone estimators") {
    docs.count() // force the cache so no lazy action pollutes the count
    val refBlowup = Dedup.jaccardCandidateBlowup(docs, "text", "doc_id")
    val refDensity = Dedup.jaccardQualifyDensity(docs, "text", "doc_id")
    // count ACTIONS (query executions), not scheduler jobs — AQE
    // legitimately materializes each shuffle stage as its own job, so
    // job count measures the optimizer, not the dispatcher
    // count only PROBE executions: suites run in parallel in one JVM on
    // a shared session, so a concurrent suite's action (or a stale
    // async event from the reference actions above) would otherwise be
    // counted against the probe — observed as a 1-in-full-suite flake
    // (r13). The probe's fused plan is the only one carrying BOTH
    // union-leg markers; the r7 two-probe regression this spec guards
    // against would produce TWO such executions, so the guard's power
    // is unchanged.
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val p = qe.analyzed.toString
        if (p.contains("freq") && p.contains("dens")) execs.incrementAndGet()
        ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    // drain events already queued by the reference actions above so a
    // late-delivered marker-bearing event cannot leak in
    org.apache.spark.GraftListenerBridge
      .waitUntilListenerBusEmpty(spark.sparkContext)
    spark.listenerManager.register(listener)
    try {
      val (blowup, density) =
        Dedup.jaccardDispatchProbe(docs, "text", "doc_id", 3, 0.8)
      Thread.sleep(2000) // the listener bus delivers asynchronously
      assert(execs.get() == 1,
        s"dispatch probe ran ${execs.get()} query executions; the r7 " +
          "two-probe overhead is back")
      assert(math.abs(blowup - refBlowup) < 1e-9 &&
        math.abs(density - refDensity) < 1e-9,
        s"fused ($blowup, $density) != standalone ($refBlowup, $refDensity)")
    } finally spark.listenerManager.unregister(listener)
  }

  test("jaccardLosers equals the pair-derived loser set; identical docs " +
      "collapse through set-digest compression") {
    val pairLosers = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8)
      .select("b").distinct().collect().map(_.getLong(0)).toSet
    val losers = Dedup.jaccardLosers(docs, "text", "doc_id", 3, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(losers == pairLosers && losers.nonEmpty)
    val kept = Dedup.dropJaccardDups(docs, "text", "doc_id", 3, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- losers)

    // identical-text piles: 4 groups of 10 byte-identical docs, J = 1
    // within, J = 4/6 < 0.8 across — losers are exactly the 36 non-min
    // members, produced by the digest tier without any pair join
    val pile = spark.range(0, 40).selectExpr("id AS doc_id",
      "concat('alpha beta gamma delta epsilon zeta w', id % 4) AS text")
    val pileLosers = Dedup.jaccardLosers(pile, "text", "doc_id", 3, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(pileLosers == (4L until 40L).toSet)
    // both rep-join modes produce the identical loser set (the prefix
    // core is result-identical to the direct join by the PPJoin bound)
    val directMode = Dedup.jaccardLosers(docs, "text", "doc_id", 3, 0.8,
      mode = "direct").collect().map(_.getLong(0)).toSet
    val prefixMode = Dedup.jaccardLosers(docs, "text", "doc_id", 3, 0.8,
      mode = "prefix").collect().map(_.getLong(0)).toSet
    assert(directMode == prefixMode && directMode == losers)
    val pilePairLosers = Dedup.jaccardPairs(pile, "text", "doc_id", 3, 0.8)
      .select("b").distinct().collect().map(_.getLong(0)).toSet
    assert(pileLosers == pilePairLosers)
  }

  test("jaccard joins leave nothing cached and reuse the self-join exchange") {
    docs.count() // materialize the spec's own cache before the snapshot
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val direct = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8)
    direct.collect()
    // prefix path, opted OUT of shingle materialization: the pure
    // recompute contract must still hold for callers that need it
    Dedup.jaccardPairsPrefix(docs, "text", "doc_id", 3, 0.8,
      materializeShingles = false).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
    // default prefix path materializes EXACTLY ONE artifact — the
    // hashed shingle checkpoint feeding its four branches (reclaimed by
    // the ContextCleaner once the result is unreferenced)
    Dedup.jaccardPairsPrefix(docs, "text", "doc_id", 3, 0.8).collect()
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.size <= 1, s"expected at most the shingle checkpoint: $pinned")
    // identical subplans canonicalize to one Exchange. r14: the set
    // sizes ride per-row (no more count-over-Window-by-id), so at
    // broadcast scale there is NO exchange on either side — the cheap
    // double-compute is the intended small-corpus shape — and the
    // sharing contract lives where it matters: at SORT-MERGE scale the
    // join's own sh-keyed exchanges are identical subplans and must
    // reuse (pipeline computed once). Forced here by disabling
    // auto-broadcast; checked over a plain parquet scan, the shape the
    // bench/production path runs.
    // the prefix run's persisted shingle frame would otherwise be
    // CacheManager-substituted into the fresh plan below, breaking the
    // canonical equality between the self-join branches
    spark.catalog.clearCache()
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = Tables.load(spark, dir, "documents")
      val fresh = Dedup.jaccardPairs(plain, "text", "doc_id", 3, 0.8)
      fresh.collect()
      val plan = fresh.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange") || plan.contains("reused"),
        s"expected a reused exchange in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      docs.cache()
    }
  }

  test("minhash LSH candidates cover the high-jaccard pairs") {
    val jac = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.lshCandidatePairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // banding (4 bands × 2 rows) catches ~all >0.9 pairs
    val recall = jac.count(cand.contains).toDouble / math.max(1, jac.size)
    assert(recall >= 0.9, s"LSH recall $recall over ${jac.size} pairs")
  }

  test("simhash of near-duplicates is close in hamming distance") {
    val pair = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.95)
      .collect().head
    val sh = Dedup.simhash16(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ham = java.lang.Long.bitCount(sh(pair.getLong(0)) ^ sh(pair.getLong(1)))
    assert(ham <= 4, s"hamming $ham for a >0.95-jaccard pair")
  }

  test("simhash near-dup join equals brute force on both block layouts") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val m4 = key(Dedup.simhashNearDupPairs(docs, "text", "doc_id",
      maxHamming = 3, nBlocks = 4))
    val m8 = key(Dedup.simhashNearDupPairs(docs, "text", "doc_id",
      maxHamming = 3, nBlocks = 8))
    // brute-force O(n²) Hamming from the same fingerprint frame
    val fp = Dedup.simhash64Blocks(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (0 until 4).map(k => r.getLong(k + 1)))
    val brute = (for {
      (ia, a) <- fp; (ib, b) <- fp; if ia < ib
      ham = (0 until 4).map(k => java.lang.Long.bitCount(a(k) ^ b(k))).sum
      if ham <= 3
    } yield (ia, ib, ham)).toSet
    assert(brute.nonEmpty, "corpus has no close pairs — test is vacuous")
    assert(m4 == brute && m8 == brute)
    // pigeonhole preconditions are enforced, not silently recall-lossy
    intercept[IllegalArgumentException](
      Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        maxHamming = 4, nBlocks = 4))
    intercept[IllegalArgumentException](
      Dedup.simhashNearDupPairs(docs, "text", "doc_id", nBlocks = 5))
  }

  test("token entropy separates boilerplate from diverse text") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),    // 0 bits
      (2L, "a b c d e f g h"),                            // log2(8) = 3
      (3L, "the cat sat on the mat the end"))             // mixed
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.tokenEntropy(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - 3.0) < 1e-12)
    assert(got(3L) > 0.0 && got(3L) < 3.0)
  }

  test("text analysis columns are sane") {
    val row = docs.filter(col("doc_id") === 0).select(
      TextAnalysis.wsTokenCount(col("text")),
      TextAnalysis.stopwordRatio(col("text")),
      TextAnalysis.qualityScore(col("text")),
      TextAnalysis.langId(col("text"))).collect().head
    assert(row.getInt(0) > 0)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
    assert(TextAnalysis.langProfiles.map(_._1).contains(row.getString(3)))
  }

  test("topK cosine: query vector is its own best match") {
    val emb = Tables.load(spark, dir, "embeddings")
    val top = Similarity.topKCosine(emb, "vec_id", "embedding", 0L, 5).collect()
    assert(top.length == 5)
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("centroid assignment maps most vectors to their own label") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = Similarity.centroids(emb, "label", "embedding")
    assert(cents.count() == 10)
    val assigned = Similarity.assignNearest(emb, cents, "vec_id", "embedding")
    val agree = assigned.filter(col("label") === col("assigned")).count()
    val total = assigned.count()
    assert(total == emb.count())
    // synthetic labels are only weakly clustered: require clearly better
    // than the 1/10 random baseline rather than majority agreement
    assert(agree.toDouble / total > 0.25, s"$agree/$total label agreement")
  }

  test("blocked cosine dedup equals the exact all-pairs result set") {
    // the correctness gate runs at sf0.01 — verify recall-completeness at
    // BOTH scales so the declared blocked query provably hash-matches the
    // same oracle as the exact path. Two codebooks: the labeled one (r2
    // default) and the TRAINED bucket-pinned one the declared query now
    // uses. The r6 ASYMMETRIC residence×probe join needs roughly double
    // the probes of the old symmetric probe×probe join for the same
    // recall (one side only gets its top-1 bucket) in exchange for a
    // probes-fold candidate cut — labeled probes 4→8, trained 8→20, the
    // query defaults; near-uniform embeddings at the 0.45 radius remain
    // IVF's worst case (see Calibrate)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.load(spark, d, "embeddings")
      val cents = Similarity.centroids(emb, "label", "embedding")
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = key(Dedup.cosineDupPairsExact(
        emb, "vec_id", "embedding", 0.45))
      val blocked = key(Dedup.cosineDupPairsBlocked(
        emb, cents, "vec_id", "embedding", 0.45, probes = 8))
      assert(blocked == exact && exact.nonEmpty,
        s"$d: blocked ${blocked.size} vs exact ${exact.size}; " +
          s"missing ${(exact -- blocked).take(5)}")
      val trained = key(Dedup.cosineDupPairsTrained(
        emb, "vec_id", "embedding", 0.45, probes = 20))
      assert(trained == exact,
        s"$d: trained ${trained.size} vs exact ${exact.size}; " +
          s"missing ${(exact -- trained).take(5)}")
    }
  }

  test("bm25: hand-computed score, rare-term dominance, determinism") {
    import spark.implicits._
    import graft.functions.TextRetrieval
    val d = Seq(
      1L -> "spark spark engine",            // tf(spark)=2, len 3
      2L -> "spark rows",                    // tf(spark)=1, len 2
      3L -> "data only here",
      4L -> "nothing relevant at all")
      .toDF("doc_id", "text")
    val idx = TextRetrieval.buildBm25(d, "doc_id", "text")
    assert(idx.nDocs == 4 && idx.totalTokens == 12)
    val got = TextRetrieval.bm25Search(idx, Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-compute doc 1: idf = ln((4-2+0.5)/(2+0.5)) = 0 -> micro 0
    // (spark is in half the corpus: idf exactly ln(1)=0)
    assert(got == Map(1L -> 0L, 2L -> 0L))
    // a rarer term (df=1) scores positive and ranks its doc first
    val rare = TextRetrieval.bm25Search(idx, Seq("engine"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rare.head._1 == 1L && rare.head._2 > 0,
      s"rare-term ranking: ${rare.toSeq}")
    // multi-term queries sum terms: doc 2's rare 'rows' (df=1) term
    // outranks doc 1's zero-idf 'spark' terms
    val multi = TextRetrieval.bm25Search(idx, Seq("spark", "rows"), 10)
      .collect().map(_.getLong(0))
    assert(multi.head == 2L, s"got ${multi.toSeq}")
    // partitioning insensitivity
    val a = TextRetrieval.bm25Search(TextRetrieval.buildBm25(
      d.repartition(7), "doc_id", "text"), Seq("spark", "rows"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = TextRetrieval.bm25Search(TextRetrieval.buildBm25(
      d.coalesce(1), "doc_id", "text"), Seq("spark", "rows"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("repeatedKgramSpans: cross-doc, self-repetition, and merge cases") {
    import spark.implicits._
    val d = Seq(
      1L -> "p q r s t u v",          // shares "p q r" with doc 2
      2L -> "x y p q r z w",
      3L -> "m n o m n o m n o",      // pure self-repetition
      4L -> "entirely unique words here nothing repeats at all")
      .toDF("doc_id", "text")
    val got = Dedup.repeatedKgramSpans(d, "text", "doc_id", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    // docs 1/2: exactly the shared trigram -> one 3-token span each
    assert(got(1L) == ((1, 3, 7)) && got(2L) == ((1, 3, 7)))
    // doc 3: every trigram occurs twice+ -> starts 0..6 merge into ONE
    // span covering all 9 tokens (union = 3 + 6 * min(1,3))
    assert(got(3L) == ((1, 9, 9)))
    assert(got(4L) == ((0, 0, 8)))
    // a gap wider than k splits spans: plant two far-apart repeats
    val far = Seq(
      10L -> "a b c 1 2 3 4 5 6 7 8 9 a b c",
      11L -> "a b c q w e r t y u i o a b c")
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedKgramSpans(far, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(spans(10L) == 2 && spans(11L) == 2)
  }

  test("repeatedKgramSpans plans exactly ONE corpus k-gram explode " +
      "(r9: the window count shape — single branch, no join back)") {
    import spark.implicits._
    // the r7 shape persisted + joined back (cache spill at 5M docs);
    // the r8 shape recomputed the explode on both sides of the join
    // (AQE broadcast-converted the filtered hashes, so no exchange was
    // ever shared — a 3.7× sf0.1 regression). The r9 plan counts
    // per-hash occurrences with a WINDOW over the one position frame —
    // one branch, so the optimized LOGICAL plan structurally contains
    // exactly one PosExplode generator. A plan change that reintroduces
    // a fork (and with it the double-explode risk) fails here.
    val d = Seq(1L -> "p q r s t u v", 2L -> "x y p q r z w")
      .toDF("doc_id", "text")
    val qe = Dedup.repeatedKgramSpans(d, "text", "doc_id", k = 3)
      .queryExecution
    // the per-doc span frame persists (output-scale cache, shared by
    // measure/scrub/health), so the explode lives INSIDE the cached
    // subplan — count PosExplode across the outer plan and every
    // InMemoryRelation's cached physical plan
    val cached = qe.optimizedPlan.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        m.cachedPlan
    }
    val logicalPos = qe.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
          if g.generator.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.PosExplode] => g
    }.size
    // a cached plan under AQE is an unexecuted AdaptiveSparkPlanExec
    // (no children to collect over) — count generator lines in its
    // printed tree instead
    val cachedPos = cached.map(p =>
      "Generate posexplode".r.findAllIn(p.toString).size).sum
    assert(logicalPos + cachedPos == 1,
      s"expected ONE corpus k-gram posexplode, found " +
        s"$logicalPos logical + $cachedPos cached")
  }

  test("scrubRepeatedSpans removes exactly the covered tokens") {
    import spark.implicits._
    val d = Seq(
      1L -> "p q r s t u v",          // "p q r" shared with doc 2
      2L -> "x y p q r z w",
      3L -> "m n o m n o m n o",      // fully duplicated -> empty
      4L -> "all fresh tokens nothing here repeats")
      .toDF("doc_id", "text")
    val got = Dedup.scrubRepeatedSpans(d, "text", "doc_id", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got(1L) == (("s t u v", 3)))
    assert(got(2L) == (("x y z w", 3)))
    assert(got(3L) == (("", 9)))
    // span-free docs keep their text BYTE-identical, n_scrubbed 0
    assert(got(4L) == (("all fresh tokens nothing here repeats", 0)))
    // measure/act consistency: n_scrubbed equals the measure's
    // n_dup_tokens on every doc
    val measured = Dedup.repeatedKgramSpans(d, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got.map { case (id, (_, n)) => id -> n } == measured)
  }

  test("semanticDedup keeps one survivor per transitive cosine component") {
    import spark.implicits._
    // unit vectors at 0°, 40°, 80°, 170°: cos 40° ≈ 0.766 links adjacent
    // pairs, cos 80° ≈ 0.17 does NOT link the endpoints — the component
    // {5,2,9} exists only transitively; 7 is a singleton
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = Seq((5L, v(0)), (2L, v(40)), (9L, v(80)), (7L, v(170)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.7, exact = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    assert(got == Map(
      5L -> ((2L, 0)), 2L -> ((2L, 1)), 9L -> ((2L, 0)), 7L -> ((7L, 1))))
    // the trained (centroid-blocked) pair source reproduces the same
    // labeling: k = max(4, √4) buckets with probes clamped to k is
    // exhaustive routing — recall 1 by construction on this corpus
    val trained = Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    assert(trained == got)
  }

  test("semanticDedupWithCodebook == semanticDedup given the codebook " +
      "dupCodebook trains (the amortized path changes nothing)") {
    val emb = Tables.load(spark, dir, "embeddings")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val inQuery = key(Dedup.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.45))
    // training is deterministic, so a separately trained codebook is
    // the codebook the in-query path used — reuse MUST be a no-op on
    // the output (the whole point of persisting it via IvfStore)
    val cents = Dedup.dupCodebook(emb, "vec_id", "embedding")
    val amortized = key(Dedup.semanticDedupWithCodebook(emb, "vec_id",
      "embedding", threshold = 0.45, cents))
    assert(amortized == inQuery && inQuery.nonEmpty)
  }

  test("vector simhash: near-dup pairs land close in hamming distance") {
    val emb = Tables.load(spark, dir, "embeddings")
    val sig = Similarity.vectorSimhash(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig.size == emb.count())
    val dups = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.nonEmpty)
    // cos ≥ 0.45 ⇒ θ ≤ 63.3° ⇒ E[hamming] ≤ 16·θ/π ≈ 5.6; allow slack
    val hams = dups.map { case (a, b) =>
      java.lang.Long.bitCount(sig(a) ^ sig(b)) }
    assert(hams.forall(_ <= 10), s"hamming distances $hams")
    // random pairs average far higher (≈8 of 16 bits differ)
    val ids = sig.keys.toSeq.sorted.take(40)
    val rand = for (a <- ids; b <- ids if a < b)
      yield java.lang.Long.bitCount(sig(a) ^ sig(b))
    assert(rand.sum.toDouble / rand.size > 5.0)

    // short vectors degrade like the oracle's NULL-skipping list_sum:
    // missing dims contribute 0, so bit i = [sign(i,0) > 0] for a 1-dim
    // vector — never a silently zeroed signature
    import spark.implicits._
    val short = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.vectorSimhash(short, "vec_id", "embedding")
      .head().getLong(1)
    val expected = (0 until 16).map(i =>
      if (Similarity.hyperplaneSign(i, 0) > 0) 1L << i else 0L).sum
    assert(got == expected && got != 0L)
  }

  test("blocked dedup plans keyed joins only; exact path is the nested loop") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = Similarity.centroids(emb, "label", "embedding")
    val blockedPlan = Dedup.cosineDupPairsBlocked(
        emb, cents, "vec_id", "embedding", 0.45, 4)
      .queryExecution.executedPlan.toString
    // the whole point of blocking: every join is hash/sort-merge on a
    // key, never an O(n²) BroadcastNestedLoopJoin
    assert(!blockedPlan.contains("BroadcastNestedLoopJoin"),
      s"blocked path nested-loops:\n$blockedPlan")
    val exactPlan = Dedup.cosineDupPairsExact(
        emb, "vec_id", "embedding", 0.45)
      .queryExecution.executedPlan.toString
    // the O(n²) baseline surfaces as BroadcastNestedLoopJoin, or as
    // CartesianProduct when a prior suite disabled auto-broadcast on
    // the shared session — either is the nested loop this asserts
    assert(exactPlan.contains("BroadcastNestedLoopJoin") ||
        exactPlan.contains("CartesianProduct"),
      "exact baseline unexpectedly stopped nested-looping — revisit which " +
        "path is declared the fallback")
  }

  test("multi-probe routing: first probe bucket equals assignNearest") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = Similarity.centroids(emb, "label", "embedding")
    val near = Similarity.assignNearest(emb, cents, "vec_id", "embedding")
      .select("vec_id", "assigned").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val top = Similarity.assignTopK(emb, cents, "vec_id", "embedding", 3)
      .select(col("vec_id"), col("probe_buckets")).collect()
    top.foreach { r =>
      val buckets = r.getSeq[Any](1)
      assert(buckets.length == 3)
      assert(buckets.head == near(r.getLong(0)),
        s"vec ${r.getLong(0)}: probe head ${buckets.head} != nearest ${near(r.getLong(0))}")
    }
  }

  test("multimodal plumbing: media schema, batch features, frame sampling") {
    val media = Multimodal.asMedia(docs.limit(20), "doc_id", "text")
    assert(media.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val feats = Multimodal.extractFeatures(media)
    val r = feats.orderBy("media_id").collect().head
    assert(r.getInt(1) > 0)
    assert(r.getSeq[Float](2).length == 8)
    assert(r.getSeq[Float](2).forall(_ >= 0.0f))
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() > 0)
  }

  test("image headers: real encoder output decodes to true dimensions") {
    import graft.multimodal.ImageHeaders
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    // fixtures from the JDK's own encoders — real compressed bytes, not
    // hand-built headers, so the parser is checked against what actual
    // image files look like
    def encoded(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
      out.toByteArray
    }

    for ((fmt, w, h) <- Seq(("png", 31, 17), ("jpg", 640, 481),
        ("gif", 5, 9), ("bmp", 12, 3))) {
      val want = if (fmt == "jpg") "jpeg" else fmt
      assert(ImageHeaders.decode(encoded(w, h, fmt))
        .contains(ImageHeaders.ImageMeta(w, h, want)), s"format $fmt")
    }
    // corrupt / non-image payloads are opaque, never throw
    assert(ImageHeaders.decode(null).isEmpty)
    assert(ImageHeaders.decode("just some text".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaders.decode(encoded(8, 8, "png").take(10)).isEmpty)

    // and through the DataFrame path: asMedia parses headers per row
    val rows = Seq((1L, encoded(31, 17, "png")), (2L, encoded(7, 6, "jpg")),
      (3L, "not an image".getBytes("UTF-8")))
    val m = Multimodal.asMedia(
        spark.createDataFrame(rows).toDF("id", "data"), "id", "data")
      .orderBy("media_id").collect()
    assert(m(0).getString(2) == "image/png")
    assert(m(0).getStruct(3).getInt(0) == 31 &&
      m(0).getStruct(3).getInt(1) == 17 &&
      m(0).getStruct(3).getString(2) == "png")
    assert(m(1).getString(2) == "image/jpeg")
    assert(m(2).getString(2) == "application/octet-stream" && m(2).isNullAt(3))
  }

  test("real pixel decode: solid-color PNG yields its luma in every band") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val img = new BufferedImage(64, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64) img.setRGB(x, y, 0xff8800)
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val df = spark.createDataFrame(Seq((1L, out.toByteArray)))
      .toDF("id", "data")
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "id", "data")).collect().head
    // Rec.601 luma of #ff8800, normalized — every band sees the same color
    val want = (0xff * 299 + 0x88 * 587 + 0x00 * 114) / 1000.0 / 255.0
    val bands = feats.getSeq[Float](2)
    assert(bands.length == 8)
    bands.foreach(f => assert(math.abs(f - want) < 1e-3, s"band $f != $want"))
  }

  test("GIF decode bomb: frame-descriptor size is bounded, not the screen") {
    // logical screen 1×1 (the container header a naive guard trusts) but
    // an image descriptor of 20000×20000 — the raster ImageIO would
    // actually allocate (400 MP ≈ 1.6 GB ARGB). The guard must read the
    // CODEC's header dims and fall back to the byte-fold stub without
    // ever attempting the allocation.
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    u16(1); u16(1); out.write(0x00); out.write(0); out.write(0) // screen
    out.write(0x2c); u16(0); u16(0); u16(20000); u16(20000) // descriptor
    out.write(0x00) // no local color table
    out.write(2); out.write(0) // LZW min code size, empty data
    out.write(0x3b) // trailer
    val bomb = out.toByteArray
    val df = spark.createDataFrame(Seq((1L, bomb))).toDF("id", "data")
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "id", "data")).collect().head
    val acc = new Array[Long](8)
    bomb.indices.foreach(i => acc(i % 8) += bomb(i) & 0xff)
    val wantStub = acc.map(_.toFloat / 255.0f).toSeq
    assert(feats.getSeq[Float](2) == wantStub,
      "decode-bomb GIF did not fall back to the stub features")
  }

  test("audio headers: JDK-encoded WAV decodes to true format") {
    import javax.sound.sampled._
    import graft.multimodal.AudioHeaders
    val fmt = new AudioFormat(44100f, 16, 2, true, false)
    val pcm = new Array[Byte](44100 * 4 / 10) // 0.1 s of silence
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      fmt, pcm.length / fmt.getFrameSize)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val wav = out.toByteArray
    assert(AudioHeaders.decode(wav)
      .contains(AudioHeaders.AudioMeta(44100, 2, 16, 4410, "wav")))
    assert(AudioHeaders.decode("RIFFnope".getBytes("US-ASCII")).isEmpty)
    assert(AudioHeaders.decode(wav.take(30)).isEmpty)
    // crafted chunk size near Int.MaxValue must not overflow the cursor
    // into a negative index (returns None, never throws)
    val crafted = java.util.Arrays.copyOf(
      "RIFF    WAVEJUNK".getBytes("ISO-8859-1"), 44)
    crafted(16) = 0xec.toByte; crafted(17) = 0xff.toByte
    crafted(18) = 0xff.toByte; crafted(19) = 0x7f.toByte
    assert(AudioHeaders.decode(crafted).isEmpty)
    // and as a column over a binary payload frame
    val df = spark.createDataFrame(Seq((1L, wav), (2L, "text".getBytes)))
      .toDF("id", "data")
    val rows = df.select(col("id"),
      Multimodal.audioMeta(col("data")).as("am")).orderBy("id").collect()
    assert(rows(0).getStruct(1).getInt(0) == 44100 &&
      rows(0).getStruct(1).getInt(1) == 2)
    assert(rows(1).isNullAt(1))
  }
}
