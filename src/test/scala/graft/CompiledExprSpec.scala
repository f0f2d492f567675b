package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{BucketCosineHits, CharClassMissCount}
import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.queries.Tables

/** Semantics pins for the two compiled hot-loop expressions added in
  * round 6: BucketCosineHits must equal the
  * `round(cosine_native, 4) >= threshold` filter it replaces, and
  * CharClassMissCount must equal the `regexp_count(text, "[^…]")` it
  * replaces — on exactly the inputs where a hand-rolled loop tends to
  * diverge from the built-in (unicode width, astral codepoints, nulls,
  * dimension mismatches, rounding boundaries).
  */
class CompiledExprSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder(cores = 4).getOrCreate()

  // ---------------------------------------------------------------- text
  test("char_class_miss_count == regexp_count on ascii/unicode/astral") {
    import spark.implicits._
    val allowed =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 "
    val rows = Seq(
      "plain ascii words 123",
      "punct, lots; of. it!",
      "",
      "    ",
      "中文字符都算 miss",          // CJK: every non-space char is a miss
      "emoji 😀 one",     // astral: ONE miss, not two UTF-16 units
      "mixed ümläuts & dashes—here",
      "\ttab\nnewline")
    val df = rows.toDF("t")
    val out = df.select(
      CharClassMissCount.char_class_miss_count(col("t"), allowed)
        .as("fast"),
      regexp_count(col("t"), lit("[^A-Za-z0-9 ]")).as("regex"))
    assert(out.filter(col("fast") =!= col("regex")).count() == 0,
      out.collect().mkString("\n"))
  }

  test("char_class_miss_count: null in, null out; non-ascii set rejected") {
    import spark.implicits._
    val df = Seq(Option.empty[String], Some("a.b")).toDF("t")
    val out = df.select(CharClassMissCount
      .char_class_miss_count(col("t"), "ab").as("c")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getInt(0) == 1) // '.'
    val bad = intercept[Exception] {
      Seq("x").toDF("t").select(CharClassMissCount
        .char_class_miss_count(col("t"), "aé")).collect()
    }
    assert(bad.getMessage.contains("ASCII"))
  }

  test("punctRatio (compiled) matches the regex formulation corpus-wide") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val regexRatio = when(length(col("text")) > 0,
      regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("double") /
        length(col("text")).cast("double")).otherwise(lit(0.0))
    val diff = docs.select(
        TextAnalysis.punctRatio(col("text")).as("fast"),
        regexRatio.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
  }

  // ------------------------------------------------------------- vectors
  test("bucket_cosine_hits == round(cosine,4) threshold filter, with " +
      "rounding-boundary, mismatched-dim and null members") {
    import spark.implicits._
    // member 20 sits exactly on the .44995 boundary relative to the
    // query: cos = 0.44995… must round HALF_UP to 0.45 and survive
    val q = Seq(1.0f, 0.0f)
    def atCos(c: Double): Seq[Float] =
      Seq(c.toFloat, math.sqrt(1 - c * c).toFloat)
    val members = Seq(
      (10L, atCos(0.9)),            // clear hit
      (20L, atCos(0.449951)),       // rounds up to 0.45 → hit
      (30L, atCos(0.4494)),         // rounds to 0.4494 → miss
      (40L, atCos(-0.2)),           // miss
      (50L, Seq(1.0f, 0.0f, 0.0f)), // dim mismatch → dropped
      (60L, Seq(0.0f, 0.0f)))       // zero norm → dropped
    val df = Seq((q, members)).toDF("q", "members")
    val hits = df.select(explode(BucketCosineHits
        .bucket_cosine_hits(col("q"), col("members"), 0.45)).as("h"))
      .select(col("h.id"), col("h.cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(hits.keySet == Set(10L, 20L))
    assert(hits(20L) == 0.45)
    // null query / null members → empty array, no rows
    val nulls = Seq((Option.empty[Seq[Float]], Option(members)),
        (Option(q), Option.empty[Seq[(Long, Seq[Float])]]))
      .toDF("q", "members")
    assert(nulls.select(explode(BucketCosineHits
      .bucket_cosine_hits(col("q"), col("members"), 0.0))).count() == 0)
  }

  test("blocked pair set == exact baseline on the sf0.001 corpus " +
      "(compiled loop end to end; float variant AND the int8 default)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Dedup
      .cosineDupPairsTrainedFloat(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked == exact)
    // the API default (int8 alias since the r8 flip) returns the same set
    val dflt = Dedup
      .cosineDupPairsTrained(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(dflt == exact)
  }

  test("hierarchical routing + chunked packing: blocked pairs == exact " +
      "baseline with the two-level path and chunk splitting forced on") {
    val old = Similarity.hierarchicalRoutingThreshold
    try {
      // k = 512 ≥ threshold 64 → every assignNearest/assignTopK in
      // training AND search runs the coarse-cell candidate selection;
      // chunkSize = 2 splits essentially every residence bucket into
      // member chunks — both scale paths exercised on a corpus small
      // enough to compare against the O(n²) exact join
      Similarity.hierarchicalRoutingThreshold = 64
      // 2000 vectors, dim 64, uniform-ish hash components in [−2, 2];
      // every 20th vector is a near-copy of its predecessor (±0.01
      // noise → cos ≈ 0.9999). Random pairs concentrate near 0 with
      // σ ≈ 1/√64, so nothing incidental reaches the 0.9 threshold —
      // the planted 100 pairs are the exact answer.
      val emb = spark.range(0, 2000).selectExpr(
          "id AS vec_id",
          "if(id % 20 = 19, id - 1, id) AS sid")
        .selectExpr("vec_id",
          """transform(sequence(0, 63), d -> cast(
              (pmod(xxhash64(sid, d, 7), 2001) - 1000) / 500.0
              + if(vec_id % 20 = 19,
                  (pmod(xxhash64(vec_id, d, 8), 21) - 10) / 1000.0, 0.0)
            as float)) AS embedding""")
      val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val cents = Similarity.trainCodebook(emb, "vec_id", "embedding",
        512, 2)
      val blocked = Dedup.cosineDupPairsBlocked(emb, cents, "vec_id",
          "embedding", 0.9, probes = 8, chunkSize = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(exact.size == 100, s"expected the 100 planted pairs: ${exact.size}")
      assert(blocked == exact)
    } finally Similarity.hierarchicalRoutingThreshold = old
  }

  test("sampled codebook training: deterministic, and bit-identical to " +
      "full training when the corpus fits the cap") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    // cap >= n → the sample IS the corpus → identical codebook
    val full = Similarity.trainCodebook(emb, "vec_id", "embedding", 5, 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    val capped = Similarity.trainCodebook(emb, "vec_id", "embedding", 5, 2,
        samplePerCentroid = math.ceil(n.toDouble / 5).toInt + 1)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    assert(full == capped)
    // cap < n → a real subsample: still k centroids, and two runs agree
    val s1 = Similarity.trainCodebook(emb, "vec_id", "embedding", 5, 2,
      samplePerCentroid = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    val s2 = Similarity.trainCodebook(emb, "vec_id", "embedding", 5, 2,
      samplePerCentroid = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    assert(s1 == s2 && s1.size == 5)
  }

  // --------------------------------------------- int8 two-phase dedup
  test("int8 pack: codes within half a scale step, cnorm exact, eps " +
      "bounds the true quantized-cosine error") {
    val rows = spark.range(0, 300).selectExpr("id",
        """transform(sequence(0, 31), d -> cast(
            (pmod(xxhash64(id, d, 3), 2001) - 1000) / 400.0 as float))
           AS v""")
      .select(col("id"), col("v"),
        graft.expressions.Int8VecPack.int8_pack(col("v")).as("p"))
      .collect()
      .map { r =>
        val p = r.getAs[org.apache.spark.sql.Row]("p")
        (r.getSeq[Float](1).map(_.toDouble).toArray,
          p.getAs[Array[Byte]]("codes"),
          p.getAs[Double]("cnorm"), p.getAs[Double]("eps"))
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    rows.foreach { case (v, c, cn, eps) =>
      val s = v.map(math.abs).max / 127.0
      assert(s > 0.0)
      v.indices.foreach { i =>
        assert(math.abs(v(i) - s * c(i)) <= s / 2 + 1e-12) }
      assert(math.abs(cn - math.sqrt(c.map(x => x * x.toDouble).sum))
        <= 1e-9)
      assert(eps >= 0.0 && eps < 0.2)
    }
    // the load-bearing claim: |cos(x,y) − cos(cx,cy)| ≤ eps_x + eps_y
    // on every consecutive pair of the corpus
    rows.sliding(2).foreach { case Array((vx, cx, nx, ex), (vy, cy, ny, ey)) =>
      val exact = cos(vx, vy)
      var dot = 0L
      cx.indices.foreach(i => dot += cx(i).toLong * cy(i).toLong)
      val qcos = dot.toDouble / (nx * ny)
      assert(math.abs(exact - qcos) <= ex + ey + 1e-12,
        s"err ${math.abs(exact - qcos)} > bound ${ex + ey}")
    case _ => ()
    }
  }

  test("int8 two-phase == exact on coarse 2-d unit vectors — the margin " +
      "is load-bearing (single bucket, boundary cosines)") {
    // dim 2 is the COARSEST quantization regime (eps ≈ 0.01–0.06): pairs
    // at angles near acos(0.45) have quantized cosines straddling the
    // threshold by more than the exact error, so a prefilter without the
    // eps margin LOSES qualifying pairs here. k = 1 puts every vector in
    // one bucket → blocking is exhaustive and must reproduce the O(n²)
    // exact join verbatim; chunkSize = 2 forces the chunked packs.
    val emb = spark.range(0, 60).selectExpr("id AS vec_id",
      """transform(sequence(0, 1), d -> cast(
          if(d = 0, cos(id * 0.1), sin(id * 0.1)) as float)) AS embedding""")
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cents = Similarity.trainCodebook(emb, "vec_id", "embedding", 1, 1)
    val int8 = Dedup.cosineDupPairsBlockedInt8(emb, cents, "vec_id",
        "embedding", 0.45, probes = 1, chunkSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(int8 == exact)
  }

  test("int8 two-phase == exact baseline on the planted-dup corpus " +
      "(trained codebook, chunk splitting forced)") {
    val emb = spark.range(0, 2000).selectExpr(
        "id AS vec_id",
        "if(id % 20 = 19, id - 1, id) AS sid")
      .selectExpr("vec_id",
        """transform(sequence(0, 63), d -> cast(
            (pmod(xxhash64(sid, d, 7), 2001) - 1000) / 500.0
            + if(vec_id % 20 = 19,
                (pmod(xxhash64(vec_id, d, 8), 21) - 10) / 1000.0, 0.0)
          as float)) AS embedding""")
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cents = Similarity.trainCodebook(emb, "vec_id", "embedding", 40, 2)
    val int8 = Dedup.cosineDupPairsBlockedInt8(emb, cents, "vec_id",
        "embedding", 0.9, probes = 8, chunkSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size == 100, s"expected the 100 planted pairs: ${exact.size}")
    assert(int8 == exact)
  }

  test("int8 trained path == exact baseline on the sf0.001 corpus") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val int8 = Dedup
      .cosineDupPairsTrainedInt8(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(int8 == exact)
  }

  test("int8 candidate join is chunk-salted: the exchange keys carry " +
      "(bucket, __chunk), not bucket alone") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.trainCodebook(emb, "vec_id", "embedding", 4, 1)
    val plan = Dedup.cosineDupPairsBlockedInt8(emb, cents, "vec_id",
        "embedding", 0.45, probes = 2, chunkSize = 2)
      .queryExecution.executedPlan.toString
    // the salt (VERDICT r7 item 8): a hot bucket's chunks must spread
    // across reducers, which requires the join-side exchanges to hash
    // BOTH keys — a bucket-only partitioning satisfies the join's
    // clustered distribution and would silently restore the straggler
    assert(plan.contains("hashpartitioning(bucket"), s"no bucket exchange:\n$plan")
    val salted = "hashpartitioning\\(bucket[^)]*__chunk".r
      .findFirstIn(plan)
    assert(salted.isDefined,
      s"no (bucket, __chunk) salted exchange in plan:\n$plan")
  }

  // ------------------------------------------ sharded two-level dedup
  /** 2000-vector planted-dup corpus (the hierarchical-routing fixture):
    * every 20th vector near-copies its predecessor → exactly 100
    * qualifying pairs at 0.9. */
  private def plantedCorpus(n: Long) = spark.range(0, n).selectExpr(
      "id AS vec_id",
      "if(id % 20 = 19, id - 1, id) AS sid")
    .selectExpr("vec_id",
      """transform(sequence(0, 63), d -> cast(
          (pmod(xxhash64(sid, d, 7), 2001) - 1000) / 500.0
          + if(vec_id % 20 = 19,
              (pmod(xxhash64(vec_id, d, 8), 21) - 10) / 1000.0, 0.0)
        as float)) AS embedding""")

  test("sharded two-level dedup == exact baseline with NON-exhaustive " +
      "probing (distributed fine layer, quantized cell routing)") {
    val emb = plantedCorpus(2000)
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size == 100)
    // targetBucket 32 → k₁ = 8 coarse cells, ~8 fine buckets per cell;
    // pCoarse 3 × pFine 3 probes 9 of ~64 buckets — genuinely
    // non-exhaustive, so this gates the two-level RECALL argument
    // (near-dups route near-identically), not just the plumbing
    val (coarse, fine) = Similarity.trainShardedCodebook(emb, "vec_id",
      "embedding", targetBucket = 32)
    assert(coarse.count() == 8)
    val sharded = Dedup.cosineDupPairsShardedInt8(emb, coarse, fine,
        "vec_id", "embedding", 0.9, pCoarse = 3, pFine = 3, chunkSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sharded == exact)
  }

  test("sharded codebook: coarse broadcast stays √-bounded while " +
      "effective k grows with the corpus and buckets hold ≈ targetBucket") {
    for (n <- Seq(2000L, 8000L)) {
      val (coarse, fine) = Similarity.trainShardedCodebook(
        plantedCorpus(n), "vec_id", "embedding", targetBucket = 32)
      val k1 = coarse.count()
      assert(k1 == math.ceil(math.sqrt(n / 32.0)).toLong,
        s"coarse count $k1 at n=$n")
      // Σ ceil(cellCount/targetBucket): at least n/targetBucket fine
      // slots (mean bucket ≤ targetBucket), at most one extra per cell
      val kFine = fine.count()
      assert(kFine >= n / 32 && kFine <= n / 32 + k1,
        s"fine count $kFine outside [${n / 32}, ${n / 32 + k1}] at n=$n")
      // labels are unique per (cell, flabel) — the bucket id space
      assert(fine.select("cell", "flabel").distinct().count() == kFine)
    }
  }

  test("past-knee auto-dispatch: cosineDupPairsTrainedInt8 crosses to " +
      "the sharded path and still finds exactly the planted pairs") {
    // 70k dim-16 vectors with every 10th a near-copy of its
    // predecessor; targetBucket = 1 puts the knee at 65,536 — this
    // corpus sits PAST it, so the default path must route through
    // trainShardedCodebook + cosineDupPairsShardedInt8. At dim 16 the
    // incidental-pair probability at cos ≥ 0.99 is ~(1−0.99²)^7.5 ≈
    // 1e-13 — the 7000 planted pairs are the whole answer, checked
    // exactly (the O(n²) baseline is infeasible at 70k; the planted
    // SET is the oracle).
    val n = 70000L
    val emb = spark.range(0, n).selectExpr(
        "id AS vec_id",
        "if(id % 10 = 9, id - 1, id) AS sid")
      .selectExpr("vec_id",
        """transform(sequence(0, 15), d -> cast(
            (pmod(xxhash64(sid, d, 7), 2001) - 1000) / 500.0
            + if(vec_id % 10 = 9,
                (pmod(xxhash64(vec_id, d, 8), 11) - 5) / 2000.0, 0.0)
          as float)) AS embedding""")
    val planted = (0L until n).filter(_ % 10 == 9).map(i => (i - 1, i)).toSet
    val got = Dedup.cosineDupPairsTrainedInt8(emb, "vec_id", "embedding",
        threshold = 0.99, targetBucket = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == planted,
      s"missing=${(planted -- got).size} extra=${(got -- planted).size}")
  }

  test("cell_topk sub-coarse walk (r9): small cells and exhaustive asks " +
      "scan flat bit-identically; near-identical queries walk identically") {
    import graft.expressions.{CellCoarsePack, CellTopK}
    // one packed cell of 300 hash-random dim-64 fine centroids — above
    // the 160-member DefaultMinMembers cut, so packFineCells builds a
    // sub-coarse layer; a 100-member cell must come back with an EMPTY
    // layer (flat scan, bit-identical to the pre-r9 release)
    def fineFrame(cellId: Int, k2: Int) =
      spark.range(1, k2 + 1).selectExpr(
        s"$cellId AS cell", "cast(id AS int) AS flabel",
        """transform(sequence(0, 63), d -> cast(
            (pmod(xxhash64(id, d, 3), 2001) - 1000) / 500.0 as double))
          AS cvec""")
    val packedBig = Similarity.packFineCells(fineFrame(1, 300))
    val packedSmall = Similarity.packFineCells(fineFrame(2, 100))
    assert(packedBig.select(size(col("subc"))).head().getInt(0) > 0)
    assert(packedSmall.select(size(col("subc"))).head().getInt(0) == 0)
    // queries: 40 hash-random vectors + 40 near-copies (1e-3 jitter)
    val queries = spark.range(0, 40).selectExpr(
      "id AS qid",
      """transform(sequence(0, 63), d -> cast(
          (pmod(xxhash64(id, d, 11), 2001) - 1000) / 500.0 as double))
        AS q""",
      """transform(sequence(0, 63), d -> cast(
          (pmod(xxhash64(id, d, 11), 2001) - 1000) / 500.0
          + (pmod(xxhash64(id, d, 13), 21) - 10) / 10000.0 as double))
        AS qjit""")
    def route(kAsk: Int, useSub: Boolean, qCol: String): Seq[Seq[Int]] =
      queries.crossJoin(broadcast(packedBig))
        .select(col("qid"), CellTopK.cell_topk(col(qCol), col("members"),
          if (useSub) col("subc") else array().cast(
            packedBig.schema("subc").dataType.sql), kAsk).as("labels"))
        .orderBy("qid").collect().map(_.getSeq[Int](1)).toSeq
    // exhaustive ask (k >= members): the walk must NOT engage — the
    // "pFine >= max k2 => provably exact" oracle contract
    assert(route(300, useSub = true, "q") == route(300, useSub = false, "q"))
    // pool >= cell (want = 6*60 = 360 >= 300): flat again, exactly
    assert(route(60, useSub = true, "q") == route(60, useSub = false, "q"))
    // restricted walk (k = 5, pool 128 < 300): near-identical queries
    // must produce IDENTICAL walks — the pair-recall argument is that
    // both sides of a near-dup route the same way, not that either
    // finds the globally nearest centroid
    assert(route(5, useSub = true, "q") == route(5, useSub = true, "qjit"))
    // the walk still fills all k slots from valid labels (it restricts
    // WHICH members are scored, never how many are returned)
    route(5, useSub = true, "q").foreach { w =>
      assert(w.length == 5 && w.forall(l => l >= 1 && l <= 300), s"$w")
    }
  }

  test("trainShardedCodebook recursive cell splitting (r9): an observed " +
      "oversized cell is split, k2 stays bounded, dedup stays exact") {
    // 1000 dim-16 vectors, 900 piled around one spread anchor region
    // (noise ~30% of signal — geometrically splittable), 100 scattered.
    // targetBucket=4, maxK2=16 => cellCap=64: the pile cell routes ~900
    // rows, far past the cap, so the split rounds must fire.
    val emb = spark.range(0, 1000).selectExpr(
        "id AS vec_id",
        """CASE WHEN id < 900 THEN
            zip_with(
              transform(sequence(0, 15), d -> cast(
                (pmod(xxhash64(0L, d, 7), 2001) - 1000) / 500.0 as float)),
              transform(sequence(0, 15), d -> cast(
                (pmod(xxhash64(id, d, 8), 1201) - 600) / 1000.0 as float)),
              (a, n) -> a + n)
          ELSE transform(sequence(0, 15), d -> cast(
            (pmod(xxhash64(id, d, 9), 2001) - 1000) / 500.0 as float))
          END AS embedding""")
    val maxK2 = 16
    val (coarse, fine) = Similarity.trainShardedCodebook(emb, "vec_id",
      "embedding", targetBucket = 4, maxK2 = maxK2)
    // the pre-split k1 would have been max(√250, 1000/64) = 16 — the
    // split promotes extra centroids past it
    assert(coarse.count() > 16, s"no split happened: k1=${coarse.count()}")
    val k2ByCell = fine.groupBy("cell").count().collect()
      .map(r => r.getLong(1))
    // the bound is SOFT (nearest-centroid geometry splits a dense ball
    // approximately — see the scaladoc): within 2× of maxK2 where the
    // unsplit pile would have sat at ~ceil(900/4) = 225
    assert(k2ByCell.max <= 2L * maxK2,
      s"split failed to bound k2: max=${k2ByCell.max}")
    assert(k2ByCell.max < 225L / 4,
      s"split barely moved the pile: max=${k2ByCell.max}")
    // exhaustive probing over the split codebook must equal the exact
    // O(n²) join — splitting may move cell boundaries, never pairs
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exhaustive = every cell, every fine bucket: pFine must reach the
    // MEASURED max k2 (the soft bound can sit a hair over maxK2)
    val sharded = Dedup.cosineDupPairsShardedInt8(emb, coarse, fine,
        "vec_id", "embedding", 0.9,
        pCoarse = coarse.count().toInt, pFine = k2ByCell.max.toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exact -- sharded).isEmpty && (sharded -- exact).isEmpty,
      s"missing=${(exact -- sharded).size} extra=${(sharded -- exact).size}")
  }

  test("sharded int8 index (r9): cosineDupPairsFromShardedIndex == the " +
      "in-query sharded run == exact, phase 1 reading only the store") {
    val emb = plantedCorpus(2000)
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (coarse, fine) = Similarity.trainShardedCodebook(emb, "vec_id",
      "embedding", targetBucket = 32)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shidx_spec").toString
    graft.sources.IvfStore.writeShardedInt8(emb, coarse, fine, "vec_id",
      "embedding", dir, pCoarse = 3, pFine = 3)
    val fromIdx = Dedup.cosineDupPairsFromShardedIndex(spark, dir,
        "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inQuery = Dedup.cosineDupPairsShardedInt8(emb, coarse, fine,
        "vec_id", "embedding", 0.9, pCoarse = 3, pFine = 3, chunkSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromIdx == inQuery, "stored probe lists diverge from in-query")
    assert(fromIdx == exact)
    // layout: residence partition dirs exist and the stored probe list
    // leads with the residence bucket (probe_buckets(1) == dir)
    val stored = spark.read.parquet(s"$dir/data")
    assert(stored.filter(element_at(col("probe_buckets"), 1) =!=
      col("bucket")).count() == 0)
  }

  test("semanticDedup over the int8 pair graph == full-precision graph " +
      "(every cluster label and keep bit) on the sf0.001 corpus") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Dedup.dupCodebook(emb, "vec_id", "embedding")
    def run(int8: Boolean) =
      Dedup.semanticDedupWithCodebook(emb, "vec_id", "embedding",
          threshold = 0.45, cents, probes = 20, int8 = int8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = run(int8 = false)
    val quant = run(int8 = true)
    assert(full.nonEmpty && full.exists(_._3 == 0),
      "corpus must contain at least one dropped duplicate")
    assert(quant == full)
  }
}
