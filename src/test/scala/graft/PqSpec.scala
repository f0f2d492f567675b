package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Quantize, Similarity}
import graft.queries.Tables

/** Product quantization + int8 scalar quantization: exactness where it's
  * structural (distinct-vector corpora where PQ reconstruction is
  * lossless), invariants where the op is approximate by design (ADC on a
  * lossy codebook), and determinism everywhere.
  */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** 4 exactly-distinct dim-8 vectors — with ksub = n every sub-vector
    * seeds its own centroid, Lloyd's converges to the points themselves,
    * and PQ reconstruction is exact BY CONSTRUCTION. */
  lazy val tiny: DataFrame = Seq(
    (0L, Seq(1f, 0f, 0f, 0f, 2f, 0f, 0f, 1f)),
    (1L, Seq(0f, 1f, 0f, 0f, 0f, 2f, 1f, 0f)),
    (2L, Seq(0f, 0f, 1f, 0f, 1f, 1f, 0f, 0f)),
    (3L, Seq(0f, 0f, 0f, 1f, 0f, 0f, 2f, 2f))
  ).toDF("vec_id", "embedding")

  val dir = "/root/testdata/sf0.001"
  lazy val emb = Tables.load(spark, dir, "embeddings").cache()

  // ---- int8 scalar quantization -------------------------------------

  test("int8: codes bounded, reconstruction within half a scale step") {
    val q = Quantize.quantizeInt8(emb, "embedding")
      .select(col("vec_id"), col("embedding"), col("qscale"),
        col("qcodes"),
        Quantize.dequantizeInt8(col("qcodes"), col("qscale")).as("rec"))
    q.collect().foreach { r =>
      val v = r.getSeq[Float](1)
      val s = r.getDouble(2)
      val codes = r.getSeq[Int](3)
      val rec = r.getSeq[Float](4)
      assert(codes.forall(c => c >= -127 && c <= 127))
      v.zip(rec).foreach { case (x, y) =>
        assert(math.abs(x - y) <= s / 2 + 1e-6,
          s"vec ${r.getLong(0)}: |$x - $y| > ${s / 2}")
      }
    }
  }

  test("int8: all-zero vector gets scale 1 and all-zero codes") {
    val z = Seq((9L, Seq.fill(8)(0f))).toDF("vec_id", "embedding")
    val r = Quantize.quantizeInt8(z, "embedding").head()
    assert(r.getDouble(2) == 1.0)
    assert(r.getSeq[Int](3).forall(_ == 0))
  }

  test("int8: quantized cosine approximates exact cosine") {
    val q = Quantize.quantizeInt8(emb, "embedding")
    val qv = q.filter(col("vec_id") === 0L)
      .select("qcodes").head().getSeq[Int](0)
    val both = q.select(col("vec_id"),
        Similarity.cosineHof(col("qcodes"), typedlit(qv)).as("qcos"),
        Similarity.cosine(col("embedding"),
          typedlit(emb.filter(col("vec_id") === 0L)
            .select("embedding").head().getSeq[Float](0))).as("cos"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.02,
        s"vec ${r.getLong(0)}: qcos ${r.getDouble(1)} vs cos ${r.getDouble(2)}")
    }
  }

  // ---- PQ training --------------------------------------------------

  test("pq: lossless on a distinct corpus with ksub = n — ADC equals exact") {
    val cb = Quantize.trainPq(tiny, "vec_id", "embedding", m = 2,
      ksub = 4, iters = 3)
    val codes = Quantize.pqEncode(tiny, "embedding", cb)
    // distinct vectors -> distinct codes
    assert(codes.select("pq_code").distinct().count() == 4)
    // ADC cosine == exact cosine for every query vector
    tiny.collect().foreach { qr =>
      val qv = qr.getSeq[Float](1)
      val adc = Quantize.adcTopK(codes, "vec_id", "pq_code", cb, qv, 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val exact = tiny.select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), typedlit(qv)), 4)
            .as("cos"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(adc == exact, s"query ${qr.getLong(0)}: $adc != $exact")
    }
  }

  test("pq: trainPq scans the corpus ONCE (cached slices), independent " +
      "of m and iters") {
    // r13: the sliced sub-vector frame persists across the seed scan
    // and every Lloyd's iteration, so the SOURCE is read exactly once
    // (the cache build) plus at most one partition's worth for the
    // limit(1) dim probe — where the r12 shape paid one full scan per
    // iteration (iters+2 total) and a lazily folded loop would pay
    // O(iters²). ALL m sub-spaces still assign in the same pass (m
    // compiled scorers in one projection), so nothing scales with m.
    val scans = spark.sparkContext.longAccumulator("corpus-row-reads")
    val tick = udf { () => scans.add(1); true }.asNondeterministic()
    val n = emb.count()
    val counted = emb.filter(tick())
    val iters = 3
    Quantize.trainPq(counted, "vec_id", "embedding", m = 8, ksub = 16,
      iters = iters).collect() // local rows — collecting must not rescan
    // lower bound: the cache build reads every row once; upper bound:
    // + one full scan's slack for the limit(1) dim probe
    assert(scans.value >= n && scans.value <= 2 * n,
      s"expected 1..2 corpus scans (cached training slices), measured " +
        s"${scans.value}/$n = ${scans.value.toDouble / n}")
  }

  test("pq: training is deterministic across runs") {
    def run(): Seq[(Int, Int, Seq[Double])] =
      Quantize.trainPq(emb, "vec_id", "embedding", m = 8, ksub = 16,
          iters = 2)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .toSeq.sortBy(t => (t._1, t._2))
    assert(run() == run())
  }

  test("pq: packed code round-trips through pqByte") {
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 1)
    val codes = Quantize.pqEncode(emb, "embedding", cb)
    val unpacked = codes.select(col("pq_code") +:
        (0 until 8).map(s => Quantize.pqByte(col("pq_code"), s)
          .as(s"b$s")): _*)
      .collect()
    unpacked.foreach { r =>
      val code = r.getLong(0)
      (0 until 8).foreach { s =>
        val b = r.getInt(s + 1)
        assert(b >= 0 && b < 16, s"byte $s of $code out of range: $b")
        assert(((code >> (8 * s)) & 0xFF).toInt == b)
      }
    }
  }

  test("pq: pqByte unpacks the sign-bit byte (label 256 at sub-space 7)") {
    // (255L << 56) flips the packed code NEGATIVE: arithmetic shiftright
    // sign-extends, so the 0xFF mask is load-bearing — this pins it
    // byte s = s*36+3, so byte 7 = 255 exactly
    val code = (0 until 8).map(s => (s * 36 + 3).toLong << (8 * s)).sum
    assert(code < 0, "top byte 255 must make the packed long negative")
    val row = Seq(Tuple1(code)).toDF("pq_code")
      .select((0 until 8).map(s =>
        Quantize.pqByte(col("pq_code"), s).as(s"b$s")): _*)
      .head()
    (0 until 7).foreach(s => assert(row.getInt(s) == s * 36 + 3))
    assert(row.getInt(7) == 255)
  }

  test("pq: rerank recall rises with shortlist and hits 1.0 at full corpus") {
    val n = emb.count().toInt
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 3)
    val codes = Quantize.pqEncode(emb, "embedding", cb)
    val qv = emb.filter(col("vec_id") === 7L)
      .select("embedding").head().getSeq[Float](0)
    val exact = Similarity.topKCosine(emb, "vec_id", "embedding", 7L, 10)
      .collect().map(_.getLong(0)).toSet
    var prev = -1.0
    for (shortlist <- Seq(10, 50, n)) {
      val got = Quantize.pqSearchRerank(emb, "vec_id", "embedding",
          codes, "pq_code", cb, qv, k = 10, shortlist = shortlist)
        .collect().map(_.getLong(0)).toSet
      val recall = (exact intersect got).size.toDouble / exact.size
      assert(recall >= prev,
        s"recall regressed at shortlist=$shortlist: $recall < $prev")
      prev = recall
      if (shortlist == n)
        assert(got == exact, "full-corpus shortlist must equal exact top-k")
    }
  }

  test("sdc: code-to-code join equals the exact join in the lossless limit") {
    val cb = Quantize.trainPq(tiny, "vec_id", "embedding", m = 2,
      ksub = 4, iters = 3)
    val codes = Quantize.pqEncode(tiny, "embedding", cb)
      .select("vec_id", "pq_code")
    val sdc = Quantize.pqKnnJoin(codes, codes, "vec_id", "vec_id",
        "pq_code", cb, k = 4)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = Similarity.knnJoin(tiny, tiny, "vec_id", "vec_id",
        "embedding", k = 4)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(sdc == exact,
      "lossless-limit SDC join must equal the exact knnJoin")
  }

  test("sdc: symmetric, self-identical, and self stays in top-k on the corpus") {
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 2)
    val codes = Quantize.pqEncode(emb, "embedding", cb)
      .select("vec_id", "pq_code")
    val queries = codes.filter(col("vec_id") < 20)
    // symmetry: scoring (a,b) equals scoring (b,a)
    val ab = queries.toDF("qa", "ca")
      .crossJoin(queries.toDF("qb", "cb"))
      .select(col("qa"), col("qb"),
        round(Quantize.sdcCosine(col("ca"), col("cb"), cb), 6).as("s1"),
        round(Quantize.sdcCosine(col("cb"), col("ca"), cb), 6).as("s2"))
      .collect()
    ab.foreach(r => assert(r.getDouble(2) == r.getDouble(3)))
    // self-score is exactly 1.0, so every query keeps itself in top-5
    val top = Quantize.pqKnnJoin(queries, codes, "vec_id", "vec_id",
      "pq_code", cb, k = 5)
    val selfRows = top.filter(col("query_id") === col("neighbor_id"))
      .collect()
    assert(selfRows.length == 20)
    selfRows.foreach(r => assert(r.getDouble(2) == 1.0))
  }

  test("ivfadc: store search prunes partitions and is exact at the limit") {
    import graft.sources.IvfStore
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc").toString + "/idx"
    val (cents, _) = IvfStore.writePqTrained(emb, "vec_id", "embedding",
      path, m = 8, ksub = 16, iters = 2)
    val k = cents.count().toInt
    val n = emb.count().toInt
    val qv = emb.filter(col("vec_id") === 5L)
      .select("embedding").head().getSeq[Float](0)
    // probes < k: the scan must carry a bucket partition filter
    val pruned = IvfStore.searchPq(spark, path, qv, "vec_id", "embedding",
      k = 5, probes = 2, shortlist = 50)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"probed search must prune bucket partitions:\n$scan")
    assert(pruned.count() == 5)
    // exhaustive probes + full shortlist: equals the exact top-k
    val exact = Similarity.topKCosine(emb, "vec_id", "embedding", 5L, 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = IvfStore.searchPq(spark, path, qv, "vec_id", "embedding",
        k = 8, probes = k, shortlist = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact)
  }

  test("ivfadc: append PQ-encodes the batch; retrain preserves the PQ layout") {
    import graft.sources.IvfStore
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc_maint").toString + "/idx"
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
      .select(col("vec_id"), col("embedding"))
    IvfStore.writePqTrained(base, "vec_id", "embedding", path,
      m = 8, ksub = 16, iters = 2)
    IvfStore.append(batch, "vec_id", "embedding", path)
    // appended rows must carry real codes — a null pq_code would score
    // the -2.0 sentinel and vanish from every ADC shortlist
    val data = spark.read.parquet(s"$path/data")
    assert(data.count() == emb.count())
    assert(data.filter(col("pq_code").isNull).count() == 0,
      "appended rows must be PQ-encoded with the stored sub-codebooks")
    // an appended vector is findable through the full IVFADC path
    val qid = 450L
    val qv = batch.filter(col("vec_id") === qid)
      .select("embedding").head().getSeq[Float](0)
    val k = IvfStore.codebook(spark, path).count().toInt
    val hit = IvfStore.searchPq(spark, path, qv, "vec_id", "embedding",
      k = 1, probes = k, shortlist = 50).head()
    assert(hit.getLong(0) == qid && hit.getDouble(1) == 1.0)
    // retrain on an IVFADC index must rebuild the PQ layout, not strip it
    IvfStore.retrain(spark, path, "vec_id", "embedding", iters = 1)
    val pq = IvfStore.pqCodebook(spark, path)
    assert(pq.agg(max(col("sub"))).head().getInt(0) == 7,
      "retrain must preserve the stored PQ geometry (m=8)")
    assert(spark.read.parquet(s"$path/data")
      .filter(col("pq_code").isNull).count() == 0)
    val again = IvfStore.searchPq(spark, path, qv, "vec_id", "embedding",
      k = 1, probes = IvfStore.codebook(spark, path).count().toInt,
      shortlist = 50).head()
    assert(again.getLong(0) == qid && again.getDouble(1) == 1.0)
  }

  test("pq: ADC plan has no shuffle and scans only id + code") {
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 1)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_pq_plan").toString
    Quantize.pqEncode(emb, "embedding", cb)
      .select("vec_id", "pq_code").write.mode("overwrite").parquet(tmp)
    val codes = spark.read.parquet(tmp)
    val qv = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val plan = Quantize.adcTopK(codes, "vec_id", "pq_code", cb, qv, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ADC top-k must not shuffle:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
