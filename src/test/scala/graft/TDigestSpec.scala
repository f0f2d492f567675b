package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{TDigest, TDigestQuantiles}
import graft.queries.Tables
import graft.stats.DescribeStats

class TDigestSpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def exactQ(xs: Seq[Double], p: Double): Double = {
    // pandas linear interpolation
    val s = xs.sorted
    val k = (s.length - 1) * p
    val lo = math.floor(k).toInt; val hi = math.ceil(k).toInt
    s(lo) + (k - lo) * (s(hi) - s(lo))
  }

  test("digest quantiles track exact quantiles on skewed data") {
    val rnd = new scala.util.Random(42)
    // lognormal-ish skew — the shape that breaks fixed-bin histograms
    val xs = Seq.fill(50000)(math.exp(rnd.nextGaussian()))
    val d = new TDigest(200)
    xs.foreach(d.add)
    for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val approx = d.quantile(p)
      // rank-based tolerance: the digest's answer must sit between the
      // exact quantiles 1.5% of rank away on either side
      val lo = exactQ(xs, math.max(0.0, p - 0.015))
      val hi = exactQ(xs, math.min(1.0, p + 0.015))
      assert(approx >= lo && approx <= hi,
        s"p=$p: $approx outside [$lo, $hi]")
    }
  }

  test("merge of partial digests equals single digest within tolerance") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(40000)(rnd.nextDouble() * 100)
    val whole = new TDigest(200); xs.foreach(whole.add)
    val parts = xs.grouped(5000).map { chunk =>
      val d = new TDigest(200); chunk.foreach(d.add); d
    }.toSeq
    val merged = parts.head
    parts.tail.foreach(merged.merge)
    for (p <- Seq(0.25, 0.5, 0.75)) {
      val lo = exactQ(xs, p - 0.015); val hi = exactQ(xs, p + 0.015)
      assert(merged.quantile(p) >= lo && merged.quantile(p) <= hi,
        s"merged p=$p: ${merged.quantile(p)} outside [$lo, $hi]")
    }
    assert(merged.totalWeight == xs.length.toDouble)
    assert(merged.minVal == xs.min && merged.maxVal == xs.max)
  }

  test("serialization round-trips the digest") {
    val d = new TDigest(100)
    (1 to 10000).foreach(i => d.add(i.toDouble))
    val back = TDigest.deserialize(d.serialize())
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 1.0))
      assert(back.quantile(p) == d.quantile(p))
    assert(back.totalWeight == d.totalWeight)
  }

  test("property: quantiles are monotone and bounded by min/max") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))) { xs =>
      val d = new TDigest(100)
      xs.foreach(d.add)
      val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0).map(d.quantile)
      qs.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-9) &&
        qs.head >= xs.min - 1e-9 && qs.last <= xs.max + 1e-9 &&
        (d.quantile(0.0) == xs.min || xs.length == 1) &&
        (d.quantile(1.0) == xs.max || xs.length == 1)
    })
  }

  test("small inputs are exact at the probe points") {
    // below the buffer limit every point is its own centroid, so the
    // digest interpolates through the raw data
    val d = new TDigest(200)
    Seq(1.0, 2.0, 3.0).foreach(d.add)
    assert(d.quantile(0.5) == 2.0)
    assert(d.quantile(0.0) == 1.0 && d.quantile(1.0) == 3.0)
    val e = new TDigest(200)
    assert(e.quantile(0.5).isNaN)
    val one = new TDigest(200); one.add(5.0)
    assert(one.quantile(0.25) == 5.0)
  }

  test("describeTDigest matches exact describe within rank tolerance on lineitem") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val exact = DescribeStats.describe(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val td = DescribeStats.describeTDigest(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val vals = cols.map(c =>
      c -> li.select(col(c).cast("double")).na.drop()
        .collect().map(_.getDouble(0)).toSeq).toMap
    for (c <- cols) {
      // moments are computed identically — must match bit-for-bit
      for (f <- Seq("count", "null_count", "mean", "std", "min", "max"))
        assert(td(c).getDouble(td(c).fieldIndex(f)) ==
          exact(c).getDouble(exact(c).fieldIndex(f)), s"$c.$f")
      // quantiles within ±1.5% rank of the exact answer (documented
      // tolerance for compression=200)
      for ((f, p) <- Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75))) {
        val v = td(c).getDouble(td(c).fieldIndex(f))
        val lo = exactQ(vals(c), p - 0.015)
        val hi = exactQ(vals(c), p + 0.015)
        // eps absorbs centroid-mean accumulation rounding on discrete data
        val eps = 1e-9 * math.max(1.0, math.abs(hi))
        assert(v >= lo - eps && v <= hi + eps,
          s"$c.$f: $v outside [$lo, $hi]")
      }
    }
  }

  test("out-of-range percentages are rejected at construction") {
    import graft.expressions.TDigestQuantiles
    intercept[IllegalArgumentException] {
      TDigestQuantiles.tdigest_quantiles(
        org.apache.spark.sql.functions.col("v"), Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      TDigestQuantiles.tdigest_quantiles(
        org.apache.spark.sql.functions.col("v"), Seq(-0.2))
    }
    intercept[IllegalArgumentException] {
      TDigestQuantiles.tdigest_quantiles(
        org.apache.spark.sql.functions.col("v"), Seq.empty)
    }
  }

  test("tdigest aggregate works per-group and yields null on empty") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(TDigestQuantiles.tdigest_quantiles(col("v"), Seq(0.5)).as("q"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) == Seq(2.0))
    assert(out(1).getSeq[Double](1) == Seq(10.0))
    val empty = df.filter(col("v") > 100)
      .agg(TDigestQuantiles.tdigest_quantiles(col("v"), Seq(0.5)).as("q"))
      .collect()
    assert(empty(0).isNullAt(0))
  }
}
