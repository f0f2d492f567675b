package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.SarTextParser
import graft.ops.SarOps
import graft.stats.DescribeStats

/** Property tests (SURVEY.md §5.4): parser total-ness over arbitrary
  * section layouts, describe() order invariants, melt size preservation,
  * day-overlay alignment preserving time-of-day. */
class PropertySpec extends AnyFunSuite {

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

  // --- generators -----------------------------------------------------

  private val metricName = Gen.oneOf("%usr", "tps", "kbmemfree", "await",
    "proc/s", "ldavg-5", "%util", "rxpck/s")
  private val timeStr = for {
    h <- Gen.choose(0, 23); m <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
  } yield f"$h%02d:$m%02d:$s%02d"
  private val numToken = Gen.choose(0.0, 9999.99).map(v => f"$v%.2f")

  private val section = for {
    nCols <- Gen.choose(1, 6)
    cols <- Gen.listOfN(nCols, metricName)
    headerTime <- timeStr
    nRows <- Gen.choose(1, 5)
    rows <- Gen.listOfN(nRows, for {
      t <- timeStr
      vals <- Gen.listOfN(nCols, numToken)
    } yield s"$t ${vals.mkString(" ")}")
  } yield s"$headerTime ${cols.mkString(" ")}" +: rows

  private val sarFile = for {
    sections <- Gen.nonEmptyListOf(section)
    junk <- Gen.listOf(Gen.oneOf("Average: all 1 2 3", "garbage line",
      "   ", "summary without time"))
  } yield ("Linux 1.0 (prop) 2023-06-05 _x86_64_ (1 CPU)" +: "" +:
    sections.flatMap(s => s :+ "")).toList ++ junk

  test("parser is total on arbitrary section layouts and never emits " +
    "null dates or time-prefixed data") {
    check(Prop.forAll(sarFile) { lines =>
      val rows = SarTextParser.parseLines(lines)
      rows.forall(r => r.date != null &&
        !r.data.matches("^\\d{2}:\\d{2}:\\d{2}.*") &&
        r.header.nonEmpty)
    })
  }

  test("describe invariants: min <= p25 <= p50 <= p75 <= max, count >= 1") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))) { xs =>
      val df = xs.toDF("x")
      val r = DescribeStats.describe(df, Seq("x")).collect().head
      val Seq(cnt, mn, p25, p50, p75, mx) =
        Seq(1, 5, 6, 7, 8, 9).map(i => r.getDouble(i))
      cnt == xs.length && mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx
    }, minSuccessful = 20)
  }

  test("describeBy equals per-group describe run group by group") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(-1e4, 1e4)))) { rows =>
      val df = rows.toDF("g", "x")
      val grouped = DescribeStats.describeBy(df, "g", "x").collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      rows.map(_._1).distinct.forall { g =>
        val solo = DescribeStats.describe(
          df.filter($"g" === g), Seq("x")).collect().head
        // describe reports (metric, count, null_count, mean, std, min,
        // p25, p50, p75, max); describeBy (g, count, null_count, ...)
        val a = grouped(g)
        Seq(3, 4, 5, 6, 7, 8, 9).forall { i =>
          val x = solo.get(i); val y = a(i - 1)
          (x == null && y == null) ||
            (x != null && y != null &&
              math.abs(x.asInstanceOf[Double] - y.asInstanceOf[Double])
                < 1e-9) } &&
          a(0) == solo.getDouble(1).toLong && a(1) == solo.getDouble(2).toLong
      }
    }, minSuccessful = 15)
  }

  test("melt preserves cell count and values sum") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 1000), Gen.choose(-100.0, 100.0),
        Gen.choose(-100.0, 100.0)))) { rows =>
      val df = rows.toDF("id", "a", "b")
      val long = SarOps.melt(df, Seq("id"), Seq("a", "b"))
      long.count() == 2L * rows.length
    }, minSuccessful = 10)
  }

  test("day-overlay alignment preserves time-of-day") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(
      Gen.choose(0L, 4102444800L))) { secs =>
      val df = secs.map(s => new Timestamp(s * 1000L)).toDF("ts")
      val aligned = SarOps.dayOverlayAlign(df, "ts", "2000-01-01")
      aligned.filter(
        date_format(col("ts"), "HH:mm:ss") =!=
          date_format(col("aligned"), "HH:mm:ss")).count() == 0
    }, minSuccessful = 10)
  }

  test("image headers round-trip the JDK encoders at any dimensions") {
    import graft.multimodal.ImageHeaders
    val fmts = Gen.oneOf("png", "jpg", "gif", "bmp")
    val dims = Gen.choose(1, 200)
    check(Prop.forAll(fmts, dims, dims) { (fmt, w, h) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      val want = if (fmt == "jpg") "jpeg" else fmt
      ImageHeaders.decode(out.toByteArray)
        .contains(ImageHeaders.ImageMeta(w, h, want))
    }, minSuccessful = 40)
  }

  test("wav headers round-trip the JDK encoder at any format") {
    import graft.multimodal.AudioHeaders
    import javax.sound.sampled._
    val rates = Gen.oneOf(8000, 16000, 22050, 44100, 48000)
    val chans = Gen.choose(1, 2)
    val frames = Gen.choose(1, 5000)
    check(Prop.forAll(rates, chans, frames) { (rate, ch, n) =>
      val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
      val pcm = new Array[Byte](n * fmt.getFrameSize)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, out)
      AudioHeaders.decode(out.toByteArray)
        .contains(AudioHeaders.AudioMeta(rate, ch, 16, n.toLong, "wav"))
    }, minSuccessful = 40)
  }

  test("header parsers are total on arbitrary bytes (None, never throw)") {
    import graft.multimodal.{AudioHeaders, ImageHeaders}
    val bytes = Gen.containerOf[Array, Byte](
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    check(Prop.forAll(bytes) { b =>
      // random bytes are (overwhelmingly) not valid media; the contract
      // under test is totality — decode returns rather than throwing
      ImageHeaders.decode(b); AudioHeaders.decode(b); true
    }, minSuccessful = 200)
  }
}
