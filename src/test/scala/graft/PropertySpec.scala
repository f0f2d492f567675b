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
}
