package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{LineClean, TextAnalysis}

/** Line-level cleaning semantics (q_line_clean / q_line_dedup gate the
  * composed pipelines; these pin each rule on hand-built documents) and
  * the Gopher document-shape conjunction.
  */
class LineCleanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
  private def one(df: DataFrame, c: org.apache.spark.sql.Column): String =
    df.select(c).head().getString(0)

  test("cleanLines drops short, blocklisted, and unterminated lines") {
    val text = Seq(
      "this line has plenty of words to survive",
      "ok",                                        // < 3 words
      "please enable JavaScript to view content",  // blocklist, mixed case
      "another keeper with enough words").mkString("\n")
    val d = docs(1L -> text)
    assert(one(d, LineClean.cleanLines(col("text"))) ==
      "this line has plenty of words to survive\n" +
        "another keeper with enough words")
    // terminal-punctuation mode keeps only sentence-ended lines
    val t2 = "a proper sentence ends here.\nno terminal punctuation line"
    assert(one(docs(2L -> t2),
      LineClean.cleanLines(col("text"), requireTerminal = true)) ==
      "a proper sentence ends here.")
    // losing every line yields the empty string, not null
    assert(one(docs(3L -> "ok"), LineClean.cleanLines(col("text"))) == "")
    // caller-supplied MIXED-CASE blocklist phrases still match
    assert(one(docs(4L -> "please Enable JavaScript to view this site"),
      LineClean.cleanLines(col("text"),
        blocklist = Seq("JavaScript"))) == "")
  }

  test("bullet and ellipsis line fractions, hand-checked") {
    val text = Seq(
      "- bullet one",
      "* bullet two",
      "plain prose line",
      "trailing off…").mkString("\n")
    val got = docs(1L -> text)
      .select(LineClean.bulletLineFraction(col("text")),
        LineClean.ellipsisLineFraction(col("text"))).head()
    assert(got.getDouble(0) == 0.5 && got.getDouble(1) == 0.25)
  }

  test("dropFrequentLines removes corpus-frequent lines, keeps order") {
    val footer = "all rights reserved contact us"
    val d = docs(
      1L -> s"alpha unique line one\n$footer\nalpha unique line two",
      2L -> s"beta unique content\n$footer",
      3L -> s"$footer\ngamma unique content",
      4L -> s"delta unique content\n$footer",
      5L -> footer) // loses everything
    val got = LineClean.dropFrequentLines(d, "doc_id", "text", maxDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "alpha unique line one\nalpha unique line two")
    assert(got(2L) == "beta unique content")
    assert(got(3L) == "gamma unique content")
    assert(got(5L) == "")
    // below the threshold nothing is touched
    val kept = LineClean.dropFrequentLines(d, "doc_id", "text", maxDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(5L) == footer)
  }

  test("dropFrequentLines preserves other columns and partitioning-insensitive") {
    val d = Seq((1L, "x y z\nshared line", "en"), (2L, "shared line", "de"),
      (3L, "shared line\nq r s", "fr"))
      .toDF("doc_id", "text", "lang")
    def run(parts: Int) =
      LineClean.dropFrequentLines(d.repartition(parts), "doc_id", "text",
          maxDocs = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
    assert(run(1) == run(7))
    assert(run(1).map(_._3) == Set("en", "de", "fr"))
  }

  test("dedupParagraphs keeps exactly the first occurrence of each paragraph") {
    val footer = "all rights reserved contact us"
    val d = docs(
      1L -> s"alpha unique line one\n$footer\nalpha unique line two",
      2L -> s"beta unique content\n$footer",
      3L -> s"$footer\ngamma unique content",
      5L -> footer) // every paragraph first occurred elsewhere
    val got = LineClean.dedupParagraphs(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the first (lowest doc, lowest pos) footer — it stays
    assert(got(1L) == s"alpha unique line one\n$footer\nalpha unique line two")
    assert(got(2L) == "beta unique content")
    assert(got(3L) == "gamma unique content")
    assert(got(5L) == "")
    // within ONE doc, a self-repeated paragraph also thins to its first
    val selfRep = docs(7L -> "twice repeated\nmiddle bit\ntwice repeated")
    assert(LineClean.dedupParagraphs(selfRep, "doc_id", "text")
      .head().getString(1) == "twice repeated\nmiddle bit")
  }

  test("dedupParagraphs exempts blank separator lines (structure, not content)") {
    val d = docs(
      1L -> "para one\n\npara two",
      2L -> "para one\n\npara three")
    val got = LineClean.dedupParagraphs(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 is untouched; doc 2 loses only the duplicated CONTENT —
    // its blank separator survives even though "" occurs corpus-wide
    assert(got(1L) == "para one\n\npara two")
    assert(got(2L) == "\npara three")
  }

  test("dedupParagraphs preserves other columns and is partitioning-insensitive") {
    val d = Seq((1L, "x y z\nshared line", "en"), (2L, "shared line", "de"),
      (3L, "shared line\nq r s", "fr"))
      .toDF("doc_id", "text", "lang")
    def run(parts: Int) =
      LineClean.dedupParagraphs(d.repartition(parts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
    assert(run(1) == run(7))
    assert(run(1) == Set((1L, "x y z\nshared line", "en"), (2L, "", "de"),
      (3L, "q r s", "fr")))
  }

  test("gopherPass: each rule flips the conjunction independently") {
    // a passing document: 50+ words, mean length in range, stopwords,
    // no symbols, diverse vocabulary (stopwords every 8th slot keep the
    // duplicate-word fraction under the 0.3 bound)
    val good = (1 to 60).map(i => i % 8 match {
      case 0 => "the"; case 3 => "and"; case _ => s"wordy$i"
    }).mkString(" ")
    val cases = Seq(
      ("good", good, true),
      ("too_short", "the and of with that have words here", false),
      ("symbols", good + " " + Seq.fill(30)("###...").mkString(" "), false),
      ("no_stopwords", (1 to 60).map(i => s"token$i").mkString(" "), false),
      ("boilerplate", Seq.fill(30)("buy now").mkString(" ") +
        " the of and that have", false))
    val d = cases.zipWithIndex
      .map { case ((_, t, _), i) => (i.toLong, t) }
    val got = docs(d: _*)
      .select(col("doc_id"), TextAnalysis.gopherPass(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    cases.zipWithIndex.foreach { case ((name, _, want), i) =>
      assert(got(i.toLong) == want, s"case $name: got ${got(i.toLong)}")
    }
  }

  test("stripHtml: blocks vanish whole, tags space out, entities " +
      "decode once, whitespace squeezes") {
    import graft.functions.LineClean
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      // script/style content (including < > inside code) vanishes
      "a<script>if (1 < 2 && x > 0) { go(); }</script>b" -> "a b",
      "a<style>p { color: red; }</style>b" -> "a b",
      // multi-line comments vanish
      "x<!-- one\ntwo -->y" -> "x y",
      "<a href=\"/x\" class='y'>link</a>" -> "link",
      // entity decode, &amp; LAST: '&amp;lt;' means the literal '&lt;'
      "&quot;q&quot; &amp;lt; &nbsp;&#39;a&#39; &gt;" ->
        "\"q\" &lt; 'a' >",
      // a </style> INSIDE script code must not terminate the script
      // block (per-tag patterns; a combined alternation would leak
      // '; track();' into prose)
      "a<script>var s = \"</style>\"; track();</script>b" -> "a b",
      // <styles> is NOT a style-block opener (\b boundary) — plain
      // tag stripping keeps its inner prose
      "<styles>real prose</style>next" -> "real prose next",
      // U+000B squeezes like any whitespace (explicit class: Java \s
      // includes it, RE2's does not)
      "a  b" -> "a b",
      "" -> "")
    val got = cases.map(_._1).toDF("h")
      .select(LineClean.stripHtml(col("h")))
      .collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
    val n = Seq(Tuple1(null: String)).toDF("h")
      .select(LineClean.stripHtml(col("h"))).collect()(0)
    assert(n.isNullAt(0))
  }
}
