package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeTokenizer

/** BPE tokenizer training contract. No SQL oracle exists (the merge
  * sequence is data-dependent), so this suite pins the published
  * hand-computable example, the deterministic tie-break, application
  * semantics, and corpus-level token accounting.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** The Sennrich et al. vocabulary {low:5, lower:2, newest:6,
    * widest:3} as a corpus. */
  def sennrich: DataFrame = docs(
    0L -> (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
    1L -> (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))

  test("train reproduces the hand-computed merge sequence (with " +
      "deterministic lexicographic tie-breaks)") {
    val bpe = BpeTokenizer.train(sennrich, "text", numMerges = 5)
    // pair counts round 1: (e,s)=9 (t,</w>)=9 (s,t)=9 tie -> 'e…' wins;
    // round 2: (es,t)=9 (t,</w>)=9 tie -> 'es…' wins; round 3:
    // (est,</w>)=9; round 4: (l,o)=7 (o,w)=7 tie -> 'l…'; round 5: (lo,w)=7
    val W = BpeTokenizer.Eow
    assert(bpe.merges == Seq(
      "e" -> "s", "es" -> "t", "est" -> W, "l" -> "o", "lo" -> "w"))
  }

  test("wordTokens applies merges in order; tokenCounts sums per doc") {
    val W = BpeTokenizer.Eow
    val bpe = BpeTokenizer.Bpe(Seq(
      "e" -> "s", "es" -> "t", "est" -> W, "l" -> "o", "lo" -> "w"))
    val toks = BpeTokenizer.wordTokens(sennrich, "text", bpe)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(toks("low") == Seq("low", W))
    assert(toks("lower") == Seq("low", "e", "r", W))
    assert(toks("newest") == Seq("n", "e", "w", "est" + W))
    assert(toks("widest") == Seq("w", "i", "d", "est" + W))
    val counts = BpeTokenizer.tokenCounts(
        docs(7L -> "low lower", 8L -> "newest", 9L -> null), "doc_id",
        "text", bpe)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(7L -> 6L, 8L -> 4L), "null-text doc absent")
  }

  test("merge application is left-to-right non-overlapping") {
    // 'aaa' under merge (a,a): [aa, a, eow], never [a, aa] or [aaa]
    val bpe = BpeTokenizer.Bpe(Seq("a" -> "a"))
    val t = BpeTokenizer.wordTokens(docs(0L -> "aaa aaaa"), "text", bpe)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(t("aaa") == Seq("aa", "a", BpeTokenizer.Eow))
    assert(t("aaaa") == Seq("aa", "aa", BpeTokenizer.Eow))
  }

  test("training stops early when words are fully merged") {
    val bpe = BpeTokenizer.train(docs(0L -> "ab ab ab"), "text", 50)
    // 'ab</w>' has 2 pairs + 1 after first merge -> at most 2 merges
    assert(bpe.merges.length == 2)
    val t = BpeTokenizer.wordTokens(docs(0L -> "ab"), "text", bpe)
      .head().getSeq[String](2)
    assert(t == Seq("ab" + BpeTokenizer.Eow))
  }

  test("training is insensitive to partitioning and repetition layout") {
    val flat = sennrich
    val shredded = docs((0L until 16L).map(i =>
      i -> Seq("low", "low", "lower", "newest", "newest", "newest",
        "widest").drop((i % 3).toInt).mkString(" ")): _*)
    val b1 = BpeTokenizer.train(flat.repartition(1), "text", 4)
    val b2 = BpeTokenizer.train(flat.repartition(7), "text", 4)
    assert(b1.merges == b2.merges)
    val b3 = BpeTokenizer.train(shredded.repartition(5), "text", 3)
    val b4 = BpeTokenizer.train(shredded.repartition(2), "text", 3)
    assert(b3.merges == b4.merges)
  }

  test("literal </w> in text can never alias the end-of-word marker") {
    // raw HTML: the word '</w>' trains merges over its characters, but
    // the resulting symbols stay distinct from the \u0001-bearing Eow
    val html = docs(0L -> (Seq.fill(6)("</w>").mkString(" ") + " x"))
    val bpe = BpeTokenizer.train(html, "text", numMerges = 6)
    assert(bpe.merges.forall { case (a, b) =>
      (a + b) != BpeTokenizer.Eow },
      s"text merges must not forge the marker: ${bpe.merges}")
    val toks = BpeTokenizer.wordTokens(html, "text", bpe)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    // the fully merged html word = its 4 chars + the real marker, and
    // the marker symbol is still identifiable by its \u0001 prefix
    assert(toks("</w>").last.startsWith("\u0001") ||
      toks("</w>").last.endsWith(BpeTokenizer.Eow))
  }

  test("bpe-token budget: sampleToBudget over tokenCounts keeps docs " +
      "while the running BPE total fits") {
    import graft.functions.Curation
    val d = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 60)
    val bpe = BpeTokenizer.train(d, "text", numMerges = 8)
    val costed = d.join(
      BpeTokenizer.tokenCounts(d, "doc_id", "text", bpe),
      Seq("doc_id"), "left")
    val budget = 3000L
    val kept = Curation.sampleToBudget(costed, "doc_id",
      col("n_bpe_tokens"), budget)
    // the kept set is the md5-order prefix whose inclusive sum fits
    val costs = costed.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(r.length - 1)) 0L
        else r.getLong(r.length - 1))).toMap
    val order = costs.keys.toSeq.sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
    val expect = order.zip(order.scanLeft(0L)(_ + costs(_)).tail)
      .takeWhile(_._2 <= budget).map(_._1).toSet
    val got = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty && got.size < costs.size)
  }

  test("multilingual corpus trains and counts without the eow marker " +
      "colliding with real text") {
    val d = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 100)
    val bpe = BpeTokenizer.train(d, "text", numMerges = 12)
    assert(bpe.merges.length == 12)
    assert(bpe.merges.distinct.length == 12, "no merge repeats")
    val counts = BpeTokenizer.tokenCounts(d, "doc_id", "text", bpe)
    val n = counts.count()
    // BPE token count is bounded below by word count (merges only
    // shrink) and above by char count + words
    val joined = counts.join(
      d.select(col("doc_id"),
        graft.functions.TextAnalysis.wsTokenCount(col("text")).as("w"),
        length(col("text")).as("ch")), Seq("doc_id"))
    val bad = joined.filter(col("n_bpe_tokens") < col("w") ||
      col("n_bpe_tokens") > col("ch") + col("w")).count()
    assert(bad == 0 && n > 0)
  }
}
