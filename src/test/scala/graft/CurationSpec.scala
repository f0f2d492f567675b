package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Curation

/** Stage semantics of the corpus-curation pipeline (the composed result
  * is oracle-gated by q_corpus_curation; these pin each stage's own
  * contract on hand-built corpora).
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val en = "the cat and the dog walk to the old market in town today"
  def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("qualityGate drops short, symbol-heavy, and off-language docs") {
    val d = docs(
      0L -> en,                                   // keeps
      1L -> "too short",                          // < 5 tokens
      2L -> "### $$$ %%% !!! ??? *** ((( )))",    // punct ratio
      3L -> "der hund und die katze ist im haus") // predicted 'de'
    val kept = Curation.qualityGate(d, "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L))
  }

  test("dedupKeepFirst keeps the minimum id per normalized prefix") {
    val d = docs(
      5L -> (en + " trailing boilerplate variant one"),
      2L -> (en + " different suffix entirely here"),
      9L -> "a completely different document about spark engines at scale")
    // first 8 words identical for 5 and 2 -> keep 2
    val kept = Curation.dedupKeepFirst(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 9L))
  }

  test("dropNearDups removes the higher id of each candidate pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val d = docs(
      1L -> base,
      7L -> base,  // exact copy -> certain LSH candidate, higher id drops
      3L -> "one two three four five six seven eight nine ten eleven")
    val kept = Curation.dropNearDups(d, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("curate wires the stages in gate -> dedup -> near-dup order") {
    val d = docs(
      0L -> en,
      1L -> (en + " extra tail"),      // same 8-word prefix as 0 -> deduped
      2L -> "zzz qqq",                 // gated (short)
      3L -> "el gato y el perro de la casa que canta y baila hoy")
    val kept = Curation.curate(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L))
  }

  test("duplicateClusters labels every node with its component minimum") {
    import graft.functions.Dedup
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; {10,11,12}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 10L)
    assert(got == want)
    // a long chain converges within the bound...
    val chain = (0L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    val labs = Dedup.duplicateClusters(chain)
      .select("cluster").distinct().collect().map(_.getLong(0)).toSeq
    assert(labs == Seq(0L))
    // ...a component far WIDER than maxIters converges too — pointer
    // halving needs ~log2(diameter) rounds, not diameter (a 300-node
    // path under plain min-label would need 300 > 50 rounds; the
    // 5M-doc scale corpus hit exactly that with a replica chain)
    val longChain = (0L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val longLabs = Dedup.duplicateClusters(longChain)
      .select("cluster").distinct().collect().map(_.getLong(0)).toSeq
    assert(longLabs == Seq(0L))
    // ...and a bound below the log2 requirement THROWS instead of
    // silently splitting the component into wrong clusters (reach
    // after r rounds is 2^(r+1) - 2 hops: 3 rounds cover 14 < 15).
    // smallGraphEdgeCap = 0 pins the DISTRIBUTED loop — the r14 driver
    // union-find fast path would otherwise absorb a graph this small
    // and never reach the bound this guard exists to test
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxIters = 3, smallGraphEdgeCap = 0)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("duplicateClusters: driver fast path == distributed loop labels") {
    import graft.functions.Dedup
    // chains, a clique, singleton-free graph with out-of-order ids —
    // run both engines over the same pairs and compare label maps
    val pairs = Seq((9L, 2L), (2L, 31L), (31L, 1L), (5L, 7L),
      (10L, 11L), (11L, 12L), (10L, 12L), (40L, 41L)).toDF("a", "b")
    def labels(cap: Long): Map[Long, Long] =
      Dedup.duplicateClusters(pairs, smallGraphEdgeCap = cap)
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val fast = labels(Dedup.SmallGraphEdgeCap) // well under the cap
    val loop = labels(0)                       // distributed loop forced
    assert(fast == loop)
    assert(fast(1L) == 1L && fast(9L) == 1L && fast(31L) == 1L)
  }

  test("clustered near-dup removal keeps one doc per component where greedy keeps two") {
    import graft.functions.Dedup
    // three texts sharing enough shingles that LSH pairs (2,3) and
    // (1,3) but NOT (1,2): construct via two distinct halves bridged
    // by doc 3. Easier to pin the semantics directly on the pair graph:
    val pairs = Seq((2L, 3L), (1L, 3L)).toDF("a", "b")
    // greedy rule: drop ids appearing as the higher side -> drops only 3
    val greedySurvivors = Set(1L, 2L)
    val clusterSurvivors = Dedup.duplicateClusters(pairs)
      .filter(col("node") === col("cluster"))
      .collect().map(_.getLong(1)).toSet
    assert(clusterSurvivors == Set(1L))
    assert(greedySurvivors != clusterSurvivors,
      "the two semantics must differ on chained pairs")
  }

  test("repetition signals separate boilerplate loops from diverse text") {
    import graft.functions.TextAnalysis
    val d = docs(
      0L -> "buy now click here buy now click here buy now click here",
      1L -> "the quick brown fox jumps over a lazy dog near the river")
    val m = d.select(col("doc_id"),
        TextAnalysis.dupWordFraction(col("text")).as("dw"),
        TextAnalysis.topNgramCharFraction(col("text")).as("tg"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(m(0L)._1 > 0.5 && m(1L)._1 < 0.2,
      s"dup-word fraction must separate: $m")
    assert(m(0L)._2 > 0.4 && m(1L)._2 < 0.35,
      s"top-ngram char fraction must separate: $m")
    // structural edges: below-n-words and empty text score 0
    val z = docs(9L -> "two words", 10L -> "")
    z.select(TextAnalysis.topNgramCharFraction(col("text")))
      .collect().foreach(r => assert(r.getDouble(0) == 0.0))
  }

  test("curation decisions are insensitive to partitioning") {
    val d = docs((0L to 40L).map(i =>
      i -> (if (i % 3 == 0) en + s" variant ${i / 3}"
            else s"unique document number $i with plenty of the usual " +
              s"english filler words in the middle of it")): _*)
    def run(parts: Int): Set[Long] =
      Curation.curate(d.repartition(parts), "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(1) == run(7))
  }

  // ---- quantileBuckets -----------------------------------------------

  def scored(rows: (Long, String, java.lang.Double)*): DataFrame =
    rows.toDF("id", "grp", "score")

  test("quantileBuckets equals the naive per-group window rank split") {
    // adversarial scores: heavy ties (forces the id tie-break), two
    // groups of coprime sizes (13, 29) against 3 buckets
    val rows = (0L until 42L).map(i =>
      (i, if (i % 3 == 0) "a" else "b",
        java.lang.Double.valueOf((i % 5).toDouble)))
    val d = scored(rows: _*)
    val got = Curation.quantileBuckets(d, "id", "score", Seq("grp"), 3)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy(col("score"), col("id"))
    val naive = d
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("grp")))
      .select(col("id"),
        expr("CAST(((rn - 1) * 3) div cnt AS INT)").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == naive)
  }

  test("quantileBuckets: exact near-equal tercile sizes per group") {
    val d = scored((0L until 31L).map(i =>
      (i, "g", java.lang.Double.valueOf(i.toDouble * 0.1))): _*)
    val sizes = Curation.quantileBuckets(d, "id", "score", Seq("grp"), 3)
      .groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 31 = 11 + 10 + 10, largest remainder first
    assert(sizes == Map(0 -> 11L, 1 -> 10L, 2 -> 10L))
    // bucket 0 holds the LOWEST scores
    val b0max = Curation.quantileBuckets(d, "id", "score", Seq("grp"), 3)
      .filter(col("bucket") === 0).agg(max("id")).head().getLong(0)
    assert(b0max == 10L)
  }

  test("quantileBuckets excludes null scores and survives repartitioning") {
    val d = scored((0L until 20L).map(i =>
      (i, "g", if (i % 4 == 0) null
        else java.lang.Double.valueOf(i.toDouble))): _*)
    def run(parts: Int): Map[Long, Int] =
      Curation.quantileBuckets(d.repartition(parts), "id", "score",
        Seq("grp"), 4).select("id", "bucket")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r1 = run(1)
    assert(!r1.keySet.exists(_ % 4 == 0), "null-scored ids must be absent")
    assert(r1.size == 15)
    assert(r1 == run(7))
  }

  // ---- packSequences -------------------------------------------------

  test("packSequences: spans tile each sequence exactly, docs split at " +
      "boundaries, token accounting is lossless") {
    val d = docs((0L until 12L).map(i =>
      i -> (Seq.fill(7)("tok") :+ s"d$i").mkString(" ")): _*) // 8 tokens each
    val spans = Curation.packSequences(d, "doc_id", "text", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 96 tokens / 10 -> sequences 0..9, last one short (6 tokens)
    assert(spans.map(_._1).toSet == (0L until 10L).toSet)
    // every token packed exactly once
    assert(spans.map(_._5).sum == 96L)
    // per-doc: spans reassemble the doc contiguously from offset 0
    spans.groupBy(_._2).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"doc $id must start at offset 0")
      assert(sorted.map(_._5).sum == 8L, s"doc $id packs all 8 tokens")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3,
          s"doc $id spans must be contiguous")
        case _ =>
      }
    }
    // per-sequence: spans tile [0, 10) (or [0, 6) for the tail seq)
    spans.groupBy(_._1).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"seq $seq must start at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4,
          s"seq $seq spans must be contiguous")
        case _ =>
      }
      val len = sorted.map(_._5).sum
      assert(if (seq == 9L) len == 6L else len == 10L)
    }
    // null-text docs are zero-token (empty text is ONE whitespace token
    // by the wsTokenCount convention) and pack nothing; repartition-safe
    val withEmpty = d.union(
      docs(99L -> null.asInstanceOf[String]).select("doc_id", "text"))
    val again = Curation.packSequences(withEmpty.repartition(5),
      "doc_id", "text", 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(!again.map(_._2).contains(99L))
    assert(again.toSet == spans.toSet)
  }

  // ---- weightedSample ------------------------------------------------

  test("weightedSample: deterministic, weight-monotone in expectation, " +
      "excludes non-positive weights") {
    val rows = (0L until 200L).map(i =>
      (i, "g", java.lang.Double.valueOf(if (i < 100) 10.0 else 0.1)))
    val d = scored(rows: _*).withColumnRenamed("score", "w")
      .union(Seq((500L, "g", null: java.lang.Double),
        (501L, "g", java.lang.Double.valueOf(0.0)),
        (502L, "g", java.lang.Double.valueOf(-3.0)))
        .toDF("id", "grp", "w"))
    def run(parts: Int): Set[Long] =
      Curation.weightedSample(d.repartition(parts), "id", "w", 50)
        .select("id").collect().map(_.getLong(0)).toSet
    val s1 = run(1)
    assert(s1.size == 50)
    assert(!s1.exists(_ >= 500L), "null/zero/negative weights never drawn")
    assert(s1 == run(7), "the draw is partitioning-insensitive")
    // 100:1 weight ratio -> the heavy half dominates the sample
    val heavy = s1.count(_ < 100L)
    assert(heavy >= 45, s"heavy-weight docs must dominate, got $heavy/50")
  }

  // ---- chunkDocs -----------------------------------------------------

  test("chunkDocs: stride/overlap tiling, tail chunk, no redundant " +
      "windows, short docs intact") {
    val words20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = docs(0L -> words20, 1L -> "a b c", 2L -> "", 3L -> null)
    val got = Curation.chunkDocs(d, "doc_id", "text",
        chunkTokens = 8, overlapTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3)))
    // doc 0: 20 tokens, stride 5 -> starts 0,5,10,15 (15 < 20-3=17)
    val c0 = got.filter(_._1 == 0L).sortBy(_._2)
    assert(c0.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(c0.map(_._3).toSeq == Seq(8, 8, 8, 5), "tail chunk short")
    assert(c0.head._4 == (1 to 8).map(i => s"w$i").mkString(" "))
    assert(c0.last._4 == (16 to 20).map(i => s"w$i").mkString(" "))
    // consecutive chunks overlap by exactly overlapTokens (full chunks)
    assert(c0(0)._4.split(" ").takeRight(3).toSeq ==
      c0(1)._4.split(" ").take(3).toSeq)
    // every token appears; union of chunks reconstructs the doc
    assert(c0.flatMap(_._4.split(" ")).distinct.length == 20)
    // doc 1: shorter than one chunk -> exactly one whole-doc chunk
    assert(got.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 3, "a b c")))
    // empty text = one empty token after filter... actually filtered to
    // zero tokens -> absent, like null
    assert(!got.exists(r => r._1 == 2L || r._1 == 3L))
    // partitioning-insensitive
    val again = Curation.chunkDocs(d.repartition(5), "doc_id", "text", 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3)))
    assert(again.toSet == got.toSet)
  }

  // ---- epochMix ------------------------------------------------------

  test("epochMix: integer repeats exact, fractional keep near rate, " +
      "absent domains dropped, deterministic") {
    val d = (0L until 400L).map(i =>
      (i, if (i < 200) "up" else if (i < 300) "keep" else "gone"))
      .toDF("id", "dom")
    val factors = Map("up" -> 2.5, "keep" -> 1.0)
    def run(parts: Int) = Curation.epochMix(
        d.repartition(parts), "id", "dom", factors)
      .select("id", "dom", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = run(1)
    assert(rows.forall(_._2 != "gone"), "unlisted domain drops")
    val keepRows = rows.filter(_._2 == "keep")
    assert(keepRows.length == 100 && keepRows.forall(_._3 == 1L),
      "factor 1.0 = exactly one copy each")
    val upByDoc = rows.filter(_._2 == "up").groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(upByDoc.size == 200, "every doc appears")
    assert(upByDoc.values.forall(e =>
      e == (1L to e.length).toSeq), "epochs are dense from 1")
    val copies = upByDoc.values.map(_.length).toSeq
    assert(copies.forall(n => n == 2 || n == 3),
      "factor 2.5 = two or three copies")
    val three = copies.count(_ == 3)
    assert(three > 60 && three < 140,
      s"~half the docs get the third copy, got $three/200")
    assert(run(7).sortBy(r => (r._1, r._3)).toSeq ==
      rows.sortBy(r => (r._1, r._3)).toSeq)
    // the ep: salt decorrelates from the raw md5(id) sampling order
    val md5Rank = (0L until 200L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).take(three).toSet
    val gotThird = upByDoc.filter(_._2.length == 3).keySet
    assert(gotThird != md5Rank, "salted draw must differ from md5(id) order")
  }

  // ---- capPerGroup ---------------------------------------------------

  test("capPerGroup keeps exactly cap docs per group, md5-deterministic") {
    val d = scored((0L until 50L).map(i =>
      (i, if (i < 40) "big" else "small", java.lang.Double.valueOf(0.0))): _*)
    def run(parts: Int): Map[String, Set[Long]] =
      Curation.capPerGroup(d.repartition(parts), "id", Seq("grp"), 12)
        .select("grp", "id").collect()
        .groupBy(_.getString(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
    val r = run(1)
    assert(r("big").size == 12, "over-cap group is capped")
    assert(r("small") == (40L until 50L).toSet, "under-cap group untouched")
    assert(r == run(7), "selection is partitioning-insensitive")
    // the kept set is the md5-rank prefix, not the id prefix
    val md5Order = (0L until 40L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(r("big") == md5Order.take(12).toSet)
  }

  test("bucket-offset cardinality contract: 1e5 sparse groups work, " +
      "over-cap offset tables fail loudly") {
    // 100k one-doc domains: only 100k (group, bucket) combos exist —
    // well under MaxOffsetRows, so the per-domain cap just works
    val sparse = spark.range(100000L)
      .select(col("id"), concat(lit("host-"), col("id")).as("grp"))
    assert(Curation.capPerGroup(sparse, "id", Seq("grp"), 1).count()
      == 100000L)
    // 1.3M distinct domains → 1.3M offset rows > MaxOffsetRows (2^20):
    // the take-probe guard raises the documented contract error instead
    // of OOMing the driver
    val flood = spark.range((Curation.MaxOffsetRows + 250000).toLong)
      .select(col("id"), concat(lit("host-"), col("id")).as("grp"))
    val e = intercept[IllegalArgumentException] {
      Curation.capPerGroup(flood, "id", Seq("grp"), 1).count()
    }
    assert(e.getMessage.contains("bounded-cardinality"))
  }
}
