package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting. All are
  * pure Column expressions (codegen'd, no UDFs) so they run inside
  * whole-stage codegen at 100 TB scan scale, and all hashing is md5-based
  * so a DuckDB oracle can reproduce results bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens (any run of whitespace separates; mirrors the
    * DuckDB oracle's string_split_regex('\\s+')). */
  def words(text: Column): Column = split(text, "\\s+")

  def wsTokenCount(text: Column): Column = size(words(text))

  /** Run-length fold over a SORTED array: applies `measure(runLength,
    * element)` as each run of equal elements ends (in sorted order,
    * left to right) and combines with `combine`. O(t log t) sort +
    * O(t) fold, replacing the O(distinct·t) count-each-distinct scan —
    * the difference between t² and t log t on real prose where most
    * tokens are distinct. The accumulator carries (prev, run, acc);
    * run = 0 marks "no element seen" so an empty-string element can't
    * be confused with the initial state. */
  private def sortedRunFold(arr: Column, init: Column,
      measure: (Column, Column) => Column,
      combine: (Column, Column) => Column): Column = {
    val sorted = array_sort(arr)
    val folded = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), init.as("acc")),
      (st, x) => {
        val prev = st.getField("prev")
        val run = st.getField("run")
        val acc = st.getField("acc")
        when(run === 0L,
          struct(x.as("prev"), lit(1L).as("run"), acc.as("acc")))
          .when(x === prev,
            struct(prev.as("prev"), (run + 1L).as("run"), acc.as("acc")))
          .otherwise(struct(x.as("prev"), lit(1L).as("run"),
            combine(acc, measure(run, prev)).as("acc")))
      },
      st => when(st.getField("run") === 0L, st.getField("acc"))
        .otherwise(combine(st.getField("acc"),
          measure(st.getField("run"), st.getField("prev")))))
    folded
  }

  /** Per-row dispatch bound between the two distinct-count strategies:
    * at or below this many distinct elements, the O(distinct·t)
    * count-each-distinct scan beats the O(t log t) [[sortedRunFold]]
    * (the fold's struct accumulator has a ~5x constant, measured on
    * the bench corpus); real prose has distinct ≈ t and needs the
    * fold or the scan goes quadratic. Both strategies add the same
    * terms in the same sorted order, so the dispatch can never change
    * a result — only the cost. */
  private val runFoldDispatch = 64

  /** Shannon entropy (base 2) of the token distribution — the standard
    * gibberish/boilerplate signal: repeated boilerplate scores near 0,
    * natural text sits in the middle, random soup near log2(n_tokens).
    * Deterministic across engines AND partitionings by construction:
    * counts are exact integers and the −Σ p·log2 p terms are added in
    * SORTED-token order on both sides (a group-by entropy aggregate
    * would sum floats in shuffle order) — under BOTH per-row
    * strategies ([[runFoldDispatch]]), so the adaptive dispatch is
    * invisible in the results. */
  def tokenEntropy(text: Column): Column = {
    val toks = words(text)
    val n = size(toks).cast("double")
    val scan = aggregate(array_sort(array_distinct(toks)), lit(0.0),
      (acc, t) => {
        val p = size(filter(toks, x => x === t)).cast("double") / n
        acc + p * log2(p)
      })
    val fold = sortedRunFold(toks, lit(0.0),
      (run, _) => {
        val p = run.cast("double") / n
        p * log2(p)
      },
      (a, b) => a + b)
    // dispatch on the UNSORTED distinct count: the fold path (large
    // docs) must not pay a distinct-array sort just to be chosen
    lit(0.0) -
      when(size(array_distinct(toks)) <= runFoldDispatch, scan)
        .otherwise(fold)
  }

  /** BPE-ish token count: letter runs, single digits, single symbols. */
  val tokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit(tokenPattern))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = defaultStopwords): Column = {
    val w = words(text)
    val hits = size(filter(w, t => array_contains(typedlit(stopwords), t)))
    hits.cast("double") / size(w).cast("double")
  }

  /** Mean token length. */
  def avgWordLen(text: Column): Column = {
    val w = words(text)
    aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(w).cast("double")
  }

  /** Fraction of non-alphanumeric, non-space characters (0 for empty
    * text — a null ratio would silently drop rows from quality filters).
    * The count is the compiled CharClassMissCount, semantics-identical
    * to `regexp_count(text, "[^A-Za-z0-9 ]")` (the DuckDB oracle keeps
    * the regex form) but ~100× cheaper — this ratio sits inside every
    * quality-gate pass. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      graft.expressions.CharClassMissCount.char_class_miss_count(text,
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 ")
        .cast("double") /
        length(text).cast("double")).otherwise(lit(0.0))

  /** Composite quality score in [0,1]: long-enough docs with normal word
    * length, few symbols, and some (but not only) stopwords score high.
    * Rounded to 4 dp via `floor(x·10⁴ + 0.5)/10⁴` — pure double math
    * that is bit-identical in every engine, unlike round(): Spark
    * rounds HALF_UP on the double's exact binary expansion while
    * DuckDB multiplies first, and a score landing on a decimal .5
    * boundary (easy here — the terms are small-integer ratios) flips
    * the last digit between them (caught by the q_quality_select hash
    * at sf0.1: one doc in 5000). Non-negative input, so the +0.5 floor
    * IS half-up. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val wordScore = lit(1.0) -
      least(abs(avgWordLen(text) - lit(5.0)) / lit(5.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0))
    floor((lenScore + wordScore + punctScore) / 3.0 * 10000.0 + 0.5) /
      10000.0
  }

  /** Stopword profiles for the n-gram/stopword-heuristic language ID. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Deterministic language ID: argmax of per-language stopword hits with
    * fixed tie-break priority = profile order. */
  def langId(text: Column): Column = {
    val w = words(text)
    val scores = langProfiles.map { case (lang, stops) =>
      lang -> size(filter(w, t => array_contains(typedlit(stops), t)))
    }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, score), i), elseCol) =>
        val restMax = scores.drop(i + 1).map(_._2)
          .reduceLeft((x, y) => greatest(x, y))
        when(score >= restMax, lang).otherwise(elseCol)
    }
  }

  /** Fraction of tokens that repeat an earlier token — the Gopher-style
    * duplicate-content signal (1 − distinct/total; 0 when every token
    * is unique, →1 for pure boilerplate loops). */
  def dupWordFraction(text: Column): Column = {
    val w = words(text)
    lit(1.0) -
      size(array_distinct(w)).cast("double") / size(w).cast("double")
  }

  /** Max over word n-grams of `occurrences × n-gram chars / total
    * chars` — the "fraction of characters in the most repeated n-gram"
    * repetition signal, made deterministic by maximizing the PRODUCT
    * directly (an argmax-by-count would need a tie-break; the max of a
    * scalar needs none). 0 for docs below n words or empty text.
    * Same adaptive dispatch as [[tokenEntropy]]: count-each-distinct
    * scan for small vocabularies, run-length fold over the sorted
    * shingle array past [[runFoldDispatch]] distinct shingles (a max
    * is order-insensitive, so the dispatch is invisible in results).
    * Callers composing several metrics should project the shingle
    * array once (the q_fingerprint CollapseProject lesson). */
  def topNgramCharFraction(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    val uniq = array_distinct(sh)
    val scan = array_max(transform(uniq,
      x => (size(filter(sh, y => y === x)) * length(x)).cast("double")))
    val fold = sortedRunFold(sh, lit(0.0),
      (run, x) => (run * length(x)).cast("double"),
      (a, b) => greatest(a, b))
    when(size(sh) > 0 && length(text) > 0,
      when(size(uniq) <= runFoldDispatch, scan).otherwise(fold)
        / length(text).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Word n-gram shingles ("a b c" windows); empty array below n words.
    *
    * Built from n−1 `zip_with` passes over shifted copies of the word
    * array — O(n) whole-array operations per DOC instead of one
    * slice+array_join allocation per SHINGLE: measured 2-4x faster
    * than the per-shingle slice across every shingle-heavy query at
    * sf0.1 (q_top_ngrams 3.2→0.8 s, q_minhash_lsh 4.2→1.7 s). A
    * per-element `element_at` formulation measured 2.5x SLOWER than
    * even the slice version (per-call bounds/null handling) — the
    * ranking is zip_with ≫ slice-per-shingle ≫ element_at.
    *
    * The shifted copy is exhausted for the last i entries, where
    * zip_with pads with null and concat_ws SKIPS the null — those
    * partial tail entries are cut by the final slice, and every kept
    * entry j is exactly `w(j) ⧺ " " ⧺ … ⧺ w(j+n−1)`, byte-identical to
    * the oracle's array_to_string windows (79/79 hash-verified). */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromWords(words(text), n)

  /** [[shingles]] over an ALREADY-SPLIT word array. The shingle tree
    * references its word array ~6 times (the zip_with chain, two
    * slices, three size() guards); inlining `split(text)` at every
    * reference makes the scan's Generate re-run the regex split six
    * times per row (r14, read off the q_ngram_jaccard physical plan).
    * Callers on the hot path project `words(text)` into a named column
    * in a PRECEDING select and pass that attribute here — the multi-
    * reference, non-cheap alias keeps CollapseProject from inlining it
    * back (the q_fingerprint lesson), so the split runs once per row.
    * The expression tree is otherwise identical to [[shingles]]. */
  def shinglesFromWords(w: Column, n: Int = 3): Column = {
    val zipped = (1 until n).foldLeft(w) { (acc, i) =>
      zip_with(acc, slice(w, lit(i + 1), size(w)),
        (a, b) => concat_ws(" ", a, b))
    }
    when(size(w) >= n, slice(zipped, lit(1), size(w) - (n - 1)))
      .otherwise(array())
  }

  /** THE repo's engine-portable rounding: `floor(x·10ⁿ + 0.5)/10ⁿ` —
    * pure double math, bit-identical on any IEEE engine, unlike
    * `round()` (Spark rounds HALF_UP on the exact binary expansion
    * while DuckDB multiplies first; a value on a decimal .5 boundary
    * flips the last digit between them — caught live at sf0.1, see
    * [[qualityScore]]). Half-up for NON-NEGATIVE x only (for x < 0
    * this floor form rounds half-toward-+∞, not half-away). One copy
    * on purpose: the portability argument lives here, not in every
    * caller. */
  def halfUpFloor(x: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(x * p + 0.5) / p
  }

  /** Adjacent element pairs of an array, joined by `sep` (`[a,b,c]` →
    * `[a⧺sep⧺b, b⧺sep⧺c]`; empty below two elements) — the ONE copy of
    * the shifted-zip pair construction shared by [[graft.functions.LangModel.bigrams]]
    * and `BpeTokenizer.pairKeys` (the n-ary generalization with
    * different tail semantics is [[shingles]]). */
  def adjacentPairs(arr: Column, sep: String): Column =
    when(size(arr) >= 2, slice(
      zip_with(arr, slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
        (a, b) => concat_ws(sep, a, b)),
      lit(1), size(arr) - 1)).otherwise(array())

  /** Everything that is not a Unicode letter or digit, as one regex
    * class shared with the DuckDB oracles (interpolated, never
    * copied) — \p{L}/\p{Nd} behave identically in Java regex and RE2,
    * so CJK text and accented letters survive normalization on both
    * engines. */
  val normalizePattern = """[^\p{L}\p{Nd}]+"""

  /** Canonical text normalization for keying/matching: lowercase,
    * non-letters/digits to spaces, whitespace squeezed and trimmed —
    * the pre-dedup canon so "Hello,  World!" and "hello world" key
    * identically (compose `prefixKey(normalizeText(c))`, or set
    * `normalizeKeys` on Curation, for case/punct-insensitive dedup).
    * Unicode-aware: CJK and accented letters are kept, so the canon
    * works on the multilingual corpus, not just ASCII. Cross-engine
    * caveat: a handful of full case mappings (e.g. U+0130 İ) lower
    * differently under Java and utf8proc — identical on ASCII and on
    * common Unicode, verified by the hash gate over the multilingual
    * testdata, but not a bit-for-bit guarantee on every code point. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), normalizePattern, " "))

  /** The prefix dedup key shared by batch dedup
    * (`Curation.dedupKeepFirst`), the incremental ledger
    * (`sources.DedupLedger`), and their oracles: md5 of the
    * first-`prefixWords` whitespace tokens. ONE definition on purpose —
    * incremental and batch dedup must make the SAME decisions, and a
    * normalization tweak applied to only one copy would silently split
    * them. Null text keys like empty text (coalesced before hashing):
    * md5(NULL) is NULL in every engine, and a NULL key matches nothing
    * in an anti-join, so un-coalesced null-text docs would pass the
    * ledger in every batch forever and poison a SQL oracle's NOT IN. */
  def prefixKey(text: Column, prefixWords: Int = 8): Column =
    md5(coalesce(array_join(slice(words(text), 1, prefixWords), " "),
      lit("")))

  /** k-min-style document fingerprint: the lexicographic min md5 over the
    * doc's distinct shingles (portable rolling-hash stand-in — md5 exists
    * identically in every engine). */
  def fingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(array_distinct(shingles(text, n)), sh => md5(sh)))

  // ---- Gopher-style rule filters (Rae et al. 2021, MassiveText C.1) --

  /** Symbol-to-word ratio: occurrences of '#' or ellipsis ('...' or
    * '…') per token — the symbol-spam signal. Non-overlapping regex
    * counts with the same alternation order on both engines. */
  def symbolWordRatio(text: Column): Column = {
    val syms = regexp_count(text, lit("#|\\.\\.\\.|…"))
    syms.cast("double") / wsTokenCount(text).cast("double")
  }

  /** Fraction of tokens containing at least one letter (Unicode-aware:
    * \p{L} matches CJK and accented letters under both Java regex and
    * RE2). 0 for empty text. */
  def alphaWordFraction(text: Column): Column = {
    val w = words(text)
    when(size(w) > 0,
      size(filter(w, t => t.rlike("\\p{L}"))).cast("double") /
        size(w).cast("double")).otherwise(lit(0.0))
  }

  /** Gopher's required-stopword list: a doc of real running English
    * prose contains at least [[gopherMinStopwords]] of these. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val gopherMinStopwords = 2

  /** How many of `stops` occur in the text at least once (distinct
    * stopwords hit, not total occurrences). */
  def stopwordsPresent(text: Column,
      stops: Seq[String] = gopherStopwords): Column = {
    val w = words(text)
    size(filter(typedlit(stops), s => array_contains(w, s)))
  }

  /** The Gopher quality-rule conjunction over one text column (the
    * document-shape subset — the two line-shape rules, bullet-start and
    * ellipsis-end fractions, live with the line operators in
    * [[LineClean]] since they need a line structure to inspect):
    * word count within bounds, mean word length in [3, 10],
    * symbol-to-word ratio ≤ 0.1, ≥ 80% words with a letter, ≥ 2
    * required stopwords, duplicate-word fraction ≤ 0.3 and top-3-gram
    * char fraction ≤ 0.2 (this package's forms of the paper's
    * duplicate-content family).
    *
    * Every threshold comparison happens on a SINGLE IEEE division of
    * exact integer counts — bit-identical across engines, so the
    * boolean is hash-stable without any rounding step. */
  def gopherPass(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val n = wsTokenCount(text)
    n.between(minWords, maxWords) &&
      avgWordLen(text).between(3.0, 10.0) &&
      symbolWordRatio(text) <= 0.1 &&
      alphaWordFraction(text) >= 0.8 &&
      stopwordsPresent(text) >= gopherMinStopwords &&
      dupWordFraction(text) <= 0.3 &&
      topNgramCharFraction(text) <= 0.2
  }
}
