package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level structural cleaning — the C4 / RefinedWeb family of
  * filters that operate on a document's LINES rather than its tokens:
  * per-line rule filtering (too-short lines, boilerplate phrases,
  * missing terminal punctuation), corpus-level frequent-line removal
  * (navigation chrome appearing across many documents), and the two
  * line-shape Gopher rules (bullet-start / ellipsis-end fractions) that
  * [[TextAnalysis.gopherPass]] deliberately leaves out.
  *
  * Everything per-document is pure Column math over the split-line
  * array (codegen'd, deterministic on any engine/partitioning).
  * [[dropFrequentLines]] is relational: one (doc, line) explode, a
  * document-frequency aggregate, an anti-join, and an ordered
  * reassembly — the frequent-line table is tiny by construction
  * (lines crossing the threshold), so the anti-join broadcasts.
  */
object LineClean {

  /** Newline-split lines (one empty line for empty text — callers'
    * rules treat it like any other too-short line). */
  def lines(text: Column): Column = split(text, "\n")

  /** Phrases whose presence (case-insensitive) drops a line — the C4
    * boilerplate list shape. */
  val defaultBlocklist: Seq[String] =
    Seq("lorem ipsum", "javascript", "cookie policy", "terms of use")

  /** The HTML-strip patterns, public so the DuckDB oracle interpolates
    * the SAME strings (RE2-safe: inline `(?is)` flags, `\b`, and lazy
    * `.*?` behave identically in Java regex and RE2). Script and style
    * blocks vanish whole (their text is code, not prose) — PER-TAG
    * patterns, because RE2 has no backreferences and a combined
    * `(script|style)…(script|style)` alternation would let `</style>`
    * terminate a `<script>` block and leak its code; the `\b` stops
    * `<styles>`/`<script-loader>` prefixes from being read as block
    * openers. The whitespace run is an EXPLICIT class: Java's `\s`
    * includes U+000B, RE2's does not — the one place the two engines'
    * regex dialects disagree on these patterns. */
  val scriptBlockPattern = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  val styleBlockPattern = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  val commentPattern = "(?s)<!--.*?-->"
  val tagPattern = "<[^>]*>"
  val wsRunPattern = "[ \\t\\n\\f\\r\\x0B]+"

  /** Crude-but-deterministic HTML → text extraction (the RefinedWeb /
    * C4 upstream step, as engine-portable column math rather than a
    * parser UDF): script/style/comment blocks removed, tags spaced
    * out, the five ubiquitous entities decoded (`&amp;` LAST, so
    * `&amp;lt;` yields the literal `&lt;` it encodes rather than
    * double-decoding), whitespace squeezed. A real DOM parser handles
    * malformed nesting better; this form runs inside whole-stage
    * codegen at scan speed and two engines agree byte-for-byte —
    * the trade the rest of this package makes everywhere. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, scriptBlockPattern, " "),
        styleBlockPattern, " "),
      commentPattern, " ")
    val noTags = regexp_replace(noBlocks, tagPattern, " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, wsRunPattern, " "))
  }

  /** Fraction of lines starting with a bullet glyph (Gopher line rule:
    * docs that are mostly bullet lists are not prose). 0 for empty. */
  def bulletLineFraction(text: Column): Column = {
    val ls = lines(text)
    size(filter(ls, l => l.rlike("^[-*•]"))).cast("double") /
      size(ls).cast("double")
  }

  /** Fraction of lines ending in an ellipsis ('...' or '…') — the
    * truncated-content signal. */
  def ellipsisLineFraction(text: Column): Column = {
    val ls = lines(text)
    size(filter(ls, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") /
      size(ls).cast("double")
  }

  /** Per-line C4 cleaning: keep lines with at least `minWords`
    * whitespace tokens, containing no blocklisted phrase
    * (case-insensitive substring), and — when `requireTerminal` — ending
    * in terminal punctuation. Kept lines re-join with '\n' in original
    * order; a document losing every line becomes the empty string (a
    * downstream [[Curation.qualityGate]] removes those). */
  def cleanLines(text: Column, minWords: Int = 3,
      requireTerminal: Boolean = false,
      blocklist: Seq[String] = defaultBlocklist): Column = {
    // lowercase the phrases too — matching is lower(line) CONTAINS
    // phrase, so a mixed-case caller entry would silently never match
    val phrases = blocklist.map(_.toLowerCase)
    val keep = (l: Column) => {
      val base = size(split(l, "\\s+")) >= minWords &&
        !exists(typedlit(phrases), p => contains(lower(l), p))
      if (requireTerminal) base && l.rlike("[.!?]$") else base
    }
    array_join(filter(lines(text), keep), "\n")
  }

  /** Shared scaffolding of the corpus-level line passes: ONE persisted
    * (id, pos, line) explode feeds whatever keep-rule the caller
    * derives from it (the repeatedKgramSpans materialization
    * rationale — the corpus is scanned and exploded once); reassembly
    * is an in-group position sort (deterministic — never a window over
    * a global order). Every other column of `docs` is preserved; a
    * document losing every line keeps an empty string. */
  private def rewriteLines(docs: DataFrame, idCol: String,
      textCol: String)(keep: DataFrame => DataFrame): DataFrame = {
    val ex = docs.select(col(idCol),
        posexplode(lines(col(textCol))).as(Seq("__pos", "__line")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rebuilt = keep(ex)
      .groupBy(idCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line")), "\n").as("__cleaned"))
    docs
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__cleaned"), lit("")))
      .drop("__cleaned")
  }

  /** Corpus-level frequent-line removal: delete from EVERY document the
    * lines occurring in more than `maxDocs` distinct documents — the
    * RefinedWeb-style boilerplate pass that catches navigation chrome /
    * footers which per-document rules cannot see. Returns `docs` with
    * `textCol` rewritten (all other columns preserved); a document
    * losing every line keeps an empty string.
    *
    * Scale shape: the document-frequency aggregate keys on md5(line)
    * so the shuffle carries 16-byte keys, not line text; lines above
    * the threshold are few by construction → broadcast anti-join. */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      maxDocs: Long): DataFrame =
    rewriteLines(docs, idCol, textCol) { ex =>
      val frequent = ex
        .groupBy(md5(col("__line")).as("__lh"))
        .agg(countDistinct(col(idCol)).as("__nd"))
        .filter(col("__nd") > maxDocs)
        .select("__lh")
      ex.withColumn("__lh", md5(col("__line")))
        .join(broadcast(frequent), Seq("__lh"), "left_anti")
        .drop("__lh")
    }

  /** CCNet-style corpus-level paragraph dedup: of each distinct
    * non-empty paragraph (newline-split segment), only the FIRST
    * occurrence in the corpus — smallest (document id, position) —
    * survives; every later occurrence is deleted from its document.
    * EMPTY segments (blank separator lines) are structure, not
    * content: they are exempt and survive everywhere — without the
    * exemption every multi-paragraph document but one would lose its
    * blank lines to corpus-wide dedup. Differs from
    * [[dropFrequentLines]] on purpose: that pass deletes ALL
    * occurrences of lines crossing a document-frequency threshold;
    * this one always keeps exactly one copy, so repeated content is
    * thinned without ever being lost (the CCNet paragraph-hash dedup
    * semantics).
    *
    * Scale shape: first occurrences come from a map-side-combinable
    * `min(struct(id, pos))` keyed on md5(paragraph) — never a per-key
    * window, so a paragraph duplicated across millions of documents
    * cannot pile onto one reducer. Only duplicated paragraphs
    * (count >= 2) enter the join; unique paragraphs — the
    * overwhelming majority of a real corpus — skip it via the
    * left-join null branch. */
  def dedupParagraphs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    rewriteLines(docs, idCol, textCol) { ex =>
      val dupFirst = ex
        .filter(length(col("__line")) > 0)
        .groupBy(md5(col("__line")).as("__lh"))
        .agg(min(struct(col(idCol).as("id"), col("__pos").as("pos")))
            .as("__first"),
          count(lit(1)).as("__n"))
        .filter(col("__n") >= 2)
        .select("__lh", "__first")
      ex.withColumn("__lh", md5(col("__line")))
        .join(dupFirst, Seq("__lh"), "left")
        .filter(col("__first").isNull ||
          (col(idCol) === col("__first.id") &&
            col("__pos") === col("__first.pos")))
        .drop("__lh", "__first")
    }
}
