package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over the corpus — the search primitive a
  * training-data pipeline uses for quality probes, contamination
  * spot-checks, and dedup debugging ("show me the docs that look like
  * this"). Okapi BM25 with the standard k1/b parameterization.
  *
  * Engine-portability contract (the [[LangModel]] trick applied to
  * retrieval): every per-(token, doc) score term is computed from
  * EXACT integers (tf, df, doc length, corpus totals) and float
  * literals through a fixed sequence of IEEE operations, then
  * immediately floored to integral micro-points; a document's score is
  * the order-free INTEGER sum of its matched terms, and ranking
  * orders by (score_micro desc, doc asc) — fully deterministic on any
  * engine or partitioning. IDF uses the raw Robertson form
  * `ln((N − df + 0.5)/(df + 0.5))`, which goes NEGATIVE for tokens in
  * more than half the corpus. Rounding is `floor(x·10⁶ + 0.5)`
  * UNIFORMLY — round-half-up toward +∞ for every sign (for negative
  * values that is NOT half-away-from-zero); any mirror must apply the
  * identical expression to every term, positive or negative.
  *
  * Scale shape: the index is one explode + two aggregations (postings
  * keyed by (doc, token) with map-side combine; doc lengths ride the
  * same pass). A query filters postings to its own tokens BEFORE any
  * join — the scan prunes on the token column — and joins the
  * handful of matched-idf rows by broadcast. In production the
  * postings/df frames persist as parquet (partition by token prefix)
  * and every query reuses them; here they build per call like the
  * other gated paths. */
object TextRetrieval {

  /** A built BM25 index: postings (token, doc, tf, len), document
    * frequencies (token, df), the indexed doc count, and the total
    * token count (avgdl = totalTokens/nDocs). Docs with zero tokens
    * are not indexed (they can never match). */
  final case class Bm25Index(postings: DataFrame, docFreq: DataFrame,
      nDocs: Long, totalTokens: Long)

  private def tokens(text: org.apache.spark.sql.Column) =
    F.filter(TextAnalysis.words(text), t => length(t) > 0)

  def buildBm25(docs: DataFrame, idCol: String,
      textCol: String): Bm25Index = {
    // tokenization + the explode run in the scan's map tasks — spread a
    // single-split corpus first (postings are integer counts:
    // partition-independent; Spread.across is a no-op at scale)
    val postings = Spread.across(docs)
      .select(col(idCol).as("doc"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // lens and docFreq are CACHED AGGREGATES, not lazy derivations
    // (r14): left lazy, every search re-aggregated them from the full
    // postings cache — profiled three ~full-postings cache scans per
    // q_bm25 execution (~11 s summed task time each at sf0.1) where
    // the search itself needs one. Both are far smaller than postings
    // (one row per doc / per distinct token); materializing them at
    // build time leaves the search exactly one postings scan (its own
    // token-filtered join side). The totals action materializes lens
    // and, through it, postings — serially, so no sibling stage races
    // the explode — then docFreq aggregates the already-cached
    // postings once.
    val lens = postings.groupBy("doc").agg(sum("tf").as("len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docFreq = postings.groupBy("token").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withLen = postings.join(lens, Seq("doc"))
    val totals = lens.agg(count(lit(1)), coalesce(sum("len"), lit(0L)))
      .head()
    docFreq.count()
    Bm25Index(withLen, docFreq, totals.getLong(0), totals.getLong(1))
  }

  /** Top-k documents for `query` by BM25. Returns (doc, score_micro,
    * score) ordered by (score_micro desc, doc) — score is the
    * micro-integer divided back out, for display. */
  def bm25Search(index: Bm25Index, query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must contain at least one token")
    val q = query.distinct
    val idf = index.docFreq
      .filter(col("token").isin(q: _*))
      .withColumn("idf_micro",
        floor(log((lit(index.nDocs.toDouble) - col("df").cast("double")
          + 0.5) / (col("df").cast("double") + 0.5)) * 1e6 + 0.5)
          .cast("long"))
    val avgdl = index.totalTokens.toDouble / index.nDocs.toDouble
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / avgdl)
    val termMicro = floor(
      (col("idf_micro").cast("double") / 1e6) *
        (col("tf").cast("double") * lit(k1 + 1.0) / denom) * 1e6 + 0.5)
      .cast("long")
    index.postings
      .filter(col("token").isin(q: _*))
      .join(broadcast(idf.select("token", "idf_micro")), Seq("token"))
      .withColumn("__tm", termMicro)
      .groupBy("doc")
      .agg(sum("__tm").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc"))
      .limit(k)
      .withColumn("score", col("score_micro").cast("double") / 1e6)
  }
}
