package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{Curation, Dsir, LangModel, TextAnalysis, UrlOps}
import graft.sources.JsonlStore

/** Corpus-selection and interchange operators — the published-pipeline
  * selection layer above the governance pack: CCNet perplexity
  * partitioning, DSIR importance resampling, RefinedWeb-style URL/domain
  * gating, HLL vocabulary estimation, and the JSONL corpus boundary.
  * Every query is a FULL hash oracle except the HLL sketch, whose
  * estimate is gated by an error-bound flag (the recall-floor pattern).
  */
object CorpusQueries extends QueryPack {

  /** URL-augmentation fragment: the synthetic documents carry no URLs,
    * so the query plants one absolute URL per doc from doc_id on both
    * engines — mixed-case schemes, www prefixes, ports, and 21
    * registered domains (d0–d6 × com/org/net) — and the host/domain
    * extraction has real work whose output is still hash-checkable
    * (the q_pii_redact pattern). */
  private val urlSql =
    """(CASE WHEN doc_id % 13 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
       (CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END) ||
       'd' || CAST(doc_id % 7 AS VARCHAR) || '.' ||
       (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) ||
       (CASE WHEN doc_id % 11 = 0 THEN ':8443' ELSE '' END) ||
       '/p/' || CAST(doc_id AS VARCHAR)"""

  private def urlCol = concat(
    when(col("doc_id") % 13 === 0, "HTTPS://").otherwise("https://"),
    when(col("doc_id") % 4 === 0, "www.").otherwise(""),
    lit("d"), (col("doc_id") % 7).cast("string"), lit("."),
    when(col("doc_id") % 3 === 0, "com")
      .when(col("doc_id") % 3 === 1, "org").otherwise("net"),
    when(col("doc_id") % 11 === 0, ":8443").otherwise(""),
    lit("/p/"), col("doc_id").cast("string"))

  private val urlBlocklist = Seq("d3.com", "d5.org", "d1.net")

  val queries: Seq[QueryDef] = Seq(

    // ---- CCNet perplexity partition ---------------------------------
    // Head/middle/tail by per-language cross-entropy terciles: EXACT
    // rank-based split (Curation.quantileBuckets), not an approximate
    // percentile threshold. Shares the unigram-LM CTE chain with
    // q_lm_score/q_corpus_health — one tokenizer definition.
    QueryDef("q_ppl_buckets", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val model = LangModel.trainUnigram(
        docs.filter(col("doc_id") % 3 =!= 0), "text")
      val scored = LangModel.crossEntropy(docs, "doc_id", "text", model)
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      Curation.quantileBuckets(scored, "doc_id", "cross_entropy",
          Seq("lang"), nBuckets = 3, bucketCol = "__b")
        .select(col("doc_id"), col("lang"), col("cross_entropy"),
          when(col("__b") === 0, "head").when(col("__b") === 1, "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy("doc_id")
    }, Some(
      s"""WITH ${OracleSql.lmLossCtes},
          ce AS (SELECT doc_id,
              floor(CAST(cem AS DOUBLE) / 1000000.0 / CAST(len AS DOUBLE)
                * 10000 + 0.5) / 10000 AS cross_entropy
            FROM lm),
          j AS (SELECT d.doc_id, d.lang, ce.cross_entropy
                FROM documents d JOIN ce USING (doc_id)),
          r AS (SELECT doc_id, lang, cross_entropy,
              row_number() OVER (PARTITION BY lang
                ORDER BY cross_entropy, doc_id) AS rn,
              count(*) OVER (PARTITION BY lang) AS cnt
            FROM j)
          SELECT doc_id, lang, cross_entropy,
            CASE ((rn - 1) * 3) // cnt WHEN 0 THEN 'head'
              WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket
          FROM r ORDER BY doc_id""")),

    // ---- bigram LM scoring ------------------------------------------
    // The step from the unigram perplexity proxy toward CCNet's n-gram
    // scoring: conditional add-one bigram cross-entropy, same training
    // split and integral micro-nat discipline as q_lm_score.
    QueryDef("q_lm_bigram", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val model = LangModel.trainBigram(
        docs.filter(col("doc_id") % 3 =!= 0), "text")
      LangModel.bigramCrossEntropy(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    }, Some(
      """WITH fw AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'),
              x -> length(x) > 0) AS w
          FROM documents),
          bgd AS (SELECT doc_id,
              unnest(list_transform(range(len(w) - 1),
                i -> array_to_string(w[i+1:i+2], ' '))) AS bg
            FROM fw WHERE len(w) >= 2),
          c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgd
                 WHERE doc_id % 3 <> 0 GROUP BY bg),
          cx AS (SELECT split_part(bg, ' ', 1) AS w1,
                   CAST(sum(c2) AS BIGINT) AS cx
                 FROM c2 GROUP BY 1),
          v AS (SELECT count(DISTINCT t) AS v FROM
                  (SELECT unnest(string_split_regex(text, '\s+')) AS t
                   FROM documents WHERE doc_id % 3 <> 0)
                WHERE length(t) > 0),
          db AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS n
                 FROM bgd GROUP BY doc_id, bg),
          sc AS (SELECT doc_id, n,
              CAST(floor(-ln(
                CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE) /
                CAST(coalesce(cx.cx, 0) + (SELECT v FROM v) + 1
                  AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS nll
            FROM db LEFT JOIN c2 USING (bg)
              LEFT JOIN cx ON split_part(db.bg, ' ', 1) = cx.w1)
          SELECT doc_id,
            floor(CAST(sum(n * nll) AS DOUBLE) / 1000000.0 /
              CAST(sum(n) AS DOUBLE) * 10000 + 0.5) / 10000
              AS bigram_ce,
            CAST(sum(n) AS INT) AS n_bigrams
          FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // ---- DSIR importance weights ------------------------------------
    // Target = the English split, raw = the whole corpus: w_micro > 0
    // means "more target-like than average". Every bucket a corpus doc
    // hashes into is observed in raw by construction, so the default-λ
    // path is structurally unreachable here (it exists for scoring
    // out-of-corpus docs).
    QueryDef("q_dsir", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val model = Dsir.trainHashedRatio(
        docs.filter(col("lang") === "en"), docs, "text")
      docs.select("doc_id")
        .join(Dsir.importanceWeights(docs, "doc_id", "text", model),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("w_micro"), lit(0L)).as("w_micro"),
          coalesce(col("n_feats"), lit(0L)).as("n_feats"))
        .orderBy("doc_id")
    }, Some(
      """WITH w2 AS (SELECT doc_id, lang,
            string_split_regex(text, '\s+') AS w FROM documents),
          bg AS (SELECT doc_id, lang,
              substring(md5(unnest(list_transform(range(len(w) - 1),
                i -> array_to_string(w[i+1:i+2], ' ')))), 1, 3) AS bkt
            FROM w2 WHERE len(w) >= 2),
          ct AS (SELECT bkt, CAST(count(*) AS BIGINT) AS c FROM bg
                 WHERE lang = 'en' GROUP BY bkt),
          cr AS (SELECT bkt, CAST(count(*) AS BIGINT) AS c FROM bg
                 GROUP BY bkt),
          dn AS (SELECT
              CAST((SELECT sum(c) FROM ct) AS DOUBLE) + 4096.0 AS dt,
              CAST((SELECT sum(c) FROM cr) AS DOUBLE) + 4096.0 AS dr),
          lam AS (SELECT cr.bkt,
              CAST(floor((ln(CAST(coalesce(ct.c, 0) + 1 AS DOUBLE) /
                    (SELECT dt FROM dn))
                - ln(CAST(cr.c + 1 AS DOUBLE) / (SELECT dr FROM dn)))
                * 1000000 + 0.5) AS BIGINT) AS lm
            FROM cr LEFT JOIN ct USING (bkt)),
          db AS (SELECT doc_id, bkt, CAST(count(*) AS BIGINT) AS n
                 FROM bg GROUP BY doc_id, bkt),
          ws AS (SELECT doc_id, sum(n * lm) AS w_micro,
                   sum(n) AS n_feats
                 FROM db JOIN lam USING (bkt) GROUP BY doc_id)
          SELECT d.doc_id,
            CAST(coalesce(w_micro, 0) AS BIGINT) AS w_micro,
            CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats
          FROM documents d LEFT JOIN ws USING (doc_id)
          ORDER BY doc_id""")),

    // ---- URL/domain provenance gate ---------------------------------
    // Blocklist drops 3 of the 21 planted domains; the per-domain cap
    // keeps 15 docs per survivor in md5(id) order. Output is the
    // per-domain survivor profile (count + id checksum).
    QueryDef("q_url_filter", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), urlCol.as("url"))
      val s2 = s
      import s2.implicits._
      val block = urlBlocklist.toDF("domain")
      UrlOps.domainGate(docs, "doc_id", "url", block, capPerDomain = 15)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"))
        .orderBy("domain")
    }, Some(
      s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
          h AS (SELECT doc_id, lower(regexp_extract(url,
              '${UrlOps.hostPattern}', 1)) AS host FROM u),
          dom AS (SELECT doc_id,
              coalesce(nullif(regexp_extract(host,
                '${UrlOps.regDomainPattern}', 1), ''), host) AS domain
            FROM h WHERE length(host) > 0),
          keep AS (SELECT doc_id, domain FROM dom
            WHERE domain NOT IN
              (${urlBlocklist.map(d => s"'$d'").mkString(", ")})),
          capd AS (SELECT doc_id, domain FROM (SELECT doc_id, domain,
              row_number() OVER (PARTITION BY domain
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM keep) WHERE rn <= 15)
          SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(doc_id) AS BIGINT) AS sum_ids
          FROM capd GROUP BY domain ORDER BY domain""")),

    // ---- HLL vocabulary estimate ------------------------------------
    // The 100 TB vocabulary question ("how many distinct tokens per
    // source?") answered two ways in one pass: exact (the oracle-checked
    // number) and HLL++ at rsd 0.02 (the only way to answer it in one
    // pass over a web-scale corpus), gated by a 5% error-bound flag —
    // if the sketch drifts past the bound the flag flips and the hash
    // gate fails.
    QueryDef("q_hll_vocab", (s, dir) => {
      // pre-aggregate (source, token) BEFORE counting: one map-side
      // combined shuffle of distinct pairs, instead of the EXPAND plan a
      // combined exact+approx distinct aggregation forces (every token
      // occurrence shuffled twice — measured 5.4 s vs 1.4 s at sf0.1);
      // HLL over already-distinct tokens estimates the same cardinality
      Tables.load(s, dir, "documents")
        .select(col("source"),
          explode(TextAnalysis.words(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .distinct()
        .groupBy("source")
        .agg(count(lit(1)).as("n_exact"),
          approx_count_distinct(col("tok"), 0.02).as("__est"))
        .select(col("source"), col("n_exact"),
          (abs(col("__est") - col("n_exact")) * 20 <= col("n_exact"))
            .cast("int").as("within_5pct"))
        .orderBy("source")
    }, Some(
      """SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS n_exact,
           1 AS within_5pct
         FROM (SELECT source,
                 unnest(string_split_regex(text, '\s+')) AS token
               FROM documents)
         WHERE length(token) > 0
         GROUP BY source ORDER BY source""")),

    // ---- count–min sketch heavy hitters -----------------------------
    // the q_hll_vocab pattern for FREQUENCY sketching: exact top-20
    // tokens hash-gate the output, the sketch's two guarantees ride as
    // flags — never_under is structural (CMS only overestimates),
    // within_eps holds per token with prob ≥ 0.99 and is deterministic
    // here (fixed seed), verified at all three SFs. The sketch itself
    // is one corpus pass into depth×width integers — the scale shape
    // for occurrence probes without a per-token shuffle.
    QueryDef("q_cms_tokens", (s, dir) =>
      graft.functions.Decontam.cmsHeavyHitters(
          Tables.load(s, dir, "documents"), "text", k = 20)
        .orderBy(desc("n_exact"), asc("tok")),
    Some(
      """SELECT token AS tok, CAST(count(*) AS BIGINT) AS n_exact,
           1 AS never_under, 1 AS within_eps
         FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
               FROM documents)
         WHERE length(token) > 0
         GROUP BY token ORDER BY n_exact DESC, tok LIMIT 20""")),

    // ---- token-granular sequence packing ----------------------------
    // 512-token context windows over the corpus token stream in
    // (md5(id), id) order; docs split at window boundaries, every span
    // row carries the attention-boundary metadata (seq_offset) a
    // concat-and-mask loader needs. Pure integer math — full hash
    // oracle via a running-sum window + generate_series.
    QueryDef("q_pack_sequences", (s, dir) => {
      Curation.packSequences(
          Tables.load(s, dir, "documents"), "doc_id", "text", 512L)
        .orderBy("seq_id", "seq_offset")
    }, Some(
      """WITH t AS (SELECT doc_id,
            CAST(coalesce(len(string_split_regex(text, '\s+')), 0)
              AS BIGINT) AS toks,
            md5(CAST(doc_id AS VARCHAR)) AS k FROM documents),
          c AS (SELECT doc_id, toks, sum(toks) OVER (ORDER BY k, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM t),
          sp AS (SELECT doc_id, toks, cum, cum - toks AS strt,
                   unnest(generate_series(
                     CAST((cum - toks) // 512 AS BIGINT),
                     CAST((cum - 1) // 512 AS BIGINT))) AS seq_id
                 FROM c WHERE toks > 0)
          SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
            CAST(greatest(strt, seq_id * 512) - strt AS BIGINT)
              AS doc_offset,
            CAST(greatest(strt, seq_id * 512) - seq_id * 512 AS BIGINT)
              AS seq_offset,
            CAST(least(cum, seq_id * 512 + 512)
              - greatest(strt, seq_id * 512) AS BIGINT) AS n_tokens
          FROM sp ORDER BY seq_id, seq_offset""")),

    // ---- BPE-granular sequence packing ------------------------------
    // packSequencesByCost with the TOKENIZER's own counts as the cost
    // column — "pack 128-token context windows in BPE tokens", the unit
    // real pretraining uses. The merge list is PINNED ((t,h), (a,n),
    // (r,e)): three single-char merges over pairwise-DISJOINT letters,
    // chosen so no merge can create or destroy another's adjacency —
    // each one's application count over a word is exactly its
    // non-overlapping substring count (a≠b pairs cannot self-overlap),
    // giving DuckDB the closed form tokens(w) = len(w) + 1 (end-of-word
    // marker) − Σ occurrences. That turns the data-dependent trained
    // tokenizer (spec-gated, no oracle possible) into a FULL hash
    // oracle for the apply+pack pipeline at all three SFs.
    QueryDef("q_pack_bpe", (s, dir) => {
      import graft.functions.BpeTokenizer
      val d = Tables.load(s, dir, "documents")
      val bpe = BpeTokenizer.Bpe(Seq(("t", "h"), ("a", "n"), ("r", "e")))
      val costs = BpeTokenizer.tokenCounts(d, "doc_id", "text", bpe)
      Curation.packSequencesByCost(
          d.join(costs, Seq("doc_id"), "left"),
          "doc_id", col("n_bpe_tokens"), 128L)
        .orderBy("seq_id", "seq_offset")
    }, Some(
      """WITH w AS (SELECT doc_id,
            replace(unnest(string_split_regex(text, '\s+')), chr(1), '')
              AS word
          FROM documents),
          bt AS (SELECT doc_id,
            sum(length(word) + 1
              - (length(word) - length(replace(word, 'th', ''))) // 2
              - (length(word) - length(replace(word, 'an', ''))) // 2
              - (length(word) - length(replace(word, 're', ''))) // 2)
              AS toks
          FROM w WHERE length(word) > 0 GROUP BY doc_id),
          t AS (SELECT d.doc_id,
            CAST(coalesce(bt.toks, 0) AS BIGINT) AS toks,
            md5(CAST(d.doc_id AS VARCHAR)) AS k
          FROM documents d LEFT JOIN bt ON d.doc_id = bt.doc_id),
          c AS (SELECT doc_id, toks, sum(toks) OVER (ORDER BY k, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM t),
          sp AS (SELECT doc_id, toks, cum, cum - toks AS strt,
                   unnest(generate_series(
                     CAST((cum - toks) // 128 AS BIGINT),
                     CAST((cum - 1) // 128 AS BIGINT))) AS seq_id
                 FROM c WHERE toks > 0)
          SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
            CAST(greatest(strt, seq_id * 128) - strt AS BIGINT)
              AS doc_offset,
            CAST(greatest(strt, seq_id * 128) - seq_id * 128 AS BIGINT)
              AS seq_offset,
            CAST(least(cum, seq_id * 128 + 128)
              - greatest(strt, seq_id * 128) AS BIGINT) AS n_tokens
          FROM sp ORDER BY seq_id, seq_offset""")),

    // ---- deterministic weighted sampling ----------------------------
    // Efraimidis–Spirakis without replacement, k=120 weighted by doc
    // length (n_chars): the md5-derived uniform makes the draw
    // reproducible, so the SAME sample is a full hash oracle.
    QueryDef("q_weighted_sample", (s, dir) => {
      Curation.weightedSample(
          Tables.load(s, dir, "documents")
            .select("doc_id", "n_chars"),
          "doc_id", "n_chars", k = 120)
        .orderBy("doc_id")
    }, Some(
      """WITH kk AS (SELECT doc_id, n_chars,
            CAST(floor(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                  1, 13))::BIGINT + 0.5) / 4503599627370496.0)
              / CAST(n_chars AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS wk
          FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
          SELECT doc_id, n_chars FROM
            (SELECT doc_id, n_chars FROM kk
             ORDER BY wk DESC, doc_id LIMIT 120)
          ORDER BY doc_id""")),

    // ---- HTML -> text extraction ------------------------------------
    // Both engines wrap each doc in deterministic HTML (script/style
    // blocks, a multi-line comment, attributes, double-encoded
    // entities) and strip it; the oracle interpolates the SAME
    // patterns from LineClean, so the cleaned bytes hash-match.
    QueryDef("q_html_strip", (s, dir) => {
      import graft.functions.LineClean
      val aug = concat(
        lit("<html><head><title>T</title>"),
        when(col("doc_id") % 2 === 0,
          "<script type=\"text/javascript\">var i = 1 < 2 && j > 0;</script>")
          .otherwise("<style>p { color: red; }</style>"),
        lit("</head><body onload=\"init()\">"),
        when(col("doc_id") % 3 === 0, "<!-- comment\nacross lines -->")
          .otherwise(""),
        lit("<p class=\"x\">"), coalesce(col("text"), lit("")),
        lit("</p><br/>"),
        lit("&quot;q&quot; &amp;lt; &nbsp;&#39;a&#39; &gt;"),
        lit("</body></html>"))
      // per-row HTML strip dominates — spread the single-split corpus
      graft.functions.Spread.across(Tables.load(s, dir, "documents"))
        .select(col("doc_id"),
          LineClean.stripHtml(aug).as("__clean"))
        .select(col("doc_id"), length(col("__clean")).as("n_clean"),
          md5(col("__clean")).as("clean_md5"))
        .orderBy("doc_id")
    }, Some(
      s"""WITH a AS (SELECT doc_id,
            '<html><head><title>T</title>' ||
            (CASE WHEN doc_id % 2 = 0 THEN
              '<script type="text/javascript">var i = 1 < 2 && j > 0;</script>'
             ELSE '<style>p { color: red; }</style>' END) ||
            '</head><body onload="init()">' ||
            (CASE WHEN doc_id % 3 = 0 THEN
              '<!-- comment' || chr(10) || 'across lines -->'
             ELSE '' END) ||
            '<p class="x">' || coalesce(text, '') || '</p><br/>' ||
            '&quot;q&quot; &amp;lt; &nbsp;&#39;a&#39; &gt;' ||
            '</body></html>' AS h
          FROM documents),
          st AS (SELECT doc_id, trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(h,
                '${graft.functions.LineClean.scriptBlockPattern}', ' ', 'g'),
                '${graft.functions.LineClean.styleBlockPattern}', ' ', 'g'),
                '${graft.functions.LineClean.commentPattern}', ' ', 'g'),
                '${graft.functions.LineClean.tagPattern}', ' ', 'g'),
              '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
              '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
            '${graft.functions.LineClean.wsRunPattern}', ' ', 'g')) AS c
          FROM a)
          SELECT doc_id, CAST(length(c) AS INT) AS n_clean,
            md5(c) AS clean_md5
          FROM st ORDER BY doc_id""")),

    // ---- generalized cost-budget selection --------------------------
    // sampleToBudget with chars as the cost ("keep ~60k chars of
    // corpus, reproducibly uniform"): the cost-column generalization
    // whose production form takes BPE token counts (spec-gated — BPE
    // isn't SQL); chars give it a full hash oracle.
    QueryDef("q_char_budget", (s, dir) => {
      Curation.sampleToBudget(Tables.load(s, dir, "documents")
          .select("doc_id", "n_chars"),
        "doc_id", col("n_chars"), budget = 60000L)
        .orderBy("doc_id")
    }, Some(
      """WITH c AS (SELECT doc_id, n_chars,
            sum(coalesce(n_chars, 0)) OVER (
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM documents)
          SELECT doc_id, n_chars FROM c WHERE cum <= 60000
          ORDER BY doc_id""")),

    // ---- cross-corpus near-dup decontamination ----------------------
    // LSH candidates BETWEEN the training split and the held-out eval
    // split (doc_id % 37 — the q_decontam split): the step past exact
    // n-gram overlap, catching paraphrased benchmark leakage. Same
    // hash family as q_minhash_lsh, sides separated.
    QueryDef("q_neardup_decontam", (s, dir) => {
      import graft.functions.Dedup
      val docs = Tables.load(s, dir, "documents")
      Dedup.lshCandidatePairsAcross(
          docs.filter(col("doc_id") % 37 =!= 0),
          docs.filter(col("doc_id") % 37 === 0),
          "text", "doc_id", k = 8, rowsPerBand = 2, n = 3)
        .orderBy("a", "b")
    }, Some(
      s"""WITH ${OracleSql.docShingleCte},
          ${OracleSql.minhashBandsCtes}
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id % 37 <> 0 AND b.doc_id % 37 = 0
          ORDER BY a, b""")),

    // ---- classifier-based quality filtering -------------------------
    // FineWeb/DCLM-style model filter with PINNED weights (training is
    // spec-gated; production pins exported weights exactly like this):
    // the logit accumulates in the documented left-to-right order and
    // the sigmoid is 6-dp-floored, so the keep decision hash-matches.
    QueryDef("q_quality_classifier", (s, dir) => {
      import graft.functions.QualityClassifier
      val m = QualityClassifier.QualityModel(
        Seq(3.0, -0.1, -5.0, 1.5), bias = -0.5)
      // per-row feature extraction dominates — spread the corpus scan
      graft.functions.Spread.across(Tables.load(s, dir, "documents"))
        .select(col("doc_id"),
          QualityClassifier.score(col("text"), m).as("q_score"))
        .withColumn("keep", (col("q_score") >= 0.6).cast("int"))
        .filter(col("q_score").isNotNull)
        .orderBy("doc_id")
    }, Some {
      val stops = graft.functions.TextAnalysis.defaultStopwords
        .map(w => s"'$w'").mkString("[", ",", "]")
      s"""WITH t AS (SELECT doc_id, text,
            string_split_regex(text, '\\s+') AS w FROM documents
          WHERE text IS NOT NULL),
          f AS (SELECT doc_id,
            CAST(len(list_filter(w, x -> list_contains($stops, x)))
              AS DOUBLE) / len(w) AS swr,
            CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
              / len(w) AS awl,
            (CASE WHEN length(text) > 0 THEN
              CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))
                AS DOUBLE) / length(text) ELSE 0.0 END) AS pr,
            least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS ln
          FROM t),
          z AS (SELECT doc_id,
            -0.5 + swr * 3.0 + awl * -0.1 + pr * -5.0 + ln * 1.5 AS z
          FROM f)
          SELECT doc_id,
            floor(1.0 / (1.0 + exp(-z)) * 1000000 + 0.5) / 1000000
              AS q_score,
            CAST(CASE WHEN
              floor(1.0 / (1.0 + exp(-z)) * 1000000 + 0.5) / 1000000
                >= 0.6 THEN 1 ELSE 0 END AS INT) AS keep
          FROM z ORDER BY doc_id"""
    }),

    // ---- overlapping document chunking (RAG prep) -------------------
    // 64-token windows every 48 tokens (16 overlap), strictly
    // per-document; chunk text re-joined with single spaces so both
    // engines hash identical bytes.
    QueryDef("q_chunk_docs", (s, dir) => {
      Curation.chunkDocs(
          graft.functions.Spread.across(Tables.load(s, dir, "documents")),
          "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }, Some(
      """WITH fw AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'),
              x -> length(x) > 0) AS w
          FROM documents),
          d AS (SELECT doc_id, w, len(w) AS nt FROM fw WHERE len(w) > 0),
          c AS (SELECT doc_id, w, nt,
              unnest(generate_series(0,
                CAST((greatest(nt - 16, 1) + 47) // 48 - 1 AS BIGINT)))
                AS chunk_id
            FROM d),
          sl AS (SELECT doc_id, chunk_id,
              least(64, nt - chunk_id * 48) AS n_tokens,
              array_to_string(w[chunk_id * 48 + 1 :
                chunk_id * 48 + least(64, nt - chunk_id * 48)], ' ') AS ct
            FROM c)
          SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
            CAST(n_tokens AS INT) AS n_tokens, md5(ct) AS chunk_md5
          FROM sl ORDER BY doc_id, chunk_id""")),

    // ---- epoch mixing (upsampled domain mixture) --------------------
    // "2.3 epochs of en, 0.4 of zh, …": repeats = floor(f) + one more
    // iff the salted md5 draw clears an integer threshold — thresholds
    // interpolated from the SAME Curation.epochThresholds the engine
    // uses, so the fractional-keep decision is hash-exact.
    QueryDef("q_epoch_mix", (s, dir) => {
      val factors = Map("en" -> 2.3, "es" -> 1.5, "de" -> 1.0,
        "fr" -> 0.5, "zh" -> 0.25)
      Curation.epochMix(Tables.load(s, dir, "documents")
          .select("doc_id", "lang"), "doc_id", "lang", factors)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          max("epoch").as("max_epoch"),
          sum(col("doc_id") * col("epoch")).as("checksum"))
        .orderBy("lang")
    }, Some {
      val cases = Seq("en" -> 2.3, "es" -> 1.5, "de" -> 1.0,
        "fr" -> 0.5, "zh" -> 0.25).map { case (d, f) =>
        val (base, thresh) = Curation.epochThresholds(f)
        s"WHEN '$d' THEN $base + (CASE WHEN draw < $thresh " +
          "THEN 1 ELSE 0 END)"
      }.mkString(" ")
      s"""WITH d AS (SELECT doc_id, lang,
            ('0x' || substring(md5('ep:' || CAST(doc_id AS VARCHAR)),
              1, 13))::BIGINT AS draw
          FROM documents
          WHERE lang IN ('en', 'es', 'de', 'fr', 'zh')),
          n AS (SELECT doc_id, lang,
            CASE lang $cases END AS reps FROM d),
          e AS (SELECT doc_id, lang,
            unnest(generate_series(1, CAST(reps AS BIGINT))) AS epoch
          FROM n WHERE reps > 0)
          SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
            CAST(max(epoch) AS BIGINT) AS max_epoch,
            CAST(sum(doc_id * epoch) AS BIGINT) AS checksum
          FROM e GROUP BY lang ORDER BY lang"""
    }),

    // ---- JSONL round-trip -------------------------------------------
    // Writes the corpus as gzipped JSONL, reads it back with the strict
    // schema, and profiles per source; the oracle profiles the PARQUET
    // original — the hash gate passes only if the JSONL boundary
    // preserved every row, every char, and every null.
    QueryDef("q_jsonl_roundtrip", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = TempIndexDirs.jvmScoped("graft_jsonl", dir)
      JsonlStore.write(docs, path, codec = Some("gzip"))
      JsonlStore.read(s, path, docs.schema)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(length(col("text")), lit(0))).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_text_md5"),
          min(md5(col("text"))).as("min_md5"),
          max(md5(col("text"))).as("max_md5"),
          sum("n_chars").as("sum_n_chars"))
        .orderBy("source")
    }, Some(
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_text_md5,
           min(md5(text)) AS min_md5, max(md5(text)) AS max_md5,
           CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
         FROM documents GROUP BY source ORDER BY source"""))
  )
}
