package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{Curation, Decontam, LineClean, Pii}

/** Corpus-governance operators for the training-data pipeline:
  * benchmark decontamination, PII scrubbing, domain-mixture sampling,
  * boilerplate mining. Each is a FULL hash oracle — every one is pure
  * deterministic column/relational math (md5 ranks, RE2-safe regexes,
  * integer quotas), so DuckDB reproduces results bit-for-bit.
  */
object GovernanceQueries extends QueryPack {

  /** Deterministic benchmark split: every 37th doc is the held-out eval
    * set, the rest are the training corpus under decontamination. */
  private val benchMod = 37

  /** PII-augmentation fragment: the synthetic documents carry no PII, so
    * the query plants one email, one IPv4, and one phone number per doc,
    * derived from doc_id identically on both engines — the detector and
    * redactor then have real work whose output is still hash-checkable. */
  private val augSql =
    """text || ' reach user' || CAST(doc_id AS VARCHAR) ||
       '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.org from 10.' ||
       CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ||
       '.4 tel 555-' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0') ||
       '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')"""

  private def augCol = concat(col("text"),
    lit(" reach user"), col("doc_id").cast("string"),
    lit("@mail"), (col("doc_id") % 7).cast("string"),
    lit(".example.org from 10."), (col("doc_id") % 200).cast("string"),
    lit("."), (col("doc_id") % 250).cast("string"),
    lit(".4 tel 555-"),
    lpad(((col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
    lit("-"),
    lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0"))

  /** Mixture targets: 40% of the corpus, split en-heavy. Integer percent
    * arithmetic end to end (see Curation.mixtureQuotas). */
  private val mixPct =
    Seq("en" -> 50L, "es" -> 20L, "de" -> 10L, "fr" -> 10L, "zh" -> 10L)

  /** DuckDB mirror of TextAnalysis.qualityScore over columns `text`
    * (raw) and `w` (its whitespace split) — ONE fragment shared by
    * every oracle that scores quality, so the Scala formula and its
    * mirror cannot drift apart one query at a time. The floor-based
    * 4 dp rounding mirrors qualityScore's engine-portable rounding
    * (round() itself differs between the engines at .5 boundaries). */
  private val qualityExprSql =
    """(floor((
        least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
      + (1.0 - least(abs(
          CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
            / len(w) - 5.0) / 5.0, 1.0))
      + (1.0 - least((CASE WHEN length(text) > 0
          THEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))
               AS DOUBLE) / length(text)
          ELSE 0.0 END) * 10.0, 1.0))
      ) / 3.0 * 10000.0 + 0.5) / 10000.0)"""

  /** The line-op corpus: the flat synthetic text has no newlines, so —
    * like the PII query plants PII — both engines deterministically
    * rebuild each doc as 5-word lines and plant, by doc_id: a shared
    * footer (every 3rd doc — corpus-frequent), a too-short line (every
    * 4th), a blocklisted line (every 5th), and a bullet+ellipsis line
    * (every 7th). The line operators then have real work whose output
    * is still hash-checkable. */
  private def plantedLinesDf(docs: org.apache.spark.sql.DataFrame) = {
    import graft.functions.TextAnalysis
    // the per-row line rebuild + every line op downstream runs in the
    // scan's map tasks — spread a single-split corpus (Spread.across is
    // a no-op at scale; downstream aggregates are integer counts /
    // keyed windows, partition-independent)
    graft.functions.Spread.across(docs)
      // null text coalesces to '' BEFORE splitting on both engines —
      // without it Spark's concat_ws skips the null array (footer-only
      // text) while DuckDB's || propagates NULL, and the hashes split
      .select(col("doc_id"),
        TextAnalysis.words(coalesce(col("text"), lit(""))).as("w"))
      .withColumn("__nl", expr("(size(w) + 4) div 5"))
      .withColumn("text", concat(
        concat_ws("\n", transform(sequence(lit(0), col("__nl") - 1),
          i => array_join(slice(col("w"), i * lit(5) + 1, lit(5)), " "))),
        when(col("doc_id") % 3 === 0,
          lit("\nshared footer boilerplate all rights reserved"))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("\nok")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit("\nthis site uses javascript and a cookie policy banner"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit("\n- bullet item continues...")).otherwise(lit(""))))
      .select("doc_id", "text")
  }

  /** DuckDB mirror of [[plantedLinesDf]] (emits doc_id, txt). */
  private val plantedLinesSql =
    """pw AS (SELECT doc_id,
               string_split_regex(coalesce(text, ''), '\s+') AS w
             FROM documents),
       p AS (SELECT doc_id,
         array_to_string(list_transform(range((len(w) + 4) // 5),
           i -> array_to_string(w[i*5+1:i*5+5], ' ')), chr(10)) ||
         CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
           'shared footer boilerplate all rights reserved' ELSE '' END ||
         CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'ok' ELSE '' END ||
         CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
           'this site uses javascript and a cookie policy banner'
           ELSE '' END ||
         CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
           '- bullet item continues...' ELSE '' END AS txt
       FROM pw)"""

  val queries: Seq[QueryDef] = Seq(

    // ---- benchmark decontamination ----------------------------------
    QueryDef("q_decontam", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Decontam.contamination(
          docs.filter(col("doc_id") % benchMod =!= 0),
          docs.filter(col("doc_id") % benchMod === 0),
          "text", "doc_id", n = 3, flagThreshold = 0.2)
        .orderBy("doc_id")
    }, Some(
      s"""WITH ${OracleSql.docShingleCte},
          bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % $benchMod = 0),
          corpus AS (SELECT * FROM sh WHERE doc_id % $benchMod <> 0),
          tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_shingles
                  FROM corpus GROUP BY 1),
          ov AS (SELECT c.doc_id, count(*) AS n_overlap
                 FROM corpus c JOIN bench b USING (sh) GROUP BY 1)
          SELECT t.doc_id,
            CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
            t.n_shingles,
            round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / t.n_shingles,
                  6) AS contamination,
            CASE WHEN round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE)
                            / t.n_shingles, 6) >= 0.2
                 THEN 1 ELSE 0 END AS contaminated
          FROM tot t LEFT JOIN ov o USING (doc_id)
          ORDER BY doc_id""")),

    // ---- PII detection + redaction ----------------------------------
    QueryDef("q_pii_redact", (s, dir) => {
      // per-row regex scans dominate — spread the single-split corpus
      Pii.piiReport(
          graft.functions.Spread.across(Tables.load(s, dir, "documents"))
            .withColumn("aug", augCol),
          "aug", "doc_id")
        .orderBy("doc_id")
    }, Some(
      s"""WITH aug AS (SELECT doc_id, $augSql AS t FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(t, '${Pii.emailPattern}')) AS INT)
              AS n_emails,
            CAST(len(regexp_extract_all(t, '${Pii.ipv4Pattern}')) AS INT)
              AS n_ips,
            CAST(len(regexp_extract_all(t, '${Pii.phonePattern}')) AS INT)
              AS n_phones,
            regexp_replace(regexp_replace(regexp_replace(t,
              '${Pii.emailPattern}', '<EMAIL>', 'g'),
              '${Pii.phonePattern}', '<PHONE>', 'g'),
              '${Pii.ipv4Pattern}', '<IP>', 'g') AS redacted
          FROM aug ORDER BY doc_id""")),

    // ---- domain-mixture sampling ------------------------------------
    QueryDef("q_domain_mix", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val budget = docs.count() * 40 / 100
      Curation.sampleMixture(docs, "doc_id", "lang",
          Curation.mixtureQuotas(budget, mixPct.toMap))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }, Some {
      val vals = mixPct.map { case (d, p) => s"('$d', $p)" }.mkString(", ")
      s"""WITH n AS (SELECT (count(*) * 40) // 100 AS budget FROM documents),
          q AS (SELECT lang, ((SELECT budget FROM n) * pct) // 100 AS quota
                FROM (VALUES $vals) t(lang, pct)),
          r AS (SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                FROM documents)
          SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
          WHERE rn <= q.quota ORDER BY doc_id"""
    }),

    // ---- token-budget corpus selection ------------------------------
    QueryDef("q_token_budget", (s, dir) => {
      import graft.functions.TextAnalysis
      Curation.sampleToTokenFraction(
          Tables.load(s, dir, "documents"), "doc_id", "text", 30L)
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }, Some(
      s"""WITH t AS (SELECT doc_id,
            CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS toks,
            md5(CAST(doc_id AS VARCHAR)) AS k FROM documents),
          b AS (SELECT (sum(toks) * 30) // 100 AS budget FROM t),
          c AS (SELECT doc_id, toks, sum(toks) OVER (ORDER BY k, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM t)
          SELECT doc_id, CAST(toks AS INT) AS n_tokens FROM c
          WHERE cum <= (SELECT budget FROM b) ORDER BY doc_id""")),

    // ---- token-budget corpus sharding -------------------------------
    // the shard cut before sequence packing: shard = whole budgets the
    // EXCLUSIVE running token sum has filled, in (md5(id), id) order —
    // integral division end to end, same bucket-offset running sum as
    // q_token_budget.
    QueryDef("q_pack_shards", (s, dir) => {
      import graft.functions.TextAnalysis
      Curation.packShards(
          Tables.load(s, dir, "documents"), "doc_id", "text", 2000L)
        .select(col("doc_id"), col("shard"),
          coalesce(TextAnalysis.wsTokenCount(col("text")), lit(0))
            .as("n_tokens"))
        .orderBy("doc_id")
    }, Some(
      s"""WITH t AS (SELECT doc_id,
            CAST(coalesce(len(string_split_regex(text, '\\s+')), 0)
              AS BIGINT) AS toks,
            md5(CAST(doc_id AS VARCHAR)) AS k FROM documents),
          c AS (SELECT doc_id, toks, sum(toks) OVER (ORDER BY k, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM t)
          SELECT doc_id,
            CAST(dense_rank() OVER (ORDER BY (cum - toks) // 2000) - 1
              AS BIGINT) AS shard,
            CAST(toks AS INT) AS n_tokens
          FROM c ORDER BY doc_id""")),

    // ---- per-line C4 cleaning + line-shape Gopher fractions ---------
    QueryDef("q_line_clean", (s, dir) => {
      val planted = plantedLinesDf(Tables.load(s, dir, "documents"))
      // floor-based 4 dp rounding, not round() — the engine-portable
      // convention (see TextAnalysis.qualityScore)
      planted.select(col("doc_id"),
          size(LineClean.lines(col("text"))).as("n_lines_raw"),
          LineClean.cleanLines(col("text")).as("__clean"),
          (floor(LineClean.bulletLineFraction(col("text")) * 10000.0
            + 0.5) / 10000.0).as("bullet_frac"),
          (floor(LineClean.ellipsisLineFraction(col("text")) * 10000.0
            + 0.5) / 10000.0).as("ellipsis_frac"))
        .select(col("doc_id"), col("n_lines_raw"),
          when(length(col("__clean")) === 0, 0)
            .otherwise(size(LineClean.lines(col("__clean"))))
            .as("n_lines_clean"),
          md5(col("__clean")).as("clean_md5"),
          col("bullet_frac"), col("ellipsis_frac"))
        .orderBy("doc_id")
    }, Some {
      val blk = LineClean.defaultBlocklist
        .map(b => s"'$b'").mkString("[", ", ", "]")
      s"""WITH $plantedLinesSql,
          ls AS (SELECT doc_id, txt, string_split(txt, chr(10)) AS ls
                 FROM p),
          k AS (SELECT doc_id, ls,
            list_filter(ls, l ->
              len(string_split_regex(l, '\\s+')) >= 3 AND
              len(list_filter($blk, b -> contains(lower(l), b))) = 0)
              AS kept
          FROM ls)
          SELECT doc_id,
            CAST(len(ls) AS INT) AS n_lines_raw,
            CAST(CASE WHEN array_to_string(kept, chr(10)) = '' THEN 0
              ELSE len(kept) END AS INT) AS n_lines_clean,
            md5(array_to_string(kept, chr(10))) AS clean_md5,
            floor(CAST(len(list_filter(ls, l ->
              regexp_matches(l, '^[-*•]'))) AS DOUBLE) / len(ls)
              * 10000 + 0.5) / 10000 AS bullet_frac,
            floor(CAST(len(list_filter(ls, l ->
              regexp_matches(l, '(\\.\\.\\.|…)${"$"}'))) AS DOUBLE)
              / len(ls) * 10000 + 0.5) / 10000 AS ellipsis_frac
          FROM k ORDER BY doc_id"""
    }),

    // ---- corpus-level frequent-line removal -------------------------
    // the RefinedWeb boilerplate pass: the planted footer appears in a
    // third of the corpus and must vanish from every doc; natural 5-word
    // chunks that happen to repeat past the threshold go with it (both
    // engines compute the same document frequencies, so the hash pins
    // whatever the data contains).
    QueryDef("q_line_dedup", (s, dir) => {
      val planted = plantedLinesDf(Tables.load(s, dir, "documents"))
      LineClean.dropFrequentLines(planted, "doc_id", "text", maxDocs = 5)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          when(length(col("text")) === 0, 0)
            .otherwise(size(LineClean.lines(col("text")))).as("n_lines"))
        .orderBy("doc_id")
    }, Some(
      s"""WITH $plantedLinesSql,
          ex AS (SELECT doc_id, generate_subscripts(ls, 1) AS o,
                   unnest(ls) AS l
                 FROM (SELECT doc_id, string_split(txt, chr(10)) AS ls
                       FROM p)),
          freq AS (SELECT l FROM (SELECT l, count(DISTINCT doc_id) AS nd
                                  FROM ex GROUP BY l) WHERE nd > 5),
          kept AS (SELECT doc_id, o, l FROM ex
                   WHERE l NOT IN (SELECT l FROM freq)),
          re AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY o)
                   AS cleaned
                 FROM kept GROUP BY doc_id)
          SELECT d.doc_id, md5(coalesce(r.cleaned, '')) AS text_md5,
            CAST(CASE WHEN coalesce(r.cleaned, '') = '' THEN 0
              ELSE len(string_split(coalesce(r.cleaned, ''), chr(10)))
              END AS INT) AS n_lines
          FROM p d LEFT JOIN re r USING (doc_id)
          ORDER BY d.doc_id""")),

    // ---- corpus-level paragraph dedup (keep-first) ------------------
    // CCNet semantics vs q_line_dedup's RefinedWeb semantics: the
    // planted footer (a third of the corpus) keeps exactly ONE copy —
    // in the lowest (doc_id, position) — instead of vanishing
    // everywhere. Oracle: row_number over (paragraph) in (doc, pos)
    // order; rn = 1 covers unique paragraphs too, and EMPTY segments
    // (blank separators — structure, not content) are exempt.
    QueryDef("q_par_dedup", (s, dir) => {
      val planted = plantedLinesDf(Tables.load(s, dir, "documents"))
      LineClean.dedupParagraphs(planted, "doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          when(length(col("text")) === 0, 0)
            .otherwise(size(LineClean.lines(col("text")))).as("n_lines"))
        .orderBy("doc_id")
    }, Some(
      s"""WITH $plantedLinesSql,
          ex AS (SELECT doc_id, generate_subscripts(ls, 1) AS o,
                   unnest(ls) AS l
                 FROM (SELECT doc_id, string_split(txt, chr(10)) AS ls
                       FROM p)),
          kept AS (SELECT doc_id, o, l FROM (
                     SELECT doc_id, o, l, row_number() OVER (
                       PARTITION BY l ORDER BY doc_id, o) AS rn FROM ex)
                   WHERE rn = 1 OR l = ''),
          re AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY o)
                   AS cleaned
                 FROM kept GROUP BY doc_id)
          SELECT d.doc_id, md5(coalesce(r.cleaned, '')) AS text_md5,
            CAST(CASE WHEN coalesce(r.cleaned, '') = '' THEN 0
              ELSE len(string_split(coalesce(r.cleaned, ''), chr(10)))
              END AS INT) AS n_lines
          FROM p d LEFT JOIN re r USING (doc_id)
          ORDER BY d.doc_id""")),

    // ---- incremental cross-batch dedup ------------------------------
    // Seed the ledger with the even-id half, then ingest the WHOLE
    // corpus: survivors are exactly the docs whose 8-word prefix key no
    // even-id doc claimed. The ledger is (re)built inside the query so
    // the oracle row covers write -> anti-join end to end.
    QueryDef("q_dedup_ledger", (s, dir) => {
      import graft.sources.DedupLedger
      val docs = Tables.load(s, dir, "documents")
      val path = TempIndexDirs.jvmScoped("graft_ledger", dir)
      // bucketChars = 1: 16 dirs — the layout sized for a small corpus
      // (256 dirs of a handful of keys each would be pure FS overhead)
      DedupLedger.write(docs.filter(col("doc_id") % 2 === 0), "text",
        path, bucketChars = 1)
      DedupLedger.filterNew(s, docs, "text", path)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }, Some(
      """WITH k AS (SELECT doc_id, lang,
           md5(coalesce(
             array_to_string((string_split_regex(text, '\s+'))[1:8], ' '),
             '')) AS key FROM documents)
         SELECT doc_id, lang FROM k
         WHERE key NOT IN (SELECT key FROM k WHERE doc_id % 2 = 0)
         ORDER BY doc_id""")),

    // ---- incremental cross-batch NEAR-dup ---------------------------
    // The LSH analogue of q_dedup_ledger: seed the band ledger with the
    // even-id half, ingest the whole corpus — survivors are the docs
    // with NO minhash band collision against any even-id doc (evens
    // collide with themselves, so only clean odd docs and shingle-less
    // short texts pass). The hash-family geometry comes from the
    // ledger's stored meta, not the call site.
    QueryDef("q_neardup_ledger", (s, dir) => {
      import graft.sources.NearDupLedger
      val docs = Tables.load(s, dir, "documents")
      val path = TempIndexDirs.jvmScoped("graft_ndledger", dir)
      // bucketChars = 1: 16 dirs — the small-corpus layout
      NearDupLedger.write(docs.filter(col("doc_id") % 2 === 0), "text",
        "doc_id", path, bucketChars = 1)
      NearDupLedger.filterNew(s, docs, "text", "doc_id", path)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }, Some(
      s"""WITH ${OracleSql.docShingleCte},
          ${OracleSql.minhashBandsCtes}
          SELECT d.doc_id, d.lang FROM documents d
          WHERE d.doc_id NOT IN (
            SELECT a.doc_id FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND b.doc_id % 2 = 0)
          ORDER BY d.doc_id""")),

    // ---- token-distribution drift (KL) ------------------------------
    // Snapshot-drift monitor: symmetric add-one KL between the even-id
    // and odd-id halves on the LangModel micro-nat recipe — each
    // per-token term pays its one ln on identical doubles and
    // micro-rounds BEFORE the sum, so both directions are order-free
    // integer sums; totals ride as a 1-row bound join, never a driver
    // constant.
    QueryDef("q_token_kl", (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Decontam.tokenKlReport(d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 =!= 0), "text")
    }, Some(
      s"""WITH ${OracleSql.klTermsCtes}
          SELECT v AS n_vocab, np, nq,
            CAST(sum(m_pq) AS BIGINT) AS kl_pq_micro,
            CAST(sum(m_qp) AS BIGINT) AS kl_qp_micro
          FROM terms GROUP BY v, np, nq""")),

    // ---- drift contributors -----------------------------------------
    // the ACTIONABLE half of the KL report: the tokens DRIVING the
    // even→odd drift, ranked by their micro-nat term (total order with
    // tok tie-break); same CTE chain as q_token_kl — one mirror copy.
    QueryDef("q_drift_tokens", (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Decontam.klTerms(d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 =!= 0), "text")
        .select("tok", "cp", "cq", "m_pq")
        .orderBy(desc("m_pq"), asc("tok"))
        .limit(10)
    }, Some(
      s"""WITH ${OracleSql.klTermsCtes}
          SELECT tok, cp, cq, m_pq FROM terms
          ORDER BY m_pq DESC, tok LIMIT 10""")),

    // ---- per-source drift -------------------------------------------
    // the grouped monitor: which SOURCE drifted between the even and
    // odd halves — per-group union vocabulary, per-group totals, same
    // micro-nat terms; each group's row equals tokenKlReport run on
    // that group alone (spec-pinned).
    QueryDef("q_source_kl", (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Decontam.klReportBy(d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 =!= 0), "source", "text")
        .orderBy("source")
    }, Some {
      def term(a: String, na: String, b: String, nb: String) =
        OracleSql.klTermSql(a, na, b, nb, "t.v")
      s"""WITH wp AS (SELECT source,
              unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents WHERE doc_id % 2 = 0),
          wq AS (SELECT source,
              unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents WHERE doc_id % 2 <> 0),
          pc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cp
                 FROM wp WHERE length(tok) > 0 GROUP BY source, tok),
          qc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cq
                 FROM wq WHERE length(tok) > 0 GROUP BY source, tok),
          u AS (SELECT coalesce(pc.source, qc.source) AS g,
                  coalesce(pc.tok, qc.tok) AS tok,
                  coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
                FROM pc FULL JOIN qc
                  ON pc.source IS NOT DISTINCT FROM qc.source
                    AND pc.tok = qc.tok),
          t AS (SELECT g, CAST(sum(cp) AS BIGINT) AS np,
                  CAST(sum(cq) AS BIGINT) AS nq,
                  CAST(count(*) AS BIGINT) AS v
                FROM u GROUP BY g),
          terms AS (SELECT u.g,
              ${term("cp", "t.np", "cq", "t.nq")} AS m_pq,
              ${term("cq", "t.nq", "cp", "t.np")} AS m_qp
            FROM u JOIN t ON u.g IS NOT DISTINCT FROM t.g)
          SELECT terms.g AS source,
            CAST(count(*) AS BIGINT) AS n_vocab, t.np, t.nq,
            CAST(sum(m_pq) AS BIGINT) AS kl_pq_micro,
            CAST(sum(m_qp) AS BIGINT) AS kl_qp_micro
          FROM terms JOIN t ON terms.g IS NOT DISTINCT FROM t.g
          GROUP BY terms.g, t.np, t.nq ORDER BY source"""
    }),

    // ---- corpus overlap (shingle Jaccard) ---------------------------
    // set-level companion to the distribution-level KL: exact Jaccard
    // of the even/odd halves' distinct 3-gram shingle sets — one
    // full-outer join, one aggregate.
    QueryDef("q_corpus_overlap", (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Decontam.shingleJaccard(d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 =!= 0), "text")
    }, Some(
      s"""WITH ${OracleSql.docShingleCte},
          sa AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 2 = 0),
          sb AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 2 <> 0),
          u AS (SELECT sa.sh AS a, sb.sh AS b
                FROM sa FULL JOIN sb ON sa.sh = sb.sh),
          c AS (SELECT CAST(count(a) AS BIGINT) AS n_a,
                  CAST(count(b) AS BIGINT) AS n_b,
                  CAST(count(CASE WHEN a IS NOT NULL AND b IS NOT NULL
                    THEN 1 END) AS BIGINT) AS n_inter
                FROM u)
          SELECT n_a, n_b, n_inter,
            CAST(n_a + n_b - n_inter AS BIGINT) AS n_union,
            floor((CAST(n_inter AS DOUBLE) /
              CAST(n_a + n_b - n_inter AS DOUBLE))
              * 1000000.0 + 0.5) / 1000000.0 AS jaccard,
            floor((CAST(n_inter AS DOUBLE) / CAST(n_a AS DOUBLE))
              * 1000000.0 + 0.5) / 1000000.0 AS containment_a,
            floor((CAST(n_inter AS DOUBLE) / CAST(n_b AS DOUBLE))
              * 1000000.0 + 0.5) / 1000000.0 AS containment_b
          FROM c""")),

    // ---- KS distribution-shift test ---------------------------------
    // two-sample Kolmogorov-Smirnov over per-doc token counts, even vs
    // odd halves: cumulative integer counts over the distinct-value
    // grid, one double-division pair per value floored to the micro
    // grid before the max.
    QueryDef("q_ks_drift", (s, dir) => {
      import graft.functions.TextAnalysis
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          when(col("text").isNull, lit(null))
            .otherwise(TextAnalysis.wsTokenCount(col("text")))
            .cast("double").as("toks"))
      Decontam.ksStatistic(d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 =!= 0), "toks")
    }, Some(
      s"""WITH ${OracleSql.docTokenCountCte("doc_id")},
          ca AS (SELECT v, CAST(count(*) AS BIGINT) AS ca FROM x
                 WHERE doc_id % 2 = 0 AND v IS NOT NULL GROUP BY v),
          cb AS (SELECT v, CAST(count(*) AS BIGINT) AS cb FROM x
                 WHERE doc_id % 2 <> 0 AND v IS NOT NULL GROUP BY v),
          u AS (SELECT coalesce(ca.v, cb.v) AS v,
                  coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
                FROM ca FULL JOIN cb ON ca.v = cb.v),
          t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                  CAST(sum(cb) AS BIGINT) AS nb FROM u),
          c AS (SELECT v,
                  sum(ca) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cpa,
                  sum(cb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cpb
                FROM u)
          SELECT na AS n_p, nb AS n_q,
            max(floor(abs(cpa / CAST(na AS DOUBLE)
              - cpb / CAST(nb AS DOUBLE)) * 1000000.0 + 0.5)
              / 1000000.0) AS ks
          FROM c, t GROUP BY na, nb""")),

    // ---- crawl-snapshot delta ---------------------------------------
    // Two deterministically planted snapshots: the old one misses the
    // %7==0 docs (added later) and carries a stale text for %5==0; the
    // new one dropped the %11==3 docs (removed). Every id classifies
    // into exactly one of four statuses; digests ride so the oracle
    // gates the comparison itself, not just the labels.
    QueryDef("q_snapshot_delta", (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val old = d.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" vOLD"))).otherwise(col("text")))
      val nw = d.filter(col("doc_id") % 11 =!= 3)
      Curation.snapshotDelta(old, nw, "doc_id", "text")
        .orderBy("doc_id")
    }, Some(
      """WITH old AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' vOLD' ELSE text END
               AS text
           FROM documents WHERE doc_id % 7 <> 0),
          nw AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3),
          ok AS (SELECT doc_id, md5(coalesce(text, '')) AS old_md5 FROM old),
          nk AS (SELECT doc_id, md5(coalesce(text, '')) AS new_md5 FROM nw),
          j AS (SELECT coalesce(ok.doc_id, nk.doc_id) AS doc_id,
                  old_md5, new_md5
                FROM ok FULL JOIN nk ON ok.doc_id = nk.doc_id)
          SELECT doc_id,
            CASE WHEN old_md5 IS NULL THEN 'added'
                 WHEN new_md5 IS NULL THEN 'removed'
                 WHEN old_md5 = new_md5 THEN 'unchanged'
                 ELSE 'changed' END AS status,
            old_md5, new_md5
          FROM j ORDER BY doc_id""")),

    // ---- per-source corpus report -----------------------------------
    // The curation dashboard: per source, NORMALIZED-token totals
    // (Unicode canon — CJK/accented text keeps its tokens; a doc whose
    // canon is empty contributes ZERO tokens, not a phantom one) and
    // the quality-gate pass count over the RAW text (the punctuation
    // signal only exists pre-normalization). Every aggregate
    // accumulates integers — no float summation-order hazard; the only
    // double is a ratio of two longs rounded at the end.
    QueryDef("q_corpus_report", (s, dir) => {
      import graft.functions.TextAnalysis
      val norm = TextAnalysis.normalizeText(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("source"),
          when(length(norm) === 0, 0L)
            .otherwise(TextAnalysis.wsTokenCount(norm).cast("long"))
            .as("toks"),
          when(TextAnalysis.qualityScore(col("text")) >= 0.5, 1L)
            .otherwise(0L).as("q"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          sum(col("q")).as("n_quality"))
        .withColumn("mean_tokens",
          round(col("n_tokens").cast("double") /
            col("n_docs").cast("double"), 4))
        .orderBy("source")
    }, Some {
      import graft.functions.TextAnalysis
      s"""WITH n AS (SELECT source, text,
           trim(regexp_replace(lower(text),
             '${TextAnalysis.normalizePattern}', ' ', 'g')) AS t
           FROM documents),
          tw AS (SELECT source, text, t,
             string_split_regex(text, '\\s+') AS w FROM n),
          d AS (SELECT source,
           CASE WHEN length(t) = 0 THEN 0
                ELSE CAST(len(string_split_regex(t, '\\s+')) AS BIGINT)
           END AS toks,
           CASE WHEN $qualityExprSql >= 0.5 THEN 1 ELSE 0 END AS q
           FROM tw)
          SELECT source, count(*) AS n_docs,
            CAST(sum(toks) AS BIGINT) AS n_tokens,
            CAST(sum(q) AS BIGINT) AS n_quality,
            round(CAST(sum(toks) AS DOUBLE) / count(*), 4) AS mean_tokens
          FROM d GROUP BY source ORDER BY source"""
    }),

    // ---- per-source corpus HEALTH report ----------------------------
    // the new-signal dashboard: per source, how many docs pass the
    // cheap Gopher shape rules, the source-level mean LM cross-entropy
    // (summed as integral micro-nats — dividing per doc first would
    // round too early), and repeated-span pressure (docs with spans +
    // duplicated-token fraction). Every aggregate is an integer sum;
    // the only doubles are two final ratios, floor-rounded.
    QueryDef("q_corpus_health", (s, dir) => {
      import graft.functions.{Dedup, LangModel, TextAnalysis}
      val docs = Tables.load(s, dir, "documents")
      val model = LangModel.trainUnigram(
        docs.filter(col("doc_id") % 3 =!= 0), "text")
      val lm = LangModel.tokenLogLoss(docs, "doc_id", "text", model)
      val spans = Dedup.repeatedKgramSpans(docs, "text", "doc_id", k = 8)
        .select(col("doc_id"),
          (col("n_spans") > 0).cast("long").as("spanned"),
          col("n_dup_tokens").cast("long").as("dup_toks"))
      val t = col("text")
      docs
        .select(col("doc_id"), col("source"),
          ((TextAnalysis.alphaWordFraction(t) >= 0.8) &&
            (TextAnalysis.symbolWordRatio(t) <= 0.1) &&
            (TextAnalysis.wsTokenCount(t) >= 20)).cast("long").as("shape"))
        // LEFT joins: a zero-token doc is absent from tokenLogLoss, but
        // a health report that silently drops exactly the empty
        // documents would undercount the unhealthiest source
        .join(lm, Seq("doc_id"), "left")
        .join(spans, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("shape")).as("n_shape_pass"),
          sum(coalesce(col("ce_micro"), lit(0L))).as("__cem"),
          sum(coalesce(col("len"), lit(0L))).as("__len"),
          sum(coalesce(col("spanned"), lit(0L))).as("n_spanned"),
          sum(coalesce(col("dup_toks"), lit(0L))).as("__dup"))
        .select(col("source"), col("n_docs"), col("n_shape_pass"),
          when(col("__len") > 0,
            floor(col("__cem").cast("double") / 1e6 /
              col("__len").cast("double") * 10000.0 + 0.5) / 10000.0)
            .otherwise(lit(0.0)).as("mean_ce"),
          col("n_spanned"),
          when(col("__len") > 0,
            floor(col("__dup").cast("double") /
              col("__len").cast("double") * 10000.0 + 0.5) / 10000.0)
            .otherwise(lit(0.0)).as("dup_frac"))
        .orderBy("source")
    }, Some(
      s"""WITH ${OracleSql.lmLossCtes},
          ${OracleSql.dupSpanCtes},
          sp AS (SELECT doc_id, 1 AS spanned,
            8 + coalesce(list_sum(list_transform(
              list_transform(range(len(ps) - 1), i -> ps[i+2] - ps[i+1]),
              d -> least(d, 8))), 0) AS dup_toks
          FROM spag),
          shape AS (SELECT doc_id, source,
            CASE WHEN len(w) > 0
              AND CAST(len(list_filter(w, x ->
                regexp_matches(x, '\\p{L}'))) AS DOUBLE) / len(w) >= 0.8
              AND CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
                AS DOUBLE) / len(w) <= 0.1
              AND len(w) >= 20
            THEN 1 ELSE 0 END AS shp
          FROM (SELECT doc_id, source, text,
                  string_split_regex(text, '\\s+') AS w FROM documents)),
          j AS (SELECT s.source, s.shp,
                  coalesce(lm.cem, 0) AS cem, coalesce(lm.len, 0) AS len,
                  coalesce(sp.spanned, 0) AS spanned,
                  coalesce(sp.dup_toks, 0) AS dup_toks
                FROM shape s LEFT JOIN lm USING (doc_id)
                LEFT JOIN sp USING (doc_id))
          SELECT source,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(shp) AS BIGINT) AS n_shape_pass,
            CASE WHEN sum(len) > 0 THEN
              floor(CAST(sum(cem) AS DOUBLE) / 1000000.0 /
                CAST(sum(len) AS DOUBLE) * 10000 + 0.5) / 10000
            ELSE 0.0 END AS mean_ce,
            CAST(sum(spanned) AS BIGINT) AS n_spanned,
            CASE WHEN sum(len) > 0 THEN
              floor(CAST(sum(dup_toks) AS DOUBLE) /
                CAST(sum(len) AS DOUBLE) * 10000 + 0.5) / 10000
            ELSE 0.0 END AS dup_frac
          FROM j GROUP BY source ORDER BY source""")),

    // ---- deterministic train/val/test split -------------------------
    QueryDef("q_split", (s, dir) => {
      Curation.assignSplit(Tables.load(s, dir, "documents"),
          "doc_id", valPct = 5, testPct = 5)
        .select("doc_id", "split")
        .orderBy("doc_id")
    }, Some {
      val (t, v) = Curation.splitThresholds(5, 5)
      s"""SELECT doc_id,
            CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$t'
                 THEN 'test'
                 WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$v'
                 THEN 'val' ELSE 'train' END AS split
          FROM documents ORDER BY doc_id"""
    }),

    // ---- quality-ranked selection ------------------------------------
    QueryDef("q_quality_select", (s, dir) => {
      import graft.functions.TextAnalysis
      val docs = Tables.load(s, dir, "documents")
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      Curation.keepTopFraction(docs, "doc_id", "quality", 60L)
        .select("doc_id", "quality")
        .orderBy("doc_id")
    }, Some(
      s"""WITH tw AS (SELECT doc_id, text,
            string_split_regex(text, '\\s+') AS w FROM documents),
          sc AS (SELECT doc_id, $qualityExprSql AS quality FROM tw
                 WHERE $qualityExprSql IS NOT NULL),
          r AS (SELECT doc_id, quality, row_number() OVER
                  (ORDER BY quality DESC, doc_id) AS rn FROM sc)
          SELECT doc_id, quality FROM r
          WHERE rn <= (SELECT (count(*) * 60) // 100 FROM sc)
          ORDER BY doc_id""")),

    // ---- boilerplate mining (top n-grams by document frequency) -----
    QueryDef("q_top_ngrams", (s, dir) => {
      Decontam.topShinglesByDf(
        graft.functions.Spread.across(Tables.load(s, dir, "documents")),
        "text", n = 3, k = 20)
    }, Some(
      s"""WITH ${OracleSql.docShingleCte}
          SELECT sh AS shingle, count(*) AS df FROM sh
          GROUP BY 1 ORDER BY df DESC, shingle LIMIT 20""")))
}
