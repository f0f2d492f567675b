package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus an optional ANSI-SQL
  * oracle (run by the driver in DuckDB over the same parquet tables).
  *
  * Contract notes (driver compare hashes values after sorting columns by
  * name):
  *  - every computed/aggregate column is aliased identically on both sides;
  *  - doubles are rounded explicitly on both sides (sum→2dp, ratios→6dp)
  *    so cross-engine summation-order noise cannot flip the hash;
  *  - timestamps are emitted as formatted strings (events.ts is
  *    nanosecond-precision parquet; Spark truncates to micros while DuckDB
  *    keeps ns — strings at second precision are stable on both);
  *  - each result has a deterministic ORDER BY.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A group of related QueryDefs (one per operator family). */
trait QueryPack {
  def queries: Seq[QueryDef]

  /** UTC timestamp literal independent of the JVM default timezone
    * (java.sql.Timestamp.valueOf parses in the platform TZ — a silent
    * oracle divergence on any non-UTC driver machine). */
  protected def utcTs(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  /** Shared describe() output shape: metric + count/null_count raw,
    * every other stat rounded to `precision` on both engines. */
  protected def roundedDescribe(st: DataFrame, precision: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, round}
    st.select(col("metric"), col("count"), col("null_count"),
      round(col("mean"), precision).as("mean"),
      round(col("std"), precision).as("std"),
      round(col("min"), precision).as("min"),
      round(col("p25"), precision).as("p25"),
      round(col("p50"), precision).as("p50"),
      round(col("p75"), precision).as("p75"),
      round(col("max"), precision).as("max"))
  }
}

/** Shared DuckDB oracle fragments used by more than one query pack. */
private[queries] object OracleSql {

  /** Distinct word-3-gram shingles per document (mirrors
    * TextAnalysis.shingles(n = 3) over the documents table). */
  val docShingleCte: String =
    """w AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(len(w) - 2),
                  i -> array_to_string(w[i+1:i+3], ' '))) AS sh
              FROM w WHERE len(w) >= 3)"""

  /** Per-doc unigram LM loss, trained on the doc_id % 3 != 0 split
    * (mirrors LangModel.trainUnigram + tokenLogLoss): CTE chain ending
    * in `lm(doc_id, cem, len)` with integral micro-nat sums. ONE copy
    * shared by q_lm_score and q_corpus_health — a tokenizer or
    * smoothing tweak applied to a single copy would silently split
    * the two oracles. */
  val lmLossCtes: String =
    """tr AS (SELECT unnest(string_split_regex(text, '\s+')) AS token
          FROM documents WHERE doc_id % 3 <> 0),
        cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tr
                WHERE length(token) > 0 GROUP BY token),
        nv AS (SELECT CAST(sum(c) + count(*) + 1 AS DOUBLE) AS denom
               FROM cnt),
        nll AS (SELECT token,
            CAST(floor(-ln(CAST(c + 1 AS DOUBLE) /
              (SELECT denom FROM nv)) * 1000000 + 0.5) AS BIGINT) AS nm
          FROM cnt),
        oov AS (SELECT CAST(floor(-ln(1.0 / (SELECT denom FROM nv))
            * 1000000 + 0.5) AS BIGINT) AS nm),
        dt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n
          FROM (SELECT doc_id,
                  unnest(string_split_regex(text, '\s+')) AS token
                FROM documents)
          WHERE length(token) > 0 GROUP BY doc_id, token),
        lm AS (SELECT doc_id,
            sum(n * coalesce(nll.nm, (SELECT nm FROM oov))) AS cem,
            sum(n) AS len
          FROM dt LEFT JOIN nll USING (token) GROUP BY doc_id)"""

  /** Duplicated 8-gram start positions per doc (mirrors
    * Dedup.repeatedKgramSpans' position pass): chain ending in
    * `spag(doc_id, ps)` (sorted duplicated starts, spanned docs only)
    * with `s8(doc_id, sh, nt)` carrying the token count. Shared by
    * q_repeated_spans and q_corpus_health. */
  val dupSpanCtes: String =
    """w8 AS (SELECT doc_id, string_split_regex(text, '\s+') AS w
          FROM documents),
        s8 AS (SELECT doc_id,
          CASE WHEN len(w) >= 8 THEN
            list_transform(range(len(w) - 7),
              i -> array_to_string(w[i+1:i+8], ' '))
          ELSE [] END AS sh,
          coalesce(len(w), 0) AS nt
        FROM w8),
        ph AS (SELECT doc_id, generate_subscripts(sh, 1) - 1 AS pos,
                 md5(unnest(sh)) AS h
               FROM s8),
        hot AS (SELECT h FROM (SELECT h, count(*) AS n FROM ph
                               GROUP BY h) WHERE n >= 2),
        dp AS (SELECT doc_id, pos FROM ph JOIN hot USING (h)),
        spag AS (SELECT doc_id, list_sort(list(pos)) AS ps
                 FROM dp GROUP BY doc_id)"""

  /** The minhash signature + LSH band CTE chain (mirrors
    * Dedup.minhashSignature + bandedKeys for k=8, rowsPerBand=2 over
    * [[docShingleCte]]'s `sh`): chain ending in `bands(doc_id, band,
    * key)`. ONE copy shared by q_minhash_lsh and q_neardup_decontam —
    * a hash-family tweak applied to a single mirror would silently
    * split the two oracles. */
  val minhashBandsCtes: String = {
    val mins = (0 until 8).map(i =>
      s"min(substring(md5('${i / 4}:' || sh), ${(i % 4) * 8 + 1}, 8)) AS mh$i")
      .mkString(",\n            ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS key FROM sig")
      .mkString("\n          UNION ALL ")
    s"""sig AS (SELECT doc_id,
            $mins
          FROM sh GROUP BY doc_id),
          bands AS (
          $bands)"""
  }

  /** The Curation.qualityGate(Config()) mirror: CTE chain over the
    * `documents` table ending in `gate(doc_id, source, text, w)` —
    * min-token count, punctuation ratio, argmax language-ID = 'en'.
    * ONE copy shared by q_corpus_curation and q_ingest_screen — a
    * gate tweak applied to a single mirror would silently split the
    * two oracles. */
  lazy val curationGateCtes: String = {
    val scores = graft.functions.TextAnalysis.langProfiles.map {
      case (lang, stops) =>
        val lst = stops.map(w => s"'$w'").mkString("[", ",", "]")
        s"len(list_filter(w, x -> list_contains($lst, x))) AS c_$lang"
    }.mkString(",\n            ")
    s"""w0 AS (SELECT doc_id, source, text,
              string_split_regex(text, '\\s+') AS w
            FROM documents),
          lx AS (SELECT doc_id,
            $scores
          FROM w0),
          lp AS (SELECT doc_id,
            CASE WHEN c_en >= greatest(c_de, c_es, c_fr, c_zh) THEN 'en'
                 WHEN c_de >= greatest(c_es, c_fr, c_zh) THEN 'de'
                 WHEN c_es >= greatest(c_fr, c_zh) THEN 'es'
                 WHEN c_fr >= c_zh THEN 'fr'
                 ELSE 'zh' END AS pred
          FROM lx),
          gate AS (SELECT w0.* FROM w0 JOIN lp USING (doc_id)
            WHERE len(w) >= 5
              AND (CASE WHEN length(text) > 0
                   THEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
                        / length(text)
                   ELSE 0 END) <= 0.2
              AND pred = 'en')"""
  }

  /** The add-one token-KL term chain (mirrors Decontam.klTerms over
    * the even/odd doc_id split): CTE chain ending in
    * `terms(tok, cp, cq, v, np, nq, m_pq, m_qp)` with integral
    * micro-nat terms. ONE copy shared by q_token_kl and
    * q_drift_tokens — a smoothing or rounding tweak applied to a
    * single mirror would silently split the two oracles. */
  /** Null-guarded per-doc whitespace token count as DOUBLE (mirrors
    * wsTokenCount with null text staying NULL — it feeds null_count /
    * filtered samples, never a phantom zero): CTE `x(<extraCols>, v)`
    * over the documents table. ONE copy shared by
    * q_describe_by_source and q_ks_drift. */
  def docTokenCountCte(extraCols: String): String =
    s"""x AS (SELECT $extraCols,
            CASE WHEN text IS NULL THEN NULL
              ELSE CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE)
            END AS v
          FROM documents)"""

  /** One micro-nat KL term as SQL (mirrors Decontam.klTermMicro):
    * p̂·(ln p̂ − ln q̂) on add-one rationals, floored to the 10⁻⁶ grid.
    * `v` is the (possibly table-qualified) union-vocab size reference
    * — the ONE copy compiled into [[klTermsCtes]] and the grouped
    * q_source_kl oracle alike. */
  def klTermSql(a: String, na: String, b: String, nb: String,
      v: String): String = {
    def phat(c: String, n: String) = s"(($c+1)/CAST($n+$v AS DOUBLE))"
    s"""CAST(floor((${phat(a, na)} *
          (ln(${phat(a, na)}) - ln(${phat(b, nb)})))
          * 1000000.0 + 0.5) AS BIGINT)"""
  }

  lazy val klTermsCtes: String = {
    def term(a: String, na: String, b: String, nb: String) =
      klTermSql(a, na, b, nb, "v")
    s"""wp AS (SELECT unnest(string_split_regex(text, '\\s+')) AS tok
               FROM documents WHERE doc_id % 2 = 0),
          wq AS (SELECT unnest(string_split_regex(text, '\\s+')) AS tok
                 FROM documents WHERE doc_id % 2 <> 0),
          pc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cp FROM wp
                 WHERE length(tok) > 0 GROUP BY tok),
          qc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cq FROM wq
                 WHERE length(tok) > 0 GROUP BY tok),
          u AS (SELECT coalesce(pc.tok, qc.tok) AS tok,
                  coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
                FROM pc FULL JOIN qc ON pc.tok = qc.tok),
          t AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
                  CAST(sum(cq) AS BIGINT) AS nq,
                  CAST(count(*) AS BIGINT) AS v FROM u),
          terms AS (SELECT tok, cp, cq, v, np, nq,
              ${term("cp", "np", "cq", "nq")} AS m_pq,
              ${term("cq", "nq", "cp", "np")} AS m_qp
            FROM u, t)"""
  }

  /** Cosine of two fixed-dim numeric-list columns — double accumulation
    * in element order, mirroring Similarity.cosine. */
  def cosD(a: String, b: String, dim: Int): String = {
    def d(v: String, i: String) = s"CAST($v[$i] AS DOUBLE)"
    s"""(list_sum(list_transform(range(1, ${dim + 1}), i -> ${d(a, "i")} * ${d(b, "i")})) /
        (sqrt(list_sum(list_transform(range(1, ${dim + 1}), i -> ${d(a, "i")} * ${d(a, "i")}))) *
         sqrt(list_sum(list_transform(range(1, ${dim + 1}), i -> ${d(b, "i")} * ${d(b, "i")})))))"""
  }
}

/** Per-corpus-per-JVM temp index directories: reused (overwrite mode)
  * across one process's repeated runs, disjoint between concurrent
  * JVMs, and deleted by a shutdown hook — without the hook every JVM
  * would strand one corpus-sized copy in the temp volume. */
private[graft] object TempIndexDirs {
  private val registered = scala.collection.mutable.Set.empty[String]

  def jvmScoped(prefix: String, corpusDir: String): String = synchronized {
    val path = s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
      java.lang.Integer.toHexString(corpusDir.hashCode) + "_" +
      ProcessHandle.current().pid()
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRec(new java.io.File(path))))
    path
  }

  private def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }
}

/** Parquet table loader for the driver-generated testdata layout. */
object Tables {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped in two parquet layouts across driver
    * generations: TIMESTAMP(NANOS) (Spark refuses by default — read
    * nanos as long and truncate to micros with integral division; ns
    * epoch values exceed double's 2^53, so `div`, never `/`) and plain
    * timestamp[us] without timezone (Spark reads TIMESTAMP_NTZ — cast
    * to session-local TIMESTAMP, an identity mapping under the UTC
    * session timezone every entry point sets, so unix_micros/BIGINT
    * casts downstream keep working). Either way the result matches the
    * naive-µs value DuckDB sees. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        d.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else if (f.name == "ts" && f.dataType == TimestampNTZType)
        d.withColumn("ts", col("ts").cast(TimestampType))
      else d
    }
  }
}
