package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain hygiene for web-crawl corpora — the RefinedWeb / Dolma
  * provenance gates: normalize a document's source URL to its host and
  * registered domain, drop blocklisted domains, and cap how many
  * documents any one domain may contribute (composing
  * [[Curation.capPerGroup]]).
  *
  * All extraction is RE2-safe regex column math (codegen'd, no UDFs, no
  * java.net.URI — a driver-side parser could not run inside the scan),
  * and every regex lives HERE once, shared with the DuckDB oracles by
  * interpolation so the two engines cannot drift. Reference behavior:
  * the reference has no URL surface (SAR files have none) — this is part
  * of the training-data extension pack.
  */
object UrlOps {

  /** Host of a URL: the authority between `scheme://` (any RFC-3986
    * scheme, case-insensitive) and the first `/`, `?`, `#`, or end;
    * userinfo (`…@`) and port (`:8080`) stripped; lowercased. NULL for
    * strings that don't parse as absolute URLs (no scheme). */
  val hostPattern = "(?i)^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

  def hostOf(url: Column): Column = {
    val h = lower(regexp_extract(url, hostPattern, 1))
    when(length(h) > 0, h)
  }

  /** Registered domain of a host: the last two dot-labels
    * (`a.b.site.com` → `site.com`), the standard crawl-pipeline
    * approximation (a full public-suffix list is a broadcast-joined
    * refinement, not a different shape); hosts with no dot (e.g.
    * `localhost`) pass through unchanged. */
  val regDomainPattern = "([^.]+\\.[^.]+)$"

  def registeredDomain(host: Column): Column =
    when(host.isNotNull,
      coalesce(nullif(regexp_extract(host, regDomainPattern, 1), lit("")),
        host))

  /** `registeredDomain(hostOf(url))` — the one-call form. */
  def urlDomain(url: Column): Column = registeredDomain(hostOf(url))

  /** Drop documents whose registered domain is blocklisted. The
    * blocklist rides as a broadcast anti-join, not an `isin` literal —
    * real blocklists (UT1 and kin) are hundreds of thousands of
    * domains, far past expression-tree size, and an anti-join keeps
    * the corpus scan pipelined. Documents with NO parseable domain are
    * DROPPED too (`keepUnparsed = false` default): a crawl doc whose
    * provenance can't be established fails the gate, which is the
    * conservative curation default. */
  def dropBlockedDomains(docs: DataFrame, urlCol: String,
      blocklist: DataFrame, blockCol: String = "domain",
      keepUnparsed: Boolean = false): DataFrame = {
    val withD = docs.withColumn("__dom", urlDomain(col(urlCol)))
    val kept = withD
      .join(broadcast(blocklist.select(col(blockCol).as("__dom")).distinct()),
        Seq("__dom"), "left_anti")
    (if (keepUnparsed) kept
     else kept.filter(col("__dom").isNotNull))
      .drop("__dom")
  }

  /** The full provenance gate: blocklist + per-domain cap, returning the
    * surviving docs with their `domainCol` attached. Cap selection is
    * `(md5(id), id)` order via [[Curation.capPerGroup]] — deterministic
    * across engines and partitionings, and 256-way parallel even for a
    * domain holding half the corpus. */
  def domainGate(docs: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, capPerDomain: Long,
      domainCol: String = "domain"): DataFrame = {
    val blocked = dropBlockedDomains(docs, urlCol, blocklist)
      .withColumn(domainCol, urlDomain(col(urlCol)))
    Curation.capPerGroup(blocked, idCol, Seq(domainCol), capPerDomain)
  }
}
