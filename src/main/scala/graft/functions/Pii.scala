package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the pre-training scrub pass every
  * published web-corpus pipeline runs before tokenization (emails,
  * IP addresses, phone numbers → typed placeholder tokens).
  *
  * Patterns deliberately use only the regex subset with identical
  * semantics in Java's engine (Spark) and RE2 (DuckDB/Go scanners):
  * character classes, bounded repetition, `\b`, `\d` — no lookaround,
  * no backreferences. That keeps every count and every redacted byte
  * reproducible across engines, so the scrub is oracle-checkable and a
  * cluster re-run on a different engine redacts the SAME spans.
  *
  * All detection/redaction is `regexp_count`/`regexp_replace` column
  * math — codegen'd, shuffle-free, runs at scan speed over 100 TB.
  */
object Pii {

  val emailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val phonePattern = """\b\d{3}-\d{3}-\d{4}\b"""

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Pattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern))

  /** Replace every PII span with a typed placeholder. Email first (its
    * matches may contain digit/dot runs the narrower patterns would then
    * see), phone second, IPv4 last; the placeholders themselves contain
    * no digits, so later passes cannot re-match earlier redactions. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")

  /** Per-document scrub report: category counts + the redacted text. */
  def piiReport(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
      emailCount(col(textCol)).as("n_emails"),
      ipv4Count(col(textCol)).as("n_ips"),
      phoneCount(col(textCol)).as("n_phones"),
      redact(col(textCol)).as("redacted"))
}
