package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before anything leaves the cleaning stage. Pure
  * `regexp_count`/`regexp_replace` projections: codegen'd, no UDFs, no
  * shuffle — the operator is embarrassingly parallel and survives any
  * scale the scan survives.
  *
  * The patterns deliberately stay in the regex subset whose semantics are
  * identical between Java's engine (Spark) and RE2 (DuckDB oracle):
  * character classes, bounded/unbounded repetition, non-capturing groups,
  * ASCII word boundaries. Redaction replaces in a fixed order (emails →
  * phones → IPv4) so the output is deterministic.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Counts of each PII kind in a text column. */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe)).cast("long")
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re)).cast("long")

  /** Redact all three kinds, emails first (a phone/IP never overlaps an
    * already-redacted email span — the placeholders contain no digits).
    */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhoneRe, "<PHONE>")
    regexp_replace(noPhone, Ipv4Re, "<IP>")
  }

  /** Per-document PII report: (idCol, n_emails, n_phones, n_ipv4,
    * redacted_len). The redacted text itself is a projection away
    * ([[redact]]) — the report carries its length so the result stays a
    * compact scalar table.
    */
  def piiStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      emailCount(col(textCol)).as("n_emails"),
      phoneCount(col(textCol)).as("n_phones"),
      ipv4Count(col(textCol)).as("n_ipv4"),
      length(redact(col(textCol))).cast("long").as("redacted_len"))
}
