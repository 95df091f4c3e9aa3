package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact emails, IPv4
  * addresses, and E.164-style phone numbers — the standard
  * pre-training hygiene pass (the C4/RefinedWeb-style pipelines run
  * exactly this shape before dedup).
  *
  * Everything is per-row expression work (`regexp_count` /
  * `regexp_replace` — codegen'd, no UDF, no shuffle), so the operator
  * is a stateless projection: streaming-legal, trivially 100
  * TB-shaped (it rides the scan), and composable in front of the
  * ingest gate. The patterns are deliberately restricted to syntax
  * valid in BOTH java.util.regex and RE2 (ASCII classes, `\b`,
  * bounded repetition — no lookarounds), so the DuckDB oracle can
  * recompute the identical redaction.
  */
object Pii {

  /** user@host.tld with ASCII local/domain parts. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (syntactic — 999.0.0.0 matches; redaction wants
    * recall, not RFC validation). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** +-prefixed international number, 9–15 digits (E.164 envelope). */
  val PhoneRe = "\\+\\d{9,15}"

  /** Per-document PII counts and the redacted text. Output:
    * (idCol, n_emails, n_ips, n_phones, redacted). Emails are replaced
    * first so an address' dotted domain can't be re-matched as an
    * IPv4 — and each count runs on the SAME intermediate its
    * replacement runs on, so counts equal placeholders exactly (an
    * IPv4 inside an email's domain is neither counted nor
    * redacted twice; audits reconciling counts against [TAG]
    * occurrences balance). */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val e1 = regexp_replace(col(textCol), lit(EmailRe), lit("[EMAIL]"))
    val e2 = regexp_replace(e1, lit(Ipv4Re), lit("[IP]"))
    df.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(e1, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(e2, lit(PhoneRe)).cast("long").as("n_phones"),
      redactText(col(textCol)).as("redacted"))
  }

  /** The redaction alone, as a column expression — for in-place text
    * scrubbing inside larger pipelines (e.g. the ingest gate). Same
    * replacement order as [[redact]]. */
  def redactText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("[EMAIL]")),
        lit(Ipv4Re), lit("[IP]")),
      lit(PhoneRe), lit("[PHONE]"))
}
