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
  /** +-prefixed international number, 9–15 digits (E.164 envelope).
    * The trailing `\b` (valid in both java.regex and RE2) makes the
    * match all-or-nothing: a run longer than 15 digits is left intact
    * for audit rather than partially redacted (15 digits swallowed,
    * the tail appended to the placeholder). Separator formats
    * (dashes/spaces/NANP parentheses) are deliberately out of scope
    * for THIS tier — it exists for exact oracle parity; the
    * recall-oriented forms live in [[PhoneRecallRes]]. */
  val PhoneRe = "\\+\\d{9,15}\\b"

  /** Recall tier: separator phone formats the parity tier skips.
    * Ordered most-specific-first; still RE2-compatible (no
    * lookarounds), but NOT part of the oracle contract — recall is
    * pinned by a planted-PII spec instead (PiiSpec).
    *  - NANP with separators: optional +1/1 prefix, (415) 255-0123 /
    *    415-255-0123 / 415.255.0123 / 415 255 0123.
    *  - International with separators: +44 20 7946 0958 etc. (groups
    *    of 2–4 digits separated by -, ., or space). */
  val PhoneRecallRes: Seq[String] = Seq(
    "(\\+?1[-. ])?\\(\\d{3}\\)[-. ]?\\d{3}[-. ]\\d{4}\\b",
    "(\\+?1[-. ])?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "\\+\\d{1,3}([-. ]\\d{1,6}){2,5}\\b")

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

  /** Recall-oriented redaction: [[redactText]]'s email→IP order, then
    * the separator phone forms in [[PhoneRecallRes]] (most-specific
    * first, so "+1 415-255-0123" is one [PHONE], not a country code
    * glued to a placeholder), then the E.164 parity pattern. Emails
    * and IPs go first so digit runs inside an address
    * (user123-456-7890@…, 10.2.123.7) can't be half-eaten as phones.
    * Use this tier when the goal is a scrubbed corpus; use
    * [[redactText]] when the goal is the exact count≡placeholder
    * reconciliation contract. Still a stateless projection — same
    * streaming/scale shape. */
  def redactTextRecall(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val eIp = regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("[EMAIL]")),
      lit(Ipv4Re), lit("[IP]"))
    val phones = PhoneRecallRes.foldLeft(eIp)((t, re) =>
      regexp_replace(t, lit(re), lit("[PHONE]")))
    regexp_replace(phones, lit(PhoneRe), lit("[PHONE]"))
  }
}
