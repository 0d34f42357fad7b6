package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction statistics (beyond-reference training-data op):
  * the scrubbing pass every released corpus runs. Patterns are restricted to
  * the regex subset with identical semantics in Java regex (Spark codegen)
  * and RE2 (DuckDB oracle): character classes, bounded/unbounded repetition,
  * alternation — no backreferences, no lookaround.
  *
  * Scale: pure row-local codegen expressions (`regexp_count` /
  * `regexp_replace`) — no UDF, no shuffle; fuses into the scan like the
  * C4 heuristic filter.
  */
object Pii {

  /** Email-shaped spans. */
  val EMAIL: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (phone/account/SSN-shaped — the conservative catch-all
    * used when locale-specific formats are unknown).
    */
  val LONG_DIGITS: String = "[0-9]{8,}"

  /** IPv4-shaped dotted quads. */
  val IPV4: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Replace every match of all three classes with type tags. Order matters:
    * emails first (their local parts may contain digit runs), then IPs
    * (dotted quads would otherwise be eaten digit-run-wise), then digits.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL, "<EMAIL>"),
        IPV4, "<IP>"),
      LONG_DIGITS, "<NUM>")

  /** Per-row PII hit counts + the redacted text length.
    * Output: idCol, n_emails, n_ips, n_long_digits, n_chars_redacted.
    */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      regexp_count(col(textCol), lit(EMAIL)).as("n_emails"),
      regexp_count(regexp_replace(col(textCol), EMAIL, "<EMAIL>"), lit(IPV4)).as("n_ips"),
      regexp_count(
        regexp_replace(regexp_replace(col(textCol), EMAIL, "<EMAIL>"), IPV4, "<IP>"),
        lit(LONG_DIGITS)).as("n_long_digits"),
      length(redact(col(textCol))).as("n_chars_redacted"))
}
