package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data hygiene: redact emails, IPv4 literals
  * and long digit runs (phone/account-number-ish) behind typed
  * placeholders, with per-doc audit counts. Pure chained `regexp_replace`
  * column expressions — whole-stage codegen, no shuffle, no UDFs; the
  * patterns avoid lookarounds and Unicode classes so Java regex (engine)
  * and RE2 (DuckDB oracle) match identically.
  */
object Scrub {
  /** user@host.tld with the common local-part charset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dot-joined 1-3 digit octets on word boundaries (syntactic IPv4 —
    * range-checking octets needs no more redaction fidelity than this).
    */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** 7+ digit runs on word boundaries (applied AFTER the IP pass, so IP
    * octets are already gone).
    */
  val LongDigitsPattern = "\\b[0-9]{7,}\\b"

  /** (docno, scrubbed, n_emails, n_ips, n_longnums): the redacted text plus
    * integer audit counts. Replace order matters and is part of the
    * contract: emails first (their local parts may contain digits/dots),
    * then IPs, then bare digit runs over what remains.
    */
  def redact(corpus: DataFrame, textCol: String = "content"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    val t3 = regexp_replace(t2, LongDigitsPattern, "<NUM>")
    corpus.select(
      col("docno"),
      t3.as("scrubbed"),
      size(regexp_extract_all(t0, lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(t1, lit(Ipv4Pattern), lit(0)))
        .cast("long").as("n_ips"),
      size(regexp_extract_all(t2, lit(LongDigitsPattern), lit(0)))
        .cast("long").as("n_longnums"))
  }
}
