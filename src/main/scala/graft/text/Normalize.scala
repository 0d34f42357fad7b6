package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StringExpressions

/** CCNet-style text normalization (Wenzek et al. 2020 §3: deduplication
  * hashes are computed over lowercased, accent-stripped, NFC-normalized
  * text) — the canonicalization step that runs BEFORE every hash-based
  * dedup op so that byte-level encoding variants ("Café" composed vs
  * decomposed) collapse to one fingerprint.
  *
  * Everything is a row-local projection over [[UnicodeNormalize]] (native
  * codegen Catalyst expression) + built-in `lower`/`regexp_replace` — zero
  * shuffle at any corpus size, fuses into the scan. Accent stripping is
  * NFD + `\p{M}` removal, the same construction DuckDB's `strip_accents`
  * uses, so the oracle maps 1:1.
  */
object Normalize {

  /** Canonical composition (NFC). Registration is idempotent. */
  def nfc(df: DataFrame, c: Column): Column = {
    StringExpressions.register(df.sparkSession)
    StringExpressions.unicodeNormalize(c, "NFC")
  }

  /** Accents removed: canonical decomposition, then every combining mark
    * dropped. NFD∘NFC ≡ NFD, so this composes freely after [[nfc]].
    */
  def stripAccents(df: DataFrame, c: Column): Column = {
    StringExpressions.register(df.sparkSession)
    regexp_replace(StringExpressions.unicodeNormalize(c, "NFD"), "\\p{M}", "")
  }

  /** The full dedup-key fold: accent-strip → lowercase → whitespace
    * collapse → trim. Produces the string CCNet fingerprints.
    */
  def foldText(df: DataFrame, c: Column): Column =
    trim(regexp_replace(lower(stripAccents(df, c)), "\\s+", " "))
}
