package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-scale training pipelines (beyond-
  * reference scale operator): the normalization step that turns raw
  * crawl URLs into the dedup/grouping key — fragment stripped,
  * tracking (utm_*) parameters dropped, default ports removed,
  * scheme+authority lowercased, trailing slash trimmed — plus host
  * and naive registered-domain extraction for domain-level rollups.
  *
  * Every step is a regexp_replace/regexp_extract whose pattern is
  * valid under BOTH Java regex and RE2 (no lookaround, no
  * capture-group replacements — Java spells those `$1` where RE2
  * spells `\1`, so replacements here are literal strings only).
  * Spark's regexp_replace is always global; the oracle twin must
  * pass the 'g' flag so the unanchored utm patterns strip EVERY
  * occurrence on both engines. Pure per-row projections —
  * codegen'd, no shuffle, pushdown-friendly. */
object UrlOps {

  private val schemeAuthority = "^[^:/?#]+://[^/?#]*"

  /** Canonical URL: fragment off; `utm_*` params off (word-boundary
    * anchored, separators healed); `:80`/`:443` default ports off;
    * scheme+authority lowercased (path/query case is significant and
    * kept); one trailing slash trimmed. */
  def normalizeUrl(url: Column): Column = {
    // order matters: fragment first (so $-anchored param patterns
    // see the true end), ports before lowercasing is case-free
    val noFrag = regexp_replace(url, "#.*", "")
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, "\\butm_[a-zA-Z0-9]*=[^&#]*&", ""),
        "\\butm_[a-zA-Z0-9]*=[^&#]*$", ""),
      "[?&]+$", "")
    // split at the authority so the default-port strip END-anchors
    // on the authority alone (a literal ":80/" replace would also
    // fire inside paths) and the lowercase touches only scheme+host
    val head = regexp_extract(noUtm, schemeAuthority, 0)
    val tail = regexp_replace(noUtm, schemeAuthority, "")
    val lowered = concat(
      lower(regexp_replace(head, ":(80|443)$", "")), tail)
    regexp_replace(lowered, "/$", "")
  }

  /** The authority's host: no scheme, no port, no userinfo. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:@]+)", 1))

  /** Naive registered domain — the last two dot-labels of the host.
    * NOT public-suffix-list aware (co.uk-style suffixes collapse to
    * the suffix); a PSL table join is the production upgrade, this is
    * the deterministic in-plan form both engines replay. */
  def registeredDomainOf(url: Column): Column =
    regexp_extract(hostOf(url), "[^.]+\\.[^.]+$", 0)
}
