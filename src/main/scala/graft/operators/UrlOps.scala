package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Canonical URL: fragment off; `utm_*` params off
    * (case-insensitive, anchored to a real `?`/`&` separator so path
    * segments and other params' values are never touched, separators
    * healed); the scheme's OWN default port off (`:80` for http,
    * `:443` for https — never cross-scheme); scheme+authority
    * lowercased (path/query case is significant and kept); one
    * trailing PATH slash trimmed (the query string is never edited
    * beyond utm removal). */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // split base (scheme+authority+path) from the query at the
    // first '?' — in a legal URL '?'/'&' only delimit the query, so
    // the separator-anchored utm patterns below cannot fire in paths
    val base = regexp_extract(noFrag, "^[^?]*", 0)
    val query0 = regexp_replace(noFrag, "^[^?]*", "")
    // drop each utm param WITH its leading separator; if the first
    // surviving param lost its '?', heal the leading '&'; then an
    // empty-param trailing '&' or an all-separator residue goes (a
    // '?' INSIDE a value is legal and stays)
    val query = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(query0,
            "[?&][uU][tT][mM]_[a-zA-Z0-9]*=[^&]*", ""),
          "^&", "?"),
        "&+$", ""),
      "^[?&]+$", "")
    // authority split: the default-port strip END-anchors on the
    // authority alone (a literal ":80/" replace would also fire
    // inside paths) and the lowercase touches only scheme+host
    val head = regexp_extract(base, schemeAuthority, 0)
    val path = regexp_replace(base, schemeAuthority, "")
    val headLc = lower(head)
    // only the scheme's own default port is a no-op to strip
    val headNoPort = when(headLc.startsWith("http://"),
        regexp_replace(headLc, ":80$", ""))
      .when(headLc.startsWith("https://"),
        regexp_replace(headLc, ":443$", ""))
      .otherwise(headLc)
    concat(headNoPort, regexp_replace(path, "/$", ""), query)
  }

  /** The authority's host: no scheme, no port, no userinfo. The
    * userinfo arm is greedy ([^/?#]* admits '@') so a userinfo that
    * itself contains '@' — the phishing-obfuscation shape — still
    * yields the real host after the LAST '@'. Trailing dots (the
    * DNS-legal FQDN root form, "example.com.") strip — r17 review
    * pass 8: left on, they evaded every blocklist suffix chain
    * ("example.com." ≠ "example.com", the classic bypass); the r18
    * ADVICE hardening strips a RUN of them ("example.com.." evaded
    * the single-dot form the same way). Bracketed
    * IPv6 literals ("http://[2001:db8::1]/") are OUT OF SCOPE like
    * the naive-PSL caveat below — the host class stops at ':', so
    * they extract as "[" and roll up as garbage rather than parsing;
    * a production pipeline filters or special-cases them upstream. */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url,
        "^[^:/?#]+://(?:[^/?#]*@)?([^/?#:@]+)", 1)),
      "\\.+$", "")

  /** Naive registered domain — the last two dot-labels of the host.
    * NOT public-suffix-list aware (co.uk-style suffixes collapse to
    * the suffix); a PSL table join is the production upgrade, this is
    * the deterministic in-plan form both engines replay. */
  def registeredDomainOf(url: Column): Column =
    regexp_extract(hostOf(url), "[^.]+\\.[^.]+$", 0)

  /** Domain-blocklist verdicts (the UT1-style URL filtering stage of
    * C4 / Dolma-class pipelines): a host is blocked iff it EQUALS a
    * blocklisted domain or is a SUBDOMAIN of one — the dot-suffix
    * law, decided by exploding the host's label-suffix chain
    * (`a.b.c → {a.b.c, b.c, c}`) and hash-joining the blocklist,
    * never by `LIKE '%...'` scans. `blocked_by` reports the LONGEST
    * (most specific) matching entry, deterministically — suffix
    * lengths within one host's chain are strictly decreasing.
    *
    * Scale (100 TB): the chain explode is ≤ label-depth rows per doc
    * (single digits); the blocklist (UT1 is ~4M lines) broadcasts
    * onto it; only HIT rows reach the id-keyed arg-max aggregate, so
    * the shuffle is block-rate-sized; the verdict frame then joins
    * back — build side = blocked docs, broadcastable at realistic
    * block rates, degrading to a doc-keyed shuffle join (both sides
    * pre-keyed) if a crawl is majority-blocked. A null host explodes
    * to nothing and verdicts unblocked.
    *
    * Output: every input row as (idCol, hostCol, blocked_by, blocked). */
  def domainBlockVerdicts(df: DataFrame, idCol: String, hostCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    val parts = split(col(hostCol), "\\.")
    // null-host guard: size(null) is -1 and sequence(1, -1) DESCENDS
    // ([1, 0, -1]), which would explode three null suffixes per null
    // host into the join; a null chain explodes to nothing instead,
    // and the left join below still verdicts the row unblocked
    val exploded = df.select(col(idCol),
      explode(when(col(hostCol).isNotNull,
        transform(sequence(lit(1), size(parts)),
          i => array_join(slice(parts, i, size(parts)), ".")))).as("_sfx"))
    // DNS matching is case-insensitive and list files carry stray
    // whitespace (r17 review pass 8: a mixed-case or padded entry
    // silently never matched the lowercased host side)
    val bl = blocklist.select(lower(trim(col(domainCol))).as("_sfx"))
      .distinct()
    val hits = exploded.join(bl, Seq("_sfx"))
      .groupBy(col(idCol))
      .agg(max(struct(length(col("_sfx")).as("l"), col("_sfx").as("d")))
        .as("_m"))
      .select(col(idCol), col("_m").getField("d").as("blocked_by"))
    df.select(col(idCol), col(hostCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("blocked", col("blocked_by").isNotNull)
  }
}
