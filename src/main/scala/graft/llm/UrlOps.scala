package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction for web-corpus curation —
  * the normalize → registered-domain → per-domain-policy chain every
  * crawl-derived training pipeline runs before URL-level dedup and
  * domain budgeting.
  *
  * Everything here is a pure column-expression chain (codegen'd,
  * map-only, shuffle-free) built from RE2-portable regexes, like
  * [[TextOps.scrubPii]]: no lookarounds or backreferences, so the exact
  * same patterns run in any RE2-class engine, which is what lets the
  * DuckDB oracle replicate results byte-for-byte. URL *paths* stay
  * case-sensitive per RFC 3986 — only the scheme and host lowercase.
  */
object UrlOps {

  private val SchemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** Lowercased scheme, or '' when the value isn't a URL. */
  def urlScheme(c: Column): Column =
    lower(regexp_extract(c, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Lowercased host[:port] (authority up to the first /, ? or #). */
  private def hostPort(c: Column): Column =
    lower(regexp_extract(c, s"$SchemePrefix([^/?#]*)", 1))

  /** Canonical host: lowercased, scheme-default port stripped
    * (http:80 / https:443 — a non-default port is identity-relevant and
    * stays), leading `www.` dropped.
    */
  def urlHost(c: Column): Column = {
    val hp = hostPort(c)
    val noPort = when(urlScheme(c) === "https", regexp_replace(hp, ":443$", ""))
      .when(urlScheme(c) === "http", regexp_replace(hp, ":80$", ""))
      .otherwise(hp)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Tracking parameters stripped from query strings: the ad-platform
    * click ids and utm campaign tags that vary per impression while the
    * underlying resource is identical — the single largest source of
    * spurious URL-uniqueness in crawl data.
    */
  val TrackingParamRe = "&(utm_[^=&]*|gclid|fbclid|msclkid|ref)=[^&]*"

  /** Canonical URL: lowercased scheme+host, default port and `www.`
    * stripped, fragment dropped, tracking params removed (other params
    * keep their order), empty path rendered as '/'. Path case and
    * non-tracking query params are preserved — they are identity.
    * Non-URL values (no scheme) pass through unchanged.
    */
  def normalizeUrl(c: Column): Column = {
    val scheme = urlScheme(c)
    val rest = regexp_extract(c, s"$SchemePrefix[^/?#]*([^#]*)", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    // '&'-anchor the whole string so one global pass removes every
    // tracked param, then strip the anchor
    val cleanQ = regexp_replace(
      regexp_replace(concat(lit("&"), query), TrackingParamRe, ""), "^&", "")
    val normPath = when(path === "", lit("/")).otherwise(path)
    when(scheme === "", c).otherwise(concat(
      scheme, lit("://"), urlHost(c), normPath,
      when(cleanQ === "", lit("")).otherwise(concat(lit("?"), cleanQ))))
  }

  /** Registered (pay-level) domain of a host: the label the site
    * operator actually controls — the unit domain budgets and
    * per-domain caps apply to. Heuristic public-suffix handling: last
    * two labels, or last three when the middle label is a common
    * second-level suffix under a two-letter country TLD (co.uk,
    * com.au, ac.jp, ...). A full public-suffix list drops in by
    * widening the alternation.
    */
  def registeredDomain(host: Column): Column = {
    val threeLabel = regexp_extract(host,
      "([^.]+\\.(?:co|com|net|org|gov|ac|edu)\\.[a-z][a-z])$", 1)
    val twoLabel = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(threeLabel =!= "", threeLabel)
      .when(twoLabel =!= "", twoLabel)
      .otherwise(host)
  }

  /** Registered domain straight from a URL. */
  def urlDomain(c: Column): Column = registeredDomain(urlHost(c))
}
