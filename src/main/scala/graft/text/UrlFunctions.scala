package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup-key step of a web-corpus pipeline
  * (two scrapes of one page differ only in scheme/host case, default
  * ports, utm_* tracking params, fragments and trailing slashes;
  * canonicalizing first is what makes URL-level dedup sound). All
  * components are row-local regex/HOF expressions in the Java∩RE2
  * subset, so the same rules replay in a SQL oracle; paths stay
  * case-sensitive per RFC 3986.
  */
object UrlFunctions {

  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  private def hostport(url: Column): Column =
    regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)

  def host(url: Column): Column =
    lower(regexp_extract(hostport(url), "^([^:]+)", 1))

  /** Port as a string, "" when absent. */
  def port(url: Column): Column =
    regexp_extract(hostport(url), ":([0-9]+)$", 1)

  /** Path with trailing slashes trimmed ("" for a bare authority). */
  def canonPath(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")

  /** Query string with utm_* params dropped, other params kept in
    * order; "" when absent or when only utm params remain. */
  def canonQuery(url: Column): Column =
    array_join(
      filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
        p => !p.startsWith("utm_") && p =!= ""), "&")

  /** Registered domain: the last two labels of the host. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)

  /** Number of non-empty path segments after canonicalization. */
  def pathDepth(url: Column): Column =
    size(filter(split(canonPath(url), "/"), s => s =!= ""))

  /** The canonical URL: lowercased scheme+host, default port stripped
    * (443 for https, 80 for http; other ports kept), fragment dropped,
    * utm_* params dropped, trailing slashes trimmed. */
  def canonicalize(url: Column): Column = {
    val sc = scheme(url)
    val p = port(url)
    val q = canonQuery(url)
    val defaultPort = (sc === "https" && p === "443") ||
      (sc === "http" && p === "80")
    concat(sc, lit("://"), host(url),
      when(p === "" || defaultPort, lit("")).otherwise(concat(lit(":"), p)),
      canonPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
