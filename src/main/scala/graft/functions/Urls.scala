package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/host canonicalization — the standard C4/CCNet pre-filter that
  * precedes content dedup: two pages that differ only in scheme case,
  * host case, a `www.` prefix, an explicit default port, a trailing
  * slash, tracking query parameters, query-parameter order, or a
  * fragment are the SAME page, and a crawl-scale corpus dedups on the
  * canonical form before any shingling runs.
  *
  * Everything here is pure column expressions (regexp_extract /
  * regexp_replace / array HOFs — all codegen'd, no UDFs), so the
  * canonicalization runs map-side inside the scan's whole-stage codegen
  * and the only shuffle a URL-dedup pays is the final group on the
  * canonical key.
  */
object Urls {

  /** Lowercased scheme of `u` ('' if `u` has no `scheme://` prefix). */
  def scheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical host: lowercased, `www.` prefix dropped, port excluded. */
  def host(u: Column): Column =
    regexp_replace(
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)),
      "^www\\.", "")

  /** Canonical form of URL column `u`:
    *
    *  - fragment dropped (never sent to the server);
    *  - scheme and host lowercased, `www.` prefix dropped;
    *  - explicit default port dropped (`:80` for http, `:443` for
    *    https); any other port kept;
    *  - trailing slashes trimmed from a non-root path;
    *  - tracking query parameters dropped (`utm_*`, `ref`, `fbclid`,
    *    `gclid` — the standard analytics noise), survivors SORTED by
    *    full `k=v` text so parameter order cannot split a group;
    *  - empty query string dropped entirely;
    *  - an EMPTY path becomes `/` (RFC 3986 §6.2.3: `http://ex.com` and
    *    `http://ex.com/` are the same resource, so the root page with
    *    and without the slash groups together).
    *
    * Returns `u` unchanged when it has no `scheme://` prefix, or when
    * the authority carries userinfo (`user@host`) or a bracketed IPv6
    * literal (`[2001:db8::1]`) — the host/port regexes below split on
    * `:` and would silently truncate either form, falsely merging
    * distinct pages (not a URL shape this canonicalizer understands —
    * never silently mangle).
    */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val sch = scheme(noFrag)
    val hostPort = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portNorm = when(port === "", lit(""))
      .when(sch === "http" && port === "80", lit(""))
      .when(sch === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // strip trailing slashes FIRST, then map any empty result to '/':
    // '', '/', and '//' (an all-slash path strips to '') are all the
    // root resource (RFC 3986 §6.2.3) and must land in ONE dedup group —
    // normalizing before stripping split 'http://ex.com//' from the
    // other two.
    val stripped = regexp_replace(path0, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val query = regexp_extract(noFrag, "\\?([^#]*)$", 1)
    val kept = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("ref=") ||
        p.startsWith("fbclid=") || p.startsWith("gclid=") || (p === "")))
    val queryNorm = when(size(kept) > 0,
      concat(lit("?"), array_join(array_sort(kept), "&"))).otherwise(lit(""))
    // userinfo / bracketed IPv6 authorities take the documented
    // pass-through fallback (see scaladoc): the ':'-splitting host/port
    // regexes would truncate them into false merges otherwise.
    when(sch === "" || hostPort.contains("@") || hostPort.contains("["), u)
      .otherwise(concat(sch, lit("://"), host(noFrag), portNorm, path, queryNorm))
  }
}
