"""URL normalization + host/domain extraction — pure built-in column
expressions (zero UDFs, whole-stage-codegen throughout).

Web-corpus pipelines key on URLs constantly: crawl dedup (same page
fetched via casing/port/tracking-param variants), host-level quality
priors (Gopher/RefinedWeb filter by domain), per-site caps
(split_domain_cap), and robots/blocklist joins. All of those need one
canonical form first. The rules here are the public RFC 3986 §6
syntax-based normalization plus the conventional crawl extensions:

* lowercase scheme and host;
* drop the fragment;
* drop default ports (``http:80``, ``https:443``);
* empty path becomes ``/``;
* strip tracking parameters (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``ref``) and SORT the remaining query pairs —
  parameter order is not semantic, and sorting makes equal resources
  compare equal;
* drop the ``?`` entirely when nothing survives.

``registrable_domain`` approximates eTLD+1 with the multi-label
suffixes that dominate crawl data (``co.uk``-style); a production run
swaps in the full public-suffix list as a broadcast join — the
operator shape does not change.

Everything is a Column-in/Column-out expression, so Catalyst folds it
into scans and joins; normalizing 1e11 URLs is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKING = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)$"

# second-level public suffixes common in crawl data (approximation of
# the PSL; swap for the full list via broadcast join at production).
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)


def url_host(url: Column) -> Column:
    """Lowercased host, ports and userinfo stripped."""
    auth = _authority(url)
    no_user = F.regexp_replace(auth, r"^.*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d*$", ""))


def _port(url: Column) -> Column:
    return F.regexp_extract(_authority(url), r":(\d+)$", 1)


def _path(url: Column) -> Column:
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def _query_sorted(url: Column) -> Column:
    """Query string with tracking params removed and pairs sorted;
    empty string when nothing survives."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    pairs = F.filter(
        F.split(q, "&"),
        lambda kv: (kv != "")
        & ~F.regexp_extract(F.lower(kv), r"^([^=]*)", 1).rlike(_TRACKING),
    )
    return F.array_join(F.array_sort(pairs), "&")


def url_normalize(url: Column) -> Column:
    """RFC 3986 syntax normalization + crawl conventions; see module
    docstring. NULL-safe: non-URL strings normalize to NULL (no
    scheme/host)."""
    scheme, host, port, path = (
        _scheme(url), url_host(url), _port(url), _path(url)
    )
    default = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    q = _query_sorted(url)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    out = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when((scheme == "") | (host == ""), F.lit(None)).otherwise(out)


def registrable_domain(url: Column) -> Column:
    """eTLD+1 approximation: one label above the public suffix, with
    the common two-label suffixes special-cased."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    is_two_label_suffix = last2.isin(*_SECOND_LEVEL_SUFFIXES)
    take = F.when(is_two_label_suffix & (n >= 3), 3).otherwise(2)
    start = F.greatest(n - take + 1, F.lit(1))
    return F.when(n < 2, host).otherwise(
        F.array_join(F.slice(labels, start, take), ".")
    )
