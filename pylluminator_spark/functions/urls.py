"""URL parsing / normalization expressions for web-crawl pipelines.

Beyond-reference operators (driver north star): a crawl-derived corpus is
keyed by URL — URL canonicalization, host/registered-domain extraction, and
domain-level policy (blocklists, per-domain caps in
:mod:`..operators.cleanup`) are the first stages of every web pipeline.

Everything here is a pure column-expression chain (whole-stage codegen).
Spark ships a JVM ``parse_url``, but these use RE2-compatible regexps so the
IDENTICAL pattern strings run in the DuckDB oracle — the same dual-engine
constraint as ``text.PII_PATTERNS``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe component patterns (no lookaround). Group 1 is the extraction.
URL_SCHEME_PATTERN = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
URL_HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*@)?([^/?#:]+)"
URL_PORT_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+)"
URL_PATH_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"
URL_QUERY_PATTERN = r"\?([^#]*)"
URL_FRAGMENT_PATTERN = r"#(.*)$"

# tracking parameters stripped by normalize_url_expr (public convention:
# UTM campaign tags + the big ad-click identifiers)
TRACKING_PARAM_PATTERN = r"(utm_[A-Za-z]+|fbclid|gclid|msclkid|ref_src)=[^&#]*"

# Multi-label public suffixes the naive registered-domain rule must special-
# case (a small, explicit subset of the public-suffix list; swap in the full
# PSL for production — the expression shape is the point).
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.nz",
)


def url_scheme_expr(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, URL_SCHEME_PATTERN, 1))


def url_host_expr(url: Column) -> Column:
    """Lowercased host (userinfo and port excluded)."""
    return F.lower(F.regexp_extract(url, URL_HOST_PATTERN, 2))


def url_port_expr(url: Column) -> Column:
    """Explicit port, or NULL when absent (empty extract -> NULL)."""
    p = F.regexp_extract(url, URL_PORT_PATTERN, 1)
    return F.when(p == "", F.lit(None).cast("int")).otherwise(p.cast("int"))


def url_path_expr(url: Column) -> Column:
    """Path component; '/' when the URL has an authority but no path."""
    p = F.regexp_extract(url, URL_PATH_PATTERN, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_expr(url: Column) -> Column:
    return F.regexp_extract(url, URL_QUERY_PATTERN, 1)


def registered_domain_expr(host: Column) -> Column:
    """Naive eTLD+1: last two labels, or last three when the host ends in a
    known multi-label public suffix (co.uk, com.au, ...). Pure array slice —
    no Python, no join."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    is_multi = F.lit(False)
    for suf in MULTI_LABEL_SUFFIXES:
        is_multi = is_multi | (last2 == suf)
    return F.when(is_multi & (n >= 3), last3).otherwise(last2)


def url_domain_expr(url: Column) -> Column:
    """Registered domain straight from a URL string."""
    return registered_domain_expr(url_host_expr(url))


def normalize_url_expr(url: Column) -> Column:
    """Canonical URL for dedup keys: lowercase scheme+host, drop the
    fragment, strip tracking parameters (utm_*/fbclid/gclid/...), drop a
    dangling '?'/'&', drop the default :80/:443 port, and trim a trailing
    slash from non-root paths. regexp_replace chain, codegen end to end."""
    scheme = url_scheme_expr(url)
    rest = F.regexp_replace(url, URL_SCHEME_PATTERN, "")
    host_raw = F.regexp_extract(url, URL_HOST_PATTERN, 2)
    # lowercase ONLY scheme+host (path/query are case-sensitive): rebuild
    out = F.concat(scheme, F.lit("://"),
                   F.replace(rest, host_raw, F.lower(host_raw)))
    out = F.regexp_replace(out, URL_FRAGMENT_PATTERN, "")
    out = F.regexp_replace(out, TRACKING_PARAM_PATTERN, "")
    # context-preserving cleanup of separators left by the strips: a '?&&...'
    # run collapses to '?', a mid-query '&&...' run to '&' (replacing either
    # with '?' would inject a second '?' after a mid-query strip)
    out = F.regexp_replace(out, r"\?&+", "?")
    out = F.regexp_replace(out, r"&{2,}", "&")
    out = F.regexp_replace(out, r"[?&]+$", "")
    out = F.regexp_replace(out, r"(://[^/?#:]+):(80|443)([/?#]|$)", r"$1$3")
    out = F.regexp_replace(out, r"(://[^/?#]+/[^?#]*[^/?#])/+(\?|$)", r"$1$2")
    return out
