"""URL canonicalization and domain extraction (OP-X-URLCURATE).

The reference system never inspects URLs (its keys are storage-object
paths — ``agf_ingestion_lambda.py`` validates path shape only, cf.
functions/paths.py); this module is part of the 100 TB training-data
extension: every public web-corpus pipeline (CCNet, RefinedWeb §3.1,
Dolma) curates at the URL level before anything touches document text —
canonicalize, dedup on the canonical form, drop blocklisted registered
domains, and cap per-domain document counts so a handful of mega-sites
cannot dominate the mixture.

Everything here is a pure column expression in the engine-common
Java∩RE2 regex subset (char classes + bounded repetition, no
lookaround — the plans/pii.py rule), so the whole pass stays inside
whole-stage codegen and the catalog query over it is oracle-checked
bit-for-bit (plans/urls.py).

Canonicalization rules (each one documented because each is a choice):

* scheme and host lowercase (RFC 3986 §6.2.2.1 — case-insensitive).
* default port stripped (``:443`` under https, ``:80`` under http);
  non-default ports survive.
* one leading ``www.`` label stripped from the host (the CCNet/
  RefinedWeb URL-dedup convention); other subdomains are meaningful
  and survive.
* empty path → ``/``; a single trailing slash is stripped from
  non-root paths (``/a/`` ≡ ``/a``).
* query string: parameters are split on ``&``, tracking parameters
  (any ``utm_`` prefix by default) and empty fragments are dropped,
  and the REMAINDER IS SORTED — parameter order never distinguishes
  two URLs.  The ``#fragment`` never reaches the server and is always
  dropped.
* NO percent-decoding: decoding is not idempotent ("%2541" decodes
  twice to different strings) so a decoder can never be canonical;
  bytes are compared as sent.  (Contrast functions/events.py, which
  decodes file-URI paths for display — a one-way trip.)

The higher-order ``filter``/``array_sort`` lambdas are interpreted,
not codegen'd (CLAUDE.md rule) — acceptable here because they run on
the handful of query parameters of ONE url per row, not on
corpus-sized arrays.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default tracking-parameter prefix dropped by canonicalization.  The
#: oracle twin (plans/urls.py) derives its SQL literal AND substring
#: length from THIS constant, so the Spark default and the oracle can
#: never drift (r6 ADVICE) — a caller passing a different prefix to
#: canonical_url is exercising the production knob, not the oracle path.
TRACKING_PREFIX = "utm_"

#: engine-common parsers (Java∩RE2 subset; '' on no match in BOTH engines
#: — verified, see plans/urls.py oracle twin)
_RE_SCHEME = r"^([a-zA-Z]+)://"
_RE_HOSTPORT = r"^[a-zA-Z]+://([^/?#]+)"
_RE_PATH = r"^[a-zA-Z]+://[^/?#]+(/[^?#]*)"
_RE_QUERY = r"\?([^#]*)"
_RE_PORT = r":([0-9]+)$"
_RE_REGDOM = r"([^.]+\.[^.]+)$"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' when the value is not a scheme://... URL)."""
    return F.lower(F.regexp_extract(url, _RE_SCHEME, 1))


def url_hostport(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _RE_HOSTPORT, 1))


def url_host(url: Column, strip_www: bool = True) -> Column:
    """Lowercased host with the port and (optionally) one leading
    ``www.`` label removed."""
    h = F.regexp_extract(url_hostport(url), r"^([^:]+)", 1)
    if not strip_www:
        return h
    # substring with a huge length ≡ 2-arg substr-to-end in both engines
    return F.when(F.substring(h, 1, 4) == "www.", F.substring(h, 5, 1 << 30)).otherwise(h)


def url_port(url: Column) -> Column:
    """Explicit port as a string ('' when absent)."""
    return F.regexp_extract(url_hostport(url), _RE_PORT, 1)


def url_canonical_port(url: Column) -> Column:
    """``:port`` suffix for the canonical form — '' when absent OR when it
    is the scheme's default (https:443 / http:80)."""
    scheme, port = url_scheme(url), url_port(url)
    return (
        F.when(port == "", "")
        .when((scheme == "https") & (port == "443"), "")
        .when((scheme == "http") & (port == "80"), "")
        .otherwise(F.concat(F.lit(":"), port))
    )


def url_path(url: Column) -> Column:
    """Canonical path: '' → '/', one trailing slash stripped off non-root."""
    p = F.regexp_replace(F.regexp_extract(url, _RE_PATH, 1), "/$", "")
    return F.when(p == "", "/").otherwise(p)


def url_query_canonical(url: Column, tracking_prefix: str = TRACKING_PREFIX) -> Column:
    """Canonical query string: tracking-prefixed and empty params dropped,
    survivors sorted; '' when nothing survives."""
    raw = F.regexp_extract(url, _RE_QUERY, 1)
    n = len(tracking_prefix)
    kept = F.filter(
        F.split(raw, "&"),
        lambda x: (F.substring(x, 1, n) != tracking_prefix) & (x != ""),
    )
    return F.coalesce(F.array_join(F.array_sort(kept), "&"), F.lit(""))


def canonical_url(url: Column, tracking_prefix: str = TRACKING_PREFIX) -> Column:
    """The full canonical form (see module docstring for each rule)."""
    q = url_query_canonical(url, tracking_prefix)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_canonical_port(url),
        url_path(url),
        F.when(q == "", "").otherwise(F.concat(F.lit("?"), q)),
    )


def registered_domain(host: Column) -> Column:
    """Last two host labels — the registered domain under generic TLDs.

    A faithful implementation needs the public-suffix list (external
    data, e.g. ``co.uk``); the two-label rule is the dependency-free
    approximation and is exact for the generic-TLD hosts this engine is
    tested on.  Swap point: replace with a suffix-trie broadcast join
    when the PSL snapshot is available.
    """
    return F.regexp_extract(host, _RE_REGDOM, 1)
