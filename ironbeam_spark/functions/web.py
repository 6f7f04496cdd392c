"""Web-corpus column expressions: URL canonicalization, registered-domain
extraction, and HTML text extraction (north-star web-pipeline text
cleaning — no reference counterpart; the Common-Crawl-style front half of
a pretraining pipeline: C4/RefinedWeb normalize URLs for dedup + domain
filtering and strip HTML before every downstream text operator).

Everything here is a pure column expression over built-in
``pyspark.sql.functions`` — whole-stage-codegen JVM work, zero Python
UDFs, so at 100 TB these run inside the scan stage at full width.  Every
regex is written in the RE2-compatible subset (no backreferences, no
lookaround) so the DuckDB oracles can share the exact pattern text.

Canonicalization rule set (documented contract, applied in this order):

1. scheme and host lowercased; a single trailing dot on the host dropped;
   userinfo (``user:pw@``) stripped.
2. default ports dropped (``:80`` for http, ``:443`` for https); other
   explicit ports kept.
3. path: runs of ``/`` collapsed to one, trailing slash dropped (except
   the root path), empty path becomes ``/``.
4. query: parameters split on ``&``; empty params and tracking params
   (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``mc_eid``,
   ``igshid``, ``ref``) dropped; survivors sorted bytewise and rejoined
   (param order never carries meaning for dedup purposes).
5. fragment dropped.
6. non-absolute-URL input (no scheme or no host) canonicalizes to NULL.

Out of scope (documented): IDN/punycode folding, percent-encoding
normalization, and leading-zero port forms — each would need the same
treatment on both engine and oracle and none appears in web-dedup rule
sets we model (C4 §2.1 dedups on exact normalized URL).

``registered_domain`` implements the Public Suffix List algorithm
(publicsuffix.org: longest matching public suffix wins; the registered
domain is the suffix plus one preceding label) over an embedded curated
subset of the PSL: every 1-label TLD is treated as a public suffix, plus
the ``MULTI_LABEL_SUFFIXES`` table of common 2-label suffixes
(``co.uk``, ``com.au``, ``github.io``, ...).  The full 9k-entry PSL
drops in two ways at production scale: extend the literal array (an
array literal is a broadcast-free per-row probe), or join hosts against
a suffix DataFrame with ``F.broadcast`` — both stay shuffle-free.
IP-literal hosts and bare single-label hosts have no registered domain
(NULL), matching the PSL algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ironbeam_spark.plancache import memo_expr

__all__ = [
    "TRACKING_PARAM_RE",
    "MULTI_LABEL_SUFFIXES",
    "URL_PARSE_RE",
    "HREF_RE",
    "parse_url",
    "canonicalize_url",
    "url_host",
    "url_path",
    "registered_domain",
    "html_to_text",
    "extract_links",
]

# double-quoted href attribute inside an <a> tag (RE2-safe; the documented
# subset: hrefs are double-quoted, no '>' inside attribute values)
HREF_RE = r'(?i)<a\b[^>]*href="([^"]*)"'

# RFC 3986-ish absolute-URL splitter (RE2-safe: no lookaround/backrefs).
# groups: 1=scheme 2=authority 3=path 4=query 5=fragment
URL_PARSE_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# dropped during canonicalization (matched against the full `name=value`
# token, so `ref=x` and bare `ref` both go; `refresh=1` survives)
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|igshid|ref)(=.*)?$"

# Curated 2-label public suffixes (subset of publicsuffix.org — country
# second-level registries + major PaaS/user-content domains).  Sorted so
# the literal is deterministic on both engines.
MULTI_LABEL_SUFFIXES = tuple(
    sorted(
        [
            "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
            "ltd.uk", "plc.uk", "sch.uk",
            "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
            "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
            "co.kr", "or.kr", "ne.kr", "go.kr",
            "com.br", "net.br", "org.br", "gov.br",
            "com.cn", "net.cn", "org.cn", "gov.cn",
            "com.mx", "org.mx", "net.mx",
            "co.in", "net.in", "org.in",
            "co.nz", "net.nz", "org.nz",
            "com.sg", "net.sg", "org.sg",
            "com.tr", "net.tr", "org.tr",
            "com.tw", "net.tw", "org.tw",
            "com.hk", "net.hk", "org.hk",
            "co.za", "net.za", "org.za",
            "com.ar", "net.ar", "org.ar",
            "co.il", "net.il", "org.il",
            "com.ua", "net.ua",
            "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
            "appspot.com", "netlify.app", "vercel.app", "pages.dev",
            "web.app", "firebaseapp.com", "azurewebsites.net",
            "cloudfront.net",
        ]
    )
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


@memo_expr
def parse_url(url: Column | str) -> Column:
    """Split an absolute URL into a struct
    ``(scheme, host, port, path, query, fragment)``.

    scheme/host are lowercased, userinfo is stripped, a single trailing
    dot on the host is dropped; port/path/query/fragment are returned
    verbatim ('' when absent).  Non-matching input yields a struct of
    empty strings (callers NULL it out — see :func:`canonicalize_url`).
    """
    u = _col(url)
    authority = F.regexp_extract(u, URL_PARSE_RE, 2)
    # greedy: userinfo runs to the LAST '@' in the authority (RFC 3986)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host = F.lower(F.regexp_replace(hostport, r":[0-9]*$", ""))
    host = F.regexp_replace(host, r"\.$", "")
    return F.struct(
        F.lower(F.regexp_extract(u, URL_PARSE_RE, 1)).alias("scheme"),
        host.alias("host"),
        F.regexp_extract(hostport, r":([0-9]+)$", 1).alias("port"),
        F.regexp_extract(u, URL_PARSE_RE, 3).alias("path"),
        F.regexp_extract(u, URL_PARSE_RE, 4).alias("query"),
        F.regexp_extract(u, URL_PARSE_RE, 5).alias("fragment"),
    )


def _canonical_path(raw_path: Column) -> Column:
    """Canonicalization rule 3: collapse ``/`` runs, empty → ``/``, strip
    the trailing slash except on the root path."""
    path = F.regexp_replace(raw_path, r"/{2,}", "/")
    path = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    return F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.regexp_replace(path, r"/$", ""),
    ).otherwise(path)


@memo_expr
def url_path(url: Column | str) -> Column:
    """Canonical path of an absolute URL (``/`` when empty; NULL when the
    URL is not parseable) — the robots.txt matching input."""
    p = parse_url(url)
    return F.when(
        (p["scheme"] != F.lit("")) & (p["host"] != F.lit("")),
        _canonical_path(p["path"]),
    )


@memo_expr
def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL string per the module-docstring rule set (NULL for
    input that is not an absolute ``scheme://host...`` URL)."""
    p = parse_url(url)
    scheme, host, port = p["scheme"], p["host"], p["port"]

    default_port = (
        (scheme == F.lit("http")) & (port == F.lit("80"))
    ) | ((scheme == F.lit("https")) & (port == F.lit("443")))
    port_part = F.when(
        (port != F.lit("")) & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    path = _canonical_path(p["path"])

    params = F.filter(
        F.split(p["query"], "&"),
        lambda q: (q != F.lit("")) & ~q.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.sort_array(params), "&")
    qs_part = F.when(qs != F.lit(""), F.concat(F.lit("?"), qs)).otherwise(F.lit(""))

    out = F.concat(scheme, F.lit("://"), host, port_part, path, qs_part)
    return F.when((scheme != F.lit("")) & (host != F.lit("")), out)


@memo_expr
def url_host(url: Column | str) -> Column:
    """Canonical host of an absolute URL (NULL when not parseable)."""
    host = parse_url(url)["host"]
    return F.when(host != F.lit(""), host)


@memo_expr
def registered_domain(host: Column | str) -> Column:
    """PSL registered domain (a.k.a. eTLD+1) of a canonical host.

    Longest-matching public suffix + one label; NULL when the host IS a
    public suffix, is a single label, or is an IPv4 literal.  Expects a
    canonical host (lowercase, no trailing dot) — compose after
    :func:`url_host`.
    """
    h = _col(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_ip = h.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    multi = F.array_contains(
        F.lit(list(MULTI_LABEL_SUFFIXES)).cast("array<string>"), last2
    )
    return (
        F.when(h.isNull() | is_ip | (n < 2), F.lit(None).cast("string"))
        .when(multi & (n >= 3), last3)
        .when(multi, F.lit(None).cast("string"))
        .otherwise(last2)
    )


@memo_expr
def extract_links(html: Column | str) -> Column:
    """All href values of ``<a>`` tags in an HTML fragment, in document
    order (``array<string>``, possibly empty — the raw hrefs; compose
    with :func:`canonicalize_url` / :func:`registered_domain` after
    ``explode`` for web-graph construction).  Same documented subset as
    :func:`html_to_text`: double-quoted attributes, no ``>`` inside
    attribute values."""
    return F.regexp_extract_all(_col(html), F.lit(HREF_RE), 1)


# ---------------------------------------------------------------------------
# HTML text extraction


#: block-level tags whose open/close boundaries become newlines
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|br|div|li|ul|ol|h[1-6]|tr|td|th|table|blockquote"
    r"|section|article|header|footer)\b[^>]*>"
)
#: container elements removed with their content (non-greedy, RE2-safe)
_DROP_ELEMENTS = ("script", "style", "noscript", "template")


@memo_expr
def html_to_text(html: Column | str) -> Column:
    """Extract readable text from an HTML fragment (C4-style cleaning).

    Documented extraction contract (shared verbatim with the DuckDB
    oracle, modeled from-spec against ``html.parser`` in
    tests/test_web_models.py):

    1. comments removed; ``<script>/<style>/<noscript>/<template>``
       elements removed WITH their content (so markup inside script
       strings never leaks into text);
    2. block-level tag boundaries become newlines, all remaining tags
       are stripped;
    3. core named entities decoded (``&lt; &gt; &quot; &#39; &apos;
       &nbsp;`` then ``&amp;`` LAST — single-pass semantics: ``&amp;lt;``
       decodes to the literal text ``&lt;``);
    4. whitespace normalized: space runs collapsed, spaces trimmed
       around newlines, blank lines collapsed, ends trimmed.

    Limitations (documented, enforced nowhere): attribute values
    containing a literal ``>`` and entities outside the core set pass
    through the regex extractor differently than a spec parser would;
    the from-spec differential runs on inputs inside this subset.
    """
    x = _col(html)
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", "")
    for tag in _DROP_ELEMENTS:
        x = F.regexp_replace(x, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", "")
    x = F.regexp_replace(x, _BLOCK_TAG_RE, "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", "")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # LAST — see contract point 3
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, r"[ \t]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{2,}", "\n")
    return F.regexp_replace(x, r"^\s+|\s+$", "")
