"""From-spec differentials for the web-corpus family (functions/web.py,
operators/web.py).

The q_url_canonical / q_domain_stats / q_html_extract oracles re-derive
the same regex arithmetic the engine compiles (mirrored-formula class),
so these tests pin the behavior to INDEPENDENT ground truth instead:

- URL canonicalization vs a model built on stdlib ``urllib.parse``
  (which implements RFC 3986 splitting/lowercasing/userinfo/port rules
  without any of the engine's regex text);
- registered domain vs hand-written PSL-algorithm answers;
- HTML extraction vs a model built on stdlib ``html.parser`` (a real
  tokenizer: CDATA script/style handling, entity decoding, tag
  case-folding — none of the engine's regexes);
- canonicalization idempotence (canonical output re-canonicalizes to
  itself), the property URL-dedup keys depend on.

Corpus inputs stay inside the documented contract subset (no IDN, no
percent-encoding games, no leading-zero ports, no '>' inside attribute
values, entities limited to the core named set).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from ironbeam_spark.functions.web import (
    MULTI_LABEL_SUFFIXES,
    canonicalize_url,
    html_to_text,
    registered_domain,
)

# ---------------------------------------------------------------------------
# from-spec URL model (urllib.parse; no engine regex text)

_TRACKING_NAMES = {"gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref"}


def _model_canonical(url: str) -> str | None:
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    if not parts.scheme or "://" not in url:
        return None
    host = parts.hostname or ""
    if host.endswith("."):
        host = host[:-1]
    if not host:
        return None
    scheme = parts.scheme.lower()
    try:
        port = parts.port
    except ValueError:
        port = None
    port_part = ""
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        port_part = f":{port}"
    path = parts.path
    while "//" in path:
        path = path.replace("//", "/")
    if path == "":
        path = "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]

    def is_tracking(p: str) -> bool:
        name = p.split("=", 1)[0]
        return name.startswith("utm_") or name in _TRACKING_NAMES

    params = sorted(p for p in parts.query.split("&") if p and not is_tracking(p))
    qs_part = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{port_part}{path}{qs_part}"


_URL_CORPUS = [
    "HTTPS://WWW.Example.COM:443/a/b?utm_source=x&z=9&a=1#frag",
    "https://user:pw@Secure.Example.org:8443//deep//path///x/?fbclid=1&b=2&a=3",
    "http://plain.example.net:80/",
    "http://plain.example.net:8080/",
    "Http://MIXED.Case.Host/UPPER/Case/Path",
    "http://trailing.dot.example.com./p/",
    "http://a@b@weird.example.com/x",          # userinfo runs to the LAST @
    "ftp://files.example.com/pub/file.txt",    # non-http scheme: port rules don't fire
    "https://example.co.uk?ref=hn&ref",        # all params tracking -> no '?'
    "https://example.com",                     # empty path -> '/'
    "https://example.com/?",                   # empty query -> no '?'
    "http://example.com/a?z=1&y=2&x=3&utm_campaign=spring&utm_",
    "http://example.com/a?a=2&a=1&a=10",       # duplicates kept, bytewise sort
    "http://192.168.0.1:8080/admin?token=1",
    "http://example.com/a%20b?q=x%26y",        # percent forms pass through verbatim
    "http://example.com/semi;colon/path",
    "http://single",
    "not a url at all",
    "mailto:someone@example.com",              # no '://' -> NULL
    "//protocol.relative/path",                # no scheme -> NULL
    "http://refresher.example.com/x?refresh=1&reff=2",  # near-miss names survive
    "https://example.com:8443/x?utm_source",   # name-only tracking param dropped
]


def test_canonicalize_url_matches_urllib_model(spark):
    df = spark.createDataFrame([(u,) for u in _URL_CORPUS], "u string")
    got = [r.c for r in df.select(canonicalize_url("u").alias("c")).collect()]
    for u, g in zip(_URL_CORPUS, got):
        assert g == _model_canonical(u), (u, g, _model_canonical(u))


def test_canonicalize_url_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in _URL_CORPUS], "u string")
    two = df.select(
        canonicalize_url("u").alias("once")
    ).select("once", canonicalize_url("once").alias("twice"))
    for r in two.where(F.col("once").isNotNull()).collect():
        assert r.once == r.twice, (r.once, r.twice)


# ---------------------------------------------------------------------------
# registered domain vs hand-written PSL-algorithm answers

_PSL_CASES = [
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("com", None),                              # a public suffix itself
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("bbc.co.uk", "bbc.co.uk"),
    ("co.uk", None),
    ("a.b.github.io", "b.github.io"),
    ("github.io", None),
    ("someone.blogspot.com", "someone.blogspot.com"),
    ("blogspot.com", None),
    ("deep.a.b.c.example.org", "example.org"),
    ("shop.example.com.ua", "example.com.ua"),
    ("127.0.0.1", None),
    ("192.168.10.5", None),
    ("localhost", None),
    ("x.y", "x.y"),                             # unknown TLD: 1-label suffix rule
]


def test_registered_domain_matches_psl_algorithm(spark):
    # independent model: longest-matching public suffix (1-label implicit +
    # the embedded 2-label table) + one label, per publicsuffix.org
    def model(host: str) -> str | None:
        if re.fullmatch(r"[0-9.]+", host):
            return None
        labels = host.split(".")
        suffix_len = 1
        if len(labels) >= 2 and ".".join(labels[-2:]) in MULTI_LABEL_SUFFIXES:
            suffix_len = 2
        return ".".join(labels[-suffix_len - 1:]) if len(labels) > suffix_len else None

    df = spark.createDataFrame([(h,) for h, _ in _PSL_CASES], "h string")
    got = [r.d for r in df.select(registered_domain("h").alias("d")).collect()]
    for (h, want), g in zip(_PSL_CASES, got):
        assert g == want == model(h), (h, g, want, model(h))


# ---------------------------------------------------------------------------
# from-spec HTML model (html.parser; a real tokenizer, no engine regexes)

_BLOCK = {
    "p", "br", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "td", "th", "table", "blockquote", "section", "article", "header",
    "footer",
}
_DROP = {"script", "style", "noscript", "template"}


class _SpecExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self._skip += 1
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)

    def handle_comment(self, data):
        pass


def _model_html_to_text(html: str) -> str:
    p = _SpecExtractor()
    p.feed(html)
    p.close()
    # the engine's documented contract maps &nbsp; to a PLAIN space;
    # convert_charrefs yields U+00A0 — fold it to match the contract
    text = "".join(p.parts).replace("\xa0", " ")
    # shared whitespace policy (contract point 4)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{2,}", "\n", text)
    return re.sub(r"^\s+|\s+$", "", text)


_HTML_CORPUS = [
    '<html><head><title>T</title><style>p { color: red; }</style>'
    '<script>if (1 < 2) { document.write("<p>junk</p>"); }</script></head>'
    "<body><h1>Hi &amp; bye</h1><p>a  b</p></body></html>",
    "<!-- top comment --><div>one<!-- mid\nline comment -->two</div>",
    "<DIV CLASS='x'>UPPER<BR/>tags</DIV>",
    "<p>ents: &lt;tag&gt; &quot;q&quot; &#39;a&#39; &apos;b&apos; &nbsp;end</p>",
    "<p>double-encoded: &amp;lt; stays literal</p>",
    "<ul><li>one</li><li>two</li></ul><table><tr><td>c1</td><td>c2</td></tr></table>",
    "<noscript><p>no js</p></noscript><template><b>tpl</b></template>after",
    "<span>in</span><em>line</em> tags <b>vanish</b> without breaks",
    "<script>\nmultiline();\n<div>fake</div>\n</script>real",
    "<blockquote>quoted\ntext</blockquote><section>s1</section>",
    "plain text, no markup at all",
    "<p>   leading and trailing   </p>",
    "<h2>Header</h2><article>body text</article><footer>foot</footer>",
    "<style type='text/css'>.a > .b { margin: 0; }</style>visible",
]


def test_html_to_text_matches_html_parser_model(spark):
    df = spark.createDataFrame([(h,) for h in _HTML_CORPUS], "x string")
    got = [r.t for r in df.select(html_to_text("x").alias("t")).collect()]
    for h, g in zip(_HTML_CORPUS, got):
        assert g == _model_html_to_text(h), (h, g, _model_html_to_text(h))


def test_html_to_text_on_real_corpus_matches_model(spark):
    """End-to-end on the q_html_extract wrapping of the real documents
    table (sf0.001): engine chain == stdlib-parser model, byte-exact."""
    from ironbeam_spark.suite.web import _synth_html

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", _synth_html().alias("html"))
        .orderBy("doc_id")
        .limit(200)
    )
    rows = docs.select("doc_id", "html", html_to_text("html").alias("t")).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.t == _model_html_to_text(r.html), (r.doc_id, r.t[:120])


# ---------------------------------------------------------------------------
# operator-level checks

def test_blocklist_filter_is_broadcast_anti_join(spark):
    from ironbeam_spark.operators.web import blocklist_filter, with_registered_domain

    df = spark.createDataFrame(
        [(1, "https://ads.tracker.net/x"), (2, "https://ok.example.com/y"),
         (3, "http://192.168.0.1/z")],
        "id int, url string",
    )
    base = with_registered_domain(df, "url")
    kept = blocklist_filter(base, "registered_domain", ["tracker.net"])
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan
    ids = sorted(r.id for r in kept.collect())
    assert ids == [2]  # blocked domain AND unvettable NULL-domain row drop
    kept_null = blocklist_filter(
        base, "registered_domain", ["tracker.net"], keep_null_domain=True
    )
    assert sorted(r.id for r in kept_null.collect()) == [2, 3]


def test_domain_stats_counts(spark):
    from ironbeam_spark.operators.web import domain_stats

    df = spark.createDataFrame(
        [(1, "https://a.example.com/1"), (2, "https://b.example.com/2"),
         (3, "https://a.example.com/3"), (4, "https://only.other.org/4"),
         (5, "not a url")],
        "id int, url string",
    )
    rows = {r.registered_domain: r for r in domain_stats(df, "url").collect()}
    assert rows["example.com"].n_docs == 3 and rows["example.com"].n_hosts == 2
    assert rows["other.org"].n_docs == 1 and rows["other.org"].n_hosts == 1
    assert set(rows) == {"example.com", "other.org"}  # unparseable row excluded


# ---------------------------------------------------------------------------
# link extraction + domain gating (round-11 wave 2)

def test_extract_links_matches_html_parser_model(spark):
    """href collection vs a stdlib html.parser model (no engine regexes)."""
    from ironbeam_spark.functions.web import extract_links

    class _Links(HTMLParser):
        def __init__(self):
            super().__init__()
            self.hrefs: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                for k, v in attrs:
                    if k == "href" and v is not None:
                        self.hrefs.append(v)

    corpus = [
        '<a href="http://a.com/x">one</a> text <A HREF="https://b.org/y?z=1">two</A>',
        '<div><a class="c" href="/relative/path">rel</a><a href="">empty</a></div>',
        '<a name="anchor-no-href">none</a><p>no links here</p>',
        '<a href="http://x.com/1"><img src="i.png"/></a><a href="http://x.com/1">dup kept</a>',
        "plain text",
    ]
    df = spark.createDataFrame([(h,) for h in corpus], "x string")
    got = [r.l for r in df.select(extract_links("x").alias("l")).collect()]
    for h, g in zip(corpus, got):
        p = _Links()
        p.feed(h)
        p.close()
        assert list(g) == p.hrefs, (h, list(g), p.hrefs)


def test_domain_filter_exact_threshold_semantics(spark):
    """The rational mean compare keeps a domain at EXACTLY the threshold
    (>=) and drops one epsilon-below — plus the broadcast semi join-back
    plan shape."""
    from ironbeam_spark.operators.web import domain_filter

    rows = [
        # keep.com: mean stat = (59 + 61) / 2 = 60.0 -> kept at >= 60
        (1, "http://a.keep.com/", 59), (2, "http://b.keep.com/", 61),
        # drop.org: mean = (59 + 60) / 2 = 59.5 -> dropped
        (3, "http://a.drop.org/", 59), (4, "http://b.drop.org/", 60),
        (5, "not a url", 1000),  # no domain -> dropped regardless of stat
    ]
    df = spark.createDataFrame(rows, "id int, url string, stat int")
    kept = domain_filter(df, "url", "stat", min_mean=60.0)
    assert sorted(r.id for r in kept.collect()) == [1, 2]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan


def test_registered_domain_join_variant_matches_expression_form(spark):
    """The broadcast-suffix-join scale path (full-PSL form) is
    semantically interchangeable with the embedded-literal expression
    form, and its plan is a single broadcast join (no corpus shuffle)."""
    from ironbeam_spark.operators.web import registered_domain_via_join

    hosts = [h for h, _ in _PSL_CASES] + [
        "a.very.deep.sub.domain.example.co.uk",
        "example.net.ua",
        "only.net.ua",
        "",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    via_join = registered_domain_via_join(df, "h", out_col="d_join")
    both = via_join.withColumn("d_expr", registered_domain("h"))
    plan = via_join._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    for r in both.collect():
        assert r.d_join == r.d_expr, (r.h, r.d_join, r.d_expr)


def test_registered_domain_join_full_psl_rules(spark):
    """Full publicsuffix.org semantics: 3-label normal rules, wildcard
    rules (``*`` consumes one label), exception rules (prevail over all,
    public suffix = rule minus leftmost label), longest-match, and the
    implicit default rule.  Every expected value below is HAND-DERIVED
    from the published algorithm (publicsuffix.org/list/) — the test
    shares no code with the implementation.  Rules are real PSL entries."""
    from ironbeam_spark.operators.web import registered_domain_via_join

    rules = [
        "co.uk",
        "*.ck",
        "!www.ck",
        "pref.hokkaido.jp",
        "*.kawasaki.jp",
        "!city.kawasaki.jp",
    ]
    cases = [
        # default rule '*': bare TLD is the public suffix
        ("example.com", "example.com"),
        ("deep.sub.example.com", "example.com"),
        # 2-label normal rule
        ("www.example.co.uk", "example.co.uk"),
        ("co.uk", None),                      # host IS the suffix
        # wildcard *.ck: every <label>.ck is a public suffix
        ("shop.ck", None),                    # host IS a (wildcard) suffix
        ("www.shop.ck", "www.shop.ck"),
        ("a.b.shop.ck", "b.shop.ck"),
        ("ck", None),                         # default rule, single label
        # exception !www.ck: prevails over *.ck; ps = 'ck'
        ("www.ck", "www.ck"),
        ("sub.www.ck", "www.ck"),
        # 3-label normal rule
        ("foo.pref.hokkaido.jp", "foo.pref.hokkaido.jp"),
        ("bar.foo.pref.hokkaido.jp", "foo.pref.hokkaido.jp"),
        ("pref.hokkaido.jp", None),           # host IS the suffix
        ("hokkaido.jp", "hokkaido.jp"),       # only the default rule matches
        # wildcard *.kawasaki.jp (3-label suffixes)
        ("foo.kawasaki.jp", None),
        ("x.foo.kawasaki.jp", "x.foo.kawasaki.jp"),
        ("y.x.foo.kawasaki.jp", "x.foo.kawasaki.jp"),
        ("kawasaki.jp", "kawasaki.jp"),       # wildcard needs one more label
        # exception !city.kawasaki.jp: ps = 'kawasaki.jp'
        ("city.kawasaki.jp", "city.kawasaki.jp"),
        ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
        # IP / single label
        ("192.168.0.1", None),
        ("localhost", None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    out = registered_domain_via_join(df, "h", suffixes=rules, out_col="d")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    got = {r.h: r.d for r in out.collect()}
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_registered_domain_join_dedups_suffix_table(spark):
    """A duplicate row in a DataFrame suffix table must not duplicate
    matching corpus rows through the left join."""
    from ironbeam_spark.operators.web import registered_domain_via_join

    dupes = spark.createDataFrame([("co.uk",), ("co.uk",)], "s string")
    df = spark.createDataFrame([("news.bbc.co.uk",), ("x.example.com",)], "h string")
    out = registered_domain_via_join(df, "h", suffixes=dupes).collect()
    assert len(out) == 2
    assert {r.registered_domain for r in out} == {"bbc.co.uk", "example.com"}


def test_crawl_schedule_matches_loop_model(spark):
    """From-spec differential: the window-algebra unrolling must equal
    the SEQUENTIAL recurrence s_0 = ts_0; s_i = max(ts_i, s_{i-1}+d) —
    evaluated here as a literal Python loop that shares no algebra with
    the implementation (the loop never computes ts_j - r_j*d)."""
    import random

    from ironbeam_spark.operators.web import crawl_schedule

    rng = random.Random(0xC5)
    rows = []
    for i in range(400):
        rows.append((i, f"d{rng.randrange(6)}", rng.randrange(0, 5000)))
    delay = 700

    # loop model
    expected: dict[int, int] = {}
    by_key: dict[str, list[tuple[int, int]]] = {}
    for i, k, ts in rows:
        by_key.setdefault(k, []).append((ts, i))
    for k, reqs in by_key.items():
        prev = None
        for ts, i in sorted(reqs):
            s = ts if prev is None else max(ts, prev + delay)
            expected[i] = s
            prev = s

    df = spark.createDataFrame(rows, "id long, k string, ts long")
    out = crawl_schedule(df, "k", "ts", delay, tiebreak_col="id").collect()
    assert len(out) == len(rows)
    for r in out:
        assert r.scheduled_ts == expected[r.id], (r.id, r.scheduled_ts, expected[r.id])
        assert r.scheduled_ts >= r.ts  # never schedule before arrival


def test_crawl_schedule_single_exchange(spark):
    """Both window passes share ONE hash exchange + sort on the key."""
    from ironbeam_spark.operators.web import crawl_schedule

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("k"),
        (F.col("id") * 37 % 1000).alias("ts"),
    )
    plan = (
        crawl_schedule(df, "k", "ts", 10, tiebreak_col="id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
