"""Property-based fuzz differentials for the web family (hypothesis):
randomly assembled URLs vs the stdlib ``urllib.parse`` canonicalization
model, and randomly assembled robots.txt texts vs the loop-based RFC
9309 model — both models live in the corpus test files and share none of
the engine's regex/window machinery.  Inputs stay inside the documented
contract subset (ports ≤ 65535, no IDN, no '#' inside rule paths)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ironbeam_spark.functions.web import canonicalize_url
from ironbeam_spark.operators.robots import robots_filter
from tests.test_robots import _model_allowed
from tests.test_web_models import _model_canonical

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_label = st.text(alphabet="abcdefgxyz0123456789-", min_size=1, max_size=6)
_seg = st.text(alphabet="abcXYZ019._~-!", min_size=0, max_size=5)

_scheme = st.sampled_from(["http", "https", "HTTP", "Https", "ftp", "wss"])
_userinfo = st.sampled_from(["", "user:pw@", "a@", "a@b@"])
_host = st.one_of(
    st.lists(_label, min_size=1, max_size=4).map(".".join),
    st.sampled_from(["10.0.0.1", "WWW.Example.COM", "a.b.", "x_y.example.org"]),
)
_port = st.sampled_from(["", ":", ":80", ":443", ":8080", ":1", ":65535"])
_path = st.lists(
    st.tuples(st.sampled_from(["/", "//", "///"]), _seg), min_size=0, max_size=4
).map(lambda parts: "".join(a + b for a, b in parts))
_param = st.one_of(
    st.sampled_from(
        ["a=1", "z=9", "b", "", "utm_source=x", "utm_", "ref", "reff=2",
         "gclid=g", "a=2", "x-y=3", "_q=%26"]
    ),
    st.tuples(_seg, _seg).map(lambda kv: f"{kv[0]}={kv[1]}"),
)
_query = st.one_of(
    st.just(""),
    st.lists(_param, min_size=0, max_size=5).map(lambda ps: "?" + "&".join(ps)),
)
_frag = st.sampled_from(["", "#frag", "#", "#a/b?c"])

_url = st.tuples(_scheme, _userinfo, _host, _port, _path, _query, _frag).map(
    lambda t: f"{t[0]}://{t[1]}{t[2]}{t[3]}{t[4]}{t[5]}{t[6]}"
)


@given(urls=st.lists(_url, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_fuzzed_urls_canonicalize_like_the_urllib_model(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r.c for r in df.select(canonicalize_url("u").alias("c")).collect()]
    for u, g in zip(urls, got):
        assert g == _model_canonical(u), (u, g, _model_canonical(u))


# ---------------------------------------------------------------------------
# robots.txt fuzz

_agent_name = st.sampled_from(["ironbeam", "IronBeam", "*", "other-bot", "second"])
_rule_path = st.lists(
    st.tuples(st.sampled_from(["/", "/*", ""]), st.text("abc019._-%", max_size=4)),
    min_size=1,
    max_size=3,
).flatmap(
    lambda parts: st.sampled_from(["", "$"]).map(
        lambda anchor: "".join(a + b for a, b in parts) + anchor
    )
)
_line = st.one_of(
    _agent_name.map(lambda a: f"User-agent: {a}"),
    _agent_name.map(lambda a: f"uSeR-AgEnT:   {a}"),
    _rule_path.map(lambda p: f"Allow: {p}"),
    _rule_path.map(lambda p: f"Disallow: {p}"),
    st.just("Disallow:"),
    st.just("# a comment"),
    st.just(""),
    st.just("Crawl-delay: 5"),
    st.just("junk line without colon-directive ... almost: ok"),
    _rule_path.map(lambda p: f"Allow: {p} # trailing comment"),
)
_robots_text = st.lists(_line, min_size=0, max_size=14).map("\n".join)
_eval_path = st.lists(
    st.tuples(st.just("/"), st.text("abc019._-%!", max_size=4)),
    min_size=1,
    max_size=3,
).map(lambda parts: "".join(a + b for a, b in parts))


@given(
    texts=st.lists(_robots_text, min_size=1, max_size=4),
    paths=st.lists(_eval_path, min_size=1, max_size=8),
)
@settings(**_SETTINGS)
def test_fuzzed_robots_verdicts_match_rfc9309_model(spark, texts, paths):
    domains = [f"d{i}.example" for i in range(len(texts))]
    robots = spark.createDataFrame(
        list(zip(domains, texts)), "domain string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [(d, p) for d in domains for p in paths], "domain string, path string"
    )
    got = {
        (r.domain, r.path): r.ok
        for r in robots_filter(docs, "path", robots, "ironbeam", verdict_col="ok").collect()
    }
    for d, text in zip(domains, texts):
        for p in paths:
            want = _model_allowed(text, "ironbeam", p)
            assert got[(d, p)] == want, (text, p, got[(d, p)], want)
