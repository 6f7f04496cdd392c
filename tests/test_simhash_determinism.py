"""Belt-and-braces determinism guards for the SimHash stack.

The driver's round-2 gate reported a value-hash mismatch for
``q_simhash_fingerprints`` that neither a local exact-oracle run nor a
faithful driver-sim reproduces.  These tests pin every stage of the
fingerprint computation to an engine-independent pure-Python reference
(hashlib md5 + int arithmetic), so any engine- or conf-sensitive drift in
``F.conv`` / ``F.md5`` / higher-order functions fails loudly here rather
than silently in a remote harness.
"""

import hashlib

import pyspark.sql.functions as F
import pytest

from ironbeam_spark.functions.text import token_int, tokens
from ironbeam_spark.operators.dedup import simhash

LITERALS = [
    "hello",
    "world",
    "a",
    "0",
    "ffffffffffff",
    "the quick brown fox",
    "naïve café résumé",  # non-ASCII: md5 must hash UTF-8 bytes identically
    "x" * 500,
    "123 456 789",
    "CapsAndlower MIXED",
]


def py_token_int(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:12], 16)


def py_simhash(text: str, bits: int = 48) -> int:
    toks = [t for t in text.split(" ") if t != ""]
    hs = [py_token_int(t) for t in toks]
    n = len(hs)
    fp = 0
    for j in range(bits):
        if 2 * sum(1 for h in hs if (h >> j) & 1) > n:
            fp |= 1 << j
    return fp


# arithmetic hex parse with no conv(): fold acc*16 + digit over md5 chars
_ARITH = (
    "aggregate(filter(split(substring(md5(tok), 1, 12), ''), ch -> ch <> ''), "
    "cast(0 as long), (acc, ch) -> acc * 16L + cast(instr('0123456789abcdef', ch) - 1 as long))"
)


def test_token_int_conv_matches_pure_arithmetic_and_python(spark):
    df = spark.createDataFrame([(t,) for t in LITERALS], ["tok"])
    rows = df.select(
        "tok",
        token_int(F.col("tok")).alias("via_conv"),
        F.expr(_ARITH).alias("via_arith"),
    ).collect()
    assert len(rows) == len(LITERALS)
    for r in rows:
        expected = py_token_int(r["tok"])
        assert r["via_conv"] == expected, f"conv drift on {r['tok']!r}"
        assert r["via_arith"] == expected, f"arith drift on {r['tok']!r}"


def test_token_int_on_real_document_tokens(spark):
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    toks = docs.select(F.explode(tokens("text")).alias("tok")).distinct()
    rows = toks.select(
        "tok", token_int(F.col("tok")).alias("via_conv"), F.expr(_ARITH).alias("via_arith")
    ).collect()
    assert rows
    mismatches = [
        r["tok"]
        for r in rows
        if not (r["via_conv"] == r["via_arith"] == py_token_int(r["tok"]))
    ]
    assert mismatches == []


def test_simhash_matches_pure_python_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(LITERALS)], ["doc_id", "text"])
    rows = df.select("doc_id", "text", simhash("text", 48).alias("fp")).collect()
    for r in rows:
        assert r["fp"] == py_simhash(r["text"]), f"simhash drift on {r['text']!r}"


def test_simhash_conf_invariant(spark):
    """The fingerprint must not depend on ANSI mode or legacy size-of-null —
    the two session confs a foreign harness most plausibly sets differently."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(LITERALS)], ["doc_id", "text"])
    baseline = {r["doc_id"]: r["fp"] for r in df.select("doc_id", simhash("text").alias("fp")).collect()}
    for conf, values in [
        ("spark.sql.ansi.enabled", ["true", "false"]),
        ("spark.sql.legacy.sizeOfNull", ["true", "false"]),
    ]:
        original = spark.conf.get(conf, None)
        try:
            for v in values:
                spark.conf.set(conf, v)
                got = {
                    r["doc_id"]: r["fp"]
                    for r in df.select("doc_id", simhash("text").alias("fp")).collect()
                }
                assert got == baseline, f"simhash drifted under {conf}={v}"
        finally:
            if original is None:
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, original)


@pytest.mark.parametrize("text", ["", " ", "   "])
def test_simhash_degenerate_inputs(spark, text):
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    [row] = df.select(simhash("text").alias("fp")).collect()
    assert row["fp"] == 0
