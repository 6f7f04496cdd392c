"""Unicode normalization (operators/unicode_norm.py)."""

from __future__ import annotations

import unicodedata

import pytest

from ironbeam_spark.operators.unicode_norm import (
    unicode_normalize,
    with_normalized,
)

DECOMPOSED = "e\u0301le\u0301phant"   # e + combining acute, twice
PRECOMPOSED = "\u00e9l\u00e9phant"


def test_nfc_composes_and_matches_python(spark):
    df = spark.createDataFrame(
        [(1, DECOMPOSED), (2, PRECOMPOSED), (3, "plain"), (4, None)],
        "id long, s string",
    )
    out = {
        r["id"]: (r["s"], r["s_changed"])
        for r in with_normalized(df, "s").collect()
    }
    assert out[1] == (PRECOMPOSED, True)
    assert out[2] == (PRECOMPOSED, False)
    assert out[3] == ("plain", False)
    assert out[4] == (None, False)  # NULL-safe: unchanged


def test_all_forms_match_unicodedata(spark):
    cases = [DECOMPOSED, PRECOMPOSED, "ﬁño", "①23", ""]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "id long, s string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {
            r["id"]: r["n"]
            for r in df.select(
                "id", unicode_normalize("s", form).alias("n")
            ).collect()
        }
        want = {i: unicodedata.normalize(form, c) for i, c in enumerate(cases)}
        assert got == want, form


def test_rejects_unknown_form(spark):
    with pytest.raises(ValueError):
        unicode_normalize("s", "NFX")


def test_with_normalized_new_column_keeps_original(spark):
    df = spark.createDataFrame([(1, DECOMPOSED)], "id long, s string")
    row = with_normalized(df, "s", out_col="s_nfc").collect()[0]
    assert row["s"] == DECOMPOSED
    assert row["s_nfc"] == PRECOMPOSED
    assert row["s_nfc_changed"] is True
