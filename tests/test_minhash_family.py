"""The minhash affine-hash family: wrap, exactness, and independence.

Round-10 regression suite for a silent algorithmic bug: the original
coefficients (a_i = 2i+3) were so small that (a·x + b) mod (2^61−1) never
wrapped for any shingle hash x < 2^57 — every h_i was MONOTONE in x, all k
"independent" minhashes picked the same argmin shingle, and the banded LSH
collapsed to a single-hash scheme (candidate recall s instead of
1−(1−s^r)^b).  The DuckDB oracle mirrored the same arithmetic, so
correctness gates stayed green while the algorithm quietly under-recalled
mid-similarity pairs.  These tests pin the repaired family's contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ironbeam_spark.operators.dedup import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    SHINGLE_MOD,
    hashed_word_shingles,
    minhash_affine,
    minhash_signature_from_ints,
)


def test_coefficients_force_modular_wrap():
    """Every a_i must fold the hash line past the prime MANY times — the
    exact condition whose violation caused the collapse — stay within the
    int64 product bound (a·x' < 2^62), and never be ≡ 0 mod p (a constant
    hash)."""
    for a, b in MINHASH_COEFFS:
        # >= 2^30 folds of the [0, p) line: thoroughly mixed, not monotone
        assert a * MINHASH_PRIME > MINHASH_PRIME * (1 << 29), f"a={a} too small"
        assert a % 2 == 1
        assert (1 << 30) <= a < (1 << 31)
        assert a != MINHASH_PRIME
        assert 0 <= b < MINHASH_PRIME
    # distinct multipliers — identical a_i would re-collapse the family
    assert len({a for a, _ in MINHASH_COEFFS}) == len(MINHASH_COEFFS)


def test_affine_matches_bigint_reference(spark):
    """The int64 evaluation must equal (a·(x & M31) + b) mod M31 computed
    in unbounded Python ints, across the full input range (boundaries +
    pseudo-random probes — including values above 2^31, which exercise the
    truncation)."""
    xs = [0, 1, (1 << 31) - 1, 1 << 31, (1 << 48) - 1, SHINGLE_MOD - 1] + [
        (1234567891011 * (i + 1) ** 3 + 987654321 * i) % SHINGLE_MOD
        for i in range(50)
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    for a, b in MINHASH_COEFFS[:4]:
        got = [
            r["h"]
            for r in df.select(minhash_affine(F.col("x"), a, b).alias("h"))
            .orderBy("x")
            .collect()
        ]
        want = [(a * (x & MINHASH_PRIME) + b) % MINHASH_PRIME for x in sorted(xs)]
        assert got == want


def test_signature_components_are_not_perfectly_correlated(spark):
    """B ⊃ A with a disjoint half C: under the monotone family B agreed
    with A on ALL 8 components and with C on none (the global argmin
    shingle of B decided every slot).  A real k-permutation family must
    split the agreements — each component's argmin is an independent draw
    landing in the A-half or C-half of B's shingle set."""
    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    C = "quark lepton boson hadron gluon photon neutrino meson baryon tau " * 4
    B = A + C
    docs = spark.createDataFrame([(1, A), (2, B), (3, C)], "doc_id long, text string")
    sig = docs.select(
        "doc_id",
        minhash_signature_from_ints(hashed_word_shingles("text", 3), 8).alias("sig"),
    )
    s = {r["doc_id"]: r["sig"] for r in sig.collect()}
    agree_ab = sum(s[1][i] == s[2][i] for i in range(8))
    agree_bc = sum(s[2][i] == s[3][i] for i in range(8))
    # every component of B comes from either its A-half or its C-half
    # (boundary shingles are possible but deterministically absent here)
    assert agree_ab + agree_bc == 8
    assert 0 < agree_ab < 8, "all-or-nothing agreement: monotone family is back"
    assert 0 < agree_bc < 8


def test_jaccard_half_pair_forms_lsh_candidates(spark):
    """With bands=8 (r=1), a J≈0.45 pair must collide on at least one band
    — the exact end-to-end recall the broken family denied (B and C shared
    no band despite 8 single-row chances at p=0.45 each)."""
    from ironbeam_spark.operators.dedup import minhash_dedup_pairs

    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    C = "quark lepton boson hadron gluon photon neutrino meson baryon tau " * 4
    B = A + C
    docs = spark.createDataFrame([(1, A), (2, B), (3, C)], "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): round(r["jaccard_sim"], 3)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", shingle_words=3, k=8, bands=8, threshold=0.4
        ).collect()
    }
    assert pairs == {(1, 2): 0.455, (2, 3): 0.455}


def test_lsh_recall_vs_brute_force_ground_truth(spark):
    """Non-mirror oracle: the banded pipeline's output must equal the
    brute-force all-pairs exact-Jaccard ground truth on the real sf0.001
    corpus (500 docs — the quadratic is fine at test scale).  Unlike the
    DuckDB oracles, this shares NO arithmetic with the candidate
    generator: any banding/signature bug that silently drops a true pair
    fails here.  All 28 true pairs sit at J >= 0.88, where per-pair
    collision probability under k=8/b=4 is ~0.998, so full recall is the
    expected outcome, not luck; the mid-similarity regime is pinned
    separately by test_jaccard_half_pair_forms_lsh_candidates."""
    from ironbeam_spark.operators.dedup import jaccard, minhash_dedup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    sh = docs.select("doc_id", hashed_word_shingles("text", 3).alias("sh")).where(
        F.size("sh") > 0
    )
    a = sh.withColumnsRenamed({"doc_id": "id_a", "sh": "sa"})
    b = sh.withColumnsRenamed({"doc_id": "id_b", "sh": "sb"})
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("j", jaccard(F.col("sa"), F.col("sb")))
        .where(F.col("j") >= 0.5)
    )
    truth = {(r["id_a"], r["id_b"]): round(r["j"], 9) for r in brute.collect()}
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard_sim"], 9)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", shingle_words=3, k=8, bands=4, threshold=0.5
        ).collect()
    }
    assert got == truth
    assert len(truth) == 28  # corpus fixture: drift here means testdata changed


def test_string_shingle_signature_matches_ints_path(spark):
    """minhash_signature (string shingles) must equal the ints path fed the
    same 48-bit md5 base hashes — the convenience wrapper has no other
    callers in-package, so this pin is its only guard."""
    from ironbeam_spark.functions.text import token_int
    from ironbeam_spark.operators.dedup import minhash_signature

    docs = spark.createDataFrame(
        [(1, ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"])],
        "doc_id long, shingles array<string>",
    )
    via_strings = docs.select(minhash_signature(F.col("shingles"), 8).alias("sig"))
    via_ints = docs.select(
        minhash_signature_from_ints(
            F.transform(F.col("shingles"), lambda s: token_int(s)), 8
        ).alias("sig")
    )
    assert via_strings.collect() == via_ints.collect()


def test_oracle_coeffs_match_engine():
    """The suite oracle embeds MINHASH_COEFFS literals into its SQL — pin
    that the interpolation really carries the engine's constants."""
    from ironbeam_spark.suite.text_ml import _COEFFS_SQL

    for i, (a, b) in enumerate(MINHASH_COEFFS[:8]):
        assert f"({i}, {a}, {b})" in _COEFFS_SQL


def test_empty_and_null_shingles_sign_as_null(spark):
    """Exported-API guard (r10 ADVICE): an empty shingle array must yield a
    NULL signature, not the accumulator seed — seed-valued signatures give
    every empty doc an identical signature and band key, making all empty
    docs mutual LSH candidates (a quadratic junk bucket at corpus scale).
    NULL band keys drop out of the candidate equi-join instead."""
    df = spark.createDataFrame(
        [(1, [11, 22, 33]), (2, []), (3, None)],
        "doc_id long, ints array<long>",
    )
    rows = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", minhash_signature_from_ints(F.col("ints"), 8).alias("sig")
        ).collect()
    }
    assert rows[1] is not None and len(rows[1]) == 8
    assert all(v != MINHASH_PRIME for v in rows[1])
    assert rows[2] is None
    assert rows[3] is None

    from ironbeam_spark.operators.dedup import minhash_signature

    sdf = spark.createDataFrame(
        [(1, ["a b c", "b c d"]), (2, [])],
        "doc_id long, shingles array<string>",
    )
    srows = {
        r.doc_id: r.sig
        for r in sdf.select(
            "doc_id", minhash_signature(F.col("shingles"), 8).alias("sig")
        ).collect()
    }
    assert srows[1] is not None and srows[2] is None


def test_null_signatures_emit_no_band_postings(spark):
    """Companion to the NULL-on-empty contract: minhash_band_keys must drop
    NULL-signature rows entirely.  Without its filter, concat_ws swallows
    the NULL band slice and every null-sig doc shares the literal key
    '<band>#' — mutual LSH candidates, the junk bucket again."""
    from ironbeam_spark.operators.dedup import minhash_band_keys

    df = spark.createDataFrame(
        [(1, [11, 22, 33, 44, 55, 66, 77, 88]), (2, None)],
        "doc_id long, sig array<long>",
    )
    rows = minhash_band_keys(df, "doc_id", "sig", bands=4, rows_per_band=2).collect()
    assert {r.doc_id for r in rows} == {1}
    assert len(rows) == 4
    assert all("#" in r.band_key and not r.band_key.endswith("#") for r in rows)
