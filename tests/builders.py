"""Deterministic seeded test-data builders — the packaged analog of the
reference's first-party builder layer (``src/testing/builders.rs:37-324``:
``TestDataBuilder``, ``skewed_kvs``, seeded pseudo-random generators) and the
canned fixtures in ``src/testing/fixtures.rs`` (see FIXTURES.md).

Everything is a pure function of its arguments (no RNG object, no global
state): "random" values derive from ``hash64(seed, i)`` — a split-mix-style
int64 mix — so two calls with the same arguments build identical DataFrames
on any machine, which is what makes builder-based tests reproducible
cross-session.  Builders return plain row lists or DataFrames; schemas use
Spark SQL type strings so tests read like the fixture tables they model.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1


def hash64(seed: int, i: int) -> int:
    """Deterministic 64-bit mix (splitmix64 finalizer over seed ^ i)."""
    z = (seed ^ (i * 0x9E3779B97F4A7C15)) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return (z ^ (z >> 31)) & MASK64


def uniform(seed: int, i: int, lo: float, hi: float) -> float:
    """Deterministic uniform double in [lo, hi)."""
    return lo + (hash64(seed, i) / 2**64) * (hi - lo)


def seeded_kvs(spark, n: int, n_keys: int = 10, seed: int = 42):
    """``(key string, value long)`` rows, keys uniform over ``key_{0..n_keys}``
    (``builders.rs`` TestDataBuilder analog)."""
    rows = [
        (f"key_{hash64(seed, i) % n_keys}", hash64(seed + 1, i) % 1000)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "key string, value long")


def skewed_kvs(spark, n: int, hot_frac: float = 0.5, n_cold: int = 20, seed: int = 42):
    """Skewed key distribution (``builders.rs:259`` ``skewed_kvs`` analog):
    ``hot_frac`` of rows share ONE key, the rest spread over ``n_cold`` cold
    keys — the fixture shape for salting / AQE-skew tests."""
    rows = []
    for i in range(n):
        if uniform(seed, i, 0.0, 1.0) < hot_frac:
            k = "hot_key"
        else:
            k = f"cold_key_{hash64(seed + 2, i) % n_cold}"
        rows.append((k, hash64(seed + 3, i) % 1000))
    return spark.createDataFrame(rows, "key string, value long")


def time_series(spark, n: int = 11, start_ms: int = 1000, step_ms: int = 100, seed: int = 42):
    """``(ts long, value double)`` ascending ms timestamps
    (``fixtures.rs:168-182`` scaled)."""
    rows = [
        (start_ms + step_ms * i, round(uniform(seed, i, 10.0, 20.0), 3))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "ts long, value double")


def near_dup_corpus(
    spark,
    n_families: int = 10,
    family_size: int = 3,
    n_filler: int = 170,
    lang: str = "en",
    source: str = "web",
    seed: int = 42,
):
    """Documents with known near-duplicate structure in ONE blocking bucket:
    ``n_families`` groups of ``family_size`` near-identical texts (every
    within-family pair is a true near-dup), plus pairwise-dissimilar filler
    docs built from per-doc unique tokens.  Returns (DataFrame, expected
    within-family pair set) — the ground truth a similarity-join test
    asserts against."""
    rows = []
    expected = set()
    for fam in range(n_families):
        base = f"family {fam} shares this fairly long common sentence body"
        ids = []
        for j in range(family_size):
            doc_id = fam * family_size + j
            ids.append(doc_id)
            rows.append((doc_id, f"{base} variant {j}", lang, source))
        for x in ids:
            for y in ids:
                if x < y:
                    expected.add((x, y))
    base_id = n_families * family_size
    for i in range(n_filler):
        doc_id = base_id + i
        h = hash64(seed, i)
        rows.append(
            (doc_id, f"u{doc_id}q{h % 997}z{h % 9973}w{h % 99991}v{h % 31}k{h % 57}", lang, source)
        )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    return df, expected
