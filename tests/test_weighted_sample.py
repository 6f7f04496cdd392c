"""Weighted systematic (PPS) sampling vs a brute-force reference."""

from __future__ import annotations

import hashlib
import random

from ironbeam_spark.operators.sampling import weighted_systematic_sample


def _ref(rows, k, seed):
    """rows: [(key, weight)] -> {key: multiplicity} (positive weights)."""
    rows = sorted((r for r in rows if r[1] > 0))
    w = sum(wt for _, wt in rows)
    if w == 0:
        return {}
    off = int(hashlib.md5(str(seed).encode()).hexdigest()[:12], 16) % w
    probes = [(off + (j * w) // k) % w for j in range(k)]
    out: dict[int, int] = {}
    cum = 0
    ivals = []
    for key, wt in rows:
        ivals.append((key, cum, cum + wt))
        cum += wt
    for t in probes:
        for key, s, e in ivals:
            if s <= t < e:
                out[key] = out.get(key, 0) + 1
                break
    return out


def _run(spark, rows, k, seed, parts=None):
    df = spark.createDataFrame(rows, "key long, weight long")
    if parts:
        df = df.repartition(parts)
    got = weighted_systematic_sample(
        df, k=k, seed=seed, order_cols=["key"], weight_col="weight"
    )
    return {r["key"]: r["multiplicity"] for r in got.collect()}


def test_heavy_item_multiplicity(spark):
    # one item holds ~90% of the weight: it must catch most of the probes
    rows = [(1, 900), (2, 50), (3, 50)]
    got = _run(spark, rows, k=10, seed=7)
    assert got == _ref(rows, 10, 7)
    assert got[1] >= 8 and sum(got.values()) == 10


def test_nonpositive_weights_never_selected(spark):
    rows = [(1, 0), (2, -5), (3, 100)]
    got = _run(spark, rows, k=5, seed=1)
    assert set(got) == {3} and got[3] == 5


def test_fuzz_and_partition_invariance(spark):
    rng = random.Random(606)
    rows = [(i, rng.randrange(0, 50)) for i in range(300)]
    for seed in (1, 2, 606):
        want = _ref(rows, 40, seed)
        assert _run(spark, rows, 40, seed) == want
        assert _run(spark, rows, 40, seed, parts=13) == want
        assert sum(want.values()) == 40  # always exactly k probes land


def test_probe_count_is_k(spark):
    rows = [(i, 1) for i in range(50)]
    got = _run(spark, rows, k=25, seed=3)
    assert sum(got.values()) == 25
    assert all(m == 1 for m in got.values())  # stride 2 > every weight
