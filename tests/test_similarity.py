"""Trained-centroid IVF: k-means training determinism and recall against the
brute-force oracle.  All inputs are deterministic (id-sorted sample, RNG-free
init), so recall values are exact and the assertions are stable.
"""

from __future__ import annotations

from ironbeam_spark.operators.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    train_centroids_kmeans,
)
from ironbeam_spark.sources.io import read_table
from tests.conftest import SF_SMOKE


def _recall(exact: set, approx: set) -> float:
    return len(exact & approx) / len(exact)


def test_kmeans_training_deterministic(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    a = train_centroids_kmeans(emb, k=8)
    b = train_centroids_kmeans(emb, k=8)
    assert a == b
    assert len(a) == 8 and all(len(vec) > 0 for _, vec in a)


def test_trained_ivf_recall_vs_brute_force(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.orderBy("vec_id").limit(20)
    cents = train_centroids_kmeans(emb, k=8)
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()
    }
    # probing more cells only adds candidates, so recall is monotone in n_probe
    recalls = []
    for n_probe in (1, 2, 3):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_ann_topk(emb, queries, cents, k=5, n_probe=n_probe).collect()
        }
        recalls.append(_recall(exact, approx))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] >= 0.7, recalls


def test_kmeans_distributed_path_no_driver_collect(spark, monkeypatch):
    """Above the sample threshold the ml (k-means||) path runs and never
    calls DataFrame.collect — only the k fitted centers reach the driver."""
    from pyspark.sql import DataFrame

    emb = read_table(spark, SF_SMOKE, "embeddings")

    def _no_collect(self):
        raise AssertionError("driver collect() in distributed training path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    cents = train_centroids_kmeans(emb, k=4, sample_n=8)  # forces distributed
    assert len(cents) == 4
    assert [cid for cid, _ in cents] == [0, 1, 2, 3]
    for _, vec in cents:
        assert abs(sum(x * x for x in vec) - 1.0) < 1e-6  # unit sphere


def test_kmeans_distributed_recall(spark):
    """Trained-by-ml centroids still give usable IVF recall at n_probe=3."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.orderBy("vec_id").limit(20)
    cents = train_centroids_kmeans(emb, k=8, sample_n=8, iters=20)
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_ann_topk(emb, queries, cents, k=5, n_probe=4).collect()
    }
    assert _recall(exact, approx) >= 0.7


def test_lsh_ann_dataframe_planes_no_collect_and_equal(spark, monkeypatch):
    """The all-DataFrame ANN path (VERDICT r3 #3): planes supplied as a
    DataFrame, a 10^4-row distributed query side, and NO DataFrame.collect
    anywhere in the operator (asserted by monkeypatch).  Results must equal
    the literal-planes path bit for bit."""
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame

    from ironbeam_spark.operators.similarity import lsh_ann_topk

    emb = read_table(spark, SF_SMOKE, "embeddings")
    planes_df = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").cast("int").alias("plane_id"),
        F.col("embedding").alias("plane"),
    )
    planes_lit = [list(r.plane) for r in planes_df.orderBy("plane_id").collect()]

    # 10^4 synthetic queries, generated distributed (never on the driver)
    q = spark.range(10_000).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (((F.col("id") % 97 + i * 31) % 101) - 50).cast("float") / 50,
        ).alias("embedding"),
    )

    def _no_collect(self, *a, **kw):
        raise AssertionError("collect() inside the no-collect ANN path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    out = lsh_ann_topk(emb, q, planes_df, k=3)
    n_df = out.count()  # full execution with the ban still in place
    monkeypatch.undo()

    lit = lsh_ann_topk(emb, q, planes_lit, k=3)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, lit.collect()))
    assert n_df == len(want) and n_df > 0
    assert got == want


def test_ivf_ann_dataframe_centroids_no_collect_and_equal(spark, monkeypatch):
    """Same contract for IVF: centroids as a (cell, centroid) DataFrame, a
    10^4-row distributed query side, no driver collect, identical output
    to the literal-centroids path."""
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame

    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("centroid"),
    )
    cents_lit = [
        (int(r.cell), list(r.centroid)) for r in cents_df.orderBy("cell").collect()
    ]
    # 10^4 synthetic queries, generated distributed (never on the driver)
    queries = spark.range(10_000).select(
        (F.col("id") + 2_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (((F.col("id") % 89 + i * 37) % 103) - 51).cast("float") / 51,
        ).alias("embedding"),
    )

    def _no_collect(self, *a, **kw):
        raise AssertionError("collect() inside the no-collect ANN path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    out = ivf_ann_topk(emb, queries, cents_df, k=5, n_probe=2)
    n_df = out.count()
    monkeypatch.undo()

    lit = ivf_ann_topk(emb, queries, cents_lit, k=5, n_probe=2)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, lit.collect()))
    assert n_df == len(want) and n_df > 0
    assert got == want


def test_int8_ann_recall_vs_float(spark):
    """Quantized brute-force top-5 keeps >= 0.8 recall vs the float
    baseline on the real embeddings table."""
    from ironbeam_spark.suite import QUERIES

    sf = "/root/testdata/sf0.001"
    f = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_ann_bruteforce"].fn(spark, sf).collect()
    }
    q = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_ann_int8"].fn(spark, sf).collect()
    }
    assert len(q & f) / len(f) >= 0.8, (len(q & f), len(f))


def test_lsh_near_dup_pairs_dataframe_planes_equal(spark):
    """lsh_near_dup_pairs accepts planes as a DataFrame (the advertised
    signature) and produces the identical pair set as the literal path."""
    import pyspark.sql.functions as F

    from ironbeam_spark.operators.similarity import lsh_near_dup_pairs

    emb = read_table(spark, SF_SMOKE, "embeddings")
    planes_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("plane_id"),
        F.col("embedding").alias("plane"),
    )
    planes_lit = [list(r.plane) for r in planes_df.orderBy("plane_id").collect()]
    got = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in lsh_near_dup_pairs(emb, planes_df, 0.2, bands=4).collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in lsh_near_dup_pairs(emb, planes_lit, 0.2, bands=4).collect()
    )
    assert got == want and len(got) > 0


def test_semantic_dedup_model(spark):
    """semantic_dedup == the brute-force model: assign to nearest centroid,
    union-find over within-cell pairs >= threshold, min-id winner.  A
    zero-norm vector can never pair, so it is always kept."""
    import numpy as np

    import pyspark.sql.functions as F

    from ironbeam_spark.operators.similarity import semantic_dedup

    # three well-separated direction families + explicit duplicates
    # (30..39 repeat 0..9), so every pairing/assignment decision sits far
    # from any FP boundary between the numpy model and the Catalyst fold
    def vec(i):
        v = [0.0] * 8
        v[i % 3] = 10.0
        v[7] = 0.01 * (i % 30 // 3)
        return v

    rng = [(i, vec(i)) for i in range(40)]
    rng.append((99, [0.0] * 8))  # degenerate: undefined cosine
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    cents = [(k, [10.0 if j == k else 0.0 for j in range(8)]) for k in range(3)]
    out = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in semantic_dedup(df, cents, threshold=0.999999).collect()
    }
    assert len(out) == 41
    assert sum(1 for _, (_c, _comp, k) in out.items() if not k) >= 10
    assert out[99][2] is True  # degenerate vector survives

    # brute-force model
    def cos(a, b):
        a, b = np.array(a), np.array(b)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else None

    def assign(v):
        sims = [(cos(v, c) or -2, cid) for cid, c in cents]
        return max(sims, key=lambda t: (t[0], -t[1]))[1]

    parent = {i: i for i, _ in rng}
    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x
    cells = {i: assign(v) for i, v in rng}
    for i, vi in rng:
        for j, vj in rng:
            if i < j and cells[i] == cells[j]:
                c = cos(vi, vj)
                if c is not None and c >= 0.999999:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    for i, _ in rng:
        assert out[i][0] == cells[i], i
        assert out[i][1] == find(i), i
        assert out[i][2] == (find(i) == i), i


def test_semantic_dedup_triangle_blocks_equal_direct(spark):
    """blocks_per_cell > 1 (triangle join) produces the IDENTICAL result
    as the direct within-cell self-join — every unordered pair scored
    exactly once, including edge blocks 0 and B-1."""
    from ironbeam_spark.operators.similarity import semantic_dedup

    def vec(i):
        v = [0.0] * 8
        v[i % 3] = 10.0
        v[7] = 0.01 * (i % 40 // 4)
        return v

    rng = [(i, vec(i)) for i in range(120)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    cents = [(k, [10.0 if j == k else 0.0 for j in range(8)]) for k in range(3)]
    base = sorted(
        map(tuple, semantic_dedup(df, cents, threshold=0.999999).collect())
    )
    for B in (2, 3, 5):
        got = sorted(
            map(
                tuple,
                semantic_dedup(
                    df, cents, threshold=0.999999, blocks_per_cell=B
                ).collect(),
            )
        )
        assert got == base, B


def test_semantic_dedup_no_pairs_and_empty_input(spark):
    """Above-threshold-free inputs keep everything; empty input yields an
    empty frame with the contract schema."""
    from ironbeam_spark.operators.similarity import semantic_dedup

    rng = [(i, [1.0 if j == i % 8 else 0.0 for j in range(8)]) for i in range(8)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    cents = [(0, rng[0][1]), (1, rng[1][1])]
    out = semantic_dedup(df, cents, threshold=0.9999999).collect()
    assert len(out) == 8 and all(r.keep for r in out)

    empty = df.where("vec_id < 0")
    res = semantic_dedup(empty, cents)
    assert res.columns == ["vec_id", "cell", "component", "keep"]
    assert res.count() == 0


def test_ann_paths_survive_zero_norm_vectors(spark):
    """Round-6 ADVICE regression: ivf_assign_cells deliberately keeps
    zero-norm/empty vectors, so they reach the IVF/LSH scoring joins —
    the score must be cosine_safe (NULL, then dropped by ranking), not the
    unsafe quotient that raises ANSI DIVIDE_BY_ZERO and kills the job."""
    from ironbeam_spark.operators.similarity import (
        ivf_ann_topk,
        lsh_ann_topk,
        lsh_near_dup_pairs,
    )

    rng = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(20)
    ]
    rng.append((98, [0.0] * 8))  # degenerate corpus vector
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 3 OR vec_id = 98")  # degenerate query too
    cents = [(0, rng[0][1]), (1, rng[1][1]), (2, rng[2][1])]
    planes = [rng[3][1], rng[4][1]]

    ivf = ivf_ann_topk(df, queries, cents, k=3, n_probe=2).collect()
    lsh = lsh_ann_topk(df, queries, planes, k=3).collect()
    pairs = lsh_near_dup_pairs(df, planes, threshold=0.5, bands=2).collect()

    # jobs completed; the degenerate id appears as neither query nor neighbor
    for rows in (ivf, lsh):
        assert rows, "ANN returned nothing for clean queries"
        assert all(r.neighbor_id != 98 and r.query_id != 98 for r in rows)
    assert all(98 not in (r.id_a, r.id_b) for r in pairs)
