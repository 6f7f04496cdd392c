"""Bigram stupid-backoff scoring (operators/ngram_lm.py) vs brute force.

The Python reference mirrors the operator's pinned IEEE association
exactly (Python floats are the same doubles), so comparisons are ==.
"""

from __future__ import annotations

import random

from ironbeam_spark.operators.ngram_lm import (
    bigram_counts,
    lm_score_stupid_backoff,
)

ALPHA = 0.4


def _ref(target_texts, texts, alpha=ALPHA):
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in target_texts:
        ws = [w for w in t.lower().split(" ") if w]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for v, w in zip(ws, ws[1:]):
            big[(v, w)] = big.get((v, w), 0) + 1
    n, v_sz = float(sum(uni.values())), float(len(uni))
    out = {}
    for i, t in texts:
        ws = [w for w in t.lower().split(" ") if w]
        n_sc = hits = oov = 0
        s = 0.0
        for a, b in zip(ws, ws[1:]):
            n_sc += 1
            if (a, b) in big:
                hits += 1
                p = float(big[(a, b)]) / float(uni[a])
            else:
                if b not in uni:
                    oov += 1
                p = alpha * (float(uni.get(b, 0) + 1) / (n + v_sz))
            if b not in uni and (a, b) in big:
                pass  # impossible: a bigram hit implies b was seen
            s = s + p
        # oov counts every position whose CURRENT token is unseen
        oov = sum(1 for _, b in zip(ws, ws[1:]) if b not in uni)
        out[i] = (
            n_sc,
            hits,
            oov,
            s,
            (s / float(n_sc)) if n_sc else None,
        )
    return out


def _run(spark, target_texts, texts):
    tgt = spark.createDataFrame([(t,) for t in target_texts], "text string")
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    uni, big = bigram_counts(tgt, "text")
    got = lm_score_stupid_backoff(docs, "doc_id", "text", uni, big, ALPHA)
    return {
        r["doc_id"]: (
            r["n_scored"],
            r["n_bigram_hits"],
            r["n_oov"],
            r["score_sum"],
            r["score_mean"],
        )
        for r in got.collect()
    }


def test_known_counts(spark):
    target = ["a b a b c", "a b"]  # c(a,b)=3 c(b,a)=1 c(b,c)=1; c(a)=3 c(b)=3 c(c)=1
    texts = [(1, "a b c"), (2, "z a"), (3, "solo")]
    got = _run(spark, target, texts)
    n, v = 7.0, 3.0
    assert got[1] == (2, 2, 0, 3.0 / 3.0 + 1.0 / 3.0, (3.0 / 3.0 + 1.0 / 3.0) / 2.0)
    # z->a: backoff with seen a; positions' current tokens all seen => oov 0
    assert got[2] == (1, 0, 0, ALPHA * (4.0 / (n + v)), ALPHA * (4.0 / (n + v)))
    assert got[3] == (0, 0, 0, 0.0, None)


def test_oov_current_token(spark):
    got = _run(spark, ["a b"], [(1, "a zz")])
    n, v = 2.0, 2.0
    p = ALPHA * (1.0 / (n + v))
    assert got[1] == (1, 0, 1, p, p)


def test_fuzz_against_reference(spark):
    rng = random.Random(606)
    vocab = ["aa", "bb", "cc", "dd", "ee", "zz"]
    mk = lambda lo, hi: " ".join(
        rng.choice(vocab) for _ in range(rng.randrange(lo, hi))
    )
    target = [mk(2, 30) for _ in range(20)]
    texts = [(i, mk(0, 25)) for i in range(30)]
    assert _run(spark, target, texts) == _ref(target, texts)
