"""Non-mirror differentials for every seeded/mirror-oracle family.

Round-10 proved the failure class is real: the minhash affine family was
wrong for nine rounds while the DuckDB oracle — which interpolates the
implementation's own constants — re-derived the identical broken
arithmetic and kept every gate green.  "Exact oracle green" is necessary,
not sufficient, for any operator whose oracle mirrors the implementation;
each such family also needs evidence that shares NO arithmetic with the
implementation: brute-force ground truth, a probabilistic contract the
algorithm publishes, or an exact combinatorial identity.

This module holds the differentials the r10 verdict asked for (minhash's
own lives in test_minhash_family.py).  The audit table mapping family →
evidence → file:line is in SCALE.md §Round-11.
"""

from __future__ import annotations

import hashlib
import itertools
import math

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# hyperplane LSH (lsh_near_dup_pairs): recall vs brute-force cosine truth
# ---------------------------------------------------------------------------


def _unit(vec):
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec]


def _synthetic_embeddings(n_base=200, n_dups=60, dim=64):
    """Deterministic corpus with planted near-dup pairs at cosine ≥ 0.9.

    Base vectors come from md5 bytes (uniform on the sphere after CLT-ish
    signed-byte sums — good enough for direction diversity); each planted
    dup is base + small orthogonal-ish noise, giving cos(base, dup) ≈ 0.95.
    No RNG: the corpus is a pure function of the index.
    """

    def raw(tag, i):
        h = hashlib.md5(f"{tag}:{i}".encode()).digest() * 4
        return [h[j] - 127.5 for j in range(dim)]

    vecs = {}
    for i in range(n_base):
        vecs[i] = _unit(raw("base", i))
    pairs = []
    for d in range(n_dups):
        base = vecs[d]
        noise = _unit(raw("noise", d))
        dup = _unit([b + 0.30 * x for b, x in zip(base, noise)])
        dup_id = n_base + d
        vecs[dup_id] = dup
        pairs.append((d, dup_id))
    return vecs, pairs


def _planes(n_planes=16, dim=64):
    return [_unit([hashlib.md5(f"plane:{p}:{j}".encode()).digest()[0] - 127.5
                   for j in range(dim)]) for p in range(n_planes)]


def _cos(a, b):
    return sum(x * y for x, y in zip(a, b))


def test_hyperplane_lsh_recall_vs_brute_force_cosine(spark):
    """Non-mirror oracle for lsh_near_dup_pairs — the hyperplane analog of
    test_minhash_family.test_lsh_recall_vs_brute_force_ground_truth.

    The existing soundness test (test_setsim.py) proves output ⊆ truth,
    which a COLLAPSED signature passes trivially (it just misses pairs) —
    exactly how the minhash bug hid.  This pins recall: with 16 planes in
    8 bands (r=2), a planted pair at cos ≥ 0.9 has per-band collision
    p² ≥ 0.73 and whole-corpus recall 1−(1−p²)^8 ≥ 0.9997, so ≥ 0.95
    observed recall over 60 planted pairs is the expected outcome by a
    wide margin, while a signature collapsed to one effective band (the
    r10 failure class) delivers ~0.73 and fails this bound with
    probability > 0.9999 (Binomial(60, .73) ≥ 57 ≈ 1e-6)."""
    from ironbeam_spark.operators.similarity import lsh_near_dup_pairs

    vecs, planted = _synthetic_embeddings()
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    threshold = 0.85

    # brute-force all-pairs cosine ground truth, pure python — shares no
    # arithmetic (not even the dot-product expression) with the operator
    ids = sorted(vecs)
    truth = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if _cos(vecs[a], vecs[b]) >= threshold
    }
    for a, b in planted:
        assert (a, b) in truth, "fixture drift: planted pair below threshold"

    got = {
        (r.id_a, r.id_b)
        for r in lsh_near_dup_pairs(
            df, _planes(), threshold, "vec_id", "embedding", bands=8
        ).collect()
    }
    assert got <= truth, f"unsound pairs: {sorted(got - truth)[:5]}"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, (
        f"LSH recall {recall:.3f} over {len(truth)} true pairs — "
        "banded hyperplane signature is under-delivering its collision "
        "contract (collapsed/correlated bands?)"
    )


def test_hyperplane_bits_are_balanced_and_distinct(spark):
    """Family-health check in the spirit of the minhash coefficient tests:
    every plane's sign bit must split the corpus non-degenerately (a stuck
    bit halves the effective band width), and no two planes may induce the
    same partition (duplicate planes collapse band entropy)."""
    from ironbeam_spark.operators.similarity import hyperplane_buckets

    vecs, _ = _synthetic_embeddings()
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    planes = _planes()
    bk = hyperplane_buckets(df, planes, "embedding")
    buckets = [r.bucket for r in bk.collect()]
    n = len(buckets)
    for j in range(len(planes)):
        ones = sum((b >> j) & 1 for b in buckets)
        assert 0.10 * n <= ones <= 0.90 * n, f"plane {j} bit is near-stuck ({ones}/{n})"
    cols = {
        j: tuple((b >> j) & 1 for b in buckets) for j in range(len(planes))
    }
    for i, j in itertools.combinations(range(len(planes)), 2):
        assert cols[i] != cols[j], f"planes {i} and {j} induce identical bits"


# ---------------------------------------------------------------------------
# SimHash: fingerprint contract vs text-level ground truth
# ---------------------------------------------------------------------------


def test_simhash_separates_near_dups_from_unrelated(spark):
    """Ground-truth contract the pure-python model test CANNOT catch (the
    model mirrors the spec, so a degenerate spec passes both): identical
    docs → Hamming 0; one-token-in-40 edits → small distance (E ≈ 6 of 48,
    4σ bound 16); docs over disjoint vocabularies → distance concentrated
    at bits/2 = 24 (each per-bit vote is an independent md5 majority; a
    stuck or correlated bit pulls the unrelated-pair distribution toward 0
    and fails the per-pair floor)."""
    from ironbeam_spark.operators.dedup import simhash

    def doc(tag, n=40):
        return " ".join(f"{tag}tok{j}" for j in range(n))

    rows = []
    # 12 unrelated docs over pairwise-disjoint vocabularies
    for i in range(12):
        rows.append((i, doc(f"u{i}_")))
    # 6 near-dup pairs: one token replaced out of 40
    for d in range(6):
        base = doc(f"n{d}_").split()
        edited = list(base)
        edited[7] = f"n{d}_EDITED"
        rows.append((100 + 2 * d, " ".join(base)))
        rows.append((101 + 2 * d, " ".join(edited)))
    # identical pair
    rows.append((900, doc("same_")))
    rows.append((901, doc("same_")))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r.doc_id: r.fp for r in df.select(
        "doc_id", simhash("text", 48).alias("fp")).collect()}

    def ham(a, b):
        return bin(fp[a] ^ fp[b]).count("1")

    assert ham(900, 901) == 0
    near = [ham(100 + 2 * d, 101 + 2 * d) for d in range(6)]
    assert all(h <= 16 for h in near), near
    far = [ham(a, b) for a, b in itertools.combinations(range(12), 2)]
    assert all(10 <= h <= 38 for h in far), (min(far), max(far))
    mean_far = sum(far) / len(far)
    assert 19 <= mean_far <= 29, mean_far  # E=24, σ_mean ≈ 0.6 over 66 pairs
    assert max(near) < min(far), (near, min(far))


def test_simhash_pairs_brute_force_on_real_corpus(spark):
    """End-to-end differential on the sf0.001 corpus: the chunked pigeonhole
    pipeline must equal brute-force all-pairs Hamming over the same
    fingerprints — recall AND precision 1.0 within the distance bound (the
    pigeonhole guarantee is deterministic, so exact equality, no tolerance)."""
    from ironbeam_spark.operators.dedup import simhash, simhash_pairs

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    fp = {r.doc_id: r.fp for r in docs.select(
        "doc_id", simhash("text", 48).alias("fp")).collect()}
    max_h = 10
    truth = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for a, b in itertools.combinations(sorted(fp), 2)
        if bin(fp[a] ^ fp[b]).count("1") <= max_h
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=max_h).collect()
    }
    assert got == truth
    assert truth, "fixture drift: no near-dup pairs at max_hamming=10"


# ---------------------------------------------------------------------------
# Winnowing match: detection guarantee + brute-force pair ground truth
# ---------------------------------------------------------------------------


def test_winnow_match_detects_planted_shared_substrings(spark):
    """The published winnowing guarantee, END TO END through the pair
    pipeline (the fingerprint-level model test stops before the df-window /
    posting-join machinery): any substring of length ≥ w+k−1 shared by two
    docs yields ≥ 1 shared fingerprint, so with min_shared=1 every planted
    pair MUST surface; docs with disjoint character k-grams must not."""
    from ironbeam_spark.operators.dedup import winnow_match_pairs

    shared = [
        "the entire shared paragraph number %d sits here" % i for i in range(4)
    ]
    rows = []
    for i, s in enumerate(shared):
        rows.append((2 * i, f"left context {i} unique prefix AAA {s}"))
        rows.append((2 * i + 1, f"{s} completely different suffix BBB {i}"))
    # two docs over disjoint alphabets (digits vs letters): no shared 8-gram
    rows.append((100, "0123456789 9876543210 1029384756 5647382910"))
    rows.append((101, "qwertyuiop asdfghjkl zxcvbnm poiuytrewq lkjhgfdsa"))

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in winnow_match_pairs(
            docs, "doc_id", "text", k=8, w=4, min_shared=1, max_df=50
        ).collect()
    }
    for i in range(len(shared)):
        assert (2 * i, 2 * i + 1) in got, f"planted pair {i} missed"
    assert (100, 101) not in got


def test_winnow_match_pairs_equals_brute_force(spark):
    """Brute-force ground truth on the real corpus: collect each doc's
    winnowing fingerprints once, compute shared-rare-fingerprint counts in
    pure python (df cap included), and require exact equality with the
    distributed window+posting-join pipeline — catches any df-window /
    join / dedup bug independently of the SQL oracle's mirrored
    arithmetic."""
    from collections import Counter

    from ironbeam_spark.functions.text import winnow_fingerprints
    from ironbeam_spark.operators.dedup import winnow_match_pairs

    k, w, min_shared, max_df = 8, 4, 2, 40
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    fps = {
        r.doc_id: set(r.fp)
        for r in docs.select(
            "doc_id", winnow_fingerprints("text", k, w).alias("fp")
        ).collect()
    }
    df_count = Counter(f for s in fps.values() for f in s)
    rare = {f for f, c in df_count.items() if c <= max_df}
    truth = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        n = len(fps[a] & fps[b] & rare)
        if n >= min_shared:
            truth[(a, b)] = n
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_match_pairs(
            docs, "doc_id", "text", k=k, w=w, min_shared=min_shared, max_df=max_df
        ).collect()
    }
    assert got == truth
    assert truth, "fixture drift: no matching pairs on the corpus"


# ---------------------------------------------------------------------------
# DSIR: implementation-independent ordinal contract
# ---------------------------------------------------------------------------


def test_dsir_target_like_docs_outweigh_off_target_docs(spark):
    """The importance-resampling contract, free of any arithmetic mirror:
    with a target corpus drawn from vocabulary A, every raw doc written in
    vocabulary A must weigh strictly more than every raw doc written in a
    disjoint vocabulary B (its features never occur in the target, so each
    contributes the smoothing floor).  The exact-value python model
    (test_recompute.test_dsir_weights_model) would reproduce a mis-specified
    ratio formula verbatim; this test pins the direction the algorithm
    exists to deliver."""
    from ironbeam_spark.operators.sampling import dsir_importance_weights

    def adoc(i):
        return " ".join(f"alpha{j % 7}" for j in range(i + 5))

    def bdoc(i):
        return " ".join(f"beta{j % 7}" for j in range(i + 5))

    raw = [(i, adoc(i)) for i in range(8)] + [(100 + i, bdoc(i)) for i in range(8)]
    target = [(1000 + i, adoc(i + 3)) for i in range(6)]
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    out = {
        r.doc_id: r.dsir_weight
        for r in dsir_importance_weights(
            raw_df, tgt_df, "doc_id", "text", buckets=256
        ).collect()
    }
    a_min = min(v for k_, v in out.items() if k_ < 100)
    b_max = max(v for k_, v in out.items() if k_ >= 100)
    assert a_min > b_max, (a_min, b_max)


# ---------------------------------------------------------------------------
# Weighted systematic sample: Madow identity + offset uniformity
# ---------------------------------------------------------------------------


def _madow_multiplicities(weights: list[int], k: int, offset: int) -> list[int]:
    """Pure-python Madow systematic PPS at a given offset, using the SAME
    documented probe formula the engine mirrors to SQL."""
    w_total = sum(weights)
    probes = [(offset + (j * w_total) // k) % w_total for j in range(k)]
    out = [0] * len(weights)
    cum = 0
    ivals = []
    for i, wt in enumerate(weights):
        ivals.append((cum, cum + wt))
        cum += wt
    for t in probes:
        for i, (s, e) in enumerate(ivals):
            if s <= t < e:
                out[i] += 1
                break
    return out


def test_madow_identity_sum_over_all_offsets_is_exact():
    """Exact combinatorial identity of Madow (1949) systematic PPS: summed
    over ALL W possible offsets, item i is selected exactly k·w_i times —
    i.e. E[multiplicity_i] = k·w_i/W with NO statistical tolerance.  Verifying
    the identity on the documented probe arithmetic proves the probe
    spacing delivers inclusion probability proportional to weight; the
    existing Spark-vs-_ref differentials (test_weighted_sample.py) pin the
    engine to this same arithmetic at specific seeds."""
    weights = [1, 2, 3, 5, 8, 13, 21]  # W = 53, coprime-ish with k
    k = 6
    W = sum(weights)
    totals = [0] * len(weights)
    for off in range(W):
        for i, m in enumerate(_madow_multiplicities(weights, k, off)):
            totals[i] += m
    assert totals == [k * w for w in weights], totals


def test_seeded_offset_is_uniform_over_the_weight_line():
    """The engine's offset = md5(str(seed))[:12] mod W.  The Madow identity
    above holds only if offsets are uniform over [0, W); a biased or
    constant seeding (the failure that would skew inclusion probabilities
    while passing every same-seed determinism test) shows up here.  2000
    seeds into 10 deciles: each decile expects 200, bound ±5σ (±67)."""
    W = 53_131  # arbitrary non-power-of-two weight total
    counts = [0] * 10
    for seed in range(2000):
        off = int(hashlib.md5(str(seed).encode()).hexdigest()[:12], 16) % W
        counts[off * 10 // W] += 1
    assert all(133 <= c <= 267 for c in counts), counts
    # and offsets are not degenerate/repeating
    offs = {
        int(hashlib.md5(str(s).encode()).hexdigest()[:12], 16) % W
        for s in range(100)
    }
    assert len(offs) >= 95


# ---------------------------------------------------------------------------
# md5-priority sampling family + shard affine: family-health checks
# ---------------------------------------------------------------------------


def test_md5_priority_h48_is_uniform_for_engine_format():
    """sample_fraction / sample_reservoir / the split bucketing all rank by
    md5 over the EXACT string format 'seed|key'; their statistical
    contracts (rate ≈ fraction, uniform inclusion) reduce to that value
    being uniform.  md5 uniformity is public crypto fact — what this pins
    is the ENGINE'S format: a formatting bug (e.g. a cast collapsing every
    key to one string) would make priorities constant and sail through the
    same-seed determinism tests.  2000 keys into 10 deciles of 2^48, each
    expects 200, bound ±5σ."""
    counts = [0] * 10
    for i in range(2000):
        h = int(hashlib.md5(f"7|key{i}".encode()).hexdigest()[:12], 16)
        counts[h * 10 // (1 << 48)] += 1
    assert all(133 <= c <= 267 for c in counts), counts


def test_shard_affine_multiplier_wraps():
    """The r10 minhash bug was a multiplier too small to ever fire the mod
    — the same affine-over-Mersenne-prime construction backs the shard
    export permutation.  Pin that its fixed multiplier folds the line many
    times (a > 2^57 ⇒ wrap for every id ≥ 16) and is not ≡ 0/1 mod p; the
    bijectivity and reorder tests live in test_sharding.py."""
    from ironbeam_spark.operators.sharding import AFFINE_P, affine_params

    a, _, p = affine_params(0)
    assert p == AFFINE_P
    assert a > (1 << 57), a
    assert a % p not in (0, 1)
    # seeds rotate b over the whole line, not a degenerate orbit
    bs = {affine_params(s)[1] for s in range(100)}
    assert len(bs) == 100


# ---------------------------------------------------------------------------
# Mirrored-formula scoring: from-spec python models + ground truth
# (a sign/direction slip in BM25/TF-IDF/lang-id would be reproduced verbatim
# by the SQL oracle — the same blindness that hid the minhash bug)
# ---------------------------------------------------------------------------


def _ws_tokens(text):
    return [t for t in text.split(" ") if t]


def test_bm25_ranking_matches_from_spec_python_model(spark):
    """q_bm25_rational vs BM25 written from the published formula
    (Robertson/Spärck Jones; k1=1.2, b=0.75, rational idf
    (N−df+0.5)/(df+0.5), tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl))) in pure
    python over the raw corpus text.  The SQL oracle mirrors the Spark
    expression; this model mirrors only the SPEC, so an inverted idf, a
    swapped b term, or a tf/dl direction slip fails here."""
    from ironbeam_spark.suite import QUERIES

    terms = ["vector", "filter", "data"]
    docs = {
        r.doc_id: _ws_tokens(r.text)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfs = {
        term: sum(1 for t in docs.values() if term in t) for term in terms
    }
    scores = {}
    for did, toks in docs.items():
        dl = len(toks)
        s = 0.0
        for term in terms:
            tf = sum(1 for t in toks if t == term)
            idf = (n - dfs[term] + 0.5) / (dfs[term] + 0.5)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        if any(term in toks for term in terms):
            scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.doc_id, r.score)
        for r in QUERIES["q_bm25_rational"].fn(spark, SF_SMOKE).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9 * max(1.0, abs(ws)), (gd, gs, ws)


def test_tfidf_matches_from_spec_python_model(spark):
    """q_tfidf_topterms vs the documented rational tf-idf
    (tf · (N+1)/(df+1), top-3 per doc, score-desc then term-asc) computed
    in pure python from the raw text — catches an inverted idf or a
    df-direction slip the mirrored oracle cannot."""
    from collections import Counter

    from ironbeam_spark.suite import QUERIES

    docs = {
        r.doc_id: _ws_tokens(r.text.lower())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r.doc_id < 300
    }
    n = len(docs)
    tfs = {did: Counter(toks) for did, toks in docs.items()}
    df_count = Counter(t for c in tfs.values() for t in c)
    want = {}
    for did, c in tfs.items():
        ranked = sorted(
            ((tf * (n + 1) / (df_count[t] + 1), t) for t, tf in c.items()),
            key=lambda st: (-st[0], st[1]),
        )[:3]
        want[did] = [(t, s) for s, t in ranked]
    got = {}
    for r in QUERIES["q_tfidf_topterms"].fn(spark, SF_SMOKE).collect():
        got.setdefault(r.doc_id, []).append((r.term, r.score, r.rank))
    assert set(got) == set(want)
    for did, rows in got.items():
        rows = sorted(rows, key=lambda x: x[2])
        assert [t for t, _, _ in rows] == [t for t, _ in want[did]], did
        for (t, s, _), (_, ws) in zip(rows, want[did]):
            assert abs(s - ws) < 1e-9 * max(1.0, ws), (did, t, s, ws)


def test_lang_id_ground_truth(spark):
    """lang_id on actual sentences in each supported language (plus
    stopword-free gibberish → 'und').  The oracle mirrors the CASE chain,
    so swapped stopword lists or an inverted argmax would stay green
    everywhere else."""
    from ironbeam_spark.functions.text import lang_id

    rows = [
        (1, "the cat sat in the corner of the room and it looked at the door", "en"),
        (2, "el perro corre por la calle y un gato duerme en la casa de los vecinos", "es"),
        (3, "le chien et le chat dorment dans la maison des voisins et du jardin", "fr"),
        (4, "der hund und die katze schlafen in der wohnung mit den kindern auf dem sofa", "de"),
        (5, "我 是 一 个 人 他 在 有 不 了 的 地方", "zh"),
        (6, "zzzqq wwxyz blorp fnord glemp", "und"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows], "id long, text string")
    got = {r.id: r.lang for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert got == {i: lang for i, _, lang in rows}


def test_repetition_filter_matches_from_spec_python_model(spark):
    """q_repetition_filter vs the Gopher-rule definitions (Rae et al. 2021
    §A1.1) computed in pure python from raw text: top-token fraction,
    top-bigram fraction, distinct-token ratio, and the thresholded keep
    verdict (≤0.2 / ≤0.4 / ≥0.3).  An inverted threshold or a swapped
    numerator would keep exactly the garbage the filter exists to drop —
    and the mirrored oracle would agree with it."""
    from collections import Counter

    from ironbeam_spark.suite import QUERIES

    docs = {
        r.doc_id: _ws_tokens(r.text)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    want = {}
    for did, toks in docs.items():
        if not toks:
            continue
        uni = Counter(toks)
        bigrams = Counter(" ".join(p) for p in zip(toks, toks[1:]))
        ttf = max(uni.values()) / len(toks)
        tbf = (max(bigrams.values()) / sum(bigrams.values())) if bigrams else 0.0
        dfr = len(uni) / len(toks)
        want[did] = (
            len(toks), ttf, tbf, dfr,
            ttf <= 0.2 and tbf <= 0.4 and dfr >= 0.3,
        )
    got = {
        r.doc_id: (r.n_tokens, r.top_token_frac, r.top_bigram_frac,
                   r.distinct_frac, r.keep)
        for r in QUERIES["q_repetition_filter"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for did, (n, ttf, tbf, dfr, keep) in want.items():
        gn, gttf, gtbf, gdfr, gkeep = got[did]
        assert gn == n and gkeep == keep, (did, got[did], want[did])
        for g, w in ((gttf, ttf), (gtbf, tbf), (gdfr, dfr)):
            assert abs(g - w) < 1e-12, (did, g, w)
    # the verdict must actually discriminate on this corpus
    assert any(k for *_, k in want.values())


def test_training_mix_and_split_deliver_their_rates(spark):
    """Empirical rate contract for the md5-priority recipe steps (their
    oracles mirror the same CASE-chain arithmetic, so a swapped source
    weight or an inverted threshold would stay green there): per-source
    keep fraction ≈ the requested weight, split fractions ≈ train/val/test,
    unknown sources dropped at default_weight=0.  4000 keys per source ⇒
    binomial σ ≤ 0.008, bounds set at >5σ."""
    from collections import Counter

    from ironbeam_spark.operators.sampling import train_val_test_split, training_mix

    rows = [(f"{src}-{i}", src) for src in ("web", "books", "code", "mystery")
            for i in range(4000)]
    df = spark.createDataFrame(rows, "key string, source string")
    weights = {"web": 0.1, "books": 1.0, "code": 0.5}
    kept = Counter(
        r.source for r in training_mix(df, "source", weights, 7, "key").collect()
    )
    assert kept["books"] == 4000          # weight 1.0 keeps everything
    assert "mystery" not in kept          # default_weight=0 drops unknowns
    assert abs(kept["web"] / 4000 - 0.1) < 0.05, kept["web"]
    assert abs(kept["code"] / 4000 - 0.5) < 0.05, kept["code"]

    splits = Counter(
        r.split for r in train_val_test_split(df, "key", 11).collect()
    )
    n = len(rows)
    assert abs(splits["train"] / n - 0.8) < 0.03, splits
    assert abs(splits["val"] / n - 0.1) < 0.03, splits
    assert abs(splits["test"] / n - 0.1) < 0.03, splits
