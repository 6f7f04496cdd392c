"""BPE tokenizer induction: trainer equivalence with the classic
pure-Python reference algorithm (Sennrich et al. 2016), deterministic
tie-breaks, merge-fold semantics, and segmentation counts."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from ironbeam_spark.operators.bpe import EOW, apply_merge_expr, bpe_segment, bpe_train


def _ref_train(corpus: list[str], num_merges: int, min_count: int = 2):
    hist = Counter(w for t in corpus for w in t.split() if w)
    vocab = {w: list(w) + [EOW] for w in hist}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += hist[w]
        if not pc:
            break
        m = max(pc.values())
        pair = sorted(p for p, c in pc.items() if c == m)[0]
        if pc[pair] < min_count:
            break
        merges.append(pair)
        a, b = pair
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab, hist


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "lowest lowest newest wide wide",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)), "doc_id long, text string")
    got = bpe_train(df, "text", 16)
    want, _, _ = _ref_train(CORPUS, 16)
    assert got == want and len(got) > 8


def test_bpe_train_deterministic_across_partitionings(spark):
    df1 = spark.createDataFrame(list(enumerate(CORPUS)), "doc_id long, text string")
    df8 = df1.repartition(8)
    assert bpe_train(df1, "text", 10) == bpe_train(df8, "text", 10)


def test_apply_merge_expr_left_to_right_nonoverlapping(spark):
    """'a a a' under merge (a, a) -> ['aa', 'a'] — the standard greedy
    semantics; also merge at array end and no-match passthrough."""
    rows = [
        (["a", "a", "a"], ["aa", "a"]),
        (["a", "a", "a", "a"], ["aa", "aa"]),
        (["x", "a", "a"], ["x", "aa"]),
        (["a", "b"], ["a", "b"]),
        (["a"], ["a"]),
        ([], []),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _) in enumerate(rows)],
        "i long, syms array<string>",
    )
    got = {
        r.i: r.out
        for r in df.select(
            "i", apply_merge_expr(F.col("syms"), "a", "a").alias("out")
        ).collect()
    }
    for i, (_, want) in enumerate(rows):
        assert got[i] == want, (i, got[i], want)


def test_bpe_segment_counts_match_reference_vocab(spark):
    """Segmenting the training corpus with the trained merges reproduces
    the reference trainer's final per-word symbol sequences."""
    df = spark.createDataFrame(list(enumerate(CORPUS)), "doc_id long, text string")
    merges = bpe_train(df, "text", 16)
    _, vocab, _ = _ref_train(CORPUS, 16)
    out = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.first_tokens)
        for r in bpe_segment(df, "doc_id", "text", merges).collect()
    }
    for i, text in enumerate(CORPUS):
        ws = text.split()
        want_tokens = sum(len(vocab[w]) for w in ws)
        assert out[i][0] == len(ws)
        assert out[i][1] == want_tokens, (i, out[i], want_tokens)
        assert out[i][2] == "|".join(vocab[ws[0]])


def test_bpe_registry_query_runs(spark):
    from ironbeam_spark.suite import QUERIES

    out = QUERIES["q_bpe_tokenize"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r.n_bpe_tokens >= r.n_words  # every word is >= 1 token


def test_bpe_empty_and_degenerate_corpora(spark):
    """Empty corpus -> no merges; single-char words still terminate with
    the (char, </w>) merge; num_merges=0 is a no-op; segmentation with an
    empty merge table is pure char+EOW."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(empty, "text", 5) == []

    tiny = spark.createDataFrame([(0, "a a a b")], "doc_id long, text string")
    merges = bpe_train(tiny, "text", 5)
    assert ("a", EOW) in merges  # the only pair with count >= 2

    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    assert bpe_train(df, "text", 0) == []
    seg = bpe_segment(df, "doc_id", "text", []).collect()[0]
    assert (seg.n_words, seg.n_bpe_tokens) == (2, 6)  # a|b|</w> twice
    assert seg.first_tokens == "a|b|" + EOW
