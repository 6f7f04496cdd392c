"""Text-analysis operators for LLM training-data pipelines (north-star
extension — BASELINE.json: beyond the reference surface).

All operators are pure Catalyst expressions (no Python UDFs): tokenization,
token counting, language ID, quality scoring, and fingerprinting run inside
whole-stage codegen and scale linearly with no shuffle.  Determinism rules:
counts are ints, every ratio is a single int/int division, and hashes are
md5-based (identical in any engine), so a SQL oracle can mirror them exactly.
"""

from __future__ import annotations

from ironbeam_spark.plancache import memo_expr
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_scores",
    "lang_id",
    "md5_fingerprint",
    "scrub_pii",
    "PII_PATTERNS",
    "rolling_fingerprint",
    "winnow_fingerprints",
    "token_int",
    "STOPWORDS",
]

# Deterministic per-language stopword lists (tiny on purpose: the heuristic
# must be expressible identically in the SQL oracle).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "de": ("der", "die", "das", "und", "in", "von", "zu", "mit", "den", "auf"),
    "zh": ("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"),
}

# BPE-ish pre-tokenizer: words / numbers / single non-space symbols.  Kept to
# constructs with identical semantics in Java regex and RE2 so the oracle can
# reuse the pattern verbatim.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@memo_expr
def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != "")


@memo_expr
def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


@memo_expr
def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via regex pre-tokenization (cheap proxy for a
    BPE tokenizer's sequence length)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("long")


@memo_expr
def punct_ratio(col: Column | str) -> Column:
    """punctuation chars / total chars — single int/int division."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    return n_punct.cast("double") / F.length(c).cast("double")


@memo_expr
def stopword_count(col: Column | str, lang: str = "en") -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(words, t))).cast("long")


@memo_expr
def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    return stopword_count(col, lang).cast("double") / token_count(col).cast("double")


@memo_expr
def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality score: mean word length band + punctuation band
    + non-empty band.  Deterministic: integer comparisons, fixed weights.
    The token count is let-bound — it feeds four comparisons, and un-bound
    each would re-tokenize the row."""
    from ironbeam_spark.functions.hof import let_

    c = F.col(col) if isinstance(col, str) else col

    def build(n_tok: Column) -> Column:
        mean_wlen = (F.length(c) - n_tok + 1).cast("double") / n_tok.cast("double")
        return (
            F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
            + F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), F.lit(0.4)).otherwise(F.lit(0.0))
            + F.when(punct_ratio(c) <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        )

    return let_(token_count(c), build)


@memo_expr
def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts."""
    return {lang: stopword_count(col, lang) for lang in STOPWORDS}


@memo_expr
def lang_id(col: Column | str) -> Column:
    """Predicted language = argmax stopword score, ties broken by fixed
    priority order (en, es, fr, de, zh) — a CASE chain, so the oracle can
    mirror it verbatim.  'und' (undetermined) when every score is 0.

    Both the token array and the 5-score array are let-bound (see
    :func:`ironbeam_spark.functions.hof.let_`): the CASE chain reads each
    score O(langs) times, and un-bound references would tokenize + scan the
    stopword lists O(langs²) times per row."""
    from ironbeam_spark.functions.hof import let_

    langs = list(STOPWORDS)

    def build(toks: Column) -> Column:
        def count_for(words: tuple[str, ...]) -> Column:
            # single-arg lambda only: PySpark binds 2-arg lambdas as
            # (elem, index), so the word list must be closed over, not
            # passed as a default argument
            arr = F.array(*[F.lit(w) for w in words])
            return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")

        counts = F.array(*[count_for(words) for words in STOPWORDS.values()])

        def choose(s: Column) -> Column:
            case = None
            for i, lang in enumerate(langs):
                cond = F.get(s, i) > 0
                for j in range(i + 1, len(langs)):
                    cond = cond & (F.get(s, i) >= F.get(s, j))
                case = F.when(cond, F.lit(lang)) if case is None else case.when(cond, F.lit(lang))
            return case.otherwise(F.lit("und"))

        return let_(counts, choose)

    return let_(tokens(col), build)


@memo_expr
def md5_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of lowercased trimmed text (exact-dup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


def token_int(tok: Column, bits_hex: int = 12) -> Column:
    """Deterministic 48-bit integer hash of a token: first 12 hex chars of
    md5, parsed base-16.  Identical in DuckDB: ('0x'||substr(md5(t),1,12))::BIGINT."""
    return F.conv(F.substring(F.md5(tok), 1, bits_hex), 16, 10).cast("long")


@memo_expr
def rolling_fingerprint(col: Column | str, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over tokens: fold acc = (acc*31 + h(tok)) % mod.
    Sequential left-fold — same order in any engine, overflow-free in int64."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + token_int(t)) % F.lit(mod),
    )


@memo_expr
def winnow_fingerprints(col: Column | str, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS algorithm; public).  Hash every character
    ``k``-gram, slide a window of ``w`` consecutive gram hashes, keep the
    minimum of each window, return the sorted distinct kept values.

    Guarantee (value form): any substring shared by two documents of length
    ≥ ``w + k − 1`` covers at least one full window in each, and both
    windows select the same minimum hash — so the documents share a
    fingerprint.  Selecting VALUES (not positions) keeps the guarantee
    while making ties irrelevant, and the expected density is 2/(w+1) of
    the gram count — a tunable, content-defined sample of the document.

    Short inputs: fewer than ``w`` grams (but ≥ 1) yield the single global
    minimum; fewer than ``k`` characters yield an empty array (consistent
    with the shingle producers' short-text guard).

    All-codegen-free arithmetic (md5 + slice + array_min) mirrored exactly
    in DuckDB SQL — see ``q_winnow_fingerprints``."""
    from ironbeam_spark.functions.hof import let_

    c = F.col(col) if isinstance(col, str) else col
    gram_hashes = F.when(
        F.length(c) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(k - 1)),
            lambda i: token_int(F.substring(c, i, k)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    def build(hs: Column) -> Column:
        g = F.size(hs)
        window_mins = F.transform(
            F.sequence(F.lit(1), g - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(hs, j, w)),
        )
        return F.when(g >= w, F.array_sort(F.array_distinct(window_mins))).otherwise(
            F.when(g > 0, F.array(F.array_min(hs))).otherwise(
                F.array().cast("array<bigint>")
            )
        )

    return let_(gram_hashes, build)


# PII patterns kept to constructs with identical Java-regex/RE2 semantics so
# the DuckDB oracle reuses them verbatim (same discipline as BPE_ISH_PATTERN)
PII_PATTERNS = (
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\b\\d{13,16}\\b", "<CARDNUM>"),
)


@memo_expr
def scrub_pii(col: Column | str) -> Column:
    """Redact emails / IPv4 addresses / 13-16-digit numbers with typed
    placeholder tags — the standard pre-training text-cleaning pass, pure
    codegen ``regexp_replace`` chain (north-star text analysis)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c
