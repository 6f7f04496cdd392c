"""Edit-distance (Levenshtein) similarity self-join via q-gram prefix
filtering — the ED-Join plan (Xiao, Wang & Lin, VLDB 2008; public paper).

Finds every pair of strings within Levenshtein distance ``max_dist``
WITHOUT comparing all pairs.  No reference analogue (the reference's only
string matching is regex, src/helpers/regex.rs); sibling of the prefix-
filtered set-similarity join in ``operators/dedup.py`` (Jaccard form) —
this is the edit-distance form, the standard tool for entity resolution
(near-identical names/titles/URLs) in corpus cleaning.

Filter theory (both public-textbook results):

- COUNT FILTER: a string of length L has ``L - q + 1`` positional q-grams
  and one edit destroys at most ``q`` of them, so
  ``ed(a, b) <= d  ⇒  |grams(a) ∩ grams(b)| >= (L - q + 1) - q·d``
  (multiset intersection; occurrence-indexed tokens below make it a plain
  set intersection).
- PREFIX FILTER: order all tokens by a global total order (corpus
  frequency ascending — rare first), keep each string's first
  ``q·d + 1`` tokens; any pair meeting the count filter shares at least
  one PREFIX token.  Candidate generation is therefore an EQUI-JOIN on
  prefix tokens — rare tokens by construction, so postings are short and
  there is no hot-key blow-up from ubiquitous grams (a shared constant
  prefix like ``Customer#0000`` lands at the END of the frequency order
  and never generates candidates).

Scale shape: explode to tokens (linear, expression-only), ONE combinable
corpus frequency aggregate, occurrence-index + prefix-rank windows keyed
by string id (state bounded by string length), candidate equi-join on the
token key with ``|len(a) - len(b)| <= d`` as a residual, pair ``distinct``,
then ONE JVM-side ``levenshtein`` verify per surviving candidate.  Strings
ride along the token rows (they are name/title-scale); the long-text
variant would carry ids only and re-join — deliberately not built, the
substring/minhash family covers long text.

Precondition (fail-fast, not silent): every string must have at least
``q·d + 1`` q-grams, i.e. ``len >= q·(d + 1)`` — shorter strings admit
``ed <= d`` pairs sharing zero grams, which prefix filtering cannot see.
Route short strings to an exact block or raise; we raise mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["edit_distance_join"]


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
    q: int = 2,
) -> DataFrame:
    """All pairs ``(id1, id2, dist)`` with ``id1 < id2`` and
    ``dist = levenshtein(text1, text2) <= max_dist``.  Exact (the filters
    are lossless above the length precondition); ids must be orderable
    and unique per string."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    d = int(max_dist)
    min_len = q * (d + 1)
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(text_col).cast("int").alias("len"),
    ).where(
        # precondition guard as a filter (never optimized away): short
        # strings would silently miss matches, so fail the job instead
        F.when(F.col("len") >= min_len, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"edit_distance_join: string shorter than "
                        f"q*(max_dist+1)={min_len} chars (prefix filter "
                        f"unsound): id "
                    ),
                    F.col("id").cast("string"),
                )
            )
        )
    )
    # positional q-grams, then occurrence-indexed tokens (gram, occ):
    # k-th occurrence matches k-th occurrence, so set intersection of
    # tokens == multiset intersection of grams (count-filter semantics)
    toks = s.select(
        "id",
        "s",
        "len",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, length(s) - {q}), "
                f"i -> substring(s, i + 1, {q}))"
            )
        ).alias("pos", "gram"),
    ).withColumn(
        "occ",
        F.row_number().over(
            Window.partitionBy("id", "gram").orderBy("pos")
        ),
    )
    # global total order: corpus frequency of the token, rare first
    # (combinable aggregate; ties broken by token value for determinism)
    freq = toks.groupBy("gram", "occ").agg(F.count(F.lit(1)).alias("tf"))
    prefix = (
        toks.join(freq, on=["gram", "occ"])
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy("tf", "gram", "occ")
            ),
        )
        .where(F.col("rk") <= q * d + 1)
        .select("id", "s", "len", "gram", "occ")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.occ") == F.col("b.occ"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.abs(F.col("a.len") - F.col("b.len")) <= d
            ),  # length filter as a join residual
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("a.s").alias("s1"),
            F.col("b.id").alias("id2"),
            F.col("b.s").alias("s2"),
        )
        .distinct()  # a pair may share several prefix tokens
    )
    return (
        cand.withColumn("dist", F.levenshtein("s1", "s2").cast("long"))
        .where(F.col("dist") <= d)
        .select("id1", "id2", "dist")
    )
