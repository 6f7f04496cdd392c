"""Corpus-wide line-level deduplication (C4 / MassiveText style).

The named pipeline step from the C4 (Raffel et al. 2020) and MassiveText
(Rae et al. 2021) cleaning recipes — public papers: an exact duplicate of a
LINE (not a whole document, not an n-gram window) is removed everywhere but
its canonical first occurrence, corpus-wide.  Boilerplate (navigation bars,
cookie banners, license footers) duplicates at line granularity long before
whole documents do, so this pass removes text that whole-doc and even
minhash dedup never touch.  No reference analogue (the reference's only
dedup is exact whole-row ``distinct``, src/helpers/distinct.rs); sibling of
``operators/substring.py`` (token n-gram form) and ``operators/dedup.py``
(whole-doc forms).

Scale shape — identical to the substring scrub's, and for the same reasons:

1. ``split(text, sep)`` + ``posexplode`` → ``(id, pos, line)`` — linear,
   expression-only, no Python.
2. Winner per distinct line: ONE map-side-combinable
   ``groupBy(md5(line)).agg(min(packed id·2^24+pos))``.  Pack, don't
   struct-min: a plain int64 min partial-aggregates before the shuffle, so
   a boilerplate line with 10^8 occurrences combines down to one row per
   map task instead of hot-keying a reducer.
3. ONE hash join back on the md5 key marks survivors (``pk == winner``).
   A hot line is a 1:N join against its single winner row — no pair
   blow-up.
4. Per-document reassembly: ``collect_list(struct(pos, line))`` →
   ``array_sort`` → ``array_join`` — state bounded by document length,
   never corpus size.

Cost: one explode, one combinable aggregate, one equi-join, one per-doc
groupBy.  Every shuffle key is a 128-bit content hash or the document id.
At 100 TB this is the same plan class as the exact-dedup pass, ~2 shuffles
over the line stream.

Semantics pinned for cross-engine exactness (the DuckDB oracle mirrors each
expression verbatim):

- lines split on an exact separator (default ``\\n``), trailing empties
  kept (``split(limit=-1)`` / DuckDB ``string_split`` agree);
- lines shorter than ``min_chars`` characters are EXEMPT — always kept,
  never counted as duplicates (default 1: empty lines survive; raise it to
  spare short common lines like list bullets);
- the winner is the globally first occurrence in ``(id, pos)`` order,
  packed as ``id * 2^24 + pos`` (documents capped at 2^24 lines, ids at
  2^39 — enforced per row by ``substring.packed_occurrence``);
- a document that loses every line keeps its row with empty text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ironbeam_spark.operators.substring import packed_occurrence


def _lit_rx(sep: str) -> str:
    """Quote ``sep`` for F.split, which treats its pattern as a Java regex:
    ``\\Q...\\E`` literal quoting (java.util.regex.Pattern.quote), with
    embedded ``\\E`` handled — so a '|' or '.' separator splits literally,
    matching the docstring contract and the oracle's literal string_split."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"

__all__ = ["line_occurrences", "line_dedup_keep_first"]


def line_occurrences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """``(id, pos, line)`` — one row per line per document, 0-based
    position, trailing empty lines kept."""
    lines = F.split(F.col(text_col), _lit_rx(sep), -1)
    return docs.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )


def line_dedup_keep_first(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Remove every duplicate line corpus-wide except its first occurrence.

    Returns one row per input document:
    ``id, n_lines, n_removed, text_clean`` (lines re-joined with ``sep``
    in original order).
    """
    occ = line_occurrences(docs, id_col, text_col, sep)
    eligible = occ.where(F.length("line") >= min_chars).select(
        id_col,
        "pos",
        "line",
        F.md5("line").alias("k"),
        packed_occurrence(id_col, "pos").alias("pk"),
    )
    # one combinable aggregate: the corpus-wide first occurrence per line
    winners = eligible.groupBy("k").agg(F.min("pk").alias("w"))
    # survivors: exempt (short) lines unconditionally + the winner copy
    kept_eligible = (
        eligible.join(winners, on="k")
        .where(F.col("pk") == F.col("w"))
        .select(id_col, "pos", "line")
    )
    kept = occ.where(F.length("line") < min_chars).unionByName(kept_eligible)
    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("text_clean"),
    )
    # NULL text contributes no occurrence rows (posexplode of NULL emits
    # nothing), so count it as 0 lines — F.size(NULL) is -1 under Spark's
    # legacy sizeOfNull and would report n_lines = n_removed = -1
    n_lines = (
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.col(text_col), _lit_rx(sep), -1)))
        .cast("long")
    )
    return (
        docs.select(id_col, n_lines.alias("n_lines"))
        .join(agg, on=id_col, how="left")
        .select(
            id_col,
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
