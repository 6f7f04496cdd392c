"""Positional inverted index and exact phrase search.

The retrieval primitive BM25/TF-IDF scoring can't answer: "which
documents contain this exact k-word phrase, and where?"  Classic
positional-postings design (public IR textbooks): the index is
``(term, doc, pos)`` postings; a k-term phrase match is k postings in the
same document at consecutive positions.  (No reference analogue — its
regex surface matches within a row, not across a tokenized corpus
index.)

Spark-first shape: the match is a (k-1)-way EQUI-join — posting ``i``
joins on ``(doc_id, pos - i)`` so every term's postings align onto the
phrase's would-be start position.  No window functions, no arrays of
positions collected per doc (a stopword's posting list at 100 TB does
not fit a row), no cross products: each join key is (doc, position),
unique per posting, so even "the" joins 1:1 per position.  Filtering
each side to ITS phrase term before the join means the shuffled streams
are |postings-of-term| sized — the classic rarest-term bound applies
automatically once AQE sees the sizes.

Positions are 0-based over the whitespace tokenizer (``functions.text
.tokens``), lowercased — the same canonicalization the rest of the text
stack uses, so the index composes with dedup/scoring oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ironbeam_spark.functions.text import tokens

__all__ = ["positional_index", "phrase_search"]


def positional_index(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``(term, doc, pos)`` postings — one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "term"),
    ).select("term", "doc", "pos")


def phrase_search(
    index: DataFrame, phrase: Sequence[str]
) -> DataFrame:
    """``(doc, start_pos)`` of every exact occurrence of ``phrase``
    (already-canonicalized terms) against a :func:`positional_index`."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    out = None
    for i, t in enumerate(terms):
        side = index.where(F.col("term") == t).select(
            "doc", (F.col("pos") - F.lit(i)).alias("start_pos")
        )
        out = side if out is None else out.join(
            side, on=["doc", "start_pos"]
        )
    return out.where(F.col("start_pos") >= 0)
