"""Bigram language-model quality scoring (stupid backoff, rational form).

The perplexity-filter stage of CCNet / CC-quality pipelines (Wenzek et al.
2020 train a KenLM on clean text and keep documents whose perplexity is
low; public paper), re-expressed for exact cross-engine verification: train
bigram/unigram counts on a TARGET corpus, then score every document by the
mean per-token conditional probability under stupid backoff (Brants et al.
2007 — public paper: no discounting, a fixed ``alpha`` multiplier on the
backoff path, scores are proportional probabilities, not normalized ones).

Rational-probability trade, same family as ``q_bm25_rational`` /
``q_dsir_weights``: the classic filter thresholds mean LOG probability, but
``ln()`` differs by 1 ulp between JVM and DuckDB libm, so the score here is
the mean of the per-token probabilities themselves — every operation is a
correctly-rounded IEEE ``+ * /`` with pinned association, so the oracle
hash-matches bit for bit.  Ranking within the bigram-hit path is the same
monotone story as BM25's rational idf; the cross-path mix is a documented
scoring-family choice, not a bug.

Per token position ``i >= 2`` with current token ``w`` and predecessor
``v``:

- bigram hit:   ``p = c(v,w) / c(v)``                  (one division)
- backoff:      ``p = alpha * ((c(w) + 1) / (N + V))`` (add-one smoothed
  unigram; an OOV token hits the same formula with ``c(w) = 0``)

Doc score = sum of ``p`` folded in position order (deterministic
association both engines), plus the mean (one further division).

Scale shape — all linear, no Python anywhere:

1. Training: token/bigram explodes over the target + two map-side-
   combinable counts.  ONE bounded 1-row totals aggregate (``N``, ``V``)
   broadcast back — same class as the BM25 stats row.
2. Scoring: per-position ``(v, w)`` pairs explode linearly; three hash
   joins against the count tables (bigrams on the pair, unigrams on ``w``
   and on ``v``).  Count tables are vocabulary-sized, not corpus-sized;
   Spark/AQE picks broadcast vs shuffle per actual size — they are NOT
   force-broadcast here because a 100 TB corpus's bigram table can exceed
   driver memory.  A stopword ``v`` is a 1:N join against its single count
   row — no skew quadratics.
3. Per-doc fold: ``collect_list(struct(pos, p))`` bounded by document
   length, sorted, sequential ``F.aggregate`` sum.

No reference analogue (north-star quality-filter family; the reference has
no language-model surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ironbeam_spark.functions.text import tokens

__all__ = ["bigram_counts", "lm_score_stupid_backoff"]


def _pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, pos, v, w)`` — one row per token position >= 2 (1-based)."""
    ts = tokens(F.lower(F.col(text_col)))
    pair = F.transform(
        F.sequence(F.lit(1), F.size(ts) - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at(ts, i).alias("v"),
            F.element_at(ts, i + 1).alias("w"),
        ),
    )
    return docs.select(
        F.col(id_col),
        F.explode(F.when(F.size(ts) >= 2, pair).otherwise(F.array())).alias(
            "_p"
        ),
    ).select(id_col, "_p.pos", "_p.v", "_p.w")


def bigram_counts(target: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame]:
    """Train on the target corpus: ``(term, c_uni)`` and ``(v, w, c_big)``
    count tables (lowercased whitespace tokens)."""
    ts = tokens(F.lower(F.col(text_col)))
    uni = (
        target.select(F.explode(ts).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    big = (
        _pairs(target.select(F.lit(0).alias("_id"), text_col), "_id", text_col)
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c_big"))
    )
    return uni, big


def lm_score_stupid_backoff(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    alpha: float = 0.4,
) -> DataFrame:
    """Score every document under the trained counts.

    Returns ``id, n_scored, n_bigram_hits, n_oov, score_sum, score_mean``
    (docs with < 2 tokens: zeros and NULL mean)."""
    pairs = _pairs(docs, id_col, text_col)
    # ONE bounded totals row: N = target token count, V = vocab size
    totals = unigrams.groupBy().agg(
        F.sum("c_uni").cast("double").alias("_n"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    uni_w = unigrams.select(
        F.col("term").alias("w"), F.col("c_uni").alias("_cw")
    )
    uni_v = unigrams.select(
        F.col("term").alias("v"), F.col("c_uni").alias("_cv")
    )
    scored = (
        pairs.join(bigrams, on=["v", "w"], how="left")
        .join(uni_w, on="w", how="left")
        .join(uni_v, on="v", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "pos",
            F.col("c_big").isNotNull().alias("_hit"),
            F.col("_cw").isNull().alias("_oov"),
            F.when(
                F.col("c_big").isNotNull(),
                F.col("c_big").cast("double") / F.col("_cv").cast("double"),
            )
            .otherwise(
                F.lit(alpha)
                * (
                    (F.coalesce(F.col("_cw"), F.lit(0)) + F.lit(1)).cast(
                        "double"
                    )
                    / (F.col("_n") + F.col("_v"))
                )
            )
            .alias("_p"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.col("_hit").cast("long")).alias("n_bigram_hits"),
        F.sum(F.col("_oov").cast("long")).alias("n_oov"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("pos", "_p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_p"],
        ).alias("score_sum"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_scored"), F.lit(0)).cast("long").alias("n_scored"),
            F.coalesce(F.col("n_bigram_hits"), F.lit(0))
            .cast("long")
            .alias("n_bigram_hits"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce(F.col("score_sum"), F.lit(0.0)).alias("score_sum"),
            # explicit NULL (not IEEE NaN) for unscoreable docs — DuckDB
            # yields NULL on 0/0 where Spark doubles yield NaN
            F.when(
                F.col("n_scored") > 0,
                F.col("score_sum") / F.col("n_scored").cast("double"),
            ).alias("score_mean"),
        )
    )
