"""Greedy k-center selection (farthest-point traversal) — diverse coreset
selection over an embedding corpus (Gonzalez, "Clustering to minimize the
maximum intercluster distance", TCS 1985 — public paper; the classic
2-approximation for the k-center objective).

No reference analogue; the data-curation primitive the ANN/dedup family
doesn't cover: pick k examples that COVER the embedding space (maximally
spread), the standard recipe for diverse few-shot pools, eval-set
seeding, and coreset-based training-data selection.

Scale shape — k rounds, each round exactly:

1. ONE narrow expression pass updating the running nearest-selected
   distance: ``mind = least(mind, dist(vec, newest_center))`` — the
   newest center rides as a literal (one 64-float literal per round, not
   per row), so no join and no shuffle;
2. ONE ``TakeOrdered(1)`` arg-max (``orderBy(desc(mind), id).limit(1)``)
   — the only data leaving the executors is the single winner row.

Lineage across rounds is truncated by ``CheckpointPolicy`` (same
machinery as PageRank / connected components), so round r's plan never
replays rounds 1..r-1.  Total cost O(k · n · d); never quadratic in n.

Exactness: distance is ``1 - cosine`` with the module-standard
double-widened sequential folds, the winner tie-breaks on the lower id,
and the selection replays bit-exactly in a recursive-CTE DuckDB oracle
(``q_kcenter``) — an ITERATIVE algorithm with an exact value oracle
(contrast BPE induction, which is rows-only by nature).

Precondition: vectors must be non-degenerate (cosine is undefined for
zero-norm/empty vectors and raises under Spark 4's ANSI mode — fail
fast, don't silently rank garbage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ironbeam_spark.functions.vectors import cosine

__all__ = ["kcenter_select"]


def kcenter_select(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Greedy k-center: returns a k-row DataFrame ``(sel_rank long,
    {id_col}, dist double)`` — selection order, chosen id, and the
    coverage radius at selection time (the max nearest-selected distance;
    NULL for the rank-0 seed, non-increasing thereafter).  Seed = lowest
    id; ties on distance break to the lower id."""
    from ironbeam_spark.operators.checkpoint import CheckpointPolicy

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    seed_rows = base.orderBy("_id").limit(1).collect()
    if not seed_rows:
        raise ValueError("kcenter_select: empty corpus")
    policy = CheckpointPolicy.every_n(checkpoint_every)
    selected = [(0, seed_rows[0]._id, None)]
    center = [float(x) for x in seed_rows[0]._v]
    state = base  # gains a running ``_mind`` column after round 1
    for r in range(1, k):
        d_new = F.lit(1.0) - cosine(
            F.col("_v"), F.array(*[F.lit(x) for x in center])
        )
        mind = d_new if r == 1 else F.least(F.col("_mind"), d_new)
        state = policy.checkpoint(state.withColumn("_mind", mind))
        sel_ids = [s[1] for s in selected]
        win = (
            state.where(~F.col("_id").isin(sel_ids))
            .orderBy(F.col("_mind").desc(), F.col("_id"))
            .limit(1)
            .collect()
        )
        if not win:
            break  # k exceeds the corpus size: return what exists
        selected.append((r, win[0]._id, float(win[0]._mind)))
        center = [float(x) for x in win[0]._v]
    out = corpus.sparkSession.createDataFrame(
        selected, f"sel_rank long, {id_col} long, dist double"
    )
    return out.orderBy("sel_rank")
