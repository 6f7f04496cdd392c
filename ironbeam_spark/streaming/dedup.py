"""Streaming deduplication (Structured Streaming state-store dedup).

The batch-side dedup family (``operators/dedup.py``) answers "which rows
are duplicates in this corpus"; this module answers the ingestion-time
variant: "drop records already seen on the stream" — the shape a training-
data pipeline uses to keep an append-only corpus exact-dup-free as shards
arrive.

Two state-retention contracts, mirroring Spark's own API split:

- :func:`stream_distinct` — exact, unbounded state: every key ever seen is
  remembered (RocksDB-backed state store scales this beyond executor
  memory; still O(distinct keys) storage).  Use when the key universe is
  bounded (content hashes of a curated corpus).
- :func:`stream_dedup_within_watermark` — bounded state: duplicates are
  only suppressed while their event time is above the watermark; state for
  older keys is dropped.  This is the 100 TB-safe contract — state size is
  O(keys per watermark window) — at the cost of re-admitting a duplicate
  that recurs after the window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = [
    "stream_distinct",
    "stream_dedup_within_watermark",
    "stream_dedup_against_index",
]


def stream_distinct(sdf: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact streaming distinct on ``cols`` (unbounded state store).

    Emits each distinct key combination once (append semantics).  Selecting
    the key columns first keeps BOTH the state store and the output
    deterministic: full-row dedup would keep the arbitrary first-arriving
    row per key, which no batch oracle can reproduce."""
    return sdf.select(*cols).dropDuplicates(list(cols))


def stream_dedup_within_watermark(
    sdf: DataFrame,
    keys: Sequence[str],
    event_time_col: str,
    watermark: str,
) -> DataFrame:
    """Watermark-bounded streaming dedup: a duplicate arriving while its
    first occurrence's event time is still above the watermark is dropped;
    state older than the watermark is evicted (Spark's
    ``dropDuplicatesWithinWatermark``).  Keeps ALL columns of the first
    occurrence — callers needing deterministic replay should dedup on a
    content key and project it, as :func:`stream_distinct` does."""
    return sdf.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_dedup_against_index(
    sdf: DataFrame,
    index: DataFrame,
    corpus_shingles: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.2,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Streaming NEAR-dup admission check against a static corpus
    fingerprint index: the ingestion-time complement of
    :func:`~ironbeam_spark.operators.incremental.minhash_dedup_incremental`.

    ``sdf`` is a stream of ``(id, text)`` docs; ``index`` is the corpus's
    band-posting table (:func:`~ironbeam_spark.operators.incremental.
    minhash_index`) and ``corpus_shingles`` its verify companion
    (:func:`~ironbeam_spark.operators.incremental.minhash_verify_table`) —
    both STATIC DataFrames (reload + restart the query on corpus version
    bump).  Returns a streaming aggregate with one row per arriving doc
    that verifies (exact Jaccard >= ``threshold``) against at least one
    indexed doc: ``(id_col, dup_of long, jaccard_sim double)`` with
    ``dup_of`` = the minimum matching corpus id.  Docs absent from the
    output are new-to-corpus; run the result in ``update``/``complete``
    mode (it is a streaming groupBy).

    Scale shape: shingle/sign/band are per-row expressions on the
    micro-batch; candidates come from a stream-static equi-join on
    ``band_key`` (the index side is the big one — bucket or sort it on
    ``band_key`` at write time so the per-batch join prunes); the verify
    join touches only candidate corpus rows.  Stream-internal (new-vs-new)
    duplicates are out of contract here — stream-stream self-joins need
    watermark bounds the banding key doesn't have; compose with
    :func:`stream_distinct` on a content hash upstream, or run the batch
    operator over the landed delta.

    ``max_band_bucket`` applies :func:`~ironbeam_spark.operators.dedup.
    guard_band_buckets` to the STATIC index side only — a boilerplate
    cluster in the corpus index is the unbounded quadratic hazard here
    (every micro-batch doc landing in the hot bucket joins its full
    posting list); the stream side's per-bucket size is already bounded
    by the micro-batch, and counting it would add a second streaming
    aggregate the output mode can't carry.
    """
    from pyspark.sql import functions as F

    from ironbeam_spark.operators.dedup import (
        guard_band_buckets,
        jaccard,
        minhash_band_keys,
        minhash_signature_from_ints,
    )
    from ironbeam_spark.operators.incremental import _shingled, check_index_family

    if k % bands != 0:
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    # family stamp first: a stale persisted index (pre-r10 constants) must
    # fail the stream loudly, not run at near-zero recall
    index = check_index_family(index, "stream_dedup_against_index")
    if max_band_bucket is not None:
        index = guard_band_buckets(index, max_band_bucket, "index postings")
    # same projection+short-doc predicate as the index / verify-table build
    # (_shingled is the single definition — the stream-static join is only
    # sound if both sides shingle identically)
    shingled = _shingled(sdf, id_col, text_col, shingle_words).withColumnRenamed(
        "shingles", "_sh_new"
    )
    signed = shingled.select(
        F.col(id_col),
        F.col("_sh_new"),
        minhash_signature_from_ints(F.col("_sh_new"), k).alias("sig"),
    )
    # band keys per doc; the shingles ride along as payload so verify needs
    # no join back to the stream (that would be a stream-stream self-join)
    keys = minhash_band_keys(
        signed, id_col, "sig", bands, k // bands, payload_cols=("_sh_new",)
    )
    cands = keys.join(
        index.withColumnRenamed(id_col, "_old_id"), on="band_key"
    ).select(id_col, "_sh_new", "_old_id")
    verified = (
        cands.join(
            corpus_shingles.select(
                F.col(id_col).alias("_old_id"), F.col("shingles").alias("_sh_old")
            ),
            on="_old_id",
        )
        .withColumn("_j", jaccard(F.col("_sh_new"), F.col("_sh_old")))
        .where(F.col("_j") >= threshold)
    )
    return verified.groupBy(id_col).agg(
        F.min("_old_id").alias("dup_of"),
        F.min_by("_j", "_old_id").alias("jaccard_sim"),
    )
