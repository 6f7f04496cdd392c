"""Deterministic shard export: seeded pseudo-shuffle + balanced assignment.

The last step of every large-scale training-data pipeline: write the
corpus as N roughly-equal shards in a DETERMINISTIC shuffled order, so
(a) a training run streams shards without a data-order bias toward crawl
/ source locality, and (b) the exact same shard layout is reproducible
from the same seed for resumption and auditing.  No reference analogue
(the reference stops at `write_parquet`'s hive partitioning); this is a
beyond-reference operator in the training-pipeline family, alongside
token packing (`operators/scan.pack_layout`) and the train/val/test
split (`operators/sampling.py`).

Design — three composed pieces, every one a deterministic expression:

1. **Seeded affine permutation key** (`deterministic_shuffle_key`):
   ``key(id) = (a * (id mod p) + b(seed)) mod p`` with
   ``p = 2^61 - 1`` (Mersenne prime).  An affine map over Z_p with
   ``a != 0`` is a BIJECTION, so ids below p never collide — this is a
   real permutation, not a hash with accidental ties (ids >= p or
   negative ids reduce mod p first and may collide; the downstream
   order tiebreaks on the id itself, so the order stays total).  The
   arithmetic is exact in both engines: operands stay under 37 decimal
   digits, inside Spark DECIMAL(38,0) and DuckDB HUGEINT.  NOT a
   cryptographic shuffle — a documented, seedable de-clustering
   permutation (the standard trade for reproducible data orders).
2. **Global running size** (`operators/scan.global_running_sum`): the
   inclusive prefix sum of the size column in ``(key, id)`` order —
   the two-level bucketed scan, one wide shuffle, no global
   single-partition window.
3. **Shard arithmetic** (`operators/scan.pack_layout`): ``shard_id =
   start DIV capacity`` — a document belongs to the shard its first
   unit lands in, so shard sizes vary by at most one document around
   ``capacity`` (the standard approximation; an exact greedy fill is a
   sequential recurrence that cannot be expressed as a parallel scan).

At 100 TB: one expression-only projection, ONE wide shuffle (the scan's
bucket exchange), and a write repartitioned by ``shard_id``.  Nothing
collects to the driver; the permutation spreads adjacent input ids
across the full key range, so the scan's equal-width buckets stay
balanced no matter how clustered the input ids are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "AFFINE_P",
    "deterministic_shuffle_key",
    "shard_assignment",
    "write_shards",
    "affine_params",
]

AFFINE_P = (1 << 61) - 1  # Mersenne prime 2305843009213693951
# Knuth/PCG LCG multiplier, pre-reduced mod AFFINE_P (6364136223846793005
# mod p); fixed across seeds — the seed rotates b, giving a seeded family
# of permutations with one well-mixed multiplier
_AFFINE_A = 6364136223846793005 % AFFINE_P
_AFFINE_B_MIX = 1442695040888963407  # the matching LCG increment


def affine_params(seed: int) -> tuple[int, int, int]:
    """``(a, b, p)`` for the seed — host-side exact ints, usable verbatim
    in an oracle SQL literal."""
    return _AFFINE_A, (seed * _AFFINE_B_MIX) % AFFINE_P, AFFINE_P


def deterministic_shuffle_key(
    df: DataFrame, id_col: str, seed: int = 0, out_col: str = "shuffle_key"
) -> DataFrame:
    """Append ``out_col`` = the seeded affine permutation of ``id_col``
    over Z_p (module docstring).  Exact decimal arithmetic: id mod p is
    19 digits, times the 19-digit multiplier is <= 37 digits — inside
    DECIMAL(38,0), no rounding anywhere."""
    a, b, p = affine_params(seed)
    dt = df.schema[id_col].dataType.simpleString()
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"deterministic_shuffle_key requires an integral id column, got {dt}"
        )
    idm = F.pmod(F.col(id_col), F.lit(p))  # bigint, in [0, p)
    key = F.pmod(
        idm.cast("decimal(38,0)") * F.lit(a).cast("decimal(38,0)")
        + F.lit(b).cast("decimal(38,0)"),
        F.lit(p).cast("decimal(38,0)"),
    ).cast("long")
    return df.withColumn(out_col, key)


def shard_assignment(
    df: DataFrame,
    id_col: str,
    size_col: str,
    shard_capacity: int,
    seed: int = 0,
    n_buckets: int = 4096,
) -> DataFrame:
    """Append ``shuffle_key``, ``shard_id``, ``offset_in_shard``: the
    deterministic shard layout for a corpus of sized documents.

    Rows are ordered by ``(shuffle_key, id)`` (total — the id tiebreak
    covers permutation collisions for out-of-range ids), sizes prefix-
    summed with the two-level parallel scan, and each row assigned to the
    shard its first unit lands in.  ``size_col`` must be a non-negative
    integral column (a negative size would corrupt every later offset;
    the guard raises mid-job rather than mis-sharding silently).
    """
    if shard_capacity < 1:
        raise ValueError("shard_capacity must be positive")
    from ironbeam_spark.operators.scan import global_running_sum, pack_layout

    guarded = df.withColumn(
        size_col,
        F.when(F.col(size_col) >= 0, F.col(size_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"shard_assignment: negative {size_col}: "),
                    F.col(size_col).cast("string"),
                )
            )
        ),
    )
    keyed = deterministic_shuffle_key(guarded, id_col, seed)
    scanned = global_running_sum(
        keyed,
        ["shuffle_key", id_col],
        size_col,
        "__shard_cum",
        n_buckets=n_buckets,
    )
    laid = pack_layout(scanned, size_col, "__shard_cum", shard_capacity)
    return laid.select(
        *df.columns,
        "shuffle_key",
        F.col("pack_id").alias("shard_id"),
        F.col("offset_in_pack").alias("offset_in_shard"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
) -> None:
    """Write a :func:`shard_assignment` result as one directory per shard
    (``shard_id=N/``), each shard's rows sorted by their in-shard offset.
    The repartition is ON shard_id, so all of a shard's rows land in one
    task and each shard directory holds ONE file — the layout training
    loaders expect.  (A task may write several shards when there are more
    shards than partitions; each still gets its own single file.)

    The one-file guarantee requires ``spark.sql.files.maxRecordsPerFile``
    to be unset/0 (the default): a nonzero value makes Spark split a
    task's output into multiple files per shard directory, silently
    breaking the advertised layout — so this function asserts it and
    raises up front rather than write a layout the loader can't stream.
    """
    for c in ("shard_id", "offset_in_shard"):
        if c not in df.columns:
            raise ValueError(f"write_shards input missing {c!r} — "
                             "run shard_assignment first")
    max_rec = df.sparkSession.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    if str(max_rec) not in ("0", "", "None"):
        raise ValueError(
            "write_shards: spark.sql.files.maxRecordsPerFile="
            f"{max_rec} would split a shard directory into multiple files, "
            "breaking the one-file-per-shard layout — unset it (or set 0) "
            "before writing shards"
        )
    (
        df.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "offset_in_shard")
        .write.partitionBy("shard_id")
        .format(fmt)
        .mode(mode)
        .save(path)
    )
