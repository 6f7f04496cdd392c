"""Deterministic seeded sampling (reference §2.6 sampling,
``src/combiners/sampling.rs:12-188``, ``src/helpers/sampling.rs``).

The reference's ``PriorityReservoir`` is Efraimidis–Spirakis A-ExpJ with a
SplitMix64-seeded RNG: every element gets a priority, the sample is the top-k
by priority, and the same seed yields the same sample under sequential or
parallel execution.  We reproduce that *contract* (fixed-size, seed-
deterministic, execution-order-independent) with a distributed-friendly
priority:

    priority(row) = md5(seed || '|' || key)

Top-k by (priority, key) compiles to ``TakeOrderedAndProject`` — per-partition
bounded heaps + driver merge, O(n log k), no full sort, no shuffle of the
data.  Unit-weight A-ExpJ is exactly "top-k by a per-element hash-random
priority", so the statistical behavior matches; the bitstream differs from
SplitMix64 (declared engine-local determinism, SURVEY §7 hard-list item 1 —
exact bit-parity with the Rust RNG is not a portable contract).  Bonus over
the reference: the priority is *content-keyed*, so the sample is stable under
repartitioning, insertion order, and engine version.

``sample_fraction`` is the Bernoulli variant: keep iff the first 12 hex chars
of the priority, as a 48-bit integer, fall below ``fraction · 2^48`` — pure
filter, no ordering, no state, mirrors to SQL exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["priority", "sample_reservoir", "sample_fraction", "sample_per_key", "training_mix", "train_val_test_split"]


def priority(seed: int, key: Column) -> Column:
    """Deterministic per-element priority: md5 over (seed, element key)."""
    return F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string")))


def sample_reservoir(
    df: DataFrame, k: int, seed: int, key_col: str
) -> DataFrame:
    """Fixed-size deterministic sample (reference ``sample_reservoir(k, seed)``,
    ``src/helpers/sampling.rs:43``)."""
    p = priority(seed, F.col(key_col))
    return (
        df.withColumn("_priority", p)
        .orderBy(F.col("_priority"), F.col(key_col))
        .limit(k)
        .drop("_priority")
    )


def sample_per_key(
    df: DataFrame, k: int, seed: int, keys: list[str], id_col: str
) -> DataFrame:
    """Per-key fixed-size sample (reference ``sample_per_key``,
    ``src/helpers/sampling.rs:164``): window row_number over the hash
    priority — one shuffle, bounded per-group state."""
    from pyspark.sql import Window as W

    p = priority(seed, F.col(id_col))
    w = W.partitionBy(*keys).orderBy(p, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_fraction(df: DataFrame, fraction: float, seed: int, key_col: str) -> DataFrame:
    """Deterministic Bernoulli sample (reference ``sample_globally``,
    ``src/helpers/sampling.rs:90``): pure filter on the hash priority, no
    state — the scale path for 'give me ~0.1% of 100 TB'."""
    threshold = int(fraction * (1 << 48))
    h48 = F.conv(F.substring(priority(seed, F.col(key_col)), 1, 12), 16, 10).cast("long")
    return df.where(h48 < F.lit(threshold))


def training_mix(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    seed: int,
    key_col: str,
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic dataset mixing for training pipelines: keep each row
    with its source's sampling rate — a per-source Bernoulli on the same
    stateless md5 priority as :func:`sample_fraction`, so the mix is exactly
    reproducible under any partitioning and re-run.

    This is the standard "recipe" step of assembling a training corpus
    (web 10%, books 100%, code 50%, …) expressed as one codegen filter:
    no shuffle, no state, embarrassingly parallel over 100 TB.  Unknown
    sources fall back to ``default_weight`` (0 ⇒ dropped).
    """
    two48 = 1 << 48
    thr = F.lit(int(default_weight * two48)).cast("long")
    for src, w in sorted(weights.items()):
        thr = F.when(F.col(source_col) == src, F.lit(int(w * two48)).cast("long")).otherwise(thr)
    h48 = F.conv(F.substring(priority(seed, F.col(key_col)), 1, 12), 16, 10).cast("long")
    return df.where(h48 < thr)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    seed: int,
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the corpus-freeze step of a
    training pipeline.  Each row's bucket is its stateless md5 priority
    (same family as :func:`sample_fraction`): reproducible under any
    partitioning, any re-run, any engine (the SQL oracle applies the same
    arithmetic), and rows with the same ``key_col`` always land in the same
    split — which is what prevents leakage when the key is a content hash
    or document id.  One codegen projection: no shuffle, no state.

    ``train`` and ``val`` are fractions of the 48-bit hash space; the rest
    is test.  Returns ``df`` plus ``split_col`` ∈ {'train','val','test'}."""
    if not (0 < train < 1 and 0 <= val < 1 and train + val < 1):
        raise ValueError(f"invalid split fractions train={train} val={val}")
    two48 = 1 << 48
    h48 = F.conv(F.substring(priority(seed, F.col(key_col)), 1, 12), 16, 10).cast("long")
    t_thr = F.lit(int(train * two48)).cast("long")
    v_thr = F.lit(int((train + val) * two48)).cast("long")
    split = (
        # explicit null-key policy: concat_ws would silently hash a null key
        # as the bare seed (co-assigning ALL null keys to one seed-dependent
        # split), while the SQL mirror's '||' yields NULL -> CASE falls to
        # 'test'.  Pin the SQL behavior so both engines agree.
        F.when(F.col(key_col).isNull(), F.lit("test"))
        .when(h48 < t_thr, F.lit("train"))
        .when(h48 < v_thr, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, split)
