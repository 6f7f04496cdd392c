"""Order-invariant dataset fingerprints and keyed table diffs.

The validation primitives a 100 TB migration actually runs: "are these
two tables the same?" without sorting either (a global sort at that scale
is the most expensive thing you can do), and "what changed?" keyed, in
one shuffle.  (Deequ/data-diff territory — public tools; no reference
analogue.)

- :func:`dataset_fingerprint` — a COMMUTATIVE checksum: each row hashes
  to a 48-bit integer (md5 over the explicitly-cast column values), and
  the fingerprint is the SUM of row hashes mod a 63-bit prime.  Addition
  commutes, so the result is independent of row order, partitioning, and
  execution plan — two tables with equal fingerprints and counts are
  equal-as-multisets with overwhelming probability.  The sum runs in
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), exact to ~10^23 rows; one
  aggregation job, no shuffle beyond the final 1-row combine.
- :func:`table_diff` — full-outer join on the key columns comparing row
  hashes: every key classified ``added`` / ``removed`` / ``changed`` /
  ``unchanged``.  ONE key-keyed shuffle; payload columns never move —
  only (key, hash48) pairs do (the shuffle-payload discipline note in
  SCALE.md).

Cross-engine exactness: columns are cast to string EXPLICITLY and only
integral/string/boolean/timestamp columns are accepted — float-to-string
formatting differs between engines and is rejected rather than silently
mismatched (scale doubles to cents first; timestamps hash as epoch
micros).  NULL encodes as a sentinel distinct from any value.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_hash48", "dataset_fingerprint", "table_diff"]

_MOD = 9223372036854775783  # largest prime below 2^63
_OK = {"tinyint", "smallint", "int", "bigint", "string", "boolean", "date"}


def _canon(df: DataFrame, c: str) -> Column:
    dt = df.schema[c].dataType.simpleString()
    if dt == "timestamp":
        return F.unix_micros(F.col(c)).cast("string")
    if dt not in _OK:
        raise TypeError(
            f"fingerprint: column {c!r} has type {dt}; cast floats to "
            "scaled ints first (float-to-string formatting is not a "
            "stable cross-engine contract)"
        )
    return F.col(c).cast("string")


def row_hash48(df: DataFrame, cols: Sequence[str]) -> Column:
    """48-bit int64 hash of the named columns (md5-based, engine-neutral).

    Each column is md5-hashed FIRST and the per-column digests are joined
    — never the raw values: a raw-value concat is forgeable across column
    boundaries (('a<sep>b', 'c') vs ('a', 'b<sep>c') hash equal, and a
    value equal to the NULL sentinel byte masquerades as NULL).  Digests
    are fixed-width hex, so boundaries are unambiguous; NULL encodes as
    the literal 'N' (md5 of NULL is NULL in both engines), which no hex
    digest can equal."""
    parts = [F.coalesce(F.md5(_canon(df, c)), F.lit("N")) for c in cols]
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *parts)), 1, 12), 16, 10
    ).cast("long")


def dataset_fingerprint(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row: ``n_rows``, ``fingerprint`` (order/partition-invariant)."""
    h = row_hash48(df, cols)
    # decimal(28,0) input -> Spark widens the sum to decimal(38,0): with
    # 48-bit row hashes that overflows only past ~3.5e23 rows (a
    # decimal(20,0) input widens to only decimal(30,0) — 8 orders short)
    return df.select(h.alias("_h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum(F.col("_h").cast("decimal(28,0)")) % F.lit(_MOD))
        .cast("long")
        .alias("fingerprint"),
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Per-key diff of ``b`` (new) against ``a`` (old): key cols +
    ``status`` in {added, removed, changed, unchanged}.

    Keys must be unique per side (the usual primary-key contract; a
    duplicated key compares hash-to-hash arbitrarily within the dupes)."""
    keys = list(key_cols)
    ha = a.select(*keys, row_hash48(a, compare_cols).alias("_ha"))
    hb = b.select(*keys, row_hash48(b, compare_cols).alias("_hb"))
    j = ha.join(hb, on=keys, how="full_outer")
    status = (
        F.when(F.col("_ha").isNull(), F.lit("added"))
        .when(F.col("_hb").isNull(), F.lit("removed"))
        .when(F.col("_ha") == F.col("_hb"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))
