"""Deterministic scale-up of a test-data directory for the bench ladder.

``ensure_scaled(spark, src_dir, factor, out_dir)`` materializes a
``factor``× copy of every table at ``src_dir`` into ``out_dir`` (skipping
the work when an up-to-date copy already exists) so the bench can measure
the same queries at 10× the data and observe whether their cost curves stay
linear (AQE behavior, skew handling, shuffle sizing).

Scaling rules — replica ``r`` in ``[0, factor)``, replica 0 is the original
data bit-for-bit:

- **Fact/dim keys shift consistently per key domain** (``o_orderkey`` and
  ``l_orderkey`` move by the same ``r × K_order``), so referential joins
  keep exactly their original selectivity and per-key fan-out; group
  cardinalities keyed on ids grow ×factor, groups keyed on low-cardinality
  attributes (returnflag, orderdate buckets) keep their count and grow
  ×factor in size — the realistic "same schema, more data" shape.
- **nation/region stay fixed** (25/5 rows at every scale, as in TPC-H).
- **documents.text is perturbed per replica** (every 3rd word gets a
  replica suffix) so word-shingle similarity across replicas collapses to
  ~0: near-dup structure is preserved WITHIN each replica and the pair
  count grows linearly (×factor), not quadratically (×factor²) — identical
  copies would manufacture giant cross-replica duplicate cliques no real
  corpus has.  Char-gram similarity stays high across replicas, which only
  grows bounded-linear outputs (fixed query side).
- **embeddings get an ε·r nudge on one component** so replicas are
  distinct vectors with deterministic orderings, leaving distances
  essentially unchanged.
- **events replicate with shifted event ids** over the same time range —
  ×factor denser windows, the realistic densification shape.

Everything is computed with deterministic Spark expressions and written as
multi-file parquet so downstream scans start parallel (a single 6 MB file
would serialize the first stage of every query).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

GEN_VERSION = 1

# table -> (key columns to shift, output file count)
_SHIFT_COLS: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_FILES: dict[str, int] = {
    "orders": 8,
    "lineitem": 16,
    "customer": 4,
    "supplier": 1,
    "part": 4,
    "events": 8,
    "documents": 8,
    "embeddings": 4,
}
_COPY_TABLES = ("nation", "region")

# key domain = the key's prefix ("o_orderkey"/"l_orderkey" -> "orderkey"):
# every column in a domain shifts by the same stride so joins stay aligned
_DOMAIN = lambda col: col.split("_", 1)[1]  # noqa: E731


def _key_strides(spark: SparkSession, src_dir: str) -> dict[str, int]:
    """Max+1 per key DOMAIN across every table that carries it — one small
    aggregate per table, driver-side result is a handful of longs."""
    strides: dict[str, int] = {}
    for table, cols in _SHIFT_COLS.items():
        df = spark.read.parquet(f"{src_dir}/{table}.parquet")
        row = df.select(
            *[F.max(F.col(c)).alias(c) for c in cols]
        ).first()
        for c in cols:
            d = _DOMAIN(c)
            strides[d] = max(strides.get(d, 0), int(row[c]) + 1)
    return strides


def _perturb_text(text, r):
    """Append the replica tag to every 3rd word (replica 0 untouched).

    Any 3-word window then contains a modified word, so word-shingle sets
    across replicas are DISJOINT — minhash/shingle dedup finds no
    cross-replica pairs and the pair count scales linearly with factor."""
    words = F.split(text, " ")
    tagged = F.transform(
        words,
        lambda w, i: F.when(
            (r > 0) & (i % 3 == 0), F.concat(w, F.lit("~"), r.cast("string"))
        ).otherwise(w),
    )
    return F.array_join(tagged, " ")


def _scaled(df: DataFrame, table: str, factor: int, strides: dict[str, int]) -> DataFrame:
    r = F.col("_r")
    out = df.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    for c in _SHIFT_COLS[table]:
        out = out.withColumn(
            c, (F.col(c) + r.cast("long") * F.lit(strides[_DOMAIN(c)])).cast("long")
        )
    if table == "documents":
        out = out.withColumn("text", _perturb_text(F.col("text"), r))
        out = out.withColumn("n_chars", F.length("text").cast(dict(df.dtypes)["n_chars"]))
    if table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    i == 0, x + r.cast("float") * F.lit(1e-3).cast("float")
                ).otherwise(x),
            ),
        )
    return out.drop("_r")


def ensure_scaled(
    spark: SparkSession, src_dir: str, factor: int, out_dir: str
) -> str:
    """Materialize (or reuse) a ``factor``× scaled copy of ``src_dir`` at
    ``out_dir``; returns ``out_dir``.  Reuse is keyed on (GEN_VERSION,
    src_dir, factor) recorded in ``meta.json``."""
    out = Path(out_dir)
    meta_path = out / "meta.json"
    want = {"version": GEN_VERSION, "src": str(src_dir), "factor": factor}
    if meta_path.exists():
        try:
            if json.loads(meta_path.read_text()) == want:
                return str(out)
        except (ValueError, OSError):
            pass
    out.mkdir(parents=True, exist_ok=True)
    strides = _key_strides(spark, src_dir)
    for table in _SHIFT_COLS:
        df = spark.read.parquet(f"{src_dir}/{table}.parquet")
        _scaled(df, table, factor, strides).repartition(_FILES[table]).write.mode(
            "overwrite"
        ).parquet(str(out / f"{table}.parquet"))
    for table in _COPY_TABLES:
        spark.read.parquet(f"{src_dir}/{table}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(out / f"{table}.parquet"))
    meta_path.write_text(json.dumps(want))
    return str(out)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from ironbeam_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else str(
        Path(__file__).resolve().parent.parent / ".bench_sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("scale-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    print(ensure_scaled(spark, src, factor, dst))
