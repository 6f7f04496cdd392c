"""Custom stateful streaming operators via ``applyInPandasWithState``
(north-star extension — the reference is batch-only and explicitly excludes
stateful DoFn/timers, reference ``FEATURE_PARITY_PLAN.md:6-11``).

Two canonical LLM-pipeline shapes:

- **streaming first-seen dedup**: keep one bit of state per key; emit a key's
  deterministic winner (min by ``order_col``) the first time the key appears,
  drop every later occurrence — exact dedup over an unbounded stream.
- **streaming running count**: per-key cumulative counts across micro-batches
  (update-mode output).

Scale notes: state lives in the state store (RocksDB-backed on a real
cluster), partitioned by the grouping key — the same hash-partitioning story
as a batch groupBy.  Arrow batches bound memory per call.  Both functions are
top-level module functions so cloudpickle ships them by reference and the
session factory's addPyFile zip resolves them on executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "stream_dedup_first",
    "stream_running_count",
    "stream_running_count_tws",
    "tws_available",
]


def stream_dedup_first(
    sdf: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Exact streaming dedup: first-seen key wins (deterministically: the
    min-``order_col`` row within the key's first micro-batch), duplicates in
    all later batches are dropped via one boolean of per-key state."""
    out_schema = sdf.schema

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            for _ in pdfs:  # consume; key already emitted
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_col).head(1)
            best = cand if best is None else pd.concat([best, cand]).sort_values(order_col).head(1)
        if best is not None:
            state.update((True,))
            yield best

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _key_ddl(sdf: DataFrame, key_cols: list[str]) -> str:
    """Output-schema DDL for the grouping keys, derived from the input
    schema — hardcoding ``string`` would mismatch non-string keys (e.g. a
    bigint ``event_id``) and fail or silently cast at runtime."""
    return ", ".join(
        f"{c} {sdf.schema[c].dataType.simpleString()}" for c in key_cols
    )


def stream_running_count(sdf: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key cumulative count across micro-batches (update mode): emits one
    row per key per batch with the running total."""
    key_ddl = _key_ddl(sdf, key_cols)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        batch_n = sum(len(p) for p in pdfs)
        if batch_n:
            n += batch_n
            state.update((n,))
            yield pd.DataFrame([{**dict(zip([c for c in key_cols], key)), "running_n": n}])

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=f"{key_ddl}, running_n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's arbitrary-stateful API
# ---------------------------------------------------------------------------


def tws_available() -> bool:
    """``transformWithStateInPandas`` drives its state server over protobuf;
    without the ``protobuf`` package the streaming Python runner crashes at
    startup.  Runtime-gated like the avro source (sources/io.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_running_count_tws(sdf: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key running count via ``transformWithStateInPandas`` — same
    semantics as :func:`stream_running_count`, expressed in Spark 4's
    ``StatefulProcessor`` API (typed value state, timers available, state
    schema evolution; RocksDB provider required — pair with
    :class:`rocksdb_state_store`).

    Preferred over ``applyInPandasWithState`` on clusters that have protobuf:
    the processor handle supports value/list/map state and timers instead of
    a single tuple, so complex operators don't have to pack state manually.
    """
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package"
        )
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    key_ddl = _key_ddl(sdf, key_cols)

    class _RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame([{**dict(zip(key_cols, key)), "running_n": n}])

        def close(self) -> None:
            pass

    return sdf.groupBy(*key_cols).transformWithStateInPandas(
        _RunningCount(),
        outputStructType=f"{key_ddl}, running_n long",
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# State-store backend selection (the 100 TB story for streaming state)
# ---------------------------------------------------------------------------

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class rocksdb_state_store:
    """Context manager that runs streaming queries against the RocksDB state
    store provider instead of the default in-memory HDFS-backed one.

    At 100 TB the per-key state of a dedup or running-aggregate stream does
    not fit on the executor heap; RocksDB keeps it on local SSD with
    changelog checkpointing so commits upload only the delta, not a full
    snapshot.  Local-mode behavior is identical — tests assert batch
    equivalence under both providers.
    """

    _KEYS = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }

    def __init__(self, spark):
        self._spark = spark
        self._saved: dict[str, str | None] = {}

    def __enter__(self):
        for k, v in self._KEYS.items():
            try:
                self._saved[k] = self._spark.conf.get(k)
            except Exception:
                self._saved[k] = None
            self._spark.conf.set(k, v)
        return self._spark

    def __exit__(self, *exc):
        for k, old in self._saved.items():
            if old is None:
                self._spark.conf.unset(k)
            else:
                self._spark.conf.set(k, old)
        return False
