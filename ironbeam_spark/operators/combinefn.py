"""User-defined combiner protocol (reference ``CombineFn<V, A, O>``,
``src/collection.rs:333-360``: ``create_accumulator / add_input /
merge_accumulators / extract_output`` + assoc-comm declaration).

Spark mapping (SURVEY §2.12): every *shipped* reference combiner translates
to a native aggregate expression (see the suite's q_* queries) — that is the
100 TB path, with Tungsten partial/final aggregation and spilling.  This
module is the **long-tail** path for genuinely custom user combiners:
``applyInPandas`` over each key group, Arrow-batched.

Scale notes:
- ``applyInPandas`` materializes one full key group per call — fine for
  bounded groups, wrong for power-law keys; known combiner shapes should be
  rewritten to native expressions instead (SURVEY §7 hard-list item 5).
- ``add_batch`` is the vectorized hook: override it with numpy/pandas column
  ops; the default falls back to row-at-a-time ``add_input`` like the
  reference's per-element fold (``src/helpers/combine.rs:66-154``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame

__all__ = ["CombineFn", "combine_per_key", "combine_globally"]


class CombineFn:
    """Subclass and implement the four-phase contract.  ``accumulator`` may be
    any picklable value.  ``extract_output`` returns a dict of output columns.
    """

    def create_accumulator(self) -> Any:
        raise NotImplementedError

    def add_input(self, acc: Any, row: dict) -> Any:
        raise NotImplementedError

    def add_batch(self, acc: Any, pdf) -> Any:
        """Vectorized fold over a pandas batch; default = per-row loop."""
        for row in pdf.to_dict("records"):
            acc = self.add_input(acc, row)
        return acc

    def merge_accumulators(self, accs: Sequence[Any]) -> Any:
        raise NotImplementedError

    def extract_output(self, acc: Any) -> dict:
        raise NotImplementedError


def combine_per_key(
    df: DataFrame, key_cols: Sequence[str], fn: CombineFn, out_schema: str
) -> DataFrame:
    """Per-key combine with a user CombineFn (reference ``combine_values``,
    ``src/helpers/combine.rs:66``).  ``out_schema`` must list the key columns
    first, then ``extract_output``'s columns."""
    import pandas as pd  # local import: executors re-import per worker

    keys = list(key_cols)

    def apply(pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc = fn.add_batch(fn.create_accumulator(), pdf)
        out = fn.extract_output(acc)
        head = {k: pdf[k].iloc[0] for k in keys}
        return pd.DataFrame([{**head, **out}])

    return df.groupBy(*keys).applyInPandas(apply, out_schema)


def combine_globally(
    df: DataFrame, fn: CombineFn, out_schema: str, merge_fanout: int = 32
) -> DataFrame:
    """Global combine (reference ``combine_globally``,
    ``src/helpers/combine_global.rs:50``).  Three-phase tree aggregation —
    the reference's O(log n) Rayon reduction (``src/runner.rs:802-810``)
    re-expressed as a two-level merge, entirely inside the DAG (the result
    stays a lazy DataFrame, composable mid-pipeline):

    1. per-partition partial accumulators via ``mapInPandas`` (parallel, no
       shuffle) — one pickled accumulator row per partition;
    2. intermediate merge: ``repartition(merge_fanout)`` spreads the partial
       rows over ``merge_fanout`` tasks, each merging its share into ONE
       accumulator — so with P scan partitions no single task ever sees more
       than ~P/merge_fanout accumulators (at ~800k scan partitions the old
       single ``repartition(1)`` merge saw all 800k rows in one task);
    3. ``repartition(1)`` moves the ≤ merge_fanout survivors (this is exactly
       ``treeAggregate``'s final exchange; ``coalesce(1)`` would instead
       collapse upstream parallelism), then a final ``mapInPandas`` merges
       and extracts.

    Emits the identity accumulator's output on empty input, matching the
    reference."""
    import pandas as pd
    import pickle

    def partial(batches):
        acc = fn.create_accumulator()
        for pdf in batches:
            acc = fn.add_batch(acc, pdf)
        yield pd.DataFrame({"acc": [pickle.dumps(acc)]})

    def merge_level(batches):
        accs = []
        for pdf in batches:
            accs.extend(pickle.loads(b) for b in pdf["acc"])
        if accs:  # empty partitions contribute nothing at this level
            merged = accs[0] if len(accs) == 1 else fn.merge_accumulators(accs)
            yield pd.DataFrame({"acc": [pickle.dumps(merged)]})

    def final(batches):
        accs = []
        for pdf in batches:
            accs.extend(pickle.loads(b) for b in pdf["acc"])
        if not accs:
            accs = [fn.create_accumulator()]
        out = fn.extract_output(fn.merge_accumulators(accs))
        yield pd.DataFrame([out])

    partials = df.mapInPandas(partial, "acc binary")
    intermediate = partials.repartition(merge_fanout).mapInPandas(
        merge_level, "acc binary"
    )
    return intermediate.repartition(1).mapInPandas(final, out_schema)
