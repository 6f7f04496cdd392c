"""Control-flow & debug operators (reference ``wait_on``,
``src/helpers/wait_on.rs:165``; ``log_elements``,
``src/helpers/log_elements.rs:96``; debug taps,
``src/testing/debug.rs``).

Spark has no graph-level signal edge: ``wait_on``'s Flatten-barrier trick
(hold a branch until another drains) becomes explicit action sequencing in
the runner layer — drain the signal plan(s), then hand back the data plan
(SURVEY §7 hard-list item 6).  Draining uses the ``noop`` sink: a full
distributed materialization with zero write cost.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

__all__ = ["wait_on", "drain", "log_elements", "debug_count"]


def drain(df: DataFrame) -> None:
    """Fully execute a plan, discarding output (side effects only)."""
    df.write.format("noop").mode("overwrite").save()


def wait_on(data: DataFrame, *signals: DataFrame | Callable[[], None]) -> DataFrame:
    """Reference ``wait_on(&signal)`` (``src/helpers/wait_on.rs:165``): the
    data branch must not execute before every signal branch has drained.

    Each signal is either a DataFrame (drained via the noop sink) or a
    callable side effect; they run NOW, in order — then ``data`` is returned
    untouched.  Call this at the point where the reference would insert the
    Flatten barrier."""
    for s in signals:
        if isinstance(s, DataFrame):
            drain(s)
        else:
            s()
    return data


def log_elements(df: DataFrame, label: str = "log", n: int = 20) -> DataFrame:
    """Passthrough debug tap (reference ``log_elements``,
    ``src/helpers/log_elements.rs:96``): print up to ``n`` rows, return the
    frame unchanged.  Debug-only — the sample is a driver-side ``take(n)``;
    per-element logging at scale is the anti-pattern the reference also
    warns about."""
    for row in df.take(n):
        print(f"[{label}] {row.asDict()}")
    return df


def debug_count(df: DataFrame, name: str = "debug") -> tuple[DataFrame, Observation]:
    """Counting tap (reference ``debug_count``, ``src/testing/debug.rs``):
    attaches an ``Observation`` that reports the row count after the next
    action — rides the existing job like the reference's metrics hook, no
    second pass."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n")), obs
