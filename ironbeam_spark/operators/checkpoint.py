"""Policy-driven checkpointing (reference ``CheckpointConfig`` /
``CheckpointPolicy``, ``src/checkpoint.rs:68-147``).

The reference checkpoints *progress markers* and re-executes from the last
barrier on recovery; Spark's ``localCheckpoint`` is strictly stronger per
call — it materializes the data and truncates lineage.  What the reference
adds on top is the *policy* layer deciding WHEN to checkpoint
(``AfterEveryBarrier`` / ``EveryNNodes`` / ``TimeInterval`` / ``Hybrid``).
This module supplies that layer as a small stateful object that iterative
operators consult at each barrier point:

    policy = CheckpointPolicy.every_n(3)
    ...
    df = policy.checkpoint(df)   # localCheckpoint only when the policy fires

Why it matters at scale: ``localCheckpoint`` is not free (it caches the
partitions), so an iterative job with shallow rounds may prefer EveryN(k) to
amortize the cost, while a job with expensive rounds wants AfterEveryBarrier
so a lost executor never replays more than one round.  The policy makes that
trade explicit and testable instead of hard-coding ``.localCheckpoint()``.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

__all__ = ["CheckpointPolicy"]


class CheckpointPolicy:
    """Decides, at each barrier point, whether to truncate lineage.

    Construct via the factories: :meth:`after_every_barrier` (reference
    default), :meth:`every_n`, :meth:`time_interval`, :meth:`hybrid`,
    :meth:`never`.  Instances are stateful (barrier counter + last-fire
    clock) and intended to live for one operator invocation.
    """

    def __init__(
        self,
        *,
        barriers: bool = False,
        every_n: int | None = None,
        interval_secs: float | None = None,
    ) -> None:
        self._barriers = barriers
        self._every_n = every_n
        self._interval = interval_secs
        self._seen = 0
        self._last_fire = time.monotonic()
        self.fired = 0  # observability: how many checkpoints actually happened

    # -- factories mirroring the reference enum (src/checkpoint.rs:95-107)
    @classmethod
    def after_every_barrier(cls) -> "CheckpointPolicy":
        return cls(barriers=True)

    @classmethod
    def every_n(cls, n: int) -> "CheckpointPolicy":
        if n < 1:
            raise ValueError("every_n requires n >= 1")
        return cls(every_n=n)

    @classmethod
    def time_interval(cls, secs: float) -> "CheckpointPolicy":
        return cls(interval_secs=secs)

    @classmethod
    def hybrid(cls, *, barriers: bool = True, interval_secs: float = 60.0) -> "CheckpointPolicy":
        return cls(barriers=barriers, interval_secs=interval_secs)

    @classmethod
    def never(cls) -> "CheckpointPolicy":
        return cls()

    def should_checkpoint(self) -> bool:
        """Record one barrier crossing; True iff the policy fires on it."""
        self._seen += 1
        due = self._barriers
        if self._every_n is not None and self._seen % self._every_n == 0:
            due = True
        if self._interval is not None and (
            time.monotonic() - self._last_fire
        ) >= self._interval:
            due = True
        return due

    def checkpoint(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """``df.localCheckpoint(eager)`` when due, else ``df`` unchanged."""
        if self.should_checkpoint():
            self.fired += 1
            self._last_fire = time.monotonic()
            return df.localCheckpoint(eager)
        return df
