"""One release point for every operator family's checkpoint registry.

Several operator families lazily ``localCheckpoint`` a table that many
plan subtrees reread (scan stats, shingle postings, pagerank edge/node
frames, the graph family's canonical edge sets) and track it in a
module-level registry so a long-lived process can release the blocks
between queries — ``unpersist`` is a no-op for localCheckpoints, the
blocks free on GC once the last reference drops.  Every gate/bench
process used to import and call the five ``release_*`` helpers by hand;
each new registry then had to be threaded into every call site, and a
missed site silently reintroduced the unbounded-storage leak.  This is
the single canonical release: add new registries HERE, nowhere else.
"""

from __future__ import annotations

__all__ = ["release_all_caches"]


def release_all_caches() -> int:
    """Release every tracked checkpoint/persist registry; returns the
    number of frames released (diagnostic)."""
    from ironbeam_spark.operators.dedup import release_shingle_caches
    from ironbeam_spark.operators.pagerank import release_rank_caches
    from ironbeam_spark.operators.scan import release_scan_caches
    from ironbeam_spark.operators.triangles import release_edge_caches
    from ironbeam_spark.sources.compression import release_codec_caches

    return (
        release_shingle_caches()
        + release_scan_caches()
        + release_rank_caches()
        + release_edge_caches()
        + release_codec_caches()
    )
