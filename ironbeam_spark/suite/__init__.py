"""Query suite package: importing it registers every query into QUERIES."""

from ironbeam_spark.suite.registry import QUERIES, Query, query

from ironbeam_spark.suite import (  # noqa: E402,F401
    core,
    extended,
    mm_stream,
    production,
    sketches,
    relational,
    text_ml,
    udf_batch,
    windowed,
)

__all__ = ["QUERIES", "Query", "query"]
