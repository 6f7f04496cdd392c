"""Query suite package: importing it registers every query into QUERIES."""

from ironbeam_spark.suite.registry import QUERIES, Query, query

from ironbeam_spark.suite import core, production, relational, text_ml, windowed  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "query"]
