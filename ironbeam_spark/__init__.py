"""ironbeam-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of nhubbard/ironbeam (Apache-Beam-style batch
dataflow), re-expressed Spark-first.

Layout:
- :mod:`ironbeam_spark.session` — SparkSession factory (AQE, UTC, Arrow).
- :mod:`ironbeam_spark.collection` — ``PCollection`` wrapper over DataFrame
  with the full reference operator vocabulary (SURVEY §2).
- :mod:`ironbeam_spark.sources` — readers/writers (parquet/csv/jsonl/avro/...).
- :mod:`ironbeam_spark.operators` — windowing, sampling, dedup, similarity,
  dead-letter, validation, batching.
- :mod:`ironbeam_spark.functions` — scalar/vector/text function library.
- :mod:`ironbeam_spark.streaming` — Structured Streaming variants.
"""

from ironbeam_spark.collection import PCollection, flatten, from_df, from_vec
from ironbeam_spark.session import get_spark

__all__ = ["PCollection", "from_df", "from_vec", "flatten", "get_spark"]
__version__ = "0.1.0"
