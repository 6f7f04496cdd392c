"""LLM-pipeline text operations, wave 2: PII scrubbing and vocabulary
building over the documents table (north-star text analysis — no reference
counterpart; registered after the driver's current 50-query window, driver
rows arrive next round, oracle-checked by tools/check.py now)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironbeam_spark.functions.text import PII_PATTERNS, scrub_pii
from ironbeam_spark.sources.io import read_table
from ironbeam_spark.suite.registry import query

# the synthetic corpus carries no PII, so the query plants deterministic
# PII derived from doc_id before scrubbing — the redaction is then a real,
# value-checked diff instead of a no-op
_PII_SUFFIX_SQL = (
    "' contact user' || doc_id::VARCHAR || '@example.com from 10.0.' "
    "|| (doc_id % 256)::VARCHAR || '.7 card 4111111111111111'"
)


@query(
    "q_pii_scrub",
    f"""
    WITH seeded AS (
      SELECT doc_id, text || {_PII_SUFFIX_SQL} AS raw FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, raw,
             regexp_replace(regexp_replace(regexp_replace(raw,
               '{PII_PATTERNS[0][0]}', '{PII_PATTERNS[0][1]}', 'g'),
               '{PII_PATTERNS[1][0]}', '{PII_PATTERNS[1][1]}', 'g'),
               '{PII_PATTERNS[2][0]}', '{PII_PATTERNS[2][1]}', 'g') AS clean
      FROM seeded
    )
    SELECT doc_id,
           CAST(length(raw) - length(clean) AS BIGINT) AS chars_redacted,
           md5(clean) AS clean_md5
    FROM scrubbed
    ORDER BY doc_id
    """,
    doc="PII scrubbing (north-star text cleaning): email/IPv4/card-number redaction as a codegen regexp_replace chain; patterns shared verbatim with the RE2 oracle (functions/text.scrub_pii)",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 card 4111111111111111"),
    )
    seeded = docs.select("doc_id", raw.alias("raw"))
    out = seeded.select(
        "doc_id",
        "raw",
        scrub_pii("raw").alias("clean"),
    )
    return out.select(
        "doc_id",
        (F.length("raw") - F.length("clean")).cast("long").alias("chars_redacted"),
        F.md5("clean").alias("clean_md5"),
    ).orderBy("doc_id")


@query(
    "q_vocab_topk",
    """
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 100
    """,
    doc="vocabulary building (north-star): lowercase whitespace tokens → frequency count → deterministic top-100; partial+final agg bounds the shuffle by |vocab|, TakeOrdered bounds the result (the classic corpus-vocab job)",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(100)
    )


@query(
    "q_heavy_hitters",
    # the Misra-Gries guarantees are checked in-query against exact counts;
    # the oracle is the guarantee contract itself (same pattern as
    # q_approx_distinct / q_approx_quantiles)
    "SELECT TRUE AS all_frequent_found, TRUE AS bounds_hold, TRUE AS bounded_size",
    doc="approximate heavy hitters (mergeable Misra-Gries, operators/frequency.py): O(m) memory per task, <= partitions*(m+1) shuffle rows — the bounded-memory tier above exact count_per_element for billion-token domains; emits its guarantee booleans vs exact counts",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ironbeam_spark.operators.frequency import approx_heavy_hitters

    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .where(F.col("token") != "")
    )
    # both intermediates are tiny (≤ m sketch rows, |vocab| exact rows) but
    # feed 3 downstream branches — localCheckpoint cuts the re-scan of the
    # exploded token stream from ~4× to 2×
    sketch = approx_heavy_hitters(toks, "token", m=64).localCheckpoint()
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_n")).localCheckpoint()
    joined = sketch.join(exact, sketch.item == exact.token, "left")
    checks = joined.agg(
        F.min(
            (F.col("est") <= F.col("true_n")) & (F.col("true_n") <= F.col("est") + F.col("err"))
        ).alias("bounds_hold"),
        F.count(F.lit(1)).alias("n_reported"),
        F.max("err").alias("err"),
    )
    missed_frequent = (
        exact.join(sketch, exact.token == sketch.item, "left_anti")
        .crossJoin(F.broadcast(checks.select("err")))
        .where(F.col("true_n") > F.col("err"))
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    return checks.crossJoin(missed_frequent).select(
        (F.col("n_missed") == 0).alias("all_frequent_found"),
        F.col("bounds_hold"),
        (F.col("n_reported") <= 64).alias("bounded_size"),
    )


@query(
    "q_doc_chunking",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS chunk_id,
             array_to_string(tok[i*24+1 : i*24+32], ' ') AS chunk_text
      FROM toks, (SELECT unnest(generate_series(0, 63)) AS i)
      WHERE i*24 < len(tok)
    )
    SELECT doc_id, chunk_id, chunk_text,
           CAST(len(list_filter(string_split(chunk_text, ' '), t -> t <> '')) AS BIGINT)
             AS n_tokens
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
    doc="document chunking (north-star preprocessing): split each doc into 32-token windows with 8-token overlap (stride 24) — one explode over a codegen sequence, no Python; the unit every embedding/training pipeline feeds downstream",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    size, stride = 32, 24
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("tok"),
    )
    # chunk starts: 0, stride, 2*stride, ... while start < len(tok)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("tok") - 1, F.lit(0)), F.lit(stride)
    )
    chunks = toks.select(
        "doc_id", "tok", F.explode(starts).alias("start")
    ).where(F.col("start") < F.size("tok"))
    out = chunks.select(
        "doc_id",
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.array_join(F.slice("tok", F.col("start") + 1, size), " ").alias("chunk_text"),
    )
    return out.select(
        "doc_id",
        "chunk_id",
        "chunk_text",
        F.size(F.filter(F.split("chunk_text", " "), lambda t: t != "")).cast("long").alias("n_tokens"),
    ).orderBy("doc_id", "chunk_id")


@query(
    "q_contamination",
    """
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(text)-23, 0)),
               i -> substr(text, i, 24))) AS grams
      FROM documents
    ),
    bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 10),
    flagged AS (
      SELECT DISTINCT g.doc_id
      FROM g, bench
      WHERE doc_id >= 10 AND list_contains(g.grams, bench.gram)
    )
    SELECT doc_id FROM flagged ORDER BY doc_id
    """,
    doc="benchmark-contamination check (north-star decontamination): corpus docs sharing ANY char-24-gram with the benchmark set (doc_id<10) — shingle explode + broadcast semi-join on the gram, never a doc×doc comparison",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ironbeam_spark.operators.dedup import char_ngrams

    docs = read_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(F.array_distinct(char_ngrams("text", 24))).alias("gram")
    )
    bench = grams.where(F.col("doc_id") < 10).select("gram").distinct()
    flagged = (
        grams.where(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), on="gram", how="leftsemi")
        .select("doc_id")
        .distinct()
    )
    return flagged.orderBy("doc_id")
