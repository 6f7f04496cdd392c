"""Per-stage profiling of q_crawl_to_shards with the noop sink (guide §1.4).

Times cumulative prefixes of the pipeline so stage cost = delta between
consecutive prefixes. Run twice per prefix, take best (steady state).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from ironbeam_spark.session import get_spark  # noqa: E402


def noop_time(df, label, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}", file=sys.stderr)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-crawl")
    spark.sparkContext.setLogLevel("ERROR")

    from ironbeam_spark.functions.text import quality_score, token_count
    from ironbeam_spark.functions.web import url_path
    from ironbeam_spark.operators.dedup import (
        RECOMMENDED_MAX_BAND_BUCKET,
        dedup_components,
        dedup_exact,
        minhash_dedup_pairs,
    )
    from ironbeam_spark.operators.robots import robots_filter
    from ironbeam_spark.operators.scan import global_running_sum, pack_layout
    from ironbeam_spark.operators.web import blocklist_filter, with_registered_domain
    from ironbeam_spark.sources.warc import read_warc
    from ironbeam_spark.suite.web import (
        _BLOCKLIST,
        _ROBOTS_TXT,
        _crawl_warc_corpus,
        html_to_text,
    )

    # corpus write (cached after first call) — time it separately
    t0 = time.perf_counter()
    path = _crawl_warc_corpus(spark, sf_dir)
    print(f"{time.perf_counter()-t0:8.3f}s  corpus write (first call)", file=sys.stderr)

    corpus = read_warc(spark, path)
    noop_time(corpus, "1 read_warc decode")

    docs = corpus.select(
        F.regexp_extract("target_uri", r"//crawl//([0-9]+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("html"),
    )
    base = with_registered_domain(docs, "url")
    paths = base.where(F.col("registered_domain").isNotNull()).withColumn(
        "path", url_path("url")
    )
    noop_time(paths, "2 +canonicalize/registered_domain")

    robots = spark.createDataFrame(
        sorted(_ROBOTS_TXT.items()), "registered_domain string, robots_txt string"
    )
    gated = robots_filter(paths, "path", robots, "ironbeam", key_col="registered_domain")
    kept = blocklist_filter(gated, "registered_domain", _BLOCKLIST)
    noop_time(kept.select("doc_id", "url"), "3 +robots+blocklist (narrow out)")

    extracted = kept.select("doc_id", html_to_text("html").alias("text")).where(
        (F.length("text") > 0) & (token_count("text") > 0)
    )
    noop_time(extracted, "4 +html_to_text+tokcount filter")

    quality = extracted.where(quality_score("text") >= 0.6)
    noop_time(quality, "5 +quality gate")

    t0 = time.perf_counter()
    exact = (
        dedup_exact(
            quality.withColumn(
                "fp", F.md5(F.regexp_replace(F.lower("text"), "[0-9]+", ""))
            ),
            ["fp"],
            "doc_id",
        )
        .select("doc_id", "text")
        .localCheckpoint()
    )
    print(f"{time.perf_counter()-t0:8.3f}s  6 exact dedup + localCheckpoint (eager)", file=sys.stderr)

    pairs = minhash_dedup_pairs(
        exact, "doc_id", "text", shingle_words=3, k=8, bands=4, threshold=0.5,
        max_band_bucket=RECOMMENDED_MAX_BAND_BUCKET,
    )
    noop_time(pairs, "7 minhash pairs")

    losers = (
        dedup_components(pairs)
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    noop_time(losers, "8 components->losers")

    survivors = exact.join(losers, on="doc_id", how="left_anti")
    toks = survivors.select(
        "doc_id",
        F.md5("text").alias("doc_md5"),
        token_count("text").alias("n_tokens"),
    )
    noop_time(toks, "9 toks (md5+token_count on survivors)")

    scanned = global_running_sum(toks, ["doc_id"], "n_tokens", "cum_end")
    noop_time(scanned, "10 global_running_sum")

    sharded = pack_layout(scanned, "n_tokens", "cum_end", cap=4096).select(
        "doc_id", "doc_md5", "n_tokens", F.col("pack_id").alias("shard_id")
    )
    final = (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.md5(
                F.array_join(
                    F.array_sort(F.collect_list(F.struct("doc_id", "doc_md5"))).getField(
                        "doc_md5"
                    ),
                    "",
                )
            ).alias("shard_md5"),
        )
        .orderBy("shard_id")
    )
    noop_time(final, "11 full tail (pack+rollup)")

    # whole query via registry for reference
    from ironbeam_spark.suite import QUERIES

    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES["q_crawl_to_shards"].fn(spark, sf_dir).count()
        print(f"{time.perf_counter()-t0:8.3f}s  FULL q_crawl_to_shards (count)", file=sys.stderr)


if __name__ == "__main__":
    main()
