"""Pair-stage shuffle volume, before vs after the round-6 LSH rewrite
(VERDICT r5 next #3): run the SAME skewed 52k-doc corpus (the
llm_scaling_bench recipe) through lsh_candidate_pairs from two checkouts
and report total shuffle write records/bytes (Spark UI REST API) plus the
verified-pairs (est_jaccard_threshold) row reduction.

Usage: python scripts/lsh_shuffle_metrics.py <repo_path> [threshold]
Prints one RESULT json line.  The caller (a human or the addendum
protocol) runs it once per checkout, exclusively (hypervisor steal).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read())


def shuffle_totals(port: int) -> dict:
    app = _rest(port, "applications")[0]["id"]
    stages = _rest(port, f"applications/{app}/stages?status=complete")
    return {
        "shuffle_write_records": sum(s["shuffleWriteRecords"] for s in stages),
        "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in stages),
        "shuffle_read_bytes": sum(s["shuffleReadBytes"] for s in stages),
        "n_stages": len(stages),
    }


def main() -> None:
    repo = sys.argv[1]
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else None
    sys.path.insert(0, repo)

    import os

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    port = 4049
    spark = (
        SparkSession.builder.appName("lsh-shuffle-metrics")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from geetiles_spark import cache
    from geetiles_spark.operators import dedup

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    N = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * N)).alias("doc_id"),
            (F.col("text") if i <= 1
             else F.regexp_replace(F.col("text"), "[aeiou]", str(i))).alias("text"),
        )
        for i in range(10)
    ]
    mega = spark.range(10 * N, 10 * N + 2000).select(
        F.col("id").alias("doc_id"),
        F.lit("the exact same boilerplate footer text repeated verbatim").alias("text"),
    )
    corpus = copies[0]
    for c in copies[1:]:
        corpus = corpus.unionByName(c)
    corpus = corpus.unionByName(mega).repartition(32).cache()
    corpus.count()

    before = shuffle_totals(port)
    kw = {"hot_bucket_size": 256, "n_salts": 64}
    if threshold is not None:
        kw["est_jaccard_threshold"] = threshold
    t0 = time.time()
    with cache.persist_scope():
        n_pairs = dedup.lsh_candidate_pairs(corpus, **kw).count()
    wall = time.time() - t0
    after = shuffle_totals(port)

    print("RESULT " + json.dumps({
        "repo": repo,
        "threshold": threshold,
        "n_pairs": n_pairs,
        "wall_sec": round(wall, 2),
        "pairs_job_shuffle_write_records":
            after["shuffle_write_records"] - before["shuffle_write_records"],
        "pairs_job_shuffle_write_mb": round(
            (after["shuffle_write_bytes"] - before["shuffle_write_bytes"]) / 1e6, 1),
        "pairs_job_shuffle_read_mb": round(
            (after["shuffle_read_bytes"] - before["shuffle_read_bytes"]) / 1e6, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
