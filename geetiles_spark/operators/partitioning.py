"""Scan-parallelism guard for compute-heavy map stages.

A parquet scan can never produce more non-empty tasks than the input has row
groups, no matter what ``spark.sql.files.maxPartitionBytes`` /
``minPartitionNum`` say — a single-row-group file (or an unsplittable gzip)
pins the whole map stage to one core.  For operators whose map side does
orders-of-magnitude more work than the scan itself (shingle explode + md5,
window hashing, per-batch numpy kernels), that starvation dominates the
query: the engine measured 26s -> 2s on the minhash-signature stage at
local[32] purely from re-spreading a 6 MB single-row-group scan.

:func:`spread` is the scale-adaptive fix (optimization guide §2.5 "input
skew ... otherwise repartition immediately after the read"): IF the plan
already has at least ``defaultParallelism`` partitions (the normal case for
real multi-file tables at cluster scale) it is a no-op; only a starved scan
pays the one extra exchange, and what it shuffles is the raw input — cheap
by the premise that the downstream map work, not the scan, is the cost.
Pass ``key`` when a later aggregation groups by that column: the hash
repartition then doubles as the aggregation's exchange (partitioning is
preserved through project/explode, so the groupBy reuses it and the plan
nets ZERO extra shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, key: str | None = None, min_parts: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_parts`` (default
    ``sparkContext.defaultParallelism``) partitions before a compute-heavy
    map stage.  No-op when the plan is already wide enough; hash-partition
    by ``key`` when given (deterministic, and reusable by a downstream
    groupBy on the same column), round-robin otherwise."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
