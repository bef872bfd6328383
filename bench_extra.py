"""Stage-isolation benchmarks (round 7) — the guide §1.4 noop-sink
decompositions behind OPTIMIZATION_r07.md.  NOT the driver's bench
(`bench.py` is frozen); this file exists so the per-stage numbers cited in
the round report are reproducible.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
           python bench_extra.py [reps]

Prints per-stage noop timings (min of `reps`, default 3) for the suite's
heavy queries.  Each stage is labelled via setJobDescription.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from geetiles_spark import cache  # noqa: E402
from geetiles_spark.operators import dedup, similarity  # noqa: E402
from geetiles_spark.operators.partitioning import spread  # noqa: E402
from geetiles_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="geetiles-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs.count(), emb.count()  # touch footers / warm scan

    results: dict[str, list[float]] = {}

    def noop(df, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        results.setdefault(label, []).append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)

    for _ in range(reps):
        with cache.persist_scope():
            # --- minhash-LSH decomposition ------------------------------
            shingles = dedup.char_shingles_flat(
                spread(docs.select("doc_id", "text"), key="doc_id"), 5
            )
            noop(shingles, "lsh/shingles")
            noop(dedup.minhash_signatures(shingles, 8), "lsh/signatures")
            noop(
                dedup.lsh_candidate_pairs(docs, 5, 8, 4),
                "lsh/pairs-full",
            )
        with cache.persist_scope():
            # --- ngram-jaccard decomposition ----------------------------
            grams = (
                spread(docs.select("doc_id", "text"), key="doc_id")
                .select("doc_id", F.split("text", " ").alias("toks"))
                .select(
                    "doc_id",
                    F.explode(
                        F.array_distinct(
                            F.transform(
                                F.sequence(
                                    F.lit(0),
                                    F.greatest(F.size("toks") - 3, F.lit(0)),
                                ),
                                lambda i: F.concat_ws(
                                    " ", F.slice("toks", i + 1, 3)
                                ),
                            )
                        )
                    ).alias("gs"),
                )
                .select("doc_id", F.xxhash64("gs").alias("gram"))
            )
            grams = cache.track(grams)
            noop(grams, "ngram/grams")
            ap = (
                grams.alias("a")
                .join(grams.alias("b"), on="gram")
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(
                    F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                )
            )
            noop(ap, "ngram/join-emit")
            par = spark.sparkContext.defaultParallelism
            noop(
                ap.repartition(2 * par, "doc_a", "doc_b")
                .groupBy("doc_a", "doc_b")
                .agg(F.count(F.lit(1)).alias("n")),
                "ngram/join+pair-agg",
            )
        with cache.persist_scope():
            # --- exact-substr + cosine pairs ----------------------------
            noop(dedup.exact_substr_spans(docs, k=8), "exact_substr/full")
            n = emb.count()
            noop(
                similarity.cosine_pairs(emb, 0.4, n_hint=n),
                "cosine_pairs/full",
            )

    for label, v in results.items():
        print(
            f"{label}: min {min(v):.2f}s  "
            f"passes {['%.2f' % x for x in v]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
