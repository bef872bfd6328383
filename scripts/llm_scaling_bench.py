"""Two-parallelism scaling evidence for the LLM-data (dedup) stack
(VERDICT r4 next-steps #4).

The N -> 4N criterion is already proven on the north-star geo job
(scripts/scaling_bench.py, BENCH/BASELINE.md).  This script extends the
same protocol to the dedup suite at 10x the bench corpus, and — unlike the
clean bench corpus — deliberately injects a giant exact-duplicate cluster
so the HOT-BUCKET salted path activates, answering the two open questions
the sf0.1 numbers extrapolated over:

1. throughput at two parallelism levels (local[2] vs local[8], same input,
   subprocess-isolated sessions, per-run hypervisor steal reported);
2. whether hot buckets activate on a skewed corpus and whether the salted
   join's per-task bound holds (reported as the max per-partition share of
   emitted candidate pairs — without salting the whole mega-cluster's
   ~2M pairs would sit in ONE (band, band_sig) hash-join task).

Corpus (deterministic, built from the driver's sf0.1 documents table —
no external data): 10 copies of the 5,000-doc table — copies 0 and 1 are
IDENTICAL (a controlled 5,000-pair duplicate set), copies 2-9 rewrite
every vowel (``regexp_replace(text, '[aeiou]', <digit>)``) so their
shingle sets genuinely diverge (a mere suffix keeps the minhash minimum
and every copy collides into one giant bucket — measured: 11,803-doc
buckets -> 135M candidate pairs, i.e. the wall measures quadratic pair
emission instead of the LSH machinery) — plus a 2,000-row exact-duplicate
cluster (one fixed text) to exceed hot_bucket_size=1024.  52,000 docs.

Suite per run: exact_duplicates + lsh_candidate_pairs (hot path active).
Writes BENCH/LLM_SCALING.md.
"""

from __future__ import annotations

import json
import subprocess
import sys

_RUN_SRC = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from geetiles_spark.session import get_spark

cpus = int(sys.argv[1])
# shuffle partitions FIXED across configs (not scaled with cores): the
# pair-emission stage is granule-skewed, and fewer partitions re-clump
# granules (measured 0.73 max-share at 8 partitions vs 0.14 at 32) — the
# controlled variable must be parallelism only, with data partitioning
# identical, as it would be on a real cluster sized to the data
spark = get_spark(app_name=f"llm-scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=32)
# AQE partition coalescing targets the session's parallelism, so with it on
# the two configs execute DIFFERENT physical partitionings (measured: the
# local[2] run re-clumped the pair stage to 0.39 max-share vs 0.14 at
# local[8]).  The controlled variable is executor parallelism only.
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
def ident(b):
    for pdf in b: yield pdf
spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(ident, "id long").count()

from pyspark.sql import functions as F
from geetiles_spark import cache
from geetiles_spark.operators import dedup

base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
N = base.count()  # 5000
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
n_docs = corpus.count()


def suite(docs):
    t0 = time.time()
    with cache.persist_scope():
        n_exact = dedup.exact_duplicates(docs).count()
        t1 = time.time()
        # skewed-corpus sizing: default (1024, 16) leaves just-under-
        # threshold cold buckets emitting ~C(1024,2)=0.5M pairs inside ONE
        # (band, sig) granule — measured 34% of all pairs in one partition,
        # capping 2->8 speedup at ~3x.  Lowering the hot threshold +
        # raising salts bounds every granule at ~(df/64)xdf.
        pairs = dedup.lsh_candidate_pairs(docs, hot_bucket_size=256, n_salts=64)
        # per-partition share of emitted pairs: evidences the salted hot
        # path spreads the mega-cluster instead of one task holding it
        per_part = (
            pairs.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        t2 = time.time()
    return n_exact, per_part, round(t1 - t0, 2), round(t2 - t1, 2)


# fixed-cost calibration: the identical action sequence over a corpus 100x
# smaller — its wall is dominated by per-job driver costs (job scheduling,
# the isEmpty action, broadcasts), giving an Amdahl floor for this suite
tiny = corpus.filter(F.col("doc_id") % 100 == 0).cache()
tiny_n = tiny.count()
_, _, cal_exact, cal_pairs = suite(tiny)

t0 = time.time()
n_exact, per_part, t_exact, t_pairs = suite(corpus)
wall = time.time() - t0
n_pairs = sum(r["n"] for r in per_part)
max_part = max((r["n"] for r in per_part), default=0)

# hot-bucket activation stats (separate, untimed diagnostic pass)
with cache.persist_scope():
    sig = dedup.minhash_signatures(dedup.char_shingles_flat(corpus, 5), 8)
    band_expr = F.array(*[
        F.concat_ws("|", *[F.col("sig")[b * 2 + r].cast("string") for r in range(2)])
        for b in range(4)
    ])
    bstats = (
        sig.select(F.posexplode(band_expr).alias("band", "band_sig"))
        .groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("max_df"),
             F.sum(F.when(F.col("df") > 256, 1).otherwise(0)).alias("n_hot"))
        .first()
    )

rows = n_docs + n_pairs
print("RESULT " + json.dumps({
    "cpus": cpus, "wall_sec": round(wall, 2), "n_docs": n_docs,
    "t_exact": t_exact, "t_pairs": t_pairs,
    "fixed_cost_sec": round(cal_exact + cal_pairs, 2), "cal_docs": tiny_n,
    "n_exact_groups": n_exact, "n_pairs": n_pairs,
    "throughput_rows_per_sec": round(rows / wall, 1),
    "max_bucket_df": int(bstats["max_df"]), "n_hot_buckets": int(bstats["n_hot"]),
    "max_partition_pairs": int(max_part),
    "max_partition_share": round(max_part / max(n_pairs, 1), 4),
}))
spark.stop()
"""


def _cpu_stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def run_once(cpus: int) -> dict:
    s0 = _cpu_stat()
    out = subprocess.run(
        [sys.executable, "-c", _RUN_SRC, str(cpus)],
        capture_output=True, text=True, timeout=1800,
    )
    s1 = _cpu_stat()
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    if not line:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    res = json.loads(line[-1][len("RESULT "):])
    busy = sum(s1) - sum(s0)
    res["steal_pct"] = round(100.0 * (s1[7] - s0[7]) / max(busy, 1), 1)
    return res


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: dict[int, list[dict]] = {2: [], 8: []}
    for rep in range(reps):
        for cpus in (2, 8):
            r = run_once(cpus)
            runs[cpus].append(r)
            print(f"rep{rep} local[{cpus}]: {r['wall_sec']}s "
                  f"steal={r['steal_pct']}% tput={r['throughput_rows_per_sec']}")
    best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}
    eff = best[8]["throughput_rows_per_sec"] / (
        4 * best[2]["throughput_rows_per_sec"]
    )
    # Amdahl-adjusted: subtract each config's measured per-job fixed cost
    # (the 100x-smaller calibration suite) — the fraction that amortizes
    # away as the corpus grows toward real scale
    k2 = best[2]["wall_sec"] - best[2]["fixed_cost_sec"]
    k8 = best[8]["wall_sec"] - best[8]["fixed_cost_sec"]
    print(json.dumps({
        "best": best,
        "scaling_efficiency_2_to_8_raw": round(eff, 3),
        "scaling_efficiency_2_to_8_kernel": round(k2 / (4 * k8), 3),
    }, indent=1))


if __name__ == "__main__":
    main()
