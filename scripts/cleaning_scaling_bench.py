"""Two-parallelism scaling evidence for the round-6 corpus-cleaning pair
(`text.c4_line_filters` + `dedup.paragraph_dedup`).

Same protocol as scripts/exactsubstr_scaling_bench.py (BASELINE.json north
rule — no real cluster in the sandbox, so N -> 4N is evidenced as local[2]
vs local[8] on IDENTICAL input, subprocess-isolated sessions, fixed shuffle
partitions, per-run hypervisor steal reported, best-of-reps clean window).

Corpus (deterministic, from the driver's sf0.1 documents — no external
data): 100 copies of the 5,000-doc table, copies 0/1 identical and copies
2-99 vowel-rewritten, plus a 20,000-row boilerplate cluster — 520,000 docs
(10x the ExactSubstr/LSH evidence corpus: these operators do far less work
per token, so the job must be bigger before it is kernel-dominated rather
than fixed-cost-dominated), re-chunked into 6-word newline lines (for C4,
with the contract's md5-driven terminal punctuation so the keep path does
real work) and 4-word paragraph blocks (for the dedup).  The identical
copies make every copy-0 paragraph a cross-corpus duplicate and the
boilerplate rows a 20,000-deep hot paragraph; like ExactSubstr (and unlike
the pair-based LSH stack) a paragraph with df occurrences costs O(df)
rows at every stage — no quadratic frontier.

Suite per run: c4_line_filters full-agg (map-only — the scaling floor
should be ~ideal) + paragraph_dedup full-agg (explode + md5-keyed
election groupBy + equi-join + regroup — the shuffle-bound member).
Fixed-cost calibration = identical action sequence on a 100x smaller
subset (Amdahl floor).  Appends nothing; results are recorded by hand in
BENCH/LLM_SCALING.md.
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
spark = get_spark(app_name=f"clean-scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=32)
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
def ident(b):
    for pdf in b: yield pdf
spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(ident, "id long").count()

from pyspark.sql import functions as F
from geetiles_spark import cache
from geetiles_spark.operators import dedup, text as toext

base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
N = base.count()  # 5000
copies = [
    base.select(
        (F.col("doc_id") + F.lit(i * N)).alias("doc_id"),
        (F.col("text") if i <= 1
         else F.regexp_replace(F.col("text"), "[aeiou]", str(i))).alias("text"),
    )
    for i in range(100)
]
mega = spark.range(100 * N, 100 * N + 20000).select(
    F.col("id").alias("doc_id"),
    F.lit("the exact same boilerplate footer text repeated verbatim "
          "across every page of the crawl footer end").alias("text"),
)
corpus = copies[0]
for c in copies[1:]:
    corpus = corpus.unionByName(c)
corpus = corpus.unionByName(mega)


def chunked(docs, k, sep):
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i * k + 1, F.lit(k))),
    )
    return toks.select("doc_id", F.concat_ws(sep, chunks).alias("text"))


def punctuate(docs):
    # the contract's md5-driven terminal '.' on ~half the lines, so the
    # C4 keep path (word counts, substring checks, rebuild) does real work
    lines = F.transform(
        F.split("text", "\n", -1),
        lambda c: F.when(
            F.substring(F.md5(c), 1, 1) <= "7", F.concat(c, F.lit("."))
        ).otherwise(c),
    )
    return docs.select("doc_id", F.concat_ws("\n", lines).alias("text"))


lines_corpus = punctuate(chunked(corpus, 6, "\n")).repartition(32).cache()
paras_corpus = chunked(corpus, 4, "\n\n").repartition(32).cache()
n_docs = lines_corpus.count()
paras_corpus.count()  # materialize both caches before timing


def suite(ldocs, pdocs):
    t0 = time.time()
    with cache.persist_scope():
        r1 = toext.c4_line_filters(ldocs).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_kept").alias("kept"),
            F.sum("keep_doc").alias("pages"),
        ).first()
        t1 = time.time()
    with cache.persist_scope():
        r2 = dedup.paragraph_dedup(pdocs).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_paras").alias("paras"),
            F.sum("n_removed").alias("rm"),
        ).first()
        t2 = time.time()
    return (int(r1["kept"]), int(r1["pages"]), int(r2["paras"]),
            int(r2["rm"]), round(t1 - t0, 2), round(t2 - t1, 2))


tiny_l = lines_corpus.filter(F.col("doc_id") % 100 == 0).cache()
tiny_p = paras_corpus.filter(F.col("doc_id") % 100 == 0).cache()
tiny_l.count(); tiny_p.count()
_, _, _, _, cal_c4, cal_para = suite(tiny_l, tiny_p)

t0 = time.time()
kept, pages, paras, removed, t_c4, t_para = suite(lines_corpus, paras_corpus)
wall = time.time() - t0

rows = n_docs + paras
print("RESULT " + json.dumps({
    "cpus": cpus, "wall_sec": round(wall, 2), "n_docs": n_docs,
    "t_c4": t_c4, "t_para": t_para,
    "fixed_cost_sec": round(cal_c4 + cal_para, 2),
    "kept_lines": kept, "kept_pages": pages,
    "n_paras": paras, "n_removed_paras": removed,
    "throughput_rows_per_sec": round(rows / wall, 1),
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
    k2 = best[2]["wall_sec"] - best[2]["fixed_cost_sec"]
    k8 = best[8]["wall_sec"] - best[8]["fixed_cost_sec"]
    print(json.dumps({
        "best": best,
        "scaling_efficiency_2_to_8_raw": round(eff, 3),
        "scaling_efficiency_2_to_8_kernel": round(k2 / (4 * k8), 3),
    }, indent=1))


if __name__ == "__main__":
    main()
