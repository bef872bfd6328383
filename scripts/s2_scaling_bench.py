"""Two-parallelism scaling evidence for the round-6 S2 stack: clustered
write (`spatial_store.spatial_cluster_write`) + pruned AOI read
(`spatial_store.read_aoi`) + the S2 encoder itself.

Same protocol as scripts/exactsubstr_scaling_bench.py (BASELINE.json north
rule — no real cluster in the sandbox, so N -> 4N is evidenced as local[2]
vs local[8] on IDENTICAL input, subprocess-isolated sessions, fixed shuffle
partitions, per-run hypervisor steal reported, best-of-reps clean window).

Input (deterministic, no external data): 5,000,000 points hash-scattered
over a 40 x 25 degree window (Europe-sized, crosses the face-0/face-2 cube
edge at lat 45 — the wrap-handling hot path).  part_level=7 (~0.42 deg
cells) gives ~4,700 occupied partitions; the AOI is a 3 x 3 degree box.

Suite per run:
  1. s2_keys     — encode 5M points to (part, leaf) ids and count distinct
                   parts: the batched-Hilbert-encoder kernel, map-only —
                   the scaling floor should be near-ideal.
  2. write       — spatial_cluster_write (repartition(s2_part) shuffle +
                   Hilbert sortWithinPartitions + hive-partitioned write):
                   the shuffle+IO-bound member.
  3. aoi_read    — read_aoi over the written store (partition-pruned scan
                   + exact predicate), reporting rows and the
                   touched/total partition-directory ratio.

Fixed-cost calibration = identical sequence at 100x fewer points (Amdahl
floor).  Appends nothing; results recorded by hand in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys

_RUN_SRC = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from geetiles_spark.session import get_spark

cpus = int(sys.argv[1])
spark = get_spark(app_name=f"s2-scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=32)
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
def ident(b):
    for pdf in b: yield pdf
spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(ident, "id long").count()

from pyspark.sql import functions as F
from geetiles_spark.catalog import Catalog
from geetiles_spark.operators import spatial_store as ss

N = 5_000_000
AOI = (2.0, 43.0, 5.0, 46.0)   # 3x3 deg, straddles the lat-45 face edge

def points(n, shrink=1):
    # shrink > 1 scales the AREA down with the row count (shrink^2 fewer
    # square degrees), keeping density constant: partition-directory count
    # is O(occupied cells), so a rows-only calibration would still create
    # ~all directories and measure FS overhead, not the Amdahl floor
    return spark.range(n).select(
        F.col("id"),
        (F.lit(-10.0) + (F.abs(F.hash("id")) % 4000000) / (100000.0 * shrink)).alias("lon"),
        (F.lit(32.0) + (F.abs(F.hash(F.col("id") * 31 + 7)) % 2500000) / (100000.0 * shrink)).alias("lat"),
    )

def suite(n, tag, shrink=1):
    pts = points(n, shrink)
    t0 = time.time()
    nparts = (
        ss.with_s2_keys(pts, part_level=7, leaf_level=20)
        .agg(F.countDistinct("s2_part").alias("p")).first()["p"]
    )
    t1 = time.time()
    d = tempfile.TemporaryDirectory(prefix=f"s2bench_{tag}_")
    cat = Catalog(d.name)
    ss.spatial_cluster_write(cat, "pts", pts, part_level=7, leaf_level=20)
    t2 = time.time()
    aoi_rows = ss.read_aoi(cat, spark, "pts", *AOI).count()
    t3 = time.time()
    snap = cat.snapshot_path("pts")
    ndirs = sum(1 for x in os.listdir(snap) if x.startswith("s2_part="))
    d.cleanup()
    return {
        "t_keys": round(t1 - t0, 2), "t_write": round(t2 - t1, 2),
        "t_read": round(t3 - t2, 2), "n_parts": nparts,
        "aoi_rows": aoi_rows, "n_dirs": ndirs,
    }

cal = suite(N // 100, "cal", shrink=10)
t0 = time.time()
full = suite(N, "full")
wall = time.time() - t0

from geetiles_spark.geo import s2
cover = len(s2.cover_bbox(*AOI, 7))
print("RESULT " + json.dumps({
    "cpus": cpus, "wall_sec": round(wall, 2), "n_points": N,
    **full,
    "fixed_cost_sec": round(cal["t_keys"] + cal["t_write"] + cal["t_read"], 2),
    "cover_cells": cover,
    "dir_touch_ratio": round(min(cover, full["n_dirs"]) / full["n_dirs"], 4),
    "throughput_rows_per_sec": round(N / wall, 1),
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
