"""SparkSession helper with the engine's recommended conf.

Defaults are tuned for correctness-at-scale: AQE on (skew-join splitting +
partition coalescing replace the reference's manual ``n_blocks`` machinery,
string_grouper.py:387-415), Arrow on (all our Python kernels are
pandas_udf/mapInPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "string_grouper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_MASTER overrides (e.g. local-cluster[4,8,16384] for
    # multi-executor-JVM runs — single-JVM local[32] hits execution-memory
    # pool lock contention past ~8 task threads; see bench_scaling.py)
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(32, int(cpus) if cpus.isdigit() else 32))
    ))
    # shuffle spill dir: prefer tmpfs — in local mode every shuffle write
    # lands on one shared disk, which serializes otherwise-parallel stages
    # (measured: shuffle-heavy stages ANTI-scaled 8->32 cores on /tmp)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        # per-process dir: concurrent/previous sessions' shutdown cleaners
        # must never race with this one's live shuffle files
        local_dir = f"/dev/shm/spark_local_{os.getpid()}"
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.local.dir", local_dir or "/tmp")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # iterative pipelines (CC) run many short stages; waiting 3s per
        # task wave for cache locality dwarfs the stages themselves on
        # multi-executor local-cluster runs
        .config("spark.locality.wait", "0s")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # join strategy: prefer shuffled-hash over sort-merge when the
        # planner's size checks allow it, and let AQE rewrite SMJ->SHJ when
        # every post-shuffle partition is under 128 MB.  The engine's
        # dominant joins attach packed array columns (codes/ws vectors) to
        # slim id pairs — hashing the bounded side beats sorting array-heavy
        # rows (guide: sort-merge always works but is slowest; measured ~10%
        # on the flagship re-score at sf0.1).  Scale-safe: both paths fall
        # back to sort-merge when the per-partition build side could exceed
        # the threshold, so no local-only assumption is baked in.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m"
        )
        # every LIMIT in the engine is a cap-guard (e.g. the bounded-vocab
        # IDF collect) that nearly always needs EVERY partition: start the
        # limit scan at the full shuffle width instead of 1-partition
        # incremental probing (1 -> 4 -> 16 ... sequential mini-jobs)
        .config("spark.sql.limit.initialNumPartitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound each Arrow batch: packed-posting rows carry ~10KB of arrays,
        # so the default 10k-row batches would hold ~100MB per python worker
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # local mode = one JVM: size the heap to the machine, not a container
        # default (measured: 8g heap + 32 tasks of array-heavy joins => GC
        # livelock, stages stop scaling past 8 cores)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        # local-cluster mode: the master string caps WORKER memory; executor
        # heap is still spark.executor.memory (default 1g!) — size it too
        .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "4g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
