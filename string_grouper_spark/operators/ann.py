"""Similarity search over embedding columns (array<float>).

Two paths:
  * ``cosine_topk_bruteforce`` — exact baseline: normalized-vector dot via a
    broadcast of the (small) query side, pure JVM expressions
    (``zip_with`` + ``aggregate``), no UDF.
  * ``lsh_cosine_topk`` — scale path: random-hyperplane (sign-LSH) bucketing
    so only docs sharing a band key are compared; the same exact JVM scorer
    re-scores candidates.  Hyperplanes are deterministic (seeded) and built
    driver-side as literal arrays — broadcast automatically with the plan.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _norm_expr(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x))


def _dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda s, x: s + x)


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds ``unit`` (array<double>, L2=1) — precompute once, reuse in joins."""
    nrm = _norm_expr(F.col(vec_col))
    return df.withColumn(
        "unit",
        F.when(nrm > 0, F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm)),
    )


def cosine_topk_bruteforce(
    items: DataFrame,
    queries: Optional[DataFrame] = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_self_search_rows: Optional[int] = 50_000,
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, item_id, cos) per query.

    ``queries`` defaults to ``items`` (self-search, excluding self-pairs).
    The smaller side should be the query side — it is broadcast, making the
    pairwise scoring a map-only stage; the only shuffle is the top-k window
    on query_id.

    This is the EXACT BASELINE / recall oracle, O(|queries| * |items|): for
    full self-search it broadcasts the whole corpus and cross-joins it with
    itself, so above ``max_self_search_rows`` it refuses and points at
    ``lsh_cosine_topk`` (pass ``None`` to override for oracle runs).
    """
    self_search = queries is None
    if self_search and max_self_search_rows is not None:
        probe = items.limit(max_self_search_rows + 1).count()
        if probe > max_self_search_rows:
            raise ValueError(
                f"cosine_topk_bruteforce self-search on > {max_self_search_rows} "
                "rows is an O(n^2) full-corpus broadcast cross-join; use "
                "lsh_cosine_topk (scale path) or pass max_self_search_rows=None "
                "to force the exact baseline."
            )
    qs = queries if queries is not None else items
    it = with_unit_vectors(items.select(F.col(id_col).alias("item_id"), vec_col), vec_col)
    qu = with_unit_vectors(qs.select(F.col(id_col).alias("query_id"), vec_col), vec_col)
    pairs = F.broadcast(
        qu.select("query_id", F.col("unit").alias("_qu"))
    ).crossJoin(it.select("item_id", F.col("unit").alias("_iu")))
    if self_search:
        pairs = pairs.where(F.col("query_id") != F.col("item_id"))
    scored = pairs.select(
        "query_id", "item_id", _dot_expr(F.col("_qu"), F.col("_iu")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(k))
        .drop("_rn")
    )


_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("item_id", LongType(), False),
        StructField("cos", DoubleType(), False),
    ]
)


def cosine_topk_blocked(
    items: DataFrame,
    queries: Optional[DataFrame] = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """EXACT top-k cosine neighbors, blocked-matmul formulation — the scale
    path for exact kNN (recall 1.0 by construction).

    The query matrix is collected once (bounded by ``max_query_rows``) and
    broadcast as a single numpy array; each item partition computes one
    ``block @ Q.T`` BLAS matmul and emits only its LOCAL top-k per query
    (ties at the k-th value included, so the global winner set is never
    truncated); a final window keeps the true top-k.  Shuffle volume is
    O(n_queries * k * n_partitions) rows — independent of corpus size per
    partition.  Versus the pure-Catalyst ``cosine_topk_bruteforce`` (per-pair
    interpreted ``aggregate`` lambdas) this is the vectorized form: one C
    matmul per block instead of n*m interpreted array folds.

    Query sides larger than ``max_query_rows`` are CHUNKED automatically:
    queries are split into ceil(n/max) hash-disjoint chunks
    (pmod(xxhash64(id))), each chunk runs as an independent bounded
    broadcast + map-only matmul job, and the per-chunk results are unioned
    (each query lives in exactly one chunk, so the top-k windows never
    interact).  Total compute stays O(n_items * n_queries) — the chunking
    bounds DRIVER/broadcast memory, which is what capped the self-search.
    """
    spark = items.sparkSession
    self_search = queries is None
    qs = queries if queries is not None else items
    kk = int(k)
    qunit = with_unit_vectors(
        qs.select(F.col(id_col).alias("_id"), vec_col), vec_col
    ).select("_id", "unit")

    n_q = qs.count()
    if n_q > max_query_rows:
        # hash-disjoint chunks: sizes are binomial around n/chunks, so the
        # per-chunk collect stays near max_query_rows without a global sort
        n_chunks = int(np.ceil(n_q / max_query_rows))
        qunit = qunit.withColumn(
            "_chunk", F.pmod(F.xxhash64("_id"), F.lit(n_chunks)).cast("int")
        )
        parts = [
            _blocked_topk_one_chunk(
                items, qunit.where(F.col("_chunk") == c).drop("_chunk"),
                kk, id_col, vec_col, self_search,
            )
            for c in range(n_chunks)
        ]
        local = parts[0]
        for p in parts[1:]:
            local = local.unionAll(p)
    else:
        local = _blocked_topk_one_chunk(
            items, qunit, kk, id_col, vec_col, self_search
        )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("item_id").asc())
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= kk)
        .drop("_rn")
    )


def _blocked_topk_one_chunk(
    items: DataFrame,
    qunit: DataFrame,
    kk: int,
    id_col: str,
    vec_col: str,
    self_search: bool,
) -> DataFrame:
    """One bounded query chunk: collect + broadcast the (_id, unit) frame,
    emit each item partition's local top-k per query via one BLAS matmul."""
    spark = items.sparkSession
    qpdf = qunit.toPandas()
    if not len(qpdf):
        return spark.createDataFrame([], _TOPK_SCHEMA)
    qids = qpdf["_id"].to_numpy(dtype=np.int64)
    qmat = np.stack(qpdf["unit"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast((qids, qmat))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, qm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = (mat / nrm) @ qm.T  # (block, n_queries)
            if self_search:
                sims[ids[:, None] == q_ids[None, :]] = -np.inf
            b = sims.shape[0]
            if b > kk:
                kth = np.partition(sims, b - kk, axis=0)[b - kk]
                # ties at the k-th value included; -inf self-pairs never emitted
                rows, cols = np.nonzero((sims >= kth) & np.isfinite(sims))
            else:
                rows, cols = np.nonzero(np.isfinite(sims))
            yield pd.DataFrame(
                {
                    "query_id": q_ids[cols],
                    "item_id": ids[rows],
                    "cos": sims[rows, cols],
                }
            )

    return items.select(id_col, vec_col).mapInPandas(run, _TOPK_SCHEMA)


def _hyperplanes(dim: int, num_planes: int, seed: int = 0x9E3D) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(num_planes, dim)).astype(float)


def _sign_lsh_buckets(
    unit: DataFrame, dim: int, num_tables: int, planes_per_table: int
) -> DataFrame:
    """(_id, unit) -> (_id, unit, tbl, key): one bucket row per hash table.

    Each table hashes a vector to ``planes_per_table`` sign bits (random
    hyperplanes, deterministic seed).  P(same key per table) =
    (1 - theta/pi)^planes_per_table — multiple tables recover recall.
    """
    planes = _hyperplanes(dim, num_tables * planes_per_table)

    def sign_bit(plane: np.ndarray):
        arr = F.array(*[F.lit(float(v)) for v in plane])
        return (_dot_expr(F.col("unit"), arr) > 0).cast("int")

    keys = []
    for t in range(num_tables):
        bits = [
            sign_bit(planes[t * planes_per_table + j]) * (2**j)
            for j in range(planes_per_table)
        ]
        keys.append(F.struct(F.lit(t).alias("tbl"), sum(bits).alias("key")))
    return unit.select(
        "_id", "unit", F.explode(F.array(*keys)).alias("bk")
    ).select("_id", "unit", F.col("bk.tbl").alias("tbl"), F.col("bk.key").alias("key"))


def lsh_cosine_topk(
    items: DataFrame,
    dim: int,
    k: int = 10,
    num_tables: int = 8,
    planes_per_table: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate self top-k via sign-LSH bucketing + exact re-score.

    Only bucketmates are scored: the cross join of brute force is replaced
    by an equi-join on the (table, key) bucket key.
    """
    unit = with_unit_vectors(items.select(F.col(id_col).alias("_id"), vec_col), vec_col)
    bucketed = _sign_lsh_buckets(unit, dim, num_tables, planes_per_table)
    l = bucketed.select("tbl", "key", F.col("_id").alias("query_id"), F.col("unit").alias("_qu"))
    r = bucketed.select("tbl", "key", F.col("_id").alias("item_id"), F.col("unit").alias("_iu"))
    cand = (
        l.join(r, ["tbl", "key"])
        .where(F.col("query_id") != F.col("item_id"))
        .dropDuplicates(["query_id", "item_id"])
    )
    scored = cand.select(
        "query_id", "item_id", _dot_expr(F.col("_qu"), F.col("_iu")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(k))
        .drop("_rn")
    )


def _kmeans_centroids(
    unit_sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 0xC3A7
) -> np.ndarray:
    """Spherical k-means on a driver-side sample (numpy, deterministic).

    Lloyd iterations with cosine assignment; empty clusters re-seeded from
    the farthest points.  The sample is bounded by the caller, so this is
    O(sample * centroids * iters) driver work — the standard IVF train step.
    """
    rng = np.random.RandomState(seed)
    n = len(unit_sample)
    cents = unit_sample[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(iters):
        sims = unit_sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = unit_sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    cents[c] = v / nrm
            else:
                cents[c] = unit_sample[sims.max(axis=1).argmin()]
    return cents


def ivf_cosine_topk(
    items: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 20_000,
    seed: int = 0xC3A7,
) -> DataFrame:
    """Approximate self top-k via IVF (inverted-file) bucketing.

    Train: spherical k-means centroids on a bounded driver sample.  Assign:
    every vector joins its ``nprobe`` nearest centroid cells (multi-probe on
    BOTH sides, so two vectors are candidates iff any probed cell overlaps).
    Score: exact JVM-side dot on bucketmates only + global top-k window.

    Data-adaptive counterpart of ``lsh_cosine_topk``: on clustered
    embeddings (the realistic case) small nprobe/n_centroids gives near-1
    recall at ~nprobe/n_centroids of the brute-force comparisons; on
    uniform-random vectors (worst case, no structure) recall degrades
    gracefully with nprobe — measure on your corpus.
    """
    unit = with_unit_vectors(items.select(F.col(id_col).alias("_id"), vec_col), vec_col)
    sample_pdf = unit.select("unit").limit(train_sample).toPandas()
    sample = np.stack(sample_pdf["unit"].to_numpy()).astype(np.float64)
    cents = _kmeans_centroids(sample, n_centroids, seed=seed)
    spark = items.sparkSession
    bc = spark.sparkContext.broadcast(cents)
    npb = int(min(nprobe, len(cents)))

    from pyspark.sql.types import ArrayType, DoubleType as _Dbl

    assign_schema = StructType(
        [
            StructField("_id", LongType(), False),
            StructField("cell", LongType(), False),
            StructField("unit", ArrayType(_Dbl()), True),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            units = pdf["unit"].to_numpy()
            mat = np.stack(units).astype(np.float64)
            sims = mat @ C.T
            probes = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
            # carry the unit vector through so no second evaluation/join of
            # the (interpreted) normalization expression is needed
            yield pd.DataFrame(
                {
                    "_id": np.repeat(ids, npb),
                    "cell": probes.ravel().astype(np.int64),
                    "unit": np.repeat(units, npb),
                }
            )

    assigned = unit.select("_id", "unit").mapInPandas(assign, assign_schema)
    l = assigned.select("cell", F.col("_id").alias("query_id"), F.col("unit").alias("_qu"))
    r = assigned.select("cell", F.col("_id").alias("item_id"), F.col("unit").alias("_iu"))
    cand = (
        l.join(r, "cell")
        .where(F.col("query_id") != F.col("item_id"))
        .dropDuplicates(["query_id", "item_id"])
    )
    scored = cand.select(
        "query_id", "item_id", _dot_expr(F.col("_qu"), F.col("_iu")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(k))
        .drop("_rn")
    )


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    dim: Optional[int] = None,
    num_tables: int = 8,
    planes_per_table: int = 8,
    round_digits: Optional[int] = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (left_id < right_id, cos).

    ``method='lsh'`` (scale path): sign-LSH bucket equi-join generates
    candidates, exact JVM dot decides — cost scales with bucket collisions,
    not corpus^2.  ``method='exact'``: all-pairs broadcast scan, the oracle
    baseline for small corpora.  ``round_digits``: threshold on the rounded
    cosine so an independent oracle engine tie-breaks identically.
    """
    unit = with_unit_vectors(items.select(F.col(id_col).alias("_id"), vec_col), vec_col)
    if method == "exact":
        l = unit.select(F.col("_id").alias("left_id"), F.col("unit").alias("_ul"))
        r = unit.select(F.col("_id").alias("right_id"), F.col("unit").alias("_ur"))
        cand = F.broadcast(l).crossJoin(r).where(F.col("left_id") < F.col("right_id"))
    elif method == "lsh":
        if dim is None:
            dim = len(items.select(vec_col).first()[0])
        bucketed = _sign_lsh_buckets(unit, dim, num_tables, planes_per_table)
        l = bucketed.select("tbl", "key", F.col("_id").alias("left_id"), F.col("unit").alias("_ul"))
        r = bucketed.select("tbl", "key", F.col("_id").alias("right_id"), F.col("unit").alias("_ur"))
        cand = (
            l.join(r, ["tbl", "key"])
            .where(F.col("left_id") < F.col("right_id"))
            .dropDuplicates(["left_id", "right_id"])
        )
    else:
        raise ValueError(method)
    cos = _dot_expr(F.col("_ul"), F.col("_ur"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        cand.select("left_id", "right_id", cos.alias("cos"))
        .where(F.col("cos") >= float(threshold))
    )


def embedding_dedup_clusters(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    **kwargs,
) -> DataFrame:
    """Embedding-cosine near-dup CLUSTERING: pairs >= threshold -> connected
    components.  Returns (<id_col>, component), component = min id — the
    embedding-space sibling of the text dedup pipelines (single-linkage,
    same CC kernel)."""
    from .grouping import connected_components

    pairs = embedding_near_dup_pairs(
        items, threshold, id_col=id_col, vec_col=vec_col, method=method, **kwargs
    )
    nodes = items.select(F.col(id_col))
    return connected_components(
        pairs.select(F.col("left_id").alias("u"), F.col("right_id").alias("v")), nodes
    ).withColumnRenamed("node", id_col)
