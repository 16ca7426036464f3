#!/usr/bin/env python
"""Capture .explain('formatted') for the bench queries' informative stages.

Usage: python plans/r06/capture_plans.py before|after
Writes plans/r06/<query>_<tag>.txt.  For pipelines that end in a driver loop
(connected components) or a localCheckpoint, the final frame's plan is just a
checkpoint scan, so we capture the last *declarative* stage (the edge/pair
plan) plus one representative CC round.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from string_grouper_spark.config import MatchConfig  # noqa: E402
from string_grouper_spark.session import get_spark  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
out_dir = os.path.dirname(os.path.abspath(__file__))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("sgspark-plan-capture")
spark.sparkContext.setLogLevel("ERROR")


def dump(name: str, df):
    p = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(p, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print(f"wrote {p}")


docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
n_docs = docs.count()
cfg_flag = MatchConfig(min_similarity=0.8, max_n_matches=1_000_000,
                       tfidf_matrix_dtype="float32")
cfg = MatchConfig(min_similarity=0.8, max_n_matches=1_000_000)
cfg_pairs = MatchConfig(min_similarity=0.5, max_n_matches=1_000_000)

# ---- flagship: the re-score edge plan (pre-CC) + one CC round ----
from string_grouper_spark.plans.fast_dedup import (  # noqa: E402
    doc_term_arrays,
    doc_vectors,
    lsh_band_candidates,
    rescore_candidates_with_vecs,
)

terms = doc_term_arrays(docs, cfg_flag).persist()
vecs = doc_vectors(docs, cfg_flag, 128, 16, n_docs=n_docs, terms=terms).persist()
vecs.count()
cand = lsh_band_candidates(vecs, 1000, salt_above=None)
pairs = rescore_candidates_with_vecs(cand, vecs, cfg_flag)
dump("lsh_dedup_edges", pairs)

from string_grouper_spark.operators import grouping as G  # noqa: E402

edges = pairs.select(F.col("master_side").alias("u"), F.col("dupe_side").alias("v"))
cur = G._canonical_undirected(edges).localCheckpoint()
round1 = G._small_star(G._large_star(cur))
dump("lsh_dedup_cc_round", round1)
terms.unpersist()
vecs.unpersist()

# ---- exact_pairs_1k ----
from string_grouper_spark.operators import dedup  # noqa: E402

docs1k = docs.where(F.col("doc_id") < 1000)
dump("exact_pairs_1k", dedup.near_duplicate_pairs(docs1k, cfg_pairs, n_docs=1000))

# ---- simhash ----
from string_grouper_spark.operators import candidates  # noqa: E402

dump("simhash_cand", candidates.simhash_candidates(docs, cfg, max_hamming=3,
                                                   engine="fast"))

# ---- substring ----
dump("substring", candidates.substring_containment(docs, cfg, anchor_len=24))

# ---- suffix_array: the edge plan before the final checkpoint ----
from string_grouper_spark.operators import suffix_array as SA  # noqa: E402

_orig_ckpt = None
try:
    spans = SA.suffix_array_spans(docs, cfg, min_len=24)
    # the returned frame is checkpointed; capture the pre-checkpoint shape by
    # rebuilding the sorted-scan stage explicitly
    suffixes = SA._emit_suffixes(docs, cfg, 24, 56, "text", "doc_id")
    if hasattr(SA, "_partition_sorted"):
        sorted_suff = SA._partition_sorted(suffixes, 24, 32)
    else:
        sorted_suff = suffixes.repartitionByRange(32, "suff").sortWithinPartitions(
            "suff", "doc_id")
    dump("suffix_array_sorted", sorted_suff)
except Exception as e:  # pragma: no cover
    print("suffix capture failed:", e)

# ---- ann_topk ----
from string_grouper_spark.operators import ann  # noqa: E402

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
emb.count()
dump("ann_topk", ann.cosine_topk_blocked(emb, k=10))

# ---- text_stats ----
from string_grouper_spark.functions import text_stats  # noqa: E402

dump("text_stats", text_stats.fingerprint(
    text_stats.quality_score(text_stats.language_id(docs))))

# ---- gopher ----
from string_grouper_spark.functions.gopher import gopher_filter  # noqa: E402

gdocs = docs.repartition(32)
dump("gopher", gopher_filter(gdocs).where(F.col("kept")))

spark.stop()
