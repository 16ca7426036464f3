#!/usr/bin/env python
"""Headline benchmark for the driver (one JSON line to stdout).

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32) — run at 8 and 32 for
                      the N->4N scaling-efficiency evidence (BASELINE.md)

Queries (the engine's production shapes):
  lsh_dedup       MinHash-LSH candidates -> exact re-score -> clusters (flagship)
  exact_pairs_1k  exact all-pairs TF-IDF join on a 1000-doc slice (parity path)
  simhash_cand    SimHash signatures + hamming-ball candidate join
  substring       suffix-window containment pass (winnowed fingerprints)
  suffix_array    distributed suffix-array pass: exact shared >= 24-byte
                  normalized runs via range-partitioned suffix sort +
                  adjacent-LCP scan
  ann_topk        blocked-matmul exact cosine top-10 over embeddings (+
                  recall vs the per-pair oracle on a 100-query sample)
  text_stats      language-id + quality + fingerprint full scan
  gopher          the published Gopher quality gate (19 thresholds: word/
                  line screens + the full repetition family), kept-count
  warc_read       Common-Crawl container ingest: 32 .warc.gz shards ->
                  distributed member-by-member parse -> byte-exact text
                  extraction (write is untimed setup)
  pages_dedup     north-rule table shape end-to-end: pages(html binary) ->
                  byte-exact text extraction -> flagship LSH dedup, with
                  dup-pair recall vs generated ground truth and
                  dedup-pairs/sec counters (the BASELINE.json metric)
  pages_dedup_union  the three-generator surface (minhash ∪ substring
                  containment) on the same pages — recall vs ALL ground
                  truth pairs, no excluded edit classes (anchor_len=48:
                  32-byte windows; the default 12-byte windows are
                  unselective on low-entropy webtext — measured 4.26M
                  candidates vs 15k, see BASELINE.md)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from string_grouper_spark.config import MatchConfig  # noqa: E402
from string_grouper_spark.functions import text_stats  # noqa: E402
from string_grouper_spark.operators import ann, candidates, dedup  # noqa: E402
from string_grouper_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("string_grouper_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()
    # Flagship dedup runs at the reference's default min_similarity=0.8
    # (matching its 663k-company-names benchmark config).  0.8-cosine pairs
    # in this corpus have 3-gram Jaccard >= 0.94, so 16 bands x 8 rows gives
    # candidate recall ~1-3e-7 with ~1000x fewer candidates than r=2 banding.
    cfg = MatchConfig(min_similarity=0.8, max_n_matches=1_000_000)
    # Flagship production precision: the reference's tfidf_matrix_dtype=
    # float32 option (string_grouper.py:161-164) — the fast plan ships true
    # 4-byte weights, cutting total flagship shuffle 707 -> 483 MB at 120k
    # docs with an identical cluster partition (measured + tested; the
    # oracle-gated driver queries stay float64 for DuckDB hash parity).
    cfg_flag = MatchConfig(
        min_similarity=0.8, max_n_matches=1_000_000, tfidf_matrix_dtype="float32"
    )
    cfg_pairs = MatchConfig(min_similarity=0.5, max_n_matches=1_000_000)

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    counters: dict[str, int] = {"n_docs": n_docs}
    # single-shot timings on this shared host carry >2x run-to-run noise
    # (BASELINE.md): take the median of REPS runs, report min alongside
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def timed(name, fn):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            counters[f"{name}_rows"] = fn()
            walls.append(time.time() - t0)
        timings[name] = round(statistics.median(walls), 3)
        timings_min[name] = round(min(walls), 3)

    from string_grouper_spark.plans.fast_dedup import fast_lsh_dedup

    skew_stats: dict = {}
    timed(
        "lsh_dedup",
        lambda: fast_lsh_dedup(
            docs, cfg_flag, num_perm=128, num_bands=16, n_docs=n_docs,
            drop_stats=skew_stats,
        ).count(),
    )
    docs1k = docs.where(F.col("doc_id") < 1000).persist()
    n1k = docs1k.count()
    timed(
        "exact_pairs_1k",
        lambda: dedup.near_duplicate_pairs(docs1k, cfg_pairs, n_docs=n1k).count(),
    )
    # 'fast' engine: signatures in ONE narrow mapInPandas pass (no shuffle
    # before the block join) — measured 4-5x faster than the explode+groupBy
    # engines at sf0.1, same pigeonhole-exhaustive join semantics
    timed(
        "simhash_cand",
        lambda: candidates.simhash_candidates(
            docs, cfg, max_hamming=3, engine="fast"
        ).count(),
    )
    timed(
        "substring",
        lambda: candidates.substring_containment(docs, cfg, anchor_len=24).count(),
    )
    # north-rule generator #3 as a true sorted-suffix structure: exact
    # shared >= 24-byte runs, range-partitioned suffix sort + adjacent-LCP
    # scan (linear in run length — no bucket-size caps needed)
    from string_grouper_spark.operators.suffix_array import suffix_array_spans

    timed(
        "suffix_array",
        lambda: suffix_array_spans(docs, cfg, min_len=24).count(),
    )
    # ANN headline = the SCALE path: blocked-matmul exact top-k (one BLAS
    # matmul per partition + local top-k, shuffle O(q*k*parts)) — exact by
    # construction; the per-pair Catalyst brute force serves only as the
    # independent recall oracle on a 100-query sample.
    timed("ann_topk", lambda: ann.cosine_topk_blocked(emb, k=10).count())
    sample_q = emb.where(F.col("vec_id") < 100)
    # oracle with explicit queries keeps self-pairs (cos=1) — ask for k+1 and
    # drop them so both sides rank the same non-self top-10
    oracle = ann.cosine_topk_bruteforce(emb, sample_q, k=11).toPandas()
    oracle = (
        oracle[oracle.query_id != oracle.item_id]
        .sort_values(["query_id", "cos", "item_id"], ascending=[True, False, True])
        .groupby("query_id")
        .head(10)
    )
    got = ann.cosine_topk_blocked(emb, k=10).where(F.col("query_id") < 100).toPandas()
    opairs = set(zip(oracle.query_id, oracle.item_id))
    gpairs = set(zip(got.query_id, got.item_id))
    counters["ann_recall_pct"] = round(100.0 * len(opairs & gpairs) / max(1, len(opairs)), 2)
    # approximate-path recall, driver-visible (VERDICT r3 #8): both are
    # self-searches excluding self-pairs, so the exact blocked result above
    # is the reference set on the same 100-query sample
    dim = len(emb.select("embedding").first()[0])
    for name, adf in [
        ("lsh", ann.lsh_cosine_topk(emb, dim=dim, k=10)),
        ("ivf", ann.ivf_cosine_topk(emb, k=10)),
    ]:
        ap = adf.where(F.col("query_id") < 100).toPandas()
        apairs = set(zip(ap.query_id, ap.item_id))
        counters[f"ann_recall_{name}_pct"] = round(
            100.0 * len(gpairs & apairs) / max(1, len(gpairs)), 2
        )
    # the driver's embeddings are i.i.d. uniform — sign-LSH's documented
    # worst case (no cluster structure).  Also report recall on a
    # deterministic CLUSTERED set, the realistic near-dup regime:
    import numpy as np

    rng = np.random.RandomState(0xC10C)
    cents = rng.normal(size=(100, 64))
    cvecs = np.repeat(cents, 20, axis=0) + 0.15 * rng.normal(size=(2000, 64))
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(cvecs)],
        "vec_id long, embedding array<double>",
    ).persist()
    cdf.count()
    cexact = ann.cosine_topk_blocked(cdf, k=10).where(F.col("query_id") < 100).toPandas()
    clsh = (
        ann.lsh_cosine_topk(cdf, dim=64, k=10)
        .where(F.col("query_id") < 100)
        .toPandas()
    )
    ce = set(zip(cexact.query_id, cexact.item_id))
    cl = set(zip(clsh.query_id, clsh.item_id))
    counters["ann_recall_lsh_clustered_pct"] = round(
        100.0 * len(ce & cl) / max(1, len(ce)), 2
    )
    # round-5: the RETRIEVAL shape (query batch vs frozen index) on the same
    # clustered set — unseen queries drawn from the same centroids, exact
    # reference via cosine_topk_blocked with explicit queries (keeps
    # self-pairs; the frozen index does too, so the sets compare directly)
    qvecs = cents[:50] + 0.15 * rng.normal(size=(50, 64))
    qdf = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in v]) for i, v in enumerate(qvecs)],
        "vec_id long, embedding array<double>",
    )
    fexact = ann.cosine_topk_blocked(cdf, qdf, k=10).toPandas()
    fidx = ann.PrefitAnnIndex(cdf, method="lsh", dim=64)
    fgot = fidx.topk(qdf, k=10).toPandas()
    fidx.unpersist()
    fe = set(zip(fexact.query_id, fexact.item_id))
    fg = set(zip(fgot.query_id, fgot.item_id))
    counters["ann_recall_frozen_lsh_pct"] = round(
        100.0 * len(fe & fg) / max(1, len(fe)), 2
    )
    cdf.unpersist()
    timed(
        "text_stats",
        lambda: text_stats.fingerprint(
            text_stats.quality_score(text_stats.language_id(docs))
        )
        .agg(F.count(F.lit(1)))
        .first()[0],
    )
    # the published Gopher gate: word/line screens + the full repetition
    # family in one map pass + one partial-agg shuffle
    from string_grouper_spark.functions.gopher import gopher_filter  # noqa: E402

    # sf0.1 documents arrive as ONE parquet split; a real crawl arrives as
    # thousands — repartition so the narrow stats pass runs parallel like
    # it would on real input (partitioning is the caller's concern)
    gdocs = docs.repartition(int(cpus)).persist()
    gdocs.count()
    timed("gopher", lambda: gopher_filter(gdocs).where(F.col("kept")).count())
    # WHY docs drop (the synthetic vocabulary has no English stop words, so
    # kept=0 here is the corpus, not the gate): reason histogram
    counters["gopher_reasons"] = {
        r["r"]: r["n"]
        for r in gopher_filter(gdocs)
        .select(F.explode("drop_reasons").alias("r"))
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    gdocs.unpersist()

    # ---- north-rule table shape: pages(url, warc_ts, html binary, lang) ----
    # Synthesized ON EXECUTORS (no driver materialization), text recovered
    # from the html BYTES, then the flagship plan — the BASELINE.json metric
    # is "dedup pairs/sec and dup-pair recall >= 0.99" on exactly this shape.
    from string_grouper_spark.sources.pages import (  # noqa: E402
        extract_text_expr,
        generate_pages_distributed,
    )

    pages = generate_pages_distributed(spark, n_docs, seed=11).persist()
    pages.count()
    pdocs = pages.select(
        F.col("page_id").alias("doc_id"),
        extract_text_expr(F.col("html")).alias("text"),
    ).persist()
    pdocs.count()
    # the timed body COLLECTS the slim (id, component) frame so the recall
    # counters below reuse the last rep instead of re-running the whole
    # clustering a fourth time (labels are 2 slim columns; collect cost is
    # noise next to the pipeline)
    _pl: dict = {}

    def _run_pages_dedup():
        _pl["labels"] = fast_lsh_dedup(
            pdocs, cfg_flag, num_perm=128, num_bands=16, n_docs=n_docs
        ).toPandas()
        return len(_pl["labels"])

    timed("pages_dedup", _run_pages_dedup)
    plabels = _pl["labels"]
    # dup pairs identified = sum over clusters of C(size, 2)
    sizes = plabels.groupby("component").size()
    dup_pairs = int((sizes * (sizes - 1) // 2).sum())
    counters["pages_dup_pairs"] = dup_pairs
    counters["pages_dedup_pairs_per_sec"] = round(
        dup_pairs / timings["pages_dedup"], 1
    )
    # ground-truth dup pairs at THIS config: cluster members 0-2 carry only
    # tokenizer-erased edits (case / comma-join), i.e. cosine 1.0 >= 0.8 —
    # every such pair MUST be found.  Member 3 is a 60% prefix slice whose
    # cosine ~0.77 sits below the 0.8 threshold BY DESIGN (it is the
    # substring generator's case, counted in `substring` above), so it is
    # excluded from the truth set, exactly as the reference's assignments at
    # min_similarity=0.8 would exclude it.
    truth = pages.select("page_id", "true_cluster").toPandas()
    truth = truth[truth.page_id % 4 < 3]
    merged = truth.merge(plabels, left_on="page_id", right_on="doc_id")
    tpairs: set = set()
    gpairs_pages: set = set()
    for _, grp in merged.groupby("true_cluster"):
        ids = sorted(grp.page_id)
        tpairs |= {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}
    for _, grp in merged.groupby("component"):
        ids = sorted(grp.page_id)
        gpairs_pages |= {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}
    counters["pages_dup_pair_recall_pct"] = round(
        100.0 * len(tpairs & gpairs_pages) / max(1, len(tpairs)), 2
    )
    # the three-generator union (minhash ∪ substring containment) also
    # covers the prefix-slice member the cosine threshold structurally
    # misses: recall vs ALL ground-truth pairs, NO excluded edit classes
    def _run_pages_union():
        _pl["ulabels"] = dedup.near_duplicate_clusters_scale(
            pdocs, cfg_flag, generators=("minhash", "substring"),
            num_perm=128, num_bands=16, n_docs=n_docs, anchor_len=48,
        ).toPandas()
        return len(_pl["ulabels"])

    timed("pages_dedup_union", _run_pages_union)
    ulabels = _pl["ulabels"]
    utruth = pages.select("page_id", "true_cluster").toPandas()
    umerged = utruth.merge(ulabels, left_on="page_id", right_on="doc_id")
    utpairs: set = set()
    ugpairs: set = set()
    for _, grp in umerged.groupby("true_cluster"):
        ids = sorted(grp.page_id)
        utpairs |= {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}
    for _, grp in umerged.groupby("component"):
        ids = sorted(grp.page_id)
        ugpairs |= {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}
    counters["pages_dup_pair_recall_all_pct"] = round(
        100.0 * len(utpairs & ugpairs) / max(1, len(utpairs)), 2
    )
    # the Common-Crawl CONTAINER path: shards written once (untimed setup),
    # then the distributed read -> byte-exact extraction -> count, the
    # ingest stage every real crawl job pays (one task per shard)
    import shutil
    import tempfile

    from string_grouper_spark.sources.warc import warc_to_pages, write_warc

    warc_dir = tempfile.mkdtemp(prefix="sgspark_bench_warc_")
    manifest = write_warc(pages, warc_dir, num_files=32)
    counters["warc_shard_bytes"] = int(manifest["n_bytes"].sum())
    timed(
        "warc_read",
        lambda: warc_to_pages(spark, warc_dir)
        .agg(F.count("text"))
        .first()[0],
    )
    shutil.rmtree(warc_dir, ignore_errors=True)
    pages.unpersist()
    pdocs.unpersist()

    total = round(sum(timings.values()), 3)
    # dedup throughput: docs fully near-dup-clustered per second (flagship)
    dedup_docs_per_sec = round(n_docs / timings["lsh_dedup"], 1)
    counters["lsh_skew_policy"] = skew_stats  # drops/salting are never silent
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (median of reps)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": timings_min,
                "reps": reps,
                "sf": sf,
                "cpus": int(cpus),
                "n_docs": n_docs,
                "dedup_docs_per_sec": dedup_docs_per_sec,
                "counters": counters,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
