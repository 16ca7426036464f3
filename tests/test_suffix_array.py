"""Distributed suffix-array pass: exactness vs a brute-force k-gram join,
boundary stitching across range partitions, span values on planted runs."""
import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from string_grouper_spark.config import MatchConfig
from string_grouper_spark.functions.normalize import py_normalize
from string_grouper_spark.operators.suffix_array import (
    _pairwise_lcp,
    suffix_array_dedup,
    suffix_array_spans,
)

MIN_LEN = 16


def _brute_components(texts: dict, min_len: int = MIN_LEN) -> dict:
    """Closure over 'shares an exact >= min_len normalized substring'."""
    cfg = MatchConfig()
    grams = {}
    for did, t in texts.items():
        norm = py_normalize(t, cfg)
        for i in range(len(norm) - min_len + 1):
            grams.setdefault(norm[i : i + min_len], set()).add(did)
    parent = {d: d for d in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in grams.values():
        members = sorted(members)
        for a, b in zip(members, members[1:]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in texts}


def _mkdocs(spark, texts: dict):
    pdf = pd.DataFrame(
        {"doc_id": list(texts.keys()), "text": list(texts.values())}
    )
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def corpus():
    # deterministic low-entropy webtext-ish corpus with planted structure:
    # exact dups, long-shared-span pairs, a boilerplate run in many docs,
    # and unrelated docs
    rng = np.random.default_rng(11)
    vocab = [f"w{i:02d}" for i in range(40)]
    texts = {}
    for d in range(40):
        words = rng.choice(vocab, size=30).tolist()
        texts[d] = " ".join(words)
    # exact duplicate pair
    texts[40] = texts[0]
    # shared interior run (well over min_len after normalization)
    shared = "the quick brown fox jumps over the lazy dog again"
    texts[41] = texts[1][:50] + " " + shared + " " + texts[2][:40]
    texts[42] = texts[3][:30] + " " + shared + " " + texts[4][:60]
    # boilerplate footer in many docs (hot run for the range partitioner)
    footer = "copyright example site all rights reserved"
    for d in range(43, 55):
        texts[d] = " ".join(rng.choice(vocab, size=20).tolist()) + " " + footer
    # too-short doc (fewer than min_len normalized bytes)
    texts[55] = "tiny"
    return texts


def test_components_match_bruteforce(spark, corpus):
    docs = _mkdocs(spark, corpus)
    got = (
        suffix_array_dedup(docs, min_len=MIN_LEN, num_partitions=7)
        .toPandas()
        .set_index("doc_id")["component"]
        .to_dict()
    )
    want = _brute_components(corpus)
    assert got == want
    # the planted structures actually exercised something
    assert want[40] == want[0]
    assert want[41] == want[42]
    comps = {}
    for d in range(43, 55):
        comps.setdefault(want[d], 0)
    assert len(comps) == 1  # footer chains all 12 docs together


def test_partition_count_invariance(spark, corpus):
    docs = _mkdocs(spark, corpus)
    a = suffix_array_dedup(docs, min_len=MIN_LEN, num_partitions=2).toPandas()
    b = suffix_array_dedup(docs, min_len=MIN_LEN, num_partitions=13).toPandas()
    assert (
        a.sort_values("doc_id").reset_index(drop=True).equals(
            b.sort_values("doc_id").reset_index(drop=True)
        )
    )


def test_span_values_on_planted_runs(spark, corpus):
    docs = _mkdocs(spark, corpus)
    spans = suffix_array_spans(
        docs, min_len=MIN_LEN, truncate=64, num_partitions=5
    ).toPandas()
    assert (spans["span"] >= MIN_LEN).all()
    by_pair = spans.set_index(["left", "right"])["span"].to_dict()
    # exact duplicate: span = min(len(norm), truncate) = truncate here
    cfg = MatchConfig()
    n0 = len(py_normalize(corpus[0], cfg))
    assert by_pair[(0, 40)] == min(n0, 64)
    # interior shared run: at least the normalized run length (the random
    # flanks can only extend it), capped at truncate
    shared_norm = py_normalize(
        "the quick brown fox jumps over the lazy dog again", cfg
    )
    assert by_pair[(41, 42)] >= min(len(shared_norm), 64) - 1


def test_no_cross_doc_edges_below_min_len(spark):
    texts = {0: "abcdefghijklmnop", 1: "qrstuvwxyz012345", 2: "completely other"}
    docs = _mkdocs(spark, texts)
    spans = suffix_array_spans(docs, min_len=16).toPandas()
    assert len(spans) == 0
    comp = suffix_array_dedup(docs, min_len=16).toPandas()
    assert sorted(comp["component"]) == [0, 1, 2]  # all singletons


def test_pairwise_lcp_kernel():
    assert _pairwise_lcp([], 4).tolist() == []
    assert _pairwise_lcp([b"abcd"], 4).tolist() == []
    got = _pairwise_lcp([b"abcd", b"abcdef", b"abcf", b"zz"], 2)
    # capped at shorter member; argmax on first mismatch; no overlap
    assert got.tolist() == [4, 3, 0]
    # equal strings LCP at their true length, not the pad width
    assert _pairwise_lcp([b"aa", b"aa", b"aab"], 2).tolist() == [2, 2]


def test_validation_errors(spark, corpus):
    docs = _mkdocs(spark, corpus)
    with pytest.raises(ValueError, match="min_len"):
        suffix_array_spans(docs, min_len=1)
    with pytest.raises(ValueError, match="truncate"):
        suffix_array_spans(docs, min_len=16, truncate=8)


def test_truncate_min_len_components_identical(spark, corpus):
    """The dedup default truncate=min_len must give the SAME components as
    the span-reporting truncate (min_len+32): gram-equality is lossless
    for connectivity, only span magnitude is lost."""
    docs = _mkdocs(spark, corpus)
    short = suffix_array_dedup(
        spark.createDataFrame(docs.toPandas()), min_len=MIN_LEN,
        num_partitions=5,
    ).toPandas().set_index("doc_id")["component"].to_dict()
    long = suffix_array_dedup(
        spark.createDataFrame(docs.toPandas()), min_len=MIN_LEN,
        truncate=MIN_LEN + 32, num_partitions=5,
    ).toPandas().set_index("doc_id")["component"].to_dict()
    assert short == long
