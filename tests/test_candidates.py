"""Candidate-generator recall vs the exact TF-IDF path (SURVEY §5 test plan
(b)): each generator + exact re-score must recover >= 0.99 of the exact
path's pairs at matched config on real testdata."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from string_grouper_spark.config import MatchConfig
from string_grouper_spark.operators import candidates as cand
from string_grouper_spark.operators.dedup import near_duplicate_pairs
from string_grouper_spark.operators.similarity import LEFT, RIGHT

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def exact_pairs(spark, docs):
    cfg = MatchConfig(min_similarity=0.5, max_n_matches=1_000_000)
    pdf = near_duplicate_pairs(docs, cfg).toPandas()
    return set(zip(pdf[LEFT], pdf[RIGHT]))


def _recall(got: pd.DataFrame, expected: set) -> float:
    got_pairs = set(zip(got[LEFT], got[RIGHT]))
    return len(got_pairs & expected) / len(expected)


def test_minhash_recall(spark, docs, exact_pairs):
    cfg = MatchConfig(min_similarity=0.5, max_n_matches=1_000_000)
    c = cand.minhash_candidates(docs, cfg, num_perm=128, num_bands=64)
    got = cand.rescored_pairs(docs, c, cfg).toPandas()
    r = _recall(got, exact_pairs)
    assert r >= 0.99, f"minhash recall {r:.4f} over {len(exact_pairs)} pairs"
    # precision is exact by construction: every surviving pair has true sim>=0.5
    assert set(zip(got[LEFT], got[RIGHT])) <= exact_pairs


def test_simhash_hamming_ball_exhaustive(spark, docs, exact_pairs):
    # Pigeonhole contract: the 4x16-bit block join must find EXACTLY the
    # signature pairs within Hamming distance 3 — verified against a
    # brute-force O(n^2) hamming scan of the collected signatures.
    import numpy as np

    cfg = MatchConfig(min_similarity=0.5, max_n_matches=1_000_000)
    c = cand.simhash_candidates(docs, cfg, max_hamming=3).toPandas()
    got_pairs = set(zip(c[LEFT], c[RIGHT]))

    sigs = cand.simhash_signatures(docs, cfg).toPandas().sort_values("doc_id")
    ids = sigs["doc_id"].to_numpy()
    sv = sigs["simhash"].to_numpy().astype(np.uint64)
    xors = sv[:, None] ^ sv[None, :]
    dist = np.zeros_like(xors, dtype=np.int64)
    for b in range(64):
        dist += ((xors >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
    want = set()
    n = len(ids)
    iu, ju = np.nonzero(dist <= 3)
    for i, j in zip(iu, ju):
        if ids[i] < ids[j]:
            want.add((int(ids[i]), int(ids[j])))
    assert got_pairs == want

    # and the rescored output stays a subset of the exact >=0.5 pairs
    got = cand.rescored_pairs(docs, spark.createDataFrame(c), cfg).toPandas()
    assert set(zip(got[LEFT], got[RIGHT])) <= exact_pairs


def test_jaccard_pairs_exactness(spark, docs):
    # Jaccard operator is exact set math — cross-check a sample in pandas
    cfg = MatchConfig()
    out = cand.jaccard_pairs(docs, cfg, min_jaccard=0.5).toPandas()
    assert len(out) > 0
    from string_grouper_spark.functions.normalize import py_ngrams

    pdf = docs.select("doc_id", "text").toPandas().set_index("doc_id")["text"]
    for _, row in out.head(20).iterrows():
        a = set(py_ngrams(pdf[row[LEFT]], cfg))
        b = set(py_ngrams(pdf[row[RIGHT]], cfg))
        expected = len(a & b) / len(a | b)
        assert abs(expected - row["jaccard"]) < 1e-9


def test_substring_containment_exact(spark):
    cfg = MatchConfig()
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "quick brown fox",              # substring of 0
                "THE QUICK BROWN FOX",          # case-folds to prefix of 0
                "completely different content here",
                "fox jumps over the lazy",      # mid-substring of 0
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    out = cand.substring_containment(docs, cfg, anchor_len=8).toPandas()
    got = set(zip(out["inner_id"], out["outer_id"]))
    assert (1, 0) in got
    assert (2, 0) in got
    assert (4, 0) in got
    assert all(p[0] != 3 and p[1] != 3 for p in got)


def test_simhash_expr_matches_numpy_kernel(spark, docs):
    # the Catalyst simhash must be bit-identical to the numpy reference kernel
    import pyspark.sql.functions as F

    from string_grouper_spark.functions.tfidf import DOC, GRAM, tokenize
    from string_grouper_spark.operators.candidates import _simhash64

    cfg = MatchConfig()
    tokens = tokenize(docs.limit(100), cfg)
    tf = tokens.groupBy(DOC, GRAM).agg(F.count(F.lit(1)).alias("tf"))
    per_doc = tf.select(DOC, F.xxhash64(GRAM).alias("gh"), "tf").groupBy(DOC).agg(
        F.collect_list("gh").alias("ghs"), F.collect_list("tf").alias("tfs")
    )
    both = per_doc.select(
        DOC,
        cand.simhash_expr(F.col("ghs"), F.col("tfs")).alias("expr_sig"),
        _simhash64("ghs", "tfs").alias("npy_sig"),
    ).toPandas()
    assert (both["expr_sig"] == both["npy_sig"]).all()


def test_minhash_deterministic_across_runs(spark, docs):
    cfg = MatchConfig()
    a = cand.minhash_bands(docs.limit(50), cfg, 32, 16).toPandas()
    b = cand.minhash_bands(docs.limit(50), cfg, 32, 16).toPandas()
    a = a.sort_values(["doc_id", "band"]).reset_index(drop=True)
    b = b.sort_values(["doc_id", "band"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
