"""Web-scale candidate generators (SURVEY §7.1 M4, BASELINE north rule).

The reference scores ALL n×m pairs in a blocked C++ matmul
(/root/reference/string_grouper/string_grouper.py:709-752) — impossible at
10^12 documents.  Here three interchangeable generators emit a small
candidate-pair set which the EXACT TF-IDF re-scorer
(operators/similarity.score_pairs) then scores; recall vs the exact path is
the tested contract (>= 0.99 at matched config).

All signature kernels are Arrow-vectorized pandas UDFs over numpy — no
per-row Python (input_hint requirement).  Gram hashing itself stays JVM-side
(xxhash64 inside whole-stage codegen); Python only sees batches of hash
arrays.

Skew design: band/bucket keys are Zipf-distributed on web text.  Buckets
larger than ``max_bucket_size`` are dropped from candidate generation (they
are near-stop-gram buckets that would contribute |bucket|^2 join rows); the
drop count is observable via ``lsh_bucket_stats`` so recall accounting stays
honest.  AQE skew-join splitting handles residual imbalance.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..config import MatchConfig
from ..functions.tfidf import DOC, GRAM, tokenize
from .similarity import LEFT, RIGHT

# --------------------------------------------------------------------------
# MinHash + banded LSH
# --------------------------------------------------------------------------

_MINHASH_SEED = 0x5EED_0001


def _perm_params(num_perm: int, seed: int = _MINHASH_SEED) -> np.ndarray:
    """Deterministic odd multipliers for multiply-shift universal hashing."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
    return (a * np.uint64(2) + np.uint64(1))  # force odd


def _band_mixers(num_bands: int, seed: int = _MINHASH_SEED + 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_bands, dtype=np.int64).astype(np.uint64)
    return (a * np.uint64(2) + np.uint64(1))


def make_minhash_band_udf(num_perm: int, num_bands: int):
    """Returns a pandas UDF: array<long> gram-hashes -> array<long> band keys.

    Signature: sig_i = min over grams of (a_i * h) in uint64 multiply-shift.
    Band key b_j = mix of sig[j*r:(j+1)*r] (r = num_perm // num_bands),
    combined with the band index so keys never collide across bands.
    """
    assert num_perm % num_bands == 0
    r = num_perm // num_bands
    perms = _perm_params(num_perm)
    mixers = _band_mixers(num_bands)

    @pandas_udf(ArrayType(LongType()))
    def band_keys(hashes: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for h in hashes:
                if h is None or len(h) == 0:
                    out.append(None)
                    continue
                hv = np.asarray(h, dtype=np.int64).astype(np.uint64)
                # (n_grams, num_perm) products; min over grams -> signature
                sig = (hv[:, None] * perms[None, :]).min(axis=0)
                bands = sig.reshape(num_bands, r)
                # order-dependent mix within each band, then fold
                acc = np.zeros(num_bands, dtype=np.uint64)
                for col in range(r):
                    acc = (acc * np.uint64(0x9E3779B97F4A7C15)) ^ bands[:, col]
                acc = (acc * mixers) ^ np.arange(num_bands, dtype=np.uint64)
                out.append(acc.astype(np.int64))
        return pd.Series(out)

    return band_keys


def minhash_bands_from_tokens(
    tokens: DataFrame, num_perm: int = 128, num_bands: int = 64
) -> DataFrame:
    """(doc_id, band, key) from an exploded (doc_id, gram) table.

    Single shuffle: ``collect_set`` of gram HASHES dedups map-side (hashing
    before the shuffle also halves the shuffled bytes vs shipping strings).
    """
    gram_hashes = (
        tokens.select(DOC, F.xxhash64(GRAM).alias("gh"))
        .groupBy(DOC)
        .agg(F.collect_set("gh").alias("ghs"))
    )
    udf = make_minhash_band_udf(num_perm, num_bands)
    sigs = gram_hashes.select(DOC, udf(F.col("ghs")).alias("bands")).where(
        F.col("bands").isNotNull()
    )
    return sigs.select(DOC, F.posexplode("bands").alias("band", "key"))


def minhash_bands(
    docs: DataFrame,
    cfg: MatchConfig,
    num_perm: int = 128,
    num_bands: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, band, key): one row per (doc, band) — the LSH bucket table."""
    tokens = tokenize(docs, cfg, text_col=text_col, id_col=id_col)
    return minhash_bands_from_tokens(tokens, num_perm, num_bands)


def lsh_bucket_stats(bands: DataFrame) -> DataFrame:
    """Bucket-size histogram for skew accounting/logging."""
    return (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("bucket_size")
    )


def bucket_drop_stats(
    buckets: DataFrame,
    max_bucket_size: Optional[int],
    id_col: str = DOC,
    key_cols=("band", "key"),
) -> dict:
    """Recall accounting for the hot-bucket guard: what does dropping buckets
    larger than ``max_bucket_size`` cost?  Returns counts of dropped buckets,
    member rows, and the implied candidate pairs (s*(s-1)/2 per bucket) —
    one small aggregation job, meant to be LOGGED with every production run
    so bucket drops are never silent (SURVEY §4.2(2))."""
    if max_bucket_size is None:
        return {"n_buckets_dropped": 0, "n_rows_dropped": 0, "est_pairs_dropped": 0}
    sizes = buckets.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("sz"))
    row = (
        sizes.where(F.col("sz") > max_bucket_size)
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.coalesce(F.sum("sz"), F.lit(0)).alias("nr"),
            F.coalesce(F.sum(F.col("sz") * (F.col("sz") - 1) / 2), F.lit(0)).alias("np"),
        )
        .first()
    )
    return {
        "n_buckets_dropped": int(row["nb"]),
        "n_rows_dropped": int(row["nr"]),
        "est_pairs_dropped": int(row["np"]),
    }


def auto_skew_policy(
    buckets: DataFrame,
    max_bucket_size: Optional[int] = None,
    parallelism: Optional[int] = None,
    target_pairs_per_task: int = 4_000_000,
    key_cols=("band", "key"),
) -> dict:
    """ONE aggregation pass over the band table picks the hot-bucket salt
    threshold from the MEASURED bucket-size histogram (SURVEY §4.2(2): "s
    chosen from a first-pass key histogram") and returns the full skew /
    drop accounting, so a production run never drops or skews silently.

    Policy: a bucket needs salting when its own pair work (sz^2/2) exceeds a
    fair per-task share of the total surviving pair work —
    ``per_task = max(target_pairs_per_task, est_pairs / parallelism)``,
    ``salt_above = ceil(sqrt(2 * per_task))``.  If no surviving bucket
    exceeds that, salting is skipped (returns ``salt_above=None``) — the
    common case, where the grouped one-shuffle pairing is strictly better.

    Returned dict: ``salt_above`` plus the histogram summary
    (n_buckets / max_sz / est_pairs) and the drop accounting vs
    ``max_bucket_size`` (n_buckets_dropped / n_rows_dropped /
    est_pairs_dropped) — everything a caller should LOG with the run.
    """
    import math

    if parallelism is None:
        parallelism = buckets.sparkSession.sparkContext.defaultParallelism
    sz = F.col("sz")
    pairs_of = sz * (sz - 1) / 2  # double arithmetic: no ANSI long overflow
    surviving = sz <= max_bucket_size if max_bucket_size is not None else F.lit(True)
    sizes = buckets.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("sz"))
    row = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(F.max(F.when(surviving, sz)), F.lit(0)).alias("max_sz"),
        F.coalesce(F.sum(F.when(surviving, pairs_of)), F.lit(0.0)).alias("est_pairs"),
        F.coalesce(F.count(F.when(~surviving, F.lit(1))), F.lit(0)).alias("nb_drop"),
        F.coalesce(F.sum(F.when(~surviving, sz)), F.lit(0)).alias("nr_drop"),
        F.coalesce(F.sum(F.when(~surviving, pairs_of)), F.lit(0.0)).alias("np_drop"),
    ).first()
    est_pairs = float(row["est_pairs"])
    per_task = max(float(target_pairs_per_task), est_pairs / max(parallelism, 1))
    threshold = int(math.ceil(math.sqrt(2.0 * per_task)))
    salt_above = threshold if int(row["max_sz"]) > threshold else None
    return {
        "salt_above": salt_above,
        "n_buckets": int(row["n_buckets"]),
        "max_sz": int(row["max_sz"]),
        "est_pairs": int(est_pairs),
        "n_buckets_dropped": int(row["nb_drop"]),
        "n_rows_dropped": int(row["nr_drop"]),
        "est_pairs_dropped": int(row["np_drop"]),
    }


def _salted_self_pairs(
    buckets: DataFrame,
    salt_above: Optional[int],
    key_cols=("band", "key"),
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """Self-join a (*key_cols, <doc>) bucket table into pairs l<r.

    ``salt_above``: buckets larger than this are SALTED — members get
    ``nsalt = ceil(sz / salt_above)`` deterministic salt groups, the left
    side is replicated once per target salt, and the join key becomes
    (*key_cols, salt).  Every pair (a,b) with a<b is still emitted exactly
    once (by a's replica targeted at b's salt), but no single shuffle
    partition receives a whole megabucket — the s^2 work is spread over
    nsalt^2 tasks instead of one (SURVEY §4.2(2) hot-band salting).

    Bucket sizes (for the salt count and the ``max_bucket_size`` cap) are
    computed with a partial-agg ``groupBy().count()`` + equi-join, NOT a
    window over the key: ``Window.partitionBy(key)`` would land every hot
    key's rows in one task — the exact skew this function exists to
    avoid, paid before it could help — and AQE can split a skewed join
    but never a window.
    """
    keys = list(key_cols)
    if salt_above is None:
        # the cap applies on this branch too (callers that pre-route small
        # buckets elsewhere just pass max_bucket_size=None)
        b = capped_buckets(buckets, max_bucket_size, key_cols)
        l = b.select(*keys, F.col(DOC).alias(LEFT))
        r = b.select(*keys, F.col(DOC).alias(RIGHT))
        return (
            l.join(r, keys)
            .where(F.col(LEFT) < F.col(RIGHT))
            .select(LEFT, RIGHT)
        )
    sizes = buckets.groupBy(*keys).agg(F.count(F.lit(1)).alias("_sz"))
    if max_bucket_size is not None:
        sizes = sizes.where(F.col("_sz") <= max_bucket_size)
    sized = buckets.join(sizes, keys)  # inner join doubles as the cap filter
    nsalt = F.ceil(F.col("_sz") / F.lit(int(salt_above))).cast("int")
    salted = sized.withColumn("_nsalt", nsalt).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(DOC)), F.col("_nsalt")).cast("int")
    )
    l = salted.select(
        *keys,
        F.col(DOC).alias(LEFT),
        F.explode(F.sequence(F.lit(0), F.col("_nsalt") - 1)).alias("_salt"),
    )
    r = salted.select(*keys, F.col(DOC).alias(RIGHT), "_salt")
    return (
        l.join(r, keys + ["_salt"])
        .where(F.col(LEFT) < F.col(RIGHT))
        .select(LEFT, RIGHT)
    )


_PAIR_SCHEMA = StructType(
    [StructField(LEFT, LongType(), False), StructField(RIGHT, LongType(), False)]
)


_TRIU_CACHE_MAX_SIZE = 128  # sum s^2 for s<=128 is ~11 MB of cached indices


def _emit_bucket_pairs(batches):
    """Arrow pass: collected bucket arrays -> all in-bucket pairs l<r.

    Sort each bucket once and index with cached ``triu_indices`` — buckets
    are typically tiny, so per-size caching makes emission a pair of numpy
    gathers per bucket.  Only sizes <= 128 are cached: an index pair for
    size s is O(s^2) bytes, so an unbounded cache on a large-cap run would
    retain GBs of indices for the task's lifetime; bigger buckets (rare)
    just recompute."""
    triu_cache: dict = {}
    for pdf in batches:
        ls, rs = [], []
        for arr in pdf["_ds"]:
            a = np.sort(np.asarray(arr, dtype=np.int64))
            t = triu_cache.get(len(a))
            if t is None:
                t = np.triu_indices(len(a), k=1)
                if len(a) <= _TRIU_CACHE_MAX_SIZE:
                    triu_cache[len(a)] = t
            ls.append(a[t[0]])
            rs.append(a[t[1]])
        if ls:
            yield pd.DataFrame(
                {LEFT: np.concatenate(ls), RIGHT: np.concatenate(rs)}
            )


def _grouped_bucket_pairs(
    buckets: DataFrame,
    max_bucket_size: Optional[int],
    key_cols=("band", "key"),
    prefilter_hot: bool = False,
) -> DataFrame:
    """ONE-SHUFFLE bucket pairing: group members per (band, key), emit all
    in-bucket pairs from the collected array.

    The window+self-join formulation shuffles the bucket table three times
    (size window, join left, join right) — measured 54 s at 400k docs x 64
    bands (25.6M bucket rows); this groupBy ships them once and the size cap
    becomes a free ``F.size`` filter (measured ~3x faster).  Emission runs
    in a numpy ``mapInPandas`` pass: the Catalyst ``transform``/``slice``/
    ``flatten`` formulation is INTERPRETED per element and measured ~1.4x
    slower (1.5 vs 1.08 s at 120k docs, identical 1.45M pairs) despite
    staying JVM-side.  Per-bucket pair generation is O(s^2) inside one task,
    which ``max_bucket_size`` bounds — megabucket skew needs the salted join
    instead (``_salted_self_pairs``).  Emits one row per (bucket, pair):
    callers dedupe or count collisions.

    ``prefilter_hot``: the ``F.size`` cap filters AFTER ``collect_list``
    materializes each bucket — a 10^9-member stop-gram bucket would build
    one multi-GB aggregation buffer before being discarded.  With
    ``prefilter_hot`` the over-cap keys (a tiny set: callers enable this
    only when the skew policy has already counted dropped buckets) are
    computed with a count-only partial agg and broadcast-anti-joined out of
    the bucket table, so no task ever collects a megabucket.  Costs one
    extra count-shuffle of the bucket table — off by default, enabled by
    the flagship exactly when the measured histogram shows drops.
    """
    ds = F.col("_ds")
    if prefilter_hot:
        # one extra count-shuffle of the bucket table, paid only on the
        # drops-exist path (the caller's skew policy already measured them)
        buckets = capped_buckets(buckets, max_bucket_size, key_cols)
    grouped = buckets.groupBy(*key_cols).agg(F.collect_list(DOC).alias("_ds"))
    sized = grouped.where(F.size(ds) >= 2)
    if max_bucket_size is not None:
        # belt-and-braces: also enforces the cap when prefilter_hot is off
        sized = sized.where(F.size(ds) <= max_bucket_size)
    return sized.select("_ds").mapInPandas(_emit_bucket_pairs, _PAIR_SCHEMA)


def capped_buckets(
    buckets: DataFrame,
    max_bucket_size: Optional[int],
    key_cols=("band", "key"),
) -> DataFrame:
    """Enforce the bucket-size cap on a FLAT bucket table without ever
    materializing a bucket: a count-only partial agg finds the over-cap
    keys (a tiny set) and a broadcast anti-join removes their rows.

    The grouped alternative (collect_list -> F.size filter -> explode)
    builds each bucket in one aggregation buffer first — a stop-gram
    megabucket becomes a multi-GB task buffer at web scale, and its
    shuffle ships every member row where this ships one count per key per
    map partition.  Used by the bipartite / corpus-frozen join paths,
    whose bucket tables feed an equi-join and never need the grouped form.

    The anti-join carries NO broadcast hint: the hot-key set is tiny in
    the designed regime (a handful of stop-gram buckets), so AQE converts
    the join to a runtime broadcast — but a pathological cap (e.g. 2 on a
    duplicate-heavy corpus) can make MOST keys hot, and a forced
    ``F.broadcast`` would then OOM the driver where a shuffled anti-join
    degrades gracefully.
    """
    if max_bucket_size is None:
        return buckets
    hot = (
        buckets.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") > max_bucket_size)
        .select(*key_cols)
    )
    return buckets.join(hot, list(key_cols), "left_anti")


def _bucket_pairs(
    buckets: DataFrame,
    max_bucket_size: Optional[int],
    salt_above: Optional[int] = None,
) -> DataFrame:
    """Bucket table (cols: band, key, doc_id) -> distinct pairs l<r.

    Buckets above ``max_bucket_size`` are dropped (hot-key guard): a bucket
    of size s contributes s^2/2 join rows, so one megabucket can dominate the
    whole job.  Drop impact is observable via ``bucket_drop_stats`` — never
    silently assumed.  Default strategy = grouped map-side pairing (one
    shuffle); with ``salt_above`` set, the salted self-join spreads hot
    buckets over many tasks instead (``_salted_self_pairs``);
    ``salt_above='auto'`` picks the threshold from the measured histogram
    (``auto_skew_policy``).
    """
    if salt_above == "auto":
        salt_above = auto_skew_policy(buckets, max_bucket_size)["salt_above"]
    if salt_above is None:
        return _grouped_bucket_pairs(buckets, max_bucket_size).dropDuplicates(
            [LEFT, RIGHT]
        )
    return _salted_self_pairs(
        buckets, salt_above, max_bucket_size=max_bucket_size
    ).dropDuplicates([LEFT, RIGHT])


def minhash_candidates(
    docs: DataFrame,
    cfg: MatchConfig,
    num_perm: int = 128,
    num_bands: int = 64,
    max_bucket_size: Optional[int] = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate pairs (master_side < dupe_side).

    With r = num_perm/num_bands rows per band, a pair with gram-Jaccard j is
    emitted with probability 1-(1-j^r)^num_bands; defaults (r=2, b=64) give
    >0.99 recall for j >= 0.27 — tuned for cosine-0.5-and-up near-dups.
    """
    bands = minhash_bands(docs, cfg, num_perm, num_bands, text_col, id_col)
    return _bucket_pairs(bands, max_bucket_size)


def minhash_candidates_bipartite(
    master: DataFrame,
    duplicates: DataFrame,
    cfg: MatchConfig,
    num_perm: int = 128,
    num_bands: int = 64,
    max_bucket_size: Optional[int] = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidates ACROSS two corpora: (master_side, dupe_side).

    The incremental-dedup workflow at scale: match a NEW batch
    (``duplicates``) against an EXISTING corpus (``master``) without the
    all-pairs join — both sides band with the same seeded permutations, so
    a cross-corpus pair collides exactly as it would in a self-join.
    ``max_bucket_size`` caps each side's bucket independently (a bucket
    contributes |m| * |d| join rows).
    """
    bm = minhash_bands(master, cfg, num_perm, num_bands, text_col, id_col)
    bd = minhash_bands(duplicates, cfg, num_perm, num_bands, text_col, id_col)

    # cap via count-agg + broadcast anti-join — never materializes a bucket
    # (capped_buckets); the flat table feeds the equi-join directly
    l = capped_buckets(bm, max_bucket_size).select(
        "band", "key", F.col(DOC).alias(LEFT)
    )
    r = capped_buckets(bd, max_bucket_size).select(
        "band", "key", F.col(DOC).alias(RIGHT)
    )
    return l.join(r, ["band", "key"]).select(LEFT, RIGHT).dropDuplicates([LEFT, RIGHT])


def rescored_pairs_bipartite(
    master: DataFrame,
    duplicates: DataFrame,
    candidates: DataFrame,
    cfg: MatchConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_master: Optional[int] = None,
    n_duplicates: Optional[int] = None,
) -> DataFrame:
    """Exact TF-IDF cosine on cross-corpus candidates; sim >= min_similarity.

    Corpus fit spans BOTH sides (reference semantics: one vocabulary/IDF
    over master+duplicates, SG:699-707), so scores equal the exact
    two-series path's.
    """
    from ..functions.tfidf import tfidf_postings
    from .similarity import SIM, score_pairs_packed

    m_post, d_post, _ = tfidf_postings(
        master.select(F.col(id_col).alias(DOC), F.col(text_col).alias("text")),
        duplicates.select(F.col(id_col).alias(DOC), F.col(text_col).alias("text")),
        cfg,
        id_col=DOC,
        n_master=n_master,
        n_duplicates=n_duplicates,
    )
    scored = score_pairs_packed(candidates, m_post, d_post)
    return scored.where(F.col(SIM) >= float(cfg.min_similarity))


# --------------------------------------------------------------------------
# 64-bit SimHash + block probing
# --------------------------------------------------------------------------

_BIT_VALUES = np.uint64(1) << np.arange(64, dtype=np.uint64)


@pandas_udf(LongType())
def _simhash64(hashes: pd.Series, tfs: pd.Series) -> pd.Series:
    """Weighted 64-bit SimHash from gram hashes + term frequencies.

    Fully vectorized per doc: bit extraction, the ±tf vote sum AND the
    sign-fold are numpy array ops (the fold = sum of the distinct powers of
    two whose vote is positive — exact in uint64, then a C-cast view back to
    int64).  No per-bit Python loop."""
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, (h, tf) in enumerate(zip(hashes, tfs)):
        if h is None or len(h) == 0:
            out[i] = 0
            continue
        hv = np.asarray(h, dtype=np.int64).astype(np.uint64)
        w = np.asarray(tf, dtype=np.float64)
        # bits matrix (n_grams, 64): 1 -> +w, 0 -> -w
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.float64
        )
        acc = (w[:, None] * (2.0 * bits - 1.0)).sum(axis=0)
        sig = _BIT_VALUES[acc > 0].sum(dtype=np.uint64)
        out[i] = sig.astype(np.int64)  # two's-complement view, wraps exactly
    return pd.Series(out)


def simhash_expr(gh_col, tf_col):
    """Pure-Catalyst 64-bit SimHash over (array<long> gram hashes, tf counts).

    One ``aggregate`` pass keeps a 64-long bit-vote accumulator; votes are
    integers (tf * ±1), so the result is bit-identical to the numpy kernel
    regardless of summation order.  JVM-only => usable in Structured
    Streaming projections and whole-stage codegen (no Python in the path).
    """
    pairs = F.zip_with(
        gh_col, tf_col, lambda g, t: F.struct(g.alias("g"), t.cast("long").alias("t"))
    )
    votes = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.when(F.getbit(s["g"], b) == 1, s["t"]).otherwise(-s["t"]),
            ),
            lambda x, y: x + y,
        ),
    )
    # fold sign bits into a long via two 32-bit halves (pow(2,b) is exact
    # for b<=31; shiftleft is bitwise => no ANSI overflow)
    def half(offset):
        return F.aggregate(
            F.zip_with(
                F.slice(votes, offset + 1, 32),
                F.sequence(F.lit(0), F.lit(31)),
                lambda v, b: F.when(v > 0, F.pow(F.lit(2.0), b).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a.bitwiseOR(x),
        )

    return F.shiftleft(half(32), 32).bitwiseOR(half(0))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 -> uint64): turns the fast
    plan's byte-pack gram codes (only 8*ngram_size low bits populated) into
    uniformly-distributed 64-bit hashes, as SimHash's bit votes require."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def simhash_fast_batch(
    texts, cfg: MatchConfig, shingle: str = "char", shingle_words: int = 5
) -> list:
    """The ``engine='fast'`` per-batch kernel: iterable of texts -> int64
    signatures (``None`` for NULL text, mirroring the 'expr' engine's
    Catalyst null propagation — a null page must not kill a streaming
    query).  Byte-pack gram codes (plans.fast_dedup._encode_doc)
    splitmix64-mixed to uniform 64-bit hashes, tf-weighted bit votes in one
    numpy pass per doc.  Shared by the batch ``simhash_signatures`` engine
    and the streaming tag (``streaming_simhash_tag(engine='fast')``) so
    stream and batch signatures are bit-identical by construction.

    ``shingle='word'`` votes over the DISTINCT word-``shingle_words``-gram
    blake2b codes (plans.fast_dedup._word_shingle_codes) — binary-weighted
    rather than tf-weighted, which is the standard long-document practice
    (near-dup docs share most shingles; the exact re-score downstream
    decides membership either way).
    """
    from ..plans.fast_dedup import _encode_doc, _word_shingle_codes

    texts = list(texts)
    bit_idx = np.arange(64, dtype=np.uint64)
    out = [None] * len(texts)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            if t is None or (isinstance(t, float) and np.isnan(t)):
                continue  # null text -> null signature (expr-engine parity)
            if shingle == "word":
                codes = _word_shingle_codes(t, cfg, shingle_words)
                tfs = None if codes is None else np.ones(len(codes))
            else:
                codes, tfs = _encode_doc(t, cfg)
            if codes is None or len(codes) == 0:
                out[i] = 0  # empty/too-short text: deterministic zero sig
                continue
            hv = _splitmix64(codes.astype(np.int64).astype(np.uint64))
            w = tfs.astype(np.float64)
            bits = ((hv[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                np.float64
            )
            acc = (w[:, None] * (2.0 * bits - 1.0)).sum(axis=0)
            sig = _BIT_VALUES[acc > 0].sum(dtype=np.uint64)
            out[i] = int(sig.astype(np.int64))
    return out


def simhash_signatures(
    docs: DataFrame,
    cfg: MatchConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str = "numpy",
    shingle: str = "char",
    shingle_words: int = 5,
) -> DataFrame:
    """(doc_id, simhash): tf-weighted 64-bit signatures.

    Three engines:
      * ``'numpy'`` / ``'expr'`` — BIT-IDENTICAL to each other (asserted in
        tests) over xxhash64 gram hashes; 'expr' is the pure-Catalyst form
        Structured Streaming projections require.  Both pay two wide stages
        (explode + tf groupBy + collect_list) before the bit math.
      * ``'fast'`` — ONE narrow mapInPandas pass, NO shuffle: byte-pack
        gram codes (plans.fast_dedup._encode_doc) splitmix64-mixed to
        uniform 64-bit hashes, votes in the same numpy kernel.  Different
        gram hash => different (equally valid) signature values; the
        Hamming-ball join semantics are unchanged.  This is the scale
        shape: per-doc work with map-side everything.
    """
    if shingle not in ("char", "word"):
        raise ValueError(f"shingle must be 'char' or 'word', got {shingle!r}")
    if shingle == "word" and engine != "fast":
        raise ValueError(
            "shingle='word' simhash requires engine='fast' (the Catalyst "
            "engines hash char n-grams only)"
        )
    if engine == "fast":
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("doc_id", LongType(), False),
                # nullable: NULL text -> NULL signature (expr-engine parity)
                StructField("simhash", LongType(), True),
            ]
        )

        def run(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "simhash": simhash_fast_batch(
                            pdf[text_col], cfg, shingle, shingle_words
                        ),
                    }
                )

        return docs.select(id_col, text_col).mapInPandas(run, schema)
    tokens = tokenize(docs, cfg, text_col=text_col, id_col=id_col)
    tf = tokens.groupBy(DOC, GRAM).agg(F.count(F.lit(1)).alias("tf"))
    per_doc = tf.select(DOC, F.xxhash64(GRAM).alias("gh"), "tf").groupBy(DOC).agg(
        F.collect_list("gh").alias("ghs"), F.collect_list("tf").alias("tfs")
    )
    if engine == "expr":
        sig = simhash_expr(F.col("ghs"), F.col("tfs"))
    else:
        sig = _simhash64("ghs", "tfs")
    return per_doc.select(DOC, sig.alias("simhash"))


def simhash_candidates(
    docs: DataFrame,
    cfg: MatchConfig,
    max_hamming: int = 3,
    num_blocks: int = 4,
    max_bucket_size: Optional[int] = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str = "numpy",
    shingle: str = "char",
    shingle_words: int = 5,
) -> DataFrame:
    """SimHash Hamming-ball candidates (master_side < dupe_side).

    Pigeonhole: any pair within Hamming distance <= num_blocks-1 shares at
    least one of the num_blocks 16-bit blocks, so the block-equality join is
    EXHAUSTIVE for max_hamming <= num_blocks-1; the bit_count filter then
    enforces the exact ball radius JVM-side.  ``engine`` selects the
    signature kernel (see ``simhash_signatures``; 'fast' = one narrow pass,
    no shuffle before the block join); ``shingle``/``shingle_words`` select
    the vote feature space (word shingles need ``engine='fast'``).
    """
    sigs = simhash_signatures(
        docs, cfg, text_col, id_col, engine=engine,
        shingle=shingle, shingle_words=shingle_words,
    )
    return hamming_ball_pairs(
        sigs, max_hamming=max_hamming, num_blocks=num_blocks,
        max_bucket_size=max_bucket_size, id_col=DOC, sig_col="simhash",
    )


def hamming_ball_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    num_blocks: int = 4,
    max_bucket_size: Optional[int] = 1000,
    id_col: str = DOC,
    sig_col: str = "simhash",
) -> DataFrame:
    """Generic 64-bit-signature Hamming-ball join (master_side < dupe_side)
    — the block kernel behind ``simhash_candidates``, reusable for ANY
    int64 signature column (text SimHash, perceptual image dHash/pHash).

    Pigeonhole: any pair within Hamming distance <= num_blocks-1 shares at
    least one of the ``num_blocks`` equal-width bit blocks, so the
    block-equality join is EXHAUSTIVE for max_hamming <= num_blocks-1; the
    ``bit_count`` filter then enforces the exact ball radius JVM-side.
    """
    assert 64 % num_blocks == 0
    if max_hamming > num_blocks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs num_blocks >= {max_hamming + 1} "
            f"(got {num_blocks}): the pigeonhole block join is only "
            "exhaustive for max_hamming <= num_blocks - 1 — a wider radius "
            "would silently drop pairs differing in every block"
        )
    width = 64 // num_blocks
    mask = (1 << width) - 1
    # NULL signatures (null text upstream) carry no information and must
    # not pair: groupBy — unlike an equi-join — puts all NULL keys in ONE
    # group, so without this filter every null-sig doc would bucket with
    # every other null-sig doc in every band
    sigs = sigs.where(F.col(sig_col).isNotNull())
    blocks = sigs.select(
        F.col(id_col).alias(DOC),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(sig_col, i * width).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for i in range(num_blocks)
                ]
            )
        ).alias("bk"),
    ).select(DOC, "_sig", F.col("bk.blk").alias("band"), F.col("bk.key").alias("key"))
    # The block table has THREE downstream consumers (the hot-key count
    # agg, the join's left side, the join's right side) and nothing
    # upstream is cached — without a materialization fence the signature
    # kernel upstream re-runs once per consumer (the plan showed FOUR
    # MapInPandas evaluations of the same pass).  Checkpoint the slim
    # (doc, sig, band, key) table lazily: one signature pass total, blocks
    # reclaimed with the RDD.  num_blocks rows per doc of four fixed-width
    # columns — bounded, far cheaper than 3 extra corpus passes at scale.
    blocks = blocks.localCheckpoint(eager=False)
    # cap via count-agg + anti-join (capped_buckets): a hot block key —
    # e.g. the all-zero block of short/boilerplate docs (or flat images) —
    # would land every member in one task, and AQE can split joins but not
    # the downstream O(s^2) pair emission
    blocks = capped_buckets(blocks, max_bucket_size)
    l = blocks.select("band", "key", F.col(DOC).alias(LEFT), F.col("_sig").alias("_hl"))
    r = blocks.select("band", "key", F.col(DOC).alias(RIGHT), F.col("_sig").alias("_hr"))
    return (
        l.join(r, ["band", "key"])
        .where(F.col(LEFT) < F.col(RIGHT))
        .where(F.bit_count(F.col("_hl").bitwiseXOR(F.col("_hr"))) <= max_hamming)
        .select(LEFT, RIGHT)
        .dropDuplicates([LEFT, RIGHT])
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted index — also an oracle-checkable dedup op)
# --------------------------------------------------------------------------

def jaccard_pairs(
    docs: DataFrame,
    cfg: MatchConfig,
    min_jaccard: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidate_max_df_ratio: Optional[float] = None,
    n_docs: Optional[int] = None,
) -> DataFrame:
    """Exact distinct-3-gram Jaccard similarity join: (l, r, jaccard) l<r.

    ``candidate_max_df_ratio``: the same stop-gram guard as the cosine path
    — grams hotter than the ratio are dropped from CANDIDATE GENERATION
    only (the Zipf-skew guard for the inverted-index join at web scale);
    surviving pairs get their intersection recounted EXACTLY from packed
    per-doc gram sets, so every emitted jaccard value is exact.  Pairs
    sharing only hot grams are skipped — recall accounting is tested, never
    silently assumed.
    """
    tokens = tokenize(docs, cfg, text_col=text_col, id_col=id_col).dropDuplicates(
        [DOC, GRAM]
    )
    sizes = tokens.groupBy(DOC).agg(F.count(F.lit(1)).alias("sz"))
    if candidate_max_df_ratio is None:
        l = tokens.select(F.col(DOC).alias(LEFT), GRAM)
        r = tokens.select(F.col(DOC).alias(RIGHT), GRAM)
        inter = (
            l.join(r, GRAM)
            .where(F.col(LEFT) < F.col(RIGHT))
            .groupBy(LEFT, RIGHT)
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        from .similarity import (
            SIM,
            candidate_pairs_from_postings,
            score_pairs_packed,
        )
        from ..functions.tfidf import W

        if n_docs is None:
            n_docs = docs.count()
        max_df = max(1, int(candidate_max_df_ratio * n_docs))
        # unit-weight "postings": the packed sparse-dot kernel then computes
        # exact intersection sizes for candidate pairs only
        unit_postings = tokens.withColumn(W, F.lit(1.0))
        cand = candidate_pairs_from_postings(unit_postings, max_df)
        inter = score_pairs_packed(cand, unit_postings).select(
            LEFT, RIGHT, F.col(SIM).cast("long").alias("inter")
        ).where(F.col("inter") > 0)
    out = (
        inter.join(sizes.select(F.col(DOC).alias(LEFT), F.col("sz").alias("_szl")), LEFT)
        .join(sizes.select(F.col(DOC).alias(RIGHT), F.col("sz").alias("_szr")), RIGHT)
        .select(
            LEFT,
            RIGHT,
            (F.col("inter") / (F.col("_szl") + F.col("_szr") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= float(min_jaccard))
    )
    return out


# --------------------------------------------------------------------------
# Exact substring containment (suffix-window index + verify)
# --------------------------------------------------------------------------

def _substring_params(anchor_len: int, window_len: Optional[int], stride: Optional[int]):
    """Derive (window_len k, stride w) with the guaranteed-hit constraint
    k + 2w - 2 <= anchor_len (see substring_containment proof).

    Defaults MAXIMIZE WINDOW LENGTH (selectivity) and take a modest stride:
    w = max(2, anchor_len//5), k = anchor_len - 2w + 2.  Measured at sf0.1
    (5k docs, low-entropy synthetic text, anchor_len=24): short windows
    k=8/w=9 shrink the index 9x but explode candidates 250x (16.1M pairs,
    280s) because 8-char windows stop being selective; k=18/w=4 keeps 63k
    candidate pairs with a 4x index reduction.  High-entropy corpora can
    pass explicit (window_len, stride) to trade the other way.
    """
    if window_len is None and stride is None:
        w = max(2, anchor_len // 5)
        k = anchor_len - 2 * w + 2
    else:
        k = window_len if window_len is not None else max(6, anchor_len // 3)
        w = stride if stride is not None else (anchor_len - k) // 2 + 1
    if k > anchor_len:
        raise ValueError("window_len must be <= anchor_len")
    if k + 2 * w - 2 > anchor_len:
        raise ValueError(
            f"window_len={k}, stride={w} break the guaranteed-hit bound "
            f"k + 2*stride - 2 <= anchor_len ({anchor_len})"
        )
    return k, max(1, w)


_ROLL_P = np.uint64(0x100000001B3)  # FNV prime (odd => invertible mod 2^64)
_ROLL_PINV = np.uint64(pow(0x100000001B3, -1, 2**64))


def _roll_hash_windows(norm: str, k: int) -> Optional[np.ndarray]:
    """int64 hashes of every length-k BYTE window of ``norm`` (UTF-8):
    polynomial hash over uint64 (natural mod-2^64 wrap), splitmix64-
    finalized so sliding minima are uniform.

    TRUE O(L) rolling form via prefix sums: with T_m = sum_{j<m} b_j p^-j
    (p is odd, so p^-1 exists mod 2^64), the window hash
    h_i = sum_j b_{i+j} p^{k-1-j} equals p^{i+k-1} (T_{i+k} - T_i) —
    ~3 uint64 ops per window and no (L, k) window materialization.  The
    values are BIT-IDENTICAL to the direct sliding-window formulation
    (exact ring arithmetic), which measured 5x slower at webtext lengths
    (1.69 s -> 0.33 s for 500 x 27.5 kB docs).

    Byte windows (not char windows) keep the winnowing guarantee: a char-
    level containment is a byte-level containment in UTF-8, so inner's
    windows still appear verbatim in outer at shifted BYTE positions.
    """
    b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
    n = len(b)
    if n < k:
        return None
    pipow = np.empty(n, dtype=np.uint64)
    pipow[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _ROLL_PINV, dtype=np.uint64), out=pipow[1:])
    T = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(b.astype(np.uint64) * pipow, out=T[1:])
    m = n - k + 1
    ppow = np.empty(m, dtype=np.uint64)
    ppow[0] = _ROLL_P ** np.uint64(k - 1)
    if m > 1:
        np.cumprod(np.full(m - 1, _ROLL_P, dtype=np.uint64), out=ppow[1:])
        ppow[1:] *= ppow[0]
    h = (T[k:k + m] - T[:m]) * ppow
    return _splitmix64(h).astype(np.int64)


def make_winnow_udf(k: int, w: int):
    """pandas UDF: normalized text -> struct(anchors, stripes).

    anchors = distinct sliding-window minima (winnowing fingerprints),
    stripes = minima of aligned non-overlapping stripes of width ``w`` —
    over the length-``k`` window hashes of the text.

    ONE numpy pass per doc for BOTH the window hashes (vectorized rolling
    polynomial hash) and the minima.  Two prior formulations were measured
    and rejected: Catalyst ``transform(sequence, i -> array_min(slice))``
    for the minima (one allocation per window position, 60x slower) and
    Catalyst ``transform(sequence, i -> xxhash64(substring(norm,i,k)))``
    for the hashes (interpreted HOF lambda + per-position string alloc —
    the dominant cost of the substring query at sf0.1).
    """
    out_type = StructType(
        [
            StructField("anchors", ArrayType(LongType()), True),
            StructField("stripes", ArrayType(LongType()), True),
        ]
    )

    @pandas_udf(out_type)
    def winnow(norms: pd.Series) -> pd.DataFrame:
        anchors_col, stripes_col = [], []
        with np.errstate(over="ignore"):
            for s in norms:
                v = None if s is None else _roll_hash_windows(s, k)
                if v is None or len(v) == 0:
                    anchors_col.append(None)
                    stripes_col.append(None)
                    continue
                n = len(v)
                if n < w:
                    m = np.array([v.min()], dtype=np.int64)
                    anchors_col.append(m)
                    stripes_col.append(m)
                    continue
                slid = np.lib.stride_tricks.sliding_window_view(v, w).min(axis=1)
                anchors_col.append(np.unique(slid))
                head = v[: (n // w) * w].reshape(-1, w).min(axis=1)
                tail = v[(n // w) * w:]
                stripes_col.append(
                    np.concatenate([head, [tail.min()]]) if len(tail) else head
                )
        return pd.DataFrame({"anchors": anchors_col, "stripes": stripes_col})

    return winnow


def substring_containment(
    docs: DataFrame,
    cfg: MatchConfig,
    anchor_len: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_len: Optional[int] = None,
    stride: Optional[int] = None,
) -> DataFrame:
    """All (inner_id, outer_id) where inner's normalized text is a substring
    of outer's (inner != outer, len(inner_norm) >= anchor_len).  EXACT: every
    candidate is verified with a JVM ``locate``.

    Distributed strategy (the suffix-array role from the north rule) with
    WINNOWING-SAMPLED fingerprints — the full positional index (one row per
    char of the corpus: O(total bytes) shuffle) is replaced by:

      * index side (outer docs): the min window-hash of each NON-OVERLAPPING
        stripe of ``stride`` consecutive length-``window_len`` windows —
        ~stride x fewer rows than the every-position index;
      * anchor side (inner docs): the distinct SLIDING-window minima
        (winnowing fingerprints, Schleimer et al. SIGMOD'03) with the same
        stripe width.

    Guaranteed hit: if inner (normalized length L >= window_len + 2*stride-2,
    implied by L >= anchor_len under the derived parameters) occurs in outer
    at any offset, the covered region spans >= 2*stride-1 consecutive outer
    window positions and therefore contains one FULL aligned outer stripe;
    that stripe's min is the min of ``stride`` consecutive window hashes of
    inner, i.e. one of inner's sliding-window minima — so the equi-join on
    fingerprint hash cannot miss a true containment.  False candidates are
    killed by the exact verify.
    """
    from ..functions.normalize import normalize_expr

    k, w = _substring_params(anchor_len, window_len, stride)
    winnow = make_winnow_udf(k, w)
    # ONE narrow Arrow pass computes normalization + rolling window hashes +
    # winnowing minima, localCheckpoint-ed (lazy) because it has THREE
    # consumers — the anchor explode, the stripe-index explode and the
    # verify join.  The previous shape recomputed the winnow UDF once per
    # explode side and leaked a ``persist()`` CacheManager entry per call
    # (no caller can safely unpersist a lazily-consumed result — the
    # bipartite sibling's documented lesson); the checkpoint runs the pass
    # once and its blocks are reclaimed with the RDD.  At corpus scale the
    # winnow pass over every normalized byte is the dominant narrow stage,
    # so halving it matters more than the checkpoint's storage.
    # (Length threshold is on CHARS; byte windows only grow the window
    # count, so the guaranteed-hit bound is preserved.)
    fps = (
        docs.select(
            F.col(id_col).alias(DOC),
            normalize_expr(F.col(text_col), cfg).alias("norm"),
        )
        .where(F.length("norm") >= anchor_len)
        .select(DOC, "norm", winnow(F.col("norm")).alias("fp"))
        .localCheckpoint(eager=False)
    )
    # anchors: winnowing fingerprints (distinct sliding minima) of inner
    # docs — SLIM (id, hash) rows only.  Carrying inner_norm here would
    # ship ~len(norm)/stride copies of every doc's full text through the
    # fingerprint join and the candidate dedup (the heavy-payload-shuffled-
    # twice anti-pattern); instead the norm is attached ONCE per deduped
    # candidate pair from the checkpointed fps below.
    anchors = fps.select(
        F.col(DOC).alias("inner_id"),
        F.explode("fp.anchors").alias("wh"),
    )
    # index: one min-hash per aligned stripe of w window positions
    index = fps.select(
        F.col(DOC).alias("outer_id"),
        F.explode("fp.stripes").alias("wh"),
    ).dropDuplicates(["outer_id", "wh"])
    cand = (
        anchors.join(index, "wh")
        .where(F.col("inner_id") != F.col("outer_id"))
        .select("inner_id", "outer_id")
        .dropDuplicates(["inner_id", "outer_id"])
    )
    # both sides of every candidate come from fps (>= anchor_len docs), so
    # attaching norms from the one checkpointed frame verifies exactly the
    # candidate set the fingerprint join proposed
    verified = (
        cand.join(
            fps.select(F.col(DOC).alias("inner_id"), F.col("norm").alias("inner_norm")),
            "inner_id",
        )
        .join(
            fps.select(F.col(DOC).alias("outer_id"), F.col("norm").alias("outer_norm")),
            "outer_id",
        )
        .where(F.expr("locate(inner_norm, outer_norm) > 0"))
    )
    return verified.select("inner_id", "outer_id")


def substring_containment_bipartite(
    inner_docs: DataFrame,
    outer_docs: DataFrame,
    cfg: MatchConfig,
    anchor_len: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_len: Optional[int] = None,
    stride: Optional[int] = None,
    skip_stats: Optional[dict] = None,
) -> DataFrame:
    """All (inner_id, outer_id) where an ``inner_docs`` row's normalized
    text occurs verbatim inside an ``outer_docs`` row's — the DECONTAMINATION
    check of a training pipeline (does a benchmark/eval item appear in the
    training corpus?).  EXACT: every candidate is verified with ``locate``.

    Same winnowing geometry and guaranteed-hit proof as
    ``substring_containment`` (which is the self-corpus special case), with
    the sides split: the huge CORPUS side carries the sparse stripe index
    (~1/stride of its bytes), the small benchmark side the sliding-window
    minima.  Cost: one narrow Arrow pass per side + one equi-join on the
    fingerprint hash; ids may overlap between sides and are NOT excluded
    (the two tables are distinct corpora).

    CONTRACT: benchmark items whose NORMALIZED length is below
    ``anchor_len`` are NOT searched for (the winnowing guarantee needs
    >= anchor_len characters) — lower ``anchor_len`` to cover shorter
    items, and pass ``skip_stats`` (a dict) to receive
    ``{"n_inner_skipped": ...}`` so short-item skips are never silent.
    The normalized corpus side is localCheckpoint-ed for the two consumers
    (stripe index + verify join): eager, computed once, and its blocks are
    released by the ContextCleaper's plan GC when the result is dropped —
    ``persist()`` would leak a CacheManager entry per call for the session
    lifetime, since no caller can safely unpersist a lazily-consumed
    result (the group_rep ``_with_pos`` lesson).
    """
    from ..functions.normalize import normalize_expr

    k, w = _substring_params(anchor_len, window_len, stride)
    winnow = make_winnow_udf(k, w)
    inner_norm = inner_docs.select(
        F.col(id_col).alias("inner_id"),
        normalize_expr(F.col(text_col), cfg).alias("inner_norm"),
    )
    outer_norm = outer_docs.select(
        F.col(id_col).alias("outer_id"),
        normalize_expr(F.col(text_col), cfg).alias("outer_norm"),
    ).localCheckpoint()
    if skip_stats is not None:
        n_skip = inner_norm.where(F.length("inner_norm") < anchor_len).count()
        skip_stats["n_inner_skipped"] = int(n_skip)
        if n_skip:
            import logging

            logging.getLogger("string_grouper_spark.contamination").warning(
                "%d benchmark item(s) shorter than anchor_len=%d after "
                "normalization are NOT searched for", n_skip, anchor_len
            )
    # searchable inner docs, checkpointed (lazy) for the anchor pass AND
    # the verify-time norm attach — the anchor explode itself stays SLIM
    # (id, hash): shipping inner_norm on every anchor row would move
    # ~len/stride copies of each benchmark item through the fingerprint
    # join; the norm is attached once per deduped candidate pair instead.
    searchable = inner_norm.where(
        F.length("inner_norm") >= anchor_len
    ).localCheckpoint(eager=False)
    anchors = (
        searchable.select("inner_id", winnow(F.col("inner_norm")).alias("fp"))
        .select("inner_id", F.explode("fp.anchors").alias("wh"))
    )
    index = (
        # an outer shorter than anchor_len cannot contain any inner
        outer_norm.where(F.length("outer_norm") >= anchor_len)
        .select("outer_id", winnow(F.col("outer_norm")).alias("fp"))
        .select("outer_id", F.explode("fp.stripes").alias("wh"))
        .dropDuplicates(["outer_id", "wh"])
    )
    cand = (
        anchors.join(index, "wh")
        .select("inner_id", "outer_id")
        .dropDuplicates(["inner_id", "outer_id"])
    )
    verified = (
        cand.join(searchable, "inner_id")
        .join(outer_norm, "outer_id")
        .where(F.expr("locate(inner_norm, outer_norm) > 0"))
    )
    return verified.select("inner_id", "outer_id")


# --------------------------------------------------------------------------
# Candidate -> exact-rescore -> pairs (the scale path's full pipeline)
# --------------------------------------------------------------------------

def rescored_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    cfg: MatchConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: Optional[int] = None,
    postings: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact TF-IDF cosine on candidate pairs only; (l, r, similarity) with
    sim >= cfg.min_similarity.  This is what replaces the all-pairs join at
    web scale: LSH narrows, exact math decides.  Scoring uses the packed
    Arrow kernel (similarity.score_pairs_packed): O(|cand| * doc_len),
    independent of gram document frequency — no stop-gram blowup.

    Pass ``postings`` to reuse an existing posting table (avoids
    re-tokenizing when the pipeline already built one)."""
    from ..functions.tfidf import tfidf_postings
    from .similarity import SIM, score_pairs_packed

    if postings is None:
        postings, _, _ = tfidf_postings(
            docs, None, cfg, text_col=text_col, id_col=id_col, n_master=n_docs
        )
    scored = score_pairs_packed(candidates, postings)
    return scored.where(F.col(SIM) >= float(cfg.min_similarity))
