"""Document-level dedup pipelines over a (doc_id, text) DataFrame.

These are the engine's "training-data pipeline" entry points: exact dedup,
exact-TFIDF near-dup pairs, and clustering — each a thin composition of the
core operators, returning DataFrames (nothing collected).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MatchConfig
from .grouping import NODE, group_labels
from .matching import match_edges
from .similarity import LEFT, RIGHT, SIM


_INTEGRAL_DTYPES = ("tinyint", "smallint", "int", "bigint")


def run_with_long_ids(docs: DataFrame, id_col: str, run):
    """Make any id dtype work on the int64-keyed scale plans.

    The fast plans' Arrow kernels key their packed vectors on int64 ids
    (the right shuffle key at 10^12 rows), but webtext ids are naturally
    STRINGS (the input_hint's ``url``).  When ``id_col`` is not integral,
    map it through ``xxhash64`` — deterministic, so checkpoint resume and
    repeated runs agree — run the pipeline on the hashed id, then translate
    each component label back to ``min(original id)`` so the public
    contract (component = min id, in the CALLER's id space) holds.

    Collisions are CHECKED (one count-distinct pass) and raise instead of
    silently merging two documents: at 10^12 ids the expected number of
    xxhash64 collisions is ~0.03, so the check is a guard rail, not a
    likely exit.  NULL ids also raise: ``xxhash64(NULL)`` returns the seed
    for EVERY null row (they would all silently merge into one document),
    and ``countDistinct`` skips nulls, so the collision guard alone cannot
    see them.  ``run(docs2, id_col2) -> (<id_col2>, component)`` is the
    wrapped pipeline.
    """
    dtype = dict(docs.dtypes)[id_col]
    if dtype in _INTEGRAL_DTYPES:
        return run(docs, id_col)
    LID = "_sg_lid"
    mapped = docs.withColumn(LID, F.xxhash64(F.col(id_col)))
    stats = mapped.agg(
        F.countDistinct(id_col).alias("n_ids"),
        F.countDistinct(LID).alias("n_lids"),
        F.count(F.when(F.col(id_col).isNull(), F.lit(1))).alias("n_null"),
    ).first()
    if stats["n_null"] > 0:
        raise ValueError(
            f"id column {id_col!r} has {stats['n_null']} NULL value(s); "
            "xxhash64 maps every NULL to the same hash so null-id documents "
            "would silently merge — drop or fill null ids first"
        )
    if stats["n_lids"] < stats["n_ids"]:
        raise ValueError(
            f"xxhash64 collision while mapping non-integral id column "
            f"{id_col!r} ({stats['n_ids']} ids -> {stats['n_lids']} hashes); "
            "pre-assign unique int64 ids to disambiguate"
        )
    labels = run(mapped, LID)
    id_map = mapped.select(id_col, LID)
    joined = labels.join(id_map, LID)
    rep = joined.groupBy("component").agg(F.min(id_col).alias("_sg_comp"))
    return joined.join(rep, "component").select(
        F.col(id_col), F.col("_sg_comp").alias("component")
    )


def exact_duplicate_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content hash; one row per duplicated content.

    Returns (content_hash, n_docs, keep_id) where keep_id is the smallest
    doc id (the canonical survivor).  Pure groupBy — one shuffle, map-side
    partial aggregation, no joins.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("_id"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("_id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def near_duplicate_pairs(
    docs: DataFrame,
    cfg: Optional[MatchConfig] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: Optional[int] = None,
) -> DataFrame:
    """Exact TF-IDF cosine self-join; unordered pairs (left < right).

    Returns (master_side, dupe_side, similarity) with master_side < dupe_side.
    """
    cfg = cfg or MatchConfig()
    edges = match_edges(
        docs.select(F.col(id_col).alias("row_id"), F.col(text_col).alias("text")),
        None,
        cfg.evolve(force_symmetries=False),
        n_master=n_docs,
    )
    return edges.where(F.col(LEFT) < F.col(RIGHT))


def near_duplicate_clusters(
    docs: DataFrame,
    cfg: Optional[MatchConfig] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: Optional[int] = None,
) -> DataFrame:
    """Full dedup pipeline: match -> symmetrize -> CC -> representative.

    Returns (<id_col>, group_rep): every doc labeled with its cluster's
    representative doc id (reference group_similar_strings semantics).
    All dedup pipelines in this module name their id output column after
    ``id_col`` so downstream code never has to know about internal labels.
    """
    cfg = cfg or MatchConfig()
    ids = docs.select(F.col(id_col).alias("row_id"))
    edges = match_edges(
        docs.select(F.col(id_col).alias("row_id"), F.col(text_col).alias("text")),
        None,
        cfg,  # force_symmetries per config: diagonal + mirror repair
        n_master=n_docs,
    )
    return group_labels(edges, ids, cfg).withColumnRenamed(NODE, id_col)


def lsh_dedup_clusters(
    docs: DataFrame,
    cfg: Optional[MatchConfig] = None,
    num_perm: int = 128,
    num_bands: int = 64,
    max_bucket_size: Optional[int] = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: Optional[int] = None,
    salt_above: Optional[int] = None,
    drop_stats: Optional[dict] = None,
) -> DataFrame:
    """The WEB-SCALE flagship: MinHash-LSH candidates -> exact TF-IDF
    re-score -> connected components.  Same output contract as
    ``near_duplicate_clusters`` but never materializes the all-pairs gram
    join — cost scales with candidate count, not corpus^2.

    Returns (<id_col>, component) with component = min doc id in cluster.

    Plan economy: the corpus is tokenized ONCE (persisted) and both the
    MinHash signatures and the exact-re-score postings derive from that same
    token table — tokenization (the only Python UDF in the path, for NFKD)
    is the most expensive narrow stage, so it must not run twice.
    """
    from ..functions.tfidf import tfidf_postings_from_tokens, tokenize
    from .candidates import (
        _bucket_pairs,
        bucket_drop_stats,
        minhash_bands_from_tokens,
        rescored_pairs,
    )
    from .grouping import connected_components

    cfg = cfg or MatchConfig()
    if n_docs is None:
        n_docs = docs.count()
    tokens = tokenize(docs, cfg, text_col=text_col, id_col=id_col).persist()
    try:
        bands = minhash_bands_from_tokens(tokens, num_perm, num_bands)
        if drop_stats is not None:
            drop_stats.update(bucket_drop_stats(bands, max_bucket_size))
        cand = _bucket_pairs(bands, max_bucket_size, salt_above=salt_above)
        postings = tfidf_postings_from_tokens(tokens, n_docs, cfg)
        pairs = rescored_pairs(docs, cand, cfg, postings=postings)
        nodes = docs.select(F.col(id_col))
        return connected_components(
            pairs.select(F.col(LEFT).alias("u"), F.col(RIGHT).alias("v")), nodes
        ).withColumnRenamed(NODE, id_col)
    finally:
        # labels are localCheckpoint-ed inside connected_components, so the
        # token cache is no longer needed by the returned DataFrame
        tokens.unpersist()


def near_duplicate_clusters_scale(
    docs: DataFrame,
    cfg: Optional[MatchConfig] = None,
    generators=("minhash",),
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: Optional[int] = None,
    num_perm: int = 128,
    num_bands: int = 64,
    max_bucket_size: Optional[int] = 1000,
    salt_above=None,  # int threshold, 'auto' (histogram-picked) or None
    max_hamming: int = 3,
    num_blocks: int = 4,
    anchor_len: int = 16,
    shingle: str = "char",
    shingle_words: int = 5,
    drop_stats: Optional[dict] = None,
) -> DataFrame:
    """The north rule's THREE INTERCHANGEABLE candidate generators behind one
    clustering contract: ``'minhash'`` (LSH banding over shingles),
    ``'simhash'`` (64-bit signatures + Hamming-ball block join) and
    ``'substring'`` (the winnowed suffix-window containment pass).  A
    fourth spelling, ``'suffix'``, swaps the winnowed index for the EXACT
    distributed suffix-array pass (``operators.suffix_array``): every pair
    sharing >= ``anchor_len`` normalized bytes becomes an edge, with no
    fingerprint sampling.

    ``generators`` takes any non-empty subset; cosine generators (minhash /
    simhash) only PROPOSE pairs — the union of their candidates goes through
    ONE exact TF-IDF re-score at ``cfg.min_similarity`` (LSH narrows, exact
    math decides), so at recall-1 configs each is interchangeable with the
    exact all-pairs path and with each other.  ``'substring'`` contributes
    verified exact containments as edges directly (a containment IS a
    duplicate relation regardless of cosine — the prefix/boilerplate webtext
    case that similarity thresholds structurally miss).  All edges feed one
    connected-components pass.

    Returns (<id_col>, component), component = min id — the same contract as
    ``near_duplicate_clusters``'s components and the LSH flagship.

    Plan notes: the cosine leg runs on the FLAGSHIP fast-plan kernels — one
    narrow vectorize pass (``doc_term_arrays``/``doc_vectors``, persisted)
    feeds minhash banding AND the packed exact re-score; candidate tables
    are slim id-pair frames (never carrying vectors), so unioning
    generators adds narrow passes but no new wide shuffle.
    """
    from ..plans.fast_dedup import (
        doc_term_arrays,
        doc_vectors,
        lsh_band_candidates,
        rescore_candidates_with_vecs,
    )
    from .candidates import simhash_candidates, substring_containment
    from .grouping import connected_components

    cfg = cfg or MatchConfig()
    if isinstance(generators, str):
        generators = (generators,)
    unknown = set(generators) - {"minhash", "simhash", "substring", "suffix"}
    if unknown:
        raise ValueError(f"unknown candidate generators: {sorted(unknown)}")
    if not generators:
        raise ValueError("at least one candidate generator is required")
    if dict(docs.dtypes)[id_col] not in _INTEGRAL_DTYPES:
        return run_with_long_ids(
            docs, id_col,
            lambda d, lid: near_duplicate_clusters_scale(
                d, cfg, generators, text_col, lid, n_docs, num_perm,
                num_bands, max_bucket_size, salt_above, max_hamming,
                num_blocks, anchor_len, shingle, shingle_words, drop_stats,
            ),
        )
    if n_docs is None:
        n_docs = docs.count()

    cos_gens = [g for g in generators if g in ("minhash", "simhash")]
    edge_parts = []
    caches = []
    try:
        if cos_gens:
            terms = doc_term_arrays(
                docs, cfg, text_col, id_col, shingle, shingle_words
            ).persist()
            vecs = doc_vectors(
                docs, cfg, num_perm, num_bands, text_col, id_col, n_docs,
                terms=terms, shingle=shingle, shingle_words=shingle_words,
            ).persist()
            caches += [terms, vecs]
            cands = []
            if "minhash" in cos_gens:
                cands.append(
                    lsh_band_candidates(
                        vecs, max_bucket_size, salt_above=salt_above,
                        drop_stats=drop_stats,
                    )
                )
            if "simhash" in cos_gens:
                # shingle threads through so proposal happens in the SAME
                # feature space the exact re-score decides in
                cands.append(
                    simhash_candidates(
                        docs, cfg, max_hamming=max_hamming, num_blocks=num_blocks,
                        max_bucket_size=max_bucket_size, text_col=text_col,
                        id_col=id_col, engine="fast", shingle=shingle,
                        shingle_words=shingle_words,
                    ).select(LEFT, RIGHT)
                )
            cand = cands[0]
            for extra in cands[1:]:
                cand = cand.unionByName(extra)
            if len(cands) > 1:
                cand = cand.dropDuplicates([LEFT, RIGHT])
            scored = rescore_candidates_with_vecs(cand, vecs, cfg)
            edge_parts.append(
                scored.select(F.col(LEFT).alias("u"), F.col(RIGHT).alias("v"))
            )
        if "substring" in generators:
            contain = substring_containment(
                docs, cfg, anchor_len=anchor_len, text_col=text_col, id_col=id_col
            )
            edge_parts.append(
                contain.select(
                    F.col("inner_id").alias("u"), F.col("outer_id").alias("v")
                )
            )
        if "suffix" in generators:
            from .suffix_array import suffix_array_spans

            # truncate=anchor_len: the spans feed connectivity only, and
            # min_len-gram equality is lossless for components (see
            # suffix_array_dedup) — 3x less suffix-table shuffle
            spans = suffix_array_spans(
                docs, cfg, min_len=anchor_len, truncate=anchor_len,
                text_col=text_col, id_col=id_col,
            )
            edge_parts.append(
                spans.select(F.col("left").alias("u"), F.col("right").alias("v"))
            )
        edges = edge_parts[0]
        for extra in edge_parts[1:]:
            edges = edges.unionByName(extra)
        nodes = docs.select(F.col(id_col))
        # connected_components localCheckpoints the edge list EAGERLY, so
        # the caches are fully consumed before the finally releases them
        return connected_components(edges, nodes).withColumnRenamed(NODE, id_col)
    finally:
        for c in caches:
            c.unpersist()


def components_only(
    docs: DataFrame,
    cfg: Optional[MatchConfig] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: Optional[int] = None,
) -> DataFrame:
    """(<id_col>, component) labels where component = min doc id in cluster —
    the deterministic integer labeling (no float-weighted rep selection)."""
    from .grouping import connected_components

    cfg = cfg or MatchConfig()
    pairs = near_duplicate_pairs(docs, cfg, text_col, id_col, n_docs)
    nodes = docs.select(F.col(id_col))
    return connected_components(
        pairs.select(F.col(LEFT).alias("u"), F.col(RIGHT).alias("v")), nodes
    ).withColumnRenamed(NODE, id_col)


def corpus_line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """CORPUS-level line dedup (the C4/CCNet paragraph-granularity pass):
    every line that occurs more than once ACROSS the whole corpus is kept
    only at its first occurrence — smallest (doc id, position) — and
    removed everywhere else; blank (post-trim) lines are dropped outright.

    Returns ``(<id_col>, <text_col>, n_lines_kept, n_lines_dropped)`` with
    the text rebuilt from the surviving lines in original order.  Docs
    whose every line was dropped keep a row with empty text, so the output
    is a full projection of the input corpus.

    Scale shape: posexplode (narrow) -> ONE min-of-struct aggregation per
    distinct line (map-side partial agg; the winner is just (id, pos), no
    window over a hot line's occurrence list) -> join back on the line
    value -> one groupBy(id) rebuild with an array_sort on (pos, line)
    structs.  A boilerplate line repeated on 10^9 pages is ONE aggregation
    key whose partial states are a single (id, pos) pair each — skew-safe
    by construction.
    """
    # F.split takes a REGEX but the rebuild joins with the literal string:
    # escape so separators with regex metacharacters ('.', '|') split the
    # same bytes they re-join.
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(line_sep))).alias(
            "_pos", "_line"
        ),
    ).where(F.trim("_line") != "")
    winners = lines.groupBy("_line").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_w")
    )
    tagged = lines.join(winners, "_line").withColumn(
        "_keep", (F.col("_w._id") == F.col("_id")) & (F.col("_w._pos") == F.col("_pos"))
    )
    rebuilt = tagged.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct(F.col("_pos"), F.col("_line")))
                    )
                ),
                lambda s: s["_line"],
            ),
            line_sep,
        ).alias(text_col),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_lines_kept"),
        F.sum(F.when(F.col("_keep"), 0).otherwise(1)).alias("n_lines_dropped"),
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            F.coalesce("n_lines_dropped", F.lit(0)).alias("n_lines_dropped"),
        )
    )
