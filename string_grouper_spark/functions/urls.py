"""URL canonicalization + URL-level dedup for webtext pipelines.

Web-scale dedup pipelines dedupe by CANONICAL URL before any content pass
(the same page is crawled under scheme/case/tracking-param/fragment
variants); the north rule's input table keys pages by ``url``.  Everything
here is a pure Catalyst expression composition — whole-stage codegen'd,
usable in Structured Streaming, and mirrored 1:1 in ANSI SQL by the
``url_dedup`` driver oracle (__spark_entry__).

Canonical form (deterministic, order of application matters):
  1. strip the fragment (``#...``);
  2. lowercase scheme and host;
  3. drop default ports (``:80`` for http, ``:443`` for https);
  4. strip trailing slashes from the path;
  5. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``,
     ``msclkid``) and SORT the survivors, so param order never splits a
     page into two identities.

Scale note: canonicalization is a narrow map; the dedup itself is one
groupBy(canonical_url) with map-side partial aggregation — the cheapest
possible shuffle shape (no arrays, no windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# '(=|$)' (not a bare '='): valueless tracking params ('?gclid', '?utm_source')
# must also be dropped or they split one page into two identities
_TRACKING_RE = "^(utm_[^=&]*|gclid|fbclid|msclkid)(=|$)"
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(url) -> Column:
    """Column expression: raw URL string -> canonical form (see module doc).

    URLs without a ``scheme://`` prefix are passed through with only
    fragment/query normalization (host rules need a parsed host).
    """
    u = F.col(url) if isinstance(url, str) else url
    base = F.regexp_replace(u, "#.*$", "")  # 1. fragment

    qpos = F.instr(base, "?")
    pre = F.when(qpos > 0, F.substring_index(base, "?", 1)).otherwise(base)
    # everything after the FIRST '?' (query may itself contain '?')
    q = F.when(qpos > 0, F.substring(base, qpos + 1, F.length(base))).otherwise(
        F.lit("")
    )

    scheme = F.lower(F.regexp_extract(pre, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(pre, _SCHEME_RE + "([^/]*)", 2))
    path = F.regexp_extract(pre, _SCHEME_RE + "[^/]*(.*)$", 2)

    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    path = F.regexp_replace(path, "/+$", "")

    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    q2 = F.array_join(F.array_sort(kept), "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    # no scheme -> not a parseable absolute URL: normalize fragment/query only
    fallback_q = q2
    fallback = F.concat(
        F.regexp_replace(pre, "/+$", ""),
        F.when(fallback_q != "", F.concat(F.lit("?"), fallback_q)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(fallback)


def url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Keep ONE FULL row per canonical URL — the earliest crawl (``ts_col``),
    ties broken by the raw url string for determinism.  Rows with a NULL
    timestamp lose to any timestamped crawl (struct ordering alone would
    sort the null FIRST and silently keep the wrong row).

    The whole input row is carried through (``canonical_url`` prepended),
    so the output feeds the content-dedup pass directly — no join back.
    One shuffle: groupBy(canonical) with a min-of-struct aggregation
    (map-side partial agg; no window, no sort of the full table).
    """
    cols = pages.columns
    if "canonical_url" in cols:
        raise ValueError(
            "url_dedup: input already has a 'canonical_url' column — rename "
            "or drop it (the operator prepends its own canonical_url)."
        )
    # null-ts rows order AFTER every real timestamp via a far-future
    # sentinel; the kept row still carries its original (null) value
    ts_ord = F.coalesce(
        F.col(ts_col), F.lit("9999-12-31 23:59:59").cast("timestamp")
    )
    # min_by: the payload row is the VALUE, never part of the comparator —
    # unorderable payload types (map columns, common in WARC metadata) would
    # fail analysis inside a min(struct(...)) ordering.  The mono-id column
    # (projected BEFORE the agg: nondeterministic expressions are rejected
    # inside aggregate arguments; named to never shadow a payload column)
    # makes the key unique, so ties on (ts, url) — duplicate rows differing
    # only in payload — still have a well-defined winner within a run.
    mid = "_sgus_mid"
    while mid in cols:
        mid += "_"
    key = F.struct(
        ts_ord.alias("_ord"), F.col(url_col).alias("_u"), F.col(mid)
    )
    pick = F.min_by(F.struct(*[F.col(c) for c in cols]), key).alias("_row")
    return (
        pages.select(canonical_url(url_col).alias("canonical_url"), "*")
        .withColumn(mid, F.monotonically_increasing_id())
        .groupBy("canonical_url")
        .agg(pick)
        .select("canonical_url", *[F.col(f"_row.{c}").alias(c) for c in cols])
    )


def url_host(url) -> Column:
    """Lowercased registered host of a URL (userinfo and port stripped);
    empty string when there is no ``scheme://`` prefix."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(F.regexp_extract(u, _SCHEME_RE + "([^/?#]*)", 2))
    bare = F.substring_index(hostport, "@", -1)  # drop user:pass@
    return F.regexp_replace(bare, ":[0-9]*$", "")


def host_dup_stats(
    labels: DataFrame, url_col: str = "url", comp_col: str = "component"
) -> DataFrame:
    """Per-host duplication report over a labeled pages frame — the crawl
    curation table every dedup run feeds back to the crawler (which hosts
    are mostly mirrors, which clusters span hosts = syndication):

      host              lowercased url host
      n_pages           pages crawled from the host
      n_clusters        distinct duplicate-clusters those pages land in
      dup_frac          (n_pages - n_clusters) / n_pages — within-corpus
                        redundancy of the host, 6dp
      cross_host_pages  pages whose cluster spans >= 2 hosts
      cross_host_frac   the fraction thereof, 6dp

    Shape: one component-keyed aggregation (how many hosts per cluster —
    partial aggs, no skew window), one join back, one host-keyed
    aggregation.  A megahost (half the crawl from one domain) is a single
    count/count-distinct key — two-phase partial aggregation, never a
    collect.  Reference analogue: none (string_grouper has no URL notion);
    this is the LLM-pipeline observability extension.
    """
    base = labels.select(
        url_host(url_col).alias("host"), F.col(comp_col).alias("_c")
    )
    comp_hosts = base.groupBy("_c").agg(
        F.countDistinct("host").alias("_nh")
    )
    tagged = base.join(comp_hosts, "_c")
    n = F.count(F.lit(1))
    nc = F.countDistinct("_c")
    xh = F.sum((F.col("_nh") > 1).cast("long"))
    return tagged.groupBy("host").agg(
        n.alias("n_pages"),
        nc.alias("n_clusters"),
        F.round((n - nc) / n, 6).alias("dup_frac"),
        xh.alias("cross_host_pages"),
        F.round(xh / n, 6).alias("cross_host_frac"),
    )


def url_duplicate_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_variants): how many raw URLs collapse into each
    canonical identity — the observability counter for URL-level dedup."""
    return (
        pages.select(canonical_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_variants"))
    )
