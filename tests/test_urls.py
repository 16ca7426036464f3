"""URL canonicalization + URL-level dedup (functions/urls.py).

The driver-facing oracle (url_dedup in __spark_entry__) pins the SQL parity;
these tests pin the canonical-form semantics themselves and the dedup
operator's earliest-crawl-wins contract on the synthetic pages table.
"""

import pandas as pd
from pyspark.sql import functions as F

from string_grouper_spark.functions.urls import (
    canonical_url,
    url_dedup,
    url_duplicate_stats,
)

CASES = [
    # (raw, canonical)
    ("HTTPS://Example.COM:443/path/a/?utm_source=x&b=2&a=1#frag",
     "https://example.com/path/a?a=1&b=2"),
    ("https://example.com/path/a?a=1&b=2",
     "https://example.com/path/a?a=1&b=2"),
    ("http://Example.com:80/", "http://example.com"),
    ("http://example.com", "http://example.com"),
    ("https://example.com/p?gclid=abc", "https://example.com/p"),
    ("https://example.com/p?fbclid=1&msclkid=2&utm_medium=m",
     "https://example.com/p"),
    ("https://example.com/p", "https://example.com/p"),
    # non-default port survives; param order normalized
    ("https://example.com:8443/x?b=2&a=1", "https://example.com:8443/x?a=1&b=2"),
    # http :443 is NOT a default port for http — kept
    ("http://example.com:443/x", "http://example.com:443/x"),
    # schemeless input: only fragment/query/trailing-slash normalization
    ("relative/path/?b=1&utm_campaign=z#x", "relative/path?b=1"),
    # VALUELESS tracking params must also be dropped ('?gclid' with no '=')
    ("https://example.com/p?gclid", "https://example.com/p"),
    ("https://example.com/p?utm_source&a=1", "https://example.com/p?a=1"),
    # ...but a non-tracking param whose NAME merely starts like one survives
    ("https://example.com/p?gclid2=x", "https://example.com/p?gclid2=x"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [c for _, c in CASES]


def test_canonical_url_is_catalyst_only(spark):
    # pure expression composition: no Python UDF / Arrow eval in the plan
    df = spark.createDataFrame([("https://a.com/x?b=1",)], ["url"])
    plan = df.select(canonical_url("url"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_url_dedup_keeps_earliest_crawl(spark):
    pdf = pd.DataFrame(
        {
            "url": [
                "HTTPS://A.com/p/?utm_source=s",   # variant 1 (later crawl)
                "https://a.com/p",                  # variant 2 (earliest)
                "https://a.com/p?x=1",              # different page
            ],
            "warc_ts": pd.to_datetime(
                ["2024-02-01", "2024-01-01", "2024-03-01"]
            ),
            "text": ["body1", "body2", "body3"],
        }
    )
    out = url_dedup(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 2
    # FULL row kept (feeds content dedup directly), canonical prepended
    assert list(out.columns) == ["canonical_url", "url", "warc_ts", "text"]
    kept = out.set_index("canonical_url")
    assert kept.loc["https://a.com/p", "url"] == "https://a.com/p"
    assert kept.loc["https://a.com/p", "text"] == "body2"
    assert str(kept.loc["https://a.com/p", "warc_ts"]).startswith("2024-01-01")

    stats = url_duplicate_stats(spark.createDataFrame(pdf)).toPandas()
    assert stats.set_index("canonical_url")["n_variants"]["https://a.com/p"] == 2


def test_url_dedup_null_timestamp_loses(spark):
    # a null-ts crawl must NOT beat a timestamped one (naive struct-min
    # would sort the null first and keep the wrong row)
    pdf = pd.DataFrame(
        {
            "url": ["https://a.com/p", "https://a.com/p/#f"],
            "warc_ts": [pd.NaT, pd.Timestamp("2024-01-05")],
            "text": ["null-ts variant", "dated variant"],
        }
    )
    out = url_dedup(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 1
    assert out.loc[0, "text"] == "dated variant"
    assert str(out.loc[0, "warc_ts"]).startswith("2024-01-05")


def test_url_dedup_unorderable_payload_and_ties(spark):
    # payload includes a MAP column (common in WARC metadata): it must ride
    # along as the picked VALUE without ever entering the comparator (a
    # min-of-struct ordering over the full row would fail analysis on maps)
    df = spark.createDataFrame(
        [
            ("https://a.com/p", "2024-02-01 00:00:00", {"k": "later"}),
            ("https://a.com/p/", "2024-01-01 00:00:00", {"k": "earliest"}),
        ],
        "url string, warc_ts string, meta map<string,string>",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    out = url_dedup(df).toPandas()
    assert len(out) == 1
    assert out.loc[0, "meta"] == {"k": "earliest"}

    # exact (ts, url) ties — true duplicate rows — still dedup to one row
    dup = spark.createDataFrame(
        [("https://a.com/q", "2024-01-01 00:00:00", {"k": "v"})] * 2,
        "url string, warc_ts string, meta map<string,string>",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    assert url_dedup(dup).count() == 1


def test_url_dedup_rejects_existing_canonical_url_column(spark):
    import pytest

    df = spark.createDataFrame(
        [("https://a.com/p", "x")], "url string, canonical_url string"
    )
    with pytest.raises(ValueError, match="canonical_url"):
        url_dedup(df, ts_col="url")


def test_url_dedup_on_synthetic_pages(spark):
    from string_grouper_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 200, seed=7)
    # synthetic pages have unique urls: dedup must be the identity modulo
    # canonicalization (no accidental key collisions)
    out = url_dedup(pages)
    assert out.count() == pages.select("url").distinct().count()


def test_url_host(spark):
    import pandas as pd
    from string_grouper_spark.functions.urls import url_host

    pdf = pd.DataFrame(
        {
            "url": [
                "https://Example.ORG/path",
                "http://example.org:80/x",
                "https://user:pw@Host.Net:8443/p?q=1",
                "ftp://files.example.com",
                "no-scheme/path",
                "https://example.org?query#frag",
            ]
        }
    )
    got = (
        spark.createDataFrame(pdf)
        .select(url_host("url").alias("h"))
        .toPandas()["h"]
        .tolist()
    )
    assert got == [
        "example.org", "example.org", "host.net", "files.example.com",
        "", "example.org",
    ]


def test_host_dup_stats(spark):
    import pandas as pd
    from string_grouper_spark.functions.urls import host_dup_stats

    # host a: 3 pages, 2 clusters (one internal dup); cluster 1 spans a+b
    pdf = pd.DataFrame(
        {
            "url": [
                "https://a.com/1", "https://a.com/2", "https://a.com/3",
                "https://b.com/1", "https://b.com/2",
            ],
            "component": [1, 1, 2, 1, 3],
        }
    )
    got = (
        host_dup_stats(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    a = got[got.host == "a.com"].iloc[0]
    b = got[got.host == "b.com"].iloc[0]
    assert (a.n_pages, a.n_clusters, a.dup_frac) == (3, 2, round(1 / 3, 6))
    # component 1 spans both hosts -> pages of comp 1 count as cross-host
    assert a.cross_host_pages == 2 and b.cross_host_pages == 1
    assert b.n_pages == 2 and b.n_clusters == 2 and b.dup_frac == 0.0
    assert b.cross_host_frac == 0.5
