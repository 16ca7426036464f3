"""WARC source/sink: round-trip fidelity, multi-member gzip streaming,
non-response filtering, malformed-shard errors, end-to-end dedup over
shards (the Common-Crawl packaging of the input_hint table)."""

import datetime as dt
import gzip
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from string_grouper_spark.sources import warc as W
from string_grouper_spark.sources.pages import generate_pages


def _roundtrip(spark, tmp_path, compress, num_files=3, n=60):
    pages = generate_pages(spark, n)
    out = str(tmp_path / ("gz" if compress else "plain"))
    manifest = W.write_warc(pages, out, num_files=num_files, compress=compress)
    back = W.read_warc(spark, out)
    return pages, manifest, back


def test_write_read_roundtrip_gz(spark, tmp_path):
    pages, manifest, back = _roundtrip(spark, tmp_path, compress=True)
    assert len(manifest) == 3 and manifest["n_records"].sum() == 60
    a = (
        pages.select("url", "warc_ts", "html", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        back.select("url", "warc_ts", "html", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(a["url"]) == list(b["url"])
    assert list(a["warc_ts"]) == list(b["warc_ts"])
    assert list(a["lang"]) == list(b["lang"])
    assert [bytes(x) for x in a["html"]] == [bytes(x) for x in b["html"]]


def test_write_read_roundtrip_plain(spark, tmp_path):
    pages, manifest, back = _roundtrip(spark, tmp_path, compress=False)
    assert back.count() == 60
    # plain shards start with a readable WARC leader
    with open(manifest["file"][0], "rb") as fh:
        assert fh.read(8) == b"WARC/1.0"


def test_shards_are_record_level_gzip_members(spark, tmp_path):
    _, manifest, _ = _roundtrip(spark, tmp_path, compress=True, num_files=1)
    with open(manifest["file"][0], "rb") as fh:
        blob = fh.read()
    # every record its own member -> member count == records + warcinfo
    members = 0
    recs = list(W.iter_warc_records(W._iter_chunks(blob)))
    pos = 0
    import zlib

    while pos < len(blob):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        while not d.eof:
            d.decompress(blob[pos : pos + 65536])
            pos += min(65536, len(blob) - pos)
        pos -= len(d.unused_data)
        members += 1
    assert members == len(recs) == 61


def test_byte_determinism(spark, tmp_path):
    pages = generate_pages(spark, 30).repartition(1).sortWithinPartitions("url")
    m1 = W.write_warc(pages, str(tmp_path / "a"), compress=True)
    m2 = W.write_warc(pages, str(tmp_path / "b"), compress=True)
    b1 = open(m1["file"][0], "rb").read()
    b2 = open(m2["file"][0], "rb").read()
    assert b1 == b2 and m1["n_bytes"][0] == len(b1)


def test_non_response_records_skipped(spark, tmp_path):
    # hand-build a shard: warcinfo + request + response + metadata
    url = "https://example.org/x"
    ts = dt.datetime(2024, 1, 2, 3, 4, 5)
    resp = W.serialize_response_record(url, ts, b"<html>hi</html>", "en")
    req = W._record(
        "request",
        [("WARC-Record-ID", "<urn:uuid:r>"), ("WARC-Date", "2024-01-02T03:04:05Z"),
         ("WARC-Target-URI", url), ("Content-Type", "application/http; msgtype=request")],
        b"GET /x HTTP/1.1\r\n\r\n",
    )
    meta = W._record(
        "metadata",
        [("WARC-Record-ID", "<urn:uuid:m>"), ("WARC-Date", "2024-01-02T03:04:05Z")],
        b"via: test",
    )
    blob = b"".join(
        W._gzip_member(r)
        for r in (W.serialize_warcinfo("f.warc.gz"), req, resp, meta)
    )
    d = tmp_path / "mixed"
    os.makedirs(d)
    (d / "f.warc.gz").write_bytes(blob)
    out = W.read_warc(spark, str(d)).toPandas()
    assert len(out) == 1
    assert out["url"][0] == url
    assert bytes(out["html"][0]) == b"<html>hi</html>"
    assert out["warc_ts"][0].to_pydatetime() == ts


def test_malformed_shard_fails_loud(spark, tmp_path):
    d = tmp_path / "bad"
    os.makedirs(d)
    (d / "bad.warc").write_bytes(b"NOT A WARC FILE AT ALL\r\n\r\n")
    with pytest.raises(Exception) as ei:
        W.read_warc(spark, str(d)).collect()
    assert "not a WARC record" in str(ei.value)


def test_truncated_shard_fails_loud(spark, tmp_path):
    resp = W.serialize_response_record(
        "https://example.org/y", dt.datetime(2024, 1, 1), b"<html>y</html>", None
    )
    d = tmp_path / "trunc"
    os.makedirs(d)
    (d / "t.warc").write_bytes(resp[:-20])
    with pytest.raises(Exception) as ei:
        W.read_warc(spark, str(d)).collect()
    assert "truncated WARC body" in str(ei.value)


def test_warc_to_pages_extraction_byte_identical(spark, tmp_path):
    pages = generate_pages(spark, 80)
    out = str(tmp_path / "pg")
    W.write_warc(pages, out, num_files=2)
    got = W.warc_to_pages(spark, out)
    joined = got.alias("g").join(
        pages.select("url", F.col("text").alias("want")), "url"
    )
    assert joined.where(F.col("text") != F.col("want")).count() == 0
    assert joined.count() == 80


def test_end_to_end_dedup_over_warc_shards(spark, tmp_path):
    """The full north-rule shape: WARC shards -> extract -> flagship LSH
    dedup recovers the generated ground-truth clusters."""
    from string_grouper_spark.config import MatchConfig
    from string_grouper_spark.plans.fast_dedup import fast_lsh_dedup

    pages = generate_pages(spark, 120, dup_fraction=0.5)
    out = str(tmp_path / "e2e")
    W.write_warc(pages, out, num_files=4)
    docs = W.warc_to_pages(spark, out).select(
        "url", F.col("text")
    ).withColumn("doc_id", F.xxhash64("url"))
    labels = fast_lsh_dedup(
        docs,
        MatchConfig(min_similarity=0.8),
        num_perm=128,
        num_bands=64,
        max_bucket_size=None,
    )
    # every ground-truth duplicate pair (non-substring classes) must share a
    # component: join back to true_cluster via url
    truth = pages.select(F.xxhash64("url").alias("doc_id"), "true_cluster", "text")
    lab = labels.join(truth, "doc_id")
    # substring mutants (kind==3) can fall below 0.8 cosine; exclude clusters
    # whose members differ in length by > 25%
    span = lab.groupBy("true_cluster").agg(
        (F.max(F.length("text")) * 0.75 <= F.min(F.length("text"))).alias("tight"),
        F.countDistinct("component").alias("n_comp"),
        F.count("*").alias("n"),
    )
    bad = span.where(F.col("tight") & (F.col("n") > 1) & (F.col("n_comp") > 1)).count()
    assert bad == 0


def test_warc_to_pages_generic_extractor(spark, tmp_path):
    # real-crawl html (scripts, entities) through the shards + the generic
    # extractor: text is the visible content, not the markup
    import datetime as dt

    html = (
        b"<html><head><script>skip()</script></head>"
        b"<body><p>Hello &amp; goodbye</p><div>line two</div></body></html>"
    )
    rec = W.serialize_response_record(
        "https://example.org/g", dt.datetime(2024, 1, 1), html, "en"
    )
    d = tmp_path / "gen"
    os.makedirs(d)
    (d / "g.warc.gz").write_bytes(
        W._gzip_member(W.serialize_warcinfo("g.warc.gz")) + W._gzip_member(rec)
    )
    out = W.warc_to_pages(spark, str(d), extractor="generic").toPandas()
    assert out["text"][0] == "Hello & goodbye\nline two"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        W.warc_to_pages(spark, str(d), extractor="nope")


def test_sink_refuses_stale_shards_and_overwrite_clears_them(spark, tmp_path):
    """Sink protocol: a second write into a shard directory must not leave
    the first run's higher-numbered part files readable as data."""
    pages = generate_pages(spark, 40)
    out = str(tmp_path / "sink")
    W.write_warc(pages, out, num_files=4)
    with pytest.raises(ValueError) as ei:
        W.write_warc(pages, out, num_files=2)
    assert "mode='overwrite'" in str(ei.value)
    m = W.write_warc(pages.limit(10), out, num_files=2, mode="overwrite")
    assert len(m) == 2
    # read back: ONLY the second run's records (no union with run 1)
    assert W.read_warc(spark, out).count() == 10
    # no in-progress temp files left behind
    assert not [f for f in os.listdir(out) if ".inprogress" in f]
    # invalid mode rejected up front, even on a directory with no shards
    with pytest.raises(ValueError, match="unknown write_warc mode"):
        W.write_warc(pages.limit(1), str(tmp_path / "fresh"), mode="append")


def test_sink_null_column_raises_named_error(spark, tmp_path):
    pages = generate_pages(spark, 5).withColumn(
        "warc_ts", F.lit(None).cast("timestamp")
    )
    with pytest.raises(Exception) as ei:
        W.write_warc(pages, str(tmp_path / "n"), num_files=1)
    assert "warc_ts" in str(ei.value) and "NULL" in str(ei.value)


def test_sink_handles_non_identifier_column_names(spark, tmp_path):
    """Column access must be by name (pdf[col]), not itertuples attributes —
    itertuples positionally renames names like 'page-url'."""
    pages = generate_pages(spark, 8).withColumnRenamed("url", "page-url")
    out = str(tmp_path / "dash")
    m = W.write_warc(pages, out, num_files=1, url_col="page-url")
    assert m["n_records"].sum() == 8
    assert W.read_warc(spark, out).count() == 8
