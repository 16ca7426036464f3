"""CLI entry (`python -m string_grouper_spark ...`): each subcommand reads
parquet, runs one pipeline, writes parquet."""

import pandas as pd

from string_grouper_spark.__main__ import main


def test_cli_dedup_and_exact(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog!",
                "the quick brown fox jumps over the lazy dog",
                "completely different text about spark shuffles",
                "completely different text about spark shuffles",
                "something else entirely in this corpus now",
            ],
        }
    )
    src = f"{tmp_path}/docs"
    spark.createDataFrame(pdf).write.parquet(src)

    out1 = f"{tmp_path}/clusters"
    assert main(["dedup", "--input", src, "--output", out1,
                 "--min-similarity", "0.8", "--num-bands", "32"]) == 0
    clusters = spark.read.parquet(out1).toPandas().set_index("doc_id")["component"]
    assert clusters.loc[0] == clusters.loc[1] == clusters.loc[2]
    assert clusters.loc[3] == clusters.loc[4]
    assert clusters.loc[5] == 5

    out2 = f"{tmp_path}/exact"
    assert main(["exact-dedup", "--input", src, "--output", out2]) == 0
    exact = spark.read.parquet(out2).toPandas()
    assert len(exact) == 2  # two exactly-duplicated contents
    assert set(exact["n_docs"]) == {2}


def test_cli_dedup_compact(spark, tmp_path):
    # dedup-compact folds a match sink into the (id, component) contract
    sink = f"{tmp_path}/sink"
    pd_sink = pd.DataFrame(
        {
            "master_side": [0, 1, 5],
            "dupe_side": [1, 2, 6],
            "similarity": [0.95, 0.9, 0.7],
            "batch_id": [0, 1, 1],
        }
    )
    spark.createDataFrame(pd_sink).write.parquet(sink)
    docs = f"{tmp_path}/docs"
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(8), "text": ["x"] * 8})
    ).write.parquet(docs)

    out = f"{tmp_path}/labels"
    assert main(["dedup-compact", "--input", docs, "--sink", sink,
                 "--output", out]) == 0
    lab = spark.read.parquet(out).toPandas().set_index("doc_id")["component"]
    assert lab.loc[0] == lab.loc[1] == lab.loc[2] == 0
    assert lab.loc[5] == lab.loc[6] == 5
    assert lab.loc[3] == 3 and lab.loc[7] == 7

    # stricter re-threshold drops the 0.7 edge
    out2 = f"{tmp_path}/labels2"
    assert main(["dedup-compact", "--input", docs, "--sink", sink,
                 "--output", out2, "--min-similarity", "0.8"]) == 0
    lab2 = spark.read.parquet(out2).toPandas().set_index("doc_id")["component"]
    assert lab2.loc[5] == 5 and lab2.loc[6] == 6


def test_cli_line_dedup_and_mask_pii(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["footer\nme@x.org wrote", "footer\nother line"],
        }
    )
    src = f"{tmp_path}/docs"
    spark.createDataFrame(pdf).write.parquet(src)

    out1 = f"{tmp_path}/lines"
    assert main(["line-dedup", "--input", src, "--output", out1]) == 0
    lines = spark.read.parquet(out1).toPandas().set_index("doc_id")
    assert lines.loc[0, "text"] == "footer\nme@x.org wrote"
    assert lines.loc[1, "text"] == "other line"  # corpus-dup footer dropped

    out2 = f"{tmp_path}/pii"
    assert main(["mask-pii", "--input", src, "--output", out2]) == 0
    pii = spark.read.parquet(out2).toPandas().set_index("doc_id")
    assert "<EMAIL>" in pii.loc[0, "text_masked"]
    assert pii.loc[0, "n_emails"] == 1 and pii.loc[1, "n_emails"] == 0


def test_cli_topk(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = f"{tmp_path}/emb"
    emb.write.parquet(src)
    out = f"{tmp_path}/topk"
    assert main(["topk", "--input", src, "--output", out, "--k", "3"]) == 0
    got = spark.read.parquet(out).toPandas()
    assert set(got.columns) == {"query_id", "item_id", "cos"}
    assert got.groupby("query_id").size().max() <= 3


def test_cli_dedup_checkpoint_root_keeps_contract(spark, tmp_path):
    # ADVICE r2: toggling --checkpoint-root must NOT change the output
    # schema/semantics of `dedup` — both paths emit (doc_id, component)
    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog!",
                "completely different text about spark shuffles",
                "completely different text about spark shuffles",
            ],
        }
    )
    src = f"{tmp_path}/docs"
    spark.createDataFrame(pdf).write.parquet(src)

    out_fast = f"{tmp_path}/fast"
    out_ck = f"{tmp_path}/ck"
    base = ["dedup", "--input", src, "--min-similarity", "0.8", "--num-bands", "32"]
    assert main(base + ["--output", out_fast]) == 0
    assert main(base + ["--output", out_ck,
                        "--checkpoint-root", f"{tmp_path}/stages"]) == 0
    a = spark.read.parquet(out_fast).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = spark.read.parquet(out_ck).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a.columns) == list(b.columns) == ["doc_id", "component"]
    pd.testing.assert_frame_equal(a, b)


def test_cli_dedup_exact_centroid_contract(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog!",
                "completely different text about spark shuffles",
            ],
        }
    )
    src = f"{tmp_path}/docs"
    spark.createDataFrame(pdf).write.parquet(src)
    out = f"{tmp_path}/exactc"
    assert main(["dedup-exact", "--input", src, "--output", out,
                 "--min-similarity", "0.8"]) == 0
    got = spark.read.parquet(out).toPandas()
    assert set(got.columns) == {"doc_id", "group_rep"}
    g = got.set_index("doc_id")["group_rep"]
    assert g.loc[0] == g.loc[1]


def test_cli_dedup_incremental(spark, tmp_path):
    corpus = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "completely different text about spark shuffles",
                "a third topic entirely concerning minhash bands",
            ],
        }
    )
    batch = pd.DataFrame(
        {
            "doc_id": [100, 101],
            "text": [
                "the quick brown fox jumps over the lazy dog!",
                "nothing like anything in the corpus at all here",
            ],
        }
    )
    cs, bs = f"{tmp_path}/corpus", f"{tmp_path}/batch"
    spark.createDataFrame(corpus).write.parquet(cs)
    spark.createDataFrame(batch).write.parquet(bs)
    out = f"{tmp_path}/matches"
    assert main(["dedup-incremental", "--input", bs, "--corpus", cs,
                 "--output", out, "--min-similarity", "0.8",
                 "--num-bands", "32"]) == 0
    got = spark.read.parquet(out).toPandas()
    assert set(got.columns) == {"master_side", "dupe_side", "similarity"}
    assert set(zip(got.master_side, got.dupe_side)) == {(0, 100)}


def test_cli_url_dedup(spark, tmp_path):
    from string_grouper_spark.sources.pages import generate_pages
    from pyspark.sql import functions as F

    pages = generate_pages(spark, 30, seed=21)
    variants = (
        pages.limit(8)
        .withColumn("url", F.concat(F.col("url"), F.lit("?utm_source=rss#top")))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 MINUTES"))
    )
    src = f"{tmp_path}/pages"
    pages.unionByName(variants).write.parquet(src)
    out = f"{tmp_path}/urldedup"
    assert main(["url-dedup", "--input", src, "--output", out]) == 0
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 30  # variants collapsed onto their originals
    # full page rows survive (so the output feeds content dedup directly)
    assert set(got.columns) == {"canonical_url"} | set(pages.columns)
    # earliest crawl kept: no kept url carries the later variant's params
    assert not got["url"].str.contains("utm_source").any()


def test_cli_topk_frozen_fit_then_query(spark, tmp_path):
    # two-job lifecycle: one job fits+saves the index, a later job loads it
    # and serves a query batch — no refit (the index dir is the contract)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    items, queries = f"{tmp_path}/items", f"{tmp_path}/queries"
    emb.write.parquet(items)
    emb.limit(10).write.parquet(queries)
    idx, out1, out2 = f"{tmp_path}/idx", f"{tmp_path}/o1", f"{tmp_path}/o2"
    assert main([
        "topk-frozen", "--fit", "--items", items, "--index", idx,
        "--input", queries, "--output", out1, "--method", "ivf", "--k", "3",
    ]) == 0
    assert main([
        "topk-frozen", "--index", idx,
        "--input", queries, "--output", out2, "--k", "3",
    ]) == 0
    g1 = spark.read.parquet(out1).toPandas().sort_values(["query_id", "item_id"])
    g2 = spark.read.parquet(out2).toPandas().sort_values(["query_id", "item_id"])
    assert set(g1.columns) == {"query_id", "item_id", "cos"}
    assert list(zip(g1.query_id, g1.item_id)) == list(zip(g2.query_id, g2.item_id))


def test_cli_image_dedup(spark, tmp_path):
    import numpy as np

    from string_grouper_spark.functions.codecs import encode_png
    from string_grouper_spark.functions.jpeg import encode_jpeg

    rows = []
    for src in range(2):
        yy, xx = np.mgrid[0:32, 0:32].astype(float)
        img = np.clip(
            128 + 90 * np.sin(0.04 * (src + 1) * xx) * np.cos(0.06 * yy), 0, 255
        ).astype(np.uint8)
        img = np.stack([img] * 3, axis=2)
        for payload in (encode_png(img), encode_jpeg(img, quality=85)):
            rows.append((len(rows), bytearray(payload)))
    src_path, out = f"{tmp_path}/media", f"{tmp_path}/clusters"
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"])
    ).write.parquet(src_path)
    assert main(["image-dedup", "--input", src_path, "--output", out]) == 0
    got = spark.read.parquet(out).toPandas()
    labels = dict(zip(got.media_id, got.component))
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_cli_dedup_html_col_pages_shape(spark, tmp_path):
    # north-rule job surface: a pages table with ONLY html bytes (no text
    # column) dedups via --html-col, and the clusters equal a plain-text run
    from string_grouper_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 120, seed=5)
    src_pages = f"{tmp_path}/pages"
    pages.select("url", "warc_ts", "html", "lang", "page_id").write.parquet(src_pages)
    src_text = f"{tmp_path}/ptext"
    pages.select("page_id", "text").write.parquet(src_text)

    out_h = f"{tmp_path}/clusters_html"
    assert main(["dedup", "--input", src_pages, "--output", out_h,
                 "--html-col", "html", "--id-col", "page_id",
                 "--min-similarity", "0.7", "--num-bands", "64"]) == 0
    out_t = f"{tmp_path}/clusters_text"
    assert main(["dedup", "--input", src_text, "--output", out_t,
                 "--id-col", "page_id",
                 "--min-similarity", "0.7", "--num-bands", "64"]) == 0
    got_h = spark.read.parquet(out_h).toPandas().sort_values("page_id")
    got_t = spark.read.parquet(out_t).toPandas().sort_values("page_id")
    assert got_h.reset_index(drop=True).equals(got_t.reset_index(drop=True))
    # and the html-derived clustering actually merged something
    assert got_h["component"].nunique() < len(got_h)


def test_cli_dedup_generators_union(spark, tmp_path):
    # --generators minhash,substring clusters a prefix dup the cosine
    # threshold misses; plain dedup does not
    long = ("data spark shuffle partition join window batch stream table "
            "column row key value hash sort merge scan filter group agg "
            "query plan stage task executor driver memory disk network")
    prefix = " ".join(long.split()[: int(len(long.split()) * 0.6)])
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": [long, prefix, "unrelated pasta recipe entirely"]})
    src = f"{tmp_path}/docs"
    spark.createDataFrame(pdf).write.parquet(src)

    out_u = f"{tmp_path}/union"
    assert main(["dedup", "--input", src, "--output", out_u,
                 "--generators", "minhash,substring",
                 "--min-similarity", "0.8", "--num-bands", "64"]) == 0
    got = spark.read.parquet(out_u).toPandas().set_index("doc_id")["component"]
    assert got.loc[0] == got.loc[1] == 0
    assert got.loc[2] == 2

    out_p = f"{tmp_path}/plain"
    assert main(["dedup", "--input", src, "--output", out_p,
                 "--min-similarity", "0.8", "--num-bands", "64"]) == 0
    plain = spark.read.parquet(out_p).toPandas().set_index("doc_id")["component"]
    assert plain.loc[0] != plain.loc[1]


def test_cli_warc_roundtrip_and_union_checkpoint_string_ids(spark, tmp_path):
    # the full webtext flow: pages parquet -> WARC shards -> extract ->
    # three-generator checkpointed dedup keyed by the STRING url
    from string_grouper_spark.sources.pages import generate_pages

    src = f"{tmp_path}/pages"
    generate_pages(spark, 40, dup_fraction=0.5).write.parquet(src)
    shards = f"{tmp_path}/shards"
    assert main(["warc-write", "--input", src, "--output", shards,
                 "--num-files", "2"]) == 0
    import glob

    assert len(glob.glob(f"{shards}/part-*.warc.gz")) == 2
    pages2 = f"{tmp_path}/pages2"
    assert main(["warc-extract", "--input", shards, "--output", pages2]) == 0
    back = spark.read.parquet(pages2)
    assert back.count() == 40
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang"}

    out = f"{tmp_path}/labels"
    assert main(["dedup", "--input", pages2, "--output", out,
                 "--text-col", "text", "--id-col", "url",
                 "--generators", "minhash,simhash",
                 "--checkpoint-root", f"{tmp_path}/ck",
                 "--min-similarity", "0.8", "--num-bands", "32",
                 "--max-bucket-size", "1000"]) == 0
    lab = spark.read.parquet(out)
    assert lab.count() == 40 and set(lab.columns) == {"url", "component"}
    stages = set(
        spark.read.json(f"{tmp_path}/ck/_metrics").toPandas()["stage"]
    )
    assert {"vectors", "cand_minhash", "cand_simhash", "labels"} <= stages


def test_cli_host_stats(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "url": ["https://a.com/1", "https://a.com/2", "https://b.com/1"],
            "component": [1, 1, 1],
        }
    )
    src = f"{tmp_path}/lab"
    spark.createDataFrame(pdf).write.parquet(src)
    out = f"{tmp_path}/hosts"
    assert main(["host-stats", "--input", src, "--output", out]) == 0
    got = spark.read.parquet(out).toPandas().set_index("host")
    assert got.loc["a.com", "n_pages"] == 2
    assert got.loc["a.com", "cross_host_pages"] == 2
    assert got.loc["b.com", "cross_host_frac"] == 1.0


def test_cli_media_probe(spark, tmp_path):
    from tests.test_containers import make_mkv, make_mp4

    pdf = pd.DataFrame(
        {"media_id": [0, 1, 2], "payload": [make_mp4(), make_mkv(), b"junk"]}
    )
    src = f"{tmp_path}/media"
    spark.createDataFrame(pdf).write.parquet(src)
    out = f"{tmp_path}/meta"
    assert main(["media-probe", "--input", src, "--output", out]) == 0
    got = spark.read.parquet(out).toPandas().set_index("media_id").sort_index()
    assert list(got["container"])[:2] == ["mp4", "webm"]
    assert got.loc[2, "err"] is not None
