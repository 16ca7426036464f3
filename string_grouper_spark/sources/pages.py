"""Synthetic Common-Crawl-style ``pages`` table + text extraction.

``BASELINE.json.input_hint`` fixes the input schema:
    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

No external data is allowed in-sandbox, so ``generate_pages`` synthesizes a
deterministic (seeded) table whose ``html`` is a UTF-8 wrapper of ``text`` —
making the required per-row invariant testable: ``extract_text(html)`` must
be BYTE-IDENTICAL to ``text`` for every url.

Duplicate structure is injected with exactly the edit classes the reference
tokenizer tolerates (string_grouper.py:365-378): case changes, ``[,-./]`` +
whitespace edits, NFKD-foldable unicode variants, plus exact substring
containment cases for the suffix-window generator.  Expected cluster labels
are recorded at generation time (column ``true_cluster``) so recall can be
scored against ground truth.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_WORDS = (
    "data spark shuffle partition join window batch stream table column row key value "
    "hash sort merge scan filter group agg query plan stage task executor driver memory "
    "disk network latency throughput cluster node core thread cache spill skew salt "
    "bucket broadcast index gram token text page crawl web corpus dedup cluster near "
    "duplicate similarity cosine jaccard minhash simhash suffix array band signature"
).split()

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("true_cluster", LongType(), False),
        StructField("page_id", LongType(), False),
    ]
)

_HTML_PREFIX = b"<html><head><meta charset=\"utf-8\"></head><body><p>"
_HTML_SUFFIX = b"</p></body></html>"


def wrap_html(text: str) -> bytes:
    return _HTML_PREFIX + text.encode("utf-8") + _HTML_SUFFIX


def extract_text_expr(html_col):
    """JVM-side inverse of ``wrap_html``: byte-exact text recovery."""
    s = F.decode(html_col, "UTF-8")
    return F.regexp_replace(
        F.regexp_replace(s, r"^<html><head><meta charset=\"utf-8\"></head><body><p>", ""),
        r"</p></body></html>$",
        "",
    )


def extract_text_generic(html_col):
    """Column expression: REAL-crawl HTML (binary) -> visible text.

    The byte-exact ``extract_text_expr`` inverts this repo's synthetic
    wrapper (the oracle-gated invariant); real Common-Crawl html needs an
    actual extractor.  This is the standard stdlib shape every webtext
    pipeline starts from (the trafilatura/justext class of boilerplate
    removal is a model-free superset a production run would swap in):

      1. drop ``<script>/<style>/<noscript>/<template>`` blocks + comments
         + doctype/CDATA;
      2. block-level tags (p, div, br, li, tr, headings, ...) become
         newlines, all remaining tags are stripped;
      3. HTML entities decode (``html.unescape`` — full named/numeric set);
      4. horizontal whitespace collapses per line, blank runs collapse to
         one newline, result is trimmed.

    Implemented as ONE vectorized pandas UDF (Arrow batches; compiled-regex
    passes per batch, no per-row Python beyond the regex engine) — the same
    plan position as the charset decode it replaces.  Deterministic, so
    the dedup layers above it stay reproducible.
    """
    drop_re = re.compile(
        rb"(?is)<(script|style|noscript|template)\b.*?</\1\s*>|<!--.*?-->"
        rb"|<!\[CDATA\[.*?\]\]>|<!DOCTYPE[^>]*>"
    )
    block_re = re.compile(
        rb"(?is)</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article"
        rb"|header|footer|blockquote|pre|figure|form|hr|nav|aside|main"
        rb"|title)\b[^>]*>"
    )
    tag_re = re.compile(rb"(?s)<[^>]*>")
    hspace_re = re.compile(r"[ \t\r\f\v]+")
    blank_re = re.compile(r"\n\s*\n+")

    @F.pandas_udf("string")
    def _extract(payloads):
        import html as _html

        import pandas as pd

        out = []
        for raw in payloads:
            if raw is None:
                out.append(None)
                continue
            b = bytes(raw)
            b = drop_re.sub(b"", b)
            b = block_re.sub(b"\n", b)
            b = tag_re.sub(b" ", b)
            s = _html.unescape(b.decode("utf-8", "replace"))
            lines = [hspace_re.sub(" ", ln).strip() for ln in s.split("\n")]
            s = blank_re.sub("\n", "\n".join(lines)).strip()
            out.append(s)
        return pd.Series(out, dtype="object")

    return _extract(html_col)


_UNICODE_SWAPS = {"a": "á", "e": "é", "o": "ö", "u": "ü", "c": "ç"}


def _mutate(rng: random.Random, text: str, kind: int) -> str:
    """Apply one reference-tolerated edit class."""
    if kind == 0:  # case changes — erased by ignore_case
        return " ".join(
            w.upper() if rng.random() < 0.3 else w.capitalize() if rng.random() < 0.3 else w
            for w in text.split()
        )
    if kind == 1:  # punctuation/whitespace edits — erased by the strip regex
        out = []
        for w in text.split():
            out.append(w)
            out.append(rng.choice([" ", ", ", " - ", ". ", " / ", "  "]))
        return "".join(out).strip()
    if kind == 2:  # NFKD-foldable accents — erased by normalize_to_ascii
        chars = [
            _UNICODE_SWAPS.get(ch, ch) if rng.random() < 0.15 else ch for ch in text
        ]
        return "".join(chars)
    if kind == 3:  # exact substring (prefix window) — for the suffix pass
        words = text.split()
        keep = max(6, int(len(words) * 0.6))
        return " ".join(words[:keep])
    # kind == 4: light word edit — stays above 0.8 cosine for long docs
    words = text.split()
    idx = rng.randrange(len(words))
    words[idx] = rng.choice(_WORDS)
    return " ".join(words)


def generate_pages_pdf(n_pages: int, seed: int = 42, dup_fraction: float = 0.3):
    """Deterministic pandas frame of synthetic pages (driver-side, small SF)."""
    import pandas as pd

    rng = random.Random(seed)
    base_ts = dt.datetime(2024, 1, 1)
    rows = []
    cluster = 0
    pid = 0
    while pid < n_pages:
        n_words = rng.randint(30, 80)
        text = " ".join(rng.choice(_WORDS) for _ in range(n_words))
        members = [text]
        if rng.random() < dup_fraction:
            for _ in range(rng.randint(1, 3)):
                members.append(_mutate(rng, text, rng.randrange(5)))
        for m in members:
            if pid >= n_pages:
                break
            url = f"https://example.org/{hashlib.md5(f'{seed}/{pid}'.encode()).hexdigest()}"
            rows.append(
                {
                    "url": url,
                    "warc_ts": base_ts + dt.timedelta(seconds=pid * 37),
                    "html": wrap_html(m),
                    "text": m,
                    "lang": "en",
                    "true_cluster": cluster,
                    "page_id": pid,
                }
            )
            pid += 1
        cluster += 1
    return pd.DataFrame(rows)


def generate_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, dup_fraction: float = 0.3
) -> DataFrame:
    return spark.createDataFrame(generate_pages_pdf(n_pages, seed, dup_fraction), PAGES_SCHEMA)


def generate_pages_distributed(
    spark: SparkSession, n_pages: int, seed: int = 42, partitions: Optional[int] = None
) -> DataFrame:
    """Scale-path generator: rows synthesized ON EXECUTORS from spark.range —
    no driver-side materialization, so it scales to arbitrary n_pages.
    Deterministic in (seed, page_id); duplicates = consecutive page_id pairs
    within a cluster stride.
    """
    n_part = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_pages, 1, n_part).withColumnRenamed("id", "page_id")
    # cluster of 4 consecutive ids; member 0 is the original, 1-3 mutate
    base = base.withColumn("true_cluster", (F.col("page_id") / 4).cast("long"))
    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (F.pmod(F.xxhash64(F.lit(seed), F.col("true_cluster")), F.lit(50)) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: word_arr[
            F.pmod(F.xxhash64(F.lit(seed), F.col("true_cluster"), i), F.lit(len(_WORDS))).cast("int")
        ],
    )
    member = F.pmod(F.col("page_id"), F.lit(4))
    # mutations: member 1 = uppercase; member 2 = comma-joined; member 3 = prefix
    text = F.array_join(words, " ")
    text = (
        F.when(member == 1, F.upper(text))
        .when(member == 2, F.array_join(words, " , "))
        .when(member == 3, F.array_join(F.slice(words, 1, F.greatest(F.lit(6), (n_words * 0.6).cast("int"))), " "))
        .otherwise(text)
    )
    out = base.select(
        F.concat(F.lit("https://example.org/"), F.md5(F.concat(F.lit(seed), F.col("page_id")))).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("page_id") * 37)).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit(_HTML_PREFIX.decode()), text, F.lit(_HTML_SUFFIX.decode())
            ),
            "UTF-8",
        ).alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.col("true_cluster"),
        F.col("page_id"),
    )
    return out
