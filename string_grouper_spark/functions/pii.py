"""PII masking for webtext pipelines — pure Catalyst expressions.

Training-data pipelines scrub obvious PII before anything else touches the
text (C4/RefinedWeb-style regex gates).  Three deterministic detectors:

  * emails  — ``local@domain.tld`` (alnum/._%+- local parts);
  * IPv4    — dotted quads with word boundaries;
  * phones  — E.164-ish ``+`` international numbers (digits/space/hyphen).

**False-positive policy: recall-first, deliberately permissive.**  This
is a masking pass, not a validator — over-masking costs a few tokens of
training text, under-masking leaks PII.  Consequently ``IPV4_RE`` accepts
invalid quads (``999.999.999.999`` masks), and ``PHONE_RE`` masks any
``+``-prefixed international-looking digit run without checksum or
country-code validation.  Callers needing precision should post-filter
the ``n_*`` counter columns, not loosen the masks.

Patterns are deliberately restricted to constructs Java regex (Spark) and
RE2 (DuckDB) evaluate identically — greedy character-class quantifiers,
no alternation-order tricks — so the ``pii`` driver oracle mirrors them
1:1.  Replacement order matters and is fixed (emails, then IPv4, then
phones); mask tokens contain no digits or ``@``, so later passes can
never re-match inside an earlier mask.

Everything is ``regexp_replace``/``regexp_extract_all`` — whole-stage
codegen'd, streaming-safe, one narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d\- ]{6,}\d"

EMAIL_MASK = "<EMAIL>"
IPV4_MASK = "<IP>"
PHONE_MASK = "<PHONE>"


def mask_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_masked"
) -> DataFrame:
    """Adds ``out_col`` (masked text) plus ``n_emails``/``n_ipv4``/
    ``n_phones`` counts (counted on the ORIGINAL text, so the counters
    are independent of replacement order)."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, EMAIL_MASK), IPV4_RE, IPV4_MASK
        ),
        PHONE_RE,
        PHONE_MASK,
    )
    return (
        df.withColumn(out_col, masked)
        .withColumn("n_emails", n_emails)
        .withColumn("n_ipv4", n_ipv4)
        .withColumn("n_phones", n_phones)
    )
