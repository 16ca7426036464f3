"""Gopher-style document quality filter (Rae et al. 2021, Table A1) — the
standard webtext keep/drop gate, composed from the engine's existing
repetition stats plus word/line-level screens, all in ONE Catalyst pass
per family (no per-row Python anywhere).

Every rule is a deterministic ratio with a published threshold; a failing
rule contributes its name to ``drop_reasons`` so curation is auditable
(the at-scale requirement: you never delete 40% of a crawl without a
per-document WHY).  Thresholds are overridable per call.

Rules (names = drop_reasons entries):

  word_count          n_words outside [min_words, max_words]     (50, 100k)
  mean_word_length    mean chars/word outside [3, 10]
  symbol_ratio        ('#' chars + '...' runs) / n_words > 0.1
  bullet_lines        > 90% of lines start with a bullet mark
  ellipsis_lines      > 30% of lines end with '...' / '…'
  alpha_words         < 80% of words contain an alphabetic char
  stop_words          < 2 distinct English stop words present
  dup_line_frac       repetition_stats > 0.30
  dup_line_char_frac  repetition_stats > 0.20
  top_{2,3,4}gram     top n-gram char share > 0.20 / 0.18 / 0.16
  dup_{5..10}gram     dup n-gram char share > 0.15 .. 0.10

Reference analogue: none — string_grouper has no quality gate; this is
the LLM-pipeline extension the task brief asks for, shaped like the
published Gopher filter set so results are comparable to the literature.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# published Gopher thresholds (Rae et al. 2021 Table A1)
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_length": 3.0,
    "max_mean_word_length": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stop_words": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_2gram_char_frac": 0.20,
    "max_top_3gram_char_frac": 0.18,
    "max_top_4gram_char_frac": 0.16,
    "max_dup_5gram_char_frac": 0.15,
    "max_dup_6gram_char_frac": 0.14,
    "max_dup_7gram_char_frac": 0.13,
    "max_dup_8gram_char_frac": 0.12,
    "max_dup_9gram_char_frac": 0.11,
    "max_dup_10gram_char_frac": 0.10,
}

_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLETS = ("-", "*", "•", "‣", "▪")


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    thresholds: Optional[dict] = None,
) -> DataFrame:
    """Adds ``n_words``, ``drop_reasons`` (sorted array<string>, empty =
    clean) and ``kept`` (boolean) to ``df``.

    Plan shape: the word/line screens are scalar Catalyst expressions on
    the text column (narrow, whole-stage codegen); the repetition family
    joins in from ``repetition_stats``'s relational explode+agg pass —
    one shuffle keyed by ``id_col``, no skewed-key windows.  At 100 TB the
    whole filter is a map pass plus one partial-aggregated shuffle.
    """
    from .text_stats import repetition_stats

    th = dict(GOPHER_THRESHOLDS)
    unknown = sorted(set(thresholds or {}) - set(th))
    if unknown:
        raise ValueError(
            f"unknown gopher threshold key(s) {unknown}; valid keys: "
            f"{sorted(th)} — a misspelled override would otherwise be "
            "silently ignored and the published default would apply"
        )
    th.update(thresholds or {})

    # The seven scalar screens run in ONE vectorized Arrow pass.  They were
    # first written as Catalyst higher-order-function lambdas; HOFs are
    # INTERPRETED and projection collapse inlines the whole tree into every
    # downstream use (drop_reasons, kept, any pushed filter) with no
    # common-subexpression elimination — a `.where(kept)` re-evaluated the
    # screens ~4x (measured 6 -> 44 s at sf0.1).  A Python UDF is extracted
    # into its own ArrowEvalPython node, deduplicated, and evaluated ONCE —
    # the barrier makes downstream predicate shape irrelevant.  (Interpreted
    # HOF kill #7; see the module-level perf notes in BASELINE.md.)
    screens_type = (
        "n_words int, mean_wl double, symbol_ratio double, alpha_frac double,"
        " stop_hits int, bullet_frac double, ellipsis_frac double"
    )
    word_re = re.compile(r"\s+")
    alpha_re = re.compile(r"[A-Za-z]")
    sep = line_sep
    stops = frozenset(_STOPS)
    bullets = tuple(_BULLETS)

    @F.pandas_udf(screens_type)
    def _screens(texts):  # pd.Series[str] -> pd.DataFrame
        import pandas as pd

        rows = []
        for t in texts:
            t = t or ""
            words = [w for w in word_re.split(t) if w]
            n = len(words)
            d = max(n, 1)
            lines = [ln for ln in (x.strip(" ") for x in t.split(sep)) if ln]
            nl = max(len(lines), 1)
            rows.append(
                (
                    n,
                    sum(map(len, words)) / d,
                    (t.count("#") + t.count("...")) / d,
                    sum(1 for w in words if alpha_re.search(w)) / d,
                    len({w.lower() for w in words} & stops),
                    sum(1 for ln in lines if ln.startswith(bullets)) / nl,
                    sum(1 for ln in lines if ln.endswith("...") or ln.endswith("…"))
                    / nl,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "n_words", "mean_wl", "symbol_ratio", "alpha_frac",
                "stop_hits", "bullet_frac", "ellipsis_frac",
            ],
        )

    base = (
        df.withColumn("_s", _screens(F.col(text_col)))
        .withColumn("n_words", F.col("_s.n_words"))
        .withColumn("_mean_wl", F.col("_s.mean_wl"))
        .withColumn("_symbol_ratio", F.col("_s.symbol_ratio"))
        .withColumn("_alpha_frac", F.col("_s.alpha_frac"))
        .withColumn("_stop_hits", F.col("_s.stop_hits"))
        .withColumn("_bullet_frac", F.col("_s.bullet_frac"))
        .withColumn("_ellipsis_frac", F.col("_s.ellipsis_frac"))
        .drop("_s")
    )

    # passthrough=True: the repetition pass carries the document row (and
    # the screen columns) straight through its map stage, so the stats are
    # attached with NO join — the previous ``base.join(rep, id)`` shuffled
    # the full document payload by id twice just to meet 11 doubles
    # computed from that same payload.  The whole gate is now two chained
    # narrow Python passes (ArrowEvalPython screens + MapInPandas stats).
    rep_cols = [
        "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
        "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
        "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac",
    ]
    joined = repetition_stats(
        base, text_col=text_col, id_col=id_col, line_sep=line_sep,
        passthrough=True,
    ).select(
        # replicate the former join's column order exactly: join key first,
        # then the remaining document/screen columns, then the stat columns
        id_col, *[c for c in base.columns if c != id_col], *rep_cols
    )

    def _flag(cond, name):
        return F.when(cond, F.lit(name))

    reasons = F.array(
        _flag(
            (F.col("n_words") < th["min_words"])
            | (F.col("n_words") > th["max_words"]),
            "word_count",
        ),
        _flag(
            (F.col("_mean_wl") < th["min_mean_word_length"])
            | (F.col("_mean_wl") > th["max_mean_word_length"]),
            "mean_word_length",
        ),
        _flag(F.col("_symbol_ratio") > th["max_symbol_ratio"], "symbol_ratio"),
        _flag(F.col("_bullet_frac") > th["max_bullet_line_frac"], "bullet_lines"),
        _flag(
            F.col("_ellipsis_frac") > th["max_ellipsis_line_frac"],
            "ellipsis_lines",
        ),
        _flag(F.col("_alpha_frac") < th["min_alpha_word_frac"], "alpha_words"),
        _flag(F.col("_stop_hits") < th["min_stop_words"], "stop_words"),
        _flag(F.col("dup_line_frac") > th["max_dup_line_frac"], "dup_line_frac"),
        _flag(
            F.col("dup_line_char_frac") > th["max_dup_line_char_frac"],
            "dup_line_char_frac",
        ),
        *[
            _flag(
                F.col(f"top_{n}gram_char_frac") > th[f"max_top_{n}gram_char_frac"],
                f"top_{n}gram",
            )
            for n in (2, 3, 4)
        ],
        *[
            _flag(
                F.col(f"dup_{n}gram_char_frac") > th[f"max_dup_{n}gram_char_frac"],
                f"dup_{n}gram",
            )
            for n in range(5, 11)
        ],
    )
    reasons = F.array_sort(
        F.filter(reasons, lambda r: r.isNotNull())
    )
    return (
        joined.withColumn("drop_reasons", reasons)
        .withColumn("kept", F.size("drop_reasons") == 0)
        .drop(
            "_mean_wl", "_symbol_ratio", "_alpha_frac", "_stop_hits",
            "_bullet_frac", "_ellipsis_frac",
        )
    )
