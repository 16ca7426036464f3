"""string_grouper_spark — PySpark-native near-duplicate detection & clustering.

A from-scratch distributed re-expression of the capabilities of
Bergvca/string_grouper (char-n-gram TF-IDF cosine matching + single-linkage
grouping), built Spark-first: DataFrame/Catalyst plans, Arrow-vectorized
kernels, LSH candidate generation for web scale, iterative DataFrame
connected components.

Two API layers:
  * ``pandas_api`` — drop-in reference-compatible functions over pd.Series
    (match_strings, match_most_similar, group_similar_strings,
    compute_pairwise_similarities, StringGrouper).
  * ``operators``/``functions`` — the DataFrame-native engine for cluster use.
"""

from .config import MatchConfig  # noqa: F401
from .pandas_api import (  # noqa: F401
    SparkStringGrouper,
    StringGrouper,
    StringGrouperNotFitException,
    compute_pairwise_similarities,
    group_similar_strings,
    match_most_similar,
    match_strings,
)

__version__ = "0.1.0"
