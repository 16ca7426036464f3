"""Shuffle-minimal physical plans (the flagship production pipelines)."""

from .fast_dedup import (  # noqa: F401
    fast_lsh_dedup,
    fast_lsh_dedup_bipartite,
)
