from . import grouping, matching, similarity  # noqa: F401
