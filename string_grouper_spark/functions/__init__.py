from . import normalize, tfidf  # noqa: F401
