from . import curation, dedup, intervals, similarity  # noqa: F401
