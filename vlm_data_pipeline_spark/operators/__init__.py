from . import curation, dedup, similarity  # noqa: F401
