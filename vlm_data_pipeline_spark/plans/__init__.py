from .registry import QUERIES, StarQuery, load_tables, register  # noqa: F401

# Importing the query modules populates the registry.
from . import star_queries  # noqa: E402,F401
from . import star_queries2  # noqa: E402,F401
from . import star_queries_llm  # noqa: E402,F401
from . import star_queries_domain  # noqa: E402,F401
