from . import (  # noqa: F401
    curation,
    decomposition,
    dedup,
    intervals,
    similarity,
    timeseries,
)
