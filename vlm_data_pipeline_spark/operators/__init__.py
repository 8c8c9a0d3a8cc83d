from . import (  # noqa: F401
    curation,
    decomposition,
    dedup,
    graph,
    intervals,
    similarity,
    sketch,
    timeseries,
)
