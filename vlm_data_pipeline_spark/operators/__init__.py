from . import (  # noqa: F401
    chat,
    curation,
    decomposition,
    dedup,
    graph,
    intervals,
    similarity,
    sketch,
    timeseries,
)
