from . import (  # noqa: F401
    chat,
    code,
    curation,
    decomposition,
    dedup,
    graph,
    intervals,
    similarity,
    sketch,
    timeseries,
)
