from .events import (  # noqa: F401
    batch_events,
    dedupe_events,
    running_user_totals,
    session_window_stats,
    sliding_event_stats,
    stream_events,
    tumbling_event_stats,
)
