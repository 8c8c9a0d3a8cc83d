from . import json_frames, star_frames  # noqa: F401
