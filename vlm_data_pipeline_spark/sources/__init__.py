from . import (  # noqa: F401
    coco,
    hypersim,
    json_frames,
    matterport,
    objectron,
    star_frames,
    sunrgbd,
    taskonomy,
)
