from . import (  # noqa: F401
    bronze,
    coco,
    hypersim,
    json_frames,
    matterport,
    objectron,
    star_frames,
    sunrgbd,
    taskonomy,
    warc,
)
