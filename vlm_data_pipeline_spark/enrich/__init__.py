from .codebook import (  # noqa: F401
    apply_codebook,
    build_codebook,
    extract_unlabeled_instances,
    label_histogram,
    representative_per_instance,
    stub_classifier,
    two_stage_cascade,
)
