from .codebook import (  # noqa: F401
    apply_codebook,
    build_codebook,
    extract_unlabeled_instances,
    hierarchical_codebook_v2,
    label_histogram,
    read_codebook,
    representative_per_instance,
    stub_classifier,
    stub_hierarchical_classifier,
    two_stage_cascade,
    write_codebook,
)
