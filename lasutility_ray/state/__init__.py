"""Checkpoint / lineage state for resumable pipelines."""

from .manifest import (  # noqa: F401
    finished_keys,
    manifest_table,
    resumable_burned_tiles,
    resumable_corpus_partitions,
    resumable_salted_tin_tiles,
    resumable_tiles,
    resumable_tin_tiles,
    write_partition_atomic,
)
