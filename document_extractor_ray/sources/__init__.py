"""Input sources.

The engine reads Parquet pages tables (input_hint shape); readers are
column-pruned and block-count tuned.  ``read_pages`` is the canonical
source (S3 mapping — the reference's directory walker,
process_run.py:150-156); ``read_pages_dataset`` accepts file lists for
the sharded resumable runner.
"""

from document_extractor_ray.pipelines.extract import read_pages

__all__ = ["read_pages"]
