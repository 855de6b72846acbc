"""Input sources.

The engine reads Parquet pages tables (BASELINE.json input_hint shape:
url, warc_ts, html, text, lang); this package owns the readers, which
are column-pruned and block-count tuned.  ``read_pages`` is the
canonical source (the S3 mapping — the reference's directory walker,
process_run.py:150-156) and accepts a path or a list of shard paths
(the sharded resumable runner passes file lists, pipelines/resume.py).
"""

from __future__ import annotations

from typing import List, Union

import ray
import ray.data

# Columns the extraction pipeline consumes; `lang` is intentionally
# excluded (never read by any stage — prune at the read).
PAGE_COLUMNS = ["url", "warc_ts", "html", "text"]


def read_pages(path: Union[str, List[str]]) -> "ray.data.Dataset":
    """Read a pages table, pruning to the columns the pipeline uses.

    Blocks ~ 2x cluster CPUs: enough slack for pipelining without the
    tiny-block task/shuffle overhead the default splitter produces."""
    n = 32
    if ray.is_initialized():
        n = max(8, 2 * int(ray.cluster_resources().get("CPU", 16)))
    return ray.data.read_parquet(
        path, columns=PAGE_COLUMNS, override_num_blocks=n
    )


__all__ = ["read_pages", "PAGE_COLUMNS"]
