"""Regenerate the committed golden parquet files for queries with no
SQL oracle (LSH/rolling-hash/model stages — semantics DuckDB cannot
express).  tests/test_goldens.py diffs each query's live output at
sf0.01 against these files, value-exact, so any semantic drift in the
non-oracled operators fails CI even though the driver only row-counts
them.

Run ONLY when an intentional semantic change is made, then review the
golden diff in git before committing:

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "tests", "goldens")

GOLDEN_QUERIES = [
    "fingerprints",
    "simhash",
    "minhash_dup_pairs",
    "ngram_jaccard_dups",
    "near_dup_clusters",
    "near_dedup_keep",
    "decontaminate",
    "embedding_dup_pairs",
    "embedding_dup_clusters",
    "knn_brute",
    "knn_lsh",
    "knn_ivf",
    "pack_sequences",
    "media_features",
    "frame_sample",
    "kmeans_train",
]


def main() -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in GOLDEN_QUERIES:
        res = qs[name](SF)
        if isinstance(res, pa.Table):
            table = res
        elif isinstance(res, pd.DataFrame):
            table = pa.Table.from_pandas(res, preserve_index=False)
        else:  # ray Dataset
            table = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
        path = os.path.join(OUT, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"{name}: {table.num_rows} rows -> {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
