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


def make_extract_goldens() -> None:
    """Golden parquet for the three extraction queries, computed by the
    SEQUENTIAL oracle (document_extractor_ray.oracle.run_oracle) over
    the exact sf0.01 pages fixture the registry wrappers read — the
    driver's ``oracle_sql()`` then `read_parquet()`s these back, giving
    the flagship pipeline a real hash-checked row (VERDICT r4 item 2).
    No Ray code touches these files: a Ray-side regression cannot
    silently regenerate its own expectation."""
    import pyarrow.parquet as pq

    from document_extractor_ray import fixtures, oracle
    from document_extractor_ray.config import DEFAULT_CONFIG
    from document_extractor_ray.core import records

    n_docs = pq.read_metadata(
        os.path.join(SF, "documents.parquet")
    ).num_rows
    n_pages = max(200, n_docs)
    pages = fixtures.make_pages_table(n_pages, seed=42)
    ora = oracle.run_oracle(pages, DEFAULT_CONFIG)

    results = records.canonical_results(ora["results"]).sort_by("url")
    quarantine = ora["quarantine"].sort_by("url")
    units = ora["units"].sort_by([("url", "ascending"), ("page", "ascending")])
    from document_extractor_ray.pipelines import curation

    cur = curation.sequential_curation(
        curation.plant_dup_pages(pages), DEFAULT_CONFIG
    )
    for name, tab in (
        ("extract_results", results),
        ("extract_quarantine", quarantine),
        ("extract_unit_rows", units),
        ("curation_chain", cur),
    ):
        path = os.path.join(OUT, f"{name}_sf0.01.parquet")
        pq.write_table(tab, path)
        print(f"{name}: {tab.num_rows} rows -> {path}")


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
    make_extract_goldens()
    ray.shutdown()


if __name__ == "__main__":
    main()
