"""Value-exact regression pins for queries with no SQL oracle.

The driver's correctness gate can only row-count these (LSH, rolling
hashes, model stages — not SQL-expressible); these tests diff the live
output at sf0.01 against committed golden parquet so any semantic
drift fails CI.  Regenerate intentionally with
``python tools/make_goldens.py`` and review the git diff.
"""

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

GOLDEN_QUERIES = [
    # r5: the sequential-twin goldens that double as DuckDB oracles
    # (files carry the _sf0.01 suffix; see _golden_path)
    "extract_results",
    "extract_quarantine",
    "extract_unit_rows",
    "curation_chain",
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


@pytest.mark.parametrize("qname", GOLDEN_QUERIES)
def test_golden_pin(ray_session, qname):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    res = em.queries()[qname](SF)
    if isinstance(res, pa.Table):
        got = res.to_pandas()
    elif isinstance(res, pd.DataFrame):
        got = res
    else:
        got = res.to_pandas()

    path = os.path.join(GOLDEN_DIR, f"{qname}_sf0.01.parquet")
    if not os.path.exists(path):
        path = os.path.join(GOLDEN_DIR, f"{qname}.parquet")
    want = pq.read_table(path).to_pandas()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    g = _canon(got[cols])
    w = _canon(want[cols])
    pd.testing.assert_frame_equal(g, w)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sortable canonical form: list/ndarray cells become tuples."""
    import numpy as np

    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist())
                if isinstance(v, np.ndarray)
                else (tuple(v) if isinstance(v, list) else v)
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)
