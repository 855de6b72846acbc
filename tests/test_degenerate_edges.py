"""Regression pins for the round-4 ADVICE degenerate-input fixes.

Each test builds a tiny synthetic sf_dir that triggers the degenerate
path (single-bin histogram, constant-valued group, empty hash sample,
>900-day calendar, zero complete weeks) and asserts the Python result
still matches the DuckDB oracle hash-style (rows, columns, values).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _cmp(got, sql: str, sf_dir: str, tables=("documents", "events", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(sql).fetchdf()
    got = got.to_pandas() if isinstance(got, pa.Table) else got
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.fixture()
def sf(tmp_path):
    return str(tmp_path)


def test_gini_split_single_bin_returns_empty(ray_session, sf):
    """All-identical quality scores collapse the histogram to one bin:
    no split candidate exists; both engines return ZERO rows."""
    from document_extractor_ray.functions.textstats import (
        GINI_SPLIT_SCAN_SQL,
        gini_split_scan,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "text": pa.array(["abcd efgh"] * 8, pa.string()),
                "lang": pa.array(["en", "de"] * 4, pa.string()),
                "source": pa.array(["s"] * 8, pa.string()),
                "n_chars": pa.array([9] * 8, pa.int64()),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    got = gini_split_scan(sf)
    assert got.num_rows == 0
    _cmp(got, GINI_SPLIT_SCAN_SQL, sf)


def test_l_moments_constant_group_zero_taus(ray_session, sf):
    """An event type whose >=4 values are all identical has l2num=0:
    tau3/tau4 must be 0 on both engines, not a ZeroDivisionError."""
    from document_extractor_ray.functions.analytics import (
        L_MOMENTS_PROFILE_SQL,
        l_moments_profile,
    )

    ts = pa.array(
        [1_700_000_000_000_000 + i * 3_600_000_000 for i in range(6)],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "ts": ts,
                "user_id": pa.array([1] * 6, pa.int64()),
                "event_type": pa.array(["flat"] * 6, pa.string()),
                "value": pa.array([7.25] * 6, pa.float64()),
                "props": pa.array(["{}"] * 6, pa.string()),
            }
        ),
        os.path.join(sf, "events.parquet"),
    )
    got = l_moments_profile(sf)
    assert got.num_rows == 1
    assert got["tau3_micro"][0].as_py() == 0
    assert got["tau4_micro"][0].as_py() == 0
    _cmp(got, L_MOMENTS_PROFILE_SQL, sf)


def test_cosine_pair_histogram_empty_sample_zero_grid(ray_session, sf):
    """vec_ids chosen so the deterministic mod-8 hash sample is empty:
    both engines emit the all-zero 20-bin grid."""
    from document_extractor_ray.functions.similarity import (
        COSINE_PAIR_HISTOGRAM_SQL,
        cosine_pair_histogram,
    )

    A1, M32 = 2654435761, 1 << 32
    ids = [i for i in range(1, 200) if ((i * A1) & (M32 - 1)) % 8 != 0][:6]
    assert ids
    rng = np.random.default_rng(3)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [rng.standard_normal(8).astype(np.float32).tolist() for _ in ids],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(ids), pa.int32()),
            }
        ),
        os.path.join(sf, "embeddings.parquet"),
    )
    got = cosine_pair_histogram(sf)
    assert got.num_rows == 20
    assert sum(got["n_pairs"].to_pylist()) == 0
    _cmp(got, COSINE_PAIR_HISTOGRAM_SQL, sf)


def test_pettitt_long_calendar_no_overflow(ray_session, sf):
    """>900 days: |U| ~ n^2/2 makes the old BIGINT significance
    arithmetic overflow in DuckDB; the HUGEINT cast must keep the
    oracle runnable and parity-green."""
    from document_extractor_ray.functions.analytics import (
        PETTITT_CHANGEPOINT_SQL,
        pettitt_changepoint,
    )

    n_days = 1000
    base = 1_600_000_000_000_000
    counts = [3 if d < n_days // 2 else 9 for d in range(n_days)]
    ts, eid = [], []
    k = 0
    for d, c in enumerate(counts):
        for j in range(c):
            ts.append(base + d * 86_400_000_000 + j * 1_000_000)
            eid.append(k)
            k += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * len(eid), pa.int64()),
                "event_type": pa.array(["e"] * len(eid), pa.string()),
                "value": pa.array([1.0] * len(eid), pa.float64()),
                "props": pa.array(["{}"] * len(eid), pa.string()),
            }
        ),
        os.path.join(sf, "events.parquet"),
    )
    got = pettitt_changepoint(sf)
    assert got["n_days"][0].as_py() == n_days
    assert got["significant"][0].as_py() == 1  # planted mean shift
    _cmp(got, PETTITT_CHANGEPOINT_SQL, sf)


def test_friedman_zero_complete_weeks_zero_row(ray_session, sf):
    """A 3-day calendar has no complete (7-dow) week: r2_dow* must be
    0 (coalesced) on both engines, not NULL vs 0."""
    from document_extractor_ray.functions.analytics import (
        FRIEDMAN_DOW_SQL,
        friedman_dow_test,
    )

    base = 1_700_000_000_000_000
    ts = [base + d * 86_400_000_000 for d in range(3)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(3), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * 3, pa.int64()),
                "event_type": pa.array(["e"] * 3, pa.string()),
                "value": pa.array([1.0] * 3, pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string()),
            }
        ),
        os.path.join(sf, "events.parquet"),
    )
    got = friedman_dow_test(sf)
    assert got["n_weeks"][0].as_py() == 0
    assert all(got[f"r2_dow{j}"][0].as_py() == 0 for j in range(7))
    _cmp(got, FRIEDMAN_DOW_SQL, sf)
