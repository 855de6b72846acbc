"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir; where ``oracle_sql()``
has an entry, runs the SQL in DuckDB over the same parquet tables and
compares rows / schema (names+dtypes, sorted by name) / a value hash of
the canonicalized frames.  Queries without an oracle get a rows-only
report.  Mirrors the driver described in the task contract so red rows
are caught before a round ends, not after.

Usage:  python tools/check_oracles.py [sf_dir] [query ...]
Owns its own Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    # Hash a dtype-sensitive canonical serialization: dtype mismatches
    # (int64 vs float64 from HUGEINT) must break the hash like the
    # driver's does.
    h = hashlib.sha256()
    for col in df.columns:
        h.update(col.encode())
        h.update(str(df[col].dtype).encode())
        h.update(pd.util.hash_pandas_object(df[col], index=False).values.tobytes())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    report: dict[str, dict] = {}
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {}
        try:
            mine = _canon(_to_pandas(fn(sf_dir)))
            row["spark_rows"] = len(mine)
            if name in oracles:
                oracle = _canon(con.execute(oracles[name]).fetchdf())
                row["oracle_rows"] = len(oracle)
                row["rows_match"] = len(mine) == len(oracle)
                row["schema_match"] = list(mine.columns) == list(oracle.columns) and [
                    str(d) for d in mine.dtypes
                ] == [str(d) for d in oracle.dtypes]
                row["hash_match"] = (
                    row["schema_match"] and _value_hash(mine) == _value_hash(oracle)
                )
                if not row["hash_match"]:
                    n_bad += 1
                    row["mine_dtypes"] = {c: str(d) for c, d in mine.dtypes.items()}
                    row["oracle_dtypes"] = {
                        c: str(d) for c, d in oracle.dtypes.items()
                    }
                    if row["schema_match"] and row["rows_match"]:
                        neq = [
                            c
                            for c in mine.columns
                            if not mine[c].equals(oracle[c])
                        ]
                        row["diff_cols"] = neq
            else:
                row["err"] = "no_oracle"
                if len(mine) == 0:
                    n_bad += 1
                    row["warn"] = "ZERO ROWS (vacuous check)"
        except Exception as e:  # pragma: no cover - diagnostic path
            n_bad += 1
            row["err"] = f"{type(e).__name__}: {e}"
        report[name] = row

    print(json.dumps(report, indent=1, default=str))
    print(f"\n{'OK' if n_bad == 0 else 'BAD'}: {n_bad} failing/vacuous")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
