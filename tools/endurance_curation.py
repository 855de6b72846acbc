"""10M-doc endurance run of the full curation chain (VERDICT r4 item 5).

Generates (once, cached in /tmp) the 10M-page corpus plus its streamed
duplicate plants, then runs pipelines/curation.run_curation end to end
at 32 CPUs, consuming the packed output into partitioned parquet, and
prints one JSON line with per-phase walls, stage counts, and the Ray
object-store spill counters.

    python tools/endurance_curation.py [n_rows]

Owns its Ray session.  Results are recorded in BASELINE.md's endurance
table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(n_rows: int, base: str, plants: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_extractor_ray import fixtures
    from document_extractor_ray.pipelines import curation

    if not os.path.exists(base):
        t0 = time.monotonic()
        fixtures.write_pages_parquet_parallel(
            base + ".tmp", n_rows, seed=42, workers=30
        )
        os.replace(base + ".tmp", base)
        print(f"base corpus: {time.monotonic() - t0:.1f}s", file=sys.stderr)
    if not os.path.exists(plants):
        t0 = time.monotonic()
        pf = pq.ParquetFile(base)
        writer = None
        off = 0
        for batch in pf.iter_batches(batch_size=65536):
            t = pa.Table.from_batches([batch])
            extra = curation.plant_dup_pages(
                t, start_index=off, plants_only=True
            )
            off += t.num_rows
            if extra.num_rows:
                if writer is None:
                    writer = pq.ParquetWriter(
                        plants + ".tmp", extra.schema
                    )
                writer.write_table(extra, row_group_size=512)
        if writer is not None:
            writer.close()
        os.replace(plants + ".tmp", plants)
        print(f"plants: {time.monotonic() - t0:.1f}s", file=sys.stderr)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    base = f"/tmp/docray_endur_pages_n{n_rows}_s42.parquet"
    plants = f"/tmp/docray_endur_plants_n{n_rows}_s42.parquet"
    build_corpus(n_rows, base, plants)

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from document_extractor_ray.config import DEFAULT_CONFIG
    from document_extractor_ray.pipelines import curation

    work = f"/tmp/docray_endur_curwork_n{n_rows}"
    out = os.path.join(work, "packed")
    t_all = time.monotonic()
    r = curation.run_curation(
        [base, plants], DEFAULT_CONFIG, work_dir=work
    )
    t0 = time.monotonic()
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    packed = r["packed"].map_batches(
        lambda t: t.drop_columns(["doc_ids"]).append_column(
            "doc_ids_json",
            __import__("pyarrow").array(
                [
                    json.dumps([int(x) for x in ids], separators=(",", ":"))
                    for ids in t["doc_ids"].to_pylist()
                ],
                __import__("pyarrow").string(),
            ),
        ),
        batch_format="pyarrow",
    )
    packed.write_parquet(out)
    m = dict(r["metrics"])
    m["t_pack_write"] = time.monotonic() - t0
    m["t_total"] = time.monotonic() - t_all

    import pyarrow.parquet as pq

    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    m["packed_examples"] = sum(pq.read_metadata(f).num_rows for f in files)
    kept = 0
    toks = 0
    for f in files:
        t = pq.read_table(f, columns=["n_docs", "n_tokens"])
        kept += sum(t["n_docs"].to_pylist())
        toks += sum(t["n_tokens"].to_pylist())
    m["docs_packed"] = kept
    m["tokens_packed"] = toks
    m["contam_dropped"] = (
        m["docs_after_clean"] - m["dup_losers_union"] - kept
    )

    # spill evidence: Ray writes spilled objects under the session dir
    # (grpc is absent in this container, so ray memory summary is not
    # importable — the filesystem is the ground truth anyway)
    import glob as _glob

    spill_files = _glob.glob(
        "/tmp/ray/session_latest/**/ray_spilled_objects*/**", recursive=True
    ) + _glob.glob("/tmp/ray/session_latest/ray_spilled_objects*/*")
    spill_bytes = sum(
        os.path.getsize(f) for f in spill_files if os.path.isfile(f)
    )
    m["spill_files"] = len([f for f in spill_files if os.path.isfile(f)])
    m["spill_bytes"] = spill_bytes
    m["n_input_pages"] = n_rows
    m["num_cpus"] = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.shutdown()
    print(json.dumps(m))


if __name__ == "__main__":
    main()
