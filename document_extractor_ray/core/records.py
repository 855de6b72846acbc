"""Output record assembly and Arrow schemas — shared by the Ray
finalize stage and the sequential oracle.

The 12-column index row (process_run.py:21-34) re-typed per FIXTURES.md
§3, carried alongside internal columns (page lists, routing metadata)
that downstream sinks (unit-row explode, combined-text chunking,
legacy CSV emitters) consume.
"""

from __future__ import annotations

import zlib
from typing import List

import pyarrow as pa

from document_extractor_ray.config import (
    STATUS_CONTAINER,
    STATUS_ERROR,
    STATUS_LOW_DISK,
    STATUS_NOISE,
    STATUS_OK,
    STATUS_REVIEW,
    STATUS_TIMEOUT,
    PipelineConfig,
)
from document_extractor_ray.core.blocks import build_block
from document_extractor_ray.core.cascade import DocResult

SPAN_TYPE = pa.struct(
    [("page", pa.int32()), ("start", pa.int64()), ("end", pa.int64())]
)

# Public results schema (FIXTURES.md §3).
RESULTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_units", pa.int32()),
        ("processed_at", pa.string()),
        ("pass_used", pa.string()),
        ("score", pa.float64()),
        ("status", pa.string()),
        ("used_ocr", pa.bool_()),
        ("run_id", pa.string()),
        ("notes", pa.string()),
        ("extracted_text", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("txt_relative_path", pa.string()),
    ]
)

# Full internal schema: public columns + routing/unit internals.
FINAL_SCHEMA = pa.schema(
    list(RESULTS_SCHEMA)
    + [
        pa.field("doc_kind", pa.string()),
        pa.field("mode", pa.string()),
        pa.field("quarantine", pa.bool_()),
        pa.field("reason", pa.string()),
        pa.field("pages_num", pa.list_(pa.int32())),
        pa.field("pages_text", pa.list_(pa.string())),
        pa.field("page_rels", pa.list_(pa.float64())),
        pa.field("page_labels", pa.list_(pa.string())),
        pa.field("size_bytes", pa.int64()),
        pa.field("partition_id", pa.int32()),
    ]
)

UNIT_ROWS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page", pa.string()),
        ("text", pa.string()),
        ("method", pa.string()),
        ("used_ocr", pa.string()),
        ("reliability", pa.string()),
    ]
)

QUARANTINE_SCHEMA = pa.schema(
    [("url", pa.string()), ("reason", pa.string()), ("note", pa.string())]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("parent_url", pa.string()),
        ("child_name", pa.string()),
        ("child_url", pa.string()),
        ("size_bytes", pa.int64()),
    ]
)

# Statuses that get a results-index row (the reference's run CSV).
# NOISE has no row (auto-delete, process_run.py:158-164); unsupported
# (MANDATORY_REVIEW) goes to the review manifest only
# (process_run.py:166-171); LOW_DISK exits 1 before any write
# (pass_pdf.py:168-173).
RESULT_STATUSES = frozenset(
    {STATUS_OK, STATUS_ERROR, STATUS_CONTAINER, STATUS_TIMEOUT}
)


def capture_hash(html, text) -> bytes:
    """Deterministic content key of one capture, used to break
    warc_ts TIES in dedup-first: sequential 'first occurrence' (the
    obvious oracle rule) is not reproducible in a distributed run
    whose input order is not stable, so both the oracle and the Ray
    pipeline pick the tie winner by minimal content hash.  Bitwise-
    identical captures are indistinguishable and all survive (in both
    engines identically); downstream exact dedup collapses them."""
    import hashlib

    h = hashlib.sha1()
    h.update(html or b"")
    h.update(b"\x1f")
    h.update((text or "").encode("utf-8"))
    return h.digest()


def partition_of(url: str, num_partitions: int) -> int:
    """Stable hash partition: crc32 (process-independent, unlike
    Python's salted hash())."""
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def assemble_record(
    url: str, doc_kind: str, size_bytes: int, res: DocResult, cfg: PipelineConfig
) -> dict:
    """One FINAL_SCHEMA row from a DocResult."""
    block = build_block(url, res.pages, res.pass_used, res.score, res.status, cfg)
    return {
        "url": url,
        "n_units": len(res.pages),
        "processed_at": cfg.processed_at,
        "pass_used": res.pass_used,
        "score": float(res.score),
        "status": res.status,
        "used_ocr": bool(res.used_ocr),
        "run_id": cfg.run_id,
        "notes": res.notes or "",
        "extracted_text": block.extracted_text,
        "spans": [
            {"page": p, "start": s, "end": e} for (p, s, e) in block.spans
        ],
        "txt_relative_path": block.txt_relative_path,
        "doc_kind": doc_kind,
        "mode": res.mode,
        "quarantine": bool(res.quarantine),
        "reason": res.reason or "",
        "pages_num": [int(p) for p, _ in res.pages],
        "pages_text": [t for _, t in res.pages],
        "page_rels": [float(x) for x in res.page_rels],
        "page_labels": list(res.page_labels),
        "size_bytes": int(size_bytes),
        "partition_id": partition_of(url, cfg.num_partitions),
    }


def records_to_table(records: List[dict]) -> pa.Table:
    """Build a FINAL_SCHEMA Arrow table from assembled record dicts."""
    cols = {}
    for fld in FINAL_SCHEMA:
        cols[fld.name] = pa.array([r[fld.name] for r in records], type=fld.type)
    return pa.table(cols, schema=FINAL_SCHEMA)


def empty_final_table() -> pa.Table:
    return records_to_table([])


# ---------------------------------------------------------------------------
# Projections over FINAL_SCHEMA tables (work on whole tables or on
# per-stage Arrow batches — the Ray side maps these over blocks).
# ---------------------------------------------------------------------------

def project_results(t: pa.Table) -> pa.Table:
    """The run-CSV index analogue: statuses that got a row."""
    import pyarrow.compute as pc

    mask = pc.is_in(t["status"], value_set=pa.array(sorted(RESULT_STATUSES)))
    return t.filter(mask).select([f.name for f in RESULTS_SCHEMA])


def project_quarantine(t: pa.Table) -> pa.Table:
    """review_manifest.csv analogue (process_run.py:68-81): one
    (url, reason, note) row per quarantined document."""
    q = t.filter(t["quarantine"])
    n = q.num_rows
    return pa.table(
        {
            "url": q["url"],
            "reason": q["reason"],
            "note": pa.array([""] * n, pa.string()),
        },
        schema=QUARANTINE_SCHEMA,
    )


def spans_to_json(spans: List[dict]) -> str:
    """Canonical JSON for a span list — fixed key order, no whitespace.
    Shared by the Ray-side oracle projection and the golden-parquet
    generator so the driver's value hash compares identical strings."""
    import json

    return json.dumps(
        [
            {"page": s["page"], "start": s["start"], "end": s["end"]}
            for s in spans
        ],
        separators=(",", ":"),
    )


def canonical_results(t: pa.Table) -> pa.Table:
    """Driver-hashable projection of a RESULTS_SCHEMA (or wider) table:
    every RESULTS_SCHEMA column except ``spans``, which becomes the
    flat string ``spans_json`` (pandas cannot hash list<struct> cells).
    Row order is NOT established here — the caller sorts by url."""
    cols = {}
    for f in RESULTS_SCHEMA:
        if f.name == "spans":
            cols["spans_json"] = pa.array(
                [spans_to_json(s) for s in t["spans"].to_pylist()], pa.string()
            )
        else:
            cols[f.name] = t[f.name]
    return pa.table(cols)


def explode_unit_rows(t: pa.Table) -> pa.Table:
    """The legacy 6-column rows (common.py:150-153) for image-route
    documents: one row per frame with the exact string formatting of
    CsvWriter.row (common.py:168-179): used_ocr lowered bool string,
    reliability '%.2f'."""
    mask_tbl = t.filter(
        pa.compute.equal(t["doc_kind"], pa.scalar("multi_unit"))
    )
    urls, pages, texts, methods, ocrs, rels = [], [], [], [], [], []
    for row in mask_tbl.to_pylist():
        labels = row["page_labels"]
        for label, text, rel in zip(labels, row["pages_text"], row["page_rels"]):
            urls.append(row["url"])
            pages.append(label)
            texts.append(text)
            methods.append(row["pass_used"] or "unknown")
            ocrs.append("true")
            rels.append(f"{rel:.2f}")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "page": pa.array(pages, pa.string()),
            "text": pa.array(texts, pa.string()),
            "method": pa.array(methods, pa.string()),
            "used_ocr": pa.array(ocrs, pa.string()),
            "reliability": pa.array(rels, pa.string()),
        },
        schema=UNIT_ROWS_SCHEMA,
    )


def manifest_records(parent_url: str, children) -> List[dict]:
    """Portfolio manifest rows (portfolio_unpack.py:46-57)."""
    from document_extractor_ray.core.sniff import child_url

    return [
        {
            "parent_url": parent_url,
            "child_name": name,
            "child_url": child_url(parent_url, name),
            "size_bytes": len(payload),
        }
        for name, payload in children
    ]
